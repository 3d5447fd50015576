"""Multimodal (image/audio/video) column plumbing (EXT surface).

Media are opaque ``binary`` columns plus typed metadata; decode /
feature-extract stages are Arrow-batched ``mapInPandas`` operators. Each
decode seam has a REAL decoder where one is reachable — PIL behind
``decode_image_pil`` (lazy import), stdlib ``wave`` behind
``decode_audio_wav`` (dependency-free), soundfile behind
``decode_audio_soundfile`` (lazy import), PIL multi-frame (GIF/TIFF)
behind ``frame_hashes_pil`` (lazy import; swap in av/imageio for
MP4/MKV with the same signature) — plus a deterministic STUB with the
identical contract for codec-less environments. The Spark-side
contract — schema, batch shape, partitioning — is identical across real
and stub, so the decoder choice never changes the plan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the image-decode stage.
DECODED_IMAGE_SCHEMA = (
    "doc_id bigint, byte_len int, sha256 string, width int, height int, "
    "n_channels int"
)


def attach_binary_meta(
    df: DataFrame, bin_col: str = "payload"
) -> DataFrame:
    """Cheap metadata that never needs a decoder: byte length + content
    hash, as JVM expressions (no Python)."""
    return df.withColumns(
        {
            "byte_len": F.octet_length(F.col(bin_col)),
            "sha256": F.sha2(F.col(bin_col), 256),
        }
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic fake (width, height, channels) derived
    from the payload length so tests are reproducible. Fallback when no
    codec library is installed — see ``decode_image_pil`` /
    ``best_image_decoder`` for the real path behind the same seam.
    """
    n = len(payload)
    return (64 + n % 512, 64 + (n // 7) % 512, 3)


def decode_image_pil(payload: bytes) -> tuple[int, int, int]:
    """Real decoder behind the same seam: PIL/Pillow, imported lazily so
    the module (and every stub-path test) works in codec-less
    containers. Same contract as the stub — ``(width, height,
    n_channels)`` — so swapping decoders never changes the DataFrame
    schema or the plan shape (contract-tested in
    ``tests/test_multimodal.py``).

    Import-time cost: PIL import happens once per executor interpreter
    (Python caches it), not per image; the per-image work is
    ``Image.open`` on an in-memory buffer, which reads only the header
    for dimensions — cheap even before any pixel decode.
    """
    import io

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - exercised via best_image_decoder
        raise ImportError(
            "decode_image_pil needs Pillow (`pip install pillow`); "
            "use decode_image_stub or best_image_decoder() for a fallback"
        ) from e

    try:
        img = Image.open(io.BytesIO(payload))
        return (img.width, img.height, len(img.getbands()))
    except Exception:  # noqa: BLE001 - any undecodable payload
        # sentinel, never an exception: one corrupt image in a 10⁹-row
        # corpus must not fail the task (and with it, after Spark's task
        # retries, the whole job) — downstream filters on width > 0
        return (-1, -1, 0)


def best_image_decoder() -> Callable[[bytes], tuple[int, int, int]]:
    """The real PIL decoder when Pillow is installed, else the stub —
    resolved ONCE on the driver so the choice is uniform across the job
    (a per-executor probe could mix real and fake dims in one output).

    Assumes a homogeneous environment: if the driver has Pillow but
    executors don't, tasks raise ImportError at runtime — deliberate
    (silently mixing stub and real dims would be worse); install Pillow
    cluster-wide or pass ``decode_image_stub`` explicitly."""
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        return decode_image_pil
    return decode_image_stub


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    decoder: Callable[[bytes], tuple[int, int, int]] = decode_image_stub,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode stage: ``mapInPandas`` over Arrow batches.

    Partition count bounds decoder parallelism / memory (one image batch
    in flight per task). At 100 TB, repartition so each task holds
    O(100 MB) of payload, and keep the binary column OUT of any shuffle
    that follows — project metadata first, join back by id if pixels are
    needed downstream.
    """
    import hashlib

    src = df.select(id_col, bin_col)
    if batch_partitions:
        src = src.repartition(batch_partitions)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            dims = [decoder(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [len(p) for p in payloads],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                }
            )

    return src.mapInPandas(_decode, schema=DECODED_IMAGE_SCHEMA)


#: Output schema of the audio-decode stage.
DECODED_AUDIO_SCHEMA = (
    "doc_id bigint, byte_len int, sha256 string, sample_rate int, "
    "n_channels int, n_frames bigint, duration_s double"
)

#: (sample_rate, n_channels, n_frames) returned for undecodable payloads —
#: a sentinel, never an exception (one corrupt clip must not kill the job).
AUDIO_SENTINEL = (-1, 0, -1)


def decode_audio_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB audio decoder: deterministic fake ``(sample_rate, n_channels,
    n_frames)`` derived from the payload length — the audio twin of
    ``decode_image_stub``, for codec-less test environments."""
    n = len(payload)
    return (8000 + (n % 5) * 8000, 1 + n % 2, n * 4)


def decode_audio_wav(payload: bytes) -> tuple[int, int, int]:
    """Real audio decoder behind the same seam, DEPENDENCY-FREE: stdlib
    ``wave`` reads WAV headers — ``(sample_rate, n_channels, n_frames)``
    from the fmt/data chunks only, no sample decode. Non-WAV or corrupt
    payloads return the ``AUDIO_SENTINEL`` (downstream filters on
    ``sample_rate > 0``), matching ``decode_image_pil``'s corrupt-image
    behavior. For MP3/FLAC/OGG use ``decode_audio_soundfile``."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            return (w.getframerate(), w.getnchannels(), w.getnframes())
    except Exception:  # noqa: BLE001 - any undecodable payload
        return AUDIO_SENTINEL


def decode_audio_soundfile(payload: bytes) -> tuple[int, int, int]:
    """Multi-format audio decoder (WAV/FLAC/OGG/…): soundfile (libsndfile
    bindings), imported lazily like PIL in ``decode_image_pil``. Same
    contract and sentinel as ``decode_audio_wav``."""
    import io

    try:
        import soundfile
    except ImportError as e:  # pragma: no cover - exercised via best_audio_decoder
        raise ImportError(
            "decode_audio_soundfile needs soundfile (`pip install soundfile`); "
            "use decode_audio_wav (stdlib, WAV-only) or best_audio_decoder()"
        ) from e

    try:
        with soundfile.SoundFile(io.BytesIO(payload)) as f:
            return (int(f.samplerate), int(f.channels), int(f.frames))
    except Exception:  # noqa: BLE001 - any undecodable payload
        return AUDIO_SENTINEL


def best_audio_decoder() -> Callable[[bytes], tuple[int, int, int]]:
    """soundfile when installed (multi-format), else the stdlib WAV
    reader — resolved ONCE on the driver for job-wide uniformity,
    exactly like ``best_image_decoder``. Note the fallback is still a
    REAL decoder (WAV headers), not the stub; pass ``decode_audio_stub``
    explicitly for fake data."""
    import importlib.util

    if importlib.util.find_spec("soundfile") is not None:
        return decode_audio_soundfile
    return decode_audio_wav


def decode_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    decoder: Callable[[bytes], tuple[int, int, int]] = decode_audio_wav,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Audio decode stage: ``mapInPandas`` over Arrow batches, same
    plumbing and sizing guidance as ``decode_images`` (O(100 MB) of
    payload per task; keep the binary column out of downstream
    shuffles). Adds ``duration_s`` derived from frames/rate, null for
    sentinel rows."""
    import hashlib

    src = df.select(id_col, bin_col)
    if batch_partitions:
        src = src.repartition(batch_partitions)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            meta = [decoder(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [len(p) for p in payloads],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "sample_rate": [m[0] for m in meta],
                    "n_channels": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "duration_s": [
                        (m[2] / m[0]) if m[0] > 0 and m[2] >= 0 else None
                        for m in meta
                    ],
                }
            )

    return src.mapInPandas(_decode, schema=DECODED_AUDIO_SCHEMA)


#: Output schema of the frame-sampling stage (shared by stub and real
#: samplers — the seam contract, like DECODED_IMAGE/AUDIO_SCHEMA).
FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_no int, frame_sha string"

#: Single sentinel row emitted for undecodable video payloads — a
#: (-1, None) marker, never an exception (one corrupt clip must not kill
#: the job); downstream filters on ``frame_no >= 0``.
FRAME_SENTINEL = [(-1, None)]


def frame_hashes_stub(payload: bytes, every_n: int) -> list:
    """STUB frame sampler: deterministic fake ``(frame_no, frame_sha)``
    pairs derived from the payload length (one fake frame per 100 bytes,
    every ``every_n``-th kept) — the video twin of ``decode_image_stub``
    for codec-less environments. Same contract as the real samplers."""
    import hashlib

    n_frames = max(1, len(payload) // 100)
    return [
        (f, hashlib.md5(f"{len(payload)}:{f}".encode()).hexdigest())
        for f in range(0, n_frames, every_n)
    ]


def frame_hashes_pil(payload: bytes, every_n: int) -> list:
    """REAL frame sampler behind the same seam: PIL's multi-frame
    support (animated GIF / multi-page TIFF / APNG) — ``seek`` to every
    ``every_n``-th frame and hash its decoded pixels. The per-frame cost
    is a real pixel decode (unlike the header-only image path) — that is
    inherent to frame hashing. For MP4/MKV swap in an av/imageio sampler
    with the identical signature; PIL is the dependency this container's
    image path already gates on, so one install lights up both seams.

    Corrupt or non-animated-decodable payloads yield the single
    ``FRAME_SENTINEL`` row, matching the image/audio sentinel behavior.
    """
    import hashlib
    import io

    # caller errors must RAISE (as the stub's range() does), never fold
    # into the corrupt-payload sentinel — the broad except below is for
    # payload problems only, and the seam contract is identical behavior
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - exercised via best_frame_sampler
        raise ImportError(
            "frame_hashes_pil needs Pillow (`pip install pillow`); "
            "use frame_hashes_stub or best_frame_sampler() for a fallback"
        ) from e

    try:
        out = []
        with Image.open(io.BytesIO(payload)) as img:
            n_frames = int(getattr(img, "n_frames", 1))
            for f in range(0, n_frames, every_n):
                img.seek(f)
                out.append(
                    (f, hashlib.sha256(img.convert("RGB").tobytes()).hexdigest())
                )
        return out
    except Exception:  # noqa: BLE001 - any undecodable payload
        return list(FRAME_SENTINEL)


def best_frame_sampler() -> Callable[[bytes, int], list]:
    """The real PIL frame sampler when Pillow is installed, else the
    stub — resolved ONCE on the driver for job-wide uniformity, exactly
    like ``best_image_decoder``."""
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        return frame_hashes_pil
    return frame_hashes_stub


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    every_n: int = 10,
    sampler: Callable[[bytes, int], list] = frame_hashes_stub,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Video frame-sampling stage: explode-shaped ``mapInPandas`` (one
    input row → many output rows, one per sampled frame). The sampler is
    a pluggable seam with the same stub/real discipline as the image and
    audio decoders; the Spark plumbing — schema, Arrow batch shape,
    explode fan-out, partition sizing — is identical across samplers.

    At 100 TB: video payloads dwarf images, so ``batch_partitions``
    matters more here — size tasks to O(100 MB) of payload, and emit
    only (id, frame_no, hash) so the binary never enters a shuffle.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    src = df.select(id_col, bin_col)
    if batch_partitions:
        src = src.repartition(batch_partitions)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_sha": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                for f, sha in sampler(payload, every_n):
                    rows["doc_id"].append(did)
                    rows["frame_no"].append(f)
                    rows["frame_sha"].append(sha)
            yield pd.DataFrame(rows)

    return src.mapInPandas(_sample, schema=FRAME_SAMPLE_SCHEMA)


def frame_sample_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """Back-compat alias for the stub-sampled stage — see
    :func:`sample_frames` (the seam) and :func:`frame_hashes_pil`
    (the real PIL path)."""
    return sample_frames(df, id_col, bin_col, every_n, sampler=frame_hashes_stub)
