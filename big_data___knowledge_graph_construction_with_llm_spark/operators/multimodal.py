"""Multimodal (image/audio/video) column plumbing (EXT surface).

Media are opaque ``binary`` columns plus typed metadata; decode /
feature-extract stages are Arrow-batched ``mapInPandas`` operators. The
actual codec calls are STUBBED (the image/audio libraries are not in this
container — see ``decode_image_stub``); the Spark-side contract — schema,
batch shape, partitioning — is real and tested, so swapping a real
decoder in is a one-function change.
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


def frame_sample_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling stage contract (STUB): emits one row per
    sampled frame with a deterministic fake frame hash. Real impl swaps
    the generator body for an ffmpeg/pyav iterator — the Spark plumbing
    (explode-shaped mapInPandas, one input row → many output rows) is the
    part under test."""

    schema = "doc_id bigint, frame_no int, frame_sha int"

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_sha": []}
            for _, r in pdf.iterrows():
                n_frames = max(1, len(r[bin_col]) // 100)
                for f in range(0, n_frames, every_n):
                    rows["doc_id"].append(r[id_col])
                    rows["frame_no"].append(f)
                    rows["frame_sha"].append((len(r[bin_col]) * 31 + f) % (1 << 31))
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(_sample, schema=schema)
