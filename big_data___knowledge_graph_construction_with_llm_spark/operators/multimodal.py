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
    from the payload length so tests are reproducible.

    Replace with e.g. PIL/opencv in a real deployment::

        img = PIL.Image.open(io.BytesIO(payload))
        return img.width, img.height, len(img.getbands())
    """
    n = len(payload)
    return (64 + n % 512, 64 + (n // 7) % 512, 3)


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
