"""Deterministic sampling & dataset-split operators (EXT surface).

A training-data pipeline needs splits and samples that are REPRODUCIBLE:
``df.sample()`` changes with partitioning, retries, and Spark versions,
so membership is derived from a content hash of the id instead — the
same row lands in the same split on every run, any engine, any cluster
size. Everything is a pure projection (no shuffle, no RNG state);
md5 is used (not xxhash64) because every engine computes the identical
digest, so the split can be recomputed outside Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: F.Column, buckets: int = 100) -> F.Column:
    """Deterministic bucket in ``[0, buckets)``: first 8 hex chars of
    ``md5(id)`` (32 uniform bits) mod ``buckets``. Modulo bias is
    ≤ buckets/2³² — negligible for any practical bucket count."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % buckets).cast("int")


def dataset_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Add a ``train``/``val``/``test`` split column (remaining percent is
    test). Membership is a pure function of the id hash: stable under
    re-runs, repartitioning, and incremental appends — new rows join a
    split without moving old ones."""
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        split_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, buckets: int = 10_000
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    falls below the cutoff. Unlike ``df.sample`` this is reproducible and
    consistent across tables — sampling two tables by the same id keeps
    them join-compatible (the classic requirement for sampled dev
    pipelines over shared keys)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(F.col(id_col), buckets) < int(fraction * buckets))
