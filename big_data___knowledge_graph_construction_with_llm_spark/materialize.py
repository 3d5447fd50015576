"""Pluggable materialization seam for iterative and multi-consumer plans.

Iterative DataFrame algorithms (connected components, PageRank, LPA) and
multi-consumer pipelines (LSH candidate sets feeding several joins) must
cut lineage / force computation mid-plan, or the logical plan grows with
the iteration count and re-executes shared stages per consumer. The
engine funnels every such point through :func:`materialize` so the
strategy is a deployment choice, not a hard-coded one:

- ``local_checkpoint`` (default): fastest — blocks live in executor
  storage with NO lineage to recompute them. Fine on a single node or
  for short jobs; at 100 TB on a 1000-executor cluster, one lost
  executor kills the job mid-pass because the blocks cannot be rebuilt.
- ``reliable_checkpoint``: writes to the SparkContext checkpoint
  directory (HDFS/S3; set via ``sc.setCheckpointDir``). Survives
  executor loss AND cuts lineage — the scale-safe choice for long
  curation passes.
- ``persist_disk``: ``persist(StorageLevel.DISK_ONLY)`` + a forcing
  ``count()``. Lost blocks are recomputed from lineage (fault-tolerant
  without a checkpoint dir), but the logical plan keeps growing across
  iterations, so analysis/codegen time creeps up in long loops — prefer
  ``reliable_checkpoint`` there.

Select globally with :func:`set_materializer` (e.g. once at job start)
or scoped with :func:`using_materializer`; operators never need to know
which is active.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

Materializer = Callable[[DataFrame], DataFrame]


def local_checkpoint(df: DataFrame) -> DataFrame:
    """Eager executor-local checkpoint (fast; not fault-tolerant)."""
    return df.localCheckpoint()


def reliable_checkpoint(df: DataFrame) -> DataFrame:
    """Eager reliable checkpoint to the configured checkpoint dir.

    Requires ``spark.sparkContext.setCheckpointDir(...)`` to point at
    durable storage (HDFS/S3) — raises Spark's own error otherwise.
    """
    return df.checkpoint(eager=True)


def persist_disk(df: DataFrame) -> DataFrame:
    """DISK_ONLY persist, forced with a count so downstream consumers
    hit the cache instead of racing to compute it independently."""
    out = df.persist(StorageLevel.DISK_ONLY)
    out.count()
    return out


_materializer: Materializer = local_checkpoint


def set_materializer(fn: Materializer) -> None:
    """Install ``fn`` as the process-wide materialization strategy."""
    global _materializer
    _materializer = fn


def get_materializer() -> Materializer:
    return _materializer


def materialize(df: DataFrame) -> DataFrame:
    """Force ``df`` using the active strategy; returns the materialized
    frame. Every operator-internal lineage cut goes through here."""
    return _materializer(df)


@contextmanager
def using_materializer(fn: Materializer) -> Iterator[None]:
    """Scoped override (tests, or a single durable curation pass inside
    an otherwise-fast job)."""
    global _materializer
    prev = _materializer
    _materializer = fn
    try:
        yield
    finally:
        _materializer = prev
