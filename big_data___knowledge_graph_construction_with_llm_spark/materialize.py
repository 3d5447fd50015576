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


def release(df: DataFrame, blocking: bool = False) -> None:
    """Strategy-aware storage release for a frame previously returned by
    :func:`materialize`, for when a pipeline supersedes it (the next
    stage/iteration is materialized and the old blocks are dead weight).

    ``Dataset.unpersist()`` alone is NOT enough: it only drops
    CacheManager entries (the ``persist_disk`` case). A
    ``localCheckpoint`` frame's blocks are RDD-level persisted on the
    internal RDD of its ``LogicalRDD`` plan, invisible to the
    CacheManager, so they'd otherwise sit in executor storage until the
    ContextCleaner happens to GC the RDD handle — one corpus copy per
    superseded stage. This unpersists that internal RDD directly
    (verified empirically: MemoryStore usage drops to ~0 immediately).

    ``reliable_checkpoint`` frames are file-backed; the LogicalRDD branch
    is a harmless no-op on their unpersisted checkpoint RDD and the
    files stay readable — releasing a frame never invalidates it for a
    consumer that re-reads it, EXCEPT under ``local_checkpoint``/
    ``persist_disk`` where the blocks are the only copy; callers must
    therefore only release frames no longer referenced by any
    unexecuted plan.

    ``blocking=False`` (default) lets block removal proceed
    asynchronously — the right call inside a pipeline, where stalling on
    executor round-trips buys nothing; pass ``True`` when the caller
    needs the memory observably freed before proceeding (tests, memory
    probes).
    """
    df.unpersist(blocking)
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(blocking)
    except Exception:
        # non-py4j backends (e.g. Spark Connect) have no _jdf; storage
        # release then falls back to the ContextCleaner, the pre-seam
        # behavior
        pass


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
