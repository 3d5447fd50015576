"""Job metrics with the reference's record shape, Spark-natively.

The reference psutil-samples the driver around each job and writes one
JSON per run (``Art-Knowledge-Graph-AWS/monitor.py:13-57``, schema at
``:32-41``: ``{job, start_time, end_time, elapsed_seconds,
cpu_before_percent, cpu_after_percent, memory_before_percent,
memory_after_percent}``). The engine keeps that record shape (job /
start / end / elapsed first) but measures with Spark's own machinery:
driver-side psutil says nothing about a 1000-executor job, so the
before/after "percent" pairs become before/after *executor totals*
(task time, GC time, shuffle read/write, input bytes, memory used)
snapshotted from the AppStatusStore and diffed per job.

``monitor_job`` is the decorator twin of the reference's
``@monitor_job``; ``MetricsCollector`` is reusable on its own.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: executor-summary totals we snapshot (AppStatusStore v1.ExecutorSummary)
_EXEC_FIELDS = (
    "totalDuration",
    "totalGCTime",
    "totalInputBytes",
    "totalShuffleRead",
    "totalShuffleWrite",
    "totalTasks",
    "memoryUsed",
)


def _executor_totals(spark: SparkSession) -> dict[str, int]:
    """Sum the cumulative per-executor counters across the cluster."""
    out = dict.fromkeys(_EXEC_FIELDS, 0)
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        execs = store.executorList(True)
        for i in range(execs.size()):
            e = execs.apply(i)
            for f in _EXEC_FIELDS:
                out[f] += int(getattr(e, f)())
    except Exception:
        pass  # status store unavailable (e.g. connect-mode) → zeros
    return out


class MetricsCollector:
    """Snapshot executor totals at ``start()``, diff at ``finish()`` —
    survives any number of jobs in between and any executor count."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._t0 = 0.0
        self._before: dict[str, int] = {}

    def start(self) -> None:
        self._t0 = time.time()
        self._before = _executor_totals(self.spark)

    def finish(self, job: str, extra: dict[str, Any] | None = None) -> dict[str, Any]:
        t1 = time.time()
        after = _executor_totals(self.spark)
        delta = {f: after[f] - self._before.get(f, 0) for f in _EXEC_FIELDS}
        return {
            # reference-shaped prefix (monitor.py:32-41)
            "job": job,
            "start_time": self._t0,
            "end_time": t1,
            "elapsed_seconds": round(t1 - self._t0, 3),
            # Spark-native before/after replacements for the psutil pairs
            "task_time_ms": delta["totalDuration"],
            "gc_time_ms": delta["totalGCTime"],
            "input_bytes": delta["totalInputBytes"],
            "shuffle_read_bytes": delta["totalShuffleRead"],
            "shuffle_write_bytes": delta["totalShuffleWrite"],
            "tasks": delta["totalTasks"],
            "memory_used_bytes_before": self._before.get("memoryUsed", 0),
            "memory_used_bytes_after": after["memoryUsed"],
            **(extra or {}),
        }


def monitor_job(spark: SparkSession, job_name: str, sink_path: str | None = None):
    """Decorator twin of the reference's ``@monitor_job``
    (``Art-Knowledge-Graph-AWS/monitor.py:13-57``): times the wrapped
    callable and appends one JSON record per run to
    ``<sink_path>/<job>_<ts>.json`` (the reference wrote the same shape to
    ``s3://$S3_BUCKET/$METRICS_PREFIX/``). The record is written through
    the Hadoop FileSystem API (``fsutil``), so ``sink_path`` may name any
    configured filesystem — ``s3a://…`` like the reference's metrics
    bucket, ``hdfs://…``, or a local path — not just the driver's disk."""

    def deco(fn: Callable):
        def wrapped(*args, **kwargs):
            from big_data___knowledge_graph_construction_with_llm_spark import fsutil

            mc = MetricsCollector(spark)
            mc.start()
            result = fn(*args, **kwargs)
            rec = mc.finish(job_name)
            if sink_path:
                path = f"{sink_path.rstrip('/')}/{job_name}_{int(rec['end_time'])}.json"
                fsutil.write_text(spark, path, json.dumps(rec))
            return result

        wrapped.__name__ = getattr(fn, "__name__", job_name)
        return wrapped

    return deco


def observed(df: DataFrame, name: str, *exprs) -> DataFrame:
    """Attach ``df.observe`` metrics (row counts etc.) that arrive with the
    query execution — the Spark-native replacement for the reference's
    per-stage record-count prints
    (``…Local/ingestion/data_ingestion_batch.py:87,105,122``)."""
    from pyspark.sql import functions as F

    if not exprs:
        exprs = (F.count(F.lit(1)).alias("rows"),)
    return df.observe(name, *exprs)
