"""Tests for the streaming throughput study tooling
(scripts/bench_streaming.py).

BENCH_STREAM.json's scaling claims rest on the event scaler's model:
the 10x tier must carry 10x the rows AND 10x the state KEYS (more
users, not deeper per-user histories) with the timestamp range — and
thus watermark/window semantics — unchanged across tiers.
"""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F


def _tooling():
    path = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "bench_streaming.py"
    )
    spec = importlib.util.spec_from_file_location("bench_streaming", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scale_events_grows_rows_and_keys_not_time(spark):
    mod = _tooling()
    base = spark.createDataFrame(
        [
            (1, "2024-01-01T00:01:00", 10, "view", 1.0, "{}"),
            (2, "2024-01-02T03:04:05", 11, "click", 2.0, "{}"),
        ],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    scaled = mod.scale_events(base, 5)
    agg = scaled.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("ids"),
        F.countDistinct("user_id").alias("users"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
    ).head()
    assert agg["n"] == 10  # 5 copies x 2 rows
    assert agg["ids"] == 10  # event ids stay globally unique
    assert agg["users"] == 10  # key domain grows with the tier
    lo, hi = base.agg(F.min("ts"), F.max("ts")).head()
    assert (agg["lo"], agg["hi"]) == (lo, hi)  # time range unchanged


def test_scale_events_one_copy_is_identity(spark):
    mod = _tooling()
    base = spark.createDataFrame(
        [(7, "2024-06-01T12:00:00", 3, "purchase", 9.0, "{}")],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert mod.scale_events(base, 1).collect() == base.collect()
