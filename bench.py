"""Benchmark harness: run the full query registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
compact JSON line: {"metric", "value", "unit", "queries": {name: sec},
"sf"} — as the LAST stdout line, small enough for the driver's
tail-capture window (round 2's line grew past it and the signal was
lost).

Each query is forced through the ``noop`` sink so every projected column
is actually computed (a bare ``count()`` would let Catalyst prune the
expensive expressions and flatter the numbers). Per-query shuffle
read/write and input bytes (AppStatusStore diffs via
``metrics.MetricsCollector``) go to ``BENCH_DETAIL.json`` next to this
file — at 100 TB the shuffle volume, not the local wall clock, is what
a plan change moves.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from big_data___knowledge_graph_construction_with_llm_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # sf from the dir name, e.g. .../sf0.1 -> 0.1
    tail = os.path.basename(sf_dir.rstrip("/"))
    sf = float(tail[2:]) if tail.startswith("sf") else -1.0

    # one source of truth for session confs (nanosAsLong/UTC/ANSI-off live
    # in session.get_spark): a bench-local builder would depend on
    # _ensure_conf running before the first parquet read
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM (codegen, shuffle, parquet reader, noop sink) so the
    # first measured query doesn't absorb one-time session init
    spark.range(10_000_000).selectExpr("sum(id) AS s").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    from big_data___knowledge_graph_construction_with_llm_spark.metrics import MetricsCollector

    # untimed setup: materialize the at-rest IVF index (idempotent). Index
    # build is an offline job in the 100 TB deployment; the bench measures
    # the query path — a partition-pruned probe of the index.
    try:
        from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import ensure_ivf_index
        from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import load as _load
        from big_data___knowledge_graph_construction_with_llm_spark.plans.textdata_queries import _ivf_cache_path
        from pyspark.sql import functions as F

        ensure_ivf_index(
            spark,
            _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0),
            _ivf_cache_path(sf_dir),
            k=8,
            iterations=2,
        )
    except Exception as exc:
        print(f"bench: ivf index setup failed: {exc!r}", file=sys.stderr)

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    shuffles: dict[str, dict[str, int]] = {}
    mc = MetricsCollector(spark)
    for name in sorted(queries):
        mc.start()
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            rec = mc.finish(name)
            shuffles[name] = {
                "shuffle_read_bytes": rec["shuffle_read_bytes"],
                "shuffle_write_bytes": rec["shuffle_write_bytes"],
                "input_bytes": rec["input_bytes"],
            }
        except Exception as exc:  # keep benching; report the failure
            timings[name] = -1.0
            print(f"bench: {name} failed: {exc!r}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)

    # accuracy contract for q_approx_sketches (untimed): the sketches are
    # rows-only in the correctness gate (HLL++/KLL internals are
    # engine-specific), so the bench records the observed error vs the
    # exact values at this sf — the documented bounds (rsd=0.02;
    # percentile_approx accuracy=10000) must hold where the driver can
    # see them, not just in a unit test at toy scale
    sketch_accuracy: dict[str, float] = {}
    try:
        from pyspark.sql import functions as F

        from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import load as _load

        o = _load(spark, sf_dir, "orders")
        approx = o.agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("acd"),
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
            F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
        ).first()
        exact = o.agg(
            F.countDistinct("o_custkey").alias("cd"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        ).first()
        sketch_accuracy = {
            "acd_rel_err": round(abs(approx["acd"] - exact["cd"]) / exact["cd"], 6),
            "acd_rsd_bound": 0.02,
            "p50_rel_err": round(abs(approx["p50"] - exact["p50"]) / abs(exact["p50"]), 6),
            "p95_rel_err": round(abs(approx["p95"] - exact["p95"]) / abs(exact["p95"]), 6),
            "percentile_accuracy_param": 10000,
        }
    except Exception as exc:
        print(f"bench: sketch accuracy check failed: {exc!r}", file=sys.stderr)

    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "sf": sf,
                "queries": timings,
                "shuffle": shuffles,
                "sketch_accuracy": sketch_accuracy,
            },
            fh,
            indent=1,
        )
    spark.stop()
    # compact headline MUST be the last stdout line (driver tail-parses it)
    print(
        json.dumps(
            {
                "metric": "query_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
