"""Micro-bench a SUBSET of registry queries through the noop sink, with
the SAME session/methodology as bench.py (N passes, per-query median),
for quick before/after comparisons while optimizing. Not the graded
bench — use bench.py for that.

Usage: python scripts/micro_bench.py [passes] q_a q_b ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from big_data___knowledge_graph_construction_with_llm_spark.session import get_spark


def main() -> None:
    passes = int(sys.argv[1]) if sys.argv[1:] and sys.argv[1].isdigit() else 3
    names = [a for a in sys.argv[1:] if not a.isdigit()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="micro-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).selectExpr("sum(id) AS s").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    queries = entry_mod.queries()
    tracker = spark.sparkContext.statusTracker()
    runs: list[dict[str, float]] = []
    jobs: dict[str, int] = {}
    for p in range(passes):
        sink: dict[str, float] = {}
        runs.append(sink)
        for name in names:
            spark.sparkContext.setJobDescription(name)
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sink[name] = round(time.perf_counter() - t0, 3)
            if p == passes - 1:
                jobs[name] = len(tracker.getJobIdsForGroup(None) or []) - j0
    med = {}
    for name in names:
        vals = sorted(r[name] for r in runs)
        n = len(vals)
        med[name] = vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2
    print(json.dumps({"median": med, "jobs": jobs, "passes": passes}))
    spark.stop()


if __name__ == "__main__":
    main()
