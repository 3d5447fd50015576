"""Capture .explain('formatted') for every registry query into
plans/r14/<name>_<tag>.txt, plus a per-query summary line:
Exchange count, join strategies, Python-eval nodes, and the number of
Spark JOBS the query runs end-to-end (construction collects + the noop
sink) — the job count is the overhead proxy the sf0.1 bench is
dominated by.

Usage: python scripts/plan_capture.py <tag> [query ...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from big_data___knowledge_graph_construction_with_llm_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    queries = entry_mod.queries()
    summary = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"{name} [{tag}]")
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            build_jobs = len(tracker.getJobIdsForGroup(None) or []) - jobs_before
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            total_jobs = len(tracker.getJobIdsForGroup(None) or []) - jobs_before
        except Exception as exc:
            print(f"{name}: FAILED {exc!r}", file=sys.stderr)
            continue
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(
                re.findall(
                    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                    r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                    plan,
                )
            )
        )
        py = sorted(
            set(re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)\b", plan))
        )
        line = (
            f"{name}: wall={wall:.2f}s jobs={total_jobs} (build={build_jobs}) "
            f"exchanges={n_ex} joins={joins} python={py}"
        )
        summary.append(line)
        print(line, flush=True)
    with open(os.path.join(out_dir, f"_summary_{tag}.txt"), "w") as fh:
        fh.write("\n".join(summary) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
