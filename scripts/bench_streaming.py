"""Streaming throughput study: the Structured Streaming surface under
VOLUME, not just correctness — micro-batch throughput (rows/s), batch
counts, and state-store growth for the streaming topologies a 100 TB
ingest pipeline actually runs. The functional stream tests
(tests/test_streaming.py) prove semantics on a handful of rows; this
measures the same operators at 10^5-10^6 rows and two tiers each, so
the linearity claims ("state bounded by keys, throughput flat in
volume") are measured rather than argued.

Topologies (all driven by a sharded JSON file source with
``maxFilesPerTrigger`` forcing multiple micro-batches, ``availableNow``
so the query drains and terminates):

- ``curate_stream``  — the ingest gate: quality band-pass + watermarked
  content-hash dedup + PII redaction (JVM expressions + built-in
  dedup state), documents tiers.
- ``incremental_dedup_sink`` — the durable store-backed exact dedup
  (foreachBatch; per-batch parquet store read + append), documents
  tiers. Includes the store I/O in the measured wall — that IS the
  operator's cost at scale.
- ``stateful_dedup`` — ``dropDuplicatesWithinWatermark`` on event_id:
  the built-in (JVM state store) stateful op, events tiers.
- ``tumbling_counts`` — watermarked window aggregation, events tiers.
- ``streaming_funnel`` — the custom ``applyInPandasWithState``
  operator (Arrow-batched PYTHON state path), events tiers. Its
  rows/s vs ``stateful_dedup``'s quantifies the JVM-vs-Python state
  gap the docs claim.
- ``stream_stream_interval_join`` — purchases joined to preceding
  clicks within 30 minutes, both sides watermarked; input rows
  counts BOTH sides' scans.
- ``curated_ingest`` — the COMPOSED ingest topology DEPLOYMENT.md §1
  prescribes: ``curate_stream`` feeding ``incremental_dedup_sink``
  as its foreachBatch sink, documents tiers.

Tiers: events 1x (sf0.1, 100k rows) and an inline-scaled 10x (shifted
replicas — event ids and USERS shift per copy, so the 10x tier has 10x
the state keys: the realistic shape, more users rather than 10x-longer
histories). Documents use the scale corpora from ``make_scale_data.py``
(.scale/sf1 = 10x = 50k docs, .scale/sf10 = 100x = 500k docs — the
sf0.1 base's 5k docs are overhead-dominated at streaming granularity);
document shards get a deterministic synthetic ``ts`` (epoch +
doc_id-derived seconds) because the batch table has no event time.

Writes BENCH_STREAM.json at the repo root (a committed evidence
artifact like BENCH_SCALE.json; NOT part of the driver's timed gate):

    {"sources": {...}, "topologies": {topology: {tier: {rows, wall_s,
     rows_per_s, batches, state_rows_max}}}, "linearity": {...}}

Usage (scale corpora first if absent):

    python scripts/make_scale_data.py                                  # 10x
    python scripts/make_scale_data.py /root/testdata/sf0.1 \\
        .scale/sf10 100 10000 10000 50000                              # 100x
    python scripts/bench_streaming.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from big_data___knowledge_graph_construction_with_llm_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: shards per source dir; with maxFilesPerTrigger=4 → 8 micro-batches
SHARDS = 32
FILES_PER_TRIGGER = 4

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint, ts timestamp"
)


def scale_events(e: DataFrame, copies: int) -> DataFrame:
    """Shifted event replicas: ids and USERS shift per copy (the 10x
    tier carries 10x the state keys — more users, not deeper
    histories), timestamps stay in the base range so watermark
    semantics are tier-identical."""
    out = None
    for c in range(copies):
        part = e.select(
            (F.col("event_id") + c * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + c * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        out = part if out is None else out.unionByName(part)
    return out


def _write_shards(df: DataFrame, out_dir: str) -> None:
    df.repartition(SHARDS).write.mode("overwrite").json(out_dir)


def _progress_dicts(query) -> list[dict]:
    out = []
    for p in query.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:  # StreamingQueryProgress object
            out.append(json.loads(p.json))
    return out


def _drain(
    stream: DataFrame,
    mode: str,
    ckpt: str,
    expected_rows: int,
    sink=None,
    done=None,
    timeout_s: float = 3600.0,
) -> dict:
    """Run a streaming frame to completion under ``availableNow`` and
    return the measurement. Termination is detected from PROGRESS, not
    ``awaitTermination()``: a ``ProcessingTimeTimeout`` stateful op
    never self-terminates (the engine keeps scheduling no-data
    timeout-check batches forever — see the operational note on
    ``streaming_funnel``), so the drain is complete when the cumulative
    ``numInputRows`` across data batches reaches the known source size.
    ``rows`` is the KNOWN source size, not summed progress: a
    ``foreachBatch`` body running several actions over-reports
    ``numInputRows`` (each action re-reads the v1 file-source slice).
    Wall includes query startup (a per-restart cost, honest for a
    drain) plus ≤ one 0.25s poll interval of detection latency.
    ``done`` (a zero-arg callable) overrides the row check — used for
    foreachBatch topologies, where the sink itself counts completed
    batches on the driver."""
    t0 = time.perf_counter()
    writer = (
        stream.writeStream.foreachBatch(sink)
        if sink is not None
        else stream.writeStream.format("noop").outputMode(mode)
    )
    q = writer.option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    # running maxima: recentProgress only retains the last ~100 entries,
    # so endless idle batches would rotate the data batches out
    seen = batches = state_rows = 0
    batch_ms: dict[str, int] = {}  # batchId -> triggerExecution ms (data batches)
    while time.perf_counter() - t0 < timeout_s:
        progress = _progress_dicts(q)
        seen = max(seen, sum(int(p.get("numInputRows", 0)) for p in progress))
        batches = max(
            batches, sum(1 for p in progress if int(p.get("numInputRows", 0)) > 0)
        )
        for p in progress:
            for op in p.get("stateOperators", []) or []:
                state_rows = max(state_rows, int(op.get("numRowsTotal", 0)))
            if int(p.get("numInputRows", 0)) > 0:
                ms = (p.get("durationMs") or {}).get("triggerExecution")
                if ms is not None:
                    batch_ms[str(p.get("batchId"))] = int(ms)
        finished = done() if done is not None else seen >= expected_rows
        if finished or not q.isActive:
            break
        time.sleep(0.25)
    wall = time.perf_counter() - t0
    q.stop()
    lat = sorted(batch_ms.values())
    return {
        "rows": expected_rows,
        "rows_reported": seen,
        "wall_s": round(wall, 2),
        "rows_per_s": round(expected_rows / wall, 1) if wall > 0 else -1.0,
        "batches": batches,
        "batch_ms_p50": lat[len(lat) // 2] if lat else None,
        "batch_ms_max": lat[-1] if lat else None,
        "state_rows_max": state_rows,
    }


def _read_stream(spark, src_dir: str, schema: str) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .json(src_dir)
    )


def main() -> None:
    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("WARN")
    work = tempfile.mkdtemp(prefix="bench-stream-")
    results: dict = {"sources": {}, "topologies": {}}

    def ckpt(name: str) -> str:
        return os.path.join(work, f"ckpt-{name}")

    # ---- source prep (deterministic; written once, reused) ----
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    event_tiers: dict[str, str] = {}
    for tier, copies in (("events_1x", 1), ("events_10x", 10), ("events_100x", 100)):
        src = os.path.join(work, tier)
        _write_shards(scale_events(events, copies), src)
        n = spark.read.schema(EVENT_SCHEMA).json(src).count()
        event_tiers[tier] = src
        results["sources"][tier] = {"rows": n, "shards": SHARDS}

    doc_tiers: dict[str, str] = {}
    for tier, rel in (
        ("docs_10x", ".scale/sf1/documents.parquet"),
        ("docs_100x", ".scale/sf10/documents.parquet"),
    ):
        path = os.path.join(REPO, rel)
        if not os.path.exists(path):
            print(f"bench_streaming: {rel} absent, skipping {tier}", file=sys.stderr)
            continue
        docs = spark.read.parquet(path).withColumn(
            # synthetic deterministic event time for the watermark path
            "ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.pmod("doc_id", F.lit(86_400))),
        )
        src = os.path.join(work, tier)
        _write_shards(docs, src)
        n = spark.read.schema(DOC_SCHEMA).json(src).count()
        doc_tiers[tier] = src
        results["sources"][tier] = {"rows": n, "shards": SHARDS}

    # ---- topologies ----
    from big_data___knowledge_graph_construction_with_llm_spark.streaming.events import (
        curate_stream,
        incremental_dedup_sink,
        stateful_dedup,
        stream_stream_interval_join,
        tumbling_counts,
    )
    from big_data___knowledge_graph_construction_with_llm_spark.streaming.stateful import (
        streaming_funnel,
    )

    topo: dict[str, dict] = {}
    expected_batches = SHARDS // FILES_PER_TRIGGER

    def rows_of(tier: str) -> int:
        return results["sources"][tier]["rows"]

    t = {}
    for tier, src in doc_tiers.items():
        stream = _read_stream(spark, src, DOC_SCHEMA)
        t[tier] = _drain(
            curate_stream(stream, min_tokens=3, watermark="1 hour"),
            "append",
            ckpt(f"curate-{tier}"),
            rows_of(tier),
        )
        print(f"curate_stream {tier}: {t[tier]}", file=sys.stderr)
    topo["curate_stream"] = t

    t = {}
    for tier, src in doc_tiers.items():
        store = os.path.join(work, f"fps-{tier}")
        emit = lambda df, bid: df.write.format("noop").mode("overwrite").save()  # noqa: E731
        sink = incremental_dedup_sink(store, "text", "doc_id", emit, lineage=f"bench-{tier}")
        done_batches = [0]

        def counted_sink(df, bid, _sink=sink, _done=done_batches):
            _sink(df, bid)
            _done[0] += 1

        stream = _read_stream(spark, src, DOC_SCHEMA)
        t[tier] = _drain(
            stream,
            "append",
            ckpt(f"incdedup-{tier}"),
            rows_of(tier),
            sink=counted_sink,
            done=lambda _d=done_batches: _d[0] >= expected_batches,
        )
        print(f"incremental_dedup_sink {tier}: {t[tier]}", file=sys.stderr)
    topo["incremental_dedup_sink"] = t

    # ---- store compaction: the landed 100x store's per-batch landing
    # partitions absorb into ONE marker-committed generation while the
    # ingest path stays valid. read-wall = one probe micro-batch
    # through the SAME sink (store read + anti-join dominates) before
    # vs after; the file census is the small-files story itself. ----
    if "docs_100x" in doc_tiers:
        from big_data___knowledge_graph_construction_with_llm_spark import fsutil
        from big_data___knowledge_graph_construction_with_llm_spark.streaming.events import (
            compact_fingerprint_store,
        )

        store = os.path.join(work, "fps-docs_100x")

        def probe_wall(tag: str) -> float:
            # DISTINCT texts per tag: the 'after' probe must run the
            # same novel-docs workload (store read + anti-join + emit +
            # landing write), not dedup the 'before' probe's texts away
            # and skip the emit/write legs
            probe = spark.createDataFrame(
                [
                    (10**12 + i, f"probe {tag} document number {i}",
                     "en", "probe", 20, None)
                    for i in range(1_000)
                ],
                DOC_SCHEMA,
            )
            s = incremental_dedup_sink(
                store,
                "text",
                "doc_id",
                lambda df, b: df.write.format("noop").mode("overwrite").save(),
                lineage=f"probe-{tag}",
            )
            t0 = time.perf_counter()
            s(probe, 0)
            return round(time.perf_counter() - t0, 2)

        wall_before = probe_wall("before")
        t0 = time.perf_counter()
        rep = compact_fingerprint_store(spark, store, min_batches=1)
        compact_wall = round(time.perf_counter() - t0, 2)
        results["store_compaction"] = {
            "absorbed_batches": rep["absorbed_batches"],
            "files_before": rep["files_before"],
            "files_after": rep["files_after"],
            "compact_wall_s": compact_wall,
            "probe_batch_wall_before_s": wall_before,
            "probe_batch_wall_after_s": probe_wall("after"),
            "landing_files_left": len(
                fsutil.list_files(spark, f"{store}/landing")
            ),
        }
        print(f"store_compaction: {results['store_compaction']}", file=sys.stderr)

    t = {}
    for tier, src in event_tiers.items():
        stream = _read_stream(spark, src, EVENT_SCHEMA)
        t[tier] = _drain(
            stateful_dedup(stream, ["event_id"]),
            "append",
            ckpt(f"dedup-{tier}"),
            rows_of(tier),
        )
        print(f"stateful_dedup {tier}: {t[tier]}", file=sys.stderr)
    topo["stateful_dedup"] = t

    t = {}
    for tier, src in event_tiers.items():
        stream = _read_stream(spark, src, EVENT_SCHEMA)
        t[tier] = _drain(
            tumbling_counts(stream, window="10 minutes"),
            "update",
            ckpt(f"tumbling-{tier}"),
            rows_of(tier),
        )
        print(f"tumbling_counts {tier}: {t[tier]}", file=sys.stderr)
    topo["tumbling_counts"] = t

    t = {}
    for tier, src in event_tiers.items():
        stream = _read_stream(spark, src, EVENT_SCHEMA)
        t[tier] = _drain(
            streaming_funnel(stream, ["view", "click", "purchase"]),
            "update",
            ckpt(f"funnel-{tier}"),
            rows_of(tier),
        )
        print(f"streaming_funnel {tier}: {t[tier]}", file=sys.stderr)
    topo["streaming_funnel"] = t

    # the transformWithState twin (Spark 4's successor API): runs only
    # where the `protobuf` package exists — Spark's Python state-server
    # protocol needs it, and this container lacks it (same gate as the
    # operator's e2e test)
    try:
        import google.protobuf  # noqa: F401

        from big_data___knowledge_graph_construction_with_llm_spark.streaming.stateful import (
            ROCKSDB_PROVIDER,
            streaming_funnel_tws,
        )

        t = {}
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
        try:
            for tier, src in event_tiers.items():
                stream = _read_stream(spark, src, EVENT_SCHEMA)
                t[tier] = _drain(
                    streaming_funnel_tws(stream, ["view", "click", "purchase"]),
                    "update",
                    ckpt(f"funnel-tws-{tier}"),
                    rows_of(tier),
                )
                print(f"streaming_funnel_tws {tier}: {t[tier]}", file=sys.stderr)
        finally:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        topo["streaming_funnel_tws"] = t
    except ImportError:
        print(
            "bench_streaming: protobuf absent, skipping streaming_funnel_tws",
            file=sys.stderr,
        )

    # the composed ingest topology DEPLOYMENT.md §1 prescribes: stream
    # curation (gates + watermark dedup + redaction) feeding the durable
    # store-backed exact-dedup sink — the end-to-end path a 100 TB
    # deployment actually runs at the ingest edge
    t = {}
    for tier, src in doc_tiers.items():
        store = os.path.join(work, f"fps-composed-{tier}")
        emit = lambda df, bid: df.write.format("noop").mode("overwrite").save()  # noqa: E731
        sink = incremental_dedup_sink(
            store, "text", "doc_id", emit, lineage=f"bench-composed-{tier}"
        )
        done_batches = [0]

        def counted_sink(df, bid, _sink=sink, _done=done_batches):
            _sink(df, bid)
            _done[0] += 1

        stream = _read_stream(spark, src, DOC_SCHEMA)
        t[tier] = _drain(
            curate_stream(stream, min_tokens=3, watermark="1 hour"),
            "append",
            ckpt(f"composed-{tier}"),
            rows_of(tier),
            sink=counted_sink,
            done=lambda _d=done_batches: _d[0] >= expected_batches,
        )
        print(f"curated_ingest {tier}: {t[tier]}", file=sys.stderr)
    topo["curated_ingest"] = t

    t = {}
    for tier, src in event_tiers.items():
        # two independent streaming reads of the same shard set: purchases
        # joined to the clicks that preceded them within 30 minutes. Input
        # rows = BOTH sides' scans (2x the tier), the honest denominator
        # for a two-source topology. Watermarked on both sides, so the
        # query self-terminates and state stays bounded by the interval.
        left = _read_stream(spark, src, EVENT_SCHEMA).filter(
            F.col("event_type") == "purchase"
        )
        right = _read_stream(spark, src, EVENT_SCHEMA).filter(
            F.col("event_type") == "click"
        )
        t[tier] = _drain(
            stream_stream_interval_join(left, right, within="30 minutes"),
            "append",
            ckpt(f"ssjoin-{tier}"),
            2 * rows_of(tier),
        )
        print(f"stream_stream_interval_join {tier}: {t[tier]}", file=sys.stderr)
    topo["stream_stream_interval_join"] = t

    results["topologies"] = topo

    # state-store provider comparison: the default in-memory
    # (HDFS-backed snapshot) provider vs RocksDB, on the topology with
    # the largest state (dedup horizon = 1.25M rows at the 100x tier).
    # RocksDB keeps state off-heap and incremental-checkpoints — the
    # provider a 100 TB deployment runs when per-partition state
    # outgrows executor heap; this measures what that insurance costs
    # at a state size the heap provider still handles comfortably.
    comparison: dict[str, dict] = {}
    src = event_tiers["events_100x"]
    for label, provider in (
        ("hdfs_backed", None),
        (
            "rocksdb",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        ),
    ):
        if provider is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        try:
            stream = _read_stream(spark, src, EVENT_SCHEMA)
            comparison[label] = _drain(
                stateful_dedup(stream, ["event_id"]),
                "append",
                ckpt(f"provider-{label}"),
                rows_of("events_100x"),
            )
            print(f"state_store {label}: {comparison[label]}", file=sys.stderr)
        except Exception as exc:
            comparison[label] = {"error": repr(exc)}
            print(f"state_store {label} failed: {exc!r}", file=sys.stderr)
        finally:
            if provider is not None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    results["state_store_comparison"] = comparison

    # Tier-over-tier scaling. At these volumes the drain wall is mostly
    # per-query/per-batch FIXED cost (startup + 8 batch schedulings), so
    # the load-bearing number is marginal_rows_per_s — the extra rows
    # divided by the extra wall between the smallest and largest tier,
    # i.e. the steady-state per-row rate with the fixed cost differenced
    # out. throughput_ratio approaching rows_ratio says the same thing
    # (wall ~flat while rows grew). state_rows_ratio tracks whether
    # state grows with KEYS (dedup horizons, users) or stays fixed
    # (window count) — the boundedness claim, measured.
    linearity: dict[str, dict] = {}
    for name, tiers in topo.items():
        keys = sorted(tiers, key=lambda k: results["sources"][k]["rows"])
        if len(keys) >= 2 and all(tiers[k]["rows_per_s"] > 0 for k in keys):
            lo, hi = keys[0], keys[-1]
            d_wall = tiers[hi]["wall_s"] - tiers[lo]["wall_s"]
            d_rows = results["sources"][hi]["rows"] - results["sources"][lo]["rows"]
            linearity[name] = {
                "tiers": [lo, hi],
                "rows_ratio": round(
                    results["sources"][hi]["rows"] / results["sources"][lo]["rows"], 2
                ),
                "throughput_ratio": round(
                    tiers[hi]["rows_per_s"] / tiers[lo]["rows_per_s"], 2
                ),
                "marginal_rows_per_s": round(d_rows / d_wall, 1)
                if d_wall > 0.05
                else None,
                "state_rows_ratio": round(
                    tiers[hi]["state_rows_max"] / tiers[lo]["state_rows_max"], 2
                )
                if tiers[lo]["state_rows_max"]
                else None,
            }
    results["linearity"] = linearity

    out_path = os.path.join(REPO, "BENCH_STREAM.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"written": out_path, "linearity": linearity}))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
