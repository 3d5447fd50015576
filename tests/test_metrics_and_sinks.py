"""Tests for the metrics continuity module (monitor-shaped records from
Spark's status store) and the Neo4j sink's pure Cypher layer.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.metrics import (
    MetricsCollector,
    monitor_job,
    observed,
)
from big_data___knowledge_graph_construction_with_llm_spark.sources.neo4j_sink import (
    merge_edges_cypher,
    merge_nodes_cypher,
    sanitize_identifier,
)


def test_metrics_collector_record_shape(spark):
    mc = MetricsCollector(spark)
    mc.start()
    spark.range(100000).groupBy((F.col("id") % 5).alias("k")).count().collect()
    rec = mc.finish("test_job")
    # reference-shaped prefix (monitor.py:32-41)
    assert rec["job"] == "test_job"
    assert rec["end_time"] >= rec["start_time"]
    assert rec["elapsed_seconds"] >= 0
    # the job above shuffled: executor counters must have moved
    assert rec["tasks"] > 0
    assert rec["shuffle_write_bytes"] > 0


def test_monitor_job_decorator_writes_record(spark, tmp_path):
    """The metrics record must land on the filesystem named by
    sink_path — a `file:` URI here, standing in for the reference's
    s3 metrics bucket — not silently on the driver's local cwd."""
    sink = f"file://{tmp_path}/job-metrics"

    @monitor_job(spark, "ingestion_parsing", sink_path=sink)
    def run():
        return spark.range(1000).count()

    assert run() == 1000
    files = list((tmp_path / "job-metrics").glob("ingestion_parsing_*.json"))
    assert len(files) == 1
    rec = json.loads(files[0].read_text())
    assert rec["job"] == "ingestion_parsing"
    assert set(rec) >= {"start_time", "end_time", "elapsed_seconds", "tasks"}


def test_observed_row_counts(spark):
    df = observed(spark.range(500).filter(F.col("id") % 2 == 0), "obs")
    df.write.format("noop").mode("overwrite").save()
    # observation arrives with execution
    obs = df.collect()  # re-executes; observe still reports
    assert len(obs) == 250


def test_sanitize_identifier():
    assert sanitize_identifier("Person") == "Person"
    assert sanitize_identifier("oil painting") == "oilpainting"
    # the injection from the reference defect list, defused
    assert (
        sanitize_identifier("X`) DETACH DELETE (n") == "XDETACHDELETEn"
    )
    assert sanitize_identifier("") == "Entity"
    assert sanitize_identifier("   ") == "Entity"
    assert sanitize_identifier("9lives") == "_9lives"
    assert sanitize_identifier("", default="RELATED") == "RELATED"


def test_merge_cypher_shapes():
    assert merge_nodes_cypher("Art Work") == (
        "UNWIND $batch AS row MERGE (n:`ArtWork` {name: row.name})"
    )
    edge = merge_edges_cypher("painted by`]->(x) MATCH (y) DETACH DELETE y //")
    # injection collapsed into a single safe identifier
    assert "`paintedbyxMATCHyDETACHDELETEy`" in edge
    assert edge.count("MERGE") == 3


def test_write_graph_partition_wiring_with_injected_driver(spark, tmp_path):
    """End-to-end foreachPartition wiring without a server: a fake driver
    (defined in-test — cloudpickle ships test-module classes by
    reference, so helpers must live inside the function) records every
    (cypher, batch) call to disk. Asserts batching, per-rel grouping,
    sanitized rel types, and MERGE-only statements."""
    import json as _json
    import os
    import uuid

    from big_data___knowledge_graph_construction_with_llm_spark.sources.neo4j_sink import write_graph

    outdir = str(tmp_path / "calls")
    os.makedirs(outdir, exist_ok=True)

    def factory(_dir=outdir):
        class FakeSession:
            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def run(self, cypher, batch):
                p = os.path.join(_dir, f"{uuid.uuid4().hex}.json")
                with open(p, "w") as fh:
                    _json.dump({"cypher": cypher, "batch": batch}, fh)

        class FakeDriver:
            def session(self):
                return FakeSession()

            def close(self):
                pass

        return FakeDriver()

    rows = [(f"s{i}", f"t{i}", "painted by" if i % 2 else "DEPICTS") for i in range(20)]
    edges = spark.createDataFrame(
        rows, "src string, dst string, relationship string"
    ).repartition(3)
    write_graph(edges, batch_size=4, driver_factory=factory)

    calls = []
    for f in os.listdir(outdir):
        with open(os.path.join(outdir, f)) as fh:
            calls.append(_json.load(fh))
    # every edge arrives exactly once
    seen = sorted(
        (r["src"], r["dst"]) for c in calls for r in c["batch"]
    )
    assert seen == sorted((s, t) for s, t, _ in rows)
    # UNWIND batches never exceed batch_size and group one rel each
    assert all(len(c["batch"]) <= 4 for c in calls)
    assert all(
        c["cypher"].startswith("UNWIND $batch AS row") for c in calls
    )
    rels = {c["cypher"].split("[r:`")[1].split("`")[0] for c in calls}
    # sanitized: space stripped from 'painted by'
    assert rels == {"paintedby", "DEPICTS"}
    assert all("MERGE" in c["cypher"] and "DELETE" not in c["cypher"] for c in calls)


def test_write_graph_requires_uri_or_factory(spark):
    import pytest
    from big_data___knowledge_graph_construction_with_llm_spark.sources import neo4j_sink

    edges = spark.createDataFrame(
        [("a", "b", "r")], "src string, dst string, relationship string"
    )
    with pytest.raises((NotImplementedError, ValueError)):
        neo4j_sink.write_graph(edges)


def test_sanitize_identifier_col_matches_python(spark):
    """The expression twin must agree with sanitize_identifier on every
    edge case the Python version handles."""
    from pyspark.sql import functions as F

    from big_data___knowledge_graph_construction_with_llm_spark.sources.neo4j_sink import (
        sanitize_identifier,
        sanitize_identifier_col,
    )

    cases = ["Artist", "oil painting", "3dmodel", "", None, "a-b.c", "  x  ", "__ok__", "é$ü"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r["o"] for r in df.select(sanitize_identifier_col(F.col("s")).alias("o")).collect()]
    want = [sanitize_identifier(c or "") for c in cases]
    assert got == want


def test_export_neo4j_bulk_csv_layout(spark, tmp_path):
    """Bulk-import layout: header as its own single-line file, data part
    files header-less (neo4j-admin reads only the first line of the
    first file in a group as a header), ONE node row per id with
    ;-joined multi-labels, RFC4180 doubled-quote escaping, and the
    Cypher sink's RELATED fallback for unsanitizable types."""
    import csv
    import glob

    from big_data___knowledge_graph_construction_with_llm_spark.sources.neo4j_sink import export_neo4j_bulk_csv

    verts = spark.createDataFrame(
        [
            ("Tiziano", "Person"),
            ("Tiziano", "Artist"),          # multi-label, same id
            ('The "Night Watch"', "art work"),
        ],
        "id string, label string",
    )
    edges = spark.createDataFrame(
        [
            ("Tiziano", 'The "Night Watch"', "born-in"),
            ("Tiziano", 'The "Night Watch"', "born-in"),  # dup collapses
            ("Tiziano", "Tiziano", "!!!"),                # -> RELATED fallback
        ],
        "src string, dst string, relationship string",
    )
    out = str(tmp_path / "bulk")
    export_neo4j_bulk_csv(verts, edges, out)

    assert open(f"{out}/nodes_header.csv").read() == "name:ID,label:LABEL\n"
    assert open(f"{out}/rels_header.csv").read() == ":START_ID,:END_ID,:TYPE\n"

    def read_data(subdir):
        rows = []
        for f in sorted(glob.glob(f"{out}/{subdir}/part-*.csv")):
            with open(f) as fh:
                rows.extend(csv.reader(fh))  # RFC4180: stdlib csv parses it
        return sorted(rows)

    assert read_data("nodes") == [
        ['The "Night Watch"', "artwork"],
        ["Tiziano", "Artist;Person"],
    ]
    assert read_data("rels") == [
        ["Tiziano", 'The "Night Watch"', "bornin"],
        ["Tiziano", "Tiziano", "RELATED"],
    ]


def test_write_graph_retries_transient_and_stays_idempotent(spark, tmp_path):
    """Full bolt-session lifecycle against a scripted fake driver:
    - one (auto-commit) tx per UNWIND batch, each in a FRESH session,
      and every session is closed;
    - the FIRST run() raises a TransientError → the batch is retried in
      a new session and the data still arrives exactly once;
    - a non-transient error is NOT retried (fails fast);
    - MERGE idempotence under task retry: replaying the whole write
      leaves the upserted store unchanged (SURVEY §7 hard-point 4)."""
    import json as _json
    import os
    import uuid

    from big_data___knowledge_graph_construction_with_llm_spark.sources.neo4j_sink import write_graph

    outdir = str(tmp_path / "bolt")
    os.makedirs(outdir, exist_ok=True)

    def factory(_dir=outdir):
        class TransientError(Exception):  # duck-typed by class NAME
            pass

        class FakeSession:
            def __init__(self):
                self.sid = uuid.uuid4().hex
                self.closed = False

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                self.closed = True
                with open(os.path.join(_dir, f"close-{self.sid}"), "w"):
                    pass
                return False

            def run(self, cypher, batch):
                flag = os.path.join(_dir, "fail-once")
                if not os.path.exists(flag):
                    with open(flag, "w"):
                        pass
                    raise TransientError("leader switch, retry me")
                # MERGE semantics: upsert keyed on (cypher, src, dst)
                for r in batch:
                    key = f"{hash((cypher, r['src'], r['dst'])) & 0xFFFFFFFF:08x}"
                    with open(os.path.join(_dir, f"edge-{key}.json"), "w") as fh:
                        _json.dump({"cypher": cypher, **r}, fh)
                with open(os.path.join(_dir, f"run-{uuid.uuid4().hex}"), "w"):
                    pass

        class FakeDriver:
            def session(self):
                return FakeSession()

            def close(self):
                with open(os.path.join(_dir, f"driverclose-{uuid.uuid4().hex}"), "w"):
                    pass

        return FakeDriver()

    rows = [(f"s{i}", f"t{i}", "DEPICTS") for i in range(8)]
    edges = spark.createDataFrame(
        rows, "src string, dst string, relationship string"
    ).coalesce(1)
    write_graph(edges, batch_size=4, driver_factory=factory, max_batch_retries=3)

    names = os.listdir(outdir)
    store = sorted(n for n in names if n.startswith("edge-"))
    assert len(store) == 8                       # every edge exactly once
    runs = [n for n in names if n.startswith("run-")]
    assert len(runs) == 2                        # 8 rows / batch_size 4
    closes = [n for n in names if n.startswith("close-")]
    assert len(closes) == 3                      # 2 ok txs + 1 failed attempt
    assert [n for n in names if n.startswith("driverclose-")]

    # task retry replay: same input again → store unchanged (MERGE upsert)
    write_graph(edges, batch_size=4, driver_factory=factory, max_batch_retries=3)
    assert sorted(
        n for n in os.listdir(outdir) if n.startswith("edge-")
    ) == store

    # non-transient errors must fail fast (no retry loop)
    def bad_factory(_dir=outdir):
        class SyntaxError_(Exception):
            pass

        class S:
            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def run(self, cypher, batch):
                with open(os.path.join(_dir, f"badrun-{uuid.uuid4().hex}"), "w"):
                    pass
                raise SyntaxError_("bad cypher")

        class D:
            def session(self):
                return S()

            def close(self):
                pass

        return D()

    import pytest as _pytest

    with _pytest.raises(Exception, match="bad cypher|SyntaxError|Py4J"):
        write_graph(edges.coalesce(1), batch_size=100, driver_factory=bad_factory)
    assert len([n for n in os.listdir(outdir) if n.startswith("badrun-")]) == 1


def test_fsutil_roundtrip_and_delete(spark, tmp_path):
    """Hadoop-FS helpers: write/read/exists/delete round-trip on a
    local path (same code path as hdfs:///s3a: — only the scheme's
    FileSystem impl differs)."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil

    p = str(tmp_path / "nested" / "marker.txt")
    assert not fsutil.exists(spark, p)
    fsutil.write_text(spark, p, "attempt-abc\n")
    assert fsutil.exists(spark, p)
    assert fsutil.read_text(spark, p) == "attempt-abc\n"
    fsutil.write_text(spark, p, "overwritten")       # create(True) semantics
    assert fsutil.read_text(spark, p) == "overwritten"
    assert fsutil.delete(spark, p)
    assert not fsutil.exists(spark, p)


def test_fsutil_mtime(spark, tmp_path):
    """mtime goes through the Hadoop FS API: real millis for an existing
    path (including via a file: URI), 0 for a missing one."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil

    p = str(tmp_path / "stamp.txt")
    assert fsutil.mtime(spark, p) == 0
    fsutil.write_text(spark, p, "x")
    t = fsutil.mtime(spark, p)
    assert t > 1_500_000_000_000  # epoch millis, not seconds
    assert fsutil.mtime(spark, f"file://{p}") == t


def test_ivf_cache_path_scheme_agnostic(spark, tmp_path, monkeypatch):
    """The registry's IVF cache key must work when sf is a file: URI
    (standing in for s3a://) — same key as the plain-path spelling of
    the same dir would get after the mtime probe, different key once
    the embeddings table is regenerated, and the cache ROOT honors
    SPARK_GRAFT_IVF_CACHE so a cluster can point it at shared storage."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.plans.textdata_queries import (
        _ivf_cache_path,
    )

    sf = tmp_path / "sfX"
    sf.mkdir()
    uri = f"file://{sf}"
    p0 = _ivf_cache_path(spark, uri)          # embeddings absent -> mtime 0
    assert p0.startswith("/tmp") or "spark_graft_ivf_" in p0
    fsutil.write_text(spark, f"{uri}/embeddings.parquet", "v1")
    p1 = _ivf_cache_path(spark, uri)
    assert p1 != p0                           # regenerated table -> new key
    monkeypatch.setenv("SPARK_GRAFT_IVF_CACHE", f"file://{tmp_path}/cache-root")
    p2 = _ivf_cache_path(spark, uri)
    assert p2.startswith(f"file://{tmp_path}/cache-root/spark_graft_ivf_")
