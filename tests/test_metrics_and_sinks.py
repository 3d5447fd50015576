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
    sink = str(tmp_path / "job-metrics")

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
