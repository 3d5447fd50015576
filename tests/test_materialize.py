"""Tests for the pluggable materialization seam (materialize.py).

Verifies that operators route every lineage cut through
``materialize.materialize`` so deployments can swap the strategy
(localCheckpoint vs reliable checkpoint vs DISK_ONLY persist) without
touching operator code.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark import materialize as M
from big_data___knowledge_graph_construction_with_llm_spark.operators.graph_algos import (
    connected_components,
)


def test_default_is_local_checkpoint():
    assert M.get_materializer() is M.local_checkpoint


def test_using_materializer_scoped_restore():
    def fake(df):
        return df

    with M.using_materializer(fake):
        assert M.get_materializer() is fake
    assert M.get_materializer() is M.local_checkpoint


def test_counting_materializer_is_used_by_operators(spark):
    # inject a counting wrapper; connected_components must funnel every
    # lineage cut through the seam (symmetrize + init labels + 1/iter)
    calls = []

    def counting(df):
        calls.append(1)
        return M.local_checkpoint(df)

    e = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("y", "x")], "src string, dst string"
    )
    with M.using_materializer(counting):
        comp = {r["id"]: r["comp"] for r in connected_components(e).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # symmetrized edges + initial labels + >=1 iteration materialization
    assert len(calls) >= 3


def test_persist_disk_materializer_correct(spark):
    # swap in the lineage-preserving strategy and re-run an iterative
    # algorithm end to end: results must be identical
    e = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c")], "src string, dst string"
    )
    with M.using_materializer(M.persist_disk):
        comp = {r["id"]: r["comp"] for r in connected_components(e).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_reliable_checkpoint_materializer(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    out = M.reliable_checkpoint(df)
    assert out.count() == 10
    assert [r["x"] for r in out.orderBy("id").collect()] == [i * 2 for i in range(10)]
