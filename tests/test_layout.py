"""Data-layout management (`operators.layout`): small-file compaction,
range clustering, Z-order — with the skip claims verified against
executor `input_bytes`, not plan text."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators.layout import (
    clustering_stats,
    compact_small_files,
    decoded_scan_rows,
    file_stats,
    with_zorder,
    write_clustered,
    zorder_key,
)


def _corpus(spark, n=200_000):
    # deterministic payload wide enough that data pages dominate footers
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") * 37 % 1000).alias("a"),
        (F.col("id") * 61 % 1000).alias("b"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("layout") / "corpus")
    # arrival order (id), fragmented: every file carries the full a/b range
    _corpus(spark).repartition(16).write.parquet(p)
    return p


def test_file_stats_census(spark, corpus_path):
    st = file_stats(spark, corpus_path, target_file_bytes=1 << 30)
    assert st["n_files"] == 16
    assert st["total_bytes"] > 0
    assert st["min_file_bytes"] <= st["mean_file_bytes"] <= st["max_file_bytes"]
    assert st["n_small_files"] == 16  # all far below the 1 GiB target


def test_compact_small_files_preserves_data_and_shrinks_count(spark, tmp_path):
    p = str(tmp_path / "frag")
    df = _corpus(spark, 50_000)
    df.repartition(32).write.parquet(p)
    checksum = df.agg(F.sum(F.crc32("payload")).alias("c")).first()["c"]
    rep = compact_small_files(spark, p, target_file_bytes=1 << 30)
    assert rep["before"]["n_files"] == 32
    assert rep["after"]["n_files"] == 1
    out = spark.read.parquet(p)
    assert out.count() == 50_000
    assert out.agg(F.sum(F.crc32("payload")).alias("c")).first()["c"] == checksum


def test_compact_partitioned_rewrite(spark, tmp_path):
    p = str(tmp_path / "part")
    df = _corpus(spark, 20_000).withColumn("bucket", F.col("id") % 4)
    df.repartition(16).write.partitionBy("bucket").parquet(p)
    before = file_stats(spark, p)["n_files"]
    rep = compact_small_files(
        spark, p, target_file_bytes=1 << 30, partition_by=["bucket"]
    )
    assert rep["after"]["n_files"] < before
    out = spark.read.parquet(p)
    assert out.count() == 20_000
    # partition layout survives (pruning still works after compaction)
    assert "bucket" in out.columns
    assert out.filter(F.col("bucket") == 2).count() == 5_000


def test_compact_missing_path_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        compact_small_files(spark, str(tmp_path / "nope"))


def test_clustered_scan_skips_decoded_rows(spark, corpus_path, tmp_path_factory):
    clustered = str(tmp_path_factory.mktemp("layout") / "clustered")
    write_clustered(spark.read.parquet(corpus_path), clustered, ["a"], n_files=16)

    pred = (F.col("a") >= 100) & (F.col("a") < 150)  # ~5% of the domain
    n = spark.read.parquet(corpus_path).count()
    rand = decoded_scan_rows(spark.read.parquet(corpus_path).filter(pred))
    clus = decoded_scan_rows(spark.read.parquet(clustered).filter(pred))
    # the filter reaches the scan on both layouts
    plan = (
        spark.read.parquet(clustered)
        .filter(pred)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(a,100)" in plan
    # arrival-order layout cannot skip (every row group spans the full
    # domain → all rows decoded); range-clustered decodes a fraction
    assert rand == n
    assert clus < 0.3 * n
    # same answer on both layouts
    a = spark.read.parquet(corpus_path).filter(pred).orderBy("id").collect()
    b = spark.read.parquet(clustered).filter(pred).orderBy("id").collect()
    assert a == b
    # footer truth: clustered spans ~disjoint, fragmented spans overlap
    assert clustering_stats(clustered, "a")["overlap_fraction"] < 0.3
    assert clustering_stats(corpus_path, "a")["overlap_fraction"] > 0.7


def test_zorder_key_is_monotone_per_column(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"x": [0, 1, 2, 3, 0, 0], "y": [0, 0, 0, 0, 1, 2]})
    )
    rows = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
    ).collect()
    z = {(r["x"], r["y"]): r["z"] for r in rows}
    # with the other column fixed, the key is monotone in each column
    assert z[(0, 0)] < z[(1, 0)] < z[(2, 0)] < z[(3, 0)]
    assert z[(0, 0)] < z[(0, 1)] < z[(0, 2)]
    # interleave: x bit j at 2j, y bit j at 2j+1
    assert z[(1, 0)] == 1 and z[(0, 1)] == 2 and z[(3, 0)] == 5


def test_zorder_skips_on_both_columns(spark, corpus_path, tmp_path_factory):
    base = spark.read.parquet(corpus_path)
    xonly = str(tmp_path_factory.mktemp("layout") / "xonly")
    zpath = str(tmp_path_factory.mktemp("layout") / "zord")
    write_clustered(base, xonly, ["a"], n_files=16)
    zdf = with_zorder(base, ["a", "b"], bits=6)
    write_clustered(zdf, zpath, ["_zkey"], n_files=16)

    pred_b = (F.col("b") >= 100) & (F.col("b") < 150)
    n = base.count()
    on_x = decoded_scan_rows(spark.read.parquet(xonly).filter(pred_b))
    on_z = decoded_scan_rows(spark.read.parquet(zpath).filter(pred_b))
    # clustering on `a` alone serves only `a`: a filter on `b` decodes
    # everything; the z-ordered layout skips on EITHER column
    assert on_x == n
    assert on_z < 0.6 * n
    # and a filter on `a` still skips on the z layout too
    pred_a = (F.col("a") >= 100) & (F.col("a") < 150)
    za = decoded_scan_rows(spark.read.parquet(zpath).filter(pred_a))
    assert za < 0.6 * n
    # correctness: identical rows from every layout
    want = sorted(
        r["id"] for r in base.filter(pred_b).select("id").collect()
    )
    got = sorted(
        r["id"] for r in spark.read.parquet(zpath).filter(pred_b).select("id").collect()
    )
    assert got == want


def test_with_zorder_bucketing_is_equal_frequency(spark):
    # heavily skewed column: equal-width bucketing would dump ~all rows
    # in one bucket; the quantile bucketing spreads them
    df = spark.range(10_000).select(
        (F.when(F.col("id") < 9_000, F.col("id") % 10)
         .otherwise(F.col("id"))).alias("skew"),
        (F.col("id") % 100).alias("u"),
    )
    out = with_zorder(df, ["skew", "u"], bits=4)
    n_keys = out.select("_zkey").distinct().count()
    assert n_keys > 16  # >2**bits ⇒ both columns contribute spread
