"""Tests for the mergeable-sketch operators (operators/sketches.py):
the at-rest sketch-store contract — build per-partition sketches once,
answer any later rollup by merge, never rescan — plus the no-join
corpus-overlap estimator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators.sketches import (
    corpus_overlap,
    distinct_estimate,
    distinct_sketch_by,
    quantile_estimate,
    quantile_sketch_by,
    theta_sketch_by,
)


def _events(spark):
    # 3 days x 700 distinct users, interleaved
    return spark.createDataFrame(
        [(i % 3, f"u{i % 700}", float(i)) for i in range(6000)],
        "day int, user string, v double",
    )


def test_hll_store_estimates_and_rollup(spark):
    """Per-day estimates within HLL's error envelope of the truth, and
    the grand-total rollup comes from the STORE (merging 3 sketches),
    matching a direct whole-corpus sketch exactly — the merge is
    lossless, which is what makes the store incremental."""
    df = _events(spark)
    store = distinct_sketch_by(df, ["day"], "user")
    per_day = {r["day"]: r["n_distinct"] for r in distinct_estimate(store, ["day"]).collect()}
    for d in (0, 1, 2):
        assert abs(per_day[d] - 700) / 700 < 0.05, per_day
    rolled = distinct_estimate(store).head()["n_distinct"]
    direct = distinct_estimate(distinct_sketch_by(df, [], "user")).head()["n_distinct"]
    assert rolled == direct
    assert abs(rolled - 700) / 700 < 0.05


def test_hll_store_is_incremental(spark):
    """Sketching two disjoint halves separately and merging equals
    sketching the whole — appends never require rescanning history."""
    df = _events(spark)
    halves = distinct_sketch_by(
        df.withColumn("half", (F.col("v") < 3000).cast("int")), ["half"], "user"
    )
    merged = distinct_estimate(halves).head()["n_distinct"]
    whole = distinct_estimate(distinct_sketch_by(df, [], "user")).head()["n_distinct"]
    assert merged == whole


def test_kll_store_quantiles(spark):
    """Merged per-day KLL sketches answer global quantiles within KLL's
    rank tolerance of the exact percentile."""
    df = _events(spark)
    q = quantile_estimate(quantile_sketch_by(df, ["day"], "v"), [0.5, 0.95]).head()
    exact = df.agg(
        F.expr("percentile(v, 0.5)").alias("p50"),
        F.expr("percentile(v, 0.95)").alias("p95"),
    ).head()
    assert abs(q["q_50"] - exact["p50"]) / exact["p50"] < 0.02
    assert abs(q["q_95"] - exact["p95"]) / exact["p95"] < 0.02
    # per-day rollup keeps the group column
    per_day = quantile_estimate(
        quantile_sketch_by(df, ["day"], "v"), [0.5], rollup_cols=["day"]
    )
    assert per_day.count() == 3 and "q_50" in per_day.columns


def test_corpus_overlap_without_join(spark):
    """Overlap of two corpora from one scan each: at this size Theta is
    exact, so intersection/union/containment/jaccard are the true
    values; normalize=True widens identity to the fuzzy-exact class."""
    a = spark.createDataFrame([(f"doc number {i}",) for i in range(1000)], "text string")
    b = spark.createDataFrame(
        [(f"doc number {i}",) for i in range(500, 2000)], "text string"
    )
    r = corpus_overlap(a, b, "text").head()
    assert (r["n_a"], r["n_b"], r["n_intersection"], r["n_union"]) == (
        1000.0,
        1500.0,
        500.0,
        2000.0,
    )
    assert r["containment_a_in_b"] == 0.5 and r["jaccard"] == 0.25
    # byte-exact misses reformatted copies; fuzzy-exact catches them
    b2 = spark.createDataFrame(
        [(f"DOC   Number {i}!",) for i in range(1000)], "text string"
    )
    assert corpus_overlap(a, b2, "text").head()["n_intersection"] == 0.0
    assert (
        corpus_overlap(a, b2, "text", normalize=True).head()["n_intersection"]
        == 1000.0
    )


def test_sketch_store_at_rest_round_trip(spark, tmp_path):
    """The headline contract, actually exercised through storage: write
    each sketch store to parquet, read it back in a FRESH session (new
    session state over the same JVM — a real catalog/conf boundary), and
    answer rollups from the stored binaries alone.

    - HLL: stored per-day sketches merge to the same grand total as a
      direct whole-corpus sketch (lossless merge survives the store).
    - KLL: stored per-day sketches answer global quantiles within the
      rank tolerance.
    - Theta: overlap_from_theta over two STORED per-day corpora stores
      equals corpus_overlap computed from the raw text — the raw data is
      never rescanned at estimate time.
    """
    from big_data___knowledge_graph_construction_with_llm_spark.operators.sketches import (
        overlap_from_theta,
    )

    df = _events(spark)
    hll_path = str(tmp_path / "hll_store")
    kll_path = str(tmp_path / "kll_store")
    distinct_sketch_by(df, ["day"], "user").write.parquet(hll_path)
    quantile_sketch_by(df, ["day"], "v").write.parquet(kll_path)

    a = spark.createDataFrame(
        [(i % 3, f"doc number {i}") for i in range(1000)], "day int, text string"
    )
    b = spark.createDataFrame(
        [(i % 3, f"doc number {i}") for i in range(500, 2000)], "day int, text string"
    )
    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import (
        content_fingerprints,
    )

    ta_path = str(tmp_path / "theta_a")
    tb_path = str(tmp_path / "theta_b")
    for src, path in ((a, ta_path), (b, tb_path)):
        # day rides along as the "id" column — same content identity
        # (_h64) corpus_overlap uses, stored per-day
        theta_sketch_by(
            content_fingerprints(src, "text", "day"), ["day"], "_h64"
        ).write.parquet(path)

    fresh = spark.newSession()
    stored_hll = fresh.read.parquet(hll_path)
    direct = distinct_estimate(distinct_sketch_by(df, [], "user")).head()["n_distinct"]
    assert distinct_estimate(stored_hll).head()["n_distinct"] == direct

    stored_kll = fresh.read.parquet(kll_path)
    q = quantile_estimate(stored_kll, [0.5]).head()["q_50"]
    exact = df.agg(F.expr("percentile(v, 0.5)").alias("p")).head()["p"]
    assert abs(q - exact) / exact < 0.02

    got = overlap_from_theta(
        fresh.read.parquet(ta_path), fresh.read.parquet(tb_path)
    ).head()
    want = corpus_overlap(a, b, "text").head()
    assert (got["n_a"], got["n_b"], got["n_intersection"], got["n_union"]) == (
        want["n_a"],
        want["n_b"],
        want["n_intersection"],
        want["n_union"],
    )
    assert got["n_intersection"] == 500.0  # truth at this exact-regime size
    # SELECTIVE merge — the store's whole point: overlap over a single
    # day partition of each store, no rescan of either corpus. day==0
    # holds doc numbers ≡ 0 (mod 3): a has 0..999, b has 500..1999 →
    # shared day-0 docs are {501, 504, ..., 999} = 167 of them (the
    # sides' day-0 residues differ: a's doc i at i%3, b's at i%3 too,
    # so day 0 is i%3==0 on both; intersection = multiples of 3 in
    # [500, 999] = 167)
    sub = overlap_from_theta(
        fresh.read.parquet(ta_path).filter(F.col("day") == 0),
        fresh.read.parquet(tb_path).filter(F.col("day") == 0),
    ).head()
    assert (sub["n_a"], sub["n_b"], sub["n_intersection"]) == (334.0, 500.0, 167.0)


def test_overlap_from_theta_empty_side_is_zero(spark):
    """An empty sketch side (mistyped/missing partition key in the
    subset use) must read as 0.0 overlap everywhere, never NULL — a
    NULL would silently falsify every downstream gate under ANSI-off."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.sketches import (
        overlap_from_theta,
    )

    df = spark.createDataFrame([(0, "a"), (1, "b")], "day int, v string")
    st = theta_sketch_by(df, ["day"], "v")
    empty = st.filter(F.col("day") == 99)
    r = overlap_from_theta(empty, st).head()
    assert (r["n_a"], r["n_intersection"], r["containment_a_in_b"], r["jaccard"]) == (
        0.0,
        0.0,
        0.0,
        0.0,
    )
    assert r["n_b"] == 2.0
    assert tuple(overlap_from_theta(empty, empty).head()) == (0.0,) * 6


def test_theta_sketch_by_groups(spark):
    """Grouped theta sketches: binary column per group, usable in later
    set algebra (smoke the estimate path)."""
    df = _events(spark)
    sk = theta_sketch_by(df, ["day"], "user")
    assert sk.count() == 3
    est = sk.select("day", F.theta_sketch_estimate("sketch").alias("n")).collect()
    for r in est:
        assert abs(r["n"] - 700) / 700 < 0.05
