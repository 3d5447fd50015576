"""Mergeable-sketch operators (Apache DataSketches via Spark built-ins).

The 100 TB pattern these exist for is the AT-REST SKETCH STORE — the
sketch twin of ``dedup.content_fingerprints``: aggregate once per
partition/day/source into a few-KB binary sketch, store it next to the
data, and answer every later rollup (any date range, any group subset)
by MERGING stored sketches — no rescan, no shuffle of raw data, ever.
All sketches here are mergeable by construction (HLL union, Theta set
algebra, KLL merge), which one-shot ``approx_count_distinct`` /
``percentile_approx`` are not.

Everything is a built-in JVM aggregate: one partial-aggregated shuffle
of (group, sketch) pairs per build, then driver-light merges.

``corpus_overlap`` is the dedup-adjacent headline: estimated
intersection / containment / Jaccard between two corpora from ONE scan
of each — no join, no candidate pairs — via Theta sketches over content
fingerprints. At 100 TB per side, that is the difference between "can
we quantify source overlap" and "we cannot afford to ask".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch_by(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col``: ``(group...,
    sketch binary)``. Store it partitioned by the group; ``lgk=12``
    gives ~1.6% relative standard error in ~4 KB per group (each +1
    halves the error-squared, doubles the size)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    )


def distinct_estimate(
    sketches: DataFrame, rollup_cols: list[str] | None = None
) -> DataFrame:
    """Roll stored HLL sketches up to any coarser grouping (``[]`` =
    grand total) and estimate the distinct count — the store answers
    the question the raw data would need a full rescan for."""
    merged = (
        sketches.groupBy(*rollup_cols)
        if rollup_cols
        else sketches.groupBy()
    ).agg(F.hll_union_agg("sketch").alias("_u"))
    return merged.select(
        *(rollup_cols or []),
        F.hll_sketch_estimate("_u").alias("n_distinct"),
    )


def theta_sketch_by(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group Theta sketch — like :func:`distinct_sketch_by` but
    supporting SET ALGEBRA at estimate time (union, intersection,
    difference), which HLL cannot do."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col).alias("sketch")
    )


def quantile_sketch_by(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 200
) -> DataFrame:
    """Per-group KLL(double) sketch for mergeable quantiles: store it
    and answer any later percentile over any group rollup without
    touching raw values again (``percentile_approx`` answers once and
    cannot merge)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "sketch"
        )
    )


def quantile_estimate(
    sketches: DataFrame,
    probabilities: list[float],
    rollup_cols: list[str] | None = None,
) -> DataFrame:
    """Merge stored KLL sketches to ``rollup_cols`` (``[]`` = global)
    and read the given quantiles as columns ``q_<pct>``.

    Spark exposes KLL merge only as a two-arg scalar
    (``kll_sketch_merge_double``), so the N-way merge is a JVM-side
    fold over the group's collected sketch list — fine for a sketch
    STORE, whose per-rollup-group sketch count (days × sub-groups) is
    bounded by construction, each a few KB."""
    merged = (
        (
            sketches.groupBy(*rollup_cols)
            if rollup_cols
            else sketches.groupBy()
        )
        .agg(F.collect_list("sketch").alias("_l"))
        .select(
            *(rollup_cols or []),
            F.aggregate(
                F.slice("_l", 2, 2_147_483_000),
                F.element_at("_l", 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("_m"),
        )
    )
    cols = [
        F.kll_sketch_get_quantile_double("_m", F.lit(float(p))).alias(
            f"q_{int(round(p * 100))}"
        )
        for p in probabilities
    ]
    return merged.select(*(rollup_cols or []), *cols)


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    text_col: str,
    normalize: bool = False,
) -> DataFrame:
    """Estimated content overlap between two corpora WITHOUT A JOIN:
    one row ``(n_a, n_b, n_intersection, n_union, containment_a_in_b,
    jaccard)`` from one scan of each side — Theta sketches over the
    same content identity ``dedup.content_fingerprints`` uses (the
    64-bit half; Theta hashes it again internally), so "overlap" means
    exact-duplicate documents, with ``normalize=True`` widening that to
    the fuzzy-exact class of ``dedup.dedup_normal_form``.

    Use it to answer "how much of source A is already inside source B"
    before paying for a dedup pass between them: estimates come with
    Theta's relative-error bounds and the scan cost is a map +
    partial-aggregate per side (a few KB crosses the wire per side).
    """
    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import (
        content_fingerprints,
    )

    # the id column content_fingerprints carries is unused here (the
    # sketch aggregates the hash alone) — a constant keeps the plan
    # trivial and Catalyst prunes it
    sa = content_fingerprints(
        a.select(F.lit(0).alias("_i"), text_col), text_col, "_i", normalize=normalize
    ).agg(F.theta_sketch_agg("_h64").alias("sketch"))
    sb = content_fingerprints(
        b.select(F.lit(0).alias("_i"), text_col), text_col, "_i", normalize=normalize
    ).agg(F.theta_sketch_agg("_h64").alias("sketch"))
    return overlap_from_theta(sa, sb)


def overlap_from_theta(a_sketches: DataFrame, b_sketches: DataFrame) -> DataFrame:
    """The :func:`corpus_overlap` estimate computed off STORED Theta
    sketches instead of raw text — the at-rest payoff: each side is a
    frame of ``sketch`` binaries (any number of rows, e.g. one per
    day/source partition as :func:`theta_sketch_by` writes them), merged
    with ``theta_union_agg`` and then pushed through the same set
    algebra. Asking "how much of A is in B" over any partition subset of
    two stored corpora costs a few KB of sketch reads — the raw text is
    never rescanned."""
    sa = a_sketches.agg(F.theta_union_agg("sketch").alias("sa"))
    sb = b_sketches.agg(F.theta_union_agg("sketch").alias("sb"))
    both = sa.crossJoin(sb)  # 1 row x 1 row — a parameter join, not data
    # an EMPTY side (zero sketch rows — e.g. a mistyped partition key in
    # the advertised subset use) unions to a NULL sketch whose estimate
    # is NULL; that must read as 0.0 overlap, not NULL-propagate through
    # every downstream gate under ANSI-off
    def _est(c):
        return F.coalesce(F.theta_sketch_estimate(c), F.lit(0.0))

    est = both.select(
        _est(F.col("sa")).alias("n_a"),
        _est(F.col("sb")).alias("n_b"),
        _est(F.theta_intersection("sa", "sb")).alias("n_intersection"),
        _est(F.theta_union("sa", "sb")).alias("n_union"),
    )
    return est.withColumns(
        {
            "containment_a_in_b": F.col("n_intersection")
            / F.greatest(F.col("n_a"), F.lit(1.0)),
            "jaccard": F.col("n_intersection")
            / F.greatest(F.col("n_union"), F.lit(1.0)),
        }
    )
