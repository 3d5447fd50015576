"""Core relational operators the reference exercises imperatively.

SURVEY.md §2.2/2.3/2.6/2.7 — here as composable DataFrame functions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def union_fill(frames: list[DataFrame], fill: str = "") -> DataFrame:
    """Union heterogeneous frames by column name, filling missing cells.

    Reference: ``pd.concat(df_list, ignore_index=True).fillna("")``
    (``Art-Knowledge-Graph-Local/ingestion/data_ingestion_batch.py:160``).
    ``unionByName(allowMissingColumns=True)`` is a zero-shuffle operator —
    partitions of every input are concatenated, so this is scan-speed at
    any scale.
    """
    if not frames:
        raise ValueError("union_fill needs at least one frame")
    out = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )
    string_cols = [f.name for f in out.schema.fields if f.dataType.typeName() == "string"]
    return out.na.fill(fill, subset=string_cols)


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list, k: int
) -> DataFrame:
    """Top-k rows per group via window ``row_number``.

    Scale note: a single hash-shuffle on the group keys; no global sort.
    ``order_cols`` must contain a unique tiebreaker for determinism.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def is_empty(df: DataFrame) -> bool:
    """Non-empty-frame guard without the reference's double full-scan
    anti-pattern (``count()`` twice,
    ``Art-Knowledge-Graph-AWS/ingestion/DataIngestionBatch.py:75-77``):
    ``isEmpty`` looks at the first non-empty partition only."""
    return df.isEmpty()


def range_join_bands(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Theta/range join of a big fact table into small value bands.

    The small side is broadcast, so the inequality predicate evaluates
    map-side (broadcast nested-loop) — no cartesian shuffle. For
    big×big range joins, pre-bucket both sides on ``floor(value/width)``
    and equi-join the bucket key first.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """As-of join: for each left row, latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key.

    Implemented as union + window ``last(ignoreNulls)`` — a single shuffle
    on ``on`` and one in-partition sort, instead of a per-row lookup. This
    is the shape that scales: the alternative (join + filter + row_number)
    materializes the full time-cross-product per key first.
    """
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_is_left", F.lit(1)
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(c) for c in right_vals],
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal ts => "<=" semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_vals:
        merged = merged.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return merged.filter(F.col("_is_left") == 1).drop("_is_left", "_ts")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
    spread_duplicates: bool = False,
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the other.

    A hot key that would land one monster partition is split across
    ``num_salts`` partitions: the skewed side gets a deterministic salt
    (hash of the whole row — note EXACT-duplicate rows hash identically
    and therefore share a salt; distinct rows under one hot key spread),
    the other side is replicated once per salt value, and the join key
    becomes ``(key, salt)``. Result is row-identical to the plain join.

    When the hot key's rows are themselves exact duplicates, set
    ``spread_duplicates=True``: the salt becomes a function of physical
    row position (``monotonically_increasing_id``) instead of content.
    That spreads identical rows too; it is safe because the salt only
    routes rows (the other side is replicated for every salt value), but
    the routing is no longer stable across different input layouts.

    AQE's skew-join splitting (on in ``session.get_spark``) handles
    moderate skew automatically; this is the manual tool for pathological
    keys or for non-AQE paths. Replication multiplies the other side by
    ``num_salts`` — use only when that side is much smaller than the hot
    partition it removes.

    Only join types that never emit unmatched ``other`` rows are allowed:
    a right/full join would emit each unmatched replicated row
    ``num_salts`` times.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "unmatched rows of the replicated side would appear num_salts times"
        )
    if spread_duplicates:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(num_salts))
    else:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts)
        )
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return left.join(right, [key, "_salt"], how).drop("_salt")


def sessionize(
    df: DataFrame, key: str, ts: str, gap_minutes: int
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event for the same key exceeds the gap.

    lag + cumulative-sum over one window — single shuffle on ``key``; the
    same algorithm works unchanged at any scale because session state never
    leaves the partition. (Streaming twin: ``session_window`` in
    ``streaming/events.py``.)

    TIMESTAMP_NTZ caveat: NTZ inputs are interpreted in the session time
    zone. With a UTC session zone (this engine's default, ``session.py``)
    wall-clock differences are exact; under a DST-observing session zone
    an NTZ gap that spans a transition is off by the DST shift — pin the
    session zone to UTC (or pass LTZ timestamps) for correct splits.
    """
    w = Window.partitionBy(key).orderBy(ts)
    gap_s = gap_minutes * 60
    # cast through TIMESTAMP so TIMESTAMP_NTZ inputs work too (NTZ has no
    # direct bigint cast); only differences are used, so the session-zone
    # reinterpretation cancels out.
    epoch = F.col(ts).cast("timestamp").cast("long")
    new_sess = (
        F.when(epoch - F.lag(epoch).over(w) > F.lit(gap_s), 1)
        .otherwise(0)
    )
    run = Window.partitionBy(key).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new", new_sess).withColumn(
        "session_id", F.sum("_new").over(run)
    ).drop("_new")


def funnel_times(
    df: DataFrame,
    key: str,
    ts: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel completion per key: for each ``key`` that started
    the funnel, the EARLIEST-completion timestamps ``t1..tk`` of the
    ``steps`` sequence (each step strictly after the previous one's
    chosen time; later steps NULL where the funnel stalls). The greedy
    earliest-first choice is the standard funnel semantics; without a
    horizon it is also optimal — completing via any witness implies
    completing via the earliest one. ``within_seconds`` bounds the whole
    funnel's span (t_k − t1) ANCHORED AT THE KEY'S EARLIEST STEP-1 TIME:
    evaluated per candidate step, so a too-late step leaves the later
    columns NULL rather than disqualifying an earlier valid prefix — but
    a key whose first attempt times out is reported stalled even if a
    LATER step-1 event would have completed inside its own window
    (per-attempt-window funnels restart the anchor; this operator
    deliberately does not — one anchor per key keeps the k-join chain
    free of per-attempt fan-out).

    Scale shape: one partial-aggregated ``min`` per step over only that
    step's events (filters push to the scan), chained by k−1 equi-joins
    on ``key`` — frames shrink at every stage, aggregation is hash-agg
    (hot keys safe), and there is no per-key event-list materialization
    (a ``collect_list`` funnel buffers a hot user's whole history in
    one task). k is the funnel length — single digits — so the join
    chain is short by construction.

    Times are epoch MICROSECONDS (``unix_micros``): truncating to
    seconds would erase the ordering of sub-second event sequences, and
    micros are exact in a long.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    epoch = F.unix_micros(F.col(ts).cast("timestamp"))
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(key)
        .agg(F.min(epoch).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(key), epoch.alias("_ts")
        )
        cond = F.col("_ts") > F.col(f"t{i - 1}")
        if within_seconds is not None:
            cond = cond & (
                F.col("_ts") - F.col("t1") <= int(within_seconds) * 1_000_000
            )
        nxt = (
            cur.join(ev, key)
            .filter(cond)
            .groupBy(key, *[f"t{j}" for j in range(1, i)])
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        # left join keeps stalled keys with NULL later steps
        cur = cur.join(
            nxt.select(key, *[f"t{j}" for j in range(1, i + 1)]).drop(
                *[f"t{j}" for j in range(1, i)]
            ),
            key,
            "left",
        )
    return cur


def funnel_counts(
    df: DataFrame,
    key: str,
    ts: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Funnel summary: one row per step with the number of keys
    reaching it — the conversion report over :func:`funnel_times`.
    Counts are non-increasing by construction. The one-row aggregate is
    pivoted into per-step rows with an explode INSIDE the plan (r14):
    the old driver ``head()`` + literal re-frame forced the whole
    funnel-join chain to execute at CONSTRUCTION time as its own jobs —
    an extra pass the consumer's single action now subsumes."""
    times = funnel_times(df, key, ts, type_col, steps, within_seconds)
    agg = times.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step"),
                        F.lit(steps[i - 1]).alias("event_type"),
                        F.col(f"n{i}").cast("long").alias("n_keys"),
                    )
                    for i in range(1, len(steps) + 1)
                ]
            )
        ).alias("_r")
    ).select("_r.step", "_r.event_type", "_r.n_keys")


def cohort_retention(
    df: DataFrame,
    key: str,
    ts: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: keys grouped by their FIRST-activity
    period (the cohort), counted as active per elapsed period —
    ``(cohort, periods_since, n_active)`` with ``periods_since`` 0 for
    the cohort period itself. ``period`` is any ``date_trunc`` unit
    (``day``/``week``/``month``/…).

    Scale shape: one partial-aggregated ``min`` per key (the cohort
    assignment), an equi-join back on ``key`` (both sides shrink to
    distinct (key, period) first, so the join carries activity rows,
    not raw events), then one aggregation of (cohort, periods_since,
    distinct key) — hash-aggs and one key-shuffle, no windows, no
    per-key lists. Elapsed periods are computed from the truncated
    timestamps' epoch difference for hour/day/week — exact under a UTC
    or fixed-offset session timezone (which ``session.py`` pins; under a
    DST-shifting zone a transition week spans 167/169 wall hours and the
    integer division would land one period off) — and via month
    arithmetic for month/quarter/year, which is DST-immune."""
    unit = period.lower()
    seconds = {"day": 86400, "week": 7 * 86400, "hour": 3600}
    trunc = F.date_trunc(unit, F.col(ts).cast("timestamp"))
    # null timestamps are junk rows, not activity — without the guard a
    # null period would become a (cohort, null) cell or poison min(_p)
    active = (
        df.filter(F.col(ts).isNotNull())
        .select(F.col(key), trunc.alias("_p"))
        .distinct()
    )
    first = active.groupBy(key).agg(F.min("_p").alias("_cohort"))
    joined = active.join(first, key)
    if unit in seconds:
        elapsed = (
            (F.col("_p").cast("long") - F.col("_cohort").cast("long"))
            / seconds[unit]
        ).cast("long")
    elif unit in ("month", "quarter", "year"):
        m = F.months_between(F.col("_p"), F.col("_cohort")).cast("long")
        elapsed = (
            m
            if unit == "month"
            else (m / (3 if unit == "quarter" else 12)).cast("long")
        )
    else:
        raise ValueError(f"unsupported period: {period!r}")
    return (
        joined.withColumn("periods_since", elapsed)
        .groupBy(F.col("_cohort").alias("cohort"), "periods_since")
        .agg(F.countDistinct(key).alias("n_active"))
    )
