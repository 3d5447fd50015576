"""Declarative data-validation (expectations) for pipeline gates.

A 100 TB curation run cannot afford one scan per check, and it cannot
afford checks that silently sample. This module computes EVERY scalar
expectation — null-completeness, ranges, regex compliance, set
membership, uniqueness, custom predicates — in ONE aggregate pass over
the frame (violation counters are `sum(when(...))` expressions and
`count_distinct` twins folded into a single `agg`), and only
referential-integrity rules (which inherently need the other table)
add anti-joins — all of them unioned into ONE further job, each
reference side deduplicated first so it broadcasts when bounded.

Null semantics, chosen to keep rules composable (the Deequ
convention): value rules (`in_range` / `matches` / `in_set`) PASS null
values — completeness is `not_null`'s job, so "95% complete and 100%
in-range" decompose cleanly; `satisfies` is raw three-valued logic
where NULL counts as a violation (documented at the factory).

The reference validates only tolerantly-parsed LLM output (required
keys `subject/relation/object`, `…Local/main.py:70` — covered by
`pipeline.py:146`); this module is the EXT generalization for the
training-data north star.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rule kinds — "row" and "unique" fold into the single agg pass;
#: "foreign_key" costs one anti-join against the (deduplicated) ref
_KINDS = ("row", "unique", "foreign_key")


@dataclass
class Rule:
    name: str
    kind: str
    predicate: Column | None = None  # row kind: True/None-passes-by-factory
    cols: list[str] = field(default_factory=list)  # unique kind
    ref: DataFrame | None = None  # foreign_key kind
    ref_col: str | None = None
    col: str | None = None

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown rule kind {self.kind!r}")


def not_null(col: str) -> Rule:
    """Completeness: every value present."""
    return Rule(f"not_null({col})", "row", F.col(col).isNotNull())


def in_range(col: str, lo=None, hi=None) -> Rule:
    """Bounds (inclusive); one-sided when only ``lo`` or ``hi`` given.
    Null values pass — pair with :func:`not_null` for completeness."""
    if lo is None and hi is None:
        raise ValueError("in_range needs lo and/or hi")
    c = F.col(col)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (c >= lo)
    if hi is not None:
        pred = pred & (c <= hi)
    return Rule(
        f"in_range({col},{lo},{hi})", "row", F.coalesce(pred, F.lit(True))
    )


def matches(col: str, pattern: str) -> Rule:
    """Full-value regex compliance. ``rlike`` alone is a SUBSTRING
    match ('[0-9]+' would pass 'abc123'), so the pattern is anchored
    internally as ``^(?:pattern)$`` — already-anchored patterns stay
    equivalent. Null values pass."""
    return Rule(
        f"matches({col})",
        "row",
        F.coalesce(F.col(col).rlike(f"^(?:{pattern})$"), F.lit(True)),
    )


def in_set(col: str, values) -> Rule:
    """Domain membership. Null values pass."""
    return Rule(
        f"in_set({col})",
        "row",
        F.coalesce(F.col(col).isin(list(values)), F.lit(True)),
    )


def satisfies(name: str, predicate: Column) -> Rule:
    """Custom row predicate under raw three-valued logic: a NULL result
    is a violation (use ``F.coalesce(pred, F.lit(True))`` yourself for
    null-passes semantics)."""
    return Rule(f"satisfies({name})", "row", predicate)


def unique(*cols: str) -> Rule:
    """Key uniqueness over ``cols`` (violations = rows beyond the first
    of each duplicated key). Folded into the same single aggregate pass
    as the row rules via a ``count_distinct`` twin."""
    if not cols:
        raise ValueError("unique needs at least one column")
    return Rule(f"unique({','.join(cols)})", "unique", cols=list(cols))


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> Rule:
    """Referential integrity: every non-null ``col`` exists in
    ``ref[ref_col]``. Costs one left-anti join; the reference side is
    projected + deduplicated first so a bounded dimension broadcasts."""
    return Rule(
        f"foreign_key({col}->{ref_col})",
        "foreign_key",
        ref=ref,
        ref_col=ref_col,
        col=col,
    )


def _scalar_report_frame(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """The ONE-scan aggregate carrying every scalar rule's violation
    counter (``_n`` + one ``_v{i}`` per row/unique rule) as a single
    1-row frame — exposed so the one-pass claim is plan-assertable
    (``tests/test_validate.py``)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        if r.kind == "row":
            aggs.append(
                # outer coalesce: sum over ZERO rows is NULL, and an
                # empty append batch at a gate must report 0, not crash
                F.coalesce(
                    F.sum(
                        F.when(
                            ~F.coalesce(r.predicate, F.lit(False)), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(f"_v{i}")
            )
        elif r.kind == "unique":
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(F.struct(*[F.col(c) for c in r.cols]))
                ).alias(f"_v{i}")
            )
    return df.agg(*aggs)


def _fk_violations_frame(df: DataFrame, rule: Rule) -> DataFrame:
    """The rows of ``df`` whose non-null ``rule.col`` is absent from the
    reference — the anti-join every foreign-key check shares (counted
    by :func:`validate`, returned whole by :func:`failed_keys`)."""
    ref_keys = rule.ref.select(
        F.col(rule.ref_col).alias(rule.col)
    ).distinct()
    return df.where(F.col(rule.col).isNotNull()).join(
        ref_keys, rule.col, "left_anti"
    )


def _fk_report_frame(df: DataFrame, rules: list[Rule]) -> DataFrame | None:
    """ALL foreign-key rules' violation counts as one unioned frame
    ``(_i rule-index, _v count)`` — a single action covers every
    referential rule instead of serializing one ``count()`` job each.
    ``None`` when no foreign-key rule is present. Exposed so the
    one-job claim is plan-assertable (``tests/test_validate.py``)."""
    branches = [
        _fk_violations_frame(df, r).agg(
            F.lit(i).alias("_i"), F.count(F.lit(1)).alias("_v")
        )
        for i, r in enumerate(rules)
        if r.kind == "foreign_key"
    ]
    if not branches:
        return None
    merged = branches[0]
    for b in branches[1:]:
        merged = merged.unionByName(b)
    return merged


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run every rule and return the report frame ``(rule, kind,
    violations, n_rows, ok)`` — all row + unique rules in ONE scan of
    ``df``, and all foreign-key rules in ONE more job (their per-rule
    anti-join counts union into a single action, so N referential rules
    don't serialize N jobs). The report is driver-assembled (its size
    is the rule count) so gating code can ``collect()`` it for free."""
    spark = df.sparkSession
    row = _scalar_report_frame(df, rules).first()
    n = int(row["_n"])
    merged = _fk_report_frame(df, rules)
    fk_counts: dict[int, int] = (
        {int(x["_i"]): int(x["_v"]) for x in merged.collect()}
        if merged is not None
        else {}
    )
    records = []
    for i, r in enumerate(rules):
        v = fk_counts[i] if r.kind == "foreign_key" else int(row[f"_v{i}"])
        records.append((r.name, r.kind, v, n, v == 0))
    return spark.createDataFrame(
        records, "rule string, kind string, violations long, n_rows long, ok boolean"
    )


def failed_keys(df: DataFrame, rule: Rule) -> DataFrame:
    """Quarantine for SET-level rules — the keyed chase
    :func:`failed_rows` (row rules only) can't do:

    - ``unique``: ALL rows of every duplicated key, with the family
      size in ``_n_dupes`` (the investigator wants the whole family;
      note :func:`validate` counts only rows-beyond-first, so its
      ``violations`` ≤ this frame's row count). One shuffle on the key
      (window count).
    - ``foreign_key``: the rows whose non-null key misses the
      reference — the same anti-join :func:`validate` counts, returned
      whole (reference side deduplicated, broadcasts when bounded).

    Both add a ``_violations`` array naming the rule, matching the
    :func:`failed_rows` quarantine schema convention."""
    from pyspark.sql.window import Window

    tag = F.array(F.lit(rule.name)).alias("_violations")
    if rule.kind == "unique":
        w = Window.partitionBy(*[F.col(c) for c in rule.cols])
        return (
            df.withColumn("_n_dupes", F.count(F.lit(1)).over(w))
            .where(F.col("_n_dupes") > 1)
            .withColumn("_violations", tag)
        )
    if rule.kind == "foreign_key":
        return _fk_violations_frame(df, rule).withColumn("_violations", tag)
    raise ValueError(
        f"failed_keys handles unique/foreign_key rules, not {rule.kind!r}"
        " (row rules quarantine via failed_rows)"
    )


def failed_rows(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Rows violating any ROW-kind rule, with the violated rule names
    in a ``_violations`` array — the quarantine side of the gate
    (unique / foreign-key rules are set-level; chase their violators
    with :func:`failed_keys`).
    Pure projection + filter: pushes down, streams, never shuffles."""
    row_rules = [r for r in rules if r.kind == "row"]
    if not row_rules:
        raise ValueError("failed_rows needs at least one row-kind rule")
    arr = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(r.predicate, F.lit(False)), F.lit(r.name)
                )
                for r in row_rules
            ]
        )
    )
    return df.withColumn("_violations", arr).where(F.size("_violations") > 0)


def assert_valid(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Gate form: return the report if everything passes, raise
    ``ValueError`` naming the failed rules (with counts) otherwise."""
    report = validate(df, rules)
    bad = [r for r in report.collect() if not r["ok"]]
    if bad:
        detail = ", ".join(f"{r['rule']}={r['violations']}" for r in bad)
        raise ValueError(f"validation failed: {detail}")
    return report


#: dtypes profiled with numeric moments (mean/stddev)
_NUMERIC_TYPES = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "decimal",
)

#: dtypes whose min/max are meaningful and cheaply stringified
_ORDERABLE_TYPES = _NUMERIC_TYPES + ("string", "date", "timestamp", "boolean")


def profile_table(
    df: DataFrame, cols: list[str] | None = None, rsd: float = 0.05
) -> DataFrame:
    """One-pass column profile — the audit a curation run records
    before writing expectations: per column ``(column, dtype, n,
    nulls, null_frac, approx_distinct, min, max, mean, stddev)``, with
    min/max stringified for a uniform schema and mean/stddev null for
    non-numerics.

    Everything folds into ONE ``agg`` over one scan (the same
    discipline as :func:`validate`): null counters are
    ``count(when(isnull))``, distincts are ``approx_count_distinct``
    (HLL, ``rsd`` relative error — an exact count-distinct per column
    would be one shuffle EACH), moments are partial-aggregated. The
    wide single row reshapes to one row per column on the driver —
    O(columns), not O(rows). Complex types (arrays/maps/structs/
    binary) profile counts and distincts only (distinct over their
    canonical string form)."""
    names = list(cols) if cols is not None else df.columns
    types = dict(df.dtypes)
    unknown = [c for c in names if c not in types]
    if unknown:
        raise ValueError(f"no such columns: {unknown} (have {df.columns})")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(names):
        t = types[c]
        base = t.split("(")[0]
        col = F.col(c)
        orderable = base in _ORDERABLE_TYPES
        numeric = base in _NUMERIC_TYPES
        # distinct over a canonical string for non-orderable types so
        # HLL has a hashable scalar (arrays/structs stringify stably)
        dcol = col if orderable else F.to_json(F.struct(col))
        aggs += [
            F.count(F.when(col.isNull(), 1)).alias(f"_null_{i}"),
            F.approx_count_distinct(dcol, rsd).alias(f"_dist_{i}"),
            (F.min(col).cast("string") if orderable else F.lit(None)).alias(
                f"_min_{i}"
            ),
            (F.max(col).cast("string") if orderable else F.lit(None)).alias(
                f"_max_{i}"
            ),
            (
                # decimal columns avg to decimal: normalize to double
                F.avg(col).cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"_mean_{i}"),
            (
                F.stddev(col).cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"_std_{i}"),
        ]
    row = df.agg(*aggs).collect()[0]
    n = row["_n"]
    out = [
        (
            c,
            types[c],
            n,
            row[f"_null_{i}"],
            round(row[f"_null_{i}"] / n, 6) if n else None,
            row[f"_dist_{i}"],
            row[f"_min_{i}"],
            row[f"_max_{i}"],
            row[f"_mean_{i}"],
            row[f"_std_{i}"],
        )
        for i, c in enumerate(names)
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n bigint, nulls bigint,"
        " null_frac double, approx_distinct bigint, min string,"
        " max string, mean double, stddev double",
    )


def top_values(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """The ``k`` most frequent values of one column (the drill-down a
    profile's low-distinct columns get): ``(value, n)`` stringified,
    nulls included as a real row. One keyed aggregation + TakeOrdered;
    ties break by value for a deterministic report."""
    return (
        df.groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("value").asc_nulls_last())
        .limit(k)
    )


def suggest_expectations(
    df: DataFrame,
    cols: list[str] | None = None,
    set_max_distinct: int = 20,
    unique_min_ratio: float = 0.98,
    profile: DataFrame | None = None,
) -> list[Rule]:
    """Starter expectations derived from a :func:`profile_table` pass —
    the profile→rules→gate loop: columns with zero observed nulls get
    ``not_null``, numerics get ``in_range`` over the observed span,
    low-cardinality strings (≤ ``set_max_distinct`` distinct) get
    ``in_set`` over the observed values (one extra bounded-distinct
    job), and columns whose approximate distinct count is ≥
    ``unique_min_ratio`` of the rows get ``unique``.

    These are SUGGESTIONS pinned to the profiled sample: the observed
    span/set is necessary, not sufficient (tomorrow's legitimate value
    may fall outside), and the uniqueness hint rides an HLL estimate —
    review before wiring into :func:`assert_valid`, exactly like a
    human would review Deequ's suggestion output. Deterministic: same
    data ⇒ same rules, ordered by column then rule kind.

    Every emitted rule is self-consistent (passes on the profiled data
    itself): non-finite numeric bounds (NaN/±Inf) suppress ``in_range``
    and an ``in_set`` whose observed value set overflows the collection
    cap (possible when the HLL estimate under-reports) is suppressed
    rather than emitted truncated. Pass ``profile`` to reuse an
    already-collected :func:`profile_table` frame instead of paying a
    second profiling scan."""
    prof = (
        profile if profile is not None else profile_table(df, cols=cols)
    ).collect()
    rules: list[Rule] = []
    for r in sorted(prof, key=lambda x: x["column"]):
        c, base = r["column"], r["dtype"].split("(")[0]
        if r["n"] and r["nulls"] == 0:
            rules.append(not_null(c))
        if base in _NUMERIC_TYPES and r["min"] is not None:
            lo = float(r["min"]) if "." in r["min"] or base in ("float", "double") else int(r["min"])
            hi = float(r["max"]) if "." in r["max"] or base in ("float", "double") else int(r["max"])
            # NaN/±Infinity bounds would make in_range fail every row
            # (NaN comparisons are false): a suggested rule must be
            # self-consistent, so skip the suggestion instead.
            if math.isfinite(lo) and math.isfinite(hi):
                rules.append(in_range(c, lo, hi))
        if (
            base == "string"
            and 0 < r["approx_distinct"] <= set_max_distinct
        ):
            # Collect one past the cap: the HLL estimate (rsd 0.05) may
            # under-report true cardinality, and an in_set built from a
            # TRUNCATED value set would fail on the very data it was
            # derived from. Overflow ⇒ no suggestion.
            cap = set_max_distinct * 2
            collected = (
                df.select(c).filter(F.col(c).isNotNull())
                .distinct()
                .limit(cap + 1)
                .collect()
            )
            if len(collected) <= cap:
                rules.append(in_set(c, sorted(x[0] for x in collected)))
        if r["n"] and r["approx_distinct"] >= unique_min_ratio * r["n"]:
            rules.append(unique(c))
    return rules


#: schema of :func:`profile_drift`'s verdict frame
DRIFT_SCHEMA = (
    "column string, check string, old string, new string, drifted boolean"
)


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    null_frac_abs: float = 0.05,
    distinct_ratio: float = 2.0,
    mean_stddevs: float = 3.0,
) -> DataFrame:
    """Per-column drift verdicts between two :func:`profile_table`
    frames — the steady-state half of the profile→rules→gate loop (the
    Deequ anomaly-detection analog): profile each incoming batch, diff
    against the accepted baseline, and gate the absorb on the verdict
    frame. Checks, each one row ``(column, check, old, new, drifted)``:

    - ``present``: column appeared or disappeared (always drift).
    - ``dtype``: type changed (always drift; suppresses the value
      checks, which would compare apples to oranges).
    - ``null_frac``: absolute shift > ``null_frac_abs``.
    - ``span``: the new batch's observed [min, max] escapes the
      baseline span (numerics compare numerically with a non-finite
      guard; string/date/timestamp compare on the profile's
      stringified bounds). Escape DOWNWARD or UPWARD both flag —
      tomorrow's legitimate wider range is exactly what a human
      reviews before re-baselining.
    - ``distinct``: approx-distinct ratio outside
      [1/``distinct_ratio``, ``distinct_ratio``] (HLL rsd 0.05 noise
      sits far inside the default 2x band).
    - ``mean``: numeric mean moved more than ``mean_stddevs`` baseline
      standard deviations (skipped when the baseline stddev is 0 or
      any moment is non-finite).

    Driver-side O(columns) — profiles are one row per column by
    construction; no Spark job beyond the two ``collect()``s the
    caller already paid for the profiles. Deterministic: sorted by
    (column, check). Gate shape::

        drifted = [r for r in profile_drift(base, batch).collect()
                   if r["drifted"]]
        if drifted: quarantine_landing_batch(...)
    """
    spark = old.sparkSession
    o = {r["column"]: r for r in old.collect()}
    n = {r["column"]: r for r in new.collect()}
    rows: list[tuple] = []

    def add(col, check, ov, nv, drifted):
        rows.append(
            (
                col,
                check,
                None if ov is None else str(ov),
                None if nv is None else str(nv),
                bool(drifted),
            )
        )

    def _finite(*vals):
        return all(v is not None and math.isfinite(v) for v in vals)

    for c in sorted(set(o) | set(n)):
        ro, rn = o.get(c), n.get(c)
        if ro is None or rn is None:
            add(
                c,
                "present",
                ro["dtype"] if ro is not None else None,
                rn["dtype"] if rn is not None else None,
                True,
            )
            continue
        if ro["dtype"] != rn["dtype"]:
            add(c, "dtype", ro["dtype"], rn["dtype"], True)
            continue
        base = ro["dtype"].split("(")[0]
        onf, nnf = ro["null_frac"] or 0.0, rn["null_frac"] or 0.0
        add(c, "null_frac", onf, nnf, abs(nnf - onf) > null_frac_abs)
        od, nd = ro["approx_distinct"] or 0, rn["approx_distinct"] or 0
        if od or nd:
            if od and nd:
                ratio = nd / od
                shifted = ratio > distinct_ratio or ratio < 1.0 / distinct_ratio
            else:
                # collapse to 0 (column went fully null/empty) or
                # appearance from 0 — the MOST extreme cardinality
                # move, always drift; a ratio guard would skip it
                shifted = True
            add(c, "distinct", od, nd, shifted)
        if ro["min"] is not None and rn["min"] is not None:
            if base in _NUMERIC_TYPES:
                try:
                    olo, ohi = float(ro["min"]), float(ro["max"])
                    nlo, nhi = float(rn["min"]), float(rn["max"])
                except ValueError:
                    olo = None
                if olo is not None and _finite(olo, ohi, nlo, nhi):
                    add(
                        c,
                        "span",
                        f"[{ro['min']},{ro['max']}]",
                        f"[{rn['min']},{rn['max']}]",
                        nlo < olo or nhi > ohi,
                    )
            elif base in ("string", "date", "timestamp"):
                add(
                    c,
                    "span",
                    f"[{ro['min']},{ro['max']}]",
                    f"[{rn['min']},{rn['max']}]",
                    rn["min"] < ro["min"] or rn["max"] > ro["max"],
                )
        if (
            ro["mean"] is not None
            and rn["mean"] is not None
            and ro["stddev"] is not None
            and ro["stddev"] > 0
            and _finite(ro["mean"], rn["mean"], ro["stddev"])
        ):
            add(
                c,
                "mean",
                round(ro["mean"], 6),
                round(rn["mean"], 6),
                abs(rn["mean"] - ro["mean"]) > mean_stddevs * ro["stddev"],
            )
    rows.sort(key=lambda t: (t[0], t[1]))
    return spark.createDataFrame(rows, DRIFT_SCHEMA)
