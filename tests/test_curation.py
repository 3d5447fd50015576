"""End-to-end curation pipeline test: every stage must fire on its
planted victim, survivors get split labels, and the near-dup stage must
keep exactly one representative per duplicate CLUSTER (chain case)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators.curation import (
    curate,
    near_dedup,
)

BASE = (
    "a reasonably long and varied sentence about distributed analytics "
    "engines with enough unique tokens to pass every quality gate easily"
)


def test_near_dedup_keeps_one_per_chain(spark):
    """Chain a~b~c (adjacent pairs near-dup, ends not): exactly the
    min-id member survives — pairwise dropping would get this wrong."""
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    b = a + " x1 x2"          # near-dup of a
    c = b + " y1 y2"          # near-dup of b, farther from a
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, "something else entirely unrelated here")],
        "doc_id int, text string",
    )
    out = sorted(r["doc_id"] for r in near_dedup(df, "doc_id", "text", 0.7).collect())
    assert out == [1, 9]


def test_curate_full_flow(spark):
    leak = "the exact benchmark passage that must never appear in training data at all"
    rows = [
        (1, BASE + " one"),
        (2, "a second genuinely distinct document describing watermark semantics "
            "for late arriving records in structured streaming state stores"),
        (3, "too short"),                                  # quality gate
        (4, "spam spam spam spam spam spam spam spam spam spam"),  # repetition gate
        (5, BASE + " one"),                                # exact dup of 1
        (6, BASE + " one extra"),                          # near dup of 1
        (7, leak),                                         # benchmark leak
        (8, "an entirely different well formed document about graph algorithms and query planning"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    bench = spark.createDataFrame([(leak,)], "text string")
    out = curate(
        docs,
        benchmark=bench,
        min_tokens=5,
        jaccard_threshold=0.7,
    )
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert sorted(got) == [1, 2, 8]
    assert set(got.values()) <= {"train", "val", "test"}
    # determinism: same input → same splits
    again = {r["doc_id"]: r["split"] for r in curate(
        docs, benchmark=bench, min_tokens=5, jaccard_threshold=0.7
    ).collect()}
    assert got == again
    # materialize_stages is a plan-shape choice, never a semantic one:
    # the fully-lazy composition selects the identical rows
    lazy = {r["doc_id"]: r["split"] for r in curate(
        docs, benchmark=bench, min_tokens=5, jaccard_threshold=0.7,
        materialize_stages=False,
    ).collect()}
    assert got == lazy


def test_curate_redacts_pii_last(spark):
    """redact=True rewrites text in the output; distinct emails must NOT
    make two otherwise-identical docs survive exact dedup (redaction runs
    after dedup decisions, not before)."""
    rows = [
        (1, BASE + " mail me at first.person@example.com please"),
        (2, BASE + " mail me at second.person@example.org please"),
        (3, "a wholly different document mentioning 10.1.2.3 and nothing else of note here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["text"] for r in curate(docs, min_tokens=5, redact=True).collect()}
    # docs 1 and 2 differ pre-redaction (different emails) -> both kept,
    # then both redacted to the same text in the output
    assert sorted(out) == [1, 2, 3]
    assert out[1] == out[2] == BASE + " mail me at [PII] please"
    assert "[PII]" in out[3] and "10.1.2.3" not in out[3]


def test_curate_with_stats_reports_stage_yields(spark):
    """Per-stage survivor counts: monotonically non-increasing through
    the drop stages, keyed by stage name, and the final frame matches
    plain curate's output."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.curation import (
        curate,
        curate_with_stats,
    )

    rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "one two three four five six seven eight nine ten"),   # exact dup
        (3, "a different useful document with enough distinct tokens here ok"),
        (4, "x"),                                                   # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, stats = curate_with_stats(df, min_tokens=5, strict=True)
    assert stats["input"] == 4
    assert stats["quality_gate"] == 3          # doc 4 gated
    assert stats["exact_dedup"] == 2           # dup pair collapsed
    assert stats["split"] == 2
    order = [k for k in stats if k != "input"]
    vals = [stats[k] for k in order]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    expect = sorted(tuple(r) for r in curate(df, min_tokens=5, strict=True).collect())
    assert sorted(tuple(r) for r in out.collect()) == expect

    import pytest as _pytest
    with _pytest.raises(TypeError, match="unknown curate"):
        curate_with_stats(df, nonsense=1)


def test_curate_excise_and_ngram_stages(spark):
    """The two optional curation stages: excise_boilerplate rewrites
    survivors with the shared licence block removed, and ngram_n drops a
    doc quoting a benchmark 13-gram that Jaccard decontamination keeps.
    ngram_n without a benchmark is a hard error."""
    import pytest as _pytest

    from big_data___knowledge_graph_construction_with_llm_spark.operators.curation import (
        curate,
        curate_with_stats,
    )

    lic = "licensed under the apache license version two zero see notice"  # 10 toks
    quote = "which distributed engine answers this exact eval question fastest overall today friends honestly"  # 13
    rows = [
        (1, lic + " alpha document body with plenty of unique tokens here"),
        (2, lic + " beta document body holding different unique tokens too"),
        (3, "gamma document quoting " + quote + " inside much other unrelated filler text"),
        (4, "delta document with nothing shared and enough tokens to pass the gate"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [("benchmark question " + quote + " with its own framing words",)],
        "text string",
    )
    out, stats = curate_with_stats(
        docs,
        min_tokens=5,
        benchmark=bench,
        excise_boilerplate=True,
        boilerplate_min_docs=2,
        ngram_n=13,
        strict=True,
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert sorted(got) == [1, 2, 4]                      # doc 3 = 13-gram leak
    assert got[1].startswith("alpha document body")      # licence excised
    assert got[2].startswith("beta document body")
    assert got[4] == rows[3][1]                          # untouched
    assert stats["excise_boilerplate"] == 4              # rewrite drops nothing
    assert stats["ngram_decontaminate"] == 3
    with _pytest.raises(ValueError, match="benchmark"):
        curate(docs, ngram_n=13)


def test_curate_excise_lines_stage(spark):
    """excise_lines removes the shared footer line from survivors'
    lined text (blank-line structure intact) before the span pass, and
    is a no-op on newline-free docs."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.curation import (
        curate_with_stats,
    )

    footer = "subscribe to our newsletter for updates"
    rows = [
        (1, "alpha document body with plenty of tokens\n" + footer),
        (2, footer + "\nbeta document body holding different tokens"),
        (3, "gamma flat document with no newlines and enough tokens to pass"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out, stats = curate_with_stats(
        docs, min_tokens=3, excise_lines=True, boilerplate_min_docs=2, strict=True
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[1] == "alpha document body with plenty of tokens"
    assert got[2] == "beta document body holding different tokens"
    assert got[3] == rows[2][1]
    assert stats["excise_lines"] == 3


def test_curate_expectations_gate(spark):
    """expectations= wires assert_valid in as the between-stage gate:
    a violating corpus raises mid-flow with rule attribution; a clean
    corpus flows through unchanged (and the stats entry records the
    pass-through)."""
    import pytest
    from big_data___knowledge_graph_construction_with_llm_spark.operators import validate as V
    from big_data___knowledge_graph_construction_with_llm_spark.operators.curation import (
        curate,
        curate_with_stats,
    )

    rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "a different useful document with enough distinct tokens here"),
        (1, "a duplicated id sneaks into the corpus breaking uniqueness"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # unique(doc_id) is violated -> the gate names the rule and count
    with pytest.raises(ValueError, match=r"unique\(doc_id\)=1"):
        curate(df, expectations=[V.unique("doc_id"), V.not_null("text")])
    # laziness doesn't defer the gate: assert_valid collects its report
    # the moment the stage list is driven, materialized or not
    with pytest.raises(ValueError, match=r"unique\(doc_id\)"):
        curate(
            df,
            expectations=[V.unique("doc_id")],
            materialize_stages=False,
        )
    clean = df.where("doc_id < 3 and text not like 'a duplicated%'")
    out, stats = curate_with_stats(
        clean, expectations=[V.unique("doc_id"), V.not_null("text")]
    )
    assert stats["expectations_gate"] == stats["quality_gate"]
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


def test_curate_resumable_resumes_after_interruption(spark, tmp_path):
    """A failing expectations gate interrupts the run AFTER stage 0
    committed (the realistic mid-pipeline crash). Fixing the gate's
    predicate is parameter drift (rule content signs the fingerprint)
    and needs force; an identical re-run afterwards resumes fully with
    no recompute, and the final output matches plain curate()."""
    import pytest
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators import validate as V
    from big_data___knowledge_graph_construction_with_llm_spark.operators.curation import (
        curate,
        curate_resumable,
        gc_curate_checkpoints,
    )

    rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "one two three four five six seven eight nine ten"),   # exact dup
        (3, "a different useful document with enough distinct tokens here ok"),
        (4, "x"),                                                   # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    root = str(tmp_path / "ckpt")

    # run 1: the gate rejects (the predicate is impossible) -> the
    # pipeline dies after quality_gate committed its table
    bad_rule = V.satisfies("text_present", F.lit(False))
    with pytest.raises(ValueError, match="text_present"):
        curate_resumable(df, root, expectations=[bad_rule], min_tokens=5)
    gen_q = fsutil.read_text(spark, f"{root}/00_quality_gate/_CURRENT").strip()

    # run 2: same-NAMED rule with the predicate fixed — rule content is
    # part of the fingerprint (the predicate expression signs), so this
    # is parameter drift and refuses rather than silently resuming a
    # run gated under a different predicate; force proceeds
    ok_rule = V.satisfies("text_present", F.col("text").isNotNull())
    with pytest.raises(ValueError, match="different parameters"):
        curate_resumable(df, root, expectations=[ok_rule], min_tokens=5)
    out = curate_resumable(
        df, root, expectations=[ok_rule], min_tokens=5, force=True
    )
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(
        tuple(r) for r in curate(df, min_tokens=5).collect()
    )
    assert got == want
    gen_q = fsutil.read_text(spark, f"{root}/00_quality_gate/_CURRENT").strip()

    # run 3: full resume — every stage committed, nothing recomputes,
    # same rows come straight off the final stage's table
    again = curate_resumable(df, root, expectations=[ok_rule], min_tokens=5)
    assert sorted(tuple(r) for r in again.collect()) == got

    # parameter drift is refused; force restarts with fresh generations
    with pytest.raises(ValueError, match="different parameters"):
        curate_resumable(df, root, expectations=[ok_rule], min_tokens=6)
    # a CHANGED rule list (different names) is drift too — the content
    # signature catches what name-presence used to wave through
    with pytest.raises(ValueError, match="different parameters"):
        curate_resumable(
            df, root, expectations=[V.not_null("text")], min_tokens=5
        )
    forced = curate_resumable(
        df, root, expectations=[ok_rule], min_tokens=5, force=True
    )
    assert sorted(tuple(r) for r in forced.collect()) == got
    assert (
        fsutil.read_text(spark, f"{root}/00_quality_gate/_CURRENT").strip()
        != gen_q
    )
    # the superseded generations sweep; every winner survives
    swept = gc_curate_checkpoints(spark, root, max_age_ms=0, now_ms=2**62)
    assert "00_quality_gate" in swept
    still = curate_resumable(df, root, expectations=[ok_rule], min_tokens=5)
    assert sorted(tuple(r) for r in still.collect()) == got


def test_curate_resumable_refuses_swapped_benchmark(spark, tmp_path):
    """Swapping the decontamination benchmark between runs must refuse
    resume (content signature: analyzed-plan identity), not silently
    reuse stages decontaminated against the OLD benchmark — the
    silent-wrong-data trap the name-presence fingerprint had."""
    import pytest
    from big_data___knowledge_graph_construction_with_llm_spark.operators.curation import (
        curate_resumable,
    )

    rows = [
        (i, f"document number {i} with enough distinct tokens to pass gates")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    root = str(tmp_path / "ckpt_bench")
    bench_a = df.filter("doc_id = 0").select("doc_id", "text")
    bench_b = df.filter("doc_id = 1").select("doc_id", "text")
    curate_resumable(df, root, benchmark=bench_a, min_tokens=3)
    # identical benchmark plan -> clean resume off the committed tables
    curate_resumable(df, root, benchmark=bench_a, min_tokens=3)
    with pytest.raises(ValueError, match="different parameters"):
        curate_resumable(df, root, benchmark=bench_b, min_tokens=3)


def test_curate_resumable_refuses_swapped_fk_reference(spark, tmp_path):
    """A foreign_key expectation's reference frame is content too:
    swapping the dimension table under an unchanged rule name must
    refuse resume (the ref frame's plan signature signs the
    fingerprint), while the identical ref resumes cleanly."""
    import pytest
    from big_data___knowledge_graph_construction_with_llm_spark.operators import validate as V
    from big_data___knowledge_graph_construction_with_llm_spark.operators.curation import (
        curate_resumable,
    )

    rows = [
        (i, f"document number {i} with enough distinct tokens to pass gates")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    root = str(tmp_path / "ckpt_fk")
    ref_a = spark.range(0, 100).toDF("k")
    ref_b = spark.range(0, 50).toDF("k")
    rules_a = [V.foreign_key("doc_id", ref_a, "k")]
    curate_resumable(df, root, expectations=rules_a, min_tokens=3)
    # identical ref plan -> clean resume
    curate_resumable(
        df, root, expectations=[V.foreign_key("doc_id", ref_a, "k")],
        min_tokens=3,
    )
    with pytest.raises(ValueError, match="different parameters"):
        curate_resumable(
            df, root, expectations=[V.foreign_key("doc_id", ref_b, "k")],
            min_tokens=3,
        )
