"""Learned BPE tokenizer (`operators.bpe`): deterministic training on
distributed word frequencies, distinct-word-bounded encoding, model
persistence."""
from __future__ import annotations

from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators.bpe import (
    END,
    BpeModel,
    _encode_word,
    bpe_encode,
    bpe_encode_ids,
    train_bpe,
    word_frequencies,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_learns_hand_computable_merges(spark):
    # "ab"×5, "ac"×3 over alphabet {</w>, a, b, c}:
    #   round 1: (a,b)=5 ties (b,</w>)=5 → lexicographic min (a,b)
    #   round 2: (ab,</w>)=5 beats (a,c)=3
    #   round 3: (a,c)=3 ties (c,</w>)=3 → (a,c)
    #   round 4: (ac,</w>)=3
    df = _docs(spark, ["ab ab ab ab ab ac ac ac"])
    model = train_bpe(df, vocab_size=8)
    assert model.alphabet == (END, "a", "b", "c")
    assert model.merges == (
        ("a", "b"),
        ("ab", END),
        ("a", "c"),
        ("ac", END),
    )
    assert model.pieces == [END, "a", "b", "c", "ab", "ab" + END, "ac", "ac" + END]


def test_train_is_deterministic_across_partitioning(spark):
    texts = [f"tok{i % 17} tok{i % 5} shared word{i % 3}" for i in range(200)]
    m1 = train_bpe(_docs(spark, texts), vocab_size=40)
    m2 = train_bpe(_docs(spark, texts).repartition(7), vocab_size=40)
    assert m1 == m2


def test_word_frequencies_cap_keeps_most_frequent(spark):
    df = _docs(spark, ["a a a b b c"])
    rows = word_frequencies(df, max_words=2).collect()
    assert [(r["word"], r["count"]) for r in rows] == [("a", 3), ("b", 2)]


def test_encode_word_roundtrip_and_greedy_rank():
    model_ranks = {("a", "b"): 0, ("ab", END): 1, ("a", "c"): 2}
    assert _encode_word("ab", model_ranks) == ["ab" + END]
    assert _encode_word("ac", model_ranks) == ["ac", END]
    assert _encode_word("cab", model_ranks) == ["c", "ab" + END]
    # unknown characters pass through; concatenation always rebuilds
    for w in ("zzz", "abcab", "b"):
        assert "".join(_encode_word(w, model_ranks)) == w + END


def test_encode_preserves_order_and_rebuilds_text(spark):
    texts = ["the cat sat on the mat", "a cat and a hat", ""]
    df = _docs(spark, texts)
    model = train_bpe(df, vocab_size=30)
    out = {r["doc_id"]: r for r in bpe_encode(df, model).collect()}
    assert len(out) == 3
    for i, t in enumerate(texts):
        words = [w for w in t.split() if w]
        got = "".join(out[i]["pieces"])
        assert got == "".join(w + END for w in words)
        assert out[i]["n_pieces"] == len(out[i]["pieces"])
    assert out[2]["pieces"] == [] and out[2]["n_pieces"] == 0


def test_encode_ids_decode_back(spark):
    texts = ["repeat repeat repeat unique", "repeat other"]
    df = _docs(spark, texts)
    model = train_bpe(df, vocab_size=25)
    pieces = model.pieces
    out = {r["doc_id"]: r["piece_ids"] for r in bpe_encode_ids(df, model).collect()}
    for i, t in enumerate(texts):
        assert all(0 <= pid < len(pieces) for pid in out[i])
        decoded = "".join(pieces[pid] for pid in out[i])
        assert decoded == "".join(w + END for w in t.split() if w)


def test_unseen_character_is_oov(spark):
    model = train_bpe(_docs(spark, ["aa ab ba"]), vocab_size=10)
    df = _docs(spark, ["aa qq"])
    ids = bpe_encode_ids(df, model).collect()[0]["piece_ids"]
    assert -1 in ids  # 'q' was never in the training alphabet
    ps = bpe_encode(df, model).collect()[0]["pieces"]
    assert "q" in ps


def test_python_stage_runs_over_distinct_words_only(spark):
    df = _docs(spark, ["x " * 1000, "x y"])
    model = train_bpe(df, vocab_size=12)
    plan = bpe_encode(df, model)._jdf.queryExecution().executedPlan().toString()
    # the Arrow python stages exist and every one of them sits above a
    # word-level aggregate (count-distinct head / anti-joined tail) —
    # never above the corpus-sized token frame: each MapInPandas line
    # maps word -> word, pieces, with nothing doc-sized in its output
    assert "MapInPandas" in plan
    for line in plan.splitlines():
        if "MapInPandas" in line:
            assert "doc_id" not in line and "pos" not in line
    assert "HashAggregate" in plan
    # the head piece-map is the forced broadcast side (pre-AQE plan)
    assert "BroadcastHashJoin" in plan


def test_tail_join_is_unhinted_shuffle(spark):
    # head_words=1 forces real words into the tail; the tail join must
    # appear as a plain SortMergeJoin in the INITIAL physical plan — a
    # forced broadcast would already show as BroadcastHashJoin there
    # (AQE may still convert it at runtime from actual stats, which is
    # the intended escape valve, but the plan carries no hint)
    df = _docs(spark, ["alpha beta gamma delta", "beta gamma"])
    model = train_bpe(df, vocab_size=30)
    plan = (
        bpe_encode(df, model, head_words=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan


def test_encode_invariant_to_head_words(spark):
    # the frequency split only moves the broadcast/shuffle boundary:
    # head_words=1 forces (almost) everything through the tail join
    # and must produce byte-identical encodings
    texts = ["the cat sat on the mat", "a cat and a hat", "", "zq zq yy"]
    df = _docs(spark, texts)
    model = train_bpe(df, vocab_size=30)
    full = {
        r["doc_id"]: r["pieces"]
        for r in bpe_encode(df, model, head_words=1_000_000).collect()
    }
    split = {
        r["doc_id"]: r["pieces"]
        for r in bpe_encode(df, model, head_words=1).collect()
    }
    assert full == split
    ids_full = {
        r["doc_id"]: r["piece_ids"]
        for r in bpe_encode_ids(df, model, head_words=2).collect()
    }
    ids_ref = {
        r["doc_id"]: r["piece_ids"]
        for r in bpe_encode_ids(df, model).collect()
    }
    assert ids_full == ids_ref


def test_model_save_load_roundtrip(spark, tmp_path):
    model = train_bpe(_docs(spark, ["roundtrip model storage test"]), vocab_size=30)
    path = str(tmp_path / "bpe_model")
    model.save(spark, path)
    loaded = BpeModel.load(spark, path)
    assert loaded == model
    # vocab table ids follow the deterministic piece order
    rows = model.vocab_df(spark).orderBy("piece_id").collect()
    assert [r["piece"] for r in rows] == model.pieces


def test_vocab_size_smaller_than_alphabet_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        train_bpe(_docs(spark, ["abcdefgh"]), vocab_size=3)


def test_encode_word_roundtrip_property():
    # pure-python property sweep: greedy encoding always rebuilds the
    # word exactly, whatever (well-formed) merge table it is given
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(alphabet="abcd", min_size=1, max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(words, min_size=1, max_size=30), words)
    def check(corpus, probe):
        freqs: dict[tuple[str, ...], int] = {}
        for w in corpus:
            k = tuple(w) + (END,)
            freqs[k] = freqs.get(k, 0) + 1
        # train a tiny in-memory model through the same helpers
        from big_data___knowledge_graph_construction_with_llm_spark.operators import bpe as B

        pc = B._pair_counts(freqs)
        merges = []
        while pc and len(merges) < 10:
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            freqs = {
                B._merge_word(syms, best): f for syms, f in freqs.items()
            }
            pc = B._pair_counts(freqs)
        ranks = {p: r for r, p in enumerate(merges)}
        assert "".join(_encode_word(probe, ranks)) == probe + END

    check()


def test_bpe_feeds_sequence_packing(spark):
    # the training-data tail: learned pieces -> ids -> packed bins
    from big_data___knowledge_graph_construction_with_llm_spark.operators.sampling import pack_sequences

    texts = [f"doc {i} alpha beta gamma delta" for i in range(20)]
    df = _docs(spark, texts)
    model = train_bpe(df, vocab_size=40)
    enc = bpe_encode_ids(df, model)
    packed = pack_sequences(enc, "doc_id", "n_pieces", budget=64)
    rows = packed.collect()
    assert len(rows) == 20
    assert len({r["seq_id"] for r in rows}) > 1  # really split into bins


def test_heap_trainer_matches_naive_reference(spark):
    """The lazy-deletion-heap trainer must pick the EXACT merge
    sequence a from-scratch recount + full argmax picks (same
    (-count, pair) order, ties lexicographic) — the incremental
    index + heap are an optimization, never a semantics change."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.bpe import (
        _merge_word,
        _pair_counts,
    )

    texts = [
        f"alpha{i % 7} beta{i % 4} gamma shared{i % 3} alpha{i % 7}"
        for i in range(150)
    ]
    df = _docs(spark, texts)
    model = train_bpe(df, vocab_size=80)

    # naive reference: recount every pair from scratch per merge
    rows = word_frequencies(df).collect()
    words = {}
    for r in rows:
        k = tuple(r["word"]) + (END,)
        words[k] = words.get(k, 0) + int(r["count"])
    alphabet = tuple(sorted({s for syms in words for s in syms}))
    ref = []
    while len(alphabet) + len(ref) < 80:
        pc = _pair_counts(words)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 1:
            break
        ref.append(best)
        new_words = {}
        for syms, freq in words.items():
            ns = _merge_word(syms, best)
            new_words[ns] = new_words.get(ns, 0) + freq
        words = new_words
    assert model.merges == tuple(ref)


def test_encode_with_precomputed_head_vocab_matches_default(spark):
    """head_vocab= skips the plan-construction-time word-count job and
    must not change results — it only fixes the broadcast side."""
    texts = ["the quick brown fox", "the lazy dog", "quick quick the"]
    df = _docs(spark, texts)
    model = train_bpe(df, vocab_size=40)
    want = {
        r["doc_id"]: r["pieces"] for r in bpe_encode(df, model).collect()
    }
    got = {
        r["doc_id"]: r["pieces"]
        for r in bpe_encode(
            df, model, head_vocab=["the", "quick"]
        ).collect()
    }
    assert got == want


def test_encode_pack_resumable_kill_and_resume(spark, tmp_path):
    """The composed BPE train -> encode -> pack flow resumes from the
    last committed stage after an interruption: stage 0 (tokenizer
    vocab — the expensive stage) is verified UNCHANGED across the
    resume, the resumed result matches an uninterrupted run, and
    parameter drift refuses to resume without force."""
    import pytest

    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators import sampling
    from big_data___knowledge_graph_construction_with_llm_spark.operators.flow import (
        encode_pack_resumable,
        gc_flow_checkpoints,
    )

    texts = [f"alpha beta{i % 5} gamma{i % 3} delta" for i in range(40)]
    df = _docs(spark, texts)
    root = str(tmp_path / "ep")

    # uninterrupted reference run at a sibling root
    want = {
        (r["doc_id"], tuple(r["piece_ids"]), r["seq_id"])
        for r in encode_pack_resumable(
            df, str(tmp_path / "ref"), vocab_size=40, budget=64
        ).collect()
    }

    # interrupted run: stage 2 (pack) dies mid-flight
    real_pack = sampling.pack_sequences

    def exploding_pack(*a, **k):
        raise RuntimeError("injected: cluster lost")

    sampling.pack_sequences = exploding_pack
    try:
        with pytest.raises(RuntimeError, match="injected"):
            encode_pack_resumable(df, root, vocab_size=40, budget=64)
    finally:
        sampling.pack_sequences = real_pack
    # stages 0+1 committed, stage 2 absent
    gen_vocab = fsutil.read_text(spark, f"{root}/00_bpe_vocab/_CURRENT").strip()
    assert fsutil.exists(spark, f"{root}/01_encode/_CURRENT")
    assert not fsutil.exists(spark, f"{root}/02_pack/_CURRENT")

    # resume: finishes from the committed encode; the tokenizer stage's
    # generation is untouched (not re-trained)
    got = {
        (r["doc_id"], tuple(r["piece_ids"]), r["seq_id"])
        for r in encode_pack_resumable(
            df, root, vocab_size=40, budget=64
        ).collect()
    }
    assert got == want
    assert (
        fsutil.read_text(spark, f"{root}/00_bpe_vocab/_CURRENT").strip()
        == gen_vocab
    )

    # parameter drift refuses; force restarts with fresh generations
    with pytest.raises(ValueError, match="different parameters"):
        encode_pack_resumable(df, root, vocab_size=40, budget=32)
    forced = encode_pack_resumable(
        df, root, vocab_size=40, budget=64, force=True
    )
    assert {
        (r["doc_id"], tuple(r["piece_ids"]), r["seq_id"])
        for r in forced.collect()
    } == want
    # superseded generations sweep; winners survive
    swept = gc_flow_checkpoints(spark, root, max_age_ms=0, now_ms=2**62)
    assert "00_bpe_vocab" in swept
    again = encode_pack_resumable(df, root, vocab_size=40, budget=64)
    assert {
        (r["doc_id"], tuple(r["piece_ids"]), r["seq_id"])
        for r in again.collect()
    } == want


def test_resumable_flow_interrupted_force_never_resumes_stale(spark, tmp_path):
    """An INTERRUPTED force=True rerun must not poison the checkpoint:
    _PARAMS is rewritten before any stage lands, so without per-stage
    fingerprint stamps a later non-force run would find the new
    fingerprint matching and silently return later-stage generations
    computed under the OLD parameters. The stamp (and force's up-front
    marker de-reference) makes every stale generation read as
    not-committed instead."""
    import pytest
    from pyspark.sql import functions as F

    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.flow import (
        params_fingerprint,
        resumable_flow,
    )

    root = str(tmp_path / "flow_force")
    initial = spark.range(10).toDF("id")

    def stages(factor, explode_s2=False, log=None):
        def s1(prev):
            if log is not None:
                log.append("s1")
            return prev.withColumn("x", F.col("id") * factor)

        def s2(prev):
            if log is not None:
                log.append("s2")
            if explode_s2:
                raise RuntimeError("injected: cluster lost")
            return prev.withColumn("y", F.col("x") + factor)

        return [("s1", s1), ("s2", s2)]

    def run(factor, force=False, explode_s2=False, log=None):
        return resumable_flow(
            spark,
            stages(factor, explode_s2, log),
            root,
            params_fingerprint({"factor": repr(factor)}),
            initial=initial,
            force=force,
        )

    # full run under factor=2 commits both stages
    assert run(2).agg(F.sum("y")).first()[0] == sum(i * 2 + 2 for i in range(10))

    # force rerun under factor=3 dies in stage 2 — after _PARAMS was
    # rewritten and stage 1 recommitted
    with pytest.raises(RuntimeError, match="injected"):
        run(3, force=True, explode_s2=True)
    assert (fsutil.read_text(spark, f"{root}/_PARAMS").strip()
            == params_fingerprint({"factor": repr(3)}))

    # the subsequent NON-force run under factor=3 must recompute stage
    # 2 (the old factor-2 generation is stale), not return it
    log: list[str] = []
    got = run(3, log=log)
    assert log == ["s2"]  # resumed from the recommitted stage 1
    assert got.agg(F.sum("y")).first()[0] == sum(i * 3 + 3 for i in range(10))

    # the stamp alone also guards the trap when markers survive: put
    # factor-3 generations current but flip _PARAMS to factor=4 (an
    # interrupted force rerun that died before any stage landed)
    fsutil.write_text(
        spark, f"{root}/_PARAMS", params_fingerprint({"factor": repr(4)})
    )
    log2: list[str] = []
    got4 = run(4, log=log2)
    assert log2 == ["s1", "s2"]  # nothing stale resumed
    assert got4.agg(F.sum("y")).first()[0] == sum(i * 4 + 4 for i in range(10))
