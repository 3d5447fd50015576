"""End-to-end training-data curation: the composition a 100 TB corpus
actually runs, assembled from the engine's own operators.

Order matters and is the standard one: cheap scan-speed gates first
(quality band-pass, repetition caps — pure column expressions that
shrink the corpus before anything shuffles), then exact dedup (hash
groupBy), then near-dedup (MinHash-LSH candidates → exact-Jaccard
verify → connected components over the duplicate graph, keeping the
min-id representative per component — pairwise "drop id_b" would
over- or under-drop on duplicate chains), then benchmark
decontamination, then the deterministic split. Document text never
shuffles in any stage; ids, hashes and signatures do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators import text as T
from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import (
    boilerplate_fraction,
    decontaminate,
    exact_dedup_by_hash,
    excise_repeated_lines,
    excise_repeated_spans,
    ngram_decontaminate,
    semantic_dedup,
)
from big_data___knowledge_graph_construction_with_llm_spark.operators.sampling import dataset_split


def near_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.85,
    max_bucket: int | None = 100_000,
    shingle_n: int = 3,
    strict: bool = False,
) -> DataFrame:
    """Near-duplicate removal keeping one representative per duplicate
    CLUSTER: LSH candidates → exact n-gram Jaccard ≥ threshold →
    connected components over the confirmed-pair graph → keep the min-id
    member of each component. Components matter: with chains a~b~c where
    only adjacent pairs verify, pairwise dropping would keep both a and
    c or drop all three depending on order — CC keeps exactly one.

    ``strict=True`` makes CC non-convergence (a duplicate cluster with
    diameter > its max_iter) a hard error instead of a logged warning —
    without it extra near-duplicates would be silently kept.

    Thin wrapper over :func:`operators.dedup.semantic_dedup` (the ONE
    implementation of cluster-collapse near-dedup — it also prunes the
    exact-verify stage to candidate ids, so the corpus is never
    re-shingled wholesale) with this pipeline's defaults."""
    return semantic_dedup(
        docs,
        id_col,
        text_col,
        threshold=jaccard_threshold,
        shingle_n=shingle_n,
        max_bucket=max_bucket,
        strict=strict,
    )


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark: DataFrame | None = None,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_dup_token_frac: float = 0.6,
    max_top_bigram_frac: float = 0.5,
    jaccard_threshold: float = 0.85,
    decontam_threshold: float = 0.8,
    max_boilerplate_frac: float | None = None,
    boilerplate_span_tokens: int = 8,
    boilerplate_min_docs: int = 3,
    excise_boilerplate: bool = False,
    excise_lines: bool = False,
    ngram_n: int | None = None,
    strict: bool = False,
    redact: bool = False,
    expectations: list | None = None,
    materialize_stages: bool = True,
) -> DataFrame:
    """The full curation flow; returns the surviving rows of ``docs``
    with a ``split`` column (train/val/test). Every stage is one of the
    engine's tested operators — this function only sequences them.
    ``strict`` hardens near-dedup: CC non-convergence raises instead of
    keeping extra near-duplicates behind a warning.
    ``max_boilerplate_frac`` (optional) drops documents whose
    repeated-span share exceeds it — "mostly templated" pages that
    whole-document dedup keeps (each page IS unique) but that carry
    little non-duplicated text. It runs AFTER near-dedup, deliberately:
    before it, an ordinary near-duplicate pair would make both copies
    score ~1.0 and the gate would annihilate the pair outright where
    near-dedup keeps one representative. After near-dedup each family
    is down to one survivor, so a high fraction can only come from
    genuine cross-template repetition — and ``boilerplate_min_docs``
    (default 3, i.e. stricter than a single surviving pair) raises the
    bar for calling a span "boilerplate" further.
    ``excise_boilerplate=True`` REWRITES surviving docs with the
    cross-document repeated spans removed
    (:func:`operators.dedup.excise_repeated_spans`) instead of only
    gating on their share — it runs after near-dedup for the same
    pair-annihilation reason as the gate, and after the gate when both
    are on (gate first drops the mostly-templated docs cheaply; the
    rewrite then scrubs the remainder). ``excise_lines=True`` runs the
    LINE-granular scrub (:func:`operators.dedup.excise_repeated_lines`,
    ``boilerplate_min_docs`` as its threshold) right before the span
    excision — lines are removed whole first, spans catch what crosses
    line boundaries; for newline-free corpora it is a no-op. ``ngram_n``
    (optional, needs
    ``benchmark``) adds the EXACT shared-n-gram decontamination pass
    (:func:`operators.dedup.ngram_decontaminate`, e.g. 13 for the
    GPT-3/PaLM criterion) after the Jaccard pass — verbatim quotes of
    an eval question leak at near-zero document similarity, so the two
    criteria prune independent leak classes. ``redact=True``
    rewrites ``text_col`` through :func:`operators.text.redact_pii` as
    the LAST stage — after dedup/decontamination, so redaction (which
    collapses distinct emails to one token) cannot create or mask
    near-duplicate relationships the earlier stages decide on.
    ``expectations`` (optional, a list of :mod:`operators.validate`
    rules) is the BETWEEN-STAGE data gate: right after the quality
    stage the whole rule list runs through
    :func:`operators.validate.assert_valid` — one aggregate scan for
    every scalar rule, one unioned job for referential rules — and a
    violating corpus raises ``ValueError`` naming each failed rule and
    its count instead of flowing bad rows into the expensive dedup
    stages (the DEPLOYMENT §5 gate discipline).

    ``materialize_stages`` (default True) cuts lineage at every stage
    boundary through the pluggable ``materialize`` seam — the same
    discipline :func:`curate_with_stats` applies. It matters because
    several stages consume their input MORE THAN ONCE (semi/anti-join
    back onto the frame they filtered): chained lazily, each such stage
    re-executes its entire upstream DAG per consumer, and the base-scan
    count compounds stage over stage — linear-per-stage materialization
    is what keeps the whole flow linear. Pass False only to embed the
    flow as a single lazy plan (composition into a larger query, or
    plan-shape tests) on inputs small enough that recompute is cheaper
    than the checkpoint writes."""
    from big_data___knowledge_graph_construction_with_llm_spark.materialize import (
        materialize,
        release,
    )

    kept = docs
    for _name, stage in _curation_stages(
        doc_columns=docs.columns, id_col=id_col, text_col=text_col,
        benchmark=benchmark, min_tokens=min_tokens, max_tokens=max_tokens,
        max_dup_token_frac=max_dup_token_frac,
        max_top_bigram_frac=max_top_bigram_frac,
        jaccard_threshold=jaccard_threshold,
        decontam_threshold=decontam_threshold,
        max_boilerplate_frac=max_boilerplate_frac,
        boilerplate_span_tokens=boilerplate_span_tokens,
        boilerplate_min_docs=boilerplate_min_docs,
        excise_boilerplate=excise_boilerplate, excise_lines=excise_lines,
        ngram_n=ngram_n, strict=strict, redact=redact,
        expectations=expectations,
    ):
        if materialize_stages:
            out = stage(kept)
            if out is kept:
                # pass-through gate (e.g. expectations_gate): nothing
                # new to checkpoint, and re-materializing an already
                # materialized frame would copy a corpus for nothing
                continue
            nxt = materialize(out)
            # every materializer is EAGER, so once `nxt` exists the
            # superseded stage's blocks are dead weight — release them
            # now (strategy-aware: localCheckpoint blocks live on the
            # internal RDD where Dataset.unpersist can't see them)
            # instead of holding ~one corpus copy per stage until GC
            # gets around to it (no-op for the input frame and for
            # file-backed materializers)
            if kept is not docs:
                release(kept)
            kept = nxt
        else:
            kept = stage(kept)
    return kept


def _curation_stages(
    *,
    doc_columns, id_col, text_col, benchmark, min_tokens, max_tokens,
    max_dup_token_frac, max_top_bigram_frac, jaccard_threshold,
    decontam_threshold, max_boilerplate_frac, boilerplate_span_tokens,
    boilerplate_min_docs, excise_boilerplate, excise_lines, ngram_n,
    strict, redact, expectations=None,
):
    """The ordered ``(name, DataFrame → DataFrame)`` stage list behind
    :func:`curate` — one source of truth for the pipeline order, shared
    with :func:`curate_with_stats`."""
    if ngram_n is not None and benchmark is None:
        raise ValueError("ngram_n requires a benchmark DataFrame")

    def quality_gate(df):
        return T.quality_features(df).filter(
            F.col("n_tokens").between(min_tokens, max_tokens)
        ).select(*doc_columns)

    def repetition_gate(df):
        rep_ok = T.repetition_features(df, id_col, text_col).filter(
            (F.col("dup_token_frac") <= max_dup_token_frac)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        ).select(id_col)
        return df.join(rep_ok, id_col, "left_semi")

    stages = [
        ("quality_gate", quality_gate),
    ]
    if expectations:
        from big_data___knowledge_graph_construction_with_llm_spark.operators.validate import (
            assert_valid,
        )

        def expectations_gate(df):
            # the gate is EAGER by nature (assert_valid collects the
            # report), so a violating corpus raises here mid-flow even
            # under materialize_stages=False; on pass the frame flows
            # through untouched
            assert_valid(df, expectations)
            return df

        stages.append(("expectations_gate", expectations_gate))
    stages += [
        ("repetition_gate", repetition_gate),
        ("exact_dedup", lambda df: exact_dedup_by_hash(df, text_col, id_col)),
        (
            "near_dedup",
            lambda df: near_dedup(
                df, id_col, text_col, jaccard_threshold, strict=strict
            ),
        ),
    ]
    if max_boilerplate_frac is not None:

        def boilerplate_gate(df):
            bf_ok = boilerplate_fraction(
                df,
                id_col,
                text_col,
                span_tokens=boilerplate_span_tokens,
                min_docs=boilerplate_min_docs,
            ).filter(
                F.col("boilerplate_frac") <= max_boilerplate_frac
            ).select(id_col)
            return df.join(bf_ok, id_col, "left_semi")

        stages.append(("boilerplate_gate", boilerplate_gate))
    if excise_lines:
        stages.append(
            (
                "excise_lines",
                lambda df: excise_repeated_lines(
                    df, id_col, text_col, min_docs=boilerplate_min_docs
                ),
            )
        )
    if excise_boilerplate:
        stages.append(
            (
                "excise_boilerplate",
                lambda df: excise_repeated_spans(
                    df,
                    id_col,
                    text_col,
                    span_tokens=boilerplate_span_tokens,
                    min_docs=boilerplate_min_docs,
                ),
            )
        )
    if benchmark is not None:
        stages.append(
            (
                "decontaminate",
                lambda df: decontaminate(
                    df, benchmark, id_col, text_col, threshold=decontam_threshold
                ),
            )
        )
        if ngram_n is not None:
            stages.append(
                (
                    "ngram_decontaminate",
                    lambda df: ngram_decontaminate(
                        df, benchmark, id_col, text_col, n=ngram_n
                    ),
                )
            )
    if redact:
        stages.append(
            ("redact", lambda df: df.withColumn(text_col, T.redact_pii(text_col)))
        )
    stages.append(("split", lambda df: dataset_split(df, id_col)))
    return stages


def curate_resumable(
    docs: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    force: bool = False,
    **kwargs,
) -> DataFrame:
    """:func:`curate` that SURVIVES losing the cluster mid-run: every
    stage's output commits as a marker-last table generation under
    ``root/<NN>_<stage>`` (``operators.layout.write_table`` — one
    ``_CURRENT`` marker write is the commit point, S3-safe), and a
    re-run resumes from the LAST committed stage instead of recomputing
    the flow. At 100 TB a six-stage pipeline measured in hours WILL be
    interrupted — preemptible capacity, quota, a bad node — and
    re-paying the finished stages is the difference between an
    incident and a retry. Plain :func:`curate` remains the single-run
    fast path (localCheckpoint materialization, no durable writes).

    Mechanics: the keyword surface is fingerprinted into
    ``root/_PARAMS``. Content-bearing non-scalar arguments get a CHEAP
    CONTENT SIGNATURE, not name-presence: ``benchmark`` by its
    analyzed-plan ``semanticHash`` + schema (falling back to
    schema + count — swapping the decontamination benchmark between
    runs must NOT silently resume against stages decontaminated on the
    old one), ``expectations`` by the ordered rule names PLUS each row
    rule's predicate expression and each foreign-key rule's
    reference-frame plan signature (a swapped ``satisfies`` predicate,
    ``matches`` pattern, or FK dimension table under an unchanged name
    must not silently resume either). The
    signature is deliberately cheap, so it cannot see a benchmark
    whose FILES were rewritten in place under an identical plan —
    rewrite-in-place callers pass ``force=True``. Resuming with
    different parameters raises; ``force=True`` recomputes every
    stage (fresh generations; superseded ones sweep via
    :func:`gc_curate_checkpoints`). Pass-through stages (the
    expectations gate) re-run only when they sit after the resume
    point — their effect is a raise, not data. Returns the final
    stage's committed table, read from disk, so the result is stable
    against re-execution."""
    import inspect

    from big_data___knowledge_graph_construction_with_llm_spark.operators.flow import (
        params_fingerprint,
        resumable_flow,
    )

    spark = docs.sparkSession
    sig = {
        name: p.default
        for name, p in inspect.signature(curate).parameters.items()
        if name not in ("docs", "id_col", "text_col", "materialize_stages")
    }
    unknown = set(kwargs) - set(sig)
    if unknown:
        raise TypeError(f"unknown curate arguments: {sorted(unknown)}")
    sig.update(kwargs)

    def _df_sig(v):
        try:  # plan identity: stable across sessions for same source
            h = v._jdf.queryExecution().analyzed().semanticHash()
            return f"df:{v.schema.simpleString()}:sh{int(h)}"
        except Exception:  # noqa: BLE001 - fallback: schema + count
            return f"df:{v.schema.simpleString()}:n{v.count()}"

    def _rule_sig(r):
        # the name alone is NOT content for every kind: satisfies()
        # takes a caller-chosen name that doesn't encode the predicate,
        # matches()/in_set() bake the column but not the pattern/values,
        # and foreign_key() never signs its ref frame — so a swapped
        # predicate or reference table under an unchanged name would
        # silently resume (the benchmark-swap hole, one level down).
        # Row rules therefore sign name + predicate expression (the
        # Column repr embeds it, deterministically for the same
        # construction); foreign_key signs name + the ref frame's plan
        # signature; unique's name already carries its full content.
        # CAVEAT (ADVICE r10): the Column repr is ENGINE-dependent —
        # classic PySpark and Spark Connect render the same predicate
        # differently, so an identical pipeline re-run after switching
        # engines (or a repr-changing Spark upgrade) fingerprint-drifts
        # and refuses to resume. Deliberately so: the drift direction
        # is conservative (never a silent wrong resume) — recover with
        # force=True once per engine switch.
        parts = [r.name]
        if r.kind == "row" and r.predicate is not None:
            parts.append(repr(r.predicate))
        if r.kind == "foreign_key":
            parts.append(_df_sig(r.ref))
        return "|".join(parts)

    def _content_sig(k, v):
        if v is None:
            return repr(v)
        if k == "expectations":
            return "rules:" + ";".join(_rule_sig(r) for r in v)
        if k == "benchmark":
            return _df_sig(v)
        return repr(v)

    fp_src = {k: _content_sig(k, v) for k, v in sorted(sig.items())}
    fp_src["id_col"], fp_src["text_col"] = id_col, text_col
    stages = _curation_stages(
        doc_columns=docs.columns, id_col=id_col, text_col=text_col, **sig
    )
    try:
        # the commit/resume/fingerprint mechanics are operators.flow's
        # ONE implementation (this function contributes the stage list
        # and the content signatures)
        return resumable_flow(
            spark, stages, root, params_fingerprint(fp_src),
            initial=docs, force=force,
        )
    except ValueError as e:
        if "different parameters" in str(e):
            raise ValueError(
                "curate_resumable: checkpoint root holds a run with "
                "different parameters; pass force=True to restart"
            ) from None
        raise


def gc_curate_checkpoints(
    spark, root: str, max_age_ms: int, now_ms: int | None = None
) -> dict[str, list[str]]:
    """Sweep superseded generations under every stage dir of a
    :func:`curate_resumable` root (each stage keeps its committed
    winner unconditionally — ``layout.gc_table_generations``
    semantics, including the reader-lifetime sizing note). Alias of
    ``operators.flow.gc_flow_checkpoints`` — one janitor for every
    resumable flow."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.flow import (
        gc_flow_checkpoints,
    )

    return gc_flow_checkpoints(spark, root, max_age_ms, now_ms=now_ms)


def curate_with_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> tuple[DataFrame, dict[str, int]]:
    """:func:`curate` with per-stage yield reporting: returns
    ``(result, stats)`` where ``stats`` maps ``input`` and every stage
    name to its surviving row count — the "which gate killed how many
    documents" answer every pipeline run needs (the reference prints
    per-stage record counts for the same reason,
    ``…Local/ingestion/data_ingestion_batch.py:87,105,122``).

    Each stage boundary is materialized (through the pluggable
    ``materialize`` seam) and counted, so the counts cost one cheap job
    per stage over an already-computed frame and later stages never
    recompute earlier ones — at corpus scale that re-computation, not
    the counting, is what would hurt. Same keyword surface as
    :func:`curate`."""
    import inspect

    from big_data___knowledge_graph_construction_with_llm_spark.materialize import (
        materialize,
        release,
    )

    # defaults come FROM curate's signature — one source of truth, so a
    # changed default can never desynchronize the two entry points
    # materialize_stages is curate-only: this entry point ALWAYS
    # materializes (the counts depend on it), so it is excluded rather
    # than silently accepted-and-ignored
    sig = {
        name: p.default
        for name, p in inspect.signature(curate).parameters.items()
        if name not in ("docs", "id_col", "text_col", "materialize_stages")
    }
    unknown = set(kwargs) - set(sig)
    if unknown:
        raise TypeError(f"unknown curate arguments: {sorted(unknown)}")
    sig.update(kwargs)
    # materialize the input once: its count and the first stage would
    # otherwise each execute the full upstream lineage
    kept = materialize(docs)
    stats = {"input": kept.count()}
    for name, stage in _curation_stages(
        doc_columns=docs.columns, id_col=id_col, text_col=text_col, **sig
    ):
        out = stage(kept)
        if out is kept:
            # pass-through gate (e.g. expectations_gate): survivors
            # unchanged — record the previous count without a new job
            stats[name] = list(stats.values())[-1]
            continue
        nxt = materialize(out)
        # superseded stage: same eager-release discipline as curate().
        # The `is not docs` guard matters under persist_disk, where
        # materialize(docs) returns docs itself — releasing it would
        # silently drop a cache entry the CALLER may rely on.
        if kept is not docs:
            release(kept)
        kept = nxt
        stats[name] = kept.count()
    return kept, stats
