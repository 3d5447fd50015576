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
    strict: bool = False,
    redact: bool = False,
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
    bar for calling a span "boilerplate" further. ``redact=True``
    rewrites ``text_col`` through :func:`operators.text.redact_pii` as
    the LAST stage — after dedup/decontamination, so redaction (which
    collapses distinct emails to one token) cannot create or mask
    near-duplicate relationships the earlier stages decide on."""
    feats = T.quality_features(docs)
    kept = feats.filter(
        F.col("n_tokens").between(min_tokens, max_tokens)
    ).select(*docs.columns)
    rep = T.repetition_features(kept, id_col, text_col)
    rep_ok = rep.filter(
        (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    ).select(id_col)
    kept = kept.join(rep_ok, id_col, "left_semi")
    kept = exact_dedup_by_hash(kept, text_col, id_col)
    kept = near_dedup(kept, id_col, text_col, jaccard_threshold, strict=strict)
    if max_boilerplate_frac is not None:
        bf_ok = boilerplate_fraction(
            kept,
            id_col,
            text_col,
            span_tokens=boilerplate_span_tokens,
            min_docs=boilerplate_min_docs,
        ).filter(F.col("boilerplate_frac") <= max_boilerplate_frac).select(id_col)
        kept = kept.join(bf_ok, id_col, "left_semi")
    if benchmark is not None:
        kept = decontaminate(
            kept, benchmark, id_col, text_col, threshold=decontam_threshold
        )
    if redact:
        kept = kept.withColumn(text_col, T.redact_pii(text_col))
    return dataset_split(kept, id_col)
