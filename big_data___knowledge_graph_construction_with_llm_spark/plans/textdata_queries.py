"""LLM-training-data queries: dedup, similarity search, text analysis,
multimodal plumbing (the EXT surface mandated by BASELINE.json).

Near-duplicate queries PLANT deterministic duplicates inside the query
(union of the table with mutated clones) so the operators provably fire
on the synthetic corpus — the oracle applies the identical mutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators import text as T
from big_data___knowledge_graph_construction_with_llm_spark.materialize import materialize
from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import (
    content_fingerprints,
    exact_dedup_by_hash,
    incremental_dedup,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from big_data___knowledge_graph_construction_with_llm_spark.operators.multimodal import attach_binary_meta
from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
    cosine_near_dup_pairs,
    knn_brute_force,
    knn_lsh,
    name_similarity_join,
)
from big_data___knowledge_graph_construction_with_llm_spark.plans.registry import query
from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import load

_STOPWORDS = sorted({w for ws in T.LANG_MARKERS.values() for w in ws})
_SQL_STOPLIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


# --- deduplication ------------------------------------------------------------

@query(
    "q_dedup_exact",
    oracle=r"""
    WITH full_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 30 = 0
      UNION ALL
      SELECT doc_id + 5000000, upper(text) FROM documents WHERE doc_id % 40 = 0
    ),
    rk AS (
      SELECT doc_id, CAST(doc_id % 3 AS INT) AS batch,
             row_number() OVER (PARTITION BY text ORDER BY doc_id % 3, doc_id) AS rn,
             count(*) OVER (PARTITION BY text) AS n_copies,
             count(*) OVER (
               PARTITION BY trim(regexp_replace(regexp_replace(lower(text),
                 '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g'))
             ) AS n_copies_norm
      FROM full_docs
    )
    SELECT doc_id, batch, n_copies, n_copies_norm FROM rk WHERE rn = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup by 192-bit content fingerprint — full-pass AND
    incremental in one pipeline, the steady-state 100 TB shape: batch 0
    is the base corpus deduped with a full ``exact_dedup_by_hash`` pass,
    and batches 1 and 2 arrive as APPENDS deduped purely against the
    at-rest ``content_fingerprints`` store (corpus text is never
    re-read; only (xxhash64, md5) pairs shuffle — 64 bits alone
    birthday-collides at ~2³² docs). Two clone plants cover both keep
    paths: +1e6 clones (every 10th id; 1e6 % 3 == 1) land one batch
    AFTER their original mod 3 — and one batch BEFORE it when the
    original sits in batch 2 — so survivors are decided by
    store-wins-then-min-id, NOT global min-id (a clone landing in an
    earlier batch beats its original); +3e6 clones (every 30th id;
    3e6 % 3 == 0) land in the SAME batch as their original,
    exercising the within-batch min-id rule. The oracle's
    ``ORDER BY batch, doc_id`` ranking reproduces both exactly.
    ``n_copies`` is the family size. The oracle groups on the text
    itself: parity proves the fingerprint introduced no collision and
    that the full-pass and incremental paths enforce one keep-rule.
    Folded in r5: the FUZZY-EXACT identity — +5e6 clones are UPPER-cased
    (every 40th id), so they survive byte-exact dedup as their own
    keepers with ``n_copies = 1`` while ``n_copies_norm`` (family size
    under ``content_fingerprints(..., normalize=True)`` /
    ``dedup_normal_form``) counts them into their original's family;
    the oracle recomputes the identical normal form
    (lower → punct→space → collapse ws → trim) in SQL."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    clone1 = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    clone3 = d.filter(F.col("doc_id") % 30 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"), "text"
    )
    clone5 = d.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.upper("text").alias("text"),
    )
    full = d.unionByName(clone1).unionByName(clone3).unionByName(clone5)
    batches = [full.filter(F.col("doc_id") % 3 == i) for i in range(3)]

    base = exact_dedup_by_hash(batches[0], "text", "doc_id")
    # the store is materialized per step, as it would be at rest: each
    # append reads fingerprints, never the corpus (or the lineage of the
    # previous append's full dedup)
    fps = materialize(content_fingerprints(base, "text", "doc_id"))
    kept = base.select("doc_id").withColumn("batch", F.lit(0))
    for i in (1, 2):
        new_rows, new_fps = incremental_dedup(batches[i], fps, "text", "doc_id")
        kept = kept.unionByName(
            new_rows.select("doc_id").withColumn("batch", F.lit(i))
        )
        fps = materialize(fps.unionByName(new_fps))

    # family sizes: one partial-aggregated count over each fingerprint
    # identity (ids + 24-byte fingerprints shuffle; text does not) — the
    # byte-exact identity and the normalized (fuzzy-exact) identity
    # computed in ONE materialized projection (r14): lazily, the two
    # content_fingerprints frames each re-scanned and re-hashed the
    # 4-way-union corpus once per consumer (sizes + the kept join, twice
    # each = 4 corpus passes); the fused frame is computed once and read
    # by all four, and the two id-keyed joins collapse into one
    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import (
        dedup_normal_form,
    )

    norm = dedup_normal_form("text")
    fpx = materialize(
        full.select(
            "doc_id",
            F.xxhash64(F.col("text")).alias("_h64"),
            F.md5(F.col("text").cast("string")).alias("_h128"),
            F.xxhash64(norm).alias("_n64"),
            F.md5(norm.cast("string")).alias("_n128"),
        )
    )
    sizes = fpx.groupBy("_h64", "_h128").agg(F.count("*").alias("n_copies"))
    nsizes = fpx.groupBy("_n64", "_n128").agg(
        F.count("*").alias("n_copies_norm")
    )
    return (
        kept.join(fpx, "doc_id")
        .join(sizes, ["_h64", "_h128"])
        .join(nsizes, ["_n64", "_n128"])
        .select(
            "doc_id",
            F.col("batch").cast("int").alias("batch"),
            "n_copies",
            "n_copies_norm",
        )
    )


def _with_near_dup_clones(d: DataFrame, every: int = 20) -> DataFrame:
    clones = d.filter(F.col("doc_id") % every == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq ww ee")).alias("text"),
    )
    return d.select("doc_id", "text").unionByName(clones)


@query(
    "q_minhash_dedup",
    oracle=r"""
    WITH full_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
      WHERE doc_id % 20 = 0
    ),
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM full_docs
    ),
    dsh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                    i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM tok
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM dsh a JOIN dsh b ON b.s = a.s AND b.doc_id > a.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           i.i / (sa.n + sb.n - i.i) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.i / (sa.n + sb.n - i.i) >= 0.8
    """,
)
def q_minhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, VERIFIED: candidate generation
    (shingle → 64-hash signature → 16 bands → bucket equi-join, with the
    max_bucket skew backstop) followed by the exact n-gram-Jaccard
    verify at threshold 0.8 — the full production near-dup pipeline.
    The oracle recomputes all-pairs Jaccard exhaustively (affordable at
    oracle scale), so a green row ALSO certifies the LSH stage lost no
    true pair ≥ 0.8 on this corpus: at j=0.8 with 16 bands of 4 rows a
    pair is a candidate with p ≈ 0.9998, and the planted clones sit far
    above that."""
    full = _with_near_dup_clones(load(spark, sf, "documents"))
    cand = lsh_candidate_pairs(full, "doc_id", "text", max_bucket=10_000)
    return ngram_jaccard_pairs(full, "doc_id", "text", cand).filter(
        F.col("jaccard") >= 0.8
    )


def _simhash_oracle() -> str:
    """Exhaustive DuckDB twin of the md5-mode 64-bit simhash + hamming≤6
    pair set. Recomputes the SAME signature (bit i = sign of the ±1 sum
    of shingle-hash bit i; hash = md5 hex split into two 32-bit halves)
    and compares ALL doc pairs — affordable at oracle scale. Built
    programmatically: 64 bit-counter sums + two 32-bit folds."""
    sums = ",\n             ".join(
        f"sum(CASE WHEN ({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1 = 1"
        f" THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    lo_fold = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)" for i in range(32)
    )
    hi_fold = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i - 32}) ELSE 0 END)"
        for i in range(32, 64)
    )
    return rf"""
    WITH full_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
      WHERE doc_id % 20 = 0
    ),
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM full_docs
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                    i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS s
      FROM tok
    ),
    hh AS (
      SELECT doc_id,
             ('0x' || substring(md5(s), 1, 8))::BIGINT AS hi,
             ('0x' || substring(md5(s), 9, 8))::BIGINT AS lo
      FROM sh
    ),
    bits AS (
      SELECT doc_id,
             {sums}
      FROM hh GROUP BY doc_id
    ),
    sims AS (
      SELECT doc_id, {lo_fold} AS sim_lo, {hi_fold} AS sim_hi FROM bits
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sim_lo, b.sim_lo))
              + bit_count(xor(a.sim_hi, b.sim_hi)) AS INT) AS hamming
    FROM sims a JOIN sims b ON b.doc_id > a.doc_id
    WHERE bit_count(xor(a.sim_lo, b.sim_lo))
        + bit_count(xor(a.sim_hi, b.sim_hi)) <= 6
    """


@query("q_simhash_dedup", oracle=_simhash_oracle())
def q_simhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (7 derived bands, exact hamming ≤ 6 verify —
    the band count follows max_hamming so the pigeonhole recall guarantee
    holds: any pair within hamming 6 shares at least one of 7 exact
    bands, so the banded join + exact verify returns EXACTLY the set
    {pairs : hamming(simhash a, simhash b) ≤ 6}. That completeness is
    what makes this oracle-checkable: the oracle recomputes the same
    md5-mode simhash exhaustively over all pairs and must agree pair-for-
    pair (``hash_mode="md5"`` exists precisely so an independent engine
    can reproduce the bits; production runs keep the faster xxhash64).

    max_hamming=6 is a measured recall point for the planted clones: the
    " qq ww ee" suffix moves short docs' simhash by a median of ~5 bits —
    tightening the radius to buy back bucket size would silently halve
    what this query finds. At radius 6 the bands are only 9-10 bits wide,
    so the max_bucket cap is NOT optional at scale: it bounds every band
    bucket before the self-join (see ``simhash_near_dup_pairs``); at
    oracle scale no bucket reaches the cap, so capping does not perturb
    the verified set.
    """
    full = _with_near_dup_clones(load(spark, sf, "documents"))
    return simhash_near_dup_pairs(
        full, "doc_id", "text", max_hamming=6, max_bucket=10_000, hash_mode="md5"
    )


@query(
    "q_ngram_jaccard",
    oracle="""
    WITH full_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
      WHERE doc_id % 20 = 0
    ),
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM full_docs
    ),
    dsh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                    i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM tok
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    pairs AS (
      SELECT doc_id AS id_a, doc_id + 1000000 AS id_b FROM documents
      WHERE doc_id % 20 = 0
    ),
    inter AS (
      SELECT p.id_a, p.id_b, count(*) AS i
      FROM pairs p
      JOIN dsh a ON a.doc_id = p.id_a
      JOIN dsh b ON b.doc_id = p.id_b AND b.s = a.s
      GROUP BY p.id_a, p.id_b
    )
    SELECT i.id_a, i.id_b,
           i.i / (sa.n + sb.n - i.i) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact token-3-gram Jaccard on candidate pairs (the LSH verify
    stage): explode distinct shingles, equi-join, count / union."""
    d = load(spark, sf, "documents")
    full = _with_near_dup_clones(d)
    pairs = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1000000).alias("id_b")
    )
    return ngram_jaccard_pairs(full, "doc_id", "text", pairs)


_QUOTE_FILLER = (
    "zzq unrelated filler tail words keeping whole document jaccard far "
    "below any threshold for sure"
)

@query(
    "q_decontaminate",
    oracle=rf"""
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT 999999,
             array_to_string(
               list_slice(string_split_regex(trim(text), '\s+'), 1, 13), ' ')
               || ' {_QUOTE_FILLER}',
             'en'
      FROM documents WHERE doc_id = 0
    ),
    bench AS (
      SELECT text FROM documents WHERE doc_id % 50 = 0
    ),
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM corpus
    ),
    dsh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                    i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM tok
    ),
    dsz AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    btok AS (
      SELECT text, string_split_regex(trim(text), '\s+') AS t FROM bench
    ),
    bsh AS (
      SELECT DISTINCT text,
             unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                    i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM btok
    ),
    bsz AS (SELECT text, count(*) AS n FROM bsh GROUP BY text),
    inter AS (
      SELECT d.doc_id, b.text, count(*) AS i
      FROM dsh d JOIN bsh b ON d.s = b.s
      GROUP BY d.doc_id, b.text
    ),
    leaked AS (
      SELECT DISTINCT i.doc_id
      FROM inter i
      JOIN dsz ON dsz.doc_id = i.doc_id
      JOIN bsz ON bsz.text = i.text
      WHERE i.i / (dsz.n + bsz.n - i.i) >= 0.8
    ),
    d13 AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 12 + 1),
                    i -> array_to_string(list_slice(t, i, i + 12), ' '))) AS g
      FROM tok WHERE len(t) >= 13
    ),
    b13 AS (
      SELECT DISTINCT
             unnest(list_transform(range(1, len(t) - 12 + 1),
                    i -> array_to_string(list_slice(t, i, i + 12), ' '))) AS g
      FROM btok WHERE len(t) >= 13
    ),
    leak13 AS (
      SELECT DISTINCT d.doc_id FROM d13 d JOIN b13 b ON d.g = b.g
    )
    SELECT doc_id, lang FROM corpus
    WHERE doc_id NOT IN (SELECT doc_id FROM leaked)
      AND doc_id NOT IN (SELECT doc_id FROM leak13)
    """,
)
def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (eval-leak filter), BOTH criteria of a
    production pipeline: (a) whole-doc n-gram Jaccard ≥ 0.8 via
    cross-dataset MinHash-LSH + exact verify + anti-join
    (``operators.dedup.decontaminate``) — every 50th document doubles
    as a 'benchmark' doc, so those corpus rows are exact leaks; (b)
    EXACT shared 13-gram (``operators.dedup.ngram_decontaminate``, the
    GPT-3/PaLM criterion) — a planted corpus doc (id 999999) quotes 13
    tokens of benchmark doc 0 inside unrelated filler, sitting far
    below the Jaccard threshold, so only the 13-gram leg can drop it:
    the green hash row proves that leg is load-bearing, not shadowed.
    The oracle recomputes both criteria exhaustively (benchmark is
    small, so DuckDB can afford all pairs) — agreement also certifies
    the LSH stage lost no leak above the threshold on this corpus.

    Composition note: the 13-gram leg runs against the ORIGINAL corpus,
    not the Jaccard-cleaned frame — the leak sets are independent, so
    the kept set is identical either way (docs NOT Jaccard-leaked AND
    NOT 13-gram-leaked), but chaining ``ngram_decontaminate(clean, …)``
    would consume the lazy Jaccard DAG twice (once for span extraction,
    once as the anti-join left side), re-running its verify pipeline.
    Independent legs + one extra anti-join measured ~30% faster at
    sf0.1 with byte-identical output."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import (
        decontaminate,
        ngram_leaks,
    )

    d = load(spark, sf, "documents")
    planted = d.filter(F.col("doc_id") == 0).select(
        F.lit(999999).cast("long").alias("doc_id"),
        F.concat(
            F.array_join(F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 13), " "),
            F.lit(" " + _QUOTE_FILLER),
        ).alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus = d.select("doc_id", "text", "lang").unionByName(planted)
    bench = d.filter(F.col("doc_id") % 50 == 0).select("text")
    clean = decontaminate(corpus, bench, "doc_id", "text", threshold=0.8)
    leak13 = ngram_leaks(corpus, bench, "doc_id", "text", n=13).select("doc_id")
    return clean.join(leak13, "doc_id", "left_anti").select("doc_id", "lang")


# --- similarity search ----------------------------------------------------------

def _query_vec(spark: SparkSession, sf: str) -> list[float]:
    row = (
        load(spark, sf, "embeddings").filter(F.col("vec_id") == 0).select("embedding").head()
    )
    return [float(x) for x in row[0]]


@query(
    "q_knn_bruteforce",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    single AS (
      SELECT 'single' AS tag, vec_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id <> 0
      ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4) DESC,
               vec_id
      LIMIT 10
    ),
    bq AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id IN (0, 7, 21)
    ),
    scored AS (
      SELECT bq.qid, e.vec_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[], bq.qv), 4) AS cosine
      FROM embeddings e CROSS JOIN bq
      WHERE e.vec_id <> 0
    ),
    batch AS (
      SELECT 'batch:' || CAST(qid AS VARCHAR) AS tag, vec_id, cosine
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY qid
                                 ORDER BY cosine DESC, vec_id) <= 10
    )
    SELECT tag, vec_id, cosine FROM single
    UNION ALL
    SELECT tag, vec_id, cosine FROM batch
    """,
)
def q_knn_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-k, single AND batch (folded r13 so the batch
    operator family carries a hash-graded oracle row):

    - ``single`` leg: one query vector (embedding of vec_id 0 — a
      parameter fetch, not data movement), scan + TakeOrdered, no
      corpus shuffle.
    - ``batch:<qid>`` legs: ``knn_brute_force_many`` over a 3-query
      frame in ONE corpus pass — query frame broadcast, Arrow-batched
      per-partition bounded top-k, the only shuffle carrying
      n_queries x n_partitions x k rows. The oracle replays every
      query's exact top-10 with a per-query window, so a wrong score
      OR a wrong per-query cut flips the hash."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        knn_brute_force_many,
    )

    vecs = load(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    single = knn_brute_force(vecs, _query_vec(spark, sf), 10).select(
        F.lit("single").alias("tag"), "vec_id", "cosine"
    )
    qframe = (
        load(spark, sf, "embeddings")
        .filter(F.col("vec_id").isin([0, 7, 21]))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    batch = knn_brute_force_many(vecs, qframe, 10).select(
        F.concat(F.lit("batch:"), F.col("query_id").cast("string")).alias("tag"),
        "vec_id",
        "cosine",
    )
    return single.unionByName(batch)


@query(
    "q_knn_lsh",
    oracle="""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv,
             (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
            + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS b
      FROM embeddings WHERE vec_id = 0
    ),
    c AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
            + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS b
      FROM embeddings WHERE vec_id <> 0
    )
    SELECT c.vec_id, round(list_cosine_similarity(c.v, q.qv), 4) AS cosine
    FROM c JOIN q ON c.b = q.b
    ORDER BY round(list_cosine_similarity(c.v, q.qv), 4) DESC, vec_id
    LIMIT 10
    """,
)
def q_knn_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """ANN top-k probing the query's sign-LSH bucket (scale path: bucket =
    partition key ⇒ partition pruning). The probe is deterministic —
    sign bits of the first 4 dims — so the oracle recomputes the same
    bucket and the same exact-cosine top-k inside it."""
    vecs = load(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    return knn_lsh(vecs, _query_vec(spark, sf), 10)


@query(
    "q_cosine_sim",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, label,
             list_concat([embedding[1]::DOUBLE + 0.05],
                         list_slice(embedding::DOUBLE[], 2, len(embedding)))
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    b AS (
      SELECT *,
             (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END
              + CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END
              + CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END
              + CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS bkt
      FROM e
    ),
    p AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             round(list_cosine_similarity(a.v, c.v), 4) AS cosine
      FROM b a JOIN b c
        ON a.label = c.label AND a.bkt = c.bkt AND a.vec_id < c.vec_id
      WHERE round(list_cosine_similarity(a.v, c.v), 4) >= 0.95
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM p
      UNION
      SELECT id_b, id_a FROM p
    ),
    r(a, m) AS (
      SELECT s, s FROM sym
      UNION
      SELECT r.a, s.d FROM r JOIN sym s ON s.s = r.m
    ),
    comp AS (SELECT a AS vid, min(m) AS family FROM r GROUP BY a)
    SELECT p.id_a, p.id_b, p.cosine, comp.family
    FROM p JOIN comp ON comp.vid = p.id_a
    """,
)
def q_cosine_sim(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-duplicate pairs ≥ 0.95 cosine, blocked on
    (label × 4 sign-LSH bits) — the pair space never goes quadratic in
    the corpus — then SemDeDup-style family resolution: connected
    components over the pair graph, ``family`` = min vec_id of each
    near-dup cluster (chains A≈B≈C are ONE family even when A,C are not
    a pair themselves). ``operators.similarity.embedding_dedup`` is this
    exact pipeline plus a 2-line min-id anti-join (unit-tested); the
    oracle replays blocking + pairs in SQL and resolves families with a
    recursive transitive closure. Clones (dim-1 perturbed) are planted
    so true pairs exist."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.graph_algos import (
        pair_components,
    )

    e = load(spark, sf, "embeddings")
    ed = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    clones = ed.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        "label",
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    full = ed.unionByName(clones)
    pairs = materialize(
        cosine_near_dup_pairs(full, threshold=0.95, block_cols=["label"], sign_dims=4)
    )
    comps = pair_components(pairs, strict=True)
    return pairs.join(
        comps.select(F.col("id").alias("id_a"), F.col("comp").alias("family")),
        "id_a",
    ).select("id_a", "id_b", "cosine", "family")


@query(
    "q_sim_join_names",
    oracle="""
    WITH r AS (
      SELECT c_custkey AS r_id, replace(c_name, 'Customer#', 'Custmer#') AS r_name
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c_custkey, c_name, r_id, r_name,
           CAST(levenshtein(lower(c_name), lower(r_name)) AS INT) AS edit_distance
    FROM customer JOIN r ON right(c_name, 4) = right(r_name, 4)
    WHERE levenshtein(lower(c_name), lower(r_name)) <= 2
    """,
)
def q_sim_join_names(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked Levenshtein similarity join (entity resolution): mutated
    clone names re-matched to their originals, blocked on name suffix."""
    c = load(spark, sf, "customer")
    right = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("r_id"),
        F.regexp_replace("c_name", "Customer#", "Custmer#").alias("r_name"),
    )
    joined = name_similarity_join(
        c.select("c_custkey", "c_name"),
        right,
        "c_name",
        "r_name",
        max_edit=2,
        block_fn=lambda col: F.substring(col, -4, 4),
    )
    return joined.select(
        "c_custkey", "c_name", "r_id", "r_name",
        F.col("edit_distance").cast("int").alias("edit_distance"),
    )


# --- text analysis ---------------------------------------------------------------

#: deterministic boilerplate planted into every 5th document — 9
#: tokens, so each planted doc carries 2 full 8-token windows from
#: inside the block (plus doc-specific boundary windows)
_BOILER = "standard license header text common to many documents here"


@query(
    "q_token_count",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 5 = 0 THEN text || ' {_BOILER}'
                  ELSE text END AS ptext
      FROM documents
    ),
    tok AS (
      SELECT doc_id, string_split_regex(trim(ptext), '\s+') AS tk FROM t
    ),
    dsh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(tk) - 7 + 1),
                    i -> array_to_string(list_slice(tk, i, i + 7), ' '))) AS s
      FROM tok WHERE len(tk) >= 8
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    rep AS (SELECT s FROM dsh GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
    hits AS (
      SELECT doc_id, count(*) AS h FROM dsh JOIN rep USING (s) GROUP BY doc_id
    ),
    psh AS (
      SELECT doc_id, u.pos AS pos, u.s AS s FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk) - 7 + 1),
                      i -> struct_pack(pos := i,
                             s := array_to_string(list_slice(tk, i, i + 7), ' '))))
                   AS u
        FROM tok WHERE len(tk) >= 8
      )
    ),
    cov AS (
      SELECT DISTINCT doc_id, pos + o AS cp
      FROM psh JOIN rep USING (s),
           (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS o) offs
    ),
    ncov AS (SELECT doc_id, count(*) AS c FROM cov GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(string_split_regex(trim(t.text), '\s+')) AS INT) AS n_tokens,
           CAST(len(regexp_extract_all(t.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS INT) AS n_pieces,
           md5(t.text) AS fp,
           CASE WHEN sizes.n IS NULL THEN 0.0
                ELSE round(coalesce(hits.h, 0)::DOUBLE / sizes.n, 4)
           END AS boilerplate_frac,
           CAST(len(tok.tk) - coalesce(ncov.c, 0) AS INT) AS n_tokens_excised
    FROM t
    JOIN tok ON tok.doc_id = t.doc_id
    LEFT JOIN sizes ON sizes.doc_id = t.doc_id
    LEFT JOIN hits ON hits.doc_id = t.doc_id
    LEFT JOIN ncov ON ncov.doc_id = t.doc_id
    """,
)
def q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting (whitespace tokens + BPE-ish regex pieces) plus the
    cross-engine-stable md5 content fingerprint — one scan-speed
    projection per document — PLUS the repeated-span boilerplate leg:
    a fixed 9-token licence block is planted into every 5th document
    and ``operators.dedup.boilerplate_fraction`` (8-token spans,
    min_docs=2) must score exactly the planted share, 0.0 everywhere
    else; the oracle recomputes the span sets exhaustively. Token
    counts and fp stay on the ORIGINAL text — the plant exists only for
    the span leg. Folded in r5: ``n_tokens_excised`` — the token count
    after ``operators.dedup.excise_repeated_spans`` scrubs the planted
    block (the oracle recomputes covered positions exhaustively from
    positional spans × the repeated set), so excision's exact
    cover-and-remove semantics are hash-verified per document. The
    order-sensitive polynomial rolling-hash fingerprint
    (``operators.text.fingerprint64``, one aggregate pass, no shuffle)
    is not oracle-expressible and is covered by unit tests
    (``tests/test_operators_misc.py``) instead of a registry slot."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import (
        scrub_repeated_spans,
    )

    d = load(spark, sf, "documents")
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat("text", F.lit(" " + _BOILER))
        ).otherwise(F.col("text")).alias("ptext"),
    )
    # gate fraction + excision from ONE combined pass (r7): the corpus
    # is span-exploded once inside scrub_repeated_spans instead of
    # three times (detect / fraction / excise), result-identical to the
    # standalone pair sharing a hits= table — pinned by operator test
    s = scrub_repeated_spans(
        planted, "doc_id", "ptext", span_tokens=8, min_docs=2
    ).select(
        "doc_id",
        "boilerplate_frac",
        F.when(F.trim("ptext") == "", F.lit(0))
        .otherwise(T.token_count("ptext"))
        .cast("int")
        .alias("n_tokens_excised"),
    )
    return (
        d.select(
            "doc_id",
            T.token_count("text").alias("n_tokens"),
            T.bpe_ish_token_count("text").alias("n_pieces"),
            F.md5("text").alias("fp"),
        )
        .join(s, "doc_id")
        .select(
            "doc_id", "n_tokens", "n_pieces", "fp",
            F.round("boilerplate_frac", 4).alias("boilerplate_frac"),
            "n_tokens_excised",
        )
    )


#: deterministic PII planted into every 7th document (the synthetic
#: corpus contains none), identical string construction on both engines
_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@example.com"
    " or +1 555 000 ' || CAST(doc_id % 10000 AS VARCHAR) ||"
    " ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
)


@query(
    "q_text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks,
             CASE WHEN doc_id % 7 = 0 THEN text || {_PII_SUFFIX_SQL}
                  ELSE text END AS ptext
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                 / greatest(len(toks), 1), 4) AS mean_token_len,
           round(len(list_filter(toks, x -> list_contains([{_SQL_STOPLIST}], x)))::DOUBLE
                 / greatest(len(toks), 1), 4) AS stopword_ratio,
           CAST(len(regexp_extract_all(ptext, '{T.PII_PATTERNS["email"]}')) AS INT)
             AS n_email,
           CAST(len(regexp_extract_all(ptext, '{T.PII_PATTERNS["phone"]}')) AS INT)
             AS n_phone,
           CAST(len(regexp_extract_all(ptext, '{T.PII_PATTERNS["ipv4"]}')) AS INT)
             AS n_ipv4,
           length(regexp_replace(regexp_replace(regexp_replace(ptext,
                 '{T.PII_PATTERNS["email"]}', '[PII]', 'g'),
                 '{T.PII_PATTERNS["ipv4"]}', '[PII]', 'g'),
                 '{T.PII_PATTERNS["phone"]}', '[PII]', 'g')) AS redacted_len
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality + safety signals per document: C4-style quality features
    (length / mean token length / stopword ratio) plus PII detection
    counts and redacted length (``operators.text.pii_counts`` /
    ``redact_pii``) — all pure column expressions, scan-speed, zero
    shuffle. PII is planted deterministically into every 7th doc (the
    synthetic corpus has none); the oracle recomputes detection with its
    own regex engine, so parity proves the patterns behave identically
    under Java regex and RE2."""
    d = load(spark, sf, "documents")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555 000 "),
            (F.col("doc_id") % 10000).cast("string"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ),
    ).otherwise(F.col("text"))
    counts = T.pii_counts(planted)
    return T.quality_features(d).select(
        "doc_id",
        "n_tokens",
        "mean_token_len",
        "stopword_ratio",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        F.length(T.redact_pii(planted)).alias("redacted_len"),
    )


@query(
    "q_lang_guess",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            x -> list_contains([{", ".join(repr(w) for w in T.LANG_MARKERS["de"])}], lower(x)))) AS s_de,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            x -> list_contains([{", ".join(repr(w) for w in T.LANG_MARKERS["en"])}], lower(x)))) AS s_en,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            x -> list_contains([{", ".join(repr(w) for w in T.LANG_MARKERS["es"])}], lower(x)))) AS s_es,
        len(list_filter(string_split_regex(trim(text), '\\s+'),
            x -> list_contains([{", ".join(repr(w) for w in T.LANG_MARKERS["fr"])}], lower(x)))) AS s_fr
      FROM documents
    )
    SELECT CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS guess,
           count(*) AS n
    FROM s GROUP BY 1
    """,
)
def q_lang_guess(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language ID (marker-lexicon argmax; ties alphabetical).
    Uses the staged frame form (r14): tokenize → scores → argmax as
    separate projections so each expensive expression evaluates once
    per row instead of ~12x via expression-tree duplication (measured
    1.61s → 0.69s at sf0.1, identical guesses)."""
    d = load(spark, sf, "documents")
    return (
        T.with_lang_guess(d, "text")
        .groupBy("guess")
        .agg(F.count("*").alias("n"))
    )


# --- multimodal plumbing -----------------------------------------------------------

@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS byte_len,
           sha256(text) AS sha256
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column plumbing: opaque payload (utf-8 bytes of text here;
    image/audio bytes in production) + decoder-free metadata (length,
    content hash). The decode stage itself is the stubbed
    ``operators.multimodal.decode_images`` mapInPandas (unit-tested)."""
    d = load(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return attach_binary_meta(d, "payload").select("doc_id", "byte_len", "sha256")


def _ivf_cache_path(spark: SparkSession, sf: str, tag: str = "k8i2") -> str:
    """Deterministic scratch location for the at-rest IVF index of one
    sf dir, keyed by source path + mtime so a regenerated embeddings
    table invalidates the cache, plus a build-parameter ``tag`` so
    indexes trained with different quantizer settings never share a
    path (the at-rest layout records no build parameters). The mtime
    probe goes through the Hadoop FS API (``fsutil.mtime``), so ``sf``
    may be a remote URI (``s3a://…``) just like every other query
    input. The cache root defaults to the driver's tempdir — right for
    local[n] bench runs — and ``SPARK_GRAFT_IVF_CACHE`` overrides it
    with a shared-storage URI on a cluster (``ensure_ivf_index``'s
    marker-last commit is already safe there)."""
    import hashlib
    import os
    import tempfile

    from big_data___knowledge_graph_construction_with_llm_spark import fsutil

    base = sf if "://" in sf else os.path.abspath(sf)
    src = base.rstrip("/") + "/embeddings.parquet"
    key = hashlib.md5(
        f"{src}:{fsutil.mtime(spark, src)}:{tag}".encode()
    ).hexdigest()[:12]
    root = os.environ.get("SPARK_GRAFT_IVF_CACHE") or tempfile.gettempdir()
    return root.rstrip("/") + f"/spark_graft_ivf_{key}"


@query(
    "q_knn_ivf",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id <> 0
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    a0 AS (SELECT vec_id, v, vec_id % 8 AS c FROM e),
    x1 AS (
      SELECT c, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS val FROM a0
    ),
    m1 AS (
      SELECT c, pos, round(avg(val), 6) AS m FROM x1 GROUP BY c, pos
    ),
    cent1 AS (SELECT c, list(m ORDER BY pos) AS cen FROM m1 GROUP BY c),
    s1 AS (
      SELECT a0.vec_id, a0.v, cent1.c,
             list_reduce(
               list_transform(range(1, len(a0.v) + 1),
                 i -> (a0.v[i] - cent1.cen[i]) * (a0.v[i] - cent1.cen[i])),
               (x, y) -> x + y) AS d2
      FROM a0 CROSS JOIN cent1
    ),
    a1 AS (
      SELECT vec_id, v, c FROM s1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) = 1
    ),
    x2 AS (
      SELECT c, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS val FROM a1
    ),
    m2 AS (
      SELECT c, pos, round(avg(val), 6) AS m FROM x2 GROUP BY c, pos
    ),
    cent2 AS (SELECT c, list(m ORDER BY pos) AS cen FROM m2 GROUP BY c),
    s2 AS (
      SELECT e.vec_id, e.v, cent2.c,
             list_reduce(
               list_transform(range(1, len(e.v) + 1),
                 i -> (e.v[i] - cent2.cen[i]) * (e.v[i] - cent2.cen[i])),
               (x, y) -> x + y) AS d2
      FROM e CROSS JOIN cent2
    ),
    af AS (
      SELECT vec_id, v, c FROM s2
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) = 1
    ),
    probe AS (
      SELECT cent2.c
      FROM cent2, q
      ORDER BY list_reduce(
                 list_transform(range(1, len(q.qv) + 1),
                   i -> (cent2.cen[i] - q.qv[i]) * (cent2.cen[i] - q.qv[i])),
                 (x, y) -> x + y),
               cent2.c
      LIMIT 2
    )
    SELECT af.vec_id,
           round(list_cosine_similarity(af.v, q.qv), 4) AS cosine
    FROM af, q
    WHERE af.c IN (SELECT c FROM probe)
    ORDER BY cosine DESC, af.vec_id
    LIMIT 10
    """,
)
def q_knn_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """ANN top-k, IVF-style, against the AT-REST index: the coarse
    quantizer is trained once and the corpus written
    ``partitionBy("cluster")`` (``ensure_ivf_index``, idempotent); the
    query then probes the 2 nearest clusters, which the scan sees as
    partition pruning — it reads ~n_probe/k of the data and never
    re-trains. This is the 100 TB shape: index build is an offline job,
    queries are pruned scans (q_knn_bruteforce is the unindexed twin).

    Hash-graded since r14 (VERDICT r13 #2): the quantizer here trains
    with ``init="mod"`` (ANSI-replayable seed — ``xxhash64`` is
    Spark-only) and ``round_dp=6`` (centroid means rounded well above
    the partial-sum-merge noise floor), which makes the ENTIRE pipeline
    — 2 Lloyd iterations, final assignment, probe ranking, exact cosine
    top-10 — bit-reproducible in DuckDB: the oracle re-trains the same
    quantizer as unrolled CTEs (the ``q_pagerank`` precedent) with the
    same sequential-fold distance arithmetic (``list_reduce`` matches
    ``F.aggregate`` order) and the same (d2, cluster)/(cosine, vec_id)
    tie-breaks. The recall sweep in BENCH_DETAIL stays on the
    default-init index — this leg grades correctness, that one grades
    accuracy. The oracle-variant index caches under its own tag
    (``k8i2m6``): build parameters are not recorded at rest, so
    differently-trained indexes must never share a path."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        ensure_ivf_index,
        knn_ivf,
    )

    vecs = load(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    idx, cents = ensure_ivf_index(
        spark,
        vecs,
        _ivf_cache_path(spark, sf, tag="k8i2m6"),
        k=8,
        iterations=2,
        init="mod",
        round_dp=6,
    )
    return knn_ivf(idx, cents, _query_vec(spark, sf), 10, n_probe=2)


@query(
    "q_ngram_topk",
    oracle=r"""
    WITH tok AS (
      SELECT string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
             i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g
      FROM tok
      WHERE len(t) >= 2
    ),
    bigram_top AS (
      SELECT g, count(*) AS n
      FROM bg GROUP BY g
      ORDER BY n DESC, g LIMIT 20
    ),
    toks AS (
      SELECT doc_id, lower(t2) AS term
      FROM documents, unnest(string_split_regex(trim(text), '\s+')) AS u(t2)
      WHERE text IS NOT NULL
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('filter', 'join', 'stream', 'vector')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT tf.doc_id, tf.term,
             ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS w
      FROM tf
      JOIN dfreq d USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
    ),
    bm25_top AS (
      SELECT doc_id, round(sum(w), 4) AS score FROM contrib
      WHERE term IN ('join', 'stream', 'vector')
      GROUP BY doc_id
      ORDER BY round(sum(w), 4) DESC, doc_id LIMIT 10
    ),
    qmap(qid, term) AS (
      VALUES (0, 'join'), (0, 'vector'), (1, 'filter'), (1, 'stream')
    ),
    bscored AS (
      SELECT q.qid, c.doc_id, round(sum(c.w), 4) AS score
      FROM contrib c JOIN qmap q USING (term)
      GROUP BY q.qid, c.doc_id
    ),
    bm25b AS (
      SELECT qid, doc_id, score FROM bscored
      QUALIFY row_number() OVER (PARTITION BY qid
                                 ORDER BY score DESC, doc_id) <= 5
    )
    SELECT 'bigram' AS kind, g AS item, CAST(n AS DOUBLE) AS score
    FROM bigram_top
    UNION ALL
    SELECT 'bm25' AS kind, CAST(doc_id AS VARCHAR) AS item, score
    FROM bm25_top
    UNION ALL
    SELECT 'bm25b:' || CAST(qid AS VARCHAR) AS kind,
           CAST(doc_id AS VARCHAR) AS item, score
    FROM bm25b
    """,
)
def q_ngram_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide text analysis + retrieval, two tagged legs (folded in
    r13 to hold the registry at the driver's 50-row graded window —
    house fold discipline, same as ``q_topk``/``q_token_count``):

    - ``bigram`` leg: top-20 bigram frequency (training-data analysis
      staple) — explode bigrams → count → global top-k (TakeOrdered,
      no full sort).
    - ``bm25`` leg (was standalone ``q_bm25_search`` in r12, hash-green
      there): BM25 top-10 retrieval for a 3-term query. The plan
      filters to the probed terms BEFORE any aggregation (only the
      query's terms ever shuffle), per-term document frequencies
      broadcast into the scoring join, top-k is a TakeOrdered. At
      steady state the same scoring runs against an at-rest
      ``text_index`` posting table written clustered + bloomed on
      ``term`` (``operators/text.py:bm25_topk_indexed``; EXT — the
      reference has no retrieval surface, nearest analog is its LLM
      context assembly `Art-Knowledge-Graph-Local/LLM/pipeline.py`).

    - ``bm25b:<qid>`` legs (r13): ``bm25_topk_many`` — BOTH batch
      queries scored in ONE pass over the inline posting index (query
      terms broadcast into the posting join, df over the union of
      probed terms, per-query top-5 via one window). The oracle
      replays each query's scores and per-query cut independently, so
      the batch form is hash-graded, not just unit-tested.

    All legs stay fully load-bearing under the hash compare: a wrong
    bigram count, a wrong BM25 score, or a wrong per-query batch cut
    flips the row hash."""
    from pyspark.sql import Window

    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import shingles
    from big_data___knowledge_graph_construction_with_llm_spark.operators.text import (
        bm25_scored_many,
        tokens,
    )

    d = load(spark, sf, "documents")
    lowered = d.filter(
        F.size(F.split(F.trim("text"), r"\s+")) >= 2
    ).select(F.lower("text").alias("text"))
    bg = lowered.select(F.explode(shingles("text", 2)).alias("bigram"))
    bigram_leg = (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(20)
        .select(
            F.lit("bigram").alias("kind"),
            F.col("bigram").alias("item"),
            F.col("n").cast("double").alias("score"),
        )
    )
    toks = F.transform(tokens("text"), F.lower)
    # ONE corpus stats pass shared by ALL bm25 legs, LAZY (r15): the
    # one-row (n, avgdl) frame broadcast-joins into the scoring, so the
    # stats tokenize pass runs inside the same noop action as everything
    # else — query construction runs ZERO jobs (the r14 shape collected
    # it driver-side at build time, a synchronous corpus pass before the
    # timed action could even start overlapping work).
    st_df = (
        d.filter(F.col("text").isNotNull())
        .select(F.size(toks).alias("dl"))
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    )
    # query_id 2 IS the single-query leg ("vector join stream", k=10):
    # scored through the same batch pass — bm25_topk_indexed parity is
    # bit-exact (same postings, same per-term df, same contrib
    # expression; pinned by test_bm25_many_matches_single) — so the
    # posting pipeline runs ONCE for all three legs instead of once per
    # cut (r15; the r14 shape consumed the lazy postings subtree twice).
    qdf = spark.createDataFrame(
        [(0, "vector join"), (1, "stream filter"), (2, "vector join stream")],
        "query_id int, query string",
    )
    # inline postings with the UNION of every leg's terms filtered
    # BEFORE the (id, term) aggregation — the same only-the-probed-
    # terms-ever-shuffle shape as bm25_topk's inline build; a full
    # text_index here would aggregate every term in the corpus first.
    hits = (
        d.filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").alias("id"),
            F.explode(toks).alias("term"),
            F.size(toks).alias("dl"),
        )
        .filter(F.col("term").isin(["filter", "join", "stream", "vector"]))
        .groupBy("term", "id", "dl")
        .agg(F.count("*").alias("tf"))
    )
    scored = bm25_scored_many(hits, qdf, stats=st_df)
    # ONE window serves both cuts: k=10 for the single leg (query 2),
    # k=5 for the batch legs — same partition/order as topk_per_group
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    bm25_all = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(
            ((F.col("query_id") == 2) & (F.col("_rn") <= 10))
            | ((F.col("query_id") < 2) & (F.col("_rn") <= 5))
        )
        .select(
            F.when(F.col("query_id") == 2, F.lit("bm25"))
            .otherwise(
                F.concat(F.lit("bm25b:"), F.col("query_id").cast("string"))
            )
            .alias("kind"),
            F.col("id").cast("string").alias("item"),
            "score",
        )
    )
    return bigram_leg.unionByName(bm25_all)


@query(
    "q_dataset_split",
    oracle="""
    WITH b AS (
      SELECT lang,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS bucket,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000 AS mbucket
      FROM documents
    ),
    s AS (
      SELECT CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split,
             lang,
             CASE WHEN mbucket < CASE lang WHEN 'en' THEN 10000
                                           WHEN 'de' THEN 5000
                                           WHEN 'fr' THEN 2500
                                           WHEN 'es' THEN 1000
                                           ELSE 0 END
                  THEN 1 ELSE 0 END AS mixed
      FROM b
    )
    SELECT split, lang, count(*) AS n, CAST(sum(mixed) AS BIGINT) AS n_mixed
    FROM s GROUP BY 1, 2
    """,
)
def q_dataset_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by id-hash bucket
    (``operators.sampling.dataset_split``) with per-split language
    counts, PLUS the corpus-mixing leg
    (``operators.sampling.sample_mixture``): ``n_mixed`` counts the
    rows surviving a per-language rate map (all en, half de, quarter
    fr, 10% es, zh absent → default-dropped — exercising the
    allow-list path). Membership for BOTH legs is a pure projection of
    md5(doc_id), identical on every run, engine and cluster size; the
    oracle recomputes split bucket and mixture cutoff independently in
    DuckDB and must agree row-for-row (rate 1.0 must give
    n_mixed == n, rate 0.0 exactly 0)."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.sampling import (
        dataset_split,
        mixture_keep_flag,
    )

    d = load(spark, sf, "documents")
    keep = mixture_keep_flag(
        "lang", "doc_id", {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.1}
    )
    return (
        dataset_split(d, "doc_id")
        .withColumn("_mixed", keep.cast("int"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n"), F.sum("_mixed").alias("n_mixed"))
    )


@query(
    "q_quality_filter",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks, text
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             len(toks) AS n_tokens,
             -- round like quality_features does: the Spark side filters on
             -- 4-dp-rounded features, so boundary docs must agree
             round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
               / greatest(len(toks), 1), 4) AS mtl,
             round(len(list_filter(toks, x -> list_contains([{_SQL_STOPLIST}], x)))::DOUBLE
               / greatest(len(toks), 1), 4) AS sw
      FROM t
    )
    SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens
    FROM feat
    WHERE n_tokens BETWEEN 20 AND 1000 AND mtl BETWEEN 3 AND 12 AND sw >= 0.01
    """,
)
def q_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style quality gate: token count, mean token length and stopword
    ratio band-pass — the filter stage of a training-data pipeline, pure
    expressions at scan speed."""
    d = load(spark, sf, "documents")
    feat = T.quality_features(d)
    return feat.filter(
        (F.col("n_tokens").between(20, 1000))
        & (F.col("mean_token_len").between(3, 12))
        & (F.col("stopword_ratio") >= 0.01)
    ).select("doc_id", "lang", F.col("n_tokens").cast("int").alias("n_tokens"))
