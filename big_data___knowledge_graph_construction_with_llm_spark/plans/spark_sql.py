"""Spark-dialect SQL twins for the query registry — the SQL surface.

``plans.tables.register_tables`` + ``spark.sql`` is a first-class entry
point (SURVEY §3): anything the DataFrame registry computes should be
reachable as a SQL string over the same normalized views.
``spark_sql_queries()`` returns one SQL string per covered query:

* For registry queries whose DuckDB ``oracle_sql()`` strings are
  ANSI-portable (``SPARK_PORTABLE_ORACLES``), the twin IS the oracle
  string, verbatim — one text, two engines.
* For the rest, a Spark-dialect TRANSLATION lives in ``SPARK_SQL_TWINS``
  below: DuckDB-specific routines are rewritten onto Spark SQL builtins
  (``string_split_regex``→``split``, ``list_transform``→``transform``,
  ``quantile_cont``→``percentile``, ``epoch``→``unix_timestamp``,
  ``('0x'||…)::BIGINT``→``conv(…,16,10)``, ``QUALIFY``→ranked subquery,
  ``strftime``→``date_format``, ``[[:punct:]]``→``\\p{Punct}``, …).

Every entry is pinned by ``tests/test_oracle_parity.py``: the SQL twin
through the engine's own SQL entry point must reproduce the DataFrame
plan's rows exactly (column names + order-insensitive values). The twins
deliberately mirror the ORACLE strings' logic (same spec, third
surface) rather than the DataFrame plans' physical shape — agreement of
three independent formulations is the point.

Dialect gotchas encoded here (the cautionary tales that keep this file
hand-pinned instead of auto-probed):

* DuckDB ``regexp_replace`` is first-match unless given the ``'g'``
  flag **in the position Spark uses for its (1-based) position arg** —
  the same text can PARSE on both engines and mean different things.
  Spark replaces globally, always; translations drop the flag.
* DuckDB list slicing is 1-based **inclusive-end** (``l[2:]``,
  ``list_slice(t, i, i+2)``); Spark ``slice(t, i, LENGTH)`` takes a
  length — off-by-ones silently change shingle widths.
* DuckDB integer ``/`` is true division (DOUBLE); Spark's ``/`` on
  bigints is too, but ``//`` must become ``div``.
* ``count(*)`` comparisons: both produce BIGINT — no cast drift.
* Spark's ``regexp_extract_all`` defaults to group index **1** (DuckDB:
  whole match); patterns without a capture group need an explicit 0.
* Spark 4's ``WITH RECURSIVE`` allows only ``UNION ALL``, which cannot
  terminate on the cyclic symmetrized pair graphs the two
  component-resolving oracles (``q_cosine_sim``, ``q_resolve_entities``)
  recurse over. Their twins instead UNROLL 10 rounds of min-label
  propagation over a self-looped edge set (each round a single
  join+min-aggregate referencing only the previous round — a twice-
  referenced round would inline 2^rounds plan copies) — exact for
  component diameter ≤ 10, the same bounded-fixpoint contract as the
  registry's own ``connected_components(max_iter=20)``.
"""

from __future__ import annotations

#: oracle_sql() strings that are ANSI-portable enough to run VERBATIM on
#: Spark SQL too. Pinned, not probed: q_dedup_exact's oracle PARSES on
#: Spark but means something else (the regexp_replace 'g'-flag trap
#: above), which is why membership here is a reviewed decision.
SPARK_PORTABLE_ORACLES = [
    "q_agg_basic",
    "q_canonicalize_relations",
    "q_connected_components",  # recursive CTE — Spark 4 runs it
    "q_filter_project",
    "q_graph_build",
    "q_grouping_sets",
    "q_join_orders_customer",
    "q_membership",
    "q_range_join",
    "q_scan_stats",
    "q_sim_join_names",
    "q_skew_join",
    "q_triangle_count",
    "q_two_hop",
    "q_union_fill",
    "q_weighted_mean",
    "q_xml_records",
]

#: Shared fragment: distinct word-n-gram shingles of a token array `t`,
#: as `(… ) AS s` rows via explode — DuckDB's
#: `unnest(list_transform(range(...), i -> array_to_string(list_slice(...))))`.
def _shingles(n: int) -> str:
    return (
        f"explode(transform(sequence(1, greatest(size(t) - {n - 1}, 1)),"
        f" i -> array_join(slice(t, i, {n}), ' ')))"
    )


_STOPWORDS = (
    "'and', 'der', 'die', 'el', 'es', 'est', 'et', 'is', 'ist', 'la', "
    "'le', 'les', 'los', 'nicht', 'of', 'que', 'the', 'to', 'und'"
)

#: md5-prefix bucket in [0, m): DuckDB `('0x'||substring(md5(x),1,8))::BIGINT % m`
def _md5bucket(expr: str, m: int) -> str:
    return (
        f"(cast(conv(substring(md5(cast({expr} AS STRING)), 1, 8), 16, 10)"
        f" AS BIGINT) % {m})"
    )


SPARK_SQL_TWINS: dict[str, str] = {}

SPARK_SQL_TWINS["q_asof"] = """
    SELECT event_id, user_id, ts_s, last_click_value, gap_s FROM (
      SELECT event_id, user_id, event_type,
             date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s,
             last_value(CASE WHEN event_type = 'click' THEN value END)
                   IGNORE NULLS
                   OVER (PARTITION BY user_id ORDER BY ts, event_type, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_click_value,
             unix_timestamp(ts)
               - lag(unix_timestamp(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_type, event_id)
                 AS gap_s
      FROM events
    ) WHERE event_type = 'purchase'
"""

SPARK_SQL_TWINS["q_order_stats"] = """
    SELECT o_orderpriority,
           count(*) AS n,
           count(DISTINCT o_custkey) AS n_cust,
           round(percentile(o_totalprice, 0.5), 2) AS p50,
           round(percentile(o_totalprice, 0.95), 2) AS p95,
           round(max(o_totalprice), 2) AS mx
    FROM orders GROUP BY o_orderpriority
"""

SPARK_SQL_TWINS["q_rank_in_group"] = """
    SELECT c_nationkey, c_custkey, c_acctbal, rnk, pct_rnk, cdist, quartile
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(rank() OVER w AS INT) AS rnk,
             round(percent_rank() OVER w, 6) AS pct_rnk,
             round(cume_dist() OVER w, 6) AS cdist,
             CAST(ntile(4) OVER w AS INT) AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey)
    ) WHERE rnk <= 5
"""

SPARK_SQL_TWINS["q_window_frames"] = """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total,
           round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY unix_timestamp(o_orderdate)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS sum_30d
    FROM orders
"""

SPARK_SQL_TWINS["q_topk"] = f"""
    SELECT 'global' AS tag, o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT * FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    )
    UNION ALL
    SELECT 'group' AS tag, o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey) AS _rn
      FROM orders
    ) WHERE _rn <= 3
    UNION ALL
    SELECT 'budget' AS tag, o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT *, sum(o_orderkey % 50 + 10) OVER (
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - (o_orderkey % 50 + 10) AS strt
      FROM orders
    ) WHERE strt < 500
    UNION ALL
    SELECT 'sample' AS tag, o_orderpriority, o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 97 = 0
      AND {_md5bucket('o_orderkey', 10000)} < 3700
"""

SPARK_SQL_TWINS["q_time_math"] = """
    SELECT event_id,
           unix_timestamp(ts) AS epoch_s,
           date_format(ts, 'yyyy-MM-dd HH:00:00') AS hour_bucket,
           CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS INT) AS day_no,
           regexp_extract(concat('dated ', date_format(ts, 'yyyy'), ' ca.'),
                          '(\\\\d{4})', 1) AS year
    FROM events
"""

SPARK_SQL_TWINS["q_normalize"] = """
    SELECT DISTINCT o_orderpriority,
           array_join(
             transform(
               split(trim(regexp_replace(o_orderpriority, '[-_\\\\s]+', ' ')), ' '),
               w -> concat(upper(substring(w, 1, 1)), lower(substring(w, 2)))),
             '') AS label_norm,
           upper(regexp_replace(trim(o_orderpriority), '[-\\\\s]+', '_')) AS rel_norm
    FROM orders
"""

SPARK_SQL_TWINS["q_project_norm"] = """
    SELECT doc_id,
           regexp_extract(
             CASE WHEN lang = 'en'
                  THEN concat('http://ex.org/', source, '#d', doc_id)
                  ELSE concat('http://ex.org/', source, '/d', doc_id) END,
             '([^/#]+)$', 1) AS localname,
           CAST(doc_id AS STRING) AS subject,
           coalesce(nullif(lang, 'zh'), 'Entity') AS subject_type,
           'written_in' AS relation,
           lang AS object,
           'Entity' AS object_type
    FROM documents
"""

SPARK_SQL_TWINS["q_props_map"] = """
    SELECT event_type,
           round(avg(CAST(get_json_object(props, '$.k') AS INT)), 4) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
"""

SPARK_SQL_TWINS["q_quality_filter"] = f"""
    WITH t AS (
      SELECT doc_id, lang, split(trim(text), '\\\\s+') AS toks, text
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             size(toks) AS n_tokens,
             round(CAST(length(regexp_replace(text, '\\\\s+', '')) AS DOUBLE)
               / greatest(size(toks), 1), 4) AS mtl,
             round(CAST(size(filter(toks, x -> array_contains(array({_STOPWORDS}), x))) AS DOUBLE)
               / greatest(size(toks), 1), 4) AS sw
      FROM t
    )
    SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens
    FROM feat
    WHERE n_tokens BETWEEN 20 AND 1000 AND mtl BETWEEN 3 AND 12 AND sw >= 0.01
"""

SPARK_SQL_TWINS["q_text_quality"] = f"""
    WITH t AS (
      SELECT doc_id, text, split(trim(text), '\\\\s+') AS toks,
             CASE WHEN doc_id % 7 = 0 THEN concat(text, ' contact user', CAST(doc_id AS STRING), '@example.com or +1 555 000 ', CAST(doc_id % 10000 AS STRING), ' ip 10.0.', CAST(doc_id % 256 AS STRING), '.7')
                  ELSE text END AS ptext
      FROM documents
    )
    SELECT doc_id,
           CAST(size(toks) AS INT) AS n_tokens,
           round(CAST(length(regexp_replace(text, '\\\\s+', '')) AS DOUBLE)
                 / greatest(size(toks), 1), 4) AS mean_token_len,
           round(CAST(size(filter(toks, x -> array_contains(array({_STOPWORDS}), x))) AS DOUBLE)
                 / greatest(size(toks), 1), 4) AS stopword_ratio,
           CAST(size(regexp_extract_all(ptext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{{2,}}', 0))
                AS INT) AS n_email,
           CAST(size(regexp_extract_all(ptext, '\\\\+\\\\d[\\\\d -]{{7,}}\\\\d', 0))
                AS INT) AS n_phone,
           CAST(size(regexp_extract_all(ptext, '\\\\b\\\\d{{1,3}}\\\\.\\\\d{{1,3}}\\\\.\\\\d{{1,3}}\\\\.\\\\d{{1,3}}\\\\b', 0))
                AS INT) AS n_ipv4,
           length(regexp_replace(regexp_replace(regexp_replace(ptext,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{{2,}}', '[PII]'),
                 '\\\\b\\\\d{{1,3}}\\\\.\\\\d{{1,3}}\\\\.\\\\d{{1,3}}\\\\.\\\\d{{1,3}}\\\\b', '[PII]'),
                 '\\\\+\\\\d[\\\\d -]{{7,}}\\\\d', '[PII]')) AS redacted_len
    FROM t
"""

SPARK_SQL_TWINS["q_lang_guess"] = """
    WITH s AS (
      SELECT doc_id,
        size(filter(split(trim(text), '\\\\s+'),
            x -> array_contains(array('der', 'die', 'und', 'nicht', 'ist'), lower(x)))) AS s_de,
        size(filter(split(trim(text), '\\\\s+'),
            x -> array_contains(array('the', 'and', 'of', 'to', 'is'), lower(x)))) AS s_en,
        size(filter(split(trim(text), '\\\\s+'),
            x -> array_contains(array('el', 'la', 'los', 'que', 'es'), lower(x)))) AS s_es,
        size(filter(split(trim(text), '\\\\s+'),
            x -> array_contains(array('le', 'la', 'et', 'les', 'est'), lower(x)))) AS s_fr
      FROM documents
    )
    SELECT CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS guess,
           count(*) AS n
    FROM s GROUP BY 1
"""

SPARK_SQL_TWINS["q_multimodal_meta"] = """
    SELECT doc_id,
           CAST(octet_length(text) AS INT) AS byte_len,
           sha2(text, 256) AS sha256
    FROM documents
"""

SPARK_SQL_TWINS["q_dataset_split"] = f"""
    WITH b AS (
      SELECT lang,
             {_md5bucket('doc_id', 100)} AS bucket,
             {_md5bucket('doc_id', 10000)} AS mbucket
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
"""

SPARK_SQL_TWINS["q_ngram_topk"] = f"""
    WITH tok AS (
      SELECT split(trim(lower(text)), '\\\\s+') AS t FROM documents
    ),
    bg AS (
      SELECT {_shingles(2)} AS g
      FROM tok
      WHERE size(t) >= 2
    ),
    bigram_top AS (
      SELECT g, count(*) AS n
      FROM bg GROUP BY g
      ORDER BY n DESC, g LIMIT 20
    ),
    toks AS (
      SELECT doc_id, lower(t2) AS term
      FROM documents LATERAL VIEW explode(split(trim(text), '\\\\s+')) AS t2
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
      ORDER BY score DESC, doc_id LIMIT 10
    ),
    qmap AS (
      SELECT 0 AS qid, 'join' AS term UNION ALL
      SELECT 0, 'vector' UNION ALL
      SELECT 1, 'filter' UNION ALL
      SELECT 1, 'stream'
    ),
    bscored AS (
      SELECT q.qid, c.doc_id, round(sum(c.w), 4) AS score
      FROM contrib c JOIN qmap q USING (term)
      GROUP BY q.qid, c.doc_id
    ),
    bm25b AS (
      SELECT qid, doc_id, score FROM (
        SELECT qid, doc_id, score,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score DESC, doc_id) AS rn
        FROM bscored
      ) WHERE rn <= 5
    )
    SELECT 'bigram' AS kind, g AS item, CAST(n AS DOUBLE) AS score
    FROM bigram_top
    UNION ALL
    SELECT 'bm25' AS kind, CAST(doc_id AS STRING) AS item, score
    FROM bm25_top
    UNION ALL
    SELECT concat('bm25b:', CAST(qid AS STRING)) AS kind,
           CAST(doc_id AS STRING) AS item, score
    FROM bm25b
"""

SPARK_SQL_TWINS["q_pipeline_e2e"] = """
    SELECT CAST(doc_id AS STRING) AS subject,
           'Record' AS subject_type,
           'has_lang' AS relation,
           lang AS object,
           'Entity' AS object_type
    FROM documents WHERE lang IS NOT NULL AND lang <> ''
    UNION ALL
    SELECT CAST(doc_id AS STRING), 'Record', 'has_n_tokens',
           CAST(size(split(trim(text), '\\\\s+')) AS STRING),
           'Entity'
    FROM documents
"""

SPARK_SQL_TWINS["q_rdf_filter_keepset"] = """
    SELECT DISTINCT concat('u:', user_id) AS subject,
           event_type AS predicate,
           get_json_object(props, '$.k') AS object
    FROM events
    WHERE event_type IN ('click', 'purchase', 'view')
      AND trim(concat('u:', user_id)) <> ''
      AND trim(get_json_object(props, '$.k')) <> ''
      AND concat('u:', user_id) IS NOT NULL
      AND event_type IS NOT NULL
      AND get_json_object(props, '$.k') IS NOT NULL
"""

SPARK_SQL_TWINS["q_json_repair"] = """
    SELECT event_id,
           CAST(get_json_object(
                regexp_replace(regexp_replace(props, '\\\\}$', ',}'),
                               ',\\\\s*\\\\}', '}'),
                '$.k') AS INT) AS k_repaired,
           CAST(get_json_object(
                regexp_extract(concat('LLM says: ', props, ' -- end'),
                               '(\\\\{[^{}]*\\\\})', 1),
                '$.k') AS INT) AS k_scraped,
           to_json(named_struct(
               'event_id', event_id,
               'k', coalesce(CAST(get_json_object(
                    regexp_replace(regexp_replace(props, '\\\\}$', ',}'),
                                   ',\\\\s*\\\\}', '}'),
                    '$.k') AS INT), -1))) AS js
    FROM events
"""


SPARK_SQL_TWINS["q_knn_bruteforce"] = """
    WITH q AS (SELECT cast(embedding AS array<double>) AS qv FROM embeddings WHERE vec_id = 0),
    e AS (SELECT vec_id, cast(embedding AS array<double>) AS v FROM embeddings WHERE vec_id <> 0),
    single AS (
      SELECT 'single' AS tag, vec_id, round((aggregate(zip_with(e.v, q.qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / (sqrt(aggregate(e.v, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(q.qv, 0D, (acc, x) -> acc + x * x)))), 4) AS cosine
      FROM e CROSS JOIN q
      ORDER BY cosine DESC, vec_id
      LIMIT 10
    ),
    bq AS (
      SELECT vec_id AS qid, cast(embedding AS array<double>) AS qv
      FROM embeddings WHERE vec_id IN (0, 7, 21)
    ),
    scored AS (
      SELECT bq.qid, e.vec_id, round((aggregate(zip_with(e.v, bq.qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / (sqrt(aggregate(e.v, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(bq.qv, 0D, (acc, x) -> acc + x * x)))), 4) AS cosine
      FROM e CROSS JOIN bq
    ),
    batch AS (
      SELECT concat('batch:', CAST(qid AS STRING)) AS tag, vec_id, cosine
      FROM (
        SELECT qid, vec_id, cosine,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= 10
    )
    SELECT tag, vec_id, cosine FROM single
    UNION ALL
    SELECT tag, vec_id, cosine FROM batch
"""

SPARK_SQL_TWINS["q_knn_lsh"] = """
    WITH q AS (
      SELECT cast(embedding AS array<double>) AS qv, (CASE WHEN embedding[0] >= 0 THEN 1 ELSE 0 END + CASE WHEN embedding[1] >= 0 THEN 2 ELSE 0 END + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END + CASE WHEN embedding[3] >= 0 THEN 8 ELSE 0 END) AS b
      FROM embeddings WHERE vec_id = 0
    ),
    c AS (
      SELECT vec_id, cast(embedding AS array<double>) AS v, (CASE WHEN embedding[0] >= 0 THEN 1 ELSE 0 END + CASE WHEN embedding[1] >= 0 THEN 2 ELSE 0 END + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END + CASE WHEN embedding[3] >= 0 THEN 8 ELSE 0 END) AS b
      FROM embeddings WHERE vec_id <> 0
    )
    SELECT c.vec_id, round((aggregate(zip_with(c.v, q.qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / (sqrt(aggregate(c.v, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(q.qv, 0D, (acc, x) -> acc + x * x)))), 4) AS cosine
    FROM c JOIN q ON c.b = q.b
    ORDER BY cosine DESC, vec_id
    LIMIT 10
"""

#: q_knn_ivf (hash-graded since r14): the oracle re-trains the
#: mod-init rounded-centroid quantizer as unrolled CTEs; this twin is
#: the same unroll in Spark dialect — unnest-with-ordinality becomes
#: posexplode (0-based positions, a consistent sort key either way),
#: `list(m ORDER BY pos)` becomes array_sort(collect_list(struct)) +
#: transform (no ordered collect in Spark SQL), list_reduce becomes
#: the same sequential-fold aggregate the DataFrame plan uses, and
#: QUALIFY becomes ranked subqueries.
SPARK_SQL_TWINS["q_knn_ivf"] = """
    WITH e AS (
      SELECT vec_id, cast(embedding AS array<double>) AS v
      FROM embeddings WHERE vec_id <> 0
    ),
    q AS (SELECT cast(embedding AS array<double>) AS qv FROM embeddings WHERE vec_id = 0),
    a0 AS (SELECT vec_id, v, cast(vec_id % 8 AS BIGINT) AS c FROM e),
    x1 AS (SELECT c, posexplode(v) AS (pos, val) FROM a0),
    m1 AS (SELECT c, pos, round(avg(val), 6) AS m FROM x1 GROUP BY c, pos),
    cent1 AS (
      SELECT c, transform(array_sort(collect_list(struct(pos, m))), s -> s.m) AS cen
      FROM m1 GROUP BY c
    ),
    s1 AS (
      SELECT a0.vec_id, a0.v, cent1.c,
             aggregate(zip_with(a0.v, cent1.cen, (a, b) -> (a - b) * (a - b)),
                       0D, (acc, x) -> acc + x) AS d2
      FROM a0 CROSS JOIN cent1
    ),
    a1 AS (
      SELECT vec_id, v, c FROM (
        SELECT vec_id, v, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        FROM s1
      ) WHERE rn = 1
    ),
    x2 AS (SELECT c, posexplode(v) AS (pos, val) FROM a1),
    m2 AS (SELECT c, pos, round(avg(val), 6) AS m FROM x2 GROUP BY c, pos),
    cent2 AS (
      SELECT c, transform(array_sort(collect_list(struct(pos, m))), s -> s.m) AS cen
      FROM m2 GROUP BY c
    ),
    s2 AS (
      SELECT e.vec_id, e.v, cent2.c,
             aggregate(zip_with(e.v, cent2.cen, (a, b) -> (a - b) * (a - b)),
                       0D, (acc, x) -> acc + x) AS d2
      FROM e CROSS JOIN cent2
    ),
    af AS (
      SELECT vec_id, v, c FROM (
        SELECT vec_id, v, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        FROM s2
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT c FROM (
        SELECT cent2.c,
               aggregate(zip_with(cent2.cen, q.qv, (a, b) -> (a - b) * (a - b)),
                         0D, (acc, x) -> acc + x) AS d2
        FROM cent2 CROSS JOIN q
      ) ORDER BY d2, c LIMIT 2
    )
    SELECT af.vec_id,
           round((aggregate(zip_with(af.v, q.qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / (sqrt(aggregate(af.v, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(q.qv, 0D, (acc, x) -> acc + x * x)))), 4) AS cosine
    FROM af CROSS JOIN q
    WHERE af.c IN (SELECT c FROM probe)
    ORDER BY cosine DESC, af.vec_id
    LIMIT 10
"""

#: q_approx_sketches (hash-graded since r14): the DuckDB oracle emits
#: literal TRUEs for the bounded verdicts (it cannot replay HLL++/KLL
#: register state); this twin runs the REAL sketches through Spark SQL
#: and computes the same verdicts, so all three surfaces agree exactly
#: when — and only when — the estimates sit inside their bounds.
SPARK_SQL_TWINS["q_approx_sketches"] = """
    SELECT cd_cust,
           round(ep50, 2) AS p50,
           round(ep95, 2) AS p95,
           abs(acd - cd_cust) / cd_cust <= 0.06 AS acd_within_3rsd,
           abs(ap50 - ep50) / ep50 <= 0.01 AS ap50_within_1pct,
           abs(ap95 - ep95) / ep95 <= 0.01 AS ap95_within_1pct
    FROM (
      SELECT approx_count_distinct(o_custkey, 0.02) AS acd,
             percentile_approx(o_totalprice, 0.5, 10000) AS ap50,
             percentile_approx(o_totalprice, 0.95, 10000) AS ap95,
             count(DISTINCT o_custkey) AS cd_cust,
             percentile(o_totalprice, 0.5) AS ep50,
             percentile(o_totalprice, 0.95) AS ep95
      FROM orders
    )
"""

SPARK_SQL_TWINS["q_minhash_dedup"] = """
    WITH full_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, concat(text, ' qq ww ee') FROM documents
      WHERE doc_id % 20 = 0
),
    tok AS (
      SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM full_docs
    ),
    dsh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, explode(transform(sequence(1, greatest(size(t) - 2, 1)), i -> array_join(slice(t, i, 3), ' '))) AS s FROM tok
      )
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
"""

SPARK_SQL_TWINS["q_ngram_jaccard"] = """
    WITH full_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, concat(text, ' qq ww ee') FROM documents
      WHERE doc_id % 20 = 0
),
    tok AS (
      SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM full_docs
    ),
    dsh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, explode(transform(sequence(1, greatest(size(t) - 2, 1)), i -> array_join(slice(t, i, 3), ' '))) AS s FROM tok
      )
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
"""

SPARK_SQL_TWINS["q_dedup_exact"] = """
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
                 '\\\\p{Punct}', ' '), '\\\\s+', ' '))
             ) AS n_copies_norm
      FROM full_docs
    )
    SELECT doc_id, batch, n_copies, n_copies_norm FROM rk WHERE rn = 1
"""

SPARK_SQL_TWINS["q_decontaminate"] = """
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT 999999,
             concat(array_join(slice(split(trim(text), '\\\\s+'), 1, 13), ' '),
               ' zzq unrelated filler tail words keeping whole document jaccard far below any threshold for sure'),
             'en'
      FROM documents WHERE doc_id = 0
    ),
    bench AS (
      SELECT text FROM documents WHERE doc_id % 50 = 0
    ),
    tok AS (
      SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM corpus
    ),
    dsh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, explode(transform(sequence(1, greatest(size(t) - 2, 1)), i -> array_join(slice(t, i, 3), ' '))) AS s FROM tok
      )
    ),
    dsz AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    btok AS (
      SELECT text, split(trim(text), '\\\\s+') AS t FROM bench
    ),
    bsh AS (
      SELECT DISTINCT text, s FROM (
        SELECT text, explode(transform(sequence(1, greatest(size(t) - 2, 1)), i -> array_join(slice(t, i, 3), ' '))) AS s FROM btok
      )
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
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, explode(transform(sequence(1, size(t) - 12),
               i -> array_join(slice(t, i, 13), ' '))) AS g
        FROM tok WHERE size(t) >= 13
      )
    ),
    b13 AS (
      SELECT DISTINCT g FROM (
        SELECT explode(transform(sequence(1, size(t) - 12),
               i -> array_join(slice(t, i, 13), ' '))) AS g
        FROM btok WHERE size(t) >= 13
      )
    ),
    leak13 AS (
      SELECT DISTINCT d.doc_id FROM d13 d JOIN b13 b ON d.g = b.g
    )
    SELECT doc_id, lang FROM corpus
    WHERE doc_id NOT IN (SELECT doc_id FROM leaked)
      AND doc_id NOT IN (SELECT doc_id FROM leak13)
"""

SPARK_SQL_TWINS["q_simhash_dedup"] = """
    WITH full_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, concat(text, ' qq ww ee') FROM documents
      WHERE doc_id % 20 = 0
),
    tok AS (
      SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM full_docs
    ),
    sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, explode(transform(sequence(1, greatest(size(t) - 1, 1)), i -> array_join(slice(t, i, 2), ' '))) AS s FROM tok
      )
    ),
    hh AS (
      SELECT doc_id,
             cast(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) AS hi,
             cast(conv(substring(md5(s), 9, 8), 16, 10) AS BIGINT) AS lo
      FROM sh
    ),
    bits AS (
      SELECT doc_id,
             sum(CASE WHEN (shiftright(lo, 0) & 1) = 1 THEN 1 ELSE -1 END) AS b0,
             sum(CASE WHEN (shiftright(lo, 1) & 1) = 1 THEN 1 ELSE -1 END) AS b1,
             sum(CASE WHEN (shiftright(lo, 2) & 1) = 1 THEN 1 ELSE -1 END) AS b2,
             sum(CASE WHEN (shiftright(lo, 3) & 1) = 1 THEN 1 ELSE -1 END) AS b3,
             sum(CASE WHEN (shiftright(lo, 4) & 1) = 1 THEN 1 ELSE -1 END) AS b4,
             sum(CASE WHEN (shiftright(lo, 5) & 1) = 1 THEN 1 ELSE -1 END) AS b5,
             sum(CASE WHEN (shiftright(lo, 6) & 1) = 1 THEN 1 ELSE -1 END) AS b6,
             sum(CASE WHEN (shiftright(lo, 7) & 1) = 1 THEN 1 ELSE -1 END) AS b7,
             sum(CASE WHEN (shiftright(lo, 8) & 1) = 1 THEN 1 ELSE -1 END) AS b8,
             sum(CASE WHEN (shiftright(lo, 9) & 1) = 1 THEN 1 ELSE -1 END) AS b9,
             sum(CASE WHEN (shiftright(lo, 10) & 1) = 1 THEN 1 ELSE -1 END) AS b10,
             sum(CASE WHEN (shiftright(lo, 11) & 1) = 1 THEN 1 ELSE -1 END) AS b11,
             sum(CASE WHEN (shiftright(lo, 12) & 1) = 1 THEN 1 ELSE -1 END) AS b12,
             sum(CASE WHEN (shiftright(lo, 13) & 1) = 1 THEN 1 ELSE -1 END) AS b13,
             sum(CASE WHEN (shiftright(lo, 14) & 1) = 1 THEN 1 ELSE -1 END) AS b14,
             sum(CASE WHEN (shiftright(lo, 15) & 1) = 1 THEN 1 ELSE -1 END) AS b15,
             sum(CASE WHEN (shiftright(lo, 16) & 1) = 1 THEN 1 ELSE -1 END) AS b16,
             sum(CASE WHEN (shiftright(lo, 17) & 1) = 1 THEN 1 ELSE -1 END) AS b17,
             sum(CASE WHEN (shiftright(lo, 18) & 1) = 1 THEN 1 ELSE -1 END) AS b18,
             sum(CASE WHEN (shiftright(lo, 19) & 1) = 1 THEN 1 ELSE -1 END) AS b19,
             sum(CASE WHEN (shiftright(lo, 20) & 1) = 1 THEN 1 ELSE -1 END) AS b20,
             sum(CASE WHEN (shiftright(lo, 21) & 1) = 1 THEN 1 ELSE -1 END) AS b21,
             sum(CASE WHEN (shiftright(lo, 22) & 1) = 1 THEN 1 ELSE -1 END) AS b22,
             sum(CASE WHEN (shiftright(lo, 23) & 1) = 1 THEN 1 ELSE -1 END) AS b23,
             sum(CASE WHEN (shiftright(lo, 24) & 1) = 1 THEN 1 ELSE -1 END) AS b24,
             sum(CASE WHEN (shiftright(lo, 25) & 1) = 1 THEN 1 ELSE -1 END) AS b25,
             sum(CASE WHEN (shiftright(lo, 26) & 1) = 1 THEN 1 ELSE -1 END) AS b26,
             sum(CASE WHEN (shiftright(lo, 27) & 1) = 1 THEN 1 ELSE -1 END) AS b27,
             sum(CASE WHEN (shiftright(lo, 28) & 1) = 1 THEN 1 ELSE -1 END) AS b28,
             sum(CASE WHEN (shiftright(lo, 29) & 1) = 1 THEN 1 ELSE -1 END) AS b29,
             sum(CASE WHEN (shiftright(lo, 30) & 1) = 1 THEN 1 ELSE -1 END) AS b30,
             sum(CASE WHEN (shiftright(lo, 31) & 1) = 1 THEN 1 ELSE -1 END) AS b31,
             sum(CASE WHEN (shiftright(hi, 0) & 1) = 1 THEN 1 ELSE -1 END) AS b32,
             sum(CASE WHEN (shiftright(hi, 1) & 1) = 1 THEN 1 ELSE -1 END) AS b33,
             sum(CASE WHEN (shiftright(hi, 2) & 1) = 1 THEN 1 ELSE -1 END) AS b34,
             sum(CASE WHEN (shiftright(hi, 3) & 1) = 1 THEN 1 ELSE -1 END) AS b35,
             sum(CASE WHEN (shiftright(hi, 4) & 1) = 1 THEN 1 ELSE -1 END) AS b36,
             sum(CASE WHEN (shiftright(hi, 5) & 1) = 1 THEN 1 ELSE -1 END) AS b37,
             sum(CASE WHEN (shiftright(hi, 6) & 1) = 1 THEN 1 ELSE -1 END) AS b38,
             sum(CASE WHEN (shiftright(hi, 7) & 1) = 1 THEN 1 ELSE -1 END) AS b39,
             sum(CASE WHEN (shiftright(hi, 8) & 1) = 1 THEN 1 ELSE -1 END) AS b40,
             sum(CASE WHEN (shiftright(hi, 9) & 1) = 1 THEN 1 ELSE -1 END) AS b41,
             sum(CASE WHEN (shiftright(hi, 10) & 1) = 1 THEN 1 ELSE -1 END) AS b42,
             sum(CASE WHEN (shiftright(hi, 11) & 1) = 1 THEN 1 ELSE -1 END) AS b43,
             sum(CASE WHEN (shiftright(hi, 12) & 1) = 1 THEN 1 ELSE -1 END) AS b44,
             sum(CASE WHEN (shiftright(hi, 13) & 1) = 1 THEN 1 ELSE -1 END) AS b45,
             sum(CASE WHEN (shiftright(hi, 14) & 1) = 1 THEN 1 ELSE -1 END) AS b46,
             sum(CASE WHEN (shiftright(hi, 15) & 1) = 1 THEN 1 ELSE -1 END) AS b47,
             sum(CASE WHEN (shiftright(hi, 16) & 1) = 1 THEN 1 ELSE -1 END) AS b48,
             sum(CASE WHEN (shiftright(hi, 17) & 1) = 1 THEN 1 ELSE -1 END) AS b49,
             sum(CASE WHEN (shiftright(hi, 18) & 1) = 1 THEN 1 ELSE -1 END) AS b50,
             sum(CASE WHEN (shiftright(hi, 19) & 1) = 1 THEN 1 ELSE -1 END) AS b51,
             sum(CASE WHEN (shiftright(hi, 20) & 1) = 1 THEN 1 ELSE -1 END) AS b52,
             sum(CASE WHEN (shiftright(hi, 21) & 1) = 1 THEN 1 ELSE -1 END) AS b53,
             sum(CASE WHEN (shiftright(hi, 22) & 1) = 1 THEN 1 ELSE -1 END) AS b54,
             sum(CASE WHEN (shiftright(hi, 23) & 1) = 1 THEN 1 ELSE -1 END) AS b55,
             sum(CASE WHEN (shiftright(hi, 24) & 1) = 1 THEN 1 ELSE -1 END) AS b56,
             sum(CASE WHEN (shiftright(hi, 25) & 1) = 1 THEN 1 ELSE -1 END) AS b57,
             sum(CASE WHEN (shiftright(hi, 26) & 1) = 1 THEN 1 ELSE -1 END) AS b58,
             sum(CASE WHEN (shiftright(hi, 27) & 1) = 1 THEN 1 ELSE -1 END) AS b59,
             sum(CASE WHEN (shiftright(hi, 28) & 1) = 1 THEN 1 ELSE -1 END) AS b60,
             sum(CASE WHEN (shiftright(hi, 29) & 1) = 1 THEN 1 ELSE -1 END) AS b61,
             sum(CASE WHEN (shiftright(hi, 30) & 1) = 1 THEN 1 ELSE -1 END) AS b62,
             sum(CASE WHEN (shiftright(hi, 31) & 1) = 1 THEN 1 ELSE -1 END) AS b63
      FROM hh GROUP BY doc_id
    ),
    sims AS (
      SELECT doc_id, (CASE WHEN b0 > 0 THEN shiftleft(cast(1 AS BIGINT), 0) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b1 > 0 THEN shiftleft(cast(1 AS BIGINT), 1) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b2 > 0 THEN shiftleft(cast(1 AS BIGINT), 2) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b3 > 0 THEN shiftleft(cast(1 AS BIGINT), 3) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b4 > 0 THEN shiftleft(cast(1 AS BIGINT), 4) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b5 > 0 THEN shiftleft(cast(1 AS BIGINT), 5) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b6 > 0 THEN shiftleft(cast(1 AS BIGINT), 6) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b7 > 0 THEN shiftleft(cast(1 AS BIGINT), 7) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b8 > 0 THEN shiftleft(cast(1 AS BIGINT), 8) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b9 > 0 THEN shiftleft(cast(1 AS BIGINT), 9) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b10 > 0 THEN shiftleft(cast(1 AS BIGINT), 10) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b11 > 0 THEN shiftleft(cast(1 AS BIGINT), 11) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b12 > 0 THEN shiftleft(cast(1 AS BIGINT), 12) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b13 > 0 THEN shiftleft(cast(1 AS BIGINT), 13) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b14 > 0 THEN shiftleft(cast(1 AS BIGINT), 14) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b15 > 0 THEN shiftleft(cast(1 AS BIGINT), 15) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b16 > 0 THEN shiftleft(cast(1 AS BIGINT), 16) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b17 > 0 THEN shiftleft(cast(1 AS BIGINT), 17) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b18 > 0 THEN shiftleft(cast(1 AS BIGINT), 18) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b19 > 0 THEN shiftleft(cast(1 AS BIGINT), 19) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b20 > 0 THEN shiftleft(cast(1 AS BIGINT), 20) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b21 > 0 THEN shiftleft(cast(1 AS BIGINT), 21) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b22 > 0 THEN shiftleft(cast(1 AS BIGINT), 22) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b23 > 0 THEN shiftleft(cast(1 AS BIGINT), 23) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b24 > 0 THEN shiftleft(cast(1 AS BIGINT), 24) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b25 > 0 THEN shiftleft(cast(1 AS BIGINT), 25) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b26 > 0 THEN shiftleft(cast(1 AS BIGINT), 26) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b27 > 0 THEN shiftleft(cast(1 AS BIGINT), 27) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b28 > 0 THEN shiftleft(cast(1 AS BIGINT), 28) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b29 > 0 THEN shiftleft(cast(1 AS BIGINT), 29) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b30 > 0 THEN shiftleft(cast(1 AS BIGINT), 30) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b31 > 0 THEN shiftleft(cast(1 AS BIGINT), 31) ELSE cast(0 AS BIGINT) END) AS sim_lo, (CASE WHEN b32 > 0 THEN shiftleft(cast(1 AS BIGINT), 0) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b33 > 0 THEN shiftleft(cast(1 AS BIGINT), 1) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b34 > 0 THEN shiftleft(cast(1 AS BIGINT), 2) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b35 > 0 THEN shiftleft(cast(1 AS BIGINT), 3) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b36 > 0 THEN shiftleft(cast(1 AS BIGINT), 4) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b37 > 0 THEN shiftleft(cast(1 AS BIGINT), 5) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b38 > 0 THEN shiftleft(cast(1 AS BIGINT), 6) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b39 > 0 THEN shiftleft(cast(1 AS BIGINT), 7) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b40 > 0 THEN shiftleft(cast(1 AS BIGINT), 8) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b41 > 0 THEN shiftleft(cast(1 AS BIGINT), 9) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b42 > 0 THEN shiftleft(cast(1 AS BIGINT), 10) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b43 > 0 THEN shiftleft(cast(1 AS BIGINT), 11) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b44 > 0 THEN shiftleft(cast(1 AS BIGINT), 12) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b45 > 0 THEN shiftleft(cast(1 AS BIGINT), 13) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b46 > 0 THEN shiftleft(cast(1 AS BIGINT), 14) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b47 > 0 THEN shiftleft(cast(1 AS BIGINT), 15) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b48 > 0 THEN shiftleft(cast(1 AS BIGINT), 16) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b49 > 0 THEN shiftleft(cast(1 AS BIGINT), 17) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b50 > 0 THEN shiftleft(cast(1 AS BIGINT), 18) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b51 > 0 THEN shiftleft(cast(1 AS BIGINT), 19) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b52 > 0 THEN shiftleft(cast(1 AS BIGINT), 20) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b53 > 0 THEN shiftleft(cast(1 AS BIGINT), 21) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b54 > 0 THEN shiftleft(cast(1 AS BIGINT), 22) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b55 > 0 THEN shiftleft(cast(1 AS BIGINT), 23) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b56 > 0 THEN shiftleft(cast(1 AS BIGINT), 24) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b57 > 0 THEN shiftleft(cast(1 AS BIGINT), 25) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b58 > 0 THEN shiftleft(cast(1 AS BIGINT), 26) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b59 > 0 THEN shiftleft(cast(1 AS BIGINT), 27) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b60 > 0 THEN shiftleft(cast(1 AS BIGINT), 28) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b61 > 0 THEN shiftleft(cast(1 AS BIGINT), 29) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b62 > 0 THEN shiftleft(cast(1 AS BIGINT), 30) ELSE cast(0 AS BIGINT) END) + (CASE WHEN b63 > 0 THEN shiftleft(cast(1 AS BIGINT), 31) ELSE cast(0 AS BIGINT) END) AS sim_hi FROM bits
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(a.sim_lo ^ b.sim_lo)
              + bit_count(a.sim_hi ^ b.sim_hi) AS INT) AS hamming
    FROM sims a JOIN sims b ON b.doc_id > a.doc_id
    WHERE bit_count(a.sim_lo ^ b.sim_lo)
        + bit_count(a.sim_hi ^ b.sim_hi) <= 6
"""

SPARK_SQL_TWINS["q_pagerank"] = """
    WITH e0 AS (
      SELECT DISTINCT concat('u:', CAST(user_id AS STRING)) AS src,
             concat('t:', event_type) AS dst
      FROM events
    ),
    deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src),
    e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg ON deg.src = e0.src),
    verts AS (SELECT src AS id FROM e0 UNION SELECT dst FROM e0),
    nn AS (SELECT count(*) AS n FROM verts),
    pr0 AS (SELECT id, 1000000000000 div (SELECT n FROM nn) AS r FROM verts),
    c1 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr0 p ON p.id = e.src GROUP BY e.dst
    ),
    pr1 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c1 c ON c.id = v.id
    ),
    c2 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr1 p ON p.id = e.src GROUP BY e.dst
    ),
    pr2 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c2 c ON c.id = v.id
    ),
    c3 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr2 p ON p.id = e.src GROUP BY e.dst
    ),
    pr3 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c3 c ON c.id = v.id
    ),
    c4 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr3 p ON p.id = e.src GROUP BY e.dst
    ),
    pr4 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c4 c ON c.id = v.id
    ),
    c5 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr4 p ON p.id = e.src GROUP BY e.dst
    ),
    pr5 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c5 c ON c.id = v.id
    ),
    c6 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr5 p ON p.id = e.src GROUP BY e.dst
    ),
    pr6 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c6 c ON c.id = v.id
    ),
    c7 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr6 p ON p.id = e.src GROUP BY e.dst
    ),
    pr7 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c7 c ON c.id = v.id
    ),
    c8 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr7 p ON p.id = e.src GROUP BY e.dst
    ),
    pr8 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c8 c ON c.id = v.id
    ),
    c9 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr8 p ON p.id = e.src GROUP BY e.dst
    ),
    pr9 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c9 c ON c.id = v.id
    ),
    c10 AS (
      SELECT e.dst AS id, sum(p.r div e.deg) AS s
      FROM e JOIN pr9 p ON p.id = e.src GROUP BY e.dst
    ),
    pr10 AS (
      SELECT v.id,
             (15 * 1000000000000) div (100 * (SELECT n FROM nn))
             + (85 * coalesce(c.s, 0)) div 100 AS r
      FROM verts v LEFT JOIN c10 c ON c.id = v.id
    )
    SELECT id, CAST(r AS DOUBLE) / 1000000000000.0 AS rank
    FROM pr10
"""

SPARK_SQL_TWINS["q_event_windows"] = """
    SELECT 'tumbling' AS kind,
           date_format(timestamp_seconds((unix_timestamp(ts) div 600) * 600),
                       'yyyy-MM-dd HH:mm:ss') AS k1,
           event_type AS k2, count(*) AS n
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS kind,
           date_format(timestamp_seconds(
                 (unix_timestamp(ts) div 300) * 300 - off),
               'yyyy-MM-dd HH:mm:ss') AS k1,
           event_type AS k2, count(*) AS n
    FROM events
    CROSS JOIN (SELECT explode(array(0, 300)) AS off) offs
    GROUP BY 2, 3
    UNION ALL
    SELECT 'session' AS kind, k1, k2, n FROM (
      WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN unix_timestamp(ts)
                         - lag(unix_timestamp(ts))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
      ),
      s AS (
        SELECT user_id, event_id,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM g
      )
      SELECT CAST(user_id AS STRING) AS k1,
             CAST(session_id AS STRING) AS k2, count(*) AS n
      FROM s GROUP BY user_id, session_id
    )
    UNION ALL
    SELECT 'funnel' AS kind, k1, k2, n FROM (
      WITH s1 AS (
        SELECT user_id, min(unix_micros(ts)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY 1
      ),
      s2 AS (
        SELECT s1.user_id, min(unix_micros(e.ts)) AS t2, min(t1) AS t1
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND unix_micros(e.ts) > s1.t1
        GROUP BY 1
      ),
      s3 AS (
        SELECT s2.user_id, min(unix_micros(e.ts)) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND unix_micros(e.ts) > s2.t2
        GROUP BY 1
      )
      SELECT '1' AS k1, 'view' AS k2, (SELECT count(*) FROM s1) AS n
      UNION ALL
      SELECT '2', 'click', (SELECT count(*) FROM s2)
      UNION ALL
      SELECT '3', 'purchase', (SELECT count(*) FROM s3)
    )
    UNION ALL
    SELECT 'retention' AS kind,
           date_format(c, 'yyyy-MM-dd HH:mm:ss') AS k1,
           CAST(CAST((unix_timestamp(p) - unix_timestamp(c)) / 604800 AS BIGINT)
                AS STRING) AS k2,
           count(DISTINCT user_id) AS n
    FROM (
      WITH act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
      ),
      firsts AS (SELECT user_id, min(p) AS c FROM act GROUP BY 1)
      SELECT act.user_id, act.p, firsts.c
      FROM act JOIN firsts ON firsts.user_id = act.user_id
    )
    GROUP BY 1, 2, 3
"""

SPARK_SQL_TWINS["q_token_count"] = """
    WITH t AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 5 = 0 THEN concat(text, ' standard license header text common to many documents here')
                  ELSE text END AS ptext
      FROM documents
    ),
    tok AS (
      SELECT doc_id, split(trim(ptext), '\\\\s+') AS tk FROM t
    ),
    dsh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, explode(transform(sequence(1, size(tk) - 7),
               i -> array_join(slice(tk, i, 8), ' '))) AS s
        FROM tok WHERE size(tk) >= 8
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    rep AS (SELECT s FROM dsh GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
    hits AS (
      SELECT doc_id, count(*) AS h FROM dsh JOIN rep ON rep.s = dsh.s GROUP BY doc_id
    ),
    psh AS (
      SELECT doc_id, u.pos AS pos, u.s AS s FROM (
        SELECT doc_id,
               explode(transform(sequence(1, size(tk) - 7),
                      i -> named_struct('pos', i,
                             's', array_join(slice(tk, i, 8), ' '))))
                   AS u
        FROM tok WHERE size(tk) >= 8
      )
    ),
    cov AS (
      SELECT DISTINCT psh.doc_id, pos + o AS cp
      FROM psh JOIN rep ON rep.s = psh.s
      CROSS JOIN (SELECT explode(array(0, 1, 2, 3, 4, 5, 6, 7)) AS o) offs
    ),
    ncov AS (SELECT doc_id, count(*) AS c FROM cov GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(size(split(trim(t.text), '\\\\s+')) AS INT) AS n_tokens,
           CAST(size(regexp_extract_all(t.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))
                AS INT) AS n_pieces,
           md5(t.text) AS fp,
           CASE WHEN sizes.n IS NULL THEN 0.0
                ELSE round(CAST(coalesce(hits.h, 0) AS DOUBLE) / sizes.n, 4)
           END AS boilerplate_frac,
           CAST(size(tok.tk) - coalesce(ncov.c, 0) AS INT) AS n_tokens_excised
    FROM t
    JOIN tok ON tok.doc_id = t.doc_id
    LEFT JOIN sizes ON sizes.doc_id = t.doc_id
    LEFT JOIN hits ON hits.doc_id = t.doc_id
    LEFT JOIN ncov ON ncov.doc_id = t.doc_id
"""

SPARK_SQL_TWINS["q_entity_profile"] = """
    WITH e AS (
      SELECT DISTINCT concat('u:', user_id) AS src, concat('t:', event_type) AS dst
      FROM events
    ),
    o AS (SELECT src AS id, count(*) AS out_degree FROM e GROUP BY src),
    i AS (SELECT dst AS id, count(*) AS in_degree  FROM e GROUP BY dst),
    d AS (
      SELECT coalesce(o.id, i.id) AS id,
             coalesce(out_degree, 0) AS out_degree,
             coalesce(in_degree, 0) AS in_degree,
             coalesce(out_degree, 0) + coalesce(in_degree, 0) AS degree
      FROM o FULL OUTER JOIN i ON o.id = i.id
    ),
    l AS (
      SELECT concat('u:', user_id) AS id,
             array_join(sort_array(collect_set(event_type)), ',') AS labels
      FROM events
      GROUP BY user_id
    )
    SELECT d.id, l.labels, d.out_degree, d.in_degree, d.degree
    FROM d LEFT JOIN l ON d.id = l.id
"""



SPARK_SQL_TWINS["q_cosine_sim"] = """
    WITH e AS (
      SELECT vec_id, label, cast(embedding AS array<double>) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, label,
             concat(array(cast(embedding[0] AS DOUBLE) + 0.05D),
                    slice(cast(embedding AS array<double>), 2, size(embedding) - 1))
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    b AS (
      SELECT *,
             (CASE WHEN v[0] >= 0 THEN 1 ELSE 0 END
              + CASE WHEN v[1] >= 0 THEN 2 ELSE 0 END
              + CASE WHEN v[2] >= 0 THEN 4 ELSE 0 END
              + CASE WHEN v[3] >= 0 THEN 8 ELSE 0 END) AS bkt
      FROM e
    ),
    p AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             round((aggregate(zip_with(a.v, c.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / (sqrt(aggregate(a.v, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(c.v, 0D, (acc, x) -> acc + x * x)))), 4) AS cosine
      FROM b a JOIN b c
        ON a.label = c.label AND a.bkt = c.bkt AND a.vec_id < c.vec_id
      WHERE round((aggregate(zip_with(a.v, c.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / (sqrt(aggregate(a.v, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(c.v, 0D, (acc, x) -> acc + x * x)))), 4) >= 0.95
    ),
    symx AS (
      SELECT id_a AS src, id_b AS dst FROM p
      UNION
      SELECT id_b, id_a FROM p
      UNION
      SELECT id_a, id_a FROM p
      UNION
      SELECT id_b, id_b FROM p
    ),
    r0 AS (
      SELECT DISTINCT src AS a, src AS m FROM symx
    ),
    r1 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r0 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r2 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r1 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r3 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r2 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r4 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r3 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r5 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r4 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r6 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r5 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r7 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r6 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r8 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r7 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r9 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r8 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r10 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r9 p ON p.a = s.dst
      GROUP BY s.src
    )
    SELECT p.id_a, p.id_b, p.cosine, comp.family
    FROM p JOIN (SELECT a AS vid, m AS family FROM r10) comp
      ON comp.vid = p.id_a
"""

SPARK_SQL_TWINS["q_resolve_entities"] = """
    WITH names AS (
      SELECT DISTINCT p_name AS n FROM part
      UNION
      SELECT DISTINCT concat(substring(p_name, 1, 3), 'z', substring(p_name, 5))
      FROM part
    ),
    blocked AS (
      SELECT n,
             concat(substring(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(lower(n), 'á', 'a'), 'à', 'a'), 'â', 'a'), 'ä', 'a'), 'ã', 'a'), 'å', 'a'), 'é', 'e'), 'è', 'e'), 'ê', 'e'), 'ë', 'e'), 'í', 'i'), 'ì', 'i'), 'î', 'i'), 'ï', 'i'), 'ó', 'o'), 'ò', 'o'), 'ô', 'o'), 'ö', 'o'), 'õ', 'o'), 'ú', 'u'), 'ù', 'u'), 'û', 'u'), 'ü', 'u'), 'ç', 'c'), 'ñ', 'n'), 'ÿ', 'y'), 'ý', 'y'), 1, 2), '|',
                    CAST(length(n) div 8 AS STRING)) AS blk
      FROM names
    ),
    pe AS (
      SELECT a.n AS src, b.n AS dst
      FROM blocked a JOIN blocked b ON b.blk = a.blk AND a.n < b.n
      WHERE levenshtein(lower(a.n), lower(b.n)) <= 2
    ),
    symx AS (
      SELECT src, dst FROM pe
      UNION
      SELECT dst AS src, src AS dst FROM pe
      UNION
      SELECT n AS src, n AS dst FROM names
    ),
    r0 AS (
      SELECT n AS a, n AS m FROM names
    ),
    r1 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r0 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r2 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r1 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r3 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r2 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r4 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r3 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r5 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r4 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r6 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r5 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r7 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r6 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r8 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r7 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r9 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r8 p ON p.a = s.dst
      GROUP BY s.src
    ),
    r10 AS (
      SELECT s.src AS a, min(p.m) AS m
      FROM symx s JOIN r9 p ON p.a = s.dst
      GROUP BY s.src
    )
    SELECT a AS name, m AS canonical FROM r10
"""

def spark_sql_queries() -> dict[str, str]:
    """Name → Spark SQL string for every SQL-surface-covered query:
    portable oracle strings verbatim + the dialect twins above."""
    from big_data___knowledge_graph_construction_with_llm_spark.plans.registry import ORACLE

    out = {name: ORACLE[name] for name in SPARK_PORTABLE_ORACLES}
    out.update(SPARK_SQL_TWINS)
    return out
