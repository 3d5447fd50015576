"""Scalar-function & triplet-contract queries (SURVEY.md §2.2, §2.8).

These exercise the reference-derived normalizers / tolerant-JSON repair /
triplet validity rules on the synthetic tables, with DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.functions.canonical import (
    canonical_map_df,
    canonicalize_relations,
)
from big_data___knowledge_graph_construction_with_llm_spark.functions.json_repair import (
    repair_json,
    scrape_first_object,
)
from big_data___knowledge_graph_construction_with_llm_spark.functions.normalize import (
    norm_label,
    norm_relation,
    uri_localname,
    year_extract,
)
from big_data___knowledge_graph_construction_with_llm_spark.plans.registry import query
from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import load
from big_data___knowledge_graph_construction_with_llm_spark.sources.rdf import keepset_filter


@query(
    "q_uri_localname",
    oracle="""
    SELECT doc_id,
           regexp_extract(
             CASE WHEN lang = 'en'
                  THEN 'http://ex.org/' || source || '#d' || doc_id
                  ELSE 'http://ex.org/' || source || '/d' || doc_id END,
             '([^/#]+)$', 1) AS localname
    FROM documents
    """,
)
def q_uri_localname(spark: SparkSession, sf: str) -> DataFrame:
    """URI local-name extraction (``…AWS/ingestion/DataIngestionBatch.py:36,45``)
    over both ``#``- and ``/``-terminated URIs."""
    d = load(spark, sf, "documents")
    uri = F.when(
        F.col("lang") == "en",
        F.concat(F.lit("http://ex.org/"), "source", F.lit("#d"), F.col("doc_id").cast("string")),
    ).otherwise(
        F.concat(F.lit("http://ex.org/"), "source", F.lit("/d"), F.col("doc_id").cast("string"))
    )
    return d.select("doc_id", uri_localname(uri).alias("localname"))


@query(
    "q_norm_label",
    oracle="""
    SELECT DISTINCT o_orderpriority,
           list_aggregate(
             list_transform(
               string_split_regex(trim(regexp_replace(o_orderpriority, '[-_\\s]+', ' ', 'g')), ' '),
               w -> upper(w[1]) || lower(w[2:])),
             'string_agg', '') AS label_norm
    FROM orders
    """,
)
def q_norm_label(spark: SparkSession, sf: str) -> DataFrame:
    """CamelCase label normalizer
    (``…Local/Graph/graph_builder.py:29-32``) on order priorities
    ('4-NOT SPECIFIED' → '4NotSpecified')."""
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderpriority", norm_label("o_orderpriority").alias("label_norm")
    ).distinct()


@query(
    "q_norm_relation",
    oracle="""
    SELECT DISTINCT o_orderpriority,
           upper(regexp_replace(trim(o_orderpriority), '[-\\s]+', '_', 'g')) AS rel_norm
    FROM orders
    """,
)
def q_norm_relation(spark: SparkSession, sf: str) -> DataFrame:
    """UPPER_SNAKE relation normalizer (``…Local/Graph/graph_builder.py:34-37``)."""
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderpriority", norm_relation("o_orderpriority").alias("rel_norm")
    ).distinct()


@query(
    "q_year_extract",
    oracle="""
    SELECT regexp_extract('dated ' || strftime(o_orderdate, '%Y') || ' ca.',
                          '(\\d{4})', 1) AS year,
           count(*) AS n
    FROM orders
    GROUP BY 1
    """,
)
def q_year_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Year extraction from free-form date strings — the deterministic
    version of the reference's prompt date rules
    (``…AWS/LLM/chains.py:133-135``)."""
    o = load(spark, sf, "orders")
    freeform = F.concat(F.lit("dated "), F.date_format("o_orderdate", "yyyy"), F.lit(" ca."))
    return o.select(year_extract(freeform).alias("year")).groupBy("year").agg(
        F.count("*").alias("n")
    )


@query(
    "q_time_math",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           strftime(ts, '%Y-%m-%d %H:00:00') AS hour_bucket,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS day_no
    FROM events
    """,
)
def q_time_math(spark: SparkSession, sf: str) -> DataFrame:
    """Timestamp formatting / epoch math
    (reference analogs: ``…Local/main.py:16``, ``…AWS/monitor.py:21,28,36,44``)."""
    ev = load(spark, sf, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format("ts", "yyyy-MM-dd HH:00:00").alias("hour_bucket"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "day_no"
        ),
    )


@query(
    "q_to_json",
    oracle="""
    SELECT doc_id,
           to_json(struct_pack(doc_id := doc_id, lang := lang, source := source))
               AS js
    FROM documents
    """,
)
def q_to_json(spark: SparkSession, sf: str) -> DataFrame:
    """Per-record JSON serialization — declarative ``json.dumps(record)``
    (``…AWS/LLM/main-llm-triplets-extraction.py:17``)."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "source")).alias("js"),
    )


@query(
    "q_json_repair",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(
                regexp_replace(regexp_replace(props, '\\}$', ',}'),
                               ',\\s*\\}', '}', 'g'),
                '$.k') AS INT) AS k_repaired,
           CAST(json_extract_string(
                regexp_extract('LLM says: ' || props || ' -- end',
                               '(\\{[^{}]*\\})', 1),
                '$.k') AS INT) AS k_scraped
    FROM events
    """,
)
def q_json_repair(spark: SparkSession, sf: str) -> DataFrame:
    """Tolerant-JSON repair + object scrape
    (``extract_json``, ``…AWS/LLM/pipeline.py:6-33``; trailing-comma repair
    per SURVEY §1.3): corrupt each props object deterministically, then
    recover ``k`` via (a) the repair expression and (b) the prose scrape."""
    ev = load(spark, sf, "events")
    corrupted = F.regexp_replace(F.col("props"), r"\}$", ",}")
    prose = F.concat(F.lit("LLM says: "), F.col("props"), F.lit(" -- end"))
    return ev.select(
        "event_id",
        F.get_json_object(repair_json(corrupted), "$.k").cast("int").alias("k_repaired"),
        F.get_json_object(scrape_first_object(prose), "$.k").cast("int").alias("k_scraped"),
    )


@query(
    "q_props_map",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_props_map(spark: SparkSession, sf: str) -> DataFrame:
    """Map-typed property access (`events.props` → map<string,string>)."""
    ev = load(spark, sf, "events")
    k = F.element_at(F.from_json("props", "map<string,string>"), "k").cast("int")
    return (
        ev.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(F.round(F.avg("_k"), 4).alias("avg_k"), F.count("*").alias("n"))
    )


# --- triplet contract queries -------------------------------------------------

@query(
    "q_valid_triplets",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS subject,
           nullif(event_type, 'error') AS relation,
           json_extract_string(props, '$.k') AS object
    FROM events
    WHERE CAST(user_id AS VARCHAR) IS NOT NULL
      AND nullif(event_type, 'error') IS NOT NULL
      AND json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def q_valid_triplets(spark: SparkSession, sf: str) -> DataFrame:
    """Required-key validity filter (``…Local/main.py:70``) on triplets
    derived from events (error rows get NULL relation → dropped)."""
    ev = load(spark, sf, "events")
    t = ev.select(
        F.col("user_id").cast("string").alias("subject"),
        F.expr("nullif(event_type, 'error')").alias("relation"),
        F.get_json_object("props", "$.k").alias("object"),
    )
    return t.filter(
        F.col("subject").isNotNull()
        & F.col("relation").isNotNull()
        & F.col("object").isNotNull()
    )


@query(
    "q_project_defaults",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS subject,
           coalesce(nullif(lang, 'zh'), 'Entity') AS subject_type,
           'written_in' AS relation,
           lang AS object,
           'Entity' AS object_type
    FROM documents
    """,
)
def q_project_defaults(spark: SparkSession, sf: str) -> DataFrame:
    """Projection with '*_type' defaults (``…Local/main.py:61-71``)."""
    d = load(spark, sf, "documents")
    return d.select(
        F.col("doc_id").cast("string").alias("subject"),
        F.coalesce(F.expr("nullif(lang, 'zh')"), F.lit("Entity")).alias(
            "subject_type"
        ),
        F.lit("written_in").alias("relation"),
        F.col("lang").alias("object"),
        F.lit("Entity").alias("object_type"),
    )


@query(
    "q_rdf_filter_keepset",
    oracle="""
    SELECT DISTINCT 'u:' || user_id AS subject,
           event_type AS predicate,
           json_extract_string(props, '$.k') AS object
    FROM events
    WHERE event_type IN ('click', 'purchase', 'view')
      AND trim('u:' || user_id) <> ''
      AND trim(json_extract_string(props, '$.k')) <> ''
    """,
)
def q_rdf_filter_keepset(spark: SparkSession, sf: str) -> DataFrame:
    """The RDF reader's relational core — keep-set membership + blank-drop
    + dedup (``…AWS/ingestion/DataIngestionBatch.py:26,49-52,60``) — on a
    triple table derived from events."""
    ev = load(spark, sf, "events")
    triples = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("subject"),
        F.col("event_type").alias("predicate"),
        F.get_json_object("props", "$.k").alias("object"),
    )
    return keepset_filter(
        triples, keep=frozenset({"click", "purchase", "view"})
    )


@query(
    "q_dedup_triples",
    oracle="""
    SELECT DISTINCT 'u:' || user_id AS subject,
           event_type AS predicate,
           CAST(floor(value / 10) AS BIGINT) AS object_bucket
    FROM events
    """,
)
def q_dedup_triples(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-on-subset dedup (``drop_duplicates``,
    ``…AWS/ingestion/DataIngestionBatch.py:60``) with collision-heavy keys."""
    ev = load(spark, sf, "events")
    return ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("subject"),
        F.col("event_type").alias("predicate"),
        F.floor(F.col("value") / 10).cast("long").alias("object_bucket"),
    ).dropDuplicates()


@query(
    "q_canonicalize_relations",
    oracle="""
    WITH m(variant, canonical) AS (
        VALUES ('event click', 'interaction'), ('event view', 'interaction'),
               ('event purchase', 'conversion'), ('event signup', 'acquisition')
    ),
    t AS (
        SELECT lower(replace(trim('EVENT_' || upper(event_type)), '_', ' ')) AS cleaned
        FROM events
    )
    SELECT coalesce(m.canonical, t.cleaned) AS relation, count(*) AS n
    FROM t LEFT JOIN m ON t.cleaned = m.variant
    GROUP BY 1
    """,
)
def q_canonicalize_relations(spark: SparkSession, sf: str) -> DataFrame:
    """Broadcast canonical-relation lookup join — deterministic version of
    the reference's LLM standardization prompt (``…AWS/LLM/chains.py:37-104,145-158``):
    known variants map to canonical names, unknowns fall back to
    lowercase/de-underscore."""
    ev = load(spark, sf, "events")
    raw = ev.select(
        F.concat(F.lit("EVENT_"), F.upper(F.col("event_type"))).alias("relation")
    )
    mapping = canonical_map_df(
        spark,
        extra={
            "event click": "interaction",
            "event view": "interaction",
            "event purchase": "conversion",
            "event signup": "acquisition",
        },
    ).filter(F.col("variant").startswith("event "))
    out = canonicalize_relations(raw, mapping)
    return out.groupBy("relation").agg(F.count("*").alias("n"))
