"""Scalar-function & triplet-contract queries (SURVEY.md §2.2, §2.8).

These exercise the reference-derived normalizers / tolerant-JSON repair /
triplet validity rules on the synthetic tables, with DuckDB twins.

Round 2 note: consolidated so the registry fits the driver's correctness
window — localname+projection-defaults, the two normalizers,
year-extract+time-math, repair+serialize, and the three triple filters
(keep-set, blank-drop, required-key) + distinct-dedup each became one
query exercising every absorbed SURVEY §2 row.
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
    "q_project_norm",
    oracle="""
    SELECT doc_id,
           regexp_extract(
             CASE WHEN lang = 'en'
                  THEN 'http://ex.org/' || source || '#d' || doc_id
                  ELSE 'http://ex.org/' || source || '/d' || doc_id END,
             '([^/#]+)$', 1) AS localname,
           CAST(doc_id AS VARCHAR) AS subject,
           coalesce(nullif(lang, 'zh'), 'Entity') AS subject_type,
           'written_in' AS relation,
           lang AS object,
           'Entity' AS object_type
    FROM documents
    """,
)
def q_project_norm(spark: SparkSession, sf: str) -> DataFrame:
    """URI local-name extraction (``…AWS/ingestion/DataIngestionBatch.py:36,45``,
    both ``#``- and ``/``-terminated URIs) together with the
    '*_type'-defaults projection (``…Local/main.py:61-71``) — SURVEY §2.8
    localname + §2.2 projection-with-defaults rows in one scan."""
    d = load(spark, sf, "documents")
    uri = F.when(
        F.col("lang") == "en",
        F.concat(F.lit("http://ex.org/"), "source", F.lit("#d"), F.col("doc_id").cast("string")),
    ).otherwise(
        F.concat(F.lit("http://ex.org/"), "source", F.lit("/d"), F.col("doc_id").cast("string"))
    )
    return d.select(
        "doc_id",
        uri_localname(uri).alias("localname"),
        F.col("doc_id").cast("string").alias("subject"),
        F.coalesce(F.expr("nullif(lang, 'zh')"), F.lit("Entity")).alias(
            "subject_type"
        ),
        F.lit("written_in").alias("relation"),
        F.col("lang").alias("object"),
        F.lit("Entity").alias("object_type"),
    )


@query(
    "q_normalize",
    oracle="""
    SELECT DISTINCT o_orderpriority,
           list_aggregate(
             list_transform(
               string_split_regex(trim(regexp_replace(o_orderpriority, '[-_\\s]+', ' ', 'g')), ' '),
               w -> upper(w[1]) || lower(w[2:])),
             'string_agg', '') AS label_norm,
           upper(regexp_replace(trim(o_orderpriority), '[-\\s]+', '_', 'g')) AS rel_norm
    FROM orders
    """,
)
def q_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Both reference normalizers in one projection: CamelCase label
    normalizer ('4-NOT SPECIFIED' → '4NotSpecified',
    ``…Local/Graph/graph_builder.py:29-32``) and UPPER_SNAKE relation
    normalizer (``…Local/Graph/graph_builder.py:34-37``)."""
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderpriority",
        norm_label("o_orderpriority").alias("label_norm"),
        norm_relation("o_orderpriority").alias("rel_norm"),
    ).distinct()


@query(
    "q_time_math",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           strftime(ts, '%Y-%m-%d %H:00:00') AS hour_bucket,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS day_no,
           regexp_extract('dated ' || strftime(ts, '%Y') || ' ca.',
                          '(\\d{4})', 1) AS year
    FROM events
    """,
)
def q_time_math(spark: SparkSession, sf: str) -> DataFrame:
    """Timestamp formatting / epoch math
    (reference analogs: ``…Local/main.py:16``, ``…AWS/monitor.py:21,28,36,44``)
    plus year extraction from free-form date strings — the deterministic
    version of the reference's prompt date rules
    (``…AWS/LLM/chains.py:133-135``)."""
    ev = load(spark, sf, "events")
    freeform = F.concat(F.lit("dated "), F.date_format("ts", "yyyy"), F.lit(" ca."))
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format("ts", "yyyy-MM-dd HH:00:00").alias("hour_bucket"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "day_no"
        ),
        year_extract(freeform).alias("year"),
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
                '$.k') AS INT) AS k_scraped,
           to_json(struct_pack(
               event_id := event_id,
               k := coalesce(CAST(json_extract_string(
                    regexp_replace(regexp_replace(props, '\\}$', ',}'),
                                   ',\\s*\\}', '}', 'g'),
                    '$.k') AS INT), -1))) AS js
    FROM events
    """,
)
def q_json_repair(spark: SparkSession, sf: str) -> DataFrame:
    """Tolerant-JSON repair + object scrape + re-serialization
    (``extract_json``, ``…AWS/LLM/pipeline.py:6-33``; trailing-comma repair
    per SURVEY §1.3; ``json.dumps(record)``,
    ``…AWS/LLM/main-llm-triplets-extraction.py:17``): corrupt each props
    object deterministically, recover ``k`` via (a) the repair expression
    and (b) the prose scrape, then serialize the repaired record back to
    JSON — the full parse→fix→emit round trip in one scan."""
    ev = load(spark, sf, "events")
    corrupted = F.regexp_replace(F.col("props"), r"\}$", ",}")
    prose = F.concat(F.lit("LLM says: "), F.col("props"), F.lit(" -- end"))
    k_rep = F.get_json_object(repair_json(corrupted), "$.k").cast("int")
    return ev.select(
        "event_id",
        k_rep.alias("k_repaired"),
        F.get_json_object(scrape_first_object(prose), "$.k").cast("int").alias("k_scraped"),
        # coalesce inside the struct: Spark's to_json drops null fields
        # while DuckDB emits "k":null — pin one representation
        F.to_json(
            F.struct(F.col("event_id"), F.coalesce(k_rep, F.lit(-1)).alias("k"))
        ).alias("js"),
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
    "q_rdf_filter_keepset",
    oracle="""
    SELECT DISTINCT 'u:' || user_id AS subject,
           event_type AS predicate,
           json_extract_string(props, '$.k') AS object
    FROM events
    WHERE event_type IN ('click', 'purchase', 'view')
      AND trim('u:' || user_id) <> ''
      AND trim(json_extract_string(props, '$.k')) <> ''
      AND ('u:' || user_id) IS NOT NULL
      AND event_type IS NOT NULL
      AND json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def q_rdf_filter_keepset(spark: SparkSession, sf: str) -> DataFrame:
    """The RDF reader's relational core — keep-set membership + blank-drop
    + distinct-dedup (``…AWS/ingestion/DataIngestionBatch.py:26,49-52,60``)
    composed with the required-key validity filter (``…Local/main.py:70``)
    — on a triple table derived from events. Covers the SURVEY §2.2
    keep-set, blank-label and required-key rows plus the §2.4
    distinct-on-subset dedup row in one plan (validity is also proven
    end-to-end inside ``q_pipeline_e2e``'s ``validate_triplets``)."""
    ev = load(spark, sf, "events")
    triples = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("subject"),
        F.col("event_type").alias("predicate"),
        F.get_json_object("props", "$.k").alias("object"),
    )
    kept = keepset_filter(
        triples, keep=frozenset({"click", "purchase", "view"})
    )
    # required-key validity on top of the keep-set (nulls already blank-
    # dropped above; stated explicitly so the contract survives refactors)
    return kept.filter(
        F.col("subject").isNotNull()
        & F.col("predicate").isNotNull()
        & F.col("object").isNotNull()
    )


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
