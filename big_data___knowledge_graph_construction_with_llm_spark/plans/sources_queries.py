"""Source-format queries runnable on the synthetic tables.

The file-based sources (CSV/TSV/tolerant-JSON/XML/RDF readers in
``sources/``) are exercised by unit tests on fixture files; here the
format *semantics* run on driver tables so the DuckDB oracle can check
them: XML rows are constructed from ``nation`` and parsed back with
Spark 4's native ``from_xml`` — the oracle sees the original columns, so
parity proves the roundtrip is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.plans.registry import query
from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import load


@query(
    "q_xml_records",
    oracle="""
    SELECT n_nationkey AS id, n_name AS name, r_name AS region
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_xml_records(spark: SparkSession, sf: str) -> DataFrame:
    """XML record scan semantics (``load_xml`` row-tag records,
    ``…Local/ingestion/data_ingestion_batch.py:91-106``): build
    ``<record>`` XML per row, parse with native ``from_xml``, project the
    parsed fields. Oracle = the pre-XML values, so the roundtrip must be
    exact."""
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    xml = joined.select(
        F.concat(
            F.lit("<record><id>"),
            F.col("n_nationkey").cast("string"),
            F.lit("</id><name>"),
            F.col("n_name"),
            F.lit("</name><region>"),
            F.col("r_name"),
            F.lit("</region></record>"),
        ).alias("xml")
    )
    parsed = xml.select(
        F.from_xml("xml", "id INT, name STRING, region STRING").alias("rec")
    )
    return parsed.select(
        F.col("rec.id").alias("id"),
        F.col("rec.name").alias("name"),
        F.col("rec.region").alias("region"),
    )
