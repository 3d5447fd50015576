"""Tolerant JSON reader for non-strict files (trailing commas).

The reference's bundled ``data/COLLEZIONI_PALAZZO_MADAMA.json`` is a
multi-line JSON array with trailing commas; pandas/ujson accept it
(``Art-Knowledge-Graph-Local/ingestion/data_ingestion_batch.py:19``) but
Spark's native reader yields ``_corrupt_record`` (verified on 4.1.2,
SURVEY.md §1.3). Strategy: read as whole-file text, repair with regex
expressions, split into objects, ``from_json`` each — everything after the
file read is a Catalyst expression pipeline, so repairs run distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.functions.json_repair import repair_json


def read_json_tolerant(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Read a (possibly non-strict) JSON array-of-objects file.

    ``schema`` is the per-object DDL, e.g. ``"Inventario string, Autore string"``.
    One row per object. Files are the unit of parallelism (wholetext), the
    per-object parsing is distributed.
    """
    # NB: must be the reader kwarg — .option("wholetext", ...) is silently
    # ignored by the text source (verified on Spark 4.1.2)
    raw = spark.read.text(path, wholetext=True)
    # strict-first (mirrors functions.json_repair.tolerant_parse): repair
    # regexes would corrupt ALREADY-VALID files whose string values
    # contain ',}' / ',]' or key-shaped substrings — only files that fail
    # a strict parse get repaired
    repaired = raw.select(
        F.when(F.try_parse_json(F.col("value")).isNotNull(), F.col("value"))
        .otherwise(repair_json(F.col("value")))
        .alias("value")
    )
    objects = repaired.select(
        F.explode(
            F.from_json(F.col("value"), f"array<struct<{schema}>>")
        ).alias("obj")
    )
    return objects.select("obj.*")
