"""End-to-end pipeline query: the reference's whole flow as ONE plan —
records → JSON serialization → (mock) triplet extraction in mapInPandas →
validity filter + type defaults — hash-checked against a DuckDB oracle
that states the expected triplet set directly.

This is the parity proof for the pipeline composition itself
(``…Local/main.py:23-79``), not just its stages: the Arrow boundary, the
JSON contract, the required-key filter and the ``Entity`` defaults all
have to line up for the hashes to match.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.pipeline import extract_triplets, validate_triplets
from big_data___knowledge_graph_construction_with_llm_spark.plans.registry import query
from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import load


@query(
    "q_pipeline_e2e",
    oracle=r"""
    SELECT CAST(doc_id AS VARCHAR) AS subject,
           'Record' AS subject_type,
           'has_lang' AS relation,
           lang AS object,
           'Entity' AS object_type
    FROM documents WHERE lang IS NOT NULL AND lang <> ''
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), 'Record', 'has_n_tokens',
           CAST(len(string_split_regex(trim(text), '\s+')) AS VARCHAR),
           'Entity'
    FROM documents
    """,
)
def q_pipeline_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """records → extract (mapInPandas, mock LLM) → validate+defaults.

    The extractor is defined inline so cloudpickle ships it by value —
    executors need pandas only, mirroring how a real deployment ships its
    LLM-call closure."""
    d = load(spark, sf, "documents")
    records = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )

    def extractor(record_json: str) -> list[dict]:
        # deterministic LLM stand-in: one triplet per non-empty field
        try:
            rec = json.loads(record_json)
        except (TypeError, ValueError):
            return []
        rid = str(rec.get("doc_id", "record"))
        out = []
        for k in sorted(rec):
            v = rec[k]
            if k == "doc_id" or v in (None, ""):
                continue
            out.append(
                {
                    "subject": rid,
                    "subject_type": "Record",
                    "relation": f"has_{k}",
                    "object": str(v),
                    "object_type": None,
                }
            )
        return out

    raw = extract_triplets(records, extractor)
    return validate_triplets(raw)
