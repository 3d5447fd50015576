"""Hermetic pipeline tests: records → (mock) extraction → validity +
defaults → canonicalization → graph construction (SURVEY.md §5.3).

The mock extractor is the deterministic stand-in for the reference's
Groq LLM stage (``Art-Knowledge-Graph-AWS/LLM/pipeline.py:35-103``);
everything downstream is the engine's own deterministic surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.functions.canonical import (
    canonical_map_df,
    canonicalize_relations,
)
from big_data___knowledge_graph_construction_with_llm_spark.operators.graph import (
    edges_from_triplets,
    vertices_from_triplets,
)
from big_data___knowledge_graph_construction_with_llm_spark.pipeline import (
    extract_triplets,
    mock_extractor,
    validate_triplets,
)


def test_mock_extractor_pure():
    out = mock_extractor('{"id": "r1", "title": "Ritratto", "year": 1490, "empty": ""}')
    assert out == [
        {
            "subject": "r1",
            "subject_type": "Record",
            "relation": "has_title",
            "object": "Ritratto",
            "object_type": None,
        },
        {
            "subject": "r1",
            "subject_type": "Record",
            "relation": "has_year",
            "object": "1490",
            "object_type": None,
        },
    ]
    assert mock_extractor("not json") == []
    assert mock_extractor("[1, 2]") == []


def test_extract_validate_roundtrip(spark):
    records = spark.range(3).select(
        F.col("id").cast("string").alias("id"),
        F.concat(F.lit("title-"), F.col("id")).alias("title"),
    )
    raw = extract_triplets(records, mock_extractor, fanout_partitions=2)
    triplets = validate_triplets(raw)
    rows = sorted((r["subject"], r["relation"], r["object"]) for r in triplets.collect())
    assert rows == [(str(i), "has_title", f"title-{i}") for i in range(3)]
    # defaults applied where the extractor left None
    assert triplets.filter(F.col("object_type") != "Entity").count() == 0
    assert triplets.filter(F.col("subject_type") == "Record").count() == 3


def test_canonicalize_and_graph(spark):
    raw = spark.createDataFrame(
        [
            ("Tiziano", "Person", "Painted_By", "Ritratto", "Artwork"),
            ("Tiziano", "Person", "IS_RELATED_TO", "Venezia", "Place"),
            ("Tiziano", "Person", "unknown_rel", "X", "Entity"),
        ],
        "subject string, subject_type string, relation string, "
        "object string, object_type string",
    )
    mapping = canonical_map_df(
        spark, extra={"painted by": "created", "is related to": "isRelatedTo"}
    )
    out = canonicalize_relations(raw, mapping)
    got = {r["object"]: r["relation"] for r in out.collect()}
    # mapped variants take the canonical name; unknowns take the cleaned form
    assert got["Ritratto"] == "created"
    assert got["Venezia"] == "isRelatedTo"
    assert got["X"] == "unknown rel"

    edges = edges_from_triplets(out)
    assert set(edges.columns) == {"src", "dst", "relationship"}
    assert edges.count() == 3
    verts = vertices_from_triplets(out)
    vrows = {r["id"]: r["label"] for r in verts.collect()}
    assert vrows["Tiziano"] == "Person"
    assert vrows["Ritratto"] == "Artwork"
