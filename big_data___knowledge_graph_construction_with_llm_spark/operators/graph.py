"""Property-graph construction & analytics over the triplet edge table.

The reference materializes its graph into Neo4j (`MERGE` upserts,
``Art-Knowledge-Graph-AWS/GRAPH/graph_builder.py:27-54``;
``Art-Knowledge-Graph-Local/Graph/graph_builder.py:41-93``). The engine
keeps the graph Spark-side as two DataFrames — ``vertices(id, labels)``
and ``edges(src, dst, relationship)`` (GraphFrames convention) — so graph
analytics stay distributed; Neo4j becomes an optional sink
(``sources/neo4j_sink.py`` shape, not required by the harness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edges_from_triplets(triplets: DataFrame) -> DataFrame:
    """Edge list from the 5-column typed-triplet contract.

    Mirrors the Neo4j edge MERGE (``…AWS/GRAPH/graph_builder.py:40-41``)
    relationally: distinct (src, dst, relationship).
    """
    return (
        triplets.select(
            F.col("subject").alias("src"),
            F.col("object").alias("dst"),
            F.col("relation").alias("relationship"),
        )
        .distinct()
    )


def vertices_from_triplets(triplets: DataFrame) -> DataFrame:
    """Vertex set = subjects ∪ objects with their entity types.

    Mirrors node MERGE keyed on ``name``
    (``…AWS/GRAPH/graph_builder.py:37-38``). One shuffle (the distinct).
    """
    subj = triplets.select(
        F.col("subject").alias("id"), F.col("subject_type").alias("label")
    )
    obj = triplets.select(
        F.col("object").alias("id"), F.col("object_type").alias("label")
    )
    return subj.unionByName(obj).distinct()


def labels_per_entity(vertices: DataFrame) -> DataFrame:
    """One node, all labels seen — relational twin of APOC ``addLabels``
    accumulation (``…AWS/GRAPH/graph_builder.py:43-44``). Output labels are
    a sorted comma-joined string for deterministic comparison."""
    return vertices.groupBy("id").agg(
        F.array_join(F.sort_array(F.collect_set("label")), ",").alias("labels")
    )


def degrees(edges: DataFrame) -> DataFrame:
    """In/out/total degree per vertex; two partial-aggregated counts and a
    full-outer merge — no row explosion."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "id", "full_outer")
        .na.fill(0, ["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def two_hop(edges: DataFrame) -> DataFrame:
    """2-hop edge composition: a→b→c. Self-equi-join on the intermediate
    vertex — Catalyst picks SMJ/BHJ; at 100 TB, pre-bucket the edge table
    on both src and dst so the self-join is co-located."""
    a = edges.alias("a")
    b = edges.alias("b")
    return (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .select(
            F.col("a.src").alias("src"),
            F.col("a.dst").alias("mid"),
            F.col("b.dst").alias("dst"),
        )
    )
