"""Graph-construction & analytics queries (SURVEY.md §2.3/2.4 graph rows).

The triplet source is derived deterministically from the synthetic star
schema (customer —located in→ nation —part of→ region, user —did→
event_type), then the graph operators run on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators.graph import (
    degrees,
    edges_from_triplets,
    labels_per_entity,
    two_hop,
    vertices_from_triplets,
)
from big_data___knowledge_graph_construction_with_llm_spark.operators.graph_algos import (
    connected_components,
    pagerank,
)
from big_data___knowledge_graph_construction_with_llm_spark.plans.registry import query
from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import load


def _customer_nation_triplets(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("c_name").alias("subject"),
            F.lit("Customer").alias("subject_type"),
            F.lit("located in").alias("relation"),
            F.col("n_name").alias("object"),
            F.lit("Nation").alias("object_type"),
        )
    )


@query(
    "q_graph_edges",
    oracle="""
    SELECT DISTINCT c_name AS src, n_name AS dst, 'located in' AS relationship
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q_graph_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Edge-list construction (relational twin of the Neo4j edge MERGE,
    ``…AWS/GRAPH/graph_builder.py:40-41``)."""
    return edges_from_triplets(_customer_nation_triplets(spark, sf))


@query(
    "q_vertices",
    oracle="""
    SELECT DISTINCT c_name AS id, 'Customer' AS label
    FROM customer
    UNION
    SELECT DISTINCT n_name AS id, 'Nation' AS label
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    """,
)
def q_vertices(spark: SparkSession, sf: str) -> DataFrame:
    """Vertex set = subjects ∪ objects, distinct (node MERGE on name,
    ``…AWS/GRAPH/graph_builder.py:37-38``)."""
    return vertices_from_triplets(_customer_nation_triplets(spark, sf))


@query(
    "q_labels_per_entity",
    oracle="""
    SELECT 'u:' || user_id AS id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS labels
    FROM events
    GROUP BY user_id
    """,
)
def q_labels_per_entity(spark: SparkSession, sf: str) -> DataFrame:
    """All labels seen per node (APOC ``addLabels`` accumulation,
    ``…AWS/GRAPH/graph_builder.py:43-44``)."""
    ev = load(spark, sf, "events")
    verts = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("id"),
        F.col("event_type").alias("label"),
    )
    return labels_per_entity(verts)


@query(
    "q_degree",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 'u:' || user_id AS src, 't:' || event_type AS dst
      FROM events
    ),
    o AS (SELECT src AS id, count(*) AS out_degree FROM e GROUP BY src),
    i AS (SELECT dst AS id, count(*) AS in_degree  FROM e GROUP BY dst)
    SELECT coalesce(o.id, i.id) AS id,
           coalesce(out_degree, 0) AS out_degree,
           coalesce(in_degree, 0) AS in_degree,
           coalesce(out_degree, 0) + coalesce(in_degree, 0) AS degree
    FROM o FULL OUTER JOIN i ON o.id = i.id
    """,
)
def q_degree(spark: SparkSession, sf: str) -> DataFrame:
    """Entity degree (north-star graph analytics; GraphFrames ``degrees``
    shape)."""
    ev = load(spark, sf, "events")
    edges = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    return degrees(edges)


@query(
    "q_two_hop",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 'c:' || o_custkey AS src, 'o:' || o_orderkey AS dst
      FROM orders
      UNION ALL
      SELECT DISTINCT 'o:' || l_orderkey AS src, 'p:' || l_partkey AS dst
      FROM lineitem
    )
    SELECT DISTINCT a.src AS src, a.dst AS mid, b.dst AS dst
    FROM e a JOIN e b ON a.dst = b.src
    """,
)
def q_two_hop(spark: SparkSession, sf: str) -> DataFrame:
    """2-hop composition customer→order→part via self-equi-join on the
    namespaced edge table (``MERGE``-derived self-join surface,
    SURVEY §2.3)."""
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    # o_orderkey is unique ⇒ e1 is already distinct: no dedup shuffle.
    e1 = o.select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias("dst"),
    )
    e2 = li.select(
        F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
    ).distinct()
    edges = e1.unionByName(e2)
    # join output is already row-distinct: e1 has one row per order and e2
    # is deduped, and the namespace prefixes make only c→o ⋈ o→p match —
    # so the oracle's DISTINCT is a no-op we must not pay a shuffle for.
    return two_hop(edges)


@query(
    "q_connected_components",
    oracle="""
    WITH cn AS (
      SELECT c_name, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    comp AS (
      SELECT n_name, least(n_name, min(c_name)) AS comp FROM cn GROUP BY n_name
    )
    SELECT c_name AS id, comp FROM cn JOIN comp USING (n_name)
    UNION ALL
    SELECT n_name AS id, comp FROM comp
    """,
)
def q_connected_components(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components via iterative min-label propagation on the
    bipartite customer—nation graph. Every component is one nation plus
    its customers, so the oracle can state the fixpoint directly:
    comp = least(n_name, min(c_name)) — exact parity proves convergence."""
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    edges = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("c_name").alias("src"), F.col("n_name").alias("dst")
    )
    return connected_components(edges)


@query("q_pagerank")  # iterative float fixpoint — rows-only check
def q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Static PageRank (10 iterations) on the user→event_type bipartite
    graph; ranks rounded for cross-run determinism."""
    ev = load(spark, sf, "events")
    edges = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    pr = pagerank(edges, iterations=10)
    return pr.select("id", F.round("rank", 8).alias("rank"))
