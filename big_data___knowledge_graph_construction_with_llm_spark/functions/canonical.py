"""Canonical-relation mapping as a broadcast lookup table.

The reference canonicalizes relation names by injecting a variant→canonical
dictionary into an LLM prompt (``CANONICAL_RELATIONS``,
``Art-Knowledge-Graph-AWS/LLM/chains.py:37-104``, injected at ``:145-158``)
and asking the model to rewrite. The engine's deterministic equivalent is a
small dimension table broadcast-joined against the (arbitrarily large)
triplet table, with the prompt's fallback rule — lowercase, underscores →
spaces (``chains.py:152-160``) — as the non-match branch.

The mapping below is this engine's own vocabulary (kept intentionally
small; domain packs can extend it at runtime via ``extra``): the point is
the *operator shape* — map-side lookup join, zero shuffle on the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.functions.normalize import relation_fallback

# variant (already lowercased, de-underscored) -> canonical relation
CANONICAL_RELATIONS: dict[str, str] = {
    "painted by": "created by",
    "painted": "created",
    "authored by": "created by",
    "made by": "created by",
    "sculpted by": "created by",
    "drawn by": "created by",
    "created in": "dated",
    "dated to": "dated",
    "made in year": "dated",
    "located at": "located in",
    "found in": "located in",
    "housed in": "located in",
    "kept in": "located in",
    "born on": "born in",
    "birth year": "born in",
    "died on": "died in",
    "death year": "died in",
    "same as": "same as",
    "is related to": "related to",
    "relates to": "related to",
    "depicts subject": "depicts",
    "shows": "depicts",
    "portrays": "depicts",
    "member of": "part of",
    "belongs to": "part of",
    "nationality of": "has nationality",
    "is nationality": "has nationality",
}


def canonical_map_df(
    spark: SparkSession, extra: dict[str, str] | None = None
) -> DataFrame:
    """The variant→canonical mapping as a 2-column DataFrame
    ``(variant, canonical)`` suitable for ``F.broadcast``."""
    mapping = dict(CANONICAL_RELATIONS)
    if extra:
        mapping.update(extra)
    # Build the table from a map LITERAL (explode on the JVM) instead of
    # spark.createDataFrame(local_rows): the latter routes through the
    # pickled-RDD path and pays a Python-worker spin-up (~1.5s first use)
    # for a 46-row dimension table.
    pairs = F.create_map(
        *[F.lit(x) for kv in sorted(mapping.items()) for x in kv]
    )
    return (
        spark.range(1)
        .select(F.explode(pairs).alias("variant", "canonical"))
        .select("variant", "canonical")
    )


def canonicalize_relations(
    triplets: DataFrame,
    mapping: DataFrame,
    relation_col: str = "relation",
) -> DataFrame:
    """Broadcast lookup join: big triplet table ⋈ small mapping.

    Non-matching relations fall back to the cleaned form (lowercase,
    underscores → spaces). The big side never shuffles — ``mapping`` is
    broadcast, which is the only sane plan at 100 TB.
    """
    cleaned = relation_fallback(F.col(relation_col))
    out = (
        triplets.withColumn("_cleaned_rel", cleaned)
        .join(
            F.broadcast(mapping),
            F.col("_cleaned_rel") == F.col("variant"),
            "left",
        )
        .withColumn(
            relation_col, F.coalesce(F.col("canonical"), F.col("_cleaned_rel"))
        )
        .drop("variant", "canonical", "_cleaned_rel")
    )
    return out


def lookup_expr(col: Column | str, mapping: dict[str, str]) -> Column:
    """Small-dictionary lookup as a literal map expression (constant-folded
    by Catalyst) — the zero-join alternative when the mapping is tiny."""
    c = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for k, v in sorted(mapping.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    m = F.create_map(*pairs)
    cleaned = relation_fallback(c)
    return F.coalesce(m[cleaned], cleaned)
