"""Named query plans over the driver's synthetic tables.

``registry.QUERIES`` maps query name → ``fn(spark, sf_dir) -> DataFrame``;
``registry.ORACLE`` maps the same name → the equivalent DuckDB SQL. Query
modules register themselves on import.
"""

from big_data___knowledge_graph_construction_with_llm_spark.plans import (  # noqa: F401
    graph_queries,
    pipeline_queries,
    relational_queries,
    scalar_queries,
    sources_queries,
    textdata_queries,
)
from big_data___knowledge_graph_construction_with_llm_spark.plans.registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
