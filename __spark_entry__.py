"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full named-query registry
(SURVEY.md §2) with DuckDB oracle twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data___knowledge_graph_construction_with_llm_spark.plans import ORACLE, QUERIES

#: Session settings the engine relies on; applied at runtime because the
#: harness may hand us a session built elsewhere. All three are
#: runtime-settable SQLConfs.
_REQUIRED_CONF = {
    # the driver's parquet stores TIMESTAMP(NANOS) — read as int64 and
    # convert in plans/tables.load
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic timestamp semantics vs the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # hash/fingerprint arithmetic needs wrapping int64 semantics
    "spark.sql.ansi.enabled": "false",
}


def _ensure_conf(spark: SparkSession) -> SparkSession:
    for k, v in _REQUIRED_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star join
    lineitem⋈orders⋈customer⋈nation → revenue per nation, descending."""
    from pyspark.sql import functions as F

    _ensure_conf(spark)
    df = QUERIES["q_join_orders_customer"](spark, "/root/testdata/sf0.001")
    return df.orderBy(F.col("revenue").desc(), F.col("n_name"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_ensure_conf(spark), sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLE)
