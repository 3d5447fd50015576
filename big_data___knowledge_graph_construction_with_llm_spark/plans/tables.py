"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Timestamp quirks are handled centrally so every query sees plain
``TIMESTAMP`` (LTZ) columns, matching how DuckDB reads the same files:

* ``TIMESTAMP(NANOS)`` parquet — Spark's vectorized reader rejects it;
  with ``spark.sql.legacy.parquet.nanosAsLong`` those columns arrive as
  int64 nanoseconds and are converted to micro-precision timestamps
  (``timestamp_micros(ns div 1000)``), exactly how DuckDB truncates
  nanos→micros.
* ``timestamp[us]`` parquet with ``isAdjustedToUTC=false`` — Spark 4
  infers ``TIMESTAMP_NTZ`` (``spark.sql.parquet.inferTimestampNTZ.enabled``
  defaults true), which rejects epoch casts (``cast(ntz as bigint)`` is an
  AnalysisException). Cast to session-zone ``timestamp`` here; with the
  UTC session zone (session.py) the wall-clock instants are identical to
  DuckDB's naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: columns that may arrive as int64 nanos (see module docstring)
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _NANO_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """SQL entry point: register every synthetic table as a temp view
    (normalized through :func:`load`, so timestamp quirks are already
    handled) and any ``spark.sql`` query runs against them — the
    "register tables → spark.sql" surface SURVEY §3 promises. Views are
    lazy: registration reads nothing.
    """
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


#: canonical name for the SQL entry point (register_views kept as the
#: original spelling — same function)
register_tables = register_views


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run an ANSI-SQL query against the engine's tables: with
    ``sf_dir``, registers (or refreshes) the views first; without, the
    caller has already called :func:`register_tables`. Because the views
    are the same normalized frames the DataFrame registry uses, any
    registry oracle_sql string that sticks to ANSI constructs runs here
    verbatim — the two surfaces answer from one data model."""
    if sf_dir is not None:
        register_tables(spark, sf_dir)
    return spark.sql(query)
