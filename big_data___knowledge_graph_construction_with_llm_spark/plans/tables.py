"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

One quirk handled centrally: the parquet files store ``TIMESTAMP(NANOS)``
which Spark's vectorized reader rejects; with
``spark.sql.legacy.parquet.nanosAsLong`` those columns arrive as int64
nanoseconds and are converted here to micro-precision timestamps
(``timestamp_micros(ns div 1000)``), exactly how DuckDB truncates
nanos→micros — so both engines see identical instants.
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
    return df
