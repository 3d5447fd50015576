"""SparkSession factory.

Mirrors the reference's session settings (Arrow interchange on, see
``Art-Knowledge-Graph-AWS/ingestion/main_parsing.py:23-34``) and adds the
scale-oriented defaults the reference lacked: AQE (runtime re-planning,
skew-join splitting), bounded shuffle partitions, and a UTC session
timezone so timestamp semantics are deterministic across engines.

At cluster scale the same builder is used — only ``master`` and the
shuffle-partition count change (shuffle partitions ~= 2-3x total cores;
AQE coalesces the excess at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are read from ``SPARK_GRAFT_CPUS`` when present so the
    driver's bench harness controls parallelism.
    """
    # Make the engine package importable in PYTHON WORKERS regardless
    # of the driver's cwd: functions shipped to executors (mapInPandas
    # closures) reference module helpers BY NAME (cloudpickle), so the
    # worker interpreter must be able to import the package. Local-mode
    # workers inherit the driver env at JVM start — set it BEFORE the
    # context builds. On a real cluster ship the package instead
    # (pip install on the image, or --py-files); see DEPLOYMENT.md.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + py_path if py_path else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Reference's own setting (main_parsing.py:25); mandatory for the
        # Arrow-batched mapInPandas operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Runtime re-planning: partition coalescing, skew-join splitting,
        # dynamic broadcast conversion. Free wins at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamp semantics for the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's parquet uses TIMESTAMP(NANOS) which the Spark reader
        # rejects; read as long and convert in the table loader
        # (plans/tables.py) — DuckDB truncates nanos→micros the same way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Write TIMESTAMP(MICROS) instead of the deprecated INT96:
        # INT96 columns carry NO footer statistics, which would blind
        # the footer-harvested _MANIFEST (operators/layout.py) to every
        # timestamp column; micros also halve the on-disk footprint of
        # a timestamp at 100 TB and are what every other engine reads.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # DuckDB-oracle parity: permissive casts/overflow like the oracle
        # (the engine's own hash arithmetic is mod-p and ANSI-safe either
        # way; see operators/dedup.py).
        .config("spark.sql.ansi.enabled", "false")
        # (r14 A/B note: spark.sql.join.preferSortMergeJoin=false was
        # measured a wash across the join-heavy queries at sf0.1 —
        # 15.97s SMJ vs 16.12s SHJ over 8 queries — so the default
        # stays; revisit on a cluster where the sort dominates.)
        # Smaller files at similar read speed for everything the engine
        # WRITES (indexes, fingerprint stores, table generations) —
        # guide §6. Inputs are whatever the caller hands us.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
