"""CSV/TSV/JSON/parquet readers with the reference's all-string contract.

The reference coerces every ingested column to string
(``Art-Knowledge-Graph-Local/ingestion/data_ingestion_batch.py:16,19``;
``Art-Knowledge-Graph-AWS/ingestion/DataIngestionBatch.py:102``) and
infers headers/schema per source
(``…AWS/ingestion/DataIngestionBatch.py:74,81,88``). These readers keep
that contract but leave type inference available via ``all_string=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stringify(df: DataFrame) -> DataFrame:
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])


def read_csv(
    spark: SparkSession, path: str, sep: str = ",", all_string: bool = True
) -> DataFrame:
    """Header-inferred CSV scan (``…AWS/ingestion/DataIngestionBatch.py:73-77``)."""
    df = (
        spark.read.option("header", "true")
        .option("sep", sep)
        .option("inferSchema", str(not all_string).lower())
        .csv(path)
    )
    return _stringify(df) if all_string else df


def read_tsv(spark: SparkSession, path: str, all_string: bool = True) -> DataFrame:
    """Tab-separated scan (``…AWS/ingestion/DataIngestionBatch.py:80-84``)."""
    return read_csv(spark, path, sep="\t", all_string=all_string)


def read_json(
    spark: SparkSession, path: str, multi_line: bool = True
) -> DataFrame:
    """Strict JSON scan (``…AWS/ingestion/DataIngestionBatch.py:87-91``).
    For non-strict files (trailing commas) use
    ``tolerant_json.read_json_tolerant``."""
    return spark.read.option("multiLine", str(multi_line).lower()).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (built-in columnar alternative to parquet; same pushdown
    and pruning properties — `PushedFilters` shows in the plan)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (overwrite)."""
    df.write.mode("overwrite").orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file source — the multimodal ingestion path: one row per
    file with ``(path, modificationTime, length, content binary)``. Feed
    ``content`` to ``operators.multimodal`` (``attach_binary_meta`` /
    ``decode_images``). At 100 TB, set
    ``spark.sql.files.maxPartitionBytes`` so a partition holds a sane
    number of media files, and avoid tiny-file explosions upstream."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def filter_by_file_suffix(
    df: DataFrame, suffixes: str | list[str], exclude_substr: str | None = None
) -> DataFrame:
    """Keep only rows read from files whose path ends with one of
    ``suffixes`` (optionally also dropping paths containing
    ``exclude_substr``) — the reference's S3-listing predicate
    ``key.endswith(".json") or key.endswith(".jsonl") and "part-" not in
    key`` (``…AWS/GRAPH/main_neo4j_loader.py:50``) pushed into the scan
    via ``input_file_name()``, so one multi-file read replaces the
    driver-side listing loop."""
    if isinstance(suffixes, str):
        suffixes = [suffixes]
    fname = F.input_file_name()
    cond = fname.endswith(suffixes[0])
    for s in suffixes[1:]:
        cond = cond | fname.endswith(s)
    if exclude_substr is not None:
        cond = cond & ~fname.contains(exclude_substr)
    return df.filter(cond)


def write_partitioned_json(df: DataFrame, path: str, fmt: str) -> None:
    """Append-mode JSON sink, one subdir per source format
    (``…AWS/ingestion/DataIngestionBatch.py:76,83,90,103``)."""
    df.write.mode("append").json(f"{path.rstrip('/')}/{fmt}")


def write_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line — declarative version of the reference's
    ``rdd.map(json.dumps).saveAsTextFile``
    (``…AWS/LLM/main-llm-triplets-extraction.py:68-69``)."""
    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize a table bucketed (and optionally sorted) on its join
    keys — the at-rest layout that makes big⋈big joins co-located: two
    tables bucketed on the same keys with the same bucket count
    sort-merge-join with ZERO Exchange (asserted in
    ``tests/test_bucketing.py``). At 100 TB this is the single biggest
    lever for the fact⋈fact joins (lineitem⋈orders, edge-table
    self-joins); pick ``n_buckets`` ≈ cluster cores × small multiple."""
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols is None:
        sort_cols = bucket_cols
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode("overwrite").saveAsTable(table)
