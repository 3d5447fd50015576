"""Fixed contract schemas at stage boundaries (SURVEY.md §1).

The reference pins two row contracts: the 4-column RDF triple
(``Art-Knowledge-Graph-AWS/ingestion/DataIngestionBatch.py:53-58``) and the
5-column typed triplet defined by the LLM prompt example
(``Art-Knowledge-Graph-AWS/LLM/chains.py:117-120``) with defaults applied at
``Art-Knowledge-Graph-Local/main.py:61-71``. Both are all-string; ``lang`` is
nullable. The metrics record mirrors ``Art-Knowledge-Graph-AWS/monitor.py:32-41``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

#: One RDF triple extracted from RDF/XML, labels resolved.
TRIPLE_SCHEMA = StructType(
    [
        StructField("subject", StringType(), nullable=False),
        StructField("predicate", StringType(), nullable=False),
        StructField("object", StringType(), nullable=False),
        StructField("lang", StringType(), nullable=True),
    ]
)

#: The engine's central edge-list contract (typed triplet).
TRIPLET_SCHEMA = StructType(
    [
        StructField("subject", StringType(), nullable=False),
        StructField("subject_type", StringType(), nullable=False),
        StructField("relation", StringType(), nullable=False),
        StructField("object", StringType(), nullable=False),
        StructField("object_type", StringType(), nullable=False),
    ]
)

#: Default entity type applied when the extractor omits *_type
#: (Art-Knowledge-Graph-Local/main.py:64,67).
DEFAULT_ENTITY_TYPE = "Entity"

#: Per-job metrics record (Art-Knowledge-Graph-AWS/monitor.py:32-41).
METRICS_SCHEMA = StructType(
    [
        StructField("job", StringType(), nullable=False),
        StructField("start_time", DoubleType(), nullable=False),
        StructField("end_time", DoubleType(), nullable=False),
        StructField("elapsed_seconds", DoubleType(), nullable=False),
        StructField("cpu_before_percent", DoubleType(), nullable=True),
        StructField("cpu_after_percent", DoubleType(), nullable=True),
        StructField("memory_before_percent", DoubleType(), nullable=True),
        StructField("memory_after_percent", DoubleType(), nullable=True),
    ]
)

#: Embedding row for similarity search (driver table `embeddings`).
EMBEDDING_SCHEMA = StructType(
    [
        StructField("vec_id", StringType(), nullable=False),
        StructField("embedding", ArrayType(FloatType()), nullable=False),
    ]
)
