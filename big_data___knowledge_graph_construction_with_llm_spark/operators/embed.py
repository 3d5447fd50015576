"""Document embedding generation (EXT surface): the encoder seam that
closes the text → embedding → ANN loop in-engine.

The reference computes no embeddings (its semantic step is LLM prompts,
``…AWS/LLM/chains.py``); a training-data pipeline needs them for
semantic dedup and similarity search over corpora that arrive WITHOUT a
pre-computed ``embeddings`` table. The model call is pluggable exactly
like ``pipeline.extract_triplets``'s LLM extractor: an Arrow-batched
``mapInPandas`` stage whose encoder is an injected callable — a real
model client (sentence-transformers, an HTTP embedding endpoint) in
production, the deterministic :func:`hash_encoder` here and in tests
(no model library ships in this container). The Spark-side plumbing —
schema, batching, partition fan-out — is identical either way, so
swapping the encoder never changes the plan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# encoder contract: list[str] -> float32 ndarray of shape (len(texts), dim)
Encoder = Callable[[list[str]], np.ndarray]


def hash_encoder(dim: int = 64) -> Encoder:
    """Deterministic feature-hashing encoder — the contract double AND a
    real (if crude) bag-of-words embedding: each lowercased token hashes
    to one of ``dim`` buckets with a ±1 sign bit, token counts
    accumulate, and the vector is L2-normalized. Similar token
    multisets → similar vectors, so ANN/near-dup operators behave
    meaningfully on its output; identical text → identical vector on
    every run, engine, and partitioning (the hash is Python's stable
    md5, not the salted builtin ``hash``).
    """
    import hashlib

    def _encode(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            for tok in (t or "").lower().split():
                h = int.from_bytes(
                    hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
                )
                sign = 1.0 if (h >> 63) & 1 else -1.0
                out[i, h % dim] += sign
            n = float(np.linalg.norm(out[i]))
            if n > 0:
                out[i] /= n
        return out

    return _encode


def embed_documents(
    df: DataFrame,
    text_col: str,
    encoder: Encoder | None = None,
    dim: int = 64,
    out_col: str = "embedding",
    fanout_partitions: int | None = None,
) -> DataFrame:
    """Append an ``array<float>`` embedding of ``text_col`` to every row.

    Arrow-batched ``mapInPandas`` (never per-row Python): each batch
    makes ONE encoder call with the whole batch's texts — exactly how a
    GPU/HTTP encoder wants its input — and ``fanout_partitions``
    controls the external-call fan-out, like the LLM extraction stage.
    All input columns pass through unchanged; only the text strings and
    the resulting vectors cross the Arrow boundary.

    Scale shape: embedding is a pure map stage (no shuffle); write the
    result once and build the ANN index (``ensure_ivf_index``) from the
    stored table rather than re-encoding per query. ``encoder`` output
    is validated per batch — shape ``(n, dim)`` — so a misconfigured
    model dimension fails loudly at the first batch, not at index time.
    """
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    if out_col in df.columns:
        raise ValueError(
            f"out_col {out_col!r} already exists — drop it first (re-encoding "
            "after a model change should rewrite the table, not stack columns)"
        )
    enc = encoder if encoder is not None else hash_encoder(dim)
    payload = df if fanout_partitions is None else df.repartition(fanout_partitions)
    # a fresh StructType — StructType.add MUTATES the receiver, and
    # payload.schema is the DataFrame's own cached schema object
    out_schema = StructType(
        list(payload.schema.fields) + [StructField(out_col, ArrayType(FloatType()))]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            vecs = np.asarray(enc(texts), dtype=np.float32)
            if vecs.shape != (len(texts), dim):
                raise ValueError(
                    f"encoder returned shape {vecs.shape}, expected "
                    f"({len(texts)}, {dim}) — check the model's output dim"
                )
            pdf = pdf.copy()
            pdf[out_col] = [v for v in vecs]
            yield pdf

    return payload.mapInPandas(_run, schema=out_schema)
