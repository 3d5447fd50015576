"""Synthesize a 10x ("sf1") stress dataset from the sf0.1 testdata.

One-off tooling for the BENCH_SCALE.json scaling study — NOT part of the
driver's timed gate and NOT a replacement for the driver-generated
testdata (which is read-only). Only the tables the six heaviest
pipelines read are scaled: documents, embeddings, customer, nation.

Scaling model: each copy c in 0..9 is a shifted replica whose CONTENT is
made copy-distinct, because a real corpus 10x the size has 10x the
near-duplicate FAMILIES, not 10x-deeper families:

- documents: ids shift by c*DOC_STRIDE (the stride must clear the base
  id range AND copies*stride must stay below the +1e6/+3e6 clone
  offsets the registry queries plant — asserted); for c>0 a copy-marker
  token is inserted after every 5th token, which breaks >60% of 2- and
  3-token shingles, pushing cross-copy Jaccard to ~0.3 (<< the 0.8
  thresholds) and cross-copy simhash far past the hamming radius.
  Within-copy duplicate/near-dup structure is untouched, so dedup work
  scales linearly with rows.
- embeddings: ids shift by c*EMB_STRIDE (same below-1e6 constraint, for
  the q_cosine_sim clone offset); for c>0 dimensions rotate by
  (7*c) % 64 — distinct for every c < 64, which also bounds COPIES —
  preserving norms but decorrelating cross-copy cosines; labels shift
  by c*1000 so the blocking-key DOMAIN grows with the corpus (block
  count xN at constant block size — the realistic shape; keeping the
  label space fixed would grow blocks Nx and the blocked pair space
  N²x, measuring the data model, not the engine).
- customer: keys shift by c*CUST_STRIDE, names get a copy suffix (so
  the bipartite components gain distinct members); nation is copied
  as-is — 25 components, each Nx the size.

All transforms are JVM expressions; generation itself is a distributed
job. Usage:

    python scripts/make_scale_data.py [BASE_SF_DIR] [OUT_DIR] [COPIES]
        [DOC_STRIDE] [EMB_STRIDE] [CUST_STRIDE]

defaults: /root/testdata/sf0.1  <repo>/.scale/sf1  10  100000 100000 1000000
(for a 30x run the default strides would cross the 1e6 clone offsets —
pass e.g. 10000 10000 100000; for a 100x run pass 10000 10000 50000 —
copies >= 64 exceed the embedding-rotation period, so those tiers skip
the embeddings table, which none of the >=30x pipelines read; the
asserts catch a bad stride choice).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from big_data___knowledge_graph_construction_with_llm_spark.session import get_spark  # noqa: E402


def _mark_every_5(text_col, marker: str):
    """Insert ``marker`` after every 5-token chunk (pure JVM)."""
    toks = F.split(F.trim(text_col), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(5)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * 5 + 1, 5), " "),
            F.lit(" " + marker),
        ),
    )
    return F.array_join(chunks, " ")


def scale_documents(d: DataFrame, copies: int, stride: int = 100_000) -> DataFrame:
    out = None
    for c in range(copies):
        part = d.select(
            (F.col("doc_id") + c * stride).alias("doc_id"),
            (
                F.col("text") if c == 0 else _mark_every_5(F.col("text"), f"zq{c}x")
            ).alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text").cast("long"))
        out = part if out is None else out.unionByName(part)
    return out


def scale_embeddings(e: DataFrame, copies: int, stride: int = 100_000) -> DataFrame:
    out = None
    for c in range(copies):
        k = (7 * c) % 64
        emb = (
            F.col("embedding")
            if k == 0
            else F.concat(F.slice("embedding", k + 1, 64 - k), F.slice("embedding", 1, k))
        )
        part = e.select(
            (F.col("vec_id") + c * stride).alias("vec_id"),
            emb.alias("embedding"),
            (F.col("label") + F.lit(c * 1000)).cast("int").alias("label"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def scale_customer(cst: DataFrame, copies: int, stride: int = 1_000_000) -> DataFrame:
    out = None
    for c in range(copies):
        part = cst.select(
            (F.col("c_custkey") + c * stride).alias("c_custkey"),
            (
                F.col("c_name")
                if c == 0
                else F.concat(F.col("c_name"), F.lit(f"_z{c}"))
            ).alias("c_name"),
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
        out = part if out is None else out.unionByName(part)
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".scale", "sf1")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    doc_stride = int(sys.argv[4]) if len(sys.argv) > 4 else 100_000
    emb_stride = int(sys.argv[5]) if len(sys.argv) > 5 else 100_000
    cust_stride = int(sys.argv[6]) if len(sys.argv) > 6 else 1_000_000

    # the dim-rotation trick is distinct only for c < 64; past that the
    # embeddings table is SKIPPED (the >=64x tiers measure the
    # documents/customer pipelines, none of which read embeddings)
    with_embeddings = copies < 64
    if not with_embeddings:
        print(f"copies={copies} >= 64: skipping embeddings (rotation period)")
    # id-scheme invariants: copies never collide with each other or with
    # the +1e6/+3e6/+5e6 clone offsets the registry queries plant
    if copies * doc_stride > 1_000_000 or (
        with_embeddings and copies * emb_stride > 1_000_000
    ):
        raise SystemExit(
            f"copies*stride must stay <= 1e6 (clone offsets): "
            f"docs {copies * doc_stride}, embeddings {copies * emb_stride}"
        )

    spark = get_spark(app_name="make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")

    d = spark.read.parquet(f"{base}/documents.parquet")
    e = spark.read.parquet(f"{base}/embeddings.parquet") if with_embeddings else None
    c = spark.read.parquet(f"{base}/customer.parquet")
    n = spark.read.parquet(f"{base}/nation.parquet")

    checks = [(d, "doc_id", doc_stride), (c, "c_custkey", cust_stride)]
    if with_embeddings:
        checks.append((e, "vec_id", emb_stride))
    for df, col, stride in checks:
        mx = df.agg(F.max(col)).first()[0]
        if mx >= stride:
            raise SystemExit(f"stride {stride} <= max({col}) {mx}: copies would overlap")

    scale_documents(d, copies, doc_stride).repartition(16).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")
    if with_embeddings:
        scale_embeddings(e, copies, emb_stride).repartition(8).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/embeddings.parquet")
    scale_customer(c, copies, cust_stride).repartition(8).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/customer.parquet")
    n.write.mode("overwrite").parquet(f"{out_dir}/nation.parquet")

    tables = ("documents", "embeddings", "customer") if with_embeddings else ("documents", "customer")
    for t in tables:
        print(t, spark.read.parquet(f"{out_dir}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
