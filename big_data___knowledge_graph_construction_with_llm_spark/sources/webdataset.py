"""WebDataset-style tar-shard export/import for multimodal training
data (EXT surface; the reference has no media export — nearest analog
is its bulk CSV export for ``neo4j-admin``,
`Art-Knowledge-Graph-AWS/GRAPH/graph_builder.py:71-88`, which likewise
renders engine frames into an external loader's on-disk format).

The WebDataset convention: a dataset is a set of ``.tar`` shards; each
sample is a group of adjacent members sharing a basename key —
``<key>.json`` (metadata) + ``<key>.<ext>`` (payload bytes). Training
loaders stream shards sequentially (local disk, object store, HTTP),
so the EXPORT layout decides training I/O: samples of one shard must
be contiguous, shards should be similar-sized, and shard membership
must be stable so re-exports and resumed jobs agree.

Scale shape: shard assignment is ``xxhash64(key) % n_shards`` — a
deterministic map-side column, so the only shuffle is the one
``repartition(n_shards, shard)`` that co-locates each shard's samples
(exactly one task writes each shard; no two tasks ever touch the same
tar). Within a shard, samples sort by key and tar metadata is pinned
(mtime 0, USTAR), so a shard's bytes are a pure function of its rows —
re-running an unchanged export produces byte-identical shards. Tars
are written with stdlib ``tarfile`` to a POSIX path visible to every
executor (local dir on one node, NFS/FUSE mount on a cluster) — the
same deployment contract as the ``neo4j-admin`` bulk-CSV export. The
imperative tar I/O is the documented ``mapPartitions`` last-resort
case: no built-in sink speaks tar framing.
"""

from __future__ import annotations

import io
import json
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: schema of the per-shard report :func:`write_webdataset_shards` returns
SHARD_REPORT_SCHEMA = "shard int, samples bigint, tar_bytes bigint"

#: schema of :func:`read_webdataset_shards`'s expanded samples
SAMPLE_SCHEMA = "key string, meta string, payload binary, shard string"


def _tar_member(name: str, data: bytes) -> tarfile.TarInfo:
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = 0  # pinned: shard bytes must not depend on wall clock
    return info


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    payload_col: str,
    meta_cols: list[str] | None = None,
    n_shards: int = 8,
    ext: str = "bin",
) -> DataFrame:
    """Export ``df`` as WebDataset tar shards under ``out_dir``
    (``shard-00000.tar`` … ``shard-{n-1:05d}.tar``): per sample a
    ``<key>.json`` member with ``meta_cols`` as a JSON object, then
    ``<key>.<ext>`` with the payload bytes. Returns the per-shard
    report frame ``(shard, samples, tar_bytes)`` — the export's own
    verification surface (sum(samples) must equal ``df.count()``).

    Shard membership is content-addressed (``xxhash64(key) %
    n_shards``), NOT arrival-order: appending new samples later
    re-shards only the new keys' shards, and a re-export of identical
    rows yields byte-identical tars (members sorted by key, tar
    metadata pinned). Duplicate keys raise — WebDataset samples are
    keyed, and a silent second ``<key>.json`` would make loaders
    undefined."""
    import os

    meta_cols = list(meta_cols or [])
    shard = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards)).cast(
        "int"
    )
    slim = df.select(
        F.col(key_col).cast("string").alias("_key"),
        F.to_json(F.struct(*[F.col(c) for c in meta_cols])).alias("_meta")
        if meta_cols
        else F.lit("{}").alias("_meta"),
        F.col(payload_col).alias("_payload"),
        shard.alias("_shard"),
    )

    def _write(rows):
        buckets: dict[int, list] = {}
        for r in rows:
            buckets.setdefault(r["_shard"], []).append(
                (r["_key"], r["_meta"], r["_payload"])
            )
        for s, samples in buckets.items():
            samples.sort(key=lambda t: t[0])
            keys = [k for k, _m, _p in samples]
            if len(set(keys)) != len(keys):
                dup = next(k for i, k in enumerate(keys) if k in keys[:i])
                raise ValueError(
                    f"duplicate sample key {dup!r} in shard {s}: WebDataset"
                    " samples are keyed; dedup or re-key before export"
                )
            path = os.path.join(out_dir, f"shard-{s:05d}.tar")
            with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tf:
                for k, m, p in samples:
                    mb = (m or "{}").encode("utf-8")
                    tf.addfile(_tar_member(f"{k}.json", mb), io.BytesIO(mb))
                    pb = bytes(p) if p is not None else b""
                    tf.addfile(_tar_member(f"{k}.{ext}", pb), io.BytesIO(pb))
            yield (s, len(samples), os.path.getsize(path))

    os.makedirs(out_dir, exist_ok=True)
    # collect the (tiny, one row per shard) report — this is also what
    # materializes the lazy RDD, so the tars exist when this returns
    rows = (
        slim.repartition(n_shards, "_shard").rdd.mapPartitions(_write).collect()
    )
    return df.sparkSession.createDataFrame(rows, SHARD_REPORT_SCHEMA)


def read_webdataset_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset tar shards back into ``(key, meta, payload,
    shard)`` — the export's round-trip twin and a general importer for
    externally produced WebDataset data. One ``binaryFile`` row per
    shard (shards stream independently — parallelism = shard count,
    matching how training loaders consume them), expanded to samples
    by an Arrow-batched ``mapInPandas`` running stdlib ``tarfile`` over
    the in-memory shard. Members group by basename; ``.json`` becomes
    ``meta``, any other extension the ``payload``."""
    import pandas as pd

    def _expand(batches):
        for pdf in batches:
            out = {"key": [], "meta": [], "payload": [], "shard": []}
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content))
                ) as tf:
                    groups: dict[str, dict] = {}
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        base, _dot, suffix = m.name.rpartition(".")
                        data = tf.extractfile(m).read()
                        g = groups.setdefault(
                            base, {"meta": None, "payload": None}
                        )
                        if suffix == "json":
                            g["meta"] = data.decode("utf-8")
                        else:
                            g["payload"] = data
                    for key in sorted(groups):
                        out["key"].append(key)
                        out["meta"].append(groups[key]["meta"])
                        out["payload"].append(groups[key]["payload"])
                        out["shard"].append(shard_path.rsplit("/", 1)[-1])
            yield pd.DataFrame(out)

    shards = spark.read.format("binaryFile").load(f"{path}/shard-*.tar")
    return shards.select("path", "content").mapInPandas(
        _expand, SAMPLE_SCHEMA
    )


def webdataset_manifest(report: DataFrame) -> dict:
    """Collapse a :func:`write_webdataset_shards` report into the
    export manifest a training job records: shard count, total
    samples, total bytes, and the max/min shard-size ratio (balance —
    hash sharding keeps it near 1; a skewed ratio means hot keys)."""
    rows = report.collect()
    sizes = [r["tar_bytes"] for r in rows] or [0]
    return {
        "n_shards": len(rows),
        "samples": sum(r["samples"] for r in rows),
        "tar_bytes": sum(sizes),
        "balance": round(max(sizes) / max(min(sizes), 1), 3),
    }
