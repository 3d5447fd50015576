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
    undefined.

    Task memory is O(1 sample): the shuffle sorts each partition by
    ``(_shard, _key)`` (Spark's spillable sort, not a Python list) and
    rows stream straight into ``tarfile.addfile`` — the duplicate-key
    check is an equality test against the previous key, and at the
    WebDataset-conventional ~1 GB/shard nothing near shard size is
    ever held in Python. Commits are atomic PER SHARD: each task
    writes ``<shard>.tar.tmp.<attemptId>`` and ``os.replace()``s it
    into place only on success, so a task killed mid-write (or a
    speculative duplicate attempt) can never leave a truncated or
    interleaved tar at the final name. A failed EXPORT can still leave
    earlier shards' committed tars behind — which is why the
    export-level commit marker ``_EXPORT_MANIFEST`` (shard list +
    counts + bytes) is written LAST, only when every shard succeeded:
    a directory without it is not a complete export, and loaders
    should trust the manifest's shard list over a bare glob. Shards
    that receive no samples produce no tar but DO get a ``(shard, 0,
    0)`` report row (and manifest entry), so ``sum(samples) ==
    df.count()`` and missing-vs-empty is visible."""
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
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        out: list[tuple] = []
        tf = None
        tmp = final = None
        cur_shard = prev_key = None
        n = 0

        def _commit():
            nonlocal tf, n
            tf.close()
            tf = None
            os.replace(tmp, final)
            out.append((cur_shard, n, os.path.getsize(final)))
            n = 0

        try:
            for r in rows:
                s, k = r["_shard"], r["_key"]
                if s != cur_shard:
                    if tf is not None:
                        _commit()
                    cur_shard, prev_key = s, None
                    final = os.path.join(out_dir, f"shard-{s:05d}.tar")
                    tmp = f"{final}.tmp.{attempt}"
                    tf = tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT)
                if k == prev_key:  # partition is sorted: dups are adjacent
                    raise ValueError(
                        f"duplicate sample key {k!r} in shard {s}: WebDataset"
                        " samples are keyed; dedup or re-key before export"
                    )
                prev_key = k
                mb = (r["_meta"] or "{}").encode("utf-8")
                tf.addfile(_tar_member(f"{k}.json", mb), io.BytesIO(mb))
                pb = bytes(r["_payload"]) if r["_payload"] is not None else b""
                tf.addfile(_tar_member(f"{k}.{ext}", pb), io.BytesIO(pb))
                n += 1
            if tf is not None:
                _commit()
        finally:
            if tf is not None:  # error path: never leave a live handle
                tf.close()
                try:
                    os.remove(tmp)
                except OSError:
                    pass
        return iter(out)

    os.makedirs(out_dir, exist_ok=True)
    # collect the (tiny, one row per shard) report — this is also what
    # materializes the lazy RDD, so the tars exist when this returns.
    # The sort is Spark's spillable per-partition sort; shard changes
    # are contiguous, so the writer streams one sample at a time.
    rows = (
        slim.repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_key")
        .rdd.mapPartitions(_write)
        .collect()
    )
    written = {r[0] for r in rows}
    rows += [(s, 0, 0) for s in range(n_shards) if s not in written]
    rows.sort(key=lambda r: r[0])
    # export-level commit marker, written LAST and only on full
    # success: per-SHARD commits are atomic (tmp+rename), but a failed
    # export can still leave earlier shards' committed tars behind —
    # the manifest's absence is what tells a loader the directory is
    # not a complete export. Loaders consume _EXPORT_MANIFEST's shard
    # list; re-exports overwrite it atomically via the same
    # tmp+replace.
    manifest = {
        "n_shards": n_shards,
        "shards": [[r[0], r[1], r[2]] for r in rows],
        "samples": int(sum(r[1] for r in rows)),
        "tar_bytes": int(sum(r[2] for r in rows)),
    }
    mpath = os.path.join(out_dir, "_EXPORT_MANIFEST")
    with open(f"{mpath}.tmp", "w") as fh:
        json.dump(manifest, fh)
    os.replace(f"{mpath}.tmp", mpath)
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
    samples, total bytes, the max/min shard-size ratio (balance —
    hash sharding keeps it near 1; a skewed ratio means hot keys), and
    ``n_empty`` — shards that received no samples (reported as
    ``(shard, 0, 0)`` rows and excluded from the balance ratio, which
    would otherwise degenerate to max/1)."""
    rows = report.collect()
    sizes = [r["tar_bytes"] for r in rows if r["samples"] > 0] or [0]
    return {
        "n_shards": len(rows),
        "n_empty": sum(1 for r in rows if r["samples"] == 0),
        "samples": sum(r["samples"] for r in rows),
        "tar_bytes": sum(sizes),
        "balance": round(max(sizes) / max(min(sizes), 1), 3),
    }
