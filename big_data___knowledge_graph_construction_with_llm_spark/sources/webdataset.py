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


def read_webdataset_shards(
    spark: SparkSession,
    path: str,
    require_manifest: bool = False,
    chunk_rows: int = 256,
) -> DataFrame:
    """Read WebDataset tar shards back into ``(key, meta, payload,
    shard)`` — the export's round-trip twin and a general importer for
    externally produced WebDataset data. One ``binaryFile`` row per
    shard (shards stream independently — parallelism = shard count,
    matching how training loaders consume them), expanded to samples
    by an Arrow-batched ``mapInPandas`` running stdlib ``tarfile`` over
    the in-memory shard. Members group by basename; ``.json`` becomes
    ``meta``, any other extension the ``payload``.

    Manifest contract (r14; VERDICT r13 #4): when ``_EXPORT_MANIFEST``
    exists, EXACTLY its shard list is read — a manifest-named tar that
    is missing raises (a partially failed RE-export over a complete
    one), and stray tars outside the list (crashed attempts, older
    layouts) are ignored rather than silently mixed in. When no
    manifest exists the directory is either an external dataset or an
    INCOMPLETE export of ours: ``require_manifest=True`` makes that
    fatal (the right setting for reading back our own exports);
    ``False`` (default) falls back to the bare ``shard-*.tar`` glob for
    externally produced data, which never carries our marker.

    Task memory (r14; VERDICT r13 #5): samples are streamed out in
    ``chunk_rows``-sized Arrow chunks as the tar is walked, holding one
    sample group + one chunk in Python at a time — peak expansion
    memory is O(chunk), not O(shard) (the ``binaryFile`` ``content``
    itself is the floor this source can't go below). The walk groups
    members by CONTIGUOUS basename runs, which is the WebDataset
    convention (a sample's members are adjacent; our writer sorts by
    key) — a tar that scatters one sample's members apart yields
    partial rows rather than merging across the gap."""
    import os

    manifest_path = os.path.join(path, "_EXPORT_MANIFEST")
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        tars = [
            os.path.join(path, f"shard-{int(s):05d}.tar")
            for s, n_samples, _b in manifest["shards"]
            if n_samples > 0
        ]
        missing = [t for t in tars if not os.path.exists(t)]
        if missing:
            raise ValueError(
                f"_EXPORT_MANIFEST under {path!r} names"
                f" {len(missing)} shard tar(s) that do not exist"
                f" (first: {missing[0]!r}) — the directory does not"
                " match its manifest; re-export or repair before"
                " loading"
            )
        if not tars:  # complete export of zero samples
            return spark.createDataFrame([], SAMPLE_SCHEMA)
    elif require_manifest:
        raise ValueError(
            f"no _EXPORT_MANIFEST under {path!r}: the directory is an"
            " incomplete export (or not one of ours) —"
            " require_manifest=False reads a bare shard-*.tar glob"
            " for external datasets"
        )
    else:
        tars = [f"{path}/shard-*.tar"]

    shards = spark.read.format("binaryFile").load(tars)
    return shards.select("path", "content").mapInPandas(
        _make_expander(chunk_rows), SAMPLE_SCHEMA
    )


def _make_expander(chunk_rows: int):
    """The chunked tar→samples expansion :func:`read_webdataset_shards`
    runs inside ``mapInPandas`` — module-level so the RSS probe can run
    the IDENTICAL code path. Groups members by contiguous basename runs
    and yields a pandas chunk every ``chunk_rows`` samples; holds one
    sample + one chunk in Python at a time."""
    import pandas as pd

    def _flush(buf, key, meta, payload, shard_name):
        buf["key"].append(key)
        buf["meta"].append(meta)
        buf["payload"].append(payload)
        buf["shard"].append(shard_name)

    def _expand(batches):
        buf = {"key": [], "meta": [], "payload": [], "shard": []}
        for pdf in batches:
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                shard_name = shard_path.rsplit("/", 1)[-1]
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content))
                ) as tf:
                    cur_base = None
                    cur_meta = None
                    cur_payload = None
                    for m in tf:
                        if not m.isfile():
                            continue
                        base, _dot, suffix = m.name.rpartition(".")
                        if base != cur_base:
                            if cur_base is not None:
                                _flush(
                                    buf, cur_base, cur_meta, cur_payload,
                                    shard_name,
                                )
                                if len(buf["key"]) >= chunk_rows:
                                    yield pd.DataFrame(buf)
                                    buf = {
                                        "key": [], "meta": [],
                                        "payload": [], "shard": [],
                                    }
                            cur_base, cur_meta, cur_payload = base, None, None
                        data = tf.extractfile(m).read()
                        if suffix == "json":
                            cur_meta = data.decode("utf-8")
                        else:
                            cur_payload = data
                    if cur_base is not None:
                        _flush(buf, cur_base, cur_meta, cur_payload, shard_name)
        if buf["key"]:
            yield pd.DataFrame(buf)

    return _expand


def webdataset_read_rss_probe(
    spark: SparkSession, path: str, chunk_rows: int = 256
) -> dict:
    """Diagnostic twin of :func:`read_webdataset_shards`: run the SAME
    chunked expansion over the shards at ``path``, measuring the
    EXPANSION-ATTRIBUTABLE peak allocation with ``tracemalloc``:
    traced-memory peak is reset when each input shard lands (a tee on
    the input iterator, before any extraction), so
    ``expand_peak_traced_kb`` = peak traced allocation DURING expansion
    minus the traced floor at that reset. OS-level RSS is useless here
    — a reused daemon worker serves new allocations from pages a prior
    task left resident (VmRSS never moves) and ``ru_maxrss`` is a
    process-lifetime high-water mark; ``tracemalloc`` counts the
    Python-level bytes (tar member reads, chunk buffers, pandas object
    arrays) regardless of where the allocator got the pages, which is
    exactly what ``chunk_rows`` bounds. ``peak_rss_kb`` (VmRSS after
    each chunk) is still reported for context."""

    import pandas as pd

    expand = _make_expander(chunk_rows)

    def _vm_rss_kb() -> int:
        try:
            with open("/proc/self/status") as fh:
                for ln in fh:
                    if ln.startswith("VmRSS:"):
                        return int(ln.split()[1])
        except OSError:
            pass
        return -1

    def _probe(batches):
        import tracemalloc

        was_tracing = tracemalloc.is_tracing()
        if not was_tracing:
            tracemalloc.start()
        state = {"floor": 0}

        def _tee(bs):
            for pdf in bs:
                state["floor"] = tracemalloc.get_traced_memory()[0]
                tracemalloc.reset_peak()
                yield pdf

        try:
            rows = chunks = 0
            rss_peak = traced_delta = -1
            for chunk in expand(_tee(batches)):
                rows += len(chunk)
                chunks += 1
                rss_peak = max(rss_peak, _vm_rss_kb())
                traced_delta = max(
                    traced_delta,
                    tracemalloc.get_traced_memory()[1] - state["floor"],
                )
        finally:
            if not was_tracing:
                tracemalloc.stop()
        yield pd.DataFrame(
            {
                "rows": [rows],
                "chunks": [chunks],
                "expand_peak_traced_kb": [traced_delta // 1024],
                "peak_rss_kb": [rss_peak],
            }
        )

    shards = spark.read.format("binaryFile").load(f"{path}/shard-*.tar")
    got = (
        shards.select("path", "content")
        .mapInPandas(
            _probe,
            "rows long, chunks long, expand_peak_traced_kb long,"
            " peak_rss_kb long",
        )
        .collect()
    )
    return {
        "rows": int(sum(r["rows"] for r in got)),
        "chunks": int(sum(r["chunks"] for r in got)),
        "expand_peak_traced_kb": int(
            max((r["expand_peak_traced_kb"] for r in got), default=-1)
        ),
        "peak_rss_kb": int(max((r["peak_rss_kb"] for r in got), default=-1)),
        "chunk_rows": chunk_rows,
    }


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
