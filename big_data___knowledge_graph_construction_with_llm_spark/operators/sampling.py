"""Deterministic sampling & dataset-split operators (EXT surface).

A training-data pipeline needs splits and samples that are REPRODUCIBLE:
``df.sample()`` changes with partitioning, retries, and Spark versions,
so membership is derived from a content hash of the id instead — the
same row lands in the same split on every run, any engine, any cluster
size. Everything is a pure projection (no shuffle, no RNG state);
md5 is used (not xxhash64) because every engine computes the identical
digest, so the split can be recomputed outside Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: F.Column, buckets: int = 100) -> F.Column:
    """Deterministic bucket in ``[0, buckets)``: first 8 hex chars of
    ``md5(id)`` (32 uniform bits) mod ``buckets``. Modulo bias is
    ≤ buckets/2³² — negligible for any practical bucket count."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % buckets).cast("int")


def dataset_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Add a ``train``/``val``/``test`` split column (remaining percent is
    test). Membership is a pure function of the id hash: stable under
    re-runs, repartitioning, and incremental appends — new rows join a
    split without moving old ones."""
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        split_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, buckets: int = 10_000
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    falls below the cutoff. Unlike ``df.sample`` this is reproducible and
    consistent across tables — sampling two tables by the same id keeps
    them join-compatible (the classic requirement for sampled dev
    pipelines over shared keys)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(
        hash_bucket(F.col(id_col), buckets) < int(round(fraction * buckets))
    )


def sample_mixture(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-domain deterministic downsampling — the corpus-mixing step of
    a training-data pipeline ("keep 100% of books, 30% of web, 5% of
    boilerplate"): each row survives iff its id's hash bucket falls
    below its OWN domain's cutoff. Domains absent from ``rates`` get
    ``default_rate`` (0.0 = dropped — mixing is usually allow-listed).

    Pure projection + filter like :func:`hash_sample` (no shuffle, no
    RNG state, no join — the rate map folds into a single CASE
    expression, so it must be small, which domain maps are): membership
    is reproducible across runs, engines, and appends, and two tables
    mixed by the same id column stay join-compatible. Rates are
    per-domain FRACTIONS of that domain, not target corpus shares —
    deriving cutoffs from target shares needs domain counts, which is a
    separate (one aggregation) planning step.
    """
    return df.filter(
        mixture_keep_flag(domain_col, id_col, rates, default_rate, buckets)
    )


def mixture_keep_flag(
    domain_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> F.Column:
    """:func:`sample_mixture`'s membership as a boolean COLUMN — use it
    directly when the consumer wants to count/inspect the mix rather
    than filter (keeps the plan join-free: membership is a pure
    expression of (domain, id), never a lookup)."""
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for domain {d!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    # round, don't truncate: rates with no exact binary representation
    # (0.29 * 10000 = 2899.999...) would otherwise land one bucket low,
    # making the effective rate slightly below the requested one.
    cutoff = F.lit(int(round(default_rate * buckets)))
    for d, r in sorted(rates.items()):
        cutoff = F.when(
            F.col(domain_col) == F.lit(d), int(round(r * buckets))
        ).otherwise(cutoff)
    return hash_bucket(F.col(id_col), buckets) < cutoff


def epoch_shuffle_key(id_col: str, epoch: int) -> F.Column:
    """Deterministic per-epoch shuffle key: ``md5(id || ':' || epoch)``.
    Sorting (or range-partitioning a shard write) by this column gives
    every epoch its own reproducible pseudo-random document order —
    epoch N is the same permutation on every run and engine, epochs
    differ from each other, and appends slot into an epoch's order
    without moving existing rows. The training-data answer to
    ``ORDER BY rand()`` (which changes under retries and partitioning).
    """
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    return F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{epoch}"))
    )


def epoch_shuffle(df: DataFrame, id_col: str, epoch: int) -> DataFrame:
    """Rows of ``df`` in the epoch's deterministic shuffle order. The
    global sort is a range-partitioned Spark sort (no single-task
    funnel); downstream writers preserve the order per output file, so
    ``epoch_shuffle(df, id, e).write...`` produces reproducible,
    epoch-distinct training shards."""
    return df.orderBy(epoch_shuffle_key(id_col, epoch), F.col(id_col))


def score_sample(
    df: DataFrame, id_col: str, score_col: str, buckets: int = 10_000
) -> DataFrame:
    """Quality-WEIGHTED deterministic sampling: each row survives with
    probability equal to its own ``score_col`` value (in [0, 1]) — the
    importance-sampling step of a curated-corpus build ("keep documents
    in proportion to the quality classifier's confidence"), done as a
    pure projection like :func:`hash_sample`: membership is
    ``hash_bucket(id) < round(score * buckets)``, so it is reproducible
    across runs/engines/appends and monotone in the score (raising a
    row's score can only keep it). No shuffle, no RNG state. Rows with
    score ≤ 0 are always dropped, ≥ 1 always kept; NULL scores drop
    (filter semantics)."""
    b = hash_bucket(F.col(id_col), buckets)
    # bround = HALF_EVEN, matching the Python round() the static-rate
    # samplers (hash_sample / mixture_keep_flag) use for their cutoffs
    cutoff = F.bround(F.col(score_col) * buckets).cast("long")
    return df.filter(b < cutoff)


def _fold_prefix_offsets(part: DataFrame, pid_col: str, within, prefix: list):
    """Attach ``_start = prefix[pid] + within`` to ``part``, picking the
    plan shape by offset count: ≤1024 offsets inline as a literal-array
    lookup (no join in the plan); wider counts ship as a tiny
    broadcast-joined table, because each literal costs one py4j
    round-trip at plan-build time (tens of driver seconds at 65536).
    Shared by :func:`pack_sequences` and :func:`select_to_token_budget`
    so both prefix-sum consumers get the same wide-count fallback."""
    if len(prefix) <= 1024:
        prefix_arr = F.array(*[F.lit(x) for x in prefix])
        return part.withColumn(
            "_start", F.element_at(prefix_arr, F.col(pid_col) + 1) + within
        )
    spark = part.sparkSession
    offsets = spark.createDataFrame(
        list(enumerate(prefix)), f"{pid_col} int, _prefix long"
    )
    return (
        part.join(F.broadcast(offsets), pid_col)
        .withColumn("_start", F.col("_prefix") + within)
        .drop("_prefix")
    )


def select_to_token_budget(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    score_col: str,
    token_budget: int,
    partitions: int = 256,
) -> DataFrame:
    """Best-first corpus selection under a GLOBAL token budget: take
    documents in descending ``score_col`` order until ``token_budget``
    tokens are selected — the "top-quality N-token subset" step of a
    training-data build. A document is kept iff its starting offset in
    the score-ordered token stream is < ``token_budget`` (same
    straddle rule as ``pack_sequences``: the last kept doc may overflow
    the budget by at most its own length — an under-filling strict rule
    would leave budget on the table instead).

    Scale shape: the global order is realized by RANGE partitioning on
    (score desc, id) — contiguous score ranges per partition, globally
    ordered — then the same two-job distributed prefix sum as
    ``pack_sequences``: per-partition running sums in one pass,
    per-partition totals collected (``partitions`` longs — a parameter,
    not data) and folded back via ``_fold_prefix_offsets`` (literal
    array ≤1024 partitions, broadcast-joined offsets table above — the
    same fallback ``pack_sequences`` uses). Never a global-order window
    (single-task funnel). The partitioned frame is
    materialized once so the totals pass and the filter pass see the
    identical partitioning.

    Ties in score break by ``id_col`` (deterministic); ``id_col`` must
    be unique (the usual contract). Returns the surviving rows of
    ``df``.
    """
    from pyspark.sql import Window

    from big_data___knowledge_graph_construction_with_llm_spark.materialize import (
        materialize,
    )

    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    if partitions < 1:
        raise ValueError(f"partitions must be >= 1, got {partitions}")
    part = materialize(
        df.repartitionByRange(
            partitions, F.col(score_col).desc(), F.col(id_col)
        ).withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = (F.sum(F.col(n_tokens_col)).over(w) - F.col(n_tokens_col)).cast("long")
    totals = {
        r["_pid"]: r["_t"]
        for r in part.groupBy("_pid").agg(F.sum(n_tokens_col).alias("_t")).collect()
    }
    prefix, acc = [], 0
    for p in range(max(totals, default=-1) + 1):
        prefix.append(acc)
        acc += int(totals.get(p, 0))
    if not prefix:
        return df.limit(0)
    # window exprs can't sit in WHERE, so _start materializes as a column;
    # >1024 partitions switch to the broadcast-offsets table (shared helper)
    return (
        _fold_prefix_offsets(part, "_pid", within, prefix)
        .filter(F.col("_start") < token_budget)
        .drop("_pid", "_start")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """Deterministic exact-``n`` sample per stratum (e.g. balance a
    corpus across ``source``/``lang`` before mixing): rows ranked inside
    each stratum by ``md5(id)`` — an arbitrary-but-fixed order — and the
    first ``n`` kept. Same rows selected on every run, engine, and
    cluster size, and appends only ever *displace* rows at the boundary
    (ranks are stable).

    Precondition: ``id_col`` values are UNIQUE within a stratum. With
    duplicate ids the rank order between the duplicates is a tie even
    after the id tie-break, so WHICH physical row is selected can differ
    across runs/partitionings (the selected id set is still stable).
    Dedup first, or pass a column that is unique.

    Scale shape: one shuffle keyed on the stratum, then a per-stratum
    rank. A mega-stratum makes that a single-task sort; when only an
    approximate ``n`` is needed, prefer :func:`hash_sample` with
    ``fraction = n / stratum_size`` (pure projection, no shuffle). Exact
    top-n per group is inherently a per-group k-selection — Spark's
    window ``row_number`` spills, so it completes even when a stratum
    dwarfs memory.
    """
    from pyspark.sql import Window

    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col).cast("string")
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def derive_prefix_partitions(df: DataFrame) -> int:
    """``pack_sequences``' default partition count:
    ``clamp(2 × max(input files, default parallelism), 32, 65536)``
    rounded up to a power of two.

    Derived WITHOUT executing anything: ``df.inputFiles()`` reads the
    scan's file listing from the plan and each parquet part file is at
    most ``spark.sql.files.maxPartitionBytes`` of rows, so two prefix
    partitions per file keeps every per-task window sort under a scan
    task's size; ``defaultParallelism`` floors non-scan inputs.
    (``df.rdd.getNumPartitions()`` would be more precise but under AQE
    it MATERIALIZES the plan's shuffle stages — an expensive upstream
    would run twice per ``pack_sequences`` call.) See the sizing
    discussion in ``pack_sequences``."""
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-scan plans (e.g. createDataFrame)  # noqa: BLE001
        n_files = 0
    base = max(n_files, df.sparkSession.sparkContext.defaultParallelism)
    n = max(32, min(65536, 2 * base))
    return 1 << (n - 1).bit_length()


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    order_col: str | None = None,
    prefix_partitions: int | None = None,
) -> DataFrame:
    """Assign each document to a training-sequence bin of roughly
    ``budget`` tokens (the pretraining sequence-packing step): order
    documents deterministically (``order_col``, default the id), running
    cumulative token count, ``seq_id = floor((cumsum - n) / budget)`` —
    a document starts in the bin its first token falls into.

    Scale shape: a DISTRIBUTED prefix sum, never a global-order window
    (``Window.orderBy`` with no partition funnels the whole corpus
    through one task). The deterministic global order is
    ``(prefix_partition, order_col)`` where the partition is a hash
    bucket of the order key: cumsum runs per partition (one shuffle),
    per-partition token totals are collected (``prefix_partitions``
    rows — a parameter, not data) and folded back in as literal prefix
    offsets. Two jobs, bounded driver traffic, any corpus size.

    The trade against exact first-fit packing (which is inherently
    sequential) is a documented overflow: a bin's total may exceed
    ``budget`` by at most ``max(n_tokens) - 1``, because a straddling
    document stays in the bin where it started — downstream truncation
    or padding absorbs it, exactly as real packers do. Documents longer
    than ``budget`` should be chunked first (``chunk_documents``).

    ``prefix_partitions`` sizing: each partition window-sorts
    ``~corpus_rows / prefix_partitions`` rows in ONE task, so pick it so
    that slice fits a task comfortably — rows/partition in the low
    millions, i.e. ``corpus_rows / 2e6`` rounded up to the next power of
    two. Driver traffic is exactly ``prefix_partitions`` rows, so going
    wide is cheap (65536 partitions = 65536 collected longs).

    ``order_col`` need not be unique: ties are broken by ``id_col``, so
    the assignment is deterministic across runs either way.

    ``prefix_partitions=None`` (default) derives the partition count from
    the input's scan parallelism: ``clamp(2 × input_partitions, 32,
    65536)`` rounded up to a power of two. Each input partition is
    ≤ ``spark.sql.files.maxPartitionBytes`` (128 MB default) of rows, so
    two prefix partitions per input partition keeps the per-task window
    sort comfortably under the scan task's size — the documented
    two-level rule made automatic. Pass an explicit value when the input
    partitioning is not representative (e.g. a fresh ``repartition(1)``).

    Returns the input plus ``seq_id`` (bigint) and ``offset_in_seq``
    (the document's starting token offset inside its bin).
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if prefix_partitions is None:
        prefix_partitions = derive_prefix_partitions(df)
    if prefix_partitions <= 0:
        raise ValueError(
            f"prefix_partitions must be positive, got {prefix_partitions}"
        )
    order = order_col or id_col
    pk = F.pmod(F.xxhash64(F.col(order)), F.lit(prefix_partitions)).cast("int")
    part = df.withColumn("_pk", pk)
    w = (
        Window.partitionBy("_pk")
        .orderBy(order, id_col)  # id tie-break: deterministic under dup keys
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = (F.sum(F.col(n_tokens_col)).over(w) - F.col(n_tokens_col)).cast("long")
    totals = {
        r["_pk"]: r["_t"]
        for r in part.groupBy("_pk").agg(F.sum(n_tokens_col).alias("_t")).collect()
    }
    prefix, acc = [], 0
    for p in range(prefix_partitions):
        prefix.append(acc)
        acc += int(totals.get(p, 0))
    out = _fold_prefix_offsets(part, "_pk", within, prefix)
    return out.withColumns(
        {
            "seq_id": F.floor(F.col("_start") / budget).cast("long"),
            "offset_in_seq": (F.col("_start") % budget).cast("long"),
        }
    ).drop("_pk", "_start")


def chunk_documents(
    df: DataFrame,
    n_tokens_col: str,
    budget: int,
) -> DataFrame:
    """Split documents longer than ``budget`` tokens into budget-sized
    chunks — the precondition ``pack_sequences`` documents, as an
    operator instead of a footnote.

    Pure JVM expressions (sequence → transform → posexplode): each row
    becomes ``ceil(n / budget)`` rows carrying ``chunk_idx`` (0-based),
    ``chunk_start`` (token offset into the original document — the
    caller slices its token array / re-tokenizes with it) and
    ``n_tokens_col`` REPLACED by the chunk's token count (all chunks
    ``budget`` except a shorter last one; ≤-budget documents pass
    through as their own single chunk). No shuffle: the explode is
    map-side, and output row count is ``sum(ceil(n/budget))``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n = F.col(n_tokens_col).cast("long")
    n_chunks = F.greatest(F.ceil(n / budget), F.lit(1)).cast("int")
    sizes = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.least(F.lit(budget).cast("long"), n - i.cast("long") * budget),
    )
    other = [c for c in df.columns if c != n_tokens_col]
    return (
        df.select(*df.columns, F.posexplode(sizes).alias("chunk_idx", "_chunk_n"))
        .select(
            *other,
            F.col("chunk_idx"),
            (F.col("chunk_idx").cast("long") * budget).alias("chunk_start"),
            F.col("_chunk_n").alias(n_tokens_col),
        )
    )
