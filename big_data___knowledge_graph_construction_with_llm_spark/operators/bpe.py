"""Learned byte-pair-encoding tokenizer — train on the corpus, encode
the corpus — with the 100 TB split put where it belongs:

- **Counting is distributed** (the only corpus-sized pass): word
  frequencies via explode + partial-aggregated count, exactly
  ``text.build_vocab``'s shuffle shape.
- **Merge learning is driver-side over the BOUNDED word-frequency
  table** (``max_words`` cap, documented collect) — the same shape
  every production BPE trainer uses: merges depend only on the
  word→freq map, never on document order, so a ~1M-entry table
  carries the full signal of 100 TB of text.
- **Encoding touches Python only for DISTINCT words** (each unique
  word is encoded once, however many billion times it occurs) — and
  because the distinct-word set itself is UNBOUNDED on web-scale
  text, the join-back is frequency-split: the ``head_words`` most
  frequent words (≈ all occurrences, by Zipf) broadcast, the long
  tail shuffle-joins its own rare occurrences. The per-document
  order-preserving flatten is pure JVM DataFrame ops (the
  ``encode_documents`` rebuild shape).

The reference has no tokenizer (its LLM prompt consumes raw text,
``…AWS/LLM/chains.py``); this is EXT surface mandated by the
training-data north star — ``text.bpe_ish_token_count`` estimates
piece counts with a fixed regex, this module LEARNS the pieces.

Determinism: merges rank by (pair count desc, pair lexicographic asc)
and the piece vocabulary is alphabet-sorted-then-merge-ordered, so the
same corpus yields the same model on every run and partitioning.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators.text import tokens

#: end-of-word marker appended to every word's symbol sequence, so
#: "low" and the prefix of "lower" learn distinct final pieces
END = "</w>"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_words: int = 1_000_000,
) -> DataFrame:
    """Distributed word→count table feeding the trainer: one explode +
    map-side-combined count, pruned by ``min_count`` and capped to the
    ``max_words`` most frequent (deterministic (count, word) order).
    The cap bounds the driver collect in :func:`train_bpe`; rare words
    past the cap contribute ~nothing to merge counts."""
    counts = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    return counts.orderBy(F.col("count").desc(), F.col("word")).limit(max_words)


@dataclass(frozen=True)
class BpeModel:
    """An ordered merge list + the base alphabet. ``pieces`` is the
    deterministic piece vocabulary: alphabet (sorted) first, then one
    piece per merge in learned order."""

    alphabet: tuple[str, ...]
    merges: tuple[tuple[str, str], ...]

    @property
    def pieces(self) -> list[str]:
        return list(self.alphabet) + [a + b for a, b in self.merges]

    def vocab_df(self, spark: SparkSession) -> DataFrame:
        """Piece table ``(piece, piece_id, left, right)`` — left/right
        NULL for alphabet entries, the merge operands otherwise. Small
        by construction (= vocab_size rows); store with the corpus."""
        rows = [(p, i, None, None) for i, p in enumerate(self.alphabet)]
        base = len(self.alphabet)
        rows += [
            (a + b, base + r, a, b) for r, (a, b) in enumerate(self.merges)
        ]
        return spark.createDataFrame(
            rows, "piece string, piece_id int, left string, right string"
        )

    def save(self, spark: SparkSession, path: str) -> None:
        self.vocab_df(spark).repartition(1).write.mode("overwrite").parquet(path)

    @classmethod
    def from_vocab_df(cls, vocab: DataFrame) -> "BpeModel":
        """Rebuild the model from a :meth:`vocab_df` frame however it
        was stored (plain parquet, a generational table, an in-memory
        frame) — the inverse that lets the vocab table be the model's
        ONE durable representation."""
        rows = vocab.orderBy("piece_id").collect()
        alphabet = tuple(r["piece"] for r in rows if r["left"] is None)
        merges = tuple(
            (r["left"], r["right"]) for r in rows if r["left"] is not None
        )
        return cls(alphabet=alphabet, merges=merges)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BpeModel":
        return cls.from_vocab_df(spark.read.parquet(path))


def _pair_counts(words: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter = Counter()
    for syms, freq in words.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += freq
    return pc


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    ab = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 8_000,
    min_count: int = 1,
    max_words: int = 1_000_000,
) -> BpeModel:
    """Learn a BPE model of ``vocab_size`` pieces (base characters +
    learned merges) from the corpus. The distributed part is
    :func:`word_frequencies`; the merge loop runs on the driver over
    that bounded table with incremental pair-count maintenance (each
    merge re-counts only the words that contain the merged pair, via a
    pair→words index), so training cost scales with the word table,
    not the corpus. Best-pair selection is a LAZY-DELETION HEAP, not a
    per-merge scan of the whole pair-count map: at production vocab
    sizes (32k–100k merges over a ~1M-word table with millions of live
    pairs) an O(|pairs|) argmax per merge is the driver bottleneck —
    the heap makes selection O(log |pairs|) amortized, with stale
    entries (counts changed since push) re-pushed at their current
    count on pop. Ties rank lexicographically — bit-identical models
    across runs (the heap orders by exactly the old scan's
    ``(-count, pair)`` key).

    DRIVER MEMORY SIZING (measured, BENCH_SCALE ``bpe_memory_curve``,
    fresh process per tier over the same word table): the peak is
    dominated by the pair→words index + pair heap, which scale with
    the LIVE PAIR count — itself set by ``max_words`` — and grow only
    mildly with merge count (each merge retires pairs as it mints
    them). Budget ~2-2.5 GB of driver heap per 1M ``max_words`` at
    32k-64k merges and size ``max_words`` down (not ``vocab_size``)
    when the driver is smaller — halving ``max_words`` roughly halves
    the peak, while vocab 8k→64k moves it far less."""
    freq_rows = word_frequencies(df, text_col, min_count, max_words).collect()
    words: dict[tuple[str, ...], int] = {}
    for r in freq_rows:
        words[tuple(r["word"]) + (END,)] = words.get(
            tuple(r["word"]) + (END,), 0
        ) + int(r["count"])
    alphabet, merges = _learn_merges(words, vocab_size)
    return BpeModel(alphabet=alphabet, merges=merges)


def _learn_merges(
    words: dict[tuple[str, ...], int], vocab_size: int
) -> tuple[tuple[str, ...], tuple[tuple[str, str], ...]]:
    """The driver-side merge loop of :func:`train_bpe` over an
    already-collected ``{word syms: freq}`` table — factored out so
    the memory-sizing probe (``scripts/bench_scale.py``,
    ``bpe_memory_curve``) can price it in a fresh process without a
    Spark session. MUTATES ``words``."""
    import heapq

    alphabet = tuple(sorted({s for syms in words for s in syms}))
    if vocab_size < len(alphabet):
        raise ValueError(
            f"vocab_size {vocab_size} < base alphabet {len(alphabet)}"
        )
    pc = _pair_counts(words)
    # pair → the set of current word forms containing it (the
    # incremental index: a merge touches only these entries)
    index: dict[tuple[str, str], set] = {}
    for syms in words:
        for p in zip(syms, syms[1:]):
            index.setdefault(p, set()).add(syms)

    heap = [(-c, p) for p, c in pc.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(alphabet) + len(merges) < vocab_size and heap:
        neg, best = heapq.heappop(heap)
        cur = pc.get(best)
        if cur is None:
            continue  # pair vanished since push — stale entry
        if -neg != cur:
            # count changed since push: re-enter at the CURRENT count
            # (decrements never push, so this is the one re-entry point)
            heapq.heappush(heap, (-cur, best))
            continue
        if cur < 1:
            break
        merges.append(best)
        # pairs whose count INCREASED this merge step: pushed ONCE at
        # the end with their final count (a push per touched word per
        # pair would flood the heap — measured as the 32k-merge
        # bottleneck); decrements never push (lazy re-push on pop)
        grew: set[tuple[str, str]] = set()
        for old in list(index.get(best, ())):
            if old not in words:
                continue
            freq = words.pop(old)
            new = _merge_word(old, best)
            words[new] = words.get(new, 0) + freq
            for p in zip(old, old[1:]):
                pc[p] -= freq
                if pc[p] <= 0:
                    pc.pop(p, None)
                s = index.get(p)
                if s is not None:
                    s.discard(old)
                    if not s:
                        index.pop(p, None)
            for p in zip(new, new[1:]):
                pc[p] = pc.get(p, 0) + freq
                index.setdefault(p, set()).add(new)
                grew.add(p)
        pc.pop(best, None)
        index.pop(best, None)
        grew.discard(best)
        for p in grew:
            c = pc.get(p)
            if c:
                heapq.heappush(heap, (-c, p))
    return alphabet, tuple(merges)


def _make_word_encoder(ranks: dict[tuple[str, str], int], end: str):
    """Build the greedy lowest-rank word encoder as a SELF-CONTAINED
    closure: it references nothing module-level, so cloudpickle ships
    it by value into Arrow workers — the executors' Python does not
    need this package on its import path (it may not be there when the
    driver script added the repo to ``sys.path`` itself)."""

    def encode(word: str) -> list[str]:
        syms = list(word) + [end]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            a, b = syms[best_i], syms[best_i + 1]
            ab = a + b
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    return encode


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging of one word (the standard BPE encode
    loop): repeatedly apply the best-ranked applicable merge until none
    applies. Unknown characters pass through as single-char pieces.
    Driver-side/test convenience over :func:`_make_word_encoder` (the
    form that ships to executors)."""
    return _make_word_encoder(ranks, END)(word)


def _encode_frame(
    df: DataFrame,
    model: BpeModel,
    id_col: str,
    text_col: str,
    emit_ids: bool,
    head_words: int = 1_000_000,
    head_vocab: list[str] | None = None,
) -> DataFrame:
    """Shared encode pipeline. Python runs ONCE PER DISTINCT WORD (an
    Arrow ``mapInPandas`` over distinct words; merge ranks — and for
    the ids variant the piece→id dict — ship in the closure, so no
    corpus-sized literal); the corpus-sized flatten — posexplode, join
    on word, per-document rebuild in position order — is all JVM.

    The join is FREQUENCY-SPLIT, because the distinct-word set is
    UNBOUNDED on web-scale text (``tokens()`` is a whitespace split —
    URLs, numbers, typos push distinct words to the billions, far past
    any broadcast limit): the ``head_words`` most frequent words —
    which by Zipf's law cover almost every occurrence — are encoded
    and BROADCAST-joined (no shuffle of the corpus), while the long
    tail's occurrences (the small remainder, and by construction never
    a hot key: every tail word is rarer than the head's least-frequent
    member) take one plain shuffle join with no hint, leaving AQE free
    to pick the strategy from actual stats. The head word list is
    fetched to the driver at plan-construction time (an eager bounded
    parameter fetch, ≤ ``head_words`` strings — the same bound the
    broadcast commits to, and the ``ivf_centroids`` pattern), so the
    corpus-sized word-count aggregation runs exactly once; its shuffle
    is the same shape the old distinct() already paid. Callers that
    only BUILD plans (dry planning, pipeline composition) skip the
    eager job by passing ``head_vocab`` — a precomputed head word
    list, e.g. ``word_frequencies(df).select("word")`` collected once
    and reused across encode calls."""
    import pandas as pd

    encode = _make_word_encoder(
        {p: r for r, p in enumerate(model.merges)}, END
    )
    id_of = {p: i for i, p in enumerate(model.pieces)} if emit_ids else None
    out_field = "piece_ids" if emit_ids else "pieces"
    out_type = "array<int>" if emit_ids else "array<string>"
    map_schema = f"word string, {out_field} {out_type}"

    def encode_batch(batches):
        for pdf in batches:
            encoded = [encode(w) for w in pdf["word"]]
            if id_of is not None:
                # unseen characters (not in the training alphabet) map
                # to -1, the OOV convention of encode_documents
                encoded = [
                    [id_of.get(p, -1) for p in ps] for ps in encoded
                ]
            yield pd.DataFrame({"word": pdf["word"], out_field: encoded})

    toks = df.select(
        F.col(id_col),
        F.posexplode_outer(
            F.filter(tokens(text_col), lambda t: t != "")
        ).alias("pos", "word"),
    )
    # occurrence-mass head: top-K by count (deterministic tiebreak on
    # the word; TakeOrdered — no global sort materializes). The head
    # word list is COLLECTED — a bounded parameter fetch, ≤ head_words
    # strings, i.e. exactly the broadcast bound this operator already
    # commits to — so the corpus-sized word-count shuffle executes
    # exactly ONCE: every later consumer sees a LocalRelation with no
    # corpus lineage (lazy branch-sharing would otherwise re-run the
    # aggregation per branch — measured: zero ReusedExchange, 4 copies)
    if head_vocab is not None:
        head_list = list(head_vocab)
    else:
        head_list = [
            r["word"]
            for r in toks.where(F.col("word").isNotNull())
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("_wc"))
            .orderBy(F.col("_wc").desc(), "word")
            .limit(head_words)
            .select("word")
            .collect()
        ]
    head_local = df.sparkSession.createDataFrame(
        pd.DataFrame({"word": head_list}), "word string"
    )
    head_map = head_local.mapInPandas(encode_batch, map_schema)
    first = toks.join(F.broadcast(head_map), "word", "left")
    # a null out_field means either a tail word or the null row an
    # empty document keeps through posexplode_outer — only real words
    # go to the tail join; only the tail branch — by Zipf a sliver of
    # occurrences, and never a hot key (every tail word is rarer than
    # the head's least-frequent member) — shuffles. The tail's own
    # distinct() is over those rare occurrences, not the corpus.
    covered = first.where(
        F.col(out_field).isNotNull() | F.col("word").isNull()
    )
    tail_toks = first.where(
        F.col(out_field).isNull() & F.col("word").isNotNull()
    ).drop(out_field)
    tail_map = tail_toks.select("word").distinct().mapInPandas(
        encode_batch, map_schema
    )
    joined = covered.unionByName(
        tail_toks.join(tail_map, "word", "left")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("pos"), F.col(out_field).alias("ps"))
                )
            ).alias("_ord")
        )
        .select(
            id_col,
            F.flatten(
                F.transform(
                    F.filter(F.col("_ord"), lambda s: s["pos"].isNotNull()),
                    lambda s: s["ps"],
                )
            ).alias(out_field),
        )
        .select(
            id_col, out_field, F.size(out_field).cast("int").alias("n_pieces")
        )
    )


def bpe_encode(
    df: DataFrame,
    model: BpeModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_words: int = 1_000_000,
    head_vocab: list[str] | None = None,
) -> DataFrame:
    """Encode documents to BPE pieces: ``(id, pieces array<string>,
    n_pieces)`` with word order preserved. Empty/blank documents keep
    a row with an empty array (``posexplode_outer``). Scale shape: see
    :func:`_encode_frame` — Python cost is per distinct word, however
    many billion occurrences the corpus has, and only the
    ``head_words`` most frequent words' encodings broadcast (the
    unbounded tail shuffle-joins its own rare occurrences). The result
    is invariant to ``head_words`` — it only moves the
    broadcast/shuffle boundary.

    EAGER AT PLAN CONSTRUCTION: unless ``head_vocab`` is given, this
    call runs one full-corpus word-count job immediately (a bounded
    ≤ ``head_words``-string driver fetch — the broadcast bound) and
    embeds the head list in the plan, so merely composing the plan
    pays the job once. Pass ``head_vocab`` (a precomputed head word
    list) to defer/amortize it across calls.

    Precondition (as ``encode_documents``): ``id_col`` unique."""
    return _encode_frame(
        df, model, id_col, text_col, emit_ids=False,
        head_words=head_words, head_vocab=head_vocab,
    )


def bpe_encode_ids(
    df: DataFrame,
    model: BpeModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_words: int = 1_000_000,
    head_vocab: list[str] | None = None,
) -> DataFrame:
    """Piece-id encoding ``(id, piece_ids array<int>, n_pieces)``
    against the model's deterministic piece numbering — the
    train-ready output (feed to ``sampling.pack_sequences``). Every
    emitted piece is in the vocabulary by construction (encoding only
    applies model merges over alphabet characters); genuinely unseen
    characters map to -1. ``head_words`` / the plan-construction-time
    eager word-count job / ``head_vocab``: see :func:`bpe_encode`."""
    return _encode_frame(
        df, model, id_col, text_col, emit_ids=True,
        head_words=head_words, head_vocab=head_vocab,
    )
