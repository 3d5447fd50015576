"""Generic stage-resumable pipelines over marker-committed tables.

:func:`resumable_flow` is the one mechanism behind every composed flow
that must SURVIVE losing the cluster mid-run: each stage's output
commits as a table generation (``operators.layout.write_table`` — the
single ``_CURRENT`` marker write is the commit point, S3-safe), a
re-run resumes from the LAST committed stage, and a parameter
fingerprint guards against silently resuming a different run.
``operators.curation.curate_resumable`` composes it for the curation
pipeline; :func:`encode_pack_resumable` composes it for the other
hours-long flow a 100 TB corpus runs — tokenizer training → corpus
encode → sequence packing — where the tokenizer train (a full corpus
word count + a 32k-merge driver loop) is exactly the stage you do not
want to re-pay after an interruption.

EXT surface mandated by the training-data north star (the reference's
pipelines are single-process and restart from zero,
``…Local/main.py``).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable

from pyspark.sql import DataFrame

from big_data___knowledge_graph_construction_with_llm_spark import fsutil
from big_data___knowledge_graph_construction_with_llm_spark.operators.layout import (
    _resolve_table_generation,
    gc_table_generations,
    read_table,
    write_table,
)


def params_fingerprint(parts: dict) -> str:
    """Stable sha256 over a {name: string} parameter map — build the
    strings with whatever content signature each parameter deserves
    (``curate_resumable`` uses plan hashes for DataFrames, rule names
    for expectations)."""
    return hashlib.sha256(
        json.dumps(parts, sort_keys=True).encode()
    ).hexdigest()


def resumable_flow(
    spark,
    stages: list[tuple[str, Callable[[DataFrame], DataFrame]]],
    root: str,
    fingerprint: str,
    initial: DataFrame | None = None,
    force: bool = False,
) -> DataFrame:
    """Run ``stages`` — ordered ``(name, prev_frame -> frame)`` pairs —
    committing every stage's output as a marker-last table generation
    under ``root/<NN>_<name>`` and RESUMING from the last committed
    stage on a re-run. Stage callables receive the PREVIOUS stage's
    committed table (read back from disk, so results are stable against
    re-execution); the first receives ``initial``. A stage that returns
    its input unchanged (``out is prev``) is a pass-through gate — its
    effect is a raise, not data — and commits nothing.

    ``fingerprint`` pins the run's parameters TWICE: into
    ``root/_PARAMS`` (the cheap up-front refusal — resuming with a
    different fingerprint raises: the committed stages were computed
    under other parameters, and silently mixing them is the wrong-data
    trap) AND into every stage generation itself (a ``_FLOW_FP`` file
    committed with the stage data via ``write_table`` ``extra_files``).
    The per-stage stamp is the one that actually guards resume: the
    scan counts a stage as committed ONLY when its current generation's
    stamp matches, so an INTERRUPTED ``force=True`` rerun — which
    rewrites ``_PARAMS`` before any stage lands — can never hand a
    later stage's old-parameter generation to a subsequent non-force
    run (stale-stamped generations read as not-committed and
    recompute). ``force=True`` additionally deletes every stage root's
    ``_CURRENT`` marker up front, so an interrupted SAME-fingerprint
    force rerun (the rewrite-in-place escape hatch) cannot resume into
    the very generations it was asked to recompute. Superseded and
    unreferenced generations sweep with :func:`gc_flow_checkpoints`.
    Stage generations written by pre-stamp versions carry no
    ``_FLOW_FP`` and conservatively recompute.

    The resume point is the LAST committed matching stage, not the
    first gap: under one fingerprint a later stage can only ever have
    committed from the same earlier outputs."""
    params_path = f"{root}/_PARAMS"
    roots = [f"{root}/{i:02d}_{name}" for i, (name, _) in enumerate(stages)]
    if force:
        # de-reference every stage FIRST (markers only — data dirs stay
        # for GC): an interrupted force rerun must not leave old
        # generations current for a later non-force run to resume into
        for sroot in roots:
            fsutil.delete(spark, f"{sroot}/_CURRENT")
    elif fsutil.exists(spark, params_path):
        prev = (fsutil.try_read_text(spark, params_path) or "").strip()
        if prev and prev != fingerprint:
            raise ValueError(
                "resumable_flow: checkpoint root holds a run with "
                "different parameters; pass force=True to restart"
            )
    fsutil.write_text(spark, params_path, fingerprint)

    last_done = -1
    if not force:
        for i, sroot in enumerate(roots):
            gen = _resolve_table_generation(spark, sroot)
            if gen is None:
                continue
            stamp = (fsutil.try_read_text(spark, f"{gen}/_FLOW_FP") or "").strip()
            if stamp == fingerprint:
                last_done = i
    kept = read_table(spark, roots[last_done]) if last_done >= 0 else initial
    for i in range(last_done + 1, len(stages)):
        _name, stage = stages[i]
        out = stage(kept)
        if out is kept:
            continue  # pass-through gate
        # manifest=False: stage tables are internal intermediates read
        # exactly once by the next stage as a straight scan — a per-
        # stage min/max pass (over text columns included) would roughly
        # double the write-path read volume for stats nothing prunes
        # on. Consumers wanting a prunable FINAL table write_table the
        # returned frame themselves (manifest on by default there).
        write_table(
            out, roots[i], manifest=False,
            extra_files={"_FLOW_FP": fingerprint},
        )
        kept = read_table(spark, roots[i])
    return kept


def gc_flow_checkpoints(
    spark, root: str, max_age_ms: int, now_ms: int | None = None
) -> dict[str, list[str]]:
    """Sweep superseded generations under every stage dir of a
    :func:`resumable_flow` root (each stage keeps its committed winner
    unconditionally — ``layout.gc_table_generations`` semantics,
    including the reader-lifetime sizing note)."""
    out: dict[str, list[str]] = {}
    for name, _mtime in fsutil.list_dir(spark, root):
        if name.startswith("_"):
            continue
        deleted = gc_table_generations(
            spark, f"{root}/{name}", max_age_ms, now_ms=now_ms
        )
        if deleted:
            out[name] = deleted
    return out


def encode_pack_resumable(
    docs: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 8_000,
    max_words: int = 1_000_000,
    budget: int = 4096,
    prefix_partitions: int | None = None,
    force: bool = False,
) -> DataFrame:
    """The train-data encode flow — BPE tokenizer training → corpus
    piece-id encode → sequence packing — with every stage committed as
    a table generation so an interruption resumes instead of re-paying
    the finished stages. The tokenizer is durable as its ``vocab_df``
    table (stage 0): a resumed encode rebuilds the model from that
    committed table (``BpeModel.from_vocab_df``), so the expensive
    corpus-wide word count + merge loop runs AT MOST once per
    parameter set. Returns the packed table ``(id, piece_ids,
    n_pieces, seq_id)`` read from the final committed stage.

    The docs frame itself is part of stage 0's inputs but is NOT
    fingerprinted (its plan hash would refuse harmless re-reads);
    pointing the same ``root`` at a different corpus is on the caller,
    exactly as for any checkpoint directory."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.bpe import (
        BpeModel,
        bpe_encode_ids,
        train_bpe,
    )
    from big_data___knowledge_graph_construction_with_llm_spark.operators.sampling import (
        pack_sequences,
    )

    spark = docs.sparkSession
    fp = params_fingerprint(
        {
            "id_col": id_col,
            "text_col": text_col,
            "vocab_size": repr(vocab_size),
            "max_words": repr(max_words),
            "budget": repr(budget),
            "prefix_partitions": repr(prefix_partitions),
        }
    )

    def train_stage(_prev):
        return train_bpe(
            docs, text_col, vocab_size=vocab_size, max_words=max_words
        ).vocab_df(spark)

    def encode_stage(vocab_df):
        return bpe_encode_ids(
            docs, BpeModel.from_vocab_df(vocab_df), id_col, text_col
        )

    def pack_stage(enc):
        return pack_sequences(
            enc, id_col, "n_pieces", budget,
            prefix_partitions=prefix_partitions,
        )

    return resumable_flow(
        spark,
        [
            ("bpe_vocab", train_stage),
            ("encode", encode_stage),
            ("pack", pack_stage),
        ],
        root,
        fp,
        initial=docs,
        force=force,
    )
