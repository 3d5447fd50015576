"""Custom stateful streaming operators (``applyInPandasWithState``).

The built-in streaming aggregations (window/session/dedup in
``streaming/events.py``) cover the declarative surface; this module is
the escape hatch the north star asks for — arbitrary per-key state kept
by the engine across micro-batches, Arrow-batched, with timeout-based
state eviction so state stays bounded (the property that makes custom
stateful ops viable on an unbounded stream).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of ``running_totals``
RUNNING_TOTALS_SCHEMA = "user_id bigint, n bigint, total double"
_STATE_SCHEMA = "n bigint, total double"


#: evict idle per-key state after this long without new events; bounds
#: state-store growth on an unbounded key space
DEFAULT_IDLE_TIMEOUT_MS = 24 * 3600 * 1000


def _make_running_totals_fn(idle_timeout_ms: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Accumulate (count, sum(value)) per key across micro-batches."""
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})

    return fn


def _make_funnel_fn(steps: list[str], idle_timeout_ms: int):
    k = len(steps)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        times = list(state.get[0]) if state.exists else [-1] * k
        chunks = list(pdfs)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        rows = rows.sort_values("ts")
        # ns→µs once per key-batch, vectorized — a per-row pd.Timestamp
        # here multiplies the per-key Python overhead this operator is
        # bound by (BENCH_STREAM.json)
        us_all = rows["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        for us, et in zip(us_all, rows["event_type"].to_numpy()):
            j = next((i for i in range(k) if times[i] == -1), None)
            if j is None:
                break  # funnel complete; nothing left to advance
            if et == steps[j] and (j == 0 or us > times[j - 1]):
                times[j] = int(us)
        state.update((times,))
        state.setTimeoutDuration(idle_timeout_ms)
        depth = sum(1 for t in times if t != -1)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "depth": [depth],
                "t_first": [times[0] if times[0] != -1 else None],
                "t_depth": [times[depth - 1] if depth else None],
            }
        )

    return fn


#: output schema of ``streaming_funnel``
FUNNEL_SCHEMA = "user_id bigint, depth int, t_first bigint, t_depth bigint"


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS,
) -> DataFrame:
    """Per-user ordered-funnel progress ON THE STREAM: each micro-batch
    the user appears in emits ``(user_id, depth, t_first, t_depth)`` —
    how far through ``steps`` the user has advanced and when (epoch
    micros). The per-user step times live in the engine's state store
    (k longs per user, evicted after ``idle_timeout_ms`` idle), so the
    funnel runs indefinitely on an unbounded stream.

    Semantics: greedy in-order advance — events are sorted by time
    WITHIN each micro-batch, and a step fires when its event type
    arrives strictly after the previous step's recorded time. With
    in-order delivery (or disorder confined to a micro-batch) this
    matches the batch :func:`operators.relational.funnel_times` greedy
    exactly; an event arriving batches late cannot retroactively create
    an earlier chain — the committed prefix stands. That one-way drift
    is the standard streaming-funnel trade; run the batch operator over
    landed data where exactness matters.

    Operational note (applies to every ``ProcessingTimeTimeout``
    operator, also :func:`running_totals`): a query over this operator
    NEVER self-terminates — not under ``processAllAvailable()`` and not
    under ``trigger(availableNow=True)`` either, because pending
    processing-time timeouts always count as potential work, so the
    engine keeps scheduling no-data timeout-check batches (measured
    ~1s each on local[32]) after the source is drained. Bounded drains
    (backfills, benches, tests) must detect completion from query
    progress (cumulative ``numInputRows`` reaching the known source
    size) and call ``stop()``; see ``scripts/bench_streaming.py``."""
    if not steps:
        raise ValueError("steps must be non-empty")
    return events.groupBy("user_id").applyInPandasWithState(
        _make_funnel_fn(steps, idle_timeout_ms),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType="times array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def running_totals(
    events: DataFrame, idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS
) -> DataFrame:
    """Per-user running (count, sum) emitted every micro-batch the user
    appears in — state lives in the engine's state store, not the task.

    Keys idle for ``idle_timeout_ms`` of processing time are evicted
    (timeout branch in the state function), so state stays bounded on an
    unbounded key space. Same never-self-terminates caveat as
    :func:`streaming_funnel` — see its operational note.

    Batch-twin semantics (for the final batch): ``groupBy(user_id)
    .agg(count(*), sum(value))``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_running_totals_fn(idle_timeout_ms),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


#: fully-qualified RocksDB provider class — transformWithState requires it
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def streaming_funnel_tws(
    events: DataFrame,
    steps: list[str],
    idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS,
) -> DataFrame:
    """:func:`streaming_funnel` on ``transformWithStateInPandas`` —
    Spark 4's successor API to ``applyInPandasWithState``. Same greedy
    in-order semantics, same per-batch emission contract, same output
    schema; the per-user step times live in a named ``ValueState``
    instead of the monolithic state tuple, and idle keys evict via the
    engine's native state TTL (``ttlDurationMs``, refreshed on every
    update) instead of a hand-rolled processing-time timeout branch.

    Operational differences from the v1 operator, both favorable:

    - Requires the RocksDB state store provider (Spark enforces this
      for ``transformWithState``): set
      ``spark.sql.streaming.stateStore.providerClass`` to
      :data:`ROCKSDB_PROVIDER` on the session before starting the
      query.
    - TTL eviction is store-internal — there is no pending-timeout
      "potential work", so unlike v1 a bounded drain under
      ``trigger(availableNow=True)`` terminates on its own.

    Environment gate: STARTING the query additionally needs the
    ``protobuf`` Python package (Spark's state-server protocol between
    the JVM and the Python processor imports
    ``google.protobuf``; verified empirically — the driver-side state
    worker exits at init without it). The package is not installed in
    this container, so the operator is plan-constructed and
    schema-tested here and its end-to-end parity test is import-gated,
    the same pattern as the PIL/soundfile/neo4j seams.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    ttl_ms = idle_timeout_ms

    class _FunnelProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._times = handle.getValueState(
                "times", "times array<bigint>", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            got = self._times.get()
            times = list(got[0]) if got is not None else [-1] * k
            chunks = list(rows)
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            pdf = pdf.sort_values("ts")
            us_all = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            for us, et in zip(us_all, pdf["event_type"].to_numpy()):
                j = next((i for i in range(k) if times[i] == -1), None)
                if j is None:
                    break
                if et == steps[j] and (j == 0 or us > times[j - 1]):
                    times[j] = int(us)
            self._times.update((times,))
            depth = sum(1 for t in times if t != -1)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "depth": [depth],
                    "t_first": [times[0] if times[0] != -1 else None],
                    "t_depth": [times[depth - 1] if depth else None],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_FunnelProcessor(),
        outputStructType=FUNNEL_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )


def running_totals_tws(
    events: DataFrame, idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS
) -> DataFrame:
    """:func:`running_totals` on ``transformWithStateInPandas`` — the
    second custom stateful operator's successor-API twin, same contract:
    per-user running ``(count, sum(value))`` emitted every micro-batch
    the user appears in, idle keys evicted via native state TTL.

    Same environment notes as :func:`streaming_funnel_tws`: requires
    the RocksDB provider (:data:`ROCKSDB_PROVIDER`), and query START
    needs the ``protobuf`` package (plan construction does not)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ttl_ms = idle_timeout_ms

    class _TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState(
                "acc", _STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            got = self._acc.get()
            n, total = (int(got[0]), float(got[1])) if got is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._acc.update((n, total))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_TotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
