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


def running_totals(
    events: DataFrame, idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS
) -> DataFrame:
    """Per-user running (count, sum) emitted every micro-batch the user
    appears in — state lives in the engine's state store, not the task.

    Keys idle for ``idle_timeout_ms`` of processing time are evicted
    (timeout branch in the state function), so state stays bounded on an
    unbounded key space.

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
