"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user counters with arbitrary state -- the extension point for
operators Structured Streaming's built-in aggregations can't express
(decaying counters, per-key ML state, CDC folding). State is a typed tuple
per group, timeouts bound its lifetime, and each micro-batch processes a
group's rows as one pandas DataFrame (Arrow-batched).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running (count, sum) per user, emitted every micro-batch.

    Use ``writeStream.outputMode('update')``. State never expires here
    (NoTimeout); production would pick ProcessingTime/EventTime timeout to
    bound state at 100 TB/day key cardinalities.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
