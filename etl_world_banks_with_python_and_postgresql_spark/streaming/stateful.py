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


# --- gap-session enrichment with event-time state timeout -----------------

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double, closed boolean"
)
# epoch-millis bounds + running aggregates of the one open session per user
SESSION_STATE_SCHEMA = "start long, end long, n long, total double"


def session_enrichment(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom gap-sessionization with per-session enrichment and
    EVENT-TIME state timeout -- the shape ``session_window`` can't express
    (built-in session windows aggregate, they can't carry arbitrary state
    or emit both open-session progress AND closed-session records).

    Per user: events extend the open session while they arrive within
    ``gap_minutes`` of its end; a later event closes it (emitting the
    closed record) and opens a new one. When the watermark passes
    session_end + gap the state times out, the final closed record is
    emitted, and the key's state is freed -- so state size is O(active
    users), not O(all users ever), the property that matters at scale.

    Input must carry ``withWatermark`` on ``ts``; output in update mode.
    """
    gap_ms = gap_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(end, unit="ms")],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                    "closed": [True],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        out = []
        start = end = None
        n, total = 0, 0.0
        if state.exists:
            start, end, n, total = state.get
        for ts_ms, value in zip(
            (rows["ts"].astype("int64") // 1_000_000), rows["value"]
        ):
            ts_ms = int(ts_ms)
            if start is None:
                start, end, n, total = ts_ms, ts_ms, 1, float(value)
            elif ts_ms - end > gap_ms:
                out.append((start, end, n, total, True))  # close previous
                start, end, n, total = ts_ms, ts_ms, 1, float(value)
            else:
                end = max(end, ts_ms)
                n += 1
                total += float(value)
        state.update((start, end, n, total))
        # free the state once the watermark passes the gap horizon
        state.setTimeoutTimestamp(end + gap_ms)
        out.append((start, end, n, total, False))  # open-session progress
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out),
                "session_start": [pd.Timestamp(s, unit="ms") for s, *_ in out],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, *_ in out],
                "n_events": [n_ for _, _, n_, _, _ in out],
                "total_value": [round(t, 4) for _, _, _, t, _ in out],
                "closed": [c for *_, c in out],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- state-store observability --------------------------------------------


def state_metrics(query) -> list[dict]:
    """Per-stateful-operator state-store metrics for a StreamingQuery,
    aggregated over its ``recentProgress``.

    Surfaces the numbers that decide whether a stateful pipeline is
    scale-safe: ``rows_total`` (live state at last progress -- must plateau,
    not grow unboundedly), ``rows_removed`` (watermark/TTL evictions -- must
    be >0 on a healthy timeout config once the watermark advances) and
    ``rows_updated``. One dict per operator in plan order; memory is
    reported in bytes as Spark gives it.

    Works on any stateful query (windowed aggs, stream-stream joins,
    [flatMap|applyInPandas]WithState); an empty list means progress hasn't
    been reported yet.
    """
    ops: dict[int, dict] = {}
    for progress in query.recentProgress:
        for i, so in enumerate(progress.get("stateOperators", [])):
            agg = ops.setdefault(
                i,
                {
                    "operator": so.get("operatorName", f"op-{i}"),
                    "rows_total": 0,
                    "rows_removed": 0,
                    "rows_updated": 0,
                    "memory_bytes": 0,
                },
            )
            # totals are point-in-time gauges: keep the latest; removals /
            # updates are per-batch deltas: accumulate
            agg["rows_total"] = so.get("numRowsTotal", agg["rows_total"])
            agg["memory_bytes"] = so.get("memoryUsedBytes", agg["memory_bytes"])
            agg["rows_removed"] += so.get("numRowsRemoved", 0) or 0
            agg["rows_updated"] += so.get("numRowsUpdated", 0) or 0
    return [ops[i] for i in sorted(ops)]


# --- transformWithState (state API v2, Spark 4) ---------------------------

try:  # pragma: no cover - import surface depends on the environment:
    # the TWS Python worker needs protobuf for its state-server protocol
    # (absent -> the worker crashes at runtime, not at import), so gate on
    # BOTH the API and its wire dependency
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False


class RunningTotalsProcessor(StatefulProcessor):
    """State-API-v2 twin of ``running_user_totals``: per-key running
    (count, sum) in a typed ValueState variable, with optional
    store-managed TTL.

    What v2 buys over applyInPandasWithState at scale: named typed state
    variables (value/list/map) instead of one monolithic tuple, timers
    decoupled from state, and TTL enforced BY THE STATE STORE
    (``ttlDurationMs``) -- eviction happens even for keys that never
    receive another row, which is exactly the case the legacy API's
    timeout-on-next-event model handles awkwardly.
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._agg = handle.getValueState(
            "agg", "n long, total double", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timer_values):
        n, total = self._agg.get() or (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._agg.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    def close(self) -> None:
        pass


def running_user_totals_v2(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """``running_user_totals`` on the transformWithState API (Spark 4).

    Same output contract as the legacy version (update mode, one row per
    key per micro-batch); ``ttl_ms`` bounds state lifetime store-side.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(ttl_ms=ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
