"""Sessionization over event streams (batch form).

Gap-based sessions: a new session starts when the inter-event gap within a
user exceeds ``gap``. Classic lag + conditional cumsum over a per-user
window -- single shuffle on user_id, no UDFs. The streaming twin
(``session_window`` with a watermark) lives in streaming/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign session indexes and aggregate per session.

    Output: (user_id, session_idx, n_events, session_start, session_end,
    total_value). Deterministic: events ordered by (ts, tiebreak).
    """
    w = W.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    gap_s = gap_minutes * 60
    # cast-to-double keeps sub-second precision (unix_timestamp truncates,
    # which would disagree with the oracle's epoch arithmetic on microsecond
    # timestamps)
    with_gap = df.withColumn("_prev_ts", F.lag(ts_col).over(w)).withColumn(
        "_new_session",
        F.when(
            F.col("_prev_ts").isNull()
            | (F.col(ts_col).cast("double") - F.col("_prev_ts").cast("double") > gap_s),
            1,
        ).otherwise(0),
    )
    sessions = with_gap.withColumn(
        "session_idx",
        F.sum("_new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    return (
        sessions.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
