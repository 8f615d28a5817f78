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
    sessions = assign_sessions(df, gap_minutes, user_col, ts_col, order_tiebreak)
    return (
        sessions.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            # exact decimal sum: order-independent and engine-exact
            # (2-dp fixed-point data; a raw double sum wobbles in the
            # last ulp at scale -- the q01/q49 determinism rule)
            F.round(F.sum(F.col("value").cast("decimal(25,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
    )


def assign_sessions(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """EVENT-level sessionization: every input row plus its ``session_idx``
    (gap-based lag + conditional cumsum; the building block
    :func:`sessionize` aggregates over, exposed for session-scoped
    analytics -- funnels, paths, attribution WITHIN a session)."""
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
    return (
        with_gap.withColumn(
            "session_idx",
            F.sum("_new_session")
            .over(w.rowsBetween(W.unboundedPreceding, 0))
            .cast("long"),
        )
        .drop("_prev_ts", "_new_session")
    )


def session_funnel(
    df: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    gap_minutes: int = 30,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """WITHIN-session conversion: a session converts iff it contains a
    ``from_type`` event and a strictly-later ``to_type`` event in the
    SAME session -- the session-scoped funnel (day- or lifetime-scoped
    funnels over-credit conversions that span visits). Per user:
    session count, converting-session count, exact conversion ratio.

    Plan: event-level session assignment (one window), conditional mins
    per (user, session) in ONE aggregate -- the funnel legs never join
    -- then a per-user rollup. User-bounded intermediates throughout.
    """
    sessions = assign_sessions(
        df, gap_minutes, user_col=user_col, ts_col=ts_col
    )
    per_session = sessions.groupBy(user_col, "session_idx").agg(
        F.min(
            F.when(F.col(type_col) == from_type, F.unix_micros(F.col(ts_col)))
        ).alias("_t0"),
        F.min(
            F.when(F.col(type_col) == to_type, F.unix_micros(F.col(ts_col)))
        ).alias("_t1"),
    )
    converted = (
        F.col("_t0").isNotNull()
        & F.col("_t1").isNotNull()
        & (F.col("_t1") > F.col("_t0"))
    ).cast("long")
    return (
        per_session.groupBy(user_col)
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(converted).alias("n_converted"),
        )
        .withColumn(
            "conversion_rate",
            F.round(F.col("n_converted") / F.col("n_sessions"), 6),
        )
    )
