"""Time-series regularization: fixed-frequency resampling + forward fill.

The gap-filling shape every metrics/feature pipeline needs (the reference's
exchange-rates table is an implicit yearly time series -- SURVEY §1.1):
sparse observations -> dense per-key calendar -> carry the last observation
forward. Pure DataFrame ops with an exact DuckDB twin (IGNORE NULLS window).

Scale shape: one shuffle to aggregate observations into buckets, one
broadcast-able calendar explode (|keys| x |buckets| rows, generated -- never
scanned), one per-key window. No global window, no UDFs; partition count
follows the key hash, so 100 TB of events with millions of keys spreads
evenly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    start: str,
    end: str,
    unit: str = "day",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key ``unit``-frequency series over [start, end], forward-filled.

    Observations within a bucket collapse to their mean (rounded to 4 dp
    BEFORE the fill so carried values equal their source bucket's value
    bit-for-bit). Buckets before a key's first observation stay NULL --
    forward fill never invents history. ``is_observed`` distinguishes
    measured buckets from carried ones.

    Output: (key, bucket, value_ffill, is_observed).
    """
    daily = df.groupBy(
        F.col(key_col), F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(F.round(F.avg(value_col), 4).alias("observed"))
    cal = (
        df.select(key_col)
        .distinct()
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.lit(start).cast("timestamp"),
                    F.lit(end).cast("timestamp"),
                    F.expr(f"INTERVAL 1 {unit}"),
                )
            ).alias("bucket"),
        )
    )
    w = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return cal.join(daily, [key_col, "bucket"], "left").select(
        key_col,
        "bucket",
        F.last("observed", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("observed").isNotNull().alias("is_observed"),
    )
