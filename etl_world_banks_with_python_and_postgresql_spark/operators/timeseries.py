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


def mad_outliers(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "user_id",
    k: float = 3.5,
    keep_cols: tuple[str, ...] = ("event_id", "ts"),
) -> DataFrame:
    """Robust per-group outlier detection: flag rows where
    ``|x - median| / MAD > k`` (MAD = median absolute deviation).

    The robust twin of z-scoring (q46): median/MAD have a 50% breakdown
    point, so a burst of bad readings cannot drag the baseline the way
    it drags mean/stddev. Zero-MAD groups (>=50% identical values)
    flag nothing -- the deviation scale is undefined there, and the
    alternative (flagging every non-modal value) drowns the alert
    channel; callers wanting a floor can clamp the MAD upstream.

    Plan: two grouped EXACT percentile aggregates (deterministic
    interpolation, q53's cross-engine parity) with the per-group stats
    joined back -- both stat sides are |groups| rows (user-bounded, the
    z31/z32 scaling argument), so at scale they broadcast and the event
    stream is never shuffled beyond its own group aggregates. The
    robust_z ratio is division-only, rounded once: engine-exact.
    """
    v = F.col(value_col)
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    dev = df.join(med, group_col).withColumn("_adev", F.abs(v - F.col("_med")))
    mad = dev.groupBy(group_col).agg(F.percentile("_adev", F.lit(0.5)).alias("_mad"))
    return (
        dev.join(mad, group_col)
        .filter((F.col("_mad") > 0) & (F.col("_adev") / F.col("_mad") > F.lit(k)))
        .select(
            group_col,
            *keep_cols,
            v.alias(value_col),
            F.round(F.col("_med"), 6).alias("group_median"),
            F.round(F.col("_adev") / F.col("_mad"), 6).alias("robust_z"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average per group over irregularly sampled values:
    each observation holds until the next one (LOCF), so
    ``TWA = sum(value_i * dt_i) / sum(dt_i)`` with ``dt_i`` the seconds
    until the next observation -- the correct average for balances /
    gauges / positions sampled at uneven intervals, where a plain avg()
    over-weights bursty periods. Groups with a single observation (no
    interval) return that value.

    Determinism: dt is an exact integer MICROSECOND difference
    (unix_micros -- second-granularity truncation would silently
    misweight sub-second samples); the weighted sum is lifted to
    DECIMAL(25,6) (associative -- partition order cannot flip the last
    digit, the q01/q49 rule) with ONE final IEEE division and round.
    One lag window per group + one aggregate.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(ts_col, tiebreak_col)
    dt = (
        F.unix_micros(F.lead(ts_col).over(w))
        - F.unix_micros(F.col(ts_col))
    ).cast("long")
    weighted = df.select(
        F.col(group_col),
        F.col(value_col).alias("_v"),
        dt.alias("_dt"),
    )
    return (
        weighted.groupBy(group_col)
        .agg(
            F.sum(
                (F.col("_v") * F.col("_dt")).cast("decimal(25,6)")
            ).alias("_wsum"),
            F.sum("_dt").alias("_tsum"),
            F.count("*").alias("n_obs"),
            F.min("_v").alias("_first_v"),
        )
        .select(
            group_col,
            "n_obs",
            F.when(
                F.col("_tsum").isNull() | (F.col("_tsum") == 0),
                F.round(F.col("_first_v"), 6),
            )
            .otherwise(
                F.round(
                    F.col("_wsum").cast("double") / F.col("_tsum"), 6
                )
            )
            .alias("twa"),
        )
    )


def trend_slope(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group OLS trend: slope (units/day) and intercept of value
    regressed on time -- the drift detector for per-entity metrics
    (is this user's/sensor's level rising?).

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) over exact DECIMAL moments
    (x = epoch days as exact microsecond-derived rationals lifted to
    decimal, y = value): the sums are associative, so partition order
    cannot change a digit (q93's exact-moment rule), and the final
    quotient is one IEEE division. Groups with fewer than 2 distinct
    timestamps return NULL slope (undefined). One aggregate, map-side
    combinable; no window, no collect.
    """
    # x in days since epoch as ONE double division (identical IEEE op on
    # both engines), then the q93 exact-moment pattern: every sum input
    # is cast double -> DECIMAL (the q01-established parity cast), so the
    # sums are associative and partition-order-free. Decimal DIVISION is
    # deliberately avoided -- its result scale/precision rules differ
    # between engines (measured: 4e-5 intercept drift).
    # centered at 2024-01-01: uncentered epoch-day moments put ~1e30
    # values into n*sxx - sx^2, and the catastrophic cancellation
    # amplifies engine-specific last-ulp DECIMAL->double cast noise to
    # 1e-5 in the intercept (measured). Centered, x is O(days-of-data)
    # and the quotient is numerically clean on both engines.
    x = (F.unix_micros(F.col(ts_col)) - F.lit(1_704_067_200_000_000)) / F.lit(
        86_400_000_000.0
    )
    y = F.col(value_col).cast("double")
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(25,6)")).alias("sx"),
        F.sum(y.cast("decimal(25,6)")).alias("sy"),
        F.sum((x * y).cast("decimal(38,12)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,12)")).alias("sxx"),
        F.countDistinct(ts_col).alias("_nts"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return agg.select(
        group_col,
        "n",
        F.when(F.col("_nts") >= 2, F.round(slope, 6)).alias("slope_per_day"),
        # value the fit predicts at the 2024-01-01 centering origin
        F.when(F.col("_nts") >= 2, F.round(intercept, 6)).alias(
            "intercept_at_origin"
        ),
    )


def merge_intervals(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_col: str = "user_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per group (the
    islands-and-gaps pattern): summary per group of merged-interval
    count and total COVERED microseconds -- double-counting overlaps is
    the classic bug in naive duration sums (uptime, billing, activity
    coverage), and interval union is what fixes it.

    Plan: one window pass per group ordered by (start, tiebreak): an
    interval starts a new island iff its start exceeds the running max
    of all previous ends (cumulative-max window, exact integer micros);
    island ids are a running sum of those breaks; then one aggregate to
    island spans and one to group totals. No joins, no self-pairing --
    the O(n log n) shape, never the O(n^2) overlap join.
    """
    from pyspark.sql import Window as W

    base = df.select(
        group_col,
        F.unix_micros(F.col(start_col)).alias("_s"),
        F.unix_micros(F.col(end_col)).alias("_e"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    )
    order = [F.col("_s")] + ([F.col("_tb")] if tiebreak_col else [])
    w = W.partitionBy(group_col).orderBy(*order)
    prev_max_end = F.max("_e").over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    new_island = (
        prev_max_end.isNull() | (F.col("_s") > prev_max_end)
    ).cast("long")
    islands = (
        base.withColumn(
            "_island",
            F.sum(new_island).over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy(group_col, "_island")
        .agg(F.min("_s").alias("_is"), F.max("_e").alias("_ie"))
    )
    return (
        islands.groupBy(group_col)
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(F.col("_ie") - F.col("_is")).alias("covered_micros"),
        )
    )


def seasonal_decompose(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    period: int = 7,
    group_by: str | None = None,
    check_gaps: bool = False,
) -> DataFrame:
    """Classical additive seasonal decomposition of the DAILY series:
    ``value = trend + seasonal + residual`` with a centered
    ``period``-day moving-average trend and non-normalized seasonal
    means per day-of-cycle -- the moving-average variant of classical
    decomposition (the STL precursor), the baseline for monitoring
    weekly-cyclic metrics.

    Exactness discipline: per-row values lift to DECIMAL(25,6) BEFORE
    any sum (the z102 parity cast -- no round(double) anywhere, per the
    frozen exact-output lint), daily sums convert to BIGINT micros
    exactly, the trend keeps its windowed SUM exact and the seasonal
    keeps exact (sum, count) pairs; each presented double is ONE
    fixed-shape IEEE expression over those exact integers --
    bit-identical cross-engine by construction. Trend (and residual)
    are NULL on the ``period//2`` edge days (incomplete window,
    standard behavior); seasonal is estimated from complete-trend days
    only and assigned to every day. Day-of-cycle is
    ``days_since_epoch % period`` (pure integer arithmetic -- no
    engine-specific weekday numbering).

    EVEN periods use the standard centered 2x(period) double moving
    average (ADVICE r9: a plain ``-half..half`` window spans period+1
    rows when period is even, which both mis-centers the trend and --
    with the old ``count == period`` completeness test -- marked ONLY
    truncated edge windows complete): trend over period+1 rows with
    half weight on the two edge rows, kept exact as
    ``2*sum - first - last`` scaled by ``2*period``. Odd periods keep
    the plain ``period``-row window scaled by ``period``.

    GAP CONTRACT: the moving average is ROWS-based over the daily
    rows, so a missing calendar day makes its neighbors adjacent --
    the trend silently spans the gap. The operator assumes a gap-free
    daily series (densify upstream with :func:`resample_ffill`);
    pass ``check_gaps=True`` to verify that per series with one
    bounded aggregate and raise ``ValueError`` naming the offending
    groups if days are missing.

    Scale shape: one shuffle to the (group?, day) axis
    (calendar-bounded per series, never event-bounded). With
    ``group_by`` the moving-average window partitions on the series key
    -- millions of independent series spread by the group hash, the
    per-metric production shape. Ungrouped, the ordered window is
    global over the DAY rows, bounded by the calendar exactly like
    ``resample_ffill``'s buckets, which is why it is lint-whitelisted;
    the dow aggregate is period-bounded either way.
    """
    half = period // 2
    even = period % 2 == 0
    # scale: trend = tsum_scaled / scale exactly; detrended values and
    # seasonal sums carry the same scale so no intermediate division
    # (or rounding) ever happens on a double.
    scale = 2 * period if even else period
    keys = [group_by] if group_by else []
    daily = (
        df.select(
            *keys,
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(value_col).cast("decimal(25,6)").alias("_vd"),
        )
        .groupBy(*keys, "day")
        .agg(
            (F.sum("_vd") * F.lit(1_000_000))
            .cast("long")
            .alias("value_micros")
        )
        .withColumn(
            "_dow",
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            % period,
        )
    )
    if check_gaps:
        gaps = (
            daily.groupBy(*keys)
            .agg(
                (
                    F.datediff(F.max("day"), F.min("day")) + 1
                    - F.count("*")
                ).alias("_missing")
            )
            .filter(F.col("_missing") > 0)
        )
        bad = gaps.limit(20).collect()  # bounded: one row per gappy series
        if bad:
            raise ValueError(
                "seasonal_decompose: daily series has calendar gaps "
                "(rows-based moving average would span them); densify "
                "with resample_ffill first. Offending series (first "
                f"{len(bad)}): "
                + ", ".join(
                    f"{tuple(r[k] for k in keys) if keys else 'series'}"
                    f" missing {r['_missing']} day(s)"
                    for r in bad
                )
            )
    # grouped: per-series partitioned window (the scale path -- millions
    # of series spread by the group hash); ungrouped: the whitelisted
    # calendar-bounded global window
    wbase = W.partitionBy(group_by) if group_by else W.partitionBy()
    w = wbase.orderBy("day").rowsBetween(-half, half)
    wrow = wbase.orderBy("day")
    n_window = period + 1 if even else period
    t = daily.select(
        *keys, "day", "_dow", "value_micros",
        F.sum("value_micros").over(w).alias("_wsum"),
        F.count("*").over(w).alias("_tn"),
        *(
            [
                F.lag("value_micros", half).over(wrow).alias("_first"),
                F.lead("value_micros", half).over(wrow).alias("_last"),
            ]
            if even
            else []
        ),
    )
    # _tsum = scale * trend, exactly. Odd: plain window sum (window IS
    # period rows). Even: 2*(period+1 row sum) - first - last = the
    # 2x(period) double-MA numerator over 2*period.
    tsum_expr = (
        F.lit(2) * F.col("_wsum") - F.col("_first") - F.col("_last")
        if even
        else F.col("_wsum")
    )
    t = t.withColumn(
        "_tsum", F.when(F.col("_tn") == n_window, tsum_expr)
    ).drop("_wsum", *(["_first", "_last"] if even else []))
    # detrended, scaled by `scale` to stay integer: scale*v - trend_sum
    t = t.withColumn(
        "_detr",
        F.lit(scale) * F.col("value_micros") - F.col("_tsum"),
    )
    s = (
        t.filter(F.col("_detr").isNotNull())
        .groupBy(*keys, "_dow")
        .agg(
            F.sum("_detr").alias("_ssum"),
            F.count("*").alias("_sn"),
        )
    )
    out = t.join(F.broadcast(s), [*keys, "_dow"], "left")
    trend = F.col("_tsum").cast("double") / F.lit(float(scale))
    seasonal = F.col("_ssum").cast("double") / (
        (F.col("_sn") * scale).cast("double")
    )
    value_dbl = F.col("value_micros").cast("double")
    return out.select(
        *keys,
        "day",
        "value_micros",
        (trend / F.lit(1_000_000.0)).alias("trend"),
        (seasonal / F.lit(1_000_000.0)).alias("seasonal"),
        (
            (value_dbl - trend - seasonal) / F.lit(1_000_000.0)
        ).alias("residual"),
    )


def seasonal_decompose_oracle_sql(
    value_sql: str = "value",
    ts_sql: str = "ts",
    period: int = 7,
    table: str = "events",
    group_by: str | None = None,
) -> str:
    """DuckDB twin of :func:`seasonal_decompose` -- the identical
    integer aggregates and the identical one-shot IEEE presentation
    expressions, so results are bit-exact. Supports the even-period
    2x(period) double-MA and the per-series ``group_by`` variant."""
    half = period // 2
    even = period % 2 == 0
    scale = 2 * period if even else period
    n_window = period + 1 if even else period
    g = f"{group_by}, " if group_by else ""
    gpart = f"PARTITION BY {group_by} " if group_by else ""
    if even:
        tsum = (
            f"CASE WHEN count(*) OVER w = {n_window}\n"
            f"              THEN 2 * (sum(value_micros) OVER w)\n"
            f"                   - lag(value_micros, {half}) OVER wr\n"
            f"                   - lead(value_micros, {half}) OVER wr"
            " END AS tsum"
        )
        windows = (
            f"WINDOW w AS ({gpart}ORDER BY day ROWS BETWEEN {half} "
            f"PRECEDING AND {half} FOLLOWING),\n"
            f"         wr AS ({gpart}ORDER BY day)"
        )
    else:
        tsum = (
            f"CASE WHEN count(*) OVER w = {n_window}\n"
            "              THEN sum(value_micros) OVER w END AS tsum"
        )
        windows = (
            f"WINDOW w AS ({gpart}ORDER BY day ROWS BETWEEN {half} "
            f"PRECEDING AND {half} FOLLOWING)"
        )
    return f"""
WITH daily AS (
  SELECT {g}({ts_sql})::DATE AS day,
         (sum(CAST({value_sql} AS DECIMAL(25,6))) * 1000000)::BIGINT
           AS value_micros
  FROM {table} GROUP BY ALL),
d2 AS (
  SELECT {g}day, value_micros,
         (day - DATE '1970-01-01') % {period} AS dow
  FROM daily),
t AS (
  SELECT {g}day, dow, value_micros,
         {tsum}
  FROM d2
  {windows}),
td AS (
  SELECT *, {scale} * value_micros - tsum AS detr FROM t),
s AS (
  SELECT {g}dow, sum(detr) AS ssum, count(*) AS sn
  FROM td WHERE detr IS NOT NULL GROUP BY ALL)
SELECT {g}day, value_micros,
       (tsum::DOUBLE / {float(scale)!r}) / 1000000.0 AS trend,
       (ssum::DOUBLE / ((sn * {scale})::DOUBLE)) / 1000000.0 AS seasonal,
       (value_micros::DOUBLE
        - tsum::DOUBLE / {float(scale)!r}
        - ssum::DOUBLE / ((sn * {scale})::DOUBLE)) / 1000000.0 AS residual
FROM td LEFT JOIN s USING ({g}dow)
"""


def acf(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    max_lag: int = 5,
    group_by: str | None = None,
) -> DataFrame:
    """Sample autocorrelation of the daily value series at lags
    1..max_lag, in EXACT integer arithmetic end to end -- the
    seasonality/memory diagnostic read before picking
    :func:`seasonal_decompose`'s period or trusting a drift monitor's
    independence assumption.

    Exactness: daily sums lift to BIGINT micros (the z111 discipline),
    and the classic r_k = sum((x_t - mean)(x_{t+k} - mean)) /
    sum((x_t - mean)^2) is cleared of the rational mean by multiplying
    num and den by n^2: dev_t = n*x_t - S is an exact BIGINT, each
    product lifts its factors to DECIMAL(19,0) BEFORE multiplying (the
    embedding_moments overflow lesson), and the final ratio presents as
    sign-aware HALF_UP integer micros -- no float accumulation, no
    round(double), bit-identical cross-engine. A constant series
    (den = 0) yields NULL acf.

    Plan shape: one shuffle to the (group?, day) axis (calendar-bounded
    per series, never event-bounded), ``max_lag`` lag columns from ONE
    ordered window over the daily rows (partitioned on the series key
    when grouped), one aggregate, then a bounded per-lag explode of the
    |groups| x max_lag result.
    """
    from ..functions.exactnum import floordiv_nonneg

    keys = [group_by] if group_by else []
    day = F.to_date(F.col(ts_col))
    daily = (
        df.groupBy(*keys, day.alias("day"))
        .agg(
            (F.sum(F.col(value_col).cast("decimal(25,6)")) * 1_000_000)
            .cast("long")
            .alias("x")
        )
    )
    w_stats = W.partitionBy(*keys) if group_by else W.partitionBy()
    # n and S are per-series constants; a window over the day-bounded
    # series table avoids a second shuffle (|days| rows per series)
    stats = daily.select(
        *keys,
        "day",
        "x",
        F.count(F.lit(1)).over(w_stats).alias("_n"),
        F.sum("x").over(w_stats).alias("_s"),
    )
    dev = stats.withColumn("_dev", F.col("_n") * F.col("x") - F.col("_s"))
    w_ord = (
        W.partitionBy(*keys).orderBy("day") if group_by else W.orderBy("day")
    )
    lag_cols = [
        F.lag("_dev", k).over(w_ord).alias(f"_dev_l{k}")
        for k in range(1, max_lag + 1)
    ]
    lagged = dev.select(*keys, "_n", "_dev", *lag_cols)
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    aggd = lagged.groupBy(*keys).agg(
        F.max("_n").alias("n_days"),
        F.sum(d19(F.col("_dev")) * d19(F.col("_dev"))).alias("_den"),
        *[
            F.sum(d19(F.col("_dev")) * d19(F.col(f"_dev_l{k}"))).alias(
                f"_num{k}"
            )
            for k in range(1, max_lag + 1)
        ],
    )
    per_lag = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"), F.col(f"_num{k}").alias("num")
                )
                for k in range(1, max_lag + 1)
            ]
        )
    ).alias("l")
    ex = aggd.select(*keys, "n_days", F.col("_den").alias("den"), per_lag)
    sign = F.when(F.col("l.num") < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    mag = floordiv_nonneg(
        F.lit(2_000_000).cast("decimal(38,0)") * F.abs(F.col("l.num"))
        + F.col("den"),
        F.lit(2).cast("decimal(38,0)") * F.col("den"),
    )
    return ex.select(
        *keys,
        F.col("l.lag").alias("lag"),
        F.col("n_days").cast("int").alias("n_days"),
        F.when(F.col("den") > 0, sign * mag).alias("acf_micros"),
    )


def acf_oracle_sql(
    value_sql: str = "value",
    ts_sql: str = "ts",
    max_lag: int = 5,
    table: str = "events",
    group_by: str = "event_type",
) -> str:
    """DuckDB twin of :func:`acf`: identical daily micros, identical
    n^2-cleared integer devs, identical sign-aware HALF_UP micros."""
    lags = ", ".join(
        f"lag(dev, {k}) OVER ({ 'PARTITION BY ' + group_by + ' ' if group_by else ''}ORDER BY day) AS dev_l{k}"
        for k in range(1, max_lag + 1)
    )
    nums = ", ".join(
        f"sum(dev::HUGEINT * dev_l{k}::HUGEINT) AS num{k}"
        for k in range(1, max_lag + 1)
    )
    lag_rows = " UNION ALL ".join(
        f"SELECT {group_by}, n_days, den, {k} AS lag, num{k} AS num FROM aggd"
        for k in range(1, max_lag + 1)
    )
    return f"""
WITH daily AS (
  SELECT {group_by}, ({ts_sql})::DATE AS day,
         (sum(CAST({value_sql} AS DECIMAL(25,6))) * 1000000)::BIGINT AS x
  FROM {table} GROUP BY ALL),
stats AS (
  SELECT {group_by}, day, x,
         count(*) OVER (PARTITION BY {group_by}) AS n,
         sum(x) OVER (PARTITION BY {group_by}) AS s
  FROM daily),
dev AS (
  SELECT {group_by}, day, n, (n * x - s)::BIGINT AS dev FROM stats),
lagged AS (
  SELECT {group_by}, n, dev, {lags} FROM dev),
aggd AS (
  SELECT {group_by}, max(n)::INT AS n_days,
         sum(dev::HUGEINT * dev::HUGEINT) AS den,
         {nums}
  FROM lagged GROUP BY {group_by}),
ex AS ({lag_rows})
SELECT {group_by}, lag, n_days,
       CASE WHEN den > 0 THEN
         (CASE WHEN num < 0 THEN -1 ELSE 1 END)::BIGINT
         * ((2000000::HUGEINT * abs(num) + den) // (2::HUGEINT * den))::BIGINT
       END AS acf_micros
FROM ex
"""


def cusum_changepoint(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_by: str | None = None,
) -> DataFrame:
    """Single most-likely level-shift changepoint of the daily value
    series (max-CUSUM): the day t maximizing |prefix_t - t * mean| --
    the monitoring primitive that turns "the metric drifted" into
    "the metric drifted HERE", run after :func:`acf` says the series
    has structure worth localizing.

    Exactness: daily sums are BIGINT micros (z111 discipline) and the
    rational mean is cleared by n: D_t = |n * P_t - t * S| with P_t the
    prefix sum -- every quantity an exact integer, factors lifted to
    DECIMAL(38,0) before the multiply so century-long series of
    petabyte-scale daily sums cannot wrap. Ties break on the earliest
    day. Output (group?, n_days, cp_index, cp_day, dev) where dev is
    the raw DECIMAL(38,0) statistic (units: micros x days; relative
    comparisons only, by design -- normalizing would reintroduce a
    float).

    Plan: one shuffle to the calendar-bounded day axis; prefix sum +
    rank from per-series ordered windows; the argmax is a rank-1 filter.
    """
    keys = [group_by] if group_by else []
    day = F.to_date(F.col(ts_col))
    daily = df.groupBy(*keys, day.alias("day")).agg(
        (F.sum(F.col(value_col).cast("decimal(25,6)")) * 1_000_000)
        .cast("long")
        .alias("x")
    )
    w_stats = W.partitionBy(*keys) if group_by else W.partitionBy()
    w_ord = (
        W.partitionBy(*keys).orderBy("day") if group_by else W.orderBy("day")
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = daily.select(
        *keys,
        "day",
        F.count(F.lit(1)).over(w_stats).alias("_n"),
        F.sum("x").over(w_stats).alias("_s"),
        F.sum("x")
        .over(w_ord.rowsBetween(W.unboundedPreceding, 0))
        .alias("_p"),
        F.row_number().over(w_ord).alias("_t"),
    ).select(
        *keys,
        "day",
        "_n",
        "_t",
        F.abs(
            d38(F.col("_n")) * d38(F.col("_p"))
            - d38(F.col("_t")) * d38(F.col("_s"))
        ).alias("_d"),
    )
    w_pick = (
        W.partitionBy(*keys).orderBy(F.desc("_d"), F.asc("day"))
        if group_by
        else W.orderBy(F.desc("_d"), F.asc("day"))
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            F.col("_n").cast("int").alias("n_days"),
            F.col("_t").cast("int").alias("cp_index"),
            F.col("day").alias("cp_day"),
            F.col("_d").alias("dev"),
        )
    )


def cusum_oracle_sql(
    value_sql: str = "value",
    ts_sql: str = "ts",
    table: str = "events",
    group_by: str = "event_type",
) -> str:
    """DuckDB twin of :func:`cusum_changepoint` (grouped form)."""
    return f"""
WITH daily AS (
  SELECT {group_by}, ({ts_sql})::DATE AS day,
         (sum(CAST({value_sql} AS DECIMAL(25,6))) * 1000000)::BIGINT AS x
  FROM {table} GROUP BY ALL),
scored AS (
  SELECT {group_by}, day,
         count(*) OVER (PARTITION BY {group_by}) AS n,
         sum(x) OVER (PARTITION BY {group_by}) AS s,
         sum(x) OVER (PARTITION BY {group_by} ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS p,
         row_number() OVER (PARTITION BY {group_by} ORDER BY day) AS t
  FROM daily),
dev AS (
  SELECT {group_by}, day, n, t,
         abs(n::HUGEINT * p::HUGEINT - t::HUGEINT * s::HUGEINT)
           ::DECIMAL(38,0) AS d
  FROM scored),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY {group_by}
                               ORDER BY d DESC, day) AS rn
  FROM dev)
SELECT {group_by}, n::INT AS n_days, t::INT AS cp_index, day AS cp_day,
       d AS dev
FROM pick WHERE rn = 1
"""


def holt_forecast(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_by: str = "event_type",
    alpha_ppm: int = 300_000,
    beta_ppm: int = 100_000,
    horizon: int = 3,
) -> DataFrame:
    """Holt linear-trend exponential smoothing per series, in EXACT
    integer micros -- the capacity-planning / metric-forecasting
    primitive (level + trend, h-step-ahead forecasts):

        l_t = HALF_UP(alpha*y_t + (1-alpha)*(l_{t-1} + b_{t-1}))
        b_t = HALF_UP(beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1})
        fc_h = l_n + h * b_n

    with alpha/beta in ppm, y the daily BIGINT-micros series (same
    prep as :func:`acf`), l_1 = y_1 and b_1 = 0. Every step is one
    sign-aware HALF_UP integer division, so the whole recurrence is
    bit-reproducible and the DuckDB recursive-CTE twin
    (:func:`holt_oracle_sql`) replays it exactly.

    The recurrence is inherently sequential PER SERIES (each state
    depends on the previous step's ROUNDED state -- a closed-form
    rewrite would round differently), so this is the sanctioned
    custom-stateful path: one Arrow-batched ``applyInPandas`` over the
    calendar-bounded daily rows, arbitrary-precision Python ints inside
    (no int64 overflow cliff), after ONE shuffle to the (series, day)
    axis. Series count bounds parallelism; each group is |days| rows,
    never |events|.
    """
    M = 1_000_000
    if not (0 < alpha_ppm < M and 0 <= beta_ppm < M):
        raise ValueError("holt_forecast: smoothing params must be ppm in (0, 1e6)")
    day = F.to_date(F.col(ts_col))
    daily = df.groupBy(group_by, day.alias("day")).agg(
        (F.sum(F.col(value_col).cast("decimal(25,6)")) * M)
        .cast("long")
        .alias("x")
    )
    fc_cols = ", ".join(f"fc{h}_micros long" for h in range(1, horizon + 1))
    schema = (
        f"{group_by} string, n_days int, level_micros long, "
        f"trend_micros long, {fc_cols}"
    )

    def hu(a: int, den: int) -> int:
        s = 1 if a >= 0 else -1
        return s * ((2 * abs(a) + den) // (2 * den))

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values("day")
        ys = [int(v) for v in pdf["x"]]
        lev, b = ys[0], 0
        for y in ys[1:]:
            lev_new = hu(alpha_ppm * y + (M - alpha_ppm) * (lev + b), M)
            b = hu(beta_ppm * (lev_new - lev) + (M - beta_ppm) * b, M)
            lev = lev_new
        row = {
            group_by: pdf[group_by].iloc[0],
            "n_days": len(ys),
            "level_micros": lev,
            "trend_micros": b,
        }
        for h in range(1, horizon + 1):
            row[f"fc{h}_micros"] = lev + h * b
        return pd.DataFrame([row])

    return daily.groupBy(group_by).applyInPandas(fit, schema)


def holt_oracle_sql(
    value_sql: str = "value",
    ts_sql: str = "ts",
    table: str = "events",
    group_by: str = "event_type",
    alpha_ppm: int = 300_000,
    beta_ppm: int = 100_000,
    horizon: int = 3,
) -> str:
    """DuckDB twin of :func:`holt_forecast`: the sequential recurrence
    as a recursive CTE stepping one day per iteration, HUGEINT state,
    the same sign-aware HALF_UP -- bit-identical by construction."""
    M = 1_000_000
    g = group_by

    def hu(a: str) -> str:
        return (
            f"(CASE WHEN ({a}) >= 0 THEN ((2*({a}) + {M}) // {2 * M})"
            f" ELSE -((2*(-({a})) + {M}) // {2 * M}) END)"
        )

    l_new = hu(f"{alpha_ppm}::HUGEINT * o.x + {M - alpha_ppm}::HUGEINT * (r.l + r.b)")
    b_new = hu(f"{beta_ppm}::HUGEINT * (({l_new}) - r.l) + {M - beta_ppm}::HUGEINT * r.b")
    fc_sel = ", ".join(
        f"(l + {h} * b)::BIGINT AS fc{h}_micros" for h in range(1, horizon + 1)
    )
    return f"""
WITH RECURSIVE daily AS (
  SELECT {g}, ({ts_sql})::DATE AS day,
         (sum(CAST({value_sql} AS DECIMAL(25,6))) * {M})::BIGINT AS x
  FROM {table} GROUP BY ALL),
ordered AS (
  SELECT {g}, x,
         row_number() OVER (PARTITION BY {g} ORDER BY day) AS rn
  FROM daily),
counts AS (SELECT {g}, count(*)::INT AS n_days FROM daily GROUP BY {g}),
rec AS (
  SELECT {g}, 1 AS t, x::HUGEINT AS l, 0::HUGEINT AS b
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.{g}, r.t + 1, {l_new} AS l, {b_new} AS b
  FROM rec r JOIN ordered o ON o.{g} = r.{g} AND o.rn = r.t + 1),
final AS (
  SELECT r.{g}, c.n_days, r.l, r.b
  FROM rec r JOIN counts c ON c.{g} = r.{g} AND r.t = c.n_days)
SELECT {g}, n_days, l::BIGINT AS level_micros, b::BIGINT AS trend_micros,
       {fc_sel}
FROM final
"""


def theil_sen_slope(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_by: str = "event_type",
) -> DataFrame:
    """Theil-Sen robust trend estimator per series: the LOWER MEDIAN of
    all pairwise daily slopes -- the outlier-immune complement to z56's
    least-squares slope (a single corrupted day can move OLS
    arbitrarily; Theil-Sen tolerates ~29% contamination).

    Exactness: daily BIGINT micros (the acf prep), each pairwise slope
    one sign-aware HALF_UP integer-micros division (slopes are
    quantized to micros/day BEFORE ranking -- exact-rational median
    would need cross-multiplied comparisons; the quantization is the
    documented contract), median by the z87 nearest-rank rule
    (rank = ceil(m/2)) over an integer column.

    Scale: pairs are O(|days|^2 / 2) PER SERIES -- day-axis-bounded
    (~250k pairs for a 2-year daily series), never event-bounded; the
    rank window is partitioned per series over those bounded pairs.
    The self-join and window shuffle on the series key only.
    """
    from ..functions.exactnum import floordiv_nonneg

    day = F.to_date(F.col(ts_col))
    daily = df.groupBy(group_by, day.alias("day")).agg(
        (F.sum(F.col(value_col).cast("decimal(25,6)")) * 1_000_000)
        .cast("long")
        .alias("x")
    )
    daily = daily.select(
        group_by,
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("t"),
        "x",
    )
    a = daily.select(
        group_by, F.col("t").alias("ta"), F.col("x").alias("xa")
    )
    b = daily.select(
        group_by, F.col("t").alias("tb"), F.col("x").alias("xb")
    )
    num = F.col("xb") - F.col("xa")
    den = F.col("tb") - F.col("ta")
    sign = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    # num is ALREADY a micros delta, so num/den IS the slope in
    # micros/day -- one sign-aware HALF_UP division, no extra scaling
    slope = sign * floordiv_nonneg(
        F.lit(2) * F.abs(num) + den, F.lit(2) * den
    )
    pairs = (
        a.join(b, group_by)
        .filter(F.col("ta") < F.col("tb"))
        .select(group_by, slope.alias("slope_micros"))
    )
    w = W.partitionBy(group_by).orderBy("slope_micros")
    wn = W.partitionBy(group_by)
    ranked = pairs.select(
        group_by,
        "slope_micros",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_m"),
    )
    return ranked.filter(
        F.col("_rn") == F.expr("(500000 * _m + 999999) div 1000000")
    ).select(
        group_by,
        F.col("_m").alias("n_pairs"),
        F.col("slope_micros").alias("slope_micros_per_day"),
    )


def theil_sen_oracle_sql(
    value_sql: str = "value",
    ts_sql: str = "ts",
    table: str = "events",
    group_by: str = "event_type",
) -> str:
    """DuckDB twin of :func:`theil_sen_slope` (same daily micros, same
    HALF_UP slope quantization, same nearest-rank median)."""
    g = group_by
    return f"""
WITH daily AS (
  SELECT {g}, ({ts_sql})::DATE AS day,
         (sum(CAST({value_sql} AS DECIMAL(25,6))) * 1000000)::BIGINT AS x
  FROM {table} GROUP BY ALL),
idx AS (SELECT {g}, (day - DATE '1970-01-01')::BIGINT AS t, x FROM daily),
pairs AS (
  SELECT a.{g},
         (CASE WHEN b.x - a.x < 0 THEN -1 ELSE 1 END)::BIGINT
         * ((2 * abs(b.x - a.x) + (b.t - a.t))
            // (2 * (b.t - a.t))) AS slope_micros
  FROM idx a JOIN idx b ON a.{g} = b.{g} AND a.t < b.t),
ranked AS (
  SELECT {g}, slope_micros,
         row_number() OVER (PARTITION BY {g} ORDER BY slope_micros) AS rn,
         count(*) OVER (PARTITION BY {g}) AS m
  FROM pairs)
SELECT {g}, m::BIGINT AS n_pairs, slope_micros AS slope_micros_per_day
FROM ranked WHERE rn = (500000 * m + 999999) // 1000000
"""


def rolling_quantiles(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_by: str = "event_type",
    window_days: int = 7,
    qs: "tuple[int, ...]" = (500_000, 950_000),
) -> DataFrame:
    """Trailing-window quantiles of the daily series (p50/p95 over the
    last ``window_days`` days, per series per day) -- the SLO/alerting
    baseline read next to a drift monitor.

    Exact: daily BIGINT micros, nearest-rank (the z87 rule,
    rank = ceil(q*m)) over the IN-ROW sorted trailing values. One
    partitioned RANGE-frame window collects the <= window_days trailing
    dailies per anchor day (array_sort makes collect_list's
    nondeterministic order irrelevant), so there is NO self-join and no
    per-anchor explode -- the frame is calendar-bounded, the shuffle is
    the one (series, day) exchange the daily aggregate already needs.
    """
    from ..functions.exactnum import floordiv_nonneg

    day = F.to_date(F.col(ts_col))
    daily = df.groupBy(group_by, day.alias("day")).agg(
        (F.sum(F.col(value_col).cast("decimal(25,6)")) * 1_000_000)
        .cast("long")
        .alias("x")
    )
    t = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).cast(
        "long"
    )
    w = (
        W.partitionBy(group_by)
        .orderBy(t)
        .rangeBetween(-(window_days - 1), 0)
    )
    vals = F.array_sort(F.collect_list("x").over(w))
    staged = daily.select(
        group_by, "day", vals.alias("_vals")
    )
    m = F.size(F.col("_vals")).cast("long")
    cols = [
        F.element_at(
            F.col("_vals"),
            floordiv_nonneg(
                F.lit(q) * m + F.lit(999_999), F.lit(1_000_000)
            ).cast("int"),
        ).alias(f"p{q // 10000}_micros")
        for q in qs
    ]
    return staged.select(
        group_by, "day", m.alias("n_days_in_window"), *cols
    )


def rolling_quantiles_oracle_sql(
    value_sql: str = "value",
    ts_sql: str = "ts",
    table: str = "events",
    group_by: str = "event_type",
    window_days: int = 7,
    qs: "tuple[int, ...]" = (500_000, 950_000),
) -> str:
    """DuckDB twin of :func:`rolling_quantiles` (same daily micros,
    same in-frame nearest-rank)."""
    g = group_by
    q_cols = ", ".join(
        f"vals[((({q}::BIGINT * len(vals) + 999999) // 1000000))::INT]"
        f" AS p{q // 10000}_micros"
        for q in qs
    )
    return f"""
WITH daily AS (
  SELECT {g}, ({ts_sql})::DATE AS day,
         (sum(CAST({value_sql} AS DECIMAL(25,6))) * 1000000)::BIGINT AS x
  FROM {table} GROUP BY ALL),
framed AS (
  SELECT {g}, day,
         list_sort(list(x) OVER (
           PARTITION BY {g} ORDER BY (day - DATE '1970-01-01')
           RANGE BETWEEN {window_days - 1} PRECEDING AND CURRENT ROW)) AS vals
  FROM daily)
SELECT {g}, day, len(vals)::BIGINT AS n_days_in_window, {q_cols}
FROM framed
"""


def series_correlation(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_by: str = "event_type",
) -> DataFrame:
    """Pairwise Pearson correlation of the daily value series across
    series keys -- the metric-relationship matrix (which signals move
    together) read before building composite monitors -- EXACT end to
    end: no sqrt, no float accumulation.

    The trick: r^2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2))
    is a RATIO OF EXACT INTEGERS, so the output is sign(num) *
    HALF_UP-micros(num^2 / (d1*d2)) -- |r| and the sign carry all the
    information r does, and every engine reproduces the bits. Daily
    sums are HALF_UP-quantized to integer UNITS first: num^2 must fit
    DECIMAL(38,0), which bounds |daily| * days at ~1e12 -- rescale
    ``value_col`` upstream for wilder magnitudes (documented envelope;
    micros quantization would overflow at exactly the corpus sizes
    this runs on).

    Plan: one daily aggregate, one day-keyed equi-self-join (pairs are
    |keys|^2-bounded per day), one pair-keyed aggregate over the
    joint day axis. Constant series (d = 0) yield NULL.
    """
    from ..functions.exactnum import floordiv_nonneg

    day = F.to_date(F.col(ts_col))
    dec = F.sum(F.col(value_col).cast("decimal(25,6)"))
    # HALF_UP to integer units via micros-lifted floordiv (sign-aware)
    micros = (dec * 1_000_000).cast("long")
    sign_d = F.when(micros < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    daily = df.groupBy(group_by, day.alias("day")).agg(
        (
            sign_d
            * floordiv_nonneg(
                F.lit(2) * F.abs(micros) + F.lit(1_000_000),
                F.lit(2_000_000),
            )
        ).alias("x")
    )
    a = daily.select(
        F.col(group_by).alias("key_a"), "day", F.col("x").alias("xa")
    )
    b = daily.select(
        F.col(group_by).alias("key_b"), "day", F.col("x").alias("xb")
    )
    joined = a.join(b, "day").filter(F.col("key_a") < F.col("key_b"))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = joined.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d38(F.col("xa"))).alias("sx"),
        F.sum(d38(F.col("xb"))).alias("sy"),
        F.sum(d38(F.col("xa")) * d38(F.col("xb"))).alias("sxy"),
        F.sum(d38(F.col("xa")) * d38(F.col("xa"))).alias("sxx"),
        F.sum(d38(F.col("xb")) * d38(F.col("xb"))).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    sign = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    r2 = floordiv_nonneg(
        F.lit(2_000_000).cast("decimal(38,0)") * num * num + d1 * d2,
        F.lit(2).cast("decimal(38,0)") * d1 * d2,
    )
    return agg.select(
        "key_a",
        "key_b",
        F.col("n").cast("long").alias("n_days"),
        F.when((d1 > 0) & (d2 > 0), sign * r2).alias("signed_r2_micros"),
    )


def series_correlation_oracle_sql(
    value_sql: str = "value",
    ts_sql: str = "ts",
    table: str = "events",
    group_by: str = "event_type",
) -> str:
    """DuckDB twin of :func:`series_correlation` (HUGEINT-exact)."""
    g = group_by
    return f"""
WITH daily AS (
  SELECT {g} AS key, ({ts_sql})::DATE AS day,
         (CASE WHEN (sum(CAST({value_sql} AS DECIMAL(25,6))) * 1000000)::BIGINT < 0
               THEN -1 ELSE 1 END)::BIGINT
         * ((2 * abs((sum(CAST({value_sql} AS DECIMAL(25,6))) * 1000000)::BIGINT)
             + 1000000) // 2000000) AS x
  FROM {table} GROUP BY ALL),
joined AS (
  SELECT a.key AS key_a, b.key AS key_b, a.x AS xa, b.x AS xb
  FROM daily a JOIN daily b ON a.day = b.day AND a.key < b.key),
agg AS (
  SELECT key_a, key_b, count(*)::HUGEINT AS n,
         sum(xa::HUGEINT) AS sx, sum(xb::HUGEINT) AS sy,
         sum(xa::HUGEINT * xb::HUGEINT) AS sxy,
         sum(xa::HUGEINT * xa::HUGEINT) AS sxx,
         sum(xb::HUGEINT * xb::HUGEINT) AS syy
  FROM joined GROUP BY 1, 2)
SELECT key_a, key_b, n::BIGINT AS n_days,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
         (CASE WHEN (n * sxy - sx * sy) < 0 THEN -1 ELSE 1 END)::BIGINT
         * ((2000000::HUGEINT * (n * sxy - sx * sy) * (n * sxy - sx * sy)
             + (n * sxx - sx * sx) * (n * syy - sy * sy))
            // (2::HUGEINT * (n * sxx - sx * sx) * (n * syy - sy * sy)))::BIGINT
       END AS signed_r2_micros
FROM agg
"""


def seasonal_anomalies(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    period: int = 7,
    group_by: str = "event_type",
    k_num: int = 5,
    k_den: int = 2,
) -> DataFrame:
    """Seasonality-adjusted anomaly detection: decompose the daily
    series (:func:`seasonal_decompose`), then flag days whose RESIDUAL
    deviates from the series' residual median by more than
    ``k_num/k_den`` MADs -- the monitoring composition that stops a
    weekly-cyclic metric from paging every weekend (a raw z-score
    flags the cycle itself; the residual has the cycle removed).

    Determinism: residuals are the decompose's bit-stable one-shot IEEE
    doubles over exact integers; median/MAD use the exact-percentile
    parity (q53/z41); the threshold compares ``k_den * adev >
    k_num * mad`` -- scaling instead of dividing, so no new rounded
    double appears anywhere (the frozen exact-output lint).

    Plan: the decompose's (series, day) shuffle + two |series|-bounded
    percentile aggregates joined back to the day rows. Edge days
    (NULL residual -- incomplete trend window) are excluded before the
    stats, not silently treated as zero.
    """
    dec = seasonal_decompose(
        df, value_col=value_col, ts_col=ts_col, period=period,
        group_by=group_by,
    )
    res = dec.filter(F.col("residual").isNotNull()).select(
        group_by, "day", "value_micros", "residual"
    )
    med = res.groupBy(group_by).agg(
        F.percentile("residual", F.lit(0.5)).alias("_med")
    )
    dev = res.join(med, group_by).withColumn(
        "_adev", F.abs(F.col("residual") - F.col("_med"))
    )
    mad = dev.groupBy(group_by).agg(
        F.percentile("_adev", F.lit(0.5)).alias("_mad")
    )
    return (
        dev.join(mad, group_by)
        .filter(
            (F.col("_mad") > 0)
            & (F.lit(k_den) * F.col("_adev") > F.lit(k_num) * F.col("_mad"))
        )
        .select(group_by, "day", "value_micros", "residual")
    )


def seasonal_anomalies_oracle_sql(
    value_sql: str = "value",
    ts_sql: str = "ts",
    period: int = 7,
    table: str = "events",
    group_by: str = "event_type",
    k_num: int = 5,
    k_den: int = 2,
) -> str:
    """DuckDB twin of :func:`seasonal_anomalies` (decompose twin +
    quantile_cont median/MAD + the same scaled comparison)."""
    g = group_by
    dec = seasonal_decompose_oracle_sql(
        value_sql, ts_sql, period=period, table=table, group_by=g
    )
    return f"""
WITH dec AS ({dec}),
res AS (SELECT {g}, day, value_micros, residual FROM dec
        WHERE residual IS NOT NULL),
med AS (SELECT {g}, quantile_cont(residual, 0.5) AS med
        FROM res GROUP BY {g}),
dev AS (SELECT r.*, abs(r.residual - m.med) AS adev
        FROM res r JOIN med m USING ({g})),
mad AS (SELECT {g}, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY {g})
SELECT d.{g}, d.day, d.value_micros, d.residual
FROM dev d JOIN mad m USING ({g})
WHERE m.mad > 0 AND {k_den} * d.adev > {k_num} * m.mad
"""


def interval_max_concurrency(
    df: DataFrame,
    group_col: str,
    start_us: "F.Column",
    end_us: "F.Column",
    id_col: str,
    bucket_width_us: int = 3_600_000_000,
) -> DataFrame:
    """Peak concurrent intervals per group (max rooms occupied, peak
    sessions, connection-pool high-water): classic sweep-line --
    +1 at start, -1 at end, the answer is the max of the running sum --
    but WITHOUT the per-group global ordered window (one task per
    group, the plans.lint anti-pattern when groups are few and huge).

    Two-level max-prefix reduction instead: bucket the sweep key by
    ``bucket_width_us``; per (group, bucket) one bounded window yields
    the bucket's delta total and its LOCAL max running sum; then
    ``max_prefix = max over buckets of (exclusive-offset + local max)``
    -- the only cross-bucket window runs on the bucket axis
    (n/width rows per group, recursively bucketable). The same
    decomposition parallel scan uses for any associative prefix-max.

    Intervals are half-open [start, end): an interval ending at T does
    not overlap one starting at T. Encoded in the sweep key
    ``k = 2*t_us + (is_start ? 1 : 0)`` so ends sort strictly before
    coincident starts; ``id_col`` breaks residual ties so every window
    order is total and both engines agree bit-for-bit.

    Returns (``group_col``, n_intervals, max_concurrent) -- exact
    integers.
    """
    iv = df.select(
        F.col(group_col).alias("g"),
        start_us.cast("long").alias("_s"),
        end_us.cast("long").alias("_e"),
        F.col(id_col).alias("_id"),
    )
    pts = iv.select(
        "g", (F.col("_s") * 2 + 1).alias("_k"),
        F.lit(1).cast("long").alias("_d"), "_id",
    ).unionByName(
        iv.select(
            "g", (F.col("_e") * 2).alias("_k"),
            F.lit(-1).cast("long").alias("_d"), "_id",
        )
    )
    b = (F.col("_k") - F.col("_k") % (2 * bucket_width_us)) / (
        2 * bucket_width_us
    )
    rows = pts.withColumn("_b", b.cast("long"))
    in_w = (
        W.partitionBy("g", "_b")
        .orderBy("_k", "_d", "_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = rows.withColumn("_run", F.sum("_d").over(in_w))
    per_bucket = local.groupBy("g", "_b").agg(
        F.sum("_d").alias("_bt"), F.max("_run").alias("_bmax")
    )
    off_w = (
        W.partitionBy("g").orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    )
    capped = per_bucket.select(
        "g",
        (
            F.coalesce(F.sum("_bt").over(off_w), F.lit(0)) + F.col("_bmax")
        ).alias("_gmax"),
    )
    n_iv = iv.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals")
    )
    return (
        capped.groupBy("g")
        .agg(F.max("_gmax").cast("long").alias("max_concurrent"))
        .join(n_iv, "g")
        .select(
            F.col("g").alias(group_col), "n_intervals", "max_concurrent"
        )
    )


def interval_max_concurrency_oracle_sql(
    intervals_sql: str, group_col: str
) -> str:
    """DuckDB twin of :func:`interval_max_concurrency` -- the NAIVE
    per-group global-window definition (``intervals_sql`` must yield
    ``group_col``, s_us, e_us, id)."""
    return f"""
WITH iv AS MATERIALIZED ({intervals_sql}),
pts AS (
  SELECT {group_col} AS g, s_us * 2 + 1 AS k, 1::BIGINT AS d, id FROM iv
  UNION ALL
  SELECT {group_col}, e_us * 2, -1::BIGINT, id FROM iv),
c AS (
  SELECT g, sum(d) OVER (PARTITION BY g ORDER BY k, d, id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM pts),
m AS (SELECT g, max(cum)::BIGINT AS max_concurrent FROM c GROUP BY g),
n AS (SELECT {group_col} AS g, count(*)::BIGINT AS n_intervals
      FROM iv GROUP BY 1)
SELECT m.g AS {group_col}, n.n_intervals, m.max_concurrent
FROM m JOIN n USING (g)
"""
