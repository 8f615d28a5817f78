"""Event-sequence analytics: ordered funnels and cohort retention.

The two canonical product-analytics shapes over an events stream, built
as pure aggregate/join plans (no windows over the full event table, no
UDFs) so they hold at fact-table scale:

  * ``funnel_counts``     users completing view -> click -> purchase IN
                          ORDER (each stage's timestamp strictly after
                          the previous stage's first completion)
  * ``cohort_retention``  users active k weeks after their first-seen
                          week, per cohort

Both reduce the event table with per-user min-aggregates FIRST (map-side
combined, one shuffle on user_id), then join the tiny per-user frames --
the event table itself is scanned once per stage filter and never joined
row-to-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    stages: list[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel completion counts: stage i counts users whose first
    stage-i event happens STRICTLY AFTER their first completion of stage
    i-1 (the classic min-timestamp chaining definition -- immune to
    out-of-order duplicates, no per-user event sorting).

    Output: (stage_idx, stage, n_users), one row per stage. Plan: one
    filtered min-aggregate per stage over the event scan (each is one
    user_id-keyed shuffle with map-side combine), chained by |stages| - 1
    small equi-joins of per-user frames whose size is bounded by the user
    count, not the event count.
    """
    reached = None  # per-user first-completion time of the previous stage
    out_rows = []
    for i, st in enumerate(stages):
        ev = events.filter(F.col(type_col) == st).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if reached is None:
            cur = ev.groupBy("u").agg(F.min("t").alias("t_first"))
        else:
            cur = (
                ev.join(reached, "u")
                .filter(F.col("t") > F.col("t_first"))
                .groupBy("u")
                .agg(F.min("t").alias("t_next"))
                .withColumnRenamed("t_next", "t_first")
            )
        reached = cur
        out_rows.append(
            cur.agg(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(st).alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
    out = out_rows[0]
    for df in out_rows[1:]:
        out = out.unionByName(df)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the ISO week of
    their first event; a (cohort_week, week_offset) cell counts the
    cohort's users active in that later week.

    Output: (cohort_week DATE, week_offset INT, n_users). Plan: one
    per-user min-aggregate (the cohort assignment), one distinct over
    (user, active-week) -- both map-side combined -- and one join of the
    per-user cohort frame into the (user, week) activity frame; all
    shuffles are keyed on user_id, and every intermediate is bounded by
    |users| x |weeks|, not by event volume.
    """
    week = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    cohorts = events.groupBy(F.col(user_col).alias("u")).agg(
        week(F.min(ts_col)).alias("cohort_week")
    )
    active = (
        events.select(
            F.col(user_col).alias("u"), week(F.col(ts_col)).alias("active_week")
        )
        .distinct()
    )
    return (
        active.join(cohorts, "u")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


def event_paths(
    events: DataFrame,
    top_n: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Clickstream path mining: each user's full event-type sequence (in
    (ts, event_id) order -- the id tie-break makes simultaneous events
    deterministic) becomes one path string; output the ``top_n`` most
    common paths with their user counts.

    Plan: ONE user-keyed aggregate builds the per-user path (collect_list
    of (ts, id, type) structs + an in-row array_sort -- no window, no
    second shuffle for the ordering), then a path-keyed count and a
    top-k. Per-user state is bounded by that user's event count; corpora
    with pathological per-user volumes cap the sequence first (slice
    after sort). The path table is at most |users| rows.
    """
    packed = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(id_col), F.col(type_col)))
    )
    path = F.array_join(
        F.transform(packed, lambda x: x[type_col]), ">"
    )
    per_user = events.groupBy(F.col(user_col)).agg(path.alias("path"))
    return (
        per_user.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(top_n)
    )


def cooccurrence_pairs(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    min_support: int = 1,
) -> DataFrame:
    """Market-basket co-occurrence: support counts for unordered pairs of
    event types seen by the SAME user on the SAME day (the
    frequent-itemset k=2 pass; support = number of (user, day) baskets
    containing both).

    Plan: the event stream reduces FIRST to distinct (user, day, type)
    baskets -- bounded by users x days x |type vocabulary|, the same
    user-bounded-intermediate argument as the funnel/retention operators
    (z31/z32) -- then a self equi-join on the basket key with a
    type-order inequality to emit each unordered pair once. The
    quadratic term is |types-per-basket|^2, bounded by the type
    vocabulary, never by event volume; the join shuffles baskets, not
    events. Support ordering with a (pair) tie-break is deterministic.
    """
    basket = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("day", F.col(ts_col)).alias("d"),
        F.col(type_col).alias("t"),
    ).distinct()
    a, b = basket.alias("a"), basket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(
            F.col("a.t").alias("type_a"), F.col("b.t").alias("type_b")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
        .orderBy(F.desc("support"), "type_a", "type_b")
    )


def association_metrics(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    min_support: int = 1,
) -> DataFrame:
    """Association-rule metrics over the k=2 co-occurrence pass:
    for each unordered type pair, support plus CONFIDENCE in both
    directions (P(b|a), P(a|b)) and LIFT (observed co-occurrence vs
    independence). All ratios are single IEEE divisions over exact
    basket counts, rounded once -- engine-exact.

    Plan: the distinct-basket reduction and pair join of
    :func:`cooccurrence_pairs`, one per-type basket-count aggregate
    (|vocabulary| rows, broadcast), and a 1-row total-baskets aggregate.
    Nothing in the plan scales with event volume past the first
    distinct.
    """
    basket = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("day", F.col(ts_col)).alias("d"),
        F.col(type_col).alias("t"),
    ).distinct()
    pair = (
        basket.alias("a")
        .join(
            basket.alias("b"),
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.t").alias("type_a"), F.col("b.t").alias("type_b"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    singles = basket.groupBy("t").agg(F.count("*").alias("n"))
    totals = basket.select("u", "d").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    sa = singles.select(F.col("t").alias("type_a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("t").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pair.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "type_a",
            "type_b",
            "support",
            F.round(F.col("support") / F.col("n_a"), 6).alias("conf_a_to_b"),
            F.round(F.col("support") / F.col("n_b"), 6).alias("conf_b_to_a"),
            F.round(
                (F.col("support") * F.col("n_baskets"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "type_a", "type_b")
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing N-day distinct active users per day (the DAU/WAU/MAU
    family; window_days=1 is DAU, 7 is WAU).

    Distinct-count windows cannot use a RANGE frame (no DISTINCT inside
    window aggregates), a naive per-day rescan is O(days x events), and
    a days-spine range join is a nested loop. Scale shape here: reduce
    the stream to distinct (user, day) ONCE, then EXPLODE each activity
    day to the ``window_days`` report days it contributes to -- a pure
    map-side sequence fan-out, no join -- and one count-distinct per
    day, restricted to observed days by a broadcast semi-join (so the
    trailing horizon past the last activity day is not reported).
    Intermediates are |users x days| then |users x days x window|,
    never event volume.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    ud = events.select(
        F.col(user_col).alias("u"), day.alias("d")
    ).distinct()
    observed = ud.select(F.col("d").alias("day")).distinct()
    fanned = ud.select(
        "u",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("day"),
    )
    return (
        fanned.join(F.broadcast(observed), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("u").alias("active_users"))
        .orderBy("day")
    )


def conversion_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch / last-touch conversion attribution: for every
    conversion event, the first and the last non-conversion event type
    strictly before it within the same (user, day) journey; conversions
    with no prior touch attribute to 'direct'. Output: conversion counts
    per (first_touch, last_touch) channel pair.

    Plan: one window pass over the journey partition (user, day) ordered
    by (ts, id) -- the id tie-break makes attribution deterministic
    under timestamp collisions -- with IGNORE NULLS first/last over a
    rows-preceding frame; then one small aggregate. Journeys are
    user-day-bounded, so window state is bounded by journey length,
    and the single shuffle is the journey repartition.
    """
    from pyspark.sql import Window as W

    touch = F.when(
        F.col(type_col) != conversion_type, F.col(type_col)
    )
    w = (
        W.partitionBy(user_col, F.date_trunc("day", F.col(ts_col)))
        .orderBy(ts_col, id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    attributed = (
        events.withColumn("_first", F.first(touch, ignorenulls=True).over(w))
        .withColumn("_last", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col(type_col) == conversion_type)
    )
    return (
        attributed.groupBy(
            F.coalesce(F.col("_first"), F.lit("direct")).alias("first_touch"),
            F.coalesce(F.col("_last"), F.lit("direct")).alias("last_touch"),
        )
        .agg(F.count("*").alias("conversions"))
        .orderBy(F.desc("conversions"), "first_touch", "last_touch")
    )


def time_to_convert(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Distribution of conversion latency: per user, seconds from the
    FIRST ``from_type`` event to the first ``to_type`` event strictly
    after it; summarized as converting-user count + exact p25/p50/p90
    latency percentiles. The "how long does the funnel take" companion
    to funnel_counts' "how many make it".

    Plan: one min-aggregate per user per endpoint (conditional mins in
    a single groupBy -- no join between the two legs), a strictly-after
    filter, exact-percentile summary (q53 parity) over exact
    microsecond-derived double seconds. User-bounded intermediates.
    """
    per_user = events.groupBy(user_col).agg(
        F.min(
            F.when(F.col(type_col) == from_type, F.unix_micros(F.col(ts_col)))
        ).alias("_t0"),
        F.min(
            F.when(F.col(type_col) == to_type, F.unix_micros(F.col(ts_col)))
        ).alias("_t1"),
    )
    lat = per_user.filter(
        F.col("_t0").isNotNull()
        & F.col("_t1").isNotNull()
        & (F.col("_t1") > F.col("_t0"))
    ).select(
        ((F.col("_t1") - F.col("_t0")) / F.lit(1_000_000.0)).alias("_s")
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.percentile("_s", F.lit(0.25)), 4).alias("p25_seconds"),
        F.round(F.percentile("_s", F.lit(0.5)), 4).alias("p50_seconds"),
        F.round(F.percentile("_s", F.lit(0.9)), 4).alias("p90_seconds"),
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every ordered pair of consecutive events within a user's (ts, id)-
    ordered sequence, the transition count and the exact HALF_UP
    row-probability in integer micros -- the sequence-model prior a
    behavioral pipeline estimates before anything fancier, and the
    transition table an anomaly monitor diffs release-over-release.

    Plan: the :func:`event_paths` discipline -- ONE user-keyed aggregate
    packs each user's sequence with an in-row array_sort (no window, no
    second ordering shuffle), consecutive pairs come from an in-row
    zip_with of the sequence against its own tail (the BPE pair-explode
    shape), then one (from, to) count whose map-side combine bounds the
    shuffle at |types|^2 x partitions rows. Probabilities are
    ratio_micros_halfup(n, row_total): exact BIGINT arithmetic, no
    float division -- bit-identical cross-engine.
    """
    from ..functions.exactnum import ratio_micros_halfup

    packed = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(id_col), F.col(type_col)))
    )
    seq = F.transform(packed, lambda x: x[type_col])
    seqs = events.groupBy(user_col).agg(seq.alias("_seq"))
    pairs = seqs.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("_seq"), 1, F.size("_seq") - 1),
                F.slice(F.col("_seq"), 2, F.size("_seq") - 1),
                lambda a, b: F.struct(
                    a.alias("from_type"), b.alias("to_type")
                ),
            )
        ).alias("p")
    ).select("p.from_type", "p.to_type")
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("_row_total")
    )
    return counts.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        ratio_micros_halfup(
            F.col("n_transitions"), F.col("_row_total")
        ).alias("p_micros"),
    )
