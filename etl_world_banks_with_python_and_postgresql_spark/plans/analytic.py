"""Window/analytic surface: ranking, running frames, percentiles,
distribution functions, QUALIFY/RANGE shapes.

Split from the monolithic plans/queries.py (round 5, VERDICT r4
task #7); registration order is irrelevant -- every consumer
sorts REGISTRY by name. Helpers and SQL twins live in
plans.base.
"""

from .base import *  # noqa: F401,F403 -- registry, helpers, spark/operator imports



@query(
    "q16_window_topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         (row_number() OVER (PARTITION BY p_brand
                             ORDER BY p_retailprice DESC, p_partkey))::INT AS rnk
  FROM part) WHERE rnk <= 3
""",
    description="top-k per group via ranking window",
)
def q16(spark, sf_dir):
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        load(spark, "part", sf_dir)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


@query(
    "q17_window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_total,
       lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       (rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))::INT AS price_rank
FROM orders WHERE o_custkey % 100 = 0
""",
    description="running sum + lag + rank analytic windows",
)
def q17(spark, sf_dir):
    o = load(spark, "orders", sf_dir).filter(F.col("o_custkey") % 100 == 0)
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(wo.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.lag("o_totalprice").over(wo).alias("prev_price"),
        F.rank().over(wr).alias("price_rank"),
    )


@query(
    "q53_percentiles",
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderstatus
""",
    description="exact interpolated percentiles (median/p90/p99) per group",
)
def q53(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "q46_zscore_groupmap",
    oracle="""
SELECT c_custkey, c_mktsegment,
       round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 6) AS zscore
FROM customer
""",
    description="applyInPandas grouped-map (per-segment z-score) vs window-fn oracle",
)
def q46(spark, sf_dir):
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "zscore": ((pdf["c_acctbal"] - mu) / sd).round(6),
            }
        )

    c = load(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment", "c_acctbal")
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, "c_custkey long, c_mktsegment string, zscore double"
    )


@query(
    "q51_approx_sketches",
    oracle=None,  # approximate algorithms differ across engines by design;
    # bounded-error equivalence vs exact values is asserted in
    # tests/test_operators_misc.py::test_approx_sketches_within_tolerance
    description="approximate sketches: approx_count_distinct + percentile_approx",
)
def q51(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count("*").alias("n_rows"),
    )


# =====================================================================
# Round-2 additions: window-share, lateral join, QUALIFY shape, RANGE
# frames, and training-prep operators (hash split, sequence packing)
# =====================================================================


@query(
    "q65_share_of_total",
    oracle="""
WITH rev AS (
  SELECT n.n_regionkey, n.n_name, sum(o.o_totalprice) AS nat_rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_regionkey, n.n_name)
SELECT n_name,
       round(nat_rev, 2) AS nation_revenue,
       round(nat_rev / sum(nat_rev) OVER (PARTITION BY n_regionkey), 6) AS region_share
FROM rev
""",
    description=(
        "percent-of-total via unordered window aggregate (ratio_to_report "
        "shape): nation revenue share within its region"
    ),
)
def q65(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    n = load(spark, "nation", sf_dir)
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum("o_totalprice").alias("nat_rev"))
    )
    w = W.partitionBy("n_regionkey")
    return rev.select(
        "n_name",
        F.round("nat_rev", 2).alias("nation_revenue"),
        F.round(F.col("nat_rev") / F.sum("nat_rev").over(w), 6).alias("region_share"),
    )


@query(
    "q67_qualify_latest_order",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey
  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
""",
    description=(
        "QUALIFY-style window filter (latest order per customer); Spark "
        "side is the window+filter rewrite QUALIFY desugars to"
    ),
)
def q67(spark, sf_dir):
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        load(spark, "orders", sf_dir)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "q68_range_frame_90d",
    oracle="""
SELECT o_custkey, o_orderkey,
       round((sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER w)::DOUBLE
             / (count(o_totalprice) OVER w), 4) AS avg_90d,
       count(*) OVER w                    AS n_90d
FROM (SELECT *, date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS d
      FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
""",
    description=(
        "value-based RANGE window frame: per customer, average order value "
        "over the trailing 90 days (frame bounds by day value, not row "
        "count -- same-day ties share a frame deterministically)"
    ),
)
def q68(spark, sf_dir):
    o = load(spark, "orders", sf_dir).withColumn(
        "d", F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    )
    w = W.partitionBy("o_custkey").orderBy("d").rangeBetween(-90, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
            / F.count("o_totalprice").over(w),
            4,
        ).alias("avg_90d"),
        F.count("*").over(w).alias("n_90d"),
    )


@query(
    "q94_rank_family",
    oracle="""
SELECT c_custkey, c_mktsegment,
       ntile(10) OVER w AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cum_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    description=(
        "distribution-rank window family: ntile decile bucketing + "
        "percent_rank + cume_dist per segment (deterministic total order "
        "via the key tie-break)"
    ),
)
def q94(spark, sf_dir):
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return load(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@query(
    "z42_apply_changes",
    oracle="""
WITH changes AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN 'delete' ELSE 'upsert' END AS ct,
         c_acctbal + (c_custkey % 5) * 10.0 AS new_bal,
         1 + (c_custkey % 2) AS seq
  FROM customer WHERE c_custkey % 7 < 2),
latest AS (
  SELECT c_custkey, ct, new_bal,
         row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
  FROM changes),
l AS (SELECT * FROM latest WHERE rn = 1)
SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment
FROM customer c LEFT JOIN l ON c.c_custkey = l.c_custkey
WHERE l.c_custkey IS NULL
UNION ALL
SELECT c.c_custkey, c.c_name, l.new_bal AS c_acctbal, c.c_mktsegment
FROM customer c JOIN l ON c.c_custkey = l.c_custkey
WHERE l.ct <> 'delete'
""",
    description=(
        "CDC apply: latest-wins change-feed application to a snapshot "
        "(deletes drop, upserts replace; Delta APPLY CHANGES INTO shape, "
        "the downstream half of read_changes / the incr_cdf stream). "
        "Changes are derived deterministically from the customer table "
        "so the oracle replicates the feed; touched ids broadcast, the "
        "target is never shuffled"
    ),
)
def z42(spark, sf_dir):
    from ..operators.diff import apply_changes

    cust = load(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    changes = (
        cust.filter(F.col("c_custkey") % 7 < 2)
        .select(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal") + (F.col("c_custkey") % 5) * 10.0).alias(
                "c_acctbal"
            ),
            "c_mktsegment",
            F.when(F.col("c_custkey") % 3 == 0, F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("_change_type"),
            (1 + F.col("c_custkey") % 2).cast("int").alias("_commit_seq"),
        )
    )
    return apply_changes(cust, changes, id_col="c_custkey")


@query(
    "z43_equi_depth_histogram",
    oracle="""
WITH cuts AS (
  SELECT quantile_cont(o_totalprice, 0.1) AS c1,
         quantile_cont(o_totalprice, 0.2) AS c2,
         quantile_cont(o_totalprice, 0.3) AS c3,
         quantile_cont(o_totalprice, 0.4) AS c4,
         quantile_cont(o_totalprice, 0.5) AS c5,
         quantile_cont(o_totalprice, 0.6) AS c6,
         quantile_cont(o_totalprice, 0.7) AS c7,
         quantile_cont(o_totalprice, 0.8) AS c8,
         quantile_cont(o_totalprice, 0.9) AS c9
  FROM orders),
binned AS (
  SELECT ((o_totalprice > c1)::INT + (o_totalprice > c2)::INT
        + (o_totalprice > c3)::INT + (o_totalprice > c4)::INT
        + (o_totalprice > c5)::INT + (o_totalprice > c6)::INT
        + (o_totalprice > c7)::INT + (o_totalprice > c8)::INT
        + (o_totalprice > c9)::INT) AS bin,
         o_totalprice AS v
  FROM orders CROSS JOIN cuts)
SELECT bin, count(*) AS n_rows, min(v) AS bin_min, max(v) AS bin_max
FROM binned GROUP BY bin
""",
    description=(
        "equi-depth (decile) histogram: exact interpolated percentile cut "
        "points (1-row aggregate broadcast back, q53 parity) + a row-local "
        "count-of-cuts-below bin assignment -- NOT a global ntile window, "
        "which would funnel the table through one partition at scale"
    ),
)
def z43(spark, sf_dir):
    return _sketch.equi_depth_histogram(
        load(spark, "orders", sf_dir), "o_totalprice", n_bins=10
    )


@query(
    "z62_weighted_median",
    oracle="""
WITH pv AS (
  SELECT l_returnflag, l_extendedprice AS v,
         sum(l_quantity::BIGINT) AS w
  FROM lineitem GROUP BY 1, 2),
c AS (
  SELECT l_returnflag, v,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM pv)
SELECT l_returnflag, min(v) AS weighted_median
FROM c WHERE cw * 2 >= tw GROUP BY l_returnflag
""",
    description=(
        "quantity-weighted median price per return flag (lower weighted "
        "median -- no interpolation ambiguity): weights pre-aggregated "
        "per DISTINCT (group, value) so the cumulative window runs over "
        "distinct values, not raw rows (the z59 bounded-window trick); "
        "integer weight sums, integer half-total comparison -- "
        "engine-exact"
    ),
)
def z62(spark, sf_dir):
    from ..operators.sketch import weighted_median

    return weighted_median(
        load(spark, "lineitem", sf_dir),
        "l_extendedprice",
        "l_quantity",
        "l_returnflag",
    )


@query(
    "z74_revenue_pareto",
    oracle="""
WITH rev AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(25,6))) AS r
  FROM orders GROUP BY o_custkey),
cuts AS (
  SELECT quantile_cont(r::DOUBLE, 0.1) AS c1, quantile_cont(r::DOUBLE, 0.2) AS c2,
         quantile_cont(r::DOUBLE, 0.3) AS c3, quantile_cont(r::DOUBLE, 0.4) AS c4,
         quantile_cont(r::DOUBLE, 0.5) AS c5, quantile_cont(r::DOUBLE, 0.6) AS c6,
         quantile_cont(r::DOUBLE, 0.7) AS c7, quantile_cont(r::DOUBLE, 0.8) AS c8,
         quantile_cont(r::DOUBLE, 0.9) AS c9
  FROM rev),
t AS (SELECT sum(r) AS total FROM rev),
d AS (
  SELECT ((r::DOUBLE > c1)::INT + (r::DOUBLE > c2)::INT + (r::DOUBLE > c3)::INT
        + (r::DOUBLE > c4)::INT + (r::DOUBLE > c5)::INT + (r::DOUBLE > c6)::INT
        + (r::DOUBLE > c7)::INT + (r::DOUBLE > c8)::INT + (r::DOUBLE > c9)::INT)
           AS decile,
         r
  FROM rev CROSS JOIN cuts)
SELECT decile, count(*) AS n_customers,
       round(sum(r)::DOUBLE / t.total::DOUBLE, 6) AS revenue_share
FROM d CROSS JOIN t GROUP BY decile, t.total
""",
    description=(
        "revenue concentration (Pareto) by customer decile: per-customer "
        "revenue (decimal-lifted), decile assignment via 9 exact "
        "percentile cuts broadcast back (count-of-cuts-below, the z43 "
        "scale-correct formulation -- no global rank window over "
        "customers), per-decile share of exact total. The "
        "'do 10% of customers carry 40% of revenue' diagnostic"
    ),
)
def z74(spark, sf_dir):
    rev = (
        load(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("_r"))
    )
    rd = F.col("_r").cast("double")
    cuts = rev.agg(
        *[
            F.percentile(rd, F.lit(i / 10)).alias(f"_c{i}")
            for i in range(1, 10)
        ]
    )
    total = rev.agg(F.sum("_r").alias("_total"))
    decile = sum((rd > F.col(f"_c{i}")).cast("int") for i in range(1, 10))
    return (
        rev.crossJoin(F.broadcast(cuts))
        .select(decile.alias("decile"), F.col("_r"))
        .crossJoin(F.broadcast(total))
        .groupBy("decile", "_total")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum("_r").cast("double") / F.col("_total").cast("double"), 6
            ).alias("revenue_share"),
        )
        .drop("_total")
    )


@query(
    "z86_trimmed_mean",
    oracle="""
WITH c AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c),
k AS (
  SELECT event_type, n, cents
  FROM r WHERE rn > n // 10 AND rn <= n - n // 10)
SELECT event_type,
       max(n)::BIGINT AS n_total,
       count(*)::BIGINT AS n_kept,
       ((2 * 1000000 * sum(cents) + 100 * count(*))
        // (2 * 100 * count(*)))::BIGINT AS trimmed_mean_micros
FROM k GROUP BY event_type
""",
    description=(
        "10%-trimmed mean per event type in exact integers: 2-dp values "
        "lifted to BIGINT cents, rank-trimmed by COUNT (not by value "
        "quantile -- identical row sets in both engines via the "
        "(cents, event_id) total order), mean as one HALF_UP-micros "
        "rational. The outlier-robust aggregate a metrics pipeline "
        "wants when p99 sensors misreport; one window + one aggregate, "
        "both partitioned on the group key"
    ),
)
def z86(spark, sf_dir):
    ev = load(spark, "events", sf_dir).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = W.partitionBy("event_type").orderBy("cents", "event_id")
    wn = W.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    tenth = (F.col("n") - F.col("n") % 10) / 10
    k = r.filter(
        (F.col("rn") > tenth) & (F.col("rn") <= F.col("n") - tenth)
    )
    den = F.lit(100) * F.count("*")
    num = F.sum("cents")
    return k.groupBy("event_type").agg(
        F.max("n").alias("n_total"),
        F.count("*").alias("n_kept"),
        exactnum.floordiv_nonneg(
            F.lit(2_000_000) * num + den, F.lit(2) * den
        ).alias("trimmed_mean_micros"),
    )


@query(
    "z87_percentile_disc",
    oracle="""
WITH r AS (
  SELECT o_orderstatus, o_totalprice, o_orderkey,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders)
SELECT o_orderstatus,
       max(n)::BIGINT AS n_orders,
       max(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS p50,
       max(CASE WHEN rn = (9 * n + 9) // 10 THEN o_totalprice END) AS p90,
       max(CASE WHEN rn = (99 * n + 99) // 100 THEN o_totalprice END) AS p99
FROM r GROUP BY o_orderstatus
""",
    description=(
        "exact discrete percentiles (percentile_disc semantics, idx = "
        "ceil(p*n) via integer arithmetic): the reported value IS an "
        "actual data element taken verbatim from the column -- no "
        "interpolation, no rounding, engine-exact by construction. The "
        "p50/p90/p99 latency-report shape; one rank window per group + "
        "one aggregate"
    ),
)
def z87(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = W.partitionBy("o_orderstatus")
    r = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def _ceil_idx(mult: int, div: int):
        # ceil(mult*n/div) == (mult*n + mult)//div for these picks (each
        # mult == div - 1), mirrored literally in the oracle
        num = F.col("n") * mult + mult
        return exactnum.floordiv_nonneg(num, F.lit(div))

    picks = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    aggs = [F.max("n").alias("n_orders")]
    for name, m, d in picks:
        aggs.append(
            F.max(
                F.when(F.col("rn") == _ceil_idx(m, d), F.col("o_totalprice"))
            ).alias(name)
        )
    return r.groupBy("o_orderstatus").agg(*aggs)


_Z107_QS = [250_000, 500_000, 750_000, 950_000]


@query(
    "z107_kmv_quantiles",
    oracle=f"""
WITH q AS (SELECT unnest([{", ".join(str(q) for q in _Z107_QS)}]::BIGINT[])
                  AS q_micros),
s0 AS (
  SELECT DISTINCT o_orderstatus,
         ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 12))::BIGINT AS hv,
         o_totalprice AS v
  FROM orders),
sk AS (
  SELECT o_orderstatus, hv, v FROM (
    SELECT o_orderstatus, hv, v,
           row_number() OVER (PARTITION BY o_orderstatus
                              ORDER BY hv, v) AS rn
    FROM s0) WHERE rn <= 256),
ranked AS (
  SELECT o_orderstatus, v,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY v, hv) AS r2,
         count(*) OVER (PARTITION BY o_orderstatus) AS ns
  FROM sk),
est AS (
  SELECT o_orderstatus, q_micros, v AS est_value
  FROM ranked CROSS JOIN q
  WHERE r2 = (q_micros * ns + 999999) // 1000000),
full_r AS (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders),
exact AS (
  SELECT o_orderstatus, q_micros, o_totalprice AS exact_value
  FROM full_r CROSS JOIN q
  WHERE rn = (q_micros * n + 999999) // 1000000),
n_per AS (SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1),
le AS (
  SELECT e.o_orderstatus, e.q_micros, count(*) AS n_le
  FROM est e JOIN orders o
    ON o.o_orderstatus = e.o_orderstatus AND o.o_totalprice <= e.est_value
  GROUP BY 1, 2)
SELECT e.o_orderstatus, e.q_micros, e.est_value, x.exact_value,
       (1000000 * le.n_le) // n_per.n AS est_rank_micros
FROM est e
JOIN exact x USING (o_orderstatus, q_micros)
JOIN le USING (o_orderstatus, q_micros)
JOIN n_per USING (o_orderstatus)
""",
    description=(
        "mergeable bottom-k quantile sketch WITH its in-gate accuracy "
        "eval: per-group approximate quantiles from a 256-row "
        "deterministic uniform sample (k smallest md5 hashes of the row "
        "key -- the z13/z39 min-wise family, so partial samples from "
        "independent scans compose without rescan), nearest-rank over "
        "the sample in pure BIGINT arithmetic, values verbatim (no IEEE "
        "op anywhere). Output joins the exact full-data quantile (z87 "
        "semantics) and the estimate's ACHIEVED rank in micros, so the "
        "~1/sqrt(k) position-error claim is measured by the gate itself, "
        "not asserted"
    ),
)
def z107(spark, sf_dir):
    from ..operators import sketch

    o = load(spark, "orders", sf_dir)
    est = sketch.kmv_quantiles(
        o, "o_orderkey", "o_totalprice", _Z107_QS, k=256,
        group_by="o_orderstatus",
    ).select(
        "o_orderstatus", "q_micros", F.col("quantile_value").alias("est_value")
    )
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = W.partitionBy("o_orderstatus")
    r = o.select(
        "o_orderstatus", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    qs = F.explode(
        F.array(*[F.lit(q).cast("long") for q in _Z107_QS])
    ).alias("q_micros")
    exact = (
        r.select("o_orderstatus", "o_totalprice", "rn", "n", qs)
        .filter(F.col("rn") == F.expr("(q_micros * n + 999999) div 1000000"))
        .select(
            "o_orderstatus", "q_micros",
            F.col("o_totalprice").alias("exact_value"),
        )
    )
    n_per = o.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    le = (
        o.select("o_orderstatus", "o_totalprice")
        .join(F.broadcast(est), "o_orderstatus")
        .filter(F.col("o_totalprice") <= F.col("est_value"))
        .groupBy("o_orderstatus", "q_micros")
        .agg(F.count("*").alias("n_le"))
    )
    return (
        est.join(exact, ["o_orderstatus", "q_micros"])
        .join(le, ["o_orderstatus", "q_micros"])
        .join(n_per, "o_orderstatus")
        .select(
            "o_orderstatus", "q_micros", "est_value", "exact_value",
            exactnum.floordiv_nonneg(
                F.lit(1_000_000) * F.col("n_le"), F.col("n")
            ).alias("est_rank_micros"),
        )
    )


from ..operators.graph import pagerank_oracle_sql as _pagerank_sql  # noqa: E402

_PAGERANK_EDGES_SQL = """
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@query(
    "z132_pagerank",
    oracle="WITH ranked AS ("
    + _pagerank_sql(_PAGERANK_EDGES_SQL, n_iter=3)
    + """)
SELECT node, rank_micros FROM ranked
ORDER BY rank_micros DESC, node LIMIT 100
""",
    description=(
        "fixed-iteration PageRank centrality in exact integer micros "
        "(the web-graph document-quality prior a crawl-corpus pipeline "
        "scores hosts with): customer->supplier purchase edges, 3 "
        "damped rounds, each ONE O(|E|) equi-join + ONE map-side-"
        "combined aggregate with lineage cut per round -- the Pregel "
        "message-passing shape as plain joins. Every update is an exact "
        "BIGINT/DECIMAL floor expression, so the unrolled-CTE oracle "
        "reproduces all 3 rounds bit-for-bit; top-100 by (rank, node) "
        "gated. Dangling mass deliberately dropped (documented)"
    ),
)
def z132(spark, sf_dir):
    from ..operators.graph import pagerank

    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return (
        pagerank(edges, n_iter=3)
        .orderBy(F.desc("rank_micros"), F.asc("node"))
        .limit(100)
    )


_WPAGERANK_EDGES_SQL = """
  SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst,
         count(*)::BIGINT AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
"""


@query(
    "z139_weighted_pagerank",
    oracle="WITH ranked AS ("
    + _pagerank_sql(_WPAGERANK_EDGES_SQL, n_iter=3, weighted=True)
    + """)
SELECT node, rank_micros FROM ranked
ORDER BY rank_micros DESC, node LIMIT 100
""",
    description=(
        "WEIGHTED PageRank: edges carry interaction counts (order lines "
        "per customer->supplier pair) and each edge moves w/W_u of its "
        "source's damped mass -- the multiplicity-aware centrality a "
        "crawl graph (link counts) or behavioral graph actually needs. "
        "Same exact integer-micros update with the weight folded into "
        "the floor expression (unweighted is the special case w = 1); "
        "same unrolled-CTE full oracle, top-100 gated"
    ),
)
def z139(spark, sf_dir):
    from ..operators.graph import pagerank

    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return (
        pagerank(edges, n_iter=3, weight="w")
        .orderBy(F.desc("rank_micros"), F.asc("node"))
        .limit(100)
    )


from ..operators.graph import triangle_oracle_sql as _tri_sql  # noqa: E402

_TRI_EDGES_SQL = """
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
"""


@query(
    "z144_triangle_count",
    oracle="WITH counts AS ("
    + _tri_sql(_TRI_EDGES_SQL)
    + """),
total AS (SELECT (sum(n_triangles) // 3)::BIGINT AS total_triangles
          FROM counts)
SELECT node, n_triangles, total_triangles
FROM (SELECT * FROM counts ORDER BY n_triangles DESC, node LIMIT 20), total
""",
    description=(
        "triangle counting over the part co-purchase graph (parts "
        "sharing an order) by degree-ordered edge orientation -- the "
        "compact-forward algorithm: orient every edge low->high "
        "(degree, id), one wedge self-join + one closing-edge join, so "
        "wedge work is O(|E|^1.5) and a hub's raw degree can never go "
        "quadratic (its out-degree is capped by the orientation). The "
        "clustering-coefficient / community-density primitive. Top-20 "
        "nodes by triangle membership + the global count; exact "
        "integers end to end"
    ),
)
def z144(spark, sf_dir):
    from ..operators.graph import triangle_counts

    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    b = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("_pb")
    )
    edges = (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .select(F.col("l_partkey").alias("src"), F.col("_pb").alias("dst"))
    )
    from ..functions.staging import staged

    # staged: tc fans out into the global total AND the top-20 ranking
    # -- without the cut the whole wedge-join subtree (the O(|E|^1.5)
    # part) executes twice
    tc = staged(triangle_counts(edges))
    total = tc.agg(
        F.expr("sum(n_triangles) div 3").alias("total_triangles")
    )
    return (
        tc.orderBy(F.desc("n_triangles"), F.asc("node"))
        .limit(20)
        .crossJoin(F.broadcast(total))
    )


from ..operators.graph import (  # noqa: E402
    triangle_estimate_oracle_sql as _tri_est_sql,
)


@query(
    "z166_triangle_estimate",
    oracle=_tri_est_sql(_TRI_EDGES_SQL, sample_denom=4, seed=0),
    description=(
        "DOULION sparsified triangle estimate over the same part "
        "co-purchase graph as exact z144: each canonical edge kept with "
        "p=1/4 by a deterministic md5 coin (reruns and the oracle see "
        "the same sample), exact compact-forward count on the "
        "sparsified graph, scaled by 1/p^3 -- the estimate costs "
        "p^1.5 = 1/8 of the exact job's O(|E|^1.5) wedge work, the "
        "HLL-next-to-exact-distinct trade for interactive triangle "
        "density at 100 TB. Unbiasedness pinned by the multi-seed test; "
        "sample_denom=1 degenerates to the exact count. One summary "
        "row, exact integers"
    ),
)
def z166(spark, sf_dir):
    from ..operators.graph import triangle_estimate

    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("_pb"))
    edges = (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .select(F.col("l_partkey").alias("src"), F.col("_pb").alias("dst"))
    )
    return triangle_estimate(edges, sample_denom=4, seed=0)


from ..operators.graph import k_core_oracle_sql as _kcore_sql  # noqa: E402


@query(
    "z169_k_core",
    oracle=_kcore_sql(_TRI_EDGES_SQL, k=60, max_rounds=12),
    description=(
        "k-core decomposition (k=60) of the part co-purchase graph by "
        "parallel peeling (Matula-Beck as synchronous dataflow): each "
        "round drops EVERY node under degree k at once -- one degree "
        "aggregate + two semi-joins over a monotonically shrinking edge "
        "set, lineage cut per round, fail-loud max_rounds like z147. "
        "The crawl-curation subgraph prior (keep the dense core, shed "
        "leaves/chains). Oracle unrolls exactly max_rounds MATERIALIZED "
        "CTE rounds (no-ops past the fixpoint keep engines identical); "
        "k=60 peels a real fraction at every SF (probed 0.001/0.01/0.1 "
        "-- the NOTES degeneracy rule). Output (node, core_degree), "
        "exact integers"
    ),
)
def z169(spark, sf_dir):
    from ..operators.graph import k_core

    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("_pb"))
    edges = (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .select(F.col("l_partkey").alias("src"), F.col("_pb").alias("dst"))
    )
    return k_core(edges, k=60, max_rounds=12)


from ..operators.graph import cc_oracle_sql as _cc_sql  # noqa: E402

# parts co-purchased in >= 2 distinct orders: sparse enough to have
# real component structure at every SF (1 / 9 / 2350 components at
# sf0.001/0.01/0.1 -- probed, the NOTES degeneracy rule)
_CC_EDGES_SQL = """
  SELECT least(a.l_partkey, b.l_partkey) AS src,
         greatest(a.l_partkey, b.l_partkey) AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2
"""


@query(
    "z147_connected_components",
    oracle=_cc_sql(_CC_EDGES_SQL),
    description=(
        "connected components by alternating large-star/small-star "
        "(Kiveris et al. SoCC'14): O(log^2 n) rounds of two aggregate+"
        "join passes each -- the 100 TB CC algorithm, vs naive "
        "min-label propagation's O(diameter) rounds (a path graph "
        "needs |V| of those; test-pinned). Runs on the >= 2-order part "
        "co-purchase graph; labels = component min id, every node "
        "exactly once, convergence detected by an order-free edge-set "
        "checksum and NON-convergence raises (never silent wrong "
        "labels). Oracle = ground-truth recursive-CTE closure -- the "
        "gate proves the star fixpoint equals true connectivity"
    ),
)
def z147(spark, sf_dir):
    from ..operators.graph import connected_components

    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("_pb"))
    edges = (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .groupBy(
            F.col("l_partkey").alias("src"), F.col("_pb").alias("dst")
        )
        .agg(F.countDistinct("l_orderkey").alias("_n_ord"))
        .filter(F.col("_n_ord") >= 2)
        .select("src", "dst")
    )
    return connected_components(edges)


# blocked fuzzy-match edges (the q52 shape) feeding entity resolution
_ER_EDGES_SQL = """
  SELECT a.p_partkey AS src, b.p_partkey AS dst
  FROM part a JOIN part b
    ON a.p_type = b.p_type AND a.p_partkey < b.p_partkey
  WHERE a.p_partkey % 10 = 0 AND b.p_partkey % 10 = 0
    AND levenshtein(a.p_name, b.p_name) <= 3
"""


@query(
    "z153_entity_resolution",
    oracle="WITH comp AS ("
    + _cc_sql(_ER_EDGES_SQL)
    + """)
SELECT node AS p_partkey, component AS entity_id, sz AS cluster_size
FROM comp JOIN (SELECT component AS c, count(*)::BIGINT AS sz
                FROM comp GROUP BY 1) s ON comp.component = s.c
""",
    description=(
        "end-to-end entity resolution: blocked fuzzy matching (q52's "
        "type-block + Levenshtein <= 3 -- blocking bounds the quadratic "
        "pair space to within-block) -> match edges -> large-star/"
        "small-star connected components -> canonical entity id "
        "(component min) + cluster size per record. The classic MDM/"
        "record-linkage composition, every stage an operator this "
        "engine already gates separately; transitive matches (A~B~C "
        "with A!~C) land in ONE entity, which is exactly what pairwise "
        "output cannot express. Oracle closes the graph with the "
        "ground-truth recursive CTE"
    ),
)
def z153(spark, sf_dir):
    from ..operators.graph import connected_components

    p = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name", "p_type")
    )
    a = p.select(
        F.col("p_partkey").alias("src"), F.col("p_name").alias("name_a"),
        "p_type",
    )
    b = p.select(
        F.col("p_partkey").alias("dst"), F.col("p_name").alias("name_b"),
        "p_type",
    )
    edges = (
        a.join(b, "p_type")
        .filter(F.col("src") < F.col("dst"))
        .filter(F.levenshtein("name_a", "name_b") <= 3)
        .select("src", "dst")
    )
    comp = connected_components(edges)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("node").alias("p_partkey"),
        F.col("component").alias("entity_id"),
        "cluster_size",
    )


from ..operators.dedup import (  # noqa: E402
    blocking_quality_oracle_sql as _blockq_sql,
)

_Z196_ITEMS_SQL = (
    "SELECT p_partkey, p_type FROM part WHERE p_partkey % 1000 < 10"
)
_Z196_TRUTH_SQL = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
FROM part a JOIN part b
  ON a.p_partkey < b.p_partkey
 AND levenshtein(a.p_name, b.p_name) <= 3
WHERE a.p_partkey % 1000 < 10 AND b.p_partkey % 1000 < 10
"""


@query(
    "z196_blocking_quality",
    oracle=_blockq_sql(
        _Z196_ITEMS_SQL,
        _Z196_TRUTH_SQL,
        id_sql="p_partkey",
        block_sql="p_type",
    ),
    description=(
        "blocking-scheme scorecard for the z153 entity-resolution "
        "pipeline: reduction ratio (pair-space pruned by the p_type "
        "block, counted from block SIZES -- candidate pairs are never "
        "materialized) vs pairs completeness (share of TRUE fuzzy "
        "matches the block keeps, truth = unblocked Levenshtein <= 3 "
        "on a bounded 1%-slice ground-truth leg). The two numbers that "
        "decide whether a blocking key is deployable BEFORE the match "
        "stage runs at scale; observability twin of z187 (clusters) "
        "at the candidate-generation stage. Exact HALF_UP micros, "
        "DECIMAL(38,0) pair counts, NULL on zero denominators"
    ),
)
def z196(spark, sf_dir):
    from ..operators.dedup import blocking_quality

    p = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") % 1000 < 10)
        .select("p_partkey", "p_name", "p_type")
    )
    items = p.select(
        F.col("p_partkey").alias("id"), F.col("p_type").alias("block")
    )
    a = p.select(
        F.col("p_partkey").alias("id_a"), F.col("p_name").alias("_na")
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"), F.col("p_name").alias("_nb")
    )
    truth = a.join(
        b,
        (F.col("id_a") < F.col("id_b"))
        & (F.levenshtein("_na", "_nb") <= 3),
    ).select("id_a", "id_b")
    return blocking_quality(items, truth, "id", "block")


from ..operators.rollup import pareto_frontier_oracle_sql as _pareto_sql  # noqa: E402

_Z155_POINTS_SQL = """
SELECT l_suppkey AS k, round(s_acctbal, 2) AS x,
       round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2)::DOUBLE AS y
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1, 2
"""


@query(
    "z155_pareto_frontier",
    oracle=_pareto_sql(_Z155_POINTS_SQL, x="x", y="y", keep="k"),
    description=(
        "2-D Pareto frontier (skyline) of suppliers over (account "
        "balance, total revenue): rows no other row weakly dominates -- "
        "the price/performance shortlist query. Scalable TWO-LEVEL "
        "scan: per-hash-bucket local frontiers via a bucket-partitioned "
        "running-max window, then the same scan over the small survivor "
        "union (frontier(union) = frontier(frontiers) -- dominance is "
        "pointwise), so no corpus-sized global ordered window exists. "
        "The oracle's one-level scan is value-identical"
    ),
)
def z155(spark, sf_dir):
    from ..operators.rollup import pareto_frontier

    li = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir)
    pts = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("l_suppkey").alias("k"),
            F.round(F.col("s_acctbal"), 2).alias("x"),
        )
        .agg(_dsum(F.col("l_extendedprice")).alias("y"))
    )
    return pareto_frontier(pts, "x", "y", keep_cols=["k"])


@query(
    "z161_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, ts::DATE AS day FROM events),
idx AS (
  SELECT user_id, day,
         (day - DATE '1970-01-01')
         - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days),
runs AS (
  SELECT user_id, grp, count(*)::BIGINT AS streak_days,
         min(day) AS run_start, max(day) AS run_end
  FROM idx GROUP BY 1, 2),
best AS (
  SELECT user_id, streak_days, run_start, run_end,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY streak_days DESC, run_start) AS rn
  FROM runs)
SELECT user_id, streak_days, run_start, run_end
FROM best WHERE rn = 1
""",
    description=(
        "longest consecutive-day activity streak per user "
        "(gaps-and-islands): island id = epoch_day - row_number over "
        "the user's distinct active days (constant within a consecutive "
        "run, the classic trick -- no self-join, no recursion), one "
        "island aggregate, earliest-start tiebreak. Engagement/"
        "retention's streak metric; every window is user-partitioned "
        "and day-axis-bounded"
    ),
)
def z161(spark, sf_dir):
    e = load(spark, "events", sf_dir)
    days = e.select(
        "user_id", F.to_date(F.col("ts")).alias("day")
    ).distinct()
    epoch = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = W.partitionBy("user_id").orderBy("day")
    idx = days.select(
        "user_id", "day",
        (epoch - F.row_number().over(w)).alias("grp"),
    )
    runs = idx.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("streak_days"),
        F.min("day").alias("run_start"),
        F.max("day").alias("run_end"),
    )
    wb = W.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("run_start")
    )
    return (
        runs.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "run_start", "run_end")
    )


from ..operators.rollup import gini_oracle_sql as _gini_sql  # noqa: E402

_Z163_MEMBERS_SQL = """
SELECT c.c_nationkey AS g, c.c_custkey AS k,
       (sum(CAST(o.o_totalprice AS DECIMAL(25,6))) * 1000000)::BIGINT AS x
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""


@query(
    "z163_gini_concentration",
    oracle=_gini_sql(_Z163_MEMBERS_SQL),
    description=(
        "Gini coefficient of customer revenue per nation -- the "
        "concentration/inequality readout behind z74's Pareto deciles, "
        "one comparable number per group. Exact end to end: ascending "
        "rank-weighted sum (tie ORDER provably irrelevant -- equal "
        "values contribute value * sum(ranks) either way), "
        "DECIMAL(38,0)-lifted products, ONE HALF_UP integer-micros "
        "ratio. One group-partitioned rank window over group-bounded "
        "members + one aggregate"
    ),
)
def z163(spark, sf_dir):
    from ..operators.rollup import gini_concentration

    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    rev = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("g"), F.col("c_custkey").alias("k")
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(25,6)")) * 1_000_000)
            .cast("long")
            .alias("x")
        )
    )
    return gini_concentration(rev, "x", "g", "k")


@query(
    "z164_ab_test_gate",
    oracle="""
WITH u AS (
  SELECT user_id, user_id % 2 AS arm,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
  FROM events GROUP BY 1),
counts AS (
  SELECT
    sum(CASE WHEN arm = 0 AND np >= 14 THEN 1 ELSE 0 END)::BIGINT AS a,
    sum(CASE WHEN arm = 0 AND np < 14 THEN 1 ELSE 0 END)::BIGINT AS b,
    sum(CASE WHEN arm = 1 AND np >= 14 THEN 1 ELSE 0 END)::BIGINT AS c,
    sum(CASE WHEN arm = 1 AND np < 14 THEN 1 ELSE 0 END)::BIGINT AS d
  FROM u)
SELECT a, b, c, d,
       (a + b + c + d)::BIGINT AS n,
       ((a*d - b*c) * (a*d - b*c))::BIGINT AS num_sq,
       ((a+b) * (c+d) * (a+c) * (b+d))::BIGINT AS den,
       (100::HUGEINT * (a + b + c + d)
          * ((a::HUGEINT * d - b::HUGEINT * c)
             * (a::HUGEINT * d - b::HUGEINT * c))
        >= 384::HUGEINT * ((a+b)::HUGEINT * (c+d) * (a+c) * (b+d)))
         AS significant_95
FROM counts
""",
    description=(
        "exact-integer A/B significance gate: 2x2 conversion table "
        "(arm = user hash parity, converted = >= 14 purchase events) "
        "with the chi-square test DENOMINATOR-CLEARED -- "
        "100*n*(ad-bc)^2 >= 384*(row/col products) IS chi2 >= 3.84 "
        "(p < .05, 1 dof) with zero division, zero floats, zero "
        "rounding: the ship/no-ship boolean is bit-identical by "
        "construction. Emits the table and both cleared sides so the "
        "effect size is auditable. One user-keyed aggregate + one "
        "1-row reduction"
    ),
)
def z164(spark, sf_dir):
    e = load(spark, "events", sf_dir)
    u = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("np")
    ).select(
        (F.col("user_id") % 2).alias("arm"),
        (F.col("np") >= 14).alias("conv"),
    )
    counts = u.agg(
        F.sum(F.when((F.col("arm") == 0) & F.col("conv"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("arm") == 0) & ~F.col("conv"), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("arm") == 1) & F.col("conv"), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("arm") == 1) & ~F.col("conv"), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    # the BOOLEAN runs in DECIMAL(38,0) (HUGEINT on the oracle side):
    # 100*n*(ad-bc)^2 tops out ~n^5/16, so int64 would wrap near
    # n ~ 2e3 of IMBALANCE at a billion users; decimal carries the gate
    # to n ~ 1e9. The emitted num_sq/den stay BIGINT for the audit
    # readout (valid to n ~ 1e5 -- documented envelope; the decision
    # bit is the scale-safe part).
    d38 = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    ad_bc = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    ad_bc_d = d38(F.col("a")) * d38(F.col("d")) - d38(F.col("b")) * d38(
        F.col("c")
    )
    den = (
        (F.col("a") + F.col("b"))
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    )
    den_d = (
        d38(F.col("a") + F.col("b"))
        * d38(F.col("c") + F.col("d"))
        * d38(F.col("a") + F.col("c"))
        * d38(F.col("b") + F.col("d"))
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    return counts.select(
        "a", "b", "c", "d",
        n.alias("n"),
        (ad_bc * ad_bc).cast("long").alias("num_sq"),
        den.cast("long").alias("den"),
        (
            F.lit(100).cast("decimal(38,0)") * d38(n) * ad_bc_d * ad_bc_d
            >= F.lit(384).cast("decimal(38,0)") * den_d
        ).alias("significant_95"),
    )


from ..operators.graph import (  # noqa: E402
    k_hop_reach_oracle_sql as _khop_sql,
)


@query(
    "z173_two_hop_reach",
    oracle=_khop_sql(_CC_EDGES_SQL, hops=2),
    description=(
        "per-node 2-hop neighborhood size (friend-of-friend reach) over "
        "the >= 2-orders co-purchase graph: one equi-join + distinct per "
        "hop, lineage cut per hop -- the influence-radius primitive. "
        "Scale honesty is explicit in the operator: hop expansion is "
        "Sum deg^hops and a hub makes it quadratic, so the operator "
        "ships a max_transit_degree cap (paths through celebrity nodes "
        "dropped, the production FoF mitigation) and the entry runs "
        "uncapped only because this graph's degree is bounded by "
        "construction (the z147 sparsification). Exact integers, self "
        "excluded"
    ),
)
def z173(spark, sf_dir):
    from ..operators.graph import k_hop_reach

    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("_pb"))
    edges = (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .groupBy(
            F.col("l_partkey").alias("src"), F.col("_pb").alias("dst")
        )
        .agg(F.countDistinct("l_orderkey").alias("_n_ord"))
        .filter(F.col("_n_ord") >= 2)
        .select("src", "dst")
    )
    return k_hop_reach(edges, hops=2)


from ..operators.rollup import (  # noqa: E402
    weighted_median_oracle_sql as _wmed_sql,
)


@query(
    "z175_weighted_median",
    oracle=_wmed_sql(
        "SELECT l_returnflag, l_extendedprice, l_quantity FROM lineitem",
        "l_returnflag",
        "floor(l_extendedprice / 1000)",
        "l_quantity",
    ),
    description=(
        "quantity-weighted median price band per return flag by the "
        "histogram-median trick: one map-side-combined aggregate "
        "collapses the corpus to (group, band, weight) rows, then every "
        "window runs on the HISTOGRAM axis (|bands| rows), never corpus "
        "rows -- the way to take a median at 100 TB when the domain is "
        "bounded (a sort-based median shuffles the corpus). Lower "
        "weighted median (smallest band with 2*cum >= total) -- a "
        "deterministic tie rule, exact integers, no interpolation; "
        "explicit floor() in BOTH engines (DuckDB ::INT rounds, the "
        "z154 band-edge rule)"
    ),
)
def z175(spark, sf_dir):
    from ..operators.rollup import weighted_median_banded

    li = load(spark, "lineitem", sf_dir)
    return weighted_median_banded(
        li,
        "l_returnflag",
        F.floor(F.col("l_extendedprice") / 1000),
        F.col("l_quantity"),
    )


from ..operators.graph import (  # noqa: E402
    degree_assortativity_oracle_sql as _assort_sql,
)


@query(
    "z180_degree_assortativity",
    oracle=_assort_sql(_CC_EDGES_SQL),
    description=(
        "degree assortativity coefficient (Newman 2002) of the >= "
        "2-orders co-purchase graph: Pearson correlation of endpoint "
        "degrees over the symmetrized edge pairs -- do hubs link to "
        "hubs (r > 0) or to leaves (r < 0)? The one-number prior that "
        "decides whether transit-degree caps (z173) will bite. "
        "Symmetrization makes the two marginals identical so the "
        "denominator needs NO square root: every term is an exact "
        "integer sum (DECIMAL(38,0) squares), the coefficient ONE "
        "sign-aware HALF_UP micros division -- zero float anywhere. "
        "One degree aggregate + two equi-joins + one 1-row total"
    ),
)
def z180(spark, sf_dir):
    from ..operators.graph import degree_assortativity

    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("_pb"))
    edges = (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .groupBy(
            F.col("l_partkey").alias("src"), F.col("_pb").alias("dst")
        )
        .agg(F.countDistinct("l_orderkey").alias("_n_ord"))
        .filter(F.col("_n_ord") >= 2)
        .select("src", "dst")
    )
    return degree_assortativity(edges)


from ..operators.graph import (  # noqa: E402
    harmonic_centrality_oracle_sql as _harm_sql,
)


@query(
    "z189_harmonic_centrality",
    oracle=_harm_sql(_CC_EDGES_SQL, hops=2),
    description=(
        "hop-bounded harmonic centrality (sum of 1/d over nodes within "
        "2 hops) of the >= 2-orders co-purchase graph -- THE host-"
        "ranking centrality of web-crawl curation (Common Crawl ranks "
        "hosts harmonic-first; disconnected graphs are native: "
        "unreachable = 0, never infinity). Per-distance weights "
        "QUANTIZED to round(1e6/d) integer micros (the z185 rule -- a "
        "float 1/d sum is engine-order-dependent, an integer shell "
        "dot is exact). Shell BFS with MIN-distance semantics: one "
        "equi-join + anti-join + distinct per hop over the FRONTIER, "
        "lineage cut per hop, then one (node, d) count agg"
    ),
)
def z189(spark, sf_dir):
    from ..operators.graph import harmonic_centrality

    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("_pb"))
    edges = (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .groupBy(
            F.col("l_partkey").alias("src"), F.col("_pb").alias("dst")
        )
        .agg(F.countDistinct("l_orderkey").alias("_n_ord"))
        .filter(F.col("_n_ord") >= 2)
        .select("src", "dst")
    )
    return harmonic_centrality(edges, hops=2)
