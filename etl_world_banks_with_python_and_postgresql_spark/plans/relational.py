"""Core relational surface: TPC-H-shaped scans, joins, aggregations,
set ops, semi/anti joins, string/date/JSON functions (SURVEY §2.2-§2.6).

Split from the monolithic plans/queries.py (round 5, VERDICT r4
task #7); registration order is irrelevant -- every consumer
sorts REGISTRY by name. Helpers and SQL twins live in
plans.base.
"""

from .base import *  # noqa: F401,F403 -- registry, helpers, spark/operator imports



# =====================================================================
# Core relational surface (SURVEY §2.2-§2.6 built-in operator families)
# =====================================================================


@query(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2)::DOUBLE         AS sum_qty,
       round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2)::DOUBLE    AS sum_base_price,
       round(sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(25,6))), 2)::DOUBLE                    AS sum_disc_price,
       round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      AS DECIMAL(25,6))), 2)::DOUBLE                    AS sum_charge,
       {_davg_sql("l_quantity", 4)}                                     AS avg_qty,
       {_davg_sql("l_extendedprice", 4)}                                AS avg_price,
       {_davg_sql("l_discount", 6)}                                     AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1 shape: scan+filter+groupBy with 8 aggregates",
)
def q01(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            _dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("sum_disc_price"),
            _dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                2,
            ).alias("sum_charge"),
            _davg("l_quantity", 4).alias("avg_qty"),
            _davg("l_extendedprice", 4).alias("avg_price"),
            _davg("l_discount", 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_top_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    description="global sort + limit (top-k) with deterministic tie-break",
)
def q02(spark, sf_dir):
    return (
        load(spark, "orders", sf_dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q03_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(25,6))), 2)::DOUBLE AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    description="TPC-H Q3 shape: 3-way join + agg + ordered top-k",
)
def q03(spark, sf_dir):
    c = load(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = load(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q04_priority_semijoin",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
""",
    description="EXISTS as left-semi join + agg (TPC-H Q4 shape)",
)
def q04(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q05_region_revenue",
    oracle="""
SELECT r_name, n_name,
       round(sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(25,6))), 2)::DOUBLE AS revenue
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    description="5-way star join (broadcast dims) + two-level agg",
)
def q05(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@query(
    "q06_forecast_revenue",
    oracle="""
SELECT round(sum(CAST(l_extendedprice * l_discount
                      AS DECIMAL(25,6))), 2)::DOUBLE AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25
""",
    description="TPC-H Q6: tight filter + single agg (pushdown showcase)",
)
def q06(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 25)
    ).agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("revenue"))


@query(
    "q07_customer_order_stats",
    oracle="""
SELECT c_custkey, c_name,
       count(o_orderkey)                        AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
    description="left outer join + null-preserving aggregation",
)
def q07(spark, sf_dir):
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "q08_semi_high_value",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
    description="left-semi join (J1 existence probe, SURVEY §2.3)",
)
def q08(spark, sf_dir):
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q09_anti_no_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
    description="left-anti join (J3 stale detection shape, SURVEY §2.3)",
)
def q09(spark, sf_dir):
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q69_cross_region_pairs",
    oracle="""
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
WHERE a.r_name < b.r_name
""",
    description="cross join (nested-loop) over small dims",
)
def q69(spark, sf_dir):
    r = load(spark, "region", sf_dir)
    a = r.select(F.col("r_name").alias("region_a"))
    b = r.select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b).filter(F.col("region_a") < F.col("region_b"))


@query(
    "q12_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    description="hierarchical subtotals via ROLLUP",
)
def q12(spark, sf_dir):
    return (
        load(spark, "lineitem", sf_dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "q13_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    description="full cross-dimensional subtotals via CUBE",
)
def q13(spark, sf_dir):
    return (
        load(spark, "orders", sf_dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("sum_price"), F.count("*").alias("n"))
    )


@query(
    "q14_grouping_sets",
    oracle="""
SELECT p_brand, p_type, count(*) AS n, round(sum(p_retailprice), 2) AS sum_price
FROM part GROUP BY GROUPING SETS ((p_brand), (p_type), ())
""",
    description="explicit GROUPING SETS",
)
def q14(spark, sf_dir):
    load(spark, "part", sf_dir).createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand, p_type, count(*) AS n, round(sum(p_retailprice), 2) AS sum_price
        FROM part GROUP BY GROUPING SETS ((p_brand), (p_type), ())
        """
    )


@query(
    "q15_distinct_agg",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*)                  AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    description="multiple exact distinct aggregates",
)
def q15(spark, sf_dir):
    return (
        load(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q18_pivot",
    oracle="""
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
FROM lineitem GROUP BY l_returnflag
""",
    description="pivot on linestatus (conditional aggregation form)",
)
def q18(spark, sf_dir):
    return (
        load(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@query(
    "q19_set_ops",
    oracle="""
SELECT 'union' AS op, nk FROM (
  SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'intersect', nk FROM (
  SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except', nk FROM (
  SELECT c_nationkey AS nk FROM customer WHERE c_nationkey < 10
  EXCEPT SELECT s_nationkey FROM supplier WHERE s_nationkey >= 5)
""",
    description="UNION / INTERSECT / EXCEPT distinct set semantics",
)
def q19(spark, sf_dir):
    c = load(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nk"))
    s = load(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nk"))
    u = c.union(s).distinct().withColumn("op", F.lit("union"))
    i = c.intersect(s).withColumn("op", F.lit("intersect"))
    e = (
        c.filter(F.col("nk") < 10)
        .subtract(s.filter(F.col("nk") >= 5))  # EXCEPT (distinct) semantics
        .withColumn("op", F.lit("except"))
    )
    return u.unionByName(i).unionByName(e).select("op", "nk")


@query(
    "q20_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name)                          AS name_upper,
       length(p_name)::INT                    AS name_len,
       substring(p_name, 1, 5)                AS name_prefix,
       split_part(p_name, ' ', 1)             AS first_word,
       replace(p_type, 'O', '0')              AS type_leet,
       concat_ws('|', p_brand, p_type)        AS brand_type,
       lpad(p_size::VARCHAR, 4, '0')          AS size_padded,
       regexp_extract(p_brand, '#(\\d+)', 1)  AS brand_num,
       trim('  ' || p_name || '  ')           AS trimmed
FROM part WHERE p_partkey % 10 = 0
""",
    description="scalar string function family (P1-P10 SURVEY §2.2)",
)
def q20(spark, sf_dir):
    p = load(spark, "part", sf_dir).filter(F.col("p_partkey") % 10 == 0)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("type_leet"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract(F.col("p_brand"), r"#(\d+)", 1).alias("brand_num"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
    )


@query(
    "q21_date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)::INT                  AS yr,
       month(o_orderdate)::INT                 AS mon,
       day(o_orderdate)::INT                   AS dom,
       quarter(o_orderdate)::INT               AS qtr,
       (isodow(o_orderdate) - 1)::INT          AS wd,
       date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
       o_orderdate::DATE + 30                  AS plus_30,
       date_diff('day', o_orderdate::DATE, DATE '2000-01-01')::INT AS days_to_y2k,
       last_day(o_orderdate::DATE)             AS month_end
FROM orders WHERE o_orderkey % 50 = 0
""",
    description="scalar date/time function family (P7-P11 SURVEY §2.2)",
)
def q21(spark, sf_dir):
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderkey") % 50 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekday("o_orderdate").alias("wd"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(d, 30).alias("plus_30"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.last_day(d).alias("month_end"),
    )


@query(
    "q23_conditional_agg",
    oracle="""
SELECT o_orderstatus,
       sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)::BIGINT AS n_large,
       sum(CASE WHEN o_totalprice <= 200000 THEN 1 ELSE 0 END)::BIGINT AS n_small,
       sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS n_urgent
FROM orders GROUP BY o_orderstatus
""",
    description="mutation-counter style conditional aggregation (A2-A5 SURVEY §2.4)",
)
def q23(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("n_large"),
        F.sum(F.when(F.col("o_totalprice") <= 200000, 1).otherwise(0)).alias("n_small"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias(
            "n_urgent"
        ),
    )


@query(
    "q90_unpivot",
    oracle="""
SELECT p_partkey, 'p_size' AS metric, p_size::DOUBLE AS val
FROM part WHERE p_partkey % 20 = 0
UNION ALL
SELECT p_partkey, 'p_retailprice', p_retailprice
FROM part WHERE p_partkey % 20 = 0
""",
    description="unpivot/melt wide columns into (metric, val) rows",
)
def q90(spark, sf_dir):
    p = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") % 20 == 0)
        .select("p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice")
    )
    return p.unpivot(["p_partkey"], ["p_size", "p_retailprice"], "metric", "val")


@query(
    "q47_correlated_scalar_subquery",
    oracle="""
SELECT c_custkey, c_acctbal,
       (SELECT round(max(o_totalprice), 2) FROM orders
        WHERE o_custkey = c_custkey) AS max_order
FROM customer WHERE c_custkey % 7 = 0
""",
    description="correlated scalar subquery (J2 lookup shape; Catalyst decorrelates)",
)
def q47(spark, sf_dir):
    load(spark, "customer", sf_dir).createOrReplaceTempView("customer")
    load(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               (SELECT round(max(o_totalprice), 2) FROM orders
                WHERE o_custkey = c_custkey) AS max_order
        FROM customer WHERE c_custkey % 7 = 0
        """
    )


@query(
    "q87_in_subquery",
    oracle="""
SELECT p_brand, count(*) AS n_parts
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
GROUP BY p_brand
""",
    description="IN-subquery (decorrelated to semi join) + agg",
)
def q87(spark, sf_dir):
    load(spark, "part", sf_dir).createOrReplaceTempView("part")
    load(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_parts
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        GROUP BY p_brand
        """
    )


@query(
    "q89_null_semantics",
    oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')     AS segment_or_other,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal = 0 THEN 'zero'
            ELSE 'credit' END                                  AS balance_class,
       (c_acctbal IS NOT NULL AND c_acctbal > 5000)            AS is_high,
       greatest(c_acctbal, 0.0)                                AS floored,
       least(round(c_acctbal, 0), 1000.0)                      AS capped
FROM customer WHERE c_custkey % 11 = 0
""",
    description="null-handling scalar family: coalesce/nullif/case/greatest/least",
)
def q89(spark, sf_dir):
    c = load(spark, "customer", sf_dir).filter(F.col("c_custkey") % 11 == 0)
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") == 0, "zero")
        .otherwise("credit")
        .alias("balance_class"),
        (F.col("c_acctbal").isNotNull() & (F.col("c_acctbal") > 5000)).alias("is_high"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("floored"),
        F.least(F.round("c_acctbal", 0), F.lit(1000.0)).alias("capped"),
    )


@query(
    "q52_fuzzy_name_match",
    oracle="""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a JOIN part b
  ON a.p_type = b.p_type AND a.p_partkey < b.p_partkey
WHERE a.p_partkey % 10 = 0 AND b.p_partkey % 10 = 0
  AND levenshtein(a.p_name, b.p_name) <= 3
""",
    description="fuzzy dedup: type-blocked join + Levenshtein edit distance",
)
def q52(spark, sf_dir):
    p = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name", "p_type")
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"), "p_type"
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"), "p_type"
    )
    return (
        a.join(b, ["p_type"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("key_a", "key_b", "edit_dist")
    )


@query(
    "q50_range_join",
    oracle="""
WITH points AS (
  SELECT s_suppkey, round(abs(s_acctbal) % 100, 2) AS v FROM supplier),
intervals AS (
  SELECT n_nationkey, (n_nationkey * 4.0)::DOUBLE AS lo,
         (n_nationkey * 4.0 + 6.0)::DOUBLE AS hi
  FROM nation)
SELECT s_suppkey, v, n_nationkey, lo, hi
FROM points JOIN intervals ON v >= lo AND v < hi
""",
    description="range/interval join via bucketize + equi-join + exact filter",
)
def q50(spark, sf_dir):
    from ..operators.range_join import interval_join

    points = load(spark, "supplier", sf_dir).select(
        "s_suppkey", F.round(F.abs(F.col("s_acctbal")) % 100, 2).alias("v")
    )
    intervals = load(spark, "nation", sf_dir).select(
        "n_nationkey",
        (F.col("n_nationkey") * 4.0).alias("lo"),
        (F.col("n_nationkey") * 4.0 + 6.0).alias("hi"),
    )
    return interval_join(points, intervals, "v", "lo", "hi", bucket_width=2.0)


# =====================================================================
# Round-1 widening: TPC-H Q2/Q11/Q15 shapes, multiset ops, map columns,
# extended date arithmetic (NOTES.md round-2 candidate #6 pulled forward)
# =====================================================================


@query(
    "q54_min_cost_per_part",
    oracle="""
WITH offers AS (SELECT l_partkey, l_suppkey, l_extendedprice FROM lineitem),
mins AS (SELECT l_partkey, min(l_extendedprice) AS min_price
         FROM offers GROUP BY l_partkey)
SELECT p.p_partkey, p.p_brand,
       round(m.min_price, 2)          AS min_price,
       count(DISTINCT o.l_suppkey)    AS n_best_supp
FROM part p
JOIN mins m   ON m.l_partkey = p.p_partkey
JOIN offers o ON o.l_partkey = p.p_partkey AND o.l_extendedprice = m.min_price
WHERE p.p_size <= 15
GROUP BY p.p_partkey, p.p_brand, m.min_price
""",
    description=(
        "TPC-H Q2 shape: cheapest offer per part via min-agg + join-back "
        "(decorrelated min subquery). lineitem stands in for partsupp."
    ),
)
def q54(spark, sf_dir):
    # Scale notes: `mins` is one shuffle on l_partkey and shrinks lineitem
    # to one row per part; the join-back reuses the same key so AQE can
    # plan a co-partitioned join. `part` is the small side -> broadcast.
    offers = load(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    mins = (
        offers.groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
        .withColumnRenamed("l_partkey", "m_partkey")
    )
    best = offers.join(
        mins,
        (offers.l_partkey == mins.m_partkey)
        & (offers.l_extendedprice == mins.min_price),
    ).select("l_partkey", "l_suppkey", "min_price")
    p = load(spark, "part", sf_dir).filter(F.col("p_size") <= 15)
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_brand", "min_price")
        .agg(F.count_distinct("l_suppkey").alias("n_best_supp"))
        .select(
            "p_partkey",
            "p_brand",
            F.round("min_price", 2).alias("min_price"),
            "n_best_supp",
        )
    )


@query(
    "q55_supplier_value_share",
    oracle="""
WITH rev AS (SELECT l_suppkey, count(*) AS n_items,
                    sum(l_extendedprice * (1 - l_discount)) AS revenue
             FROM lineitem GROUP BY l_suppkey)
SELECT l_suppkey, n_items, round(revenue, 2) AS revenue
FROM rev
WHERE n_items > (SELECT sum(n_items) FROM rev) * 0.0002
""",
    description=(
        "TPC-H Q11 shape: per-group value filtered against a global scalar "
        "aggregate (HAVING share-of-total). Threshold on integer counts so "
        "membership is float-order independent."
    ),
)
def q55(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
    # global scalar: single-row aggregate broadcast into a nested-loop
    # (cross) join -- no shuffle of `rev`, threshold evaluated map-side
    total = rev.agg(F.sum("n_items").alias("total_items"))
    return (
        rev.join(F.broadcast(total))
        .filter(F.col("n_items") > F.col("total_items") * 0.0002)
        .select("l_suppkey", "n_items", F.round("revenue", 2).alias("revenue"))
    )


@query(
    "q56_top_supplier",
    oracle="""
WITH activity AS (SELECT l_suppkey, count(*) AS n_shipped
                  FROM lineitem WHERE year(l_shipdate) = 1995
                  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, a.n_shipped
FROM supplier s JOIN activity a ON a.l_suppkey = s.s_suppkey
WHERE a.n_shipped = (SELECT max(n_shipped) FROM activity)
""",
    description=(
        "TPC-H Q15 shape: top supplier(s) by windowed activity via CTE + "
        "scalar max subquery; ties all returned (integer metric, "
        "deterministic across engines)."
    ),
)
def q56(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir).filter(F.year("l_shipdate") == 1995)
    activity = li.groupBy("l_suppkey").agg(F.count("*").alias("n_shipped"))
    top = activity.agg(F.max("n_shipped").alias("max_shipped"))
    s = load(spark, "supplier", sf_dir)
    return (
        activity.join(F.broadcast(top))
        .filter(F.col("n_shipped") == F.col("max_shipped"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_shipped")
    )


@query(
    "q57_multiset_ops",
    oracle="""
SELECT 'intersect_all' AS op, nk FROM (
  SELECT c_nationkey AS nk FROM customer
  INTERSECT ALL
  SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except_all', nk FROM (
  SELECT s_nationkey AS nk FROM supplier
  EXCEPT ALL
  SELECT c_nationkey FROM customer WHERE c_custkey % 50 = 0)
""",
    description=(
        "multiset set-ops: INTERSECT ALL / EXCEPT ALL (bag semantics; "
        "q19 covers the distinct variants). The EXCEPT side subtracts a "
        "1-in-50 customer sample so the remainder is non-empty at every "
        "scale factor (a %2 sample saturates from sf0.01 up)."
    ),
)
def q57(spark, sf_dir):
    c = load(spark, "customer", sf_dir)
    s = load(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nk"))
    c_all = c.select(F.col("c_nationkey").alias("nk"))
    c_even = c.filter(F.col("c_custkey") % 50 == 0).select(
        F.col("c_nationkey").alias("nk")
    )
    ia = c_all.intersectAll(s).select(F.lit("intersect_all").alias("op"), "nk")
    ea = s.exceptAll(c_even).select(F.lit("except_all").alias("op"), "nk")
    return ia.unionByName(ea)


@query(
    "q58_map_column",
    oracle="""
WITH lines AS (SELECT l_orderkey, l_linenumber, max(l_quantity) AS qty
               FROM lineitem WHERE l_orderkey % 7 = 0
               GROUP BY l_orderkey, l_linenumber)
SELECT l_orderkey,
       count(*)                                              AS n_lines,
       round(max(CASE WHEN l_linenumber = 1 THEN qty END), 4) AS qty_line1,
       max(l_linenumber)                                     AS max_line
FROM lines GROUP BY l_orderkey
""",
    description=(
        "map-typed column plumbing: per-order map<linenumber,quantity> built "
        "with map_from_entries (keys uniqued by max-qty pre-agg, since the "
        "synthetic lineitem repeats linenumbers), then probed via "
        "size / element_at / map_keys; oracle computes the same facts "
        "relationally"
    ),
)
def q58(spark, sf_dir):
    li = (
        load(spark, "lineitem", sf_dir)
        .filter(F.col("l_orderkey") % 7 == 0)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.max("l_quantity").alias("l_quantity"))
    )
    m = li.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("line_qty")
    )
    return m.select(
        "l_orderkey",
        F.size("line_qty").alias("n_lines"),
        F.round(F.element_at("line_qty", F.lit(1)), 4).alias("qty_line1"),
        F.array_max(F.map_keys("line_qty")).alias("max_line"),
    )


@query(
    "q59_date_arith_extended",
    oracle="""
SELECT o_orderkey,
       date_diff('month', date_trunc('month', o_orderdate)::DATE,
                 DATE '2000-01-01')::INT              AS months_to_y2k,
       (o_orderdate::DATE + INTERVAL 3 MONTH)::DATE   AS plus_quarter,
       o_orderdate::DATE - 45                         AS minus_45,
       date_trunc('quarter', o_orderdate)::DATE       AS quarter_start,
       dayofyear(o_orderdate)::INT                    AS doy,
       weekofyear(o_orderdate)::INT                   AS iso_week
FROM orders WHERE o_orderkey % 37 = 0
""",
    description=(
        "extended date arithmetic: months_between / add_months / date_sub / "
        "quarter trunc / day-of-year / ISO week (complements q21)"
    ),
)
def q59(spark, sf_dir):
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderkey") % 37 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.months_between(F.lit("2000-01-01").cast("date"), F.trunc(d, "MM"))
        .cast("int")
        .alias("months_to_y2k"),
        F.add_months(d, 3).alias("plus_quarter"),
        F.date_sub(d, 45).alias("minus_45"),
        F.trunc(d, "quarter").alias("quarter_start"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("iso_week"),
    )


@query(
    "q62_exists_not_exists",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
""",
    description=(
        "correlated EXISTS + NOT EXISTS (J1/J3 SURVEY §2.3 combined): "
        "customers with an urgent order and no finished order; semi join "
        "chained with anti join"
    ),
)
def q62(spark, sf_dir):
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .join(finished, F.col("c_custkey") == finished.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "q63_dominant_supplier",
    oracle="""
WITH ps AS (SELECT l_partkey, l_suppkey, count(*) AS n_lines
            FROM lineitem GROUP BY l_partkey, l_suppkey),
mx AS (SELECT l_partkey, max(n_lines) AS m FROM ps GROUP BY l_partkey),
winners AS (SELECT ps.l_partkey, ps.l_suppkey
            FROM ps JOIN mx ON mx.l_partkey = ps.l_partkey
                           AND ps.n_lines = mx.m),
unique_winners AS (SELECT l_partkey FROM winners
                   GROUP BY l_partkey HAVING count(*) = 1)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM supplier s
JOIN winners w ON w.l_suppkey = s.s_suppkey
JOIN unique_winners u ON u.l_partkey = w.l_partkey
""",
    description=(
        "TPC-H Q20 shape: nested aggregate subqueries -- for each part, "
        "the STRICT modal supplier (unique max line count); a fixed share "
        "threshold degenerates as supply spreads with scale, the argmax "
        "formulation stays non-trivial at every SF (integer counts, "
        "float-order independent)"
    ),
)
def q63(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    # all three aggregates reuse the l_partkey grouping: ps shuffles the
    # fact once; mx and the uniqueness check aggregate the (small) ps
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.count("*").alias("n_lines"))
    mx = ps.groupBy("l_partkey").agg(F.max("n_lines").alias("m"))
    winners = ps.join(
        mx.withColumnRenamed("l_partkey", "pk"),
        (ps.l_partkey == F.col("pk")) & (ps.n_lines == F.col("m")),
    ).select("l_partkey", "l_suppkey")
    unique_winners = (
        winners.groupBy("l_partkey").agg(F.count("*").alias("nw"))
        .filter("nw = 1")
        .select("l_partkey")
    )
    dominant = (
        winners.join(unique_winners, on="l_partkey", how="left_semi")
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, "supplier", sf_dir)
    return s.join(
        F.broadcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q64_sole_late_supplier",
    oracle="""
WITH li AS (SELECT l.l_orderkey, l.l_suppkey,
                   (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT s.s_suppkey, s.s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM li l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s.s_suppkey, s.s_name
""",
    description=(
        "TPC-H Q21 shape: suppliers who were the ONLY late shipper on "
        "multi-supplier orders (late := shipped >60 days after order "
        "date); correlated EXISTS/NOT EXISTS with inequality -> non-equi "
        "semi/anti joins"
    ),
)
def q64(spark, sf_dir):
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = (
        load(spark, "lineitem", sf_dir)
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)).alias(
                "late"
            ),
        )
    )
    l1 = li.filter("late").select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter("late").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    s = load(spark, "supplier", sf_dir)
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
    )


@query(
    "q66_lateral_topn",
    oracle="""
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2) t
""",
    description=(
        "correlated LATERAL subquery with ORDER BY + LIMIT (top-2 "
        "customers per nation); Spark plans it as a lateral join"
    ),
)
def q66(spark, sf_dir):
    load(spark, "nation", sf_dir).createOrReplaceTempView("nation")
    load(spark, "customer", sf_dir).createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2) t
        """
    )


# =====================================================================
# Round 2 widening: classic decision-support shapes not yet covered
# =====================================================================


@query(
    "q71_customer_distribution",
    oracle="""
WITH co AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
SELECT c_count, count(*) AS custdist
FROM co GROUP BY c_count
""",
    description=(
        "TPC-H Q13 shape: filtered LEFT OUTER join + two-level aggregation "
        "(orders-per-customer, then the distribution histogram). Customers "
        "with zero qualifying orders must survive as c_count=0"
    ),
)
def q71(spark, sf_dir):
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q72_small_qty_revenue",
    oracle="""
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT (sum(CAST(l2.l_quantity AS DECIMAL(25,6)))::DOUBLE
                              / count(l2.l_quantity)) * 0.2
                      FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
""",
    description=(
        "TPC-H Q17 shape: correlated per-key average subquery. Spark plan: "
        "per-part avg over the brand-reduced lineitem joined back -- the "
        "subquery becomes one broadcast-joined aggregate, never a per-row "
        "re-scan"
    ),
)
def q72(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    parts = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    # restrict lineitem once to the brand's parts; both the correlated avg
    # and the outer sum only ever touch these rows
    li_b = li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # threshold from an EXACT sum: a last-ulp wobble in avg() flips rows
    # sitting exactly on the 0.2*avg boundary (integer quantities land
    # there); decimal sum + one division + one multiply is bit-stable
    # across partition orders and engines
    pavg = li_b.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
            / F.count("l_quantity")
            * 0.2
        ).alias("_qty_cap")
    )
    return (
        li_b.join(F.broadcast(pavg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("_qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q73_top_nation_part_value",
    oracle="""
WITH sv AS (
  SELECT s.s_nationkey, l.l_partkey,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS raw_value,
         sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
           AS dec_value
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2)
SELECT s_nationkey, l_partkey, round(dec_value, 2)::DOUBLE AS value
FROM sv
WHERE raw_value > (SELECT 3.0 * avg(raw_value) FROM sv)
""",
    description=(
        "TPC-H Q11 shape: grouped value filtered against a global scalar "
        "aggregate (3x the mean group value -- scale-invariant, so the "
        "result stays non-degenerate across SFs). Spark: one-row aggregate "
        "broadcast-cross-joined as the threshold, no second scan. The "
        "REPORTED value sums as exact DECIMAL(18,4): double summation "
        "order differs between engines, and one sf0.01 group lands on an "
        "exact .005 rounding boundary (292712.095) where that order "
        "decides the 2-dp digit; per-row double->decimal casts agree "
        "bit-for-bit (no double is exactly on a 4-dp boundary), and "
        "decimal sums are order-independent"
    ),
)
def q73(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    supp = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_partkey")
        .agg(
            F.sum(rev).alias("raw_value"),
            F.sum(rev.cast("decimal(18,4)")).alias("dec_value"),
        )
    )
    thr = sv.agg((F.avg("raw_value") * 3.0).alias("_thr"))
    return (
        sv.join(F.broadcast(thr))
        .filter(F.col("raw_value") > F.col("_thr"))
        .select(
            "s_nationkey",
            "l_partkey",
            F.round("dec_value", 2).cast("double").alias("value"),
        )
    )


@query(
    "q74_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate)::INT AS l_year,
       round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(25,6))), 2)::DOUBLE AS revenue
FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
   OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')
GROUP BY 1, 2, 3
""",
    description=(
        "TPC-H Q7 shape: two-role nation dimension with a disjunctive "
        "pair predicate + year extraction. The nation filter applies "
        "post-join (the disjunction couples both sides), but both nation "
        "dims and supplier/customer broadcast, so lineitem+orders is the "
        "only shuffle"
    ),
)
def q74(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    supp = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("_n1k"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_n2k"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_20") & (F.col("cust_nation") == "NATION_11")
    ) | (
        (F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_20")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1k"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2k"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@query(
    "q75_disjunctive_revenue",
    oracle="""
SELECT round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(25,6))), 2)::DOUBLE AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    description=(
        "TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides. "
        "The per-side conjuncts (brand/size on part, quantity envelope on "
        "lineitem) are derivable, the cross-side disjunction stays as a "
        "post-join filter; part broadcasts"
    ),
)
def q75(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@query(
    "q80_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(25,6))), 2)::DOUBLE AS revenue,
       round(c.c_acctbal, 2) AS acctbal
FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    description=(
        "TPC-H Q10 shape: returned-item revenue per customer over a date "
        "window, top-20. lineitem+orders is the only shuffle; customer and "
        "nation broadcast"
    ),
)
def q80(spark, sf_dir):
    cust = load(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    orders = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    nation = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "nation",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q81_promo_revenue",
    oracle="""
SELECT round(100.0 * sum(CAST(CASE WHEN p.p_type = 'PROMO'
                                   THEN l.l_extendedprice * (1 - l.l_discount)
                                   ELSE 0 END AS DECIMAL(25,6)))::DOUBLE
             / sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(25,6)))::DOUBLE, 4) AS promo_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1996-02-01'
""",
    description=(
        "TPC-H Q14 shape: conditional-share aggregate (promo revenue %) "
        "over one shipdate month; part broadcasts, the month filter is "
        "pushed to the lineitem scan"
    ),
)
def q81(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    part = load(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(F.lit(0.0))
                    .cast(_DEC)
                ).cast("double")
                / F.sum(rev.cast(_DEC)).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q82_parts_supplier_count",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
    description=(
        "TPC-H Q16 shape (lineitem stands in for partsupp): distinct "
        "supplier count per (brand, type, size) excluding suppliers on a "
        "deny-list subquery. The NOT IN becomes a broadcast left_anti join"
    ),
)
def q82(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    part = load(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q83_large_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY 1 HAVING sum(l_quantity) > 250)
GROUP BY 1, 2, 3, 4, 5
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
""",
    description=(
        "TPC-H Q18 shape: large-volume orders via a grouped-HAVING IN "
        "subquery, re-joined to customer/orders for the top-20 report. The "
        "HAVING set is tiny after reduction, so its semi join broadcasts "
        "under AQE; lineitem aggregates map-side before the final sort"
    ),
)
def q83(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 250)
        .select(F.col("l_orderkey").alias("_bigkey"))
    )
    o_big = orders.join(
        F.broadcast(big), orders.o_orderkey == F.col("_bigkey"), "left_semi"
    )
    return (
        li.select("l_orderkey", "l_quantity")
        .join(F.broadcast(o_big), li.l_orderkey == o_big.o_orderkey)
        .join(F.broadcast(cust), o_big.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q84_dormant_rich_customers",
    oracle="""
SELECT c_nationkey AS cntry, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT sum(CAST(c_acctbal AS DECIMAL(25,6)))::DOUBLE
                          / count(c_acctbal)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
""",
    description=(
        "TPC-H Q22 shape: above-average-balance customers with no recent "
        "orders. The scalar avg broadcasts as a one-row cross join; the "
        "NOT EXISTS becomes a left_anti join against date-filtered orders"
    ),
)
def q84(spark, sf_dir):
    cust = load(spark, "customer", sf_dir)
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
            / F.count("c_acctbal")
        ).alias("_thr")
    )
    recent = load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_thr"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q85_market_share",
    oracle="""
WITH vol AS (
  SELECT year(o.o_orderdate)::INT AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
SELECT o_year,
       round(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE 0 END AS DECIMAL(25,6)))::DOUBLE
             / sum(CAST(volume AS DECIMAL(25,6)))::DOUBLE, 6) AS mkt_share
FROM vol GROUP BY o_year
""",
    description=(
        "TPC-H Q8 shape: one nation's share of promo-part volume sold into "
        "one region, per year. All five dimensions broadcast; "
        "lineitem+orders is the only shuffle, then a tiny per-year "
        "conditional-share aggregate"
    ),
)
def q85(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    supp = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir)
    # customer nations restricted to the target region
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select(F.col("n_nationkey").alias("_cnk"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(asia_nations), cust.c_nationkey == F.col("_cnk"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), supp.s_nationkey == F.col("_snk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(F.lit(0.0))
                .cast(_DEC)
            ).cast("double")
            / F.sum(F.col("volume").cast(_DEC)).cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q86_nation_profit",
    oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate)::INT AS o_year,
       round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      - 0.6 * p.p_retailprice * l.l_quantity
                      AS DECIMAL(25,6))), 2)::DOUBLE AS profit
FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    description=(
        "TPC-H Q9 shape (retail-price margin stands in for ps_supplycost): "
        "per-nation, per-year profit on a part-name LIKE family. part/"
        "supplier/nation broadcast; the LIKE prunes lineitem before the "
        "orders shuffle"
    ),
)
def q86(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir).filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    supp = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    orders = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    nation = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(_dsum(profit, 2).alias("profit"))
    )


@query(
    "q92_snapshot_diff",
    oracle="""
WITH newv AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 97 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 53 = 0),
oldv AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer)
SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'added'
            WHEN n.c_custkey IS NULL THEN 'removed'
            WHEN o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
                 AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment
              THEN 'unchanged'
            ELSE 'changed' END AS diff
FROM oldv o FULL OUTER JOIN newv n ON o.c_custkey = n.c_custkey
""",
    description=(
        "snapshot reconciliation: full-outer key join of two table "
        "versions classified added/removed/changed/unchanged with "
        "NULL-safe struct comparison (the time-travel diff for "
        "IncrementalTable.read_at versions; here the 'new' version is a "
        "deterministic mutation of customer so every branch is non-empty)"
    ),
)
def q92(spark, sf_dir):
    from ..operators.diff import snapshot_diff

    cust = load(spark, "customer", sf_dir).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    modified = cust.filter(F.col("c_custkey") % 97 != 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
    )
    added = cust.filter(F.col("c_custkey") % 53 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    return snapshot_diff(
        cust, modified.unionByName(added), keys=["c_custkey"]
    )


@query(
    "q93_stat_profile",
    oracle="""
WITH m AS (
  SELECT c_mktsegment,
         count(c_acctbal)::DOUBLE AS n,
         sum(CAST(c_acctbal AS DECIMAL(25,6)))::DOUBLE AS s1,
         sum(CAST(c_acctbal * c_acctbal AS DECIMAL(38,12)))::DOUBLE AS s2,
         sum(CAST(c_nationkey AS DECIMAL(25,6)))::DOUBLE AS sy,
         sum(CAST(c_nationkey * c_nationkey AS DECIMAL(38,12)))::DOUBLE AS syy,
         sum(CAST(c_acctbal * c_nationkey AS DECIMAL(38,12)))::DOUBLE AS sxy
  FROM customer GROUP BY c_mktsegment)
SELECT c_mktsegment,
       round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS sd_acctbal,
       round((s2 - s1 * s1 / n) / (n - 1), 4) AS var_acctbal,
       round((sxy - s1 * sy / n) / (n - 1), 4) AS cov_bal_nation,
       round((n * sxy - s1 * sy)
             / (sqrt(n * s2 - s1 * s1) * sqrt(n * syy - sy * sy)),
             6) AS corr_bal_nation,
       round(s1 / n, 4) AS mean_acctbal
FROM m
""",
    description=(
        "statistical profiling aggregates: sample stddev/variance, "
        "covariance, Pearson correlation per segment -- the numeric "
        "column-profiling pass a data-quality stage runs before training. "
        "Built from EXACT decimal moments (n, sum x, sum x^2, sum xy) so "
        "every statistic is a fixed IEEE expression over order-independent "
        "sums: bit-identical across partition orders AND engines (the "
        "built-in streaming stddev/corr accumulate doubles in partition "
        "order and wobble in the last ulp)"
    ),
)
def q93(spark, sf_dir):
    x = F.col("c_acctbal")
    y = F.col("c_nationkey")
    c = load(spark, "customer", sf_dir)
    m = c.groupBy("c_mktsegment").agg(
        F.count("c_acctbal").cast("double").alias("n"),
        F.sum(x.cast(_DEC)).cast("double").alias("s1"),
        F.sum((x * x).cast("decimal(38,12)")).cast("double").alias("s2"),
        F.sum(y.cast(_DEC)).cast("double").alias("sy"),
        F.sum((y * y).cast("decimal(38,12)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(38,12)")).cast("double").alias("sxy"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return m.select(
        "c_mktsegment",
        F.round(F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 4).alias("sd_acctbal"),
        F.round((s2 - s1 * s1 / n) / (n - 1), 4).alias("var_acctbal"),
        F.round((sxy - s1 * sy / n) / (n - 1), 4).alias("cov_bal_nation"),
        F.round(
            (n * sxy - s1 * sy)
            / (F.sqrt(n * s2 - s1 * s1) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_bal_nation"),
        F.round(s1 / n, 4).alias("mean_acctbal"),
    )


@query(
    "q96_column_profile",
    oracle=f"""
SELECT count(*) AS n_rows,
       count(o_totalprice) AS price_nonnull,
       round(min(o_totalprice), 2) AS price_min,
       round(max(o_totalprice), 2) AS price_max,
       {_davg_sql("o_totalprice", 4)} AS price_mean,
       count(DISTINCT o_orderstatus) AS status_distinct,
       count(DISTINCT o_orderpriority) AS priority_distinct,
       min(o_orderdate) AS date_min,
       max(o_orderdate) AS date_max,
       count(DISTINCT o_custkey) AS cust_distinct
FROM orders
""",
    description=(
        "ANALYZE-style column profiling in ONE pass: null counts, "
        "min/max/mean, distinct cardinalities -- the data-quality "
        "manifest a pipeline records per ingested partition (all "
        "aggregates share a single scan + one partial-agg shuffle)"
    ),
)
def q96(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_totalprice").alias("price_nonnull"),
        F.round(F.min("o_totalprice"), 2).alias("price_min"),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
        _davg("o_totalprice", 4).alias("price_mean"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.countDistinct("o_orderpriority").alias("priority_distinct"),
        F.min("o_orderdate").alias("date_min"),
        F.max("o_orderdate").alias("date_max"),
        F.countDistinct("o_custkey").alias("cust_distinct"),
    )


@query(
    "z09_footer_stats",
    oracle="""
SELECT min(o_totalprice) AS price_min,
       max(o_totalprice) AS price_max,
       count(o_totalprice) AS n_price,
       count(o_orderkey)  AS n_key
FROM orders
""",
    description=(
        "footer-only table stats: MIN/MAX/COUNT served from parquet "
        "metadata via scoped aggregate pushdown (PushedAggregation) -- a "
        "metadata pass where the oracle pays a scan"
    ),
)
def z09(spark, sf_dir):
    from ..sources.catalog import parquet_footer_stats

    st = parquet_footer_stats(
        spark, f"{sf_dir}/orders.parquet", ["o_totalprice", "o_orderkey"]
    )
    return spark.createDataFrame(
        [
            (
                st["o_totalprice"]["min"],
                st["o_totalprice"]["max"],
                st["o_totalprice"]["count"],
                st["o_orderkey"]["count"],
            )
        ],
        "price_min double, price_max double, n_price bigint, n_key bigint",
    )


@query(
    "z17_salted_join",
    oracle="""
SELECT n.n_name AS nation,
       count(*) AS n_customers,
       round(sum(CAST(c_acctbal AS DECIMAL(25,6))), 2)::DOUBLE AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
""",
    description=(
        "skew-safe replicated-build equi-join: the big probe side gets a "
        "deterministic per-row salt, the dimension is exploded n_salts "
        "ways, and the join runs on (key, salt) so one hot key spreads "
        "over n_salts shuffle partitions. Result-identical to the plain "
        "join (oracle-pinned); for dims that fit in memory prefer "
        "broadcast -- no shuffle to skew -- this is the mid-size-build "
        "escape hatch"
    ),
)
def z17(spark, sf_dir):
    from ..operators.skew import salted_join

    cust = load(spark, "customer", sf_dir).select("c_nationkey", "c_custkey", "c_acctbal")
    nat = (
        load(spark, "nation", sf_dir)
        .select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
    )
    joined = salted_join(
        cust, nat, on=["c_nationkey"], salt=8, salt_expr=F.xxhash64("c_custkey")
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(25,6)")), 2)
        .cast("double")
        .alias("total_acctbal"),
    )


@query(
    "z34_zorder_key",
    oracle=f"""
WITH z AS (
  SELECT {xhash.zorder_key_sql('o_custkey', '(o_orderkey % 65536)')} AS zk
  FROM orders)
SELECT (zk >> 20)::BIGINT AS z_bucket,
       count(*) AS n,
       min(zk)::BIGINT AS min_key,
       max(zk)::BIGINT AS max_key
FROM z GROUP BY 1
""",
    description=(
        "Morton (Z-order) interleave key over two integer columns, "
        "bucketed: the multi-column data-layout key (Delta ZORDER shape) "
        "as a pure shift/mask codegen chain with an exact SQL twin; the "
        "write_zordered sink range-partitions by this key so one file "
        "layout serves 2-D box queries via manifest pruning (test-pinned)"
    ),
)
def z34(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    zk = xhash.zorder_key(
        F.col("o_custkey"), F.col("o_orderkey") % 65536, bits=16
    )
    return (
        o.select(zk.alias("zk"))
        .groupBy(F.expr("zk div 1048576").alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("zk").alias("min_key"),
            F.max("zk").alias("max_key"),
        )
    )


@query(
    "z38_constraint_audit",
    oracle="""
WITH checks AS (
  SELECT
    sum(CASE WHEN NOT coalesce(l_quantity > 0, FALSE)
             THEN 1 ELSE 0 END)::BIGINT AS v_qty,
    sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 0.08, FALSE)
             THEN 1 ELSE 0 END)::BIGINT AS v_disc,
    sum(CASE WHEN NOT coalesce(l_tax BETWEEN 0 AND 0.05, FALSE)
             THEN 1 ELSE 0 END)::BIGINT AS v_tax
  FROM lineitem),
uniq AS (
  SELECT coalesce(sum(c), 0)::BIGINT AS v FROM (
    SELECT count(*) AS c FROM lineitem
    GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)),
fk AS (
  SELECT coalesce(sum(n_rows), 0)::BIGINT AS v FROM (
    SELECT l_orderkey, count(*) AS n_rows FROM lineitem GROUP BY l_orderkey) c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = c.l_orderkey))
SELECT 'discount_range' AS "constraint", 'check' AS kind,
       v_disc AS n_violations, v_disc = 0 AS passed FROM checks
UNION ALL SELECT 'qty_positive', 'check', v_qty, v_qty = 0 FROM checks
UNION ALL SELECT 'tax_range', 'check', v_tax, v_tax = 0 FROM checks
UNION ALL SELECT 'pk_lineitem', 'unique', v, v = 0 FROM uniq
UNION ALL SELECT 'fk_orderkey', 'foreign_key', v, v = 0 FROM fk
""",
    description=(
        "declarative constraint audit as dataflow (the reference's "
        "per-row PL/pgSQL EXCEPTION blocks re-expressed as queries, "
        "sql:244-247): ALL scalar checks fold into ONE aggregate pass "
        "(per-constraint sum(case) counters -- adding a check adds a "
        "codegen'd counter, not a scan), key uniqueness is one hash "
        "aggregate, referential integrity a distinct-reduced anti join; "
        "long-form scorecard (constraint, kind, n_violations, passed). "
        "The synthetic lineitem genuinely violates the PK and the "
        "discount/tax ranges at every SF, so the audit is non-trivial"
    ),
)
def z38(spark, sf_dir):
    from ..operators import constraints as C

    li = load(spark, "lineitem", sf_dir)
    return C.constraint_report(
        li,
        checks={
            "qty_positive": F.col("l_quantity") > 0,
            "discount_range": F.col("l_discount").between(0.0, 0.08),
            "tax_range": F.col("l_tax").between(0.0, 0.05),
        },
        unique_keys={"pk_lineitem": ["l_orderkey", "l_linenumber"]},
        foreign_keys={
            "fk_orderkey": (
                load(spark, "orders", sf_dir),
                {"l_orderkey": "o_orderkey"},
            )
        },
    )


@query(
    "z40_histogram",
    oracle="""
WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
           FROM lineitem),
w AS (SELECT lo, hi, (hi - lo) / 20.0 AS width FROM b),
binned AS (
  SELECT l_returnflag,
         CASE WHEN hi = lo THEN 0
              ELSE least(floor((l_extendedprice - lo) / width)::INT, 19)
         END AS bin,
         lo, width
  FROM lineitem CROSS JOIN w)
SELECT l_returnflag, bin,
       lo + bin * width AS bin_lo,
       lo + (bin + 1) * width AS bin_hi,
       count(*) AS n_rows
FROM binned
GROUP BY l_returnflag, bin, lo, width
""",
    description=(
        "equi-width histogram per return flag: 1-row min/max aggregate "
        "broadcast-crossed back + one group count -- two passes total, "
        "never a per-group rescan; floor/division bin arithmetic is "
        "engine-exact (max value clamped into the last bin)"
    ),
)
def z40(spark, sf_dir):
    return _sketch.equi_width_histogram(
        load(spark, "lineitem", sf_dir),
        "l_extendedprice",
        n_bins=20,
        group_by="l_returnflag",
    )


@query(
    "z60_reconciliation",
    oracle="""
WITH l AS (
  SELECT l_orderkey,
         round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                        AS DECIMAL(25,6))), 2)::DOUBLE AS recomputed
  FROM lineitem GROUP BY 1),
j AS (
  SELECT o.o_totalprice AS stored, l.recomputed
  FROM orders o JOIN l ON o.o_orderkey = l.l_orderkey),
s AS (
  SELECT count(*) AS n_checked,
         sum((abs(stored - recomputed) > 0.01)::BIGINT) AS n_mismatched,
         max(abs(stored - recomputed)) AS mx,
         round(sum(CAST(abs(stored - recomputed) AS DECIMAL(25,6))), 2)::DOUBLE
           AS total_abs_deviation
  FROM j),
c AS (
  SELECT count(*) AS n_parents_without_children
  FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM lineitem li WHERE li.l_orderkey = o.o_orderkey))
SELECT n_checked, n_mismatched, n_parents_without_children,
       round(mx, 6) AS max_abs_deviation, total_abs_deviation
FROM s CROSS JOIN c
""",
    description=(
        "header-vs-lines reconciliation audit: recompute each order's "
        "total from its lines (decimal-lifted associative sum, rounded "
        "to cents) and compare to the stored header total; summary "
        "counts + deviation stats + childless-parent count. One child "
        "aggregate + one co-partitioned join + an anti-join -- no "
        "per-parent rescans. (The synthetic orders total is independent "
        "of its lines, so every order mismatches -- the audit's job is "
        "to SAY so)"
    ),
)
def z60(spark, sf_dir):
    from ..operators.constraints import reconcile_parent_child

    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    return reconcile_parent_child(
        orders,
        li,
        key="l_orderkey",
        parent_total=F.col("o_totalprice"),
        child_amount=F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax")),
    )


@query(
    "z63_harmonic_mean",
    oracle="""
SELECT l_returnflag,
       round(count(l_extendedprice)
             / sum(CAST(1.0 / l_extendedprice AS DECIMAL(25,18)))::DOUBLE,
             6) AS harmonic_mean_price,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    description=(
        "harmonic mean price per return flag (the correct average for "
        "rates/ratios): n / sum(1/x) with the reciprocal sum lifted to "
        "DECIMAL(25,18) -- associative, partition-order-free (the "
        "q01/q49 rule; a raw double sum wobbles in the last ulp) -- and "
        "one final IEEE division"
    ),
)
def z63(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    inv = (F.lit(1.0) / F.col("l_extendedprice")).cast("decimal(25,18)")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.count("l_extendedprice") / F.sum(inv).cast("double"), 6
        ).alias("harmonic_mean_price"),
        F.count("*").alias("n_rows"),
    )


@query(
    "z65_minmax_scale",
    oracle="""
WITH b AS (
  SELECT o_orderstatus, min(o_totalprice) AS lo, max(o_totalprice) AS hi
  FROM orders GROUP BY o_orderstatus)
SELECT o.o_orderkey, o.o_orderstatus,
       CASE WHEN b.hi = b.lo THEN 0.0
            ELSE round((o.o_totalprice - b.lo) / (b.hi - b.lo), 6)
       END AS price_scaled
FROM orders o JOIN b USING (o_orderstatus)
""",
    description=(
        "per-group min-max feature scaling to [0, 1]: group bounds from "
        "one aggregate broadcast back, row-local (x - lo) / (hi - lo) "
        "-- single IEEE division, engine-exact; constant groups scale "
        "to 0 (no div-by-zero). The normalization staple next to "
        "z44's winsorize and q46's z-score"
    ),
)
def z65(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    b = o.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("_lo"), F.max("o_totalprice").alias("_hi")
    )
    return (
        o.join(F.broadcast(b), "o_orderstatus")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0.0))
            .otherwise(
                F.round(
                    (F.col("o_totalprice") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo")),
                    6,
                )
            )
            .alias("price_scaled"),
        )
    )


@query(
    "z67_sql_surface",
    oracle=f"""
SELECT nation, n_customers, total_revenue::DOUBLE AS total_revenue
FROM ({_Z67_SQL.replace(chr(10), ' ')}) t
""",
    description=(
        "the spark.sql() TEXT surface: the registry's DataFrame plans "
        "and raw ANSI SQL compile to the same Catalyst plans -- this "
        "entry registers the catalog tables as temp views and runs ONE "
        "SQL string that executes verbatim on BOTH engines (join + "
        "distinct-count + decimal-lifted sum + HAVING + order). A user "
        "of the reference's SQL files can paste their queries at this "
        "surface unchanged"
    ),
)
def z67(spark, sf_dir):
    for t in ("customer", "nation", "orders"):
        load(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(_Z67_SQL).withColumn(
        "total_revenue", F.col("total_revenue").cast("double")
    )


@query(
    "z72_join_fanout",
    oracle="""
WITH lc AS (
  SELECT l_partkey, count(*) AS rows_left FROM lineitem GROUP BY 1),
rc AS (
  SELECT l_partkey, count(*) AS rows_right FROM lineitem GROUP BY 1)
SELECT lc.l_partkey, rows_left, rows_right,
       rows_left * rows_right AS fanout
FROM lc JOIN rc USING (l_partkey)
ORDER BY fanout DESC, l_partkey LIMIT 10
""",
    description=(
        "pre-join cardinality audit: top keys by output fan-out "
        "(rows_left * rows_right) for an equi-join -- catches an "
        "accidental many-to-many row explosion BEFORE paying for it "
        "(here lineitem self-joined on partkey, the worst realistic "
        "key). One count-aggregate per side + a key join of the two "
        "count tables"
    ),
)
def z72(spark, sf_dir):
    from ..operators.constraints import join_fanout_audit

    li = load(spark, "lineitem", sf_dir)
    return join_fanout_audit(li, li, ["l_partkey"])


@query(
    "z79_fk_sweep",
    oracle="""
SELECT 'customer->nation' AS fk, count(*) AS n_violating_rows FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'lineitem->orders', count(*) FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem->part', count(*) FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem->supplier', count(*) FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'nation->region', count(*) FROM nation n
  WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)
UNION ALL
SELECT 'orders->customer', count(*) FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'supplier->nation', count(*) FROM supplier s
  WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
""",
    description=(
        "catalog-wide referential-integrity sweep: every declared FK "
        "relation checked in one report (child side distinct-reduced "
        "before each anti join -- the fk_violations plan -- so shuffles "
        "carry keys, not fact rows; dimension parents broadcast). The "
        "z78 row-parity sweep's join-integrity companion"
    ),
)
def z79(spark, sf_dir):
    from ..operators.constraints import fk_violations

    t = {n: load(spark, n, sf_dir) for n in (
        "customer", "nation", "region", "orders", "lineitem", "part",
        "supplier",
    )}
    rels = [
        ("customer->nation", t["customer"], t["nation"],
         {"c_nationkey": "n_nationkey"}),
        ("lineitem->orders", t["lineitem"], t["orders"],
         {"l_orderkey": "o_orderkey"}),
        ("lineitem->part", t["lineitem"], t["part"],
         {"l_partkey": "p_partkey"}),
        ("lineitem->supplier", t["lineitem"], t["supplier"],
         {"l_suppkey": "s_suppkey"}),
        ("nation->region", t["nation"], t["region"],
         {"n_regionkey": "r_regionkey"}),
        ("orders->customer", t["orders"], t["customer"],
         {"o_custkey": "c_custkey"}),
        ("supplier->nation", t["supplier"], t["nation"],
         {"s_nationkey": "n_nationkey"}),
    ]
    parts = []
    for name, child, parent, mapping in rels:
        parts.append(
            fk_violations(child, parent, mapping)
            .agg(
                F.coalesce(F.sum("n_rows"), F.lit(0))
                .cast("long")
                .alias("n_violating_rows")
            )
            .select(F.lit(name).alias("fk"), "n_violating_rows")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "z89_incremental_join_view",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
""",
    description=(
        "incremental view maintenance for an equi-join view: customers "
        "and orders each ingested in two interleaved append batches; "
        "every ingest emits exactly delta JOIN other-side-so-far (each "
        "joined pair materialized ONCE, by the later arrival), so the "
        "accumulated view equals the from-scratch join the oracle "
        "computes -- at O(|delta| x |other store|) per sync instead of "
        "O(|A| x |B|) per rebuild. The reference recomputes its joined "
        "outputs per run (SQL/etl_world_banks.sql re-reads whole tables); this "
        "is the 100 TB-shaped replacement"
    ),
)
def z89(spark, sf_dir):
    import shutil

    from ..operators.ivm import IncrementalJoinView

    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    orders = load(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    # persistent scratch under the warehouse dir (NOT a tempdir+collect:
    # the view is corpus-sized, and funneling it through the driver is
    # exactly the anti-pattern this operator exists to avoid) -- wiped
    # first so every invocation rebuilds the same four-batch history
    path = "spark-warehouse/z89_join_view"
    shutil.rmtree(path, ignore_errors=True)
    v = IncrementalJoinView(path, key="c_custkey")
    # interleaved arrival: half the customers, half the orders, rest
    # of the customers, rest of the orders -- every delta-rule branch
    # (dA x B_so_far, A_so_far x dB) is exercised. Batched ingest
    # (r16, VERDICT r15 #2): identical per-batch dirs, ledger order,
    # and as_of semantics (pinned by tests/test_ivm_batched.py), at
    # one store write per side + one view write + one ledger CAS
    # instead of (2 writes + CAS) x 4
    v.ingest_many(
        [
            ("left", cust.filter(F.col("c_custkey") % 2 == 0)),
            ("right", orders.filter(F.col("o_orderkey") % 2 == 0)),
            ("left", cust.filter(F.col("c_custkey") % 2 == 1)),
            ("right", orders.filter(F.col("o_orderkey") % 2 == 1)),
        ]
    )
    return v.read(spark).select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "z101_cdc_join_view",
    oracle="""
WITH cust AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 3 THEN c_name || ' (updated)'
              ELSE c_name END AS c_name
  FROM customer),
ord AS (
  SELECT o_custkey, o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
       1::BIGINT AS n_copies
FROM cust c JOIN ord o ON o.o_custkey = c.c_custkey
""",
    description=(
        "RETRACTION-capable incremental join view (DBSP z-set "
        "formulation, operators/ivm.py CdcJoinView): customers and "
        "orders inserted, then a customer-name UPDATE wave (-old +new "
        "multiplicities, one batch) and an order DELETE wave (-1) "
        "maintained incrementally -- no store rewrite, merge-on-read "
        "consolidation. The accumulated view must equal the "
        "from-scratch join of the CURRENT state the oracle computes. "
        "Extends z89 (insert-only delta rule) to the full CDC surface"
    ),
)
def z101(spark, sf_dir):
    import shutil

    from ..operators.ivm import CdcJoinView, signed

    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    orders = load(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    path = "spark-warehouse/z101_cdc_join_view"
    shutil.rmtree(path, ignore_errors=True)
    v = CdcJoinView(path, key="c_custkey")
    # update wave: every custkey ending in 3 gets a new name
    old = cust.filter(F.col("c_custkey") % 10 == 3)
    new = old.withColumn(
        "c_name", F.concat(F.col("c_name"), F.lit(" (updated)"))
    )
    # batched ingest (r16, VERDICT r15 #2): same four batches in the
    # same order with identical dirs/ledger/as_of (tests/
    # test_ivm_batched.py); one store write per side + one view write
    # + one CAS instead of per-delta fixed cost. The delete wave is
    # the -1 retraction of every 7th order
    v.ingest_many(
        [
            ("left", signed(cust, +1), "c0"),
            ("right", signed(orders, +1), "o0"),
            ("left", signed(old, -1).unionByName(signed(new, +1)), "c1"),
            ("right", signed(orders.filter(F.col("o_orderkey") % 7 == 0), -1), "o1"),
        ]
    )
    return v.read(spark).select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice", "n_copies"
    )


@query(
    "z102_cdc_agg_view",
    oracle="""
WITH state AS (
  SELECT CASE WHEN event_id % 11 = 3 THEN 'reclassified'
              ELSE event_type END AS event_type,
         value
  FROM events WHERE event_id % 11 <> 0)
SELECT event_type, count(*) AS n_rows,
       round(sum(CAST(value AS DECIMAL(25,6))), 2)::DOUBLE AS total_value
FROM state GROUP BY 1
""",
    description=(
        "RETRACTION-capable incremental aggregate view (DBSP linear "
        "aggregates, operators/ivm.py CdcAggView): events inserted in "
        "two waves, then an UPDATE wave reclassifying every 11th-mod-3 "
        "event (-old +new) and a DELETE wave (-1) -- each ingest is one "
        "O(|delta|) partial aggregate with ZERO reads of prior state; "
        "an in-gate compaction folds the partial history to one batch. "
        "The maintained counters must equal a from-scratch aggregate "
        "of the net state the oracle computes. Completes the z-set IVM "
        "pair: z101 is the bilinear join half, this the linear half"
    ),
)
def z102(spark, sf_dir):
    import shutil

    from ..operators.ivm import CdcAggView, signed

    ev = load(spark, "events", sf_dir).select("event_id", "event_type", "value")
    path = "spark-warehouse/z102_cdc_agg_view"
    shutil.rmtree(path, ignore_errors=True)
    v = CdcAggView(
        path,
        keys=["event_type"],
        measures={"total_value": "CAST(value AS DECIMAL(25,6))"},
    )
    # update wave: every event_id % 11 == 3 reclassified (group move);
    # delete wave: every event_id % 11 == 0 retracted. Batched ingest
    # (r16, VERDICT r15 #2): linear partials are independent, so the
    # four batches ride ONE partial write + ONE ledger CAS with
    # identical per-batch dirs/order (tests/test_ivm_batched.py)
    old = ev.filter(F.col("event_id") % 11 == 3)
    v.ingest_many(
        [
            (signed(ev.filter(F.col("event_id") % 2 == 0), +1), "i0"),
            (signed(ev.filter(F.col("event_id") % 2 == 1), +1), "i1"),
            (
                signed(old, -1).unionByName(
                    signed(
                        old.withColumn("event_type", F.lit("reclassified")),
                        +1,
                    )
                ),
                "u0",
            ),
            (signed(ev.filter(F.col("event_id") % 11 == 0), -1), "d0"),
        ]
    )
    v.compact(spark)  # merge-on-read bound exercised in-gate
    return v.read(spark).select(
        "event_type",
        "n_rows",
        F.round("total_value", 2).cast("double").alias("total_value"),
    )


from ..operators.constraints import profile_table_oracle_sql as _profile_sql  # noqa: E402

_Z110_COLS = ["doc_id", "lang", "source", "n_chars", "text"]


@query(
    "z110_table_profile",
    oracle=_profile_sql(_Z110_COLS, k=256, table="documents"),
    description=(
        "deequ-style one-pass table profile: every column stacked to "
        "(column, string value) inside the scan, ONE aggregate keyed on "
        "the column name (shuffle bounded by n_columns x k, never row "
        "count), per-column n_rows / n_null / deterministic-KMV distinct "
        "estimate (exact under k) / binary-collation min-max of the "
        "string form -- the 100 TB data-audit triage view"
    ),
)
def z110(spark, sf_dir):
    from ..operators.constraints import profile_table

    return profile_table(
        load(spark, "documents", sf_dir), columns=_Z110_COLS, k=256
    )


@query(
    "z112_grouped_profile",
    oracle=_profile_sql(
        ["lang", "n_chars", "text"], k=64, table="documents",
        group_by="source",
    ),
    description=(
        "per-GROUP table profile (VERDICT r9 #1: the grouped plan was "
        "only slice-equivalence-tested, never oracle-gated): "
        "profile_table(group_by='source') keys the single aggregate on "
        "(group, column) -- per-shard drift monitoring whose shuffle "
        "payload stays bounded by groups x columns x k, never row "
        "count; all-NULL-within-a-group columns profile as "
        "n_distinct_est=0 via the left-join fix, both engines"
    ),
)
def z112(spark, sf_dir):
    from ..operators.constraints import profile_table

    return profile_table(
        load(spark, "documents", sf_dir),
        columns=["lang", "n_chars", "text"],
        k=64,
        group_by="source",
    )


@query(
    "z109_kmv_agg_view",
    oracle=_sketch.kmv_oracle_sql("text", k=64, group_by="lang"),
    description=(
        "maintained APPROXIMATE-DISTINCT view (operators/ivm.py "
        "KmvAggView): per-lang KMV sketches kept current under four "
        "insert batches with an in-gate mid-stream compaction -- exact "
        "COUNT(DISTINCT) is not z-set-linear, so the sketch's "
        "commutative/associative/idempotent bottom-k fold is what makes "
        "each ingest one O(|delta|) partial with zero reads of prior "
        "state. read() must equal a one-shot kmv_distinct over the full "
        "corpus (the z39 oracle at k=64 grouped by lang): incremental "
        "maintenance AND compaction are value-transparent"
    ),
)
def z109(spark, sf_dir):
    import shutil

    from ..operators.ivm import KmvAggView

    docs = load(spark, "documents", sf_dir).select("lang", "text", "doc_id")
    path = "spark-warehouse/z109_kmv_agg_view"
    shutil.rmtree(path, ignore_errors=True)
    v = KmvAggView(path, keys=["lang"], value_expr="text", k=64)
    for i in range(4):
        v.ingest(docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i), f"b{i}")
        if i == 2:
            v.compact(spark)  # fold mid-stream: later ingests land on top
    return v.read(spark).select("lang", "est_distinct")


@query(
    "z136_hll_agg_view",
    oracle=_sketch.hll_oracle_sql(
        "text", p=6, group_by="lang", include_eval=False
    ),
    description=(
        "maintained approximate-distinct view on HLL REGISTERS "
        "(operators/ivm.py HllAggView): per-lang register tables kept "
        "current under four insert batches with an in-gate mid-stream "
        "compaction. 'Max rho per register' is commutative/associative/"
        "IDEMPOTENT, so each ingest is one O(|delta|) partial with zero "
        "reads of prior state and fixed 2^p-row-per-group state -- the "
        "right trade vs KmvAggView when GROUP COUNT is the scale axis "
        "(per-tenant distinct monitors). read() must equal a one-shot "
        "hll over the full corpus: maintenance AND compaction are "
        "value-transparent"
    ),
)
def z136(spark, sf_dir):
    import shutil

    from ..operators.ivm import HllAggView

    docs = load(spark, "documents", sf_dir).select("lang", "text", "doc_id")
    path = "spark-warehouse/z136_hll_agg_view"
    shutil.rmtree(path, ignore_errors=True)
    v = HllAggView(path, keys=["lang"], value_expr="text", p=6)
    for i in range(4):
        v.ingest(docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i), f"b{i}")
        if i == 2:
            v.compact(spark)  # fold mid-stream: later ingests land on top
    return v.read(spark).select("lang", "est_distinct", "n_zero_registers")


# ONE recursive SQL string, executed VERBATIM by both engines (the z67
# discipline extended to Spark 4's native WITH RECURSIVE): suppliers
# form an implicit binary-tree hierarchy (parent = floor(key / 2)); the
# CTE walks every supplier's ancestor chain to the root. FLOOR(x / 2)
# instead of integer `/` because both engines' `/` on integers is float
# division; exact for keys < 2^52. ROUND(s_acctbal, 2) re-quantizes the
# fixed-point money double verbatim (the _SCD_TARGET_SQL precedent).
_Z137_SQL = """
WITH RECURSIVE walk AS (
  SELECT s_suppkey AS node, s_suppkey AS cur, 0 AS depth FROM supplier
  UNION ALL
  SELECT node, CAST(FLOOR(cur / 2) AS BIGINT), depth + 1
  FROM walk WHERE cur > 1
)
SELECT w.node, MAX(w.depth) AS depth, COUNT(*) AS chain_len,
       CAST(SUM(CAST(ROUND(s.s_acctbal, 2) AS DECIMAL(25,2)) * 100)
            AS BIGINT) AS chain_bal_cents
FROM walk w JOIN supplier s ON s.s_suppkey = w.cur
GROUP BY w.node
"""


@query(
    "z137_recursive_cte",
    oracle=_Z137_SQL,
    description=(
        "Spark 4 native WITH RECURSIVE (hierarchy walk): every "
        "supplier's ancestor chain up the implicit binary tree "
        "(parent = floor(key/2)) -- depth, chain length, and the exact "
        "decimal-lifted ancestor balance in integer cents. ONE SQL "
        "string executes verbatim on BOTH engines (the z67 discipline), "
        "so the recursion semantics themselves are what is gated; the "
        "iterative-DataFrame twin of this shape is q45/z91's bounded "
        "min-label propagation. Recursion depth is log2(|suppliers|) "
        "rounds, each an O(frontier) self-join -- bounded, not "
        "data-blind"
    ),
)
def z137(spark, sf_dir):
    load(spark, "supplier", sf_dir).createOrReplaceTempView("supplier")
    return spark.sql(_Z137_SQL)


@query(
    "z146_hilbert_key",
    oracle=f"""
WITH z AS (
  SELECT {xhash.hilbert_key_sql('o_custkey', '(o_orderkey % 65536)')} AS hk
  FROM orders)
SELECT (hk >> 20)::BIGINT AS h_bucket,
       count(*) AS n,
       min(hk)::BIGINT AS min_key,
       max(hk)::BIGINT AS max_key
FROM z GROUP BY 1
""",
    description=(
        "Hilbert-curve layout key over two integer columns, bucketed -- "
        "the space-filling key with strictly better locality than z34's "
        "Morton order (consecutive keys are always adjacent cells; no "
        "power-of-two diagonal jumps), so range-partitioning by it "
        "tightens 2-D box pruning on the same manifest machinery. "
        "Computed by a 4-state quadrant automaton (tables derived from "
        "the classic xy2d algorithm and pinned by an exhaustive "
        "reference-equality test) as ONE runtime fold -- static "
        "unrolling would duplicate the state CASE tree 16x per level"
    ),
)
def z146(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    hk = xhash.hilbert_key(
        F.col("o_custkey"), F.col("o_orderkey") % 65536, bits=16
    )
    return (
        o.select(hk.alias("hk"))
        .groupBy(F.expr("hk div 1048576").alias("h_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("hk").alias("min_key"),
            F.max("hk").alias("max_key"),
        )
    )


@query(
    "z165_hilbert_layout_probe",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE (o_custkey % 256) BETWEEN 32 AND 95
  AND (o_orderkey % 256) BETWEEN 96 AND 159
""",
    description=(
        "2-D box query served from an AT-REST Hilbert-laid-out export "
        "(write_zordered curve='hilbert', the z115/z128 build/probe "
        "split applied to data layout): candidate files come from a "
        "pure manifest scan of per-file natural-column [min,max] boxes, "
        "the probe reads ONLY those files, and the entry fails loudly "
        "if the layout stopped pruning (candidates == all files). The "
        "Hilbert key tightens the candidate set vs Morton on the same "
        "file count (pinned by the layout A/B test); result rows are "
        "bit-exact to the full-scan filter by pruning soundness"
    ),
)
def z165(spark, sf_dir):
    import os

    from ..sources.sinks import write_zordered, zorder_candidate_files

    def build(path: str) -> None:
        o = load(spark, "orders", sf_dir).select(
            "o_orderkey",
            "o_totalprice",
            (F.col("o_custkey") % 256).alias("ka"),
            (F.col("o_orderkey") % 256).alias("kb"),
        )
        write_zordered(
            o, path, "ka", "kb", n_files=16, bits=8, curve="hilbert"
        )

    path = cached_index(sf_dir, "hilbert_layout_orders", "orders", build)
    a_range, b_range = (32, 95), (96, 159)
    cand = zorder_candidate_files(path, a_range, b_range)
    import json as _json

    with open(os.path.join(path, "_zorder.json")) as fh:
        n_total = len(_json.load(fh))
    if not cand or len(cand) >= n_total:
        raise RuntimeError(
            f"hilbert layout stopped pruning: {len(cand)}/{n_total} "
            "candidate files for a quarter-space box probe"
        )
    return (
        spark.read.parquet(*cand)
        .filter(
            F.col("ka").between(*a_range) & F.col("kb").between(*b_range)
        )
        .select("o_orderkey", "o_totalprice")
    )


from ..operators.constraints import k_anonymity_oracle_sql as _kanon_sql  # noqa: E402

_Z154_LEVELS_SQL = [
    ("l0_nation_segment_balband",
     ["c_nationkey", "c_mktsegment", "(floor(abs(c_acctbal) / 1000))::INT"]),
    ("l1_segment_balband", ["c_mktsegment", "(floor(abs(c_acctbal) / 1000))::INT"]),
    ("l2_segment", ["c_mktsegment"]),
]


@query(
    "z154_k_anonymity",
    oracle=_kanon_sql("customer", _Z154_LEVELS_SQL, k=5),
    description=(
        "k-anonymity audit across a 3-level generalization ladder "
        "(nation+segment+balance-band -> segment+band -> segment): per "
        "level, equivalence classes, classes under k=5, rows at risk, "
        "and the k actually ACHIEVED -- the privacy re-identification "
        "check run before releasing or joining a dataset; walk the "
        "ladder until n_risky = 0 for the release schema. One map-side-"
        "combined aggregate per level, |levels|-row summary; exact "
        "integers throughout"
    ),
)
def z154(spark, sf_dir):
    from ..operators.constraints import k_anonymity_ladder

    c = load(spark, "customer", sf_dir)
    # explicit floor in BOTH engines: DuckDB's ::INT cast ROUNDS while
    # Spark's truncates -- the band edge would disagree on x99.5+ values
    band = F.floor(F.abs(F.col("c_acctbal")) / 1000).cast("int")
    return k_anonymity_ladder(
        c,
        [
            ("l0_nation_segment_balband",
             [F.col("c_nationkey"), F.col("c_mktsegment"), band]),
            ("l1_segment_balband", [F.col("c_mktsegment"), band]),
            ("l2_segment", [F.col("c_mktsegment")]),
        ],
        k=5,
    )


from ..operators.constraints import (  # noqa: E402
    l_diversity_oracle_sql as _ldiv_sql,
)

_Z170_LEVELS_SQL = [
    ("l0_nation_balband",
     ["c_nationkey", "(floor(abs(c_acctbal) / 500))::INT"]),
    ("l1_nation", ["c_nationkey"]),
    ("l2_nation_mod5", ["(c_nationkey % 5)::INT"]),
]


@query(
    "z170_l_diversity",
    oracle=_ldiv_sql("customer", _Z170_LEVELS_SQL, "c_mktsegment", l_min=3),
    description=(
        "l-diversity audit (Machanavajjhala et al. 2007) across a "
        "3-level generalization ladder with c_mktsegment as the "
        "sensitive attribute -- the attribute-disclosure check "
        "k-anonymity (z154) misses: a >= k class still leaks when every "
        "member shares one sensitive value. Per level: classes, classes "
        "under l=3 distinct sensitive values, rows in them, l ACHIEVED. "
        "One two-measure aggregate per level (count + per-class "
        "count-distinct, never a global distinct), |levels|-row "
        "summary; exact integers; ladder probed non-degenerate at all "
        "three SFs"
    ),
)
def z170(spark, sf_dir):
    from ..operators.constraints import l_diversity_ladder

    c = load(spark, "customer", sf_dir)
    band = F.floor(F.abs(F.col("c_acctbal")) / 500).cast("int")
    return l_diversity_ladder(
        c,
        [
            ("l0_nation_balband", [F.col("c_nationkey"), band]),
            ("l1_nation", [F.col("c_nationkey")]),
            ("l2_nation_mod5", [(F.col("c_nationkey") % 5).cast("int")]),
        ],
        "c_mktsegment",
        l_min=3,
    )


from ..operators.constraints import (  # noqa: E402
    distribution_drift_oracle_sql as _drift_sql,
)


@query(
    "z171_source_drift",
    oracle=_drift_sql(
        "SELECT source, n_chars FROM documents", "source", "n_chars // 50"
    ),
    description=(
        "per-source distribution drift vs the pooled corpus as EXACT "
        "total-variation distance over the doc-length histogram "
        "(n_chars div 50 buckets): TVD has a single clearable "
        "denominator -- sum_b |O*N - T*n| / (2*n*N) -- so the drift "
        "number is ONE HALF_UP micros ratio with zero float anywhere "
        "(chi-square's per-cell denominators cannot be cleared; the "
        "z164 discipline picks the statistic to fit exact arithmetic). "
        "The shard/source/day tracking number of corpus observability. "
        "Two histogram aggregates + a histogram-sized dims-cross so "
        "empty cells still contribute; DECIMAL(38,0) products "
        "(O*N wraps int64 at corpus scale)"
    ),
)
def z171(spark, sf_dir):
    from ..operators.constraints import distribution_drift_tvd

    docs = load(spark, "documents", sf_dir)
    return distribution_drift_tvd(
        docs, "source", F.expr("n_chars div 50")
    )


from ..operators.constraints import (  # noqa: E402
    chisq_independence_oracle_sql as _chisq_sql,
)


@query(
    "z193_chisq_independence",
    oracle=_chisq_sql(
        "SELECT source, lang FROM documents", a_sql="source", b_sql="lang"
    ),
    description=(
        "Pearson chi-square independence statistic for source x "
        "language -- the JOINT-coupling check (is one source feeding "
        "one language?) that complements z171's per-column TVD drift. "
        "z171's docstring notes chi-square's per-cell denominators "
        "cannot be CLEARED into one division; this entry takes the "
        "other exactness route: each per-cell rational is quantized "
        "ONCE to HALF_UP integer micros (the z185 per-component rule), "
        "so the statistic is an exact BIGINT sum in both engines. "
        "Zero cells need no cross product: their mass telescopes to "
        "N - sum_obs(r*c)/N since sum_all(r*c) = N^2. One (a,b) count "
        "agg + two margin re-aggs + two equi-joins + 1-row total "
        "broadcast"
    ),
)
def z193(spark, sf_dir):
    from ..operators.constraints import chisq_independence

    docs = load(spark, "documents", sf_dir)
    return chisq_independence(docs, "source", "lang")


@query(
    "z159_bloom_point_lookup",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(CAST(o_totalprice AS DECIMAL(25,6)), 2)::DOUBLE AS total
FROM orders WHERE o_custkey IN (7, 42)
""",
    description=(
        "point lookup on a NON-LAYOUT key through a per-file Bloom "
        "data-skipping sidecar (the Parquet-BloomFilter/Delta-stats "
        "idea, engine-side): data stays in the writer's layout, a "
        "~8 KiB bitmap per file (built from the same JVM xxhash64 the "
        "probe uses -- build and probe can never disagree) prunes the "
        "read to files that MAY contain the key; no false negatives by "
        "construction, false positives only cost extra reads. The gap "
        "this closes: min/max stats prune nothing for a key the layout "
        "ignores. Cached-index entry: bench min-of-N prices the "
        "recurring probe, not the build"
    ),
)
def z159(spark, sf_dir):
    from ..sources.bloom_index import bloom_lookup, write_bloom_indexed

    def build(path):
        write_bloom_indexed(
            load(spark, "orders", sf_dir), path, "o_custkey",
            target_files=16,
        )

    path = cached_index(sf_dir, "bloom_orders", "orders", build)
    out = bloom_lookup(spark, path, "o_custkey", [7, 42])
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice").cast("decimal(25,6)"), 2)
        .cast("double")
        .alias("total"),
    )


from ..operators.constraints import (  # noqa: E402
    key_skew_profile_oracle_sql as _skewprof_sql,
)


@query(
    "z186_key_skew_profile",
    oracle=_skewprof_sql(
        "SELECT l_orderkey, l_partkey, l_returnflag FROM lineitem",
        ["l_orderkey", "l_partkey", "l_returnflag"],
    ),
    description=(
        "join-key skew profile BEFORE anyone shuffles on the key: per "
        "candidate column, distinct keys, heaviest key's rows/share, "
        "HHI concentration, and the heaviest key's multiple of the "
        "uniform share (skew_x -- the unit AQE's skewedPartitionFactor "
        "thinks in; feeds the plain-join vs AQE vs operators/skew.py "
        "salting decision). Exact HALF_UP micros, DECIMAL(38,0) "
        "squares. One in-row (name, key) explode whose shuffle carries "
        "only map-side-combined partials + a |cols|-row summary; "
        "lineitem's 3-key l_returnflag vs fine-grained l_partkey spans "
        "the whole decision range in one output"
    ),
)
def z186(spark, sf_dir):
    from ..operators.constraints import key_skew_profile

    return key_skew_profile(
        load(spark, "lineitem", sf_dir),
        ["l_orderkey", "l_partkey", "l_returnflag"],
    )


from ..operators.constraints import (  # noqa: E402
    join_explosion_preflight_oracle_sql as _preflight_sql,
)


@query(
    "z188_join_explosion_preflight",
    oracle=_preflight_sql(
        "SELECT l_orderkey FROM lineitem",
        "SELECT l_orderkey FROM lineitem",
        "l_orderkey",
        "l_orderkey",
    ),
    description=(
        "EXACT output cardinality of a proposed equi-join without "
        "running it (sum over shared keys of n_a*n_b from the two "
        "count tables) -- the pre-flight for explosion-prone joins, "
        "demonstrated on the z144 co-purchase SELF-join (quadratic in "
        "the heaviest order): input sizes, shared keys, exact "
        "join_rows, amplification vs the larger input, heaviest key's "
        "pair contribution + share (salting target). Two count "
        "aggregates + one key-count join; DECIMAL(38,0) products; the "
        "joint complement of z186's single-table skew profile"
    ),
)
def z188(spark, sf_dir):
    from ..operators.constraints import join_explosion_preflight

    li = load(spark, "lineitem", sf_dir).select("l_orderkey")
    return join_explosion_preflight(li, li, "l_orderkey", "l_orderkey")
