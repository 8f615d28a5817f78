"""Verified query registry: every operator family from SURVEY.md §2 plus the
north-star extensions, each as (Spark callable, DuckDB oracle SQL).

The driver runs the Spark side and the oracle side on the same parquet
tables at sf=0.01 and hash-compares rows (order-insensitive, columns sorted
by name) -- so every computed column is aliased identically on both sides,
money aggregates are rounded to 2 dp and ratios to 4-6 dp to absorb
floating-point summation-order noise, and every LIMIT query carries a total
deterministic ORDER BY.

Conventions: callables take (spark, sf_dir) and return a DataFrame; oracle
SQL references the pre-registered view names (region nation customer
supplier part orders lineitem events documents embeddings).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import exactnum, xhash
from ..operators import dedup, multimodal, sessionize, similarity, text
from ..operators.merge import classify
from ..sources.catalog import load

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str


REGISTRY: dict[str, Query] = {}

# ---------------------------------------------------------------------
# Order-independent rounded aggregates.
#
# round(sum(<double>)) / round(avg(<double>)) over FIXED-POINT-valued
# columns (TPC-H money/qty/discount) is partition-order-sensitive in its
# last ulp, and fixed-point data lands *exactly* on rounding
# half-boundaries with high probability (q86 caught by the r4
# determinism sweep; q49 was the r3 driver red cell). Lifting each row
# to exact decimal makes the sum associative -- partition order cannot
# change the result -- then ONE round / ONE division happens on
# identical exact inputs in both engines. Arbitrary-double data (events
# `value`) is left alone: its boundary-landing probability is ~ulp-sized
# and decimal would pretend precision the data doesn't have.
# ---------------------------------------------------------------------

_DEC = "decimal(25,6)"


def _dsum(expr, scale=2):
    """Order-independent rounded sum of a fixed-point double expression:
    exact decimal sum (associative), round once, return double."""
    return F.round(F.sum(expr.cast(_DEC)), scale).cast("double")


def _davg(expr, scale=4):
    """Cross-engine-exact rounded mean of a fixed-point double column.

    The r4 _davg rounded the IEEE quotient ``sum/count`` -- a double whose
    4-dp rounding can snap differently across engines when it lands within
    an ulp of a half-boundary (Spark rounds the shortest decimal repr,
    DuckDB the binary value: the q49 red-cell class). This version never
    rounds a double: the exact decimal sum is lifted to integer micros,
    HALF_UP-rounded to the target scale in pure BIGINT arithmetic
    (sign-aware ``(2a + b) div (2b)``), and presented as a double via ONE
    IEEE division of exact integers -- correctly rounded to the same bits
    in every engine. Partition order cannot change it; no engine rounding
    rule is involved.
    """
    e = F.col(expr) if isinstance(expr, str) else expr
    a = (F.sum(e.cast(_DEC)) * F.lit(1000000)).cast("long")
    b = F.count(e) * F.lit(10 ** (6 - scale))
    mag = F.abs(a)
    half_up = ((F.lit(2) * mag + b) - (F.lit(2) * mag + b) % (F.lit(2) * b)) / (
        F.lit(2) * b
    )
    return (
        F.signum(a).cast("long") * half_up.cast("long") / F.lit(10**scale)
    )


# SQL twins for the DuckDB oracles (format with e=<expr>, s=<scale>).
# _DAVG_SQL mirrors _davg exactly: integer-micros sum, BIGINT HALF_UP at
# the target scale, one final IEEE division (see _davg docstring).
_DSUM_SQL = "round(sum(CAST({e} AS DECIMAL(25,6))), {s})::DOUBLE"
_DAVG_SQL = (
    "(CASE WHEN CAST(sum(CAST({e} AS DECIMAL(25,6))) * 1000000 AS BIGINT) >= 0"
    " THEN 1 ELSE -1 END"
    " * ((2 * abs(CAST(sum(CAST({e} AS DECIMAL(25,6))) * 1000000 AS BIGINT))"
    "     + count({e}) * POW_REST)"
    "    // (2 * count({e}) * POW_REST)))"
    " / POW_SCALE"
)


def _davg_sql(e: str, s: int) -> str:
    """Render _DAVG_SQL for expression ``e`` at scale ``s``."""
    return (
        _DAVG_SQL.replace("{e}", e)
        .replace("POW_REST", str(10 ** (6 - s)))
        .replace("POW_SCALE", f"{10**s}.0")
    )


# ---------------------------------------------------------------------
# Exact-integer ratio SQL builders (DuckDB twins of functions.exactnum).
# Jaccard / containment / ratio columns and their threshold gates are
# computed entirely in BIGINT -- no round(<double>) anywhere -- then
# presented as doubles via one IEEE division of exact integers, which is
# bit-identical across engines (the q49 determinism rule).
# ---------------------------------------------------------------------


def _ratio_sql(num: str, den: str, scale: int = 6) -> str:
    """HALF_UP num/den at 10^-scale, presented as a double."""
    p = 10**scale
    return f"((2 * {p} * ({num}) + ({den})) // (2 * ({den}))) / {p}.0"


def _jacc_parts(a: str, b: str) -> tuple[str, str]:
    inter = f"len(list_intersect({a}, {b}))"
    union = f"(len({a}) + len({b}) - {inter})"
    return inter, union


def _jacc_sql(a: str, b: str) -> str:
    """Exact HALF_UP-micros Jaccard of two list columns, as a double."""
    inter, union = _jacc_parts(a, b)
    return _ratio_sql(inter, union)


def _jacc_pred_sql(a: str, b: str, t: float) -> str:
    """Exact BIGINT gate: true Jaccard >= t (no double involved)."""
    inter, union = _jacc_parts(a, b)
    return f"{inter} * 1000000 >= {union} * {round(t * 1_000_000)}"


_BPE_SQL = (
    "len(regexp_extract_all(text,"
    " ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+'))"
)
_BPE_RATIO_SQL = _ratio_sql("length(text)", f"greatest({_BPE_SQL}, 1)", 4)


def query(name: str, oracle: str | None = None, description: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name, fn, oracle, description)
        return fn

    return deco


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
    "q10_full_outer_presence",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
           FROM customer WHERE c_nationkey < 20 GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
           FROM supplier WHERE s_nationkey > 5 GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
    description="full outer join with unmatched rows on both sides (Q2 merge shape)",
)
def q10(spark, sf_dir):
    c = (
        load(spark, "customer", sf_dir)
        .filter(F.col("c_nationkey") < 20)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load(spark, "supplier", sf_dir)
        .filter(F.col("s_nationkey") > 5)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


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
    "q22_json_extract",
    oracle=f"""
SELECT event_type,
       count(*)                                          AS n,
       round(sum(CAST(value AS DECIMAL(25,6))), 4)::DOUBLE                              AS total_value,
       {_ratio_sql("sum(json_extract_string(props, '$.k')::INT)",
                   "count(json_extract_string(props, '$.k')::INT)", 4)} AS avg_k,
       min(json_extract_string(props, '$.k')::INT)       AS min_k,
       max(json_extract_string(props, '$.k')::INT)       AS max_k
FROM events GROUP BY event_type
""",
    description="semi-structured JSON column extraction + agg",
)
def q22(spark, sf_dir):
    from ..functions.exactnum import ratio_scaled_halfup

    e = load(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        _dsum(F.col("value"), 4).alias("total_value"),
        # exact-BIGINT HALF_UP mean of an int column (q49 determinism rule)
        (ratio_scaled_halfup(F.sum(k), F.count(k), 4) / F.lit(10000.0)).alias(
            "avg_k"
        ),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
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
    "q24_tumbling_window",
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP) AS win_start, event_type,
       count(*) AS n, round(sum(CAST(value AS DECIMAL(25,6))), 4)::DOUBLE AS total_value
FROM events GROUP BY 1, 2
""",
    description="tumbling event-time window aggregation (batch form of streaming agg)",
)
def q24(spark, sf_dir):
    e = load(spark, "events", sf_dir)
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), _dsum(F.col("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
    )


@query(
    "q25_sessionize",
    oracle="""
WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id, value FROM events),
g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, (sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
  FROM g)
SELECT user_id, session_idx, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       round(sum(CAST(value AS DECIMAL(25,6))), 4)::DOUBLE AS total_value
FROM s GROUP BY user_id, session_idx
""",
    description="gap-based sessionization (lag + conditional cumsum)",
)
def q25(spark, sf_dir):
    return sessionize.sessionize(load(spark, "events", sf_dir), gap_minutes=30)


# =====================================================================
# SCD merge surface (the reference's centerpiece, SURVEY §2.5)
# =====================================================================

# Synthetic SCD state carved deterministically out of `supplier` so the
# merge decision tree is exercised on TESTDATA without extra fixtures:
#   target: active row per key unless key%7==0 (single inactive), plus a
#           second inactive row for key%14==0 (-> scalar-subquery error),
#           plus inactive history for key%5==0 keys that also have actives;
#   batch:  keys %3==0 (value doubled when %6==0 or %21==0) + new keys +1000.
_SCD_TARGET_SQL = """
  SELECT s_suppkey AS k, round(s_acctbal, 2) AS v,
         (s_suppkey % 7 != 0) AS active FROM supplier
  UNION ALL
  SELECT s_suppkey, round(round(s_acctbal, 2) + 100, 2), FALSE
  FROM supplier WHERE s_suppkey % 14 = 0
  UNION ALL
  SELECT s_suppkey, round(round(s_acctbal, 2) - 50, 2), FALSE
  FROM supplier WHERE s_suppkey % 5 = 0 AND s_suppkey % 7 != 0
"""

_SCD_BATCH_SQL = """
  SELECT s_suppkey AS k,
         CASE WHEN s_suppkey % 6 = 0 OR s_suppkey % 21 = 0
              THEN round(round(s_acctbal, 2) * 2, 2) ELSE round(s_acctbal, 2) END AS v
  FROM supplier WHERE s_suppkey % 3 = 0
  UNION ALL
  SELECT s_suppkey + 1000, round(s_acctbal, 2)
  FROM supplier WHERE s_suppkey % 11 = 0
"""

_SCD_CLASSIFY_SQL = f"""
WITH target AS ({_SCD_TARGET_SQL}),
batch AS ({_SCD_BATCH_SQL}),
prof AS (
  SELECT k,
         count(CASE WHEN active THEN 1 END)      AS n_active,
         count(CASE WHEN NOT active THEN 1 END)  AS n_inactive,
         max(CASE WHEN active THEN v END)        AS active_v,
         max(CASE WHEN NOT active THEN v END)    AS inactive_v
  FROM target GROUP BY k)
SELECT b.k, b.v,
       CASE WHEN p.k IS NULL THEN 'insert'
            WHEN p.n_active > 1 THEN 'error'
            WHEN p.n_active = 1 AND b.v = p.active_v THEN 'noop'
            WHEN p.n_active = 1 THEN 'update'
            WHEN p.n_inactive > 1 THEN 'error'
            WHEN b.v = p.inactive_v THEN 'reactivate'
            ELSE 'new_version' END AS action
FROM batch b LEFT JOIN prof p ON b.k = p.k
"""


def _scd_frames(spark, sf_dir):
    load(spark, "supplier", sf_dir).createOrReplaceTempView("supplier")
    target = spark.sql(_SCD_TARGET_SQL)
    batch = spark.sql(_SCD_BATCH_SQL)
    return target, batch


@query(
    "q26_scd_classify",
    oracle=_SCD_CLASSIFY_SQL,
    description="the reference's 5-way merge decision tree, set-based (sql:20-122)",
)
def q26(spark, sf_dir):
    target, batch = _scd_frames(spark, sf_dir)
    return classify(target, batch, keys=["k"], compare_col="v", scd=True).select(
        "k", "v", "action"
    )


@query(
    "q27_scd_counters",
    oracle=f"""
SELECT sum(CASE WHEN action = 'insert' THEN 1 ELSE 0 END)::BIGINT AS new_inserts_count,
       sum(CASE WHEN action = 'update' THEN 1 ELSE 0 END)::BIGINT AS update_count,
       sum(CASE WHEN action = 'noop'   THEN 1 ELSE 0 END)::BIGINT AS no_update_count
FROM ({_SCD_CLASSIFY_SQL})
""",
    description="mutation accounting as aggregates over the action column (A2-A6)",
)
def q27(spark, sf_dir):
    target, batch = _scd_frames(spark, sf_dir)
    actions = classify(target, batch, keys=["k"], compare_col="v", scd=True)
    return actions.agg(
        F.sum(F.when(F.col("action") == "insert", 1).otherwise(0))
        .cast("long")
        .alias("new_inserts_count"),
        F.sum(F.when(F.col("action") == "update", 1).otherwise(0))
        .cast("long")
        .alias("update_count"),
        F.sum(F.when(F.col("action") == "noop", 1).otherwise(0))
        .cast("long")
        .alias("no_update_count"),
    )


@query(
    "q28_scd_snapshot",
    oracle=f"""
WITH actions AS ({_SCD_CLASSIFY_SQL}),
target AS ({_SCD_TARGET_SQL}),
existing AS (
  SELECT t.k,
         CASE WHEN a.action = 'update' AND t.active THEN a.v ELSE t.v END AS v,
         CASE WHEN a.action = 'reactivate' AND NOT t.active THEN TRUE
              ELSE t.active END AS active,
         CASE WHEN (a.action = 'update' AND t.active)
                OR (a.action = 'reactivate' AND NOT t.active)
              THEN 'batch-new' ELSE 'seed' END AS batch_id
  FROM target t LEFT JOIN actions a ON t.k = a.k),
inserted AS (
  SELECT k, v, TRUE AS active, 'batch-new' AS batch_id
  FROM actions WHERE action IN ('insert', 'new_version'))
SELECT k, v, active, batch_id FROM existing
UNION ALL SELECT k, v, active, batch_id FROM inserted
""",
    description="post-merge target snapshot (apply semantics end-to-end)",
)
def q28(spark, sf_dir):
    from datetime import datetime

    from ..operators.merge import merge_scd

    target, batch = _scd_frames(spark, sf_dir)
    target_full = target.select(
        F.row_number().over(W.orderBy("k", "active", "v")).alias("world_bank_id"),
        F.col("k").cast("long").alias("k"),
        F.col("v"),
        F.lit(None).cast("date").alias("last_modified_date"),
        F.lit("seed").alias("batch_id"),
        F.lit(datetime(2024, 1, 1)).cast("timestamp").alias("created_at"),
        F.lit(None).cast("timestamp").alias("updated_at"),
        F.col("active"),
    )
    batch_full = batch.select(
        F.col("k").cast("long").alias("k"),
        F.col("v"),
        F.lit(None).cast("date").alias("last_modified_date"),
        F.lit("batch-new").alias("batch_id"),
    )
    res = merge_scd(
        target_full,
        batch_full,
        keys=["k"],
        compare_col="v",
        set_cols=["v", "last_modified_date"],
        batch_id="batch-new",
        table_name="scd_demo",
        now=datetime(2024, 6, 1),
    )
    return res.target.select("k", "v", "active", "batch_id")


@query(
    "q29_enrich_currency",
    oracle="""
WITH rates AS (
  SELECT n_nationkey, round(0.5 + n_nationkey * 0.07, 2) AS rate_gbp,
         round(0.8 + n_nationkey * 0.03, 2) AS rate_eur,
         round(60 + n_nationkey * 1.5, 2)   AS rate_inr
  FROM nation)
SELECT s_suppkey, s_name,
       round(s_acctbal * rate_gbp, 4) AS MC_GBP_Billion,
       round(s_acctbal * rate_eur, 4) AS MC_EUR_Billion,
       round(s_acctbal * rate_inr, 4) AS MC_INR_Billion
FROM supplier JOIN rates ON s_nationkey = n_nationkey
""",
    description="J4 enrichment join: currency-converted value columns (sql:317-318 TODO)",
)
def q29(spark, sf_dir):
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir).select(
        "n_nationkey",
        F.round(0.5 + F.col("n_nationkey") * 0.07, 2).alias("rate_gbp"),
        F.round(0.8 + F.col("n_nationkey") * 0.03, 2).alias("rate_eur"),
        F.round(60 + F.col("n_nationkey") * 1.5, 2).alias("rate_inr"),
    )
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey",
        "s_name",
        # 4dp: a 2dp*2dp product has <=4 decimals, so rounding is the
        # identity on both engines -- 2dp would sit on half-cent boundaries
        # where Spark (shortest-repr) and DuckDB (binary) rounding diverge
        F.round(F.col("s_acctbal") * F.col("rate_gbp"), 4).alias("MC_GBP_Billion"),
        F.round(F.col("s_acctbal") * F.col("rate_eur"), 4).alias("MC_EUR_Billion"),
        F.round(F.col("s_acctbal") * F.col("rate_inr"), 4).alias("MC_INR_Billion"),
    )


# =====================================================================
# North-star: dedup / text / similarity / multimodal (BASELINE.json)
# =====================================================================

_TOKENS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"
_SHINGLES_SQL = (
    "list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
    "for i in generate_series(1, greatest(len(w) - 2, 0))])"
)
_POLY_SQL = (
    "list_reduce(list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in string_split({x}, '')]),"
    " (a, b) -> (a * 31 + b) % 1000000007)"
)


@query(
    "q30_dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
""",
    description="exact dedup: content-hash groupBy manifest",
)
def q30(spark, sf_dir):
    return dedup.exact_duplicates(load(spark, "documents", sf_dir))


@query(
    "q31_dedup_ngram_jaccard",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh
  FROM (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {_jacc_sql("a.sh", "b.sh")} AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE {_jacc_pred_sql("a.sh", "b.sh", 0.8)}
""",
    description="EXACT 3-gram Jaccard near-dup pairs via inverted shingle index",
)
def q31(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        load(spark, "documents", sf_dir), threshold=0.8, unpersist_after=False
    )


def _minhash_oracle() -> str:
    sig_exprs = ",\n         ".join(
        f"{e} AS s{i}" for i, e in enumerate(xhash.minhash_sql_exprs("sh", k=8))
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS band, s{2*i}::VARCHAR || ',' || s{2*i+1}::VARCHAR AS key FROM sig"
        for i in range(4)
    )
    return f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh
  FROM (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents)),
sig AS (
  SELECT doc_id, sh,
         {sig_exprs}
  FROM d),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                           AND a.doc_id < b.doc_id),
verified AS (
  SELECT doc_a, doc_b,
         {_jacc_sql("sa.sh", "sb.sh")} AS jaccard
  FROM cand JOIN d sa ON cand.doc_a = sa.doc_id
            JOIN d sb ON cand.doc_b = sb.doc_id
  WHERE {_jacc_pred_sql("sa.sh", "sb.sh", 0.5)})
SELECT doc_a, doc_b, jaccard FROM verified
"""


@query(
    "q32_dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    description="MinHash signatures + banded LSH candidates + exact-Jaccard verify",
)
def q32(spark, sf_dir):
    return dedup.minhash_lsh_pairs(
        load(spark, "documents", sf_dir), threshold=0.5, unpersist_after=False
    )


def _simhash_oracle(bits: int = 16) -> str:
    poly = xhash.MD5_HASH32_SQL.format(x="x")
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hl, h -> (h >> {b}) & 1 = 1)) > n "
        f"THEN {2**b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, list_distinct({_TOKENS_SQL}) AS t FROM documents),
h AS (
  SELECT doc_id, [{poly} for x in t] AS hl, len(t) AS n FROM tok)
SELECT doc_id, ({terms})::BIGINT AS simhash FROM h
"""


@query(
    "q33_dedup_simhash",
    oracle=_simhash_oracle(),
    description="16-bit SimHash sketch per document (near-dup bucketing)",
)
def q33(spark, sf_dir):
    return dedup.simhash(load(spark, "documents", sf_dir))


@query(
    "q34_text_tokens",
    oracle=f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS_SQL}) END AS n_tokens,
       length(text) AS n_chars_measured,
       {_ratio_sql(f"list_sum([length(x) for x in {_TOKENS_SQL}])",
                   f"greatest(len({_TOKENS_SQL}), 1)", 4)} AS avg_token_len
FROM documents
""",
    description="token counting (whitespace tokenizer) + length stats",
)
def q34(spark, sf_dir):
    return text.with_token_stats(load(spark, "documents", sf_dir))


@query(
    "q35_text_quality",
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM documents)
SELECT doc_id,
       length(text)::INT AS n_chars_measured,
       (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END)::INT AS n_tokens,
       {_ratio_sql("len(regexp_extract_all(text, '[.,!?;:]'))",
                   "greatest(length(text), 1)")} AS punct_ratio,
       {_ratio_sql("len(list_filter(toks, w -> list_contains("
                   "['the','a','of','and','to','in','is','that'], w)))",
                   "greatest(len(toks), 1)")} AS stopword_ratio,
       {text.QUALITY_MICROS_SQL.format(t="text")} / 1000000.0 AS quality_score
FROM t
""",
    description="quality scoring: length/punct/stopword ratios + composite",
)
def q35(spark, sf_dir):
    return text.with_quality(load(spark, "documents", sf_dir))


def _langid_oracle() -> str:
    score = (
        "len(list_filter(toks, w -> list_contains({lex}, w)))::DOUBLE"
        " / greatest(len(toks), 1)"
    )
    lex_sql = {
        lang: "[" + ",".join(f"'{w}'" for w in lx) + "]"
        for lang, lx in text.LANG_LEXICONS.items()
    }
    s = {lang: score.format(lex=lex_sql[lang]) for lang in lex_sql}
    return f"""
WITH t AS (SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM documents),
sc AS (SELECT doc_id, text,
              {s['en']} AS s_en, {s['de']} AS s_de, {s['es']} AS s_es, {s['fr']} AS s_fr
       FROM t)
SELECT doc_id,
       CASE WHEN len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]'))::DOUBLE
                 / greatest(length(text), 1) > 0.05 THEN 'zh'
            WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
            WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
            WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
            ELSE 'unknown' END AS pred_lang
FROM sc
"""


@query(
    "q36_text_langid",
    oracle=_langid_oracle(),
    description="n-gram/stopword-heuristic language identification",
)
def q36(spark, sf_dir):
    return text.with_lang_id(load(spark, "documents", sf_dir))


@query(
    "q37_text_fingerprint",
    oracle=f"""
SELECT doc_id,
       {_POLY_SQL.format(x="substring(trim(lower(text)), 1, 64)")} AS fingerprint
FROM documents
""",
    description="polynomial rolling-hash document fingerprint (prefix 64)",
)
def q37(spark, sf_dir):
    return text.with_fingerprint(load(spark, "documents", sf_dir))


_COS_SQL = (
    "round(list_dot_product(qv, v)"
    " / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)"
)


def _signlsh_neardup_oracle(
    threshold: float, bands: int, bits_per_band: int, dim: int, seed: int = 0,
    max_bucket: int | None = None,
) -> str:
    """DuckDB twin of ``similarity.cosine_neardup_pairs`` banded mode: the
    SAME Rademacher hyperplane literals (``rademacher_planes`` is
    deterministic), the same per-band sign-bit keys, the same
    bucket-equi-join candidates, the same exact cosine verify. Both engines
    compute each plane dot over exact integer MICROS (round(v * 1e6) as
    BIGINT; |dot| << 2^53, so DuckDB's double list_dot_product is exact and
    numpy's int64 matmul trivially so) -- the sign bits, and therefore the
    candidate set, are bit-identical with NO float-summation order
    dependence in either engine."""
    planes = similarity.rademacher_planes(bands * bits_per_band, dim, seed)

    def dot(p: list[float]) -> str:
        return (
            "list_dot_product(vm, ["
            + ",".join(str(int(x)) for x in p)
            + "])"
        )

    keys = []
    for b in range(bands):
        bits = " + ".join(
            f"(CASE WHEN {dot(planes[b * bits_per_band + j])} >= 0"
            f" THEN {2 ** j} ELSE 0 END)"
            for j in range(bits_per_band)
        )
        keys.append(f"({bits}) AS k{b}")
    band_union = "\nUNION ALL\n".join(
        f"SELECT vec_id, {b} AS band, k{b} AS key FROM sig" for b in range(bands)
    )
    cos = (
        "round(list_dot_product(ea.v, eb.v)"
        " / (sqrt(list_dot_product(ea.v, ea.v))"
        " * sqrt(list_dot_product(eb.v, eb.v))), 6)"
    )
    if max_bucket is None:
        sub_cte, cand_src, sub_eq = "", "bands", ""
    else:
        # the operator's deterministic oversize-bucket cap: rank members
        # by id within each (band, key) bucket, sub-bucket = floor(rank /
        # max_bucket), candidates only within a sub-bucket
        sub_cte = (
            "\nsubbed AS (SELECT vec_id, band, key,"
            " ((row_number() OVER (PARTITION BY band, key ORDER BY vec_id)"
            f" - 1) // {max_bucket})::INT AS sub FROM bands),"
        )
        cand_src, sub_eq = "subbed", " AND a.sub = b.sub"
    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v,
                  [round(x::DOUBLE * 1000000)::BIGINT for x in embedding] AS vm
           FROM embeddings),
sig AS (SELECT vec_id, {", ".join(keys)} FROM e),
bands AS ({band_union}),{sub_cte}
cand AS (SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
         FROM {cand_src} a JOIN {cand_src} b
           ON a.band = b.band AND a.key = b.key{sub_eq} AND a.vec_id < b.vec_id)
SELECT ia AS vec_a, ib AS vec_b, {cos} AS cos_sim
FROM cand JOIN e ea ON ea.vec_id = ia JOIN e eb ON eb.vec_id = ib
WHERE {cos} >= {threshold}
"""


@query(
    "q38_ann_cosine_topk",
    oracle=f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
  FROM q CROSS JOIN e WHERE e.vec_id != query_id),
r AS (SELECT *, (row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id))::INT AS rnk
      FROM scored)
SELECT query_id, neighbor_id, cos_sim, rnk AS rank FROM r WHERE rnk <= 10
""",
    description="exact cosine top-k neighbors (brute-force ANN baseline)",
)
def q38(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") % 100 == 0), k=10)


@query(
    "q39_embedding_neardup",
    oracle=f"""
{_signlsh_neardup_oracle(threshold=0.45, bands=12, bits_per_band=6, dim=64)}
""",
    description=(
        "embedding-cosine near-duplicate pairs via banded sign-LSH "
        "candidates + exact cosine verify (no all-pairs join; the oracle "
        "replicates the deterministic banding, like q32's MinHash)"
    ),
)
def q39(spark, sf_dir):
    return similarity.cosine_neardup_pairs(
        load(spark, "embeddings", sf_dir),
        threshold=0.45,
        bands=12,
        bits_per_band=6,
        dim=64,
    )


@query(
    "q40_multimodal_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text))                    AS n_bytes,
       (64 + octet_length(encode(text)) % 512)::INT  AS width,
       (64 + (octet_length(encode(text)) * 7) % 512)::INT AS height,
       'FAKE'                                        AS format
FROM documents
""",
    description="multimodal binary column + Arrow-batched metadata decode (stub codec)",
)
def q40(spark, sf_dir):
    docs = multimodal.attach_fake_binary(load(spark, "documents", sf_dir))
    return multimodal.decode_image_meta(docs)


def queries() -> dict[str, QueryFn]:
    # name-sorted so any first-N cap on the driver side sees a stable,
    # deliberately-ordered prefix (scale-critical operators carry q01-q50
    # names; see PARITY.md)
    return {name: REGISTRY[name].fn for name in sorted(REGISTRY)}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in sorted(REGISTRY)
        if REGISTRY[name].oracle is not None
    }


# =====================================================================
# Extended operator families: as-of join, percentiles, explode, unpivot,
# array functions (rounding out SURVEY §2.6's "covered by Spark built-ins")
# =====================================================================


@query(
    "q41_asof_join",
    oracle="""
WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type, value FROM events),
purchases AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, ts, max(value) AS last_click_value
           FROM e WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id, p.ts, round(c.last_click_value, 4) AS last_click_value
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    description="as-of (point-in-time) join via union+last-value window",
)
def q41(spark, sf_dir):
    from ..operators.asof import asof_join

    e = load(spark, "events", sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("last_click_value")
    )
    joined = asof_join(purchases, clicks, key="user_id", ts="ts",
                       value_cols=["last_click_value"])
    return joined.select(
        "event_id", "user_id", "ts", F.round("last_click_value", 4).alias("last_click_value")
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
    "q61_top_tokens",
    oracle=f"""
SELECT token, count(*) AS n FROM (
  SELECT unnest({_TOKENS_SQL}) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20
""",
    description="explode (flatten) token arrays + global top-k",
)
def q61(spark, sf_dir):
    from ..functions.xhash import ws_tokens

    docs = load(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
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
    "q91_array_funcs",
    oracle="""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings)
SELECT vec_id,
       len(v)::INT                                   AS dim,
       round(sqrt(list_dot_product(v, v)), 6)        AS l2_norm,
       round(list_max(v), 6)                         AS vmax,
       round(list_min(v), 6)                         AS vmin,
       round(list_sum(v[1:8]), 6)                    AS head_sum,
       round(list_sum([abs(x) for x in v]), 6)       AS l1_norm
FROM e
""",
    description="array function family: size/min/max/slice/transform/aggregate",
)
def q91(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(dot), 6).alias("l2_norm"),
        F.round(F.array_max(v), 6).alias("vmax"),
        F.round(F.array_min(v), 6).alias("vmin"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda s, x: s + x), 6
        ).alias("head_sum"),
        F.round(
            F.aggregate(F.transform(v, lambda x: F.abs(x)), F.lit(0.0), lambda s, x: s + x),
            6,
        ).alias("l1_norm"),
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


@query(
    "q42_hypertable_rollup",
    oracle="""
SELECT 'hour' AS granularity, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS bucket,
       event_type, count(*) AS n, round(sum(CAST(value AS DECIMAL(25,6))), 4)::DOUBLE AS total_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', time_bucket(INTERVAL '1 day', ts::TIMESTAMP), event_type,
       count(*), round(sum(CAST(value AS DECIMAL(25,6))), 4)::DOUBLE
FROM events GROUP BY 2, 3
""",
    description="hypertable-style multi-granularity rollup (continuous-aggregate shape)",
)
def q42(spark, sf_dir):
    e = load(spark, "events", sf_dir)

    def agg_at(granularity: str, label: str):
        return (
            e.groupBy(F.window("ts", granularity).alias("w"), "event_type")
            .agg(F.count("*").alias("n"), _dsum(F.col("value"), 4).alias("total_value"))
            .select(
                F.lit(label).alias("granularity"),
                F.col("w.start").alias("bucket"),
                "event_type",
                "n",
                "total_value",
            )
        )

    # at scale: compute the fine granularity once, then re-aggregate coarser
    # levels from it (sums/counts compose); here the data is small enough to
    # keep both oracle-parallel for clarity
    return agg_at("1 hour", "hour").unionByName(agg_at("1 day", "day"))


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
    "q60_ivf_kmeans_topk",
    oracle=None,  # iterative (Lloyd) training is not SQL-expressible;
    # recall vs the exact cosine_topk baseline is pinned in
    # tests/test_operators_misc.py::test_ivf_kmeans_centroids_recall
    description=(
        "IVF top-k with k-means-trained coarse centroids: distributed "
        "Lloyd iterations (one map-side-combined shuffle of n_centroids "
        "groups per iteration), then literal-centroid cell probe join"
    ),
)
def q60(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    cents = similarity.kmeans_centroids(emb, n_centroids=8, n_iter=2)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.ivf_topk(emb, q, n_probe=3, k=5, centroids=cents)


@query(
    "q43_event_time_join",
    oracle="""
SELECT p.user_id,
       p.ts::TIMESTAMP  AS l_ts,
       c.ts::TIMESTAMP  AS r_ts,
       p.event_id       AS l_event_id,
       c.event_id       AS r_event_id
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 1 HOUR
""",
    description=(
        "event-time interval join (purchase <- clicks within the preceding "
        "hour); same operator drives the watermarked stream-stream join in "
        "streaming/pipeline.py"
    ),
)
def q43(spark, sf_dir):
    from ..streaming.pipeline import event_time_join

    ev = load(spark, "events", sf_dir)
    purchases = ev.filter("event_type = 'purchase'").select("user_id", "ts", "event_id")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts", "event_id")
    return event_time_join(purchases, clicks, key="user_id", max_delay="1 hour")


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
    "q11_hash_split",
    oracle=f"""
WITH h AS (
  SELECT doc_id, n_chars,
         {_POLY_SQL.format(x="md5(text)")} % 100 AS bucket
  FROM documents)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       {_ratio_sql("sum(n_chars)", "count(n_chars)", 4)} AS avg_chars
FROM h GROUP BY 1
""",
    description=(
        "deterministic content-hash train/valid/test split (80/10/10): "
        "bucket = poly_hash(md5(text)) %% 100 -- stable across engines and "
        "reshuffles, equal texts land in the same split"
    ),
)
def q11(spark, sf_dir):
    from ..operators.train_prep import hash_split

    return (
        hash_split(load(spark, "documents", sf_dir))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            # exact-BIGINT HALF_UP mean (q49 determinism rule): no double
            # is ever rounded, so the value is engine-exact by construction
            (
                exactnum.ratio_scaled_halfup(
                    F.sum("n_chars"), F.count("n_chars"), 4
                )
                / F.lit(10000.0)
            ).alias("avg_chars"),
        )
    )


@query(
    "q70_pack_token_bins",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKENS_SQL}) END AS n_tokens
  FROM documents),
c AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t)
SELECT source, floor((cum - n_tokens) / 2048)::BIGINT AS bin_id,
       count(*) AS n_docs, sum(n_tokens) AS total_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY source, bin_id
""",
    description=(
        "pretraining sequence packing: greedy per-source token bins of "
        "2048 (cumsum window partitioned by source shard -- no global "
        "single-partition window at scale)"
    ),
)
def q70(spark, sf_dir):
    from ..operators.train_prep import pack_token_bins

    return pack_token_bins(load(spark, "documents", sf_dir), budget=2048)


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
    "q76_weighted_sample",
    oracle=f"""
WITH w AS (
  SELECT source, doc_id,
         {_POLY_SQL.format(x="md5(text)")} % 10000 AS bucket,
         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
              THEN 0.3 ELSE 0.9 END AS wt
  FROM documents)
SELECT source, count(*) AS n_kept
FROM w WHERE bucket < CAST(wt * 10000 AS BIGINT)
GROUP BY source
""",
    description=(
        "corpus mixing: deterministic per-source Bernoulli sampling "
        "(keep 30% of even-numbered sources, 90% of odd) gated on a "
        "content hash -- reproducible across engines/reshuffles, equal "
        "texts kept or dropped together"
    ),
)
def q76(spark, sf_dir):
    from ..operators.train_prep import weighted_sample

    docs = load(spark, "documents", sf_dir)
    # weight as a pure row expression -- no driver collect, no action in
    # the plan build (round-2 advice: the distinct+collect was bounded but
    # unnecessary)
    wt = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(0.3)
    ).otherwise(F.lit(0.9))
    return (
        weighted_sample(docs, wt)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )


@query(
    "q77_multimodal_ann",
    # The corpus is ASCII (max codepoint 121, asserted by the catalog
    # canary), so the payload BYTES equal the text's code points and the
    # numpy byte-histogram has an exact SQL twin: per-bucket counts over
    # unicode(c) % 64, length-normalized with the same IEEE division, then
    # the same left-to-right cosine fold as q38. Upgraded from rows-only
    # in round 4.
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         [(len(list_filter([unicode(c) % 64 for c in string_split(text, '')],
                           m -> m = i)))::DOUBLE
          / greatest(length(text), 1)
          for i in generate_series(0, 63)] AS v
  FROM documents),
q AS (SELECT doc_id AS query_id, v AS qv FROM h
      WHERE doc_id % 100 = 0 AND doc_id < 50000),
scored AS (
  SELECT query_id, h.doc_id AS neighbor_id, {{_COS_SQL}} AS cos_sim
  FROM q CROSS JOIN h WHERE h.doc_id != query_id),
r AS (SELECT *, (row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id))::INT AS rnk
      FROM scored)
SELECT query_id, neighbor_id, cos_sim, rnk AS rank FROM r WHERE rnk <= 3
""".replace("{_COS_SQL}", _COS_SQL),
    description=(
        "end-to-end multimodal similarity: binary payload -> frame "
        "sampling -> byte-histogram embedding (model stand-in) -> exact "
        "cosine top-k, with a FULL SQL oracle (ASCII corpus makes the "
        "byte histogram SQL-expressible; same IEEE normalization and "
        "cosine fold)"
    ),
)
def q77(spark, sf_dir):
    from ..operators import similarity

    docs = multimodal.attach_fake_binary(load(spark, "documents", sf_dir))
    feats = multimodal.byte_histogram_features(docs)
    # |Q| is bounded by a FIXED id cap (<= 500 queries regardless of corpus
    # size), so the cosine_topk broadcast stays constant as data grows; an
    # unbounded %-sample would scale the broadcast with the corpus. Corpora
    # needing more queries than the broadcast budget go through ivf_topk.
    queries_side = feats.filter(
        (F.col("doc_id") % 100 == 0) & (F.col("doc_id") < 50_000)
    )
    return similarity.cosine_topk(
        feats, queries_side, k=3, id_col="doc_id", vec_col="embedding"
    )


@query(
    "q78_dedup_simhash_multiprobe",
    oracle=f"""
WITH s AS ({_simhash_oracle(bits=32)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
""",
    description=(
        "multi-probe SimHash near-dup pairs: Hamming<=1 via sketch + "
        "single-bit-flip probe join (no O(n^2) compare; the DuckDB oracle "
        "IS the O(n^2) definition it must match)"
    ),
)
def q78(spark, sf_dir):
    return dedup.simhash_multiprobe_pairs(
        load(spark, "documents", sf_dir), bits=32, unpersist_after=False
    )


@query(
    "q79_text_bpe_tokens",
    oracle=f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS_SQL}) END AS ws_tokens,
       len(regexp_extract_all(text,
           ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+'))::INT AS bpe_tokens,
       {_BPE_RATIO_SQL} AS chars_per_token
FROM documents
""",
    description=(
        "BPE-style pre-tokenization counts (GPT-2-shape regex, lookahead-"
        "free so Java regex and RE2 count identical matches) + "
        "chars-per-token corpus sizing ratio"
    ),
)
def q79(spark, sf_dir):
    return text.with_bpe_stats(load(spark, "documents", sf_dir))


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


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_DIGIT_RUN_RE = "[0-9]{6,}"


@query(
    "q48_decontaminate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, {_TOKENS_SQL} AS t FROM documents),
grams AS (
  SELECT doc_id, source, array_to_string(t[i:i+7], ' ') AS gram
  FROM tok, UNNEST(generate_series(1, len(t)-8+1)) AS g(i)),
ev AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0')
SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams
FROM grams g JOIN ev USING (gram)
WHERE g.source <> 'src0'
GROUP BY 1
""",
    description=(
        "benchmark decontamination: training docs (source<>src0) sharing "
        "any 8-word n-gram with the held-out eval corpus (source=src0). "
        "Eval gram set broadcasts; the explode inflation dies at the "
        "broadcast join, one doc-id groupBy"
    ),
)
def q48(spark, sf_dir):
    from ..operators.train_prep import ngram_contamination

    docs = load(spark, "documents", sf_dir)
    return ngram_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=8,
    )


@query(
    "q88_pii_redaction",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@example.com ref '
              || (1000000 + doc_id * 97)::VARCHAR AS t
  FROM documents),
e AS (
  SELECT doc_id, t,
         regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS no_email
  FROM aug)
SELECT doc_id,
       len(regexp_extract_all(t, '{_EMAIL_RE}'))::INT AS n_emails,
       len(regexp_extract_all(no_email, '{_DIGIT_RUN_RE}'))::INT AS n_long_numbers,
       regexp_replace(no_email, '{_DIGIT_RUN_RE}', '<NUM>', 'g') AS redacted
FROM e
""",
    description=(
        "PII masking: emails then 6+ digit runs replaced with typed "
        "placeholders + per-row audit counters, over a deterministic "
        "synthetic contact line (the raw corpus has no PII, so the "
        "fixture column makes the check non-trivial). Pure regexp "
        "codegen, no Python"
    ),
)
def q88(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ref "),
            (F.lit(1000000) + F.col("doc_id") * 97).cast("string"),
        ).alias("t"),
    )
    return text.redact_pii(aug, text_col="t").select(
        "doc_id", "n_emails", "n_long_numbers", "redacted"
    )


@query(
    "q49_train_pipeline",
    oracle=f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
d AS (
  SELECT doc_id, source, text FROM documents JOIN keep USING (doc_id)),
q AS (
  SELECT doc_id, source, text,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_TOKENS_SQL}) END)::INT AS n_tokens,
         {text.QUALITY_MICROS_SQL.format(t="text")} AS score_micros
  FROM d),
s AS (
  SELECT *, {_POLY_SQL.format(x="md5(text)")} % 100 AS bucket FROM q
  WHERE score_micros >= 500000)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid'
            ELSE 'test' END AS split,
       source,
       count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       sum(score_micros)::BIGINT AS sum_quality_micros,
       (sum(score_micros) // count(*))::BIGINT AS avg_quality_micros
FROM s GROUP BY 1, 2
""",
    description=(
        "end-to-end training-corpus preparation composed from the "
        "north-star operators: exact dedup (content-hash survivor) -> "
        "exact-integer quality scoring + threshold filter -> deterministic "
        "hash split -> per-(split, source) corpus stats. Every stage is the "
        "verified operator itself (dedup.exact_duplicates, "
        "text.with_quality_micros, train_prep.hash_split). The gated "
        "output and the filter are pure BIGINT -- no double anywhere, so "
        "the result is bit-identical across engines by construction "
        "(the r3/r4 red-cell class is structurally dead)"
    ),
)
def q49(spark, sf_dir):
    from ..operators.text import _floordiv
    from ..operators.train_prep import hash_split

    docs = load(spark, "documents", sf_dir)
    keep = dedup.exact_duplicates(docs).select(F.col("keep_id").alias("doc_id"))
    deduped = docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "source", "text"
    )
    # keep_cols threads source/text through the quality pass: ONE row-local
    # projection instead of a corpus-wide re-join on doc_id
    enriched = text.with_quality_micros(
        deduped, keep_cols=["source", "text"]
    ).filter(F.col("score_micros") >= 500000)
    return (
        hash_split(enriched)
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("score_micros").alias("sum_quality_micros"),
        )
        .withColumn(
            "avg_quality_micros",
            _floordiv(F.col("sum_quality_micros"), F.col("n_docs")),
        )
    )


@query(
    "q44_resample_ffill",
    oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS bucket,
         round(avg(value), 4) AS observed
  FROM events GROUP BY 1, 2),
cal AS (
  SELECT u.user_id, d.bucket
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                            TIMESTAMP '2024-01-30',
                                            INTERVAL 1 DAY)) AS bucket) d),
j AS (
  SELECT c.user_id, c.bucket, d.observed
  FROM cal c LEFT JOIN daily d
    ON c.user_id = d.user_id AND c.bucket = d.bucket)
SELECT user_id, bucket,
       last_value(observed IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       observed IS NOT NULL AS is_observed
FROM j
""",
    description=(
        "time-series regularization: sparse events -> dense per-user daily "
        "calendar (generated, never scanned) -> forward fill via IGNORE "
        "NULLS window. Leading buckets before a user's first observation "
        "stay NULL (no invented history)"
    ),
)
def q44(spark, sf_dir):
    from ..operators.timeseries import resample_ffill

    return resample_ffill(
        load(spark, "events", sf_dir), start="2024-01-01", end="2024-01-30"
    )


@query(
    "q45_dedup_clusters",
    oracle=f"""
WITH RECURSIVE d AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh
  FROM (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE {_jacc_pred_sql("a.sh", "b.sh", 0.8)}),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT r.node, s.dst FROM reach r JOIN sym s ON r.lbl = s.src)
SELECT node AS doc_id, min(lbl) AS cluster_id
FROM reach GROUP BY node
""",
    description=(
        "near-dup pairs resolved to duplicate CLUSTERS: connected "
        "components via iterative min-label propagation (lineage cut per "
        "round with localCheckpoint). The oracle is the recursive-CTE "
        "transitive closure -- the definition, independent of the "
        "iteration strategy"
    ),
)
def q45(spark, sf_dir):
    pairs = dedup.ngram_jaccard_pairs(
        load(spark, "documents", sf_dir), threshold=0.8, unpersist_after=False
    )
    return dedup.duplicate_clusters(pairs)


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
    "q95_stratified_take",
    oracle="""
SELECT doc_id, source
FROM (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(text), doc_id) AS rn
      FROM documents)
WHERE rn <= 5
""",
    description=(
        "deterministic exact-count stratified sample: first 5 docs per "
        "source in content-hash order -- exact counts (unlike sampleBy) "
        "and selection stable across reruns/reshuffles/engines"
    ),
)
def q95(spark, sf_dir):
    from ..operators.train_prep import stratified_take

    return stratified_take(
        load(spark, "documents", sf_dir), n_per_group=5
    ).select("doc_id", "source")


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
    "q97_ivf_indexed_ann",
    # Upgraded from rows-only in round 4: stride-sampled centroids, cell
    # assignment, probing, and the final top-k are all deterministic SQL.
    # The oracle recomputes the ENTIRE lifecycle -- the same every-
    # ceil(N/8)-th-by-id centroids, the same (cosine, cell)-max cell
    # assignment and n_probe=4 probe set, the same k=5 ranking -- so the
    # disk roundtrip must be value-transparent, not merely row-shaped.
    # (Result equality with in-memory ivf_topk + directory pruning stay
    # pinned in tests/test_operators_misc.py.)
    oracle="""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
  FROM e
  WHERE vec_id % greatest((SELECT count(*) FROM e) // 8, 1) = 0
  ORDER BY vec_id LIMIT 8),
cell_scores AS (
  SELECT e.vec_id, e.v, cent.cell,
         list_dot_product(e.v, cent.cv)
           / (sqrt(list_dot_product(e.v, e.v))
              * sqrt(list_dot_product(cent.cv, cent.cv))) AS s
  FROM e CROSS JOIN cent),
ranked_cells AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell DESC)
           AS crn
  FROM cell_scores),
corpus_cell AS (SELECT vec_id, v, cell FROM ranked_cells WHERE crn = 1),
query_cell AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM ranked_cells
  WHERE crn <= 4 AND vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, c.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
  FROM corpus_cell c JOIN query_cell q USING (cell)
  WHERE c.vec_id != q.query_id),
r AS (SELECT *, (row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id))::INT
                 AS rnk
      FROM scored)
SELECT query_id, neighbor_id, cos_sim, rnk AS rank FROM r WHERE rnk <= 5
""",
    description=(
        "disk-backed IVF ANN: cell-partitioned parquet index + "
        "partition-pruned probe reads (the at-rest 100 TB ANN path; "
        "plan-asserted directory pruning), with a FULL SQL oracle "
        "recomputing centroids, cell assignment, probe set, and top-k"
    ),
)
def q97(spark, sf_dir):
    import tempfile

    from ..operators import similarity

    emb = load(spark, "embeddings", sf_dir)
    queries_side = emb.filter(F.col("vec_id") % 100 == 0)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ivf_index"
        similarity.write_ivf_index(emb, path, n_centroids=8)
        out = similarity.ivf_topk_indexed(spark, path, queries_side, n_probe=4, k=5)
        # materialize before the index directory vanishes
        return spark.createDataFrame(out.collect(), out.schema)


@query(
    "q98_repetition_signals",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(lower(text)), '\\s+') END AS w
  FROM documents),
arrs AS (
  SELECT doc_id, w, len(w) AS n,
         [w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w) - 1)] AS bg,
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          FOR i IN generate_series(1, len(w) - 2)] AS tg
  FROM tok),
bgc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS g FROM arrs)
  GROUP BY 1, 2),
bga AS (SELECT doc_id, max(c) AS m, sum(c) AS s FROM bgc GROUP BY 1)
SELECT a.doc_id,
       a.n::INT AS n_tokens,
       CASE WHEN a.n <= 0 THEN 0.0
            ELSE round(1.0 - len(list_distinct(a.w)) / a.n::DOUBLE, 4)
       END AS dup_token_frac,
       CASE WHEN len(a.tg) <= 0 THEN 0.0
            ELSE round(1.0 - len(list_distinct(a.tg)) / len(a.tg)::DOUBLE, 4)
       END AS dup_trigram_frac,
       coalesce(round(bga.m / bga.s::DOUBLE, 4), 0.0) AS top_bigram_frac
FROM arrs a LEFT JOIN bga USING (doc_id)
""",
    description=(
        "Gopher-style repetition quality gates: duplicate-token and "
        "duplicate-trigram fractions (per-row expressions, no shuffle) + "
        "top-bigram occurrence fraction (explode -> two map-side-combined "
        "aggs keyed by (doc, gram) then doc)"
    ),
)
def q98(spark, sf_dir):
    return text.with_repetition(load(spark, "documents", sf_dir))


@query(
    "q99_embedding_dup_clusters",
    oracle=f"""
WITH RECURSIVE pairs AS (
{_signlsh_neardup_oracle(threshold=0.45, bands=12, bits_per_band=6, dim=64)}
),
sym AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION
  SELECT vec_b, vec_a FROM pairs),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT r.node, s.dst FROM reach r JOIN sym s ON r.lbl = s.src)
SELECT node AS vec_id, min(lbl) AS cluster_id
FROM reach GROUP BY node
""",
    description=(
        "embedding near-dup pairs (banded sign-LSH + exact verify) "
        "resolved to duplicate clusters via the same min-label-propagation "
        "connected components as the text path (q45); oracle = recursive "
        "CTE over the replicated banding"
    ),
)
def q99(spark, sf_dir):
    pairs = similarity.cosine_neardup_pairs(
        load(spark, "embeddings", sf_dir),
        threshold=0.45,
        bands=12,
        bits_per_band=6,
        dim=64,
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    return dedup.duplicate_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@query(
    "z01_chunk_windows",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(lower(text)), '\\s+') END AS w
  FROM documents),
st AS (
  SELECT doc_id, w, len(w) AS n,
         list_filter(generate_series(0, len(w) - 1, 48),
                     s -> s = 0 OR s + 16 < len(w)) AS starts
  FROM tok WHERE len(w) > 0),
e AS (
  SELECT doc_id, (g.i - 1)::INT AS chunk_id, starts[g.i] AS s, n, w
  FROM st CROSS JOIN UNNEST(generate_series(1, len(starts))) g(i))
SELECT doc_id, chunk_id,
       s::INT AS start_token,
       least(64, n - s)::INT AS n_chunk_tokens,
       array_to_string(w[s + 1 : s + 64], ' ') AS chunk_text
FROM e
""",
    description=(
        "sliding token-window chunking (window=64, stride=48; overlap 16) "
        "for context-window prep: per-row sequence+slice+posexplode, "
        "map-only fan-out, no shuffle"
    ),
)
def z01(spark, sf_dir):
    from ..operators.train_prep import chunk_token_windows

    return chunk_token_windows(
        load(spark, "documents", sf_dir), window=64, stride=48
    )


@query(
    "z02_novel_documents",
    oracle="""
SELECT n.doc_id, n.source
FROM documents n
WHERE n.source <> 'src0'
  AND md5(n.text) NOT IN (SELECT md5(text) FROM documents WHERE source = 'src0')
""",
    description=(
        "incremental-ingestion exact dedup: new batch (source<>src0) "
        "anti-joined on content md5 against the existing corpus (src0); "
        "bucket the corpus index by the hash for exchange-free per-batch "
        "ingests at scale"
    ),
)
def z02(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    return dedup.novel_documents(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    ).select("doc_id", "source")


def _minhash_novel_oracle(threshold: float = 0.5) -> str:
    sig_exprs = ",\n         ".join(
        f"{e} AS s{i}" for i, e in enumerate(xhash.minhash_sql_exprs("sh", k=8))
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, side, {i} AS band, "
        f"s{2 * i}::VARCHAR || ',' || s{2 * i + 1}::VARCHAR AS key FROM sig"
        for i in range(4)
    )
    return f"""
WITH d AS (
  SELECT doc_id, CASE WHEN source = 'src0' THEN 'c' ELSE 'n' END AS side,
         {_SHINGLES_SQL} AS sh
  FROM (SELECT doc_id, source, {_TOKENS_SQL} AS w FROM documents)),
sig AS (SELECT doc_id, side, sh, {sig_exprs} FROM d),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.side = 'n' AND b.side = 'c'),
dup AS (
  SELECT DISTINCT new_id
  FROM cand JOIN d sa ON cand.new_id = sa.doc_id
            JOIN d sb ON cand.corpus_id = sb.doc_id
  WHERE {_jacc_pred_sql("sa.sh", "sb.sh", threshold)})
SELECT doc_id, source FROM documents
WHERE source <> 'src0' AND doc_id NOT IN (SELECT new_id FROM dup)
"""


@query(
    "z03_minhash_novel",
    oracle=_minhash_novel_oracle(),
    description=(
        "incremental-ingestion NEAR-dup filter: new batch keeps only docs "
        "with no corpus document at Jaccard>=0.5; candidates via "
        "cross-frame banded MinHash (new bands x corpus bands, never "
        "corpus x corpus), exact-Jaccard verify on candidates only"
    ),
)
def z03(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    return dedup.minhash_novel(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        threshold=0.5,
        unpersist_after=False,
    ).select("doc_id", "source")


@query(
    "z04_sliding_window",
    oracle="""
WITH w AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP)
           - (k.k * INTERVAL '5 minutes') AS win_start,
         event_type, value
  FROM events, (SELECT unnest([0, 1]) AS k) k)
SELECT win_start, event_type,
       count(*) AS n, round(sum(CAST(value AS DECIMAL(25,6))), 4)::DOUBLE AS total_value
FROM w GROUP BY 1, 2
""",
    description=(
        "sliding (hopping) event-time window: 10-minute windows every 5 "
        "minutes -- each event lands in exactly window/slide buckets; the "
        "oracle derives the same 2 windows per event from the 5-minute "
        "bucket, batch form of the streaming hopping aggregation"
    ),
)
def z04(spark, sf_dir):
    e = load(spark, "events", sf_dir)
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), _dsum(F.col("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
    )


@query(
    "z05_audio_meta",
    oracle="""
WITH p AS (
  SELECT doc_id,
         (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                          WHEN 2 THEN 44100 ELSE 48000 END) AS rate,
         64 + (n_chars * 7) % 1000 AS n_samples
  FROM documents)
SELECT doc_id,
       (44 + 2 * n_samples)::BIGINT AS n_bytes,
       rate::INT AS sample_rate,
       1 AS n_channels,
       n_samples::BIGINT AS n_samples,
       (n_samples * 1000 // rate)::BIGINT AS duration_ms,
       'PCM16' AS codec
FROM p
""",
    description=(
        "audio leg of the multimodal family: REAL RIFF/WAVE payloads "
        "(stdlib wave, 16-bit mono PCM, deterministic generation "
        "parameters) -> REAL header decode via Arrow-batched mapInPandas. "
        "The oracle predicts the decoded metadata arithmetically from the "
        "generation parameters, so a decoder that misparses actual WAV "
        "headers fails the gate; only the image pixel codec remains "
        "environment-stubbed"
    ),
)
def z05(spark, sf_dir):
    docs = multimodal.attach_wav_binary(load(spark, "documents", sf_dir))
    return multimodal.decode_wav_meta(docs)


@query(
    "z06_continuous_aggregate",
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP) AS win_start, event_type,
       count(*) AS n, min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
""",
    description=(
        "continuous aggregate: 3 incremental partial-aggregate ingests + "
        "merge-on-read must equal one direct aggregation over all events "
        "(count/min/max merge exactly; float sums are pinned in tests "
        "instead, where tolerance applies)"
    ),
)
def z06(spark, sf_dir):
    import tempfile

    from ..operators.rollup import RollupTable

    ev = load(spark, "events", sf_dir).select("ts", "event_type", "value")
    with tempfile.TemporaryDirectory() as tmp:
        rt = RollupTable(f"{tmp}/r", bucket="5 minutes", keys=["event_type"])
        for m in range(3):
            rt.ingest(ev.filter(F.pmod(F.xxhash64("ts"), F.lit(3)) == m))
        out = rt.read(spark).select(
            "win_start", "event_type", "n", "min_value", "max_value"
        )
        # materialize before the temp index vanishes (bounded: one row per
        # (bucket, type) group -- the same volume the driver collects)
        return spark.createDataFrame(out.collect(), out.schema)


@query(
    "z07_corpus_manifest",
    oracle=f"""
WITH q AS (
  SELECT source, text,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_TOKENS_SQL}) END) AS n_tokens,
         {text.QUALITY_MICROS_SQL.format(t="text")} AS score_micros
  FROM documents)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct_texts,
       sum(n_tokens)::BIGINT AS total_tokens,
       (sum(score_micros) // count(*))::BIGINT AS avg_quality_micros,
       sum(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END)::BIGINT AS n_short
FROM q GROUP BY source
""",
    description=(
        "per-source corpus manifest in one pass: doc/distinct-text/token "
        "counts, mean composite quality (exact integer micros -- the q49 "
        "determinism rule), short-doc tally -- the report a corpus owner "
        "reads before mixing sources (single scan, one map-side-combined "
        "aggregation)"
    ),
)
def z07(spark, sf_dir):
    from ..operators.text import _floordiv

    docs = load(spark, "documents", sf_dir)
    q = text.with_quality_micros(docs, keep_cols=["source", "text"])
    return (
        q.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("score_micros").alias("sum_micros"),
            F.sum(F.when(F.col("n_tokens") < 20, 1).otherwise(0)).alias("n_short"),
        )
        .withColumn(
            "avg_quality_micros", _floordiv(F.col("sum_micros"), F.col("n_docs"))
        )
        .drop("sum_micros")
    )


@query(
    "z08_validate_quarantine",
    oracle="""
WITH v AS (
  SELECT doc_id,
         array_to_string(list_filter(
           [CASE WHEN NOT (n_chars >= 100) THEN 'min_length' END,
            CASE WHEN NOT (lang IN ('de', 'en', 'fr')) THEN 'supported_lang' END],
           x -> x IS NOT NULL), ',') AS failed
  FROM documents)
SELECT failed AS failed_rules, count(*) AS n
FROM v WHERE failed <> '' GROUP BY failed
""",
    description=(
        "rule-based ingestion quarantine audit: per violated-rule-set "
        "counts from validate_rows (named predicates, failed_rules audit "
        "column; good rows stay pushdown-friendly filters)"
    ),
)
def z08(spark, sf_dir):
    from ..sources.robust import validate_rows

    docs = load(spark, "documents", sf_dir)
    _good, quar = validate_rows(
        docs,
        {
            "min_length": F.col("n_chars") >= 100,
            "supported_lang": F.col("lang").isin("de", "en", "fr"),
        },
    )
    return quar.groupBy(
        F.array_join("failed_rules", ",").alias("failed_rules")
    ).agg(F.count("*").alias("n"))


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
    "z10_token_entropy",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0),
c AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
SELECT c.doc_id,
       round(-sum((c.c / n.n::DOUBLE) * ln(c.c / n.n::DOUBLE)), 4) AS token_entropy,
       count(*) AS n_distinct_tokens
FROM c JOIN n USING (doc_id)
GROUP BY c.doc_id
""",
    description=(
        "Shannon entropy of the within-document token distribution (the "
        "low-entropy tail is boilerplate/degenerate text): explode -> two "
        "map-side-combined aggregations keyed by (doc, token) then doc"
    ),
)
def z10(spark, sf_dir):
    docs = load(spark, "documents", sf_dir).filter(
        F.length(F.trim("text")) > 0
    )
    c = (
        docs.select("doc_id", F.explode(xhash.ws_tokens(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    n = c.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        c.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).alias("token_entropy"),
            F.count("*").alias("n_distinct_tokens"),
        )
    )


@query(
    "z11_canonical_dedup",
    oracle=f"""
WITH c AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(
               translate(lower(text), '{text.ACCENT_SRC}', '{text.ACCENT_DST}'),
               '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h
  FROM documents)
SELECT h AS canon_hash, count(*) AS n_copies, min(doc_id) AS keep_id
FROM c GROUP BY h
""",
    description=(
        "exact dedup on the canonical text form (lowercase + shared-map "
        "accent fold + punctuation strip + whitespace collapse): one "
        "map-side-combined hash-groupBy, catches the variant copies "
        "byte-exact dedup misses"
    ),
)
def z11(spark, sf_dir):
    return text.canonical_dedup_groups(load(spark, "documents", sf_dir))


@query(
    "z12_image_meta",
    oracle="""
WITH p AS (
  SELECT doc_id,
         4 + doc_id % 13 AS width,
         3 + n_chars % 11 AS height
  FROM documents)
SELECT doc_id,
       width::INT AS width, height::INT AS height,
       8 AS bit_depth, 0 AS color_type, 'PNG' AS format,
       (width * height)::BIGINT AS n_pixels,
       -- exact integer sum of (x*7 + y*13 + doc_id) % 256 over the
       -- raster, exactly as the generator lays pixels out
       list_sum(flatten(
         [[(x * 7 + y * 13 + doc_id) % 256
           for x in generate_series(0, width - 1)]
          for y in generate_series(0, height - 1)]))::BIGINT AS pixel_sum
FROM p
""",
    description=(
        "image leg, codec-REAL end to end: genuine PNG payloads (stdlib "
        "zlib IDAT + CRCs) -> real IHDR header parse -> FULL pixel decode "
        "(inflate + scanline unfilter) -> per-image pixel_sum. The oracle "
        "recomputes dimensions and the exact pixel sum from the "
        "deterministic generation parameters, so a decoder that misreads "
        "actual PNG bytes (header, CRC, filters, raster order) fails the "
        "gate"
    ),
)
def z12(spark, sf_dir):
    docs = multimodal.attach_png_binary(load(spark, "documents", sf_dir))
    meta = multimodal.decode_png_meta(docs).select(
        "doc_id", "width", "height", "bit_depth", "color_type", "format"
    )
    pix = multimodal.decode_image_pixels(docs).select(
        "doc_id",
        F.size("pixels").cast("long").alias("n_pixels"),
        F.aggregate(
            "pixels", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("pixel_sum"),
    )
    return meta.join(pix, "doc_id")


@query(
    "z83_bmp_pixel_stats",
    oracle="""
WITH p AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         3 + n_chars % 11 AS h
  FROM documents),
px AS (
  SELECT doc_id, w, h, w * h AS n,
         flatten([[(x * 7 + y * 13 + doc_id) % 256
                   for x in generate_series(0, w - 1)]
                  for y in generate_series(0, h - 1)]) AS pb,
         flatten([[(x * 3 + y * 5 + 2 * doc_id) % 256
                   for x in generate_series(0, w - 1)]
                  for y in generate_series(0, h - 1)]) AS pg,
         flatten([[(x * 11 + y + 3 * doc_id) % 256
                   for x in generate_series(0, w - 1)]
                  for y in generate_series(0, h - 1)]) AS pr
  FROM p),
s AS (
  SELECT doc_id, w, h, n,
         list_sum(pb)::BIGINT AS sum_b,
         list_sum(pg)::BIGINT AS sum_g,
         list_sum(pr)::BIGINT AS sum_r,
         list_sum([v * v for v in pb])::BIGINT AS sq_b,
         list_sum([v * v for v in pg])::BIGINT AS sq_g,
         list_sum([v * v for v in pr])::BIGINT AS sq_r
  FROM px)
SELECT doc_id, w::INT AS width, h::INT AS height, n::BIGINT AS n_pixels,
       sum_b, sum_g, sum_r,
       ((2 * 1000000 * sum_b + n) // (2 * n))::BIGINT AS mean_b_micros,
       ((2 * 1000000 * sum_g + n) // (2 * n))::BIGINT AS mean_g_micros,
       ((2 * 1000000 * sum_r + n) // (2 * n))::BIGINT AS mean_r_micros,
       ((2 * 1000000 * (n * sq_b - sum_b * sum_b) + n * n)
        // (2 * n * n))::BIGINT AS var_b_micros,
       ((2 * 1000000 * (n * sq_g - sum_g * sum_g) + n * n)
        // (2 * n * n))::BIGINT AS var_g_micros,
       ((2 * 1000000 * (n * sq_r - sum_r * sum_r) + n * n)
        // (2 * n * n))::BIGINT AS var_r_micros
FROM s
""",
    description=(
        "COLOR image leg, codec-REAL end to end: genuine 24-bit BMP "
        "payloads (stdlib struct, bottom-up raster, row padding) -> full "
        "pixel decode with dimensions MEASURED against the raster (a "
        "lying header raises) -> per-channel sum + exact-integer-micros "
        "mean/variance from actual decoded pixels. The oracle recomputes "
        "every statistic arithmetically from the deterministic generation "
        "parameters, so a decoder that misreads real BMP bytes (padding, "
        "bottom-up order, BGR layout) fails the gate. Closes the r4 "
        "pixel-stub gap: NotImplementedError now remains only for "
        "externally-coded formats (JPEG/WebP)"
    ),
)
def z83(spark, sf_dir):
    docs = multimodal.attach_bmp_binary(load(spark, "documents", sf_dir))
    return multimodal.decode_bmp_pixel_stats(docs)


@query(
    "z13_deterministic_sample",
    oracle=f"""
SELECT doc_id, source, n_chars
FROM (SELECT doc_id, source, n_chars,
             {_POLY_SQL.format(x="md5('0' || text)")} AS sk
      FROM documents)
ORDER BY sk, doc_id
LIMIT 50
""",
    description=(
        "exact-size uniform corpus sample as a bottom-k sketch over a "
        "portable content hash: reproducible across engines/reshuffles/"
        "corpus growth (KMV min-wise property), executed as "
        "TakeOrderedAndProject -- per-partition k-row heaps, no global "
        "sort, the one-pass sampling shape a 100 TB corpus needs"
    ),
)
def z13(spark, sf_dir):
    from ..operators.train_prep import deterministic_sample

    docs = load(spark, "documents", sf_dir)
    return deterministic_sample(docs, 50).select("doc_id", "source", "n_chars")


@query(
    "z14_salted_agg",
    oracle="""
SELECT event_type,
       count(*)                                            AS n_events,
       round(sum(CAST(value AS DECIMAL(25,6))), 2)::DOUBLE AS total_value,
       min(value)                                          AS min_value,
       max(value)                                          AS max_value
FROM events
GROUP BY 1
""",
    description=(
        "skew-safe two-phase aggregation: partial-agg on (key, salt) "
        "spreads a hot key over 16 reducers, then the merge shuffle "
        "carries only |groups|*16 partial rows. Result-identical to the "
        "plain groupBy (exact DECIMAL sums keep two-phase == one-phase "
        "bit-for-bit); the salt is a deterministic content hash, never "
        "rand() (task retries must re-salt identically)"
    ),
)
def z14(spark, sf_dir):
    from ..operators.skew import salted_agg

    ev = load(spark, "events", sf_dir)
    out = salted_agg(
        ev,
        ["event_type"],
        [
            ("n_events", "count", F.lit(1)),
            ("_sv", "sum", F.col("value").cast("decimal(25,6)")),
            ("min_value", "min", F.col("value")),
            ("max_value", "max", F.col("value")),
        ],
        salt=F.xxhash64("event_id"),
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("_sv", 2).cast("double").alias("total_value"),
        "min_value",
        "max_value",
    )


@query(
    "z15_bloom_decontaminate",
    oracle=REGISTRY["q48_decontaminate"].oracle,
    description=(
        "q48's decontamination for the eval-set-too-big-to-broadcast "
        "regime: JVM-hashed Bloom prefilter (capped 128 KiB bit array "
        "broadcast, Arrow-batched vectorized probe) kills the explode "
        "inflation before any shuffle, then an exact SHUFFLE join against "
        "the eval gram set removes false positives -- result-identical to "
        "the exact operator (same oracle)"
    ),
)
def z15(spark, sf_dir):
    from ..operators.train_prep import bloom_decontaminate

    docs = load(spark, "documents", sf_dir)
    return bloom_decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=8,
    )


@query(
    "z16_dup_ngram_stats",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
g AS (
  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS gram
  FROM tok, UNNEST(generate_series(1, len(t)-5+1)) AS s(i)),
hot AS (
  SELECT gram
  FROM (SELECT gram, count(DISTINCT doc_id) AS dfc FROM g GROUP BY 1)
  WHERE dfc >= 10),
agg AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         sum(CASE WHEN hot.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dup
  FROM g LEFT JOIN hot ON g.gram = hot.gram
  GROUP BY 1)
SELECT d.doc_id,
       coalesce(n_grams, 0)     AS n_grams,
       coalesce(n_dup, 0)       AS n_dup_grams,
       CASE WHEN coalesce(n_grams, 0) > 0
            THEN (coalesce(n_dup, 0) * 10000) // n_grams
            ELSE 0 END          AS dup_bp
FROM documents d LEFT JOIN agg USING (doc_id)
""",
    description=(
        "corpus-level duplicated-n-gram rate per doc (Lee et al. exact-"
        "substring dedup signal at 5-gram granularity): grams occurring "
        "in >=10 docs are boilerplate; dup_bp = exact-integer basis "
        "points of each doc made of them. Two gram-keyed shuffles with "
        "map-side combine; catches 80%-shared-template docs that "
        "document-level dedup can never see"
    ),
)
def z16(spark, sf_dir):
    return dedup.dup_ngram_stats(
        load(spark, "documents", sf_dir), n=5, min_docs=10
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
    "z18_bigram_coherence",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM tok, UNNEST(generate_series(1, len(t)-1)) AS s(i)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1),
term AS (
  SELECT w1, w2, (c12 * 1000000) // c1 AS term
  FROM c12 JOIN c1 USING (w1)),
doc AS (
  SELECT bg.doc_id, count(*) AS n_bigrams, sum(term)::BIGINT AS s
  FROM bg JOIN term USING (w1, w2)
  GROUP BY 1)
SELECT d.doc_id,
       coalesce(n_bigrams, 0) AS n_bigrams,
       CASE WHEN coalesce(n_bigrams, 0) > 0 THEN s // n_bigrams
            ELSE 0 END AS coherence_ppm
FROM documents d LEFT JOIN doc USING (doc_id)
""",
    description=(
        "corpus-trained bigram-LM fluency score (the CCNet/KenLM "
        "perplexity-filter shape): per-doc integer mean of exact "
        "parts-per-million conditional probabilities c(w1,w2)/c(w1). "
        "Pure integer arithmetic end to end -- no float summation to go "
        "order-sensitive; bigram-type table built once with map-side "
        "combine, head counts derived from it, occurrences join on the "
        "gram key"
    ),
)
def z18(spark, sf_dir):
    return text.bigram_coherence(load(spark, "documents", sf_dir))


@query(
    "z19_semantic_dedup",
    oracle=f"""
WITH RECURSIVE p AS (
  SELECT vec_a, vec_b FROM (
{_signlsh_neardup_oracle(threshold=0.45, bands=12, bits_per_band=6, dim=64)}
  ) AS pr),
sym AS (
  SELECT vec_a AS src, vec_b AS dst FROM p
  UNION
  SELECT vec_b, vec_a FROM p),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT r.node, s.dst FROM reach r JOIN sym s ON r.lbl = s.src),
cl AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT e.vec_id,
       coalesce(cl.cluster_id, e.vec_id) AS cluster_id,
       coalesce(cl.cluster_id, e.vec_id) = e.vec_id AS kept
FROM embeddings e LEFT JOIN cl ON cl.node = e.vec_id
""",
    description=(
        "SemDeDup-shaped semantic dedup: banded sign-LSH near-dup pairs "
        "resolved to connected components, one keep/drop decision per "
        "vector (cluster representative = min id; singletons keep "
        "themselves). The oracle is the recursive-CTE transitive closure "
        "over the SAME deterministic pair set as q39"
    ),
)
def z19(spark, sf_dir):
    return similarity.semantic_dedup(
        load(spark, "embeddings", sf_dir),
        threshold=0.45,
        bands=12,
        bits_per_band=6,
        dim=64,
    )


@query(
    "z20_quality_classifier",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKENS_SQL}) END AS n_tokens,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE list_sum(list_transform({_TOKENS_SQL},
                   s -> {xhash.MD5_HASH32_SQL.format(x='s')} % 2001 - 1000))
         END::BIGINT AS weight_sum
  FROM documents)
SELECT doc_id, n_tokens, weight_sum,
       CASE WHEN n_tokens > 0 THEN weight_sum * 10 // n_tokens
            ELSE 0 END::BIGINT AS score_bp,
       weight_sum > 0 AS accept
FROM tok
""",
    description=(
        "hashed-bag-of-words linear quality classifier (fastText/DSIR "
        "filter shape, hash-derived integer weights standing in for the "
        "learned table): exact BIGINT weight sums -- no float "
        "accumulation, partition-order- and engine-independent; pure "
        "scan-speed projection, zero shuffles/UDFs"
    ),
)
def z20(spark, sf_dir):
    return text.hashed_linear_score(load(spark, "documents", sf_dir))


@query(
    "z21_embedding_moments",
    oracle="""
WITH m AS (
  SELECT i - 1 AS dim_idx,
         round(embedding[i]::DOUBLE * 1000000)::BIGINT AS mv
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS s(i))
SELECT dim_idx, count(*) AS n,
       sum(mv)::BIGINT AS sum_micro,
       (sum(mv)::BIGINT // count(*)) AS mean_micro,
       sum(mv * mv)::BIGINT AS sum_sq_micro2
FROM m GROUP BY dim_idx
""",
    description=(
        "per-dimension embedding corpus moments (whitening/normalization "
        "stats): values quantized to exact integer micros BEFORE "
        "summation so the sums are associative -- deterministic under any "
        "partition order; posexplode fan-out in the scan projection + one "
        "map-side-combined groupBy over dim keys, shuffle payload "
        "O(dim x partitions) regardless of corpus size"
    ),
)
def z21(spark, sf_dir):
    return similarity.embedding_moments(load(spark, "embeddings", sf_dir))


@query(
    "z22_source_overlap",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, {_TOKENS_SQL} AS t FROM documents),
g AS (
  SELECT DISTINCT source AS src, array_to_string(t[i:i+7], ' ') AS gram
  FROM tok, UNNEST(generate_series(1, len(t)-8+1)) AS s(i))
SELECT a.src AS src_a, b.src AS src_b, count(*) AS shared_grams
FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
GROUP BY 1, 2
""",
    description=(
        "cross-source contamination matrix: distinct shared 8-gram counts "
        "per unordered source pair (which corpus slices duplicate each "
        "other / leak eval content). No gram self-join on the Spark side: "
        "each gram folds to its sorted source SET (bounded by |sources|, "
        "not corpus size) and pairs are generated by pure array "
        "expressions; the oracle is the equivalent gram self-join"
    ),
)
def z22(spark, sf_dir):
    from ..operators.train_prep import source_overlap_matrix

    return source_overlap_matrix(load(spark, "documents", sf_dir), n=8)


@query(
    "z23_weighted_sample",
    oracle=f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         round(n_chars::DOUBLE
               / (({xhash.MD5_HASH32_SQL.format(x="'0' || text")} + 1)
                  / 4294967296.0), 4) AS priority
  FROM documents)
SELECT doc_id, source, n_chars, priority
FROM s ORDER BY priority DESC, doc_id LIMIT 50
""",
    description=(
        "weighted without-replacement corpus sample via priority sampling "
        "(w/u over a content-hash uniform; top-k priorities): the "
        "corpus-mixing draw, deterministic across engines because the "
        "single IEEE division is correctly rounded everywhere (unlike "
        "pow/ln exponential keys). Executes as TakeOrderedAndProject -- "
        "k-row heap per task, no global sort"
    ),
)
def z23(spark, sf_dir):
    from ..operators.train_prep import weighted_priority_sample

    d = load(spark, "documents", sf_dir).select("doc_id", "source", "n_chars", "text")
    return weighted_priority_sample(d, k=50, weight_col="n_chars").drop("text")


@query(
    "z24_video_meta",
    oracle="""
WITH p AS (
  SELECT doc_id,
         (2 + doc_id % 5)   AS n_frames,
         (10 + doc_id % 20) AS fps,
         (4 + doc_id % 13)  AS width,
         (3 + n_chars % 11) AS height
  FROM documents)
SELECT doc_id, n_frames::INT AS n_frames, fps::INT AS fps,
       width::INT AS width, height::INT AS height,
       (n_frames * 1000 // fps)::BIGINT AS duration_ms,
       'MPNG' AS format
FROM p
""",
    description=(
        "video leg, codec-REAL end to end: genuine multi-frame payloads "
        "(real stdlib PNGs inside a length-prefixed MPNG container) -> "
        "real container walk + frame-0 IHDR parse with CRC check -> "
        "n_frames/fps/dims/integer-millis duration. The oracle recomputes "
        "every field from the deterministic generation parameters, so a "
        "parser that mis-walks the sample table or misreads frame headers "
        "fails the gate; sampled frames are REAL PNGs that feed the "
        "decode_png pixel path (test-pinned)"
    ),
)
def z24(spark, sf_dir):
    docs = multimodal.attach_mpng_binary(load(spark, "documents", sf_dir))
    return multimodal.decode_mpng_meta(docs)


@query(
    "z25_video_frame_stats",
    oracle="""
WITH p AS (
  SELECT doc_id,
         (2 + doc_id % 5)   AS n_frames,
         (4 + doc_id % 13)  AS width,
         (3 + n_chars % 11) AS height
  FROM documents),
f AS (
  SELECT doc_id, width, height, i AS frame_idx
  FROM p, UNNEST(generate_series(0, n_frames - 1)) AS s(i)
  WHERE i % 2 = 0)
SELECT doc_id, frame_idx::INT AS frame_idx,
       width::INT AS width, height::INT AS height,
       list_sum(flatten(
         [[(x * 7 + y * 13 + doc_id + frame_idx * 31) % 256
           for x in generate_series(0, width - 1)]
          for y in generate_series(0, height - 1)]))::BIGINT AS pixel_sum
FROM f
""",
    description=(
        "frame-granular video pixel decode, codec-REAL: MPNG payloads -> "
        "keyframe sampling (stride 2) -> full stdlib PNG pixel decode per "
        "frame -> exact per-frame pixel sums. The oracle recomputes every "
        "sampled frame's raster arithmetically, so container walking, "
        "frame extraction, AND pixel decoding are all gate-verified"
    ),
)
def z25(spark, sf_dir):
    vids = multimodal.attach_mpng_binary(load(spark, "documents", sf_dir))
    frames = multimodal.sample_mpng_frames(vids, stride=2)
    return multimodal.frame_pixel_stats(frames)


@query(
    "z26_hard_negatives",
    oracle=f"""
WITH e AS (SELECT vec_id, label, [x::DOUBLE for x in embedding] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
      FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT query_id, query_label, e.vec_id AS neighbor_id,
         e.label AS neighbor_label, {_COS_SQL} AS cos_sim
  FROM q CROSS JOIN e
  WHERE e.vec_id != query_id AND e.label != query_label),
r AS (SELECT *, (row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id))::INT AS rnk
      FROM scored)
SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim,
       rnk AS rank
FROM r WHERE rnk <= 5
""",
    description=(
        "hard-negative mining for contrastive training: per query, the "
        "top-5 most-similar vectors with a DIFFERENT label (the nearest "
        "wrong answers DPR/SimCSE-style training samples as negatives). "
        "Broadcast queries + label-mismatch predicate inside the scan "
        "join + per-partition partial top-k -- one corpus scan, no "
        "corpus shuffle"
    ),
)
def z26(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    return similarity.hard_negatives(
        emb, emb.filter(F.col("vec_id") % 100 == 0), k=5
    )


@query(
    "z27_label_centroids",
    oracle="""
WITH m AS (
  SELECT label, i - 1 AS dim_idx,
         round(embedding[i]::DOUBLE * 1000000)::BIGINT AS mv
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS s(i))
SELECT label, dim_idx, count(*) AS n,
       sum(mv)::BIGINT AS sum_micro,
       (sum(mv)::BIGINT // count(*)) AS mean_micro
FROM m GROUP BY label, dim_idx
""",
    description=(
        "per-label embedding centroids (class prototypes) in exact "
        "integer micros -- nearest-centroid classification / per-class "
        "drift tables. Deterministic by construction (associative BIGINT "
        "sums); one map-side-combined groupBy over (label x dim) keys, "
        "shuffle payload independent of corpus size"
    ),
)
def z27(spark, sf_dir):
    return similarity.label_centroids(load(spark, "embeddings", sf_dir))


@query(
    "z28_source_mixing",
    oracle=f"""
WITH per_source AS (
  SELECT source, count(*) AS n_docs,
         sum(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len({_TOKENS_SQL}) END)::BIGINT AS n_tokens
  FROM documents GROUP BY source),
capped AS (
  SELECT *, least(n_tokens, 100000) AS capped_tokens FROM per_source)
SELECT source, n_docs, n_tokens, capped_tokens,
       (capped_tokens * 1000000 // (SELECT sum(capped_tokens) FROM capped))::BIGINT
         AS weight_ppm
FROM capped
""",
    description=(
        "corpus-mixing weight table: per-source doc/token counts with "
        "capped token mass normalized to exact integer ppm weights (the "
        "guard against one crawl dominating the mixture). Pure integer "
        "arithmetic -- deterministic across engines/partition orders; one "
        "map-side-combined source groupBy + a 1-row total broadcast"
    ),
)
def z28(spark, sf_dir):
    from ..operators.train_prep import source_mixing_weights

    return source_mixing_weights(load(spark, "documents", sf_dir))


@query(
    "z29_argmax_family",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKENS_SQL}) END AS n_tokens
  FROM documents),
k AS (
  SELECT source,
         max(n_tokens * 10000000 + doc_id) AS kmax,
         min(n_tokens * 10000000 + doc_id) AS kmin
  FROM t GROUP BY source)
SELECT source,
       (kmax // 10000000)::BIGINT AS longest_tokens,
       (kmax % 10000000)::BIGINT  AS longest_doc_id,
       (kmin // 10000000)::BIGINT AS shortest_tokens,
       (kmin % 10000000)::BIGINT  AS shortest_doc_id
FROM k
""",
    description=(
        "deterministic arg-max/arg-min per group via composite integer "
        "keys (value * 10^7 + id packed into one BIGINT): longest and "
        "shortest doc per source with ties broken by id -- the arg-max "
        "family without max_by's arbitrary tie behavior, and a plain "
        "map-side-combined min/max agg instead of any window"
    ),
)
def z29(spark, sf_dir):
    d = load(spark, "documents", sf_dir)
    n = text.token_count(F.col("text"))
    key = n.cast("long") * 10000000 + F.col("doc_id")
    k = d.select(F.col("source"), key.alias("_k")).groupBy("source").agg(
        F.max("_k").alias("kmax"), F.min("_k").alias("kmin")
    )
    return k.select(
        "source",
        F.expr("kmax div 10000000").alias("longest_tokens"),
        (F.col("kmax") % 10000000).alias("longest_doc_id"),
        F.expr("kmin div 10000000").alias("shortest_tokens"),
        (F.col("kmin") % 10000000).alias("shortest_doc_id"),
    )


@query(
    "z30_grouped_weighted_sample",
    oracle=f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         round(n_chars::DOUBLE
               / (({xhash.MD5_HASH32_SQL.format(x="'0' || text")} + 1)
                  / 4294967296.0), 4) AS priority
  FROM documents),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY priority DESC, doc_id) AS rn
  FROM s)
SELECT doc_id, source, n_chars, priority FROM r WHERE rn <= 5
""",
    description=(
        "per-source weighted quota sample (priority sampling within each "
        "group): every source contributes its own top-5 weighted draws, "
        "so no source's weight mass crowds out another's quota -- the "
        "per-domain corpus-mixing form. One window shuffle on the group "
        "key; the same engine-portable w/u keys as z23"
    ),
)
def z30(spark, sf_dir):
    from ..operators.train_prep import grouped_priority_sample

    d = load(spark, "documents", sf_dir).select("doc_id", "source", "n_chars", "text")
    return grouped_priority_sample(
        d, n_per_group=5, weight_col="n_chars"
    ).drop("text")


@query(
    "z31_funnel",
    oracle="""
WITH e AS (SELECT user_id, event_type, ts FROM events),
s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view'
       GROUP BY user_id),
s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
SELECT 1 AS stage_idx, 'view' AS stage, (SELECT count(*) FROM s1) AS n_users
UNION ALL
SELECT 2, 'click', (SELECT count(*) FROM s2)
UNION ALL
SELECT 3, 'purchase', (SELECT count(*) FROM s3)
""",
    description=(
        "ordered funnel (view -> click -> purchase): stage i counts users "
        "whose first stage-i event is strictly after their first "
        "completion of stage i-1 (min-timestamp chaining -- no per-user "
        "event sort). Per-stage min-aggregates over the scan + joins of "
        "user-bounded frames; event rows are never joined row-to-row"
    ),
)
def z31(spark, sf_dir):
    from ..operators.funnel import funnel_counts

    return funnel_counts(load(spark, "events", sf_dir))


@query(
    "z32_cohort_retention",
    oracle="""
WITH c AS (
  SELECT user_id, date_trunc('week', min(ts))::DATE AS cohort_week
  FROM events GROUP BY user_id),
a AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS active_week
  FROM events)
SELECT cohort_week,
       (date_diff('day', cohort_week, active_week) // 7)::INT AS week_offset,
       count(*) AS n_users
FROM a JOIN c USING (user_id)
GROUP BY 1, 2
""",
    description=(
        "weekly cohort retention: users cohorted by first-event ISO week; "
        "each (cohort_week, week_offset) cell counts that cohort's users "
        "active k weeks later. Per-user min-agg + (user, week) distinct + "
        "one user-keyed join; every intermediate bounded by users x "
        "weeks, never event volume"
    ),
)
def z32(spark, sf_dir):
    from ..operators.funnel import cohort_retention

    return cohort_retention(load(spark, "events", sf_dir))


@query(
    "z33_event_paths",
    oracle="""
WITH p AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id)
SELECT path, count(*) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path
LIMIT 20
""",
    description=(
        "clickstream path mining: per-user event-type sequences in "
        "(ts, event_id) order folded to path strings, top-20 by user "
        "count. One user-keyed aggregate with in-row array_sort (no "
        "window, no second ordering shuffle), then a path-keyed count + "
        "TakeOrdered top-k; the path table is |users|-bounded"
    ),
)
def z33(spark, sf_dir):
    from ..operators.funnel import event_paths

    return event_paths(load(spark, "events", sf_dir))


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
    "z35_keyword_search",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS w FROM documents),
hits AS (
  SELECT doc_id, w FROM tok WHERE w IN ('merge', 'window')),
g AS (
  SELECT doc_id, count(DISTINCT w) AS nterms, count(*) AS total_tf
  FROM hits GROUP BY doc_id)
SELECT doc_id, total_tf FROM g WHERE nterms = 2
ORDER BY total_tf DESC, doc_id LIMIT 20
""",
    description=(
        "conjunctive keyword retrieval ('merge' AND 'window') ranked by "
        "exact integer total term frequency (no idf log -- libm last-ulp "
        "differences would break cross-engine ranking), id tie-break. "
        "Query terms are filtered inside the scan projection before the "
        "explode, so non-matching tokens never leave the row; one "
        "doc-keyed aggregate + TakeOrdered top-k"
    ),
)
def z35(spark, sf_dir):
    return text.keyword_search(
        load(spark, "documents", sf_dir), terms=["merge", "window"]
    )


from ..operators.text import bm25_oracle_sql as _bm25_sql  # noqa: E402

@query(
    "z36_bm25_rank",
    oracle=_bm25_sql(["merge", "window", "partition"], _TOKENS_SQL),
    description=(
        "BM25-style disjunctive ranked retrieval, deterministic "
        "cross-engine: Robertson odds idf WITHOUT the log (libm "
        "transcendentals differ in the last ulp across engines; every "
        "remaining op is IEEE-correctly-rounded so the identical "
        "expression tree hashes bit-for-bit). Per-term tf computed "
        "row-locally in the scan projection (no explode), corpus stats "
        "one broadcast scalar row, TakeOrdered top-k. At rest the same "
        "ranking runs bucket-pruned off write_posting_index (equivalence "
        "pinned in tests/test_operators_misc.py)"
    ),
)
def z36(spark, sf_dir):
    return text.bm25_rank(
        load(spark, "documents", sf_dir),
        terms=["merge", "window", "partition"],
    )


@query(
    "z37_capped_neardup",
    oracle=f"""
{_signlsh_neardup_oracle(threshold=0.45, bands=12, bits_per_band=6, dim=64,
                         max_bucket=5)}
""",
    description=(
        "sign-LSH near-dup with the oversize-bucket cap engaged "
        "(max_bucket=5): every (band, key) bucket is deterministically "
        "rank-subdivided so per-bucket join cost is bounded by "
        "max_bucket^2 regardless of duplicate skew -- the backstop when "
        "bits_per_band is fixed by a shared signature layout. Exact "
        "verify unchanged (no false positives; capped output is a "
        "subset of q39's). Oracle replicates the rank rule bit-for-bit"
    ),
)
def z37(spark, sf_dir):
    return similarity.cosine_neardup_pairs(
        load(spark, "embeddings", sf_dir),
        threshold=0.45,
        bands=12,
        bits_per_band=6,
        dim=64,
        max_bucket=5,
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


from ..operators import sketch as _sketch  # noqa: E402


@query(
    "z39_kmv_distinct",
    oracle=_sketch.kmv_oracle_sql("text", k=256, group_by="source"),
    description=(
        "deterministic KMV distinct sketch (Bar-Yossef et al.): per-source "
        "approximate distinct documents from the 256 smallest md5-derived "
        "48-bit hashes -- an APPROXIMATE answer that is still a pure "
        "function of the data, so the oracle hash gate applies to it "
        "(unlike approx_count_distinct, q51). Sketch is k x 8 bytes per "
        "group and MERGEABLE (k-min of unioned k-min sets == k-min of the "
        "union; pinned in tests), the property that lets 100 TB partial "
        "scans compose without a rescan"
    ),
)
def z39(spark, sf_dir):
    return _sketch.kmv_distinct(
        load(spark, "documents", sf_dir), "text", k=256, group_by="source"
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
    "z41_mad_outliers",
    oracle="""
WITH med AS (
  SELECT user_id, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY user_id),
dev AS (
  SELECT e.user_id, e.event_id, e.ts, e.value, m.med,
         abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (user_id)),
mad AS (
  SELECT user_id, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY user_id)
SELECT d.user_id, d.event_id, d.ts, d.value,
       round(d.med, 6) AS group_median,
       round(d.adev / m.mad, 6) AS robust_z
FROM dev d JOIN mad m USING (user_id)
WHERE m.mad > 0 AND d.adev / m.mad > 3.5
""",
    description=(
        "robust per-user outlier detection: |x - median| / MAD > 3.5 "
        "(50% breakdown point -- a burst of bad readings cannot drag the "
        "baseline the way it drags mean/stddev, unlike q46's z-score). "
        "Two exact-percentile group aggregates joined back; stat sides "
        "are user-bounded (broadcast at scale); ratio division-only, "
        "engine-exact"
    ),
)
def z41(spark, sf_dir):
    from ..operators.timeseries import mad_outliers

    return mad_outliers(load(spark, "events", sf_dir))


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
    "z44_winsorize",
    oracle="""
WITH p AS (
  SELECT o_orderstatus,
         quantile_cont(o_totalprice, 0.05) AS plo,
         quantile_cont(o_totalprice, 0.95) AS phi
  FROM orders GROUP BY o_orderstatus)
SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
       least(greatest(o.o_totalprice, p.plo), p.phi) AS o_totalprice_winsorized
FROM orders o JOIN p USING (o_orderstatus)
""",
    description=(
        "per-group winsorization: clamp to the exact [p5, p95] "
        "percentiles -- the standard outlier-clipping pass before "
        "normalizing features/quality scores for training. One "
        "group-bounded percentile aggregate broadcast back + a row-local "
        "least/greatest clamp; clamped rows carry exact input doubles"
    ),
)
def z44(spark, sf_dir):
    from ..operators.train_prep import winsorize

    return winsorize(
        load(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ),
        "o_totalprice",
        lo=0.05,
        hi=0.95,
        group_by="o_orderstatus",
    )


@query(
    "z45_event_cooccurrence",
    oracle="""
WITH de AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type
  FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS support
FROM de a JOIN de b
  ON a.user_id = b.user_id AND a.day = b.day
 AND a.event_type < b.event_type
GROUP BY 1, 2
HAVING count(*) >= 5
ORDER BY support DESC, type_a, type_b
""",
    description=(
        "market-basket co-occurrence (frequent-itemset k=2): support "
        "counts for event-type pairs sharing a (user, day) basket. The "
        "event stream reduces FIRST to distinct basket membership "
        "(user-bounded, z31/z32 argument); the self-join's quadratic term "
        "is |types-per-basket|^2 -- bounded by the type vocabulary, never "
        "event volume"
    ),
)
def z45(spark, sf_dir):
    from ..operators.funnel import cooccurrence_pairs

    return cooccurrence_pairs(load(spark, "events", sf_dir), min_support=5)


@query(
    "z46_association_rules",
    oracle="""
WITH de AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type
  FROM events),
pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS support
  FROM de a JOIN de b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2 HAVING count(*) >= 5),
singles AS (SELECT event_type AS t, count(*) AS n FROM de GROUP BY 1),
totals AS (SELECT count(*) AS n_baskets
           FROM (SELECT DISTINCT user_id, day FROM de))
SELECT p.type_a, p.type_b, p.support,
       round(p.support / sa.n, 6) AS conf_a_to_b,
       round(p.support / sb.n, 6) AS conf_b_to_a,
       round((p.support * t.n_baskets) / (sa.n * sb.n), 6) AS lift
FROM pair p
JOIN singles sa ON sa.t = p.type_a
JOIN singles sb ON sb.t = p.type_b
CROSS JOIN totals t
ORDER BY support DESC, type_a, type_b
""",
    description=(
        "association-rule metrics over the k=2 co-occurrence pass: "
        "support, directional confidence, and lift from exact basket "
        "counts (single IEEE divisions, rounded once). Per-type and "
        "total-basket sides are vocabulary-/1-row-sized broadcasts; "
        "nothing past the first distinct scales with event volume"
    ),
)
def z46(spark, sf_dir):
    from ..operators.funnel import association_metrics

    return association_metrics(load(spark, "events", sf_dir), min_support=5)


@query(
    "z47_rolling_active_users",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d FROM events),
observed AS (SELECT DISTINCT d AS day FROM ud),
fanned AS (
  SELECT user_id,
         unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE
           AS day
  FROM ud)
SELECT f.day, count(DISTINCT f.user_id) AS active_users
FROM fanned f JOIN observed o ON f.day = o.day
GROUP BY f.day ORDER BY f.day
""",
    description=(
        "trailing 7-day distinct active users per day (WAU; the DAU/MAU "
        "family): distinct (user, day) once, then a map-side sequence "
        "fan-out of each activity day to the report days it feeds -- no "
        "range join, no per-day rescan -- one count-distinct per day, "
        "observed-days semi-join trims the trailing horizon"
    ),
)
def z47(spark, sf_dir):
    from ..operators.funnel import rolling_active_users

    return rolling_active_users(load(spark, "events", sf_dir), window_days=7)


@query(
    "z48_doc_keywords",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
n AS (SELECT count(*) AS n_docs FROM documents),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
  HAVING count(DISTINCT doc_id) >= 2),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ((n.n_docs - d.df + 0.5) / (d.df + 0.5)), 6) AS score
  FROM tf JOIN dfreq d USING (term) CROSS JOIN n),
r AS (
  SELECT *, (row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term))::INT AS rank
  FROM scored)
SELECT doc_id, rank, term, tf, score FROM r WHERE rank <= 3
""",
    description=(
        "document keyword extraction: top-3 distinctive terms per doc by "
        "tf x odds-idf (log-free Robertson odds, bit-stable ranking; "
        "stopwords self-suppress via df ~ N, min_df=2 prunes hapax "
        "noise). Explode -> tf aggregate, vocabulary-bounded df join, "
        "row-local score, per-doc rank -- all shuffles linear in tokens "
        "or vocabulary"
    ),
)
def z48(spark, sf_dir):
    return text.top_terms_per_doc(load(spark, "documents", sf_dir))


@query(
    "z49_attribution",
    oracle="""
WITH w AS (
  SELECT event_type,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id, date_trunc('day', ts)
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS first_t,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id, date_trunc('day', ts)
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_t
  FROM events)
SELECT coalesce(first_t, 'direct') AS first_touch,
       coalesce(last_t, 'direct') AS last_touch,
       count(*) AS conversions
FROM w WHERE event_type = 'purchase'
GROUP BY 1, 2 ORDER BY conversions DESC, first_touch, last_touch
""",
    description=(
        "first-/last-touch conversion attribution per (user, day) "
        "journey: one IGNORE-NULLS window pass over a rows-preceding "
        "frame with an (ts, event_id) tie-break -- deterministic under "
        "timestamp collisions -- then one channel-pair aggregate; "
        "no-prior-touch conversions attribute to 'direct'. Window state "
        "bounded by journey length"
    ),
)
def z49(spark, sf_dir):
    from ..operators.funnel import conversion_attribution

    return conversion_attribution(load(spark, "events", sf_dir))


@query(
    "z50_corpus_pipeline_v2",
    oracle=f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(
                     translate(lower(text), '{text.ACCENT_SRC}', '{text.ACCENT_DST}'),
                     '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h
        FROM documents)
  GROUP BY h),
d AS (
  SELECT doc_id, source, text FROM documents JOIN keep USING (doc_id)),
q AS (
  SELECT doc_id, source, text,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_TOKENS_SQL}) END)::INT AS n_tokens,
         {text.QUALITY_MICROS_SQL.format(t="text")} / 1000000.0
           AS quality_score
  FROM d),
p AS (
  SELECT source, quantile_cont(quality_score, 0.05) AS plo,
         quantile_cont(quality_score, 0.95) AS phi
  FROM q GROUP BY source),
wq AS (
  SELECT q.*, least(greatest(q.quality_score, p.plo), p.phi) AS q_wins
  FROM q JOIN p USING (source)),
s AS (
  SELECT *, CASE WHEN {_POLY_SQL.format(x="md5(text)")} % 100 < 80 THEN 'train'
                 WHEN {_POLY_SQL.format(x="md5(text)")} % 100 < 90 THEN 'valid'
                 ELSE 'test' END AS split
  FROM wq),
stats AS (
  SELECT split, source, count(*) AS n_docs, sum(n_tokens) AS total_tokens,
         min(q_wins) AS q_min, max(q_wins) AS q_max
  FROM s GROUP BY 1, 2),
hv AS (
  SELECT DISTINCT split || '/' || source AS grp,
         ('0x' || substr(md5(text), 1, 12))::BIGINT AS hv
  FROM s),
r AS (SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
      FROM hv),
km AS (SELECT grp, count(*) AS n_kept, max(hv) AS hk
       FROM r WHERE rn <= 256 GROUP BY grp),
est AS (
  SELECT grp, CASE WHEN n_kept < 256 THEN n_kept
              ELSE CAST(round(255.0 * 281474976710656.0 / hk) AS BIGINT)
         END AS est_distinct_texts
  FROM km)
SELECT st.split, st.source, st.n_docs, st.total_tokens, st.q_min, st.q_max,
       e.est_distinct_texts
FROM stats st JOIN est e ON e.grp = st.split || '/' || st.source
""",
    description=(
        "corpus build v2, chaining the round-4 operators end-to-end: "
        "canonical-form dedup survivor -> quality scoring -> per-source "
        "winsorized quality (exact [p5, p95] clamp) -> leak-safe content "
        "hash split -> per-(split, source) stats including min/max "
        "winsorized quality (verbatim doubles, no re-rounding -- the q49 "
        "lesson) and a mergeable KMV distinct-text estimate. Every stage "
        "is the verified operator itself"
    ),
)
def z50(spark, sf_dir):
    from ..operators.sketch import kmv_distinct
    from ..operators.train_prep import hash_split, winsorize

    docs = load(spark, "documents", sf_dir)
    keep = text.canonical_dedup_groups(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "source", "text"
    )
    enriched = text.with_quality(deduped, keep_cols=["source", "text"])
    wins = winsorize(
        enriched, "quality_score", lo=0.05, hi=0.95, group_by="source",
        out_col="q_wins",
    )
    s = hash_split(wins)
    stats = s.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("q_wins").alias("q_min"),
        F.max("q_wins").alias("q_max"),
    )
    grp = s.withColumn("grp", F.concat_ws("/", "split", "source"))
    est = kmv_distinct(grp, "text", k=256, group_by="grp").select(
        F.col("grp"), F.col("est_distinct").alias("est_distinct_texts")
    )
    return stats.join(
        est,
        F.concat_ws("/", "split", "source") == F.col("grp"),
    ).drop("grp")


@query(
    "z51_scd2_intervals",
    oracle="""
WITH v AS (
  SELECT user_id, event_type, event_id, value, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) AS valid_to
  FROM events)
SELECT user_id, event_type, event_id, value, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM v
""",
    description=(
        "SCD-Type-2 intervalization: upgrade a version history (the "
        "reference's active-flag model, sql:72-91, answers point-in-time "
        "questions only by scanning versions) into [valid_from, valid_to) "
        "rows via one lead() window per entity with an event_id tie-break "
        "-- as-of reads become a pushdown-able range predicate"
    ),
)
def z51(spark, sf_dir):
    from ..operators.merge import with_validity_intervals

    return with_validity_intervals(
        load(spark, "events", sf_dir).select(
            "user_id", "event_type", "event_id", "value", "ts"
        ),
        keys=["user_id", "event_type"],
        ts_col="ts",
        tiebreak_col="event_id",
    ).drop("ts")


@query(
    "z52_vocab_drift",
    oracle=f"""
WITH tok AS (
  SELECT source AS s, unnest({_TOKENS_SQL}) AS term
  FROM documents WHERE source IN ('src0', 'src1')),
c AS (
  SELECT term,
         sum((s = 'src0')::BIGINT) AS n_a,
         sum((s = 'src1')::BIGINT) AS n_b
  FROM tok GROUP BY term HAVING sum((s = 'src0')::BIGINT)
                              + sum((s = 'src1')::BIGINT) >= 5),
t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM c),
x AS (
  SELECT term, n_a, n_b,
         (n_a + n_b) * ta / (ta + tb) AS ea,
         (n_a + n_b) * tb / (ta + tb) AS eb
  FROM c CROSS JOIN t)
SELECT term, n_a, n_b,
       round((n_a - ea) * (n_a - ea) / ea
             + (n_b - eb) * (n_b - eb) / eb, 6) AS chi2
FROM x ORDER BY chi2 DESC, term LIMIT 20
""",
    description=(
        "vocabulary drift between two corpus slices: per-term chi-square "
        "contributions vs the homogeneity expectation, top-20 drivers -- "
        "the distribution-shift monitor between crawls/sources. "
        "Chi-square, not KL: division-only (KL's log is libm, breaking "
        "cross-engine bit parity). One explode -> conditional-sum pivot, "
        "1-row totals broadcast, row-local arithmetic, TakeOrdered"
    ),
)
def z52(spark, sf_dir):
    return text.vocabulary_drift(
        load(spark, "documents", sf_dir), "src0", "src1"
    )


@query(
    "z53_quantized_ann",
    oracle=f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS ev FROM embeddings),
dims AS (SELECT i FROM generate_series(1, 64) t(i)),
stats AS (
  SELECT i, min(ev[i]) AS mn, max(ev[i]) AS mx
  FROM e CROSS JOIN dims GROUP BY i),
params AS (
  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM stats),
recon AS (
  SELECT vec_id,
         [CASE WHEN mxs[i] = mns[i] THEN mns[i]
               ELSE mns[i] + round((ev[i] - mns[i]) * 255.0 / (mxs[i] - mns[i]))
                    * (mxs[i] - mns[i]) / 255.0 END
          for i in generate_series(1, 64)] AS v
  FROM e CROSS JOIN params),
q AS (SELECT vec_id AS query_id, ev AS qv FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT query_id, r.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
  FROM q CROSS JOIN recon r WHERE r.vec_id != query_id),
rk AS (SELECT *, (row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id))::INT
                   AS rnk
       FROM scored)
SELECT query_id, neighbor_id, cos_sim, rnk AS rank FROM rk WHERE rnk <= 10
""",
    description=(
        "ANN over an int8-SCALAR-QUANTIZED corpus: per-dim [min, max] "
        "codebook (dim-bounded aggregate -> literals, like IVF "
        "centroids), 255-level linear codes reconstructed row-locally "
        "(1 byte/dim at rest -- 4x smaller than float32, the 100 TB "
        "embedding-store play), raw queries scored against the "
        "reconstruction with the q38 broadcast/two-phase-top-k contract. "
        "Recall loss IS the quantization error, not a search "
        "approximation"
    ),
)
def z53(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    return similarity.quantized_topk(
        emb, emb.filter(F.col("vec_id") % 100 == 0), k=10
    )


@query(
    "z54_containment_pairs",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh
  FROM (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {_ratio_sql("len(list_intersect(a.sh, b.sh))", "len(a.sh)")}
         AS containment
FROM d a JOIN d b ON a.doc_id != b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * 1000000 >= len(a.sh) * 800000
""",
    description=(
        "EXACT directed shingle containment (|A∩B|/|A| >= 0.8): the "
        "asymmetric near-dup detector catching short docs embedded in "
        "longer ones, which symmetric Jaccard scores low (union dominated "
        "by B). Asymmetric prefix filter: probe side indexes its rarest "
        "prefix, indexed side carries all shingles (containment bounds "
        "only A's share); |B| >= t|A| size filter; exact verify on "
        "candidates -- no all-pairs"
    ),
)
def z54(spark, sf_dir):
    return dedup.containment_pairs(
        load(spark, "documents", sf_dir), threshold=0.8, unpersist_after=False
    )


@query(
    "z55_time_weighted_avg",
    oracle="""
WITH w AS (
  SELECT user_id, value,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt
  FROM events),
a AS (
  SELECT user_id,
         sum(CAST(value * dt AS DECIMAL(25,6))) AS wsum,
         sum(dt) AS tsum, count(*) AS n_obs, min(value) AS fv
  FROM w GROUP BY user_id)
SELECT user_id, n_obs,
       CASE WHEN tsum IS NULL OR tsum = 0 THEN round(fv, 6)
            ELSE round(wsum::DOUBLE / tsum, 6) END AS twa
FROM a
""",
    description=(
        "time-weighted average per user over irregular samples (LOCF "
        "interval weighting): the correct mean for gauges/balances where "
        "plain avg() over-weights bursty periods. Exact integer "
        "microsecond intervals, DECIMAL-lifted weighted sum (associative "
        "-- the q01/q49 determinism rule), one final division; "
        "single-observation groups return their value"
    ),
)
def z55(spark, sf_dir):
    from ..operators.timeseries import time_weighted_avg

    return time_weighted_avg(load(spark, "events", sf_dir))


@query(
    "z56_trend_slope",
    oracle="""
WITH m AS (
  SELECT user_id, count(*) AS n,
         sum(CAST((epoch_us(ts) - 1704067200000000) / 86400000000.0 AS DECIMAL(25,6))) AS sx,
         sum(CAST(value AS DECIMAL(25,6))) AS sy,
         sum(CAST(((epoch_us(ts) - 1704067200000000) / 86400000000.0) * value
                  AS DECIMAL(38,12))) AS sxy,
         sum(CAST(((epoch_us(ts) - 1704067200000000) / 86400000000.0)
                  * ((epoch_us(ts) - 1704067200000000) / 86400000000.0)
                  AS DECIMAL(38,12))) AS sxx,
         count(DISTINCT ts) AS nts
  FROM events GROUP BY user_id)
SELECT user_id, n,
       CASE WHEN nts >= 2 THEN
         round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
               / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
       END AS slope_per_day,
       CASE WHEN nts >= 2 THEN
         round((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
               / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
               * sx::DOUBLE) / n::DOUBLE, 6)
       END AS intercept_at_origin
FROM m
""",
    description=(
        "per-user OLS trend (slope units/day + intercept) from exact "
        "DECIMAL moments over exact microsecond-derived day fractions -- "
        "associative sums, one final IEEE division (q93's exact-moment "
        "determinism rule). The drift detector for per-entity metrics; "
        "one map-side-combinable aggregate, no window, no collect"
    ),
)
def z56(spark, sf_dir):
    from ..operators.timeseries import trend_slope

    return trend_slope(load(spark, "events", sf_dir))


@query(
    "z57_time_to_convert",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t1
  FROM events GROUP BY user_id),
lat AS (
  SELECT (t1 - t0) / 1000000.0 AS s
  FROM per_user WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0)
SELECT count(*) AS n_converted,
       round(quantile_cont(s, 0.25), 4) AS p25_seconds,
       round(quantile_cont(s, 0.5), 4) AS p50_seconds,
       round(quantile_cont(s, 0.9), 4) AS p90_seconds
FROM lat
""",
    description=(
        "conversion-latency distribution: per user, seconds from first "
        "'view' to first strictly-later 'purchase', summarized with "
        "exact p25/p50/p90 (q53 percentile parity). One conditional-min "
        "aggregate per user -- the two funnel legs never join; "
        "user-bounded intermediates"
    ),
)
def z57(spark, sf_dir):
    from ..operators.funnel import time_to_convert

    return time_to_convert(load(spark, "events", sf_dir))


@query(
    "z58_dedup_method_report",
    oracle=f"""
WITH exact_d AS (
  SELECT count(*) AS n FROM (
    SELECT md5(text) FROM documents GROUP BY md5(text) HAVING count(*) > 1)),
canon_d AS (
  SELECT count(*) AS n FROM (
    SELECT 1 FROM (
      SELECT md5(trim(regexp_replace(regexp_replace(
               translate(lower(text), '{text.ACCENT_SRC}', '{text.ACCENT_DST}'),
               '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h
      FROM documents) GROUP BY h HAVING count(*) > 1)),
sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh
  FROM (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents)),
jac_d AS (
  SELECT count(*) AS n FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE {_jacc_pred_sql("a.sh", "b.sh", 0.8)}),
cont_d AS (
  SELECT count(*) AS n FROM sh a JOIN sh b ON a.doc_id != b.doc_id
  WHERE len(list_intersect(a.sh, b.sh)) * 1000000 >= len(a.sh) * 800000)
SELECT 'exact_groups' AS method, n AS n_found FROM exact_d
UNION ALL SELECT 'canonical_groups', n FROM canon_d
UNION ALL SELECT 'jaccard_pairs_t80', n FROM jac_d
UNION ALL SELECT 'containment_pairs_t80', n FROM cont_d
""",
    description=(
        "dedup-method comparison report: how many duplicate groups/pairs "
        "each detector family finds on the same corpus (byte-exact, "
        "canonical-form, symmetric Jaccard t=0.8, directed containment "
        "t=0.8) -- the method-selection diagnostic a pipeline runs before "
        "committing to a dedup budget. Each leg is the verified operator "
        "itself; counts union into one scorecard"
    ),
)
def z58(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)

    def one(name, df_count):
        return df_count.select(
            F.lit(name).alias("method"), F.col("n").alias("n_found")
        )

    exact_g = one(
        "exact_groups",
        dedup.exact_duplicates(docs)
        .filter(F.col("n_copies") > 1)
        .agg(F.count("*").alias("n")),
    )
    canon_g = one(
        "canonical_groups",
        text.canonical_dedup_groups(docs)
        .filter(F.col("n_copies") > 1)
        .agg(F.count("*").alias("n")),
    )
    jac = one(
        "jaccard_pairs_t80",
        dedup.ngram_jaccard_pairs(
            docs, threshold=0.8, unpersist_after=False
        ).agg(F.count("*").alias("n")),
    )
    cont = one(
        "containment_pairs_t80",
        dedup.containment_pairs(
            docs, threshold=0.8, unpersist_after=False
        ).agg(F.count("*").alias("n")),
    )
    return exact_g.unionByName(canon_g).unionByName(jac).unionByName(cont)


@query(
    "z59_ks_drift",
    oracle=f"""
WITH pair AS (
  SELECT source, text FROM documents WHERE source IN ('src0', 'src1')),
q AS (
  SELECT source,
         {text.QUALITY_MICROS_SQL.format(t="text")} / 1000000.0
           AS quality_score
  FROM pair),
c AS (
  SELECT quality_score,
         sum((source = 'src0')::BIGINT) AS ca,
         sum((source = 'src1')::BIGINT) AS cb
  FROM q GROUP BY quality_score),
tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM c),
cdf AS (
  SELECT sum(ca) OVER (ORDER BY quality_score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_a,
         sum(cb) OVER (ORDER BY quality_score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_b
  FROM c)
SELECT na AS n_a, nb AS n_b,
       {_ratio_sql("max(abs(cum_a * nb - cum_b * na))", "na * nb")} AS ks_d
FROM cdf CROSS JOIN tot GROUP BY na, nb
""",
    description=(
        "two-sample Kolmogorov-Smirnov distance between two sources' "
        "quality-score distributions: the numeric-drift monitor "
        "complementing z52's vocabulary chi-square. Counts + single "
        "divisions only; the ordered cumulative window runs over "
        "|distinct 6-dp score values|, never corpus rows"
    ),
)
def z59(spark, sf_dir):
    return text.score_distribution_drift(
        load(spark, "documents", sf_dir), "src0", "src1"
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
    "z61_interval_union",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts + INTERVAL 5 MINUTE) AS e
  FROM events),
m AS (
  SELECT user_id, event_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pme
  FROM iv),
isl AS (
  SELECT user_id, s, e,
         sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM m),
spans AS (
  SELECT user_id, island, min(s) AS i_s, max(e) AS i_e
  FROM isl GROUP BY 1, 2)
SELECT user_id, count(*) AS n_intervals,
       sum(i_e - i_s) AS covered_micros
FROM spans GROUP BY user_id
""",
    description=(
        "overlapping-interval coalescing (islands-and-gaps): each event "
        "extended to a 5-minute activity interval, per-user merged "
        "span count + total COVERED microseconds -- interval union, the "
        "fix for double-counted durations in uptime/billing/coverage "
        "sums. One cumulative-max window + running-sum island ids over "
        "exact integer micros; O(n log n), never the O(n^2) overlap join"
    ),
)
def z61(spark, sf_dir):
    from ..operators.timeseries import merge_intervals

    ev = load(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
    )
    return merge_intervals(
        ev, "start_ts", "end_ts", tiebreak_col="event_id"
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
    "z64_soft_dedup_weights",
    oracle="""
WITH g AS (
  SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
  FROM documents GROUP BY md5(text))
SELECT keep_id, n AS n_copies,
       round(sqrt(n::DOUBLE), 6) AS sample_weight
FROM g
""",
    description=(
        "soft dedup: instead of hard-dropping duplicates, each exact-dup "
        "cluster's survivor carries weight sqrt(n) -- the sub-linear "
        "duplicate weighting that keeps popular content influential "
        "without letting it dominate training. sqrt is IEEE-correctly-"
        "rounded (NOT a libm transcendental), so the weights are "
        "engine-exact; one hash-groupBy, same plan as exact dedup"
    ),
)
def z64(spark, sf_dir):
    g = dedup.exact_duplicates(load(spark, "documents", sf_dir))
    return g.select(
        "keep_id",
        F.col("n_copies"),
        F.round(F.sqrt(F.col("n_copies").cast("double")), 6).alias(
            "sample_weight"
        ),
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
    "z66_phrase_search",
    oracle=f"""
WITH d AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents),
p AS (
  SELECT doc_id,
         len(list_intersect(
           [p + 1 for p in
             [i for i in generate_series(1, len(w)) if w[i] = 'window']],
           [i for i in generate_series(1, len(w)) if w[i] = 'join']))
           AS n_matches
  FROM d)
SELECT doc_id, n_matches FROM p WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id LIMIT 20
""",
    description=(
        "exact phrase retrieval ('window join' contiguously): per-term "
        "position lists are row-local index-filter transforms inside the "
        "scan projection, phrase matching is a positions(t_i)+1 ∩ "
        "positions(t_{{i+1}}) fold whose survivors ARE the match "
        "positions -- the positional upgrade AND-of-terms retrieval "
        "cannot express. No explode, no shuffle before the top-k"
    ),
)
def z66(spark, sf_dir):
    return text.phrase_search(
        load(spark, "documents", sf_dir), phrase=["window", "join"]
    )


_Z67_SQL = """
SELECT n.n_name AS nation,
       count(DISTINCT c.c_custkey) AS n_customers,
       round(sum(CAST(o.o_totalprice AS DECIMAL(25,6))), 2) AS total_revenue
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus <> 'F'
GROUP BY n.n_name
HAVING count(*) >= 5
ORDER BY total_revenue DESC, nation
"""


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
    "z68_decayed_score",
    oracle="""
WITH w AS (
  SELECT user_id, value,
         greatest(date_diff('day', ts::DATE, DATE '2024-01-31'), 0) // 7
           AS age_weeks
  FROM events),
s AS (
  SELECT user_id, value,
         CASE age_weeks WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
                        WHEN 2 THEN 0.25 WHEN 3 THEN 0.125
                        WHEN 4 THEN 0.0625 ELSE 0.0 END AS decay
  FROM w)
SELECT user_id,
       round(sum(CAST(value * decay AS DECIMAL(25,6))), 4)::DOUBLE
         AS decayed_score,
       count(*) AS n_events
FROM s GROUP BY user_id
""",
    description=(
        "half-life-decayed engagement score per user (1-week half-life "
        "against a fixed as-of date): recency weighting WITHOUT libm -- "
        "exp-decay's exp() differs in the last ulp across engines, but "
        "dyadic weights 2^-k for integer week ages are EXACT doubles in "
        "a literal CASE. Weighted sum decimal-lifted (associative), one "
        "final round; one group aggregate, map-side combinable"
    ),
)
def z68(spark, sf_dir):
    # clamp negative ages (post-as-of events) to 0 BEFORE the division:
    # negative integer division is truncate-toward-zero in Spark but
    # engine/version-dependent elsewhere -- clamping keeps both sides in
    # the nonnegative range where floor == truncate everywhere
    age_weeks = F.floor(
        F.greatest(
            F.datediff(
                F.lit("2024-01-31").cast("date"), F.col("ts").cast("date")
            ),
            F.lit(0),
        )
        / 7
    ).cast("int")
    decay = F.when(age_weeks == 0, F.lit(1.0))
    for k in range(1, 5):
        decay = decay.when(age_weeks == k, F.lit(2.0 ** -k))
    decay = decay.otherwise(F.lit(0.0))
    return (
        load(spark, "events", sf_dir)
        .select("user_id", "value", decay.alias("_d"))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum((F.col("value") * F.col("_d")).cast("decimal(25,6)")), 4
            )
            .cast("double")
            .alias("decayed_score"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "z69_session_funnel",
    oracle="""
WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type
           FROM events),
g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, (sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
  FROM g),
ps AS (
  SELECT user_id, session_idx,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t0,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t1
  FROM s GROUP BY 1, 2)
SELECT user_id, count(*) AS n_sessions,
       sum((t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0)::BIGINT)
         AS n_converted,
       round(sum((t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0)::BIGINT)
             / count(*), 6) AS conversion_rate
FROM ps GROUP BY user_id
""",
    description=(
        "WITHIN-session conversion funnel (view -> strictly-later "
        "purchase in the SAME gap-based session): day-/lifetime-scoped "
        "funnels over-credit conversions spanning visits. Event-level "
        "session assignment (one window) + conditional mins per session "
        "in ONE aggregate (legs never join) + per-user rollup; "
        "user-bounded intermediates"
    ),
)
def z69(spark, sf_dir):
    from ..operators.sessionize import session_funnel

    return session_funnel(load(spark, "events", sf_dir))


@query(
    "z70_intersession_gaps",
    oracle="""
WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id FROM events),
g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, (sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
  FROM g),
spans AS (
  SELECT user_id, session_idx,
         min(epoch_us(ts)) AS s0, max(epoch_us(ts)) AS s1
  FROM s GROUP BY 1, 2),
gaps AS (
  SELECT user_id,
         (s0 - lag(s1) OVER (PARTITION BY user_id ORDER BY session_idx))
           / 3600000000.0 AS gap_hours
  FROM spans)
SELECT count(*) AS n_gaps,
       round(quantile_cont(gap_hours, 0.5), 4) AS p50_hours,
       round(quantile_cont(gap_hours, 0.9), 4) AS p90_hours
FROM gaps WHERE gap_hours IS NOT NULL
""",
    description=(
        "return-visit cadence: distribution of gaps between consecutive "
        "sessions per user (session spans from the q25 gap-based "
        "sessionization, inter-span lag, exact p50/p90 over "
        "microsecond-derived hours). The engagement-cadence metric next "
        "to z32's cohort retention; user-bounded intermediates"
    ),
)
def z70(spark, sf_dir):
    from pyspark.sql import Window as W

    from ..operators.sessionize import assign_sessions

    spans = (
        assign_sessions(load(spark, "events", sf_dir))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min(F.unix_micros("ts")).alias("_s0"),
            F.max(F.unix_micros("ts")).alias("_s1"),
        )
    )
    w = W.partitionBy("user_id").orderBy("session_idx")
    gaps = spans.select(
        (
            (F.col("_s0") - F.lag("_s1").over(w)) / F.lit(3_600_000_000.0)
        ).alias("gap_hours")
    ).filter(F.col("gap_hours").isNotNull())
    return gaps.agg(
        F.count("*").alias("n_gaps"),
        F.round(F.percentile("gap_hours", F.lit(0.5)), 4).alias("p50_hours"),
        F.round(F.percentile("gap_hours", F.lit(0.9)), 4).alias("p90_hours"),
    )


@query(
    "z71_freshness_sla",
    oracle="""
WITH f AS (
  SELECT event_type, max(epoch_us(ts)) AS last_us, count(*) AS n_events
  FROM events GROUP BY event_type),
g AS (SELECT max(last_us) AS now_us FROM f)
SELECT event_type, n_events,
       round((now_us - last_us) / 3600000000.0, 4) AS hours_behind,
       (now_us - last_us) <= 24 * 3600000000 AS within_sla
FROM f CROSS JOIN g
""",
    description=(
        "per-stream freshness SLA report: hours since each event type's "
        "latest arrival, measured against the newest timestamp in the "
        "table (clock-free -- a wall-clock 'now' would make the check "
        "nondeterministic AND flaky in backfills), with a 24h SLA flag. "
        "One group aggregate + a 1-row global max broadcast; the "
        "staleness monitor an ingest pipeline alerts on"
    ),
)
def z71(spark, sf_dir):
    f = (
        load(spark, "events", sf_dir)
        .groupBy("event_type")
        .agg(
            F.max(F.unix_micros("ts")).alias("_last"),
            F.count("*").alias("n_events"),
        )
    )
    g = f.agg(F.max("_last").alias("_now"))
    return (
        f.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n_events",
            F.round(
                (F.col("_now") - F.col("_last")) / F.lit(3_600_000_000.0), 4
            ).alias("hours_behind"),
            (
                (F.col("_now") - F.col("_last"))
                <= F.lit(24 * 3_600_000_000)
            ).alias("within_sla"),
        )
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
    "z73_user_growth",
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(date_trunc('week', ts)) AS w FROM events GROUP BY 1),
per_week AS (
  SELECT w, count(*) AS new_users FROM first_seen GROUP BY w)
SELECT w AS week, new_users,
       (sum(new_users) OVER (ORDER BY w
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       )::BIGINT AS cumulative_users
FROM per_week
""",
    description=(
        "cumulative acquisition curve: first-seen week per user -> new "
        "users per week -> running total. Exact cumulative DISTINCT "
        "users without running-distinct state: first-seen reduction "
        "makes the cumsum additive; the ordered window runs over "
        "|weeks| rows, never users or events"
    ),
)
def z73(spark, sf_dir):
    from pyspark.sql import Window as W

    first_seen = (
        load(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", F.col("ts")).cast("date")).alias("w"))
    )
    per_week = first_seen.groupBy("w").agg(F.count("*").alias("new_users"))
    win = W.orderBy("w").rowsBetween(W.unboundedPreceding, 0)
    return per_week.select(
        F.col("w").alias("week"),
        "new_users",
        F.sum("new_users").over(win).cast("long").alias("cumulative_users"),
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
    "z75_quantization_recall",
    oracle=f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS ev FROM embeddings),
dims AS (SELECT i FROM generate_series(1, 64) t(i)),
stats AS (
  SELECT i, min(ev[i]) AS mn, max(ev[i]) AS mx
  FROM e CROSS JOIN dims GROUP BY i),
params AS (
  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM stats),
recon AS (
  SELECT vec_id,
         [CASE WHEN mxs[i] = mns[i] THEN mns[i]
               ELSE mns[i] + round((ev[i] - mns[i]) * 255.0 / (mxs[i] - mns[i]))
                    * (mxs[i] - mns[i]) / 255.0 END
          for i in generate_series(1, 64)] AS v
  FROM e CROSS JOIN params),
q AS (SELECT vec_id AS query_id, ev AS qv FROM e WHERE vec_id % 100 = 0),
exact_scored AS (
  SELECT query_id, e2.vec_id AS neighbor_id,
         round(list_dot_product(qv, e2.ev)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(e2.ev, e2.ev))), 6) AS cos_sim
  FROM q CROSS JOIN e e2 WHERE e2.vec_id != query_id),
exact_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
    FROM exact_scored) WHERE rnk <= 10),
quant_scored AS (
  SELECT query_id, r.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
  FROM q CROSS JOIN recon r WHERE r.vec_id != query_id),
quant_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rnk
    FROM quant_scored) WHERE rnk <= 10),
ov AS (
  SELECT a.query_id, count(*) AS hits
  FROM exact_k a JOIN quant_k b
    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
  GROUP BY a.query_id)
SELECT e.query_id, round(coalesce(ov.hits, 0) / 10.0, 6) AS recall_at_10
FROM (SELECT DISTINCT query_id FROM exact_k) e
LEFT JOIN ov ON ov.query_id = e.query_id
""",
    description=(
        "self-evaluation under the oracle gate: per-query recall@10 of "
        "the int8-quantized ANN (z53) against exact full-precision "
        "top-k (q38) -- the measure-your-own-index harness as a "
        "first-class verified query, not a side script. Both legs are "
        "the verified operators; overlap join + one division"
    ),
)
def z75(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    exact = similarity.cosine_topk(emb, q, k=10).select(
        "query_id", "neighbor_id"
    )
    quant = similarity.quantized_topk(emb, q, k=10).select(
        "query_id", "neighbor_id"
    )
    ov = exact.join(quant, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count("*").alias("_hits"))
    return (
        exact.select("query_id")
        .distinct()
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("_hits"), F.lit(0)) / F.lit(10.0), 6
            ).alias("recall_at_10"),
        )
    )


@query(
    "z76_lsh_pair_recall",
    oracle=f"""
WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
exact_pairs AS (
  SELECT a.vec_id FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.45),
banded AS ({_signlsh_neardup_oracle(threshold=0.45, bands=12,
                                    bits_per_band=6, dim=64)}),
ne AS (SELECT count(*) AS n_exact FROM exact_pairs),
nb AS (SELECT count(*) AS n_banded FROM banded)
SELECT n_exact, n_banded,
       {_ratio_sql("n_banded", "greatest(n_exact, 1)")} AS pair_recall
FROM ne CROSS JOIN nb
""",
    description=(
        "in-gate LSH quality evaluation: banded sign-LSH near-dup pairs "
        "(q39, no false positives by construction) counted against the "
        "exact all-pairs ground truth, recall = n_banded/n_exact -- the "
        "S-curve recall claim in cosine_neardup_pairs' docstring, "
        "MEASURED under the oracle hash gate. The all-pairs leg is the "
        "test-scale-only baseline (whitelisted cartesian), the banded "
        "leg is the scale path"
    ),
)
def z76(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    exact = similarity.cosine_neardup_pairs(emb, threshold=0.45, bands=None)
    banded = similarity.cosine_neardup_pairs(
        emb, threshold=0.45, bands=12, bits_per_band=6, dim=64
    )
    ne = exact.agg(F.count("*").alias("n_exact"))
    nb = banded.agg(F.count("*").alias("n_banded"))
    return ne.crossJoin(F.broadcast(nb)).select(
        "n_exact",
        "n_banded",
        (
            exactnum.ratio_micros_halfup(
                F.col("n_banded"), F.greatest(F.col("n_exact"), F.lit(1))
            )
            / F.lit(1000000.0)
        ).alias("pair_recall"),
    )


@query(
    "z77_minhash_pair_recall",
    oracle=f"""
WITH exact_pairs AS (
  SELECT 1 FROM (
    WITH d AS (
      SELECT doc_id, {_SHINGLES_SQL} AS sh
      FROM (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents))
    SELECT a.doc_id FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE {_jacc_pred_sql("a.sh", "b.sh", 0.5)})),
mh AS ({_minhash_oracle()}),
ne AS (SELECT count(*) AS n_exact FROM exact_pairs),
nb AS (SELECT count(*) AS n_minhash FROM mh)
SELECT n_exact, n_minhash,
       {_ratio_sql("n_minhash", "greatest(n_exact, 1)")} AS pair_recall
FROM ne CROSS JOIN nb
""",
    description=(
        "in-gate MinHash-LSH quality evaluation: banded-MinHash near-dup "
        "pairs (q32; exact-Jaccard verified, so no false positives) "
        "counted against the exact inverted-index ground truth at the "
        "same threshold -- recall measured under the oracle hash gate, "
        "the q31/q32 quality contract as a verified query"
    ),
)
def z77(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    exact = dedup.ngram_jaccard_pairs(
        docs, threshold=0.5, unpersist_after=False
    )
    mh = dedup.minhash_lsh_pairs(docs, threshold=0.5, unpersist_after=False)
    ne = exact.agg(F.count("*").alias("n_exact"))
    nb = mh.agg(F.count("*").alias("n_minhash"))
    return ne.crossJoin(F.broadcast(nb)).select(
        "n_exact",
        "n_minhash",
        (
            exactnum.ratio_micros_halfup(
                F.col("n_minhash"), F.greatest(F.col("n_exact"), F.lit(1))
            )
            / F.lit(1000000.0)
        ).alias("pair_recall"),
    )


@query(
    "z78_catalog_summary",
    oracle="""
SELECT 'customer' AS table_name, count(*) AS n_rows,
       count(DISTINCT c_custkey) AS n_distinct_pk FROM customer
UNION ALL SELECT 'events', count(*), count(DISTINCT event_id) FROM events
UNION ALL SELECT 'lineitem', count(*),
                 count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
UNION ALL SELECT 'nation', count(*), count(DISTINCT n_nationkey) FROM nation
UNION ALL SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
UNION ALL SELECT 'region', count(*), count(DISTINCT r_regionkey) FROM region
UNION ALL SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier
UNION ALL SELECT 'documents', count(*), count(DISTINCT doc_id) FROM documents
UNION ALL SELECT 'embeddings', count(*), count(DISTINCT vec_id) FROM embeddings
UNION ALL SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
""",
    description=(
        "catalog health sweep: per-table row count and distinct-PK count "
        "in one union of per-table aggregates -- the first query a "
        "migration/verification run fires (row parity + key integrity "
        "across the whole catalog at a glance; the lineitem composite PK "
        "is genuinely non-unique in the synthetic data and the sweep "
        "shows it)"
    ),
)
def z78(spark, sf_dir):
    pks = {
        "customer": ["c_custkey"],
        "events": ["event_id"],
        "lineitem": ["l_orderkey", "l_linenumber"],
        "nation": ["n_nationkey"],
        "orders": ["o_orderkey"],
        "region": ["r_regionkey"],
        "supplier": ["s_suppkey"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "part": ["p_partkey"],
    }
    parts = []
    for t, keys in sorted(pks.items()):
        df = load(spark, t, sf_dir)
        parts.append(
            df.agg(
                F.count("*").alias("n_rows"),
                F.countDistinct(*keys).alias("n_distinct_pk"),
            ).select(F.lit(t).alias("table_name"), "n_rows", "n_distinct_pk")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    "z80_token_budget",
    oracle=f"""
WITH t AS (
  SELECT source,
         sum(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len({_TOKENS_SQL}) END)::BIGINT AS n_tokens,
         count(*) AS n_docs
  FROM documents GROUP BY source),
g AS (SELECT sum(n_tokens) AS total FROM t)
SELECT source, n_docs, n_tokens,
       round(n_tokens / g.total::DOUBLE, 6) AS token_share
FROM t CROSS JOIN g
""",
    description=(
        "per-source token budget table: docs, exact whitespace tokens, "
        "and share of the corpus total -- the planning table a training "
        "mix is negotiated over (the input z28's capped mixing weights "
        "consume). One group aggregate + a 1-row total broadcast"
    ),
)
def z80(spark, sf_dir):
    t = (
        load(spark, "documents", sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(text.token_count(F.col("text")).cast("long")).alias(
                "n_tokens"
            ),
        )
    )
    g = t.agg(F.sum("n_tokens").alias("_total"))
    return t.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens") / F.col("_total").cast("double"), 6
        ).alias("token_share"),
    )


@query(
    "z81_split_leakage",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh,
         CASE WHEN {_POLY_SQL.format(x="md5(text)")} % 100 < 80 THEN 'train'
              WHEN {_POLY_SQL.format(x="md5(text)")} % 100 < 90 THEN 'valid'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, text, {_TOKENS_SQL} AS w FROM documents))
SELECT a.doc_id AS doc_a, a.split AS split_a,
       b.doc_id AS doc_b, b.split AS split_b,
       {_jacc_sql("a.sh", "b.sh")} AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id AND a.split != b.split
WHERE {_jacc_pred_sql("a.sh", "b.sh", 0.8)}
""",
    description=(
        "train/test split leakage audit: near-duplicate pairs (exact "
        "n-gram Jaccard >= 0.8, the q31 inverted-index plan) that landed "
        "in DIFFERENT hash splits. The content-hash split guarantees "
        "identical text cannot leak -- but near-duplicate VARIANTS can "
        "and do (6/14 pairs at sf0.001/0.01), which is exactly what "
        "eval-set contamination looks like in practice; this is the "
        "audit a split pipeline gates on (fix: split by near-dup "
        "CLUSTER id, q45, instead of raw content hash)"
    ),
)
def z81(spark, sf_dir):
    from ..operators.train_prep import hash_split

    docs = load(spark, "documents", sf_dir)
    labels = hash_split(docs).select("doc_id", "split")
    pairs = dedup.ngram_jaccard_pairs(
        docs, threshold=0.8, unpersist_after=False
    )
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "split_a", "doc_b", "split_b", "jaccard")
    )


@query(
    "z82_cluster_safe_split",
    oracle=f"""
WITH RECURSIVE d AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh
  FROM (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE {_jacc_pred_sql("a.sh", "b.sh", 0.8)}),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(node, lbl) AS (
  SELECT src, src FROM sym
  UNION
  SELECT r.node, s.dst FROM reach r JOIN sym s ON r.lbl = s.src),
cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
labeled AS (
  SELECT doc.doc_id, coalesce(cc.cluster_id, doc.doc_id) AS cluster_id
  FROM documents doc LEFT JOIN cc ON cc.doc_id = doc.doc_id),
s AS (
  SELECT doc_id, cluster_id,
         CASE WHEN {_POLY_SQL.format(x="md5(cluster_id::VARCHAR)")} % 100 < 80
                THEN 'train'
              WHEN {_POLY_SQL.format(x="md5(cluster_id::VARCHAR)")} % 100 < 90
                THEN 'valid'
              ELSE 'test' END AS split
  FROM labeled)
SELECT split, count(*) AS n_docs,
       count(DISTINCT cluster_id) AS n_clusters
FROM s GROUP BY split
""",
    description=(
        "leak-proof split: documents split by NEAR-DUP CLUSTER id "
        "(pairs -> connected components -> cluster hash bucket), so "
        "variant copies land in the same split by construction -- the "
        "fix for the z81 leakage channel, with leakage = 0 pinned by "
        "test. Output: per-split doc and cluster counts"
    ),
)
def z82(spark, sf_dir):
    from ..operators.train_prep import cluster_safe_split

    s = cluster_safe_split(load(spark, "documents", sf_dir))
    return s.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )
