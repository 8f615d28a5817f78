"""SCD merge surface: the reference's centerpiece decision tree, its
3-way rates variant, counters, snapshots, enrichment (SURVEY §2.5).

Split from the monolithic plans/queries.py (round 5, VERDICT r4
task #7); registration order is irrelevant -- every consumer
sorts REGISTRY by name. Helpers and SQL twins live in
plans.base.
"""

from .base import *  # noqa: F401,F403 -- registry, helpers, spark/operator imports



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
        # r15: the snapshot derives BOTH the update leg and the insert
        # leg from the classified actions (plus the max-id scan) --
        # without the checkpoint the classify join re-executes per leg
        # (25 base scans measured at sf0.001). This is the documented
        # intended mode for snapshot consumers (the pipeline sets it).
        materialize_actions=True,
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
