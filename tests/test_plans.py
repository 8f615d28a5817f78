"""Plan-shape assertions: the performance claims, made executable.

These tests pin the physical-plan properties the 100 TB design depends on:
filters reach the parquet scan, projections prune columns, small dims
broadcast, the merge never shuffles the full target, bucketed joins skip
their exchanges, and salted joins reproduce plain-join results.
"""

from datetime import date, datetime

from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark import schemas
from etl_world_banks_with_python_and_postgresql_spark.operators.merge import merge_scd
from etl_world_banks_with_python_and_postgresql_spark.operators.skew import salted_join
from etl_world_banks_with_python_and_postgresql_spark.plans.queries import REGISTRY
from etl_world_banks_with_python_and_postgresql_spark.sources.bucketing import (
    write_bucketed,
)
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


def formatted_plan(df):
    je = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return je.explainString(mode)


def test_q01_filter_pushdown_and_pruning(spark):
    plan = formatted_plan(REGISTRY["q01_pricing_summary"].fn(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 referenced columns -- no full-width scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read_schema and "l_orderkey" not in read_schema


def test_q05_broadcasts_all_dims(spark):
    plan = formatted_plan(REGISTRY["q05_region_revenue"].fn(spark, SF))
    # every join in the star is a broadcast hash join; the fact table is
    # never exchanged before the final aggregation (formatted mode prints
    # each node twice: once in the tree, once in the detail section)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    # exactly one shuffle: the final aggregation
    tree = plan.split("\n\n")[0]
    assert sum("+- Exchange" in l or "- Exchange (" in l for l in tree.splitlines()) == 1


def test_merge_semi_join_reduction(spark):
    target = spark.createDataFrame([], schemas.WORLD_BANK_DATA)
    batch = spark.createDataFrame(
        [("Bank A", 1.0, date(2024, 7, 1), "b1")], schemas.WORLD_BANK_BATCH
    )
    res = merge_scd(
        target,
        batch,
        keys=["bank_name"],
        compare_col="market_cap_usd",
        set_cols=["market_cap_usd", "last_modified_date"],
        batch_id="b1",
        table_name="t",
        now=datetime(2024, 8, 1),
    )
    plan = formatted_plan(res.target)
    assert "LeftSemi" in plan  # target reduced to batch keys before profiling


def test_bucketed_join_skips_exchange(spark, tmp_path):
    orders = load(spark, "orders", SF)
    lineitem = load(spark, "lineitem", SF)
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        n_buckets=8,
    )
    j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    plan = formatted_plan(j)
    # co-located buckets: the join needs no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan
    n = j.count()
    assert n == lineitem.count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_equals_plain_join(spark):
    li = load(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    o = load(spark, "orders", SF).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    salted = salted_join(li, o, on=["l_orderkey"], salt=8).agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    assert plain["n"] == salted["n"]
    assert plain["s"] == salted["s"]


def test_incremental_read_no_base_shuffle(spark, tmp_path):
    """The incremental read's scale contract: the base snapshot is scanned
    once and joined to the pending-delta id set by BROADCAST anti join --
    no Exchange (shuffle) of the base side."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (
        IncrementalTable,
    )

    table = IncrementalTable(str(tmp_path / "t"), id_col="world_bank_id")
    rows = [(f"Bank {i}", float(i), date(2024, 7, 31), "b1") for i in range(100)]
    base = spark.createDataFrame(rows, schemas.WORLD_BANK_BATCH)
    table.merge_batch(
        spark, schemas.WORLD_BANK_DATA, base,
        keys=["bank_name"], compare_col="market_cap_usd",
        set_cols=["market_cap_usd", "last_modified_date"],
        batch_id="b1", table_name="wb", now=datetime(2024, 8, 1),
    )
    table.compact(spark, schemas.WORLD_BANK_DATA)
    upd = spark.createDataFrame(
        [("Bank 0", 1e6, date(2024, 8, 1), "b2")], schemas.WORLD_BANK_BATCH
    )
    table.merge_batch(
        spark, schemas.WORLD_BANK_DATA, upd,
        keys=["bank_name"], compare_col="market_cap_usd",
        set_cols=["market_cap_usd", "last_modified_date"],
        batch_id="b2", table_name="wb", now=datetime(2024, 8, 2),
    )
    plan = formatted_plan(table.read(spark, schemas.WORLD_BANK_DATA))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_q64_semi_anti_are_hash_keyed(spark):
    """Non-equi EXISTS/NOT EXISTS must plan as equi-keyed semi/anti joins
    with the inequality as residual condition -- never a nested loop."""
    plan = formatted_plan(REGISTRY["q64_sole_late_supplier"].fn(spark, SF))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q85_star_join_single_shuffle(spark):
    """Q8-shape market share: all five dimensions broadcast; the only
    sort-merge-eligible edge is lineitem x orders."""
    plan = formatted_plan(REGISTRY["q85_market_share"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 5
    # the one big-x-big edge may be SMJ or (post-AQE) shuffled hash -- but
    # never a broadcast of the fact side; just pin that no cartesian or
    # nested-loop fallback appears
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q83_semi_reduction_before_report_join(spark):
    """Q18-shape large orders: orders must be reduced by the HAVING-set
    semi join BEFORE the customer/lineitem report joins."""
    plan = formatted_plan(REGISTRY["q83_large_orders"].fn(spark, SF))
    assert "LeftSemi" in plan
    # the quantity HAVING aggregate partials map-side before its shuffle
    assert "HashAggregate" in plan


def test_q87_eval_side_broadcasts(spark):
    """Decontamination: the eval gram set must broadcast -- the training
    side's exploded grams are never shuffled for the join itself."""
    plan = formatted_plan(REGISTRY["q48_decontaminate"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q89_single_pass_no_rejoin(spark):
    """The composite corpus pipeline must not re-join features on doc_id:
    quality/split are row-local projections (keep_cols), so the only
    joins are the dedup semi join, and the only exchanges are the dedup
    aggregate and the final stats aggregate."""
    plan = formatted_plan(REGISTRY["q49_train_pipeline"].fn(spark, SF))
    assert "SortMergeJoin" not in plan
    tree = plan.split("\n\n")[0]
    n_exchanges = sum(
        "+- Exchange" in l or "- Exchange (" in l for l in tree.splitlines()
    )
    assert n_exchanges <= 3, f"{n_exchanges} exchanges:\n{tree}"


def test_q39_neardup_no_cartesian(spark):
    # the banded sign-LSH rewrite must keep candidate generation an
    # equi-join on (band, key) -- never a cartesian / nested-loop pair scan
    # of the corpus (the pre-round-3 all-pairs shape)
    plan = formatted_plan(REGISTRY["q39_embedding_neardup"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_novel_documents_bucketed_corpus_no_exchange(spark):
    """The incremental-dedup docstring claim, pinned: with the corpus
    content-hash index stored bucketed on the hash, the per-batch
    anti-join probes it WITHOUT shuffling the corpus side -- only the
    (small) new batch exchanges. This is the steady-state O(|batch|)
    ingest plan at 100 TB."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.bucketing import (
        write_bucketed,
    )

    docs = load(spark, "documents", SF)
    corpus_idx = docs.filter(F.col("source") == "src0").select(
        F.md5("text").alias("_h")
    ).distinct()
    write_bucketed(corpus_idx, "b_corpus_hash", ["_h"], n_buckets=8)
    try:
        new = docs.filter(F.col("source") != "src0").select(
            "doc_id", F.md5("text").alias("_h")
        )
        # mirror novel_documents' join against the bucketed index, with the
        # batch side repartitioned onto the SAME hash layout
        novel = new.repartition(8, "_h").join(
            spark.table("b_corpus_hash"), "_h", "left_anti"
        )
        plan = formatted_plan(novel)
        tree = plan.split("\n\n")[0]
        # the corpus scan feeds the join with no Exchange above it
        scan_side = [
            l for l in tree.splitlines() if "b_corpus_hash" in l or "Scan" in l
        ]
        assert any("b_corpus_hash" in l for l in scan_side)
        # exactly one hashpartitioning exchange in the whole plan: the
        # batch-side repartition; none on the bucketed corpus side
        assert tree.count("Exchange hashpartitioning") <= 1
        assert novel.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_corpus_hash")


def test_gate_window_covers_every_family():
    """Gate-policy pin (README "The 50-name driver gate"): the driver
    verifies only the first 50 sorted registry names, so every SURVEY §2
    family and every north-star LLM-pipeline family must keep at least
    one representative inside that window. A rename/addition that evicts
    one fails here by family name."""
    gated = set(sorted(REGISTRY)[:50])

    families = {
        "relational-agg": {"q01_pricing_summary"},
        "topk-sort": {"q02_top_orders", "q03_shipping_priority"},
        "joins-semi-anti-outer": {
            "q04_priority_semijoin", "q08_semi_high_value",
            "q09_anti_no_orders", "q10_full_outer_presence",
        },
        "rollup-cube-grouping": {"q12_rollup", "q13_cube", "q14_grouping_sets"},
        "window-functions": {"q16_window_topk_per_group", "q17_window_running"},
        "pivot-setops-strings-dates-json": {
            "q18_pivot", "q19_set_ops", "q20_string_funcs",
            "q21_date_funcs", "q22_json_extract",
        },
        "streaming-equivalence": {
            "q24_tumbling_window", "q25_sessionize", "q43_event_time_join",
        },
        "scd-merge": {"q26_scd_classify", "q27_scd_counters", "q28_scd_snapshot"},
        "enrichment": {"q29_enrich_currency"},
        "dedup": {
            "q30_dedup_exact", "q31_dedup_ngram_jaccard",
            "q32_dedup_minhash_lsh", "q33_dedup_simhash", "q45_dedup_clusters",
        },
        "text-analysis": {
            "q34_text_tokens", "q35_text_quality",
            "q36_text_langid", "q37_text_fingerprint",
        },
        "similarity-ann": {"q38_ann_cosine_topk", "q39_embedding_neardup"},
        "multimodal": {"q40_multimodal_meta"},
        "asof-range-join": {"q41_asof_join", "q50_range_join"},
        "timeseries": {"q42_hypertable_rollup", "q44_resample_ffill"},
        "pandas-udf-surface": {"q46_zscore_groupmap"},
        "subqueries": {"q47_correlated_scalar_subquery"},
        "train-prep": {"q11_hash_split", "q48_decontaminate", "q49_train_pipeline"},
    }
    missing = {
        fam: members
        for fam, members in families.items()
        if not (members & gated)
    }
    assert not missing, f"families evicted from the 50-name gate: {missing}"

    # and no registry name may sort into the window unexpectedly: q100+
    # style names would push criticals out
    assert all(n in gated for fam in families.values() for n in fam), (
        "a pinned family representative is no longer in the gated window"
    )


def test_deterministic_sample_is_partial_topk(spark):
    """z13's sampling plan must be TakeOrderedAndProject (per-partition
    k-row heaps, no global Exchange+Sort): the shape that makes bottom-k
    sampling a one-pass operation at 100 TB."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        deterministic_sample,
    )

    docs = load(spark, "documents", SF)
    plan = formatted_plan(
        deterministic_sample(docs, 50).select("doc_id", "source")
    )
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert "Exchange rangepartitioning" not in tree  # no global sort


def test_deterministic_sample_kmv_composition(spark):
    """Bottom-k composes: sampling the union equals sampling the union of
    per-part samples, and growing the corpus only swaps in docs that hash
    below the old threshold (stable under appends)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        deterministic_sample,
    )

    docs = load(spark, "documents", SF)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    k = 30
    whole = {r["doc_id"] for r in deterministic_sample(docs, k).collect()}
    merged_parts = deterministic_sample(a, k).unionByName(
        deterministic_sample(b, k)
    )
    recombined = {
        r["doc_id"] for r in deterministic_sample(merged_parts, k).collect()
    }
    assert whole == recombined

    # append stability: the sample of a grown corpus keeps every old
    # member whose key stays below the new threshold -- equivalently, the
    # old sample is a superset of (new sample ∩ old corpus)
    grown = {r["doc_id"] for r in deterministic_sample(docs, k).collect()}
    old = {r["doc_id"] for r in deterministic_sample(a, k).collect()}
    assert (grown & {r["doc_id"] for r in a.collect()}) <= old
