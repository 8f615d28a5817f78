"""Registry-wide physical-plan hygiene sweep.

Every registry query's plan is linted for the anti-patterns that kill at
cluster scale (cartesian joins, nested-loop joins, row-wise Python UDFs).
Offenders must be explicitly whitelisted WITH a reason -- a new operator
that regresses into an all-pairs join (the round-2 q39 class) fails here
by name.
"""

import pytest
from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.plans.lint import (
    lint_exact_output,
    lint_plan,
)
from etl_world_banks_with_python_and_postgresql_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# query -> justification for the allowed nested-loop/cartesian shape
WHITELIST = {
    # 5 x 5 region pairs: the cross product IS the requested result and
    # both sides are dimension-sized forever
    "q69_cross_region_pairs": "intentional tiny cross product",
    # brute-force exact ANN baseline: every (query, corpus) pair must be
    # scored by definition; the build side is the bounded broadcast query
    # set (max_queries guard), so the 'nested loop' is the scan itself
    "q38_ann_cosine_topk": "exact ANN: bounded broadcast query side",
    "q77_multimodal_ann": "exact ANN: fixed-cap broadcast query side",
    "z53_quantized_ann": "exact ANN: bounded broadcast query side (quantized corpus)",
    "z120_pq_topk": "exact ANN scan over PQ reconstructions: bounded broadcast query side",
    "z75_quantization_recall": "exact ANN eval: both legs bounded broadcast query sides",
    # the ground-truth leg is the deliberate test-scale-only all-pairs
    # baseline the banded path is being measured against
    "z76_lsh_pair_recall": "recall eval: exact all-pairs ground-truth leg",
    # two 1-row count aggregates crossed into the summary row
    "z77_minhash_pair_recall": "two 1-row aggregate sides crossed",
    # the corpus-total token count is ONE broadcast row crossed into the
    # per-source share expression
    "z80_token_budget": "scalar-aggregate total (1-row broadcast side)",
    # same exact-scan contract as q38: the negatives are top-k over ALL
    # label-mismatched pairs by definition; query side is broadcast and
    # max_queries-guarded, the corpus is scanned once
    "z26_hard_negatives": "exact hard-negative mining: bounded broadcast query side",
    # comparisons against a single-row global aggregate: the nested-loop
    # build side is exactly one broadcast row
    "q55_supplier_value_share": "scalar-aggregate comparison (1-row side)",
    "q73_top_nation_part_value": "scalar-aggregate comparison (1-row side)",
    "q84_dormant_rich_customers": "scalar-aggregate comparison (1-row side)",
    "z28_source_mixing": "scalar-aggregate normalization (1-row total side)",
    # corpus stats (N, sum_dl, per-term df) are ONE broadcast row crossed
    # into the row-local score expression
    "z36_bm25_rank": "scalar-aggregate stats (1-row broadcast side)",
    # the doc-count N is ONE broadcast row crossed into the row-local
    # tf-idf score expression
    "z85_tfidf_terms": "scalar-aggregate N (1-row broadcast side)",
    # the (N_pool, N_target) totals are ONE broadcast row crossed into
    # the bounded per-feature weight table
    "z143_importance_weights": "scalar-aggregate totals (1-row broadcast side)",
    # the global triangle total is ONE broadcast row crossed into the
    # top-20 output
    "z144_triangle_count": "scalar-aggregate total (1-row broadcast side)",
    # two 1-row aggregates (kept-edge count x sampled-triangle total)
    # crossed into the single summary row
    "z166_triangle_estimate": "two 1-row aggregate sides crossed",
    # histogram-sized dims-cross (groups x buckets, both aggregate
    # outputs bounded by their value universes) + 1-row N broadcast --
    # zero-count cells must still contribute their |0 - T*n| mass
    "z171_source_drift": "bounded dims-cross + 1-row total broadcast",
    # the (N, observed-cell-count) totals are ONE broadcast row crossed
    # into the bounded contingency-cell table
    "z193_chisq_independence": "scalar-aggregate total (1-row broadcast side)",
    # the corpus token total N is ONE broadcast row crossed into the
    # bounded (<= partitions x capacity) candidate-count table
    "z195_heavy_hitters_twopass": "scalar-aggregate total (1-row broadcast side)",
    # the truth leg is the deliberate bounded-slice all-pairs fuzzy
    # ground truth the blocking scheme is graded AGAINST (z76 pattern);
    # the scorecard itself crosses three 1-row aggregates
    "z196_blocking_quality": "recall eval: bounded all-pairs ground-truth leg + 1-row aggregates crossed",
    # same exact-scan contract as q38: every vector must score against
    # every anchor by definition; the anchor side is bounded
    # (max_anchors guard) and broadcast, the corpus scanned once
    "z197_anchor_margin_profile": "exact routing profile: bounded broadcast anchor side",
    # the selection windows run on the 32-row replicate-median axis and
    # the value-domain histogram axis (z176 bounded-axis pattern), never
    # corpus rows; the CI row is ONE broadcast crossed into the 1-row
    # full-median aggregate
    "z198_subsample_median_ci": "bounded-axis windows + 1-row aggregates crossed",
    # the cumulative-vocabulary window runs on the BATCH axis
    # (corpus/50 rows after aggregation -- the z90/z92 bounded-axis
    # pattern), never on corpus rows
    "z176_vocab_growth": "window over the bounded batch axis",
    # the (total-tokens, total-bigrams) corpus counts are each ONE
    # broadcast row crossed into the per-bigram lift expression
    "z179_pmi_collocations": "two 1-row aggregate totals crossed",
    # same exact-scan contract as q38: the ranking leg IS cosine_topk
    # with its bounded broadcast query side
    "z185_retrieval_ndcg_mrr": "exact ANN run leg: bounded broadcast query side",
    # the three pair-count totals are each ONE broadcast aggregate row
    # crossed into the single summary row
    "z187_dedup_cluster_pair_eval": "1-row aggregate sides crossed into summary",
    # left/right/joint totals: three 1-row aggregates crossed
    "z188_join_explosion_preflight": "1-row aggregate sides crossed into summary",
    # both run legs are q38/z53 exact scans with bounded broadcast
    # query sides; the RBO itself is one equi-join + sum
    "z191_ranker_agreement_rbo": "exact ANN run legs: bounded broadcast query sides",
    # same two exact-ANN run legs as z191 (the tau metric itself is a
    # bounded equi-self-join on query_id)
    "z192_ranker_kendall_tau": "exact ANN run legs: bounded broadcast query sides",
    # level-2 frontier scan: its input is the checkpointed UNION OF
    # PER-BUCKET FRONTIERS (level 1 is bucket-partitioned), bounded by
    # the survivor count, never by the corpus
    "z155_pareto_frontier": "global window over the pre-reduced survivor union",
    # the ordered global window runs over |distinct weeks| rows AFTER two
    # reductions (user -> first week -> per-week counts): bounded by the
    # calendar, never by users or events
    "z73_user_growth": "global window over the pre-aggregated week axis",
    # the centered-MA window runs over |distinct days| rows AFTER the
    # daily reduction: bounded by the calendar, never by events (the
    # resample_ffill bucket argument); the seasonal side is a
    # period-row broadcast
    "z111_seasonal_decompose": "global window over the pre-aggregated day axis",
    # the (a < b) source-pair cross product is the requested output axis
    # and both sides are |distinct sources| rows (dimension-sized); all
    # DATA-sized work upstream is the equi-join hash-sketch path
    "z103_kmv_source_overlap": "intentional source-pair cross product (dimension-sized sides)",
    # the scalable-cumsum BUCKET-offset window is the bounded recursive
    # level: n/bucket_width rows, not n (that is the operator's point)
    "z90_scalable_cumsum": "global window over the bucket axis only",
    "z91_token_shards": "global window over the bucket axis only",
    # two 1-row broadcast sides (grand total T, leftover seats) and a
    # remainder-ranking window over |sources| rows
    "z92_largest_remainder_mix": "1-row broadcasts + window over the source axis",
    # both join sides are per-source signature rows (|sources|, a
    # dimension bounded by catalog design, never corpus-sized)
    "z98_source_minhash_similarity": "dimension-sized source-pair join",
    # global [min, max] bounds are ONE broadcast row crossed into the
    # row-local bin expression
    "z40_histogram": "scalar-aggregate bounds (1-row broadcast side)",
    # percentile cut points are ONE broadcast row crossed into the
    # row-local bin expression
    "z43_equi_depth_histogram": "scalar-aggregate cuts (1-row broadcast side)",
    # total-basket normalizer is ONE broadcast row crossed into the
    # row-local lift expression
    "z46_association_rules": "scalar-aggregate normalizer (1-row broadcast side)",
    # corpus-total counts are ONE broadcast row crossed into the
    # row-local chi-square expression
    "z52_vocab_drift": "scalar-aggregate totals (1-row broadcast side)",
    # per-side totals are ONE broadcast row crossed into the CDF rows
    # (themselves bounded by |distinct 6-dp score values|)
    "z59_ks_drift": "scalar-aggregate totals (1-row broadcast side)",
    # the childless-parent count is ONE broadcast row crossed into the
    # 1-row deviation summary
    "z60_reconciliation": "two 1-row aggregate sides crossed",
    # the global newest-timestamp is ONE broadcast row crossed into the
    # per-stream staleness expression
    "z71_freshness_sla": "scalar-aggregate now-marker (1-row broadcast side)",
    # percentile cuts and the grand total are each ONE broadcast row
    # crossed into the row-local decile/share expressions
    "z74_revenue_pareto": "two 1-row broadcast sides (cuts + total)",
    # the id-assigning window runs over the limit(top_n)-bounded vocab
    # rows only (TakeOrdered upstream): vocab-sized, corpus-independent
    "z119_vocab_encode": "global window over the limit(top_n)-bounded vocab axis",
    # the rank-presentation window runs over the limit(k=20)-bounded
    # top-k rows only (scores stay internal; EXACT_ROUND_FROZEN)
    "z128_bm25_indexed": "global window over the limit(k)-bounded top-k rows",
    # RRF: per-system rank windows each run over that system's
    # LIMIT-bounded top-k; the fusion window over their <= sum-of-k union
    "z133_hybrid_rrf": "global windows over LIMIT-bounded top-k lists only",
}


# The q49-class determinism lint (VERDICT r5 task #5): entries whose
# gated output rounds a DOUBLE (not a decimal / exactnum BIGINT). This
# set is the FROZEN pre-round-6 inventory -- every name is bit-exact vs
# DuckDB at sf0.01 (DIAG_r05_full attestation) because both engines
# perform the identical IEEE op sequence before the round, and
# tests/test_determinism_duckdb.py re-sweeps their gated floats for
# rounding-half-boundary proximity. DO NOT ADD NAMES: a new entry that
# rounds a double goes red here by design; derive new numeric outputs in
# exact BIGINT via functions/exactnum and present as k / 10^s.0.
EXACT_ROUND_FROZEN = {
    "q07_customer_order_stats", "q12_rollup", "q13_cube",
    "q14_grouping_sets", "q17_window_running", "q18_pivot",
    "q26_scd_classify", "q28_scd_snapshot", "q29_enrich_currency",
    "q38_ann_cosine_topk", "q41_asof_join", "q44_resample_ffill",
    "q47_correlated_scalar_subquery", "q50_range_join",
    "q53_percentiles", "q54_min_cost_per_part",
    "q55_supplier_value_share", "q58_map_column", "q60_ivf_kmeans_topk",
    "q65_share_of_total", "q68_range_frame_90d", "q72_small_qty_revenue",
    "q77_multimodal_ann", "q80_returned_items", "q81_promo_revenue",
    "q83_large_orders", "q84_dormant_rich_customers", "q85_market_share",
    "q89_null_semantics", "q91_array_funcs", "q93_stat_profile",
    "q94_rank_family", "q96_column_profile", "q97_ivf_indexed_ann",
    "q98_repetition_signals", "z10_token_entropy", "z23_weighted_sample",
    "z26_hard_negatives", "z30_grouped_weighted_sample", "z36_bm25_rank",
    "z41_mad_outliers", "z46_association_rules", "z48_doc_keywords",
    "z50_corpus_pipeline_v2", "z52_vocab_drift", "z53_quantized_ann",
    "z55_time_weighted_avg", "z56_trend_slope", "z57_time_to_convert",
    "z60_reconciliation", "z63_harmonic_mean", "z64_soft_dedup_weights",
    "z65_minmax_scale", "z69_session_funnel", "z70_intersession_gaps",
    "z71_freshness_sla", "z74_revenue_pareto", "z75_quantization_recall",
    "z76_lsh_pair_recall", "z80_token_budget", "z97_diversity_sample",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_is_scale_clean(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    findings = lint_plan(df)
    if name not in WHITELIST:
        assert not findings, (
            f"{name} regressed into a scale anti-pattern: {findings}. "
            "Fix the plan or whitelist it here with a justification."
        )
    exact = lint_exact_output(df)
    if name not in EXACT_ROUND_FROZEN:
        assert not exact, (
            f"{name} rounds a DOUBLE in a gated output: {exact[:2]}. "
            "Use functions/exactnum (BIGINT HALF_UP, present as "
            "k / 10^s.0) or round a DECIMAL; EXACT_ROUND_FROZEN is "
            "frozen -- do not add names."
        )


def test_exact_lint_reds_on_seeded_round_double(spark):
    """The lint must red a fresh round(<double>) gated output (VERDICT
    r5 task #5 done-criterion) and stay green for the two sanctioned
    constructions: decimal rounding and the exactnum presentation."""
    bad = spark.range(5).select(F.round(F.col("id") / 3, 2).alias("r"))
    assert lint_exact_output(bad), "seeded round(double) must be flagged"

    dec = spark.range(5).select(
        F.round(F.col("id").cast("decimal(20,6)") / 3, 2)
        .cast("double")
        .alias("r")
    )
    assert not lint_exact_output(dec), "decimal rounding is sanctioned"

    from etl_world_banks_with_python_and_postgresql_spark.functions.exactnum import (
        ratio_micros_halfup,
    )

    ex = spark.range(1, 5).select(
        (ratio_micros_halfup(F.col("id"), F.lit(7)) / F.lit(1e6)).alias("r")
    )
    assert not lint_exact_output(ex), "exactnum presentation is sanctioned"
