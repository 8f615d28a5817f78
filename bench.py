#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + materialize). A tiny
warmup query first absorbs one-off JVM/codegen startup so per-query numbers
reflect steady-state execution, which is what the 100 TB story cares about.

VARIANCE PROTOCOL (VERDICT r5 task #2): per-query numbers on this box
carry a measured 14-21 % load-sensitivity band (GC/heap state, PERF.md),
which round-over-round made 16-24 % "regressions" appear and vanish with
no plan change. Each query is therefore run ``--repeat N`` times (block
state reset between runs) and the reported figure is the ``--agg min``
over runs -- min-of-N is the standard way to strip coscheduling noise
from a deterministic workload's timing. Defaults: repeat=2, agg=min
(override via flags or $SPARK_GRAFT_BENCH_REPEAT); ``--repeat 1``
restores the old single-shot behavior. The JSON line records both knobs
so BENCH_r{N} files are self-describing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_world_banks_with_python_and_postgresql_spark.plans.queries import REGISTRY
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Fixed regression set (the r3 24-entry suite + pipeline_e2e): frozen so
# round-over-round comparison has a stable denominator while the full
# HEADLINE list grows. Emitted as `shared_total` alongside the suite
# total (VERDICT r4 task #8). Do not add to this list; add to HEADLINE.
SHARED_24 = [
    "pipeline_e2e_2runs",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q12_rollup",
    "q15_distinct_agg",
    "q16_window_topk_per_group",
    "q22_json_extract",
    "q25_sessionize",
    "q26_scd_classify",
    "q28_scd_snapshot",
    "q30_dedup_exact",
    "q31_dedup_ngram_jaccard",
    "q32_dedup_minhash_lsh",
    "q37_text_fingerprint",
    "q38_ann_cosine_topk",
    "q40_multimodal_meta",
    "q48_decontaminate",
    "q49_train_pipeline",
    "q83_large_orders",
    "q85_market_share",
    "q98_repetition_signals",
    "z03_minhash_novel",
]

# Headline set: one per operator family, weighted toward the shapes that
# dominate at scale (joins, aggs, windows, dedup, similarity, merge).
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q12_rollup",
    "q15_distinct_agg",
    "q16_window_topk_per_group",
    "q22_json_extract",
    "q25_sessionize",
    "q26_scd_classify",
    "q28_scd_snapshot",
    "q30_dedup_exact",
    "q31_dedup_ngram_jaccard",
    "q32_dedup_minhash_lsh",
    "q37_text_fingerprint",
    "q38_ann_cosine_topk",
    "q40_multimodal_meta",
    "q83_large_orders",
    "q85_market_share",
    "q48_decontaminate",
    "q49_train_pipeline",
    "q98_repetition_signals",
    "z03_minhash_novel",
    "z06_continuous_aggregate",
    "z11_canonical_dedup",
    "z19_semantic_dedup",
    "z20_quality_classifier",
    "z21_embedding_moments",
    "z22_source_overlap",
    "z36_bm25_rank",
    "z38_constraint_audit",
    "z39_kmv_distinct",
    "z41_mad_outliers",
    "z42_apply_changes",
    "z50_corpus_pipeline_v2",
    "z83_bmp_pixel_stats",
    "z84_oov_rate",
    "z85_tfidf_terms",
    "z86_trimmed_mean",
    "z88_bigram_lm_score",
    "z89_incremental_join_view",
    "z90_scalable_cumsum",
    "z95_countmin_tokens",
    "z97_diversity_sample",
    "z98_source_minhash_similarity",
    "z99_jpeg_pixel_stats",
    "z100_exact_substring_dedup",
    "z101_cdc_join_view",
    "z102_cdc_agg_view",
    "z103_kmv_source_overlap",
    "z107_kmv_quantiles",
    "z108_chunk_documents",
    "z109_kmv_agg_view",
    "z110_table_profile",
    "z111_seasonal_decompose",
    "z112_grouped_profile",
    "z113_grouped_decompose",
    "z114_minhash_index_build",
    "z115_minhash_index_probe",
    "z116_epoch_shuffle",
    "z117_stride_interleave",
    "z118_line_dedup",
    "z119_vocab_encode",
    "z124_pack_manifest",
    "z125_length_batches",
    "z126_html_to_text",
    "z127_unicode_fold",
    # probe-only at-rest retrieval (VERDICT r10 #4): recurring cost of
    # each index family, served from a fingerprint-cached index
    "z128_bm25_indexed",
    "z129_phrase_search_indexed",
    "z130_ivfpq_index_probe",
    # round-11 additions: register sketch, bounded-iteration graph
    # centrality, hybrid-retrieval fusion
    "z131_hll_distinct",
    "z132_pagerank",
    "z133_hybrid_rrf",
    "z134_markov_transitions",
    "z135_acf",
    "z136_hll_agg_view",
    "z137_recursive_cte",
    "z138_variant_extract",
    "z139_weighted_pagerank",
    "z140_cusum_changepoint",
    # round-11 second-session additions: quality-rule battery, winnowing
    # dedup, importance weights, triangle counting, Holt forecasting,
    # Hilbert layout key, star-contraction CC, power-iteration PCA
    "z141_gopher_rules",
    "z142_winnow_pairs",
    "z143_importance_weights",
    "z144_triangle_count",
    "z145_holt_forecast",
    "z146_hilbert_key",
    "z147_connected_components",
    "z148_power_iteration_pc",
    "z149_sentence_stats",
    "z150_theil_sen",
    # at-rest winnow index: one-time build + recurring pruned probe
    "z151_winnow_index_build",
    "z152_winnow_index_probe",
    "z153_entity_resolution",
    "z154_k_anonymity",
    "z155_pareto_frontier",
    "z156_rolling_quantiles",
    "z157_series_correlation",
    "z158_period_over_period",
    "z159_bloom_point_lookup",
    "z160_seasonal_anomaly",
    "z161_activity_streaks",
    "z162_semantic_decontaminate",
    "z163_gini_concentration",
    "z164_ab_test_gate",
    # round-12: Hilbert at-rest layout probe (recurring pruned-read cost)
    "z165_hilbert_layout_probe",
    # round-12: sparsified triangle estimate (the cost cliff vs exact z144)
    "z166_triangle_estimate",
    # round-12: URL canonicalization + per-domain rollup (CCNet grouping)
    "z167_url_canonicalize",
    "z168_domain_stats",
    # round-12: k-core peeling (dense-subgraph prior)
    "z169_k_core",
    # round-12: l-diversity ladder (attribute-disclosure audit)
    "z170_l_diversity",
    # round-12: per-source TVD drift (corpus observability)
    "z171_source_drift",
    # round-12: perceptual image dedup from real decoded pixels
    "z172_image_dhash_dedup",
    # round-12: 2-hop reach (influence radius, transit-capped operator)
    "z173_two_hop_reach",
    # round-12: sweep-line peak concurrency (two-level max-prefix)
    "z174_max_concurrency",
    # round-12: histogram-trick exact weighted median
    "z175_weighted_median",
    # round-12: vocab growth curve + keep-longest canonical selection
    "z176_vocab_growth",
    "z177_cluster_keep_longest",
    # round-12: ordered funnel (registry pairing for the r3 operator)
    "z178_funnel",
    # round-13: PMI collocation mining (exact integer lift)
    "z179_pmi_collocations",
    # round-13: degree assortativity (cleared-integer Pearson)
    "z180_degree_assortativity",
    # round-13: per-day dedup novelty rate (time axis of dedup obs.)
    "z181_temporal_novelty",
    # round-13: cross-domain link rollup (reciprocal pairs, outshares)
    "z182_link_domain_rollup",
    # round-13: per-source quantile normalization (histogram mid-rank)
    "z183_source_quantile_norm",
    # round-13: classifier eval (per-class PRF in exact micros)
    "z184_langid_confusion_prf",
    # round-13: ranking eval (nDCG@10 + MRR, integer-micros discounts)
    "z185_retrieval_ndcg_mrr",
    # round-13: join-key skew profile (the pre-shuffle salting decision)
    "z186_key_skew_profile",
    # round-13: clustering pair-eval (pair P/R/F1, Rand, ARI)
    "z187_dedup_cluster_pair_eval",
    # round-13: exact join-cardinality preflight (co-purchase self-join)
    "z188_join_explosion_preflight",
    # round-13: hop-bounded harmonic centrality (crawl host ranking)
    "z189_harmonic_centrality",
    # round-13: dedup savings report (keep-longest capacity planning)
    "z190_dedup_savings_report",
    # round-13: ranker agreement RBO (exact-vs-quantized run diff)
    "z191_ranker_agreement_rbo",
    # round-14: ranker agreement Kendall tau (pairwise-order complement)
    "z192_ranker_kendall_tau",
    # round-14: chi-square source x language coupling
    "z193_chisq_independence",
    # round-14: score calibration ECE (en-stopword score vs lang label)
    "z194_score_calibration_ece",
    # round-14: two-pass exact heavy hitters (MG prefilter, bounded shuffle)
    "z195_heavy_hitters_twopass",
    # round-14: ER blocking-scheme scorecard (reduction vs completeness)
    "z196_blocking_quality",
    # round-14: IVF routing-margin profile (per-cell order statistics)
    "z197_anchor_margin_profile",
    # round-14: deterministic subsample CI on the corpus median
    "z198_subsample_median_ci",
    # round-14: tokenizer fertility by language (token-space mixing axis)
    "z199_tokenizer_fertility",
]


def bench_pipeline_e2e(spark) -> float:
    """The reference's own workload shape: extract 2 HTML pages (local
    fixtures, like-for-like with its 10-bank/39-rate run), SCD-merge both
    tables twice (cold insert + warm re-run), full audit. The reference's
    measured wall clock for one network-bound run is ~13 s (BASELINE.md)."""
    import tempfile
    from datetime import datetime

    from etl_world_banks_with_python_and_postgresql_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from etl_world_banks_with_python_and_postgresql_spark.sources.fixtures import (
        write_fixture_pages,
    )

    with tempfile.TemporaryDirectory() as tmp:
        b, r = write_fixture_pages(tmp)
        t0 = time.perf_counter()
        for i, day in enumerate((1, 2)):
            run_pipeline(
                spark,
                PipelineConfig(
                    banks_source=b,
                    rates_source=r,
                    target_dir=f"{tmp}/warehouse",
                    batch_id=f"bench-{i}",
                    now=datetime(2024, 8, day, 6, 0, 0),
                ),
            )
        return round(time.perf_counter() - t0, 3)


def reset_block_state(spark) -> None:
    """Release cross-query JVM block state so each entry is measured from a
    clean block manager: persisted DataFrames (the dedup operators persist
    their shingle sets for multi-branch reuse and hand back a lazy result,
    so the cache outlives the query) and localCheckpoint RDD blocks (the
    merge pipeline pins those). Without this the suite accumulates dead
    blocks and later queries pay rotating full-GC pauses -- q31 measured
    26-28 s polluted vs 5-7 s clean, same plan (PERF.md)."""
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    prdds = jsc.getPersistentRDDs()
    it = prdds.iterator()
    while it.hasNext():
        it.next()._2().unpersist(True)  # blocking: don't race the next query
    spark.sparkContext._jvm.System.gc()


def warmup(spark) -> None:
    """One-off costs absorbed before any measurement: touch the biggest
    table (JVM + codegen + FS metadata), spin up the Python worker pool
    (cold fork+import otherwise dominates the first mapInPandas query),
    and run one throwaway pipeline -- the merge/classify/snapshot plans
    carry ~9 s of one-time codegen+JIT on this box (cold 13.5 s vs warm
    3.5 s for identical plans)."""
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    spark.range(10_000).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()
    import tempfile
    from datetime import datetime

    from etl_world_banks_with_python_and_postgresql_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from etl_world_banks_with_python_and_postgresql_spark.sources.fixtures import (
        write_fixture_pages,
    )

    with tempfile.TemporaryDirectory() as tmp:
        b, r = write_fixture_pages(tmp)
        run_pipeline(
            spark,
            PipelineConfig(
                banks_source=b,
                rates_source=r,
                target_dir=f"{tmp}/warmup_wh",
                batch_id="warmup",
                now=datetime(2024, 8, 1, 6, 0, 0),
            ),
        )


LOCAL_ARTIFACT = "BENCH_LAST_LOCAL.json"
# committed quiet-box snapshot (gen_registry.py --freeze-bench); the
# adjudication fallback when the mutable local artifact is missing,
# config-incomparable, or load-disqualified
BENCH_SNAPSHOT = "REGISTRY_BENCH.json"


def _quiet_start_threshold(cpus: int) -> float:
    """Max 1-min loadavg AT SUITE START for a run to count as a
    quiet-box reference (FALLBACK witness only -- see
    :func:`_cpu_busy_frac`). Start load is more discriminating than
    mid-run samples (the suite's OWN work drives load1m to ~5 on this
    32-cpu box), but this kernel reports phantom loadavg (measured
    3.7-5.2 at 99.97% idle per /proc/stat), so the busy-fraction
    witness decides when available. 2.5 absolute floor absorbs
    post-idle decay noise."""
    return max(2.5, 0.08 * cpus)


# start-of-suite CPU busy fraction above which the run is NOT a valid
# quiet-box reference: a rival Spark JVM (the r13 failure mode) shows
# up as >= several cores busy before this bench has created any load
QUIET_BUSY_FRAC = 0.20


def _cpu_busy_frac(interval: float = 0.5) -> float | None:
    """Fraction of total CPU time NOT idle over a short window, from
    /proc/stat (all cpus; steal counts as busy). The PRIMARY quiet-box
    witness: unlike loadavg -- which this kernel reports as 3.7-5.2
    with /proc/stat showing 99.97% idle (phantom load, measured round
    14) -- this is a direct measurement of actual contention inside
    the box. None on platforms without /proc/stat (falls back to the
    loadavg rule)."""
    try:

        def snap() -> tuple[int, int]:
            with open("/proc/stat") as f:
                vals = [int(x) for x in f.readline().split()[1:]]
            return vals[3] + vals[4], sum(vals)  # idle+iowait, total

        i0, t0 = snap()
        time.sleep(interval)
        i1, t1 = snap()
        dt = t1 - t0
        if dt <= 0:
            return None
        return round(1.0 - (i1 - i0) / dt, 3)
    except (OSError, ValueError, IndexError):
        return None


def _artifact_quiet(obj: dict) -> bool:
    """Whether a bench artifact self-reports as a quiet-box run.
    Legacy artifacts without a load_summary are accepted (no witness
    either way); new artifacts always embed one."""
    s = obj.get("load_summary")
    if not isinstance(s, dict):
        return True
    return bool(s.get("quiet", True))


def _previous_round_bench(
    sf: str | None = None,
    repeat: int | None = None,
    agg: str | None = None,
) -> tuple[str, dict] | None:
    """Previous full-run numbers to adjudicate movers against.

    Prefers bench.py's OWN last full artifact (written by every
    non---only run): the driver's BENCH_r{N}.json wrapper archives only
    a 2000-char stdout tail, so its ``parsed``/``queries`` can be empty
    and the mover comparison would silently no-op (it did for two
    rounds). Falls back to the newest driver wrapper's parsed block.

    ADVICE r12: the local artifact is used ONLY when its recorded
    sf/repeat/agg match the current run's settings -- a locally-run
    config-varied bench (e.g. ``--sf 0.01``) must not contaminate the
    next driver run's mover adjudication with incomparable timings.

    VERDICT r13 #1: the local artifact is additionally used only when
    its embedded load_summary says the box was QUIET at suite start --
    the round-13 driver run was recorded under a rival JVM (load1m
    3.5-9.1) and adjudicating against those inflated times would let
    real regressions up to ~1.3x hide. A disqualified local artifact
    falls back to the committed quiet-box snapshot REGISTRY_BENCH.json
    (same comparability rules), then to the driver wrapper."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))

    def _comparable(obj: dict) -> bool:
        return (
            (sf is None or str(obj.get("sf")) == str(sf))
            and (repeat is None or obj.get("repeat") == repeat)
            and (agg is None or obj.get("agg") == agg)
        )

    local = os.path.join(here, LOCAL_ARTIFACT)
    try:
        with open(local) as f:
            obj = json.load(f)
        if obj.get("queries") and _comparable(obj) and _artifact_quiet(obj):
            return LOCAL_ARTIFACT, obj
        if obj.get("queries") and not _comparable(obj):
            print(
                f"# {LOCAL_ARTIFACT} was produced at sf={obj.get('sf')} "
                f"repeat={obj.get('repeat')} agg={obj.get('agg')!r}; "
                "current run differs -- falling back for mover "
                "adjudication",
                file=sys.stderr,
            )
        elif obj.get("queries"):
            print(
                f"# {LOCAL_ARTIFACT} self-reports a LOADED box "
                f"({obj.get('load_summary')}); falling back for mover "
                "adjudication",
                file=sys.stderr,
            )
    except (OSError, json.JSONDecodeError):
        pass
    # committed quiet-box snapshot (frozen by gen_registry.py, which
    # refuses load-disqualified runs -- quiet by construction)
    try:
        with open(os.path.join(here, BENCH_SNAPSHOT)) as f:
            snap = json.load(f)
        if snap.get("queries") and _comparable(snap):
            return BENCH_SNAPSHOT, snap
    except (OSError, json.JSONDecodeError):
        pass
    best, best_n = None, -1
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    if best is None:
        return None
    try:
        with open(best) as f:
            obj = json.load(f)
        # driver wrapper: per-query numbers live under "parsed"
        if "parsed" in obj and isinstance(obj["parsed"], dict):
            obj = obj["parsed"]
        return os.path.basename(best), obj
    except (OSError, json.JSONDecodeError):
        return None


def _isolated_rerun(movers: list[str], repeat: int) -> dict:
    """Re-time flagged entries in a FRESH JVM (one subprocess, block
    state reset between entries, min-of-N) -- the mechanical
    adjudication VERDICT r9 #2 asked for: in-suite heap aging produced
    2-4x phantom swings three rounds running, each needing a manual
    isolated re-run to dismiss. Returns {name: seconds} (empty on any
    subprocess failure -- the suite record must never be lost to the
    adjudicator)."""
    import subprocess

    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--only", *movers, "--repeat", str(max(repeat, 3)), "--agg", "min",
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800
        )
        line = proc.stdout.strip().splitlines()[-1]
        return json.loads(line).get("queries", {})
    except Exception as exc:  # noqa: BLE001 - record-and-continue
        print(f"# isolated rerun FAILED: {exc}", file=sys.stderr)
        return {}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")),
        help="runs per query; reported figure is --agg over runs",
    )
    ap.add_argument(
        "--agg",
        choices=("min", "mean"),
        default="min",
        help="per-query aggregate over the repeated runs",
    )
    ap.add_argument(
        "--only",
        nargs="+",
        metavar="NAME",
        help="run only these entries (isolated-adjudication child mode: "
        "no pipeline_e2e unless named, no recursive isolation)",
    )
    ap.add_argument(
        "--no-isolate",
        action="store_true",
        help="skip the automatic fresh-JVM re-run of >1.5x movers",
    )
    args = ap.parse_args()
    repeat = max(1, args.repeat)
    agg = (
        min if args.agg == "min" else (lambda xs: sum(xs) / len(xs))
    )

    spark = get_spark(app_name="bench")
    # Fault isolation: one failing query must never erase the whole perf
    # record (round-2 lesson: a single loader bug aborted the suite at q22
    # and left BENCH_r02 empty). Failures are recorded in "errors" and the
    # summary JSON line is always emitted with rc=0. The warmup gets the
    # SAME treatment (ADVICE r3): a warmup crash degrades the numbers to
    # cold-start but still produces the full record.
    def load1m() -> float | None:
        # 1-minute loadavg: the phantom-host-load witness (VERDICT r11
        # #4). Sampled around each entry so the artifact adjudicates
        # its own slow runs instead of needing a prose explanation.
        try:
            return round(os.getloadavg()[0], 1)
        except OSError:
            return None

    # ADVICE r12: default to the real core count, not a hardcoded 32 --
    # on a smaller host the elevated-load rule (load > 1.25*cpus) would
    # otherwise silently never fire. The value used is recorded in the
    # artifact as "load_cpus".
    cpus = int(
        os.environ.get("SPARK_GRAFT_CPUS") or (os.cpu_count() or 32)
    )
    timings: dict[str, float] = {}
    loads: dict[str, float] = {}
    errors: dict[str, str] = {}
    # sampled BEFORE any bench work: the quiet-box witnesses (VERDICT
    # r13 #1) -- busy fraction is primary, start load the fallback
    start_busy = _cpu_busy_frac()
    start_load = load1m()
    try:
        warmup(spark)
    except Exception as exc:  # noqa: BLE001 - record-and-continue, see above
        errors["warmup"] = f"{type(exc).__name__}: {exc}"[:500]
        print(f"# warmup FAILED (numbers will be cold): {exc}", file=sys.stderr)
    try:
        reset_block_state(spark)
    except Exception as exc:  # noqa: BLE001
        errors["reset_block_state"] = f"{type(exc).__name__}: {exc}"[:500]
    headline = HEADLINE
    run_pipeline_bench = True
    if args.only:
        headline = [n for n in args.only if n != "pipeline_e2e_2runs"]
        unknown = [n for n in headline if n not in REGISTRY]
        if unknown:
            print(f"# unknown --only entries: {unknown}", file=sys.stderr)
            headline = [n for n in headline if n in REGISTRY]
        run_pipeline_bench = "pipeline_e2e_2runs" in args.only
    if run_pipeline_bench:
        try:
            runs = [bench_pipeline_e2e(spark) for _ in range(repeat)]
            timings["pipeline_e2e_2runs"] = round(agg(runs), 3)
            print(
                f"# pipeline_e2e_2runs: {timings['pipeline_e2e_2runs']:.3f}s "
                f"({args.agg} of {runs})",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001 - see above
            errors["pipeline_e2e_2runs"] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# pipeline_e2e_2runs FAILED: {exc}", file=sys.stderr)
    for name in headline:
        try:
            fn = REGISTRY[name].fn
            runs, n = [], 0
            peak_load = load1m()
            for _ in range(repeat):
                reset_block_state(spark)
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                n = df.count()
                runs.append(time.perf_counter() - t0)
                sample = load1m()
                if sample is not None:
                    peak_load = max(peak_load or 0.0, sample)
            if peak_load is not None:
                loads[name] = peak_load
            timings[name] = round(agg(runs), 3)
            print(
                f"# {name}: {timings[name]:.3f}s ({n} rows; {args.agg} of "
                f"{[round(r, 3) for r in runs]})",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name} FAILED: {exc}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Key ORDER is load-bearing (VERDICT r10 #2 + r12 #2): the driver
    # archives only the last 2000 chars of stdout, so the bulky blocks go
    # FIRST and every gate-relevant field goes LAST. Within the bulky
    # blocks, the loadavg map rides BEFORE the per-entry seconds map so
    # a tail window shows unambiguously-labeled TIMINGS, not load
    # samples masquerading as timings (VERDICT r12 misread BENCH_r12's
    # tail exactly that way).
    samples = sorted(loads.values())
    if start_busy is not None:
        # primary witness: direct /proc/stat contention measurement
        quiet = start_busy <= QUIET_BUSY_FRAC
    else:
        # fallback: start loadavg (phantom-load-prone on this kernel)
        quiet = start_load is None or start_load <= _quiet_start_threshold(
            cpus
        )
    load_summary = {
        "start_busy_frac": start_busy,
        "start_load1m": start_load,
        "median_load1m": samples[len(samples) // 2] if samples else None,
        "max_load1m": samples[-1] if samples else None,
        "cpus": cpus,
        # quiet-box qualification: decided at SUITE START (the suite's
        # own work dominates every mid-run sample)
        "quiet": quiet,
    }
    out = {
        # per-entry peak 1-min loadavg -- context samples, NOT timings
        "load1m_per_entry": loads,
        "load_cpus": cpus,
        # per-entry wall seconds (the real numbers)
        "queries": timings,
    }
    if errors:
        out["errors"] = errors
    if not args.only and not args.no_isolate:
        prev = _previous_round_bench(sf=sf, repeat=repeat, agg=args.agg)
        if prev is not None:
            prev_name, prev_obj = prev
            prev_q = prev_obj.get("queries", {})

            def _suspect(n: str, t: float) -> bool:
                # >1.5x always adjudicates; >1.3x adjudicates when the
                # box was visibly oversubscribed during the entry
                # (loadavg above the executor thread count) -- the
                # hand-rule VERDICT r11 #4 asked to mechanize
                ratio = max(t / prev_q[n], prev_q[n] / t)
                if ratio > 1.5:
                    return True
                elevated = loads.get(n, 0.0) > 1.25 * cpus
                return ratio > 1.3 and elevated

            movers = sorted(
                n
                for n, t in timings.items()
                if n in prev_q and prev_q[n] > 0 and t > 0 and _suspect(n, t)
            )[:12]  # bound the adjudication cost
            out["prev_bench"] = prev_name
            if movers:
                print(
                    f"# >1.5x movers vs {prev_name}: {movers}; "
                    "re-timing in a fresh JVM...",
                    file=sys.stderr,
                )
                out["isolated"] = _isolated_rerun(movers, repeat)
            # isolated_flagged rides with the trailing summary block so
            # the driver's tail window always shows it
            out["isolated_flagged"] = movers
    out.update(
        {
            "metric": "headline_suite_seconds",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "shared_total": round(
                sum(t for n, t in timings.items() if n in SHARED_24), 3
            ),
            "pipeline_e2e_2runs": timings.get("pipeline_e2e_2runs"),
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "repeat": repeat,
            "agg": args.agg,
            # rides in the tail so the driver's 2000-char window always
            # shows whether this run is a valid quiet-box reference
            "load_summary": load_summary,
            # self-description for tail readers (VERDICT r12 #2): the
            # "queries" map is SECONDS; "load1m_per_entry" is loadavg
            "note": (
                "'queries' values are wall seconds per entry; "
                "'load1m_per_entry' values are 1-min loadavg samples"
            ),
            "see": LOCAL_ARTIFACT,
        }
    )
    if not args.only:
        # persist the FULL record locally: the driver archives only a
        # stdout tail, and next round's mover adjudication needs every
        # per-query number (see _previous_round_bench)
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, LOCAL_ARTIFACT), "w") as f:
                json.dump(out, f)
        except OSError as exc:
            print(f"# local artifact write failed: {exc}", file=sys.stderr)
    print(json.dumps(out))
    # FINAL stdout line: a compact summary guaranteed to fit inside the
    # driver's ~2000-char tail window (VERDICT r14 #2 -- BENCH_r14.json
    # came back `parsed: null` because the full line above is ~8 KB and
    # the tail cut decapitated it). The driver parses the LAST line, so
    # this one carries every gate-relevant field; the full per-entry
    # record stays in the line above and in LOCAL_ARTIFACT.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    compact = {
        "metric": "headline_suite_seconds",
        "value": out["value"],
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in slowest.items()},
        "sf": out["sf"],
        "n_entries": len(timings),
        "n_errors": len(errors),
        "shared_total": out["shared_total"],
        "pipeline_e2e_2runs": out["pipeline_e2e_2runs"],
        "repeat": repeat,
        "agg": args.agg,
        "quiet": load_summary["quiet"],
        "start_busy_frac": start_busy,
        "isolated_flagged": out.get("isolated_flagged", []),
        "note": "top-10 slowest only; full per-entry map in " + LOCAL_ARTIFACT,
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # hard guarantee: never outgrow the tail window
        compact.pop("queries", None)
        compact["isolated_flagged"] = compact["isolated_flagged"][:5]
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
