#!/usr/bin/env python
"""End-to-end data-quality / drift-monitoring workflow: the audit-side
operators chained the way a production ingest gate runs them.

Usage:
    python examples/data_quality_pipeline.py [sf_dir]

Stages (each oracle- or test-verified on its own):

  1. constraint audit    single-pass check suite + PK    constraints.constraint_report
                         + FK scorecard
  2. row quarantine      the same predicates as row      robust.validate_rows
                         dataflow (split, not count)
  3. profile             equi-width + equi-depth         sketch.*_histogram
                         histograms, KMV distinct
  4. drift               vocabulary chi-square + score   text.vocabulary_drift
                         KS between two sources          text.score_distribution_drift
  5. outliers            robust MAD flagging on the      timeseries.mad_outliers
                         event stream
  6. distinct monitor    HLL registers (MAX-mergeable)   sketch.hll_distinct
                         with in-gate error
  7. temporal structure  daily-series autocorrelation    timeseries.acf
                         + Markov transition baseline    funnel.markov_transitions
  8. shuffle preflight   join-key skew profile + exact   constraints.key_skew_profile
                         self-join output cardinality    constraints.join_explosion_preflight
  9. eval gates          langid per-class PRF +          constraints.classification_report
                         dedup-cluster pair scoring      constraints.clustering_pair_eval
                         (note: unmarked corpus text is English-shaped, so the
                         langid gate SHOWS a failing classifier here -- per-class
                         recall 0 is the gate doing its job, see z184 for the
                         marker-injected variant)

Prints one JSON line per stage. Shuffle budget: the whole scalar-check
suite is ONE aggregate pass (1); quarantine is two pushed-down filters
over one scan (2); histograms are 1-row bounds/cuts broadcasts + one
group count, KMV is a k x 8-byte sketch per group (3); drift reduces to
vocabulary- / distinct-score-bounded intermediates (4); MAD joins two
group-bounded percentile sides back (5).
"""

import json
import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from etl_world_banks_with_python_and_postgresql_spark.operators import constraints as C  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.operators import sketch as S  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.operators import text as T  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.operators.timeseries import (  # noqa: E402
    mad_outliers,
)
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.sources.robust import (  # noqa: E402
    validate_rows,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark()
    emit = lambda stage, **kw: print(json.dumps({"stage": stage, **kw}))  # noqa: E731

    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    docs = load(spark, "documents", sf_dir)
    events = load(spark, "events", sf_dir)

    # 1. constraint scorecard
    report = C.constraint_report(
        li,
        checks={
            "qty_positive": F.col("l_quantity") > 0,
            "discount_range": F.col("l_discount").between(0.0, 0.08),
        },
        unique_keys={"pk": ["l_orderkey", "l_linenumber"]},
        foreign_keys={"fk_orders": (orders, {"l_orderkey": "o_orderkey"})},
    ).collect()
    emit(
        "constraint_audit",
        results={r["constraint"]: int(r["n_violations"]) for r in report},
    )

    # 2. quarantine the same predicates as row dataflow
    good, bad = validate_rows(
        li,
        {
            "qty_positive": F.col("l_quantity") > 0,
            "discount_range": F.col("l_discount").between(0.0, 0.08),
        },
    )
    emit("quarantine", good=good.count(), quarantined=bad.count())

    # 3. numeric profile
    widths = S.equi_width_histogram(li, "l_extendedprice", n_bins=10).count()
    depths = S.equi_depth_histogram(orders, "o_totalprice", n_bins=10).count()
    kmv = {
        r["source"]: int(r["est_distinct"])
        for r in S.kmv_distinct(docs, "text", group_by="source")
        .orderBy("source")
        .limit(3)
        .collect()
    }
    emit("profile", width_bins=widths, depth_bins=depths, kmv_sample=kmv)

    # 4. drift between two corpus slices
    chi = T.vocabulary_drift(docs, "src0", "src1", k=5).collect()
    ks = T.score_distribution_drift(docs, "src0", "src1").collect()[0]
    emit(
        "drift",
        top_chi2_terms=[[r["term"], r["chi2"]] for r in chi],
        ks_d=ks["ks_d"],
    )

    # 5. robust outliers on the event stream
    out = mad_outliers(events).count()
    emit("outliers", n_flagged=out)

    # 6. streaming-friendly distinct monitoring: HLL registers (1 byte
    # per register, MAX-mergeable across days) with the in-gate error
    hll = {
        r["source"]: [int(r["est_distinct"]), int(r["exact_distinct"])]
        for r in S.hll_distinct(docs, "text", p=6, group_by="source")
        .orderBy("source")
        .limit(3)
        .collect()
    }
    emit("hll_distinct", est_vs_exact_sample=hll)

    # 7. temporal structure diagnostics: ACF of each event type's daily
    # series (memory/seasonality check behind drift monitors' iid
    # assumption) + the first-order transition matrix as a behavioral
    # baseline to diff release-over-release
    from etl_world_banks_with_python_and_postgresql_spark.operators.funnel import (
        markov_transitions,
    )
    from etl_world_banks_with_python_and_postgresql_spark.operators.timeseries import (
        acf,
    )

    a = (
        acf(events, group_by="event_type", max_lag=3)
        .filter(F.col("event_type") == "click")
        .orderBy("lag")
        .collect()
    )
    trans = markov_transitions(events).count()
    emit(
        "temporal",
        click_acf_micros=[[r["lag"], r["acf_micros"]] for r in a],
        transition_cells=trans,
    )

    # 8. pre-shuffle capacity planning: per-key skew profile of the
    # fact table's candidate join keys + the exact output cardinality
    # of the explosion-prone co-purchase SELF-join, computed WITHOUT
    # running it (two count aggregates instead of the join)
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        join_explosion_preflight,
        key_skew_profile,
    )

    skew = {
        r["col"]: [r["n_keys"], r["max_share_micros"], r["skew_x_micros"]]
        for r in key_skew_profile(
            li, ["l_orderkey", "l_partkey", "l_returnflag"]
        ).collect()
    }
    pf = join_explosion_preflight(
        li.select("l_orderkey"), li.select("l_orderkey"),
        "l_orderkey", "l_orderkey",
    ).collect()[0]
    emit(
        "shuffle_preflight",
        skew=skew,
        copurchase_join_rows=pf["join_rows"],
        amplification_micros=pf["amplification_micros"],
    )

    # 9. model-in-the-loop eval gates: langid per-class PRF against the
    # lang labels (classification), and the dedup fingerprint clusters
    # scored against source labels by pair-counting (clustering) -- the
    # exact-micros eval tables a regression gate diffs release-over-
    # release
    from etl_world_banks_with_python_and_postgresql_spark.functions.xhash import (
        ws_tokens,
    )
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        classification_report,
        clustering_pair_eval,
    )

    pred = T.with_lang_id(docs, keep_cols=["lang"])
    prf = {
        r["class"]: [r["support"], r["precision_micros"], r["recall_micros"]]
        for r in classification_report(pred, "lang", "pred_lang").collect()
    }
    clusters = docs.select(
        F.md5(
            F.array_join(F.slice(ws_tokens(F.col("text")), 1, 5), " ")
        ).alias("cluster"),
        F.col("source").alias("truth"),
    )
    pe = clustering_pair_eval(clusters, "cluster", "truth").collect()[0]
    emit(
        "eval_gates",
        langid_prf=prf,
        dedup_pair_f1_micros=pe["f1_micros"],
        dedup_ari_micros=pe["ari_micros"],
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
