"""Unit tests for operators not (fully) covered by the oracle registry:
enrichment join, LSH-bucketed ANN recall, sinks (truncate/config), JDBC
merge statement, stateful streaming operator.
"""

import json
import math
import random

from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.operators.enrich import (
    enrich_market_caps,
)
from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
    cosine_topk,
    lsh_bucketed_topk,
)
from etl_world_banks_with_python_and_postgresql_spark.pipeline import load_config
from etl_world_banks_with_python_and_postgresql_spark.sources import sinks
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


def test_enrich_market_caps(spark):
    banks = spark.createDataFrame(
        [("Bank A", 100.0), ("Bank B", 250.5)], "bank_name string, market_cap_usd double"
    )
    rates = spark.createDataFrame(
        [("GBP", 0.8), ("EUR", 0.9), ("INR", 83.0), ("JPY", 150.0)],
        "currency string, exchange_rate double",
    )
    out = enrich_market_caps(banks, rates)
    rows = {r["bank_name"]: r for r in out.collect()}
    assert rows["Bank A"]["MC_GBP_Billion"] == 80.0
    assert rows["Bank A"]["MC_EUR_Billion"] == 90.0
    assert rows["Bank A"]["MC_INR_Billion"] == 8300.0
    assert rows["Bank B"]["MC_GBP_Billion"] == round(250.5 * 0.8, 2)
    assert "JPY" not in out.columns  # only requested currencies project


def test_enrich_missing_currency_yields_null(spark):
    banks = spark.createDataFrame([("Bank A", 100.0)], "bank_name string, market_cap_usd double")
    rates = spark.createDataFrame([("GBP", 0.8)], "currency string, exchange_rate double")
    row = enrich_market_caps(banks, rates).collect()[0]
    assert row["MC_GBP_Billion"] == 80.0
    assert row["MC_EUR_Billion"] is None


def test_lsh_topk_recall_vs_exact(spark):
    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=5)
    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(3)]
    approx = lsh_bucketed_topk(emb, queries, planes, k=5)

    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert a  # produces candidates
    # approx results are a subset of the scored space and reasonably overlap
    recall = len(e & a) / len(e)
    assert recall > 0.15  # 3 planes -> 8 cells over ~50 vectors; loose bound
    # every approx hit must carry the same score as the exact computation
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact.collect()
    }
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert math.isclose(r["cos_sim"], exact_scores[key], abs_tol=1e-9)


def test_truncate_and_config(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10).write.parquet(p)
    assert spark.read.parquet(p).count() == 10
    sinks.truncate(p)
    import os

    assert not os.path.exists(p)

    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps({"host": "db", "port": 5432}))
    cfg = load_config(str(cfg_path))
    assert cfg == {"host": "db", "port": 5432}


def test_jdbc_merge_sql():
    stmt = sinks.jdbc_merge_sql(
        "etl.staging_rates",
        "etl.exchanges_rates",
        keys=["country", "currency", "year"],
        set_cols=["exchange_rate", "batch_id"],
    )
    assert "MERGE INTO etl.exchanges_rates t USING etl.staging_rates s" in stmt
    assert "t.country = s.country AND t.currency = s.currency" in stmt
    assert "WHEN MATCHED THEN UPDATE SET exchange_rate = s.exchange_rate" in stmt
    assert "WHEN NOT MATCHED THEN INSERT" in stmt


def test_stateful_running_totals(spark, tmp_path):
    from etl_world_banks_with_python_and_postgresql_spark.streaming.stateful import (
        running_user_totals,
    )

    src = str(tmp_path / "ev")
    ev = load(spark, "events", SF).select("user_id", "value", "ts")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM state_out").collect()
    }
    expect = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got.keys() == expect.keys()
    for k in expect:
        assert got[k][0] == expect[k][0]
        assert math.isclose(got[k][1], expect[k][1], rel_tol=1e-9)


def test_ivf_topk_recall_vs_exact(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        ivf_topk,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, n_centroids=8, n_probe=4, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert a
    recall = len(e & a) / len(e)
    assert recall > 0.3  # probing half the cells


def test_ivf_kmeans_centroids_recall(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    cents = kmeans_centroids(emb, n_centroids=8, n_iter=3)
    assert len(cents) == 8 and all(len(c) == len(cents[0]) for c in cents)
    trained = ivf_topk(emb, queries, n_probe=4, k=5, centroids=cents)
    a_trained = {(r["query_id"], r["neighbor_id"]) for r in trained.collect()}
    stride = ivf_topk(emb, queries, n_centroids=8, n_probe=4, k=5)
    a_stride = {(r["query_id"], r["neighbor_id"]) for r in stride.collect()}

    r_trained = len(e & a_trained) / len(e)
    r_stride = len(e & a_stride) / len(e)
    # trained cells must at least hold the sampled-centroid recall
    # (small-data ties allowed; the win shows up as corpus size grows)
    assert r_trained >= r_stride - 0.05, (r_trained, r_stride)
    assert r_trained > 0.3


def test_streaming_dedup(spark, tmp_path):
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_dedup,
    )

    src = str(tmp_path / "dups")
    ev = load(spark, "events", SF).select("event_id", "ts", "user_id")
    dup = ev.union(ev)  # every event twice
    dup.write.parquet(src)
    stream = spark.readStream.schema(dup.schema).parquet(src)
    q = (
        streaming_dedup(stream, keys=["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0]["n"]
    assert n == ev.count()


def test_approx_sketches_within_tolerance(spark):
    from etl_world_banks_with_python_and_postgresql_spark.plans.queries import REGISTRY

    approx = {
        r["l_returnflag"]: r
        for r in REGISTRY["q51_approx_sketches"].fn(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load(spark, "lineitem", SF)
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.05
        assert abs(a["approx_median_price"] - e["median"]) / e["median"] < 0.05


def test_minibatch_kmeans_recall_and_cost(spark):
    """Mini-batch centroids must reach comparable recall to full Lloyd at a
    fraction of the scanned rows, stay deterministic, and preserve shape."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
        minibatch_kmeans_centroids,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    mb = minibatch_kmeans_centroids(emb, n_centroids=8, n_iter=8, sample_mod=4)
    assert len(mb) == 8 and all(len(c) == len(mb[0]) for c in mb)
    # deterministic across runs
    assert mb == minibatch_kmeans_centroids(emb, n_centroids=8, n_iter=8, sample_mod=4)

    full = kmeans_centroids(emb, n_centroids=8, n_iter=3)

    def recall(cents):
        a = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(emb, queries, n_probe=4, k=5, centroids=cents).collect()
        }
        return len(e & a) / len(e)

    r_mb, r_full = recall(mb), recall(full)
    # comparable quality: mini-batch within 15 points of full Lloyd, and
    # well above the probe floor
    assert r_mb >= r_full - 0.15, (r_mb, r_full)
    assert r_mb > 0.3


def test_ivf_recall_curve_monotone_scan(spark):
    """The tuning harness: more probes -> recall never decreases, and the
    curve reports the scan fraction each setting pays."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        ivf_recall_curve,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    curve = ivf_recall_curve(emb, queries, n_probes=(1, 4, 8), n_centroids=8, k=5)
    assert [c["n_probe"] for c in curve] == [1, 4, 8]
    recalls = [c["recall"] for c in curve]
    assert recalls == sorted(recalls), recalls  # monotone non-decreasing
    assert curve[-1]["recall"] == 1.0  # probing all cells == exact
    assert curve[0]["scan_frac"] == 0.125


def test_multimodal_frame_sampling_law(spark):
    """Frames per doc = min(max_frames, ceil(bytes/frame_size)); bytes
    round-trip exactly for the first frame."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import multimodal

    docs = multimodal.attach_fake_binary(load(spark, "documents", SF)).limit(50)
    frames = multimodal.sample_frames(docs, frame_size=100, max_frames=4)
    got = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    import math
    for r in docs.select("doc_id", F.octet_length("payload").alias("nb")).collect():
        expect = min(4, max(1, math.ceil(r["nb"] / 100)))
        assert got[r["doc_id"]] == expect, r
    # first frame bytes == payload prefix
    f0 = {r["doc_id"]: bytes(r["frame_bytes"])
          for r in frames.filter(F.col("frame_idx") == 0).collect()}
    for r in docs.select("doc_id", "payload").collect():
        assert f0[r["doc_id"]] == bytes(r["payload"])[:100]


def test_multimodal_feature_ann_pipeline(spark):
    """binary -> byte-histogram embedding -> cosine top-k: embeddings are
    unit-ish (L1-normalized), deterministic, and identical texts are each
    other's nearest neighbors at cosine 1.0."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import multimodal
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        cosine_topk,
    )

    docs = multimodal.attach_fake_binary(load(spark, "documents", SF))
    feats = multimodal.byte_histogram_features(docs)
    row = feats.limit(1).collect()[0]
    assert len(row["embedding"]) == 64
    assert abs(sum(row["embedding"]) - 1.0) < 1e-9  # L1 normalized

    # determinism across evaluations
    a = {r["doc_id"]: tuple(r["embedding"]) for r in feats.collect()}
    b = {r["doc_id"]: tuple(r["embedding"]) for r in feats.collect()}
    assert a == b

    # exact duplicate texts => cosine 1.0 neighbors
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        exact_duplicates,
    )
    dups = exact_duplicates(load(spark, "documents", SF)).filter("n_copies > 1")
    if dups.count() > 0:
        q = feats.join(dups.select(F.col("keep_id").alias("doc_id")), "doc_id")
        top = cosine_topk(feats, q, k=1, id_col="doc_id", vec_col="embedding")
        assert all(r["cos_sim"] == 1.0 for r in top.collect())


def test_redact_pii_edge_cases(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import redact_pii

    rows = [
        (0, "mail a.b-c_1%d+e@sub.domain.co and digits 1234567 done"),
        (1, "short digits 12345 stay; 999999 goes"),
        (2, "no pii here"),
        (3, "two mails x@y.io z@w.ai and 0000001"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["n_emails"] == 1 and got[0]["n_long_numbers"] == 1
    assert got[0]["redacted"] == "mail <EMAIL> and digits <NUM> done"
    # 5-digit run survives, 6-digit run is masked
    assert got[1]["n_long_numbers"] == 1
    assert got[1]["redacted"] == "short digits 12345 stay; <NUM> goes"
    assert got[2]["n_emails"] == 0 and got[2]["n_long_numbers"] == 0
    assert got[2]["redacted"] == "no pii here"
    # email digits must not double-count as digit runs
    assert got[3]["n_emails"] == 2 and got[3]["n_long_numbers"] == 1
    assert got[4]["redacted"] == ""


def test_ngram_contamination_exact(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        ngram_contamination,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = 1 gram
    train = spark.createDataFrame(
        [
            (10, base + " iota"),          # shares grams with eval doc 1
            (11, "totally different words here that never overlap at all"),
            (12, base),                    # the full eval gram itself
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(1, base + " iota kappa")], ["doc_id", "text"])
    got = {r["doc_id"]: r["n_shared_grams"] for r in
           ngram_contamination(train, ev, n=8).collect()}
    # doc 10: grams {base, base[1:]+iota} both in eval; doc 12: only base
    assert got == {10: 2, 12: 1}


def test_ngram_contamination_short_docs(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        ngram_contamination,
    )

    # fewer than n tokens on either side must contribute nothing (guarded
    # shingle construction -- no fabricated descending-sequence grams)
    train = spark.createDataFrame([(1, "only three words")], ["doc_id", "text"])
    ev = spark.createDataFrame([(2, "only three words")], ["doc_id", "text"])
    assert ngram_contamination(train, ev, n=8).count() == 0


def test_duplicate_clusters_known_graph(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        duplicate_clusters,
    )

    # chain 1-2-3 (transitive: 1~3 never emitted as a pair), clique {7,8},
    # isolated pair {5,9}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (5, 9)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 5: 5, 9: 5}


def test_duplicate_clusters_raises_on_max_iter(spark):
    import pytest as _pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        duplicate_clusters,
    )

    # a path graph of diameter 4 cannot converge in 1 iteration
    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(path, max_iter=1)
    # but does converge given room, to the path's min label
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(path, max_iter=10).collect()}
    assert set(got.values()) == {1}


def test_duplicate_clusters_quarantine_mode(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        duplicate_clusters,
    )

    # one long chain (won't converge in 2 rounds) + one already-tight
    # clique pair (converges immediately)
    chain = [(i, i + 1) for i in range(1, 12)]
    pairs = spark.createDataFrame(
        chain + [(100, 101)], "doc_a long, doc_b long"
    )
    rows = duplicate_clusters(
        pairs, max_iter=2, on_nonconverged="quarantine"
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert set(by_id) == set(range(1, 13)) | {100, 101}

    # the finished component is trusted and carries its final cluster id
    assert by_id[100]["converged"] and by_id[101]["converged"]
    assert by_id[100]["cluster_id"] == 100 and by_id[101]["cluster_id"] == 100

    # the chain is (partly) unfinished; every converged=true row must
    # already carry its FINAL cluster id (= full-convergence result)
    final = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, max_iter=40).collect()
    }
    assert any(not r["converged"] for r in rows)  # quarantine non-empty
    for r in rows:
        if r["converged"]:
            assert r["cluster_id"] == final[r["doc_id"]], r

    # converged runs keep the same schema in quarantine mode
    done = duplicate_clusters(
        spark.createDataFrame([(1, 2)], "doc_a long, doc_b long"),
        on_nonconverged="quarantine",
    )
    assert done.columns == ["doc_id", "cluster_id", "converged"]
    assert all(r["converged"] for r in done.collect())


def test_duplicate_clusters_converges_within_diameter_rounds(spark):
    """Iteration-bound pin: min-label propagation needs <= diameter + 1
    rounds; a diameter-6 path must converge with max_iter=7."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        duplicate_clusters,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(path, max_iter=8).collect()}
    assert set(got.values()) == {1}


def test_resample_ffill_no_invented_history(spark):
    from datetime import datetime

    from etl_world_banks_with_python_and_postgresql_spark.operators.timeseries import (
        resample_ffill,
    )

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 3, 9, 0), 10.0),
            (1, datetime(2024, 1, 3, 15, 0), 20.0),  # same bucket -> mean 15
            (1, datetime(2024, 1, 5, 9, 0), 40.0),
            (2, datetime(2024, 1, 1, 1, 0), 7.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = resample_ffill(ev, "2024-01-01", "2024-01-06")
    got = {
        (r["user_id"], r["bucket"].day): (r["value_ffill"], r["is_observed"])
        for r in out.collect()
    }
    assert len(got) == 12  # 2 users x 6 days
    # leading gap stays NULL, observed bucket averages, gaps carry forward
    assert got[(1, 1)] == (None, False)
    assert got[(1, 3)] == (15.0, True)
    assert got[(1, 4)] == (15.0, False)
    assert got[(1, 5)] == (40.0, True)
    assert got[(1, 6)] == (40.0, False)
    assert got[(2, 6)] == (7.0, False)


def test_write_jsonl_shards(spark, tmp_path):
    """Sharded JSONL export: row-bounded files, lossless round trip."""
    import glob

    from etl_world_banks_with_python_and_postgresql_spark.sources.sinks import (
        write_jsonl_shards,
    )

    docs = load(spark, "documents", SF).select("doc_id", "text", "source")
    out = str(tmp_path / "shards")
    write_jsonl_shards(docs.repartition(4), out, docs_per_shard=60)
    files = glob.glob(f"{out}/part-*.json")
    assert len(files) >= 8  # 500 rows / 60-cap across 4 writers
    # every shard respects the cap
    for f in files:
        with open(f) as fh:
            assert sum(1 for _ in fh) <= 60
    back = spark.read.json(out)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_ivf_indexed_matches_inmemory_and_prunes(spark, tmp_path):
    """write_ivf_index + ivf_topk_indexed: identical results to ivf_topk
    with the same centroids, and the scan partition-prunes to the probed
    cells (directory-level pruning -- the at-rest 100 TB ANN story)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_indexed,
        write_ivf_index,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    path = str(tmp_path / "ivf_index")
    cents = write_ivf_index(emb, path, n_centroids=8)

    indexed = ivf_topk_indexed(spark, path, queries, n_probe=2, k=5)
    inmem = ivf_topk(emb, queries, n_probe=2, k=5, centroids=cents)
    assert sorted(map(tuple, indexed.collect())) == sorted(
        map(tuple, inmem.collect())
    )

    # the probe filter reaches the scan as a partition filter, and with
    # n_probe=1 a single query must touch exactly one cell directory
    one_q = emb.filter(F.col("vec_id") == 0)
    df = ivf_topk_indexed(spark, path, one_q, n_probe=1, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    # one probed cell -> a literal equality (Catalyst folds IN (x) to = x)
    assert m and re.search(r"cell#\d+ = \d+", m.group(1)), plan


def test_cosine_neardup_banded_recall_on_planted_dups(spark):
    """Banded sign-LSH must recover planted high-cosine near-duplicates
    (the production regime: thresholds 0.9+, where the S-curve puts recall
    near 1) and must agree with the exact all-pairs mode on them."""
    import random

    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    rng = random.Random(7)
    dim = 32
    rows = []
    for i in range(60):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, v))
        if i % 3 == 0:  # plant a tiny-perturbation duplicate
            rows.append((1000 + i, [x + rng.gauss(0, 0.01) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_neardup_pairs(df, threshold=0.9, bands=None).collect()
    }
    banded = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_neardup_pairs(
            df, threshold=0.9, bands=12, bits_per_band=6, dim=dim
        ).collect()
    }
    planted = {(i, 1000 + i) for i in range(0, 60, 3)}
    assert planted <= exact
    assert banded <= exact  # verify step: no false positives ever
    assert len(banded & planted) / len(planted) >= 0.95  # S-curve recall


def test_chunk_windows_cover_and_reconstruct(spark):
    """Chunking invariants: every token index is covered, consecutive
    chunks overlap by exactly window-stride (except a short tail), and
    stride-aligned reassembly reconstructs the token stream."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        chunk_token_windows,
    )

    docs = load(spark, "documents", SF).limit(50)
    window, stride = 16, 12
    out = chunk_token_windows(docs, window=window, stride=stride).collect()
    toks = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in docs.collect()
    }
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(toks)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        n = len(toks[doc_id])
        # starts march at the stride; every token covered; last chunk
        # reaches the end exactly once
        for i, r in enumerate(chunks):
            assert r["start_token"] == i * stride
            got = r["chunk_text"].split()
            expect = toks[doc_id][r["start_token"] : r["start_token"] + window]
            assert got == expect
            assert r["n_chunk_tokens"] == len(expect)
        assert chunks[-1]["start_token"] + chunks[-1]["n_chunk_tokens"] == n
        if len(chunks) > 1:  # no chunk is a suffix of its predecessor
            assert chunks[-2]["start_token"] + window < n


def test_minhash_novel_subset_of_exact_novel(spark):
    """Exact duplicates always share identical signatures, so the near-dup
    novelty filter can only be STRICTER than the exact one."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        minhash_novel,
        novel_documents,
    )

    docs = load(spark, "documents", SF)
    new = docs.filter(F.col("source") != "src0")
    corpus = docs.filter(F.col("source") == "src0")
    exact_ids = {r["doc_id"] for r in novel_documents(new, corpus).collect()}
    near_ids = {r["doc_id"] for r in minhash_novel(new, corpus, threshold=0.5).collect()}
    assert near_ids <= exact_ids
    assert near_ids  # and it is not vacuously empty


def test_read_jsonl_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from etl_world_banks_with_python_and_postgresql_spark.sources.robust import (
        read_jsonl_quarantine,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good one"}\n'
        '{"doc_id": 2 "text": "missing comma"}\n'
        '{"doc_id": 3, "text": "also fine"}\n'
        "not json at all\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    good, quar = read_jsonl_quarantine(spark, str(p), schema)
    assert {r["doc_id"] for r in good.collect()} == {1, 3}
    bad = quar.collect()
    assert len(bad) == 2
    assert all(r["raw_line"] and r["source_file"].endswith("in.jsonl") for r in bad)


def test_validate_rows_quarantine(spark):
    from etl_world_banks_with_python_and_postgresql_spark.sources.robust import (
        validate_rows,
    )

    df = spark.createDataFrame(
        [(1, "ok", 10.0), (2, "", 5.0), (3, "neg", -1.0), (4, "", -2.0)],
        "id long, name string, val double",
    )
    good, quar = validate_rows(
        df,
        {
            "nonempty_name": F.length("name") > 0,
            "nonneg_val": F.col("val") >= 0,
        },
    )
    assert [r["id"] for r in good.collect()] == [1]
    failed = {r["id"]: sorted(r["failed_rules"]) for r in quar.collect()}
    assert failed == {
        2: ["nonempty_name"],
        3: ["nonneg_val"],
        4: ["nonempty_name", "nonneg_val"],
    }


def test_frame_energy_features_feed_ann(spark):
    """Audio feature plumbing: fixed dim, zero-padding on short payloads,
    deterministic, and directly consumable by the ANN operators."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        attach_fake_binary,
        frame_energy_features,
    )
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        cosine_topk,
    )

    docs = attach_fake_binary(load(spark, "documents", SF).limit(40))
    feats = frame_energy_features(docs, n_frames=16)
    rows = feats.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r["embedding"])
    # deterministic across runs
    again = {r["doc_id"]: r["embedding"] for r in feats.collect()}
    assert all(again[r["doc_id"]] == r["embedding"] for r in rows)
    # short payload pads with zeros
    tiny = attach_fake_binary(
        spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    )
    v = frame_energy_features(tiny, n_frames=16).collect()[0]["embedding"]
    assert len(v) == 16 and v.count(0.0) >= 14
    # feeds ANN directly
    out = cosine_topk(feats, feats.limit(3), k=2, id_col="doc_id")
    assert out.count() > 0


def test_rollup_table_incremental_equals_direct(spark, tmp_path):
    """Continuous aggregate: N incremental ingests + merge-on-read must
    equal one direct aggregation over all events; compaction bounds the
    partial-row count without changing results."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.rollup import (
        RollupTable,
    )

    ev = load(spark, "events", SF).select("ts", "event_type", "value")
    rt = RollupTable(
        str(tmp_path / "rollup"), bucket="5 minutes", keys=["event_type"]
    )
    # ingest in 3 uneven slices (simulating batches)
    for m in range(3):
        rt.ingest(ev.filter(F.pmod(F.xxhash64("ts"), F.lit(3)) == m))

    direct = (
        ev.groupBy(
            F.window("ts", "5 minutes").start.alias("win_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .withColumn("avg_value", F.round(F.col("sum_value") / F.col("n"), 4))
    )

    def key(rows):
        return sorted(
            (r["win_start"], r["event_type"], r["n"], r["min_value"], r["max_value"])
            for r in rows
        )

    merged = rt.read(spark)
    assert key(merged.collect()) == key(direct.collect())
    # sums within float tolerance (partial-merge order differs)
    m = {(r["win_start"], r["event_type"]): r["sum_value"] for r in merged.collect()}
    for r in direct.collect():
        assert abs(m[(r["win_start"], r["event_type"])] - r["sum_value"]) < 1e-6

    n_groups = merged.count()  # materialize BEFORE the compaction swap --
    # the lazy plan pins the pre-swap files (same hazard pipeline.py
    # documents for snapshot swaps)
    before = rt.n_partial_rows(spark)
    rt.compact(spark)
    after = rt.n_partial_rows(spark)
    assert after <= before and after == n_groups
    assert key(rt.read(spark).collect()) == key(direct.collect())


def test_rollup_compact_crash_recovery(spark, tmp_path):
    """ADVICE r3: a crash between compact's two swap renames leaves the
    data only under .old -- read() must fall back to it instead of
    failing, and a subsequent compact must restore the primary path."""
    import os

    from etl_world_banks_with_python_and_postgresql_spark.operators.rollup import (
        RollupTable,
    )

    ev = load(spark, "events", SF).select("ts", "event_type", "value").limit(500)
    ev = spark.createDataFrame(ev.collect(), ev.schema)  # pin rows
    rt = RollupTable(str(tmp_path / "rc"), bucket="5 minutes", keys=["event_type"])
    rt.ingest(ev)
    expected = sorted(
        (r["win_start"], r["event_type"], r["n"]) for r in rt.read(spark).collect()
    )

    # simulate the crash window: primary renamed away, staging never
    # swapped in (exactly the state after compact's first os.rename)
    os.rename(rt.path, rt.path + ".old")
    got = sorted(
        (r["win_start"], r["event_type"], r["n"]) for r in rt.read(spark).collect()
    )
    assert got == expected

    # recovery: put the data back and compact; backup must be gone after
    # a successful swap and reads serve the primary path again
    os.rename(rt.path + ".old", rt.path)
    rt.compact(spark)
    assert not os.path.exists(rt.path + ".old")
    got = sorted(
        (r["win_start"], r["event_type"], r["n"]) for r in rt.read(spark).collect()
    )
    assert got == expected


def test_rollup_streaming_sink(spark, tmp_path):
    from etl_world_banks_with_python_and_postgresql_spark.operators.rollup import (
        RollupTable,
    )

    src = str(tmp_path / "ev")
    ev = load(spark, "events", SF).select("ts", "event_type", "value")
    ev.write.parquet(src)
    rt = RollupTable(str(tmp_path / "ra"), bucket="5 minutes", keys=["event_type"])
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(rt.streaming_sink())
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert rt.read(spark).count() == (
        ev.select(F.window("ts", "5 minutes").start, "event_type").distinct().count()
    )


def test_write_range_partitioned_total_order(spark, tmp_path):
    """Range-partitioned export: files are internally sorted, file ranges
    are disjoint and ascending (total order across the set), the manifest
    matches the data, and every row survives."""
    import json

    path = str(tmp_path / "sorted_export")
    orders = load(spark, "orders", SF).select("o_orderkey", "o_totalprice")
    manifest = sinks.write_range_partitioned(orders, path, "o_totalprice", n_files=6)

    assert manifest == json.load(open(f"{path}/_ranges.json"))
    assert sum(m["rows"] for m in manifest) == orders.count()
    # ascending, disjoint file ranges
    for a, b in zip(manifest, manifest[1:]):
        assert a["max"] <= b["min"]
    # each file internally sorted and inside its declared range
    for m in manifest:
        vals = [
            r["o_totalprice"]
            for r in spark.read.parquet(f"{path}/{m['file']}").collect()
        ]
        assert vals == sorted(vals)
        assert vals[0] == m["min"] and vals[-1] == m["max"]


def test_cosine_topk_broadcast_guard(spark):
    import pytest

    emb = load(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") % 25 == 0)
    # oversize query set: fail early, redirecting to the bucketed paths
    with pytest.raises(ValueError, match="lsh_bucketed_topk"):
        cosine_topk(emb, q, k=2, max_queries=3)
    # None is NOT a silent disable (VERDICT r5 task #3): the optional-
    # threading hole is closed loudly, with the redirect in the message
    with pytest.raises(ValueError, match="max_queries=0"):
        cosine_topk(emb, q, k=2, max_queries=None)
    # the explicit opt-out sentinel works; default (100k) never triggers
    # at test scale
    assert cosine_topk(emb, q, k=2, max_queries=0).count() > 0


def test_parquet_footer_stats_pushdown(spark):
    """Footer-stats helper: results match a full scan, the aggregation is
    actually pushed to the parquet reader, and the session's source
    routing is restored afterwards."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import (
        parquet_footer_stats,
    )

    path = f"{SF}/orders.parquet"
    before = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    stats = parquet_footer_stats(spark, path, ["o_totalprice", "o_orderkey"])
    assert spark.conf.get("spark.sql.sources.useV1SourceList", None) == before

    full = spark.read.parquet(path)
    direct = full.agg(
        F.min("o_totalprice"), F.max("o_totalprice"), F.count("o_totalprice")
    ).collect()[0]
    assert stats["o_totalprice"]["min"] == direct[0]
    assert stats["o_totalprice"]["max"] == direct[1]
    assert stats["o_totalprice"]["count"] == direct[2]

    # and the pushdown really happens under the scoped conf
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        plan = (
            spark.read.parquet(path)
            .agg(F.min("o_totalprice"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedAggregation: [MIN(o_totalprice)]" in plan
    finally:
        spark.conf.unset("spark.sql.parquet.aggregatePushdown")
        if before is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", before)


def test_rollup_hll_distinct_counts(spark, tmp_path):
    """Mergeable distinct counts: per-group HLL estimates from 3
    incremental ingests land within 5% of exact COUNT(DISTINCT); a
    compaction keeps the sketches mergeable and the estimates identical."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.rollup import (
        RollupTable,
    )

    ev = load(spark, "events", SF).select("ts", "event_type", "value", "user_id")
    rt = RollupTable(
        str(tmp_path / "r"), bucket="1 hour", keys=["event_type"],
        distinct_col="user_id",
    )
    for m in range(3):
        rt.ingest(ev.filter(F.pmod(F.xxhash64("ts"), F.lit(3)) == m))

    est = {
        (r["win_start"], r["event_type"]): r["n_distinct_est"]
        for r in rt.read(spark).collect()
    }
    exact = {
        (r["w"], r["event_type"]): r["d"]
        for r in ev.groupBy(
            F.window("ts", "1 hour").start.alias("w"), "event_type"
        ).agg(F.countDistinct("user_id").alias("d")).collect()
    }
    assert est.keys() == exact.keys()
    for k, d in exact.items():
        assert abs(est[k] - d) <= max(1, 0.05 * d), (k, est[k], d)

    rt.compact(spark)
    after = {
        (r["win_start"], r["event_type"]): r["n_distinct_est"]
        for r in rt.read(spark).collect()
    }
    assert after == est  # sketch union is associative; compaction is lossless
    # and compacted rows stay mergeable with future ingests
    rt.ingest(ev.limit(50))
    assert rt.read(spark).count() == len(exact)


def test_canonical_dedup_folds_variants(spark):
    """Accent/case/punctuation variants land in one canonical group."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        canonical_dedup_groups,
        canonical_text,
    )

    df = spark.createDataFrame(
        [
            (1, "Crème  Brûlée!"),
            (2, "creme brulee"),
            (3, "CREME, BRULEE"),
            (4, "something else"),
            (5, "Ñoño's   café"),
            (6, "nono s cafe"),
        ],
        "doc_id long, text string",
    )
    canon = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", canonical_text(F.col("text")).alias("c")).collect()}
    assert canon[1] == canon[2] == canon[3] == "creme brulee"
    assert canon[5] == canon[6] == "nono s cafe"
    groups = {r["keep_id"]: r["n_copies"] for r in canonical_dedup_groups(df).collect()}
    assert groups == {1: 3, 4: 1, 5: 2}


def test_wav_codec_real_roundtrip(spark):
    """The audio leg decodes REAL RIFF/WAVE bytes: generate genuine PCM16
    payloads with stdlib wave, re-parse the headers distributedly, and
    pin every decoded field against the generation parameters."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        WAV_HEADER_BYTES,
        WAV_RATES,
        attach_wav_binary,
        decode_wav_meta,
    )

    docs = load(spark, "documents", SF).limit(60)
    wav = attach_wav_binary(docs)
    # payloads are real WAV files: stdlib wave must parse every one
    import io
    import wave as wave_mod

    sample = wav.limit(5).collect()
    for r in sample:
        with wave_mod.open(io.BytesIO(bytes(r["payload"])), "rb") as w:
            assert w.getnchannels() == 1 and w.getsampwidth() == 2
        assert bytes(r["payload"])[:4] == b"RIFF"

    meta = {r["doc_id"]: r for r in decode_wav_meta(wav).collect()}
    for r in docs.select("doc_id", "n_chars").collect():
        m = meta[r["doc_id"]]
        expect_rate = WAV_RATES[r["doc_id"] % 4]
        expect_samples = 64 + (r["n_chars"] * 7) % 1000
        assert m["sample_rate"] == expect_rate
        assert m["n_samples"] == expect_samples
        assert m["n_bytes"] == WAV_HEADER_BYTES + 2 * expect_samples
        assert m["duration_ms"] == expect_samples * 1000 // expect_rate
        assert m["codec"] == "PCM16" and m["n_channels"] == 1


def test_wav_frame_energy_matches_numpy(spark):
    """wav_frame_energy decodes the actual PCM samples: per-span RMS must
    equal a local numpy recomputation over the same generated signal."""
    import numpy as np

    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        attach_wav_binary,
        wav_frame_energy,
    )

    docs = load(spark, "documents", SF).limit(20)
    wav = attach_wav_binary(docs)
    got = {r["doc_id"]: r["embedding"] for r in wav_frame_energy(wav, n_frames=8).collect()}
    for r in docs.select("doc_id", "n_chars").collect():
        n_samples = 64 + (r["n_chars"] * 7) % 1000
        amp = r["doc_id"] % 5 + 1
        pcm = ((np.arange(n_samples, dtype=np.int64) % 256 - 128) * 64 * amp).astype(
            "<i2"
        ).astype("float64")
        expect = [
            float(np.sqrt(np.mean(s * s))) / 32768.0
            for s in np.array_split(pcm, 8)
        ]
        assert np.allclose(got[r["doc_id"]], expect, atol=1e-12)


def test_png_codec_real_roundtrip(spark):
    """The image leg decodes REAL PNG bytes end-to-end: generated
    payloads are standards-valid PNGs (signature, IHDR, CRC-checked
    chunks, zlib IDAT), the header parse reads actual IHDR fields, and
    the pixel decode reproduces the exact generated raster."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        attach_png_binary,
        decode_image_pixels,
        decode_png,
        decode_png_meta,
    )

    docs = load(spark, "documents", SF).limit(40)
    png = attach_png_binary(docs)
    sample = png.limit(3).collect()
    for r in sample:
        bs = bytes(r["payload"])
        assert bs[:8] == b"\x89PNG\r\n\x1a\n"
        assert b"IEND" in bs[-12:]  # trailing IEND chunk + CRC
        w, h, depth, ctype, px = decode_png(bs)  # local stdlib decode
        assert depth == 8 and ctype == 0 and len(px) == w * h

    meta = {r["doc_id"]: r for r in decode_png_meta(png).collect()}
    pixels = {r["doc_id"]: r["pixels"] for r in decode_image_pixels(png).collect()}
    for r in docs.select("doc_id", "n_chars").collect():
        w = 4 + r["doc_id"] % 13
        h = 3 + r["n_chars"] % 11
        m = meta[r["doc_id"]]
        assert (m["width"], m["height"], m["bit_depth"], m["color_type"]) == (
            w, h, 8, 0,
        )
        expect = [
            (x * 7 + y * 13 + r["doc_id"]) % 256
            for y in range(h)
            for x in range(w)
        ]
        assert pixels[r["doc_id"]] == expect


def test_png_decoder_handles_all_filters():
    """decode_png must undo every PNG scanline filter (None/Sub/Up/
    Average/Paeth), not just the filter-0 rows our encoder emits --
    real-world PNGs mix them per row."""
    import zlib

    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        _png_chunk,
        decode_png,
    )

    w, h = 5, 5
    pixels = [(x * 31 + y * 7) % 256 for y in range(h) for x in range(w)]

    def row(y):
        return pixels[y * w : (y + 1) * w]

    raw = bytearray()
    prev = [0] * w
    for y in range(h):
        cur = row(y)
        f = y % 5  # one row per filter type
        raw.append(f)
        if f == 0:
            raw.extend(cur)
        elif f == 1:  # Sub
            raw.extend(
                (cur[x] - (cur[x - 1] if x else 0)) & 0xFF for x in range(w)
            )
        elif f == 2:  # Up
            raw.extend((cur[x] - prev[x]) & 0xFF for x in range(w))
        elif f == 3:  # Average
            raw.extend(
                (cur[x] - ((cur[x - 1] if x else 0) + prev[x]) // 2) & 0xFF
                for x in range(w)
            )
        else:  # Paeth
            out = []
            for x in range(w):
                a = cur[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((cur[x] - pr) & 0xFF)
            raw.extend(out)
        prev = cur

    import struct

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    got = decode_png(data)
    assert got[:2] == (w, h)
    assert got[4] == pixels

    # corrupted CRC must be rejected, not silently decoded
    bad = bytearray(data)
    bad[-5] ^= 0xFF  # flip a bit in IEND's CRC
    import pytest as _pytest

    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_ivf_append_matches_full_rebuild(spark, tmp_path):
    """append_ivf_index: probe results over (build half + append half)
    are identical to a one-shot index over the union with the SAME
    centroids, and the append writes files only under cell directories
    (O(batch) incremental growth, no base rewrite)."""
    import os

    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        append_ivf_index,
        ivf_topk_indexed,
        write_ivf_index,
    )

    emb = load(spark, "embeddings", SF)
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    inc_path = str(tmp_path / "ivf_inc")
    cents = write_ivf_index(first, inc_path, n_centroids=8)
    before_files = {
        os.path.join(r, f)
        for r, _, fs in os.walk(inc_path)
        for f in fs
        if f.endswith(".parquet")
    }
    append_ivf_index(second, inc_path)
    after_files = {
        os.path.join(r, f)
        for r, _, fs in os.walk(inc_path)
        for f in fs
        if f.endswith(".parquet")
    }
    # append adds files, removes none, and every new file sits in a cell dir
    assert before_files <= after_files
    assert all("cell=" in f for f in after_files - before_files)

    full_path = str(tmp_path / "ivf_full")
    write_ivf_index(emb, full_path, centroids=cents)

    inc = ivf_topk_indexed(spark, inc_path, queries, n_probe=2, k=5)
    full = ivf_topk_indexed(spark, full_path, queries, n_probe=2, k=5)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_mpng_sampled_frames_are_real_pngs(spark):
    """sample_mpng_frames emits GENUINE PNG bytes: every sampled frame
    decodes with the full stdlib pixel decoder and matches the exact
    generation pattern (x*7 + y*13 + id + f*31) % 256."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        attach_mpng_binary,
        decode_png,
        sample_mpng_frames,
    )

    docs = load(spark, "documents", SF).limit(8)
    n_chars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    vids = attach_mpng_binary(docs)
    frames = sample_mpng_frames(vids, stride=2).collect()
    assert frames, "no frames sampled"
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        w, h, depth, ctype, px = decode_png(bytes(r["frame_bytes"]))
        did, f = r["doc_id"], r["frame_idx"]
        assert (w, h) == (4 + did % 13, 3 + n_chars[did] % 11)
        expect = [
            (x * 7 + y * 13 + did + f * 31) % 256
            for y in range(h)
            for x in range(w)
        ]
        assert px == expect
    # stride=2 keeps exactly the even frame indices of n_frames = 2+id%5
    for did, idxs in by_doc.items():
        n = 2 + did % 5
        assert sorted(idxs) == [i for i in range(n) if i % 2 == 0]


def test_ivf_rebuild_restores_balance_and_results(spark, tmp_path):
    """rebuild_ivf_index: after appends, a rebuild re-partitions the FULL
    corpus under fresh centroids with an atomic swap; probe results equal
    a from-scratch index built with the same centroids."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        append_ivf_index,
        ivf_topk_indexed,
        rebuild_ivf_index,
        write_ivf_index,
    )

    emb = load(spark, "embeddings", SF)
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")
    write_ivf_index(first, path, n_centroids=4)
    append_ivf_index(second, path)

    cents = rebuild_ivf_index(spark, path, n_centroids=8)
    assert len(cents) == 8
    # every vector survived the rebuild
    assert spark.read.parquet(path).count() == emb.count()

    ref_path = str(tmp_path / "ivf_ref")
    write_ivf_index(emb.select("vec_id", "embedding"), ref_path, centroids=cents)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    got = ivf_topk_indexed(spark, path, queries, n_probe=2, k=5)
    ref = ivf_topk_indexed(spark, ref_path, queries, n_probe=2, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_mpng_robust_decode_quarantines_corrupt_payloads(spark):
    """decode_mpng_meta_robust: good payloads decode identically to the
    strict decoder; corrupt ones (bad magic, truncated frames, CRC
    damage) land as one quarantined row each, never a job failure."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        attach_mpng_binary,
        decode_mpng_meta,
        decode_mpng_meta_robust,
    )

    docs = load(spark, "documents", SF).limit(6)
    vids = attach_mpng_binary(docs).collect()

    def corrupt(b, mode):
        bs = bytearray(bytes(b))
        if mode == "magic":
            bs[0] = 0
        elif mode == "truncate":
            bs = bs[: len(bs) // 2]
        elif mode == "crc":
            # flip a byte inside frame 0's IHDR body: container header is
            # 10 bytes + 4-byte frame length + 8-byte PNG signature +
            # 4-byte chunk length -> IHDR tag/body starts at offset 26
            bs[30] ^= 0xFF
        return bytes(bs)

    rows = []
    for i, r in enumerate(vids):
        if i < 3:
            rows.append((r["doc_id"], bytes(r["payload"])))
        else:
            mode = ["magic", "truncate", "crc"][i - 3]
            rows.append((r["doc_id"], corrupt(r["payload"], mode)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    out = {r["doc_id"]: r for r in decode_mpng_meta_robust(df).collect()}
    strict = {
        r["doc_id"]: r
        for r in decode_mpng_meta(
            spark.createDataFrame(rows[:3], "doc_id long, payload binary")
        ).collect()
    }
    good_ids = [r[0] for r in rows[:3]]
    bad_ids = [r[0] for r in rows[3:]]
    for d in good_ids:
        assert out[d]["_error"] is None
        for k in ("n_frames", "fps", "width", "height", "duration_ms"):
            assert out[d][k] == strict[d][k]
    for d in bad_ids:
        assert out[d]["_error"] is not None
        assert out[d]["n_frames"] is None
    # exactly one row per input either way
    assert len(out) == 6


def test_funnel_strictly_after_semantics(spark):
    """funnel_counts: a user whose purchase precedes their first click
    must NOT count as stage 3 (order matters, not mere presence)."""
    from datetime import datetime as dt

    from etl_world_banks_with_python_and_postgresql_spark.operators.funnel import (
        funnel_counts,
    )

    rows = [
        # u1 completes in order: view < click < purchase
        (1, 1, "view", dt(2024, 1, 1, 10)),
        (2, 1, "click", dt(2024, 1, 1, 11)),
        (3, 1, "purchase", dt(2024, 1, 1, 12)),
        # u2 purchases BEFORE clicking: stages 1-2 only
        (4, 2, "view", dt(2024, 1, 1, 10)),
        (5, 2, "purchase", dt(2024, 1, 1, 11)),
        (6, 2, "click", dt(2024, 1, 1, 12)),
        # u3 never views: no stages at all despite click+purchase
        (7, 3, "click", dt(2024, 1, 1, 10)),
        (8, 3, "purchase", dt(2024, 1, 1, 11)),
        # u4 clicks at the SAME instant as the view: strictly-after fails
        (9, 4, "view", dt(2024, 1, 1, 10)),
        (10, 4, "click", dt(2024, 1, 1, 10)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {r["stage"]: r["n_users"] for r in funnel_counts(df).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_zorder_layout_prunes_2d_box_queries(spark, tmp_path):
    """write_zordered: a 2-D box query's manifest candidate set is a
    strict subset of the files AND reading only candidates returns
    exactly the full filter's rows (pruning is sound and useful)."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.sinks import (
        write_zordered,
        zorder_candidate_files,
    )

    # BALANCED bit-widths: both dims span ~8 bits. Interleaving an 8-bit
    # and a 13-bit column would put the wide column's high bits above all
    # of the narrow one's -- the layout degenerates to single-column order
    # and the narrow dim never prunes (the standard ZORDER normalization
    # rule, documented on zorder_key).
    o = load(spark, "orders", SF).select(
        "o_orderkey", "o_custkey", (F.col("o_orderkey") % 256).alias("okey")
    )
    path = str(tmp_path / "zord")
    manifest = write_zordered(o, path, "o_custkey", "okey", n_files=16, bits=8)
    assert len(manifest) >= 8

    a_lo, a_hi = 10, 40      # tight custkey box
    b_lo, b_hi = 0, 60       # tight okey box
    cand = zorder_candidate_files(path, (a_lo, a_hi), (b_lo, b_hi))
    assert 0 < len(cand) < len(manifest), (len(cand), len(manifest))

    got = (
        spark.read.parquet(*cand)
        .filter(
            (F.col("o_custkey").between(a_lo, a_hi))
            & (F.col("okey").between(b_lo, b_hi))
        )
        .select("o_orderkey")
    )
    expect = o.filter(
        (F.col("o_custkey").between(a_lo, a_hi))
        & (F.col("okey").between(b_lo, b_hi))
    ).select("o_orderkey")
    assert sorted(r[0] for r in got.collect()) == sorted(
        r[0] for r in expect.collect()
    )

    # single-dimension queries prune too (either dimension alone)
    cand_a = zorder_candidate_files(path, a_range=(a_lo, a_hi))
    cand_b = zorder_candidate_files(path, b_range=(b_lo, b_hi))
    assert len(cand_a) < len(manifest)
    assert len(cand_b) < len(manifest)


def test_hilbert_layout_prunes_fewer_files_than_morton(spark, tmp_path):
    """curve='hilbert' on write_zordered: over a grid of 2-D box probes
    the Hilbert layout's candidate file total is STRICTLY smaller than
    Morton's on the same data / file count / probes (the locality edge
    the adjacency property promises), and every probe stays sound
    (candidates-only read == full filter)."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.sinks import (
        write_zordered,
        zorder_candidate_files,
    )

    o = load(spark, "orders", SF).select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("ka"),
        (F.col("o_orderkey") % 256).alias("kb"),
    )
    paths = {}
    for curve in ("morton", "hilbert"):
        p = str(tmp_path / curve)
        m = write_zordered(o, p, "ka", "kb", n_files=16, bits=8, curve=curve)
        assert len(m) >= 8
        paths[curve] = p

    # 16 square box probes tiling the key space
    probes = [
        ((a, a + 63), (b, b + 63))
        for a in (0, 64, 128, 192)
        for b in (0, 64, 128, 192)
    ]
    totals = {"morton": 0, "hilbert": 0}
    for curve, p in paths.items():
        for a_range, b_range in probes:
            cand = zorder_candidate_files(p, a_range, b_range)
            totals[curve] += len(cand)
            got = sorted(
                r[0]
                for r in (
                    spark.read.parquet(*cand)
                    .filter(
                        F.col("ka").between(*a_range)
                        & F.col("kb").between(*b_range)
                    )
                    .select("o_orderkey")
                    .collect()
                    if cand
                    else []
                )
            )
            want = sorted(
                r[0]
                for r in o.filter(
                    F.col("ka").between(*a_range)
                    & F.col("kb").between(*b_range)
                )
                .select("o_orderkey")
                .collect()
            )
            assert got == want, (curve, a_range, b_range)
    assert totals["hilbert"] < totals["morton"], totals

    # unknown curve is rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_zordered(o, str(tmp_path / "x"), "ka", "kb", curve="peano")


def test_posting_index_equivalence_and_pruning(spark, tmp_path):
    """write_posting_index serves BOTH retrieval forms bit-identically to
    their scan twins, and the probe read partition-prunes to the query
    terms' buckets (the |T|/n_buckets at-rest read-fraction claim)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import text as T

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    idx = str(tmp_path / "postings")
    T.write_posting_index(docs, idx, n_buckets=16)

    terms = ["merge", "window"]
    scan_kw = T.keyword_search(docs, terms=terms).collect()
    idx_kw = T.keyword_search_indexed(spark, idx, terms=terms).collect()
    assert [tuple(r) for r in scan_kw] == [tuple(r) for r in idx_kw]

    terms3 = ["merge", "window", "partition"]
    scan_bm = T.bm25_rank(docs, terms=terms3).collect()
    idx_bm = T.bm25_indexed(spark, idx, terms=terms3).collect()
    assert [tuple(r) for r in scan_bm] == [tuple(r) for r in idx_bm]
    assert len(scan_bm) > 0

    # pruning: the probe plan's scan must carry bucket PartitionFilters
    # and read at most |terms| of the 16 partitions
    pr, _ = T._read_postings(spark, idx, terms)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"bucket#\d+L? IN \(([0-9,]+)\)", plan)
    assert m, plan
    assert len(m.group(1).split(",")) <= len(terms)


def test_bm25_idf_downweights_common_terms(spark):
    """Semantic pin: a term present in nearly every doc contributes less
    than a rare term at equal tf (the odds-idf ordering property that
    survives dropping the log)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import text as T

    rows = [
        (1, "rare common common"),
        (2, "common common common"),
        (3, "common word word"),
        (4, "common filler filler"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res = {
        r["doc_id"]: r["bm25"]
        for r in T.bm25_rank(df, terms=["rare", "common"], k=10).collect()
    }
    # doc 1 has the rare term once; doc 2 has only the ubiquitous term
    # (3x tf). idf must dominate: rare-term doc ranks first.
    assert res[1] > res[2]


def test_capped_neardup_subset_and_bounded_exchange_cost(spark):
    """max_bucket trades recall only: capped pairs are a subset of the
    uncapped output with identical cos_sim. Plan cost: under the
    at-scale join strategy (SMJ; broadcast disabled) the cap adds
    exactly the two LINEAR re-key exchanges (window keys (band,key) vs
    join keys (band,key,sub)) and nothing else -- the documented price
    for bounding the quadratic candidate join."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    emb = load(spark, "embeddings", "/root/testdata/sf0.001")
    kw = dict(threshold=0.45, bands=12, bits_per_band=6, dim=64)
    uncapped = cosine_neardup_pairs(emb, **kw)
    capped = cosine_neardup_pairs(emb, **kw, max_bucket=2)

    up = {(r["vec_a"], r["vec_b"]): r["cos_sim"] for r in uncapped.collect()}
    cp = {(r["vec_a"], r["vec_b"]): r["cos_sim"] for r in capped.collect()}
    assert set(cp) <= set(up)
    assert all(up[k] == v for k, v in cp.items())
    # max_bucket=2 must actually bite on this corpus (buckets avg ~n/64)
    assert len(cp) < len(up)

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        unc = n_exchanges(cosine_neardup_pairs(emb, **kw))
        cap = n_exchanges(cosine_neardup_pairs(emb, **kw, max_bucket=2))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert cap == unc + 2


def test_constraint_audit_single_pass_and_edge_cases(spark):
    """The whole scalar-check suite compiles to ONE scan (adding checks
    adds counters, not passes); NULL check results count as violations;
    empty tables pass everything vacuously."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import (
        constraints as C,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None)], ["id", "val"]
    )
    rep = C.audit_checks(
        df,
        {
            "val_positive": F.col("val") > 0,  # row 2 fails, row 3 NULL->fails
            "id_notnull": F.col("id").isNotNull(),
        },
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1  # one pass for both checks
    got = {r["constraint"]: (r["n_violations"], r["passed"]) for r in rep.collect()}
    assert got == {"val_positive": (2, False), "id_notnull": (0, True)}
    assert all(r["n_rows"] == 3 for r in rep.collect())

    # empty table: vacuous pass, not a crash or NULL counters
    empty = df.filter(F.lit(False))
    got0 = {
        r["constraint"]: (r["n_violations"], r["passed"])
        for r in C.constraint_report(
            empty,
            checks={"val_positive": F.col("val") > 0},
            unique_keys={"pk": ["id"]},
            foreign_keys={"fk": (df, ["id"])},
        ).collect()
    }
    assert got0 == {
        "val_positive": (0, True),
        "pk": (0, True),
        "fk": (0, True),
    }

    # dict-mapped FK with renamed parent column + violation counting
    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (9, "c")], ["order_id", "x"]
    )
    parent = spark.createDataFrame([(1,)], ["o_id"])
    viols = C.fk_violations(child, parent, {"order_id": "o_id"}).collect()
    assert [(r["order_id"], r["n_rows"]) for r in viols] == [(9, 1)]


def test_kmv_sketch_mergeable_and_accurate(spark):
    """KMV invariants: (1) merging per-part sketches equals sketching the
    union (the compose-without-rescan property); (2) a saturated k=256
    estimate lands within ~3 std errors (1/sqrt(k) ~ 6.25%) of the exact
    distinct count; (3) an unsaturated sketch returns the EXACT count."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import (
        sketch as S,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.01")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    full = S.kmv_sketch(docs, "text", k=256)
    merged = S.kmv_merge(
        [S.kmv_sketch(half_a, "text", k=256), S.kmv_sketch(half_b, "text", k=256)],
        k=256,
    )
    assert sorted(r["hv"] for r in full.collect()) == sorted(
        r["hv"] for r in merged.collect()
    )

    exact = docs.select("text").distinct().count()
    est = S.kmv_estimate(full, k=256).collect()[0]["est_distinct"]
    assert exact > 256  # saturation premise
    assert abs(est - exact) / exact < 3 * (1 / 256**0.5)

    tiny = docs.limit(100)
    est_tiny = S.kmv_distinct(tiny, "text", k=256).collect()[0]["est_distinct"]
    assert est_tiny == tiny.select("text").distinct().count()


def test_hll_mergeable_accurate_and_regime_correct(spark):
    """HLL invariants: (1) merging per-part register tables equals
    sketching the union (elementwise MAX -- the one-pass distributed
    property); (2) in the RAW regime (n >> m) a p=6 sketch lands within
    ~3 std errors (1.04/sqrt(64) ~ 13%) of the exact count; (3) in the
    small-range regime the linear-counting branch engages (zero
    registers present) and beats the raw estimator; (4) registers are
    deterministic: two builds are identical."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import (
        sketch as S,
    )

    # raw regime: 20k distinct synthetic values >> m=64
    big = spark.range(20_000).select(
        F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    regs = S.hll_registers(big, "val", p=6)
    est = S.hll_estimate(regs, p=6).collect()[0]
    assert est["n_zero_registers"] == 0  # raw branch active
    assert abs(est["est_distinct"] - 20_000) / 20_000 < 3 * 1.04 / 64**0.5

    # merge property: per-half MAX-merge == whole-corpus registers
    half_a = big.filter(F.col("val").substr(2, 99).cast("long") % 2 == 0)
    half_b = big.filter(F.col("val").substr(2, 99).cast("long") % 2 == 1)
    merged = S.hll_merge(
        [S.hll_registers(half_a, "val", p=6), S.hll_registers(half_b, "val", p=6)]
    )
    as_rows = lambda df: sorted(  # noqa: E731
        (r["register"], r["max_rho"]) for r in df.collect()
    )
    assert as_rows(merged) == as_rows(regs)
    # determinism: a rebuild is bit-identical
    assert as_rows(S.hll_registers(big, "val", p=6)) == as_rows(regs)

    # small-range regime: 25 distinct values -> zero registers present,
    # linear counting engages and lands closer than the raw estimate
    docs = load(spark, "documents", "/root/testdata/sf0.01")
    one = docs.filter(F.col("source") == "src0")
    row = S.hll_distinct(one, "text", p=6, group_by="source").collect()[0]
    exact = row["exact_distinct"]
    assert row["n_zero_registers"] > 0
    assert abs(row["est_distinct"] - exact) <= max(3, exact // 3)


def test_bottomk_quantile_sketch_mergeable_accurate_and_exact_when_small(
    spark,
):
    """Bottom-k quantile invariants: (1) merging per-part samples equals
    sampling the union; (2) the z107 gate output's ACHIEVED rank stays
    within 3 std errors (3*sqrt(q(1-q)/k) <= ~0.094) of the target q at
    every (group, q); (3) a group smaller than k degrades to the EXACT
    quantile (the sample IS the group)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import (
        sketch as S,
    )

    o = load(spark, "orders", "/root/testdata/sf0.01")
    half_a = o.filter(F.col("o_orderkey") % 2 == 0)
    half_b = o.filter(F.col("o_orderkey") % 2 == 1)
    full = S.bottomk_sample(
        o, "o_orderkey", "o_totalprice", k=128, group_by="o_orderstatus"
    )
    merged = S.bottomk_merge(
        [
            S.bottomk_sample(h, "o_orderkey", "o_totalprice", k=128,
                             group_by="o_orderstatus")
            for h in (half_a, half_b)
        ],
        k=128,
        group_by="o_orderstatus",
    )
    key = lambda r: (r["o_orderstatus"], r["hv"], r["v"])  # noqa: E731
    assert sorted(map(key, full.collect())) == sorted(map(key, merged.collect()))

    from etl_world_banks_with_python_and_postgresql_spark.plans import (  # noqa: F401
        analytic as _register_analytic,
    )
    from etl_world_banks_with_python_and_postgresql_spark.plans.base import REGISTRY

    rows = REGISTRY["z107_kmv_quantiles"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 12  # 3 statuses x 4 quantiles
    for r in rows:
        assert abs(r["est_rank_micros"] - r["q_micros"]) <= 100_000, dict(r)

    tiny = o.filter(F.col("o_orderkey") < 400)  # every group under k
    per_group = {
        r["o_orderstatus"]: r["n"]
        for r in tiny.groupBy("o_orderstatus").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert all(n < 256 for n in per_group.values())
    est = S.kmv_quantiles(
        tiny, "o_orderkey", "o_totalprice", [500_000], k=256,
        group_by="o_orderstatus",
    ).collect()
    for r in est:
        grp = tiny.filter(F.col("o_orderstatus") == r["o_orderstatus"])
        vals = sorted(
            x["o_totalprice"] for x in grp.select("o_totalprice").collect()
        )
        want = vals[(len(vals) + 1) // 2 - 1]  # nearest-rank median
        assert r["quantile_value"] == want


def test_histogram_covers_all_rows_and_degenerate_column(spark):
    """Bin counts sum to the row count, the max value lands in the last
    bin (clamp), and a constant column collapses to one bin instead of
    dividing by zero."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import (
        sketch as S,
    )

    li = load(spark, "lineitem", "/root/testdata/sf0.001")
    h = S.equi_width_histogram(li, "l_extendedprice", n_bins=20).collect()
    assert sum(r["n_rows"] for r in h) == li.count()
    assert max(r["bin"] for r in h) == 19
    assert min(r["bin"] for r in h) == 0

    const = spark.createDataFrame([(1, 5.0)] * 4, ["id", "v"])
    hc = S.equi_width_histogram(const, "v", n_bins=10).collect()
    assert [(r["bin"], r["n_rows"]) for r in hc] == [(0, 4)]


def test_posting_index_append_matches_rebuild(spark, tmp_path):
    """Appending a batch to the posting index yields bit-identical
    retrieval (conjunctive AND bm25) to rebuilding the index over the
    full corpus -- O(|batch|) growth with no correctness drift."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import text as T

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    first = docs.filter(F.col("doc_id") % 3 != 0)
    rest = docs.filter(F.col("doc_id") % 3 == 0)

    grown = str(tmp_path / "grown")
    T.write_posting_index(first, grown, n_buckets=16)
    T.append_posting_index(rest, grown)

    rebuilt = str(tmp_path / "rebuilt")
    T.write_posting_index(docs, rebuilt, n_buckets=16)

    for fn, terms in (
        (T.keyword_search_indexed, ["merge", "window"]),  # 3-way AND is empty at sf0.001
        (T.bm25_indexed, ["merge", "window", "partition"]),
    ):
        a = [tuple(r) for r in fn(spark, grown, terms=terms).collect()]
        b = [tuple(r) for r in fn(spark, rebuilt, terms=terms).collect()]
        assert a == b and len(a) > 0


def test_quantized_ann_recall_and_compression_exactness(spark):
    """255-level scalar quantization preserves ANN quality: recall@10 vs
    exact full-precision top-k stays >= 0.9 on the test corpus, and
    reconstruction is deterministic (same params -> identical vectors)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        cosine_topk,
        quantize_reconstruct,
        quantized_topk,
        scalar_quantization_params,
    )

    emb = load(spark, "embeddings", "/root/testdata/sf0.001")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    exact = cosine_topk(emb, q, k=10).collect()
    quant = quantized_topk(emb, q, k=10).collect()

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    ex, qz = by_query(exact), by_query(quant)
    recalls = [len(ex[k_] & qz[k_]) / len(ex[k_]) for k_ in ex]
    assert sum(recalls) / len(recalls) >= 0.9, recalls

    mins, maxs = scalar_quantization_params(emb)
    a = quantize_reconstruct(emb, mins, maxs).collect()
    b = quantize_reconstruct(emb, mins, maxs).collect()
    assert [r["embedding"] for r in a] == [r["embedding"] for r in b]


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    """Semantic pin for the asymmetric detector: a short doc fully
    embedded in a 5x-longer one has containment 1.0 but Jaccard well
    under 0.8 -- ngram_jaccard_pairs misses it, containment_pairs finds
    it with the correct direction (short -> long)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(12))
    rows = [(1, short), (2, short + " " + filler), (3, "totally other words here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    jac = ngram_jaccard_pairs(df, threshold=0.8).collect()
    assert jac == []  # symmetric metric misses the embedding

    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    assert cont.get((1, 2)) == 1.0  # short contained in long, directed
    assert (2, 1) not in cont  # long is NOT contained in short


def test_phrase_search_orders_matter(spark):
    """Phrase retrieval distinguishes adjacency + order where conjunctive
    AND cannot: 'window join' as a phrase matches only the contiguous
    occurrence, counts repeats, and misses the reversed/split forms."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import text as T

    rows = [
        (1, "window join now window join later"),  # 2 phrase hits
        (2, "join the window"),                    # both words, wrong order
        (3, "window then a join"),                 # both words, split
        (4, "nothing relevant"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    phrase = {
        r["doc_id"]: r["n_matches"]
        for r in T.phrase_search(df, ["window", "join"]).collect()
    }
    assert phrase == {1: 2}
    conj = {r["doc_id"] for r in T.keyword_search(df, ["window", "join"]).collect()}
    assert conj == {1, 2, 3}  # AND-of-terms cannot tell them apart


def test_positional_index_serves_phrase_queries(spark, tmp_path):
    """A positional posting index answers phrase queries bit-identically
    to the scan form (including after an O(batch) append), the
    non-positional index refuses phrase queries loudly, and the
    positional payload keeps BM25/conjunctive retrieval unchanged."""
    import pytest as _pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators import text as T

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)

    idx = str(tmp_path / "pos_idx")
    T.write_posting_index(first, idx, n_buckets=16, positional=True)
    T.append_posting_index(rest, idx)

    phrase = ["window", "join"]
    scan = [tuple(r) for r in T.phrase_search(docs, phrase).collect()]
    idxr = [tuple(r) for r in T.phrase_search_indexed(spark, idx, phrase).collect()]
    assert scan == idxr and len(scan) > 0

    bm_scan = [tuple(r) for r in T.bm25_rank(docs, terms=phrase).collect()]
    bm_idx = [tuple(r) for r in T.bm25_indexed(spark, idx, terms=phrase).collect()]
    assert bm_scan == bm_idx

    flat = str(tmp_path / "flat_idx")
    T.write_posting_index(docs, flat, n_buckets=16)
    with _pytest.raises(ValueError, match="without positions"):
        T.phrase_search_indexed(spark, flat, phrase)


def test_compact_small_files_preserves_data(spark, tmp_path):
    """OPTIMIZE pass: many tiny appended files rewrite into the
    bin-packed target count behind the atomic swap, rows bit-identical;
    an already-compact directory no-ops."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.sinks import (
        compact_small_files,
    )

    p = str(tmp_path / "t")
    for i in range(8):  # 8 tiny appends = 8+ files
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
            "append"
        ).parquet(p)
    before = sorted(r["id"] for r in spark.read.parquet(p).collect())

    stats = compact_small_files(spark, p, target_file_bytes=1 << 30)
    assert stats["files_before"] >= 8 and stats["files_after"] == 1
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == before

    again = compact_small_files(spark, p, target_file_bytes=1 << 30)
    assert again["files_before"] == again["files_after"] == 1  # no-op


def test_cluster_safe_split_has_zero_leakage(spark):
    """The z81->z82 contract: hash_split provably leaks near-dup pairs
    across splits on this corpus; cluster_safe_split leaks NONE (every
    near-dup pair shares a split), while still producing all three
    splits."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        cluster_safe_split,
        hash_split,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, unpersist_after=False)

    def leaked(split_df):
        la = split_df.select(
            F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
        )
        lb = split_df.select(
            F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
        )
        return (
            pairs.join(la, "doc_a")
            .join(lb, "doc_b")
            .filter(F.col("sa") != F.col("sb"))
            .count()
        )

    assert leaked(hash_split(docs)) > 0  # the z81 finding
    safe = cluster_safe_split(docs)
    assert leaked(safe) == 0
    assert {r["split"] for r in safe.select("split").distinct().collect()} == {
        "train", "valid", "test",
    }


def test_bmp_codec_real_roundtrip():
    """encode_bmp -> decode_bmp must reproduce exact pixels through the
    real format mechanics (bottom-up raster, 4-byte row padding, BGR)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    w, h = 5, 3  # stride 15 -> padded to 16: exercises row padding
    px = [((x * 7 + y) % 256, (x + y * 5) % 256, (x * 3 + y * 11) % 256)
          for y in range(h) for x in range(w)]
    data = encode_bmp(px, w, h)
    assert data[:2] == b"BM"
    gw, gh, gpx = decode_bmp(data)
    assert (gw, gh) == (w, h)
    assert gpx == px


def test_bmp_decoder_rejects_corruption_and_exotics():
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )
    import pytest as _pytest
    import struct

    data = encode_bmp([(1, 2, 3)] * 12, 4, 3)
    with _pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + data[2:])
    # header claims more rows than the raster holds -> measured, not trusted
    grown = data[:18] + struct.pack("<ii", 4, 99) + data[26:]
    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp(grown)
    # 8-bit variant needs a palette -> honest NotImplementedError
    eight = data[:28] + struct.pack("<H", 8) + data[30:]
    with _pytest.raises(NotImplementedError, match="24-bit"):
        decode_bmp(eight)


def test_bmp_pixel_stats_exact(spark):
    """decode_bmp_pixel_stats values must equal an independent exact
    recomputation from the generation pattern (BIGINT micros)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        attach_bmp_binary,
        decode_bmp_pixel_stats,
    )

    docs = spark.createDataFrame(
        [(7, 23), (12, 5)], "doc_id long, n_chars int"
    )
    got = {r["doc_id"]: r for r in
           decode_bmp_pixel_stats(attach_bmp_binary(docs)).collect()}
    for did, ln in [(7, 23), (12, 5)]:
        w, h = 4 + did % 13, 3 + ln % 11
        chans = {
            "b": [(x * 7 + y * 13 + did) % 256 for y in range(h) for x in range(w)],
            "g": [(x * 3 + y * 5 + 2 * did) % 256 for y in range(h) for x in range(w)],
            "r": [(x * 11 + y + 3 * did) % 256 for y in range(h) for x in range(w)],
        }
        n = w * h
        r = got[did]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, n)
        for ch, vals in chans.items():
            s, sq = sum(vals), sum(v * v for v in vals)
            assert r[f"sum_{ch}"] == s
            assert r[f"mean_{ch}_micros"] == (2 * 10**6 * s + n) // (2 * n)
            assert r[f"var_{ch}_micros"] == (
                (2 * 10**6 * (n * sq - s * s) + n * n) // (2 * n * n)
            )


def test_decode_image_pixels_bmp_luma(spark):
    """decode_image_pixels routes BMP through the real color decode and
    emits exact integer luma; unknown formats still raise."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        attach_bmp_binary,
        decode_image_pixels,
    )

    docs = spark.createDataFrame([(3, 8)], "doc_id long, n_chars int")
    out = decode_image_pixels(attach_bmp_binary(docs)).collect()[0]
    w, h = 4 + 3 % 13, 3 + 8 % 11
    expect = [
        (
            (x * 7 + y * 13 + 3) % 256
            + (x * 3 + y * 5 + 6) % 256
            + (x * 11 + y + 9) % 256
        ) // 3
        for y in range(h) for x in range(w)
    ]
    assert list(out["pixels"]) == expect


def test_incremental_join_view_delta_rule(spark, tmp_path):
    """Each joined pair must be emitted exactly once (by the later
    arrival), across interleaved left/right appends; the accumulated
    view equals the from-scratch join after every ingest."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        IncrementalJoinView,
    )

    v = IncrementalJoinView(str(tmp_path / "v"), key="k")
    L = spark.createDataFrame
    v.ingest_left(L([(1, "a1"), (2, "a2")], "k int, a string"))
    v.ingest_right(L([(1, "b1")], "k int, b string"))
    assert sorted(tuple(r) for r in v.read(spark).collect()) == [(1, "a1", "b1")]

    # late left row joins existing right; duplicate-key right row fans out
    v.ingest_left(L([(1, "a3")], "k int, a string"))
    v.ingest_right(L([(2, "b2"), (1, "b3")], "k int, b string"))
    got = sorted(tuple(r) for r in v.read(spark).collect())
    assert got == sorted(
        [(1, "a1", "b1"), (1, "a3", "b1"),
         (1, "a1", "b3"), (1, "a3", "b3"),
         (2, "a2", "b2")]
    )
    # equivalently: view == full join of everything ingested so far
    allL = L([(1, "a1"), (2, "a2"), (1, "a3")], "k int, a string")
    allR = L([(1, "b1"), (2, "b2"), (1, "b3")], "k int, b string")
    direct = sorted(tuple(r) for r in allL.join(allR, "k").collect())
    assert got == direct


def test_bucketed_cumsum_matches_global_window(spark):
    """Two-level prefix sum must equal the naive global-window definition
    on sparse, non-dense, bucket-straddling keys."""
    from pyspark.sql import Window as W

    from etl_world_banks_with_python_and_postgresql_spark.operators.prefix import (
        bucketed_cumsum,
        token_shards,
    )

    rows = [(k, (k * 7) % 13 + 1) for k in
            [0, 1, 5, 63, 64, 65, 127, 128, 1000, 1001, 4096]]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: r["cum"]
        for r in bucketed_cumsum(df, "doc_id", "n", bucket_width=64).collect()
    }
    naive = {
        r["doc_id"]: r["c"]
        for r in df.withColumn(
            "c",
            F.sum("n").over(
                W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got == naive

    # shards: never split a doc; shard boundaries at floor(excl/budget)
    m = {r["shard_id"]: r for r in
         token_shards(df, budget_tokens=20, token_col="n",
                      bucket_width=64).collect()}
    total = sum(n for _, n in rows)
    assert sum(r["n_docs"] for r in m.values()) == len(rows)
    assert sum(r["n_tokens"] for r in m.values()) == total
    # shard ids contiguous from 0 and doc ranges non-overlapping/ordered
    sids = sorted(m)
    assert sids == list(range(len(sids)))
    for a, b in zip(sids, sids[1:]):
        assert m[a]["last_doc"] < m[b]["first_doc"]


def test_incremental_join_view_crash_replay(spark, tmp_path):
    """Exactly-once under crashes: a crash AFTER the view-delta write but
    BEFORE the ledger commit must leave the view unchanged (partial files
    invisible), and the retried ingest must emit each pair exactly once."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        IncrementalJoinView,
    )

    L = spark.createDataFrame
    v = IncrementalJoinView(str(tmp_path / "v"), key="k")
    v.ingest_right(L([(1, "b1"), (2, "b2")], "k int, b string"), batch_id="r0")

    batch = L([(1, "a1"), (2, "a2")], "k int, a string")

    # simulate the crash: run the write steps but NOT the ledger commit
    applied = v._load_ledger()
    other = v._read_side(spark, "right")
    batch.join(other, "k").write.mode("overwrite").parquet(
        v._batch_dir("view", "left", "l0")
    )
    # (crashed before store write + ledger commit)
    assert v._load_ledger() == applied
    # the partial view delta is INVISIBLE: ledger-gated read -- with a
    # right-only history the view is an EMPTY frame in the right side's
    # shape (symmetric with left-only, ADVICE r5), never the partial rows
    assert v.read(spark).count() == 0

    # retry the same batch id: clean overwrite, single commit
    v.ingest_left(batch, batch_id="l0")
    got = sorted(tuple(r) for r in v.read(spark).select("k", "a", "b").collect())
    assert got == [(1, "a1", "b1"), (2, "a2", "b2")]

    # replaying a COMMITTED batch is a no-op
    v.ingest_left(batch, batch_id="l0")
    got2 = sorted(tuple(r) for r in v.read(spark).select("k", "a", "b").collect())
    assert got2 == got


def test_incremental_join_view_prunes_store_reads(spark, tmp_path):
    """Bounded ingest IO (VERDICT r5 task #1): with bucketed stores and
    per-batch key-range manifests, an ingest whose delta overlaps only
    one historical batch's key range must read a STRICT subset of the
    other side's store files -- and the subset must stay FLAT as
    non-overlapping history accrues. Pruning must not change the view."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        IncrementalJoinView,
    )

    v = IncrementalJoinView(str(tmp_path / "v"), key="k", n_buckets=8)
    L = spark.createDataFrame

    def mk_right(lo, hi):
        return L([(k, f"b{k}") for k in range(lo, hi)], "k int, b string")

    v.ingest_right(mk_right(0, 100), batch_id="r0")
    v.ingest_right(mk_right(100, 200), batch_id="r1")
    v.ingest_right(mk_right(200, 300), batch_id="r2")
    all_leafs = {
        leaf
        for d in v._store_batch_dirs("right")
        for leaf in v._leaf_dirs(d)
    }

    # a delta overlapping ONLY r2's key range
    delta = L([(k, f"a{k}") for k in range(250, 260)], "k int, a string")
    v.ingest_left(delta, batch_id="l0")
    ranges = v._bucket_manifest(v._batch_dir("store", "left", "l0"))
    pruned = set(v._pruned_store_paths("right", ranges))
    assert pruned, "ingest must still read the matching buckets"
    assert pruned < all_leafs, "must be a STRICT subset of the store"
    assert all("batch=right-r2" in p for p in pruned), (
        "r0/r1 key ranges cannot intersect the delta; their buckets "
        f"must be range-pruned: {sorted(pruned)}"
    )

    # pruning is IO-only: the maintained view equals the full join
    got = sorted(
        tuple(r) for r in v.read(spark).select("k", "a", "b").collect()
    )
    assert got == [(k, f"a{k}", f"b{k}") for k in range(250, 260)]

    # per-ingest IO stays FLAT as non-overlapping history grows
    v.ingest_right(mk_right(300, 400), batch_id="r3")
    v.ingest_right(mk_right(400, 500), batch_id="r4")
    assert set(v._pruned_store_paths("right", ranges)) == pruned

    # legacy flat (manifest-less) store dirs are read whole, never dropped
    import os

    legacy = v._batch_dir("store", "right", "r0")
    os.remove(os.path.join(legacy, "_buckets.json"))
    assert legacy in v._pruned_store_paths("right", ranges)


def test_ivm_footer_ranges_string_key_and_conservative(spark, tmp_path):
    """The bucket manifests come from parquet FOOTER stats (no Spark
    job). For string keys the harvested [lo, hi] must bound the real
    per-bucket min/max, and an unknown range ([None, None]) must be
    treated as always-intersecting -- pruning may widen, never drop."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        IncrementalJoinView,
        _ranges_intersect,
    )

    v = IncrementalJoinView(str(tmp_path / "v"), key="k", n_buckets=4)
    rows = [(f"key-{i:03d}", i) for i in range(50)]
    v.ingest_left(spark.createDataFrame(rows, "k string, a int"), batch_id="l0")
    m = v._bucket_manifest(v._batch_dir("store", "left", "l0"))
    assert m, "manifest must exist"
    got = {}
    df = v._read_side(spark, "left")
    for r in df.selectExpr(
        "pmod(xxhash64(k), 4) AS b", "k"
    ).groupBy("b").agg(
        {"k": "min"}
    ).collect():
        got[int(r["b"])] = r["min(k)"]
    for b, (lo, hi) in m.items():
        assert lo is not None and hi is not None
        assert lo <= got[b] <= hi

    # unknown ranges are conservative: always intersect
    assert _ranges_intersect(None, None, "a", "z")
    assert _ranges_intersect("a", "z", None, None)


# ---------------------------------------------------------------------
# JPEG codec (operators/jpeg.py, VERDICT r5 task #4)
# ---------------------------------------------------------------------


def test_jpeg_constant_images_roundtrip_exactly():
    """Hand-computed anchor: the DCT of a constant block is a lone DC
    coefficient (square row sums of the basis vanish for u>0). At high
    quality the DC step is <= 3, so the worst reconstruction error per
    channel (step/16 through the color matrix, < 0.5) vanishes in the
    final rint -- constant images round-trip BIT-EXACTLY, including
    non-multiple-of-8 dims. (At q50 the 16-wide DC step makes even
    constants off-by-one: lossy means lossy.)"""
    from etl_world_banks_with_python_and_postgresql_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for w, h in ((8, 8), (11, 9), (17, 23)):
        for val in ((120, 64, 200), (0, 255, 128)):
            px = [val] * (w * h)
            for q in (90, 95, 100):
                got_w, got_h, nc, out = decode_jpeg(
                    encode_jpeg(px, w, h, quality=q)
                )
                assert (got_w, got_h, nc) == (w, h, 3)
                assert out == px, (w, h, val, q)
    # grayscale too
    g = [77] * (13 * 7)
    assert decode_jpeg(encode_jpeg(g, 13, 7))[3] == g


def test_jpeg_handcrafted_minimal_stream_decodes_per_spec():
    """A minimal 8x8 grayscale baseline stream built BY HAND (not via
    the encoder): quant all-ones, one DC coefficient 576, AC all zero.
    Dequantized DC 576 -> IDCT 576/8 = 72 -> +128 = constant 200. This
    pins the decoder against the spec independently of the encoder (a
    shared systematic error -- e.g. a mirrored zigzag on both sides --
    cannot cancel here)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_meta,
    )

    dqt = b"\xff\xdb" + bytes([0, 67, 0]) + bytes([1] * 64)
    sof = b"\xff\xc0" + bytes([0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    dht_dc = (
        b"\xff\xc4"
        + bytes([0, 20, 0x00])
        + bytes([0, 1] + [0] * 14)  # one code of length 2 -> '00'
        + bytes([10])  # symbol: DC category 10
    )
    dht_ac = (
        b"\xff\xc4"
        + bytes([0, 20, 0x10])
        + bytes([1] + [0] * 15)  # one code of length 1 -> '0'
        + bytes([0x00])  # symbol: EOB
    )
    sos = b"\xff\xda" + bytes([0, 8, 1, 1, 0x00, 0, 63, 0])
    # bits: DC code '00', magnitude 576 = '1001000000', EOB '0', pad 111
    entropy = bytes([0b00100100, 0b00000111])
    data = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy
        + b"\xff\xd9"
    )
    assert decode_jpeg_meta(data) == (8, 8, 1, "baseline")
    w, h, nc, px = decode_jpeg(data)
    assert (w, h, nc) == (8, 8, 1)
    assert px == [200] * 64


def test_jpeg_gradient_within_quantization_bound():
    """Smooth linear gradients (the z99 fixture pattern) decode within
    a tight bound at q95 in both 4:4:4 and 4:2:0, and restart-marker
    streams decode IDENTICALLY (same coefficients, segmented entropy)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 22, 17
    px = [
        (20 + 2 * x + 3 * y, 30 + 3 * x + y, 25 + x + 2 * y)
        for y in range(h)
        for x in range(w)
    ]

    def max_err(out):
        return max(
            max(abs(a - b) for a, b in zip(p, q)) for p, q in zip(px, out)
        )

    out_444 = decode_jpeg(encode_jpeg(px, w, h, quality=95))[3]
    assert max_err(out_444) <= 4
    out_420 = decode_jpeg(encode_jpeg(px, w, h, quality=95, subsample="420"))[3]
    assert max_err(out_420) <= 4
    out_rst = decode_jpeg(
        encode_jpeg(px, w, h, quality=95, restart_interval=2)
    )[3]
    assert out_rst == out_444


def test_jpeg_error_paths_and_table_validity():
    from etl_world_banks_with_python_and_postgresql_spark.operators import jpeg

    # Huffman specs are internally valid canonical tables
    for bits, vals in (
        jpeg.HUFF_DC_LUMA, jpeg.HUFF_DC_CHROMA,
        jpeg.HUFF_AC_LUMA, jpeg.HUFF_AC_CHROMA,
    ):
        codes = jpeg.canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        assert len({(c, l) for c, l in codes.values()}) == len(vals)

    data = jpeg.encode_jpeg([(9, 9, 9)] * 64, 8, 8)
    import pytest as _pytest

    # genuinely unsupported modes -> NotImplementedError at the plug
    # point (SOF2 progressive and SOF3 lossless are now decoded for
    # real, see test_jpeg_progressive_* / test_jpeg_lossless_*)
    diff_seq = data.replace(b"\xff\xc0", b"\xff\xc5", 1)
    with _pytest.raises(NotImplementedError, match="differential"):
        jpeg.decode_jpeg(diff_seq)
    arith = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg.decode_jpeg(arith)
    # a baseline stream relabeled SOF3 carries Ss=0, which is not a
    # valid lossless predictor -> ValueError, not a silent wrong decode
    lossless = data.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with _pytest.raises(ValueError, match="predictor"):
        jpeg.decode_jpeg(lossless)
    # a baseline stream relabeled SOF2 has a scan header that is
    # invalid for a progressive DC scan (Se must be 0) -> ValueError,
    # not a silent wrong decode
    relabeled = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError):
        jpeg.decode_jpeg(relabeled)
    # truncation -> ValueError
    with _pytest.raises(ValueError):
        jpeg.decode_jpeg(data[: len(data) // 2])
    with _pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"not a jpeg at all")


def test_jpeg_pixel_stats_operator(spark):
    """Spark leg: attach real JFIF payloads, decode, gate vs source."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(i, 100 + 17 * i) for i in range(20)], "doc_id long, n_chars long"
    )
    got = (
        multimodal.decode_jpeg_pixel_stats(
            multimodal.attach_jpeg_binary(docs)
        )
        .orderBy("doc_id")
        .collect()
    )
    assert len(got) == 20
    for r in got:
        assert r["width"] == 6 + r["doc_id"] % 19
        assert r["n_pixels"] == r["width"] * r["height"]
        assert r["n_components"] == 3
        assert r["within_tol"] and r["max_abs_err"] <= 4

    # decode_image_pixels takes the same payloads through the luma path
    px = (
        multimodal.decode_image_pixels(
            multimodal.attach_jpeg_binary(docs)
        )
        .selectExpr("doc_id", "size(pixels) AS n")
        .orderBy("doc_id")
        .collect()
    )
    assert [r["n"] for r in px] == [
        (6 + i % 19) * (5 + (100 + 17 * i) % 18) for i in range(20)
    ]


def test_exact_substring_dedup_semantics(spark):
    """Lee-et-al span removal pinned on hand-built docs: cross-doc
    duplicated grams removed from BOTH docs, within-doc repeats count
    as duplicated (total occurrences >= 2), unique text survives
    verbatim (lower/whitespace-normalized), and a fully-duplicated doc
    cleans to the empty string."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        exact_substring_dedup,
    )

    shared = "alpha beta gamma delta"  # 4 tokens: one 4-gram
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique one tail"),
            (2, f"other head {shared}"),
            (3, "totally fresh words nobody repeats"),
            (4, f"{shared}"),
            (5, "x y x y x y x y"),  # within-doc repeated grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in exact_substring_dedup(docs, k=4).collect()
    }
    assert got[1]["cleaned_text"] == "unique one tail"
    assert got[1]["n_dup_tokens"] == 4
    assert got[2]["cleaned_text"] == "other head"
    assert got[3]["cleaned_text"] == "totally fresh words nobody repeats"
    assert got[3]["n_dup_tokens"] == 0
    assert got[4]["cleaned_text"] == "" and got[4]["n_dup_tokens"] == 4
    # "x y x y" starts at 0,2,4 (and "y x y x" at 1,3): every 4-gram
    # occurs >= 2 times -> whole doc covered
    assert got[5]["cleaned_text"] == "" and got[5]["n_dup_tokens"] == 8
    for r in got.values():
        assert r["n_tokens"] - r["n_dup_tokens"] == (
            len(r["cleaned_text"].split()) if r["cleaned_text"] else 0
        )


def test_cdc_join_view_updates_and_deletes(spark, tmp_path):
    """Retraction-capable IVM (z-set formulation): updates (-old +new)
    and deletes (-row) maintained incrementally -- the final view must
    equal the from-scratch join of the CURRENT table states, with no
    store rewrite; a replayed batch stays a no-op; pair multiplicities
    telescope to (sum mA)(sum mB)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcJoinView,
        signed,
    )

    v = CdcJoinView(str(tmp_path / "v"), key="k", n_buckets=8)
    L = spark.createDataFrame

    cust0 = L([(1, "ann"), (2, "bob"), (3, "cal")], "k int, name string")
    ord0 = L(
        [(1, 10), (1, 11), (2, 20), (3, 30)], "k int, order_id int"
    )
    v.ingest_left(signed(cust0, +1), batch_id="c0")
    v.ingest_right(signed(ord0, +1), batch_id="o0")

    # update customer 2's name: retract old, insert new, ONE batch
    upd = signed(L([(2, "bob")], "k int, name string"), -1).unionByName(
        signed(L([(2, "robert")], "k int, name string"), +1)
    )
    v.ingest_left(upd, batch_id="c1")
    # delete order 11 and customer 3 entirely
    v.ingest_right(signed(L([(1, 11)], "k int, order_id int"), -1), "o1")
    v.ingest_left(signed(L([(3, "cal")], "k int, name string"), -1), "c2")

    got = sorted(
        tuple(r)
        for r in v.read(spark).select("k", "name", "order_id", "n_copies").collect()
    )
    assert got == [(1, "ann", 10, 1), (2, "robert", 20, 1)]

    # replayed retraction batch: ledger no-op, view unchanged
    v.ingest_left(signed(L([(3, "cal")], "k int, name string"), -1), "c2")
    assert sorted(
        tuple(r)
        for r in v.read(spark).select("k", "name", "order_id", "n_copies").collect()
    ) == got

    # multiset semantics: net multiplicity is the product-sum, exposed
    v.ingest_right(signed(L([(1, 10)], "k int, order_id int"), +1), "o2")
    rows = {
        (r["k"], r["order_id"]): r["n_copies"]
        for r in v.read(spark).collect()
    }
    assert rows[(1, 10)] == 2  # order row now present twice

    # missing multiplicity column fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="_mult"):
        v.ingest_left(L([(9, "eve")], "k int, name string"), "bad")


def test_cdc_join_view_compaction(spark, tmp_path):
    """compact() folds the history into one net batch per side + one
    consolidated view batch: the view is unchanged, future ingests keep
    working against the compacted stores, a replay of a compacted-away
    batch id is STILL a no-op (seen-tombstones), and the old batch dirs
    are gone from disk."""
    import os

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcJoinView,
        signed,
    )

    L = spark.createDataFrame
    v = CdcJoinView(str(tmp_path / "v"), key="k", n_buckets=8)
    v.ingest_left(signed(L([(1, "a"), (2, "b")], "k int, name string"), +1), "c0")
    v.ingest_right(signed(L([(1, 10), (2, 20)], "k int, oid int"), +1), "o0")
    v.ingest_left(  # update k=2
        signed(L([(2, "b")], "k int, name string"), -1).unionByName(
            signed(L([(2, "bee")], "k int, name string"), +1)
        ),
        "c1",
    )
    before = sorted(tuple(r) for r in v.read(spark).collect())

    v.compact(spark)
    assert sorted(tuple(r) for r in v.read(spark).collect()) == before
    # ONE batch per side remains on disk
    for side in ("left", "right"):
        dirs = os.listdir(os.path.join(str(tmp_path / "v"), "store"))
        assert sum(1 for d in dirs if d.startswith(f"batch={side}-")) == 1

    # replay of a pre-compaction batch id: tombstoned, still a no-op
    v.ingest_left(
        signed(L([(2, "b")], "k int, name string"), -1).unionByName(
            signed(L([(2, "bee")], "k int, name string"), +1)
        ),
        "c1",
    )
    assert sorted(tuple(r) for r in v.read(spark).collect()) == before

    # history continues against the compacted stores
    v.ingest_right(signed(L([(2, 21)], "k int, oid int"), +1), "o1")
    after = sorted(tuple(r) for r in v.read(spark).collect())
    assert after == sorted(
        before + [(2, "bee", 21, 1)]
    )


def test_cdc_agg_view_insert_update_delete(spark, tmp_path):
    """Linear-aggregate IVM: signed ingests maintain groupBy count/sum
    with NO reads of prior state; read() equals a from-scratch
    aggregate of the net state; replays and compaction preserve it."""
    import os

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcAggView,
        signed,
    )

    L = spark.createDataFrame
    rows = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)]
    schema = "id int, grp string, v int"
    v = CdcAggView(
        str(tmp_path / "v"),
        keys=["grp"],
        measures={"total": "CAST(v AS DECIMAL(20,0))"},
        n_partitions=2,
    )
    v.ingest(signed(L(rows[:2], schema), +1), "b0")
    v.ingest(signed(L(rows[2:], schema), +1), "b1")
    # update id=2: v 20 -> 25; delete id=3
    v.ingest(
        signed(L([(2, "a", 20)], schema), -1)
        .unionByName(signed(L([(2, "a", 25)], schema), +1))
        .unionByName(signed(L([(3, "b", 30)], schema), -1)),
        "b2",
    )
    got = {r["grp"]: (r["n_rows"], int(r["total"])) for r in v.read(spark).collect()}
    assert got == {"a": (2, 35), "b": (1, 40)}

    # replay of an applied batch: no-op
    v.ingest(signed(L([(3, "b", 30)], schema), -1), "b2")
    assert {r["grp"]: (r["n_rows"], int(r["total"])) for r in v.read(spark).collect()} == got

    # delete the last 'b' row: the group goes net-dead and disappears
    v.ingest(signed(L([(4, "b", 40)], schema), -1), "b3")
    assert [r["grp"] for r in v.read(spark).collect()] == ["a"]

    # compaction folds 4 partial batches into 1; state + tombstones hold
    v.compact(spark)
    pdirs = os.listdir(os.path.join(str(tmp_path / "v"), "partial"))
    assert len([d for d in pdirs if d.startswith("batch=")]) == 1
    assert {r["grp"]: (r["n_rows"], int(r["total"])) for r in v.read(spark).collect()} == {
        "a": (2, 35)
    }
    v.ingest(signed(L([(4, "b", 40)], schema), -1), "b3")  # compacted-away id
    assert [r["grp"] for r in v.read(spark).collect()] == ["a"]


def test_cdc_agg_view_rejects_float_measures(spark, tmp_path):
    import pytest as _pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcAggView,
        signed,
    )

    v = CdcAggView(str(tmp_path / "v"), keys=["grp"], measures={"t": "v"})
    delta = signed(
        spark.createDataFrame([(1, "a", 1.5)], "id int, grp string, v double"), +1
    )
    with _pytest.raises(ValueError, match="retraction-exact"):
        v.ingest(delta, "b0")
    with _pytest.raises(ValueError, match="_mult"):
        v.ingest(delta.drop("_mult"), "b1")


def test_kmv_source_overlap_exact_when_unsaturated_and_bounded_when_not(spark):
    """Unsaturated pair sketches (union distinct < k) return EXACT
    union/intersection/Jaccard; saturated ones estimate within the
    standard KMV relative-error band (~1/sqrt(k))."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.sketch import (
        kmv_source_overlap,
    )

    # small: A = 0..59, B = 30..89 -> union 90, intersect 30, J = 1/3
    rows = [("A", f"v{i}") for i in range(60)] + [
        ("B", f"v{i}") for i in range(30, 90)
    ]
    df = spark.createDataFrame(rows, "source string, val string")
    r = kmv_source_overlap(df, "val", k=256).collect()[0]
    assert (r["n_kept"], r["est_union"], r["est_intersect"]) == (90, 90, 30)
    assert r["jaccard_micros"] == (30 * 1_000_000) // 90

    # large: A = 0..1999, B = 1000..2999 -> union 3000, intersect 1000
    rows = [("A", f"v{i}") for i in range(2000)] + [
        ("B", f"v{i}") for i in range(1000, 3000)
    ]
    df = spark.createDataFrame(rows, "source string, val string")
    r = kmv_source_overlap(df, "val", k=256).collect()[0]
    assert r["n_kept"] == 256
    # 1/sqrt(256) ~ 6% band; allow 4 sigma
    assert abs(r["est_union"] - 3000) < 3000 * 0.25
    assert abs(r["est_intersect"] - 1000) < 1000 * 0.5
    assert abs(r["jaccard_micros"] / 1e6 - 1 / 3) < 0.15


def test_incremental_join_view_compaction(spark, tmp_path):
    """Insert-only compaction: history folds to one store batch per side
    + one view batch (a plain rewrite, no z-set math), the view is
    unchanged, compacted-away batch ids replay as no-ops, and future
    ingests keep joining against the folded stores."""
    import os

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        IncrementalJoinView,
    )

    L = spark.createDataFrame
    v = IncrementalJoinView(str(tmp_path / "v"), key="k", n_buckets=4)
    v.ingest_left(L([(1, "a"), (2, "b")], "k int, name string"), "c0")
    v.ingest_right(L([(1, 10)], "k int, oid int"), "o0")
    v.ingest_left(L([(3, "c")], "k int, name string"), "c1")
    v.ingest_right(L([(2, 20), (3, 30)], "k int, oid int"), "o1")
    before = sorted(tuple(r) for r in v.read(spark).collect())
    assert len(before) == 3

    v.compact(spark)
    dirs = os.listdir(os.path.join(str(tmp_path / "v"), "store"))
    for side in ("left", "right"):
        assert sum(1 for d in dirs if d.startswith(f"batch={side}-")) == 1
    assert sorted(tuple(r) for r in v.read(spark).collect()) == before

    v.ingest_left(L([(3, "c")], "k int, name string"), "c1")  # tombstoned
    assert sorted(tuple(r) for r in v.read(spark).collect()) == before

    v.ingest_right(L([(1, 11)], "k int, oid int"), "o2")
    assert sorted(tuple(r) for r in v.read(spark).collect()) == sorted(
        before + [(1, "a", 11)]
    )


def test_ivm_views_as_of_time_travel(spark, tmp_path):
    """read(as_of=n) returns the state after the first n ledger entries
    for all three view flavors; compaction collapses the addressable
    history (the views' vacuum)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcAggView,
        CdcJoinView,
        signed,
    )

    L = spark.createDataFrame
    j = CdcJoinView(str(tmp_path / "j"), key="k", n_buckets=4)
    j.ingest_left(signed(L([(1, "a"), (2, "b")], "k int, n string"), +1), "c0")
    j.ingest_right(signed(L([(1, 10), (2, 20)], "k int, o int"), +1), "o0")
    j.ingest_right(signed(L([(2, 20)], "k int, o int"), -1), "o1")
    assert j.read(spark, as_of=2).count() == 2  # before the delete wave
    assert j.read(spark).count() == 1

    a = CdcAggView(
        str(tmp_path / "a"), keys=["g"], measures={}, n_partitions=2
    )
    a.ingest(signed(L([(1, "x"), (2, "x")], "id int, g string"), +1), "b0")
    a.ingest(signed(L([(2, "x")], "id int, g string"), -1), "b1")
    assert a.read(spark, as_of=1).collect()[0]["n_rows"] == 2
    assert a.read(spark).collect()[0]["n_rows"] == 1

    a.compact(spark)  # history collapses: as_of=1 is now the whole state
    assert a.read(spark, as_of=1).collect()[0]["n_rows"] == 1


def test_compaction_crash_leaves_old_state_readable(spark, tmp_path):
    """A crash ANYWHERE before compaction's atomic ledger swap leaves
    the old ledger in force: reads still see the pre-compact state, and
    a rerun completes the fold cleanly (overwrite semantics)."""
    import pytest as _pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcJoinView,
        signed,
    )

    L = spark.createDataFrame
    v = CdcJoinView(str(tmp_path / "v"), key="k", n_buckets=4)
    v.ingest_left(signed(L([(1, "a"), (2, "b")], "k int, n string"), +1), "c0")
    v.ingest_right(signed(L([(1, 10), (2, 20)], "k int, o int"), +1), "o0")
    v.ingest_right(signed(L([(2, 20)], "k int, o int"), -1), "o1")
    before = sorted(tuple(r) for r in v.read(spark).collect())
    ledger_before = v._load_ledger()

    real = v._commit_ledger

    def boom(*a, **kw):
        raise RuntimeError("crash before the atomic cutover")

    v._commit_ledger = boom
    with _pytest.raises(RuntimeError, match="cutover"):
        v.compact(spark)
    v._commit_ledger = real
    # old ledger still in force: state unchanged, history intact
    assert v._load_ledger() == ledger_before
    assert sorted(tuple(r) for r in v.read(spark).collect()) == before

    v.compact(spark)  # rerun completes
    assert len(v._load_ledger()) == 2
    assert sorted(tuple(r) for r in v.read(spark).collect()) == before


def test_maybe_compact_policy(spark, tmp_path):
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcAggView,
        signed,
    )

    v = CdcAggView(str(tmp_path / "v"), keys=["g"], measures={}, n_partitions=2)
    for i in range(5):
        v.ingest(
            signed(spark.createDataFrame([(i, "x")], "id int, g string"), +1),
            f"b{i}",
        )
        # only i=3 crosses the threshold; after its fold the ledger is
        # 1 entry again, so i=4 correctly does not compact
        assert v.maybe_compact(spark, max_applied=3) == (i == 3)
    # after the i=3 compaction (4 entries -> 1), i=4 adds one more (2);
    # state is intact throughout
    assert len(v._load_ledger()) == 2
    assert v.read(spark).collect()[0]["n_rows"] == 5


def test_auto_batch_ids_survive_compaction(spark, tmp_path):
    """REGRESSION (round-6 verdict, confirmed data loss): auto-derived
    batch ids must stay monotonic ACROSS compaction. Before the fix the
    auto counter restarted from the collapsed applied list, regenerated
    an id already in the compaction tombstones, and the replay check
    silently dropped the new delta -- permanently, for every subsequent
    auto-id ingest. All three view classes share the pattern."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcAggView,
        CdcJoinView,
        IncrementalJoinView,
        signed,
    )

    L = spark.createDataFrame

    # --- CdcAggView: the verdict's live repro ---
    a = CdcAggView(str(tmp_path / "a"), keys=["g"], measures={}, n_partitions=2)
    for i in range(3):
        assert a.ingest(
            signed(L([(i, "x")], "id int, g string"), +1)
        ) == "applied"
    a.compact(spark)
    assert a.ingest(
        signed(L([(99, "x")], "id int, g string"), +1)
    ) == "applied"
    assert a.read(spark).collect()[0]["n_rows"] == 4  # was 3 (dropped)
    # and it keeps working on every later auto-id ingest
    assert a.ingest(
        signed(L([(100, "x")], "id int, g string"), +1)
    ) == "applied"
    assert a.read(spark).collect()[0]["n_rows"] == 5

    # --- CdcJoinView ---
    j = CdcJoinView(str(tmp_path / "j"), key="k", n_buckets=4)
    assert j.ingest_left(
        signed(L([(1, "a"), (2, "b")], "k int, n string"), +1)
    ) == "applied"
    assert j.ingest_right(signed(L([(1, 10)], "k int, o int"), +1)) == "applied"
    assert j.ingest_right(signed(L([(2, 20)], "k int, o int"), +1)) == "applied"
    j.compact(spark)
    assert j.ingest_left(
        signed(L([(3, "c")], "k int, n string"), +1)
    ) == "applied"
    assert j.ingest_right(signed(L([(3, 30)], "k int, o int"), +1)) == "applied"
    got = sorted((r["k"], r["n"], r["o"]) for r in j.read(spark).collect())
    assert got == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]

    # --- IncrementalJoinView (insert-only parent) ---
    v = IncrementalJoinView(str(tmp_path / "v"), key="k", n_buckets=4)
    assert v.ingest_left(L([(1, "a")], "k int, n string")) == "applied"
    assert v.ingest_left(L([(2, "b")], "k int, n string")) == "applied"
    assert v.ingest_left(L([(3, "c")], "k int, n string")) == "applied"
    assert v.ingest_right(L([(1, 10), (2, 20), (3, 30)], "k int, o int")) == "applied"
    v.compact(spark)
    assert v.ingest_left(L([(4, "d")], "k int, n string")) == "applied"
    assert v.ingest_right(L([(4, 40)], "k int, o int")) == "applied"
    assert v.read(spark).count() == 4


def test_ingest_replay_status_is_observable(spark, tmp_path):
    """A replayed batch id must be reported, not silently absorbed: the
    round-6 data-loss bug survived 1,000+ tests precisely because a
    dropped ingest was indistinguishable from an applied one."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcAggView,
        CdcJoinView,
        signed,
    )

    L = spark.createDataFrame
    a = CdcAggView(str(tmp_path / "a"), keys=["g"], measures={}, n_partitions=2)
    d = signed(L([(1, "x")], "id int, g string"), +1)
    assert a.ingest(d, batch_id="b0") == "applied"
    assert a.ingest(d, batch_id="b0") == "replayed"
    # tombstoned ids replay too (post-compaction late retry)
    a.ingest(signed(L([(2, "x")], "id int, g string"), +1), batch_id="b1")
    a.compact(spark)
    assert a.ingest(d, batch_id="b0") == "replayed"
    assert a.read(spark).collect()[0]["n_rows"] == 2

    j = CdcJoinView(str(tmp_path / "j"), key="k", n_buckets=4)
    dl = signed(L([(1, "a")], "k int, n string"), +1)
    assert j.ingest_left(dl, batch_id="c0") == "applied"
    assert j.ingest_left(dl, batch_id="c0") == "replayed"


def test_footer_stats_unordered_types_never_prune(spark, tmp_path):
    """DECIMAL (and any other type whose parquet footer stat does not
    round-trip to a natively-ordered Python value) must degrade its
    bucket manifest to [None, None] = always-intersecting, NOT fall
    back to str(): lexicographic '99' > '110' would invert min/max and
    range-prune buckets that DO contain matching join keys (ADVICE r6:
    silently dropped pairs). Pinned: decimal-key manifests are fully
    unknown, and the join over values straddling the 99-vs-110 string
    trap is complete."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        IncrementalJoinView,
    )

    v = IncrementalJoinView(str(tmp_path / "v"), key="k", n_buckets=2)
    left = spark.createDataFrame(
        [(99, "a"), (110, "b"), (500, "c")], "k0 int, n string"
    ).selectExpr("CAST(k0 AS DECIMAL(10,0)) AS k", "n")
    right = spark.createDataFrame(
        [(110, 1), (500, 2)], "k0 int, o int"
    ).selectExpr("CAST(k0 AS DECIMAL(10,0)) AS k", "o")
    v.ingest_left(left, "l0")
    # every decimal bucket manifest entry is [None, None]
    for s, b in v._load_ledger():
        m = v._bucket_manifest(v._batch_dir("store", s, b))
        assert m and all(entry == [None, None] for entry in m.values())
    v.ingest_right(right, "r0")
    got = sorted((int(r["k"]), r["n"], r["o"]) for r in v.read(spark).collect())
    assert got == [(110, "b", 1), (500, "c", 2)]

    # int keys still produce real (ordered, prunable) manifests
    v2 = IncrementalJoinView(str(tmp_path / "v2"), key="k", n_buckets=2)
    v2.ingest_left(spark.createDataFrame([(99, "a"), (110, "b")], "k int, n string"), "l0")
    m = v2._bucket_manifest(v2._batch_dir("store", "left", "l0"))
    assert any(entry != [None, None] for entry in m.values())
    for lo, hi in m.values():
        if lo is not None:
            assert lo <= hi


def test_chunk_documents_provenance_reconstruction_and_no_shuffle(spark):
    """Chunk invariants: (1) begin_tok/n_tokens provenance reconstructs
    the original token stream exactly (take each chunk's first `stride`
    tokens, the last chunk whole); (2) short docs single-chunk; (3)
    empty docs yield one empty chunk (the ws_tokens [''] contract); (4)
    the plan contains NO exchange -- chunking is scan-stage-parallel."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        chunk_documents,
    )

    rows = [
        (1, " ".join(f"t{i}" for i in range(11))),  # 2 chunks, short tail
        (2, "a b c"),                               # single chunk
        (3, ""),                                    # empty
        (4, " ".join(f"x{i}" for i in range(16))),  # exact 2-stride fit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    stride = 6
    for doc_id, text in rows:
        toks = text.strip().lower().split(" ") if True else []
        # ws_tokens('') == [''], mirrored here
        chunks = by_doc[doc_id]
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        # provenance: begin_tok arithmetic + coverage
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt += c["chunk_text"].split(" ")[:stride]
        rebuilt += chunks[-1]["chunk_text"].split(" ")
        assert rebuilt == toks, (doc_id, rebuilt, toks)
        for c in chunks:
            assert c["begin_tok"] == c["chunk_idx"] * stride
            got = toks[c["begin_tok"]: c["begin_tok"] + 8]
            assert c["chunk_text"] == " ".join(got)
            assert c["n_tokens"] == len(got)
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 1
    assert by_doc[3][0]["chunk_text"] == "" and by_doc[3][0]["n_tokens"] == 1

    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_kmv_agg_view_incremental_equals_oneshot(spark, tmp_path):
    """KmvAggView invariants: (1) ingesting in batches + compacting
    mid-stream reads back the SAME sketch/estimates as a one-shot
    kmv-style sketch over the full corpus (bottom-k is commutative,
    associative, idempotent); (2) a replayed batch id is absorbed; (3)
    re-ingesting identical CONTENT under a new id cannot change read()
    (idempotence -- stronger than CdcAggView's linearity); (4) unsaturated
    groups report the EXACT distinct count."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import (
        sketch as S,
    )
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        KmvAggView,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.01").select(
        "lang", "text", "doc_id"
    )
    v = KmvAggView(
        str(tmp_path / "kmv"), keys=["lang"], value_expr="text", k=64,
        n_partitions=2,
    )
    for i in range(4):
        assert v.ingest(docs.filter(F.col("doc_id") % 4 == i), f"b{i}") == "applied"
        if i == 2:
            assert v.compact(spark)

    got = {r["lang"]: r["est_distinct"] for r in v.read(spark).collect()}
    want = {
        r["lang"]: r["est_distinct"]
        for r in S.kmv_distinct(docs, "text", k=64, group_by="lang").collect()
    }
    assert got == want

    # replayed id: no-op even after compaction tombstoned it
    assert v.ingest(docs.limit(5), "b0") == "replayed"
    # idempotence: same CONTENT under a fresh id cannot move the view
    assert v.ingest(docs.filter(F.col("doc_id") % 4 == 1), "dup") == "applied"
    assert {r["lang"]: r["est_distinct"] for r in v.read(spark).collect()} == got

    # unsaturated exactness: a tiny view reports exact distincts
    tiny = docs.filter(F.col("doc_id") < 40)
    v2 = KmvAggView(
        str(tmp_path / "kmv2"), keys=["lang"], value_expr="text", k=256,
        n_partitions=2,
    )
    v2.ingest(tiny, "t0")
    exact = {
        (r["lang"]): r["n"]
        for r in tiny.groupBy("lang").agg(
            F.countDistinct("text").alias("n")
        ).collect()
    }
    assert {r["lang"]: r["est_distinct"] for r in v2.read(spark).collect()} == exact


def test_kmv_agg_view_streaming_sink_exactly_once(spark, tmp_path):
    """The generic agg-view sink maintains a KmvAggView from a document
    stream (plain rows, no signed deltas); a re-drain from a fresh
    checkpoint replays epoch ids that the ledger absorbs, leaving the
    estimates unchanged."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        KmvAggView,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_agg_view_sink,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001").select(
        "lang", "text", "doc_id"
    )
    src = str(tmp_path / "in")
    docs.write.parquet(src)
    view = KmvAggView(
        str(tmp_path / "kmv"), keys=["lang"], value_expr="text", k=64,
        n_partitions=2,
    )

    def run_once(i):
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(streaming_agg_view_sink(view))
            .option("checkpointLocation", str(tmp_path / f"ck{i}"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once(0)
    first = {r["lang"]: r["est_distinct"] for r in view.read(spark).collect()}
    assert first  # non-empty
    run_once(1)  # same epoch ids from a fresh checkpoint -> ledger no-op
    assert {r["lang"]: r["est_distinct"] for r in view.read(spark).collect()} == first


def test_profile_table_nulls_exact_distincts_and_one_pass(spark):
    """Profile semantics: NULLs count into n_null and are excluded from
    min/max and distinct; columns under k report EXACT distinct counts;
    the plan carries no per-column rescans (one stacked scan)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, None, 1.5), (4, "a", -2.0)],
        "id int, s string, x double",
    )
    out = {r["column"]: r for r in profile_table(df, k=256).collect()}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct_est"] == 4
    assert (out["id"]["min_str"], out["id"]["max_str"]) == ("1", "4")
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct_est"] == 2
    assert (out["s"]["min_str"], out["s"]["max_str"]) == ("a", "b")
    assert out["x"]["n_null"] == 1 and out["x"]["n_distinct_est"] == 2
    # string-form min/max, documented: '-2.0' < '1.5' lexicographically
    assert (out["x"]["min_str"], out["x"]["max_str"]) == ("-2.0", "1.5")

    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    # one stacked scan feeds both aggregates: the source appears via a
    # reused exchange or <= 2 scans, never one per column
    assert plan.count("LocalTableScan") <= 2, plan


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """Semantic pin: a planted value = linear trend + weekly cycle
    decomposes back -- seasonal estimates reproduce the planted cycle
    shape (up to the non-normalized mean offset), trend is NULL exactly
    on the edge days, and value ~= trend + seasonal + residual."""
    from datetime import datetime

    from etl_world_banks_with_python_and_postgresql_spark.operators.timeseries import (
        seasonal_decompose,
    )

    cycle = [0.0, 10.0, -5.0, 3.0, 7.0, -8.0, 2.0]
    rows = [
        (datetime(2024, 3, 1 + d, 12), 100.0 + 2.0 * d + cycle[d % 7])
        for d in range(28)  # 4 exact weeks
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = sorted(
        seasonal_decompose(df, period=7).collect(), key=lambda r: r["day"]
    )
    assert len(out) == 28
    # edge days: 3 each side NULL trend/residual, seasonal always set
    for i, r in enumerate(out):
        if i < 3 or i >= 25:
            assert r["trend"] is None and r["residual"] is None
        else:
            assert r["trend"] is not None
            v = r["value_micros"] / 1e6
            assert abs(v - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-6
        assert r["seasonal"] is not None
    # seasonal shape: pairwise differences reproduce the planted cycle
    # (the non-normalized variant carries a common offset)
    seas = {}
    for i, r in enumerate(out):
        seas.setdefault(i % 7, r["seasonal"])
    base = seas[0] - cycle[0]
    for j in range(7):
        assert abs((seas[j] - cycle[j]) - base) < 0.5, (j, seas)
    # trend on interior days tracks the planted slope (2.0/day)
    mids = [r["trend"] for r in out[3:25]]
    diffs = [b - a for a, b in zip(mids, mids[1:])]
    assert all(abs(d - 2.0) < 0.5 for d in diffs)


def test_grouped_variants_equal_per_slice_runs(spark):
    """group_by generalizations are slice-equivalent: profiling or
    decomposing per group returns exactly what an ungrouped run over
    each group's slice returns (the production multi-series shape
    without the global window / whole-table scan per series)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        profile_table,
    )
    from etl_world_banks_with_python_and_postgresql_spark.operators.timeseries import (
        seasonal_decompose,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    prof = profile_table(docs, columns=["lang", "n_chars"], group_by="source")
    got = sorted(tuple(r) for r in prof.collect() if r["source"] == "src3")
    want = sorted(
        ("src3",) + tuple(r)
        for r in profile_table(
            docs.filter(F.col("source") == "src3"),
            columns=["lang", "n_chars"],
        ).collect()
    )
    assert got == want and len(got) == 2
    # default column list excludes the group column itself
    assert "source" not in {
        r["column"] for r in profile_table(docs, group_by="source").collect()
    }

    ev = load(spark, "events", "/root/testdata/sf0.001")
    dec = seasonal_decompose(ev, group_by="event_type")
    a = sorted(
        tuple(r)[1:] for r in dec.collect() if r["event_type"] == "click"
    )
    b = sorted(
        tuple(r)
        for r in seasonal_decompose(
            ev.filter(F.col("event_type") == "click")
        ).collect()
    )
    assert a == b and len(a) == 30
    # grouped plan: the MA window is PARTITIONED, never global
    plan = dec._jdf.queryExecution().optimizedPlan().toString()
    from etl_world_banks_with_python_and_postgresql_spark.plans.lint import (
        _has_global_window,
    )

    assert not _has_global_window(plan)


def test_lsh_multiprobe_recall_curve_and_vs_ivf(spark):
    """VERDICT r9 #5: sign-LSH multi-probe. Hamming-1 probing must
    (a) strictly contain the single-cell result set, (b) be monotone in
    recall, and (c) hold at least the IVF path's recall at the SAME
    candidate budget (4 of 8 cells probed = IVF n_probe=4 of 8)."""
    import random as _random

    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        ivf_topk,
        lsh_bucketed_topk,
        lsh_recall_curve,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    rng = _random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(3)]

    curve = lsh_recall_curve(emb, queries, planes, k=5)
    assert [c["hamming"] for c in curve] == [0, 1]
    assert [c["cells_probed"] for c in curve] == [1, 4]
    assert curve[1]["recall"] >= curve[0]["recall"]  # monotone

    # containment: every single-cell hit survives multi-probe (the probe
    # set is a superset, and top-k under the same order can only improve)
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_bucketed_topk(emb, queries, planes, k=5).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_bucketed_topk(
            emb, queries, planes, k=5, hamming=1
        ).collect()
    }
    # multi-probe can push a weaker single-cell hit out of the top-k only
    # by replacing it with a STRICTLY better neighbor; recall vs exact is
    # the gate below, containment here is on the candidate superset
    assert len(multi) >= len(single)

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    # the big multiprobe win on RANDOM planes: 2x+ the single-cell recall
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= 2 * r_single, (r_single, r_multi)

    # data-adapted planes at EQUAL candidate budget (4 of 8 cells probed
    # = IVF n_probe=4 of 8) must hold the IVF operating point
    # (small-data ties allowed, the kmeans-test tolerance)
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        data_adapted_hyperplanes,
    )

    adapted = data_adapted_hyperplanes(emb, 3)
    lsh_ad = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_bucketed_topk(
            emb, queries, adapted, k=5, hamming=1
        ).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, n_centroids=8, n_probe=4, k=5).collect()
    }
    r_lsh = len(exact & lsh_ad) / len(exact)
    r_ivf = len(exact & ivf) / len(exact)
    assert r_lsh >= r_ivf - 0.05, (r_lsh, r_ivf)
    assert r_lsh > 0.3


def test_lsh_multiprobe_rejects_unsupported_hamming(spark):
    import pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        lsh_bucketed_topk,
    )

    emb = load(spark, "embeddings", SF)
    with pytest.raises(ValueError, match="hamming=2"):
        lsh_bucketed_topk(emb, emb.limit(1), [[1.0] * 64], hamming=2)


def test_positional_index_size_controls_lossless(spark, tmp_path):
    """VERDICT r9 #6: gap-encoded positions + zstd must shrink the index
    while phrase results stay bit-identical, and a legacy
    absolute-positions index (no positions_encoding in stats) must
    still probe correctly."""
    import os
    import subprocess

    from etl_world_banks_with_python_and_postgresql_spark.committer import (
        commit_json,
        load_json,
    )
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        _build_postings,
        append_posting_index,
        phrase_search,
        phrase_search_indexed,
        token_count,
        write_posting_index,
    )
    from etl_world_banks_with_python_and_postgresql_spark.functions.xhash import (
        ws_tokens,
    )

    # long documents: repeat the corpus text so positions grow past the
    # gap sizes (where delta encoding actually pays)
    docs = (
        load(spark, "documents", SF)
        .select(
            "doc_id",
            F.concat_ws(" ", *[F.col("text")] * 10).alias("text"),
        )
    )
    phrase = ["the", "central", "bank"]

    def du(p):
        return int(subprocess.check_output(["du", "-sb", p]).split()[0])

    new_p = str(tmp_path / "idx_new")
    write_posting_index(docs, new_p, positional=True)
    stats, _ = load_json(os.path.join(new_p, "_postings_stats.json"))
    assert stats["positions_encoding"] == "delta"
    assert stats["compression"] == "zstd"

    # legacy layout: absolute positions + snappy, stats without the key
    old_p = str(tmp_path / "idx_old")
    toks = ws_tokens(F.col("text"))
    _build_postings(
        docs, toks, "text", "doc_id", 64, True, encoding="absolute"
    ).write.option("compression", "snappy").partitionBy("bucket").parquet(
        old_p
    )
    agg = docs.agg(
        F.count("*").alias("n"),
        F.sum(token_count(F.col("text")).cast("long")).alias("s"),
    ).collect()[0]
    commit_json(
        os.path.join(old_p, "_postings_stats.json"),
        {"n_docs": agg["n"], "sum_dl": agg["s"], "n_buckets": 64,
         "positional": True},
    )

    assert du(new_p) < du(old_p), (du(new_p), du(old_p))

    scan = [tuple(r) for r in phrase_search(docs, phrase, k=20).collect()]
    got_new = [
        tuple(r) for r in phrase_search_indexed(spark, new_p, phrase, k=20).collect()
    ]
    got_old = [
        tuple(r) for r in phrase_search_indexed(spark, old_p, phrase, k=20).collect()
    ]
    assert got_new == scan and got_old == scan  # bit-identical, both eras

    # appends inherit the index's own encoding (legacy stays absolute,
    # new stays delta) and phrase equivalence holds after the append
    extra = spark.createDataFrame(
        [(10**9, "the central bank of the central bank")],
        "doc_id long, text string",
    )
    both = docs.unionByName(extra)
    append_posting_index(extra, new_p)
    append_posting_index(extra, old_p)
    scan2 = [tuple(r) for r in phrase_search(both, phrase, k=20).collect()]
    assert [
        tuple(r) for r in phrase_search_indexed(spark, new_p, phrase, k=20).collect()
    ] == scan2
    assert [
        tuple(r) for r in phrase_search_indexed(spark, old_p, phrase, k=20).collect()
    ] == scan2


def test_epoch_shuffle_reproducible_and_seed_sensitive(spark):
    """An epoch is a function of the seed alone: same seed -> identical
    (shard, pos) per doc across independent runs; a new seed re-deals
    the order; (shard, pos) is a dense 1..n_s numbering per shard that
    covers every row exactly once."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        epoch_shuffle,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    n = docs.count()

    def order(seed):
        return {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in epoch_shuffle(docs, seed=seed, n_shards=4).collect()
        }

    a, b = order(7), order(7)
    assert a == b  # bit-reproducible epoch
    assert len(a) == n  # every row dealt exactly once
    assert order(8) != a  # new seed -> new deal

    # dense per-shard positions: pos is exactly 1..count(shard)
    by_shard: dict = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_stride_interleave_prefix_shares_and_validation(spark):
    """Stride scheduling's defining invariant: with weights a:2 b:1,
    every prefix of length 3k of the interleave_key order holds exactly
    2k a-rows and k b-rows; unlisted sources are excluded; bad weights
    fail fast."""
    import pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        stride_interleave,
    )

    rows = [(i, f"text {i}", "a" if i < 60 else ("b" if i < 90 else "c"))
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    out = stride_interleave(df, weights={"a": 2, "b": 1}).orderBy(
        "interleave_key", "source", "src_rank"
    )
    seq = [r["source"] for r in out.collect()]
    assert "c" not in seq  # whitelist semantics
    assert len(seq) == 90
    for k in range(1, 31):
        prefix = seq[: 3 * k]
        assert prefix.count("a") == 2 * k and prefix.count("b") == k

    with pytest.raises(ValueError):
        stride_interleave(df, weights={})
    with pytest.raises(ValueError):
        stride_interleave(df, weights={"a": 0})


def test_line_dedup_semantics(spark):
    """CCNet line-removal contract: a line is dropped iff it occurs in
    >= min_dup_docs DISTINCT docs and is >= min_line_chars long; order
    is preserved on rejoin; a fully-boilerplate doc survives as ''."""
    import pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        line_dedup,
    )

    rows = [
        (1, "alpha\nfooter\nbeta\n\nfooter"),  # footer dup'd, empty exempt
        (2, "footer\ngamma"),
        (3, "footer"),                          # all-boilerplate doc
        (4, "delta\ndelta"),                    # intra-doc repeat: 1 doc only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text_dedup"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in line_dedup(df, min_dup_docs=2, min_line_chars=1).collect()
    }
    assert out[1] == ("alpha\nbeta\n", 3, 2)  # order kept, empty line kept
    assert out[2] == ("gamma", 1, 1)
    assert out[3] == ("", 0, 1)
    assert out[4] == ("delta\ndelta", 2, 0)  # distinct-doc count, not total

    # exemption: with min_line_chars=7 the 6-char 'footer' is untouchable
    safe = {
        r["doc_id"]: r["n_lines_dropped"]
        for r in line_dedup(df, min_dup_docs=2, min_line_chars=7).collect()
    }
    assert safe == {1: 0, 2: 0, 3: 0, 4: 0}

    with pytest.raises(ValueError):
        line_dedup(df, min_dup_docs=1)


def test_build_vocab_and_encode_tokens(spark):
    """Vocabulary ids are dense 1..top_n in (count desc, token asc)
    order; encoding maps OOV to oov_id, preserves token order, and
    encodes empty docs as empty arrays."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        build_vocab,
        encode_tokens,
    )

    df = spark.createDataFrame(
        [(1, "b a b c"), (2, "a b zz"), (3, "")],
        "doc_id long, text string",
    )
    vocab = build_vocab(df, top_n=2)
    v = {r["tokn"]: (r["token_id"], r["n"]) for r in vocab.collect()}
    # counts: b=3, a=2, c=1, zz=1 -> top2 = b(id 1), a(id 2)
    assert v == {"b": (1, 3), "a": (2, 2)}

    out = {
        r["doc_id"]: (r["token_ids"], r["n_tokens"], r["n_oov"])
        for r in encode_tokens(df, vocab).collect()
    }
    assert out[1] == ([1, 2, 1, 0], 4, 1)  # c is OOV, order preserved
    assert out[2] == ([2, 1, 0], 3, 1)
    assert out[3] == ([], 0, 0)  # empty doc -> empty array

    # min_count prunes the long tail before the top-k
    v2 = build_vocab(df, top_n=10, min_count=2)
    assert {r["tokn"] for r in v2.collect()} == {"a", "b"}


def test_write_epoch_shards_layout_and_order(spark, tmp_path):
    """The on-disk epoch contract: one shard=K directory per shard,
    every row present exactly once, and each shard's rows PHYSICALLY in
    pos order (a sequential reader needs no sort)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        epoch_shuffle,
        write_epoch_shards,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    path = str(tmp_path / "epoch0")
    stats = write_epoch_shards(docs, path, seed=3, n_shards=4)
    assert stats["n_shards"] == 4
    assert stats["rows"] == docs.count()

    expect = {
        (r["shard"], r["pos"]): r["doc_id"]
        for r in epoch_shuffle(docs, seed=3, n_shards=4).collect()
    }
    for shard in range(4):
        rows = (
            spark.read.parquet(f"{path}/shard={shard}")
            .coalesce(1)
            .collect()
        )
        poss = [r["pos"] for r in rows]
        assert poss == sorted(poss)  # physical order IS pos order
        for r in rows:
            assert expect[(shard, r["pos"])] == r["doc_id"]


def test_pq_codebooks_deterministic_and_error_monotone(spark):
    """PQ training invariants: (a) the joint explode-aggregate trainer
    is a pure function of (corpus, params) -- two runs bit-match; (b)
    Lloyd with squared-L2 monotonically non-increases the total
    quantization error as iterations grow (same init, same data)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_reconstruct,
    )

    emb = load(spark, "embeddings", "/root/testdata/sf0.001")

    assert pq_codebooks(emb, m=4, n_codewords=4, n_iter=2) == pq_codebooks(
        emb, m=4, n_codewords=4, n_iter=2
    )

    def total_err(books):
        recon = pq_reconstruct(pq_encode(emb, books), books).withColumnRenamed(
            "embedding", "r"
        )
        return (
            emb.join(recon, "vec_id")
            .select(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"),
                        F.col("r"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("e")
            )
            .agg(F.sum("e"))
            .first()[0]
        )

    errs = [
        total_err(pq_codebooks(emb, m=4, n_codewords=8, n_iter=it))
        for it in (0, 1, 2, 3)
    ]
    assert all(a >= b - 1e-9 for a, b in zip(errs, errs[1:])), errs
    assert errs[-1] < errs[0]  # training actually moved


def test_pq_encode_reconstruct_contract(spark):
    """Codes are m in-range ints; reconstruction has the input dim; a
    vector that IS a codeword concatenation roundtrips exactly; dim not
    divisible by m fails fast."""
    import pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_reconstruct,
    )

    emb = load(spark, "embeddings", "/root/testdata/sf0.001").limit(64)
    books = pq_codebooks(emb, m=4, n_codewords=4, n_iter=1)
    codes = pq_encode(emb, books)
    for r in codes.collect():
        assert len(r["pq_codes"]) == 4
        assert all(0 <= c < 4 for c in r["pq_codes"])

    recon = pq_reconstruct(codes, books)
    assert recon.select(F.size("embedding")).first()[0] == 64

    # a synthetic vector assembled FROM codewords encodes to those exact
    # codes and reconstructs bit-identically
    probe = [x for book in books for x in book[1]]
    pdf = spark.createDataFrame([(0, probe)], "vec_id long, embedding array<double>")
    pc = pq_encode(pdf, books).collect()[0]
    assert list(pc["pq_codes"]) == [1, 1, 1, 1]
    out = pq_reconstruct(pq_encode(pdf, books), books).collect()[0]
    assert list(out["embedding"]) == probe

    with pytest.raises(ValueError):
        pq_codebooks(emb, m=7, n_codewords=4, n_iter=1)


def test_pq_topk_recall_vs_exact(spark):
    """Asymmetric PQ scan recall against the exact cosine top-k. The
    synthetic embeddings are near-random (no cluster structure -- the
    hardest case for PQ), so the floor is loose; measured 0.43 at this
    layout (m=16 subspaces, 16 codewords)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        pq_topk,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=5)
    approx = pq_topk(emb, queries, k=5, m=16, n_codewords=16, n_iter=2)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert a
    recall = len(e & a) / len(e)
    assert recall > 0.2, recall


def test_ivf_pq_topk_recall_vs_exact(spark):
    """The IVF-PQ composition must retain useful recall while touching
    only n_probe/n_centroids of the (PQ-compressed) corpus per query;
    approximate hits must come from the probed-cell candidate space."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        ivf_pq_topk,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_pq_topk(
        emb, queries, n_centroids=8, n_probe=6, k=5,
        m=16, n_codewords=16, n_iter=2,
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert a
    recall = len(e & a) / len(e)
    # probing 6/8 cells of the PQ-compressed corpus; PQ-only recall at
    # this layout measured 0.43, the coarse filter can only remove hits
    assert recall > 0.15, recall


def test_ivfpq_indexed_matches_inmemory_prunes_and_compresses(spark, tmp_path):
    """write_ivfpq_index + ivfpq_topk_indexed: identical results to
    ivf_pq_topk with the same centroids/books; the probe partition-
    prunes to the probed cell directories; and the index at rest is
    MATERIALLY smaller than the raw corpus parquet (codes are tinyint
    arrays -- the compression PQ exists for, measured on disk)."""
    import os
    import re

    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        ivf_pq_topk,
        ivfpq_topk_indexed,
        pq_codebooks,
        write_ivfpq_index,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    path = str(tmp_path / "ivfpq_index")
    books = pq_codebooks(emb, m=4, n_codewords=8, n_iter=1)
    meta = write_ivfpq_index(emb, path, n_centroids=8, books=books)

    indexed = ivfpq_topk_indexed(spark, path, queries, n_probe=3, k=5)
    inmem = ivf_pq_topk(
        emb, queries, n_probe=3, k=5,
        centroids=meta["centroids"], books=books,
    )
    assert sorted(map(tuple, indexed.collect())) == sorted(
        map(tuple, inmem.collect())
    )

    # directory-level pruning: one query, n_probe=1 -> one cell equality
    one_q = emb.filter(F.col("vec_id") == 0)
    df = ivfpq_topk_indexed(spark, path, one_q, n_probe=1, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and re.search(r"cell#\d+ = \d+", m.group(1)), plan

    def tree_bytes(p):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
        )

    raw = str(tmp_path / "raw")
    emb.write.parquet(raw)
    assert tree_bytes(path) < 0.5 * tree_bytes(raw), (
        tree_bytes(path), tree_bytes(raw)
    )


def test_quotas_to_stride_weights():
    """Seat compression: exact-resolution sum, largest-remainder ties,
    zero-source drop, proportionality, fail-fast validation."""
    import pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        quotas_to_stride_weights,
    )

    w = quotas_to_stride_weights(
        {"web": 3_000_000, "books": 2_000_000, "code": 1_000_000},
        resolution=12,
    )
    assert w == {"web": 6, "books": 4, "code": 2}
    assert sum(w.values()) == 12

    # remainders decide the leftover seat deterministically (ties by name)
    w2 = quotas_to_stride_weights({"a": 1, "b": 1, "c": 1}, resolution=4)
    assert sum(w2.values()) == 4 and w2["a"] == 2  # 'a' wins the tie

    # a tiny source gets zero seats and is DROPPED, not rounded up
    w3 = quotas_to_stride_weights({"big": 10_000, "dust": 1}, resolution=4)
    assert w3 == {"big": 4}

    with pytest.raises(ValueError):
        quotas_to_stride_weights({})
    with pytest.raises(ValueError):
        quotas_to_stride_weights({"a": -1, "b": 2})
    with pytest.raises(ValueError):
        quotas_to_stride_weights({"a": 0})
    with pytest.raises(ValueError):
        quotas_to_stride_weights({"a": 1}, resolution=0)


def _bpe_reference(word_freq, n_merges, min_pair_freq=2):
    """Independent pure-Python BPE trainer (Sennrich alg. 1) used as the
    oracle for the distributed implementation."""
    words = {tuple(w) + ("</w>",): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (l, r), _n = best
        merges.append((l, r))
        out = {}
        for syms, f in words.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + f
        words = out
    return merges, words


def test_bpe_train_matches_reference_and_segment_roundtrips(spark):
    """The distributed trainer must reproduce the classic algorithm
    merge-for-merge on the Sennrich corpus (ties included), and
    bpe_segment's rank-greedy encode must land every training word on
    its training end-state segmentation."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
    )

    freq = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    docs = []
    i = 0
    for w, f in freq.items():
        for _ in range(f):
            docs.append((i, w))
            i += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")

    ref_merges, ref_words = _bpe_reference(freq, n_merges=10)
    merges = bpe_train(df, n_merges=10)
    assert merges == ref_merges

    seg = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_segment(df, merges).collect()
    }
    end_state = {"".join(s).replace("</w>", ""): list(s) for s in ref_words}
    for doc_id, word in docs:
        assert seg[doc_id] == end_state[word], (word, seg[doc_id])

    # empty doc encodes to an empty token array
    e = bpe_segment(
        spark.createDataFrame([(99, "")], "doc_id long, text string"), merges
    ).collect()[0]
    assert list(e["bpe_tokens"]) == [] and e["n_bpe_tokens"] == 0


def _replace_algebra_tokens(word: str, merges) -> int:
    """Pure-Python twin of bpe_tokenize_oracle_sql's per-word algebra
    (str.replace == SQL replace: leftmost-to-right, non-overlapping):
    double-space joins, one global replace per merge in training order,
    token count from the space arithmetic."""
    s = " " + "  ".join(list(word) + ["</w>"]) + " "
    for left, right in merges:
        s = s.replace(f" {left}  {right} ", f" {left}{right} ")
    return (len(s) - len(s.replace(" ", ""))) // 2


def test_bpe_replace_algebra_equals_rank_greedy_encoder():
    """The z123 oracle's sequential-replace algebra must yield the same
    token COUNT as the rank-greedy encoder for every word, given a
    training-order (producer-before-consumer) merge list. Sweeps the
    shipped artifact over adversarial words (same-symbol runs -- the
    ' a a a ' shared-delimiter trap -- plus merge-chain words and
    random compositions), and a freshly trained list over its corpus."""
    import itertools
    import random

    from etl_world_banks_with_python_and_postgresql_spark.operators.bpe import (
        SHIPPED_MERGES,
        _segment_word,
    )

    ranks = {p: i for i, p in enumerate(SHIPPED_MERGES)}
    words = [
        "a", "aa", "aaa", "aaaa", "aaaaa", "er", "erer", "ererer",
        "ererere", "pererrer", "low", "lower", "slowly", "inner",
        "paring", "aserasy", "wowowow", "tintin", "parpar",
    ]
    alphabet = "aeghilnoprstuwy"
    rng = random.Random(123)
    words += [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(500)
    ]
    words += ["".join(t) for t in itertools.product("aer", repeat=4)]
    for w in words:
        greedy = len(_segment_word(w, ranks))
        algebra = _replace_algebra_tokens(w, SHIPPED_MERGES)
        assert greedy == algebra, (w, greedy, algebra)


def test_pack_manifest_consistent_with_bins_and_offsets(spark):
    """The manifest must (a) reproduce pack_token_bins' bin assignment
    exactly when re-aggregated, and (b) place docs contiguously: within
    a bin, each doc's begin_offset equals the previous docs' token sum
    (id order), starting at 0 -- the property a block-diagonal attention
    mask needs."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        pack_manifest,
        pack_token_bins,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    man = pack_manifest(docs, budget=64).collect()
    bins = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["total_tokens"])
        for r in pack_token_bins(docs, budget=64).collect()
    }

    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    by_bin = defaultdict(list)
    for r in man:
        key = (r["source"], r["bin_id"])
        agg[key][0] += 1
        agg[key][1] += r["n_tokens"]
        by_bin[key].append((r["doc_id"], r["begin_offset"], r["n_tokens"]))
    assert {k: tuple(v) for k, v in agg.items()} == bins

    for rows in by_bin.values():
        rows.sort()
        expect = 0
        for _id, begin, n in rows:
            assert begin == expect
            expect += n


def test_length_batches_minimizes_padding_and_accounts_exactly(spark):
    """Per-batch padding accounting is exact (padded = n_docs * max,
    waste = padded - sum); every part's batches hold batch_size docs
    except the last; and length-bucketed batching wastes strictly less
    padding than id-order batching on a length-diverse corpus (the
    reason the operator exists)."""
    import pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        length_batches,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    out = length_batches(docs, batch_size=8).collect()
    per_part = {}
    for r in out:
        assert r["padded_tokens"] == r["n_docs"] * r["max_tokens"]
        assert r["waste_tokens"] == r["padded_tokens"] - r["sum_tokens"]
        per_part.setdefault(r["source"], []).append((r["batch_id"], r["n_docs"]))
    for batches in per_part.values():
        batches.sort()
        sizes = [n for _, n in batches]
        assert all(s == 8 for s in sizes[:-1]) and 1 <= sizes[-1] <= 8

    bucketed_waste = sum(r["waste_tokens"] for r in out)
    # id-order strawman: same batching arithmetic over doc_id order
    from pyspark.sql import Window as W2

    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        token_count,
    )

    rk = F.row_number().over(W2.partitionBy("source").orderBy("doc_id"))
    naive = (
        docs.select(
            "source", "doc_id", token_count(F.col("text")).alias("n")
        )
        .withColumn("b", F.floor((rk - 1) / 8))
        .groupBy("source", "b")
        .agg((F.count("*") * F.max("n") - F.sum("n")).alias("w"))
        .agg(F.sum("w"))
        .first()[0]
    )
    assert bucketed_waste < naive, (bucketed_waste, naive)

    with pytest.raises(ValueError):
        length_batches(docs, batch_size=0)


def test_html_to_text_extraction_semantics(spark):
    """Markup stripping: script/style/comment content never leaks
    (including '<' inside scripts), block tags become newlines, inline
    tags become spaces, entities decode exactly once (&amp;lt; -> &lt;,
    never <), whitespace normalizes."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        html_to_text,
    )

    cases = [
        (1, "<html><head><style>p{a:1}</style><script>if(1<2){alert('x')}"
            "</script></head><body><h1>Title</h1><!-- secret -->"
            "<p>Hello &amp; world&nbsp;<b>bold</b></p>"
            "<ul><li>a</li><li>b</li></ul></body></html>",
         "Title\nHello & world bold\na\nb"),
        (2, "plain text, no markup", "plain text, no markup"),
        (3, "<P CLASS='x'>upper   case</P><BR>tail", "upper case\ntail"),
        (4, "one &amp;lt; two", "one &lt; two"),  # single decode pass
        (5, "", ""),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in cases], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["extracted"]
        for r in html_to_text(df).collect()
    }
    for i, _h, want in cases:
        assert got[i] == want, (i, repr(got[i]), repr(want))
    assert "secret" not in got[1] and "alert" not in got[1]


def test_pq_recall_curve_monotone_in_m(spark):
    """More subspaces at fixed codewords = finer quantization: recall on
    the curve must not collapse as m grows, and the best layout must
    beat the coarsest (the tuning harness's reason to exist)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        pq_recall_curve,
    )

    emb = load(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    curve = pq_recall_curve(
        emb, queries, layouts=((4, 16), (16, 16)), n_iter=2, k=5
    )
    assert [c["m"] for c in curve] == [4, 16]
    assert curve[0]["compression"] == 64.0  # 64 dims * 4B / 4B codes
    assert curve[1]["compression"] == 16.0
    assert curve[1]["recall"] > curve[0]["recall"]
    assert all(c["recall"] > 0 for c in curve)


def test_unicode_fold_mapping(spark):
    """The NFKC-lite fold: smart punctuation, fullwidth ASCII range,
    exotic spaces, multi-char expansions; ASCII text is a fixed point;
    folding makes typographic variants hash-identical (the dedup
    motivation)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        unicode_fold,
    )

    rows = [
        (1, "“Hi” — café… ＨＩ ﬁn"),
        (2, "plain ascii stays"),
        (3, "a b c"),          # NBSP + thin space
        (4, "‘q’ – «g»"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["folded"] for r in unicode_fold(df).collect()}
    assert got[1] == '"Hi" - café... HI fin'
    assert got[2] == "plain ascii stays"
    assert got[3] == "a b c"
    assert got[4] == "'q' - \"g\""

    variants = spark.createDataFrame(
        [(1, "“the same” — text"), (2, '"the same" - text')],
        "doc_id long, text string",
    )
    folded = unicode_fold(variants).select("folded").distinct().count()
    assert folded == 1  # variants collapse -> hash-identical for dedup


def test_pagerank_tiny_graph_hand_checked_and_invariants(spark):
    """PageRank on a hand-checkable 3-node graph: A->B, A->C, B->C,
    C->A. One round from uniform 1e6 in integer micros:
      contrib(A->each of B,C) = floor(1e6*0.85/2e6... ) per edge =
        floor(1_000_000 * 850000 / (1_000_000 * 2)) = 425_000
      contrib(B->C) = 850_000; contrib(C->A) = 850_000
      r1(A) = 150_000 + 850_000 = 1_000_000
      r1(B) = 150_000 + 425_000 = 575_000
      r1(C) = 150_000 + 425_000 + 850_000 = 1_425_000
    Also pins: every node >= teleport floor, and on a dangling-free
    graph total mass is conserved up to floor loss (< 1 micro per edge
    per round -- deterministic truncation, not drift)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")],
        "src string, dst string",
    )
    r1 = {r["node"]: r["rank_micros"] for r in pagerank(edges, n_iter=1).collect()}
    assert r1 == {"A": 1_000_000, "B": 575_000, "C": 1_425_000}

    r3 = {r["node"]: r["rank_micros"] for r in pagerank(edges, n_iter=3).collect()}
    assert all(v >= 150_000 for v in r3.values())
    # dangling-free: mass conserved up to < 1 micro floor loss per edge
    # per round (4 edges x 3 rounds), never created
    assert 3_000_000 - 4 * 3 <= sum(r3.values()) <= 3_000_000
    # determinism
    r3b = {r["node"]: r["rank_micros"] for r in pagerank(edges, n_iter=3).collect()}
    assert r3 == r3b


def test_pagerank_dangling_and_no_inlink_nodes(spark):
    """A dangling node (no out-edges) keeps receiving mass but emits
    none (documented divergence: its mass drops); a node with no
    in-edges settles at the 150_000 teleport floor."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame(
        [("A", "B")], "src string, dst string"
    )  # A -> B; B dangling, A has no in-links
    r = {x["node"]: x["rank_micros"] for x in pagerank(edges, n_iter=2).collect()}
    assert r["A"] == 150_000
    # round 2: B = teleport + floor(r1(A)*0.85/1) = 150000 + 127500
    assert r["B"] == 150_000 + (150_000 * 850_000) // 1_000_000


def test_rrf_fuse_exact_algebra_and_missing_system_zero(spark):
    """RRF fusion: doc in both systems scores 1e6//(60+r1) + 1e6//(60+r2);
    doc in one system gets only that term; ties break (score desc, id)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        rrf_fuse,
    )

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 100), (4, 50)], "doc_id long, tf long"
    )
    out = rrf_fuse(
        [
            (a, (F.desc("score"), F.asc("doc_id"))),
            (b, (F.desc("tf"), F.asc("doc_id"))),
        ],
        rrf_k=60,
        top=10,
    ).collect()
    rows = {r["doc_id"]: (r["rrf_micros"], r["n_systems"], r["rank"]) for r in out}
    m = 1_000_000
    assert rows[2] == (m // 62 + m // 61, 2, 1)   # rank2 in a, rank1 in b
    assert rows[1] == (m // 61, 1, 2)             # rank1 in a only
    assert rows[4] == (m // 62, 1, 3)             # rank2 in b only
    assert rows[3] == (m // 63, 1, 4)


def test_hll_agg_view_incremental_equals_oneshot(spark, tmp_path):
    """HllAggView invariants (the KmvAggView contract on register
    state): (1) batched ingests + a mid-stream compaction read back the
    SAME estimates as a one-shot hll_distinct over the full corpus
    (register MAX is commutative, associative, idempotent); (2) replayed
    batch ids absorb; (3) identical CONTENT under a fresh id cannot move
    read(); (4) per-group state is register-bounded (<= 2^p rows)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import (
        sketch as S,
    )
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        HllAggView,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.01").select(
        "lang", "text", "doc_id"
    )
    v = HllAggView(
        str(tmp_path / "hll"), keys=["lang"], value_expr="text",
        n_partitions=2, p=6,
    )
    for i in range(4):
        assert v.ingest(docs.filter(F.col("doc_id") % 4 == i), f"b{i}") == "applied"
        if i == 2:
            assert v.compact(spark)

    got = {
        r["lang"]: (r["est_distinct"], r["n_zero_registers"])
        for r in v.read(spark).collect()
    }
    want = {
        r["lang"]: (r["est_distinct"], r["n_zero_registers"])
        for r in S.hll_distinct(docs, "text", p=6, group_by="lang").collect()
    }
    assert got == want

    assert v.ingest(docs.limit(5), "b0") == "replayed"
    assert v.ingest(docs.filter(F.col("doc_id") % 4 == 1), "dup") == "applied"
    assert {
        r["lang"]: (r["est_distinct"], r["n_zero_registers"])
        for r in v.read(spark).collect()
    } == got

    # state bound: merged register table holds <= 64 rows per group
    per_group = (
        v.read_sketch(spark).groupBy("lang").count().collect()
    )
    assert all(r["count"] <= 64 for r in per_group)


def test_gopher_quality_rules_hand_checked(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        gopher_quality,
    )

    # 16 distinct words, mean word length ~5.5, two stopwords
    base = "the a " + " ".join("word%02d" % i for i in range(14))
    docs = spark.createDataFrame(
        [
            # 10 words: fails ONLY the word-count rule
            (1, " ".join(base.split()[:10])),
            # everything passes
            (2, base),
            # 20 copies of one word -> distinct fraction below 30%
            (3, "the a " + " ".join(["wordword"] * 20)),
            # symbol soup: hashes + ellipses beyond 1% of words
            (4, base + " ### ... ..."),
            # bullet lines: 2 of 3 lines start with '- ' (> 30%)
            (5, base + "\n- one\n- two"),
            # ellipsis endings: 1 of 2 lines (> 20%); all tokens alpha
            (6, base + "\nwait for it..."),
            # numeric words: alpha fraction below 99%
            (7, base + " 123 456"),
            # no stopwords at all (long words keep mwl in range)
            (8, " ".join("zzzzz%02d" % i for i in range(20))),
            # short words: mean word length below 4.0
            (9, "the a " + " ".join("w%d" % (i % 9) for i in range(14))),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality(docs).collect()
    }
    assert not out[1]["wc_ok"] and not out[1]["keep"]
    # doc 1 fails ONLY word count
    assert all(
        out[1][k]
        for k in "mwl_ok stop_ok distinct_ok symbol_ok bullet_ok "
        "ellipsis_ok alpha_ok".split()
    )
    assert out[2]["keep"] and out[2]["n_words"] == 16
    assert not out[3]["distinct_ok"]
    assert not out[4]["symbol_ok"]
    assert not out[5]["bullet_ok"]
    assert not out[6]["ellipsis_ok"] and out[6]["alpha_ok"]
    assert not out[7]["alpha_ok"] and out[7]["symbol_ok"]
    assert not out[8]["stop_ok"] and out[8]["mwl_ok"]
    assert not out[9]["mwl_ok"] and out[9]["stop_ok"]


def test_winnow_fingerprints_match_python_reference(spark):
    import hashlib

    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    K, WIN = 3, 4

    def ref_fps(text):
        w = text.lower().strip().split()
        grams = [" ".join(w[i : i + K]) for i in range(len(w) - K + 1)]
        h = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        fps = set()
        for j in range(len(h) - WIN + 1):
            win = h[j : j + WIN]
            m = min(win)
            # rightmost minimal position, 1-based over the gram axis
            pos = max(i for i in range(j, j + WIN) if h[i] == m) + 1
            fps.add((m, pos))
        return fps

    texts = [
        (1, "a b c d e f g h i j"),
        (2, "x y z a b c d e f g h q"),  # shares run 'a..h' (8 >= K+WIN-1=6)
        (3, "p q r s t u"),  # exactly k+win-1 tokens -> exactly 1 window
        (4, "one two three"),  # 1 gram < window -> no fingerprints
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["fp_hash"], r["pos"])
        for r in winnow_fingerprints(df, k=K, window=WIN).collect()
    }
    want = {
        (d, h, p) for d, t in texts for h, p in ref_fps(t)
    }
    assert got == want
    # the winnowing guarantee: docs 1 and 2 share a run of 8 tokens
    # (>= k + window - 1), so they MUST share a fingerprint hash
    shared = {r["fp_hash"] for r in winnow_fingerprints(df).collect() if r["doc_id"] == 1} & {
        r["fp_hash"] for r in winnow_fingerprints(df).collect() if r["doc_id"] == 2
    }
    assert shared
    pairs = winnow_pairs(df, min_shared=1, max_df=10).collect()
    assert any(r["doc_a"] == 1 and r["doc_b"] == 2 for r in pairs)
    # doc 4 is too short to fingerprint: appears in no pair
    assert all(4 not in (r["doc_a"], r["doc_b"]) for r in pairs)


def test_importance_weights_exact_tiny_case(spark):
    import hashlib

    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        importance_weights,
    )

    B = 8192
    docs = [
        (1, "alpha beta gamma", True),
        (2, "alpha beta delta", True),
        (3, "zeta eta theta", False),
        (4, "alpha beta gamma", False),
        (5, "solo", False),  # < 2 tokens: no features, dropped
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, tgt boolean")
    out = {
        r["doc_id"]: (r["n_features"], r["score_micros"])
        for r in importance_weights(df, F.col("tgt")).collect()
    }

    def feats(text):
        w = text.split()
        grams = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        return {
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
            for g in grams
        }

    fsets = {d: feats(t) for d, t, _ in docs}
    np_, nt = len(docs), sum(1 for *_, t in docs if t)
    cp = {}
    ct = {}
    for d, _, t in docs:
        for f in fsets[d]:
            cp[f] = cp.get(f, 0) + 1
            ct[f] = ct.get(f, 0) + int(t)

    def w_micros(f):
        num = (ct[f] + 1) * (np_ + 2)
        den = (cp[f] + 1) * (nt + 2)
        return (2 * 1_000_000 * num + den) // (2 * den)

    want = {
        d: (len(fsets[d]), sum(w_micros(f) for f in fsets[d]))
        for d, _, _ in docs
        if fsets[d]
    }
    assert out == want
    # target-domain docs outrank the disjoint pool doc
    assert out[1][1] > out[3][1] and out[2][1] > out[3][1]


def test_triangle_counts_hand_checked(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        triangle_counts,
    )

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + a pendant path
    # 4-5-6 (no triangles) + a duplicate/reversed/self-loop edge noise
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (6, 6), (2, 1), (3, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_closing_edge_orientation_disagrees(spark):
    """Regression: the closing edge of a wedge is (degree, id)-oriented
    while wedge endpoints are id-ordered. In this graph the triangle
    {1,2,3} has closing edge (2,3) stored as 3->2 (deg(3)=2 < deg(2)=4),
    so a join that only matches (t1=2, t2=3) drops the triangle."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        triangle_counts,
    )

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (2, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_random_vs_bruteforce(spark):
    """Random graphs vs itertools ground truth -- exercises every
    degree/id orientation disagreement the hand tests might miss."""
    import itertools
    import random

    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        triangle_counts,
    )

    rng = random.Random(42)
    for trial in range(4):
        n = 12
        edges = sorted(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(20 + 6 * trial)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        es = set(edges)
        want = {}
        for a, b, c in itertools.combinations(range(n), 3):
            if (a, b) in es and (a, c) in es and (b, c) in es:
                for x in (a, b, c):
                    want[x] = want.get(x, 0) + 1
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
        }
        assert got == want, f"trial {trial}: {sorted(edges)}"


def test_weighted_median_banded_hand_checked(spark):
    """Lower weighted median against hand math, including the exact-half
    tie (2*cum == tot picks the crossing band) and weight dominance."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.rollup import (
        weighted_median_banded,
    )

    rows = [
        # group a: bands/weights (1,1),(2,1),(3,2) -> tot 4; cum(2)=2,
        # 2*2 >= 4 -> median 2 (the exact-half tie rule)
        ("a", 1, 1), ("a", 2, 1), ("a", 3, 2),
        # group b: one heavy band dominates -> median 5
        ("b", 1, 1), ("b", 5, 10), ("b", 9, 1),
        # group c: single row
        ("c", 7, 3),
    ]
    df = spark.createDataFrame(rows, "g string, v int, w int")
    out = {
        r["g"]: (r["total_weight"], r["median_band"])
        for r in weighted_median_banded(
            df, "g", F.col("v"), F.col("w")
        ).collect()
    }
    assert out == {"a": (4, 2), "b": (12, 5), "c": (3, 7)}


def test_interval_max_concurrency_hand_checked(spark):
    """Sweep-line peak concurrency against hand-derived answers,
    including the half-open boundary ([1,3) and [3,5) do NOT overlap)
    and a tiny bucket width that forces the peak to straddle bucket
    boundaries (the two-level max-prefix path)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.timeseries import (
        interval_max_concurrency,
    )

    rows = [
        # group a: [0,10) [2,8) [4,6) nested -> peak 3; [10,12) touches
        ("a", 0, 10, 1), ("a", 2, 8, 2), ("a", 4, 6, 3), ("a", 10, 12, 4),
        # group b: [1,3) [3,5) half-open chain -> peak 1
        ("b", 1, 3, 5), ("b", 3, 5, 6),
        # group c: long interval spanning many buckets + short inside
        ("c", 0, 100, 7), ("c", 50, 55, 8),
    ]
    df = spark.createDataFrame(rows, "g string, s long, e long, id long")
    for width in (4, 1_000_000):  # force multi-bucket, then single-bucket
        out = {
            r["g"]: (r["n_intervals"], r["max_concurrent"])
            for r in interval_max_concurrency(
                df, "g", F.col("s"), F.col("e"), "id",
                bucket_width_us=width,
            ).collect()
        }
        assert out == {"a": (4, 3), "b": (2, 1), "c": (2, 2)}, (width, out)


def test_k_hop_reach_hand_checked_and_transit_cap(spark):
    """2-hop reach on a path 1-2-3-4-5 plus a triangle 10-11-12, with
    dup/self-loop noise; then the celebrity cap: paths THROUGH a hub
    above max_transit_degree are dropped but the hub still reports."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        k_hop_reach,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (11, 12), (12, 10), (2, 1), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_reach"] for r in k_hop_reach(df, hops=2).collect()}
    assert out == {1: 2, 2: 3, 3: 4, 4: 3, 5: 2, 10: 2, 11: 2, 12: 2}
    # 1-hop degenerates to plain degree
    out1 = {r["node"]: r["n_reach"] for r in k_hop_reach(df, hops=1).collect()}
    assert out1 == {1: 1, 2: 2, 3: 2, 4: 2, 5: 1, 10: 2, 11: 2, 12: 2}

    # star: hub 0 joined to 1..5, plus edge 1-2. With the cap below the
    # hub's degree, leaf 3 can no longer reach others THROUGH 0, but 1-2
    # still see each other directly and the hub still reports its reach.
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    sdf = spark.createDataFrame(star, "src long, dst long")
    capped = {
        r["node"]: r["n_reach"]
        for r in k_hop_reach(sdf, hops=2, max_transit_degree=3).collect()
    }
    # hub reaches all 5 leaves (its own edges are 1-hop, no transit)
    assert capped[0] == 5
    # leaf 3: direct {0}; two-hop through 0 dropped (deg 5 > 3) -> 1
    assert capped[3] == 1
    # leaf 1: {0, 2} direct; through 2 (deg 2 <= 3) reaches 1's own set
    assert capped[1] == 2
    uncapped = {
        r["node"]: r["n_reach"] for r in k_hop_reach(sdf, hops=2).collect()
    }
    assert uncapped[3] == 5  # {0} + 4 siblings through the hub


def test_image_dhash_reference_and_brightness_invariance(spark):
    """image_dhash equals a pure-python reference on real encoded BMPs,
    identical images collide, and a CONSTANT brightness shift (the
    perceptual-dup case dHash exists for) cannot change the hash."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.multimodal import (
        encode_bmp,
        image_dhash,
    )

    def luma_img(w, h, f):
        # encode (v, v, v) so decoded luma == v exactly
        return encode_bmp(
            [(f(x, y), f(x, y), f(x, y)) for y in range(h) for x in range(w)],
            w, h,
        )

    def ref_dhash(w, h, f, grid=8):
        g = [
            [f((i * w) // grid, (j * h) // grid) for i in range(grid)]
            for j in range(grid)
        ]
        hv = 0
        for j in range(grid):
            for i in range(grid - 1):
                if g[j][i] > g[j][i + 1]:
                    hv |= 1 << (j * (grid - 1) + i)
        return hv

    base = lambda x, y: (x * x * 5 + y * 3) % 200  # noqa: E731
    shifted = lambda x, y: base(x, y) + 55  # constant brightness shift
    rows = [
        (1, luma_img(12, 9, base)),
        (2, luma_img(12, 9, base)),       # byte-identical dup
        (3, luma_img(12, 9, shifted)),    # brightness variant
        (4, luma_img(12, 9, lambda x, y: (x * 37 + y * y * 11) % 256)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert out[1] == ref_dhash(12, 9, base)
    assert out[4] == ref_dhash(12, 9, lambda x, y: (x * 37 + y * y * 11) % 256)
    assert out[1] == out[2] == out[3]   # dup + brightness variant collide
    assert out[4] != out[1]             # different texture does not
    assert 0 < out[1] < 1 << 56


def test_distribution_drift_tvd_hand_checked(spark):
    """TVD drift against hand math: corpus = uniform over {0,1} (N=6,
    T_0=T_1=3); group A = (3/4, 1/4) -> TVD = 1/2*(1/4 + 1/4) = 0.25;
    group B = (0, 1) -> TVD = 1/2*(1/2 + 1/2) = 0.5 -- B's missing
    bucket-0 cell MUST contribute its |0 - T*n| mass."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        distribution_drift_tvd,
    )

    rows = [("A", 0), ("A", 0), ("A", 0), ("A", 1),
            ("B", 1), ("B", 1)]
    df = spark.createDataFrame(rows, "source string, b int")
    out = {
        r["source"]: (r["n_rows"], r["tvd_micros"])
        for r in distribution_drift_tvd(df, "source", F.col("b")).collect()
    }
    assert out == {"A": (4, 250_000), "B": (2, 500_000)}
    # identical groups -> zero drift
    same = spark.createDataFrame(
        [("A", 0), ("A", 1), ("B", 0), ("B", 1)], "source string, b int"
    )
    out2 = {
        r["source"]: r["tvd_micros"]
        for r in distribution_drift_tvd(same, "source", F.col("b")).collect()
    }
    assert out2 == {"A": 0, "B": 0}


def test_l_diversity_hand_checked(spark):
    """l-diversity: a class can be k-anonymous yet 1-diverse (all rows
    share the sensitive value) -- the exact case the audit must flag."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        l_diversity_ladder,
    )

    rows = [
        # class A: 4 rows, all sensitive 'x' -> 1-diverse (risky at l=2)
        ("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),
        # class B: 3 rows, 3 distinct -> 3-diverse
        ("B", "x"), ("B", "y"), ("B", "z"),
        # class C: 2 rows, 2 distinct -> 2-diverse
        ("C", "x"), ("C", "y"),
    ]
    df = spark.createDataFrame(rows, "q string, s string")
    out = {
        r["level"]: (
            r["n_classes"], r["n_risky"], r["rows_at_risk"], r["l_achieved"]
        )
        for r in l_diversity_ladder(
            df, [("by_q", [F.col("q")]), ("all", [F.lit(1)])], "s", l_min=3
        ).collect()
    }
    # by_q: A is 1-diverse (4 rows), C is 2-diverse (2 rows) -> 2 risky
    assert out["by_q"] == (3, 2, 6, 1)
    # fully generalized: one class, 3 distinct values -> not risky
    assert out["all"] == (1, 0, 0, 3)


def test_k_core_hand_checked_and_cascade(spark):
    """k_core against hand-derived ground truth, including the cascade
    case (removing a low-degree node drops a neighbor below k later):
    K4 on {1,2,3,4} + a tail 4-5, 5-6, 5-7. For k=2 the K4 survives and
    the tail peels in TWO rounds (7 and 6 fall first, then 5), plus
    dup/reversed/self-loop edge noise."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        k_core,
    )

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (5, 7), (2, 1), (3, 3),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["node"]: r["core_degree"] for r in k_core(df, k=2).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=4: even the K4 fails (each member has core-degree 3) -> empty
    assert k_core(df, k=4).count() == 0
    # k=1: everything with an edge stays (self-loop-only is dropped)
    out1 = {r["node"]: r["core_degree"] for r in k_core(df, k=1).collect()}
    assert set(out1) == {1, 2, 3, 4, 5, 6, 7}
    # fail-loud when max_rounds is too small for the peeling depth: a
    # path peels 2 ends per round, so 9 nodes under k=2 need > 1 round
    import pytest as _pytest

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        k_core(path, k=2, max_rounds=1)
    # ADVICE r12: a fixpoint reached exactly ON the max_rounds-th peel
    # must NOT raise -- convergence is re-tested once after loop
    # exhaustion. The K4+tail graph peels in exactly 2 rounds (6,7 then
    # the cascaded 5), so max_rounds=2 converges with no round to spare.
    out2 = {
        r["node"]: r["core_degree"]
        for r in k_core(df, k=2, max_rounds=2).collect()
    }
    assert out2 == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_peel_depth_flat_under_8x_disjoint_copies(spark):
    """VERDICT r12 #3: the fail-loud max_rounds bound is a function of
    graph STRUCTURE, not data volume -- 8 disjoint copies of a graph
    peel in exactly the same number of rounds as one copy, so a
    max_rounds that converges at 1x converges at 8x (and a too-small
    bound still raises at 8x: the bound never silently loosens).
    Probe graph: a 9-node path under k=2 peels from both ends in
    exactly 4 rounds (the documented pathological shape)."""
    import pytest as _pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        k_core,
    )

    path = [(i, i + 1) for i in range(8)]
    df1 = spark.createDataFrame(path, "src long, dst long")
    df8 = spark.createDataFrame(
        [(a + 100 * c, b + 100 * c) for c in range(8) for a, b in path],
        "src long, dst long",
    )
    s1: dict = {}
    s8: dict = {}
    # max_rounds=4 is the EXACT peel depth: boundary convergence, both scales
    assert k_core(df1, k=2, max_rounds=4, stats=s1).count() == 0
    assert k_core(df8, k=2, max_rounds=4, stats=s8).count() == 0
    assert s1["rounds"] == s8["rounds"] == 4
    # one round short still fails loudly at 8x -- volume bought no slack
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        k_core(df8, k=2, max_rounds=3)


def test_degree_assortativity_invariant_under_8x_disjoint_copies(spark):
    """VERDICT r13 #3: assortativity is a RATIO of degree moments, so 8
    disjoint copies of a graph have bit-identical assortativity_micros
    (num and den both scale by 8^2, cancelling exactly) while the
    moment terms themselves scale by exactly 8 -- the load-independent
    invariant that pins the 2-join degree-annotation path at scale.
    Probe graph: star(1->2..5) + path tail (5-6-7), non-regular and
    non-degenerate (r strictly between -1e6 and 0)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        degree_assortativity,
    )

    base = [(1, 2), (1, 3), (1, 4), (1, 5), (5, 6), (6, 7)]
    df1 = spark.createDataFrame(base, "src long, dst long")
    df8 = spark.createDataFrame(
        [(a + 100 * c, b + 100 * c) for c in range(8) for a, b in base],
        "src long, dst long",
    )
    r1 = degree_assortativity(df1).collect()[0]
    r8 = degree_assortativity(df8).collect()[0]
    assert -(10**6) < r1["assortativity_micros"] < 0
    assert r8["assortativity_micros"] == r1["assortativity_micros"]
    for k in ("m_endpoint_pairs", "sx", "sxx", "sxy"):
        assert r8[k] == 8 * r1[k], (k, r8[k], r1[k])


def test_harmonic_centrality_invariant_under_8x_disjoint_copies(spark):
    """VERDICT r13 #3: shell BFS never crosses disjoint copies, so (1)
    copy-0 nodes keep bit-identical (harmonic_micros, n_reach) at 8x
    and (2) the multiset of centrality values scales by exactly 8 --
    frontier growth is linear in copies, the load-independent
    observable behind the 8x wall-clock probe. Probe graph: 7-node
    path, hops=2 (interior vs edge nodes differ, so the invariant is
    exercised on a non-constant distribution)."""
    from collections import Counter

    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        harmonic_centrality,
    )

    base = [(i, i + 1) for i in range(6)]
    df1 = spark.createDataFrame(base, "src long, dst long")
    df8 = spark.createDataFrame(
        [(a + 100 * c, b + 100 * c) for c in range(8) for a, b in base],
        "src long, dst long",
    )
    r1 = {
        r["node"]: (r["harmonic_micros"], r["n_reach"])
        for r in harmonic_centrality(df1, hops=2).collect()
    }
    rows8 = harmonic_centrality(df8, hops=2).collect()
    assert len(set(r1.values())) > 1  # non-constant distribution
    r8_copy0 = {
        r["node"]: (r["harmonic_micros"], r["n_reach"])
        for r in rows8
        if r["node"] < 100
    }
    assert r8_copy0 == r1
    c1 = Counter(r1.values())
    c8 = Counter((r["harmonic_micros"], r["n_reach"]) for r in rows8)
    assert c8 == Counter({k: 8 * v for k, v in c1.items()})


def test_url_canonicalize_hand_checked(spark):
    """canonicalize_urls against hand-derived expectations covering the
    whole rule set: case fold, mirror-prefix peel, default-vs-real port,
    fragment drop, tracking-param strip + param sort, scheme-less
    references, empty path, second-level TLD, single-label host."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.web import (
        canonicalize_urls,
    )

    cases = [
        # (url, canonical_url, host, domain)
        ("HTTPS://WWW.Ex.COM:443/A/b?utm_source=x&z=1&a=2#frag",
         "https://ex.com/A/b?a=2&z=1", "ex.com", "ex.com"),
        ("http://m.news.co.uk:80/x", "http://news.co.uk/x",
         "news.co.uk", "news.co.uk"),
        ("http://a.b.news.co.uk/x", "http://a.b.news.co.uk/x",
         "a.b.news.co.uk", "news.co.uk"),
        ("https://api.ex.com:8443/v1?b=2&a=1",
         "https://api.ex.com:8443/v1?a=1&b=2", "api.ex.com", "ex.com"),
        ("ex.org/p?ref=tw&q=5", "http://ex.org/p?q=5", "ex.org", "ex.org"),
        ("http://ex.net", "http://ex.net/", "ex.net", "ex.net"),
        ("http://localhost:9000/x", "http://localhost:9000/x",
         "localhost", "localhost"),
        ("HTTP://MOBILE.Ex.COM/", "http://ex.com/", "ex.com", "ex.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, *_rest) in enumerate(cases)],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: (r["canonical_url"], r["host"], r["domain"])
        for r in canonicalize_urls(df).collect()
    }
    for i, (_u, cu, h, d) in enumerate(cases):
        assert got[i] == (cu, h, d), (i, cases[i][0], got[i])


def test_url_canonicalize_matches_duckdb_twin(spark):
    """The SQL twins produce byte-identical strings for every hand case
    (the z167 parity, pinned operator-level)."""
    import duckdb

    from etl_world_banks_with_python_and_postgresql_spark.operators import web

    urls = [
        "HTTPS://WWW.Ex.COM:443/A/b?utm_source=x&z=1&a=2#frag",
        "http://m.news.co.uk:80/x",
        "ex.org/p?ref=tw&q=5&fbclid=abc",
        "http://ex.net",
        "https://api.ex.com:8443/v1?b=2&a=1",
        "http://localhost:9000/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    host = web.canonical_host(F.col("url"))
    spark_rows = df.select(
        web.canonical_url(F.col("url")).alias("c"),
        host.alias("h"),
        web.registered_domain(host).alias("d"),
    ).collect()
    con = duckdb.connect()
    host_sql = web.canonical_host_sql("url")
    for u, r in zip(urls, spark_rows):
        got = con.execute(
            f"SELECT {web.canonical_url_sql('url')} AS c, "
            f"{host_sql} AS h, "
            f"{web.registered_domain_sql(host_sql)} AS d "
            "FROM (SELECT ? AS url)",
            [u],
        ).fetchone()
        assert got == (r["c"], r["h"], r["d"]), (u, got, tuple(r))


def test_registered_domain_table_driven_path(spark):
    """VERDICT r12 #4: the broadcast-join suffix path. (a) Equivalence:
    a suffix table holding exactly the frozen SECOND_LEVEL_TLDS yields
    bit-identical output to the literal-list path on the z167-style URL
    mix plus the hand cases; (b) extensibility: a PSL entry absent from
    the frozen list ('co.nz') changes ONLY the hosts it governs."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.web import (
        SECOND_LEVEL_TLDS,
        canonicalize_urls,
        registered_domain_joined,
    )

    urls = [
        "HTTPS://WWW.Ex.COM:443/A/b?utm_source=x&z=1&a=2#frag",
        "http://m.news.co.uk:80/x",
        "http://a.b.news.co.uk/x",
        "https://api.ex.com:8443/v1?b=2&a=1",
        "ex.org/p?ref=tw&q=5",
        "http://localhost:9000/x",
        "https://shop.stuff.co.nz/deals",
        "http://cdn.site.com.au/a",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    frozen_tbl = spark.createDataFrame(
        [(s,) for s in SECOND_LEVEL_TLDS], "suffix string"
    )
    lit_rows = sorted(
        tuple(r) for r in canonicalize_urls(df).collect()
    )
    tbl_rows = sorted(
        tuple(r)
        for r in canonicalize_urls(df, suffixes=frozen_tbl)
        .select("doc_id", "canonical_url", "host", "domain")
        .collect()
    )
    assert lit_rows == tbl_rows

    # extended table: co.nz now resolves three labels; everything else
    # is unchanged (the deploy-time PSL swap is a data change)
    ext_tbl = spark.createDataFrame(
        [(s,) for s in (*SECOND_LEVEL_TLDS, "co.nz")], "suffix string"
    )
    hosts = canonicalize_urls(df).select("doc_id", "host")
    ext = {
        r["doc_id"]: r["domain"]
        for r in registered_domain_joined(
            hosts, "host", ext_tbl
        ).collect()
    }
    base = {
        r["doc_id"]: r["domain"] for r in canonicalize_urls(df).collect()
    }
    assert ext[6] == "stuff.co.nz" and base[6] == "co.nz"
    assert all(ext[i] == base[i] for i in base if i != 6)

    # the suffix dim must be broadcast: no corpus shuffle in the plan
    plan = registered_domain_joined(
        hosts, "host", ext_tbl
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_triangle_estimate_unbiased_and_exact_at_denom_one(spark):
    """DOULION sparsified estimate: sample_denom=1 IS the exact count,
    and the multi-seed mean of the denom=2 estimate lands within 20% of
    the exact count (unbiasedness; the md5 coin makes every number here
    deterministic, so this can never flake)."""
    import random

    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        triangle_counts,
        triangle_estimate,
    )

    rng = random.Random(3)
    n = 36
    edges = sorted(
        {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(260)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long").cache()
    exact = (
        triangle_counts(df)
        .agg(F.expr("sum(n_triangles) div 3").alias("t"))
        .collect()[0]["t"]
    )
    assert exact > 50  # the graph is triangle-rich enough to test on

    r1 = triangle_estimate(df, sample_denom=1).collect()[0]
    assert r1["n_edges_kept"] == len(edges)
    assert r1["sampled_triangles"] == exact == r1["est_triangles"]

    ests = [
        triangle_estimate(df, sample_denom=2, seed=s).collect()[0][
            "est_triangles"
        ]
        for s in range(10)
    ]
    mean = sum(ests) / len(ests)
    assert abs(mean - exact) / exact < 0.20, (mean, exact, ests)
    # individual estimates scatter but stay in a sane band
    assert all(0 < e < 4 * exact for e in ests), ests
    df.unpersist()


def test_holt_forecast_hand_checked_and_constant_series(spark):
    import datetime

    from etl_world_banks_with_python_and_postgresql_spark.operators.timeseries import (
        holt_forecast,
    )

    M = 1_000_000
    day0 = datetime.datetime(2024, 1, 1)
    rows = []
    # series 'c': constant 5.0 -> level 5e6, trend 0, forecasts 5e6
    for d in range(6):
        rows.append((day0 + datetime.timedelta(days=d), "c", 5.0))
    # series 'r': ramp 1,2,3,4 -> positive trend
    for d, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((day0 + datetime.timedelta(days=d), "r", v))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        r["event_type"]: r.asDict()
        for r in holt_forecast(df, alpha_ppm=300_000, beta_ppm=100_000).collect()
    }
    c = out["c"]
    assert c["level_micros"] == 5 * M and c["trend_micros"] == 0
    assert c["fc1_micros"] == c["fc2_micros"] == c["fc3_micros"] == 5 * M

    # replay the ramp recurrence by hand
    def hu(a, den):
        s = 1 if a >= 0 else -1
        return s * ((2 * abs(a) + den) // (2 * den))

    lev, b = 1 * M, 0
    for y in (2 * M, 3 * M, 4 * M):
        lev_new = hu(300_000 * y + 700_000 * (lev + b), M)
        b = hu(100_000 * (lev_new - lev) + 900_000 * b, M)
        lev = lev_new
    r = out["r"]
    assert (r["level_micros"], r["trend_micros"]) == (lev, b)
    assert r["fc2_micros"] == lev + 2 * b and b > 0


def test_hilbert_key_matches_reference_and_locality(spark):
    from etl_world_banks_with_python_and_postgresql_spark.functions.xhash import (
        hilbert_key,
    )

    def xy2d(bits, x, y):
        d, s = 0, 1 << (bits - 1)
        while s > 0:
            rx = 1 if (x & s) else 0
            ry = 1 if (y & s) else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hk"]
        for r in df.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=5).alias("hk")
        ).collect()
    }
    assert got == {(x, y): xy2d(5, x, y) for x, y in pts}
    # the Hilbert property: consecutive keys are ALWAYS adjacent cells
    by_key = sorted(got.items(), key=lambda kv: kv[1])
    keys = [k for _, k in by_key]
    assert keys == list(range(1024))  # a bijection onto 0..n^2-1
    for (p1, _), (p2, _) in zip(by_key, by_key[1:]):
        assert abs(p1[0] - p2[0]) + abs(p1[1] - p2[1]) == 1


def test_connected_components_path_and_random_vs_union_find(spark):
    import random

    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        connected_components,
    )

    # path graph: diameter 63 -- naive min-label propagation would need
    # ~63 rounds; large-star/small-star converges within the default 12
    path = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(path, "src long, dst long")
    out = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert out == {i: 0 for i in range(64)}

    # a node seen ONLY in a self-loop edge is its own singleton
    # component (regression: the a < b canonicalization used to drop it
    # from the node universe entirely)
    df = spark.createDataFrame(
        [(1, 2), (9, 9)], "src long, dst long"
    )
    out = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert out == {1: 1, 2: 1, 9: 9}

    # random graphs vs union-find ground truth
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 10 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        want = {}
        for x in touched:
            root = find(x)
            comp = min(y for y in touched if find(y) == root)
            want[x] = comp
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == want, f"trial {trial}"


def test_power_iteration_top_pc_rank_one_exact(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        power_iteration_top_pc,
    )

    # rank-one data along (3, 4): A ~ [[9,12],[12,16]], so ONE iteration
    # already yields the exact eigendirection under max-abs norm:
    # w0/w1 = 3(3v0+4v1) / 4(3v0+4v1) = 3/4 for ANY non-orthogonal v
    rows = [(i, [0.003 * i, 0.004 * i]) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["dim_idx"]: r["pc_micros"]
        for r in power_iteration_top_pc(df, dim=2, n_iter=3).collect()
    }
    assert out == {0: 750_000, 1: 1_000_000}


def test_theil_sen_outlier_immune_vs_hand_median(spark):
    import datetime

    from etl_world_banks_with_python_and_postgresql_spark.operators.timeseries import (
        theil_sen_slope,
    )

    day0 = datetime.datetime(2024, 1, 1)
    # perfect slope 2.0/day with ONE wildly corrupted day
    rows = []
    for d in range(10):
        v = 2.0 * d if d != 5 else 1000.0
        rows.append((day0 + datetime.timedelta(days=d), "a", v))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = theil_sen_slope(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pairs"] == 45
    # hand-compute the quantized-slope median
    xs = {d: int((2.0 * d if d != 5 else 1000.0) * 1_000_000) for d in range(10)}
    slopes = []
    for i in range(10):
        for j in range(i + 1, 10):
            num, den = xs[j] - xs[i], j - i
            s = 1 if num >= 0 else -1
            slopes.append(s * ((2 * abs(num) + den) // (2 * den)))
    slopes.sort()
    want = slopes[(500_000 * 45 + 999_999) // 1_000_000 - 1]
    assert r["slope_micros_per_day"] == want
    # robustness: the median slope stays at the clean trend
    assert want == 2_000_000


def test_sentence_stats_hand_checked(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        sentence_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "one two three. four five! six seven eight nine? ten"),
            (2, "no terminator here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in sentence_stats(df).collect()}
    assert out[1]["n_sentences"] == 4
    assert out[1]["n_words"] == 10
    assert out[1]["mean_sent_words_micros"] == 2_500_000
    assert out[1]["max_sent_words"] == 4 and out[1]["min_sent_words"] == 1
    assert out[2]["n_sentences"] == 1 and out[2]["n_words"] == 5


def test_k_anonymity_ladder_hand_checked(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        k_anonymity_ladder,
    )

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1), ("b", 1)]
    df = spark.createDataFrame(rows, "seg string, band int")
    out = {
        r["level"]: r.asDict()
        for r in k_anonymity_ladder(
            df,
            [
                ("fine", [F.col("seg"), F.col("band")]),
                ("coarse", [F.col("seg")]),
            ],
            k=3,
        ).collect()
    }
    f = out["fine"]
    # classes: (a,1)=2 (a,2)=1 (b,1)=3 -> 2 risky, 3 rows at risk, k=1
    assert (f["n_classes"], f["n_risky"], f["rows_at_risk"], f["k_achieved"]) == (3, 2, 3, 1)
    c = out["coarse"]
    # classes: a=3, b=3 -> released at k=3
    assert (c["n_classes"], c["n_risky"], c["rows_at_risk"], c["k_achieved"]) == (2, 0, 0, 3)


def test_pareto_frontier_hand_checked_two_level(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.rollup import (
        pareto_frontier,
    )

    pts = [
        (1, 1.0, 9.0),   # frontier
        (2, 5.0, 5.0),   # frontier
        (3, 9.0, 1.0),   # frontier
        (4, 4.0, 4.0),   # dominated by 2
        (5, 5.0, 5.0),   # duplicate of 2 -> collapses (one survivor)
        (6, 1.0, 8.0),   # dominated by 1
        (7, 9.0, 1.0),   # duplicate of 3 -> collapses
    ]
    df = spark.createDataFrame(pts, "k long, x double, y double")
    out = sorted(
        (r["k"], r["x"], r["y"])
        for r in pareto_frontier(df, "x", "y", keep_cols=["k"]).collect()
    )
    assert [k for k, _, _ in out] == [1, 2, 3]


def test_gopher_rules_invariant_under_repartition(spark):
    """Every Gopher rule is a pure row-local integer comparison, so the
    flag set must be identical under any partitioning (the hash_split
    reshuffle-stability property, applied to quality flags)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        gopher_quality,
    )
    from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import (
        load as _load,
    )

    docs = _load(spark, "documents", SF)
    a = {tuple(r) for r in gopher_quality(docs).collect()}
    b = {
        tuple(r)
        for r in gopher_quality(docs.repartition(7, "source")).collect()
    }
    assert a == b


def test_theil_sen_permutation_and_day_shift_invariant(spark):
    """The pairwise-slope median must not depend on row order, and
    shifting the whole calendar must not change slopes (only day DIFFS
    enter the estimator)."""
    import datetime
    import random

    from etl_world_banks_with_python_and_postgresql_spark.operators.timeseries import (
        theil_sen_slope,
    )

    rng = random.Random(3)
    day0 = datetime.datetime(2024, 3, 1)
    rows = [
        (day0 + datetime.timedelta(days=d), "s", 3.0 * d + rng.uniform(-1, 1))
        for d in range(12)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    base = theil_sen_slope(df).collect()[0]["slope_micros_per_day"]
    shuffled = spark.createDataFrame(
        list(reversed(rows)), "ts timestamp, event_type string, value double"
    ).repartition(5)
    assert theil_sen_slope(shuffled).collect()[0]["slope_micros_per_day"] == base
    shifted = spark.createDataFrame(
        [(t + datetime.timedelta(days=365), g, v) for t, g, v in rows],
        "ts timestamp, event_type string, value double",
    )
    assert theil_sen_slope(shifted).collect()[0]["slope_micros_per_day"] == base


def test_semantic_decontaminate_planted_leak(spark):
    """A train vector equal (and one nearly equal) to an eval vector is
    dropped; orthogonal vectors survive; no eval-eval or train-train
    pair can cause a drop."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        semantic_decontaminate,
    )

    d = 64

    def unit(i):
        v = [0.0] * d
        v[i] = 1.0
        return v

    near = unit(0)
    near[1] = 0.2  # cos ~ 0.98 vs unit(0)
    eval_rows = [(1000, unit(0), 0), (1001, unit(1), 0)]
    train_rows = [
        (1, unit(0), 1),      # exact leak -> dropped
        (2, near, 1),         # near leak -> dropped
        (3, unit(2), 1),      # orthogonal -> kept
        (4, unit(3), 1),      # orthogonal -> kept (even though 3 ~ 4
                              # are both train: within-side never drops)
    ]
    schema = "vec_id long, embedding array<float>, label int"
    out = semantic_decontaminate(
        spark.createDataFrame(train_rows, schema),
        spark.createDataFrame(eval_rows, schema),
        threshold=0.9,
    )
    assert sorted(r["vec_id"] for r in out.collect()) == [3, 4]


def test_gini_concentration_hand_checked(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.rollup import (
        gini_concentration,
    )

    rows = [
        # perfectly equal group: gini 0
        ("eq", 1, 100), ("eq", 2, 100), ("eq", 3, 100), ("eq", 4, 100),
        # one member owns everything: gini (n-1)/n = 0.75
        ("top", 1, 0), ("top", 2, 0), ("top", 3, 0), ("top", 4, 400),
        # zero total -> NULL
        ("zero", 1, 0), ("zero", 2, 0),
    ]
    df = spark.createDataFrame(rows, "g string, k long, x long")
    out = {
        r["g"]: (r["n_members"], r["gini_micros"])
        for r in gini_concentration(df, "x", "g", "k").collect()
    }
    assert out["eq"] == (4, 0)
    assert out["top"] == (4, 750_000)
    assert out["zero"] == (2, None)


def test_ab_gate_chi_square_matches_scipy_free_reference(spark):
    """The cleared-integer comparison equals the textbook chi-square
    computed in floats, on a seeded table where chi2 is far from the
    3.84 boundary on both sides."""
    for a, b, c, d, expect in [
        (60, 40, 40, 60, True),    # chi2 = 8.0
        (52, 48, 48, 52, False),   # chi2 = 0.32
    ]:
        n = a + b + c + d
        chi2 = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
        assert (chi2 >= 3.84) == expect
        assert (
            100 * n * (a * d - b * c) ** 2
            >= 384 * ((a + b) * (c + d) * (a + c) * (b + d))
        ) == expect


def test_degree_assortativity_ground_truth_and_regular_graph(spark):
    """degree_assortativity vs an independent fractions-based Pearson on
    a random graph (ground truth, not engine/oracle parity -- the z144
    lesson), plus the degree-regular edge case (cycle graph: zero
    variance -> NULL coefficient)."""
    import random
    from fractions import Fraction

    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        degree_assortativity,
    )

    rng = random.Random(7)
    n = 40
    edges = sorted(
        {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(130)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in edges] + [deg[b] for a, b in edges]
    ys = [deg[b] for a, b in edges] + [deg[a] for a, b in edges]
    m = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num, den = m * sxy - sx * sx, m * sxx - sx * sx
    want = (1 if num >= 0 else -1) * (
        (2 * 10**6 * abs(num) + den) // (2 * den)
    )
    # independent float check that the integer formula IS Pearson
    mean = sx / m
    r_float = (sxy / m - mean * mean) / (sxx / m - mean * mean)
    assert abs(want / 1e6 - r_float) < 2e-6
    assert Fraction(num, den) == Fraction(m * sxy - sx * sx, m * sxx - sx * sx)

    df = spark.createDataFrame(edges, "src long, dst long")
    row = degree_assortativity(df).collect()[0]
    assert (
        row["m_endpoint_pairs"],
        row["sx"],
        row["sxx"],
        row["sxy"],
        row["assortativity_micros"],
    ) == (m, sx, sxx, sxy, want)

    # cycle graph: every degree is 2 -> zero variance -> NULL
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    r = degree_assortativity(cyc).collect()[0]
    assert r["assortativity_micros"] is None


def test_clustering_pair_eval_brute_force_ground_truth(spark):
    """clustering_pair_eval vs literal pair ENUMERATION on a random
    labeled clustering (ground truth, not engine/oracle parity): the
    contingency C(n,2) algebra must equal counting actual pairs, and
    ARI must match the Hubert-Arabie formula computed in exact
    Fractions -- including a worse-than-chance case going negative."""
    import random
    from fractions import Fraction
    from itertools import combinations

    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        clustering_pair_eval,
    )

    rng = random.Random(11)
    items = [(i, rng.randrange(6), rng.randrange(4)) for i in range(120)]
    tp = fp = fn = tn = 0
    for (_i1, c1, t1), (_i2, c2, t2) in combinations(items, 2):
        same_c, same_t = c1 == c2, t1 == t2
        tp += same_c and same_t
        fp += same_c and not same_t
        fn += same_t and not same_c
        tn += not same_c and not same_t
    p_clu, p_tru, p_all = tp + fp, tp + fn, tp + fp + fn + tn

    def halfup(fr: Fraction) -> int:
        n, d = fr.numerator, fr.denominator
        s = 1 if n >= 0 else -1
        return s * ((2 * 10**6 * abs(n) + d) // (2 * d))

    want = {
        "precision_micros": halfup(Fraction(tp, p_clu)),
        "recall_micros": halfup(Fraction(tp, p_tru)),
        "f1_micros": halfup(Fraction(2 * tp, p_clu + p_tru)),
        "rand_micros": halfup(Fraction(tp + tn, p_all)),
        "ari_micros": halfup(
            # 2x-scaled form (matches the operator + oracle): clears
            # the half-integer when p_all*(p_clu+p_tru) is odd
            Fraction(
                2 * (tp * p_all - p_clu * p_tru),
                p_all * (p_clu + p_tru) - 2 * p_clu * p_tru,
            )
        ),
    }
    df = spark.createDataFrame(
        [(c, t) for _i, c, t in items], "cluster int, truth int"
    )
    row = clustering_pair_eval(df, "cluster", "truth").collect()[0]
    assert (row["tp_pairs"], row["cluster_pairs"], row["truth_pairs"]) == (
        tp, p_clu, p_tru,
    )
    for k, v in want.items():
        assert row[k] == v, (k, row[k], v)
    # independent random labels: ARI should hover near 0 and CAN be
    # negative; this seed's value just must match the enumeration
    # (checked above). Perfect clustering: everything 1e6, by algebra:
    perfect = spark.createDataFrame(
        [(t, t) for _i, _c, t in items], "cluster int, truth int"
    )
    p = clustering_pair_eval(perfect, "cluster", "truth").collect()[0]
    assert (
        p["precision_micros"], p["recall_micros"], p["f1_micros"],
        p["rand_micros"], p["ari_micros"],
    ) == (10**6,) * 5


def test_clustering_pair_eval_odd_denominator_parity(spark):
    """ADVICE r13 #1 regression: when p_all*(p_clu+p_tru) is ODD, the
    pre-fix Spark (exact decimal /2, HALF_UP later) and DuckDB (floor
    //2) denominators differed by 1, shifting ari_micros by thousands
    of micros. The 2x-scaled all-integer form must make the Spark
    operator, the DuckDB twin, and exact Fractions agree bit-for-bit
    on a handcrafted odd-parity labeling."""
    from fractions import Fraction
    from itertools import combinations

    import duckdb

    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        clustering_pair_eval,
        clustering_pair_eval_oracle_sql,
    )

    # 7 items: p_all = C(7,2) = 21 (odd), clusters -> p_clu = 5,
    # truth -> p_tru = 6, so p_all*(p_clu+p_tru) = 231 is odd and
    # tp = 3 > 0 (the pre-fix engines disagree: 385965 vs 388235).
    clusters = [0, 0, 0, 1, 1, 2, 2]
    truth = [0, 0, 0, 0, 1, 2, 3]
    items = list(zip(clusters, truth))
    tp = sum(
        c1 == c2 and t1 == t2
        for (c1, t1), (c2, t2) in combinations(items, 2)
    )
    p_clu = sum(c1 == c2 for (c1, _), (c2, _) in combinations(items, 2))
    p_tru = sum(t1 == t2 for (_, t1), (_, t2) in combinations(items, 2))
    p_all = len(items) * (len(items) - 1) // 2
    assert (p_all * (p_clu + p_tru)) % 2 == 1 and tp > 0

    def halfup(fr: Fraction) -> int:
        n, d = fr.numerator, fr.denominator
        s = 1 if n >= 0 else -1
        return s * ((2 * 10**6 * abs(n) + d) // (2 * d))

    want = halfup(
        Fraction(
            2 * (tp * p_all - p_clu * p_tru),
            p_all * (p_clu + p_tru) - 2 * p_clu * p_tru,
        )
    )
    df = spark.createDataFrame(items, "cluster int, truth int")
    got = clustering_pair_eval(df, "cluster", "truth").collect()[0]
    assert got["ari_micros"] == want

    rows_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({c}, {t})" for c, t in items
    ) + ") v(cluster, truth)"
    oracle = duckdb.sql(
        clustering_pair_eval_oracle_sql(rows_sql)
    ).fetchone()
    cols = [
        "n_items", "tp_pairs", "cluster_pairs", "truth_pairs",
        "precision_micros", "recall_micros", "f1_micros",
        "rand_micros", "ari_micros",
    ]
    odict = dict(zip(cols, oracle))
    assert odict["ari_micros"] == want
    for k in cols:
        assert odict[k] == got[k], (k, odict[k], got[k])


def test_tokenizer_fertility_hand_counts(spark):
    """tokenizer_fertility vs hand-counted tokens: mixed alpha/digit/
    punct BPE runs, CJK (no whitespace words beyond the split), the
    blank-text ws special case, and NULL ratios for an empty-sum
    group."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        tokenizer_fertility,
    )

    rows = [
        (1, "the cat", "en"),   # ws 2, bpe 2, ch 7
        (2, "", "en"),          # ws 0, bpe 0, ch 0
        (3, "a1!", "en"),       # ws 1, bpe 3 (a|1|!), ch 3
        (4, "你好 世界", "zh"),  # ws 2, bpe 2, ch 5
        (5, "", "xx"),          # empty-only group -> NULL ratios
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["lang"]: (
            r["n_docs"], r["ws_tokens"], r["bpe_tokens"], r["n_chars"],
            r["fertility_micros"], r["chars_per_bpe_micros"],
        )
        for r in tokenizer_fertility(df).collect()
    }
    assert got == {
        "en": (3, 3, 5, 10, 1_666_667, 2_000_000),  # 5/3, 10/5
        "zh": (1, 2, 2, 5, 1_000_000, 2_500_000),
        "xx": (1, 0, 0, 0, None, None),
    }


def test_subsample_median_ci_hand_replication(spark):
    """subsample_median_ci vs a literal python replication of the
    md5-keyed half-sampling and lower-median selection (ground truth,
    not parity), plus bit-equality with the DuckDB twin on the same
    rows."""
    import hashlib

    import duckdb

    from etl_world_banks_with_python_and_postgresql_spark.operators.sketch import (
        subsample_median_ci,
        subsample_median_ci_oracle_sql,
    )

    rows = [(i, 10 * i) for i in range(1, 26)]  # ids 1..25, values 10..250
    B = 8
    lo_rank, hi_rank = max(1, round(0.1 * B)), B + 1 - max(1, round(0.1 * B))

    def kept(i, b):
        h = hashlib.md5(f"{i}:{b}".encode()).hexdigest()[:12]
        return int(h, 16) % 2 == 0

    def lower_median(vals):
        vals = sorted(vals)
        return vals[(len(vals) + 1) // 2 - 1]

    rep_meds = sorted(
        (
            lower_median([v for i, v in rows if kept(i, b)]),
            b,
        )
        for b in range(B)
    )
    meds = [m for m, _b in rep_meds]
    want = {
        "n": 25,
        "n_replicates": B,
        "median": lower_median([v for _i, v in rows]),
        "ci_lo": meds[lo_rank - 1],
        "ci_hi": meds[hi_rank - 1],
        "rep_min": meds[0],
        "rep_max": meds[-1],
    }
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = subsample_median_ci(
        df, "n_chars", "doc_id", n_replicates=B
    ).collect()[0]
    assert got.asDict() == want

    rows_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, {v})" for i, v in rows
    ) + ") t(doc_id, n_chars)"
    odict = dict(
        zip(
            list(want),
            duckdb.sql(
                subsample_median_ci_oracle_sql(
                    rows_sql,
                    value_sql="n_chars",
                    id_sql="doc_id",
                    n_replicates=B,
                )
            ).fetchone(),
        )
    )
    assert odict == want


def test_anchor_margin_profile_hand_case(spark):
    """anchor_margin_profile on hand 2-D vectors: assignments, the
    tie-to-smaller-anchor rule, nearest-rank medians, and bit-equality
    between Spark and the DuckDB twin on identical literals."""
    import duckdb
    import pytest as _pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        anchor_margin_profile,
        anchor_margin_profile_oracle_sql,
    )

    vecs = [
        (1, [1.0, 0.0]),    # cell 10, margin 1
        (2, [0.6, 0.8]),    # cell 20, margin ~0.2
        (3, [3.0, 3.0]),    # equidistant -> tie to anchor 10, margin 0
        (4, [0.0, 2.0]),    # cell 20, margin 1
        (10, [1.0, 0.0]),   # anchor 10 itself
        (20, [0.0, 1.0]),   # anchor 20 itself
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    anchors = df.filter(F.col("vec_id").isin(10, 20))
    got = {
        r["cell_id"]: (
            r["n_vectors"], r["min_margin_micros"],
            r["median_margin_micros"], r["max_margin_micros"],
        )
        for r in anchor_margin_profile(df, anchors).collect()
    }
    assert set(got) == {10, 20}
    n10, mn10, md10, mx10 = got[10]
    n20, mn20, md20, mx20 = got[20]
    assert (n10, mn10, md10, mx10) == (3, 0, 10**6, 10**6)
    assert n20 == 3 and md20 == 10**6 and mx20 == 10**6
    # floor((0.8-0.6)*1e6) on the rounded doubles: 200000 +- 1 ulp step
    assert mn20 == _pytest.approx(200_000, abs=1)

    lit = ", ".join(f"({i}, {v})" for i, v in vecs)
    corpus_sql = (
        f"SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM "
        f"(SELECT * FROM (VALUES {lit}) t(vec_id, embedding))"
    )
    anchors_sql = corpus_sql + " WHERE vec_id IN (10, 20)"
    cos = (
        "round(list_dot_product(qv, v)"
        " / (sqrt(list_dot_product(qv, qv))"
        " * sqrt(list_dot_product(v, v))), 6)"
    )
    oracle = {
        r[0]: r[1:]
        for r in duckdb.sql(
            anchor_margin_profile_oracle_sql(corpus_sql, anchors_sql, cos)
        ).fetchall()
    }
    assert oracle == got  # bit-identical floats, not approx


def test_blocking_quality_hand_case(spark):
    """blocking_quality vs hand-derived pair algebra: blocks {1,2,3},
    {4,5}, {6} -> 4 candidate pairs of 15, reduction 11/15; truth
    pairs (1,2) blocked, (3,4) and (5,6) split, (1,9) referencing a
    missing item dropped -> completeness 1/3; DuckDB twin must agree
    on the same literals."""
    import duckdb

    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        blocking_quality,
        blocking_quality_oracle_sql,
    )

    items = [(1, "X"), (2, "X"), (3, "X"), (4, "Y"), (5, "Y"), (6, "Z")]
    truth = [(1, 2), (3, 4), (5, 6), (1, 9)]
    want = {
        "n_items": 6, "n_blocks": 3, "max_block_size": 3,
        "n_candidate_pairs": 4, "n_all_pairs": 15,
        "n_true_matches": 3, "n_matches_blocked": 1,
        "reduction_ratio_micros": 733333,   # 11/15 HALF_UP
        "pairs_completeness_micros": 333333,  # 1/3 HALF_UP
    }
    got = blocking_quality(
        spark.createDataFrame(items, "id long, block string"),
        spark.createDataFrame(truth, "id_a long, id_b long"),
    ).collect()[0]
    assert got.asDict() == want

    items_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{b}')" for i, b in items
    ) + ") v(id, block)"
    truth_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in truth
    ) + ") w(id_a, id_b)"
    odict = dict(
        zip(
            list(want),
            duckdb.sql(
                blocking_quality_oracle_sql(
                    items_sql, truth_sql, id_sql="id", block_sql="block"
                )
            ).fetchone(),
        )
    )
    assert odict == want


def test_heavy_hitters_twopass_eviction_and_support_bound(spark):
    """heavy_hitters_twopass on a skewed literal corpus with capacity
    BELOW the distinct-key count (so Misra-Gries evictions actually
    fire): the two keys above the N/(capacity+1) support bound must
    surface with EXACT counts, identically under 1 and 4 partitions
    (the summaries are partitioning-dependent, the output must not
    be); keys at/below the bound are filtered by their exact counts
    even when k would admit them (the phi-heavy-hitter contract), and
    the DuckDB twin agrees on the same literal rows."""
    import duckdb

    from etl_world_banks_with_python_and_postgresql_spark.operators.sketch import (
        heavy_hitters_oracle_sql,
        heavy_hitters_twopass,
    )

    rows = (
        [("a",)] * 50 + [("b",)] * 30 + [(f"u{i}",) for i in range(40)]
    )
    # N = 120, capacity 8 -> bound N/9 = 13.3; 'a' (50) and 'b' (30)
    # clear it, every unique key (1) does not; 42 distinct keys > 8
    # counters forces evictions inside the partition summaries
    for parts in (1, 4):
        df = spark.createDataFrame(rows, "tok string").repartition(parts)
        # k=5 would admit u-keys by count order, but none clears the
        # support bound -> exactly the two certain heavy hitters
        got = [
            (r["key"], r["n"])
            for r in heavy_hitters_twopass(
                df, "tok", k=5, capacity=8
            ).collect()
        ]
        assert got == [("a", 50), ("b", 30)], (parts, got)
    rows_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"('{k}')" for (k,) in rows
    ) + ") v(key)"
    oracle = duckdb.sql(
        heavy_hitters_oracle_sql(rows_sql, k=5, capacity=8)
    ).fetchall()
    assert oracle == [("a", 50), ("b", 30)]


def test_heavy_hitters_twopass_null_key(spark):
    """NULL as a true heavy hitter (ADVICE r14): the MG pass must not
    split NULL's weight across NaN dict entries, the pass-2 recount
    join must be null-safe, and NULL must surface with its exact count
    exactly as the DuckDB twin's GROUP BY does -- under both 1 and 4
    partitions. Also pins the tie-break: NULL sorts LAST on the key
    tie in both engines."""
    import duckdb

    from etl_world_banks_with_python_and_postgresql_spark.operators.sketch import (
        heavy_hitters_oracle_sql,
        heavy_hitters_twopass,
    )

    rows = (
        [(None,)] * 45 + [("a",)] * 45 + [("b",)] * 20
        + [(f"u{i}",) for i in range(30)]
    )
    # N = 140, capacity 8 -> bound 140/9 = 15.6: NULL (45), 'a' (45)
    # and 'b' (20) clear it; 30 uniques force MG evictions
    want = [("a", 45), (None, 45), ("b", 20)]
    for parts in (1, 4):
        df = spark.createDataFrame(rows, "tok string").repartition(parts)
        got = [
            (r["key"], r["n"])
            for r in heavy_hitters_twopass(
                df, "tok", k=5, capacity=8
            ).collect()
        ]
        assert got == want, (parts, got)
    rows_sql = "SELECT * FROM (VALUES " + ", ".join(
        "(NULL)" if k is None else f"('{k}')" for (k,) in rows
    ) + ") v(key)"
    oracle = duckdb.sql(
        heavy_hitters_oracle_sql(
            rows_sql, key_sql="key::VARCHAR", k=5, capacity=8
        )
    ).fetchall()
    assert oracle == want


def test_score_calibration_hand_bins(spark):
    """score_calibration vs hand-derived bin algebra, including the
    1e6-edge-joins-top-bin rule, a perfectly-calibrated-looking bin and
    a badly-miscalibrated one; Spark and the DuckDB twin must both
    match the hand numbers."""
    import duckdb

    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        score_calibration,
        score_calibration_oracle_sql,
    )

    rows = [
        (0, False), (50_000, True),          # bin 0: gap |50k - 1e6|
        (550_000, False),                    # bin 5: gap 550k
        (950_000, True), (1_000_000, True),  # bin 9 (1e6 edge joins it)
    ]
    want = {
        "n": 5, "n_pos": 3, "n_bins": 10, "n_bins_observed": 3,
        "ece_micros": 310_000,       # (950k + 550k + 50k) / 5
        "max_bin_gap_micros": 550_000,
    }
    df = spark.createDataFrame(rows, "score_micros long, label boolean")
    got = score_calibration(
        df, F.col("score_micros"), F.col("label"), n_bins=10
    ).collect()[0]
    assert got.asDict() == want

    rows_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({s}, {str(y).upper()})" for s, y in rows
    ) + ") v(score_micros, label)"
    cols = list(want)
    odict = dict(
        zip(cols, duckdb.sql(
            score_calibration_oracle_sql(rows_sql, n_bins=10)
        ).fetchone())
    )
    assert odict == want


def test_chisq_independence_brute_force_ground_truth(spark):
    """chisq_independence vs a literal full-grid computation (including
    UNOBSERVED cells) on a hand contingency with zero cells: the
    telescoped zero-cell absorption must equal summing every R x C
    cell, and the quantized-micros statistic must sit within per-cell
    quantization error of the exact float chi-square."""
    from fractions import Fraction

    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        chisq_independence,
    )

    cells = {("x", "p"): 4, ("x", "q"): 1, ("y", "p"): 1, ("y", "r"): 2}
    rows = [(a, b) for (a, b), n in cells.items() for _ in range(n)]
    n = len(rows)
    ra = {"x": 5, "y": 3}
    cb = {"p": 5, "q": 1, "r": 2}

    def halfup(fr: Fraction) -> int:
        return (2 * 10**6 * fr.numerator + fr.denominator) // (
            2 * fr.denominator
        )

    # the operator's telescoped + per-cell-quantized statistic
    want = (
        sum(
            halfup(
                Fraction(
                    (cells[(a, b)] * n - ra[a] * cb[b]) ** 2,
                    n * ra[a] * cb[b],
                )
            )
            - halfup(Fraction(ra[a] * cb[b], n))
            for (a, b) in cells
        )
        + n * 10**6
    )
    # independent check: the full-grid textbook sum over ALL cells
    # (zero cells included) in exact Fractions
    full = sum(
        Fraction(
            (cells.get((a, b), 0) * n - ra[a] * cb[b]) ** 2,
            n * ra[a] * cb[b],
        )
        for a in ra
        for b in cb
    )
    assert abs(want - full * 10**6) <= (2 * len(cells) + 1)  # quant error

    df = spark.createDataFrame(rows, "a string, b string")
    got = chisq_independence(df, "a", "b").collect()[0]
    assert got["n"] == n
    assert (got["n_a_cats"], got["n_b_cats"]) == (2, 3)
    assert got["n_observed_cells"] == 4
    assert got["dof"] == 2
    assert got["chisq_micros"] == want


def test_chisq_independence_null_categories_excluded(spark):
    """NULL semantics (ADVICE r14): rows with a NULL in either column
    are excluded BEFORE the contingency aggregate, so N equals the
    summed cells and the statistic matches the non-null subset exactly
    -- in BOTH engines (previously N counted the NULL rows while the
    null-unsafe margin joins dropped their cells, biasing chisq)."""
    import duckdb

    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        chisq_independence,
        chisq_independence_oracle_sql,
    )

    clean = [("x", "p")] * 4 + [("x", "q")] + [("y", "p")] + [("y", "r")] * 2
    noisy = clean + [(None, "p")] * 3 + [("x", None)] * 2 + [(None, None)]
    want = chisq_independence(
        spark.createDataFrame(clean, "a string, b string"), "a", "b"
    ).collect()[0].asDict()
    got = chisq_independence(
        spark.createDataFrame(noisy, "a string, b string"), "a", "b"
    ).collect()[0].asDict()
    assert got == want and got["n"] == len(clean)
    rows_sql = "SELECT * FROM (VALUES " + ", ".join(
        "({}, {})".format(
            "NULL::VARCHAR" if a is None else f"'{a}'",
            "NULL::VARCHAR" if b is None else f"'{b}'",
        )
        for a, b in noisy
    ) + ") v(a, b)"
    ocols = duckdb.sql(chisq_independence_oracle_sql(rows_sql)).fetchone()
    assert dict(zip(list(want), ocols)) == want


def test_magnitude_guard_raises_past_bound(spark):
    """magnitude_guard: 0 below the bound, a loud runtime error above
    it (ANSI is off in this session, so DECIMAL overflow alone would
    NULL out silently -- the guard is the enforcement)."""
    import pytest

    from etl_world_banks_with_python_and_postgresql_spark.functions.exactnum import (
        magnitude_guard,
    )

    df = spark.range(1).select(F.lit(10).cast("long").alias("n"))
    ok = df.select(
        (F.col("n") + magnitude_guard(F.col("n"), 100, "t")).alias("v")
    ).collect()
    assert ok[0]["v"] == 10
    with pytest.raises(Exception, match="magnitude bound exceeded"):
        df.select(
            (F.col("n") + magnitude_guard(F.col("n"), 5, "t")).alias("v")
        ).collect()


def test_rank_agreement_kendall_hand_case(spark):
    """rank_agreement_kendall vs hand-derived pair counts: a 1-swap
    case (tau = 1/3), a full reversal (tau = -1e6), a single-conjoint
    query and a fully disjoint query (both NULL tau -- no evidence is
    not tau 0)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        rank_agreement_kendall,
    )

    def run(rows):
        return spark.createDataFrame(
            rows, "query_id long, neighbor_id long, rank int"
        )

    a = run(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3), (1, 40, 4)]
        + [(2, 10, 1), (2, 20, 2), (2, 30, 3)]
        + [(3, 10, 1), (3, 20, 2)]
        + [(4, 10, 1), (4, 20, 2)]
    )
    b = run(
        # q1: swap 10<->20, keep 30, replace 40 with 50 -> conjoint
        # {10,20,30}, C=2 D=1, tau = 1/3
        [(1, 20, 1), (1, 10, 2), (1, 30, 3), (1, 50, 4)]
        # q2: full reversal -> C=0 D=3, tau = -1
        + [(2, 30, 1), (2, 20, 2), (2, 10, 3)]
        # q3: single conjoint item -> 0 pairs, NULL tau
        + [(3, 10, 1), (3, 99, 2)]
        # q4: disjoint -> n_common 0, NULL tau
        + [(4, 98, 1), (4, 99, 2)]
    )
    got = {
        r["query_id"]: (
            r["n_common"], r["n_pairs"], r["n_concordant"],
            r["n_discordant"], r["tau_micros"],
        )
        for r in rank_agreement_kendall(a, b, k=10).collect()
    }
    assert got == {
        1: (3, 3, 2, 1, 333333),  # (2*1e6*1 + 3) // 6 HALF_UP
        2: (3, 3, 0, 3, -(10**6)),
        3: (1, 0, 0, 0, None),
        4: (0, 0, 0, 0, None),
    }


def test_pmi_collocations_hand_counts(spark):
    """pmi_collocations vs hand-derived counts: 'big data' appears 3x
    adjacent; lift = n_ab * N_tok^2 / (N_big * n_a * n_b) checked in
    exact integers against a literal corpus."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        pmi_collocations,
    )

    docs = spark.createDataFrame(
        [
            ("big data big data systems",),
            ("big data rocks",),
            ("data big nothing",),
        ],
        "text string",
    )
    rows = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(docs, min_count=3).collect()
    }
    # tokens: 5 + 3 + 3 = 11; bigrams: 4 + 2 + 2 = 8
    # 'big data' pairs: 2 (doc1) + 1 (doc2) = 3; n_big=4+... big:4, data:4
    assert set(rows) == {("big", "data")}
    r = rows[("big", "data")]
    assert (r["n_pair"], r["n_w1"], r["n_w2"]) == (3, 4, 4)
    # lift = 3 * 11^2 / (8 * 4 * 4) = 363/128 = 2.8359375
    assert r["lift_micros"] == (2 * 10**6 * 363 + 128) // (2 * 128)


def test_temporal_novelty_hand_case(spark):
    """temporal_novelty against a literal timeline: fp A first on day 0
    (re-seen day 0 twice and day 1), fp B first on day 1, fp C day 2."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        temporal_novelty,
    )

    rows = [
        (1, 0, "A"), (2, 0, "A"), (3, 0, "A"),
        (4, 1, "A"), (5, 1, "B"),
        (6, 2, "C"), (7, 2, "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, day long, fp string")
    got = {
        r["day"]: (r["n_docs"], r["n_novel"], r["dup_rate_micros"])
        for r in temporal_novelty(df, F.col("day"), F.col("fp")).collect()
    }
    assert got == {
        0: (3, 1, 666667),  # 2/3 HALF_UP
        1: (2, 1, 500000),
        2: (2, 1, 500000),
    }


def test_temporal_novelty_id_domain_fail_loud(spark):
    """ADVICE r13 #3: an id outside [0, 10^12) would silently shift the
    decoded day in the day*10^12+id encoding -- the operator must DIE
    instead (per-row assert_true guard), for both too-large and
    negative ids."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        temporal_novelty,
    )

    for bad_id in (10**12, -1):
        df = spark.createDataFrame(
            [(1, 0, "A"), (bad_id, 1, "B")],
            "doc_id long, day long, fp string",
        )
        with pytest.raises(SparkRuntimeException, match="temporal_novelty"):
            temporal_novelty(df, F.col("day"), F.col("fp")).collect()
    # boundary id 10^12 - 1 is IN domain and must not trip the guard
    ok = spark.createDataFrame(
        [(10**12 - 1, 0, "A")], "doc_id long, day long, fp string"
    )
    row = temporal_novelty(ok, F.col("day"), F.col("fp")).collect()[0]
    assert (row["day"], row["n_docs"], row["n_novel"]) == (0, 1, 1)


def test_classification_report_hand_confusion(spark):
    """classification_report vs a hand confusion matrix including a
    phantom prediction-only class and a never-predicted class."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        classification_report,
    )

    rows = (
        [("a", "a")] * 3 + [("a", "b")] * 1
        + [("b", "b")] * 2 + [("b", "ghost")] * 1
        + [("c", "a")] * 2  # class c never predicted
    )
    df = spark.createDataFrame(rows, "truth string, pred string")
    got = {
        r["class"]: (
            r["support"], r["tp"], r["fp"], r["fn"],
            r["precision_micros"], r["recall_micros"], r["f1_micros"],
        )
        for r in classification_report(df, "truth", "pred").collect()
    }
    assert got["a"] == (4, 3, 2, 1, 600000, 750000, 666667)
    assert got["b"] == (3, 2, 1, 1, 666667, 666667, 666667)
    assert got["c"] == (2, 0, 0, 2, None, 0, 0)
    assert got["ghost"] == (0, 0, 1, 0, 0, None, 0)


def test_retrieval_ndcg_mrr_hand_case(spark):
    """retrieval_ndcg_mrr vs hand-computed integer-micros DCG: gains
    (0, 2, 1) at ranks 1..3 with k=3; ideal is (2, 1, 0); a query with
    no relevant results yields NULL ndcg/rr."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        ndcg_discounts_micros,
        retrieval_ndcg_mrr,
    )

    d1, d2, d3 = ndcg_discounts_micros(3)
    run = spark.createDataFrame(
        [(1, 1, 0), (1, 2, 2), (1, 3, 1), (2, 1, 0), (2, 2, 0)],
        "query_id long, rank int, rel int",
    )
    got = {
        r["query_id"]: r
        for r in retrieval_ndcg_mrr(run, k=3).collect()
    }
    dcg = 0 * d1 + 2 * d2 + 1 * d3
    idcg = 2 * d1 + 1 * d2 + 0 * d3
    r1 = got[1]
    assert (r1["dcg_um"], r1["idcg_um"]) == (dcg, idcg)
    assert r1["ndcg_micros"] == (2 * 10**6 * dcg + idcg) // (2 * idcg)
    assert (r1["first_rel_rank"], r1["rr_micros"]) == (2, 500000)
    r2 = got[2]
    assert (
        r2["ndcg_micros"], r2["first_rel_rank"], r2["rr_micros"],
    ) == (None, None, None)
    assert (r2["dcg_um"], r2["idcg_um"]) == (0, 0)


def test_key_skew_and_join_preflight_hand_cases(spark):
    """key_skew_profile + join_explosion_preflight against literal
    counts, including the self-join quadratic case."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        join_explosion_preflight,
        key_skew_profile,
    )

    df = spark.createDataFrame(
        [(1, "x")] * 6 + [(2, "y")] * 2 + [(3, "y")] * 2,
        "k long, g string",
    )
    prof = {
        r["col"]: r for r in key_skew_profile(df, ["k", "g"]).collect()
    }
    # k: n=10, keys 3, max 6 -> share .6, hhi (36+4+4)/100 = .44,
    # skew_x = 6*3/10 = 1.8
    assert (
        prof["k"]["n_keys"], prof["k"]["max_key_n"],
        prof["k"]["max_share_micros"], prof["k"]["hhi_micros"],
        prof["k"]["skew_x_micros"],
    ) == (3, 6, 600000, 440000, 1800000)
    # g: keys 2, max 6 (x) wait: x=6, y=4 -> hhi (36+16)/100 = .52
    assert (
        prof["g"]["n_keys"], prof["g"]["max_key_n"],
        prof["g"]["hhi_micros"],
    ) == (2, 6, 520000)

    pf = join_explosion_preflight(df, df, "k", "k").collect()[0]
    # self join: 36 + 4 + 4 = 44 rows, amplification 4.4x, max key 36
    assert (
        pf["left_rows"], pf["n_shared_keys"], pf["join_rows"],
        pf["amplification_micros"], pf["max_key_pairs"],
        pf["max_key_share_micros"],
    ) == (10, 3, 44, 4400000, 36, (2 * 10**6 * 36 + 44) // (2 * 44))
    # disjoint key spaces: zero output, loudly visible
    other = spark.createDataFrame([(9, "z")], "k long, g string")
    pf0 = join_explosion_preflight(df, other, "k", "k").collect()[0]
    assert (pf0["join_rows"], pf0["max_key_share_micros"]) == (0, None)


def test_quantile_normalize_hand_case(spark):
    """quantile_normalize_scores vs hand mid-ranks, including ties and
    a single-row group."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        quantile_normalize_scores,
    )

    rows = [
        (1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "a", 30),
        (5, "b", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, s long")
    got = {
        r["doc_id"]: r["qnorm_micros"]
        for r in quantile_normalize_scores(df, F.col("s")).collect()
    }
    # group a (n=4): score 10 -> (2*0+1-1)/(2*3)=0; 20 (tie, below=1,
    # eq=2) -> (2+2-1)/6 = 0.5; 30 -> (6+1-1)/6 = 1
    assert got[1] == 0
    assert got[2] == got[3] == 500000
    assert got[4] == 1000000
    assert got[5] == 500000  # singleton group convention


def test_harmonic_centrality_hand_cases(spark):
    """harmonic_centrality against hand-derived shells: a path (shell
    arithmetic), a triangle+tail (MIN-distance semantics -- a node
    reachable at d=1 and d=2 counts ONCE at d=1), and the transit cap
    (paths through a capped hub are dropped, its own row remains)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
        harmonic_centrality,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], "src long, dst long"
    )
    got = {
        r["node"]: (r["harmonic_micros"], r["n_reach"])
        for r in harmonic_centrality(path, hops=2).collect()
    }
    assert got == {
        1: (1_500_000, 2),
        2: (2_500_000, 3),
        3: (3_000_000, 4),
        4: (2_500_000, 3),
        5: (1_500_000, 2),
    }

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {
        r["node"]: (r["harmonic_micros"], r["n_reach"])
        for r in harmonic_centrality(tri, hops=2).collect()
    }
    # nodes 1,2: two d=1 neighbors + node 4 at d=2 (via 3; and node
    # 1<->2 are NOT double-counted at d=2 through 3 -- min distance)
    assert got[1] == (2_500_000, 3) and got[2] == (2_500_000, 3)
    assert got[3] == (3_000_000, 3)  # all three at d=1
    assert got[4] == (2_000_000, 3)  # 3 at d=1; 1,2 at d=2

    # transit cap 1: node 2 (degree 2) cannot be a middle node
    capped = harmonic_centrality(
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"),
        hops=2,
        max_transit_degree=1,
    )
    got = {
        r["node"]: (r["harmonic_micros"], r["n_reach"])
        for r in capped.collect()
    }
    assert got == {1: (1_000_000, 1), 2: (2_000_000, 2), 3: (1_000_000, 1)}


def test_rank_agreement_rbo_hand_cases(spark):
    """rank_agreement_rbo vs hand algebra: identical runs score the
    exact truncated ceiling sum(SW[d]); disjoint runs score 0 (with a
    row, not a gap); a known partial overlap contributes exactly
    SW[max(ra, rb)] per common item."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        rank_agreement_rbo,
        rbo_suffix_weights_micros,
    )

    k = 3
    sw = rbo_suffix_weights_micros(k, p=0.9)
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    same = rank_agreement_rbo(run, run, k=k, p=0.9).collect()[0]
    assert (same["n_common"], same["rbo_micros"]) == (3, sum(sw))

    disjoint = spark.createDataFrame(
        [(1, 20, 1), (1, 21, 2), (1, 22, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    z = rank_agreement_rbo(run, disjoint, k=k, p=0.9).collect()[0]
    assert (z["n_common"], z["rbo_micros"]) == (0, 0)

    # item 10 at (1, 3) -> SW[3]; item 11 at (2, 1) -> SW[2]
    partial = spark.createDataFrame(
        [(1, 11, 1), (1, 20, 2), (1, 10, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    p_ = rank_agreement_rbo(run, partial, k=k, p=0.9).collect()[0]
    assert (p_["n_common"], p_["rbo_micros"]) == (2, sw[2] + sw[1])
    # ceiling sanity: sum_m SW[m] = sum_d d*w_d = 1 - p^k (each depth-d
    # weight is counted d times across the suffix sums)
    assert abs(sum(sw) - round(1_000_000 * (1 - 0.9**k))) <= k
