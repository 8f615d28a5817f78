"""Skew operators (salted agg/join) and the Bloom decontamination path.

The salting contract is RESULT IDENTITY: salting only changes physical
distribution, never the answer. The Bloom contract is the same versus the
exact broadcast operator -- including when the filter is deliberately
undersized so false positives are guaranteed to reach the verify join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
    bloom_decontaminate,
    ngram_contamination,
)
from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
    dup_ngram_stats,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 'hot' owns 90% of rows -- the single-reducer shape salting exists for
    rows = [("hot" if i % 10 else f"cold{i}", i, float(i % 7)) for i in range(2000)]
    return spark.createDataFrame(rows, "key string, rid long, v double")


def test_salted_agg_matches_plain(skewed):
    plain = (
        skewed.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(25,6)")).alias("sv"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
    )
    salted = salted_agg(
        skewed,
        ["key"],
        [
            ("n", "count", F.lit(1)),
            ("sv", "sum", F.col("v").cast("decimal(25,6)")),
            ("mn", "min", F.col("v")),
            ("mx", "max", F.col("v")),
        ],
        salt=F.xxhash64("rid"),
        n_salts=16,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_rejects_nondecomposable(skewed):
    with pytest.raises(ValueError, match="self-decomposable"):
        salted_agg(
            skewed, ["key"], [("a", "avg", F.col("v"))], salt=F.xxhash64("rid")
        ).collect()


def test_salted_join_matches_plain_inner_and_left(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold1", "C1"), ("absent", "A")], "key string, tag string"
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        cols = ["key", "rid"] if how in ("left_semi", "left_anti") else [
            "key", "rid", "tag"
        ]
        plain = skewed.join(dim, "key", how).select(*cols)
        salted = salted_join(
            skewed, dim, on=["key"], salt=8, salt_expr=F.xxhash64("rid"), how=how
        ).select(*cols)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how


def test_salted_join_keys_include_salt(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "key string, tag string")
    j = salted_join(skewed, dim, on=["key"], salt=8, salt_expr=F.xxhash64("rid"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # the equi-join runs on (key, salt)


def test_salted_join_rejects_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "key string, tag string")
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(skewed, dim, on=["key"], how="full")
    # default salt_expr (hash of all left columns) also works
    n = salted_join(skewed, dim, on=["key"], salt=4).count()
    assert n == skewed.join(dim, "key").count()


@pytest.fixture(scope="module")
def corpora(spark):
    # eval corpus: 3 docs; train corpus: 8 docs, two of which embed an
    # exact 8-gram (or longer) span from the eval docs
    ev_texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs right now",
        "sphinx of black quartz judge my vow at once more",
    ]
    tr_texts = [
        "noise alpha beta gamma delta epsilon zeta eta theta iota",
        # contains eval gram span (>= 8 words verbatim)
        "prefix the quick brown fox jumps over the lazy dog tonight suffix",
        "completely unrelated words fill this training document here fine",
        "pack my box with five dozen liquor jugs right now exactly copied",
        "another clean document with no overlap to speak of today",
        "words words words words words words words words words words",
        "short doc",
        "final filler training text that shares nothing with the benchmark",
    ]
    ev = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ev_texts)], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(tr_texts)], "doc_id long, text string"
    )
    return tr, ev


def test_bloom_matches_exact_decontaminate(corpora):
    tr, ev = corpora
    exact = sorted(map(tuple, ngram_contamination(tr, ev, n=8).collect()))
    bloom = sorted(map(tuple, bloom_decontaminate(tr, ev, n=8).collect()))
    assert exact == bloom
    assert len(exact) == 2  # the two contaminated docs, nothing else


def test_bloom_exact_verify_kills_false_positives(corpora):
    # 64-bit filter with 2 hashes over ~100 grams -> filter is saturated,
    # nearly every train gram is a false positive candidate; the verify
    # join must still reduce to the exact answer
    tr, ev = corpora
    exact = sorted(map(tuple, ngram_contamination(tr, ev, n=8).collect()))
    bloom = sorted(
        map(
            tuple,
            bloom_decontaminate(tr, ev, n=8, m_bits=64, k_hashes=2).collect(),
        )
    )
    assert exact == bloom


def test_dup_ngram_stats_flags_boilerplate(spark):
    boiler = "this footer is shared across every page of the site"
    docs = [(i, f"unique words {i} alpha{i} beta{i} " + boiler) for i in range(12)]
    docs.append((50, "totally original text with no shared template at all"))
    docs.append((51, "tiny"))  # < n tokens -> 0 grams, dup_bp 0
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in dup_ngram_stats(df, n=5, min_docs=10).collect()}
    assert len(out) == 14
    # boilerplate-carrying docs: 15 tokens -> 11 5-grams; the 6 grams
    # fully inside the shared 10-word footer are duplicated
    for i in range(12):
        assert out[i].n_dup_grams == 6 and out[i].n_grams == 11
        assert out[i].dup_bp == (6 * 10000) // 11
    assert out[50].n_dup_grams == 0 and out[50].dup_bp == 0
    assert out[51].n_grams == 0 and out[51].dup_bp == 0


def test_bigram_coherence_hand_computed(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        bigram_coherence,
    )

    # corpus: "a b" x3, "a c" x1, "x" (no bigram), "" (no tokens)
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "x"), (6, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_coherence(df).collect()}
    assert len(out) == 6
    # c(a,b)=3, c(a,c)=1, c(a.)=4 -> term(a,b)=750000, term(a,c)=250000
    for d in (1, 2, 3):
        assert out[d].n_bigrams == 1 and out[d].coherence_ppm == 750000
    assert out[4].n_bigrams == 1 and out[4].coherence_ppm == 250000
    assert out[5].n_bigrams == 0 and out[5].coherence_ppm == 0
    assert out[6].n_bigrams == 0 and out[6].coherence_ppm == 0


def test_source_overlap_matrix_exact(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        source_overlap_matrix,
    )

    shared = "one two three four five six seven eight"
    rows = [
        (1, f"{shared} alpha beta", "a"),
        (2, f"{shared} gamma delta", "b"),
        (3, f"{shared} epsilon", "c"),
        (4, "totally different words with no overlap at all here", "d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["src_a"], r["src_b"]): r["shared_grams"]
        for r in source_overlap_matrix(df, n=8).collect()
    }
    # the single shared 8-gram connects each pair of a/b/c exactly once;
    # d shares nothing and never appears
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_weighted_priority_sample_properties(spark):
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        weighted_priority_sample,
    )

    rows = [(i, f"doc number {i} with text", float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w double")

    k = 20
    top = weighted_priority_sample(df, k, weight_col="w")
    got = top.collect()
    assert len(got) == k
    # sketch composability (the corpus-growth claim): top-k of the union ==
    # top-k of (top-k of each half) -- priorities are per-row pure functions
    a = df.filter(F.col("doc_id") < 100)
    b = df.filter(F.col("doc_id") >= 100)
    merged = weighted_priority_sample(
        weighted_priority_sample(a, k, weight_col="w").unionByName(
            weighted_priority_sample(b, k, weight_col="w")
        ).drop("priority"),
        k,
        weight_col="w",
    )
    assert sorted(r["doc_id"] for r in merged.collect()) == sorted(
        r["doc_id"] for r in got
    )
    # zero-weight rows can never outrank positive-weight rows
    z = spark.createDataFrame(
        [(1000, "zero weight row", 0.0)], "doc_id long, text string, w double"
    )
    with_zero = weighted_priority_sample(df.unionByName(z), k, weight_col="w")
    assert 1000 not in {r["doc_id"] for r in with_zero.collect()}
