"""Unit tests for z19-z21's operators: semantic_dedup (SemDeDup shape),
hashed_linear_score (hashed linear quality filter), embedding_moments
(per-dimension integer-micro corpus moments).

The registry-level oracle/determinism/plan-lint sweeps already gate the
end-to-end queries; these tests pin the operator-level contracts on tiny
hand-built inputs where the expected answer is checkable by eye.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
    embedding_moments,
    semantic_dedup,
)
from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
    hashed_linear_score,
)


def test_semantic_dedup_clusters_and_singletons(spark):
    # 3 near-identical vectors (one cluster), 1 orthogonal singleton.
    base = [1.0, 0.0, 0.0, 0.0]
    near1 = [0.999, 0.01, 0.0, 0.0]
    near2 = [0.998, -0.01, 0.01, 0.0]
    ortho = [0.0, 1.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(1, base), (2, near1), (3, near2), (9, ortho)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(df, threshold=0.9, bands=8, bits_per_band=4, dim=4)
    rows = {r["vec_id"]: (r["cluster_id"], r["kept"]) for r in out.collect()}
    assert rows[1] == (1, True)
    assert rows[2] == (1, False)
    assert rows[3] == (1, False)
    assert rows[9] == (9, True)  # singleton keeps itself
    # exactly one representative per cluster
    kept = [v for v, (c, k) in rows.items() if k]
    assert sorted(kept) == [1, 9]


def test_semantic_dedup_schema_stable_when_no_pairs(spark):
    # all-orthogonal corpus: no pairs at all; every vector is a kept singleton
    df = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(4)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(df, threshold=0.9, bands=4, bits_per_band=4, dim=4)
    assert out.columns == ["vec_id", "cluster_id", "kept"]
    assert all(r["kept"] and r["cluster_id"] == r["vec_id"] for r in out.collect())


def test_hashed_linear_score_exact_and_blank(spark):
    df = spark.createDataFrame(
        [(1, "good words here"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in hashed_linear_score(df).collect()}
    # blank docs: zero tokens, zero sums, rejected (score strictly > 0 accepts)
    for d in (2, 3):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["weight_sum"] == 0
        assert rows[d]["score_bp"] == 0
        assert rows[d]["accept"] is False
    # doc 1: recompute the exact integer contract in python
    import hashlib

    def w(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 2001 - 1000

    expect = sum(w(t) for t in "good words here".split())
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["weight_sum"] == expect
    # Spark `div` truncates toward zero, matching the oracle's `//`
    q = abs(expect * 10) // 3
    assert rows[1]["score_bp"] == (q if expect >= 0 else -q)
    assert rows[1]["accept"] is (expect > 0)


def test_embedding_moments_exact_micros(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0]), (2, [0.25, 2.0]), (3, [0.0, 0.125])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["dim_idx"]: r for r in embedding_moments(df).collect()}
    assert rows[0]["n"] == 3 and rows[1]["n"] == 3
    assert rows[0]["sum_micro"] == 500_000 + 250_000 + 0
    assert rows[1]["sum_micro"] == -1_000_000 + 2_000_000 + 125_000
    assert rows[0]["mean_micro"] == rows[0]["sum_micro"] // 3
    assert rows[0]["sum_sq_micro2"] == 500_000**2 + 250_000**2
    assert (
        rows[1]["sum_sq_micro2"]
        == 1_000_000**2 + 2_000_000**2 + 125_000**2
    )


def test_embedding_moments_sum_sq_beyond_int64(spark):
    """The DECIMAL(38,0) squares sum must be EXACT past the old LongType
    cliff (VERDICT r10 #3): 10 rows at |v| = 1000 give micro = 1e9,
    square = 1e18 each, total 1e19 > int64 max (~9.2e18) -- the regime
    a petabyte corpus reaches on every dimension. Also pins the factor
    lift: a single |v| = 4000 row (micro 4e9) would wrap the raw
    LongType product (1.6e19)."""
    from decimal import Decimal

    rows10 = [(i, [1000.0]) for i in range(10)]
    out = embedding_moments(
        spark.createDataFrame(rows10, "vec_id long, embedding array<float>")
    ).collect()[0]
    assert out["sum_sq_micro2"] == Decimal(10) * 10**18
    assert out["sum_micro"] == 10 * 10**9

    big = embedding_moments(
        spark.createDataFrame(
            [(1, [4000.0])], "vec_id long, embedding array<float>"
        )
    ).collect()[0]
    assert big["sum_sq_micro2"] == Decimal(16) * 10**18

    # presentation type is decimal(38,0), not long -- no downcast cliff
    schema = {
        f.name: f.dataType.simpleString()
        for f in embedding_moments(
            spark.createDataFrame(
                rows10, "vec_id long, embedding array<float>"
            )
        ).schema.fields
    }
    assert schema["sum_sq_micro2"] == "decimal(38,0)"


def test_auto_bits_sizing_rule_and_adversarial_replicas(spark):
    """bits_per_band=None must enforce 2^bits >= n/100 in code (VERDICT r4
    task #4): on a 16x-replicated duplicate-heavy corpus the auto path
    must (a) equal the explicitly-sized run bit-for-bit and (b) finish
    inside a wall bound that the coarse-bits cliff would blow through."""
    import math
    import time

    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        _auto_lsh_layout,
        cosine_neardup_pairs,
    )

    # 800 base vectors x 16 replicas = 12800 rows: past the n=6400 knee,
    # so the rule must pick bits > 6 (heavy same-bucket duplicate mass)
    emb = (
        spark.range(800)
        .crossJoin(spark.range(16).select(F.col("id").alias("rep")))
        .select(
            (F.col("id") * 16 + F.col("rep")).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda d: (
                    F.sin(F.col("id") * 7 + d * 3) + (F.col("rep") % 3) * 1e-4
                ),
            ).alias("embedding"),
        )
    )
    n = emb.count()
    expected_bits = min(24, max(6, math.ceil(math.log2(n / 100))))
    assert expected_bits == 7  # 12800/100 = 128 -> ceil(log2) = 7 > default 6
    # the auto path also scales BANDS to hold the recall operating point
    # (ADVICE r5): at t=0.999 the 6->7 bit step costs one extra band
    exp_bits, exp_bands = _auto_lsh_layout(n, 4, 0.999)
    assert (exp_bits, exp_bands) == (7, 5)

    t0 = time.monotonic()
    auto = cosine_neardup_pairs(emb, threshold=0.999, bands=4, dim=16)
    auto_rows = sorted(tuple(r) for r in auto.collect())
    wall = time.monotonic() - t0
    assert wall < 120, f"auto-sized near-dup run took {wall:.1f}s"

    pinned = cosine_neardup_pairs(
        emb, threshold=0.999, bands=exp_bands, bits_per_band=exp_bits, dim=16
    )
    assert auto_rows == sorted(tuple(r) for r in pinned.collect())
    # replicas of the same base vector must be found as near-dups
    assert len(auto_rows) > 0
