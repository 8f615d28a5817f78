"""Property-based contracts for functions.exactnum -- the arithmetic the
whole round-5 determinism architecture rests on.

Hypothesis drives the CLAIMS (HALF_UP == Fraction ground truth; the
presentation division is bit-exact; floordiv == Python //) over wide
integer ranges, including the 2^53 neighborhood where naive float
shortcuts break. Spark-side evaluation is then pinned against the pure-
Python ground truth on a deterministic sample (one JVM round trip, not
one per example).
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

MICROS = 1_000_000


def py_floordiv(a: int, b: int) -> int:
    return (a - a % b) // b


def py_ratio_scaled_halfup(num: int, den: int, scale: int) -> int:
    a = 2 * 10**scale * num + den
    b = 2 * den
    return (a - a % b) // b


def halfup_ground_truth(num: int, den: int, scale: int) -> int:
    """ROUND_HALF_UP of num/den at 10^-scale via exact Fractions."""
    q = Fraction(num * 10**scale, den)
    floor = q.numerator // q.denominator
    rem = q - floor
    return floor + (1 if rem >= Fraction(1, 2) else 0)


@given(
    num=st.integers(min_value=0, max_value=10**12),
    den=st.integers(min_value=1, max_value=10**9),
    scale=st.integers(min_value=0, max_value=6),
)
@settings(max_examples=500, deadline=None)
def test_ratio_scaled_halfup_matches_fraction_ground_truth(num, den, scale):
    assert py_ratio_scaled_halfup(num, den, scale) == halfup_ground_truth(
        num, den, scale
    )


@given(
    k=st.integers(min_value=0, max_value=10**7),
    scale=st.integers(min_value=0, max_value=6),
)
@settings(max_examples=300, deadline=None)
def test_presentation_division_is_bit_exact(k, scale):
    """k / 10^scale as one IEEE division must be the correctly-rounded
    double of the rational -- i.e. equal to Python's exact-decimal float
    construction, in bits."""
    import struct

    shown = k / float(10**scale)
    via_decimal = float(
        __import__("decimal").Decimal(k) / (10**scale)
    )
    assert struct.pack(">d", shown) == struct.pack(">d", via_decimal)


@given(
    a=st.integers(min_value=0, max_value=2**52),
    b=st.integers(min_value=1, max_value=2**31),
)
@settings(max_examples=300, deadline=None)
def test_floordiv_matches_python(a, b):
    assert py_floordiv(a, b) == a // b


def test_spark_side_matches_python_ground_truth(spark):
    """One JVM round trip pinning the Column implementations against the
    pure-Python twins on adversarial cases: half boundaries, the 1/640
    class, large magnitudes near the exactness envelope."""
    from pyspark.sql import functions as F

    from etl_world_banks_with_python_and_postgresql_spark.functions.exactnum import (
        floordiv_nonneg,
        ratio_micros_halfup,
        ratio_scaled_halfup,
    )

    cases = [
        (1, 640),          # the canonical boundary rational
        (1, 2),            # exact half
        (3, 2),
        (0, 7),
        (5, 128),
        (999_999, 1_000_000),
        (1_000_001, 1_000_000),
        (123_456_789, 997),
        (2**40, 3),
        (7, 10**9),
    ]
    df = spark.createDataFrame(cases, "num long, den long")
    got = df.select(
        "num",
        "den",
        ratio_micros_halfup(F.col("num"), F.col("den")).alias("rm"),
        ratio_scaled_halfup(F.col("num"), F.col("den"), 4).alias("r4"),
        floordiv_nonneg(F.col("num"), F.col("den")).alias("fd"),
    ).collect()
    for r in got:
        num, den = r["num"], r["den"]
        assert r["rm"] == halfup_ground_truth(num, den, 6), (num, den)
        assert r["r4"] == halfup_ground_truth(num, den, 4), (num, den)
        assert r["fd"] == num // den, (num, den)


def test_quality_score_micros_hand_computed(spark):
    """Semantic pin: the exact-integer quality score must equal a
    by-hand derivation of the heuristic on crafted inputs -- cross-engine
    agreement alone cannot catch a bug shared by both twins."""
    from pyspark.sql import functions as F

    from etl_world_banks_with_python_and_postgresql_spark.operators.text import (
        quality_score_micros,
    )

    cases = {
        # 1: "the a of" -> 3 tokens all stopwords, 8 chars, 0 punct:
        #   len:  min(8*1000, 500000)                      = 8000
        #   stop: 300000 * min(15, 3) // 3                 = 300000
        #   punct: 200000 * (8 - 0) // 8                   = 200000
        1: ("the a of", 8000 + 300000 + 200000),
        # 2: 600 x's -> len capped, 0 stopwords, 0 punct
        2: ("x" * 600, 500000 + 0 + 200000),
        # 3: "a.b,c!d" -> ONE whitespace token (not a stopword), 7 chars,
        #   3 punct marks:
        #   len: 7000; stop: 0; punct: 200000*(7 - min(30,7))//7 = 0
        3: ("a.b,c!d", 7000 + 0 + 0),
        # 4: empty text -> tokens [''], n_tok=1, n_chars=max(0,1)=1:
        #   len: 0; stop: 0; punct: 200000*(1-0)//1 = 200000
        4: ("", 0 + 0 + 200000),
        # 5: "the x" -> 2 tokens 1 stopword, 5 chars, 0 punct:
        #   len: 5000; stop: 300000*min(5,2)//2 = 300000; punct: 200000
        5: ("the x", 5000 + 300000 + 200000),
    }
    df = spark.createDataFrame(
        [(k, t) for k, (t, _) in cases.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["m"]
        for r in df.select(
            "doc_id", quality_score_micros(F.col("text")).alias("m")
        ).collect()
    }
    for k, (_, want) in cases.items():
        assert got[k] == want, (k, got[k], want)


def test_ratio_halfup_survives_past_long_product_range(spark):
    """ADVICE r5 overflow hole: 2*10^scale*num in LongType silently wraps
    (non-ANSI Spark) once num exceeds ~2^63/(2*10^scale) ~ 4.6e12 at
    scale 6 -- plausible for corpus-level token/byte sums. The scaled sum
    now runs in DECIMAL(38,0); pin exactness across the FULL int64
    operand range, including the exact wrap threshold neighborhood."""
    from pyspark.sql import functions as F

    from etl_world_banks_with_python_and_postgresql_spark.functions.exactnum import (
        ratio_micros_halfup,
        ratio_scaled_halfup,
    )

    wrap6 = (2**63) // (2 * 10**6)  # first num where the old long path wraps
    cases = [
        (wrap6, 1),
        (wrap6 + 1, 1),
        (wrap6 * 1000, 10**6),
        (2**62, 10**6),
        (2**63 - 1, 10**9),
        (2**63 - 1, 2**63 - 1),
        (10**18, 999_999_937),
    ]
    df = spark.createDataFrame(cases, "num long, den long")
    got = df.select(
        "num",
        "den",
        ratio_micros_halfup(F.col("num"), F.col("den")).alias("rm"),
        ratio_scaled_halfup(F.col("num"), F.col("den"), 4).alias("r4"),
    ).collect()
    for r in got:
        num, den = r["num"], r["den"]
        assert r["rm"] == halfup_ground_truth(num, den, 6), (num, den)
        assert r["r4"] == halfup_ground_truth(num, den, 4), (num, den)
