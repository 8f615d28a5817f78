"""Cross-engine exact integer arithmetic column builders.

The one durable determinism lesson of rounds 3-4 (the q49 red cell):
``round(<double>, s)`` is NOT portable across engines. Spark rounds the
shortest decimal representation HALF_UP; DuckDB rounds the binary value --
when the true rational sits on (or within an ulp of) a decimal
half-boundary that binary cannot represent (1/640 = 0.0015625), the two
engines legitimately disagree in the last digit. The portable construction
is:

  1. do ALL arithmetic in exact BIGINT (counts, micros, basis points);
  2. round ONCE in integer space (HALF_UP = ``(2a + b) div (2b)``);
  3. if a double is wanted for presentation, emit ``k / 10^s.0`` -- a
     single IEEE division of exact integers is correctly rounded to the
     same bits in every engine.

Every helper has an exact DuckDB twin (the *_SQL strings) so operators
built on them verify hash-for-hash in the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS = 1_000_000


def floordiv_nonneg(a: Column, b: Column) -> Column:
    """Exact floor division of nonnegative integer columns (BIGINT or
    DECIMAL(38,0)), for the FULL int64 range and beyond.

    ``a - a % b`` is exactly divisible by ``b``; the division runs in
    DECIMAL(38,0), where an exactly-divisible quotient has no fraction to
    round -- exact even when the quotient exceeds 2^53 (an IEEE double
    division silently loses low bits there: caught by
    tests/test_exactnum.py's 2^40/3 case). Mirrors DuckDB's ``//`` for
    nonnegative operands.
    """
    a = a.cast("decimal(38,0)")
    b = b.cast("decimal(38,0)")
    exact = a - a % b
    return (exact / b).cast("long")


def ratio_scaled_halfup(num: Column, den: Column, scale: int) -> Column:
    """HALF_UP-rounded ``num/den`` scaled by 10^scale (BIGINT, exact).

    Nonnegative operands only, but valid for the FULL int64 magnitude
    range: the ``2*10^scale*num + den`` step runs in DECIMAL(38,0)
    (max ~2e6 * 2^63 ~ 1.8e25 << 10^38), so corpus-scale token/byte
    sums cannot silently wrap the way a LongType product would past
    ~2^63/(2*10^scale). Overflow-range property-pinned in
    tests/test_exactnum.py. ``ratio_scaled_halfup(n, d, 4) /
    F.lit(1e4)`` presents a bit-stable 4-dp double.
    """
    n = num.cast("decimal(38,0)")
    d = den.cast("decimal(38,0)")
    a = F.lit(2 * 10**scale).cast("decimal(38,0)") * n + d
    b = F.lit(2).cast("decimal(38,0)") * d
    return floordiv_nonneg(a, b)


def ratio_scaled_sql(num: str, den: str, scale: int) -> str:
    """DuckDB twin of ratio_scaled_halfup presented as a double."""
    p = 10**scale
    return (
        f"((2 * {p} * ({num}) + ({den})) // (2 * ({den}))) / {p}.0"
    )


def ratio_micros_halfup(num: Column, den: Column) -> Column:
    """HALF_UP-rounded ``num/den`` in integer micros (BIGINT, exact).

    Nonnegative operands only; full int64 magnitude range (the scaled
    sum runs in DECIMAL(38,0) -- see ratio_scaled_halfup). Present as a
    bit-stable double with ``ratio_micros_halfup(...) / F.lit(1e6)``.
    """
    return ratio_scaled_halfup(num, den, 6)


def magnitude_guard(value: Column, bound: int, what: str) -> Column:
    """Fail-loud magnitude guard: a BIGINT 0 that RAISES when ``value``
    exceeds ``bound``. ADD it into a gated output expression (e.g.
    ``metric + magnitude_guard(n, 5e7, "chisq")``) so Catalyst cannot
    prune it away.

    Why an explicit guard (ADVICE r14): the documented DECIMAL(38,0)
    magnitude bounds only "fail loudly" under ANSI mode; this engine
    runs with ANSI OFF, where decimal overflow yields NULL and
    ``F.sum`` then silently SKIPS the overflowed terms -- an
    understated statistic, not an error. The guard turns the
    documented input bound into a runtime error regardless of ANSI.
    """
    return (
        F.when(
            value.cast("decimal(38,0)")
            > F.lit(int(bound)).cast("decimal(38,0)"),
            F.raise_error(
                F.concat(
                    F.lit(f"{what}: input magnitude bound exceeded: "),
                    value.cast("string"),
                    F.lit(f" > {int(bound)} (DECIMAL(38,0) headroom; "
                          "run on smaller slices)"),
                )
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )


# DuckDB twins (str.format with num=..., den=...). `//` == floordiv_nonneg
# for nonnegative BIGINTs.
RATIO_MICROS_SQL = "((2000000 * ({num}) + ({den})) // (2 * ({den})))"
RATIO_DOUBLE_SQL = RATIO_MICROS_SQL + " / 1000000.0"
