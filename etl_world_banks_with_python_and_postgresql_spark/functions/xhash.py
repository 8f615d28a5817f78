"""Cross-engine deterministic hashing/tokenizing column builders.

Every helper here has an exactly-equivalent ANSI/DuckDB SQL form, so
operators built on them can be verified hash-for-hash against the DuckDB
oracle. Spark's native ``hash()`` (murmur3) and ``xxhash64`` have no DuckDB
twin, hence the explicit constructions:

  * ``ws_tokens``      whitespace tokens of lower(trim(text))
  * ``char_poly_hash`` polynomial rolling hash over characters, mod 1e9+7
  * ``word_shingles``  n-word shingles (strings), distinct

All are pure JVM-side expressions (no Python UDFs): split/transform/
aggregate stay inside whole-stage codegen / vectorized evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 1_000_000_007
POLY_BASE = 31
MINHASH_MOD = 2_147_483_647  # 2^31 - 1

# Fixed (a, b) parameters for the k minhash permutations h_i(x) = (a*x+b) % MOD.
# a*x stays < 2^63 for x < 1e9+7 and a <= 1000.
# The first 8 pairs are FROZEN (every committed oracle and at-rest index
# reproduces them bit-for-bit); entries 9..64 extend the family for
# larger-k layouts via a fixed affine recurrence (same determinism
# contract: the DuckDB twins read this same table, and a*h stays far
# below 2^63 -- a < 100003, h < 2^31).
MINHASH_PARAMS = [
    (7, 3),
    (13, 101),
    (31, 271),
    (61, 1009),
    (131, 8191),
    (251, 524287),
    (509, 131071),
    (1021, 2027),
]


def _extend_minhash_params(upto: int = 64) -> None:
    a, b = MINHASH_PARAMS[-1]
    while len(MINHASH_PARAMS) < upto:
        # deterministic, full-period-irrelevant scramble; a forced odd
        # and nonzero so every permutation is injective mod the prime
        a = (a * 7 + 12347) % 100003 | 1
        b = (b * 31 + 271) % 1_000_003
        MINHASH_PARAMS.append((a, b))


_extend_minhash_params()


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens of the lowercased, trimmed text.

    DuckDB twin: ``string_split_regex(trim(lower(x)), '\\s+')``.
    Note both engines yield a single empty-string token for empty input;
    guard with ``F.when`` where a true 0-count matters.
    """
    return F.split(F.trim(F.lower(col)), r"\s+")


def char_poly_hash(col: Column) -> Column:
    """Polynomial hash over characters: fold (acc*31 + ascii(c)) % (1e9+7).

    DuckDB twin:
      ``list_reduce(list_prepend(0, [ascii(c) for c in string_split(x,'')]),
                    (a, b) -> (a * 31 + b) % 1000000007)``
    (prepend the zero accumulator; DuckDB's list_reduce has no init arg).
    Cheap, deterministic, engine-portable; NOT cryptographic.
    """
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * POLY_BASE + F.ascii(c)) % POLY_MOD,
    )


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined) from a token array.

    Guarded against the short-input case: Spark's ``sequence(1, 0)``
    counts DOWN, so an unguarded expression would fabricate shingles for
    texts shorter than n tokens.

    PERF CONTRACT: pass ``tokens`` as a MATERIALIZED column reference
    (``withColumn("_toks", ws_tokens(...))`` first), never the raw
    ``ws_tokens(...)`` expression -- the per-position element_at re-runs
    the split per access on an unmaterialized expression, turning the
    shingle stage O(len^2) per doc (measured 9-13 s vs 0.5 s at sf0.1).

    DuckDB twin:
      ``list_distinct([w[i]||' '||...||w[i+n-1]
                       for i in generate_series(1, greatest(len(w)-n+1, 0))])``
    (DuckDB's generate_series(1,0) is empty, no guard needed there).
    """
    parts = lambda i: [F.element_at(tokens, i + off) for off in range(n)]  # noqa: E731
    make = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(" ", *parts(i)),
    )
    return F.array_distinct(
        F.when(F.size(tokens) >= n, make).otherwise(F.array().cast("array<string>"))
    )


def word_shingle_list(tokens: Column, n: int = 3) -> Column:
    """n-word shingles WITH multiplicity (no distinct) -- for operators
    that count gram occurrences (duplicated-n-gram rates) rather than
    set-membership. Same short-input guard and DuckDB twin as
    ``word_shingles``, minus the ``list_distinct``.
    """
    parts = lambda i: [F.element_at(tokens, i + off) for off in range(n)]  # noqa: E731
    make = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(" ", *parts(i)),
    )
    return F.when(F.size(tokens) >= n, make).otherwise(
        F.array().cast("array<string>")
    )


MD5_HASH32_SQL = "('0x' || substr(md5({x}), 1, 8))::BIGINT"


def md5_hash32(col: Column) -> Column:
    """Portable 32-bit hash: first 8 md5 hex digits as an integer.

    DuckDB twin: ``MD5_HASH32_SQL``. One native md5 + substring + base-16
    conv per value -- replaces the per-char polynomial fold (interpreted
    HOF, ~20 lambda evaluations per shingle) in the hot signature paths;
    measured 2x on the minhash pipeline at sf0.1.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_signature(shingles: Column, k: int = 8) -> Column:
    """k-element minhash signature over a shingle array.

    Each shingle is first reduced to an integer with ``md5_hash32``, then
    permuted through k affine hashes; the signature element i is the
    minimum of permutation i. Empty shingle sets map to MINHASH_MOD (an
    impossible hash value) so they never collide with real signatures.
    (a * h stays < 2^63: h < 2^32, a <= 1021.)
    """
    if k > len(MINHASH_PARAMS):
        raise ValueError(
            f"minhash_signature: k={k} exceeds the fixed permutation "
            f"family ({len(MINHASH_PARAMS)}); silent truncation would "
            "corrupt banded layouts"
        )
    hashes = F.transform(shingles, md5_hash32)
    sig = F.array(
        *[
            F.coalesce(
                F.array_min(
                    F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_MOD)
                ),
                F.lit(MINHASH_MOD).cast("long"),
            )
            for a, b in MINHASH_PARAMS[:k]
        ]
    )
    return sig


def minhash_sql_exprs(shingles_expr: str, k: int = 8) -> list[str]:
    """DuckDB SQL expressions mirroring ``minhash_signature`` element-wise.

    ``shingles_expr`` must name a LIST(VARCHAR) column in scope.
    """
    if k > len(MINHASH_PARAMS):
        raise ValueError(
            f"minhash_sql_exprs: k={k} exceeds the fixed permutation "
            f"family ({len(MINHASH_PARAMS)})"
        )
    hash_list = f"[{MD5_HASH32_SQL.format(x='s')} for s in {shingles_expr}]"
    return [
        f"coalesce(list_min([({a} * h + {b}) % {MINHASH_MOD} for h in {hash_list}]), {MINHASH_MOD})"
        for a, b in MINHASH_PARAMS[:k]
    ]


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    non-negative integer columns: bit i of ``a`` lands at position 2i, bit
    i of ``b`` at 2i+1. Rows close in BOTH dimensions get close keys, so
    range-partitioning by the key co-locates 2-D neighborhoods -- the
    multi-column data-layout trick (Delta ZORDER, Hudi space-filling
    curves) that lets one file layout serve range predicates on either or
    both columns.

    Pure shift/mask expression chain (whole-stage codegen); DuckDB twin:
    ``sum of ((a >> i) & 1) << (2*i)  |  ((b >> i) & 1) << (2*i + 1)``.

    NORMALIZE FIRST: interleaving only helps when both columns occupy a
    comparable number of bits. If one column spans 8 bits and the other
    13, every bit above 15 comes from the wide column alone, the layout
    degenerates to single-column order, and the narrow dimension stops
    pruning -- scale/bucket each column into the same bit budget (the
    standard ZORDER normalization rule; pinned by the pruning test).
    """
    out = None
    for i in range(bits):
        pa = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        pb = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = pa + pb
        out = term if out is None else out + term
    return out.cast("long")


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` (exact same arithmetic)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(parts) + ")::BIGINT"


# 2-D Hilbert curve as a 4-state quadrant automaton. States are the
# reachable (swap, invert-x, invert-y) transforms of the classic xy2d
# algorithm; tables DERIVED from it programmatically and FROZEN (an
# exhaustive 8-bit equality test pins them against the reference
# implementation). Indexed by state*4 + quadrant, quadrant = 2*bx + by.
HILBERT_DIGIT = [0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0]
HILBERT_NEXT = [1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2]


def hilbert_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Hilbert-curve index of the low ``bits`` bits of two non-negative
    integer columns -- the space-filling layout key with strictly better
    locality than :func:`zorder_key`: consecutive Hilbert keys are
    ALWAYS adjacent cells (Morton order jumps diagonally at every power-
    of-two boundary), so range-partitioning by it gives tighter 2-D box
    pruning on the same manifest machinery (write_zordered accepts
    either key).

    Mechanics: walk bit-pairs MSB-first through the 4-state quadrant
    automaton above -- the accumulator packs (d, state) as d*4 + state,
    one F.aggregate fold of ``bits`` table lookups (runtime iteration,
    NOT static unrolling: the per-level CASE tree would duplicate the
    state expression 16x per level if unrolled). DuckDB twin:
    :func:`hilbert_key_sql` (same fold via list_reduce). Interpreted-HOF
    cost is bits*O(1) per row -- a layout-write-time key, not a hot
    query-path expression.

    Same normalization rule as zorder_key: scale both columns into the
    same bit budget first or the wide column dominates.
    """
    q_arr = F.array(
        *[
            (
                F.shiftright(a, i).bitwiseAND(F.lit(1)) * 2
                + F.shiftright(b, i).bitwiseAND(F.lit(1))
            ).cast("long")
            for i in range(bits - 1, -1, -1)
        ]
    )
    dig = F.array(*[F.lit(v).cast("long") for v in HILBERT_DIGIT])
    nxt = F.array(*[F.lit(v).cast("long") for v in HILBERT_NEXT])

    def step(acc, q):
        state = acc.bitwiseAND(F.lit(3))
        idx = (state * 4 + q + 1).cast("int")
        return (
            (acc - state) * 4
            + F.element_at(dig, idx) * 4
            + F.element_at(nxt, idx)
        )

    folded = F.aggregate(q_arr, F.lit(0).cast("long"), step)
    return F.shiftright(folded, 2).cast("long")


def hilbert_key_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`hilbert_key` (same tables, same fold)."""
    qs = ", ".join(
        f"((({a} >> {i}) & 1) * 2 + (({b} >> {i}) & 1))::BIGINT"
        for i in range(bits - 1, -1, -1)
    )
    dig = "[" + ", ".join(str(v) for v in HILBERT_DIGIT) + "]"
    nxt = "[" + ", ".join(str(v) for v in HILBERT_NEXT) + "]"
    idx = "((acc & 3) * 4 + q + 1)::INT"
    return (
        f"(list_reduce(list_prepend(0::BIGINT, [{qs}]),"
        f" (acc, q) -> (acc - (acc & 3)) * 4"
        f" + {dig}[{idx}] * 4 + {nxt}[{idx}]) // 4)::BIGINT"
    )
