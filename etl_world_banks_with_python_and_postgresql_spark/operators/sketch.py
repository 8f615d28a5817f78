"""Deterministic, engine-portable approximation & profiling operators.

``approx_count_distinct`` / ``percentile_approx`` (q51) are Spark-native
sketches whose exact outputs are implementation-defined -- fine inside
one engine, unverifiable across engines. This module provides the
complementary shape: approximation algorithms whose RESULTS are a pure
function of the data, so the DuckDB oracle reproduces them bit-for-bit
and the driver's hash gate applies to approximate answers too.

- :func:`kmv_sketch` / :func:`kmv_estimate` -- K-Minimum-Values distinct
  sketch (Bar-Yossef et al. 2002): keep the k smallest values of a
  uniform deterministic hash; estimate distinct = (k-1) / h_(k) with
  hashes scaled to [0, 1). Deterministic because the hash is md5-derived
  and "k smallest" has no ties (distinct hash values). MERGEABLE: the
  k-min set of a union is the k-min of the unioned k-min sets, so
  partial sketches from independent scans/partitions/days compose
  without rescanning -- the property that makes sketches useful at
  100 TB (pinned by test).
- :func:`bottomk_sample` / :func:`sample_quantiles` /
  :func:`kmv_quantiles` -- mergeable approximate QUANTILES from the same
  min-wise family: a deterministic bottom-k row sample (k smallest key
  hashes, values riding along verbatim) + nearest-rank selection in pure
  BIGINT arithmetic. Mergeable like KMV (bottomk(A∪B) =
  bottomk(bottomk(A)∪bottomk(B))); position error ~ sqrt(q(1-q)/k),
  measured in-gate by z107 against the exact full-data quantiles.
- :func:`equi_width_histogram` -- fixed-bin histogram in two aggregate
  passes (1-row min/max broadcast + one group count). Division + floor
  only, so bin edges and counts are engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 48-bit md5-prefix hash: uniform enough for KMV, fits a BIGINT in both
# engines. SQL twin mirrors functions.xhash.MD5_HASH32_SQL.
MD5_HASH48_SQL = "('0x' || substr(md5({x}), 1, 12))::BIGINT"
_HASH_SPACE = float(2**48)


def md5_hash48(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_by: str | None = None,
) -> DataFrame:
    """The k smallest distinct 48-bit hashes of ``value_col`` (per group).

    Plan: hash inside the scan projection, one distinct aggregate on
    (group, hash), then a rank window (or TakeOrdered when ungrouped)
    keeps k rows per group -- the sketch is k * 8 bytes however large
    the input. Returns ``(group?, hv)`` rows, the mergeable partial.
    The string cast is a no-op for string columns and makes non-string
    values hash identically to DuckDB's implicit-VARCHAR md5.
    """
    h = md5_hash48(F.col(value_col).cast("string")).alias("hv")
    keys = [group_by] if group_by else []
    hashes = df.select(*keys, h).distinct()
    if not group_by:
        return hashes.orderBy("hv").limit(k)
    from pyspark.sql import Window as W

    w = W.partitionBy(group_by).orderBy("hv")
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(
    sketches: list[DataFrame], k: int = 256, group_by: str | None = None
) -> DataFrame:
    """Compose partial sketches: union, re-distinct, re-take k smallest.
    Equals the sketch of the unioned inputs (pinned by test)."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    u = u.distinct()  # the same value may appear in several partials
    if not group_by:
        return u.orderBy("hv").limit(k)
    from pyspark.sql import Window as W

    w = W.partitionBy(group_by).orderBy("hv")
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(
    sketch: DataFrame, k: int = 256, group_by: str | None = None
) -> DataFrame:
    """Distinct-count estimate from a k-min sketch.

    Saturated sketch (k rows): ``round((k-1) * 2^48 / h_k)`` with h_k
    the largest kept hash -- one IEEE division + one round, identical
    cross-engine. Unsaturated: the sketch IS the distinct set, return
    its exact size.
    """
    keys = [group_by] if group_by else []
    agg = sketch.groupBy(*keys).agg(
        F.count("*").alias("n_kept"), F.max("hv").alias("hk")
    ) if group_by else sketch.agg(
        F.count("*").alias("n_kept"), F.max("hv").alias("hk")
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("long")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("hk"))
        .cast("long")
    )
    return agg.select(*keys, est.alias("est_distinct"))


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_by: str | None = None,
) -> DataFrame:
    """One-shot grouped approximate distinct count; see module doc."""
    return kmv_estimate(
        kmv_sketch(df, value_col, k=k, group_by=group_by),
        k=k,
        group_by=group_by,
    )


def kmv_oracle_sql(
    value_sql: str,
    k: int = 256,
    group_by: str | None = None,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`kmv_distinct`."""
    hv = MD5_HASH48_SQL.format(x=value_sql)
    keys = f"{group_by}, " if group_by else ""
    part = f"PARTITION BY {group_by} " if group_by else ""
    grp = f"GROUP BY {group_by}" if group_by else ""
    return f"""
WITH h AS (SELECT DISTINCT {keys}{hv} AS hv FROM {table}),
r AS (SELECT {keys}hv,
             row_number() OVER ({part}ORDER BY hv) AS rn FROM h),
s AS (SELECT {keys}count(*) AS n_kept, max(hv) AS hk
      FROM r WHERE rn <= {k} {grp})
SELECT {keys}CASE WHEN n_kept < {k} THEN n_kept
            -- explicit DOUBLE casts: bare N.0 literals parse as DECIMAL
            -- in DuckDB and overflow the scaled product for small k;
            -- the double product is exact (both factors are exactly
            -- representable), matching Spark's float*float/long
            ELSE CAST(round(CAST({float(k - 1)!r} AS DOUBLE)
                            * CAST({_HASH_SPACE!r} AS DOUBLE) / hk) AS BIGINT)
       END AS est_distinct
FROM s
"""


def bottomk_sample(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 256,
    group_by: str | None = None,
) -> DataFrame:
    """Deterministic mergeable uniform row sample: the ``k`` rows (per
    group) with the smallest 48-bit md5 hash of the row KEY, carrying
    the value column -- bottom-k sampling (Cohen & Kaplan, PODC'07).

    Because "smallest k hashes" is a pure function of the key set, the
    sample of a union is the bottom-k of the unioned partial samples:
    partials from independent scans/partitions/days compose with no
    rescan (the KMV mergeability argument, pinned by test). Rows are
    ``(group?, hv, v)``; values ride along VERBATIM (no arithmetic), so
    downstream estimates are bit-portable. Contract: ``key_col`` is
    unique per row (duplicate keys collapse via the distinct).

    Plan shape: hash in the scan projection; ungrouped bottom-k is
    orderBy+limit (TakeOrdered -- per-partition partial top-k, no full
    sort); grouped is one rank window keyed on the group.
    """
    # explicit string cast: bigint keys hash identically in both engines
    # (Spark CAST(42 AS STRING) == DuckDB 42::VARCHAR == '42')
    h = md5_hash48(F.col(key_col).cast("string")).alias("hv")
    keys = [group_by] if group_by else []
    rows = df.select(*keys, h, F.col(value_col).alias("v")).distinct()
    if not group_by:
        return rows.orderBy("hv", "v").limit(k)
    from pyspark.sql import Window as W

    w = W.partitionBy(group_by).orderBy("hv", "v")
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_merge(
    samples: list[DataFrame], k: int = 256, group_by: str | None = None
) -> DataFrame:
    """Compose partial bottom-k samples; equals the sample of the
    unioned inputs (pinned by test)."""
    u = samples[0]
    for s in samples[1:]:
        u = u.unionByName(s)
    u = u.distinct()
    if not group_by:
        return u.orderBy("hv", "v").limit(k)
    from pyspark.sql import Window as W

    w = W.partitionBy(group_by).orderBy("hv", "v")
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sample_quantiles(
    sample: DataFrame,
    q_micros: list[int],
    group_by: str | None = None,
) -> DataFrame:
    """Nearest-rank (type-1) quantiles over a :func:`bottomk_sample`:
    for each q (given in micros, e.g. 500000 = median), the sample
    value at rank ``ceil(q * n)`` by value order. All rank arithmetic is
    BIGINT (``(q*n + 999999) div 1000000``) and values are returned
    verbatim -- no IEEE operation anywhere, so estimates are bit-exact
    cross-engine even for double value columns.

    Error: a uniform k-sample puts the rank-q order statistic within
    ~sqrt(q(1-q)/k) of the true quantile position w.h.p. -- the
    standard bottom-k quantile bound; z107 measures it in-gate against
    the exact full-data quantiles.
    """
    from pyspark.sql import Window as W

    keys = [group_by] if group_by else []
    w = (W.partitionBy(group_by) if group_by else W.partitionBy()).orderBy(
        "v", "hv"
    )
    ranked = sample.select(
        *keys,
        F.col("v"),
        F.row_number().over(w).alias("_r"),
        F.count("*").over(
            W.partitionBy(group_by) if group_by else W.partitionBy()
        ).alias("_n"),
    )
    qs = F.explode(
        F.array(*[F.lit(q).cast("long") for q in q_micros])
    ).alias("q_micros")
    return (
        ranked.select(*keys, "v", "_r", "_n", qs)
        .filter(
            F.col("_r")
            == F.expr("(q_micros * _n + 999999) div 1000000")
        )
        .select(*keys, "q_micros", F.col("v").alias("quantile_value"))
    )


def kmv_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    q_micros: list[int],
    k: int = 256,
    group_by: str | None = None,
) -> DataFrame:
    """One-shot mergeable approximate quantiles; see
    :func:`bottomk_sample` / :func:`sample_quantiles`."""
    return sample_quantiles(
        bottomk_sample(df, key_col, value_col, k=k, group_by=group_by),
        q_micros,
        group_by=group_by,
    )


def equi_width_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 20,
    group_by: str | None = None,
) -> DataFrame:
    """Equi-width histogram: global [min, max] split into ``n_bins``.

    Two aggregates: a 1-row min/max broadcast-crossed back (never a
    per-group rescan), then one count per (group?, bin). The max value
    lands in the LAST bin (least() clamp), empty bins are absent (join
    a generated bin spine if density matters). Bin arithmetic is
    floor((x - min) / width) -- engine-exact.
    """
    v = F.col(value_col)
    bounds = df.agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    keys = [group_by] if group_by else []
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    bin_ = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("_lo")) / width).cast("int"),
            F.lit(n_bins - 1),
        )
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(
            *keys,
            bin_.alias("bin"),
            (F.col("_lo") + bin_ * width).alias("bin_lo"),
            (F.col("_lo") + (bin_ + 1) * width).alias("bin_hi"),
        )
        .groupBy(*keys, "bin", "bin_lo", "bin_hi")
        .agg(F.count("*").alias("n_rows"))
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equi-depth (quantile) histogram: bins hold ~equal row counts.

    The scale-correct formulation: cut points are EXACT interpolated
    percentiles (one 1-row aggregate, broadcast back -- deterministic
    cross-engine, q53 parity), and each row's bin is the count of cut
    points strictly below its value -- a row-local comparison sum, NOT a
    global ntile window (which would funnel the table through one
    partition). Rows equal to a cut point land in the lower bin;
    heavily-tied distributions therefore yield unequal depths -- that is
    the data's shape, not an artifact.
    """
    v = F.col(value_col)
    cuts = df.agg(
        *[
            F.percentile(value_col, F.lit(i / n_bins)).alias(f"_c{i}")
            for i in range(1, n_bins)
        ]
    )
    bin_ = sum(
        (v > F.col(f"_c{i}")).cast("int") for i in range(1, n_bins)
    )
    return (
        df.crossJoin(F.broadcast(cuts))
        .select(bin_.alias("bin"), v.alias("_v"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_v").alias("bin_min"),
            F.max("_v").alias("bin_max"),
        )
    )


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_by: str,
) -> DataFrame:
    """Weighted median per group: the smallest value whose cumulative
    weight reaches half the group's total weight (lower weighted
    median -- deterministic, no interpolation ambiguity).

    Plan: pre-aggregate weights per DISTINCT (group, value) first, so
    the ordered cumulative window runs over distinct values per group,
    not raw rows -- the same bounded-window trick as the KS CDF. Weights
    sum as exact longs (cast), the half-total comparison is integer,
    and the pick is min() over qualifying values: engine-exact
    throughout.
    """
    from pyspark.sql import Window as W

    per_value = (
        df.groupBy(group_by, value_col)
        .agg(F.sum(F.col(weight_col).cast("long")).alias("_w"))
    )
    w = W.partitionBy(group_by).orderBy(value_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    tot = W.partitionBy(group_by)
    cum = per_value.select(
        group_by,
        F.col(value_col),
        F.sum("_w").over(w).alias("_cw"),
        F.sum("_w").over(tot).alias("_tw"),
    )
    return (
        cum.filter(F.col("_cw") * 2 >= F.col("_tw"))
        .groupBy(group_by)
        .agg(F.min(value_col).alias("weighted_median"))
    )


def kmv_source_overlap(
    df: DataFrame,
    value_col: str,
    source_col: str = "source",
    k: int = 256,
) -> DataFrame:
    """Pairwise DISTINCT-value overlap between sources from KMV sketches
    (Beyer et al., SIGMOD'07: synopses under multiset operations).

    For every source pair (a < b): build the pair's UNION sketch (the k
    smallest hashes of sketch_a union sketch_b), count how many of its
    members appear in both sides (``n_common``), and derive

      * ``est_union``      ~ |A u B|  =  (k-1) * 2^48 DIV h_k
      * ``est_intersect``  ~ |A n B|  =  n_common * q DIV h_k,
        q = (k-1) * 2^48 DIV k   (the n_common/k Jaccard share of the
        union estimate)
      * ``jaccard_micros``          =  n_common * 1e6 DIV k

    all in PURE INT64 arithmetic -- deliberately floor-divided rather
    than the float round of :func:`kmv_estimate` so the result is
    bit-identical on any engine with 64-bit integers (no IEEE division
    anywhere). Unsaturated union sketches (n_kept < k) hold the entire
    distinct hash set, so the counts are exact and are returned as-is.

    Plan shape at scale: ONE distinct-aggregate shuffle over
    (source, hash48) -- the same heavy pass :func:`kmv_sketch` already
    pays -- then everything downstream is sketch-sized: k rows per
    source, |sources|^2 broadcast pairs, one window per pair. 100 TB of
    documents reduce to k * |sources| longs before any pairwise work.
    """
    q = ((k - 1) * (2**48)) // k
    c_union = (k - 1) * (2**48)
    sk = kmv_sketch(df, value_col, k=k, group_by=source_col)
    srcs = df.select(F.col(source_col).alias("_s")).distinct()
    pairs = (
        srcs.select(F.col("_s").alias("source_a"))
        .crossJoin(srcs.select(F.col("_s").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    # pair membership EXPLODED to an equi-join key: an OR-of-equalities
    # join condition compiles to a broadcast nested-loop (every sketch
    # row scans all |sources|^2 pairs); (pair, member) rows keep it a
    # broadcast HASH join at 2 rows per pair
    memb = pairs.select(
        "source_a",
        "source_b",
        F.explode(F.array("source_a", "source_b")).alias("_member"),
    )
    e = (
        F.broadcast(memb)
        .join(sk, F.col("_member") == F.col(source_col))
        .groupBy("source_a", "source_b", "hv")
        .agg(
            F.max(
                F.when(F.col(source_col) == F.col("source_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col(source_col) == F.col("source_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("source_a", "source_b").orderBy("hv")
    s = (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("hv").alias("hk"),
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_common"),
        )
    )
    unsat = F.col("n_kept") < k
    return s.select(
        "source_a",
        "source_b",
        "n_kept",
        "n_common",
        F.when(unsat, F.col("n_kept"))
        .otherwise(F.expr(f"{c_union} DIV hk"))
        .cast("long")
        .alias("est_union"),
        F.when(unsat, F.col("n_common"))
        .otherwise(F.expr(f"(n_common * {q}) DIV hk"))
        .cast("long")
        .alias("est_intersect"),
        F.when(
            unsat, F.expr("(n_common * 1000000) DIV n_kept")
        )
        .otherwise(F.expr(f"(n_common * 1000000) DIV {k}"))
        .cast("long")
        .alias("jaccard_micros"),
    )


def kmv_source_overlap_oracle_sql(
    value_sql: str,
    source_col: str = "source",
    k: int = 256,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`kmv_source_overlap` (integer-exact)."""
    hv = MD5_HASH48_SQL.format(x=value_sql)
    q = ((k - 1) * (2**48)) // k
    c_union = (k - 1) * (2**48)
    return f"""
WITH h AS (SELECT DISTINCT {source_col} AS src, {hv} AS hv FROM {table}),
r AS (SELECT src, hv,
             row_number() OVER (PARTITION BY src ORDER BY hv) AS rn FROM h),
sk AS (SELECT src, hv FROM r WHERE rn <= {k}),
srcs AS (SELECT DISTINCT {source_col} AS src FROM {table}),
p AS (SELECT a.src AS source_a, b.src AS source_b
      FROM srcs a JOIN srcs b ON a.src < b.src),
e AS (SELECT p.source_a, p.source_b, sk.hv,
             max(CASE WHEN sk.src = p.source_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN sk.src = p.source_b THEN 1 ELSE 0 END) AS in_b
      FROM p JOIN sk ON sk.src IN (p.source_a, p.source_b)
      GROUP BY 1, 2, 3),
u AS (SELECT *, row_number() OVER
        (PARTITION BY source_a, source_b ORDER BY hv) AS rn FROM e),
s AS (SELECT source_a, source_b,
             count(*)::BIGINT AS n_kept, max(hv) AS hk,
             sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)::BIGINT
               AS n_common
      FROM u WHERE rn <= {k} GROUP BY 1, 2)
SELECT source_a, source_b, n_kept, n_common,
       (CASE WHEN n_kept < {k} THEN n_kept
             ELSE {c_union} // hk END)::BIGINT AS est_union,
       (CASE WHEN n_kept < {k} THEN n_common
             ELSE (n_common * {q}) // hk END)::BIGINT AS est_intersect,
       (CASE WHEN n_kept < {k} THEN (n_common * 1000000) // n_kept
             ELSE (n_common * 1000000) // {k} END)::BIGINT AS jaccard_micros
FROM s
"""


# ---------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) -- the register-based distinct
# sketch that completes the family next to KMV: fixed m-register state
# per group (m * 1 byte at rest vs KMV's k * 8), mergeable by
# elementwise MAX, and -- like everything in this module -- built on
# the 48-bit md5 hash so both engines replicate it bit-for-bit.
# ---------------------------------------------------------------------

_HLL_HASH_BITS = 48


def _hll_alpha_ppm(m: int) -> int:
    """Flajolet's bias constant alpha_m in exact parts-per-million --
    ONE shared integer literal drives both engines (no float constant
    folding differences can exist)."""
    if m >= 128:
        a = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        a = 0.709
    elif m == 32:
        a = 0.697
    elif m == 16:
        a = 0.673
    else:
        raise ValueError(f"hll: unsupported register count m={m}")
    return int(round(a * 1_000_000))


def hll_registers(
    df: DataFrame,
    value_col: str,
    p: int = 6,
    group_by: str | None = None,
) -> DataFrame:
    """HLL register table: ``(group?, register, max_rho)``.

    register = low ``p`` bits of the 48-bit hash; rho = 1 + count of
    leading zeros in the remaining ``48 - p`` bits, computed EXACTLY in
    integer/string ops (``(48 - p) + 1 - length(bin(rem))``; bin() has
    no leading zeros in either engine) -- no log2 transcendental, so the
    registers are bit-identical cross-engine. Duplicates need no
    pre-distinct (MAX absorbs them): the whole sketch is one scan with a
    map-side-combined (group, register) aggregate whose shuffle payload
    is O(m x partitions) however large the corpus. Registers merge
    across partials by elementwise MAX (:func:`hll_merge`).
    """
    m = 1 << p
    h = md5_hash48(F.col(value_col).cast("string"))
    rem = F.shiftright(h, p)
    rho = (
        F.when(rem == 0, F.lit(_HLL_HASH_BITS - p + 1))
        .otherwise(
            F.lit(_HLL_HASH_BITS - p + 1) - F.length(F.bin(rem))
        )
        .cast("int")
    )
    keys = [group_by] if group_by else []
    return (
        df.select(*keys, (h % m).cast("int").alias("register"), rho.alias("_r"))
        .groupBy(*keys, "register")
        .agg(F.max("_r").alias("max_rho"))
    )


def hll_merge(sketches: list[DataFrame], group_by: str | None = None) -> DataFrame:
    """Compose partial register tables: union + elementwise MAX. Equals
    the sketch of the unioned inputs (MAX is associative/commutative/
    idempotent -- the property that makes HLL a one-pass distributed
    sketch)."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    keys = [group_by] if group_by else []
    return u.groupBy(*keys, "register").agg(
        F.max("max_rho").alias("max_rho")
    )


def _hll_lc_table_micros(m: int) -> list[int]:
    """Linear-counting lookup ``round(ln(m / V) * 1e6)`` for V = 1..m,
    PRECOMPUTED once in Python and baked as the same integer literals
    into both engines (the z126/z127 shared-table discipline) -- the
    correction needs ln(), but never at query time."""
    import math

    return [round(math.log(m / v) * 1_000_000) for v in range(1, m + 1)]


def hll_estimate(
    registers: DataFrame,
    p: int = 6,
    group_by: str | None = None,
) -> DataFrame:
    """HLL estimate from a register table, in EXACT integer arithmetic
    end to end (Flajolet et al. 2007, incl. the small-range correction).

    Raw estimator: the harmonic-mean denominator sum(2^-M_j) is lifted
    to the common denominator 2^(48-p+1): each register contributes the
    integer 2^(48-p+1-M_j), absent registers contribute 2^(48-p+1)
    (M=0), so S <= m * 2^43 fits BIGINT comfortably at p=6. The
    estimate alpha_m * m^2 / sum(2^-M) becomes ONE exact DECIMAL(38,0)
    floor division (alpha_ppm * m^2 * 2^(48-p+1)) div (S * 10^6).

    Small-range correction (the regime where the raw estimator biases
    high): when raw <= 5m/2 and V = zero-register count > 0, linear
    counting ``round(m * ln(m / V))`` applies -- with ln(m/V) drawn from
    a PRECOMPUTED integer-micros table shared verbatim by both engines,
    so no libm call ever executes at query time and the corrected
    estimate stays bit-identical cross-engine. ``n_zero_registers``
    stays in the output so the active regime is visible.
    """
    from ..functions.exactnum import floordiv_nonneg

    m = 1 << p
    rmax = _HLL_HASH_BITS - p + 1
    alpha_ppm = _hll_alpha_ppm(m)
    lc = _hll_lc_table_micros(m)
    keys = [group_by] if group_by else []
    agg = registers.groupBy(*keys) if group_by else registers.groupBy()
    folded = agg.agg(
        # SQL-form shiftleft: the Python API requires a literal int
        # shift amount, the SQL expression accepts the column
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - max_rho)"))
        .alias("_s_present"),
        F.count("*").alias("_n_present"),
    )
    s_total = F.col("_s_present") + (
        (F.lit(m) - F.col("_n_present"))
        * F.lit(1 << rmax).cast("long")
    )
    raw = floordiv_nonneg(
        F.lit(alpha_ppm * m * m).cast("decimal(38,0)")
        * F.lit(1 << rmax).cast("decimal(38,0)"),
        s_total.cast("decimal(38,0)") * F.lit(1_000_000).cast("decimal(38,0)"),
    )
    v = (F.lit(m) - F.col("_n_present")).cast("int")
    lc_arr = F.array(*[F.lit(x).cast("long") for x in lc])
    lc_est = floordiv_nonneg(
        F.lit(m) * F.element_at(lc_arr, v) + F.lit(500_000),
        F.lit(1_000_000),
    )
    est = F.when((raw <= F.lit(5 * m // 2)) & (v > 0), lc_est).otherwise(raw)
    return folded.select(
        *keys,
        est.alias("est_distinct"),
        v.alias("n_zero_registers"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    p: int = 6,
    group_by: str | None = None,
) -> DataFrame:
    """:func:`hll_registers` + :func:`hll_estimate` fused, WITH the
    in-gate accuracy eval (the z39/z107 discipline): the exact distinct
    count rides along with the estimate plus an exact-integer
    per-mille error, so the sketch's quality is part of the gated
    answer, not a claim."""
    from ..functions.exactnum import floordiv_nonneg

    keys = [group_by] if group_by else []
    est = hll_estimate(
        hll_registers(df, value_col, p=p, group_by=group_by),
        p=p,
        group_by=group_by,
    )
    exact_agg = (
        df.groupBy(*keys) if group_by else df.groupBy()
    ).agg(F.countDistinct(F.col(value_col)).alias("exact_distinct"))
    j = est.join(exact_agg, keys) if group_by else est.crossJoin(
        F.broadcast(exact_agg)
    )
    err = floordiv_nonneg(
        F.abs(F.col("est_distinct") - F.col("exact_distinct"))
        * F.lit(1000),
        F.greatest(F.col("exact_distinct"), F.lit(1)),
    )
    return j.select(
        *keys,
        "est_distinct",
        "exact_distinct",
        "n_zero_registers",
        err.alias("err_permille"),
    )


def hll_oracle_sql(
    value_sql: str,
    p: int = 6,
    group_by: str = "source",
    table: str = "documents",
    include_eval: bool = True,
) -> str:
    """DuckDB twin of :func:`hll_distinct` -- same hash, same register/
    rho integer algebra, same HUGEINT-exact floor division.
    ``include_eval=False`` emits only (group, est_distinct,
    n_zero_registers): the :func:`hll_estimate` shape, the oracle for
    HllAggView's maintained read()."""
    m = 1 << p
    rmax = _HLL_HASH_BITS - p + 1
    alpha_ppm = _hll_alpha_ppm(m)
    num = alpha_ppm * m * m * (1 << rmax)
    lc_tbl = "[" + ", ".join(str(x) for x in _hll_lc_table_micros(m)) + "]"
    hv = (
        f"('0x' || substr(md5(({value_sql})::VARCHAR), 1, 12))::BIGINT"
    )
    if include_eval:
        final = f"""SELECT grp AS {group_by}, est_distinct, exact_distinct, n_zero_registers,
       (abs(est_distinct - exact_distinct) * 1000
        // greatest(exact_distinct, 1))::BIGINT AS err_permille
FROM corr"""
    else:
        final = (
            f"SELECT grp AS {group_by}, est_distinct, n_zero_registers "
            "FROM corr"
        )
    return f"""
WITH h AS (
  SELECT {group_by} AS grp, {hv} AS hv FROM {table}),
regs AS (
  SELECT grp, (hv % {m})::INT AS register,
         max(CASE WHEN (hv // {m}) = 0 THEN {rmax}
                  ELSE {rmax} - length(bin(hv // {m})) END) AS max_rho
  FROM h GROUP BY 1, 2),
folded AS (
  SELECT grp,
         sum((1::BIGINT << ({rmax} - max_rho))::BIGINT)::BIGINT AS s_present,
         count(*)::BIGINT AS n_present
  FROM regs GROUP BY 1),
exact AS (
  SELECT {group_by} AS grp, count(DISTINCT {value_sql})::BIGINT
           AS exact_distinct
  FROM {table} GROUP BY 1),
est AS (
  SELECT f.grp,
         ({num}::HUGEINT
          // ((s_present + ({m} - n_present) * {1 << rmax}::BIGINT)::HUGEINT
              * 1000000))::BIGINT AS raw_est,
         ({m} - n_present)::INT AS n_zero_registers,
         e.exact_distinct
  FROM folded f JOIN exact e USING (grp)),
corr AS (
  SELECT grp, exact_distinct, n_zero_registers,
         CASE WHEN raw_est <= {5 * m // 2} AND n_zero_registers > 0
              THEN ({m}::BIGINT * {lc_tbl}[n_zero_registers] + 500000)
                   // 1000000
              ELSE raw_est END AS est_distinct
  FROM est)
{final}
"""


def heavy_hitters_twopass(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    capacity: int = 256,
) -> DataFrame:
    """EXACT phi-heavy hitters without a full-cardinality shuffle:
    pass 1 runs a Misra-Gries summary per partition (Arrow-batched
    ``mapInPandas``, at most ``2*capacity`` counters held per
    partition even transiently -- the merge loop prunes mid-batch),
    pass 2 exact-counts ONLY the surviving candidate keys (broadcast
    semi-reduced join), keeps the keys whose exact count PROVABLY
    clears the support bound N/(capacity+1), and returns the top k of
    those by (count DESC, key ASC).

    Why this is THE 100 TB shape for "top tokens/domains/users": a
    plain groupBy (z61's plan) shuffles one combiner slot per DISTINCT
    key -- billions on a web-scale token column -- while this plan
    shuffles at most partitions x capacity summary rows plus the exact
    counts of <= partitions x capacity candidates. The output is still
    EXACT, not approximate: summed per-partition MG summaries
    undercount any key by at most N/(capacity+1) (Agarwal et al.,
    "Mergeability of summaries", PODS '12), so every key above that
    bound is CERTAIN to survive pass 1, and pass 2 replaces
    undercounts with exact counts. Keys at or below the bound may or
    may not surface depending on partitioning, so they are filtered
    OUT by their exact counts -- which makes the result a pure
    function of the data (the standard phi-heavy-hitter contract with
    phi = 1/(capacity+1); need deeper tail? raise ``capacity``, the
    summary cost scales linearly). Determinism pinned by the
    1-vs-4-partition test.

    Output: (key, n) -- at most k rows, exact counts, every row
    provably above the support bound.

    NULL keys are a first-class key (ADVICE r14): the MG pass counts
    them under one normalized sentinel (pandas surfaces missing keys
    as None/NaN/NaT objects that would otherwise split into separate
    dict entries and dodge the survival bound), and the pass-2 recount
    joins null-safely (``eqNullSafe``), so a NULL-heavy column returns
    NULL with its exact count -- matching the oracle's GROUP BY, which
    has always treated NULL as a group.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if k < 1 or capacity < k:
        raise ValueError("need capacity >= k >= 1")

    key_field = df.schema[key_col]
    summary_schema = T.StructType(
        [
            T.StructField("key", key_field.dataType, True),
            T.StructField("mg_weight", T.LongType(), False),
        ]
    )

    _NULL = object()  # one dict slot for NULL across batches

    def mg_partition(batches):
        counters: dict = {}

        def prune():
            # Metwally-style MG merge: subtract the (capacity+1)-th
            # largest weight from everything and keep the positives
            # (<= capacity survive). Each prune destroys >=
            # (capacity+1)*cut total weight, so the summed cuts -- the
            # max undercount of any key -- stay <= N/(capacity+1).
            ordered = sorted(counters.values(), reverse=True)
            cut = ordered[capacity]
            return {
                key: w - cut for key, w in counters.items() if w - cut > 0
            }

        for pdf in batches:
            vc = pdf[key_col].value_counts(dropna=False)
            for key, c in vc.items():
                # normalize every missing-value flavor (None, NaN, NaT)
                # to ONE sentinel: distinct NaN objects across batches
                # are not equal, so without this a NULL-heavy key's MG
                # weight splits across dict entries and can be pruned
                # below the survival bound
                if key is None or (
                    not isinstance(key, (str, bytes)) and pd.isna(key)
                ):
                    key = _NULL
                if key in counters:
                    counters[key] += int(c)
                else:
                    counters[key] = int(c)
                    # transient-memory bound (ADVICE r14): prune INSIDE
                    # the merge loop at 2*capacity, so the dict never
                    # exceeds 2*capacity entries even on a
                    # high-cardinality batch; amortized O(log cap) per
                    # insertion, same N/(capacity+1) guarantee
                    if len(counters) > 2 * capacity:
                        counters = prune()
            if len(counters) > capacity:
                counters = prune()
        yield pd.DataFrame(
            {
                "key": [
                    None if key is _NULL else key
                    for key in counters.keys()
                ],
                "mg_weight": list(counters.values()),
            }
        )

    candidates = (
        df.select(key_col)
        .mapInPandas(mg_partition, schema=summary_schema)
        .groupBy("key")
        .agg(F.sum("mg_weight").alias("_w"))
        .select(F.col("key").alias("_cand_key"))
    )
    exact = (
        df.select(F.col(key_col).alias("key"))
        # null-safe recount join: NULL is a legitimate heavy hitter and
        # the oracle's GROUP BY counts it; a plain equi-join would
        # silently drop it here (ADVICE r14, medium)
        .join(
            F.broadcast(candidates),
            F.col("key").eqNullSafe(F.col("_cand_key")),
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = df.select(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("_n_total")
    )
    return (
        exact.crossJoin(F.broadcast(total))
        # the certainty filter: exact count strictly above the MG bound
        .filter(F.col("n") * (capacity + 1) > F.col("_n_total"))
        # asc_nulls_last pins the tie-break to DuckDB's default NULL
        # order; Spark's plain asc is NULLS FIRST, which would diverge
        # at the LIMIT boundary when NULL ties a non-null key
        .orderBy(F.desc("n"), F.col("key").asc_nulls_last())
        .limit(k)
        .select("key", "n")
    )


def heavy_hitters_oracle_sql(
    rows_sql: str, key_sql: str = "key", k: int = 20, capacity: int = 256
) -> str:
    """DuckDB twin of :func:`heavy_hitters_twopass`: exact counts with
    the same support-bound filter and (count DESC, key ASC) top-k --
    the oracle needs no Misra-Gries because the engine's output
    contract is exact phi-heavy hitters, a pure function of the
    data."""
    return f"""
WITH t AS (SELECT ({key_sql}) AS key FROM ({rows_sql}) raw0),
c AS (SELECT key, count(*)::BIGINT AS n FROM t GROUP BY key),
tot AS (SELECT sum(n)::BIGINT AS n_total FROM c)
SELECT key, n
FROM c CROSS JOIN tot
WHERE n * {capacity + 1} > n_total
ORDER BY n DESC, key ASC NULLS LAST
LIMIT {k}
"""


def subsample_median_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 32,
    lo_rank: int | None = None,
    hi_rank: int | None = None,
) -> DataFrame:
    """Sampling error bar on the corpus median via DETERMINISTIC
    half-subsampling (Politis-Romano subsampling, the resampling
    family member that stays an exact pure function of the data): a
    corpus statistic quoted without an error bar invites "did the
    median move or did we just sample differently" arguments at every
    snapshot diff; this answers with a CI from ``n_replicates``
    md5-keyed half-samples.

    Each replicate b keeps the rows whose md5_hash48(id || ':' || b)
    is even -- deterministic, engine-portable (the house md5-prefix
    rule), independent-ish across replicates. A multinomial bootstrap
    would need per-row replicate weights whose exactness is
    engine-hostile; half-subsampling gives the same "how wobbly is
    this statistic" answer deterministically (CI ~sqrt(2) wider than
    the n-bootstrap; an honest, documented bar).

    Exactness AND scale come from the same choice: every median is the
    z175 HISTOGRAM median (lower weighted median over the integer
    value domain -- ``value_col`` is cast to BIGINT), so the only
    corpus-sized work is one x``n_replicates`` projected expansion
    feeding a map-side-combined (replicate, value) histogram; every
    window after that runs on the histogram axis (|values| rows, the
    z176 bounded-axis rule) and the final selection on the
    ``n_replicates``-row median table. No corpus sort, no float
    anywhere.

    Output one row: (n, n_replicates, median, ci_lo, ci_hi, rep_min,
    rep_max) -- all exact BIGINTs. Default CI ranks for B=32: the 4th
    and 29th replicate-median order statistics (~80% central
    coverage).
    """
    from pyspark.sql import Window as W

    if n_replicates < 4:
        raise ValueError("need n_replicates >= 4")
    lo_rank = lo_rank or max(1, round(0.1 * n_replicates))
    hi_rank = hi_rank or (n_replicates + 1 - lo_rank)

    base = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("long").alias("_v"),
    )

    def hist_median(hist, part_cols):
        pw = W.partitionBy(*part_cols)
        cum = pw.orderBy("_v").rowsBetween(W.unboundedPreceding, 0)
        c = hist.select(
            *part_cols,
            "_v",
            F.sum("_w").over(cum).alias("_cum"),
            F.sum("_w").over(pw).alias("_tot"),
        )
        return (
            c.filter(F.lit(2) * F.col("_cum") >= F.col("_tot"))
            .groupBy(*part_cols, "_tot")
            .agg(F.min("_v").alias("_med"))
        )

    reps = base.select(
        "_id",
        "_v",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias(
            "_b"
        ),
    ).filter(
        md5_hash48(F.concat(F.col("_id"), F.lit(":"), F.col("_b"))) % 2
        == 0
    )
    rep_hist = reps.groupBy("_b", "_v").agg(
        F.count(F.lit(1)).alias("_w")
    )
    rep_medians = hist_median(rep_hist, ["_b"])
    w_rep = W.partitionBy().orderBy(F.asc("_med"), F.asc("_b"))
    rep_stats = (
        rep_medians.withColumn("_rr", F.row_number().over(w_rep))
        .groupBy()
        .agg(
            F.max(
                F.when(F.col("_rr") == lo_rank, F.col("_med"))
            ).alias("ci_lo"),
            F.max(
                F.when(F.col("_rr") == hi_rank, F.col("_med"))
            ).alias("ci_hi"),
            F.min("_med").alias("rep_min"),
            F.max("_med").alias("rep_max"),
        )
    )
    full_hist = base.groupBy("_v").agg(
        F.count(F.lit(1)).alias("_w")
    ).withColumn("_g", F.lit(1))
    full = hist_median(full_hist, ["_g"]).select(
        F.col("_tot").cast("long").alias("n"),
        F.col("_med").cast("long").alias("median"),
    )
    return full.crossJoin(F.broadcast(rep_stats)).select(
        "n",
        F.lit(n_replicates).cast("long").alias("n_replicates"),
        "median",
        F.col("ci_lo").cast("long").alias("ci_lo"),
        F.col("ci_hi").cast("long").alias("ci_hi"),
        F.col("rep_min").cast("long").alias("rep_min"),
        F.col("rep_max").cast("long").alias("rep_max"),
    )


def subsample_median_ci_oracle_sql(
    rows_sql: str,
    value_sql: str = "v",
    id_sql: str = "id",
    n_replicates: int = 32,
    lo_rank: int | None = None,
    hi_rank: int | None = None,
) -> str:
    """DuckDB twin of :func:`subsample_median_ci` (same md5-prefix
    replicate hash, same histogram lower-median selections)."""
    lo_rank = lo_rank or max(1, round(0.1 * n_replicates))
    hi_rank = hi_rank or (n_replicates + 1 - lo_rank)
    h = MD5_HASH48_SQL.format(x="(_id || ':' || _b)")
    return f"""
WITH base AS (SELECT ({id_sql})::VARCHAR AS _id, ({value_sql})::BIGINT AS _v
              FROM ({rows_sql}) raw0),
reps AS (
  SELECT _id, _v, _b
  FROM base, unnest(generate_series(0, {n_replicates - 1})) t(_b)
  WHERE {h} % 2 = 0),
rep_hist AS (SELECT _b, _v, count(*)::BIGINT AS _w
             FROM reps GROUP BY _b, _v),
rep_cum AS (
  SELECT _b, _v,
         sum(_w) OVER (PARTITION BY _b ORDER BY _v
                       ROWS UNBOUNDED PRECEDING) AS _cum,
         sum(_w) OVER (PARTITION BY _b) AS _tot
  FROM rep_hist),
rep_medians AS (
  SELECT _b, min(_v) AS _med
  FROM rep_cum WHERE 2 * _cum >= _tot GROUP BY _b),
rep_ranked AS (
  SELECT *, row_number() OVER (ORDER BY _med, _b) AS _rr
  FROM rep_medians),
rep_stats AS (
  SELECT max(CASE WHEN _rr = {lo_rank} THEN _med END) AS ci_lo,
         max(CASE WHEN _rr = {hi_rank} THEN _med END) AS ci_hi,
         min(_med) AS rep_min, max(_med) AS rep_max
  FROM rep_ranked),
full_hist AS (SELECT _v, count(*)::BIGINT AS _w FROM base GROUP BY _v),
full_cum AS (
  SELECT _v,
         sum(_w) OVER (ORDER BY _v ROWS UNBOUNDED PRECEDING) AS _cum,
         sum(_w) OVER () AS _tot
  FROM full_hist),
full_median AS (
  SELECT max(_tot)::BIGINT AS n, min(_v)::BIGINT AS median
  FROM full_cum WHERE 2 * _cum >= _tot)
SELECT n, {n_replicates}::BIGINT AS n_replicates, median,
       ci_lo::BIGINT AS ci_lo, ci_hi::BIGINT AS ci_hi,
       rep_min::BIGINT AS rep_min, rep_max::BIGINT AS rep_max
FROM full_median CROSS JOIN rep_stats
"""
