"""Skew-mitigation operators: salted aggregation and salted joins.

Hot keys are the classic 100 TB failure mode: a groupBy/join shuffles on
its key, so one pathological key (the empty-string user, the null
device, the one viral document) lands an entire cluster's worth of rows
on a single reducer task while 999 executors idle. AQE's skew-join
splitting handles the JOIN read side (enabled in session.py); these
operators give the same protection as an explicit, testable plan shape:

  * ``salted_agg``   two-phase aggregation: partial-aggregate on
                     (keys + salt) -- the hot key's rows spread over
                     ``n_salts`` reducers -- then merge the (tiny)
                     partials on the true keys. The second shuffle
                     carries at most |groups| * n_salts rows regardless
                     of input size.
  * ``salted_join``  replicate-the-small-side join: the big (left) side
                     gets a deterministic per-row salt, the right side
                     is exploded ``salt`` ways, and the equi-join runs
                     on (keys + salt) -- a hot key's probe rows now hash
                     to ``salt`` different partitions.

Both are RESULT-IDENTICAL to their unsalted forms (pinned by DuckDB
oracles / equality tests): salting only changes physical distribution.
Salts are deterministic functions of row content (hash of columns),
never ``rand()`` or ``monotonically_increasing_id()`` -- a salt that
depends on partition layout or task attempt breaks task-retry
correctness (a retried task would re-salt rows differently than the
shuffle files already written) and the engine-wide reproducibility
contract.

The reference repo (pandas + per-row plpgsql CALLs,
`SQL/etl_world_banks.sql:20-122`) has no distribution concept at all;
this module exists purely for the engine's 100 TB brief.

Supported partial-aggregate ops are the self-decomposable ones
(sum / count / min / max); use exact DECIMAL sums for doubles so the
two-phase result is bit-identical to the one-phase result (floating
addition is not associative; decimal addition is).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _partial(op: str, col: Column) -> Column:
    if op == "count":
        return F.count(col)
    if op in ("sum", "min", "max"):
        return getattr(F, op)(col)
    raise ValueError(
        f"unsupported op {op!r}: salted_agg needs self-decomposable "
        "aggregates (sum/count/min/max); avg = sum+count at the call site"
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, Column]],
    salt: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` is a sequence of (out_name, op, column) with op in
    {sum, count, min, max}. ``salt`` is a deterministic row expression
    (e.g. ``F.xxhash64('event_id')``); it is bucketed mod ``n_salts``.

    Plan shape: Exchange(keys+salt) -> HashAggregate -> Exchange(keys)
    -> HashAggregate. The first exchange spreads every key over
    ``n_salts`` reducers; the second moves only the partial rows
    (|groups| * n_salts, independent of input row count). Map-side
    partial aggregation still applies to phase 1, so the extra phase
    costs one exchange of already-tiny data.
    """
    salt_b = F.pmod(salt, F.lit(n_salts)).alias("_salt")
    partials = df.groupBy(*keys, salt_b).agg(
        *[_partial(op, col).alias(name) for name, op, col in aggs]
    )
    return partials.groupBy(*keys).agg(
        *[_MERGE[op](F.col(name)).alias(name) for name, op, _ in aggs]
    )


_LEFT_PRESERVING = {
    "inner",
    "left",
    "left_outer",
    "leftouter",
    "left_semi",
    "leftsemi",
    "semi",
    "left_anti",
    "leftanti",
    "anti",
}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Replicated-build skew-safe equi-join.

    ``left`` is the large skewed probe side: every row gets a
    deterministic salt in [0, salt). ``right`` is replicated ``salt``
    ways (one copy per salt value), so every (key, salt) slot still
    contains the full build rows for the key; join keys become
    ``on + [_salt]`` and a hot key's rows spread across ``salt``
    shuffle partitions instead of one.

    ``salt_expr`` is the per-row salt source -- any deterministic column
    expression (e.g. ``F.xxhash64('event_id')``). Default: xxhash64 over
    ALL left columns, deterministic across retries/reshuffles by
    construction (fully duplicate rows share a salt, which affects only
    distribution, never results).

    Only left-preserving join types are sound: the right side is
    replicated, so 'right'/'full' would emit each unmatched right row
    ``salt`` times. Rejected explicitly rather than silently wrong.
    Build-side cost is |right| * salt rows -- this is the
    big-skewed x mid-size-build shape; if ``right`` fits a broadcast,
    prefer ``F.broadcast`` (a broadcast join has no shuffle to skew).
    """
    if how not in _LEFT_PRESERVING:
        raise ValueError(
            f"salted_join: how={how!r} unsupported -- the replicated right "
            "side would duplicate unmatched right rows; use inner/left/"
            "left_semi/left_anti (or a plain join with AQE skew handling)"
        )
    if salt_expr is None:
        salt_expr = F.xxhash64(*[F.col(c) for c in left.columns])
    lhs = left.withColumn("_salt", F.pmod(salt_expr, F.lit(salt)).cast("int"))
    rhs = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = lhs.join(rhs, on=[*on, "_salt"], how=how)
    return out.drop("_salt")
