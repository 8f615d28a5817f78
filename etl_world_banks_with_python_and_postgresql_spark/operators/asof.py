"""As-of (point-in-time) join -- an operator family Spark lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key. Implemented as the classic
union + last-value-ignoring-nulls window:

    tag(left)=1, tag(right)=0 -> unionByName -> window partitionBy(key)
    orderBy(ts, tag) rows unbounded-preceding..current ->
    last(right_cols, ignorenulls) -> keep left rows

One shuffle on the key, no range explosion, no UDF -- the scalable shape
(a per-group ``pd.merge_asof`` via applyInPandas would serialize whole
groups through Arrow and die on hot keys). Right-side duplicates at the
same (key, ts) are pre-aggregated to keep the result deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    agg: str = "max",
) -> DataFrame:
    """Left as-of join: left columns + latest ``value_cols`` at or before
    ``left.ts`` per ``key`` (NULL when no prior right row exists).

    ``agg`` resolves right-side ties at identical (key, ts).
    """
    clash = set(value_cols) & {c for c in left.columns if c not in (key, ts)}
    if clash:
        raise ValueError(
            f"left already has column(s) {sorted(clash)}; rename before asof_join"
        )
    right_dedup = right.groupBy(key, ts).agg(
        *[getattr(F, agg)(c).alias(c) for c in value_cols]
    )
    # Carry ALL value columns as one struct with last(ignorenulls) over the
    # STRUCT, not per-column: a right row whose value is legitimately NULL
    # must still win as the latest row (per-column last(ignorenulls) would
    # skip it and carry an older non-null value forward -- wrong as-of
    # semantics). The struct itself is non-null for every right row, so
    # ignorenulls only skips the left rows' placeholder.
    struct_t = T.StructType(
        [T.StructField(c, right_dedup.schema[c].dataType) for c in value_cols]
    )
    rhs = right_dedup.select(
        key, ts, F.struct(*value_cols).alias("_vals")
    ).withColumn("_tag", F.lit(0))
    lhs = left.withColumn("_vals", F.lit(None).cast(struct_t)).withColumn(
        "_tag", F.lit(1)
    )
    for c in left.columns:
        if c not in (key, ts) and c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts), F.col("_tag"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = unioned.withColumn("_vals", F.last("_vals", ignorenulls=True).over(w))
    return out.filter(F.col("_tag") == 1).select(
        *left.columns, *[F.col(f"_vals.{c}").alias(c) for c in value_cols]
    )
