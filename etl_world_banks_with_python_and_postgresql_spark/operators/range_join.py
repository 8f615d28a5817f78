"""Range (interval-containment) join -- bucketized, shuffle-friendly.

Spark has no native range join (the naive form is a theta join = broadcast
nested loop or worse). Standard scalable rewrite: quantize the value domain
into fixed-width buckets, explode each interval into the buckets it covers,
equi-join points to intervals on the bucket id, then apply the exact
containment predicate. The equi-join shuffles by bucket -- O(points +
intervals * avg_span/width) rows instead of |points| x |intervals|.

Pick ``bucket_width`` near the median interval span: too small explodes the
interval side, too large degrades to near-cross-join within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= point < hi.

    ``how``: 'inner' or 'left' (point-preserving: points inside no interval
    come back with NULL interval columns). Other types are rejected -- the
    containment predicate is applied after the bucket equi-join, which
    would silently collapse them to inner semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"interval_join: how={how!r} unsupported -- the post-join "
            "containment filter drops unmatched rows; use 'inner' or 'left'"
        )
    p = points
    if how == "left":
        p = p.withColumn("_pid", F.monotonically_increasing_id())
    p = p.withColumn("_b", F.floor(F.col(point_col) / F.lit(bucket_width)))
    # drop empty/inverted intervals FIRST: Spark's sequence(start, stop)
    # counts DOWN when start > stop, which would fabricate buckets
    intervals = intervals.filter(F.col(lo_col) < F.col(hi_col))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)),
                # hi is exclusive: a bucket is covered only if [lo, hi)
                # intersects it; subtract one bucket when hi sits on an edge
                F.floor(F.col(hi_col) / F.lit(bucket_width))
                - F.when(
                    F.col(hi_col) % F.lit(bucket_width) == 0, F.lit(1)
                ).otherwise(F.lit(0)),
            )
        ),
    )
    joined = p.join(i, on="_b", how="inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    if how == "left":
        unmatched = p.join(joined.select("_pid"), on="_pid", how="left_anti")
        joined = joined.unionByName(unmatched, allowMissingColumns=True)
        joined = joined.drop("_pid")
    return joined.drop("_b")
