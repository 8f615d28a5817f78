"""Skew-mitigation joins: explicit salting.

AQE's skew-join handles most runtime skew (enabled in session.py), but
extreme hot keys -- a single join key holding 10% of 100 TB -- need salting:
spread the hot side across S sub-keys and replicate the other side S ways.
Result is identical to the plain join; the shuffle is even.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join with the left side salted and the right side replicated.

    Use when ``left`` is large with skewed ``on`` keys and ``right`` is the
    smaller (but not broadcastable) side. ``spark_partition_id``-free and
    fully deterministic: the salt is a hash of the whole left row's key
    columns plus a per-row split via monotonically spread values.

    Only left-preserving join types are sound: the right side is replicated
    ``salt`` ways, so 'right'/'full' would emit each unmatched right row
    ``salt`` times. Rejected explicitly rather than silently wrong.
    """
    if how.replace("_", "").replace("outer", "") not in (
        "inner", "left", "leftsemi", "semi", "leftanti", "anti",
    ):
        raise ValueError(
            f"salted_join: how={how!r} unsupported -- the replicated right "
            "side would duplicate unmatched right rows; use inner/left/"
            "left_semi/left_anti (or a plain join with AQE skew handling)"
        )
    salt_col = (F.abs(F.hash(*[F.col(c) for c in on], F.monotonically_increasing_id())) % salt)
    lhs = left.withColumn("_salt", salt_col)
    rhs = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = lhs.join(rhs, on=[*on, "_salt"], how=how)
    return out.drop("_salt")
