"""Scalable prefix sums (running totals) without a global ordered window.

A bare ``sum OVER (ORDER BY k)`` moves every row to ONE partition --
the exact anti-pattern `plans.lint` flags. The scale shape is the classic
two-level scan:

  1. bucket rows by fixed ranges of the order key (``k div width``);
  2. per-bucket totals (map-side combined aggregate);
  3. exclusive bucket offsets via a window over the BUCKET axis --
     n/width rows, not n (and recursively bucketable if even that is
     big);
  4. broadcast the offsets back and finish with a WITHIN-bucket ordered
     window (parallel across buckets).

Every step is exact integer arithmetic, so the result is engine-exact
and equal to the naive global-window definition the DuckDB oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket_width: int = 1024,
    out_col: str = "cum",
) -> DataFrame:
    """Inclusive running total of ``value_col`` in ``order_col`` order.

    ``order_col`` must be a nonnegative integer key that totally orders
    the rows (dense or sparse -- only ordering matters). Equal to
    ``sum(value) OVER (ORDER BY order_col ROWS UNBOUNDED PRECEDING)``
    but with the global window replaced by the two-level scan above: the
    only unpartitioned window runs over the bucket axis (n/bucket_width
    rows), and the per-row window partitions by bucket.
    """
    b = (F.col(order_col) - F.col(order_col) % bucket_width) / bucket_width
    rows = df.withColumn("_b", b.cast("long"))
    totals = rows.groupBy("_b").agg(
        F.sum(F.col(value_col)).alias("_bt")
    )
    # exclusive prefix over the bucket axis: bounded (n/width rows),
    # recursively bucketable if ever needed
    off_w = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_bt").over(off_w), F.lit(0)).alias("_off")
    )
    in_w = (
        W.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn(
            out_col, (F.col("_off") + F.sum(value_col).over(in_w)).cast("long")
        )
        .drop("_b", "_off")
    )


def token_shards(
    df: DataFrame,
    budget_tokens: int,
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    bucket_width: int = 1024,
) -> DataFrame:
    """Deterministic token-budget shard assignment + per-shard manifest.

    Documents are laid out in ``order_col`` order and cut into shards of
    at most ``budget_tokens`` tokens (a document never splits: shard =
    floor(exclusive_cum / budget), so a shard may overflow by at most one
    document -- the standard pre-tokenization sharding contract). Output:
    one manifest row per shard (n_docs, n_tokens, first/last doc id),
    exact integers throughout.
    """
    cum = bucketed_cumsum(
        df, order_col, token_col, bucket_width=bucket_width, out_col="_cum"
    )
    excl = F.col("_cum") - F.col(token_col)
    shard = ((excl - excl % budget_tokens) / budget_tokens).cast("long")
    return (
        cum.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_col).alias("n_tokens"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
    )
