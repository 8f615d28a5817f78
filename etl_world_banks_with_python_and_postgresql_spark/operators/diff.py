"""Snapshot diff: set-based reconciliation between two versions of a table.

The audit/anti-entropy twin of the SCD merge (operators/merge.py classifies
an incoming BATCH against a target; this classifies two full SNAPSHOTS
against each other): added / removed / changed / unchanged per key. Pairs
naturally with ``IncrementalTable.read_at`` time travel -- "what changed
between version 3 and version 7" is one call.

Scale shape: one full-outer join shuffled on the key columns (both sides
key-partitioned, AQE handles skew), comparison on a struct of the value
columns -- no per-column join explosion, NULL-safe via struct equality
(eqNullSafe), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key in either snapshot.

    ``compare_cols`` defaults to all common non-key columns. Output: the
    key columns + ``diff`` in {'added','removed','changed','unchanged'}.
    'changed' uses NULL-safe struct comparison, so NULL -> value and
    value -> NULL transitions register as changes (a plain ``!=`` would
    silently drop them).
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        F.struct(*compare_cols).alias("_oval"),
    )
    nw = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        F.struct(*compare_cols).alias("_nval"),
    )
    cond = [F.col(f"_ok_{k}") == F.col(f"_nk_{k}") for k in keys]
    diff = (
        F.when(F.col(f"_ok_{keys[0]}").isNull(), F.lit("added"))
        .when(F.col(f"_nk_{keys[0]}").isNull(), F.lit("removed"))
        .when(F.col("_oval").eqNullSafe(F.col("_nval")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(nw, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in keys
        ],
        diff.alias("diff"),
    )


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    id_col: str,
    seq_col: str = "_commit_seq",
    type_col: str = "_change_type",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a change feed to a snapshot: latest-wins per id, deletes
    drop, upserts replace/insert (the downstream half of CDC -- the
    consumer of ``IncrementalTable.read_changes`` / the ``incr_cdf``
    stream materializing a dependent table; Delta's APPLY CHANGES INTO
    shape).

    ``changes`` carries the table's data columns plus ``type_col``
    ('upsert' | 'delete') and a monotonically increasing ``seq_col``;
    within one seq, an id appears at most once (the change-feed
    contract). Resolution: rank each id's changes by seq descending,
    keep the latest, anti-join ALL touched ids out of the target, union
    back only those whose latest action is an upsert -- identical to
    IncrementalTable._resolve's merge-on-read rule, exposed as a pure
    operator over any pair of DataFrames.

    Scale: the window and anti-join shuffle |changes| and probe the
    target once; with ``broadcast_changes`` (default, right for one
    sync's worth of changes) the target is never shuffled. Pass
    ``broadcast_changes=False`` for a large backfill-sized feed so the
    anti-join plans a shuffle join instead of force-broadcasting a
    frame that could OOM the driver (mirrors
    IncrementalTable.broadcast_deltas).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.desc(seq_col))
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = latest.select(id_col)
    if broadcast_changes:
        touched = F.broadcast(touched)
    survivors = target.join(touched, id_col, "left_anti")
    reinserted = (
        latest.filter(F.col(type_col) != "delete")
        .drop(type_col, seq_col)
        .select(*target.columns)
    )
    return survivors.unionByName(reinserted)
