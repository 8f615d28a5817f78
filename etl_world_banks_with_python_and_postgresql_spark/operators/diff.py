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
