"""Subplan staging: materialize a DataFrame ONCE when the plan fans it
out into several consumers (VERDICT r14 #1).

Spark recomputes a shared subtree for every reference to it -- a plan
that joins three projections of the same derived edge set re-reads the
base parquet and re-runs the derivation three times (z144 measured 80
base scans before staging). ``staged()`` cuts the lineage with an EAGER
``localCheckpoint``: consumers read the materialized blocks instead of
re-deriving.

100 TB story: ``localCheckpoint`` persists to executor block storage
(memory-and-disk), exactly the semantics of ``persist(DISK_ONLY)`` +
checkpoint-style lineage truncation on a real cluster; the blocks are
partitioned like the input, so downstream joins keep their
co-partitioning. The trade is real storage for removed recompute --
worth it precisely when the fan-out is >1 and the subtree contains a
shuffle or a scan, which is the only place this module is applied.
Failure semantics: localCheckpoint blocks are not replicated, so an
executor loss forfeits them and fails the job rather than recomputing
-- the standard batch-job trade (rerun the stage), same one bpe.py and
graph.py's iterative loops already make.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def staged(df: DataFrame, mode: str = "eager") -> DataFrame:
    """Materialize ``df`` once and return a reuse-safe DataFrame.

    Use when the result feeds MULTIPLE downstream consumers (fan-out
    >= 2) and the subtree is non-trivial (contains a scan/shuffle);
    for a single consumer it only adds a write.

    ``mode`` is the call site's measured default (r15 A/B, min-of-3
    fresh-JVM runs per mode at sf0.1):

    - ``eager``: eager ``localCheckpoint``. Full lineage cut + blocks
      on executor storage. Wins when the subtree is re-derived MANY
      times and the re-derivation contains shuffles (z144: 12.5 s off
      -> 10.5 s eager; 80 base scans -> 0). Costs a synchronization
      barrier, and the resulting ``LogicalRDD`` has no size statistics,
      so a downstream join against it loses the broadcast-hash planning
      path until AQE re-optimizes at runtime.
    - ``persist``: lazy MEMORY_AND_DISK cache. No barrier, keeps
      Catalyst statistics (downstream broadcast joins survive), still
      computes the subtree once per action tree. Wins for SMALL
      fan-out results that feed size-sensitive joins (the z191/z192
      ANN run legs: eager 4.2/3.9 s vs persist 2.6/2.8 s -- eager's
      stat loss turned the tiny-side joins into shuffle joins).
    - ``off``: no-op (A/B control; recompute-per-consumer baseline).

    ``SPARK_GRAFT_STAGED_MODE`` overrides every call site globally
    (A/B harness; unset in production).

    LIFETIME of persist-mode blocks (ADVICE r15): the operators return
    LAZY DataFrames, so there is no after-the-action point inside the
    operator where an unpersist could go -- the cache entry lives until
    the session's LRU evicts it (MEMORY_AND_DISK: spilled, not lost) or
    until the caller releases it. Long-lived sessions running many
    staged queries should call :func:`release_staged` between logical
    units (the bench harness's ``reset_block_state`` does exactly this
    between entries); per-entry state is therefore bounded to one
    entry's staged subtrees.
    """
    mode = os.environ.get("SPARK_GRAFT_STAGED_MODE", mode)
    if mode == "off":
        return df
    if mode == "persist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    if mode == "lazy":
        return df.localCheckpoint(eager=False)
    return df.localCheckpoint(eager=True)


def release_staged(spark) -> None:
    """Release every staged block in the session: cached DataFrames
    (persist-mode sites) and localCheckpoint RDD blocks (eager sites).
    The session-level cleanup hook bounding persist-mode staging's
    lifetime (ADVICE r15) -- call between logical units of work in a
    long-lived session. Blocking, so the next unit never races the
    eviction."""
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()  # noqa: SLF001
    it = jsc.getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(True)
