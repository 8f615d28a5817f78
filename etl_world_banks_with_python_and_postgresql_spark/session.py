"""SparkSession factory.

Tuned for local[N] testing but with cluster-honest settings: AQE on
(runtime coalescing + skew-join handling), shuffle partitions sized to
cores (overridable for real clusters), UTC session timezone so results
compare bit-for-bit against the DuckDB oracle, Arrow enabled for every
pandas interchange path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_world_banks_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32 per the
    driver contract). On a real cluster, pass ``master=None`` with
    ``spark.master`` preconfigured and a larger ``shuffle_partitions``
    (rule of thumb: 2-3x total executor cores, or leave AQE to coalesce).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # TESTDATA events.ts is TIMESTAMP(NANOS); Spark has no nanos type, so
        # read as long and convert in sources.catalog.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # local mode: the driver IS the executor. 8g measured faster AND
        # more stable than 24g (bench suite A/B: 44s vs 117-134s with
        # multi-10s GC spikes rotating across the UDF-heavy queries) --
        # a bigger heap just defers collection into huge full-GC pauses.
        # 16g default (r16): under ParallelGC the 140-entry bench suite
        # ages the 8g heap -- entries late in the suite ran up to 2.6x
        # their fresh-JVM minima from full-GC churn (z144 in-suite 18.2 s
        # vs 6.9 s isolated). Full-suite A/B on a quiet box: 8g 172.5 s,
        # 16g 146.3 s, 24g 143.9 s -- the curve flattens past 16g, so
        # take the smaller footprint. Parameterized: a cluster deployment
        # sizes its own driver; this is the local single-JVM default.
        # (The r5-era 8g-vs-24g finding predates the ParallelGC switch;
        # G1 at 24g full-GC'd, ParallelGC does not.)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # r16: let AQE rewrite a sort-merge join to a shuffled-hash join
        # at RUNTIME when every post-shuffle partition of the build side
        # is under this bound (guide §3.1 -- default 0 keeps the rewrite
        # off). The decision uses ACTUAL partition sizes, not estimates,
        # so the build memory is bounded by construction and oversized
        # partitions at cluster scale simply keep their sort-merge plan
        # -- nothing here assumes local[32]. Full-suite A/B on a quiet
        # box (140 entries, sf0.1, min/2): 143.98 s -> 130.14 s, geomean
        # per-entry 0.920, biggest win the sort-heavy self-join entries
        # (z144 6.68 -> 4.32 isolated 6.91 -> 4.75), worst regression
        # +0.17 s on sub-second entries. The planner-level alternative
        # (spark.sql.join.preferSortMergeJoin=false) was A/B'd too and
        # captured the same z144 win but relies on size ESTIMATES, so
        # only the runtime-guarded rewrite is adopted.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "64m"),
        )
        # A/B knob only (default = Spark's own default); kept for
        # cluster experiments
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"),
        )
    )
    # Driver JVM flags, applied only at JVM launch -- parameterized so a
    # cluster deployment sets its own (SPARK_GRAFT_DRIVER_JAVA_OPTS="" to
    # get stock ergonomics). Default: the parallel (throughput) collector.
    # Measured r15 on the full 140-entry suite at sf0.1: G1's pause-goal
    # heuristics let heap state accumulate across the suite (same entry
    # mid-suite up to 1.75x its fresh-JVM time); ParallelGC removed that
    # tax wholesale, 178.8 s -> 157.8 s, per-entry minima flat-or-better
    # across the board. Batch throughput over pause latency is the right
    # trade for this workload at any scale; nothing here assumes 32
    # cores (a larger ReservedCodeCacheSize A/B'd neutral: 156.6 s).
    java_opts = os.environ.get(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"
    )
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
