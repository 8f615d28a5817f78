"""Parquet table catalog over the driver-generated TESTDATA directories.

Replaces the reference's `SELECT * FROM etl.<table>` scans
(`SQL/etl_world_banks_workings.sql:1-3`) with parquet scans that Catalyst
can prune and push filters into. Never infers schemas for the reference
tables; TESTDATA parquet carries its own footer schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_runtime_conf(spark: SparkSession) -> None:
    """Settings required for correctness regardless of who built the session
    (the verify driver constructs its own). All are runtime-settable SQL
    confs: UTC so timestamps compare bit-for-bit against the UTC-naive
    DuckDB oracle; nanosAsLong so the events table is readable at all."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one TESTDATA table. Parquet scan → pushdown + pruning for free."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; one of {TABLE_NAMES}")
    ensure_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # ts stored as nanos-since-epoch int64 (readable only under
            # spark.sql.legacy.parquet.nanosAsLong); truncate to micros with
            # INTEGER division -- a double division would lose precision
            # above 2^53.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # parquet timestamp[us] with isAdjustedToUTC=false reads as
            # TIMESTAMP_NTZ; normalize to session-TZ TIMESTAMP (session TZ is
            # pinned to UTC above) so event-time windows, streaming
            # watermarks, and the DuckDB oracle all agree on the same type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        # already TimestampType: pass through untouched
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every TESTDATA table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load(spark, name, sf_dir).createOrReplaceTempView(name)
