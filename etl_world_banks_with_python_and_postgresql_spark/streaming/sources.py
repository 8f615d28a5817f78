"""Streaming sources: file-based (testable here) and Kafka (gated).

The reference has no streams (SURVEY §2.6); these adapt its batch inputs to
Structured Streaming. Kafka needs the spark-sql-kafka package on the
classpath -- absent in this image, so the builder raises a clear error
instead of failing deep inside Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Micro-batch file source: each new file in ``path`` becomes input.

    The batch-id protocol maps naturally: one dropped extract file = one
    micro-batch = one merge epoch (see streaming_merge_sink).
    """
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source returning (key string, value string, timestamp).

    Gated: raises with guidance when the kafka connector jar is missing.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka connector not on classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 via spark.jars.packages"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.selectExpr(
        "CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value",
        "timestamp",
    )
