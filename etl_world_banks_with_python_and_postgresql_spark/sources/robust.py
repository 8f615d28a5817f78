"""Robust corpus ingestion: malformed input as dataflow, not exceptions.

The reference treats bad rows as exceptions-per-row (the PL/pgSQL
procedures' EXCEPTION blocks, `SQL/etl_world_banks.sql:244-247`); the
engine's merge already re-expresses that as an `action='error'` quarantine
stream. This module extends the same stance to the INGESTION edge: at
100 TB some fraction of a crawled corpus is always malformed, and a reader
that throws on line 40-billion wastes the cluster. Every read returns
(good, quarantine) -- two DataFrames, both resumable dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON, splitting parseable rows from corrupt
    lines.

    PERMISSIVE mode parks every unparseable line in a corrupt-record
    column instead of failing the task (FAILFAST) or silently dropping
    (DROPMALFORMED -- the mode that loses data without a trace). Returns

      good        rows matching ``schema`` (corrupt column dropped)
      quarantine  (raw_line, source_file) for every malformed line --
                  re-parseable later, countable for ingest SLAs

    The frame is persisted before splitting: Spark disallows queries that
    reference ONLY the corrupt column on an un-materialized JSON scan
    (SPARK-21610), and the two branches would otherwise re-read the
    input. At scale the persist is one scan's worth of storage, freed by
    the caller via ``good.unpersist()`` semantics on the shared parent --
    or skip persisting and pay a second scan by splitting from two
    separate reads; this helper chooses the single-scan shape.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # input_file_name() must be captured BEFORE the persist boundary:
        # over the cached relation it evaluates to ''
        .withColumn("_src_file", F.input_file_name())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL, "_src_file")
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"),
        F.col("_src_file").alias("source_file"),
    )
    return good, quarantine


def validate_rows(
    df: DataFrame, rules: dict[str, F.Column]
) -> tuple[DataFrame, DataFrame]:
    """Predicate-level quarantine: split ``df`` by named validity rules.

    ``rules`` maps rule-name -> boolean Column that VALID rows satisfy.
    Returns (good, quarantine) where quarantine carries a
    ``failed_rules`` array naming every violated rule -- the audit trail
    the reference kept as per-row NOTICE messages, as a column. One scan,
    no shuffle; both branches are plain filters Catalyst pushes down.
    """
    checks = F.array_compact(
        F.array(
            *[
                F.when(~cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in sorted(rules.items())
            ]
        )
    )
    tagged = df.withColumn("_failed", checks)
    good = tagged.filter(F.size("_failed") == 0).drop("_failed")
    quarantine = tagged.filter(F.size("_failed") > 0).withColumnRenamed(
        "_failed", "failed_rules"
    )
    return good, quarantine
