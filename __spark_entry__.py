"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``etl_world_banks_with_python_and_postgresql_spark``
package; this module only adapts it to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_world_banks_with_python_and_postgresql_spark.plans import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the set-based SCD merge
    classification (the reference's centerpiece operator), which exercises
    scan → semi-join profile → full classify decision tree in one plan."""
    return q.REGISTRY["q26_scd_classify"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star)."""
    return q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every entry in ``queries()``."""
    return q.oracle_sql()
