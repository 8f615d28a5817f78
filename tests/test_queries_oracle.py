"""DuckDB-oracle gate, local mirror of the driver's t2 check.

Runs every registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables (sf0.001 by default for speed; set
SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01 for the full gate) and
compares row counts and order-insensitive, column-name-sorted values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from etl_world_banks_with_python_and_postgresql_spark.plans.queries import REGISTRY
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(rows, columns):
    """Sort columns by name, normalize cell values, sort rows.

    Floats compare by EXACT IEEE-754 bits (round 5): every gated numeric
    is integer-derived, so both engines must produce identical doubles --
    a 9-dp tolerance would only hide a reintroduced rounding-divergence
    bug until the driver's hash gate (which has no tolerance) reds it.
    Only -0.0 is collapsed (sign of zero is presentation, not value).
    """
    import struct

    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return ("f", struct.pack(">d", v + 0.0).hex())
        if isinstance(v, int):
            # int-vs-float column-type skew across engines is tolerated
            # (exactly) by lifting small ints to their double bit pattern
            if abs(v) < 2**52:
                return ("f", struct.pack(">d", float(v)).hex())
            # large ints keep exact integer identity but stay TAGGED: a
            # raw int in a column whose other values normalized to
            # ("f", ...) tuples would make the row sort raise TypeError
            # (a 56-bit hash column straddles 2**52)
            return ("i", v)
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


oracle_cases = [name for name, q in REGISTRY.items() if q.oracle]


@pytest.mark.parametrize("name", oracle_cases)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ns, nd = normalize(spark_rows, spark_cols), normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
    assert ns == nd, f"{name}: value mismatch, first diffs: {mismatches}"


def test_every_query_has_entry():
    assert len(REGISTRY) >= 30
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
