"""Repartition-perturbation determinism sweep.

The q49 r3 red cell was an order-sensitive double aggregation under a
round: a single-run oracle comparison cannot see it when the run happens
to agree. This sweep runs every oracle-paired registry query twice --
once on the default parquet read, once with every input table
round-robin `repartition(7)`-ed (different partition count AND different
row->partition assignment, so aggregation/merge order changes) -- and
requires bit-identical results (exact float compare, no rounding
absorption). Any query whose output depends on partition order fails
here by name before it can flake in the driver gate.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.plans import queries as Q
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import (
    load as real_load,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

sweep_cases = [name for name, q in Q.REGISTRY.items() if q.oracle]


def exact_rows(df):
    """Column-name-sorted, row-sorted, EXACT values (only NaN / -0.0 are
    canonicalized -- a last-ulp double difference must fail)."""
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return v + 0.0  # collapse -0.0 to 0.0
        if isinstance(v, (str, int, bool)) or v is None:
            return v
        return str(v)

    return sorted(
        (tuple(norm(r[i]) for i in order) for r in df.collect()),
        key=repr,
    )


def run_perturbed(spark, name, monkeypatch):
    """Run a registry query with all catalog loads repartition(7)-ed."""

    def perturbed_load(s, table, sf_dir=real_load.__defaults__[0]):
        return real_load(s, table, sf_dir).repartition(7)

    monkeypatch.setattr(Q, "load", perturbed_load)
    try:
        return Q.REGISTRY[name].fn(spark, SF_DIR)
    finally:
        monkeypatch.setattr(Q, "load", real_load)


@pytest.mark.parametrize("name", sweep_cases)
def test_partition_order_invariant(spark, name, monkeypatch):
    base = exact_rows(Q.REGISTRY[name].fn(spark, SF_DIR))
    pert = exact_rows(run_perturbed(spark, name, monkeypatch))
    assert base == pert, (
        f"{name} is partition-order-sensitive: results differ under "
        f"repartition(7) input perturbation"
    )


def test_sweep_catches_order_sensitive_query(spark, monkeypatch):
    """Meta-canary: the harness must DETECT a seeded q49-style offender.

    A query whose output depends on the input's partitioning (here:
    distinct spark_partition_id count, maximally order-sensitive) must
    produce a diff between the base and perturbed runs -- proving the
    perturbation actually reaches the query's input and the comparison
    is strict enough to see the change.
    """

    def offender(spark_, sf_dir):
        return (
            Q.load(spark_, "region", sf_dir)
            .select(F.spark_partition_id().alias("pid"))
            .agg(F.countDistinct("pid").alias("n_partitions"))
        )

    fake = Q.Query(name="zz_canary", fn=offender, oracle=None, description="")
    monkeypatch.setitem(Q.REGISTRY, "zz_canary", fake)
    base = exact_rows(Q.REGISTRY["zz_canary"].fn(spark, SF_DIR))
    pert = exact_rows(run_perturbed(spark, "zz_canary", monkeypatch))
    assert base != pert
