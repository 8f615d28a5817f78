"""Partial-oracle checkers for the two approximate/iterative-by-design
registry entries (VERDICT r12 #1): q51's sketch error envelopes and
q60's returned-pair exactness are cross-engine-verified here and in
diag.py, mirroring how the full-oracle entries are gated.

Runs at sf0.01 (the driver's gate SF): the envelopes are calibrated to
real sketch behavior at that scale, and the DuckDB brute-force sides
are tiny (500 embeddings / ~60k lineitem rows).
"""

from __future__ import annotations

import duckdb
import pytest

from etl_world_banks_with_python_and_postgresql_spark.plans.partial import (
    PARTIAL_ORACLES,
    check_q51,
    check_q60,
)
from etl_world_banks_with_python_and_postgresql_spark.plans.queries import REGISTRY
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _qs():
    return {name: q.fn for name, q in REGISTRY.items()}


def test_partial_oracle_names_cover_exactly_the_unpaired_entries():
    """Every registry entry is either full-oracle-paired or has a
    partial oracle -- the unpaired count is now zero by construction,
    and a new unpaired entry fails HERE until it gets one."""
    unpaired = {n for n, q in REGISTRY.items() if not q.oracle}
    assert unpaired == set(PARTIAL_ORACLES)


def test_q51_partial_oracle(spark, duck):
    res = check_q51(spark, duck, SF_DIR, _qs())
    assert res["ok"], res


def test_q60_partial_oracle(spark, duck):
    res = check_q60(spark, duck, SF_DIR, _qs())
    assert res["ok"], res
    # the strong claim: every returned distance is bit-exact vs the
    # DuckDB recomputation over the same parquet -- approximation lives
    # ONLY in which neighbors surface, never in the numbers reported
    assert res["n_dist_mismatch"] == 0 and res["n_rank_mismatch"] == 0
