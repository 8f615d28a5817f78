"""Cross-engine determinism sweep: the DuckDB leg (VERDICT r4, task #3).

`tests/test_determinism.py` proves the SPARK side is partition-order
independent. This file closes the other half of the q49 red-cell class:

1. every paired oracle is evaluated TWICE in DuckDB -- default config vs
   `PRAGMA threads=1` over physically reordered input tables -- and the
   two results must match BIT FOR BIT. An oracle whose value depends on
   DuckDB's scan/aggregation order would red the driver gate on any
   version/parallelism skew while staying invisible to Spark-vs-Spark
   sweeps.
2. a boundary scan: no float a gated query emits may sit within
   BOUNDARY_ULPS of a 6-dp decimal rounding half-boundary. Every rounded
   output is now derived from exact integers (functions.exactnum), so it
   lies ON a decimal grid, far from any half-boundary; a value near
   x.xxxxxx5 means someone reintroduced `round(<double>)` somewhere.
3. the scanner itself is proven on a seeded boundary case (1/640), so a
   silently-broken scanner cannot fake green.
"""

from __future__ import annotations

import math
import os
import struct

import duckdb
import pytest

from etl_world_banks_with_python_and_postgresql_spark.plans.queries import REGISTRY
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")
BOUNDARY_ULPS = 4


@pytest.fixture(scope="module")
def duck_default():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck_perturbed():
    """Single-threaded DuckDB over physically re-ordered copies of every
    table: same rows, maximally different scan/aggregation order."""
    con = duckdb.connect()
    con.execute("PRAGMA threads=1")
    for t in TABLE_NAMES:
        # deterministic shuffle: order rows by md5 of their JSON form
        con.execute(
            f"CREATE TABLE {t} AS FROM ("
            f"SELECT *, md5(to_json(t)::VARCHAR) AS _h "
            f"FROM '{SF_DIR}/{t}.parquet' t ORDER BY _h DESC"
            f") SELECT * EXCLUDE (_h)"
        )
    yield con
    con.close()


def _rows_bits(res):
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            return ("f", struct.pack(">d", v).hex())
        return ("o", str(type(v)), str(v))

    return sorted(tuple(cell(r[i]) for i in order) for r in res.fetchall())


oracle_cases = [name for name, q in REGISTRY.items() if q.oracle]


@pytest.mark.parametrize("name", oracle_cases)
def test_oracle_bit_stable_across_duckdb_configs(
    duck_default, duck_perturbed, name
):
    sql = REGISTRY[name].oracle
    a = _rows_bits(duck_default.execute(sql))
    b = _rows_bits(duck_perturbed.execute(sql))
    assert a == b, (
        f"{name}: oracle result depends on DuckDB scan order/parallelism "
        f"(first diff: {next(((x, y) for x, y in zip(a, b) if x != y), None)})"
    )


def ulps_to_half_boundary(v: float, scale: int = 6) -> float:
    """Distance (in ulps of v) to the nearest x.5 * 10^-scale boundary."""
    if not math.isfinite(v) or v == 0.0:
        return math.inf
    p = 10**scale
    k = math.floor(v * p)
    best = min(abs(v - (kk + 0.5) / p) for kk in (k - 1, k, k + 1))
    return best / math.ulp(v)


def test_boundary_scanner_catches_seeded_case():
    # 1/640 = 0.0015625: exactly ON a 6-dp half-boundary, not binary-
    # representable -- the canonical cross-engine round-divergence input
    seeded = 1.0 / 640.0
    assert ulps_to_half_boundary(seeded) <= BOUNDARY_ULPS
    # and a micros-derived value is comfortably far
    assert ulps_to_half_boundary(1563 / 1e6) > 1e6


GATED = sorted(REGISTRY)[:50]


@pytest.mark.parametrize("name", [n for n in GATED if REGISTRY[n].oracle])
def test_gated_floats_clear_of_round_boundaries(duck_default, name):
    """No gated output float may sit within BOUNDARY_ULPS of a 6-dp
    rounding half-boundary: exact-integer-derived values lie ON decimal
    grids, so proximity to x...5 means a raw-double round() crept back."""
    res = duck_default.execute(REGISTRY[name].oracle)
    offenders = []
    for row in res.fetchall():
        for v in row:
            if isinstance(v, float) and math.isfinite(v):
                d = ulps_to_half_boundary(v)
                if d <= BOUNDARY_ULPS:
                    offenders.append((v, d))
    assert not offenders, f"{name}: values within {BOUNDARY_ULPS} ulp of a " \
                          f"rounding half-boundary: {offenders[:5]}"
