"""Edge-scale probe for the round-12/13 graph family (VERDICT r12 #3 +
r13 #3): k-core peeling (z169), k-hop reach (z173), the DOULION
triangle estimate (z166), degree assortativity (z180), and hop-bounded
harmonic centrality (z189) measured at 1x / 4x / 8x edges, where Nx =
disjoint-id graph copies (same structure, N x the rows -- the
PageRank/CC probe methodology from PERF.md round 11). Reports wall
seconds, output rows, and for k-core the executed PEEL ROUNDS: disjoint
copies preserve peel depth exactly, so a flat round count at 8x is the
observable that the fail-loud ``max_rounds`` bound scales with data
volume (it depends on graph STRUCTURE only). For z180 the coefficient
itself is scale-INVARIANT (ratio of degree moments, both x64) and for
z189 the copy-0 centralities are bit-identical across scales -- both
pinned load-independently in tests/test_operators_misc.py; this probe
adds the WALL-CLOCK growth of the 2-join degree annotation (z180) and
the shell-BFS frontier (z189).

    python examples/graph_scale_probe.py [sf_dir] [copies...]

Defaults: sf_dir=/root/testdata/sf0.001, copies=1 4 8. PERF.md records
the sf0.1 run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
    degree_assortativity,
    harmonic_centrality,
    k_core,
    k_hop_reach,
    triangle_estimate,
)
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load


def copurchase_edges(spark, sf_dir: str) -> DataFrame:
    """The z144/z166/z169 graph: parts co-purchased within an order."""
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("_pb"))
    return (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .select(F.col("l_partkey").alias("src"), F.col("_pb").alias("dst"))
    )


def sparse_edges(spark, sf_dir: str) -> DataFrame:
    """The z147/z173 graph: co-purchased in >= 2 distinct orders."""
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("_pb"))
    return (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .groupBy(F.col("l_partkey").alias("src"), F.col("_pb").alias("dst"))
        .agg(F.countDistinct("l_orderkey").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("src", "dst")
    )


def disjoint_copies(edges: DataFrame, n: int, offset: int) -> DataFrame:
    out = None
    for i in range(n):
        c = edges.select(
            (F.col("src") + i * offset).alias("src"),
            (F.col("dst") + i * offset).alias("dst"),
        )
        out = c if out is None else out.unionByName(c)
    return out.localCheckpoint()  # pay the copy cost BEFORE the clock


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    copies = [int(x) for x in sys.argv[2:]] or [1, 4, 8]
    spark = get_spark(app_name="graph-scale-probe")

    dense = copurchase_edges(spark, sf_dir).localCheckpoint()
    sparse = sparse_edges(spark, sf_dir).localCheckpoint()
    off = (
        dense.agg(F.max(F.greatest("src", "dst"))).collect()[0][0] or 0
    ) + 1
    n_dense, n_sparse = dense.count(), sparse.count()
    print(f"# base graphs: dense={n_dense} edges, sparse={n_sparse} edges")

    for n in copies:
        d = disjoint_copies(dense, n, off)
        s = disjoint_copies(sparse, n, off)

        stats: dict = {}
        t0 = time.perf_counter()
        rows = k_core(d, k=60, max_rounds=12, stats=stats).count()
        t_core = time.perf_counter() - t0

        t0 = time.perf_counter()
        reach = k_hop_reach(s, hops=2).count()
        t_hop = time.perf_counter() - t0

        t0 = time.perf_counter()
        est = triangle_estimate(d, sample_denom=4, seed=0).collect()[0][0]
        t_tri = time.perf_counter() - t0

        t0 = time.perf_counter()
        arow = degree_assortativity(s).collect()[0]
        t_assort = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_harm = harmonic_centrality(s, hops=2).count()
        t_harm = time.perf_counter() - t0

        print(
            f"{n}x: k_core {t_core:.2f}s ({rows} nodes, "
            f"rounds={stats['rounds']}) | k_hop {t_hop:.2f}s "
            f"({reach} nodes) | doulion {t_tri:.2f}s (est={est}) | "
            f"assort {t_assort:.2f}s "
            f"(r_micros={arow['assortativity_micros']}, "
            f"m={arow['m_endpoint_pairs']}) | "
            f"harmonic {t_harm:.2f}s ({n_harm} nodes)"
        )


if __name__ == "__main__":
    main()
