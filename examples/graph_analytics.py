#!/usr/bin/env python
"""Graph analytics pipeline: the relational-tables-to-graph workflow.

Run:  python examples/graph_analytics.py [sf_dir]

1. Derive two graphs from the purchase tables: the customer->supplier
   interaction graph (weighted by order-line counts) and the part
   co-purchase graph (parts sharing an order, thresholded to >= 2
   distinct orders so the graph has real component structure).
2. Centrality: weighted PageRank over the interaction graph (exact
   integer micros -- the crawl-corpus quality-prior shape).
3. Structure: large-star/small-star connected components + degree-
   oriented triangle counts over the co-purchase graph.
4. Entity resolution: blocked fuzzy part-name matching -> CC ->
   canonical entity ids with cluster sizes (the MDM composition).

Every stage is the operator behind an oracle-gated registry entry
(z139 / z147 / z144 / z153); this script is the end-to-end narrative.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.operators.graph import (
    connected_components,
    pagerank,
    triangle_counts,
)
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("graph-analytics")
    li = load(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    o = load(spark, "orders", SF_DIR).select("o_orderkey", "o_custkey")

    # 1a. weighted customer->supplier interaction graph
    interactions = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )

    # 2. weighted PageRank, top 5
    top = (
        pagerank(interactions, n_iter=3, weight="w")
        .orderBy(F.desc("rank_micros"), F.asc("node"))
        .limit(5)
        .collect()
    )
    print("top-5 weighted PageRank (node, rank_micros):")
    for r in top:
        print(f"  {r['node']:>8}  {r['rank_micros']}")

    # 1b. part co-purchase graph, >= 2 shared orders
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("_pb"))
    co = (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("_pb"))
        .groupBy(
            F.col("l_partkey").alias("src"), F.col("_pb").alias("dst")
        )
        .agg(F.countDistinct("l_orderkey").alias("n_ord"))
        .filter(F.col("n_ord") >= 2)
        .select("src", "dst")
    )

    # 3. components + triangles
    comp = connected_components(co)
    sizes = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
        .orderBy(F.desc("sz"), F.asc("component"))
        .limit(3)
        .collect()
    )
    print("co-purchase components (top 3 by size):")
    for r in sizes:
        print(f"  component {r['component']:>6}  size {r['sz']}")
    tri = triangle_counts(co)
    total = tri.agg(F.expr("sum(n_triangles) div 3").alias("t")).collect()[0]["t"]
    print(f"co-purchase triangles: {total}")

    # 4. entity resolution over part names (q52 blocking -> CC)
    p = (
        load(spark, "part", SF_DIR)
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name", "p_type")
    )
    a = p.select(
        F.col("p_partkey").alias("src"), F.col("p_name").alias("na"), "p_type"
    )
    bb = p.select(
        F.col("p_partkey").alias("dst"), F.col("p_name").alias("nb"), "p_type"
    )
    edges = (
        a.join(bb, "p_type")
        .filter(F.col("src") < F.col("dst"))
        .filter(F.levenshtein("na", "nb") <= 3)
        .select("src", "dst")
    )
    ents = connected_components(edges)
    n_ent = ents.select("component").distinct().count()
    n_rec = ents.count()
    print(f"entity resolution: {n_rec} matched records -> {n_ent} entities")
    spark.stop()


if __name__ == "__main__":
    main()
