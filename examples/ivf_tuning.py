#!/usr/bin/env python
"""IVF multi-probe tuning: recall / latency / scan-fraction curve.

Usage:
    python examples/ivf_tuning.py [sf_dir]

Prints one JSON line per (centroid-source, n_probe) point. The decision
this supports at scale: pick the smallest n_probe whose recall clears
your SLA -- each probe step costs ~n_probe/n_centroids of a corpus scan
per query batch. Trained centroids (mini-batch k-means) buy recall at
the same n_probe versus stride-sampled ones; the mini-batch trainer
itself costs n_iter/sample_mod corpus-equivalents, amortized across
every query that reuses the centroid set.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
    ivf_recall_curve,
    minibatch_kmeans_centroids,
    pq_recall_curve,
)
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="ivf_tuning")
    emb = load(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    for label, cents in (
        ("stride", None),
        ("minibatch_kmeans", minibatch_kmeans_centroids(
            emb, n_centroids=16, n_iter=8, sample_mod=4
        )),
    ):
        for point in ivf_recall_curve(
            emb, queries, n_probes=(1, 2, 4, 8, 16), n_centroids=16, k=10,
            centroids=cents,
        ):
            print(json.dumps({"centroids": label, **point}))

    # PQ tuning axis: recall vs at-rest compression (composes with IVF
    # via ivf_pq_topk -- scan fraction x bytes/vec multiply)
    for point in pq_recall_curve(
        emb, queries, layouts=((4, 16), (8, 16), (16, 16)), n_iter=2, k=10
    ):
        print(json.dumps({"tuning": "pq", **point}))


if __name__ == "__main__":
    main()
