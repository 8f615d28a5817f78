#!/usr/bin/env python
"""End-to-end embedding-corpus workflow: the similarity-side operators
chained the way a production retrieval/training stack runs them.

Usage:
    python examples/embedding_pipeline.py [sf_dir]

Stages (each oracle- or test-verified on its own):

  1. corpus moments      per-dim integer-micro stats   similarity.embedding_moments
  2. semantic dedup      sign-LSH pairs -> CC ->       similarity.semantic_dedup
                         one representative/cluster
  3. IVF index build     trained coarse centroids,     similarity.write_ivf_index
                         cell-partitioned parquet
  4. incremental append  new batch -> nearest cells,   similarity.append_ivf_index
                         O(batch) index growth
  5. indexed ANN         partition-pruned probe reads  similarity.ivf_topk_indexed
  6. hard negatives      label-mismatch top-k          similarity.hard_negatives
  7. PQ + IVF-PQ         m-byte codes at rest,         similarity.pq_codebooks/pq_encode
                         ADC scan over probed cells    similarity.ivf_pq_topk

Prints per-stage row counts and one sample ANN result as JSON lines.
Shuffle budget: the moment stats reduce to dim-many groups map-side (1);
dedup shuffles only band buckets and the bounded edge list (2); the index
build is one scan + partitioned write (3); the append never touches
existing files (4); probes read only probed cell directories (5); the
negative miner scans the corpus once with a broadcast query side (6).
"""

import json
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.operators import similarity
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark()
    emb = load(spark, "embeddings", sf_dir)

    stats = similarity.embedding_moments(emb)
    print(json.dumps({"stage": "moments", "dims": stats.count()}))

    dedup = similarity.semantic_dedup(
        emb, threshold=0.45, bands=12, bits_per_band=6, dim=64
    )
    kept_ids = dedup.filter(F.col("kept")).select("vec_id")
    kept = emb.join(kept_ids, "vec_id", "left_semi")
    print(json.dumps({
        "stage": "semantic_dedup",
        "in": emb.count(),
        "kept": kept.count(),
    }))

    with tempfile.TemporaryDirectory() as tmp:
        index = f"{tmp}/ivf"
        first = kept.filter(F.col("vec_id") % 2 == 0)
        second = kept.filter(F.col("vec_id") % 2 == 1)
        similarity.write_ivf_index(first, index, n_centroids=8)
        similarity.append_ivf_index(second, index)
        print(json.dumps({
            "stage": "ivf",
            "built": first.count(),
            "appended": second.count(),
        }))

        queries = kept.filter(F.col("vec_id") % 100 == 0)
        ann = similarity.ivf_topk_indexed(spark, index, queries, n_probe=2, k=5)
        sample = ann.orderBy("query_id", "rank").limit(3).collect()
        print(json.dumps({
            "stage": "ann",
            "results": ann.count(),
            "sample": [[r["query_id"], r["neighbor_id"], r["cos_sim"]]
                       for r in sample],
        }))

    negs = similarity.hard_negatives(emb, emb.filter(F.col("vec_id") % 100 == 0), k=5)
    print(json.dumps({"stage": "hard_negatives", "rows": negs.count()}))

    # 6. PQ compression + IVF-PQ serving scan (round 10): m-byte codes at
    # rest, asymmetric scoring over probed cells only
    books = similarity.pq_codebooks(emb, m=4, n_codewords=8, n_iter=1)
    codes = similarity.pq_encode(emb, books)
    ivfpq = similarity.ivf_pq_topk(
        emb, emb.filter(F.col("vec_id") % 100 == 0),
        n_centroids=8, n_probe=3, k=5, books=books,
    )
    print(json.dumps({
        "stage": "ivf_pq",
        "encoded": codes.count(),
        "code_bytes_per_vec": len(books),
        "results": ivfpq.count(),
    }))


if __name__ == "__main__":
    main(*sys.argv[1:2])
