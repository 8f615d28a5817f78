#!/usr/bin/env python
"""End-to-end text-retrieval workflow: the keyword/BM25 operators chained
the way a production search-over-corpus stack runs them.

Usage:
    python examples/retrieval_pipeline.py [sf_dir]

Stages (each oracle- or test-verified on its own):

  1. scan-form retrieval   conjunctive AND + BM25 over    text.keyword_search
                           the raw corpus (no index)      text.bm25_rank
  2. index build           term-bucketed posting lists    text.write_posting_index
  3. incremental append    new docs -> O(batch) growth    text.append_posting_index
  4. streamed ingestion    foreachBatch exactly-once      streaming_posting_index_sink
  5. indexed retrieval     bucket-pruned probes, results  text.keyword_search_indexed
                           bit-identical to scan form     text.bm25_indexed
  6. hybrid fusion         reciprocal-rank fusion of the  text.rrf_fuse
                           two systems (exact micros)

Prints per-stage row counts and the top hits as JSON lines.
Shuffle budget: scan-form BM25 is one pass + a 1-row stats broadcast
(1); the index build is one explode + one (term, doc) aggregate (2);
appends touch only the buckets the batch hits (3-4); probes read
|terms| of n_buckets partition directories and aggregate only those
posting rows (5); fusion unions two LIMIT-bounded top-k lists (6).
"""

import json
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from etl_world_banks_with_python_and_postgresql_spark.operators import text as T  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (  # noqa: E402
    streaming_posting_index_sink,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark()
    docs = load(spark, "documents", sf_dir)
    emit = lambda stage, **kw: print(json.dumps({"stage": stage, **kw}))  # noqa: E731

    terms2, terms3 = ["merge", "window"], ["merge", "window", "partition"]

    # 1. scan-form retrieval
    kw_scan = T.keyword_search(docs, terms=terms2).collect()
    bm_scan = T.bm25_rank(docs, terms=terms3).collect()
    emit(
        "scan_retrieval",
        conjunctive_hits=len(kw_scan),
        bm25_hits=len(bm_scan),
        top_bm25=[[r["doc_id"], r["bm25"]] for r in bm_scan[:3]],
    )

    with tempfile.TemporaryDirectory() as tmp:
        idx = f"{tmp}/postings"

        # 2. index build over an initial corpus slice
        seed = docs.filter(F.col("doc_id") % 3 == 0)
        T.write_posting_index(seed, idx, n_buckets=32)
        emit("index_build", seed_docs=seed.count(), n_buckets=32)

        # 3. batch append
        batch = docs.filter(F.col("doc_id") % 3 == 1)
        T.append_posting_index(batch, idx)
        emit("append", appended_docs=batch.count())

        # 4. streamed ingestion (exactly-once foreachBatch body; a replay
        # of a committed epoch is a no-op)
        sink = streaming_posting_index_sink(idx)
        tail = docs.filter(F.col("doc_id") % 3 == 2)
        sink(tail, 0)
        sink(tail, 0)  # replay absorbed
        emit("streamed", streamed_docs=tail.count(), replays_absorbed=1)

        # 5. indexed retrieval == scan form, bit for bit
        kw_idx = T.keyword_search_indexed(spark, idx, terms=terms2).collect()
        bm_idx = T.bm25_indexed(spark, idx, terms=terms3).collect()
        emit(
            "indexed_retrieval",
            conjunctive_match=[tuple(r) for r in kw_idx] == [tuple(r) for r in kw_scan],
            bm25_match=[tuple(r) for r in bm_idx] == [tuple(r) for r in bm_scan],
        )

        # 6. hybrid fusion: RRF of the two (indexed) systems in exact
        # integer micros -- the production combiner for lexical+semantic
        # stacks, here fusing disjunctive BM25 with the conjunctive rank
        fused = T.rrf_fuse(
            [
                (
                    T.bm25_indexed(spark, idx, terms=terms3),
                    (F.desc("bm25"), F.asc("doc_id")),
                ),
                (
                    T.keyword_search_indexed(spark, idx, terms=terms2),
                    (F.desc("total_tf"), F.asc("doc_id")),
                ),
            ],
            rrf_k=60,
            top=5,
        ).collect()
        emit(
            "hybrid_rrf",
            top=[[r["doc_id"], r["rrf_micros"], r["n_systems"]] for r in fused],
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
