#!/usr/bin/env python
"""End-to-end lexical-dedup ingestion workflow: the round-9 at-rest
MinHash index + sketch-valued observability view chained the way a
continuously-crawled training corpus runs them.

Usage:
    python examples/dedup_ingest_pipeline.py [sf_dir]

Stages (each oracle- or test-verified on its own):

  1. chunking            overlapping token windows with    train_prep.chunk_documents
                         exact begin_tok provenance
  2. index seed          bucket-partitioned band slices +  dedup.write_minhash_index
                         verify payloads over the first
                         corpus slice
  3. batch screening     novel-only filter, both index     dedup.minhash_novel_indexed
                         reads partition-pruned; novel     dedup.append_minhash_index
                         docs appended O(|batch|)
  4. streamed ingestion  foreachBatch novelty sink,        streaming_minhash_novelty_sink
                         replays absorbed BY CONTENT
  5. observability       maintained per-source distinct    ivm.KmvAggView
                         estimate (idempotent KMV
                         partials, zero prior-state reads)

Prints per-stage row counts as JSON lines. Shuffle budget: chunking is
zero-shuffle (scan-stage explode); index build/append shuffle once on
the band/set bucket keys; a probe shuffles its batch only (the index
side is a pruned parquet read); KMV ingests shuffle the delta to the
group keys and never read prior state.
"""

import json
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from etl_world_banks_with_python_and_postgresql_spark.operators import dedup  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import KmvAggView  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (  # noqa: E402
    chunk_documents,
)
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (  # noqa: E402
    streaming_minhash_novelty_sink,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark()
    docs = load(spark, "documents", sf_dir)
    emit = lambda stage, **kw: print(json.dumps({"stage": stage, **kw}))  # noqa: E731

    # 1. chunking (provenance-preserving; feeds an embedding/RAG stage)
    chunks = chunk_documents(docs, chunk_tokens=32, overlap=8)
    emit("chunking", docs=docs.count(), chunks=chunks.count())

    with tempfile.TemporaryDirectory() as tmp:
        idx = f"{tmp}/mh_index"

        # 2. seed the index with the first corpus slice
        seed = docs.filter(F.col("source").isin("src0", "src1"))
        dedup.write_minhash_index(seed, idx)
        emit("index_seed", indexed_docs=seed.count())

        # 3. batch screening + O(|batch|) append
        batch = docs.filter(F.col("source") == "src2")
        novel = dedup.minhash_novel_indexed(spark, batch, idx, threshold=0.5)
        n_novel = novel.count()
        dedup.append_minhash_index(novel, idx)
        emit(
            "batch_screening",
            batch=batch.count(),
            novel=n_novel,
            near_dups_dropped=batch.count() - n_novel,
        )

        # 4. streamed ingestion: remaining sources arrive as a stream;
        #    the sink keeps only docs with no indexed near-dup and grows
        #    the index with the novel remainder (replays absorb by content)
        stream_src = f"{tmp}/incoming"
        docs.filter(
            ~F.col("source").isin("src0", "src1", "src2")
        ).write.parquet(stream_src)
        stream = spark.readStream.schema(docs.schema).parquet(stream_src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_minhash_novelty_sink(idx, threshold=0.5)
            )
            .option("checkpointLocation", f"{tmp}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

        # maintenance: distinct-dedup the index files and reset n_docs
        # (cleans any re-appended batches; ~1 file per bucket afterward).
        # Compaction REPLACES the parquet files, so read the index only
        # AFTER it -- a DataFrame defined over the pre-compaction files
        # would fail on materialization (see compact_minhash_index docs).
        emit("index_compaction", **dedup.compact_minhash_index(spark, idx))
        indexed = spark.read.parquet(f"{idx}/sets").select("doc_id").distinct()
        emit("streamed_ingestion", total_indexed=indexed.count())

        # 5. observability: maintained per-source distinct-text estimate
        #    over everything that SURVIVED dedup (join back for lineage)
        view = KmvAggView(
            f"{tmp}/kmv_view", keys=["source"], value_expr="text", k=64,
            n_partitions=2,
        )
        survived = docs.join(indexed, "doc_id")
        view.ingest(survived, "post-dedup")
        stats = sorted(
            (r["source"], r["est_distinct"])
            for r in view.read(spark).collect()
        )
        emit("observability", per_source_distinct_estimates=stats)


if __name__ == "__main__":
    main(*sys.argv[1:])
