#!/usr/bin/env python
"""End-to-end training-corpus build: every corpus operator chained the way
a production 100 TB pretraining pipeline runs them.

Usage:
    python examples/train_corpus_pipeline.py [sf_dir]

Stages (each is an oracle- or property-verified operator on its own):

  0.5 domain triage     URL canonicalize + per-domain web.canonicalize_urls
                        Gopher keep-rate blocklist    web.domain_stats
  1. exact dedup        content-hash survivors        dedup.exact_duplicates
  1.5 line dedup        CCNet boilerplate-line pass   dedup.line_dedup
  2. near-dedup         3-gram Jaccard pairs >= 0.8   dedup.ngram_jaccard_pairs
                        -> connected components       dedup.duplicate_clusters
                        -> drop non-survivor members
  3. decontamination    drop docs sharing an 8-gram   train_prep.ngram_contamination
                        with the held-out eval slice
  4. PII redaction      mask emails / long digit runs text.redact_pii
  5. quality filter     composite score >= 0.5        text.with_quality
  6. language ID        tag pred_lang                 text.with_lang_id
  6.5 repetition gate   Gopher dup-token/top-bigram   text.with_repetition
  6.6 fluency gate      corpus-bigram LM score        plans (z88 shape)
  7. split              content-hash 80/10/10         train_prep.hash_split
  8. packing            2048-token bins per source    train_prep.pack_token_bins
  8.5 vocab encoding    top-512 ids, OOV audited      train_prep.build_vocab/encode_tokens
  8.55 BPE tokenizer    train 16 merges + encode      bpe.bpe_train/bpe_segment
  8.6 training order    3:2:1 stride interleave +     train_prep.stride_interleave
                        seeded epoch shuffle          train_prep.epoch_shuffle
  9. chunking           64-token windows, stride 48   train_prep.chunk_token_windows
  10. mixing quota      largest-remainder allocation  plans (z92 shape)
  11. shard manifest    token-budget shards           prefix.token_shards

Prints per-stage survivor counts and the final per-(split, source) corpus
manifest as JSON lines. Total shuffle budget: one content-hash groupBy
(1), the pair/CC joins over the tiny near-dup subgraph (2), one broadcast
join (3), zero (4-6: pure row-local codegen), zero (7: row-local), one
per-source window (8).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.operators import (
    dedup,
    text,
    train_prep,
    web,
)
from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
    chunk_token_windows,
    hash_split,
    ngram_contamination,
    pack_token_bins,
)
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="train-corpus-pipeline")
    docs = load(spark, "documents", sf_dir)
    stage = {"input": docs.count()}

    # 0.5. URL canonicalization + per-domain triage (the CCNet grouping,
    # z167/z168 shape): canonicalize each doc's URL, roll the corpus up
    # per registered domain with the Gopher keep flag, and blocklist
    # domains where fewer than half the docs pass the rule battery --
    # the domain-level kill a crawl pipeline applies BEFORE paying for
    # doc-level dedup. The synthetic corpus has no URL column, so one is
    # synthesized deterministically from table values (z141 precedent).
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(".co.uk")).otherwise(
            F.lit(".com")
        ),
        F.lit("/d/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=crawl&page=1"),
    ).alias("url")
    dom = web.canonicalize_urls(docs.select("doc_id", url)).select(
        "doc_id", "host", "domain"
    )
    gk = text.gopher_quality(
        docs, min_words=10, min_distinct_pct=10, min_stopwords=0
    ).select("doc_id", "keep")
    dstats = web.domain_stats(
        dom.join(gk, "doc_id").join(
            docs.select("doc_id", "n_chars"), "doc_id"
        )
    )
    bad_domains = dstats.filter(
        F.col("n_keep") * 2 < F.col("n_docs")
    ).select("domain")
    bad_docs = dom.join(bad_domains, "domain", "left_semi").select("doc_id")
    # localCheckpoint: every later stage re-executes the docs lineage at
    # its count(); cutting here keeps the triage subtree (rollup + two
    # joins) from being replayed a dozen times downstream
    docs = docs.join(bad_docs, "doc_id", "left_anti").localCheckpoint()
    stage["domain_triage"] = docs.count()

    # 1. exact dedup: keep the min-id copy of byte-identical texts
    keep = dedup.exact_duplicates(docs).select(F.col("keep_id").alias("doc_id"))
    docs = docs.join(keep, "doc_id", "left_semi")
    stage["exact_dedup"] = docs.count()

    # 1.5. line-level boilerplate removal (CCNet pass): drop lines that
    # survive exact dedup yet still occur in >= 2 distinct docs. The
    # synthetic corpus is single-line, so this mostly demonstrates the
    # plumbing (drop set ~empty after stage 1); on crawled data this is
    # where nav menus and cookie banners die.
    ld = dedup.line_dedup(docs, min_dup_docs=2)
    docs = (
        docs.join(ld.filter(F.col("n_lines_kept") > 0), "doc_id")
        .select("doc_id", "lang", "source", F.col("text_dedup").alias("text"))
    )
    stage["line_dedup"] = docs.count()

    # 2. near-dedup: pairs -> clusters -> keep each cluster's min id
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8)
    clusters = dedup.duplicate_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs = docs.join(losers, "doc_id", "left_anti")
    stage["near_dedup"] = docs.count()

    # 3. decontamination vs the src0 held-out slice
    ev = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    dirty = ngram_contamination(train, ev, n=8).select("doc_id")
    docs = train.join(dirty, "doc_id", "left_anti")
    stage["decontaminated"] = docs.count()

    # 4-6. redact, score, tag language -- ONE row-local pass, zero joins:
    # redact_pii adds columns in place; keep_cols threads source/redacted
    # text through the quality and language projections
    docs = text.redact_pii(docs, text_col="text", out_col="clean_text")
    docs = text.with_quality(
        docs.select("doc_id", "source", F.col("clean_text").alias("text")),
        keep_cols=["source", "text"],
    )
    docs = text.with_lang_id(
        docs,
        keep_cols=["source", "text", "n_tokens", "quality_score"],
    ).filter(F.col("quality_score") >= 0.5)
    stage["quality_filtered"] = docs.count()

    # 6.2. Gopher rule battery (z141): per-rule flags over the cleaned
    # text; keep only rule-passing docs, but loosen the corpus-hostile
    # bounds (the synthetic corpus is drawn from a tiny vocabulary, so
    # the distinct-word and stopword rules would gut it -- thresholds
    # are corpus-calibrated by design)
    gq = text.gopher_quality(
        docs, min_words=10, min_distinct_pct=10, min_stopwords=0
    ).select("doc_id", "keep")
    docs = docs.join(gq.filter(F.col("keep")).select("doc_id"), "doc_id")
    stage["gopher_rules"] = docs.count()

    # 6.3. DSIR-shaped importance weights vs the src1 target domain:
    # keep everything, carry score_micros for downstream mixing weights
    iw = train_prep.importance_weights(
        docs, F.col("source") == "src1"
    ).select("doc_id", "score_micros")
    docs = docs.join(iw, "doc_id", "left").fillna(
        {"score_micros": 0}
    )

    # 6.5. repetition gate (Gopher): drop degenerate repeated-text docs.
    # Thresholds are corpus-calibrated; the synthetic corpus is drawn from
    # a tiny vocabulary, so these bounds only shave the extreme tail.
    rep = text.with_repetition(docs).select(
        "doc_id", "dup_trigram_frac", "top_bigram_frac"
    )
    docs = (
        docs.join(rep, "doc_id")
        .filter((F.col("dup_trigram_frac") < 0.9) & (F.col("top_bigram_frac") < 0.9))
        .drop("dup_trigram_frac", "top_bigram_frac")
    )
    stage["repetition_gated"] = docs.count()

    # 7. deterministic content-hash split
    docs = hash_split(docs)

    # 8. per-source token packing of the train split
    bins = pack_token_bins(docs.filter(F.col("split") == "train"), budget=2048)

    manifest = (
        docs.groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
        .orderBy("split", "source")
    )
    # 8.5. frozen-vocab token-id encoding of the train split: the
    # corpus -> trainer handoff (ids against the top-512 vocabulary,
    # OOV=0, per-doc coverage auditable)
    from etl_world_banks_with_python_and_postgresql_spark.operators.train_prep import (
        build_vocab,
        encode_tokens,
        epoch_shuffle,
        stride_interleave,
    )

    train = docs.filter(F.col("split") == "train")
    vocab = build_vocab(train, top_n=512)
    encoded = encode_tokens(train, vocab)
    oov = encoded.agg(
        F.sum("n_oov").alias("oov"), F.sum("n_tokens").alias("tok")
    ).first()

    # 8.55. BPE tokenizer: train merges on the cleaned train split (one
    # corpus scan + vocab-sized iterations), encode distinct words only
    from etl_world_banks_with_python_and_postgresql_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
    )

    merges = bpe_train(train, n_merges=16)
    bpe_stats = bpe_segment(train, merges).agg(
        F.sum("n_bpe_tokens").alias("t")
    ).first()

    # 8.6. training ORDER: proportional source interleave (stride
    # scheduling; every prefix tracks the 3:2:1 mix) then a seeded epoch
    # shuffle -- (shard, pos) is the epoch's read order, reproducible
    # bit-for-bit from the seed
    mix = stride_interleave(train, weights={"src1": 3, "src2": 2, "src3": 1})
    epoch = epoch_shuffle(train, seed=0, n_shards=8)

    # 9. retrieval-style chunking of the train split (map-only fan-out)
    chunks = chunk_token_windows(
        docs.filter(F.col("split") == "train"), window=64, stride=48
    )

    # 10-11. token-budget shard manifest of the train split (z91 shape):
    # the pre-tokenization sharding step, on the scalable-cumsum primitive
    from etl_world_banks_with_python_and_postgresql_spark.operators.prefix import (
        token_shards,
    )

    shards = token_shards(
        docs.filter(F.col("split") == "train").select(
            "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
        ),
        budget_tokens=20000,
    )

    print(
        json.dumps(
            {
                "stage_counts": stage,
                "train_bins": bins.count(),
                "train_chunks": chunks.count(),
                "train_shards": shards.count(),
                "vocab_size": vocab.count(),
                "bpe_merges": len(merges),
                "bpe_tokens": int(bpe_stats["t"]),
                "oov_rate": round(oov["oov"] / max(oov["tok"], 1), 4),
                "interleaved_docs": mix.count(),
                "epoch_shards": epoch.select("shard").distinct().count(),
            }
        )
    )
    for r in manifest.collect():
        print(json.dumps(r.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
