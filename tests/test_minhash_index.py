"""At-rest MinHash-LSH dedup index (operators/dedup.py) -- the lexical
twin of the IVF (similarity) and posting (text) indexes.

Load-bearing properties:
  * probe == in-memory minhash_novel, value-for-value (the disk
    roundtrip is value-transparent);
  * append == rebuild (per-doc index rows are pure content functions);
  * both probe reads partition-prune to the buckets the batch hits;
  * crash ordering (sets before bands) degrades to "not yet indexed",
    and re-appending after a torn append is probe-safe;
  * the streaming sink screens batches against the growing index and
    absorbs replays by content.

Reference provenance: the reference repo has no dedup path; this
extends the LLM-pipeline dedup family (SURVEY.md north-star) with the
at-rest incremental-ingest shape its docstrings promised
(dedup.minhash_novel "a real deployment materializes it once").
"""

import re

from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.operators import dedup
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_minhash_index_probe_matches_inmemory(spark, tmp_path):
    docs = load(spark, "documents", SF)
    corpus = docs.filter(F.col("source").isin("src0", "src1"))
    batch = docs.filter(~F.col("source").isin("src0", "src1"))
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(corpus, path)
    got = _ids(dedup.minhash_novel_indexed(spark, batch, path, threshold=0.5))
    want = _ids(dedup.minhash_novel(batch, corpus, threshold=0.5))
    assert got == want
    assert 0 < len(got) < batch.count()  # non-degenerate both ways


def test_minhash_index_append_equals_rebuild(spark, tmp_path):
    docs = load(spark, "documents", SF)
    corpus = docs.filter(F.col("source").isin("src0", "src1"))
    batch = docs.filter(~F.col("source").isin("src0", "src1"))
    grown = str(tmp_path / "grown")
    dedup.write_minhash_index(docs.filter(F.col("source") == "src0"), grown)
    dedup.append_minhash_index(docs.filter(F.col("source") == "src1"), grown)
    rebuilt = str(tmp_path / "rebuilt")
    dedup.write_minhash_index(corpus, rebuilt)
    a = _ids(dedup.minhash_novel_indexed(spark, batch, grown, threshold=0.5))
    b = _ids(dedup.minhash_novel_indexed(spark, batch, rebuilt, threshold=0.5))
    assert a == b
    from etl_world_banks_with_python_and_postgresql_spark.committer import load_json

    assert load_json(grown + "/_minhash_stats.json")[0]["n_docs"] == corpus.count()


def test_minhash_index_probe_prunes_both_reads(spark, tmp_path):
    """A one-doc probe touches at most n_bands of the band buckets and
    only the candidate docs' set buckets -- both scans must carry bucket
    PartitionFilters (the at-rest read-fraction claim)."""
    docs = load(spark, "documents", SF)
    path = str(tmp_path / "idx")
    corpus = docs.filter(F.col("source") == "src0")
    dedup.write_minhash_index(corpus, path, n_buckets=16)
    # probe with an indexed doc itself: guaranteed band candidates, so
    # the sets scan survives into the plan (a probe with NO candidates
    # legitimately folds isin([]) to an empty relation and reads nothing)
    one = corpus.orderBy("doc_id").limit(1)
    out = dedup.minhash_novel_indexed(
        spark, one, path, threshold=0.0, unpersist_after=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    in_lists = re.findall(r"bucket#\d+L? IN \(([0-9,]+)\)", plan)
    eq_lists = re.findall(r"bucket#\d+L? = (\d+)", plan)  # IN (x) folds to =
    assert len(in_lists) + len(eq_lists) == 2, plan  # bands scan + sets scan
    for lst in in_lists:
        assert len(lst.split(",")) < 16
    # bands probe: one doc emits k/band_size = 4 bands -> <= 4 buckets
    band_buckets = [len(l.split(",")) for l in in_lists] + [1] * len(eq_lists)
    assert min(band_buckets) <= 4


def test_minhash_index_torn_append_degrades_then_reappend_is_safe(
    spark, tmp_path
):
    """Crash between the sets and bands writes = batch not yet indexed
    (band rows are what create candidates); re-appending the same batch
    afterward double-stores rows but probe results stay correct."""
    docs = load(spark, "documents", SF)
    seed = docs.filter(F.col("source") == "src0")
    batch = docs.filter(F.col("source") == "src1")
    probe = docs.filter(F.col("source") == "src2")
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(seed, path)
    before = _ids(dedup.minhash_novel_indexed(spark, probe, path, threshold=0.5))

    # simulate the torn append: sets written, bands + stats not
    orig = dedup._minhash_band_rows
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("simulated crash before bands write")

    dedup._minhash_band_rows = boom
    try:
        try:
            dedup.append_minhash_index(batch, path)
        except RuntimeError as e:
            assert "simulated" in str(e)
    finally:
        dedup._minhash_band_rows = orig
    assert calls["n"] == 1
    # torn append is invisible to probes (batch simply not indexed yet)
    assert _ids(
        dedup.minhash_novel_indexed(spark, probe, path, threshold=0.5)
    ) == before

    # re-append for real: results equal a clean rebuild over seed+batch,
    # despite the orphaned duplicate set rows from the torn attempt
    dedup.append_minhash_index(batch, path)
    rebuilt = str(tmp_path / "rebuilt")
    dedup.write_minhash_index(seed.unionByName(batch), rebuilt)
    assert _ids(
        dedup.minhash_novel_indexed(spark, probe, path, threshold=0.5)
    ) == _ids(dedup.minhash_novel_indexed(spark, probe, rebuilt, threshold=0.5))


def test_streaming_minhash_novelty_sink(spark, tmp_path):
    """Continuous document ingestion with lexical near-dup screening:
    near-dups of indexed docs are dropped, in-batch near-dups keep the
    lowest id, the index grows O(batch), replays absorb by content."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_minhash_novelty_sink,
    )

    schema = "doc_id long, text string"
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different material about spark shuffle partitions here"
    c = "yet another unrelated passage concerning parquet footer statistics"
    seed = spark.createDataFrame([(0, a)], schema)
    index = str(tmp_path / "mh")
    dedup.write_minhash_index(seed, index)

    src = str(tmp_path / "in")
    # 10: near-dup of indexed 0 (last word changed, J=0.82) -> dropped
    # 11: fresh (kept); 12/13: in-batch near-dup pair (J=0.5) -> 12 kept
    spark.createDataFrame(
        [
            (10, a.replace("again and again", "again and anew")),
            (11, b),
            (12, c),
            (13, c.replace("another", "a")),
        ],
        schema,
    ).write.parquet(src)

    def run_once(i):
        stream = spark.readStream.schema(seed.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_minhash_novelty_sink(index, threshold=0.5)
            )
            .option("checkpointLocation", str(tmp_path / f"ck{i}"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once(0)
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(index + "/sets").select("doc_id").collect()
    }
    assert ids == {0, 11, 12}

    # replay from a fresh checkpoint: every doc now matches the index
    run_once(1)
    assert spark.read.parquet(index + "/sets").select("doc_id").distinct().count() == 3


def test_compact_minhash_index_cleans_reappends_and_preserves_probes(
    spark, tmp_path
):
    """After a torn append + re-append (duplicate rows, double-counted
    n_docs), compaction removes exactly the never-observable duplicates,
    resets n_docs to the true distinct count, and leaves probe results
    bit-identical."""
    from etl_world_banks_with_python_and_postgresql_spark.committer import load_json

    docs = load(spark, "documents", SF)
    seed = docs.filter(F.col("source") == "src0")
    batch = docs.filter(F.col("source") == "src1")
    probe = docs.filter(F.col("source") == "src2")
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(seed, path)
    dedup.append_minhash_index(batch, path)
    dedup.append_minhash_index(batch, path)  # the documented re-append case
    assert load_json(path + "/_minhash_stats.json")[0]["n_docs"] == 75  # 25x3

    before = _ids(dedup.minhash_novel_indexed(spark, probe, path, threshold=0.5))
    out = dedup.compact_minhash_index(spark, path)
    assert out["n_docs"] == 50  # true distinct docs
    assert out["set_rows_removed"] == 25  # the duplicated batch
    assert out["band_rows_removed"] == 25 * 4  # 4 bands per doc
    assert load_json(path + "/_minhash_stats.json")[0]["n_docs"] == 50
    assert _ids(
        dedup.minhash_novel_indexed(spark, probe, path, threshold=0.5)
    ) == before
    # idempotent: a second compaction removes nothing
    again = dedup.compact_minhash_index(spark, path)
    assert again["set_rows_removed"] == 0 and again["band_rows_removed"] == 0


def test_z115_probe_cache_invalidates_on_data_change(spark, tmp_path):
    """The cached-index seam behind z115: a valid marker is reused, a
    changed documents.parquet fingerprint forces a rebuild, and a
    missing marker (half-built index) never counts as a cache hit."""
    import os

    from etl_world_banks_with_python_and_postgresql_spark.committer import load_json
    from etl_world_banks_with_python_and_postgresql_spark.plans.dedup_sim import (
        _z_minhash_index_cached,
        _z_minhash_index_path,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}", f"text number {i} alpha beta gamma", "en", 30)
         for i in range(30)],
        "doc_id long, source string, text string, lang string, n_chars long",
    )
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    path = _z_minhash_index_cached(spark, sf)
    assert path == _z_minhash_index_path(sf)
    marker1, _ = load_json(os.path.join(path, "_z_cache.json"))
    assert marker1 is not None
    # second call: cache hit, marker byte-identical (no rebuild)
    _z_minhash_index_cached(spark, sf)
    marker2, _ = load_json(os.path.join(path, "_z_cache.json"))
    assert marker2 == marker1
    # touch the parquet -> fingerprint changes -> rebuild
    pq = f"{sf}/documents.parquet"
    os.utime(pq, ns=(os.stat(pq).st_mtime_ns + 10**9,) * 2)
    _z_minhash_index_cached(spark, sf)
    marker3, _ = load_json(os.path.join(path, "_z_cache.json"))
    assert marker3["fingerprint"] != marker1["fingerprint"]
    # missing marker (simulated torn build) -> rebuild restores it
    os.remove(os.path.join(path, "_z_cache.json"))
    _z_minhash_index_cached(spark, sf)
    marker4, _ = load_json(os.path.join(path, "_z_cache.json"))
    assert marker4 == marker3


# ---------------------------------------------------------------------
# At-rest winnowing-fingerprint index (the MOSS twin)
# ---------------------------------------------------------------------


def test_winnow_index_append_equals_rebuild(spark, tmp_path):
    docs = load(spark, "documents", SF)
    src0 = docs.filter(F.col("source") == "src0")
    src1 = docs.filter(F.col("source") == "src1")
    batch = docs.filter(F.col("source") == "src2")

    p_inc = str(tmp_path / "inc")
    dedup.write_winnow_index(src0, p_inc)
    dedup.append_winnow_index(src1, p_inc)
    p_full = str(tmp_path / "full")
    dedup.write_winnow_index(
        docs.filter(F.col("source").isin("src0", "src1")), p_full
    )
    got_inc = _ids(
        dedup.winnow_novel_indexed(spark, batch, p_inc, min_shared=1)
    )
    got_full = _ids(
        dedup.winnow_novel_indexed(spark, batch, p_full, min_shared=1)
    )
    assert got_inc == got_full
    assert 0 < len(got_inc) < batch.count()  # non-degenerate both ways


def test_winnow_index_probe_prunes_read_and_survives_reappend(
    spark, tmp_path
):
    import os

    docs = load(spark, "documents", SF)
    corpus = docs.filter(F.col("source").isin("src0", "src1"))
    batch = docs.filter(F.col("source") == "src2").limit(3)
    path = str(tmp_path / "idx")
    dedup.write_winnow_index(corpus, path, n_buckets=32)
    # a 3-doc probe touches a strict subset of the 32 fingerprint buckets
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        _winnow_fp_rows,
    )

    probed = {
        r["bucket"]
        for r in _winnow_fp_rows(batch, 3, 4, 32, "text", "doc_id")
        .select("bucket")
        .distinct()
        .collect()
    }
    on_disk = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(path, "fps"))
        if d.startswith("bucket=")
    }
    assert probed < on_disk  # strict subset: the probe prunes
    before = _ids(
        dedup.winnow_novel_indexed(spark, batch, path, min_shared=1)
    )
    # re-appending the same batch twice is probe-safe (distinct counts)
    extra = docs.filter(F.col("source") == "src3")
    dedup.append_winnow_index(extra, path)
    dedup.append_winnow_index(extra, path)
    p_ref = str(tmp_path / "ref")
    dedup.write_winnow_index(
        docs.filter(F.col("source").isin("src0", "src1", "src3")), p_ref
    )
    got = _ids(dedup.winnow_novel_indexed(spark, batch, path, min_shared=1))
    want = _ids(dedup.winnow_novel_indexed(spark, batch, p_ref, min_shared=1))
    assert got == want
    assert set(got) <= set(before)  # a larger corpus can only catch more


def test_streaming_winnow_novelty_sink(spark, tmp_path):
    """Winnowing novelty stream: near-dups of indexed docs dropped,
    in-batch near-dups keep the lowest id, the index grows O(batch),
    replays absorb by content."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_winnow_novelty_sink,
    )

    schema = "doc_id long, text string"
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "completely different material about spark shuffle partitions and adaptive execution strategies"
    c = "yet another unrelated passage concerning parquet footer statistics and manifest pruning"
    seed = spark.createDataFrame([(0, a)], schema)
    index = str(tmp_path / "wn")
    dedup.write_winnow_index(seed, index)

    src = str(tmp_path / "in")
    # 10: shares a long run with indexed 0 -> dropped
    # 11: fresh (kept); 12/13: in-batch near-dup pair -> 12 kept
    spark.createDataFrame(
        [
            (10, a.replace("today", "tomorrow")),
            (11, b),
            (12, c),
            (13, c.replace("yet another", "one more")),
        ],
        schema,
    ).write.parquet(src)

    def run_once(i):
        stream = spark.readStream.schema(seed.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_winnow_novelty_sink(index, min_shared=2)
            )
            .option("checkpointLocation", str(tmp_path / f"ck{i}"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once(0)
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(index + "/fps").select("doc_id").collect()
    }
    assert ids == {0, 11, 12}
    # replay from a fresh checkpoint: absorbed by content, nothing new
    run_once(1)
    ids2 = {
        r["doc_id"]
        for r in spark.read.parquet(index + "/fps").select("doc_id").collect()
    }
    assert ids2 == {0, 11, 12}


def test_compact_winnow_index_cleans_reappends_and_preserves_probes(
    spark, tmp_path
):
    from etl_world_banks_with_python_and_postgresql_spark.committer import load_json

    docs = load(spark, "documents", SF)
    seed = docs.filter(F.col("source") == "src0")
    batch = docs.filter(F.col("source") == "src1")
    probe = docs.filter(F.col("source") == "src2")
    path = str(tmp_path / "idx")
    dedup.write_winnow_index(seed, path)
    dedup.append_winnow_index(batch, path)
    dedup.append_winnow_index(batch, path)  # simulated re-append
    before = _ids(dedup.winnow_novel_indexed(spark, probe, path, min_shared=1))
    res = dedup.compact_winnow_index(spark, path)
    assert res["fp_rows_removed"] > 0
    true_docs = seed.count() + batch.count()
    assert res["n_docs"] == true_docs
    assert load_json(path + "/_winnow_stats.json")[0]["n_docs"] == true_docs
    after = _ids(dedup.winnow_novel_indexed(spark, probe, path, min_shared=1))
    assert after == before
