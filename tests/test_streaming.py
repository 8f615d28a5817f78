"""Structured Streaming smoke tests: file source over TESTDATA parquet ->
windowed/session aggregations -> memory sink, plus the foreachBatch merge.
"""

import os
from datetime import date, datetime

from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark import schemas
from etl_world_banks_with_python_and_postgresql_spark.sources import sinks
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load
from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
    session_event_windows,
    streaming_merge_sink,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _event_stream(spark, tmp_path):
    # re-materialize events as a micro-batch-friendly parquet dir with
    # micros timestamps (the raw TESTDATA file carries nanos)
    src = str(tmp_path / "events_in")
    load(spark, "events", SF).write.parquet(src)
    schema = load(spark, "events", SF).schema
    return spark.readStream.schema(schema).parquet(src)


def test_windowed_counts_match_batch(spark, tmp_path):
    stream = windowed_event_counts(_event_stream(spark, tmp_path))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT sum(n) AS total FROM win_out").collect()[0]["total"]
    # append mode emits only watermark-closed windows; all but the last
    # window(s) close, so the stream total is close to (and bounded by) batch
    batch_total = load(spark, "events", SF).count()
    assert got is not None and 0 < got <= batch_total
    assert spark.sql("SELECT * FROM win_out").columns == [
        "win_start",
        "event_type",
        "n",
        "total_value",
    ]


def test_session_windows_stream(spark, tmp_path):
    stream = session_event_windows(_event_stream(spark, tmp_path))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT count(*) AS n FROM sess_out").collect()[0]["n"]
    assert rows > 0


def test_foreachbatch_merge(spark, tmp_path):
    target_path = str(tmp_path / "wb_target")
    batch_src = str(tmp_path / "batches")
    os.makedirs(batch_src)

    b1 = spark.createDataFrame(
        [(f"Bank {c}", 100.0 + i, date(2024, 7, 1), "ignored") for i, c in enumerate("ABC")],
        schemas.WORLD_BANK_BATCH,
    )
    b1.write.parquet(batch_src, mode="append")

    stream = spark.readStream.schema(schemas.WORLD_BANK_BATCH).parquet(batch_src)
    apply_batch = streaming_merge_sink(
        read_target=lambda: sinks.read_snapshot(spark, target_path, schemas.WORLD_BANK_DATA),
        write_target=lambda df: sinks.write_snapshot(df, target_path),
        keys=["bank_name"],
        compare_col="market_cap_usd",
        set_cols=["market_cap_usd", "last_modified_date"],
        table_name="world_bank_data",
        id_col="world_bank_id",
        now=datetime(2024, 8, 1),
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    snap = spark.read.parquet(target_path)
    assert snap.count() == 3
    assert snap.filter(F.col("active")).count() == 3
    assert {r["bank_name"] for r in snap.collect()} == {"Bank A", "Bank B", "Bank C"}


def test_foreachbatch_merge_multi_epoch(spark, tmp_path):
    """Two micro-batches through one checkpointed stream: epoch 0 inserts,
    epoch 1 updates/noops -- the SCD transitions must hold across epochs."""
    target_path = str(tmp_path / "wb_target2")
    batch_src = str(tmp_path / "batches2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(batch_src)

    def start():
        stream = spark.readStream.schema(schemas.WORLD_BANK_BATCH).parquet(batch_src)
        apply_batch = streaming_merge_sink(
            read_target=lambda: sinks.read_snapshot(
                spark, target_path, schemas.WORLD_BANK_DATA
            ),
            write_target=lambda df: sinks.write_snapshot(df, target_path),
            keys=["bank_name"],
            compare_col="market_cap_usd",
            set_cols=["market_cap_usd", "last_modified_date"],
            table_name="world_bank_data",
            id_col="world_bank_id",
            now=datetime(2024, 8, 1),
        )
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = spark.createDataFrame(
        [("Bank A", 100.0, date(2024, 7, 1), "x"), ("Bank B", 200.0, date(2024, 7, 1), "x")],
        schemas.WORLD_BANK_BATCH,
    )
    b1.write.parquet(batch_src, mode="append")
    start()
    snap1 = {r["bank_name"]: r for r in spark.read.parquet(target_path).collect()}
    assert snap1["Bank A"]["batch_id"] == "epoch-0"
    assert snap1["Bank A"]["updated_at"] is None

    b2 = spark.createDataFrame(
        [("Bank A", 150.0, date(2024, 7, 2), "x"), ("Bank B", 200.0, date(2024, 7, 2), "x")],
        schemas.WORLD_BANK_BATCH,
    )
    b2.write.parquet(batch_src, mode="append")
    start()
    snap2 = {r["bank_name"]: r for r in spark.read.parquet(target_path).collect()}
    assert len(snap2) == 2
    assert snap2["Bank A"]["market_cap_usd"] == 150.0  # updated in epoch 1
    assert snap2["Bank A"]["batch_id"] == "epoch-1"
    assert snap2["Bank A"]["updated_at"] is not None
    assert snap2["Bank B"]["market_cap_usd"] == 200.0  # noop keeps epoch-0
    assert snap2["Bank B"]["batch_id"] == "epoch-0"


def test_file_stream_source_and_kafka_gate(spark, tmp_path):
    from etl_world_banks_with_python_and_postgresql_spark.streaming.sources import (
        file_stream,
        kafka_available,
        kafka_stream,
    )

    src = str(tmp_path / "fs")
    ev = load(spark, "events", SF).select("event_id", "user_id", "value")
    ev.write.parquet(src)
    stream = file_stream(spark, src, ev.schema, max_files_per_trigger=2)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("fs_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT count(*) n FROM fs_out").collect()[0]["n"] == ev.count()

    if not kafka_available(spark):
        import pytest

        with pytest.raises(RuntimeError, match="Kafka connector"):
            kafka_stream(spark, "localhost:9092", "t")


def test_event_time_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join == the same join run in batch."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        event_time_join,
    )

    ev = load(spark, "events", SF)
    purchases_b = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", "event_id"
    )
    clicks_b = ev.filter("event_type = 'click'").select("user_id", "ts", "event_id")

    psrc, csrc = str(tmp_path / "p"), str(tmp_path / "c")
    purchases_b.write.parquet(psrc)
    clicks_b.write.parquet(csrc)
    p_stream = spark.readStream.schema(purchases_b.schema).parquet(psrc)
    c_stream = spark.readStream.schema(clicks_b.schema).parquet(csrc)

    joined = event_time_join(p_stream, c_stream, key="user_id", max_delay="1 hour")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("etj_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], str(r["l_ts"]), r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM etj_out").collect()
    }

    expect_df = event_time_join(purchases_b, clicks_b, key="user_id", max_delay="1 hour")
    expect = {
        (r["user_id"], str(r["l_ts"]), r["l_event_id"], r["r_event_id"])
        for r in expect_df.collect()
    }
    # inner stream-stream join with availableNow processes everything;
    # results must match the batch join exactly
    assert got == expect
    assert len(got) > 0


def test_event_time_join_left_outer(spark, tmp_path):
    """Left-outer stream-stream join: unmatched left rows must surface with
    NULL right columns once the watermark passes their join horizon."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        event_time_join,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    t0 = datetime(2024, 8, 1, 12, 0, 0)
    ldf = spark.createDataFrame(
        [(1, t0, "buy"), (2, t0, "buy")], "key int, ts timestamp, act string"
    )
    # key 1 has a click 10 min earlier; key 2 has none
    rdf = spark.createDataFrame(
        [(1, datetime(2024, 8, 1, 11, 50, 0), "click")],
        "key int, ts timestamp, src string",
    )
    ldf.write.parquet(lsrc)
    rdf.write.parquet(rsrc)
    # sentinel second files push the watermark far past t0 so outer rows emit
    late = datetime(2024, 8, 2, 12, 0, 0)
    spark.createDataFrame([(99, late, "x")], "key int, ts timestamp, act string").write.parquet(lsrc, mode="append")
    spark.createDataFrame([(99, late, "x")], "key int, ts timestamp, src string").write.parquet(rsrc, mode="append")

    ls = spark.readStream.schema(ldf.schema).option("maxFilesPerTrigger", 1).parquet(lsrc)
    rs = spark.readStream.schema(rdf.schema).option("maxFilesPerTrigger", 1).parquet(rsrc)
    joined = event_time_join(
        ls, rs, key="key", max_delay="1 hour", watermark="30 minutes", how="left_outer"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("lo_join")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r["key"]: r for r in spark.sql("SELECT * FROM lo_join").collect()}
    assert rows[1]["r_src"] == "click"
    assert 2 in rows, "unmatched left row never emitted (outer state stuck)"
    assert rows[2]["r_src"] is None and rows[2]["r_ts"] is None


def test_session_enrichment_stateful(spark, tmp_path):
    """applyInPandasWithState gap sessions: in-gap events extend, out-of-gap
    events close + reopen, and event-time timeout frees state."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.stateful import (
        session_enrichment,
    )

    src = str(tmp_path / "ev")
    t = lambda m: datetime(2024, 8, 1, 12, m, 0)  # noqa: E731
    # user 7: two events 5 min apart (one session), then one 90 min later
    # (closes it, opens a second); user 8: single event
    batch1 = [(7, t(0), 1.0), (7, t(5), 2.0), (8, t(1), 5.0)]
    spark.createDataFrame(batch1, "user_id long, ts timestamp, value double").write.parquet(src)
    spark.createDataFrame(
        [(7, datetime(2024, 8, 1, 13, 35, 0), 4.0)],
        "user_id long, ts timestamp, value double",
    ).write.parquet(src, mode="append")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    q = (
        session_enrichment(stream, gap_minutes=30)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_enrich")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sess_enrich ORDER BY user_id, session_start").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 7's first session: 2 events, total 3.0, eventually closed
    u7_closed = [r for r in by_user[7] if r["closed"]]
    assert any(r["n_events"] == 2 and r["total_value"] == 3.0 for r in u7_closed)
    # user 7's second session opened with the late event
    u7_open = [r for r in by_user[7] if not r["closed"]]
    assert any(r["n_events"] == 1 and r["total_value"] == 4.0 for r in u7_open)
    # user 8 has a single-event session
    assert any(r["n_events"] == 1 and r["total_value"] == 5.0 for r in by_user[8])


def test_foreachbatch_incremental_sink(spark, tmp_path):
    """Streaming ingestion through IncrementalTable: two epochs (insert,
    then update/noop) land as O(|batch|) deltas; final state matches the
    SCD semantics and replaying the stream from its checkpoint is a no-op."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (
        IncrementalTable,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_incremental_sink,
    )

    batch_src = str(tmp_path / "inc_batches")
    ckpt = str(tmp_path / "inc_ckpt")
    os.makedirs(batch_src)
    table = IncrementalTable(str(tmp_path / "inc_tbl"), id_col="world_bank_id")

    def start():
        stream = spark.readStream.schema(schemas.WORLD_BANK_BATCH).parquet(batch_src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_incremental_sink(
                    table,
                    schemas.WORLD_BANK_DATA,
                    keys=["bank_name"],
                    compare_col="market_cap_usd",
                    set_cols=["market_cap_usd", "last_modified_date"],
                    table_name="world_bank_data",
                    now=datetime(2024, 8, 1),
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [("Bank A", 100.0, date(2024, 7, 1), "x"), ("Bank B", 200.0, date(2024, 7, 1), "x")],
        schemas.WORLD_BANK_BATCH,
    ).write.parquet(batch_src, mode="append")
    start()
    spark.createDataFrame(
        [("Bank A", 150.0, date(2024, 7, 2), "x"), ("Bank B", 200.0, date(2024, 7, 2), "x")],
        schemas.WORLD_BANK_BATCH,
    ).write.parquet(batch_src, mode="append")
    start()

    state = table.read(spark, schemas.WORLD_BANK_DATA)
    rows = {r["bank_name"]: r for r in state.collect()}
    assert rows["Bank A"]["market_cap_usd"] == 150.0  # updated in epoch 1
    assert rows["Bank A"]["batch_id"] == "epoch-1"
    assert rows["Bank B"]["market_cap_usd"] == 200.0  # noop keeps epoch-0 id
    assert rows["Bank B"]["batch_id"] == "epoch-0"
    assert state.count() == 2

    # delta-log shape: one O(|batch|) delta per epoch, no base rewrite yet
    m = table._load_manifest()
    assert len(m["deltas"]) == 2 and m["base"] is None

    # replay with no new data: idempotent, state unchanged
    start()
    assert state_eq(table.read(spark, schemas.WORLD_BANK_DATA), state)


def state_eq(a, b):
    cols = sorted(a.columns)
    return {tuple(r[c] for c in cols) for r in a.collect()} == {
        tuple(r[c] for c in cols) for r in b.collect()
    }


def test_event_time_join_full_outer(spark, tmp_path):
    """FULL outer stream-stream join: unmatched rows on BOTH sides must
    emit with NULLs for the other side once the watermark passes their
    join horizon (Spark supports this only because both inputs carry
    watermarks and the join condition bounds event time -- state stays
    O(rate x delay))."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        event_time_join,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    t0 = datetime(2024, 8, 1, 12, 0, 0)
    # key 1: matched; key 2: left-only; key 3: right-only
    ldf = spark.createDataFrame(
        [(1, t0, "buy"), (2, t0, "buy")], "key int, ts timestamp, act string"
    )
    rdf = spark.createDataFrame(
        [(1, datetime(2024, 8, 1, 11, 50, 0), "click"),
         (3, datetime(2024, 8, 1, 11, 55, 0), "click")],
        "key int, ts timestamp, src string",
    )
    ldf.write.parquet(lsrc)
    rdf.write.parquet(rsrc)
    late = datetime(2024, 8, 2, 12, 0, 0)
    spark.createDataFrame([(99, late, "x")], "key int, ts timestamp, act string").write.parquet(lsrc, mode="append")
    spark.createDataFrame([(99, late, "x")], "key int, ts timestamp, src string").write.parquet(rsrc, mode="append")

    ls = spark.readStream.schema(ldf.schema).option("maxFilesPerTrigger", 1).parquet(lsrc)
    rs = spark.readStream.schema(rdf.schema).option("maxFilesPerTrigger", 1).parquet(rsrc)
    joined = event_time_join(
        ls, rs, key="key", max_delay="1 hour", watermark="30 minutes", how="full_outer"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("fo_join")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r["key"]: r for r in spark.sql("SELECT * FROM fo_join").collect()}
    assert rows[1]["l_act"] == "buy" and rows[1]["r_src"] == "click"
    assert 2 in rows and rows[2]["r_src"] is None and rows[2]["r_ts"] is None
    assert 3 in rows, "unmatched RIGHT row never emitted (full-outer state stuck)"
    assert rows[3]["l_act"] is None and rows[3]["l_ts"] is None
    assert rows[3]["r_src"] == "click"


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: re-sends of the same key across
    micro-batches inside the watermark horizon collapse to ONE output row
    (state is evicted after the horizon -- the bounded-state contract that
    makes dedup possible at ingest scale at all)."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_dedup,
    )

    src = str(tmp_path / "in")
    t0 = datetime(2024, 8, 1, 12, 0, 0)
    schema_str = "event_id int, ts timestamp, v string"
    # batch 1: ids 1, 2; batch 2 (separate file): id 1 re-sent 5 min later
    spark.createDataFrame([(1, t0, "a"), (2, t0, "b")], schema_str).write.parquet(src)
    spark.createDataFrame(
        [(1, datetime(2024, 8, 1, 12, 5, 0), "a-dup"), (3, t0, "c")], schema_str
    ).write.parquet(src, mode="append")

    stream = spark.readStream.schema(
        spark.createDataFrame([], schema_str).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    deduped = streaming_dedup(stream, keys=["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT event_id, count(*) AS n FROM dedup_out GROUP BY event_id").collect()
    counts = {r["event_id"]: r["n"] for r in out}
    assert counts == {1: 1, 2: 1, 3: 1}, counts


def test_event_time_join_per_side_watermarks(spark, tmp_path):
    """Asymmetric watermark delays: a tight left watermark + loose right
    watermark must still produce the exact batch-join result when all data
    is on time (the global watermark is the min across sides)."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        event_time_join,
    )

    lsrc, rsrc = str(tmp_path / "al"), str(tmp_path / "ar")
    t0 = datetime(2024, 8, 1, 12, 0, 0)
    ldf = spark.createDataFrame(
        [(1, t0, "buy"), (2, t0, "buy"), (3, t0, "buy")],
        "key int, ts timestamp, act string",
    )
    rdf = spark.createDataFrame(
        [
            (1, datetime(2024, 8, 1, 11, 50, 0), "click"),   # within 1h
            (2, datetime(2024, 8, 1, 10, 30, 0), "click"),   # too old
            (1, datetime(2024, 8, 1, 11, 58, 0), "click2"),  # second match
        ],
        "key int, ts timestamp, src string",
    )
    ldf.write.parquet(lsrc)
    rdf.write.parquet(rsrc)
    ls = spark.readStream.schema(ldf.schema).parquet(lsrc)
    rs = spark.readStream.schema(rdf.schema).parquet(rsrc)
    joined = event_time_join(
        ls,
        rs,
        key="key",
        max_delay="1 hour",
        left_watermark="5 minutes",
        right_watermark="3 hours",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("asym_join")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["key"], r["r_src"]) for r in spark.sql("SELECT * FROM asym_join").collect()
    )
    assert got == [(1, "click"), (1, "click2")]


def test_state_metrics_report_eviction(spark, tmp_path):
    """state_metrics must surface live state totals and watermark/TTL
    evictions for a stateful query (session_enrichment with event-time
    timeout): after a far-future event pushes the watermark, earlier
    per-user session state is removed."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.stateful import (
        session_enrichment,
        state_metrics,
    )

    src = str(tmp_path / "ev_m")
    t = lambda m: datetime(2024, 8, 1, 12, m, 0)  # noqa: E731
    spark.createDataFrame(
        [(7, t(0), 1.0), (8, t(1), 5.0)],
        "user_id long, ts timestamp, value double",
    ).write.parquet(src)
    # far-future event: watermark jumps a day, timing out users 7 and 8
    spark.createDataFrame(
        [(9, datetime(2024, 8, 2, 12, 0, 0), 4.0)],
        "user_id long, ts timestamp, value double",
    ).write.parquet(src, mode="append")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    q = (
        session_enrichment(stream, gap_minutes=30)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_metrics")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    metrics = state_metrics(q)
    q.stop()
    assert len(metrics) == 1, metrics
    m = metrics[0]
    # users 7+8 evicted by the event-time timeout; user 9 still live
    assert m["rows_removed"] >= 2, m
    assert m["rows_total"] >= 1, m
    assert m["rows_updated"] >= 3, m
    # the timed-out sessions were emitted as closed records on eviction
    closed = {
        r["user_id"]
        for r in spark.sql(
            "SELECT user_id FROM sess_metrics WHERE closed"
        ).collect()
    }
    assert {7, 8} <= closed


def test_running_totals_v2_matches_legacy(spark, tmp_path):
    """transformWithStateInPandas (state API v2) must produce the same
    final running totals as the legacy applyInPandasWithState operator
    and as a plain batch aggregate."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.stateful import (
        HAS_TWS,
        running_user_totals_v2,
    )

    if not HAS_TWS:
        import pytest

        pytest.skip("transformWithState not available in this Spark build")

    src = str(tmp_path / "ev_v2")
    load(spark, "events", SF).write.parquet(src)
    schema = load(spark, "events", SF).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_user_totals_v2(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last emitted row per user == batch aggregate
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            """SELECT user_id, n_events, total_value
               FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                                  ORDER BY n_events DESC) rn
                     FROM tws_out) WHERE rn = 1"""
        ).collect()
    }
    expect = {
        r["user_id"]: (r["n"], r["t"])
        for r in load(spark, "events", SF)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("t")
        )
        .collect()
    }
    assert got == expect


def test_html_stream_source_incremental_offsets(spark, tmp_path):
    """Streaming Python DataSource: page snapshots dropped into a folder
    become micro-batches; offsets persist across restarts so a second
    availableNow run consumes ONLY the newly-dropped page."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.html_datasource import (
        HAS_SIMPLE_STREAM,
        register_html_source,
    )
    from tests.test_pipeline import banks_html

    if not HAS_SIMPLE_STREAM:
        import pytest

        pytest.skip("simple stream reader API unavailable")

    register_html_source(spark)
    pages = tmp_path / "pages"
    pages.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    (pages / "page1.html").write_text(
        banks_html([("Bank A", "100.0"), ("Bank B", "200.0")])
    )

    def run_once():
        stream = (
            spark.readStream.format("htmltable")
            .option("path", str(pages))
            .option("table_index", 2)
            .option("positions", "1,2")
            .option("columns", "bank_name,market_cap_usd")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    first = spark.read.parquet(out).collect()
    assert {(r["bank_name"], r["market_cap_usd"]) for r in first} == {
        ("Bank A", "100.0"),
        ("Bank B", "200.0"),
    }

    (pages / "page2.html").write_text(banks_html([("Bank C", "300.0")]))
    run_once()
    second = spark.read.parquet(out).collect()
    # page1 rows were NOT re-consumed: 2 + 1 rows total
    assert len(second) == 3
    assert ("Bank C", "300.0") in {
        (r["bank_name"], r["market_cap_usd"]) for r in second
    }


def test_streaming_novelty_sink(spark, tmp_path):
    """Continuous corpus ingestion with exact dedup: overlapping batches
    only ever append novel content; replays are absorbed."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_novelty_sink,
    )

    src = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema  # 3 dups 1 in-batch
    )
    b1.write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(b1.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(streaming_novelty_sink(corpus))
            .option("checkpointLocation", str(tmp_path / f"ck{run_once.i}"))
            .trigger(availableNow=True)
            .start()
        )
        run_once.i += 1
        q.processAllAvailable()
        q.stop()

    run_once.i = 0
    run_once()
    got = {r["text"] for r in spark.read.parquet(corpus).collect()}
    assert got == {"alpha", "beta"}
    assert spark.read.parquet(corpus).count() == 2  # in-batch dup dropped

    # second batch overlaps the corpus: only the novel doc lands
    spark.createDataFrame([(4, "beta"), (5, "gamma")], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert spark.read.parquet(corpus).count() == 3
    assert {r["text"] for r in spark.read.parquet(corpus).collect()} == {
        "alpha", "beta", "gamma",
    }

    # replay the whole input from a fresh checkpoint: nothing new appends
    run_once()
    assert spark.read.parquet(corpus).count() == 3


def test_sliding_window_stream_equals_batch(spark, tmp_path):
    """Hopping-window streaming agg == the z04 batch form on the same
    events (complete mode; the batch query is the oracle-gated one)."""
    from etl_world_banks_with_python_and_postgresql_spark.plans.queries import REGISTRY
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        windowed_event_counts,
    )

    src = str(tmp_path / "ev")
    ev = load(spark, "events", SF).select("ts", "event_type", "value")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        windowed_event_counts(stream, window="10 minutes", slide="5 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("slide_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["win_start"], r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in spark.sql("SELECT * FROM slide_out").collect()
    }
    batch = {
        (r["win_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in REGISTRY["z04_sliding_window"].fn(spark, SF).collect()
    }
    assert got == batch


def test_streaming_semantic_novelty_sink(spark, tmp_path):
    """Continuous embedding ingestion with semantic dedup against a
    growing IVF index: near-duplicate vectors (cos >= t) are dropped, the
    index grows O(batch), replays are absorbed."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
        write_ivf_index,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_semantic_novelty_sink,
    )

    def unit(i, dim=8):
        return [1.0 if j == i else 0.0 for j in range(dim)]

    def near(i, dim=8, eps=0.01):
        v = unit(i, dim)
        v[(i + 1) % dim] = eps
        return v

    schema = "vec_id long, embedding array<float>"
    # seed index: axes 0 and 1
    seed = spark.createDataFrame([(0, unit(0)), (1, unit(1))], schema)
    index = str(tmp_path / "ivf")
    write_ivf_index(seed, index, n_centroids=2)

    src = str(tmp_path / "in")
    # batch 1: a near-dup of axis 0 (dropped vs index), a fresh axis 2
    # (kept), an in-batch near-dup pair on axis 3 (one kept)
    spark.createDataFrame(
        [(10, near(0)), (11, unit(2)), (12, unit(3)), (13, near(3))], schema
    ).write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(seed.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_semantic_novelty_sink(index, threshold=0.9, n_probe=2)
            )
            .option("checkpointLocation", str(tmp_path / f"ck{run_once.i}"))
            .trigger(availableNow=True)
            .start()
        )
        run_once.i += 1
        q.processAllAvailable()
        q.stop()

    run_once.i = 0
    run_once()
    ids = {r["vec_id"] for r in spark.read.parquet(index).collect()}
    assert ids == {0, 1, 11, 12}  # 10 dup-vs-index, 13 dup-in-batch

    # replay from a fresh checkpoint: every vector now matches the index
    run_once()
    assert spark.read.parquet(index).count() == 4


def test_streaming_epochs_visible_in_change_feed(spark, tmp_path):
    """Streaming ingestion x CDF: each micro-batch epoch lands as its own
    commit in read_changes, so a downstream incremental consumer can sync
    per-epoch with O(changes) reads and exact commit attribution."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (
        IncrementalTable,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_incremental_sink,
    )

    batch_src = str(tmp_path / "cdf_batches")
    ckpt = str(tmp_path / "cdf_ckpt")
    os.makedirs(batch_src)
    table = IncrementalTable(str(tmp_path / "cdf_tbl"), id_col="world_bank_id")

    def start():
        stream = spark.readStream.schema(schemas.WORLD_BANK_BATCH).parquet(batch_src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_incremental_sink(
                    table,
                    schemas.WORLD_BANK_DATA,
                    keys=["bank_name"],
                    compare_col="market_cap_usd",
                    set_cols=["market_cap_usd", "last_modified_date"],
                    table_name="world_bank_data",
                    now=datetime(2024, 8, 1),
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [("Bank A", 100.0, date(2024, 7, 1), "x"), ("Bank B", 200.0, date(2024, 7, 1), "x")],
        schemas.WORLD_BANK_BATCH,
    ).write.parquet(batch_src, mode="append")
    start()
    seq1 = table._load_manifest()["seq"]
    spark.createDataFrame(
        [("Bank A", 150.0, date(2024, 7, 2), "x")],
        schemas.WORLD_BANK_BATCH,
    ).write.parquet(batch_src, mode="append")
    start()

    changes = table.read_changes(spark, schemas.WORLD_BANK_DATA, since_seq=0)
    got = {
        (r["_commit_seq"], r["bank_name"], r["batch_id"])
        for r in changes.collect()
    }
    # epoch 0 -> commit 1 wrote both banks; epoch 1 -> commit 2 wrote only
    # the updated Bank A, carrying the epoch lineage id
    assert got == {
        (1, "Bank A", "epoch-0"),
        (1, "Bank B", "epoch-0"),
        (2, "Bank A", "epoch-1"),
    }
    # the consumer checkpoint pattern: only the new epoch after seq1
    tail = table.read_changes(spark, schemas.WORLD_BANK_DATA, since_seq=seq1)
    assert [(r["bank_name"], r["_change_type"]) for r in tail.collect()] == [
        ("Bank A", "upsert")
    ]


def test_cdf_stream_source_matches_batch_feed(spark, tmp_path):
    """readStream.format('incr_cdf') turns each committed delta into a
    micro-batch: availableNow drains the full history identically to
    read_changes, a later commit arrives as the NEXT micro-batch under
    the same checkpoint (offset = commit seq), and delete tombstones
    carry _change_type='delete'."""
    import pyspark.sql.types as T

    from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (
        IncrementalTable,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.cdf_source import (
        register_cdf_source,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    root = str(tmp_path / "tbl")
    t = IncrementalTable(root, id_col="id")
    t.write_delta(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    t.write_delta(spark.createDataFrame([(2, "b2")], schema))
    t.delete_keys(spark, schema, spark.createDataFrame([(1,)], "id long"))

    register_cdf_source(spark)
    got: list[tuple] = []

    def sink(batch_df, batch_id):
        got.extend(
            (r["id"], r["val"], r["_change_type"], r["_commit_seq"])
            for r in batch_df.collect()
        )

    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("incr_cdf")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    key = lambda r: (r[0], r[1] or "", r[2], r[3])
    expected = sorted(
        (
            (r["id"], r["val"], r["_change_type"], r["_commit_seq"])
            for r in t.read_changes(spark, schema, since_seq=0).collect()
        ),
        key=key,
    )
    assert sorted(got, key=key) == expected
    assert ("1", ) not in got  # sanity: tuples, not strings
    assert (1, None, "delete", 3) in got

    # a new commit under the SAME checkpoint yields only the new rows
    got.clear()
    t.write_delta(spark.createDataFrame([(4, "d")], schema))
    drain()
    assert sorted(got) == [(4, "d", "upsert", 4)]

    # schema sniffing picked the table's real columns + CDF pair
    cols = (
        spark.readStream.format("incr_cdf").option("path", root).load().columns
    )
    assert cols == ["id", "val", "_change_type", "_commit_seq"]


def test_streaming_posting_index_sink_exactly_once(spark, tmp_path):
    """Streamed batches keep the posting index retrieval-identical to a
    full rebuild; a replayed committed epoch is a no-op; a torn append
    (in-flight marker) raises instead of double-counting."""
    import json

    import pytest as _pytest

    from etl_world_banks_with_python_and_postgresql_spark.operators import text as T
    from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_posting_index_sink,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)

    idx = str(tmp_path / "idx")
    T.write_posting_index(seed, idx, n_buckets=16)
    sink = streaming_posting_index_sink(idx)
    sink(b1, 0)
    sink(b2, 1)
    sink(b1, 0)  # replayed committed epoch: must be absorbed

    rebuilt = str(tmp_path / "rebuilt")
    T.write_posting_index(docs, rebuilt, n_buckets=16)
    a = [tuple(r) for r in T.bm25_indexed(spark, idx, terms=["merge", "window"]).collect()]
    b = [tuple(r) for r in T.bm25_indexed(spark, rebuilt, terms=["merge", "window"]).collect()]
    assert a == b and len(a) > 0

    # torn append: simulate a crash between data append and ledger commit
    ledger = json.load(open(f"{idx}/_indexed_epochs.json"))
    ledger["in_flight"] = 7
    json.dump(ledger, open(f"{idx}/_indexed_epochs.json", "w"))
    with _pytest.raises(RuntimeError, match="torn append"):
        sink(b2, 8)


def test_streaming_materialized_view_via_cdf_and_apply_changes(spark, tmp_path):
    """The full CDC chain: an IncrementalTable's change feed streams
    through incr_cdf, each micro-batch is applied with apply_changes to
    a downstream materialized snapshot (foreachBatch), and after every
    drain the materialized view equals the source table's resolved
    state -- including across a checkpointed restart picking up only new
    commits. This is the incremental-materialized-view loop with Spark
    checkpointing owning progress."""
    import pyspark.sql.types as T

    from etl_world_banks_with_python_and_postgresql_spark.operators.diff import (
        apply_changes,
    )
    from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (
        IncrementalTable,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.cdf_source import (
        register_cdf_source,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    root = str(tmp_path / "src")
    mat = str(tmp_path / "mat")
    t = IncrementalTable(root, id_col="id")
    t.write_delta(spark.createDataFrame([(1, "a"), (2, "b")], schema))

    register_cdf_source(spark)

    def sink(batch_df, batch_id):
        import os

        if os.path.exists(mat):
            target = batch_df.sparkSession.read.parquet(mat)
        else:
            target = batch_df.sparkSession.createDataFrame([], schema)
        updated = apply_changes(
            target, batch_df, id_col="id"
        ).localCheckpoint()  # materialize BEFORE overwriting the input path
        updated.write.mode("overwrite").parquet(mat)

    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("incr_cdf")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def assert_synced():
        got = sorted(tuple(r) for r in spark.read.parquet(mat).collect())
        want = sorted(tuple(r) for r in t.read(spark, schema).collect())
        assert got == want, (got, want)

    drain()
    assert_synced()

    t.write_delta(spark.createDataFrame([(2, "b2"), (3, "c")], schema))
    t.delete_keys(spark, schema, spark.createDataFrame([(1,)], "id long"))
    drain()  # restart from checkpoint: only the two new commits replay
    assert_synced()


def test_streaming_join_view_equals_batch_join(spark, tmp_path):
    """Streaming IVM: the right side pre-ingested, the left side arriving
    as two availableNow epochs through foreachBatch -- the maintained view
    must equal the from-scratch batch join, each pair exactly once."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        IncrementalJoinView,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_join_view_sink,
    )

    src = str(tmp_path / "jv_left")
    ckpt = str(tmp_path / "jv_ckpt")
    os.makedirs(src)
    view = IncrementalJoinView(str(tmp_path / "jv"), key="k")

    right = spark.createDataFrame(
        [(1, "r1"), (2, "r2"), (1, "r3")], "k int, r string"
    )
    view.ingest_right(right)

    def drain():
        stream = spark.readStream.schema("k int, l string").parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_join_view_sink(view, side="left")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    left1 = spark.createDataFrame([(1, "a"), (3, "c")], "k int, l string")
    left1.write.parquet(src, mode="append")
    drain()
    left2 = spark.createDataFrame([(2, "b"), (1, "d")], "k int, l string")
    left2.write.parquet(src, mode="append")
    drain()

    got = sorted(
        tuple(r) for r in view.read(spark).select("k", "l", "r").collect()
    )
    want = sorted(
        tuple(r)
        for r in left1.unionByName(left2)
        .join(right, "k")
        .select("k", "l", "r")
        .collect()
    )
    assert got == want and len(got) == 5


def test_streaming_join_view_epoch_replay_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: after a crash between the view's
    ledger commit and the stream's checkpoint commit, Spark re-delivers
    the SAME epoch_id. The sink threads the epoch id through as the
    view's batch id (ADVICE r5), so the replay hits the [side, bid]
    ledger check and is a no-op -- no duplicated pairs."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        IncrementalJoinView,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_join_view_sink,
    )

    view = IncrementalJoinView(str(tmp_path / "jv"), key="k")
    view.ingest_right(spark.createDataFrame([(1, "r1")], "k int, r string"))
    apply_batch = streaming_join_view_sink(view, side="left")
    batch = spark.createDataFrame([(1, "l1")], "k int, l string")

    apply_batch(batch, 0)
    assert view.read(spark).count() == 1
    apply_batch(batch, 0)  # the replayed epoch: absorbed by the ledger
    assert view.read(spark).count() == 1
    apply_batch(batch, 1)  # a NEW epoch with equal rows is new data
    assert view.read(spark).count() == 2


def test_cdf_streams_maintain_join_view_across_restart(spark, tmp_path):
    """End-to-end streaming IVM (VERDICT r5 task #6): two IncrementalTable
    change feeds (readStream.format('incr_cdf')), each driving one side
    of an IncrementalJoinView through foreachBatch. After a second wave
    of commits and a RESTART from the same checkpoints, the maintained
    view must bit-match the from-scratch batch join of both tables."""
    import pyspark.sql.types as T

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        IncrementalJoinView,
    )
    from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (
        IncrementalTable,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.cdf_source import (
        register_cdf_source,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_join_view_sink,
    )

    register_cdf_source(spark)
    lschema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("l", T.StringType())]
    )
    rschema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("r", T.StringType())]
    )
    lroot, rroot = str(tmp_path / "ltbl"), str(tmp_path / "rtbl")
    lt = IncrementalTable(lroot, id_col="k")
    rt = IncrementalTable(rroot, id_col="k")
    view = IncrementalJoinView(str(tmp_path / "jv"), key="k")

    def cdf_sink(side):
        inner = streaming_join_view_sink(view, side=side)

        def apply_batch(bdf, eid):
            # insert-only composition: strip the CDF columns before the
            # IVM delta (updates/deletes belong to apply_changes)
            inner(
                bdf.filter("_change_type = 'upsert'").drop(
                    "_change_type", "_commit_seq"
                ),
                eid,
            )

        return apply_batch

    def drain(root, ckpt, side):
        q = (
            spark.readStream.format("incr_cdf")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(cdf_sink(side))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    lckpt, rckpt = str(tmp_path / "lckpt"), str(tmp_path / "rckpt")

    # wave 1: interleaved commits, then both streams drain
    lt.write_delta(spark.createDataFrame([(1, "l1"), (2, "l2")], lschema))
    rt.write_delta(spark.createDataFrame([(1, "r1"), (3, "r3")], rschema))
    drain(lroot, lckpt, "left")
    drain(rroot, rckpt, "right")

    # wave 2: more commits on both sides; RESTART from the checkpoints
    # (fresh query instances recover offsets and replay only the tail)
    # (insert-only composition: keys are append-only per table; an
    # upsert of an existing key belongs to the apply_changes topology)
    lt.write_delta(spark.createDataFrame([(3, "l3"), (4, "l4")], lschema))
    rt.write_delta(spark.createDataFrame([(2, "r2"), (4, "r4")], rschema))
    drain(lroot, lckpt, "left")
    drain(rroot, rckpt, "right")

    got = sorted(
        tuple(r) for r in view.read(spark).select("k", "l", "r").collect()
    )
    want = sorted(
        tuple(r)
        for r in lt.read(spark, lschema)
        .join(rt.read(spark, rschema), "k")
        .select("k", "l", "r")
        .collect()
    )
    assert got == want and len(got) == 4  # keys 1,2,3,4 all paired

    # a re-drain with NO new commits replays nothing (view unchanged)
    drain(lroot, lckpt, "left")
    drain(rroot, rckpt, "right")
    assert view.read(spark).count() == len(want)


def test_cdf_stream_maintains_agg_view(spark, tmp_path):
    """End-to-end streaming CDC -> maintained aggregate (the linear-IVM
    leg of test_cdf_streams_maintain_join_view_across_restart): an
    IncrementalTable change feed drives a CdcAggView through
    foreachBatch, upserts as +1 and full-row delete tombstones as -1
    (CDC with before-images -- delete_keys accepts the full row, so the
    retraction can cancel the measure exactly). After a second wave and
    a RESTART from the checkpoint the maintained counters must equal a
    from-scratch aggregate of the table; a no-commit re-drain and a
    forced epoch replay are both no-ops via the ledger."""
    import pyspark.sql.types as T

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        MULT_COL,
        CdcAggView,
    )
    from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (
        IncrementalTable,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.cdf_source import (
        register_cdf_source,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_agg_view_sink,
    )

    register_cdf_source(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    root = str(tmp_path / "tbl")
    tbl = IncrementalTable(root, id_col="id")
    view = CdcAggView(
        str(tmp_path / "av"),
        keys=["grp"],
        measures={"total": "CAST(v AS DECIMAL(20,0))"},
        n_partitions=2,
    )
    inner = streaming_agg_view_sink(view)
    seen_epochs: dict = {}  # eid -> the signed rows actually delivered

    def apply_batch(bdf, eid):
        signed_delta = bdf.withColumn(
            MULT_COL,
            F.when(F.col("_change_type") == "delete", F.lit(-1)).otherwise(
                F.lit(1)
            ),
        ).drop("_change_type", "_commit_seq")
        seen_epochs[eid] = signed_delta.collect()
        inner(signed_delta, eid)

    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("incr_cdf")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    C = spark.createDataFrame
    tbl.write_delta(C([(1, "a", 10), (2, "a", 20), (3, "b", 30)], schema))
    drain()
    # wave 2: delete id=2 WITH its before-image, insert id=4; restart
    tbl.delete_keys(spark, schema, C([(2, "a", 20)], schema))
    tbl.write_delta(C([(4, "b", 40)], schema))
    drain()

    def state():
        return {
            r["grp"]: (r["n_rows"], int(r["total"]))
            for r in view.read(spark).collect()
        }

    want = {
        r["grp"]: (r["n"], int(r["t"]))
        for r in tbl.read(spark, schema)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(20,0)")).alias("t"),
        )
        .collect()
    }
    assert state() == want == {"a": (1, 10), "b": (2, 70)}

    drain()  # no new commits: nothing replays
    assert state() == want
    # forced replay of an already-applied epoch WITH ITS TRUE CONTENT
    # (real foreachBatch replays re-deliver the same rows): ledger
    # makes it a no-op
    applied = view._load_ledger()
    last_eid = int(applied[-1][1].split("-", 1)[1])
    inner(C(seen_epochs[last_eid]), last_eid)
    assert state() == want
    # a same-id "replay" carrying DIFFERENT rows is a batch-id
    # collision (two unnamed streams on one view) and fails loudly
    import pytest as _pytest

    wrong = C([(99, "zz", 1)], schema).withColumn(MULT_COL, F.lit(1))
    with _pytest.raises(RuntimeError, match="batch id collision"):
        inner(wrong, last_eid)
    assert state() == want


def test_agg_view_sink_name_namespaces_epochs(spark, tmp_path):
    """Two streams fanning into ONE agg view must namespace their epoch
    counters via name=: both deliver epoch 0, and with distinct names
    both apply (unnamed, the second would be dropped as a replay)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        CdcAggView,
        signed,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_agg_view_sink,
    )

    v = CdcAggView(
        str(tmp_path / "v"), keys=["g"], measures={}, n_partitions=2
    )
    s1 = streaming_agg_view_sink(v, name="s1")
    s2 = streaming_agg_view_sink(v, name="s2")
    d = lambda n: signed(  # noqa: E731
        spark.createDataFrame([(n, "x")], "id int, g string"), +1
    )
    s1(d(1), 0)
    s2(d(2), 0)  # same epoch number, different stream
    assert v.read(spark).collect()[0]["n_rows"] == 2
    s2(d(3), 0)  # genuine replay of s2's epoch 0: dropped
    assert v.read(spark).collect()[0]["n_rows"] == 2


def test_agg_view_sink_compacts_mid_stream(spark, tmp_path):
    """``compact_every=N`` on the agg-view sink folds the partial
    history from INSIDE the stream (no external maintenance tick), and
    the maintained counters still equal a from-scratch aggregate after
    more epochs land post-compaction -- including epochs whose batch
    ids are minted AFTER the fold (the round-6 auto-id regression
    surface, here exercised through the epoch-id path) and a restart
    re-drain from the checkpoint."""
    import pyspark.sql.types as T

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        MULT_COL,
        CdcAggView,
    )
    from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (
        IncrementalTable,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.cdf_source import (
        register_cdf_source,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_agg_view_sink,
    )

    register_cdf_source(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    root = str(tmp_path / "tbl")
    tbl = IncrementalTable(root, id_col="id")
    view = CdcAggView(
        str(tmp_path / "av"),
        keys=["grp"],
        measures={"total": "CAST(v AS DECIMAL(20,0))"},
        n_partitions=2,
    )
    inner = streaming_agg_view_sink(view, compact_every=2)

    def apply_batch(bdf, eid):
        inner(
            bdf.withColumn(
                MULT_COL,
                F.when(
                    F.col("_change_type") == "delete", F.lit(-1)
                ).otherwise(F.lit(1)),
            ).drop("_change_type", "_commit_seq"),
            eid,
        )

    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("incr_cdf")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    C = spark.createDataFrame
    # 5 single-commit waves drained separately -> 5 epochs; the sink
    # must compact at least once (ledger bound) while staying correct
    tbl.write_delta(C([(1, "a", 10), (2, "a", 20)], schema))
    drain()
    tbl.write_delta(C([(3, "b", 30)], schema))
    drain()
    tbl.delete_keys(spark, schema, C([(2, "a", 20)], schema))
    drain()
    tbl.write_delta(C([(4, "b", 40), (5, "c", 50)], schema))
    drain()
    tbl.write_delta(C([(6, "c", 60)], schema))
    drain()

    # the bound held: ledger never grows past compact_every + 1
    assert len(view._load_ledger()) <= 3
    # and at least one fold actually happened (tombstones exist)
    assert view._load_ledger_full()["seen"]

    want = {
        r["grp"]: (r["n"], int(r["t"]))
        for r in tbl.read(spark, schema)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(20,0)")).alias("t"),
        )
        .collect()
    }
    got = {
        r["grp"]: (r["n_rows"], int(r["total"]))
        for r in view.read(spark).collect()
    }
    assert got == want == {"a": (1, 10), "b": (2, 70), "c": (2, 110)}

    drain()  # restart re-drain: nothing new, nothing double-applied
    got2 = {
        r["grp"]: (r["n_rows"], int(r["total"]))
        for r in view.read(spark).collect()
    }
    assert got2 == want


def test_join_view_sink_compacts_mid_stream(spark, tmp_path):
    """Join-view leg of the mid-stream compaction contract: one CDC
    stream feeds the LEFT side with compact_every bounding, the right
    side ingests in batch; the merged view equals the from-scratch
    join throughout."""
    import pyspark.sql.types as T

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        MULT_COL,
        CdcJoinView,
        signed,
    )
    from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (
        IncrementalTable,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.cdf_source import (
        register_cdf_source,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_join_view_sink,
    )

    register_cdf_source(spark)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("n", T.StringType()),
        ]
    )
    root = str(tmp_path / "tbl")
    tbl = IncrementalTable(root, id_col="k")
    view = CdcJoinView(str(tmp_path / "jv"), key="k", n_buckets=4)
    view.ingest_right(
        signed(
            spark.createDataFrame(
                [(1, 10), (2, 20), (3, 30), (4, 40)], "k long, o int"
            ),
            +1,
        ),
        "dim0",
    )
    inner = streaming_join_view_sink(view, side="left", compact_every=2)

    def apply_batch(bdf, eid):
        inner(
            bdf.withColumn(
                MULT_COL,
                F.when(
                    F.col("_change_type") == "delete", F.lit(-1)
                ).otherwise(F.lit(1)),
            ).drop("_change_type", "_commit_seq"),
            eid,
        )

    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("incr_cdf")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    C = spark.createDataFrame
    tbl.write_delta(C([(1, "a"), (2, "b")], schema))
    drain()
    tbl.write_delta(C([(3, "c")], schema))
    drain()
    tbl.delete_keys(spark, schema, C([(2, "b")], schema))
    drain()
    tbl.write_delta(C([(4, "d")], schema))
    drain()

    assert view._load_ledger_full()["seen"]  # a fold fired mid-stream
    got = sorted(
        (r["k"], r["n"], r["o"]) for r in view.read(spark).collect()
    )
    assert got == [(1, "a", 10), (3, "c", 30), (4, "d", 40)]


def test_streaming_drift_monitor_equals_batch_tvd_operator(spark, tmp_path):
    """VERDICT r12 #5: the sink's drift NUMBERS cross-checked against
    the oracle-paired batch operator (z171), not just hand values.

    Construction: the batch operator computes TVD(group, pooled corpus)
    where the pooled side includes the group. Feeding the sink an
    epoch 0 that replays the POOLED histogram once per group (cross
    join with the distinct group set) and an epoch 1 with the real
    per-group rows makes the sink's batch-vs-history comparison at
    epoch 1 EXACTLY the operator's group-vs-pooled statistic -- same
    integer numerator, same HALF_UP micros denominator -- so every
    per-group tvd_micros must match bit-for-bit (and batch_rows must
    equal the operator's n_rows)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.constraints import (
        distribution_drift_tvd,
    )
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_drift_monitor_sink,
    )

    docs = load(spark, "documents", SF)
    d = docs.select(
        F.col("source").alias("g"), F.expr("n_chars div 50").alias("b")
    )
    src = str(tmp_path / "in")
    hist = str(tmp_path / "hist")
    mon = str(tmp_path / "mon")
    # epoch 0: the pooled bucket stream replicated under every group key
    pooled = d.select("b").crossJoin(d.select("g").distinct())
    pooled.select("g", "b").write.parquet(src)

    def run_once():
        stream = spark.readStream.schema("g string, b long").parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_drift_monitor_sink(hist, mon, "g", "b")
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    d.write.mode("append").parquet(src)  # epoch 1: the real z171 input
    run_once()

    got = {
        r["g"]: (r["batch_rows"], r["tvd_micros"])
        for r in spark.read.parquet(f"{mon}/epoch=1").collect()
    }
    want = {
        r["source"]: (r["n_rows"], r["tvd_micros"])
        for r in distribution_drift_tvd(
            docs, "source", F.expr("n_chars div 50")
        ).collect()
    }
    assert got == want
    # non-degenerate: at least one genuinely drifted source
    assert any(t > 0 for _n, t in want.values())


def test_streaming_drift_monitor_sink(spark, tmp_path):
    """Live TVD drift monitor: batch 2 keeps group 'a' identically
    distributed (tvd 0), flips group 'b' to a disjoint bucket (tvd 1e6)
    and introduces a brand-new group 'c' (sentinel: history_rows NULL);
    batch 3 drops 'b' and 'c' entirely (sentinels: batch_rows NULL --
    the went-dark event, ADVICE r12); the first epoch is all sentinel
    rows (everything is new); a replay rewrites its epoch partition
    instead of double-counting."""
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_drift_monitor_sink,
    )

    src = str(tmp_path / "in")
    hist = str(tmp_path / "hist")
    mon = str(tmp_path / "mon")
    schema = "g string, b long"
    b1 = spark.createDataFrame(
        [("a", 0), ("a", 0), ("a", 1), ("a", 1), ("b", 0), ("b", 0)], schema
    )
    b1.write.parquet(src)

    def run_once():
        # ONE checkpoint across runs: epoch ids must advance (a fresh
        # checkpoint would replay everything as epoch 0)
        stream = spark.readStream.schema(b1.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_drift_monitor_sink(hist, mon, "g", "b")
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    # first epoch: every group is new -> sentinel rows, no TVD
    rows0 = {
        r["g"]: (r["batch_rows"], r["history_rows"], r["tvd_micros"])
        for r in spark.read.parquet(f"{mon}/epoch=0").collect()
    }
    assert rows0 == {"a": (4, None, None), "b": (2, None, None)}
    assert spark.read.parquet(hist).count() > 0

    # batch 2: 'a' same shape (uniform 0/1), 'b' jumps to bucket 9,
    # 'c' appears for the first time
    spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 9), ("b", 9), ("c", 5)], schema
    ).write.mode("append").parquet(src)
    run_once()
    rows1 = {
        r["g"]: (r["batch_rows"], r["history_rows"], r["tvd_micros"])
        for r in spark.read.parquet(f"{mon}/epoch=1").collect()
    }
    assert rows1["a"] == (2, 4, 0)          # identical distribution
    assert rows1["b"] == (2, 2, 1_000_000)  # disjoint support
    assert rows1["c"] == (1, None, None)    # new source sentinel
    # history now holds both epochs' contributions
    h = spark.read.option("basePath", hist).parquet(hist)
    assert {r["epoch"] for r in h.select("epoch").distinct().collect()} == {0, 1}

    # batch 3: only 'a' reports -- 'b' and 'c' went dark
    spark.createDataFrame([("a", 0), ("a", 1)], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()
    rows2 = {
        r["g"]: (r["batch_rows"], r["history_rows"], r["tvd_micros"])
        for r in spark.read.parquet(f"{mon}/epoch=2").collect()
    }
    assert rows2["a"] == (2, 6, 0)
    assert rows2["b"] == (None, 4, None)  # went-dark sentinel
    assert rows2["c"] == (None, 1, None)  # went-dark sentinel

    # replay absorption: re-running epoch 1's logic rewrites epoch=1
    # byte-for-byte (monitor + history unchanged)
    before_mon = sorted(
        tuple(r)
        for r in spark.read.option("basePath", mon).parquet(mon).collect()
    )
    h = spark.read.option("basePath", hist).parquet(hist)
    before_hist = sorted(tuple(r) for r in h.collect())
    from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (
        streaming_drift_monitor_sink as mk,
    )

    replay = spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 9), ("b", 9), ("c", 5)], schema
    )
    mk(hist, mon, "g", "b")(replay, 1)
    assert (
        sorted(
            tuple(r)
            for r in spark.read.option("basePath", mon).parquet(mon).collect()
        )
        == before_mon
    )
    h2 = spark.read.option("basePath", hist).parquet(hist)
    assert sorted(tuple(r) for r in h2.collect()) == before_hist
