"""ingest_many (r16 batched IVM ingest) == sequential ingests, pinned.

The batching amortizes fixed cost (one store write per side, one view
write, one ledger CAS per CALL instead of per delta); these tests pin
that it changes NOTHING observable: same ledger entries in the same
order, same per-batch dirs, same read()/as_of results, same replay and
crash semantics.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.committer import (
    ConcurrentCommitError,
    commit_json,
)
from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
    CdcAggView,
    CdcJoinView,
    IncrementalJoinView,
    signed,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk_sides(spark):
    left = spark.createDataFrame(
        [(i, f"c{i}") for i in range(40)], "k long, name string"
    )
    right = spark.createDataFrame(
        [(i % 40, 100 + i, float(i)) for i in range(120)],
        "k long, okey long, amt double",
    )
    return left, right


def _items(left, right):
    # interleaved arrival, same shape as the z89 gate entry
    return [
        ("left", left.filter(F.col("k") % 2 == 0)),
        ("right", right.filter(F.col("okey") % 2 == 0)),
        ("left", left.filter(F.col("k") % 2 == 1)),
        ("right", right.filter(F.col("okey") % 2 == 1)),
    ]


def test_join_ingest_many_equals_sequential(spark, tmp_path):
    left, right = _mk_sides(spark)
    seq = IncrementalJoinView(str(tmp_path / "seq"), key="k")
    for side, d in _items(left, right):
        (seq.ingest_left if side == "left" else seq.ingest_right)(d)
    bat = IncrementalJoinView(str(tmp_path / "bat"), key="k")
    statuses = bat.ingest_many(_items(left, right))
    assert statuses == ["applied"] * 4
    assert bat._load_ledger() == seq._load_ledger()
    assert _rows(bat.read(spark)) == _rows(seq.read(spark))
    # as_of: every prefix identical (each view delta joined state AS OF
    # its position, not the end-of-call state)
    for n in range(1, 5):
        assert _rows(bat.read(spark, as_of=n)) == _rows(
            seq.read(spark, as_of=n)
        ), f"as_of={n} diverged"
    # per-batch dirs exist under the same names
    for s, b in seq._load_ledger():
        assert os.path.isdir(bat._batch_dir("store", s, b))


def test_cdc_ingest_many_equals_sequential(spark, tmp_path):
    left, right = _mk_sides(spark)
    upd_old = left.filter(F.col("k") % 10 == 3)
    upd_new = upd_old.withColumn("name", F.concat("name", F.lit("+")))
    items = [
        ("left", signed(left, +1), "c0"),
        ("right", signed(right, +1), "o0"),
        ("left", signed(upd_old, -1).unionByName(signed(upd_new, +1)), "c1"),
        ("right", signed(right.filter(F.col("okey") % 7 == 0), -1), "o1"),
    ]
    seq = CdcJoinView(str(tmp_path / "seq"), key="k")
    for side, d, b in items:
        (seq.ingest_left if side == "left" else seq.ingest_right)(d, b)
    bat = CdcJoinView(str(tmp_path / "bat"), key="k")
    assert bat.ingest_many(items) == ["applied"] * 4
    assert bat._load_ledger() == seq._load_ledger()
    assert _rows(bat.read(spark)) == _rows(seq.read(spark))
    for n in range(1, 5):
        assert _rows(bat.read(spark, as_of=n)) == _rows(
            seq.read(spark, as_of=n)
        ), f"as_of={n} diverged"


def test_agg_ingest_many_equals_sequential(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, f"t{i % 3}", i * 10) for i in range(90)],
        "eid long, typ string, val long",
    )
    batches = [
        (signed(ev.filter(F.col("eid") % 2 == 0), +1), "i0"),
        (signed(ev.filter(F.col("eid") % 2 == 1), +1), "i1"),
        (signed(ev.filter(F.col("eid") % 11 == 3), -1), "d0"),
    ]

    def mk(p):
        return CdcAggView(
            str(p), keys=["typ"], measures={"total": "CAST(val AS DECIMAL(25,6))"}
        )

    seq = mk(tmp_path / "seq")
    for d, b in batches:
        seq.ingest(d, b)
    bat = mk(tmp_path / "bat")
    assert bat.ingest_many(batches) == ["applied"] * 3
    assert bat._load_ledger() == seq._load_ledger()
    assert _rows(bat.read(spark)) == _rows(seq.read(spark))
    for n in range(1, 4):
        assert _rows(bat.read(spark, as_of=n)) == _rows(
            seq.read(spark, as_of=n)
        )
    # per-batch partial dirs stay individually addressable
    for _s, b in seq._load_ledger():
        assert os.path.isdir(bat._batch_dir(b))


def test_ingest_many_replay_skips_already_applied(spark, tmp_path):
    left, right = _mk_sides(spark)
    v = IncrementalJoinView(str(tmp_path / "v"), key="k")
    v.ingest_left(left.filter(F.col("k") % 2 == 0), batch_id="a")
    st = v.ingest_many(
        [
            ("left", left.filter(F.col("k") % 2 == 0), "a"),  # replay
            ("right", right, "b"),
        ]
    )
    assert st == ["replayed", "applied"]
    # replayed batch not duplicated in the ledger
    assert v._load_ledger() == [["left", "a"], ["right", "b"]]
    # view equals the sequential equivalent
    seq = IncrementalJoinView(str(tmp_path / "seq"), key="k")
    seq.ingest_left(left.filter(F.col("k") % 2 == 0), batch_id="a")
    seq.ingest_right(right, batch_id="b")
    assert _rows(v.read(spark)) == _rows(seq.read(spark))


def test_ingest_many_auto_ids_match_sequential(spark, tmp_path):
    left, right = _mk_sides(spark)
    v = IncrementalJoinView(str(tmp_path / "v"), key="k")
    v.ingest_many(_items(left, right))  # no ids: auto-derived
    assert v._load_ledger() == [
        ["left", "0"],
        ["right", "0"],
        ["left", "1"],
        ["right", "1"],
    ]


def test_ingest_many_crash_before_commit_is_invisible_then_retries(
    spark, tmp_path, monkeypatch
):
    left, right = _mk_sides(spark)
    v = IncrementalJoinView(str(tmp_path / "v"), key="k")

    def boom(*a, **k):
        raise RuntimeError("crash before ledger commit")

    monkeypatch.setattr(v, "_commit_ledger", boom)
    with pytest.raises(RuntimeError):
        v.ingest_many(_items(left, right))
    # nothing visible: ledger empty, read() raises
    assert v._load_ledger() == []
    with pytest.raises(ValueError):
        v.read(spark)
    # retry (monkeypatch removed) overwrites the orphan dirs cleanly
    monkeypatch.undo()
    assert v.ingest_many(_items(left, right)) == ["applied"] * 4
    seq = IncrementalJoinView(str(tmp_path / "seq"), key="k")
    for side, d in _items(left, right):
        (seq.ingest_left if side == "left" else seq.ingest_right)(d)
    assert _rows(v.read(spark)) == _rows(seq.read(spark))


def test_ingest_many_concurrent_writer_fails_loud(spark, tmp_path):
    left, right = _mk_sides(spark)
    v = IncrementalJoinView(str(tmp_path / "v"), key="k")
    orig = v._commit_ledger

    real_load = v._load_ledger_state

    def racing_load():
        full, tok = real_load()
        # a rival lands an ingest AFTER our token read
        commit_json(
            v._ledger_path(),
            {"applied": full["applied"] + [["left", "rival"]],
             "seen": full["seen"]},
        )
        return full, tok

    v._load_ledger_state = racing_load
    try:
        with pytest.raises(ConcurrentCommitError):
            v.ingest_many([("right", right, "x")])
    finally:
        v._load_ledger_state = real_load
        del orig


def test_agg_ingest_many_then_compact_matches_scratch(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, f"t{i % 4}", i) for i in range(80)],
        "eid long, typ string, val long",
    )
    v = CdcAggView(
        str(tmp_path / "v"),
        keys=["typ"],
        measures={"total": "CAST(val AS DECIMAL(25,6))"},
    )
    v.ingest_many(
        [
            (signed(ev.filter(F.col("eid") < 40), +1), "a"),
            (signed(ev.filter(F.col("eid") >= 40), +1), "b"),
            (signed(ev.filter(F.col("eid") % 5 == 0), -1), "c"),
        ]
    )
    assert v.compact(spark)
    expect = _rows(
        ev.filter(F.col("eid") % 5 != 0)
        .groupBy("typ")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.expr("CAST(val AS DECIMAL(25,6))")).alias("total"),
        )
    )
    assert _rows(v.read(spark)) == expect
