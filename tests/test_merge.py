"""Golden merge-state tests: FIXTURES.md §A7 scenarios B1-B5 covering every
branch of the reference procedure (SQL/etl_world_banks.sql:20-122) plus the
deactivation pass (:126-140) and its quirks.
"""

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark import schemas
from etl_world_banks_with_python_and_postgresql_spark.operators.merge import (
    deactivate_stale,
    merge_scd,
    summarize,
)

D1 = datetime(2024, 8, 1, 10, 0, 0)
D2 = datetime(2024, 8, 2, 10, 0, 0)
D3 = datetime(2024, 8, 3, 10, 0, 0)
D4 = datetime(2024, 8, 4, 10, 0, 0)

BANKS = [f"Bank {c}" for c in "ABCDEFGHIJ"]


def empty_target(spark):
    return spark.createDataFrame([], schemas.WORLD_BANK_DATA)


def batch_df(spark, rows, batch_id, lmd=date(2024, 7, 31)):
    data = [(name, float(cap), lmd, batch_id) for name, cap in rows]
    return spark.createDataFrame(data, schemas.WORLD_BANK_BATCH)


def run_merge(spark, target, rows, batch_id, now, deactivate=True):
    b = batch_df(spark, rows, batch_id)
    res = merge_scd(
        target,
        b,
        keys=["bank_name"],
        compare_col="market_cap_usd",
        set_cols=["market_cap_usd", "last_modified_date"],
        batch_id=batch_id,
        table_name="world_bank_data",
        now=now,
    )
    new_target = res.target
    if deactivate:
        new_target = deactivate_stale(new_target, batch_id, now=now)
    # Truncate lineage between batches: chained merges otherwise compound the
    # plan tree exponentially (target appears in profile+apply+insert paths).
    # Production runs persist the snapshot to storage per batch, same effect.
    new_target = new_target.localCheckpoint(eager=True)
    return new_target, res


def counters_tuple(res):
    r = res.counters.collect()[0]
    return (r["new_inserts_count"], r["update_count"], r["no_update_count"])


def snapshot(target):
    return {
        r["bank_name"]: r
        for r in target.filter("active").orderBy("bank_name").collect()
    }


def test_b1_cold_start_matches_reference_run(spark):
    """10 fresh banks -> 10 inserts / 0 / 0 (ipynb:305-307 golden output)."""
    t0 = empty_target(spark)
    rows = [(b, 100.0 + i) for i, b in enumerate(BANKS)]
    t1, res = run_merge(spark, t0, rows, "batch-1", D1)
    assert counters_tuple(res) == (10, 0, 0)
    assert t1.count() == 10
    snap = snapshot(t1)
    assert len(snap) == 10
    # fresh inserts: updated_at NULL (sql:88,109), active, batch stamped
    for r in snap.values():
        assert r["updated_at"] is None
        assert r["active"] is True
        assert r["batch_id"] == "batch-1"
    # surrogate ids unique
    ids = [r["world_bank_id"] for r in t1.collect()]
    assert len(set(ids)) == 10
    # summary lines (sql:164-166 semantics)
    lines = summarize(res.counters.collect()[0].asDict(), t1.count())
    assert lines[0] == "Number of new records inserted: 10/10"


def test_b2_update_and_noop(spark):
    t0 = empty_target(spark)
    rows = [(b, 100.0 + i) for i, b in enumerate(BANKS)]
    t1, _ = run_merge(spark, t0, rows, "batch-1", D1)

    rows2 = [(b, (100.0 + i) * (2 if i < 3 else 1)) for i, b in enumerate(BANKS)]
    t2, res2 = run_merge(spark, t1, rows2, "batch-2", D2)
    assert counters_tuple(res2) == (0, 3, 7)
    assert t2.count() == 10  # in-place updates, no new versions
    snap = snapshot(t2)
    for i, b in enumerate(BANKS):
        r = snap[b]
        if i < 3:
            assert r["market_cap_usd"] == (100.0 + i) * 2
            assert r["updated_at"] == D2
            assert r["batch_id"] == "batch-2"
        else:
            # noop does NOT refresh batch_id (sql:38-40) -- quirk preserved
            assert r["updated_at"] is None
            assert r["batch_id"] == "batch-1"


def test_b3_deactivation_with_updated_at_null_exemption(spark):
    t0 = empty_target(spark)
    rows = [(b, 100.0 + i) for i, b in enumerate(BANKS)]
    t1, _ = run_merge(spark, t0, rows, "batch-1", D1)
    rows2 = [(b, (100.0 + i) * (2 if i < 3 else 1)) for i, b in enumerate(BANKS)]
    t2, _ = run_merge(spark, t1, rows2, "batch-2", D2)

    # batch 3: drop Bank A (updated, updated_at=D2) and Bank D (never updated,
    # updated_at NULL); change Bank B; add Bank K.
    rows3 = [("Bank B", 999.0), ("Bank K", 555.0)] + [
        (b, (100.0 + i) * (2 if i < 3 else 1))
        for i, b in enumerate(BANKS)
        if b not in ("Bank A", "Bank B", "Bank D")
    ]
    t3, res3 = run_merge(spark, t2, rows3, "batch-3", D3)
    assert counters_tuple(res3) == (1, 1, 7)

    snap = snapshot(t3)
    # Bank A: updated_at=D2 < CURRENT_DATE(D3) and batch_id=batch-2 != batch-3
    # -> deactivated
    assert "Bank A" not in snap
    a_rows = t3.filter(F.col("bank_name") == "Bank A").collect()
    assert len(a_rows) == 1 and a_rows[0]["active"] is False
    assert a_rows[0]["updated_at"] == D3
    # Bank D missing from feed but updated_at IS NULL -> EXEMPT (sql:134 quirk)
    assert "Bank D" in snap and snap["Bank D"]["updated_at"] is None
    # Bank K inserted
    assert snap["Bank K"]["market_cap_usd"] == 555.0
    assert snap["Bank B"]["market_cap_usd"] == 999.0


def test_b4_reactivate_and_new_version(spark):
    t0 = empty_target(spark)
    t1, _ = run_merge(spark, t0, [("Bank A", 100.0), ("Bank B", 200.0)], "b1", D1)
    # update both so updated_at is non-NULL (deactivation-eligible)
    t2, _ = run_merge(spark, t1, [("Bank A", 101.0), ("Bank B", 201.0)], "b2", D2)
    # drop both -> deactivated
    t3, _ = run_merge(spark, t2, [("Bank C", 1.0)], "b3", D3)
    assert snapshot(t3).keys() == {"Bank C"}

    # resend Bank A with its OLD value -> reactivate in place (sql:57-71)
    t4, res4 = run_merge(spark, t3, [("Bank A", 101.0), ("Bank C", 1.0)], "b4", D4)
    assert counters_tuple(res4) == (0, 0, 1)  # reactivate increments nothing
    a = t4.filter("bank_name = 'Bank A'").collect()
    assert len(a) == 1 and a[0]["active"] is True and a[0]["batch_id"] == "b4"
    assert a[0]["updated_at"] == D4

    # resend Bank B with a NEW value -> new active row, history kept,
    # NO counter incremented (sql:72-91 quirk)
    t5, res5 = run_merge(
        spark, t4, [("Bank A", 101.0), ("Bank B", 999.0), ("Bank C", 1.0)], "b5", D4
    )
    assert counters_tuple(res5) == (0, 0, 2)
    b_rows = t5.filter("bank_name = 'Bank B'").orderBy("world_bank_id").collect()
    assert len(b_rows) == 2
    assert b_rows[0]["active"] is False and b_rows[0]["market_cap_usd"] == 201.0
    assert b_rows[1]["active"] is True and b_rows[1]["market_cap_usd"] == 999.0
    assert b_rows[1]["updated_at"] is None  # fresh insert quirk


def test_b5_idempotent_replay_all_noops(spark):
    t0 = empty_target(spark)
    rows = [(b, 100.0 + i) for i, b in enumerate(BANKS)]
    t1, _ = run_merge(spark, t0, rows, "batch-1", D1)
    t2, res2 = run_merge(spark, t1, rows, "batch-1", D1)
    assert counters_tuple(res2) == (0, 0, 10)
    assert sorted(map(tuple, t1.collect())) == sorted(map(tuple, t2.collect()))


def test_multi_inactive_rows_quarantined_as_error(spark):
    """>1 inactive row per key -> the reference's scalar subquery raises and
    the row is skipped (sql:60-62 + EXCEPTION 118-121)."""
    t0 = empty_target(spark)
    t1, _ = run_merge(spark, t0, [("Bank A", 1.0)], "b1", D1)
    t2, _ = run_merge(spark, t1, [("Bank A", 2.0)], "b2", D2)  # update
    t3, _ = run_merge(spark, t2, [("Bank X", 0.0)], "b3", D3)  # A deactivated
    # resend with new value -> new_version; now 1 inactive + 1 active
    t4, _ = run_merge(spark, t3, [("Bank A", 3.0), ("Bank X", 0.0)], "b4", D3)
    t4u, _ = run_merge(spark, t4, [("Bank A", 4.0), ("Bank X", 0.0)], "b5", D3)
    # deactivate the new version too -> 2 inactive rows for Bank A
    t5, _ = run_merge(spark, t4u, [("Bank X", 0.0)], "b6", D4)
    assert t5.filter("bank_name = 'Bank A' and not active").count() == 2

    t6, res6 = run_merge(spark, t5, [("Bank A", 5.0), ("Bank X", 0.0)], "b7", D4)
    acts = {r["bank_name"]: r["action"] for r in res6.actions.collect()}
    assert acts["Bank A"] == "error"
    # state unchanged for Bank A
    assert t6.filter("bank_name = 'Bank A' and active").count() == 0
    assert t6.filter("bank_name = 'Bank A'").count() == 2


def test_exchange_rates_flat_merge(spark):
    """3-way variant on (country, currency, year) (sql:188-248), with the
    update branch FIXED (the reference's update_at typo aborts every changed
    row -- divergence recorded in the docstring of merge_scd)."""
    t0 = spark.createDataFrame([], schemas.EXCHANGES_RATES)

    def rates_batch(rows, bid):
        return spark.createDataFrame(
            [(c, cur, float(r), date(2023, 12, 31), bid) for c, cur, r in rows],
            schemas.EXCHANGE_RATES_BATCH,
        )

    def run(t, rows, bid, now):
        return merge_scd(
            t,
            rates_batch(rows, bid),
            keys=["country", "currency", "year"],
            compare_col="exchange_rate",
            set_cols=["exchange_rate"],
            batch_id=bid,
            table_name="exchanges_rates",
            id_col="exchange_rate_id",
            now=now,
            scd=False,
        )

    res1 = run(t0, [("UK", "Pound", 0.78), ("France", "Euro", 0.92)], "b1", D1)
    assert counters_tuple(res1) == (2, 0, 0)
    t1 = res1.target.localCheckpoint(eager=True)

    res2 = run(t1, [("UK", "Pound", 0.80), ("France", "Euro", 0.92)], "b2", D2)
    assert counters_tuple(res2) == (0, 1, 1)
    snap = {(r["country"]): r for r in res2.target.collect()}
    assert snap["UK"]["exchange_rate"] == 0.80 and snap["UK"]["updated_at"] == D2
    assert snap["France"]["updated_at"] is None  # noop untouched
    assert res2.target.count() == 2


def test_duplicate_batch_keys_do_not_duplicate_target(spark):
    """Duplicate keys within one batch are deduped deterministically (max
    payload) instead of fanning out the apply join -- divergence from the
    reference's sequential per-row loop, documented in merge_scd."""
    t0 = empty_target(spark)
    b = spark.createDataFrame(
        [
            ("Bank A", 100.0, date(2024, 7, 1), "b1"),
            ("Bank A", 300.0, date(2024, 7, 1), "b1"),
            ("Bank B", 50.0, date(2024, 7, 1), "b1"),
        ],
        schemas.WORLD_BANK_BATCH,
    )
    res = merge_scd(
        t0, b, keys=["bank_name"], compare_col="market_cap_usd",
        set_cols=["market_cap_usd", "last_modified_date"],
        batch_id="b1", table_name="world_bank_data", now=D1,
    )
    rows = res.target.collect()
    assert len(rows) == 2
    vals = {r["bank_name"]: r["market_cap_usd"] for r in rows}
    assert vals == {"Bank A": 300.0, "Bank B": 50.0}
    # update path with duplicates must not multiply existing rows either
    t1 = res.target.localCheckpoint(eager=True)
    b2 = spark.createDataFrame(
        [
            ("Bank A", 111.0, date(2024, 7, 2), "b2"),
            ("Bank A", 222.0, date(2024, 7, 2), "b2"),
        ],
        schemas.WORLD_BANK_BATCH,
    )
    res2 = merge_scd(
        t1, b2, keys=["bank_name"], compare_col="market_cap_usd",
        set_cols=["market_cap_usd", "last_modified_date"],
        batch_id="b2", table_name="world_bank_data", now=D2,
    )
    rows2 = res2.target.collect()
    assert len(rows2) == 2
    assert {r["bank_name"]: r["market_cap_usd"] for r in rows2} == {
        "Bank A": 222.0,
        "Bank B": 50.0,
    }
