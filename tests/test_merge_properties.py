"""Property-based merge tests (SURVEY §5 item 4).

Hypothesis generates random batch sequences; invariants checked after each
applied batch:
  I1  at most one ACTIVE row per key;
  I2  history only grows (row count monotonically non-decreasing);
  I3  replaying the final batch unchanged yields zero inserts/updates, no
      new history rows, and reaches a FIXPOINT after at most one replay.
      (Strict single-replay idempotency does not hold in the reference
      semantics: a no-op'd row keeps its stale batch_id -- sql:38-40 --
      so the deactivation pass can deactivate a present-but-unchanged row,
      and replaying then REACTIVATES it. Faithful quirk, found by
      hypothesis.)
"""

from datetime import date, datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_world_banks_with_python_and_postgresql_spark import schemas
from etl_world_banks_with_python_and_postgresql_spark.operators.merge import (
    deactivate_stale,
    merge_scd,
)

KEYS = [f"Bank {c}" for c in "ABCDEF"]
VALUES = [100.0, 200.0, 300.0]

batch_strategy = st.lists(
    st.tuples(st.sampled_from(KEYS), st.sampled_from(VALUES)),
    min_size=0,
    max_size=6,
    unique_by=lambda t: t[0],
)
sequence_strategy = st.lists(batch_strategy, min_size=1, max_size=3)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        import os

        from etl_world_banks_with_python_and_postgresql_spark.session import get_spark

        os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
        _spark = get_spark(app_name="prop_tests", shuffle_partitions=8)
    return _spark


def apply(spark, target, rows, batch_id, now):
    batch = spark.createDataFrame(
        [(k, v, date(2024, 7, 1), batch_id) for k, v in rows], schemas.WORLD_BANK_BATCH
    )
    res = merge_scd(
        target,
        batch,
        keys=["bank_name"],
        compare_col="market_cap_usd",
        set_cols=["market_cap_usd", "last_modified_date"],
        batch_id=batch_id,
        table_name="world_bank_data",
        now=now,
    )
    out = deactivate_stale(res.target, batch_id, now=now)
    return out.localCheckpoint(eager=True), res


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(seq=sequence_strategy)
def test_merge_invariants(seq):
    spark = _get_spark()
    target = spark.createDataFrame([], schemas.WORLD_BANK_DATA)
    base_now = datetime(2024, 8, 1, 10, 0, 0)
    prev_count = 0
    for i, rows in enumerate(seq):
        target, _ = apply(spark, target, rows, f"batch-{i}", base_now + timedelta(days=i))
        # I1: <=1 active row per key
        dup_active = (
            target.filter("active")
            .groupBy("bank_name")
            .count()
            .filter("count > 1")
            .count()
        )
        assert dup_active == 0
        # I2: history never shrinks
        n = target.count()
        assert n >= prev_count
        prev_count = n

    # I3: replay of the last batch -- no inserts/updates, no history growth,
    # and a fixpoint after at most one replay (see module docstring for why
    # single-replay bit-identity is NOT the reference contract)
    last_idx = len(seq) - 1
    now = base_now + timedelta(days=last_idx)
    n_before = target.count()
    replay1, res1 = apply(spark, target, seq[last_idx], f"batch-{last_idx}", now)
    row1 = res1.counters.collect()[0]
    assert row1["new_inserts_count"] == 0
    assert row1["update_count"] == 0
    assert replay1.count() == n_before  # reactivation is in-place, no new rows

    replay2, res2 = apply(spark, replay1, seq[last_idx], f"batch-{last_idx}", now)
    row2 = res2.counters.collect()[0]
    assert row2["new_inserts_count"] == 0
    assert row2["update_count"] == 0
    assert sorted(map(tuple, replay1.collect())) == sorted(map(tuple, replay2.collect()))


# --- duplicate_clusters vs a pure-Python union-find reference -------------

edge_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _uf_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=edge_strategy)
def test_duplicate_clusters_match_union_find(edges):
    from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
        duplicate_clusters,
    )

    spark = _get_spark()
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, max_iter=40).collect()
    }
    assert got == _uf_components(edges)


# --- round-4 operators: CDC apply + KMV merge ---------------------------

change_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # id
        st.sampled_from(["upsert", "delete"]),
        st.integers(min_value=1, max_value=5),  # commit seq
        st.text(alphabet="abc", min_size=1, max_size=3),
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=change_strategy)
def test_apply_changes_matches_dict_replay(spark, changes):
    """apply_changes == a driver-side dict replay of the feed in seq
    order (latest-wins, deletes drop, unseen target rows survive), for
    arbitrary feeds -- modulo the contract that an id appears at most
    once per seq (enforced by construction here)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators.diff import (
        apply_changes,
    )

    # enforce the feed contract: one change per (id, seq)
    seen = set()
    feed = []
    for i, ct, seq, val in changes:
        if (i, seq) in seen:
            continue
        seen.add((i, seq))
        feed.append((i, val, ct, seq))

    target_rows = [(i, f"t{i}") for i in range(4)]
    target = spark.createDataFrame(target_rows, ["id", "val"])

    model = {i: v for i, v in target_rows}
    for i, val, ct, seq in sorted(feed, key=lambda r: r[3]):
        if ct == "delete":
            model.pop(i, None)
        else:
            model[i] = val

    if feed:
        changes_df = spark.createDataFrame(
            feed, ["id", "val", "_change_type", "_commit_seq"]
        )
        got = sorted(
            tuple(r)
            for r in apply_changes(target, changes_df, id_col="id").collect()
        )
    else:
        got = sorted(target_rows)
    assert got == sorted(model.items())


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.text(alphabet="xyz01", min_size=1, max_size=4),
        min_size=1,
        max_size=30,
    ),
    n_parts=st.integers(min_value=1, max_value=4),
)
def test_kmv_merge_associative_over_any_partitioning(spark, values, n_parts):
    """Merging per-part KMV sketches equals sketching the whole input,
    for ANY way of slicing the input -- the compose-without-rescan
    property stated generally (k chosen small so saturation paths are
    exercised)."""
    from etl_world_banks_with_python_and_postgresql_spark.operators import (
        sketch as S,
    )

    from pyspark.sql import functions as F

    k = 4
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], ["id", "v"]
    )
    whole = sorted(
        r["hv"] for r in S.kmv_sketch(df, "v", k=k).collect()
    )
    parts = [
        df.filter(F.col("id") % n_parts == p) for p in range(n_parts)
    ]
    merged = sorted(
        r["hv"]
        for r in S.kmv_merge(
            [S.kmv_sketch(p, "v", k=k) for p in parts], k=k
        ).collect()
    )
    assert merged == whole


# ---------------------------------------------------------------------------
# CDC view invariants: any signed history == from-scratch recompute
# ---------------------------------------------------------------------------

# an op is (kind, id, grp, value); histories are VALID CDC streams:
# insert only absent ids, delete/update only present ids (z-set views
# assume a keyed upstream emitting consistent before-images)
_cdc_ops = st.lists(
    st.tuples(
        st.sampled_from(["ins", "del", "upd"]),
        st.integers(min_value=0, max_value=14),
        st.sampled_from(["g1", "g2", "g3"]),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=24,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=_cdc_ops, batch_cuts=st.sets(st.integers(0, 23), max_size=4))
def test_cdc_agg_view_matches_recompute(tmp_path_factory, ops, batch_cuts):
    """ANY valid signed history, arbitrarily chopped into ingest
    batches (with an interleaved compaction), maintains counters equal
    to a from-scratch aggregate of the final state."""
    import shutil

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        MULT_COL,
        CdcAggView,
    )

    spark = _get_spark()
    root = str(tmp_path_factory.mktemp("cdcagg"))
    shutil.rmtree(root, ignore_errors=True)
    v = CdcAggView(
        root + "/v",
        keys=["grp"],
        measures={"total": "CAST(v AS DECIMAL(20,0))"},
        n_partitions=2,
    )
    state: dict[int, tuple[str, int]] = {}
    delta_rows: list[tuple[int, str, int, int]] = []
    n_batches = 0

    def flush():
        nonlocal delta_rows, n_batches
        if not delta_rows:
            return
        df = spark.createDataFrame(
            delta_rows, f"id int, grp string, v int, {MULT_COL} int"
        )
        # alternate explicit and AUTO-derived batch ids: auto ids must
        # stay fresh across the interleaved compaction below (round-6
        # regression: the auto counter restarted post-compact and the
        # tombstone replay check silently dropped the batch)
        bid = f"b{n_batches}" if n_batches % 2 == 0 else None
        assert v.ingest(df, bid) == "applied"
        n_batches += 1
        delta_rows = []

    for i, (kind, rid, grp, val) in enumerate(ops):
        if kind == "ins" and rid not in state:
            state[rid] = (grp, val)
            delta_rows.append((rid, grp, val, +1))
        elif kind == "del" and rid in state:
            og, ov = state.pop(rid)
            delta_rows.append((rid, og, ov, -1))
        elif kind == "upd" and rid in state:
            og, ov = state[rid]
            state[rid] = (grp, val)
            delta_rows.append((rid, og, ov, -1))
            delta_rows.append((rid, grp, val, +1))
        if i in batch_cuts:
            flush()
            if n_batches == 2:
                v.compact(spark)
    flush()

    want: dict[str, tuple[int, int]] = {}
    for grp, val in state.values():
        n, t = want.get(grp, (0, 0))
        want[grp] = (n + 1, t + val)
    if n_batches == 0:
        return
    got = {
        r["grp"]: (r["n_rows"], int(r["total"]))
        for r in v.read(spark).collect()
    }
    assert got == want


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    lops=_cdc_ops,
    rops=_cdc_ops,
    batch_cuts=st.sets(st.integers(0, 23), max_size=3),
)
def test_cdc_join_view_matches_recompute(tmp_path_factory, lops, rops, batch_cuts):
    """ANY pair of valid signed histories, arbitrarily interleaved into
    ingest batches on both sides, maintains a join view equal to the
    from-scratch join of the two final states (z-set product rule)."""
    import shutil

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        MULT_COL,
        CdcJoinView,
    )

    spark = _get_spark()
    root = str(tmp_path_factory.mktemp("cdcjoin"))
    shutil.rmtree(root, ignore_errors=True)
    v = CdcJoinView(root + "/v", key="k", n_buckets=4)
    states: dict[str, dict[int, tuple[str, int]]] = {"left": {}, "right": {}}
    pending: dict[str, list] = {"left": [], "right": []}
    n_batches = 0

    def flush(side):
        nonlocal n_batches
        if not pending[side]:
            return
        # non-key columns must be DISJOINT across sides (join-output
        # contract; Spark rejects duplicate names at the view write)
        cols = "g string, v int" if side == "left" else "rg string, rv int"
        df = spark.createDataFrame(pending[side], f"k int, {cols}, {MULT_COL} int")
        # alternate explicit and auto ids (round-6 compaction regression)
        bid = (
            (f"l{n_batches}" if side == "left" else f"r{n_batches}")
            if n_batches % 2 == 0
            else None
        )
        if side == "left":
            assert v.ingest_left(df, bid) == "applied"
        else:
            assert v.ingest_right(df, bid) == "applied"
        n_batches += 1
        pending[side] = []

    for side, ops in (("left", lops), ("right", rops)):
        state = states[side]
        for i, (kind, rid, grp, val) in enumerate(ops):
            if kind == "ins" and rid not in state:
                state[rid] = (grp, val)
                pending[side].append((rid, grp, val, +1))
            elif kind == "del" and rid in state:
                og, ov = state.pop(rid)
                pending[side].append((rid, og, ov, -1))
            elif kind == "upd" and rid in state:
                og, ov = state[rid]
                state[rid] = (grp, val)
                pending[side].append((rid, og, ov, -1))
                pending[side].append((rid, grp, val, +1))
            if i in batch_cuts:
                flush(side)
                if n_batches == 2:
                    v.compact(spark)
        flush(side)
    if n_batches == 0:
        return

    want = sorted(
        (k, lg, lv, rg, rv)
        for k, (lg, lv) in states["left"].items()
        for rk, (rg, rv) in states["right"].items()
        if k == rk
    )
    got = sorted(
        (r["k"], r["g"], r["v"], r["rg"], r["rv"])
        for r in v.read(spark).collect()
    )
    assert got == want


_kmv_rows = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2", "g3"]),
        st.integers(min_value=0, max_value=40),  # small domain -> repeats
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_kmv_rows, batch_cuts=st.sets(st.integers(0, 29), max_size=4))
def test_kmv_agg_view_matches_oneshot(tmp_path_factory, rows, batch_cuts):
    """ANY insert history, arbitrarily chopped into ingest batches (with
    an interleaved compaction), reads back the same estimates as a
    one-shot grouped KMV over the full multiset -- and with k larger
    than the value domain the estimates are the EXACT distinct counts."""
    import shutil

    from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (
        KmvAggView,
    )

    spark = _get_spark()
    root = str(tmp_path_factory.mktemp("kmvagg"))
    shutil.rmtree(root, ignore_errors=True)
    v = KmvAggView(
        root + "/v", keys=["grp"], value_expr="v", k=16, n_partitions=2
    )
    pending: list[tuple[str, int]] = []
    all_rows: list[tuple[str, int]] = []
    n_batches = 0

    def flush():
        nonlocal pending, n_batches
        if not pending:
            return
        df = spark.createDataFrame(pending, "grp string, v int")
        bid = f"b{n_batches}" if n_batches % 2 == 0 else None
        assert v.ingest(df, bid) == "applied"
        n_batches += 1
        pending = []

    for i, row in enumerate(rows):
        pending.append(row)
        all_rows.append(row)
        if i in batch_cuts:
            flush()
            if n_batches == 2:
                v.compact(spark)
    flush()
    if n_batches == 0:
        return

    from pyspark.sql import functions as F

    from etl_world_banks_with_python_and_postgresql_spark.operators import (
        sketch as S,
    )

    full = spark.createDataFrame(all_rows, "grp string, v int")
    want = {
        r["grp"]: r["est_distinct"]
        for r in S.kmv_distinct(full, "v", k=16, group_by="grp").collect()
    }
    got = {r["grp"]: r["est_distinct"] for r in v.read(spark).collect()}
    assert got == want
    # exactness whenever a group kept < k hashes (domain may exceed k=16
    # only via >16 distinct values; assert exact on the others)
    exact = {
        r["grp"]: r["n"]
        for r in full.groupBy("grp").agg(
            F.countDistinct("v").alias("n")
        ).collect()
    }
    for g, n in exact.items():
        if n < 16:
            assert got[g] == n
