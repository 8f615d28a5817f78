"""Schema-drift canary for the driver-generated TESTDATA.

Round 2 was lost to a silent regeneration (events.ts flipped from
int64-nanos to timestamp[us] and every events consumer broke mid-gate).
This test pins the LOADED column types the engine's queries and oracles
assume, per table -- if a future regeneration drifts, it fails here at
round start with a readable diff instead of deep inside 13 query plans.

Date/timestamp columns accept either the NTZ or session-TZ flavor (the
oracle compares values, not flavors); everything else is exact.
"""

import pytest

from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import (
    TABLE_NAMES,
    load,
)

SF = "/root/testdata/sf0.001"

# name -> simpleString; "timestamp*" accepts timestamp / timestamp_ntz
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint",
        "o_orderstatus": "string", "o_totalprice": "double",
        "o_orderdate": "timestamp*", "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": "timestamp*",
    },
    "events": {
        "event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    },
}


@pytest.mark.parametrize("table", TABLE_NAMES)
def test_loaded_schema_matches_expectation(spark, table):
    got = {
        f.name: f.dataType.simpleString()
        for f in load(spark, table, SF).schema.fields
    }
    want = EXPECTED[table]
    assert set(got) == set(want), (
        f"{table}: column set drifted: got {sorted(got)}, want {sorted(want)}"
    )
    for col, t in want.items():
        if t == "timestamp*":
            assert got[col] in ("timestamp", "timestamp_ntz"), (table, col, got[col])
        else:
            assert got[col] == t, (
                f"{table}.{col}: TESTDATA dtype drifted to {got[col]!r} "
                f"(expected {t!r}) -- check sources/catalog.py load() "
                f"normalization before debugging query failures"
            )


def test_documents_text_is_ascii():
    """q77's SQL oracle equates payload BYTES with text code points, which
    is only true for pure-ASCII text. If the driver ever regenerates the
    corpus with non-ASCII content, fail here by name instead of letting
    q77 hash-mismatch mysteriously."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        (mx,) = duckdb.sql(
            "SELECT max(list_max([unicode(c) for c in string_split(text, '')]))"
            f" FROM '/root/testdata/sf{sf}/documents.parquet'"
        ).fetchone()
        assert mx is not None and mx < 128, (
            f"documents at sf{sf} contain non-ASCII text (max codepoint "
            f"{mx}); q77's byte-histogram oracle premise no longer holds"
        )
