"""LIVE execution of the staging + server-side merge sink protocol against
a real Postgres (the one reference behavior -- `ipynb:213-261` writing
through the `etl.*` procedures, `SQL/etl_world_banks.sql:20-122,188-248` --
that rounds 1-2 could only string-unit-test).

The sandbox has Postgres server binaries but no JDBC driver jar, so the
staging load goes through Spark-written CSV + `\\copy` instead of
``write_jdbc_append``; everything downstream of the staging table -- the
single server-side set-based merge statement, its atomicity, idempotency,
and parity with the engine's own snapshot semantics -- is the protocol
under test and runs for real. Skips cleanly when the binaries are absent.

The server runs as `nobody` on a unix socket (Postgres refuses root),
trust auth, no TCP.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
from datetime import date

import pytest

from etl_world_banks_with_python_and_postgresql_spark.sources.sinks import (
    jdbc_merge_sql,
    jdbc_upsert_sql,
)

PG_BASE = "/tmp/spark_graft_pgtest"

pytestmark = pytest.mark.skipif(
    not all(shutil.which(b) for b in ("initdb", "pg_ctl", "psql"))
    or (os.geteuid() == 0 and not shutil.which("setpriv")),
    reason="postgres binaries not available",
)


def _wrap(cmd: list[str]) -> list[str]:
    """Run as nobody when we are root (initdb/postgres refuse uid 0)."""
    if os.geteuid() != 0:
        return cmd
    return [
        "setpriv", "--reuid=nobody", "--regid=nogroup", "--clear-groups",
        "env", f"PATH={os.environ.get('PATH', '/usr/local/bin:/usr/bin:/bin')}",
        f"HOME={PG_BASE}",
    ] + cmd


@pytest.fixture(scope="module")
def pg():
    shutil.rmtree(PG_BASE, ignore_errors=True)
    os.makedirs(PG_BASE)
    if os.geteuid() == 0:
        shutil.chown(PG_BASE, "nobody", "nogroup")
    subprocess.run(
        _wrap(["initdb", "-D", f"{PG_BASE}/data", "--auth=trust", "-U", "pg"]),
        check=True, capture_output=True,
    )
    subprocess.run(
        _wrap([
            "pg_ctl", "-D", f"{PG_BASE}/data", "-l", f"{PG_BASE}/log",
            "-o", f"-k {PG_BASE} -c listen_addresses=", "start",
        ]),
        check=True, capture_output=True,
    )
    try:
        yield PG_BASE
    finally:
        subprocess.run(
            _wrap(["pg_ctl", "-D", f"{PG_BASE}/data", "stop", "-m", "fast"]),
            capture_output=True,
        )
        shutil.rmtree(PG_BASE, ignore_errors=True)


def psql(base: str, sql: str) -> list[list[str]]:
    r = subprocess.run(
        ["psql", "-h", base, "-U", "pg", "-d", "postgres", "-X", "-A", "-t",
         "-v", "ON_ERROR_STOP=1", "-c", sql],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return [line.split("|") for line in r.stdout.strip().splitlines() if line]


BATCH_SCHEMA = (
    "bank_name string, market_cap_usd double, "
    "last_modified_date date, batch_id string"
)
KEYS = ["bank_name"]
SET_COLS = ["market_cap_usd", "last_modified_date", "batch_id"]


def load_staging(base: str, df, tmp_path, table: str = "staging") -> None:
    """The Spark leg: partition-parallel staging export (CSV stands in for
    write_jdbc_append -- no driver jar in the sandbox), then a bulk COPY."""
    out = str(tmp_path / "staging_csv")
    shutil.rmtree(out, ignore_errors=True)
    # Escape discipline (test_staging_escape_discipline_adversarial):
    #   escape='"'    RFC-4180 doubled quotes -- Spark's default backslash
    #                 escape corrupts embedded quotes under PG CSV COPY;
    #   default null/empty rendering -- null -> unquoted empty, '' -> "";
    #                 matches PG CSV NULL '' exactly, and a literal '\N'
    #                 string stays a string (a \N null marker cannot be
    #                 round-tripped: Spark never quotes the marker, so
    #                 data equal to it would collapse to NULL).
    #   ignore*WhiteSpace=false -- the writer defaults TRIM leading and
    #                 trailing whitespace from unquoted values (!)
    (
        df.coalesce(1)
        .write.option("escape", '"')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
    )
    part = glob.glob(f"{out}/part-*.csv")[0]
    psql(base, f"TRUNCATE {table}")
    r = subprocess.run(
        ["psql", "-h", base, "-U", "pg", "-d", "postgres", "-X",
         "-v", "ON_ERROR_STOP=1",
         "-c", f"\\copy {table} FROM '{part}' WITH (FORMAT csv)"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr


def target_state(base: str, table: str = "target") -> list[tuple]:
    return [
        (r[0], float(r[1]), r[2], r[3])
        for r in psql(
            base,
            f"SELECT bank_name, market_cap_usd, last_modified_date, batch_id "
            f"FROM {table} ORDER BY bank_name",
        )
    ]


@pytest.fixture(scope="module")
def tables(pg):
    ddl = (
        "bank_name text PRIMARY KEY, market_cap_usd double precision, "
        "last_modified_date date, batch_id text"
    )
    psql(pg, f"CREATE TABLE target ({ddl})")
    psql(pg, f"CREATE TABLE target_merge ({ddl})")
    psql(pg, "CREATE TABLE staging (LIKE target)")
    return pg


def test_staging_upsert_protocol_live(tables, spark, tmp_path):
    pg = tables
    upsert = jdbc_upsert_sql("staging", "target", KEYS, SET_COLS)
    merge = jdbc_merge_sql("staging", "target_merge", KEYS, SET_COLS)

    b1 = spark.createDataFrame(
        [
            ("Bank A", 100.0, date(2024, 7, 1), "b1"),
            ("Bank B", 200.0, date(2024, 7, 1), "b1"),
            ("Bank C", 300.0, date(2024, 7, 1), "b1"),
        ],
        BATCH_SCHEMA,
    )
    load_staging(pg, b1, tmp_path)
    psql(pg, upsert)
    psql(pg, merge)
    assert target_state(pg) == [
        ("Bank A", 100.0, "2024-07-01", "b1"),
        ("Bank B", 200.0, "2024-07-01", "b1"),
        ("Bank C", 300.0, "2024-07-01", "b1"),
    ]

    # batch 2: one update, one new, one identical re-send; Bank C absent
    b2 = spark.createDataFrame(
        [
            ("Bank A", 150.0, date(2024, 7, 2), "b2"),
            ("Bank B", 200.0, date(2024, 7, 1), "b2"),
            ("Bank D", 400.0, date(2024, 7, 2), "b2"),
        ],
        BATCH_SCHEMA,
    )
    load_staging(pg, b2, tmp_path)
    psql(pg, upsert)
    psql(pg, merge)
    expected = [
        ("Bank A", 150.0, "2024-07-02", "b2"),
        ("Bank B", 200.0, "2024-07-01", "b2"),
        ("Bank C", 300.0, "2024-07-01", "b1"),  # absent rows are preserved
        ("Bank D", 400.0, "2024-07-02", "b2"),
    ]
    assert target_state(pg) == expected

    # re-running the same staging batch is idempotent (safe replay)
    psql(pg, upsert)
    psql(pg, merge)
    assert target_state(pg) == expected

    # both protocol variants (ON CONFLICT for PG 9.5+, MERGE for 15+)
    # converge to the same table state
    assert target_state(pg, "target_merge") == target_state(pg, "target")


def test_merge_is_transactional(tables, spark, tmp_path):
    """A failing statement leaves the target untouched (the atomicity the
    reference got from its single conn.commit(), ipynb:263)."""
    pg = tables
    before = target_state(pg)
    # key-duplicate staging rows make ON CONFLICT raise mid-statement
    dup = spark.createDataFrame(
        [
            ("Bank E", 1.0, date(2024, 7, 3), "b3"),
            ("Bank E", 2.0, date(2024, 7, 3), "b3"),
        ],
        BATCH_SCHEMA,
    )
    load_staging(pg, dup, tmp_path)
    r = subprocess.run(
        ["psql", "-h", pg, "-U", "pg", "-d", "postgres", "-X",
         "-v", "ON_ERROR_STOP=1",
         "-c", jdbc_upsert_sql("staging", "target", KEYS, SET_COLS)],
        capture_output=True, text=True,
    )
    assert r.returncode != 0  # statement rejected...
    assert target_state(pg) == before  # ...and nothing was applied


# ---------------------------------------------------------------------
# Exchange-rates variant: 3-part natural key (country, currency, year),
# reference procedure SQL/etl_world_banks.sql:188-248 -- including its buggy
# update branch (sql:210 `update_at` typo -> EXCEPTION sql:244-247 ->
# per-row notice-and-skip), reproduced set-based as ON CONFLICT DO
# NOTHING (sinks.jdbc_insert_only_sql).
# ---------------------------------------------------------------------

RATES_SCHEMA = (
    "country string, currency string, year int, "
    "exchange_rate double, batch_id string"
)
RATES_KEYS = ["country", "currency", "year"]
RATES_SET = ["exchange_rate", "batch_id"]


def rates_state(base: str, table: str) -> list[tuple]:
    return [
        (r[0], r[1], int(r[2]), float(r[3]), r[4])
        for r in psql(
            base,
            f"SELECT country, currency, year, exchange_rate, batch_id "
            f"FROM {table} ORDER BY country, currency, year",
        )
    ]


@pytest.fixture(scope="module")
def rates_tables(pg):
    ddl = (
        "country text, currency text, year int, "
        "exchange_rate double precision, batch_id text, "
        "PRIMARY KEY (country, currency, year)"
    )
    for t in ("rates_target", "rates_merge", "rates_compat"):
        psql(pg, f"CREATE TABLE {t} ({ddl})")
    psql(pg, "CREATE TABLE rates_staging (LIKE rates_target)")
    return pg


def test_rates_three_key_merge_live(rates_tables, spark, tmp_path):
    """Both correct protocol variants (ON CONFLICT DO UPDATE, MERGE) on the
    3-part key: insert / update / identical re-send / absent-key
    preservation / idempotent replay, run live."""
    pg = rates_tables
    upsert = jdbc_upsert_sql("rates_staging", "rates_target", RATES_KEYS, RATES_SET)
    merge = jdbc_merge_sql("rates_staging", "rates_merge", RATES_KEYS, RATES_SET)

    b1 = spark.createDataFrame(
        [
            ("UK", "GBP", 2023, 0.80, "b1"),
            ("France", "EUR", 2023, 0.90, "b1"),
            ("India", "INR", 2023, 83.0, "b1"),
            # same country+currency, different year: distinct key rows
            ("India", "INR", 2022, 79.0, "b1"),
        ],
        RATES_SCHEMA,
    )
    load_staging(pg, b1, tmp_path, "rates_staging")
    psql(pg, upsert)
    psql(pg, merge)
    expected1 = [
        ("France", "EUR", 2023, 0.90, "b1"),
        ("India", "INR", 2022, 79.0, "b1"),
        ("India", "INR", 2023, 83.0, "b1"),
        ("UK", "GBP", 2023, 0.80, "b1"),
    ]
    assert rates_state(pg, "rates_target") == expected1

    b2 = spark.createDataFrame(
        [
            ("UK", "GBP", 2023, 0.82, "b2"),       # rate update
            ("France", "EUR", 2023, 0.90, "b2"),   # identical re-send
            ("Japan", "JPY", 2023, 150.0, "b2"),   # new key
            # 2022 India row absent -> must be preserved
        ],
        RATES_SCHEMA,
    )
    load_staging(pg, b2, tmp_path, "rates_staging")
    psql(pg, upsert)
    psql(pg, merge)
    expected2 = [
        ("France", "EUR", 2023, 0.90, "b2"),
        ("India", "INR", 2022, 79.0, "b1"),
        ("India", "INR", 2023, 83.0, "b1"),
        ("Japan", "JPY", 2023, 150.0, "b2"),
        ("UK", "GBP", 2023, 0.82, "b2"),
    ]
    assert rates_state(pg, "rates_target") == expected2

    # idempotent replay + variant convergence
    psql(pg, upsert)
    psql(pg, merge)
    assert rates_state(pg, "rates_target") == expected2
    assert rates_state(pg, "rates_merge") == expected2


def test_rates_compat_update_bug_live(rates_tables, spark, tmp_path):
    """The reference's notice-and-skip update branch, live: matched keys
    keep their OLD row (the buggy procedure aborts every UPDATE per-row),
    new keys still insert -- exactly what compat_rates_update_bug
    reproduces engine-side."""
    from etl_world_banks_with_python_and_postgresql_spark.sources.sinks import (
        jdbc_insert_only_sql,
    )

    pg = rates_tables
    compat = jdbc_insert_only_sql(
        "rates_staging", "rates_compat", RATES_KEYS, RATES_SET
    )

    b1 = spark.createDataFrame(
        [("UK", "GBP", 2023, 0.80, "b1"), ("France", "EUR", 2023, 0.90, "b1")],
        RATES_SCHEMA,
    )
    load_staging(pg, b1, tmp_path, "rates_staging")
    psql(pg, compat)
    b2 = spark.createDataFrame(
        [
            ("UK", "GBP", 2023, 0.99, "b2"),      # update -> SKIPPED (bug)
            ("Japan", "JPY", 2023, 150.0, "b2"),  # insert -> applied
        ],
        RATES_SCHEMA,
    )
    load_staging(pg, b2, tmp_path, "rates_staging")
    psql(pg, compat)
    assert rates_state(pg, "rates_compat") == [
        ("France", "EUR", 2023, 0.90, "b1"),
        ("Japan", "JPY", 2023, 150.0, "b2"),
        ("UK", "GBP", 2023, 0.80, "b1"),  # old rate survives the "update"
    ]


def test_staging_escape_discipline_adversarial(tables, spark, tmp_path):
    """Round-trip adversarial values through the CSV + \\copy staging path
    (VERDICT r4 task #5): embedded delimiters/quotes/newlines, the literal
    string '\\N' vs a true NULL, empty-vs-NULL, Unicode, padding. JDBC
    batch inserts ship values verbatim, so the CSV leg must reproduce
    byte-identical values for the staging substitute to be trustworthy."""
    pg = tables
    nasty = [
        ("comma, name", 1.0, date(2024, 7, 1), "b1"),
        ('quote " name', 2.0, date(2024, 7, 1), "b1"),
        ("newline\nname", 3.0, date(2024, 7, 1), "b1"),
        ("tab\tname", 4.0, date(2024, 7, 1), "b1"),
        ("backslash \\ name", 5.0, date(2024, 7, 1), "b1"),
        ("\\N", 6.0, date(2024, 7, 1), "b1"),         # literal backslash-N
        ("Banque Générale 銀行", 7.0, date(2024, 7, 1), "b1"),
        ("  padded  ", 8.0, date(2024, 7, 1), "b1"),
        ("null batch", 9.0, date(2024, 7, 1), None),   # true NULL col
        ("empty batch", 10.0, date(2024, 7, 1), ""),   # empty string col
    ]
    df = spark.createDataFrame(nasty, BATCH_SCHEMA)
    load_staging(pg, df, tmp_path)
    got = psql(
        pg,
        "SELECT bank_name, market_cap_usd::text, "
        "coalesce('<' || batch_id || '>', 'NULL') FROM staging "
        "ORDER BY market_cap_usd",
    )
    # psql -A prints rows pipe-separated; embedded newlines split lines, so
    # compare against a canonical server-side digest instead
    digest = psql(
        pg,
        "SELECT md5(string_agg("
        "  coalesce(bank_name, '<null>') || '|' || market_cap_usd::text"
        "  || '|' || coalesce('<' || batch_id || '>', 'NULL'),"
        "  E'\\n' ORDER BY market_cap_usd)) FROM staging",
    )[0][0]
    import hashlib

    expected_lines = []
    for name, cap, _, batch in sorted(nasty, key=lambda r: r[1]):
        cap_txt = str(int(cap)) if cap == int(cap) else str(cap)
        batch_txt = f"<{batch}>" if batch is not None else "NULL"
        expected_lines.append(f"{name}|{cap_txt}|{batch_txt}")
    expected = hashlib.md5("\n".join(expected_lines).encode()).hexdigest()
    assert digest == expected, f"staging escape mismatch (psql view: {got})"
