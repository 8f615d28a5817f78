"""LIVE Spark JDBC write/read leg (VERDICT r13 #4): the sandbox has no
Postgres JDBC jar, but it DOES have DuckDB's JDBC driver -- and
``write_jdbc_append`` is driver-agnostic (url + driver option only), so
the partition-parallel batched JDBC write path, the JDBC read-back, and
the downstream staging->upsert protocol all execute for real here:

    Spark df --write_jdbc_append--> duckdb file (org.duckdb.DuckDBDriver)
             --spark.read.jdbc----> row/schema verification
             --duckdb client------> jdbc_upsert_sql / jdbc_insert_only_sql
                                    against a PK'd target, state asserted

Runs in a SUBPROCESS because the jar must be on the driver classpath at
session creation (the shared test session has no spark.jars). Skips
when the jar is absent. The python duckdb client and the jar are both
1.0.0 -- identical storage format, either side can open the file (the
Spark session is stopped first; DuckDB is single-writer)."""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

JARS = glob.glob(
    "/root/.cache/coursier/**/duckdb_jdbc-*.jar", recursive=True
) or glob.glob(
    os.environ.get("SPARK_GRAFT_DUCKDB_JDBC_JAR", "/nonexistent")
)

pytestmark = pytest.mark.skipif(
    not JARS, reason="duckdb JDBC driver jar not available"
)

CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "2"
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "1g"
from datetime import date

import duckdb

from etl_world_banks_with_python_and_postgresql_spark.session import get_spark
from etl_world_banks_with_python_and_postgresql_spark.sources.sinks import (
    jdbc_available,
    jdbc_insert_only_sql,
    jdbc_upsert_sql,
    write_jdbc_append,
)

db = {db!r}
url = f"jdbc:duckdb:{{db}}"
props = {{"driver": "org.duckdb.DuckDBDriver"}}

# server-side DDL FIRST (the real staging protocol: tables exist before
# batches land; also Spark 4's tableExists probe rethrows DuckDB's
# SQLState-less 'no such table' error instead of treating it as
# absent). python duckdb and the jar are both 1.0.0 -- same format.
con = duckdb.connect(db)
con.execute(
    "CREATE TABLE staging (bank_name VARCHAR, market_cap_usd DOUBLE,"
    " last_modified_date DATE, batch_id VARCHAR)"
)
con.execute(
    "CREATE TABLE target (bank_name VARCHAR PRIMARY KEY,"
    " market_cap_usd DOUBLE, last_modified_date DATE, batch_id VARCHAR)"
)
con.execute(
    "INSERT INTO target VALUES"
    " ('Bank A', 1.0, DATE '2024-06-01', 'b0'),"   # stale -> updated
    " ('Bank Z', 9.0, DATE '2024-06-01', 'b0')"    # untouched
)
con.close()  # release the write lock before the JVM connects

# extraClassPath, not spark.jars: the JDBC DriverManager lookup happens
# in the DRIVER's root classloader (Class.forName), which spark.jars
# (addJar, executor-side) does not feed; this subprocess launches a
# fresh JVM so the static classpath option takes effect
spark = get_spark(
    app_name="jdbc-live",
    extra_conf={{
        "spark.driver.extraClassPath": {jar!r},
        "spark.executor.extraClassPath": {jar!r},
    }},
)
assert jdbc_available(spark, "org.duckdb.DuckDBDriver"), "driver not on classpath"
assert not jdbc_available(spark, "org.postgresql.Driver"), (
    "postgres jar appeared -- promote this test to a real postgres round trip"
)

df = spark.createDataFrame(
    [
        ("Bank A", 100.5, date(2024, 7, 1), "b1"),
        ("Bank B", 200.0, date(2024, 7, 1), "b1"),
        ("Bank C", 300.25, date(2024, 7, 2), "b1"),
    ],
    "bank_name string, market_cap_usd double, "
    "last_modified_date date, batch_id string",
).repartition(2)  # exercise the partition-parallel write, not one task
write_jdbc_append(df, url, "staging", props, batchsize=2)

back = (
    spark.read.format("jdbc").option("url", url)
    .option("dbtable", "staging").options(**props).load()
)
rows = sorted((r[0], r[1], str(r[2]), r[3]) for r in back.collect())
assert rows == [
    ("Bank A", 100.5, "2024-07-01", "b1"),
    ("Bank B", 200.0, "2024-07-01", "b1"),
    ("Bank C", 300.25, "2024-07-02", "b1"),
], rows
spark.stop()

con = duckdb.connect(db)
KEYS, SET = ["bank_name"], ["market_cap_usd", "last_modified_date", "batch_id"]
con.execute(jdbc_upsert_sql("staging", "target", KEYS, SET))
got = con.execute(
    "SELECT bank_name, market_cap_usd, batch_id FROM target ORDER BY 1"
).fetchall()
assert got == [
    ("Bank A", 100.5, "b1"), ("Bank B", 200.0, "b1"),
    ("Bank C", 300.25, "b1"), ("Bank Z", 9.0, "b0"),
], got

# insert-only variant (the rates compat-bug semantics): matched keys
# keep their row, only new keys insert
con.execute("UPDATE staging SET market_cap_usd = -1, batch_id = 'b2'")
con.execute("INSERT INTO staging VALUES ('Bank D', 4.0, DATE '2024-07-04', 'b2')")
con.execute(jdbc_insert_only_sql("staging", "target", KEYS, SET))
got2 = con.execute(
    "SELECT bank_name, market_cap_usd, batch_id FROM target ORDER BY 1"
).fetchall()
assert got2 == [
    ("Bank A", 100.5, "b1"), ("Bank B", 200.0, "b1"),
    ("Bank C", 300.25, "b1"), ("Bank D", 4.0, "b2"), ("Bank Z", 9.0, "b0"),
], got2
print("JDBC_LIVE_OK")
"""


def test_spark_jdbc_write_read_and_staging_protocol_live(tmp_path):
    db = str(tmp_path / "live.db")
    script = CHILD.format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        db=db,
        jar=JARS[0],
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "JDBC_LIVE_OK" in proc.stdout, proc.stdout[-2000:]
