"""Explicit StructType registry -- no schema inference anywhere.

Reference tables mirror the DDL in the reference repo
(`SQL/etl_world_banks.sql:4-7,11-16,182-184,291-293`); TESTDATA tables
mirror the driver-generated parquet fixtures (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference-shaped tables (SQL/etl_world_banks.sql) -----------------------

# etl.world_bank_data (SQL/etl_world_banks.sql:4-7). SCD-style versioned
# table: `active` marks the current row; history = inactive rows.
WORLD_BANK_DATA = T.StructType(
    [
        T.StructField("world_bank_id", T.LongType(), False),
        T.StructField("bank_name", T.StringType(), True),
        T.StructField("market_cap_usd", T.DoubleType(), True),
        T.StructField("last_modified_date", T.DateType(), True),
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),  # NULL on fresh insert
        T.StructField("active", T.BooleanType(), True),
    ]
)

# etl.exchanges_rates (SQL/etl_world_banks.sql:182-184); key (country,currency,year)
EXCHANGES_RATES = T.StructType(
    [
        T.StructField("exchange_rate_id", T.LongType(), False),
        T.StructField("country", T.StringType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("exchange_rate", T.DoubleType(), True),
        T.StructField("year", T.DateType(), True),
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

# etl.log_counts (SQL/etl_world_banks.sql:11-16); in this engine counter rows
# are immutable per-(batch, table) aggregate outputs, never mutated in place.
LOG_COUNTS = T.StructType(
    [
        T.StructField("table_name", T.StringType(), True),
        T.StructField("no_update_count", T.LongType(), True),
        T.StructField("update_count", T.LongType(), True),
        T.StructField("new_inserts_count", T.LongType(), True),
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# etl.process_logs (SQL/etl_world_banks.sql:291-293)
PROCESS_LOGS = T.StructType(
    [
        T.StructField("log_phase", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("datetime", T.TimestampType(), True),
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# Incoming batch shapes (the notebook's scraped+transformed frames,
# Python/etl_project_world_banks.ipynb:92-102,155-166)
WORLD_BANK_BATCH = T.StructType(
    [
        T.StructField("bank_name", T.StringType(), True),
        T.StructField("market_cap_usd", T.DoubleType(), True),
        T.StructField("last_modified_date", T.DateType(), True),
        T.StructField("batch_id", T.StringType(), True),
    ]
)

EXCHANGE_RATES_BATCH = T.StructType(
    [
        T.StructField("country", T.StringType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("exchange_rate", T.DoubleType(), True),
        T.StructField("year", T.DateType(), True),
        T.StructField("batch_id", T.StringType(), True),
    ]
)

# --- TESTDATA tables (TESTDATA.md / FIXTURES.md §B) --------------------------

TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}
