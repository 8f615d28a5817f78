#!/usr/bin/env python
"""Quickstart: everything the reference repo does, in one script.

Run:  python examples/quickstart.py

1. Scrapes the two HTML pages (local fixtures standing in for the live
   Wikipedia/IRS pages) and runs the full ETL: SCD merge + deactivation +
   mutation counters + audit logs -- the reference's `main()`
   (Python/etl_project_world_banks.ipynb:318-344) set-based.
2. Re-runs with changed data to show update/noop/deactivate transitions.
3. Runs the enrichment join the reference left as a TODO.
4. Shows two north-star operators over the synthetic corpus.
"""

import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_pipeline import BANKS, RATES, banks_html, rates_html  # fixture builders

from etl_world_banks_with_python_and_postgresql_spark.operators.dedup import (
    ngram_jaccard_pairs,
)
from etl_world_banks_with_python_and_postgresql_spark.operators.enrich import (
    enrich_market_caps,
)
from etl_world_banks_with_python_and_postgresql_spark.operators.similarity import (
    cosine_topk,
)
from etl_world_banks_with_python_and_postgresql_spark.pipeline import (
    PipelineConfig,
    run_pipeline,
)
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="quickstart")
    with tempfile.TemporaryDirectory() as tmp:
        banks_page = f"{tmp}/banks.html"
        rates_page = f"{tmp}/rates.html"
        open(banks_page, "w").write(banks_html(BANKS))
        open(rates_page, "w").write(rates_html(RATES))

        print("=== run 1: cold start ===")
        res = run_pipeline(
            spark,
            PipelineConfig(
                banks_source=banks_page,
                rates_source=rates_page,
                target_dir=f"{tmp}/warehouse",
                batch_id="run-1",
                now=datetime(2024, 8, 1, 6, 0, 0),
            ),
        )
        for line in res.summary_lines:
            print(" ", line)

        print("=== run 2: one bank changes, one disappears, one appears ===")
        banks2 = [("Bank A", 500.0), ("Bank K", 42.0)] + [
            (n, v) for n, v in BANKS if n not in ("Bank A", "Bank B")
        ]
        open(banks_page, "w").write(banks_html(banks2, lastmod="2 August 2024"))
        res2 = run_pipeline(
            spark,
            PipelineConfig(
                banks_source=banks_page,
                rates_source=rates_page,
                target_dir=f"{tmp}/warehouse",
                batch_id="run-2",
                now=datetime(2024, 8, 2, 6, 0, 0),
            ),
        )
        for line in res2.summary_lines[:3]:
            print(" ", line)

        print("=== current snapshot (active rows) ===")
        banks = spark.read.parquet(f"{tmp}/warehouse/world_bank_data")
        banks.filter("active").orderBy("bank_name").show(5, truncate=False)

        print("=== enrichment join (the reference's TODO, sql:317-318) ===")
        rates = spark.read.parquet(f"{tmp}/warehouse/exchanges_rates").selectExpr(
            "substring(currency, 1, 3) AS currency", "exchange_rate"
        )
        enrich_market_caps(
            banks.filter("active").select("bank_name", "market_cap_usd"),
            rates.limit(3).selectExpr("'GBP' AS currency", "exchange_rate").limit(1)
            .unionAll(rates.selectExpr("'EUR' AS currency", "exchange_rate").limit(1))
            .unionAll(rates.selectExpr("'INR' AS currency", "exchange_rate").limit(1)),
        ).show(3, truncate=False)

    print("=== north-star: near-duplicate documents (3-gram Jaccard >= 0.8) ===")
    ngram_jaccard_pairs(load(spark, "documents", SF), threshold=0.8).show(5)

    print("=== north-star: cosine top-3 neighbors ===")
    emb = load(spark, "embeddings", SF)
    cosine_topk(emb, emb.limit(2), k=3).show()


if __name__ == "__main__":
    main()
