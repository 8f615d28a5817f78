"""Enrichment join (J4): currency conversion columns.

The reference declares (but never implements) the final enrichment step:
"Add 3 columns MC_GBP_Billion, MC_EUR_Billion, MC_INR_Billion"
(SQL/etl_world_banks.sql:317-318). This operator realizes it Spark-first:
pivot the rates table to one row per (year), broadcast it (rates are a tiny
dimension), and project the converted columns -- no shuffle of the fact
side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CURRENCIES = ("GBP", "EUR", "INR")


def enrich_market_caps(
    banks: DataFrame,
    rates: DataFrame,
    currencies: tuple[str, ...] = DEFAULT_CURRENCIES,
    value_col: str = "market_cap_usd",
) -> DataFrame:
    """banks + MC_<CUR>_Billion columns (round 2, per the reference TODO).

    ``rates``: (currency, exchange_rate) -- already filtered to the target
    year. Missing currencies yield NULL columns rather than dropping rows
    (left join semantics).
    """
    pivoted = (
        rates.groupBy()
        .pivot("currency", list(currencies))
        .agg(F.first("exchange_rate"))
    )
    out = banks.crossJoin(F.broadcast(pivoted))
    for cur in currencies:
        out = out.withColumn(
            f"MC_{cur}_Billion", F.round(F.col(value_col) * F.col(cur), 2)
        )
    return out.drop(*[c for c in currencies])
