"""Synthetic like-for-like replicas of the reference's two source pages.

The reference ETL scrapes a Wikipedia "largest banks" list (10 rows,
positional tbody[2] table + footer lastmod line) and an exchange-rates
table (39 rows, year column header) -- see ipynb:64-96 and
SQL/etl_world_banks.sql:1-19 for the shapes. These builders generate the
same structure deterministically so the pipeline, bench harness, and
tests all exercise the real HTML-scan path (nav-table skipping, header
sniffing, lastmod parse) without the network.

Lives in the package, not tests/: bench.py and examples need the same
fixtures, and importing test modules from a benchmark is a smell
(ADVICE r3).
"""

from __future__ import annotations

BANKS = [(f"Bank {c}", 100.0 + i) for i, c in enumerate("ABCDEFGHIJ")]
RATES = [(f"Country {i}", f"Cur{i}", round(0.5 + i * 0.1, 2)) for i in range(39)]


def banks_html(banks=BANKS, lastmod="1 July 2024") -> str:
    """Bank-list page: two nav filler tables ahead of the data table
    (the positional tbody[2] quirk), trailing-space market caps, and the
    footer-info-lastmod div the header scan sniffs."""
    rows = "\n".join(
        f"<tr><td>{i+1}</td><td>{name}</td><td> {cap} </td></tr>"
        for i, (name, cap) in enumerate(banks)
    )
    filler = "<table><tbody><tr><td>nav</td></tr></tbody></table>"
    return f"""
<html><body>
{filler}{filler}
<table>
  <thead><tr><th>Rank</th><th>Bank name</th><th>Market cap (US$ billion)</th></tr></thead>
  <tbody>{rows}</tbody>
</table>
<div id="footer-info-lastmod">This page was last edited on {lastmod}, at 12:34 (UTC).</div>
</body></html>
"""


def rates_html(rates=RATES, year=2023) -> str:
    """Exchange-rates page: first-tbody table whose year lives in the
    column header (the is-4-digit-year sniff)."""
    rows = "\n".join(
        f"<tr><td>{c}</td><td>{cur}</td><td>{r}</td></tr>" for c, cur, r in rates
    )
    return f"""
<html><body>
<table>
  <thead><tr><th>Country</th><th>Currency</th><th>{year}</th></tr></thead>
  <tbody>{rows}</tbody>
</table>
</body></html>
"""


def write_fixture_pages(dirpath: str) -> tuple[str, str]:
    """Write both pages under ``dirpath``; returns (banks_path, rates_path)."""
    import os

    b = os.path.join(dirpath, "banks.html")
    r = os.path.join(dirpath, "rates.html")
    with open(b, "w") as f:
        f.write(banks_html())
    with open(r, "w") as f:
        f.write(rates_html())
    return b, r
