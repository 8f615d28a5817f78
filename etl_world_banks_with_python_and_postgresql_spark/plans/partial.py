"""Partial oracles for the two registry entries whose FULL results are
approximate/iterative by design (VERDICT r12 #1): the driver's SQL-twin
gate cannot bit-compare them, but large parts of their output contract
ARE exactly checkable against DuckDB, and those parts deserve the same
mechanical cross-engine verification as everything else.

- ``q51_approx_sketches``: the sketch VALUES (HLL distinct estimate,
  quantile sketch median) legitimately differ across engines, but the
  grouping keys, the exact COUNT(*) column, the row count, the schema,
  and the error ENVELOPES around the true values are all exact claims.
  The checker pins: identical flag set, bit-exact n_rows per flag,
  |approx_parts/exact - 1| <= 3 * rsd (rsd = 0.05, Spark's
  approx_count_distinct default), and approx_median_price BETWEEN the
  exact 0.48 and 0.52 quantiles AND a member of that flag's actual
  price set (percentile_approx returns a real data value).

- ``q60_ivf_kmeans_topk``: Lloyd training is iterative (not
  SQL-expressible) and WHICH neighbors surface depends on the trained
  cells, but every claim about the RETURNED rows is exact: the
  checker recomputes round(cosine, 6) for each returned
  (query, neighbor) pair in DuckDB over the same parquet (the q38
  double-cast fold, proven bit-exact) and demands bit-equality, checks
  the per-query rank sequences are contiguous and ordered by
  (cos_sim DESC, neighbor_id ASC), that every expected query id is
  served, and that recall against the DuckDB brute-force exact top-k
  (computed WITHOUT Spark) clears the same floor the engine test pins.

Checkers run under diag.py beside the bit-exact gate (summary key
``partial_oracle: true``) and in tests/test_partial_oracles.py. Each
returns a dict with an overall ``ok`` plus per-claim fields so a red
cell is attributable, never guessable (the DIAG design rule).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# q51 envelope constants -- Spark defaults, frozen here so the checker
# fails loudly if the entry ever changes its accuracy knobs silently.
Q51_RSD = 0.05  # approx_count_distinct default relative std deviation
Q51_RSD_SIGMAS = 3.0
Q51_MEDIAN_LO, Q51_MEDIAN_HI = 0.48, 0.52  # percentile_approx default
# accuracy is 10000 (rank error 1e-4); +/-0.02 rank slack is ~200x that

# Pinned just under the frozen-configuration measured band (VERDICT
# r13 #2): q60 runs n_centroids=8, n_iter=2, n_probe=3, k=5 over the
# deterministic kmeans_centroids seeding, and measures recall 0.66 at
# sf0.01 (DIAG_r13_full) -- a probe-routing regression that halves
# recall must now FAIL the gate. The engine test
# (test_ivf_kmeans_centroids_recall) keeps its own looser floor for
# its different data/config.
Q60_RECALL_FLOOR = 0.6
Q60_K = 5
Q60_QUERY_MOD = 50  # q60's query predicate: vec_id % 50 == 0


def check_q51(spark, con, sf_dir: str, qs: dict) -> dict[str, Any]:
    rows = qs["q51_approx_sketches"](spark, sf_dir).collect()
    got_cols = sorted(rows[0].asDict().keys()) if rows else []
    exact = {
        flag: (parts, n, lo, hi)
        for flag, parts, n, lo, hi in con.execute(
            """
            SELECT l_returnflag,
                   count(DISTINCT l_partkey),
                   count(*),
                   quantile_disc(l_extendedprice, 0.48),
                   quantile_disc(l_extendedprice, 0.52)
            FROM lineitem GROUP BY l_returnflag
            """
        ).fetchall()
    }
    member_prices = {
        flag: set(
            p
            for (p,) in con.execute(
                "SELECT DISTINCT l_extendedprice FROM lineitem "
                "WHERE l_returnflag = ?",
                [flag],
            ).fetchall()
        )
        for flag in exact
    }
    claims = {
        "schema_ok": got_cols
        == ["approx_median_price", "approx_parts", "l_returnflag", "n_rows"],
        "flag_set_ok": sorted(r["l_returnflag"] for r in rows)
        == sorted(exact),
        "n_rows_exact": True,
        "approx_parts_in_envelope": True,
        "median_in_quantile_band": True,
        "median_is_member_value": True,
    }
    detail: list[dict] = []
    for r in rows:
        flag = r["l_returnflag"]
        parts_true, n_true, q_lo, q_hi = exact[flag]
        rel = abs(r["approx_parts"] / parts_true - 1.0)
        d = {
            "flag": flag,
            "n_rows": [r["n_rows"], n_true],
            "approx_parts": r["approx_parts"],
            "exact_parts": parts_true,
            "rel_err": round(rel, 4),
            "median": r["approx_median_price"],
            "quantile_band": [q_lo, q_hi],
        }
        detail.append(d)
        if r["n_rows"] != n_true:
            claims["n_rows_exact"] = False
        if rel > Q51_RSD_SIGMAS * Q51_RSD:
            claims["approx_parts_in_envelope"] = False
        if not (q_lo <= r["approx_median_price"] <= q_hi):
            claims["median_in_quantile_band"] = False
        if r["approx_median_price"] not in member_prices[flag]:
            claims["median_is_member_value"] = False
    return {"ok": all(claims.values()), **claims, "groups": detail}


def check_q60(spark, con, sf_dir: str, qs: dict) -> dict[str, Any]:
    df = qs["q60_ivf_kmeans_topk"](spark, sf_dir)
    got_cols = sorted(df.columns)
    rows = [
        tuple(r)
        for r in df.select(
            "query_id", "neighbor_id", "cos_sim", "rank"
        ).collect()
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["query_id", "neighbor_id", "cos_sim", "rank"]
    )
    con.register("_q60_spark", pdf)
    try:
        # exact-distance claim: DuckDB recomputes round(cos, 6) for the
        # RETURNED pairs over the same parquet -- the q38 bit-exact fold
        n_dist_bad = con.execute(
            """
            WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v
                       FROM embeddings)
            SELECT count(*) FROM _q60_spark s
            JOIN e q ON q.vec_id = s.query_id
            JOIN e n ON n.vec_id = s.neighbor_id
            WHERE round(list_dot_product(q.v, n.v)
                        / (sqrt(list_dot_product(q.v, q.v))
                           * sqrt(list_dot_product(n.v, n.v))), 6)
                  IS DISTINCT FROM s.cos_sim
            """
        ).fetchone()[0]
        # rank contract: per query, ranks are 1..n (n <= k) and agree
        # with (cos_sim DESC, neighbor_id ASC) over the returned rows
        n_rank_bad = con.execute(
            f"""
            SELECT count(*) FROM (
              SELECT rank,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id) AS want
              FROM _q60_spark)
            WHERE rank IS DISTINCT FROM want OR rank > {Q60_K}
            """
        ).fetchone()[0]
        # coverage claim: every expected query id is served
        n_missing_q = con.execute(
            f"""
            SELECT count(*) FROM embeddings
            WHERE vec_id % {Q60_QUERY_MOD} = 0
              AND vec_id NOT IN (SELECT query_id FROM _q60_spark)
            """
        ).fetchone()[0]
        # recall vs the DuckDB-only brute-force exact top-k
        hits, denom = con.execute(
            f"""
            WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e
                  WHERE vec_id % {Q60_QUERY_MOD} = 0),
            scored AS (
              SELECT query_id, e.vec_id AS neighbor_id,
                     round(list_dot_product(qv, v)
                           / (sqrt(list_dot_product(qv, qv))
                              * sqrt(list_dot_product(v, v))), 6) AS c
              FROM q CROSS JOIN e WHERE e.vec_id != query_id),
            topk AS (
              SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY c DESC, neighbor_id) AS rnk FROM scored)
              WHERE rnk <= {Q60_K})
            SELECT
              (SELECT count(*) FROM topk t
               JOIN _q60_spark s USING (query_id, neighbor_id)),
              (SELECT count(*) FROM topk)
            """
        ).fetchone()
    finally:
        con.unregister("_q60_spark")
    recall = hits / denom if denom else 0.0
    claims = {
        "schema_ok": got_cols
        == ["cos_sim", "neighbor_id", "query_id", "rank"],
        "distances_bit_exact": n_dist_bad == 0,
        "ranks_consistent": n_rank_bad == 0,
        "all_queries_served": n_missing_q == 0,
        "recall_above_floor": recall >= Q60_RECALL_FLOOR,
    }
    return {
        "ok": all(claims.values()),
        **claims,
        "n_pairs": len(rows),
        "n_dist_mismatch": n_dist_bad,
        "n_rank_mismatch": n_rank_bad,
        "n_missing_queries": n_missing_q,
        "recall": round(recall, 4),
        "recall_floor": Q60_RECALL_FLOOR,
    }


# name -> checker(spark, duckdb_con_with_views, sf_dir, queries_dict)
PARTIAL_ORACLES: dict[str, Callable] = {
    "q51_approx_sketches": check_q51,
    "q60_ivf_kmeans_topk": check_q60,
}
