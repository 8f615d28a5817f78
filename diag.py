"""Gate-mirror diagnostic dump: make driver-side correctness failures
attributable instead of guessable.

For each named registry query (default: the driver's gated window = the
first 50 sorted names), runs BOTH engines the way the driver does
(column-name-sorted, order-insensitive rows) and writes one JSON artifact
per query containing the exact rows from each engine, with every float
annotated with its raw IEEE-754 bit pattern and its ulp-distance to the
nearest decimal rounding half-boundary. If a CORRECTNESS cell ever reds
again, the next round diffs exact bits against the driver's view instead
of speculating (VERDICT r4, task #2).

Usage:
    python diag.py                     # gated 50 -> DIAG_r<N>/ (auto N)
    python diag.py q49_train_pipeline  # one query
    python diag.py --sf-dir /root/testdata/sf0.01 --out DIAG_r05
    python diag.py --changed-since <gitref>   # every registry entry whose
        # implementation (transitively, via the package import graph)
        # touches a file changed since <gitref> -- the mechanical
        # end-of-round attestation mode (VERDICT r7 task #3): run before
        # the snapshot commit so DIAG_r<N> covers exactly what the round
        # touched, generated at HEAD.
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import struct
import sys


def float_bits(v: float) -> str:
    return struct.pack(">d", v).hex()


def ulp(v: float) -> float:
    return math.ulp(v) if v != 0 else math.ulp(0.0)


def ulp_to_half_boundary(v: float, scales=(2, 4, 6)) -> float | None:
    """Min distance (in ulps of v) from v to the nearest x.5*10^-s decimal
    rounding half-boundary across the given scales. Small values flag the
    cross-engine round-divergence class; None = comfortably far (>1e6)."""
    if not math.isfinite(v):
        return None
    best = None
    for s in scales:
        p = 10**s
        # nearest half-boundary: (k + 0.5) / p for integer k
        k = math.floor(v * p)
        for kk in (k - 1, k, k + 1):
            b = (kk + 0.5) / p
            d = abs(v - b) / ulp(v)
            if best is None or d < best:
                best = d
    return round(best, 3) if best is not None and best < 1e6 else None


def norm_cell(v):
    """JSON-safe cell with float forensics."""
    if isinstance(v, bool) or v is None or isinstance(v, int):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return {"f": "nan"}
        out = {"f": repr(v), "bits": float_bits(v)}
        d = ulp_to_half_boundary(v)
        if d is not None:
            out["ulp_to_half_boundary"] = d
        return out
    return str(v)


def row_sort_key(row):
    return [(str(type(c)), str(c)) for c in row]


def dump_query(spark, con, qs, osql, name: str, out_dir: str,
               summary_only: bool = False) -> dict:
    sdf = qs[name](spark, SF_DIR)
    cols = sdf.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    s_rows = sorted(
        [tuple(r[i] for i in order) for r in sdf.collect()], key=row_sort_key
    )
    sql = osql.get(name)
    d_rows, d_cols = None, None
    if sql:
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        dorder = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        d_rows = sorted(
            [tuple(r[i] for i in dorder) for r in res.fetchall()],
            key=row_sort_key,
        )
    mismatches = []
    if d_rows is not None and len(s_rows) == len(d_rows):
        for ri, (ra, rb) in enumerate(zip(s_rows, d_rows)):
            for ci, (a, b) in enumerate(zip(ra, rb)):
                same = (
                    struct.pack(">d", a) == struct.pack(">d", b)
                    if isinstance(a, float) and isinstance(b, float)
                    else a == b
                )
                if not same:
                    mismatches.append(
                        {"row": ri, "col": sorted(cols)[ci],
                         "spark": norm_cell(a), "oracle": norm_cell(b)}
                    )
    art = {
        "query": name,
        "sf_dir": SF_DIR,
        "columns": sorted(cols),
        "n_rows_spark": len(s_rows),
        "n_rows_oracle": len(d_rows) if d_rows is not None else None,
        "bit_exact": d_rows is not None
        and len(s_rows) == len(d_rows)
        and not mismatches,
        "mismatches": mismatches[:50],
        "spark_rows": [[norm_cell(c) for c in r] for r in s_rows],
        "oracle_rows": (
            [[norm_cell(c) for c in r] for r in d_rows]
            if d_rows is not None
            else None
        ),
    }
    if not summary_only:
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(art, f, separators=(",", ":"))
    return {
        "bit_exact": art["bit_exact"],
        "rows": len(s_rows),
        "n_mismatch": len(mismatches),
    }


PKG = "etl_world_banks_with_python_and_postgresql_spark"


def _module_of(path: str) -> str | None:
    """repo-relative .py path -> dotted module name, package files only."""
    if not (path.startswith(PKG + os.sep) or path.startswith(PKG + "/")):
        return None
    if not path.endswith(".py"):
        return None
    mod = path[:-3].replace("/", ".").replace(os.sep, ".")
    return mod[:-9] if mod.endswith(".__init__") else mod


def _package_import_graph() -> dict[str, set[str]]:
    """Static (ast-level) module -> imported-package-modules graph over
    the whole package; the transitive closure of an entry's defining
    module is its implementation surface."""
    import ast

    graph: dict[str, set[str]] = {}
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            mod = _module_of(os.path.relpath(path))
            if mod is None:
                continue
            deps: set[str] = set()
            tree = ast.parse(open(path).read(), filename=path)
            # Relative imports resolve against __package__: for a
            # package module (__init__.py, whose ".__init__" suffix
            # _module_of stripped) that is the module ITSELF, not its
            # parent -- `from .ivm import X` in operators/__init__.py
            # means pkg.operators.ivm, not pkg.ivm (ADVICE r8).
            pkg_parts = (
                mod.split(".") if fn == "__init__.py" else mod.split(".")[:-1]
            )
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    for a in node.names:
                        if a.name.startswith(PKG):
                            deps.add(a.name)
                elif isinstance(node, ast.ImportFrom):
                    if node.level:  # relative: resolve against pkg_parts
                        base = pkg_parts[: len(pkg_parts) - node.level + 1]
                        stem = ".".join(base + ([node.module] if node.module else []))
                    else:
                        stem = node.module or ""
                    if stem.startswith(PKG):
                        deps.add(stem)
                        # `from .operators import ivm` imports MODULES too
                        for a in node.names:
                            deps.add(f"{stem}.{a.name}")
            graph[mod] = deps
    # prune names that aren't actual package modules (class/function froms)
    mods = set(graph)
    return {m: {d for d in deps if d in mods} for m, deps in graph.items()}


def _closure(mod: str, graph: dict[str, set[str]]) -> set[str]:
    seen, stack = set(), [mod]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(graph.get(m, ()))
    return seen


def changed_entries(gitref: str, qs: dict) -> list[str]:
    """Registry entries whose defining module's transitive package
    import closure intersects the files changed since ``gitref``.
    A change to __spark_entry__.py itself selects everything."""
    import subprocess

    out = subprocess.run(
        ["git", "diff", "--name-only", gitref, "--", "*.py"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    if "__spark_entry__.py" in out:
        return sorted(qs)
    changed = {m for p in out if (m := _module_of(p))}
    if not changed:
        return []
    graph = _package_import_graph()
    hits = []
    for name, fn in qs.items():
        mod = getattr(fn, "__module__", "")
        if mod and _closure(mod, graph) & changed:
            hits.append(name)
    return sorted(hits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="registry query names (default: gated 50)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--summary-only", action="store_true",
        help="write only SUMMARY.json (bit-exact flags), no row dumps",
    )
    ap.add_argument(
        "--changed-since", default=None, metavar="GITREF",
        help="select every registry entry whose implementation touches a "
             "file changed since GITREF (transitive package imports)",
    )
    args = ap.parse_args()

    global SF_DIR
    SF_DIR = args.sf_dir

    out_dir = args.out
    if out_dir is None:
        rounds = [
            int(m.group(1))
            for p in glob.glob("CORRECTNESS_r*.json")
            if (m := re.search(r"r(\d+)", p))
        ]
        out_dir = f"DIAG_r{(max(rounds) + 1) if rounds else 1:02d}"
    os.makedirs(out_dir, exist_ok=True)

    import duckdb

    import __spark_entry__ as E
    from etl_world_banks_with_python_and_postgresql_spark.session import get_spark
    from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import TABLE_NAMES

    spark = get_spark()
    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    from etl_world_banks_with_python_and_postgresql_spark.plans.partial import (
        PARTIAL_ORACLES,
    )

    names = args.names or sorted(qs)[:50]
    if args.names == ["all"]:
        names = [
            n for n in sorted(qs) if osql.get(n) or n in PARTIAL_ORACLES
        ]
    if args.changed_since:
        hits = changed_entries(args.changed_since, qs)
        skipped = [
            n for n in hits
            if not osql.get(n) and n not in PARTIAL_ORACLES
        ]
        if skipped:
            print(
                f"unpaired (rows-only, skipped here): {skipped}",
                file=sys.stderr,
            )
        names = [
            n for n in hits if osql.get(n) or n in PARTIAL_ORACLES
        ]
        print(
            f"--changed-since {args.changed_since}: {len(names)} "
            "oracle-paired entries selected", file=sys.stderr,
        )
    summary = {}
    for name in names:
        try:
            if not osql.get(name) and name in PARTIAL_ORACLES:
                # approximate/iterative-by-design entries (VERDICT r12
                # #1): exact claims (schema, counts, distances, error
                # envelopes) checked cross-engine instead of full rows
                res = PARTIAL_ORACLES[name](spark, con, SF_DIR, qs)
                summary[name] = {"partial_oracle": True, **res}
            else:
                summary[name] = dump_query(
                    spark, con, qs, osql, name, out_dir, args.summary_only
                )
        except Exception as exc:  # keep going; the summary records the error
            summary[name] = {"error": str(exc)[:300]}
        status = summary[name]
        print(f"{name}: {status}", file=sys.stderr)
    with open(os.path.join(out_dir, "SUMMARY.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    n_bad = sum(
        1
        for v in summary.values()
        if not (v.get("bit_exact") or (v.get("partial_oracle") and v.get("ok")))
    )
    print(json.dumps({"out": out_dir, "n_queries": len(names), "n_not_bit_exact": n_bad}))


if __name__ == "__main__":
    main()
