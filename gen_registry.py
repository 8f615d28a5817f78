"""Generate REGISTRY.md -- the one-page operator index (VERDICT r12
#6): name -> one-liner -> file:line -> oracle kind -> bench seconds,
derived mechanically from the live REGISTRY plus the COMMITTED bench
snapshot ``REGISTRY_BENCH.json`` for timings, so the index can never
drift from the code AND the staleness gate never depends on an
untracked, mutable artifact (VERDICT r13 #1: the old read of
``BENCH_LAST_LOCAL.json`` meant any bench re-run -- including the
driver's own round-closing run -- flipped ``tests/test_registry_md.py``
red with zero code changes, and a fresh clone rendered blank timings).

Workflow:

    python bench.py                        # writes BENCH_LAST_LOCAL.json
    python gen_registry.py --freeze-bench  # snapshot -> REGISTRY_BENCH.json
                                           # (refuses a loaded-box run)
    python gen_registry.py                 # regenerate REGISTRY.md
    git add REGISTRY_BENCH.json REGISTRY.md

Plain ``python gen_registry.py`` only re-renders from the committed
snapshot; it never reads the mutable local artifact.
"""

from __future__ import annotations

import inspect
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH_SNAPSHOT = "REGISTRY_BENCH.json"


def _one_liner(desc: str, limit: int = 96) -> str:
    s = " ".join(desc.split())
    # first sentence-ish clause, then hard cap
    for sep in (" -- ", ": ", "; "):
        if sep in s and len(s.split(sep)[0]) >= 20:
            s = s.split(sep)[0]
            break
    if len(s) > limit:
        s = s[: limit - 1].rstrip() + "…"
    return s.replace("|", "\\|") or "(no description)"


def load_snapshot() -> dict:
    """The committed bench snapshot (empty dict when absent, e.g. the
    very first render before any freeze)."""
    try:
        with open(os.path.join(HERE, BENCH_SNAPSHOT)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def freeze_bench() -> str:
    """Snapshot the current ``BENCH_LAST_LOCAL.json`` into the committed
    ``REGISTRY_BENCH.json``, refusing a run the artifact itself records
    as load-inflated (quiet-box qualification lives in ``bench.py`` --
    the snapshot is the reference future rounds adjudicate against, so
    freezing a loaded run would let real regressions hide)."""
    import bench

    src = os.path.join(HERE, bench.LOCAL_ARTIFACT)
    with open(src) as f:
        obj = json.load(f)
    if not obj.get("queries"):
        raise SystemExit(f"{src} has no per-query timings; run bench.py")
    summary = obj.get("load_summary")
    if summary is not None and not summary.get("quiet", True):
        raise SystemExit(
            f"refusing to freeze a load-inflated run: {summary} "
            "(re-run bench.py on a quiet box)"
        )
    # fold the artifact's own fresh-JVM isolated re-times in (per-entry
    # min, matching the suite's agg=min): an entry the adjudicator
    # already re-timed lower than its in-suite number was inflated by
    # in-suite JVM aging, and the reference should carry the honest
    # (reproducible-in-isolation) figure, not the aged one
    queries = dict(obj.get("queries") or {})
    for name, t in (obj.get("isolated") or {}).items():
        if name in queries and isinstance(t, (int, float)):
            queries[name] = min(queries[name], t)
    snap = {
        "source": bench.LOCAL_ARTIFACT,
        "sf": obj.get("sf"),
        "repeat": obj.get("repeat"),
        "agg": obj.get("agg"),
        "load_cpus": obj.get("load_cpus"),
        "load_summary": summary,
        "value": obj.get("value"),
        "pipeline_e2e_2runs": obj.get("pipeline_e2e_2runs"),
        "queries": queries,
    }
    out = os.path.join(HERE, BENCH_SNAPSHOT)
    with open(out, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    return out


PLANS_SNAPSHOT = "REGISTRY_PLANS.json"


def load_plans() -> dict:
    try:
        with open(os.path.join(HERE, PLANS_SNAPSHOT)) as f:
            return json.load(f).get("plans", {})
    except (OSError, json.JSONDecodeError):
        return {}


def freeze_plans(sf_dir: str = "/root/testdata/sf0.001") -> str:
    """Regenerate the committed per-entry plan-cost snapshot (VERDICT
    r13 #6): for every registry entry, build its DataFrame at sf0.001
    and count Exchange (shuffle) and parquet-scan nodes in the physical
    plan -- the two numbers that drive operator selection at 100 TB.
    Mechanical (no hand bookkeeping) and committed, so the REGISTRY.md
    column is staleness-gated like the rest of the file. Iterative
    entries execute their bounded driver-side stages during plan
    construction; sf0.001 keeps that cheap."""
    import re

    from etl_world_banks_with_python_and_postgresql_spark.plans.queries import (
        REGISTRY,
    )
    from etl_world_banks_with_python_and_postgresql_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="plan-freeze")
    plans: dict[str, dict] = {}
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            s = df._jdf.queryExecution().executedPlan().toString()
            plans[name] = {
                "exchanges": len(re.findall(r"\bExchange\b", s)),
                "scans": len(
                    re.findall(r"Scan parquet|FileScan", s)
                ),
            }
        except Exception as exc:  # noqa: BLE001 - record-and-continue
            plans[name] = {
                "error": f"{type(exc).__name__}: {exc}"[:200]
            }
        print(f"# {name}: {plans[name]}", file=sys.stderr)
    out = os.path.join(HERE, PLANS_SNAPSHOT)
    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "note": (
                    "physical-plan node counts per entry (Exchange = "
                    "shuffle boundaries incl. broadcast exchanges; "
                    "scans = parquet file scans), from the pre-"
                    "execution executedPlan at sf0.001; regenerate "
                    "with: python gen_registry.py --freeze-plans"
                ),
                "plans": plans,
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    return out


def render() -> str:
    from etl_world_banks_with_python_and_postgresql_spark.plans.partial import (
        PARTIAL_ORACLES,
    )
    from etl_world_banks_with_python_and_postgresql_spark.plans.queries import (
        REGISTRY,
    )

    bench: dict[str, float] = load_snapshot().get("queries", {})
    plans = load_plans()

    n_full = sum(1 for q in REGISTRY.values() if q.oracle)
    n_partial = sum(
        1 for n, q in REGISTRY.items() if not q.oracle and n in PARTIAL_ORACLES
    )
    lines = [
        "# REGISTRY — generated operator index",
        "",
        "One row per registry entry (`plans/queries.py` aggregation of "
        "the family modules). GENERATED by `gen_registry.py`; CI "
        "(`tests/test_registry_md.py`) fails if this file is stale. "
        "Oracle: `full` = DuckDB SQL twin bit-compared by the driver "
        "gate / diag.py / tests; `partial` = exact-claims checker in "
        "`plans/partial.py`. Bench seconds come from the committed "
        "quiet-box snapshot `REGISTRY_BENCH.json` (sf0.1 headline "
        "suite; refresh with `python gen_registry.py --freeze-bench`); "
        "blank = not a headline entry. Plan = Exchange (shuffle/"
        "broadcast boundary) and parquet-scan node counts from the "
        "committed `REGISTRY_PLANS.json` (physical plan at sf0.001; "
        "refresh with `--freeze-plans`) -- the two numbers that drive "
        "operator selection at scale.",
        "",
        f"**{len(REGISTRY)} entries: {n_full} full-oracle, "
        f"{n_partial} partial-oracle, "
        f"{len(REGISTRY) - n_full - n_partial} unpaired.**",
        "",
        "| entry | what it does | where | oracle | plan | bench s |",
        "|---|---|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        fn = inspect.unwrap(q.fn)
        src = os.path.relpath(inspect.getsourcefile(fn), HERE)
        line = inspect.getsourcelines(fn)[1]
        oracle = (
            "full"
            if q.oracle
            else ("partial" if name in PARTIAL_ORACLES else "none")
        )
        t = bench.get(name)
        p = plans.get(name)
        if p and "exchanges" in p:
            plan = f"{p['exchanges']}ex/{p['scans']}sc"
        elif p:
            plan = "err"
        else:
            plan = ""
        lines.append(
            f"| `{name}` | {_one_liner(q.description)} "
            f"| `{src}:{line}` | {oracle} | {plan} "
            f"| {f'{t:.2f}' if t is not None else ''} |"
        )
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--freeze-bench",
        action="store_true",
        help="snapshot BENCH_LAST_LOCAL.json -> REGISTRY_BENCH.json "
        "(refuses a load-inflated run) before rendering",
    )
    ap.add_argument(
        "--freeze-plans",
        action="store_true",
        help="rebuild REGISTRY_PLANS.json (per-entry Exchange/scan "
        "counts from the sf0.001 physical plans) before rendering",
    )
    args = ap.parse_args()
    if args.freeze_bench:
        print(f"froze {freeze_bench()}")
    if args.freeze_plans:
        print(f"froze {freeze_plans()}")
    out = os.path.join(HERE, "REGISTRY.md")
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
