"""Physical-plan linter: the 100 TB anti-pattern checks, as a function.

`.explain()` literacy turned into an assertable gate: every check names a
plan shape that is fine at test scale and fatal at cluster scale. Used by
tests/test_plan_lint.py to sweep the ENTIRE query registry -- a new
operator that sneaks in a cartesian join or a row-at-a-time Python UDF
fails CI with the finding spelled out, instead of surfacing a year later
as an OOM on real data (the round-2 q39 all-pairs join is exactly the
regression class this pins down).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# `Window [exprs], [partition], [order]` = partitioned+ordered; `Window
# [exprs], [partition]` = partitioned, unordered; `Window [exprs],
# [order]` = GLOBAL: every row moves to ONE partition (Spark itself warns
# "No Partition Defined ... serious performance degradation"). Fine over a
# bounded pre-aggregated frame, fatal over corpus-sized input. Window
# exprs never contain brackets, so split the line's "], [" groups; the
# global form has exactly TWO groups with the second being an ORDER spec
# (it carries ASC/DESC markers, which a partition group never does).
_WINDOW_LINE = re.compile(r"\bWindow \[")


def _has_global_window(plan: str) -> bool:
    for line in plan.splitlines():
        if not _WINDOW_LINE.search(line):
            continue
        groups = line.split("], [")
        if len(groups) == 2 and (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            return True
    return False

# plan-node substring -> finding description
_CHECKS = {
    "CartesianProduct": (
        "cartesian-product join (O(n*m) pair scan; needs an equi-key or "
        "broadcast candidate generator)"
    ),
    "BroadcastNestedLoopJoin": (
        "broadcast nested-loop join (non-equi condition; every probe row "
        "scans the whole build side)"
    ),
    "BatchEvalPython": (
        "row-at-a-time Python UDF (pickle round trip per row; use built-in "
        "functions or an Arrow-batched pandas UDF)"
    ),
}


# cheap prefilter for the expensive JVM tree walk in lint_exact_output:
# matches the expression renderings `round(...)` / `bround(...)` in a
# plan string; never an alias (those render as `AS name#id`, no paren)
_ROUND_CALL = re.compile(r"\bb?round\(")


def _iter_jseq(seq):
    it = seq.iterator()
    while it.hasNext():
        yield it.next()


def _round_over_float_types(jplan, out: list[str]) -> None:
    """Collect the child dataTypes of every Round/BRound expression in
    the plan tree whose argument is double/float (py4j walk)."""
    for e in _iter_jseq(jplan.expressions()):
        stack = [e]
        while stack:
            x = stack.pop()
            if x.getClass().getSimpleName() in ("Round", "BRound"):
                t = x.child().dataType().typeName()
                if t in ("double", "float"):
                    out.append(f"round(<{t}>) at: {x.toString()[:120]}")
            stack.extend(_iter_jseq(x.children()))
    for ch in _iter_jseq(jplan.children()):
        _round_over_float_types(ch, out)


def lint_exact_output(df: DataFrame) -> list[str]:
    """The q49-class cross-engine determinism lint (VERDICT r5 task #5).

    ``round(<double>, s)`` is not portable across engines: Spark rounds
    the shortest decimal representation HALF_UP while DuckDB rounds the
    binary value, so a true rational within an ulp of a decimal
    half-boundary legitimately rounds differently (three rounds of q49
    reds). The portable constructions are (a) ``round`` over DECIMAL --
    exact integer-space arithmetic, the pattern the relational queries
    use -- and (b) `functions/exactnum`: BIGINT arithmetic, ONE
    integer-space HALF_UP, presented as ``k / 10^s.0`` (no round call at
    all). This lint flags a query whose OUTPUT carries double/float
    columns while its optimized plan rounds a DOUBLE/FLOAT-typed
    expression (checked on the JVM expression tree, so decimal rounding
    never false-positives); survivors must be whitelisted with a
    bit-stability justification (e.g. the rounded double is produced by
    arithmetic pinned bit-identical across engines, the cos_sim
    pattern).
    """
    if not any(
        f.dataType.typeName() in ("double", "float") for f in df.schema.fields
    ):
        return []
    qe = df._jdf.queryExecution()
    if not _ROUND_CALL.search(qe.optimizedPlan().toString()):
        return []  # no round anywhere: skip the py4j tree walk
    hits: list[str] = []
    _round_over_float_types(qe.optimizedPlan(), hits)
    return [
        "double output fed by round(<double>): not cross-engine stable "
        "at decimal half-boundaries (the q49 class); round a DECIMAL or "
        "derive the value in exact BIGINT via functions/exactnum and "
        "present as k / 10^s.0, or whitelist with a bit-stability "
        f"justification -- {h}"
        for h in hits
    ]


def lint_plan(df: DataFrame) -> list[str]:
    """Findings for the DataFrame's physical plan; empty list = clean.

    Checks the EXECUTED plan string (post-AQE initial plan), so what is
    linted is what would actually run. ArrowEvalPython / MapInPandas /
    PythonMapInArrow are deliberately NOT flagged -- Arrow-batched Python
    is the sanctioned escape hatch.
    """
    s = df._jdf.queryExecution().executedPlan().toString()
    findings = [desc for node, desc in _CHECKS.items() if node in s]
    if _has_global_window(s):
        findings.append(
            "global window (no PARTITION BY: every row moves to one "
            "partition; partition it, or justify that the windowed frame "
            "is bounded by a prior aggregation)"
        )
    return findings
