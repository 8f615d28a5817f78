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
