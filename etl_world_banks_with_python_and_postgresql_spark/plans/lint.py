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

from pyspark.sql import DataFrame

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
    return [desc for node, desc in _CHECKS.items() if node in s]
