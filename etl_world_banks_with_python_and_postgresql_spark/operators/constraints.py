"""Declarative table-constraint auditing as dataflow.

The reference enforces integrity procedurally -- per-row EXCEPTION blocks
in the PL/pgSQL procedures (`SQL/etl_world_banks.sql:244-247`) and
implicit SERIAL-PK uniqueness (`SQL/etl_world_banks.sql:4-7`). At engine
scale, constraint checking must be a QUERY, not a row loop: this module
compiles a whole constraint suite into a handful of aggregate plans.

Three constraint families, three plan shapes:

- **Row-scalar checks** (not-null, range, regex, cross-column):
  :func:`audit_checks` folds ALL of them into ONE aggregate pass over
  the scan -- per-constraint ``sum(violation)`` counters, exactly like
  the merge audit counters (A2-A4). One scan regardless of how many
  constraints; no per-rule re-reads.
- **Key uniqueness**: :func:`unique_violations` -- one hash aggregate on
  the key (map-side partial combine; the natural shuffle).
- **Referential integrity**: :func:`fk_violations` -- left-anti join of
  child keys against the parent, distinct-reduced on the child side
  first so the shuffle carries keys, not rows.

:func:`constraint_report` unions all three into one long-form audit
table ``(constraint, kind, n_violations, passed)`` -- the table a 100 TB
ingest gate alerts on. Row-level quarantine of the SAME predicates is
``sources.robust.validate_rows`` (split the rows); this module is the
corpus-level scorecard (count the failures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One-pass scalar-constraint audit.

    ``checks`` maps constraint-name -> boolean Column that VALID rows
    satisfy (NULL counts as a violation -- a check that cannot evaluate
    did not pass). Returns one row per constraint:
    ``(constraint, n_rows, n_violations, passed)``.

    Plan: a single global aggregate -- ``count(*)`` plus one
    ``sum(case)`` per check -- then a literal ``stack`` unpivot of the
    1-row result. The scan runs ONCE for the whole suite; adding a
    constraint adds a codegen'd counter, not a pass.
    """
    names = sorted(checks)
    aggs = [F.count("*").alias("_n_rows")] + [
        F.coalesce(
            F.sum(
                F.when(
                    F.coalesce(checks[name], F.lit(False)), F.lit(0)
                ).otherwise(F.lit(1))
            ),
            F.lit(0),  # empty table: vacuous pass, not a NULL counter
        )
        .cast("long")
        .alias(f"_v{i}")
        for i, name in enumerate(names)
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', _v{i}" for i, name in enumerate(names))
    return wide.select(
        F.expr(
            f"stack({len(names)}, {stack_args}) AS (constraint, n_violations)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select(
        "constraint",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def unique_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups that violate uniqueness: ``(keys..., n_copies)`` for
    every key with more than one row. One hash aggregate (map-side
    partial combine); empty result == constraint holds."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    keys: list[str] | dict[str, str],
) -> DataFrame:
    """Child keys with no matching parent row (broken foreign keys).

    ``keys`` is a child-column list (same names both sides) or a
    ``{child_col: parent_col}`` mapping. Returns the DISTINCT violating
    child keys with an occurrence count. The child side is reduced to
    (key, count) BEFORE the anti join, so the join shuffles distinct
    keys, not the full child table -- on a fact-vs-dimension check
    that is orders of magnitude less data, and a dimension-sized parent
    side broadcasts.
    """
    mapping = {k: k for k in keys} if isinstance(keys, list) else dict(keys)
    child_keys = child.groupBy(
        *[F.col(c) for c in mapping]
    ).agg(F.count("*").alias("n_rows"))
    parent_keys = parent.select(
        *[F.col(p).alias(c) for c, p in mapping.items()]
    ).distinct()
    return child_keys.join(parent_keys, list(mapping), "left_anti")


def constraint_report(
    df: DataFrame,
    checks: dict[str, Column] | None = None,
    unique_keys: dict[str, list[str]] | None = None,
    foreign_keys: dict[str, tuple[DataFrame, list[str] | dict[str, str]]] | None = None,
) -> DataFrame:
    """Full audit scorecard: one row per declared constraint,
    ``(constraint, kind, n_violations, passed)``.

    Scalar checks ride one shared aggregate pass; each uniqueness /
    FK constraint contributes a count-reduced aggregate row. The unions
    are of 1-row aggregates -- the plan stays a handful of tiny
    shuffles no matter the table size.
    """
    parts = []
    if checks:
        parts.append(
            audit_checks(df, checks).select(
                "constraint",
                F.lit("check").alias("kind"),
                "n_violations",
                "passed",
            )
        )
    for name, keys in sorted((unique_keys or {}).items()):
        v = unique_violations(df, keys).agg(
            F.coalesce(F.sum("n_copies"), F.lit(0)).cast("long").alias("n_violations")
        )
        parts.append(
            v.select(
                F.lit(name).alias("constraint"),
                F.lit("unique").alias("kind"),
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    for name, (parent, keys) in sorted((foreign_keys or {}).items()):
        v = fk_violations(df, parent, keys).agg(
            F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("n_violations")
        )
        parts.append(
            v.select(
                F.lit(name).alias("constraint"),
                F.lit("foreign_key").alias("kind"),
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    if not parts:
        raise ValueError("no constraints declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def reconcile_parent_child(
    parent: DataFrame,
    child: DataFrame,
    key: str,
    parent_total: Column,
    child_amount: Column,
    tolerance: float = 0.01,
) -> DataFrame:
    """Parent/child amount reconciliation (header-vs-lines audit): per
    parent key, recompute the total from child rows (DECIMAL-lifted sum
    -- associative, the q01 rule -- rounded to cents) and compare to the
    parent's stored total. One summary row:
    ``(n_checked, n_mismatched, n_parents_without_children,
    max_abs_deviation, total_abs_deviation)``.

    Plan: one child aggregate on the key, one join to the parent (both
    sides key-partitioned -- the natural co-partitioned shuffle), an
    anti-join count for childless parents, and a 1-row summary. No
    per-parent rescans; deviation stats from exact decimal sums.
    """
    recomputed = (
        child.groupBy(F.col(key))
        .agg(
            F.round(F.sum(child_amount.cast("decimal(25,6)")), 2)
            .cast("double")
            .alias("_recomputed")
        )
    )
    joined = parent.select(
        F.col(key), parent_total.alias("_stored")
    ).join(recomputed, key)
    dev = F.abs(F.col("_stored") - F.col("_recomputed"))
    summary = joined.agg(
        F.count("*").alias("n_checked"),
        F.sum((dev > tolerance).cast("long")).alias("n_mismatched"),
        F.max(dev).alias("max_abs_deviation"),
        F.round(F.sum(dev.cast("decimal(25,6)")), 2)
        .cast("double")
        .alias("total_abs_deviation"),
    )
    childless = (
        parent.select(F.col(key))
        .join(child.select(F.col(key)).distinct(), key, "left_anti")
        .agg(F.count("*").alias("n_parents_without_children"))
    )
    return summary.crossJoin(F.broadcast(childless)).select(
        "n_checked",
        "n_mismatched",
        "n_parents_without_children",
        F.round(F.col("max_abs_deviation"), 6).alias("max_abs_deviation"),
        "total_abs_deviation",
    )


def join_fanout_audit(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | dict[str, str],
    k: int = 10,
) -> DataFrame:
    """Pre-join cardinality audit: for an equi-join on ``keys``, the
    top-k keys by OUTPUT fan-out (rows_left * rows_right) plus both
    sides' multiplicities -- the check that catches an accidental
    many-to-many (a duplicated dimension key turning a join into a row
    explosion) BEFORE the join runs it. Cost: one count-aggregate per
    side on the join key (each orders of magnitude smaller than the
    join itself) + a key-equi join of the two count tables.
    """
    mapping = {kk: kk for kk in keys} if isinstance(keys, list) else dict(keys)
    lc = left.groupBy(*[F.col(c) for c in mapping]).agg(
        F.count("*").alias("rows_left")
    )
    rc = right.groupBy(
        *[F.col(p).alias(c) for c, p in mapping.items()]
    ).agg(F.count("*").alias("rows_right"))
    return (
        lc.join(rc, list(mapping))
        .withColumn("fanout", F.col("rows_left") * F.col("rows_right"))
        .orderBy(F.desc("fanout"), *list(mapping))
        .limit(k)
    )
