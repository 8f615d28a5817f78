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


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    k: int = 256,
    group_by: str | None = None,
) -> DataFrame:
    """Deequ-style per-column profile in ONE unpivoted aggregate pass:
    ``(column, n_rows, n_null, n_distinct_est, min_str, max_str)``.

    Every column is cast to its string form and stacked into
    (column, value) rows inside the scan projection, so the whole
    profile is one shuffle keyed on the COLUMN NAME (bounded by the
    column count, never the row count) -- the profiling shape a 100 TB
    audit needs. Distinct counts are the deterministic KMV estimate
    (:mod:`.sketch`, exact when a column has < ``k`` distinct values);
    min/max are over the STRING form (binary collation in both engines
    -- deterministic, but lexicographic: use typed ops for numeric
    range audits, this is the triage view). NULLs count into
    ``n_null`` and are excluded from the value stats. ``group_by``
    profiles every column PER GROUP (per-shard drift monitoring): the
    aggregate keys on (group, column), still row-count-independent in
    shuffle payload, and the group column itself is excluded from the
    default column list.

    Scale note: the stack inflates rows x n_columns before the
    aggregate; map-side combine collapses each partition to
    O(columns x k) rows, so the shuffle payload is corpus-size-
    independent, like ``label_centroids``.
    """
    from .sketch import _HASH_SPACE, md5_hash48

    keys = [group_by] if group_by else []
    cols = columns or [c for c in df.columns if c != group_by]
    pairs = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    stacked = df.select(
        *keys, F.stack(F.lit(len(cols)), *pairs).alias("column", "v")
    )
    base = stacked.groupBy(*keys, "column").agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("v")).alias("n_null"),
        F.min("v").alias("min_str"),
        F.max("v").alias("max_str"),
    )
    from pyspark.sql import Window as W

    hv = stacked.filter(F.col("v").isNotNull()).select(
        *keys, "column", md5_hash48(F.col("v")).alias("hv")
    ).distinct()
    w = W.partitionBy(*keys, "column").orderBy("hv")
    sk = (
        hv.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*keys, "column")
        .agg(F.count("*").alias("_n_kept"), F.max("hv").alias("_hk"))
    )
    est = F.when(
        F.col("_n_kept") < k, F.col("_n_kept").cast("long")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_hk")
        ).cast("long")
    )
    # LEFT join from base: a column whose values are all NULL has no
    # rows in the non-null sketch frame, and an inner join would drop it
    # from the profile entirely (ADVICE r9) -- exactly the column a
    # profile must surface. Coalesce its estimate to 0 distinct values.
    return (
        base.join(
            sk.select(*keys, "column", est.alias("n_distinct_est")),
            [*keys, "column"],
            "left",
        )
        .select(
            *keys, "column", "n_rows", "n_null",
            F.coalesce(F.col("n_distinct_est"), F.lit(0).cast("long"))
            .alias("n_distinct_est"),
            "min_str", "max_str",
        )
    )


def profile_table_oracle_sql(
    columns: list[str],
    k: int = 256,
    table: str = "documents",
    group_by: str | None = None,
) -> str:
    """DuckDB twin of :func:`profile_table` over a registered view
    (including the ``group_by`` per-group variant). Left join + coalesce
    mirror the Spark side: an all-NULL column profiles with
    ``n_distinct_est = 0`` instead of vanishing (ADVICE r9)."""
    from .sketch import _HASH_SPACE

    g_sel = f'{group_by} AS "{group_by}", ' if group_by else ""
    g_cols = f'"{group_by}", ' if group_by else ""
    g_using = f'"{group_by}", ' if group_by else ""
    stacked = " UNION ALL ".join(
        f"SELECT {g_sel}'{c}' AS col_, ({c})::VARCHAR AS v FROM {table}"
        for c in columns
    )
    hv = "('0x' || substr(md5(v), 1, 12))::BIGINT"
    return f"""
WITH stacked AS ({stacked}),
base AS (
  SELECT {g_cols}col_ AS "column", count(*) AS n_rows,
         count(*) - count(v) AS n_null,
         min(v) AS min_str, max(v) AS max_str
  FROM stacked GROUP BY ALL),
h AS (SELECT DISTINCT {g_cols}col_ AS "column", {hv} AS hv
      FROM stacked WHERE v IS NOT NULL),
r AS (SELECT {g_cols}"column", hv,
             row_number() OVER (PARTITION BY {g_cols}"column"
                                ORDER BY hv) AS rn
      FROM h),
sk AS (SELECT {g_cols}"column", count(*) AS n_kept, max(hv) AS hk
       FROM r WHERE rn <= {k} GROUP BY ALL)
SELECT {"base." + '"' + group_by + '", ' if group_by else ""}base."column",
       n_rows, n_null,
       coalesce(
         CASE WHEN n_kept < {k} THEN n_kept
              ELSE CAST(round(CAST({float(k - 1)!r} AS DOUBLE)
                              * CAST({_HASH_SPACE!r} AS DOUBLE) / hk)
                        AS BIGINT)
         END, 0) AS n_distinct_est,
       min_str, max_str
FROM base LEFT JOIN sk USING ({g_using}"column")
"""


def k_anonymity_ladder(
    df: DataFrame,
    levels: "list[tuple[str, list]]",
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit across a GENERALIZATION LADDER -- the privacy
    re-identification check run before releasing or joining a dataset:
    at each generalization level (a named list of quasi-identifier
    expressions, coarser as you descend), count equivalence classes,
    classes smaller than ``k``, rows living in them, and the k actually
    achieved (the min class size). The workflow this powers: walk the
    ladder until ``n_risky = 0`` -- that level's generalization is the
    release schema; ``rows_at_risk`` prices what suppression would cost
    instead.

    One map-side-combined aggregate per level over the quasi columns
    (equivalence classes are the shuffle keys), then a |levels|-row
    summary union -- each level reduces the corpus to its class counts
    before anything global happens; nothing corpus-sized crosses a
    second shuffle. All outputs exact integers.
    """
    outs = []
    for name, exprs in levels:
        classes = df.groupBy(
            *[e.alias(f"_q{i}") for i, e in enumerate(exprs)]
        ).agg(F.count(F.lit(1)).alias("_n"))
        outs.append(
            classes.agg(
                F.lit(name).alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_classes"),
                F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
                .cast("long")
                .alias("n_risky"),
                F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
                .cast("long")
                .alias("rows_at_risk"),
                F.min("_n").cast("long").alias("k_achieved"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


def k_anonymity_oracle_sql(
    table: str, levels: "list[tuple[str, list[str]]]", k: int = 5
) -> str:
    """DuckDB twin of :func:`k_anonymity_ladder` (same exact integer
    summary per level)."""
    parts = []
    for name, exprs in levels:
        cols = ", ".join(exprs)
        parts.append(f"""
SELECT '{name}' AS level,
       count(*)::BIGINT AS n_classes,
       sum(CASE WHEN n < {k} THEN 1 ELSE 0 END)::BIGINT AS n_risky,
       sum(CASE WHEN n < {k} THEN n ELSE 0 END)::BIGINT AS rows_at_risk,
       min(n)::BIGINT AS k_achieved
FROM (SELECT {cols}, count(*) AS n FROM {table} GROUP BY ALL)""")
    return "\nUNION ALL\n".join(parts)


def l_diversity_ladder(
    df: DataFrame,
    levels: "list[tuple[str, list]]",
    sensitive,
    l_min: int = 3,
) -> DataFrame:
    """l-diversity audit across the same generalization ladder shape as
    :func:`k_anonymity_ladder` -- the attribute-disclosure check
    k-anonymity misses: a class can hold >= k rows yet give the
    sensitive attribute away because every row in it shares one value
    (Machanavajjhala et al. 2007). Per level: equivalence classes,
    classes whose sensitive attribute takes fewer than ``l_min``
    DISTINCT values, rows in them, and the l actually achieved (the min
    distinct-sensitive count over classes).

    Scale shape: one two-measure aggregate per level (count +
    count-distinct over the class key) -- the distinct is per class,
    never global -- then a |levels|-row summary. Exact integers.
    """
    sens = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    outs = []
    for name, exprs in levels:
        classes = df.groupBy(
            *[e.alias(f"_q{i}") for i, e in enumerate(exprs)]
        ).agg(
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct(sens).alias("_nd"),
        )
        outs.append(
            classes.agg(
                F.lit(name).alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_classes"),
                F.sum(F.when(F.col("_nd") < l_min, 1).otherwise(0))
                .cast("long")
                .alias("n_risky"),
                F.sum(F.when(F.col("_nd") < l_min, F.col("_n")).otherwise(0))
                .cast("long")
                .alias("rows_at_risk"),
                F.min("_nd").cast("long").alias("l_achieved"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


def l_diversity_oracle_sql(
    table: str,
    levels: "list[tuple[str, list[str]]]",
    sensitive: str,
    l_min: int = 3,
) -> str:
    """DuckDB twin of :func:`l_diversity_ladder`."""
    parts = []
    for name, exprs in levels:
        cols = ", ".join(exprs)
        parts.append(f"""
SELECT '{name}' AS level,
       count(*)::BIGINT AS n_classes,
       sum(CASE WHEN nd < {l_min} THEN 1 ELSE 0 END)::BIGINT AS n_risky,
       sum(CASE WHEN nd < {l_min} THEN n ELSE 0 END)::BIGINT AS rows_at_risk,
       min(nd)::BIGINT AS l_achieved
FROM (SELECT {cols}, count(*) AS n, count(DISTINCT {sensitive}) AS nd
      FROM {table} GROUP BY ALL)""")
    return "\nUNION ALL\n".join(parts)


def distribution_drift_tvd(
    df: DataFrame,
    group_col: str,
    bucket: Column,
) -> DataFrame:
    """Per-group distribution drift vs the pooled corpus as EXACT
    total-variation distance: for each group g over histogram buckets b,

        TVD(g) = 1/2 * sum_b | O_gb/n_g  -  T_b/N |
               = sum_b | O_gb*N - T_b*n_g |  /  (2 * n_g * N)

    -- a single-denominator integer ratio, so the result is ONE HALF_UP
    micros value per group with no float accumulation anywhere (the
    z164/exactnum discipline; chi-square would need per-cell
    denominators that cannot be cleared into one integer comparison).
    This is the corpus-observability number a training pipeline tracks
    per source/shard/day: TVD 0 = identical shape, 1e6 micros = disjoint
    support. The pooled side INCLUDES the group itself (the standard
    source-vs-corpus convention; a group that IS most of the corpus can
    therefore never look very drifted -- by design).

    Scale shape: two map-side-combined histogram aggregates (group x
    bucket, bucket), one bounded dims-cross (groups x buckets -- both
    histogram-sized, never corpus-sized) so zero-count cells still
    contribute their |0 - T_b*n_g| mass, one 1-row N broadcast, one
    group-keyed sum. Products run in DECIMAL(38,0): O*N at corpus scale
    (1e12 * 1e12) would wrap int64.

    Returns (``group_col``, n_rows, tvd_micros).
    """
    from ..functions.exactnum import ratio_micros_halfup

    d = df.select(F.col(group_col).alias("g"), bucket.alias("b"))
    o = d.groupBy("g", "b").agg(F.count(F.lit(1)).alias("o"))
    t = d.groupBy("b").agg(F.count(F.lit(1)).alias("t"))
    gs = d.groupBy("g").agg(F.count(F.lit(1)).alias("ns"))
    n1 = d.agg(F.count(F.lit(1)).alias("n_total"))
    grid = gs.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(n1))
    j = grid.join(o, ["g", "b"], "left").fillna({"o": 0})
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = j.groupBy("g", "ns", "n_total").agg(
        F.sum(
            F.abs(dec("o") * dec("n_total") - dec("t") * dec("ns"))
        ).alias("num")
    )
    return s.select(
        F.col("g").alias(group_col),
        F.col("ns").cast("long").alias("n_rows"),
        ratio_micros_halfup(
            F.col("num"),
            F.lit(2).cast("decimal(38,0)") * dec("ns") * dec("n_total"),
        ).alias("tvd_micros"),
    )


def distribution_drift_oracle_sql(
    rows_sql: str, group_col: str, bucket_sql: str
) -> str:
    """DuckDB twin of :func:`distribution_drift_tvd`. ``rows_sql`` must
    yield ``group_col`` and the columns ``bucket_sql`` reads."""
    return f"""
WITH d AS MATERIALIZED (
  SELECT {group_col} AS g, {bucket_sql} AS b FROM ({rows_sql}) r0),
o AS (SELECT g, b, count(*)::HUGEINT AS o FROM d GROUP BY g, b),
t AS (SELECT b, count(*)::HUGEINT AS t FROM d GROUP BY b),
gs AS (SELECT g, count(*)::HUGEINT AS ns FROM d GROUP BY g),
n AS (SELECT count(*)::HUGEINT AS n_total FROM d),
grid AS (SELECT gs.g, gs.ns, t.b, t.t, n.n_total FROM gs, t, n),
j AS (SELECT grid.*, coalesce(o.o, 0)::HUGEINT AS o
      FROM grid LEFT JOIN o ON o.g = grid.g AND o.b = grid.b),
s AS (SELECT g, ns, n_total,
             sum(abs(o * n_total - t * ns))::HUGEINT AS num
      FROM j GROUP BY g, ns, n_total)
SELECT g AS {group_col},
       ns::BIGINT AS n_rows,
       ((2000000 * num + (2 * ns * n_total)) // (2 * (2 * ns * n_total))
       )::BIGINT AS tvd_micros
FROM s
"""


def classification_report(
    df: DataFrame,
    truth_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1 for a labeled prediction table --
    the eval half every in-pipeline classifier (langid, quality gates,
    topic routers) needs next to its predictions, as exact HALF_UP
    micros (the eval numbers land in dashboards and regression gates;
    float drift there is as damaging as in the data itself):

        precision = tp / (tp + fp)      recall = tp / (tp + fn)
        f1 = 2*tp / (2*tp + fp + fn)    -- single-denominator exact

    A class appearing only in predictions (phantom class, e.g.
    'unknown') still gets a row: support 0, recall NULL, precision from
    its fp count. Zero-denominator cells are NULL, never a fake 0 (an
    unreported class and a failing class must not look alike).

    Scale shape: ONE (truth, pred) count aggregate over corpus rows;
    everything after runs on the confusion table (bounded by the class
    universe squared): two bounded re-aggregations + one outer join.
    Output: (class, support, tp, fp, fn, precision_micros,
    recall_micros, f1_micros).
    """
    from ..functions.exactnum import ratio_micros_halfup
    from ..functions.staging import staged

    # staged (r15): conf fans out into tp + truth totals + pred totals
    # -- without the cut the corpus-sized (truth, pred) aggregate (and
    # everything upstream of it, e.g. z184's langid expressions) runs
    # THREE times. persist mode: the confusion table is bounded by the
    # class universe squared, and keeping Catalyst stats lets the
    # downstream full-outer/left joins stay broadcast.
    conf = staged(
        df.groupBy(
            F.col(truth_col).alias("_t"), F.col(pred_col).alias("_p")
        ).agg(F.count(F.lit(1)).alias("_n")),
        mode="persist",
    )
    tp = (
        conf.filter(F.col("_t") == F.col("_p"))
        .select(F.col("_t").alias("class"), F.col("_n").alias("tp"))
    )
    truth_tot = conf.groupBy(F.col("_t").alias("class")).agg(
        F.sum("_n").alias("_truth_n")
    )
    pred_tot = conf.groupBy(F.col("_p").alias("class")).agg(
        F.sum("_n").alias("_pred_n")
    )
    base = (
        truth_tot.join(pred_tot, "class", "full_outer")
        .join(tp, "class", "left")
        .select(
            "class",
            F.coalesce(F.col("_truth_n"), F.lit(0)).alias("support"),
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            (
                F.coalesce(F.col("_pred_n"), F.lit(0))
                - F.coalesce(F.col("tp"), F.lit(0))
            ).alias("fp"),
            (
                F.coalesce(F.col("_truth_n"), F.lit(0))
                - F.coalesce(F.col("tp"), F.lit(0))
            ).alias("fn"),
        )
    )
    def safe_ratio(num, den):
        return F.when(den == 0, F.lit(None).cast("long")).otherwise(
            ratio_micros_halfup(num, den)
        )

    return base.select(
        "class",
        F.col("support").cast("long").alias("support"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        safe_ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias(
            "precision_micros"
        ),
        safe_ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias(
            "recall_micros"
        ),
        safe_ratio(
            F.lit(2) * F.col("tp"),
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"),
        ).alias("f1_micros"),
    )


def classification_report_oracle_sql(
    rows_sql: str, truth_sql: str = "truth", pred_sql: str = "pred"
) -> str:
    """DuckDB twin of :func:`classification_report`."""
    return f"""
WITH d AS (SELECT {truth_sql} AS t, {pred_sql} AS p FROM ({rows_sql}) raw0),
conf AS (SELECT t, p, count(*)::BIGINT AS n FROM d GROUP BY t, p),
tt AS (SELECT t AS class, sum(n)::BIGINT AS truth_n FROM conf GROUP BY t),
pt AS (SELECT p AS class, sum(n)::BIGINT AS pred_n FROM conf GROUP BY p),
tpx AS (SELECT t AS class, n AS tp FROM conf WHERE t = p),
base AS (
  SELECT coalesce(tt.class, pt.class) AS class,
         coalesce(truth_n, 0) AS support,
         coalesce(tp, 0) AS tp,
         coalesce(pred_n, 0) - coalesce(tp, 0) AS fp,
         coalesce(truth_n, 0) - coalesce(tp, 0) AS fn
  FROM tt FULL OUTER JOIN pt ON pt.class = tt.class
  LEFT JOIN tpx ON tpx.class = coalesce(tt.class, pt.class))
SELECT class, support, tp, fp, fn,
       CASE WHEN tp + fp = 0 THEN NULL
            ELSE (2000000 * tp + (tp + fp)) // (2 * (tp + fp)) END::BIGINT
         AS precision_micros,
       CASE WHEN tp + fn = 0 THEN NULL
            ELSE (2000000 * tp + (tp + fn)) // (2 * (tp + fn)) END::BIGINT
         AS recall_micros,
       CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
            ELSE (2000000 * 2 * tp + (2 * tp + fp + fn))
                 // (2 * (2 * tp + fp + fn)) END::BIGINT AS f1_micros
FROM base
"""


def key_skew_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Join/groupBy-key skew profile: for each candidate key column --
    BEFORE anyone shuffles on it -- the concentration numbers that
    decide between a plain hash join, AQE skew handling, and explicit
    salting (the operators/skew.py path): distinct keys, the heaviest
    key's row count and share, the Herfindahl-Hirschman concentration
    index, and the heaviest key's multiple of the uniform share
    (``skew_x``; AQE's skewedPartitionFactor thinks in exactly these
    multiples). All exact HALF_UP micros:

        max_share = max_i n_i / N        hhi = sum_i n_i^2 / N^2
        skew_x    = max_i n_i * K / N    (1x = perfectly uniform)

    Scale shape: one in-row explode of the |cols| (name, key) pairs --
    the scan emits |cols| x rows but the shuffle carries only map-side-
    combined (col, key) partials -- one (col, key) count aggregate,
    then a |cols|-row summary aggregate. DECIMAL(38,0) squares (n_i^2
    at corpus scale wraps int64). NULL keys profile as a key like any
    other (a null-heavy join key is precisely what this must surface).
    """
    from ..functions.exactnum import ratio_micros_halfup

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("string").alias("key"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.col", "p.key")
    counts = pairs.groupBy("col", "key").agg(
        F.count(F.lit(1)).alias("n")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    prof = counts.groupBy("col").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_key_n"),
        F.sum(dec("n") * dec("n")).alias("_sum_sq"),
    )
    return prof.select(
        "col",
        "n_rows",
        "n_keys",
        "max_key_n",
        ratio_micros_halfup(F.col("max_key_n"), F.col("n_rows")).alias(
            "max_share_micros"
        ),
        ratio_micros_halfup(
            F.col("_sum_sq"), dec("n_rows") * dec("n_rows")
        ).alias("hhi_micros"),
        ratio_micros_halfup(
            dec("max_key_n") * dec("n_keys"), dec("n_rows")
        ).alias("skew_x_micros"),
    )


def key_skew_profile_oracle_sql(rows_sql: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`key_skew_profile` (UNION ALL unpivot ==
    the explode; same cleared-integer ratios)."""
    unpivot = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS key FROM raw0"
        for c in cols
    )
    return f"""
WITH raw0 AS ({rows_sql}),
pairs AS ({unpivot}),
counts AS (SELECT col, key, count(*)::BIGINT AS n
           FROM pairs GROUP BY col, key),
prof AS (SELECT col,
                sum(n)::HUGEINT AS n_rows,
                count(*)::HUGEINT AS n_keys,
                max(n)::HUGEINT AS max_key_n,
                sum(n::HUGEINT * n)::HUGEINT AS sum_sq
         FROM counts GROUP BY col)
SELECT col, n_rows::BIGINT AS n_rows, n_keys::BIGINT AS n_keys,
       max_key_n::BIGINT AS max_key_n,
       ((2000000 * max_key_n + n_rows) // (2 * n_rows))::BIGINT
         AS max_share_micros,
       ((2000000 * sum_sq + n_rows * n_rows) // (2 * n_rows * n_rows)
       )::BIGINT AS hhi_micros,
       ((2000000 * max_key_n * n_keys + n_rows) // (2 * n_rows))::BIGINT
         AS skew_x_micros
FROM prof
"""


def clustering_pair_eval(
    df: DataFrame,
    cluster_col: str,
    truth_col: str,
) -> DataFrame:
    """Pair-counting clustering evaluation: precision/recall/F1 over
    item PAIRS, the Rand index, and the Adjusted Rand Index of a
    cluster assignment against ground-truth classes -- the eval table
    for dedup clusters, entity-resolution output, or any unsupervised
    grouping (completing the metric family: z184 classification, z185
    ranking, this one clustering). Pair counts come from the
    CONTINGENCY table, never from enumerating pairs:

        TP  = sum_{c,t} C(n_ct, 2)        P_clu = sum_c C(n_c, 2)
        P_tru = sum_t C(n_t, 2)           P_all = C(N, 2)
        precision = TP/P_clu   recall = TP/P_tru   f1 = 2TP/(P_clu+P_tru)
        rand = (P_all - P_clu - P_tru + 2TP) / P_all
        ari  = (TP*P_all - P_clu*P_tru)
               / (P_all*(P_clu+P_tru)/2 - P_clu*P_tru)

    -- every numerator/denominator an exact integer (C(n,2) in
    DECIMAL(38,0)), each metric ONE sign-aware HALF_UP micros division
    (ARI can be negative: worse-than-chance clustering must show as
    such, not clamp to 0). Magnitude honesty: the ARI cross-products
    (now 2x-scaled, see below) need 2 * P_all * (P_clu + P_tru) < ~1e38,
    i.e. up to ~1e9 items per evaluation slice -- evals run on slices,
    and the bound is ENFORCED by an explicit runtime guard
    (``magnitude_guard`` raises past 1e9 items; with ANSI off, DECIMAL
    overflow would otherwise yield a silent NULL metric -- ADVICE r14).

    Scale shape: ONE (cluster, truth) count aggregate over items, then
    three bounded re-aggregations of the contingency table and a 1-row
    summary. Output one row: the counts and the five metrics.
    """
    from ..functions.exactnum import magnitude_guard, ratio_micros_halfup

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def c2(n):
        nd = dec(n)
        return nd * (nd - 1) / F.lit(2).cast("decimal(38,0)")

    from ..functions.staging import staged

    # staged (r15): cont fans out into s/pc/pt -- without the cut the
    # corpus-sized (cluster, truth) aggregate runs three times
    cont = staged(
        df.groupBy(
            F.col(cluster_col).alias("_c"), F.col(truth_col).alias("_t")
        ).agg(F.count(F.lit(1)).alias("_n")),
        mode="persist",
    )
    s = cont.agg(
        F.sum(c2(F.col("_n"))).cast("decimal(38,0)").alias("tp"),
        F.sum("_n").cast("long").alias("n_items"),
    )
    pc = (
        cont.groupBy("_c")
        .agg(F.sum("_n").alias("_nc"))
        .agg(F.sum(c2(F.col("_nc"))).cast("decimal(38,0)").alias("p_clu"))
    )
    pt = (
        cont.groupBy("_t")
        .agg(F.sum("_n").alias("_nt"))
        .agg(F.sum(c2(F.col("_nt"))).cast("decimal(38,0)").alias("p_tru"))
    )
    j = s.crossJoin(F.broadcast(pc)).crossJoin(F.broadcast(pt))
    p_all = c2(F.col("n_items"))
    tp, p_clu, p_tru = F.col("tp"), F.col("p_clu"), F.col("p_tru")

    def signed_ratio(num, den):
        return F.when(den == 0, F.lit(None).cast("long")).otherwise(
            F.signum(num).cast("long")
            * ratio_micros_halfup(F.abs(num), den)
        )

    two = F.lit(2).cast("decimal(38,0)")
    # ARI num/den are BOTH scaled by 2 to clear the half-integer in the
    # Hubert-Arabie denominator: p_all*(p_clu+p_tru) can be ODD, and an
    # exact-decimal /2 (Spark) vs a floor //2 (DuckDB, Fractions)
    # diverge by 1 on odd products, shifting ari_micros by thousands of
    # micros on small slices. Scaling keeps every operand an exact
    # integer in BOTH engines; the ratio is unchanged.
    ari_num = two * (tp * p_all - p_clu * p_tru)
    ari_den = p_all * (p_clu + p_tru) - two * p_clu * p_tru
    return j.select(
        F.col("n_items"),
        tp.cast("long").alias("tp_pairs"),
        p_clu.cast("long").alias("cluster_pairs"),
        p_tru.cast("long").alias("truth_pairs"),
        signed_ratio(tp, p_clu).alias("precision_micros"),
        signed_ratio(tp, p_tru).alias("recall_micros"),
        signed_ratio(two * tp, p_clu + p_tru).alias("f1_micros"),
        signed_ratio(
            p_all - p_clu - p_tru + two * tp, p_all
        ).alias("rand_micros"),
        (
            signed_ratio(ari_num, ari_den)
            + magnitude_guard(
                F.col("n_items"), 1_000_000_000, "clustering_pair_eval"
            )
        ).alias("ari_micros"),
    )


def clustering_pair_eval_oracle_sql(
    rows_sql: str, cluster_sql: str = "cluster", truth_sql: str = "truth"
) -> str:
    """DuckDB twin of :func:`clustering_pair_eval` (HUGEINT pair
    algebra; same sign-aware HALF_UP)."""
    r = (
        "(CASE WHEN ({d}) = 0 THEN NULL ELSE "
        "(CASE WHEN ({n}) >= 0 THEN 1 ELSE -1 END) * "
        "((2000000 * abs({n}) + ({d})) // (2 * ({d}))) END)::BIGINT"
    )
    return f"""
WITH d AS (SELECT {cluster_sql} AS c, {truth_sql} AS t
           FROM ({rows_sql}) raw0),
cont AS (SELECT c, t, count(*)::HUGEINT AS n FROM d GROUP BY c, t),
s AS (SELECT sum(n * (n - 1) // 2)::HUGEINT AS tp,
             sum(n)::HUGEINT AS n_items FROM cont),
pc AS (SELECT sum(nc * (nc - 1) // 2)::HUGEINT AS p_clu
       FROM (SELECT sum(n) AS nc FROM cont GROUP BY c)),
pt AS (SELECT sum(nt * (nt - 1) // 2)::HUGEINT AS p_tru
       FROM (SELECT sum(n) AS nt FROM cont GROUP BY t)),
m AS (SELECT *, n_items * (n_items - 1) // 2 AS p_all
      FROM s CROSS JOIN pc CROSS JOIN pt)
SELECT n_items::BIGINT AS n_items, tp::BIGINT AS tp_pairs,
       p_clu::BIGINT AS cluster_pairs, p_tru::BIGINT AS truth_pairs,
       {r.format(n='tp', d='p_clu')} AS precision_micros,
       {r.format(n='tp', d='p_tru')} AS recall_micros,
       {r.format(n='2 * tp', d='p_clu + p_tru')} AS f1_micros,
       {r.format(n='p_all - p_clu - p_tru + 2 * tp', d='p_all')}
         AS rand_micros,
       {r.format(n='2 * (tp * p_all - p_clu * p_tru)',
                 d='p_all * (p_clu + p_tru) - 2 * p_clu * p_tru')}
         AS ari_micros
FROM m
"""


def join_explosion_preflight(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """EXACT output cardinality of a proposed equi-join, WITHOUT running
    it: |A join B| = sum over shared keys of n_a(k) * n_b(k), computed
    from the two key-count tables -- the pre-flight a 100 TB pipeline
    runs before an unfamiliar join (self-joins like the z144 co-purchase
    build can explode quadratically in the heaviest key; this answers
    "can I afford it" at the cost of two count aggregates instead of
    the join itself). Complements z186's single-table skew profile with
    the JOINT number that actually bounds the shuffle output.

    One summary row: input sizes, key counts, shared keys, exact
    join_rows, amplification vs the larger input (HALF_UP micros), the
    heaviest key's pair contribution and its share -- when one key owns
    most of the output, salting THAT key is the fix (operators/skew.py);
    when amplification itself is the problem, rethink the join.
    DECIMAL(38,0) products (n_a * n_b wraps int64 at corpus scale).
    """
    from ..functions.exactnum import ratio_micros_halfup

    from ..functions.staging import staged

    # staged (r15): each key-count table fans out into the joint-pairs
    # leg AND its own 1-row total -- without the cut both corpus
    # aggregates run twice. persist: the count tables are bounded by
    # distinct keys (and spill to disk if that is still large), which
    # beats re-aggregating the full input.
    lc = staged(
        left.groupBy(F.col(left_key).alias("_k")).agg(
            F.count(F.lit(1)).alias("_na")
        ),
        mode="persist",
    )
    rc = staged(
        right.groupBy(F.col(right_key).alias("_k")).agg(
            F.count(F.lit(1)).alias("_nb")
        ),
        mode="persist",
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    joint = lc.join(rc, "_k").select(
        "_k", (dec("_na") * dec("_nb")).alias("_pairs")
    )
    lt = lc.agg(
        F.sum("_na").cast("long").alias("left_rows"),
        F.count(F.lit(1)).cast("long").alias("n_left_keys"),
    )
    rt = rc.agg(
        F.sum("_nb").cast("long").alias("right_rows"),
        F.count(F.lit(1)).cast("long").alias("n_right_keys"),
    )
    jt = joint.agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_keys"),
        F.coalesce(F.sum("_pairs"), F.lit(0).cast("decimal(38,0)")).alias(
            "_join_rows"
        ),
        F.max("_pairs").alias("_max_pairs"),
    )
    out = lt.crossJoin(F.broadcast(rt)).crossJoin(F.broadcast(jt))
    bigger = F.greatest(F.col("left_rows"), F.col("right_rows"))
    return out.select(
        "left_rows",
        "right_rows",
        "n_left_keys",
        "n_right_keys",
        "n_shared_keys",
        F.col("_join_rows").cast("long").alias("join_rows"),
        ratio_micros_halfup(F.col("_join_rows"), bigger).alias(
            "amplification_micros"
        ),
        F.coalesce(F.col("_max_pairs"), F.lit(0).cast("decimal(38,0)"))
        .cast("long")
        .alias("max_key_pairs"),
        F.when(
            F.col("_join_rows") == 0, F.lit(None).cast("long")
        ).otherwise(
            ratio_micros_halfup(
                F.coalesce(
                    F.col("_max_pairs"), F.lit(0).cast("decimal(38,0)")
                ),
                F.col("_join_rows"),
            )
        ).alias("max_key_share_micros"),
    )


def join_explosion_preflight_oracle_sql(
    left_sql: str, right_sql: str, left_key: str, right_key: str
) -> str:
    """DuckDB twin of :func:`join_explosion_preflight`."""
    return f"""
WITH lc AS (SELECT {left_key} AS k, count(*)::HUGEINT AS na
            FROM ({left_sql}) l0 GROUP BY 1),
rc AS (SELECT {right_key} AS k, count(*)::HUGEINT AS nb
       FROM ({right_sql}) r0 GROUP BY 1),
joint AS (SELECT lc.k, na * nb AS pairs FROM lc JOIN rc USING (k)),
lt AS (SELECT sum(na)::BIGINT AS left_rows,
              count(*)::BIGINT AS n_left_keys FROM lc),
rt AS (SELECT sum(nb)::BIGINT AS right_rows,
              count(*)::BIGINT AS n_right_keys FROM rc),
jt AS (SELECT count(*)::BIGINT AS n_shared_keys,
              coalesce(sum(pairs), 0)::HUGEINT AS join_rows,
              coalesce(max(pairs), 0)::HUGEINT AS max_key_pairs
       FROM joint)
SELECT left_rows, right_rows, n_left_keys, n_right_keys, n_shared_keys,
       join_rows::BIGINT AS join_rows,
       ((2000000 * join_rows + greatest(left_rows, right_rows))
        // (2 * greatest(left_rows, right_rows)))::BIGINT
         AS amplification_micros,
       max_key_pairs::BIGINT AS max_key_pairs,
       (CASE WHEN join_rows = 0 THEN NULL
             ELSE (2000000 * max_key_pairs + join_rows)
                  // (2 * join_rows) END)::BIGINT AS max_key_share_micros
FROM lt CROSS JOIN rt CROSS JOIN jt
"""


def chisq_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test statistic for independence of two
    categorical columns -- the mechanical "did the joint distribution
    move" check a curation pipeline runs between label-ish columns
    (source x language, split x topic, annotator x verdict): a chisq
    far above dof says the columns are coupled (e.g. one source is
    feeding one language), which silently breaks source-stratified
    sampling assumptions. Complements z171's per-column drift (this is
    the JOINT coupling number) and z184's confusion matrix (no truth
    labels needed here).

    Algebra without the zero-cell cross product: the textbook sum runs
    over ALL R x C cells including unobserved ones, but since
    sum_all(r*c) = N^2, the zero cells contribute exactly
    N - sum_obs(r*c)/N, so

        chisq = sum_obs (O*N - r*c)^2 / (N*r*c)  +  N  -  sum_obs r*c/N

    -- observed cells only, no crossJoin of the category domains.
    Exactness: each of the two per-cell rationals is quantized ONCE to
    integer micros (HALF_UP -- the z185 per-component rule; both
    engines quantize identically so the sum is an exact BIGINT match;
    total quantization error <= 1e-6 per cell, far below any decision
    threshold on a statistic compared against dof). Magnitude honesty:
    the squared numerator needs 2e6 * N^4 < 1e38, i.e. N up to ~5e7
    rows per evaluation slice -- profiling runs on slices, and the
    bound is ENFORCED by an explicit runtime guard (``magnitude_guard``
    raises past 5e7 rows; with ANSI off, DECIMAL overflow would
    otherwise yield NULL cells that F.sum silently skips -- ADVICE
    r14).

    NULL semantics (ADVICE r14): rows with a NULL in EITHER column are
    excluded BEFORE the contingency aggregate -- the chi-square test
    is defined over jointly-observed category pairs, and excluding
    them up front keeps N equal to the summed cells (previously the
    null-unsafe margin joins dropped NULL cells from the deviation
    sums while counting their rows in N, biasing the statistic). The
    oracle applies the identical WHERE.

    Scale shape: ONE (a, b) count aggregate over the rows, two bounded
    re-aggregations for the margins, two equi-joins of the cell table
    against the margins, a 1-row total broadcast, one sum. Output one
    row: n, category counts, observed cells, dof, chisq_micros.
    """
    from ..functions.exactnum import magnitude_guard, ratio_micros_halfup

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    from ..functions.staging import staged

    # staged (r15): cont fans out into ra/cb/tot/j -- without the cut
    # the corpus-sized (a, b) aggregate runs four times
    cont = staged(
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .agg(F.count(F.lit(1)).alias("_o")),
        mode="persist",
    )
    ra = cont.groupBy("_a").agg(F.sum("_o").alias("_r"))
    cb = cont.groupBy("_b").agg(F.sum("_o").alias("_c"))
    tot = cont.agg(
        F.sum("_o").cast("long").alias("_n"),
        F.count(F.lit(1)).cast("long").alias("_cells"),
    )
    j = (
        cont.join(ra, "_a")
        .join(cb, "_b")
        .crossJoin(F.broadcast(tot))
    )
    o, r, c, n = (
        dec(F.col("_o")),
        dec(F.col("_r")),
        dec(F.col("_c")),
        dec(F.col("_n")),
    )
    dev = o * n - r * c
    cell_dev = ratio_micros_halfup(dev * dev, n * r * c)
    cell_exp = ratio_micros_halfup(r * c, n)
    agg = j.groupBy("_n", "_cells").agg(
        F.sum(cell_dev).cast("long").alias("_s_dev"),
        F.sum(cell_exp).cast("long").alias("_s_exp"),
        F.countDistinct("_a").cast("long").alias("n_a_cats"),
        F.countDistinct("_b").cast("long").alias("n_b_cats"),
    )
    return agg.select(
        F.col("_n").alias("n"),
        "n_a_cats",
        "n_b_cats",
        F.col("_cells").alias("n_observed_cells"),
        ((F.col("n_a_cats") - 1) * (F.col("n_b_cats") - 1)).alias("dof"),
        (
            F.col("_s_dev")
            + F.col("_n") * F.lit(1_000_000).cast("long")
            - F.col("_s_exp")
            + magnitude_guard(F.col("_n"), 50_000_000, "chisq_independence")
        ).alias("chisq_micros"),
    )


def chisq_independence_oracle_sql(
    rows_sql: str, a_sql: str = "a", b_sql: str = "b"
) -> str:
    """DuckDB twin of :func:`chisq_independence` (HUGEINT cell algebra,
    same per-cell HALF_UP micro-quantization)."""
    q = "((2000000 * ({num}) + ({den})) // (2 * ({den})))"
    cell_dev = q.format(num="dev * dev", den="n * r * c")
    cell_exp = q.format(num="r * c", den="n")
    return f"""
WITH d AS (SELECT ({a_sql}) AS a, ({b_sql}) AS b FROM ({rows_sql}) raw0
           WHERE ({a_sql}) IS NOT NULL AND ({b_sql}) IS NOT NULL),
cont AS (SELECT a, b, count(*)::HUGEINT AS o FROM d GROUP BY a, b),
ra AS (SELECT a, sum(o)::HUGEINT AS r FROM cont GROUP BY a),
cb AS (SELECT b, sum(o)::HUGEINT AS c FROM cont GROUP BY b),
tot AS (SELECT sum(o)::HUGEINT AS n, count(*)::BIGINT AS cells FROM cont),
j AS (SELECT cont.a, cont.b, o, r, c, n, cells,
             (o * n - r * c) AS dev
      FROM cont JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot)
SELECT max(n)::BIGINT AS n,
       count(DISTINCT a)::BIGINT AS n_a_cats,
       count(DISTINCT b)::BIGINT AS n_b_cats,
       max(cells)::BIGINT AS n_observed_cells,
       ((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1))::BIGINT AS dof,
       (sum({cell_dev})
        + max(n) * 1000000
        - sum({cell_exp}))::BIGINT AS chisq_micros
FROM j
"""


def score_calibration(
    df: DataFrame,
    score_micros: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Expected calibration error of a probability-like score against a
    binary label -- the "can I trust 0.9 to mean 90%" gate run before
    any score threshold is promoted to a filter (quality classifiers,
    langid confidences, dedup-match scores): a well-ranked score
    (high AUC) can still be badly calibrated, and a calibrated
    threshold is what a curation pipeline actually deploys.

    ECE = sum_b (n_b/N) * |mean_score_b - pos_rate_b| over equal-width
    score bins. Both per-bin terms share the bin's n_b, so the weighted
    sum TELESCOPES to one clearable denominator:

        ECE_micros = HALF_UP( sum_b |S_b - 1e6 * P_b| , N )

    with S_b = sum of score_micros and P_b = positive count in bin b --
    every operand an exact BIGINT, ONE division total (the z171 "pick
    the algebra that clears" discipline; no per-cell quantization
    needed here). The sup-gap (max_bin_gap_micros, the Kolmogorov-style
    worst bin) takes one exact HALF_UP per OBSERVED bin, also exact.

    Scale shape: one n_bins-ary count/sum aggregate over the rows
    (map-side combined), then one 1-row re-aggregate of the bin table.
    Output one row: (n, n_pos, n_bins, n_bins_observed, ece_micros,
    max_bin_gap_micros). Scores must already be integer micros in
    [0, 1e6] (the engine's score convention); the 1e6 edge joins the
    top bin.
    """
    from ..functions.exactnum import floordiv_nonneg, ratio_scaled_halfup

    b = F.least(
        F.lit(n_bins - 1).cast("long"),
        floordiv_nonneg(
            score_micros.cast("long") * n_bins, F.lit(1_000_000).cast("long")
        ),
    ).cast("long")
    bins = df.select(
        b.alias("_b"),
        score_micros.cast("long").alias("_s"),
        label.cast("boolean").cast("int").alias("_y"),
    ).groupBy("_b").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_s").cast("long").alias("_sum_s"),
        F.sum("_y").cast("long").alias("_n_pos"),
    )
    gap = F.abs(F.col("_sum_s") - F.lit(1_000_000).cast("long") * F.col("_n_pos"))
    return bins.agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum("_n_pos").cast("long").alias("n_pos"),
        F.lit(n_bins).cast("long").alias("n_bins"),
        F.count(F.lit(1)).cast("long").alias("n_bins_observed"),
        F.sum(gap).cast("long").alias("_total_gap"),
        # gaps are ALREADY micros: scale-0 HALF_UP division, no rescale
        F.max(ratio_scaled_halfup(gap, F.col("_n"), 0)).alias(
            "max_bin_gap_micros"
        ),
    ).select(
        "n",
        "n_pos",
        "n_bins",
        "n_bins_observed",
        ratio_scaled_halfup(F.col("_total_gap"), F.col("n"), 0).alias(
            "ece_micros"
        ),
        "max_bin_gap_micros",
    )


def score_calibration_oracle_sql(
    rows_sql: str,
    score_sql: str = "score_micros",
    label_sql: str = "label",
    n_bins: int = 10,
) -> str:
    """DuckDB twin of :func:`score_calibration` (same telescoped
    single-division ECE, same per-bin sup-gap)."""
    # the per-bin gaps are already micros: scale-0 HALF_UP division
    r = "((2 * ({num}) + ({den})) // (2 * ({den})))"
    return f"""
WITH d AS (SELECT least({n_bins - 1},
                        (({score_sql})::BIGINT * {n_bins}) // 1000000) AS b,
                  ({score_sql})::BIGINT AS s,
                  (CASE WHEN {label_sql} THEN 1 ELSE 0 END)::BIGINT AS y
           FROM ({rows_sql}) raw0),
bins AS (SELECT b, count(*)::BIGINT AS n, sum(s)::BIGINT AS sum_s,
                sum(y)::BIGINT AS n_pos
         FROM d GROUP BY b)
SELECT sum(n)::BIGINT AS n,
       sum(n_pos)::BIGINT AS n_pos,
       {n_bins}::BIGINT AS n_bins,
       count(*)::BIGINT AS n_bins_observed,
       {r.format(num="sum(abs(sum_s - 1000000 * n_pos))", den="sum(n)")}::BIGINT
         AS ece_micros,
       max({r.format(num="abs(sum_s - 1000000 * n_pos)", den="n")})::BIGINT
         AS max_bin_gap_micros
FROM bins
"""
