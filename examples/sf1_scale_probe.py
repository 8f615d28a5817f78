"""sf0.1 -> sf1 scaling probe for the relational core (VERDICT r13 #5):
the 100x design claims for q01-q50 rest on plan audits; this measures
ONE real 10x point. The sf1 dataset is built once by unioning 10
KEY-SHIFTED copies of the sf0.1 tables (every copy shifts c_custkey /
s_suppkey / p_partkey / o_orderkey consistently across referencing
columns, so join integrity and per-copy selectivities are preserved
exactly -- dims region/nation stay fixed, so dim-grouped results get
10x rows per group and key-grouped results get 10x groups). Headline
relational entries are then timed at both scales; any entry whose wall
grows by more than the 15x flag line for 10x data is a scaling bug.

    python examples/sf1_scale_probe.py [--rebuild] [entries...]

Writes the scaled data to /tmp/sf1_scaled (testdata is read-only);
non-scaled tables are symlinked. PERF.md records the run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_world_banks_with_python_and_postgresql_spark.session import get_spark
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import (
    TABLE_NAMES,
    load,
)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_scaled"
COPIES = 10

# (table, [columns shifted by that table's key offset])
SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
}

# sf0.1-vs-sf1 probe set: headline relational entries that read only
# the five scaled tables (+ fixed dims)
DEFAULT_ENTRIES = [
    "q01_pricing_summary",
    "q02_top_orders",
    "q03_shipping_priority",
    "q04_priority_semijoin",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q07_customer_order_stats",
    "q09_anti_no_orders",
    "q12_rollup",
    "q15_distinct_agg",
]


def build_sf1(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    offsets = {
        dom: (
            load(spark, t, SRC).agg(F.max(k)).collect()[0][0] or 0
        ) + 1
        for t, k, dom in [
            ("customer", "c_custkey", "cust"),
            ("supplier", "s_suppkey", "supp"),
            ("part", "p_partkey", "part"),
            ("orders", "o_orderkey", "order"),
        ]
    }
    print(f"# key offsets: {offsets}")
    for t in TABLE_NAMES:
        out = f"{DST}/{t}.parquet"
        if os.path.exists(out):
            continue
        if t not in SHIFTS:
            os.symlink(f"{SRC}/{t}.parquet", out)
            continue
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = base
            for col, dom in SHIFTS[t].items():
                c = c.withColumn(col, F.col(col) + i * offsets[dom])
            parts.append(c)
        united = parts[0]
        for p in parts[1:]:
            united = united.unionByName(p)
        united.write.parquet(out + ".staging")
        os.rename(out + ".staging", out)
        print(f"# built {t}: {spark.read.parquet(out).count()} rows")


# sf1 probe set for the LLM-pipeline headliners (VERDICT r14 #3): the
# operators a 100 TB corpus user runs first. These read `documents`,
# which the relational builder leaves unscaled -- `--llm` builds a
# DISJOINT 10x corpus instead: doc_id shifted per copy AND every
# whitespace token suffixed "_<i>" (copy 0 verbatim), so within-copy
# dup/near-dup structure is preserved EXACTLY while cross-copy shingle/
# line/hash spaces are disjoint (identical copies would instead grow
# every LSH bucket 10x and measure a data-induced quadratic blowup,
# not the operator's scaling -- the graph_scale_probe disjoint-copy
# rule).
LLM_ENTRIES = [
    "q30_dedup_exact",
    "q32_dedup_minhash_lsh",
    "z118_line_dedup",
    "q48_decontaminate",
    "z114_minhash_index_build",
    "z115_minhash_index_probe",
    "z144_triangle_count",
]


def build_sf1_llm(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    out = f"{DST}/documents.parquet"
    if os.path.exists(out) and not os.path.islink(out):
        return
    if os.path.islink(out):
        os.unlink(out)
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    max_id = base.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [base]
    for i in range(1, COPIES):
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda w: F.concat(w, F.lit(f"_{i}")),
            ),
            " ",
        )
        parts.append(
            base.withColumn("doc_id", F.col("doc_id") + i * max_id)
            .withColumn("text", suffixed)
        )
    united = parts[0]
    for p in parts[1:]:
        united = united.unionByName(p)
    united.write.mode("overwrite").parquet(out + ".staging")
    import shutil

    if os.path.exists(out):
        shutil.rmtree(out)
    os.rename(out + ".staging", out)
    print(f"# built documents: {spark.read.parquet(out).count()} rows")


# sf1 CORE-scaling probe set (VERDICT r15 #5): the top-10 slowest bench
# entries (r16 baseline, pipeline_e2e excluded -- it is contractual
# fixed-cost job-launch overhead on ~100 rows, not a data-parallel
# query). Each is timed at sf1 under $SPARK_GRAFT_CPUS; run the script
# twice (CPUS=32 then CPUS=8) and compare. Two entries need extra
# disjoint-copy builds:
#  - z97 reads `embeddings`: copy i shifts vec_id and applies a
#    deterministic per-copy SIGN-FLIP to the vector dims (a diagonal
#    +-1 orthogonal transform -- within-copy cosines are preserved
#    bit-for-bit, cross-copy cosines decorrelate toward the base
#    corpus's own near-zero pairwise distribution).
#  - z19 (semantic dedup, also embeddings) is EXCLUDED with a named
#    cause: the base corpus's pairwise-cosine tail already reaches
#    ~0.38 at p99.9 against the operator's 0.45 verify threshold, so
#    ANY structure-preserving 10x population in the fixed 64-dim space
#    (orthogonal transforms are the only cosine-preserving maps) puts
#    ~100x more near-threshold pair mass across copies -- measured:
#    the sign-flip build produced enough cross-copy >=0.45 edges that
#    min-label propagation exceeded max_iter=25 (a property of the
#    synthetic population, not the operator; verified identically on
#    the pre-r16 operator code). Its scaling evidence stays the sf0.1
#    bench + the q32/z114 rows (the same LSH band/verify machinery).
#  - z153 blocks part pairs on p_type equality: copies with identical
#    p_type would multiply every block 10x (pair space 100x) and merge
#    entities across copies. A separate build (DST_ER) suffixes p_type
#    with the copy index -- blocks are exactly copy-disjoint, within-
#    copy edges and cluster structure unchanged.
TOP10_ENTRIES = [
    "z144_triangle_count",
    "z147_connected_components",
    "z166_triangle_estimate",
    "z153_entity_resolution",
    "z97_diversity_sample",
    "z114_minhash_index_build",
    "z101_cdc_join_view",
    "z132_pagerank",
    "z151_winnow_index_build",
    "z139_weighted_pagerank",
]

DST_ER = "/tmp/sf1_scaled_er"
ER_DIR_ENTRIES = {"z153_entity_resolution"}


def build_sf1_emb(spark) -> None:
    out = f"{DST}/embeddings.parquet"
    if os.path.exists(out) and not os.path.islink(out):
        return
    if os.path.islink(out):
        os.unlink(out)
    base = spark.read.parquet(f"{SRC}/embeddings.parquet")
    max_id = base.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [base]
    for i in range(1, COPIES):
        flipped = F.transform(
            F.col("embedding"),
            lambda x, d: (
                x
                * F.when(
                    F.pmod(F.xxhash64(F.lit(i), d), F.lit(2)) == 1,
                    F.lit(-1.0),
                ).otherwise(F.lit(1.0))
            ).cast("float"),
        )
        parts.append(
            base.withColumn("vec_id", F.col("vec_id") + i * max_id)
            .withColumn("embedding", flipped)
        )
    united = parts[0]
    for p in parts[1:]:
        united = united.unionByName(p)
    united.write.mode("overwrite").parquet(out + ".staging")
    import shutil

    if os.path.exists(out):
        shutil.rmtree(out)
    os.rename(out + ".staging", out)
    print(f"# built embeddings: {spark.read.parquet(out).count()} rows")


def build_sf1_er(spark) -> None:
    os.makedirs(DST_ER, exist_ok=True)
    out = f"{DST_ER}/part.parquet"
    if not os.path.exists(out):
        base = spark.read.parquet(f"{SRC}/part.parquet")
        offset = base.agg(F.max("p_partkey")).collect()[0][0] + 1
        parts = []
        for i in range(COPIES):
            c = base.withColumn(
                "p_partkey", F.col("p_partkey") + i * offset
            )
            if i > 0:
                c = c.withColumn(
                    "p_type", F.concat(F.col("p_type"), F.lit(f"#{i}"))
                )
            parts.append(c)
        united = parts[0]
        for p in parts[1:]:
            united = united.unionByName(p)
        united.write.parquet(out + ".staging")
        os.rename(out + ".staging", out)
        print(f"# built ER part: {spark.read.parquet(out).count()} rows")
    for t in TABLE_NAMES:
        link = f"{DST_ER}/{t}.parquet"
        if t != "part" and not os.path.exists(link):
            # everything else reuses the main sf1 build (or the raw
            # sf0.1 symlink it contains)
            os.symlink(os.path.realpath(f"{DST}/{t}.parquet"), link)


def run_top10(spark, entries) -> None:
    """Time entries at sf1 ONLY (one number per entry; min of 2).

    Core-scaling protocol: invoke once with SPARK_GRAFT_CPUS=32 and once
    with SPARK_GRAFT_CPUS=8; the 8/32 wall ratio per entry goes in
    PERF.md. (Two processes because the core count is fixed at session
    creation.)
    """
    from etl_world_banks_with_python_and_postgresql_spark.plans.queries import (
        REGISTRY,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "?")
    print(f"# sf1 top-10 probe, cpus={cpus}")
    for name in entries:
        fn = REGISTRY[name].fn
        sf_dir = DST_ER if name in ER_DIR_ENTRIES else DST
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        print(f"{name}: {min(runs):.3f}s (cpus={cpus})")


def main() -> None:
    args = [
        a
        for a in sys.argv[1:]
        if a not in ("--rebuild", "--llm", "--top10")
    ]
    if "--rebuild" in sys.argv:
        import shutil

        shutil.rmtree(DST, ignore_errors=True)
        shutil.rmtree(DST_ER, ignore_errors=True)
    llm = "--llm" in sys.argv
    top10 = "--top10" in sys.argv
    entries = args or (
        TOP10_ENTRIES if top10 else LLM_ENTRIES if llm else DEFAULT_ENTRIES
    )
    spark = get_spark(app_name="sf1-scale-probe")
    build_sf1(spark)
    if llm:
        build_sf1_llm(spark)
    if top10:
        build_sf1_llm(spark)
        build_sf1_emb(spark)
        build_sf1_er(spark)
        run_top10(spark, entries)
        return

    from etl_world_banks_with_python_and_postgresql_spark.plans.queries import (
        REGISTRY,
    )

    print(f"# entry | sf0.1 s | sf1 s | ratio (10x data; flag > 15x)")
    flagged = []
    for name in entries:
        fn = REGISTRY[name].fn
        ts = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            ts[label] = min(runs)
        ratio = ts["sf1"] / ts["sf0.1"]
        mark = " <-- FLAG" if ratio > 15 else ""
        if ratio > 15:
            flagged.append(name)
        print(
            f"{name}: {ts['sf0.1']:.3f}s | {ts['sf1']:.3f}s | "
            f"{ratio:.1f}x{mark}"
        )
    print(f"# flagged (> 15x for 10x data): {flagged or 'none'}")


if __name__ == "__main__":
    main()
