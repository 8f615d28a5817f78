#!/usr/bin/env python
"""End-to-end CDC -> maintained materialized views: the incremental-view
operators chained the way a production change-data pipeline runs them.

Usage:
    python examples/cdc_materialized_views.py [sf_dir]

Stages (each oracle- or test-verified on its own):

  1. keyed base table     upserts + full-row delete        sources.incremental
                          tombstones, merge-on-read        .IncrementalTable
  2. change feed          the table's committed deltas     streaming.cdf_source
                          as a Structured Stream           (format "incr_cdf")
  3. maintained JOIN      z-set retraction join view,      operators.ivm
                          epoch-ledger exactly-once        .CdcJoinView
  4. maintained AGG       linear z-set counters, one       operators.ivm
                          O(|delta|) partial per epoch     .CdcAggView
  5. audit + bound        as-of time travel, then          .read(as_of=),
                          compaction folds history         .compact()

Prints one JSON line per stage. Shuffle budget: each join-view ingest
exchanges only the delta + the other side's bucket/range-PRUNED store
(parquet-footer manifests, zero extra jobs); each agg ingest is one
map-side partial with ZERO reads of prior state; reads are one
merge-on-read consolidation, bounded by compaction.
"""

import json
import shutil
import sys
import tempfile

import pyspark.sql.types as T

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_world_banks_with_python_and_postgresql_spark.operators.ivm import (  # noqa: E402
    MULT_COL,
    CdcAggView,
    CdcJoinView,
    signed,
)
from etl_world_banks_with_python_and_postgresql_spark.session import get_spark  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.sources.catalog import load  # noqa: E402
from etl_world_banks_with_python_and_postgresql_spark.sources.incremental import (  # noqa: E402
    IncrementalTable,
)
from etl_world_banks_with_python_and_postgresql_spark.streaming.cdf_source import (  # noqa: E402
    register_cdf_source,
)
from etl_world_banks_with_python_and_postgresql_spark.streaming.pipeline import (  # noqa: E402
    streaming_agg_view_sink,
    streaming_join_view_sink,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark()
    register_cdf_source(spark)
    emit = lambda stage, **kw: print(json.dumps({"stage": stage, **kw}))  # noqa: E731
    root = tempfile.mkdtemp(prefix="cdc_views_")

    cust = load(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("k"), "c_name", "c_acctbal"
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )

    # 1. keyed base table: initial load (the delete wave comes later so
    # it lands in its OWN stream epoch and stays as-of addressable)
    tbl = IncrementalTable(f"{root}/customers", id_col="k")
    tbl.write_delta(cust.filter(F.col("k") % 2 == 0))
    tbl.write_delta(cust.filter(F.col("k") % 2 == 1))
    emit("base_table", rows=tbl.read(spark, schema).count())

    # 2+3+4. change feed drives BOTH maintained views through one sink
    orders = load(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("k"), "o_orderkey", "o_totalprice"
    )
    jview = CdcJoinView(f"{root}/join_view", key="k")
    jview.ingest_right(signed(orders, +1), batch_id="orders-0")
    aview = CdcAggView(
        f"{root}/agg_view",
        keys=[],
        measures={"acctbal_cents": "CAST(c_acctbal * 100 AS BIGINT)"},
        count_col="n_customers",
    )
    # grand-total view: empty key list means one global counter row
    aview.keys = ["_all"]
    # compact_every=4: the push-button merge-on-read bound -- after any
    # applied epoch that leaves more than 4 ledgered batches the sink
    # folds history itself, so a long-running stream never needs an
    # external compaction tick (truncates read(as_of=...) history, which
    # is why the as-of audit below runs BEFORE the fold fires)
    join_sink = streaming_join_view_sink(jview, side="left", compact_every=4)
    agg_sink = streaming_agg_view_sink(aview, compact_every=4)

    def fanout(bdf, eid):
        delta = bdf.withColumn(
            MULT_COL,
            F.when(F.col("_change_type") == "delete", F.lit(-1)).otherwise(
                F.lit(1)
            ),
        ).drop("_change_type", "_commit_seq")
        join_sink(delta, eid)
        agg_sink(delta.withColumn("_all", F.lit("all")), eid)

    def drain():
        q = (
            spark.readStream.format("incr_cdf")
            .option("path", f"{root}/customers")
            .load()
            .writeStream.foreachBatch(fanout)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()  # epoch: the insert wave
    # full-row tombstones: CDC with before-images, so downstream
    # retractions can cancel measures exactly; a RESTARTED drain picks
    # them up from the same checkpoint as a fresh epoch
    victims = cust.filter(F.col("k") % 13 == 0)
    tbl.delete_keys(spark, schema, victims)
    drain()  # epoch: the delete wave
    agg_row = aview.read(spark).collect()[0]
    emit(
        "maintained_views",
        joined_pairs=jview.read(spark).count(),
        n_customers=agg_row["n_customers"],
        acctbal_cents=agg_row["acctbal_cents"],
    )

    # 5. audit: state before the tombstone epoch, then bound the history
    n_entries = len(jview._load_ledger())
    pre_delete = jview.read(spark, as_of=n_entries - 1).count()
    jview.compact(spark)
    aview.compact(spark)
    emit(
        "audit_and_compact",
        pairs_before_delete_epoch=pre_delete,
        pairs_after=jview.read(spark).count(),
        ledger_entries_after_compact=len(jview._load_ledger()),
    )

    # the maintained counters must equal a from-scratch recompute
    live = tbl.read(spark, schema)
    want_pairs = live.join(orders, "k").count()
    assert jview.read(spark).count() == want_pairs
    assert aview.read(spark).collect()[0]["n_customers"] == live.count()
    emit("verified", recompute_pairs=want_pairs)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
