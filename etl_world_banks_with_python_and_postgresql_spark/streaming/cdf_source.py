"""Structured Streaming source over an IncrementalTable's change feed.

``IncrementalTable.read_changes`` (sources/incremental.py) gives a batch
consumer O(|changes|) rows per sync, but the consumer owns the
checkpoint ("what seq did I last process?"). This module moves that
bookkeeping where it belongs in Spark: a **streaming source** whose
offset IS the table's commit seq, so

    spark.readStream.format("incr_cdf").option("path", table_root).load()

turns every committed delta batch into a micro-batch, with Spark's own
checkpointing providing exactly-once progress tracking, restart
recovery, and replay (``readBetweenOffsets`` re-reads a committed seq
range bit-for-bit -- the manifest files are immutable once written).
The downstream-materialized-view loop this closes: incremental table ->
CDF stream -> foreachBatch merge into a dependent aggregate
(streaming/incremental_sink.py), each leg O(|batch|), never a rescan.

Spark 4 ``SimpleDataSourceStreamReader`` protocol: the DRIVER reads and
pickles each batch's rows (executor replay on failure). That bounds a
single micro-batch to driver-memory-sized delta batches -- the write
path's contract already (write_delta batches are ingest-batch-sized,
compact folds them). Delta parquet is read with pyarrow directly: the
reader runs outside any SparkSession, and on a cluster the table root
must be a shared filesystem path, same as the manifest protocol itself.

Rows surface in manifest-schema order plus the CDF columns
``_change_type`` ('upsert' | 'delete') and ``_commit_seq`` -- identical
to ``read_changes`` output (equivalence pinned in tests). A vacuumed
seq range raises loudly (consumer must re-seed from a snapshot), never
silently skips.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource

try:  # Spark 4 simple-stream API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    HAS_SIMPLE_STREAM = True
except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]
    HAS_SIMPLE_STREAM = False

_MANIFEST = "_manifest.json"


def _load_manifest(path: str) -> dict:
    p = os.path.join(path, _MANIFEST)
    if not os.path.exists(p):
        return {"seq": 0, "base": None, "deltas": []}
    with open(p) as f:
        return json.load(f)


def _delta_files(root: str, name: str) -> list[str]:
    d = os.path.join(root, name)
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"change stream references vacuumed file set member {name} "
            f"under {root}; re-seed from a snapshot"
        )
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith("_")
    )


class CdfDataSource(DataSource):
    """See module docstring.

    Options:
        path     IncrementalTable root (required)
        schema   data-column DDL, e.g. ``"id long, val string"``
                 (optional; default sniffs the newest delta's parquet
                 footer via pyarrow)
    """

    @classmethod
    def name(cls) -> str:
        return "incr_cdf"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("incr_cdf requires .option('path', <table root>)")
        return root

    def schema(self) -> str:
        ddl = self.options.get("schema")
        if not ddl:
            import pyarrow.parquet as pq

            root = self._root()
            m = _load_manifest(root)
            names = [d for d in m["deltas"]] or ([m["base"]] if m["base"] else [])
            if not names:
                raise ValueError(
                    f"incr_cdf: {root} has no committed file sets to sniff "
                    "a schema from; pass .option('schema', '<ddl>')"
                )
            sch = pq.read_schema(_delta_files(root, names[-1])[0])
            _ARROW_DDL = {
                "int64": "long",
                "int32": "int",
                "double": "double",
                "float": "float",
                "string": "string",
                "large_string": "string",
                "bool": "boolean",
                "date32[day]": "date",
            }

            def ddl_type(t) -> str:
                s = str(t)
                if s.startswith("timestamp"):
                    return "timestamp"
                if s in _ARROW_DDL:
                    return _ARROW_DDL[s]
                raise ValueError(
                    f"incr_cdf cannot map arrow type {s}; pass an explicit "
                    ".option('schema', '<ddl>')"
                )

            ddl = ", ".join(
                f"`{f.name}` {ddl_type(f.type)}" for f in sch
            )
        return f"{ddl}, `_change_type` string, `_commit_seq` int"

    def simpleStreamReader(self, schema) -> "CdfStreamReader":
        # schema arrives as the resolved StructType; data columns are all
        # but the trailing CDF pair
        cols = [f.name for f in schema.fields[:-2]]
        return CdfStreamReader(self._root(), cols)


class CdfStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, root: str, cols: list[str]) -> None:
        self.root = root
        self.cols = cols

    def initialOffset(self) -> dict:
        # full-history start: the first micro-batch replays every change
        # committed so far (a CDF consumer that wants tail-only passes a
        # pre-advanced checkpoint, same as Delta's startingVersion)
        return {"seq": 0}

    def _rows(self, since: int, until: int) -> list[tuple]:
        import pyarrow.parquet as pq

        out: list[tuple] = []
        for s in range(since + 1, until + 1):
            mp = os.path.join(self.root, f"_manifest-{s:06d}.json")
            if not os.path.exists(mp):
                raise FileNotFoundError(
                    f"no committed version {s} at {self.root}"
                )
            with open(mp) as f:
                vm = json.load(f)
            name = f"delta-{s:06d}"
            if name not in vm["deltas"]:
                continue  # compaction commit: files moved, no rows changed
            kind = vm.get("delta_kinds", {}).get(name, "upsert")
            ctype = "delete" if kind == "delete" else "upsert"
            for fpath in _delta_files(self.root, name):
                tbl = pq.read_table(fpath)
                present = set(tbl.column_names)
                pydict = tbl.to_pydict()
                n = tbl.num_rows
                for i in range(n):
                    out.append(
                        tuple(
                            pydict[c][i] if c in present else None
                            for c in self.cols
                        )
                        + (ctype, s)
                    )
        return out

    def read(self, start: dict):
        # the protocol wants an ITERATOR: on a no-progress poll (end ==
        # start) the engine's prefetch wrapper probes emptiness with
        # next(it), which TypeErrors on a bare list (caught by
        # tests/test_streaming.py::test_cdf_streams_maintain_join_view_across_restart)
        cur = _load_manifest(self.root)["seq"]
        return iter(self._rows(start["seq"], cur)), {"seq": cur}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["seq"], end["seq"]))


def register_cdf_source(spark) -> None:
    """Register for ``spark.readStream.format('incr_cdf')``."""
    spark.dataSource.register(CdfDataSource)
