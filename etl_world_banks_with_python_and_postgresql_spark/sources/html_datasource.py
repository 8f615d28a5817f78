"""Spark 4 Python DataSource for HTML tables: ``spark.read.format("htmltable")``.

The reference's extract stage is a driver-side loop over two pages
(Python/etl_project_world_banks.ipynb:71-84,118-154). ``html_table.py``
reproduces that shape for tiny config-style pages; THIS module is the
scale path SURVEY §2.1 S1 calls for: a registered data source whose
partitions are the page list, so fetch + parse + project run ON THE
EXECUTORS -- a 10k-page crawl is 10k-task parallel scan, not a driver
loop. (Spark 4 `pyspark.sql.datasource` API; register once per session
via ``register_html_source``.)

Options:
    path / paths   one source, or comma-separated list (URLs or file
                   paths; file fixtures in tests)
    table_index    which <table> on the page (default 0; the reference
                   uses 2 for banks, 0 for rates)
    positions      comma-separated cell positions to keep per row, e.g.
                   "1,2" (reference drops the rank column, ipynb:92-98)
    columns        comma-separated output column names (required; the
                   declared-schema contract -- header sniffing differs
                   per page and belongs to the caller)

Output schema: the given columns (all strings -- typed casts are the
transform layer's job, same as html_table.py) plus ``src`` (the page the
row came from, the lineage column a multi-page scan needs).

On a real cluster the package must be shipped to executors (--py-files
or an environment image); local[\\*] shares the driver env.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class HtmlTableDataSource(DataSource):
    """See module docstring."""

    @classmethod
    def name(cls) -> str:
        return "htmltable"

    def _columns(self) -> list[str]:
        cols = self.options.get("columns")
        if not cols:
            raise ValueError(
                "htmltable requires .option('columns', 'a,b,...') -- the "
                "source declares its schema explicitly (SURVEY §2.1 S2)"
            )
        return [c.strip() for c in cols.split(",")]

    def schema(self) -> str:
        fields = ", ".join(f"`{c}` string" for c in self._columns())
        return f"{fields}, `src` string"

    def reader(self, schema) -> "HtmlTableReader":
        return HtmlTableReader(self.options, self._columns())

    def simpleStreamReader(self, schema) -> "HtmlTableStreamReader":
        return HtmlTableStreamReader(self.options, self._columns())


class HtmlTableReader(DataSourceReader):
    def __init__(self, options: dict, columns: list[str]) -> None:
        self.options = options
        self.columns = columns
        paths = options.get("paths") or options.get("path") or ""
        self.paths = [p.strip() for p in paths.split(",") if p.strip()]
        if not self.paths:
            raise ValueError("htmltable requires a path or .option('paths', ...)")
        self.table_index = int(options.get("table_index", 0))
        pos = options.get("positions")
        self.positions = (
            [int(x) for x in pos.split(",")] if pos else list(range(len(columns)))
        )

    def partitions(self) -> list[InputPartition]:
        # one partition per page: the unit of fetch/parse parallelism
        return [InputPartition(p) for p in self.paths]

    def read(self, partition: InputPartition):
        # runs on the executor: fetch + parse + positional projection
        from .html_table import parse_html, read_text_source

        src = partition.value
        tables, _ = parse_html(read_text_source(src))
        if self.table_index >= len(tables):
            raise ValueError(
                f"{src}: page has {len(tables)} tables; "
                f"index {self.table_index} out of range"
            )
        need = max(self.positions) + 1
        for row in tables[self.table_index].rows:
            if len(row) >= need:
                yield tuple(row[i].strip() for i in self.positions) + (src,)


def register_html_source(spark) -> None:
    """Register the source for ``spark.read.format('htmltable')``."""
    spark.dataSource.register(HtmlTableDataSource)


# --- streaming: poll a directory of page snapshots ------------------------

try:  # Spark 4 simple-stream API (driver-side reads, executor replays)
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    HAS_SIMPLE_STREAM = True
except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]
    HAS_SIMPLE_STREAM = False


class HtmlTableStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("htmltable")``: poll directories for new
    page snapshots (a crawler drop-folder), emit their table rows.

    Offset = count of consumed files in stable sorted order, so recovery
    is exact: a replayed range re-parses the same files
    (``readBetweenOffsets``), and files appended between polls form the
    next micro-batch. The batch-id protocol rides on top unchanged --
    one page drop = one micro-batch = one merge epoch
    (streaming_merge_sink). Snapshots must be append-only (standard
    drop-folder contract; mutating an already-consumed file is invisible,
    same as Spark's own file source).
    """

    def __init__(self, options: dict, columns: list[str]) -> None:
        inner = HtmlTableReader(options, columns)
        self.inner = inner
        self.dirs = inner.paths

    def _pages(self) -> list[str]:
        import glob
        import os

        files: list[str] = []
        for p in self.dirs:
            if os.path.isdir(p):
                files.extend(
                    f
                    for f in glob.glob(os.path.join(p, "*"))
                    if os.path.isfile(f)
                )
            else:
                files.extend(glob.glob(p))
        return sorted(set(files))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _rows(self, files: list[str]) -> list[tuple]:
        # materialized list, not a generator: the simple-stream protocol
        # PICKLES the returned rows (driver prefetch + executor replay),
        # and page-snapshot batches are small by construction
        return [
            row for f in files for row in self.inner.read(InputPartition(f))
        ]

    def read(self, start: dict):
        files = self._pages()
        return self._rows(files[start["idx"]:]), {"idx": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._pages()
        return self._rows(files[start["idx"]:end["idx"]])
