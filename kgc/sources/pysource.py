"""op-55: custom connector surface — a Spark 4 Python DataSource serving a
parquet table in DETERMINISTIC row-chunks, batch and streaming.

Why it exists: the built-in file streaming source's micro-batch granularity
is the FILE — testing arrival-order/batch-boundary invariants (the
streaming dedup/decontam twins) means re-laying files on disk. This source
chunks by row ranges instead: `chunk` rows per partition (batch) or per
micro-batch (streaming), with ranges derived from the table's row count —
same chunks on every run, any file layout. It is also the repo's coverage
of the Python DataSource API itself (schema/partitions/read on the batch
side; initialOffset/latestOffset/partitions/read/commit on the stream
side), the idiomatic Spark-4 way to bring a custom system into the engine
when no JVM connector exists.

Data crosses as Arrow RecordBatches (pyarrow.parquet range reads — zero
row-at-a-time Python), matching the engine's "Arrow-batched or JVM-side"
rule. Register per-session with `register_chunked_source(spark)`, then:

    spark.read.format("kgc_chunked").option("path", p).load()
    spark.readStream.format("kgc_chunked").option("path", p)
         .option("chunk", "100").load()

Scale note: this source is a TEST/INGEST shim — partition planning happens
on the driver from parquet footers (row counts only), reads are
range-pruned row groups; for lake-scale tables the native parquet source
with its distributed scan planning is the real path.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _RangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _table_rows(path: str) -> int:
    import pyarrow.dataset as ds

    return ds.dataset(path, format="parquet").count_rows()


def _read_range(path: str, start: int, end: int):
    """Arrow batches for global row range [start, end) in file order."""
    import pyarrow.dataset as ds

    if end <= start:
        return
    dataset = ds.dataset(path, format="parquet")
    # head(end) then slice is fine for the sandbox sizes this shim serves;
    # a production source would push row-group pruning here
    table = dataset.head(end).slice(start, end - start)
    yield from table.to_batches()


class ChunkedParquetSource(DataSource):
    """format("kgc_chunked"): options path (required), chunk (rows per
    partition/micro-batch, default 500)."""

    @classmethod
    def name(cls) -> str:
        return "kgc_chunked"

    def schema(self):
        import pyarrow.dataset as ds
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(
            ds.dataset(self.options["path"], format="parquet").schema
        )

    def reader(self, schema):
        return _ChunkedBatchReader(self.options)

    def streamReader(self, schema):
        return _ChunkedStreamReader(self.options)


class _ChunkedBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.chunk = int(options.get("chunk", 500))

    def partitions(self):
        n = _table_rows(self.path)
        return [
            _RangePartition(self.path, s, min(s + self.chunk, n))
            for s in range(0, n, self.chunk)
        ] or [_RangePartition(self.path, 0, 0)]

    def read(self, partition: _RangePartition):
        yield from _read_range(partition.path, partition.start, partition.end)


class _ChunkedStreamReader(DataSourceStreamReader):
    """Offsets are global row positions. latestOffset advances the driver-
    side cursor by ONE chunk per trigger — the Python DataSource API has no
    admission-control hook, so chunked micro-batches are rendered by rate-
    limiting the offset itself (the same trick a maxFilesPerTrigger file
    source plays). Offset k always maps to the same rows → batch contents
    are deterministic. After a checkpoint restart the cursor restarts at 0
    and self-heals via commit() (a few empty triggers until it passes the
    committed offset) — fine for the test/ingest shim this is; AvailableNow
    is NOT supported by Python stream sources (Spark falls back to
    single-batch), use the default processing-time trigger and stop when
    the offset reaches the table end."""

    def __init__(self, options):
        self.path = options["path"]
        self.chunk = int(options.get("chunk", 500))
        self._cursor: int | None = None

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        n = _table_rows(self.path)
        base = self._cursor if self._cursor is not None else 0
        self._cursor = min(base + self.chunk, n)
        return {"row": self._cursor}

    def partitions(self, start, end):
        s, e = int(start["row"]), int(end["row"])
        return [
            _RangePartition(self.path, c, min(c + self.chunk, e))
            for c in range(s, e, self.chunk)
        ] or [_RangePartition(self.path, s, s)]

    def read(self, partition: _RangePartition):
        yield from _read_range(partition.path, partition.start, partition.end)

    def commit(self, end):
        self._cursor = max(self._cursor or 0, int(end["row"]))


def register_chunked_source(spark) -> None:
    spark.dataSource.register(ChunkedParquetSource)
