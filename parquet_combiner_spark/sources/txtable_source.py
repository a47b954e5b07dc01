"""`txtable` — a custom Python DataSource (Spark 4 DataSource API)
exposing the versioned table layer (:mod:`tools.txlog`) through the
standard reader surface:

    spark.dataSource.register(TxTableDataSource)
    spark.read.format("txtable").option("path", table).load()
    spark.read.format("txtable").option("version", "2").load(table)

Why this exists: the engine's fast path for versioned reads is
``txlog.read_table`` (the log resolves to a file list handed to the
JVM parquet reader — vectorized scan, pushdown, the works). The
custom source demonstrates the OTHER integration direction Spark 4
added — a pure-Python source pluggable into any reader pipeline —
with snapshot/time-travel semantics preserved: one InputPartition
per data file (task parallelism = file count), each task reading its
file via pyarrow and yielding Arrow record batches.

Scale honesty: rows cross the Python worker boundary as Arrow
batches (fast for Arrow-native formats, but never faster than the
JVM's own parquet scan, and without row-group predicate pushdown —
``pushFilters`` is left unimplemented deliberately). Use this API
shape for sources Spark has NO native reader for (internal services,
bespoke formats, feature stores); for parquet-on-disk prefer
``txlog.read_table``. Cited as the S-family extension point the
reference's fixed reader set (reference utils/DataReader.scala)
cannot express.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType


@dataclass
class _FilePartition(InputPartition):
    path: str


class TxTableReader(DataSourceReader):
    def __init__(self, schema: StructType, files: list[str]) -> None:
        self._schema = schema
        self._files = files

    def partitions(self):  # noqa: D102 — API contract
        return [_FilePartition(p) for p in self._files]

    def read(self, partition: _FilePartition):  # noqa: D102
        # executor-side import: workers must not need the driver's state
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        # Schema evolution: a merge_schema append evolves the TABLE
        # schema, but files written earlier lack the added columns —
        # read each file with the columns it HAS and null-fill the
        # rest (the same semantics txlog.read_table gets for free from
        # Spark's schema-enforced parquet scan).
        target = to_arrow_schema(self._schema)
        have = set(pq.ParquetFile(partition.path).schema_arrow.names)
        present = [f.name for f in target if f.name in have]
        table = pq.read_table(partition.path, columns=present)
        cols = {
            f.name: (
                table.column(f.name)
                if f.name in have
                else pa.nulls(table.num_rows, type=f.type)
            )
            for f in target
        }
        yield from pa.table(cols).cast(target).to_batches()


class TxTableDataSource(DataSource):
    """``format("txtable")``: snapshot reads of a txlog versioned
    table. Options: ``path`` (or the ``load(path)`` argument) and
    optional ``version`` (time travel)."""

    @classmethod
    def name(cls) -> str:
        return "txtable"

    def _resolve(self) -> tuple[list[str], str]:
        # resolved ONCE and cached: schema() and reader() are separate
        # planner calls, and a commit landing between two log reads
        # would pair one version's schema with another's file list
        cached = getattr(self, "_snapshot", None)
        if cached is not None:
            return cached
        from parquet_combiner_spark.tools import txlog

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "txtable requires a table path: .load(path) or "
                ".option('path', ...)"
            )
        version = self.options.get("version")
        self._snapshot = txlog._snapshot_files(
            path, int(version) if version is not None else None
        )
        return self._snapshot

    def schema(self) -> str:
        _, ddl = self._resolve()
        return ddl

    def reader(self, schema: StructType) -> TxTableReader:
        files, _ = self._resolve()
        return TxTableReader(schema, files)
