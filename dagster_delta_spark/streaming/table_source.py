"""Version-offset streaming source for ``DeltaSparkTable`` (Spark 4
Python DataSource API).

Offsets are table VERSIONS: each microbatch reads exactly the files
added by append commits in ``(start, end]``, skipping compaction
commits — so the stream is exactly-once AND compaction-safe.  The
plain file-source alternative (``read_table_stream``) tracks files,
not commits: an ``optimize()`` on the source table re-emits every
compacted row there, while this source never does (same guarantee as
``DeltaSparkTable.read_changes``, lifted into Structured Streaming).

Data rewrites (overwrite / merge / create-or-replace) violate the
append-only streaming contract and fail the stream loudly instead of
silently duplicating.

Scale notes: ``partitions()`` runs on the driver and touches only log
metadata (one JSON read per new version); each added file becomes one
input partition, read executor-side as Arrow batches — parallelism =
files per batch, bounded by the writer's file sizing.  Requires the
table URI to be reachable from executors (shared storage on a real
cluster — same contract every lake source has).

Usage::

    spark.dataSource.register(DeltaSparkTableDataSource)
    stream = (spark.readStream.format("dds_table")
              .option("path", table_uri).load())
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .. import tablelog


class _AddedFile(InputPartition):
    def __init__(self, path: str, partition_values: dict[str, str]):
        self.path = path
        self.partition_values = partition_values


class DeltaSparkTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, table_uri: str,
                 starting_version: int = 0):
        self._schema = schema
        self._table_uri = table_uri
        self._initial = starting_version - 1

    # -- driver side: offsets are versions, partitions are added files --

    def initialOffset(self) -> dict:
        # startingVersion lets a consumer begin past vacuumed history
        # (a compacted-then-vacuumed prefix has no surviving original
        # files to stream; start after the compaction and read() the
        # snapshot for the backfill)
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        return {"version": tablelog.latest_version(self._table_uri)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            operation = ""
            adds = []
            for action in tablelog.read_version_actions(self._table_uri, v):
                if "commitInfo" in action:
                    operation = action["commitInfo"].get("operation", "")
                elif "add" in action:
                    adds.append(tablelog.AddFile.from_action(action["add"]))
            kind = tablelog.classify_commit(operation)
            if kind == "compaction":
                continue
            if v > 0 and kind == "rewrite":
                raise ValueError(
                    f"version {v} is a data rewrite ({operation}); "
                    "streaming requires an append-only source table"
                )
            parts.extend(
                _AddedFile(
                    # shallow-cloned files resolve against their
                    # source root, not this table's
                    os.path.join(a.base or self._table_uri, a.path),
                    dict(a.partition_values),
                )
                for a in adds
            )
        return parts

    def commit(self, end: dict) -> None:
        pass

    # -- executor side: one file per partition, Arrow batches out --

    def read(self, partition: _AddedFile) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        for name, val in partition.partition_values.items():
            field = target.field(name)
            col = pa.array([val] * n, type=pa.string()).cast(field.type)
            tbl = tbl.append_column(name, col)
        # late schema columns read as null for early files — the same
        # widening rule as DeltaSparkTable.read (a bare select() raised
        # on schema-evolved tables)
        for field in target:
            if field.name not in tbl.column_names:
                tbl = tbl.append_column(field.name,
                                        pa.nulls(n, type=field.type))
        tbl = tbl.select(target.names).cast(target)
        yield from tbl.to_batches()


class DeltaSparkTableDataSource(DataSource):
    """``dds_table``: stream a DeltaSparkTable by commit version."""

    @classmethod
    def name(cls) -> str:
        return "dds_table"

    def _uri(self) -> str:
        uri = self.options.get("path")
        if not uri:
            raise ValueError("dds_table requires .option('path', table_uri)")
        return uri

    def schema(self) -> StructType:
        import json

        snap = tablelog.load_snapshot(self._uri())
        return StructType.fromJson(json.loads(snap.schema_json))

    def streamReader(self, schema: StructType) -> DeltaSparkTableStreamReader:
        return DeltaSparkTableStreamReader(
            schema, self._uri(),
            int(self.options.get("startingVersion", "0")),
        )
