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

``option("readChangeFeed", "true")`` upgrades the stream to ROW-LEVEL
CDC (the Delta CDF streaming contract, derived not stored — the
streaming twin of ``read_changes(row_level=True)``): appends emit
``insert`` rows, merge-on-read DELETE/UPDATE commits decode into
``delete`` / ``update_preimage`` / ``update_postimage`` from the DV
sidecar diffs executor-side (pyarrow positional take on the untouched
data files), and copy-rewrites still fail the stream loudly.  Every
microbatch row carries ``_change_type`` + ``_commit_version``.
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


class _ChangeFile(InputPartition):
    """One data file's contribution to a row-level CDC microbatch.

    ``mode`` picks the executor-side position filter:
    - ``all``: every row (append inserts, UPDATE postimage files)
    - ``newly_masked``: new sidecar minus old sidecar — the rows this
      DV commit masked (DELETE rows / UPDATE preimage)
    - ``live``: every row minus the old sidecar — a dropped file's
      pre-commit live rows (partition-scoped / fully-matched DELETE)
    """

    def __init__(self, path: str, partition_values: dict[str, str],
                 change_type: str, commit_version: int, mode: str,
                 root: str = "", relpath: str = "",
                 new_dv: str = "", old_dv: str = ""):
        self.path = path
        self.partition_values = partition_values
        self.change_type = change_type
        self.commit_version = commit_version
        self.mode = mode
        self.root = root
        self.relpath = relpath
        self.new_dv = new_dv
        self.old_dv = old_dv


class DeltaSparkTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, table_uri: str,
                 starting_version: int = 0, cdc: bool = False,
                 column_mapping: dict[str, str] | None = None,
                 max_versions_per_batch: int | None = None,
                 pinned_version: int = -1,
                 pinned_schema_json: str = ""):
        self._schema = schema
        self._table_uri = table_uri
        self._initial = starting_version - 1
        self._cdc = cdc
        #: the table state this run's schema was derived from: a
        #: schema- or mapping-changing metaData commit NEWER than this
        #: fails the stream loudly (see partitions) — silently reading
        #: post-evolution files under the pinned schema would DROP new
        #: columns' values (or miss renamed physicals) for every row
        #: until a restart, permanently desyncing CDC consumers whose
        #: checkpoints then skip those versions
        self._pinned_version = pinned_version
        self._pinned_schema_json = pinned_schema_json
        self._pinned_mapping = dict(column_mapping or {})
        self._max_versions = max_versions_per_batch
        #: newest offset this reader has planned or replayed — the
        #: pacing anchor (see latestOffset).  Starts at the
        #: startingVersion anchor: Spark may call latestOffset before
        #: initialOffset, and an unanchored first call would hand out
        #: the whole backlog in one batch.
        self._last_end: int | None = self._initial
        # logical -> physical (column-mapped tables write under frozen
        # physical names; captured at stream start — a mid-stream
        # RENAME changes the logical schema, which Structured
        # Streaming never evolves mid-run anyway)
        self._phys_to_logical = {
            p: l for l, p in (column_mapping or {}).items()}

    # -- driver side: offsets are versions, partitions are added files --

    def initialOffset(self) -> dict:
        # startingVersion lets a consumer begin past vacuumed history
        # (a compacted-then-vacuumed prefix has no surviving original
        # files to stream; start after the compaction and read() the
        # snapshot for the backfill)
        self._last_end = self._initial
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        """Head version, paced by ``maxVersionsPerBatch`` when set: a
        lagging consumer drains its backlog in bounded microbatches
        instead of one giant catch-up batch (the Python DataSource API
        has no admission-control hook, so pacing tracks the newest
        offset this reader has handed out, planned, or replayed).
        Restart safety (verified empirically, and by the pacing test's
        restart leg): Spark replays the checkpointed batch through
        ``partitions`` BEFORE the first post-restart poll, so the
        anchor is already at the checkpointed offset when this runs —
        pacing never moves offsets backward and never re-emits."""
        head = tablelog.latest_version(self._table_uri)
        if self._max_versions is not None and self._last_end is not None:
            head = min(head, self._last_end + self._max_versions)
        if self._last_end is None or head > self._last_end:
            self._last_end = head
        return {"version": head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # anchor pacing on every planned/replayed batch (start AND
        # end: on restart the checkpointed start is the true position)
        anchor = max(start["version"], end["version"])
        if self._last_end is None or anchor > self._last_end:
            self._last_end = anchor
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            operation = ""
            op_params: dict = {}
            adds = []
            removed_keys: set[str] = set()
            for action in tablelog.read_version_actions(self._table_uri, v):
                if "commitInfo" in action:
                    ci = action["commitInfo"]
                    operation = ci.get("operation", "")
                    op_params = ci.get("operationParameters") or {}
                elif "add" in action:
                    adds.append(tablelog.AddFile.from_action(action["add"]))
                elif self._cdc and "remove" in action:
                    removed_keys.add(tablelog.remove_key(action["remove"]))
                elif "metaData" in action and v > self._pinned_version:
                    self._refuse_if_evolved(v, action["metaData"])
            kind = tablelog.classify_commit(operation)
            if kind == "compaction":
                continue
            if v > 0 and kind == "rewrite":
                base_op = operation.split(" ")[0]
                is_dv = op_params.get("mode") == "deletion_vector"
                if self._cdc and base_op in ("DELETE", "UPDATE") and (
                        is_dv or (base_op == "DELETE" and not adds)):
                    parts.extend(self._change_parts(
                        v, base_op, adds, removed_keys))
                    continue
                raise ValueError(
                    f"version {v} is a data rewrite ({operation}); "
                    + ("the CDC stream decodes only merge-on-read "
                       "DELETE/UPDATE" if self._cdc else
                       "streaming requires an append-only source table")
                )
            if self._cdc:
                parts.extend(
                    self._change_part(a, v, "insert", "all") for a in adds)
            else:
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

    def _refuse_if_evolved(self, v: int, meta_action: dict) -> None:
        """Fail the stream at a schema- or column-mapping-changing
        commit NEWER than the run's pin point, BEFORE any of its (or
        any later version's) data emits — the checkpoint stops short
        of ``v``, so a restart re-derives the schema and replans from
        exactly here with nothing lost.  Reading on under the pinned
        schema would silently drop new columns' values (the executor
        read selects the pinned names) or miss renamed physicals.
        Config-only metaData commits (table properties) pass."""
        from ..table import _column_mapping

        new_meta = tablelog.Metadata.from_action(meta_action)
        if (new_meta.schema_json == self._pinned_schema_json
                and _column_mapping(new_meta.configuration)
                == self._pinned_mapping):
            return
        raise ValueError(
            f"version {v} changed the source's schema or column "
            "mapping while this stream was running (pinned at version "
            f"{self._pinned_version}); Structured Streaming never "
            "evolves a running query's schema, and reading on would "
            "silently drop or misread the changed columns — restart "
            "the stream (the checkpoint resumes exactly here under "
            "the new schema)"
        )

    # -- CDC decode (driver side): mirror of read_changes(row_level) --

    def _change_part(self, a: tablelog.AddFile, v: int, change: str,
                     mode: str, old: tablelog.AddFile = None
                     ) -> _ChangeFile:
        uri = self._table_uri
        part = _ChangeFile(
            os.path.join(a.base or uri, a.path),
            dict(a.partition_values), change, v, mode,
            root=os.path.abspath(a.base or uri), relpath=a.path,
            new_dv=(os.path.join(a.dv_base or uri, a.dv_path)
                    if mode == "newly_masked" and a.dv_path else ""),
            old_dv=(os.path.join(old.dv_base or uri, old.dv_path)
                    if old is not None and old.dv_path else ""),
        )
        gone = [p for p in (part.new_dv, part.old_dv)
                if p and not os.path.exists(p)]
        if gone:
            # fail on the DRIVER with the recovery path, not as a
            # cryptic executor read error (same contract as the batch
            # feed's check in table.py:_newly_masked_rows)
            raise ValueError(
                f"CDC decode of version {v} needs deletion-vector "
                f"sidecar(s) no longer on disk (vacuumed past "
                f"retention?): {gone} — read() the snapshot for a "
                "backfill and restart the stream from a later "
                "startingVersion"
            )
        return part

    def _change_parts(self, v: int, base_op: str,
                      adds: list, removed_keys: set[str]
                      ) -> list[_ChangeFile]:
        """Decode one merge-on-read DELETE/UPDATE commit into per-file
        change partitions: re-added files (mask grew) emit their newly
        masked rows, dropped files emit their pre-commit live rows, and
        an UPDATE's fresh files are the postimage."""
        prev = tablelog.load_snapshot(self._table_uri, v - 1)
        prev_by_key = {a.log_key: a for a in prev.files}
        pre = "delete" if base_op == "DELETE" else "update_preimage"
        parts = []
        for a in adds:
            if a.log_key in removed_keys:
                parts.append(self._change_part(
                    a, v, pre, "newly_masked", prev_by_key.get(a.log_key)))
            else:
                parts.append(self._change_part(
                    a, v, "update_postimage", "all"))
        added = {a.log_key for a in adds}
        for k in removed_keys - added:
            old = prev_by_key.get(k)
            if old is not None:
                parts.append(self._change_part(old, v, pre, "live", old))
        return parts

    def commit(self, end: dict) -> None:
        pass

    # -- executor side: one file per partition, Arrow batches out --

    def read(self, partition: _AddedFile) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        full = to_arrow_schema(self._schema)
        # in CDC mode the declared schema's last two fields are the
        # synthesized _change_type/_commit_version, not file columns
        target = (pa.schema(list(full)[:-2]) if self._cdc else full)
        tbl = pq.read_table(partition.path)
        if self._phys_to_logical:
            tbl = tbl.rename_columns([
                self._phys_to_logical.get(c, c) for c in tbl.column_names])
        if self._cdc and partition.mode != "all":
            keep = self._keep_positions(partition, tbl.num_rows)
            tbl = tbl.take(pa.array(keep, type=pa.int64()))
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
        if self._cdc:
            tbl = tbl.append_column(
                "_change_type",
                pa.array([partition.change_type] * n, type=pa.string()))
            tbl = tbl.append_column(
                "_commit_version",
                pa.array([partition.commit_version] * n, type=pa.int32()))
        yield from tbl.to_batches()

    @staticmethod
    def _keep_positions(partition: _ChangeFile, num_rows: int) -> list[int]:
        """Row indexes this change partition contributes, from the DV
        sidecars (parquet of (root, path, row_index) union masks,
        filtered to this file's identity).  Sidecar size ∝ masked rows
        of the commit's touched files — never the table."""
        import pyarrow.parquet as pq

        def mask(dv_path: str) -> set[int]:
            if not dv_path:
                return set()
            # (root, path) pushed into the parquet read: sidecars are
            # written sorted by file identity, so row-group stats
            # prune everything but this file's positions — the decode
            # reads O(this file's mask), not O(the commit's mask),
            # per touched file
            t = pq.read_table(
                dv_path, columns=["row_index"],
                filters=[("root", "=", partition.root),
                         ("path", "=", partition.relpath)])
            return set(t["row_index"].to_pylist())

        old = mask(partition.old_dv)
        if partition.mode == "newly_masked":
            return sorted(mask(partition.new_dv) - old)
        return sorted(set(range(num_rows)) - old)  # mode == "live"


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

    def _cdc(self) -> bool:
        return str(self.options.get("readChangeFeed", "")).lower() in (
            "true", "1")

    def _max_versions(self) -> int | None:
        raw = self.options.get("maxVersionsPerBatch")
        if raw is None:
            return None
        cap = int(raw)
        if cap < 1:
            raise ValueError(
                f"maxVersionsPerBatch must be >= 1, got {raw!r}")
        return cap

    def schema(self) -> StructType:
        import json

        from pyspark.sql.types import IntegerType, StringType

        self._max_versions()  # validate at load() time, not first batch
        snap = tablelog.load_snapshot(self._uri())
        schema = StructType.fromJson(json.loads(snap.schema_json))
        if self._cdc():
            schema = schema.add("_change_type", StringType(), False).add(
                "_commit_version", IntegerType(), False)
        return schema

    def streamReader(self, schema: StructType) -> DeltaSparkTableStreamReader:
        from ..table import _column_mapping

        snap = tablelog.load_snapshot(self._uri())
        return DeltaSparkTableStreamReader(
            schema, self._uri(),
            int(self.options.get("startingVersion", "0")),
            cdc=self._cdc(),
            column_mapping=_column_mapping(snap.metadata.configuration),
            max_versions_per_batch=self._max_versions(),
            pinned_version=snap.version,
            pinned_schema_json=snap.schema_json,
        )
