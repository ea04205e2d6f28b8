"""Spark-native Delta I/O manager.

Re-expresses the reference write/read lifecycle (SURVEY §3;
dd/dagster_delta/io_manager.py:100-313, handler.py:139-317,
dbiomanager_fixed.py:23-126) without requiring Dagster at import
time: the context objects are plain dataclasses carrying exactly the
fields the reference pulls off Dagster's contexts, so the manager
plugs into Dagster trivially but stays testable standalone.

Lifecycle (write): resolve TableSlice -> TableConnection -> handler
``to_spark`` -> partition dims -> DNF -> dispatch write/merge ->
stats + output metadata.  All data movement is distributed Spark; the
manager itself is driver-side metadata logic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Type

from pyspark.sql import DataFrame, SparkSession

from .config import (
    ClientConfig,
    MergeConfig,
    MergeType,
    SchemaMode,
    TableConnection,
    WriteMode,
    flatten_storage_confs,
)
from .handler import HandlerRegistry, SparkTypeHandler
from .plans.predicates import (
    extract_date_format_from_partition_definition,
    partition_dimensions_to_dnf,
)
from .plans.slices import (
    TablePartitionDimension,
    TableSlice,
    resolve_schema_and_table,
    resolve_table_uri,
)
from .table import DeltaSparkTable


@dataclass
class AssetContext:
    """The slice of Dagster's Output/InputContext the reference
    actually uses (dbiomanager_fixed.py:23-126): asset key, partition
    dimensions, and per-asset metadata overrides."""

    asset_key: Sequence[str]
    partition_dimensions: Optional[list[TablePartitionDimension]] = None
    metadata: dict[str, Any] = field(default_factory=dict)
    # input-only: column projection (reference dbiomanager_fixed.py:125)
    columns: Optional[list[str]] = None
    # {partition_col: strftime fmt} for string/int partition columns (P6)
    date_formats: Optional[dict[str, str]] = None


class DeltaSparkIOManager:
    """Reference: ``DeltaLakeIOManager`` (dd/dagster_delta/
    io_manager.py:100-210) + ``DeltalakeBaseArrowTypeHandler
    .handle_output/load_input`` (handler.py:139-317)."""

    def __init__(
        self,
        spark: SparkSession,
        root_uri: str,
        *,
        schema: Optional[str] = None,
        mode: WriteMode = WriteMode.overwrite,  # reference default io_manager.py:140-143
        schema_mode: Optional[SchemaMode] = None,
        merge_config: Optional[MergeConfig] = None,
        storage_config: Optional[object] = None,
        client_config: Optional[ClientConfig] = None,
        table_config: Optional[dict[str, str]] = None,
        custom_metadata: Optional[dict[str, str]] = None,
        writer_properties: Optional[dict[str, str]] = None,
        handlers: Optional[Sequence[SparkTypeHandler]] = None,
        legacy_window_scope: bool = False,
    ):
        self.spark = spark
        self.root_uri = root_uri
        # opt-in reference-compat: time-window overwrite scope compiles
        # to the reference's single '=' start pin (handler.py:478-479)
        # instead of the half-open [start, end) range
        self.legacy_window_scope = legacy_window_scope
        self.schema_config = schema
        self.mode = mode
        self.schema_mode = schema_mode
        self.merge_config = merge_config
        self.table_config = table_config
        self.custom_metadata = custom_metadata
        self.registry = HandlerRegistry(handlers)
        # storage confs: 'spark.hadoop.'-prefixed keys set at RUNTIME
        # via spark.conf.set are copied into the Hadoop Configuration
        # VERBATIM (the prefix is only stripped for SparkConf entries
        # at session start), so fs.s3a.* / fs.azure.* would never be
        # seen by the filesystem — strip the prefix and set the live
        # Hadoop configuration directly as well.  S3 keys are scoped
        # per-bucket (fs.s3a.bucket.<name>.*) when the root_uri names
        # one: the Hadoop Configuration is session-global, and two
        # managers with different credentials would otherwise clobber
        # each other (Azure keys are already account-scoped by key).
        from urllib.parse import urlparse as _urlparse

        parsed = _urlparse(root_uri)
        s3_bucket = (
            parsed.netloc
            if parsed.scheme in ("s3", "s3a", "s3n") and parsed.netloc
            else None
        )
        hadoop_conf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, v in flatten_storage_confs(storage_config, client_config).items():
            spark.conf.set(k, v)
            if k.startswith("spark.hadoop."):
                hk = k[len("spark.hadoop."):]
                if s3_bucket and hk.startswith("fs.s3a."):
                    hk = f"fs.s3a.bucket.{s3_bucket}.{hk[len('fs.s3a.'):]}"
                hadoop_conf.set(hk, v)
        # W10: writer knobs travel PER WRITE as DataFrameWriter options
        # (reference io_manager.py:183-186 scopes WriterProperties per
        # write too); session confs would leak across managers sharing
        # one SparkSession
        self.writer_properties = writer_properties

    # -- resolution -----------------------------------------------------------

    def _table_slice(self, context: AssetContext) -> TableSlice:
        md = context.metadata or {}
        schema, table = resolve_schema_and_table(
            list(context.asset_key),
            schema_metadata=md.get("schema"),
            schema_config=self.schema_config,
            root_name=md.get("root_name"),
        )
        return TableSlice(
            table=table,
            schema=schema,
            partition_dimensions=context.partition_dimensions,
            columns=context.columns,
        )

    def _connect(self, table_slice: TableSlice) -> TableConnection:
        return TableConnection(
            table_uri=resolve_table_uri(self.root_uri, table_slice),
            table_config=self.table_config,
        )

    def table_for(self, context: AssetContext) -> DeltaSparkTable:
        return DeltaSparkTable(
            self.spark, self._connect(self._table_slice(context)).table_uri
        )

    # -- write path (SURVEY §3.1) ----------------------------------------------

    def handle_output(self, context: AssetContext, obj: Any) -> dict[str, Any]:
        handler = self.registry.for_object(obj)
        df = handler.to_spark(self.spark, obj)
        md = context.metadata or {}

        ts = self._table_slice(context)
        conn = self._connect(ts)
        table = DeltaSparkTable(self.spark, conn.table_uri)

        # per-asset overrides (reference handler.py:162-182)
        mode = WriteMode(md.get("mode", self.mode))
        schema_mode = md.get("schema_mode", self.schema_mode)
        if schema_mode is not None:
            schema_mode = SchemaMode(schema_mode)
        table_configuration = dict(conn.table_config or {}) | dict(
            md.get("table_configuration") or {}
        )  # asset wins keys (reference handler.py:151-155)
        commit_metadata = md.get("custom_metadata", self.custom_metadata)

        pcols = [d.partition_expr for d in (ts.partition_dimensions or [])]
        dnf = None
        if ts.partition_dimensions:
            fmts = extract_date_format_from_partition_definition(
                context.date_formats
            )
            # write-path (input_dnf=False) validation — the contiguity
            # guard — only applies when the DNF will actually SCOPE a
            # delete (overwrite/merge); an append discards the scope,
            # so a non-contiguous multi-window backfill append is safe
            # and must not be rejected (the read-shape DNF still feeds
            # the scoped partition_stats metadata below)
            scoping = mode in (WriteMode.overwrite, WriteMode.merge)
            dnf = partition_dimensions_to_dnf(
                ts.partition_dimensions, df.schema, input_dnf=not scoping,
                date_formats=fmts,
                legacy_window_scope=self.legacy_window_scope,
            )

        if mode == WriteMode.merge:
            mc = self.merge_config or MergeConfig()
            pred = md.get("merge_predicate", mc.predicate)
            if pred is None:
                raise ValueError(
                    "merge mode requires a merge_predicate (per-asset "
                    "metadata or MergeConfig.predicate)"
                )  # reference handler.py:83-88
            mc = MergeConfig(
                merge_type=MergeType(md.get("merge_type", mc.merge_type)),
                predicate=pred,
                source_alias=mc.source_alias,
                target_alias=mc.target_alias,
                error_on_type_mismatch=mc.error_on_type_mismatch,
            )
            result = table.merge(
                df, mc,
                partition_dnf=dnf,
                partition_columns=pcols or None,
                commit_metadata=commit_metadata,
                schema_mode=schema_mode,
                table_configuration=table_configuration or None,
                writer_properties=self.writer_properties,
            )
        else:
            result = table.write(
                df, mode,
                partition_columns=pcols or None,
                partition_dnf=dnf if mode == WriteMode.overwrite else None,
                schema_mode=schema_mode,
                table_configuration=table_configuration or None,
                commit_metadata=commit_metadata,
                writer_properties=self.writer_properties,
            )

        # O3/O4: output metadata (reference handler.py:264-291), pinned
        # to THIS write's committed version — re-reading the head would
        # attribute a concurrent writer's later commit to this asset
        # (and cost extra log loads)
        version = result.get("version")
        out_md: dict[str, Any] = {
            "table_uri": conn.table_uri,
            "table_version": version if version is not None else table.version(),
            "mode": result.get("mode"),
            **{
                k: v
                for k, v in result.items()
                if k.startswith("num_")
            },
            "dagster/column_schema": {
                f.name: f.dataType.simpleString()
                for f in table.schema(version).fields
            },
            **handler.get_output_stats(obj),
        }
        try:
            out_md.update(table.partition_stats(dnf, version=version))
        except Exception as exc:  # stats failure downgraded (handler.py:264-269)
            out_md["stats_error"] = str(exc)
        return out_md

    # -- read path (SURVEY §3.2) -------------------------------------------------

    def load_input(
        self,
        context: AssetContext,
        target_type: Type = DataFrame,
        version: Optional[int] = None,
    ) -> Any:
        ts = self._table_slice(context)
        conn = self._connect(ts)
        table = DeltaSparkTable(self.spark, conn.table_uri)
        dnf = None
        if ts.partition_dimensions:
            fmts = extract_date_format_from_partition_definition(
                context.date_formats
            )
            dnf = partition_dimensions_to_dnf(
                ts.partition_dimensions, table.schema(version),
                input_dnf=True, date_formats=fmts,
            )
        if target_type is DeltaSparkTable:
            # PJ4 guard (reference handler.py:311-313): the raw handle —
            # like the reference's pyarrow Dataset — carries no column
            # projection, so requesting columns is a contract error.
            if ts.columns is not None:
                raise ValueError(
                    "Cannot select columns when loading as DeltaSparkTable."
                )
            if dnf:
                # a raw handle also carries no partition slice; refuse
                # rather than silently returning the whole table
                raise ValueError(
                    "Cannot load a partition slice as a raw DeltaSparkTable; "
                    "load a DataFrame instead."
                )
            if version is not None:
                # same refuse-rather-than-silently-return contract: the
                # raw handle always reads head, so a version pin would
                # be dropped on the floor
                raise ValueError(
                    "Cannot pin a version when loading as DeltaSparkTable; "
                    "load a DataFrame instead (or use the table resource)."
                )
            return table
        df = table.read(version=version, columns=ts.columns, dnf=dnf)
        handler = self.registry.for_type(target_type)
        return handler.from_spark(df, target_type)
