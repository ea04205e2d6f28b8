"""Optional Dagster binding.

The engine core never imports Dagster (everything is testable
standalone via :class:`~dagster_delta_spark.io_manager.AssetContext`);
this module provides the thin translation layer when Dagster is
present — mirroring how the reference's I/O manager plugs into
Dagster's ``handle_output``/``load_input`` protocol
(dd/dagster_delta/io_manager.py:100-210, dbiomanager_fixed.py:23-126).
"""

from __future__ import annotations

from typing import Any, Optional

from .io_manager import AssetContext, DeltaSparkIOManager
from .plans.slices import TablePartitionDimension, TimeWindow

try:  # pragma: no cover - exercised only with dagster installed
    import dagster  # noqa: F401

    HAS_DAGSTER = True
except ImportError:
    HAS_DAGSTER = False


def _dimensions_from_dagster(context: Any) -> Optional[list[TablePartitionDimension]]:
    """Translate Dagster partition info into the engine's dimensions
    (the engine-agnostic logic of dd/dagster_delta/
    dbiomanager_fixed.py:50-110)."""
    if not getattr(context, "has_asset_partitions", False):
        return None
    md = dict(getattr(context, "definition_metadata", None) or {})
    expr = md.get("partition_expr")
    if expr is None:
        raise ValueError(
            "partitioned asset requires 'partition_expr' metadata"
        )  # reference handler.py:554-597 raise
    dims: list[TablePartitionDimension] = []
    if isinstance(expr, dict):
        keys_by_dim: dict[str, list[str]] = {}
        for pk in context.asset_partition_keys:
            for dim_name, key in getattr(pk, "keys_by_dimension", {}).items():
                keys_by_dim.setdefault(dim_name, []).append(key)
        missing = [d for d in keys_by_dim if d not in expr]
        if missing:
            # reference dbiomanager_fixed.py:78-86 raises here: silently
            # dropping a dimension under-constrains the write scope and
            # a scoped overwrite would delete the other dimension's rows
            raise ValueError(
                f"partition_expr is missing dimension(s) {sorted(missing)}; "
                f"has {sorted(expr)}"
            )
        for dim_name, col in expr.items():
            keys = keys_by_dim.get(dim_name, [])
            # NB multi-partition time-window dimensions arrive as raw
            # key STRINGS; they compile only against string/int
            # partition columns (via the recorded fmt).  A
            # timestamp/date-typed column would need TimeWindow
            # conversion (time_window_for_partition_key), which Dagster
            # only exposes per-dimension-definition — documented
            # limitation, surfaced by the compiler's clear 'no time
            # windows' error rather than silently mis-scoping.
            dims.append(TablePartitionDimension(col, keys))
    else:
        try:
            tw = context.asset_partitions_time_window
            dims.append(TablePartitionDimension(expr, TimeWindow(tw.start, tw.end)))
        except Exception:
            dims.append(
                TablePartitionDimension(expr, list(context.asset_partition_keys))
            )
    return dims


def extract_date_formats(context: Any) -> Optional[dict[str, str]]:
    """P6 (reference handler.py:554-597): dig the strftime ``fmt`` out
    of the asset's (possibly nested) partition definition, keyed by the
    partition column it applies to.

    Duck-typed so it works with real Dagster objects and with plain
    test doubles alike:

    - a definition exposing ``.fmt`` is treated as a
      TimeWindowPartitionsDefinition -> ``{partition_expr: fmt}``;
    - a definition exposing ``.partitions_defs`` (entries with
      ``.name`` + ``.partitions_def``) is treated as a
      MultiPartitionsDefinition; every time-window dimension
      contributes ``{partition_expr[dim.name]: dim.fmt}``;
    - a partitioned asset with no ``partition_expr`` metadata raises
      (reference handler.py:560-579);
    - no time-window definition -> None.
    """
    if not getattr(context, "has_asset_partitions", False):
        return None
    md = dict(getattr(context, "definition_metadata", None) or {})
    expr = md.get("partition_expr")
    if expr is None:
        raise ValueError(
            "'partition_expr' should have been set in the metadata of the "
            "incoming asset since it has a partition definition."
        )
    pdef = getattr(context, "asset_partitions_def", None)
    if pdef is None:
        return None
    out: dict[str, str] = {}
    if hasattr(pdef, "fmt"):
        if not isinstance(expr, str):
            raise ValueError(
                "partition_expr must be a single column name (string) for "
                f"a time-window partitions definition; got {type(expr).__name__}"
            )
        out[expr] = pdef.fmt
    elif hasattr(pdef, "partitions_defs"):
        if not isinstance(expr, dict):
            raise ValueError(
                "partition_expr must map dimension names to columns (dict) "
                f"for a multi-partitions definition; got {type(expr).__name__}"
            )
        for dim in pdef.partitions_defs:
            inner = getattr(dim, "partitions_def", None)
            if inner is not None and hasattr(inner, "fmt"):
                if dim.name not in expr:
                    raise ValueError(
                        f"partition_expr is missing dimension {dim.name!r}; "
                        f"has {sorted(expr)}"
                    )
                out[expr[dim.name]] = inner.fmt
    return out or None


def to_asset_context(context: Any, *, is_input: bool = False) -> AssetContext:
    """Map a Dagster Output/InputContext onto the engine's context."""
    asset_key = list(context.asset_key.path)
    md = dict(getattr(context, "definition_metadata", None) or {})
    columns = md.get("columns") if is_input else None
    return AssetContext(
        asset_key=asset_key,
        partition_dimensions=_dimensions_from_dagster(context),
        metadata=md,
        columns=columns,
        date_formats=extract_date_formats(context),
    )


if HAS_DAGSTER:  # pragma: no cover

    from dagster import ConfigurableIOManagerFactory, InputContext, OutputContext

    class DagsterDeltaSparkIOManager(ConfigurableIOManagerFactory):
        """Dagster-facing factory around DeltaSparkIOManager."""

        root_uri: str
        schema_: Optional[str] = None
        mode: str = "overwrite"

        def create_io_manager(self, context) -> Any:
            from dagster import IOManager

            outer = self

            class _Manager(IOManager):
                def __init__(self) -> None:
                    from pyspark.sql import SparkSession

                    from .config import WriteMode

                    self.mgr = DeltaSparkIOManager(
                        SparkSession.builder.getOrCreate(),
                        outer.root_uri,
                        schema=outer.schema_,
                        # forward the declared config — a silently
                        # ignored mode="append" meant every
                        # materialization overwrote the table
                        mode=WriteMode(outer.mode),
                    )

                def handle_output(self, context: OutputContext, obj: Any) -> None:
                    md = self.mgr.handle_output(to_asset_context(context), obj)
                    context.add_output_metadata(md)

                def load_input(self, context: InputContext) -> Any:
                    # merge the INPUT context's own metadata (columns,
                    # partition mapping) over the upstream output's:
                    # reading everything off upstream_output dropped
                    # AssetIn(metadata={"columns": ...}) projections
                    # (reference dbiomanager_fixed.py:50,125)
                    ctx = to_asset_context(
                        context.upstream_output, is_input=True)
                    in_md = dict(
                        getattr(context, "definition_metadata", None) or {})
                    if in_md.get("columns"):
                        ctx = AssetContext(
                            asset_key=ctx.asset_key,
                            partition_dimensions=ctx.partition_dimensions,
                            metadata=ctx.metadata,
                            columns=in_md["columns"],
                            date_formats=ctx.date_formats,
                        )
                    # dispatch on the downstream annotation so pandas/
                    # arrow/polars-typed assets get their native frame
                    # (reference handler.py:311-317)
                    target = getattr(
                        getattr(context, "dagster_type", None),
                        "typing_type", None)
                    if target is not None and target is not Any:
                        return self.mgr.load_input(ctx, target_type=target)
                    return self.mgr.load_input(ctx)

            return _Manager()
