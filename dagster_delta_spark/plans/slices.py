"""Logical read/write units: TableSlice and partition dimensions.

Spark-native re-expression of the reference's slice model
(dd/dagster_delta/dbiomanager_fixed.py:17-126): a table restricted to
a partition sub-space and a column subset.  These are pure metadata
objects resolved on the driver; the data plane only ever sees the
predicates/projections they compile to.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Optional, Sequence, Union


@dataclass(frozen=True)
class TimeWindow:
    """Half-open time interval ``[start, end)`` (reference uses
    Dagster's TimeWindow; same shape)."""

    start: datetime
    end: datetime


PartitionValues = Union[TimeWindow, Sequence[TimeWindow], Sequence[str]]


@dataclass(frozen=True)
class TablePartitionDimension:
    """(partition_expr, partitions): a partition column plus either
    static keys or time window(s)
    (reference: dd/dagster_delta/dbiomanager_fixed.py:87-110)."""

    partition_expr: str
    partitions: PartitionValues


@dataclass(frozen=True)
class TableSlice:
    """Table restricted to a partition sub-space and column subset
    (reference: dd/dagster_delta/dbiomanager_fixed.py:120-126)."""

    table: str
    schema: str = ""
    database: Optional[str] = None
    partition_dimensions: Optional[list[TablePartitionDimension]] = None
    columns: Optional[list[str]] = None


def resolve_table_uri(root_uri: str, table_slice: TableSlice) -> str:
    """``{root_uri}/{schema}/{table}``; empty schema suppresses the
    folder level (reference: dd/dagster_delta/io_manager.py:276-280)."""
    if table_slice.schema:
        return f"{root_uri.rstrip('/')}/{table_slice.schema}/{table_slice.table}"
    return f"{root_uri.rstrip('/')}/{table_slice.table}"


def resolve_schema_and_table(
    asset_key: Sequence[str],
    schema_metadata: Optional[str] = None,
    schema_config: Optional[str] = None,
    root_name: Optional[str] = None,
) -> tuple[str, str]:
    """Schema/table resolution precedence (reference
    dd/dagster_delta/dbiomanager_fixed.py:36-48):

    table = last asset-key element (or ``root_name`` override);
    schema = output metadata > io-manager config > second-to-last
    asset-key element > ``"public"``.
    """
    table = root_name or asset_key[-1]
    if schema_metadata is not None:
        schema = schema_metadata
    elif schema_config is not None:
        schema = schema_config
    elif len(asset_key) > 1:
        schema = asset_key[-2]
    else:
        schema = "public"
    return schema, table
