from .predicates import (
    DELTA_DATE_FORMAT,
    DELTA_DATETIME_FORMAT,
    DnfFilter,
    dnf_to_column,
    dnf_to_sql,
    extract_date_format_from_partition_definition,
    get_select_statement,
    partition_dimensions_to_dnf,
)
from .slices import (
    TablePartitionDimension,
    TableSlice,
    TimeWindow,
    resolve_schema_and_table,
    resolve_table_uri,
)

__all__ = [
    "DELTA_DATE_FORMAT",
    "DELTA_DATETIME_FORMAT",
    "DnfFilter",
    "dnf_to_column",
    "dnf_to_sql",
    "extract_date_format_from_partition_definition",
    "get_select_statement",
    "partition_dimensions_to_dnf",
    "resolve_schema_and_table",
    "resolve_table_uri",
    "TablePartitionDimension",
    "TableSlice",
    "TimeWindow",
]
