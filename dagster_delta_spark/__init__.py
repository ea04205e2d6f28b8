"""dagster_delta_spark — a PySpark-native engine with the query and
data-processing capabilities of ASML-Labs/dagster-delta.

The reference binds Dagster to Delta Lake via delta-rs; this package
re-expresses that entire surface Spark-first: a transactional
parquet+log table format (``table.py``/``tablelog.py``), the partition
predicate mini-compiler (``plans/``), write modes and MERGE strategies,
an I/O-manager/type-handler layer (``io_manager.py``/``handler.py``),
and the large-scale data-pipeline operators (``operators/``).
"""

from .config import (
    ClientConfig,
    GcsConfig,
    AzureConfig,
    LocalConfig,
    MergeConfig,
    MergeType,
    S3Config,
    SchemaMode,
    TableConnection,
    WriteMode,
    flatten_storage_confs,
)
from .plans.slices import TablePartitionDimension, TableSlice, TimeWindow
from .table import (
    DeltaSparkTable,
    convert_from_delta,
    read_delta_changes,
    convert_to_table,
    export_delta_log,
    MergeMultipleMatchesError,
    ConstraintViolationError,
    SchemaMismatchError,
    TableExistsError,
)
from .tablelog import TableNotFoundError, VersionConflictError

__all__ = [
    "AzureConfig",
    "ClientConfig",
    "DeltaSparkTable",
    "convert_from_delta",
    "read_delta_changes",
    "convert_to_table",
    "export_delta_log",
    "GcsConfig",
    "LocalConfig",
    "MergeConfig",
    "MergeMultipleMatchesError",
    "MergeType",
    "S3Config",
    "ConstraintViolationError",
    "SchemaMismatchError",
    "SchemaMode",
    "TableConnection",
    "TableExistsError",
    "TableNotFoundError",
    "TablePartitionDimension",
    "TableSlice",
    "TimeWindow",
    "VersionConflictError",
    "WriteMode",
    "flatten_storage_confs",
]

__version__ = "0.1.0"
