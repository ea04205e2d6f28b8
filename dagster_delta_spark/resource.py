"""Direct table resource (reference S3: dd/dagster_delta/
resource.py:48-77): open a table handle with storage options and an
optional pinned version, outside the I/O-manager path.

Contract (dd tests test_delta_table_resource.py:39-71): a resource
loaded with ``version=0`` returns pre-append contents — time travel.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import SparkSession

from .config import ClientConfig, flatten_storage_confs
from .table import DeltaSparkTable


@dataclass
class DeltaTableResource:
    url: str
    storage_config: Optional[object] = None
    client_config: Optional[ClientConfig] = None
    version: Optional[int] = None

    def load(self, spark: SparkSession) -> "PinnedTable":
        for k, v in flatten_storage_confs(
            self.storage_config, self.client_config
        ).items():
            spark.conf.set(k, v)
        return PinnedTable(DeltaSparkTable(spark, self.url), self.version)


@dataclass
class PinnedTable:
    """A DeltaSparkTable pinned to a version (None = latest)."""

    table: DeltaSparkTable
    pinned_version: Optional[int] = None

    def to_df(self):
        return self.table.read(version=self.pinned_version)

    def version(self) -> int:
        if self.pinned_version is not None:
            return self.pinned_version
        return self.table.version()

    def history(self, limit: Optional[int] = None):
        return self.table.history(limit)
