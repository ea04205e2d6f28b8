"""CSV / JSON(L) sources with explicit schemas.

The reference only reads Delta; a practical pipeline also ingests raw
delimited/JSON drops.  Always pass an explicit schema at scale —
schema inference runs an extra full scan of the input.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: Union[StructType, str],
    *,
    header: bool = True,
    delimiter: str = ",",
    timestamp_format: Optional[str] = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", mode)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def scan_json(
    spark: SparkSession,
    path: str,
    schema: Union[StructType, str],
    *,
    multiline: bool = False,
    mode: str = "FAILFAST",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("multiLine", str(multiline).lower())
        .option("mode", mode)
        .json(path)
    )
