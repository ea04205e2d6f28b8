"""Parquet scan helpers (reference S1/S2/S4).

``scan`` applies projection + predicate immediately after the read so
Catalyst pushes both into the file source (check ``.explain`` for
``PushedFilters`` / ``ReadSchema``).  ``parquet_read_options`` maps
the reference's pyarrow decode tweaks (dd/dagster_delta/
io_manager.py:187-190, e.g. coerce_int96_timestamp_unit) to Spark
session confs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession


def scan(
    spark: SparkSession,
    path: str,
    columns: Optional[Sequence[str]] = None,
    predicate: Optional[Column] = None,
) -> DataFrame:
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.where(predicate)
    if columns:
        df = df.select(*columns)
    return df


def apply_parquet_read_options(
    spark: SparkSession, options: Optional[dict[str, str]] = None
) -> None:
    """S4: per-manager parquet decode options -> session confs."""
    if not options:
        return
    mapping = {
        # reference: ds.ParquetReadOptions(coerce_int96_timestamp_unit=...)
        "coerce_int96_timestamp_unit": "spark.sql.parquet.int96RebaseModeInRead",
        "compression": "spark.sql.parquet.compression.codec",
    }
    for k, v in options.items():
        conf = mapping.get(k)
        if conf:
            spark.conf.set(conf, v)
