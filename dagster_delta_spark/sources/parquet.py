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
    """S4: per-manager parquet decode options -> session confs.

    ``coerce_int96_timestamp_unit`` in the reference
    (dd/dagster_delta/io_manager.py:187-190) selects the pyarrow DECODE
    RESOLUTION (ns/us/ms) for INT96 timestamps.  Spark has no
    per-resolution decode conf — it always decodes INT96 to
    microsecond TIMESTAMP; the only case needing action is ``ns``,
    which maps to the same nanos-as-long escape hatch used for
    TIMESTAMP(NANOS) columns (``load_events``,
    operators/relational.py:36).  Other units are refused rather than
    silently mis-set (the previous mapping wrote a unit string into
    ``int96RebaseModeInRead``, a calendar-rebase conf whose domain is
    LEGACY/CORRECTED/EXCEPTION — an invalid session conf)."""
    if not options:
        return
    for k, v in options.items():
        if k == "compression":
            spark.conf.set("spark.sql.parquet.compression.codec", v)
        elif k == "coerce_int96_timestamp_unit":
            if v == "ns":
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            elif v != "us":  # us is Spark's native resolution: no-op
                raise ValueError(
                    f"coerce_int96_timestamp_unit={v!r} has no Spark "
                    "equivalent (native decode is us; ns maps to "
                    "nanosAsLong)"
                )
