"""Scalar helpers (reference §2.8 F1-F6) as Spark Column functions.

The reference's scalar surface is date formatting, epoch conversion,
tz-stripping and literal quoting (dd/dagster_delta/handler.py:47-67,
422-470; io_manager.py:30-31).  On Spark these are built-ins; the
wrappers pin the exact reference formats.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark datetime pattern equivalents of the reference strftime formats
SPARK_DATETIME_FORMAT = "yyyy-MM-dd HH:mm:ss"  # %Y-%m-%d %H:%M:%S
SPARK_DATE_FORMAT = "yyyy-MM-dd"  # %Y-%m-%d


def format_datetime(col: Column) -> Column:
    """F1: render a timestamp with the reference DELTA_DATETIME_FORMAT."""
    return F.date_format(col, SPARK_DATETIME_FORMAT)


def format_date(col: Column) -> Column:
    """F1: render a date with the reference DELTA_DATE_FORMAT."""
    return F.date_format(col, SPARK_DATE_FORMAT)


def parse_partition_value(col: Column, fmt: str) -> Column:
    """F1 inverse: strptime with a partition definition's custom fmt
    (converted from strftime to Spark patterns for the common cases)."""
    spark_fmt = (
        fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
        .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
    )
    return F.to_timestamp(col, spark_fmt)


def to_epoch_micros(col: Column) -> Column:
    """F2: datetime -> µs epoch (reference handler.py:61-64)."""
    return F.unix_micros(col)


def strip_tz_to_utc(col: Column, tz: str) -> Column:
    """F3: interpret a local timestamp as UTC wall-clock (the engine
    runs sessions with spark.sql.session.timeZone=UTC; this converts
    data that arrived with a zone)."""
    return F.to_utc_timestamp(col, tz)
