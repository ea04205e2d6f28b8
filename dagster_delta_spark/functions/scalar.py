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


_STRFTIME_TO_SPARK = {
    "Y": "yyyy", "m": "MM", "d": "dd", "H": "HH", "M": "mm", "S": "ss",
}


def parse_partition_value(col: Column, fmt: str) -> Column:
    """F1 inverse: strptime with a partition definition's custom fmt,
    converted strftime -> Spark datetime pattern.  Literal text is
    single-quoted (an unquoted 'T' in '%Y-%m-%dT%H' is an illegal
    Spark pattern letter) and unsupported directives raise instead of
    passing through to parse garbage silently."""
    out = []
    literal: list[str] = []

    def flush() -> None:
        if literal:
            chunk = "".join(literal).replace("'", "''")
            out.append(f"'{chunk}'")
            literal.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= len(fmt):
                raise ValueError(f"dangling '%' in format {fmt!r}")
            d = fmt[i + 1]
            if d == "%":
                literal.append("%")
            elif d in _STRFTIME_TO_SPARK:
                flush()
                out.append(_STRFTIME_TO_SPARK[d])
            else:
                raise ValueError(
                    f"unsupported strftime directive %{d} in {fmt!r}; "
                    f"supported: {sorted('%' + k for k in _STRFTIME_TO_SPARK)}"
                )
            i += 2
        else:
            literal.append(ch)
            i += 1
    flush()
    return F.to_timestamp(col, "".join(out))


def to_epoch_micros(col: Column) -> Column:
    """F2: datetime -> µs epoch (reference handler.py:61-64)."""
    return F.unix_micros(col)


def strip_tz_to_utc(col: Column, tz: str) -> Column:
    """F3: interpret a local timestamp as UTC wall-clock (the engine
    runs sessions with spark.sql.session.timeZone=UTC; this converts
    data that arrived with a zone)."""
    return F.to_utc_timestamp(col, tz)
