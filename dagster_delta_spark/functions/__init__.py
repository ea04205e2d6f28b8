from .scalar import (  # noqa: F401
    format_date,
    format_datetime,
    parse_partition_value,
    strip_tz_to_utc,
    to_epoch_micros,
)
