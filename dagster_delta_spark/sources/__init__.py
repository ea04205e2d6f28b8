from .parquet import apply_parquet_read_options, scan  # noqa: F401
