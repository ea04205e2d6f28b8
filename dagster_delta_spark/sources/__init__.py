from .delimited import scan_csv, scan_json  # noqa: F401
from .jsonl import read_jsonl, write_jsonl  # noqa: F401
from .parquet import apply_parquet_read_options, scan  # noqa: F401
