from .events import (  # noqa: F401
    dedup_stream,
    hourly_rollup_stream,
    read_events_stream,
    read_table_stream,
    run_dedup_stream_once,
    run_hourly_rollup_once,
    run_sessionize_once,
    sessionize_stream,
    stream_into_table,
    stream_upsert_into_table,
)
from .ingest_dedup import (  # noqa: F401
    stream_ingest_near_dup_filter,
)
from .table_sink import (  # noqa: F401
    auto_ingest_once,
    cdc_replicating_sink,
    exactly_once_table_sink,
    index_maintaining_sink,
    rollup_maintaining_sink,
)
from .table_source import (  # noqa: F401
    DeltaSparkTableDataSource,
    DeltaSparkTableStreamReader,
)
