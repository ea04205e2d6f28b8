"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY §2.9) — this is the
engine's additive capability: the same hourly rollup as
``operators.relational.events_hourly_rollup`` expressed as an
incremental streaming query with watermarked late-data handling, plus
a stateful sessionizer.  Batch and streaming share the aggregation
logic, so correctness is anchored by the batch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1,
    glob: str = "events.parquet",
) -> DataFrame:
    """File-source stream over the events parquet (each micro-batch
    consumes up to N files; at scale this is the auto-ingest pattern)."""
    # pin UTC like relational.load_events: under a non-UTC session the
    # timestamp_ntz -> timestamp cast below would wall-clock-shift
    # every event relative to the batch twins and the oracle engine
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
    # the streaming file source wants a directory; glob-filter to the
    # events file(s) inside the fixture dir
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # TIMESTAMP(NANOS) parquet read as long -> µs timestamp
        df = df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    elif ts_type == "timestamp_ntz":
        # TIMESTAMP(MICROS) isAdjustedToUTC=false -> LTZ under UTC session
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation: late events beyond the
    watermark are dropped; state is bounded by watermark * keys."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal accumulation, matching the batch twin (summation
            # order must not move the result past the oracle rounding)
            F.expr("CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_hourly_rollup_once(
    spark: SparkSession, sf_dir: str, table_name: str = "events_rollup"
) -> DataFrame:
    """Execute the streaming rollup to completion against the static
    fixture (availableNow semantics via processAllAvailable) and
    return the materialized result from the memory sink."""
    stream = hourly_rollup_stream(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(table_name)


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessionization with the built-in ``session_window``
    (works identically in batch and streaming; state bounded by the
    watermark).  The batch twin is
    ``operators.relational.events_sessionize`` (gaps-and-islands)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal accumulation, matching the batch twin (summation
            # order must not move the result past the oracle rounding)
            F.expr("CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_sessionize_once(
    spark: SparkSession, sf_dir: str, table_name: str = "events_sessions"
) -> DataFrame:
    stream = sessionize_stream(read_events_stream(spark, sf_dir, 8))
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(table_name)


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on the event key with watermark-bounded
    state (``dropDuplicatesWithinWatermark``): re-delivered events
    inside the watermark are dropped, state is evicted past it — the
    scale-safe streaming twin of ``operators.dedup.dedup_exact``
    (unbounded ``dropDuplicates`` state would grow forever at 100 TB).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_dedup_stream_once(
    spark: SparkSession, src_dir: str, table_name: str = "events_dedup"
) -> DataFrame:
    stream = dedup_stream(read_events_stream(spark, src_dir, 8))
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(table_name)


def last_streaming_batch(table: "DeltaSparkTable") -> int:
    """Newest ``streaming_batch_id`` recorded in a table's commit
    metadata, -1 if none — the idempotent-restart watermark shared by
    every foreachBatch sink here and in ``ingest_dedup``.  history()
    is newest-first and every streaming commit carries the key, so the
    scan normally stops at the head commit."""
    if not table.exists():
        return -1
    for h in table.history():
        md = h.get("userMetadata") or {}
        if "streaming_batch_id" in md:
            return int(md["streaming_batch_id"])
    return -1


def stream_into_table(
    spark: SparkSession,
    sf_dir: str,
    table_uri: str,
    max_files_per_trigger: int = 8,
) -> "DeltaSparkTable":
    """Streaming sink into the engine's transactional table via
    foreachBatch: each micro-batch lands as one atomic append commit,
    exactly-once per ``(app_id, batch_id)`` under the table's ``txn``
    ledger (``idempotent_append`` — the Delta SetTransaction protocol;
    a replayed batch sees its id already recorded in the snapshot and
    no-ops, with the check inside the commit retry loop so racing
    workers cannot double-append)."""
    from ..table import DeltaSparkTable

    table = DeltaSparkTable(spark, table_uri)
    from .table_sink import exactly_once_table_sink

    q = (
        read_events_stream(spark, sf_dir, max_files_per_trigger)
        .writeStream.foreachBatch(
            exactly_once_table_sink(table_uri, "events_ingest"))
        .option("checkpointLocation", table_uri + "/_stream_checkpoint")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return table


def read_table_stream(spark: SparkSession, table_uri: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """Stream FROM a DeltaSparkTable (append-only tables): the
    file-source picks up each newly committed data file as a
    micro-batch — the Delta streaming-source pattern for auto-ingest
    pipelines.  Overwrites/merges remove files from the *log* but not
    from disk, so only append-only tables stream correctly; enforce
    that upstream.
    """
    from ..table import DeltaSparkTable

    t = DeltaSparkTable(spark, table_uri)
    schema = t.schema()
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "false")
        .parquet(table_uri)
    )


def stream_upsert_into_table(
    spark: SparkSession,
    sf_dir: str,
    table_uri: str,
    max_files_per_trigger: int = 8,
) -> "DeltaSparkTable":
    """CDC-style streaming sink: each micro-batch MERGEs on the event
    key (deduplicate_insert), so re-delivered batches are no-ops by
    *data* semantics — exactly-once without relying on checkpoint
    bookkeeping at all.  Use when the source can replay arbitrary
    overlaps (at-least-once upstreams)."""
    from ..config import MergeConfig, MergeType
    from ..table import DeltaSparkTable

    table = DeltaSparkTable(spark, table_uri)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.merge(
            batch_df.dropDuplicates(["event_id"]),
            MergeConfig(MergeType.deduplicate_insert,
                        predicate="s.event_id = t.event_id"),
        )

    q = (
        read_events_stream(spark, sf_dir, max_files_per_trigger)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", table_uri + "/_stream_checkpoint")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return table


def interval_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    upper: str = "4 hours",
    watermark: str = "8 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: every click matched
    with the same user's purchases inside ``[click_ts, click_ts +
    upper]`` — the streaming twin of ``operators.asof.
    range_join_pairs``.  Both sides carry watermarks and the join
    condition time-bounds BOTH event times, so Spark can evict join
    state for rows older than ``watermark + upper`` instead of
    buffering each side forever (the only state shape that survives an
    unbounded stream).  Inner join: a match emits as soon as both rows
    have arrived; rows later than the watermark lose matches — that is
    the documented streaming contract, and the multi-batch unit test
    pins both halves of it.

    Input frames must expose ``(click_id, user_id, click_ts,
    click_value)`` / ``(purchase_id, user_id, purchase_ts,
    purchase_value)``; see ``run_interval_join_once`` for the standard
    wiring from the events source."""
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            "c_user_id = p_user_id"
            " AND purchase_ts >= click_ts"
            f" AND purchase_ts <= click_ts + INTERVAL {upper}"
        ),
        "inner",
    ).select(
        "click_id",
        F.col("c_user_id").alias("user_id"),
        "click_ts",
        "click_value",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def run_interval_join_once(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "clicks_purchases_joined",
    upper: str = "4 hours",
    watermark: str = "8 hours",
    max_files_per_trigger: int = 8,
    glob: str = "events.parquet",
) -> DataFrame:
    """Execute the streaming interval join to completion against the
    static fixture and return the memory-sink result.  The two sides
    are independent streaming reads of the same source (Spark requires
    distinct source plans for a stream-stream self-join)."""
    clicks = (
        read_events_stream(spark, sf_dir, max_files_per_trigger, glob)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
    )
    purchases = (
        read_events_stream(spark, sf_dir, max_files_per_trigger, glob)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    q = (
        interval_join_stream(clicks, purchases, upper, watermark)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(table_name)


def sliding_rollup_stream(
    events: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING-window aggregation (the third windowed
    shape next to the tumbling ``hourly_rollup_stream`` and the
    ``session_window`` sessionizer): each event lands in
    width/slide overlapping windows, state is bounded by
    watermark x keys x overlap.  Decimal accumulation matches the
    batch/oracle twins so hash parity survives summation order."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"),
                 F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_sliding_rollup_once(
    spark: SparkSession, sf_dir: str, table_name: str = "events_sliding"
) -> DataFrame:
    stream = sliding_rollup_stream(read_events_stream(spark, sf_dir, 8))
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(table_name)


def interval_join_left_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    upper: str = "4 hours",
    watermark: str = "8 hours",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join: every click
    emits — matched rows as soon as both sides arrive, UNMATCHED rows
    (null purchase columns) only once the watermark has closed the
    click's match window, because until then a matching purchase could
    still arrive.  This is the fundamentally harder outer-join state
    contract (eviction-driven null emission) the inner variant never
    exercises; the state bound is the same ``watermark + upper``."""
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            "c_user_id = p_user_id"
            " AND purchase_ts >= click_ts"
            f" AND purchase_ts <= click_ts + INTERVAL {upper}"
        ),
        "leftOuter",
    ).select(
        "click_id",
        F.col("c_user_id").alias("user_id"),
        "click_ts",
        "click_value",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def interval_join_full_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    upper: str = "4 hours",
    watermark: str = "8 hours",
) -> DataFrame:
    """Watermarked stream-stream FULL OUTER interval join: matched
    rows emit on arrival; unmatched CLICKS and unmatched PURCHASES
    both emit with the other side null once the watermark closes
    their window — two independent eviction contracts in one query
    (``user_id`` coalesces across the sides, since either may be
    null)."""
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            "c_user_id = p_user_id"
            " AND purchase_ts >= click_ts"
            f" AND purchase_ts <= click_ts + INTERVAL {upper}"
        ),
        "fullOuter",
    ).select(
        "click_id",
        F.coalesce("c_user_id", "p_user_id").alias("user_id"),
        "click_ts",
        "click_value",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def _stage_events_with_sentinels(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events fixture for COMPLETE outer-join streaming
    runs: a temp dir of three files consumed as three ordered
    micro-batches —

      1. the full real fixture (normalized ts — one batch, so no real
         row is ever late relative to the watermark);
      2. a sentinel pair (click + purchase, ``user_id = -1``) 30 days
         past max real ts — processing it ADVANCES the watermark past
         every real row's match window;
      3. a second, later sentinel pair — a real batch that RUNS UNDER
         the advanced watermark, evicting all unmatched state and
         emitting the null rows (no-data batches are not guaranteed
         to have run before ``processAllAvailable`` returns).

    The watermark that drives eviction is computed at each batch's END
    and applied in the NEXT batch, which is why a plain one-batch run
    can never emit outer-join nulls.  Callers filter sentinels out by
    negative user_id."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.relational import load_events

    ev = load_events(spark, sf_dir)
    stage = _tempfile.mkdtemp(prefix="dds-sjstage-")
    ev.coalesce(1).write.parquet(f"{stage}/real")
    real = next(f for f in _os.listdir(f"{stage}/real")
                if f.endswith(".parquet"))
    _os.rename(f"{stage}/real/{real}", f"{stage}/a_real.parquet")

    max_ts = ev.agg(F.max("ts").alias("m")).first()["m"]
    for i, days in enumerate((30, 60)):
        sent = spark.createDataFrame(
            [(-1 - 2 * i, "click"), (-2 - 2 * i, "purchase")],
            "event_id long, event_type string",
        ).select(
            "event_id",
            (F.lit(max_ts) + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            "event_type",
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        ).select(ev.columns)  # exact column order of the real file
        sent.coalesce(1).write.parquet(f"{stage}/s{i}")
        sf = next(f for f in _os.listdir(f"{stage}/s{i}")
                  if f.endswith(".parquet"))
        _os.rename(f"{stage}/s{i}/{sf}", f"{stage}/b_sent{i}.parquet")
        _shutil.rmtree(f"{stage}/s{i}")
    _shutil.rmtree(f"{stage}/real")
    # file-source order is modification time: real, sentinel1, sentinel2
    now = _os.path.getmtime(f"{stage}/a_real.parquet")
    _os.utime(f"{stage}/b_sent0.parquet", (now + 10, now + 10))
    _os.utime(f"{stage}/b_sent1.parquet", (now + 20, now + 20))
    return stage


def _run_outer_interval_join(
    spark: SparkSession,
    sf_dir: str,
    table_name: str,
    join_fn,
    upper: str,
    watermark: str,
) -> DataFrame:
    import shutil as _shutil

    stage = _stage_events_with_sentinels(spark, sf_dir)

    def side(name_id, name_user, name_ts, name_val, etype):
        return (
            read_events_stream(spark, stage, 1, "*.parquet")
            .where(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(name_id),
                F.col("user_id").alias(name_user),
                F.col("ts").alias(name_ts),
                F.col("value").alias(name_val),
            )
        )

    clicks = side("click_id", "c_user_id", "click_ts", "click_value",
                  "click")
    purchases = side("purchase_id", "p_user_id", "purchase_ts",
                     "purchase_value", "purchase")
    q = (
        join_fn(clicks, purchases, upper, watermark)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    _shutil.rmtree(stage, ignore_errors=True)
    return spark.table(table_name).where(F.col("user_id") >= 0)


def run_interval_join_left_once(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "clicks_purchases_left",
    upper: str = "4 hours",
    watermark: str = "8 hours",
) -> DataFrame:
    """Execute the streaming LEFT OUTER interval join to a COMPLETE
    result against the static fixture (sentinel-staged; see
    ``_stage_events_with_sentinels``) — equals the batch/DuckDB
    left-outer twin exactly, which is what makes the registry entry
    ORACLE-BACKED."""
    return _run_outer_interval_join(
        spark, sf_dir, table_name, interval_join_left_stream,
        upper, watermark)


def run_interval_join_full_once(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "clicks_purchases_full",
    upper: str = "4 hours",
    watermark: str = "8 hours",
) -> DataFrame:
    """Execute the streaming FULL OUTER interval join to a COMPLETE
    result — both sides' unmatched rows emit at sentinel-driven
    eviction, so the append output equals the batch full-outer twin
    exactly."""
    return _run_outer_interval_join(
        spark, sf_dir, table_name, interval_join_full_stream,
        upper, watermark)
