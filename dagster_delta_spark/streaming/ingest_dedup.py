"""Continuous-ingest near-duplicate filtering (streaming MinHash+LSH).

The batch dedup operators (`operators/dedup.py`) answer "which pairs in
THIS corpus are near-dups"; a training-data ingest pipeline needs the
online form: as document batches arrive, drop the ones that near-match
anything ALREADY ACCEPTED, and admit the rest — without ever rescanning
the accepted corpus.

Design (Spark Structured Streaming + the engine's transactional table):

- State = two append-only `DeltaSparkTable`s: the accepted documents
  and their LSH band buckets ((doc_id, band, h) rows — constant size
  per doc: `bands` longs).  The bucket table IS the index; it grows
  with accepted docs only, never with rejected ones.
- Per micro-batch (foreachBatch): MinHash-sign the batch (same
  signature pipeline as the batch operators — `shingles_of` +
  `_signatures_from_stream`), band it, then
    1. within-batch: a doc sharing ANY band bucket with a smaller
       batch doc_id is dropped (deterministic survivor),
    2. cross-batch: a doc sharing ANY band bucket with the accepted
       bucket table is dropped (left_anti join on (band, h) — the
       accepted side is pre-bucketed, so this probes the index rather
       than re-signing history).
  Survivor docs + their buckets land as one atomic append each, tagged
  with the streaming batch id for idempotent restart (same pattern as
  `stream_into_table`).
- LSH-only decision (no exact verify): the classic online-filter
  trade — false-positive drops at the banding collision rate in
  exchange for never touching accepted TEXT again.  `bands` /
  `num_hashes` tune precision exactly as in the batch operator.

At 100 TB the bucket join shuffles on (band, h) — bounded by accepted
docs x bands rows of 24 bytes, orders of magnitude smaller than the
corpus — and each batch's signature build touches only that batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _band_buckets(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, sig) -> (doc_id, band, h): one xxhash64 bucket per
    signature slice (identical banding to minhash_lsh_near_dups)."""
    rows_per_band = num_hashes // bands
    band_expr = (
        f"transform(sequence(0, {bands - 1}), "
        f"b -> named_struct('band', b, 'h', "
        f"xxhash64(concat_ws(',', slice(sig, b * {rows_per_band} + 1, "
        f"{rows_per_band})))))"
    )
    return sigs.select(
        "doc_id", F.explode(F.expr(band_expr)).alias("bh")
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))


def ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    docs_table,
    bucket_table,
    last: dict,
    num_hashes: int = 64,
    bands: int = 16,
) -> None:
    """Process ONE micro-batch of the ingest filter (the foreachBatch
    body, module-level so the crash-recovery protocol is unit-testable
    outside a streaming query).  ``last`` holds each table's
    last-committed batch id, memoized by the caller across batches."""
    from ..config import WriteMode
    from ..operators.dedup import _signatures_from_stream, shingles_of
    from ..operators.textops import NORM_TEXT

    if batch_id <= last["docs"]:
        return
    batch_df = batch_df.localCheckpoint()  # small; read 3x below
    sigs = _signatures_from_stream(shingles_of(batch_df), num_hashes)
    lsh_buckets = _band_buckets(sigs, num_hashes, bands)
    # docs too short to shingle (< 3 tokens, or empty text) carry
    # no LSH evidence — give each ONE exact-content pseudo-bucket
    # (band -1) so they are exact-deduped against other short docs
    # and, crucially, still reach kept_ids instead of being
    # silently lost by the inner join below
    short = batch_df.join(
        sigs.select("doc_id"), "doc_id", "left_anti"
    ).select(
        "doc_id",
        F.lit(-1).alias("band"),
        F.xxhash64(F.expr(NORM_TEXT)).alias("h"),
    )
    buckets = (
        lsh_buckets.unionByName(short)
        .withColumn("batch_id", F.lit(batch_id))
        .localCheckpoint()
    )

    # 1. within-batch: drop docs bucket-colliding with a smaller id
    a, b = buckets.alias("a"), buckets.alias("b")
    beaten = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.h") == F.col("b.h"))
               & (F.col("a.doc_id") > F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
    )
    survivors = buckets.join(beaten, "doc_id", "left_anti")

    # 2. cross-batch: drop docs colliding with the accepted index.
    # Rows carry their batch_id precisely so a RERUN of this batch
    # (crash after the bucket append below, before the docs
    # append) does not collide the batch with its own buckets and
    # silently drop every document
    if bucket_table.exists():
        accepted = (
            bucket_table.read()
            .where(F.col("batch_id") != batch_id)
            .select("band", "h")
        )
        hit = (
            survivors.join(accepted, ["band", "h"], "left_semi")
            .select("doc_id").distinct()
        )
        survivors = survivors.join(hit, "doc_id", "left_anti")

    kept_ids = survivors.select("doc_id").distinct()
    kept_docs = batch_df.join(kept_ids, "doc_id")
    md = {"streaming_batch_id": str(batch_id)}
    if batch_id > last["buckets"]:
        bucket_table.write(
            survivors, WriteMode.append
            if bucket_table.exists() else WriteMode.error,
            commit_metadata=md,
        )
        last["buckets"] = batch_id
    docs_table.write(kept_docs, WriteMode.append
                     if docs_table.exists() else WriteMode.error,
                     commit_metadata=md)
    last["docs"] = batch_id


def stream_ingest_near_dup_filter(
    spark: SparkSession,
    source_dir: str,
    table_uri: str,
    num_hashes: int = 64,
    bands: int = 16,
    max_files_per_trigger: int = 1,
) -> "DeltaSparkTable":
    """Run the streaming near-dup ingest filter over a directory of
    document parquet files; returns the accepted-documents table
    (`table_uri`; buckets live at `table_uri + "_buckets"`).

    Processes everything currently in `source_dir`
    (`processAllAvailable`) and stops — rerunning resumes from the
    stream checkpoint and the batch-id commit metadata keeps restarts
    idempotent even if a failure lands between commit and checkpoint.
    """
    from ..table import DeltaSparkTable
    from .events import last_streaming_batch

    docs_table = DeltaSparkTable(spark, table_uri)
    bucket_table = DeltaSparkTable(spark, table_uri + "_buckets")
    # each table tracks its own last-committed batch, memoized across
    # the run: a crash BETWEEN the two appends reruns the batch with
    # the bucket append already durable and only the docs append
    # outstanding; the full history scan runs once at startup, not
    # per micro-batch (history cost grows with committed batches)
    last = {
        "docs": last_streaming_batch(docs_table),
        "buckets": last_streaming_batch(bucket_table),
    }

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch_df, batch_id, docs_table, bucket_table, last,
            num_hashes=num_hashes, bands=bands,
        )

    # same glob as the stream below: a stray non-parquet file in the
    # source dir must not break schema inference either.  An existing
    # but still-empty source dir (continuous ingest started before the
    # first batch lands) would otherwise surface as Spark's unhelpful
    # "unable to infer schema" — fail with an actionable message.
    import glob as _glob
    import os as _os

    if not _glob.glob(_os.path.join(source_dir, "*.parquet")):
        raise ValueError(
            f"no *.parquet files in source_dir {source_dir!r} yet — "
            "the ingest filter infers its schema from the first batch; "
            "start it after at least one file lands"
        )
    schema = (
        spark.read.option("pathGlobFilter", "*.parquet")
        .parquet(source_dir).schema
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.parquet")
        .parquet(source_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", table_uri + "/_stream_checkpoint")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return docs_table
