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
  `_signatures_from_stream`), band it, then decide both collision
  rules in ONE linear (band, h) aggregate: per bucket, the smallest
  batch doc_id and an accepted-index flag; a doc is dropped iff any
  of its buckets has an accepted holder (cross-batch) or a smaller
  batch doc (within-batch deterministic survivor).  No pair
  expansion: a bucket shared by k docs costs k rows, not k^2/2 join
  pairs.  Survivor docs + their buckets land as one atomic append
  each, tagged with the streaming batch id for idempotent restart
  (same pattern as `stream_into_table`).
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
    """(doc_id, sig) -> (doc_id, band, h): THE shared banding scheme —
    the online filter and the batch LSH operators must bucket
    identically or the accepted index would stop matching batch
    near-dups."""
    from ..operators.dedup import band_buckets

    return band_buckets(sigs, num_hashes, bands)


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

    # Collision decision in ONE linear aggregate instead of a
    # within-batch self-join + accepted semi-join: per (band, h)
    # bucket, find the smallest batch doc_id holding it and whether
    # the ACCEPTED index already holds it; a doc is dropped iff any of
    # its buckets has an accepted holder or a smaller batch doc.
    # Same survivor rule as the former pair join, but the cost is one
    # shuffle on (band, h) with no pair expansion — a boilerplate
    # bucket shared by k docs costs k rows here, not k^2/2 join pairs
    # (the quadratic blow-up the batch dedup operators also avoid).
    #
    # Accepted rows carry their batch_id precisely so a RERUN of this
    # batch (crash after the bucket append below, before the docs
    # append) does not collide the batch with its own buckets and
    # silently drop every document.
    probe = buckets.select(
        "band", "h", "doc_id", F.lit(False).alias("accepted")
    )
    if bucket_table.exists():
        probe = probe.unionByName(
            bucket_table.read()
            .where(F.col("batch_id") != batch_id)
            .select(
                "band", "h",
                F.lit(None).cast(dict(buckets.dtypes)["doc_id"])
                .alias("doc_id"),
                F.lit(True).alias("accepted"),
            )
        )
    winners = probe.groupBy("band", "h").agg(
        F.min("doc_id").alias("min_doc"),       # nulls (accepted) skipped
        F.max("accepted").alias("any_accepted"),
    )
    dropped = (
        buckets.join(winners, ["band", "h"])
        .where(F.col("any_accepted") | (F.col("doc_id") > F.col("min_doc")))
        .select("doc_id")
        .distinct()
    )
    survivors = buckets.join(dropped, "doc_id", "left_anti")

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
    compact_every: int = 0,
) -> "DeltaSparkTable":
    """Run the streaming near-dup ingest filter over a directory of
    document parquet files; returns the accepted-documents table
    (`table_uri`; buckets live at `table_uri + "_buckets"`).

    Processes everything currently in `source_dir`
    (`processAllAvailable`) and stops — rerunning resumes from the
    stream checkpoint and the batch-id commit metadata keeps restarts
    idempotent even if a failure lands between commit and checkpoint.

    ``compact_every`` > 0 runs `optimize()` on both state tables every
    N batches: each append lands one file per table, so a long-running
    ingest accretes files linearly with batches and the per-batch
    index read degrades into a many-small-files scan.  Compaction
    commits carry no ``streaming_batch_id``, so the restart watermark
    (`last_streaming_batch`) skips straight past them and idempotency
    is unaffected.
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
        if compact_every > 0 and (batch_id + 1) % compact_every == 0:
            bucket_table.optimize()
            docs_table.optimize()

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
