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

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# the cross-engine md5-derived hash family lives with the batch
# primitives it dials (operators/dedup.py) since r10; re-exported here
# for backward compatibility (r9 name)
from ..operators.dedup import PORTABLE_H64  # noqa: F401


def portable_doc_buckets(
    docs: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(doc_id, text) -> the full (doc_id, band, h) bucket set with
    every hash derived from md5 (``PORTABLE_H64``) instead of
    xxhash64: same STRUCTURE as the production pipeline — distinct
    word-trigram shingles -> per-seed minhash signature -> banded
    slice hash, plus the band=-1 exact-content pseudo-bucket for
    unshingleable docs — but cross-engine recomputable, which is what
    makes the ingest filter's kept-set ORACLE-VERIFIABLE end-to-end
    (`__spark_entry__._stream_ingest_filter`).  md5 costs ~3x
    xxhash64, so the production filter keeps xxhash64 and this
    variant is the verification dial.

    The pipeline DELEGATES to the shared primitives
    (``_signatures_from_stream`` / ``band_buckets``) with the hash
    family swapped via their hash parameters — the structure (shingle
    rule, seeding, slice scheme, short-doc pseudo-bucket) literally
    cannot fork from the xxhash64 production path."""
    from ..operators.dedup import (
        _signatures_from_stream,
        band_buckets,
        portable_hash_family,
        shingles_of,
    )
    from ..operators.textops import NORM_TEXT

    base_hash, seed_hash, hash_sql = portable_hash_family()
    sigs = _signatures_from_stream(
        shingles_of(docs), num_hashes,
        base_hash=base_hash, seed_hash=seed_hash,
    )
    lsh = band_buckets(sigs, num_hashes, bands, hash_sql=hash_sql)
    short = docs.join(sigs.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.lit(-1).alias("band"),
        F.expr(PORTABLE_H64.format(x=NORM_TEXT)).alias("h"),
    )
    return lsh.unionByName(short)


def _band_buckets(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, sig) -> (doc_id, band, h): THE shared banding scheme —
    the online filter and the batch LSH operators must bucket
    identically or the accepted index would stop matching batch
    near-dups."""
    from ..operators.dedup import band_buckets

    return band_buckets(sigs, num_hashes, bands)


def sign_batch(
    batch_df: DataFrame,
    batch_id: int,
    num_hashes: int = 64,
    bands: int = 16,
    epoch: str = "",
    portable_hash: bool = False,
) -> DataFrame:
    """SIGN stage of the ingest filter: one micro-batch's LSH bucket
    rows, eagerly materialized (``batch_df`` should already be
    checkpointed — the caller reads it again for the docs append).

    Docs too short to shingle (< 3 tokens, or empty text) carry no
    LSH evidence — each gets ONE exact-content pseudo-bucket
    (band -1) so they are exact-deduped against other short docs
    and, crucially, still reach kept_ids instead of being silently
    lost by the probe's inner join.

    ``portable_hash=True`` swaps every hash for the md5-derived
    ``PORTABLE_H64`` (same structure) so an external engine can
    recompute the bucket set — the oracle-verification dial."""
    from ..operators.dedup import _signatures_from_stream, shingles_of
    from ..operators.textops import NORM_TEXT

    if portable_hash:
        allb = portable_doc_buckets(batch_df, num_hashes, bands)
    else:
        sigs = _signatures_from_stream(shingles_of(batch_df), num_hashes)
        short = batch_df.join(
            sigs.select("doc_id"), "doc_id", "left_anti"
        ).select(
            "doc_id",
            F.lit(-1).alias("band"),
            F.xxhash64(F.expr(NORM_TEXT)).alias("h"),
        )
        allb = _band_buckets(sigs, num_hashes, bands).unionByName(short)
    return (
        allb
        .withColumn("batch_id", F.lit(batch_id))
        .withColumn("epoch", F.lit(epoch))
        .localCheckpoint()
    )


def survivors_of(
    buckets: DataFrame,
    batch_id: int,
    bucket_table,
    epoch: str = "",
) -> DataFrame:
    """PROBE stage: collision decision -> this batch's surviving
    bucket rows (lazy).

    One linear aggregate instead of a within-batch self-join + an
    accepted semi-join: per (band, h) bucket, find the smallest batch
    doc_id holding it and whether the ACCEPTED index already holds
    it; a doc is dropped iff any of its buckets has an accepted
    holder or a smaller batch doc.  Same survivor rule as a pair
    join, but the cost is one shuffle on (band, h) with no pair
    expansion — a boilerplate bucket shared by k docs costs k rows
    here, not k^2/2 join pairs (the quadratic blow-up the batch dedup
    operators also cap).

    Accepted rows carry their batch_id precisely so a RERUN of this
    batch (crash after the bucket append, before the docs append)
    does not collide the batch with its own buckets and silently
    drop every document."""
    probe = buckets.select(
        "band", "h", "doc_id", F.lit(False).alias("accepted")
    )
    if bucket_table.exists():
        accepted_b = bucket_table.read()
        if "epoch" not in accepted_b.columns:
            # pre-epoch bucket tables: rows belong to an unknown run
            accepted_b = accepted_b.withColumn(
                "epoch", F.lit(None).cast("string"))
        probe = probe.unionByName(
            accepted_b
            # exclude THIS run's re-append of THIS batch (crash rerun).
            # Epoch-NULL rows (pre-upgrade tables) with the same batch
            # id also count as self: a pre-upgrade crash between the
            # two appends leaves batch N's buckets without an epoch,
            # and treating them as foreign would make the rerun
            # self-collide and silently drop the whole batch — the
            # exact loss the two-table protocol exists to prevent.  A
            # DIFFERENT tagged epoch's same-numbered batch is real
            # accepted state and stays probeable.
            .where(~((F.col("epoch").eqNullSafe(F.lit(epoch))
                      | F.col("epoch").isNull())
                     & (F.col("batch_id") == batch_id)))
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
    return buckets.join(dropped, "doc_id", "left_anti")


def ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    docs_table,
    bucket_table,
    last: dict,
    num_hashes: int = 64,
    bands: int = 16,
    epoch: str = "",
    stage_times: Optional[dict] = None,
    portable_hash: bool = False,
) -> None:
    """Process ONE micro-batch of the ingest filter (the foreachBatch
    body, module-level so the crash-recovery protocol is unit-testable
    outside a streaming query).  ``last`` holds each table's
    last-committed batch id, memoized by the caller across batches.
    The stages are ``sign_batch`` (signatures -> buckets) ->
    ``survivors_of`` (collision probe) -> the two-table commit.

    ``epoch`` namespaces the streaming batch ids (Delta's txnAppId
    analogue): micro-batch ids are only unique PER CHECKPOINT, so a
    deleted/recreated checkpoint restarts them at 0 — without the
    epoch, the replay guard would silently skip the new run's batches
    and the self-bucket exclusion would hide an old run's
    same-numbered accepted buckets from the probe.

    ``stage_times`` (bench instrumentation): a dict to accumulate
    per-stage wall seconds under ``"sign"`` / ``"probe"`` /
    ``"commit"``.  When set, the survivors frame is checkpointed so
    the probe's cost lands in its own stage instead of being lazily
    folded into the commit; production runs (None) keep the fused
    lazy plan."""
    import time as _time

    from ..config import SchemaMode, WriteMode

    if batch_id <= last["docs"]:
        return

    def mark(stage: str, t0: float) -> float:
        if stage_times is not None:
            stage_times[stage] = (
                stage_times.get(stage, 0.0) + _time.perf_counter() - t0)
        return _time.perf_counter()

    t0 = _time.perf_counter()
    batch_df = batch_df.localCheckpoint()  # small; read 3x below
    buckets = sign_batch(batch_df, batch_id, num_hashes, bands, epoch,
                         portable_hash=portable_hash)
    t0 = mark("sign", t0)
    survivors = survivors_of(buckets, batch_id, bucket_table, epoch)
    if stage_times is not None:
        survivors = survivors.localCheckpoint()
    t0 = mark("probe", t0)

    kept_ids = survivors.select("doc_id").distinct()
    kept_docs = batch_df.join(kept_ids, "doc_id")
    md = {"streaming_batch_id": str(batch_id), "streaming_epoch": epoch}
    if batch_id > last["buckets"]:
        bucket_table.write(
            survivors, WriteMode.append
            if bucket_table.exists() else WriteMode.error,
            commit_metadata=md,
            # pre-epoch tables evolve (their rows read epoch=null)
            schema_mode=SchemaMode.append,
        )
        last["buckets"] = batch_id
    docs_table.write(kept_docs, WriteMode.append
                     if docs_table.exists() else WriteMode.error,
                     commit_metadata=md)
    last["docs"] = batch_id
    mark("commit", t0)


def _checkpoint_epoch(checkpoint_dir: str) -> str:
    """Stable id for one checkpoint lifetime, persisted INSIDE the
    checkpoint dir so it dies with it: the Delta txnAppId analogue that
    makes (epoch, batch_id) globally unique where bare batch ids are
    only unique per checkpoint."""
    import os
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "dds_epoch")
    try:
        with open(path, "r", encoding="utf-8") as f:
            existing = f.read().strip()
        if existing:
            return existing
    except OSError:
        pass
    epoch = uuid.uuid4().hex
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(epoch)
    os.replace(tmp, path)
    return epoch


def _last_batch_for_epoch(table, epoch: str) -> int:
    """Newest streaming batch id committed UNDER this epoch, -1 if the
    newest streaming commit belongs to a different (or pre-epoch) run —
    a fresh checkpoint restarts batch numbering, so an old run's
    watermark must not suppress the new run's batches."""
    if not table.exists():
        return -1
    for h in table.history():
        md = h.get("userMetadata") or {}
        if "streaming_batch_id" in md:
            if md.get("streaming_epoch") == epoch:
                return int(md["streaming_batch_id"])
            return -1
    return -1


def stream_ingest_near_dup_filter(
    spark: SparkSession,
    source_dir: str,
    table_uri: str,
    num_hashes: int = 64,
    bands: int = 16,
    max_files_per_trigger: int = 1,
    compact_every: int = 0,
    stage_times: Optional[dict] = None,
    portable_hash: bool = False,
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

    docs_table = DeltaSparkTable(spark, table_uri)
    bucket_table = DeltaSparkTable(spark, table_uri + "_buckets")
    # epoch: micro-batch ids are unique only per checkpoint, so the
    # watermark and self-bucket exclusion key on (epoch, batch_id) —
    # a fresh checkpoint (new epoch) restarts the watermark at -1 and
    # redelivers everything; the accepted-index probe then re-drops the
    # already-ingested content instead of batches being silently
    # skipped on the reused low ids
    checkpoint_dir = table_uri + "/_stream_checkpoint"
    epoch = _checkpoint_epoch(checkpoint_dir)
    # each table tracks its own last-committed batch, memoized across
    # the run: a crash BETWEEN the two appends reruns the batch with
    # the bucket append already durable and only the docs append
    # outstanding; the full history scan runs once at startup, not
    # per micro-batch (history cost grows with committed batches)
    last = {
        "docs": _last_batch_for_epoch(docs_table, epoch),
        "buckets": _last_batch_for_epoch(bucket_table, epoch),
    }

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch_df, batch_id, docs_table, bucket_table, last,
            num_hashes=num_hashes, bands=bands, epoch=epoch,
            stage_times=stage_times, portable_hash=portable_hash,
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
