"""Streaming (session windows, transactional sink) and delimited
sources."""

SF = "/root/testdata/sf0.001"


def test_session_window_stream_roughly_matches_batch(spark):
    """session_window streaming vs gaps-and-islands batch: same session
    count per user (semantics agree except exact-gap boundary ties)."""
    from dagster_delta_spark.operators.relational import events_sessionize
    from dagster_delta_spark.streaming import run_sessionize_once

    batch = events_sessionize(spark, SF, gap_minutes=30)
    batch_counts = {
        r["user_id"]: r["n"] for r in
        batch.groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    stream = run_sessionize_once(spark, SF, "t_sessions_test")
    stream_counts = {
        r["user_id"]: r["n"] for r in
        stream.groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    assert stream_counts == batch_counts


def test_stream_into_transactional_table(spark, tmp_path):
    """foreachBatch sink: every micro-batch is one atomic
    STREAMING UPDATE commit carrying its txn ledger entry; total rows
    match the source."""
    from dagster_delta_spark.streaming import stream_into_table

    uri = str(tmp_path / "events_table")
    table = stream_into_table(spark, SF, uri, max_files_per_trigger=8)
    src_count = spark.read.parquet(f"{SF}/events.parquet").count()
    assert table.read().count() == src_count
    h = table.history()
    assert all(
        hh["operation"] == "STREAMING UPDATE" for hh in h
    )
    assert table.last_txn_version("events_ingest") == len(h) - 1


def test_scan_csv_roundtrip(spark, tmp_path):
    import csv

    from dagster_delta_spark.sources.delimited import scan_csv

    p = tmp_path / "data.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "name", "score"])
        w.writerows([[1, "a", 1.5], [2, "b", 2.5]])
    df = scan_csv(spark, str(p), "id bigint, name string, score double")
    rows = sorted((r["id"], r["name"], r["score"]) for r in df.collect())
    assert rows == [(1, "a", 1.5), (2, "b", 2.5)]


def test_scan_json_roundtrip(spark, tmp_path):
    import json

    from dagster_delta_spark.sources.delimited import scan_json

    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for rec in [{"id": 1, "tag": "x"}, {"id": 2, "tag": "y"}]:
            f.write(json.dumps(rec) + "\n")
    df = scan_json(spark, str(p), "id bigint, tag string")
    assert df.count() == 2
    assert set(df.columns) == {"id", "tag"}


def test_asof_join_semantics(spark):
    """Every click matches its newest preceding purchase per user."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.operators.asof import clicks_asof_purchases
    from dagster_delta_spark.operators.relational import load_events

    out = clicks_asof_purchases(spark, SF)
    # matched purchase never comes after the click
    assert out.where(F.col("p_ts") > F.col("ts")).count() == 0
    # spot-check one user against a driver-side computation
    ev = load_events(spark, SF).collect()
    clicks = [r for r in ev if r["event_type"] == "click"]
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    c = clicks[0]
    expected = max(
        (p for p in purchases
         if p["user_id"] == c["user_id"] and p["ts"] <= c["ts"]),
        key=lambda p: p["ts"],
        default=None,
    )
    got = out.where(F.col("event_id") == c["event_id"]).collect()[0]
    if expected is None:
        assert got["p_event_id"] is None
    else:
        assert got["p_event_id"] == expected["event_id"]


def test_rollup_contains_grand_total(spark):
    from dagster_delta_spark.operators.relational import revenue_rollup

    out = revenue_rollup(spark, SF).collect()
    grand = [r for r in out if r["o_orderstatus"] is None
             and r["o_orderpriority"] is None]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == sum(
        r["n_orders"] for r in out
        if r["o_orderstatus"] is not None and r["o_orderpriority"] is not None
    )


def test_stateful_user_totals_matches_batch(spark):
    """applyInPandasWithState running totals equal the batch groupBy."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.operators.relational import load_events
    from dagster_delta_spark.streaming.stateful import run_user_totals_once

    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in run_user_totals_once(spark, SF, "t_user_totals").collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in load_events(spark, SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == want


def test_read_table_stream_sees_appends(spark, tmp_path):
    """Table-as-streaming-source: appended commits arrive as new
    micro-batches (append-only auto-ingest)."""
    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.streaming import read_table_stream

    uri = str(tmp_path / "t")
    t = DeltaSparkTable(spark, uri)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string")
    t.write(df, WriteMode.append)
    stream = read_table_stream(spark, uri)
    q = (stream.writeStream.format("memory").queryName("t_tbl_stream")
         .outputMode("append").start())
    q.processAllAvailable()
    assert spark.table("t_tbl_stream").count() == 2
    t.write(df, WriteMode.append)
    q.processAllAvailable()
    q.stop()
    assert spark.table("t_tbl_stream").count() == 4


def test_resize_payloads(spark):
    from dagster_delta_spark.operators.multimodal import (
        binarize_documents,
        resize_payloads,
    )

    b = binarize_documents(spark, SF)
    out = resize_payloads(b, target_bytes=32)
    rows = out.limit(5).collect()
    assert all(r["n_bytes"] == 32 and len(r["payload"]) == 32 for r in rows)


def test_stream_upsert_sink_replay_safe_without_checkpoint(spark, tmp_path):
    """Merge-based sink: re-running the stream with a FRESH checkpoint
    (full re-delivery) still produces no duplicates."""
    import shutil

    from dagster_delta_spark.streaming import stream_upsert_into_table

    uri = str(tmp_path / "t")
    t = stream_upsert_into_table(spark, SF, uri)
    n = t.read().count()
    assert n == spark.read.parquet(f"{SF}/events.parquet").count()
    # wipe the checkpoint -> full replay -> merge dedups everything
    shutil.rmtree(uri + "/_stream_checkpoint")
    t2 = stream_upsert_into_table(spark, SF, uri)
    assert t2.read().count() == n


def test_streaming_dedup_drops_redelivered_events(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the same events delivered twice
    (two files, two micro-batches) come out once."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.streaming.events import (
        dedup_stream,
        read_events_stream,
    )

    src = spark.read.parquet(f"{SF}/events.parquet").limit(200)
    d = tmp_path / "dup"
    d.mkdir()
    src.coalesce(1).write.mode("overwrite").parquet(str(d / "b1"))
    src.coalesce(1).write.mode("overwrite").parquet(str(d / "b2"))
    # flatten both deliveries into one stream dir
    import shutil

    for i, sub in enumerate(("b1", "b2")):
        f = next((d / sub).glob("*.parquet"))
        shutil.copy(f, d / f"ev{i}.parquet")
        shutil.rmtree(d / sub)

    stream = dedup_stream(read_events_stream(spark, str(d), 1, glob="ev*.parquet"))
    name = "dedup_t"
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    out = spark.table(name)
    n_unique = src.select("event_id").distinct().count()
    assert out.count() == n_unique
    assert out.select("event_id").distinct().count() == n_unique


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    """documents -> JSONL shards -> schema-pinned read == original."""
    from dagster_delta_spark.sources import read_jsonl, write_jsonl

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "corpus")
    write_jsonl(docs.repartition(3), path)
    back = read_jsonl(spark, path, schema=docs.schema)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_version_offset_stream_is_compaction_safe(spark, tmp_path):
    """The dds_table source streams by COMMIT VERSION: appends arrive
    exactly once, optimize() emits nothing (the file-source approach
    would re-ingest every compacted row), and partition columns are
    reconstructed from the log."""
    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.streaming import DeltaSparkTableDataSource

    spark.dataSource.register(DeltaSparkTableDataSource)
    uri = str(tmp_path / "t")
    t = DeltaSparkTable(spark, uri)
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, p string")
    t.write(df, WriteMode.error, partition_columns=["p"])             # v0
    t.write(spark.createDataFrame([(3, "x")], "k bigint, p string"),
            WriteMode.append)                                          # v1

    stream = (spark.readStream.format("dds_table")
              .option("path", uri).load())
    q = (stream.writeStream.format("memory").queryName("t_vstream")
         .outputMode("append").start())
    q.processAllAvailable()
    got = {(r["k"], r["p"]) for r in spark.table("t_vstream").collect()}
    assert got == {(1, "x"), (2, "y"), (3, "x")}

    t.optimize()                                                       # v2
    t.write(spark.createDataFrame([(4, "z")], "k bigint, p string"),
            WriteMode.append)                                          # v3
    q.processAllAvailable()
    q.stop()
    got = sorted((r["k"], r["p"]) for r in spark.table("t_vstream").collect())
    assert got == [(1, "x"), (2, "y"), (3, "x"), (4, "z")], (
        "compaction must not re-emit rows"
    )


def test_version_offset_stream_fails_on_rewrite(spark, tmp_path):
    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.streaming import DeltaSparkTableDataSource

    spark.dataSource.register(DeltaSparkTableDataSource)
    uri = str(tmp_path / "t")
    t = DeltaSparkTable(spark, uri)
    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    t.write(df, WriteMode.error)
    stream = (spark.readStream.format("dds_table")
              .option("path", uri).load())
    q = (stream.writeStream.format("memory").queryName("t_vstream_rw")
         .outputMode("append").start())
    q.processAllAvailable()
    assert spark.table("t_vstream_rw").count() == 1
    t.write(df, WriteMode.overwrite)
    try:
        q.processAllAvailable()
        streaming_failed = False
    except Exception:
        streaming_failed = True
    finally:
        q.stop()
    assert streaming_failed, "rewrite commits must fail the stream loudly"


def test_stream_ingest_near_dup_filter(spark, tmp_path):
    """Online MinHash ingest filter: batch 2's near-copy of an
    already-accepted batch-1 doc is dropped via the accumulated bucket
    index; distinct docs are admitted; within-batch dups keep one
    survivor; a rerun over the same source is a no-op (idempotent)."""
    import time

    import pandas as pd

    from dagster_delta_spark.streaming import stream_ingest_near_dup_filter

    src = tmp_path / "src"
    src.mkdir()
    body = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet green field all afternoon long")
    other = ("completely unrelated text about distributed query "
             "engines shuffling partitioned columnar data at scale")
    third = ("a third document discussing minhash signatures banding "
             "and locality sensitive hashing for near duplicates")
    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            str(src / name))

    # batch 1: doc 1+2 distinct, doc 3 an exact copy of doc 1
    write("b1.parquet", [(1, body), (2, other), (3, body)])
    time.sleep(0.05)  # distinct mtimes -> deterministic file order
    # batch 2: doc 4 copies doc 1 (cross-batch dup), doc 5 is new
    write("b2.parquet", [(4, body), (5, third)])

    t = stream_ingest_near_dup_filter(
        spark, str(src), str(tmp_path / "accepted"),
        max_files_per_trigger=1,
    )
    accepted = sorted(r["doc_id"] for r in t.read().collect())
    # 3 loses to 1 within batch 1; 4 collides cross-batch with 1
    assert accepted == [1, 2, 5]

    # idempotent resume: nothing new in src -> no change
    t2 = stream_ingest_near_dup_filter(
        spark, str(src), str(tmp_path / "accepted"),
        max_files_per_trigger=1,
    )
    assert sorted(r["doc_id"] for r in t2.read().collect()) == [1, 2, 5]


def test_stream_ingest_admits_short_docs(spark, tmp_path):
    """Docs too short to shingle (< 3 tokens) must be ADMITTED, not
    silently lost (code-review r5 finding), and exact-deduped against
    other short docs via their content pseudo-bucket."""
    import pandas as pd

    from dagster_delta_spark.streaming import stream_ingest_near_dup_filter

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame(
        [(1, "hello world"), (2, "hi"),
         (3, "hello world"),            # exact short dup of 1
         (4, "a normal length document with plenty of word trigrams "
             "inside it for signatures")],
        columns=["doc_id", "text"],
    ).to_parquet(str(src / "b1.parquet"))
    t = stream_ingest_near_dup_filter(
        spark, str(src), str(tmp_path / "accepted"))
    accepted = sorted(r["doc_id"] for r in t.read().collect())
    assert accepted == [1, 2, 4]  # 3 exact-dups 1; shorts admitted


def test_ingest_batch_partial_crash_recovery(spark, tmp_path):
    """Crash between the bucket append and the docs append: the rerun
    must re-admit the batch's survivors (its own already-committed
    buckets are excluded from the collision check via batch_id), and
    must not append the buckets twice."""
    import pandas as pd

    from dagster_delta_spark.streaming.ingest_dedup import ingest_batch
    from dagster_delta_spark.streaming.events import last_streaming_batch
    from dagster_delta_spark.table import DeltaSparkTable

    def docs_df(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    body = ("one unique document body with enough tokens to form many "
            "word trigram shingles for a useful signature")
    other = ("second entirely different text discussing streaming "
             "micro batches and transactional append commits")
    docs_t = DeltaSparkTable(spark, str(tmp_path / "docs"))
    bucket_t = DeltaSparkTable(spark, str(tmp_path / "docs_buckets"))
    last = {"docs": -1, "buckets": -1}

    ingest_batch(docs_df([(1, body)]), 0, docs_t, bucket_t, last)
    assert [r["doc_id"] for r in docs_t.read().collect()] == [1]

    # batch 1: crash AFTER the bucket append, BEFORE the docs append
    orig_write = docs_t.write
    def boom(*a, **k):
        raise RuntimeError("crash before docs append")
    docs_t.write = boom
    try:
        import pytest as _pytest
        with _pytest.raises(RuntimeError):
            ingest_batch(docs_df([(2, other)]), 1, docs_t, bucket_t, last)
    finally:
        docs_t.write = orig_write
    # buckets durable for batch 1; docs not
    assert last_streaming_batch(bucket_t) == 1
    assert last_streaming_batch(docs_t) == 0
    n_bucket_versions = len(bucket_t.history())

    # restart: fresh watermarks from the tables, rerun batch 1
    last2 = {"docs": last_streaming_batch(docs_t),
             "buckets": last_streaming_batch(bucket_t)}
    ingest_batch(docs_df([(2, other)]), 1, docs_t, bucket_t, last2)
    accepted = sorted(r["doc_id"] for r in docs_t.read().collect())
    assert accepted == [1, 2]          # doc 2 NOT self-collided away
    assert len(bucket_t.history()) == n_bucket_versions  # no re-append

    # a later near-copy of doc 2 is still filtered by the index
    ingest_batch(docs_df([(3, other)]), 2, docs_t, bucket_t, last2)
    assert sorted(r["doc_id"] for r in docs_t.read().collect()) == [1, 2]


def test_stream_ingest_empty_source_dir(spark, tmp_path):
    """Starting the ingest filter on an existing-but-empty source dir
    fails with an actionable message, not Spark's 'unable to infer
    schema' (r5 advice)."""
    import pytest

    from dagster_delta_spark.streaming import stream_ingest_near_dup_filter

    src = tmp_path / "src"
    src.mkdir()
    with pytest.raises(ValueError, match=r"no \*\.parquet files"):
        stream_ingest_near_dup_filter(
            spark, str(src), str(tmp_path / "accepted"))


def test_ingest_accepted_set_properties(spark, tmp_path):
    """Soundness properties of the ingest filter on a randomized
    corpus (seeded): (1) no two ACCEPTED docs share any LSH band
    bucket — the index admits at most one holder per bucket; (2) every
    REJECTED doc has a collision witness: a shared bucket with an
    accepted doc OR a smaller-id doc (the one-shot drop rule rejects
    on smaller SAME-BATCH ids even when that winner itself loses
    elsewhere, so accepted-only witnesses are NOT an invariant);
    (3) a rerun over the same source is a no-op."""
    import random

    import pandas as pd

    from dagster_delta_spark.operators.dedup import (
        _signatures_from_stream,
        shingles_of,
    )
    from dagster_delta_spark.streaming import stream_ingest_near_dup_filter
    from dagster_delta_spark.streaming.ingest_dedup import _band_buckets

    rnd = random.Random(13)
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = []
    for i in range(40):
        if i % 5 == 4 and texts:
            texts.append(rnd.choice(texts))            # planted dup
        else:
            texts.append(" ".join(rnd.choices(vocab, k=rnd.randint(1, 30))))
    src = tmp_path / "src"
    src.mkdir()
    import time as _time
    for b in range(3):
        pd.DataFrame(
            [(i, t) for i, t in enumerate(texts) if i % 3 == b],
            columns=["doc_id", "text"],
        ).to_parquet(str(src / f"b{b}.parquet"), index=False)
        _time.sleep(0.05)

    t = stream_ingest_near_dup_filter(spark, str(src),
                                      str(tmp_path / "acc"))
    accepted = {r["doc_id"] for r in t.read().select("doc_id").collect()}
    assert accepted  # something got through

    # recompute buckets for the WHOLE corpus with the same helpers
    all_docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    sigs = _signatures_from_stream(shingles_of(all_docs), 64)
    buckets = {}
    for r in _band_buckets(sigs, 64, 16).collect():
        buckets.setdefault((r["band"], r["h"]), set()).add(r["doc_id"])
    long_docs = {d for ds in buckets.values() for d in ds}

    for (band, h), ds in buckets.items():
        assert len(ds & accepted) <= 1, ((band, h), ds & accepted)
    for doc in long_docs - accepted:
        assert any(
            doc in ds and (ds & accepted or any(d < doc for d in ds))
            for ds in buckets.values()
        ), doc

    t2 = stream_ingest_near_dup_filter(spark, str(src),
                                       str(tmp_path / "acc"))
    assert {r["doc_id"] for r in t2.read().collect()} == accepted


def test_ingest_periodic_compaction(spark, tmp_path):
    """compact_every folds the one-file-per-batch accretion back into
    few files without changing results, and the optimize commits (no
    streaming_batch_id) leave the restart watermark — and therefore
    idempotent rerun — intact."""
    import pandas as pd

    from dagster_delta_spark.streaming import stream_ingest_near_dup_filter
    from dagster_delta_spark.streaming.events import last_streaming_batch

    src = tmp_path / "src"
    src.mkdir()
    import time as _time
    texts = [
        "one unique document body with enough tokens to form many word "
        "trigram shingles for a useful minhash signature",
        "second entirely different text discussing streaming micro "
        "batches and transactional append commits at scale",
        "third piece about locality sensitive hashing bands buckets "
        "and deterministic survivor selection rules",
    ]
    for b, t in enumerate(texts):
        pd.DataFrame([(b, t)], columns=["doc_id", "text"]).to_parquet(
            str(src / f"b{b}.parquet"), index=False)
        _time.sleep(0.05)

    t = stream_ingest_near_dup_filter(
        spark, str(src), str(tmp_path / "acc"), compact_every=3)
    assert sorted(r["doc_id"] for r in t.read().collect()) == [0, 1, 2]
    # 3 appended files compacted into fewer live ones (read() proves
    # the live set; on-disk old files await vacuum)
    live = t.read().inputFiles()
    assert len(live) < 3, live
    assert last_streaming_batch(t) == 2  # optimize commits skipped
    t2 = stream_ingest_near_dup_filter(
        spark, str(src), str(tmp_path / "acc"), compact_every=3)
    assert sorted(r["doc_id"] for r in t2.read().collect()) == [0, 1, 2]


def test_streaming_rollup_drops_late_events(spark, tmp_path):
    """Watermarked rollup in APPEND mode drops a straggler whose
    window was already finalized: batch 0 fills the 00:00 window and
    advances event time to 06:00 (watermark 04:00 from batch 1 on);
    batch 1's fresh event triggers eviction+emission of the 00:00
    window; batch 2 then delivers a 00:30 straggler — it must neither
    re-open the window nor emit a duplicate row.  (A late row whose
    window is STILL in state is merged — watermark semantics bound
    state, they don't reject rows while their window lives — which is
    why the eviction has to happen in an earlier batch.)"""
    import time as _time

    import pandas as pd

    from dagster_delta_spark.streaming.events import (
        hourly_rollup_stream,
        read_events_stream,
    )

    d = tmp_path / "ev"
    d.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def ev(eid, minutes):
        return (eid, t0 + pd.Timedelta(minutes=minutes), 1, "click",
                1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for fname, rows_ in (
        ("a.parquet", [ev(1, 10), ev(2, 20), ev(3, 360)]),  # H0 + 06:00
        ("b.parquet", [ev(5, 420)]),                        # 07:00 fresh
        ("c.parquet", [ev(4, 30)]),                         # 00:30 late
    ):
        pd.DataFrame(rows_, columns=cols).to_parquet(
            str(d / fname), index=False)
        _time.sleep(0.05)

    stream = hourly_rollup_stream(
        read_events_stream(spark, str(d), 1, glob="*.parquet"),
        watermark="2 hours",
    )
    name = "late_rollup_test"
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    h0 = pd.Timestamp("2024-01-01 00:00:00")
    h0_rows = [r["n_events"] for r in spark.table(name).collect()
               if r["window_start"] == h0]
    # exactly ONE emission of the 00:00 window, with only the two
    # on-time events; the straggler neither merged nor re-emitted
    assert h0_rows == [2], h0_rows
    # control: batch semantics over the same files count all three
    batch = (spark.read.parquet(str(d))
             .where("event_id IN (1, 2, 4)").count())
    assert batch == 3


def test_ingest_epoch_survives_checkpoint_reset(spark, tmp_path):
    """Micro-batch ids restart at 0 when the checkpoint is recreated:
    without the epoch namespace (r6 review), the old run's watermark
    silently SKIPPED the new run's low-numbered batches (new documents
    never ingested) and the self-bucket exclusion hid the old run's
    same-numbered accepted buckets from the probe (near-dups
    re-admitted)."""
    import os
    import shutil
    import time as _time

    import pandas as pd

    from dagster_delta_spark.streaming import stream_ingest_near_dup_filter

    src = tmp_path / "src"
    src.mkdir()
    texts = {
        1: "first document about distributed columnar query engines "
           "and their shuffle strategies at petabyte scale",
        2: "second piece on minhash banding locality sensitive hashing "
           "and deterministic survivor selection",
        3: "third text describing transactional commit logs parquet "
           "checkpoints and optimistic concurrency retries",
    }
    for i, (doc, t) in enumerate(texts.items()):
        pd.DataFrame([(doc, t)], columns=["doc_id", "text"]).to_parquet(
            str(src / f"a{i}.parquet"), index=False)
        _time.sleep(0.05)
    uri = str(tmp_path / "acc")
    t = stream_ingest_near_dup_filter(spark, str(src), uri,
                                      max_files_per_trigger=1)
    assert sorted(r["doc_id"] for r in t.read().collect()) == [1, 2, 3]

    # new run: checkpoint gone, source REPLACED by fewer, new files —
    # batch ids 0..1 collide with the old run's 0..2
    shutil.rmtree(uri + "/_stream_checkpoint")
    for f in src.glob("*.parquet"):
        os.remove(f)
    pd.DataFrame(
        [(4, "an entirely new document on salting skewed aggregation "
             "keys and adaptive query execution")],
        columns=["doc_id", "text"]).to_parquet(
        str(src / "b0.parquet"), index=False)
    _time.sleep(0.05)
    pd.DataFrame([(5, texts[1])],  # exact copy of accepted doc 1
                 columns=["doc_id", "text"]).to_parquet(
        str(src / "b1.parquet"), index=False)
    t2 = stream_ingest_near_dup_filter(spark, str(src), uri,
                                       max_files_per_trigger=1)
    got = sorted(r["doc_id"] for r in t2.read().collect())
    # doc 4 ingested (NOT skipped by the stale watermark); doc 5
    # dropped against the old epoch's accepted buckets (NOT re-admitted)
    assert got == [1, 2, 3, 4], got


def test_table_source_schema_evolution_and_starting_version(spark, tmp_path):
    """dds_table streams schema-evolved tables (early files' missing
    columns read as null — a bare select() previously raised) and
    honors startingVersion for consumers beginning past vacuumed
    history."""
    import uuid as _uuid

    from dagster_delta_spark import DeltaSparkTable, SchemaMode, WriteMode
    from dagster_delta_spark.streaming import DeltaSparkTableDataSource

    spark.dataSource.register(DeltaSparkTableDataSource)
    uri = str(tmp_path / "t")
    t = DeltaSparkTable(spark, uri)
    t.write(spark.createDataFrame([(1,)], "k long"), WriteMode.error)  # v0
    t.write(spark.createDataFrame([(2, "x")], "k long, s string"),
            WriteMode.append, schema_mode=SchemaMode.append)           # v1

    def run(**opts):
        name = f"ts_{_uuid.uuid4().hex[:8]}"
        reader = spark.readStream.format("dds_table").option("path", uri)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (reader.load().writeStream.format("memory").queryName(name)
             .outputMode("append").start())
        q.processAllAvailable()
        q.stop()
        return {(r["k"], r["s"]) for r in spark.table(name).collect()}

    assert run() == {(1, None), (2, "x")}
    assert run(startingVersion="1") == {(2, "x")}


def test_entry_guards_fire_on_violation(spark, tmp_path, monkeypatch):
    """The r7 self-falsifying registry entries must actually falsify:
    each recorded guard raises when its invariant is violated (a guard
    that cannot fire certifies nothing)."""
    import pytest

    import __spark_entry__ as entry
    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.operators import similarity

    sf = "/root/testdata/sf0.001"

    # --- ivf_quantized bit-parity guard: perturb the anchor ---
    real_anchor = similarity.ivf_ann_topk

    def skewed_anchor(spark_, sf_dir, *a, **kw):
        from pyspark.sql import functions as F
        return real_anchor(spark_, sf_dir, *a, **kw).withColumn(
            "vec_id", F.col("vec_id") + 1_000_000)

    monkeypatch.setattr(similarity, "ivf_ann_topk", skewed_anchor)
    with pytest.raises(AssertionError, match="diverged from ivf_ann_topk"):
        entry._ivf_quantized(spark, sf)
    monkeypatch.undo()

    # --- ivf_pq bit-parity guard: same perturbed anchor must fire ---
    monkeypatch.setattr(similarity, "ivf_ann_topk", skewed_anchor)
    with pytest.raises(AssertionError,
                       match="IVF-PQ full-rerank diverged"):
        entry._ivf_pq(spark, sf)
    monkeypatch.undo()

    # --- semantic_dedup planted-duplicate guard: keep everything ---
    real_sd = similarity.semantic_dedup

    def keep_all(spark_, sf_dir, *a, **kw):
        from pyspark.sql import functions as F
        return real_sd(spark_, sf_dir, *a, **kw).withColumn(
            "keep", F.lit(True))

    monkeypatch.setattr(similarity, "semantic_dedup", keep_all)
    with pytest.raises(AssertionError, match="planted exact duplicate"):
        entry._semantic_dedup(spark, sf)
    monkeypatch.undo()

    # --- ingest soundness: run the real stream once, then tamper ---
    src = entry.split_documents_fixture(sf)
    uri = str(tmp_path / "ingest")
    from dagster_delta_spark.streaming import stream_ingest_near_dup_filter

    t = stream_ingest_near_dup_filter(spark, src, uri,
                                      max_files_per_trigger=1)
    accepted = t.read().select("doc_id").localCheckpoint()
    entry._assert_ingest_soundness(spark, sf, uri, accepted, 3)  # healthy

    # disjointness violation: duplicate an accepted bucket row under a
    # second doc_id
    buckets = DeltaSparkTable(spark, uri + "_buckets")
    from pyspark.sql import functions as F
    one = buckets.read().limit(1).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000)
    buckets.write(one, WriteMode.append)
    with pytest.raises(AssertionError, match="bucket-colliding"):
        entry._assert_ingest_soundness(spark, sf, uri, accepted, 3)

    # witness violation: claim an accepted doc was rejected — it has
    # no collision witness by construction (it was accepted), so the
    # witness check must flag it.  (Restore a clean bucket table first
    # via time travel to version 1's state? simpler: new run dir.)
    uri2 = str(tmp_path / "ingest2")
    t2 = stream_ingest_near_dup_filter(spark, src, uri2,
                                       max_files_per_trigger=1)
    acc2 = t2.read().select("doc_id")
    victim = acc2.orderBy("doc_id").limit(1)
    with pytest.raises(AssertionError, match="without a|bucket-colliding"):
        entry._assert_ingest_soundness(
            spark, sf, uri2, acc2.subtract(victim).localCheckpoint(), 3)


def test_interval_join_cross_batch_and_late_drop(spark, tmp_path):
    """Stream-stream interval join semantics across micro-batches:
    (a) a purchase arriving a BATCH after its click still matches while
    the click is within the watermark (cross-batch join state works);
    (b) watermark-driven state EVICTION is observable (numRowsRemoved),
    and a late row arriving after its partner's state was evicted
    loses the match — the documented divergence from the batch twin,
    asserted against the batch join over the same files.  (A late row
    arriving in the SAME batch the eviction runs in may still match —
    Spark matches input before cleanup; only boundedness is
    guaranteed, which is why the late file here trails the eviction
    batch.)"""
    import time as _time

    import pandas as pd

    from dagster_delta_spark.streaming.events import (
        read_events_stream,
        interval_join_stream,
    )
    from pyspark.sql import functions as F

    d = tmp_path / "ev"
    d.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def ev(eid, minutes, etype):
        return (eid, t0 + pd.Timedelta(minutes=minutes), 1, etype,
                1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for fname, rows_ in (
        # click@00:00 matches purchase@01:00 in-batch; purchase@40h
        # advances the purchase-side event time
        ("a.parquet", [ev(1, 0, "click"), ev(2, 60, "purchase"),
                       ev(3, 2400, "purchase")]),
        # click@41h advances the CLICK-side event time (global
        # watermark = min over both sides -> 32 h from here on)
        ("b.parquet", [ev(5, 2460, "click")]),
        # under watermark 32 h this batch evicts click1's state
        # (click_ts + 4 h < wm); purchase@42h matches the previous
        # batch's click@41h (cross-batch state)
        ("c.parquet", [ev(6, 2520, "purchase")]),
        # purchase@02:00 is inside click1's 4 h window but arrives
        # after the eviction batch -> match lost
        ("d.parquet", [ev(4, 120, "purchase")]),
    ):
        pd.DataFrame(rows_, columns=cols).to_parquet(
            str(d / fname), index=False)
        _time.sleep(0.05)

    def side(etype, prefix):
        return (
            read_events_stream(spark, str(d), 1, glob="*.parquet")
            .where(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix[0]}_user_id"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("value").alias(f"{prefix}_value"),
            )
        )

    name = "ivj_semantics_test"
    q = (
        interval_join_stream(side("click", "click"),
                             side("purchase", "purchase"),
                             upper="4 hours", watermark="8 hours")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    q.processAllAvailable()
    removed = sum(
        so["numRowsRemoved"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    q.stop()
    got = sorted((r["click_id"], r["purchase_id"])
                 for r in spark.table(name).collect())
    assert got == [(1, 2), (5, 6)], got
    # watermark-driven eviction actually ran (bounded join state)
    assert removed > 0

    # batch control over the same files: the lost late pair exists
    # (same ts normalization as read_events_stream — the session's
    # nanosAsLong conf makes the raw batch read yield bigint)
    ev_all = spark.read.parquet(str(d))
    ts_type = dict(ev_all.dtypes)["ts"]
    if ts_type == "bigint":
        ev_all = ev_all.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    elif ts_type == "timestamp_ntz":
        ev_all = ev_all.withColumn("ts", F.col("ts").cast("timestamp"))
    batch = (
        ev_all.where("event_type = 'click'").alias("c")
        .join(
            ev_all.where("event_type = 'purchase'").alias("p"),
            F.expr("c.user_id = p.user_id AND p.ts >= c.ts"
                   " AND p.ts <= c.ts + INTERVAL 4 HOURS"),
        )
        .select(F.col("c.event_id").alias("a"),
                F.col("p.event_id").alias("b"))
    )
    assert sorted((r["a"], r["b"]) for r in batch.collect()) == [
        (1, 2), (1, 4), (5, 6)]


def test_sliding_rollup_overlap_invariant(spark):
    """Sliding 2 h / 1 h windows count every event exactly
    width/slide = 2 times, and each window's count equals the batch
    filter over its [start, start+2h) range (spot-checked)."""
    from dagster_delta_spark.streaming.events import run_sliding_rollup_once
    from dagster_delta_spark.operators.relational import load_events
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = run_sliding_rollup_once(spark, sf, "sliding_inv_test")
    ev = load_events(spark, sf)
    n_events = ev.count()
    assert out.agg(F.sum("n_events")).first()[0] == 2 * n_events

    w = out.orderBy(F.desc("n_events")).limit(1).collect()[0]
    batch_n = ev.where(
        (F.col("event_type") == w["event_type"])
        & (F.col("ts") >= w["window_start"])
        & (F.col("ts") < w["window_start"] + F.expr("INTERVAL 2 HOURS"))
    ).count()
    assert batch_n == w["n_events"]


def test_index_maintaining_sink_composition(spark, tmp_path):
    """The exactly-once append + CDC index fold composition, driven
    batch-by-batch: after 3 batches the index equals a from-scratch
    build; a replayed batch changes nothing; an external rewrite of
    the table fails the next batch loudly (rebuild, not silent ghost
    rows)."""
    import pytest

    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.operators.incremental import (
        lsh_index_vs_rebuild,
    )
    from dagster_delta_spark.streaming import index_maintaining_sink

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    t_uri, i_uri = str(tmp_path / "t"), str(tmp_path / "i")
    sink = index_maintaining_sink(t_uri, i_uri, "app")
    for b in range(3):
        sink(docs.where(f"doc_id % 3 = {b}"), b)
    t = DeltaSparkTable(spark, t_uri)
    idx = DeltaSparkTable(spark, i_uri)
    assert t.read().count() == docs.count()
    assert lsh_index_vs_rebuild(t, idx).count() == 0
    n, ni = t.read().count(), idx.read().count()
    sink(docs.where("doc_id % 3 = 2"), 2)  # post-crash replay
    assert t.read().count() == n and idx.read().count() == ni
    t.write(docs.where("doc_id < 50"), WriteMode.overwrite)
    with pytest.raises(ValueError):
        sink(docs.where("doc_id % 3 = 0"), 3)


def test_streaming_index_sink_entry_guard_fires(spark, monkeypatch):
    """A maintenance path that silently skips folding must trip the
    entry's rebuild-parity guard."""
    import pytest

    import __spark_entry__ as entry
    from dagster_delta_spark.operators import incremental as incr

    monkeypatch.setattr(incr, "maintain_lsh_index",
                        lambda docs, index, since_version=None: 0)
    with pytest.raises(AssertionError, match="diverged"):
        entry._streaming_index_sink(spark, "/root/testdata/sf0.001")


def test_streaming_left_outer_interval_join(spark, tmp_path):
    """The left-outer runner emits a COMPLETE result: matched rows
    equal the inner join, unmatched clicks emit exactly once with null
    purchase columns (eviction-driven by the sentinel-advanced
    watermark), and out-of-window purchases do NOT match."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.streaming.events import (
        run_interval_join_left_once,
    )

    dd = tmp_path / "sjl"
    dd.mkdir()
    rows = [
        # user 1: click with an in-window purchase (2h later)
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, None),
        (2, "2024-01-01 12:00:00", 1, "purchase", 5.0, None),
        # user 2: click with an OUT-of-window purchase (5h later)
        (3, "2024-01-01 10:00:00", 2, "click", 2.0, None),
        (4, "2024-01-01 15:00:00", 2, "purchase", 6.0, None),
        # user 3: click with no purchase at all
        (5, "2024-01-01 10:00:00", 3, "click", 3.0, None),
        # user 4: purchase BEFORE the click (no match)
        (6, "2024-01-01 09:00:00", 4, "purchase", 7.0, None),
        (7, "2024-01-01 10:00:00", 4, "click", 4.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(dd / "events.parquet"))

    got = {
        (r["click_id"], r["purchase_id"])
        for r in run_interval_join_left_once(
            spark, str(dd), table_name="sjl_test").collect()
    }
    assert got == {(1, 2), (3, None), (5, None), (7, None)}


def test_streaming_full_outer_interval_join(spark, tmp_path):
    """FULL OUTER: matched rows, unmatched clicks AND unmatched
    purchases all emit exactly once; user_id coalesces across sides."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.streaming.events import (
        run_interval_join_full_once,
    )

    dd = tmp_path / "sjf"
    dd.mkdir()
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, None),
        (2, "2024-01-01 12:00:00", 1, "purchase", 5.0, None),  # match
        (3, "2024-01-01 10:00:00", 2, "click", 2.0, None),     # no p
        (4, "2024-01-01 03:00:00", 3, "purchase", 6.0, None),  # no c
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(dd / "events.parquet"))

    got = {
        (r["click_id"], r["purchase_id"], r["user_id"])
        for r in run_interval_join_full_once(
            spark, str(dd), table_name="sjf_test").collect()
    }
    assert got == {(1, 2, 1), (3, None, 2), (None, 4, 3)}


def test_rollup_maintaining_sink_composition(spark, tmp_path):
    """Streaming materialized view: exactly-once append + incremental
    rollup fold per batch, resuming from the rollup's own metadata.
    After 3 batches the rollup equals a full recompute; a replayed
    batch changes nothing; a merge-on-read delete issued between
    batches folds into the next maintenance as negative partials."""
    from dagster_delta_spark import DeltaSparkTable
    from dagster_delta_spark.operators.incremental import (
        rollup_vs_recompute,
    )
    from dagster_delta_spark.streaming import rollup_maintaining_sink

    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_returnflag", "l_quantity")
    measures = {
        "total": "SUM(CAST(l_quantity AS DECIMAL(30,10)))",
        "n": "COUNT(*)",
    }
    t_uri, r_uri = str(tmp_path / "t"), str(tmp_path / "r")
    sink = rollup_maintaining_sink(
        t_uri, r_uri, "app", ["l_returnflag"], measures, count_col="n")
    for b in range(3):
        sink(li.where(f"l_orderkey % 3 = {b}"), b)
    t = DeltaSparkTable(spark, t_uri)
    roll = DeltaSparkTable(spark, r_uri)
    assert t.read().count() == li.count()
    assert rollup_vs_recompute(t, roll, ["l_returnflag"],
                               measures).count() == 0
    n, state = t.read().count(), sorted(
        map(tuple, roll.read().collect()))
    sink(li.where("l_orderkey % 3 = 2"), 2)  # post-crash replay
    assert t.read().count() == n
    assert sorted(map(tuple, roll.read().collect())) == state
    # out-of-band merge-on-read correction folds on the next batch
    t.delete("l_quantity >= 45", use_dv=True)
    sink(li.limit(0), 3)  # empty batch still maintains
    assert rollup_vs_recompute(t, roll, ["l_returnflag"],
                               measures).count() == 0


def test_sink_periodic_compaction_bounds_files(spark, tmp_path):
    """compact_every on the maintained sinks folds per-batch file
    fragments (and accumulated DV masks) without disturbing feeds,
    rollup parity, or replica convergence."""
    from dagster_delta_spark import DeltaSparkTable
    from dagster_delta_spark.operators.incremental import (
        rollup_vs_recompute,
    )
    from dagster_delta_spark.streaming import rollup_maintaining_sink

    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_returnflag", "l_quantity")
    measures = {"total": "SUM(CAST(l_quantity AS DECIMAL(30,10)))",
                "n": "COUNT(*)"}
    t_uri, r_uri = str(tmp_path / "t"), str(tmp_path / "r")
    sink = rollup_maintaining_sink(
        t_uri, r_uri, "app", ["l_returnflag"], measures,
        count_col="n", compact_every=3)
    for b in range(6):
        sink(li.where(f"l_orderkey % 6 = {b}"), b)
    t = DeltaSparkTable(spark, t_uri)
    roll = DeltaSparkTable(spark, r_uri)
    assert t.read().count() == li.count()
    assert rollup_vs_recompute(t, roll, ["l_returnflag"],
                               measures).count() == 0
    # two compactions ran; file count stays bounded
    hist_ops = [h.get("operation", "") for h in t.history()]
    assert sum(1 for o in hist_ops if o.startswith("OPTIMIZE")) == 2
    assert len(t.snapshot().files) <= 4


def test_auto_ingest_incremental_and_replay(spark, tmp_path):
    """auto_ingest_once: re-runs with one checkpoint ingest only new
    landing files; a hand-replayed micro-batch no-ops (txn ledger)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dagster_delta_spark import DeltaSparkTable
    from dagster_delta_spark.streaming import auto_ingest_once

    land = str(tmp_path / "land")
    import os
    os.makedirs(land)
    df = spark.range(30).select(F.col("id").alias("k"),
                                (F.col("id") % 3).alias("p"))
    entry._stage_landing_file(df.where("k < 20"), land, "a.parquet")
    uri, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    r1 = auto_ingest_once(spark, land, uri, ckpt, "ai",
                          schema=df.schema, max_files_per_trigger=1,
                          partition_columns=["p"])
    assert r1["rows_ingested"] == 20
    t = DeltaSparkTable(spark, uri)
    assert list(t.snapshot().partition_columns) == ["p"]
    entry._stage_landing_file(df.where("k >= 20"), land, "b.parquet")
    r2 = auto_ingest_once(spark, land, uri, ckpt, "ai",
                          schema=df.schema)
    assert r2["rows_ingested"] == 10 and t.read().count() == 30
    # post-crash at-least-once replay of the last batch: ledger no-ops
    last = t.last_txn_version("ai")
    redo = t.idempotent_append(df.where("k >= 20"), "ai", last)
    assert redo["skipped"] and t.read().count() == 30


def test_auto_ingest_timeout_stops_and_raises(spark, tmp_path, monkeypatch):
    """auto_ingest_once on an awaitTermination timeout must STOP the
    query and raise, not count rows under a live stream (r12 ADVICE
    fix — the boolean result used to be ignored, leaking the query
    and under-reporting rows_ingested)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQuery

    import __spark_entry__ as entry
    from dagster_delta_spark.streaming import auto_ingest_once

    land = str(tmp_path / "land")
    os.makedirs(land)
    df = spark.range(10).select(F.col("id").alias("k"))
    entry._stage_landing_file(df, land, "a.parquet")

    stopped = []
    real_await = StreamingQuery.awaitTermination
    monkeypatch.setattr(
        StreamingQuery, "awaitTermination",
        lambda self, timeout=None: False)
    real_stop = StreamingQuery.stop
    monkeypatch.setattr(
        StreamingQuery, "stop",
        lambda self: (stopped.append(True), real_stop(self))[1])

    import pytest as _pytest
    with _pytest.raises(TimeoutError, match="did not finish"):
        auto_ingest_once(
            spark, land, str(tmp_path / "t"), str(tmp_path / "ck"),
            "ai_to", schema=df.schema, timeout_s=1)
    assert stopped, "timeout path must stop the leaked query"
    monkeypatch.setattr(StreamingQuery, "awaitTermination", real_await)
    monkeypatch.setattr(StreamingQuery, "stop", real_stop)
