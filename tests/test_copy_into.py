"""COPY INTO — file-level exactly-once batch ingest
(table.py:copy_into).  Each landing file is recorded in the
SetTransaction ledger (dds.copyInto:<sha1(path)> -> a fingerprint
of (mtime_ns, size)), so
re-runs skip already-loaded files; the re-check runs inside write()'s
commit retry loop so racing jobs cannot double-load."""

import os
import time

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark import DeltaSparkTable, WriteMode, SchemaMode
from dagster_delta_spark import tablelog
from dagster_delta_spark.tablelog import ConcurrentAppendError


def _land(spark, d, name, lo, hi, extra_col=False):
    """Write one single-file parquet landing file [lo, hi) under d
    (the shared staging helper — one convention, fixed in one place)."""
    import __spark_entry__ as entry

    df = spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    if extra_col:
        df = df.withColumn("tag", F.lit("x"))
    return entry._stage_landing_file(df, d, name)


def test_copy_into_loads_once(spark, tmp_table, tmp_path):
    land = str(tmp_path / "landing")
    os.makedirs(land)
    _land(spark, land, "a.parquet", 0, 10)
    _land(spark, land, "b.parquet", 10, 30)
    t = DeltaSparkTable(spark, tmp_table)

    r1 = t.copy_into(land)
    assert r1["files_loaded"] == 2 and r1["files_skipped"] == 0
    assert r1["num_output_rows"] == 30
    assert t.read().count() == 30

    # rerun: everything skips, no new version
    v = t.version()
    r2 = t.copy_into(land)
    assert r2["files_loaded"] == 0 and r2["files_skipped"] == 2
    assert t.version() == v and t.read().count() == 30

    # new landing file: only it loads
    _land(spark, land, "c.parquet", 30, 35)
    r3 = t.copy_into(land)
    assert r3["files_loaded"] == 1 and r3["files_skipped"] == 2
    assert t.read().count() == 35
    # exactly-once per row
    assert t.read().groupBy("k").count().where("count > 1").count() == 0


def test_copy_into_explicit_list_and_pattern(spark, tmp_table, tmp_path):
    land = str(tmp_path / "landing")
    os.makedirs(land)
    pa = _land(spark, land, "a.parquet", 0, 5)
    _land(spark, land, "b.other", 5, 8)
    t = DeltaSparkTable(spark, tmp_table)
    r = t.copy_into(land, pattern="*.parquet")
    assert r["files_loaded"] == 1 and t.read().count() == 5
    # explicit list form
    r2 = t.copy_into([pa])
    assert r2["files_loaded"] == 0 and r2["files_skipped"] == 1


def test_copy_into_hidden_files_skipped(spark, tmp_table, tmp_path):
    land = str(tmp_path / "landing")
    os.makedirs(land)
    _land(spark, land, "a.parquet", 0, 5)
    p = _land(spark, land, "z.parquet", 5, 9)
    os.replace(p, os.path.join(land, "_hidden.parquet"))
    os.makedirs(os.path.join(land, ".cache"))
    t = DeltaSparkTable(spark, tmp_table)
    r = t.copy_into(land)
    assert r["files_loaded"] == 1 and t.read().count() == 5


def test_copy_into_modified_file_raises_then_force(
        spark, tmp_table, tmp_path):
    land = str(tmp_path / "landing")
    os.makedirs(land)
    p = _land(spark, land, "a.parquet", 0, 10)
    t = DeltaSparkTable(spark, tmp_table)
    t.copy_into(land)
    # modify in place (rewrite with different rows, bump mtime)
    _land(spark, land, "a.parquet", 100, 105)
    os.utime(p, ns=(time.time_ns(), time.time_ns() + 5_000_000_000))
    with pytest.raises(ValueError, match="modified since ingest"):
        t.copy_into(land)
    r = t.copy_into(land, force=True)
    assert r["files_loaded"] == 1
    # force re-loaded: old rows + new rows both present (append)
    assert t.read().count() == 15
    # ledger re-recorded the new mtime: a plain rerun skips again
    r2 = t.copy_into(land)
    assert r2["files_loaded"] == 0 and r2["files_skipped"] == 1


def test_copy_into_force_backwards_mtime(spark, tmp_table, tmp_path):
    """FORCE re-records even an OLDER mtime (last-write-wins replay:
    max-folding would pin the newer one and every later run would see
    a phantom modification)."""
    land = str(tmp_path / "landing")
    os.makedirs(land)
    p = _land(spark, land, "a.parquet", 0, 4)
    t = DeltaSparkTable(spark, tmp_table)
    t.copy_into(land)
    past = time.time_ns() - 3600 * 10**9
    os.utime(p, ns=(past, past))
    r = t.copy_into(land, force=True)
    assert r["files_loaded"] == 1
    # the cached snapshot AND a cold replay both see the older mtime
    tablelog._SNAPSHOT_CACHE.clear()
    r2 = t.copy_into(land)
    assert r2["files_loaded"] == 0 and r2["files_skipped"] == 1


def test_copy_into_dry_run(spark, tmp_table, tmp_path):
    land = str(tmp_path / "landing")
    os.makedirs(land)
    _land(spark, land, "a.parquet", 0, 5)
    t = DeltaSparkTable(spark, tmp_table)
    r = t.copy_into(land, dry_run=True)
    assert r == {"dry_run": True, "files_loaded": 1,
                 "files_skipped": 0, "version": -1}
    assert not t.exists()


def test_copy_into_empty_and_missing_sources(spark, tmp_table, tmp_path):
    """An emptied landing zone (loaded files archived away) is the
    ROUTINE state of a restartable ingest — a no-op run; a missing
    directory or an empty explicit list is a caller bug and raises."""
    land = str(tmp_path / "landing")
    os.makedirs(land)
    t = DeltaSparkTable(spark, tmp_table)
    r = t.copy_into(land)  # empty dir before any load: no-op
    assert r == {"version": -1, "files_loaded": 0,
                 "files_skipped": 0, "num_output_rows": 0}
    assert not t.exists()
    # load a file, archive it away, rerun: still a no-op
    p = _land(spark, land, "a.parquet", 0, 5)
    t.copy_into(land)
    os.unlink(p)
    r2 = t.copy_into(land)
    assert r2["files_loaded"] == 0 and t.read().count() == 5
    with pytest.raises(FileNotFoundError, match="does not exist"):
        t.copy_into(str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="empty explicit"):
        t.copy_into([])


def test_copy_into_same_mtime_different_size_detected(
        spark, tmp_table, tmp_path):
    """The ledger fingerprints (mtime_ns, size): a content rewrite
    that preserves the timestamp still raises the modified-file
    error instead of silently skipping."""
    land = str(tmp_path / "landing")
    os.makedirs(land)
    p = _land(spark, land, "a.parquet", 0, 10)
    st = os.stat(p)
    t = DeltaSparkTable(spark, tmp_table)
    t.copy_into(land)
    _land(spark, land, "a.parquet", 100, 120)  # different size
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))  # restore mtime
    with pytest.raises(ValueError, match="modified since ingest"):
        t.copy_into(land)


def test_copy_into_schema_evolution(spark, tmp_table, tmp_path):
    land = str(tmp_path / "landing")
    os.makedirs(land)
    _land(spark, land, "a.parquet", 0, 5)
    t = DeltaSparkTable(spark, tmp_table)
    t.copy_into(land)
    _land(spark, land, "b.parquet", 5, 8, extra_col=True)
    # strict mode refuses the widened file
    from dagster_delta_spark.table import SchemaMismatchError
    with pytest.raises(SchemaMismatchError):
        t.copy_into(land)
    r = t.copy_into(land, schema_mode=SchemaMode.append)
    assert r["files_loaded"] == 1
    out = t.read()
    assert set(out.columns) == {"k", "v", "tag"}
    assert out.where(F.col("tag").isNull()).count() == 5


def test_copy_into_ledger_survives_checkpoint(spark, tmp_table, tmp_path):
    land = str(tmp_path / "landing")
    os.makedirs(land)
    _land(spark, land, "a.parquet", 0, 5)
    t = DeltaSparkTable(spark, tmp_table)
    t.copy_into(land)
    # push the log past a checkpoint boundary
    small = spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v"))
    for _ in range(tablelog.CHECKPOINT_INTERVAL + 1):
        t.write(small, WriteMode.append)
    tablelog._SNAPSHOT_CACHE.clear()
    r = t.copy_into(land)
    assert r["files_loaded"] == 0 and r["files_skipped"] == 1


def test_copy_into_concurrent_ledger_guard(spark, tmp_table, tmp_path):
    """A racing copy_into that loaded the same file between discovery
    and commit trips the in-loop ledger re-check."""
    land = str(tmp_path / "landing")
    os.makedirs(land)
    p = _land(spark, land, "a.parquet", 0, 5)
    t = DeltaSparkTable(spark, tmp_table)
    t.write(spark.range(1).select(F.col("id").alias("k"),
                                  F.col("id").alias("v")),
            WriteMode.error)
    # simulate the race: the rival's ledger entry lands first (a bare
    # txn commit, exactly what the rival's copy_into would publish)
    import hashlib
    key = (tablelog.COPY_INTO_APP_PREFIX
           + hashlib.sha1(os.path.abspath(p).encode()).hexdigest())
    head = tablelog.latest_version(t.table_uri)
    tablelog.commit(
        t.table_uri, head + 1,
        [{"commitInfo": {"operation": "WRITE append",
                         "timestamp": int(time.time() * 1000)}},
         {"txn": {"appId": key, "version": 999}}],
        None,
    )
    df = spark.read.parquet(p)
    with pytest.raises(ConcurrentAppendError, match="copy_into"):
        # discovery saw no entry (expected None), but the fresh head
        # now has one — the in-loop guard must refuse
        t.write(df, WriteMode.append,
                _copy_txns={key: 1},
                _copy_txns_expected={key: None})


def test_copy_into_two_threads_exactly_once(spark, tmp_table, tmp_path):
    """Two REAL driver threads race the same landing directory: the
    put-if-absent commit + the in-loop ledger re-check guarantee each
    file's rows land exactly once — the loser raises
    ConcurrentAppendError and its rerun skips everything."""
    import threading

    land = str(tmp_path / "landing")
    os.makedirs(land)
    _land(spark, land, "a.parquet", 0, 50)
    _land(spark, land, "b.parquet", 50, 120)
    t = DeltaSparkTable(spark, tmp_table)
    results, errors = [], []

    def worker():
        for _ in range(5):  # retry loop: rerun after a lost race
            try:
                results.append(t.copy_into(land))
                return
            except ConcurrentAppendError:
                continue
        errors.append("retries exhausted")

    threads = [threading.Thread(target=worker) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert len(results) == 2
    # exactly-once: 120 rows total, no key duplicated
    out = t.read()
    assert out.count() == 120
    assert out.groupBy("k").count().where("count > 1").count() == 0
    assert sum(r["files_loaded"] for r in results) == 2


def test_copy_into_partitioned_table(spark, tmp_table, tmp_path):
    """Ingest into a hive-partitioned table: staged files land under
    the partition dirs and pruning sees them."""
    land = str(tmp_path / "landing")
    os.makedirs(land)
    _land(spark, land, "a.parquet", 0, 12)
    t = DeltaSparkTable(spark, tmp_table)
    base = spark.range(100, 103).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t.write(base.withColumn("p", F.col("k") % 2),
            WriteMode.error, partition_columns=["p"])
    # landing file lacks p? it must conform... stage it WITH p
    os.unlink(os.path.join(land, "a.parquet"))
    import __spark_entry__ as entry
    entry._stage_landing_file(
        spark.range(12).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            (F.col("id") % 2).alias("p")),
        land, "a.parquet")
    r = t.copy_into(land)
    assert r["files_loaded"] == 1
    assert t.read().count() == 15
    snap = t.snapshot()
    pruned = t.pruned_files(snap, [("p", "=", "1")])
    assert all(f.partition_values.get("p") == "1" for f in pruned)
    assert t.read(dnf=[("p", "=", 1)]).count() == 7


def test_copy_into_force_reloads_unmodified(spark, tmp_table, tmp_path):
    """Delta COPY INTO FORCE semantics: force=True re-loads EVERY
    offered file, including ones whose fingerprint still matches the
    ledger (r12 ADVICE fix — the rec == fp skip used to win before
    the force branch, silently partial-reloading)."""
    land = str(tmp_path / "landing")
    os.makedirs(land)
    _land(spark, land, "a.parquet", 0, 10)
    _land(spark, land, "b.parquet", 10, 14)
    t = DeltaSparkTable(spark, tmp_table)
    t.copy_into(land)
    assert t.read().count() == 14
    r = t.copy_into(land, force=True)
    assert r["files_loaded"] == 2 and r["files_skipped"] == 0
    assert t.read().count() == 28
    # ledger still consistent afterwards: a plain rerun skips both
    r2 = t.copy_into(land)
    assert r2["files_loaded"] == 0 and r2["files_skipped"] == 2
