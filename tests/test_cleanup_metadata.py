"""Log retention (table.py:cleanup_metadata + tablelog.cleanup_log) —
Delta's delta.logRetentionDuration analogue: expire commit JSON and
superseded checkpoints below the newest eligible checkpoint, keeping
every version >= the boundary fully replayable."""

import os
import time

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark import tablelog
from dagster_delta_spark.tablelog import LogTruncatedError


def _grow(spark, tmp_table, commits=25):
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.range(2).select(F.col("id").alias("k"),
                               F.col("id").alias("v"))
    t.write(df, WriteMode.error)
    for _ in range(commits - 1):
        t.write(df, WriteMode.append)
    return t


def test_cleanup_truncates_below_newest_checkpoint(spark, tmp_table):
    t = _grow(spark, tmp_table, 25)  # versions 0..24, ckpts at 10, 20
    head = t.version()
    assert head == 24
    time.sleep(0.05)
    res = t.cleanup_metadata(retention_ms=0)
    assert res["boundary_version"] == 20
    assert res["deleted_commits"] == 20  # v0..v19
    assert res["deleted_checkpoints"] == 1  # the v10 checkpoint

    # the head and everything >= the boundary stay fully readable
    assert t.read().count() == 50
    assert t.read(version=20).count() == 42
    assert t.read(version=24).count() == 50
    assert t.exists()
    assert tablelog.earliest_version(t.table_uri) == 20

    # below the boundary: pointed truncation error, not FileNotFound
    with pytest.raises(LogTruncatedError, match="earliest available"):
        t.read(version=5)
    with pytest.raises(LogTruncatedError):
        t.restore(3)

    # history ends at the boundary
    h = tablelog.history(t.table_uri)
    assert [i["version"] for i in h] == [24, 23, 22, 21, 20]

    # rerun is a no-op (idempotent)
    res2 = t.cleanup_metadata(retention_ms=0)
    assert res2["deleted_commits"] == 0 and res2["deleted_checkpoints"] == 0


def test_cleanup_respects_retention_window(spark, tmp_table):
    t = _grow(spark, tmp_table, 25)
    res = t.cleanup_metadata()  # default 30 days: nothing is old enough
    assert res["boundary_version"] is None
    assert res["deleted_commits"] == 0
    assert t.read(version=0).count() == 2


def test_cleanup_dry_run(spark, tmp_table):
    t = _grow(spark, tmp_table, 25)
    time.sleep(0.05)
    res = t.cleanup_metadata(retention_ms=0, dry_run=True)
    assert res["dry_run"] and res["boundary_version"] == 20
    assert res["deleted_commits"] == 20
    # nothing actually deleted
    assert t.read(version=0).count() == 2
    assert tablelog.earliest_version(t.table_uri) == 0


def test_cleanup_honors_cdc_retention_floor(spark, tmp_table):
    t = _grow(spark, tmp_table, 25)
    t.set_properties({"dds.cdcRetainVersions": "10"})  # head now 25
    time.sleep(0.05)
    res = t.cleanup_metadata(retention_ms=0)
    # head=25, floor=10 -> limit 15 -> newest eligible checkpoint is 10
    assert res["boundary_version"] == 10
    # the whole protected window decodes
    assert t.read_changes(starting_version=15).count() > 0
    # and vacuum's floor walk still works over its protected window
    t.vacuum(retention_ms=0)
    assert t.read().count() == 50


def test_cleanup_read_changes_below_boundary_pointed(spark, tmp_table):
    t = _grow(spark, tmp_table, 25)
    time.sleep(0.05)
    t.cleanup_metadata(retention_ms=0)
    with pytest.raises(LogTruncatedError, match="cleanup_metadata"):
        t.read_changes(starting_version=3).count()
    # at/above the boundary the feed works
    assert t.read_changes(starting_version=20).count() == 8


def test_cleanup_invalidates_cached_snapshots(spark, tmp_table):
    t = _grow(spark, tmp_table, 25)
    assert t.read(version=5).count() == 12  # warm the snapshot cache
    time.sleep(0.05)
    t.cleanup_metadata(retention_ms=0)
    with pytest.raises(LogTruncatedError):
        t.read(version=5)  # the cache must not serve the dead version


def test_cleanup_malformed_floor_refuses(spark, tmp_table):
    t = _grow(spark, tmp_table, 3)
    # corrupt the floor property directly in a fresh commit
    head = tablelog.latest_version(t.table_uri)
    snap = tablelog.load_snapshot(t.table_uri)
    meta = snap.metadata
    bad = dict(meta.configuration)
    bad["dds.cdcRetainVersions"] = "soon"
    from dagster_delta_spark.tablelog import Metadata
    tablelog.commit(t.table_uri, head + 1, [
        {"commitInfo": {"operation": "SET TBLPROPERTIES",
                        "timestamp": int(time.time() * 1000)}},
        Metadata(schema_json=meta.schema_json,
                 partition_columns=list(meta.partition_columns),
                 configuration=bad,
                 table_id=meta.table_id,
                 created_time=meta.created_time).to_action(),
    ], None)
    with pytest.raises(ValueError, match="malformed"):
        t.cleanup_metadata(retention_ms=0)


def test_streaming_resume_below_boundary_pointed(spark, tmp_table):
    """A dds_table stream whose checkpoint points below the cleanup
    boundary fails with the truncation error, not a raw
    FileNotFoundError."""
    t = _grow(spark, tmp_table, 25)
    time.sleep(0.05)
    t.cleanup_metadata(retention_ms=0)
    with pytest.raises(LogTruncatedError):
        tablelog.read_version_actions(t.table_uri, 2)


def test_describe_detail_reports_earliest_version(spark, tmp_table):
    t = _grow(spark, tmp_table, 25)
    assert t.describe_detail()["earliestVersion"] == 0
    time.sleep(0.05)
    t.cleanup_metadata(retention_ms=0)
    d = t.describe_detail()
    assert d["earliestVersion"] == 20 and d["version"] == 24
