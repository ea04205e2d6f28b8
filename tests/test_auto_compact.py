"""Delta autoOptimize analogues: dds.optimizeWrite (one file per hive
partition per write) and dds.autoCompact (post-commit synchronous
OPTIMIZE when small files accumulate)."""

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark import (
    DeltaSparkTable,
    MergeConfig,
    MergeType,
    WriteMode,
    tablelog,
)

AC_CFG = {
    "dds.autoCompact": "true",
    "dds.autoCompact.minFiles": "8",
    "dds.autoCompact.targetFileSize": str(1 << 20),
}


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p"))


def test_auto_compact_triggers_and_preserves_rows(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(_df(spark, 0, 10).repartition(4), WriteMode.error,
            table_configuration=AC_CFG)
    for i in range(1, 4):
        res = t.write(_df(spark, i * 10, i * 10 + 10).repartition(4),
                      WriteMode.append)
    # 16 small files accumulated >= minFiles=8 -> the last write
    # reports its follow-up compaction
    assert res.get("auto_compacted_files", 0) > 0
    assert res["auto_compact_version"] == res["version"] + 1
    assert len(t.snapshot().files) < 16
    assert tablelog.history(t.table_uri, 1)[0]["operation"] == "OPTIMIZE"
    assert t.read().count() == 40
    assert t.read().agg(F.sum("k")).head()[0] == sum(range(40))


def test_auto_compact_below_threshold_is_silent(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(_df(spark, 0, 10).repartition(4), WriteMode.error,
            table_configuration=AC_CFG)
    res = t.write(_df(spark, 10, 12).repartition(2), WriteMode.append)
    assert "auto_compact_version" not in res  # 6 files < minFiles=8
    assert len(t.snapshot().files) == 6


def test_auto_compact_after_merge(spark, tmp_table):
    # small files must come from WRITES the merge does not touch: the
    # single-pass merge rewrite coalesces its own output (the former
    # per-branch union used to emit one partition set per branch), so
    # the compaction trigger needs pre-existing small files whose key
    # ranges the merge's discovery pruning leaves alone
    t = DeltaSparkTable(spark, tmp_table)
    t.write(_df(spark, 0, 20).repartition(4), WriteMode.error,
            table_configuration=AC_CFG)
    t.write(_df(spark, 100, 180).repartition(3), WriteMode.append)
    # 7 small files < minFiles=8 so far; the merge's own write is the
    # 8th and its post-commit hook must fire
    src = _df(spark, 200, 215).repartition(5)
    res = t.merge(src, MergeConfig(MergeType.upsert, predicate="s.k = t.k"))
    assert res.get("auto_compact_version") is not None
    assert t.read().count() == 115


def test_auto_compact_validation(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(_df(spark, 0, 5), WriteMode.error)
    with pytest.raises(ValueError, match="minFiles"):
        t.set_properties({"dds.autoCompact": "true",
                          "dds.autoCompact.minFiles": "1"})
    with pytest.raises(ValueError, match="integers"):
        t.set_properties({"dds.autoCompact": "true",
                          "dds.autoCompact.targetFileSize": "big"})
    # knobs without autoCompact=true are inert and legal
    t.set_properties({"dds.autoCompact.minFiles": "10"})


def test_optimize_write_one_file_per_partition(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    cfg = {"dds.optimizeWrite": "true"}
    t.write(_df(spark, 0, 1000).repartition(8), WriteMode.error,
            partition_columns=["p"], table_configuration=cfg)
    by_part: dict = {}
    for a in t.snapshot().files:
        by_part.setdefault(a.partition_values["p"], 0)
        by_part[a.partition_values["p"]] += 1
    assert set(by_part) == {"0", "1", "2", "3"}
    assert all(n == 1 for n in by_part.values()), by_part
    assert t.read().count() == 1000
    # control: without the property the same write fans out
    t2 = DeltaSparkTable(spark, tmp_table + "-ctl")
    t2.write(_df(spark, 0, 1000).repartition(8), WriteMode.error,
             partition_columns=["p"])
    assert len(t2.snapshot().files) > 4


def test_auto_compact_in_streaming_sink_path(spark, tmp_table):
    """idempotent_append (the exactly-once foreachBatch core) fires
    the same post-commit compaction — the streaming small-file
    treadmill handled at the table — and the change feed still reads
    a pure delta (compaction commits are skipped, replays no-op)."""
    t = DeltaSparkTable(spark, tmp_table)
    t.write(_df(spark, 0, 5).coalesce(1), WriteMode.error,
            table_configuration=AC_CFG)
    compactions = 0
    for b in range(1, 10):
        res = t.idempotent_append(
            _df(spark, b * 5, b * 5 + 5).coalesce(1), "app", b)
        if res.get("auto_compact_version") is not None:
            compactions += 1
    assert compactions >= 1
    assert len(t.snapshot().files) < 10
    # replayed batch after compaction: still exactly-once
    replay = t.idempotent_append(_df(spark, 5, 10).coalesce(1), "app", 1)
    assert replay["skipped"]
    assert t.read().count() == 50
    # the incremental feed sees each batch exactly once — the
    # interleaved OPTIMIZE commits contribute nothing
    feed = t.read_changes(0)
    assert feed.count() == 45  # batches 1..9 (v0 excluded by starting_version)


def test_auto_compact_lost_race_never_fails_the_write(spark, tmp_table,
                                                      monkeypatch):
    """ANY concurrency error from the follow-up optimize (incl.
    ConcurrentDeleteError from a racing compaction) is swallowed — the
    write that already committed must not fail (review finding r10)."""
    from dagster_delta_spark.tablelog import ConcurrentDeleteError

    t = DeltaSparkTable(spark, tmp_table)
    t.write(_df(spark, 0, 10).repartition(4), WriteMode.error,
            table_configuration=AC_CFG)

    def boom(*a, **kw):
        raise ConcurrentDeleteError("racing compaction won")

    monkeypatch.setattr(DeltaSparkTable, "optimize", boom)
    res = t.write(_df(spark, 10, 60).repartition(8), WriteMode.append)
    assert "auto_compact_version" not in res
    assert t.read().count() == 60  # the append committed


def test_auto_compact_create_time_validation_fails_before_commit(
        spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    with pytest.raises(ValueError, match="integers"):
        t.write(_df(spark, 0, 5), WriteMode.error, table_configuration={
            "dds.autoCompact": "true",
            "dds.autoCompact.minFiles": "fifty"})
    assert not t.exists()  # refused BEFORE anything committed


def test_auto_compact_never_reports_a_noop(spark, tmp_table):
    """Files in [target/2, target) are not compactable by optimize's
    own rule — the trigger must not fire (and never report a
    compaction version that did not commit)."""
    t = DeltaSparkTable(spark, tmp_table)
    cfg = {"dds.autoCompact": "true",
           "dds.autoCompact.minFiles": "2",
           "dds.autoCompact.targetFileSize": "10"}  # target//2 = 5 bytes
    t.write(_df(spark, 0, 10).repartition(4), WriteMode.error,
            table_configuration=cfg)
    res = t.write(_df(spark, 10, 20).repartition(4), WriteMode.append)
    assert "auto_compact_version" not in res
    assert t.version() == 1  # no phantom OPTIMIZE commit
