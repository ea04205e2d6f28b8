"""Protocol version / table-feature gate (tablelog.py:Protocol) —
the delta-rs reader/writer version check analogue.

Contract: every table this engine creates stamps ``default_protocol``
at version 0; the protocol threads through every later commit's
cached snapshot AND the parquet checkpoint (so log truncation cannot
lose it); future-reader tables refuse to load, future-writer tables
read but refuse commits; pre-gate tables with no protocol action
replay to permissive defaults (grandfathered)."""

import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark import tablelog as tl


def _df(spark, n=5):
    return spark.range(n).withColumnRenamed("id", "a")


def _future(spark, tmp_path, name, proto):
    t = DeltaSparkTable(spark, str(tmp_path / name))
    t.write(_df(spark), WriteMode.error)
    tl.commit(t.table_uri, 1, [proto.to_action(),
                               tl.CommitInfo("UPGRADE").to_action()])
    return t


def test_create_stamps_default_protocol(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark), WriteMode.error)
    assert any("protocol" in a
               for a in tl.read_version_actions(t.table_uri, 0))
    p = t.snapshot().protocol
    assert (p.min_reader_version, p.min_writer_version) == (
        tl.CURRENT_READER_VERSION, tl.CURRENT_WRITER_VERSION)
    assert set(p.reader_features) == set(tl.SUPPORTED_READER_FEATURES)
    assert set(p.writer_features) == set(tl.SUPPORTED_WRITER_FEATURES)
    det = t.describe_detail()
    assert det["minReaderVersion"] == tl.CURRENT_READER_VERSION
    assert "deletionVectors" in det["readerFeatures"]


def test_protocol_threads_through_commits(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark), WriteMode.error)
    t.write(_df(spark), WriteMode.append)
    t.delete("a = 0", use_dv=True)
    t.rename_column("a", "b")
    t.optimize(target_file_size=1 << 20)
    p = t.snapshot().protocol
    assert p.min_reader_version == tl.CURRENT_READER_VERSION
    assert "columnMapping" in p.reader_features


def test_future_reader_refuses_read(spark, tmp_path):
    t = _future(spark, tmp_path, "fr",
                tl.Protocol(99, 99, ["futureMagic"], ["futureMagic"]))
    with pytest.raises(tl.UnsupportedProtocolError, match="minReader"):
        t.read()
    # unknown reader FEATURE alone (low version) also refuses
    t2 = _future(spark, tmp_path, "fr2",
                 tl.Protocol(1, 2, ["futureMagic"], []))
    with pytest.raises(tl.UnsupportedProtocolError, match="futureMagic"):
        t2.read()


def test_future_writer_reads_but_refuses_commits(spark, tmp_path):
    t = _future(spark, tmp_path, "fw",
                tl.Protocol(1, 99, [], ["futureWriterMagic"]))
    assert t.read().count() == 5  # reader gate passes
    with pytest.raises(tl.UnsupportedProtocolError, match="minWriter"):
        t.write(_df(spark, 1), WriteMode.append)
    with pytest.raises(tl.UnsupportedProtocolError):
        t.delete("a = 0", use_dv=True)
    with pytest.raises(tl.UnsupportedProtocolError):
        t.optimize(target_file_size=1 << 20)


def test_protocol_survives_checkpoint_and_truncation(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark), WriteMode.error)
    for _ in range(12):  # cross the checkpoint interval (10)
        t.write(_df(spark, 2), WriteMode.append)
    res = t.cleanup_metadata(retention_ms=0)
    assert res["boundary_version"] is not None
    tl._SNAPSHOT_CACHE.clear()  # force the checkpoint replay path
    p = t.snapshot().protocol
    assert p.min_reader_version == tl.CURRENT_READER_VERSION
    assert set(p.writer_features) == set(tl.SUPPORTED_WRITER_FEATURES)


def test_legacy_table_without_protocol_grandfathered(spark, tmp_path):
    # hand-craft a pre-gate table: version 0 with metaData + add only
    t = DeltaSparkTable(spark, str(tmp_path / "legacy"))
    t.write(_df(spark), WriteMode.error)
    acts = [a for a in tl.read_version_actions(t.table_uri, 0)
            if "protocol" not in a]
    legacy = str(tmp_path / "legacy2")
    import os
    import shutil

    shutil.copytree(t.table_uri, legacy)
    os.remove(tl._version_path(legacy, 0))
    tl.commit(legacy, 0, acts)
    t2 = DeltaSparkTable(spark, legacy)
    assert t2.read().count() == 5
    p = t2.snapshot().protocol
    assert (p.min_reader_version, p.min_writer_version) == (1, 2)
    # and the engine can still write to it
    t2.write(_df(spark, 2), WriteMode.append)
    assert t2.read().count() == 7


def test_future_writer_refuses_idempotent_append_pre_staging(
        spark, tmp_path):
    """r14 advisory fix: idempotent_append runs the writer gate
    BEFORE staging like every other data-writing path — a replayed
    micro-batch against a future-writer table must refuse without
    stranding staged files."""
    import glob
    import os

    t = _future(spark, tmp_path, "fw-ia",
                tl.Protocol(1, 99, [], ["futureWriterMagic"]))
    before = set(glob.glob(os.path.join(t.table_uri, "**", "*.parquet"),
                           recursive=True))
    with pytest.raises(tl.UnsupportedProtocolError, match="minWriter"):
        t.idempotent_append(_df(spark, 2), "app", 1)
    after = set(glob.glob(os.path.join(t.table_uri, "**", "*.parquet"),
                          recursive=True))
    assert after == before  # nothing staged
