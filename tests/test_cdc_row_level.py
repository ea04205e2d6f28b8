"""Row-level CDC (_change_type feed, Delta CDF-style) decoded from
merge-on-read commits: appends emit insert; DV DELETE emits exactly
the newly-masked rows; DV UPDATE emits update_preimage/postimage;
copy-rewrites refuse (merge-on-read is what makes row CDC cheap)."""

import pytest

from dagster_delta_spark import DeltaSparkTable, MergeConfig, MergeType, WriteMode


def _feed(t, start=-1, **kw):
    rows = t.read_changes(start, row_level=True, **kw).collect()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in rows
    )


def test_insert_and_dv_delete_feed(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i * 10) for i in range(6)], "id long, v long"),
        WriteMode.error)                                       # v0
    t.delete("v >= 40", use_dv=True)                           # v1
    assert _feed(t) == (
        [(0, "insert", i, i * 10) for i in range(6)]
        + [(1, "delete", 4, 40), (1, "delete", 5, 50)]
    )


def test_second_dv_delete_emits_only_the_delta(spark, tmp_path):
    """Sidecars carry the UNION mask; the feed must emit each commit's
    newly-masked rows only — the mask-minus-previous-mask subtlety."""
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i * 10) for i in range(6)], "id long, v long"),
        WriteMode.error)                                       # v0
    t.delete("v >= 40", use_dv=True)                           # v1
    t.delete("v >= 20", use_dv=True)                           # v2: adds 2,3
    got = [r for r in _feed(t) if r[0] == 2]
    assert got == [(2, "delete", 2, 20), (2, "delete", 3, 30)]


def test_dv_update_pre_and_postimage(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i * 10) for i in range(4)], "id long, v long"),
        WriteMode.error)                                       # v0
    t.update({"v": "v + 1"}, "id >= 2", use_dv=True)           # v1
    got = [r for r in _feed(t) if r[0] == 1]
    assert got == [
        (1, "update_postimage", 2, 21), (1, "update_postimage", 3, 31),
        (1, "update_preimage", 2, 20), (1, "update_preimage", 3, 30),
    ]


def test_partition_scoped_delete_is_decodable(spark, tmp_path):
    """A partition-scoped delete drops whole files as pure metadata —
    the feed emits the dropped files' live rows as deletes."""
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "b")],
            "id long, v long, p string"),
        WriteMode.error, partition_columns=["p"])              # v0
    t.delete("p = 'b'")                                        # v1 metadata
    rows = t.read_changes(0, row_level=True).collect()
    got = sorted((r["_change_type"], r["id"]) for r in rows)
    assert got == [("delete", 2), ("delete", 3)]


def test_copy_rewrites_refuse(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "id long, v long").coalesce(1),
        WriteMode.error)
    t.delete("v = 20")  # copy-rewrite flavor (partial file, no DV)
    with pytest.raises(ValueError, match="row_level|rewrite"):
        t.read_changes(0, row_level=True)
    # and row_level has no allow_rewrites escape hatch
    t2 = DeltaSparkTable(spark, str(tmp_path / "t2"))
    t2.write(spark.createDataFrame([(1, 1)], "id long, v long"),
             WriteMode.error)
    t2.merge(
        spark.createDataFrame([(1, 2)], "id long, v long"),
        MergeConfig(MergeType.upsert, predicate="s.id = t.id"))
    with pytest.raises(ValueError, match="rewrite"):
        t2.read_changes(0, row_level=True, allow_rewrites=True)


def test_empty_range_schema_has_change_type(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 1)], "id long, v long"),
            WriteMode.error)
    df = t.read_changes(t.version())
    assert "_change_type" not in df.columns
    df2 = t.read_changes(t.version(), row_level=True)
    assert df2.columns == ["id", "v", "_change_type", "_commit_version"]
    assert df2.count() == 0


def test_vacuumed_sidecar_fails_decode_pointedly(spark, tmp_path):
    """The feed needs superseded sidecars; once vacuum reclaims them
    the decode must raise a pointed error, not a cryptic read
    failure — and the live snapshot stays unaffected."""
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i) for i in range(10)], "id long, v long").coalesce(1),
        WriteMode.error)
    t.delete("id >= 8", use_dv=True)   # v1: sidecar A
    t.delete("id >= 6", use_dv=True)   # v2: sidecar B supersedes A
    t.vacuum(retention_ms=0)           # reclaims A
    with pytest.raises(ValueError, match="sidecar"):
        t.read_changes(1, row_level=True).collect()
    assert t.read().count() == 6       # snapshot reads only need B


def test_vacuumed_sidecar_on_dropped_file_fails_pointedly(spark, tmp_path):
    """r9: the metadata-delete decode reads dropped files' pre-commit
    DV sidecars — a reclaimed sidecar must raise the same pointed
    driver-side error as the re-add path, not a raw executor path
    error mid-collect."""
    import shutil

    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i) for i in range(10)], "id long, v long").coalesce(1),
        WriteMode.error)                                       # v0
    t.delete("id >= 8", use_dv=True)   # v1: sidecar on the file
    t.delete()                         # v2: metadata delete drops it
    import os
    dv = [a for a in t.snapshot(1).files if a.dv_path][0]
    shutil.rmtree(os.path.join(t.table_uri, dv.dv_path))
    with pytest.raises(ValueError, match="sidecar"):
        t.read_changes(1, row_level=True)


def test_cdc_retain_versions_pins_vacuum(spark, tmp_path):
    """r9: dds.cdcRetainVersions = N makes vacuum keep every file and
    sidecar the last N versions' snapshots reference, whatever
    retention_ms says — a feed lagging <= N versions always decodes."""
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i) for i in range(10)], "id long, v long").coalesce(1),
        WriteMode.error)                                       # v0
    t.set_properties({"dds.cdcRetainVersions": "4"})           # v1
    t.delete("id >= 8", use_dv=True)   # v2: sidecar A
    t.delete("id >= 6", use_dv=True)   # v3: sidecar B supersedes A
    assert t.vacuum(retention_ms=0) == []    # A pinned by v2's snapshot
    rows = sorted((r["_commit_version"], r["id"])
                  for r in t.read_changes(1, row_level=True).collect())
    assert rows == [(2, 8), (2, 9), (3, 6), (3, 7)]
    # malformed values refuse at SET time, not at the next vacuum
    with pytest.raises(ValueError, match="cdcRetainVersions"):
        t.set_properties({"dds.cdcRetainVersions": "lots"})
    with pytest.raises(ValueError, match="cdcRetainVersions"):
        t.set_properties({"dds.cdcRetainVersions": "-1"})


def test_zero_matched_delete_commit_does_not_wedge_the_feed(spark, tmp_path):
    """An unscoped DELETE on an already-empty table commits a DML
    version with no adds and no removes; the row-level feed must skip
    it, not crash — a wedged feed strands every CDC consumer."""
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 1)], "id long, v long"),
            WriteMode.error)                                   # v0
    t.delete()                                                 # v1: all
    t.delete()                                                 # v2: no-op DML commit
    t.write(spark.createDataFrame([(2, 2)], "id long, v long"),
            WriteMode.append)                                  # v3
    rows = sorted((r["_change_type"], r["id"], r["_commit_version"])
                  for r in t.read_changes(-1, row_level=True).collect())
    assert rows == [("delete", 1, 1), ("insert", 1, 0), ("insert", 2, 3)]
