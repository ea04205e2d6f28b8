"""ALTER TABLE ADD COLUMNS / SET-UNSET TBLPROPERTIES / FSCK REPAIR
(delta-rs alter.add_columns / set_table_properties / FsckBuilder
parity) — all pure metadata commits."""

import os

import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode


def _t(spark, tmp_path, rows=5):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i * 10) for i in range(rows)], "id long, v long"),
        WriteMode.error)
    return t


def test_add_columns_reads_null_for_history(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.add_columns({"tag": "string", "w": "double"})
    df = t.read()
    assert df.columns == ["id", "v", "tag", "w"]
    assert df.where("tag IS NULL AND w IS NULL").count() == 5
    # new writes carry the columns; old files still read null
    t.write(spark.createDataFrame([(9, 90, "x", 1.5)],
                                  "id long, v long, tag string, w double"),
            WriteMode.append)
    assert t.read().where("tag = 'x'").count() == 1
    # time travel: the pre-alter snapshot has the old schema
    assert t.read(version=0).columns == ["id", "v"]
    with pytest.raises(ValueError, match="already exist"):
        t.add_columns({"v": "long"})


def test_add_columns_never_resurrects_dropped(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(7, 70, "old")],
                                  "id long, v long, tag string"),
            WriteMode.append, schema_mode="append")
    t.drop_column("tag")
    t.add_columns({"tag": "string"})
    # the buried 'old' value must NOT come back
    assert t.read().where("tag IS NOT NULL").count() == 0


def test_set_unset_properties(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.set_properties({"owner": "pipeline-a", "dds.custom": "1"})
    cfg = t.snapshot().metadata.configuration
    assert cfg["owner"] == "pipeline-a"
    t.unset_properties(["owner"])
    assert "owner" not in t.snapshot().metadata.configuration
    with pytest.raises(ValueError, match="not set"):
        t.unset_properties(["owner"])
    with pytest.raises(ValueError, match="add_constraint"):
        t.set_properties({"dds.constraints.c1": "v > 0"})
    # properties set this way drive real machinery (NOT NULL)
    import json

    t.set_properties({"dds.notNullColumns": json.dumps(["v"])})
    from dagster_delta_spark import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        t.write(spark.createDataFrame([(1, None)], "id long, v long"),
                WriteMode.append)


def test_fsck_drops_lost_files_and_feeds_refuse(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.write(spark.createDataFrame(
            [(i, i)], "id long, v long").coalesce(1),
            WriteMode.error if i == 0 else WriteMode.append)
    snap = t.snapshot()
    lost = sorted(snap.files, key=lambda a: a.path)[1]
    os.remove(os.path.join(t.table_uri, lost.path))
    with pytest.raises(Exception):
        t.read().collect()  # broken before repair
    rep = t.fsck(dry_run=True)
    assert rep["num_removed_files"] == 1 and rep["dry_run"]
    with pytest.raises(Exception):
        t.read().collect()  # dry run repaired nothing
    res = t.fsck()
    assert res["num_removed_files"] == 1
    assert t.read().count() == 2  # the two surviving files' rows
    # rows vanished with no decodable feed: incremental consumers refuse
    with pytest.raises(ValueError, match="rewrite"):
        t.read_changes(res["version"] - 1).collect()
    assert t.fsck()["num_removed_files"] == 0  # idempotent


def test_fsck_catches_lost_dv_sidecar(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, i) for i in range(10)], "id long, v long").coalesce(1),
        WriteMode.error)
    t.delete("id >= 8", use_dv=True)
    a = next(x for x in t.snapshot().files if x.dv_path)
    import shutil

    shutil.rmtree(os.path.join(t.table_uri, a.dv_path))
    assert t.fsck(dry_run=True)["num_removed_files"] == 1
    t.fsck()
    assert t.read().count() == 0  # the masked file itself was dropped


def test_property_machinery_guard_rails(spark, tmp_path):
    """Properties that ARE machinery can't be installed unvalidated:
    NOT NULL validates existing rows, identity refuses on populated
    tables, and the column-mapping ledger is untouchable."""
    import json

    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(9, None)], "id long, v long"),
            WriteMode.append)
    from dagster_delta_spark import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        t.set_properties({"dds.notNullColumns": json.dumps(["v"])})
    with pytest.raises(ValueError, match="high-water|populated"):
        t.set_properties({"dds.identityColumns": json.dumps({"rid": {}})})
    t.rename_column("v", "val")
    with pytest.raises(ValueError, match="rename_column"):
        t.set_properties({"dds.columnMapping": "{}"})
    with pytest.raises(ValueError, match="rename_column"):
        t.unset_properties(["dds.columnMapping"])
    with pytest.raises(ValueError, match="drop_constraint"):
        t.unset_properties(["dds.constraints.c1"])


def test_rollup_first_build_drops_cancelled_groups(spark, tmp_path):
    """A first maintain_rollup over a history whose deletions already
    cancelled a group must not persist the zero row (count_col
    contract holds on the create path too)."""
    from dagster_delta_spark.operators.incremental import (
        maintain_rollup,
        rollup_vs_recompute,
    )

    base = DeltaSparkTable(spark, str(tmp_path / "base"))
    rollup = DeltaSparkTable(spark, str(tmp_path / "roll"))
    base.write(spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "g string, v double"), WriteMode.error)
    base.delete("g = 'a'", use_dv=True)  # cancels group a pre-build
    measures = {"total": "SUM(CAST(v AS DECIMAL(30,10)))",
                "n": "COUNT(*)"}
    maintain_rollup(base, rollup, ["g"], measures, -1, count_col="n")
    assert {r["g"] for r in rollup.read().collect()} == {"b"}
    assert rollup_vs_recompute(base, rollup, ["g"], measures).count() == 0
