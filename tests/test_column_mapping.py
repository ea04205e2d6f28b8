"""Column mapping: metadata-only RENAME/DROP COLUMN (delta-rs ALTER
parity).  Physical names are frozen at first write; renames/drops are
pure log commits, and every consumer (read, time travel, DNF pruning,
DML, merge, optimize, clone, DV, restore, CDC) resolves the logical
view through the one ``_read_files`` aliasing projection."""

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark import DeltaSparkTable, MergeConfig, MergeType, WriteMode
from dagster_delta_spark.config import SchemaMode


def _t(spark, tmp_path, name="t"):
    return DeltaSparkTable(spark, str(tmp_path / name))


def test_rename_reads_old_and_new_files(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
            WriteMode.error)
    t.rename_column("v", "payload")
    # post-rename append uses the frozen physical name under the hood
    t.write(spark.createDataFrame([(3, "c")], "id long, payload string"),
            WriteMode.append)
    rows = {r["id"]: r["payload"] for r in t.read().collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}
    assert t.read().columns == ["id", "payload"]


def test_rename_is_metadata_only(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"),
            WriteMode.error)
    files_before = {a.path for a in t.snapshot().files}
    t.rename_column("v", "w")
    assert {a.path for a in t.snapshot().files} == files_before


def test_time_travel_across_rename(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"),
            WriteMode.error)
    t.rename_column("v", "w")
    assert t.read(version=0).columns == ["id", "v"]
    assert t.read().columns == ["id", "w"]
    assert t.read(version=0).collect()[0]["v"] == "a"


def test_rename_chain_keeps_first_physical(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"),
            WriteMode.error)
    t.rename_column("v", "w")
    t.rename_column("w", "x")
    import json

    mapping = json.loads(
        t.snapshot().metadata.configuration["dds.columnMapping"])
    assert mapping == {"x": "v"}
    assert t.read().collect()[0]["x"] == "a"


def test_new_column_colliding_with_renamed_physical(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"),
            WriteMode.error)
    t.rename_column("v", "w")
    # new logical column named "v" must NOT read the old physical "v"
    t.write(
        spark.createDataFrame([(2, "b", "NEW")],
                              "id long, w string, v string"),
        WriteMode.append, schema_mode=SchemaMode.append)
    rows = {r["id"]: (r["w"], r["v"]) for r in t.read().collect()}
    assert rows == {1: ("a", None), 2: ("b", "NEW")}


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1, "SECRET")], "id long, v string"),
            WriteMode.error)
    t.drop_column("v")
    assert t.read().columns == ["id"]
    t.write(spark.createDataFrame([(2, "fresh")], "id long, v string"),
            WriteMode.append, schema_mode=SchemaMode.append)
    rows = {r["id"]: r["v"] for r in t.read().collect()}
    assert rows == {1: None, 2: "fresh"}  # old value stays buried
    # ...but time travel before the drop still sees it
    assert t.read(version=0).collect()[0]["v"] == "SECRET"


def test_rename_refusals(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(
        spark.createDataFrame([(1, "a", "p1")],
                              "id long, v string, part string"),
        WriteMode.error, partition_columns=["part"])
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("part", "part2")
    with pytest.raises(ValueError, match="does not exist"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "id")
    with pytest.raises(ValueError, match="invalid column name"):
        t.rename_column("v", "bad name")
    t.add_constraint("v_nonnull", "v IS NOT NULL")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.rename_column("v", "w")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.drop_column("v")
    t.drop_constraint("v_nonnull")
    t.rename_column("v", "w")  # now legal
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("part")


def test_drop_last_column_refused(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1,)], "id long"), WriteMode.error)
    with pytest.raises(ValueError, match="only column"):
        t.drop_column("id")


def test_dnf_pruning_on_renamed_column(spark, tmp_path):
    t = _t(spark, tmp_path)
    # two appends -> two files with disjoint id ranges
    t.write(spark.createDataFrame([(i, "x") for i in range(10)],
                                  "num long, v string"), WriteMode.error)
    t.write(spark.createDataFrame([(i, "y") for i in range(100, 110)],
                                  "num long, v string"), WriteMode.append)
    t.rename_column("num", "doc_id")
    dnf = [("doc_id", ">=", 100)]
    pruned = t.pruned_files(t.snapshot(), dnf)
    assert len(pruned) < len(t.snapshot().files), \
        "stats pruning must survive the rename (physical-keyed stats)"
    got = sorted(r["doc_id"] for r in t.read(dnf=dnf).collect())
    assert got == list(range(100, 110))


def test_delete_update_merge_on_renamed_table(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, price double"),
        WriteMode.error)
    t.rename_column("price", "amount")
    t.delete("amount >= 8.0")
    assert t.read().count() == 8
    t.update(predicate="amount = 0.0", assignments={"amount": "42.0"})
    assert t.read().where("amount = 42.0").count() == 1
    src = spark.createDataFrame([(1, 99.0), (100, 5.0)],
                                "id long, amount double")
    t.merge(src, MergeConfig(
        merge_type=MergeType.upsert, predicate="s.id = t.id",
        source_alias="s", target_alias="t"))
    rows = {r["id"]: r["amount"] for r in t.read().collect()}
    assert rows[1] == 99.0 and rows[100] == 5.0 and len(rows) == 9


def test_optimize_zorder_clone_dv_on_renamed_table(spark, tmp_path):
    t = _t(spark, tmp_path)
    for i in range(3):
        t.write(spark.createDataFrame(
            [(i * 10 + j, f"s{j}") for j in range(10)],
            "id long, v string"),
            WriteMode.append if i else WriteMode.error)
    t.rename_column("v", "label")
    before = {r["id"]: r["label"] for r in t.read().collect()}
    t.optimize()
    assert {r["id"]: r["label"] for r in t.read().collect()} == before
    t.zorder(["id"])
    assert {r["id"]: r["label"] for r in t.read().collect()} == before
    # merge-on-read DV on the renamed column's table
    t.delete("label = 's3'", use_dv=True)
    left = {r["id"]: r["label"] for r in t.read().collect()}
    assert len(left) == 27 and "s3" not in left.values()
    c = DeltaSparkTable(spark, str(tmp_path / "c"))
    t.clone(str(tmp_path / "c"))
    assert {r["id"]: r["label"] for r in c.read().collect()} == left


def test_restore_across_rename(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"),
            WriteMode.error)
    t.write(spark.createDataFrame([(2, "b")], "id long, v string"),
            WriteMode.append)                      # v1
    t.rename_column("v", "w")                      # v2
    t.write(spark.createDataFrame([(3, "c")], "id long, w string"),
            WriteMode.append)                      # v3
    t.restore(1)
    # RESTORE restores the target's METADATA too (Delta semantics):
    # the pre-rename logical schema comes back, and the files re-read
    # correctly because physicals never changed
    rows = {r["id"]: r["v"] for r in t.read().collect()}
    assert rows == {1: "a", 2: "b"}
    # and the rename can be replayed on the restored table
    t.rename_column("v", "w")
    assert {r["id"]: r["w"] for r in t.read().collect()} == rows


def test_cdc_across_rename(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"),
            WriteMode.error)                       # v0
    t.rename_column("v", "w")                      # v1 (no files)
    t.write(spark.createDataFrame([(2, "b")], "id long, w string"),
            WriteMode.append)                      # v2
    ch = t.read_changes(0).collect()
    assert {(r["id"], r["w"], r["_commit_version"]) for r in ch} == {
        (2, "b", 2)}


def test_unmapped_table_has_no_mapping_config(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"),
            WriteMode.error)
    t.write(spark.createDataFrame([(2, "b")], "id long, v string"),
            WriteMode.append)
    cfg = t.snapshot().metadata.configuration
    assert "dds.columnMapping" not in cfg
    assert "dds.droppedPhysical" not in cfg
