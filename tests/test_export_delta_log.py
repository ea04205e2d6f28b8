"""export_delta_log: publishing a real delta-io ``_delta_log`` over a
dds table so delta-rs / delta-spark / DuckDB-delta can read it.

The strongest interop pin available in this sandbox is the full
ROUND TRIP through our own spec-conformant importer: export a table,
copy data + ``_delta_log`` (without our log) to a fresh root,
``convert_from_delta`` it back, and require bit-identical contents —
both directions share only the public spec, not code paths."""

import json
import os
import shutil

import pytest

from dagster_delta_spark import (
    DeltaSparkTable,
    TableExistsError,
    WriteMode,
    convert_from_delta,
    export_delta_log,
)
from dagster_delta_spark.tablelog import LOG_DIR


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS a", "CAST(id * 2 AS DOUBLE) AS b",
        "CAST(id AS STRING) AS s")


def _round_trip(spark, src_root, tmp_path, name="rt"):
    """Copy data + _delta_log (NOT our log) to a fresh root and
    convert back through the importer."""
    dst = str(tmp_path / name)
    shutil.copytree(src_root, dst,
                    ignore=shutil.ignore_patterns(LOG_DIR, "_dv"))
    convert_from_delta(spark, dst)
    return DeltaSparkTable(spark, dst)


def test_export_and_round_trip(spark, tmp_path):
    root = str(tmp_path / "t")
    t = DeltaSparkTable(spark, root)
    t.write(_df(spark, 0, 6), WriteMode.overwrite)
    t.write(_df(spark, 6, 10), WriteMode.append)
    t.delete("a >= 8")  # copy-rewrite delete (no DV) keeps exportable
    t.idempotent_append(_df(spark, 20, 22), "up", 5)

    res = export_delta_log(spark, root)
    assert res["num_rows"] == 10 and res["delta_version"] == 0

    # the log is spec-shaped: one JSON action per line, stats strings
    with open(os.path.join(root, "_delta_log",
                           "0" * 20 + ".json")) as f:
        actions = [json.loads(line) for line in f]
    kinds = [next(iter(a)) for a in actions]
    assert kinds.count("protocol") == 1 and kinds.count("metaData") == 1
    adds = [a["add"] for a in actions if "add" in a]
    assert all(isinstance(a["stats"], str) for a in adds)
    assert sum(json.loads(a["stats"])["numRecords"] for a in adds) == 10

    back = _round_trip(spark, root, tmp_path)
    assert sorted(r["a"] for r in back.read().collect()) == \
        sorted(r["a"] for r in DeltaSparkTable(spark, root)
               .read().collect())
    # stats survived the round trip (int column min/max)
    assert any("a" in f.stats.get("minValues", {})
               for f in back.snapshot().files)
    # SetTransaction ledger carried
    assert back.last_txn_version("up") == 5


def test_export_partitioned_and_properties(spark, tmp_path):
    root = str(tmp_path / "t")
    t = DeltaSparkTable(spark, root)
    df = spark.range(0, 8).selectExpr(
        "id AS a", "CAST(id % 2 AS STRING) AS p")
    t.write(df, WriteMode.overwrite, partition_columns=["p"],
            table_configuration={"dds.appendOnly": "true",
                                 "custom.key": "v"})
    t.add_constraint("positive_a", "a >= 0")
    res = export_delta_log(spark, root)
    assert res["num_rows"] == 8

    with open(os.path.join(root, "_delta_log",
                           "0" * 20 + ".json")) as f:
        actions = [json.loads(line) for line in f]
    meta = [a["metaData"] for a in actions if "metaData" in a][0]
    assert meta["partitionColumns"] == ["p"]
    assert meta["configuration"]["delta.appendOnly"] == "true"
    assert meta["configuration"]["delta.constraints.positive_a"] == \
        "a >= 0"
    assert meta["configuration"]["custom.key"] == "v"
    assert not any(k.startswith("dds.")
                   for k in meta["configuration"])
    proto = [a["protocol"] for a in actions if "protocol" in a][0]
    assert proto["minWriterVersion"] == 3  # constraints need v3

    back = _round_trip(spark, root, tmp_path)
    assert back.read(dnf=[("p", "=", "1")]).count() == 4
    # contracts survived: appendOnly + constraint enforce again
    with pytest.raises(ValueError, match="append-only"):
        back.delete("a = 1")
    props = back.describe_detail()["properties"]
    assert props["dds.constraints.positive_a"] == "a >= 0"


def test_export_deletion_vectors_round_trip(spark, tmp_path):
    """r14: DV masks export as REAL Delta DVs — inline Z85 for small
    masks, on-disk bin files past 10k positions — under the feature
    protocol, and the round trip back through convert_from_delta
    restores the masks as native sidecars (masked rows stay gone)."""
    root = str(tmp_path / "dv")
    t = DeltaSparkTable(spark, root)
    # one physical file so the DV delete masks (a multi-file layout
    # where every live row of a file matches gets a plain remove)
    t.write(_df(spark, 0, 8).coalesce(1), WriteMode.overwrite)
    t.delete("a IN (1, 3)", use_dv=True)
    res = export_delta_log(spark, root)
    assert res["num_rows"] == 6  # live rows
    with open(os.path.join(root, "_delta_log",
                           "0" * 20 + ".json")) as f:
        actions = [json.loads(line) for line in f]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    add = next(a["add"] for a in actions if "add" in a)
    dv = add["deletionVector"]
    assert dv["storageType"] == "i" and dv["cardinality"] == 2
    st = json.loads(add["stats"])
    assert st["numRecords"] == 8 and st["tightBounds"] is False

    back = _round_trip(spark, root, tmp_path, name="rt-dv")
    assert sorted(r["a"] for r in back.read().collect()) == \
        [0, 2, 4, 5, 6, 7]
    f = back.snapshot().files[0]
    assert f.num_records == 8 and f.dv_count == 2

    # large mask -> on-disk DV file; round trip again
    r2 = str(tmp_path / "dvbig")
    t2 = DeltaSparkTable(spark, r2)
    t2.write(spark.range(0, 30_000).selectExpr("id AS a").coalesce(1),
             WriteMode.overwrite)
    t2.delete("a < 12000", use_dv=True)
    export_delta_log(spark, r2)
    import glob

    assert glob.glob(os.path.join(r2, "deletion_vector_*.bin"))
    back2 = _round_trip(spark, r2, tmp_path, name="rt-dvbig")
    assert back2.read().count() == 18_000
    assert back2.read().where("a < 12000").count() == 0


def test_export_refusals(spark, tmp_path):
    # identity contract refuses
    r2 = str(tmp_path / "ident")
    t2 = DeltaSparkTable(spark, r2)
    t2.write(spark.range(0, 3).selectExpr("id AS a"),
             WriteMode.overwrite,
             table_configuration={
                 "dds.identityColumns": '{"rid": {"start": 1}}'})
    with pytest.raises(ValueError, match="contract"):
        export_delta_log(spark, r2)

    # dropped columns refuse (the reserved-physical ledger has no
    # Delta spelling; renames alone export since r15)
    r3 = str(tmp_path / "cm")
    t3 = DeltaSparkTable(spark, r3)
    t3.write(_df(spark, 0, 3), WriteMode.overwrite)
    t3.drop_column("s")
    with pytest.raises(ValueError, match="dropped"):
        export_delta_log(spark, r3)

    # shallow clone refuses (source: a plain colmap-free table, so
    # the clone refusal — not the colmap one — is what fires)
    rp = str(tmp_path / "plain")
    tp = DeltaSparkTable(spark, rp)
    tp.write(_df(spark, 0, 3), WriteMode.overwrite)
    r4 = str(tmp_path / "clone")
    tp.clone(r4)
    with pytest.raises(ValueError, match="clone"):
        export_delta_log(spark, r4)

    # existing _delta_log refuses (never clobber)
    r5 = str(tmp_path / "has")
    t5 = DeltaSparkTable(spark, r5)
    t5.write(_df(spark, 0, 2), WriteMode.overwrite)
    os.makedirs(os.path.join(r5, "_delta_log"))
    with pytest.raises(TableExistsError):
        export_delta_log(spark, r5)


def test_export_dry_run_writes_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    t = DeltaSparkTable(spark, root)
    t.write(_df(spark, 0, 4), WriteMode.overwrite)
    res = export_delta_log(spark, root, dry_run=True)
    assert res["dry_run"] and res["num_rows"] == 4
    assert not os.path.exists(os.path.join(root, "_delta_log"))


def test_contract_round_trip(spark, tmp_path):
    """r14 symmetry: generated columns export as
    delta.generationExpression field metadata, NOT NULL as
    nullable=false — and the round trip back through
    convert_from_delta restores dds.generatedColumns /
    dds.notNullColumns with enforcement intact."""
    root = str(tmp_path / "t")
    t = DeltaSparkTable(spark, root)
    df = spark.sql(
        "SELECT CAST(id AS BIGINT) AS a, "
        "TIMESTAMP'2024-01-02 03:00:00' AS ts FROM range(0, 4)")
    t.write(df, WriteMode.overwrite, table_configuration={
        "dds.generatedColumns": '{"d": "CAST(ts AS DATE)"}',
        "dds.notNullColumns": '["a"]'})
    res = export_delta_log(spark, root)
    assert res["dropped_configuration"] == {}

    with open(os.path.join(root, "_delta_log",
                           "0" * 20 + ".json")) as f:
        actions = [json.loads(line) for line in f]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    sch = json.loads(meta["schemaString"])
    by_name = {f["name"]: f for f in sch["fields"]}
    assert by_name["d"]["metadata"][
        "delta.generationExpression"] == "CAST(ts AS DATE)"
    assert by_name["a"]["nullable"] is False
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minWriterVersion"] == 4  # generated columns

    back = _round_trip(spark, root, tmp_path)
    props = back.describe_detail()["properties"]
    assert json.loads(props["dds.generatedColumns"]) == {
        "d": "CAST(ts AS DATE)"}
    assert json.loads(props["dds.notNullColumns"]) == ["a"]
    # enforcement is live on the round-tripped table: omitted
    # generated column computes; a NULL key refuses
    back.write(spark.sql(
        "SELECT CAST(9 AS BIGINT) AS a, "
        "TIMESTAMP'2024-02-03 04:00:00' AS ts"), WriteMode.append)
    assert str(back.read().where("a = 9").collect()[0]["d"]) == \
        "2024-02-03"
    from dagster_delta_spark import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        back.write(spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS a, "
            "TIMESTAMP'2024-02-03 04:00:00' AS ts, "
            "DATE'2024-02-03' AS d"), WriteMode.append)


def test_export_date_stats_round_trip(spark, tmp_path):
    """r14 review fix: date min/max export ('YYYY-MM-DD' renders
    identically both sides) and survive the round trip, so converted
    copies keep date file-skipping."""
    root = str(tmp_path / "t")
    t = DeltaSparkTable(spark, root)
    df = spark.sql("SELECT CAST(id AS BIGINT) AS a, "
                   "DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) AS d "
                   "FROM range(0, 4)")
    t.write(df.where("a < 2").coalesce(1), WriteMode.overwrite)
    t.write(df.where("a >= 2").coalesce(1), WriteMode.append)
    export_delta_log(spark, root)
    with open(os.path.join(root, "_delta_log",
                           "0" * 20 + ".json")) as f:
        adds = [json.loads(line)["add"] for line in f
                if "add" in json.loads(line)]
    mins = {json.loads(a["stats"])["minValues"]["d"] for a in adds}
    assert mins == {"2024-01-01", "2024-01-03"}
    back = _round_trip(spark, root, tmp_path)
    snap = back.snapshot()
    kept = back.pruned_files(snap, [("d", "<", "2024-01-02")])
    assert len(kept) == 1


def test_export_timestamp_stats_round_trip(spark, tmp_path):
    """r14: timestamp min/max export in Delta's ms ISO/'Z' convention
    with sound widening (min floors, max ceils), and the round trip
    keeps timestamp file-skipping (import re-widens max by 999 us)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = str(tmp_path / "t")
    t = DeltaSparkTable(spark, root)
    df = spark.sql(
        "SELECT CAST(id AS BIGINT) AS a, TIMESTAMP'2024-01-01 05:00:00'"
        " + make_interval(0,0,0,0,CAST(id AS INT),0,0.000123) AS ts "
        "FROM range(0, 4)")
    t.write(df.where("a < 2").coalesce(1), WriteMode.overwrite)
    t.write(df.where("a >= 2").coalesce(1), WriteMode.append)
    export_delta_log(spark, root)
    with open(os.path.join(root, "_delta_log",
                           "0" * 20 + ".json")) as f:
        adds = [json.loads(line)["add"] for line in f
                if "add" in json.loads(line)]
    stats = [json.loads(a["stats"]) for a in adds]
    mins = sorted(s["minValues"]["ts"] for s in stats)
    maxs = sorted(s["maxValues"]["ts"] for s in stats)
    # micros .000123 floor to .000 on min, ceil to .001 on max
    assert mins == ["2024-01-01T05:00:00.000Z",
                    "2024-01-01T07:00:00.000Z"]
    assert maxs == ["2024-01-01T06:00:00.001Z",
                    "2024-01-01T08:00:00.001Z"]
    back = _round_trip(spark, root, tmp_path)
    snap = back.snapshot()
    kept = back.pruned_files(
        snap, [("ts", "<=", "2024-01-01 05:30:00")])
    assert len(kept) == 1
    assert back.read(
        dnf=[("ts", "<=", "2024-01-01 05:30:00")]).count() == 1


def test_export_column_mapping_round_trip(spark, tmp_path):
    """r15: column-mapped (renamed) tables export — frozen physical
    names render as delta.columnMapping.physicalName/.id field
    metadata under mode=name (reader 2 / writer 5), stats stay keyed
    physical, and the round trip through convert_from_delta restores
    the identical mapping + contents."""
    root = str(tmp_path / "cm")
    t = DeltaSparkTable(spark, root)
    t.write(_df(spark, 0, 4).coalesce(1), WriteMode.overwrite)
    t.rename_column("s", "s2")
    # post-rename writes stage under the frozen physical 's' too
    t.write(_df(spark, 4, 6).coalesce(1).withColumnRenamed("s", "s2"),
            WriteMode.append)

    res = export_delta_log(spark, root)
    assert res["num_rows"] == 6

    with open(os.path.join(root, "_delta_log",
                           "0" * 20 + ".json")) as f:
        actions = [json.loads(line) for line in f]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 2
    assert proto["minWriterVersion"] == 5
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    assert meta["configuration"]["delta.columnMapping.maxColumnId"] \
        == "3"
    sch = json.loads(meta["schemaString"])
    by_name = {f["name"]: f for f in sch["fields"]}
    # every field carries BOTH keys; the renamed one keeps its frozen
    # physical, ids are unique
    assert by_name["s2"]["metadata"][
        "delta.columnMapping.physicalName"] == "s"
    assert by_name["a"]["metadata"][
        "delta.columnMapping.physicalName"] == "a"
    ids = [f["metadata"]["delta.columnMapping.id"]
           for f in sch["fields"]]
    assert sorted(ids) == [1, 2, 3]
    # stats keyed on PHYSICAL names (both formats' colmap convention)
    adds = [a["add"] for a in actions if "add" in a]
    for a in adds:
        st = json.loads(a["stats"])
        assert "s" in st["minValues"] and "s2" not in st["minValues"]

    back = _round_trip(spark, root, tmp_path, name="rt-cm")
    assert sorted((r["a"], r["s2"]) for r in back.read().collect()) \
        == sorted((r["a"], r["s2"]) for r in t.read().collect())
    props = back.describe_detail()["properties"]
    assert json.loads(props["dds.columnMapping"]) == {"s2": "s"}
    # the restored mapping is LIVE machinery: another rename works
    # and reads still resolve the frozen physical
    back.rename_column("s2", "s3")
    assert sorted(r["s3"] for r in back.read().collect()) == \
        sorted(str(i) for i in range(6))


def test_export_column_mapping_with_dv(spark, tmp_path):
    """colmap + DV masks export together: feature protocol 3/7 lists
    columnMapping on BOTH sides, and the round trip keeps masked rows
    gone under the renamed logical schema."""
    root = str(tmp_path / "cmdv")
    t = DeltaSparkTable(spark, root)
    t.write(_df(spark, 0, 8).coalesce(1), WriteMode.overwrite)
    t.rename_column("b", "b2")
    t.delete("a IN (2, 5)", use_dv=True)
    export_delta_log(spark, root)
    with open(os.path.join(root, "_delta_log",
                           "0" * 20 + ".json")) as f:
        actions = [json.loads(line) for line in f]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "columnMapping" in proto["readerFeatures"]
    assert "columnMapping" in proto["writerFeatures"]
    assert "deletionVectors" in proto["readerFeatures"]

    back = _round_trip(spark, root, tmp_path, name="rt-cmdv")
    assert sorted(r["a"] for r in back.read().collect()) == \
        [0, 1, 3, 4, 6, 7]
    assert back.read().where("b2 = 8.0").count() == 1
    props = back.describe_detail()["properties"]
    assert json.loads(props["dds.columnMapping"]) == {"b2": "b"}


def test_export_checkpoint_round_trip(spark, tmp_path):
    """r15: past the file-count threshold the export also writes one
    classic parquet checkpoint + _last_checkpoint — and the convert
    replays it bit-identically through the CHECKPOINT path alone
    (JSON tail deleted, the aged-foreign-log shape)."""
    root = str(tmp_path / "t")
    t = DeltaSparkTable(spark, root)
    t.write(_df(spark, 0, 8), WriteMode.overwrite)
    t.write(_df(spark, 8, 12), WriteMode.append)
    t.delete("a IN (2, 9)", use_dv=True)
    t.idempotent_append(_df(spark, 20, 22), "app", 7)
    res = export_delta_log(spark, root, checkpoint_threshold=0)
    assert res["checkpointed"]
    dlog = os.path.join(root, "_delta_log")
    assert os.path.isfile(
        os.path.join(dlog, "0" * 20 + ".checkpoint.parquet"))
    assert json.load(open(os.path.join(
        dlog, "_last_checkpoint")))["version"] == 0

    # the JSON and checkpoint replay IDENTICALLY: convert once with
    # JSON present, once with only the checkpoint
    back_json = _round_trip(spark, root, tmp_path, name="rt-json")
    dst = str(tmp_path / "rt-cp")
    shutil.copytree(root, dst,
                    ignore=shutil.ignore_patterns(LOG_DIR, "_dv"))
    os.remove(os.path.join(dst, "_delta_log", "0" * 20 + ".json"))
    convert_from_delta(spark, dst)
    back_cp = DeltaSparkTable(spark, dst)
    a = sorted(tuple(r) for r in back_json.read().collect())
    b = sorted(tuple(r) for r in back_cp.read().collect())
    assert a == b and len(a) == t.read().count()
    # masked rows stay gone and the ledger carried through the
    # checkpoint replay too
    assert back_cp.read().where("a IN (2, 9)").count() == 0
    assert back_cp.last_txn_version("app") == 7
    # file-level state identical: same adds, same DV cardinalities
    sj = {(f.path, f.num_records, f.dv_count)
          for f in back_json.snapshot().files}
    sc = {(f.path, f.num_records, f.dv_count)
          for f in back_cp.snapshot().files}
    assert sj == sc

    # under the threshold no checkpoint is written
    r2 = str(tmp_path / "small")
    t2 = DeltaSparkTable(spark, r2)
    t2.write(_df(spark, 0, 3), WriteMode.overwrite)
    res2 = export_delta_log(spark, r2)
    assert not res2["checkpointed"]
    assert not os.path.exists(os.path.join(
        r2, "_delta_log", "_last_checkpoint"))


def test_export_colmap_checkpoint_round_trip(spark, tmp_path):
    """Composition pin: a column-mapped export with a checkpoint
    re-converts bit-identically through the CHECKPOINT path alone —
    the physicalName/id field metadata must survive the parquet
    checkpoint's metaData struct, not just the JSON line."""
    root = str(tmp_path / "cmcp")
    t = DeltaSparkTable(spark, root)
    t.write(_df(spark, 0, 6).coalesce(1), WriteMode.overwrite)
    t.rename_column("s", "s2")
    t.delete("a IN (1, 4)", use_dv=True)
    res = export_delta_log(spark, root, checkpoint_threshold=0)
    assert res["checkpointed"]
    dst = str(tmp_path / "rt")
    shutil.copytree(root, dst,
                    ignore=shutil.ignore_patterns(LOG_DIR, "_dv"))
    os.remove(os.path.join(dst, "_delta_log", "0" * 20 + ".json"))
    convert_from_delta(spark, dst)
    back = DeltaSparkTable(spark, dst)
    assert sorted((r["a"], r["s2"]) for r in back.read().collect()) \
        == sorted((r["a"], r["s2"]) for r in t.read().collect())
    assert back.read().where("a IN (1, 4)").count() == 0
    props = back.describe_detail()["properties"]
    assert json.loads(props["dds.columnMapping"]) == {"s2": "s"}
