"""Row-level DELETE / UPDATE / RESTORE (delta-rs DeltaTable.delete /
.update / .restore analogues — the reference's engine exposes these on
the table object; here the data plane is Spark and only touched files
are rewritten)."""

import os

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark import DeltaSparkTable, WriteMode


def seeded(spark, n=1000):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 4).alias("bucket"),
        (F.col("id") * 2.5).cast("double").alias("v"),
    )


def n_data_files(uri):
    out = 0
    for dirpath, _d, files in os.walk(uri):
        if "_dds_log" in dirpath or "_staging" in dirpath:
            continue
        out += sum(f.endswith(".parquet") for f in files)
    return out


def test_delete_predicate_rewrites_only_touched_files(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark), WriteMode.error, partition_columns=["bucket"])
    res = t.delete("v >= 2400")  # ids 960.. -> 40 rows
    assert res["num_deleted_rows"] == 40
    out = t.read()
    assert out.count() == 960
    assert out.where("v >= 2400").count() == 0
    # untouched rows intact
    assert out.where("id < 960").count() == 960


def test_delete_partition_dnf_is_pure_metadata(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark), WriteMode.error, partition_columns=["bucket"])
    before = n_data_files(tmp_table)
    res = t.delete(partition_dnf=[("bucket", "=", 2)])
    assert res["num_deleted_rows"] == 250
    assert res["num_added_files"] == 0  # no rewrite: metadata-only
    assert n_data_files(tmp_table) == before  # no bytes moved either
    assert t.read().where("bucket = 2").count() == 0
    assert t.read().count() == 750


def test_delete_full_table_and_no_match(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark, 100), WriteMode.error)
    v0 = t.version()
    noop = t.delete("v < -1")
    assert noop["num_deleted_rows"] == 0
    assert t.version() == v0  # no empty commit
    res = t.delete()
    assert res["num_deleted_rows"] == 100
    assert t.read().count() == 0
    assert t.read(version=v0).count() == 100  # time travel survives


def test_delete_null_predicate_rows_are_kept(spark, tmp_table):
    """SQL DELETE semantics: a NULL predicate result keeps the row."""
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id bigint, v double")
    t.write(df, WriteMode.error)
    res = t.delete("v > 20")
    assert res["num_deleted_rows"] == 1
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2]


def test_update_assignments_and_scope(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark), WriteMode.error, partition_columns=["bucket"])
    res = t.update({"v": "v * 10"}, "id < 8")
    assert res["num_updated_rows"] == 8
    out = t.read()
    assert out.count() == 1000
    got = {r["id"]: r["v"] for r in out.where("id < 10").collect()}
    assert got[3] == 75.0 and got[7] == 175.0  # updated (x10)
    assert got[8] == 20.0 and got[9] == 22.5  # untouched

    # assignment referencing the pre-update row + multiple columns
    t.update({"v": "v + id"}, "id IN (8, 9)")
    got = {r["id"]: r["v"] for r in t.read().where("id IN (8,9)").collect()}
    assert got[8] == 28.0 and got[9] == 31.5


def test_update_unknown_column_raises(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark, 10), WriteMode.error)
    with pytest.raises(ValueError, match="unknown column"):
        t.update({"nope": "1"})
    with pytest.raises(ValueError, match="at least one"):
        t.update({})


def test_update_partition_column_moves_rows(spark, tmp_table):
    """Updating a partition column restages rows into their new
    partition directory (hive layout follows the data)."""
    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark, 100), WriteMode.error, partition_columns=["bucket"])
    t.update({"bucket": "99"}, "bucket = 1")
    out = t.read()
    assert out.where("bucket = 1").count() == 0
    assert out.where("bucket = 99").count() == 25
    # partition pruning still works against the new value
    assert len(t.pruned_files(t.snapshot(), [("bucket", "=", 99)])) > 0


def test_update_casts_to_column_type(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark, 10), WriteMode.error)
    t.update({"v": "'7'"}, "id = 0")  # string literal -> double column
    assert t.read().where("id = 0").collect()[0]["v"] == 7.0
    assert dict(t.read().dtypes)["v"] == "double"


def test_restore_roundtrip_and_metrics(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark, 100), WriteMode.error)                   # v0
    t.write(seeded(spark, 50), WriteMode.append)                   # v1
    t.delete("id >= 40")                                           # v2
    assert t.read().count() == 80
    res = t.restore(1)
    assert res["num_restored_files"] > 0
    assert t.read().count() == 150
    # restore is itself a commit: time travel still sees the delete
    assert t.read(version=2).count() == 80
    # history records it
    ops = [h["operation"] for h in t.history()]
    assert "RESTORE" in ops
    # restore to current version is a no-op
    v = t.version()
    assert t.restore(v)["num_restored_files"] == 0
    assert t.version() == v


def test_restore_restores_schema(spark, tmp_table):
    from dagster_delta_spark import SchemaMode

    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark, 10), WriteMode.error)                    # v0
    t.write(
        seeded(spark, 10).withColumn("extra", F.lit("x")),
        WriteMode.overwrite, schema_mode=SchemaMode.overwrite,
    )                                                              # v1
    assert "extra" in t.read().columns
    t.restore(0)
    assert "extra" not in t.read().columns
    assert t.read().count() == 10


def test_restore_after_vacuum_raises(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(seeded(spark, 100), WriteMode.error)                   # v0
    t.delete("id >= 50")                                           # v1
    t.vacuum(retention_ms=0)  # drops v0's now-unreferenced bytes
    with pytest.raises(FileNotFoundError, match="RESTORE"):
        t.restore(0)


def test_delete_update_on_clone_stay_local(spark, tmp_table):
    src = DeltaSparkTable(spark, tmp_table)
    src.write(seeded(spark, 100), WriteMode.error,
              partition_columns=["bucket"])
    cl = src.clone(tmp_table + "_cl")
    cl.delete("bucket = 0")
    cl.update({"v": "0.0"}, "bucket = 1")
    assert cl.read().count() == 75
    assert cl.read().where("v = 0.0").count() == 25
    assert src.read().count() == 100
    assert src.read().where("v = 0.0").count() == 1  # only id=0
    # restore the clone back to its birth state
    cl.restore(0)
    assert cl.read().count() == 100


def test_restore_timestamp_as_of(spark, tmp_table):
    """RESTORE ... TIMESTAMP AS OF resolves via the read rule (latest
    version committed at or before the timestamp)."""
    from pyspark.sql import functions as F
    import pytest as _pt

    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark import tablelog

    t = DeltaSparkTable(spark, tmp_table)
    df = spark.range(5).select(F.col("id").alias("k"))
    t.write(df, WriteMode.error)
    t.write(df, WriteMode.append)
    # timestamp of version 0's commit from the log
    ts0 = [h for h in tablelog.history(t.table_uri)
           if h["version"] == 0][0]["timestamp"]
    res = t.restore(timestamp_as_of=ts0)
    assert res["version"] == 2  # the restore is its own commit
    assert t.read().count() == 5
    with _pt.raises(ValueError, match="exactly one"):
        t.restore()
    with _pt.raises(ValueError, match="exactly one"):
        t.restore(0, timestamp_as_of=ts0)
