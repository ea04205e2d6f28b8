"""Shallow clone (zero-copy table copies): the clone's log references
the source's data files via per-file ``base`` roots; writes diverge
into clone-local files; vacuum never crosses roots."""

import os

import pytest


def _src(spark, tmp_path, partitioned=True):
    from pyspark.sql import functions as F

    from dagster_delta_spark import DeltaSparkTable, WriteMode

    t = DeltaSparkTable(spark, str(tmp_path / "src"))
    df = (
        spark.range(60)
        .withColumn("p", (F.col("id") % 3).cast("string"))
        .withColumn("v", F.col("id") * 2)
    )
    t.write(
        df,
        WriteMode.overwrite,
        partition_columns=["p"] if partitioned else None,
    )
    return t


def _local_parquet(uri):
    return [
        f
        for dp, _dn, fs in os.walk(uri)
        for f in fs
        if f.endswith(".parquet") and "_spark_delta_log" not in dp
    ]


def test_clone_zero_copy_read_parity(spark, tmp_path):
    src = _src(spark, tmp_path)
    cl = src.clone(str(tmp_path / "cl"))
    assert cl.read().count() == 60
    assert sorted(r["id"] for r in cl.read().collect()) == sorted(
        r["id"] for r in src.read().collect()
    )
    # zero copy: not a single data file under the clone
    assert _local_parquet(str(tmp_path / "cl")) == []
    # partition-pruned read against foreign roots
    assert (
        cl.read(dnf=[("p", "=", "1")]).count()
        == src.read(dnf=[("p", "=", "1")]).count()
    )
    # fresh identity, recorded provenance
    assert cl.snapshot().metadata.table_id != src.snapshot().metadata.table_id
    cfg = cl.snapshot().metadata.configuration
    assert cfg["dds.cloneSource"] == os.path.abspath(src.table_uri)
    assert cfg["dds.cloneVersion"] == "0"


def test_clone_divergence_both_ways(spark, tmp_path):
    from pyspark.sql import functions as F

    from dagster_delta_spark import WriteMode

    src = _src(spark, tmp_path)
    cl = src.clone(str(tmp_path / "cl"))
    # clone-side append + scoped overwrite never touch the source
    cl.write(
        spark.range(5).withColumn("p", F.lit("9")).withColumn("v", F.col("id")),
        WriteMode.append,
    )
    cl.write(
        spark.range(2).withColumn("p", F.lit("1"))
        .withColumn("v", F.lit(0).cast("long")),
        WriteMode.overwrite,
        partition_dnf=[("p", "=", "1")],
    )
    assert cl.read().count() == 60 - 20 + 5 + 2
    assert cl.read().where("p = '1'").count() == 2
    assert src.read().count() == 60
    assert src.read().where("p = '1'").count() == 20
    # the clone pins the cloned VERSION: a later source overwrite
    # replaces the source's log references, but the bytes remain until
    # source vacuum, so the clone still reads its pinned files
    src.write(
        spark.range(3).withColumn("p", F.lit("0"))
        .withColumn("v", F.col("id")),
        WriteMode.overwrite,
    )
    assert src.read().count() == 3
    assert cl.read().where("p = '2'").count() == 20  # still the old data
    # clone time travel: v0 is the cloned state
    assert cl.read(version=0).count() == 60


def test_clone_merge_and_optimize_stay_local(spark, tmp_path):
    from pyspark.sql import functions as F

    from dagster_delta_spark import MergeConfig, MergeType

    src = _src(spark, tmp_path)
    cl = src.clone(str(tmp_path / "cl"))
    msrc = (
        spark.range(3).withColumn("p", (F.col("id") % 3).cast("string"))
        .withColumn("v", F.lit(999).cast("long"))
    )
    cl.merge(msrc, MergeConfig(MergeType.upsert, predicate="s.id = t.id"))
    # ids are unique in the fixture: exactly the 3 matched rows update
    assert cl.read().where("v = 999").count() == 3
    assert src.read().where("v = 999").count() == 0
    # the rewrite landed locally; untouched foreign files carried over
    assert len(_local_parquet(str(tmp_path / "cl"))) > 0
    snap = cl.snapshot()
    assert any(a.base is None for a in snap.files)
    assert any(a.base is not None for a in snap.files)
    # OPTIMIZE compacts everything into local files
    cl.optimize(target_file_size=1024 * 1024)
    assert all(a.base is None for a in cl.snapshot().files)
    assert cl.read().count() == 60
    assert src.read().count() == 60


def test_clone_vacuum_never_deletes_source_bytes(spark, tmp_path):
    from pyspark.sql import functions as F

    from dagster_delta_spark import WriteMode

    src = _src(spark, tmp_path)
    cl = src.clone(str(tmp_path / "cl"))
    # drop every foreign reference via a full local overwrite, then
    # vacuum the clone aggressively — the source must be untouched
    cl.write(
        spark.range(4).withColumn("p", F.lit("0"))
        .withColumn("v", F.col("id")),
        WriteMode.overwrite,
    )
    cl.vacuum(retention_ms=0)
    assert src.read().count() == 60


def test_clone_checkpoint_roundtrips_base(spark, tmp_path):
    from dagster_delta_spark import tablelog

    src = _src(spark, tmp_path)
    cl = src.clone(str(tmp_path / "cl"))
    snap = cl.snapshot()
    tablelog.write_checkpoint(cl.table_uri, snap)
    tablelog._SNAPSHOT_CACHE.clear()
    re = tablelog.load_snapshot(cl.table_uri)
    assert {a.log_key for a in re.files} == {a.log_key for a in snap.files}
    assert all(a.base == os.path.abspath(src.table_uri) for a in re.files)
    assert cl.read().count() == 60


def test_clone_of_clone_points_at_original_roots(spark, tmp_path):
    src = _src(spark, tmp_path)
    cl = src.clone(str(tmp_path / "cl"))
    cl2 = cl.clone(str(tmp_path / "cl2"))
    root = os.path.abspath(src.table_uri)
    assert all(a.base == root for a in cl2.snapshot().files)
    assert cl2.read().count() == 60


def test_clone_existing_target_raises(spark, tmp_path):
    from dagster_delta_spark.table import TableExistsError

    src = _src(spark, tmp_path)
    src.clone(str(tmp_path / "cl"))
    with pytest.raises(TableExistsError):
        src.clone(str(tmp_path / "cl"))


def test_clone_cdc_and_streaming_resolve_foreign_roots(spark, tmp_path):
    from pyspark.sql import functions as F

    from dagster_delta_spark import WriteMode

    src = _src(spark, tmp_path, partitioned=False)
    cl = src.clone(str(tmp_path / "cl"))
    cl.write(
        spark.range(100, 105).withColumn("p", F.lit("9"))
        .withColumn("v", F.col("id")),
        WriteMode.append,
    )
    # CDC: version 0 (the CLONE commit) is an append of the cloned
    # rows; version 1 is the local append
    v0 = cl.read_changes(-1, 0)
    assert v0.count() == 60
    v1 = cl.read_changes(0)
    assert sorted(r["id"] for r in v1.collect()) == [100, 101, 102, 103, 104]
    # streaming table-source: the CLONE commit's files resolve against
    # the source root, the appended batch against the clone's
    import uuid

    from dagster_delta_spark.streaming import DeltaSparkTableDataSource

    spark.dataSource.register(DeltaSparkTableDataSource)
    name = f"clone_stream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("dds_table").option("path", cl.table_uri)
        .load()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.table(name).count() == 65
