"""CHECK constraints (delta-rs add_constraint parity) and the txn
exactly-once ledger (Delta SetTransaction parity)."""

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark import (
    ConstraintViolationError,
    DeltaSparkTable,
    MergeConfig,
    MergeType,
    WriteMode,
    tablelog,
)


def base(spark, n=100):
    return spark.range(n).selectExpr(
        "id", "CAST(id * 2.0 AS DOUBLE) AS v")


# -- CHECK constraints ------------------------------------------------------


def test_add_constraint_enforces_on_write(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(base(spark), WriteMode.error)
    t.add_constraint("v_nonneg", "v >= 0")
    assert t.constraints() == {"v_nonneg": "v >= 0"}
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.write(
            spark.createDataFrame([(999, -1.0)], "id bigint, v double"),
            WriteMode.append,
        )
    # clean rows pass; version advanced only by valid commits
    t.write(
        spark.createDataFrame([(999, 1.0)], "id bigint, v double"),
        WriteMode.append,
    )
    assert t.read().count() == 101


def test_add_constraint_validates_existing_rows(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(base(spark), WriteMode.error)
    v = t.version()
    with pytest.raises(ConstraintViolationError):
        t.add_constraint("impossible", "v > 1000000")
    assert t.version() == v  # nothing committed
    assert t.constraints() == {}


def test_constraint_null_counts_as_violation(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(base(spark, 5), WriteMode.error)
    t.add_constraint("v_pos", "v > -1")
    with pytest.raises(ConstraintViolationError):
        t.write(
            spark.createDataFrame([(7, None)], "id bigint, v double"),
            WriteMode.append,
        )


def test_constraint_enforced_on_update_and_merge(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(base(spark), WriteMode.error)
    t.add_constraint("v_nonneg", "v >= 0")
    with pytest.raises(ConstraintViolationError):
        t.update({"v": "-5.0"}, "id < 3")
    src = spark.createDataFrame([(1, -9.0)], "id bigint, v double")
    with pytest.raises(ConstraintViolationError):
        t.merge(src, MergeConfig(
            MergeType.upsert, predicate="s.id = t.id"))
    # table unchanged by the failed attempts
    assert t.read().where("v < 0").count() == 0


def test_drop_constraint(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.write(base(spark, 5), WriteMode.error)
    t.add_constraint("v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("v_nonneg", "v >= 1")
    t.drop_constraint("v_nonneg")
    assert t.constraints() == {}
    t.write(
        spark.createDataFrame([(9, -1.0)], "id bigint, v double"),
        WriteMode.append,
    )
    with pytest.raises(ValueError, match="does not exist"):
        t.drop_constraint("v_nonneg")


# -- exactly-once txn ledger ------------------------------------------------


def test_idempotent_append_skips_replayed_batch(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    for b in range(3):
        r = t.idempotent_append(base(spark, 10), "app1", b)
        assert not r["skipped"]
    assert t.read().count() == 30
    assert t.last_txn_version("app1") == 2
    # crash-replay of an old and the latest batch: both no-op
    for b in (0, 2):
        r = t.idempotent_append(base(spark, 10), "app1", b)
        assert r["skipped"]
    assert t.read().count() == 30
    # the next batch appends
    assert not t.idempotent_append(base(spark, 10), "app1", 3)["skipped"]
    assert t.read().count() == 40


def test_txn_ledger_is_per_app(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.idempotent_append(base(spark, 10), "app1", 5)
    # a different app's batch 5 is NOT deduplicated
    r = t.idempotent_append(base(spark, 10), "app2", 5)
    assert not r["skipped"]
    assert t.read().count() == 20
    assert t.last_txn_version("app1") == 5
    assert t.last_txn_version("app2") == 5
    assert t.last_txn_version("nope") is None


def test_txn_ledger_survives_checkpoint(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    t.idempotent_append(base(spark, 10), "app1", 0)
    t.idempotent_append(base(spark, 10), "app1", 1)
    tablelog.write_checkpoint(t.table_uri, t.snapshot())
    tablelog._SNAPSHOT_CACHE.clear()
    re = tablelog.load_snapshot(t.table_uri)
    assert re.app_versions == {"app1": 1}
    # and the replay check still holds through the checkpoint
    assert t.idempotent_append(base(spark, 10), "app1", 1)["skipped"]


def test_idempotent_append_schema_and_constraints(spark, tmp_table):
    from dagster_delta_spark import SchemaMismatchError

    t = DeltaSparkTable(spark, tmp_table)
    t.idempotent_append(base(spark, 10), "app1", 0)
    t.add_constraint("v_nonneg", "v >= 0")
    with pytest.raises(ConstraintViolationError):
        t.idempotent_append(
            spark.createDataFrame([(1, -1.0)], "id bigint, v double"),
            "app1", 1)
    with pytest.raises(SchemaMismatchError):
        t.idempotent_append(
            spark.createDataFrame([(1, "x")], "id bigint, v string"),
            "app1", 1)


def test_entry_guard_fires_when_dedup_broken(spark, monkeypatch):
    """The registry entry's redelivery guard must raise if the txn
    ledger stops deduplicating (simulated: idempotent_append blindly
    appends instead of skipping)."""
    import __spark_entry__ as entry

    real = DeltaSparkTable.idempotent_append

    def blind_append(self, df, app_id, batch_version, **kw):
        from dagster_delta_spark import WriteMode as WM

        recorded = (self.snapshot().app_versions.get(app_id, -1)
                    if self.exists() else -1)
        if recorded >= batch_version:
            self.write(df, WM.append)  # the bug: replay appends anyway
            return {"version": self.version(), "skipped": False,
                    "num_output_rows": df.count()}
        return real(self, df, app_id, batch_version, **kw)

    monkeypatch.setattr(DeltaSparkTable, "idempotent_append", blind_append)
    with pytest.raises(AssertionError, match="NOT skipped"):
        entry._streaming_exactly_once_sink(spark, "/root/testdata/sf0.001")


def test_exactly_once_sink_end_to_end(spark, tmp_path):
    """foreachBatch adapter: stream a 3-file source in, then re-deliver
    the last batch by hand (the post-crash scenario) — no duplicates."""
    import time

    from dagster_delta_spark.streaming import exactly_once_table_sink

    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    df = base(spark, 90)
    for i in range(3):
        df.where(F.col("id") % 3 == i).coalesce(1).write.mode(
            "append").parquet(src)
        time.sleep(0.05)
    uri = str(tmp_path / "sink_table")
    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .foreachBatch(exactly_once_table_sink(uri, "pipeline-x"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    t = DeltaSparkTable(spark, uri)
    assert t.read().count() == 90
    last = t.last_txn_version("pipeline-x")
    assert last is not None and last >= 0
    # simulated redelivery of the final micro-batch
    r = t.idempotent_append(
        df.where(F.col("id") % 3 == 2), "pipeline-x", last)
    assert r["skipped"]
    assert t.read().count() == 90


def test_not_null_columns_enforced_on_all_write_paths(spark, tmp_path):
    """dds.notNullColumns (Delta column invariants): nulls refuse on
    write, merge, and UPDATE; an omitting write fails too (conform
    null-fills the column, which violates)."""
    import json

    import pytest

    from dagster_delta_spark import (
        ConstraintViolationError,
        DeltaSparkTable,
        MergeConfig,
        MergeType,
        WriteMode,
    )

    cfg = {"dds.notNullColumns": json.dumps(["v"])}
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"),
            WriteMode.error, table_configuration=cfg)
    with pytest.raises(ConstraintViolationError, match="NOT NULL v"):
        t.write(spark.createDataFrame([(3, None)], "id long, v long"),
                WriteMode.append)
    with pytest.raises(ConstraintViolationError, match="NOT NULL v"):
        t.write(spark.createDataFrame([(4,)], "id long"),
                WriteMode.append, schema_mode="append")
    with pytest.raises(ConstraintViolationError, match="NOT NULL v"):
        t.merge(
            spark.createDataFrame([(1, None)], "id long, v long"),
            MergeConfig(MergeType.upsert, predicate="s.id = t.id"))
    with pytest.raises(ConstraintViolationError, match="NOT NULL v"):
        t.update({"v": "NULL"}, "id = 1")
    # clean rows still flow
    t.write(spark.createDataFrame([(5, 50)], "id long, v long"),
            WriteMode.append)
    assert t.read().count() == 3


def test_txn_ledger_survives_checkpoints_at_rewrite_versions(spark, tmp_path):
    """REGRESSION (found via the auto-compact feature): every commit
    path must carry the SetTransaction ledger into the Snapshot it
    publishes — a parquet checkpoint written at an OPTIMIZE/WRITE/
    MERGE version used to persist an EMPTY ledger, so replayed
    streaming batches older than the checkpoint re-appended (observed:
    50 rows became 55).  Exactly-once must survive any interleaving of
    maintenance commits with the checkpoint interval (10)."""
    from dagster_delta_spark import DeltaSparkTable, WriteMode

    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    df = lambda lo, hi: spark.range(lo, hi).selectExpr("id AS k")
    t.write(df(0, 5).coalesce(1), WriteMode.error)
    for b in range(1, 9):
        t.idempotent_append(df(b * 5, b * 5 + 5).coalesce(1), "app", b)
    for _ in range(5):  # OPTIMIZE commits cross the v10 checkpoint
        t.optimize(cluster_by=["k"], num_files=2)
    assert t.snapshot().app_versions == {"app": 8}
    replay = t.idempotent_append(df(5, 10).coalesce(1), "app", 1)
    assert replay["skipped"]
    assert t.read().count() == 45
