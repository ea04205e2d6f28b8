"""Partition-overwrite contracts (reference fixtures A3-A6: dd tests
test_type_handler.py:173-455)."""

from datetime import date, datetime

import pytest

from dagster_delta_spark import (
    DeltaSparkTable,
    TablePartitionDimension,
    TimeWindow,
    WriteMode,
)
from dagster_delta_spark.plans.predicates import partition_dimensions_to_dnf


def test_static_partition_overwrite(spark, tmp_table):
    """A4: re-materializing 'red' replaces only red rows
    (test_type_handler.py:283-317)."""
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame(
        [("red", "x", 1), ("blue", "x", 2), ("red", "x", 3)],
        "color string, a string, b bigint",
    )
    t.write(df, WriteMode.overwrite, partition_columns=["color"])
    red2 = spark.createDataFrame(
        [("red", "y", 9)], "color string, a string, b bigint"
    )
    t.write(red2, WriteMode.overwrite, partition_dnf=[("color", "=", "red")])
    rows = sorted((r["color"], r["a"], r["b"]) for r in t.read().collect())
    assert rows == [("blue", "x", 2), ("red", "y", 9)]


def test_daily_partition_overwrite(spark, tmp_table):
    """A3: re-materializing 2022-01-01 replaces only that date
    (test_type_handler.py:192-226)."""
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame(
        [(date(2022, 1, 1), "run1", i) for i in range(3)]
        + [(date(2022, 1, 2), "run1", i) for i in range(3)],
        "time date, a string, b bigint",
    )
    t.write(df, WriteMode.overwrite, partition_columns=["time"])

    dims = [TablePartitionDimension(
        "time", TimeWindow(datetime(2022, 1, 1), datetime(2022, 1, 2))
    )]
    dnf = partition_dimensions_to_dnf(dims, t.schema(), input_dnf=False)
    # half-open range on the write path too — '=' start (the reference
    # shape) under-deletes windows spanning several partition values
    assert dnf == [
        ("time", ">=", date(2022, 1, 1)),
        ("time", "<", date(2022, 1, 2)),
    ]

    redo = spark.createDataFrame(
        [(date(2022, 1, 1), "run2", i) for i in range(3)],
        "time date, a string, b bigint",
    )
    t.write(redo, WriteMode.overwrite, partition_dnf=dnf)
    out = t.read()
    assert out.where("a = 'run2'").count() == 3
    assert out.where("a = 'run1'").count() == 3
    assert out.where("time = DATE'2022-01-02' AND a = 'run1'").count() == 3


def test_multi_partition_overwrite(spark, tmp_table):
    """A5: 2-D (time x static) partition overwrite
    (test_type_handler.py:344-389)."""
    t = DeltaSparkTable(spark, tmp_table)
    rows = [
        (c, date(2022, 1, d), f"run1-{c}-{d}")
        for c in ("red", "blue")
        for d in (1, 2)
    ]
    df = spark.createDataFrame(rows, "color string, time date, a string")
    t.write(df, WriteMode.overwrite, partition_columns=["time", "color"])

    dims = [
        TablePartitionDimension(
            "time", TimeWindow(datetime(2022, 1, 1), datetime(2022, 1, 2))
        ),
        TablePartitionDimension("color", ["red"]),
    ]
    dnf = partition_dimensions_to_dnf(dims, t.schema(), input_dnf=False)
    redo = spark.createDataFrame(
        [("red", date(2022, 1, 1), "run2")], "color string, time date, a string"
    )
    t.write(redo, WriteMode.overwrite, partition_dnf=dnf)
    out = {(r["color"], str(r["time"])): r["a"] for r in t.read().collect()}
    assert out[("red", "2022-01-01")] == "run2"
    assert out[("blue", "2022-01-01")] == "run1-blue-1"
    assert out[("red", "2022-01-02")] == "run1-red-2"


def test_dynamic_partition_overwrite(spark, tmp_table):
    """A6: runtime-registered keys (test_type_handler.py:412-454)."""
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame(
        [("apple", "run1"), ("orange", "run1")], "fruit string, a string"
    )
    t.write(df, WriteMode.overwrite, partition_columns=["fruit"])
    redo = spark.createDataFrame([("apple", "run2")], "fruit string, a string")
    t.write(redo, WriteMode.overwrite, partition_dnf=[("fruit", "=", "apple")])
    out = {r["fruit"]: r["a"] for r in t.read().collect()}
    assert out == {"apple": "run2", "orange": "run1"}


def test_empty_table_with_schema_then_partition_write(spark, tmp_table):
    """The reference's skipped self-dependent case
    (test_type_handler.py:457-513): create an empty table with an
    a-priori schema, then write a partition into it."""
    t = DeltaSparkTable(spark, tmp_table)
    empty = spark.createDataFrame([], "color string, a string")
    t.write(empty, WriteMode.error, partition_columns=["color"])
    assert t.read().count() == 0
    t.write(
        spark.createDataFrame([("red", "x")], "color string, a string"),
        WriteMode.overwrite,
        partition_dnf=[("color", "=", "red")],
    )
    assert t.read().count() == 1


def test_pruned_read_skips_files(spark, tmp_table):
    """Driver-side pruning: a partition-filtered read only lists the
    matching files (checked via the pruned file list)."""
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame(
        [("red", 1), ("blue", 2), ("green", 3)], "color string, b bigint"
    )
    t.write(df, WriteMode.overwrite, partition_columns=["color"])
    snap = t.snapshot()
    pruned = t.pruned_files(snap, [("color", "=", "red")])
    assert len(pruned) < len(snap.files)
    assert all(a.partition_values["color"] == "red" for a in pruned)
    assert t.read(dnf=[("color", "=", "red")]).count() == 1


def test_minmax_data_skipping(spark, tmp_table):
    """Non-partition predicate prunes via footer min/max stats."""
    t = DeltaSparkTable(spark, tmp_table)
    low = spark.createDataFrame([(i,) for i in range(10)], "v bigint")
    high = spark.createDataFrame([(i,) for i in range(1000, 1010)], "v bigint")
    t.write(low.coalesce(1), WriteMode.overwrite)
    t.write(high.coalesce(1), WriteMode.append)
    snap = t.snapshot()
    pruned = t.pruned_files(snap, [("v", ">=", 1000)])
    assert len(pruned) < len(snap.files)
    assert t.read(dnf=[("v", ">=", 1000)]).count() == 10


def test_partition_type_whitelist(spark):
    """P1 rejects non-primitive partition types (handler.py:366-392)."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("ok", StringType()),
        StructField("bad", ArrayType(LongType())),
    ])
    with pytest.raises(ValueError, match="unsupported"):
        partition_dimensions_to_dnf(
            [TablePartitionDimension("bad", ["x"])], schema
        )
    with pytest.raises(ValueError, match="not in schema"):
        partition_dimensions_to_dnf(
            [TablePartitionDimension("missing", ["x"])], schema
        )


def test_multi_day_window_overwrite_replaces_all_covered_dates(spark, tmp_table):
    """A window spanning two date partitions replaces both on overwrite
    (the '='-start shape would leave day 2's stale rows alive)."""
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame(
        [(date(2022, 1, d), "old", i) for d in (1, 2, 3) for i in range(2)],
        "time date, a string, b bigint",
    )
    t.write(df, WriteMode.overwrite, partition_columns=["time"])
    dims = [TablePartitionDimension(
        "time", TimeWindow(datetime(2022, 1, 1), datetime(2022, 1, 3))
    )]
    dnf = partition_dimensions_to_dnf(dims, t.schema(), input_dnf=False)
    redo = spark.createDataFrame(
        [(date(2022, 1, d), "new", i) for d in (1, 2) for i in range(2)],
        "time date, a string, b bigint",
    )
    t.write(redo, WriteMode.overwrite, partition_dnf=dnf)
    out = {(r["time"].isoformat(), r["a"]) for r in t.read().collect()}
    assert out == {("2022-01-01", "new"), ("2022-01-02", "new"),
                   ("2022-01-03", "old")}
    assert t.read().count() == 6


def test_non_contiguous_window_overwrite_raises(spark, tmp_table):
    """Gapped windows on the write path raise instead of deleting the
    gap's partitions (safety divergence from the reference collapse)."""
    import pytest

    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame(
        [(date(2022, 1, d), "x", 1) for d in (1, 5)],
        "time date, a string, b bigint",
    )
    t.write(df, WriteMode.overwrite, partition_columns=["time"])
    dims = [TablePartitionDimension(
        "time",
        [TimeWindow(datetime(2022, 1, 1), datetime(2022, 1, 2)),
         TimeWindow(datetime(2022, 1, 5), datetime(2022, 1, 6))],
    )]
    with pytest.raises(ValueError, match="non-contiguous"):
        partition_dimensions_to_dnf(dims, t.schema(), input_dnf=False)
    # the read path still collapses (reference behavior)
    dnf = partition_dimensions_to_dnf(dims, t.schema(), input_dnf=True)
    assert dnf == [("time", ">=", date(2022, 1, 1)),
                   ("time", "<", date(2022, 1, 6))]


def test_legacy_window_scope_e2e_write(spark, tmp_path):
    """Reference-compat flag e2e: a 2-day window overwrite through the
    full io-manager write path with ``legacy_window_scope=True`` pins
    only '=' start (reference handler.py:479-480) — day 2's stale rows
    SURVIVE next to their replacements (the documented under-deletion),
    while the default half-open scope replaces both days."""
    from datetime import date, datetime

    from dagster_delta_spark.io_manager import AssetContext, DeltaSparkIOManager

    def seed_and_rewrite(mgr, key):
        ctx0 = AssetContext(asset_key=["s", key], partition_dimensions=[
            TablePartitionDimension("time", TimeWindow(
                datetime(2022, 1, 1), datetime(2022, 1, 3)))])
        seed = spark.createDataFrame(
            [(date(2022, 1, 1), "old", 1), (date(2022, 1, 2), "old", 2)],
            "time date, run string, b bigint",
        )
        mgr.handle_output(ctx0, seed)
        redo = spark.createDataFrame(
            [(date(2022, 1, 1), "new", 1), (date(2022, 1, 2), "new", 2)],
            "time date, run string, b bigint",
        )
        mgr.handle_output(ctx0, redo)
        return sorted(
            (r["time"], r["run"]) for r in mgr.table_for(ctx0).read().collect()
        )

    legacy = DeltaSparkIOManager(
        spark, str(tmp_path / "legacy"), legacy_window_scope=True
    )
    # '=' 2022-01-01 pin deletes day 1 only: day 2 keeps its stale row
    assert seed_and_rewrite(legacy, "t") == [
        (date(2022, 1, 1), "new"),
        (date(2022, 1, 2), "new"),
        (date(2022, 1, 2), "old"),
    ]

    modern = DeltaSparkIOManager(spark, str(tmp_path / "modern"))
    # half-open [start, end) deletes both days: no stale survivors
    assert seed_and_rewrite(modern, "t") == [
        (date(2022, 1, 1), "new"),
        (date(2022, 1, 2), "new"),
    ]
