"""I/O-manager lifecycle contracts (reference: dd tests
test_type_handler.py schema resolution/column pruning/unsupported
type; test_metadata_inputs.py commit metadata)."""

import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.handler import UnsupportedTypeError
from dagster_delta_spark.io_manager import AssetContext, DeltaSparkIOManager
from dagster_delta_spark.plans.slices import resolve_schema_and_table


def two_col(spark):
    return spark.createDataFrame([(1, 4), (2, 5), (3, 6)], "a bigint, b bigint")


def test_schema_resolution_precedence():
    """Reference dbiomanager_fixed.py:36-48."""
    assert resolve_schema_and_table(["my_schema", "tbl"]) == ("my_schema", "tbl")
    assert resolve_schema_and_table(["tbl"]) == ("public", "tbl")
    assert resolve_schema_and_table(
        ["key_schema", "tbl"], schema_config="cfg"
    ) == ("cfg", "tbl")
    assert resolve_schema_and_table(
        ["key_schema", "tbl"], schema_metadata="md", schema_config="cfg"
    ) == ("md", "tbl")
    assert resolve_schema_and_table(["tbl"], root_name="renamed") == (
        "public", "renamed",
    )


def test_uri_layout(spark, tmp_path):
    """Path layout {root}/{schema}/{table}; empty schema drops the
    level (io_manager.py:276-280; test_type_handler.py:87)."""
    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    ctx = AssetContext(asset_key=["my_schema", "b_df"])
    mgr.handle_output(ctx, two_col(spark))
    assert (tmp_path / "my_schema" / "b_df" / "_spark_delta_log").is_dir()


def test_roundtrip_and_column_pruning(spark, tmp_path):
    """columns=['a'] loads exactly one column
    (test_type_handler.py:132-148)."""
    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    ctx = AssetContext(asset_key=["s", "t"])
    mgr.handle_output(ctx, two_col(spark))
    out = mgr.load_input(AssetContext(asset_key=["s", "t"], columns=["a"]))
    assert out.columns == ["a"]
    assert sorted(r["a"] for r in out.collect()) == [1, 2, 3]


def test_unsupported_type_error(spark, tmp_path):
    """U4 contract (test_type_handler.py:161-170)."""
    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    with pytest.raises(UnsupportedTypeError, match="does not have a handler"):
        mgr.handle_output(AssetContext(asset_key=["s", "t"]), 5)


def test_per_asset_mode_override(spark, tmp_path):
    """metadata={'mode': 'append'} overrides the manager default
    (handler.py:176-182; save_modes.py:103-137)."""
    mgr = DeltaSparkIOManager(spark, str(tmp_path))  # default overwrite
    ctx = AssetContext(asset_key=["s", "t"], metadata={"mode": "append"})
    mgr.handle_output(ctx, two_col(spark))
    mgr.handle_output(ctx, two_col(spark))
    assert mgr.load_input(AssetContext(asset_key=["s", "t"])).count() == 6


def test_commit_metadata_in_history(spark, tmp_path):
    """A8: custom metadata visible in history(1)
    (test_metadata_inputs.py:38-56)."""
    mgr = DeltaSparkIOManager(
        spark, str(tmp_path), custom_metadata={"userName": "John Doe"}
    )
    ctx = AssetContext(asset_key=["s", "t"])
    mgr.handle_output(ctx, two_col(spark))
    t = mgr.table_for(ctx)
    assert t.history(1)[0]["userMetadata"]["userName"] == "John Doe"


def test_writer_compression_zstd(spark, tmp_path):
    """A8/W10: compression knob reaches the parquet files
    (test_metadata_inputs.py:58-96 asserts .zstd suffix; we assert the
    footer codec)."""
    import glob

    import pyarrow.parquet as pq

    mgr = DeltaSparkIOManager(
        spark, str(tmp_path), writer_properties={"compression": "ZSTD"}
    )
    mgr.handle_output(AssetContext(asset_key=["s", "t"]), two_col(spark))
    files = glob.glob(str(tmp_path / "s" / "t" / "*.parquet"))
    assert files
    md = pq.ParquetFile(files[0]).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")


def test_table_properties_merge(spark, tmp_path):
    """W8: asset table_configuration wins keys over manager config
    (handler.py:151-155)."""
    mgr = DeltaSparkIOManager(
        spark, str(tmp_path), table_config={"k1": "mgr", "k2": "mgr"}
    )
    ctx = AssetContext(
        asset_key=["s", "t"], metadata={"table_configuration": {"k2": "asset"}}
    )
    mgr.handle_output(ctx, two_col(spark))
    cfg = mgr.table_for(ctx).snapshot().metadata.configuration
    assert cfg == {"k1": "mgr", "k2": "asset"}


def test_merge_mode_via_manager(spark, tmp_path):
    """W6 through the manager with per-asset merge_predicate
    (handler.py:83-88)."""
    mgr = DeltaSparkIOManager(spark, str(tmp_path), mode=WriteMode.merge)
    ctx = AssetContext(
        asset_key=["s", "t"], metadata={"merge_predicate": "s.a = t.a"}
    )
    mgr.handle_output(ctx, two_col(spark))
    mgr.handle_output(ctx, two_col(spark))
    assert mgr.load_input(AssetContext(asset_key=["s", "t"])).count() == 3


def test_merge_mode_requires_predicate(spark, tmp_path):
    mgr = DeltaSparkIOManager(spark, str(tmp_path), mode=WriteMode.merge)
    with pytest.raises(ValueError, match="merge_predicate"):
        mgr.handle_output(AssetContext(asset_key=["s", "t"]), two_col(spark))


def test_output_metadata_shape(spark, tmp_path):
    """O4: schema, uri, version, stats in output metadata
    (handler.py:271-291)."""
    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    md = mgr.handle_output(AssetContext(asset_key=["s", "t"]), two_col(spark))
    assert md["table_version"] == 0
    assert md["dagster/column_schema"] == {"a": "bigint", "b": "bigint"}
    assert md["row_count"] == 3
    assert md["size_MB"] > 0


def test_pandas_and_arrow_handlers(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa

    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": [4, 5, 6]})
    md = mgr.handle_output(AssetContext(asset_key=["s", "pandas_t"]), pdf)
    assert md["num_rows_in_source"] == 3
    out = mgr.load_input(
        AssetContext(asset_key=["s", "pandas_t"]), target_type=pd.DataFrame
    )
    assert isinstance(out, pd.DataFrame) and len(out) == 3

    at = pa.table({"a": [1, 2], "b": [3, 4]})
    mgr.handle_output(AssetContext(asset_key=["s", "arrow_t"]), at)
    out2 = mgr.load_input(
        AssetContext(asset_key=["s", "arrow_t"]), target_type=pa.Table
    )
    assert isinstance(out2, pa.Table) and out2.num_rows == 2


def test_resource_time_travel(spark, tmp_path):
    """A2: DeltaTableResource version=0 returns pre-append contents
    (test_delta_table_resource.py:39-71)."""
    from dagster_delta_spark.resource import DeltaTableResource

    uri = str(tmp_path / "t")
    t = DeltaSparkTable(spark, uri)
    t.write(two_col(spark), WriteMode.overwrite)
    t.write(two_col(spark), WriteMode.append)
    pinned = DeltaTableResource(url=uri, version=0).load(spark)
    assert pinned.to_df().count() == 3
    latest = DeltaTableResource(url=uri).load(spark)
    assert latest.to_df().count() == 6


def test_string_date_partition_with_custom_fmt(spark, tmp_path):
    """P6 end-to-end: a time-window materialization against a
    string-typed partition column uses the partition definition's
    custom fmt (reference handler.py:422-427, 554-597)."""
    from datetime import datetime

    from dagster_delta_spark import TablePartitionDimension, TimeWindow

    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    dims = [TablePartitionDimension(
        "day_str", TimeWindow(datetime(2022, 1, 1), datetime(2022, 1, 2))
    )]
    df1 = spark.createDataFrame(
        [("2022/01/01", "run1", i) for i in range(3)],
        "day_str string, a string, b bigint",
    )
    ctx = AssetContext(
        asset_key=["s", "fmt_t"],
        partition_dimensions=dims,
        date_formats={"day_str": "%Y/%m/%d"},
    )
    mgr.handle_output(ctx, df1)

    df2 = spark.createDataFrame(
        [("2022/01/02", "run1", i) for i in range(2)],
        "day_str string, a string, b bigint",
    )
    ctx2 = AssetContext(
        asset_key=["s", "fmt_t"],
        partition_dimensions=[TablePartitionDimension(
            "day_str", TimeWindow(datetime(2022, 1, 2), datetime(2022, 1, 3))
        )],
        date_formats={"day_str": "%Y/%m/%d"},
    )
    mgr.handle_output(ctx2, df2)

    # re-materialize day 1 -> replaces only that partition
    redo = spark.createDataFrame(
        [("2022/01/01", "run2", 9)], "day_str string, a string, b bigint"
    )
    mgr.handle_output(ctx, redo)
    out = mgr.load_input(AssetContext(asset_key=["s", "fmt_t"]))
    by_day = {}
    for r in out.collect():
        by_day.setdefault(r["day_str"], set()).add(r["a"])
    assert by_day == {"2022/01/01": {"run2"}, "2022/01/02": {"run1"}}

    # pruned input load via the same fmt
    loaded = mgr.load_input(AssetContext(
        asset_key=["s", "fmt_t"],
        partition_dimensions=dims,
        date_formats={"day_str": "%Y/%m/%d"},
    ))
    assert {r["day_str"] for r in loaded.collect()} == {"2022/01/01"}
