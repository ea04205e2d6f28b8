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


def test_pj4_columns_on_raw_table_guard(spark, tmp_path):
    """PJ4 (reference handler.py:311-313): requesting columns while
    loading the raw table handle raises; without columns the handle
    comes back usable."""
    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    mgr.handle_output(AssetContext(asset_key=["s", "t"]), two_col(spark))
    with pytest.raises(ValueError, match="Cannot select columns"):
        mgr.load_input(
            AssetContext(asset_key=["s", "t"], columns=["a"]),
            target_type=DeltaSparkTable,
        )
    raw = mgr.load_input(
        AssetContext(asset_key=["s", "t"]), target_type=DeltaSparkTable
    )
    assert isinstance(raw, DeltaSparkTable)
    assert raw.read().count() == 3
    # a version pin is likewise refused: the raw handle always reads
    # head, so the pin would be silently dropped
    with pytest.raises(ValueError, match="Cannot pin a version"):
        mgr.load_input(
            AssetContext(asset_key=["s", "t"]),
            target_type=DeltaSparkTable,
            version=0,
        )


# -- P6: fmt extraction from (nested) partition definitions ------------------


class _FakeTimeWindowDef:
    def __init__(self, fmt):
        self.fmt = fmt


class _FakeDim:
    def __init__(self, name, partitions_def):
        self.name = name
        self.partitions_def = partitions_def


class _FakeMultiDef:
    def __init__(self, dims):
        self.partitions_defs = dims


class _FakeContext:
    def __init__(self, metadata=None, pdef=None, has_partitions=True):
        self.has_asset_partitions = has_partitions
        self.definition_metadata = metadata
        self.asset_partitions_def = pdef


def test_p6_fmt_from_time_window_definition():
    """Single TimeWindowPartitionsDefinition -> {partition_expr: fmt}
    (reference handler.py:585-586; test_io_manager.py shapes)."""
    from dagster_delta_spark.dagster_adapter import extract_date_formats

    ctx = _FakeContext(
        metadata={"partition_expr": "day_str"},
        pdef=_FakeTimeWindowDef("%Y-%m-%d"),
    )
    assert extract_date_formats(ctx) == {"day_str": "%Y-%m-%d"}


def test_p6_fmt_from_nested_multi_definition():
    """MultiPartitionsDefinition: each nested time-window dimension maps
    through partition_expr[dim.name] (reference handler.py:587-595)."""
    from dagster_delta_spark.dagster_adapter import extract_date_formats

    pdef = _FakeMultiDef([
        _FakeDim("date", _FakeTimeWindowDef("%Y%m%d")),
        _FakeDim("color", object()),  # static dimension: no fmt
    ])
    ctx = _FakeContext(
        metadata={"partition_expr": {"date": "day_int", "color": "color_col"}},
        pdef=pdef,
    )
    assert extract_date_formats(ctx) == {"day_int": "%Y%m%d"}


def test_p6_missing_partition_expr_raises():
    """Partitioned asset without partition_expr metadata raises
    (reference handler.py:560-579)."""
    from dagster_delta_spark.dagster_adapter import extract_date_formats

    with pytest.raises(ValueError, match="partition_expr"):
        extract_date_formats(_FakeContext(metadata={}, pdef=_FakeTimeWindowDef("%Y")))


def test_p6_unpartitioned_returns_none():
    from dagster_delta_spark.dagster_adapter import extract_date_formats

    assert extract_date_formats(_FakeContext(has_partitions=False)) is None


def test_p6_static_only_definition_returns_none():
    from dagster_delta_spark.dagster_adapter import extract_date_formats

    ctx = _FakeContext(
        metadata={"partition_expr": {"color": "color_col"}},
        pdef=_FakeMultiDef([_FakeDim("color", object())]),
    )
    assert extract_date_formats(ctx) is None


def test_self_dependent_partitioned_asset_e2e(spark, tmp_path):
    """The reference's SKIPPED scenario (dd tests
    test_type_handler.py:457-513: a daily-partitioned asset whose input
    is its own previous-day partition): delta-rs cannot create the
    empty day-zero table, so the reference punts.  Here day zero is an
    a-priori empty create (W5), the first load returns 0 rows with the
    right schema, and each day's write overwrites only its own
    partition."""
    from datetime import date, datetime

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DateType,
        StringType,
        StructField,
        StructType,
    )

    from dagster_delta_spark import TablePartitionDimension, TimeWindow

    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    schema = StructType([
        StructField("key", DateType()),
        StructField("a", StringType()),
    ])
    key = ["my_schema", "self_dep"]

    # day-zero: empty table with a-priori schema through the engine
    table = mgr.table_for(AssetContext(asset_key=key))
    table.write(
        spark.createDataFrame([], schema),
        WriteMode.create_or_replace,
        partition_columns=["key"],
    )

    def day_ctx(day: str) -> AssetContext:
        d = datetime.fromisoformat(day)
        return AssetContext(
            asset_key=key,
            partition_dimensions=[
                TablePartitionDimension(
                    "key", TimeWindow(d, d.replace(day=d.day + 1))
                )
            ],
        )

    def prev_day_input(day: str):
        d = datetime.fromisoformat(day)
        prev = d.replace(day=d.day - 1) if d.day > 1 else d
        return mgr.load_input(
            AssetContext(
                asset_key=key,
                partition_dimensions=[
                    TablePartitionDimension("key", TimeWindow(prev, d))
                ],
            )
        )

    def rows_for(day: str, value: str):
        d = date.fromisoformat(day)
        return spark.createDataFrame([(d, value)] * 3, schema)

    # partition 2023-01-02 reads its (empty) predecessor
    upstream = prev_day_input("2023-01-02")
    assert upstream.count() == 0
    assert [f.name for f in upstream.schema.fields] == ["key", "a"]
    mgr.handle_output(day_ctx("2023-01-02"), rows_for("2023-01-02", "1"))

    # partition 2023-01-03 sees exactly the 3 prior-day rows
    upstream = prev_day_input("2023-01-03")
    assert upstream.count() == 3
    assert {r["a"] for r in upstream.collect()} == {"1"}
    mgr.handle_output(day_ctx("2023-01-03"), rows_for("2023-01-03", "2"))

    # re-materialize day 2: only that partition is replaced
    mgr.handle_output(day_ctx("2023-01-02"), rows_for("2023-01-02", "9"))
    out = {(r["key"].isoformat(), r["a"]) for r in table.read().collect()}
    assert out == {("2023-01-02", "9"), ("2023-01-03", "2")}
    assert table.read().count() == 6


def test_formatted_window_overwrite_replaces_every_covered_partition(
    spark, tmp_path
):
    """A time window spanning several formatted string partitions must
    replace ALL of them on overwrite (half-open range DNF) — emitting
    only the window start would leave stale partitions alive next to
    their replacements, silently duplicating data."""
    from datetime import date, datetime

    from dagster_delta_spark import TablePartitionDimension, TimeWindow

    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    key = ["s", "days"]

    def rows(day: str, v: int):
        return spark.createDataFrame([(day, v)] * 2, "day_str string, v long")

    def ctx(start: str, end: str) -> AssetContext:
        return AssetContext(
            asset_key=key,
            partition_dimensions=[
                TablePartitionDimension(
                    "day_str",
                    TimeWindow(
                        datetime.fromisoformat(start),
                        datetime.fromisoformat(end),
                    ),
                )
            ],
            date_formats={"day_str": "%Y-%m-%d"},
        )

    # three single-day partitions
    for day in ("2024-03-01", "2024-03-02", "2024-03-03"):
        nxt = date.fromisoformat(day).toordinal() + 1
        mgr.handle_output(
            ctx(day, date.fromordinal(nxt).isoformat()), rows(day, 1)
        )
    table = mgr.table_for(AssetContext(asset_key=key))
    assert table.read().count() == 6

    # one two-day window overwrite replaces BOTH covered days
    mgr.handle_output(
        ctx("2024-03-01", "2024-03-03"),
        rows("2024-03-01", 9).union(rows("2024-03-02", 9)),
    )
    out = {(r["day_str"], r["v"]) for r in table.read().collect()}
    assert out == {
        ("2024-03-01", 9), ("2024-03-02", 9), ("2024-03-03", 1)
    }
    assert table.read().count() == 6

    # the matching input read sees exactly the window
    loaded = mgr.load_input(ctx("2024-03-01", "2024-03-03"))
    assert {r["day_str"] for r in loaded.collect()} == {
        "2024-03-01", "2024-03-02"
    }


def test_materialization_guard_trips(spark):
    """Collecting handlers refuse frames above the row cap with a
    message pointing at the DataFrame handler (VERDICT r4 #4: a 100 TB
    asset routed to the pandas handler must fail fast, not OOM the
    driver)."""
    from dagster_delta_spark.handler import (
        ArrowTypeHandler,
        DriverMaterializationError,
        PandasTypeHandler,
    )
    import pandas as pd

    big = spark.range(100)
    pandas_h = PandasTypeHandler(materialize_cap_rows=10)
    with pytest.raises(DriverMaterializationError, match="DataFrame handler"):
        pandas_h.from_spark(big, pd.DataFrame)
    arrow_h = ArrowTypeHandler(materialize_cap_rows=10)
    with pytest.raises(DriverMaterializationError, match="DataFrame handler"):
        import pyarrow as pa

        arrow_h.from_spark(big, pa.Table)
    # under the cap: passes through; cap<=0 disables the guard
    assert len(PandasTypeHandler(materialize_cap_rows=200).from_spark(
        big, pd.DataFrame)) == 100
    assert len(PandasTypeHandler(materialize_cap_rows=0).from_spark(
        big, pd.DataFrame)) == 100


def test_materialization_guard_env_cap(spark, monkeypatch):
    """DDS_MATERIALIZE_CAP_ROWS configures the default cap."""
    from dagster_delta_spark.handler import (
        DriverMaterializationError,
        PandasTypeHandler,
    )
    import pandas as pd

    monkeypatch.setenv("DDS_MATERIALIZE_CAP_ROWS", "5")
    with pytest.raises(DriverMaterializationError):
        PandasTypeHandler().from_spark(spark.range(6), pd.DataFrame)
    assert len(PandasTypeHandler().from_spark(
        spark.range(5), pd.DataFrame)) == 5


def test_for_type_with_typing_generic_raises_contract_error(spark, tmp_path):
    """A non-class target_type (typing generic) must surface the
    contract's UnsupportedTypeError, not an opaque issubclass
    TypeError (r6 review finding)."""
    mgr = DeltaSparkIOManager(spark, str(tmp_path))
    ctx = AssetContext(asset_key=["s", "t"])
    mgr.handle_output(ctx, two_col(spark))
    with pytest.raises(UnsupportedTypeError, match="does not have a handler"):
        mgr.load_input(ctx, target_type=list[dict])


def test_materialize_cap_env_parsing(monkeypatch):
    """Empty env value falls back to the default; garbage names the
    variable in the error."""
    from dagster_delta_spark.handler import (
        DEFAULT_MATERIALIZE_CAP_ROWS,
        _materialize_cap_rows,
    )

    monkeypatch.setenv("DDS_MATERIALIZE_CAP_ROWS", "")
    assert _materialize_cap_rows() == DEFAULT_MATERIALIZE_CAP_ROWS
    monkeypatch.setenv("DDS_MATERIALIZE_CAP_ROWS", "many")
    with pytest.raises(ValueError, match="DDS_MATERIALIZE_CAP_ROWS"):
        _materialize_cap_rows()
    monkeypatch.setenv("DDS_MATERIALIZE_CAP_ROWS", "123")
    assert _materialize_cap_rows() == 123


def test_writer_properties_scoped_per_manager(spark, tmp_path):
    """Two managers sharing one SparkSession keep their own codecs —
    writer properties ride per write, not as session confs."""
    import glob

    import pyarrow.parquet as pq

    z = DeltaSparkIOManager(spark, str(tmp_path / "z"),
                            writer_properties={"compression": "ZSTD"})
    s = DeltaSparkIOManager(spark, str(tmp_path / "s"))  # session default
    z.handle_output(AssetContext(asset_key=["a", "t"]), two_col(spark))
    s.handle_output(AssetContext(asset_key=["a", "t"]), two_col(spark))

    def codec(root):
        f = glob.glob(str(root) + "/a/t/*.parquet")[0]
        return pq.ParquetFile(f).metadata.row_group(0).column(0).compression

    assert codec(tmp_path / "z") == "ZSTD"
    assert codec(tmp_path / "s") != "ZSTD"  # default (snappy) untouched


def test_merge_mode_respects_schema_mode_and_table_config(spark, tmp_path):
    """Merge assets evolve schema under schema_mode=append and the
    auto-create path applies table_configuration (previously both were
    silently dropped)."""
    from dagster_delta_spark import MergeConfig, MergeType

    mgr = DeltaSparkIOManager(
        spark, str(tmp_path), mode=WriteMode.merge,
        merge_config=MergeConfig(MergeType.upsert, predicate="s.a = t.a"),
        schema_mode="append",
        table_config={"delta.appendOnly": "false"},
    )
    ctx = AssetContext(asset_key=["s", "t"])
    mgr.handle_output(ctx, two_col(spark))  # auto-create
    t = mgr.table_for(ctx)
    assert t.snapshot().metadata.configuration["delta.appendOnly"] == "false"
    evolved = spark.createDataFrame([(1, 4, "x")],
                                    "a bigint, b bigint, c string")
    mgr.handle_output(ctx, evolved)
    assert [f.name for f in t.schema().fields] == ["a", "b", "c"]
    rows = {r["a"]: r["c"] for r in t.read().collect()}
    assert rows[1] == "x" and rows[2] is None


def test_storage_confs_reach_hadoop_configuration(spark, tmp_path):
    """spark.hadoop.-prefixed storage confs must land in the LIVE
    Hadoop configuration with the prefix stripped — runtime
    spark.conf.set copies them verbatim, which the filesystem never
    reads (r6 review finding)."""
    from dagster_delta_spark.config import S3Config

    DeltaSparkIOManager(
        spark, str(tmp_path),
        storage_config=S3Config(access_key_id="AKITEST",
                                endpoint="http://localhost:9000"),
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AKITEST"
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"


def test_output_metadata_pinned_to_own_commit(spark, tmp_path):
    """handle_output's metadata reports the version THIS write
    committed, not whatever the head is when the metadata block runs."""
    mgr = DeltaSparkIOManager(spark, str(tmp_path), mode=WriteMode.append)
    ctx = AssetContext(asset_key=["s", "t"])
    md0 = mgr.handle_output(ctx, two_col(spark))
    md1 = mgr.handle_output(ctx, two_col(spark))
    assert (md0["table_version"], md1["table_version"]) == (0, 1)
    assert md0["row_count"] == 3 and md1["row_count"] == 6
