"""DNF mini-compiler unit tests (reference: dd tests
test_io_manager.py:37-54 and handler.py:397-480 behaviors)."""

from datetime import date, datetime, timezone

import pytest
from pyspark.sql.types import (
    DateType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dagster_delta_spark import TablePartitionDimension, TimeWindow
from dagster_delta_spark.plans.predicates import (
    dnf_to_sql,
    get_select_statement,
    partition_dimensions_to_dnf,
)

SCHEMA = StructType([
    StructField("string_col", StringType()),
    StructField("date_col", DateType()),
    StructField("timestamp_col", TimestampType()),
    StructField("int_col", IntegerType()),
])

WINDOW = TimeWindow(datetime(2020, 1, 2), datetime(2020, 2, 3))


def test_timestamp_output_dnf():
    """Reference golden (test_io_manager.py:37-54) pins '=' window
    start on output; we emit the half-open range instead — the '='
    shape under-deletes windows spanning several partition values
    (documented divergence, see _time_window_partition_dnf)."""
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("timestamp_col", WINDOW)], SCHEMA
    )
    assert dnf == [
        ("timestamp_col", ">=", datetime(2020, 1, 2)),
        ("timestamp_col", "<", datetime(2020, 2, 3)),
    ]


def test_date_output_dnf():
    """Write path emits the half-open range too (the reference's
    '='-start shape, handler.py:479-480, under-deletes windows spanning
    several partition values — documented divergence)."""
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("date_col", WINDOW)], SCHEMA
    )
    assert dnf == [
        ("date_col", ">=", date(2020, 1, 2)),
        ("date_col", "<", date(2020, 2, 3)),
    ]


def test_input_dnf_is_half_open_range():
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("timestamp_col", WINDOW)], SCHEMA, input_dnf=True
    )
    assert dnf == [
        ("timestamp_col", ">=", datetime(2020, 1, 2)),
        ("timestamp_col", "<", datetime(2020, 2, 3)),
    ]


def test_multi_window_collapse():
    """Multiple windows collapse to [min(start), max(end))
    (handler.py:448-458)."""
    w2 = TimeWindow(datetime(2020, 3, 1), datetime(2020, 4, 1))
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("timestamp_col", [WINDOW, w2])],
        SCHEMA,
        input_dnf=True,
    )
    assert dnf == [
        ("timestamp_col", ">=", datetime(2020, 1, 2)),
        ("timestamp_col", "<", datetime(2020, 4, 1)),
    ]


def test_tz_stripped():
    """tz-aware windows are naive-ified (handler.py:450-458)."""
    w = TimeWindow(
        datetime(2020, 1, 2, tzinfo=timezone.utc),
        datetime(2020, 2, 3, tzinfo=timezone.utc),
    )
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("timestamp_col", w)], SCHEMA
    )
    assert dnf == [
        ("timestamp_col", ">=", datetime(2020, 1, 2)),
        ("timestamp_col", "<", datetime(2020, 2, 3)),
    ]


def test_static_single_key_is_eq():
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("string_col", ["red"])], SCHEMA
    )
    assert dnf == [("string_col", "=", "red")]


def test_static_multi_key_is_in_and_deduped():
    """Static keys dedup (handler.py:435)."""
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("string_col", ["red", "blue", "red"])], SCHEMA
    )
    assert dnf == [("string_col", "in", ["blue", "red"])]


def test_time_window_against_string_column_uses_fmt():
    """P3: windows against string partition cols format via fmt into
    the half-open range [fmt(start), fmt(end)) (handler.py:422-432)."""
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("string_col", WINDOW)],
        SCHEMA,
        date_formats={"string_col": "%Y-%m-%d"},
    )
    assert dnf == [
        ("string_col", ">=", "2020-01-02"),
        ("string_col", "<", "2020-02-03"),
    ]


def test_time_window_against_int_column_casts():
    """P3: int partition columns cast the formatted range bounds
    (handler.py:425-427)."""
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("int_col", WINDOW)],
        SCHEMA,
        date_formats={"int_col": "%Y%m%d"},
    )
    assert dnf == [("int_col", ">=", 20200102), ("int_col", "<", 20200203)]


def test_time_window_against_string_column_without_fmt_raises():
    """P3: a TimeWindow against a string/int column with no fmt raises,
    like the reference (handler.py:414)."""
    import pytest

    with pytest.raises(ValueError, match="[Dd]ate format"):
        partition_dimensions_to_dnf(
            [TablePartitionDimension("string_col", WINDOW)], SCHEMA
        )


def test_dnf_to_sql_literals():
    """P4 literal rendering; typed timestamp literals instead of the
    reference's µs epoch (handler.py:47-67)."""
    sql = dnf_to_sql([
        ("s", "=", "o'neil"),
        ("n", "in", [1, 2]),
        ("t", ">=", datetime(2020, 1, 2, 3, 4, 5)),
        ("d", "<", date(2020, 1, 2)),
        ("b", "=", True),
    ])
    assert sql == (
        "s = 'o''neil' AND n IN (1, 2) AND "
        "t >= TIMESTAMP '2020-01-02 03:04:05' AND "
        "d < DATE '2020-01-02' AND b = TRUE"
    )


def test_dnf_to_sql_qualifier():
    assert dnf_to_sql([("c", "=", "x")], qualifier="t") == "t.c = 'x'"


def test_select_statement():
    """P7 illustrative SELECT (io_manager.py:234-244)."""
    stmt = get_select_statement(
        "tbl", "sch", ["a", "b"], [("c", "=", "x")]
    )
    assert stmt == "SELECT a, b FROM sch.tbl WHERE c = 'x'"


def test_empty_windows_raise():
    with pytest.raises(ValueError):
        partition_dimensions_to_dnf(
            [TablePartitionDimension("timestamp_col", [])], SCHEMA
        )


def test_legacy_window_scope_matches_reference():
    """Opt-in reference compat (mirrors the reference's own DNF test,
    dd tests test_io_manager.py:37-54 / handler.py:478-479): the write
    path pins '=' start — timestamp and date — and skips the
    contiguity guard the default mode enforces."""
    for col, want in [
        ("timestamp_col", datetime(2020, 1, 2)),
        ("date_col", date(2020, 1, 2)),
    ]:
        dims = [TablePartitionDimension(col, WINDOW)]
        dnf = partition_dimensions_to_dnf(
            dims, SCHEMA, input_dnf=False, legacy_window_scope=True
        )
        assert dnf == [(col, "=", want)]
    # gapped windows: default write path raises, legacy mode pins
    # min(start) exactly as the reference collapses them
    gapped = [TablePartitionDimension(
        "timestamp_col",
        [TimeWindow(datetime(2020, 1, 1), datetime(2020, 1, 2)),
         TimeWindow(datetime(2020, 1, 9), datetime(2020, 1, 10))],
    )]
    with pytest.raises(ValueError, match="non-contiguous"):
        partition_dimensions_to_dnf(gapped, SCHEMA, input_dnf=False)
    dnf = partition_dimensions_to_dnf(
        gapped, SCHEMA, input_dnf=False, legacy_window_scope=True
    )
    assert dnf == [("timestamp_col", "=", datetime(2020, 1, 1))]
    # the read path is untouched by the flag
    dnf = partition_dimensions_to_dnf(
        [TablePartitionDimension("timestamp_col", WINDOW)],
        SCHEMA, input_dnf=True, legacy_window_scope=True,
    )
    assert dnf == [
        ("timestamp_col", ">=", datetime(2020, 1, 2)),
        ("timestamp_col", "<", datetime(2020, 2, 3)),
    ]


def test_engulfing_windows_are_contiguous():
    """A window covering later ones must not be rejected as gapped
    (running-max-end coverage, not pairwise adjacency)."""
    dims = [TablePartitionDimension(
        "timestamp_col",
        [TimeWindow(datetime(2020, 1, 1), datetime(2020, 1, 10)),
         TimeWindow(datetime(2020, 1, 2), datetime(2020, 1, 3)),
         TimeWindow(datetime(2020, 1, 4), datetime(2020, 1, 5))],
    )]
    dnf = partition_dimensions_to_dnf(dims, SCHEMA, input_dnf=False)
    assert dnf == [
        ("timestamp_col", ">=", datetime(2020, 1, 1)),
        ("timestamp_col", "<", datetime(2020, 1, 10)),
    ]
