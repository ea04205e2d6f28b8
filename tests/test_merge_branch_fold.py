"""Pins the single-pass MERGE rewrite projection (r15 optimization).

The rewrite used to union one filtered select per branch
(matched-update / target-only / insert), re-executing the full-outer
join per branch; it is now ONE projection that takes the source side
when present and the target side otherwise.  These tests pin the edge
cases where a value-based (rather than marker-based) fold would
diverge: source rows carrying NULLs in updated columns, sources
omitting table columns, and the identity path that still needs the
separate insert branch.
"""

from pyspark.sql import functions as F

from dagster_delta_spark import (
    DeltaSparkTable,
    MergeConfig,
    MergeType,
    WriteMode,
)


def _base(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, n int")
    t.write(df, WriteMode.error)
    return t


def test_upsert_matched_takes_source_null(spark, tmp_table):
    # a matched row whose SOURCE value is NULL must take the NULL
    # (marker semantics), not keep the target value — a value-based
    # coalesce would silently keep 'b'
    t = _base(spark, tmp_table)
    src = spark.createDataFrame([(2, None, 99), (4, None, 40)],
                                "k int, v string, n int")
    t.merge(src, MergeConfig(MergeType.upsert, predicate="s.k = t.k"))
    rows = {r["k"]: (r["v"], r["n"]) for r in t.read().collect()}
    assert rows == {1: ("a", 10), 2: (None, 99), 3: ("c", 30),
                    4: (None, 40)}


def test_upsert_source_missing_column_keeps_target_and_nulls_insert(
        spark, tmp_table):
    # source omits 'v': matched rows keep the target v, inserted rows
    # get NULL v — both from the same folded projection
    t = _base(spark, tmp_table)
    src = spark.createDataFrame([(3, 333), (5, 555)], "k int, n int")
    t.merge(src, MergeConfig(MergeType.upsert, predicate="s.k = t.k"))
    rows = {r["k"]: (r["v"], r["n"]) for r in t.read().collect()}
    assert rows == {1: ("a", 10), 2: ("b", 20), 3: ("c", 333),
                    5: (None, 555)}


def test_update_only_never_inserts(spark, tmp_table):
    t = _base(spark, tmp_table)
    src = spark.createDataFrame([(2, None, 99), (7, "x", 70)],
                                "k int, v string, n int")
    t.merge(src, MergeConfig(MergeType.update_only, predicate="s.k = t.k"))
    rows = {r["k"]: (r["v"], r["n"]) for r in t.read().collect()}
    assert rows == {1: ("a", 10), 2: (None, 99), 3: ("c", 30)}


def test_upsert_with_identity_still_allocates(spark, tmp_table):
    # identity tables keep the separate insert branch (allocation is
    # per-branch); carried rows keep their ids, inserts get fresh ones
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame([(10, None), (20, None)], "n int, m int")
    t.write(df, WriteMode.error, table_configuration={
        "dds.identityColumns": '{"rid": {}}'})
    src = spark.createDataFrame([(20, 200), (30, 300)], "n int, m int")
    t.merge(src, MergeConfig(MergeType.upsert, predicate="s.n = t.n"))
    out = t.read().collect()
    rids = sorted(r["rid"] for r in out)
    assert len(rids) == len(set(rids)) == 3  # dense unique ids
    by_n = {r["n"]: r for r in out}
    assert by_n[20]["m"] == 200 and by_n[30]["m"] == 300
    assert by_n[10]["m"] is None
