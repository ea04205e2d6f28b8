"""Generated columns (Delta generated-column contract): writes compute
absent generated columns from their expression and VALIDATE provided
ones (null-safe equality); the flagship use is a derived partition
column, which then partition-prunes like any other."""

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.table import GeneratedColumnViolationError

GEN_CFG = {"dds.generatedColumns": '{"d": "CAST(ts AS DATE)"}'}


def _events(spark, n=6, day="2024-03-0"):
    rows = [(i, f"{day}{1 + i % 3} 10:0{i}:00") for i in range(n)]
    return spark.createDataFrame(rows, "id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp"))


def test_absent_generated_column_is_computed(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), WriteMode.error,
            partition_columns=["d"], table_configuration=GEN_CFG)
    out = t.read()
    assert "d" in out.columns
    assert out.where("d <> CAST(ts AS DATE)").count() == 0
    # derived partition column prunes like any other
    dnf = [("d", "=", "2024-03-01")]
    assert len(t.pruned_files(t.snapshot(), dnf)) < len(t.snapshot().files)
    assert t.read(dnf=dnf).count() == 2


def test_provided_generated_column_validates(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), WriteMode.error,
            table_configuration=GEN_CFG)
    ok = _events(spark, n=2).withColumn("d", F.expr("CAST(ts AS DATE)"))
    t.write(ok, WriteMode.append)  # consistent values pass
    bad = _events(spark, n=2).withColumn(
        "d", F.expr("CAST(ts AS DATE) + INTERVAL 1 DAY").cast("date"))
    with pytest.raises(GeneratedColumnViolationError, match="d"):
        t.write(bad, WriteMode.append)
    assert t.read().count() == 8  # failed write left no rows behind


def test_append_without_generated_column_keeps_computing(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), WriteMode.error, table_configuration=GEN_CFG)
    t.write(_events(spark, n=3), WriteMode.append)  # no d column again
    assert t.read().where("d <> CAST(ts AS DATE)").count() == 0
    assert t.read().count() == 9


def test_idempotent_append_computes_generated(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), WriteMode.error, table_configuration=GEN_CFG)
    res = t.idempotent_append(_events(spark, n=2), "app", 1)
    assert res["num_output_rows"] == 2
    assert t.read().where("d <> CAST(ts AS DATE)").count() == 0
    # replay no-ops
    assert t.idempotent_append(_events(spark, n=2), "app", 1)["skipped"]


def test_rename_refusals_for_generated(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), WriteMode.error, table_configuration=GEN_CFG)
    with pytest.raises(ValueError, match="generated column"):
        t.rename_column("d", "day")
    with pytest.raises(ValueError, match="referenced by generated"):
        t.rename_column("ts", "event_ts")
    with pytest.raises(ValueError, match="generated column"):
        t.drop_column("d")
    t.rename_column("id", "event_id")  # unrelated columns still rename


def test_column_defaults_fill_absent_only(spark, tmp_path):
    """Column DEFAULTS (allowColumnDefaults contract): an omitting
    write fills from the expression, a providing write passes through
    unvalidated, and history is never rewritten (pre-default files
    read null for later-added columns)."""
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    cfg = {"dds.columnDefaults":
           '{"status": "\'pending\'", "retries": "CAST(0 AS BIGINT)"}'}
    t.write(
        spark.createDataFrame([(1,)], "id long"),
        WriteMode.error, table_configuration=cfg)
    rows = t.read().collect()
    assert rows[0]["status"] == "pending" and rows[0]["retries"] == 0
    # providing write wins, no validation
    t.write(
        spark.createDataFrame([(2, "done", 5)],
                              "id long, status string, retries long"),
        WriteMode.append)
    got = {r["id"]: (r["status"], r["retries"]) for r in t.read().collect()}
    assert got == {1: ("pending", 0), 2: ("done", 5)}
    # omitting write fills again
    t.write(spark.createDataFrame([(3,)], "id long"), WriteMode.append)
    assert {r["id"]: r["status"] for r in t.read().collect()}[3] == "pending"


def test_update_recomputes_generated_and_refuses_direct(spark, tmp_path):
    """UPDATE of a generation-source column recomputes the derived
    column on the post-update row; assigning the generated column
    directly refuses (review-found gap: both previously bypassed the
    invariant entirely)."""
    import json

    cfg = {"dds.generatedColumns": json.dumps(
        {"d": "CAST(ts AS DATE)"})}
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "2024-01-10 10:00:00"), (2, "2024-02-20 10:00:00")],
            "id long, s string",
        ).selectExpr("id", "CAST(s AS TIMESTAMP) AS ts"),
        WriteMode.error, table_configuration=cfg)
    with pytest.raises(ValueError, match="generated"):
        t.update({"d": "DATE'1970-01-01'"}, "id = 1")
    t.update({"ts": "ts + INTERVAL 30 DAYS"}, "id = 1")
    rows = {r["id"]: (r["ts"], r["d"]) for r in t.read().collect()}
    assert str(rows[1][1]) == "2024-02-09"   # recomputed, not stale
    assert str(rows[2][1]) == "2024-02-20"
    # the invariant holds table-wide
    assert t.read().where("d <> CAST(ts AS DATE)").count() == 0


def test_merge_enforces_generated_consistency(spark, tmp_path):
    """MERGE requires the generation sources in the merge source,
    computes absent generated columns, and validates provided ones —
    a source carrying a lying derived value refuses."""
    import json

    from dagster_delta_spark import MergeConfig, MergeType
    from dagster_delta_spark.table import GeneratedColumnViolationError

    cfg = {"dds.generatedColumns": json.dumps(
        {"d": "CAST(ts AS DATE)"})}
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(1, "2024-01-10 10:00:00")], "id long, s string"
    ).selectExpr("id", "CAST(s AS TIMESTAMP) AS ts")
    t.write(base, WriteMode.error, table_configuration=cfg)
    # source omits d but carries ts: d computes, upsert lands
    src = spark.createDataFrame(
        [(1, "2024-03-05 09:00:00"), (2, "2024-04-01 09:00:00")],
        "id long, s string").selectExpr(
        "id", "CAST(s AS TIMESTAMP) AS ts")
    t.merge(src, MergeConfig(MergeType.upsert, predicate="s.id = t.id"))
    assert t.read().where("d <> CAST(ts AS DATE)").count() == 0
    assert t.read().count() == 2
    # source missing the GENERATION SOURCE column refuses
    with pytest.raises(ValueError, match="source column"):
        t.merge(spark.createDataFrame([(1,)], "id long"),
                MergeConfig(MergeType.upsert, predicate="s.id = t.id"))
    # a lying provided derived value refuses
    bad = src.selectExpr("id", "ts", "DATE'1970-01-01' AS d")
    with pytest.raises(GeneratedColumnViolationError):
        t.merge(bad, MergeConfig(MergeType.upsert, predicate="s.id = t.id"))


def test_update_recompute_survives_literals_chains_and_case(
        spark, tmp_path):
    """The recompute happens over the post-update PROJECTION, not by
    expression-text substitution — string literals containing a source
    column's name stay intact, generated-on-generated chains recompute
    transitively, and case-insensitive references still count."""
    import json

    cfg = {"dds.generatedColumns": json.dumps({
        # literal 'v=' contains the assigned column's name
        "tag": "concat('v=', CAST(v AS STRING))",
        # chained: depends on a generated column, referenced in CAPS
        "tag2": "upper(TAG)",
    })}
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 7), (2, 9)], "id long, v long"),
            WriteMode.error, table_configuration=cfg)
    t.update({"v": "v + 100"}, "id = 1")
    rows = {r["id"]: (r["tag"], r["tag2"]) for r in t.read().collect()}
    assert rows[1] == ("v=107", "V=107")
    assert rows[2] == ("v=9", "V=9")
    # DV flavor takes the other staging path — same contract
    t.update({"v": "v + 1000"}, "id = 2", use_dv=True)
    rows = {r["id"]: (r["tag"], r["tag2"]) for r in t.read().collect()}
    assert rows[2] == ("v=1009", "V=1009")
