"""convert_from_delta: onboarding a REAL Delta Lake table (public
delta-io protocol, ``_delta_log/`` JSON commits — what delta-rs
writes) into this engine's format in place.

Fixtures hand-write Delta logs per the public spec: protocol /
metaData (schemaString = Spark StructType JSON) / add (stats as a
JSON string, partitionValues dict) / remove / txn actions, one JSON
object per line, zero-padded 20-digit version file names."""

import json
import os

import pytest

from dagster_delta_spark import (
    DeltaSparkTable,
    TableExistsError,
    WriteMode,
    convert_from_delta,
)


def _stage_file(spark, df, root, rel):
    """Write df as ONE parquet file at root/rel."""
    tmp = os.path.join(root, "_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    dst = os.path.join(root, rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.replace(os.path.join(tmp, part), dst)
    import shutil

    shutil.rmtree(tmp)
    return dst


def _write_log(root, commits):
    d = os.path.join(root, "_delta_log")
    os.makedirs(d, exist_ok=True)
    for v, actions in enumerate(commits):
        with open(os.path.join(d, f"{v:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")


def _proto(mrv=1, mwv=2):
    return {"protocol": {"minReaderVersion": mrv, "minWriterVersion": mwv}}


def _meta(spark, df, pcols=(), cfg=None):
    return {"metaData": {
        "id": "11111111-2222-3333-4444-555555555555",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": df.schema.json(),
        "partitionColumns": list(pcols),
        "configuration": cfg or {},
        "createdTime": 1700000000000,
    }}


def _add(root, rel, n, pv=None, extra_stats=None, **kw):
    st = {"numRecords": n, **(extra_stats or {})}
    d = {"path": rel, "partitionValues": pv or {}, "dataChange": True,
         "size": os.path.getsize(os.path.join(root, rel)),
         "modificationTime": 1700000000000,
         "stats": json.dumps(st), **kw}
    return {"add": d}


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS a", "CAST(id * 2 AS DOUBLE) AS b",
        "CAST(id AS STRING) AS s")


def test_basic_convert_with_removes_and_txn(spark, tmp_path):
    root = str(tmp_path / "d")
    os.makedirs(root)
    f1 = _stage_file(spark, _df(spark, 0, 5), root, "part-f1.parquet")
    _stage_file(spark, _df(spark, 5, 9), root, "part-f2.parquet")
    _stage_file(spark, _df(spark, 9, 12), root, "part-f3.parquet")
    _write_log(root, [
        [_proto(), _meta(spark, _df(spark, 0, 1)),
         _add(root, "part-f1.parquet", 5),
         _add(root, "part-f2.parquet", 4)],
        [{"remove": {"path": "part-f2.parquet",
                     "deletionTimestamp": 1700000001000,
                     "dataChange": True}},
         _add(root, "part-f3.parquet", 3),
         {"txn": {"appId": "upstream-stream", "version": 41}}],
    ])
    res = convert_from_delta(spark, root)
    assert (res["num_files"], res["num_rows"]) == (2, 8)
    assert res["delta_version"] == 1
    t = DeltaSparkTable(spark, root)
    got = sorted(r["a"] for r in t.read().collect())
    assert got == list(range(0, 5)) + list(range(9, 12))
    # the SetTransaction ledger carried over — and survives a
    # COLD-CACHE replay of the committed version-0 JSON (the ledger
    # must live in the commit's txn actions, not just the cached
    # snapshot)
    assert t.last_txn_version("upstream-stream") == 41
    from dagster_delta_spark import tablelog as tl

    tl._SNAPSHOT_CACHE.clear()
    assert DeltaSparkTable(spark, root).last_txn_version(
        "upstream-stream") == 41
    # and the converted table is fully writable
    t.write(_df(spark, 100, 102), WriteMode.append)
    assert t.read().count() == 10
    assert t.read(version=0).count() == 8  # time travel from v0
    _ = os.stat(os.path.join(root, "part-f1.parquet"))  # bytes untouched


def test_partitioned_and_stats_sanitized(spark, tmp_path):
    root = str(tmp_path / "d")
    os.makedirs(root)
    df = spark.range(0, 6).selectExpr(
        "id AS a", "CAST(id AS STRING) AS s",
        "DATE'2024-01-05' AS dt")
    data = df.drop("dt")
    _stage_file(spark, data.where("a < 3"), root, "p=x/f1.parquet")
    _stage_file(spark, data.where("a >= 3"), root, "p=y/f2.parquet")
    pdf = df.selectExpr("a", "s", "dt", "'x' AS p").limit(0)
    _write_log(root, [[
        _proto(), _meta(spark, pdf, pcols=["p"]),
        _add(root, "p=x/f1.parquet", 3, pv={"p": "x"},
             extra_stats={"minValues": {"a": 0, "s": "0",
                                        "dt": "2024-01-05"},
                          "maxValues": {"a": 2, "s": "2",
                                        "dt": "2024-01-05"},
                          "nullCount": {"a": 0}}),
        _add(root, "p=y/f2.parquet", 3, pv={"p": "y"}),
    ]])
    convert_from_delta(spark, root)
    t = DeltaSparkTable(spark, root)
    assert t.read().count() == 6
    assert {r["p"] for r in t.read().select("p").collect()} == {"x", "y"}
    # partition pruning works off the carried partitionValues
    assert t.read(dnf=[("p", "=", "x")]).count() == 3
    # date min/max dropped (rendering risk), int/string kept
    a = [f for f in t.snapshot().files if f.path == "p=x/f1.parquet"][0]
    assert "dt" not in a.stats["minValues"]
    assert a.stats["minValues"]["a"] == 0
    assert a.stats["nullCount"] == {"a": 0}


def test_append_only_maps_and_refusals(spark, tmp_path):
    root = str(tmp_path / "d")
    os.makedirs(root)
    _stage_file(spark, _df(spark, 0, 4), root, "f1.parquet")
    _write_log(root, [[
        _proto(),
        _meta(spark, _df(spark, 0, 1),
              cfg={"delta.appendOnly": "true", "custom.key": "v"}),
        _add(root, "f1.parquet", 4),
    ]])
    convert_from_delta(spark, root)
    t = DeltaSparkTable(spark, root)
    det = t.describe_detail()
    assert det["properties"]["dds.appendOnly"] == "true"
    assert det["properties"]["custom.key"] == "v"
    with pytest.raises(ValueError, match="append-only"):
        t.delete("a = 1")
    t.write(_df(spark, 4, 6), WriteMode.append)  # appends still fine


@pytest.mark.parametrize("breaker,match", [
    (lambda r, s: [_proto(mrv=2), _meta(s, _df(s, 0, 1)),
                   _add(r, "f1.parquet", 4)], "minReaderVersion=2"),
    (lambda r, s: [_proto(),
                   _meta(s, _df(s, 0, 1),
                         cfg={"delta.columnMapping.mode": "name"}),
                   _add(r, "f1.parquet", 4)], "columnMapping"),
    (lambda r, s: [_proto(), _meta(s, _df(s, 0, 1)),
                   _add(r, "f1.parquet", 4,
                        deletionVector={"storageType": "u",
                                        "pathOrInlineDv": "x",
                                        "offset": 1, "sizeInBytes": 40,
                                        "cardinality": 2})],
     "deletion vector"),
    (lambda r, s: [_proto(), _meta(s, _df(s, 0, 1)),
                   {"add": {"path": "s3://bucket/f.parquet",
                            "partitionValues": {}, "size": 1,
                            "modificationTime": 1, "dataChange": True,
                            "stats": "{\"numRecords\": 1}"}}],
     "absolute"),
])
def test_refusals(spark, tmp_path, breaker, match):
    root = str(tmp_path / "d")
    os.makedirs(root)
    _stage_file(spark, _df(spark, 0, 4), root, "f1.parquet")
    _write_log(root, [breaker(root, spark)])
    with pytest.raises(ValueError, match=match):
        convert_from_delta(spark, root)
    assert not DeltaSparkTable(spark, root).exists()


def test_truncated_log_and_missing_file_refuse(spark, tmp_path):
    root = str(tmp_path / "d")
    os.makedirs(root)
    _stage_file(spark, _df(spark, 0, 4), root, "f1.parquet")
    _write_log(root, [
        [_proto(), _meta(spark, _df(spark, 0, 1)),
         _add(root, "f1.parquet", 4)],
    ])
    # simulate Delta log cleanup: version 0 gone
    os.rename(os.path.join(root, "_delta_log/" + "0" * 20 + ".json"),
              os.path.join(root, "_delta_log/" + "0" * 19 + "1.json"))
    with pytest.raises(ValueError, match="contiguous JSON tail"):
        convert_from_delta(spark, root)
    os.rename(os.path.join(root, "_delta_log/" + "0" * 19 + "1.json"),
              os.path.join(root, "_delta_log/" + "0" * 20 + ".json"))
    os.remove(os.path.join(root, "f1.parquet"))
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        convert_from_delta(spark, root)


def test_already_converted_refuses(spark, tmp_path):
    root = str(tmp_path / "d")
    os.makedirs(root)
    _stage_file(spark, _df(spark, 0, 4), root, "f1.parquet")
    _write_log(root, [[_proto(), _meta(spark, _df(spark, 0, 1)),
                       _add(root, "f1.parquet", 4)]])
    convert_from_delta(spark, root)
    with pytest.raises(TableExistsError):
        convert_from_delta(spark, root)


def test_dry_run(spark, tmp_path):
    root = str(tmp_path / "d")
    os.makedirs(root)
    _stage_file(spark, _df(spark, 0, 4), root, "f1.parquet")
    _write_log(root, [[_proto(), _meta(spark, _df(spark, 0, 1)),
                       _add(root, "f1.parquet", 4)]])
    res = convert_from_delta(spark, root, dry_run=True)
    assert res == {"dry_run": True, "num_files": 1, "num_rows": 4,
                   "partition_columns": [], "delta_version": 0}
    assert not DeltaSparkTable(spark, root).exists()
