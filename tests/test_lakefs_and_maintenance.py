"""LakeFS branch isolation (O5/O6), retry, optimize/vacuum,
concurrency."""

import threading

import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.lakefs_io import (
    ConflictException,
    branch_name_for_run,
    diff_has_items,
    retry_with_backoff,
    rewrite_branch_uri,
    write_on_branch,
)


class FakeClient:
    def __init__(self, diff_items=(1,)):
        self.calls = []
        self._diff = list(diff_items)

    def create_branch(self, repo, branch, source):
        self.calls.append(("create", branch, source))

    def commit(self, repo, branch, message, allow_empty=True):
        self.calls.append(("commit", branch))

    def diff(self, repo, from_branch, to_branch):
        self.calls.append(("diff", from_branch, to_branch))
        return iter(self._diff)

    def merge(self, repo, from_branch, to_branch):
        self.calls.append(("merge", from_branch, to_branch))

    def delete_branch(self, repo, branch):
        self.calls.append(("delete", branch))


def test_branch_lifecycle_with_merge():
    client = FakeClient(diff_items=(1,))
    result = write_on_branch(
        client, "repo", "main", "run1", "asset1",
        "s3://repo/main/table", lambda uri: {"written_to": uri},
    )
    ops = [c[0] for c in client.calls]
    assert ops == ["create", "commit", "diff", "merge", "delete"]
    assert result["table_uri"] == "s3://repo/main/table"
    assert "main-step-jobid-run1-asset-asset1" in result["lakefs_link"]


def test_branch_no_merge_on_empty_diff():
    """Merge only if diff non-empty (ddp lakefs handler:64-70)."""
    client = FakeClient(diff_items=())
    write_on_branch(client, "repo", "main", "r", "a",
                    "s3://repo/main/t", lambda uri: {})
    assert "merge" not in [c[0] for c in client.calls]
    assert ("delete", branch_name_for_run("main", "r", "a")) in client.calls


def test_branch_deleted_on_write_failure():
    """Branch always deleted in finally (ddp lakefs handler:157-159)."""
    client = FakeClient()

    def boom(uri):
        raise RuntimeError("write failed")

    with pytest.raises(RuntimeError):
        write_on_branch(client, "repo", "main", "r", "a",
                        "s3://repo/main/t", boom)
    assert client.calls[-1][0] == "delete"


def test_branch_name_truncated():
    name = branch_name_for_run("main", "r" * 300, "a")
    assert len(name) == 256


def test_uri_rewrite_first_occurrence_only():
    assert rewrite_branch_uri("s3://r/main/t/main/x", "main", "b") == (
        "s3://r/b/t/main/x"
    )


def test_diff_has_items():
    assert diff_has_items(iter([1]))
    assert not diff_has_items(iter([]))
    assert not diff_has_items(None)


def test_retry_with_backoff(monkeypatch):
    """sleep = base*2^n + U(0,1); ConflictException always retried
    (ddp lakefs handler:23-61)."""
    sleeps = []
    monkeypatch.setattr("time.sleep", lambda s: sleeps.append(s))
    attempts = []

    @retry_with_backoff(retries=3, backoff_in_seconds=1)
    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise ConflictException("conflict")
        return "ok"

    assert flaky() == "ok"
    assert len(attempts) == 3
    assert 1.0 <= sleeps[0] <= 2.0 and 2.0 <= sleeps[1] <= 3.0


def test_retry_marker_matching(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    n = [0]

    @retry_with_backoff(retries=2)
    def timeout_error():
        n[0] += 1
        raise RuntimeError("connection timeout while writing")

    with pytest.raises(RuntimeError):
        timeout_error()
    assert n[0] == 3  # retried (marker matched)

    m = [0]

    @retry_with_backoff(retries=2)
    def fatal():
        m[0] += 1
        raise RuntimeError("schema mismatch")

    with pytest.raises(RuntimeError):
        fatal()
    assert m[0] == 1  # not retried


def test_optimize_compacts_small_files(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame([(i,) for i in range(100)], "v bigint")
    t.write(df.repartition(10), WriteMode.overwrite)
    n_before = len(t.snapshot().files)
    res = t.optimize()
    assert res["rewritten_files"] == n_before
    assert len(t.snapshot().files) < n_before
    assert t.read().count() == 100


def test_vacuum_removes_unreferenced(spark, tmp_table):
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.createDataFrame([(1,)], "v bigint")
    t.write(df, WriteMode.overwrite)
    t.write(df, WriteMode.overwrite)  # first file now unreferenced
    deleted = t.vacuum(retention_ms=0)
    assert deleted
    assert t.read().count() == 1


def test_concurrent_appends_both_commit(spark, tmp_table):
    """Optimistic concurrency: two appends race; both rows land."""
    t = DeltaSparkTable(spark, tmp_table)
    t.write(spark.createDataFrame([(0,)], "v bigint"), WriteMode.overwrite)
    errors = []

    def append(v):
        try:
            DeltaSparkTable(spark, tmp_table).write(
                spark.createDataFrame([(v,)], "v bigint"), WriteMode.append
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=append, args=(i,)) for i in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert sorted(r["v"] for r in t.read().collect()) == [0, 1, 2]
    assert t.version() == 2


# -- S5: concrete in-memory client ------------------------------------------


def _mk_client():
    from dagster_delta_spark.lakefs_io import InMemoryLakeFSClient

    c = InMemoryLakeFSClient()
    c.create_repository("repo", "main")
    c.upload_object("repo", "main", "tables/t/part-0.parquet", b"v0")
    return c


def test_inmemory_client_write_on_branch_e2e():
    """Full S5/O6 flow against the concrete client: write lands on the
    run branch, merges into main, branch always deleted."""
    from dagster_delta_spark.lakefs_io import write_on_branch

    c = _mk_client()

    def write_fn(branch_uri):
        # branch_uri carries the run branch name: s3://repo/<branch>/tables/t
        branch = branch_uri.split("/")[3]
        c.upload_object("repo", branch, "tables/t/part-1.parquet", b"v1")
        return {"num_output_rows": 1}

    out = write_on_branch(
        c, "repo", "main", run_id="r1", asset_key="t",
        table_uri="s3://repo/main/tables/t", write_fn=write_fn,
    )
    assert out["table_uri"] == "s3://repo/main/tables/t"
    assert c.get_object("repo", "main", "tables/t/part-1.parquet") == b"v1"
    assert ["main"] == sorted(c._repos["repo"])  # run branch deleted


def test_inmemory_client_merge_retries_on_conflict():
    """Transient merge conflicts retry with backoff and succeed
    (reference O5 retry contract)."""
    from dagster_delta_spark.lakefs_io import ConflictException, write_on_branch

    c = _mk_client()
    calls = {"merge": 0}
    real_merge = c.merge

    def flaky_merge(repository, from_branch, to_branch):
        calls["merge"] += 1
        if calls["merge"] <= 2:
            raise ConflictException("concurrent merge in progress")
        real_merge(repository, from_branch, to_branch)

    c.merge = flaky_merge

    def write_fn(branch_uri):
        branch = branch_uri.split("/")[3]
        c.upload_object("repo", branch, "tables/t/part-2.parquet", b"v2")
        return {}

    import dagster_delta_spark.lakefs_io as lio
    import time as _time

    orig_sleep = _time.sleep
    _time.sleep = lambda s: orig_sleep(0)  # don't wait out the backoff
    try:
        write_on_branch(c, "repo", "main", "r2", "t",
                        "s3://repo/main/tables/t", write_fn)
    finally:
        _time.sleep = orig_sleep
    assert calls["merge"] == 3
    assert c.get_object("repo", "main", "tables/t/part-2.parquet") == b"v2"


def test_inmemory_client_chunked_download(tmp_path):
    """S5 download loop: content reassembles exactly from multiple
    chunks (reference lakefs_client_resource.py:33-47)."""
    from dagster_delta_spark.lakefs_io import InMemoryLakeFSClient

    c = InMemoryLakeFSClient()
    c.create_repository("repo", "main")
    payload = bytes(range(256)) * 40000  # ~10 MB
    c.upload_object("repo", "main", "obj.bin", payload)
    dest = tmp_path / "obj.bin"
    c.download_file("repo", "main", "obj.bin", str(dest), chunk_size_mb=1)
    assert dest.read_bytes() == payload


def test_vacuum_spares_auxiliary_dirs(spark, tmp_table):
    """Vacuum never touches _/.-prefixed dirs (log, staging, streaming
    checkpoints, state stores) even for old unreferenced parquet."""
    import os
    import time

    t = DeltaSparkTable(spark, tmp_table)
    t.write(spark.range(5), WriteMode.error)
    ckpt = os.path.join(tmp_table, "_stream_checkpoint", "state")
    os.makedirs(ckpt)
    aux = os.path.join(ckpt, "1.parquet")
    with open(aux, "wb") as f:
        f.write(b"not a real parquet")
    old = time.time() - 100 * 24 * 3600
    os.utime(aux, (old, old))
    deleted = t.vacuum(retention_ms=0)
    assert os.path.exists(aux)
    assert all("_stream_checkpoint" not in p for p in deleted)


def test_concurrent_appends_with_compaction_stress(spark, tmp_table):
    """6 writer threads x 4 appends racing a concurrent compactor: every
    append must commit exactly once (optimistic retry), compactions must
    never drop concurrent rows, and the final state must hold all rows."""
    import threading

    t = DeltaSparkTable(spark, tmp_table)
    t.write(spark.range(0, 10), WriteMode.error)
    errors = []

    def writer(wid):
        try:
            tw = DeltaSparkTable(spark, tmp_table)
            for i in range(4):
                lo = 1000 * (wid + 1) + 10 * i
                tw.write(spark.range(lo, lo + 10), WriteMode.append)
        except Exception as e:  # noqa: BLE001
            errors.append(("w", wid, repr(e)))

    def compactor():
        from dagster_delta_spark.tablelog import ConcurrentDeleteError
        tc = DeltaSparkTable(spark, tmp_table)
        for _ in range(3):
            try:
                tc.optimize(target_file_size=1 << 20)
            except ConcurrentDeleteError:
                pass  # legitimate abort under contention
            except Exception as e:  # noqa: BLE001
                errors.append(("c", 0, repr(e)))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(6)]
    threads.append(threading.Thread(target=compactor))
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert t.read().count() == 10 + 6 * 4 * 10
    # all 24 appends committed as distinct versions (plus any compactions)
    assert t.version() >= 24


def test_lakefs_merge_is_three_way_not_replace():
    """Two runs branch from main concurrently and merge disjoint
    writes: BOTH must survive (the old wholesale branch replace reset
    main to the second run's stale snapshot, silently erasing the
    first run's merged objects); the same path changed differently on
    both sides conflicts."""
    import pytest as _pytest

    from dagster_delta_spark.lakefs_io import (
        ConflictException,
        InMemoryLakeFSClient,
    )

    c = InMemoryLakeFSClient()
    c.create_repository("repo")
    c.upload_object("repo", "main", "base.txt", b"base")
    c.create_branch("repo", "run1", "main")
    c.create_branch("repo", "run2", "main")   # branched BEFORE run1 merges
    c.upload_object("repo", "run1", "part-1", b"one")
    c.merge("repo", "run1", "main")
    c.upload_object("repo", "run2", "part-2", b"two")
    c.merge("repo", "run2", "main")
    main = c._repos["repo"]["main"]
    assert main["part-1"] == b"one" and main["part-2"] == b"two"
    assert main["base.txt"] == b"base"

    # conflicting edit of the same path
    c.create_branch("repo", "run3", "main")
    c.create_branch("repo", "run4", "main")
    c.upload_object("repo", "run3", "shared", b"A")
    c.merge("repo", "run3", "main")
    c.upload_object("repo", "run4", "shared", b"B")
    with _pytest.raises(ConflictException):
        c.merge("repo", "run4", "main")

    # unknown source branch 404s instead of silently branching empty
    with _pytest.raises(KeyError):
        c.create_branch("repo", "oops", "mian")


def test_rewrite_branch_uri_requires_branch_segment():
    import pytest as _pytest

    from dagster_delta_spark.lakefs_io import rewrite_branch_uri

    assert rewrite_branch_uri("s3://r/main/t", "main", "b") == "s3://r/b/t"
    with _pytest.raises(ValueError, match="no '/main/'"):
        rewrite_branch_uri("s3://r/maintable", "main", "b")


def test_read_jsonl_surfaces_corrupt_lines_with_explicit_schema(
    spark, tmp_path
):
    """With an explicit schema, corrupt lines must land in
    _corrupt_record (auto-appended) instead of silently becoming
    all-null data rows."""
    from pyspark.sql.types import LongType, StringType, StructType

    from dagster_delta_spark.sources import read_jsonl

    p = tmp_path / "c.jsonl"
    p.write_text('{"id": 1, "tag": "x"}\nnot json at all\n')
    schema = (StructType().add("id", LongType()).add("tag", StringType()))
    df = read_jsonl(spark, str(p), schema)
    rows = df.collect()
    assert "_corrupt_record" in df.columns
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("not json")


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    import os

    from dagster_delta_spark import DeltaSparkTable, WriteMode

    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(spark.range(0, 10).selectExpr("id AS k"), WriteMode.error)
    t.write(spark.range(10, 20).selectExpr("id AS k"), WriteMode.overwrite)
    would = t.vacuum(retention_ms=0, dry_run=True)
    assert would  # v0's files are unreferenced now
    # nothing touched: every reported file still on disk, reads intact
    for rel in would:
        assert os.path.exists(os.path.join(t.table_uri, rel)), rel
    assert t.read(version=0).count() == 10  # time travel still works
    # the real run reclaims exactly the reported set
    assert sorted(t.vacuum(retention_ms=0)) == sorted(would)
    for rel in would:
        assert not os.path.exists(os.path.join(t.table_uri, rel)), rel
