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
