"""LakeFS-style transactional branch isolation around Spark writes.

Re-expresses the reference's LakeFS handler (ddp/dagster_delta_polars/
lakefs_io/deltalake_polars_lakefs_type_handler.py:23-159 and
lakefs_client_resource.py): every write happens on a per-run branch,
then commits and merges into the source branch; the branch is always
deleted.  The actual LakeFS REST client is optional (import-gated);
any object implementing :class:`BranchClient` works, which keeps the
logic testable without a server.

Engine-agnostic driver-side logic — the wrapped write itself is the
distributed Spark job.
"""

from __future__ import annotations

import functools
import random
import time
from typing import Any, Callable, Optional, Protocol

MAX_BRANCH_NAME_LENGTH = 256


class ConflictException(Exception):
    """Transaction conflict — always retried (reference O5)."""


class BranchClient(Protocol):
    """Minimal LakeFS-shaped client surface the wrapper needs
    (reference lakefs_client_resource.py:13-56)."""

    def create_branch(self, repository: str, branch: str, source: str) -> None: ...

    def commit(self, repository: str, branch: str, message: str,
               allow_empty: bool = True) -> None: ...

    def diff(self, repository: str, from_branch: str, to_branch: str) -> Any: ...

    def merge(self, repository: str, from_branch: str, to_branch: str) -> None: ...

    def delete_branch(self, repository: str, branch: str) -> None: ...


def retry_with_backoff(retries: int = 5, backoff_in_seconds: int = 4,
                       retryable: tuple[type, ...] = (ConflictException,),
                       message_markers: tuple[str, ...] = ("timeout", "S3", "concurrent")):
    """Exponential backoff + jitter: ``sleep = base * 2^n + U(0,1)``
    (reference ddp lakefs handler:23-61).  Retries ``retryable``
    exceptions always; other exceptions only when their message
    contains one of ``message_markers`` (the reference retries
    DeltaError only on timeout/S3 markers; delta-spark's analogue is
    ConcurrentModificationException, covered by the 'concurrent'
    marker)."""

    def decorator(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            n = 0
            while True:
                try:
                    return fn(*args, **kwargs)
                except retryable:
                    if n >= retries:
                        raise
                except Exception as exc:
                    if n >= retries or not any(
                        m.lower() in str(exc).lower() for m in message_markers
                    ):
                        raise
                time.sleep(backoff_in_seconds * 2**n + random.uniform(0, 1))
                n += 1

        return wrapper

    return decorator


def rewrite_branch_uri(uri: str, source_branch: str, new_branch: str) -> str:
    """F5: replace the *first occurrence* of the branch name in the
    table URI (reference ddp lakefs handler:73-84)."""
    return uri.replace(f"/{source_branch}/", f"/{new_branch}/", 1)


def diff_has_items(diff: Any) -> bool:
    """F6: generator probe — does the diff contain anything?
    (reference ddp lakefs handler:64-70)."""
    if diff is None:
        return False
    try:
        iterator = iter(diff)
    except TypeError:
        return bool(diff)
    for _ in iterator:
        return True
    return False


def branch_name_for_run(source_branch: str, run_id: str, asset_key: str) -> str:
    """O6 naming: ``{source}-step-jobid-{run_id}-asset-{key}``
    truncated to 256 chars (reference ddp lakefs handler:101-113)."""
    name = f"{source_branch}-step-jobid-{run_id}-asset-{asset_key}"
    return name[:MAX_BRANCH_NAME_LENGTH]


def write_on_branch(
    client: BranchClient,
    repository: str,
    source_branch: str,
    run_id: str,
    asset_key: str,
    table_uri: str,
    write_fn: Callable[[str], dict[str, Any]],
    commit_message: Optional[str] = None,
) -> dict[str, Any]:
    """O6: branch-create -> write -> commit -> diff -> merge-if-nonempty
    -> always delete branch (reference ddp lakefs handler:87-159).

    ``write_fn`` receives the branch-rewritten table URI and performs
    the actual (Spark) write; its result metadata is returned with the
    original URI restored plus a ``lakefs_link``.
    """
    branch = branch_name_for_run(source_branch, run_id, asset_key)
    client.create_branch(repository, branch, source_branch)

    @retry_with_backoff(5, 4)
    def _commit_merge() -> None:
        client.commit(repository, branch,
                      commit_message or f"materialize {asset_key}",
                      allow_empty=True)
        if diff_has_items(client.diff(repository, source_branch, branch)):
            client.merge(repository, branch, source_branch)

    try:
        branch_uri = rewrite_branch_uri(table_uri, source_branch, branch)
        result = write_fn(branch_uri)
        _commit_merge()
        result = dict(result)
        result["table_uri"] = table_uri  # metadata rewritten to original URI
        result["lakefs_link"] = branch_uri
        return result
    finally:
        client.delete_branch(repository, branch)  # always deleted (:157-159)
