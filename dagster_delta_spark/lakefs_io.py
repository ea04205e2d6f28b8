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
                       message_markers: tuple[str, ...] = (
                           "timeout", "s3exception", "slowdown",
                           "throttl", "concurrent")):
    """Exponential backoff + jitter: ``sleep = base * 2^n + U(0,1)``
    (reference ddp lakefs handler:23-61).  Retries ``retryable``
    exceptions always; other exceptions only when their message
    contains one of ``message_markers`` (the reference retries
    DeltaError only on timeout/S3 markers; the S3 marker here targets
    error-CLASS tokens — a bare "s3" substring would match every
    object-store PATH and retry permanent errors like access-denied
    for the full backoff budget).  delta-spark's analogue is
    ConcurrentModificationException, covered by the 'concurrent'
    marker."""

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


class InMemoryLakeFSClient:
    """Concrete :class:`BranchClient` (S5) backed by an in-process
    object store — this environment has no network, so the reference's
    REST-backed client (ddp lakefs_client_resource.py:13-56) is
    re-expressed against a dict-of-branches store with the same
    surface: branch create/commit/diff/merge/delete plus the 50 MB
    chunked ``download_file`` (lakefs_client_resource.py:33-47).

    Branch semantics follow LakeFS: ``create_branch`` snapshots the
    source branch's objects; ``diff`` yields paths whose content
    differs; ``merge`` applies the from-branch state onto the
    to-branch.  All state is per-instance and driver-side (metadata
    scale, never data scale)."""

    def __init__(self) -> None:
        # repo -> branch -> {path: bytes}
        self._repos: dict[str, dict[str, dict[str, bytes]]] = {}
        self._commits: dict[str, list[dict[str, Any]]] = {}
        # repo -> branch -> snapshot of the SOURCE at branch creation:
        # merge applies the branch's delta against this base and
        # detects conflicting concurrent edits (three-way merge, like
        # LakeFS — a wholesale branch replace would silently discard
        # writes merged by concurrent runs)
        self._bases: dict[str, dict[str, dict[str, bytes]]] = {}

    # -- store helpers -------------------------------------------------------

    def create_repository(self, repository: str, default_branch: str = "main") -> None:
        self._repos.setdefault(repository, {}).setdefault(default_branch, {})

    def _branch(self, repository: str, branch: str) -> dict[str, bytes]:
        try:
            return self._repos[repository][branch]
        except KeyError:
            raise KeyError(f"unknown branch {repository}/{branch}") from None

    def upload_object(self, repository: str, branch: str, path: str,
                      data: bytes) -> None:
        self._branch(repository, branch)[path] = bytes(data)

    def get_object(self, repository: str, branch: str, path: str) -> bytes:
        return self._branch(repository, branch)[path]

    # -- BranchClient surface ------------------------------------------------

    def create_branch(self, repository: str, branch: str, source: str) -> None:
        repo = self._repos.setdefault(repository, {})
        if branch in repo:
            raise ConflictException(f"branch {branch} already exists")
        if source not in repo:
            # LakeFS 404s here; silently branching from an implicit
            # empty snapshot would send the whole run to a branch
            # nobody reads while the real source stays untouched
            raise KeyError(f"unknown source branch {repository}/{source}")
        repo[branch] = dict(repo[source])
        self._bases.setdefault(repository, {})[branch] = dict(repo[source])

    def commit(self, repository: str, branch: str, message: str,
               allow_empty: bool = True) -> None:
        self._branch(repository, branch)  # existence check
        self._commits.setdefault(repository, []).append(
            {"branch": branch, "message": message}
        )

    def diff(self, repository: str, from_branch: str, to_branch: str):
        """Generator of changed paths (matches the reference's lazy
        diff that ``diff_has_items`` probes)."""
        a = self._branch(repository, from_branch)
        b = self._branch(repository, to_branch)
        for path in sorted(set(a) | set(b)):
            if a.get(path) != b.get(path):
                yield {"path": path}

    def merge(self, repository: str, from_branch: str, to_branch: str) -> None:
        """Three-way merge of the from-branch's DELTA (vs its creation
        base) onto the to-branch; a path changed on both sides to
        different contents raises ConflictException for the caller's
        retry loop.  (A wholesale replace lost concurrent merged
        writes: run2's stale snapshot reset main, erasing run1's
        already-merged objects.)"""
        src = self._branch(repository, from_branch)
        dst = self._branch(repository, to_branch)
        base = self._bases.get(repository, {}).get(from_branch, {})
        changed = {
            p for p in set(src) | set(base) if src.get(p) != base.get(p)
        }
        conflicts = [
            p for p in sorted(changed)
            if dst.get(p) != base.get(p) and dst.get(p) != src.get(p)
        ]
        if conflicts:
            raise ConflictException(
                f"merge conflict on {conflicts[:3]}"
                f"{'...' if len(conflicts) > 3 else ''}"
            )
        for p in changed:
            if p in src:
                dst[p] = src[p]
            else:
                dst.pop(p, None)

    def delete_branch(self, repository: str, branch: str) -> None:
        self._repos.get(repository, {}).pop(branch, None)
        self._bases.get(repository, {}).pop(branch, None)

    # -- S5: chunked download (reference lakefs_client_resource.py:33-47) ----

    def download_file(self, repository: str, branch: str, remote_path: str,
                      local_path: str, chunk_size_mb: int = 50) -> None:
        """Write an object to the local filesystem in ``chunk_size_mb``
        chunks — the reference client's loop SHAPE
        (lakefs_client_resource.py:33-47).  NB the in-memory store has
        already materialized the object (get_object returns bytes); a
        real client would pass a streaming body here, and only then
        does the chunk loop bound peak memory."""
        import io

        reader = io.BytesIO(self.get_object(repository, branch, remote_path))
        with open(local_path, "wb") as f:
            while chunk := reader.read(1024 * 1024 * chunk_size_mb):
                f.write(chunk)


def rewrite_branch_uri(uri: str, source_branch: str, new_branch: str) -> str:
    """F5: replace the *first occurrence* of the branch name in the
    table URI (reference ddp lakefs handler:73-84).  Raises when the
    URI contains no ``/{source_branch}/`` segment — a silent no-op
    would write straight onto the source branch while reporting an
    isolated run."""
    out = uri.replace(f"/{source_branch}/", f"/{new_branch}/", 1)
    if out == uri and source_branch != new_branch:
        raise ValueError(
            f"table URI {uri!r} has no '/{source_branch}/' segment to "
            "rewrite; branch isolation requires the branch in the path"
        )
    return out


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
