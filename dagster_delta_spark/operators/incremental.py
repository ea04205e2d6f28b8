"""Incremental maintenance over the table log: materialized
aggregates and the four index families (IVF inverted lists, MinHash-
LSH buckets, PQ codes, BM25 text postings) all fold CDC deltas
instead of rescanning their base tables.

The 100 TB problem: a downstream rollup (revenue by dimension, token
totals by source, ...) over an append-mostly fact table should not be
recomputed from scratch every time a few GB of new data lands.  This
module folds ONLY the new commits into a stored rollup table:

1. ``read_changes`` (CDC-lite, table.py) yields exactly the rows added
   in versions ``(since_version, head]`` — log metadata plus a scan of
   only the added files, never a snapshot diff;
2. one partial aggregation over that delta produces per-group partials
   (every measure must be SUM-decomposable, so partials over any
   partitioning of the rows combine by ``+``);
3. the stored rollup contributes only its TOUCHED groups (left-semi
   join against the delta's key set — at scale the rollup may itself be
   large, and untouched groups never enter the plan);
4. an additive combine + MERGE upsert rewrites only the rollup files
   containing touched groups (touched-file-only rewrite, table.py:merge).

Total cost per maintenance run is O(delta) + O(touched groups), with
the base table never rescanned.  Rewrite commits (overwrite / merge on
the base) are NOT pure deltas; ``read_changes`` raises on them, which
is the correct contract for maintenance — a rewritten base needs a
rollup rebuild, and silence here would corrupt the rollup.  Compaction
commits (OPTIMIZE/ZORDER) are skipped by ``read_changes`` and are safe.

No counterpart in the reference (an I/O manager; closest idea is
delta-lake's Change Data Feed consumers); engine-native design.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..config import MergeConfig, MergeType, WriteMode
from ..table import DeltaSparkTable
from .relational import widen_for_compute


def maintain_rollup(
    base: DeltaSparkTable,
    rollup: DeltaSparkTable,
    group_cols: Sequence[str],
    measures: Mapping[str, str],
    since_version: Optional[int] = None,
    count_col: Optional[str] = None,
) -> int:
    """Fold base versions ``(since_version, head]`` into ``rollup``.

    ``measures`` maps output column -> Spark SQL *aggregate* expression
    over the delta rows.  Each expression must be additive (``sum(x)``,
    ``count(*)``, ...): the stored value for a group is the ``+`` of
    per-run partials, so holding the expression's output type stable
    matters — cast inside the expression (e.g. money through
    ``DECIMAL(30,10)``, the exact-accumulation rule) and the combine
    re-casts to the stored column type on every run.

    MERGE-ON-READ deletes/updates on the base fold too (r8): the
    row-level change feed signs each partial — delete/update_preimage
    rows NEGATE (additive measures are invertible: the partial over
    removed rows times -1 is exactly the correction), insert/
    update_postimage rows add.  Copy-rewrites still raise (rebuild).
    ``count_col`` names the measure that counts rows (``count(*)``);
    when given, groups whose count reaches 0 are DELETED from the
    rollup instead of lingering as zero rows, keeping
    ``rollup_vs_recompute`` exact under deletion.  Without it, fully
    emptied groups remain with zeroed measures (documented drift from
    a fresh recompute, which would omit them).

    ``since_version=None`` resumes from the rollup's own commit
    metadata (``base_version``, stamped on every create/merge — the
    same contract as the index maintainers), so callers need no
    external version bookkeeping.  Returns the new processed version.
    """
    if not group_cols:
        raise ValueError("maintain_rollup needs at least one group column")
    bad = set(measures) & set(group_cols)
    if bad:
        raise ValueError(f"measure names collide with group columns: {sorted(bad)}")
    if count_col is not None and count_col not in measures:
        raise ValueError(f"count_col {count_col!r} is not a measure")
    # start BEFORE the resume read: any foreign maintenance commit
    # after this point lands in the detection interval — there is no
    # interleave that silently double-folds (a commit before this
    # point is reflected in the resume version instead)
    rollup_start = rollup.version() if rollup.exists() else -1
    if since_version is None:
        since_version = (
            _resume_version(rollup)[0] if rollup.exists() else -1)
    head = base.version()
    if head <= since_version:
        return since_version
    delta = base.read_changes(since_version, head, row_level=True)
    aggs = [F.expr(e).alias(c) for c, e in measures.items()]
    sign = F.when(
        F.col("_change_type").isin("delete", "update_preimage"),
        F.lit(-1),
    ).otherwise(F.lit(1))
    # per-(group, sign) partials, then one tiny signed combine — for an
    # append-only delta the second aggregate sees |groups| rows
    signed = delta.withColumn("_sign", sign).groupBy(
        *[F.col(c) for c in group_cols], F.col("_sign")).agg(*aggs)
    ptype = {f.name: f.dataType for f in signed.schema.fields
             if f.name in measures}
    partial = (
        signed.select(
            *group_cols,
            *[(F.col(c) * F.col("_sign")).cast(ptype[c]).alias(c)
              for c in measures],
        )
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(*[F.sum(c).cast(ptype[c]).alias(c) for c in measures])
        # pin the per-group partials: they feed the touched semi-join,
        # the combine join, and the merge — one frame of |groups| rows
        # instead of three row-level CDC decodes
        .localCheckpoint(eager=True)
    )

    meta = {"base_version": str(head)}
    if not rollup.exists():
        if count_col is not None:
            # a delta whose deletions fully cancel a group nets to a
            # zero row a fresh recompute would omit — same contract as
            # the merge branch's post-delete
            partial = partial.where(F.col(count_col) != 0)
        rollup.write(partial, WriteMode.error, commit_metadata=meta)
        return head

    stored = {f.name: f.dataType for f in rollup.read().schema.fields}
    missing = [c for c in (*group_cols, *measures) if c not in stored]
    if missing:
        raise ValueError(f"rollup table lacks columns {missing}")

    key_eq = reduce(
        lambda a, b: a & b,
        [F.col(f"d.{k}").eqNullSafe(F.col(f"r.{k}")) for k in group_cols],
    )
    # only groups present in the delta enter the combine: at scale the
    # rollup is filtered down to the touched groups (delta key set is
    # small -> broadcastable semi join), untouched groups stay on disk
    touched = (
        rollup.read().alias("r")
        .join(partial.select(*group_cols).alias("d"), key_eq, "left_semi")
    )
    combined_cols = [F.col(f"d.{k}").alias(k) for k in group_cols]
    for c in measures:
        rc, dc = F.col(f"r.{c}"), F.col(f"d.{c}")
        combined_cols.append(
            F.when(rc.isNull(), dc).otherwise(rc + dc).cast(stored[c]).alias(c)
        )
    combined = (
        partial.alias("d")
        .join(touched.alias("r"), key_eq, "left")
        .select(*combined_cols)
        # pinned like partial: the merge consumes it, and the
        # emptied-group probe below reuses it without re-running the
        # touched join — |delta groups| rows either way
        .localCheckpoint(eager=True)
    )
    # probe BEFORE the merge commits: on the common no-deletion path
    # this skips a whole commit + rollup file scan per maintenance run
    # (the delete's discovery pass would rescan the rollup's files
    # every time even when nothing emptied).  Two triggers:
    # (a) this delta emptied a group (the combined partials probe);
    # (b) a PREVIOUS run crashed between its merge and its delete,
    #     leaving count=0 rows behind — visible in the rollup's file
    #     stats for free (driver-side min-values walk, no data read;
    #     absent stats count as "might", which just runs the delete).
    # Without (b) the leftover would persist until its group was
    # touched again, failing rollup_vs_recompute indefinitely.
    def _stats_may_hold_zero() -> bool:
        for a in rollup.snapshot().files:
            raw = (a.stats.get("minValues") or {}).get(count_col)
            try:
                if raw is None or float(raw) <= 0:
                    return True
            except (TypeError, ValueError):
                return True
        return False

    emptied = count_col is not None and (
        bool(combined.where(F.col(count_col) <= 0).take(1))
        or _stats_may_hold_zero()
    )
    merge_res = rollup.merge(
        combined,
        MergeConfig(
            MergeType.upsert,
            predicate=" AND ".join(f"s.{k} <=> t.{k}" for k in group_cols),
        ),
        commit_metadata=meta,
    )
    _check_single_maintainer(rollup, rollup_start,
                             int(merge_res["version"]))
    if emptied:
        # groups a deletion emptied: a fresh recompute would omit them,
        # so drop their rows (merge-on-read — the merge just wrote
        # these files; no second copy).  A crash between the merge
        # (which carries base_version) and this delete leaves zero
        # rows behind — queries filtering count > 0 are unaffected and
        # any later fold touching the group re-deletes; benign, unlike
        # double-counting.
        rollup.delete(f"{count_col} = 0", use_dv=True)
    return head


def _check_single_maintainer(
    target: DeltaSparkTable, start_version: int, end_version: int
) -> None:
    """Maintenance folds assume a SINGLE maintainer per target (the
    standard contract for incremental index/view refresh — delta-rs
    documents the same for concurrent OPTIMIZE).  Two maintainers
    racing the same delta both read the same resume point and both
    apply their partials: the rollup double-counts, the index grows
    duplicate rows — and every individual commit looks healthy, so
    nothing else would notice until an audit.

    Detection over prevention: prevention needs either a strandable
    claim protocol (a crash between claim and fold permanently skips
    the delta) or CAS-serialized multi-commit folds; detection is one
    log-metadata walk.  Any commit in the OPEN interval
    (start_version, end_version) carrying ``base_version`` metadata is
    another maintainer's fold landing between our resume read and our
    commit — raise loudly with the prescribed recovery instead of
    leaving silent double-folds (``*_vs_rebuild`` /
    ``rollup_vs_recompute`` confirm, a rebuild repairs).  Our own
    intermediate commits (DV deletions on the target) carry no
    ``base_version``, so they never false-positive."""
    from .. import tablelog

    foreign = []
    # read ONLY the interval's commit infos (a full history() walk
    # would cost O(total commits) log reads per fold)
    for v in range(start_version + 1, end_version):
        for action in tablelog.read_version_actions(target.table_uri, v):
            info = action.get("commitInfo")
            if info and "base_version" in (info.get("userMetadata") or {}):
                foreign.append(v)
    if foreign:
        raise tablelog.ConcurrentAppendError(
            f"another maintenance run committed version(s) {foreign} of "
            f"{target.table_uri} while this fold was in flight — the "
            "same delta was applied twice.  Run the vs_rebuild/"
            "vs_recompute audit and rebuild the target; run ONE "
            "maintainer per index/rollup"
        )


def _resume_version(index: DeltaSparkTable) -> tuple[int, dict]:
    """Processed base version + metadata from the index table's most
    recent build/maintain commit — the resume point every maintain_*
    entry point shares.  Walks past commits that carry no
    ``base_version`` (OPTIMIZE / Z-order / vacuum on the index table
    itself — housekeeping must not strand maintenance)."""
    for h in index.history():
        meta = h.get("userMetadata") or {}
        if "base_version" in meta:
            return int(meta["base_version"]), meta
    raise ValueError(
        "index table carries no base_version metadata — was it "
        "created by its build_* function?"
    )


def _split_row_changes(
    base: DeltaSparkTable, v0: int, head: int,
    id_col: Optional[str] = None,
):
    """The base table's ``(v0, head]`` delta as (insert-side rows,
    delete-side rows) from the ROW-LEVEL change feed: merge-on-read
    DELETE/UPDATE commits decode into removals (delete /
    update_preimage) and re-additions (update_postimage) instead of
    refusing, so index maintenance survives them.  Copy-rewrites
    (overwrite / merge / non-DV DML) still raise — rebuild, as
    before.  The decoded delta is PINNED (localCheckpoint): the
    deletion collect, the insert-side fold, and the occasional
    anti-join fallback would otherwise each re-run the multi-file DV
    positions decode; size is the delta's rows, never the table.

    ``id_col`` NETS the window per id (r13): one maintenance window
    can span a row's insert AND its later DV delete/update — the
    index applies deletions first (a no-op for a row it never
    indexed), so without netting the superseded insert-side row
    would fold in as a ghost.  Rule: keep only insert-side rows at
    or after the id's LAST delete-side commit (``>=`` because a DV
    UPDATE's preimage and postimage share one commit; a pure DELETE
    commit carries no insert side, so nothing of that id survives).
    Ids with no delete-side rows pass through untouched, preserving
    multiplicity for pure appends.

    UNIQUE-ID CONTRACT (r14): every CDC-maintained index family keys
    deletions on ``id_col`` — ``_apply_index_deletions`` removes ALL
    index rows of a deleted id, and the netting rule keeps only
    post-delete insert-side rows.  A base table with DUPLICATE live
    rows per id breaks both (a DV delete of ONE duplicate would
    silently evict the survivors from the index).  Rather than trust
    the contract blindly, folds with a non-empty delete side verify
    it: for each touched id, the post-netting insert-side count must
    equal the id's live multiplicity at ``head`` (a semi-join-pruned
    scan of just those ids).  A mismatch raises — rebuild the index;
    the base table needs unique ids to be index-maintainable."""
    delta = base.read_changes(v0, head, row_level=True).localCheckpoint(
        eager=True)
    ins = delta.where(
        F.col("_change_type").isin("insert", "update_postimage"))
    dels = delta.where(
        F.col("_change_type").isin("delete", "update_preimage"))
    if id_col is not None:
        last_del = dels.groupBy(id_col).agg(
            F.max("_commit_version").alias("__last_del_v"))
        ins = (
            ins.join(last_del, id_col, "left")
            .where(F.col("__last_del_v").isNull()
                   | (F.col("_commit_version") >= F.col("__last_del_v")))
            .drop("__last_del_v")
        )
        _verify_unique_id_contract(base, head, ins, dels, id_col)
    return ins, dels


def _verify_unique_id_contract(
    base: DeltaSparkTable, head: int,
    ins: DataFrame, dels: DataFrame, id_col: str,
) -> None:
    """Refuse a fold that would mis-index a duplicate-id base (see
    the unique-id contract in ``_split_row_changes``).  Invariant:
    after the fold, an id touched by a delete-side row holds exactly
    its post-netting insert-side rows in the index — so that count
    must equal the id's live multiplicity at ``head``.  Unique-id
    bases always satisfy this (pure delete → 0/0, DV update → 1/1,
    insert-then-delete in one window → 0/0); a partially-deleted
    duplicate id fails it.  Called on EVERY fold; pure-append folds
    exit at a limit-1 probe of the delete side, and only
    deletion-carrying folds pay the real cost — one scan of the base
    pruned to the touched ids (semi join → stats/bloom skipping
    applies)."""
    # cheap short-circuit on the PINNED delta: the guard runs on
    # EVERY fold (called whenever an id_col is set), so pure-append
    # folds — the steady-state common case — must bail before any
    # aggregation.  Probe the raw delete side with limit(1) (a plain
    # scan, no shuffle); only deletion-carrying folds pay the
    # distinct + pruned base scan below.
    if dels.select(id_col).limit(1).isEmpty():
        return
    touched = dels.select(id_col).distinct()
    # ONE combined Spark action for both violation classes (the
    # first guard shape ran three jobs per deletion fold and showed
    # up as +30-60% on every maintainer bench line):
    # - NULL ids never match an equi/semi join, so they would slip
    #   past BOTH this guard and _apply_index_deletions (ghost index
    #   rows for a deleted null-keyed row) -> surfaced as __live=-1
    #   marker rows;
    # - a touched id whose live multiplicity at head != its post-net
    #   foldable rows (partially-deleted duplicate).
    live = (
        base.read(version=head).select(id_col)
        .join(touched, id_col, "semi")
        .groupBy(id_col).agg(F.count("*").alias("__live"))
    )
    fold = (
        ins.select(id_col).join(touched, id_col, "semi")
        .groupBy(id_col).agg(F.count("*").alias("__fold"))
    )
    bad_rows = (
        live.join(fold, id_col, "full")
        .where(F.coalesce(F.col("__live"), F.lit(0))
               != F.coalesce(F.col("__fold"), F.lit(0)))
        .select(id_col, "__live")
        .unionByName(
            touched.where(F.col(id_col).isNull())
            .select(F.col(id_col), F.lit(-1).alias("__live")))
        .limit(3).collect()
    )
    if any(r["__live"] == -1 for r in bad_rows):
        raise ValueError(
            f"index maintenance requires non-null ids: a DV DELETE/"
            f"UPDATE touched a NULL {id_col!r} row in "
            f"{base.table_uri} — null keys cannot be removed from an "
            "index keyed on them; deduplicate/clean the base or "
            "rebuild the index from scratch")
    if bad_rows:
        raise ValueError(
            "index maintenance requires unique ids: id(s) "
            f"{[r[0] for r in bad_rows]} in {base.table_uri} have "
            "live multiplicity != the window's foldable rows (a DV "
            "DELETE/UPDATE touched one of several duplicate rows per "
            "id).  Deduplicate the base or rebuild the index from "
            "scratch"
        )


def _apply_index_deletions(
    index: DeltaSparkTable,
    dels: DataFrame,
    id_col: str,
    max_inlist: int = 10_000,
) -> bool:
    """Remove the deleted base ids' rows from an index table.  Small
    delete sets (the per-commit norm) use a merge-on-read IN-list DV
    delete — touched-file cost, no data rewritten; larger ones fall
    back to ONE distributed anti-join rewrite so the id set never
    materializes on the driver.  Returns True when anything was
    removed (integral id columns only — every index family here keys
    on a bigint doc/vec id)."""
    ids = [r[0] for r in
           dels.select(id_col).distinct().limit(max_inlist + 1).collect()]
    if not ids:
        return False
    if len(ids) <= max_inlist:
        index.delete(
            f"{id_col} IN ({','.join(str(int(i)) for i in ids)})",
            use_dv=True)
        return True
    survivors = index.read().join(
        dels.select(id_col).distinct(), id_col, "left_anti")
    index.write(survivors, WriteMode.overwrite)
    return True


def _advance_base_version(
    index: DeltaSparkTable, head: int, extra: Optional[dict] = None
) -> int:
    """Commit an EMPTY append carrying the new base_version — the
    marker a deletions-only fold needs so resume does not reprocess
    the same delta forever.  Returns the committed version (the
    single-maintainer check's interval end — a re-read of
    ``version()`` could already include a racer's later commit and
    false-positive on our own)."""
    empty = index.spark.createDataFrame([], index.read().schema)
    res = index.write(
        empty, WriteMode.append,
        commit_metadata={"base_version": str(head), **(extra or {})})
    return int(res["version"])


def _maybe_drift_audit(
    emb: DeltaSparkTable,
    index: DeltaSparkTable,
    kind: str,
    fold_idx: int,
    audit_every: Optional[int],
    head: int,
) -> Optional[dict]:
    """Run the drift audit on the maintenance cadence (every
    ``audit_every``-th fold since bootstrap/rebuild — SCALE.md
    recommends N≈5-10) and RECORD the decision scalars as an empty
    commit on the index table, so a scheduler reads them from the log
    (``last_drift_audit``) instead of re-running the audit.  The
    audit commit carries NO ``base_version`` key: resume walks past
    it and the single-maintainer check ignores it by design.  Returns
    the metrics dict when the audit ran, else None."""
    if not audit_every or fold_idx % audit_every != 0:
        return None
    drift = (ivf_index_drift(emb, index) if kind == "ivf"
             else pq_index_drift(emb, index))
    metrics = index_drift_metrics(drift)
    empty = index.spark.createDataFrame([], index.read().schema)
    index.write(
        empty, WriteMode.append,
        commit_metadata={
            "drift_audit": kind,
            "audited_version": str(head),
            "fold_idx": str(fold_idx),
            "cohort_decay": repr(float(metrics["cohort_decay"])),
            "rebuild_gain": repr(float(metrics["rebuild_gain"])),
            "mean_cos_all": repr(float(metrics["mean_cos_all"])),
        },
    )
    return metrics


def last_drift_audit(index: DeltaSparkTable) -> Optional[dict]:
    """Most recent recorded drift audit on the index table (written
    by ``maintain_*_index(audit_every=N)``), or None if no audit has
    run — the scheduler-facing read: compare ``rebuild_gain`` /
    ``cohort_decay`` against the SCALE.md thresholds (rebuild at
    gain > 0.02 or decay > 0.05) without re-running the audit."""
    for h in index.history():
        meta = h.get("userMetadata") or {}
        if "drift_audit" in meta:
            return {
                "kind": meta["drift_audit"],
                "audited_version": int(meta["audited_version"]),
                "fold_idx": int(meta["fold_idx"]),
                "cohort_decay": float(meta["cohort_decay"]),
                "rebuild_gain": float(meta["rebuild_gain"]),
                "mean_cos_all": float(meta["mean_cos_all"]),
            }
    return None


def _lsh_doc_buckets(
    docs: DataFrame, num_hashes: int, bands: int,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(doc_id, text) -> LSH bucket membership (doc_id, band, h) via
    the SHARED shingle/signature/banding primitives (dedup.py), so the
    persisted index can never band differently from the batch
    operators or the streaming ingest filter.  Docs too short to
    shingle (< 3 tokens) emit no rows on every path alike.
    ``hash_family`` swaps in the portable md5 dial
    (``dedup.portable_hash_family`` — the oracle-recomputable family);
    it is an INDEX property recorded at build time, never a per-call
    choice, so one index can never mix families."""
    from .dedup import (_signatures_from_stream, band_buckets,
                        portable_hash_family, shingles_of)

    base_hash = seed_hash = None
    hash_sql = "xxhash64({x})"
    if hash_family == "portable":
        base_hash, seed_hash, hash_sql = portable_hash_family()
    elif hash_family != "xxhash64":
        raise ValueError(f"unknown LSH hash family {hash_family!r}")
    sigs = _signatures_from_stream(
        shingles_of(docs), num_hashes,
        base_hash=base_hash, seed_hash=seed_hash)
    return band_buckets(sigs, num_hashes, bands,
                        hash_sql=hash_sql).select("doc_id", "band", "h")


def build_lsh_index(
    docs: DeltaSparkTable,
    index: DeltaSparkTable,
    num_hashes: int = 64,
    bands: int = 16,
    hash_family: str = "xxhash64",
) -> int:
    """Bootstrap a persisted MinHash-LSH bucket index over a
    TRANSACTIONAL documents table — the durable counterpart of the
    session-cached ``minhash_bucket_index`` (and the batch twin of the
    streaming ingest filter's bucket table).  Banding parameters land
    in the commit metadata so maintenance reads them back instead of
    trusting callers to repeat them.  Returns the processed base
    version.

    The index is stored UNTRUNCATED: hot-bucket caps
    (``_truncate_buckets``) are a query-time candidate-generation
    dial, not an index property — capping here would silently limit
    every future consumer."""
    head = docs.version()
    # pin the snapshot AT head: a commit racing between version() and
    # an unpinned read() would be indexed yet uncovered by
    # base_version, double-folding on the next maintain
    buckets = _lsh_doc_buckets(
        docs.read(version=head).select("doc_id", "text"),
        num_hashes, bands, hash_family)
    index.write(
        buckets,
        commit_metadata={
            "base_version": str(head),
            "num_hashes": str(num_hashes),
            "bands": str(bands),
            "hash_family": hash_family,
        },
    )
    return head


def maintain_lsh_index(
    docs: DeltaSparkTable,
    index: DeltaSparkTable,
    since_version: Optional[int] = None,
) -> int:
    """Fold document appends ``(since_version, head]`` into the LSH
    bucket index: shingle/sign/band ONLY the new documents (with the
    banding parameters recorded at build time) and append their bucket
    rows.  ``since_version=None`` resumes from the index's own commit
    metadata.  Cost is O(delta); the indexed corpus is never
    re-shingled.  Base rewrites raise (``read_changes`` — ghost bucket
    rows would poison every downstream candidate join; rebuild
    instead); compaction-only ranges are a metadata no-op, safe for
    the same reason as the IVF path.  Returns the new processed base
    version."""
    index_start = index.version()  # BEFORE the resume read (see
    # _check_single_maintainer: no interleave escapes the interval)
    v_meta, meta = _resume_version(index)
    v0 = v_meta if since_version is None else since_version
    num_hashes = int(meta.get("num_hashes", 64))
    bands = int(meta.get("bands", 16))
    hash_family = meta.get("hash_family", "xxhash64")
    head = docs.version()
    if head <= v0:
        return v0
    # r8: merge-on-read deletes/updates on the base FOLD instead of
    # refusing — the row-level feed decodes them; deletions apply
    # FIRST, additions commit LAST with the base_version marker, so a
    # crash between the two refolds idempotently (re-deleting is a
    # no-op, the append never happened).  Copy-rewrites still raise.
    ins, dels = _split_row_changes(docs, v0, head, "doc_id")
    params = {"num_hashes": str(num_hashes), "bands": str(bands),
              "hash_family": hash_family}
    removed = _apply_index_deletions(index, dels.select("doc_id"),
                                     "doc_id")
    # pinned: isEmpty() and the staged write share one banding pass.
    # widened (r16, guide §2.5): the feed's delta arrives as 1-2 scan
    # partitions, pinning the shingle + num_hashes-seed sign pass (the
    # fold's dominant phase) to one task; banding is per-doc, so the
    # repartition is value-exact
    buckets = _lsh_doc_buckets(
        widen_for_compute(ins.select("doc_id", "text"), "doc_id"),
        num_hashes, bands, hash_family
    ).localCheckpoint(eager=True)
    if buckets.isEmpty():
        if removed:
            marker_v = _advance_base_version(index, head, params)
            _check_single_maintainer(index, index_start, marker_v)
        return head
    res = index.write(
        buckets,
        WriteMode.append,
        commit_metadata={"base_version": str(head), **params},
    )
    _check_single_maintainer(index, index_start, int(res["version"]))
    return head


def lsh_index_vs_rebuild(
    docs: DeltaSparkTable, index: DeltaSparkTable
) -> DataFrame:
    """Audit helper: re-derive the full bucket membership from the
    current snapshot (same banding parameters, from the index
    metadata) and return the symmetric difference against the stored
    index — empty == the incrementally-maintained index is exactly
    what a from-scratch build would produce."""
    _, meta = _resume_version(index)
    fresh = _lsh_doc_buckets(
        docs.read().select("doc_id", "text"),
        int(meta.get("num_hashes", 64)), int(meta.get("bands", 16)),
        meta.get("hash_family", "xxhash64"))
    stored = index.read().select("doc_id", "band", "h")
    return fresh.exceptAll(stored).withColumn("side", F.lit("missing")) \
        .unionByName(
            stored.exceptAll(fresh).withColumn("side", F.lit("ghost")))


def _bm25_index_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> the BM25 index rows: one posting
    ``(doc_id, term, tf, dl)`` per distinct term of the doc, PLUS one
    SENTINEL row ``(doc_id, '', 0, dl)`` per document.  The sentinel
    carries zero-token docs (they have no postings but still shape N
    and avgdl — ``bm25_search`` counts every document) and makes the
    per-doc length readable without touching the postings; '' can
    never collide with a real term (tokens are non-empty [a-z0-9]+
    runs).  One table holds the whole index state, so maintenance
    keeps the LSH family's crash-idempotent commit ordering —
    a doc-stats sibling would need its own resume marker and a crash
    between the two appends would strand them out of sync."""
    from .textops import TOKENS

    toks = docs.select(
        "doc_id", F.expr(TOKENS).alias("toks"),
    ).localCheckpoint(eager=False)  # tf + sentinel share one tokenize
    tf = (
        toks.select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    sent = toks.select(
        "doc_id",
        F.lit("").alias("term"),
        F.lit(0).cast("long").alias("tf"),
        F.size("toks").cast("long").alias("dl"),
    )
    return tf.select("doc_id", "term", "tf", "dl").unionByName(sent)


def build_bm25_index(
    docs: DeltaSparkTable, index: DeltaSparkTable
) -> int:
    """Bootstrap a persisted BM25 inverted index (postings + per-doc
    length sentinels, see ``_bm25_index_rows``) over a TRANSACTIONAL
    documents table — the FOURTH index family on the
    build/maintain/audit contract (IVF inverted lists, LSH buckets,
    PQ codes, now text postings).  At 100 TB the BM25 leg of hybrid
    search was the only remaining recompute-from-scratch structure:
    every query re-tokenized the corpus.  Unlike the ANN families
    there is no model state and no hash family — term frequencies
    are exact integers under the fixed tokenizer, so the stored index
    is SQL-recomputable as-is (no portable dial needed).  Returns the
    processed base version."""
    head = docs.version()
    # pin the snapshot AT head (the build_lsh_index race rule)
    rows = _bm25_index_rows(
        docs.read(version=head).select("doc_id", "text"))
    index.write(rows, commit_metadata={"base_version": str(head)})
    return head


def maintain_bm25_index(
    docs: DeltaSparkTable,
    index: DeltaSparkTable,
    since_version: Optional[int] = None,
) -> int:
    """Fold document changes ``(since_version, head]`` into the BM25
    postings index: tokenize ONLY the new/updated documents and append
    their posting + sentinel rows; merge-on-read deletes/updates fold
    (deleted doc_ids' rows leave via a DV IN-list delete, updated docs
    re-tokenize).  Deletions apply FIRST, additions commit LAST with
    the ``base_version`` marker — a crash between the two refolds
    idempotently.  Copy-rewrites raise via ``read_changes`` (ghost
    postings would inflate df and surface deleted docs in every
    search; rebuild instead); compaction-only ranges are a metadata
    no-op.  Cost is O(delta); the indexed corpus is never
    re-tokenized.  Returns the new processed base version.

    NO ``audit_every`` knob, deliberately (r14, vs the IVF/PQ
    maintainers): drift audits score TRAINED-MODEL staleness
    (centroids/codebooks fit to an old distribution) — BM25 postings
    carry no model, folds are exact by construction (tokenization is
    deterministic), so there is nothing to drift.  The integrity
    check that exists instead, ``bm25_index_vs_rebuild``, re-derives
    the FULL corpus (O(corpus), not O(delta)) — wiring it to a
    per-N-folds cadence would silently turn maintenance into a
    periodic full re-tokenize at 100 TB.  Run it as an explicit
    offline audit, the way the tests and the model fuzz do."""
    index_start = index.version()  # BEFORE the resume read (see
    # _check_single_maintainer: no interleave escapes the interval)
    v_meta, _meta = _resume_version(index)
    v0 = v_meta if since_version is None else since_version
    head = docs.version()
    if head <= v0:
        return v0
    ins, dels = _split_row_changes(docs, v0, head, "doc_id")
    removed = _apply_index_deletions(index, dels.select("doc_id"),
                                     "doc_id")
    # pinned: isEmpty() and the staged write share one tokenize pass.
    # delta-scan widening A/B'd here and REJECTED (r16: med 0.687
    # unwidened vs 1.616 widened — the partition probe + exchange +
    # 32-block checkpoint dwarf the parallelized tokenize on an
    # O(delta) input; contrast the LSH fold, whose 64-seed sign pass
    # is heavy enough to win)
    rows = _bm25_index_rows(
        ins.select("doc_id", "text")).localCheckpoint(eager=True)
    if rows.isEmpty():
        if removed:
            marker_v = _advance_base_version(index, head)
            _check_single_maintainer(index, index_start, marker_v)
        return head
    res = index.write(
        rows, WriteMode.append,
        commit_metadata={"base_version": str(head)},
    )
    _check_single_maintainer(index, index_start, int(res["version"]))
    return head


def bm25_index_vs_rebuild(
    docs: DeltaSparkTable, index: DeltaSparkTable
) -> DataFrame:
    """Audit helper: re-derive postings + sentinels from the current
    snapshot and return the symmetric difference against the stored
    index — empty == the incrementally-maintained index is exactly
    what a from-scratch build would produce.  ``exceptAll`` is
    multiplicity-aware by construction: a double-folded delta's
    duplicate rows surface as ghosts."""
    fresh = _bm25_index_rows(docs.read().select("doc_id", "text"))
    stored = index.read().select("doc_id", "term", "tf", "dl")
    return fresh.exceptAll(stored).withColumn("side", F.lit("missing")) \
        .unionByName(
            stored.exceptAll(fresh).withColumn("side", F.lit("ghost")))


def bm25_query_maintained(
    index: DeltaSparkTable,
    queries: Optional[list] = None,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    exclude_qid_doc: bool = False,
) -> DataFrame:
    """BM25 search over the CDC-MAINTAINED postings index — the
    production read path: term frequencies, document lengths, N and
    avgdl all come from the STORED index; no tokenize job runs at
    query time.  Runs the SAME parsing + scoring epilogue as
    ``textops.bm25_search`` (``_bm25_query_terms`` /
    ``_bm25_score_core``), so over an index covering the same corpus
    the two return identical rows bit-for-bit — the
    ``ann_query_maintained`` shared-core contract.  At 100 TB the df
    aggregate and postings probe touch only the query terms' rows;
    the only corpus-wide read is the O(docs) sentinel scan for
    (N, avgdl)."""
    from .textops import BM25_QUERIES, _bm25_query_terms, _bm25_score_core

    if queries is None:
        queries = BM25_QUERIES
    qterms = _bm25_query_terms(index.spark, queries)
    idx = index.read()
    tf = idx.where(F.col("term") != "").select("doc_id", "term", "tf")
    dl = idx.where(F.col("term") == "").select(
        "doc_id", F.col("dl").cast("double").alias("dl"))
    return _bm25_score_core(tf, dl, qterms, k1, b, top_k,
                            exclude_qid_doc)


def _ivf_centroids_table(index: DeltaSparkTable) -> DeltaSparkTable:
    """The index's coarse-quantizer centroids live in a sibling table
    (assignments and centroids have different schemas and wildly
    different sizes — mixing them in one table would force a kind
    column into every 100 TB-scale assignment row)."""
    return DeltaSparkTable(index.spark, index.table_uri + "_centroids")


def build_ivf_index(
    emb: DeltaSparkTable,
    index: DeltaSparkTable,
    n_cells: Optional[int] = None,
    iters: int = 1,
    train_sample_mod: int = 1,
    assignment: str = "matmul",
) -> int:
    """Bootstrap an IVF index over a TRANSACTIONAL embeddings table:
    train the coarse quantizer on the current snapshot
    (``kmeans_centroids``), assign every vector, and persist BOTH
    halves — centroids in a sibling table, the inverted-list
    assignments ``(vec_id, cell)`` in ``index`` with the processed
    base version in the commit metadata.  ``maintain_ivf_index``
    resumes from that metadata.

    ``n_cells=None`` applies the same ``1.5*sqrt(n)`` sizing rule as
    the parquet-corpus path (``_auto_cells``).  Returns the processed
    base version.  Zero-norm embeddings are excluded exactly as every
    query path excludes them (``_with_norm``).

    ``assignment`` is an INDEX property recorded at build time (the
    LSH ``hash_family`` pattern): ``"matmul"`` (default) trains with
    the production xxhash64-seeded k-means and assigns via the
    Arrow-batched float64 matmul — the scale path; ``"portable"``
    trains and assigns with the cross-engine dial
    (``_portable_centroids_from`` + ``_assign_cells_exact``: md5 init
    order, ordered-fold cosines rounded to 9) so the STORED index is
    SQL-recomputable — the oracle dial, never the scale path.
    Maintenance and the rebuild audit resume the recorded family."""
    from .similarity import (
        _assign_cells,
        _assign_cells_exact,
        _portable_centroids_from,
        _with_norm,
        kmeans_centroids,
    )

    if assignment not in ("matmul", "portable"):
        raise ValueError(f"unknown IVF assignment family {assignment!r}")
    head = emb.version()
    vectors = _with_norm(
        emb.read(version=head).select("vec_id", "embedding"))
    if n_cells is None:
        import math

        n = vectors.count()
        n_cells = max(4, min(65536, int(round(1.5 * math.sqrt(max(n, 1))))))
    if assignment == "portable":
        cents = _portable_centroids_from(vectors, n_cells, iters)
        assigned = _assign_cells_exact(vectors, cents)
    else:
        cents = kmeans_centroids(vectors, n_cells, iters, train_sample_mod)
        assigned = _assign_cells(vectors, cents)
    meta = {"base_version": str(head), "n_cells": str(n_cells),
            "assignment": assignment}
    _ivf_centroids_table(index).write(cents, commit_metadata=meta)
    index.write(
        assigned.select("vec_id", "cell"),
        commit_metadata=meta,
    )
    return head


def maintain_ivf_index(
    emb: DeltaSparkTable,
    index: DeltaSparkTable,
    since_version: Optional[int] = None,
    audit_every: Optional[int] = None,
) -> int:
    """Fold embedding appends ``(since_version, head]`` into the IVF
    index: assign ONLY the new vectors against the STORED centroids
    (one broadcast map pass over the delta — the standard production
    IVF refresh; centroid drift is a quality dial handled by periodic
    ``build_ivf_index`` rebuilds) and append them to the inverted
    list.  ``since_version=None`` resumes from the index's own commit
    metadata, so steady-state maintenance is just
    ``maintain_ivf_index(emb, index)`` per arrival.

    Cost is O(delta x n_cells) comparisons + one append commit; the
    indexed corpus is never rescanned.  MERGE-ON-READ deletes/updates
    fold too (r8): the row-level feed decodes them, deleted vec_ids
    leave the inverted list and updated vectors re-assign.
    COPY-REWRITES (overwrite / merge / non-DV DML / RESTORE) are not
    pure deltas: ``read_changes`` raises and the index needs a
    rebuild — silence would leave ghost vectors.  Compaction-only
    ranges are a metadata no-op (the lagging base_version is safe:
    ``read_changes`` yields no rows for compaction commits, so a later
    fold over a range containing them adds nothing twice).

    ``audit_every=N`` makes the SCALE.md drift-audit cadence
    executable: every Nth fold since bootstrap/rebuild runs
    ``ivf_index_drift`` and records its decision scalars as an empty
    audit commit (read them back with ``last_drift_audit``).

    Returns the new processed base version."""
    from .similarity import _assign_cells, _assign_cells_exact, _with_norm

    index_start = index.version()  # BEFORE the resume read (see
    # _check_single_maintainer: no interleave escapes the interval)
    v_meta, meta = _resume_version(index)
    if since_version is None:
        since_version = v_meta
    # fold counter since bootstrap/rebuild (build commits carry none)
    fold_idx = int(meta.get("fold_idx", "0")) + 1
    # the assignment family is an index property (recorded at build,
    # threaded through every fold commit) — one index never mixes the
    # matmul and portable assignment rules
    assign_family = meta.get("assignment", "matmul")
    assign_fn = (_assign_cells_exact if assign_family == "portable"
                 else _assign_cells)
    head = emb.version()
    if head <= since_version:
        return since_version
    ins, dels = _split_row_changes(emb, since_version, head,
                                   "vec_id")
    removed = _apply_index_deletions(index, dels.select("vec_id"),
                                     "vec_id")
    cents = _ivf_centroids_table(index).read()
    # pinned: isEmpty() and the staged write share one assignment pass.
    # delta-scan widening A/B'd here and REJECTED (r16: med 0.652
    # unwidened vs 1.139 widened — the exchange carries the wide
    # embedding arrays and the batched Arrow matmul is already fast
    # on an O(delta) input)
    assigned = assign_fn(
        _with_norm(ins.select("vec_id", "embedding")), cents
    ).select("vec_id", "cell").localCheckpoint(eager=True)
    if assigned.isEmpty():
        if removed:
            marker_v = _advance_base_version(
                index, head, {"fold_idx": str(fold_idx),
                              "assignment": assign_family})
            _check_single_maintainer(index, index_start, marker_v)
            _maybe_drift_audit(emb, index, "ivf", fold_idx,
                               audit_every, head)
        # compaction-only range: nothing to fold, nothing to commit
        return head
    res = index.write(
        assigned,
        WriteMode.append,
        commit_metadata={"base_version": str(head),
                         "fold_idx": str(fold_idx),
                         "assignment": assign_family},
    )
    _check_single_maintainer(index, index_start, int(res["version"]))
    _maybe_drift_audit(emb, index, "ivf", fold_idx, audit_every, head)
    return head


def _pq_codebooks_table(index: DeltaSparkTable) -> DeltaSparkTable:
    """PQ codebooks live in a sibling table (same rationale as the IVF
    centroids: model rows vs 100 TB-scale code rows)."""
    return DeltaSparkTable(index.spark, index.table_uri + "_codebooks")


def build_pq_index(
    emb: DeltaSparkTable,
    index: DeltaSparkTable,
    m: int = 8,
    nbits: int = 4,
    iters: int = 8,
    train_sample_mod: int = 1,
    sample_cap: int = 8192,
    family: str = "numpy",
) -> int:
    """Bootstrap a product-quantization code index over a
    TRANSACTIONAL embeddings table: learn per-subspace codebooks on
    the deterministic bounded sample, encode every vector to m-byte
    codes, persist codebooks (sibling table) + codes (``index``) with
    the processed base version and the quantization params in the
    commit metadata — the third index family on the
    build/maintain/audit contract (IVF inverted lists, LSH buckets,
    PQ codes).  Returns the processed base version.

    ``family`` is an INDEX property (the LSH/IVF recorded-family
    pattern): ``"numpy"`` (default) is the production path —
    driver-sample numpy k-means codebooks + the Arrow-batched matmul
    encode; ``"portable"`` trains and encodes with the cross-engine
    dial (``_portable_pq_train`` / ``_portable_pq_assign`` on the
    FULL snapshot, ``pq_k = 2**nbits`` codes numbered from 1, L2
    rounded to 9) so the stored codes are SQL-recomputable — the
    oracle dial, never the scale path.  Maintenance and the rebuild
    audit resume the recorded family."""
    from .similarity import (
        _codebooks_to_rows,
        _learn_pq_codebooks,
        _pack_portable_codes,
        _portable_pq_train,
        _portable_subvectors,
        _pq_encode,
        _pq_sample_matrix,
        _with_norm,
    )

    if family not in ("numpy", "portable"):
        raise ValueError(f"unknown PQ family {family!r}")
    if not 1 <= int(nbits) <= 7:
        # validated BEFORE any write (both families): codes are signed
        # int8, and failing after the codebooks table committed would
        # strand a half-built index
        raise ValueError(
            f"nbits={nbits} out of [1, 7]: codes are stored as signed "
            "int8 (max 128 codewords)")
    head = emb.version()
    vectors = _with_norm(
        emb.read(version=head).select("vec_id", "embedding"))
    meta = {"base_version": str(head), "m": str(m), "nbits": str(nbits),
            "family": family}
    if family == "portable":
        sv = _portable_subvectors(vectors, m)
        cb_df = _portable_pq_train(vectors, sv, 2 ** nbits, iters)
        _pq_codebooks_table(index).write(
            cb_df.select("subspace", "code",
                         F.col("cvec").alias("vals")),
            commit_metadata=meta,
        )
        index.write(_pack_portable_codes(sv, cb_df, m),
                    commit_metadata=meta)
        return head
    x = _pq_sample_matrix(vectors, train_sample_mod, sample_cap)
    cb = _learn_pq_codebooks(x, m, nbits, iters)
    _pq_codebooks_table(index).write(
        emb.spark.createDataFrame(
            _codebooks_to_rows(cb),
            "subspace int, code int, vals array<double>"),
        commit_metadata=meta,
    )
    index.write(_pq_encode(vectors, cb), commit_metadata=meta)
    return head


def maintain_pq_index(
    emb: DeltaSparkTable,
    index: DeltaSparkTable,
    since_version: Optional[int] = None,
    audit_every: Optional[int] = None,
) -> int:
    """Fold embedding appends ``(since_version, head]`` into the PQ
    code index: encode ONLY the new vectors against the STORED
    codebooks (codebook drift, like centroid drift, is a quality dial
    handled by periodic rebuilds) and append their code rows.
    ``since_version=None`` resumes from the index's own commit
    metadata.  Cost is O(delta); merge-on-read deletes/updates fold
    (deleted vec_ids' codes leave the index, updated vectors
    re-encode); copy-rewrites raise via ``read_changes`` (ghost codes
    would corrupt every ADC scan — rebuild instead); compaction-only
    ranges are a metadata no-op.  ``audit_every=N`` runs
    ``pq_index_drift`` every Nth fold and records the scalars (see
    ``maintain_ivf_index``).  Returns the new processed base
    version."""
    from .similarity import (
        _codebooks_from_rows,
        _pack_portable_codes,
        _portable_subvectors,
        _pq_encode,
        _with_norm,
    )

    index_start = index.version()  # BEFORE the resume read (see
    # _check_single_maintainer: no interleave escapes the interval)
    v_meta, meta = _resume_version(index)
    v0 = v_meta if since_version is None else since_version
    fold_idx = int(meta.get("fold_idx", "0")) + 1
    # the encode family is an index property (recorded at build) —
    # one index never mixes numpy-matmul and portable-L2 codes
    family = meta.get("family", "numpy")
    head = emb.version()
    if head <= v0:
        return v0
    ins, dels = _split_row_changes(emb, v0, head, "vec_id")
    removed = _apply_index_deletions(index, dels.select("vec_id"),
                                     "vec_id")
    # delta-scan widening A/B'd here and REJECTED (r16: med 0.566
    # unwidened vs 1.062 widened — same analysis as the IVF fold)
    delta = _with_norm(ins.select("vec_id", "embedding"))
    # pinned: isEmpty() and the staged write share one encode pass
    if family == "portable":
        m = int(meta.get("m", "8"))
        cb_df = _pq_codebooks_table(index).read().select(
            "subspace", "code", F.col("vals").alias("cvec"))
        enc = _pack_portable_codes(
            _portable_subvectors(delta, m), cb_df, m,
        ).localCheckpoint(eager=True)
    else:
        cb = _codebooks_from_rows(
            _pq_codebooks_table(index).read().collect())
        enc = _pq_encode(delta, cb).localCheckpoint(eager=True)
    params = {"fold_idx": str(fold_idx), "family": family,
              "m": meta.get("m", "8"), "nbits": meta.get("nbits", "4")}
    if enc.isEmpty():
        if removed:
            marker_v = _advance_base_version(index, head, params)
            _check_single_maintainer(index, index_start, marker_v)
            _maybe_drift_audit(emb, index, "pq", fold_idx,
                               audit_every, head)
        return head
    res = index.write(
        enc,
        WriteMode.append,
        commit_metadata={"base_version": str(head), **params},
    )
    _check_single_maintainer(index, index_start, int(res["version"]))
    _maybe_drift_audit(emb, index, "pq", fold_idx, audit_every, head)
    return head


def ann_query_maintained(
    emb: DeltaSparkTable,
    ivf_index: DeltaSparkTable,
    pq_index: DeltaSparkTable,
    k: int = 5,
    n_queries: int = 5,
    nprobe: Optional[int] = None,
    rerank: int = 50,
) -> DataFrame:
    """Query the CDC-MAINTAINED index pair end-to-end — the production
    read path the build/maintain machinery exists for: probe the
    STORED centroids, scan the STORED inverted list joined with the
    STORED m-byte PQ codes via ADC lookup tables, exact-rerank the
    shortlist from the embeddings table.  No training, assignment, or
    encoding job runs at query time; the only full-precision vectors
    read are queries x ``rerank`` shortlist rows.

    Uses the SAME query core as ``similarity.ivf_pq_topk``
    (``_pq_query_topk``), so probe ranking, ADC scoring, tie-breaks,
    and the full-rerank exactness property are identical by
    construction: with ``rerank`` covering the probed population the
    result is exact cosine top-k over the probed cells' members."""
    from .similarity import (
        _codebooks_from_rows,
        _pq_query_topk,
        _resolve_nprobe,
        _with_norm,
    )

    cents = _ivf_centroids_table(ivf_index).read()
    listing = ivf_index.read().select("vec_id", "cell")
    codes = pq_index.read().select("vec_id", "codes")
    codebooks = _codebooks_from_rows(_pq_codebooks_table(pq_index)
                                     .read().collect())
    nprobe = _resolve_nprobe(nprobe, cents.count())
    vectors = _with_norm(emb.read().select("vec_id", "embedding"))
    queries = vectors.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    ).localCheckpoint()
    return _pq_query_topk(
        queries, cents, listing.join(codes, "vec_id"), vectors,
        codebooks, k=k, nprobe=nprobe, rerank=rerank,
    )


def hybrid_search_maintained(
    spark,
    sf_dir: str,
    emb: DeltaSparkTable,
    ivf_index: DeltaSparkTable,
    pq_index: DeltaSparkTable,
    n_queries: int = 5,
    inner_k: int = 20,
    top_k: int = 10,
    k_rrf: int = 60,
    nprobe: Optional[int] = None,
    rerank: int = 50,
    bm25_index: Optional[DeltaSparkTable] = None,
) -> DataFrame:
    """Hybrid BM25 + dense retrieval over the MAINTAINED indexes —
    the production form of ``similarity.hybrid_search_rrf``: the
    sparse leg probes the CDC-maintained postings index when
    ``bm25_index`` is given (``bm25_query_maintained`` — stored
    postings/lengths, no corpus re-tokenize; it shares
    ``_bm25_score_core`` with the from-scratch form, so over the same
    corpus the legs are identical bit-for-bit) and falls back to the
    from-scratch ``bm25_search`` otherwise; the dense leg reads the
    CDC-maintained IVF + PQ index pair (``ann_query_maintained`` —
    stored centroids, stored inverted lists, m-byte ADC scan, bounded
    exact rerank) instead of brute-force cosine over raw embeddings.
    Both forms fuse through the SHARED ``_rrf_fuse`` epilogue, so
    fusion semantics cannot fork; with ``nprobe``/``rerank`` covering
    the corpus the dense leg equals brute force exactly and the fused
    output equals the oracle-backed exact form bit-for-bit (the
    registry entry's guard).  At scale the dense leg reads O(probed
    cells x m bytes) instead of O(corpus x d floats), and with all
    four indexes maintained NO leg rescans or re-tokenizes the
    corpus."""
    from pyspark.sql import functions as F

    from .relational import load
    from .similarity import _rrf_fuse
    from .textops import bm25_search

    docs = load(spark, sf_dir, "documents")
    qdocs = (
        docs.where(F.col("doc_id") < n_queries)
        .select("doc_id", "text").collect()
    )  # bounded: n_queries rows
    q = [(r["doc_id"], r["text"]) for r in qdocs]
    if bm25_index is not None:
        sparse_ranked = bm25_query_maintained(
            bm25_index, queries=q, top_k=inner_k, exclude_qid_doc=True)
    else:
        sparse_ranked = bm25_search(
            spark, sf_dir, queries=q,
            top_k=inner_k, exclude_qid_doc=True)
    sparse = sparse_ranked.select(
        F.col("qid").cast("long").alias("q_id"),
        "doc_id",
        F.col("rank").alias("r_sparse"),
    )
    dense = ann_query_maintained(
        emb, ivf_index, pq_index,
        k=inner_k, n_queries=n_queries, nprobe=nprobe, rerank=rerank,
    ).select(
        "q_id",
        F.col("vec_id").alias("doc_id"),
        F.col("rank").alias("r_dense"),
    )
    return _rrf_fuse(sparse, dense, k_rrf, top_k)


def pq_index_vs_rebuild(
    emb: DeltaSparkTable, index: DeltaSparkTable
) -> DataFrame:
    """Audit helper: re-encode the full current snapshot against the
    stored codebooks and return every vec_id whose stored codes differ
    (or that exists on only one side).  Empty == the incrementally-
    maintained code table is exactly what a from-scratch encode would
    produce over the same codebooks."""
    from .similarity import (
        _codebooks_from_rows,
        _pack_portable_codes,
        _portable_subvectors,
        _pq_encode,
        _with_norm,
    )

    _, meta = _resume_version(index)
    vectors = _with_norm(emb.read().select("vec_id", "embedding"))
    if meta.get("family", "numpy") == "portable":
        m = int(meta.get("m", "8"))
        cb_df = _pq_codebooks_table(index).read().select(
            "subspace", "code", F.col("vals").alias("cvec"))
        fresh = _pack_portable_codes(
            _portable_subvectors(vectors, m), cb_df, m)
    else:
        cb = _codebooks_from_rows(
            _pq_codebooks_table(index).read().collect())
        fresh = _pq_encode(vectors, cb)
    fresh = fresh.select("vec_id", F.col("codes").alias("fresh_codes"))
    # multiplicity-aware (r9): a double-folded delta leaves duplicate
    # rows whose values all LOOK right — an equality join alone is
    # blind to them, so the audit groups the stored side and flags
    # n_rows != 1 too (the concurrent-maintenance failure mode)
    stored = index.read().groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.first("codes").alias("stored_codes"),
    )
    return (
        fresh.join(stored, "vec_id", "full_outer")
        .where(
            ~F.col("fresh_codes").eqNullSafe(F.col("stored_codes"))
            | (F.coalesce(F.col("n_rows"), F.lit(0)) != 1)
        )
    )


def ivf_index_vs_rebuild(
    emb: DeltaSparkTable, index: DeltaSparkTable
) -> DataFrame:
    """Audit helper (the ``rollup_vs_recompute`` analogue): re-assign
    the FULL current snapshot against the stored centroids and
    full-outer-join with the stored inverted list — any row where the
    two disagree.  Empty result == the incrementally-maintained index
    is exactly the index a from-scratch assignment would build over
    the same centroids."""
    from .similarity import _assign_cells, _assign_cells_exact, _with_norm

    _, meta = _resume_version(index)
    assign_fn = (_assign_cells_exact
                 if meta.get("assignment", "matmul") == "portable"
                 else _assign_cells)
    fresh = assign_fn(
        _with_norm(emb.read().select("vec_id", "embedding")),
        _ivf_centroids_table(index).read(),
    ).select("vec_id", F.col("cell").alias("fresh_cell"))
    # multiplicity-aware (r9): duplicate inverted-list rows from a
    # double-folded delta carry the RIGHT cell, so the equality join
    # alone never sees them — group the stored side and flag
    # n_rows != 1 as a mismatch too
    stored = index.read().groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("cell").alias("stored_cell"),
    )
    return (
        fresh.join(stored, "vec_id", "full_outer")
        .where(
            ~F.col("fresh_cell").eqNullSafe(F.col("stored_cell"))
            | (F.coalesce(F.col("n_rows"), F.lit(0)) != 1)
        )
    )


def _best_cos_scores(vectors: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cos) — each vector's cosine to its NEAREST centroid:
    the assignment-quality signal the drift audits aggregate.  Same
    Arrow-batched matmul shape as ``_assign_cells`` (centroids are
    model-bounded and ride into the closure as numpy); map-only at any
    corpus size."""
    import numpy as np

    rows = sorted(
        cents.select("cell", "c_emb", "c_norm").collect(),
        key=lambda r: r["cell"],
    )
    cmat = np.stack([np.asarray(r["c_emb"], dtype=np.float64) for r in rows])
    cnorm = np.asarray([r["c_norm"] for r in rows], dtype=np.float64)

    def _score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _np.stack(pdf["embedding"].to_numpy()).astype(_np.float64)
            xn = pdf["norm"].to_numpy(dtype=_np.float64)
            cos = (x @ cmat.T) / (xn[:, None] * cnorm[None, :])
            cos = _np.where(_np.isfinite(cos), cos, -_np.inf)
            yield _pd.DataFrame({
                "vec_id": pdf["vec_id"], "cos": cos.max(axis=1)})

    return vectors.select("vec_id", "embedding", "norm").mapInPandas(
        _score, "vec_id long, cos double")


def _pq_recon_scores(vectors: DataFrame, codebooks) -> DataFrame:
    """(vec_id, cos) — cosine between each normalized vector and its
    PQ reconstruction (per-subspace nearest codeword, concatenated):
    the codebook-fit signal the PQ drift audit aggregates.  Encoding
    is deterministic, so scoring re-encodes instead of joining the
    stored codes (parity with the stored table is ``pq_index_vs_
    rebuild``'s job, not this one's)."""
    cb = codebooks
    cb_sq = (cb * cb).sum(axis=2)

    def _score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _np.stack(pdf["embedding"].to_numpy()).astype(_np.float64)
            x /= pdf["norm"].to_numpy(dtype=_np.float64)[:, None]
            n, mm, dsub = len(x), cb.shape[0], cb.shape[2]
            recon = _np.empty_like(x)
            for j in range(mm):
                sub = x[:, j * dsub:(j + 1) * dsub]
                codes = _np.argmin(
                    cb_sq[j][None, :] - 2.0 * (sub @ cb[j].T), axis=1)
                recon[:, j * dsub:(j + 1) * dsub] = cb[j][codes]
            rnorm = _np.sqrt((recon * recon).sum(axis=1))
            with _np.errstate(divide="ignore", invalid="ignore"):
                cos = (x * recon).sum(axis=1) / rnorm
            cos = _np.where(_np.isfinite(cos), cos, 0.0)
            yield _pd.DataFrame({"vec_id": pdf["vec_id"], "cos": cos})

    return vectors.select("vec_id", "embedding", "norm").mapInPandas(
        _score, "vec_id long, cos double")


def _bootstrap_ids(emb: DeltaSparkTable, index: DeltaSparkTable) -> DataFrame:
    """The ids the index's most recent BOOTSTRAP covered: the base
    table's vec_ids at the build commit's ``base_version``.  Derived
    from the BASE table's history, not the index's version-0 files —
    a compacted + vacuumed index has no original v0 files left, and
    an index REBUILD resets the cohort boundary to its own build.
    The bootstrap commit is the newest rewrite-flavored commit
    carrying ``base_version`` (builds overwrite; folds append; DV
    deletions carry no base_version)."""
    from .. import tablelog

    boot_base = None
    for h in tablelog.history(index.table_uri):
        meta = h.get("userMetadata") or {}
        if "base_version" in meta and (
            h["version"] == 0
            or tablelog.classify_commit(h.get("operation", "")) == "rewrite"
        ):
            boot_base = int(meta["base_version"])
            break
    if boot_base is None:
        raise ValueError(
            "index has no bootstrap commit (base_version on a "
            "rewrite) — was it created by its build_* function?")
    snap = emb.snapshot(boot_base)
    import os as _os

    gone = [
        a.path for a in snap.files
        if not _os.path.exists(
            _os.path.join(a.base or emb.table_uri, a.path))
    ]
    if gone:
        raise ValueError(
            f"drift cohorts need the base table's version {boot_base} "
            f"snapshot, but {len(gone)} of its files were vacuumed "
            f"(e.g. {gone[:2]}) — rebuild the index to reset the "
            "cohort boundary, or audit with a fresh bootstrap")
    return emb._read_files(snap, list(snap.files)).select("vec_id")


def _cohort_quality(
    emb: DeltaSparkTable,
    index: DeltaSparkTable,
    scored: DataFrame,
    retrained: DataFrame,
) -> DataFrame:
    """Shared drift-audit epilogue: tag each scored vector by whether
    its id was covered by the index's BOOTSTRAP build (present in the
    base table at the build's base_version — see ``_bootstrap_ids``)
    or FOLDED later, aggregate mean/min quality per cohort, and append
    an ``all_retrained`` row scoring the same corpus against a freshly
    trained model.  One grouped aggregate over (vectors x 2) rows; the
    id set never visits the driver."""
    boot = (
        _bootstrap_ids(emb, index)
        .distinct()
        .withColumn("_boot", F.lit(True))
    )
    # NOT broadcast: the bootstrap id set is corpus-sized, not
    # model-sized — let AQE pick the join strategy
    tagged = scored.join(boot, "vec_id", "left").select(
        F.when(F.col("_boot").isNotNull(), F.lit("bootstrap"))
        .otherwise(F.lit("folded")).alias("cohort"),
        "cos",
    )
    per_cohort = tagged.unionByName(
        tagged.select(F.lit("all").alias("cohort"), "cos")
    ).unionByName(
        retrained.select(F.lit("all_retrained").alias("cohort"), "cos")
    )
    # degenerate scores (NaN from a 0/0 cosine, ±inf from the matmul
    # scorer's zero-norm guard) are EXCLUDED from the quality stats —
    # the _with_norm philosophy — and must be: under Spark 4 ANSI
    # mode a non-finite double crashes the DECIMAL cast below instead
    # of propagating visibly
    per_cohort = per_cohort.where(
        ~F.isnan("cos") & (F.abs("cos") != float("inf")))
    # mean via an exact DECIMAL(20,9) accumulator: order-independent
    # (float avg depends on partition fold order) and therefore
    # cross-engine deterministic — the portable dial's DuckDB twin
    # replays the identical sum; the 1e-9 quantization is far below
    # every decision threshold (SCALE.md: 0.02/0.05)
    return per_cohort.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("cos").cast("decimal(20,9)")).cast("double")
         / F.count(F.lit(1))).alias("mean_cos"),
        F.min("cos").alias("min_cos"),
    )


def ivf_index_drift(
    emb: DeltaSparkTable,
    index: DeltaSparkTable,
    iters: int = 1,
    train_sample_mod: int = 1,
) -> DataFrame:
    """DRIFT AUDIT for the CDC-maintained IVF index: how well do the
    STORED centroids still fit the corpus, and what would a rebuild
    buy?  Maintenance folds new vectors against centroids trained at
    bootstrap; as the data distribution shifts, folded cohorts assign
    with ever-lower cosine and recall decays silently — ``ivf_index_
    vs_rebuild`` can't see it (it checks the fold is FAITHFUL to the
    stored centroids, not that the centroids are still any good).

    Returns one row per cohort: ``bootstrap`` / ``folded`` / ``all``
    scored against the STORED centroids, plus ``all_retrained`` — the
    same corpus against centroids freshly trained on the CURRENT
    snapshot (the rebuild candidate; same ``kmeans_centroids`` recipe
    and sizing as the bootstrap).  Read the result with
    ``index_drift_metrics``: ``cohort_decay`` (bootstrap minus folded
    mean assignment cosine) localizes WHERE quality degraded,
    ``rebuild_gain`` (retrained minus stored, over all vectors) prices
    the rebuild.  Cost: two map-only scoring passes + one bounded
    k-means train — run it on maintenance cadence, not per fold.
    Threshold guidance: docs/SCALE.md (rebuild at rebuild_gain > 0.02
    or cohort_decay > 0.05 on unit-normalized corpora).

    The audit RESUMES the index's recorded assignment family (r12,
    like maintenance and the vs_rebuild audit): a ``"portable"``-built
    index retrains the rebuild candidate with
    ``_portable_centroids_from`` and scores through the ordered-fold
    rounded cosine (``_assign_cells_exact``) — every number in the
    drift frame then has a closed form a DuckDB twin replays exactly.
    The ``"matmul"`` family keeps the production numpy paths."""
    from .similarity import (
        _assign_cells_exact,
        _portable_centroids_from,
        _with_norm,
        kmeans_centroids,
    )

    # refuse indexes not built by build_*; resume the family dial
    _v, meta = _resume_version(index)
    family = meta.get("assignment", "matmul")
    cents = _ivf_centroids_table(index).read()
    vectors = _with_norm(
        emb.read().select("vec_id", "embedding")).localCheckpoint()
    # the stored quantizer IS the model of record — size the rebuild
    # candidate from it (maintain commits don't restate n_cells)
    n_cells = cents.count()
    if family == "portable":
        if train_sample_mod != 1:
            # the portable trainer is full-train by definition (its
            # DuckDB twin replays every row); silently dropping the
            # caller's sampling dial would retrain a different model
            # than requested — refuse pointedly instead
            raise ValueError(
                "train_sample_mod is not supported for a "
                "portable-family index (the portable k-means trains "
                "on the full corpus so its oracle twin can replay "
                "it); pass train_sample_mod=1")
        fresh = _portable_centroids_from(vectors, n_cells, iters)

        def score(v, c):
            return _assign_cells_exact(v, c, with_cos=True).select(
                "vec_id", "cos")
    else:
        fresh = kmeans_centroids(vectors, n_cells, iters,
                                 train_sample_mod)
        score = _best_cos_scores
    return _cohort_quality(
        emb, index, score(vectors, cents), score(vectors, fresh),
    )


def pq_index_drift(
    emb: DeltaSparkTable,
    index: DeltaSparkTable,
    iters: int = 8,
    train_sample_mod: int = 1,
    sample_cap: int = 8192,
) -> DataFrame:
    """DRIFT AUDIT for the CDC-maintained PQ code index — the ADC-side
    twin of ``ivf_index_drift``: reconstruction cosine of each vector
    under the STORED codebooks, by cohort, against codebooks freshly
    trained on the current snapshot.  A distribution shift the stored
    codebooks can't span shows up as the folded cohort's
    reconstruction cosine dropping below the bootstrap cohort's (and a
    widening ADC-vs-exact gap at query time); ``rebuild_gain`` prices
    the re-encode.  Same output shape and metrics helper as the IVF
    audit."""
    from .similarity import (
        _codebooks_from_rows,
        _learn_pq_codebooks,
        _pq_sample_matrix,
        _with_norm,
    )

    _resume_version(index)  # refuse indexes not built by build_*
    cb = _codebooks_from_rows(_pq_codebooks_table(index).read().collect())
    vectors = _with_norm(
        emb.read().select("vec_id", "embedding")).localCheckpoint()
    # quantization params come from the stored codebooks' shape —
    # (m, 2**nbits, d/m) — not from metadata maintain commits restate
    m, nbits = cb.shape[0], int(cb.shape[1]).bit_length() - 1
    x = _pq_sample_matrix(vectors, train_sample_mod, sample_cap)
    fresh = _learn_pq_codebooks(x, m, nbits, iters)
    return _cohort_quality(
        emb, index,
        _pq_recon_scores(vectors, cb),
        _pq_recon_scores(vectors, fresh),
    )


def index_drift_metrics(drift: DataFrame) -> dict:
    """Collapse a drift-audit frame (4 rows) into decision scalars:
    ``cohort_decay`` = bootstrap mean minus folded mean (how much
    worse post-bootstrap data fits the stored model; 0 when nothing
    folded yet) and ``rebuild_gain`` = retrained mean minus stored
    mean over all vectors (what a rebuild buys).  Both in cosine
    units on [-2, 2]; see docs/SCALE.md for thresholds."""
    rows = {r["cohort"]: r for r in drift.collect()}
    if "all" not in rows:
        raise ValueError(
            "drift frame has no scored vectors — is the corpus empty "
            "(or every embedding zero-norm)?")
    boot, folded = rows.get("bootstrap"), rows.get("folded")
    return {
        "n_bootstrap": boot["n"] if boot else 0,
        "n_folded": folded["n"] if folded else 0,
        "mean_cos_all": rows["all"]["mean_cos"],
        "cohort_decay": (
            (boot["mean_cos"] - folded["mean_cos"])
            if boot and folded else 0.0),
        "rebuild_gain": (
            rows["all_retrained"]["mean_cos"] - rows["all"]["mean_cos"]),
    }


def rollup_vs_recompute(
    base: DeltaSparkTable,
    rollup: DeltaSparkTable,
    group_cols: Sequence[str],
    measures: Mapping[str, str],
) -> DataFrame:
    """Audit helper: full recompute of ``measures`` over the base
    snapshot, full-outer-joined with the stored rollup — any row where
    the two disagree.  Empty result == the rollup is exact.  Intended
    for tests and one-off verification scans, not the hot path."""
    fresh = base.read().groupBy(*[F.col(c) for c in group_cols]).agg(
        *[F.expr(e).alias(c) for c, e in measures.items()]
    )
    key_eq = reduce(
        lambda a, b: a & b,
        [F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}")) for k in group_cols],
    )
    mismatch = reduce(
        lambda a, b: a | b,
        [~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in measures],
    )
    return (
        fresh.alias("a")
        .join(rollup.read().alias("b"), key_eq, "full_outer")
        .where(mismatch)
    )
