"""Incremental materialized-aggregate maintenance over the table log.

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
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

from ..config import MergeConfig, MergeType, WriteMode
from ..table import DeltaSparkTable


def maintain_rollup(
    base: DeltaSparkTable,
    rollup: DeltaSparkTable,
    group_cols: Sequence[str],
    measures: Mapping[str, str],
    since_version: int,
) -> int:
    """Fold base versions ``(since_version, head]`` into ``rollup``.

    ``measures`` maps output column -> Spark SQL *aggregate* expression
    over the delta rows.  Each expression must be additive (``sum(x)``,
    ``count(*)``, ...): the stored value for a group is the ``+`` of
    per-run partials, so holding the expression's output type stable
    matters — cast inside the expression (e.g. money through
    ``DECIMAL(30,10)``, the exact-accumulation rule) and the combine
    re-casts to the stored column type on every run.

    Returns the new processed version (pass it back as
    ``since_version`` next run; no new commits -> no-op).
    """
    if not group_cols:
        raise ValueError("maintain_rollup needs at least one group column")
    bad = set(measures) & set(group_cols)
    if bad:
        raise ValueError(f"measure names collide with group columns: {sorted(bad)}")
    head = base.version()
    if head <= since_version:
        return since_version
    delta = base.read_changes(since_version, head)
    aggs = [F.expr(e).alias(c) for c, e in measures.items()]
    partial = delta.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)

    if not rollup.exists():
        rollup.write(partial, WriteMode.error)
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
    )
    rollup.merge(
        combined,
        MergeConfig(
            MergeType.upsert,
            predicate=" AND ".join(f"s.{k} <=> t.{k}" for k in group_cols),
        ),
    )
    return head


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
