"""Shared two-level exact rank / prefix sum.

The engine's exact global-ordering primitives (top-fraction cutoffs,
NTILE terciles, epoch top-ups, running token budgets, histogram
cutoffs) all need a TOTAL-ORDER rank or running sum — and a naive
``Window.orderBy(key)`` collapses the corpus onto one reducer.  Every
call site instead uses the same two-level shape:

1. bucket each row by a coarse key that is MONOTONE in the leading
   order column (a hex prefix, ``floor(value * k)``, or the grid value
   itself), so ordering by ``(bucket, order_cols)`` equals ordering by
   ``order_cols``;
2. aggregate per-(group, bucket) counts (or weight sums) into a tiny
   frame — bounded by bucket cardinality, NOT corpus size;
3. exclusive prefix sum over that tiny frame (the only
   single-partition-per-group window, over <= |buckets| rows);
4. broadcast the offsets back and rank WITHIN (group, bucket) — the
   per-bucket window spreads across reducers.

Before r13 five operators hand-rolled this (ccnet terciles, UniMax
epoch top-up, token-budget running sum, quality-prune histogram
cutoff, RHO-1 selective mask) and the copies drifted — r12's review
caught a zero-atom single-reducer sort in one of them.  This module is
the single implementation they all share now.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def exact_rank(
    df: DataFrame,
    order_cols: Sequence[ColumnOrName],
    bucket_col: str,
    group_cols: Sequence[str] = (),
    weight_col: Optional[str] = None,
    out_col: str = "rank0",
    bucket_desc: bool = False,
    counts: Optional[DataFrame] = None,
) -> DataFrame:
    """Add ``out_col`` = the EXCLUSIVE rank (number of strictly
    preceding rows) — or, with ``weight_col``, the exclusive running
    weight sum — of each row under the total order ``(group_cols,
    order_cols)``, without a global sort.

    Contract (the caller's obligation, asserted nowhere because it is
    a property of the expression, not the data): ``bucket_col`` must
    be a MONOTONE function of the leading ``order_cols`` entry, in the
    same direction as ``bucket_desc`` — ordering by ``(bucket,
    order_cols)`` must equal ordering by ``order_cols`` alone.  The
    per-(group, bucket) frame must be small (hex prefixes, value
    grids: thousands of rows at any corpus size) — it is broadcast.

    ``order_cols`` entries may be names or Column expressions (pass
    ``F.col(c).desc()`` for descending legs).  With ``weight_col``
    the intra-bucket leg is an exclusive windowed sum, so ties in
    ``order_cols`` still produce a deterministic result only if the
    order is total — same rule as ``row_number``.  A bucket that IS
    the full order key (histogram case) needs no ``order_cols``:
    every bucket holds one aggregated row and ``out_col`` is the pure
    bucket-level exclusive prefix sum.

    ``counts`` optionally supplies the per-(group, bucket) frame
    precomputed by the caller (columns ``group_cols + [bucket_col,
    "__c"]``) — for callers that ALSO need those counts (per-group
    totals, cutoffs), so the corpus is aggregated once, not once per
    consumer.
    """
    group_cols = list(group_cols)
    if counts is None:
        w_count = (
            F.sum(F.col(weight_col)) if weight_col is not None
            else F.count(F.lit(1))
        )
        counts = df.groupBy(*group_cols, bucket_col).agg(
            w_count.alias("__c"))
    from pyspark.sql.window import Window

    bucket_order = (
        F.col(bucket_col).desc() if bucket_desc else F.col(bucket_col)
    )
    wo = (
        Window.partitionBy(*group_cols).orderBy(bucket_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__c").over(wo), F.lit(0)))
    join_keys = group_cols + [bucket_col]
    if order_cols:
        wi = Window.partitionBy(*join_keys).orderBy(*order_cols)
        if weight_col is not None:
            intra = F.coalesce(
                F.sum(weight_col).over(
                    wi.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0))
        else:
            intra = F.row_number().over(wi) - F.lit(1)
    else:
        # histogram degenerate case: bucket == full order key, one
        # aggregated row per bucket — the offset IS the rank
        intra = F.lit(0)
    return (
        df.withColumn("__ir", intra)
        .join(F.broadcast(offsets.select(*join_keys, "__off")), join_keys)
        .withColumn(out_col, F.col("__off") + F.col("__ir"))
        .drop("__ir", "__off")
    )
