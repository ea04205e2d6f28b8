"""Exactly-once streaming sink into a DeltaSparkTable.

Structured Streaming's ``foreachBatch`` gives at-least-once delivery:
after a crash the last in-flight micro-batch is REPLAYED with the same
``batchId``.  Delta's sink closes the loop with the ``txn``
(SetTransaction) protocol — the sink records ``(appId, batchId)`` in
the same atomic commit as the data, and a replayed batch sees its id
already recorded and no-ops.  ``DeltaSparkTable.idempotent_append``
implements that protocol (the recorded-id check runs inside the commit
retry loop, so racing workers cannot double-append); this module is
the thin ``foreachBatch`` adapter.

Scale shape: the data plane is a normal distributed parquet append per
micro-batch; the ledger adds one integer per app id to the snapshot —
O(number of distinct writing applications), not O(batches), because
replay folds it with ``max``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame

from ..table import DeltaSparkTable


def exactly_once_table_sink(
    table_uri: str,
    app_id: str,
    *,
    partition_columns: Optional[Sequence[str]] = None,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function appending each micro-batch to the
    table exactly once::

        (df.writeStream
           .foreachBatch(exactly_once_table_sink(uri, "my-pipeline"))
           .option("checkpointLocation", ckpt)
           .trigger(availableNow=True)
           .start())

    ``app_id`` identifies the WRITER (one per streaming query lineage;
    a new checkpoint dir restarts batch numbering, so pair a fresh
    checkpoint with a fresh app_id)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        DeltaSparkTable(batch_df.sparkSession, table_uri).idempotent_append(
            batch_df, app_id, batch_id,
            partition_columns=partition_columns,
        )

    return sink


def index_maintaining_sink(
    table_uri: str,
    index_uri: str,
    app_id: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    partition_columns: Optional[Sequence[str]] = None,
) -> Callable[[DataFrame, int], None]:
    """``exactly_once_table_sink`` + CDC index maintenance in one
    ``foreachBatch``: each micro-batch appends to the documents table
    exactly once, then the persisted MinHash-LSH bucket index folds
    the not-yet-indexed commits (``incremental.maintain_lsh_index``;
    the first batch bootstraps via ``build_lsh_index``) — a streaming
    ingest whose near-dup index is ALWAYS current, no separate
    maintenance job to schedule or forget.

    Crash/replay safety composes from the two idempotent halves: a
    replayed batch's append no-ops on the txn ledger (table head
    unchanged), and maintenance resumes from the index's own
    ``base_version`` metadata, so an already-folded head is a no-op
    too — the pair is exactly-once end-to-end without any shared
    coordination beyond the table versions themselves.  An external
    REWRITE of the table fails the stream loudly (``read_changes``
    raises; rebuild the index instead) — silence would leave ghost
    bucket rows.

    Per-batch cost is O(batch): one append commit + shingling/banding
    of only the new documents."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.incremental import (
            build_lsh_index,
            maintain_lsh_index,
        )

        spark = batch_df.sparkSession
        table = DeltaSparkTable(spark, table_uri)
        table.idempotent_append(
            batch_df, app_id, batch_id,
            partition_columns=partition_columns,
        )
        index = DeltaSparkTable(spark, index_uri)
        if not index.exists():
            build_lsh_index(table, index, num_hashes, bands)
        else:
            maintain_lsh_index(table, index)

    return sink


def rollup_maintaining_sink(
    table_uri: str,
    rollup_uri: str,
    app_id: str,
    group_cols: Sequence[str],
    measures: dict[str, str],
    *,
    count_col: Optional[str] = None,
    partition_columns: Optional[Sequence[str]] = None,
) -> Callable[[DataFrame, int], None]:
    """``exactly_once_table_sink`` + incremental materialized-aggregate
    maintenance in one ``foreachBatch``: each micro-batch appends to
    the fact table exactly once, then the stored rollup folds the
    not-yet-processed commits (``incremental.maintain_rollup``,
    resuming from the rollup's own ``base_version`` metadata) — a
    STREAMING MATERIALIZED VIEW whose base is transactional and whose
    refresh cost is O(batch) + O(touched groups), never a rescan.

    Because ``maintain_rollup`` consumes the row-level change feed,
    merge-on-read DELETE/UPDATE issued on the fact table BETWEEN
    micro-batches fold into the next maintenance run as signed
    partials — out-of-band corrections keep the view exact without
    pausing the stream.  Copy-rewrites fail the stream loudly
    (rebuild the rollup).

    Crash/replay safety composes exactly like ``index_maintaining_
    sink``: the append no-ops on the txn ledger, maintenance no-ops on
    an already-folded head — exactly-once end-to-end with no shared
    coordination beyond the table versions."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.incremental import maintain_rollup

        spark = batch_df.sparkSession
        table = DeltaSparkTable(spark, table_uri)
        table.idempotent_append(
            batch_df, app_id, batch_id,
            partition_columns=partition_columns,
        )
        maintain_rollup(
            table, DeltaSparkTable(spark, rollup_uri),
            group_cols, measures, count_col=count_col,
        )

    return sink
