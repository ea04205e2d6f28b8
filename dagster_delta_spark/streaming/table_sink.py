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
