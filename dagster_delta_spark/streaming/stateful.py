"""Custom stateful streaming operator: running per-user counters via
``applyInPandasWithState``.

``session_window``/windowed aggs cover the declarative cases
(``events.py``); this module is the escape hatch the reference's
architecture never had — arbitrary per-key state machines executed as
Arrow-batched Python with bounded state and timeouts.  Demonstrated
operator: a running per-user spend monitor that emits an updated
(user_id, n_events, total_value, max_single_value) row per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("max_value", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("max_value", DoubleType()),
])


def user_totals_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals over the event stream.

    Wraps the update function in a local closure so cloudpickle ships
    it by value — workers may not have this repo on PYTHONPATH."""

    def _update(key, pdf_iter, state):
        # fully inlined (no module-global references): cloudpickle
        # ships nested functions by value, but any global they touch
        # is pickled as a module import the worker can't resolve
        import pandas as _pd

        (user_id,) = key
        if state.exists:
            n, total, mx = state.get
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield _pd.DataFrame({
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        })

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_user_totals_once(
    spark: SparkSession, sf_dir: str, table_name: str = "user_totals"
) -> DataFrame:
    """Drive the stateful operator over the static fixture; the final
    per-user row equals the batch groupBy (asserted in tests)."""
    from .events import read_events_stream

    stream = user_totals_stream(read_events_stream(spark, sf_dir, 8))
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # update mode emits one row per user per batch; the last one wins
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    raw = spark.table(table_name).withColumn(
        "__idx", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("__idx"))
    return (
        raw.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "n_events", "total_value", "max_value")
    )
