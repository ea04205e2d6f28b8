"""Pins for the r16 merge shared-source materialization.

merge() consumes its source plan up to four times (bounds agg,
discovery join, rewrite join, generated-column validation); an
EXPENSIVE source (wide or Python-boundary operators in its plan) is
now localCheckpoint'd once, while scan-cheap sources keep the old
re-evaluation (A/B'd at parity) and already-checkpointed sources are
never copied twice.
"""

from pyspark.sql import functions as F

from dagster_delta_spark import (
    DeltaSparkTable, MergeConfig, MergeType, WriteMode,
)
from dagster_delta_spark.table import (
    _plan_is_expensive, _plan_is_materialized,
)


def _base(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))


def test_plan_classification(spark):
    cheap = _base(spark).where("k > 3").select("k", "v")
    assert not _plan_is_expensive(cheap)
    assert not _plan_is_materialized(cheap)
    agg = _base(spark).groupBy("k").agg(F.sum("v").alias("v"))
    assert _plan_is_expensive(agg)
    joined = _base(spark).join(_base(spark).select("k"), "k")
    assert _plan_is_expensive(joined)
    ck = _base(spark).localCheckpoint()
    assert _plan_is_materialized(ck)
    assert _plan_is_materialized(ck.select("k", "v").where("k < 10"))


def test_expensive_source_evaluates_once(spark, tmp_path):
    """An aggregate-carrying source flows through merge exactly once:
    the accumulator-marked projection under the Deduplicate runs n
    times total (the single checkpoint materialization), not once per
    consumer pass."""
    acc = spark.sparkContext.accumulator(0)

    def _mark(x):
        acc.add(1)
        return x

    marked = F.udf(_mark, "long").asNondeterministic()
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_base(spark), WriteMode.error)
    n = 100
    src = (
        spark.range(n)
        .select(marked(F.col("id") + 50).alias("k"),
                F.lit(9.0).alias("v"))
        .distinct()
    )
    assert _plan_is_expensive(src)
    t.merge(src, MergeConfig(MergeType.upsert, predicate="s.k = t.k"))
    assert acc.value == n, (
        f"source evaluated {acc.value / n:.1f}x — must be exactly once")
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    # source keys 50..149 all match: matched rows updated to 9.0,
    # the rest keep v = 2k, no inserts
    assert (50, 9.0) in got and (149, 9.0) in got
    assert (0, 0.0) in got and (150, 300.0) in got
    assert len(got) == 200


def test_checkpointed_source_not_copied(spark, tmp_path, monkeypatch):
    """A source that is already a LogicalRDD (the CDC-sink contract)
    must not be localCheckpoint'd again by merge."""
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_base(spark), WriteMode.error)
    src = (
        _base(spark).groupBy("k").agg(F.max("v").alias("v"))
        .localCheckpoint()
    )
    called = {"n": 0}
    orig = type(src).localCheckpoint

    def spy(self, *a, **kw):
        called["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(src), "localCheckpoint", spy)
    t.merge(src, MergeConfig(MergeType.upsert, predicate="s.k = t.k"))
    assert called["n"] == 0, "merge re-checkpointed a checkpointed source"
