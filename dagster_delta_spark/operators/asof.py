"""Temporal join operators: as-of join and bounded range join.

Neither exists as a Spark built-in; both are re-expressed as
compositions of built-in operators that keep the work inside one
shuffle (SURVEY §2.6 lists them as engine-surface additions).

- ``asof_join``: the classic union+window plan — tag both streams,
  union, sort within the partition key, carry the last left-side row
  forward.  One shuffle on the key; no per-row Python.  This scales to
  arbitrarily many right rows per key (where a naive
  greatest-timestamp self-join would explode).
- ``range_join_pairs``: equi-join on the key plus a range predicate —
  Catalyst executes the equality as the join key and the range as a
  post-filter, so the shuffle stays keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .relational import load_events


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of join: for each left row, the newest right row with
    ``right.ts <= left.ts`` (backward).  Returns left columns plus
    right columns prefixed ``r_``.

    Plan shape: union both sides with a side marker, window-sort by
    (key, ts, side) carrying the last right row forward, then keep
    left rows.  Right rows order before left rows at equal timestamps,
    so ties match (>= semantics, like DuckDB ASOF)."""
    if direction != "backward":
        raise ValueError("only backward as-of is implemented")
    rt = right.select(
        F.col(on).alias("__k"), F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in right.columns]).alias("__r"),
    )
    lt = left.select(
        F.col(on).alias("__k"), F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in left.columns]).alias("__l"),
    )
    rt = rt.withColumn("__l", F.lit(None).cast(lt.schema["__l"].dataType))
    lt = lt.withColumn("__r", F.lit(None).cast(rt.schema["__r"].dataType))

    unioned = rt.unionByName(lt)
    # __r as the final key: right rows tied on (key, ts) otherwise sort
    # in arbitrary order and F.last() returns a run-dependent pick —
    # the struct comparison makes the chosen match deterministic
    # (struct-max among ties) across runs and partitionings
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "__last_r", F.last("__r", ignorenulls=True).over(w)
    ).where(F.col("__side") == 1)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__last_r.{c}").alias(f"r_{c}") for c in right.columns
    ]
    return matched.select(*out_cols)


def clicks_asof_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'click' event, the user's most recent prior (or
    simultaneous) 'purchase' event."""
    ev = load_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(clicks, purchases, on="user_id", ts="ts")
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("r_event_id").alias("p_event_id"),
        F.col("r_ts").alias("p_ts"),
        F.col("r_value").alias("p_value"),
    )


def event_bursts(ev: DataFrame, window_seconds: int = 60) -> DataFrame:
    """Bounded range self-join: pairs of events by the same user within
    ``window_seconds`` (strictly later second event).

    Scale-safe plan: bucket ``ts`` into window-sized bins and equi-join
    on ``(user_id, bin)``, with the earlier side exploded into its own
    bin and the next one — every qualifying pair co-locates on exactly
    one equi key, so candidates per row are bounded by two bins' worth
    of events instead of the user's entire history (a plain
    ``user_id``-only join is quadratic per hot user: 1e5 events in one
    key -> 1e10 candidate pairs in a single task).  The exact range
    predicate then filters within the bucketed candidates."""
    w = int(window_seconds)
    ev = ev.select("event_id", "user_id", "ts")
    # exact integer binning on microseconds: a double ts at current
    # epochs carries ~0.5 us ulp, enough to flip floor() at a bin
    # boundary and mis-bucket boundary events
    bin_of = F.expr(f"unix_micros(ts) div {w * 1_000_000}")
    a = (
        ev.withColumn("__b0", bin_of)
        .withColumn("__bin", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)))
        .drop("__b0")
        .alias("a")
    )
    b = ev.withColumn("__bin", bin_of).alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.__bin") == F.col("b.__bin"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr(f"INTERVAL {w} SECONDS")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            # exact microsecond arithmetic, then ONE division: the
            # difference of two double-cast timestamps carries ~0.5 us
            # of rounding that can flip the oracle's 6-digit rounding
            ((F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts")))
             / F.lit(1000000.0)).alias("gap_seconds"),
        )
    )


def user_event_bursts(
    spark: SparkSession, sf_dir: str, window_seconds: int = 60
) -> DataFrame:
    return event_bursts(load_events(spark, sf_dir), window_seconds)


def event_funnel(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel: per user, the earliest time of step 1, then the
    earliest step 2 STRICTLY AFTER it, and so on; returns per-step
    reached-user counts and median seconds from step 1.

    Plan shape: one keyed aggregation per step (k is small and fixed),
    each joining the previous step's per-user frontier — every join is
    on user_id, the frontier frames are one row per qualifying user, so
    AQE broadcasts them while they fit and the whole funnel is k keyed
    shuffles, never a per-user sort of full history."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    frontier = (
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    frontiers = [frontier]
    for step in steps[1:]:
        nxt = (
            ev.where(F.col("event_type") == step)
            .join(frontier.select("user_id", F.col("t").alias("prev_t")),
                  "user_id")
            .where(F.col("ts") > F.col("prev_t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        frontiers.append(nxt)
        frontier = nxt
    base = frontiers[0].select(
        "user_id", F.col("t").alias("t0")
    )
    out = None
    for i, (step, fr) in enumerate(zip(steps, frontiers)):
        stage = (
            fr.join(base, "user_id")
            .agg(
                F.lit(i + 1).alias("step_idx"),
                F.count(F.lit(1)).alias("n_users"),
                F.expr(
                    "percentile(CAST(t AS DOUBLE) - CAST(t0 AS DOUBLE), 0.5)"
                ).cast("double").alias("median_secs_from_start"),
            )
            .withColumn("step", F.lit(step))
        )
        out = stage if out is None else out.unionByName(stage)
    return out.select("step_idx", "step", "n_users", "median_secs_from_start")
