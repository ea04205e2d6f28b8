"""Exact fuzzy self-join via symmetric deletion (operators/fuzzy.py)."""

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_self_join,
)


def _df(spark, strings):
    return spark.createDataFrame(
        list(enumerate(strings)), "key bigint, s string")


def _brute(spark, strings, k):
    df = _df(spark, strings)
    a, b = df.alias("a"), df.alias("b")
    return {
        (r["key_a"], r["key_b"], r["dist"])
        for r in a.join(b, F.col("a.key") < F.col("b.key"))
        .withColumn("dist", F.levenshtein(F.col("a.s"), F.col("b.s")))
        .where(F.col("dist") <= k)
        .select(F.col("a.key").alias("key_a"),
                F.col("b.key").alias("key_b"), "dist")
        .collect()
    }


def test_variants_include_original_and_deletions(spark):
    out = {r["variant"]
           for r in deletion_variants(_df(spark, ["abc"]), "key", "s")
           .collect()}
    assert out == {"abc", "bc", "ac", "ab"}


def test_edit_kinds_all_covered(spark):
    """Substitution, insertion, deletion and exact-duplicate pairs must
    all surface at max_edit=1; a distance-2 pair must not."""
    strings = ["kitten", "mitten", "kittens", "kiten", "kitten", "mutton"]
    got = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in fuzzy_self_join(_df(spark, strings), "key", "s").collect()
    }
    assert got == _brute(spark, strings, 1)
    keys = {(a, b) for a, b, _ in got}
    assert (0, 1) in keys      # substitution
    assert (0, 2) in keys      # insertion
    assert (0, 3) in keys      # deletion
    assert (0, 4) in keys      # identical strings, distinct keys
    assert (0, 5) not in keys  # kitten->mutton is distance 2


@pytest.mark.parametrize("k", [1, 2])
def test_matches_brute_force(spark, k):
    """Structured corpus with typo clusters: candidate scheme must
    reproduce the cross-join answer exactly at both depths."""
    base = ["alpha-node-%03d" % i for i in range(30)]
    strings = base + ["alpha-node-0%02d" % i for i in range(10)] \
        + ["alpha-nod-%03d" % i for i in range(10)] + ["zebra", "zebr4"]
    got = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in fuzzy_self_join(_df(spark, strings), "key", "s",
                                 max_edit=k).collect()
    }
    want = _brute(spark, strings, k)
    assert got == want and len(want) > 20


def test_bucket_cap_bounds_but_stays_subset(spark):
    """A planted 50-copy identical string is inherently quadratic pair
    output; with a cap the result is a subset of the exact answer and
    the capped bucket still yields pairs."""
    strings = ["dup"] * 50 + ["unique-%d" % i for i in range(10)]
    exact = _brute(spark, strings, 1)
    capped = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in fuzzy_self_join(_df(spark, strings), "key", "s",
                                 max_bucket_size=5).collect()
    }
    assert capped <= exact
    assert any(d == 0 for _, _, d in capped)
    assert len(capped) < len(exact)


def test_rejects_bad_depth(spark):
    with pytest.raises(ValueError, match="max_edit"):
        deletion_variants(_df(spark, ["x"]), "key", "s", max_edit=3)
