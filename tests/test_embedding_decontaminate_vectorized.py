"""Pins for the r15 vectorized ``embedding_decontaminate`` path.

The operator's scoring moved from per-pair interpreted JVM DOT folds
to an Arrow-batched numpy fold (``mapInArrow``, preallocated ``out=``
buffers).  These tests pin the equivalence contract: the vectorized
path must match the retained exact JVM formulation
(``_embedding_decontaminate_sql``) bit-for-bit — including the
degenerate inputs the generation contract normally excludes
(zero-norm vectors, NaN elements, ragged rows) — and ragged/empty
EVAL sets must fall back to the JVM plan rather than mis-vectorize.
"""

import math

import pytest

from dagster_delta_spark.operators import similarity


def _write_embeddings(spark, tmp_path, rows):
    """Write (vec_id, embedding float32) rows the way testdata stores
    them — list<float>, the dtype the vectorized path must widen."""
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType)

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", LongType()),
    ])
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in rows], schema)
    out = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def _rows_set(df):
    return {
        (r["vec_id"], r["matched_eval_id"],
         None if r["cosine"] is None
         else ("nan" if math.isnan(r["cosine"]) else r["cosine"]))
        for r in df.collect()
    }


def test_vectorized_equals_jvm_on_degenerates(spark, tmp_path):
    d = 6
    rows = []
    # eval ids: vec_id % 17 == 3 -> 3, 20, 37, 54
    rows.append((3, [1.0, 0.5, -0.25, 2.0, 0.0, 1.5]))
    rows.append((20, [0.0] * d))           # zero-norm EVAL row: excluded
    rows.append((37, [-1.0, 0.5, 0.25, -2.0, 0.25, 1.5]))
    rows.append((54, [0.5, 0.5, 0.5, 0.5, 0.5, 0.5]))
    # corpus: near-dup of eval 3, orthogonal-ish, zero vector,
    # NaN element, ragged row
    rows.append((1, [1.0, 0.5, -0.25, 2.0, 0.001, 1.5]))
    rows.append((2, [0.0, 0.0, 0.0, 0.0, 1.0, -1.0]))
    rows.append((4, [0.0] * d))            # zero-norm corpus: excluded
    rows.append((5, [1.0, float("nan"), 0.0, 0.0, 0.0, 0.0]))
    rows.append((6, [1.0, 0.5]))           # ragged: can never flag
    sf_dir = _write_embeddings(spark, tmp_path, rows)

    new = similarity.embedding_decontaminate(spark, sf_dir)
    old = similarity._embedding_decontaminate_sql(spark, sf_dir, 0.4, 17, 3)
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0

    got = _rows_set(new)
    flagged = {v for v, _e, _c in got}
    # the exact-self-match eval rows flag themselves at cosine 1
    assert (3, 3, 1.0) in got and (37, 37, 1.0) in got
    assert (54, 54, 1.0) in got
    # zero-norm rows excluded on both sides; ragged row never flags
    assert 4 not in flagged and 6 not in flagged
    assert all(e != 20 for _v, e, _c in got)
    # the near-dup of eval 3 flags with best match 3
    assert any(v == 1 and e == 3 for v, e, _c in got)
    # NaN cosine passes the threshold (Spark ranks NaN above all)
    assert any(v == 5 and c == "nan" for v, _e, c in got)


def test_ragged_eval_set_falls_back_to_jvm(spark, tmp_path, monkeypatch):
    rows = [
        (3, [1.0, 0.5, -0.25]),
        (20, [1.0, 0.5]),        # ragged EVAL row -> fallback
        (1, [1.0, 0.5, -0.25]),
    ]
    sf_dir = _write_embeddings(spark, tmp_path, rows)
    called = {}
    orig = similarity._embedding_decontaminate_sql

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(
        similarity, "_embedding_decontaminate_sql", spy)
    similarity.embedding_decontaminate(spark, sf_dir).collect()
    assert called.get("hit"), "ragged eval set must take the JVM plan"


def test_vectorized_path_has_no_exchange(spark):
    """The vectorized plan is map-only: the best-match aggregate
    happens inside the Arrow batch, so no Exchange (the JVM plan paid
    a window sort+Exchange).  Uses the real sf0.001 testdata."""
    df = similarity.embedding_decontaminate(
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan
