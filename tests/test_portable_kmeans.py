"""The portable (SQL-replayable) k-means dial behind the r10
kmeans_clusters / ann_ivf_topk oracle conversions
(similarity._portable_centroids / kmeans_clusters_portable /
ivf_ann_topk_portable).  Cross-engine parity runs in
tools/check_oracles.py; these pin the Spark-side semantics."""

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def test_portable_kmeans_population_and_coherence(spark):
    rows = similarity.kmeans_clusters_portable(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.where(
        F.expr(similarity.NORM.format(a="embedding")) > 0).count()
    assert sum(r["n_vectors"] for r in rows) == n
    assert len(rows) <= 8
    for r in rows:
        assert -1.0 - 1e-9 <= r["min_cos"] <= r["mean_cos"] <= 1.0 + 1e-9
    assert [r["cell"] for r in rows] == sorted(r["cell"] for r in rows)


def test_portable_kmeans_deterministic(spark):
    a = similarity.kmeans_clusters_portable(spark, SF).collect()
    b = similarity.kmeans_clusters_portable(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_portable_ivf_full_probe_equals_rounded_brute_force(spark):
    """nprobe >= n_cells removes the approximation: the portable IVF
    must reproduce the brute-force top-k under the SAME rounded-cosine
    ordering (the portable dial's quantization, ties by vec_id)."""
    full = {(r["q_id"], r["rank"]): r["vec_id"]
            for r in similarity.ivf_ann_topk_portable(
                spark, SF, nprobe=8).collect()}
    emb = similarity._with_norm(
        spark.read.parquet(f"{SF}/embeddings.parquet")).where(
        F.col("norm") > 0)
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"))
    dot = similarity.DOT.format(a="q_emb", b="embedding")
    scored = (emb.crossJoin(q)
              .where(F.col("vec_id") != F.col("q_id"))
              .withColumn("cosine", F.round(
                  F.expr(dot) / (F.col("norm") * F.col("q_norm")), 9)))
    exact = {(r["q_id"], r["rank"]): r["vec_id"]
             for r in similarity._topk(scored, 5).collect()}
    assert full == exact


def test_portable_ivf_probe_subsets_candidates(spark):
    """nprobe=1 answers come from the query's own nearest cell only —
    every returned id must share the query's probed cell."""
    out = similarity.ivf_ann_topk_portable(spark, SF, nprobe=1)
    emb, cents = similarity._portable_centroids(spark, SF, 8, 1)
    cells = {r["vec_id"]: r["cell"]
             for r in similarity._assign_cells_exact(emb, cents).collect()}
    # a query's nearest cell IS its own assignment cell (same rounded
    # argmax), so nprobe=1 candidates share the query's cell
    for r in out.collect():
        assert cells[r["vec_id"]] == cells[r["q_id"]]


def test_portable_kmeans_validates_iters(spark):
    with pytest.raises(ValueError, match="train_iters"):
        similarity.kmeans_clusters_portable(spark, SF, train_iters=-1)


def test_portable_kmeans_zero_iters_uses_init(spark):
    rows = similarity.kmeans_clusters_portable(
        spark, SF, train_iters=0).collect()
    assert rows and sum(r["n_vectors"] for r in rows) > 0


def test_portable_semantic_dedup_rule(spark):
    """Hand-verify the one-pass greedy rule on the portable cells: a
    vector is dropped iff SOME smaller-id in-cell vector has rounded
    cosine >= threshold, and dup_of is the smallest such id."""
    t = 0.4
    out = {r["vec_id"]: r for r in
           similarity.semantic_dedup_portable(
               spark, SF, threshold=t).collect()}
    emb, cents = similarity._portable_centroids(spark, SF, 8, 1)
    rows = similarity._assign_cells_exact(emb, cents).collect()
    import numpy as np
    by_id = {r["vec_id"]: (r["cell"],
                           np.asarray(r["embedding"], dtype=np.float64),
                           float(r["norm"])) for r in rows}
    ids = sorted(by_id)
    for i in ids:
        ci, vi, ni = by_id[i]
        dups = []
        for j in ids:
            if j >= i:
                break
            cj, vj, nj = by_id[j]
            if cj == ci and round(float(vi @ vj) / (ni * nj), 9) >= t:
                dups.append(j)
        r = out[i]
        if dups:
            assert not r["keep"] and r["dup_of"] == min(dups), (i, r)
        else:
            assert r["keep"] and r["dup_of"] is None, (i, r)


def test_portable_sq8_full_rerank_equals_portable_ivf(spark):
    """rerank covering every probed candidate removes the stage-1
    approximation: portable IVF-SQ8 must reproduce the portable IVF
    (q_id, rank) -> vec_id mapping exactly."""
    anchor = {(r["q_id"], r["rank"]): r["vec_id"]
              for r in similarity.ivf_ann_topk_portable(spark, SF).collect()}
    full = {(r["q_id"], r["rank"]): r["vec_id"]
            for r in similarity.ivf_quantized_topk_portable(
                spark, SF, rerank=10**9).collect()}
    assert full == anchor


def test_portable_pq_full_rerank_equals_portable_ivf(spark):
    """rerank covering every probed candidate removes the ADC
    approximation: portable IVF-PQ must reproduce the portable IVF
    (q_id, rank) -> vec_id mapping exactly."""
    anchor = {(r["q_id"], r["rank"]): r["vec_id"]
              for r in similarity.ivf_ann_topk_portable(spark, SF).collect()}
    full = {(r["q_id"], r["rank"]): r["vec_id"]
            for r in similarity.ivf_pq_topk_portable(
                spark, SF, rerank=10**9).collect()}
    assert full == anchor


def test_portable_pq_validates_dims(spark):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.ivf_pq_topk_portable(spark, SF, m=7)


def test_portable_recall_report_shape(spark):
    rows = similarity.ann_recall_report_portable(spark, SF).collect()
    assert len(rows) == 15  # 3 methods x 5 queries
    assert {r["method"] for r in rows} == {"lsh", "ivf", "ivf_pq"}
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    # recall is hits/5 over integer hit counts
    assert all(abs(r["recall"] * 5 - round(r["recall"] * 5)) < 1e-12
               for r in rows)
