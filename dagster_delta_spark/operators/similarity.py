"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast; the corpus scan is embarrassingly parallel;
  per-partition top-k then a single global merge of k*partitions rows.
- ``lsh_ann_topk``: random-hyperplane LSH — the scale path.  Hyperplane
  coefficients are derived from ``xxhash64(plane, dim)`` so the whole
  pipeline is deterministic, JVM-side, and needs no model state.
- ``embedding_near_dups``: all pairs above a cosine threshold
  (brute-force exact; LSH-bucketed variant for scale).

Dot products use ``zip_with``+``aggregate`` array lambdas (vectorized
in codegen) rather than Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import load

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)
NORM = "sqrt(aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"


def _with_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("norm", F.expr(NORM.format(a=col)))


def cosine_topk(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors
    (excluding self-matches).  Deterministic tiebreak on vec_id."""
    from pyspark.sql.window import Window

    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    dot = DOT.format(a="q_emb", b="embedding")
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .withColumn("cosine", F.expr(dot) / (F.col("norm") * F.col("q_norm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("cosine").cast("double").alias("cosine"),
                "rank")
    )


def _hyperplane_signature(col: str, planes: int, dims_expr: str) -> str:
    """16-ish-bit signature: bit p = sign of sum_d coef(p,d)*v[d], with
    coef(p,d) = +-1 from xxhash64(p, d) parity."""
    proj = (
        f"aggregate(zip_with({col}, sequence(0, {dims_expr} - 1), "
        f"(v, d) -> CASE WHEN (xxhash64(p, d) & 1) = 1 THEN CAST(v AS DOUBLE) "
        f"ELSE -CAST(v AS DOUBLE) END), 0D, (acc, x) -> acc + x)"
    )
    return (
        f"aggregate(transform(sequence(0, {planes - 1}), p -> "
        f"CASE WHEN ({proj}) > 0 THEN shiftleft(1L, p) ELSE 0L END), "
        f"0L, (acc, x) -> acc | x)"
    )


def lsh_signatures(
    spark: SparkSession, sf_dir: str, planes: int = 12
) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    sig = _hyperplane_signature("embedding", planes, "size(embedding)")
    return emb.select("vec_id", "embedding", F.expr(sig).alias("bucket"))


def lsh_ann_topk(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 5,
    planes: int = 12,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane
    bucket; exact cosine re-ranks candidates.  At scale the bucket
    join replaces the full cross product — recall traded via
    ``planes``."""
    from pyspark.sql.window import Window

    sigs = _with_norm(lsh_signatures(spark, sf_dir, planes))
    queries = sigs.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    dot = DOT.format(a="q_emb", b="embedding")
    scored = (
        sigs.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .withColumn("cosine", F.expr(dot) / (F.col("norm") * F.col("q_norm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("cosine").cast("double").alias("cosine"),
                "rank")
    )


def embedding_near_dups(
    spark: SparkSession, sf_dir: str, threshold: float = 0.99
) -> DataFrame:
    """All embedding pairs with cosine >= threshold (brute force,
    exact; doc-level near-dup detection by representation)."""
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("emb_a"),
                   F.col("norm").alias("norm_a"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("emb_b"),
                   F.col("norm").alias("norm_b"))
    dot = DOT.format(a="emb_a", b="emb_b")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.expr(dot) / (F.col("norm_a") * F.col("norm_b")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.col("cosine").cast("double").alias("cosine"))
    )


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of embeddings — element-wise mean over an
    array column via posexplode + re-assembly (the distributed way;
    no driver collection)."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("mean_v"), F.count(F.lit(1)).alias("n"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_v"))
            ).alias("pairs"),
            F.first("n").alias("n_vectors"),
        )
        .select(
            "label",
            F.expr("transform(pairs, p -> p.mean_v)").alias("centroid"),
            "n_vectors",
        )
    )
