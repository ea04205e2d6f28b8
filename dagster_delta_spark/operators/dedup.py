"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:

- *Exact*: hash-groupBy on a content fingerprint — one shuffle keyed
  by the hash, no driver data.
- *Exact n-gram Jaccard*: shingle -> self-join on shingle -> count
  intersections.  Exact and oracle-checkable; the shingle join is the
  classic "pairs sharing a shingle" plan whose cost is bounded by
  shingle selectivity (word trigrams, not unigrams, precisely so the
  join doesn't explode).
- *MinHash+LSH*: the 100 TB path — constant-size signatures per doc,
  banding -> bucket join -> candidate pairs -> exact verification on
  candidates only.  All hash math is ``xxhash64`` JVM-side.
- *SimHash*: one 64-bit signature per doc computed with array
  lambdas inside codegen (zero shuffles to build), banded join on
  signature chunks for Hamming-neighbor candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import load
from .textops import TOKENS

# word trigrams over a precomputed `toks` column; guarded so <3-token
# docs yield an empty (typed) array instead of a bad sequence()
SHINGLES_FROM_TOKS = (
    "CASE WHEN size(toks) >= 3 THEN "
    "transform(sequence(0, size(toks) - 3), "
    "i -> concat_ws(' ', element_at(toks, i+1), "
    "element_at(toks, i+2), element_at(toks, i+3))) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keep the smallest doc_id per
    distinct normalized text.  Output: the surviving doc ids."""
    docs = load(spark, sf_dir, "documents")
    norm = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
    return (
        docs.withColumn("fp", F.expr(f"md5({norm})"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("doc_id", "n_dups")
    )


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.expr(TOKENS).alias("toks"))
        .select("doc_id", F.array_distinct(F.expr(SHINGLES_FROM_TOKS)).alias("shingles"))
        .where(F.size("shingles") > 0)
    )


def near_dup_jaccard(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4
) -> DataFrame:
    """Exact word-trigram Jaccard near-duplicate pairs.

    Plan: explode distinct shingles, self-join on the shingle to count
    intersections (the only shuffle), then Jaccard from per-doc
    shingle counts.  Deterministic: pairs with doc_a < doc_b.
    """
    sh = _shingled(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("sh"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            (F.col("n_common")
             / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")))
            .cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def minhash_signatures(
    spark: SparkSession, sf_dir: str, num_hashes: int = 64
) -> DataFrame:
    """MinHash signatures: ``sig[i] = min over shingles of
    xxhash64(i, shingle)``.  Computed with array lambdas per row —
    no shuffle, no UDF."""
    sh = _shingled(spark, sf_dir)
    sig = (
        f"transform(sequence(0, {num_hashes - 1}), "
        f"i -> array_min(transform(shingles, s -> xxhash64(i, s))))"
    )
    return sh.select("doc_id", F.expr(sig).alias("sig"))


def minhash_lsh_near_dups(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-verified.

    banding: 16 bands x 4 rows -> candidate recall ~ 1-(1-j^4)^16;
    candidates bucket-join on (band, band-hash); exact trigram Jaccard
    verifies each candidate, so output precision is exact (recall is
    probabilistic — the scale/accuracy dial).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(spark, sf_dir, num_hashes)
    band_expr = (
        f"transform(sequence(0, {bands - 1}), "
        f"b -> named_struct('band', b, 'h', "
        f"xxhash64(concat_ws(',', slice(sig, b * {rows_per_band} + 1, "
        f"{rows_per_band})))))"
    )
    buckets = sigs.select(
        "doc_id", F.explode(F.expr(band_expr)).alias("bh")
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.h") == F.col("b.h"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = _shingled(spark, sf_dir)
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    return (
        candidates.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "n_common",
            F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles"))),
        )
        .withColumn(
            "jaccard",
            (F.col("n_common")
             / (F.size(F.col("sa.shingles")) + F.size(F.col("sb.shingles"))
                - F.col("n_common"))).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: each token votes ±1 on each bit of
    its xxhash64; the signature is the sign vector.  Entirely array
    lambdas inside codegen — zero shuffles."""
    docs = load(spark, sf_dir, "documents")
    votes = (
        f"aggregate({TOKENS}, array_repeat(0L, 64), (acc, tok) -> "
        f"zip_with(acc, transform(sequence(0, 63), "
        f"j -> CASE WHEN (shiftright(xxhash64(tok), j) & 1) = 1 "
        f"THEN 1L ELSE -1L END), (x, y) -> x + y))"
    )
    sig = (
        f"aggregate(transform(sequence(0, 63), "
        f"j -> CASE WHEN element_at(vs, j + 1) > 0 "
        f"THEN shiftleft(1L, j) ELSE 0L END), 0L, (acc, x) -> acc | x)"
    )
    return (
        docs.select("doc_id", F.expr(votes).alias("vs"))
        .select("doc_id", F.expr(sig).alias("simhash"))
    )


def simhash_near_dups(
    spark: SparkSession, sf_dir: str, max_hamming: int = 8
) -> DataFrame:
    """Hamming-neighbor candidates via 16-bit banded join (pigeonhole:
    distance <= 3*bands/4 guarantees one identical band for distance
    spread across 4 bands), verified with exact popcount."""
    sigs = simhash_signatures(spark, sf_dir)
    banded = sigs.select(
        "doc_id", "simhash",
        F.explode(F.expr(
            "transform(sequence(0, 3), b -> named_struct('band', b, "
            "'chunk', shiftright(simhash, b * 16) & 65535))"
        )).alias("bc"),
    ).select("doc_id", "simhash", F.col("bc.band").alias("band"),
             F.col("bc.chunk").alias("chunk"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sig_a"),
                F.col("b.simhash").alias("sig_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("sig_a ^ sig_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
