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

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import load
from .textops import TOKENS

# Session-scoped cache of the materialized shingle stream, keyed by
# (applicationId, corpus dir, corpus fingerprint): jaccard, the whole
# MinHash family, and cluster dedup all start from the same
# tokenize->shingle->distinct pipeline, so one localCheckpoint serves
# every query in the session — the same amortization contract as the
# persisted IVF centroid index (similarity.py).  The fingerprint
# (documents.parquet size+mtime_ns) makes an in-session corpus rewrite
# MISS the cache, like load()'s mtime key; DDS_SHINGLE_CACHE=0 remains
# as a belt-and-braces opt-out (each query then re-materializes its
# own stream, the pre-r5 behavior).
_SHINGLE_CACHE: dict[tuple, DataFrame] = {}
#: MinHash signature cache, keyed (app, corpus, fingerprint, num_hashes)
_MINHASH_SIG_CACHE: dict[tuple, DataFrame] = {}
#: SimHash signature cache, keyed (app, corpus, fingerprint)
_SIMHASH_SIG_CACHE: dict[tuple, DataFrame] = {}


def _evict_stale(
    cache: dict, app_id: str, live_key: Optional[tuple] = None
) -> None:
    """Drop entries from dead sessions: a long-lived process that
    stops and restarts Spark sessions must not accumulate references
    to unreachable checkpoint RDDs.  Keys carry the owning session's
    applicationId at position 0 or 1 (the IVF assignment cache prefixes
    a kind tag), so membership — not position — decides liveness.

    ``live_key`` (shape ``(app, dir, fingerprint, ...)``) additionally
    drops same-session entries for the SAME corpus dir whose
    fingerprint was superseded by a rewrite — without this, every
    in-session corpus rewrite would pin one more dead materialized
    stream's checkpoint blocks for the session's lifetime."""
    doomed = []
    for k in cache:
        if app_id not in k:
            doomed.append(k)
        elif (
            live_key is not None
            and len(k) >= 3
            and k[0] == live_key[0]
            and k[1] == live_key[1]
            and k[2] != live_key[2]
        ):
            doomed.append(k)
    for k in doomed:
        del cache[k]




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


def _shingle_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-trigram shingles as a flat (doc_id, sh) stream.

    posexplode the tokens once, then a window ``lead`` builds each
    trigram — no per-row array materialization.  (The array-lambda
    formulation hits Catalyst projection collapse: the token-split
    expression gets inlined into every element_at and the regex
    re-runs per shingle — ~10x slower.)  One shuffle on doc_id, all
    codegen.

    Returns a MATERIALIZED (localCheckpoint) frame, cached per
    (session, corpus, fingerprint) — see ``_SHINGLE_CACHE`` above.
    """
    from .relational import corpus_fingerprint

    key = (
        spark.sparkContext.applicationId, os.path.abspath(sf_dir),
        corpus_fingerprint(sf_dir, "documents"),
    )
    caching = os.environ.get("DDS_SHINGLE_CACHE", "1") != "0"
    if caching and key in _SHINGLE_CACHE:
        return _SHINGLE_CACHE[key]
    docs = load(spark, sf_dir, "documents")
    stream = shingles_of(docs).localCheckpoint()
    if caching:
        _evict_stale(_SHINGLE_CACHE, key[0], key)
        _SHINGLE_CACHE[key] = stream
    return stream


def shingles_of(docs: DataFrame) -> DataFrame:
    """Distinct word-trigram shingles of an arbitrary documents frame
    (``doc_id``, ``text``) — the un-cached core of ``_shingle_stream``,
    reused by the streaming ingest filter on per-batch frames."""
    from pyspark.sql.window import Window

    ex = docs.select("doc_id", F.posexplode(F.expr(TOKENS)).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        ex.withColumn("t1", F.lead("tok", 1).over(w))
        .withColumn("t2", F.lead("tok", 2).over(w))
        .where(F.col("t2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "t1", "t2").alias("sh"))
        .distinct()
    )


def _shingle_sizes(stream: DataFrame) -> DataFrame:
    return stream.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))


def near_dup_jaccard(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    max_shingle_df: Optional[int] = 1000,
) -> DataFrame:
    """Exact word-trigram Jaccard near-duplicate pairs.

    Plan: explode distinct shingles, self-join on the shingle to count
    intersections (the only shuffle), then Jaccard from per-doc
    shingle counts.  Deterministic: pairs with doc_a < doc_b.

    ``max_shingle_df`` is the scale guard: a shingle appearing in d
    documents contributes d^2/2 candidate pairs, so boilerplate
    shingles (d in the millions at 100 TB) dominate cost while carrying
    no similarity signal.  Shingles above the cap are dropped from the
    *intersection* side only (denominator sizes stay exact), bounding
    pair expansion at O(sum min(df, cap)^2).  The default cap (1000)
    exceeds the whole sf0.01 corpus, so the driver's oracle comparison
    is exact; pass None for the fully exact (self-join) plan.

    Intersection plan (cap set): group the stream by shingle into
    per-shingle doc lists and explode the pairs — ONE exchange on the
    shingle (vs the self-join's two join sides + pair shuffle; measured
    4.9 s -> 3.0 s at sf0.1 steady-state).  Skew safety: a
    ``row_number`` window truncates each shingle's run at cap+1 rows
    *before* ``collect_list``, so no aggregation buffer ever exceeds
    the cap even for a shingle in billions of docs (the window sort
    spills; a truncated group has size cap+1 and is dropped by the
    df-cap filter — exactly the cap semantics).  Singleton shingles
    (df=1, the large majority) die in the same filter before pair
    expansion."""
    from pyspark.sql.window import Window

    # the shingle stream feeds multiple plan branches (sizes + the
    # intersection path); _shingle_stream returns it materialized (and
    # session-cached), so every branch reads checkpoint blocks
    ex = _shingle_stream(spark, sf_dir)
    sizes = _shingle_sizes(ex)  # full per-doc sizes, before the prefilter
    if max_shingle_df is not None:
        cap = max_shingle_df
        w = Window.partitionBy("sh").orderBy("doc_id")
        grp = (
            ex.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= cap + 1)
            .groupBy("sh")
            .agg(F.collect_list("doc_id").alias("ds"))
            .where((F.size("ds") >= 2) & (F.size("ds") <= cap))
        )
        pairs = (
            grp.select("ds", F.explode("ds").alias("doc_a"))
            .select("doc_a", F.explode("ds").alias("doc_b"))
            .where(F.col("doc_a") < F.col("doc_b"))
        )
        inter = pairs.groupBy("doc_a", "doc_b").agg(
            F.count(F.lit(1)).alias("n_common")
        )
    else:
        # exact-any-scale fallback: self-join keeps per-row state flat
        # (no doc lists) at the price of two join sides on the shingle
        a = ex.alias("a")
        b = ex.alias("b")
        inter = (
            a.join(b, (F.col("a.sh") == F.col("b.sh"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
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
    spark: SparkSession, sf_dir: str, num_hashes: int = 64,
    stream: Optional[DataFrame] = None,
) -> DataFrame:
    """MinHash signatures: ``sig[i] = min over shingles of
    xxhash64(i, shingle)``.

    Shape: explode shingles once, hash with ``num_hashes`` literal
    seeds as independent ``min`` aggregates in a single groupBy — all
    inside whole-stage codegen with map-side partial aggregation, one
    shuffle on doc_id.  (A nested array-lambda formulation is ~100x
    slower: higher-order functions run interpreted and re-evaluate the
    hash per seed.)

    Session-cached per (app, corpus, fingerprint, num_hashes) like the
    shingle stream it derives from (constant-size per doc: 64 longs —
    far smaller than the stream itself); ``DDS_SHINGLE_CACHE=0``
    disables both caches.  ``stream`` lets a caller that already built
    the shingle stream share it on the cache-off path (cache-on, the
    stream cache makes the second call free anyway)."""
    from .relational import corpus_fingerprint

    key = (
        spark.sparkContext.applicationId, os.path.abspath(sf_dir),
        corpus_fingerprint(sf_dir, "documents"), num_hashes,
    )
    caching = os.environ.get("DDS_SHINGLE_CACHE", "1") != "0"
    if caching and key in _MINHASH_SIG_CACHE:
        return _MINHASH_SIG_CACHE[key]
    if stream is None:
        stream = _shingle_stream(spark, sf_dir)
    sigs = _signatures_from_stream(stream, num_hashes)
    if caching:
        sigs = sigs.localCheckpoint()
        _evict_stale(_MINHASH_SIG_CACHE, key[0], key)
        _MINHASH_SIG_CACHE[key] = sigs
    return sigs


def _signatures_from_stream(stream: DataFrame, num_hashes: int) -> DataFrame:
    # hash the (variable-length) shingle string once; the per-seed
    # hashes then run over a fixed 8-byte long — ~20x cheaper than
    # re-hashing the string per seed
    ex = stream.select("doc_id", F.xxhash64("sh").alias("h0"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("h0"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    g = ex.groupBy("doc_id").agg(*aggs)
    return g.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


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
    # the shingle stream arrives materialized (and session-cached) —
    # signatures and exact verification both reuse its checkpoint
    # blocks instead of re-tokenizing the corpus three times
    stream = _shingle_stream(spark, sf_dir)
    sigs = minhash_signatures(spark, sf_dir, num_hashes, stream=stream)
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
    # exact verification restricted to candidate docs: semi-filter the
    # shingle stream to candidate ids, count common shingles per
    # candidate pair.  No broadcast hints — candidate cardinality grows
    # with the corpus (unlike the fixed-size query/centroid sets in
    # similarity.py), so AQE picks broadcast only while the sets
    # actually fit
    sizes = _shingle_sizes(stream)
    docs_a = candidates.select(F.col("doc_a").alias("doc_id")).distinct()
    docs_b = candidates.select(F.col("doc_b").alias("doc_id")).distinct()
    exa = stream.join(docs_a, "doc_id").select(
        F.col("doc_id").alias("doc_a"), "sh"
    )
    exb = stream.join(docs_b, "doc_id").select(
        F.col("doc_id").alias("doc_b"), "sh"
    )
    inter = (
        exa.join(exb, "sh")
        .join(candidates, ["doc_a", "doc_b"])
        .groupBy("doc_a", "doc_b")
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
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: each token votes ±1 on each bit of
    its xxhash64; the signature is the sign vector.

    Shape: explode tokens, hash each once, then 64 codegen'd
    ``sum((h >> j) & 1)`` aggregates in one groupBy (bit j is set iff
    set-bit count exceeds half the tokens).  One shuffle on doc_id
    with map-side combine.  Session-cached per (app, corpus,
    fingerprint) — one long per doc; ``DDS_SHINGLE_CACHE=0``
    disables."""
    from .relational import corpus_fingerprint

    key = (
        spark.sparkContext.applicationId, os.path.abspath(sf_dir),
        corpus_fingerprint(sf_dir, "documents"),
    )
    caching = os.environ.get("DDS_SHINGLE_CACHE", "1") != "0"
    if caching and key in _SIMHASH_SIG_CACHE:
        return _SIMHASH_SIG_CACHE[key]
    docs = load(spark, sf_dir, "documents")
    ex = (
        docs.select("doc_id", F.explode(F.expr(TOKENS)).alias("tok"))
        .select("doc_id", F.xxhash64("tok").alias("h"))
    )
    # pack 4 x 16-bit bit-counters per 64-bit sum -> 16 aggregates
    # instead of 64 (~6x faster agg). 16-bit lanes cap documents at
    # 65535 tokens; chunk longer documents upstream.
    aggs = []
    for gidx in range(16):
        lanes = " + ".join(
            f"(shiftleft(shiftright(h, {4 * gidx + k}) & 1, {16 * k}))"
            for k in range(4)
        )
        aggs.append(F.sum(F.expr(lanes)).alias(f"p{gidx}"))
    aggs.append(F.count(F.lit(1)).alias("n_tok"))
    g = ex.groupBy("doc_id").agg(*aggs)
    sig = " | ".join(
        f"(CASE WHEN 2 * (shiftright(p{gidx}, {16 * k}) & 65535) > n_tok "
        f"THEN shiftleft(1L, {4 * gidx + k}) ELSE 0L END)"
        for gidx in range(16)
        for k in range(4)
    )
    sigs = g.select("doc_id", F.expr(sig).alias("simhash"))
    if caching:
        sigs = sigs.localCheckpoint()
        _evict_stale(_SIMHASH_SIG_CACHE, key[0], key)
        _SIMHASH_SIG_CACHE[key] = sigs
    return sigs


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


def minhash_buckets(
    spark: SparkSession, sf_dir: str, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """(doc_id, band, h) LSH bucket memberships."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(spark, sf_dir, num_hashes)
    band_expr = (
        f"transform(sequence(0, {bands - 1}), "
        f"b -> named_struct('band', b, 'h', "
        f"xxhash64(concat_ws(',', slice(sig, b * {rows_per_band} + 1, "
        f"{rows_per_band})))))"
    )
    return sigs.select(
        "doc_id", F.explode(F.expr(band_expr)).alias("bh")
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))


def minhash_cluster_keep(
    spark: SparkSession, sf_dir: str,
    num_hashes: int = 64, bands: int = 16, iterations: int = 3,
) -> DataFrame:
    """Cluster-level dedup without pairwise blowup.

    Emitting all near-duplicate *pairs* is quadratic in duplicate-set
    size (a 20-copy document contributes 190 pairs); production dedup
    wants one surviving representative per cluster.  This runs
    min-label propagation over the bipartite doc<->LSH-bucket graph:
    each round, a bucket takes its members' min label and docs take
    their buckets' min — connected components converge in a few
    rounds (exact-duplicate clusters in one).  Cost per round is
    O(docs x bands), independent of duplicate-set sizes.

    Returns (doc_id, cluster_id, keep).
    """
    # materialize bucket memberships once — the iteration would
    # otherwise recompute the whole signature pipeline per round
    buckets = minhash_buckets(spark, sf_dir, num_hashes, bands).localCheckpoint()
    labels = buckets.select("doc_id").distinct().withColumn(
        "lbl", F.col("doc_id")
    )
    for _ in range(iterations):
        with_lbl = buckets.join(labels, "doc_id")
        bucket_min = (
            with_lbl.groupBy("band", "h").agg(F.min("lbl").alias("bmin"))
        )
        labels = (
            buckets.join(bucket_min, ["band", "h"])
            .groupBy("doc_id")
            .agg(F.min("bmin").alias("lbl"))
            # cut lineage each round: the plan otherwise deepens by
            # 2 joins + 2 aggs per iteration and analysis/codegen cost
            # grows superlinearly past a few rounds (lazy: materializes
            # with the next round's job, not as an extra action)
            .localCheckpoint(eager=False)
        )
    return labels.select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        (F.col("doc_id") == F.col("lbl")).alias("keep"),
    )
