"""Training-data curation operators beyond dedup: decontamination,
PII scrubbing, stratified quota sampling, embedding quantization.

These cover the remaining steps a large-scale pretraining pipeline
runs between raw corpus and training shards (the reference defers all
user compute — SURVEY §2.6-2.8; this module is additive engine
surface, like ``dedup.py``/``textops.py``).

Scale design notes:
- ``decontaminate``: the benchmark/eval set is small by construction
  (thousands of documents vs billions) — its shingle set is
  broadcast; the corpus-side scan stays embarrassingly parallel with
  one aggregate shuffle on doc_id.
- ``scrub_pii``: pure ``regexp_replace`` chains inside whole-stage
  codegen; no shuffle at all (map-only), which is exactly what a
  100 TB redaction pass must be.
- ``stratified_sample``: per-stratum quota by deterministic content
  hash — one window shuffle on the (bounded-cardinality) stratum key,
  not on doc count; reproducible across runs/engines/retries.
- ``quantize_embeddings``: per-dimension affine int8 quantization;
  dimension stats are a posexplode + (dim) aggregate (tiny result,
  broadcast back), the quantization itself is map-only array lambdas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import load
from .textops import TOKENS

# word 8-grams are the standard decontamination unit (long enough that
# chance collisions are negligible, short enough to catch paraphrased
# spans embedded in larger documents)
_DECON_NGRAM = 8


from .textops import word_ngrams as _word_ngrams  # noqa: E402  (shared)


def decontaminate(
    spark: SparkSession,
    sf_dir: str,
    eval_set: DataFrame = None,
    ngram: int = _DECON_NGRAM,
    max_overlap: int = 0,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing more
    than ``max_overlap`` distinct word ``ngram``-grams with an eval
    set.  Returns (doc_id, n_contaminated_ngrams, contaminated) for
    every document — the pipeline filters on ``contaminated``.

    ``eval_set`` defaults to a deterministic stand-in (documents with
    ``doc_id % 17 == 3`` play the "benchmark" — engine-agnostic, so
    the DuckDB oracle selects the identical set), making the operator
    runnable and oracle-checkable on the synthetic corpus; production
    passes the real eval-set DataFrame (doc_id, text).

    At 100 TB the eval shingle set stays thousands-of-rows — the join
    is a broadcast semi-probe, the corpus scan map-parallel, and the
    only shuffle is the per-doc overlap count."""
    docs = load(spark, sf_dir, "documents")
    if eval_set is None:
        eval_set = docs.where(F.col("doc_id") % 17 == 3)
    # NO corpus-wide distinct: the raw gram stream probes the broadcast
    # eval set first (map-parallel, typically discarding almost every
    # row), and countDistinct de-dupes only the tiny surviving set in
    # the per-doc count — the one shuffle the docstring promises.  A
    # .distinct() before the join shuffled one ~8-token string per
    # corpus token, the dominant cost at scale.
    eval_grams = (
        _word_ngrams(eval_set, ngram).select("gram").distinct()
    )
    # corpus side only: the tokenizer + 8-gram transform + broadcast
    # probe is an interpreted map pipeline over the raw scan — widen
    # it off the single-row-group bench inputs (guide §2.5, the r16
    # per-operator scan-widening scope; the eval side is tiny and the
    # final doc_id projection is a cheap codegen'd scan, both stay raw)
    from .relational import widen_for_compute

    overlaps = (
        _word_ngrams(widen_for_compute(docs), ngram)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_contaminated_ngrams"))
    )
    return (
        docs.select("doc_id")
        .join(overlaps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_ngrams", F.lit(0))
            .alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > max_overlap)
            .alias("contaminated"),
        )
    )


def bloom_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    eval_set: DataFrame = None,
    ngram: int = _DECON_NGRAM,
    max_overlap: int = 0,
    bits_per_gram: int = 32,
) -> DataFrame:
    """``decontaminate`` for eval sets too large to broadcast as gram
    strings — IDENTICAL output (the Bloom filter is a prefilter; an
    exact verification join removes its false positives, so the DuckDB
    oracle is the same plain overlap count).

    The broadcast-semi-probe in ``decontaminate`` assumes the eval
    gram set fits in a broadcast of *strings* (~50+ bytes/gram with
    row overhead).  A full held-out suite at production scale can
    reach billions of grams; this variant compresses the prefilter
    side to a single-hash Bloom bitmap — ``bits_per_gram`` bits per
    distinct eval gram packed into 64-bit words, i.e. ~4 bytes/gram at
    the default: an order of magnitude smaller than the strings, which
    extends the broadcast regime correspondingly (past even that, the
    word-keyed bitmap join degrades gracefully to a shuffle whose
    build side is the compact bitmap, never the gram strings).

    Plan: (1) one aggregation packs eval gram hash positions into
    ``(word, bits)`` via ``bit_or`` — m is rounded up to a power of
    two so the position is ``xxhash64 & (m-1)``, no division; (2) the
    corpus gram stream joins the broadcast bitmap on ``word`` and
    keeps grams whose bit is set — with k=1 hash and 32 bits/gram the
    false-positive rate is ~1-exp(-1/32) ≈ 3%, so ~97% of clean
    corpus grams die map-side without touching a shuffle; (3) the
    small survivor stream exact-joins the eval grams (removing the
    ~3% FPs) and the per-doc ``countDistinct`` finishes as in
    ``decontaminate``.  k=1 is deliberate: each extra hash is another
    probe join over the corpus stream, and the verify pass makes
    precision exact regardless — the FP rate only tunes how much
    survives to the verify join.
    """
    if bits_per_gram < 1:
        raise ValueError(f"bits_per_gram={bits_per_gram} must be >= 1")
    docs = load(spark, sf_dir, "documents")
    if eval_set is None:
        eval_set = docs.where(F.col("doc_id") % 17 == 3)
    eval_grams = _word_ngrams(eval_set, ngram).select("gram").distinct()
    eval_grams = eval_grams.localCheckpoint()  # sized AND probed below
    n_eval = eval_grams.count()
    m = 1 << max(10, (max(1, n_eval * bits_per_gram) - 1).bit_length())
    mask = m - 1
    pos = f"(xxhash64(gram) & {mask}L)"
    word_bit = [
        F.expr(f"shiftright({pos}, 6)").alias("word"),
        F.expr(f"shiftleft(1L, CAST({pos} & 63L AS INT))").alias("bit"),
    ]
    bloom = (
        eval_grams.select(*word_bit)
        .groupBy("word").agg(F.expr("bit_or(bit)").alias("bits"))
    )
    # same corpus-side widening rationale as ``decontaminate`` above:
    # tokenize + gram transform + hash + bitmap probe all run in the
    # scan's map stage, which a single-row-group input pins to 1 task
    from .relational import widen_for_compute

    survivors = (
        _word_ngrams(widen_for_compute(docs), ngram)
        .select("doc_id", "gram", *word_bit)
        .join(F.broadcast(bloom), "word")
        .where(F.expr("(bits & bit) != 0"))
        .select("doc_id", "gram")
    )
    overlaps = (
        survivors.join(eval_grams, "gram")  # exact verify: FPs die here
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_contaminated_ngrams"))
    )
    return (
        docs.select("doc_id")
        .join(overlaps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_ngrams", F.lit(0))
            .alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > max_overlap)
            .alias("contaminated"),
        )
    )


def near_dup_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    eval_set: DataFrame = None,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    docs: DataFrame = None,
    portable_hash: bool = False,
) -> DataFrame:
    """FUZZY benchmark decontamination: flag corpus documents whose
    word-trigram Jaccard similarity to ANY eval document reaches
    ``threshold`` — the near-duplicate complement of ``decontaminate``
    (exact n-gram overlap misses paraphrased eval leakage: reorder a
    clause and every 8-gram changes, but most trigram shingles
    survive).  Returns one row per flagged corpus document:
    ``(doc_id, matched_eval_id, jaccard)`` with the best-matching eval
    document (ties break on the smaller eval id).

    Plan — the corpus side is touched exactly the way the batch LSH
    dedup family touches it, via the SHARED primitives (shingle
    stream, ``_signatures_from_stream``, ``band_buckets`` — this
    operator can never band differently from ``minhash_lsh_near_dups``
    or the streaming ingest filter):

    1. MinHash signatures for both sides; the eval side is thousands
       of documents by construction, so its banded bucket table
       broadcasts.
    2. Corpus bands hash-join the broadcast eval buckets — candidate
       (doc, eval) pairs are bucket collisions only, never a cross
       product; the corpus cost is the linear signature scan.
    3. Exact verification: candidate-restricted shingle intersection
       against the (broadcast) eval shingle stream re-derives TRUE
       Jaccard, so every emitted pair is exactly-verified — LSH only
       bounds recall (a >= threshold pair missing every band is
       unreported, the standard LSH tradeoff; at the 64/16 defaults a
       0.7-Jaccard paraphrase collides in some band with p ~ 0.98).

    ``eval_set`` defaults to the same deterministic stand-in as
    ``decontaminate`` (``doc_id % 17 == 3``), whose members flag
    themselves at Jaccard 1.0.  ``docs`` overrides the corpus frame
    (guard fixtures plant paraphrases through it); overriding either
    side bypasses the session shingle/signature caches.

    At 100 TB: eval buckets and eval shingles stay broadcast-size;
    corpus-side work is one linear signature pass plus a verify join
    restricted to bucket-colliding docs.  No stage is quadratic in the
    corpus.

    ``portable_hash=True`` (r10) routes every hash through the shared
    md5 family (``dedup.portable_hash_family``) so the DuckDB oracle
    recomputes candidates AND verification end-to-end — same dial as
    the batch LSH family; production keeps xxhash64."""
    from pyspark.sql.window import Window

    from .dedup import (
        _shingle_sizes,
        _shingle_stream,
        _signatures_from_stream,
        band_buckets,
        portable_hash_family,
        shingles_of,
    )

    base_hash = seed_hash = None
    hash_sql = "xxhash64({x})"
    if portable_hash:
        base_hash, seed_hash, hash_sql = portable_hash_family()

    def sigs_of(stream):
        return _signatures_from_stream(
            stream, num_hashes, base_hash=base_hash, seed_hash=seed_hash)

    default_corpus = docs is None
    if default_corpus:
        from .dedup import minhash_signatures

        docs = load(spark, sf_dir, "documents")
        corpus_sh = _shingle_stream(spark, sf_dir)  # session-cached
        # the corpus signatures are the LSH family's session-cached
        # signature frame — minhash_signatures computes the IDENTICAL
        # function of the IDENTICAL (cached) shingle stream under the
        # same hash family, so reusing it is bit-for-bit the old
        # sigs_of(corpus_sh) while skipping the 64-seed explode+min
        # re-derivation per call (r16; same convention as the LSH
        # bucket index the batch dedup family rides)
        corpus_sigs = minhash_signatures(
            spark, sf_dir, num_hashes, portable_hash=portable_hash)
    else:
        corpus_sh = shingles_of(docs)
        corpus_sigs = sigs_of(corpus_sh)
    if eval_set is None:
        # the default eval stand-in is a corpus subset: filter its
        # shingles out of the (already materialized) corpus stream
        # instead of re-shingling the eval docs
        eval_sh = corpus_sh.where(F.col("doc_id") % 17 == 3)
    else:
        eval_sh = shingles_of(eval_set)
    # small by construction; feeds banding AND the verify join
    eval_sh = eval_sh.localCheckpoint()
    if eval_set is None:
        # a MinHash signature is a per-doc aggregate of that doc's
        # shingles only, so restricting the signature frame by doc_id
        # IS the signature frame of the restricted shingle stream —
        # no second 64-seed pass over the eval subset
        eval_sigs = corpus_sigs.where(F.col("doc_id") % 17 == 3)
    else:
        eval_sigs = sigs_of(eval_sh)
    cand = (
        band_buckets(corpus_sigs, num_hashes, bands,
                     hash_sql=hash_sql)
        .join(
            F.broadcast(
                band_buckets(eval_sigs, num_hashes, bands,
                             hash_sql=hash_sql)
                .withColumnRenamed("doc_id", "eval_id")
            ),
            ["band", "h"],
        )
        .select("doc_id", "eval_id")
        .distinct()
    )
    inter = (
        corpus_sh.join(cand, "doc_id")
        .join(
            F.broadcast(
                eval_sh.select(F.col("doc_id").alias("eval_id"), "sh")
            ),
            ["eval_id", "sh"],
        )
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    esizes = eval_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_eval_sh")
    ).withColumnRenamed("doc_id", "eval_id")
    best = Window.partitionBy("doc_id").orderBy(
        F.desc("jaccard"), F.asc("eval_id")
    )
    return (
        inter.join(_shingle_sizes(corpus_sh), "doc_id")
        .join(F.broadcast(esizes), "eval_id")
        .withColumn(
            "jaccard",
            (F.col("n_common")
             / (F.col("n_sh") + F.col("n_eval_sh") - F.col("n_common")))
            .cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .withColumn("rnk", F.row_number().over(best))
        .where(F.col("rnk") == 1)
        .select(
            "doc_id",
            F.col("eval_id").alias("matched_eval_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


# deliberately simple, RE2-compatible patterns (both Spark's Java regex
# and DuckDB's RE2 agree on them) so the redaction is oracle-checkable;
# production swaps in its compliance-approved pattern pack
_PII_PATTERNS = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"(\+?[0-9]{1,3}[-. ])?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
     "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
]


def scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: replace emails/phones/IPv4s/SSNs with typed
    placeholder tokens and count the redactions per document.

    Map-only (no shuffle): a chain of ``regexp_replace`` plus
    count-by-length-delta per pattern, all inside whole-stage codegen —
    the shape a full-corpus redaction sweep needs at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    scrubbed = F.col("text")
    counts = []
    for name, pat, token in _PII_PATTERNS:
        # each count runs on the RUNNING text (as scrubbed by earlier
        # patterns), immediately before its own replacement — so every
        # count sees exactly the input its replacement consumes, and
        # text swallowed by an earlier pattern class is not re-counted
        counts.append(
            (F.size(F.split(scrubbed, pat, -1)) - 1).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return docs.select(
        "doc_id", *counts, scrubbed.alias("clean_text")
    )


def stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    per_stratum: int = 20,
) -> DataFrame:
    """Quota sampling: up to ``per_stratum`` documents per
    (source, lang) stratum, chosen by content-hash order.

    Deterministic (hash order, not rand()) so the sample is
    reproducible across runs, engines, and retries — and the window
    shuffle keys on the stratum, whose cardinality is bounded by
    sources x languages, not by corpus size.  A skewed stratum still
    funnels through one task; for quotas over very hot strata,
    pre-filter with a hash-threshold pass (same trick as
    ``deterministic_sample``) before ranking."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        F.md5("text"), F.col("doc_id")
    )
    return (
        docs.withColumn("pick_rank", F.row_number().over(w))
        .where(F.col("pick_rank") <= per_stratum)
        .select("doc_id", "source", "lang",
                F.col("pick_rank").cast("int").alias("pick_rank"))
    )


def quantized_embeddings_with_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Int8-quantized embeddings WITH the per-dimension affine params
    still attached: (vec_id, embedding, qembedding array<int>,
    stats array<struct<dim,lo,hi>>) — the shared core of
    ``quantize_embeddings`` (audit projection) and
    ``similarity.ivf_quantized_topk`` (dequantizing candidate scorer).
    ``stats`` is a 1-row broadcast cross join, so downstream column
    pruning keeps the table itself 4x smaller than float32."""
    emb = load(spark, sf_dir, "embeddings")
    dims = (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        # aggregate in DOUBLE: float32 lo/hi would make (hi - lo) round
        # to float before the double division, a last-ulp divergence
        # from any double-precision consumer (and the DuckDB oracle)
        .agg(F.min(F.col("v").cast("double")).alias("lo"),
             F.max(F.col("v").cast("double")).alias("hi"))
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "lo", "hi")))
            .alias("stats")
        )
    )
    # per-dim affine params ride in as a broadcast 1-row cross join
    q = (
        "transform(embedding, (v, i) -> "
        "CAST(round((CAST(v AS DOUBLE) - stats[i].lo) / "
        "(CASE WHEN stats[i].hi > stats[i].lo "
        "THEN (stats[i].hi - stats[i].lo) / 255.0D ELSE 1.0D END)) - 128 "
        "AS INT))"
    )
    return (
        emb.crossJoin(F.broadcast(dims))
        .withColumn("qembedding", F.expr(q))
    )


def quantize_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Affine int8 quantization of the embedding column with
    per-dimension scales — the memory/bandwidth lever for ANN over a
    100 TB vector corpus (4x smaller than float32, dot products stay
    SIMD-friendly).

    Plan: posexplode -> per-dim (min, max) aggregate (a DIMS-row
    result, broadcast back) -> map-only array lambda quantizes
    ``q = round((v - min) / scale) - 128`` into [-128, 127].
    Returns (vec_id, qembedding array<int>, max_abs_err double) so the
    caller can audit reconstruction error per vector."""
    quantized = quantized_embeddings_with_stats(spark, sf_dir)
    # max reconstruction error via a second zip (needs the dim index:
    # re-zip with positions)
    err = (
        "array_max(zip_with(embedding, sequence(0, size(embedding) - 1), "
        "(v, i) -> abs(CAST(v AS DOUBLE) - ("
        "(CAST(element_at(qembedding, i + 1) AS DOUBLE) + 128) * "
        "(CASE WHEN stats[i].hi > stats[i].lo "
        "THEN (stats[i].hi - stats[i].lo) / 255.0D ELSE 1.0D END) "
        "+ stats[i].lo))))"
    )
    return quantized.select(
        "vec_id", "qembedding",
        F.expr(err).cast("double").alias("max_abs_err"),
    )


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    token windows of ``chunk_tokens`` advancing by ``stride`` — the
    passage/context-window shaping step between curated corpus and
    training shards (and the retrieval-passage cut for embedding
    indexes).

    Map-only: tokenization, window arithmetic and slicing are all
    array expressions on the document's own row, then one posexplode —
    no shuffle at all, so the pass scales with input splits exactly
    like a scan.  A document always yields >= 1 chunk (the final one
    may be short); empty-token documents yield none."""
    if chunk_tokens < 1 or not 0 < stride <= chunk_tokens:
        # stride=0 would divide by zero inside an ANSI CAST (opaque
        # overflow error); stride > chunk_tokens silently drops the
        # tokens between windows
        raise ValueError(
            f"require chunk_tokens >= 1 and 0 < stride <= chunk_tokens "
            f"(got chunk_tokens={chunk_tokens}, stride={stride})"
        )
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.expr(TOKENS).alias("t"))
        .withColumn("n", F.size("t"))
        .where(F.col("n") > 0)
    )
    n_chunks = (
        f"1 + CAST(greatest(ceil((n - {chunk_tokens}) / "
        f"CAST({stride} AS DOUBLE)), 0) AS INT)"
    )
    chunks = (
        f"transform(sequence(0, {n_chunks} - 1), i -> "
        f"array_join(slice(t, i * {stride} + 1, {chunk_tokens}), ' '))"
    )
    return (
        toks.select(
            "doc_id", "n",
            F.posexplode(F.expr(chunks)).alias("chunk_id", "chunk_text"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            "chunk_text",
            F.least(
                F.lit(chunk_tokens),
                F.col("n") - F.col("chunk_id") * stride,
            ).cast("long").alias("n_chunk_tokens"),
        )
    )


def assign_splits(
    spark: SparkSession,
    sf_dir: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash: the
    first 4 hex digits of md5(text) bucket each document into
    [0, 65536), and fixed thresholds carve the buckets into splits.

    Keying on CONTENT (not doc_id or rand()) gives the two properties
    a training split needs: reproducible across runs, engines and
    retries, and leakage-proof against exact duplicates — byte-equal
    documents hash to the same bucket, so a text can never straddle
    train and test.  (Near-duplicate leakage is the dedup family's
    job, upstream of this pass.)  Map-only, no shuffle."""
    train_hi = 65536 * train_pct // 100
    val_hi = 65536 * (train_pct + val_pct) // 100
    docs = load(spark, sf_dir, "documents")
    bucket = F.expr("conv(substring(md5(text), 1, 4), 16, 10)").cast("int")
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < train_hi, "train")
        .when(bucket < val_hi, "val")
        .otherwise("test")
        .alias("split"),
    )


def leakage_safe_splits(
    spark: SparkSession,
    sf_dir: str,
    train_pct: int = 80,
    val_pct: int = 10,
    num_hashes: int = 64,
    bands: int = 16,
    portable_hash: bool = False,
) -> DataFrame:
    """Train/val/test assignment at the NEAR-DUP-CLUSTER level:
    ``assign_splits`` is leakage-proof against exact duplicates
    (content-hash bucketing) but a near-duplicate pair — same article,
    one typo apart — can still straddle train and test and leak
    evaluation data into training.  Here every document takes the
    split of its LSH near-dup cluster (``minhash_cluster_keep`` label
    propagation), keyed by the md5 of the cluster REPRESENTATIVE's
    normalized text with the same 4-hex-digit bucket thresholds as
    ``assign_splits`` — so whole duplicate clusters move between
    splits as a unit and near-dup leakage is structurally impossible.

    Output: ``(doc_id, cluster_id, bucket, split)``.  ORACLE-BACKED
    since late r10 via ``portable_hash=True`` (the md5 dial through
    ``minhash_cluster_keep`` — its recursive-CTE component oracle plus
    the already-portable md5 representative fingerprint and conv
    bucket thresholds make the whole assignment SQL-replayable); the
    production path keeps xxhash64, and the registry entry still
    plants a near-duplicate against it and asserts it lands in its
    original's cluster AND split.

    Scale shape: clustering is the linear label-propagation pass
    (O(docs x bands) per round); the split itself adds one tiny
    representative join — no pair expansion anywhere."""
    from .dedup import minhash_cluster_keep
    from .textops import NORM_TEXT

    clusters = minhash_cluster_keep(spark, sf_dir, num_hashes, bands,
                                    portable_hash=portable_hash)
    docs = load(spark, sf_dir, "documents")
    reps = (
        clusters.where(F.col("keep"))
        .join(docs, "doc_id")
        .select("cluster_id", F.expr(f"md5({NORM_TEXT})").alias("rep_fp"))
    )
    train_hi = 65536 * train_pct // 100
    val_hi = 65536 * (train_pct + val_pct) // 100
    bucket = F.expr("conv(substring(rep_fp, 1, 4), 16, 10)").cast("int")
    return (
        clusters.join(reps, "cluster_id")
        .select(
            "doc_id", "cluster_id",
            bucket.alias("bucket"),
            F.when(bucket < train_hi, "train")
            .when(bucket < val_hi, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    budget: int = 256,
    num_shards: int = 16,
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget
    training sequences (bins) by running a token cumsum in a
    deterministic content-hash order and cutting a new bin every
    ``budget`` tokens.  Bin identity is (shard, seq_id).

    Exact first-fit packing is inherently sequential, so the corpus is
    first sharded by a content-hash byte (``num_shards`` ways) and
    each shard packs independently — the window's partition key is the
    shard, giving ``num_shards``-way parallelism with bounded state;
    at cluster scale ``num_shards`` rises with executor count and the
    only cost is one boundary bin per shard left partially filled.
    Hash-ordering is reproducible across runs/engines/retries (no
    rand(), no Spark-specific hash)."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.expr(f"size({TOKENS})").cast("long").alias("n_tokens"),
    ).withColumn(
        # 4 hex chars (0-65535): a single byte capped parallelism at
        # 256 shards and skewed sizes by up to 50% for non-divisor
        # num_shards (r6 review) — same key width as corpus_shuffle
        "shard",
        (F.expr("conv(substring(fp, 5, 4), 16, 10)").cast("int")
         % num_shards),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("fp", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        cum.alias("cum_tokens"),
        F.floor((cum - F.col("n_tokens")) / F.lit(budget))
        .cast("int").alias("seq_id"),
    )


def corpus_shuffle(
    spark: SparkSession, sf_dir: str, n_shards: int = 16, seed: int = 42
) -> DataFrame:
    """Deterministic global training-order shuffle + sharding: each
    document gets a reproducible pseudo-random sort key
    ``md5(seed:doc_id)``, a shard from the key's hex prefix, and a
    dense intra-shard position — the "shuffle the corpus before
    training" pass.  Keying on a hash instead of ``rand()`` makes the
    epoch order stable across runs, engines and task retries (a retry
    with rand() silently reorders the epoch), and changing ``seed``
    yields an independent permutation per epoch.

    Plan: map-only key + shard assignment, then ONE shuffle on shard
    with a per-shard row_number — each of the ``n_shards`` slices
    sorts in parallel and nothing global is ordered.  At 100 TB raise
    ``n_shards`` so a slice fits an executor's sort budget (the
    loader reads shards in shard order, positions in pos order; the
    concatenation IS the epoch)."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col("doc_id").cast("string"))).alias("k"),
    ).withColumn(
        "shard",
        (F.expr("conv(substring(k, 1, 4), 16, 10)").cast("int")
         % n_shards).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id", "shard",
        F.row_number().over(w).cast("int").alias("pos"),
    )


def temperature_mixture_sample(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.5,
    sample_frac: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual-sampling
    alpha rule, Conneau & Lample 2019): draw a ``sample_frac`` corpus
    subsample whose expected per-source share is
    ``n_s^alpha / sum_t n_t^alpha`` — ``alpha=1`` keeps natural
    proportions, ``alpha=0`` equalizes sources, in between upsamples
    the tail.  The per-source acceptance rate is
    ``min(1, sample_frac * N * share_s / n_s)`` rounded to 6 decimals
    (rounding BEFORE the accept decision keeps the Spark and DuckDB
    twins bit-agreed); acceptance is a deterministic per-doc Bernoulli
    — ``md5(seed:doc_id)``'s first 8 hex digits as a uniform u32 —
    so the sample is reproducible across runs, engines and retries,
    and re-keyed per ``seed``.

    Output: every doc with ``(doc_id, source, accept_rate, sampled)``
    — the full assignment, not just survivors, so capped sources are
    AUDITABLE (a source whose target exceeds its population shows
    ``accept_rate = 1.0`` and still under-delivers; no silent caps).

    Scale: one tiny per-source aggregate broadcast back onto a
    map-only accept pass — no shuffle of the corpus itself."""
    if not 0 <= alpha <= 1:
        raise ValueError(f"alpha={alpha} out of [0, 1]")
    if not 0 < sample_frac <= 1:
        raise ValueError(f"sample_frac={sample_frac} out of (0, 1]")
    docs = load(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    totals = stats.agg(
        F.sum("n_s").alias("n_total"),
        F.sum(F.pow(F.col("n_s").cast("double"), F.lit(alpha)))
        .alias("w_total"),
    )
    rates = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "source",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(sample_frac) * F.col("n_total")
                    * F.pow(F.col("n_s").cast("double"), F.lit(alpha))
                    / F.col("w_total") / F.col("n_s"),
                ),
                6,
            ).alias("accept_rate"),
        )
    )
    u = (
        F.expr(
            f"conv(substring(md5(concat('{seed}:', CAST(doc_id AS STRING))),"
            f" 1, 8), 16, 10)"
        ).cast("bigint").cast("double") / F.lit(4294967296.0)
    )
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .select(
            "doc_id", "source", "accept_rate",
            (u < F.col("accept_rate")).alias("sampled"),
        )
    )


def cross_source_contamination(
    spark: SparkSession, sf_dir: str, prefix_words: int = 8
) -> DataFrame:
    """Inter-subcorpus leakage: source pairs sharing a document
    fingerprint, with the shared-fingerprint count
    (``n_shared_fingerprints`` counts DISTINCT fingerprints present in
    both sources — many docs collapsing to one fingerprint count
    once).  Complements
    ``decontaminate`` (corpus vs eval set) by auditing the corpus
    against ITSELF — the classic pre-training failure where one crawl
    snapshot ships under two source labels and a train/eval split by
    source silently leaks.

    The fingerprint is the md5 of the first ``prefix_words``
    normalized tokens (prefix fingerprinting — catches shared intros /
    boilerplate / re-hosted articles whose tails diverge, the common
    real-world leak shape); ``prefix_words=None`` tightens it to the
    full normalized text (exact-copy audit).

    Plan: fingerprint once (map-only), drop to distinct (fp, source),
    self-join on the fingerprint with ``source_a < source_b``, count
    per pair.  The join key is the content hash, so a fingerprint
    spanning s sources emits s^2/2 pair rows — bounded by the SOURCE
    label count squared (thousands at worst), not the document count,
    so the expansion stays flat while the corpus grows.  Output is at
    most |sources|^2/2 rows."""
    from .textops import NORM_TEXT

    docs = load(spark, sf_dir, "documents")
    if prefix_words is None:
        fp = f"md5({NORM_TEXT})"
    else:
        fp = (
            f"md5(array_join(slice({TOKENS}, 1, {prefix_words}), ' '))"
        )
    # materialize once: both self-join sides read the checkpointed
    # (fp, source) pairs instead of scanning + fingerprinting the
    # corpus twice (the dominant cost at scale)
    fps = (
        docs.select(F.expr(fp).alias("fp"), "source")
        .distinct()
        # lazy: materializes with the first action, not at plan build
        .localCheckpoint(eager=False)
    )
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"),
                 F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_fingerprints"))
    )


def dsir_importance_sample(
    spark: SparkSession,
    sf_dir: str,
    target_lang: str = "en",
    n_buckets: int = 256,
    top_k: int = 100,
    seed: int = 42,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): pick the ``top_k`` corpus documents that look most like a
    target distribution, using hashed-n-gram bag-of-words models.

    The target here is the corpus slice with ``lang = target_lang``
    (the standard setup: "select raw-crawl documents that read like
    the high-quality target domain").  Every word unigram and bigram
    hashes into one of ``n_buckets`` buckets (paper default 10^4 —
    the dial scales with corpus size; 256 keeps test-scale bucket
    estimates dense).  Per-bucket probabilities with Laplace +1
    smoothing give the target model ``p`` and the raw-corpus model
    ``q``; a document's importance is ``log w = sum_f log(p_b(f) /
    q_b(f))`` over its feature instances.  Selection is Gumbel
    top-k on ``log w + g_i`` — sampling WITHOUT replacement from the
    importance-weighted distribution, exactly the paper's sampler —
    with the Gumbel noise ``g_i = -ln(-ln(u_i))`` derived from
    ``md5(seed:doc_id)`` so the draw is reproducible across runs,
    engines and retries (the same determinism argument as
    ``corpus_shuffle``).

    Scale: feature extraction is map-only (one explode of a
    concatenated unigram+bigram array — no per-doc window).  The
    (doc_id, bucket) count frame is ONE keyed shuffle with partial
    aggregation, localCheckpointed because both the distribution
    estimate and the scoring pass read it (re-extraction, not the
    checkpoint, would be the 100 TB cost).  The bucket distributions
    collapse to ``n_buckets`` rows — broadcast back for scoring — and
    the final global top-k is a rank-filter the optimizer runs as
    WindowGroupLimit (per-partition partial top-k, no full sort
    materialization).

    Reference: the dagster-delta reference defers all user compute
    (SURVEY §2.6-2.8); this is additive engine surface like the rest
    of this module.
    """
    from .relational import widen_for_compute

    # r16 (guide §2.5): the unigram+bigram extraction and md5 bucket
    # hashing below are the dominant map work — parallelize past a
    # single-row-group scan's one task
    docs = widen_for_compute(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "lang", "source", F.expr(TOKENS).alias("t")
    )
    # unigrams ++ bigrams in one map-only array expression (mirrors
    # repetition_quality's gram builder; single-level lambda stays in
    # codegen-adjacent territory, and the CASE guard avoids
    # sequence(1, 0) = [1, 0] descending on 1-token docs)
    feats = toks.select(
        "doc_id",
        "lang",
        "source",
        F.explode(
            F.expr(
                "concat(t, CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(1, size(t) - 1), i -> "
                "concat(element_at(t, i), ' ', element_at(t, i + 1))) "
                "ELSE array() END)"
            )
        ).alias("f"),
    )
    db = (
        feats.withColumn(
            "bucket",
            F.pmod(
                F.expr("conv(substring(md5(f), 1, 4), 16, 10)").cast(
                    "int"
                ),
                F.lit(n_buckets),
            ),
        )
        .groupBy("doc_id", "lang", "source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # both the distribution pass and the scoring pass read this;
        # without the checkpoint Spark re-extracts features twice
        .localCheckpoint(eager=False)
    )
    dist = db.groupBy("bucket").agg(
        F.sum("cnt").alias("q_cnt"),
        F.sum(
            F.when(F.col("lang") == target_lang, F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("p_cnt"),
    )
    tot = dist.agg(
        F.sum("q_cnt").alias("q_tot"), F.sum("p_cnt").alias("p_tot")
    )
    ratio = (
        dist.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.col("p_cnt") + F.lit(1.0))
                    / (F.col("p_tot") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("q_cnt") + F.lit(1.0))
                    / (F.col("q_tot") + F.lit(float(n_buckets)))
                )
            ).alias("log_ratio"),
        )
    )
    w = (
        db.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "lang", "source")
        .agg(F.sum(F.col("cnt") * F.col("log_ratio")).alias("logw"))
    )
    # Gumbel perturbation: u in (0, 1) from the first 8 md5 hex digits
    # (+0.5 keeps u strictly positive), g = -ln(-ln(u))
    u = (
        F.expr(
            f"conv(substring(md5(concat('{seed}:', "
            f"CAST(doc_id AS STRING))), 1, 8), 16, 10)"
        ).cast("bigint").cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    scored = w.withColumn("score", F.col("logw") - F.log(-F.log(u)))
    from pyspark.sql.window import Window

    rank_w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("sel_rank", F.row_number().over(rank_w))
        .where(F.col("sel_rank") <= top_k)
        .select(
            "doc_id",
            "lang",
            "source",
            "logw",
            "score",
            F.col("sel_rank").cast("int").alias("sel_rank"),
        )
    )


def quality_balanced_prune(
    spark: SparkSession,
    sf_dir: str,
    keep_frac: float = 0.7,
    grid_decimals: int = 4,
) -> DataFrame:
    """Domain-balanced quality pruning: every source keeps its own
    top ``keep_frac`` of documents by quality score — the filter
    shape that avoids the single-global-threshold trap, where one
    clean domain's floor wipes out another domain entirely (the
    Gopher/FineWeb-style per-domain pruning pass).

    Scale design: NO per-document ranking.  Scores quantize to a
    ``grid_decimals`` grid, so the distribution state is a
    (source x gridpoint) histogram — at most 10^grid_decimals * score
    range rows per source REGARDLESS of corpus size (vs a
    percent_rank window, which sorts every document of a source
    inside one task).  The cutoff per source is the largest
    gridpoint whose from-the-top cumulative count covers
    ``ceil(keep_frac * n_source)`` — the shared exact rank's
    histogram case (``ranking.exact_rank`` with the gridpoint as
    both bucket and order key), broadcast back, and applied as a
    map-side comparison.  Everything is deterministic integer/grid math, so
    the DuckDB twin agrees exactly (grid rounding BEFORE the cutoff
    comparison keeps boundary docs engine-agreed, the
    temperature_mixture_sample precedent).

    Output: ``(doc_id, source, qscore, cutoff, kept)`` for every
    document; ``kept`` = qscore >= cutoff, guaranteeing at least
    ``keep_frac`` of each source survives (grid-aligned, so slightly
    more on score ties).
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac={keep_frac} must be in (0, 1]")
    from .ranking import exact_rank
    from .textops import with_text_quality

    docs = load(spark, sf_dir, "documents")
    scored = with_text_quality(docs).select(
        "doc_id",
        "source",
        F.round(F.col("quality_score"), grid_decimals).alias("qscore"),
        # both the histogram branch and the output join read this;
        # without the checkpoint the tokenize/regex scoring scan runs
        # twice (with_text_quality's own one-scan rule)
    ).localCheckpoint(eager=False)
    hist = scored.groupBy("source", "qscore").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = hist.groupBy("source").agg(F.sum("cnt").alias("n_source"))
    # inclusive from-the-top cum = exclusive prefix (histogram case:
    # the gridpoint IS the bucket, one row per bucket) + own count
    cum = (
        exact_rank(hist, [], "qscore", group_cols=["source"],
                   weight_col="cnt", bucket_desc=True,
                   out_col="cum_excl")
        .withColumn("cum", F.col("cum_excl") + F.col("cnt"))
        .join(tot, "source")
    )
    cut = (
        cum.where(
            F.col("cum")
            >= F.ceil(F.lit(keep_frac) * F.col("n_source")).cast("bigint")
        )
        .groupBy("source")
        .agg(F.max("qscore").alias("cutoff"))
    )
    return scored.join(F.broadcast(cut), "source").select(
        "doc_id",
        "source",
        "qscore",
        "cutoff",
        (F.col("qscore") >= F.col("cutoff")).alias("kept"),
    )


def doremi_domain_weights(
    spark: SparkSession,
    sf_dir: str,
    eta: float = 0.5,
    steps: int = 8,
    smoothing: float = 0.1,
    lam: float = 0.7,
) -> DataFrame:
    """DoReMi-style domain-weight solver (Xie et al. 2023, Algorithm
    1) under a STATIC proxy/reference pair: per-domain excess loss =
    mean over the domain's documents of ``textops.doc_excess_loss``
    (weak unigram proxy NLL minus strong bigram reference NLL, clipped
    at zero — how much headroom a model has on that domain), then the
    exponentiated-gradient iteration DoReMi runs per training step:

    - ``alpha_t ∝ alpha_{t-1} * exp(eta * excess)`` from a uniform
      ``alpha_0`` — with static losses the t-th iterate is the closed
      form ``softmax(eta * t * excess)``, and each iterate DIFFERS
      (the temperature sharpens with t), so DoReMi's final answer —
      the AVERAGE over iterates, smoothed with the uniform
      distribution — is a genuine T-term fold, not a single softmax;
    - ``weight_d = (1 - smoothing) * (1/T) * sum_t alpha_t[d]
      + smoothing / K`` over the ``K`` domains.

    The full published algorithm re-trains the proxy between steps;
    with a fixed proxy this is the one-round instantiation — the
    per-domain losses are honest corpus statistics and the solver is
    the real DoReMi update, exact in both engines (excess rounded to
    9 pre-exponentiation; the iteration lives on the K-row domain
    frame).

    Output: every domain with ``(source, n_docs, excess_loss,
    weight)`` — weights sum to 1 (within rounding), and domains whose
    docs all dropped from the LM stream (< 2 tokens) are absent, like
    every bigram-based operator.

    Scale shape: one corpus-linear scoring pass (the shared
    ``_bigram_scored_stream``), one (source) aggregate, then the
    entire solver runs on the K-row domain frame (domain cardinality
    is bounded by construction — sources, not documents); K*T rows
    peak.  No driver materialization, no corpus shuffle beyond the
    scoring join."""
    from .textops import doc_excess_loss

    if eta <= 0:
        raise ValueError(f"eta must be positive, got {eta}")
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    if not 0 <= smoothing < 1:
        raise ValueError(f"smoothing={smoothing} out of [0, 1)")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    dom = (
        docs.join(doc_excess_loss(spark, sf_dir, lam), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # mean via the exact DECIMAL(20,9) accumulator (the
            # _cohort_quality convention): excess is already rounded
            # to 9 so the cast is exact, the sum order-independent,
            # and both engines round the IDENTICAL quotient double —
            # float avg() folds in partition order and could land
            # either side of a .5e-9 boundary nondeterministically
            F.round(
                F.sum(F.col("excess").cast("decimal(20,9)"))
                .cast("double") / F.count(F.lit(1)), 9,
            ).alias("l_excess"),
        )
        .localCheckpoint(eager=False)  # solver + K probe share one
        # scoring pass
    )
    k = dom.count()
    if k == 0:
        raise ValueError(
            "no scorable documents (every doc has < 2 tokens) — "
            "domain weights are undefined")
    iters = dom.select(
        "source", "n_docs", "l_excess",
        F.explode(F.sequence(F.lit(1), F.lit(int(steps)))).alias("t"),
    ).withColumn(
        "m", F.exp(F.lit(float(eta)) * F.col("t") * F.col("l_excess")))
    z = iters.groupBy("t").agg(F.sum("m").alias("z"))
    return (
        iters.join(F.broadcast(z), "t")
        .groupBy("source", "n_docs", "l_excess")
        .agg((F.sum(F.col("m") / F.col("z")) / F.lit(float(steps)))
             .alias("a_bar"))
        .select(
            "source", "n_docs",
            F.round("l_excess", 6).alias("excess_loss"),
            F.round(
                F.lit(1.0 - smoothing) * F.col("a_bar")
                + F.lit(smoothing / k), 6,
            ).alias("weight"),
        )
    )


def unimax_sample(
    spark: SparkSession,
    sf_dir: str,
    budget_docs: int = 701,
    max_epochs: int = 2,
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023): spread a total
    document budget UNIFORMLY across languages, capping each language
    at ``max_epochs`` passes over its data — the fairer alternative to
    temperature sampling (no hyperparameter that over-epochs the
    tail).  Integer variant, exact in both engines:

    - per language ``l``: ``n_l`` docs, ``cap_l = n_l * max_epochs``;
    - rank languages by ``(cap_l, lang)`` ascending; the CAPPED set is
      the prefix where ``B - P_{i-1} >= cap_i * (L - i + 1)`` (``P`` =
      cap prefix sum).  This closed form equals the sequential
      "give each remaining language an equal share" fold because the
      slack ``B - P_{i-1} - cap_i*(L-i+1)`` is non-increasing along
      the ascending sort — the capped set is always a prefix;
    - the ``L - k`` uncapped languages get ``q = (B - P_k) // (L-k)``
      docs each, the first ``r = (B - P_k) % (L-k)`` of them (in rank
      order) one extra — all integer arithmetic, so Spark and DuckDB
      agree bit-for-bit;
    - per doc: ``copies = alloc // n_l``, plus one for the
      ``alloc % n_l`` docs ranked first by ``(md5(doc_id), doc_id)``
      within the language (the deterministic-hash convention every
      sampler here uses).

    Output: every doc with ``(doc_id, lang, copies)`` — zero-copy docs
    included so capped languages are auditable, like
    ``temperature_mixture_sample``.

    Scale shape: the water-filling runs on the languages frame (a few
    hundred rows at any corpus size — the single-partition window is
    bounded by design) and broadcasts back; the per-doc rank avoids a
    per-language global sort via the shared two-level exact rank
    (``ranking.exact_rank``; bucket by the md5's first 2 hex chars —
    a monotone split of the order key — then offset + intra-bucket
    window), so the dominant language never concentrates on one
    reducer."""
    from pyspark.sql.window import Window

    from .ranking import exact_rank

    if budget_docs <= 0 or max_epochs <= 0:
        raise ValueError("budget_docs and max_epochs must be positive")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    stats = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    # --- water-filling over the tiny language frame ---
    wl = Window.orderBy("cap", "lang")
    wp = wl.rowsBetween(Window.unboundedPreceding, -1)
    ranked = (
        stats.withColumn("cap", F.col("n_l") * F.lit(max_epochs))
        .withColumn("i", F.row_number().over(wl))
        .withColumn("p_prev",
                    F.coalesce(F.sum("cap").over(wp), F.lit(0)))
    )
    totals = ranked.agg(F.count(F.lit(1)).alias("n_langs"))
    flagged = (
        ranked.crossJoin(F.broadcast(totals))
        .withColumn(
            "capped",
            F.lit(budget_docs) - F.col("p_prev")
            >= F.col("cap") * (F.col("n_langs") - F.col("i") + 1))
    )
    pool = flagged.agg(
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).alias("k"),
        F.sum(F.when(F.col("capped"), F.col("cap")).otherwise(0))
        .alias("p_k"),
    )
    alloc = (
        flagged.withColumn("__b", F.lit(budget_docs))
        .crossJoin(F.broadcast(pool))
        .withColumn("free", F.col("n_langs") - F.col("k"))
        .withColumn("q", F.expr("(__b - p_k) div greatest(free, 1)"))
        .withColumn("r", F.expr("(__b - p_k) % greatest(free, 1)"))
        .withColumn(
            "alloc",
            F.when(F.col("capped"), F.col("cap")).otherwise(
                F.col("q")
                + F.when(F.col("i") - F.col("k") <= F.col("r"),
                         F.lit(1)).otherwise(F.lit(0))))
        .select("lang", "n_l", "alloc")
    )
    # --- per-doc copies: two-level rank within language ---
    bucketed = docs.withColumn("b2", F.substring("h", 1, 2))
    return (
        exact_rank(bucketed, ["h", "doc_id"], "b2", group_cols=["lang"])
        .join(F.broadcast(alloc), "lang")
        .select(
            "doc_id", "lang",
            (F.expr("alloc div n_l")
             + F.when(F.col("rank0") < F.col("alloc") % F.col("n_l"),
                      F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("copies"),
        )
    )


def token_budget_sample(
    spark: SparkSession, sf_dir: str, budget_tokens: int = 20_000,
    buckets: int = 1024,
) -> DataFrame:
    """Sample documents in a deterministic shuffled order until a
    GLOBAL token budget is reached — the standard "give me N tokens of
    this corpus" downsampling step before a training run.  A document
    is kept iff the running token total BEFORE it (in md5-of-doc_id
    order, the engine-portable shuffle every sampling operator here
    uses) is still under the budget, so exactly one document straddles
    the boundary and the selection is reproducible across runs,
    engines, and retries.

    Scale shape — a global running sum WITHOUT a global window: a
    naive ``Window.orderBy(key)`` collapses the corpus into one
    partition.  Instead the order key's hex prefix buckets the corpus
    (ordering by ``(bucket, key)`` == ordering by ``key``, since the
    bucket IS a prefix of the key), per-bucket token sums aggregate to
    a ``buckets``-row frame whose exclusive prefix sum broadcasts
    back, and the intra-bucket running sum is a window WITHIN each
    bucket — the shared two-level prefix sum (``ranking.exact_rank``
    with a weight column): one tiny aggregate + one partitioned
    window, no single-partition stage at any corpus size.

    Output: ``(doc_id, n_tokens, pre_total, kept)`` for every doc —
    the full assignment, so capped tails are auditable (the
    no-silent-caps rule)."""
    from .ranking import exact_rank

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens={budget_tokens} must be >= 0")
    if not 1 <= buckets <= 4096:
        raise ValueError(f"buckets={buckets} must be in [1, 4096]")
    # 3 hex chars cover 4096 buckets; taking a PREFIX of the order key
    # keeps (bucket, key) ordering identical to key ordering
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"size({TOKENS})").cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    ).withColumn(
        # MONOTONE range split of the 3-hex-char prefix (0..4095):
        # floor(prefix * buckets / 4096).  A modulo here would break
        # the (bucket, key) == (key) ordering equivalence the
        # two-level prefix sum rests on.
        "bucket",
        F.expr(
            "CAST(conv(substring(k, 1, 3), 16, 10) AS BIGINT) "
            f"* {buckets} DIV 4096"
        ),
    )
    # the offsets frame is <= `buckets` rows — the single-partition
    # window is over THAT, not the corpus
    return (
        exact_rank(docs, ["k", "doc_id"], "bucket",
                   weight_col="n_tokens", out_col="pre_total")
        .select(
            "doc_id",
            "n_tokens",
            "pre_total",
            (F.col("pre_total") < F.lit(budget_tokens)).alias("kept"),
        )
    )
