"""Curation operators: decontamination, PII scrub, quota sampling,
embedding quantization (operators/curation.py).  Cross-engine parity
runs in tools/check_oracles.py; these tests pin the semantics on
crafted inputs."""

import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    d = tmp_path / "corpus"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_decontaminate_flags_verbatim_overlap(spark, tmp_path):
    """A doc sharing an 8-gram with the eval set is flagged; disjoint
    docs are not; eval members flag themselves."""
    from dagster_delta_spark.operators.curation import decontaminate

    span = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        # doc 3 is the eval doc (doc_id % 17 == 3)
        (3, f"the benchmark question is {span} end", "en", "eval", 1),
        (1, f"training text copies {span} verbatim here", "en", "web", 1),
        (2, "completely different words with no overlap at all in this "
            "document of many tokens", "en", "web", 1),
    ]
    out = {r.doc_id: (r.n_contaminated_ngrams, r.contaminated)
           for r in decontaminate(spark, _write_docs(spark, tmp_path, rows))
           .collect()}
    assert out[1][1] is True and out[1][0] >= 1
    assert out[2] == (0, False)
    assert out[3][1] is True  # eval doc trivially overlaps itself


def test_bloom_decontaminate_matches_exact(spark):
    """Bloom prefilter + exact verify must reproduce decontaminate
    bit-for-bit on the real corpus (false positives all stripped)."""
    from dagster_delta_spark.operators.curation import (
        bloom_decontaminate,
        decontaminate,
    )

    exact = {(r.doc_id, r.n_contaminated_ngrams, r.contaminated)
             for r in decontaminate(spark, SF).collect()}
    bloom = {(r.doc_id, r.n_contaminated_ngrams, r.contaminated)
             for r in bloom_decontaminate(spark, SF).collect()}
    assert bloom == exact
    assert any(c for _, _, c in exact)  # fixture actually contaminates


def test_bloom_prefilter_actually_prunes(spark, tmp_path):
    """On a corpus disjoint from the eval set, the tiny-bitmap variant
    must flag nothing (i.e. FPs at 1 bit/gram granularity still die in
    the verify join) and a reasonable bitmap must keep survivors low —
    exercised indirectly via bits_per_gram=1 correctness."""
    from dagster_delta_spark.operators.curation import bloom_decontaminate

    rows = [(3, "benchmark secret held out questions about rare topics "
                "unique phrasing kept apart", "en", "eval", 1)]
    rows += [(i, f"wholly unrelated passage number {i} "
                 + " ".join(f"w{i}x{j}" for j in range(12)),
              "en", "web", 1)
             for i in range(4, 45) if i % 17 != 3]  # keep eval = {3}
    d = _write_docs(spark, tmp_path, rows)
    # 1 bit/gram: dense collisions in the prefilter, yet output exact
    out = {r.doc_id: r.contaminated
           for r in bloom_decontaminate(spark, d, bits_per_gram=1)
           .collect()}
    assert out[3] is True  # eval doc overlaps itself
    assert not any(v for k, v in out.items() if k != 3)


def test_scrub_pii_redacts_and_counts(spark, tmp_path):
    from dagster_delta_spark.operators.curation import scrub_pii

    rows = [
        (1, "mail me at jane.doe@example.com or 555-123-4567 x2; "
            "server 10.0.0.1, ssn 123-45-6789", "en", "web", 1),
        (2, "no pii here at all", "en", "web", 1),
    ]
    out = {r.doc_id: r for r in
           scrub_pii(spark, _write_docs(spark, tmp_path, rows)).collect()}
    r1 = out[1]
    assert (r1.n_email, r1.n_phone, r1.n_ipv4, r1.n_ssn) == (1, 1, 1, 1)
    for token in ("<EMAIL>", "<PHONE>", "<IP>", "<SSN>"):
        assert token in r1.clean_text
    assert "example.com" not in r1.clean_text
    assert "123-45-6789" not in r1.clean_text
    r2 = out[2]
    assert (r2.n_email, r2.n_phone, r2.n_ipv4, r2.n_ssn) == (0, 0, 0, 0)
    assert r2.clean_text == "no pii here at all"


def test_stratified_sample_respects_quota(spark):
    from dagster_delta_spark.operators.curation import stratified_sample

    out = stratified_sample(spark, SF, per_stratum=5)
    per = {}
    for r in out.collect():
        per[(r.source, r.lang)] = per.get((r.source, r.lang), 0) + 1
        assert 1 <= r.pick_rank <= 5
    assert per and all(v <= 5 for v in per.values())
    # deterministic across invocations
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in
               stratified_sample(spark, SF, per_stratum=5).collect())
    assert a == b


def test_quantize_embeddings_error_bound(spark):
    """int8 reconstruction error is bounded by half a quantization step
    of the widest dimension; arrays stay in [-128, 127]."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.operators.curation import quantize_embeddings
    from dagster_delta_spark.operators.relational import load

    out = quantize_embeddings(spark, SF)
    emb = load(spark, SF, "embeddings")
    widest = (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg((F.max("v") - F.min("v")).alias("range"))
        .agg(F.max("range")).first()[0]
    )
    step = widest / 255.0
    stats = out.agg(
        F.max("max_abs_err").alias("worst"),
        F.min(F.expr("array_min(qembedding)")).alias("lo"),
        F.max(F.expr("array_max(qembedding)")).alias("hi"),
    ).first()
    assert stats.worst <= step / 2 + 1e-9, (stats.worst, step)
    assert -128 <= stats.lo and stats.hi <= 127


def test_tfidf_rare_term_outranks_common(spark, tmp_path):
    """A term unique to one doc beats a corpus-wide term there; ranks
    are dense per doc and scores match the smoothed-idf formula."""
    import math

    from dagster_delta_spark.operators.textops import tfidf_top_terms

    rows = [
        (1, "apple apple banana", "en", "web", 1),
        (2, "banana cherry", "en", "web", 1),
        (3, "banana date", "en", "web", 1),
    ]
    out = tfidf_top_terms(spark, _write_docs(spark, tmp_path, rows),
                          top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in d1] == ["apple", "banana"]
    # tf=2, df=1, N=3 -> 2 * (ln(4/2) + 1)
    assert d1[0].tfidf == pytest.approx(2 * (math.log(2.0) + 1), rel=1e-9)
    # banana is in every doc: idf = ln(4/4) + 1 = 1, tf = 1
    assert d1[1].tfidf == pytest.approx(1.0, rel=1e-9)
    d2 = sorted(by_doc[2], key=lambda r: r.rank)
    assert [r.term for r in d2] == ["cherry", "banana"]


def test_repetition_quality_signals(spark, tmp_path):
    from dagster_delta_spark.operators.textops import repetition_quality

    rows = [
        (1, "a a a a", "en", "web", 1),          # pure repetition
        (2, "w x y z", "en", "web", 1),          # all distinct
        (3, "q", "en", "web", 1),                # too short for grams
    ]
    out = {r.doc_id: r for r in
           repetition_quality(spark, _write_docs(spark, tmp_path, rows))
           .collect()}
    r1 = out[1]
    assert r1.n_tokens == 4
    assert r1.dup_word_fraction == pytest.approx(0.75)
    assert r1.top_2gram_fraction == pytest.approx(1.0)   # "a a" x3 of 3
    assert r1.dup_3gram_fraction == pytest.approx(1.0)   # "a a a" x2 of 2
    r2 = out[2]
    assert r2.dup_word_fraction == pytest.approx(0.0)
    assert r2.top_2gram_fraction == pytest.approx(1.0 / 3)
    assert r2.dup_3gram_fraction == pytest.approx(0.0)
    r3 = out[3]
    assert (r3.n_tokens, r3.top_2gram_fraction, r3.dup_3gram_fraction) == \
        (1, 0.0, 0.0)


def test_chunk_documents_sliding_windows(spark, tmp_path):
    from dagster_delta_spark.operators.curation import chunk_documents

    toks10 = [f"w{i}" for i in range(10)]
    rows = [
        (1, " ".join(toks10), "en", "web", 1),
        (2, "only two", "en", "web", 1),
        (3, "!!! ...", "en", "web", 1),  # no tokens -> no chunks
    ]
    out = chunk_documents(spark, _write_docs(spark, tmp_path, rows),
                          chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 10 tokens, window 4, stride 3 -> chunks at offsets 0, 3, 6
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in d1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert [r.n_chunk_tokens for r in d1] == [4, 4, 4]
    d2 = by_doc[2]
    assert len(d2) == 1 and d2[0].chunk_text == "only two"
    assert d2[0].n_chunk_tokens == 2
    assert 3 not in by_doc


def test_chunk_documents_short_tail(spark, tmp_path):
    """11 tokens with window 4 / stride 3: the last window is short and
    its token count reflects the truncation."""
    from dagster_delta_spark.operators.curation import chunk_documents

    rows = [(1, " ".join(f"w{i}" for i in range(11)), "en", "web", 1)]
    out = sorted(
        chunk_documents(spark, _write_docs(spark, tmp_path, rows),
                        chunk_tokens=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_text for r in out] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9 w10",
    ]
    assert [r.n_chunk_tokens for r in out] == [4, 4, 4, 2]


def test_assign_splits_deterministic_by_content(spark, tmp_path):
    import hashlib

    from dagster_delta_spark.operators.curation import assign_splits

    texts = [f"document number {i} with some words" for i in range(40)]
    texts.append(texts[0])  # exact duplicate must land in the same split
    rows = [(i, t, "en", "web", 1) for i, t in enumerate(texts)]
    out = {r.doc_id: r for r in
           assign_splits(spark, _write_docs(spark, tmp_path, rows))
           .collect()}
    assert len(out) == 41
    for doc_id, text in enumerate(texts):
        bucket = int(hashlib.md5(text.encode()).hexdigest()[:4], 16)
        expected = ("train" if bucket < 52428
                    else "val" if bucket < 58982 else "test")
        assert out[doc_id].bucket == bucket
        assert out[doc_id].split == expected
    assert out[40].split == out[0].split


def test_pack_sequences_sharded_cumsum(spark, tmp_path):
    """cum_tokens/seq_id match a Python replay of the hash-ordered
    per-shard cumsum; bins advance every `budget` tokens."""
    import hashlib
    import re

    from dagster_delta_spark.operators.curation import pack_sequences

    texts = [f"doc {i} " + " ".join(f"tok{j}" for j in range(i % 7))
             for i in range(30)]
    rows = [(i, t, "en", "web", 1) for i, t in enumerate(texts)]
    out = pack_sequences(spark, _write_docs(spark, tmp_path, rows),
                         budget=10, num_shards=4).collect()
    assert len(out) == 30

    def n_toks(t):
        return len([x for x in re.split(r"[^a-z0-9]+", t.lower()) if x])

    expect = {}
    shards = {}
    for doc_id, text in enumerate(texts):
        fp = hashlib.md5(text.encode()).hexdigest()
        shards.setdefault(int(fp[4:8], 16) % 4, []).append(
            (fp, doc_id, n_toks(text))
        )  # 4 hex chars since the r6 shard-width fix
    for shard, docs in shards.items():
        cum = 0
        for fp, doc_id, n in sorted(docs):
            seq_id = cum // 10
            cum += n
            expect[doc_id] = (shard, n, cum, seq_id)
    got = {r.doc_id: (r.shard, r.n_tokens, r.cum_tokens, r.seq_id)
           for r in out}
    assert got == expect


def test_cross_source_contamination(spark, tmp_path):
    """Planted leak: the same article under two source labels is
    reported as exactly one (source_a, source_b) pair; an article
    sharing only its 8-word intro (diverging tail) also counts —
    prefix fingerprinting is the point; unrelated docs don't pair."""
    import pandas as pd

    from dagster_delta_spark.operators.curation import (
        cross_source_contamination,
    )

    import os

    d = tmp_path / "corpus"
    os.makedirs(d, exist_ok=True)
    intro = "alpha beta gamma delta epsilon zeta eta theta"
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            intro + " full body one",
            intro + " completely different tail",   # same 8-word prefix
            "unrelated words entirely here and nothing shared at all",
            intro + " full body one",               # exact copy, 3rd source
            "another standalone document with its own content",
        ],
        "lang": ["en"] * 5,
        "source": ["crawl_a", "crawl_b", "crawl_a", "crawl_c", "crawl_b"],
        "n_chars": [10] * 5,
    }).to_parquet(str(d / "documents.parquet"))
    out = {(r["source_a"], r["source_b"]): r["n_shared_fingerprints"]
           for r in cross_source_contamination(spark, str(d)).collect()}
    assert out == {
        ("crawl_a", "crawl_b"): 1,
        ("crawl_a", "crawl_c"): 1,
        ("crawl_b", "crawl_c"): 1,
    }
    # exact mode: only the verbatim copy pairs
    exact = {(r["source_a"], r["source_b"]): r["n_shared_fingerprints"]
             for r in cross_source_contamination(
                 spark, str(d), prefix_words=None).collect()}
    assert exact == {("crawl_a", "crawl_c"): 1}


def test_zipf_profile_duckdb_anchor(spark):
    """zipf_profile matches a DuckDB re-implementation on the real
    corpus (oracle-style anchor ahead of its registry entry) and the
    slope is negative (frequency falls with rank)."""
    import duckdb

    from dagster_delta_spark.operators.textops import zipf_profile

    sf = "/root/testdata/sf0.001"
    row = zipf_profile(spark, sf).collect()[0]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = con.sql("""
        WITH toks AS (
            SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents
        ), counts AS (
            SELECT tok, count(*) AS freq FROM toks GROUP BY tok
            ORDER BY freq DESC, tok ASC LIMIT 1000
        ), ranked AS (
            SELECT ln(CAST(row_number() OVER (
                       ORDER BY freq DESC, tok ASC) AS DOUBLE)) AS x,
                   ln(CAST(freq AS DOUBLE)) AS y
            FROM counts
        )
        SELECT count(*) AS n_ranks,
               covar_pop(x, y) / var_pop(x) AS slope,
               avg(y) - covar_pop(x, y) / var_pop(x) * avg(x) AS intercept,
               pow(corr(x, y), 2) AS r2
        FROM ranked
    """).fetchone()
    assert row["n_ranks"] == exp[0]
    assert abs(row["slope"] - exp[1]) < 1e-9
    assert abs(row["intercept"] - exp[2]) < 1e-9
    assert abs(row["r2"] - exp[3]) < 1e-9
    assert row["slope"] < 0


def test_zipf_profile_degenerate_corpus(spark, tmp_path):
    """One distinct token: slope/intercept/r2 are NULL (not an ANSI
    DIVIDE_BY_ZERO raise, not NaN) — matching what DuckDB returns for
    the same expressions."""
    from dagster_delta_spark.operators.textops import zipf_profile

    rows = [(1, "same same same", "en", "web", 1)]
    row = zipf_profile(spark, _write_docs(spark, tmp_path, rows)).collect()[0]
    assert row["n_ranks"] == 1
    assert row["slope"] is None
    assert row["intercept"] is None
    assert row["r2"] is None


def test_corpus_shuffle_invariants(spark):
    """Deterministic epoch shuffle: output is a permutation of the
    corpus, positions are dense 1..n per shard, re-running yields the
    identical order, and a different seed yields a different one."""
    from dagster_delta_spark.operators.curation import corpus_shuffle

    sf = "/root/testdata/sf0.001"
    a = corpus_shuffle(spark, sf).collect()
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/documents.parquet'").fetchone()[0]
    assert len(a) == n and len({r["doc_id"] for r in a}) == n
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    b = corpus_shuffle(spark, sf).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"])
                              for r in rows)
    assert key(a) == key(b)  # reproducible
    c = corpus_shuffle(spark, sf, seed=7).collect()
    assert key(a) != key(c)  # seed changes the permutation


def test_text_quality_zero_token_doc_matches_oracle(spark, tmp_path):
    """A document with no [a-z0-9] tokens (pure punctuation/CJK) must
    produce the same avg_token_len on both engines — DuckDB's list_sum
    over an empty list is NULL, which the oracle now coalesces to 0 to
    match Spark's aggregate identity (r6 review)."""
    import duckdb

    import __spark_entry__ as entry

    rows = [(1, "?!... ---", "en", "web", 9),
            (2, "normal words here", "en", "web", 17)]
    d = _write_docs(spark, tmp_path, rows)
    got = sorted(
        (r["doc_id"], r["n_tokens"], round(r["avg_token_len"], 9),
         round(r["quality_score"], 9))
        for r in entry.queries()["text_quality"](spark, d).collect()
    )
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet/*.parquet'")
    want = sorted(
        (r[0], r[1], round(r[2], 9), round(r[3], 9))
        for r in con.sql(
            "SELECT doc_id, n_tokens, avg_token_len, quality_score FROM ("
            + entry.oracle_sql()["text_quality"] + ")").fetchall()
    )
    assert got == want


def test_chunk_documents_validates_dials(spark):
    import pytest as _pytest

    from dagster_delta_spark.operators.curation import chunk_documents

    sf = "/root/testdata/sf0.001"
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(spark, sf, chunk_tokens=64, stride=0)
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(spark, sf, chunk_tokens=64, stride=100)


def test_pack_sequences_shard_width(spark):
    """The shard key draws from 4 hex chars (0-65535), so num_shards
    beyond 256 actually populates (the old single byte capped
    parallelism at 256 and skewed non-divisor counts by up to 50%)."""
    from dagster_delta_spark.operators.curation import pack_sequences

    out = pack_sequences(spark, "/root/testdata/sf0.01", num_shards=300)
    shards = {r["shard"] for r in out.select("shard").distinct().collect()}
    assert max(shards) > 255  # impossible under the 1-byte key
    assert all(0 <= s < 300 for s in shards)


def test_temperature_mixture_sample_properties(spark):
    """alpha=1 keeps natural proportions (every source gets the same
    accept rate = sample_frac); alpha=0 equalizes expected per-source
    counts (rate ~ 1/n_s, capped at 1); decisions are deterministic
    across calls and flip with the seed; dials validate."""
    import pytest

    from dagster_delta_spark.operators.curation import (
        temperature_mixture_sample,
    )

    sf = "/root/testdata/sf0.001"
    nat = temperature_mixture_sample(spark, sf, alpha=1.0, sample_frac=0.3)
    rates = {r["source"]: r["accept_rate"]
             for r in nat.select("source", "accept_rate").distinct().collect()}
    assert all(abs(v - 0.3) < 1e-6 for v in rates.values()), rates

    eq = temperature_mixture_sample(spark, sf, alpha=0.0, sample_frac=0.3)
    import collections
    n_s = collections.Counter(
        r["source"] for r in eq.select("source").collect())
    targets = {r["source"]: r["accept_rate"] * n_s[r["source"]]
               for r in eq.select("source", "accept_rate")
               .distinct().collect()}
    vals = list(targets.values())
    # equal expected counts for every uncapped source
    uncapped = [v for s, v in targets.items()
                if targets[s] < n_s[s] - 1e-6]
    assert max(uncapped) - min(uncapped) < 1e-3, targets

    a = temperature_mixture_sample(spark, sf).collect()
    b = temperature_mixture_sample(spark, sf).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))   # deterministic
    c = {r["doc_id"]: r["sampled"]
         for r in temperature_mixture_sample(spark, sf, seed=7).collect()}
    base = {r["doc_id"]: r["sampled"] for r in a}
    assert any(base[k] != c[k] for k in base)           # seed re-keys

    with pytest.raises(ValueError, match="alpha"):
        temperature_mixture_sample(spark, sf, alpha=2.0)
    with pytest.raises(ValueError, match="sample_frac"):
        temperature_mixture_sample(spark, sf, sample_frac=0.0)


def test_dsir_prefers_target_like_docs(spark, tmp_path):
    """DSIR importance weights rank a non-target-language doc written
    in the TARGET's vocabulary above one written in a disjoint
    vocabulary; ranks are dense 1..k; logw is seed-independent while
    the Gumbel score is not."""
    from dagster_delta_spark.operators.curation import (
        dsir_importance_sample,
    )

    target = "the quick brown fox jumps over the lazy dog again"
    alien = "zork blarg quux fizzle wump snork grue thud plugh xyzzy"
    rows = [
        (1, target, "en", "web", 1),
        (2, target + " " + target, "en", "web", 1),
        (3, "quick fox dog lazy brown jumps", "en", "web", 1),
        # same vocabulary as the target slice, different lang label
        (4, "the quick brown fox over the dog", "xx", "crawl", 1),
        # disjoint vocabulary
        (5, alien, "xx", "crawl", 1),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = dsir_importance_sample(
        spark, sf, target_lang="en", n_buckets=64, top_k=5
    ).collect()
    assert len(out) == 5
    assert sorted(r["sel_rank"] for r in out) == [1, 2, 3, 4, 5]
    logw = {r["doc_id"]: r["logw"] for r in out}
    assert logw[4] > logw[5], logw
    # every target-vocab doc outranks the alien-vocab doc
    assert min(logw[1], logw[2], logw[3], logw[4]) > logw[5]

    rerun = dsir_importance_sample(
        spark, sf, target_lang="en", n_buckets=64, top_k=5
    ).collect()
    assert sorted((r["doc_id"], r["score"]) for r in out) == sorted(
        (r["doc_id"], r["score"]) for r in rerun
    )
    reseeded = {
        r["doc_id"]: (r["logw"], r["score"])
        for r in dsir_importance_sample(
            spark, sf, target_lang="en", n_buckets=64, top_k=5, seed=7
        ).collect()
    }
    for doc_id, (lw, sc) in reseeded.items():
        assert lw == pytest.approx(logw[doc_id])  # weights: seed-free
    assert any(
        reseeded[r["doc_id"]][1] != r["score"] for r in out
    )  # Gumbel draw: re-keyed by seed


def test_quality_balanced_prune_per_source_quota(spark, tmp_path):
    """Each source keeps at least keep_frac of its own docs (its own
    top slice), so a low-quality source is pruned within itself, not
    wiped out by a cleaner source's threshold; grid ties keep both."""
    from dagster_delta_spark.operators.curation import (
        quality_balanced_prune,
    )

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks away to find some other interesting business")
    bad = "x!!! ??? @@@"
    rows = (
        [(i, good, "en", "clean", 1) for i in range(1, 9)]
        + [(9, bad, "en", "clean", 1), (10, bad + "!!", "en", "clean", 1)]
        + [(20 + i, bad + ("!" * i), "en", "noisy", 1) for i in range(6)]
    )
    sf = _write_docs(spark, tmp_path, rows)
    out = quality_balanced_prune(spark, sf, keep_frac=0.5)
    rowsd = {r["doc_id"]: r for r in out.collect()}
    assert len(rowsd) == len(rows)
    for src, ids in (("clean", range(1, 11)), ("noisy", range(20, 26))):
        kept = [i for i in ids if rowsd[i]["kept"]]
        assert len(kept) >= len(list(ids)) // 2, (src, kept)
    # the noisy source still keeps SOMETHING (domain-balanced), and
    # clean's junk docs are what clean prunes
    assert any(rowsd[i]["kept"] for i in range(20, 26))
    assert not rowsd[9]["kept"] and not rowsd[10]["kept"]
    # all 8 good clean docs tie on the grid -> all kept
    assert all(rowsd[i]["kept"] for i in range(1, 9))

    with pytest.raises(ValueError, match="keep_frac"):
        quality_balanced_prune(spark, sf, keep_frac=0.0)


def test_token_budget_sample_prefix_semantics(spark):
    """kept == running-total-before-doc < budget, the running total is
    a consistent prefix sum in md5 order, and the bucketed two-level
    plan equals the single-bucket (trivially global) plan."""
    from dagster_delta_spark.operators.curation import token_budget_sample

    sf = "/root/testdata/sf0.001"
    rows = token_budget_sample(spark, sf, budget_tokens=5000).collect()
    rows.sort(key=lambda r: r["pre_total"])
    run = 0
    for r in rows:
        assert r["pre_total"] == run
        assert r["kept"] == (run < 5000)
        run += r["n_tokens"]
    kept_tokens = sum(r["n_tokens"] for r in rows if r["kept"])
    # exactly one straddler: total kept crosses the budget by < one doc
    assert kept_tokens >= 5000
    assert kept_tokens - 5000 < max(r["n_tokens"] for r in rows)

    single = {(r["doc_id"], r["pre_total"], r["kept"])
              for r in token_budget_sample(spark, sf, 5000, buckets=1).collect()}
    assert single == {(r["doc_id"], r["pre_total"], r["kept"]) for r in rows}


def test_token_budget_sample_edges(spark):
    import pytest as _pytest

    from dagster_delta_spark.operators.curation import token_budget_sample

    sf = "/root/testdata/sf0.001"
    none = token_budget_sample(spark, sf, budget_tokens=0)
    assert none.where("kept").count() == 0
    allof = token_budget_sample(spark, sf, budget_tokens=10**12)
    assert allof.where("NOT kept").count() == 0
    with _pytest.raises(ValueError, match="budget_tokens"):
        token_budget_sample(spark, sf, budget_tokens=-1)
    with _pytest.raises(ValueError, match="buckets"):
        token_budget_sample(spark, sf, buckets=0)


def test_near_dup_decontaminate_exact_jaccard(spark, tmp_path):
    """Hand-computed trigram Jaccard on crafted docs: the paraphrase
    (one appended token) scores 6/7 against the eval doc, the eval doc
    self-matches at 1.0, and a shingle-disjoint doc is never flagged."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.operators.curation import near_dup_decontaminate

    rows = [
        (1, "a1 b2 c3 d4 e5 f6 g7 h8", "en", "eval", 1),   # 6 trigrams
        (2, "a1 b2 c3 d4 e5 f6 g7 h8 x9", "en", "web", 1),  # +1 new trigram
        (3, "z1 z2 z3 z4 z5 z6 z7 z8", "en", "web", 1),     # disjoint
    ]
    d = _write_docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{d}/documents.parquet").select(
        "doc_id", "text")
    out = {
        r["doc_id"]: r
        for r in near_dup_decontaminate(
            spark, d, eval_set=docs.where(F.col("doc_id") == 1),
            docs=docs, threshold=0.5,
        ).collect()
    }
    assert out[1]["jaccard"] == 1.0 and out[1]["matched_eval_id"] == 1
    assert out[2]["matched_eval_id"] == 1
    assert out[2]["jaccard"] == pytest.approx(6 / 7, abs=1e-6)
    assert 3 not in out


def test_near_dup_decontaminate_threshold(spark, tmp_path):
    """Raising the threshold above the true Jaccard removes the pair —
    the exact verify stage, not the LSH probe, draws the line."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.operators.curation import near_dup_decontaminate

    rows = [
        (1, "a1 b2 c3 d4 e5 f6 g7 h8", "en", "eval", 1),
        (2, "a1 b2 c3 d4 e5 f6 g7 h8 x9", "en", "web", 1),
    ]
    d = _write_docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{d}/documents.parquet").select(
        "doc_id", "text")
    out = near_dup_decontaminate(
        spark, d, eval_set=docs.where(F.col("doc_id") == 1),
        docs=docs, threshold=0.9,
    )
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_near_dup_decontaminate_best_match_and_default_eval(spark, tmp_path):
    """With two eval docs the flagged doc reports its BEST match (and
    ties break on the smaller eval id); the default eval set is the
    deterministic doc_id % 17 == 3 stand-in."""
    from dagster_delta_spark.operators.curation import near_dup_decontaminate

    rows = [
        # doc 3 and doc 20 are both eval (doc_id % 17 == 3)
        (3, "a1 b2 c3 d4 e5 f6 g7 h8", "en", "eval", 1),
        (20, "a1 b2 c3 d4 e5 f6 q1 q2 q3", "en", "eval", 1),
        # closer to doc 3 (6/7) than to doc 20
        (2, "a1 b2 c3 d4 e5 f6 g7 h8 x9", "en", "web", 1),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in near_dup_decontaminate(spark, d, threshold=0.3).collect()
    }
    assert out[2]["matched_eval_id"] == 3
    assert out[3]["jaccard"] == 1.0 and out[20]["jaccard"] == 1.0


def test_unimax_sample_water_filling(spark):
    """UniMax integer water-filling at sf0.01: fr/de hit the 2-epoch
    cap, es/zh/en split the remainder uniformly with es (first
    uncapped in rank order) taking the +1 — the closed form equals the
    sequential fold."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.operators.curation import unimax_sample

    out = unimax_sample(spark, "/root/testdata/sf0.01",
                        budget_docs=701, max_epochs=2)
    per_lang = {
        r["lang"]: (r["alloc"], r["n"])
        for r in out.groupBy("lang").agg(
            F.sum("copies").alias("alloc"),
            F.count(F.lit(1)).alias("n")).collect()
    }
    # caps: fr 64*2=128, de 70*2=140 (both capped); uncapped get
    # (701-268)//3 = 144, remainder 1 goes to es
    assert per_lang["fr"][0] == 128 and per_lang["de"][0] == 140
    assert per_lang["es"][0] == 145
    assert per_lang["zh"][0] == 144 and per_lang["en"][0] == 144
    # budget conserved exactly; every doc present (audit rows)
    assert sum(a for a, _ in per_lang.values()) == 701
    assert out.count() == 500
    # per-language cap respected and copies bounded by max_epochs+...
    assert out.agg(F.max("copies")).first()[0] <= 2
    assert out.agg(F.min("copies")).first()[0] >= 0


def test_unimax_sample_all_capped_and_validation(spark):
    from dagster_delta_spark.operators.curation import unimax_sample
    from pyspark.sql import functions as F

    # a budget above total capacity: every language exhausts its cap
    out = unimax_sample(spark, "/root/testdata/sf0.001",
                        budget_docs=10**9, max_epochs=3)
    per = out.groupBy("lang").agg(
        F.sum("copies").alias("a"), F.count(F.lit(1)).alias("n")).collect()
    assert all(r["a"] == 3 * r["n"] for r in per)
    import pytest as _pt
    with _pt.raises(ValueError):
        unimax_sample(spark, "/root/testdata/sf0.001", budget_docs=0)


def test_near_dup_decontaminate_cached_sigs_identical(spark):
    """r16: the default corpus rides the LSH family's session-cached
    signature frame, and the default eval side restricts it by doc_id
    (a per-doc aggregate restricts exactly like its input stream).
    Both must be bit-identical to the uncached formulation — forced
    here by passing the SAME default frames explicitly, which takes
    the sigs_of (re-derive) path."""
    from dagster_delta_spark.operators.curation import (
        load, near_dup_decontaminate)

    cached = near_dup_decontaminate(spark, SF)
    docs = load(spark, SF, "documents")
    explicit = near_dup_decontaminate(
        spark, SF, docs=docs,
        eval_set=docs.where("doc_id % 17 = 3"))
    assert cached.exceptAll(explicit).count() == 0
    assert explicit.exceptAll(cached).count() == 0
    assert cached.count() > 0
