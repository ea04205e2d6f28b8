"""BPE subword tokenizer (operators/bpe.py): merge learning against
the classic hand-worked example, encode round-trip, determinism, and
the scalable vocab-join stats shape."""

import pytest

SF = "/root/testdata/sf0.001"


def _corpus(spark, tmp_path, word_counts):
    rows, doc_id = [], 0
    for word, n in word_counts.items():
        for _ in range(n):
            rows.append((doc_id, word, "en", "test", len(word)))
            doc_id += 1
    d = tmp_path / "bpe"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_bpe_learns_classic_merge_sequence(spark, tmp_path):
    """The textbook corpus {low x5, lower x2, newest x6, widest x3}:
    pair mass puts (e,s)=(s,t)=9 first — lex tie-break picks (e,s) —
    then (es,t)=9, then (l,o)=(o,w)=7 -> (l,o), then (lo,w)=7.
    Hand-computed; any deviation is a counting or tie-break bug."""
    from dagster_delta_spark.operators.bpe import bpe_train

    d = _corpus(spark, tmp_path,
                {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = bpe_train(spark, d, num_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_bpe_encode_roundtrip_and_memo(spark, tmp_path):
    """Every word's subwords concatenate back to the word — including
    words NEVER seen in training (partial merges only); fully-trained
    words collapse to fewer symbols."""
    from dagster_delta_spark.operators.bpe import (
        _encode_fn,
        bpe_roundtrip_violations,
        bpe_train,
    )

    d = _corpus(spark, tmp_path,
                {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = bpe_train(spark, d, num_merges=4)
    enc = _encode_fn(merges)
    assert enc("lowest") == ["low", "est"]   # cross-word generalization
    assert enc("xyz") == ["x", "y", "z"]     # untrained: no merges
    assert "".join(enc("slowest")) == "slowest"
    assert bpe_roundtrip_violations(spark, d, num_merges=4) == 0
    assert bpe_roundtrip_violations(spark, SF) == 0


def test_bpe_token_stats_structure(spark, tmp_path):
    """Per-doc stats: n_words <= n_subwords <= n_chars, compression =
    subwords/chars; a fully-merged vocabulary hits n_subwords ==
    n_words."""
    from dagster_delta_spark.operators.bpe import bpe_token_stats

    d = _corpus(spark, tmp_path, {"low": 5, "newest": 6})
    out = {r["doc_id"]: r
           for r in bpe_token_stats(spark, d, num_merges=256).collect()}
    assert len(out) == 11
    for r in out.values():
        assert r["n_words"] == 1
        assert r["n_subwords"] == 1       # tiny vocab: fully merged
        assert r["compression"] == pytest.approx(
            1 / r["n_chars_tokenized"], abs=1e-6)


def test_bpe_validates_dials(spark):
    from dagster_delta_spark.operators.bpe import bpe_train

    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(spark, SF, num_merges=0)
    with pytest.raises(ValueError, match="word_cap"):
        bpe_train(spark, SF, word_cap=0)


def test_bpe_merge_cache_and_determinism(spark, tmp_path):
    """Same corpus + params -> identical merge table (and the second
    call is a cache hit returning the same object)."""
    from dagster_delta_spark.operators.bpe import bpe_train

    d = _corpus(spark, tmp_path,
                {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    a = bpe_train(spark, d, num_merges=8)
    b = bpe_train(spark, d, num_merges=8)
    assert a is b
    c = bpe_train(spark, d, num_merges=4)
    assert c == a[:4]
