"""CCNet-family corpus passes added in r10: cross-document line dedup
(dedup.line_dedup_corpus) and per-language perplexity terciles
(textops.ccnet_perplexity_buckets).  Cross-engine parity runs in
tools/check_oracles.py; these pin the semantics on crafted inputs."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

L1 = "alpha bravo charlie delta echo foxtrot golf hotel"      # 8 words
L2 = "india juliet kilo lima mike november oscar papa"        # 8 words
L3 = "quebec romeo sierra tango uniform victor whiskey xray"  # 8 words


def _write_docs(spark, tmp_path, rows):
    d = tmp_path / "corpus"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_line_dedup_first_occurrence_wins(spark, tmp_path):
    from dagster_delta_spark.operators.dedup import line_dedup_corpus

    rows = [
        (1, f"{L1} {L2}", "en", "web", 1),   # lines: L1, L2 (both first)
        (2, f"{L1} {L3}", "en", "web", 1),   # L1 is a repeat; L3 novel
        (3, L1, "en", "web", 1),             # every line a repeat
    ]
    out = {r["doc_id"]: r for r in
           line_dedup_corpus(spark, _write_docs(spark, tmp_path, rows))
           .collect()}
    assert out[1]["kept_text"] == f"{L1}\n{L2}"
    assert (out[1]["n_lines"], out[1]["n_kept"], out[1]["n_dropped"]) \
        == (2, 2, 0)
    assert out[2]["kept_text"] == L3
    assert (out[2]["n_lines"], out[2]["n_kept"], out[2]["n_dropped"]) \
        == (2, 1, 1)
    assert 3 not in out  # no novel text -> the document disappears


def test_line_dedup_preserves_order_and_intra_doc_dups(spark, tmp_path):
    from dagster_delta_spark.operators.dedup import line_dedup_corpus

    rows = [
        (1, L2, "en", "web", 1),
        # L2 repeated inside the doc AND seen earlier in doc 1: only
        # the novel lines survive, in their original order
        (2, f"{L1} {L2} {L3} {L2}", "en", "web", 1),
    ]
    out = {r["doc_id"]: r for r in
           line_dedup_corpus(spark, _write_docs(spark, tmp_path, rows))
           .collect()}
    assert out[2]["kept_text"] == f"{L1}\n{L3}"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (4, 2)


def test_line_dedup_short_tail_line(spark, tmp_path):
    """A 10-word doc chunks into one 8-word line plus a 2-word tail."""
    from dagster_delta_spark.operators.dedup import line_dedup_corpus

    rows = [(1, f"{L1} yankee zulu", "en", "web", 1)]
    row = line_dedup_corpus(
        spark, _write_docs(spark, tmp_path, rows)).head()
    assert row["n_lines"] == 2
    assert row["kept_text"] == f"{L1}\nyankee zulu"


def test_line_dedup_validates_line_words(spark):
    from dagster_delta_spark.operators.dedup import line_dedup_corpus

    with pytest.raises(ValueError, match="line_words"):
        line_dedup_corpus(None, SF, line_words=0)


def test_ccnet_buckets_match_spark_ntile(spark):
    """The two-level prefix-sum rank + closed-form allocation must
    reproduce Spark's own NTILE(3) over the identical ordering —
    bit-exact, for every language."""
    from pyspark.sql.window import Window
    from dagster_delta_spark.operators.textops import (
        bigram_perplexity,
        ccnet_perplexity_buckets,
    )

    got = ccnet_perplexity_buckets(spark, SF)
    scored = (
        bigram_perplexity(spark, SF)
        .join(spark.read.parquet(f"{SF}/documents.parquet")
              .select("doc_id", "lang"), "doc_id")
        .withColumn("r", F.round("perplexity", 9))
    )
    ref = scored.select(
        "doc_id",
        F.ntile(3).over(
            Window.partitionBy("lang").orderBy("r", "doc_id")
        ).alias("ref_bucket"),
    )
    diff = (got.join(ref, "doc_id")
            .where(F.col("bucket") != F.col("ref_bucket")).count())
    assert diff == 0
    assert got.count() == ref.count()


def test_ccnet_bucket_invariants(spark):
    from dagster_delta_spark.operators.textops import (
        ccnet_perplexity_buckets,
    )

    rows = ccnet_perplexity_buckets(spark, SF).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
        assert r["label"] == {1: "head", 2: "middle", 3: "tail"}[r["bucket"]]
        assert r["kept"] == (r["bucket"] <= 2)
    for lang, rs in by_lang.items():
        sizes = [sum(1 for r in rs if r["bucket"] == b) for b in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        # terciles are ordered: every head ppl <= every tail ppl
        # (rounded, ties broken by doc_id so equality is legal)
        for lo, hi in ((1, 2), (2, 3)):
            lo_max = max((round(r["perplexity"], 9) for r in rs
                          if r["bucket"] == lo), default=None)
            hi_min = min((round(r["perplexity"], 9) for r in rs
                          if r["bucket"] == hi), default=None)
            if lo_max is not None and hi_min is not None:
                assert lo_max <= hi_min, (lang, lo, hi)


def test_ccnet_small_language_no_div_zero(spark, tmp_path):
    """A language with < 3 scoreable docs: each doc its own bucket,
    and the dead ELSE branch must not divide by zero under ANSI."""
    from dagster_delta_spark.operators.textops import (
        ccnet_perplexity_buckets,
    )

    rows = [
        (1, f"{L1} {L1}", "xx", "web", 1),
        (2, f"{L2} {L3}", "xx", "web", 1),
        (3, "solo", "yy", "web", 1),  # 1 token -> no bigrams -> drops
    ]
    out = ccnet_perplexity_buckets(
        spark, _write_docs(spark, tmp_path, rows)).collect()
    assert sorted(r["bucket"] for r in out) == [1, 2]
    assert all(r["lang"] == "xx" for r in out)
