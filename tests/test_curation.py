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
