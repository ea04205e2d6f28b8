"""Misra-Gries heavy hitters + exact verify pass (textops)."""

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark.operators.textops import heavy_hitter_tokens


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite").parquet(d + "/documents.parquet")
    return d


def test_planted_heavy_hitter_survives_mg_decrements(spark, tmp_path):
    """Vocabulary far above the 4k summary cap forces real MG
    decrements; the planted ~20%-frequency token must still come back
    with its EXACT count."""
    k = 4  # cap = 16 counters; vocab below is ~2000 tokens
    rows = []
    for i in range(500):
        rare = " ".join(f"rare{i}x{j}" for j in range(4))
        rows.append((i, f"heavy {rare}"))
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["token"]: r["cnt"]
           for r in heavy_hitter_tokens(spark, sf, k=k).collect()}
    # 'heavy' appears 500 times of 2500 tokens = 20% > 1/4? no: 1/4 of
    # 2500 is 625 > 500 — use the actual threshold: > n/k
    # (k=4 -> 625). So assert against k=8 instead.
    out8 = {r["token"]: r["cnt"]
            for r in heavy_hitter_tokens(spark, sf, k=8).collect()}
    assert out8 == {"heavy": 500}
    assert out == {}  # 500 <= 2500/4: correctly NOT a hitter at k=4


def test_matches_exact_computation(spark, tmp_path):
    """Skewed corpus with vocab > cap: operator output must equal the
    brute-force exact answer."""
    k = 4
    rows = []
    for i in range(400):
        parts = ["alpha"]  # ~1/3 of all tokens
        if i % 2 == 0:
            parts.append("beta")  # ~1/6
        parts.append(f"tail{i % 200}")  # long tail, vocab 200 > cap 16
        rows.append((i, " ".join(parts)))
    sf = _write_docs(spark, tmp_path, rows)
    got = {(r["token"], r["cnt"])
           for r in heavy_hitter_tokens(spark, sf, k=k).collect()}
    docs = spark.read.parquet(sf + "/documents.parquet")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    n = toks.count()
    want = {
        (r["token"], r["cnt"])
        for r in toks.groupBy("token").agg(
            F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > n / k).collect()
    }
    assert got == want and len(want) >= 1
