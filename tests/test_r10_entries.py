"""r10 additions: the portable-hash oracle dials for the batch LSH
family, merge-with-identity, and hybrid retrieval over the maintained
IVF+PQ indexes.

The portable (md5) dials' VALUE correctness is the driver's oracle
gate (tools/check_oracles.py); these tests pin the structural
contracts the gate can't see — the dial preserves detection behavior,
the two hash families never alias in the session caches, and the
maintained-index hybrid equals the exact form at full dials.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.operators import dedup, incremental, similarity


def test_portable_minhash_recovers_planted_duplicate(spark, tmp_path):
    """The md5 dial must detect exactly like production on the planted
    exact duplicate (identical signature -> collides in EVERY band),
    and the two dials' signatures must NOT collide with each other
    (different hash families, same structure)."""
    d, orig, planted = entry._planted_dup_docs(
        spark, "/root/testdata/sf0.001")
    for portable in (False, True):
        found = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_lsh_near_dups(
                spark, d, threshold=0.9, portable_hash=portable).collect()
        }
        assert (orig, planted) in found, f"portable={portable}"
    sig_xx = dedup.minhash_signatures(spark, d, 8).collect()
    sig_md5 = dedup.minhash_signatures(
        spark, d, 8, portable_hash=True).collect()
    xx = {r["doc_id"]: r["sig"] for r in sig_xx}
    md5 = {r["doc_id"]: r["sig"] for r in sig_md5}
    assert set(xx) == set(md5)          # same docs signed
    assert xx[orig] != md5[orig]        # families actually differ
    # and the planted dup's signature equals its original's UNDER BOTH
    assert xx[orig] == xx[planted] and md5[orig] == md5[planted]


def test_portable_hyperplane_dial_detects_and_differs(spark, tmp_path):
    """Same contract for the embedding family: the planted exact copy
    is rank-1 under the portable dial too, and portable buckets
    differ from production buckets (no cache aliasing)."""
    d, orig, planted = entry._planted_dup_embeddings(
        spark, "/root/testdata/sf0.001")
    top1 = {
        r["q_id"]: r["vec_id"]
        for r in similarity.lsh_ann_topk(
            spark, d, n_queries=orig + 1, portable_hash=True)
        .where(F.col("rank") == 1).collect()
    }
    assert top1.get(orig) == planted
    bx = {r["vec_id"]: r["buckets"]
          for r in similarity.lsh_signatures(spark, d).collect()}
    bm = {r["vec_id"]: r["buckets"]
          for r in similarity.lsh_signatures(
              spark, d, portable_hash=True).collect()}
    assert set(bx) == set(bm)
    assert any(bx[v] != bm[v] for v in bx)  # families differ somewhere
    assert bm[orig] == bm[planted]          # exact copy: same buckets


def _indexed_fixture(spark, sf_dir):
    import tempfile

    base = tempfile.mkdtemp(prefix="dds-hyb-")
    emb_src = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    emb = DeltaSparkTable(spark, base + "/emb")
    ivf = DeltaSparkTable(spark, base + "/ivf")
    pq = DeltaSparkTable(spark, base + "/pq")
    emb.write(emb_src.where("vec_id % 3 < 2"), WriteMode.error)
    incremental.build_ivf_index(emb, ivf)
    incremental.build_pq_index(emb, pq)
    emb.write(emb_src.where("vec_id % 3 = 2"), WriteMode.append)
    incremental.maintain_ivf_index(emb, ivf)
    incremental.maintain_pq_index(emb, pq)
    return emb, ivf, pq


def test_hybrid_maintained_full_dials_equal_exact_form(spark):
    """With nprobe/rerank covering the corpus the maintained-index
    dense leg is exact, so the fused output must equal the
    oracle-backed exact form bit-for-bit (shared _rrf_fuse epilogue +
    shared tie-breaks) — the production path and the oracle-backed
    form can never drift."""
    sf = "/root/testdata/sf0.001"
    emb, ivf, pq = _indexed_fixture(spark, sf)
    exact = {(r["q_id"], r["rank"]): (r["doc_id"], r["rrf_score"])
             for r in similarity.hybrid_search_rrf(spark, sf).collect()}
    full = {(r["q_id"], r["rank"]): (r["doc_id"], r["rrf_score"])
            for r in incremental.hybrid_search_maintained(
                spark, sf, emb, ivf, pq,
                nprobe=10**9, rerank=10**9).collect()}
    assert full == exact


def test_hybrid_maintained_production_dials_sane(spark):
    """Default (approximate) dials: per-query ranks are 1..k dense,
    scores are valid RRF sums, and the sparse leg guarantees every
    query still returns rows even if the dense probe misses."""
    sf = "/root/testdata/sf0.001"
    emb, ivf, pq = _indexed_fixture(spark, sf)
    out = incremental.hybrid_search_maintained(
        spark, sf, emb, ivf, pq).collect()
    assert out
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
        assert 0 < r["rrf_score"] <= 2.0 / 61  # two legs, best rank 1
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)), q


def test_identity_merge_entry_guard_fires_on_sparse_allocation(
        spark, monkeypatch):
    """o_identity_merge's in-entry guard (rid set must be exactly
    1..N) fires when allocation skips values — proven by breaking the
    allocator to leave a gap."""
    import dagster_delta_spark.table as tmod

    real = tmod._assign_identity

    def gappy(df, col, spec, configuration):
        out, assumed, new_next = real(df, col, spec, configuration)
        # leave a hole above the real allocation
        return out.withColumn(
            col, F.col(col) + F.lit(5)), assumed, new_next + 5

    monkeypatch.setattr(tmod, "_assign_identity", gappy)
    with pytest.raises(AssertionError, match="density"):
        entry.o_identity_merge(spark, "/root/testdata/sf0.001")


def test_signature_plan_change_is_bit_identical(spark):
    """The r10 explode+regroup signing plan must produce EXACTLY the
    former 64-separate-aggregates plan's signatures (xxhash64 of an
    INT column == the same INT literal) — the persisted ingest bucket
    state depends on it."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    stream = dedup.shingles_of(docs).localCheckpoint()
    new = {r["doc_id"]: r["sig"]
           for r in dedup._signatures_from_stream(stream, 8).collect()}
    ex = stream.select("doc_id", F.xxhash64("sh").alias("h0"))
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("h0"))).alias(f"h{i}")
            for i in range(8)]
    old = {
        r["doc_id"]: [r[f"h{i}"] for i in range(8)]
        for r in ex.groupBy("doc_id").agg(*aggs).collect()
    }
    assert new == old and new
