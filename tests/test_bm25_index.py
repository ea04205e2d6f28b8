"""CDC-maintained BM25 postings index (operators/incremental.py:
build_bm25_index / maintain_bm25_index / bm25_query_maintained) —
the fourth index family on the build/maintain/audit contract.

Contract under test: appends fold O(delta) (new docs tokenized, the
indexed corpus never re-tokenized), merge-on-read DELETE/UPDATE folds
through the row-level feed (postings AND length sentinels leave /
re-enter), copy-rewrites refuse, the maintained read path equals the
from-scratch ``bm25_search`` bit-for-bit over the same corpus, and
zero-token documents still shape N/avgdl via their sentinel rows.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.operators.incremental import (
    bm25_index_vs_rebuild,
    bm25_query_maintained,
    build_bm25_index,
    maintain_bm25_index,
)


def _docs_df(spark, ids):
    rows = [(int(i), " ".join(f"w{(i * 11 + j) % 40}" for j in range(12)))
            for i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk(spark, tmp_path, ids):
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    idx = DeltaSparkTable(spark, str(tmp_path / "idx"))
    docs.write(_docs_df(spark, ids), WriteMode.error)
    build_bm25_index(docs, idx)
    return docs, idx


def test_build_then_append_fold_matches_rebuild(spark, tmp_path):
    docs, idx = _mk(spark, tmp_path, range(20))
    n0 = idx.read().count()
    # one sentinel per doc; every doc here has 12 tokens
    assert idx.read().where("term = ''").count() == 20
    docs.write(_docs_df(spark, range(20, 30)), WriteMode.append)
    assert maintain_bm25_index(docs, idx) == docs.version()
    added = idx.read().where("doc_id >= 20")
    assert idx.read().count() - n0 == added.count()  # delta-only
    assert bm25_index_vs_rebuild(docs, idx).count() == 0
    # idempotent resume: nothing new -> no-op at same version
    assert maintain_bm25_index(docs, idx) == docs.version()


def test_dv_delete_and_update_fold(spark, tmp_path):
    docs, idx = _mk(spark, tmp_path, range(30))
    docs.delete("doc_id % 5 = 0", use_dv=True)
    docs.update({"text": "'replaced text tokens'"}, "doc_id = 7",
                use_dv=True)
    docs.write(_docs_df(spark, range(30, 35)), WriteMode.append)
    maintain_bm25_index(docs, idx)
    assert bm25_index_vs_rebuild(docs, idx).count() == 0
    ids = {r["doc_id"] for r in idx.read().select("doc_id").collect()}
    assert not {i for i in range(30) if i % 5 == 0} & ids  # no ghosts
    assert 7 in ids and 34 in ids
    # the updated doc re-tokenized: its postings are the new text's
    terms = {r["term"] for r in idx.read()
             .where("doc_id = 7 AND term <> ''").collect()}
    assert terms == {"replaced", "text", "tokens"}


def test_deletions_only_fold_advances_marker(spark, tmp_path):
    docs, idx = _mk(spark, tmp_path, range(10))
    docs.delete("doc_id < 3", use_dv=True)
    head = docs.version()
    assert maintain_bm25_index(docs, idx) == head
    assert bm25_index_vs_rebuild(docs, idx).count() == 0
    # resume advanced past the deletions-only delta (marker commit)
    assert maintain_bm25_index(docs, idx) == head


def test_rewrite_refuses(spark, tmp_path):
    docs, idx = _mk(spark, tmp_path, range(10))
    docs.write(_docs_df(spark, range(5)), WriteMode.overwrite)
    with pytest.raises(ValueError):
        maintain_bm25_index(docs, idx)


def test_query_parity_with_bm25_search(spark, tmp_path):
    from dagster_delta_spark.operators.textops import bm25_search

    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    idx = DeltaSparkTable(spark, str(tmp_path / "idx"))
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    # build 2/3 + maintain 1/3 so the PARITY check also covers a fold
    docs.write(src.where("doc_id % 3 < 2"), WriteMode.error)
    build_bm25_index(docs, idx)
    docs.write(src.where("doc_id % 3 = 2"), WriteMode.append)
    maintain_bm25_index(docs, idx)
    got = sorted(map(tuple, bm25_query_maintained(idx).collect()))
    want = sorted(map(tuple, bm25_search(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0


def test_zero_token_docs_shape_stats(spark, tmp_path):
    rows = [(0, "alpha beta alpha"), (1, "beta gamma"), (2, "!!! ???")]
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    idx = DeltaSparkTable(spark, str(tmp_path / "idx"))
    docs.write(
        spark.createDataFrame(rows, "doc_id long, text string"),
        WriteMode.error)
    build_bm25_index(docs, idx)
    # the zero-token doc carries ONLY its sentinel (dl = 0)
    d2 = idx.read().where("doc_id = 2").collect()
    assert [(r["term"], r["tf"], r["dl"]) for r in d2] == [("", 0, 0)]
    res = {(r["qid"], r["doc_id"]): r["score"]
           for r in bm25_query_maintained(
               idx, queries=[(1, "alpha")], top_k=10).collect()}
    assert set(res) == {(1, 0)}
    # N = 3 and avgdl = (3 + 2 + 0) / 3 feed the score: recompute the
    # closed form and compare (idf = ln(1 + (3 - 1 + 0.5) / 1.5))
    import math
    idf = math.log(1.0 + (3.0 - 1.0 + 0.5) / 1.5)
    avgdl = 5.0 / 3.0
    want = round(idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / avgdl)), 9)
    assert res[(1, 0)] == pytest.approx(want, abs=1e-9)


def test_hybrid_maintained_sparse_leg_parity(spark, tmp_path):
    """hybrid_search_maintained(bm25_index=...) == the same call
    without it, when the index covers the same corpus."""
    import numpy as np

    from dagster_delta_spark.operators.incremental import (
        build_ivf_index, build_pq_index, hybrid_search_maintained)

    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    ivf = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    pq = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb_src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding")
    emb.write(emb_src, WriteMode.error)
    build_ivf_index(emb, ivf)
    build_pq_index(emb, pq)
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    bm = DeltaSparkTable(spark, str(tmp_path / "bm"))
    docs.write(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"),
        WriteMode.error)
    build_bm25_index(docs, bm)
    kw = dict(n_queries=3, nprobe=10**9, rerank=10**9)
    a = sorted(map(tuple, hybrid_search_maintained(
        spark, SF_DIR, emb, ivf, pq, bm25_index=bm, **kw).collect()))
    b = sorted(map(tuple, hybrid_search_maintained(
        spark, SF_DIR, emb, ivf, pq, **kw).collect()))
    assert a == b and len(a) > 0


def test_insert_then_delete_same_window_nets_out(spark, tmp_path):
    """r13 review fix: one maintenance window spanning a doc's INSERT
    and its later DV delete must net out — deletions-first only
    protects docs already indexed; without per-id netting the
    superseded insert would fold in as a ghost posting."""
    docs, idx = _mk(spark, tmp_path, range(10))
    docs.write(_docs_df(spark, [77]), WriteMode.append)   # insert X
    docs.delete("doc_id = 77", use_dv=True)               # ...then kill X
    docs.write(_docs_df(spark, [88]), WriteMode.append)
    maintain_bm25_index(docs, idx)  # ONE window spans both
    ids = {r["doc_id"] for r in idx.read().select("doc_id").collect()}
    assert 77 not in ids and 88 in ids
    assert bm25_index_vs_rebuild(docs, idx).count() == 0


def test_insert_then_update_same_window_keeps_last(spark, tmp_path):
    docs, idx = _mk(spark, tmp_path, range(10))
    docs.write(_docs_df(spark, [55]), WriteMode.append)
    docs.update({"text": "'fresh words only'"}, "doc_id = 55",
                use_dv=True)
    maintain_bm25_index(docs, idx)
    rows = idx.read().where("doc_id = 55 AND term <> ''").collect()
    assert {r["term"] for r in rows} == {"fresh", "words", "only"}
    # exactly one sentinel — the superseded insert didn't double-fold
    assert idx.read().where("doc_id = 55 AND term = ''").count() == 1
    assert bm25_index_vs_rebuild(docs, idx).count() == 0


def test_streaming_bm25_index_sink(spark, tmp_path):
    """index_maintaining_sink(kind='bm25'): exactly-once streaming
    ingest with per-batch postings maintenance — the stored index
    always equals a from-scratch build, and a replayed final batch
    changes neither table nor index."""
    import os

    from dagster_delta_spark.streaming import index_maintaining_sink

    src = str(tmp_path / "land")
    os.makedirs(src)
    docs = _docs_df(spark, range(12))
    for i in range(3):
        docs.where(f"doc_id % 3 = {i}").coalesce(1).write.mode(
            "append").parquet(src)
    uri, idx_uri = str(tmp_path / "t"), str(tmp_path / "idx")
    sink = index_maintaining_sink(uri, idx_uri, "bm25-pipe",
                                  kind="bm25")
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    t = DeltaSparkTable(spark, uri)
    idx = DeltaSparkTable(spark, idx_uri)
    assert t.read().count() == 12
    assert bm25_index_vs_rebuild(t, idx).count() == 0
    last = t.last_txn_version("bm25-pipe")
    n, ni = t.read().count(), idx.read().count()
    sink(spark.read.parquet(src), last)  # post-crash replay
    assert t.read().count() == n and idx.read().count() == ni


def test_index_sink_unknown_kind_refuses(spark, tmp_path):
    from dagster_delta_spark.streaming import index_maintaining_sink

    with pytest.raises(ValueError, match="unknown index kind"):
        index_maintaining_sink("a", "b", "c", kind="ivf")


def test_index_sink_bm25_refuses_lsh_knobs(spark):
    from dagster_delta_spark.streaming import index_maintaining_sink

    with pytest.raises(ValueError, match="banding knobs"):
        index_maintaining_sink("a", "b", "c", kind="bm25",
                               num_hashes=128, bands=32)
