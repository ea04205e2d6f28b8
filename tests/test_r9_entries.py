"""r9 registry additions: Gopher quality rules, z-order entry guard,
and the drift-audit entry's self-falsifying guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from dagster_delta_spark.operators import textops


def _docs_dir(spark, tmp_path, rows):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, source string, text string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


GOOD = ("the quick brown fox jumps over the lazy dog and runs to the "
        "river in the morning light with friends that is a fine day "
        "for everyone involved here today")  # 32 words, stopword-rich


def test_gopher_rules_fire_individually(spark, tmp_path):
    rows = [
        (0, "a", GOOD),                                   # keeps
        (1, "a", "too short to pass"),                    # n_words < 20
        (2, "a", " ".join(["supercalifragilistic"] * 25)),  # mean len > 10
        (3, "a", "\n".join(["- " + GOOD] + ["- bullet line"] * 30)),
        (4, "a", "\n".join([GOOD] + [f"trailing {i} ..." for i in range(30)])),
        (5, "a", GOOD + " " + " ".join(["12345"] * 30)),  # alpha < 80%
        (6, "a", " ".join(["lorem ipsum dolor sit amet"] * 8)),  # stops < 2
        (7, "a", GOOD + " " + "# " * 10),                 # symbols > 10%
    ]
    d = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in
           textops.gopher_quality_filter(spark, d).collect()}
    assert got[0]["keep"] is True
    for i in range(1, 8):
        assert got[i]["keep"] is False, (i, got[i].asDict())
    # the specific counter each row was built to trip
    assert got[1]["n_words"] < 20
    assert got[3]["bullet_lines"] * 10 > 9 * got[3]["n_lines"]
    assert got[4]["ellipsis_lines"] * 10 > 3 * got[4]["n_lines"]
    assert got[5]["alpha_words"] * 5 < 4 * got[5]["n_words"]
    assert got[6]["stop_hits"] < 2
    assert got[7]["n_symbols"] * 10 > got[7]["n_words"]


def test_zorder_entry_guard_fires_without_layout_change(
        spark, tmp_path, monkeypatch):
    """The entry's in-line guard (skipping must tighten on BOTH
    columns) fires when the z-order rewrite is a no-op — proof the
    oracle-invisible layout property is actually enforced."""
    from dagster_delta_spark.table import DeltaSparkTable

    monkeypatch.setattr(
        DeltaSparkTable, "zorder",
        lambda self, *a, **kw: {"rewritten_files": 0})
    with pytest.raises(AssertionError, match="tighten data skipping"):
        entry.o_zorder_clustering(spark, "/root/testdata/sf0.001")
    monkeypatch.undo()
    # and the healthy path returns the full contents
    out = entry.o_zorder_clustering(spark, "/root/testdata/sf0.001")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert out.count() == li.count()


def test_drift_audit_entry_guards_fire(spark, monkeypatch):
    """Detection guard: an audit blinded to drift (zeroed metrics)
    must fail the entry; control guard: an audit that flags everything
    must fail too."""
    from dagster_delta_spark.operators import incremental

    real = incremental.index_drift_metrics

    monkeypatch.setattr(
        incremental, "index_drift_metrics",
        lambda drift: {**real(drift), "cohort_decay": 0.0,
                       "rebuild_gain": 0.0})
    with pytest.raises(AssertionError, match="failed to detect"):
        entry.ann_index_drift_audit(spark, "/root/testdata/sf0.001")
    monkeypatch.undo()

    monkeypatch.setattr(
        incremental, "index_drift_metrics",
        lambda drift: {**real(drift), "cohort_decay": 0.9,
                       "rebuild_gain": 0.9})
    with pytest.raises(AssertionError, match="false-alarmed"):
        entry.ann_index_drift_audit(spark, "/root/testdata/sf0.001")
    monkeypatch.undo()

    out = entry.ann_index_drift_audit(spark, "/root/testdata/sf0.001")
    assert {r["cohort"] for r in out.collect()} == {
        "bootstrap", "folded", "all", "all_retrained"}


def test_portable_ingest_filter_matches_production_structure(
        spark, tmp_path):
    """The portable (md5) signing path must keep the production
    pipeline's structural contract: every doc lands either in the LSH
    bands or the band=-1 pseudo-bucket, never both, never neither."""
    from dagster_delta_spark.streaming.ingest_dedup import (
        portable_doc_buckets,
    )

    docs = spark.createDataFrame(
        [(1, "one two three four five"), (2, "tiny"), (3, "")],
        "doc_id long, text string")
    b = portable_doc_buckets(docs, 8, 4).collect()
    by_doc = {}
    for r in b:
        by_doc.setdefault(r["doc_id"], set()).add(r["band"])
    assert by_doc[1] == {0, 1, 2, 3}
    assert by_doc[2] == {-1} and by_doc[3] == {-1}
    with pytest.raises(ValueError, match="divide"):
        portable_doc_buckets(docs, 8, 3)


def test_hybrid_rrf_fuses_both_legs(spark):
    """RRF membership and score law: every fused row's score must
    equal the recomputed 1/(60+rank) contributions of the two legs,
    the query doc itself never appears, and a doc ranked by BOTH legs
    outscores one ranked by a single leg at equal rank."""
    from dagster_delta_spark.operators import similarity, textops

    sf = "/root/testdata/sf0.001"
    out = similarity.hybrid_search_rrf(spark, sf, n_queries=3,
                                       inner_k=10, top_k=5)
    rows = out.collect()
    assert rows and all(r["q_id"] != r["doc_id"] for r in rows)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    qd = {r["doc_id"]: r["text"] for r in
          docs.where("doc_id < 3").collect()}
    sparse = {
        (r["qid"], r["doc_id"]): r["rank"]
        for r in textops.bm25_search(
            spark, sf, queries=sorted(qd.items()), top_k=10,
            exclude_qid_doc=True).collect()
    }
    dense = {
        (r["q_id"], r["vec_id"]): r["rank"]
        for r in similarity.cosine_topk(spark, sf, k=10,
                                        n_queries=3).collect()
    }
    for r in rows:
        key = (r["q_id"], r["doc_id"])
        expect = 0.0
        if key in sparse:
            expect += 1.0 / (60 + sparse[key])
        if key in dense:
            expect += 1.0 / (60 + dense[key])
        assert abs(r["rrf_score"] - round(expect, 9)) < 1e-12, (key, r)
        assert expect > 0.0  # fused rows come from at least one leg


def test_bm25_exclude_qid_doc(spark):
    from dagster_delta_spark.operators import textops

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    q = [(r["doc_id"], r["text"]) for r in docs.where("doc_id < 2").collect()]
    with_self = textops.bm25_search(spark, sf, queries=q, top_k=5)
    without = textops.bm25_search(spark, sf, queries=q, top_k=5,
                                  exclude_qid_doc=True)
    ws = {(r["qid"], r["doc_id"]) for r in with_self.collect()}
    wo = {(r["qid"], r["doc_id"]) for r in without.collect()}
    assert (0, 0) in ws and (1, 1) in ws   # a doc is its own best match
    assert all(q != d for q, d in wo)
