"""Merge-on-read DML folding into CDC-maintained indexes
(operators/incremental.py:_split_row_changes).

r8 contract: DV DELETE/UPDATE commits on the base no longer force an
index rebuild — the row-level change feed decodes them, deleted ids
leave the index (merge-on-read IN-list delete on the index itself),
updated vectors/docs re-enter, and the result is EXACTLY what a
from-scratch build over the same centroids/codebooks/banding would
produce.  Copy-rewrites still refuse.
"""

import numpy as np
import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.operators.incremental import (
    _apply_index_deletions,
    build_ivf_index,
    build_lsh_index,
    build_pq_index,
    ivf_index_vs_rebuild,
    lsh_index_vs_rebuild,
    maintain_ivf_index,
    maintain_lsh_index,
    maintain_pq_index,
    pq_index_vs_rebuild,
)


def _emb_df(spark, ids, d=8, seed=3):
    rng = np.random.default_rng(seed)
    rows = [(int(i), [float(v) for v in rng.normal(size=d)])
            for i in sorted(ids)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _docs_df(spark, ids):
    rows = [(int(i), " ".join(f"w{(i * 11 + j) % 40}" for j in range(12)))
            for i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ivf_folds_dv_delete_update_and_append(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    ivf = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(40), seed=1), WriteMode.error)
    build_ivf_index(emb, ivf, n_cells=4)
    emb.delete("vec_id % 5 = 0", use_dv=True)
    emb.write(_emb_df(spark, range(40, 55), seed=2), WriteMode.append)
    emb.update(
        {"embedding": "transform(embedding, x -> CAST(-x AS FLOAT))"},
        "vec_id = 7", use_dv=True)
    assert maintain_ivf_index(emb, ivf) == emb.version()
    assert ivf_index_vs_rebuild(emb, ivf).count() == 0
    ids = {r["vec_id"] for r in ivf.read().select("vec_id").collect()}
    assert not {i for i in range(40) if i % 5 == 0} & ids  # no ghosts
    assert 7 in ids and 54 in ids


def test_pq_folds_dv_delete_and_update_reencodes(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    pq = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb.write(_emb_df(spark, range(30), seed=1), WriteMode.error)
    build_pq_index(emb, pq, m=4, nbits=4)
    old7 = pq.read().where("vec_id = 7").collect()[0]["codes"]
    emb.delete("vec_id < 5", use_dv=True)
    emb.update(
        {"embedding": "transform(embedding, x -> CAST(-x AS FLOAT))"},
        "vec_id = 7", use_dv=True)
    maintain_pq_index(emb, pq)
    assert pq_index_vs_rebuild(emb, pq).count() == 0
    got = {r["vec_id"]: r["codes"] for r in pq.read().collect()}
    assert not set(range(5)) & set(got)
    assert got[7] != old7  # the negated vector re-encoded


def test_lsh_folds_dv_delete(spark, tmp_path):
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    lsh = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(30)), WriteMode.error)
    build_lsh_index(docs, lsh, num_hashes=16, bands=4)
    docs.delete("doc_id < 10", use_dv=True)
    maintain_lsh_index(docs, lsh)
    assert lsh_index_vs_rebuild(docs, lsh).count() == 0
    ids = {r["doc_id"] for r in lsh.read().select("doc_id").collect()}
    assert not set(range(10)) & ids


def test_deletions_only_fold_advances_and_is_idempotent(spark, tmp_path):
    """A delta containing ONLY deletions must still advance the stored
    base_version (via an empty marker commit) so resume never
    reprocesses the same range, and a re-run is a no-op."""
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    lsh = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(20)), WriteMode.error)
    build_lsh_index(docs, lsh, num_hashes=16, bands=4)
    docs.delete("doc_id = 15", use_dv=True)
    assert maintain_lsh_index(docs, lsh) == docs.version()
    v = lsh.version()
    assert maintain_lsh_index(docs, lsh) == docs.version()
    assert lsh.version() == v  # nothing recommitted
    assert lsh_index_vs_rebuild(docs, lsh).count() == 0


def test_crash_between_delete_and_append_refolds_cleanly(spark, tmp_path):
    """Deletions apply FIRST, the base_version marker lands LAST: a
    crash in between leaves the stored version unchanged, and the
    retry re-deletes (no-op) then appends exactly once."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    ivf = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(20), seed=1), WriteMode.error)
    build_ivf_index(emb, ivf, n_cells=4)
    emb.delete("vec_id < 4", use_dv=True)
    emb.write(_emb_df(spark, range(20, 26), seed=2), WriteMode.append)
    # simulate the crashed first half: deletions applied, no marker
    ins, dels = __import__(
        "dagster_delta_spark.operators.incremental", fromlist=["x"]
    )._split_row_changes(emb, 0, emb.version())
    _apply_index_deletions(ivf, dels.select("vec_id"), "vec_id")
    # the retry folds the full range again
    maintain_ivf_index(emb, ivf)
    assert ivf_index_vs_rebuild(emb, ivf).count() == 0
    assert ivf.read().select("vec_id").distinct().count() == 22
    assert ivf.read().count() == 22  # no double-fold


def test_large_delete_set_falls_back_to_anti_join(spark, tmp_path):
    """Past max_inlist the id set must NOT be rendered into a SQL
    IN-list (driver-side blowup) — one distributed anti-join rewrite
    instead, same end state."""
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    lsh = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(40)), WriteMode.error)
    build_lsh_index(docs, lsh, num_hashes=16, bands=4)
    dels = docs.read().where("doc_id >= 25").select("doc_id")
    assert _apply_index_deletions(lsh, dels, "doc_id", max_inlist=5)
    ids = {r["doc_id"] for r in lsh.read().select("doc_id").collect()}
    assert ids == set(range(25))


def test_copy_rewrite_dml_still_refuses(spark, tmp_path):
    """use_dv=False DELETE is a copy-rewrite — its re-added files are
    not decodable as row changes; maintenance must raise."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    ivf = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(20), seed=1).coalesce(1),
              WriteMode.error)
    build_ivf_index(emb, ivf, n_cells=4)
    emb.delete("vec_id >= 10 AND vec_id < 12")  # partial-file copy-rewrite
    with pytest.raises(ValueError, match="rewrite"):
        maintain_ivf_index(emb, ivf)
    build_ivf_index(emb, ivf, n_cells=4)  # prescribed recovery
    assert ivf_index_vs_rebuild(emb, ivf).count() == 0


def test_insert_then_delete_same_window_nets_out_all_families(
    spark, tmp_path
):
    """r13 review fix (shared _split_row_changes netting): a window
    spanning a vector's insert AND its DV delete must not fold the
    superseded insert into any index family."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    ivf = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    pq = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb.write(_emb_df(spark, range(30), seed=1), WriteMode.error)
    build_ivf_index(emb, ivf, n_cells=4)
    build_pq_index(emb, pq, m=4, nbits=4)
    emb.write(_emb_df(spark, range(30, 40), seed=2), WriteMode.append)
    emb.delete("vec_id >= 35", use_dv=True)  # kills half the insert
    maintain_ivf_index(emb, ivf)
    maintain_pq_index(emb, pq)
    assert ivf_index_vs_rebuild(emb, ivf).count() == 0
    assert pq_index_vs_rebuild(emb, pq).count() == 0
    ivf_ids = {r["vec_id"] for r in ivf.read().select("vec_id").collect()}
    assert not ivf_ids & set(range(35, 40)) and 34 in ivf_ids

    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    lsh = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(20)), WriteMode.error)
    build_lsh_index(docs, lsh)
    docs.write(_docs_df(spark, range(20, 26)), WriteMode.append)
    docs.delete("doc_id >= 23", use_dv=True)
    maintain_lsh_index(docs, lsh)
    assert lsh_index_vs_rebuild(docs, lsh).count() == 0


def test_duplicate_id_partial_delete_refuses(spark, tmp_path):
    """r14 unique-id contract (_verify_unique_id_contract): a base
    with DUPLICATE live rows per id where a DV delete masks only ONE
    of them must refuse the fold — silently evicting the surviving
    duplicate from the index is the failure mode the guard closes
    (previously only the vs_rebuild audits would catch it)."""
    # duplicates live in DIFFERENT files and the DV delete hits one
    # file's copy via a second distinguishing column, so id 7 keeps a
    # live row at head while the feed carries its delete
    emb2 = DeltaSparkTable(spark, str(tmp_path / "emb2"))
    ivf2 = DeltaSparkTable(spark, str(tmp_path / "ivf2"))
    rows1 = [(int(i), [float(i)] * 8, "a") for i in range(30)]
    rows2 = [(7, [99.0] * 8, "b")]  # duplicate vec_id 7, tag b
    sch = "vec_id long, embedding array<float>, tag string"
    emb2.write(spark.createDataFrame(rows1, sch).coalesce(1),
               WriteMode.append)
    build_ivf_index(emb2, ivf2, n_cells=3)
    emb2.write(spark.createDataFrame(rows2, sch).coalesce(1),
               WriteMode.append)
    emb2.delete("vec_id = 7 AND tag = 'a'", use_dv=True)
    with pytest.raises(ValueError, match="unique ids"):
        maintain_ivf_index(emb2, ivf2)
    # prescribed recovery: rebuild (multiplicity-aware from scratch)
    build_ivf_index(emb2, ivf2, n_cells=3)


def test_unique_id_guard_passes_normal_folds(spark, tmp_path):
    """The guard must NOT fire on the lawful shapes: pure DV delete,
    DV update, delete-then-reinsert in one window."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    ivf = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(40)).coalesce(1), WriteMode.append)
    build_ivf_index(emb, ivf, n_cells=4)
    emb.delete("vec_id = 3", use_dv=True)                 # pure delete
    emb.update({"embedding": "embedding"}, "vec_id = 5",
               use_dv=True)                               # DV update
    emb.delete("vec_id = 9", use_dv=True)
    emb.write(_emb_df(spark, [9], seed=5), WriteMode.append)  # reinsert
    assert maintain_ivf_index(emb, ivf) == emb.version()
    assert ivf_index_vs_rebuild(emb, ivf).count() == 0


def test_null_id_delete_refuses(spark, tmp_path):
    """r14 review fix: NULL ids never match the equi joins that
    remove index rows, so a DV delete touching a null-keyed row must
    refuse the fold rather than leave ghost index entries."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    ivf = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    rows = [(int(i), [float(i)] * 8) for i in range(30)]
    rows.append((None, [50.0] * 8))
    emb.write(spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").coalesce(1),
        WriteMode.append)
    build_ivf_index(emb, ivf, n_cells=3)
    emb.delete("vec_id IS NULL", use_dv=True)
    with pytest.raises(ValueError, match="non-null ids"):
        maintain_ivf_index(emb, ivf)
