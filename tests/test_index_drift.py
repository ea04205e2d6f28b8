"""Drift audits for the CDC-maintained ANN indexes (r9).

``ivf_index_vs_rebuild`` proves a fold is FAITHFUL to the stored
model; these audits measure whether the stored model is still any
GOOD: assignment cosine (IVF) / reconstruction cosine (PQ) by
bootstrap-vs-folded cohort, plus what freshly retrained parameters
would buy — the evidence behind the periodic-rebuild cadence.
"""

import numpy as np
import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.operators.incremental import (
    build_ivf_index,
    build_pq_index,
    index_drift_metrics,
    ivf_index_drift,
    maintain_ivf_index,
    maintain_pq_index,
    pq_index_drift,
)


def _clustered(spark, ids, anchors, d=16, seed=0, spread=0.05):
    """Vectors tightly packed around the given anchor directions —
    a controllable distribution for drift scenarios."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in ids:
        a = np.asarray(anchors[i % len(anchors)], dtype=float)
        v = a / np.linalg.norm(a) + rng.normal(scale=spread, size=d)
        rows.append((int(i), [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _axes(d, dims):
    out = []
    for dim in dims:
        a = [0.0] * d
        a[dim] = 1.0
        out.append(a)
    return out


def test_ivf_drift_detects_distribution_shift(spark, tmp_path):
    """Bootstrap on clusters along axes 0/1; fold a cohort living on
    axes 8/9 the stored centroids never saw.  The audit must localize
    the decay to the folded cohort and price the rebuild positive —
    while the faithfulness audit (vs_rebuild) stays green, because the
    fold IS faithful to the (now-stale) centroids."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    d = 16
    emb.write(_clustered(spark, range(60), _axes(d, [0, 1]), d, seed=1),
              WriteMode.error)
    build_ivf_index(emb, index, n_cells=4, iters=4)
    emb.write(
        _clustered(spark, range(60, 120), _axes(d, [8, 9]), d, seed=2),
        WriteMode.append)
    maintain_ivf_index(emb, index)
    m = index_drift_metrics(ivf_index_drift(emb, index, iters=4))
    assert m["n_bootstrap"] == 60 and m["n_folded"] == 60
    assert m["cohort_decay"] > 0.2      # folded data fits much worse
    assert m["rebuild_gain"] > 0.05     # retraining visibly pays


def test_ivf_same_distribution_fold_shows_no_drift(spark, tmp_path):
    """Control: folding more data from the SAME distribution must not
    trip the thresholds — the audit is a signal, not a false alarm."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    d = 16
    anchors = _axes(d, [0, 1, 2, 3])
    emb.write(_clustered(spark, range(80), anchors, d, seed=3),
              WriteMode.error)
    build_ivf_index(emb, index, n_cells=4, iters=4)
    emb.write(_clustered(spark, range(80, 160), anchors, d, seed=4),
              WriteMode.append)
    maintain_ivf_index(emb, index)
    m = index_drift_metrics(ivf_index_drift(emb, index, iters=4))
    assert abs(m["cohort_decay"]) < 0.05
    assert m["rebuild_gain"] < 0.02


def test_pq_drift_detects_distribution_shift(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "pq"))
    d = 16
    emb.write(_clustered(spark, range(60), _axes(d, [0, 1]), d, seed=5),
              WriteMode.error)
    build_pq_index(emb, index, m=4, nbits=3)
    emb.write(
        _clustered(spark, range(60, 120), _axes(d, [8, 9]), d, seed=6),
        WriteMode.append)
    maintain_pq_index(emb, index)
    m = index_drift_metrics(pq_index_drift(emb, index))
    assert m["n_bootstrap"] == 60 and m["n_folded"] == 60
    assert m["cohort_decay"] > 0.05
    assert m["rebuild_gain"] > 0.02


def test_drift_audit_refuses_foreign_index(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    index.write(spark.createDataFrame(
        [(1, 1)], "vec_id long, cell int"), WriteMode.error)
    with pytest.raises(ValueError, match="base_version"):
        ivf_index_drift(emb, index)


def test_drift_audit_survives_index_compaction_and_vacuum(spark, tmp_path):
    """r9 review fix: cohorts derive from the BASE table's history, so
    housekeeping (optimize + vacuum) on the INDEX table — which
    destroys its original version-0 files — must not break the audit."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    d = 16
    emb.write(
        _clustered(spark, range(60), _axes(d, [0, 1]), d, seed=9)
        .repartition(4),
        WriteMode.error)
    build_ivf_index(emb, index, n_cells=4, iters=4)
    emb.write(
        _clustered(spark, range(60, 120), _axes(d, [8, 9]), d, seed=10),
        WriteMode.append)
    maintain_ivf_index(emb, index)
    index.optimize(target_file_size=1 << 20)   # rewrites v0's files
    assert index.vacuum(retention_ms=0)        # reclaims the originals
    m = index_drift_metrics(ivf_index_drift(emb, index, iters=4))
    assert m["n_bootstrap"] == 60 and m["n_folded"] == 60
    assert m["cohort_decay"] > 0.2 and m["rebuild_gain"] > 0.05


def test_drift_audit_points_at_vacuumed_base_history(spark, tmp_path):
    """When the BASE table's bootstrap-era files are gone, the audit
    must fail with the rebuild recovery, not a raw executor error."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    d = 16
    emb.write(_clustered(spark, range(40), _axes(d, [0, 1]), d, seed=11),
              WriteMode.error)
    build_ivf_index(emb, index, n_cells=4, iters=4)
    emb.write(_clustered(spark, range(40, 80), _axes(d, [0, 1]), d,
                         seed=12), WriteMode.append)
    maintain_ivf_index(emb, index)
    emb.optimize(target_file_size=1 << 20)
    emb.vacuum(retention_ms=0)  # bootstrap-era base files gone
    with pytest.raises(ValueError, match="vacuumed"):
        ivf_index_drift(emb, index, iters=4)


def test_pq_recon_scores_pin_the_production_encoder(spark, tmp_path):
    """r9 review pin: _pq_recon_scores re-derives nearest codewords
    with the same math as similarity._pq_encode; if either side's
    tie-break, dtype, or normalization changes without the other, the
    audit would score a different encoder than the one that produced
    the stored codes.  Reconstructing from _pq_encode's OWN codes must
    give bit-identical cosines."""
    import numpy as np

    from dagster_delta_spark.operators.incremental import _pq_recon_scores
    from dagster_delta_spark.operators.similarity import (
        _learn_pq_codebooks,
        _pq_encode,
        _with_norm,
    )

    rng = np.random.default_rng(21)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(64)],
        "vec_id long, embedding array<float>")
    normed = _with_norm(vecs)
    cb = _learn_pq_codebooks(
        np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  / r["norm"] for r in normed.collect()]),
        m=4, nbits=3)
    audit = {r["vec_id"]: r["cos"]
             for r in _pq_recon_scores(normed, cb).collect()}
    codes = {r["vec_id"]: list(r["codes"])
             for r in _pq_encode(normed, cb).collect()}
    raw = {r["vec_id"]: (np.asarray(r["embedding"], dtype=np.float64),
                         r["norm"]) for r in normed.collect()}
    for vid, cs in codes.items():
        recon = np.concatenate([cb[j][c] for j, c in enumerate(cs)])
        x = raw[vid][0] / raw[vid][1]
        want = float(x @ recon / np.sqrt(recon @ recon))
        # 1e-9 pins CODEWORD IDENTITY (a different codeword moves the
        # cosine by orders of magnitude more) while allowing float
        # summation-order reassociation between the batched and the
        # per-vector dot product
        assert abs(audit[vid] - want) < 1e-9, vid


def test_audit_every_cadence_records_metrics(spark, tmp_path):
    """maintain_ivf_index(audit_every=2): fold 1 records no audit,
    fold 2 records one — the SCALE.md cadence is executable, and the
    recorded scalars match a directly-run audit."""
    from dagster_delta_spark.operators.incremental import last_drift_audit

    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    d = 16
    anchors = _axes(d, [0, 1])
    emb.write(_clustered(spark, range(40), anchors, d, seed=7),
              WriteMode.error)
    build_ivf_index(emb, index, n_cells=4, iters=4)
    assert last_drift_audit(index) is None

    emb.write(_clustered(spark, range(40, 60), anchors, d, seed=8),
              WriteMode.append)
    maintain_ivf_index(emb, index, audit_every=2)   # fold 1: no audit
    assert last_drift_audit(index) is None

    emb.write(_clustered(spark, range(60, 80), anchors, d, seed=9),
              WriteMode.append)
    maintain_ivf_index(emb, index, audit_every=2)   # fold 2: audits
    rec = last_drift_audit(index)
    assert rec is not None and rec["kind"] == "ivf"
    assert rec["fold_idx"] == 2
    assert rec["audited_version"] == emb.version()
    # same-distribution folds: the recorded scalars sit inside the
    # SCALE.md "no rebuild" region
    assert abs(rec["cohort_decay"]) < 0.05
    assert rec["rebuild_gain"] < 0.02
    # the audit commit must not disturb maintenance resume: a further
    # fold still applies exactly its own delta
    emb.write(_clustered(spark, range(80, 90), anchors, d, seed=10),
              WriteMode.append)
    maintain_ivf_index(emb, index, audit_every=2)
    assert index.read().count() == 90


def test_audit_every_pq_and_marker_path(spark, tmp_path):
    """The PQ maintainer shares the cadence; a deletions-only fold
    (marker advance) counts as a fold and can trigger the audit."""
    from dagster_delta_spark.operators.incremental import last_drift_audit

    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "pq"))
    d = 16
    anchors = _axes(d, [0, 1])
    emb.write(_clustered(spark, range(40), anchors, d, seed=11),
              WriteMode.error)
    build_pq_index(emb, index, m=4, nbits=3)
    # deletions-only delta: DV-delete a few rows, no inserts
    emb.delete("vec_id < 3", use_dv=True)
    maintain_pq_index(emb, index, audit_every=1)
    rec = last_drift_audit(index)
    assert rec is not None and rec["kind"] == "pq"
    assert rec["fold_idx"] == 1
    assert index.read().where("vec_id < 3").count() == 0


def test_ivf_drift_resumes_portable_family(spark, tmp_path):
    """r12: the drift audit resumes the index's recorded assignment
    family.  On a portable-built index every per-vector score is the
    ordered-fold cosine rounded to 9 decimals, so the frame's min_cos
    lands exactly on the 1e-9 grid, the mean accumulates in
    DECIMAL(20,9) (order-independent), and a re-run is bit-identical
    — the property the entry's DuckDB twin relies on."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    d = 16
    emb.write(_clustered(spark, range(40), _axes(d, [0, 1]), d, seed=3),
              WriteMode.error)
    build_ivf_index(emb, index, n_cells=4, iters=1,
                    assignment="portable")
    emb.write(_clustered(spark, range(40, 60), _axes(d, [0, 1]), d,
                         seed=4), WriteMode.append)
    maintain_ivf_index(emb, index)

    rows1 = sorted(ivf_index_drift(emb, index, iters=1).collect(),
                   key=lambda r: r["cohort"])
    rows2 = sorted(ivf_index_drift(emb, index, iters=1).collect(),
                   key=lambda r: r["cohort"])
    assert [r.asDict() for r in rows1] == [r.asDict() for r in rows2]
    assert {r["cohort"] for r in rows1} == {
        "bootstrap", "folded", "all", "all_retrained"}
    for r in rows1:
        grid = r["min_cos"] * 1e9
        assert abs(grid - round(grid)) < 1e-3, (
            f"{r['cohort']} min_cos {r['min_cos']} not on the "
            "rounded-9 grid — portable scoring not in effect")
    # metrics helper still reads the decimal-exact means
    m = index_drift_metrics(ivf_index_drift(emb, index, iters=1))
    assert abs(m["cohort_decay"]) < 0.2 and m["n_folded"] == 20


def test_ivf_drift_portable_refuses_sampling_dial(spark, tmp_path):
    """r12 review fix: the portable family trains full-corpus by
    definition (its oracle twin replays every row) — a non-default
    train_sample_mod must refuse pointedly, not silently drop."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    d = 16
    emb.write(_clustered(spark, range(30), _axes(d, [0, 1]), d, seed=5),
              WriteMode.error)
    build_ivf_index(emb, index, n_cells=4, iters=1,
                    assignment="portable")
    with pytest.raises(ValueError, match="train_sample_mod"):
        ivf_index_drift(emb, index, iters=1, train_sample_mod=4)
