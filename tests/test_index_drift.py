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
