"""r12 additions: the o_write_options W8/W9/W10 entry surface, the
timestamp dial in s3_time_travel, and the DoReMi-style domain-weight
solver.

The new entries' VALUE correctness is the driver's oracle gate
(tools/check_oracles.py); these tests pin the structural contracts the
gate can't see — validation surfaces, the excess-loss clip, weight
normalization under parameter sweeps, and the temperature ordering the
solver must respect.
"""

import math

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark.operators.curation import doremi_domain_weights
from dagster_delta_spark.operators.textops import (
    bigram_perplexity,
    doc_excess_loss,
)

SF = "/root/testdata/sf0.001"


def test_doc_excess_loss_clipped_and_rounded(spark):
    ex = doc_excess_loss(spark, SF).collect()
    assert len(ex) > 0
    for r in ex:
        assert r["excess"] >= 0.0, "excess loss must be clipped at 0"
        grid = r["excess"] * 1e9
        assert abs(grid - round(grid)) < 1e-3, (
            "excess must land on the rounded-9 grid")
    # same doc population as the bigram scorer (docs with < 2 tokens
    # drop from both)
    n_ppl = bigram_perplexity(spark, SF).count()
    assert len(ex) == n_ppl


def test_doremi_weights_are_a_distribution(spark):
    rows = doremi_domain_weights(spark, SF).collect()
    assert len(rows) > 1
    total = sum(r["weight"] for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-4)
    assert all(r["weight"] > 0 for r in rows), (
        "uniform smoothing must keep every domain's weight positive")
    assert all(r["n_docs"] > 0 for r in rows)


def test_doremi_upweights_higher_excess(spark):
    """The exponentiated-gradient average is monotone in the excess
    loss: a domain with strictly higher excess must never get a
    strictly lower weight (ties allowed at 6-decimal rounding)."""
    rows = doremi_domain_weights(spark, SF).collect()
    by_excess = sorted(rows, key=lambda r: r["excess_loss"])
    for a, b in zip(by_excess, by_excess[1:]):
        if b["excess_loss"] > a["excess_loss"]:
            assert b["weight"] >= a["weight"], (
                f"{b['source']} (excess {b['excess_loss']}) got weight "
                f"{b['weight']} < {a['source']}'s {a['weight']}")


def test_doremi_parameter_dials(spark):
    """smoothing=0 is the pure iterate average; larger eta sharpens
    toward the argmax domain; steps=1 equals one softmax step mixed
    with uniform.  Each still normalizes."""
    base = {r["source"]: r["weight"]
            for r in doremi_domain_weights(spark, SF).collect()}
    sharp = {r["source"]: r["weight"]
             for r in doremi_domain_weights(
                 spark, SF, eta=2.0, smoothing=0.0).collect()}
    assert math.isclose(sum(sharp.values()), 1.0, abs_tol=1e-4)
    top = max(base, key=base.get)
    assert sharp[top] >= base[top], (
        "raising eta must concentrate weight on the highest-excess "
        "domain")
    one = doremi_domain_weights(spark, SF, steps=1).collect()
    assert math.isclose(sum(r["weight"] for r in one), 1.0,
                        abs_tol=1e-4)


def test_doremi_validation_surface(spark):
    with pytest.raises(ValueError, match="eta"):
        doremi_domain_weights(spark, SF, eta=0.0)
    with pytest.raises(ValueError, match="steps"):
        doremi_domain_weights(spark, SF, steps=0)
    with pytest.raises(ValueError, match="smoothing"):
        doremi_domain_weights(spark, SF, smoothing=1.0)
    with pytest.raises(ValueError, match="lam"):
        doremi_domain_weights(spark, SF, lam=1.5)


def test_write_options_entry_contract(spark):
    """The o_write_options entry's echo columns come from the REAL
    table metadata: drop the zstd writer property and the all_zstd
    flag must flip (the closed-form oracle would then mismatch) —
    proving the flag measures the files, not the request."""
    import __spark_entry__ as entry
    from dagster_delta_spark import DeltaSparkTable, WriteMode

    t = DeltaSparkTable(spark, entry._scratch("wopt-test"))
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    t.write(orders.limit(50), WriteMode.error,
            commit_metadata={"userName": "John Doe"})
    snap = t.snapshot()
    assert not any(a.path.endswith(".zstd.parquet")
                   for a in snap.files), (
        "snappy default write must NOT produce zstd-suffixed files")
    hist = t.history()
    assert (hist[0].get("userMetadata") or {})["userName"] == "John Doe"


def test_portable_pca_deterministic_on_flat_spectrum(spark):
    """On the (near-isotropic) synthetic embeddings, eigenvectors are
    numerically ill-defined for ANY method — what the oracle
    conversion rests on is that a re-run of the portable iteration is
    BIT-identical and on the rounded-9 grid."""
    from dagster_delta_spark.operators.similarity import (
        portable_pca_project,
    )

    rows1 = sorted(
        portable_pca_project(spark, SF, k=2, iters=8).collect(),
        key=lambda r: r["vec_id"])
    rows2 = sorted(
        portable_pca_project(spark, SF, k=2, iters=8).collect(),
        key=lambda r: r["vec_id"])
    assert [tuple(r["proj"]) for r in rows1] == [
        tuple(r["proj"]) for r in rows2]
    for r in rows1[:50]:
        for x in r["proj"]:
            grid = x * 1e9
            assert abs(grid - round(grid)) < 1e-3


def test_portable_pca_converges_on_spiked_spectrum(spark):
    """Where the spectrum HAS a gap, the portable power iteration must
    find the real principal axes: a corpus spiked along e0 (strong)
    and e1 (weaker) over small isotropic noise must project with
    component 0 ≈ ±x[0]-centered and component 1 ≈ ±x[1]-centered
    (|corr| > 0.99 against the planted axes)."""
    import numpy as np

    from dagster_delta_spark.operators.similarity import (
        _portable_pca_project_frame,
    )

    rng = np.random.default_rng(7)
    d, n = 16, 300
    rows = []
    for i in range(n):
        x = rng.normal(scale=0.05, size=d)
        x[0] += rng.normal(scale=1.0)    # dominant axis
        x[1] += rng.normal(scale=0.45)   # second axis
        rows.append((i, [float(v) for v in x]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["proj"]
        for r in _portable_pca_project_frame(emb, k=2, iters=8).collect()
    }
    raw = np.array([rows[i][1] for i in range(n)], dtype=np.float64)
    cen = raw - raw.mean(axis=0)
    for c in range(2):
        a = np.array([got[i][c] for i in range(n)])
        b = cen[:, c]
        corr = abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert corr > 0.99, (
            f"portable component {c} missed the planted axis "
            f"({corr:.4f})")


def test_portable_pca_validation(spark):
    from dagster_delta_spark.operators.similarity import (
        portable_pca_project,
    )

    with pytest.raises(ValueError, match="k="):
        portable_pca_project(spark, SF, k=0)
    with pytest.raises(ValueError, match="iters"):
        portable_pca_project(spark, SF, iters=0)


def test_selective_token_mask_exact_cutoff(spark):
    """RHO-1 mask: selection is the EXACT global top fraction in
    (excess DESC, doc_id, pos) order — every selected row's excess is
    >= every unselected row's (the value cutoff), the count is
    floor(keep_frac*N) exactly, and boundary ties resolve by the
    deterministic (doc_id, pos) order."""
    from dagster_delta_spark.operators.textops import (
        selective_token_mask,
    )

    rows = selective_token_mask(spark, SF, keep_frac=0.25).collect()
    n = len(rows)
    n_pos = sum(1 for r in rows if r["excess"] > 0)
    sel = [r for r in rows if r["selected"]]
    unsel = [r for r in rows if not r["selected"]]
    # exact decimal cutoff, capped by the positive-excess population
    assert len(sel) == min(n * 25 // 100, n_pos)
    # value cutoff: a boundary tie resolves by (doc_id, pos), so the
    # boundary value may appear on both sides — never a strictly
    # smaller value selected over a larger one
    assert min(r["excess"] for r in sel) >= max(
        (r["excess"] for r in unsel), default=float("-inf"))
    # full keep selects every POSITIVE position; zero-excess never
    allsel = selective_token_mask(spark, SF, keep_frac=1.0).collect()
    assert all(r["selected"] == (r["excess"] > 0) for r in allsel)
    # the 0.3 regression (binary 0.3*N floors one short of the exact
    # decimal cutoff whenever N is a multiple of 10)
    r30 = selective_token_mask(spark, SF, keep_frac=0.3).collect()
    k30 = sum(1 for r in r30 if r["selected"])
    assert k30 == min(len(r30) * 3 // 10, n_pos)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="keep_frac"):
        selective_token_mask(spark, SF, keep_frac=0.0)
    with _pytest.raises(ValueError, match="lam"):
        selective_token_mask(spark, SF, lam=-0.1)
