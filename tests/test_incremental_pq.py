"""Incremental PQ code-index maintenance over CDC
(operators/incremental.py) — the third index family on the
build/maintain/audit contract.  Appends encode ONLY the new vectors
against the stored codebooks; the result is exactly the code table a
from-scratch encode would produce (``pq_index_vs_rebuild`` empty);
rewrites refuse."""

import numpy as np
import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.operators.incremental import (
    build_pq_index,
    maintain_pq_index,
    pq_index_vs_rebuild,
)


def _emb_df(spark, ids, d=8, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(v) for v in rng.normal(size=d)])
        for i in sorted(ids)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_incremental_pq_equals_rebuild(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb.write(_emb_df(spark, range(40), seed=1), WriteMode.error)
    assert build_pq_index(emb, index, m=4, nbits=3) == 0
    emb.write(_emb_df(spark, range(40, 70), seed=2), WriteMode.append)
    assert maintain_pq_index(emb, index) == 1
    emb.write(_emb_df(spark, range(70, 90), seed=4), WriteMode.append)
    assert maintain_pq_index(emb, index) == 2
    out = index.read()
    assert out.count() == 90
    assert out.select("vec_id").distinct().count() == 90
    # every code is m int8 indexes within [0, 2**nbits)
    from pyspark.sql import functions as F

    bad = out.where(
        (F.size("codes") != 4)
        | F.exists("codes", lambda c: (c < 0) | (c > 7))
    ).count()
    assert bad == 0
    assert pq_index_vs_rebuild(emb, index).count() == 0


def test_pq_maintain_noop_and_rewrite_refusal(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb.write(_emb_df(spark, range(20)), WriteMode.error)
    build_pq_index(emb, index, m=4, nbits=2)
    iv = index.version()
    assert maintain_pq_index(emb, index) == 0
    assert index.version() == iv
    emb.write(_emb_df(spark, range(10), seed=9), WriteMode.overwrite)
    with pytest.raises(ValueError):
        maintain_pq_index(emb, index)


def test_pq_audit_catches_tampered_codes(spark, tmp_path):
    """Corrupt one stored code row — the audit must surface exactly
    that vec_id (a passing audit that cannot fail certifies
    nothing)."""
    from pyspark.sql import functions as F

    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb.write(_emb_df(spark, range(30)), WriteMode.error)
    build_pq_index(emb, index, m=4, nbits=2)
    tampered = index.read().withColumn(
        "codes",
        F.when(F.col("vec_id") == 7,
               F.expr("transform(codes, c -> CAST((c + 1) % 4 AS TINYINT))"))
        .otherwise(F.col("codes")),
    )
    index.write(tampered, WriteMode.overwrite,
                commit_metadata={"base_version": "0"})
    diffs = pq_index_vs_rebuild(emb, index).collect()
    assert [r["vec_id"] for r in diffs] == [7]


def test_pq_build_validates_subspaces(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb.write(_emb_df(spark, range(10), d=8), WriteMode.error)
    with pytest.raises(ValueError, match="not divisible"):
        build_pq_index(emb, index, m=3)


def test_pq_maintain_requires_build_metadata(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb.write(_emb_df(spark, range(10)), WriteMode.error)
    index.write(_emb_df(spark, range(3)))  # not built by build_pq_index
    with pytest.raises(ValueError, match="base_version"):
        maintain_pq_index(emb, index)


def test_pq_index_maintain_entry_guard_fires(spark, monkeypatch):
    """The rows-only registry entry falsifies: a maintenance path that
    corrupts one code row trips the rebuild-parity guard."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dagster_delta_spark.operators import incremental as incr

    sf = "/root/testdata/sf0.001"
    entry.pq_index_maintain(spark, sf)  # healthy

    real = incr.maintain_pq_index

    def tampering(emb, index, since_version=None):
        v = real(emb, index, since_version)  # raises on rewrites as-is
        bad = index.read().withColumn(
            "codes",
            F.when(F.col("vec_id") == 0,
                   F.expr("transform(codes, "
                          "c -> CAST((c + 1) % 16 AS TINYINT))"))
            .otherwise(F.col("codes")),
        )
        index.write(bad, WriteMode.overwrite,
                    commit_metadata={"base_version": "1"})
        return v

    monkeypatch.setattr(incr, "maintain_pq_index", tampering)
    with pytest.raises(AssertionError, match="diverged"):
        entry.pq_index_maintain(spark, sf)


def test_index_housekeeping_survives_maintenance(spark, tmp_path):
    """OPTIMIZE on the index table writes a commit WITHOUT
    base_version metadata — resume must walk past it to the newest
    maintenance commit instead of stranding the index (regression:
    _resume_version read only history(1))."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb.write(_emb_df(spark, range(20), seed=1), WriteMode.error)
    build_pq_index(emb, index, m=4, nbits=2)
    emb.write(_emb_df(spark, range(20, 30), seed=2), WriteMode.append)
    maintain_pq_index(emb, index)
    index.optimize()  # housekeeping commit, no base_version metadata
    emb.write(_emb_df(spark, range(30, 40), seed=4), WriteMode.append)
    assert maintain_pq_index(emb, index) == 2
    assert index.read().count() == 40
    assert pq_index_vs_rebuild(emb, index).count() == 0


def test_ann_query_maintained_full_rerank_is_exact(spark, tmp_path):
    """With rerank covering the probed population, the maintained-
    index ADC query equals exact cosine over the probed cells' stored
    members — and results change ONLY in shortlist membership at
    small rerank (every reported score is exact)."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.operators.incremental import (
        ann_query_maintained,
        build_ivf_index,
        maintain_ivf_index,
    )
    from dagster_delta_spark.operators.similarity import (
        DOT,
        _probe_cells_for,
        _topk,
        _with_norm,
    )

    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    ivf = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    pq = DeltaSparkTable(spark, str(tmp_path / "pq"))
    emb.write(_emb_df(spark, range(60), seed=1), WriteMode.error)
    build_ivf_index(emb, ivf, n_cells=4)
    build_pq_index(emb, pq, m=4, nbits=3)
    emb.write(_emb_df(spark, range(60, 90), seed=2), WriteMode.append)
    maintain_ivf_index(emb, ivf)
    maintain_pq_index(emb, pq)

    full = {(r["q_id"], r["rank"]): r["vec_id"]
            for r in ann_query_maintained(
                emb, ivf, pq, k=3, n_queries=3, nprobe=2,
                rerank=10**9).collect()}
    cents = DeltaSparkTable(spark, str(tmp_path / "ivf") + "_centroids").read()
    vectors = _with_norm(emb.read().select("vec_id", "embedding"))
    queries = vectors.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    dot = DOT.format(a="q_emb", b="embedding")
    anchor_df = _topk(
        ivf.read().select("vec_id", "cell")
        .join(vectors, "vec_id")
        .join(_probe_cells_for(queries, cents, 2), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cosine",
                    F.expr(dot) / (F.col("norm") * F.col("q_norm"))),
        3,
    )
    anchor = {(r["q_id"], r["rank"]): r["vec_id"]
              for r in anchor_df.collect()}
    assert full == anchor
    # small rerank: still k results per query, exact scores
    small = ann_query_maintained(emb, ivf, pq, k=3, n_queries=3,
                                 nprobe=2, rerank=3).collect()
    per_q = {}
    for r in small:
        per_q.setdefault(r["q_id"], []).append(r)
    assert all(len(v) == 3 for v in per_q.values())


def test_ann_query_indexed_entry_guard_fires(spark, monkeypatch):
    """A query path returning shifted neighbor ids must trip the
    exact-anchor guard."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dagster_delta_spark.operators import incremental as incr

    real = incr.ann_query_maintained
    monkeypatch.setattr(
        incr, "ann_query_maintained",
        lambda e, i, p, **kw: real(e, i, p, **kw).withColumn(
            "vec_id", F.col("vec_id") + 7))
    with pytest.raises(AssertionError, match="diverged from the exact"):
        entry._ann_query_indexed(spark, "/root/testdata/sf0.001")


def test_pq_nbits_beyond_int8_refuses(spark, tmp_path):
    """r9: codes persist as array<tinyint> (signed int8) — nbits=8
    (k=256, the common FAISS setting) would wrap codewords negative
    and mis-score every ADC scan while rebuild-parity audits still
    pass; training must refuse, and a foreign oversized codebook must
    refuse at encode time."""
    import numpy as np
    import pytest as _pytest

    from dagster_delta_spark.operators.similarity import (
        _learn_pq_codebooks,
        _pq_encode,
    )

    x = np.random.RandomState(0).randn(64, 16)
    with _pytest.raises(ValueError, match="nbits"):
        _learn_pq_codebooks(x, m=4, nbits=8)
    with _pytest.raises(ValueError, match="nbits"):
        _learn_pq_codebooks(x, m=4, nbits=0)
    vecs = spark.createDataFrame(
        [(i, [float(i)] * 16, 4.0 * (i + 1)) for i in range(4)],
        "vec_id long, embedding array<double>, norm double")
    with _pytest.raises(ValueError, match="int8"):
        _pq_encode(vecs, np.zeros((4, 256, 4)))


def test_pq_family_is_an_index_property(spark, tmp_path):
    """A portable-built PQ index folds and audits under the portable
    encode rule resumed from its own metadata; codes pack to the same
    (vec_id, codes array<tinyint>) shape as the numpy family."""
    from pyspark.sql import functions as F
    import pytest as _pt

    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.operators import incremental

    emb = spark.range(48).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") + j) % 5 + F.lit(0.5)).cast("float")
                  for j in range(8)]).alias("embedding"))
    base = DeltaSparkTable(spark, str(tmp_path / "b"))
    idx = DeltaSparkTable(spark, str(tmp_path / "i"))
    base.write(emb.where("vec_id < 32"), WriteMode.error)
    incremental.build_pq_index(base, idx, m=4, nbits=2, iters=1,
                               family="portable")
    base.write(emb.where("vec_id >= 32"), WriteMode.append)
    incremental.maintain_pq_index(base, idx)
    # rebuild parity under the RECORDED family
    assert incremental.pq_index_vs_rebuild(base, idx).count() == 0
    out = idx.read()
    assert out.count() == 48
    assert dict(out.dtypes)["codes"] == "array<tinyint>"
    # portable codes are 0-based like the numpy family: 0..2**nbits-1
    rng = out.select(F.explode("codes").alias("c")).agg(
        F.min("c"), F.max("c")).first()
    assert rng[0] >= 0 and rng[1] <= 3

    # nbits validates BEFORE any write — no half-built index
    with _pt.raises(ValueError, match="nbits"):
        incremental.build_pq_index(
            base, DeltaSparkTable(spark, str(tmp_path / "i3")),
            nbits=8, family="portable")
    assert not DeltaSparkTable(spark, str(tmp_path / "i3")).exists()
    assert not DeltaSparkTable(
        spark, str(tmp_path / "i3") + "_codebooks").exists()

    with _pt.raises(ValueError, match="PQ family"):
        incremental.build_pq_index(
            base, DeltaSparkTable(spark, str(tmp_path / "i2")),
            family="torch")
