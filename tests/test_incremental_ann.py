"""Incremental IVF index maintenance over CDC (operators/incremental.py).

The contract under test: appends fold into the inverted list by
assigning ONLY the new vectors against the stored centroids, and the
result is EXACTLY the index a from-scratch assignment would build over
the same centroids (``ivf_index_vs_rebuild`` empty).  Rewrites refuse;
compactions are transparent.
"""

import numpy as np
import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.operators.incremental import (
    build_ivf_index,
    ivf_index_vs_rebuild,
    maintain_ivf_index,
)


def _emb_df(spark, ids, d=8, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(v) for v in rng.normal(size=d)])
        for i in sorted(ids)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_incremental_index_equals_rebuild(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(40), seed=1), WriteMode.error)
    v = build_ivf_index(emb, index, n_cells=4)
    assert v == 0
    # two maintenance rounds, resuming from the index's own metadata
    emb.write(_emb_df(spark, range(40, 70), seed=2), WriteMode.append)
    assert maintain_ivf_index(emb, index) == 1
    emb.write(_emb_df(spark, range(70, 90), seed=4), WriteMode.append)
    assert maintain_ivf_index(emb, index) == 2
    assert index.read().count() == 90
    assert index.read().select("vec_id").distinct().count() == 90
    # the maintained index is bit-identical to a from-scratch
    # assignment of the full snapshot against the same centroids
    assert ivf_index_vs_rebuild(emb, index).count() == 0


def test_maintain_is_noop_without_new_commits(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(20)), WriteMode.error)
    build_ivf_index(emb, index, n_cells=4)
    iv = index.version()
    assert maintain_ivf_index(emb, index) == 0
    assert index.version() == iv  # nothing committed


def test_rewrite_commit_refuses(spark, tmp_path):
    """An overwrite leaves ghost vectors in the inverted list if folded
    silently — maintenance must raise (rebuild instead)."""
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(20)), WriteMode.error)
    build_ivf_index(emb, index, n_cells=4)
    emb.write(_emb_df(spark, range(10)), WriteMode.overwrite)
    with pytest.raises(ValueError, match="rewrite"):
        maintain_ivf_index(emb, index)
    # the prescribed recovery: a rebuild retrains and reassigns
    build_ivf_index(emb, index, n_cells=4)
    assert index.read().count() == 10
    assert ivf_index_vs_rebuild(emb, index).count() == 0


def test_compaction_only_range_is_metadata_noop(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(20)), WriteMode.error)
    emb.write(_emb_df(spark, range(20, 30)), WriteMode.append)
    build_ivf_index(emb, index, n_cells=4)
    iv = index.version()
    emb.optimize()  # re-adds old rows; must contribute nothing
    assert maintain_ivf_index(emb, index) == emb.version()
    assert index.version() == iv  # no empty commit
    # an append AFTER the compaction still folds exactly once even
    # though the stored base_version lags over the compaction commit
    emb.write(_emb_df(spark, range(30, 45), seed=9), WriteMode.append)
    maintain_ivf_index(emb, index)
    assert index.read().count() == 45
    assert index.read().select("vec_id").distinct().count() == 45
    assert ivf_index_vs_rebuild(emb, index).count() == 0


def test_zero_norm_vectors_never_enter_the_index(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(10)), WriteMode.error)
    build_ivf_index(emb, index, n_cells=4)
    dead = spark.createDataFrame(
        [(99, [0.0] * 8), (100, [1.0] * 8)],
        "vec_id long, embedding array<float>",
    )
    emb.write(dead, WriteMode.append)
    maintain_ivf_index(emb, index)
    got = {r["vec_id"] for r in index.read().collect()}
    assert 100 in got and 99 not in got


def test_maintain_requires_build_metadata(spark, tmp_path):
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(10)), WriteMode.error)
    index.write(_emb_df(spark, range(3)))  # not a build_ivf_index table
    with pytest.raises(ValueError, match="base_version"):
        maintain_ivf_index(emb, index)


def test_ann_index_maintain_entry_guard_fires(spark, monkeypatch):
    """The rows-only registry entry falsifies: a maintenance path that
    corrupts one assignment trips the rebuild-parity guard."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dagster_delta_spark.operators import incremental as incr

    sf = "/root/testdata/sf0.001"
    entry.ann_index_maintain(spark, sf)  # healthy

    real = incr.maintain_ivf_index

    def tampering(emb, index, since_version=None):
        v = real(emb, index, since_version)  # raises on rewrites as-is
        bad = index.read().withColumn(
            "cell",
            F.when(F.col("vec_id") == 0, F.col("cell") + 1)
            .otherwise(F.col("cell")),
        )
        index.write(bad, WriteMode.overwrite)
        return v

    monkeypatch.setattr(incr, "maintain_ivf_index", tampering)
    with pytest.raises(AssertionError, match="diverged"):
        entry.ann_index_maintain(spark, sf)


def test_audit_catches_tampered_assignment(spark, tmp_path):
    from pyspark.sql import functions as F

    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(20)), WriteMode.error)
    build_ivf_index(emb, index, n_cells=4)
    tampered = index.read().withColumn(
        "cell",
        F.when(F.col("vec_id") == 0, F.col("cell") + 1)
        .otherwise(F.col("cell")),
    )
    index.write(tampered, WriteMode.overwrite)
    assert ivf_index_vs_rebuild(emb, index).count() == 1


def test_maintenance_fuzz_random_commit_sequences(spark, tmp_path):
    """Model check over random commit sequences: after every base
    commit, maintenance must either refuse (iff a rewrite landed since
    the last processed version) or leave the index exactly equal to a
    from-scratch rebuild.  Covers append runs, interleaved
    compactions, and rewrite recovery for BOTH index families."""
    import random

    from dagster_delta_spark.operators.incremental import (
        build_lsh_index,
        ivf_index_vs_rebuild,
        lsh_index_vs_rebuild,
        maintain_lsh_index,
    )

    rng = random.Random(1234)
    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    ivf = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    lsh = DeltaSparkTable(spark, str(tmp_path / "lsh"))

    def docs_df(ids):
        rows = [(int(i), " ".join(
            f"w{(i * 11 + j) % 40}" for j in range(12))) for i in ids]
        return spark.createDataFrame(rows, "doc_id long, text string")

    emb.write(_emb_df(spark, range(20), seed=0), WriteMode.error)
    docs.write(docs_df(range(20)), WriteMode.error)
    build_ivf_index(emb, ivf, n_cells=4)
    build_lsh_index(docs, lsh, num_hashes=16, bands=4)
    next_id = 20
    dirty = False  # a rewrite landed since the indexes were last valid

    for step in range(12):
        op = rng.choice(
            ["append", "append", "optimize", "rewrite", "delete_dv"])
        if op == "append":
            ids = range(next_id, next_id + rng.randrange(1, 8))
            next_id = ids.stop
            emb.write(_emb_df(spark, ids, seed=step + 1), WriteMode.append)
            docs.write(docs_df(ids), WriteMode.append)
        elif op == "delete_dv":
            # merge-on-read DML folds (r8) — stays clean, never dirty
            x = rng.randrange(0, next_id)
            emb.delete(f"vec_id = {x} OR vec_id = {x + 3}", use_dv=True)
            docs.delete(f"doc_id = {x} OR doc_id = {x + 3}", use_dv=True)
        elif op == "optimize":
            emb.optimize()
            docs.optimize()
        else:
            keep = range(0, rng.randrange(5, next_id))
            emb.write(_emb_df(spark, keep, seed=99), WriteMode.overwrite)
            docs.write(docs_df(keep), WriteMode.overwrite)
            dirty = True

        if dirty:
            with pytest.raises(ValueError, match="rewrite"):
                maintain_ivf_index(emb, ivf)
            with pytest.raises(ValueError, match="rewrite"):
                maintain_lsh_index(docs, lsh)
            if rng.random() < 0.5:
                build_ivf_index(emb, ivf, n_cells=4)
                build_lsh_index(docs, lsh, num_hashes=16, bands=4)
                dirty = False
        else:
            maintain_ivf_index(emb, ivf)
            maintain_lsh_index(docs, lsh)
            assert ivf_index_vs_rebuild(emb, ivf).count() == 0
            assert lsh_index_vs_rebuild(docs, lsh).count() == 0


def test_concurrent_index_maintenance_detected(spark, tmp_path, monkeypatch):
    """r9: a second maintainer folding the same delta mid-flight
    leaves duplicate index rows; the single-maintainer check raises
    after the commit and vs_rebuild confirms the damage."""
    import dagster_delta_spark.operators.incremental as incr
    from dagster_delta_spark.tablelog import ConcurrentAppendError

    emb = DeltaSparkTable(spark, str(tmp_path / "emb"))
    index = DeltaSparkTable(spark, str(tmp_path / "ivf"))
    emb.write(_emb_df(spark, range(20)), WriteMode.error)
    build_ivf_index(emb, index, n_cells=4)
    emb.write(_emb_df(spark, range(20, 30)), WriteMode.append)

    emb2 = DeltaSparkTable(spark, emb.table_uri)
    index2 = DeltaSparkTable(spark, index.table_uri)
    real = incr._split_row_changes
    fired = []

    def racing(b, v0, head, *args, **kwargs):
        out = real(b, v0, head, *args, **kwargs)
        if not fired:
            fired.append(1)
            incr.maintain_ivf_index(emb2, index2)  # B completes mid-A
        return out

    monkeypatch.setattr(incr, "_split_row_changes", racing)
    with pytest.raises(ConcurrentAppendError, match="another maintenance"):
        maintain_ivf_index(emb, index)
    monkeypatch.undo()
    assert ivf_index_vs_rebuild(emb, index).count() > 0  # duplicates


def test_ivf_assignment_family_is_an_index_property(spark, tmp_path):
    """A portable-built IVF index folds and audits under the portable
    assignment rule resumed from its own metadata — one index never
    mixes the matmul and exact-rounded-cosine families."""
    from pyspark.sql import functions as F
    import pytest as _pt

    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.operators import incremental

    emb = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (3 + j) + F.lit(j)).cast("float")
                  for j in range(4)]).alias("embedding"))
    base = DeltaSparkTable(spark, str(tmp_path / "b"))
    idx = DeltaSparkTable(spark, str(tmp_path / "i"))
    base.write(emb.where("vec_id < 40"), WriteMode.error)
    incremental.build_ivf_index(base, idx, n_cells=4, iters=1,
                                assignment="portable")
    base.write(emb.where("vec_id >= 40"), WriteMode.append)
    incremental.maintain_ivf_index(base, idx)
    # rebuild parity under the RECORDED family (exact assignment)
    assert incremental.ivf_index_vs_rebuild(base, idx).count() == 0
    # the fold really used the exact rule: recompute directly
    from dagster_delta_spark.operators.similarity import (
        _assign_cells_exact, _with_norm)
    cents = incremental._ivf_centroids_table(idx).read()
    fresh = _assign_cells_exact(
        _with_norm(base.read().select("vec_id", "embedding")), cents
    ).select("vec_id", "cell")
    assert fresh.exceptAll(idx.read().select("vec_id", "cell")).count() == 0

    with _pt.raises(ValueError, match="assignment family"):
        incremental.build_ivf_index(
            base, DeltaSparkTable(spark, str(tmp_path / "i2")),
            assignment="approximate")
