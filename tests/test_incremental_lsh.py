"""Incremental MinHash-LSH bucket-index maintenance over CDC
(operators/incremental.py): appends shingle/sign/band only the new
documents, the result equals a from-scratch build (symmetric
difference empty), rewrites refuse, compactions are transparent, and
the banding parameters come from the index metadata, not the caller.
"""

import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.operators.incremental import (
    build_lsh_index,
    lsh_index_vs_rebuild,
    maintain_lsh_index,
)


def _docs_df(spark, ids, words=24):
    rows = [
        (int(i),
         " ".join(f"w{(i * 7 + j * 3) % 50}" for j in range(words)))
        for i in sorted(ids)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_lsh_equals_rebuild(spark, tmp_path):
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    index = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(30)), WriteMode.error)
    assert build_lsh_index(docs, index, num_hashes=16, bands=4) == 0
    docs.write(_docs_df(spark, range(30, 50)), WriteMode.append)
    assert maintain_lsh_index(docs, index) == 1
    docs.write(_docs_df(spark, range(50, 60)), WriteMode.append)
    assert maintain_lsh_index(docs, index) == 2
    # 4 bands per doc, 60 docs
    assert index.read().count() == 240
    assert lsh_index_vs_rebuild(docs, index).count() == 0


def test_banding_params_come_from_index_metadata(spark, tmp_path):
    """Maintenance must band exactly as the build did even though the
    caller never repeats num_hashes/bands."""
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    index = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(10)), WriteMode.error)
    build_lsh_index(docs, index, num_hashes=32, bands=8)
    docs.write(_docs_df(spark, range(10, 20)), WriteMode.append)
    maintain_lsh_index(docs, index)  # non-default params resumed
    assert index.read().count() == 20 * 8
    assert lsh_index_vs_rebuild(docs, index).count() == 0


def test_rewrite_refuses_and_rebuild_recovers(spark, tmp_path):
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    index = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(20)), WriteMode.error)
    build_lsh_index(docs, index, num_hashes=16, bands=4)
    docs.write(_docs_df(spark, range(5)), WriteMode.overwrite)
    with pytest.raises(ValueError, match="rewrite"):
        maintain_lsh_index(docs, index)
    build_lsh_index(docs, index, num_hashes=16, bands=4)
    assert index.read().count() == 5 * 4
    assert lsh_index_vs_rebuild(docs, index).count() == 0


def test_compaction_and_noop_ranges(spark, tmp_path):
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    index = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(10)), WriteMode.error)
    docs.write(_docs_df(spark, range(10, 20)), WriteMode.append)
    build_lsh_index(docs, index, num_hashes=16, bands=4)
    iv = index.version()
    assert maintain_lsh_index(docs, index) == docs.version()  # no-op
    docs.optimize()
    assert maintain_lsh_index(docs, index) == docs.version()
    assert index.version() == iv  # neither committed anything
    docs.write(_docs_df(spark, range(20, 25)), WriteMode.append)
    maintain_lsh_index(docs, index)
    assert index.read().count() == 25 * 4
    assert lsh_index_vs_rebuild(docs, index).count() == 0


def test_short_docs_never_enter_the_index(spark, tmp_path):
    """Docs below the shingle threshold (< 3 tokens) emit no bucket
    rows on the build and maintain paths alike."""
    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    index = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(5)), WriteMode.error)
    build_lsh_index(docs, index, num_hashes=16, bands=4)
    stub = spark.createDataFrame(
        [(99, "too short"), (100, "just barely three tokens here")],
        "doc_id long, text string",
    )
    docs.write(stub, WriteMode.append)
    maintain_lsh_index(docs, index)
    got = {r["doc_id"] for r in index.read().select("doc_id").distinct().collect()}
    assert 100 in got and 99 not in got
    assert lsh_index_vs_rebuild(docs, index).count() == 0


def test_audit_catches_ghost_and_missing_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = DeltaSparkTable(spark, str(tmp_path / "docs"))
    index = DeltaSparkTable(spark, str(tmp_path / "lsh"))
    docs.write(_docs_df(spark, range(10)), WriteMode.error)
    build_lsh_index(docs, index, num_hashes=16, bands=4)
    tampered = index.read().withColumn(
        "h",
        F.when((F.col("doc_id") == 0) & (F.col("band") == 0),
               F.col("h") + 1).otherwise(F.col("h")),
    )
    index.write(tampered, WriteMode.overwrite,
                commit_metadata={"base_version": "0",
                                 "num_hashes": "16", "bands": "4"})
    sides = {r["side"] for r in lsh_index_vs_rebuild(docs, index).collect()}
    assert sides == {"missing", "ghost"}


def test_lsh_index_maintain_entry_guard_fires(spark, monkeypatch):
    """The rows-only registry entry falsifies: a maintenance path that
    corrupts one bucket row trips the rebuild-parity guard."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dagster_delta_spark.operators import incremental as incr

    sf = "/root/testdata/sf0.001"
    entry.lsh_index_maintain(spark, sf)  # healthy

    real = incr.maintain_lsh_index

    def tampering(docs, index, since_version=None):
        v = real(docs, index, since_version)  # raises on rewrites as-is
        meta = index.history(limit=1)[0].get("userMetadata") or {}
        bad = index.read().withColumn(
            "h",
            F.when((F.col("doc_id") == 1) & (F.col("band") == 0),
                   F.col("h") + 1).otherwise(F.col("h")),
        )
        index.write(bad, WriteMode.overwrite, commit_metadata=meta)
        return v

    monkeypatch.setattr(incr, "maintain_lsh_index", tampering)
    with pytest.raises(AssertionError, match="diverged"):
        entry.lsh_index_maintain(spark, sf)


def test_lsh_index_hash_family_is_an_index_property(spark, tmp_path):
    """A portable-built index resumes the portable family from its own
    metadata — maintenance can never mix hash families, and the
    rebuild audit re-derives under the recorded family."""
    from pyspark.sql import functions as F

    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.operators import incremental

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[F.concat(F.lit(f"w{j}x"),
                                    (F.col("id") % 7).cast("string"))
                           for j in range(6)]).alias("text"))
    base = DeltaSparkTable(spark, str(tmp_path / "b"))
    idx = DeltaSparkTable(spark, str(tmp_path / "i"))
    base.write(docs.where("doc_id < 25"), WriteMode.error)
    incremental.build_lsh_index(base, idx, num_hashes=8, bands=4,
                                hash_family="portable")
    base.write(docs.where("doc_id >= 25"), WriteMode.append)
    incremental.maintain_lsh_index(base, idx)
    # the fold used the recorded family: rebuild parity holds under it
    assert incremental.lsh_index_vs_rebuild(base, idx).count() == 0
    # and the folded rows really are md5-derived (a portable h equals
    # the PORTABLE_H64 recompute of its own banding; spot-check via
    # a direct recompute of the full membership)
    from dagster_delta_spark.operators.incremental import _lsh_doc_buckets
    fresh = _lsh_doc_buckets(base.read(), 8, 4, "portable")
    assert fresh.exceptAll(
        idx.read().select("doc_id", "band", "h")).count() == 0

    # unknown family refuses at build time
    import pytest as _pt
    idx2 = DeltaSparkTable(spark, str(tmp_path / "i2"))
    with _pt.raises(ValueError, match="hash family"):
        incremental.build_lsh_index(base, idx2, hash_family="sha9")
