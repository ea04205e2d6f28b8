"""Range clustering (data-skipping layout), merge schema evolution,
IVF ANN, and property-based pruning invariants."""

from pyspark.sql import functions as F

from dagster_delta_spark import (
    DeltaSparkTable,
    MergeConfig,
    MergeType,
    SchemaMode,
    WriteMode,
)

SF = "/root/testdata/sf0.001"


def test_cluster_by_tightens_data_skipping(spark, tmp_table):
    """After clustering on v, a range predicate prunes most files."""
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.range(0, 10000).select(
        (F.col("id") * 7919 % 10000).alias("v")  # shuffled values
    )
    t.write(df.repartition(8), WriteMode.overwrite)
    snap = t.snapshot()
    pruned_before = len(t.pruned_files(snap, [("v", ">=", 9000)]))
    assert pruned_before == len(snap.files)  # every file spans the range

    t.optimize(cluster_by=["v"], num_files=8)
    snap2 = t.snapshot()
    pruned_after = len(t.pruned_files(snap2, [("v", ">=", 9000)]))
    assert pruned_after <= 2  # tight disjoint ranges now
    assert t.read(dnf=[("v", ">=", 9000)]).count() == 1000


def test_merge_schema_evolution(spark, tmp_table):
    """Merge with schema_mode=append evolves the target schema; old
    rows null-fill the new column."""
    t = DeltaSparkTable(spark, tmp_table)
    t.write(
        spark.createDataFrame([(1, 4), (2, 5)], "a bigint, b bigint"),
        WriteMode.overwrite,
    )
    src = spark.createDataFrame([(2, 50, "x"), (9, 90, "y")],
                                "a bigint, b bigint, c string")
    t.merge(
        src,
        MergeConfig(MergeType.upsert, predicate="s.a = t.a"),
        schema_mode=SchemaMode.append,
    )
    out = {r["a"]: (r["b"], r["c"]) for r in t.read().collect()}
    assert out == {1: (4, None), 2: (50, "x"), 9: (90, "y")}
    assert "c" in {f.name for f in t.schema().fields}


def test_ivf_ann_probes_subset(spark):
    """IVF results are exact cosines over probed cells; full probe
    equals brute force."""
    from dagster_delta_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
    )

    exact = {(r["q_id"], r["rank"]): r["vec_id"]
             for r in cosine_topk(spark, SF, k=3).collect()}
    # probing every cell must reproduce the exact top-k
    full = {(r["q_id"], r["rank"]): r["vec_id"]
            for r in ivf_ann_topk(spark, SF, k=3, n_cells=8, nprobe=8).collect()}
    assert full == exact
    # partial probe still returns k results per query
    part = ivf_ann_topk(spark, SF, k=3, n_cells=8, nprobe=2)
    counts = {r["q_id"]: r["n"] for r in
              part.groupBy("q_id").count().withColumnRenamed("count", "n").collect()}
    assert all(v == 3 for v in counts.values())


def test_ivf_recall_at_least_lsh(spark):
    """At default dials and the same 25% candidate budget, trained IVF
    recall@10 must not trail multiprobe LSH (measured 0.60-0.62 vs
    0.58-0.59 on this fixture).  Runs at sf0.01 — 32 cells over the
    sf0.001 corpus (~200 vectors) would be over-partitioned."""
    from dagster_delta_spark.operators.similarity import ann_recall_report

    rep = ann_recall_report(spark, "/root/testdata/sf0.01")
    by_method = {
        r["method"]: r["avg"]
        for r in rep.groupBy("method").avg("recall")
        .withColumnRenamed("avg(recall)", "avg").collect()
    }
    assert by_method["ivf"] >= by_method["lsh"], by_method


def test_pruning_invariant_random_predicates(spark, tmp_path):
    """Property: for random data + random DNF, the pruned partitioned
    read equals the brute-force filter of the full scan."""
    import random

    rnd = random.Random(7)
    rows = [
        (rnd.choice(["a", "b", "c", "d"]), rnd.randint(0, 100), rnd.random())
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "k string, n bigint, x double")
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(df.repartition(6), WriteMode.overwrite, partition_columns=["k"])
    full = t.read()

    for trial in range(8):
        op = rnd.choice(["=", "in", ">=", "<"])
        col = rnd.choice(["k", "n"])
        if col == "k":
            vals = ["a", "b", "c", "d", "zz"]
            dnf = [("k", "=", rnd.choice(vals))] if op in ("=", ">=", "<") \
                else [("k", "in", rnd.sample(vals, 2))]
        else:
            v = rnd.randint(-5, 105)
            dnf = [("n", op if op != "in" else ">=",
                    [v, v + 3] if op == "in" else v)]
            if op == "in":
                dnf = [("n", "in", [v, v + 3])]
        from dagster_delta_spark.plans.predicates import dnf_to_column

        expected = full.where(dnf_to_column(dnf)).count()
        got = t.read(dnf=dnf).count()
        assert got == expected, f"trial {trial}: dnf={dnf}"


def test_sql_and_column_lowering_agree(spark):
    """Property: dnf_to_sql and dnf_to_column select identical rows."""
    from datetime import datetime
    import random

    from dagster_delta_spark.plans.predicates import dnf_to_column, dnf_to_sql

    rnd = random.Random(11)
    rows = [
        (i, rnd.choice(["x", "o'x", "y"]), datetime(2020, 1, 1 + rnd.randint(0, 20)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "n bigint, s string, ts timestamp")
    df.createOrReplaceTempView("prop_t")
    cases = [
        [("n", ">=", 100)],
        [("s", "=", "o'x")],
        [("s", "in", ["x", "y"])],
        [("ts", "<", datetime(2020, 1, 10))],
        [("n", ">=", 50), ("ts", ">=", datetime(2020, 1, 5))],
    ]
    for dnf in cases:
        a = df.where(dnf_to_column(dnf)).count()
        b = spark.sql(f"SELECT count(*) c FROM prop_t WHERE {dnf_to_sql(dnf)}") \
            .collect()[0]["c"]
        assert a == b, dnf


def test_write_time_clustering(spark, tmp_table):
    """cluster_by at write time produces skippable file layout
    immediately (no separate optimize pass)."""
    t = DeltaSparkTable(spark, tmp_table)
    df = spark.range(0, 10000).select((F.col("id") * 7919 % 10000).alias("v"))
    t.write(df.repartition(8), WriteMode.overwrite, cluster_by=["v"],
            cluster_files=8)
    snap = t.snapshot()
    pruned = t.pruned_files(snap, [("v", ">=", 9000)])
    assert len(pruned) < len(snap.files)
    assert t.read(dnf=[("v", ">=", 9000)]).count() == 1000


def test_zorder_skips_on_both_dimensions(spark, tmp_table):
    """Z-order gives useful pruning on BOTH columns; single-column
    range clustering only on its leading column."""
    t = DeltaSparkTable(spark, tmp_table)
    rows = [(i % 100, (i * 37) % 100) for i in range(10000)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    t.write(df.repartition(8), WriteMode.overwrite)
    t.zorder(["x", "y"], num_files=16)
    snap = t.snapshot()
    n = len(snap.files)
    px = len(t.pruned_files(snap, [("x", ">=", 90)]))
    py = len(t.pruned_files(snap, [("y", ">=", 90)]))
    assert n == 16
    assert px <= n // 2 and py <= n // 2  # both dims skip >= half
    assert t.read(dnf=[("x", ">=", 90)]).count() == 1000
    assert t.read(dnf=[("y", ">=", 90)]).count() == 1000


def test_streaming_sink_idempotent_replay(spark, tmp_path):
    """Re-delivering an already-committed batch id is a no-op."""
    from dagster_delta_spark.streaming import stream_into_table

    uri = str(tmp_path / "t")
    table = stream_into_table(spark, "/root/testdata/sf0.001", uri,
                              max_files_per_trigger=8)
    n = table.read().count()
    v = table.version()
    # simulate a post-failure replay of batch 0
    import dagster_delta_spark.streaming.events as ev_mod

    df = ev_mod.read_events_stream.__wrapped__ if hasattr(
        ev_mod.read_events_stream, "__wrapped__") else None
    # call the sink logic directly through a fresh stream run: rerunning
    # the whole stream with the same checkpoint does not duplicate
    table2 = stream_into_table(spark, "/root/testdata/sf0.001", uri,
                               max_files_per_trigger=8)
    assert table2.read().count() == n
    assert table2.version() == v


def test_kmeans_clusters_report(spark):
    """Cluster report invariants: populations sum to the corpus, all
    cosines in [-1, 1], mean >= min per cluster, and planted
    duplicates of a centroid vector land in one cluster with
    compactness ~1."""
    from dagster_delta_spark.operators.similarity import kmeans_clusters

    sf = "/root/testdata/sf0.001"
    rows = kmeans_clusters(spark, sf).collect()
    assert rows
    import duckdb

    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r["n_vectors"] for r in rows) == total
    for r in rows:
        assert -1.0 - 1e-9 <= r["min_cos"] <= r["mean_cos"] <= 1.0 + 1e-9


def test_ann_recall_floor_guard(spark):
    """min_ivf_margin turns index-quality collapse into a hard failure:
    an impossible bar (IVF must beat LSH by 2.0 in recall) raises
    RecallRegressionError; margin=None only reports."""
    import pytest

    from dagster_delta_spark.operators.similarity import (
        RecallRegressionError,
        ann_recall_report,
    )

    sf = "/root/testdata/sf0.01"
    with pytest.raises(RecallRegressionError):
        ann_recall_report(spark, sf, min_ivf_margin=-2.0)
    # PQ shares IVF's probe set, so an impossible relative bar (PQ
    # must beat IVF by 2.0) must likewise raise
    with pytest.raises(RecallRegressionError, match="IVF-PQ"):
        ann_recall_report(spark, sf, min_pq_margin=-2.0)
    assert ann_recall_report(spark, sf, min_ivf_margin=None,
                             min_pq_margin=None).count() == 15


def test_centroid_cache_evicts_on_corpus_rewrite(spark, tmp_path, monkeypatch):
    """An in-session embeddings rewrite must evict the superseded
    centroid/assignment cache entries, not pin their checkpoints for
    the session's lifetime (r5 advice: eviction passed no live_key)."""
    import os
    import time

    import numpy as np
    import pandas as pd

    from dagster_delta_spark.operators import similarity

    monkeypatch.setenv("DDS_INDEX_DIR", str(tmp_path / "idx"))
    similarity._CENTROID_CACHE.clear()
    d = tmp_path / "c"
    d.mkdir()

    def write(seed):
        rng = np.random.default_rng(seed)
        pd.DataFrame({
            "vec_id": list(range(40)),
            "embedding": [rng.standard_normal(8).astype("float32")
                          for _ in range(40)],
            "label": ["a"] * 40,
        }).to_parquet(str(d / "embeddings.parquet"))

    write(1)
    similarity.ivf_assignments(spark, str(d), n_cells=4)
    time.sleep(0.01)  # distinct mtime_ns -> distinct fingerprint
    write(2)
    similarity.ivf_assignments(spark, str(d), n_cells=4)
    same_dir = [k for k in similarity._CENTROID_CACHE
                if k[1] == os.path.abspath(str(d))]
    assert same_dir  # fresh entries present (train + assign)
    assert len({k[2] for k in same_dir}) == 1  # old fingerprint evicted
    similarity._CENTROID_CACHE.clear()


def test_ivf_quantized_topk(spark):
    """IVF-SQ8 two-stage ANN: with rerank covering every probed
    candidate the exact-rerank stage reproduces ivf_ann_topk
    bit-for-bit; a small shortlist still yields k results per query
    whose membership tracks the unquantized path (int8 scalar
    quantization barely perturbs the stage-1 ordering)."""
    from dagster_delta_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_quantized_topk,
    )

    sf = "/root/testdata/sf0.01"
    ivf = {(r["q_id"], r["rank"]): r["vec_id"]
           for r in ivf_ann_topk(spark, sf).collect()}
    full = {(r["q_id"], r["rank"]): r["vec_id"]
            for r in ivf_quantized_topk(spark, sf, rerank=10**9).collect()}
    assert full == ivf
    small = ivf_quantized_topk(spark, sf, rerank=10).collect()
    per_q = {}
    for r in small:
        per_q.setdefault(r["q_id"], set()).add(r["vec_id"])
    ivf_sets = {}
    for (q, _), v in ivf.items():
        ivf_sets.setdefault(q, set()).add(v)
    assert set(per_q) == set(ivf_sets)
    for q, ids in per_q.items():
        assert len(ids) == 5
        assert len(ids & ivf_sets[q]) >= 3, (q, ids, ivf_sets[q])


def test_ivf_pq_topk(spark):
    """IVF-PQ two-stage ANN: with rerank covering every probed
    candidate the exact-rerank stage reproduces ivf_ann_topk
    bit-for-bit (PQ error only reorders the shortlist); the default
    shortlist still yields k results per query whose membership
    substantially tracks the unquantized path; codes are m int8
    codeword indexes in [0, 2**nbits)."""
    from pyspark.sql import functions as F

    from dagster_delta_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_pq_topk,
        pq_codes,
    )

    sf = "/root/testdata/sf0.01"
    ivf = {(r["q_id"], r["rank"]): r["vec_id"]
           for r in ivf_ann_topk(spark, sf).collect()}
    full = {(r["q_id"], r["rank"]): r["vec_id"]
            for r in ivf_pq_topk(spark, sf, rerank=10**9).collect()}
    assert full == ivf
    small = ivf_pq_topk(spark, sf, rerank=50).collect()
    per_q = {}
    for r in small:
        per_q.setdefault(r["q_id"], set()).add(r["vec_id"])
    ivf_sets = {}
    for (q, _), v in ivf.items():
        ivf_sets.setdefault(q, set()).add(v)
    assert set(per_q) == set(ivf_sets)
    for q, ids in per_q.items():
        assert len(ids) == 5
        assert len(ids & ivf_sets[q]) >= 3, (q, ids, ivf_sets[q])
    bad = pq_codes(spark, sf).where(
        (F.size("codes") != 8)
        | F.exists("codes", lambda c: (c < 0) | (c > 15))
    ).count()
    assert bad == 0


def test_zero_norm_embeddings_excluded_everywhere(spark, tmp_path):
    """A degenerate all-zero embedding must never appear as a neighbor
    or near-dup: its cosine is NaN, which Spark sorts ABOVE every real
    value, so without the guard it would rank first in every top-k and
    pass every threshold filter (r6 review)."""
    import numpy as np
    import pandas as pd

    from dagster_delta_spark.operators import similarity

    d = tmp_path / "emb"
    d.mkdir()
    rng = np.random.default_rng(3)
    vecs = [rng.standard_normal(8).astype("float32") for _ in range(20)]
    vecs.append(np.zeros(8, dtype="float32"))  # vec_id 20: degenerate
    pd.DataFrame({
        "vec_id": list(range(21)), "embedding": vecs,
        "label": ["a"] * 21,
    }).to_parquet(str(d / "embeddings.parquet"))

    top = similarity.cosine_topk(spark, str(d), k=20, n_queries=3).collect()
    assert all(r["vec_id"] != 20 for r in top)
    assert all(r["cosine"] == r["cosine"] for r in top)  # no NaN
    dups = similarity.embedding_near_dups(spark, str(d),
                                          threshold=-1.0).collect()
    assert all(20 not in (r["id_a"], r["id_b"]) for r in dups)


def test_lsh_planes_validated_and_quantized_rerank_floor(spark):
    import pytest as _pytest

    from dagster_delta_spark.operators import similarity

    with _pytest.raises(ValueError, match="planes"):
        similarity.lsh_signatures(spark, "/root/testdata/sf0.001", planes=63)
    # rerank < k is silently raised to k: still k rows per query
    out = similarity.ivf_quantized_topk(
        spark, "/root/testdata/sf0.01", k=8, rerank=2)
    counts = [r["n"] for r in out.groupBy("q_id").count()
              .withColumnRenamed("count", "n").collect()]
    assert counts and all(c == 8 for c in counts)


def test_optimize_where_partition_scope(spark, tmp_table):
    """OPTIMIZE ... WHERE (r12): a partition-scoped compaction
    rewrites only the matching partition's small files; out-of-scope
    partitions are bit-identical untouched, contents survive exactly,
    and the scoped cluster_by form works too.  Non-partition
    predicates refuse pointedly (Delta's OPTIMIZE WHERE rule)."""
    import pytest

    t = DeltaSparkTable(spark, tmp_table)
    df = spark.range(3000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 7919 % 3000).alias("v"))
    t.write(df.repartition(6), WriteMode.overwrite,
            partition_columns=["p"])
    want = sorted(r["k"] for r in t.read().collect())

    def files_of(pv):
        return {a.path for a in t.snapshot().files
                if a.partition_values.get("p") == pv}

    out0, out2 = files_of("0"), files_of("2")
    n1 = len(files_of("1"))
    res = t.optimize(target_file_size=1 << 26,
                     partition_dnf=[("p", "=", "1")])
    assert res["version"] > 0
    assert files_of("0") == out0 and files_of("2") == out2
    assert len(files_of("1")) < n1
    assert sorted(r["k"] for r in t.read().collect()) == want

    # scoped clustering: only p=2's layout changes
    out0 = files_of("0")
    t.optimize(cluster_by=["v"], num_files=2,
               partition_dnf=[("p", "=", "2")])
    assert files_of("0") == out0
    assert len(files_of("2")) <= 2
    assert sorted(r["k"] for r in t.read().collect()) == want
    # skipping got tight inside the scoped partition only
    snap = t.snapshot()
    in2 = [a for a in snap.files if a.partition_values.get("p") == "2"]
    kept = [a for a in in2
            if any(f.path == a.path for f in t.pruned_files(
                snap, [("v", ">=", 2500), ("p", "=", "2")]))]
    assert len(kept) < len(in2)

    with pytest.raises(ValueError, match="partition-column"):
        t.optimize(partition_dnf=[("v", ">=", 100)])
