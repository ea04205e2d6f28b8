"""Measure the late-r8 operators on 20x corpora: fuzzy
decontamination over ~100k docs (eval set ~6k — the broadcast-side
regime the operator is designed for) and IVF-PQ over ~40k vectors
(codes build + probe wall vs the SQ8 and unquantized IVF probes on
the SAME probe set).  Results recorded in docs/SCALE.md "Measured
stress points".

Usage: python tools/stress_r8_ops.py [--replicas 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from stress_new_ops import build_corpus

    def run(name, make, describe):
        t0 = time.perf_counter()
        df = make()
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        print(f"{name}: {describe(df)} | {wall:.1f} s")

    # ---- fuzzy decontamination on the 20x documents corpus ----
    from dagster_delta_spark.operators.curation import near_dup_decontaminate

    with tempfile.TemporaryDirectory() as d:
        build_corpus(spark, args.sf_dir, d, args.replicas, 2000)
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        n_eval = spark.read.parquet(f"{d}/documents.parquet").where(
            "doc_id % 17 = 3").count()
        print(f"docs corpus: {n} ({n_eval} eval)")
        run("near_dup_decontaminate",
            lambda: near_dup_decontaminate(spark, d),
            lambda df: f"{df.count()} flagged")

        from dagster_delta_spark.operators.bpe import (
            bpe_token_stats,
            bpe_train,
        )

        t0 = time.perf_counter()
        n_merges = len(bpe_train(spark, d))
        print(f"bpe_train: {n_merges} merges | "
              f"{time.perf_counter()-t0:.1f} s")
        run("bpe_token_stats",
            lambda: bpe_token_stats(spark, d),
            lambda df: f"{df.count()} docs")

    # ---- IVF-PQ on the 20x embeddings corpus ----
    from dagster_delta_spark.operators import similarity as sim

    src = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    nv = src.count()
    wide = (
        src.crossJoin(
            spark.range(args.replicas).withColumnRenamed("id", "rep"))
        .select(
            (F.col("vec_id") + F.col("rep") * (nv * 10)).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + (rep % 7) * 0.01 "
                "* (CASE WHEN i = rep % size(embedding) THEN 1 ELSE 0 END) "
                "AS FLOAT))"
            ).alias("embedding"),
        )
    )
    d2 = tempfile.mkdtemp(prefix="dds-pq-stress-")
    try:
        wide.write.mode("overwrite").parquet(f"{d2}/embeddings.parquet")
        print(f"emb corpus: {nv * args.replicas} vectors")

        t0 = time.perf_counter()
        sim.ivf_assignments(spark, d2).count()
        print(f"ivf bootstrap (train+assign): {time.perf_counter()-t0:.1f} s")
        t0 = time.perf_counter()
        sim.pq_codes(spark, d2).count()
        print(f"pq codes build (train+encode): {time.perf_counter()-t0:.1f} s")
        sim.ivf_quantized_topk(spark, d2, k=1, n_queries=1)\
            .write.mode("overwrite").format("noop").save()  # cache sq8 table

        run("ivf_ann_topk (float probe)",
            lambda: sim.ivf_ann_topk(spark, d2),
            lambda df: f"{df.count()} rows")
        run("ivf_quantized_topk (int8 probe)",
            lambda: sim.ivf_quantized_topk(spark, d2),
            lambda df: f"{df.count()} rows")
        run("ivf_pq_topk (ADC probe)",
            lambda: sim.ivf_pq_topk(spark, d2),
            lambda df: f"{df.count()} rows")

        anchor = {(r["q_id"], r["rank"]): r["vec_id"]
                  for r in sim.ivf_ann_topk(spark, d2).collect()}
        full = {(r["q_id"], r["rank"]): r["vec_id"]
                for r in sim.ivf_pq_topk(spark, d2, rerank=10**9).collect()}
        print(f"full-rerank parity at {nv * args.replicas} vectors: "
              f"{full == anchor}")

        # transactional PQ index: fold a 5% append vs full rebuild
        from dagster_delta_spark import DeltaSparkTable, WriteMode
        from dagster_delta_spark.operators import incremental as incr

        wide_t = spark.read.parquet(f"{d2}/embeddings.parquet")
        base = DeltaSparkTable(spark, f"{d2}/t_emb")
        index = DeltaSparkTable(spark, f"{d2}/t_pq")
        base.write(wide_t.where("vec_id % 20 != 0"), WriteMode.error)
        t0 = time.perf_counter()
        incr.build_pq_index(base, index)
        t_build = time.perf_counter() - t0
        base.write(wide_t.where("vec_id % 20 = 0"), WriteMode.append)
        t0 = time.perf_counter()
        incr.maintain_pq_index(base, index)
        t_fold = time.perf_counter() - t0
        rebuild = DeltaSparkTable(spark, f"{d2}/t_pq_rebuild")
        t0 = time.perf_counter()
        incr.build_pq_index(base, rebuild)
        t_rebuild = time.perf_counter() - t0
        n_diff = incr.pq_index_vs_rebuild(base, index).count()
        print(f"pq index: build {t_build:.1f} s, 5% fold {t_fold:.1f} s "
              f"vs rebuild {t_rebuild:.1f} s "
              f"({t_rebuild / max(t_fold, 1e-9):.1f}x), parity diffs "
              f"{n_diff}")
    finally:
        import shutil

        shutil.rmtree(d2, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
