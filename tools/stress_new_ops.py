"""Measure the r7 operators on a 20x sf0.1 corpus (~100k docs;
perturbed replicas keep the background unique — the same construction
as tools/skew_bench.py — plus a planted exact-duplicate cluster so the
duplicate-family path carries real transitive mass).  Results recorded
in docs/SCALE.md "Measured stress points".

Usage: python tools/stress_new_ops.py [--replicas 20] [--cluster 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, sf_dir: str, out: str, replicas: int,
                 cluster: int) -> None:
    """Full-schema (doc_id, text, lang, source, n_chars) 20x corpus:
    replicas of the sf docs with per-replica text perturbation, plus
    ``cluster`` exact copies of one boilerplate doc."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source")
    n = docs.count()
    wide = (
        docs.crossJoin(
            spark.range(replicas).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") + F.col("rep") * (n * 10)).alias("doc_id"),
            F.concat_ws(" ", "text",
                        F.concat(F.lit("rep"), F.col("rep"))).alias("text"),
            "lang", "source",
        )
    )
    boiler = " ".join(f"legal boilerplate clause {i % 13}" for i in range(40))
    hot = spark.range(cluster).select(
        (F.col("id") + n * 10 * (replicas + 1)).alias("doc_id"),
        F.lit(boiler).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("boiler").alias("source"),
    )
    (wide.unionByName(hot)
     .withColumn("n_chars", F.length("text").cast("long"))
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--cluster", type=int, default=2000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("dds-stress-r7")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as d:
        build_corpus(spark, args.sf_dir, d, args.replicas, args.cluster)
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"corpus: {n} docs "
              f"({args.replicas}x + {args.cluster} planted dups)")

        from dagster_delta_spark.operators.curation import (
            dsir_importance_sample,
            quality_balanced_prune,
        )
        from dagster_delta_spark.operators.dedup import (
            strip_repeated_spans,
            winnow_repeated_spans,
        )
        from dagster_delta_spark.operators.graph import duplicate_components

        def run(name, make, describe):
            t0 = time.time()
            df = make()
            df.write.mode("overwrite").format("noop").save()
            wall = time.time() - t0
            print(f"{name}: {describe(df)} | {wall:.1f} s")

        run("winnow_repeated_spans",
            lambda: winnow_repeated_spans(spark, d),
            lambda df: f"{df.count()} repeated fps")
        run("strip_repeated_spans",
            lambda: strip_repeated_spans(spark, d),
            lambda df: f"{df.count()} docs")
        run("duplicate_components",
            lambda: duplicate_components(spark, d),
            lambda df: f"{df.select('component').distinct().count()}"
                       f" components / {df.count()} docs")
        run("dsir_importance_sample",
            lambda: dsir_importance_sample(spark, d, top_k=1000),
            lambda df: f"{df.count()} selected")
        run("quality_balanced_prune",
            lambda: quality_balanced_prune(spark, d),
            lambda df: f"{df.where('kept').count()} kept"
                       f" / {df.count()} docs")

        from dagster_delta_spark.operators.textops import heavy_hitter_tokens

        run("heavy_hitter_tokens",
            lambda: heavy_hitter_tokens(spark, d),
            lambda df: f"{df.count()} hitters")

        from dagster_delta_spark.operators.curation import bloom_decontaminate

        run("bloom_decontaminate",
            lambda: bloom_decontaminate(spark, d),
            lambda df: f"{df.where('contaminated').count()} flagged"
                       f" / {df.count()} docs")

    # incremental rollup maintenance: 20x lineitem base (one big
    # initial commit + one 5% append); compare ONE maintenance fold of
    # the append against a full recompute over the whole base
    import shutil

    from pyspark.sql import functions as F

    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.operators.incremental import maintain_rollup

    d2 = tempfile.mkdtemp(prefix="dds-stress-incr-")
    try:
        li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
        n = li.count()
        wide = (
            li.crossJoin(
                spark.range(args.replicas).withColumnRenamed("id", "rep"))
            .withColumn("l_orderkey",
                        F.col("l_orderkey") + F.col("rep") * (n * 10))
            .drop("rep")
        )
        base = DeltaSparkTable(spark, d2 + "/base")
        rollup = DeltaSparkTable(spark, d2 + "/roll")
        base.write(wide, WriteMode.error)                       # v0: 20x
        keys = ["l_returnflag", "l_linestatus"]
        measures = {
            "sum_qty": ("CAST(SUM(CAST(l_quantity AS DECIMAL(30,10)))"
                        " AS DECIMAL(30,10))"),
            "n_rows": "COUNT(*)",
        }
        v = maintain_rollup(base, rollup, keys, measures, -1)
        base.write(li, WriteMode.append)                        # v1: +5%
        t0 = time.time()
        maintain_rollup(base, rollup, keys, measures, v)
        incr = time.time() - t0
        t0 = time.time()
        base.read().groupBy(*keys).agg(
            *[F.expr(e).alias(c) for c, e in measures.items()]
        ).write.mode("overwrite").format("noop").save()
        full = time.time() - t0
        print(f"incr_rollup_maintain (fold 5% append into 20x base): "
              f"{incr:.1f} s vs full recompute {full:.1f} s "
              f"({full / max(incr, 1e-9):.1f}x)")
    finally:
        shutil.rmtree(d2, ignore_errors=True)

    # deletion vectors vs rewrite at 20x: scattered ~2% delete on a
    # 12M-row table — DV writes only the mask, rewrite copies every
    # touched file's keep-rows; then the post-DV read overhead
    d3 = tempfile.mkdtemp(prefix="dds-stress-dv-")
    try:
        li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
        n = li.count()
        wide = (
            li.crossJoin(
                spark.range(args.replicas).withColumnRenamed("id", "rep"))
            .withColumn("l_orderkey",
                        F.col("l_orderkey") + F.col("rep") * (n * 10))
            .drop("rep")
        )
        pred = "l_quantity >= 49"  # ~2%, scattered through every file
        walls = {}
        for mode, use_dv in (("dv", True), ("rewrite", False)):
            t = DeltaSparkTable(spark, f"{d3}/{mode}")
            t.write(wide, WriteMode.error)
            t0 = time.time()
            res = t.delete(pred, use_dv=use_dv)
            walls[mode] = time.time() - t0
            if mode == "dv":
                t0 = time.time()
                t.read().write.mode("overwrite").format("noop").save()
                walls["dv_read"] = time.time() - t0
                walls["dv_rows"] = res["num_deleted_rows"]
        print(f"delete 2% of 12M rows: DV {walls['dv']:.1f} s vs "
              f"rewrite {walls['rewrite']:.1f} s "
              f"({walls['rewrite'] / max(walls['dv'], 1e-9):.1f}x; "
              f"{walls['dv_rows']} rows masked); "
              f"post-DV full read {walls['dv_read']:.1f} s")
    finally:
        shutil.rmtree(d3, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
