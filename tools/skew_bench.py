"""Measure LSH banding-join skew handling on a skew-planted 20x corpus
(VERDICT r6 task 7; results recorded in docs/SCALE.md).

Corpus: sf0.1 documents replicated 20x with per-replica perturbed text
(so ~100k UNIQUE docs — background load), plus a planted boilerplate
cluster of ``--cluster`` exact copies (default 2000) — the hot-bucket
case: every one of the cluster's LSH buckets holds all its members.

Measured, each as a forced count() over the CANDIDATE stage (the
banding join — verification cost is a separate, already-documented
axis):

- minhash `_bucket_candidate_pairs` capped (256 / 1000) vs uncapped
- simhash_near_dups (candidate join + inline popcount verify) capped
  vs uncapped
- each with AQE skew-join split enabled vs disabled

Usage: python tools/skew_bench.py [--cluster 2000] [--replicas 20]
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
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    n = docs.count()
    wide = (
        docs.crossJoin(
            spark.range(replicas).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") + F.col("rep") * (n * 10)).alias("doc_id"),
            # perturb per replica so the background stays unique —
            # only the planted cluster below is true duplicate mass
            F.concat_ws(" ", "text",
                        F.concat(F.lit("rep"), F.col("rep"))).alias("text"),
        )
    )
    boiler = " ".join(f"legal boilerplate clause {i % 13}" for i in range(40))
    hot = spark.range(cluster).select(
        (F.col("id") + n * 10 * (replicas + 1)).alias("doc_id"),
        F.lit(boiler).alias("text"),
    )
    wide.unionByName(hot).write.mode("overwrite").parquet(
        f"{out}/documents.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--cluster", type=int, default=2000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .appName("dds-skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dagster_delta_spark.operators import dedup

    out = tempfile.mkdtemp(prefix="dds-skew-")
    build_corpus(spark, args.sf_dir, out, args.replicas, args.cluster)
    n_docs = spark.read.parquet(f"{out}/documents.parquet").count()
    print(f"corpus: {n_docs} docs incl. {args.cluster}-copy hot cluster",
          flush=True)

    # one-off index builds (cached; excluded from the timed joins)
    t0 = time.perf_counter()
    sigs = dedup.minhash_signatures(spark, out)
    buckets = dedup.band_buckets(sigs, 64, 16).localCheckpoint()
    print(f"minhash signature+bucket build: "
          f"{time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    dedup.simhash_signatures(spark, out).count()
    print(f"simhash signature build: {time.perf_counter() - t0:.1f} s",
          flush=True)

    def timed(label, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"{label}: {time.perf_counter() - t0:.1f} s ({r} rows)",
              flush=True)

    for skew in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
        for cap in (256, 1000, None):
            timed(
                f"minhash candidates cap={cap} skewJoin={skew}",
                lambda: dedup._bucket_candidate_pairs(buckets, cap).count(),
            )
        for cap in (256, 1000, None):
            timed(
                f"simhash pairs cap={cap} skewJoin={skew}",
                lambda: dedup.simhash_near_dups(
                    spark, out, max_bucket_size=cap).count(),
            )
    spark.stop()


if __name__ == "__main__":
    main()
