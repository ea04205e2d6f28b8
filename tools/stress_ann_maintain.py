"""Measure incremental IVF maintenance vs full rebuild on a 20x
corpus (~1M vectors): bootstrap the index over 20 replicas of the
sf0.1 embeddings (per-replica perturbation keeps vectors unique),
append a 5% delta, then time ONE maintain_ivf_index fold against a
from-scratch build_ivf_index of the grown table.  The gap is the
recurring per-arrival cost the incremental path removes — it grows
with the indexed corpus while the fold stays proportional to the
delta.  Results recorded in docs/SCALE.md "Measured stress points".

Usage: python tools/stress_ann_maintain.py [--replicas 20]
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
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dagster_delta_spark import DeltaSparkTable, WriteMode
    from dagster_delta_spark.operators import incremental as incr

    src = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    n = src.count()
    wide = (
        src.crossJoin(spark.range(args.replicas).withColumnRenamed("id", "rep"))
        .select(
            (F.col("vec_id") + F.col("rep") * (n * 10)).alias("vec_id"),
            # per-replica perturbation: rotate one component by a
            # rep-dependent nudge so replicas are distinct vectors
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + (rep % 7) * 0.01 "
                "* (CASE WHEN i = rep % size(embedding) THEN 1 ELSE 0 END) "
                "AS FLOAT))"
            ).alias("embedding"),
        )
    )
    root = tempfile.mkdtemp(prefix="dds-ann-stress-")
    emb = DeltaSparkTable(spark, f"{root}/emb")
    index = DeltaSparkTable(spark, f"{root}/ivf")

    emb.write(wide.where("vec_id % 20 != 0"), WriteMode.error)   # ~95%
    t0 = time.perf_counter()
    incr.build_ivf_index(emb, index)
    t_build = time.perf_counter() - t0
    n_base = index.read().count()

    emb.write(wide.where("vec_id % 20 = 0"), WriteMode.append)   # ~5% delta
    t0 = time.perf_counter()
    incr.maintain_ivf_index(emb, index)
    t_maint = time.perf_counter() - t0
    n_total = index.read().count()

    rebuild = DeltaSparkTable(spark, f"{root}/ivf_rebuild")
    t0 = time.perf_counter()
    incr.build_ivf_index(emb, rebuild)
    t_rebuild = time.perf_counter() - t0

    bad = incr.ivf_index_vs_rebuild(emb, index).count()
    print(
        f"vectors base={n_base} total={n_total} | "
        f"bootstrap build {t_build:.1f} s | "
        f"maintain 5% delta {t_maint:.1f} s | "
        f"full rebuild {t_rebuild:.1f} s ({t_rebuild / t_maint:.1f}x) | "
        f"parity mismatches {bad}"
    )

    # r8: merge-on-read DML fold — a 2% DV delete + 0.1% DV update,
    # consumed through the row-level change feed instead of forcing a
    # rebuild.  The alternative cost is t_rebuild above.
    emb.delete("vec_id % 50 = 1", use_dv=True)
    emb.update(
        {"embedding": "transform(embedding, x -> CAST(-x AS FLOAT))"},
        "vec_id % 1000 = 2", use_dv=True)
    t0 = time.perf_counter()
    incr.maintain_ivf_index(emb, index)
    t_dml = time.perf_counter() - t0
    bad_dml = incr.ivf_index_vs_rebuild(emb, index).count()
    print(
        f"DV-DML fold (2% delete + 0.1% update) {t_dml:.1f} s "
        f"vs {t_rebuild:.1f} s rebuild ({t_rebuild / t_dml:.1f}x) | "
        f"index rows {index.read().count()} | parity mismatches {bad_dml}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
