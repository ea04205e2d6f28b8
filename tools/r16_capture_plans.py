"""Capture .explain('formatted') for r16-touched queries.

Usage: python tools/r16_capture_plans.py <suffix> <name>[,name...]
Writes plans/r16/<name>_<suffix>.txt under the bench session shape.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .appName("dds-plan-capture").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dagster_delta_spark.operators import similarity as sim
    from dagster_delta_spark.operators import textops
    from dagster_delta_spark.operators import curation, dedup, relational

    builders = {
        "q1_pricing_summary":
            lambda: relational.q1_pricing_summary(spark, sf_dir),
        "winnow_repeated_spans":
            lambda: dedup.winnow_repeated_spans(spark, sf_dir),
        "dsir_importance_sample":
            lambda: curation.dsir_importance_sample(spark, sf_dir),
        "bigram_perplexity":
            lambda: textops.bigram_perplexity(spark, sf_dir),
        "cosine_topk": lambda: sim.cosine_topk(spark, sf_dir),
        "ann_ivf_topk": lambda: sim.ivf_ann_topk(spark, sf_dir),
        "ann_ivf_quantized_topk":
            lambda: sim.ivf_quantized_topk(spark, sf_dir),
        "ann_ivf_pq_topk": lambda: sim.ivf_pq_topk(spark, sf_dir),
        "ann_lsh_topk": lambda: sim.lsh_ann_topk(spark, sf_dir),
        "hybrid_search_rrf": lambda: sim.hybrid_search_rrf(spark, sf_dir),
        "bm25_search": lambda: textops.bm25_search(spark, sf_dir),
    }
    os.makedirs("plans/r16", exist_ok=True)
    for name in names:
        b = builders.get(name)
        if b is None and name == "dsir_importance_sample":
            from dagster_delta_spark.operators import curation
            b = lambda: curation.dsir_importance_sample(spark, sf_dir)  # noqa: E731,E501
        df = b()
        out = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = f"plans/r16/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(out)
        print(f"wrote {path} ({out.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
