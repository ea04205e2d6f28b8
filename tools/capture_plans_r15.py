"""Capture .explain("formatted") output for r15-optimization target
queries into plans/r15/<name>_<tag>.txt (tag = before / after).

Usage: python tools/capture_plans_r15.py <tag> [name ...]

Runs on sf0.1 with the bench session shape (local[32], shuffle
partitions = cpus, AQE on) so the captured plans are the ones the
bench actually executes.  Names default to the full target list.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

# declared queries whose registry entry IS the benched plan, plus the
# bare operators bench.py's `direct` map times (tagged _bare)
TARGETS = [
    "bm25_search",
    "hybrid_search_rrf",
    "fuzzy_name_matches",
    "embedding_decontaminate",
    "cosine_topk",
    "winnow_repeated_spans",
    "strip_repeated_spans",
    "duplicate_components",
    "dsir_importance_sample",
    "bloom_decontaminate",
    "near_dup_jaccard",
    "line_dedup_corpus",
    "token_stats",
    "heavy_hitter_tokens",
    "text_quality",
    "gopher_quality_filter",
    "corpus_shuffle",
    "token_budget_sample",
    "unimax_sample",
    "ccnet_perplexity_buckets",
    "bigram_perplexity",
    "doremi_domain_weights",
    "pmi_collocations",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "events_sessionize",
    "events_hourly_rollup",
    "order_lineitem_rollup",
    "revenue_rollup_cube",
    "asof_clicks_purchases",
    "range_join_bursts",
    "topk_window",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .appName("dds-plan-capture")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    # bare operators (what bench times) for guarded/dial-carrying
    # entries — mirror bench.py's `direct` map where it matters here
    from dagster_delta_spark.operators import classify as _classify
    from dagster_delta_spark.operators import curation as _curation
    from dagster_delta_spark.operators import dedup as _dedup
    from dagster_delta_spark.operators import textops as _textops

    bare = {
        "minhash_lsh_near_dups": _dedup.minhash_lsh_near_dups,
        "simhash_near_dups": _dedup.simhash_near_dups,
        "near_dup_decontaminate": _curation.near_dup_decontaminate,
        "nb_classifier_scores": _classify.nb_classifier_scores,
        "selective_token_mask": _textops.selective_token_mask,
    }

    os.makedirs("/root/repo/plans/r15", exist_ok=True)
    for name in names:
        fn = bare.get(name) or qs.get(name)
        if fn is None:
            print(f"skip {name}: not in registry")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:
            print(f"FAIL {name}: {exc}")
            continue
        out = f"/root/repo/plans/r15/{name}_{tag}.txt"
        with open(out, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
