"""End-to-end training-corpus curation.

Composes the individually-verified operators (language ID, quality
scoring, exact + near dedup) into the one pipeline an LLM data team
actually runs, landing the curated corpus in the engine's
transactional table format.  Each stage is a verified building block
(lang_id / text_quality / dedup_exact all have DuckDB oracles;
minhash_cluster_keep is unit-tested against known clusters), so the
composition's correctness is anchored stage-by-stage.

Plan shape at 100 TB: lang/quality are pure codegen'd projections
computed inline on the single corpus scan (no joins, no shuffle);
exact dedup is one hash-groupBy shuffle; the optional
near-dup stage is the banded MinHash join (bucketed, not all-pairs);
the write is a distributed parquet job + one metadata commit.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup, textops


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    table_uri: Optional[str] = None,
    *,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    min_tokens: int = 5,
    near_dedup: bool = False,
) -> DataFrame:
    """Filter -> dedup -> (optionally) near-dedup -> land.

    Returns the curated documents (doc_id, text, lang, source,
    n_tokens, quality_score).  When ``table_uri`` is given the result
    is also committed to a transactional table (overwrite), so the
    curated corpus is versioned and time-travelable like any other
    asset.
    """
    # ONE corpus scan: quality and language are map-only column
    # builders appended inline (textops.with_text_quality /
    # with_lang_pred) — joining their doc_id projections back would
    # scan documents three times and shuffle the full text-bearing
    # corpus twice for what is pure per-row arithmetic
    docs = textops.load(spark, sf_dir, "documents")
    scored = textops.with_lang_pred(textops.with_text_quality(docs))
    kept = scored.where(
        F.col("lang_pred").isin(list(langs))
        & (F.col("quality_score") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    )

    # exact dedup: keep the smallest doc_id per normalized-content hash
    # (same keeper rule as dedup_exact, so the stage is oracle-anchored)
    norm = textops.NORM_TEXT
    keepers = (
        kept.select("doc_id", F.expr(f"md5({norm})").alias("__fp"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    curated = kept.join(keepers, "doc_id").select(
        "doc_id", "text", "lang", "source", "n_tokens", "quality_score"
    )

    if near_dedup:
        # keepers are recomputed among FILTER SURVIVORS: the global
        # keep flag points at each cluster's overall representative,
        # which the lang/quality filter may have removed — joining on
        # it would drop the whole cluster instead of keeping its best
        # surviving member
        clusters = dedup.minhash_cluster_keep(spark, sf_dir).select(
            "doc_id", "cluster_id"
        )
        # clustered feeds two plan branches (survivor agg + final join);
        # a lazy localCheckpoint materializes the expensive
        # curation+clustering subtree once instead of twice, runs only
        # when the caller actually consumes the result, and its blocks
        # free when the frame is garbage-collected
        clustered = curated.join(clusters, "doc_id").localCheckpoint(eager=False)
        survivors = clustered.groupBy("cluster_id").agg(
            F.min("doc_id").alias("doc_id")
        )
        curated = clustered.join(survivors.select("doc_id"), "doc_id").drop(
            "cluster_id"
        )

    if table_uri is not None:
        from ..config import WriteMode
        from ..table import DeltaSparkTable

        DeltaSparkTable(spark, table_uri).write(
            curated, WriteMode.overwrite, partition_columns=["lang"]
        )
    return curated


def curation_report(curated: DataFrame, total_docs: int) -> dict[str, Any]:
    """Driver-side summary of a curation run (metadata-sized)."""
    row = curated.agg(
        F.count(F.lit(1)).alias("kept"),
        F.sum("n_tokens").alias("tokens"),
        F.avg("quality_score").alias("avg_quality"),
    ).collect()[0]
    return {
        "docs_in": total_docs,
        "docs_kept": row["kept"],
        "keep_rate": row["kept"] / max(total_docs, 1),
        "total_tokens": int(row["tokens"] or 0),
        "avg_quality": float(row["avg_quality"] or 0.0),
    }
