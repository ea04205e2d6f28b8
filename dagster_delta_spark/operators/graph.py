"""Distributed graph operators: connected components via min-label
propagation over a bipartite membership frame.

A duplicate graph is never materialized as pairs at scale (a
d-duplicate cluster is d^2/2 edges); every consumer in this engine —
LSH cluster dedup, leakage-safe splits, and the generic
``duplicate_components`` here — works on the bipartite
``(node, key)`` membership instead, where components cost
O(|membership|) per propagation round regardless of duplicate-set
size.  The reference defers all user compute (SURVEY §2.6-2.8); this
module is additive engine surface like ``dedup.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import load


def bipartite_components(
    membership: DataFrame,
    node_col: str = "doc_id",
    key_cols: Sequence[str] = ("fp",),
    iterations: Optional[int] = None,
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components of the graph "nodes sharing a key are
    connected": min-label propagation over the bipartite
    ``(node, key)`` frame.  Each round, a key takes its members'
    minimum label and each node takes its keys' minimum — after
    convergence every node carries the minimum node id reachable in
    its component, the canonical deterministic component id.

    Runs TO CONVERGENCE by default: labels only decrease, so an
    unchanged label sum is a fixed point (one tiny aggregate per
    round over the already-materialized labels).  A component of
    graph diameter d converges in ~d/2 rounds; ``max_iterations``
    bounds pathological chains and ``iterations`` pins an exact round
    count for tests.

    Scale: cost per round is O(|membership|) — two keyed shuffles
    (key, then node) with partial aggregation — independent of
    component sizes; lineage is cut per round (localCheckpoint), the
    same loop shape as ``dedup.minhash_cluster_keep`` (which
    delegates here).  Returns ``(node_col, component)`` for every
    node present in ``membership``.
    """
    keys = list(key_cols)
    member = membership.select(node_col, *keys).distinct().localCheckpoint(
        eager=False
    )
    labels = member.select(node_col).distinct().withColumn(
        "lbl", F.col(node_col)
    )
    rounds = iterations if iterations is not None else max_iterations
    prev_sum = None
    for _ in range(rounds):
        key_min = (
            member.join(labels, node_col)
            .groupBy(*keys)
            .agg(F.min("lbl").alias("kmin"))
        )
        labels = (
            member.join(key_min, keys)
            .groupBy(node_col)
            .agg(F.min("kmin").alias("lbl"))
            # cut lineage each round: the plan otherwise deepens by
            # 2 joins + 2 aggs per iteration and analysis/codegen
            # cost grows superlinearly past a few rounds
            .localCheckpoint()
        )
        if iterations is None:
            # labels are monotonically nonincreasing, so an unchanged
            # sum IS convergence
            cur = labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)"))).first()[0]
            if cur == prev_sum:
                break
            prev_sum = cur
    return labels.select(node_col, F.col("lbl").alias("component"))


def duplicate_components(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    window: int = 4,
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components of the substring-duplicate graph: two
    documents are connected when they share a winnowed k-gram
    fingerprint (``dedup.winnow_fingerprints`` — any common token run
    of length >= k + window - 1 guarantees a shared fingerprint), and
    components are the transitive closure — the "duplicate family"
    unit that cluster-level dedup, leakage-safe splitting, and
    per-family quota sampling all consume.  Chains matter: A~B and
    B~C puts A and C in one family even when A and C share nothing,
    which pairwise near-dup lists structurally cannot express.

    Only fingerprints shared by >= 2 documents enter propagation
    (singleton fps cannot affect components — dropping them shrinks
    the membership to the boilerplate-bearing slice); documents with
    no shared fingerprint come back as singleton components of
    themselves.  Output: ``(doc_id, component)`` for EVERY document,
    component = min doc_id of the family.

    Oracle: the DuckDB twin computes the same closure with a
    recursive CTE — propagation depth is algorithm-specific but the
    fixpoint is unique, so both engines agree exactly.
    """
    from .dedup import winnow_fingerprints

    fps = winnow_fingerprints(spark, sf_dir, k, window)
    shared = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("fp")
    )
    member = fps.join(shared, "fp").select("doc_id", "fp")
    comp = bipartite_components(
        member, "doc_id", ("fp",), max_iterations=max_iterations
    )
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
    )
