"""Distributed text classification for training-data pipelines.

A multinomial Naive Bayes classifier trained and scored entirely with
DataFrame aggregations — the fasttext-shaped "learned quality / domain
/ language filter" slot in an LLM data pipeline (the heuristic lang-id
in ``textops.py`` is the cold-start cousin; this one LEARNS token
likelihoods from labeled data).  No Python UDFs anywhere: training is
two groupBys over the exploded token stream, scoring is one join +
one aggregation, so both scale linearly with corpus splits.

Scale design (100 TB):

- The token stream is the only corpus-sized intermediate; both
  training aggregations are partial-aggregated map-side before their
  single shuffle each.
- The model (vocabulary x classes log-likelihoods) is data-sized in
  the VOCABULARY, not the corpus — it broadcast-joins when small and
  falls back to a shuffle hash join on ``token`` otherwise (Spark's
  planner decides from size stats; no collect of the model on the
  driver either way).
- The class list (priors + unseen-token defaults) is constant-sized
  and always broadcast.
- Scoring emits docs x classes rows and reduces them with one
  partial-aggregated sum — the argmax (if a caller wants hard labels)
  is a per-doc max_by, not a window over the corpus.

Numeric parity contract with the DuckDB oracle: identical expression
shapes (``ln((tc + a) / (ct + a*V))``), double math end-to-end, final
scores rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import load
from .textops import TOKENS


def token_label_stream(docs: DataFrame, label_col: str) -> DataFrame:
    """(doc_id, label, token) — one row per token occurrence."""
    return docs.select(
        "doc_id",
        F.col(label_col).alias("label"),
        F.explode(F.expr(TOKENS)).alias("token"),
    )


def doc_token_counts(docs: DataFrame, label_col: str) -> DataFrame:
    """(doc_id, label, token, cnt) — per-document token-occurrence
    counts, ONE tokenize pass serving both training and scoring
    (``label`` is per-doc metadata, so the (label, token) training
    counts are exact integer sums of these rows and the scoring
    (doc_id, token) counts are a projection).  Callers that train and
    score the same corpus checkpoint this once and pass it to both
    ``nb_train`` and ``nb_score`` — see ``nb_classifier_scores``."""
    return (
        docs.select(
            "doc_id",
            F.col(label_col).alias("label"),
            F.explode(F.expr(TOKENS)).alias("token"),
        )
        .groupBy("doc_id", "label", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def nb_train(
    docs: DataFrame, label_col: str, smoothing: float = 1.0,
    token_counts: DataFrame = None,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB: returns ``(model, classes)``.

    ``model``: (label, token, logp) with
    ``logp = ln((count(token,label) + a) / (tokens(label) + a*V))``.
    ``classes``: (label, log_prior, logp_default) where
    ``logp_default`` is the unseen-token likelihood of that class.
    Two shuffles total (token-class counts, class totals); the
    vocabulary size and doc totals are scalar aggregates.

    ``token_counts`` (optional): a precomputed ``doc_token_counts``
    frame — the (label, token) counts then derive as exact integer
    sums instead of re-tokenizing ``docs`` (``docs`` is still read
    for priors: zero-token docs count toward priors but have no
    token rows)."""
    if token_counts is None:
        toks = token_label_stream(docs, label_col)
        grouped = toks.groupBy("label", "token").agg(
            F.count(F.lit(1)).alias("tc"))
    else:
        grouped = token_counts.groupBy("label", "token").agg(
            F.sum("cnt").alias("tc"))
    # vocabulary x classes sized — checkpointed (r15) because THREE
    # consumers read it: the vocab-size scalar below (an eager action
    # at train time), the class-totals aggregate and the model
    # projection.  Without the checkpoint each consumer re-tokenized
    # and re-shuffled the whole corpus; with it the corpus pass runs
    # once and the model lineage starts from a size-known frame (so
    # the scoring join can plan a broadcast).
    tcc = grouped.localCheckpoint(eager=False)
    class_tokens = tcc.groupBy("label").agg(F.sum("tc").alias("ct"))
    vocab = tcc.select("token").distinct().count()
    a = float(smoothing)

    model = tcc.join(class_tokens, "label").select(
        "label",
        "token",
        F.log(
            (F.col("tc") + F.lit(a)) / (F.col("ct") + F.lit(a * vocab))
        ).alias("logp"),
    )

    n_docs = docs.count()
    class_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    classes = class_docs.join(class_tokens, "label").select(
        "label",
        F.log(F.col("n") / F.lit(float(n_docs))).alias("log_prior"),
        F.log(
            F.lit(a) / (F.col("ct") + F.lit(a * vocab))
        ).alias("logp_default"),
    )
    return model, classes


def nb_score(
    docs: DataFrame, model: DataFrame, classes: DataFrame,
    token_counts: DataFrame = None,
) -> DataFrame:
    """Log-posterior of every (doc, class): (doc_id, label, score).

    Docs with zero tokens carry no evidence and are excluded (same
    contract as the oracle, whose token unnest drops them).  The score
    is rounded to 6 decimals — the fp-association headroom is ~1e-11
    for realistic doc lengths, so both engines land on the same
    rounded value.

    ``token_counts`` (optional): a precomputed ``doc_token_counts``
    frame — the per-doc counts then project straight off it instead
    of re-tokenizing ``docs`` (identical rows: the extra ``label``
    grouping key is functionally determined by ``doc_id``)."""
    if token_counts is not None:
        dtc = token_counts.select("doc_id", "token", "cnt")
    else:
        dtc = (
            docs.select(
                "doc_id", F.explode(F.expr(TOKENS)).alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    return (
        dtc.crossJoin(F.broadcast(classes))
        .join(model, ["token", "label"], "left")
        .groupBy("doc_id", "label", "log_prior")
        .agg(
            F.sum(
                F.col("cnt")
                * F.coalesce(F.col("logp"), F.col("logp_default"))
            ).alias("ll")
        )
        .select(
            "doc_id",
            "label",
            F.round(F.col("log_prior") + F.col("ll"), 6).alias("score"),
        )
    )


def nb_predict(scores: DataFrame) -> DataFrame:
    """Hard labels from per-class scores: (doc_id, predicted).
    Deterministic tie-break on the label string so both engines (and
    any partitioning) agree."""
    return scores.groupBy("doc_id").agg(
        F.max_by(
            "label", F.struct(F.col("score"), F.col("label"))
        ).alias("predicted")
    )


# The fixture's class-marker injection, shared verbatim (modulo
# dialect casts) with the DuckDB oracle in __spark_entry__.py.
PLANTED_TEXT = (
    "concat(text, repeat(concat(' mk', CAST(doc_id % 4 AS STRING)),"
    " CAST(1 + doc_id % 3 AS INT)))"
)
PLANTED_LABEL = "concat('c', CAST(doc_id % 4 AS STRING))"


def planted_label_docs(docs: DataFrame) -> DataFrame:
    """Deterministic 4-class training fixture: the testdata's
    ``lang``/``source`` labels are uniform noise over a SHARED
    vocabulary by construction (measured: NB lands at the 44%
    majority-class baseline), so a learnable corpus is derived from
    the corpus itself — class ``c{doc_id % 4}`` plants 1-3 ``mk{k}``
    marker tokens amid the ~40-token shared-vocab noise.  Recovery of
    the planted signal is the self-test; both engines build the
    fixture with the same expression."""
    return docs.select(
        "doc_id",
        F.expr(PLANTED_TEXT).alias("text"),
        F.expr(PLANTED_LABEL).alias("label"),
    )


def nb_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry operator: train NB on the planted-label fixture, emit
    every (doc_id, label, score).  Train == score set here (the oracle
    mirrors that); production trains on a labeled slice and scores the
    firehose with the same ``nb_score`` call."""
    from .relational import widen_for_compute

    raw = load(spark, sf_dir, "documents")
    docs = planted_label_docs(raw)
    # tokenize ONCE (r16): train and score both read one checkpointed
    # per-doc count frame, built off a widened scan (guide §2.5 —
    # the interpreted tokenizer otherwise runs twice, each pass pinned
    # to one task by a single-row-group input; the widening exchange
    # is paid once, inside this frame's materialization).  Priors and
    # doc totals stay on the raw column-pruned scan.
    counts = doc_token_counts(
        planted_label_docs(widen_for_compute(raw)), "label"
    ).localCheckpoint(eager=False)
    model, classes = nb_train(docs, "label", token_counts=counts)
    return nb_score(docs, model, classes, token_counts=counts)
