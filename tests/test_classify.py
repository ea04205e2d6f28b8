"""Distributed multinomial Naive Bayes (operators/classify.py)."""

import math

import pytest
from pyspark.sql import functions as F

from dagster_delta_spark.operators import classify


def toy_docs(spark):
    # two clean classes: 'a'-docs say apple, 'b'-docs say banana
    rows = [
        (0, "apple apple pie", "a"),
        (1, "apple tart", "a"),
        (2, "banana split", "b"),
        (3, "banana banana bread", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, label string")


def test_nb_train_hand_computed(spark):
    model, classes = classify.nb_train(toy_docs(spark), "label")
    m = {(r["label"], r["token"]): r["logp"] for r in model.collect()}
    c = {r["label"]: (r["log_prior"], r["logp_default"])
         for r in classes.collect()}
    # vocab = {apple, pie, tart, banana, split, bread} -> V=6
    # class a: 5 tokens; P(apple|a) = (3+1)/(5+6)
    assert m[("a", "apple")] == pytest.approx(math.log(4 / 11))
    assert m[("a", "pie")] == pytest.approx(math.log(2 / 11))
    # class b: 5 tokens; P(banana|b) = (3+1)/(5+6)
    assert m[("b", "banana")] == pytest.approx(math.log(4 / 11))
    # priors 2/4 each; default = 1/(5+6)
    assert c["a"][0] == pytest.approx(math.log(0.5))
    assert c["a"][1] == pytest.approx(math.log(1 / 11))
    assert c["b"][1] == pytest.approx(math.log(1 / 11))


def test_nb_score_and_predict(spark):
    docs = toy_docs(spark)
    model, classes = classify.nb_train(docs, "label")
    scores = classify.nb_score(docs, model, classes)
    # 4 docs x 2 classes
    assert scores.count() == 8
    pred = {r["doc_id"]: r["predicted"]
            for r in classify.nb_predict(scores).collect()}
    assert pred == {0: "a", 1: "a", 2: "b", 3: "b"}
    # hand-check doc 0 ('apple apple pie') under class a:
    # log(1/2) + 2*log(4/11) + log(2/11)
    got = scores.where("doc_id = 0 AND label = 'a'").collect()[0]["score"]
    want = math.log(0.5) + 2 * math.log(4 / 11) + math.log(2 / 11)
    assert got == pytest.approx(want, abs=1e-6)


def test_nb_unseen_token_uses_default(spark):
    docs = toy_docs(spark)
    model, classes = classify.nb_train(docs, "label")
    target = spark.createDataFrame(
        [(9, "banana banana")], "doc_id bigint, text string")
    s = classify.nb_score(target, model, classes)
    got = {r["label"]: r["score"] for r in s.collect()}
    # 'banana' unseen for class a -> default likelihood 1/11 per count
    assert got["a"] == pytest.approx(
        math.log(0.5) + 2 * math.log(1 / 11), abs=1e-6)
    assert got["b"] == pytest.approx(
        math.log(0.5) + 2 * math.log(4 / 11), abs=1e-6)


def test_planted_fixture_recovers_labels(spark):
    docs = classify.planted_label_docs(
        classify.load(spark, "/root/testdata/sf0.001", "documents"))
    model, classes = classify.nb_train(docs, "label")
    scores = classify.nb_score(docs, model, classes)
    joined = (
        classify.nb_predict(scores)
        .join(docs.select("doc_id", "label"), "doc_id")
    )
    n = joined.count()
    ok = joined.where("predicted = label").count()
    assert n > 0 and ok / n >= 0.95


def test_entry_guard_fires_on_broken_model(spark, monkeypatch):
    """The registry entry's accuracy guard must raise when the
    likelihood math breaks (here: a model whose log-probs are
    label-independent, so prediction collapses to the prior)."""
    import __spark_entry__ as entry

    real_train = classify.nb_train

    def broken_train(docs, label_col, smoothing=1.0):
        model, classes = real_train(docs, label_col, smoothing)
        return (
            model.withColumn("logp", F.lit(-1.0)),
            classes.withColumn("logp_default", F.lit(-1.0))
            .withColumn("log_prior", F.lit(0.0)),
        )

    monkeypatch.setattr(classify, "nb_train", broken_train)
    with pytest.raises(AssertionError, match="accuracy"):
        entry._nb_classifier(spark, "/root/testdata/sf0.001")


def test_shared_token_counts_path_identical(spark):
    """The tokenize-once path (r16): nb_train/nb_score fed a
    precomputed ``doc_token_counts`` frame must reproduce the default
    two-pass path bit-for-bit — including a zero-token doc, which
    counts toward priors but carries no token rows."""
    rows = [
        (0, "apple apple pie", "a"),
        (1, "apple tart", "a"),
        (2, "banana split", "b"),
        (3, "banana banana bread", "b"),
        (4, "", "a"),  # zero tokens: prior-only
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, label string")

    model0, classes0 = classify.nb_train(docs, "label")
    scores0 = classify.nb_score(docs, model0, classes0)

    counts = classify.doc_token_counts(docs, "label").localCheckpoint()
    model1, classes1 = classify.nb_train(
        docs, "label", token_counts=counts)
    scores1 = classify.nb_score(
        docs, model1, classes1, token_counts=counts)

    for a, b in ((model0, model1), (classes0, classes1),
                 (scores0, scores1)):
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
    # the zero-token doc reached priors (5 docs, 3 'a') but not scores
    prior_a = {r["label"]: r["log_prior"] for r in classes1.collect()}
    assert prior_a["a"] == pytest.approx(math.log(3 / 5))
    assert scores1.where("doc_id = 4").count() == 0


def test_nb_classifier_scores_matches_manual_pipeline(spark):
    """The benched operator (shared-counts + widened scan) must equal
    the generic two-pass pipeline on the real fixture."""
    sf = "/root/testdata/sf0.001"
    docs = classify.planted_label_docs(
        classify.load(spark, sf, "documents"))
    model, classes = classify.nb_train(docs, "label")
    expected = classify.nb_score(docs, model, classes)
    got = classify.nb_classifier_scores(spark, sf)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
