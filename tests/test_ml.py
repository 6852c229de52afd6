"""ML surface (ML1–ML6): classifier pipeline, contextualization rules,
embedding UDF determinism, KMeans taxonomy + c-TF-IDF keywords."""

import pytest
from pyspark.sql import functions as F

from scrappy_spark.ml.classifier import classify_terms, train_classifier, training_frame
from scrappy_spark.ml.contextualize import DOMAIN_SUFFIX, contextualize_terms
from scrappy_spark.ml.embeddings import embed_texts, hash_encoder_factory
from scrappy_spark.ml.taxonomy import assign_topics, build_taxonomy, topic_keywords


@pytest.fixture(scope="module")
def clf(spark):
    return train_classifier(spark)


def test_classifier_separates_training_classes(spark, clf):
    scored = classify_terms(clf, training_frame(spark).withColumnRenamed("text", "term"))
    joined = scored.join(
        training_frame(spark).withColumnRenamed("text", "term"), "term"
    )
    acc = joined.filter(F.col("predicted_class") == F.col("label")).count() / joined.count()
    assert acc >= 0.9  # separable 24-row training set


def test_classifier_on_new_terms(spark, clf):
    terms = spark.createDataFrame(
        [("ransomware in clinics",), ("network architecture upgrade",)], ["term"]
    )
    out = {r.term: r.predicted_class for r in classify_terms(clf, terms).collect()}
    assert out["ransomware in clinics"] == "threat"
    assert out["network architecture upgrade"] == "infrastructure"


def test_classifier_usable_after_observation_attached(spark, clf):
    """Regression: a df.observe() on the session makes the session's
    ObservationManager live; a fitted LR model that still carries its
    trainingSummary would then fail task serialization ("Task not
    serializable: ObservationManager") at inference. train_classifier
    strips the summary, so observe + classify in one session works."""
    from pyspark.sql import Observation

    obs = Observation("clf_obs_regression")
    inst = spark.range(8).observe(obs, F.count(F.lit(1)).alias("n"))
    inst.write.format("noop").mode("overwrite").save()
    assert obs.get["n"] == 8
    terms = spark.createDataFrame([("malware outbreak in clinic",)], ["term"])
    assert classify_terms(clf, terms).count() == 1


def test_classifier_arbitrary_label_sets(spark):
    """Labels must come from the fitted StringIndexer, not a hard-coded
    pair — a 3-class training set with different label names has to map
    predictions back to ITS labels."""
    rows = []
    for i in range(8):
        rows += [
            (f"goalkeeper save tackle corner match {i}", "sports"),
            (f"election parliament senate ballot vote {i}", "politics"),
            (f"sonata orchestra violin concerto tempo {i}", "music"),
        ]
    train = spark.createDataFrame(rows, "text string, label string")
    model = train_classifier(spark, train)
    terms = spark.createDataFrame(
        [("penalty kick goalkeeper",), ("senate ballot count",), ("violin concerto",)],
        ["term"],
    )
    out = {r.term: r.predicted_class for r in classify_terms(model, terms).collect()}
    assert out["penalty kick goalkeeper"] == "sports"
    assert out["senate ballot count"] == "politics"
    assert out["violin concerto"] == "music"


def test_contextualize_appends_domain_suffix(spark):
    classified = spark.createDataFrame(
        [("ransomware", "threat"), ("hospital wifi", "infrastructure")],
        ["term", "predicted_class"],
    )
    out = contextualize_terms(spark, classified).collect()
    by_term = {}
    for r in out:
        by_term.setdefault(r.term, []).append(r.search_string)
    # non-domain term gets the suffix; domain-marked term does not
    assert all(s.endswith(DOMAIN_SUFFIX) for s in by_term["ransomware"])
    assert all(not s.endswith(DOMAIN_SUFFIX) for s in by_term["hospital wifi"])
    # themes multiply: threat class has 3 themes
    assert len(by_term["ransomware"]) == 3


def test_embeddings_deterministic_and_normalized(spark):
    df = spark.createDataFrame([(1, "spark engine"), (2, "spark engine"), (3, "")],
                               ["id", "text"])
    out = embed_texts(df).collect()
    vecs = {r.id: r.embedding for r in out}
    assert vecs[1] == vecs[2]
    assert len(vecs[1]) == 64
    assert abs(sum(v * v for v in vecs[1]) - 1.0) < 1e-5  # unit norm
    assert all(v == 0.0 for v in vecs[3])  # empty text → zero vector


def test_taxonomy_clusters_related_docs(spark):
    rows = [(i, "database query optimizer join index") for i in range(6)]
    rows += [(i + 10, "neural network training gradient descent") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    clustered = assign_topics(df, k=2, seed=1)
    topics = {r.doc_id: r.Topic for r in clustered.collect()}
    db_topics = {topics[i] for i in range(6)}
    nn_topics = {topics[i + 10] for i in range(6)}
    assert len(db_topics) == 1 and len(nn_topics) == 1 and db_topics != nn_topics

    kw = {r.Topic: r.topic_keywords for r in topic_keywords(clustered).collect()}
    db_kw = kw[topics[0]]
    assert "optimizer" in db_kw or "database" in db_kw
    assert len(db_kw) <= 5


def test_taxonomy_audit_flags(spark):
    """The banded-flag audit (q_taxonomy_topics' query shape) must pin
    every flag to 1 on a corpus with two clean topic groups, and report
    exact counts."""
    from scrappy_spark.ml.taxonomy import taxonomy_audit

    rows = [(i, "database query optimizer join index") for i in range(8)]
    rows += [(i + 10, "neural network training gradient descent") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    row = taxonomy_audit(df, k=2, seed=1, top_n=5).first().asDict()
    assert row == {
        "n_docs": 16,
        "n_topics": 2,
        "n_unassigned": 0,
        "sizes_in_band": 1,
        "cohesion_ok": 1,
        "kw_ok": 1,
    }


def test_taxonomy_audit_catches_imbalance(spark):
    """A degenerate size band must FAIL the flag (the audit is a real
    gate, not a tautology): with max_size_bp below the actual majority
    share, sizes_in_band drops to 0."""
    from scrappy_spark.ml.taxonomy import taxonomy_audit

    rows = [(i, "database query optimizer join index") for i in range(12)]
    rows += [(i + 20, "neural network training gradient descent") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    row = taxonomy_audit(df, k=2, seed=1, max_size_bp=5000).first().asDict()
    assert row["sizes_in_band"] == 0
    assert row["n_topics"] == 2


def test_build_taxonomy_end_to_end(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    out = build_taxonomy(docs, k=4, seed=7)
    assert out.count() == 100
    assert set(out.columns) >= {"doc_id", "text", "Topic", "topic_keywords", "embedding"}
    n_topics = out.select("Topic").distinct().count()
    assert 1 <= n_topics <= 4
    assert out.filter(F.size("topic_keywords") == 0).count() == 0


def test_embeddings_zero_vector_iff_token_free(spark):
    """The encoder leaves a zero vector EXACTLY for texts with no
    alphanumeric tokens — the sharp invariant behind q_embed_vectors'
    norm-in-{0,1} audit flag (the driver gate accepts both values;
    this test pins which texts may produce which)."""
    df = spark.createDataFrame(
        [(0, "real words here"), (1, "!!! ... ---"), (2, ""), (3, "x")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["embedding"] for r in embed_texts(df).collect()}
    norms = {k: sum(v * v for v in vec) ** 0.5 for k, vec in out.items()}
    assert abs(norms[0] - 1.0) < 1e-6 and abs(norms[3] - 1.0) < 1e-6
    assert norms[1] == 0.0 and norms[2] == 0.0  # token-free -> zero
