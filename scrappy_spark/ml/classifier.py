"""Term classifier (reference ML1/ML2, ``scrappy.py:33-44``): TF-IDF
features over 1-2 grams + logistic regression, as one MLlib Pipeline.

The reference trains sklearn ``TfidfVectorizer(ngram_range=(1,2),
stop_words='english') + LogisticRegression`` on ~32 labeled pairs from
``classifier_data.json`` and predicts a class per candidate term. The
MLlib shape is a Pipeline so the same object scales from 32 rows to
millions: tokenize → stopwords → bigrams → union tokens → CountVectorizer
→ IDF → LogisticRegression, with ``model.transform`` doing distributed
inference.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import (
    CountVectorizer,
    IDF,
    IndexToString,
    NGram,
    RegexTokenizer,
    SQLTransformer,
    StopWordsRemover,
    StringIndexer,
    StringIndexerModel,
)
from pyspark.sql import DataFrame, SparkSession

#: Engine-native training pairs, same shape and label set as the
#: reference's classifier_data.json (text, "threat"|"infrastructure")
#: but independently authored.
TRAINING_PAIRS: list[tuple[str, str]] = [
    ("ransomware attack on regional hospital network", "threat"),
    ("phishing campaign targeting clinicians", "threat"),
    ("malware outbreak in radiology workstations", "threat"),
    ("denial of service against patient portal", "threat"),
    ("data breach exposing medical records", "threat"),
    ("credential stuffing against health insurer", "threat"),
    ("zero day exploit in imaging software", "threat"),
    ("insider threat exfiltrating research data", "threat"),
    ("botnet traffic from infusion pumps", "threat"),
    ("supply chain compromise of vendor software", "threat"),
    ("adversarial attack on diagnostic model", "threat"),
    ("sql injection in appointment system", "threat"),
    ("hospital network segmentation design", "infrastructure"),
    ("electronic health record system deployment", "infrastructure"),
    ("medical device connectivity standards", "infrastructure"),
    ("telehealth platform architecture", "infrastructure"),
    ("clinical data warehouse migration", "infrastructure"),
    ("picture archiving communication system", "infrastructure"),
    ("identity management for care teams", "infrastructure"),
    ("cloud hosting for genomics pipelines", "infrastructure"),
    ("backup and disaster recovery planning", "infrastructure"),
    ("zero trust architecture rollout", "infrastructure"),
    ("wireless coverage in operating rooms", "infrastructure"),
    ("interoperability gateway for lab results", "infrastructure"),
]


def training_frame(spark: SparkSession) -> DataFrame:
    from ..functions.localrel import local_relation

    return local_relation(spark, TRAINING_PAIRS, "text string, label string")


def build_pipeline(vocab_size: int = 4096) -> Pipeline:
    """tokenize → stopword-filter → bigram → union(1,2)-grams →
    CountVectorizer → IDF → LR (the sklearn stack, MLlib-native).

    No IndexToString here: the index→label mapping belongs to the FITTED
    StringIndexerModel (any label set, any cardinality), so
    ``train_classifier`` appends it after fit. A hard-coded label list
    would silently mis-map every training set whose labels differ from
    the default pairs."""
    return Pipeline(
        stages=[
            RegexTokenizer(inputCol="text", outputCol="toks", pattern="[^a-z0-9]+", minTokenLength=1),
            StopWordsRemover(inputCol="toks", outputCol="toks_sw"),
            NGram(n=2, inputCol="toks_sw", outputCol="grams2"),
            SQLTransformer(statement="SELECT *, concat(toks_sw, grams2) AS all_grams FROM __THIS__"),
            CountVectorizer(inputCol="all_grams", outputCol="tf", vocabSize=vocab_size),
            IDF(inputCol="tf", outputCol="features"),
            StringIndexer(inputCol="label", outputCol="label_idx", stringOrderType="alphabetAsc"),
            LogisticRegression(featuresCol="features", labelCol="label_idx", maxIter=50),
        ]
    )


def train_classifier(spark: SparkSession, train: DataFrame | None = None) -> PipelineModel:
    """Fit the pipeline, then append an IndexToString whose labels come
    from the fitted StringIndexerModel — correct for arbitrary label
    sets (the prediction column carries no nominal metadata for
    IndexToString to discover on its own)."""
    model = build_pipeline().fit(train if train is not None else training_frame(spark))
    # Drop the LR training summary: it pins the fit-time SparkSession
    # inside the model, and serializing that session fails whenever an
    # Observation has been attached to it (non-serializable
    # ObservationManager) — i.e. any pipeline that mixes df.observe
    # counters with model inference. The summary is training-time
    # diagnostics only; inference never reads it. private[classification]
    # setSummary is public at bytecode level, so py4j can call it.
    for stage in model.stages:
        if isinstance(stage, LogisticRegressionModel):
            stage._java_obj.setSummary(
                spark._jvm.scala.Option.empty()  # type: ignore[union-attr]
            )
    indexer = next(s for s in model.stages if isinstance(s, StringIndexerModel))
    decoder = IndexToString(
        inputCol="prediction", outputCol="predicted_label", labels=indexer.labels
    )
    return PipelineModel(stages=[*model.stages, decoder])


def classify_terms(model: PipelineModel, terms: DataFrame, term_col: str = "term") -> DataFrame:
    """Distributed inference: terms → predicted class (reference
    predicts per candidate term, scrappy.py:43-44)."""
    scored = model.transform(terms.withColumnRenamed(term_col, "text"))
    return scored.select(
        scored.text.alias(term_col), scored.predicted_label.alias("predicted_class")
    )
