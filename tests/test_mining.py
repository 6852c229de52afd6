"""N-gram mining vs hand-computed expectations (A1–A6)."""

from pyspark.sql import functions as F

from scrappy_spark.operators.mining import (
    drop_subset_terms,
    term_frequencies,
    top_terms,
)


def _mini(spark):
    return spark.createDataFrame(
        [
            ("spark engine runs fast",),
            ("spark engine scales",),
            ("the fast engine",),  # 'the' is a stopword
        ],
        ["text"],
    )


def test_unigram_counts(spark):
    freqs = {
        r.term: r.freq
        for r in term_frequencies(_mini(spark), ngram_range=(1, 1)).collect()
    }
    assert freqs == {"spark": 2, "engine": 3, "runs": 1, "fast": 2, "scales": 1}


def test_bigram_counts_skip_stopwords(spark):
    freqs = {
        r.term: r.freq
        for r in term_frequencies(_mini(spark), ngram_range=(2, 2)).collect()
    }
    # stopwords removed BEFORE n-gram assembly (sklearn behavior):
    # 'the fast engine' yields bigram 'fast engine'
    assert freqs["spark engine"] == 2
    assert freqs["fast engine"] == 1
    assert "the fast" not in freqs


def test_topk_deterministic_tiebreak(spark):
    top = top_terms(_mini(spark), ngram_range=(1, 1), k=3).collect()
    assert [r.term for r in top] == ["engine", "fast", "spark"]  # 3, then tie 2-2 by term


def test_short_docs_yield_no_ngrams(spark):
    df = spark.createDataFrame([("one",), ("",)], ["text"])
    assert term_frequencies(df, ngram_range=(3, 3)).count() == 0


def test_drop_subset_terms(spark):
    cands = spark.createDataFrame(
        [("machine learning",), ("machine",), ("learning machine",), ("deep learning",)],
        ["term"],
    )
    kept = {r.term for r in drop_subset_terms(cands, "machine learning").collect()}
    # all-token-subset candidates drop regardless of order; others stay
    assert kept == {"deep learning"}
