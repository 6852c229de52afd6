"""Second LLM-op batch: token budgeting, rolling hash, quality gate,
IVF recall vs brute force."""

import pytest
from pyspark.sql import functions as F

from scrappy_spark.operators import similarity as SIM
from scrappy_spark.operators.textstats import quality_score, rolling_hash, token_count

SF_DIR = "/root/testdata/sf0.001"


def test_token_count_bpe_pieces(spark):
    df = spark.createDataFrame([(1, "Hello, world! It's 42."), (2, "")], ["doc_id", "text"])
    out = {r.doc_id: r for r in token_count(df).collect()}
    # pieces: hello , world ! it ' s 42 .  => 9 ; words: hello world it s 42 => 5
    assert out[1].n_bpe_pieces == 9
    assert out[1].n_words == 5
    assert out[1].pieces_per_word == 1.8
    assert out[2].n_words == 0 and out[2].pieces_per_word == 0.0


def test_rolling_hash_known_value(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "ab"), (3, "ba")], ["doc_id", "text"])
    out = {r.doc_id: r.h for r in df.select("doc_id", rolling_hash(F.col("text")).alias("h")).collect()}
    assert out[1] == (97 * 31 + 98) % 1_000_000_007  # polynomial fold
    assert out[1] == out[2]
    assert out[1] != out[3]  # order-sensitive, unlike bag-of-words hashes


def test_quality_gate(spark):
    good = "the data pipeline filters documents by quality and keeps the diverse ones every time"
    df = spark.createDataFrame(
        [(1, good), (2, "spam spam spam spam spam spam spam spam spam spam spam"), (3, "hi")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in quality_score(df).collect()}
    assert out[1].keep is True
    assert out[3].keep is False          # too short
    assert out[2].quality_score < out[1].quality_score  # zero diversity penalized


def test_ivf_recall_vs_brute_force(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = (
        SIM.label_centroids(e)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
                lambda s: s.centroid_val,
            ).alias("centroid")
        )
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.vec_id) for r in SIM.cosine_topk(e, queries, k=10).collect()}
    approx = {
        (r.query_id, r.vec_id)
        for r in SIM.ivf_topk(e, queries, cents, k=10, n_probe=2).collect()
    }
    # each query finds itself, and 2-probe recall is meaningfully > 0
    assert all((q, q) in approx for q in range(5))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2
