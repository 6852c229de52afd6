"""Round-7 second wave: declarative expectations, hybrid RRF
retrieval, corpus duplication profile."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrappy_spark.operators.expectations import (
    expect_between,
    expect_expr,
    expect_in,
    expect_matches,
    expect_not_null,
    expect_unique,
    expectations_report,
    failing_rows,
)
from scrappy_spark.operators.retrieval import (
    char_ngram_topk,
    char_ngrams_col,
    rrf_fuse,
)


# ---------------------------------------------------------------------------
# expectations
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a", 10.0, "1-URGENT"),
        (2, "b", 20.0, "5-LOW"),
        (2, "c", -5.0, "9-BAD"),  # dup id, negative, bad priority
        (None, "a", 30.0, None),  # null id, dup tag
        (4, None, 1000.0, "2-HIGH"),  # null tag, out-of-range value
    ]
    return spark.createDataFrame(rows, "id long, tag string, v double, pri string")


def _report_map(df):
    return {
        r["expectation"]: (r["n_violations"], r["passed"])
        for r in df.collect()
    }


def test_expectations_counts(messy):
    rep = expectations_report(
        messy,
        [
            expect_not_null("id"),
            expect_unique("id"),
            expect_unique("tag"),
            expect_in("pri", ("1-URGENT", "2-HIGH", "5-LOW")),
            expect_between("v", 0.0, 100.0),
            expect_matches("pri", r"^[1-5]-[A-Z]+$"),
            expect_expr("v_positive", "v > 0", "v"),
        ],
    )
    m = _report_map(rep)
    assert m["id_not_null"] == (1, 0)
    assert m["id_unique"] == (1, 0)  # one surplus occurrence of 2
    assert m["tag_unique"] == (1, 0)  # 'a' twice
    assert m["pri_in_set"] == (1, 0)  # 9-BAD (null pri not counted)
    assert m["v_between"] == (2, 0)  # -5 and 1000
    assert m["pri_matches"] == (1, 0)  # 9-BAD
    assert m["v_positive"] == (1, 0)  # -5 (nulls would count too)
    assert rep.count() == 7
    n_rows = rep.select("n_rows").first()[0]
    assert n_rows == 5


def test_expectations_all_pass(messy):
    rep = expectations_report(messy, [expect_not_null("v")])
    ((viol, passed),) = _report_map(rep).values()
    assert (viol, passed) == (0, 1)


def test_expectations_one_scan(messy):
    """All counters ride one aggregate — the plan has exactly one
    Aggregate pair (partial+final) over the scan, no unions of scans."""
    rep = expectations_report(
        messy, [expect_not_null("id"), expect_between("v", 0, 100)]
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString().lower()
    # exactly one leaf (one scan of the source) and one Aggregate node
    n_leaves = plan.count("logicalrdd") + plan.count("localrelation")
    assert n_leaves == 1, plan
    assert plan.count("aggregate [") == 1, plan


def test_failing_rows(messy):
    e = expect_between("v", 0.0, 100.0)
    bad = failing_rows(messy, e)
    assert sorted(r["v"] for r in bad.collect()) == [-5.0, 1000.0]
    with pytest.raises(ValueError):
        failing_rows(messy, expect_unique("id"))


def test_expectations_validation_errors(messy):
    with pytest.raises(ValueError):
        expectations_report(messy, [])
    with pytest.raises(ValueError):
        expectations_report(
            messy, [expect_not_null("id"), expect_not_null("id")]
        )


# ---------------------------------------------------------------------------
# char-ngram retrieval + RRF
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox leaps over a sleepy cat"),
        (2, "the cat sat on a mat, totally unrelated"),
        (3, "qk"),  # shorter than a trigram
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_ngrams_col(spark):
    df = spark.createDataFrame([("Abc b",), ("ab",), ("",)], "t string")
    out = df.select(char_ngrams_col(F.col("t")).alias("g")).collect()
    assert out[0]["g"] == ["abc", "bc ", "c b"]
    assert out[1]["g"] == []
    assert out[2]["g"] == []


def test_char_ngram_topk_ranks_similar_first(spark, corpus):
    queries = spark.createDataFrame(
        [(100, "the quick brown fox")], "query_id long, query_text string"
    )
    hits = char_ngram_topk(corpus, queries, k=3).collect()
    assert [h["doc_id"] for h in hits] == [0, 1, 2]
    assert hits[0]["score_ppm"] >= hits[1]["score_ppm"] > hits[2]["score_ppm"]
    # exact integer score: |Q∩D|·10⁶ div |Q∪D|
    for h in hits:
        assert 0 < h["score_ppm"] <= 1_000_000


def test_char_ngram_topk_self_retrieval(spark, corpus):
    queries = corpus.filter("doc_id = 0").select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    top = char_ngram_topk(corpus, queries, k=1).first()
    assert top["doc_id"] == 0
    assert top["score_ppm"] == 1_000_000  # identical gram sets


def test_char_ngram_max_df_prunes_hot_grams(spark, corpus):
    queries = spark.createDataFrame(
        [(100, "the quick brown fox")], "query_id long, query_text string"
    )
    pruned = char_ngram_topk(corpus, queries, k=3, max_df_frac=0.6)
    # cap = int(0.6·4 docs) = 2 → grams present in all three real docs
    # ("the", "he ") leave the index; doc 2 shared ONLY those hot grams
    # with the query, so it vanishes; docs 0/1 still match on df=2 grams
    ids = {h["doc_id"] for h in pruned.collect()}
    assert 0 in ids and 1 in ids and 2 not in ids


def test_rrf_fuse_integer_math(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, doc_id long, rank long"
    )
    out = rrf_fuse({"x": a, "y": b}, k=3, k_rrf=60)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 11: 10⁶div61 + 10⁶div62 = 16393 + 16129
    assert rows[11]["rrf_micro"] == 16393 + 16129
    assert rows[11]["n_lists"] == 2
    assert rows[11]["x_rank"] == 2 and rows[11]["y_rank"] == 1
    assert rows[10]["rrf_micro"] == 16393 and rows[10]["y_rank"] is None
    assert rows[11]["rank"] == 1  # fused order: 11, then 10, then 12
    assert rows[10]["rank"] == 2
    assert rows[12]["rank"] == 3


def test_rrf_fuse_requires_input():
    with pytest.raises(ValueError):
        rrf_fuse({})


# ---------------------------------------------------------------------------
# declared queries (local oracle replica covers the hash; here: shape)
# ---------------------------------------------------------------------------


def test_q_expectations_report_shape(spark):
    from scrappy_spark.plans.llmdata12 import q_expectations_report

    rep = q_expectations_report(spark, "/root/testdata/sf0.001")
    rows = {r["expectation"]: r for r in rep.collect()}
    assert len(rows) == 8
    assert rows["o_orderkey_unique"]["passed"] == 1
    assert rows["o_custkey_unique"]["passed"] == 0  # customers repeat
    assert rows["o_orderstatus_in_set"]["n_violations"] == 0


def test_q_hybrid_retrieve_fusion_invariants(spark):
    from scrappy_spark.plans.llmdata12 import (
        _HY_NQ,
        _HY_RRF_K,
        q_hybrid_retrieve,
    )

    out = q_hybrid_retrieve(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == _HY_NQ
    for hits in by_q.values():
        hits.sort(key=lambda h: h["rank"])
        assert [h["rank"] for h in hits] == list(range(1, len(hits) + 1))
        # fused order is non-increasing in rrf_micro
        scores = [h["rrf_micro"] for h in hits]
        assert scores == sorted(scores, reverse=True)
        for h in hits:
            # fusion arithmetic: rrf is exactly the sum of the two
            # per-ranker reciprocal terms that are present
            expect = sum(
                1_000_000 // (_HY_RRF_K + r)
                for r in (h["bm25_rank"], h["char3_rank"])
                if r is not None
            )
            assert h["rrf_micro"] == expect
            assert h["n_lists"] == sum(
                r is not None for r in (h["bm25_rank"], h["char3_rank"])
            )


def test_char_ngram_max_df_is_lazy(spark):
    """max_df_frac must not run an eager count() action at
    plan-construction time (ADVICE r7): building the plan over a frame
    that raises on evaluation succeeds; only collect() raises."""
    import pytest

    poisoned = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 0, F.raise_error(F.lit("boom-on-eval")))
        .otherwise(F.lit("x"))
        .alias("text"),
    )
    queries = spark.createDataFrame(
        [(1, "abcdef")], "query_id long, query_text string"
    )
    plan = char_ngram_topk(poisoned, queries, k=2, max_df_frac=0.5)
    with pytest.raises(Exception, match="boom-on-eval"):
        plan.collect()
