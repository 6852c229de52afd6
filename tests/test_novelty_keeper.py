"""ngram_novelty (first-occurrence ownership, integer basis points)
and best_keeper_per_cluster (quality-argmax keeper selection)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrappy_spark.operators.dedup import best_keeper_per_cluster
from scrappy_spark.operators.textstats import ngram_novelty


class TestNgramNovelty:
    def test_ownership_and_bp(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b c d"),      # grams: "a b c", "b c d" — both first here
                (2, "a b c d"),      # exact copy — nothing novel
                (3, "a b c x y z"),  # "a b c" seen; "b c x","c x y","x y z" new
                (4, "a"),            # too short — zero grams
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r.asDict() for r in ngram_novelty(df, n=3).collect()}
        assert (got[1]["n_grams"], got[1]["n_novel"], got[1]["novel_bp"]) == (2, 2, 10000)
        assert (got[2]["n_grams"], got[2]["n_novel"], got[2]["novel_bp"]) == (2, 0, 0)
        assert (got[3]["n_grams"], got[3]["n_novel"], got[3]["novel_bp"]) == (4, 3, 7500)
        assert (got[4]["n_grams"], got[4]["n_novel"], got[4]["novel_bp"]) == (0, 0, None)

    def test_distinct_grams_within_doc(self, spark):
        # a repeated gram inside ONE doc counts once (distinct set)
        df = spark.createDataFrame([(1, "a b c a b c a b c")], ["doc_id", "text"])
        row = ngram_novelty(df, n=3).collect()[0]
        # distinct 3-grams of a b c a b c a b c: abc, bca, cab — all novel
        assert row["n_grams"] == 3 and row["novel_bp"] == 10000

    def test_every_input_doc_appears(self, spark):
        df = spark.createDataFrame(
            [(i, "x" if i % 2 else "p q r s") for i in range(10)],
            ["doc_id", "text"],
        )
        assert ngram_novelty(df, n=3).count() == 10


class TestBestKeeper:
    def _fixture(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "short", 5),
                (2, "the full long article", 21),
                (3, "medium text", 11),
                (10, "solo", 4),
            ],
            ["doc_id", "text", "n_chars"],
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10)], ["doc_id", "component"]
        )
        return docs, clusters

    def test_keeps_highest_quality_not_min_id(self, spark):
        docs, clusters = self._fixture(spark)
        got = {r["component"]: r["doc_id"] for r in
               best_keeper_per_cluster(docs, clusters).collect()}
        assert got == {1: 2, 10: 10}  # doc 2 wins on n_chars despite id 1 existing

    def test_tiebreak_is_min_id(self, spark):
        docs = spark.createDataFrame(
            [(7, "aaaa", 4), (5, "bbbb", 4)], ["doc_id", "text", "n_chars"]
        )
        clusters = spark.createDataFrame([(7, 5), (5, 5)], ["doc_id", "component"])
        got = best_keeper_per_cluster(docs, clusters).collect()
        assert len(got) == 1 and got[0]["doc_id"] == 5

    def test_one_keeper_per_cluster(self, spark):
        docs, clusters = self._fixture(spark)
        out = best_keeper_per_cluster(docs, clusters)
        assert out.groupBy("component").count().filter("count > 1").count() == 0

    def test_custom_quality_column(self, spark):
        docs = spark.createDataFrame(
            [(1, 0.9), (2, 0.1)], ["doc_id", "score"]
        )
        clusters = spark.createDataFrame([(1, 1), (2, 1)], ["doc_id", "component"])
        got = best_keeper_per_cluster(docs, clusters, quality_col="score").collect()
        assert got[0]["doc_id"] == 1


class TestFooterStats:
    def test_pushdown_active_and_values_match_scan(self, spark):
        from scrappy_spark.operators.profile import footer_stats

        path = "/root/testdata/sf0.001/lineitem.parquet"
        out = footer_stats(spark, path, ["l_quantity", "l_orderkey"])
        assert out.pushed_aggregation, "v2 scan must carry PushedAggregation"
        row = out.collect()[0]
        truth = (
            spark.read.parquet(path)
            .selectExpr(
                "count(*) AS n_rows",
                "min(l_quantity) AS min_l_quantity",
                "max(l_quantity) AS max_l_quantity",
                "min(l_orderkey) AS min_l_orderkey",
                "max(l_orderkey) AS max_l_orderkey",
            )
            .collect()[0]
        )
        assert row.asDict() == truth.asDict()

    def test_confs_restored_even_on_error(self, spark):
        import pytest

        from scrappy_spark.operators.profile import footer_stats

        before = {
            k: spark.conf.get(k)
            for k in (
                "spark.sql.parquet.aggregatePushdown",
                "spark.sql.sources.useV1SourceList",
            )
        }
        with pytest.raises(Exception):
            footer_stats(spark, "/nonexistent/path.parquet", ["x"])
        after = {k: spark.conf.get(k) for k in before}
        assert after == before


class TestTokenDrift:
    def test_identical_corpora_zero_drift(self, spark):
        from scrappy_spark.operators.textstats import token_drift

        df = spark.createDataFrame(
            [(1, "a b c"), (2, "c d e")], ["doc_id", "text"]
        )
        row = token_drift(df, df).collect()[0]
        assert row["kl_contrib_micro"] == 0 and row["kl_nats"] == 0.0
        assert row["oov_new_bp"] == 0
        assert row["vocab_shared"] == row["vocab_old"] == row["vocab_new"]

    def test_disjoint_corpora_full_oov(self, spark):
        from scrappy_spark.operators.textstats import token_drift

        old = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        new = spark.createDataFrame([(2, "x y z")], ["doc_id", "text"])
        row = token_drift(old, new).collect()[0]
        assert row["vocab_shared"] == 0
        assert row["oov_new_bp"] == 10000  # 100% of new mass is unseen
        assert row["kl_contrib_micro"] == 0  # no shared vocab -> no KL term

    def test_shift_direction(self, spark):
        from scrappy_spark.operators.textstats import token_drift

        old = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
        skewed = spark.createDataFrame([(2, "a b b b")], ["doc_id", "text"])
        row = token_drift(old, skewed).collect()[0]
        # 'b' got much more probable than before -> positive KL
        assert row["kl_nats"] > 0 and row["oov_new_bp"] == 0


class TestIncrementalNovelty:
    def test_base_wins_regardless_of_id_order(self, spark):
        from scrappy_spark.operators.textstats import (
            incremental_ngram_novelty,
            ngram_index,
        )

        # base doc has the HIGHER id — ingest order must still win
        base = spark.createDataFrame([(9, "a b c d")], ["doc_id", "text"])
        batch = spark.createDataFrame(
            [(1, "a b c d"), (2, "x y z w")], ["doc_id", "text"]
        )
        scores, _ = incremental_ngram_novelty(batch, ngram_index(base))
        got = {r["doc_id"]: r["novel_bp"] for r in scores.collect()}
        assert got == {1: 0, 2: 10000}  # doc 1's grams all in base despite id 1 < 9

    def test_index_update_closes_the_loop(self, spark):
        from scrappy_spark.operators.textstats import (
            incremental_ngram_novelty,
            ngram_index,
        )

        base = spark.createDataFrame([(0, "a b c d")], ["doc_id", "text"])
        batch1 = spark.createDataFrame([(1, "p q r s")], ["doc_id", "text"])
        _, idx1 = incremental_ngram_novelty(batch1, ngram_index(base))
        # re-ingesting the same content against the UPDATED index -> zero novel
        batch2 = spark.createDataFrame([(2, "p q r s")], ["doc_id", "text"])
        scores2, _ = incremental_ngram_novelty(batch2, idx1)
        assert scores2.collect()[0]["novel_bp"] == 0

    def test_within_batch_ownership_is_min_id(self, spark):
        from scrappy_spark.operators.textstats import (
            incremental_ngram_novelty,
            ngram_index,
        )

        base = spark.createDataFrame([(0, "unrelated words here now")], ["doc_id", "text"])
        batch = spark.createDataFrame(
            [(5, "m n o p"), (3, "m n o p")], ["doc_id", "text"]
        )
        scores, _ = incremental_ngram_novelty(batch, ngram_index(base))
        got = {r["doc_id"]: r["novel_bp"] for r in scores.collect()}
        assert got == {3: 10000, 5: 0}


class TestContainmentPairs:
    def test_wholesale_quote_detected_where_jaccard_misses(self, spark):
        from scrappy_spark.operators.dedup_approx import containment_pairs, jaccard_pairs

        small = "alpha beta gamma delta"
        big = small + " " + " ".join(f"w{i}" for i in range(100))
        df = spark.createDataFrame(
            [(1, small, "en"), (2, big, "en"), (3, "other stuff entirely", "en")],
            ["doc_id", "text", "lang"],
        )
        cont = containment_pairs(df, block_col="lang", threshold=0.9).collect()
        assert [(r["id_a"], r["id_b"]) for r in cont] == [(1, 2)]
        row = cont[0]
        assert row["containment_a_bp"] == 10000  # doc 1 fully inside doc 2
        assert row["containment_b_bp"] < 1000
        # symmetric Jaccard at the same bar finds nothing
        assert jaccard_pairs(df, block_col="lang", threshold=0.9).count() == 0
