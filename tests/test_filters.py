"""Filter operators vs cited reference behaviors (P1–P4, P9, P11, P12)."""

from pyspark.sql import functions as F

from scrappy_spark.operators.filters import (
    contains_any,
    filter_articles,
    flatten_institutions,
    normalize_term,
    truncate_col,
)


def test_term_filter_null_abstract_na_false(articles):
    # 'threat' appears in a title with NULL abstract — na=False semantics:
    # the null row matches via title, never errors, null-only rows drop out
    out = filter_articles(articles, term="threat").collect()
    titles = {r.title for r in out}
    assert "Deep Learning for Threat Detection" in titles
    assert "Healthcare Infrastructure Security" in titles  # matches in abstract
    assert len(titles) == 2


def test_term_filter_is_case_insensitive(articles):
    assert filter_articles(articles, term="THREAT").count() == 2


def test_year_filter_string_cast(articles):
    out = filter_articles(articles, year="2020", limit=100).collect()
    assert {r.title for r in out} == {"Graph Neural Networks Survey"}
    # null-year rows never match (reference astype(str) turns NaN into 'nan')
    assert filter_articles(articles, year="None", limit=100).count() == 0


def test_keyword_array_filter(articles):
    out = filter_articles(articles, keyword="edge", limit=100).collect()
    assert [r.title for r in out] == ["Edge Computing Platforms"]


def test_institution_filter_flattens_nested(articles):
    out = filter_articles(articles, institution="va hospital", limit=100).collect()
    assert [r.title for r in out] == ["Healthcare Infrastructure Security"]


def test_limit_is_deterministic(articles):
    a = filter_articles(articles, limit=3).collect()
    b = filter_articles(articles, limit=3).collect()
    assert [r.title for r in a] == [r.title for r in b]
    assert len(a) == 3


def test_truncate(spark):
    df = spark.createDataFrame([("x" * 150,), ("short",)], ["t"])
    out = df.select(truncate_col(F.col("t"), 100).alias("t")).collect()
    assert out[0].t == "x" * 100 + "..."
    assert out[1].t == "short"


def test_normalize_term(spark):
    df = spark.createDataFrame([("  Hello, World! 42 ",)], ["t"])
    assert df.select(normalize_term(F.col("t")).alias("t")).first().t == "hello world 42"


def test_flatten_institutions(articles):
    row = (
        articles.filter(F.col("title") == "Healthcare Infrastructure Security")
        .select(flatten_institutions(F.col("institutions")).alias("flat"))
        .first()
    )
    assert row.flat == "Stanford; VA Hospital; Oxford"


def test_contains_any_null_safe(spark):
    df = spark.createDataFrame([("abc", None)], "a string, b string")
    out = df.select(contains_any([F.col("a"), F.col("b")], "ABC").alias("m")).first()
    assert out.m is True
