"""Round-7 second wave: declarative data-quality expectations, hybrid
lexical retrieval with reciprocal-rank fusion, and the corpus
duplication profile.

Reference parity: none of these exist in the reference (scrappy.py has
no validation, retrieval, or dedup-reporting surface); they are
first-class LLM-pipeline extensions per the mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .llmdata6 import _toks_of
from .llmdata11 import exact_substring_dup_cte, exact_substring_gram_ctes
from .registry import register

# ---------------------------------------------------------------------------
# Declarative expectations report
# ---------------------------------------------------------------------------

_EXP_SQL = """
    WITH a AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(o_orderkey) AS BIGINT) AS v0,
               CAST(count(o_orderkey)
                    - count(DISTINCT o_orderkey) AS BIGINT) AS v1,
               CAST(count(*) - count(o_custkey) AS BIGINT) AS v2,
               CAST(count(o_custkey)
                    - count(DISTINCT o_custkey) AS BIGINT) AS v3,
               CAST(coalesce(sum(CASE WHEN o_orderstatus IS NOT NULL
                                       AND o_orderstatus NOT IN
                                           ('O', 'F', 'P')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS v4,
               CAST(coalesce(sum(CASE WHEN o_totalprice IS NOT NULL
                                       AND (o_totalprice < 0.0
                                            OR o_totalprice > 600000.0)
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS v5,
               CAST(coalesce(sum(CASE WHEN o_orderpriority IS NOT NULL
                                       AND NOT regexp_matches(
                                           o_orderpriority,
                                           '^[1-5]-[A-Z ]+$')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS v6,
               CAST(coalesce(sum(CASE WHEN NOT coalesce(
                                           o_orderdate >=
                                           TIMESTAMP '1995-01-01', FALSE)
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS v7
        FROM orders)
    SELECT expectation, kind, "column", n_rows, n_violations,
           CAST(n_violations = 0 AS BIGINT) AS passed
    FROM (
        SELECT 'o_orderkey_not_null' AS expectation, 'not_null' AS kind,
               'o_orderkey' AS "column", n_rows, v0 AS n_violations FROM a
        UNION ALL SELECT 'o_orderkey_unique', 'unique', 'o_orderkey',
               n_rows, v1 FROM a
        UNION ALL SELECT 'o_custkey_not_null', 'not_null', 'o_custkey',
               n_rows, v2 FROM a
        UNION ALL SELECT 'o_custkey_unique', 'unique', 'o_custkey',
               n_rows, v3 FROM a
        UNION ALL SELECT 'o_orderstatus_in_set', 'accepted_values',
               'o_orderstatus', n_rows, v4 FROM a
        UNION ALL SELECT 'o_totalprice_between', 'between',
               'o_totalprice', n_rows, v5 FROM a
        UNION ALL SELECT 'o_orderpriority_matches', 'regex',
               'o_orderpriority', n_rows, v6 FROM a
        UNION ALL SELECT 'orderdate_in_window', 'expr', 'o_orderdate',
               n_rows, v7 FROM a)
"""


@register(
    "q_expectations_report",
    sql=_EXP_SQL,
    doc="Declarative data-quality gate (Deequ/dbt-test style, "
    "operators/expectations.py): eight contract checks over orders — "
    "not-null, uniqueness, accepted values, numeric range, regex "
    "shape, and a timestamp-window predicate — ALL compiled into one "
    "groupBy-less agg (single scan, parallel partial aggregates; "
    "uniqueness is the only Expand-rewritten counter) and unpivoted "
    "via zero-shuffle stack into one report row per expectation. "
    "o_custkey_unique genuinely FAILS on the fixture (customers "
    "repeat), so both report branches are exercised and hashed. The "
    "oracle recomputes every counter independently in SQL.",
    tags=("quality", "pipeline"),
)
def q_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.expectations import (
        expect_between,
        expect_expr,
        expect_in,
        expect_matches,
        expect_not_null,
        expect_unique,
        expectations_report,
    )

    orders = load_table(spark, sf_dir, "orders")
    checks = [
        expect_not_null("o_orderkey"),
        expect_unique("o_orderkey"),
        expect_not_null("o_custkey"),
        expect_unique("o_custkey"),
        expect_in("o_orderstatus", ("O", "F", "P")),
        expect_between("o_totalprice", 0.0, 600000.0),
        expect_matches("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
        expect_expr(
            "orderdate_in_window",
            "o_orderdate >= timestamp'1995-01-01'",
            "o_orderdate",
        ),
    ]
    return expectations_report(orders, checks)


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + character-trigram Jaccard, RRF-fused
# ---------------------------------------------------------------------------

_HY_NQ = 8  # queries = first 8 docs, text prefix
_HY_QLEN = 80
_HY_SIDE_K = 10  # per-ranker depth
_HY_K = 5  # fused top-k
_HY_RRF_K = 60

#: distinct lowercase character trigrams of an arbitrary text expr
_grams_of = (
    lambda expr: f"list_distinct([substr(lower({expr}), CAST(i AS INT), 3) "
    f"FOR i IN generate_series(1, length({expr}) - 2)])"
)

def bm25_rank_ctes(nq: int, qlen: int) -> str:
    """The DuckDB CTE chain recomputing ``operators/bm25.py``'s exact
    integer scoring for queries = the first ``nq`` docs' ``qlen``-char
    prefixes, ending at ``bmr`` = (query_id, doc_id, r) ranked per
    query.  Shared by the q_hybrid_retrieve and q_retrieval_eval
    (plans/audit.py) oracles so the two gates pin the SAME arithmetic.
    """
    return f"""q AS (SELECT doc_id AS query_id,
                      substr(text, 1, {qlen}) AS query_text
               FROM documents WHERE doc_id < {nq}),
    tok AS (SELECT doc_id, unnest({_toks_of('text')}) AS term
            FROM documents),
    post AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM tok GROUP BY doc_id, term),
    dlen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
             FROM tok GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS total_len FROM dlen),
    idf AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
                   CAST(round(ln((s.n_docs - count(*) + 0.5)
                                 / (count(*) + 0.5) + 1.0)
                              * 1000000) AS BIGINT) AS idf_micro,
                   s.n_docs, s.total_len
            FROM post, stats s
            GROUP BY s.n_docs, s.total_len, term),
    qt AS (SELECT query_id,
                  unnest(list_distinct({_toks_of('query_text')})) AS term
           FROM q),
    bm AS (SELECT qt.query_id, post.doc_id,
                  CAST(sum((idf.idf_micro * 22 * post.tf * idf.total_len)
                       // (10 * post.tf * idf.total_len
                           + 3 * idf.total_len
                           + 9 * dlen.dl * idf.n_docs)) AS BIGINT)
                      AS score_micro
           FROM qt
           JOIN idf USING (term)
           JOIN post USING (term)
           JOIN dlen ON dlen.doc_id = post.doc_id
           GROUP BY qt.query_id, post.doc_id),
    bmr AS (SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score_micro DESC,
                                               doc_id ASC) AS r
            FROM bm)"""


_HY_SQL = f"""
    WITH {bm25_rank_ctes(_HY_NQ, _HY_QLEN)},
    dg AS (SELECT doc_id, unnest({_grams_of('text')}) AS gram
           FROM documents),
    dn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nd
           FROM dg GROUP BY doc_id),
    qg AS (SELECT query_id, unnest({_grams_of('query_text')}) AS gram
           FROM q),
    qn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS nq
           FROM qg GROUP BY query_id),
    tri AS (SELECT qg.query_id, dg.doc_id,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM qg JOIN dg USING (gram)
            GROUP BY qg.query_id, dg.doc_id),
    tsc AS (SELECT tri.query_id, tri.doc_id,
                   CAST((tri.n_shared * 1000000)
                        // (qn.nq + dn.nd - tri.n_shared) AS BIGINT)
                       AS score_ppm
            FROM tri
            JOIN qn ON qn.query_id = tri.query_id
            JOIN dn ON dn.doc_id = tri.doc_id),
    trr AS (SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score_ppm DESC,
                                               doc_id ASC) AS r
            FROM tsc),
    u AS (SELECT query_id, doc_id, 'bm25' AS src, r
          FROM bmr WHERE r <= {_HY_SIDE_K}
          UNION ALL
          SELECT query_id, doc_id, 'char3' AS src, r
          FROM trr WHERE r <= {_HY_SIDE_K}),
    fused AS (SELECT query_id, doc_id,
                     CAST(sum(1000000 // ({_HY_RRF_K} + r)) AS BIGINT)
                         AS rrf_micro,
                     CAST(count(*) AS BIGINT) AS n_lists,
                     CAST(max(CASE WHEN src = 'bm25' THEN r END)
                          AS BIGINT) AS bm25_rank,
                     CAST(max(CASE WHEN src = 'char3' THEN r END)
                          AS BIGINT) AS char3_rank
              FROM u GROUP BY query_id, doc_id)
    SELECT query_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_micro DESC, doc_id ASC)
                AS BIGINT) AS rank,
           doc_id, rrf_micro, n_lists, bm25_rank, char3_rank
    FROM fused
    QUALIFY rank <= {_HY_K}
"""


@register(
    "q_hybrid_retrieve",
    sql=_HY_SQL,
    doc="Hybrid retrieval under the full hash gate: BM25 token "
    "retrieval (operators/bm25.py, exact integer micro-scores) and "
    "character-trigram Jaccard retrieval (operators/retrieval.py::"
    "char_ngram_topk, inverted trigram index + broadcast query grams, "
    "exact ppm integer scores) each produce a per-query top-10, fused "
    "by Reciprocal Rank Fusion (Cormack et al. 2009) in integer "
    "micro-units: rrf = sum(10^6 div (60 + rank)) — rank-only fusion, "
    "so the two incomparable score scales never meet. Output is the "
    "fused top-5 with per-ranker rank provenance (NULL = unranked on "
    "that side). Oracle recomputes both rankers and the fusion in SQL; "
    "every score is integer, so the hash covers scores, ranks, and "
    "fusion arithmetic exactly.",
    tags=("llm", "retrieval", "pipeline"),
)
def q_hybrid_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bm25 import bm25_retrieve
    from ..operators.retrieval import char_ngram_topk, rrf_fuse

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") < _HY_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, _HY_QLEN).alias("query_text"),
    )
    bm = bm25_retrieve(docs, queries, k=_HY_SIDE_K)
    tri = char_ngram_topk(docs, queries, k=_HY_SIDE_K, n=3)
    return rrf_fuse(
        {"bm25": bm, "char3": tri}, k=_HY_K, k_rrf=_HY_RRF_K
    )


# ---------------------------------------------------------------------------
# Corpus duplication profile
# ---------------------------------------------------------------------------

_DP_L = 30  # same ExactSubstr window as q_exact_substring_dedup

_DP_SQL = f"""
    WITH d AS (SELECT doc_id, text, lang, source,
                      length(text) AS n FROM documents),
    {exact_substring_gram_ctes(_DP_L)},
    {exact_substring_dup_cte()},
    ch AS (SELECT doc_id, CAST(u.p AS INT) AS p
           FROM d, unnest(generate_series(1, n)) AS u(p)),
    ev AS (SELECT doc_id, q AS pos, 1 AS is_dup FROM dup
           UNION ALL
           SELECT doc_id, p AS pos, 0 AS is_dup FROM ch),
    run AS (SELECT doc_id, pos, is_dup,
                   max(CASE WHEN is_dup = 1 THEN pos END) OVER (
                       PARTITION BY doc_id
                       ORDER BY pos ASC, is_dup DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_dup
            FROM ev),
    cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nd
            FROM run
            WHERE is_dup = 0 AND last_dup IS NOT NULL
              AND last_dup >= pos - {_DP_L} + 1
            GROUP BY doc_id)
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n) AS BIGINT) AS total_chars,
           CAST(coalesce(sum(cov.nd), 0) AS BIGINT) AS dropped_chars,
           CAST(CASE WHEN sum(d.n) > 0
                THEN (coalesce(sum(cov.nd), 0) * 1000000) // sum(d.n)
                ELSE 0 END AS BIGINT) AS dup_ppm
    FROM d LEFT JOIN cov USING (doc_id)
    GROUP BY lang, source
"""


@register(
    "q_dup_corpus_profile",
    sql=_DP_SQL,
    doc="Corpus duplication profile: per (lang, source) stratum, the "
    "fraction of characters inside >= 30-char spans whose content "
    "appeared earlier in the corpus — THE number that decides where "
    "dedup budget goes at 100 TB (web-scrape strata routinely carry "
    "50%+ duplicated bytes, curated strata near zero). Engine path "
    "reuses operators/curation.py::exact_substring_dedup (collapse-"
    "first, scan-side md5 L-grams, keep-first groupBy-min, interval "
    "merge) and aggregates its per-doc n_dropped by stratum in exact "
    "ppm integers. The oracle recomputes coverage per CHARACTER via "
    "the running-max window (the q_exact_substring_dedup oracle "
    "shape) — no interval machinery — so the hash proves the "
    "optimized path equals the direct definition.",
    tags=("llm", "dedup", "profile"),
)
def q_dup_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import exact_substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    per_doc = exact_substring_dedup(
        docs.select("doc_id", "text"), min_len=_DP_L
    ).select("doc_id", "n_chars", "n_dropped")
    strata = docs.select("doc_id", "lang", "source")
    joined = per_doc.join(strata, "doc_id")
    agg = joined.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_dropped").cast("long").alias("dropped_chars"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "total_chars",
        "dropped_chars",
        F.when(
            F.col("total_chars") > 0,
            F.expr("(dropped_chars * 1000000) div total_chars"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_ppm"),
    )
