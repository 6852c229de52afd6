"""Round-7 third wave: engine-audit surfaces — two-table
reconciliation, the join pre-flight advisor, and retrieval-quality
evaluation.

Reference parity: none of these exist in the reference (scrappy.py has
no multi-table diff, no planning surface, no retrieval at all); they
are first-class extensions for operating the engine at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .llmdata12 import bm25_rank_ctes
from .registry import register

# ---------------------------------------------------------------------------
# Two-table reconciliation (migration audit)
# ---------------------------------------------------------------------------

# Deterministic "restated" orders: ~1/97 of keys lost, ~1/97 renumbered
# negative (new-only rows), ~1/101 prices bumped, ~1/103 priorities nulled.
_RC_SQL = """
    WITH l AS (SELECT o_orderkey AS k, o_custkey, o_totalprice,
                      o_orderstatus, o_orderpriority FROM orders),
    r AS (SELECT CASE WHEN o_orderkey % 97 = 3 THEN -o_orderkey
                      ELSE o_orderkey END AS k,
                 o_custkey,
                 CASE WHEN o_orderkey % 101 = 7 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice,
                 o_orderstatus,
                 CASE WHEN o_orderkey % 103 = 11 THEN NULL
                      ELSE o_orderpriority END AS o_orderpriority
          FROM orders),
    j AS (SELECT coalesce(l.k, r.k) AS k,
                 l.k IS NOT NULL AS in_l, r.k IS NOT NULL AS in_r,
                 l.o_custkey IS NOT DISTINCT FROM r.o_custkey AS m0,
                 l.o_totalprice IS NOT DISTINCT FROM r.o_totalprice AS m1,
                 l.o_orderstatus IS NOT DISTINCT FROM r.o_orderstatus AS m2,
                 l.o_orderpriority IS NOT DISTINCT FROM r.o_orderpriority AS m3
          FROM l FULL OUTER JOIN r ON l.k = r.k),
    a AS (SELECT
            CAST(coalesce(sum(CASE WHEN in_l AND NOT in_r
                              THEN 1 END), 0) AS BIGINT) AS n_only_left,
            CAST(coalesce(sum(CASE WHEN in_r AND NOT in_l
                              THEN 1 END), 0) AS BIGINT) AS n_only_right,
            CAST(coalesce(sum(CASE WHEN in_l AND in_r
                              THEN 1 END), 0) AS BIGINT) AS n_both,
            CAST(coalesce(sum(CASE WHEN in_l AND in_r AND m0
                              THEN 1 END), 0) AS BIGINT) AS c0,
            CAST(coalesce(sum(CASE WHEN in_l AND in_r AND m1
                              THEN 1 END), 0) AS BIGINT) AS c1,
            CAST(coalesce(sum(CASE WHEN in_l AND in_r AND m2
                              THEN 1 END), 0) AS BIGINT) AS c2,
            CAST(coalesce(sum(CASE WHEN in_l AND in_r AND m3
                              THEN 1 END), 0) AS BIGINT) AS c3
          FROM j)
    SELECT "column", n_only_left, n_only_right, n_both, n_match,
           CAST(n_both - n_match AS BIGINT) AS n_mismatch,
           CAST(CASE WHEN n_both > 0
                THEN (n_match * 1000000) // n_both
                ELSE 0 END AS BIGINT) AS match_ppm
    FROM (
        SELECT 'o_custkey' AS "column", n_only_left, n_only_right,
               n_both, c0 AS n_match FROM a
        UNION ALL SELECT 'o_totalprice', n_only_left, n_only_right,
               n_both, c1 FROM a
        UNION ALL SELECT 'o_orderstatus', n_only_left, n_only_right,
               n_both, c2 FROM a
        UNION ALL SELECT 'o_orderpriority', n_only_left, n_only_right,
               n_both, c3 FROM a)
"""


@register(
    "q_reconcile_tables",
    sql=_RC_SQL,
    doc="Two-table reconciliation report (operators/reconcile.py): "
    "orders vs a deterministically 'restated' orders (every 97th key "
    "dropped AND re-issued under a negative key, every 101st price "
    "bumped, every 103rd priority nulled) — one full-outer key join + "
    "one groupBy-less agg of null-safe per-column match counters, "
    "unpivoted via zero-shuffle stack into one scoreboard row per "
    "column. All four perturbation branches (only-left, only-right, "
    "value drift, null drift) are genuinely non-zero on the fixture, "
    "so every counter path is hashed. The oracle recomputes the "
    "restatement and the scoreboard independently in SQL.",
    tags=("audit", "pipeline"),
)
def q_reconcile_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.reconcile import reconcile_report

    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]
    left = orders.select(F.col("o_orderkey").alias("k"), *cols)
    right = orders.select(
        F.when(F.col("o_orderkey") % 97 == 3, -F.col("o_orderkey"))
        .otherwise(F.col("o_orderkey"))
        .alias("k"),
        F.col("o_custkey"),
        F.when(
            F.col("o_orderkey") % 101 == 7, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.col("o_orderstatus"),
        F.when(F.col("o_orderkey") % 103 == 11, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return reconcile_report(left, right, ["k"], cols)


# ---------------------------------------------------------------------------
# Join pre-flight advisor
# ---------------------------------------------------------------------------

_JA_BCAST = 100_000  # rows under which a side is broadcast-able
_JA_SKEW_BP = 100  # heaviest-key output share that triggers salting
_JA_PARTS = 200  # target partitions the salt should spread over


def _ja_sql(left_sel: str, right_sel: str, name: str) -> str:
    return f"""
    SELECT '{name}' AS join_name, l_rows, r_rows, l_keys, r_keys,
           matched_keys, est_out_rows, top_key, top_key_pairs,
           CAST(CASE WHEN est_out_rows > 0
                THEN top_key_pairs * 10000 // est_out_rows
                ELSE 0 END AS BIGINT) AS top_share_bp,
           CAST(l_rows <= {_JA_BCAST} AS BIGINT) AS broadcast_left,
           CAST(r_rows <= {_JA_BCAST} AS BIGINT) AS broadcast_right,
           CAST(CASE WHEN est_out_rows > 0
                     AND top_key_pairs * 10000 // est_out_rows
                         > {_JA_SKEW_BP}
                THEN greatest(1, (top_key_pairs * {_JA_PARTS}
                                  + est_out_rows - 1) // est_out_rows)
                ELSE 1 END AS BIGINT) AS salt_factor
    FROM (
      WITH cl AS (SELECT CAST(k AS VARCHAR) AS key,
                         CAST(count(*) AS BIGINT) AS cl
                  FROM ({left_sel}) GROUP BY 1),
      cr AS (SELECT CAST(k AS VARCHAR) AS key,
                    CAST(count(*) AS BIGINT) AS cr
             FROM ({right_sel}) GROUP BY 1),
      p AS (SELECT cl.key, CAST(cl.cl * cr.cr AS BIGINT) AS pairs
            FROM cl JOIN cr USING (key)),
      e AS (SELECT CAST(count(*) AS BIGINT) AS matched_keys,
                   CAST(coalesce(sum(pairs), 0) AS BIGINT)
                       AS est_out_rows,
                   max(pairs) AS mp FROM p)
      SELECT (SELECT CAST(coalesce(sum(cl), 0) AS BIGINT) FROM cl)
                 AS l_rows,
             (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) FROM cr)
                 AS r_rows,
             (SELECT CAST(count(*) AS BIGINT) FROM cl) AS l_keys,
             (SELECT CAST(count(*) AS BIGINT) FROM cr) AS r_keys,
             e.matched_keys, e.est_out_rows,
             (SELECT min(p.key) FROM p, e WHERE p.pairs = e.mp)
                 AS top_key,
             CAST(coalesce(e.mp, 0) AS BIGINT) AS top_key_pairs
      FROM e)
"""


_JA_SQL = (
    _ja_sql(
        "SELECT o_orderkey AS k FROM orders",
        "SELECT l_orderkey AS k FROM lineitem",
        "orders_lineitem",
    )
    + " UNION ALL "
    + _ja_sql(
        "SELECT event_type AS k FROM events",
        "SELECT event_type AS k FROM events",
        "events_by_type",
    )
)


@register(
    "q_join_advisor",
    sql=_JA_SQL,
    doc="Join pre-flight advisor (operators/profile.py::join_advisor): "
    "EXACT prospective-join output cardinality |A JOIN B| = "
    "sum_k cl(k)*cr(k) from two partial-agg key counts (shuffle at "
    "key cardinality, never row cardinality), heaviest output key "
    "(deterministic: ties to smallest key string via a two-stage "
    "max-then-min agg, not tie-nondeterministic max_by) with its "
    "basis-point share, broadcast-ability flags, and the salt factor "
    "that spreads the hottest key over the target partition count. "
    "Two advisories in one report: orders JOIN lineitem on orderkey "
    "(healthy key — salt 1) and events self-joined on event_type "
    "(pathological low-cardinality key — the advisor is the query "
    "that says NO before a 100 TB shuffle does). Oracle recomputes "
    "both advisories in SQL.",
    tags=("audit", "profile", "join"),
)
def q_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import join_advisor

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("k")
    )
    a1 = join_advisor(
        orders,
        lineitem,
        "k",
        broadcast_rows=_JA_BCAST,
        skew_share_bp=_JA_SKEW_BP,
        target_partitions=_JA_PARTS,
    ).select(F.lit("orders_lineitem").alias("join_name"), "*")
    a2 = join_advisor(
        events,
        events,
        "k",
        broadcast_rows=_JA_BCAST,
        skew_share_bp=_JA_SKEW_BP,
        target_partitions=_JA_PARTS,
    ).select(F.lit("events_by_type").alias("join_name"), "*")
    return a1.unionByName(a2)


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation (recall@k / precision@k / MRR)
# ---------------------------------------------------------------------------

_EV_NQ = 8
_EV_QLEN = 80
_EV_K = 10

_EV_SQL = f"""
    WITH {bm25_rank_ctes(_EV_NQ, _EV_QLEN)},
    qr AS (SELECT DISTINCT s.doc_id AS query_id, d.doc_id
           FROM documents s JOIN documents d
             ON md5(d.text) = md5(s.text)
           WHERE s.doc_id < {_EV_NQ}),
    topk AS (SELECT query_id, doc_id, r FROM bmr WHERE r <= {_EV_K}),
    nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
             FROM qr GROUP BY query_id),
    nret AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_retrieved
             FROM topk GROUP BY query_id),
    h AS (SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hits,
                 CAST(min(t.r) AS BIGINT) AS first_r
          FROM topk t JOIN qr USING (query_id, doc_id)
          GROUP BY t.query_id)
    SELECT nrel.query_id, nrel.n_rel,
           CAST(coalesce(nret.n_retrieved, 0) AS BIGINT) AS n_retrieved,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST((coalesce(h.n_hits, 0) * 1000000)
                // nrel.n_rel AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN coalesce(nret.n_retrieved, 0) > 0
                THEN (coalesce(h.n_hits, 0) * 1000000)
                     // nret.n_retrieved
                ELSE 0 END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN h.first_r IS NOT NULL
                THEN 1000000 // h.first_r
                ELSE 0 END AS BIGINT) AS rr_micro
    FROM nrel
    LEFT JOIN nret USING (query_id)
    LEFT JOIN h USING (query_id)
"""


@register(
    "q_retrieval_eval",
    sql=_EV_SQL,
    doc="Retrieval-quality evaluation (operators/retrieval.py::"
    "retrieval_eval): BM25 top-10 (operators/bm25.py, exact integer "
    "micro-scores — the oracle shares the bm25_rank_ctes chain with "
    "q_hybrid_retrieve so both gates pin the SAME arithmetic) scored "
    "against ground truth qrels = every doc whose md5(text) equals "
    "the query's source doc (the corpus is dup-heavy, so n_rel > 1 "
    "and a near-dup can outrank the source — exactly what recall@k "
    "catches). Per query: n_rel / n_retrieved / n_hits plus "
    "recall@10, precision@10 in exact ppm and reciprocal rank in "
    "exact micro units — the TREC trio whose means decide a "
    "retriever A/B at corpus scale. Top-k lists are n_queries*k "
    "rows, so evaluation cost is invisible next to retrieval.",
    tags=("audit", "retrieval", "llm"),
)
def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bm25 import bm25_retrieve
    from ..operators.retrieval import retrieval_eval

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = docs.filter(F.col("doc_id") < _EV_NQ)
    queries = src.select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, _EV_QLEN).alias("query_text"),
    )
    # qrels: exact-dup set of each query's source doc, joined on
    # md5(text) (the scale-safe key for long-string equality; the
    # oracle joins the same hash so the gate covers the convention)
    qrels = (
        src.select(
            F.col("doc_id").alias("query_id"),
            F.md5("text").alias("__h"),
        )
        .join(
            docs.select("doc_id", F.md5("text").alias("__h")), "__h"
        )
        .select("query_id", "doc_id")
    )
    ranking = bm25_retrieve(docs, queries, k=_EV_K)
    return retrieval_eval(ranking, qrels, k=_EV_K)


# ---------------------------------------------------------------------------
# Two-sample KS distribution drift
# ---------------------------------------------------------------------------

_KS_SQL = """
    WITH base AS (SELECT source, CAST(length(text) AS BIGINT) AS v,
                         CAST(lang <> 'en' AS INT) AS s
                  FROM documents),
    pv AS (SELECT source, v,
                  CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
                      AS cl,
                  CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS cr
           FROM base GROUP BY source, v),
    cum AS (SELECT source,
                   CAST(sum(cl) OVER (PARTITION BY source) AS BIGINT)
                       AS n_left,
                   CAST(sum(cr) OVER (PARTITION BY source) AS BIGINT)
                       AS n_right,
                   CAST(sum(cl) OVER w AS BIGINT) AS al,
                   CAST(sum(cr) OVER w AS BIGINT) AS ar
            FROM pv
            WINDOW w AS (PARTITION BY source ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
    d AS (SELECT source, n_left, n_right,
                 CAST(max(abs(al * n_right - ar * n_left)) AS BIGINT)
                     AS d_num
          FROM cum GROUP BY source, n_left, n_right)
    SELECT source, n_left, n_right,
           CAST(CASE WHEN n_left > 0 AND n_right > 0 THEN d_num
                ELSE 0 END AS BIGINT) AS d_num,
           CAST(CASE WHEN n_left > 0 AND n_right > 0
                THEN (d_num * 1000000) // (n_left * n_right)
                ELSE 0 END AS BIGINT) AS d_ppm
    FROM d
"""


@register(
    "q_ks_drift",
    sql=_KS_SQL,
    doc="Two-sample Kolmogorov-Smirnov distribution drift in exact "
    "integers (operators/profile.py::ks_drift): per source, does the "
    "English slice's document-length DISTRIBUTION differ from the "
    "non-English slice's? The CDF fractions are eliminated by "
    "cross-scaling — at every merged value point D_scaled = "
    "|c_left*n_right - c_right*n_left|, all BIGINT, so the supremum "
    "and d_ppm = max*10^6 div (n_left*n_right) hash identically "
    "across engines (ties step both CDFs at the same point before "
    "differencing). Shape: one partial-agg groupBy to per-(group, "
    "value, side) counts — shuffle at distinct-value cardinality, "
    "never rows — then two window cumsums and a max per group. The "
    "cross-sample complement of q_cusum_shift's temporal level "
    "detector.",
    tags=("audit", "profile", "quality"),
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import ks_drift

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").alias("text_len"), "lang"
    )
    return ks_drift(
        docs,
        "text_len",
        is_right=F.col("lang") != "en",
        group_cols=["source"],
    )
