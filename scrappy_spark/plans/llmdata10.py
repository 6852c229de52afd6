"""LLM-corpus operators, round-6 wave: BM25 lexical retrieval (the
inverted-index counterpart to the embedding RAG path), k-core
decomposition (iterative peeling with the checkpointed-loop contract),
and cross-document keep-first fragment dedup (Dolma/RedPajama-style
paragraph dedup).

The reference has none of these (scrappy.py's closest surfaces are
substring filtering and title-set dedup); they extend the retrieval,
graph, and curation families — each under the full value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .llmdata import _RAW_TOKS
from .registry import register

# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

_BM25_K = 5
_BM25_N_QUERIES = 10  # doc_id < 10 → first-5-token queries

_BM25_SQL = f"""
    WITH tk AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM tk),
    post AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM tok GROUP BY doc_id, term),
    dlen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
             FROM tok GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS total_len
              FROM dlen),
    dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM post GROUP BY term),
    idf AS (SELECT term, df,
                   CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                              * 1000000) AS BIGINT) AS idf_micro,
                   n_docs, total_len
            FROM dft, stats),
    qt AS (SELECT doc_id AS query_id, unnest(list_distinct(toks[1:5])) AS term
           FROM tk WHERE doc_id < {_BM25_N_QUERIES}),
    m AS (SELECT qt.query_id, post.doc_id,
                 (idf.idf_micro * 22 * post.tf * idf.total_len)
                 // (10 * post.tf * idf.total_len + 3 * idf.total_len
                     + 9 * dlen.dl * idf.n_docs) AS contrib_micro
          FROM qt
          JOIN idf USING (term)
          JOIN post USING (term)
          JOIN dlen ON dlen.doc_id = post.doc_id),
    sc AS (SELECT query_id, doc_id,
                  CAST(count(*) AS BIGINT) AS n_matched,
                  CAST(sum(contrib_micro) AS BIGINT) AS score_micro
           FROM m GROUP BY query_id, doc_id),
    rk AS (SELECT query_id, doc_id, n_matched, score_micro,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score_micro DESC, doc_id ASC)
                      AS rank
           FROM sc)
    SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, n_matched,
           score_micro,
           CAST(score_micro AS DOUBLE) / 1000000.0 AS score
    FROM rk WHERE rank <= {_BM25_K}
"""


@register(
    "q_bm25_retrieve",
    sql=_BM25_SQL,
    doc="BM25 lexical retrieval (k1=1.2, b=0.75): postings/doc-length/"
    "doc-frequency tables from ONE corpus pass, query terms broadcast, "
    "score via the exactly-rational micro-integer formulation "
    "(operators/bm25.py) so the per-doc reduction is an exact integer "
    "sum — the classic inverted-index baseline beside the embedding "
    "RAG path, fully hash-gated. Queries are the first 5 tokens of "
    f"docs 0..{_BM25_N_QUERIES - 1}; top-{_BM25_K} per query by "
    "(score DESC, doc_id ASC).",
    tags=("llm", "retrieval", "agg"),
)
def q_bm25_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bm25 import bm25_retrieve
    from ..operators.mining import tokens_col

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens_col(F.col("text"))
    queries = docs.filter(F.col("doc_id") < _BM25_N_QUERIES).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("query_text"),
    )
    return bm25_retrieve(docs, queries, k=_BM25_K)


# ---------------------------------------------------------------------------
# k-core decomposition over the part co-purchase graph
# ---------------------------------------------------------------------------

_KCORE_K = 80
_KCORE_ROUNDS = 16  # unrolled oracle rounds; peel measured ≤ 7, 2× margin


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled peeling oracle: deg → drop <k endpoints → repeat.
    Extra rounds past the fixpoint are no-ops, so ``rounds`` only
    needs to be ≥ the true peeling depth (measured 5 at sf0.01, 7 max
    observed anywhere; 16 gives 2× margin). MATERIALIZED throughout —
    each round references its predecessor twice and default CTE
    inlining would go exponential (same fix as the BPE oracle).
    """
    ctes = [
        """op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
                       CAST(l_partkey AS BIGINT) AS pk
                FROM lineitem),
    e0 AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b
          FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk)"""
    ]
    for i in range(rounds):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i})
        GROUP BY node),
    e{i + 1} AS MATERIALIZED (
        SELECT e.a, e.b FROM e{i} e
        JOIN d{i} da ON da.node = e.a
        JOIN d{i} db ON db.node = e.b
        WHERE da.deg >= {k} AND db.deg >= {k})"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, CAST(count(*) AS BIGINT) AS core_degree
    FROM (SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
    GROUP BY node
    """
    )


@register(
    "q_kcore_copurchase",
    sql=_kcore_sql(_KCORE_K, _KCORE_ROUNDS),
    doc=f"{_KCORE_K}-core of the part co-purchase graph (Matula-Beck "
    "iterative peeling): each round is one degree partial-agg + "
    "broadcast-anti removal with per-round lineage cuts — the dense-"
    "community extraction that, at 100 TB, prunes a link graph to its "
    "load-bearing core before expensive motif work. The Spark side "
    "peels to a true fixpoint (driver sees only removal-set counts); "
    f"the oracle unrolls {_KCORE_ROUNDS} materialized peel rounds "
    "(2x the measured depth; post-fixpoint rounds are no-ops) and "
    "hash-matches surviving nodes with their in-core degrees.",
    tags=("graph", "iterative"),
)
def q_kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").cast("long").alias("pk"),
    ).distinct()
    pairs = (
        op.select("ok", F.col("pk").alias("src"))
        .join(
            op.select(F.col("ok").alias("ok2"), F.col("pk").alias("dst")),
            F.col("ok") == F.col("ok2"),
        )
        .filter(F.col("src") < F.col("dst"))
    )
    # assert_depth_le pins the oracle's unrolled round count: a deeper
    # peel at a larger SF fails loudly instead of as a bare hash mismatch.
    return kcore(pairs, k=_KCORE_K, assert_depth_le=_KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# Cross-document keep-first fragment dedup
# ---------------------------------------------------------------------------

_FRAG_LINE = 8  # tokens per constructed line

#: line-structured text: tokens chunked into 8-token lines joined by \n
#: (the documents fixture is a flat word stream; exact-dup docs make
#: identical lines recur across docs, which is what the op dedups).
_LINES_SQL = f"""
    lt AS (SELECT doc_id,
                  array_to_string(
                    [array_to_string(
                       list_slice(toks, (i - 1) * {_FRAG_LINE} + 1,
                                  i * {_FRAG_LINE}), ' ')
                     FOR i IN generate_series(
                       1, CAST(ceil(len(toks) / {_FRAG_LINE}.0) AS INT))],
                    chr(10)) AS text
           FROM (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents))
"""


def _lines_col() -> F.Column:
    from ..operators.mining import tokens_col

    toks = tokens_col(F.col("text"))
    n_lines = F.ceil(F.size(toks) / _FRAG_LINE).cast("int")
    # Guard n_lines == 0: Spark's sequence(1, 0) yields [1, 0] (descending
    # default step), which would fabricate two empty fragments for a
    # zero-token doc while DuckDB's generate_series(1, 0) is empty.
    return F.when(
        n_lines > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_lines),
                lambda i: F.array_join(
                    F.slice(toks, (i - 1) * _FRAG_LINE + 1, _FRAG_LINE), " "
                ),
            ),
            "\n",
        ),
    ).otherwise(F.lit(""))


@register(
    "q_dedup_fragments",
    sql=f"""
    WITH {_LINES_SQL},
    fr AS (SELECT doc_id, u.p AS pos, u.f AS frag FROM (
             SELECT doc_id,
                    unnest([{{'p': k - 1, 'w': NULL, 'f': parts[k]}}
                            FOR k IN generate_series(1, len(parts))]) AS u
             FROM (SELECT doc_id, string_split(text, chr(10)) AS parts
                   FROM lt))),
    kp AS (SELECT doc_id, pos, frag,
                  row_number() OVER (PARTITION BY frag
                                     ORDER BY doc_id ASC, pos ASC) AS rn
           FROM fr),
    st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frags
           FROM fr GROUP BY doc_id),
    rb AS (SELECT doc_id,
                  array_to_string(list(frag ORDER BY pos), chr(10))
                      AS clean_text,
                  CAST(count(*) AS BIGINT) AS n_kept
           FROM kp WHERE rn = 1 GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(rb.clean_text, '') AS clean_text,
           CAST(coalesce(st.n_frags, 0) AS BIGINT) AS n_frags,
           CAST(coalesce(rb.n_kept, 0) AS BIGINT) AS n_kept
    FROM documents d
    LEFT JOIN st ON st.doc_id = d.doc_id
    LEFT JOIN rb ON rb.doc_id = d.doc_id
    """,
    doc="Cross-document keep-first fragment dedup (Dolma/RedPajama "
    "paragraph dedup): every distinct line survives only at its first "
    "corpus occurrence (min (doc_id, position)); later copies drop, "
    "wherever they appear. One fragment-key window + per-doc "
    "positional reassembly (operators/curation.py::dedup_fragments). "
    "Input lines are the fixture's tokens chunked 8-per-line, so the "
    "corpus's exact-dup documents exercise real cross-doc drops.",
    tags=("llm", "curation", "dedup"),
)
def q_dedup_fragments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import dedup_fragments

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _lines_col().alias("text")
    )
    return dedup_fragments(docs, delim="\n")
