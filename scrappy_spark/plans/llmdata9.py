"""Round-5 capstone: the composed end-to-end curation pipeline as ONE
hash-verified declared query.

Every stage (dedup closure, decontamination, quality floor, leakage-
safe splits) already has its own oracle-checked query; this composes
them — the oracle stitches the same shared SQL fragments (one source
of truth per constant), so the driver value-hash-gates the WHOLE
pipeline, not just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators.curation import sample_threshold
from .llmdata import _RAW_TOKS, _sig_sql_for
from .registry import register

_CURATE_FRAC = 0.2
_T1 = sample_threshold(0.8)
_T2 = sample_threshold(0.9)

#: 3-gram expression over a token-array column named ``toks``
_GRAMS3 = (
    "unnest(CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(1, len(toks) - 1), "
    "i -> array_to_string(list_slice(toks, i, i + 2), ' ')) "
    "ELSE [] END)"
)

_STOPWORDS_SQL = (
    "('a','an','and','are','as','at','be','by','for','from',"
    "'has','in','is','it','its','of','on','that','the','to',"
    "'was','were','will','with')"
)


@register(
    "q_curate_corpus",
    sql=f"""
    WITH RECURSIVE
    tdocs AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
    bdocs AS (SELECT * FROM documents WHERE doc_id % 97 = 0),
    {_sig_sql_for("tdocs")},
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b
        ON a.seed = b.seed AND a.minhash = b.minhash AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2),
    edges AS (SELECT id_a AS a, id_b AS b FROM cand
              UNION SELECT id_b, id_a FROM cand),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (
      SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS component
      FROM tdocs d LEFT JOIN reach r ON r.a = d.doc_id
      GROUP BY d.doc_id),
    canon AS (SELECT doc_id, component FROM comp WHERE doc_id = component),
    tg AS (SELECT t.doc_id, {_GRAMS3} AS gram
           FROM toks t JOIN canon c ON c.doc_id = t.doc_id),
    btoks AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM bdocs),
    bg AS (SELECT DISTINCT {_GRAMS3} AS gram FROM btoks),
    hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (gram)),
    s AS (SELECT doc_id,
                 len(toks) AS n_tokens,
                 CASE WHEN len(toks) > 0
                      THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                      ELSE 0.0 END AS distinct_ratio,
                 CASE WHEN len(toks) > 0
                      THEN CAST(len(list_filter(toks, x -> x IN
                        {_STOPWORDS_SQL})) AS DOUBLE) / len(toks)
                      ELSE 0.0 END AS stopword_ratio
          FROM toks),
    q AS (SELECT doc_id,
                 round(0.4 * least(n_tokens / 64.0, 1.0)
                       + 0.3 * distinct_ratio
                       + 0.3 * (1.0 - abs(stopword_ratio - 0.08) / 0.92), 4)
                     AS quality_score
          FROM s),
    pool AS (SELECT c.doc_id, c.component, d.lang, q.quality_score
             FROM canon c
             JOIN tdocs d ON d.doc_id = c.doc_id
             JOIN q ON q.doc_id = c.doc_id
             WHERE c.doc_id NOT IN (SELECT doc_id FROM hits)),
    r AS (SELECT doc_id, component, lang, quality_score,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY quality_score ASC, doc_id ASC) AS rk,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM pool),
    kept AS (SELECT doc_id, component FROM r
             WHERE rk > floor({_CURATE_FRAC} * n))
    SELECT m.doc_id, m.component,
           CASE WHEN m.doc_id <> m.component THEN 'dup'
                WHEN m.doc_id IN (SELECT doc_id FROM hits) THEN 'contaminated'
                WHEN k.doc_id IS NULL THEN 'low_quality'
                ELSE 'kept' END AS verdict,
           CASE WHEN k.doc_id IS NOT NULL THEN
                CASE WHEN substr(md5('split|' || m.component), 1, 4) < '{_T1}'
                     THEN 'train'
                     WHEN substr(md5('split|' || m.component), 1, 4) < '{_T2}'
                     THEN 'val'
                     ELSE 'test' END
           END AS split
    FROM comp m LEFT JOIN kept k USING (doc_id)
    """,
    doc="The composed curation pipeline, hash-verified END-TO-END: "
    "near-dup dedup (recursive-CTE closure oracle) -> 3-gram "
    "decontamination vs a benchmark slice -> per-lang quality floor "
    "(integer rule) -> leakage-safe splits hashed on the near-dup "
    "cluster. One row per input doc with its stage verdict "
    "(dup/contaminated/low_quality/kept) and, for kept docs, the "
    "split. Each stage keeps its own scale contract "
    "(collapse-before-LSH, broadcast bench grams, partitioned floor "
    "window, scan-side split hash); the oracle reuses the same shared "
    "SQL fragments as the per-stage queries.",
    tags=("llm", "pipeline", "curation", "dedup"),
)
def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    # uncapped pair generation to match the closure oracle exactly,
    # same as q_dedup_corpus (the cap's behavior has its own query).
    _, report = curate_corpus(
        train, bench, floor_frac=_CURATE_FRAC, max_bucket_size=None
    )
    return report


_JACC_T_BP = 6000  # Jaccard threshold in basis points, shared with the oracle

#: brute-force shared-token all-pairs oracle — ONE source of truth,
#: shared verbatim by the direct query and the collapse-first variant:
#: identical SQL on both proves the two Spark plans result-equal.
_JACC_BRUTE_SQL = f"""
    WITH s AS (SELECT doc_id AS id, list_distinct({_RAW_TOKS}) AS ts
               FROM documents),
    sz AS (SELECT id, CAST(len(ts) AS BIGINT) AS n FROM s),
    tok AS (SELECT id, unnest(ts) AS tok FROM s),
    i AS (SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
          FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id
          GROUP BY 1, 2)
    SELECT id_a, id_b, inter,
           CAST(na.n + nb.n - inter AS BIGINT) AS un,
           CAST((10000 * inter) // (na.n + nb.n - inter) AS BIGINT)
               AS jaccard_bp
    FROM i JOIN sz na ON na.id = i.id_a
           JOIN sz nb ON nb.id = i.id_b
    WHERE 10000 * inter >= {_JACC_T_BP} * (na.n + nb.n - inter)
    """


@register(
    "q_jaccard_join_exact",
    sql=_JACC_BRUTE_SQL,
    doc="EXACT Jaccard similarity join via prefix filtering (AllPairs/"
    "PPJoin): tokens ordered by ascending global frequency, candidates "
    "blocked on each doc's rare-token prefix plus a length filter, then "
    "exact integer verification — zero misses, unlike the LSH path. "
    "The oracle is the brute-force shared-token all-pairs join, so the "
    "hash match PROVES the prefix filter dropped no qualifying pair. "
    "All arithmetic in integer basis points (bit-identical engines).",
    tags=("llm", "dedup", "join"),
)
def q_jaccard_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup_approx import prefix_filter_jaccard_join

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_join(docs, threshold_bp=_JACC_T_BP)


@register(
    "q_jaccard_join_collapsed",
    sql=_JACC_BRUTE_SQL,
    doc="Collapse-first scale path for the exact similarity join: "
    "prefix-filter join on one representative per DISTINCT text, then "
    "duplicate-group fan-out (within-group pairs at Jaccard 10000, "
    "cross-group pairs inheriting the rep pair's overlap). The oracle "
    "is the IDENTICAL brute-force SQL as q_jaccard_join_exact, so the "
    "hash match proves the collapse optimization result-neutral — the "
    "quadratic join work runs on unique texts only, and duplicate "
    "multiplicity is paid in output fan-out, not candidate pairs.",
    tags=("llm", "dedup", "join"),
)
def q_jaccard_join_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup_approx import prefix_filter_jaccard_join_collapsed

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_join_collapsed(docs, threshold_bp=_JACC_T_BP)
