"""Declared queries for the LLM-training-data operators (north star):
dedup (exact / MinHash+LSH / SimHash / Jaccard), similarity search over
embeddings, and text analysis. Built on ``operators.dedup_approx``,
``operators.similarity``, ``operators.textstats``.

All hashing is md5-based so the DuckDB oracle reproduces identical
signatures — cross-engine-portable by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators import dedup_approx as DA, similarity as SIM, textstats as TS
from ..operators.mining import STOPWORDS
from .registry import register

_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)
#: DuckDB token stream WITHOUT stopword removal (mirrors tokens_col)
_RAW_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@register(
    "q_doc_stats",
    sql=f"""
    WITH t AS (SELECT doc_id, text, {_RAW_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT)                 AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT)  AS n_distinct_tokens,
           round(CASE WHEN len(toks) > 0 THEN
                 CAST(list_sum([length(x) FOR x IN toks]) AS DOUBLE) / len(toks)
                 ELSE 0.0 END, 4)                    AS avg_token_len,
           round(CASE WHEN len(toks) > 0 THEN
                 CAST(len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS DOUBLE) / len(toks)
                 ELSE 0.0 END, 4)                    AS stopword_ratio,
           round(CASE WHEN len(toks) > 0 THEN
                 CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                 ELSE 0.0 END, 4)                    AS distinct_ratio,
           round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 4)     AS alpha_ratio
    FROM t
    """,
    doc="Per-document quality metrics (length / stopword / diversity "
    "ratios) — scan-only, no shuffle, codegen-friendly.",
    tags=("llm", "textstats"),
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.doc_stats(load_table(spark, sf_dir, "documents"))


def _lang_id_sql() -> str:
    score_cols = ",\n           ".join(
        "CAST(len(list_intersect(list_distinct(toks), [{ws}])) AS BIGINT) AS score_{lg}".format(
            ws=", ".join(f"'{w}'" for w in TS.LANG_MARKERS[lg]), lg=lg
        )
        for lg in TS.LANG_MARKERS
    )
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in TS.LANG_MARKERS) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lg} = {best} AND {best} > 0 THEN '{lg}'" for lg in TS.LANG_MARKERS
    ) + " ELSE 'und' END"
    return f"""
    WITH t AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
           {score_cols}
          FROM t)
    SELECT doc_id, {case} AS pred_lang,
           score_en, score_de, score_es, score_fr
    FROM s
    """


@register(
    "q_lang_id",
    sql=_lang_id_sql(),
    doc="Marker-word language-ID heuristic: argmax of per-language "
    "marker overlap with deterministic precedence ties.",
    tags=("llm", "textstats"),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.lang_id(load_table(spark, sf_dir, "documents"))


@register(
    "q_fingerprint",
    sql=f"""
    WITH t AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents)
    SELECT doc_id,
           md5(array_to_string(toks, ' ')) AS fingerprint,
           CAST(len(toks) AS BIGINT)       AS n_tokens
    FROM t
    """,
    doc="Canonical document fingerprint: md5 of the normalized token "
    "stream (whitespace/punct-insensitive duplicate detector).",
    tags=("llm", "dedup"),
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.fingerprint(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Dedup family
# --------------------------------------------------------------------------


@register(
    "q_dedup_exact_hash",
    sql="""
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS doc_id,
           count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup by content hash — one shuffle on a uniform key; "
    "the 100 TB workhorse before any near-dup pass.",
    tags=("llm", "dedup"),
)
def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DA.exact_dup_groups(load_table(spark, sf_dir, "documents"))


def _shingles_sql_for(source: str) -> str:
    """Shingle CTE chain over any relation with (doc_id, text)."""
    return f"""
    toks AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM {source}),
    sh AS (SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest([array_to_string(toks[i : i + 2], ' ')
                       FOR i IN generate_series(1, len(toks) - 2)]) AS shingle
        FROM toks))
"""


_SHINGLES_SQL = _shingles_sql_for("documents")

# The (seed, a1, a2, b) universal-hash constants come from the SAME
# table the Spark operator uses (dedup_approx.MINHASH_ABC) — one source
# of truth, so the two sides cannot drift. The base splits into 16-bit
# halves (vector hashing) so the family is universal on the full 32-bit
# base domain; see the MINHASH_ABC docstring.
_MINHASH_PARAMS_SQL = ", ".join(
    f"({seed}, {a1}, {a2}, {b})" for seed, (a1, a2, b) in enumerate(DA.MINHASH_ABC)
)

def _sig_sql_for(source: str) -> str:
    """MinHash-signature CTE chain over any relation with (doc_id, text)."""
    return f"""
    {_shingles_sql_for(source)},
    based AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS base
              FROM sh),
    sig AS (SELECT doc_id, seed,
                   min((a1 * (base // 65536) + a2 * (base % 65536) + b)
                       % {DA.MINHASH_P}) AS minhash
            FROM based, (VALUES {_MINHASH_PARAMS_SQL}) AS params(seed, a1, a2, b)
            GROUP BY doc_id, seed)
"""


_SIG_SQL = _sig_sql_for("documents")


@register(
    "q_minhash_signatures",
    sql=f"""
    WITH {_SIG_SQL}
    SELECT doc_id, CAST(seed AS BIGINT) AS seed, minhash FROM sig
    """,
    doc="MinHash signatures (8 functions, 3-token shingles): ONE md5 "
    "base digest per shingle feeds a Carter-Wegman universal-hash "
    "family (a_i·base + b_i mod 2^31−1) — k× less hashing than the "
    "seeded-digest shape; explode then partial-agg min, shuffle ≤ "
    "n_docs rows.",
    tags=("llm", "dedup"),
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = DA.minhash_signatures(load_table(spark, sf_dir, "documents"))
    return sig.select("doc_id", F.col("seed").cast("long").alias("seed"), "minhash")


# Bucket-size skew cap, shared with the Spark operator (its default) so
# the two sides cannot drift — same one-source-of-truth trick as
# MINHASH_ABC above.
_CAPPED_SIG_SQL = f"""
    ok_buckets AS (SELECT seed, minhash FROM sig
                   GROUP BY seed, minhash
                   HAVING count(*) <= {DA.LSH_MAX_BUCKET}),
    fsig AS (SELECT s.doc_id, s.seed, s.minhash
             FROM sig s JOIN ok_buckets USING (seed, minhash))
"""


@register(
    "q_minhash_pairs",
    sql=f"""
    WITH {_SIG_SQL},
    {_CAPPED_SIG_SQL}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_match
    FROM fsig a JOIN fsig b
      ON a.seed = b.seed AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    """,
    doc="MinHash-LSH near-dup candidate pairs: bucket join on "
    "(seed, minhash) — never an all-pairs product — then a match-count "
    "filter (≥2 of 8 seeds ⇒ est. Jaccard ≳ 0.25). Buckets larger than "
    "the default skew cap are excluded on BOTH sides (shared constant).",
    tags=("llm", "dedup"),
)
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = DA.minhash_signatures(load_table(spark, sf_dir, "documents"))
    return DA.minhash_candidate_pairs(sig, min_matches=2)


@register(
    "q_jaccard_pairs",
    sql=f"""
    WITH s AS (SELECT doc_id, lang, list_distinct({_RAW_TOKS}) AS tok_set
               FROM documents)
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_intersect(a.tok_set, b.tok_set)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.tok_set, b.tok_set))), 4)
               AS jaccard
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id)
    WHERE jaccard >= 0.8
    """,
    doc="Exact n-gram Jaccard near-dup verification over lang-blocked "
    "pairs — blocking keeps the join off O(n²); at scale the block key "
    "is an LSH band instead of lang.",
    tags=("llm", "dedup"),
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DA.jaccard_pairs(docs, block_col="lang", threshold=0.8)


def _simhash_sql(bits: int = 32) -> str:
    bit_sums = ",\n                   ".join(
        f"sum(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)" for b in range(bits)
    )
    return f"""
    WITH t AS (SELECT doc_id, unnest({_RAW_TOKS}) AS tok FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS th FROM t),
    bits AS (SELECT doc_id,
                   {bit_sums}
             FROM h GROUP BY doc_id)
    SELECT doc_id, {fp} AS simhash FROM bits
    """


@register(
    "q_simhash",
    sql=_simhash_sql(32),
    doc="32-bit SimHash fingerprints: per-bit signed majority over "
    "md5-derived token hashes; near-dups differ in few bits. "
    "Pure expressions — explode, partial-agg sums, reassemble.",
    tags=("llm", "dedup"),
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DA.simhash(load_table(spark, sf_dir, "documents"), bits=32)


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------


@register(
    "q_embedding_cosine_topk",
    sql="""
    SELECT query_id, vec_id, cos_sim FROM (
        SELECT q.query_id, e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS cos_sim,
               row_number() OVER (
                   ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) DESC,
                            e.vec_id) AS rn
        FROM embeddings e
        CROSS JOIN (SELECT vec_id AS query_id, embedding AS qv
                    FROM embeddings WHERE vec_id = 0) q)
    WHERE rn <= 10
    """,
    doc="Brute-force cosine top-10 (exact ANN baseline): broadcast query "
    "side, zip_with/aggregate dot product in codegen, per-query window.",
    tags=("llm", "similarity"),
)
def q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.cosine_topk(emb, queries, k=10)


@register(
    "q_label_centroids",
    sql="""
    SELECT label, CAST(g.i AS BIGINT) AS pos,
           round(avg(CAST(embedding[g.i] AS DOUBLE)), 6) AS centroid_val
    FROM embeddings
    CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
    GROUP BY label, g.i
    """,
    doc="Per-label centroid embeddings (IVF coarse quantizer): "
    "posexplode + partial-agg mean, shuffle = n_labels × dim rows.",
    tags=("llm", "similarity"),
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.label_centroids(load_table(spark, sf_dir, "embeddings"))


@register(
    "q_ann_lsh_topk",
    sql="""
    SELECT vec_id AS query_id,
           CAST(1 AS BIGINT) AS n_results,
           CAST(1 AS BIGINT) AS self_found,
           CAST(1 AS BIGINT) AS recall_ok,
           CAST(1 AS BIGINT) AS scores_ok
    FROM embeddings WHERE vec_id < 5
    """,
    doc="LSH-bucketed approximate cosine top-k (random hyperplane signs "
    "from md5 — deterministic, no stored model), declared through its "
    "banded-flag audit (operators/ann_audit.py): per query, the oracle "
    "pins full-k result count, self-retrieval, recall ≥ 1 true top-10 "
    "neighbor (measured min 1 hit at sf0.01/sf0.001 with 4 planes), "
    "and exact-score verification (every returned cos_sim equals the "
    "brute-force cosine recomputed from the raw vectors — the bucket "
    "join paired the right vectors). Raw top-k output stays pinned as "
    "an operator in tests/test_llm_ops.py (recall vs brute force).",
    tags=("llm", "similarity", "approx"),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_audit import topk_recall_audit

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = SIM.ann_lsh_topk(emb, queries, k=10, n_planes=4)
    exact = SIM.cosine_topk(emb, queries, k=10)
    return topk_recall_audit(
        ann, exact, k=10, min_hits=1, scores_from=(emb, queries)
    )


@register(
    "q_unigram_surprisal",
    sql=f"""
    WITH t AS (SELECT doc_id, unnest({_RAW_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS s FROM freq),
    lp AS (SELECT tok,
                  CAST(round(ln(CAST(c AS DOUBLE) / s) * 1000000) AS BIGINT)
                      AS lp_micro
           FROM freq, tot)
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(-sum(lp.lp_micro) AS BIGINT) AS surprisal_micro,
           CAST(-sum(lp.lp_micro) AS DOUBLE) / 1000000 / count(*)
               AS avg_surprisal
    FROM t JOIN lp ON lp.tok = t.tok
    GROUP BY t.doc_id
    """,
    doc="Unigram-LM surprisal per document (cheap perplexity-style "
    "quality signal): corpus token frequencies → per-token log-prob "
    "snapped to integer micro-nats → integer per-doc sum, so the "
    "reduction is exact cross-engine; one float division at the end. "
    "Vocab table broadcast; one explode + two vocab-sized aggregates.",
    tags=("llm", "quality", "agg"),
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import unigram_surprisal

    return unigram_surprisal(load_table(spark, sf_dir, "documents"))


@register(
    "q_ngram_novelty",
    sql=f"""
    WITH t AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct(
                   CASE WHEN len(toks) >= 3 THEN
                     list_transform(range(1, len(toks) - 1),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                   ELSE [] END)) AS gram
          FROM t),
    o AS (SELECT doc_id, gram,
                 min(doc_id) OVER (PARTITION BY gram) AS first_id
          FROM g),
    s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_novel
          FROM o GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(s.n_novel, 0) AS BIGINT) AS n_novel,
           coalesce(s.n_novel, 0) * 10000 // coalesce(s.n_grams, 0)
               AS novel_bp
    FROM documents d LEFT JOIN s USING (doc_id)
    """,
    doc="Per-doc n-gram novelty (share of distinct 3-grams first seen "
    "in this doc, as integer basis points — min-id ownership, one "
    "gram-shuffle window + one doc groupBy; low-novelty docs are "
    "recombinations the corpus already has). Integer div: NULL on "
    "zero-gram docs in BOTH engines.",
    tags=("llm", "quality", "dedup"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import ngram_novelty

    return ngram_novelty(load_table(spark, sf_dir, "documents"))


@register(
    "q_token_drift",
    sql=f"""
    WITH o AS (SELECT unnest({_RAW_TOKS}) AS tok FROM documents
               WHERE doc_id % 2 = 0),
    n AS (SELECT unnest({_RAW_TOKS}) AS tok FROM documents
          WHERE doc_id % 2 = 1),
    vo AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_old FROM o GROUP BY tok),
    vn AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_new FROM n GROUP BY tok),
    j AS (SELECT c_new, c_old FROM vn FULL JOIN vo ON vn.tok = vo.tok),
    t AS (SELECT (SELECT sum(c_old) FROM vo) AS t_old,
                 (SELECT sum(c_new) FROM vn) AS t_new)
    SELECT
      CAST(sum(CASE WHEN c_old IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS vocab_old,
      CAST(sum(CASE WHEN c_new IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS vocab_new,
      CAST(sum(CASE WHEN c_new IS NOT NULL AND c_old IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS vocab_shared,
      CAST(sum(CASE WHEN c_new IS NOT NULL AND c_old IS NOT NULL THEN
          c_new * (CAST(round(ln(CAST(c_new AS DOUBLE) / t_new) * 1000000)
                        AS BIGINT)
                   - CAST(round(ln(CAST(c_old AS DOUBLE) / t_old) * 1000000)
                          AS BIGINT))
          ELSE 0 END) AS BIGINT) AS kl_contrib_micro,
      CAST(sum(CASE WHEN c_new IS NOT NULL AND c_old IS NULL THEN c_new
               ELSE 0 END) * 10000 // max(t_new) AS BIGINT) AS oov_new_bp,
      CAST(sum(CASE WHEN c_new IS NOT NULL AND c_old IS NOT NULL THEN
          c_new * (CAST(round(ln(CAST(c_new AS DOUBLE) / t_new) * 1000000)
                        AS BIGINT)
                   - CAST(round(ln(CAST(c_old AS DOUBLE) / t_old) * 1000000)
                          AS BIGINT))
          ELSE 0 END) AS DOUBLE) / 1000000 / max(t_new) AS kl_nats
    FROM j, t
    """,
    doc="Corpus drift between two versions (old = even doc_ids, new = "
    "odd): unigram KL(new‖old) in integer micro-nat contributions "
    "(one float division at the end) + new-only OOV mass in basis "
    "points — the distribution-shift monitor between crawls. Two "
    "vocab aggs, one vocab-keyed full-outer join, 1-row reduce.",
    tags=("llm", "quality", "drift"),
)
def q_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import token_drift

    docs = load_table(spark, sf_dir, "documents")
    return token_drift(
        docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)
    )


@register(
    "q_incremental_novelty",
    sql=f"""
    WITH bt AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents
                WHERE doc_id % 2 = 0),
    base_g AS (SELECT DISTINCT
                 unnest(list_distinct(
                   CASE WHEN len(toks) >= 3 THEN
                     list_transform(range(1, len(toks) - 1),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                   ELSE [] END)) AS gram
               FROM bt),
    nt AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents
           WHERE doc_id % 2 = 1),
    g AS (SELECT doc_id,
                 unnest(list_distinct(
                   CASE WHEN len(toks) >= 3 THEN
                     list_transform(range(1, len(toks) - 1),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                   ELSE [] END)) AS gram
          FROM nt),
    o AS (SELECT doc_id, gram,
                 min(doc_id) OVER (PARTITION BY gram) AS batch_first,
                 gram IN (SELECT gram FROM base_g) AS in_base
          FROM g),
    s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN NOT in_base AND batch_first = doc_id
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
          FROM o GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(s.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(coalesce(s.n_novel, 0) * 10000 // coalesce(s.n_grams, 0)
                AS BIGINT) AS novel_bp
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN s USING (doc_id)
    """,
    doc="Incremental novelty: odd-doc batch scored against the gram "
    "index built from even docs — base text never re-read, base wins "
    "regardless of id ordering (ingest-order semantics, deliberately "
    "different from min-id over the union). The daily-ingest twin of "
    "q_ngram_novelty, mirroring q_incremental_dedup_pairs.",
    tags=("llm", "quality", "dedup", "incremental"),
)
def q_incremental_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import incremental_ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    from ..operators.textstats import ngram_index

    scores, _ = incremental_ngram_novelty(batch, ngram_index(base))
    return scores


@register(
    "q_containment_pairs",
    sql=f"""
    WITH s AS (SELECT doc_id, lang, list_distinct({_RAW_TOKS}) AS tok_set
               FROM documents)
    SELECT id_a, id_b, inter, containment_a_bp, containment_b_bp FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.tok_set, b.tok_set)) AS BIGINT)
                   AS inter,
               CAST(len(list_intersect(a.tok_set, b.tok_set)) * 10000
                    // len(a.tok_set) AS BIGINT) AS containment_a_bp,
               CAST(len(list_intersect(a.tok_set, b.tok_set)) * 10000
                    // len(b.tok_set) AS BIGINT) AS containment_b_bp
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id)
    WHERE containment_a_bp >= 8000 OR containment_b_bp >= 8000
    """,
    doc="Asymmetric containment (|A∩B|/|A| and /|B| in integer basis "
    "points) over lang-blocked pairs — catches wholesale-quoting "
    "near-dups Jaccard misses when sizes differ; keep if either "
    "direction clears 0.8.",
    tags=("llm", "dedup"),
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DA.containment_pairs(docs, block_col="lang", threshold=0.8)


@register(
    "q_containment_verified",
    sql=f"""
    WITH {_SIG_SQL},
    {_CAPPED_SIG_SQL},
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fsig a JOIN fsig b
        ON a.seed = b.seed AND a.minhash = b.minhash AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2),
    s AS (SELECT doc_id, list_distinct({_RAW_TOKS}) AS tok_set FROM documents)
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(sa.tok_set, sb.tok_set)) AS BIGINT)
               AS inter,
           CAST(len(list_intersect(sa.tok_set, sb.tok_set)) * 10000
                // len(sa.tok_set) AS BIGINT) AS containment_a_bp,
           CAST(len(list_intersect(sa.tok_set, sb.tok_set)) * 10000
                // len(sb.tok_set) AS BIGINT) AS containment_b_bp
    FROM cand c
    JOIN s sa ON sa.doc_id = c.id_a
    JOIN s sb ON sb.doc_id = c.id_b
    """,
    doc="Containment verification over LSH candidates — the production "
    "shape: MinHash buckets generate candidates (capped, never "
    "all-pairs), only those pairs pay the exact set intersection. "
    "Completes the asymmetric-dedup scale story the lang-blocked "
    "q_containment_pairs demos.",
    tags=("llm", "dedup"),
)
def q_containment_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = DA.minhash_candidate_pairs(DA.minhash_signatures(docs), min_matches=2)
    return DA.verify_containment(docs, pairs)
