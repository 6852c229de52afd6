"""Declared queries for the corpus-curation operators
(``operators.curation``): deterministic sampling / dataset mixing, PII
scrubbing, boilerplate removal, benchmark decontamination, repetition
quality, sequence packing, and URL-domain stats.

Every query is engine-portable by construction (md5-bucket sampling,
integer-exact thresholds, shared regex subset), so each has a full
DuckDB value-hash oracle — no rows-only entries in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators import curation as CU
from .llmdata import _RAW_TOKS
from .registry import register


# --------------------------------------------------------------------------
# Deterministic sampling / mixing
# --------------------------------------------------------------------------

_SAMPLE_THR = CU.sample_threshold(0.2)

@register(
    "q_hash_sample",
    sql=f"""
    SELECT doc_id, source FROM documents
    WHERE substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 4) < '{_SAMPLE_THR}'
    """,
    doc="Deterministic 20% sample via salted md5 bucket — stable under "
    "retries/reordering and identical on any engine, unlike rand()-"
    "based sample(). Scan-only, fully pushed down.",
    tags=("llm", "curation", "sampling"),
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return CU.hash_sample(docs, 0.2).select("doc_id", "source")


_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1

def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN '{CU.sample_threshold(r)}'" for s, r in _MIX_RATES.items()
    )
    return f"CASE source {whens} ELSE '{CU.sample_threshold(_MIX_DEFAULT)}' END"


@register(
    "q_corpus_mix",
    sql=f"""
    SELECT source,
           count(*) AS n_total,
           count(*) FILTER (
             substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 4) < {_mix_case_sql()}
           ) AS n_kept
    FROM documents GROUP BY source
    """,
    doc="Weighted dataset mixing: per-source deterministic sampling "
    "rates (the training-mix knob), audited as kept/total per stratum. "
    "One scan, one partial-agg groupBy.",
    tags=("llm", "curation", "sampling"),
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mixed = CU.mix_corpora(docs, _MIX_RATES, default_rate=_MIX_DEFAULT)
    return mixed.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.count_if(F.col("kept")).alias("n_kept"),
    )


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

#: deterministic PII injection so the scrubber has real work on the
#: synthetic fixture text; both engines build the identical string.
_PII_SUFFIX_SPARK = lambda: F.concat(  # noqa: E731
    F.col("text"),
    F.lit(" contact user"),
    F.col("doc_id").cast("string"),
    F.lit("@mail.example.com or https://ex.example.com/u/"),
    F.col("doc_id").cast("string"),
    F.lit(" ssn 123-45-6789 tel 555-012-3456"),
)

_PII_SUFFIX_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or https://ex.example.com/u/'"
    " || CAST(doc_id AS VARCHAR) || ' ssn 123-45-6789 tel 555-012-3456'"
)

def _scrub_sql(expr: str) -> str:
    out = expr
    for pat, repl in CU.PII_RULES:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


@register(
    "q_pii_scrub",
    sql=f"""
    SELECT doc_id, {_scrub_sql(f"({_PII_SUFFIX_SQL})")} AS clean
    FROM documents
    """,
    doc="PII redaction (URL/email/SSN/phone) over deterministically "
    "injected spans — chained regexp_replace in the shared Java/RE2 "
    "regex subset; scan-only, codegen.",
    tags=("llm", "curation"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", CU.scrub_pii(_PII_SUFFIX_SPARK()).alias("clean"))


# --------------------------------------------------------------------------
# Boilerplate removal
# --------------------------------------------------------------------------

@register(
    "q_remove_boilerplate",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS frags FROM documents),
    tot AS (SELECT count(*) AS total FROM documents),
    f AS (SELECT doc_id, unnest(frags) AS frag FROM t),
    freq AS (SELECT frag, count(DISTINCT doc_id) AS nd FROM f GROUP BY frag),
    common AS (SELECT frag FROM freq, tot WHERE nd * 100 > 80 * total),
    cl AS (SELECT coalesce(list(frag), []) AS bad FROM common)
    SELECT doc_id,
           array_to_string(list_filter(frags, x -> NOT list_contains(bad, x)), ' ') AS clean_text
    FROM t, cl
    """,
    doc="Common-fragment (boilerplate) suppression: drop fragments "
    "present in >80% of documents, preserving order and duplicates of "
    "the rest. posexplode → doc-freq partial agg → broadcast anti-join "
    "→ positional reassembly; integer-exact threshold.",
    tags=("llm", "curation"),
)
def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return CU.remove_common_fragments(docs, delim=" ", max_doc_pct=80)


# --------------------------------------------------------------------------
# Cross-document repeated-span removal
# --------------------------------------------------------------------------

_SPAN_LEN = 8

@register(
    "q_remove_repeated_spans",
    sql=f"""
    WITH t AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    spans AS (
      SELECT doc_id, u.i AS pos,
             array_to_string(toks[u.i : u.i + {_SPAN_LEN - 1}], ' ') AS span
      FROM t, unnest(generate_series(1, greatest(len(toks) - {_SPAN_LEN - 1}, 0))) AS u(i)),
    rep AS (SELECT span FROM spans GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
    cov AS (
      SELECT DISTINCT s.doc_id, s.pos + o.off AS cpos
      FROM spans s JOIN rep r ON s.span = r.span,
           unnest(generate_series(0, {_SPAN_LEN - 1})) AS o(off)),
    pos AS (
      SELECT doc_id, u.i AS tpos, toks[u.i] AS tok
      FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
    kept AS (
      SELECT p.* FROM pos p ANTI JOIN cov c
        ON p.doc_id = c.doc_id AND p.tpos = c.cpos),
    reb AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id, coalesce(reb.clean_text, '') AS clean_text,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
    FROM t LEFT JOIN reb ON t.doc_id = reb.doc_id
    """,
    doc=f"Cross-document repeated-span (substring) dedup: {_SPAN_LEN}-token "
    "windows appearing verbatim in ≥2 documents are removed from every "
    "document — the span-level memorization filter whole-doc dedup and "
    "line-boilerplate removal both miss. Position-keyed window explode "
    "→ span doc-freq partial agg → coverage explode (span_len rows per "
    "hit) → positional anti-join → ordered reassembly; two linear "
    "shuffles (span key, doc key), no suffix array needed at fixed "
    "span length.",
    tags=("llm", "curation", "dedup"),
)
def q_remove_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return CU.remove_repeated_spans(docs, span_len=_SPAN_LEN, min_docs=2)


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

_DECON_GRAMS = (
    "CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), "
    "i -> array_to_string(list_slice(toks, i, i + 2), ' ')) ELSE [] END"
)

@register(
    "q_decontaminate",
    sql=f"""
    WITH t AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id, unnest({_DECON_GRAMS}) AS gram FROM t),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    hits AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
             WHERE g.doc_id % 97 <> 0)
    SELECT d.doc_id, h.doc_id IS NOT NULL AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 97 <> 0
    """,
    doc="Train/eval overlap detection: flag training docs sharing any "
    "word 3-gram with the benchmark slice (doc_id % 97 = 0). The small "
    "benchmark gram set is broadcast to the corpus — the corpus never "
    "shuffles on gram.",
    tags=("llm", "curation", "dedup"),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return CU.decontaminate(train, bench, n=3).select("doc_id", "contaminated")


# --------------------------------------------------------------------------
# Repetition quality (Gopher rules)
# --------------------------------------------------------------------------

_BIGRAMS = (
    "CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), "
    "i -> array_to_string(list_slice(toks, i, i + 1), ' ')) ELSE [] END"
)

@register(
    "q_repetition_stats",
    sql=f"""
    WITH t AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    b AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
                 {_BIGRAMS} AS bgs
          FROM t),
    e AS (SELECT doc_id, unnest(bgs) AS bg FROM b),
    c AS (SELECT doc_id, bg, count(*) AS cnt FROM e GROUP BY doc_id, bg),
    a AS (SELECT doc_id, max(cnt) AS top_bg, sum(cnt) AS n_bg,
                 sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_bg
          FROM c GROUP BY doc_id)
    SELECT b.doc_id, b.n_words,
           round(CASE WHEN b.n_words > 0
                 THEN 1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_words
                 ELSE 0.0 END, 4) AS dup_word_frac,
           round(CASE WHEN coalesce(a.n_bg, 0) > 0
                 THEN CAST(coalesce(a.top_bg, 0) AS DOUBLE) / a.n_bg
                 ELSE 0.0 END, 4) AS top_bigram_frac,
           round(CASE WHEN coalesce(a.n_bg, 0) > 0
                 THEN CAST(coalesce(a.dup_bg, 0) AS DOUBLE) / a.n_bg
                 ELSE 0.0 END, 4) AS dup_bigram_frac,
           (dup_word_frac <= 0.9 AND top_bigram_frac <= 0.2
            AND dup_bigram_frac <= 0.9) AS keep
    FROM b LEFT JOIN a ON b.doc_id = a.doc_id
    """,
    doc="Gopher-style repetition metrics: duplicate-word fraction, "
    "most-common-bigram mass, duplicate-bigram mass, and the keep "
    "verdict. Bigram mode via explode → partial-agg (linear), not the "
    "O(len²) scan-only transform.",
    tags=("llm", "curation", "textstats"),
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CU.repetition_stats(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------

@register(
    "q_pack_sequences",
    sql=f"""
    WITH t AS (SELECT doc_id, source,
                      CAST(len({_RAW_TOKS}) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
          FROM t)
    SELECT doc_id, source, n_tokens,
           cum_before // 512 AS chunk_id,
           cum_before % 512 AS chunk_offset
    FROM c
    """,
    doc="Concat-then-chunk sequence packing (512-token chunks): each "
    "doc gets the chunk where it starts + offset. One window per "
    "source partition — no global sort at scale; integer div exact.",
    tags=("llm", "curation"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CU.pack_sequences(load_table(spark, sf_dir, "documents"), budget=512)


# --------------------------------------------------------------------------
# URL / domain analysis
# --------------------------------------------------------------------------

@register(
    "q_domain_stats",
    sql="""
    WITH u AS (SELECT doc_id, n_chars,
        'https://d' || CAST(doc_id % 50 AS VARCHAR) || '.' || source ||
        '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents),
    d AS (SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain, n_chars FROM u)
    SELECT domain, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM d GROUP BY domain
    ORDER BY n_docs DESC, domain LIMIT 20
    """,
    doc="Per-domain corpus stats over (synthesized deterministic) URLs: "
    "host extraction via parse_url, partial-agg rollup, total-ordered "
    "top-20. The domain-blocklist/quality-by-domain primitive.",
    tags=("llm", "curation"),
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://d"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("."),
        F.col("source"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
    )
    return (
        docs.select(F.parse_url(url, F.lit("HOST")).alias("domain"), "n_chars")
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy(F.desc("n_docs"), "domain")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Column profiling
# --------------------------------------------------------------------------

def _profile_branch_sql(col: str) -> str:
    return f"""
    SELECT '{col}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
           min(CAST({col} AS VARCHAR)) AS min_value,
           max(CAST({col} AS VARCHAR)) AS max_value,
           CAST(coalesce(sum(length(CAST({col} AS VARCHAR))), 0) AS DOUBLE)
               / count(*) AS avg_len
    FROM documents
    """


@register(
    "q_profile_columns",
    sql=" UNION ALL ".join(
        _profile_branch_sql(c)
        for c in ("doc_id", "text", "lang", "source", "n_chars")
    ),
    doc="Data-quality profile of the documents table: null count, "
    "exact distinct count, lexicographic min/max and average value "
    "length for every column, computed as parallel aggregates in ONE "
    "scan and unpivoted with a zero-shuffle stack — the oracle's "
    "UNION ALL shape would scan the table once per column. Average "
    "length divides an exact integer byte-sum once at the end, so the "
    "value is shuffle-order stable.",
    tags=("profiling", "agg", "llm-data"),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_columns

    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )


@register(
    "q_length_batches",
    sql=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len({_RAW_TOKS}) AS BIGINT) AS n_tokens
        FROM documents),
    b AS (
        SELECT doc_id, source, n_tokens,
               CAST(n_tokens > 32 AS BIGINT) + CAST(n_tokens > 128 AS BIGINT)
                   + CAST(n_tokens > 512 AS BIGINT) AS bucket
        FROM t)
    SELECT doc_id, source, n_tokens, bucket,
           CAST((row_number() OVER (
               PARTITION BY source, bucket ORDER BY doc_id) - 1) // 16
               AS BIGINT) AS batch_idx,
           CAST(([32, 128, 512][CAST(bucket AS INT) + 1]) AS BIGINT)
               AS pad_len
    FROM b
    """,
    doc="Length-bucketed batch assignment: docs bucketed by token-"
    "length upper edges (32/128/512/overflow) and numbered into "
    "16-doc batches within (source, bucket) — deterministic doc_id "
    "order, per-stream windows so no global sort exists at any "
    "corpus size. pad_len is the bucket's pad target (NULL for the "
    "open-ended overflow bucket).",
    tags=("llm-data", "curation", "window"),
)
def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import length_buckets

    return length_buckets(
        load_table(spark, sf_dir, "documents"),
        boundaries=(32, 128, 512),
        batch_size=16,
    )
