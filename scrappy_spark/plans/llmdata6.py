"""LLM-corpus operators, round-5 batch: distributed Bloom-filter
decontamination, interpolated-bigram document perplexity, and
temperature-based group rebalancing.

The reference has no equivalents (its membership test is a pandas
``isin`` on titles, scrappy.py:214-218; it has no LM scoring or
sampling at all); these extend the training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators import bloom as BL, dedup_approx as DA
from ..operators.curation import temperature_sample
from ..operators.textstats import doc_perplexity
from .registry import register

#: DuckDB mirror of operators/mining.py::tokens_col
_RAW_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------

_BLOOM_BENCH_MAX_ID = 25  # docs below this id form the "benchmark" key set

# DuckDB mirror of operators/bloom.py: same md5-derived double hashing,
# same geometry constants — one source of truth so the bank is
# reproduced bit-for-bit.
_BLOOM_SQL = f"""
    toks AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest([array_to_string(toks[i : i + 2], ' ')
                       FOR i IN generate_series(1, len(toks) - 2)]) AS shingle
        FROM toks)),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {_BLOOM_BENCH_MAX_ID}),
    bpos AS (SELECT ((CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)
                      + i * (CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) | 1))
                     % {BL.BLOOM_M_BITS}) AS pos
             FROM bench, (SELECT unnest(range(0, {BL.BLOOM_K})) AS i) g),
    bank AS (SELECT pos >> 5 AS word_idx,
                    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
             FROM bpos GROUP BY 1),
    keys AS (SELECT DISTINCT shingle FROM sh),
    kpos AS (SELECT shingle,
                    ((CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)
                      + i * (CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) | 1))
                     % {BL.BLOOM_M_BITS}) AS pos
             FROM keys, (SELECT unnest(range(0, {BL.BLOOM_K})) AS i) g),
    probed AS (SELECT shingle,
                      min(CASE WHEN word IS NOT NULL
                               AND (word & (CAST(1 AS BIGINT) << CAST(pos & 31 AS INT))) != 0
                          THEN 1 ELSE 0 END) AS bloom_hit
               FROM (SELECT shingle, pos >> 5 AS word_idx, pos & 31 AS pos
                     FROM kpos) p
               LEFT JOIN bank USING (word_idx)
               GROUP BY shingle)
"""


@register(
    "q_bloom_decontaminate",
    sql=f"""
    WITH {_BLOOM_SQL}
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT)                       AS n_shingles,
           CAST(sum(probed.bloom_hit) AS BIGINT)          AS bloom_hits,
           CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT)                                AS exact_hits
    FROM sh
    JOIN probed USING (shingle)
    LEFT JOIN bench b USING (shingle)
    GROUP BY sh.doc_id
    """,
    doc="Bloom-filter decontamination: benchmark 3-gram shingles are "
    "folded into a 2^18-bit bank (partial-agg bit_or, <= 8192 words), "
    "the bank broadcasts, and every corpus shingle is membership-tested "
    "WITHOUT shuffling the corpus on the key. Output counts per doc "
    "include the exact-membership audit column, so the (zero-false-"
    "negative) overcount is visible in the result itself. md5 double "
    "hashing makes the bank bit-identical cross-engine.",
    tags=("llm", "decontaminate", "bloom"),
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = DA.shingles(docs, "text", "doc_id", k=3)
    bench = sh.filter(F.col("doc_id") < _BLOOM_BENCH_MAX_ID).select("shingle").distinct()
    bank = BL.bloom_build(bench, "shingle")
    probed = BL.bloom_probe(sh, bank, "shingle")
    return (
        sh.join(probed, "shingle")
        .join(bench.withColumn("__ex", F.lit(1)), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("bloom_hit").alias("bloom_hits"),
            F.sum(F.when(F.col("__ex").isNotNull(), 1).otherwise(0)).alias("exact_hits"),
        )
    )


# ---------------------------------------------------------------------------
# Interpolated-bigram document perplexity
# ---------------------------------------------------------------------------


@register(
    "q_doc_perplexity",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    big AS (SELECT doc_id,
                   unnest([toks[i] || ' ' || toks[i + 1]
                           FOR i IN generate_series(1, len(toks) - 1)]) AS bigram
            FROM toks),
    uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu
            FROM (SELECT unnest(toks) AS tok FROM toks) GROUP BY tok),
    tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM uni),
    bfreq AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cb FROM big GROUP BY bigram),
    ctx AS (SELECT split_part(bigram, ' ', 1) AS w1, CAST(sum(cb) AS BIGINT) AS c1
            FROM bfreq GROUP BY 1),
    lp AS (SELECT bigram,
                  CAST(round(ln(0.75 * CAST(cb AS DOUBLE) / c1
                                + 0.25 * CAST(cu AS DOUBLE) / n) * 1000000)
                       AS BIGINT) AS lp_micro
           FROM bfreq
           JOIN ctx ON ctx.w1 = split_part(bfreq.bigram, ' ', 1)
           JOIN uni ON uni.tok = split_part(bfreq.bigram, ' ', 2)
           CROSS JOIN tot),
    agg AS (SELECT big.doc_id,
                   CAST(count(*) AS BIGINT)   AS n_bigrams,
                   CAST(-sum(lp_micro) AS BIGINT) AS nll_micro
            FROM big JOIN lp USING (bigram)
            GROUP BY big.doc_id)
    SELECT doc_id, n_bigrams, nll_micro,
           round(exp(CAST(nll_micro AS DOUBLE) / 1000000 / n_bigrams), 4) AS ppl
    FROM agg
    """,
    doc="Per-document perplexity under the corpus's own Jelinek-Mercer "
    "interpolated bigram LM (lambda=0.75) — the CCNet-style quality "
    "signal one rung above unigram surprisal: boilerplate scores low, "
    "shuffled-word gibberish scores high. Per-bigram log-probs snap to "
    "integer micro-nats on the TYPE table so the per-doc reduction is "
    "an exact integer sum; probability tables are Heaps-law-bounded "
    "and broadcast — the corpus never shuffles on a model key.",
    tags=("llm", "quality", "agg"),
)
def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_perplexity(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Temperature-based group rebalancing
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.5
_TEMP_FRAC = 0.5


@register(
    "q_temperature_sample",
    sql=f"""
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS ng FROM documents GROUP BY lang),
    t AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM c),
    w AS (SELECT lang, ng, n,
                 CAST(round(pow(CAST(ng AS DOUBLE) / n, {_TEMP_ALPHA}) * 1000000)
                      AS BIGINT) AS w
          FROM c CROSS JOIN t),
    s AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM w),
    thr AS (SELECT lang,
                   CAST(floor(least(1.0,
                        CAST(round({_TEMP_FRAC} * n) * w AS DOUBLE)
                        / CAST(sw * ng AS DOUBLE)) * 4294967296.0) AS BIGINT) AS thr
            FROM w CROSS JOIN s)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thr USING (lang)
    WHERE CAST(('0x' || substr(md5('temp|' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          < thr.thr
    """,
    doc="Temperature-based language rebalancing (p^alpha mixing, "
    "alpha=0.5, target half the corpus): head languages downsample "
    "toward the tail, per the standard multilingual-LM smoothing rule. "
    "Every cross-row reduction is integer (counts; micro-snapped "
    "weights), the keep rate becomes an integer threshold on the "
    "row's md5 uniform, so the kept set is bit-reproducible on any "
    "engine. One |groups|-row agg broadcast back; the corpus itself "
    "is scan-filtered, never shuffled.",
    tags=("llm", "sampling"),
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return temperature_sample(
        docs, alpha=_TEMP_ALPHA, target_frac=_TEMP_FRAC
    ).select("doc_id", "lang")
