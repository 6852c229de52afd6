"""LLM-corpus operators, round 2 batch 2: RAG chunking, PMI token
co-occurrence, size-bounded shard manifests, and declarative data-
quality expectation audits.

The reference has no equivalents (its text handling stops at substring
filters and n-gram counts); these are the export-side and analysis-side
operators a 100 TB training-data pipeline runs daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators.mining import tokens_col
from ..operators.sharding import assign_shards
from .registry import register

#: DuckDB mirror of operators/mining.py::tokens_col
_RAW_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

_CHUNK_LEN = 200
_CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


@register(
    "q_chunk_documents",
    sql=f"""
    WITH starts AS (
        SELECT doc_id, text,
               unnest(generate_series(1, greatest(1, n_chars), {_CHUNK_STRIDE}))
                   AS start
        FROM documents
    )
    SELECT doc_id,
           CAST((start - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           substr(text, start, {_CHUNK_LEN}) AS chunk_text,
           CAST(length(substr(text, start, {_CHUNK_LEN})) AS BIGINT)
               AS chunk_len
    FROM starts
    """,
    doc=f"RAG-style document chunking: {_CHUNK_LEN}-char windows every "
    f"{_CHUNK_STRIDE} chars ({_CHUNK_LEN - _CHUNK_STRIDE}-char overlap) "
    "via sequence+explode+substr — pure codegen expressions, zero "
    "shuffle, output size ≈ corpus × (len/stride). Empty docs still "
    "yield one (empty) chunk so no document silently disappears from "
    "the chunk store.",
    tags=("llm", "chunking"),
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    starts = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.lit(1), F.col("n_chars")),
                F.lit(_CHUNK_STRIDE),
            )
        ).alias("start"),
    )
    chunk = F.col("text").substr(F.col("start"), F.lit(_CHUNK_LEN))
    return starts.select(
        "doc_id",
        F.expr(f"(start - 1) div {_CHUNK_STRIDE}").alias("chunk_idx"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )


@register(
    "q_token_pmi",
    sql=f"""
    WITH t AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({_RAW_TOKS})) AS tok
        FROM documents
    ),
    df_freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
    vocab AS (SELECT tok, c FROM df_freq ORDER BY c DESC, tok LIMIT 100),
    tv AS (SELECT t.doc_id, t.tok, v.c FROM t JOIN vocab v USING (tok)),
    n_docs AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM documents),
    pairs AS (
        SELECT a.tok AS tok1, b.tok AS tok2,
               CAST(count(*) AS BIGINT) AS n12,
               any_value(a.c) AS c1, any_value(b.c) AS c2
        FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
    )
    SELECT tok1, tok2, n12,
           CAST(round(ln(CAST(n12 AS DOUBLE) * nd / (c1 * c2)) * 1000000)
                AS BIGINT) AS pmi_micro
    FROM pairs, n_docs
    WHERE n12 >= 5
    ORDER BY pmi_micro DESC, tok1, tok2
    LIMIT 100
    """,
    doc="Pointwise mutual information over co-occurring tokens: distinct "
    "tokens per doc, vocabulary capped to the top-100 by document "
    "frequency (TakeOrderedAndProject with a (count, token) total order "
    "— deterministic and parallel, never a global window), broadcast "
    "vocab join, per-doc self-join bounded by vocab hits per doc, PMI "
    "snapped to integer micro-nats (the unigram_surprisal trick) so the "
    "top-100 cut is hash-stable cross-engine.",
    tags=("llm", "mining", "agg"),
)
def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("tok")
    ).distinct()
    df_freq = t.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = df_freq.orderBy(F.col("c").desc(), "tok").limit(100)
    tv = t.join(F.broadcast(vocab), "tok").select("doc_id", "tok", "c")
    nd = d.agg(F.countDistinct("doc_id").alias("nd"))
    a = tv.select(
        F.col("doc_id"), F.col("tok").alias("tok1"), F.col("c").alias("c1")
    )
    b = tv.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("tok").alias("tok2"),
        F.col("c").alias("c2"),
    )
    pairs = (
        a.join(b, (a.doc_id == b.doc_id_b) & (a.tok1 < b.tok2))
        .groupBy("tok1", "tok2")
        .agg(
            F.count(F.lit(1)).alias("n12"),
            F.any_value(F.col("c1")).alias("c1"),
            F.any_value(F.col("c2")).alias("c2"),
        )
        .filter(F.col("n12") >= 5)
    )
    return (
        pairs.join(F.broadcast(nd))
        .select(
            "tok1",
            "tok2",
            "n12",
            F.round(
                F.log(
                    F.col("n12").cast("double")
                    * F.col("nd")
                    / (F.col("c1") * F.col("c2"))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("pmi_micro"),
        )
        .orderBy(F.col("pmi_micro").desc(), "tok1", "tok2")
        .limit(100)
    )


@register(
    "q_shard_manifest",
    sql="""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(coalesce(sum(n_chars) OVER (
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) // 10000 AS BIGINT) AS shard_id
    FROM documents
    """,
    doc="Size-bounded export-shard assignment (~10 kB per shard here; "
    "~1 GB in production): each doc goes to "
    "floor(bytes_before_it / shard_size) in doc_id order. The naive "
    "formulation is a global ordered window = ONE task; "
    "operators/sharding.py::assign_shards computes the identical prefix "
    "sum with repartitionByRange + per-partition windows + a broadcast "
    "partition-offset table, fully parallel. Hash-equality against the "
    "naive oracle proves the two-phase scan correct.",
    tags=("llm", "layout", "window"),
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return assign_shards(d, "n_chars", 10_000).select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"), "shard_id"
    )


@register(
    "q_expect_audit",
    sql="""
    WITH agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS v_doc_id_not_null,
               CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
                    AS BIGINT) AS v_n_chars_consistent,
               CAST(sum(CASE WHEN NOT regexp_matches(lang, '^[a-z]{2}$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS v_lang_iso2,
               CAST(sum(CASE WHEN n_chars < 1 OR n_chars > 10000
                    THEN 1 ELSE 0 END) AS BIGINT) AS v_n_chars_range,
               CAST(sum(CASE WHEN source IS NULL OR source = ''
                    THEN 1 ELSE 0 END) AS BIGINT) AS v_source_present
        FROM documents
    )
    SELECT 'doc_id_not_null' AS rule, v_doc_id_not_null AS violations,
           n_checked FROM agg
    UNION ALL SELECT 'n_chars_consistent', v_n_chars_consistent, n_checked FROM agg
    UNION ALL SELECT 'lang_iso2', v_lang_iso2, n_checked FROM agg
    UNION ALL SELECT 'n_chars_range', v_n_chars_range, n_checked FROM agg
    UNION ALL SELECT 'source_present', v_source_present, n_checked FROM agg
    """,
    doc="Declarative data-quality expectations (Deequ/Great-Expectations "
    "shape): every rule is a conditional sum in ONE aggregate over ONE "
    "scan — adding a rule costs zero extra passes — then the single "
    "state row is exploded into (rule, violations, n_checked) rows. "
    "At 100 TB this is the cheapest possible audit: no shuffle beyond "
    "the scalar agg's partial-merge.",
    tags=("llm", "quality", "audit"),
)
def q_expect_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    checks = {
        "doc_id_not_null": F.col("doc_id").isNull(),
        "n_chars_consistent": F.col("n_chars") != F.length("text"),
        "lang_iso2": ~F.col("lang").rlike("^[a-z]{2}$"),
        "n_chars_range": (F.col("n_chars") < 1) | (F.col("n_chars") > 10_000),
        "source_present": F.col("source").isNull() | (F.col("source") == ""),
    }
    agg = d.agg(
        F.count(F.lit(1)).alias("n_checked"),
        *[
            F.sum(cond.cast("long")).alias(f"v_{name}")
            for name, cond in checks.items()
        ],
    )
    rules = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"v_{name}").alias("violations")
            )
            for name in checks
        ]
    )
    return agg.select(
        F.explode(rules).alias("r"), F.col("n_checked")
    ).select("r.rule", "r.violations", "n_checked")


_VOCAB_K = 1000

@register(
    "q_vocab_coverage",
    sql=f"""
    WITH tk AS (SELECT doc_id, unnest({_RAW_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
    vocab AS (SELECT tok FROM freq ORDER BY cnt DESC, tok ASC LIMIT {_VOCAB_K}),
    per AS (SELECT t.doc_id, count(*) AS n_tokens,
                   sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
            FROM tk t LEFT JOIN vocab v ON t.tok = v.tok
            GROUP BY t.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(per.n_oov, 0) AS BIGINT) AS n_oov,
           CASE WHEN coalesce(per.n_tokens, 0) > 0
                THEN round(per.n_oov / per.n_tokens, 4) ELSE 0.0 END AS oov_rate
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
    doc=f"Per-document OOV rate against the corpus's own top-{_VOCAB_K} "
    "token vocabulary (tokenizer-health probe before committing a vocab "
    "budget). One explode feeds both the frequency top-k "
    "(TakeOrderedAndProject, deterministic count-then-token tie-break, "
    "broadcast back) and the per-doc OOV aggregation — occurrence "
    "multiplicity counted, one doc-key shuffle.",
    tags=("llm", "text", "quality"),
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import vocab_coverage

    return vocab_coverage(load_table(spark, sf_dir, "documents"), vocab_size=_VOCAB_K)
