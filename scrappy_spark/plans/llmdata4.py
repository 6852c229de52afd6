"""LLM-data batch 4: domain-quota sampling and embedding quantization.

Both are 100 TB-first curation ops: quotas bound head-heavy sources
without touching the long tail; int8 quantization cuts vector storage
4× with a per-row reconstruction-error audit. Engine-portable math
only (md5 ordering, plain double arithmetic) so DuckDB reproduces the
exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators.curation import quota_sample
from ..operators.similarity import dequantize_int8, quantize_int8
from .registry import register


@register(
    "q_quota_sample",
    sql="""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(concat('quota', '|', CAST(doc_id AS VARCHAR))),
                            doc_id) AS __rk
        FROM documents)
    WHERE __rk <= 15
    """,
    doc="Domain-quota sampling: cap every source at 15 docs chosen by "
    "salted-md5 order (deterministic, unbiased within group; small "
    "sources pass through whole). One hash shuffle on source; rank "
    "and filter share the exchange.",
    tags=("llm", "curation", "sampling"),
)
def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quota_sample(docs, quota=15, group_col="source", id_col="doc_id").select(
        "doc_id", "source"
    )


@register(
    "q_weighted_sample",
    sql="""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               pow(CAST(concat('0x', substring(md5(concat('wsample', '|',
                        CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                   / 4294967296.0,
                   1.0 / n_chars) AS wkey
        FROM documents)
    ORDER BY wkey DESC, doc_id LIMIT 40
    """,
    doc="Weight-proportional sampling without replacement (Efraimidis-"
    "Spirakis): key = u^(1/weight) with a deterministic md5-derived "
    "uniform, top-k keys win — doubly-weighted rows are doubly "
    "likely, the draw is reproducible, and the plan is one "
    "TakeOrderedAndProject (no global sort, no cumulative-weight "
    "pass). Weight here = n_chars (longer docs favored).",
    tags=("llm", "curation", "sampling"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, k=40, weight_col="n_chars").select(
        "doc_id", "source"
    )


@register(
    "q_train_val_split",
    sql="""
    SELECT split, count(*) AS n FROM (
        SELECT CASE
            WHEN substring(md5(concat('split', '|', CAST(doc_id AS VARCHAR))), 1, 4)
                 < 'cccc' THEN 'train'
            WHEN substring(md5(concat('split', '|', CAST(doc_id AS VARCHAR))), 1, 4)
                 < 'e666' THEN 'val'
            ELSE 'test' END AS split
        FROM documents)
    GROUP BY split
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by salted "
    "md5 bucket — stable under retries, engine-portable, and "
    "key-consistent across tables (a doc and its embeddings share a "
    "split; no leakage through joins). Scan-only; the count here is "
    "the auditable size report. Thresholds: 0.8*65536=0xcccc, "
    "0.9*65536=0xe666.",
    tags=("llm", "curation", "sampling"),
)
def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import assign_splits

    docs = load_table(spark, sf_dir, "documents")
    return assign_splits(docs).groupBy("split").agg(F.count("*").alias("n"))


@register(
    "q_matryoshka_energy",
    sql="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm_full,
           round(sqrt(list_sum(list_transform(embedding[1:16],
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm_head,
           round(list_sum(list_transform(embedding[1:16],
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
               / list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS energy_ratio
    FROM embeddings
    """,
    doc="Matryoshka truncation audit: L2 norm of the full vector vs "
    "its 16-dim head and the head's energy share — the decision input "
    "for truncating embeddings (4x cheaper ANN/storage when the head "
    "carries most energy). Scan-only array expressions, zero shuffle.",
    tags=("llm", "similarity", "scalar"),
)
def q_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")

    def sq_sum(col):
        return F.aggregate(
            col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )

    full = sq_sum(F.col("embedding"))
    head = sq_sum(F.slice("embedding", 1, 16))
    return e.select(
        "vec_id",
        F.round(F.sqrt(full), 6).alias("norm_full"),
        F.round(F.sqrt(head), 6).alias("norm_head"),
        F.round(head / full, 6).alias("energy_ratio"),
    )


@register(
    "q_embedding_quantize",
    sql="""
    WITH q AS (
        SELECT vec_id,
               CAST(list_min(embedding) AS DOUBLE) AS vmin,
               CAST(list_max(embedding) AS DOUBLE)
                 - CAST(list_min(embedding) AS DOUBLE) AS rng,
               embedding
        FROM embeddings)
    SELECT vec_id,
           CAST(CASE WHEN rng = 0 THEN 0 ELSE list_sum(list_transform(embedding,
                x -> CAST(round((CAST(x AS DOUBLE) - vmin) / (rng / 255.0)) AS INT)))
           END AS BIGINT) AS code_sum,
           round(rng / 255.0, 9) AS q_scale,
           round(CASE WHEN rng = 0 THEN 0.0 ELSE
               list_sum(list_transform(embedding,
                   x -> pow(CAST(x AS DOUBLE)
                        - (vmin + round((CAST(x AS DOUBLE) - vmin) / (rng / 255.0))
                               * (rng / 255.0)), 2)))
               / len(embedding) END, 8) AS mse
    FROM q
    """,
    doc="Int8 scalar quantization of the embedding column with a "
    "reconstruction audit: per-vector code checksum, scale, and the "
    "dequantization MSE. Scan-only column expressions (array_min/max "
    "+ transform + aggregate), zero shuffle; 4x storage cut is the "
    "standard trade for 100 TB vector corpora.",
    tags=("llm", "similarity", "quantization"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = dequantize_int8(quantize_int8(e))
    err2 = F.zip_with(
        F.col("embedding"),
        F.col("dequantized"),
        lambda x, y: F.pow(x.cast("double") - y, F.lit(2)),
    )
    return q.select(
        "vec_id",
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("code_sum"),
        F.round("q_scale", 9).alias("q_scale"),
        F.round(
            F.aggregate(err2, F.lit(0.0), lambda acc, v: acc + v)
            / F.size("embedding"),
            8,
        ).alias("mse"),
    )


@register(
    "q_semantic_decontaminate",
    sql="""
    WITH scored AS (
        SELECT t.vec_id, b.vec_id AS bench_id,
               round(list_cosine_similarity(t.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 4)
                   AS cos_sim,
               row_number() OVER (
                   PARTITION BY t.vec_id
                   ORDER BY round(list_cosine_similarity(
                       t.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
                       DESC, b.vec_id DESC) AS rn
        FROM embeddings t
        CROSS JOIN embeddings b
        WHERE t.vec_id % 10 <> 0 AND b.vec_id % 10 = 0)
    SELECT vec_id, bench_id, cos_sim,
           CAST(cos_sim >= 0.4 AS BIGINT) AS contaminated
    FROM scored WHERE rn = 1
    """,
    doc="Cross-table SEMANTIC decontamination: nearest benchmark "
    "vector per training vector by exact cosine (n-gram decontaminate "
    "catches verbatim leaks; this catches paraphrases). Runs the "
    "BLAS-matmul kernel (sanctioned Arrow UDF: higher-order lambdas "
    "are not codegen'd — measured 3× slower); the bench matrix is an "
    "explicit broadcast, train streams through one scan, no shuffle. "
    "Column-expression twin semantic_decontaminate is "
    "equivalence-tested against it. Fixture split is vec_id mod 10 "
    "(bench) vs rest (train).",
    tags=("llm", "similarity", "curation"),
)
def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_decontaminate_blas

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_decontaminate_blas(
        train=emb.filter(F.col("vec_id") % 10 != 0),
        bench=emb.filter(F.col("vec_id") % 10 == 0),
        threshold=0.4,
    )


@register(
    "q_semantic_decontaminate_ann",
    sql="""
    WITH best AS (
        SELECT t.vec_id,
               max(round(list_cosine_similarity(t.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4))
                   AS best_cos
        FROM embeddings t
        CROSS JOIN embeddings b
        WHERE t.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
        GROUP BY t.vec_id)
    SELECT CAST(count(*) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN best_cos >= 0.4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged_exact,
           CAST(1 AS BIGINT) AS subset_ok,
           CAST(1 AS BIGINT) AS recall_ok
    FROM best
    """,
    doc="LSH-bucketed semantic decontamination for bench sets too "
    "large to broadcast (candidates limited to shared hyperplane "
    "buckets, never all-pairs; train vectors with no same-bucket "
    "candidate keep a NULL match rather than vanishing), declared "
    "through its banded-flag audit (operators/ann_audit.py): the "
    "oracle recomputes the exact flagged count from the full "
    "cross-score (the anchor) and pins ann-flagged ⊆ exact-flagged "
    "(bucket candidates are a subset, so the bucketed max-cos can "
    "never exceed the exact one) plus recall ≥ 30% of the exact "
    "flags (measured 57% at sf0.01, 50% at sf0.001 with 2 planes). "
    "Per-row outputs stay pinned in tests/test_llm_ops2.py.",
    tags=("llm", "similarity", "curation", "approx"),
)
def q_semantic_decontaminate_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann_audit import decontaminate_recall_audit
    from ..operators.similarity import (
        semantic_decontaminate,
        semantic_decontaminate_ann,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 10 != 0)
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    exact = semantic_decontaminate(train, bench, threshold=0.4)
    ann = semantic_decontaminate_ann(train, bench, threshold=0.4, n_planes=2)
    return decontaminate_recall_audit(exact, ann, min_recall_bp=3000)
