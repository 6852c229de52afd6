"""LLM-corpus operators, round-5 second batch: DSIR importance
weighting + Gumbel resampling, scale-safe curriculum ranking/sharding,
and a WebDataset tar-shard roundtrip.

The reference selects data only with exact predicate filters
(article_querry.py:13-28) and persists a single driver-side CSV
(scrappy.py:350); these extend the training-data-pipeline surface.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators import dsir as DS
from ..operators.ranking import curriculum_shards
from ..sources.webdataset import read_webdataset, write_webdataset
from .registry import register

#: DuckDB mirror of operators/mining.py::tokens_col
_RAW_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

# DuckDB mirror of operators/dsir.py: same tokenizer, same md5 bucket
# hash, same add-one smoothing — shared constants so the histograms and
# log ratios are reproduced bit-for-bit (only the float sum order
# differs, absorbed by round()).
_DSIR_SQL = f"""
    toks AS (SELECT doc_id, lang, {_RAW_TOKS} AS toks FROM documents),
    feats AS (
      SELECT doc_id, lang, unnest(list_concat(
          toks,
          [array_to_string(toks[i : i + 1], ' ') FOR i IN generate_series(1, len(toks) - 1)]
      )) AS feature FROM toks),
    fb AS (SELECT doc_id, lang,
            (CAST(('0x' || substr(md5(feature), 1, 8)) AS BIGINT) % {DS.DSIR_BUCKETS}) AS bucket
           FROM feats),
    hist AS (SELECT bucket, count(*) AS r_cnt,
                    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt
             FROM fb GROUP BY 1),
    tot AS (SELECT sum(r_cnt) AS r_tot, sum(t_cnt) AS t_tot FROM hist),
    ratio AS (SELECT bucket,
                     ln((t_cnt + 1) / (t_tot + {DS.DSIR_BUCKETS}.0))
                   - ln((r_cnt + 1) / (r_tot + {DS.DSIR_BUCKETS}.0)) AS log_ratio
              FROM hist, tot),
    w AS (SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                 sum(log_ratio) AS weight
          FROM fb JOIN ratio USING (bucket) GROUP BY 1)
"""

_DSIR_TAU = 1.0


@register(
    "q_dsir_weights",
    sql=f"""
    WITH {_DSIR_SQL}
    SELECT doc_id, n_feats, round(weight, 4) AS weight_r FROM w
    """,
    doc="DSIR importance weights (Xie et al. 2023, arXiv 2302.03169): "
    "unigram+bigram occurrences hashed into 256 buckets; target model = "
    "lang='en' docs; per-doc weight = sum of add-one-smoothed "
    "log-likelihood ratios. Both histograms partial-agg to <=256 rows, "
    "the ratio vector joins back BROADCAST, so the only corpus-scale "
    "shuffle is the per-doc score aggregation.",
    tags=("llm", "curation", "dsir"),
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = DS.dsir_weights(docs, "text", "doc_id", F.col("lang") == "en")
    return w.select("doc_id", "n_feats", F.round("weight", 4).alias("weight_r"))


@register(
    "q_dsir_resample",
    sql=f"""
    WITH {_DSIR_SQL}
    SELECT doc_id,
           round(weight, 4) AS weight_r,
           round(weight
                 - ln(-ln((CAST(('0x' || substr(md5('{DS.DSIR_GUMBEL_SALT}'
                       || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                     / 4294967296.0)), 4) AS gumbel_key_r,
           CASE WHEN weight
                 - ln(-ln((CAST(('0x' || substr(md5('{DS.DSIR_GUMBEL_SALT}'
                       || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                     / 4294967296.0)) > {_DSIR_TAU} THEN 1 ELSE 0 END AS selected
    FROM w
    """,
    doc="DSIR resampling: weight + deterministic md5-derived standard "
    "Gumbel noise, thresholded at tau — scan-side selection with zero "
    "extra shuffles (Gumbel TOP-K via ordered limit is the variant for "
    "exact output counts). The 'random' draw is md5(salt||doc_id), so "
    "DuckDB reproduces the selection bit-for-bit.",
    tags=("llm", "curation", "dsir"),
)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = DS.dsir_weights(docs, "text", "doc_id", F.col("lang") == "en")
    sel = DS.dsir_select(w, "doc_id", tau=_DSIR_TAU)
    return sel.select(
        "doc_id",
        F.round("weight", 4).alias("weight_r"),
        F.round("gumbel_key", 4).alias("gumbel_key_r"),
        "selected",
    )


_SHARD_SIZE = 64


@register(
    "q_curriculum_shards",
    sql=f"""
    SELECT doc_id, n_chars,
           CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT) AS rank,
           CAST((row_number() OVER (ORDER BY n_chars, doc_id) - 1) // {_SHARD_SIZE}
                AS BIGINT) AS shard_id
    FROM documents
    """,
    doc="Curriculum layout: exact global rank by (difficulty, id) and "
    "fixed-size shard cut — computed WITHOUT the single-task "
    "un-partitioned window (repartitionByRange + per-partition "
    "row_number + broadcast prefix offsets; operators/ranking.py), so "
    "the same plan sorts 100 TB across the whole cluster. Oracle is "
    "the naive row_number spelling, proving the two-phase scan exact.",
    tags=("llm", "layout", "ranking"),
)
def q_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return curriculum_shards(docs, ["n_chars", "doc_id"], shard_size=_SHARD_SIZE)


@register(
    "q_webdataset_roundtrip",
    sql="""
    SELECT CAST(doc_id AS VARCHAR) AS key,
           text,
           '{"lang": "' || lang || '", "source": "' || source || '"}' AS meta
    FROM documents
    """,
    doc="WebDataset tar-shard sink/source roundtrip: documents are "
    "written as per-partition POSIX tar shards ({key}.txt + {key}.json "
    "members, stdlib tarfile, deterministic bytes) and read back via a "
    "binaryFile scan — one shard per task both ways, no driver-side "
    "file. The oracle rebuilds the expected (key, text, meta-json) "
    "rows directly from the table, proving the binary roundtrip "
    "lossless.",
    tags=("llm", "sink", "multimodal"),
)
def q_webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(),
        f"scrappy_wds_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    manifest = write_webdataset(
        docs.repartition(4, "doc_id"), out, "doc_id", "text", ["lang", "source"]
    )
    manifest.collect()  # bounded action: one row per shard (4 rows)
    return read_webdataset(spark, out)
