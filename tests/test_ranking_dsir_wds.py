"""Unit tests: distributed global rank / curriculum shards, DSIR
importance weights + Gumbel selection, WebDataset tar roundtrip."""

from __future__ import annotations

import json
import math
import tarfile

import pytest
from pyspark.sql import Window, functions as F

from scrappy_spark.operators import dsir as DS
from scrappy_spark.operators.ranking import curriculum_shards, global_rank
from scrappy_spark.sources.webdataset import read_webdataset, write_webdataset

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ranking
# ---------------------------------------------------------------------------


def test_global_rank_matches_naive_window(spark):
    df = (
        spark.range(0, 500)
        .withColumn("score", (F.col("id") * 37) % 101)
        .repartition(8)
    )
    got = global_rank(df, ["score", "id"]).toPandas().sort_values("id")
    naive = (
        df.withColumn(
            "rank", F.row_number().over(Window.orderBy("score", "id")) - 1
        )
        .toPandas()
        .sort_values("id")
    )
    assert got["rank"].tolist() == naive["rank"].tolist()


def test_global_rank_is_a_permutation(spark):
    df = spark.range(0, 300).withColumn("score", F.lit(5) - (F.col("id") % 3))
    ranks = sorted(r["rank"] for r in global_rank(df, ["score", "id"]).collect())
    assert ranks == list(range(300))


def test_curriculum_shards_full_except_last(spark):
    df = spark.range(0, 130).withColumn("score", (F.col("id") * 7) % 50)
    out = curriculum_shards(df, ["score", "id"], shard_size=32)
    sizes = {
        r["shard_id"]: r["n"]
        for r in out.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {0: 32, 1: 32, 2: 32, 3: 32, 4: 2}
    # shard 0 holds the 32 globally smallest (score, id) keys
    low = out.filter(F.col("shard_id") == 0).select("score", "id").collect()
    cutoff = sorted((r["score"], r["id"]) for r in df.select("score", "id").collect())[
        :32
    ]
    assert sorted((r["score"], r["id"]) for r in low) == cutoff


def test_curriculum_shards_rejects_bad_size(spark):
    df = spark.range(0, 10)
    with pytest.raises(ValueError):
        curriculum_shards(df, ["id"], shard_size=0)


def test_global_rank_plan_has_no_unpartitioned_window(spark):
    """The point of the operator: the physical plan must range-partition
    before the local sort, never funnel all rows through one task's
    global window."""
    df = spark.range(0, 100).withColumn("score", F.col("id") % 7)
    plan = global_rank(df, ["score", "id"])._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_dsir_weights_manual_small_corpus(spark):
    rows = [
        (0, "alpha beta alpha", True),
        (1, "alpha beta", True),
        (2, "gamma delta gamma delta", False),
        (3, "gamma delta", False),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    out = {
        r["doc_id"]: r
        for r in DS.dsir_weights(df, "text", "doc_id", F.col("is_t")).collect()
    }
    # unigrams + bigrams per doc: 2n-1 occurrences for n tokens
    assert out[0]["n_feats"] == 5
    assert out[3]["n_feats"] == 3
    # replicate the math in pure python
    feats = {}
    for doc_id, text, is_t in rows:
        toks = text.split()
        fs = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        feats[doc_id] = (fs, is_t)
    from hashlib import md5

    def bucket(s):
        return int(md5(s.encode()).hexdigest()[:8], 16) % DS.DSIR_BUCKETS

    r_cnt, t_cnt = {}, {}
    for fs, is_t in feats.values():
        for f_ in fs:
            b = bucket(f_)
            r_cnt[b] = r_cnt.get(b, 0) + 1
            if is_t:
                t_cnt[b] = t_cnt.get(b, 0) + 1
    r_tot = sum(r_cnt.values())
    t_tot = sum(t_cnt.values())
    B = DS.DSIR_BUCKETS
    for doc_id, (fs, _) in feats.items():
        want = sum(
            math.log((t_cnt.get(bucket(f_), 0) + 1) / (t_tot + B))
            - math.log((r_cnt[bucket(f_)] + 1) / (r_tot + B))
            for f_ in fs
        )
        assert out[doc_id]["weight"] == pytest.approx(want, abs=1e-9)
    # target-domain docs score higher than off-domain ones
    assert min(out[0]["weight"], out[1]["weight"]) > max(
        out[2]["weight"], out[3]["weight"]
    )


def test_dsir_gumbel_deterministic_and_shaped(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = df.select("doc_id", DS.gumbel_noise(F.col("doc_id")).alias("g")).collect()
    b = df.select("doc_id", DS.gumbel_noise(F.col("doc_id")).alias("g")).collect()
    assert {r["doc_id"]: r["g"] for r in a} == {r["doc_id"]: r["g"] for r in b}
    gs = [r["g"] for r in a]
    # standard Gumbel: mean ~ Euler-Mascheroni 0.5772, all finite
    assert all(math.isfinite(g) for g in gs)
    assert sum(gs) / len(gs) == pytest.approx(0.5772, abs=0.15)


def test_dsir_select_threshold_semantics(spark):
    df = spark.createDataFrame(
        [(0, 10.0), (1, -10.0)], ["doc_id", "weight"]
    )
    out = {r["doc_id"]: r for r in DS.dsir_select(df, "doc_id", tau=0.0).collect()}
    assert out[0]["selected"] == 1  # +10 dominates any Gumbel draw (> -1.8 min here)
    assert out[1]["selected"] == 0
    assert out[0]["gumbel_key"] == pytest.approx(
        10.0 + (out[0]["gumbel_key"] - 10.0)
    )


# ---------------------------------------------------------------------------
# WebDataset tar shards
# ---------------------------------------------------------------------------


def test_webdataset_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        docs.repartition(3, "doc_id"), out, "doc_id", "text", ["lang", "source"]
    ).collect()
    n_docs = docs.count()
    assert sum(r["n_samples"] for r in manifest) == n_docs
    assert len(manifest) <= 3 and all(r["n_bytes"] > 0 for r in manifest)

    back = read_webdataset(spark, out).toPandas()
    assert len(back) == n_docs
    want = {
        str(r["doc_id"]): (r["text"], r["lang"], r["source"])
        for r in docs.collect()
    }
    for row in back.itertuples(index=False):
        text, lang, source = want[row.key]
        assert row.text == text
        meta = json.loads(row.meta)
        assert meta == {"lang": lang, "source": source}


def test_webdataset_tar_bytes_are_loader_compatible(spark, tmp_path):
    """A plain stdlib tarfile consumer (what webdataset wraps) must see
    {key}.txt/{key}.json member pairs in key order."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    out = str(tmp_path / "wds1")
    write_webdataset(docs.coalesce(1), out, "doc_id", "text", ["lang"]).collect()
    import glob

    [path] = glob.glob(f"{out}/*.tar")
    with tarfile.open(path) as tar:
        names = tar.getnames()
    stems = [n.rsplit(".", 1)[0] for n in names]
    assert stems == sorted(stems, key=str)  # key-ordered
    assert {n.rsplit(".", 1)[1] for n in names} == {"txt", "json"}
    assert len(names) == 20
