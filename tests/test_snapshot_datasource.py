"""scrappy_snapshot Python DataSource: manifest-pruned scans through
spark.read.format (VERDICT r12 #5 — the DSv2-style face), with filter
pushdown (Spark 4.1 pushFilters) riding the same _pruned_files
machinery as read(where=...)."""

from __future__ import annotations

import os

import pytest

from scrappy_spark.sources.snapshot_datasource import (
    SnapshotDataSource,
    SnapshotReader,
)
from scrappy_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def ds_spark(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
    return spark


def _evolved_table(spark, tmp_path) -> SnapshotTable:
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit_partitioned(
        spark.range(0, 250).selectExpr("id AS k", "concat('v', id) AS txt"),
        "k",
        "truncate",
        width=50,
    )  # 5 files
    t.commit_partitioned(
        spark.range(250, 500).selectExpr(
            "id AS k", "concat('v', id) AS txt"
        ),
        "k",
        "bucket",
        n=8,
        append=True,
    )  # +8, evolved spec
    t.rename_column("txt", "text")
    return t


def test_datasource_roundtrip_and_time_travel(ds_spark, tmp_path):
    t = _evolved_table(ds_spark, tmp_path)
    df = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
    )
    assert df.columns == ["k", "text"]  # current (renamed) names
    want = sorted((r.k, r.text) for r in t.read().collect())
    got = sorted((r.k, r.text) for r in df.collect())
    assert got == want and len(got) == 500
    # version pin shows the pre-rename name
    df0 = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .option("version", 0)
        .load()
    )
    assert df0.columns == ["k", "txt"] and df0.count() == 250


def test_datasource_filter_pushdown_prunes_files(ds_spark, tmp_path):
    t = _evolved_table(ds_spark, tmp_path)
    df = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
    )
    # results through the planned (pushed-down) path are exact
    assert [r.text for r in df.filter("k = 75").collect()] == ["v75"]
    assert [r.text for r in df.filter("k = 300").collect()] == ["v300"]
    assert df.filter("k in (75, 300)").count() == 2
    assert df.filter("k >= 450").count() == 50
    # the reader's plan: each file pruned by ITS OWN spec (evolution)
    import pyspark.sql.datasource as D

    r = SnapshotReader({"path": t.path}, df.schema)
    leftover = list(r.pushFilters([D.EqualTo(("k",), 75)]))
    assert len(r.planned_files()) == 2  # 1-of-5 truncate + 1-of-8 bucket
    assert len(leftover) == 1  # every filter returns to Spark
    r2 = SnapshotReader({"path": t.path}, df.schema)
    list(r2.pushFilters([D.EqualTo(("k",), 300)]))
    assert len(r2.planned_files()) == 1  # all truncate intervals disprove
    r3 = SnapshotReader({"path": t.path}, df.schema)
    list(r3.pushFilters([D.In(("k",), (75, 300))]))
    assert len(r3.planned_files()) <= 4
    # unprunable filters keep every file, results still exact
    r4 = SnapshotReader({"path": t.path}, df.schema)
    list(r4.pushFilters([D.StringContains(("text",), "v7")]))
    assert len(r4.planned_files()) == 13


def test_datasource_widening_and_stats_pruning(ds_spark, tmp_path):
    t = SnapshotTable(ds_spark, str(tmp_path / "w"))
    t.commit(
        ds_spark.range(0, 10).selectExpr("id AS k").coalesce(1),
        stats_cols=["k"],
    )
    t.commit(
        ds_spark.range(10, 20).selectExpr(
            "id AS k", "id * 2 AS extra"
        ).coalesce(1),
        append=True,
    )
    df = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
    )
    rows = {r.k: r.extra for r in df.collect()}
    assert rows[3] is None and rows[15] == 30  # typed NULL fill
    import pyspark.sql.datasource as D

    r = SnapshotReader({"path": t.path}, df.schema)
    list(r.pushFilters([D.LessThan(("k",), 5)]))
    assert len(r.planned_files()) == 1  # min/max stats prune the 2nd


def test_datasource_merge_on_read_deletes_and_empty(ds_spark, tmp_path):
    t = SnapshotTable(ds_spark, str(tmp_path / "d"))
    t.commit(
        ds_spark.range(0, 10).selectExpr("id AS k", "id AS v").coalesce(1),
        stats_cols=["k"],
    )
    t.delete_where(("k", "=", 3))
    # pending deletes apply merge-on-read inside the scan — no
    # apply_deletes rewrite needed, same result as read()
    df = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
    )
    assert sorted(r.k for r in df.collect()) == [
        k for k in range(10) if k != 3
    ]
    # the parent version still shows the row (time travel)
    df0 = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .option("version", 0)
        .load()
    )
    assert sorted(r.k for r in df0.collect()) == list(range(10))
    with pytest.raises(Exception, match="no commits"):
        (
            ds_spark.read.format("scrappy_snapshot")
            .option("path", str(tmp_path / "missing"))
            .load()
        )


def test_datasource_mor_matches_dataframe_path(ds_spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(ds_spark, str(tmp_path / "m"))
    df = ds_spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("txt"),
    )
    t.commit(df.repartitionByRange(4, "k"), stats_cols=["k"])
    # a predicate delete, a single-key delete and a MULTI-key delete
    t.delete_where(("k", "between", (20, 29)))
    t.delete_keys(
        ds_spark.range(100, 110).select(F.col("id").alias("k")), ["k"]
    )
    t.delete_keys(
        ds_spark.range(150, 160).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        ),
        ["k", "g"],
    )
    t.rename_column("k", "key")  # delete entries are id-based
    expect = sorted(r.key for r in t.read().collect())
    got_df = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
    )
    assert sorted(r.key for r in got_df.collect()) == expect
    # pushdown composes with merge-on-read: a pruned point read in a
    # deleted range returns nothing, outside it returns the row
    one = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
        .filter("key = 25")
    )
    assert one.collect() == []
    two = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
        .filter("key = 42")
    )
    assert [r.txt for r in two.collect()] == ["v42"]


def test_datasource_mor_null_keys_kept(ds_spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(ds_spark, str(tmp_path / "n"))
    df = ds_spark.range(0, 6).select(
        F.when(F.col("id") < 5, F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    t.commit(df.coalesce(1), stats_cols=["v"])
    t.delete_keys(ds_spark.range(0, 3).select(F.col("id").alias("k")), ["k"])
    t.delete_where(("k", ">=", 4))
    got = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
    )
    # NULL key never matches either delete form: the k=NULL row stays
    assert sorted(r.v for r in got.collect()) == [3, 5]
    assert sorted(
        r.v for r in t.read().collect()
    ) == [3, 5]  # DataFrame path agrees


def test_datasource_branch_option(ds_spark, tmp_path):
    t = SnapshotTable(ds_spark, str(tmp_path / "b"))
    t.commit(ds_spark.range(0, 5).selectExpr("id AS k"), stats_cols=["k"])
    dev = t.create_branch("dev")
    dev.commit(
        ds_spark.range(10, 15).selectExpr("id AS k"), append=True
    )
    main_rows = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
    )
    dev_rows = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .option("branch", "dev")
        .load()
    )
    assert sorted(r.k for r in main_rows.collect()) == list(range(5))
    assert sorted(r.k for r in dev_rows.collect()) == list(range(5)) + list(
        range(10, 15)
    )
    # DS write to a branch commits under the branch's gate
    (
        ds_spark.range(20, 22)
        .selectExpr("id AS k")
        .write.format("scrappy_snapshot")
        .mode("append")
        .option("path", t.path)
        .option("branch", "dev")
        .save()
    )
    assert dev.current_version() == 2
    assert t.current_version() == 0  # main untouched
    assert sorted(r.k for r in dev.read().collect()) == (
        list(range(5)) + list(range(10, 15)) + [20, 21]
    )


def test_pure_xxh64_matches_jvm_across_types(spark):
    """Contract for functions/xxh64.py: the pure-Python hash must
    equal Spark's xxhash64 EXACTLY for every verified type family —
    bucket probes ride it, so drift would prune point lookups to
    phantom buckets. Property-compared across integral widths,
    doubles (incl. -0.0), and unicode strings."""
    import random

    from pyspark.sql import functions as F

    from scrappy_spark.functions.xxh64 import spark_xxhash64

    random.seed(13)
    cases = {
        "bigint": [0, 1, -1, 2**63 - 1, -(2**63), 10**12]
        + [random.randint(-(2**63), 2**63 - 1) for _ in range(50)],
        "int": [0, -1, 2**31 - 1, -(2**31)]
        + [random.randint(-(2**31), 2**31 - 1) for _ in range(50)],
        "smallint": [0, 7, -8, 32767, -32768],
        "tinyint": [0, 1, -1, 127, -128],
        "double": [0.0, -0.0, 1.5, -2.25, 1e300, -1e-300]
        + [random.uniform(-1e9, 1e9) for _ in range(30)],
        "string": ["", "a", "héllo wörld", "x" * 31, "y" * 32,
                   "多语言文本", "\x00\x01", "z" * 100]
        + ["s%d" % random.randint(0, 10**9) for _ in range(30)],
    }
    for t, vals in cases.items():
        jvm = [
            r.h
            for r in spark.createDataFrame([(v,) for v in vals], f"v {t}")
            .select(F.xxhash64("v").alias("h"))
            .collect()
        ]
        pure = [spark_xxhash64(v, t) for v in vals]
        assert jvm == pure, f"xxh64 drift on {t}"
    # out-of-scope inputs refuse (caller falls back / prunes nothing)
    assert spark_xxhash64("not-a-number", "bigint") is None
    assert spark_xxhash64(True, "bigint") is None
    assert spark_xxhash64(5, "decimal(10,2)") is None
    assert spark_xxhash64(float("nan"), "double") is None


def test_bucket_pruning_without_spark_session(ds_spark, tmp_path):
    """The DataSource planning worker has NO SparkSession; bucket
    probes must still prune there through the pure-Python xxh64 (a
    JVM-job probe silently degrades to keep-everything). Simulated by
    a session-less SnapshotTable handle."""
    t = _evolved_table(ds_spark, tmp_path)
    orphan = SnapshotTable(None, t.path)  # what the worker constructs
    m = orphan._manifest(2)
    kept, _ = orphan._pruned_files(m, ("k", "=", 300))
    assert len(kept) == 1  # truncate intervals + BUCKET both pruned
    kept, _ = orphan._pruned_files(m, ("k", "=", 75))
    assert len(kept) == 2


def test_datasource_where_option_and_branch_dedup_workarounds(
    ds_spark, tmp_path
):
    """The Spark 4.1 branch-dedup sharp edge (module docstring): one
    load() feeding two differently-filtered branches can execute one
    branch's partitions for both. Both documented workarounds must
    hold: (1) one load() per branch; (2) the `where` option pins
    pruning at load time (distinct options = distinct relations)."""
    import json as _json

    t = _evolved_table(ds_spark, tmp_path)

    def load(where=None):
        r = ds_spark.read.format("scrappy_snapshot").option("path", t.path)
        if where is not None:
            r = r.option("where", _json.dumps(where))
        return r.load()

    # (1) one load() per branch
    u = (
        load().filter("k = 75").unionByName(load().filter("k = 300"))
    )
    assert sorted(r.k for r in u.collect()) == [75, 300]
    # (2) `where`-option loads: file list pinned per relation; the
    # filter still applies post-scan
    a = load([["k", "=", 75]]).filter("k = 75")
    b = load([["k", "=", 300]]).filter("k = 300")
    assert sorted(r.k for r in a.unionByName(b).collect()) == [75, 300]
    # where-option pruning is observable: an unfiltered read of the
    # pruned relation only sees the surviving files' rows
    pruned = load([["k", "between", [50, 99]]])
    ks = sorted(r.k for r in pruned.collect())
    assert set(range(50, 100)) <= set(ks)  # target rows all present
    assert len(ks) < 500  # and provably fewer files were read
    # composes with pushFilters on top of the floor
    assert [r.k for r in pruned.filter("k = 75").collect()] == [75]


def test_datasource_write_append_and_replace(ds_spark, tmp_path):
    """The write half of the DSv2 face: df.write.format(
    "scrappy_snapshot").mode("append"/"overwrite") stages Arrow
    batches as parquet under one writer-unique dir and commits through
    the same manifest assembly as SnapshotTable.commit — schema
    unification, footer stats via stats_cols, linear version
    history."""
    path = str(tmp_path / "w")
    (
        ds_spark.range(0, 100)
        .selectExpr("id AS k", "concat('v', id) AS txt")
        .write.format("scrappy_snapshot")
        .mode("append")
        .option("path", path)
        .option("stats_cols", "k")
        .save()
    )
    t = SnapshotTable(ds_spark, path)
    assert t.current_version() == 0
    assert sorted(r.k for r in t.read().collect()) == list(range(100))
    # append a second batch with a WIDENING column
    (
        ds_spark.range(100, 150)
        .selectExpr("id AS k", "concat('v', id) AS txt", "id * 2 AS extra")
        .write.format("scrappy_snapshot")
        .mode("append")
        .option("path", path)
        .save()
    )
    assert t.current_version() == 1
    rows = {r.k: r.extra for r in t.read().collect()}
    assert len(rows) == 150 and rows[5] is None and rows[120] == 240
    # stats recorded at write time prune reads
    assert t.prune_report(("k", "<", 10))["n_pruned"] >= 1
    # round-trips through the READ half too
    df = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", path)
        .load()
    )
    assert df.count() == 150
    # overwrite replaces content, history stays time-travelable
    (
        ds_spark.range(0, 7)
        .selectExpr("id AS k", "concat('n', id) AS txt")
        .write.format("scrappy_snapshot")
        .mode("overwrite")
        .option("path", path)
        .save()
    )
    assert t.current_version() == 2
    assert t.read().count() == 7
    assert t.read(1).count() == 150  # time travel across the replace


def test_datasource_write_concurrent_append_rebases(ds_spark, tmp_path):
    """A DataSource append hitting a concurrent commit must rebase
    like any append (the writer commits through _commit_new_files,
    which carries the optimistic-concurrency retry)."""
    path = str(tmp_path / "c")
    t = SnapshotTable(ds_spark, path)
    t.commit(
        ds_spark.range(0, 5).selectExpr("id AS k", "id AS v").coalesce(1)
    )
    # interleave: a concurrent writer lands v1 while the DS write is
    # staged (the DS commit sees it and rebases to v2)
    t.commit(
        ds_spark.range(5, 10).selectExpr("id AS k", "id AS v").coalesce(1),
        append=True,
    )
    (
        ds_spark.range(10, 15)
        .selectExpr("id AS k", "id AS v")
        .write.format("scrappy_snapshot")
        .mode("append")
        .option("path", path)
        .save()
    )
    assert t.current_version() == 2
    assert sorted(r.k for r in t.read().collect()) == list(range(15))


def test_datasource_bloom_pruning_without_session(ds_spark, tmp_path):
    """Bloom pruning composes with the DataSource planning worker:
    the probe is pure-Python xxh64 bit tests, so a session-less
    handle still drops bloom-excluded files."""
    t = SnapshotTable(ds_spark, str(tmp_path / "b"))
    even = ds_spark.range(0, 400, 2).selectExpr(
        "id AS k", "concat('v', id) AS v"
    ).coalesce(1)
    odd = ds_spark.range(1, 400, 2).selectExpr(
        "id AS k", "concat('v', id) AS v"
    ).coalesce(1)
    t.commit(even, bloom_cols=["k"])
    t.commit(odd, append=True)
    orphan = SnapshotTable(None, t.path)
    m = orphan._manifest(1)
    kept, _ = orphan._pruned_files(m, ("k", "=", 76))
    assert len(kept) == 1
    # and through the actual planned read
    df = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
    )
    assert [r.v for r in df.filter("k = 76").collect()] == ["v76"]


def test_datasource_tag_option_and_sql_tag(ds_spark, tmp_path):
    from scrappy_spark.sqlapi import register_snapshot

    t = SnapshotTable(ds_spark, str(tmp_path / "g"))
    t.commit(ds_spark.range(0, 5).selectExpr("id AS k"))
    dev = t.create_branch("dev")
    dev.commit(ds_spark.range(10, 13).selectExpr("id AS k"), append=True)
    dev.tag("release")  # pins dev@1
    t.commit(ds_spark.range(50, 55).selectExpr("id AS k"))  # main moves on
    got = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .option("tag", "release")
        .load()
    )
    assert sorted(r.k for r in got.collect()) == list(range(5)) + list(
        range(10, 13)
    )
    with pytest.raises(Exception, match="no tag"):
        (
            ds_spark.read.format("scrappy_snapshot")
            .option("path", t.path)
            .option("tag", "ghost")
            .load()
            .count()
        )
    register_snapshot(ds_spark, t.path, "tagged", tag="release")
    assert ds_spark.sql("SELECT count(*) c FROM tagged").collect()[0].c == 8
    with pytest.raises(ValueError, match="not both"):
        register_snapshot(ds_spark, t.path, "x", tag="release", version=0)


def test_datasource_mor_null_in_delete_key_list(ds_spark, tmp_path):
    """A NULL inside the delete-key LIST must not delete NULL-keyed
    rows: anti-join semantics (and the DataFrame path) treat a NULL
    key as matching nothing; pc.is_in would match null-vs-null."""
    from pyspark.sql import functions as F

    t = SnapshotTable(ds_spark, str(tmp_path / "nk"))
    df = ds_spark.range(0, 5).select(
        F.when(F.col("id") < 4, F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    t.commit(df.coalesce(1))
    keys = ds_spark.createDataFrame([(1,), (None,)], "k long")
    t.delete_keys(keys, ["k"])
    expect = sorted(r.v for r in t.read().collect())
    got = (
        ds_spark.read.format("scrappy_snapshot")
        .option("path", t.path)
        .load()
    )
    assert sorted(r.v for r in got.collect()) == expect == [0, 2, 3, 4]


def test_datasource_writer_unknown_branch_fails(ds_spark, tmp_path):
    t = SnapshotTable(ds_spark, str(tmp_path / "wb"))
    t.commit(ds_spark.range(3).selectExpr("id AS k"))
    with pytest.raises(Exception, match="no branch 'dev-typo'"):
        (
            ds_spark.range(5)
            .selectExpr("id AS k")
            .write.format("scrappy_snapshot")
            .mode("append")
            .option("path", t.path)
            .option("branch", "dev-typo")
            .save()
        )
    assert t.branches() == ["main"]  # nothing silently created


def test_datasource_tag_version_mutual_exclusion(ds_spark, tmp_path):
    t = SnapshotTable(ds_spark, str(tmp_path / "mx"))
    t.commit(ds_spark.range(3).selectExpr("id AS k"))
    t.tag("p")
    with pytest.raises(Exception, match="not both"):
        (
            ds_spark.read.format("scrappy_snapshot")
            .option("path", t.path)
            .option("tag", "p")
            .option("version", 0)
            .load()
        )


def test_datasource_write_partitioned(ds_spark, tmp_path):
    """.option('partition_by', ...) on the DS writer: tasks stage the
    same Hive-style layout commit_partitioned_multi does, the
    session-free commit records spec + per-file values, and reads
    prune identically to the DataFrame write path."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "pw")
    df = ds_spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("L"), (F.col("id") % 2)).alias("lang"),
    )
    (
        df.coalesce(1)
        .write.format("scrappy_snapshot")
        .mode("overwrite")
        .option("path", path)
        .option("partition_by", "lang,k:bucket:4")
        .save()
    )
    t = SnapshotTable(ds_spark, path)
    m = t._manifest(0)
    assert len(m["partition_spec"]["fields"]) == 2
    assert len(m["files"]) == 8  # 2 langs x 4 buckets, one task
    assert sorted((r.k, r.lang) for r in t.read().collect()) == [
        (i, f"L{i % 2}") for i in range(200)
    ]
    # both-conjunct point read prunes to exactly one file combination
    rep = t.prune_report([("lang", "=", "L1"), ("k", "=", 7)])
    assert rep["n_read"] == 1
    assert [r.k for r in t.read(
        where=[("lang", "=", "L1"), ("k", "=", 7)]
    ).collect()] == [7]
    # bucket parity with the JVM write path: the same data committed
    # via commit_partitioned_multi puts every key in the same bucket
    t2 = SnapshotTable(ds_spark, str(tmp_path / "jvm"))
    t2.commit_partitioned_multi(
        df, [("lang", "identity", None), ("k", "bucket", 4)]
    )
    def dirs(table):
        return sorted(
            {os.path.basename(os.path.dirname(os.path.dirname(p)))
             + "/" + os.path.basename(os.path.dirname(p))
             for p in table._manifest(table.current_version())["files"]}
        )
    assert dirs(t) == dirs(t2)
    # truncate + NULL identity components
    path3 = str(tmp_path / "pn")
    df3 = ds_spark.range(0, 40).select(
        F.when(F.col("id") < 30, F.concat(F.lit("g"), F.col("id") % 2))
        .alias("g"),
        F.col("id").alias("k"),
    )
    (
        df3.coalesce(2)
        .write.format("scrappy_snapshot")
        .mode("overwrite")
        .option("path", path3)
        .option("partition_by", "g")
        .save()
    )
    t3 = SnapshotTable(ds_spark, path3)
    assert t3.read().count() == 40
    got = t3.read(where=("g", "=", "g1")).collect()
    assert sorted(r.k for r in got) == [i for i in range(30) if i % 2 == 1]
    # appends evolve: a DS append under a new spec registers it
    (
        ds_spark.range(200, 240)
        .select(F.col("id").alias("k"), F.lit("L9").alias("lang"))
        .coalesce(1)
        .write.format("scrappy_snapshot")
        .mode("append")
        .option("path", path)
        .option("partition_by", "k:truncate:100")
        .save()
    )
    m1 = t._manifest(1)
    assert len(m1.get("partition_specs", {})) == 2
    assert t.read().count() == 240
    # validation: bad grammar and unsupported type fail loudly
    with pytest.raises(Exception, match="bad partition_by"):
        (
            df.write.format("scrappy_snapshot")
            .mode("overwrite")
            .option("path", str(tmp_path / "bad"))
            .option("partition_by", "k:bogus:3")
            .save()
        )
