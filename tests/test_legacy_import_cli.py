"""Legacy CSV store import (the reference-user migration path) and the
offline CLI flows exercised through cli.main(argv)."""

import datetime
import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scrappy_spark import cli
from scrappy_spark.schema import ARTICLES_SCHEMA
from scrappy_spark.sources.store import ArticleStore, import_legacy_csv


def test_import_legacy_csv(spark, tmp_path):
    # a CSV exactly as the reference writes it: stringified lists,
    # flattened institutions, empty-string year
    legacy = pd.DataFrame(
        [
            {
                "source": "IEEE",
                "title": "Legacy Paper",
                "abstract": "old abstract",
                "url": "http://x",
                "authors": "['Ada Lovelace', 'Alan Turing']",
                "institutions": "MIT; Oxford",
                "keywords": "['security', 'grids']",
                "term": "grid",
                "year": 2019,
                "date_added": "2023-05-01",
            },
            {
                "source": "PubMed",
                "title": "No Year Paper",
                "abstract": None,
                "url": "",
                "authors": "[]",
                "institutions": "",
                "keywords": "",
                "term": "amr",
                "year": "",
                "date_added": "2023-05-02",
            },
        ]
    )
    path = str(tmp_path / "raw_articles.csv")
    legacy.to_csv(path, index=False)

    out = import_legacy_csv(spark, path)
    assert [f.name for f in out.schema.fields] == [f.name for f in ARTICLES_SCHEMA.fields]
    rows = {r.title: r for r in out.collect()}
    a = rows["Legacy Paper"]
    assert a.authors == ["Ada Lovelace", "Alan Turing"]
    assert a.institutions == [["MIT", "Oxford"]]
    assert a.keywords == ["security", "grids"]
    assert a.year == 2019 and str(a.date_added) == "2023-05-01"
    b = rows["No Year Paper"]
    assert b.year is None and b.authors == [] and b.institutions == []

    # imported frame merges straight into the engine store
    store = ArticleStore(spark, str(tmp_path / "store"))
    assert store.merge(out).count() == 2


@pytest.fixture()
def seeded_store(spark, tmp_path):
    rows = [
        ("IEEE", f"CLI Paper {i}", "edge computing on hospital networks " * 2,
         f"http://c/{i}", ["A"], [["MIT"]], ["edge"], "edge", 2020 + i % 2,
         datetime.date(2024, 1, 1))
        for i in range(6)
    ]
    store_dir = str(tmp_path / "cli_store")
    ArticleStore(spark, store_dir).merge(spark.createDataFrame(rows, ARTICLES_SCHEMA))
    return store_dir


def test_cli_query_articles(seeded_store, capsys):
    rc = cli.main(
        ["--store", seeded_store, "--query-articles", "--term", "hospital",
         "--year", "2021", "--limit", "3"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "CLI Paper 1" in out and "CLI Paper 0" not in out


def test_cli_suggest_terms_writes_file(seeded_store, tmp_path, capsys):
    terms_file = str(tmp_path / "terms.json")
    with open(terms_file, "w") as f:
        json.dump(["edge computing"], f)
    rc = cli.main(
        ["--store", seeded_store, "--terms-file", terms_file,
         "--suggest-terms", "--limit", "2", "--yes"]
    )
    assert rc == 0
    saved = json.load(open(terms_file))
    assert "edge computing" in saved and len(saved) > 1


def test_cli_build_taxonomy(seeded_store, tmp_path, capsys):
    out_path = str(tmp_path / "tax.parquet")
    rc = cli.main(
        ["--store", seeded_store, "--build-taxonomy", "--topics", "2",
         "--output", out_path]
    )
    assert rc == 0
    assert os.path.exists(out_path)
    # the word-weights artifact (reference wordcloud.png's data) lands
    # next to the taxonomy output as word,weight CSV
    weights_dir = str(tmp_path / "tax_word_weights.csv")
    assert os.path.exists(weights_dir)
    part = [f for f in os.listdir(weights_dir) if f.startswith("part-")]
    with open(os.path.join(weights_dir, part[0])) as f:
        lines = [l.strip() for l in f if l.strip()]
    assert lines[0] == "word,weight"
    words = {l.split(",")[0] for l in lines[1:]}
    assert "hospital" in words or "edge" in words
    assert "the" not in words  # stopwords excluded
    # K3 image sink: a real, decodable PNG rendered without any
    # imaging library (reference wordcloud.png, scrappy.py:519-526)
    from scrappy_spark.operators.codecs import decode_image_bytes

    png_path = str(tmp_path / "tax_wordcloud.png")
    assert os.path.exists(png_path)
    img = decode_image_bytes(open(png_path, "rb").read())
    assert img.shape == (400, 800, 3)
    assert (img != 255).any()  # words actually drawn


PAYLOADS_DIR = os.path.join(os.path.dirname(__file__), "payloads")


def test_cli_fetch_articles_offline_payload_dir(spark, tmp_path, capsys):
    terms_file = str(tmp_path / "terms.json")
    with open(terms_file, "w") as f:
        json.dump(["grid"], f)
    store_dir = str(tmp_path / "fetched_store")
    rc = cli.main(
        ["--store", store_dir, "--terms-file", terms_file,
         "--fetch-articles", "--payload-dir", PAYLOADS_DIR]
    )
    assert rc == 0
    assert "newly added" in capsys.readouterr().out
    merged = ArticleStore(spark, store_dir).read()
    assert merged.count() > 0
    assert merged.select("source").distinct().count() >= 4  # all recorded sources landed


def test_cli_build_tree_offline_with_tree_api(spark, tmp_path, capsys, monkeypatch):
    """--build-tree maps --tree-api (reference scrappy.py:612) onto
    build_topic_tree(sources=[...]) — asserted at the driver boundary
    (the fetcher itself runs inside executor workers, unobservable from
    the test process) — and the offline --payload-dir run produces a
    real nested tree with children."""
    terms_file = str(tmp_path / "terms.json")
    with open(terms_file, "w") as f:
        json.dump(["smart grid"], f)
    tree_out = str(tmp_path / "tree.json")

    captured = {}
    real_build = cli.build_topic_tree

    def capturing_build(spark_, seeds, fetcher, **kw):
        captured.update(kw)
        return real_build(spark_, seeds, fetcher, **kw)

    monkeypatch.setattr(cli, "build_topic_tree", capturing_build)
    rc = cli.main(
        ["--store", str(tmp_path / "s"), "--terms-file", terms_file,
         "--build-tree", "--tree-api", "arxiv", "--depth", "1",
         "--payload-dir", PAYLOADS_DIR, "--tree-output", tree_out]
    )
    assert rc == 0
    assert captured["sources"] == ["arXiv"]
    tree = json.load(open(tree_out))
    assert "smart grid" in tree and tree["smart grid"]  # has mined children


def test_cli_no_flags_prints_help(capsys):
    assert cli.main([]) == 1
    assert "usage" in capsys.readouterr().out.lower()


def test_cli_fetch_without_terms_errors(tmp_path, capsys):
    rc = cli.main(
        ["--store", str(tmp_path / "s"), "--terms-file",
         str(tmp_path / "none.json"), "--fetch-articles"]
    )
    assert rc == 2
    assert "no terms" in capsys.readouterr().err

def test_cli_compact_store(spark, seeded_store, capsys):
    # fragment with append files, then compact through the CLI
    extra = spark.createDataFrame(
        [("IEEE", f"Frag {i}", None, None, ["A"], [["X"]], [], "t", 2020,
          datetime.date(2024, 1, 2)) for i in range(4)],
        ARTICLES_SCHEMA,
    )
    for i in range(4):
        extra.filter(F.col("title") == f"Frag {i}").coalesce(1).write.mode(
            "append"
        ).partitionBy("source").parquet(seeded_store)
    before = ArticleStore(spark, seeded_store).read().count()
    rc = cli.main(["--store", seeded_store, "--compact-store"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "source=IEEE" in out and "compacted 1 partition(s)" in out
    assert ArticleStore(spark, seeded_store).read().count() == before


def test_cli_sql_over_store_and_fixtures(seeded_store, capsys):
    rc = cli.main(
        ["--store", seeded_store, "--sql",
         "SELECT source, count(*) AS n FROM articles GROUP BY source"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "IEEE" in out and "6" in out

    rc = cli.main(
        ["--store", seeded_store, "--sf-dir", "/root/testdata/sf0.001", "--sql",
         "SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey "
         "WHERE r_name = 'ASIA' ORDER BY n_name LIMIT 2", "--limit", "5"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "NATION_" in out


def test_cli_full_workflow_end_to_end(spark, tmp_path, capsys):
    """The reference user's complete session, offline, on ONE store:
    fetch → query → suggest-terms → taxonomy → compact → SQL. Each
    stage consumes the previous stage's persisted state."""
    terms_file = str(tmp_path / "terms.json")
    with open(terms_file, "w") as f:
        json.dump(["grid"], f)
    store = str(tmp_path / "flow_store")

    # 1. ingest from recorded payloads
    assert cli.main(
        ["--store", store, "--terms-file", terms_file,
         "--fetch-articles", "--payload-dir", PAYLOADS_DIR]
    ) == 0
    n0 = ArticleStore(spark, store).read().count()
    assert n0 > 0

    # 2. re-fetch is idempotent (keep-first merge: 0 newly added)
    assert cli.main(
        ["--store", store, "--terms-file", terms_file,
         "--fetch-articles", "--payload-dir", PAYLOADS_DIR]
    ) == 0
    assert "newly added: 0" in capsys.readouterr().out
    assert ArticleStore(spark, store).read().count() == n0

    # 3. query the fetched store
    assert cli.main(["--store", store, "--query-articles", "--limit", "5"]) == 0
    assert "title" in capsys.readouterr().out

    # 4. suggest terms non-interactively; terms file grows
    assert cli.main(
        ["--store", store, "--terms-file", terms_file, "--suggest-terms", "--yes"]
    ) == 0
    capsys.readouterr()
    assert len(json.load(open(terms_file))) > 1

    # 5. taxonomy over the store
    tax_out = str(tmp_path / "tax.parquet")
    assert cli.main(
        ["--store", store, "--build-taxonomy", "--topics", "2", "--output", tax_out]
    ) == 0
    capsys.readouterr()
    tax = spark.read.parquet(tax_out)
    assert tax.count() == n0 and "Topic" in tax.columns

    # 6. compact + SQL over the same store
    assert cli.main(["--store", store, "--compact-store"]) == 0
    capsys.readouterr()
    assert cli.main(
        ["--store", store, "--sql",
         "SELECT count(*) AS n FROM articles"]
    ) == 0
    assert str(n0) in capsys.readouterr().out


def test_cli_run_pipeline_writes_parquet(spark, tmp_path, capsys):
    spec = '[{"op": "hash_sample", "rate": 0.2}, {"op": "assign_splits"}]'
    out = str(tmp_path / "pipe_out")
    rc = cli.main([
        "--store", str(tmp_path / "store"),
        "--run-pipeline", spec,
        "--pipeline-input", "/root/testdata/sf0.001/documents.parquet",
        "--pipeline-output", out,
    ])
    assert rc == 0
    result = spark.read.parquet(out)
    assert "split" in result.columns and 0 < result.count() < 500


def test_cli_run_pipeline_requires_input(tmp_path, capsys):
    rc = cli.main([
        "--store", str(tmp_path / "store"),
        "--run-pipeline", '[{"op": "hash_sample", "rate": 0.2}]',
    ])
    assert rc == 2
    assert "--pipeline-input" in capsys.readouterr().err


def test_cli_run_pipeline_bad_spec_raises_named_error(tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown op"):
        cli.main([
            "--store", str(tmp_path / "store"),
            "--run-pipeline", '[{"op": "frobnicate"}]',
            "--pipeline-input", "/root/testdata/sf0.001/documents.parquet",
        ])


def test_cli_table_admin_roundtrip(spark, tmp_path, capsys):
    """--table-delete-where / --table-delete-keys / --table-apply-deletes
    / --table-history drive the snapshot takedown lifecycle end-to-end."""
    from scrappy_spark.sources.snapshots import SnapshotTable

    tpath = str(tmp_path / "t")
    t = SnapshotTable(spark, tpath)
    t.commit(
        spark.range(0, 10).selectExpr("id AS k", "concat('v', id) AS v").coalesce(1),
        stats_cols=["k"],
    )
    keys = str(tmp_path / "keys")
    spark.range(7, 9).selectExpr("id AS k").write.parquet(keys)

    assert cli.main(
        ["--store", str(tmp_path / "s"), "--table", tpath,
         "--table-delete-where", "k", "<", "3"]
    ) == 0
    assert cli.main(
        ["--store", str(tmp_path / "s"), "--table", tpath,
         "--table-delete-keys", keys, "--key-col", "k"]
    ) == 0
    assert cli.main(
        ["--store", str(tmp_path / "s"), "--table", tpath,
         "--table-apply-deletes", "--table-history"]
    ) == 0
    out = capsys.readouterr().out
    assert "deletes materialized" in out and "pending delete(s)" in out
    assert sorted(r.k for r in t.read().collect()) == [3, 4, 5, 6, 9]
    assert "deletes" not in t._manifest(t.current_version())


def test_cli_table_admin_requires_table_path(tmp_path, capsys):
    rc = cli.main(["--store", str(tmp_path / "s"), "--table-history"])
    assert rc == 2
    assert "--table PATH" in capsys.readouterr().err


def test_cli_index_admin_gram(spark, tmp_path, capsys):
    """--index-delete/--index-vacuum/--index-history drive the gram
    index takedown end-to-end (VERDICT r11 #6) — text resolved from
    the --table corpus snapshot, absent ids refused loudly."""
    from scrappy_spark.operators.stored_indexes import GramIndex
    from scrappy_spark.sources.snapshots import SnapshotTable

    docs = spark.createDataFrame(
        [(i, f"CLI GRAM MARKER SEGMENT {'x' * 30} tail {i}") for i in range(6)],
        "doc_id long, text string",
    )
    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.commit(docs.coalesce(1))
    gpath = str(tmp_path / "gidx")
    idx = GramIndex.build(spark, gpath, docs, min_len=30)

    assert cli.main(
        ["--store", str(tmp_path / "s"), "--index", gpath,
         "--table", str(tmp_path / "corpus"),
         "--index-delete", "2,4", "--index-vacuum", "--index-history"]
    ) == 0
    out = capsys.readouterr().out
    assert "gram index: takedown of 2 id(s)" in out
    assert "gram index: vacuumed" in out and "ledger v" in out
    assert {r[0] for r in idx.members().collect()} == {0, 1, 3, 5}

    # absent id: loud refusal, nothing committed
    v = idx.ledger.current_version()
    rc = cli.main(
        ["--store", str(tmp_path / "s"), "--index", gpath,
         "--table", str(tmp_path / "corpus"), "--index-delete", "99"]
    )
    assert rc == 2 and "unrecoverable" in capsys.readouterr().err
    assert idx.ledger.current_version() == v
    # gram delete without --table: refused with guidance
    rc = cli.main(
        ["--store", str(tmp_path / "s"), "--index", gpath,
         "--index-delete", "1"]
    )
    assert rc == 2 and "--table" in capsys.readouterr().err


def test_cli_index_admin_minhash_and_ivfpq(spark, tmp_path, capsys):
    from scrappy_spark.operators.stored_indexes import MinHashIndex
    from scrappy_spark.operators.ann_index import IvfPqIndex
    from scrappy_spark.io import load_table
    from scrappy_spark.operators import similarity as SIM

    docs = spark.createDataFrame(
        [(i, f"minhash cli doc {i} content words {i}") for i in range(8)],
        "doc_id long, text string",
    )
    mpath = str(tmp_path / "midx")
    mh = MinHashIndex.build(spark, mpath, docs)
    assert cli.main(
        ["--store", str(tmp_path / "s"), "--index", mpath,
         "--index-delete", "1,2,3", "--index-vacuum", "--index-history"]
    ) == 0
    out = capsys.readouterr().out
    assert "minhash index: takedown of 3 id(s)" in out and "sigs v" in out
    assert {r.doc_id for r in mh.signatures().collect()} == {0, 4, 5, 6, 7}

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = (
        e.transform(lambda d: SIM.label_centroids(d))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
                lambda s: s.centroid_val,
            ).alias("centroid")
        )
    )
    vpath = str(tmp_path / "vidx")
    vi = IvfPqIndex.build(spark, vpath, e, cents)
    assert cli.main(
        ["--store", str(tmp_path / "s"), "--index", vpath,
         "--index-delete", "0,1", "--index-vacuum", "--index-history"]
    ) == 0
    out = capsys.readouterr().out
    assert "ivfpq index: takedown of 2 id(s)" in out and "codes v" in out
    assert not {0, 1} & {r.vec_id for r in vi.codes().collect()}


def test_cli_index_admin_requires_index_path(tmp_path, capsys):
    rc = cli.main(["--store", str(tmp_path / "s"), "--index-history"])
    assert rc == 2
    assert "--index PATH" in capsys.readouterr().err
    rc = cli.main(
        ["--store", str(tmp_path / "s"), "--index", str(tmp_path / "nope"),
         "--index-history"]
    )
    assert rc == 2
    assert "no stored index" in capsys.readouterr().err


def test_cli_table_merge_keys(spark, tmp_path, capsys):
    """--table-merge-keys drives the single-commit upsert from the CLI
    (VERDICT r11 #4 parity with --table-delete-keys)."""
    from scrappy_spark.sources.snapshots import SnapshotTable

    tpath = str(tmp_path / "t")
    t = SnapshotTable(spark, tpath)
    t.commit(
        spark.range(0, 5).selectExpr("id AS k", "concat('v', id) AS v").coalesce(1)
    )
    batch = str(tmp_path / "batch")
    spark.createDataFrame(
        [(2, "upd"), (9, "ins")], "k long, v string"
    ).coalesce(1).write.parquet(batch)

    rc = cli.main(
        ["--store", str(tmp_path / "s"), "--table", tpath,
         "--table-merge-keys", batch, "--key-col", "k"]
    )
    assert rc == 0 and "merge upsert on k" in capsys.readouterr().out
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows == {0: "v0", 1: "v1", 2: "upd", 3: "v3", 4: "v4", 9: "ins"}
    assert t.current_version() == 1  # one commit

    rc = cli.main(
        ["--store", str(tmp_path / "s"), "--table", tpath,
         "--table-merge-keys", batch]
    )
    assert rc == 2 and "--key-col" in capsys.readouterr().err


def test_cli_table_expire_and_compact(spark, tmp_path, capsys):
    """--table-expire (with --grace-sec) and --table-compact complete
    the CLI lifecycle story (VERDICT r12 #6): GC + compaction were
    API-only. The compact rewrites small files into one bin as one
    atomic commit; the expire then drops superseded history, and the
    young-orphan grace is surfaced."""
    import os

    from scrappy_spark.sources.snapshots import SnapshotTable

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    for i in range(3):
        t.commit(
            spark.range(i * 10, i * 10 + 10).selectExpr(
                "id AS k", "concat('v', id) AS v"
            ).coalesce(1),
            append=i > 0,
        )
    # a young fake orphan: the default grace must protect it, an
    # explicit --grace-sec 0 must sweep it
    orphan = tmp_path / "t" / "data" / "snap-orphan" / "p.parquet"
    os.makedirs(orphan.parent)
    orphan.write_bytes(b"orphan")

    assert cli.main(
        ["--store", str(tmp_path / "s"), "--table", path,
         "--table-compact", "64", "--table-expire", "1"]
    ) == 0
    out = capsys.readouterr().out
    assert "compacted to 1 files" in out
    assert "expired versions [0, 1, 2]" in out
    assert "orphan grace 86400s" in out
    assert orphan.exists()  # young orphan survived the default grace
    assert sorted(r.k for r in t.read().collect()) == list(range(30))

    assert cli.main(
        ["--store", str(tmp_path / "s"), "--table", path,
         "--table-expire", "1", "--grace-sec", "0"]
    ) == 0
    assert "grace 0s" in capsys.readouterr().out
    assert not orphan.exists()
    assert sorted(r.k for r in t.read().collect()) == list(range(30))


def test_cli_sql_over_snapshot_versions(spark, tmp_path, capsys):
    """--register-snapshot + --sql (VERDICT r12 #5): arbitrary SQL
    over a snapshot table at two pinned versions in one query — the
    time-travel story through the SQL face. A renamed column shows
    under each version's own name."""
    from scrappy_spark.sources.snapshots import SnapshotTable

    path = str(tmp_path / "snap")
    t = SnapshotTable(spark, path)
    t.commit(
        spark.range(0, 5).selectExpr("id AS k", "concat('v', id) AS txt"),
        "v0",
    )
    t.commit(
        spark.range(5, 12).selectExpr("id AS k", "concat('v', id) AS txt"),
        "v1 append",
        append=True,
    )
    assert cli.main(
        ["--store", str(tmp_path / "s"),
         "--register-snapshot", f"now={path}",
         "--register-snapshot", f"then={path}@0",
         "--sql",
         "SELECT (SELECT count(*) FROM now) AS n_now, "
         "(SELECT count(*) FROM then) AS n_then"]
    ) == 0
    out = capsys.readouterr().out
    assert "12" in out and "5" in out
    # @ts: pins a timestamp (TIMESTAMP AS OF through the SQL face)
    import time as _time

    ts_now = _time.time() + 1
    assert cli.main(
        ["--store", str(tmp_path / "s"),
         "--register-snapshot", f"asof={path}@ts:{ts_now}",
         "--sql", "SELECT count(*) AS n FROM asof"]
    ) == 0
    assert "12" in capsys.readouterr().out
    # malformed spec refuses loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="name=path"):
        from scrappy_spark.sqlapi import run_sql

        run_sql(spark, "SELECT 1", snapshots=["nopath"])


def test_cli_conditional_merge(spark, tmp_path, capsys):
    """--table-merge-keys with --merge-condition / --update-cols
    drives the conditional MERGE end-to-end."""
    from scrappy_spark.sources.snapshots import SnapshotTable

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    t.commit(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, tag string, score long"
        ).coalesce(1)
    )
    bpath = str(tmp_path / "batch.parquet")
    spark.createDataFrame(
        [(1, "X", 99), (2, "X", 5), (7, "X", 1)],
        "k long, tag string, score long",
    ).write.parquet(bpath)
    assert cli.main(
        ["--store", str(tmp_path / "s"), "--table", path,
         "--table-merge-keys", bpath, "--key-col", "k",
         "--merge-condition", "b.score > t.score",
         "--update-cols", "score"]
    ) == 0
    assert "merge upsert on k" in capsys.readouterr().out
    rows = {r.k: (r.tag, r.score) for r in t.read().collect()}
    assert rows == {1: ("a", 99), 2: ("b", 20), 7: ("X", 1)}


def test_cli_table_describe(spark, tmp_path, capsys):
    """--table-describe: the operator's one-look summary — schema with
    ids and stats/bloom designations, the spec list under evolution,
    pending deletes."""
    from scrappy_spark.sources.snapshots import SnapshotTable

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    t.commit_partitioned(
        spark.range(0, 100).selectExpr("id AS k", "concat('v', id) AS v"),
        "k",
        "truncate",
        width=50,
        stats_cols=["k"],
    )
    t.commit_partitioned(
        spark.range(100, 200).selectExpr("id AS k", "concat('v', id) AS v"),
        "k",
        "bucket",
        n=4,
        append=True,
    )
    t.delete_where(("k", "=", 5))
    assert cli.main(
        ["--store", str(tmp_path / "s"), "--table", path,
         "--table-describe"]
    ) == 0
    out = capsys.readouterr().out
    assert "col 1: k bigint [stats]" in out
    assert "spec 0: truncate(50) on k" in out
    assert "spec 1: bucket(4) on k (current)" in out
    assert "1 pending row-level delete(s)" in out


def test_cli_table_refs_lifecycle(spark, tmp_path, capsys):
    """--table-create-branch / --table-tag / --table-refs /
    --table-fast-forward / --table-drop-branch: the round-14 refs
    story is CLI-drivable end to end."""
    from scrappy_spark.sources.snapshots import SnapshotTable

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    t.commit(
        spark.range(0, 10).selectExpr("id AS k").coalesce(1),
        stats_cols=["k"],
    )
    store = ["--store", str(tmp_path / "s"), "--table", path]
    assert cli.main(store + ["--table-tag", "baseline@0"]) == 0
    assert "tag baseline -> main@0" in capsys.readouterr().out
    assert cli.main(store + ["--table-create-branch", "dev"]) == 0
    assert "branch dev forked from main@0" in capsys.readouterr().out
    # commit to the branch through the API, then promote via CLI
    t.for_branch("dev").commit(
        spark.range(10, 15).selectExpr("id AS k").coalesce(1), append=True
    )
    assert cli.main(store + ["--table-refs"]) == 0
    out = capsys.readouterr().out
    assert "branch main @ v0" in out and "branch dev @ v1" in out
    assert "tag baseline -> main@0" in out
    assert cli.main(store + ["--table-fast-forward", "dev"]) == 0
    assert "main fast-forwarded to dev@1 as v1" in capsys.readouterr().out
    assert sorted(r.k for r in t.read().collect()) == list(range(15))
    assert cli.main(store + ["--table-drop-branch", "dev"]) == 0
    assert "branch dev dropped" in capsys.readouterr().out
    assert t.branches() == ["main"]
    # branch-scoped admin: --branch routes table commands
    assert cli.main(store + ["--table-create-branch", "exp@0"]) == 0
    capsys.readouterr()
    assert (
        cli.main(store + ["--branch", "exp", "--table-history"]) == 0
    )
    assert "v0" in capsys.readouterr().out


def test_cli_table_add_blooms(spark, tmp_path, capsys):
    from scrappy_spark.sources.snapshots import SnapshotTable

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    t.commit(
        spark.range(0, 30).selectExpr("id * 3 AS k").coalesce(1)
    )
    assert cli.main(
        ["--store", str(tmp_path / "s"), "--table", path,
         "--table-add-blooms", "k"]
    ) == 0
    assert "blooms on ['k'] backfilled" in capsys.readouterr().out
    assert t.prune_report(("k", "=", 1))["n_read"] == 0
    assert t.prune_report(("k", "=", 9))["n_read"] == 1


def test_cli_table_commit_partitioned(spark, tmp_path, capsys):
    """--table-commit drives the whole write story from the CLI:
    plain commit with stats + blooms, multi-field partitioned commit,
    append with spec evolution, branch-scoped commit."""
    from scrappy_spark.sources.snapshots import SnapshotTable

    src = str(tmp_path / "in")
    spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id % 4 AS STRING) AS g"
    ).write.parquet(src)
    path = str(tmp_path / "t")
    store = ["--store", str(tmp_path / "s"), "--table", path]

    assert cli.main(
        store + ["--table-commit", src, "--stats-cols", "k",
                 "--bloom-cols", "k"]
    ) == 0
    assert "committed v0 on main" in capsys.readouterr().out
    t = SnapshotTable(spark, path)
    assert t.read().count() == 100
    assert t.prune_report(("k", "=", 500))["n_read"] == 0  # bloom

    # multi-field partitioned replace, then an append that EVOLVES
    # the spec (single bucket field)
    assert cli.main(
        store + ["--table-commit", src,
                 "--partition-spec", "g,k:bucket:4"]
    ) == 0
    assert "committed v1" in capsys.readouterr().out
    m = t._manifest(1)
    assert len(m["partition_spec"]["fields"]) == 2
    src2 = str(tmp_path / "in2")
    spark.range(100, 120).selectExpr(
        "id AS k", "CAST(id % 4 AS STRING) AS g"
    ).write.parquet(src2)
    assert cli.main(
        store + ["--table-commit", src2, "--append",
                 "--partition-spec", "k:truncate:10"]
    ) == 0
    assert "committed v2" in capsys.readouterr().out
    assert len(t._manifest(2)["partition_specs"]) == 2
    assert t.read().count() == 120

    # branch-scoped commit leaves main untouched
    assert cli.main(store + ["--table-create-branch", "dev"]) == 0
    capsys.readouterr()
    assert cli.main(
        store + ["--branch", "dev", "--table-commit", src2, "--append"]
    ) == 0
    assert "on dev" in capsys.readouterr().out
    assert t.current_version() == 2
    assert t.for_branch("dev").read().count() == 140

    # validation: bad spec field and bloom+partition refusal
    assert cli.main(
        store + ["--table-commit", src, "--partition-spec", "k:bogus:3"]
    ) == 2
    assert cli.main(
        store + ["--table-commit", src, "--partition-spec", "g",
                 "--bloom-cols", "k"]
    ) == 2


def test_cli_table_rollback_and_expire_dry_run(spark, tmp_path, capsys):
    from scrappy_spark.sources.snapshots import SnapshotTable

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    t.commit(spark.range(0, 5).selectExpr("id AS k").coalesce(1))
    t.commit(spark.range(9, 12).selectExpr("id AS k").coalesce(1))
    store = ["--store", str(tmp_path / "s"), "--table", path]
    assert cli.main(store + ["--table-rollback", "0"]) == 0
    assert "main rolled back to v0 as v2" in capsys.readouterr().out
    assert sorted(r.k for r in t.read().collect()) == list(range(5))
    assert cli.main(
        store + ["--table-expire", "1", "--grace-sec", "0", "--dry-run"]
    ) == 0
    out = capsys.readouterr().out
    assert "would expire versions [0, 1]" in out and "would be deleted" in out
    assert [m["version"] for m in t.versions()] == [0, 1, 2]


def test_cli_register_snapshot_branch_and_tag_specs(spark, tmp_path, capsys):
    """--register-snapshot name=path@branch:B / @tag:T pin refs for
    --sql, alongside the existing @N and @ts: forms."""
    from scrappy_spark.sources.snapshots import SnapshotTable

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    t.commit(spark.range(0, 5).selectExpr("id AS k"))
    dev = t.create_branch("dev")
    dev.commit(spark.range(10, 13).selectExpr("id AS k"), append=True)
    dev.tag("rel")
    assert cli.main(
        ["--store", str(tmp_path / "s"),
         "--register-snapshot", f"d={path}@branch:dev",
         "--register-snapshot", f"r={path}@tag:rel",
         "--register-snapshot", f"m={path}",
         "--sql",
         "SELECT (SELECT count(*) FROM d) AS d, "
         "(SELECT count(*) FROM r) AS r, (SELECT count(*) FROM m) AS m"]
    ) == 0
    out = capsys.readouterr().out
    assert "8" in out and "5" in out


def test_cli_bad_ref_spec_exits_2(spark, tmp_path, capsys):
    from scrappy_spark.sources.snapshots import SnapshotTable

    path = str(tmp_path / "t")
    SnapshotTable(spark, path).commit(spark.range(3).selectExpr("id AS k"))
    with pytest.raises(SystemExit) as e:
        cli.main(
            ["--store", str(tmp_path / "s"), "--table", path,
             "--table-tag", "x@--5"]
        )
    assert e.value.code == 2
    assert "bad ref spec" in capsys.readouterr().err
