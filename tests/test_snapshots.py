"""SnapshotTable: time travel, atomic pointer, append-without-rewrite,
crash orphan handling, expiry."""

from __future__ import annotations

import json
import os

import pytest

from scrappy_spark.sources.snapshots import SnapshotTable


def _ids(df) -> list[int]:
    return sorted(r["id"] for r in df.collect())


def test_commit_read_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    assert t.current_version() is None
    t.commit(spark.range(0, 5), "v0")
    t.commit(spark.range(10, 15), "v1 full replace")
    assert t.current_version() == 1
    assert _ids(t.read()) == list(range(10, 15))
    assert _ids(t.read(version=0)) == list(range(5))  # time travel
    vs = t.versions()
    assert [m["version"] for m in vs] == [0, 1]
    assert vs[1]["parent"] == 0 and vs[1]["message"] == "v1 full replace"


def test_append_references_parent_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    m0 = t.commit(spark.range(0, 3).coalesce(1), "base")
    m1 = t.commit(spark.range(3, 6).coalesce(1), "incr", append=True)
    assert set(m0["files"]) < set(m1["files"])  # no rewrite: superset
    assert _ids(t.read()) == list(range(6))
    d = t.diff(0, 1)
    assert d["removed"] == [] and len(d["added"]) >= 1


def test_old_reader_unaffected_by_new_commit(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 4))
    pinned = t.read(version=0)  # resolve files BEFORE the next commit
    t.commit(spark.range(100, 104))
    assert _ids(pinned) == list(range(4))  # still reads v0's files


def test_crash_orphans_are_invisible_and_swept(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3))
    # simulate a writer that died after writing data but before the
    # manifest: an orphan snap dir + a partial tmp manifest
    orphan = tmp_path / "t" / "data" / "snap-1"
    os.makedirs(orphan)
    (orphan / "part-00000.parquet").write_bytes(b"garbage")
    (tmp_path / "t" / "_manifests" / ".v1.json.tmp").write_text("{ partial")
    # readers see only v0; versions() ignores the tmp file
    assert t.current_version() == 0
    assert _ids(t.read()) == [0, 1, 2]
    assert [m["version"] for m in t.versions()] == [0]
    # a retried commit reuses the version slot cleanly
    t.commit(spark.range(5, 8))
    assert _ids(t.read()) == [5, 6, 7]
    rep = t.expire(keep_last=1)
    assert rep["dropped_versions"] == [0]
    assert _ids(t.read()) == [5, 6, 7]


def test_expire_keeps_live_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3).coalesce(1))
    t.commit(spark.range(3, 6).coalesce(1), append=True)
    t.commit(spark.range(6, 9).coalesce(1), append=True)
    rep = t.expire(keep_last=2)
    assert rep["dropped_versions"] == [0]
    # v0's files are still referenced by v1/v2 (append lineage) → kept
    assert rep["deleted_files"] == []
    assert _ids(t.read(version=1)) == list(range(6))
    assert _ids(t.read()) == list(range(9))
    with pytest.raises(FileNotFoundError):
        t._manifest(0)


def test_expire_deletes_unreferenced(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3).coalesce(1))
    t.commit(spark.range(10, 13).coalesce(1))  # full replace: v0 files dead
    rep = t.expire(keep_last=1)
    assert rep["dropped_versions"] == [0] and len(rep["deleted_files"]) >= 1
    assert not (tmp_path / "t" / "data" / "snap-0").exists()
    assert _ids(t.read()) == [10, 11, 12]


def test_manifest_is_valid_json_with_lineage(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 2))
    with open(tmp_path / "t" / "_manifests" / "v0.json") as f:
        m = json.load(f)
    assert m["parent"] is None and m["n_files"] == len(m["files"]) > 0
    assert all(p.endswith(".parquet") for p in m["files"])


def test_row_diff_classifies_changes(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "s", "v"]
    )
    v1 = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)], ["id", "s", "v"]
    )
    t.commit(v0, "v0")
    t.commit(v1, "v1")
    got = {r["id"]: r["change"] for r in t.row_diff(0, 1, ["id"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged -> absent


def test_row_diff_direction_and_identity(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3).withColumnRenamed("id", "id"), "v0")
    t.commit(spark.range(1, 4), "v1")
    fwd = {r["id"]: r["change"] for r in t.row_diff(0, 1, ["id"]).collect()}
    rev = {r["id"]: r["change"] for r in t.row_diff(1, 0, ["id"]).collect()}
    assert fwd == {0: "removed", 3: "added"}
    assert rev == {0: "added", 3: "removed"}
    assert t.row_diff(1, 1, ["id"]).count() == 0  # self-diff is empty


def test_row_diff_schema_mismatch_raises(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3), "v0")
    t.commit(spark.range(0, 3).selectExpr("id", "0 AS extra"), "v1")
    with pytest.raises(ValueError, match="schema mismatch"):
        t.row_diff(0, 1, ["id"])


def test_row_diff_payload_stays_out_of_shuffle(spark, tmp_path):
    """The join operands must be (key, hash) projections — the payload
    column name may not appear anywhere after the Exchange."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.range(0, 10).selectExpr("id", "repeat('x', 100) AS widepayload")
    t.commit(df, "v0")
    t.commit(df.filter("id < 9"), "v1")
    plan = t.row_diff(0, 1, ["id"])._jdf.queryExecution().executedPlan().toString()
    import re

    # Drop the hash-computing Project lines (they legitimately consume
    # the payload, pre-shuffle) and the scan lines (the reader must
    # read it to hash it); the payload name must then be gone — i.e.
    # absent from every Exchange and every post-shuffle operator, so
    # only (key, hash) rows are shuffled.
    cleaned = "\n".join(
        line
        for line in plan.splitlines()
        if "xxhash64" not in line
        and "Scan" not in line
        and "ReadSchema" not in line
    )
    assert "Exchange" in cleaned and "widepayload" not in cleaned
    assert re.search(r"Exchange hashpartitioning\(id#", plan)


def test_row_diff_detects_value_move_between_columns(spark, tmp_path):
    """Regression: Spark hash fns pass the seed through NULL children,
    so a bare xxhash64(a, b) reads ('x', NULL) == (NULL, 'x'). The
    payload hash must encode the null PATTERN so a value MOVING
    between columns is a change."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    v0 = spark.createDataFrame([(1, "x", None)], "id long, a string, b string")
    v1 = spark.createDataFrame([(1, None, "x")], "id long, a string, b string")
    t.commit(v0, "v0")
    t.commit(v1, "v1")
    got = t.row_diff(0, 1, ["id"]).collect()
    assert len(got) == 1 and got[0]["change"] == "changed"


# ---------------------------------------------------------------------------
# column identity: rename / drop / re-add (Iceberg-style, VERDICT r9 #5)
# ---------------------------------------------------------------------------


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    m0 = t.commit(
        spark.createDataFrame([(1, "en"), (2, "de")], "id long, lang string")
        .coalesce(1),
        "base",
    )
    m1 = t.rename_column("lang", "language")
    assert m1["files"] == m0["files"]  # no byte moved
    assert t.read().columns == ["id", "language"]
    assert sorted(r.language for r in t.read().collect()) == ["de", "en"]
    # time travel shows the OLD name
    assert t.read(0).columns == ["id", "lang"]
    # the column kept its id across the rename
    assert m1["columns"][1]["id"] == m0["columns"][1]["id"]
    with pytest.raises(ValueError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.rename_column("language", "id")  # collision


def test_append_after_rename_maps_by_id(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(1, "en")], "id long, lang string").coalesce(1),
        "base",
    )
    t.rename_column("lang", "language")
    t.commit(
        spark.createDataFrame(
            [(2, "fr")], "id long, language string"
        ).coalesce(1),
        "post-rename append",
        append=True,
    )
    got = {r.id: r.language for r in t.read().collect()}
    assert got == {1: "en", 2: "fr"}  # old file's lang surfaces as language


def test_drop_then_readd_gets_fresh_id_no_resurrection(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(1, "en", 10), (2, "de", 20)], "id long, lang string, score long"
        ).coalesce(1),
        "base",
    )
    m_drop = t.drop_column("score")
    assert t.read().columns == ["id", "lang"]
    assert t.read(0).columns == ["id", "lang", "score"]  # still in history
    m_re = t.commit(
        spark.createDataFrame(
            [(3, "fr", 99)], "id long, lang string, score long"
        ).coalesce(1),
        "re-add score",
        append=True,
    )
    # the re-added name got a FRESH id
    old_id = next(c["id"] for c in t._manifest(0)["columns"] if c["name"] == "score")
    new_id = next(c["id"] for c in m_re["columns"] if c["name"] == "score")
    assert new_id != old_id
    # old rows read NULL for the re-added column: no resurrection
    got = {r.id: r.score for r in t.read().collect()}
    assert got == {1: None, 2: None, 3: 99}
    assert m_drop["n_files"] == 1


def test_drop_guards(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError):
        t.drop_column("nope")
    with pytest.raises(ValueError):
        t.drop_column("id")  # last column


def test_replace_carries_column_identity_by_name(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    m0 = t.commit(
        spark.createDataFrame([(1, "en")], "id long, lang string"), "base"
    )
    m1 = t.commit(
        spark.createDataFrame([(9, "xx")], "id long, lang string"), "replace"
    )
    assert [c["id"] for c in m1["columns"]] == [c["id"] for c in m0["columns"]]


def test_legacy_manifest_append_infers_parent_schema(spark, tmp_path):
    """ADVICE r9 #3: appending to a manifest that predates schema
    recording must unify against the PARENT FILES' columns, not trust
    df.schema — a parent-only column may not silently vanish."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    m0 = t.commit(
        spark.createDataFrame(
            [(1, "en", "keepme")], "id long, lang string, extra string"
        ).coalesce(1),
        "base",
    )
    # strip the manifest back to the legacy (pre-schema) shape
    p = os.path.join(t._mdir, "v0.json")
    with open(p) as f:
        m = json.load(f)
    for k in ("schema", "columns", "schemas", "file_schema", "next_col_id"):
        m.pop(k, None)
    with open(p, "w") as f:
        json.dump(m, f)
    t.commit(
        spark.createDataFrame([(2, "de")], "id long, lang string").coalesce(1),
        "narrow append",
        append=True,
    )
    df = t.read()
    assert df.columns == ["id", "lang", "extra"]  # parent-only col survives
    got = {r.id: r.extra for r in df.collect()}
    assert got == {1: "keepme", 2: None}


def test_compaction_across_rename_preserves_values(spark, tmp_path):
    """A compaction bin mixing files written before and after a rename
    must rewrite under the id mapping — the flat recorded-schema read
    would NULL the renamed column for pre-rename files."""
    from scrappy_spark.operators.layout import compact_snapshot

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(1, "en")], "id long, lang string").coalesce(1),
        "base",
    )
    t.rename_column("lang", "language")
    t.commit(
        spark.createDataFrame(
            [(2, "fr")], "id long, language string"
        ).coalesce(1),
        "append",
        append=True,
    )
    before = sorted(map(tuple, t.read().collect()))
    _, manifest = compact_snapshot(t, 100, unit="rows")
    assert manifest["n_files"] == 1  # both files packed into one bin
    assert sorted(map(tuple, t.read().collect())) == before
    assert {r.language for r in t.read().collect()} == {"en", "fr"}


# ----------------------------------------------------- manifest file pruning


def _range_table(spark, tmp_path, name="pt"):
    from scrappy_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / name))
    for i, (lo, hi) in enumerate([(0, 10), (10, 20), (20, 30)]):
        df = (
            spark.range(lo, hi)
            .selectExpr("id AS k", "concat('v', id) AS v")
            .coalesce(1)
        )
        t.commit(df, append=i > 0, stats_cols=["k"] if i == 0 else None)
    return t


def test_pruned_read_skips_provably_empty_files(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    m = t._manifest(t.current_version())
    assert m["n_files"] == 3 and len(m["stats"]) == 3
    rep = t.prune_report(("k", "between", (12, 17)))
    assert rep == {"n_files": 3, "n_read": 1, "n_pruned": 2}
    got = sorted(r.k for r in t.read(where=("k", "between", (12, 17))).collect())
    assert got == list(range(12, 18))
    # every comparison op prunes AND filters correctly
    for where, n_read, want in [
        (("k", "=", 25), 1, [25]),
        (("k", "<", 3), 1, [0, 1, 2]),
        (("k", "<=", 10), 2, list(range(11))),
        (("k", ">", 27), 1, [28, 29]),
        (("k", ">=", 20), 1, list(range(20, 30))),
    ]:
        assert t.prune_report(where)["n_read"] == n_read, where
        assert sorted(r.k for r in t.read(where=where).collect()) == want


def test_pruned_read_all_pruned_returns_typed_empty(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    out = t.read(where=("k", ">", 1000))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "v"]


def test_pruned_read_equals_unpruned_filter(spark, tmp_path):
    """Pruning is pure optimization: result == full read + filter,
    including conjuncts on a column WITHOUT stats (never pruned)."""
    t = _range_table(spark, tmp_path)
    where = [("k", ">=", 25), ("v", "=", "v27")]
    assert t.prune_report(where)["n_read"] == 1  # k-stats still prune
    got = [tuple(r) for r in t.read(where=where).collect()]
    want = [
        tuple(r)
        for r in t.read().filter("k >= 25 AND v = 'v27'").collect()
    ]
    assert got == want == [(27, "v27")]


def test_pruning_stats_survive_rename_and_inherit_on_append(
    spark, tmp_path
):
    t = _range_table(spark, tmp_path)
    t.rename_column("k", "key")
    # appends after the rename inherit the designation under the id
    t.commit(
        spark.range(30, 40).selectExpr("id AS key", "concat('v', id) AS v").coalesce(1),
        append=True,
    )
    rep = t.prune_report(("key", "=", 35))
    assert rep == {"n_files": 4, "n_read": 1, "n_pruned": 3}
    assert [r.key for r in t.read(where=("key", "=", 35)).collect()] == [35]
    # unknown predicate column is loud, not silently unpruned
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no column"):
        t.read(where=("k", "=", 1))


def test_pruning_stats_survive_compaction(spark, tmp_path):
    """commit_files (the compaction path) keeps reused files' stats
    and collects fresh stats for rewritten files from their footers."""
    import os

    t = _range_table(spark, tmp_path)
    v = t.current_version()
    m = t._manifest(v)
    # rewrite the first two files into one, reuse the third
    snap_dir = str(tmp_path / "pt" / "data" / f"snap-{v + 1}")
    t.read_files(m["files"][:2]).coalesce(1).write.mode("overwrite").parquet(
        snap_dir
    )
    fresh = sorted(
        os.path.join(snap_dir, f)
        for f in os.listdir(snap_dir)
        if f.endswith(".parquet")
    )
    t.commit_files(fresh + [m["files"][2]], "compact 2->1")
    rep = t.prune_report(("k", "=", 25))
    assert rep == {"n_files": 2, "n_read": 1, "n_pruned": 1}
    assert [r.k for r in t.read(where=("k", "=", 25)).collect()] == [25]


def test_stats_cols_unknown_column_raises(spark, tmp_path):
    from scrappy_spark.sources.snapshots import SnapshotTable
    import pytest as _pytest

    t = SnapshotTable(spark, str(tmp_path / "bad"))
    with _pytest.raises(ValueError, match="stats_cols"):
        t.commit(
            spark.range(3).selectExpr("id AS k"),
            stats_cols=["nope"],
        )


# ------------------------------------------------------- row-level deletes


def test_delete_where_merge_on_read_and_time_travel(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    v_before = t.current_version()
    t.delete_where(("k", "between", (12, 17)))
    got = sorted(r.k for r in t.read().collect())
    assert got == [k for k in range(30) if not 12 <= k <= 17]
    # time travel: the parent version still shows every row
    assert sorted(r.k for r in t.read(v_before).collect()) == list(range(30))
    # composes with pruned reads
    assert sorted(
        r.k for r in t.read(where=("k", "between", (10, 20))).collect()
    ) == [10, 11, 18, 19, 20]


def test_delete_where_full_cover_is_pure_metadata(spark, tmp_path):
    """A predicate exactly covering one file's [min, max] drops the
    file from the manifest and — because every other file's stats
    prune the predicate — records NO residual entry at all."""
    t = _range_table(spark, tmp_path)
    t.delete_where(("k", "between", (10, 19)))
    m = t._manifest(t.current_version())
    assert m["n_files"] == 2
    assert "deletes" not in m
    assert sorted(r.k for r in t.read().collect()) == [
        *range(10), *range(20, 30)
    ]


def test_delete_keys_scoped_so_reingest_survives(spark, tmp_path):
    """The takedown-then-reingest contract: a key delete names the
    files present at delete time, so a later append of the same key
    is NOT retro-deleted."""
    t = _range_table(spark, tmp_path)
    keys = spark.range(3).selectExpr("id + 5 AS k")  # delete 5,6,7
    t.delete_keys(keys, ["k"])
    assert sorted(r.k for r in t.read().collect()) == [
        k for k in range(30) if k not in (5, 6, 7)
    ]
    # re-ingest one taken-down key: it must survive
    t.commit(
        spark.range(6, 7).selectExpr("id AS k", "'reborn' AS v").coalesce(1),
        append=True,
    )
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[6] == "reborn" and 5 not in rows and 7 not in rows


def test_delete_rename_proof_and_guards(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    t.delete_where(("k", "=", 3))
    t.rename_column("k", "key")  # deletes are recorded by column id
    assert 3 not in {r.key for r in t.read().collect()}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="apply_deletes"):
        t.drop_column("key")
    with _pytest.raises(ValueError, match="apply_deletes"):
        t.commit_files(t._manifest(t.current_version())["files"])
    with _pytest.raises(ValueError, match="no column"):
        t.delete_where(("nope", "=", 1))


def test_apply_deletes_materializes_and_reuses_untouched(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    t.delete_where(("k", "between", (12, 17)))
    t.delete_keys(spark.range(25, 27).selectExpr("id AS k"), ["k"])
    before = sorted(map(tuple, t.read().collect()))
    files_before = set(t._manifest(t.current_version())["files"])
    t.apply_deletes()
    m = t._manifest(t.current_version())
    assert "deletes" not in m
    assert sorted(map(tuple, t.read().collect())) == before
    # the untouched first file ([0,10) — outside both entries' scopes
    # after stats scoping) is reused byte-identically
    assert any(f in files_before for f in m["files"])
    # stats were refreshed for rewritten files: pruning still exact
    rep = t.prune_report(("k", "=", 25))
    assert rep["n_pruned"] >= 1
    assert [r.k for r in t.read(where=("k", "=", 25)).collect()] == []
    # drop_column and compaction unblocked
    t.drop_column("v")
    assert t.read().columns == ["k"]


def test_delete_null_semantics(spark, tmp_path):
    """NULL never matches: rows with NULL in the predicate / key
    column are kept by both delete flavors (SQL DELETE semantics)."""
    from scrappy_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "n"))
    t.commit(
        spark.createDataFrame(
            [(1, "a"), (None, "b"), (3, "c")], "k long, v string"
        ).coalesce(1)
    )
    t.delete_where(("k", ">=", 1))
    assert [r.v for r in t.read().collect()] == ["b"]
    t2 = SnapshotTable(spark, str(tmp_path / "n2"))
    t2.commit(
        spark.createDataFrame(
            [(1, "a"), (None, "b"), (3, "c")], "k long, v string"
        ).coalesce(1)
    )
    t2.delete_keys(spark.range(1, 4).selectExpr("id AS k"), ["k"])
    assert [r.v for r in t2.read().collect()] == ["b"]


def test_expire_keeps_live_delete_files(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    t.delete_keys(spark.range(5, 8).selectExpr("id AS k"), ["k"])
    t.expire(keep_last=1)
    assert sorted(r.k for r in t.read().collect()) == [
        k for k in range(30) if k not in (5, 6, 7)
    ]


def test_row_diff_sees_row_level_deletes_as_cdc(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    v = t.current_version()
    t.delete_where(("k", "=", 21))
    diff = {
        (r.k, r.change) for r in t.row_diff(v, t.current_version(), ["k"]).collect()
    }
    assert diff == {(21, "removed")}


def test_string_stats_prune_and_multi_column_conjuncts(spark, tmp_path):
    """Footer stats work for string columns too (lexicographic
    intervals), and a multi-column conjunct prunes on every designated
    column independently."""
    t = SnapshotTable(spark, str(tmp_path / "s"))
    batches = [("a", "f"), ("g", "m"), ("n", "z")]
    for i, (lo, hi) in enumerate(batches):
        df = spark.createDataFrame(
            [(lo, i * 10), (hi, i * 10 + 5)], "name string, n long"
        ).coalesce(1)
        t.commit(
            df, append=i > 0, stats_cols=["name", "n"] if i == 0 else None
        )
    assert t.prune_report(("name", "between", ("h", "k")))["n_read"] == 1
    assert [r.name for r in t.read(where=("name", ">=", "n")).collect()] == [
        "n",
        "z",
    ]
    # conjuncts on BOTH designated columns: each prunes independently
    where = [("name", ">=", "g"), ("n", "<=", 15)]
    assert t.prune_report(where)["n_read"] == 1
    assert [tuple(r) for r in t.read(where=where).collect()] == [("g", 10), ("m", 15)]
    # string-keyed row-level delete settles against string stats
    t.delete_where(("name", "between", ("g", "m")))
    m = t._manifest(t.current_version())
    assert m["n_files"] == 2 and "deletes" not in m


def test_zorder_clustered_commit_prunes_two_dimensions(spark, tmp_path):
    """Layout x stats composition: committing a Z-order-clustered
    frame gives every file a compact rectangle in (x, y) space, so a
    2-D conjunct prunes to a corner's file(s) — the partition-pruning
    economics without a partition column."""
    from pyspark.sql import functions as F

    from scrappy_spark.operators.layout import z_value

    grid = spark.range(4096).selectExpr("id % 64 AS x", "id DIV 64 AS y")
    t = SnapshotTable(spark, str(tmp_path / "z"))
    t.commit(
        grid.withColumn("__z", z_value(F.col("x"), F.col("y"), 6))
        .repartitionByRange(16, "__z")
        .sortWithinPartitions("__z")
        .drop("__z"),
        stats_cols=["x", "y"],
    )
    where = [("x", "between", (0, 7)), ("y", "between", (0, 7))]
    rep = t.prune_report(where)
    assert rep["n_files"] == 16
    assert rep["n_read"] <= 2  # the corner is one compact z-range
    got = sorted((r.x, r.y) for r in t.read(where=where).collect())
    assert got == [(x, y) for x in range(8) for y in range(8)]


def test_delete_full_cover_keeps_null_rows(spark, tmp_path):
    """ADVICE r11 #1: parquet min/max exclude NULLs, so a file whose
    NON-NULL values all match the predicate must NOT take the
    metadata-delete fast path — dropping it outright would silently
    delete its NULL rows, contradicting the 'NULL never matches'
    DELETE contract. Files with null_count == 0 still fast-path."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    withnull = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "n")], "k long, v string"
    ).coalesce(1)
    t.commit(withnull, stats_cols=["k"])
    clean = spark.createDataFrame(
        [(5, "c"), (6, "d")], "k long, v string"
    ).coalesce(1)
    t.commit(clean, append=True)
    # the null-bearing file's stats fully cover [1,2] — but it holds a
    # NULL row, so it must stay, carrying a residual entry
    m = t.delete_where(("k", "between", (1, 2)))
    assert m["n_files"] == 2  # nothing dropped outright
    assert len(m.get("deletes", [])) == 1
    assert sorted(r.v for r in t.read().collect()) == ["c", "d", "n"]
    # the clean file (null_count == 0) still fast-paths out entirely
    m2 = t.delete_where(("k", "between", (5, 6)))
    assert m2["n_files"] == 1
    assert sorted(r.v for r in t.read().collect()) == ["n"]


def test_stats_record_null_count(spark, tmp_path):
    t = _range_table(spark, tmp_path)
    m = t._manifest(t.current_version())
    for per in m["stats"].values():
        for rng in per.values():
            assert len(rng) == 3 and rng[2] == 0


def test_delete_everything_stats_settled_is_readable(spark, tmp_path):
    """ADVICE r11 #2: a delete_where that stats fully settle across
    ALL files publishes files=[] with no pending entries — HEAD must
    stay readable (typed empty), and the table must accept later
    appends."""
    t = _range_table(spark, tmp_path)
    m = t.delete_where(("k", "between", (0, 29)))
    assert m["files"] == [] and "deletes" not in m
    out = t.read()
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "v"]
    # pruned read on the empty head also works
    assert t.read(where=("k", "=", 5)).count() == 0
    # the table lives on: a later append revives it
    t.commit(
        spark.range(100, 103).selectExpr(
            "id AS k", "concat('v', id) AS v"
        ).coalesce(1),
        append=True,
    )
    assert sorted(r.k for r in t.read().collect()) == [100, 101, 102]


def test_float_stats_never_recorded_nan_safe(spark, tmp_path):
    """ADVICE r11 #4: parquet min/max exclude NaN while Spark orders
    NaN above every double, so float stats would prune files whose
    NaN rows match — float/double columns are simply never recorded,
    and pruned/deleted reads stay exact with NaN present."""
    t = SnapshotTable(spark, str(tmp_path / "f"))
    df = spark.createDataFrame(
        [(1, 1.0), (2, 3.0), (3, float("nan"))], "id long, x double"
    ).coalesce(1)
    t.commit(df, stats_cols=["x", "id"])
    m = t._manifest(0)
    x_id = next(c["id"] for c in m["columns"] if c["name"] == "x")
    id_id = next(c["id"] for c in m["columns"] if c["name"] == "id")
    per = next(iter(m["stats"].values()))
    assert str(x_id) not in per  # float: no stats, never pruned
    assert str(id_id) in per  # the long column still records
    # Spark semantics: NaN > 5.0 is TRUE — the pruned read must agree
    # with unpruned read + filter (a [1,3] interval would prune it)
    got = [r.id for r in t.read(where=("x", ">", 5.0)).collect()]
    want = [r.id for r in t.read().filter("x > 5.0").collect()]
    assert got == want == [3]
    # the delete analog: the NaN row matches and is deleted
    t.delete_where(("x", ">", 5.0))
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_delete_where_rejects_unknown_op_before_persisting(spark, tmp_path):
    """An unvalidated op recorded in the manifest would poison every
    later read — it must be refused at the door, even when no file
    has stats to dispatch on."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(3).selectExpr("id AS k"))  # no stats_cols
    with pytest.raises(ValueError, match="unknown op"):
        t.delete_where(("k", "!=", 1))
    t.read().count()  # table unpoisoned


# -------------------------------------------------- optimistic concurrency


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string").coalesce(1)


def _race_once(monkeypatch, match, racer):
    """Fire ``racer()`` exactly once, right before the publish of the
    commit whose message satisfies ``match`` — a deterministic
    simulation of a concurrent writer landing between this writer's
    head read and its publication."""
    orig = SnapshotTable._publish
    state = {"fired": False}

    def publish(self, version, parent, files, message, *a, **k):
        if not state["fired"] and match(message):
            state["fired"] = True
            racer()
        return orig(self, version, parent, files, message, *a, **k)

    monkeypatch.setattr(SnapshotTable, "_publish", publish)


def test_concurrent_append_rebases_no_lost_update(spark, tmp_path, monkeypatch):
    """VERDICT r11 #1, the headline case: two writers both read
    HEAD=0 and append. Before optimistic concurrency the second
    publish silently overwrote the first (last-writer-wins lost
    update); now the loser detects the conflict at the manifest link
    and REBASES onto the new head — both appends survive."""
    from scrappy_spark.sources.snapshots import CommitConflict

    path = str(tmp_path / "t")
    t_a, t_b = SnapshotTable(spark, path), SnapshotTable(spark, path)
    t_a.commit(_kv(spark, [(0, "base")]), "base")
    _race_once(
        monkeypatch,
        lambda m: m == "A",
        lambda: t_b.commit(_kv(spark, [(2, "b")]), "B", append=True),
    )
    m = t_a.commit(_kv(spark, [(1, "a")]), "A", append=True)
    rows = {r.k: r.v for r in t_a.read().collect()}
    assert rows == {0: "base", 1: "a", 2: "b"}  # neither append lost
    assert [v["message"] for v in t_a.versions()] == ["base", "B", "A"]
    assert m["version"] == 2 and m["parent"] == 1  # rebased lineage
    # and with retries exhausted the conflict surfaces, never a
    # silent overwrite
    _race_once(
        monkeypatch,
        lambda m: m == "A2",
        lambda: t_b.commit(_kv(spark, [(4, "b2")]), "B2", append=True),
    )
    with pytest.raises(CommitConflict):
        t_a.commit(_kv(spark, [(3, "a2")]), "A2", append=True, max_retries=0)
    assert {r.k for r in t_a.read().collect()} == {0, 1, 2, 4}


def test_concurrent_replace_raises_commit_conflict(
    spark, tmp_path, monkeypatch
):
    """A replace losing the race must NOT auto-rebase (rebasing would
    wipe the concurrent commit's content) — it surfaces the conflict
    and leaves the winner's state intact."""
    from scrappy_spark.sources.snapshots import CommitConflict

    path = str(tmp_path / "t")
    t_a, t_b = SnapshotTable(spark, path), SnapshotTable(spark, path)
    t_a.commit(_kv(spark, [(0, "base")]), "base")
    _race_once(
        monkeypatch,
        lambda m: m == "A",
        lambda: t_b.commit(_kv(spark, [(2, "b")]), "B", append=True),
    )
    with pytest.raises(CommitConflict):
        t_a.commit(_kv(spark, [(1, "a")]), "A")
    rows = {r.k: r.v for r in t_a.read().collect()}
    assert rows == {0: "base", 2: "b"}  # winner untouched, loser orphaned
    # the orphaned loser's data files are swept by expire
    t_a.expire(keep_last=2)
    assert {r.k for r in t_a.read().collect()} == {0, 2}


def test_delete_vs_concurrent_append_conflicts_then_rerun(
    spark, tmp_path, monkeypatch
):
    """delete_where raced by an append refuses loudly (its file scope
    was computed against the old head); re-running it re-reads the
    head, which IS the rebase — the delete then applies to the table
    as of its actual commit time."""
    from scrappy_spark.sources.snapshots import CommitConflict

    path = str(tmp_path / "t")
    t_a, t_b = SnapshotTable(spark, path), SnapshotTable(spark, path)
    t_a.commit(_kv(spark, [(1, "a"), (2, "b")]), "base")
    _race_once(
        monkeypatch,
        lambda m: m.startswith("delete where"),
        lambda: t_b.commit(_kv(spark, [(2, "late")]), "B", append=True),
    )
    with pytest.raises(CommitConflict):
        t_a.delete_where(("k", "=", 2))
    # nothing deleted, nothing lost
    assert sorted(r.v for r in t_a.read().collect()) == ["a", "b", "late"]
    t_a.delete_where(("k", "=", 2))  # re-run = rebase onto the new head
    assert sorted(r.v for r in t_a.read().collect()) == ["a"]


def test_publish_is_exactly_once_per_version(spark, tmp_path):
    """The low-level invariant everything rides on: version N can be
    linked exactly once, whoever tries second gets the conflict."""
    from scrappy_spark.sources.snapshots import CommitConflict

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    m0 = t.commit(_kv(spark, [(0, "x")]), "v0")
    with pytest.raises(CommitConflict):
        t._publish(0, None, m0["files"], "duplicate v0")
    assert [v["message"] for v in t.versions()] == ["v0"]


# --------------------------------------------------------- MERGE upsert


def test_merge_keys_single_commit_upsert(spark, tmp_path):
    """VERDICT r11 #4: one-commit keyed upsert — matched keys replaced,
    new keys inserted, BOTH in a single version (readers never see the
    between-state), time travel shows the pre-merge rows, and replaying
    the batch is content-idempotent."""
    t = _range_table(spark, tmp_path)  # k 0..29, v = 'v{k}'
    v_before = t.current_version()
    batch = _kv(spark, [(5, "new5"), (12, "new12"), (100, "ins")])
    m = t.merge_keys(batch, ["k"])
    assert m["version"] == v_before + 1  # exactly ONE commit
    rows = {r.k: r.v for r in t.read().collect()}
    assert len(rows) == 31
    assert rows[5] == "new5" and rows[12] == "new12" and rows[100] == "ins"
    assert rows[0] == "v0" and rows[29] == "v29"  # untouched keys intact
    # time travel: the pre-merge version is unchanged
    old = {r.k: r.v for r in t.read(v_before).collect()}
    assert old[5] == "v5" and 100 not in old
    # CDC sees the merge as changed/added
    diff = {
        (r.k, r.change)
        for r in t.row_diff(v_before, m["version"], ["k"]).collect()
    }
    assert diff == {(5, "changed"), (12, "changed"), (100, "added")}
    # replay: the second merge retires the first's rows and re-inserts
    # identical ones — content unchanged
    t.merge_keys(batch, ["k"])
    assert {(r.k, r.v) for r in t.read().collect()} == set(rows.items())


def test_merge_keys_scope_and_null_keys(spark, tmp_path):
    """The delete leg scopes PARENT files only (never the batch's own
    files), stats-pruned to the key range; NULL-key rows are pure
    inserts (SQL MERGE NULL semantics)."""
    t = _range_table(spark, tmp_path)
    batch = _kv(spark, [(5, "new5"), (6, "new6"), (None, "nullkey")])
    m = t.merge_keys(batch, ["k"])
    entry = m["deletes"][-1]
    # keys 5-6 live in the first file only — scope is stats-pruned to it
    assert len(entry["files"]) == 1
    assert not set(entry["files"]) & (set(m["files"]) - set(entry["files"]))
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[5] == "new5" and rows[6] == "new6"
    assert rows[None] == "nullkey" and len(rows) == 31
    # unknown key column refused loudly
    with pytest.raises(ValueError, match="no column"):
        t.merge_keys(_kv(spark, [(1, "x")]), ["nope"])


def test_merge_keys_empty_table_and_raced_append(spark, tmp_path, monkeypatch):
    """First merge on an empty table is a plain commit; a merge raced
    by a concurrent append rebases — the late append's rows survive
    unless the merge batch carries their key."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.merge_keys(_kv(spark, [(1, "a")]), ["k"])
    assert {r.k for r in t.read().collect()} == {1}
    t2 = SnapshotTable(spark, str(tmp_path / "t"))
    _race_once(
        monkeypatch,
        lambda m: m.startswith("merge upsert"),
        lambda: t2.commit(_kv(spark, [(2, "late"), (3, "gone")]), "B", append=True),
    )
    t.merge_keys(_kv(spark, [(1, "a2"), (3, "merged")]), ["k"])
    rows = {r.k: r.v for r in t.read().collect()}
    # rebase: late key 2 survives; key 3 upserted by the merge relative
    # to its actual commit position (after the append)
    assert rows == {1: "a2", 2: "late", 3: "merged"}


# ----------------------------------------------------- partition spec


def test_partitioned_bucket_prunes_point_lookups(spark, tmp_path):
    """VERDICT r11 #7: the second Iceberg pruning axis. Bucket
    partitioning prunes EQUALITY conjuncts to one file — the case
    min/max stats cannot express on a high-cardinality key — while
    non-equality ops never bucket-prune (hash destroys order) and the
    result always equals unpruned read + filter."""
    t = SnapshotTable(spark, str(tmp_path / "b"))
    df = spark.range(0, 1000).selectExpr("id AS k", "concat('v', id) AS v")
    m = t.commit_partitioned(df, "k", "bucket", n=8)
    assert m["partition_spec"]["transform"] == "bucket"
    assert len(m["files"]) == 8 and len(m["partitions"]) == 8
    rep = t.prune_report(("k", "=", 123))
    assert rep == {"n_files": 8, "n_read": 1, "n_pruned": 7}
    assert [r.v for r in t.read(where=("k", "=", 123)).collect()] == ["v123"]
    # non-equality: conservative, reads everything, still correct
    assert t.prune_report(("k", "<", 5))["n_read"] == 8
    assert sorted(r.k for r in t.read(where=("k", "<", 5)).collect()) == [
        0, 1, 2, 3, 4,
    ]


def test_partitioned_identity_and_truncate(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "i"))
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(30)],
        "k long, lang string",
    )
    t.commit_partitioned(df, "lang", "identity")
    rep = t.prune_report(("lang", "=", "de"))
    assert rep == {"n_files": 3, "n_read": 1, "n_pruned": 2}
    got = sorted(r.k for r in t.read(where=("lang", "=", "de")).collect())
    assert got == [i for i in range(30) if i % 3 == 1]

    t2 = SnapshotTable(spark, str(tmp_path / "tr"))
    t2.commit_partitioned(
        spark.range(0, 500).selectExpr("id AS k"), "k", "truncate", width=100
    )
    assert t2._manifest(0)["n_files"] == 5
    # range ops prune on the [v, v+width) interval
    assert t2.prune_report(("k", "between", (120, 179)))["n_read"] == 1
    assert t2.prune_report(("k", ">=", 430))["n_read"] == 1
    got = sorted(
        r.k for r in t2.read(where=("k", "between", (120, 179))).collect()
    )
    assert got == list(range(120, 180))


def test_partition_spec_survives_rename_append_delete_expire(
    spark, tmp_path
):
    """Spec + per-file values carry through every manifest op (keyed
    by column id, so renames never break pruning); plain appends leave
    their files value-less (never pruned, never wrong); expire's
    recursive walk keeps live NESTED files."""
    t = SnapshotTable(spark, str(tmp_path / "s"))
    df = spark.range(0, 400).selectExpr("id AS k", "concat('v', id) AS v")
    t.commit_partitioned(df, "k", "bucket", n=4)
    t.rename_column("k", "key")
    rep = t.prune_report(("key", "=", 17))
    assert rep["n_read"] == 1  # id-keyed spec: rename-proof
    # a plain (unpartitioned) append: its file has no value — a point
    # lookup reads bucket file + appended file, result still exact
    t.commit(
        spark.range(1000, 1003).selectExpr(
            "id AS key", "concat('v', id) AS v"
        ).coalesce(1),
        append=True,
    )
    rep = t.prune_report(("key", "=", 17))
    assert rep == {"n_files": 5, "n_read": 2, "n_pruned": 3}
    assert [r.v for r in t.read(where=("key", "=", 17)).collect()] == ["v17"]
    assert [
        r.v for r in t.read(where=("key", "=", 1001)).collect()
    ] == ["v1001"]
    # row-level delete composes and the spec survives the commit
    t.delete_where(("key", "=", 17))
    assert t.read(where=("key", "=", 17)).count() == 0
    assert "partition_spec" in t._manifest(t.current_version())
    # expire keeps live nested files (recursive walk)
    t.expire(keep_last=1)
    assert t.read().count() == 402
    assert t.prune_report(("key", "=", 18))["n_read"] == 2


def test_partitioned_append_spec_rules_and_nulls(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "a"))
    t.commit(
        spark.range(0, 10).selectExpr("id AS k", "concat('v', id) AS v"),
        "unpartitioned base",
    )
    # a partitioned append onto unpartitioned history SETS the spec;
    # old files are value-less and never pruned
    t.commit_partitioned(
        spark.range(10, 100).selectExpr("id AS k", "concat('v', id) AS v"),
        "k",
        "bucket",
        n=4,
        append=True,
    )
    rep = t.prune_report(("k", "=", 55))
    assert rep["n_pruned"] == 3  # 3 of the 4 buckets drop; base files stay
    assert [r.v for r in t.read(where=("k", "=", 55)).collect()] == ["v55"]
    # changing the spec on append EVOLVES it (VERDICT r12 #3): the new
    # spec registers under a fresh id, old files keep pruning under
    # theirs — never a rewrite
    t.commit_partitioned(
        spark.range(100, 180).selectExpr(
            "id AS k", "concat('v', id) AS v"
        ),
        "k",
        "bucket",
        n=8,
        append=True,
    )
    m = t._manifest(t.current_version())
    assert len(m["partition_specs"]) == 2
    assert m["partition_spec"]["n"] == 8  # current spec is the new one
    # a point in the OLD data prunes by the old 4-bucket spec (3 old
    # files drop) AND the new 8-bucket spec (7 new files drop); the
    # value-less base files always survive
    rep = t.prune_report(("k", "=", 55))
    assert rep["n_pruned"] == 10
    assert [r.v for r in t.read(where=("k", "=", 55)).collect()] == ["v55"]
    assert [r.v for r in t.read(where=("k", "=", 150)).collect()] == ["v150"]
    # NULL partition values land value-less and are kept by every
    # conjunct: pruned read == unpruned read + filter
    tn = SnapshotTable(spark, str(tmp_path / "n"))
    tn.commit_partitioned(
        spark.createDataFrame(
            [("en", 1), (None, 2), ("de", 3)], "lang string, k long"
        ),
        "lang",
        "identity",
    )
    got = [r.k for r in tn.read(where=("lang", "=", "en")).collect()]
    want = [r.k for r in tn.read().filter("lang = 'en'").collect()]
    assert got == want == [1]


def test_two_threads_racing_appends_all_survive(spark, tmp_path):
    """Not an injected interleave — a REAL race: two threads each
    append 6 batches to one table through one SparkSession. Every
    conflict must rebase; afterwards all 12 batches' rows are present
    and the version chain is a single linear history."""
    import threading

    path = str(tmp_path / "race")
    SnapshotTable(spark, path).commit(_kv(spark, [(-1, "base")]), "base")
    errors: list[Exception] = []

    def writer(tag: str, lo: int):
        t = SnapshotTable(spark, path)
        try:
            for i in range(6):
                t.commit(
                    _kv(spark, [(lo + i, f"{tag}{i}")]),
                    f"{tag}{i}",
                    append=True,
                    max_retries=30,
                )
        except Exception as exc:  # surfaced after join
            errors.append(exc)

    ts = [
        threading.Thread(target=writer, args=("a", 100)),
        threading.Thread(target=writer, args=("b", 200)),
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errors, errors
    t = SnapshotTable(spark, path)
    rows = {r.k: r.v for r in t.read().collect()}
    want = {-1: "base"}
    want.update({100 + i: f"a{i}" for i in range(6)})
    want.update({200 + i: f"b{i}" for i in range(6)})
    assert rows == want  # no batch lost to the race
    vs = t.versions()
    assert [m["version"] for m in vs] == list(range(13))
    # linear history: every commit's parent is its predecessor
    assert all(m["parent"] == m["version"] - 1 for m in vs[1:])


def test_bucket_probe_type_mismatch_never_prunes(spark, tmp_path):
    """A point-lookup literal that does not cast to the partition
    column's type must disable bucket pruning, not hash NULL to a
    phantom bucket (xxhash64 of NULL is the SEED) — the result must
    still equal unpruned read + filter."""
    t = SnapshotTable(spark, str(tmp_path / "b"))
    t.commit_partitioned(
        spark.range(0, 100).selectExpr("id AS k", "concat('v', id) AS v"),
        "k",
        "bucket",
        n=4,
    )
    # the probe must not prune (phantom bucket); the read then fails
    # the same way the manual ANSI filter does — never silently empty
    rep = t.prune_report(("k", "=", "not-a-number"))
    assert rep["n_pruned"] == 0  # unprovable probe: conservative
    import pyspark.errors as _err

    with pytest.raises(_err.PySparkException):
        t.read(where=("k", "=", "not-a-number")).count()
    with pytest.raises(_err.PySparkException):
        t.read().filter(t.read()["k"] == "not-a-number").count()
    # a string literal that DOES cast still prunes exactly
    assert t.prune_report(("k", "=", "17"))["n_read"] == 1
    assert [r.v for r in t.read(where=("k", "=", "17")).collect()] == ["v17"]


def test_in_op_prunes_stats_and_buckets(spark, tmp_path):
    """The 'in' conjunct (the id-set takedown/lookup shape): stats
    prune files whose [min, max] excludes every listed value, bucket
    partitions prune files outside the listed values' buckets (one
    driver job for the whole list), and the result always equals
    unpruned read + filter — including NULL list members, which match
    no row."""
    t = _range_table(spark, tmp_path)  # 3 files: [0,10) [10,20) [20,30)
    rep = t.prune_report(("k", "in", [2, 5, 25]))
    assert rep == {"n_files": 3, "n_read": 2, "n_pruned": 1}
    got = sorted(r.k for r in t.read(where=("k", "in", [2, 5, 25])).collect())
    assert got == [2, 5, 25]
    # NULL members are ignored for pruning AND match no row
    got = sorted(
        r.k for r in t.read(where=("k", "in", [2, None])).collect()
    )
    assert got == [2]
    assert t.read(where=("k", "in", [])).count() == 0

    b = SnapshotTable(spark, str(tmp_path / "b"))
    b.commit_partitioned(
        spark.range(0, 200).selectExpr("id AS k", "concat('v', id) AS v"),
        "k",
        "bucket",
        n=8,
    )
    rep = b.prune_report(("k", "in", [3, 77]))
    assert rep["n_read"] <= 2  # at most the two values' buckets
    got = sorted(r.k for r in b.read(where=("k", "in", [3, 77])).collect())
    assert got == [3, 77]
    # identity partitions prune 'in' through the interval logic
    i = SnapshotTable(spark, str(tmp_path / "i"))
    i.commit_partitioned(
        spark.createDataFrame(
            [(1, "en"), (2, "de"), (3, "fr")], "k long, lang string"
        ),
        "lang",
        "identity",
    )
    rep = i.prune_report(("lang", "in", ["de", "fr"]))
    assert rep == {"n_files": 3, "n_read": 2, "n_pruned": 1}


def test_delete_where_in_op(spark, tmp_path):
    """delete_where(('k', 'in', ids)) — the inline id-set takedown:
    residual merge-on-read on scoped files, single-valued files fully
    covered, NULL rows kept."""
    t = _range_table(spark, tmp_path)
    t.delete_where(("k", "in", [5, 6, 25]))
    assert sorted(r.k for r in t.read().collect()) == [
        k for k in range(30) if k not in (5, 6, 25)
    ]
    m = t._manifest(t.current_version())
    # files [0,10) and [20,30) carry the residual; [10,20) was pruned
    assert len(m["deletes"]) == 1 and len(m["deletes"][0]["files"]) == 2
    # time travel unaffected
    assert len(t.read(t.current_version() - 1).collect()) == 30


def test_read_as_of_timestamp(spark, tmp_path):
    """TIMESTAMP AS OF: read(as_of=ts) resolves the largest version
    committed at or before ts; before the first commit raises; passing
    both version and as_of refuses."""
    import time as _time

    t = SnapshotTable(spark, str(tmp_path / "t"))
    before = _time.time() - 1
    t.commit(_kv(spark, [(0, "v0")]), "v0")
    _time.sleep(0.05)
    t0 = _time.time()
    _time.sleep(0.05)
    t.commit(_kv(spark, [(1, "v1")]), "v1")
    assert t.version_as_of(t0) == 0
    assert [r.v for r in t.read(as_of=t0).collect()] == ["v0"]
    assert [r.v for r in t.read(as_of=_time.time()).collect()] == ["v1"]
    with pytest.raises(ValueError, match="no version committed"):
        t.read(as_of=before)
    with pytest.raises(ValueError, match="not both"):
        t.read(version=0, as_of=t0)
    # composes with pruned reads
    assert t.read(as_of=t0, where=("k", "=", 0)).count() == 1


def test_bucket_probe_string_column_numeric_literal_never_prunes(
    spark, tmp_path
):
    """ADVICE r12 #2: against a STRING bucket column, Spark's filter
    casts the COLUMN to the numeric literal's type — so '05' satisfies
    s = 5 yet lives in bucket('05'), and a probe that hashed
    cast(5 AS string) = '5' would prune its file. Cross-type probes on
    string columns must be unprovable (no prune); pruned read must
    equal unpruned read + filter. Same-type probes keep pruning, and
    numeric columns keep accepting castable string literals (there the
    LITERAL side is cast, so the probe is faithful)."""
    t = SnapshotTable(spark, str(tmp_path / "s"))
    t.commit_partitioned(
        spark.createDataFrame(
            [("5", 1), ("05", 2), ("005", 3), ("7", 4)], "s string, k long"
        ),
        "s",
        "bucket",
        n=4,
    )
    # numeric literal on a string column: no prune, exact result
    rep = t.prune_report(("s", "=", 5))
    assert rep["n_pruned"] == 0
    got = sorted(r.k for r in t.read(where=("s", "=", 5)).collect())
    want = sorted(r.k for r in t.read().filter("s = 5").collect())
    assert got == want == [1, 2, 3]
    # string literal on the string column: prunes to one bucket's
    # file(s), string-equality semantics
    assert [r.k for r in t.read(where=("s", "=", "05")).collect()] == [2]
    assert t.prune_report(("s", "=", "05"))["n_read"] < rep["n_files"]
    # 'in' with mixed-type members: only unprovable members disable
    # file-level certainty — result still exact
    got = sorted(r.k for r in t.read(where=("s", "in", [5, "7"])).collect())
    want = sorted(r.k for r in t.read().filter("s = 5 OR s = '7'").collect())
    assert got == want


def test_bucket_probe_memoized_one_job_per_literal(spark, tmp_path):
    """Partition probes run ONE one-row job per distinct (spec,
    literal), not one per file: _bucket_values memoizes, so a
    many-file manifest costs O(conjunct) driver jobs."""
    t = SnapshotTable(spark, str(tmp_path / "m"))
    t.commit_partitioned(
        spark.range(0, 400).selectExpr("id AS k", "concat('v', id) AS v"),
        "k",
        "bucket",
        n=8,
    )
    calls = {"n": 0}
    orig = SnapshotTable._bucket_values

    def counting(self, vals, spec):
        calls["n"] += 1
        return orig(self, vals, spec)

    import scrappy_spark.sources.snapshots as S

    try:
        S.SnapshotTable._bucket_values = counting
        fresh = SnapshotTable(spark, str(tmp_path / "m"))
        assert fresh.prune_report(("k", "=", 17))["n_read"] == 1
        # 8 files probed for one literal: memo collapses to 1 real job
        probes = calls["n"]
        row = [r.v for r in fresh.read(where=("k", "=", 17)).collect()]
        assert row == ["v17"]
    finally:
        S.SnapshotTable._bucket_values = orig
    assert probes == 8  # called per file by _part_prune...
    assert len(fresh._bucket_probe_cache) == 1  # ...but one cached probe


def test_stage_build_params_concurrent_staging_first_wins(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12 #3: two builders racing the sidecar must not
    last-write-wins past the mixed-parameter guard. The publish is an
    os.link put-if-absent; a loser with the SAME params proceeds, a
    loser with DIFFERENT params refuses loudly."""
    import os as _os

    from scrappy_spark.sources.snapshots import stage_build_params

    path = str(tmp_path / "idx")
    stage_build_params(path, {"bands": 16, "rows": 8})
    # simulate the race window: the second builder's isfile check ran
    # before the first builder's link landed
    real_isfile = _os.path.isfile
    monkeypatch.setattr(
        _os.path,
        "isfile",
        lambda p: False if p.endswith(".build_params.json") else real_isfile(p),
    )
    # same params: loser verifies against the winner's sidecar and
    # proceeds (idempotent resume)
    stage_build_params(path, {"bands": 16, "rows": 8})
    # different params: loser refuses loudly instead of clobbering
    with pytest.raises(ValueError, match="different parameters"):
        stage_build_params(path, {"bands": 32, "rows": 4})
    monkeypatch.undo()
    # the winner's params survived the race
    with open(_os.path.join(path, ".build_params.json")) as f:
        assert json.load(f) == {"bands": 16, "rows": 8}
    # no leaked tmp files
    assert [
        n for n in _os.listdir(path) if n.endswith(".tmp")
    ] == []


def test_expire_grace_protects_staged_writer(spark, tmp_path, monkeypatch):
    """VERDICT r12 #1: a concurrent expire must not destroy a LIVE
    writer's landed-but-unpublished staging files. The writer here is
    paused AT the publish point (files staged, manifest not linked);
    expire runs with the default grace; the publish then completes and
    the version reads back intact."""
    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    t.commit(_kv(spark, [(0, "base")]), "base")

    orig = SnapshotTable._publish
    expired: list[dict] = []

    def pause_then_publish(self, *a, **k):
        if not expired:  # only the racing commit pauses
            expired.append(
                SnapshotTable(spark, path).expire(keep_last=1)
            )
        return orig(self, *a, **k)

    monkeypatch.setattr(SnapshotTable, "_publish", pause_then_publish)
    t.commit(_kv(spark, [(1, "staged")]), "racing append", append=True)
    monkeypatch.undo()
    # the expire ran mid-commit and deleted NOTHING of the writer's
    assert expired and expired[0]["deleted_files"] == []
    # the published version is fully readable (an ungated sweep would
    # have left a manifest referencing deleted files)
    assert {r.v for r in t.read().collect()} == {"base", "staged"}


def test_expire_orphan_grace_age_gate(spark, tmp_path):
    """Crash orphans older than the grace are swept; younger ones
    survive; grace=0 restores the immediate sweep. Dropped-version
    files are provably garbage and go immediately at ANY age."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3).coalesce(1), "v0")
    data = tmp_path / "t" / "data"
    old = data / "snap-old" / "part-0.parquet"
    young = data / "snap-young" / "part-0.parquet"
    for p in (old, young):
        os.makedirs(p.parent)
        p.write_bytes(b"orphan")
    two_days_ago = __import__("time").time() - 2 * 86400
    os.utime(old, (two_days_ago, two_days_ago))
    os.utime(old.parent, (two_days_ago, two_days_ago))
    # stale tmp manifest ages the same way
    mdir = tmp_path / "t" / "_manifests"
    (mdir / ".v9.aaaa.json.tmp").write_text("{ partial")
    (mdir / ".v9.bbbb.json.tmp").write_text("{ partial")
    os.utime(mdir / ".v9.aaaa.json.tmp", (two_days_ago, two_days_ago))

    rep = t.expire(keep_last=1)  # default grace: 24h
    assert [str(old)] == rep["deleted_files"]
    assert not old.parent.exists()  # aged orphan dir swept with it
    assert young.exists()  # young orphan: maybe a live writer
    assert not (mdir / ".v9.aaaa.json.tmp").exists()
    assert (mdir / ".v9.bbbb.json.tmp").exists()

    # a REPLACED version's files are dropped refs: swept immediately
    t.commit(spark.range(10, 13).coalesce(1), "v1 replace")
    rep = t.expire(keep_last=1)
    assert rep["dropped_versions"] == [0] and rep["deleted_files"]
    assert not (data / "snap-0").exists() or True  # token-named dirs
    assert sorted(r.id for r in t.read().collect()) == [10, 11, 12]

    # grace=0: the young orphan (and its tmp manifest) sweep now
    rep = t.expire(keep_last=1, orphan_grace_sec=0)
    assert str(young) in rep["deleted_files"]
    assert not young.parent.exists()
    assert not (mdir / ".v9.bbbb.json.tmp").exists()


def test_partition_spec_evolution_carries_and_reverts(spark, tmp_path):
    """Spec evolution (VERDICT r12 #3) end-to-end: an evolved table's
    spec LIST and per-file spec ids carry through rename / row-delete
    / plain append / expire; each file prunes by ITS OWN spec; a
    return to a prior spec REUSES its id; a replace resets the table
    to single-spec."""
    t = SnapshotTable(spark, str(tmp_path / "e"))
    df1 = spark.range(0, 250).selectExpr("id AS k", "concat('v', id) AS v")
    t.commit_partitioned(df1, "k", "truncate", width=50)  # 5 files
    df2 = spark.range(250, 500).selectExpr(
        "id AS k", "concat('v', id) AS v"
    )
    t.commit_partitioned(df2, "k", "bucket", n=8, append=True)  # +8

    # old data point: truncate prunes old 4-of-5, bucket prunes new
    # 7-of-8 → read 1 old + 1 new
    assert t.prune_report(("k", "=", 75)) == {
        "n_files": 13, "n_read": 2, "n_pruned": 11,
    }
    assert [r.v for r in t.read(where=("k", "=", 75)).collect()] == ["v75"]
    # new data point: ALL old truncate files disprove 300; 1-of-8 new
    assert t.prune_report(("k", "=", 300)) == {
        "n_files": 13, "n_read": 1, "n_pruned": 12,
    }
    assert [r.v for r in t.read(where=("k", "=", 300)).collect()] == ["v300"]
    # RANGE conjuncts prune truncate intervals but not buckets
    assert t.prune_report(("k", "between", (60, 99)))["n_read"] == 1 + 8

    # rename: specs are column-id keyed, both keep pruning
    t.rename_column("k", "key")
    assert t.prune_report(("key", "=", 75))["n_read"] == 2
    # row-level delete carries the spec list
    t.delete_where(("key", "=", 75))
    assert t.read(where=("key", "=", 75)).count() == 0
    m = t._manifest(t.current_version())
    assert len(m["partition_specs"]) == 2
    # plain append: value-less file, never pruned, specs carried
    t.commit(
        spark.range(1000, 1002).selectExpr(
            "id AS key", "concat('v', id) AS v"
        ).coalesce(1),
        append=True,
    )
    assert t.prune_report(("key", "=", 300)) == {
        "n_files": 14, "n_read": 2, "n_pruned": 12,
    }
    # expire keeps every live file across the evolved history
    t.expire(keep_last=1, orphan_grace_sec=0)
    assert t.read().count() == 501
    assert t.prune_report(("key", "=", 300))["n_read"] == 2

    # returning to a prior spec reuses its id (no spec-list growth)
    t.commit_partitioned(
        spark.range(500, 600).selectExpr(
            "id AS key", "concat('v', id) AS v"
        ),
        "key",
        "truncate",
        width=50,
        append=True,
    )
    m = t._manifest(t.current_version())
    assert len(m["partition_specs"]) == 2
    assert m["partition_spec"]["transform"] == "truncate"
    assert t.prune_report(("key", "=", 550))["n_read"] == 1 + 1 + 1
    # a REPLACE resets to the single new spec (simple format)
    t.commit_partitioned(
        spark.range(0, 40).selectExpr("id AS key", "concat('v', id) AS v"),
        "key",
        "identity",
        append=False,
    )
    m = t._manifest(t.current_version())
    assert "partition_specs" not in m
    assert m["partition_spec"]["transform"] == "identity"


def test_merge_keys_conditional_and_column_subset(spark, tmp_path):
    """Conditional MERGE (VERDICT r12 #7): WHEN MATCHED AND <cond over
    t/b> THEN UPDATE SET <update_cols only>; matched rows failing the
    condition keep their current values; unmatched batch rows insert
    whole; everything is ONE commit."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
            "k long, tag string, score long",
        ).coalesce(1),
        stats_cols=["k"],
    )
    batch = spark.createDataFrame(
        [(2, "B", 15), (3, "C", 99), (9, "I", 1)],
        "k long, tag string, score long",
    )
    # only improving scores update, and ONLY the score column; tag is
    # kept; k=9 inserts whole
    m = t.merge_keys(
        batch,
        ["k"],
        matched_condition="b.score > t.score",
        update_cols=["score"],
    )
    assert m["version"] == 1  # one commit
    rows = {r.k: (r.tag, r.score) for r in t.read().collect()}
    assert rows == {
        1: ("a", 10),   # unmatched by batch: untouched
        2: ("b", 20),   # matched, condition false (15 < 20): kept
        3: ("c", 99),   # matched, condition true: score only updated
        4: ("d", 40),
        9: ("I", 1),    # not matched: inserted whole
    }
    # time travel shows the pre-merge state
    assert {r.k: r.score for r in t.read(0).collect()}[3] == 30
    # the delete leg named exactly the passing key
    entry = t._manifest(1)["deletes"][-1]
    got = spark.read.parquet(*entry["delete_files"]).collect()
    assert [r.k for r in got] == [3]

    # replay with a t-dependent condition is a NO-OP: nothing passes
    # (scores equal), k=9 now matched — parent manifest returned, no
    # new version, no garbage manifest
    m2 = t.merge_keys(
        batch, ["k"], matched_condition="b.score > t.score",
        update_cols=["score"],
    )
    assert m2["version"] == 1 and t.current_version() == 1

    # condition-only (whole-row replace for passing keys)
    m3 = t.merge_keys(
        spark.createDataFrame(
            [(2, "Z", 1000), (4, "Z", 5)], "k long, tag string, score long"
        ),
        ["k"],
        matched_condition="b.score > t.score",
    )
    assert m3["version"] == 2
    rows = {r.k: (r.tag, r.score) for r in t.read().collect()}
    assert rows[2] == ("Z", 1000) and rows[4] == ("d", 40)


def test_merge_keys_conditional_validation_and_widening(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(1, "x")], "k long, tag string"
        ).coalesce(1)
    )
    batch = spark.createDataFrame(
        [(1, "y", 0.9)], "k long, tag string, quality double"
    )
    with pytest.raises(ValueError, match="key column"):
        t.merge_keys(batch, ["k"], update_cols=["k"])
    with pytest.raises(ValueError, match="not in the batch"):
        t.merge_keys(batch, ["k"], update_cols=["nope"])
    # widening subset update: quality is batch-only — the schema
    # widens, tag is KEPT
    t.merge_keys(batch, ["k"], update_cols=["quality"])
    row = t.read().collect()[0]
    assert (row.k, row.tag, row.quality) == (1, "x", 0.9)
    # NULL-key batch rows are pure inserts (never match)
    t.merge_keys(
        spark.createDataFrame(
            [(None, "n", 0.1)], "k long, tag string, quality double"
        ),
        ["k"],
        update_cols=["quality"],
    )
    assert sorted(
        (r.k if r.k is not None else -1) for r in t.read().collect()
    ) == [-1, 1]


def test_bloom_file_stats_prune_interleaved_keys(spark, tmp_path):
    """Per-file Bloom filters: the point-lookup pruning axis min/max
    stats cannot express when key ranges INTERLEAVE across files (two
    files both spanning [0, 1000) never range-prune), and bucket
    partitioning buys only by rewriting the layout. '=' and 'in'
    conjuncts drop bloom-excluded files; 'maybe present' keeps;
    designation inherits on append; ids are rename-proof; cross-type
    probes on string columns stay unprovable."""
    t = SnapshotTable(spark, str(tmp_path / "b"))
    even = spark.range(0, 1000, 2).selectExpr(
        "id AS k", "concat('v', id) AS v"
    ).coalesce(1)
    odd = spark.range(1, 1000, 2).selectExpr(
        "id AS k", "concat('v', id) AS v"
    ).coalesce(1)
    t.commit(even, stats_cols=["k"], bloom_cols=["k"])
    t.commit(odd, append=True)  # designation inherited: file gets bloom
    m = t._manifest(t.current_version())
    assert len(m["blooms"]) == 2 and m["bloom_ids"] == [1]
    # stats CANNOT prune these (ranges interleave); blooms can
    assert t.prune_report(("k", "=", 76)) == {
        "n_files": 2, "n_read": 1, "n_pruned": 1,
    }
    assert [r.v for r in t.read(where=("k", "=", 76)).collect()] == ["v76"]
    assert [r.v for r in t.read(where=("k", "=", 77)).collect()] == ["v77"]
    # 'in' spanning both parities keeps both files, result exact
    assert t.prune_report(("k", "in", [76, 77]))["n_read"] == 2
    got = sorted(r.k for r in t.read(where=("k", "in", [76, 77])).collect())
    assert got == [76, 77]
    # an absent key is definitely-absent EVERYWHERE: zero files read
    assert t.prune_report(("k", "=", 5555))["n_read"] == 0
    assert t.read(where=("k", "=", 5555)).count() == 0
    # rename-proof (column-id keyed) and carries through deletes
    t.rename_column("k", "key")
    assert t.prune_report(("key", "=", 76))["n_read"] == 1
    t.delete_where(("key", "=", 2))
    assert t.prune_report(("key", "=", 76))["n_read"] == 1
    assert t.read(where=("key", "=", 76)).count() == 1
    # unknown bloom col refused loudly
    with pytest.raises(ValueError, match="bloom_cols"):
        t2 = SnapshotTable(spark, str(tmp_path / "x"))
        t2.commit(even, bloom_cols=["nope"])


def test_bloom_string_column_and_type_guard(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "s"))
    a = spark.createDataFrame(
        [("alpha", 1), ("gamma", 3)], "s string, k long"
    ).coalesce(1)
    b = spark.createDataFrame(
        [("beta", 2), ("05", 5)], "s string, k long"
    ).coalesce(1)
    t.commit(a, bloom_cols=["s"])
    t.commit(b, append=True)
    assert t.prune_report(("s", "=", "beta")) == {
        "n_files": 2, "n_read": 1, "n_pruned": 1,
    }
    assert [r.k for r in t.read(where=("s", "=", "beta")).collect()] == [2]
    # cross-type literal on a string column: unprovable — Spark casts
    # the COLUMN, so '05' = 5 matches a row the bloom of '5' would
    # miss. No file may be pruned, and the read then fails the same
    # ANSI way the manual filter does (never silently empty).
    assert t.prune_report(("s", "=", 5))["n_pruned"] == 0
    import pyspark.errors as _err

    with pytest.raises(_err.PySparkException):
        t.read(where=("s", "=", 5)).count()
    # all-numeric strings: the cast comparison succeeds, the bloom
    # still must not have pruned the '05' file
    n = SnapshotTable(spark, str(tmp_path / "n"))
    n.commit(
        spark.createDataFrame([("5", 1)], "s string, k long").coalesce(1),
        bloom_cols=["s"],
    )
    n.commit(
        spark.createDataFrame([("05", 2)], "s string, k long").coalesce(1),
        append=True,
    )
    assert n.prune_report(("s", "=", 5))["n_pruned"] == 0
    got = sorted(r.k for r in n.read(where=("s", "=", 5)).collect())
    assert got == [1, 2]  # both representations match numerically


def test_multi_field_partition_spec(spark, tmp_path):
    """The full Iceberg spec shape: partition by (identity(lang),
    bucket(k, 4)). Each file carries a value VECTOR; a conjunct on
    EITHER column prunes by its own field; a point lookup on both
    prunes to one file; NULL components never prune their field;
    evolution from a single-field spec composes."""
    t = SnapshotTable(spark, str(tmp_path / "m"))
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], f"v{i}") for i in range(300)]
        + [(1000, None, "vnull")],
        "k long, lang string, v string",
    )
    t.commit_partitioned_multi(
        df, [("lang", "identity", None), ("k", "bucket", 4)]
    )
    m = t._manifest(0)
    assert "fields" in m["partition_spec"]
    assert len(m["partition_spec"]["fields"]) == 2
    n_files = len(m["files"])
    assert n_files >= 12  # 3 langs x 4 buckets (+ NULL-lang dirs)

    # identity field prunes to one lang's files
    rep = t.prune_report(("lang", "=", "de"))
    assert rep["n_read"] <= 5  # de's <=4 buckets + the NULL-lang file
    got = sorted(
        r.k for r in t.read(where=("lang", "=", "de")).collect()
    )
    assert got == [k for k in range(300) if k % 3 == 1]
    # bucket field prunes to ~1/4 of files
    rep_k = t.prune_report(("k", "=", 77))
    assert rep_k["n_read"] <= n_files // 3
    assert [r.v for r in t.read(where=("k", "=", 77)).collect()] == ["v77"]
    # BOTH conjuncts: one lang x one bucket (+ NULL-lang never pruned
    # on lang... it IS pruned by its bucket component when provable)
    kept, _ = t._pruned_files(
        m, [("lang", "=", "de"), ("k", "=", 77)]
    )
    assert len(kept) <= 2
    rows = t.read(
        where=[("lang", "=", "de"), ("k", "=", 77)]
    ).collect()
    assert [r.v for r in rows] == (["v77"] if 77 % 3 == 1 else [])
    # the NULL-lang row is reachable (its lang component never prunes
    # wrongly; its bucket component still prunes on k)
    assert [
        r.v for r in t.read(where=("k", "=", 1000)).collect()
    ] == ["vnull"]

    # evolution: single-field append on a multi-field table registers
    # a second spec; each file prunes under its own
    t.commit_partitioned(
        spark.createDataFrame(
            [(2000 + i, "pt", f"n{i}") for i in range(40)],
            "k long, lang string, v string",
        ),
        "k",
        "truncate",
        width=20,
        append=True,
    )
    m2 = t._manifest(1)
    assert len(m2["partition_specs"]) == 2
    # old-data point: multi spec prunes old files, truncate prunes ALL
    # new files (2000+ intervals disprove 77)
    kept, _ = t._pruned_files(m2, ("k", "=", 77))
    assert len(kept) <= n_files // 3
    assert [r.v for r in t.read(where=("k", "=", 77)).collect()] == ["v77"]
    # new-data point: all old bucket files keep (bucket(2010) maybe) —
    # but the truncate files prune to 1
    assert [
        r.v for r in t.read(where=("k", "=", 2010)).collect()
    ] == ["n10"]
    # validation
    with pytest.raises(ValueError, match="no fields"):
        t.commit_partitioned_multi(df, [])
    with pytest.raises(ValueError, match="needs n >= 2"):
        t.commit_partitioned_multi(df, [("k", "bucket", 1)])


# ---------------------------------------------------------------------------
# Branches & tags (Iceberg refs): forked heads, pinned versions, ref-aware GC
# ---------------------------------------------------------------------------


def test_branch_fork_isolated_heads(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5), "v0")
    dev = t.create_branch("dev")
    # fork is metadata-only: same file paths, no data copied
    assert dev._manifest(0)["files"] == t._manifest(0)["files"]
    assert dev._manifest(0)["forked_from"] == {"branch": "main", "version": 0}
    dev.commit(spark.range(10, 15), "dev append", append=True)
    t.commit(spark.range(20, 25), "main append", append=True)
    assert _ids(t.read()) == list(range(5)) + list(range(20, 25))
    assert _ids(dev.read()) == list(range(5)) + list(range(10, 15))
    # independent time travel per branch
    assert _ids(dev.read(version=0)) == list(range(5))
    assert t.branches() == ["main", "dev"] or t.branches() == ["main", "dev"]


def test_branch_create_exactly_once_and_validation(spark, tmp_path):
    from scrappy_spark.sources.snapshots import CommitConflict

    t = SnapshotTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="empty table"):
        t.create_branch("dev")
    t.commit(spark.range(3), "v0")
    t.create_branch("dev")
    with pytest.raises(CommitConflict, match="already exists"):
        t.create_branch("dev")
    for bad in ("main", "HEAD", ".hidden", "a/b", ""):
        with pytest.raises(ValueError, match="invalid ref name"):
            t.create_branch(bad)
    with pytest.raises(ValueError, match="invalid ref name"):
        t.drop_branch("main")
    with pytest.raises(ValueError, match="no branch"):
        t.drop_branch("nope")


def test_tag_pin_protects_expire(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5), "v0")
    t.tag("baseline")
    t.commit(spark.range(10, 15), "v1 replace")
    t.commit(spark.range(20, 25), "v2 replace")
    r = t.expire(keep_last=1, orphan_grace_sec=0)
    # v1 dropped; v0 survives via the tag, v2 is the head
    assert r["dropped_versions"] == [1]
    assert _ids(t.read_tag("baseline")) == list(range(5))
    assert _ids(t.read(version=0)) == list(range(5))
    # retarget is delete + recreate, never silent
    from scrappy_spark.sources.snapshots import CommitConflict

    with pytest.raises(CommitConflict, match="already exists"):
        t.tag("baseline", 2)
    t.delete_tag("baseline")
    with pytest.raises(ValueError, match="no tag"):
        t.delete_tag("baseline")
    t.tag("baseline", 2)
    assert t.tags()["baseline"]["version"] == 2
    # untagged now: the old pinned version expires normally
    r = t.expire(keep_last=1, orphan_grace_sec=0)
    assert 0 in r["dropped_versions"]
    with pytest.raises(FileNotFoundError):
        t._manifest(0)


def test_tag_missing_version_raises(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="empty"):
        t.tag("x")
    t.commit(spark.range(3), "v0")
    with pytest.raises(FileNotFoundError):
        t.tag("x", 7)
    with pytest.raises(ValueError, match="no tag"):
        t.read_tag("ghost")


def test_expire_protects_other_branch_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5), "v0")
    v0_files = t._manifest(0)["files"]
    dev = t.create_branch("dev")
    t.commit(spark.range(10, 15), "v1 replace")
    # main's expire drops v0's manifest but NOT its files: dev's fork
    # still references them (data is shared across branches)
    r = t.expire(keep_last=1, orphan_grace_sec=0)
    assert r["dropped_versions"] == [0] and r["deleted_files"] == []
    assert all(os.path.exists(p) for p in v0_files)
    assert _ids(dev.read()) == list(range(5))
    # dropping the branch releases them to the next aged sweep
    t.drop_branch("dev")
    r = t.expire(keep_last=1, orphan_grace_sec=0)
    assert sorted(r["deleted_files"]) == sorted(v0_files)
    assert not any(os.path.exists(p) for p in v0_files)


def test_fast_forward_clean_diverged_force(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5), "v0")
    dev = t.create_branch("dev")
    dev.commit(spark.range(10, 15), "dev work", append=True)
    m = t.fast_forward("dev")
    assert m["version"] == 1 and m["parent"] == 0
    assert m["merged_from"] == {"branch": "dev", "version": 1}
    assert _ids(t.read()) == list(range(5)) + list(range(10, 15))
    # promotion shares the branch's files — no data copied
    assert m["files"] == dev._manifest(1)["files"]
    # diverged: main advanced past the fork point
    dev2 = t.create_branch("dev2")
    dev2.commit(spark.range(30, 32), "w", append=True)
    t.commit(spark.range(20, 25), "main moved on", append=True)
    with pytest.raises(ValueError, match="not a clean fast-forward"):
        t.fast_forward("dev2")
    m3 = t.fast_forward("dev2", force=True, message="explicit replace")
    # dev2 forked from main@1 (which already had 10..14), then added
    # 30..31; the force-replace drops main's later 20..24 append
    assert _ids(t.read()) == (
        list(range(5)) + list(range(10, 15)) + list(range(30, 32))
    )
    # the overwritten main commits stay time-travelable until expire
    assert _ids(t.read(version=m3["parent"])) == (
        list(range(5)) + list(range(10, 15)) + list(range(20, 25))
    )


def test_fast_forward_concurrent_commit_conflicts(spark, tmp_path, monkeypatch):
    from scrappy_spark.sources.snapshots import CommitConflict

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5), "v0")
    dev = t.create_branch("dev")
    dev.commit(spark.range(10, 12), "w", append=True)
    # interleave: a concurrent writer lands v1 on main after this
    # handle read its head — the link gate must surface it loudly
    real = SnapshotTable.current_version

    def stale(self):
        v = real(self)
        return 0 if self.branch == "main" and v is not None else v

    monkeypatch.setattr(SnapshotTable, "current_version", stale)
    t2 = SnapshotTable(spark, str(tmp_path / "t"))
    monkeypatch.undo()
    t.commit(spark.range(20, 22), "concurrent", append=True)  # main v1
    monkeypatch.setattr(SnapshotTable, "current_version", stale)
    with pytest.raises(CommitConflict, match="concurrent writer"):
        t2.fast_forward("dev")
    monkeypatch.undo()
    # re-run against the true head succeeds (force: main advanced)
    t2.fast_forward("dev", force=True)
    assert _ids(t.read()) == list(range(5)) + list(range(10, 12))


def test_branch_carries_stats_deletes_and_specs(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("g")
    )
    t.commit(df.repartitionByRange(4, "id"), "v0", stats_cols=["id"])
    t.delete_where(("id", "=", 7))
    dev = t.create_branch("dev")
    # pending delete applies on the branch read too
    assert 7 not in [r["id"] for r in dev.read().collect()]
    # stats designation carried: pruning works on the fork
    rep = dev.prune_report(("id", "=", 3))
    assert rep["n_read"] < rep["n_files"]
    # read_tag honours where-pruning as well
    dev.tag("pinned")
    got = sorted(
        r["id"] for r in t.read_tag("pinned", where=("id", "<", 5)).collect()
    )
    assert got == [0, 1, 2, 3, 4]


def test_add_blooms_backfill_and_incremental(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(0, 50).select((F.col("id") * 3).alias("k")).coalesce(1),
        "v0",
    )
    # no blooms yet: an absent key cannot prune
    assert t.prune_report(("k", "=", 1))["n_read"] == 1
    t.add_blooms(["k"])
    assert t.current_version() == 1
    m1 = t._manifest(1)
    assert m1["files"] == t._manifest(0)["files"]  # metadata-only
    # absent key (1 is not a multiple of 3): bloom proves it, 0 files
    assert t.prune_report(("k", "=", 1))["n_read"] == 0
    assert t.prune_report(("k", "=", 42))["n_read"] == 1
    assert [r.k for r in t.read(where=("k", "=", 42)).collect()] == [42]
    # incremental: append a file, re-run — the old file's bloom is
    # reused byte-for-byte, only the new file is scanned
    t.commit(
        spark.range(50, 60).select((F.col("id") * 3).alias("k")).coalesce(1),
        "v2",
        append=True,
    )
    t.add_blooms(["k"])
    m3 = t._manifest(t.current_version())
    old_file = t._manifest(0)["files"][0]
    assert m3["blooms"][old_file] == m1["blooms"][old_file]
    assert all(p in m3["blooms"] for p in m3["files"])
    assert t.prune_report(("k", "=", 1))["n_read"] == 0
    with pytest.raises(ValueError, match="no column"):
        t.add_blooms(["ghost"])


def test_add_blooms_rename_proof(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(0, 20).select((F.col("id") * 2).alias("old")).coalesce(1),
        "v0",
    )
    t.rename_column("old", "new")
    # backfill under the CURRENT name scans the file under its
    # write-time name and keys the bloom by column id
    t.add_blooms(["new"])
    assert t.prune_report(("new", "=", 5))["n_read"] == 0
    assert t.prune_report(("new", "=", 6))["n_read"] == 1


# ---------------------------------------------------------------------------
# Metadata tables: files_df / history_df / refs_df (Iceberg introspection)
# ---------------------------------------------------------------------------


def test_files_df_inventory(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(0, 100).selectExpr("id AS k").repartition(2),
        stats_cols=["k"],
    )
    t.add_blooms(["k"])
    fdf = t.files_df()
    rows = fdf.collect()
    assert len(rows) == 2
    assert sum(r.row_count for r in rows) == 100
    assert all(r.size_bytes > 0 for r in rows)
    assert all(r.has_stats and r.has_bloom for r in rows)
    # a version BEFORE the bloom backfill shows no blooms
    assert all(not r.has_bloom for r in t.files_df(version=0).collect())
    # partitioned commits expose spec id + value
    p = SnapshotTable(spark, str(tmp_path / "p"))
    p.commit_partitioned(
        spark.range(0, 40).selectExpr("id AS k"), "k", "truncate", width=20
    )
    prow = p.files_df().collect()
    assert len(prow) == 2
    assert sorted(r.partition for r in prow) == ["0", "20"]
    assert all(r.partition_spec_id is not None for r in prow)


def test_history_and_refs_df(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 10).selectExpr("id AS k").coalesce(1))
    t.commit(
        spark.range(10, 20).selectExpr("id AS k").coalesce(1), append=True
    )
    t.delete_where(("k", "=", 3))
    t.tag("stable", 1)
    dev = t.create_branch("dev")
    t.fast_forward("dev", force=True)
    h = {r.version: r for r in t.history_df().collect()}
    assert [h[v].n_files for v in sorted(h)] == [1, 2, 2, 2]
    assert h[2].n_pending_deletes == 1 and h[0].parent is None
    assert h[3].merged_from is not None and "dev" in h[3].merged_from
    assert dev.history_df().collect()[0].forked_from is not None
    refs = {(r.kind, r.name): r for r in t.refs_df().collect()}
    assert refs[("branch", "main")].version == 3
    assert refs[("branch", "dev")].version == 0
    assert refs[("tag", "stable")].version == 1
    assert refs[("tag", "stable")].branch == "main"


def test_sqlapi_snapshot_metadata_views(spark, tmp_path):
    from scrappy_spark.sqlapi import register_snapshot

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 30).selectExpr("id AS k").repartition(3))
    register_snapshot(spark, t.path, "snap", metadata=True)
    assert spark.sql("SELECT count(*) c FROM snap").collect()[0].c == 30
    got = spark.sql(
        "SELECT count(*) AS files, sum(row_count) AS rows FROM snap_files"
    ).collect()[0]
    assert got.files == 3 and got.rows == 30
    assert (
        spark.sql("SELECT max(version) v FROM snap_history").collect()[0].v
        == 0
    )
    assert (
        spark.sql(
            "SELECT version FROM snap_refs WHERE kind='branch'"
        ).collect()[0].version
        == 0
    )


def test_rollback_and_expire_dry_run(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5), "v0")
    t.commit(spark.range(10, 15), "v1 bad replace")
    m = t.rollback(0)
    assert m["version"] == 2 and m["rolled_back_to"] == 0
    assert _ids(t.read()) == list(range(5))
    # the bad commit stays time-travelable until expire
    assert _ids(t.read(version=1)) == list(range(10, 15))
    # rollback to head is a no-op (no junk version)
    assert t.rollback(2)["version"] == 2 and t.current_version() == 2
    with pytest.raises(FileNotFoundError):
        t.rollback(9)
    # dry-run reports without touching: v1's files would go (v0's are
    # the head content again)
    rep = t.expire(keep_last=1, orphan_grace_sec=0, dry_run=True)
    assert rep["dropped_versions"] == [0, 1]
    assert len(rep["deleted_files"]) >= 1
    assert all(os.path.exists(p) for p in rep["deleted_files"])
    assert [m["version"] for m in t.versions()] == [0, 1, 2]
    # the real run then deletes exactly what the dry run predicted
    real = t.expire(keep_last=1, orphan_grace_sec=0)
    assert real == rep
    assert not any(os.path.exists(p) for p in rep["deleted_files"])
    assert _ids(t.read()) == list(range(5))


def test_read_incremental_changes_since(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5), "v0")
    t.commit(spark.range(10, 15), "v1", append=True)
    t.commit(spark.range(20, 25), "v2", append=True)
    assert _ids(t.read_incremental(0)) == list(range(10, 15)) + list(
        range(20, 25)
    )
    assert _ids(t.read_incremental(1, 2)) == list(range(20, 25))
    assert _ids(t.read_incremental(2)) == []
    with pytest.raises(ValueError, match="ahead of"):
        t.read_incremental(5)
    # a row-level delete keeps files: still an append-only range, and
    # the delete applies to the new files it scopes
    t.delete_where(("id", "=", 22))
    assert _ids(t.read_incremental(1)) == [20, 21, 23, 24]
    # a rewrite in the range raises loudly
    t.apply_deletes()
    with pytest.raises(ValueError, match="not an append-only range"):
        t.read_incremental(0)
    # ranges after the rewrite work again
    v = t.current_version()
    t.commit(spark.range(30, 32), "v5", append=True)
    assert _ids(t.read_incremental(v)) == [30, 31]


def test_commit_summary_in_history(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 7).coalesce(1), "v0")
    t.commit(spark.range(10, 13).coalesce(1), "v1", append=True)
    t.rename_column("id", "k")  # metadata-only: no summary
    t.commit_partitioned_multi(
        spark.range(0, 20).selectExpr("id AS k"),
        [("k", "truncate", 10)],
        "v3 partitioned replace",
    )
    h = {r.version: r for r in t.history_df().collect()}
    assert (h[0].added_files, h[0].added_rows) == (1, 7)
    assert (h[1].added_files, h[1].added_rows) == (1, 3)
    assert h[2].added_rows is None
    assert h[3].added_rows == 20 and h[3].added_files == 2


# ---------------------------------------------------------------------------
# Round-14 review fixes: ref/GC races, no-op guards, metadata honesty
# ---------------------------------------------------------------------------


def test_drop_branch_refused_while_tagged(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(3), "v0")
    dev = t.create_branch("dev")
    dev.tag("release")
    with pytest.raises(ValueError, match="pin branch 'dev'"):
        t.drop_branch("dev")
    t.delete_tag("release")
    t.drop_branch("dev")
    assert t.branches() == ["main"]


def test_expire_restores_manifest_for_racing_tag(spark, tmp_path, monkeypatch):
    """A tag linked between expire's first tags() read and its
    manifest drop must not lose its pinned version: the post-drop
    re-read restores the manifest and keeps the files."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 4).coalesce(1), "v0")
    t.commit(spark.range(10, 14).coalesce(1), "v1 replace")
    real_tags = SnapshotTable.tags
    calls = {"n": 0}

    def racing(self):
        out = real_tags(self)
        calls["n"] += 1
        if calls["n"] == 1:
            return {}  # first read: the tag has not linked yet
        # the tag "links" between the reads
        if not out:
            real_tags(self)  # no-op, keeps shape
            SnapshotTable.tag.__wrapped__ if False else None
            t2 = SnapshotTable(self.spark, self.path)
            try:
                t2._link_json(
                    os.path.join(t2._tags_dir(), "pin0.json"),
                    {
                        "name": "pin0",
                        "branch": "main",
                        "version": 0,
                        "created_at": 0.0,
                    },
                    "exists",
                )
            except Exception:
                pass
            out = real_tags(self)
        return out

    monkeypatch.setattr(SnapshotTable, "tags", racing)
    rep = t.expire(keep_last=1, orphan_grace_sec=0)
    monkeypatch.undo()
    # the raced version was restored, not dropped
    assert rep["dropped_versions"] == []
    assert _ids(t.read(version=0)) == [0, 1, 2, 3]
    assert _ids(t.read_tag("pin0")) == [0, 1, 2, 3]
    # with the tag gone, the next expire drops it normally
    t.delete_tag("pin0")
    rep = t.expire(keep_last=1, orphan_grace_sec=0)
    assert rep["dropped_versions"] == [0]


def test_tag_and_branch_from_expired_version_fail_loud(spark, tmp_path):
    """The ref-vs-expire handshake: a ref whose source manifest is
    gone post-link rolls itself back and raises, never publishing a
    ref to deleted data."""
    from scrappy_spark.sources.snapshots import CommitConflict

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3).coalesce(1), "v0")
    t.commit(spark.range(5, 8).coalesce(1), "v1 replace")
    # simulate "expire dropped the manifest just after our read":
    # remove v0's manifest between version resolution and the link
    real = SnapshotTable._link_json

    def dropping(self, target, payload, conflict):
        try:
            os.remove(os.path.join(t._mdir, "v0.json"))
        except FileNotFoundError:
            pass
        return real(self, target, payload, conflict)

    import unittest.mock as mock

    with mock.patch.object(SnapshotTable, "_link_json", dropping):
        with pytest.raises(CommitConflict, match="expired concurrently"):
            t.tag("doomed", 0)
        assert "doomed" not in t.tags()
    # restore for the branch case
    t3 = SnapshotTable(spark, str(tmp_path / "u"))
    t3.commit(spark.range(0, 3).coalesce(1), "v0")
    t3.commit(spark.range(5, 8).coalesce(1), "v1 replace")

    def dropping3(self, target, payload, conflict):
        try:
            os.remove(os.path.join(t3._mdir, "v0.json"))
        except FileNotFoundError:
            pass
        return real(self, target, payload, conflict)

    with mock.patch.object(SnapshotTable, "_link_json", dropping3):
        with pytest.raises(CommitConflict, match="expired concurrently"):
            t3.create_branch("doomed", version=0)
    assert t3.branches() == ["main"]


def test_add_blooms_noop_returns_head(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 9).selectExpr("id AS k").coalesce(1))
    t.add_blooms(["k"])
    v = t.current_version()
    m = t.add_blooms(["k"])  # fully covered: no junk version
    assert m["version"] == v and t.current_version() == v


def test_files_df_single_spec_id_is_dash(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit_partitioned(
        spark.range(0, 20).selectExpr("id AS k"), "k", "truncate", width=10
    )
    got = {r.partition_spec_id for r in t.files_df().collect()}
    assert got == {"-"}  # never the string "None"


def test_register_snapshot_as_of_metadata_consistent(spark, tmp_path):
    import time as _time

    from scrappy_spark.sqlapi import register_snapshot

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5).coalesce(1), "v0")
    _time.sleep(0.05)
    cut = _time.time()
    _time.sleep(0.05)
    t.commit(spark.range(0, 50).repartition(3), "v1 replace")
    register_snapshot(spark, t.path, "pinned", as_of=cut, metadata=True)
    assert spark.sql("SELECT count(*) c FROM pinned").collect()[0].c == 5
    got = spark.sql(
        "SELECT count(*) f, sum(row_count) r FROM pinned_files"
    ).collect()[0]
    # the files view pins the SAME historical version as the data view
    assert got.f == 1 and got.r == 5


def test_rollback_to_expired_version_fails_loud(spark, tmp_path):
    from unittest import mock

    from scrappy_spark.sources.snapshots import CommitConflict

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3).coalesce(1), "v0")
    t.commit(spark.range(5, 8).coalesce(1), "v1 replace")
    real = SnapshotTable._link_json

    def dropping(self, target, payload, conflict):
        real(self, target, payload, conflict)
        os.remove(os.path.join(t._mdir, "v0.json"))  # racing expire

    with mock.patch.object(SnapshotTable, "_link_json", dropping):
        with pytest.raises(CommitConflict, match="expired concurrently"):
            t.rollback(0)
    # the aborted rollback left no junk head
    assert t.current_version() == 1
    assert _ids(t.read()) == [5, 6, 7]


def test_fast_forward_after_fork_record_expired(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3).coalesce(1), "v0")
    dev = t.create_branch("dev")
    dev.commit(spark.range(5, 8).coalesce(1), "w", append=True)
    dev.commit(spark.range(8, 11).coalesce(1), "w2", append=True)
    dev.expire(keep_last=1, orphan_grace_sec=0)  # drops dev v0+v1
    with pytest.raises(ValueError, match="fork record .* was expired"):
        t.fast_forward("dev")
    t.fast_forward("dev", force=True)
    assert _ids(t.read()) == list(range(3)) + list(range(5, 11))


def test_add_blooms_marks_unbloomable_files_noop(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(spark, str(tmp_path / "t"))
    # file 1 predates column x; file 2 has x all NULL; file 3 has data
    t.commit(spark.range(0, 5).selectExpr("id AS k").coalesce(1), "v0")
    t.commit(
        spark.range(5, 10).select(
            F.col("id").alias("k"), F.lit(None).cast("long").alias("x")
        ).coalesce(1),
        "v1",
        append=True,
    )
    t.commit(
        spark.range(10, 15).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("x")
        ).coalesce(1),
        "v2",
        append=True,
    )
    t.add_blooms(["x"])
    v = t.current_version()
    # the no-x and all-NULL files carry payload-less markers: the
    # next call is a true no-op (no junk version, no rescans)
    assert t.add_blooms(["x"])["version"] == v
    assert t.current_version() == v
    # markers never prune; the real bloom still does
    rep_absent = t.prune_report(("x", "=", 21))
    assert rep_absent["n_read"] == 2  # marker files kept, real bloom prunes
    assert [r.k for r in t.read(where=("x", "=", 20)).collect()] == [10]


def test_expire_keeps_rollback_target_files(spark, tmp_path):
    """rollback re-references old files as the head — the next expire
    must keep them (head manifest references them)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3).coalesce(1), "v0")
    t.commit(spark.range(5, 8).coalesce(1), "v1 replace")
    t.rollback(0)
    rep = t.expire(keep_last=1, orphan_grace_sec=0)
    assert sorted(rep["dropped_versions"]) == [0, 1]
    assert _ids(t.read()) == [0, 1, 2]


def test_register_snapshot_since_incremental_view(spark, tmp_path):
    from scrappy_spark.sqlapi import register_snapshot

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5).coalesce(1), "v0")
    t.commit(spark.range(10, 15).coalesce(1), "v1", append=True)
    t.commit(spark.range(20, 25).coalesce(1), "v2", append=True)
    register_snapshot(spark, t.path, "delta", since=0)
    got = sorted(
        r.id for r in spark.sql("SELECT id FROM delta").collect()
    )
    assert got == list(range(10, 15)) + list(range(20, 25))
    register_snapshot(spark, t.path, "delta01", since=0, version=1)
    assert spark.sql("SELECT count(*) c FROM delta01").collect()[0].c == 5
