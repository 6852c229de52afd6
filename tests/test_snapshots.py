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
