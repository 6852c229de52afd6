"""Takedown-capable stored dedup indexes: the gram and MinHash legs.

``ann_index.IvfPqIndex`` gave the vector index its production
lifecycle (build / serve / append / delete / vacuum). This module is
the same move for the OTHER two stored index families the engine
serves incrementally (VERDICT r9 #4 / r10 #4):

- :class:`GramIndex` — the persisted face of
  ``curation.exact_substring_index``. The live index is still the
  membership set ``exact_substring_dedup_incremental`` consumes, but
  it is stored as an append-only SIGNED LEDGER of per-gram
  reference-count deltas plus per-doc membership deltas, so a
  right-to-be-forgotten takedown is one O(request) append — and a
  gram shared with surviving documents stays live (refcount, not
  blind retraction: doc A's removal must not delete the grams doc B
  also holds). Every mutation is ONE commit to ONE snapshot table, so
  there is no multi-table crash seam at all (the ADVICE r10 #2 class
  of drift cannot arise): a crash before HEAD advances is a no-op.

- :class:`MinHashIndex` — the persisted signature table
  ``pipelines.dedup_corpus_incremental`` dedups daily batches
  against. Signatures are keyed by ``doc_id``, so takedown is exactly
  the ``IvfPqIndex`` shape: tombstone append (O(request)), live reads
  anti-join a broadcast tombstone list, ``vacuum`` physically drops
  the rows, and ``append`` heals stale tombstones left by a crashed
  vacuum.

Both carry the delete-vs-rebuild identity their declared queries pin
under the hash gate: after ``delete(D)`` the live artifact equals the
index built from scratch over corpus∖D.

Scale shape: the gram ledger is the only gram-sized object and is
only ever appended (vacuum rewrites it linearly); materializing the
live set is one partial-agg groupBy on the 16-byte gram — the same
key, same shuffle the incremental dedup join prices anyway. Member
rows are one long per doc. MinHash signatures are k rows per doc,
appended; tombstones are takedown-request-sized and broadcast.

Reference parity: none (the reference re-reads and rewrites its whole
CSV store per merge, scrappy.py:350); this closes the takedown loop
on the round-9 extension families.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.localrel import local_relation as _local_relation

from ..sources.snapshots import SnapshotTable
from . import curation as CUR
from . import dedup_approx as DA

_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _require_integral_id(docs: DataFrame, id_col: str, ctx: str) -> None:
    """The gram ledger stores doc ids as ``long`` and every refcount
    guard casts through it — a non-numeric ``id_col`` would silently
    cast to NULL, collapsing all members onto one NULL row and
    defeating the double-index/double-delete guards the design
    depends on (ADVICE r11 #5). Fail loudly at the door instead."""
    dt = dict(docs.dtypes).get(id_col)
    if dt is None:
        raise ValueError(f"{ctx}: no column {id_col!r} ({docs.columns})")
    if dt not in _INTEGRAL:
        raise ValueError(
            f"{ctx}: id column {id_col!r} has type {dt} — the gram "
            "ledger requires an integral id (tinyint/smallint/int/"
            "bigint); cast or map your ids to integers first"
        )


class GramIndex:
    """Stored ExactSubstr gram index with refcounted takedown.

    One snapshot table, the LEDGER, holds two row kinds:

    - ``('gram', gram, NULL, ±n)`` — per distinct gram, the signed
      count of distinct documents contributing it in this commit;
    - ``('member', NULL, doc_id, ±1)`` — document membership, the
      guard that keeps refcounts honest (double-index and
      double-delete are refused, not silently miscounted).

    Live gram set = grams with positive delta-sum; live members =
    doc_ids with positive delta-sum. ``build``/``append`` write
    positive rows, ``delete`` writes the exact negation for the
    removed docs, ``vacuum`` compacts the ledger to its net state.
    Each is a single atomic snapshot commit.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.ledger = SnapshotTable(spark, os.path.join(path, "ledger"))
        self._meta: dict | None = None

    # ------------------------------------------------------------- meta

    @property
    def meta(self) -> dict:
        if self._meta is None:
            with open(os.path.join(self.path, "meta.json")) as f:
                self._meta = json.load(f)
        return self._meta

    def exists(self) -> bool:
        return os.path.isfile(os.path.join(self.path, "meta.json"))

    # ------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        path: str,
        docs: DataFrame,
        min_len: int = 30,
        id_col: str = "doc_id",
        text_col: str = "text",
        long_doc: str = "raise",
    ) -> "GramIndex":
        """Index a corpus: one commit of its +gram/+member deltas. The
        meta manifest lands LAST, so ``exists()`` implies a complete
        index — a crash mid-build leaves no readable index, and a
        RETRIED build reuses a ledger the crashed attempt already
        committed (the deltas are a pure function of the corpus)
        instead of recommitting it — the retry cannot bump version
        numbers a caller's resume logic may key on. Params (+ corpus
        fingerprint) are STAGED before the first commit and verified
        on retry, so reuse with different parameters or a changed
        corpus refuses loudly instead of pairing fresh meta with stale
        data (ADVICE r11 #3)."""
        from ..sources.snapshots import corpus_fingerprint, stage_build_params

        idx = cls(spark, path)
        meta = {
            "min_len": int(min_len),
            "id_col": id_col,
            "text_col": text_col,
            "long_doc": long_doc,
        }
        idx._meta = meta
        stage_build_params(
            path, dict(meta, corpus_fp=corpus_fingerprint(docs, id_col))
        )
        if idx.ledger.current_version() is None:
            idx.ledger.commit(idx._delta_rows(docs, +1), "index base corpus")
        tmp = os.path.join(path, ".meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.rename(tmp, os.path.join(path, "meta.json"))
        return idx

    def _delta_rows(self, docs: DataFrame, sign: int) -> DataFrame:
        """The ledger rows a doc batch contributes: per-gram signed
        distinct-doc counts plus per-doc membership markers. Uses the
        same gram stage as the dedup itself, so the chunked and plain
        modes produce identical per-doc gram SETS (the seam property)
        and interoperate in one ledger.

        Duplicate ids WITHIN the batch are refused loudly: the gram
        stage counts a doc's grams once (distinct per doc) while a
        naive member row per INPUT row would count it twice — the
        resulting member/gram refcount skew would let a later
        double-delete retract other documents' shared grams, the exact
        corruption the refcount design exists to prevent."""
        m = self.meta
        id_col, text_col = m["id_col"], m["text_col"]
        _require_integral_id(docs, id_col, "gram index")
        dup = (
            docs.groupBy(id_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"gram index batch contains doc {dup[0][0]} more than "
                "once — ids must be unique within a batch"
            )
        if m["long_doc"] == "chunk":
            g, _ = CUR._lgram_stage_chunked(
                docs, m["min_len"], id_col, text_col
            )
        else:
            g, _ = CUR._lgram_stage(docs, m["min_len"], id_col, text_col)
        gram_rows = (
            g.select(F.col(id_col).alias("doc_id"), "gram")
            .distinct()
            .groupBy("gram")
            .agg((F.lit(sign) * F.count("*")).cast("long").alias("delta"))
            .select(
                F.lit("gram").alias("kind"),
                "gram",
                F.lit(None).cast("long").alias("doc_id"),
                "delta",
            )
        )
        member_rows = docs.select(
            F.lit("member").alias("kind"),
            F.lit(None).cast("binary").alias("gram"),
            F.col(id_col).cast("long").alias("doc_id"),
            F.lit(sign).cast("long").alias("delta"),
        )
        return gram_rows.unionByName(member_rows)

    # ---------------------------------------------------------- serving

    def grams(self) -> DataFrame:
        """The live membership set — the exact DataFrame
        ``exact_substring_dedup_incremental(batch, idx.grams())``
        consumes. One partial-agg groupBy on the gram key."""
        return (
            self.ledger.read()
            .filter(F.col("kind") == "gram")
            .groupBy("gram")
            .agg(F.sum("delta").alias("__refs"))
            .filter(F.col("__refs") > 0)
            .select("gram")
        )

    def members(self) -> DataFrame:
        """Live indexed doc_ids (one column, ``doc_id``)."""
        return (
            self.ledger.read()
            .filter(F.col("kind") == "member")
            .groupBy("doc_id")
            .agg(F.sum("delta").alias("__refs"))
            .filter(F.col("__refs") > 0)
            .select("doc_id")
        )

    # --------------------------------------------------------- mutation

    def append(self, docs: DataFrame) -> dict:
        """Index a new batch — O(batch) gram work, one append commit.
        Re-indexing a live member is refused (it would double its
        grams' refcounts and make a later takedown leave residue)."""
        id_col = self.meta["id_col"]
        _require_integral_id(docs, id_col, "gram index append")
        clash = (
            docs.select(F.col(id_col).cast("long").alias("doc_id"))
            .join(self.members(), "doc_id", "left_semi")
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"append: doc {clash[0][0]} is already indexed — "
                "takedown refcounts require each doc indexed exactly once"
            )
        return self.ledger.commit(
            self._delta_rows(docs, +1), "append batch", append=True
        )

    def delete(self, docs: DataFrame) -> dict:
        """Takedown: retract the docs' gram contributions — ONE
        O(request) append of the exact negation of what indexing them
        added. ``docs`` must carry the original text (the corpus
        snapshot the index was built over still has it; grams are
        derived, not stored per doc). Grams shared with surviving
        documents stay live; deleting a doc that is not a live member
        is refused (a double-delete would push shared refcounts to
        zero and take down other documents' grams)."""
        id_col = self.meta["id_col"]
        _require_integral_id(docs, id_col, "gram index delete")
        missing = (
            docs.select(F.col(id_col).cast("long").alias("doc_id"))
            .join(self.members(), "doc_id", "left_anti")
            .limit(1)
            .collect()
        )
        if missing:
            raise ValueError(
                f"delete: doc {missing[0][0]} is not a live member of "
                "the index (already deleted, or never indexed)"
            )
        return self.ledger.commit(
            self._delta_rows(docs, -1), "takedown", append=True
        )

    def vacuum(self) -> dict:
        """Compact the ledger to its net state (dead grams' rows and
        retired members physically dropped). A SINGLE commit, so it is
        trivially atomic and idempotent — rerunning recommits the same
        net state."""
        lg = self.ledger.read()
        grams = (
            lg.filter(F.col("kind") == "gram")
            .groupBy("gram")
            .agg(F.sum("delta").cast("long").alias("delta"))
            .filter(F.col("delta") > 0)
            .select(
                F.lit("gram").alias("kind"),
                "gram",
                F.lit(None).cast("long").alias("doc_id"),
                "delta",
            )
        )
        members = (
            lg.filter(F.col("kind") == "member")
            .groupBy("doc_id")
            .agg(F.sum("delta").cast("long").alias("__refs"))
            .filter(F.col("__refs") > 0)
            .select(
                F.lit("member").alias("kind"),
                F.lit(None).cast("binary").alias("gram"),
                "doc_id",
                F.lit(1).cast("long").alias("delta"),
            )
        )
        return self.ledger.commit(grams.unionByName(members), "vacuum")

    # -------------------------------------------------------- consuming

    def clean_batch(self, batch: DataFrame) -> DataFrame:
        """The daily-ingest read path: dedup a batch against the live
        index (``exact_substring_dedup_incremental`` semantics — base
        text never re-read). The caller appends the surviving batch
        afterwards."""
        m = self.meta
        return CUR.exact_substring_dedup_incremental(
            batch,
            self.grams(),
            min_len=m["min_len"],
            id_col=m["id_col"],
            text_col=m["text_col"],
            long_doc=m["long_doc"],
        )


class MinHashIndex:
    """Stored MinHash signature index with tombstone takedown — the
    ``IvfPqIndex`` lifecycle applied to the near-dup signature table
    ``pipelines.dedup_corpus_incremental`` serves batches from.

    Signatures are keyed by ``doc_id`` (k rows per doc), so takedown
    needs no refcounts: ``delete`` appends the ids to a tombstone
    table (O(request), no rewrite), ``signatures()`` anti-joins the
    broadcast tombstone list, and ``vacuum`` physically recommits the
    live rows and resets the tombstones. Crash semantics match
    ``IvfPqIndex.vacuum``: a crash between vacuum's two commits leaves
    stale tombstones that are semantically inert (their rows are
    already gone) and healed by the next ``vacuum`` or by ``append``
    of the same id.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.sigs = SnapshotTable(spark, os.path.join(path, "sigs"))
        self.tombstones = SnapshotTable(spark, os.path.join(path, "tombs"))
        self._meta: dict | None = None

    # ------------------------------------------------------------- meta

    @property
    def meta(self) -> dict:
        if self._meta is None:
            with open(os.path.join(self.path, "meta.json")) as f:
                self._meta = json.load(f)
        return self._meta

    def exists(self) -> bool:
        return os.path.isfile(os.path.join(self.path, "meta.json"))

    # ------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        path: str,
        docs: DataFrame,
        num_hashes: int = 8,
        shingle_k: int = 3,
        hash_fn: str = "md5",
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "MinHashIndex":
        """Sign the corpus and persist; meta lands last, so a crash
        mid-build leaves no readable index — and a retried build
        reuses tables the crashed attempt already committed (the
        signatures are a pure function of the corpus), so the retry
        cannot bump version numbers a caller's resume logic keys on.
        Params (+ corpus fingerprint) are staged before the first
        commit and verified on retry (ADVICE r11 #3)."""
        from ..sources.snapshots import corpus_fingerprint, stage_build_params

        idx = cls(spark, path)
        meta = {
            "num_hashes": int(num_hashes),
            "shingle_k": int(shingle_k),
            "hash_fn": hash_fn,
            "id_col": id_col,
            "text_col": text_col,
        }
        idx._meta = meta
        stage_build_params(
            path, dict(meta, corpus_fp=corpus_fingerprint(docs, id_col))
        )
        if idx.sigs.current_version() is None:
            idx.sigs.commit(idx._sign(docs), "corpus signatures")
        if idx.tombstones.current_version() is None:
            idx.tombstones.commit(
                spark.createDataFrame([], f"{id_col} long").coalesce(1),
                "empty tombstones",
            )
        tmp = os.path.join(path, ".meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.rename(tmp, os.path.join(path, "meta.json"))
        return idx

    def _sign(self, docs: DataFrame) -> DataFrame:
        m = self.meta
        return DA.minhash_signatures(
            docs,
            text_col=m["text_col"],
            id_col=m["id_col"],
            num_hashes=m["num_hashes"],
            shingle_k=m["shingle_k"],
            hash_fn=m["hash_fn"],
        )

    # ---------------------------------------------------------- serving

    def signatures(self, include_deleted: bool = False) -> DataFrame:
        """Live signature rows — stored minus tombstoned ids
        (broadcast anti-join; takedown lists are request-sized). This
        is the ``base_sig`` input to ``dedup_corpus_incremental``."""
        out = self.sigs.read()
        if include_deleted:
            return out
        id_col = self.meta["id_col"]
        tombs = self.tombstones.read().select(id_col).distinct()
        return out.join(F.broadcast(tombs), id_col, "left_anti")

    # --------------------------------------------------------- mutation

    def append(self, docs: DataFrame) -> dict:
        """Sign a new batch with the STORED parameters and append —
        O(batch). An id with stored rows (live or tombstoned-but-not-
        vacuumed) is refused; an id whose tombstone outlived its rows
        (crashed vacuum) is healed first, exactly as
        ``IvfPqIndex.append`` does."""
        id_col = self.meta["id_col"]
        stored = self.sigs.read().select(id_col).distinct()
        clash = (
            docs.select(id_col)
            .join(stored, id_col, "left_semi")
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"append: doc {clash[0][0]} already signed (or tombstoned "
                "and not yet vacuumed) in the index"
            )
        stale_hit = (
            docs.select(id_col)
            .join(
                F.broadcast(self.tombstones.read().select(id_col)),
                id_col,
                "left_semi",
            )
            .limit(1)
            .collect()
        )
        if stale_hit:
            active = self.tombstones.read().join(
                self.sigs.read().select(id_col).distinct(),
                id_col,
                "left_semi",
            )
            self.tombstones.commit(
                active.coalesce(1), "heal stale tombstones (crashed vacuum)"
            )
        return self.sigs.commit(self._sign(docs), "append batch", append=True)

    def delete(self, ids: list[int]) -> dict:
        """Takedown: tombstone-append — O(request), no data rewrite.
        ``signatures()`` excludes the ids from this commit on."""
        id_col = self.meta["id_col"]
        return self.tombstones.commit(
            _local_relation(
                self.spark, [(int(i),) for i in ids], f"{id_col} long"
            ).coalesce(1),
            f"tombstone {len(ids)} ids",
            append=True,
        )

    def vacuum(self) -> dict:
        """Physically drop tombstoned rows and reset the tombstone
        list. Same two-commit crash story as ``IvfPqIndex.vacuum``:
        a crash between them leaves inert, self-healing tombstones."""
        live = self.signatures()
        m = self.sigs.commit(live, "vacuum: drop tombstoned signatures")
        id_col = self.meta["id_col"]
        self.tombstones.commit(
            self.spark.createDataFrame([], f"{id_col} long").coalesce(1),
            "vacuumed",
        )
        return m


def _gc(
    tables: dict, keep_last: int, orphan_grace_sec: float = 86400.0
) -> dict:
    """Shared version GC for index artifacts: ``vacuum`` reclaims
    ROWS inside the head version; this reclaims old VERSIONS — every
    mutation committed a snapshot, and a long-lived index otherwise
    retains one manifest (and its unshared files) per append/delete
    forever. ``keep_last`` preserves the time-travel window;
    ``orphan_grace_sec`` is the unreferenced-file age gate a GC racing
    a live index writer needs (see ``SnapshotTable.expire``)."""
    return {
        name: t.expire(
            keep_last=keep_last, orphan_grace_sec=orphan_grace_sec
        )
        for name, t in tables.items()
    }


def gram_index_gc(
    idx: GramIndex, keep_last: int = 2, orphan_grace_sec: float = 86400.0
) -> dict:
    """Expire old ledger versions of a :class:`GramIndex` (run after
    ``vacuum``: vacuum compacts the live state into the head version,
    expire then drops the superseded history)."""
    return _gc({"ledger": idx.ledger}, keep_last, orphan_grace_sec)


def minhash_index_gc(
    idx: MinHashIndex, keep_last: int = 2, orphan_grace_sec: float = 86400.0
) -> dict:
    """Expire old signature/tombstone versions of a
    :class:`MinHashIndex` (run after ``vacuum``)."""
    return _gc(
        {"sigs": idx.sigs, "tombs": idx.tombstones}, keep_last,
        orphan_grace_sec,
    )
