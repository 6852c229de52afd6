"""Stored IVF-PQ vector index: the train-once / serve-many lifecycle.

``ivf_pq_search`` (operators/pq.py) trains its codebook in-query —
right for a one-shot audit, wrong for production, where the codebook
and codes are ARTIFACTS: trained once, persisted, served by every
search, extended by every ingest batch, and shrunk by takedown
requests without a rebuild. This module is that lifecycle, riding
``SnapshotTable`` for the same atomic-pointer versioning the gram
index and corpus snapshots use (VERDICT r9 #1):

- ``build``  — train the coarse cells' shared residual codebook and
  encode the corpus; persist ``cells`` / ``codebook`` / ``codes`` as
  three snapshot tables plus a geometry manifest.
- ``search`` — ADC search over the STORED artifacts
  (``pq.ivf_pq_search_artifacts``): no training, no corpus
  embeddings, per-query cost unchanged.
- ``append`` — encode NEW vectors against the STORED model
  (``pq.ivf_pq_encode_against``) and snapshot-append their codes:
  byte-identical to batch-encoding the union (tested), O(batch).
- ``delete`` — right-to-be-forgotten takedown as a TOMBSTONE append
  (VERDICT r9 #4): O(request) metadata, no rewrite; ``search`` and
  ``codes()`` exclude tombstoned ids immediately.
- ``vacuum`` — the scheduled physical rewrite: codes minus tombstones
  recommitted, tombstone list reset; equivalent to an index built
  over corpus∖deleted with the same stored model (tested).

Scale shape: cells and codebook are broadcast-sized; ``codes`` is the
only data-sized table (~m bytes/vector) and is only ever appended or
(in vacuum) linearly rewritten. Tombstones are takedown-request-sized
and broadcast into the anti-join. Retraining is deliberately NOT an
incremental operation — it is a new ``build`` at a new path, exactly
like FAISS index rotation.

Reference parity: none (the reference has no vector search); this
closes the similarity-search family's production loop.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.localrel import local_relation as _local_relation

from ..sources.snapshots import SnapshotTable
from . import pq as PQ


class IvfPqIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.cells = SnapshotTable(spark, os.path.join(path, "cells"))
        self.codebook = SnapshotTable(spark, os.path.join(path, "codebook"))
        self._codes = SnapshotTable(spark, os.path.join(path, "codes"))
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
        corpus: DataFrame,
        centroids: DataFrame,
        m: int = PQ.PQ_M,
        ksub: int = PQ.PQ_KSUB,
        dim: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        label_col: str = "label",
        seed: int = 7,
        opq: bool = False,
    ) -> "IvfPqIndex":
        """Train + encode + persist. The geometry manifest lands LAST
        (after all three tables committed), so ``exists()`` implies a
        complete index — a crash mid-build leaves no readable index.

        ``opq=True`` learns the parametric OPQ rotation (operators/
        opq.py) over the corpus and stores it IN the manifest as part
        of the index geometry — cells, codebook and codes then live in
        rotated space, ``search``/``append`` rotate queries/batches
        with the stored matrix, and because the rotation is orthonormal
        every distance (and so every stored-lifecycle identity) is
        exactly preserved. This is the 'production pays one stack and
        stores codebook+rotation' leg of the OPQ family."""
        from . import opq as OPQ

        idx = cls(spark, path)
        rotation: list[list[float]] | None = None
        if opq:
            rotation = OPQ.opq_rotation(
                corpus, m=m, dim=dim, vec_col=vec_col, id_col=id_col, seed=seed
            )
            OPQ.opq_check_orthonormal(rotation)
            corpus = OPQ.opq_rotate(
                corpus.select(id_col, vec_col), rotation, vec_col
            )
            centroids = centroids.withColumn(
                "centroid", OPQ.rotate_expr(rotation, F.col("centroid"))
            )
        codes, book = PQ.ivf_pq_build(
            corpus,
            centroids,
            m=m,
            ksub=ksub,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
            label_col=label_col,
            seed=seed,
        )
        # a retried build reuses tables the crashed attempt already
        # committed (all four are pure functions of corpus+geometry),
        # so the retry cannot bump version numbers — meta still lands
        # last, so exists() still implies a complete index. Reuse is
        # only sound for the SAME build: params + corpus fingerprint
        # are staged before the first commit and verified on retry
        # (ADVICE r11 #3 — a retry with different m/opq/corpus over a
        # crashed attempt's tables would serve wrong results silently)
        from ..sources.snapshots import corpus_fingerprint, stage_build_params

        stage_build_params(
            path,
            {
                "m": int(m),
                "ksub": int(ksub),
                "dim": int(dim),
                "id_col": id_col,
                "label_col": label_col,
                "seed": int(seed),
                "opq": bool(opq),
                "corpus_fp": corpus_fingerprint(corpus, id_col),
            },
        )
        if idx.cells.current_version() is None:
            idx.cells.commit(
                centroids.select(
                    F.col(label_col).alias("cell"), F.col("centroid")
                ),
                "coarse cells",
            )
        if idx.codebook.current_version() is None:
            idx.codebook.commit(book, "shared residual codebook")
        if idx._codes.current_version() is None:
            idx._codes.commit(
                codes.select(id_col, "codes", F.col("__cell").alias("cell")),
                "corpus codes",
            )
        if idx.tombstones.current_version() is None:
            idx.tombstones.commit(
                spark.createDataFrame([], f"{id_col} long").coalesce(1),
                "empty tombstones",
            )
        meta = {
            "m": m,
            "ksub": ksub,
            "dim": dim,
            "id_col": id_col,
            "label_col": label_col,
            "seed": seed,
            "rotation": rotation,
        }
        tmp = os.path.join(path, ".meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.rename(tmp, os.path.join(path, "meta.json"))
        idx._meta = meta
        return idx

    # ---------------------------------------------------------- serving

    def codes(self, include_deleted: bool = False) -> DataFrame:
        """Live codes — stored codes minus tombstoned ids (broadcast
        anti-join; takedown lists are request-sized)."""
        out = self._codes.read()
        if include_deleted:
            return out
        id_col = self.meta["id_col"]
        tombs = self.tombstones.read().select(id_col).distinct()
        return out.join(F.broadcast(tombs), id_col, "left_anti")

    def _rotated(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        """Apply the stored OPQ rotation (identity when the index was
        built without one) — pre-rotation manifests read as plain."""
        rotation = self.meta.get("rotation")
        if rotation is None:
            return df
        from . import opq as OPQ

        return OPQ.opq_rotate(df.select(id_col, vec_col), rotation, vec_col)

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 2,
        query_id_col: str = "query_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        meta = self.meta
        queries = self._rotated(queries, query_id_col, vec_col)
        return PQ.ivf_pq_search_artifacts(
            self.codes().withColumnRenamed("cell", "__cell"),
            self.codebook.read(),
            self.cells.read().withColumnRenamed("cell", "label"),
            queries,
            k=k,
            n_probe=n_probe,
            m=meta["m"],
            dim=meta["dim"],
            id_col=meta["id_col"],
            vec_col=vec_col,
            query_id_col=query_id_col,
            label_col="label",
        )

    # --------------------------------------------------------- mutation

    def append(self, vectors: DataFrame, vec_col: str = "embedding") -> dict:
        """Encode a new batch against the STORED model and append its
        codes — O(batch), the base corpus is never re-read. Appending
        an id whose code is stored (live, or tombstoned-but-not-yet-
        vacuumed) raises: ids are the index's primary key, and silent
        duplicates would make takedown semantics ambiguous. An id whose
        tombstone remains but whose code is GONE (a vacuum that crashed
        between its two commits — ADVICE r10 #2) is fully deleted
        semantically, so re-append is allowed: the stale tombstone is
        healed (rewritten to the active set) first, so it cannot mask
        the new code."""
        meta = self.meta
        id_col = meta["id_col"]
        stored = self._codes.read().select(id_col)
        clash = (
            vectors.select(id_col)
            .join(stored, id_col, "left_semi")
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"append: id {clash[0][0]} already present (or tombstoned "
                f"and not yet vacuumed) in the index"
            )
        stale_hit = (
            vectors.select(id_col)
            .join(
                F.broadcast(self.tombstones.read().select(id_col)),
                id_col,
                "left_semi",
            )
            .limit(1)
            .collect()
        )
        if stale_hit:
            # every tombstone the batch touches is stale (its code is
            # absent — the clash check above passed), i.e. a crashed
            # vacuum's leftover: clear to the active set so the new
            # code is not anti-joined away by a dead tombstone
            active = self.tombstones.read().join(
                self._codes.read().select(id_col), id_col, "left_semi"
            )
            self.tombstones.commit(
                active.coalesce(1), "heal stale tombstones (crashed vacuum)"
            )
        codes = PQ.ivf_pq_encode_against(
            self._rotated(vectors, id_col, vec_col),
            self.cells.read().withColumnRenamed("cell", "label"),
            self.codebook.read(),
            m=meta["m"],
            dim=meta["dim"],
            id_col=id_col,
            vec_col=vec_col,
            label_col="label",
        )
        return self._codes.commit(
            codes.select(id_col, "codes", F.col("__cell").alias("cell")),
            "append batch",
            append=True,
        )

    def delete(self, ids: list[int]) -> dict:
        """Takedown: tombstone-append the ids — O(request), no data
        rewrite. ``search``/``codes`` exclude them from this commit
        on; ``vacuum`` reclaims the bytes later."""
        id_col = self.meta["id_col"]
        return self.tombstones.commit(
            _local_relation(
                self.spark, [(int(i),) for i in ids], f"{id_col} long"
            ).coalesce(1),
            f"tombstone {len(ids)} ids",
            append=True,
        )

    def vacuum(self) -> dict:
        """Physically drop tombstoned codes: recommit codes∖tombstones
        and reset the tombstone list. After vacuum the codes table is
        byte-equivalent to encoding corpus∖deleted against the stored
        model (the delete-vs-rebuild identity, tested).

        Crash semantics (ADVICE r10 #2): the two commits are not
        atomic together. A crash AFTER the codes recommit but BEFORE
        the tombstone reset leaves tombstones whose codes are already
        gone — semantically inert (search's anti-join matches nothing)
        and self-healing: the next ``vacuum`` call re-runs both steps
        idempotently (the recommit is a no-op rewrite of the live set),
        and ``append`` of such an id heals the stale entry itself, so
        post-crash behavior equals post-vacuum behavior."""
        live = self.codes()
        m = self._codes.commit(live, "vacuum: drop tombstoned codes")
        id_col = self.meta["id_col"]
        self.tombstones.commit(
            self.spark.createDataFrame([], f"{id_col} long").coalesce(1),
            "vacuumed",
        )
        return m
