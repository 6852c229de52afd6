"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9: the escape hatch when built-in windowed aggs can't
express the state machine).

Implemented operator: per-user running counters (events seen, value
sum, last-seen timestamp) that persist across micro-batches and emit an
updated row per user per batch. State is one small dict per user —
bounded by the key cardinality, the operator the engine reaches for
when sessionization/window semantics aren't enough (e.g. lifetime
aggregates, fraud counters).

Timeouts: ``GroupStateTimeout.NoTimeout`` keeps state forever (lifetime
counters); swap for EventTimeTimeout + ``state.setTimeoutTimestamp`` to
age out idle keys against the watermark at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, s DOUBLE, last_us BIGINT"


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            last_us = max(last_us, int(batch_max.value // 1000))
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(s, 2)],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Attach the stateful per-user counter operator to an events
    stream (or batch frame for testing the kernel semantics)."""
    grouped = events.select("user_id", "ts", "value").groupBy("user_id")
    return grouped.applyInPandasWithState(
        _update_user,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas — the successor stateful API.
# Runtime requirements: RocksDB state store provider on the session and
# the protobuf package (the TWS state-server wire protocol) — the
# streaming test skips where protobuf is absent; the kernel math is
# tested unconditionally against a fake MapState.
# ---------------------------------------------------------------------------

BY_TYPE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _lazy_type_counter_cls():
    # StatefulProcessor lives in pyspark.sql.streaming.stateful_processor
    # (Spark 4+); import inside the factory so the module stays importable
    # on older runtimes that only have applyInPandasWithState.
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTypeCounters(StatefulProcessor):
        """Per-user, per-event-type lifetime counters on composite
        MapState — the state shape applyInPandasWithState can only fake
        by serializing a whole dict per key. MapState gives point
        lookups/updates per event_type (RocksDB-backed at scale), so a
        micro-batch touching one event type never rewrites the rest of
        the user's state."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._by_type = handle.getMapState(
                "by_type", "event_type STRING", "n BIGINT, s DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            touched: dict[str, tuple[int, float]] = {}
            for pdf in rows:
                for et, grp in pdf.groupby("event_type"):
                    n, s = touched.get(et) or (
                        tuple(self._by_type.getValue((et,)))
                        if self._by_type.containsKey((et,))
                        else (0, 0.0)
                    )
                    touched[et] = (n + len(grp), s + float(grp["value"].sum()))
            for et, (n, s) in touched.items():
                self._by_type.updateValue((et,), (n, s))
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(touched),
                    "event_type": list(touched),
                    "n_events": [n for n, _ in touched.values()],
                    "sum_value": [round(s, 2) for _, s in touched.values()],
                }
            )

        def close(self) -> None:
            pass

    return UserTypeCounters


def user_type_counters(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) lifetime counters via the Spark 4
    ``transformWithStateInPandas`` API (requires the RocksDB state
    store provider on the session). Emits one row per event type a
    user touched in the micro-batch, with lifetime totals."""
    cls = _lazy_type_counter_cls()
    grouped = events.select("user_id", "event_type", "value").groupBy("user_id")
    return grouped.transformWithStateInPandas(
        statefulProcessor=cls(),
        outputStructType=BY_TYPE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Streaming MinHash index maintenance (VERDICT r6 Next #7): the LSH
# signature index kept in STREAM STATE, keyed per bucket.
# ---------------------------------------------------------------------------

BUCKET_HITS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("seed", T.LongType()),
        T.StructField("minhash", T.LongType()),
        T.StructField("first_doc_id", T.LongType()),
        T.StructField("n_prior", T.LongType()),
    ]
)

_BUCKET_STATE_SCHEMA = "first_doc BIGINT, n BIGINT"


def _update_bucket(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seed, minhash = key
    first_doc, n = state.get if state.exists else (None, 0)
    docs: list[int] = []
    for pdf in pdfs:
        docs.extend(int(d) for d in pdf["doc_id"])
    if not docs:  # timeout invocation — nothing to emit or update
        return
    docs.sort()  # within-batch arrival order = id order (the contract)
    out_first, out_prior = [], []
    for d in docs:
        out_first.append(first_doc if n > 0 else None)
        out_prior.append(n)
        if n == 0:
            first_doc = d
        n += 1
    state.update((first_doc, n))
    yield pd.DataFrame(
        {
            "doc_id": docs,
            "seed": [int(seed)] * len(docs),
            "minhash": [int(minhash)] * len(docs),
            "first_doc_id": pd.array(out_first, dtype="Int64"),
            "n_prior": out_prior,
        }
    )


def minhash_bucket_index(docs: DataFrame) -> DataFrame:
    """Streaming MinHash index maintenance: the LSH signature index
    lives in STREAM STATE, one entry per ``(seed, minhash)`` bucket,
    and every incoming signature row is answered against — and folded
    into — that state in the same pass.

    This is the state-store leg of the incremental-dedup family
    (storage-index leg: ``sinks.stream_dedup_into_corpus``; batch twin:
    ``dedup_approx.minhash_bucket_hits``, window form, oracle-backed
    via ``q_minhash_bucket_hits``). Per-key state is two BIGINTs
    (bucket's first occupant + count) — bounded regardless of corpus
    size, so unlike a members-list design it cannot outgrow the state
    store on a hot boilerplate bucket (the same capped-bucket concern
    ``LSH_MAX_BUCKET`` addresses in the batch pair stage).

    Emits one row per signature row: ``first_doc_id`` (earliest doc
    ever seen in this bucket, NULL for the first occupant) and
    ``n_prior`` (occupants before this row). A doc is a near-dup
    candidate when ≥ ``min_matches`` of its buckets report a prior
    occupant — the downstream consumer's one groupBy, exactly the
    bucket-co-occupancy rule of ``minhash_candidate_pairs``.

    The signature projection upstream MUST be stateless
    (``minhash_signatures_stateless``) — Structured Streaming allows a
    single stateful operator per query, and this operator is it.
    State never expires by default (corpus identity must not age out);
    at scale swap ``NoTimeout`` for EventTimeTimeout + a watermark to
    bound state for time-scoped dedup windows.
    """
    grouped = docs.select("doc_id", "seed", "minhash").groupBy(
        "seed", "minhash"
    )
    return grouped.applyInPandasWithState(
        _update_bucket,
        outputStructType=BUCKET_HITS_SCHEMA,
        stateStructType=_BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming ExactSubstr gram-index maintenance: the distinct-gram index
# kept in STREAM STATE, keyed per gram — the exact-substring sibling of
# minhash_bucket_index above, and the streaming leg of the
# exact_substring_index / exact_substring_dedup_incremental family.
# ---------------------------------------------------------------------------

XS_HITS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("q", T.LongType()),
        T.StructField("gram", T.StringType()),
        T.StructField("first_source_doc", T.LongType()),
        T.StructField("n_prior", T.LongType()),
    ]
)

_XS_STATE_SCHEMA = "first_key BIGINT, n BIGINT"

#: mirrors operators/curation.py::XS_POS_BASE — kept as a literal here
#: because executors deserialize this module standalone
_XS_POS_BASE = 1_000_000


def _update_gram(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (gram,) = key
    # the gram stage carries 16-byte binary grams (curation._lgram_stage);
    # this face exposes the gram, so re-hex to the declared md5 string —
    # matching the batch twin xs_gram_hits
    if isinstance(gram, (bytes, bytearray)):
        gram = bytes(gram).hex()
    first_key, n = state.get if state.exists else (None, 0)
    occ: list[tuple[int, int]] = []
    for pdf in pdfs:
        occ.extend(
            (int(k), int(d), int(q))
            for k, d, q in zip(pdf["__key"], pdf["doc_id"], pdf["q"])
        )
    if not occ:  # timeout invocation — nothing to emit or update
        return
    occ.sort()  # within-batch corpus (key) order — the arrival contract
    rows = []
    for k, d, q in occ:
        rows.append(
            (
                d,
                q,
                gram,
                (first_key // _XS_POS_BASE) if n > 0 else None,
                n,
            )
        )
        if n == 0 or k < first_key:
            first_key = k
        n += 1
    state.update((first_key, n))
    out = pd.DataFrame(
        rows, columns=["doc_id", "q", "gram", "first_source_doc", "n_prior"]
    )
    out["first_source_doc"] = pd.array(
        out["first_source_doc"], dtype="Int64"
    )
    yield out


def xs_gram_index(gram_rows: DataFrame) -> DataFrame:
    """Streaming ExactSubstr index maintenance: the gram index lives in
    STREAM STATE, one entry per gram, and every incoming window
    occurrence is answered against — and folded into — that state in
    the same pass.

    Per-key state is two BIGINTs (the gram's minimum (doc, pos) key +
    occurrence count) — bounded regardless of corpus size, the same
    no-members-list design as ``minhash_bucket_index``. Emits one row
    per occurrence: ``first_source_doc`` (the doc owning the gram's
    earliest occurrence BEFORE this row; NULL when this row is the
    first) and ``n_prior``. ``n_prior > 0`` is exactly the ExactSubstr
    drop rule per window, so a foreachBatch consumer can rebuild
    cleaned text incrementally, and the stored-index family
    (``exact_substring_dedup_incremental``) answers the same question
    batch-side.

    Input must be the STATELESS gram projection
    (``operators/curation.py::_lgram_stage``'s ``g`` output — row-local
    per doc, no window) — Structured Streaming allows one stateful
    operator per query and this is it. Batches must arrive in corpus
    order for keep-first semantics (the ``minhash_bucket_index``
    contract); within a batch, occurrences are key-sorted here. Batch
    twin, oracle-backed: ``curation.xs_gram_hits`` /
    ``q_xs_gram_hits``. State never expires (corpus identity must not
    age out); swap NoTimeout for EventTimeTimeout to bound state for
    time-scoped windows.
    """
    grouped = gram_rows.select("doc_id", "q", "gram", "__key").groupBy("gram")
    return grouped.applyInPandasWithState(
        _update_gram,
        outputStructType=XS_HITS_SCHEMA,
        stateStructType=_XS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def embedding_bucket_index(
    bucket_rows: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Streaming embedding (ANN) index maintenance: the multi-table
    LSH cell index lives in STREAM STATE — the third member of the
    bucket-index family (MinHash buckets, ExactSubstr grams, now
    vector cells), and deliberately a THIN WRAPPER over the same
    two-BIGINT ``applyInPandasWithState`` kernel as
    ``minhash_bucket_index``: the state key is (table, bucket) instead
    of (seed, minhash), the value is still (first occupant, count),
    bounded per cell regardless of corpus size.

    Input must be the stateless projection
    (``operators/similarity.py::embedding_bucket_rows`` — feed
    quantized codes for bit-exact buckets); emits one row per
    (vector, table): ``first_vec_id`` / ``n_prior``, with a vector
    reporting priors in ≥ k tables being an ANN near-dup candidate.
    Batch twin, oracle-backed: ``similarity.embedding_bucket_hits`` /
    ``q_embedding_bucket_hits``; stream-equivalence pinned in
    test_streaming_sinks.py.
    """
    from pyspark.sql import functions as F

    renamed = bucket_rows.select(
        F.col(id_col).alias("doc_id"),
        F.col("t").alias("seed"),
        F.col("bkt").alias("minhash"),
    )
    return minhash_bucket_index(renamed).select(
        F.col("doc_id").alias(id_col),
        F.col("seed").alias("t"),
        F.col("minhash").alias("bkt"),
        F.col("first_doc_id").alias("first_vec_id"),
        "n_prior",
    )
