"""LLM-corpus operators, round-7 wave: ExactSubstr cross-document
substring dedup (the suffix-array-family complement to the span/
fragment dedups) and its streaming-side companions.

The reference has no equivalent (scrappy.py's dedup surface is
whole-title set difference); this closes the one major LLM-dedup
family the engine lacked (VERDICT r6, Next #6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .registry import register

_XS_L = 30  # minimum duplicated-substring length, chars


def exact_substring_gram_ctes(L: int) -> str:
    """Shared DuckDB CTE fragment for the ExactSubstr oracle family —
    ``g`` (one row per L-char window with its md5 gram) and ``f`` (the
    keep-first per-gram key minima) over a caller-declared ``d`` CTE
    carrying at least ``(doc_id, text, n = length(text))``.

    Mirrors ``operators/curation.py::_lgram_stage`` exactly, including
    the ``doc_id·10⁶ + pos`` key encoding (``curation.XS_POS_BASE``)
    AND its hard length guard: a document of length ≥ 10⁶ errors here
    exactly as the engine's ``raise_error`` does, so both sides refuse
    the key-interleaving input identically instead of the oracle
    silently agreeing with a corrupted packing (VERDICT r7 #1).
    Used by the dedup and provenance oracles here and the
    duplication-profile oracle (plans/llmdata12.py) so all three gates
    pin the SAME gram semantics — edit it in one place or the dedup
    path, the lineage path, and their oracles silently disagree.
    """
    return f"""g AS (SELECT doc_id, CAST(u.q AS INT) AS q,
                 md5(substr(text, CAST(u.q AS INT), {L})) AS gram
          FROM d, unnest(generate_series(1, CASE
                   WHEN n >= 1000000 THEN CAST(error(
                       'exact_substring: document ' || doc_id ||
                       ' has length ' || n || ' >= XS_POS_BASE') AS BIGINT)
                   ELSE n - {L} + 1 END)) AS u(q)
          WHERE n >= {L}),
    f AS (SELECT gram,
                 CAST(min(doc_id * 1000000 + q) AS BIGINT) AS first_key
          FROM g GROUP BY gram)"""


def exact_substring_dup_cte() -> str:
    """The dropped-window positions CTE over ``g``/``f`` — every
    occurrence whose key exceeds its gram's corpus-first key."""
    return """dup AS (SELECT g.doc_id, g.q FROM g JOIN f USING (gram)
            WHERE g.doc_id * 1000000 + g.q > f.first_key)"""


# Oracle: the same keep-first L-gram coverage rule computed WITHOUT the
# engine's collapse-first/interval-merge machinery — per-character
# coverage through a running window max, then a per-char string_agg
# rebuild. Deliberately a different algorithm shape on the same
# definition, so the hash proves the optimized engine path (collapse,
# groupBy-min keys, gaps-and-islands, fold rebuild) equals the direct
# semantics. ``first_key = min(doc_id·10⁶ + pos)`` mirrors the engine's
# lexicographic-(doc, pos) encoding (positions ≪ 10⁶).


def exact_substring_coverage_ctes(L: int, batch_pred: str = "TRUE") -> str:
    """The per-character coverage-rebuild CTE chain over ``d``/``g``/
    ``f``/``dup``: events, running dup-window max, ordered string_agg
    rebuild. ``batch_pred`` restricts WHICH docs get rebuilt (the
    incremental oracle rebuilds only the batch) while the dup/first
    computation stays corpus-wide — exactly the equivalence the
    incremental gate pins."""
    return f"""ch AS (SELECT doc_id, CAST(u.p AS INT) AS p,
                  substr(text, CAST(u.p AS INT), 1) AS c
           FROM d, unnest(generate_series(1, n)) AS u(p)
           WHERE {batch_pred}),
    ev AS (SELECT doc_id, q AS pos, 1 AS is_dup, NULL AS c FROM dup
           WHERE {batch_pred}
           UNION ALL
           SELECT doc_id, p AS pos, 0 AS is_dup, c FROM ch),
    run AS (SELECT doc_id, pos, is_dup, c,
                   max(CASE WHEN is_dup = 1 THEN pos END) OVER (
                       PARTITION BY doc_id
                       ORDER BY pos ASC, is_dup DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_dup
            FROM ev),
    agg AS (SELECT doc_id,
                   CAST(sum(CASE WHEN last_dup IS NOT NULL
                                  AND last_dup >= pos - {L} + 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                   coalesce(string_agg(
                       CASE WHEN last_dup IS NULL
                             OR last_dup < pos - {L} + 1
                       THEN c END, '' ORDER BY pos), '') AS cleaned_text
            FROM run WHERE is_dup = 0 GROUP BY doc_id)"""


_XS_SQL = f"""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    {exact_substring_gram_ctes(_XS_L)},
    {exact_substring_dup_cte()},
    {exact_substring_coverage_ctes(_XS_L)}
    SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
           coalesce(agg.n_dropped, 0) AS n_dropped,
           coalesce(agg.cleaned_text, '') AS cleaned_text
    FROM d LEFT JOIN agg USING (doc_id)
"""


@register(
    "q_exact_substring_dedup",
    sql=_XS_SQL,
    doc=f"ExactSubstr cross-document dedup (Lee et al. 2022): drop "
    f"every char span of length ≥ {_XS_L} whose content appeared "
    "earlier in the corpus (keep-first by (doc_id, pos)). Engine path "
    "(operators/curation.py::exact_substring_dedup): collapse exact-"
    "dup texts first (result-neutral, cuts gram hashing to unique "
    "bytes), scan-side md5 L-gram windows, keep-first via one partial-"
    "agg groupBy-min (map-side combine absorbs boilerplate-hot grams), "
    "gaps-and-islands interval merge, single-fold text rebuild. The "
    "oracle recomputes the same definition per CHARACTER (running-max "
    "coverage window + ordered string_agg rebuild, no collapse, no "
    "interval merge) — a deliberately different algorithm shape, so "
    "the hash proves the optimized path equals the direct semantics.",
    tags=("llm", "dedup", "curation"),
)
def q_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import exact_substring_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_substring_dedup(docs, min_len=_XS_L)


_INC_XS_MIN_ID = 400  # docs at/above this id form the "new batch"


@register(
    "q_exact_substring_incremental",
    # the oracle runs the FULL dedup over base ∪ batch (corpus-wide
    # grams/firsts/dup) and rebuilds only the batch docs — the
    # equivalence the incremental contract promises ("same answer as
    # rerunning everything, without re-reading the base text"), valid
    # here because batch ids follow base ids. The index-growth audit
    # column is recomputed as distinct batch grams absent from base.
    sql=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    {exact_substring_gram_ctes(_XS_L)},
    {exact_substring_dup_cte()},
    {exact_substring_coverage_ctes(_XS_L, f"doc_id >= {_INC_XS_MIN_ID}")},
    newg AS (SELECT CAST(count(DISTINCT gram) AS BIGINT)
                 AS n_index_grams_added
             FROM g WHERE doc_id >= {_INC_XS_MIN_ID}
               AND gram NOT IN (SELECT gram FROM g
                                WHERE doc_id < {_INC_XS_MIN_ID}))
    SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
           coalesce(agg.n_dropped, 0) AS n_dropped,
           coalesce(agg.cleaned_text, '') AS cleaned_text,
           newg.n_index_grams_added
    FROM d LEFT JOIN agg USING (doc_id) CROSS JOIN newg
    WHERE d.doc_id >= {_INC_XS_MIN_ID}
    """,
    doc="Incremental ExactSubstr dedup against a STORED gram index "
    "(the daily-ingest loop): the base corpus is indexed once "
    "(operators/curation.py::exact_substring_index — the distinct "
    "16-byte gram set, no positions, no text) and the day's batch is "
    "cleaned against index membership plus within-batch keep-first "
    "(exact_substring_dedup_incremental), never re-reading base "
    "bytes — the index-reuse move dedup_corpus_incremental makes for "
    "MinHash signatures, completed for exact substrings. The oracle "
    "proves the EQUIVALENCE contract: it reruns the full dedup over "
    "base ∪ batch and keeps the batch rows, plus recomputes the "
    "index-growth audit (distinct batch grams absent from base) that "
    "the engine derives with a left-anti join. Batch gram work is "
    "batch-sized; the index join is a linear hash equi-join on the "
    "16-byte gram.",
    tags=("llm", "dedup", "curation", "incremental"),
)
def q_exact_substring_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.curation import (
        exact_substring_dedup_incremental,
        exact_substring_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < _INC_XS_MIN_ID)
    batch = docs.filter(F.col("doc_id") >= _INC_XS_MIN_ID)
    idx = exact_substring_index(base, min_len=_XS_L)
    cleaned = exact_substring_dedup_incremental(
        batch, idx, min_len=_XS_L
    )
    growth = (
        exact_substring_index(batch, min_len=_XS_L)
        .join(idx, "gram", "left_anti")
        .agg(F.count("*").cast("long").alias("n_index_grams_added"))
    )
    return cleaned.crossJoin(F.broadcast(growth))


# ---------------------------------------------------------------------------
# Long-document chunk mode (the XS_POS_BASE escape hatch, VERDICT r8 #1)
# ---------------------------------------------------------------------------

#: the synthetic book's id — above every fixture doc_id (≤ 4999 at
#: sf0.1), so keep-first corpus order puts the book LAST: original
#: docs own their grams, the book's repeats get dropped.
_XS_BOOK_ID = 900_000
_XS_BOOK_MIN = 1_000_123  # > XS_POS_BASE: default mode MUST refuse it


def _xs_longdoc_gram_ctes() -> str:
    """Shared chunked-corpus gram CTEs for the long-doc oracle family:
    seedsel/corpus (documents ∪ the >1M-char synthetic book), then the
    PRE-CHUNKED gram stage at base 2³¹ with NO length guard — the plain
    keep-first rule over global positions, computed the only way DuckDB
    can afford it: a lateral unnest over a row carrying the 1M-char
    string copies that string per generated row (O(n²), measured
    >300 s; ARCHITECTURE.md r9), so every lateral here walks ~1 KB
    chunk strings (same seam rule and XS_CHUNK_STRIDE as the engine)
    and positions decode back to GLOBAL before f. Ends with the g/f
    CTEs; used by the long-doc dedup AND provenance oracles so both
    gates pin one gram semantics."""
    from ..operators.curation import XS_CHUNK_STRIDE as S

    L = _XS_L
    return f"""seedsel AS (SELECT text FROM documents WHERE length(text) > 0
                     ORDER BY doc_id LIMIT 1),
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT {_XS_BOOK_ID} AS doc_id,
               repeat(text, CAST(ceil({_XS_BOOK_MIN}.0 / length(text))
                                 AS INT)) AS text
        FROM seedsel
    ),
    d AS (SELECT doc_id, text, length(text) AS n FROM corpus),
    chunks AS (SELECT doc_id, CAST(u.ci AS INT) AS ci,
                      substr(text, CAST(u.ci AS INT) * {S} + 1,
                             {S + L - 1}) AS ctext
               FROM d, unnest(generate_series(0,
                    CAST(ceil((n - {L} + 1) / {S}.0) AS INT) - 1)) AS u(ci)
               WHERE n >= {L}),
    g AS (SELECT doc_id, CAST(ci * {S} + u.ql AS INT) AS q,
                 md5(substr(ctext, CAST(u.ql AS INT), {L})) AS gram
          FROM chunks,
               unnest(generate_series(1, length(ctext) - {L} + 1)) AS u(ql)),
    f AS (SELECT gram,
                 CAST(min(doc_id * 2147483648 + q) AS BIGINT) AS first_key
          FROM g GROUP BY gram)"""


def _xs_longdoc_sql() -> str:
    """The long-doc DEDUP oracle: shared chunked gram CTEs + the
    dup/coverage/rebuild chain (per-char stage also chunked — same
    string-copy hazard)."""
    from ..operators.curation import XS_CHUNK_STRIDE as S

    L = _XS_L
    return f"""
    WITH {_xs_longdoc_gram_ctes()},
    dup AS (SELECT g.doc_id, g.q FROM g JOIN f USING (gram)
            WHERE g.doc_id * 2147483648 + g.q > f.first_key),
    cck AS (SELECT doc_id, CAST(u.ci AS INT) AS ci,
                   substr(text, CAST(u.ci AS INT) * {S} + 1, {S}) AS ctext
            FROM d, unnest(generate_series(0,
                 CAST(ceil(n / {S}.0) AS INT) - 1)) AS u(ci)
            WHERE n >= 1),
    ch AS (SELECT doc_id, CAST(ci * {S} + u.p AS INT) AS p,
                  substr(ctext, CAST(u.p AS INT), 1) AS c
           FROM cck, unnest(generate_series(1, length(ctext))) AS u(p)),
    ev AS (SELECT doc_id, q AS pos, 1 AS is_dup, NULL AS c FROM dup
           UNION ALL
           SELECT doc_id, p AS pos, 0 AS is_dup, c FROM ch),
    run AS (SELECT doc_id, pos, is_dup, c,
                   max(CASE WHEN is_dup = 1 THEN pos END) OVER (
                       PARTITION BY doc_id
                       ORDER BY pos ASC, is_dup DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_dup
            FROM ev),
    agg AS (SELECT doc_id,
                   CAST(sum(CASE WHEN last_dup IS NOT NULL
                                  AND last_dup >= pos - {L} + 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                   coalesce(string_agg(
                       CASE WHEN last_dup IS NULL
                             OR last_dup < pos - {L} + 1
                       THEN c END, '' ORDER BY pos), '') AS cleaned_text
            FROM run WHERE is_dup = 0 GROUP BY doc_id)
    SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
           coalesce(agg.n_dropped, 0) AS n_dropped,
           coalesce(agg.cleaned_text, '') AS cleaned_text
    FROM d LEFT JOIN agg USING (doc_id)
    """


@register(
    "q_exact_substring_longdoc",
    sql=_xs_longdoc_sql(),
    doc="ExactSubstr dedup with the long_doc='chunk' escape hatch "
    "(VERDICT r8 #1): the corpus is documents plus ONE >1M-char "
    "synthetic book (the smallest doc's text repeated past "
    "XS_POS_BASE, id above every real doc) — exactly the input the "
    "default mode refuses with its fail-loud key-packing guard. Chunk "
    "mode cuts every doc into overlapping 1024-stride chunks (L-1 "
    "overlap: no boundary window lost, packed keys still sorted by "
    "global corpus position, per-window substr cost capped at the "
    "stride instead of the full book — the JVM substr is O(position), "
    "so this is also the perf-correct path) and reproduces the plain "
    "keep-first semantics EXACTLY: the oracle computes the unchunked "
    "rule at a 2^31 key base with no guard. The book lands last in "
    "corpus order, so the seed doc keeps its text and the book "
    "collapses to its first fresh spans. Engine path "
    "operators/curation.py::exact_substring_dedup(long_doc='chunk') / "
    "_lgram_stage_chunked.",
    tags=("llm", "dedup", "curation", "longdoc"),
)
def q_exact_substring_longdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import exact_substring_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # smallest non-empty doc as the seed via one agg (min_by — no sort;
    # the oracle's ORDER BY doc_id LIMIT 1 picks the same row since
    # doc_id is unique)
    seed = (
        docs.filter(F.length("text") > 0)
        .agg(F.min_by("text", "doc_id").alias("text"))
        .select(
            F.lit(_XS_BOOK_ID).cast("long").alias("doc_id"),
            F.expr(
                f"repeat(text, cast(ceil({_XS_BOOK_MIN}.0 / length(text))"
                " as int))"
            ).alias("text"),
        )
    )
    corpus = docs.unionByName(seed)
    return exact_substring_dedup(corpus, min_len=_XS_L, long_doc="chunk")


# ---------------------------------------------------------------------------
# MinHash bucket hits — batch twin of the streaming state-store index
# ---------------------------------------------------------------------------

from .llmdata import _SIG_SQL  # shared signature CTE (one source of truth)


@register(
    "q_minhash_bucket_hits",
    sql=f"""
    WITH {_SIG_SQL}
    SELECT doc_id, CAST(seed AS BIGINT) AS seed, minhash,
           min(doc_id) OVER (
               PARTITION BY seed, minhash ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_doc_id,
           CAST(row_number() OVER (
               PARTITION BY seed, minhash ORDER BY doc_id) - 1 AS BIGINT)
               AS n_prior
    FROM sig
    """,
    doc="Per-signature-row LSH bucket occupancy in arrival (id) order: "
    "earliest prior occupant of the row's (seed, minhash) bucket (NULL "
    "for the first) and the prior-occupant count — the incremental "
    "form of the minhash_candidate_pairs co-occupancy rule (a doc "
    "whose rows report >= min_matches priors is a near-dup candidate). "
    "Batch twin of the STREAMING state-store index "
    "(streaming/stateful.py::minhash_bucket_index, applyInPandasWithState "
    "with two-BIGINT per-bucket state); stream-equivalence pinned in "
    "test_streaming_sinks.py, and the stateless row-local signature "
    "projection the stream needs is equivalence-tested against the "
    "batch groupBy shape in test_llm_ops4.py.",
    tags=("llm", "dedup", "streaming-twin"),
)
def q_minhash_bucket_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup_approx import minhash_bucket_hits

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_bucket_hits(docs)


@register(
    "q_substring_provenance",
    sql=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    {exact_substring_gram_ctes(_XS_L)},
    cnt AS (SELECT g.doc_id,
                   CAST(f.first_key // 1000000 AS BIGINT) AS source_doc,
                   CAST(count(*) AS BIGINT) AS n_windows
            FROM g JOIN f USING (gram)
            WHERE g.doc_id * 1000000 + g.q > f.first_key
            GROUP BY 1, 2),
    rk AS (SELECT doc_id, source_doc, n_windows,
                  CAST(sum(n_windows) OVER (PARTITION BY doc_id)
                       AS BIGINT) AS n_dup_windows,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY n_windows DESC,
                                              source_doc ASC) AS rn
           FROM cnt)
    SELECT doc_id, n_dup_windows, source_doc AS top_source_doc,
           n_windows AS top_source_windows
    FROM rk WHERE rn = 1
    """,
    doc="Removal lineage for ExactSubstr dedup: per doc that loses "
    "content, the total duplicated L-gram windows plus the earlier "
    "document owning the first occurrence of the largest share of them "
    "(ties to the lower source id) — the 'doc X was cut because doc Y "
    "already said it' audit a curation run pins next to its removal "
    "counts. Engine path (operators/curation.py::"
    "exact_substring_provenance): same linear scan-side gram stage as "
    "the dedup, one (doc, source) partial-agg count, one per-doc "
    "struct argmax; no pairwise stage.",
    tags=("llm", "dedup", "curation", "lineage"),
)
def q_substring_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import exact_substring_provenance

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_substring_provenance(docs, min_len=_XS_L)


_PROV_RATE = 0.25
_PROV_THRESH = format(int(_PROV_RATE * 65536), "04x")


@register(
    "q_substring_provenance_sampled",
    # The oracle recomputes totals from the attribution rows (count of
    # dup windows), NOT via the engine's firsts-ownership identity —
    # the hash proves that identity. The collapse derivation itself
    # (copies inherit their rep's attribution; corpus-firsts over reps
    # = corpus-firsts over the corpus) is proven by the FULL report's
    # gate, whose oracle runs over all docs with no collapse
    # (q_substring_provenance above). The sampling rule is shared
    # verbatim: occurrences drawn at the UNIQUE-TEXT grain (salt|rep|q,
    # rep = min doc_id of the text), so every copy of a text inherits
    # the same sampled attribution vector.
    sql=f"""
    WITH raw AS (SELECT doc_id, text, length(text) AS n,
                        CAST(min(doc_id) OVER (PARTITION BY md5(text))
                             AS BIGINT) AS rep
                 FROM documents),
    d AS (SELECT doc_id, text, n FROM raw WHERE doc_id = rep),
    {exact_substring_gram_ctes(_XS_L)},
    att AS (SELECT g.doc_id AS rep, g.q,
                   CAST(f.first_key // 1000000 AS BIGINT) AS source_doc,
                   (g.doc_id * 1000000 + g.q > f.first_key) AS is_dup
            FROM g JOIN f USING (gram)),
    tot AS (SELECT r.doc_id,
                   CAST(count(*) FILTER (
                        WHERE a.is_dup OR r.doc_id <> r.rep)
                        AS BIGINT) AS n_dup_windows
            FROM raw r JOIN att a ON a.rep = r.rep
            GROUP BY 1),
    katt AS (SELECT * FROM att
             WHERE substr(md5('xsprov' || '|' || rep || '|' || q), 1, 4)
                   < '{_PROV_THRESH}'),
    cnt AS (SELECT r.doc_id, k.source_doc,
                   CAST(count(*) AS BIGINT) AS n_windows
            FROM raw r JOIN katt k ON k.rep = r.rep
                                  AND (k.is_dup OR r.doc_id <> r.rep)
            GROUP BY 1, 2),
    rk AS (SELECT doc_id, source_doc, n_windows,
                  CAST(sum(n_windows) OVER (PARTITION BY doc_id)
                       AS BIGINT) AS n_sampled_windows,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY n_windows DESC,
                                              source_doc ASC) AS rn
           FROM cnt)
    SELECT t.doc_id, t.n_dup_windows,
           coalesce(r.n_sampled_windows, 0) AS n_sampled_windows,
           CAST(r.source_doc AS BIGINT) AS top_source_doc,
           coalesce(r.n_windows, 0) AS top_source_windows
    FROM (SELECT * FROM tot WHERE n_dup_windows > 0) t
    LEFT JOIN (SELECT * FROM rk WHERE rn = 1) r USING (doc_id)
    """,
    doc="Sampled removal lineage (VERDICT r7 #7): the full provenance "
    "audit's output grows with dup OCCURRENCES (2.2x on the 10x probe "
    "before the round-8 collapse-first rewrite), so this variant "
    "attributes sources from a deterministic 25% md5-bucket sample of "
    "window occurrences drawn at the UNIQUE-TEXT grain (salt|rep|q "
    "under the hash_sample threshold contract — bit-identical in any "
    "engine with md5, identical for every exact copy of a text) while "
    "n_dup_windows stays EXACT via the firsts-ownership identity "
    "(windows minus corpus-firsts owned), never touching the sampled "
    "join. Docs whose windows all miss the sample report NULL/0 "
    "attribution rather than a fabricated source. Engine path "
    "operators/curation.py::exact_substring_provenance_sampled "
    "(collapse-first; copies derive their rep's attribution).",
    tags=("llm", "dedup", "curation", "lineage", "sampling"),
)
def q_substring_provenance_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.curation import exact_substring_provenance_sampled

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_substring_provenance_sampled(
        docs, min_len=_XS_L, rate=_PROV_RATE
    )


_XS_HITS_MAX_ID = 100  # batch slice the per-occurrence audit runs on


@register(
    "q_xs_gram_hits",
    sql=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
               WHERE doc_id < {_XS_HITS_MAX_ID}),
    {exact_substring_gram_ctes(_XS_L)}
    SELECT g.doc_id, CAST(g.q AS BIGINT) AS q, g.gram,
           CAST(min(g.doc_id * 1000000 + g.q) OVER (
                PARTITION BY gram
                ORDER BY g.doc_id * 1000000 + g.q
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                // 1000000 AS BIGINT) AS first_source_doc,
           CAST(count(*) OVER (
                PARTITION BY gram
                ORDER BY g.doc_id * 1000000 + g.q
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS n_prior
    FROM g
    """,
    doc="Per-occurrence ExactSubstr gram hits in corpus (doc, pos) "
    "order: for every L-gram window, the doc owning the gram's "
    "earliest prior occurrence (NULL for the first) and the prior "
    "count — n_prior > 0 IS the ExactSubstr drop rule per window. "
    "Batch twin of the STREAMING gram-index maintenance "
    "(streaming/stateful.py::xs_gram_index, applyInPandasWithState "
    "with two-BIGINT per-gram state), exactly as q_minhash_bucket_hits "
    "twins the streaming MinHash index; stream-equivalence pinned in "
    "test_streaming_sinks.py. Run on batch slices (here docs < "
    f"{_XS_HITS_MAX_ID}) — the audit is per-occurrence-sized. Engine "
    "path operators/curation.py::xs_gram_hits.",
    tags=("llm", "dedup", "streaming-twin"),
)
def q_xs_gram_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import xs_gram_hits

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < _XS_HITS_MAX_ID)
    )
    return xs_gram_hits(docs, min_len=_XS_L)


@register(
    "q_substring_provenance_longdoc",
    sql=f"""
    WITH {_xs_longdoc_gram_ctes()},
    cnt AS (SELECT g.doc_id,
                   CAST(f.first_key // 2147483648 AS BIGINT) AS source_doc,
                   CAST(count(*) AS BIGINT) AS n_windows
            FROM g JOIN f USING (gram)
            WHERE g.doc_id * 2147483648 + g.q > f.first_key
            GROUP BY 1, 2),
    rk AS (SELECT doc_id, source_doc, n_windows,
                  CAST(sum(n_windows) OVER (PARTITION BY doc_id)
                       AS BIGINT) AS n_dup_windows,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY n_windows DESC,
                                              source_doc ASC) AS rn
           FROM cnt)
    SELECT doc_id, n_dup_windows, source_doc AS top_source_doc,
           n_windows AS top_source_windows
    FROM rk WHERE rn = 1
    """,
    doc="Removal lineage with the long_doc='chunk' escape hatch — the "
    "family-wide completion of VERDICT r8 #1: the same documents ∪ "
    ">1M-char synthetic book corpus as q_exact_substring_longdoc, "
    "through exact_substring_provenance(long_doc='chunk'). Chunked "
    "first-keys decode to their owner doc with two integer divides "
    "((key div (stride+1)) div max_chunks) instead of one — still the "
    "exact keep-first attribution, since chunk keys preserve global "
    "corpus order. The book attributes its dominant share to the seed "
    "doc that first said its content; the oracle recomputes the rule "
    "over the pre-chunked corpus at a 2^31 key base with no guard. "
    "Engine path operators/curation.py::exact_substring_provenance.",
    tags=("llm", "dedup", "curation", "lineage", "longdoc"),
)
def q_substring_provenance_longdoc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.curation import exact_substring_provenance

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed = (
        docs.filter(F.length("text") > 0)
        .agg(F.min_by("text", "doc_id").alias("text"))
        .select(
            F.lit(_XS_BOOK_ID).cast("long").alias("doc_id"),
            F.expr(
                f"repeat(text, cast(ceil({_XS_BOOK_MIN}.0 / length(text))"
                " as int))"
            ).alias("text"),
        )
    )
    corpus = docs.unionByName(seed)
    return exact_substring_provenance(corpus, min_len=_XS_L, long_doc="chunk")
