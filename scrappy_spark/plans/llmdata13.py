"""LLM-corpus operators, round-8 wave: release-review and operations
surfaces — k-anonymity privacy audit, quality-floor calibration sweep,
and small-file compaction planning.

The reference has none of these (scrappy.py's closest surface is an
ad-hoc ``df.head()`` print); they extend the engine's curation/ops
families with the three questions a corpus RELEASE actually asks:
"can any row be re-identified?", "which quality floor fits the token
budget?", and "how do we rewrite this table's 400k small files?".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .registry import _REGISTRY, register

_KA_K = 10  # k-anonymity threshold for the declared audit


@register(
    "q_k_anonymity",
    sql=f"""
    SELECT lang, source, CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(*) < {_KA_K} AS BIGINT) AS at_risk
    FROM documents GROUP BY lang, source
    """,
    doc=f"k-anonymity privacy audit (Sweeney 2002) over the "
    f"(lang, source) quasi-identifier combination: per observed QI "
    f"group, its size and an at_risk flag (size < {_KA_K}) — the "
    "release-review companion to scrub_pii (direct identifiers are "
    "scrubbed; THIS catches re-identification through rare attribute "
    "combinations). Several fixture strata genuinely sit under k, so "
    "both flag branches hash. One partial-agg groupBy at QI "
    "cardinality; rows never cross the shuffle. Engine path "
    "operators/profile.py::k_anonymity_profile.",
    tags=("quality", "privacy", "profile"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import k_anonymity_profile

    docs = load_table(spark, sf_dir, "documents")
    return k_anonymity_profile(docs, ["lang", "source"], k=_KA_K)


def _quality_sweep_sql() -> str:
    """Compose the sweep oracle ON TOP of the registered
    q_quality_score oracle text (registry lookup, not a copied
    formula), so the two gates can never drift: the sweep pins the
    same score the per-doc gate pins."""
    from . import llmdata2  # noqa: F401  (ensures q_quality_score registered)

    score_sql = _REGISTRY["q_quality_score"].sql
    return f"""
    WITH q AS ({score_sql}),
    j AS (SELECT q.doc_id,
                 CAST(round(q.quality_score * 1000) AS BIGINT) AS milli,
                 d.n_chars
          FROM q JOIN documents d USING (doc_id)),
    grid AS (SELECT CAST(unnest(generate_series(0, 950, 50)) AS BIGINT)
                 AS t_milli),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                   CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS nw
            FROM j)
    SELECT g.t_milli,
           CAST(count(*) FILTER (WHERE j.milli >= g.t_milli) AS BIGINT)
               AS kept_docs,
           CAST(coalesce(sum(j.n_chars)
                    FILTER (WHERE j.milli >= g.t_milli), 0) AS BIGINT)
               AS kept_weight,
           -- HUGEINT ppm products mirror the engine's DECIMAL path:
           -- kept_weight * 1e6 wraps BIGINT at ~1e14-char corpora
           -- (ADVICE r8 #2); both sides floor-divide identically.
           CAST(CASE WHEN t.nd > 0 THEN
                    count(*) FILTER (WHERE j.milli >= g.t_milli)::HUGEINT
                    * 1000000 // t.nd ELSE 0 END AS BIGINT)
               AS kept_docs_ppm,
           CAST(CASE WHEN t.nw > 0 THEN
                    coalesce(sum(j.n_chars)
                        FILTER (WHERE j.milli >= g.t_milli), 0)::HUGEINT
                    * 1000000 // t.nw ELSE 0 END AS BIGINT)
               AS kept_weight_ppm
    FROM grid g CROSS JOIN j CROSS JOIN tot t
    GROUP BY g.t_milli, t.nd, t.nw
    """


@register(
    "q_quality_floor_sweep",
    sql=_quality_sweep_sql(),
    doc="Quality-floor calibration curve: for each candidate floor "
    "(milli-score grid 0..950 step 50), the documents and characters a "
    "quality_score >= t filter would keep, exact counts + ppm shares — "
    "the table that turns 'pick a quality floor' into 'pick the floor "
    "that keeps the token budget' without re-running the corpus filter "
    "per guess. Engine is ONE scan with 2x|grid| conditional partial "
    "aggregates + a zero-shuffle struct explode (the expectations-"
    "report shape; no doc x threshold blow-up); the oracle recomposes "
    "the registered q_quality_score SQL so the two gates share one "
    "formula. Engine path operators/textstats.py::quality_floor_sweep.",
    tags=("llm", "quality", "curation"),
)
def q_quality_floor_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import quality_floor_sweep

    docs = load_table(spark, sf_dir, "documents")
    return quality_floor_sweep(docs, weight_col="n_chars")


_CP_TARGET = 4096  # bytes per compacted target file in the declared plan


@register(
    "q_compaction_plan",
    sql=f"""
    WITH m AS (SELECT lang, source,
                      CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS bytes
               FROM documents GROUP BY lang, source),
    w AS (SELECT lang, source, bytes,
                 -- mirrors the engine's in-window ordering-key tie
                 -- assert (ADVICE r8 #5): a duplicate (lang, source)
                 -- would make the packing order nondeterministic.
                 CAST(CASE WHEN lag(source) OVER (PARTITION BY lang
                               ORDER BY source ASC) IS NOT DISTINCT
                               FROM source
                      THEN error('compaction ordering-key tie')
                      ELSE row_number() OVER (PARTITION BY lang
                                              ORDER BY source ASC)
                      END AS BIGINT) AS file_seq,
                 CAST(coalesce(sum(bytes) OVER (PARTITION BY lang
                          ORDER BY source ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS before
          FROM m)
    SELECT lang, source, bytes, file_seq,
           CAST(before // {_CP_TARGET} AS BIGINT) AS target_file
    FROM w
    """,
    doc="Small-file compaction plan: pack per-(lang, source) byte "
    "units into ~4 KB target files within each lang partition — the "
    "greedy one-window-pass bin assignment (running bytes BEFORE each "
    "entry, integer-divided by the target) behind rewriting a "
    "long-lived table's small files into right-sized ones. Partition-"
    "local by construction (compaction never merges across table "
    "partitions, and the manifest window never global-sorts). A "
    "boundary entry may overflow its target by less than its own size "
    "— documented greedy semantics, exact bin packing buys nothing "
    "here. Engine path operators/layout.py::compaction_plan over a "
    "manifest derived from the documents table.",
    tags=("layout", "storage", "ops"),
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import compaction_plan

    manifest = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("bytes"))
    )
    return compaction_plan(
        manifest,
        bytes_col="bytes",
        partition_cols=["lang"],
        order_cols=["source"],
        target_bytes=_CP_TARGET,
    )


# ---------------------------------------------------------------------------
# Token-budget mixture planner
# ---------------------------------------------------------------------------

_MIX_BUDGET = 150_000
_MIX_WEIGHTS = {"en": 0.5, "de": 0.2, "fr": 0.15, "es": 0.1, "zh": 0.05}


def _mixture_plan_sql() -> str:
    values = ", ".join(
        f"('{d}', {int(round(w * 1_000_000))})"
        for d, w in _MIX_WEIGHTS.items()
    )
    # HUGEINT products mirror the engine's DECIMAL arithmetic: both are
    # exact far past the ~9.2e12-token budget where BIGINT ppm products
    # wrap (ADVICE r8 #1), and both floor-divide identically.
    tgt = f"(target_weight_ppm::HUGEINT * {_MIX_BUDGET} // 1000000)"
    return f"""
    WITH w0 AS (SELECT * FROM (VALUES {values})
                    AS t(lang, target_weight_ppm)),
    a AS (SELECT lang,
                 CAST(coalesce(sum(n_chars), 0) AS BIGINT)
                     AS available_tokens
          FROM documents GROUP BY lang),
    w AS (SELECT coalesce(a.lang, w0.lang) AS lang,
                 CAST(coalesce(a.available_tokens, 0) AS BIGINT)
                     AS available_tokens,
                 CAST(coalesce(w0.target_weight_ppm, 0) AS BIGINT)
                     AS target_weight_ppm
          FROM a FULL JOIN w0 ON a.lang = w0.lang)
    SELECT lang, available_tokens, target_weight_ppm,
           CAST({tgt} AS BIGINT) AS target_tokens,
           CAST(CASE WHEN available_tokens = 0 THEN 0
                WHEN {tgt} >= available_tokens THEN 1000000
                ELSE {tgt} * 1000000 // available_tokens
                END AS BIGINT) AS sample_rate_ppm,
           CAST(CASE WHEN available_tokens = 0 THEN 0
                ELSE {tgt} * 1000 // available_tokens
                END AS BIGINT) AS epochs_milli,
           CAST({tgt} > available_tokens AS BIGINT) AS under_supplied
    FROM w
    """


@register(
    "q_mixture_plan",
    sql=_mixture_plan_sql(),
    doc="Token-budget mixture planner: target per-language weights + a "
    "total budget -> per domain, available tokens, target tokens, the "
    "mix_corpora sampling rate when it over-supplies (exact ppm), "
    "epochs in milli units when it under-supplies, and an "
    "under_supplied flag — the planning table behind '3 epochs of "
    "Wikipedia, 0.1 of CommonCrawl', all integer-exact. The fixture "
    "exercises both branches (en/de under-supply the big targets at "
    "this budget; small languages over-supply). One groupBy at domain "
    "cardinality. Engine path operators/curation.py::mixture_plan.",
    tags=("llm", "curation", "mixing"),
)
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import mixture_plan

    docs = load_table(spark, sf_dir, "documents")
    return mixture_plan(
        docs, _MIX_WEIGHTS, _MIX_BUDGET, domain_col="lang",
        tokens_col="n_chars",
    )


# ---------------------------------------------------------------------------
# Segment-level language profile (code-switching detector)
# ---------------------------------------------------------------------------

_SEG_TOKENS = 20


def _segment_lang_sql() -> str:
    from ..operators.textstats import LANG_MARKERS
    from .llmdata import _RAW_TOKS

    langs = list(LANG_MARKERS)
    score_cols = ",\n           ".join(
        "CAST(len(list_intersect(st, [{ws}])) AS BIGINT) AS score_{lg}".format(
            ws=", ".join(f"'{w}'" for w in LANG_MARKERS[lg]), lg=lg
        )
        for lg in langs
    )
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lg} = {best} AND {best} > 0 THEN '{lg}'"
        for lg in langs
    ) + " ELSE 'und' END"
    prec = "CASE pred " + " ".join(
        f"WHEN '{lg}' THEN {i}" for i, lg in enumerate(langs)
    ) + f" ELSE {len(langs)} END"
    s = _SEG_TOKENS
    return f"""
    WITH t AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    seg AS (SELECT doc_id,
                   list_distinct(list_slice(toks,
                       CAST(u.s AS INT) * {s} + 1,
                       CAST(u.s AS INT) * {s} + {s})) AS st
            FROM t, unnest(generate_series(0,
                     CAST(ceil(len(toks) / {s}.0) AS INT) - 1)) AS u(s)
            WHERE len(toks) > 0),
    sc AS (SELECT doc_id, {score_cols} FROM seg),
    p AS (SELECT doc_id, {case} AS pred FROM sc),
    v AS (SELECT doc_id, pred, CAST(count(*) AS BIGINT) AS votes
          FROM p GROUP BY 1, 2),
    r AS (SELECT doc_id, pred, votes,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY votes DESC, {prec} ASC) AS rn
          FROM v),
    d AS (SELECT doc_id,
                 CAST(sum(votes) AS BIGINT) AS n_segments,
                 max(CASE WHEN rn = 1 THEN pred END) AS majority_lang,
                 CAST(max(CASE WHEN rn = 1 THEN votes END) AS BIGINT)
                     AS majority_segments,
                 CAST(count(DISTINCT CASE WHEN pred <> 'und' THEN pred END)
                     AS BIGINT) AS n_langs
          FROM r GROUP BY doc_id)
    SELECT docs.doc_id,
           coalesce(d.n_segments, 0) AS n_segments,
           coalesce(d.majority_lang, 'und') AS majority_lang,
           coalesce(d.majority_segments, 0) AS majority_segments,
           coalesce(d.n_langs, 0) AS n_langs,
           CAST(coalesce(d.n_langs, 0) >= 2 AS BIGINT) AS mixed
    FROM documents docs LEFT JOIN d USING (doc_id)
    """


@register(
    "q_segment_lang_profile",
    sql=_segment_lang_sql(),
    doc=f"Segment-level language profile: the token stream cut into "
    f"{_SEG_TOKENS}-token windows, each window language-ID'd with the "
    "same marker-overlap heuristic as q_lang_id, then per doc the "
    "majority language by segment votes (ties by the fixed marker "
    "precedence), the vote counts, and a mixed flag (>= 2 distinct "
    "non-'und' segment languages) — the code-switching / pasted-"
    "foreign-paragraph detector a whole-document argmax averages "
    "away. Linear segment explode scan-side, ONE partial-agg groupBy "
    "at (doc, language) cardinality, one per-doc argmax window. "
    "Engine path operators/textstats.py::segment_lang_profile.",
    tags=("llm", "textstats", "curation"),
)
def q_segment_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import segment_lang_profile

    docs = load_table(spark, sf_dir, "documents")
    return segment_lang_profile(docs, seg_tokens=_SEG_TOKENS)


# ---------------------------------------------------------------------------
# Embedding bucket hits — batch twin of the streaming ANN index
# ---------------------------------------------------------------------------

_EB_PLANES = 8
_EB_TABLES = 4
_EB_SEED = 7
_EB_DIM = 64


def _embedding_bucket_sql() -> str:
    """Oracle with the SAME md5-parity hyperplanes as the engine,
    embedded as ±1 literal arrays (operators/similarity.py::
    _plane_signs — one source of truth), over int8-quantized codes so
    every projection is a sum of ±code integers: exact in double at
    any summation order, hence bit-identical buckets across engines
    (the reason the STREAMING index twin can take the full value-hash
    gate while the raw-float ANN family is banded-flag audited)."""
    from ..operators.similarity import _plane_signs

    def bucket_expr(t: int) -> str:
        bits = " + ".join(
            "(CASE WHEN list_dot_product(codes_d, [{signs}]) >= 0 "
            "THEN {bit} ELSE 0 END)".format(
                signs=", ".join(
                    str(s)
                    for s in _plane_signs(_EB_SEED + t, p, _EB_DIM)
                ),
                bit=1 << p,
            )
            for p in range(_EB_PLANES)
        )
        return f"CAST({bits} AS BIGINT)"

    table_rows = " UNION ALL ".join(
        f"SELECT vec_id, CAST({t} AS BIGINT) AS t, {bucket_expr(t)} AS bkt "
        "FROM q"
        for t in range(_EB_TABLES)
    )
    return f"""
    WITH e AS (SELECT vec_id,
                      CAST(list_min(embedding) AS DOUBLE) AS vmin,
                      CAST(list_max(embedding) AS DOUBLE)
                        - CAST(list_min(embedding) AS DOUBLE) AS rng,
                      embedding
               FROM embeddings),
    q AS (SELECT vec_id,
                 CASE WHEN rng = 0
                      THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
                      ELSE list_transform(embedding,
                           x -> CAST(round((CAST(x AS DOUBLE) - vmin)
                                           / (rng / 255.0)) AS DOUBLE))
                 END AS codes_d
          FROM e),
    rows_ AS ({table_rows})
    SELECT vec_id, t, bkt,
           CAST(min(vec_id) OVER (
                PARTITION BY t, bkt ORDER BY vec_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS first_vec_id,
           CAST(count(*) OVER (
                PARTITION BY t, bkt ORDER BY vec_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS n_prior
    FROM rows_
    """


@register(
    "q_embedding_bucket_hits",
    sql=_embedding_bucket_sql(),
    doc="Per-(vector, table) ANN cell occupancy in arrival order over "
    f"{_EB_TABLES}-table/{_EB_PLANES}-plane hyperplane LSH of the "
    "int8-QUANTIZED embeddings: earliest prior occupant of each "
    "(table, bucket) cell + prior count — priors in >= k tables mark "
    "an ANN near-dup candidate, the incremental form of the "
    "embedding_near_dup_pairs equi-join. Batch twin of the STREAMING "
    "vector index (streaming/stateful.py::embedding_bucket_index — "
    "the third member of the two-BIGINT bucket-index family after "
    "MinHash and ExactSubstr grams); stream-equivalence pinned in "
    "test_streaming_sinks.py. Quantization makes every plane "
    "projection a sum of +-code integers (exact in double at any "
    "order), so unlike the raw-float ANN audits this twin takes the "
    "FULL value-hash gate: the oracle re-derives the identical "
    "md5-parity planes as literal sign arrays. Engine path "
    "operators/similarity.py::embedding_bucket_hits over "
    "quantize_int8 codes.",
    tags=("llm", "similarity", "streaming-twin", "quantization"),
)
def q_embedding_bucket_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_bucket_hits, quantize_int8

    e = load_table(spark, sf_dir, "embeddings")
    codes = quantize_int8(e).select("vec_id", "codes")
    return embedding_bucket_hits(
        codes,
        n_planes=_EB_PLANES,
        n_tables=_EB_TABLES,
        seed=_EB_SEED,
        vec_col="codes",
        dim=_EB_DIM,
    )
