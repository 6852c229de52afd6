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
           CAST(CASE WHEN t.nd > 0 THEN
                    count(*) FILTER (WHERE j.milli >= g.t_milli)
                    * 1000000 // t.nd ELSE 0 END AS BIGINT)
               AS kept_docs_ppm,
           CAST(CASE WHEN t.nw > 0 THEN
                    coalesce(sum(j.n_chars)
                        FILTER (WHERE j.milli >= g.t_milli), 0)
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
                 CAST(row_number() OVER (PARTITION BY lang
                                         ORDER BY source ASC) AS BIGINT)
                     AS file_seq,
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
