"""Third batch: classic TPC-H showcase joins (Q3/Q5 shapes) and the
remaining Python-integration surfaces — ``applyInPandas`` grouped-map
and a Python UDTF — each with a pure-SQL oracle proving the Python
path computes exactly what the relational semantics say.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_tpch_q3_shape",
    sql="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): selective dim filter -> "
    "fact join -> agg -> top-10. Catalyst pushes both date predicates "
    "into the scans and broadcasts the filtered customer side.",
    tags=("join", "tpch"),
)
def q_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q_tpch_q5_shape",
    sql="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): six-way join with a "
    "same-nation residual — the join-ordering stress test; dims "
    "broadcast, facts join on keys.",
    tags=("join", "tpch"),
)
def q_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q_grouped_map_zscore",
    sql="""
    SELECT doc_id, lang,
           round(CASE WHEN sd > 0 THEN (n_chars - mu) / sd ELSE 0.0 END, 4) AS z
    FROM (SELECT doc_id, lang, n_chars,
                 avg(n_chars)         OVER (PARTITION BY lang) AS mu,
                 stddev_samp(n_chars) OVER (PARTITION BY lang) AS sd
          FROM documents)
    """,
    doc="applyInPandas grouped-map: per-language z-score of document "
    "length, computed by a Python kernel per group — oracle is the pure "
    "window-function formulation, proving the Python path preserves "
    "relational semantics.",
    tags=("udf", "grouped-map"),
)
def q_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        z = (pdf["n_chars"] - mu) / sd if pd.notna(sd) and sd > 0 else 0.0
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z": (z).round(4)}
        )

    return d.groupBy("lang").applyInPandas(
        zscore, schema="doc_id long, lang string, z double"
    )


@register(
    "q_udtf_split",
    sql="""
    SELECT doc_id, seg_idx, segment FROM (
        SELECT doc_id,
               CAST(generate_subscripts(segs, 1) AS BIGINT) AS seg_idx,
               unnest(segs) AS segment
        FROM (SELECT doc_id, string_split(text, ' a ') AS segs
              FROM documents WHERE doc_id < 20))
    WHERE length(segment) > 0
    """,
    doc="Python UDTF (table function): one-to-many text segmentation "
    "with ordinal output — oracle via unnest with subscripts.",
    tags=("udf", "udtf"),
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="seg_idx: long, segment: string")
    class SplitSegments:
        def eval(self, doc_id: int, text: str):
            for i, seg in enumerate(text.split(" a ")):
                if seg:
                    yield i + 1, seg

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("split_segments", SplitSegments)
    return spark.sql(
        """
        SELECT doc_id, s.seg_idx, s.segment
        FROM __udtf_docs, LATERAL split_segments(doc_id, text) s
        """
    )


@register(
    "q_cogroup_asof",
    sql="""
    SELECT e.event_id, e.user_id, e.ts AS error_ts, c.ts AS prev_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    doc="Cogrouped-map applyInPandas: the as-of join expressed as a "
    "per-user pandas merge_asof over cogrouped (errors, clicks) — the "
    "sixth and last Python-integration surface (§2.10). Oracle is the "
    "same ASOF JOIN that checks q_asof_join's pure-DataFrame merge "
    "pattern, proving the Python path preserves the semantics. Both "
    "sides shuffle once on user_id; each group's Arrow batch pair "
    "reaches one kernel call.",
    tags=("udf", "cogroup", "asof"),
)
def q_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    # distinct name on the click side: both inputs descend from the
    # same scan, and a shared `ts` attribute lets the optimizer prune
    # the click-side column away under limit() (self-cogroup
    # ambiguity) — the kernel would then see clk without its timestamp
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )

    def asof(err: pd.DataFrame, clk: pd.DataFrame) -> pd.DataFrame:
        # a user present on only one side gets an EMPTY frame for the
        # other (without columns) — bail before touching columns
        if err.empty or clk.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "error_ts", "prev_click_ts"]
            )
        err = err.sort_values("ts")
        m = pd.merge_asof(
            err,
            clk.sort_values("c_ts").rename(columns={"c_ts": "prev_click_ts"})[
                ["prev_click_ts"]
            ].assign(__t=lambda d: d["prev_click_ts"]),
            left_on="ts",
            right_on="__t",
            direction="backward",
        )
        m = m[m["prev_click_ts"].notna()]
        return pd.DataFrame(
            {
                "event_id": m["event_id"],
                "user_id": m["user_id"],
                "error_ts": m["ts"],
                "prev_click_ts": m["prev_click_ts"],
            }
        )

    return (
        errors.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof,
            schema="event_id long, user_id long, error_ts timestamp, "
            "prev_click_ts timestamp",
        )
    )


@register(
    "q_arrow_udf_score",
    sql="""
    SELECT doc_id,
           (length(lower(text))
            - length(regexp_replace(lower(text), '[aeiou]', '', 'g')))
           * 1000 // length(text) AS vowel_permille
    FROM documents WHERE length(text) > 0
    """,
    doc="Arrow-optimized scalar Python UDF (useArrow=True): per-doc "
    "vowel density in permille, integer arithmetic so the pure-SQL "
    "oracle hash-matches exactly. Demonstrates the sanctioned shape "
    "for unavoidable scalar Python — Arrow batch transfer instead of "
    "pickled rows (~10× less serialization); the policy remains "
    "built-ins first (this exact expression SHOULD be regexp_replace "
    "in production — the query exists to prove the surface).",
    tags=("udf", "arrow"),
)
def q_arrow_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf

    @udf(returnType="long", useArrow=True)
    def vowel_permille(text: str) -> int:
        low = text.lower()
        return sum(low.count(v) for v in "aeiou") * 1000 // len(text)

    return (
        _t(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", vowel_permille("text").alias("vowel_permille"))
    )
