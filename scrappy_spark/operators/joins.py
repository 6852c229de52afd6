"""Join operators (SURVEY.md §2.3).

The reference encodes joins as Python set ops and dict lookups; the
engine exposes the full relational join suite plus the two patterns the
reference actually needs: theta-substring context joins (J3) and
defaulted lookup joins (J4). Helpers here add the scale discipline:
broadcast hints for dimension-sized sides and window-based per-group
top-k instead of driver slicing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def topk_per_group(
    df: DataFrame, group_by: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """A3/J3 helper: deterministic top-k rows per group via row_number.

    ``order_by`` must break ties totally (include a unique key last).
    One shuffle on ``group_by``; TakeOrdered semantics per group without
    collecting anything to the driver.
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def context_examples(
    terms: DataFrame,
    texts: DataFrame,
    term_col: str = "term",
    text_col: str = "text",
    n_examples: int = 2,
    example_order: list[str] | None = None,
) -> DataFrame:
    """J3: up to ``n_examples`` texts containing each term
    (reference ``scrappy.py:376-379``, an O(terms×docs) python loop).

    Spark shape: broadcast nested-loop join — the terms side is small
    (suggested terms), so ``F.broadcast`` makes the theta-predicate join
    a map-side scan of the texts, then a per-term window keeps the first
    ``n_examples`` deterministically.
    """
    joined = F.broadcast(terms).crossJoin(texts).filter(
        F.lower(F.col(text_col)).contains(F.lower(F.col(term_col)))
    )
    order = [F.col(c) for c in (example_order or [text_col])]
    return topk_per_group(joined, [term_col], order, n_examples)


def lookup_with_default(
    df: DataFrame,
    lookup: DataFrame,
    on: str,
    value_col: str,
    default: str,
) -> DataFrame:
    """J4: left join + coalesce default (reference ``scrappy.py:503-504``,
    a per-row dict ``.apply`` with a "No topic" fallback)."""
    return df.join(F.broadcast(lookup), on=on, how="left").withColumn(
        value_col, F.coalesce(F.col(value_col), F.lit(default))
    )


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_edit_distance: int = 3,
    block_expr: Column | None = None,
) -> DataFrame:
    """Entity-resolution candidate pairs: names within
    ``max_edit_distance`` edits, compared only inside blocks.

    The all-pairs levenshtein join is O(n²) and never acceptable at
    scale; blocking on a cheap canopy key — default: first token of
    the lowercased name — bounds comparisons to same-block pairs, the
    standard record-linkage shape. Callers pick a tighter
    ``block_expr`` (soundex, sorted-token prefix, LSH bucket) when
    the default blocks skew large. Output: (id_a, id_b, edit_dist),
    id_a < id_b.
    """
    if block_expr is None:
        block_expr = F.split(F.lower(F.col(name_col)), " ").getItem(0)
    base = df.select(
        F.col(id_col), F.col(name_col), block_expr.alias("__blk")
    )
    a = base.select(
        F.col(id_col).alias("id_a"), F.col(name_col).alias("__na"), "__blk"
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col(name_col).alias("__nb"), "__blk"
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__na", "__nb").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_edit_distance)
    )
