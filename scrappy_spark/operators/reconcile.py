"""Two-table reconciliation: the migration-audit diff.

When a 100 TB table is restated — a backfill, an engine migration, a
vendor re-delivery — the first question is "what changed?", and the
answer must come back as a REPORT, not a row dump nobody can read.
``reconcile_report`` full-outer-joins old and new on the primary key
and compiles, in one pass, a per-column scoreboard: how many keys are
only-left (lost), only-right (new), present in both, and — among the
both-present keys — how many values match under null-safe equality.

Scale shape: one shuffle join on the key (both sides pre-projected to
key + compared columns only), then a single groupBy-less agg whose
counters are parallel conditional sums (the ``expectations_report``
idiom), unpivoted via a zero-shuffle ``stack``.  Nothing is collected;
the triage companion ``mismatch_rows`` is bounded by ``limit``.

Distinct from ``sources/snapshots.py::row_diff`` (CDC between commits
of ONE snapshot table): this reconciles two ARBITRARY frames that share
a key, e.g. a table before and after an engine migration.

The reference has no multi-table audit surface (its merge just
concatenates and drops duplicate titles, scrappy.py:560-575); this is
a first-class engine extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MICRO = 1_000_000


def reconcile_report(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Per-column reconciliation scoreboard.

    Assumes ``keys`` identify at most one row per side (reconciliation
    on a primary key — assert that separately with
    ``expectations.expect_unique`` if the source is untrusted; a
    duplicated key would fan out the join and inflate every counter).

    Output, one row per compared column:
    ``(column, n_only_left, n_only_right, n_both, n_match,
    n_mismatch, match_ppm)`` where match/mismatch partition the
    both-present keys under null-safe equality (NULL == NULL is a
    match; NULL vs value is a mismatch) and
    ``match_ppm = n_match·10⁶ div n_both`` (0 when nothing overlaps).
    """
    if not compare_cols:
        raise ValueError("reconcile_report needs >= 1 compare column")
    lhs = left.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__in_l"),
        *[F.col(c).alias(f"__l_{c}") for c in compare_cols],
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__in_r"),
        *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
    )
    j = lhs.join(rhs, keys, "full_outer")
    in_l = F.col("__in_l").isNotNull()
    in_r = F.col("__in_r").isNotNull()

    def n(cond) -> F.Column:
        return F.coalesce(F.sum(cond.cast("long")), F.lit(0)).cast("long")

    aggs = [
        n(in_l & ~in_r).alias("n_only_left"),
        n(~in_l & in_r).alias("n_only_right"),
        n(in_l & in_r).alias("n_both"),
    ]
    for i, c in enumerate(compare_cols):
        match = F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
        aggs.append(n(in_l & in_r & match).alias(f"__m_{i}"))
    one = j.agg(*aggs)
    # Column-API unpivot, not a stack() SQL string — column names are
    # caller data and must not be spliced into parsed SQL text (see
    # expectations.py::expectations_report for the full note)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__m_{i}").alias("n_match"),
                )
                for i, c in enumerate(compare_cols)
            ]
        )
    ).alias("__r")
    stacked = one.select(
        "n_only_left", "n_only_right", "n_both", rows
    ).select(
        F.col("__r.column").alias("column"),
        "n_only_left",
        "n_only_right",
        "n_both",
        F.col("__r.n_match").alias("n_match"),
    )
    return stacked.select(
        "column",
        "n_only_left",
        "n_only_right",
        "n_both",
        "n_match",
        (F.col("n_both") - F.col("n_match")).cast("long").alias("n_mismatch"),
        F.when(
            F.col("n_both") > 0,
            F.expr(f"(n_match * {_MICRO}) div n_both"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("match_ppm"),
    )


def mismatch_rows(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    column: str,
    limit: int = 100,
) -> DataFrame:
    """Triage companion: a bounded sample of both-present keys whose
    ``column`` values differ, as ``(keys..., left_value,
    right_value)``."""
    lhs = left.select(*keys, F.col(column).alias("left_value"))
    rhs = right.select(*keys, F.col(column).alias("right_value"))
    return (
        lhs.join(rhs, keys, "inner")
        .filter(~F.col("left_value").eqNullSafe(F.col("right_value")))
        .limit(int(limit))
    )
