"""Declarative data-quality expectations (Deequ / dbt-test style).

A 100 TB ingest wants its contract checks — "order keys are unique",
"status is one of O/F/P", "prices are positive" — declared once and
verified in ONE scan, not as N ad-hoc queries.  This module compiles a
list of :class:`Expectation` declarations into a single groupBy-less
``agg`` (every violation counter is a parallel aggregate expression on
the same pass, the ``profile_columns`` idiom), then unpivots the one
result row into a report: one row per expectation with its violation
count and pass flag.

The reference has no validation surface at all (`scrappy.py` trusts
connector payloads and drops bad rows implicitly via pandas NaN
semantics); this is the engine-grade replacement and a first-class
pipeline gate: run the report, fail the job if ``min(passed) = 0``.

Scale notes: every expectation except ``unique`` is a plain
conditional-sum aggregate — map-side partials, one tiny reduce.
``unique`` uses exact ``count_distinct`` which rewrites to an Expand
(k× scan rows into the partial agg, same caveat as profile_columns);
at corpus scale either accept it (partials stay tiny) or gate
uniqueness on a bucketed groupBy in a dedicated job.  Nothing here
depends on row order, so the report is deterministic under any
partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True, eq=False)
class Expectation:
    """One declared constraint.

    ``bad`` is the row-local violation predicate (None for aggregate-
    only constraints like ``unique``); ``violations`` is the aggregate
    Column counting broken rows (or surplus occurrences).
    """

    name: str
    kind: str
    column: str
    violations: Column
    bad: Column | None = field(default=None)


def _sum_bad(bad: Column) -> Column:
    return F.coalesce(F.sum(bad.cast("long")), F.lit(0)).cast("long")


def expect_not_null(col: str, name: str | None = None) -> Expectation:
    bad = F.col(col).isNull()
    return Expectation(
        name or f"{col}_not_null",
        "not_null",
        col,
        (F.count(F.lit(1)) - F.count(F.col(col))).cast("long"),
        bad,
    )


def expect_unique(col: str, name: str | None = None) -> Expectation:
    """Surplus duplicate occurrences of non-null values: 0 iff every
    non-null value appears exactly once.  Aggregate-only (no row-local
    predicate) — a row is not a duplicate by itself."""
    return Expectation(
        name or f"{col}_unique",
        "unique",
        col,
        (F.count(F.col(col)) - F.count_distinct(F.col(col))).cast("long"),
    )


def expect_in(
    col: str, values: tuple | list, name: str | None = None
) -> Expectation:
    bad = F.col(col).isNotNull() & ~F.col(col).isin(*values)
    return Expectation(
        name or f"{col}_in_set", "accepted_values", col, _sum_bad(bad), bad
    )


def expect_between(col: str, lo, hi, name: str | None = None) -> Expectation:
    bad = F.col(col).isNotNull() & (
        (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))
    )
    return Expectation(
        name or f"{col}_between", "between", col, _sum_bad(bad), bad
    )


def expect_matches(
    col: str, pattern: str, name: str | None = None
) -> Expectation:
    bad = F.col(col).isNotNull() & ~F.col(col).rlike(pattern)
    return Expectation(
        name or f"{col}_matches", "regex", col, _sum_bad(bad), bad
    )


def expect_expr(name: str, sql_predicate: str, column: str = "") -> Expectation:
    """Violation = row where the boolean SQL predicate is not TRUE
    (NULL counts as a violation — an unknown contract is a broken
    contract)."""
    bad = ~F.coalesce(F.expr(sql_predicate), F.lit(False))
    return Expectation(name, "expr", column, _sum_bad(bad), bad)


def expectations_report(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """One scan → one row per expectation:
    ``(expectation, kind, column, n_rows, n_violations, passed)``.

    All violation counters ride the same agg (single pass over ``df``,
    parallel partial aggregates); the unpivot to report rows is a
    zero-shuffle ``stack`` over the one aggregated row.
    """
    if not expectations:
        raise ValueError("expectations_report needs >= 1 expectation")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        e.violations.alias(f"__v_{i}") for i, e in enumerate(expectations)
    ]
    one = df.agg(*aggs)
    # Column-API unpivot (explode of struct literals), NOT a stack()
    # SQL string: expectation names/columns are caller data (the JSON
    # pipeline feeds them straight through) and must never be spliced
    # into parsed SQL text — a quote in a column name would break the
    # parse or splice an expression into the report.
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(e.name).alias("expectation"),
                    F.lit(e.kind).alias("kind"),
                    F.lit(e.column).alias("column"),
                    F.col(f"__v_{i}").alias("n_violations"),
                )
                for i, e in enumerate(expectations)
            ]
        )
    ).alias("__r")
    return one.select("n_rows", rows).select(
        F.col("__r.expectation").alias("expectation"),
        F.col("__r.kind").alias("kind"),
        F.col("__r.column").alias("column"),
        "n_rows",
        F.col("__r.n_violations").alias("n_violations"),
        (F.col("__r.n_violations") == 0).cast("long").alias("passed"),
    )


def failing_rows(
    df: DataFrame, expectation: Expectation, limit: int = 100
) -> DataFrame:
    """Debug companion: a bounded sample of the rows breaking one
    row-local expectation (aggregate-only kinds like ``unique`` have
    no row-local predicate — group on the column instead)."""
    if expectation.bad is None:
        raise ValueError(
            f"{expectation.name} ({expectation.kind}) is aggregate-only"
        )
    return df.filter(expectation.bad).limit(int(limit))
