"""Filter-query operators (reference ``article_querry.py:13-28``).

The reference applies up to four optional conjunctive predicates over a
pandas frame then slices ``head(limit)``. Here the same query surface is
a lazy chain of Catalyst-pushable filters; the limit requires an
explicit total order so results are deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def contains_any(cols: list[Column], needle: str) -> Column:
    """Null-safe, case-insensitive substring match across columns.

    Mirrors ``lower(title).str.contains(t, na=False) | lower(abstract)...``
    (reference ``article_querry.py:14-17``). Spark's ``contains`` on a
    NULL column yields NULL, which ``filter`` drops — the same rows the
    pandas ``na=False`` drops — but we coalesce explicitly so the
    predicate is also usable in projections.
    """
    needle_lit = F.lit(needle.lower())
    pred = F.lit(False)
    for c in cols:
        pred = pred | F.coalesce(F.lower(c).contains(needle_lit), F.lit(False))
    return pred


def filter_articles(
    df: DataFrame,
    term: str | None = None,
    institution: str | None = None,
    year: int | str | None = None,
    keyword: str | None = None,
    limit: int = 10,
    order_by: str = "title",
) -> DataFrame:
    """Multi-predicate filter query (P1–P4).

    - ``term``: substring OR across title/abstract (P1)
    - ``institution``: substring over the flattened institutions (P2)
    - ``year``: string-cast equality, matching the reference's
      ``astype(str) == str(year)`` (P3, ``article_querry.py:22-23``)
    - ``keyword``: real array semantics — ``exists(keywords, contains)``
      instead of the reference's substring-over-stringified-list (P2)
    - deterministic ``order_by`` before ``limit`` (P4): pandas ``head``
      is file-order, which has no distributed meaning.
    """
    if term:
        df = df.filter(contains_any([F.col("title"), F.col("abstract")], term))
    if institution:
        flat = F.array_join(F.flatten(F.col("institutions")), "; ")
        df = df.filter(F.lower(flat).contains(institution.lower()))
    if year is not None:
        df = df.filter(F.col("year").cast("string") == str(year))
    if keyword:
        kw = keyword.lower()
        df = df.filter(F.exists("keywords", lambda k: F.lower(k).contains(F.lit(kw))))
    return df.orderBy(order_by).limit(limit)


def truncate_col(col: Column, max_len: int = 100) -> Column:
    """Display ellipsization (P12, reference ``scrappy.py:385``)."""
    return F.when(
        F.length(col) > max_len,
        F.concat(F.substring(col, 1, max_len), F.lit("...")),
    ).otherwise(col)


def normalize_term(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics, trim (P9, ``scrappy.py:46-47``)."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", ""))


def flatten_institutions(col: Column, sep: str = "; ") -> Column:
    """Flatten list-of-lists and join (P11, ``scrappy.py:318-320``)."""
    return F.array_join(F.flatten(col), sep)
