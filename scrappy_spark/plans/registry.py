"""Declared-query registry.

Every engine capability from SURVEY.md §2 is declared here as a
``QuerySpec``: a named Spark DataFrame builder plus (when the semantics
are SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
runs both at sf=0.01 and hash-compares row count + schema +
order-insensitive values; specs without SQL get a rows-only check.

Parity rules (so the hash compare is about semantics, not float dust):
- alias every computed column identically on both sides;
- round floating aggregates (sum/avg over doubles are associativity-
  sensitive; rounding to a few decimals removes the last-ulp noise);
- cast derived integers explicitly (DuckDB ``count``/``year`` return
  BIGINT; Spark's ``year`` returns INT — unify on BIGINT);
- order-insensitive hash means no ORDER BY is needed, but any LIMIT
  must be preceded by a total order on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, sql: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    # import plan modules lazily so registration happens on first use
    from . import (  # noqa: F401
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        mining,
        events,
        llmdata,
        llmdata2,
        llmdata3,
        llmdata4,
        sketches,
        extras,
    )

    # Sorted by name: the enumeration the driver sees must not depend on
    # module import order (round-1 left 24 late-registered queries out of
    # the driver's correctness file).
    return {name: _REGISTRY[name] for name in sorted(_REGISTRY)}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in all_specs().items() if spec.sql is not None}
