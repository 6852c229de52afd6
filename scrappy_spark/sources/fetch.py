"""Distributed, politeness-bounded article fetching (EP2 ingest path).

The reference loops 5 APIs × all terms serially on one thread with
``time.sleep(1)`` per request (scrappy.py:283-322) — the 100 TB-scale
redesign moves the network boundary to the executors:

    terms DataFrame → repartition by (source, term) → mapInPandas
    fetch (per-partition token-bucket rate limiter) → normalized
    articles rows in the fixed schema.

Politeness math: each API's global rate limit is preserved by giving
each API its own partition set; within a partition the limiter enforces
``min_interval``. Running P partitions for the same API in parallel
would multiply the request rate, so partitioning is BY SOURCE first —
one partition per API by default (matching the reference's 1 req/s/API),
scale out per-API only when the API's own limit allows.

Retry safety: tasks are retried by Spark; fetches are term-keyed and
idempotent (same term → same request), and failures follow the
reference's log-and-continue policy (scrappy.py:93-98) so one bad term
never fails the batch.

Tests inject recorded-payload fetchers (no network in CI); a real
deployment injects an HTTP fetcher with its API keys.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schema import ARTICLES_SCHEMA
from .normalizers import NORMALIZERS

#: fetcher: (source, term) -> raw payload text (or None on failure).
Fetcher = Callable[[str, str], str | None]

#: reference politeness defaults (scrappy.py:117,145,171,244,279)
DEFAULT_MIN_INTERVAL = {"SemanticScholar": 1.1}
FALLBACK_MIN_INTERVAL = 1.0

_FETCH_SCHEMA = T.StructType(
    [f for f in ARTICLES_SCHEMA.fields if f.name != "date_added"]
)


class RateLimiter:
    """Token-interval limiter: sleeps so consecutive ``wait()`` calls on
    this instance are ≥ ``min_interval`` apart (monotonic clock)."""

    def __init__(self, min_interval: float):
        self.min_interval = min_interval
        self._last = 0.0

    def wait(self) -> None:
        now = time.monotonic()
        delta = now - self._last
        if delta < self.min_interval:
            time.sleep(self.min_interval - delta)
        self._last = time.monotonic()


def fetch_articles(
    spark: SparkSession,
    terms: list[str],
    fetcher: Fetcher,
    sources: list[str] | None = None,
    min_interval: dict[str, float] | None = None,
    date_added: str | None = None,
) -> DataFrame:
    """Fetch ``terms`` from every source; return articles DataFrame.

    One partition per source (politeness unit); within it the limiter
    paces requests. The returned frame carries the injected
    ``date_added`` (a fixed date in tests — the reference stamps
    merge-day, scrappy.py:330-331).
    """
    sources = sources or list(NORMALIZERS)
    intervals = {**DEFAULT_MIN_INTERVAL, **(min_interval or {})}

    from ..functions.localrel import local_relation

    tasks = local_relation(
        spark, [(s, t) for s in sources for t in terms], "source string, term string"
    ).repartition(len(sources), "source")

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        limiters: dict[str, RateLimiter] = {}
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for source, term in pdf[["source", "term"]].itertuples(index=False):
                lim = limiters.setdefault(
                    source, RateLimiter(intervals.get(source, FALLBACK_MIN_INTERVAL))
                )
                lim.wait()
                try:
                    payload = fetcher(source, term)
                    if payload is None:
                        continue
                    out.extend(NORMALIZERS[source](payload, term))
                except Exception as exc:  # log-and-continue (scrappy.py:93-98)
                    print(f"fetch failed source={source} term={term!r}: {exc}")
                    continue
            yield pd.DataFrame(
                out, columns=[f.name for f in _FETCH_SCHEMA.fields]
            ) if out else pd.DataFrame(columns=[f.name for f in _FETCH_SCHEMA.fields])

    fetched = tasks.mapInPandas(run_partition, schema=_FETCH_SCHEMA)
    date_col = F.lit(date_added).cast("date") if date_added else F.current_date()
    return fetched.withColumn("date_added", date_col)


def collect_all_articles(
    spark: SparkSession,
    terms: list[str],
    fetcher: Fetcher,
    sources: list[str] | None = None,
    date_added: str | None = None,
) -> DataFrame:
    """EP2 normalize stage: fetch + within-batch dedup by title
    (reference collect_all_articles, scrappy.py:283-322). Keep-first
    across sources is deterministic: source name then title order."""
    from ..operators.dedup import dedup_keep_first

    df = fetch_articles(spark, terms, fetcher, sources, date_added=date_added)
    return dedup_keep_first(df, keys=["title"], order_by=["source", "term"])
