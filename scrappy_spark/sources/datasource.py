"""Spark 4 custom Python DataSource for the article connectors.

Exposes the five connector normalizers (SURVEY.md §2.1 S1–S5) through
the native reader API instead of a bespoke helper:

    spark.dataSource.register(ArticlesDataSource)
    df = (spark.read.format("scrappy_articles")
          .option("payload_dir", "/data/recorded")
          .option("sources", "arXiv,PubMed")
          .option("terms", "ransomware,botnet")
          .load())

Each (source, term) pair becomes one ``InputPartition``, so reads
parallelize across executors exactly like the ``mapInPandas`` fetch
path (``fetch.py``) while composing with everything ``spark.read``
gives for free — schema enforcement, ``unionByName``, downstream
pushdown. Payloads are files on shared storage (recorded API
responses; the offline CLI mode uses the same layout) named:

    ieee.json, serpapi.json, semantic_scholar.json,
    pubmed_efetch.xml, arxiv_atom.xml

Live-HTTP fetching stays in ``fetch.py`` — a DataSource partition read
must be idempotent under task retry, which recorded files guarantee
and polite rate-limited HTTP does not (re-fetching on retry would
double-hit the API; see fetch.py's token-bucket design).

Reference parity: the payload filenames and field extraction match the
five APIs the reference calls (scrappy.py:73-280).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

from ..schema import ARTICLES_SCHEMA
from .normalizers import NORMALIZERS

#: payload file per connector (recorded API response layout).
PAYLOAD_FILES = {
    "IEEE": "ieee.json",
    "GoogleScholar": "serpapi.json",
    "SemanticScholar": "semantic_scholar.json",
    "PubMed": "pubmed_efetch.xml",
    "arXiv": "arxiv_atom.xml",
}

#: reader schema = articles schema minus date_added (stamped at merge
#: time by the store, reference scrappy.py:330-331).
READER_SCHEMA = T.StructType(
    [f for f in ARTICLES_SCHEMA.fields if f.name != "date_added"]
)

_COLUMNS = [f.name for f in READER_SCHEMA.fields]


class _SourceTermPartition(InputPartition):
    def __init__(self, source: str, term: str):
        self.source = source
        self.term = term


class ArticlesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.payload_dir = options.get("payload_dir") or options.get("path")
        if not self.payload_dir:
            raise ValueError("scrappy_articles: payload_dir (or path) option is required")
        raw_sources = options.get("sources", ",".join(NORMALIZERS))
        self.sources: Sequence[str] = [s.strip() for s in raw_sources.split(",") if s.strip()]
        unknown = [s for s in self.sources if s not in NORMALIZERS]
        if unknown:
            raise ValueError(
                f"scrappy_articles: unknown sources {unknown}; valid: {sorted(NORMALIZERS)}"
            )
        self.terms = [t.strip() for t in options.get("terms", "").split(",") if t.strip()] or [""]

    def partitions(self) -> Sequence[InputPartition]:
        # One partition per (source, term): mirrors the fetch path's
        # politeness partitioning and parallelizes the XML/JSON parse.
        return [
            _SourceTermPartition(s, t) for s in self.sources for t in self.terms
        ]

    def read(self, partition: _SourceTermPartition) -> Iterator[tuple]:
        path = os.path.join(self.payload_dir, PAYLOAD_FILES[partition.source])
        if not os.path.exists(path):  # missing payload = empty source,
            return  # matching the reference's log-and-continue policy
        with open(path, encoding="utf-8") as fh:
            payload = fh.read()
        for row in NORMALIZERS[partition.source](payload, partition.term):
            yield tuple(row.get(c) for c in _COLUMNS)


class ArticlesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "scrappy_articles"

    def schema(self) -> T.StructType:
        return READER_SCHEMA

    def reader(self, schema: T.StructType) -> ArticlesReader:
        return ArticlesReader(self.options)

    def simpleStreamReader(self, schema: T.StructType) -> "ArticlesStreamReader":
        return ArticlesStreamReader(self.options)


try:  # Spark 4 streaming Python DataSource API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover - pyspark < 4
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]


class ArticlesStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming over the recorded payloads: each batch
    emits ALL sources' rows for ONE term — the streaming twin of the
    batch reader's (source, term) partitioning, modeling a crawl that
    ingests term-by-term. Offsets are {"term_idx": i}; reads are pure
    functions of (payload files, term), so replay between offsets after
    a failure is deterministic — exactly the property a retried
    micro-batch needs (and why live HTTP stays out of this path).
    """

    def __init__(self, options: dict):
        self._batch = ArticlesReader(options)
        if self._batch.terms == [""]:
            raise ValueError(
                "scrappy_articles stream: a non-empty terms option is required"
            )

    def initialOffset(self) -> dict:
        return {"term_idx": 0}

    def _rows_for(self, term: str) -> list[tuple]:
        # materialized, not a generator: the simple-reader protocol
        # prefetches on the driver and PICKLES the records to ship
        # them (fine here — one term's payload rows per batch; a
        # high-volume source would use the partition-planning
        # DataSourceStreamReader instead)
        return [
            row
            for source in self._batch.sources
            for row in self._batch.read(_SourceTermPartition(source, term))
        ]

    def read(self, start: dict):
        i = start["term_idx"]
        if i >= len(self._batch.terms):
            return iter(()), start  # caught up: empty batch, same offset
        # iter(list), not the list: the prefetch cache copy.copy()s the
        # iterator (list/tuple iterators pickle; generators do not) and
        # the caught-up check calls next() on it
        return iter(self._rows_for(self._batch.terms[i])), {"term_idx": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return [
            row
            for i in range(start["term_idx"], end["term_idx"])
            for row in self._rows_for(self._batch.terms[i])
        ]
