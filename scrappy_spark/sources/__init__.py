"""Ingest sources: API connector normalizers, the distributed fetch
framework, and the persistent article store (SURVEY.md §2.1).

The reference fetches 5 academic APIs serially on the driver with
``time.sleep`` politeness (scrappy.py:283-322) — wall-clock is
rate-limit × terms × sources. Here fetching is executor-side
(``mapInPandas`` over a terms DataFrame partitioned by (source, term)),
with a per-partition rate limiter preserving per-API politeness, and
normalization into the fixed articles schema so source-shape drift
cannot leak past the connector boundary.
"""
