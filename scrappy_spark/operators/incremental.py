"""Incremental aggregate maintenance: combine partial aggregation
states instead of recomputing from raw history.

The reference recomputes every report from the full store on each run
(e.g. the term-frequency pass over all articles, scrappy.py's
mining over the whole CSV). At 100 TB a nightly full recompute of a
running aggregate is the single most expensive job in the pipeline —
but SUM/COUNT/MIN/MAX are decomposable: the aggregate of (old ∪ new)
is a key-wise combine of the two aggregates. Maintaining the aggregate
table therefore costs O(|delta| + |affected keys|), not O(|history|).

``merge_agg_states`` is that combine as one full-outer join on the
group keys — the only shuffle is on the (small) aggregate tables, never
on raw history. AVG must be carried as (sum, count) state and divided
at read time; this module keeps states closed under combination.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_alias: str = "n",
) -> DataFrame:
    """Partial-aggregate ``df`` into a combinable state table.

    Produces per-key: ``n`` (row count), ``<c>_sum`` (BIGINT — callers
    pass fixed-point integer columns so the state is bit-exact under
    re-partitioning), ``<c>_min`` / ``<c>_max``.
    """
    aggs = [F.count(F.lit(1)).alias(count_alias)]
    aggs += [F.sum(c).cast("long").alias(f"{c}_sum") for c in sum_cols]
    aggs += [F.min(c).alias(f"{c}_min") for c in min_cols]
    aggs += [F.max(c).alias(f"{c}_max") for c in max_cols]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    count_alias: str = "n",
) -> DataFrame:
    """Combine two state tables produced by :func:`aggregate_state`.

    Full-outer join on ``keys``; ``n``/``*_sum`` columns add,
    ``*_min``/``*_max`` columns take min/max, with null-absorbing
    coalesce on both sides (a key present in only one input keeps its
    state unchanged). The result is again a valid state table, so
    merges chain: state(t0..t2) == merge(merge(s0, s1), s2) ==
    state-of-union, which is what makes nightly incremental refresh
    equivalent to the full recompute.
    """
    if set(base.columns) != set(delta.columns):
        raise ValueError(
            f"state schemas differ: {sorted(base.columns)} vs {sorted(delta.columns)}"
        )
    measures = [c for c in base.columns if c not in keys]
    b = base.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in measures])
    d = delta.select(*keys, *[F.col(c).alias(f"__d_{c}") for c in measures])
    joined = b.join(d, on=list(keys), how="full_outer")

    def combined(c: str) -> F.Column:
        left, right = F.col(f"__b_{c}"), F.col(f"__d_{c}")
        if c == count_alias or c.endswith("_sum"):
            out = F.coalesce(left, F.lit(0)) + F.coalesce(right, F.lit(0))
        elif c.endswith("_min"):
            out = F.least(left, right)  # least/greatest skip nulls
        elif c.endswith("_max"):
            out = F.greatest(left, right)
        else:
            raise ValueError(
                f"column {c!r} is not a combinable state column "
                f"(expected {count_alias!r} or *_sum/*_min/*_max)"
            )
        return out.alias(c)

    return joined.select(*keys, *[combined(c) for c in measures])
