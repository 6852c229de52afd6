"""Slowly-changing-dimension type 2 merge (attribute history).

The article store's merge (`sources/store.py`) is keep-first — the
reference's semantics (`scrappy.py:330-350`: never overwrite an
existing title).  A warehouse user also needs the opposite: keep EVERY
version of a changing attribute with its validity interval.  ``scd2_
merge`` is that operator, expressed as three scan-free branches over
one join rather than a row-by-row MERGE:

- **closed**: current rows whose key arrives with CHANGED tracked
  attributes → ``valid_to`` set to the update's effective date;
- **opened**: one new current row per changed key, valid from the
  effective date;
- **untouched**: everything else (historical rows pass through by
  construction; current rows with no update or an identical update
  stay open — idempotence: re-applying the same batch is a no-op).

Shape: one equi join of the CURRENT slice against the update batch
(broadcast when the batch is dim-sized, the common case for dimension
maintenance), null-safe change comparison (``eqNullSafe`` — NULL→value
and value→NULL are real changes), then a unionByName of the three
branches. History rows never join, never shuffle. At 100 TB pair this
with the store's partition-selective rewrite so only partitions holding
changed keys are written.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    effective_col: str = "effective_date",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Apply one update batch to a type-2 history frame.

    ``history``: one row per (key, version) with ``valid_from`` and
    ``valid_to`` (NULL = current).  ``updates``: one row per key with
    the new tracked values and an ``effective_col`` date.  Returns the
    merged history (same schema as ``history``).
    """
    upd = updates.select(
        F.col(key_col).alias("__k"),
        F.col(effective_col).alias("__eff"),
        *[F.col(c).alias(f"__new_{c}") for c in tracked_cols],
    )
    current = history.filter(F.col(valid_to_col).isNull())
    historical = history.filter(F.col(valid_to_col).isNotNull())

    joined = current.join(
        F.broadcast(upd), current[key_col] == F.col("__k"), "left"
    )
    changed = F.col("__k").isNotNull() & ~reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__new_{c}")) for c in tracked_cols],
    )

    closed = joined.filter(changed).select(
        *[F.col(c) for c in history.columns if c != valid_to_col],
        F.col("__eff").alias(valid_to_col),
    )
    opened = joined.filter(changed).select(
        *[
            F.col(f"__new_{c}").alias(c) if c in tracked_cols else F.col(c)
            for c in history.columns
            if c not in (valid_from_col, valid_to_col)
        ],
        F.col("__eff").alias(valid_from_col),
        F.lit(None).cast(history.schema[valid_to_col].dataType).alias(valid_to_col),
    )
    untouched = joined.filter(~changed).select(*history.columns)

    return historical.unionByName(closed).unionByName(opened).unionByName(
        untouched.select(*history.columns)
    )
