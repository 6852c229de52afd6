"""Zero-cost pipeline observability via ``df.observe``.

Every curation stage wants counters (rows in/out, null keys, token
mass) but a 100 TB pipeline cannot afford a second scan per stage to
get them.  Spark's ``Observation`` collects aggregate metrics ON THE
SAME PASS as whatever action materializes the frame — the executor
sends the partial aggregates piggybacked on task completion, so the
counters are free (no extra job, no cache).

    df2, obs = observe_quality(df, numeric_cols=["n_chars"])
    df2.write.parquet(...)          # one scan: data AND metrics
    obs.get  # {'n_rows': ..., 'n_chars_nulls': ..., 'n_chars_sum': ...}

The reference's only observability is print statements (`scrappy.py`'s
per-source "Found N articles" logs); this is the engine-grade
equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def observe_quality(
    df: DataFrame,
    numeric_cols: tuple[str, ...] | list[str] = (),
    key_cols: tuple[str, ...] | list[str] = (),
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row/null/sum counters to ``df``, computed during its
    next action.  Returns (instrumented_df, observation); read
    ``observation.get`` AFTER an action has run.

    - ``n_rows`` always;
    - per ``key_cols`` entry: ``<col>_nulls`` (broken join keys /
      missing ids surface here, not three stages later);
    - per ``numeric_cols`` entry: ``<col>_nulls`` and ``<col>_sum``
      (mass-conservation checks across stages: token counts, bytes).
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in {*key_cols, *numeric_cols}:
        metrics.append(
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}_nulls")
        )
    for c in numeric_cols:
        metrics.append(F.sum(F.col(c)).alias(f"{c}_sum"))
    return df.observe(obs, *metrics), obs
