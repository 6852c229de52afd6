"""Rule-based term contextualization (reference ML3,
``scrappy.py:390-412``): per predicted class, cross candidate terms
with class theme phrases and append a domain qualifier unless the term
already carries it. Pure DataFrame string ops — no UDF, no model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: class → theme phrases (engine-native equivalents of the reference's
#: theme lists at scrappy.py:355-357)
DEFAULT_THEMES: dict[str, list[str]] = {
    "threat": ["cyber attack", "vulnerability", "incident response"],
    "infrastructure": ["network architecture", "system resilience"],
}

#: tokens that mark a term as already domain-scoped (reference checks
#: for health-related words before appending " AND healthcare")
DOMAIN_MARKERS = ["health", "hospital", "clinical", "medical", "patient"]
DOMAIN_SUFFIX = " AND healthcare"


def contextualize_terms(
    spark: SparkSession,
    classified: DataFrame,
    themes: dict[str, list[str]] | None = None,
    term_col: str = "term",
    class_col: str = "predicted_class",
) -> DataFrame:
    """(term, class) × its class's themes → contextualized search
    strings, each domain-qualified unless already domain-scoped.

    Output: (term, predicted_class, theme, search_string).
    """
    themes = themes or DEFAULT_THEMES
    theme_rows = [(cls, t) for cls, ts in themes.items() for t in ts]
    from ..functions.localrel import local_relation

    themes_df = F.broadcast(
        local_relation(spark, theme_rows, f"{class_col} string, theme string")
    )
    combined = classified.join(themes_df, on=class_col, how="inner")
    base = F.concat_ws(" ", F.col(term_col), F.col("theme"))
    marker_pred = F.lit(False)
    for m in DOMAIN_MARKERS:
        marker_pred = marker_pred | F.lower(F.col(term_col)).contains(m)
    search = F.when(marker_pred, base).otherwise(F.concat(base, F.lit(DOMAIN_SUFFIX)))
    return combined.select(
        term_col, class_col, "theme", search.alias("search_string")
    )
