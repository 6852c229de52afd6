"""Public scalar/column function surface (SURVEY.md §2.6).

One import point for every reusable column expression the engine
defines — all built on ``pyspark.sql.functions`` built-ins (JVM-side,
codegen-friendly); none is a Python UDF.

    from scrappy_spark.functions import normalize_term, cosine, dot
"""

from ..operators.filters import (  # noqa: F401
    contains_any,
    flatten_institutions,
    normalize_term,
    truncate_col,
)
from ..operators.mining import (  # noqa: F401
    STOPWORDS,
    ensure_parallelism,
    ngrams_expr,
    tokens_col,
)
from ..operators.curation import (  # noqa: F401
    PII_RULES,
    assign_splits,
    quota_sample,
    sample_threshold,
    scrub_pii,
)
from ..operators.similarity import (  # noqa: F401
    cosine,
    dequantize_int8,
    dot,
    norm,
    quantize_int8,
)
from ..operators.textstats import LANG_MARKERS, bpe_tokens, lang_score  # noqa: F401

__all__ = [
    "PII_RULES",
    "assign_splits",
    "quota_sample",
    "sample_threshold",
    "scrub_pii",
    "bpe_tokens",
    "contains_any",
    "flatten_institutions",
    "normalize_term",
    "truncate_col",
    "STOPWORDS",
    "ensure_parallelism",
    "ngrams_expr",
    "tokens_col",
    "cosine",
    "dequantize_int8",
    "dot",
    "norm",
    "quantize_int8",
    "LANG_MARKERS",
    "lang_score",
]
