"""Declarative curation pipelines: a JSON spec of stages compiled onto
the engine's DataFrame operators.

The reference drives its fetch flow from a JSON config
(``scrappy.py:52-70`` reads/rewrites ``search_terms.json``); this
module extends the same config-driven idea to the whole curation
surface: a data engineer ships ``{"stages": [...]}`` instead of a
Python script, and the runner compiles it into one lazy DataFrame
plan — every stage is an existing operator, so the composition
inherits their scale shapes (and their oracle checks compose: see
``q_config_pipeline``).

Spec format::

    {"stages": [
        {"op": "hash_sample", "rate": 0.5},
        {"op": "scrub_pii"},
        {"op": "assign_splits"}
    ]}

Validation is strict and front-loaded (compile time, not mid-job):
unknown ops name the valid set, unknown params name the accepted
signature — a 100-stage pipeline on a 100 TB corpus must fail in
milliseconds, not after three shuffles.
"""

from __future__ import annotations

import inspect
import json
from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from .operators import curation, expectations, textstats, web


def _scrub_pii_stage(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """DataFrame adapter for the Column-level ``scrub_pii``."""
    return df.withColumn(out_col or text_col, curation.scrub_pii(F.col(text_col)))


def _dedup_exact_stage(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per distinct text — the
    collapse-first front door every dup-sensitive downstream stage
    (near-dup joins, quality floors, split assignment) wants first."""
    from .operators.dedup_approx import collapse_exact_dups

    reps, _ = collapse_exact_dups(df, text_col=text_col, id_col=id_col)
    return reps


_EXPECT_KINDS = {
    "not_null": lambda c, a: expectations.expect_not_null(c),
    "unique": lambda c, a: expectations.expect_unique(c),
    "accepted_values": lambda c, a: expectations.expect_in(c, a["values"]),
    "between": lambda c, a: expectations.expect_between(c, a["lo"], a["hi"]),
    "regex": lambda c, a: expectations.expect_matches(c, a["pattern"]),
    "expr": lambda c, a: expectations.expect_expr(
        a.get("name", f"{c}_expr"), a["predicate"], c
    ),
}


def _validate_expect_checks(checks) -> None:
    """Shape/kind validation shared by compile_pipeline (compile-time
    contract) and _expect_stage (direct callers)."""
    if not isinstance(checks, list) or not checks:
        raise ValueError("expect: 'checks' must be a non-empty list")
    for i, chk in enumerate(checks):
        if not isinstance(chk, dict) or "kind" not in chk or "column" not in chk:
            raise ValueError(
                f"expect: check {i} needs 'kind' and 'column' keys"
            )
        if chk["kind"] not in _EXPECT_KINDS:
            raise ValueError(
                f"expect: check {i} has unknown kind {chk['kind']!r}; "
                f"valid: {sorted(_EXPECT_KINDS)}"
            )


def _expect_stage(df: DataFrame, checks: list[dict]) -> DataFrame:
    """JSON adapter for the declarative expectations gate (dbt-tests
    style): ``{"op": "expect", "checks": [{"kind": "not_null",
    "column": "doc_id"}, {"kind": "between", "column": "n_tokens",
    "lo": 1, "hi": 100000}, ...]}`` compiles to ONE
    ``expectations_report`` scan; the stage RETURNS THE REPORT frame
    (one row per check), so it terminates a pipeline or feeds a
    ``passed = 0`` job gate."""
    _validate_expect_checks(checks)
    built = [
        _EXPECT_KINDS[chk["kind"]](chk["column"], chk) for chk in checks
    ]
    return expectations.expectations_report(df, built)


#: op name -> DataFrame -> DataFrame callable (first param is the frame;
#: the rest become the stage's JSON-addressable knobs).
OPS: dict[str, Callable[..., DataFrame]] = {
    # sampling / mixing / splitting
    "hash_sample": curation.hash_sample,
    "mix_corpora": curation.mix_corpora,
    "temperature_sample": curation.temperature_sample,
    "quality_floor": curation.quality_floor,
    "assign_splits": curation.assign_splits,
    "length_buckets": curation.length_buckets,
    # dedup
    "dedup_exact": _dedup_exact_stage,
    "dedup_fragments": curation.dedup_fragments,
    "exact_substring_dedup": curation.exact_substring_dedup,
    # quality gate (returns the report frame, not the data frame)
    "expect": _expect_stage,
    # text cleaning
    "scrub_pii": _scrub_pii_stage,
    "remove_boilerplate": curation.remove_common_fragments,
    "remove_repeated_spans": curation.remove_repeated_spans,
    "span_corrupt": curation.span_corrupt,
    # web ingestion
    "extract_html_text": web.extract_html_text,
    "normalize_urls": web.normalize_urls,
    "license_scan": web.license_scan,
    # scoring / analysis
    "doc_stats": textstats.doc_stats,
    "lang_id": textstats.lang_id,
    "quality_score": textstats.quality_score,
    "token_count": textstats.token_count,
    "ngram_novelty": textstats.ngram_novelty,
    "unigram_surprisal": textstats.unigram_surprisal,
}


def compile_pipeline(spec: dict | list) -> Callable[[DataFrame], DataFrame]:
    """Validate ``spec`` and return a composed ``df -> df`` callable.

    Raises ``ValueError`` naming the offending stage, the unknown
    op/param, and the valid alternatives. Compilation touches no data.
    """
    stages = spec.get("stages") if isinstance(spec, dict) else spec
    if not isinstance(stages, list) or not stages:
        raise ValueError("pipeline spec must be a non-empty list of stages "
                         "(or {'stages': [...]})")
    compiled: list[tuple[str, Callable[..., DataFrame], dict]] = []
    for i, stage in enumerate(stages):
        if not isinstance(stage, dict):
            raise ValueError(f"stage {i}: expected an object, got {type(stage).__name__}")
        kwargs = dict(stage)
        op = kwargs.pop("op", None)
        # isinstance first: an unhashable JSON op value ({} or []) would
        # turn `op not in OPS` into a raw TypeError, breaking the
        # named-ValueError contract.
        if not isinstance(op, str) or op not in OPS:
            raise ValueError(
                f"stage {i}: unknown op {op!r}; valid ops: {sorted(OPS)}"
            )
        fn = OPS[op]
        accepted = list(inspect.signature(fn).parameters)[1:]  # drop the df param
        unknown = sorted(set(kwargs) - set(accepted))
        if unknown:
            raise ValueError(
                f"stage {i} ({op}): unknown params {unknown}; accepts {accepted}"
            )
        if op == "expect":
            # the compile-time promise ("fail naming the stage before
            # any data moves") extends into the expect payload: check
            # shape and kinds are validated here, not at first run
            _validate_expect_checks(kwargs.get("checks"))
        compiled.append((op, fn, kwargs))

    def run(df: DataFrame) -> DataFrame:
        for _, fn, kwargs in compiled:
            df = fn(df, **kwargs)
        return df

    run.stages = [(op, kw) for op, _, kw in compiled]
    return run


def run_pipeline(df: DataFrame, spec: dict | list | str) -> DataFrame:
    """Run a pipeline from a spec (dict/list, a JSON string, or a path
    to a JSON file)."""
    if isinstance(spec, str):
        if spec.lstrip().startswith(("[", "{")):
            spec = json.loads(spec)
        else:
            with open(spec) as f:
                spec = json.load(f)
    return compile_pipeline(spec)(df)
