"""Declarative pipeline compiler: strict compile-time validation and
composition equivalence with hand-written operator chains."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from scrappy_spark.io import load_table
from scrappy_spark.operators.curation import assign_splits, hash_sample, scrub_pii
from scrappy_spark.pipeline_config import OPS, compile_pipeline, run_pipeline

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


class TestValidation:
    def test_unknown_op_names_valid_set(self):
        with pytest.raises(ValueError, match=r"stage 1: unknown op 'nope'.*hash_sample"):
            compile_pipeline([{"op": "hash_sample", "rate": 0.5}, {"op": "nope"}])

    def test_unknown_param_names_signature(self):
        with pytest.raises(ValueError, match=r"stage 0 \(hash_sample\).*ratee.*rate"):
            compile_pipeline([{"op": "hash_sample", "ratee": 0.5}])

    def test_empty_spec_rejected(self):
        with pytest.raises(ValueError, match="non-empty"):
            compile_pipeline([])
        with pytest.raises(ValueError, match="non-empty"):
            compile_pipeline({"stages": []})

    def test_non_dict_stage_rejected(self):
        with pytest.raises(ValueError, match="stage 0: expected an object"):
            compile_pipeline(["hash_sample"])

    def test_compile_touches_no_data(self):
        # no SparkSession needed to compile — validation is pure
        fn = compile_pipeline([{"op": "hash_sample", "rate": 0.1}])
        assert fn.stages == [("hash_sample", {"rate": 0.1})]

    def test_every_registered_op_is_df_first(self):
        import inspect

        for name, fn in OPS.items():
            first = next(iter(inspect.signature(fn).parameters))
            assert first in ("df", "docs"), f"{name}: first param {first!r}"


class TestComposition:
    def test_matches_hand_written_chain(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        spec = {
            "stages": [
                {"op": "hash_sample", "rate": 0.5},
                {"op": "scrub_pii"},
                {"op": "assign_splits"},
            ]
        }
        got = run_pipeline(docs, spec).select("doc_id", "text", "split")
        want = assign_splits(
            hash_sample(docs, 0.5).withColumn("text", scrub_pii(F.col("text")))
        ).select("doc_id", "text", "split")
        assert _rows(got) == _rows(want)

    def test_json_string_and_param_passthrough(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        spec = json.dumps([{"op": "hash_sample", "rate": 0.25, "salt": "other"}])
        got = run_pipeline(docs, spec)
        want = hash_sample(docs, 0.25, salt="other")
        assert _rows(got.select("doc_id")) == _rows(want.select("doc_id"))

    def test_web_ingestion_ops_compose(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        pages = docs.select(
            "doc_id", F.concat(F.lit("<p>"), "text", F.lit("</p>")).alias("html")
        )
        out = run_pipeline(pages, [{"op": "extract_html_text"}])
        row = out.filter("doc_id = 0").collect()[0]
        assert row["clean_text"] and "<" not in row["clean_text"]


class TestFuzzCompile:
    """compile_pipeline is total over arbitrary JSON-shaped input:
    either a compiled callable or a named ValueError — never a
    KeyError/TypeError/AttributeError leaking from the internals."""

    def test_fuzz_specs_never_cryptic(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        keys = st.sampled_from(["op", "rate", "salt", "weights", "x", "text_col"])
        vals = st.one_of(
            st.sampled_from(list(OPS) + ["nope", ""]),
            st.floats(allow_nan=False, allow_infinity=False),
            st.text(max_size=8),
            st.none(),
        )
        stage = st.one_of(
            st.dictionaries(keys, vals, max_size=4),
            st.text(max_size=5),
            st.integers(),
        )
        spec = st.one_of(
            st.lists(stage, max_size=4),
            st.fixed_dictionaries({"stages": st.lists(stage, max_size=3)}),
            st.integers(),
            st.none(),
        )

        @settings(max_examples=200, deadline=None)
        @given(spec)
        def run(s):
            try:
                compile_pipeline(s)
            except ValueError:
                pass  # the contract: named ValueError only

        run()


def test_unhashable_op_value_raises_named_error():
    # {} / [] as the op value must be the contracted ValueError, not a
    # raw TypeError from `op not in OPS`
    for bad in ({}, ["x"], 5, None):
        with pytest.raises(ValueError, match="unknown op"):
            compile_pipeline([{"op": bad}])


def test_dedup_exact_stage_in_pipeline(spark):
    """A JSON pipeline with dedup_exact collapses duplicate texts to
    the min-id representative before downstream stages see them."""
    from scrappy_spark.pipeline_config import compile_pipeline

    docs = spark.createDataFrame(
        [
            (5, "same text here"),
            (2, "same text here"),
            (9, "unique text entirely"),
        ],
        ["doc_id", "text"],
    )
    run = compile_pipeline(
        [{"op": "dedup_exact"}, {"op": "token_count"}]
    )
    out = {r.doc_id: r for r in run(docs).collect()}
    assert set(out) == {2, 9}  # min id kept per text group
    assert out[2].n_words == 3


def test_expect_stage_compiles_and_gates(spark):
    """The dbt-style JSON 'expect' stage compiles to one
    expectations_report scan and returns the per-check report."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (2, 500)], "k int, v int"
    )
    run = compile_pipeline(
        [
            {
                "op": "expect",
                "checks": [
                    {"kind": "not_null", "column": "v"},
                    {"kind": "unique", "column": "k"},
                    {"kind": "between", "column": "v", "lo": 0, "hi": 100},
                ],
            }
        ]
    )
    rep = {r["expectation"]: r.asDict() for r in run(df).collect()}
    assert rep["v_not_null"]["n_violations"] == 1
    assert rep["k_unique"]["n_violations"] == 1
    assert rep["v_between"]["n_violations"] == 1
    assert all(r["passed"] == 0 for r in rep.values())


def test_expect_stage_validation_errors(spark):
    # check-shape validation is COMPILE-time, like every other stage
    # param — the bad check is named before any data moves
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown kind"):
        compile_pipeline(
            [{"op": "expect", "checks": [{"kind": "nope", "column": "x"}]}]
        )
    with _pytest.raises(ValueError, match="non-empty"):
        compile_pipeline([{"op": "expect", "checks": []}])
    with _pytest.raises(ValueError, match="'kind' and 'column'"):
        compile_pipeline([{"op": "expect", "checks": [{"column": "x"}]}])


def test_exact_substring_dedup_stage(spark):
    # a 40-char NON-self-repeating text duplicated across two docs:
    # the first occurrence survives intact, the copy is fully covered
    import string

    txt = (string.ascii_letters + string.digits)[:40]
    df = spark.createDataFrame(
        [(0, txt), (1, txt)], "doc_id long, text string"
    )
    run = compile_pipeline([{"op": "exact_substring_dedup", "min_len": 30}])
    out = {r["doc_id"]: r["n_dropped"] for r in run(df).collect()}
    assert out[0] == 0 and out[1] == 40
