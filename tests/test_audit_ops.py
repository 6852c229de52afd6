"""Round-7 third wave: reconciliation, join advisor, retrieval eval."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from scrappy_spark.operators.profile import join_advisor
from scrappy_spark.operators.reconcile import mismatch_rows, reconcile_report
from scrappy_spark.operators.retrieval import retrieval_eval


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------------------
# reconcile_report
# ---------------------------------------------------------------------------


@pytest.fixture()
def recon_frames(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        "k int, s string, v int",
    )
    right = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, None, 31), (5, "e", 50)],
        "k int, s string, v int",
    )
    return left, right


def test_reconcile_report_counts(spark, recon_frames):
    left, right = recon_frames
    rep = {
        r["column"]: r.asDict()
        for r in reconcile_report(left, right, ["k"], ["s", "v"]).collect()
    }
    # keys: 1,2,3 both; 4 only-left; 5 only-right
    for c in ("s", "v"):
        assert rep[c]["n_only_left"] == 1
        assert rep[c]["n_only_right"] == 1
        assert rep[c]["n_both"] == 3
    # s: k=1 match, k=2 mismatch (b vs B), k=3 NULL==NULL is a MATCH
    assert rep["s"]["n_match"] == 2
    assert rep["s"]["n_mismatch"] == 1
    assert rep["s"]["match_ppm"] == 2 * 1_000_000 // 3
    # v: k=3 differs (30 vs 31)
    assert rep["v"]["n_match"] == 2


def test_reconcile_null_vs_value_is_mismatch(spark):
    left = spark.createDataFrame([(1, None)], "k int, s string")
    right = spark.createDataFrame([(1, "x")], "k int, s string")
    rep = reconcile_report(left, right, ["k"], ["s"]).collect()[0]
    assert rep["n_match"] == 0 and rep["n_mismatch"] == 1


def test_reconcile_disjoint_keys_zero_ppm(spark):
    left = spark.createDataFrame([(1, "a")], "k int, s string")
    right = spark.createDataFrame([(2, "a")], "k int, s string")
    rep = reconcile_report(left, right, ["k"], ["s"]).collect()[0]
    assert rep["n_both"] == 0 and rep["match_ppm"] == 0


def test_mismatch_rows_triage(spark, recon_frames):
    left, right = recon_frames
    got = _rows(mismatch_rows(left, right, ["k"], "s"))
    assert got == [(2, "b", "B")]


def test_reconcile_requires_columns(spark, recon_frames):
    left, right = recon_frames
    with pytest.raises(ValueError):
        reconcile_report(left, right, ["k"], [])


# ---------------------------------------------------------------------------
# join_advisor
# ---------------------------------------------------------------------------


def test_join_advisor_exact_cardinality(spark):
    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 1 + [("c",)] * 2, "k string"
    )
    right = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 5 + [("d",)] * 1, "k string"
    )
    row = join_advisor(
        left, right, "k", broadcast_rows=5, skew_share_bp=100,
        target_partitions=10,
    ).collect()[0]
    assert row["l_rows"] == 6 and row["r_rows"] == 10
    assert row["l_keys"] == 3 and row["r_keys"] == 3
    assert row["matched_keys"] == 2
    # a: 3*4=12, b: 1*5=5 -> 17, sanity vs the real join
    assert row["est_out_rows"] == 17
    assert row["est_out_rows"] == left.join(right, "k").count()
    assert row["top_key"] == "a" and row["top_key_pairs"] == 12
    assert row["top_share_bp"] == 12 * 10000 // 17
    assert row["broadcast_left"] == 0 and row["broadcast_right"] == 0
    # skewed (7058bp > 100): ceil(12*10/17) = 8
    assert row["salt_factor"] == (12 * 10 + 16) // 17


def test_join_advisor_top_key_tie_breaks_to_smallest(spark):
    left = spark.createDataFrame([("b",), ("a",)], "k string")
    right = spark.createDataFrame([("b",), ("a",)], "k string")
    row = join_advisor(left, right, "k").collect()[0]
    assert row["top_key"] == "a"  # both keys give 1 pair; min key wins


def test_join_advisor_no_overlap(spark):
    left = spark.createDataFrame([("a",)], "k string")
    right = spark.createDataFrame([("z",)], "k string")
    row = join_advisor(left, right, "k").collect()[0]
    assert row["matched_keys"] == 0
    assert row["est_out_rows"] == 0
    assert row["top_key"] is None and row["top_key_pairs"] == 0
    assert row["top_share_bp"] == 0 and row["salt_factor"] == 1
    assert row["broadcast_left"] == 1 and row["broadcast_right"] == 1


# ---------------------------------------------------------------------------
# retrieval_eval
# ---------------------------------------------------------------------------


def test_retrieval_eval_metrics(spark):
    # q1: rel docs {10, 11}; ranked [20, 10, 30] -> hit at rank 2
    # q2: rel docs {40}; ranked [41, 42] -> no hits
    # q3: rel doc {50}; ranker returned nothing
    ranking = spark.createDataFrame(
        [(1, 20, 1), (1, 10, 2), (1, 30, 3), (2, 41, 1), (2, 42, 2)],
        "query_id int, doc_id int, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 40), (3, 50)],
        "query_id int, doc_id int",
    )
    got = {
        r["query_id"]: r.asDict()
        for r in retrieval_eval(ranking, qrels, k=3).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["n_rel"] == 2 and got[1]["n_hits"] == 1
    assert got[1]["recall_ppm"] == 500_000
    assert got[1]["precision_ppm"] == 1_000_000 // 3
    assert got[1]["rr_micro"] == 500_000
    assert got[2]["n_hits"] == 0 and got[2]["rr_micro"] == 0
    assert got[3]["n_retrieved"] == 0 and got[3]["precision_ppm"] == 0


def test_retrieval_eval_k_cutoff(spark):
    # relevant doc sits at rank 4: invisible at k=3, visible at k=5
    ranking = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate([9, 8, 7, 5, 6], start=1)],
        "query_id int, doc_id int, rank int",
    )
    qrels = spark.createDataFrame([(1, 5)], "query_id int, doc_id int")
    at3 = retrieval_eval(ranking, qrels, k=3).collect()[0]
    at5 = retrieval_eval(ranking, qrels, k=5).collect()[0]
    assert at3["n_hits"] == 0 and at3["rr_micro"] == 0
    assert at5["n_hits"] == 1 and at5["rr_micro"] == 1_000_000 // 4


# ---------------------------------------------------------------------------
# cusum_changepoints
# ---------------------------------------------------------------------------


def test_cusum_matches_textbook_recursion(spark):
    """The window closed form equals the textbook max(0, S + d)
    recursion, computed here in plain Python on the same integers."""
    from scrappy_spark.operators.profile import cusum_changepoints

    vals = [10, 12, 9, 11, 30, 32, 31, 29, 33, 8]  # level shift at t=5
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, t int, v long")
    k, h = 2, 20
    got = {
        r["seq"]: r.asDict()
        for r in cusum_changepoints(
            df, "v", ["t"], ["g"], slack=k, threshold=h
        ).collect()
    }
    n, s = len(vals), sum(vals)
    sp = sn = 0
    for i, v in enumerate(vals, start=1):
        sp = max(0, sp + (n * v - s - n * k))
        sn = max(0, sn - (n * v - s + n * k))
        assert got[i]["s_pos"] == sp, (i, got[i]["s_pos"], sp)
        assert got[i]["s_neg"] == sn, (i, got[i]["s_neg"], sn)
        assert got[i]["alarm_pos"] == int(sp > n * h)
        assert got[i]["alarm_neg"] == int(sn > n * h)
    # the shift IS detected, and before the shift it is not
    alarms = [i for i in got if got[i]["alarm_pos"]]
    assert alarms and min(alarms) >= 5


def test_cusum_quiet_series_never_alarms(spark):
    from scrappy_spark.operators.profile import cusum_changepoints

    rows = [(1, i, 100 + (i % 3)) for i in range(20)]
    df = spark.createDataFrame(rows, "g int, t int, v long")
    out = cusum_changepoints(df, "v", ["t"], ["g"], slack=5, threshold=50)
    assert out.filter("alarm_pos = 1 OR alarm_neg = 1").count() == 0


# ---------------------------------------------------------------------------
# ks_drift
# ---------------------------------------------------------------------------


def test_ks_drift_matches_hand_computation(spark):
    from pyspark.sql import functions as F

    from scrappy_spark.operators.profile import ks_drift

    left = [1, 2, 2, 3, 9]
    right = [2, 3, 3, 8]
    rows = [("g", v, 0) for v in left] + [("g", v, 1) for v in right]
    df = spark.createDataFrame(rows, "g string, v long, s int")
    got = ks_drift(
        df, "v", is_right=F.col("s") == 1, group_cols=["g"]
    ).collect()[0]
    n1, n2 = len(left), len(right)
    points = sorted(set(left + right))
    d_num = max(
        abs(
            sum(1 for x in left if x <= p) * n2
            - sum(1 for x in right if x <= p) * n1
        )
        for p in points
    )
    assert got["n_left"] == n1 and got["n_right"] == n2
    assert got["d_num"] == d_num
    assert got["d_ppm"] == d_num * 1_000_000 // (n1 * n2)
    # cross-check against the textbook fraction form
    d_frac = max(
        abs(
            sum(1 for x in left if x <= p) / n1
            - sum(1 for x in right if x <= p) / n2
        )
        for p in points
    )
    assert abs(got["d_num"] / (n1 * n2) - d_frac) < 1e-12


def test_ks_drift_identical_and_disjoint(spark):
    from pyspark.sql import functions as F

    from scrappy_spark.operators.profile import ks_drift

    same = [("g", v, s) for v in (1, 2, 3) for s in (0, 1)]
    got = ks_drift(
        spark.createDataFrame(same, "g string, v long, s int"),
        "v", is_right=F.col("s") == 1, group_cols=["g"],
    ).collect()[0]
    assert got["d_num"] == 0 and got["d_ppm"] == 0  # identical CDFs
    apart = [("g", 1, 0), ("g", 2, 0), ("g", 10, 1), ("g", 11, 1)]
    got2 = ks_drift(
        spark.createDataFrame(apart, "g string, v long, s int"),
        "v", is_right=F.col("s") == 1, group_cols=["g"],
    ).collect()[0]
    assert got2["d_ppm"] == 1_000_000  # fully separated: D = 1


# ---------------------------------------------------------------------------
# semdedup_audit totality blind spot (round-7 review fix)
# ---------------------------------------------------------------------------


def test_semdedup_audit_totality_catches_lost_and_invented_ids(
    spark, monkeypatch
):
    """A regressed semdedup that LOSES an input id (or invents one)
    must flip totality_ok to 0 — before the fix the full-outer join's
    NULL kept flag was silently ignored by min() and the flag could
    never fire."""
    from pyspark.sql import functions as F

    from scrappy_spark.operators import ann_audit
    from scrappy_spark.operators.similarity import semdedup as real_semdedup

    vecs = spark.createDataFrame(
        [(i, [1.0] + [0.0] * 7) for i in range(12)],
        "vec_id long, embedding array<double>",
    )

    def lossy_semdedup(df, **kw):
        return real_semdedup(df, **kw).filter(F.col("vec_id") != 3)

    import scrappy_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "semdedup", lossy_semdedup)
    row = ann_audit.semdedup_audit(vecs, k=2, min_clusters=1).collect()[0]
    assert row["totality_ok"] == 0  # lost id 3 must be caught

    def inventing_semdedup(df, **kw):
        sd = real_semdedup(df, **kw)
        extra = sd.limit(1).withColumn("vec_id", F.lit(999).cast("long"))
        return sd.unionByName(extra)

    monkeypatch.setattr(sim, "semdedup", inventing_semdedup)
    row = ann_audit.semdedup_audit(vecs, k=2, min_clusters=1).collect()[0]
    assert row["totality_ok"] == 0  # invented id 999 must be caught

    monkeypatch.undo()
    row = ann_audit.semdedup_audit(vecs, k=2, min_clusters=1).collect()[0]
    assert row["totality_ok"] == 1  # honest semdedup still passes


def test_cusum_overflow_guard(spark):
    """A group whose n-scaled sums could exceed BIGINT must raise the
    documented error (ADVICE r7), not emit silently-wrapped statistics;
    small groups with the same huge values stay fine."""
    import pytest

    from scrappy_spark.operators.profile import cusum_changepoints

    big = 2_000_000_000_000  # 2e12: n^2 * 2|x| crosses 4e18 at n ~ 1000
    rows = [("g", i, big) for i in range(1100)]
    df = spark.createDataFrame(rows, ["grp", "t", "v"])
    with pytest.raises(Exception, match="BIGINT-exact bound"):
        cusum_changepoints(
            df, "v", ["t"], ["grp"], slack=0, threshold=1
        ).collect()

    small = cusum_changepoints(
        spark.createDataFrame(rows[:10], ["grp", "t", "v"]),
        "v", ["t"], ["grp"], slack=0, threshold=1,
    ).collect()
    assert len(small) == 10
    assert all(r.s_pos == 0 for r in small)  # constant series: no shift


def test_k_anonymity_profile(spark):
    from scrappy_spark.operators.profile import k_anonymity_profile

    df = spark.createDataFrame(
        [("en", "a"), ("en", "a"), ("en", "a"), ("en", "b"), (None, "b")],
        "lang string, source string",
    )
    out = {
        (r.lang, r.source): (r.group_size, r.at_risk)
        for r in k_anonymity_profile(df, ["lang", "source"], k=3).collect()
    }
    assert out[("en", "a")] == (3, 0)       # meets k
    assert out[("en", "b")] == (1, 1)       # under k -> at risk
    assert out[(None, "b")] == (1, 1)       # NULL QI is its own bucket
    import pytest

    with pytest.raises(ValueError):
        k_anonymity_profile(df, [], k=3)


def test_quality_floor_sweep_matches_direct_filter(spark):
    """Every grid row of the one-pass sweep must equal a direct
    per-threshold filter over quality_score, and the curve must be
    monotone non-increasing in the threshold."""
    from scrappy_spark.io import load_table
    from scrappy_spark.operators.textstats import (
        quality_floor_sweep,
        quality_score,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        "doc_id < 200"
    )
    sweep = {
        r.t_milli: r
        for r in quality_floor_sweep(docs, weight_col="n_chars").collect()
    }
    scored = (
        quality_score(docs)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            F.round(F.col("quality_score") * 1000).cast("long").alias("m"),
            "n_chars",
        )
        .collect()
    )
    total_docs = len(scored)
    for t in (0, 300, 500, 700, 950):
        want_docs = sum(1 for r in scored if r.m >= t)
        want_w = sum(r.n_chars for r in scored if r.m >= t)
        got = sweep[t]
        assert (got.kept_docs, got.kept_weight) == (want_docs, want_w), t
        assert got.kept_docs_ppm == want_docs * 1_000_000 // total_docs
    ts = sorted(sweep)
    assert all(
        sweep[a].kept_docs >= sweep[b].kept_docs
        for a, b in zip(ts, ts[1:])
    )
    assert sweep[0].kept_docs == total_docs  # floor 0 keeps everything


def test_compaction_plan_packs_greedily(spark):
    from scrappy_spark.operators.layout import compaction_plan

    m = spark.createDataFrame(
        [("p1", "f1", 60), ("p1", "f2", 50), ("p1", "f3", 10),
         ("p1", "f4", 100), ("p2", "f1", 5)],
        "part string, name string, bytes long",
    )
    out = {
        (r.part, r.name): (r.file_seq, r.target_file)
        for r in compaction_plan(
            m, "bytes", ["part"], ["name"], target_bytes=100
        ).collect()
    }
    # p1 running-before: f1=0, f2=60, f3=110, f4=120
    assert out[("p1", "f1")] == (1, 0)
    assert out[("p1", "f2")] == (2, 0)   # overflows target by < own size
    assert out[("p1", "f3")] == (3, 1)
    assert out[("p1", "f4")] == (4, 1)
    assert out[("p2", "f1")] == (1, 0)   # partitions never merge
    import pytest

    with pytest.raises(ValueError):
        compaction_plan(m, "bytes", [], ["name"], 100)
    with pytest.raises(ValueError):
        compaction_plan(m, "bytes", ["part"], ["name"], 0)


def test_compaction_plan_rejects_ordering_ties(spark):
    """ADVICE r8 #5: non-unique ordering keys make row_number /
    running-sum ties nondeterministic across runs — the plan must
    raise in-pass, and tiebreak_col must restore a deterministic
    total order (and appear in the output so the executor knows
    which file goes where)."""
    import pytest
    from scrappy_spark.operators.layout import compaction_plan

    m = spark.createDataFrame(
        [("p", "a", 10, "f1"), ("p", "a", 20, "f2"), ("p", "b", 30, "f3")],
        "part string, name string, bytes long, path string",
    )
    with pytest.raises(Exception, match="uniquely key"):
        compaction_plan(m, "bytes", ["part"], ["name"], 100).collect()
    out = {
        r.path: (r.file_seq, r.target_file)
        for r in compaction_plan(
            m, "bytes", ["part"], ["name"], 25, tiebreak_col="path"
        ).collect()
    }
    # before: f1=0, f2=10, f3=30 -> targets 0, 0, 1
    assert out == {"f1": (1, 0), "f2": (2, 0), "f3": (3, 1)}


def test_quality_floor_sweep_web_scale_weights(spark):
    """ADVICE r8 #2: kept_weight * 1e6 wraps BIGINT once the corpus
    weight passes ~9.2e12 (a 100 TB corpus is ~1e14 chars); the
    DECIMAL ppm path must stay exact."""
    from scrappy_spark.operators.textstats import quality_floor_sweep

    w = 5 * 10**12
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog. " * 5, w)
         for i in range(4)],
        "doc_id long, text string, w long",
    )
    rows = quality_floor_sweep(
        docs, thresholds_milli=(0, 500), weight_col="w"
    ).collect()
    for r in rows:
        assert 0 <= r.kept_weight_ppm <= 1_000_000
        assert r.kept_weight_ppm == r.kept_weight * 1_000_000 // (4 * w)
