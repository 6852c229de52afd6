"""Round-9 wave: IVF-PQ composed ANN, compaction execution,
mixture-execution capstone, l-diversity — behavior pins on constructed
inputs beside the declared queries' banded-flag oracles."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F


def _centroids(e):
    from scrappy_spark.operators import similarity as SIM

    return (
        SIM.label_centroids(e)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
                lambda s: s.centroid_val,
            ).alias("centroid")
        )
    )


def test_ivf_pq_recall_self_and_residual_advantage(spark):
    """IVF-PQ composition pins: (a) full-k + self-retrieval + nonzero
    recall at the declared 2-probe setting; (b) the residual-
    quantization claim — with pruning removed (probe ALL cells),
    IVF-PQ's recall meets or beats plain PQ at identical geometry,
    because residuals of all cells live near the origin where one
    shared codebook fits them better than it fits raw vectors
    (measured 32 vs 29 top-10 hits over 5 queries at sf0.001; asserted
    with slack for double-sum jitter in the centroid means)."""
    from scrappy_spark.io import load_table
    from scrappy_spark.operators import pq as PQ
    from scrappy_spark.operators.similarity import cosine_topk

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = _centroids(e)
    n_cells = cents.count()
    qs = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = defaultdict(set)
    for r in cosine_topk(e, qs, k=10).collect():
        exact[r.query_id].add(r.vec_id)

    pruned = defaultdict(set)
    for r in PQ.ivf_pq_search(e, qs, cents, k=10, n_probe=2).collect():
        pruned[r.query_id].add(r.vec_id)
    assert set(pruned) == set(exact)
    for q in exact:
        assert len(pruned[q]) == 10          # full k
        assert q in pruned[q]                # self-retrieval
        assert len(pruned[q] & exact[q]) >= 1  # measured min 2

    fullprobe = defaultdict(set)
    for r in PQ.ivf_pq_search(e, qs, cents, k=10, n_probe=n_cells).collect():
        fullprobe[r.query_id].add(r.vec_id)
    full_hits = sum(len(fullprobe[q] & exact[q]) for q in exact)
    assert full_hits >= 25                   # measured 32

    book = PQ.pq_train(e)
    codes = PQ.pq_encode(e, book)
    plain = defaultdict(set)
    for r in PQ.pq_search(codes, book, qs, k=10).collect():
        plain[r.query_id].add(r.vec_id)
    plain_hits = sum(len(plain[q] & exact[q]) for q in exact)
    assert full_hits + 3 >= plain_hits       # measured 32 vs 29


def test_ivf_pq_deterministic(spark):
    from scrappy_spark.io import load_table
    from scrappy_spark.operators import pq as PQ

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = _centroids(e)
    qs = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, PQ.ivf_pq_search(e, qs, cents, k=5).collect()))
    b = sorted(map(tuple, PQ.ivf_pq_search(e, qs, cents, k=5).collect()))
    assert a == b


def test_sq_l2_unrolled_matches_hof(spark):
    """The r14 unrolled-small-d `_sq_l2` (codegen'd explicit terms) is
    BIT-identical to the higher-order-function fold on real fixture
    subvectors — the equivalence Change 20 rides on: aggregate folds
    ((0.0+v1)+v2)+…, every (a[i]-b[i])² >= +0.0, so the unrolled
    left-to-right sum is the same IEEE operation sequence. Also pins
    that pq_encode's codes are unchanged by the unroll (the HOF form is
    forced via d=None)."""
    from scrappy_spark.io import load_table
    from scrappy_spark.operators import pq as PQ

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    # pairwise subvector distances: each vector's first 4 dims vs its
    # last 4 dims — arbitrary but deterministic real-float inputs
    pairs = e.select(
        F.slice(F.col("embedding"), 1, 4).cast("array<double>").alias("a"),
        F.slice(F.col("embedding"), 61, 4).cast("array<double>").alias("b"),
    )
    both = pairs.select(
        PQ._sq_l2(F.col("a"), F.col("b"), d=4).alias("unrolled"),
        PQ._sq_l2(F.col("a"), F.col("b")).alias("hof"),
    ).collect()
    assert all(r["unrolled"] == r["hof"] for r in both)  # bit-exact, no tolerance

    resid = PQ.ivf_assign_residual(e, _centroids(e))
    book = PQ.pq_train(resid, vec_col="__r")
    fast = {
        r["vec_id"]: list(r["codes"])
        for r in PQ.pq_encode(resid, book, vec_col="__r").collect()
    }

    # HOF-form encode (the pre-r14 plan shape): same pipeline with the
    # distance built through zip_with/aggregate
    from scrappy_spark.operators.mining import ensure_parallelism

    subs = ensure_parallelism(resid.select("vec_id", "__r")).select(
        "vec_id",
        F.posexplode_outer(
            F.array(*[PQ._subvec(F.col("__r"), PQ.PQ_M, 64, j).cast("array<double>") for j in range(PQ.PQ_M)])
        ).alias("subspace", "__sub"),
    )
    scored = subs.join(F.broadcast(book), "subspace").select(
        "vec_id",
        "subspace",
        F.struct(
            PQ._sq_l2(F.col("__sub"), F.col("centroid")).alias("d"),
            F.col("code").alias("c"),
        ).alias("__dc"),
    )
    best = scored.groupBy("vec_id", "subspace").agg(F.min("__dc")["c"].alias("code"))
    slow = {
        r["vec_id"]: list(r["codes"])
        for r in best.groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
        .collect()
    }
    assert fast == slow


# ---------------------------------------------------------------------------
# compaction execution (operators/layout.py::compact_snapshot)
# ---------------------------------------------------------------------------


def test_compact_snapshot_content_identity_and_time_travel(spark, tmp_path):
    """Executing a compaction plan against a snapshot table: content is
    identical pre/post (row multiset), old versions stay readable and
    exact across the compaction, single-file bins are REUSED (same
    path in both manifests, file untouched on disk), and the file
    count shrinks to the bin count."""
    import os

    from scrappy_spark.operators.layout import compact_snapshot
    from scrappy_spark.sources.snapshots import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "tbl"))
    batches = [
        [(i, f"v{i}") for i in range(100)],            # big: alone >= T
        [(100 + i, f"w{i}") for i in range(10)],       # small, packs
        [(110 + i, f"x{i}") for i in range(10)],       # small, packs
        [(120 + i, f"y{i}") for i in range(5)],        # small, packs
    ]
    for b in batches:
        df = spark.createDataFrame(b, "id long, v string").coalesce(1)
        table.commit(df, message=f"append {len(b)}", append=True)
    v_before = table.current_version()
    files_before = table._manifest(v_before)["files"]
    assert len(files_before) == 4
    before_rows = sorted(map(tuple, table.read().collect()))
    big_file = files_before[0]
    big_mtime = os.path.getmtime(big_file)

    plan, manifest = compact_snapshot(table, 60, unit="rows")
    # cumulative rows BEFORE each file: 0,100,110,120 -> bins 0 | 1,1 | 2
    # (the documented greedy rule: bin = before div target, boundaries
    # at multiples of T over the cumulative stream)
    assert manifest["version"] == v_before + 1
    assert manifest["n_files"] == 3
    assert big_file in manifest["files"]               # reused, not rewritten
    assert files_before[3] in manifest["files"]        # singleton bin reused
    rewritten = [f for f in manifest["files"] if f not in files_before]
    assert len(rewritten) == 1                          # f1+f2 merged
    assert os.path.getmtime(big_file) == big_mtime     # untouched on disk
    assert sorted(map(tuple, table.read().collect())) == before_rows
    # time travel across the compaction
    assert sorted(map(tuple, table.read(v_before).collect())) == before_rows
    assert table.read(0).count() == 100
    # the plan names every input file exactly once
    got = sorted(r.path for r in plan.collect())
    assert got == sorted(files_before)
    # expire keeps only HEAD; its reused file must survive
    table.expire(keep_last=1)
    assert sorted(map(tuple, table.read().collect())) == before_rows


def test_snapshot_file_stats_path_with_space(spark, tmp_path):
    """input_file_name() returns a percent-encoded URI (ADVICE r9 #2):
    a table path with a space must still get REAL per-file row counts
    (the old string join silently coalesced them to 0, skewing
    unit='rows' compaction)."""
    from scrappy_spark.operators.layout import (
        compact_snapshot,
        snapshot_file_stats,
    )
    from scrappy_spark.sources.snapshots import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "dir with space" / "t +x"))
    for lo, n in ((0, 7), (100, 3)):
        df = spark.createDataFrame(
            [(lo + i, "v") for i in range(n)], "id long, v string"
        ).coalesce(1)
        table.commit(df, message=f"append {n}", append=True)
    stats = {r.idx: r.rows for r in snapshot_file_stats(table).collect()}
    assert stats == {"000000000": 7, "000000001": 3}
    # and rows-unit compaction over the spaced path works end to end
    _, manifest = compact_snapshot(table, 100, unit="rows")
    assert manifest["n_files"] == 1
    assert table.read().count() == 10


def test_compact_snapshot_rejects_bad_unit(spark, tmp_path):
    import pytest

    from scrappy_spark.operators.layout import compact_snapshot
    from scrappy_spark.sources.snapshots import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "t2"))
    table.commit(spark.createDataFrame([(1, "a")], "id long, v string"))
    with pytest.raises(ValueError):
        compact_snapshot(table, 10, unit="chars")


# ---------------------------------------------------------------------------
# mixture execution (operators/curation.py::mixture_execute)
# ---------------------------------------------------------------------------


def test_mixture_execute_branches(spark):
    """The executor must honor the planner's branches exactly: an
    under-supplied domain gets floor(epochs) FULL passes plus a
    partial-rate epoch; an over-supplied domain gets one rate-sampled
    pass; unweighted domains vanish. Quotas land within the md5-
    uniform sampling tolerance of the planner's exact targets."""
    from scrappy_spark.operators.curation import mixture_execute, mixture_plan

    rows = (
        [("wiki", i, 10) for i in range(40)]        # avail 400 tokens
        + [("cc", 1000 + i, 10) for i in range(400)]  # avail 4000
        + [("junk", 9000 + i, 10) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    weights, budget = {"wiki": 0.5, "cc": 0.5}, 2000
    plan = {r.source: r for r in mixture_plan(df, weights, budget).collect()}
    # wiki: target 1000 vs avail 400 -> 2.5 epochs; cc: 1000 vs 4000 -> 0.25
    assert plan["wiki"].epochs_milli == 2500
    assert plan["cc"].sample_rate_ppm == 250_000

    out = mixture_execute(df, weights, budget).collect()
    assert not any(r.source == "junk" for r in out)
    wiki = [r for r in out if r.source == "wiki"]
    cc = [r for r in out if r.source == "cc"]
    # full epochs 0 and 1 contain EVERY wiki doc
    for e in (0, 1):
        assert sorted(r.doc_id for r in wiki if r.epoch == e) == list(range(40))
    # partial epoch 2: a strict, nonempty md5-sample at ~0.5
    part = [r.doc_id for r in wiki if r.epoch == 2]
    assert 0 < len(part) < 40
    assert {r.epoch for r in cc} == {0}
    assert 0 < len(cc) < 400
    # rates within 4-sigma binomial tolerance of the exact targets
    assert abs(len(part) - 20) <= 13
    assert abs(len(cc) - 100) <= 35
    # determinism
    again = mixture_execute(df, weights, budget).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_mixture_execute_equality_boundary(spark):
    """target == available exactly (ADVICE r9 #1): epochs_milli is
    1000 but under_supplied is 0, so the domain must get EXACTLY one
    full pass (the rate-1e6 partial epoch), never a full epoch PLUS a
    rate-1e6 epoch — the double-count the gated __full fixes."""
    from scrappy_spark.operators.curation import mixture_execute, mixture_plan

    rows = [("eq", i, 10) for i in range(50)]  # avail 500 tokens
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    weights, budget = {"eq": 1.0}, 500  # target 500 == available 500
    plan = mixture_plan(df, weights, budget).collect()[0]
    assert (plan.epochs_milli, plan.under_supplied, plan.sample_rate_ppm) == (
        1000, 0, 1_000_000,
    )
    out = mixture_execute(df, weights, budget).collect()
    # one occurrence per doc, all in epoch 0 — 500 tokens, not 1000
    assert sorted(r.doc_id for r in out) == list(range(50))
    assert {r.epoch for r in out} == {0}


# ---------------------------------------------------------------------------
# l-diversity + generalization advice
# ---------------------------------------------------------------------------


def test_l_diversity_flags_homogeneous_groups(spark):
    """The combination the fixture lacks: a group LARGE enough to pass
    k-anonymity whose members all share one sensitive value must still
    flag l_at_risk (the homogeneity attack)."""
    import pytest

    from scrappy_spark.operators.profile import (
        generalization_candidates,
        l_diversity_profile,
    )

    rows = (
        [("en", "a", "s1") for _ in range(12)]          # big, homogeneous
        + [("en", "b", f"s{i}") for i in range(12)]     # big, diverse
        + [("de", "a", "s1"), ("de", "a", "s2"), ("de", "a", "s3")]  # small, diverse
    )
    df = spark.createDataFrame(rows, "lang string, src string, sens string")
    out = {
        (r.lang, r.src): r
        for r in l_diversity_profile(
            df, ["lang", "src"], "sens", k=10, l=3
        ).collect()
    }
    assert (out[("en", "a")].k_at_risk, out[("en", "a")].l_at_risk) == (0, 1)
    assert (out[("en", "b")].k_at_risk, out[("en", "b")].l_at_risk) == (0, 0)
    assert (out[("de", "a")].k_at_risk, out[("de", "a")].l_at_risk) == (1, 0)
    assert out[("en", "a")].n_sensitive == 1
    assert out[("en", "b")].n_sensitive == 12

    adv = {
        r.generalize_col: r
        for r in generalization_candidates(df, ["lang", "src"], k=10).collect()
    }
    # dropping lang: groups a=15, b=12 -> no risk; dropping src:
    # en=24, de=3 -> de still exposed
    assert adv["lang"].n_at_risk_groups == 0
    assert adv["src"].n_at_risk_groups == 1
    assert adv["src"].at_risk_rows == 3
    assert adv["lang"].min_group_size == 12

    with pytest.raises(ValueError):
        l_diversity_profile(df, [], "sens")
    with pytest.raises(ValueError):
        generalization_candidates(df, ["lang"], k=10)


# ---------------------------------------------------------------------------
# learned language ID (ml/langid.py)
# ---------------------------------------------------------------------------


def test_learned_langid_beats_heuristic_on_heldout(spark):
    """The VERDICT r8 #6 pin: on held-out sentences (disjoint from the
    training corpus) the learned NB model must beat the marker
    heuristic — which structurally cannot see zh at all (no zh row in
    LANG_MARKERS) and tops out at 0.8 here; the learned model scores
    1.0. Also pins und-iff-gram-free and determinism of the argmax."""
    from scrappy_spark.ml.langid import (
        LANGID_HELDOUT,
        lang_id_learned,
        train_lang_id,
    )
    from scrappy_spark.operators.textstats import lang_id

    w, b = train_lang_id(spark)
    held = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(LANGID_HELDOUT)],
        "doc_id long, text string",
    )
    truth = {i: lg for i, (_, lg) in enumerate(LANGID_HELDOUT)}
    learned = {
        r.doc_id: r for r in lang_id_learned(held, w, b).collect()
    }
    heur = {r.doc_id: r.pred_lang for r in lang_id(held).collect()}
    l_acc = sum(learned[i].pred_lang == truth[i] for i in truth) / len(truth)
    h_acc = sum(heur[i] == truth[i] for i in truth) / len(truth)
    assert l_acc == 1.0
    assert h_acc <= 0.8           # zh is invisible to the marker table
    assert l_acc > h_acc
    assert all(learned[i].margin_micro > 0 for i in truth)
    # gram-free doc -> 'und'
    empty = spark.createDataFrame([(99, "")], "doc_id long, text string")
    row = lang_id_learned(empty, w, b).first()
    assert (row.pred_lang, row.n_grams, row.margin_micro) == ("und", 0, 0)
    # deterministic end to end (closed-form NB + integer scoring)
    again = {
        r.doc_id: r.pred_lang for r in lang_id_learned(held, w, b).collect()
    }
    assert again == {i: learned[i].pred_lang for i in truth}


def test_segment_profile_learned_scorer_sees_code_switching(spark):
    """The scorer= hook: a doc that pastes a MARKER-FREE Spanish
    paragraph into an en text is invisible to the marker-heuristic
    profile (those segments -> 'und', mixed=0) but flags mixed=1
    through the learned scorer. (zh can't serve as the foreign leg
    here: the profile's token machinery splits on [^a-z0-9], so
    non-Latin text produces no segments at all — the segmenter's
    documented Latin-script scope, not the scorer's.)"""
    from scrappy_spark.ml.langid import (
        learned_segment_scorer,
        train_lang_id,
    )
    from scrappy_spark.operators.textstats import segment_lang_profile

    w, b = train_lang_id(spark)
    en = "the museum opens late and the children are playing outside "
    # every word absent from every LANG_MARKERS row -> heuristic 'und'
    es = (
        "un viento calido llego desde mar abierto durante toda "
        "aquella tarde serena sin nubes "
    )
    docs = spark.createDataFrame(
        [(1, en * 4 + es * 4 + en * 4), (2, en * 8)],
        "doc_id long, text string",
    )
    base = {
        r.doc_id: r
        for r in segment_lang_profile(docs, seg_tokens=10).collect()
    }
    up = {
        r.doc_id: r
        for r in segment_lang_profile(
            docs, seg_tokens=10, scorer=learned_segment_scorer(w, b)
        ).collect()
    }
    assert base[1].mixed == 0          # es paragraph reads as 'und'
    assert up[1].mixed == 1            # learned scorer sees en + es
    assert up[1].n_langs >= 2
    assert up[2].mixed == 0 and up[2].majority_lang == "en"


def test_mixture_audit_gate(spark):
    """The mixture release gate: achieved quotas within tolerance pass,
    a weighted-but-absent domain fails at 10^6 ppm, an unweighted
    domain with zero achieved passes at zero deviation, and the
    deviation arithmetic is exact integer ppm."""
    from scrappy_spark.operators.curation import mixture_audit

    mixed = spark.createDataFrame(
        [("wiki", 95, 0), ("wiki", 8, 1), ("cc", 240, 0)],
        "source string, n_chars long, epoch long",
    )
    plan = spark.createDataFrame(
        [("wiki", 100), ("cc", 250), ("code", 50), ("junk", 0)],
        "source string, target_tokens long",
    )
    out = {r.source: r for r in mixture_audit(mixed, plan, tol_ppm=50_000).collect()}
    assert out["wiki"].achieved_tokens == 103
    assert out["wiki"].deviation_ppm == 3 * 1_000_000 // 100
    assert out["wiki"].within_tolerance == 1
    assert out["cc"].deviation_ppm == 10 * 1_000_000 // 250
    assert out["cc"].within_tolerance == 1
    assert (out["code"].achieved_tokens, out["code"].deviation_ppm,
            out["code"].within_tolerance) == (0, 1_000_000, 0)
    assert (out["junk"].deviation_ppm, out["junk"].within_tolerance) == (0, 1)


# ---------------------------------------------------------------------------
# snapshot schema evolution
# ---------------------------------------------------------------------------


def test_snapshot_schema_evolution(spark, tmp_path):
    """A widened append joins the table (old files read NULL for the
    new column), time travel keeps each version's own schema, a
    same-name type conflict raises instead of coercing, and compaction
    across the widening preserves the evolved schema."""
    import pytest

    from scrappy_spark.operators.layout import compact_snapshot
    from scrappy_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        .coalesce(1)
    )
    t.commit(
        spark.createDataFrame([(3, "c", 9.5)], "id long, v string, score double")
        .coalesce(1),
        append=True,
    )
    head = t.read()
    assert head.columns == ["id", "v", "score"]
    rows = {r.id: (r.v, r.score) for r in head.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}
    assert t.read(0).columns == ["id", "v"]          # version-true schema
    with pytest.raises(ValueError, match="conflict"):
        t.commit(
            spark.createDataFrame([(4, "d", "oops")],
                                  "id long, v string, score string"),
            append=True,
        )
    # compaction across the widening keeps the evolved schema and NULLs
    _, manifest = compact_snapshot(t, 10, unit="rows")
    after = t.read()
    assert after.columns == ["id", "v", "score"]
    assert {r.id: (r.v, r.score) for r in after.collect()} == rows


def test_langid_model_store_roundtrip_and_reuse(spark, tmp_path):
    """Stored lang-id model (VERDICT r9 #3): train_and_store persists
    the EXACT tables train_lang_id returns (row-identical round-trip,
    so serving from the store loses nothing), score() stamps the
    train version on every row and matches fresh in-query scoring,
    and segment_scorer() serves the code-switching detector from the
    store. meta.json lands last: a crash before it leaves no readable
    model."""
    from scrappy_spark.ml.langid import (
        LANGID_HELDOUT,
        LangIdModel,
        lang_id_learned,
        train_lang_id,
    )

    path = str(tmp_path / "model")
    model = LangIdModel.train_and_store(spark, path)
    assert model.exists() and model.version() == 0

    w, b = train_lang_id(spark)
    assert sorted(map(tuple, model.weights().collect())) == sorted(
        map(tuple, w.collect())
    )
    assert sorted(map(tuple, model.intercepts().collect())) == sorted(
        map(tuple, b.collect())
    )

    held = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(LANGID_HELDOUT)],
        "doc_id long, text string",
    )
    stored = model.score(held)
    assert {r.model_version for r in stored.collect()} == {0}
    fresh = lang_id_learned(held, w, b)
    assert sorted(map(tuple, stored.drop("model_version").collect())) == sorted(
        map(tuple, fresh.collect())
    )

    # reopened from disk (no in-memory state), segment scorer serves
    again = LangIdModel(spark, path)
    seg = again.segment_scorer()
    from pyspark.sql import functions as F

    segs = held.select(
        "doc_id",
        F.lit(0).cast("long").alias("__s"),
        F.col("text").alias("__seg_text"),
    )
    preds = {r["doc_id"]: r["__pred"] for r in seg(segs).collect()}
    want = {r.doc_id: r.pred_lang for r in fresh.collect()}
    assert preds == want


def test_langid_model_missing_is_loud(spark, tmp_path):
    from scrappy_spark.ml.langid import LangIdModel

    model = LangIdModel(spark, str(tmp_path / "nope"))
    assert not model.exists()


def test_langid_crashed_train_retry_param_mismatch_refused(spark, tmp_path):
    """ADVICE r11 #3: a retried train over a crashed attempt's weight
    tables must refuse different params / training data — scoring with
    mismatched buckets would hash features into the wrong rows."""
    import os

    import pytest

    from scrappy_spark.ml.langid import LANGID_BUCKETS, LangIdModel

    path = str(tmp_path / "model")
    LangIdModel.train_and_store(spark, path)
    os.remove(os.path.join(path, "meta.json"))  # crash sim
    with pytest.raises(ValueError, match="different parameters"):
        LangIdModel.train_and_store(spark, path, buckets=LANGID_BUCKETS * 2)
    with pytest.raises(ValueError, match="different parameters"):
        LangIdModel.train_and_store(
            spark, path, sentences=[("hello world", "en"), ("hallo welt", "de")]
        )
    model = LangIdModel.train_and_store(spark, path)  # same fit resumes
    assert model.exists() and model.version() == 0
