"""Connected components + the end-to-end dedup_corpus pipeline."""

from pyspark.sql import functions as F

from scrappy_spark.operators.components import connected_components, dedup_clusters
from scrappy_spark.operators.dedup_approx import (
    collapse_exact_dups,
    minhash_candidate_pairs,
    minhash_signatures,
)
from scrappy_spark.pipelines import dedup_corpus


def test_components_known_graph(spark):
    # {1,2,3} chained (diameter 2), {4,5}, {6} isolated
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], ["id"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["src", "dst"])
    cc = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_components_raise_on_exhausted_iterations(spark):
    """Partial labels = silently split dedup clusters; exhausting
    max_iter must raise by default and warn when opted into."""
    import warnings

    import pytest

    # each round fuses steps_per_round (default 2) propagate+compress
    # steps (r14), and a step reaches exponentially far under pointer
    # jumping (~2^s) — a 64-node path (diameter 63) needs more steps
    # than max_iter=1 covers at any steps_per_round ≤ 4 (4 steps reach
    # distance ~16), so exhaustion triggers deterministically
    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cc = connected_components(nodes, edges, max_iter=1, on_exhaust="warn")
        assert cc.count() == n  # partial labels returned
    assert any("did not converge" in str(w.message) for w in caught)


def test_components_batched_rounds_exact_on_long_chain(spark):
    """r14: each round fuses steps_per_round propagate+compress steps. The labels
    must stay EXACTLY min-reachable-id — pin a 40-node path plus a
    disjoint clique-ish blob, the shapes where a miscounted step or a
    wrong convergence test (judging on step 1 instead of step 2) would
    split or merge clusters."""
    chain = [(i, i + 1) for i in range(40)]  # one 41-node component
    blob = [(100, 101), (101, 102), (100, 102), (102, 103)]
    nodes = spark.createDataFrame(
        [(i,) for i in range(41)] + [(i,) for i in (100, 101, 102, 103, 200)],
        ["id"],
    )
    edges = spark.createDataFrame(chain + blob, ["src", "dst"])
    cc = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    assert all(cc[i] == 0 for i in range(41))
    assert all(cc[i] == 100 for i in (100, 101, 102, 103))
    assert cc[200] == 200  # isolated node keeps its own id


def test_components_steps_per_round_invariant(spark):
    """Labels are the fixpoint (min reachable id) for ANY steps_per_round
    — pin k=1 and k=3 against the k=2 default on the chain+blob graph."""
    chain = [(i, i + 1) for i in range(20)]
    blob = [(100, 101), (101, 102), (100, 102)]
    nodes = spark.createDataFrame(
        [(i,) for i in range(21)] + [(i,) for i in (100, 101, 102)], ["id"]
    )
    edges = spark.createDataFrame(chain + blob, ["src", "dst"])
    for k in (1, 3):
        cc = {
            r.id: r.component
            for r in connected_components(nodes, edges, steps_per_round=k).collect()
        }
        assert all(cc[i] == 0 for i in range(21)), k
        assert all(cc[i] == 100 for i in (100, 101, 102)), k


def test_components_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to reliable
    checkpoint() files under the given dir (the cluster-mode option)."""
    ckpt = str(tmp_path / "ckpt")
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], ["id"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["src", "dst"])
    cc = {
        r.id: r.component
        for r in connected_components(nodes, edges, checkpoint_dir=ckpt).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}
    import os

    assert any(files for _, _, files in os.walk(ckpt))  # checkpoint data landed


def test_lazy_reliable_checkpoint_is_shadowed_by_descendant(spark, tmp_path):
    """Why shared frames pass eager=True on the reliable path: a lazy
    checkpoint() mark shadowed by a nearer marked descendant is never
    written (doCheckpoint stops at the first marked ancestor), so the
    shared frame would be recomputed from source on every reuse."""
    import os

    from scrappy_spark.operators.components import checkpointed

    def rdd_dirs(root):
        return [
            p for p, _, files in os.walk(root)
            if os.path.basename(p).startswith("rdd-") and files
        ]

    ckpt = str(tmp_path / "ck")
    spark.sparkContext.setCheckpointDir(ckpt)  # global dir may be set by earlier tests
    base = spark.range(100).withColumn("x", F.col("id") * 2)
    parent = checkpointed(base, ckpt, eager=False)
    child = checkpointed(parent.filter(F.col("x") > 10), ckpt, eager=False)
    child.count()
    assert len(rdd_dirs(ckpt)) == 1  # only child landed; parent shadowed

    ckpt2 = str(tmp_path / "ck2")
    spark.sparkContext.setCheckpointDir(ckpt2)  # helper reuses global dir
    parent2 = checkpointed(base, ckpt2, eager=True)
    n_after_parent = len(rdd_dirs(ckpt2))
    assert n_after_parent >= 1  # eager mark materializes immediately
    child2 = checkpointed(parent2.filter(F.col("x") > 10), ckpt2, eager=False)
    child2.count()
    assert len(rdd_dirs(ckpt2)) == n_after_parent + 1


def test_components_long_chain_converges(spark):
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    cc = connected_components(nodes, edges)
    assert cc.select("component").distinct().count() == 1
    assert cc.agg(F.max("component")).first()[0] == 0


def test_dedup_corpus_removes_exact_dups(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),   # exact dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta iota"),    # near dup of 1
        (4, "totally different content about query planners here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cleaned, clusters = dedup_corpus(docs, min_matches=2)
    kept = sorted(r.doc_id for r in cleaned.collect())
    cl = {r.doc_id: (r.component, r.is_canonical) for r in clusters.collect()}
    assert cl[1] == (1, True) and cl[2][0] == 1 and cl[2][1] is False
    assert 4 in kept and 1 in kept and 2 not in kept
    # near-dup 3 clusters with 1 iff >=2 seed minhashes agree; either
    # way the canonical invariant holds: one keeper per component
    comps = {}
    for d, (c, canon) in cl.items():
        comps.setdefault(c, []).append(canon)
    assert all(sum(flags) == 1 for flags in comps.values())


def _heavy_dup_corpus(spark, copies=100):
    rows = [(i, "the exact same boilerplate text repeated across the crawl") for i in range(copies)]
    # genuinely distinct texts (disjoint shingle sets): the earlier
    # template shared ~5/12 shingles between "uniques", putting their
    # Jaccard (~0.26) right AT the min_matches=2-of-8 LSH threshold,
    # so whether they paired depended on the hash family draw
    rows += [
        (copies + i, " ".join(f"w{i}x{j} term{i}q{j}" for j in range(8)))
        for i in range(5)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_precollapse_keeps_pair_join_linear(spark):
    """A text duplicated 100x must NOT produce ~100^2/2 LSH pair rows.
    Raw signatures put all copies in one bucket per seed (the quadratic
    blowup); collapsing to exact-dup representatives first makes the
    pair join O(unique texts)."""
    docs = _heavy_dup_corpus(spark, copies=100)

    raw_pairs = minhash_candidate_pairs(minhash_signatures(docs), min_matches=2)
    assert raw_pairs.count() >= 100 * 99 // 2  # the blowup being avoided

    reps, doc_to_rep = collapse_exact_dups(docs)
    assert reps.count() == 6  # 1 boilerplate rep + 5 uniques
    collapsed_pairs = minhash_candidate_pairs(minhash_signatures(reps), min_matches=2)
    assert collapsed_pairs.count() <= 6 * 5 // 2  # bounded by uniques
    assert doc_to_rep.count() == 105  # every doc mapped for the fan-out


def test_dedup_corpus_fans_clusters_back_out(spark):
    """Pipeline output over the collapsed path must equal the semantics
    of the uncollapsed run: all 100 copies share component 0, exactly
    one canonical doc, uniques survive."""
    docs = _heavy_dup_corpus(spark, copies=100)
    cleaned, clusters = dedup_corpus(docs)
    assert clusters.count() == 105
    dup_side = clusters.filter(F.col("doc_id") < 100)
    assert dup_side.select("component").distinct().collect() == [(0,)]
    assert [r.doc_id for r in dup_side.filter("is_canonical").collect()] == [0]
    kept = sorted(r.doc_id for r in cleaned.collect())
    assert kept[0] == 0 and set(range(100, 105)).issubset(set(kept))


def test_bucket_size_cap_drops_hot_buckets(spark):
    """With a cap below the bucket size, the hot bucket contributes no
    candidate pairs (explicit recall trade for skew safety)."""
    docs = _heavy_dup_corpus(spark, copies=50)
    sig = minhash_signatures(docs)
    capped = minhash_candidate_pairs(sig, min_matches=2, max_bucket_size=10)
    # every pair among the 50 copies came from >10-deep buckets → gone
    assert capped.filter((F.col("id_a") < 50) & (F.col("id_b") < 50)).count() == 0
    uncapped = minhash_candidate_pairs(sig, min_matches=2)
    assert uncapped.filter((F.col("id_a") < 50) & (F.col("id_b") < 50)).count() == 50 * 49 // 2


def test_pagerank_properties(spark, tmp_path):
    """Hub gets the most mass, dangling nodes keep only the teleport
    base, total mass is bounded by the start mass, and the reliable-
    checkpoint path returns identical units."""
    from scrappy_spark.operators.graph import pagerank

    # star: 1,2,3 -> 0; 0 -> 4; 4 dangles
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 4)], "src long, dst long"
    )
    out = {r.node: r for r in pagerank(edges, n_iter=5).collect()}
    unit, base = 10**12, 15 * 10**12 // 100
    # 4 is fed 85% of the hub's whole mass; the hub gets 3 damped
    # teleport bases — so 4 > 0 > leaves
    assert out[4].rank_units > out[0].rank_units > out[1].rank_units
    assert out[1].rank_units == base  # leaf: teleport only
    assert sum(r.rank_units for r in out.values()) <= 5 * unit
    assert abs(out[0].rank - out[0].rank_units / unit) < 1e-12

    reliable = {
        r.node: r.rank_units
        for r in pagerank(
            edges, n_iter=5, checkpoint_dir=str(tmp_path / "ck")
        ).collect()
    }
    assert reliable == {n: r.rank_units for n, r in out.items()}


def test_pagerank_weighted_determinism(spark):
    """Weighted edges split mass by weight share (integer div), and
    two runs produce bit-identical units."""
    from scrappy_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1, 3), (0, 2, 1)], "src long, dst long, w long"
    )
    a = {r.node: r.rank_units for r in pagerank(edges, n_iter=1, weight_col="w").collect()}
    base = 15 * 10**12 // 100
    # node1 gets 3/4 of node0's unit, node2 gets 1/4, damped 85%
    assert a[1] == base + 85 * (10**12 * 3 // 4) // 100
    assert a[2] == base + 85 * (10**12 // 4) // 100
    b = {r.node: r.rank_units for r in pagerank(edges, n_iter=1, weight_col="w").collect()}
    assert a == b


def test_star_method_known_graph(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], ["id"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["src", "dst"])
    cc = {
        r.id: r.component
        for r in connected_components(nodes, edges, method="star").collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_star_method_1k_chain_logarithmic_rounds(spark):
    """Adversarial long chain: a 1000-node path (diameter 999). The
    small-star/large-star edge contraction must converge in
    ≤ ceil(log2(diameter)) + 5 alternating rounds — the property that
    makes it the choice for chain-shaped graphs, where plain
    propagation would need ~diameter rounds."""
    import math

    n = 1000
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    budget = math.ceil(math.log2(n - 1)) + 5  # 15
    cc = connected_components(nodes, edges, method="star", max_iter=budget)
    assert cc.filter(F.col("component") != 0).count() == 0
    assert cc.count() == n


def test_star_equals_label_on_random_graph(spark):
    """Both methods must produce identical (id, component) labelings —
    seeded random graph with mixed cliques, chains, and isolates."""
    import random

    rng = random.Random(7)
    n = 300
    edges_py = [(i, i + 1) for i in range(40)]  # one 41-node chain
    edges_py += [(rng.randrange(50, 200), rng.randrange(50, 200)) for _ in range(150)]
    edges_py += [(200 + i, 200 + (i * 13 % 30)) for i in range(30)]  # modular tangle
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame(edges_py, ["src", "dst"])
    a = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    b = {
        r.id: r.component
        for r in connected_components(nodes, edges, method="star").collect()
    }
    assert a == b


def test_triangle_counts_known_graph(spark):
    """K4 + a pendant + a triangle-free chain: exact per-node counts,
    clustering in basis points, NULL coefficient for degree-1 nodes,
    and invariance to edge direction / duplication / self-loops."""
    from scrappy_spark.operators.graph import triangle_counts

    # K4 on 0-3; pendant 4 hanging off 0; chain 5-6-7.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges_py = k4 + [(0, 4), (5, 6), (6, 7)]
    # noise: reversed duplicates, a parallel edge, a self-loop
    edges_py += [(b, a) for a, b in k4[:3]] + [(0, 1), (2, 2)]
    edges = spark.createDataFrame(edges_py, ["src", "dst"])
    out = {r.node: r for r in triangle_counts(edges).collect()}

    assert len(out) == 8  # self-loop node adds no extra vertex
    for n in range(4):  # K4: every node in C(3,2)=3 triangles
        assert out[n].tri_count == 3
    # clustering: node 1-3 have degree 3 -> 20000*3 div 6 = 10000
    assert out[1].clustering_bp == 10000
    # node 0 has degree 4 (K4 + pendant) -> 20000*3 div 12 = 5000
    assert out[0].degree == 4 and out[0].clustering_bp == 5000
    # pendant: degree 1 -> undefined coefficient (integer div by zero)
    assert out[4].tri_count == 0 and out[4].clustering_bp is None
    # chain: no triangles, defined-but-zero coefficient at the middle
    assert out[6].tri_count == 0 and out[6].clustering_bp == 0

    # total triangles = sum(tri_count) / 3 = 4 (the K4's four faces)
    assert sum(r.tri_count for r in out.values()) == 12


def test_triangle_counts_star_no_hot_wedges(spark):
    """A 200-leaf star has zero triangles — and the degree orientation
    points every edge AT the hub, so the hub generates no wedges (the
    'last reducer' the algorithm exists to kill). Also: hub+rim wheel
    graph counts match the closed form."""
    from scrappy_spark.operators.graph import triangle_counts

    star = spark.createDataFrame([(200, i) for i in range(200)], ["src", "dst"])
    out = triangle_counts(star)
    assert out.filter(F.col("tri_count") != 0).count() == 0
    assert out.count() == 201

    # wheel: hub 100 + 12-cycle rim -> 12 triangles, rim nodes in 2 each
    rim = [(i, (i + 1) % 12) for i in range(12)]
    spokes = [(100, i) for i in range(12)]
    wheel = spark.createDataFrame(rim + spokes, ["src", "dst"])
    w = {r.node: r for r in triangle_counts(wheel).collect()}
    assert w[100].tri_count == 12
    assert all(w[i].tri_count == 2 for i in range(12))


def test_butterfly_counts_known_bipartite(spark):
    """Hand-built bipartite graph with a K(2,2), a K(2,3), and noise:
    closed-form counts, dedup of parallel edges, and no phantom counts
    for right vertices without a shared pair."""
    from scrappy_spark.operators.graph import butterfly_counts

    edges_py = (
        # K(2,2): orders 1,2 x parts 10,11 -> 1 butterfly on (10,11)
        [(1, 10), (1, 11), (2, 10), (2, 11)]
        # K(2,3): orders 3,4 x parts 20,21,22 -> w=2 per pair, C(3,2)
        # pairs -> 3 butterflies total, each part in 2 of them
        + [(o, p) for o in (3, 4) for p in (20, 21, 22)]
        # noise: part 30 shared by the K22 orders but by NO pair twice
        + [(1, 30)]
        # duplicate edge must not inflate w
        + [(1, 10)]
    )
    out = {r.node: r.butterflies for r in butterfly_counts(
        spark.createDataFrame(edges_py, ["l", "r"])).collect()}
    assert out == {10: 1, 11: 1, 20: 2, 21: 2, 22: 2}

    # global count = sum / 2 (each butterfly touches 2 right vertices)
    assert sum(out.values()) // 2 == 4


def test_entity_resolution_transitive_canonicalization(spark):
    """Chained similarity (A~B, B~C, A!~C) resolves to ONE entity with
    the min-id member as canonical; blocking prevents cross-canopy
    merges even for identical names."""
    from pyspark.sql import functions as F

    from scrappy_spark.operators.components import connected_components
    from scrappy_spark.operators.joins import fuzzy_match_pairs

    rows = [
        # canopy X: chain widget / widgat / widgyt (pairwise dist 1-2)
        (10, "X", "widget one"),
        (11, "X", "widgat one"),
        (12, "X", "widgyt one"),
        # canopy X: unrelated name, own entity
        (13, "X", "sprocket nine"),
        # canopy Y: identical to 10's name but different block
        (20, "Y", "widget one"),
    ]
    df = spark.createDataFrame(rows, ["rid", "canopy", "name"])
    pairs = fuzzy_match_pairs(
        df, "name", "rid", max_edit_distance=2, block_expr=F.col("canopy")
    )
    cc = connected_components(
        df.select(F.col("rid").alias("id")),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
    )
    ent = {r.id: r.component for r in cc.collect()}
    assert ent[10] == ent[11] == ent[12] == 10  # transitive chain, min id
    assert ent[13] == 13
    assert ent[20] == 20  # same name, different canopy: never compared
