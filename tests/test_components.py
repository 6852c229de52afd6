"""Connected components + the end-to-end dedup_corpus pipeline."""

from pyspark.sql import functions as F

from scrappy_spark.operators.components import connected_components, dedup_clusters
from scrappy_spark.pipelines import dedup_corpus


def test_components_known_graph(spark):
    # {1,2,3} chained (diameter 2), {4,5}, {6} isolated
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], ["id"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["src", "dst"])
    cc = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


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
