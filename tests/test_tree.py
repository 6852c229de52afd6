"""Recursive keyword tree (G1) on a stubbed fetcher — no network."""

import json

from scrappy_spark.tree import build_topic_tree, edges_to_nested


def _make_fetcher():
    def fetcher(source, term):
        # deterministic synthetic corpus: each term's articles mention
        # two derived phrases so the miner has clear children
        arts = [
            {"title": f"{term} alpha signal", "abstract": f"{term} alpha signal study", "html_url": "u",
             "publication_year": 2020, "authors": {"authors": []}, "index_terms": {}},
            {"title": f"{term} beta pattern", "abstract": f"{term} beta pattern report", "html_url": "u",
             "publication_year": 2021, "authors": {"authors": []}, "index_terms": {}},
        ]
        return json.dumps({"articles": arts})

    return fetcher


def test_tree_levels_and_visited(spark):
    edges = build_topic_tree(
        spark, seeds=["quantum"], fetcher=_make_fetcher(), depth=2, top_k=3,
        sources=["IEEE"], min_interval={"IEEE": 0.0},
    ).collect()
    by_depth = {}
    for e in edges:
        by_depth.setdefault(e.depth, []).append((e.parent, e.child))
    assert 1 in by_depth and 2 in by_depth
    # no child is ever a previously-visited term (incl. the seed)
    children_1 = {c for _, c in by_depth[1]}
    assert "quantum" not in children_1
    children_2 = {c for _, c in by_depth[2]}
    assert not children_2 & (children_1 | {"quantum"})
    # subset-pruning: children must not be token-subsets of their parent
    for p, c in by_depth[1] + by_depth[2]:
        assert set(c.split()) - set(p.split())


def test_edges_to_nested_shape(spark):
    edges = build_topic_tree(
        spark, seeds=["graph"], fetcher=_make_fetcher(), depth=1, top_k=2,
        sources=["IEEE"], min_interval={"IEEE": 0.0},
    ).collect()
    tree = edges_to_nested(edges)
    assert set(tree) == {"graph"}
    assert len(tree["graph"]) == 2
    assert all(isinstance(v, dict) for v in tree["graph"].values())
