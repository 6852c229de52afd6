"""Recursive keyword-tree builder (reference G1, ``scrappy.py:431-493``).

The reference does a driver-recursive DFS: per term, fetch ≤50
articles, mine top n-grams, skip visited terms and token-subset terms,
recurse on the top-5 children until ``depth``. The Spark shape is the
standard iterative frontier loop (BFS by level — same visited/subset
semantics, one distributed job per level instead of one fetch per node):

    frontier(level L) → fetch articles for all frontier terms in one
    distributed pass → mine top-k candidate children PER PARENT →
    anti-join the accumulated visited set → drop token-subset children
    → emit edges (parent, child, L+1) → children become frontier L+1.

The tree is stored relationally as an edge list (SURVEY.md §1.2) and
nested only at export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .operators.components import checkpointed
from .operators.filters import normalize_term
from .operators.mining import STOPWORDS, ngrams_expr, tokens_col
from .schema import TOPIC_TREE_SCHEMA
from .sources.fetch import Fetcher, fetch_articles


def _mine_children_per_parent(
    articles: DataFrame, k: int, ngram_range: tuple[int, int] = (1, 2)
) -> DataFrame:
    """Top-k candidate terms per parent term: tokenize title+abstract,
    build n-grams, count per (parent, term), window top-k. The per-
    parent grouping replaces the reference's per-node CountVectorizer
    loop with one shuffle."""
    sw = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    text = F.concat_ws(
        " ", F.coalesce(F.col("title"), F.lit("")), F.coalesce(F.col("abstract"), F.lit(""))
    )
    toks = (
        articles.select(F.col("term").alias("parent"), tokens_col(text).alias("toks"))
        .withColumn("toks", F.expr(f"filter(toks, t -> NOT array_contains({sw}, t))"))
    )
    grams = None
    for n in range(ngram_range[0], ngram_range[1] + 1):
        g = toks.select("parent", F.explode(F.expr(ngrams_expr("toks", n))).alias("child"))
        grams = g if grams is None else grams.unionAll(g)
    counts = grams.groupBy("parent", "child").agg(F.count("*").alias("freq"))
    w = Window.partitionBy("parent").orderBy(F.desc("freq"), F.asc("child"))
    return counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def build_topic_tree(
    spark: SparkSession,
    seeds: list[str],
    fetcher: Fetcher,
    depth: int = 2,
    top_k: int = 5,
    sources: list[str] | None = None,
    min_interval: dict[str, float] | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Edge-list topic tree (parent, child, depth) for ``seeds``.

    Visited-set semantics match the reference (normalized-term
    membership, scrappy.py:438-441): a term expanded at any earlier
    level is never re-expanded, enforced by a left-anti join against the
    accumulated visited frame (never a driver-side set of all terms —
    only frontier terms, which are ≤ seeds × top_k^level, are collected
    to drive fetching)."""
    edges = spark.createDataFrame([], TOPIC_TREE_SCHEMA)
    frontier = spark.createDataFrame([(s,) for s in seeds], "term string").withColumn(
        "term", normalize_term(F.col("term"))
    )
    visited = frontier.select("term")

    for level in range(depth):
        frontier_terms = [r.term for r in frontier.collect()]
        if not frontier_terms:
            break
        articles = fetch_articles(
            spark, frontier_terms, fetcher, sources=sources,
            min_interval=min_interval, date_added="1970-01-01",
        )
        children = _mine_children_per_parent(articles, k=top_k * 3)
        # normalize, drop visited, drop token-subset-of-parent children
        children = children.withColumn("child", normalize_term(F.col("child")))
        children = children.filter(
            F.size(
                F.array_except(F.split(F.col("child"), " "), F.split(F.col("parent"), " "))
            )
            > 0
        )
        children = children.join(
            visited.withColumnRenamed("term", "child"), on="child", how="left_anti"
        )
        # re-rank after filtering, keep top_k per parent
        w = Window.partitionBy("parent").orderBy(F.desc("freq"), F.asc("child"))
        children = (
            children.withColumn("rn2", F.row_number().over(w))
            .filter(F.col("rn2") <= top_k)
            .select("parent", "child")
            .withColumn("depth", F.lit(level + 1))
        )
        # truncate lineage per level (reliable checkpoint when a dir is
        # given — cluster runs survive executor loss; local blocks else)
        children = checkpointed(children, checkpoint_dir)
        edges = edges.unionByName(children)
        frontier = children.select(F.col("child").alias("term")).distinct()
        visited = visited.unionByName(frontier.select(F.col("term"))).distinct()
        visited = checkpointed(visited, checkpoint_dir)

    return edges


def edges_to_nested(edges_rows: list) -> dict:
    """Driver-side export: edge list → the reference's nested dict shape
    (topic_tree.json, scrappy.py:539-540)."""
    children_of: dict[str, list[str]] = {}
    all_children = set()
    for r in edges_rows:
        children_of.setdefault(r.parent, []).append(r.child)
        all_children.add(r.child)

    def nest(term: str) -> dict:
        return {c: nest(c) for c in sorted(children_of.get(term, []))}

    roots = [p for p in children_of if p not in all_children]
    return {r: nest(r) for r in sorted(roots)}
