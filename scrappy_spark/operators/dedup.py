"""Dedup and merge operators (reference D1/D2/M1, SURVEY.md §2.4).

The reference's store merge is ``pd.concat`` + ``drop_duplicates(
subset='title')`` keeping positional-first rows (``scrappy.py:334-335``)
— the "never deletes existing data" guarantee. Positional order has no
distributed meaning, so keep-first here is an explicit priority window:
``row_number() over (partition by key order by priority, tiebreak)``.
``dropDuplicates`` alone would pick an arbitrary row per key and silently
break the guarantee under retries or partition reordering.

Scale notes: the window-dedup is a single hash shuffle on the dedup key;
at 100 TB the key (e.g. title/text hash) is high-cardinality so skew is
not a concern, and AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dedup_arbitrary(df: DataFrame, keys: list[str]) -> DataFrame:
    """D1: within-batch dedup where any representative is acceptable
    (reference ``scrappy.py:316``)."""
    return df.dropDuplicates(keys)


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """D2: deterministic keep-first dedup (reference ``scrappy.py:335``).

    ``order_by`` defines "first" (e.g. ``["priority", "doc_id"]``); it
    must totally order rows within a key group for determinism.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_keep_existing(
    existing: DataFrame, new: DataFrame, keys: list[str], tiebreak: list[str]
) -> DataFrame:
    """M1 merge: union existing+new, existing wins per key (``scrappy.py:325-351``).

    Equivalent to a Delta ``MERGE WHEN NOT MATCHED INSERT``; expressed as
    union + priority window so it runs on plain parquet. Deterministic:
    priority 0 (existing) sorts before 1 (new), then ``tiebreak``.
    """
    e = existing.withColumn("__prio", F.lit(0))
    n = new.withColumn("__prio", F.lit(1))
    merged = e.unionByName(n, allowMissingColumns=True)
    return dedup_keep_first(merged, keys, ["__prio", *tiebreak]).drop("__prio")


def newly_added(existing: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """J1: rows of ``new`` whose key is absent from ``existing``
    (the merge report, reference ``scrappy.py:339-341``).

    Left-anti join; Catalyst broadcasts the existing-keys side when it
    is small, else sort-merge — either way no driver-side set.

    NULL keys never match an equality anti-join, so NULL-key rows are
    always reported as new (pandas ``isin`` behaves the same,
    scrappy.py:339-341). A MERGE insert gate must handle that case
    itself — see ``ArticleStore.merge``.
    """
    return new.join(existing.select(*keys).distinct(), on=keys, how="left_anti")


def best_keeper_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "component",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Pick the highest-quality member of each near-dup cluster as its
    keeper (``quality_col`` DESC, ``id_col`` ASC tie-break) — "keep
    best", not "keep first".

    Min-id keepers (what ``pipelines.dedup_corpus`` emits) are the
    right default for determinism, but a curation pipeline usually
    wants the LONGEST / highest-scoring variant of a near-dup family:
    truncated or boilerplate-wrapped copies should lose to the full
    article regardless of which crawled first. Plug any per-doc score
    in as ``quality_col`` (e.g. ``quality_score``'s output).

    Docs ABSENT from ``clusters`` are treated as singletons (their own
    ``id`` becomes the cluster) rather than silently dropped — a
    cluster map derived from candidate pairs only covers near-dup
    members, and "replace the corpus with the keepers" must not lose
    every unique document.

    One join docs→clusters on id, one window shuffle on the cluster
    key; cluster sizes are small by construction (near-dup families),
    so the per-partition sort is trivial and skew is bounded by the
    biggest dup family.
    """
    joined = docs.join(
        clusters.select(id_col, cluster_col), id_col, "left"
    ).withColumn(cluster_col, F.coalesce(F.col(cluster_col), F.col(id_col)))
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
