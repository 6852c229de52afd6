"""Column-level data profiling.

A corpus pipeline's first question about any new table is "what's in
it": null rates, cardinalities, ranges, value sizes.  The reference has
no profiling surface (its only data inspection is `scrappy.py`'s
ad-hoc `df.head()` prints); this operator makes it a single-scan
DataFrame op.

Shape: ALL metrics for ALL profiled columns are parallel aggregates in
ONE groupBy-less agg — one scan, one reduce of a single row — then a
zero-shuffle ``stack`` unpivot turns that row into one row per column.
No per-column scans, no driver-side loop over columns (the loop builds
expressions, not jobs).

Scale notes: exact ``count_distinct`` over k columns rewrites to an
Expand (k× the scan rows into the partial agg) — the right default for
a profile report because the per-column partials are tiny, but at
100 TB pass ``approximate=True`` to use HLL sketches instead (no
Expand, one pass, ±2% — not oracle-comparable, so the declared query
pins the exact path).  Average length is reported as an exact integer
byte-sum divided once at the end, so shuffle order cannot move a
rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .mining import tokens_col


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approximate: bool = False
) -> DataFrame:
    """One row per column: null count, distinct count, min/max (as
    strings), total/average value length.

    Columns of any type are profiled; min/max and lengths are computed
    on the string cast so the output schema is uniform.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approximate
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            (F.count(F.lit(1)) - F.count(s)).alias(f"{c}__nulls"),
            distinct(c).alias(f"{c}__distinct"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
            F.coalesce(F.sum(F.length(s)), F.lit(0)).cast("long").alias(
                f"{c}__len"
            ),
        ]
    one_row = df.agg(*aggs)
    branches = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max, {c}__len"
        for c in cols
    )
    return one_row.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {branches}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value, total_len)"
        ),
    ).select(
        "column",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
        (F.col("total_len").cast("double") / F.col("n_rows")).alias("avg_len"),
    )


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: tuple[str, str] = ("lang", "source"),
) -> DataFrame:
    """One-pass dataset card: per-language rows, per-source rows, and a
    corpus-total row (GROUPING SETS — disjoint dimensions plus grand
    total, one expand-based aggregate, never three scans), each with
    doc count, token totals, exact median doc length, and a quality
    proxy (mean distinct-token ratio). This is the summary a training
    run pins next to its data mix — auditable because every number is
    deterministic and cheap because the corpus is read once.

    Exact ``percentile`` keeps the numbers oracle-checkable;
    ``percentile_approx`` is the drop-in at 100 TB (same plan shape,
    mergeable sketch state).
    """
    a, b = dims
    toks = tokens_col(F.col(text_col))
    per_doc = df.select(
        F.col(a),
        F.col(b),
        F.size(toks).alias("__n"),
        (
            F.when(
                F.size(toks) > 0,
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
            ).otherwise(F.lit(0.0))
        ).alias("__dr"),
    )
    per_doc.createOrReplaceTempView("__card_docs")
    return df.sparkSession.sql(
        f"""
        SELECT {a}, {b},
               count(*)                                   AS n_docs,
               CAST(sum(__n) AS BIGINT)                   AS total_tokens,
               round(avg(__n), 4)                         AS avg_doc_tokens,
               round(percentile(__n, 0.5), 4)             AS median_doc_tokens,
               round(avg(__dr), 4)                        AS avg_distinct_ratio
        FROM __card_docs
        GROUP BY GROUPING SETS (({a}), ({b}), ())
        """
    )


def footer_stats(
    spark, path: str, cols: list[str], id_sample: int = 0
) -> DataFrame:
    """count / min / max per column answered from parquet FOOTER
    metadata — Spark's DSv2 aggregate pushdown, no row-group scan.

    At 100 TB the difference between "read every row to count it" and
    "sum the row counts the writers already recorded" is hours vs
    seconds: every parquet footer carries row count and per-column
    min/max, and the v2 parquet reader can answer whole-table
    COUNT/MIN/MAX straight from them (``PushedAggregation`` in the
    scan node). The v1 reader (Spark's default) cannot, so this
    operator flips to v2 + ``parquet.aggregatePushdown`` INSIDE a
    restore-guarded block and materializes the one-row result while
    the conf is active (physical planning happens at the action — a
    lazily returned frame would silently re-plan on v1 after the
    restore). The conf flip is session-visible for the duration of
    the (sub-second, metadata-only) action; the returned frame is a
    local one-row re-wrap.

    Caveats, same as the underlying Spark feature: no filters, no
    grouping (pushdown disables itself otherwise), and min/max on
    floating columns honor parquet's NaN-unsafe statistics rules.
    """
    # Isolated probe session (same SparkContext, own SQLConf): the v2 +
    # aggregatePushdown flip used to be a set-and-restore on the SHARED
    # session conf, which any concurrently planning query would observe
    # (a thread-safety hole once registry-wide tests build queries from
    # a driver thread pool — guide §2.6). newSession scopes the flip to
    # this probe; rows and plan are identical.
    probe = spark.newSession()
    probe.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    probe.conf.set(
        "spark.sql.sources.useV1SourceList",
        ",".join(
            s
            for s in probe.conf.get("spark.sql.sources.useV1SourceList").split(",")
            if s.strip() != "parquet"
        ),
    )
    exprs = ["count(*) AS n_rows"]
    for c in cols:
        exprs += [f"min({c}) AS min_{c}", f"max({c}) AS max_{c}"]
    agg = probe.read.parquet(path).selectExpr(*exprs)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    rows = agg.collect()
    from ..functions.localrel import local_relation

    out = local_relation(spark, rows, agg.schema)
    out.pushed_aggregation = "PushedAggregation" in plan
    return out


def skew_report(
    df: DataFrame, key_col: str, k: int = 10
) -> DataFrame:
    """Top-``k`` heaviest values of a prospective shuffle key, with
    integer-basis-point share of total rows — the pre-flight check
    before keying a join/groupBy on a 100 TB table (a key holding >1%
    of rows means salting or AQE skew-join handling, and THIS query is
    how you find out for pennies instead of discovering it as a
    straggler task three hours in).

    One partial-agg groupBy (map-side combine keeps the shuffle at
    distinct-key cardinality) + a broadcast total + TakeOrdered for
    the k. Output: (key value as string, cnt, share_bp).
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "cnt",
            # zero-divisor guard (house rule): an empty input must be
            # NULL under BOTH ANSI and non-ANSI sessions.
            F.expr("CASE WHEN _t > 0 THEN cnt * 10000 div _t END").alias("share_bp"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(k)
    )


def robust_anomalies(
    df: DataFrame,
    group_cols: list[str],
    cents_col: str = "v_cents",
    k_mad: int = 3,
) -> DataFrame:
    """Median/MAD outlier detection, INTEGER-EXACT: flag rows whose
    integer-cents value deviates from their group median by more than
    ``k_mad`` median-absolute-deviations — the robust data-quality
    screen that, unlike z-scores, a heavy tail cannot poison (the
    outliers being hunted inflate a stddev but not a median).

    Exactness argument (why this takes a value-hash gate no float
    z-score could): over integers, an interpolated median is a
    multiple of 1/2 and the MAD a multiple of 1/4, both dyadic — so
    ``dev4 = |4·v − 4·med|`` and ``mad8 = 2·median(dev4)`` are exact
    BIGINTs and the decision rule ``2·dev4 > 3·mad8`` (for k_mad=3)
    is pure integer comparison, bit-identical across engines and
    shuffle orders.

    Output: input group/value columns + (med2, dev4, mad8), anomalous
    rows only. Two group-keyed exact-percentile aggregations + two
    broadcast joins of the (tiny) per-group stat frames; at 100 TB
    swap ``percentile`` for ``percentile_approx`` and widen the rule's
    margin — the exact form is what keeps the oracle checkable.
    """
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({cents_col}, 0.5)").alias("_med")
    )
    d = df.join(F.broadcast(med), list(group_cols)).withColumn(
        "dev4",
        F.abs(4 * F.col(cents_col) - 4 * F.col("_med")).cast("long"),
    )
    mad = d.groupBy(*group_cols).agg(
        (2 * F.expr("percentile(dev4, 0.5)")).cast("long").alias("mad8")
    )
    return (
        d.join(F.broadcast(mad), list(group_cols))
        .filter(2 * F.col("dev4") > k_mad * F.col("mad8"))
        .withColumn("med2", (2 * F.col("_med")).cast("long"))
        .drop("_med")
    )


def join_advisor(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    broadcast_rows: int = 1_000_000,
    skew_share_bp: int = 100,
    target_partitions: int = 200,
) -> DataFrame:
    """Pre-flight planner for a prospective equi-join: EXACT output
    cardinality, heaviest output key, and strategy advice — the cheap
    query you run before keying two 100 TB tables against each other
    (``|A ⋈ B| = Σ_k cl(k)·cr(k)`` can be 1000× the inputs, and the
    time to learn that is before the shuffle, from two partial-agg
    key counts, not three hours into a straggler).

    One row out: left/right row and distinct-key counts, matched-key
    count, exact estimated output rows, the heaviest output key (ties
    to the lexicographically smallest, as a string) with its pair
    count and basis-point share of the output, broadcast flags
    (side fits under ``broadcast_rows``), and ``salt_factor`` — the
    number of salt buckets that spreads the heaviest key's output
    across ``target_partitions`` evenly (1 when no key exceeds
    ``skew_share_bp``).

    Everything reduces through per-key partial-agg counts (shuffle at
    key cardinality, never at row cardinality) and 1-row broadcast
    combines; all arithmetic is exact integers.
    """
    cl = left.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").cast("long").alias("cl")
    )
    cr = right.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").cast("long").alias("cr")
    )
    l_stats = cl.agg(
        F.coalesce(F.sum("cl"), F.lit(0)).cast("long").alias("l_rows"),
        F.count("*").cast("long").alias("l_keys"),
    )
    r_stats = cr.agg(
        F.coalesce(F.sum("cr"), F.lit(0)).cast("long").alias("r_rows"),
        F.count("*").cast("long").alias("r_keys"),
    )
    pairs = cl.join(cr, "key").select(
        "key", (F.col("cl") * F.col("cr")).cast("long").alias("pairs")
    )
    est = pairs.agg(
        F.count("*").cast("long").alias("matched_keys"),
        F.coalesce(F.sum("pairs"), F.lit(0)).cast("long").alias(
            "est_out_rows"
        ),
        F.max("pairs").alias("__mp"),
    )
    # deterministic top key: max pair count, ties to the smallest key
    # string (max_by is tie-nondeterministic; this two-stage agg is not)
    top = (
        pairs.join(
            F.broadcast(est.select("__mp")),
            pairs["pairs"] == F.col("__mp"),
        )
        .agg(F.min("key").alias("top_key"))
    )
    one = (
        l_stats.crossJoin(F.broadcast(r_stats))
        .crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(top))
    )
    return one.select(
        "l_rows",
        "r_rows",
        "l_keys",
        "r_keys",
        "matched_keys",
        "est_out_rows",
        "top_key",
        F.coalesce(F.col("__mp"), F.lit(0)).cast("long").alias(
            "top_key_pairs"
        ),
        F.expr(
            "CASE WHEN est_out_rows > 0 THEN __mp * 10000 div est_out_rows "
            "ELSE 0 END"
        )
        .cast("long")
        .alias("top_share_bp"),
        (F.col("l_rows") <= broadcast_rows).cast("long").alias(
            "broadcast_left"
        ),
        (F.col("r_rows") <= broadcast_rows).cast("long").alias(
            "broadcast_right"
        ),
        F.expr(
            f"CASE WHEN est_out_rows > 0 "
            f"AND __mp * 10000 div est_out_rows > {int(skew_share_bp)} "
            f"THEN greatest(1, (__mp * {int(target_partitions)} "
            f"+ est_out_rows - 1) div est_out_rows) ELSE 1 END"
        )
        .cast("long")
        .alias("salt_factor"),
    )


def cusum_changepoints(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    group_cols: list[str],
    slack: int,
    threshold: int,
) -> DataFrame:
    """Two-sided Page CUSUM change detection per group, in exact
    integers — the sequential-analysis standard for "did this metric's
    level shift?" over ordered per-entity streams.

    The textbook recursion ``S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k))``
    is not a window function, but its closed form IS:
    ``S⁺_t = C_t − min(0, min_{j≤t} C_j)`` where ``C`` is the running
    sum of ``(x − μ − k)`` — so the whole detector is two running sums
    + two running extrema per group: one partition-ordered window
    pass, no fold, no UDF, identical shape in SQL.

    Exactness: μ is the group mean, which is not an integer — so
    everything is scaled by the group size ``n`` (computed by an
    unbounded window on the same partition, no join):
    ``d⁺ = n·x − Σx − n·k`` keeps every intermediate a BIGINT and the
    alarm compare ``S⁺ > n·h`` exact. ``value_col``, ``slack`` (k) and
    ``threshold`` (h) must already be integers in the same unit.

    Output: every input row with ``seq`` (1-based per group),
    ``s_pos``/``s_neg`` (n-scaled CUSUM statistics), ``n`` (the
    scale), and ``alarm_pos``/``alarm_neg`` 0/1 flags. No-reset
    variant: flags mark every position past a sustained shift; the
    first flagged seq per group is the change point.

    Overflow bound (ADVICE r7): the n-scaled running sums reach up to
    ``n² · (2·max|x| + k)`` — a BIGINT holds that for n ≈ 10⁷ rows of
    cent-scale values but silently wraps past it on non-ANSI sessions,
    so the operator RAISES when a group's bound nears 2⁶³ instead of
    emitting wrapped statistics. Groups that big should be
    pre-aggregated (e.g. per-minute means) before change detection —
    CUSUM on 10⁸ raw points is noise-chasing, not monitoring.
    """
    gw = Window.partitionBy(*group_cols)
    ow = gw.orderBy(*[F.col(c).asc() for c in order_cols])
    cw = ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x = F.col(value_col).cast("long")
    n = F.count(F.lit(1)).over(gw).cast("long")
    s = F.sum(x).over(gw).cast("long")
    d_pos = n * x - s - n * F.lit(int(slack))
    d_neg = n * x - s + n * F.lit(int(slack))
    # guard in double with margin (exactness is irrelevant for the
    # guard itself; 4e18 < 2^62 leaves a 2x cushion under BIGINT max):
    # each |d| <= n·(2·max|x| + k), summed over <= n rows.
    nd = n.cast("double")
    bound = nd * nd * (
        2.0 * F.max(F.abs(x)).over(gw).cast("double")
        + float(int(slack)) + 1.0
    )
    n_guarded = F.when(
        bound > 4.0e18,
        F.raise_error(
            F.concat(
                F.lit("cusum_changepoints: group of "),
                n.cast("string"),
                F.lit(
                    " rows exceeds the BIGINT-exact bound for n-scaled"
                    " CUSUM (n^2 * (2*max|x| + slack) near 2^63);"
                    " pre-aggregate the series before change detection"
                ),
            )
        ).cast("long"),
    ).otherwise(n)
    out = df.select(
        *group_cols,
        *order_cols,
        x.alias("value_int"),
        F.row_number().over(ow).cast("long").alias("seq"),
        n_guarded.alias("n"),
        F.sum(d_pos).over(cw).alias("__cp"),
        F.sum(d_neg).over(cw).alias("__cn"),
    )
    cwo = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s_pos = F.col("__cp") - F.least(F.min("__cp").over(cwo), F.lit(0))
    s_neg = F.greatest(F.max("__cn").over(cwo), F.lit(0)) - F.col("__cn")
    h = F.col("n") * F.lit(int(threshold))
    return out.select(
        *group_cols,
        *order_cols,
        "value_int",
        "seq",
        "n",
        s_pos.cast("long").alias("s_pos"),
        s_neg.cast("long").alias("s_neg"),
        (s_pos > h).cast("long").alias("alarm_pos"),
        (s_neg > h).cast("long").alias("alarm_neg"),
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    is_right: "F.Column",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distribution-drift statistic in
    exact integers — "did this metric's DISTRIBUTION change between
    cohorts?" where CUSUM asks about its level over time.

    ``D = sup_x |F₁(x) − F₂(x)`` compares empirical CDFs; the
    fractions disappear by cross-scaling: at every observed value,
    ``D_scaled = |c₁(x)·n₂ − c₂(x)·n₁|`` with ``cᵢ(x)`` the running
    ≤x count of sample i — BIGINT-exact, so the supremum and the
    reported ``d_ppm = max·10⁶ div (n₁·n₂)`` are hash-stable across
    engines. ``value_col`` must be integer (pre-scale floats).

    Shape: one partial-agg groupBy to per-(group, value, side) counts
    (shuffle at distinct-value cardinality, never rows), two ordered
    window cumsums per group, one max. Ties are handled exactly: both
    CDFs step at the SAME merged value point before the difference is
    taken. Output per group: ``(group..., n_left, n_right, d_num,
    d_ppm)`` where ``d_num = max|c₁·n₂ − c₂·n₁|`` (0 when either side
    is empty — no distribution to compare).
    """
    groups = list(group_cols or [])
    # a NULL predicate means UNKNOWN cohort: the row belongs to neither
    # sample (matching SQL's CASE semantics, where a NULL condition
    # falls through both branches) — an otherwise() default would
    # silently fold unknowns into the left CDF
    side = F.when(is_right, F.lit(1)).when(~is_right, F.lit(0))
    per_val = (
        df.select(
            *groups,
            F.col(value_col).cast("long").alias("__v"),
            side.alias("__s"),
        )
        .filter(F.col("__s").isNotNull())
        .groupBy(*groups, "__v")
        .agg(
            F.sum(F.when(F.col("__s") == 0, 1).otherwise(0))
            .cast("long")
            .alias("__cl"),
            F.sum(F.when(F.col("__s") == 1, 1).otherwise(0))
            .cast("long")
            .alias("__cr"),
        )
    )
    gw = Window.partitionBy(*groups) if groups else Window.partitionBy()
    cw = gw.orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_val.select(
        *groups,
        F.sum("__cl").over(gw).cast("long").alias("n_left"),
        F.sum("__cr").over(gw).cast("long").alias("n_right"),
        F.sum("__cl").over(cw).cast("long").alias("__al"),
        F.sum("__cr").over(cw).cast("long").alias("__ar"),
    )
    d = cum.select(
        *groups,
        "n_left",
        "n_right",
        (
            F.col("__al") * F.col("n_right")
            - F.col("__ar") * F.col("n_left")
        ).alias("__diff"),
    )
    agg = d.groupBy(*groups).agg(
        F.first("n_left").alias("n_left"),
        F.first("n_right").alias("n_right"),
        F.max(F.abs(F.col("__diff"))).cast("long").alias("d_num"),
    )
    return agg.select(
        *groups,
        "n_left",
        "n_right",
        F.when(
            (F.col("n_left") > 0) & (F.col("n_right") > 0),
            F.col("d_num"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("d_num"),
        F.when(
            (F.col("n_left") > 0) & (F.col("n_right") > 0),
            F.expr("(d_num * 1000000) div (n_left * n_right)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("d_ppm"),
    )


def k_anonymity_profile(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns — the privacy
    companion to ``curation.scrub_pii``: scrubbing removes DIRECT
    identifiers, but a row can still be re-identified when its
    quasi-identifier combination (language × source × length-bucket ×
    …) is shared by fewer than ``k`` rows (Sweeney 2002's k-anonymity
    criterion). Per observed QI combination: its group size and an
    ``at_risk`` flag (size < k) — the table a release review reads
    before publishing a corpus slice, and the input to suppression /
    generalization decisions.

    NULL QI values group together (both engines' GROUP BY semantics),
    which is the conservative read: "unknown" is itself a bucket.

    Scale shape: one partial-agg groupBy at QI-combination cardinality
    — counts cross the shuffle, rows never do.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity_profile needs >= 1 quasi column")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("group_size"))
        .select(
            *quasi_cols,
            "group_size",
            (F.col("group_size") < int(k)).cast("long").alias("at_risk"),
        )
    )


def l_diversity_profile(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col,
    k: int = 10,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit — the sensitive-attribute companion to
    :func:`k_anonymity_profile` (Machanavajjhala et al. 2007's
    l-diversity criterion): a QI group can satisfy k-anonymity and
    still leak, when every row in it shares one sensitive value (the
    homogeneity attack — "all 12 docs from this (lang, source) are the
    same class"). Per observed QI combination: its size, the count of
    DISTINCT sensitive values, and both flags — ``k_at_risk``
    (size < k) and ``l_at_risk`` (distinct sensitive < l). A release
    review acts on the union of the two.

    ``sensitive_col`` may be a column name or a derived Column (e.g. a
    length bucket). NULL sensitive values count as one value (DISTINCT
    semantics on both engines).

    Scale shape: one partial-agg groupBy at QI cardinality; the
    distinct-count is per-group exact (the group is the unit a review
    inspects — sketches would flag the wrong groups).
    """
    if not quasi_cols:
        raise ValueError("l_diversity_profile needs >= 1 quasi column")
    s = F.col(sensitive_col) if isinstance(sensitive_col, str) else sensitive_col
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").cast("long").alias("group_size"),
            F.countDistinct(s).cast("long").alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "group_size",
            "n_sensitive",
            (F.col("group_size") < int(k)).cast("long").alias("k_at_risk"),
            (F.col("n_sensitive") < int(l)).cast("long").alias("l_at_risk"),
        )
    )


def generalization_candidates(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """The decision table behind "which QI column do we coarsen to
    reach k": for each candidate column, the profile the table would
    have if that column were generalized away (dropped from the QI
    set) — remaining group count, groups still under k, rows still in
    under-k groups, and the smallest surviving group. The reviewer
    picks the drop with zero (or least) residual risk; ties go to the
    column whose removal keeps the most groups (least information
    destroyed).

    Scale shape: one partial-agg groupBy per candidate (|quasi_cols|
    passes over the QI-combination aggregate, each at reduced-QI
    cardinality), unioned; nothing row-sized crosses a shuffle.
    """
    if len(quasi_cols) < 2:
        raise ValueError(
            "generalization needs >= 2 quasi columns (dropping the only "
            "one leaves no QI set to audit)"
        )
    legs = []
    for drop in quasi_cols:
        keep = [c for c in quasi_cols if c != drop]
        g = df.groupBy(*keep).agg(F.count("*").alias("__n"))
        legs.append(
            g.agg(
                F.lit(drop).alias("generalize_col"),
                F.count("*").cast("long").alias("n_groups"),
                F.coalesce(
                    F.sum((F.col("__n") < int(k)).cast("long")), F.lit(0)
                )
                .cast("long")
                .alias("n_at_risk_groups"),
                F.coalesce(
                    F.sum(F.when(F.col("__n") < int(k), F.col("__n"))),
                    F.lit(0),
                )
                .cast("long")
                .alias("at_risk_rows"),
                F.min("__n").cast("long").alias("min_group_size"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def privacy_release_gate(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col,
    k: int = 10,
    l: int = 3,
) -> DataFrame:
    """The release-review capstone (VERDICT r9 #8 / r10 #6): compose
    :func:`k_anonymity_profile`, :func:`l_diversity_profile` and
    :func:`generalization_candidates` into ONE verdict table — the
    page a reviewer reads before a corpus slice ships, in the
    ``expectations_snapshot_log`` one-row-per-check shape:

    - ``('k_anonymity', 'k=<k>', …)`` — groups under k, rows exposed;
    - ``('l_diversity', 'l=<l>', …)`` — homogeneous groups
      (``min_stat`` here is the SMALLEST distinct-sensitive count);
    - ``('generalize', <col>, …)`` one row per QI column — the
      residual risk if that column were coarsened away; ``passed``
      when the residue is zero;
    - ``('release', <verdict>, …)`` — the decision: ``release`` when
      both audits pass, else ``generalize:<col>`` naming the best
      zero-residue candidate (most groups retained, ties by name),
      else ``block``. Its counts aggregate EITHER-flag exposure.

    All legs are QI-cardinality aggregates composed with broadcast
    one-row cross-joins — rows never cross a shuffle and nothing
    reaches the driver; the verdict string is computed in-plan.
    """
    # The per-group profile feeds FIVE aggregate consumers (k_row and
    # l_row each evaluate twice — once in the output union, once as the
    # broadcast verdict inputs of the release leg — plus the either-flag
    # agg), and each evaluation re-runs the full corpus groupBy. The
    # frame is QI-cardinality (groups, not rows), so materialize it once
    # (lazy — declared queries stay action-free until the driver
    # executes them; guide §5, reuse beats recompute). Measured at
    # sf0.1: 5 corpus scans -> 1 (r14).
    ld = l_diversity_profile(
        df, quasi_cols, sensitive_col, k=k, l=l
    ).localCheckpoint(eager=False)
    schema = [
        "gate_check",
        "detail",
        "n_groups",
        "n_at_risk_groups",
        "at_risk_rows",
        "min_stat",
        "passed",
    ]

    def _leg(name: str, detail, flag: str, min_col: str) -> DataFrame:
        return ld.agg(
            F.count("*").cast("long").alias("n_groups"),
            F.coalesce(F.sum(F.col(flag)), F.lit(0))
            .cast("long")
            .alias("n_at_risk_groups"),
            F.coalesce(
                F.sum(F.when(F.col(flag) == 1, F.col("group_size"))),
                F.lit(0),
            )
            .cast("long")
            .alias("at_risk_rows"),
            F.min(min_col).cast("long").alias("min_stat"),
        ).select(
            F.lit(name).alias("gate_check"),
            F.lit(detail).alias("detail"),
            "n_groups",
            "n_at_risk_groups",
            "at_risk_rows",
            "min_stat",
            (F.col("n_at_risk_groups") == 0).cast("long").alias("passed"),
        )

    k_row = _leg("k_anonymity", f"k={int(k)}", "k_at_risk", "group_size")
    l_row = _leg("l_diversity", f"l={int(l)}", "l_at_risk", "n_sensitive")

    # Same reuse move: the candidate table is read by the output union
    # AND twice by the best-candidate selection below, and each read
    # re-runs one corpus groupBy per QI column. |quasi_cols| rows —
    # materialize once, lazily.
    gen = generalization_candidates(df, quasi_cols, k=k).localCheckpoint(
        eager=False
    )
    gen_rows = gen.select(
        F.lit("generalize").alias("gate_check"),
        F.col("generalize_col").alias("detail"),
        "n_groups",
        "n_at_risk_groups",
        "at_risk_rows",
        F.col("min_group_size").alias("min_stat"),
        (F.col("n_at_risk_groups") == 0).cast("long").alias("passed"),
    )

    # best zero-residue candidate: most groups retained, ties by name
    ok = gen.filter(F.col("n_at_risk_groups") == 0)
    mx = ok.agg(F.max("n_groups").alias("__mx"))
    best = (
        ok.join(F.broadcast(mx), F.col("n_groups") == F.col("__mx"))
        .agg(F.min("generalize_col").alias("__best"))
    )
    either = ld.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.coalesce(
            F.sum(
                ((F.col("k_at_risk") == 1) | (F.col("l_at_risk") == 1)).cast(
                    "long"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_at_risk_groups"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("k_at_risk") == 1) | (F.col("l_at_risk") == 1),
                    F.col("group_size"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("at_risk_rows"),
        F.min("group_size").cast("long").alias("min_stat"),
    )
    release = (
        either.crossJoin(
            F.broadcast(
                k_row.select(F.col("passed").alias("__k_ok"))
            )
        )
        .crossJoin(
            F.broadcast(l_row.select(F.col("passed").alias("__l_ok")))
        )
        .crossJoin(F.broadcast(best))
        .select(
            F.lit("release").alias("gate_check"),
            F.when(
                (F.col("__k_ok") == 1) & (F.col("__l_ok") == 1),
                F.lit("release"),
            )
            .when(
                F.col("__best").isNotNull(),
                F.concat(F.lit("generalize:"), F.col("__best")),
            )
            .otherwise(F.lit("block"))
            .alias("detail"),
            "n_groups",
            "n_at_risk_groups",
            "at_risk_rows",
            "min_stat",
            ((F.col("__k_ok") == 1) & (F.col("__l_ok") == 1))
            .cast("long")
            .alias("passed"),
        )
    )
    return (
        k_row.unionByName(l_row)
        .unionByName(gen_rows)
        .unionByName(release)
        .select(*schema)
    )
