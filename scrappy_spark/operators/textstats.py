"""Text-analysis operators for training-data pipelines.

Quality scoring, token counting, language-ID heuristics, and document
fingerprinting — all pure built-in column expressions (JVM-side, inside
whole-stage codegen), so they scan-scale to 100 TB: no shuffle at all,
one pass over the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .mining import STOPWORDS, ngrams_expr, tokens_col

#: tiny per-language marker-word lists for the n-gram language heuristic.
#: Deterministic and self-contained; swap in real frequency tables at
#: deployment. Order matters: ties resolve to the earlier language.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "las", "que", "y", "es"),
    "fr": ("le", "la", "les", "et", "est", "une", "que"),
}


def _arr_lit(words: tuple[str, ...]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: token count, average token length,
    stopword ratio, distinct-token ratio, alpha-char ratio.

    All ratios are rounded so they are stable under float re-ordering.
    """
    toks = tokens_col(F.col(text_col))
    sw = _arr_lit(STOPWORDS)
    df = df.select(id_col, F.col(text_col).alias("__text"), toks.alias("__toks"))
    n_toks = F.size("__toks")
    return df.select(
        id_col,
        n_toks.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.when(
                n_toks > 0,
                F.aggregate("__toks", F.lit(0), lambda a, t: a + F.length(t)).cast("double")
                / n_toks,
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("avg_token_len"),
        F.round(
            F.when(
                n_toks > 0,
                F.size(F.expr(f"filter(__toks, t -> array_contains({sw}, t))")).cast("double")
                / n_toks,
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_toks > 0, F.size(F.array_distinct("__toks")).cast("double") / n_toks)
            .otherwise(F.lit(0.0)),
            4,
        ).alias("distinct_ratio"),
        F.round(
            F.length(F.regexp_replace("__text", "[^a-zA-Z]", "")).cast("double")
            / F.greatest(F.length("__text"), F.lit(1)),
            4,
        ).alias("alpha_ratio"),
    )


def lang_score(toks: Column, lang: str) -> Column:
    """# of distinct marker words of ``lang`` present in the token set."""
    return F.size(F.array_intersect(F.array_distinct(toks), F.expr(_arr_lit(LANG_MARKERS[lang]))))


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-overlap language heuristic: argmax of per-language marker
    hits, 'und' (undetermined) when nothing matches. Fixed precedence
    order (en, de, es, fr) resolves ties deterministically."""
    toks = tokens_col(F.col(text_col))
    df = df.select(id_col, toks.alias("__toks"))
    scores = {lg: lang_score(F.col("__toks"), lg) for lg in LANG_MARKERS}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lg in reversed(list(LANG_MARKERS)):  # build CASE from lowest precedence up
        pred = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(pred)
    out = df.select(
        id_col,
        pred.alias("pred_lang"),
        *[scores[lg].cast("long").alias(f"score_{lg}") for lg in LANG_MARKERS],
    )
    return out


#: BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
#: marks — the shape GPT-style byte-pair encoders split on before
#: merging. A real tokenizer plugs in via pandas UDF; this regex family
#: gives exact, engine-portable token counts for budgeting/stats.
BPE_SPLIT_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_SPLIT_RE), 0)


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token budget: whitespace tokens, BPE-ish pieces, and
    the pieces-per-word expansion ratio (the LLM-cost estimator)."""
    ws = tokens_col(F.col(text_col))
    bpe = bpe_tokens(F.col(text_col))
    return df.select(
        id_col,
        F.size(ws).cast("long").alias("n_words"),
        F.size(bpe).cast("long").alias("n_bpe_pieces"),
        F.round(
            F.when(F.size(ws) > 0, F.size(bpe).cast("double") / F.size(ws)).otherwise(0.0), 4
        ).alias("pieces_per_word"),
    )


ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 31


def rolling_hash(col: Column) -> Column:
    """Polynomial rolling hash over the characters of ``col``:
    h = Σ c_i·B^(n-i) mod M, computed as a left fold — pure SQL
    higher-order functions, identical in any engine with a fold."""
    codes = F.transform(
        F.filter(F.split(col, ""), lambda c: c != F.lit("")),
        lambda c: F.ascii(c).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c) % ROLLING_MOD,
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score + keep/drop flag — the gating step of a
    training-data pipeline. Score blends length, lexical diversity, and
    stopword plausibility; thresholds are explicit so the filter is
    auditable. Deterministic, scan-only.

    Ratios are computed UNROUNDED here (doc_stats rounds for display);
    only the final score rounds, so the composite matches any engine
    computing the same formula in double precision."""
    sw = _arr_lit(STOPWORDS)
    toks = tokens_col(F.col(text_col))
    base = df.select(id_col, toks.alias("__toks"))
    n = F.size("__toks")
    distinct_ratio = F.when(
        n > 0, F.size(F.array_distinct("__toks")).cast("double") / n
    ).otherwise(F.lit(0.0))
    stopword_ratio = F.when(
        n > 0,
        F.size(F.expr(f"filter(__toks, t -> array_contains({sw}, t))")).cast("double") / n,
    ).otherwise(F.lit(0.0))
    length_term = F.least(n.cast("double") / 64.0, F.lit(1.0))
    stopword_term = 1.0 - F.abs(stopword_ratio - 0.08) / 0.92
    score = F.round(0.4 * length_term + 0.3 * distinct_ratio + 0.3 * stopword_term, 4)
    return base.select(
        id_col,
        score.alias("quality_score"),
        ((n >= 10) & (distinct_ratio >= 0.2) & (score >= 0.5)).alias("keep"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` token vocabulary — the tokenizer-health probe a
    training pipeline runs before committing to a vocab budget (high
    OOV mass ⇒ the vocab or the corpus mix is wrong).

    Shape: ONE token explode feeds both sides — the corpus-frequency
    groupBy whose top-k (count desc, token asc — deterministic
    tie-break) becomes the broadcast vocab, and the per-doc OOV agg
    that joins against it. Top-k is `TakeOrderedAndProject`, never a
    full sort; the per-doc side shuffles once on the doc key.
    Output: (id, n_tokens, n_oov, oov_rate) — multiplicity counts
    (every occurrence of an OOV token counts), matching what the
    token budget actually pays."""
    toks = df.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("__in_vocab", F.lit(1))), "tok", "left"
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum((F.col("__in_vocab").isNull()).cast("long")).alias("n_oov"),
    )
    base = df.select(id_col)
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.round(F.col("n_oov") / F.col("n_tokens"), 4),
            )
            .otherwise(0.0)
            .alias("oov_rate"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical document fingerprint: md5 over the normalized
    space-joined token stream, plus the token count. Identical token
    streams (whitespace/punctuation-insensitive) collide on purpose."""
    toks = tokens_col(F.col(text_col))
    canon = F.array_join(toks, " ")
    return df.select(
        id_col,
        F.md5(canon).alias("fingerprint"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def unigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average surprisal under the corpus's own unigram
    model — the cheapest useful 'perplexity' quality signal (gibberish
    and boilerplate sit at the distribution's tails; cf. CCNet-style
    LM filtering, which this approximates without a trained LM).

    Per-token log-probabilities are snapped to integer MICRO-NATS
    (round(ln(tf/total)·1e6)), so the per-document reduction is an
    integer sum — associative, bit-stable across shuffle orders and
    engines — and the only float op per doc is one final division.

    Shape: one explode → token-count aggregate (vocab-sized), the
    total as a 1-row broadcast, the per-token table broadcast back
    onto the exploded stream (vocabularies fit executor memory even at
    100 TB corpora — Heaps' law), then one groupBy(doc). Docs with
    zero tokens are absent from the output by definition.
    """
    toks = df.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("s"))
    lp = freq.join(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("c").cast("double") / F.col("s")) * 1_000_000)
        .cast("long")
        .alias("lp_micro"),
    )
    return (
        toks.join(F.broadcast(lp), "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            (-F.sum("lp_micro")).alias("surprisal_micro"),
        )
        .select(
            id_col,
            "n_tokens",
            "surprisal_micro",
            (
                F.col("surprisal_micro").cast("double")
                / 1_000_000
                / F.col("n_tokens")
            ).alias("avg_surprisal"),
        )
    )


def doc_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document perplexity under the corpus's own interpolated
    bigram LM — the standard CCNet/Gopher-style quality signal one
    rung above :func:`unigram_surprisal`: repetitive boilerplate sits
    LOW (its bigrams dominate the corpus), shuffled-word gibberish
    sits HIGH (frequent unigrams, never-seen bigrams) — a separation
    the unigram model cannot make.

    Model: p(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/N, where c(w₁·)
    is the context count (bigrams starting with w₁) and N the corpus
    token total. Interpolation (Jelinek–Mercer) keeps every probability
    nonzero without train/held-out splits. Per-bigram log-probs are
    snapped to integer MICRO-NATS on the bigram-TYPE table, so the
    per-document reduction is an exact integer sum (associative,
    engine-stable); perplexity = exp(nll/n) is one float op per doc.

    Shape: one bigram explode; bigram-type counts (one shuffle on the
    bigram string); context counts derived FROM the bigram table (a
    re-agg of the small type table, not a second corpus pass); unigram
    table reused from the token stream. Probability tables follow
    Heaps' law — they fit executor memory at any corpus size — and are
    broadcast back onto the exploded stream, so the corpus itself is
    never shuffled on a model key. Docs with < 2 tokens are absent.
    """
    toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("toks"))
    # The two model TYPE tables (unigram + bigram counts) are each
    # referenced twice (total/ctx re-agg + the log-prob join); without
    # a materialization every reference re-runs the corpus tokenize +
    # explode + count shuffle. Both follow Heaps' law — bounded at any
    # corpus size — so a lazy localCheckpoint is safe and cuts the
    # executed plan's corpus passes from 5 to 3 (r14).
    uni = (
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cu"))
        .localCheckpoint(eager=False)
    )
    total = uni.agg(F.sum("cu").alias("n"))
    big = toks.select(
        F.col(id_col),
        F.explode(F.expr(ngrams_expr("toks", 2))).alias("bigram"),
    )
    bfreq = (
        big.groupBy("bigram")
        .agg(F.count("*").alias("cb"))
        .localCheckpoint(eager=False)
    )
    ctx = (
        bfreq.select(F.substring_index("bigram", " ", 1).alias("w1"), "cb")
        .groupBy("w1")
        .agg(F.sum("cb").alias("c1"))
    )
    # per-TYPE log-prob table: micro-nat snap happens here, once per
    # distinct bigram, so the doc-level sum is integer-exact.
    p = (
        F.lit(lam) * F.col("cb").cast("double") / F.col("c1")
        + F.lit(1.0 - lam) * F.col("cu").cast("double") / F.col("n")
    )
    lp = (
        bfreq.withColumn("w1", F.substring_index("bigram", " ", 1))
        .withColumn("w2", F.substring_index("bigram", " ", -1))
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(uni.withColumnRenamed("tok", "w2")), "w2")
        .join(F.broadcast(total))
        .select("bigram", F.round(F.log(p) * 1_000_000).cast("long").alias("lp_micro"))
    )
    return (
        big.join(F.broadcast(lp), "bigram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            (-F.sum("lp_micro")).alias("nll_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            "nll_micro",
            F.round(
                F.exp(
                    F.col("nll_micro").cast("double") / 1_000_000 / F.col("n_bigrams")
                ),
                4,
            ).alias("ppl"),
        )
    )


def ngram_novelty(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Per-document novelty: the share of a doc's distinct word
    ``n``-grams whose FIRST corpus occurrence (minimum ``id_col``) is
    this document — the standard "how much does this doc add"
    curation signal (low-novelty docs are recombinations of text the
    corpus already has; cf. n-gram-overlap novelty filtering in web-
    corpus pipelines).

    The ratio is emitted as integer basis points (``novel_bp`` =
    ``n_novel · 10⁴ div n_grams``) — integer-exact, so the value is
    bit-stable across engines and shuffle orders (house rule: no float
    ties in oracle-checked columns).

    Shape: distinct-gram explode → ONE shuffle on gram where a
    partition-local window ``min`` tags each gram's first owner (no
    gram-keyed join needed) → one groupBy(doc). A pathologically
    common gram makes a fat gram partition; AQE's skew split handles
    it (the window is a full-partition agg, safe to split by key
    range). Zero-gram docs (fewer than ``n`` tokens) surface with
    ``n_grams = 0`` and NULL ``novel_bp``.
    """
    from pyspark.sql import Window

    grams = (
        df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("toks"))
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(F.expr(ngrams_expr("toks", n)))).alias(
                "gram"
            ),
        )
    )
    first = F.min(id_col).over(Window.partitionBy("gram"))
    scored = (
        grams.withColumn("_first", first)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum((F.col("_first") == F.col(id_col)).cast("long"))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            # zero-divisor guard (house rule): a gram-free doc must be
            # NULL under BOTH ANSI and non-ANSI sessions.
            F.expr("CASE WHEN n_grams > 0 THEN n_novel * 10000 div n_grams END").alias("novel_bp"),
        )
    )


def token_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Corpus drift report between two corpus versions: unigram KL
    divergence KL(new ‖ old) over the shared vocabulary plus the
    new-only (OOV) probability mass — the distribution-shift monitor a
    training pipeline runs between crawls (a quiet KL with low OOV
    mass means the new crawl is "more of the same"; spikes mean the
    mixture changed and reweighting decisions are stale).

    Integer-exact contract (house rule): per-token log-probs snap to
    micro-nats exactly like ``unigram_surprisal``; each shared token
    contributes ``c_new · (lp_new − lp_old)`` — an integer — and the
    single float division by total_new happens once at the end, so the
    value is bit-stable across engines and shuffle orders. OOV tokens
    (unseen in ``old``) are excluded from the KL term (their log-ratio
    is undefined) and reported as integer basis points of mass instead.

    Shape: two explodes → two vocab-sized partial aggs → ONE
    vocab-keyed full-outer join → a 1-row reduce. Nothing scales with
    corpus size except the linear token scans; the joined frame is
    vocab-sized (Heaps' law keeps it executor-friendly at 100 TB).
    """
    def vocab(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias(f"c_{tag}"))
        )

    vo, vn = vocab(old, "old"), vocab(new, "new")
    tot_o = vo.agg(F.sum("c_old").alias("t_old"))
    tot_n = vn.agg(F.sum("c_new").alias("t_new"))
    joined = (
        vn.join(vo, "tok", "full_outer")
        .crossJoin(F.broadcast(tot_o))
        .crossJoin(F.broadcast(tot_n))
    )
    lp = lambda c, t: F.round(F.log(c.cast("double") / t) * 1_000_000).cast("long")
    shared = F.col("c_new").isNotNull() & F.col("c_old").isNotNull()
    contrib = F.when(
        shared,
        F.col("c_new") * (lp(F.col("c_new"), F.col("t_new")) - lp(F.col("c_old"), F.col("t_old"))),
    ).otherwise(F.lit(0))
    oov_mass = F.when(
        F.col("c_new").isNotNull() & F.col("c_old").isNull(), F.col("c_new")
    ).otherwise(F.lit(0))
    return joined.agg(
        F.sum(F.when(F.col("c_old").isNotNull(), 1).otherwise(0)).cast("bigint").alias("vocab_old"),
        F.sum(F.when(F.col("c_new").isNotNull(), 1).otherwise(0)).cast("bigint").alias("vocab_new"),
        F.sum(F.when(shared, 1).otherwise(0)).cast("bigint").alias("vocab_shared"),
        F.sum(contrib).cast("bigint").alias("kl_contrib_micro"),
        F.expr("sum(CASE WHEN c_new IS NOT NULL AND c_old IS NULL THEN c_new ELSE 0 END) * 10000 div first(t_new)").alias("oov_new_bp"),
        (
            F.sum(contrib).cast("double") / 1_000_000 / F.first("t_new")
        ).alias("kl_nats"),
    )


def ngram_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Build the stored gram index for :func:`incremental_ngram_novelty`:
    the distinct ``gram`` set of a corpus (store bucketed by gram so
    daily ingest joins co-locate)."""
    return (
        df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("toks"))
        .select(
            F.explode(F.array_distinct(F.expr(ngrams_expr("toks", n)))).alias("gram")
        )
        .distinct()
    )


def incremental_ngram_novelty(
    new_docs: DataFrame,
    base_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Daily-ingest form of :func:`ngram_novelty`: score a NEW batch
    against a stored gram index without ever re-reading base text —
    the same index-closes-the-loop contract as
    ``dedup_corpus_incremental``.

    ``base_grams`` is the stored index: one ``gram`` column (plus
    anything else; only ``gram`` is read). A batch doc's gram is novel
    iff it is absent from the index AND this doc is the min-id owner
    within the batch — base ALWAYS wins regardless of id ordering,
    because it was ingested earlier (this is where the incremental
    semantics deliberately differ from min-id over the union).

    Returns ``(scores, updated_index)``: scores matches
    ``ngram_novelty``'s schema; updated_index = base ∪ the batch's new
    grams, ready for the next ingest. Shapes: one gram-keyed window
    over the batch (batch-sized), one gram join against the index
    (index-sized, but the index side is (gram)-distinct and joins
    shuffle-to-shuffle — at scale, bucket the stored index by gram so
    the daily join co-locates for free).
    """
    from pyspark.sql import Window

    grams = (
        new_docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("toks"))
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(F.expr(ngrams_expr("toks", n)))).alias("gram"),
        )
    )
    batch_first = F.min(id_col).over(Window.partitionBy("gram"))
    marked = (
        grams.withColumn("_first", batch_first)
        .join(
            base_grams.select("gram").distinct().withColumn("_in_base", F.lit(True)),
            "gram",
            "left",
        )
        .withColumn(
            "_novel",
            (F.col("_in_base").isNull() & (F.col("_first") == F.col(id_col))).cast("long"),
        )
    )
    scored = marked.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_grams"),
        F.sum("_novel").cast("bigint").alias("n_novel"),
    )
    scores = (
        new_docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            # zero-divisor guard (house rule): a gram-free doc must be
            # NULL under BOTH ANSI and non-ANSI sessions.
            F.expr("CASE WHEN n_grams > 0 THEN n_novel * 10000 div n_grams END").alias("novel_bp"),
        )
    )
    new_grams = (
        marked.filter(F.col("_in_base").isNull())
        .select("gram")
        .distinct()
    )
    updated_index = base_grams.select("gram").unionByName(new_grams)
    return scores, updated_index


def quality_floor_sweep(
    df: DataFrame,
    thresholds_milli: tuple[int, ...] = tuple(range(0, 1000, 50)),
    weight_col: str | None = "n_chars",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-floor calibration curve: for each candidate threshold,
    how many documents (and how much text, by ``weight_col``) a
    ``quality_score >= t`` floor would keep — the table that turns
    "pick a quality floor" into "pick the floor that keeps the token
    budget", instead of guessing and re-running the corpus filter.

    Scores compare in exact milli units (``round(score·1000)`` — the
    score itself is the 4-dp composite from :func:`quality_score`, so
    the milli cast is engine-portable). Output per threshold:
    ``(t_milli, kept_docs, kept_weight, kept_docs_ppm,
    kept_weight_ppm)``, ppm of the corpus totals.

    Scale shape: the expectations-report pattern — ONE scan with
    ``2·|grid|`` conditional partial aggregates collapsed to a single
    row, then a zero-shuffle struct explode to the report rows. The
    grid never multiplies the data (no doc × threshold cross join).
    """
    if not thresholds_milli:
        raise ValueError("quality_floor_sweep needs >= 1 threshold")
    scored = quality_score(df, text_col=text_col, id_col=id_col).select(
        id_col,
        F.round(F.col("quality_score") * 1000)
        .cast("long")
        .alias("__milli"),
    )
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    base = scored.join(
        df.select(id_col, w.alias("__w")), id_col
    )
    aggs = [
        F.count("*").cast("long").alias("__nd"),
        F.coalesce(F.sum("__w"), F.lit(0)).cast("long").alias("__nw"),
    ]
    for i, t in enumerate(thresholds_milli):
        kept = F.col("__milli") >= int(t)
        aggs.append(
            F.coalesce(F.sum(kept.cast("long")), F.lit(0))
            .cast("long")
            .alias(f"__d_{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(kept, F.col("__w"))), F.lit(0))
            .cast("long")
            .alias(f"__w_{i}")
        )
    one = base.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(t)).cast("long").alias("t_milli"),
                    F.col(f"__d_{i}").alias("kept_docs"),
                    F.col(f"__w_{i}").alias("kept_weight"),
                )
                for i, t in enumerate(thresholds_milli)
            ]
        )
    ).alias("__r")
    return one.select("__nd", "__nw", rows).select(
        F.col("__r.t_milli").alias("t_milli"),
        F.col("__r.kept_docs").alias("kept_docs"),
        F.col("__r.kept_weight").alias("kept_weight"),
        # ppm products in DECIMAL: kept_weight is a character mass that
        # reaches ~1e14 at the 100 TB scale this sweep is for, so
        # kept_weight * 1e6 wraps BIGINT (ADVICE r8 #2). decimal(20,0)
        # × 1e6 stays exact; `div` floors back to BIGINT (ppm ≤ 1e6).
        F.when(
            F.col("__nd") > 0,
            F.expr(
                "cast(__r.kept_docs as decimal(20,0)) * 1000000 div __nd"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("kept_docs_ppm"),
        F.when(
            F.col("__nw") > 0,
            F.expr(
                "cast(__r.kept_weight as decimal(20,0)) * 1000000 div __nw"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("kept_weight_ppm"),
    )


def segment_lang_profile(
    df: DataFrame,
    seg_tokens: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    scorer=None,
) -> DataFrame:
    """Segment-level language profile — the code-switching / mixed-
    language detector whole-document :func:`lang_id` cannot be: the
    token stream is cut into fixed ``seg_tokens`` windows, each window
    is language-ID'd with the same marker-overlap heuristic, and the
    per-doc profile reports the majority language by segment votes plus
    a ``mixed`` flag (≥ 2 distinct non-'und' segment languages). Docs
    that are one language with a pasted foreign paragraph — the classic
    web-scrape noise a whole-doc argmax averages away — surface here.

    Determinism: same token/marker machinery as ``lang_id``; vote ties
    break by the fixed marker-table precedence (en, de, es, fr, then
    any other label lexically, 'und' grouped with those). Zero-token
    docs report (0 segments, 'und', mixed=0).

    ``scorer``: optional upgrade hook — a callable receiving the
    segment frame ``(id_col, __s, __seg_text)`` (one row per segment,
    text = the segment's tokens joined by spaces) and returning
    ``(id_col, __pred)`` per segment. The learned language ID plugs in
    here (``ml/langid.py::learned_segment_scorer``), upgrading the
    code-switching detector without touching the vote/majority
    machinery; ``None`` keeps the marker heuristic.

    Scale shape: the segment explode is ~tokens/seg rows per doc
    (linear scan-side), then ONE partial-agg groupBy at
    (doc, language) cardinality and a per-doc argmax window — nothing
    quadratic, no UDF.
    """
    seg = int(seg_tokens)
    if seg <= 0:
        raise ValueError(f"seg_tokens must be > 0, got {seg}")
    langs = list(LANG_MARKERS)
    toks = tokens_col(F.col(text_col))
    base = df.select(id_col, toks.alias("__toks"))
    n_segs = F.ceil(F.size("__toks") / F.lit(seg)).cast("int")
    segs = base.select(
        id_col,
        "__toks",
        F.explode_outer(
            F.when(
                n_segs > 0, F.sequence(F.lit(0), n_segs - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__s"),
    )
    seg_toks = F.slice(F.col("__toks"), F.col("__s") * seg + 1, seg)
    scores = {lg: lang_score(seg_toks, lg) for lg in langs}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(pred)
    live = segs.filter(F.col("__s").isNotNull())
    if scorer is None:
        pred_frame = live.select(id_col, pred.alias("__pred"))
    else:
        pred_frame = scorer(
            live.select(
                id_col,
                "__s",
                F.array_join(seg_toks, " ").alias("__seg_text"),
            )
        ).select(id_col, "__pred")
    voted = (
        pred_frame
        .groupBy(id_col, "__pred")
        .agg(F.count("*").cast("long").alias("__votes"))
    )
    prec = F.lit(len(langs))
    for i, lg in enumerate(langs):
        prec = F.when(F.col("__pred") == lg, F.lit(i)).otherwise(prec)
    # final lexical tiebreak: marker langs carry unique precedence, but
    # a plugged-in scorer may emit labels outside the table — without
    # it, equal-vote ties among those would be nondeterministic
    w = Window.partitionBy(id_col).orderBy(
        F.desc("__votes"), prec.asc(), F.asc("__pred")
    )
    per_doc = (
        voted.withColumn("__rn", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.sum("__votes").cast("long").alias("n_segments"),
            F.max(
                F.when(F.col("__rn") == 1, F.col("__pred"))
            ).alias("majority_lang"),
            F.max(
                F.when(F.col("__rn") == 1, F.col("__votes"))
            ).cast("long").alias("majority_segments"),
            F.count_distinct(
                F.when(F.col("__pred") != "und", F.col("__pred"))
            ).cast("long").alias("n_langs"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
            F.coalesce("majority_lang", F.lit("und")).alias("majority_lang"),
            F.coalesce("majority_segments", F.lit(0))
            .cast("long")
            .alias("majority_segments"),
            F.coalesce("n_langs", F.lit(0)).cast("long").alias("n_langs"),
            (F.coalesce("n_langs", F.lit(0)) >= 2).cast("long").alias("mixed"),
        )
    )
