"""Approximate / near-duplicate dedup operators.

Four scale-out near-dup strategies over a text corpus, all expressed as
shuffle-lean DataFrame pipelines:

- exact hash dedup: md5 groupBy — one shuffle on a uniform key;
- MinHash + LSH: shingle → per-seed min-hash → band bucket join —
  candidate generation never compares all pairs, so it scales as
  O(n · bands) instead of O(n²);
- n-gram Jaccard verification: exact set overlap on candidate pairs (or
  blocked pairs) only;
- SimHash: 64-bit majority fingerprint, near-dups = small Hamming
  distance within buckets.

Hashing defaults to md5 (reproducible across engines — the DuckDB
oracle computes identical signatures). For deployment throughput pass
``hash_fn="xxhash64"``: ~5× cheaper per hash, JVM-native, same
collision behavior for LSH purposes — but engine-specific, so the
declared queries keep md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .mining import ngrams_expr, tokens_col


def _hash_col(prefix: Column, value: Column, hash_fn: str) -> Column:
    """Seeded string hash with a sortable output (min-hash needs a
    total order; xxhash64 longs and md5 hex strings both provide one)."""
    if hash_fn == "md5":
        return F.md5(F.concat_ws("|", prefix, value))
    if hash_fn == "xxhash64":
        return F.xxhash64(prefix, value)
    raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")


#: universal-hash family for MinHash over ONE base digest per shingle
#: (Carter-Wegman): per-shingle cost is one digest plus k codegen
#: mult-add-mods instead of k digests. The 32-bit base is split into
#: 16-bit halves and hashed as a vector —
#:     h_i(x) = (a1_i·hi16(x) + a2_i·lo16(x) + b_i) mod P
#: — because the scalar form (a·x + b) mod P is NOT universal when the
#: key domain (2^32) exceeds P: base pairs congruent mod P would
#: collide under every function simultaneously. With both halves
#: < 2^16 < P the family is universal, and every term stays < 2^47,
#: far inside ANSI int64. Constants are part of the signature
#: definition: the DuckDB oracle SQL is generated from these values.
MINHASH_P = 2_147_483_647  # 2^31 − 1, prime
#: (a1, a2, b) per seed; a1/a2 odd and < 2^30, b < P.
MINHASH_ABC: tuple[tuple[int, int, int], ...] = (
    (972663749, 384179861, 463922737),
    (815999567, 651723103, 742459249),
    (294085213, 129374561, 931980343),
    (578251957, 887310683, 235729183),
    (925161197, 443087617, 617364989),
    (383478967, 761230409, 85731),
    (128864387, 555027179, 402828283),
    (674322551, 213040289, 56598989),
)


def _minhash_base(value: Column, hash_fn: str) -> Column:
    """Base hash → bigint in [0, 2^32): the first 8 md5 hex digits
    (engine-portable — DuckDB computes the identical value), or
    xxhash64 folded to 32 bits for the deployment path."""
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(value), 1, 8), 16, 10).cast("long")
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(value), F.lit(4_294_967_296)).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash: (hash → representative id, count)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
    )


def with_exact_rep(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Input rows plus a ``__rep`` column = min id among rows with
    identical text — ONE full-row shuffle (window min over the content
    hash), versus the groupBy-then-join-back shape which shuffles the
    corpus twice more (join by hash, semi join by id). At 100 TB the
    extra full-row shuffles are the dominant cost, so the window wins
    despite its within-partition sort (sort-based shuffle pays that
    sort anyway)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col)))
    return df.withColumn("__rep", F.min(id_col).over(w))


def collapse_exact_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(representatives, doc→rep map) — one keeper row per distinct text.

    Web corpora are exact-dup heavy; running MinHash-LSH on the raw
    corpus puts all d copies of a text into the same (seed, minhash)
    bucket and the pair join goes d² per seed. Collapsing first makes
    every downstream near-dup cost a function of UNIQUE texts. The rep
    is the min id of its exact group, so cluster labels computed over
    reps equal the labels the uncollapsed run would produce (component
    = min id; each group's min id IS its rep).

    Both outputs are projections of ``with_exact_rep`` — callers that
    need both (the dedup pipeline) should checkpoint that shared frame
    once instead of materializing each output separately."""
    with_rep = with_exact_rep(df, text_col=text_col, id_col=id_col)
    reps = with_rep.filter(F.col(id_col) == F.col("__rep")).drop("__rep")
    doc_to_rep = with_rep.select(id_col, "__rep")
    return reps, doc_to_rep


def shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) pairs: DISTINCT k-token shingles per document.

    Distinctness is enforced per-row with ``array_distinct`` BEFORE the
    explode — no dedup shuffle; the only shuffle any consumer pays is
    its own aggregation."""
    from .mining import ensure_parallelism

    toks = tokens_col(F.col(text_col))
    return (
        ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), toks.alias("toks"))
        .select(
            id_col,
            F.explode_outer(F.array_distinct(F.expr(ngrams_expr("toks", k)))).alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, seed, minhash) — per-seed min of the universal-hash family
    h_i = (a1_i·hi16 + a2_i·lo16 + b_i) mod P over ONE base digest per
    shingle (``MINHASH_ABC``/``MINHASH_P``; Carter-Wegman — one md5 +
    k codegen mult-add-mods instead of k md5s).

    Plan shape: one explode of per-doc distinct shingles, then ONE
    groupBy(id) computing all ``num_hashes`` mins as parallel aggregate
    columns (map-side combined), then a zero-shuffle ``stack`` unpivot.
    Shuffle volume is n_docs rows — independent of both document length
    and the number of hash functions (the naive seeds-explode shape
    shuffles num_hashes× more).
    """
    if num_hashes > len(MINHASH_ABC):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_ABC)}-entry "
            "universal-hash constant table (extend MINHASH_ABC)"
        )
    sh = shingles(df, text_col, id_col, k=shingle_k).select(
        id_col, _minhash_base(F.col("shingle"), hash_fn).alias("__base")
    )
    hi = F.shiftright(F.col("__base"), 16)
    lo = F.col("__base").bitwiseAND(F.lit(65535))
    mins = [
        F.min(
            (F.lit(a1) * hi + F.lit(a2) * lo + F.lit(b)) % F.lit(MINHASH_P)
        ).alias(f"h{seed}")
        for seed, (a1, a2, b) in enumerate(MINHASH_ABC[:num_hashes])
    ]
    wide = sh.groupBy(id_col).agg(*mins)
    stack_args = ", ".join(f"{s}, h{s}" for s in range(num_hashes))
    return wide.select(
        id_col,
        F.expr(f"stack({num_hashes}, {stack_args}) AS (seed, minhash)"),
    ).select(id_col, "seed", "minhash")


#: default LSH skew cap: buckets larger than this are dropped from
#: candidate generation. Part of the operator's SEMANTICS — the DuckDB
#: oracle SQL for the declared queries is generated from this value.
LSH_MAX_BUCKET = 1000


def minhash_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    min_matches: int = 2,
    max_bucket_size: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """LSH candidate pairs (r=1 bands): docs sharing ≥ ``min_matches``
    per-seed min-hashes. Self-join on (seed, minhash) — i.e. a bucket
    join on the LSH key, never an all-pairs product — then a count
    filter. Output: (id_a < id_b, n_match).

    ``max_bucket_size`` is the skew guard: a (seed, minhash) bucket of
    size d emits d² join rows, so one hot bucket (boilerplate shingle,
    residual exact-dup mass) can dominate the whole job at web scale.
    Buckets above the cap are dropped from candidate generation — ON BY
    DEFAULT (``LSH_MAX_BUCKET``): a direct caller on a duplicate-heavy
    corpus should get the scale-safe behavior without opting in, and a
    pair lost to a >1000-doc bucket still has ``num_hashes - 1`` other
    seeds to surface through. Pass ``None`` to opt out explicitly (e.g.
    to prove collapse-neutrality against an uncapped oracle); run
    exact-dup collapse first (``collapse_exact_dups``) so identical
    texts never form hot buckets in the first place.

    Plan shape: with the cap active, ``sig`` is consumed EXACTLY ONCE —
    one groupBy(seed, minhash) collects each bucket's sorted id list
    (cap enforcement is a free ``size()`` filter on it), and the d·(d−1)/2
    pairs per bucket come from an array expression, so the signature
    pipeline upstream (shingle explode + min-agg) is never recomputed
    and per-task memory is bounded by cap² pair structs. The uncapped
    opt-out keeps the self-join shape instead — materializing an
    unbounded bucket's id list in one row would be the OOM the cap
    exists to prevent."""
    if max_bucket_size is not None:
        buckets = (
            sig.groupBy("seed", "minhash")
            .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("__ids"))
            .filter((F.size("__ids") >= 2) & (F.size("__ids") <= max_bucket_size))
        )
        pair = F.explode(
            F.expr(
                "flatten(transform(__ids, (x, i) -> "
                "transform(slice(__ids, i + 2, size(__ids)), "
                "y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("__p")
        return (
            buckets.select(pair)
            .select(F.col("__p.id_a").alias("id_a"), F.col("__p.id_b").alias("id_b"))
            # ids are sorted, so id_a <= id_b always; the strict filter
            # only drops self-pairs if a caller feeds duplicate
            # (id, seed) rows, matching the self-join shape's behavior.
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_match"))
            .filter(F.col("n_match") >= min_matches)
        )
    a = sig.select(F.col(id_col).alias("id_a"), "seed", "minhash")
    b = sig.select(F.col(id_col).alias("id_b"), "seed", "minhash")
    return (
        a.join(b, on=["seed", "minhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_match"))
        .filter(F.col("n_match") >= min_matches)
    )


def incremental_minhash_pairs(
    sig_new: DataFrame,
    sig_base: DataFrame,
    id_col: str = "doc_id",
    min_matches: int = 2,
    max_bucket_size: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """LSH candidate pairs for an INCREMENT against an already-indexed
    corpus: every pair touching at least one new document (new-new and
    new-base), with base-base pairs — already found when the base was
    deduped — never generated or counted.

    This is the daily-ingest shape at 100 TB: the base corpus keeps its
    signature table on disk (n_docs × num_hashes rows, tiny next to the
    text); each increment computes signatures for NEW docs only, and
    this join prices by bucket co-occupancy, not base size — the base
    text is never re-read, never re-shingled.

    Same single-pass grouped-bucket plan as the capped
    :func:`minhash_candidate_pairs` (ids carry a new/base tag through
    ``collect_list``; base-base pairs are filtered inside the pair-
    generation expression before the explode, so they never exist as
    rows). Output adds ``n_new_sides`` (2 = new-new, 1 = new-base).
    ``max_bucket_size`` caps the UNION bucket — a bucket hot in the
    base must be skipped even if only one new doc lands in it.
    """
    if max_bucket_size is None:
        raise ValueError(
            "incremental_minhash_pairs requires a finite max_bucket_size: "
            "the grouped-bucket plan materializes each bucket's id list"
        )
    # Prune the base index to the buckets the batch actually touches:
    # a bucket with no new doc cannot produce a new-involved pair, and
    # matching buckets keep ALL their base rows, so the union-bucket
    # cap is unchanged. The batch's distinct keys are batch-sized —
    # broadcastable — so base-side work prices by bucket co-occupancy,
    # not base size (measured: 10x dup-heavy base, where matching
    # buckets genuinely hold 10x occupants, costs 1.6x wall;
    # ARCHITECTURE.md. A non-matching base row costs only its scan,
    # and a bucketed stored index prunes even that).
    batch_keys = sig_new.select("seed", "minhash").distinct()
    base_pruned = sig_base.join(
        F.broadcast(batch_keys), ["seed", "minhash"], "left_semi"
    )
    tagged = sig_new.select(
        F.col(id_col).alias("id"), "seed", "minhash", F.lit(1).alias("nw")
    ).unionAll(
        base_pruned.select(
            F.col(id_col).alias("id"), "seed", "minhash", F.lit(0).alias("nw")
        )
    )
    buckets = (
        tagged.groupBy("seed", "minhash")
        .agg(F.array_sort(F.collect_list(F.struct("id", "nw"))).alias("__items"))
        .filter((F.size("__items") >= 2) & (F.size("__items") <= max_bucket_size))
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(__items, (a, i) -> "
            "filter(transform(slice(__items, i + 2, size(__items)), "
            "b -> struct(a.id AS id_a, b.id AS id_b, a.nw + b.nw AS nnew)), "
            "p -> p.nnew > 0)))"
        )
    ).alias("__p")
    return (
        buckets.select(pair)
        .select(
            F.col("__p.id_a").alias("id_a"),
            F.col("__p.id_b").alias("id_b"),
            F.col("__p.nnew").alias("nnew"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_match"), F.max("nnew").alias("n_new_sides"))
        .filter(F.col("n_match") >= min_matches)
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact token-set Jaccard over blocked pairs.

    ``block_col`` restricts comparisons to equal-block pairs (e.g. lang,
    length bucket, or an LSH band) — the standard way to keep the join
    from being O(n²) at scale. Output: (id_a, id_b, jaccard)."""
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    base = df.select(F.col(id_col), toks.alias("tok_set"), *( [F.col(block_col)] if block_col else []))
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("tok_set").alias("set_a"),
        *([F.col(block_col)] if block_col else []),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("tok_set").alias("set_b"),
        *([F.col(block_col)] if block_col else []),
    )
    on = [block_col] if block_col else None
    joined = a.join(b, on=on) if on else a.crossJoin(b)
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size(F.array_union("set_a", "set_b"))
    jac = F.round(inter.cast("double") / union, 4)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _containment_bp(joined: DataFrame) -> DataFrame:
    """Shared projection for the containment operators: exact
    intersection + integer-basis-point ratios over (id_a, id_b,
    set_a, set_b). ONE definition so the blocked demo path and the
    LSH-verified production path can never desynchronize."""
    return (
        joined.select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("set_a", "set_b")).cast("long").alias("inter"),
            F.expr("size(set_a)").cast("long").alias("_na"),
            F.expr("size(set_b)").cast("long").alias("_nb"),
        )
        .select(
            "id_a",
            "id_b",
            "inter",
            # Guard the zero divisor explicitly: a token-free document
            # must yield NULL under BOTH ANSI and non-ANSI sessions
            # (relying on div-by-zero→NULL only holds in non-ANSI Spark).
            F.when(F.col("_na") > 0, F.expr("inter * 10000 div _na")).alias(
                "containment_a_bp"
            ),
            F.when(F.col("_nb") > 0, F.expr("inter * 10000 div _nb")).alias(
                "containment_b_bp"
            ),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric containment over blocked pairs: |A∩B| / |A| (and
    /|B|) in integer basis points — the near-dup signal Jaccard
    misses when one document quotes another WHOLESALE (a 100-token doc
    fully embedded in a 10k-token page has Jaccard ≈ 0.01 but
    containment_a = 1.0). Standard companion to Jaccard verification
    in dedup pipelines; keep the pair if EITHER direction clears the
    threshold.

    Same blocking contract as :func:`jaccard_pairs` (equal-block pairs
    only; at scale the block key is an LSH band). Ratios are integer
    basis points (``inter · 10⁴ div |set|``), so the oracle compare
    has no float ties. Output: (id_a, id_b, inter, containment_a_bp,
    containment_b_bp) with id_a < id_b.
    """
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    base = df.select(
        F.col(id_col), toks.alias("tok_set"),
        *([F.col(block_col)] if block_col else []),
    )
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("tok_set").alias("set_a"),
        *([F.col(block_col)] if block_col else []),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("tok_set").alias("set_b"),
        *([F.col(block_col)] if block_col else []),
    )
    joined = a.join(b, on=[block_col]) if block_col else a.crossJoin(b)
    thr_bp = int(round(threshold * 10000))
    out = _containment_bp(joined.filter(F.col("id_a") < F.col("id_b")))
    return out.filter(
        (F.col("containment_a_bp") >= thr_bp)
        | (F.col("containment_b_bp") >= thr_bp)
    )


def verify_containment(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact containment verification over CANDIDATE pairs — the scale
    path for :func:`containment_pairs`: candidates come from LSH
    (``minhash_candidate_pairs``), never an all-pairs block, and only
    those pairs pay the exact set intersection. Two joins back to the
    token sets (each a doc-keyed shuffle), integer-basis-point output.
    """
    sets = df.select(
        F.col(id_col),
        F.array_distinct(tokens_col(F.col(text_col))).alias("tok_set"),
    )
    return _containment_bp(
        pairs.select("id_a", "id_b")
        .join(
            sets.select(F.col(id_col).alias("id_a"), F.col("tok_set").alias("set_a")),
            "id_a",
        )
        .join(
            sets.select(F.col(id_col).alias("id_b"), F.col("tok_set").alias("set_b")),
            "id_b",
        )
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document SimHash fingerprint (default 32-bit).

    Token hash = first 8 md5 hex chars parsed as an int (engine-
    portable; ``hash_fn="xxhash64"`` swaps in the JVM-native hash for
    deployment); bit b of the fingerprint is 1 iff the majority of
    tokens have bit b set. Pure expressions: explode → per-bit signed
    sum → reassemble.
    """
    from .mining import ensure_parallelism

    toks = tokens_col(F.col(text_col))
    # explode_OUTER + null filter: plain explode infers a guard on the
    # token array and pushes it below the repartition exchange,
    # re-tokenizing in the serial scan task (ARCHITECTURE.md,
    # "Generate-filter pushdown vs ensure_parallelism").
    t = (
        ensure_parallelism(df.select(id_col, text_col))
        .select(F.col(id_col), F.explode_outer(toks).alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    if hash_fn == "md5":
        th = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    elif hash_fn == "xxhash64":
        th = F.xxhash64("tok").bitwiseAND(F.lit((1 << bits) - 1))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")
    t = t.select(id_col, th.alias("th"))
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = t.groupBy(id_col).agg(*bit_cols)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return agg.select(id_col, fp.alias("simhash"))


def simhash_near_pairs(fp: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, bits: int = 32) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, bucketed by the high
    half of the fingerprint so candidate generation is a bucket join
    (docs differing only in low bits still collide)."""
    bucket = F.shiftright(F.col("simhash"), bits // 2)
    a = fp.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), bucket.alias("bkt"))
    b = fp.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), bucket.alias("bkt"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, "bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Exact similarity join via prefix filtering (AllPairs / PPJoin family)
# ---------------------------------------------------------------------------

def prefix_filter_jaccard_join(
    df: DataFrame,
    threshold_bp: int = 6000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT token-set Jaccard join: every pair with Jaccard >=
    ``threshold_bp``/10000, no misses — the deterministic counterpart
    to the MinHash/LSH path (which trades recall for cheaper candidate
    generation).

    Prefix filtering (Chaudhuri et al. ICDE'06 "A Primitive Operator
    for Similarity Joins"; Bayardo et al. WWW'07 "Scaling Up All
    Pairs"): order every doc's tokens by ascending global frequency
    and keep only the first ``n - ceil(t*n) + 1`` as its PREFIX. Two
    sets with Jaccard >= t MUST share a prefix token, so the candidate
    join runs on prefix tokens only — and because prefixes hold each
    doc's RAREST tokens, candidate buckets are the small tail of the
    token-frequency distribution, not the stopword head. A length
    filter (min size >= t * max size) prunes candidates before the
    verify join.

    Shuffle shape: one token-frequency agg, one per-doc window (doc-
    partitioned, never global), the prefix-token candidate join, and
    one verify join per candidate pair. All arithmetic is integer
    basis points — ``ceil`` via ``(bp*n + 9999) div 10000``, the
    threshold test ``10000*inter >= bp*union`` — so the result is
    bit-identical cross-engine and takes the full value-hash gate
    (a brute-force all-pairs oracle proves the filter drops nothing).

    Scale note: an EXACT join's output is every qualifying pair, and
    on a duplicate-heavy corpus that set is quadratic in duplicate
    multiplicity no matter the algorithm (the sf0.1 fixture yields
    7M pairs at t=0.6 from 5k docs). Run it after
    ``collapse_exact_dups`` — the q_dedup_corpus pattern — so the
    join works the unique-text set and duplicates fan back out as
    cluster members, not pairs.

    Returns (id_a, id_b, inter, un, jaccard_bp), id_a < id_b.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("tok_freq"))
    sized = toks.join(freq, "tok").withColumn(
        "n", F.count("*").over(Window.partitionBy("id"))
    )
    # prefix length p = n - ceil(t*n) + 1, integer ceil in basis points
    p = F.col("n") - F.expr(f"({threshold_bp} * n + 9999) div 10000") + 1
    prefix = (
        sized.withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("id").orderBy("tok_freq", "tok")
            ),
        )
        .filter(F.col("pos") <= p)
        .select("id", "tok", "n")
    )
    right = prefix.select(
        F.col("id").alias("id_b"), "tok", F.col("n").alias("n_b")
    )
    cand = (
        prefix.select(F.col("id").alias("id_a"), "tok", F.col("n").alias("n_a"))
        .join(right, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: Jaccard >= t forces min(n) >= t * max(n)
        .filter(
            F.least("n_a", "n_b") * 10000
            >= threshold_bp * F.greatest("n_a", "n_b")
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .distinct()
    )
    # verify: exact intersection via the full token sets of both sides
    ta = toks.select(F.col("id").alias("id_a"), "tok")
    tb = toks.select(F.col("id").alias("_vb"), F.col("tok").alias("tok_b"))
    inter = (
        cand.join(ta, "id_a")
        .join(
            tb,
            (F.col("id_b") == F.col("_vb")) & (F.col("tok") == F.col("tok_b")),
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("inter"))
    )
    un = F.col("n_a") + F.col("n_b") - F.col("inter")
    return (
        inter.filter(F.col("inter") * 10000 >= threshold_bp * un)
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            un.cast("long").alias("un"),
            F.expr("10000 * inter div (n_a + n_b - inter)").alias("jaccard_bp"),
        )
    )


def prefix_filter_jaccard_join_collapsed(
    df: DataFrame,
    threshold_bp: int = 6000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse-first scale path for the exact similarity join: run
    ``prefix_filter_jaccard_join`` on one representative per DISTINCT
    text, then fan duplicate-group members back out — within-group
    member pairs are exact duplicates (Jaccard 10000 bp by
    construction) and cross-group pairs inherit their representatives'
    (inter, union) verbatim, since members share their rep's token set
    identically.

    Result is the SAME pair set as the direct join on the full corpus
    (the declared query hash-proves it against the same brute-force
    oracle). The difference is cost shape: the quadratic prefix-join
    work runs on unique texts only, and duplicate multiplicity is paid
    purely in output fan-out — the q_dedup_corpus argument applied to
    the exact join. Measured: on a 10×-replicated sf0.01 corpus (90%
    exact dups) collapsed runs 6.1 s vs 111.6 s direct (18×); on the
    unique-text sf0.1 fixture the two are within noise (110 vs 108 s)
    — the collapse costs one window when there is nothing to collapse.
    Empty-token docs are excluded on both paths (Jaccard is undefined
    without tokens; the brute force emits no rows for them).
    """
    reps, doc_to_rep = collapse_exact_dups(df, text_col=text_col, id_col=id_col)
    rep_pairs = prefix_filter_jaccard_join(
        reps, threshold_bp=threshold_bp, text_col=text_col, id_col=id_col
    )
    # cross-group: every member pair inherits its rep pair's overlap
    ma = doc_to_rep.select(F.col("__rep").alias("ra"), F.col(id_col).alias("ia"))
    mb = doc_to_rep.select(F.col("__rep").alias("rb"), F.col(id_col).alias("ib"))
    cross = (
        rep_pairs.join(ma, rep_pairs.id_a == ma.ra)
        .join(mb, rep_pairs.id_b == mb.rb)
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "inter",
            "un",
            "jaccard_bp",
        )
    )
    # within-group: exact-duplicate pairs at Jaccard 1 (skip token-free
    # groups — the brute force has no rows for docs with no tokens)
    sizes = reps.select(
        F.col(id_col).alias("__rep"),
        F.size(F.array_distinct(tokens_col(F.col(text_col))))
        .cast("long")
        .alias("n"),
    )
    w2 = doc_to_rep.select(F.col("__rep").alias("r2"), F.col(id_col).alias("ib"))
    within = (
        doc_to_rep.select("__rep", F.col(id_col).alias("ia"))
        .join(w2, (F.col("__rep") == F.col("r2")) & (F.col("ia") < F.col("ib")))
        .join(sizes, "__rep")
        .filter(F.col("n") > 0)
        .select(
            F.col("ia").alias("id_a"),
            F.col("ib").alias("id_b"),
            F.col("n").alias("inter"),
            F.col("n").alias("un"),
            F.lit(10000).cast("long").alias("jaccard_bp"),
        )
    )
    return cross.unionAll(within)


def minhash_signatures_stateless(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Row-local twin of :func:`minhash_signatures`: identical
    ``(id, seed, minhash)`` output computed WITHOUT any aggregation —
    per-seed mins fold over the in-row shingle array with
    ``array_min(transform(...))`` instead of explode + groupBy-min.

    Why it exists: Structured Streaming allows only ONE stateful
    operator per query, so a stream that feeds signatures into a
    stateful index (``streaming.stateful.minhash_bucket_index``) cannot
    spend its stateful slot on the signature groupBy. This variant is
    a pure projection + explode (stateless), at the cost of giving up
    the map-side combine — the right trade exactly when each row's
    shingle set is already in hand. Equivalence with the batch shape
    is pinned in tests (same universal-hash constants, same distinct
    shingles, docs with no shingles emit no rows in both).
    """
    if num_hashes > len(MINHASH_ABC):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_ABC)}-entry "
            "universal-hash constant table (extend MINHASH_ABC)"
        )
    toks = tokens_col(F.col(text_col))
    sh_arr = F.array_distinct(
        F.expr(ngrams_expr("__toks", shingle_k))
    )
    bases = F.transform(sh_arr, lambda s: _minhash_base(s, hash_fn))

    def _seed_min(a1: int, a2: int, b: int) -> Column:
        return F.array_min(
            F.transform(
                F.col("__bases"),
                lambda base: (
                    F.lit(a1) * F.shiftright(base, 16)
                    + F.lit(a2) * base.bitwiseAND(F.lit(65535))
                    + F.lit(b)
                )
                % F.lit(MINHASH_P),
            )
        )

    mins = F.array(
        *[
            _seed_min(a1, a2, b)
            for (a1, a2, b) in MINHASH_ABC[:num_hashes]
        ]
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(F.col(id_col), bases.alias("__bases"))
        .filter(F.size("__bases") > 0)
        .select(
            id_col,
            F.posexplode(mins).alias("seed", "minhash"),
        )
        .select(id_col, F.col("seed").cast("int").alias("seed"), "minhash")
    )


def minhash_bucket_hits(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Batch twin of the streaming MinHash bucket index
    (``streaming.stateful.minhash_bucket_index``): for every signature
    row, whether its LSH bucket ``(seed, minhash)`` already held an
    earlier document and which one arrived first.

    Arrival order is ``id_col`` ascending (the streaming twin's
    contract: batches arrive in id order, rows within a batch are
    processed in id order). Output per signature row:

    - ``first_doc_id``  earliest id previously in this bucket, NULL
                        for the bucket's first occupant
    - ``n_prior``       occupants before this row

    A doc is a near-dup CANDIDATE when ≥ ``min_matches`` of its
    signature rows carry a non-NULL ``first_doc_id`` — the same
    bucket-co-occupancy rule as ``minhash_candidate_pairs``, evaluated
    incrementally. One window over the signature table; shuffle keys
    are the buckets themselves.
    """
    sig = minhash_signatures(
        docs,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_k=shingle_k,
    )
    w = (
        Window.partitionBy("seed", "minhash")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rn = F.row_number().over(
        Window.partitionBy("seed", "minhash").orderBy(id_col)
    )
    return sig.select(
        id_col,
        F.col("seed").cast("long").alias("seed"),
        "minhash",
        F.min(id_col).over(w).alias("first_doc_id"),
        (rn - 1).cast("long").alias("n_prior"),
    )
