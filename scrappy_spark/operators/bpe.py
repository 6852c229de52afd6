"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

The scale insight that makes BPE trainable on a 100 TB corpus: merges
never cross word boundaries, so training only ever needs the WORD
FREQUENCY TABLE — one corpus-wide groupBy(word) whose output follows
Heaps' law (vocab-sized, millions of rows, kilobyte-scale per
partition), after which the corpus text is never touched again. Every
merge round is then one aggregate over that small table: explode
adjacent symbol pairs weighted by word count, partial-agg sum, take
the top-``batch`` pairs (count desc, pair asc — fully deterministic),
and rewrite the symbol arrays with ONE codegen fold per round.

Batched rounds (``batch`` merges per round) are the standard
industrial relaxation of the strictly-sequential textbook loop — with
``batch=1`` this implementation IS textbook BPE (the equivalence is
pinned against a pure-Python reference in tests). Within a round the
fold applies the round's merge set greedily left-to-right in one pass,
preferring the higher-priority pair when two selected pairs overlap.

Encoding reuses training's by-product: the final per-word
segmentation table broadcasts (Heaps' law again), so tokenizing a
corpus is a scan + broadcast join; only words never seen in training
fall back to a character split plus the greedy merge fold.

Reference parity: the reference has no tokenizer at all (its term
mining splits on whitespace, scrappy.py:300-318); this extends the
token-counting surface (``textstats.token_count``) to a real learned
vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .mining import tokens_col


def _chars(col: Column) -> Column:
    """Split a word into its character symbols."""
    return F.filter(F.split(col, ""), lambda c: c != F.lit(""))


def _merge_pass(symbols: Column, pairs: list[tuple[str, str]]) -> Column:
    """One greedy left-to-right merge pass over a symbol array.

    ``pairs`` is the round's merge set in priority order. The fold
    walks the array once, merging the tail symbol with the incoming
    one whenever the two form a selected pair — the leftmost-first,
    non-overlapping application classic BPE uses. When two selected
    pairs overlap in the text, the leftmost wins (its merge consumes
    the shared symbol before the second pair can form) — deterministic
    by construction.
    """
    merged = {f"{a} {b}": a + b for a, b in pairs}
    lookup = F.create_map(
        *[F.lit(x) for kv in merged.items() for x in kv]
    )
    empty = F.array().cast("array<string>")
    return F.aggregate(
        symbols,
        empty,
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & lookup.getItem(
                F.concat_ws(" ", F.element_at(acc, -1), s)
            ).isNotNull(),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    lookup.getItem(F.concat_ws(" ", F.element_at(acc, -1), s))
                ),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_frequency_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) — the only corpus-wide pass BPE training makes."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 40,
    batch: int = 4,
) -> tuple[list[dict], DataFrame]:
    """Train a BPE vocabulary on the corpus.

    Returns ``(merges, word_pieces)``: the learned merge list (dicts
    with merge_idx/left/right/merged/pair_count, in application order)
    and the final per-word segmentation table ``(word, wc, pieces)``
    that :func:`encode_bpe` broadcasts.

    Per round: ONE Spark job (pair-count agg + top-``batch`` collect —
    the only driver-side data is ≤ ``batch`` rows/round, never the
    table) and one narrow rewrite of the word table. The word table is
    localCheckpointed every few rounds so lineage doesn't stack
    ``n_merges`` folds deep.
    """
    if n_merges < 1 or batch < 1:
        raise ValueError(f"n_merges and batch must be >= 1, got {n_merges}, {batch}")
    words = word_frequency_table(df, text_col).withColumn(
        "pieces", _chars(F.col("word"))
    )
    merges: list[dict] = []
    rounds = (n_merges + batch - 1) // batch
    for rnd in range(rounds):
        want = min(batch, n_merges - len(merges))
        pair_counts = (
            words.select(
                "wc",
                F.explode(
                    F.expr(
                        "transform(slice(pieces, 1, size(pieces) - 1), "
                        "(p, i) -> struct(p AS left, pieces[i + 1] AS right))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair.left", "pair.right")
            .agg(F.sum("wc").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(want)
            .collect()
        )
        if not pair_counts:
            break  # every word is a single symbol — nothing left to merge
        round_pairs = [(r["left"], r["right"]) for r in pair_counts]
        merges.extend(
            {
                "merge_idx": len(merges) + i,
                "left": r["left"],
                "right": r["right"],
                "merged": r["left"] + r["right"],
                "pair_count": r["pair_count"],
            }
            for i, r in enumerate(pair_counts)
        )
        words = words.withColumn("pieces", _merge_pass(F.col("pieces"), round_pairs))
        if (rnd + 1) % 4 == 0:
            words = words.localCheckpoint(eager=False)
    return merges, words


def encode_bpe(
    df: DataFrame,
    merges: list[dict],
    word_pieces: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize ``df`` with a trained vocabulary: scan + broadcast join
    of the word-segmentation table (Heaps-law-bounded); words unseen
    in training fall back to a character split run through the full
    merge list (rare path, still pure column expressions — one fold
    per training round, built once into the plan).

    Output: (id, word_pos, word, pieces_str, n_pieces) — ``pieces_str``
    joins pieces with U+2581 so the result is atomic-typed.
    """
    out = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("word_pos", "word"),
    ).join(F.broadcast(word_pieces.select("word", "pieces")), "word", "left")
    fallback = _chars(F.col("word"))
    if merges:
        batched: list[list[tuple[str, str]]] = []
        for m in merges:
            if batched and len(batched[-1]) < 4:
                batched[-1].append((m["left"], m["right"]))
            else:
                batched.append([(m["left"], m["right"])])
        for round_pairs in batched:
            fallback = _merge_pass(fallback, round_pairs)
    pieces = F.coalesce(F.col("pieces"), fallback)
    return out.select(
        id_col,
        "word_pos",
        "word",
        F.array_join(pieces, "▁").alias("pieces_str"),
        F.size(pieces).alias("n_pieces"),
    )
