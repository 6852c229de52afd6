"""Distributed Bloom filter: build a bit bank with partial-aggregate
``bit_or``, probe it with a broadcast join — approximate set membership
at corpus scale without ever shuffling the corpus on the key.

Why this exists at 100 TB: decontamination and blocklist checks are
"is this key in a set of ~10⁶-10⁹ keys" questions. An exact semi-join
shuffles both sides on the key; a Bloom filter reduces the set to a
fixed ``m``-bit bank (a DataFrame of ≤ m/32 words, kilobytes to a few
hundred MB) that broadcasts to every executor, so the probe is a
scan-side map with NO shuffle of the corpus. False positives are
bounded (≈ (1 − e^{−kn/m})^k); false negatives are impossible, which is
the safe direction for decontamination (over-flagging, never leaking).

Everything is md5-based integer arithmetic, so an external SQL engine
reproduces the filter bit-for-bit (the declared-query oracle does).

Build shape:   explode k positions per key → (pos >> 5) word index,
               ``bit_or(1 << (pos & 31))`` partial-agg — mergeable,
               map-side combined, output ≤ m/32 rows.
Probe shape:   explode k positions per distinct key → broadcast left
               join on word index → ``min(bit set?)`` per key. The
               bank never exceeds m/32 rows by construction, so the
               broadcast is always safe.

Words are 32-bit (stored in BIGINT): ``1 << bit`` stays far from the
sign bit on every engine, so no two's-complement edge cases.

Reference parity: the reference (scrappy.py) has no membership
structure at all — its dedup is an exact pandas ``isin`` on titles
(scrappy.py:214-218, the `existing_titles` check), which is the
driver-memory version of exactly this operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: default filter geometry: 2^18 bits = 8192 words; with k=4 hashes the
#: ~1% FPR point sits around n ≈ m/10 ≈ 26k keys.
BLOOM_M_BITS = 1 << 18
BLOOM_K = 4


def bloom_positions(key: Column, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> Column:
    """``array<long>`` of the ``k`` bit positions for ``key``.

    Double hashing (Kirsch–Mitzenmacher): pos_i = (h1 + i·h2) mod m
    with h1/h2 the two 32-bit halves of one md5 — one digest per key,
    k positions, provably preserves the FPR of k independent hashes.
    h2 is forced odd so it is coprime with the power-of-two ``m`` and
    the probe sequence never collapses onto a short cycle.
    """
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    digest = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").bitwiseOR(F.lit(1))
    # h1 + (k-1)·h2 < 2^32·k — far inside long range, so no overflow
    # before the mod.
    return F.array(*[((h1 + F.lit(i) * h2) % F.lit(m_bits)) for i in range(k)])


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Aggregate the keys of ``df`` into a Bloom bit bank.

    Returns ``(word_idx: long, word: long)`` with only the non-zero
    words present (≤ m/32 rows). The aggregate is a plain ``bit_or``
    groupBy — partial-aggregated map-side, mergeable across any number
    of input splits, and incrementally unionable: ``bit_or`` over the
    union of two banks is the bank of the union of the key sets.
    """
    pos = df.select(
        F.explode(bloom_positions(F.col(key_col), m_bits, k)).alias("pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 5).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(
    keys: DataFrame,
    bank: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership-test every row of ``keys`` against ``bank``.

    Returns ``keys``'s ``key_col`` (distinct) plus ``out_col`` ∈ {0,1}.
    The bank is broadcast (≤ m/32 rows by construction), so the only
    wide operation is the groupBy back to one row per key — and that
    aggregation carries k rows per key, independent of corpus size per
    key. A key is a hit iff ALL k probed bits are set; a missing word
    row means those 32 bits are zero (left join, null ⇒ miss).
    """
    pos = keys.select(F.col(key_col)).distinct().select(
        key_col,
        F.posexplode(bloom_positions(F.col(key_col), m_bits, k)).alias("i", "pos"),
    )
    probed = (
        pos.select(
            key_col,
            F.shiftright(F.col("pos"), 5).alias("word_idx"),
            F.col("pos").bitwiseAND(F.lit(31)).alias("bit"),
        )
        .join(F.broadcast(bank), "word_idx", "left")
        .select(
            key_col,
            F.when(
                F.expr("word IS NOT NULL AND (word & shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))) != 0"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("bit_set"),
        )
    )
    return probed.groupBy(key_col).agg(F.min("bit_set").alias(out_col))


def bank_to_dense(bank: DataFrame, m_bits: int = BLOOM_M_BITS) -> list[int]:
    """Collapse a bank DataFrame to the dense word list (length m/32,
    zeros for absent words) — a bounded driver-side collect (≤ m/32
    rows by construction, ~64 KB at the default geometry) that turns
    the filter into a broadcastable literal."""
    words = [0] * (m_bits // 32)
    for r in bank.collect():
        words[r["word_idx"]] = r["word"]
    return words


def bloom_contains(
    key: Column,
    dense_words: list[int],
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> Column:
    """Pure column-expression membership test against a dense bank.

    No join, no aggregation — the bank rides along as an array literal
    in the plan (Catalyst broadcasts it inside the serialized
    expression), so this form works ANYWHERE a column does: streaming
    filters (where ``bloom_probe``'s groupBy would force a stateful
    agg), join pruning, generated columns. This is the right shape for
    stream-side decontamination: the stream is filtered scan-side,
    row by row, with zero state.
    """
    arr = F.lit(dense_words)
    pos = bloom_positions(key, m_bits, k)
    checks = []
    for i in range(k):
        p = pos.getItem(i)
        word = F.element_at(arr, (F.shiftright(p, 5) + 1).cast("int"))
        # pyspark's shiftleft wants a literal shift amount; 2^(p&31)
        # is exact in double up to 2^31, so pow+cast gives the mask.
        mask = F.pow(F.lit(2.0), p.bitwiseAND(F.lit(31))).cast("long")
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
