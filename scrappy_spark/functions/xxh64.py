"""Pure-Python XXH64 matching Spark's ``xxhash64`` for the types
bucket partitioning uses.

Why it exists: bucket-partition PROBES must hash a literal exactly the
way the WRITE hashed the column (``pmod(xxhash64(col), n)``), or point
lookups prune to phantom buckets. Rounds 12-13 probed through a
one-row Spark job to borrow the JVM's own hash; that works on the
driver but (a) costs a job per distinct literal and (b) is impossible
where no SparkSession exists — the Python DataSource worker that plans
``scrappy_snapshot`` scans. xxHash64 is a published public algorithm
(Yann Collet's xxHash, BSD; Spark implements it in
``sql/catalyst/expressions/XxHash64Function`` with seed 42), and
Spark's type mapping is fixed: integral values hash as their 8-byte
little-endian long, doubles/floats as ``doubleToLongBits`` (with -0.0
normalized to 0.0), strings as their UTF-8 bytes. This module
implements exactly that, and ``tests/test_snapshots.py`` +
``tests/test_filters.py`` property-compare it against the JVM's
``F.xxhash64`` across types and edge values — drift fails loudly.

Scope: long-family / double-family / string — the types
``commit_partitioned`` buckets in practice. Anything else returns
None and the caller falls back to the JVM probe (or no pruning)."""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, x: int) -> int:
    acc = (acc + x * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _fmix(acc: int) -> int:
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 64-bit value — Spark's ``hashLong`` (the LongType
    and DoubleType-bits path). Returns the SIGNED 64-bit result, like
    the SQL function."""
    hash_ = (seed + _P5 + 8) & _M
    hash_ ^= _round(0, value & _M)
    hash_ = (_rotl(hash_, 27) * _P1 + _P4) & _M
    out = _fmix(hash_)
    return out - (1 << 64) if out >= (1 << 63) else out


def xxh64_int(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 32-bit value — Spark's ``hashInt`` (the
    byte/short/int path: a 4-byte block, NOT widened to long)."""
    hash_ = (seed + _P5 + 4) & _M
    hash_ ^= ((value & 0xFFFFFFFF) * _P1) & _M
    hash_ = (_rotl(hash_, 23) * _P2 + _P3) & _M
    out = _fmix(hash_)
    return out - (1 << 64) if out >= (1 << 63) else out


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string — Spark's ``hashUnsafeBytes`` (the
    StringType path: UTF-8 bytes). Signed 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, struct.unpack_from("<Q", data, i)[0])
            v2 = _round(v2, struct.unpack_from("<Q", data, i + 8)[0])
            v3 = _round(v3, struct.unpack_from("<Q", data, i + 16)[0])
            v4 = _round(v4, struct.unpack_from("<Q", data, i + 24)[0])
            i += 32
        acc = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            acc = ((acc ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while i <= n - 8:
        acc ^= _round(0, struct.unpack_from("<Q", data, i)[0])
        acc = (_rotl(acc, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        acc ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _M
        acc = (_rotl(acc, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        acc ^= (data[i] * _P5) & _M
        acc = (_rotl(acc, 11) * _P1) & _M
        i += 1
    out = _fmix(acc)
    return out - (1 << 64) if out >= (1 << 63) else out


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")
_FLOATING = ("float", "double")


def spark_xxhash64(value, source_type: str) -> int | None:
    """``xxhash64(cast(value AS source_type))`` as Spark computes it,
    or None when the type/value is outside this module's verified
    scope (caller falls back to a JVM probe, or prunes nothing).
    Mirrors Spark's cast semantics for the supported literals: numeric
    strings cast to integrals (fractions truncate toward zero),
    integral/float literals widen to double, -0.0 normalizes."""
    t = source_type.lower()
    try:
        if t in _INTEGRAL:
            if isinstance(value, bool) or value is None:
                return None
            if isinstance(value, str):
                value = int(value.strip())  # uncastable -> ValueError
            elif isinstance(value, float):
                value = int(value)  # truncation toward zero, like cast
            elif not isinstance(value, int):
                return None
            bits = {"tinyint": 8, "smallint": 16, "int": 32, "bigint": 64}[t]
            if not -(1 << (bits - 1)) <= value < (1 << (bits - 1)):
                return None  # overflowing cast: leave to the JVM/filter
            # sub-long integrals hash as a 4-byte block (hashInt)
            return xxh64_long(value) if t == "bigint" else xxh64_int(value)
        if t in _FLOATING:
            if isinstance(value, bool) or value is None:
                return None
            if isinstance(value, str):
                value = float(value.strip())
            elif isinstance(value, int):
                value = float(value)
            elif not isinstance(value, float):
                return None
            if t == "float":
                # cast to float32 first, then Spark hashes the FLOAT's
                # own bit pattern widened path — out of verified scope
                return None
            if value == 0.0:
                value = 0.0  # -0.0 -> 0.0 (Spark normalizes)
            if value != value:
                return None  # NaN buckets are not probe material
            bits = struct.unpack("<q", struct.pack("<d", value))[0]
            return xxh64_long(bits & _M)
        if t == "string":
            if not isinstance(value, str):
                return None
            return xxh64_bytes(value.encode("utf-8"))
    except (ValueError, OverflowError):
        return None
    return None
