"""SQL-replicable 64-bit token hash.

``pd.util.hash_array`` (siphash with pandas-internal keys) cannot be
reproduced in SQL, which left the fingerprint/simhash operators without
DuckDB oracles in round 1.  This hash is designed to be computed
identically by vectorized numpy (uint64 wraparound) and by DuckDB
(HUGEINT arithmetic mod 2**64):

1. ``u``  = little-endian uint64 of the token's first 8 UTF-8 bytes
   (zero-padded; tokens longer than 8 bytes are truncated — lossless for
   the fixture vocabulary, a documented weakening elsewhere).
2. ``h1`` = ``u * C1 mod 2**64``           (odd multiplier, spreads low bytes)
3. ``h``  = ``lo32(h1)*C2 + hi32(h1)*C3 mod 2**64``  (cross-mixes halves)

All SQL intermediates stay below 2**127 so HUGEINT arithmetic is exact;
numpy relies on defined uint64 wraparound.  Equality is pinned by
tests/test_texthash.py over the full fixture vocabulary.
"""

from __future__ import annotations

import numpy as np

C1 = 0x2545F4914F6CDD1D  # < 2**62: HUGEINT product of two operands stays < 2**127
C2 = 0x9E3779B9
C3 = 0x85EBCA77
U64 = 1 << 64


def token_hash64(tokens) -> np.ndarray:
    """Vectorized token hash (uint64).  ``tokens``: numpy str/object array
    or pyarrow string array."""
    arr = np.asarray(tokens)
    if arr.dtype.kind == "O" or arr.dtype.kind == "U":
        b = np.char.encode(arr.astype("U"), "utf-8", "ignore")
    else:
        b = arr
    s8 = np.asarray(b, dtype="S8")  # first 8 bytes, zero padded
    u = np.frombuffer(s8.tobytes(), dtype="<u8").copy()
    h1 = u * np.uint64(C1)
    lo = h1 & np.uint64(0xFFFFFFFF)
    hi = h1 >> np.uint64(32)
    return lo * np.uint64(C2) + hi * np.uint64(C3)


def sql_token_hash(t: str) -> str:
    """DuckDB expression: hash of token expression ``t`` as HUGEINT in
    [0, 2**64).  Byte extraction via ascii(substr(...)) — identical to the
    numpy path for ASCII tokens."""
    u = " + ".join(
        f"(CASE WHEN length({t}) >= {i + 1} "
        f"THEN ascii(substr({t}, {i + 1}, 1))::HUGEINT * {1 << (8 * i)}::HUGEINT "
        f"ELSE 0::HUGEINT END)"
        for i in range(8)
    )
    h1 = f"((({u}) * {C1}::HUGEINT) % {U64}::HUGEINT)"
    return (
        f"(((({h1}) % 4294967296::HUGEINT) * {C2}::HUGEINT"
        f" + (({h1}) // 4294967296::HUGEINT) * {C3}::HUGEINT) % {U64}::HUGEINT)"
    )


def int_hash64(ids) -> np.ndarray:
    """Vectorized 64-bit hash of non-negative int64 ids — the same
    C1/C2/C3 mixing as :func:`token_hash64` applied to the id value
    directly (uint64 wraparound), so :func:`sql_int_hash` reproduces it
    exactly in DuckDB.  Used for deterministic train/val/test splits and
    hash-ordered sampling, where the split decision must be recomputable
    by the SQL oracle."""
    u = np.asarray(ids, dtype=np.int64).astype(np.uint64)
    h1 = u * np.uint64(C1)
    lo = h1 & np.uint64(0xFFFFFFFF)
    hi = h1 >> np.uint64(32)
    return lo * np.uint64(C2) + hi * np.uint64(C3)


def sql_int_hash(e: str) -> str:
    """DuckDB expression: :func:`int_hash64` of non-negative BIGINT
    expression ``e`` as HUGEINT in [0, 2**64)."""
    h1 = f"((({e})::HUGEINT * {C1}::HUGEINT) % {U64}::HUGEINT)"
    return (
        f"(((({h1}) % 4294967296::HUGEINT) * {C2}::HUGEINT"
        f" + (({h1}) // 4294967296::HUGEINT) * {C3}::HUGEINT) % {U64}::HUGEINT)"
    )


C4 = 0x14650FB0739D0383  # odd, < 2**61: every HUGEINT product stays < 2**126
C5 = 0x1B873593CC9E2D51  # odd, < 2**61: third rolling-hash multiplier (CDC)


def kmv_hash64(ids) -> np.ndarray:
    """Strong 64-bit mixer (multiply–xorshift x3, splitmix64-shaped) for
    ORDER-STATISTIC uses — KMV distinct sketches need the k smallest
    hashes to be uniform, which the light :func:`int_hash64` mixer is not
    (measured: 55% KMV error on 8k sequential ints vs <2% here).  All
    multipliers < 2**62 so the DuckDB twin's HUGEINT products never
    overflow; xor and ``// 2**32`` / ``// 2**29`` reproduce the numpy
    uint64 ops exactly (CLAUDE.md round-2)."""
    z = np.asarray(ids, dtype=np.int64).astype(np.uint64) * np.uint64(C1)
    z ^= z >> np.uint64(32)
    z = z * np.uint64(C4)
    z ^= z >> np.uint64(29)
    z = z * np.uint64(C1)
    z ^= z >> np.uint64(32)
    return z


def sql_kmv_hash(e: str) -> str:
    """DuckDB expression: :func:`kmv_hash64` of non-negative BIGINT
    expression ``e`` as HUGEINT in [0, 2**64)."""
    z1 = f"((({e})::HUGEINT * {C1}::HUGEINT) % {U64}::HUGEINT)"
    z2 = f"xor({z1}, ({z1}) // 4294967296::HUGEINT)"
    z3 = f"((({z2}) * {C4}::HUGEINT) % {U64}::HUGEINT)"
    z4 = f"xor({z3}, ({z3}) // 536870912::HUGEINT)"
    z5 = f"((({z4}) * {C1}::HUGEINT) % {U64}::HUGEINT)"
    return f"xor({z5}, ({z5}) // 4294967296::HUGEINT)"


def sql_u64_to_bigint(e: str) -> str:
    """HUGEINT in [0, 2**64) -> signed BIGINT (two's-complement view),
    matching numpy's ``.view(np.int64)``."""
    return (
        f"(CASE WHEN ({e}) >= 9223372036854775808::HUGEINT "
        f"THEN ({e}) - {U64}::HUGEINT ELSE ({e}) END)::BIGINT"
    )
