"""Cross-engine-reproducible 64-bit string hashes.

``xxhash64`` (Spark's fast built-in) has no DuckDB counterpart, which is why
round-2 left the fingerprint/SimHash queries rows-only. The MD5 family fixes
that: both engines expose MD5, and DuckDB's ``md5_number_upper(s)`` is the
LITTLE-ENDIAN uint64 of the first 8 digest bytes (verified against hashlib).
``md5_64`` rebuilds exactly that value from Spark's hex ``md5()``:

    Spark:   md5_64(col)                    -- signed two's-complement view
    DuckDB:  md5_number_upper(col)          -- unsigned view, same bits

Bit tests/XOR/bit_count agree across the signed/unsigned views; for
ORDERING-sensitive uses (min-hash style) use ``md5_63`` which masks the sign
bit so both engines order identically as non-negative values:

    Spark:   md5_63(col)
    DuckDB:  CAST(md5_number_upper(col) & 0x7FFFFFFFFFFFFFFF AS BIGINT)

~2-4× slower than xxhash64 (MD5 + hex slicing), still fully JVM-codegen —
the default hash family for hot paths stays xxhash64; pass
``hash_family="md5"`` where cross-engine verification matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SIGN_MASK = 0x7FFFFFFFFFFFFFFF


def md5_64(c: Column) -> Column:
    """64-bit MD5-derived hash == DuckDB ``md5_number_upper`` (as signed).

    Byte-reverses the first 8 digest bytes (hex pairs 15,13,...,1) to get the
    little-endian value, then assembles it from two 32-bit halves —
    ``conv`` emits an unsigned decimal string that cannot be cast to BIGINT
    when >= 2^63, but each half fits, and ``shiftleft`` is a pure bit op
    (no ANSI overflow check).
    """
    h = F.md5(c)
    le_hex = F.concat(*[F.substring(h, 15 - 2 * i, 2) for i in range(8)])
    hi = F.conv(F.substring(le_hex, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(le_hex, 9, 8), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def md5_63(c: Column) -> Column:
    """``md5_64`` with the sign bit masked off: non-negative in both
    engines, so MIN/ORDER BY agree between Spark BIGINT and DuckDB UBIGINT."""
    return md5_64(c).bitwiseAND(F.lit(_SIGN_MASK))


def token_hash(c: Column, hash_family: str) -> Column:
    """Per-token 64-bit hash used by SimHash/fingerprinting.

    ``xxhash64``: fastest, JVM-native, NOT reproducible outside Spark.
    ``md5``: cross-engine (DuckDB ``md5_number_upper``) — use for
    oracle-verified paths.
    """
    if hash_family == "xxhash64":
        return F.xxhash64(c)
    if hash_family == "md5":
        return md5_64(c)
    raise ValueError(f"unknown hash_family: {hash_family!r}")


# ---------------------------------------------------------------------------
# Spark-parity XXH64 in numpy (no JVM, no third-party xxhash dependency)
# ---------------------------------------------------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_U64_MASK = (1 << 64) - 1


def _xxh64_fixed_np(mat, ln: int, seed: int):
    """XXH64 of every ROW of a C-contiguous (k, ln) uint8 matrix,
    vectorized across rows (one fixed byte length per call). Returns a
    uint64 array of length k. Reference XXH64 algorithm (Collet) — the
    same bytes-in/bits-out function Spark's ``xxhash64`` applies to a
    string's UTF-8 bytes."""
    import numpy as np

    U = np.uint64
    P1, P2, P3, P4, P5 = (
        U(_XXP1), U(_XXP2), U(_XXP3), U(_XXP4), U(_XXP5)
    )
    k = mat.shape[0]

    def rotl(x, r):
        return (x << U(r)) | (x >> U(64 - r))

    def u64(i):
        return mat[:, i:i + 8].copy().view("<u8").ravel()

    i = 0
    if ln >= 32:
        v1 = np.full(k, (seed + _XXP1 + _XXP2) & _U64_MASK, U)
        v2 = np.full(k, (seed + _XXP2) & _U64_MASK, U)
        v3 = np.full(k, seed & _U64_MASK, U)
        v4 = np.full(k, (seed - _XXP1) & _U64_MASK, U)
        while i + 32 <= ln:
            v1 = rotl(v1 + u64(i) * P2, 31) * P1
            v2 = rotl(v2 + u64(i + 8) * P2, 31) * P1
            v3 = rotl(v3 + u64(i + 16) * P2, 31) * P1
            v4 = rotl(v4 + u64(i + 24) * P2, 31) * P1
            i += 32
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (rotl(v * P2, 31) * P1)) * P1 + P4
    else:
        h = np.full(k, (seed + _XXP5) & _U64_MASK, U)
    h = h + U(ln)
    while i + 8 <= ln:
        h = rotl(h ^ (rotl(u64(i) * P2, 31) * P1), 27) * P1 + P4
        i += 8
    if i + 4 <= ln:
        w = mat[:, i:i + 4].copy().view("<u4").ravel().astype(U)
        h = rotl(h ^ (w * P1), 23) * P2 + P3
        i += 4
    while i < ln:
        h = rotl(h ^ (mat[:, i].astype(U) * P5), 11) * P1
        i += 1
    h ^= h >> U(33)
    h *= P2
    h ^= h >> U(29)
    h *= P3
    h ^= h >> U(32)
    return h


def xxhash64_bytes_np(data, seed: int = 42):
    """XXH64 of every byte string in ``data`` — BIT-IDENTICAL to Spark's
    ``xxhash64(string_col)`` on the string's UTF-8 bytes (Spark's default
    seed is 42). Vectorized by length class with numpy; returns an int64
    array aligned with the input order (the signed two's-complement view
    Spark's BIGINT carries).

    Exists so Python-side (Arrow) operators can reproduce quantities the
    JVM expression path derives with ``F.xxhash64`` — e.g. the distinct
    HASHED shingle count that the dedup size-ratio prefilter must share
    with the exact-verify frame (VERDICT r12 #2) — without a JVM round
    trip. Parity is pinned in tests against Spark's own xxhash64 over
    fixture corpus tokens plus adversarial lengths (0..100 bytes,
    non-ASCII)."""
    import numpy as np

    out = np.empty(len(data), dtype=np.uint64)
    if not len(data):
        return out.view(np.int64)
    by_len: dict = {}
    for i, b in enumerate(data):
        by_len.setdefault(len(b), []).append(i)
    with np.errstate(over="ignore"):
        for ln, idxs in by_len.items():
            if ln == 0:
                mat = np.empty((len(idxs), 0), dtype=np.uint8)
            else:
                flat = np.frombuffer(
                    b"".join(data[i] for i in idxs), dtype=np.uint8
                )
                mat = flat.reshape(len(idxs), ln)
            out[np.asarray(idxs)] = _xxh64_fixed_np(mat, ln, seed)
    return out.view(np.int64)
