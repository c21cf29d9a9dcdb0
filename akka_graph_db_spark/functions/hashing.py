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
