"""Z-order (Morton) interleaving for multi-column data skipping.

Sorting by one column gives parquet min/max pruning on that column only;
interleaving the bits of TWO key columns into one sort key clusters rows
so that range predicates on EITHER column skip most row groups — the
same layout trick Delta/Iceberg expose as OPTIMIZE ZORDER, as pure Spark
expressions (shift/mask chains, fully codegen'd, no UDF).

Scale use: ``df.repartitionByRange(zorder_key(...)).sortWithinPartitions
(zorder_key(...)).write.parquet(...)`` — point/range lookups on either
dimension then prune via row-group stats exactly as `store.py`'s
id-clustered layout does for ids.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2D bit-spread masks: place a 31-bit value's bits in the even positions
# of a 62-bit word (the standard Morton magic-number chain).
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(c: Column) -> Column:
    x = c.cast("long").bitwiseAND(F.lit((1 << 31) - 1))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column | str, b: Column | str) -> Column:
    """Morton key of two NON-NEGATIVE integer columns (each truncated
    to 31 bits): bit i of ``a`` lands at position 2i, of ``b`` at
    2i+1 — so any prefix of the key constrains a square region of the
    (a, b) plane, which is what makes min/max row-group stats selective
    for predicates on either column.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread_bits(ca).bitwiseOR(
        F.shiftleft(_spread_bits(cb), 1)
    )
