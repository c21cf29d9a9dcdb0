"""As-of (most-recent-prior) joins — the canonical custom temporal operator.

The reference engine family (and every feature-store/backtest pipeline)
needs "for each left row, the latest right row at or before its timestamp,
per key". Spark has no built-in as-of join; the classic scalable
formulation used here is UNION-MERGE + WINDOW rather than an inequality
join:

    tag left rows (payload NULL) and right rows (payload packed in one
    struct), union them, and take ``last(payload, ignorenulls=True)`` over
    a window partitioned by key and ordered by (ts, side) from the start
    of the partition to the current row.

That is ONE shuffle on the join key and a linear merge per partition —
no quadratic per-key inequality join, no broadcast requirement, and skew
is whatever the key distribution is (AQE handles it like any other
shuffle). ``pandas merge_asof`` via cogrouped ``applyInPandas`` would give
the same result but moves every row through Arrow; the window formulation
stays entirely JVM-side.

Ordering ties: the side column sorts so that same-timestamp right rows
are visible from the left row's frame in BOTH directions (inclusive
match — a quote at exactly the trade's ts matches), and the caller must
make right unique per (key, ts) for deterministic output
(:func:`latest_per_key_ts` does this by max tiebreak column).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key_ts(
    df: DataFrame,
    by_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """One row per (by_cols, ts): the row with the greatest tiebreak value.
    Run the right side of an as-of join through this to make tie behavior
    deterministic (equal-timestamp rows otherwise match arbitrarily)."""
    w = Window.partitionBy(*by_cols, ts_col).orderBy(F.desc(tiebreak_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _asof_union_merge(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    suffix: str,
    tolerance_seconds: int | None,
    forward: bool,
) -> DataFrame:
    """Shared union-merge machinery for both as-of directions. Only four
    things differ by direction: the _side sort order at an equal ts, the
    window frame, last-vs-first over it, and which way the tolerance
    comparison points — everything else (payload struct, null-padding of
    left-only columns, output shape) is direction-free and lives ONCE
    here so the two public joins cannot drift apart.
    """
    by_cols = list(by_cols)
    value_cols = list(value_cols)
    payload = F.struct(
        F.col(ts_col).alias("_ts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *by_cols,
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
    )
    # right rows carry NULL for left-only columns
    for c in left_cols:
        if c not in by_cols and c != ts_col:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    merged = l.unionByName(r.select(*l.columns))
    if forward:
        # left (1) sorts before right (0) at an equal ts, so the forward
        # frame [current, following] still sees same-ts right rows
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(ts_col).asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first("_p", ignorenulls=True)
    else:
        # right (0) sorts before left (1) at an equal ts → inclusive
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(ts_col, "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last("_p", ignorenulls=True)
    matched = merged.withColumn("_m", pick.over(w)).where(
        F.col("_side") == 1
    )
    m = F.col("_m")
    if tolerance_seconds is not None:
        tol = F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
        out_of_window = (
            m["_ts"] > F.col(ts_col) + tol
            if forward
            else m["_ts"] < F.col(ts_col) - tol
        )
        matched = matched.withColumn(
            "_m", F.when(out_of_window, F.lit(None)).otherwise(m)
        )
    return matched.select(
        *left_cols,
        m["_ts"].alias(f"{ts_col}{suffix}"),
        *[m[c].alias(f"{c}{suffix}") for c in value_cols],
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.ts_col <= left.ts_col`` within the same ``by_cols`` key
    (NULLs when no prior right row exists). Right must be unique per
    (by_cols, ts_col) — see :func:`latest_per_key_ts`.

    Output = all left columns + each ``value_cols`` as ``<col><suffix>``
    + ``<ts_col><suffix>`` (the matched right timestamp).

    ``tolerance_seconds`` (optional, like pandas ``merge_asof``): matches
    older than the tolerance window are nulled out.
    """
    return _asof_union_merge(
        left, right, ts_col, by_cols, value_cols, suffix,
        tolerance_seconds, forward=False,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Mirror of :func:`asof_join_backward` looking FORWARD: for each
    left row, attach the right row with the smallest
    ``right.ts_col >= left.ts_col`` within the same ``by_cols`` key
    (NULLs when no later right row exists) — "the next purchase after
    this view". Right must be unique per (by_cols, ts_col).

    ``tolerance_seconds`` nulls matches further than the window ahead.
    """
    return _asof_union_merge(
        left, right, ts_col, by_cols, value_cols, suffix,
        tolerance_seconds, forward=True,
    )
