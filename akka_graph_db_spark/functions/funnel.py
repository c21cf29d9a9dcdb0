"""Ordered-step funnel analysis over the event stream (SURVEY.md §2.9
extension — the conversion-funnel primitive every event pipeline needs).

A user "reaches" step k when an event of type ``steps[k]`` exists strictly
after the time they reached step k-1 (greedy earliest-completion matching —
greedy is optimal for subsequence existence, so "reached" is well-defined
without search). The whole computation is per-user conditional MIN
aggregations chained by joins: one shuffle per step, every shuffle on
user_id, so successive steps reuse the same hash partitioning (the same
exchange-reuse shape as the Pregel loops in operators/analytics.py).
No window sorts, no UDFs — portable enough that a SQL oracle reproduces it
exactly.

At 100 TB: pre-filter events to the step types before the first shuffle
(done below — the scan prunes on event_type), and bound the funnel with a
time window upstream if the event history is unbounded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel completion: (user_id, step1_ts, ..., stepN_ts,
    steps_completed). step ts columns are NULL once the funnel stalls.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("event_type"),
    ).where(F.col("event_type").isin(list(steps)))

    # step 1: earliest occurrence of the first step type
    state = (
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("step1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col("event_type") == step).select(
            "user_id", F.col("ts").alias("_t")
        )
        # earliest event of this step strictly after the previous step's
        # completion; users who stalled keep NULL (left join)
        state = (
            state.join(nxt, "user_id", "left")
            .groupBy("user_id", *[f"step{j}_ts" for j in range(1, i)])
            .agg(
                F.min(
                    F.when(
                        F.col("_t") > F.col(f"step{i - 1}_ts"), F.col("_t")
                    )
                ).alias(f"step{i}_ts")
            )
        )
    completed = sum(
        F.when(F.col(f"step{i}_ts").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return state.select(
        "user_id",
        *[f"step{i}_ts" for i in range(1, len(steps) + 1)],
        completed.cast("int").alias("steps_completed"),
    )


def funnel_histogram(
    events: DataFrame, steps: Sequence[str], **kwargs
) -> DataFrame:
    """(steps_completed, n_users) — the funnel drop-off curve."""
    return (
        funnel(events, steps, **kwargs)
        .groupBy("steps_completed")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
