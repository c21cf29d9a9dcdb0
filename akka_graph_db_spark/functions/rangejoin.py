"""Batch range (interval) join — the bucketed equi-join shape.

A naive inequality join (``l.ts BETWEEN r.lo AND r.hi``) gives Catalyst no
equi-key, so it falls back to broadcast-nested-loop — quadratic work and a
single-task bottleneck at scale. The scalable shape bins time into
fixed-width buckets: an interval of width <= bucket covers at most two
buckets, so replicating each interval row into its covered buckets turns
the range join into a plain shuffled equi-join on (key, bucket) followed by
the exact range filter. Work is proportional to true near-matches, the
shuffle partitions by (key, bucket) — skew-safe under AQE — and nothing is
nested-loop.

The same construction powers the STREAMING interval join
(streaming/windows.py); this is the batch twin, oracle-checked against the
naive inequality join in DuckDB at test scale (where quadratic is fine).

The reference has no joins at all beyond endpoint hydration
(Neo4jGraph.scala:259-332; SURVEY.md §2.7) — this is §2.9 extension
surface for event-time training-data pipelines (e.g. attribute each
purchase to the clicks that preceded it within a window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str | Column,
    right_lo: str | Column,
    right_hi: str | Column,
    bucket_seconds: int,
) -> DataFrame:
    """Join ``left`` (point events, timestamp ``left_ts``) to ``right``
    (interval rows, ``[right_lo, right_hi)``) on equal ``keys`` AND the
    point falling inside the interval.

    Pick ``bucket_seconds`` >= the typical interval width, so every
    interval covers about two consecutive buckets (wider intervals are
    still correct — ``sequence()`` replicates into exactly the covered
    buckets); the join is then equi on keys + bucket with the exact
    half-open range predicate applied after. Columns from both sides survive (left's
    first); name collisions beyond ``keys`` must be resolved by the
    caller beforehand.
    """
    lts = F.col(left_ts) if isinstance(left_ts, str) else left_ts
    rlo = F.col(right_lo) if isinstance(right_lo, str) else right_lo
    rhi = F.col(right_hi) if isinstance(right_hi, str) else right_hi

    def bno(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / F.lit(bucket_seconds))

    l_b = left.withColumn("_bucket", bno(lts))
    # interval covers buckets [bno(lo) .. bno(hi)] — at most 2 when the
    # width fits one bucket; sequence() materializes exactly the covered
    # buckets, no over-replication
    r_b = right.withColumn(
        "_bucket", F.explode(F.sequence(bno(rlo), bno(rhi)))
    )
    joined = l_b.join(r_b, keys + ["_bucket"], "inner").where(
        (lts >= rlo) & (lts < rhi)
    )
    return joined.drop("_bucket")
