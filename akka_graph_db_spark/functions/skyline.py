"""Distributed skyline (Pareto frontier) — the multi-criteria OLAP
operator: rows not dominated by any other row, where q dominates p iff q
is >= p on every maximize-dim, <= on every minimize-dim, and strictly
better on at least one. The reference's query surface stops at
filter/sort (Neo4jGraph.scala:156-786 exposes property-equality reads
only); skyline is part of the sanctioned relational-analytics extension
surface.

Spark-first shape (the classic two-phase distributed skyline):

1. **Local phase** — each input partition reduces to its own skyline
   with a vectorized numpy dominance filter inside ``mapInPandas``
   (Arrow batches, no row-at-a-time Python). A partition's local
   skyline is tiny next to the partition (expected O(log^(d-1) n) points
   for independent dims), so the phase is a near-map-side combine: the
   data shrinkage happens before any shuffle.
2. **Global phase** — the union of local skylines coalesces to one
   partition and the same filter runs once more. Correct because
   dominance is transitive: any point dominated globally is dominated
   by some global-skyline point, and every global-skyline point
   survives its own partition's local phase.

100 TB shape: the only data movement is the local-skyline union — for
d<=4 criteria that is thousands of rows off petabytes; the final pass
is a single small task. For adversarial dimensionality (d large, local
skylines ~ the partition), the local phase degrades gracefully to a
no-op filter and the coalesce becomes the bottleneck — cap it with a
pre-aggregation on a coarse grid before calling this (out of scope
here; the d<=4 curation use case never hits it).

The in-partition filter sorts by the first criterion (descending
preference) and keeps a running frontier: a point can only be dominated
by an earlier point in that order, so one vectorized pass over the
frontier per point suffices — O(n * |skyline|) worst case, ~O(n log n)
typical, never the naive O(n^2) on every pair.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _skyline_pdf(
    pdf: "pd.DataFrame", crit: "list[tuple[str, bool]]"
) -> "pd.DataFrame":
    """Exact in-memory skyline of one pandas frame. ``crit`` is
    [(column, is_max)] — booleans flip minimize-dims so the dominance
    test is uniformly 'greater is better'."""
    import numpy as np

    if len(pdf) == 0:
        return pdf
    m = np.column_stack(
        [
            (pdf[c].to_numpy(dtype="float64") * (1.0 if mx else -1.0))
            for c, mx in crit
        ]
    )
    # Sort lexicographically, best-first on every criterion: any
    # dominator of row i appears strictly before i in this order.
    order = np.lexsort(tuple(m[:, j] for j in range(m.shape[1] - 1, -1, -1))
                       )[::-1]
    m = m[order]
    keep_idx: list[int] = []
    frontier: list = []
    for i in range(m.shape[0]):
        p = m[i]
        if frontier:
            fr = np.asarray(frontier)
            ge = (fr >= p).all(axis=1)
            gt = (fr > p).any(axis=1)
            if bool((ge & gt).any()):
                continue
            # Duplicate coordinates of a kept point are co-skyline:
            # neither strictly dominates, both stay.
        keep_idx.append(order[i])
        frontier.append(p)
    keep_idx.sort()
    return pdf.iloc[keep_idx]


def skyline(
    df: DataFrame,
    maximize: "list[str] | None" = None,
    minimize: "list[str] | None" = None,
) -> DataFrame:
    """Pareto-optimal rows of ``df`` under the given criteria columns.

    Exact for any numeric criteria (values are compared as float64 —
    integer criteria up to 2^53 and DECIMALs with <= 15 significant
    digits are exact in that domain). Non-criteria columns pass through
    untouched. Points with identical criteria vectors all survive
    (dominance is strict).
    """
    maximize = list(maximize or [])
    minimize = list(minimize or [])
    if not maximize and not minimize:
        raise ValueError("at least one criterion column required")
    crit = [(c, True) for c in maximize] + [(c, False) for c in minimize]
    schema = df.schema

    def _local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-PARTITION skyline: Arrow hands the partition as multiple
        # batches; dominance must see all of them at once.
        parts = [p for p in it if len(p)]
        if parts:
            yield _skyline_pdf(
                pd.concat(parts, ignore_index=True), crit
            )

    local = df.mapInPandas(_local, schema=schema)
    # Global pass over the (small) union of local skylines.
    return local.coalesce(1).mapInPandas(_local, schema=schema)
