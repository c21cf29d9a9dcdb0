"""Dataset profiling — per-column statistics in one pass (SURVEY.md §2.9
pipeline utilities: the schema-sanity report every ingest runs before
committing a snapshot).

Reference parity note: the reference exposes per-label/property summary
statistics through its management surface (see SURVEY.md §2.7's summary
endpoints); this module is the columnar generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Exact per-column profile: (column, n_rows, n_nulls, n_distinct).

    ONE aggregation pass over the input — the per-column counters all
    ride in the same agg (Spark plans the multi-count-distinct via a
    single Expand + two-phase aggregation, so the input is scanned
    once), then a literal-array explode pivots the single result row to
    one row per column. n_distinct ignores NULLs (SQL COUNT(DISTINCT)
    semantics).

    At scale: Expand multiplies the scanned rows by the number of
    profiled columns before the shuffle — profile the columns you care
    about rather than ``*`` on a 1000-column table; the shuffle itself
    carries only distinct values per column (map-side partial dedup).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    row = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(F.col(c)).alias(f"_nn_{i}") for i, c in enumerate(cols)],
        *[
            F.countDistinct(F.col(c)).alias(f"_nd_{i}")
            for i, c in enumerate(cols)
        ],
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{i}")).alias("n_nulls"),
                F.col(f"_nd_{i}").alias("n_distinct"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.explode(entries).alias("_e")).select(
        "_e.column", "_e.n_rows", "_e.n_nulls", "_e.n_distinct"
    )
