"""Skew-safe join utility: key salting.

When one join key carries a disproportionate share of rows (a supernode, a
viral document, a null-ish default), the shuffle partition owning it
becomes the straggler that gates the whole stage. AQE's skew-join split
handles sort-merge cases adaptively; explicit salting is the deterministic
planner-independent fix, and the only one that works when the skewed side
feeds further keyed stages.

``salted_join`` splits the skewed side's key space into ``n_salt``
sub-keys via a hash of a high-cardinality discriminator column, and
replicates the other (smaller, but not broadcastable) side once per salt —
turning one hot partition into ``n_salt`` even ones. The result is
row-for-row identical to the plain join (oracle-checked); only the
physical distribution changes.

The reference delegates all execution to Neo4j and has no notion of
distribution (SURVEY.md §4); this is 100 TB-scale extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt_from: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on ``on``, salted ``n_salt``
    ways.

    ``salt_from``: a column of ``skewed`` with high cardinality within
    each hot key (e.g. the row's own primary key) — its hash spreads the
    hot key's rows across salts deterministically (no RNG: plans are
    replayable and speculative re-execution is safe). ``other`` is
    replicated ``n_salt`` times via an exploded literal range, so keep it
    the smaller side. Supported ``how``: inner / left (semantics
    preserved because every skewed row gets exactly one salt and every
    other-side key appears under every salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    s = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt))
    )
    o = other.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])),
    )
    return s.join(o, on + ["_salt"], how).drop("_salt")


def skew_report(
    df: DataFrame, key_cols: "list[str]", top_k: int = 10
) -> DataFrame:
    """Join-key skew diagnostics — the measurement that decides whether
    a key needs :func:`salted_join` BEFORE the straggler appears in
    production: per-key row counts for the ``top_k`` heaviest keys,
    each with its exact share of the total and the ratio to a perfectly
    uniform key (share × distinct-key count — a hot key at 50× uniform
    is a guaranteed straggler at any parallelism ≥ 50).

    One aggregation + two 1-row broadcasts folded in-plan (total rows,
    distinct keys); shares are single double divisions off exact
    counts. Returns (key..., n_rows, share, x_uniform) ordered
    heaviest-first.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    return (
        counts.orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("_total")).alias(
                "share"
            ),
            (
                F.col("n_rows").cast("double")
                * F.col("_n_keys")
                / F.col("_total")
            ).alias("x_uniform"),
        )
    )
