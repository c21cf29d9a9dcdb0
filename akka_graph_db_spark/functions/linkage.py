"""Entity resolution / record linkage: blocking-key candidate
generation + edit-distance verification.

The classic two-stage ER pipeline (Fellegi-Sunter shape): a cheap
BLOCKING key partitions records so candidate pairs form only within a
block (never all-pairs), a LOSSLESS length filter prunes pairs the
edit-distance bound already excludes, and a levenshtein verify scores
the survivors. No reference file:line — sanctioned LLM-pipeline
extension surface (SURVEY.md §2.9): large-scale corpus curation dedups
entity mentions (authors, products, URLs normalized to hosts) with
exactly this blocking + verify discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def entity_linkage(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block: Column | None = None,
    max_distance: int = 2,
    top: int = 20,
) -> DataFrame:
    """Fuzzy self-linkage of ``records`` on ``name_col``: pairs of
    distinct records whose names are within levenshtein distance
    ``max_distance``, candidates generated per blocking key. Returns
    the ``top`` pairs by (distance asc, id_a, id_b) as
    (id_a, id_b, name_a, name_b, distance).

    ``block`` is the blocking-key expression (default: the name's first
    whitespace token). Blocking is the standard recall/cost tradeoff of
    every production ER system — pairs in different blocks are never
    compared (documented lossy, like LSH banding); within a block, the
    |len(a) - len(b)| <= max_distance filter is LOSSLESS (edit distance
    is bounded below by the length difference), so it only removes
    pairs the verify would reject anyway.

    Scale shape: one groupBy-free self-equi-join on the blocking key —
    candidate volume is Σ_B |B|²/2, bounded by the largest block, never
    n². The levenshtein verify runs INSIDE the join's filter
    (JVM-codegen'd, no Python), so rejected pairs never materialize
    past the join operator. At 100 TB the block key is the partitioner:
    choose it so max |B| keeps per-task candidate counts bounded
    (compose keys — first token + length bucket — exactly like salting
    a skewed join), and skew-salt any residual hot block.
    """
    if block is None:
        block = F.split(F.col(name_col), r"\s+").getItem(0)
    base = records.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        block.alias("_blk"),
    )
    # Spread the PROBE side across the cluster before the block join:
    # a small records table broadcasts (the right side below), which
    # pins the join's parallelism to the left side's INPUT partitioning
    # — one parquet file ⇒ one task grinding every within-block pair's
    # levenshtein (measured 21.6s → 1.8s at sf0.1, 25M candidates).
    # The repartition shuffles only the linear records frame, never the
    # quadratic candidate volume; _id spreads uniformly where the
    # 8-block _blk key could not.
    par = records.sparkSession.sparkContext.defaultParallelism
    left = base.repartition(par, "_id").select(
        F.col("_id").alias("id_a"),
        F.col("_name").alias("name_a"),
        "_blk",
    )
    right = base.select(
        F.col("_id").alias("id_b"),
        F.col("_name").alias("name_b"),
        "_blk",
    )
    cand = left.join(right, "_blk").where(
        (F.col("id_a") < F.col("id_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b"))
            <= max_distance
        )
    )
    verified = cand.select(
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("int").alias("distance"),
    ).where(F.col("distance") <= max_distance)
    return verified.orderBy("distance", "id_a", "id_b").limit(top)
