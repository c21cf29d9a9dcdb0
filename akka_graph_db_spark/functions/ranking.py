"""Distributed global ranking.

A bare ``Window.orderBy(...)`` with no partitionBy funnels every row
through ONE task — the classic global-sort bottleneck that stops working
long before 100 TB. ``global_rank`` computes the identical row numbers
distributively: range-repartition on the sort key, rank WITHIN each
partition (parallel windows), then add per-partition offsets computed
from a tiny partition-count aggregate. The only driver-side data is one
row count per partition.

The reference has no ranking of any kind (SURVEY.md §2.7) — Spark
semantics adopted wholesale, re-expressed scale-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def global_rank(
    df: DataFrame,
    order_by: "list[Column | str]",
    rank_col: str = "rank",
    n_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = the 1-based global ROW_NUMBER of each row
    under ``order_by`` (which must be a TOTAL order — include a unique
    id as the final key, or ties get partition-dependent ranks).

    Plan shape: one range shuffle (RangePartitioner keeps equal sort
    keys together and orders partitions, so partition i holds exactly
    the rows ranked between partitions i-1 and i+1), one per-partition
    sort + window (parallel across partitions), one P-row count
    aggregate collected to the driver for the offsets, and one
    broadcast join to add them. Equivalent to
    ``ROW_NUMBER() OVER (ORDER BY ...)`` but never single-partition.
    """
    from pyspark.sql import Window

    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    spark = df.sparkSession
    p = n_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    r = (
        df.repartitionByRange(p, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        counts = dict(
            (row["_pid"], row["c"])
            for row in r.groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        offsets, acc = [], 0
        for pid in range(max(counts) + 1 if counts else 0):
            offsets.append((pid, acc))
            acc += counts.get(pid, 0)
        off_df = spark.createDataFrame(
            offsets or [(0, 0)], "_pid int, _off bigint"
        )
        w = Window.partitionBy("_pid").orderBy(*cols)
        out = (
            r.join(F.broadcast(off_df), "_pid")
            .withColumn(
                rank_col,
                (F.col("_off") + F.row_number().over(w)).cast("bigint"),
            )
            .drop("_pid", "_off")
        )
        return out.localCheckpoint(eager=True)
    finally:
        r.unpersist()
