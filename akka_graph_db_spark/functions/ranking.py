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


def ntile_distributed(
    df: DataFrame,
    k: int,
    order_by: "list[Column | str]",
    tile_col: str = "tile",
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY ...)`` without the
    single-partition window: :func:`global_rank` supplies distributed
    row numbers, then the standard remainder-first tile formula (the
    first ``n % k`` tiles get one extra row — SQL-standard semantics,
    byte-identical to DuckDB/Spark NTILE) maps rank → tile as a pure
    expression. ``order_by`` must be a total order, same contract as
    global_rank.

    The rank→tile division runs in double and floors — exact while
    n < 2^53 rows, i.e. always.
    """
    if k < 1:
        raise ValueError(f"ntile_distributed: k must be >= 1, got {k}")
    ranked = global_rank(df, order_by, rank_col="_grank")
    n = ranked.count()  # checkpointed by global_rank — cheap action
    q, r = divmod(n, k)
    rank = F.col("_grank")
    if q == 0:  # fewer rows than tiles: tile i = row i
        tile = rank
    else:
        first = r * (q + 1)
        tile = F.when(
            rank <= first,
            F.floor((rank - 1) / F.lit(q + 1)) + 1,
        ).otherwise(
            F.lit(r) + F.floor((rank - first - 1) / F.lit(q)) + 1
        )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("_grank")


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per
    customer, Recency (days since last order, anchored to the data's
    max date so the result is reproducible), Frequency (#orders),
    Monetary (exact DECIMAL spend), each cut into ``n_tiles``
    rank-based tiles (1 = best: most recent / most frequent / highest
    spend), aggregated to one row per occupied (r, f, m) cell with the
    customer count — at most n_tiles³ rows out.

    Determinism: tile of a customer = ((rank-1) * n_tiles) div n with
    rank ordered by the metric (best first) then customer id — pure
    integer arithmetic, no percentile floats, ties broken stably.

    Scale shape: one groupBy to per-customer (r, f, m), one window per
    metric over that per-CUSTOMER frame (orders of magnitude smaller
    than the order log), one final groupBy to the grid. The max-date
    anchor rides in via a 1-row broadcast join, not a collect.
    """
    from pyspark.sql.window import Window

    per_cust = orders.groupBy(
        F.col(customer_col).alias("customer")
    ).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(30,2)")).alias(
            "monetary"
        ),
    )
    anchor = per_cust.agg(F.max("_last").alias("_anchor"))
    base = per_cust.join(F.broadcast(anchor)).select(
        "customer",
        F.datediff(F.col("_anchor"), F.col("_last")).alias("recency"),
        "frequency",
        "monetary",
    )
    # one synthetic key so every window shares a single partition
    # spec (documented single-partition caveat above)
    tiled = base.withColumn("_z", F.lit(0))
    wtot = Window.partitionBy("_z")
    ranked = tiled.select(
        "customer",
        F.row_number()
        .over(
            Window.partitionBy("_z").orderBy(
                F.col("recency").asc(), F.col("customer")
            )
        )
        .alias("_rn_r"),
        F.row_number()
        .over(
            Window.partitionBy("_z").orderBy(
                F.col("frequency").desc(), F.col("customer")
            )
        )
        .alias("_rn_f"),
        F.row_number()
        .over(
            Window.partitionBy("_z").orderBy(
                F.col("monetary").desc(), F.col("customer")
            )
        )
        .alias("_rn_m"),
        F.count(F.lit(1)).over(wtot).alias("_cnt"),
    )
    graded = ranked.select(
        "customer",
        F.expr(
            f"(CAST(_rn_r - 1 AS BIGINT) * {n_tiles}) div _cnt + 1"
        ).cast("int").alias("r_tile"),
        F.expr(
            f"(CAST(_rn_f - 1 AS BIGINT) * {n_tiles}) div _cnt + 1"
        ).cast("int").alias("f_tile"),
        F.expr(
            f"(CAST(_rn_m - 1 AS BIGINT) * {n_tiles}) div _cnt + 1"
        ).cast("int").alias("m_tile"),
    )
    return graded.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
