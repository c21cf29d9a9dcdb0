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


def drift_tvd(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: int,
) -> DataFrame:
    """Distribution drift of each group against the REST of the corpus:
    exact total-variation distance between the group's and the
    complement's binned value histograms — the slice-vs-corpus data-
    quality gate ("did src7's length distribution shift this crawl?").

    TVD = ½ Σ_b |o_b/N_g − r_b/N_r| is computed as EXACT integers via the
    common denominator: tvd_num = Σ_b |o_b·N_r − r_b·N_g| (BIGINT), and
    only the final ratio tvd = tvd_num / (2·N_g·N_r) is one IEEE divide
    rounded to 6 dp — no float accumulation anywhere, so any engine
    reproduces it bit-for-bit (unlike chi-square, whose per-bin float
    terms would make the SUM order-sensitive).

    Returns (group, n_group, n_rest, tvd_num, tvd). Scale shape: two
    aggregations over (group, bin) and (bin), then a groups × bins grid
    join — both sides are AGGREGATES (bins bounded by value range /
    bin_width, groups by the slice cardinality), so the "cross" is a
    bounded dims product, never data-sized; zero-count bins a group
    misses are still charged to it, which naive inner joins silently
    drop."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    b = df.select(
        F.col(group_col).alias("grp"),
        F.expr(f"CAST({value_col} AS BIGINT) DIV {int(bin_width)}").alias(
            "bin"
        ),
    )
    counts = b.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("o"))
    bins = b.groupBy("bin").agg(F.count(F.lit(1)).alias("tot"))
    groups = b.groupBy("grp").agg(F.count(F.lit(1)).alias("n_group"))
    grand = b.agg(F.count(F.lit(1)).alias("n_all"))
    # eqNullSafe on both keys: a NULL group (or a NULL-value bin) is a
    # real histogram cell on both sides — a plain equi-join would charge
    # the NULL group ZERO of its own observations and fold them all into
    # "rest", silently inflating its TVD (ADVICE r11 failure class).
    grid = (
        groups.crossJoin(F.broadcast(bins))
        .crossJoin(F.broadcast(grand))
        .join(
            counts.select(
                F.col("grp").alias("_c_grp"),
                F.col("bin").alias("_c_bin"),
                "o",
            ),
            F.col("grp").eqNullSafe(F.col("_c_grp"))
            & F.col("bin").eqNullSafe(F.col("_c_bin")),
            "left",
        )
        .drop("_c_grp", "_c_bin")
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .withColumn("r", F.col("tot") - F.col("o"))
        .withColumn("n_rest", F.col("n_all") - F.col("n_group"))
    )
    return (
        grid.groupBy("grp", "n_group", "n_rest")
        .agg(
            F.sum(
                F.abs(
                    F.col("o") * F.col("n_rest")
                    - F.col("r") * F.col("n_group")
                )
            )
            .cast("bigint")
            .alias("tvd_num")
        )
        .select(
            F.col("grp").alias(group_col),
            "n_group",
            "n_rest",
            "tvd_num",
            F.round(
                F.col("tvd_num")
                / (F.lit(2.0) * F.col("n_group") * F.col("n_rest")),
                6,
            ).alias("tvd"),
        )
    )


def drift_alarms(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    bin_width: int,
    shift_alarm_micros: int,
) -> DataFrame:
    """Per-group drift report with changepoint localization: WHICH
    groups' value distribution drifts from the rest of the corpus
    (:func:`drift_tvd`) and WHEN each group's own series shifted
    (:func:`~akka_graph_db_spark.functions.events.cusum_changepoints`
    over ``order_col``) — the per-source corpus-drift alarm a crawl
    pipeline runs each ingest ("src7 reads differently this crawl, and
    the break is at document #812").

    The alarm rule is the CUSUM split's exact mean shift: at the argmax
    index k, |mean(1..k) − mean(k+1..n)| = deviation / (k·(n−k)) in
    micro-units (``deviation`` is the common-denominator statistic
    |n·S_k − k·S_n|, so the division is pure integer floor —
    ``shift_micros``). ``alarm`` fires when shift_micros ≥
    ``shift_alarm_micros`` — an interpretable threshold in value units
    ("the mean moved by ≥ X"), unlike the raw deviation whose magnitude
    grows with n². Returns (group, n, change_index, change_order,
    deviation, shift_micros, alarm, n_rest, tvd_num, tvd). Groups with
    a single row have no split and are omitted (CUSUM needs n ≥ 2).

    Scale shape: the CUSUM side is one per-group ordered window pass +
    a max-struct argmax; the TVD side is two bounded aggregations + a
    groups × bins grid; the final join broadcasts the |groups|-row TVD
    frame. Nothing data-sized after the aggregations.
    """
    from akka_graph_db_spark.functions.events import cusum_changepoints

    if shift_alarm_micros < 0:
        raise ValueError("shift_alarm_micros must be >= 0")
    cp = cusum_changepoints(
        df,
        group_col=group_col,
        ts_col=order_col,
        value_col=value_col,
        id_col=order_col,
    )
    shift = F.expr("deviation div (change_index * (n - change_index))")
    tv = drift_tvd(df, group_col, value_col, bin_width).select(
        F.col(group_col).alias("_tv_group"), "n_rest", "tvd_num", "tvd"
    )
    # eqNullSafe: a NULL group is a real group on both sides (CUSUM and
    # TVD both emit it) — a plain equi-join would silently drop it from
    # the report, the exact failure class the stratified_kfold NULL-label
    # fix closed (ADVICE r11).
    return (
        cp.join(
            F.broadcast(tv),
            F.col(group_col).eqNullSafe(F.col("_tv_group")),
        )
        .select(
            group_col,
            "n",
            "change_index",
            F.col("change_ts").alias("change_order"),
            "deviation",
            shift.cast("bigint").alias("shift_micros"),
            (shift >= F.lit(int(shift_alarm_micros))).alias("alarm"),
            "n_rest",
            "tvd_num",
            "tvd",
        )
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact equi-depth (equal-height) histogram of a numeric column:
    ``k`` buckets holding (within one row) the same number of rows,
    with per-bucket (bucket, n_rows, lo, hi) — the data-profiling
    summary equi-WIDTH histograms get wrong on skewed columns (one
    bucket swallows the distribution). Bucket assignment is pure
    integer rank math, (rank-1)·k div n, so the cut points are exact
    discrete order statistics, not interpolated float quantiles — a
    SQL oracle reproduces every boundary bit-for-bit.

    Scale shape: the global ROW_NUMBER comes from
    :func:`~akka_graph_db_spark.functions.ranking.global_rank` (range
    repartition + per-partition windows + broadcast offsets), so no
    single-partition sort exists; the row count folds in-plan via
    crossJoin(broadcast(1-row agg)); the final groupBy is k-row tiny.
    ``(value, id)`` must be a total order — id breaks value ties
    deterministically.
    """
    from akka_graph_db_spark.functions.ranking import global_rank

    base = df.select(
        F.col(value_col).alias("_v"), F.col(id_col).alias("_id")
    )
    tot = base.agg(F.count(F.lit(1)).alias("_n"))
    ranked = global_rank(base, ["_v", "_id"], rank_col="_rk")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.expr(f"(_rk - 1) * {int(k)} div _n").cast("int").alias(
                "bucket"
            ),
            "_v",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
        )
        .orderBy("bucket")
    )


def percentile_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group percentile-rank normalization: for every row, the
    integer permille of group members with value <= its value —
    (id, group, value, permille) — the rank-based feature scaling that
    makes a metric comparable ACROSS groups (per-source quality scores,
    per-language lengths) without float quantile semantics.

    Scale shape: the ordered window runs over the per-(group, value)
    HISTOGRAM — one row per distinct value per group, not per row —
    then joins back on (group, value); permille = cum·1000 div n_group
    is exact integer math (the quantile_filter discipline), so the
    result is partition-order-independent and SQL-reproducible.
    """
    g, v = F.col(group_col), F.col(value_col)
    hist = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    from pyspark.sql.window import Window

    wcum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_tot"))
    ranks = (
        hist.select(
            group_col,
            value_col,
            F.sum("_n").over(wcum).alias("_cum"),
        )
        .join(tot, group_col)
        .select(
            group_col,
            value_col,
            F.expr("_cum * 1000 div _tot").cast("int").alias(
                "permille"
            ),
        )
    )
    return df.select(id_col, group_col, value_col).join(
        ranks, [group_col, value_col]
    ).select(id_col, group_col, value_col, "permille")


def column_correlation(
    df: DataFrame, x_col: str, y_col: str, round_to: int = 6
) -> DataFrame:
    """Exact-moment Pearson correlation between two numeric columns:
    one aggregation computes (n, Σx, Σy, Σxy, Σx², Σy²) as EXACT
    decimals (2-decimal fixture doubles are lossless as DECIMAL(19,6);
    products fit DECIMAL(38,12)), then r derives from the closed form
    in a handful of IEEE steps — so the answer is independent of
    partitioning and shuffle order, unlike a streaming corr() whose
    float accumulation drifts per run. Returns one row
    (n, r, cov, x_mean, y_mean), r/cov/means rounded to ``round_to``.

    The value_outliers discipline extended to the cross moment: the
    ONLY floats are the final divisions/sqrt; everything additive is
    decimal. One map-side-combinable aggregation — no window, no join.
    """
    x = F.col(x_col).cast("decimal(19,6)")
    y = F.col(y_col).cast("decimal(19,6)")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum((x * y).cast("decimal(38,12)")).alias("_sxy"),
        F.sum((x * x).cast("decimal(38,12)")).alias("_sxx"),
        F.sum((y * y).cast("decimal(38,12)")).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    cov = (sxy - sx * sy / n) / n
    vx = (sxx - sx * sx / n) / n
    vy = (syy - sy * sy / n) / n
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(cov / F.sqrt(vx * vy), round_to).alias("r"),
        F.round(cov, round_to).alias("cov"),
        F.round(sx / n, round_to).alias("x_mean"),
        F.round(sy / n, round_to).alias("y_mean"),
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Privacy risk audit: treating ``quasi_cols`` as a
    quasi-identifier, one row summarizing how re-identifiable the
    table is — (n_rows, n_groups, min_group_size, n_rows_at_risk,
    n_groups_at_risk, at_risk_permille) where "at risk" means the
    row's quasi-identifier group has fewer than ``k`` members (the
    k-anonymity criterion). All exact integers; the permille is
    integer DIV.

    Shape: one groupBy over the quasi-identifier + one 1-row rollup —
    both map-side combinable; no window, no join, no floats.
    """
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return groups.agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("_n").cast("bigint").alias("min_group_size"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("n_groups_at_risk"),
    ).select(
        "*",
        F.expr("n_rows_at_risk * 1000 div n_rows")
        .cast("int")
        .alias("at_risk_permille"),
    )


def fd_discovery(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """Functional-dependency discovery over ordered column pairs:
    for every (determinant, dependent) pair from ``cols``, whether
    determinant → dependent holds exactly, with the violation count —
    (determinant, dependent, n_groups, n_violating_groups, holds),
    ordered by (determinant, dependent). A group violates when one
    determinant value maps to >1 distinct dependent values. The
    schema-discovery primitive behind key inference and normalization
    audits; exact integer counts.

    Shape: one groupBy + countDistinct per pair (len(cols)² small
    aggregations over pruned two-column scans), unioned — each is
    map-side combinable; no window.
    """
    outs = []
    for det in cols:
        for dep in cols:
            if det == dep:
                continue
            g = df.groupBy(det).agg(
                F.countDistinct(dep).alias("_nd")
            )
            outs.append(
                g.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                    F.sum(
                        F.when(F.col("_nd") > 1, 1).otherwise(0)
                    ).cast("bigint").alias("n_violating_groups"),
                ).select(
                    F.lit(det).alias("determinant"),
                    F.lit(dep).alias("dependent"),
                    "n_groups",
                    "n_violating_groups",
                    (F.col("n_violating_groups") == 0).alias("holds"),
                )
            )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), outs).orderBy(
        "determinant", "dependent"
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: "list[str]",
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Privacy audit one level past k-anonymity: a k-anonymous group
    still leaks its sensitive attribute when every member SHARES it —
    l-diversity requires >= ``l`` distinct sensitive values per
    quasi-identifier group. One summary row: (n_rows, n_groups,
    min_diversity, n_groups_below_l, n_rows_below_l, below_l_permille).
    All exact integers; permille is integer DIV.

    Shape: one groupBy over quasi-identifier + countDistinct(sensitive)
    + a 1-row rollup — both map-side combinable; no window, no join.
    """
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(sensitive_col).alias("_ndist"),
    )
    return groups.agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("_ndist").cast("bigint").alias("min_diversity"),
        F.sum(F.when(F.col("_ndist") < l, 1).otherwise(0))
        .cast("bigint")
        .alias("n_groups_below_l"),
        F.sum(F.when(F.col("_ndist") < l, F.col("_n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_below_l"),
    ).select(
        "*",
        F.expr("n_rows_below_l * 1000 div n_rows")
        .cast("int")
        .alias("below_l_permille"),
    )


def winsorize_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lower_permille: int = 10,
    upper_permille: int = 990,
) -> DataFrame:
    """Per-group winsorization at exact rank-based cut points — the
    outlier-clamping step metric pipelines run before averaging (a
    single fat-finger order shouldn't move a segment's mean). Returns
    one row per group: (group, n, lo_cut, hi_cut, n_clipped_low,
    n_clipped_high, winsorized_sum) with the cuts and sum in the
    value column's own type (DECIMAL stays DECIMAL — zero float
    accumulation).

    The cut at permille p is the type-1 (lower) quantile: the smallest
    value whose cumulative count reaches ``ceil(n * p / 1000)`` —
    integer arithmetic only, so any engine reproduces it bit-exactly.

    Scale shape (the ``percentile_by_group`` discipline): the ordered
    window runs over the per-(group, value) HISTOGRAM — one row per
    distinct value per group, not per input row — then one broadcast
    join of the tiny per-group cut table back onto the histogram. Two
    shuffles total (histogram groupBy + window re-sort), both on the
    group key; no per-row window, no collect.
    """
    from pyspark.sql.window import Window

    if not (0 <= lower_permille <= upper_permille <= 1000):
        raise ValueError("permilles must satisfy 0<=lo<=hi<=1000")
    hist = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        group_col,
        value_col,
        "_n",
        F.sum("_n").over(wcum).alias("_cum"),
        F.sum("_n").over(Window.partitionBy(group_col)).alias("_tot"),
    )
    # rank threshold: ceil(tot*p/1000) in integer domain; permille 0
    # degenerates to rank 1 (no lower clip), 1000 to rank tot.
    lo_rank = F.greatest(
        F.lit(1), F.expr(f"(_tot * {lower_permille} + 999) div 1000")
    )
    hi_rank = F.greatest(
        F.lit(1), F.expr(f"(_tot * {upper_permille} + 999) div 1000")
    )
    cuts = (
        cum.groupBy(group_col)
        .agg(
            F.min(
                F.when(F.col("_cum") >= lo_rank, F.col(value_col))
            ).alias("lo_cut"),
            F.min(
                F.when(F.col("_cum") >= hi_rank, F.col(value_col))
            ).alias("hi_cut"),
        )
    )
    clipped = cum.join(F.broadcast(cuts), group_col).select(
        group_col,
        "_n",
        F.col(value_col).alias("_v"),
        "lo_cut",
        "hi_cut",
        F.greatest(
            F.col("lo_cut"), F.least(F.col("hi_cut"), F.col(value_col))
        ).alias("_w"),
    )
    return (
        clipped.groupBy(group_col)
        .agg(
            F.sum("_n").cast("bigint").alias("n"),
            F.first("lo_cut").alias("lo_cut"),
            F.first("hi_cut").alias("hi_cut"),
            F.sum(F.when(F.col("_v") < F.col("lo_cut"), F.col("_n"))
                  .otherwise(0)).cast("bigint").alias("n_clipped_low"),
            F.sum(F.when(F.col("_v") > F.col("hi_cut"), F.col("_n"))
                  .otherwise(0)).cast("bigint").alias("n_clipped_high"),
            F.sum(F.col("_w") * F.col("_n")).alias("winsorized_sum"),
        )
    )


def gini_by_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative INTEGER value
    column (pass cents, tokens, counts — the caller quantizes) — the
    inequality audit behind concentration questions ("is revenue in
    this segment a few whales or a broad base?"). Returns (group, n,
    total, gini_numerator, gini) where gini_numerator =
    2·Σ rank_i·x_i − (n+1)·Σx is an EXACT BIGINT (the classic
    sorted-rank identity) and gini = numerator / (n·Σx) is the one
    closed-form float, ROUND(…, 6), computed with identical
    association in the oracle.

    Scale shape (the percentile_by_group discipline): Σ rank·x folds
    over the per-(group, value) HISTOGRAM — a run of c equal values
    starting after cumulative count p contributes
    x·(c·p + c·(c+1)/2) — so the ordered window sees one row per
    distinct value per group, never the corpus.
    """
    from pyspark.sql.window import Window

    hist = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        group_col,
        F.col(value_col).alias("_v"),
        "_c",
        (F.sum("_c").over(wcum) - F.col("_c")).alias("_p"),
    )
    # Σ rank·x for the bucket: v * (c*p + c*(c+1)/2)
    rank_mass = F.col("_v") * (
        F.col("_c") * F.col("_p")
        + F.expr("_c * (_c + 1) div 2")
    )
    agg = cum.groupBy(group_col).agg(
        F.sum("_c").cast("bigint").alias("n"),
        F.sum(F.col("_v") * F.col("_c")).cast("bigint").alias("total"),
        F.sum(rank_mass).cast("bigint").alias("_s"),
    )
    num = (
        F.lit(2) * F.col("_s")
        - (F.col("n") + 1) * F.col("total")
    )
    return agg.select(
        group_col,
        "n",
        "total",
        num.cast("bigint").alias("gini_numerator"),
        F.round(
            num.cast("double")
            / (F.col("n").cast("double") * F.col("total").cast("double")),
            6,
        ).alias("gini"),
    )


def sum_reconciliation(
    parent: DataFrame,
    child_sums: DataFrame,
    key_col: str,
    group_col: str,
    amount_col: str = "amount",
    calc_col: str = "calc",
    tolerance: str = "0.00",
) -> DataFrame:
    """Cross-table consistency audit — does a parent's stored total
    equal the recomputed sum of its children? The reconciliation every
    warehouse runs before trusting a denormalized column. ``parent``
    carries (key, group, amount), ``child_sums`` the recomputed
    (key, calc); both amounts must be DECIMAL (exact — a float
    reconciliation would report its own rounding as mismatches).

    Per group: (group, n_parents, n_no_children, n_match, n_mismatch,
    max_abs_diff_micros, sum_abs_diff_micros) — matches are |amount −
    calc| <= tolerance in exact decimal arithmetic; parents with no
    child rows are counted separately, never as silent matches. The
    diff extremes are BIGINT micro-units (|diff| × 1e6, exact for any
    decimal scale ≤ 6): a wide-DECIMAL output column (precision > 18)
    survives Spark's pandas round-trip as exact ``decimal.Decimal``
    but degrades to float64 in DuckDB's, so value-identical results
    hash differently (the HUGEINT hazard, CORRECTNESS_r09
    ``order_reconciliation``) — the house exact-integer form is the
    fix, not a symptom patch. Sums stay in-range below ~9.2e12
    aggregate currency units of drift; past that, reconcile per
    shard/group.

    Shape: one LEFT equi-join on the key + one groupBy — both keyed,
    map-side combinable aggregates; no window, no floats.
    """
    j = parent.select(
        F.col(key_col).alias("_k"),
        F.col(group_col).alias("_g"),
        F.col(amount_col).alias("_amt"),
    ).join(
        child_sums.select(
            F.col(key_col).alias("_k"), F.col(calc_col).alias("_calc")
        ),
        "_k",
        "left",
    )
    diff = F.abs(F.col("_amt") - F.col("_calc"))
    # exact BIGINT micro-units per row, BEFORE aggregation (the per-row
    # diff has bounded scale; the aggregate would widen to DECIMAL(38,s))
    diff_micros = (diff * F.lit(1000000)).cast("bigint")
    tol = F.lit(tolerance).cast("decimal(18,6)")
    has = F.col("_calc").isNotNull()
    return (
        j.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parents"),
            F.sum(F.when(~has, 1).otherwise(0))
            .cast("bigint")
            .alias("n_no_children"),
            F.sum(F.when(has & (diff <= tol), 1).otherwise(0))
            .cast("bigint")
            .alias("n_match"),
            F.sum(F.when(has & (diff > tol), 1).otherwise(0))
            .cast("bigint")
            .alias("n_mismatch"),
            F.max(F.when(has, diff_micros))
            .cast("bigint")
            .alias("max_abs_diff_micros"),
            F.sum(F.when(has, diff_micros))
            .cast("bigint")
            .alias("sum_abs_diff_micros"),
        )
    )


def fixed_bin_histogram(
    df: DataFrame, value_col: str, bin_width: float = 8.0
) -> DataFrame:
    """Fixed-width histogram: (bin, cnt) with bin = floor(value /
    bin_width) — the mergeable distribution summary (counts ADD, so
    per-partition/per-batch histograms union+sum to the global one,
    the property streaming.sketch.StreamingHistogram exploits). Use a
    power-of-two ``bin_width``: the IEEE division is then exact and
    the binning engine-reproducible. One map-side-combinable
    aggregation to range/bin_width rows; NULL values are dropped.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.floor(F.col(value_col) / F.lit(float(bin_width)))
            .cast("bigint")
            .alias("bin")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    mad_multiplier: int = 3,
) -> DataFrame:
    """Robust per-group outlier audit via median absolute deviation
    (Hampel 1974; the robust-statistics replacement for the z-score
    screen, whose mean/stddev are themselves dragged by the outliers
    being hunted — ``events.value_outliers`` is the classical
    counterpart). Per group: the exact lower median of the value, the
    exact lower median of |value − median| (the MAD), and how many rows
    sit more than ``mad_multiplier``·MAD from the median. Returns
    (group, n, median, mad, n_outliers, outlier_ppm).

    Exactness contract: medians are DISCRETE order statistics — the
    element at 1-based rank (n+1) div 2 under the total order
    (value, id) — never interpolated floats, so a SQL oracle reproduces
    them bit-for-bit on any dtype (use exact integer/decimal values;
    the ppm is one integer division). Deviations for the MAD pass are
    |value − median| with id tiebreak, same rule.

    Scale shape: two ranking passes (value, then deviation), each ONE
    window partitioned by group + a |groups|-row median frame broadcast
    back — groups are the natural parallelism key; a single dominant
    group funnels through one task, the documented window tradeoff
    (same as ``percentile_by_group``; decompose via the bucket-cumsum
    shape if one group ever holds most of the data). No collect, no
    global sort.
    """
    from pyspark.sql.window import Window

    g = F.col(group_col).alias("_g")
    base = df.select(
        g, F.col(value_col).alias("_v"), F.col(id_col).alias("_id")
    )

    def _group_median(frame: DataFrame, vcol: str) -> DataFrame:
        w = Window.partitionBy("_g").orderBy(vcol, "_id")
        n = Window.partitionBy("_g")
        ranked = frame.select(
            "_g",
            F.col(vcol),
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(n).alias("_n"),
        )
        return ranked.where(
            F.col("_rn") == F.expr("(_n + 1) div 2")
        ).select(
            "_g", F.col(vcol).alias("_med"), F.col("_n").alias("_gn")
        )
    # the median frames are |groups|-row; localCheckpoint them so each
    # downstream reuse reads the tiny result instead of re-evaluating
    # the full ranked lineage (uncheckpointed, the input was scanned
    # 14 times; checkpointed, 3 — once per pass)
    med = (
        _group_median(base, "_v")
        .select("_g", "_med", "_gn")
        .localCheckpoint(eager=True)
    )
    dev = base.join(F.broadcast(med.select("_g", "_med")), "_g").select(
        "_g", F.abs(F.col("_v") - F.col("_med")).alias("_d"), "_id"
    )
    mad = (
        _group_median(dev.withColumnRenamed("_d", "_v"), "_v")
        .select("_g", F.col("_med").alias("_mad"))
        .localCheckpoint(eager=True)
    )
    stats = med.join(mad, "_g")
    flagged = (
        base.join(F.broadcast(stats), "_g")
        .groupBy("_g")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("_v") - F.col("_med"))
                    > F.lit(int(mad_multiplier)) * F.col("_mad"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("_nout")
        )
    )
    return (
        stats.join(flagged, "_g")
        .select(
            F.col("_g").alias(group_col),
            F.col("_gn").cast("bigint").alias("n"),
            F.col("_med").alias("median"),
            F.col("_mad").alias("mad"),
            F.col("_nout").alias("n_outliers"),
            F.expr("_nout * 1000000 div _gn")
            .cast("bigint")
            .alias("outlier_ppm"),
        )
    )


# Benford expected first-digit shares in exact ppm: round(1e6 *
# log10(1 + 1/d)) for d = 1..9. Baked integer literals (sum 1_000_002;
# the 2-ppm rounding surplus is part of the fixed contract) so Spark
# and the SQL oracle share the SAME constants — no log10 in any plan.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_deviation(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Benford first-digit conformity audit (Benford 1938; Nigrini's
    forensic-accounting screen): per group, the observed first-digit
    distribution of a positive numeric column vs the Benford
    expectation, summarized as one exact integer distance —
    tvd_ppm = ½ Σ_d |observed_ppm(d) − benford_ppm(d)| — plus the most
    over-represented digit. Fabricated or capped amounts drift from
    Benford; a high tvd_ppm flags the group for inspection. Returns
    (group, n, tvd_ppm, worst_digit, worst_excess_ppm).

    Exactness: the first digit comes from the value's string form
    (positive integers only — cast/scale upstream, e.g. cents), the
    per-digit shares are integer ppm divisions, and the expectation is
    the BAKED ``BENFORD_PPM`` table — identical literals in the SQL
    oracle, no transcendental anywhere. Rows with value <= 0 are
    excluded (Benford is undefined there), counted via ``n``.

    Scale shape: ONE map-side-combinable groupBy to |groups|·9 rows,
    then a 9-entry literal map join folded as a pure expression —
    no window, no second scan, nothing data-sized after the agg.
    """
    bexpr = "CASE _digit " + " ".join(
        f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()
    ) + " END"
    # filter on the CAST value: a raw `value > 0` test lets fractional
    # values in (0,1) survive, cast to bigint 0, and mint a first digit
    # '0' that inflates n yet never lands on the 1-9 grid — the
    # positive-integer contract must be self-enforcing
    _v = F.col(value_col).cast("bigint")
    digits = df.where(_v > 0).select(
        F.col(group_col).alias("_g"),
        F.substring(_v.cast("string"), 1, 1).cast("int").alias("_digit"),
    )
    # |groups|x9 rows — localCheckpoint so the four downstream
    # references (totals, scored, grid join) read the tiny result
    # instead of re-scanning the input per reference
    per_digit = digits.groupBy("_g", "_digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    ).localCheckpoint(eager=True)
    totals = per_digit.groupBy("_g").agg(
        F.sum("_c").cast("bigint").alias("_n")
    )
    scored = (
        per_digit.join(F.broadcast(totals), "_g")
        .select(
            "_g",
            "_digit",
            (F.expr("_c * 1000000 div _n") - F.expr(bexpr))
            .cast("bigint")
            .alias("_diff"),
        )
    )
    # digits absent from a group contribute their full benford_ppm to
    # the TVD; add them via the 9-row literal grid so no digit is
    # silently dropped
    spark = df.sparkSession
    grid = spark.createDataFrame(
        [(d,) for d in BENFORD_PPM], "_digit int"
    )
    full = (
        totals.crossJoin(F.broadcast(grid))
        .join(scored, ["_g", "_digit"], "left")
        .select(
            "_g",
            "_digit",
            "_n",
            F.coalesce(
                F.col("_diff"), -F.expr(bexpr).cast("bigint")
            ).alias("_diff"),
        )
    )
    return (
        full.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.first("_n").alias("n"),
            F.sum(F.abs(F.col("_diff"))).cast("bigint").alias("_tvd2"),
            F.max(F.struct(F.col("_diff"), F.col("_digit"))).alias("_w"),
        )
        .select(
            group_col,
            "n",
            # integer div, not /2.0: an odd |diff| sum must floor the
            # same way in both engines
            F.expr("_tvd2 div 2").cast("bigint").alias("tvd_ppm"),
            F.col("_w._digit").cast("int").alias("worst_digit"),
            F.col("_w._diff").cast("bigint").alias("worst_excess_ppm"),
        )
    )
