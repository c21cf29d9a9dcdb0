"""Windowed aggregation over the event stream (SURVEY.md §2.9).

These operators are written against a *batch or streaming* events DataFrame
(event_id, ts TIMESTAMP, user_id, event_type, value DOUBLE, props JSON
string) — the same expressions run under Structured Streaming by swapping
``spark.read`` for ``spark.readStream`` and adding ``with_watermark``;
the batch form is what the DuckDB oracle checks.

Money-style sums go through DECIMAL so results are order-independent and
hash-stable (float addition is not associative; a shuffled parallel sum of
doubles differs run-to-run in the last ulp — exact decimal arithmetic
removes the flake at equal cost here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,2)"


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Late-data bound for streaming use (no-op semantics on batch frames
    other than marking the column)."""
    return events.withWatermark("ts", delay)


def _win_agg(df: DataFrame, win, extra_keys: list[str]):
    return (
        df.groupBy(win.alias("w"), *extra_keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            *extra_keys,
            "n_events",
            "sum_value",
        )
    )


def tumbling(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type:
    (window_start, event_type, n_events, sum_value)."""
    return _win_agg(events, F.window("ts", duration), ["event_type"])


def sliding(
    events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window counts/sums per event_type; each event lands in
    duration/slide windows."""
    return _win_agg(events, F.window("ts", duration, slide), ["event_type"])


def session(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user (gap-based): (user_id, session_start,
    n_events, sum_value). A session extends while consecutive events are
    within ``gap``; equivalent to the classic gaps-and-islands SQL."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )


def json_prop(events: DataFrame, key: str = "k") -> DataFrame:
    """Extract a typed value from the JSON props column — the multimodal/
    dynamic-props pattern on the event fixture: (event_id, <key> BIGINT)."""
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), f"$.{key}")
        .try_cast("bigint")
        .alias(key),
    )


def type_value_stats(events: DataFrame) -> DataFrame:
    """Per-type global stats (n, exact sum, min/max) — hash-stable."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def hierarchical_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style multi-granularity continuous aggregate: one frame
    with minute, hour, and day buckets — (grain, bucket_start, n_events,
    sum_value).

    The scale shape: raw events are aggregated ONCE at the finest grain;
    each coarser grain re-aggregates the next-finer PARTIALS (decimal
    partial sums compose exactly), so a 100 TB event table is scanned a
    single time instead of once per grain, and the coarser rollups run
    over frames that are orders of magnitude smaller. This is exactly how
    a timeseries store maintains continuous-aggregate hierarchies.
    """
    minute = events.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).alias("_sum"),
    )
    # materialize the finest grain once: without this, Catalyst inlines
    # the minute aggregation into ALL three union branches and the raw
    # table is scanned per grain — explain() showed no ReusedExchange.
    # Lazy checkpoint = computed on first action, shared by every branch.
    minute = minute.localCheckpoint(eager=False)
    hour = minute.groupBy(
        F.date_trunc("hour", F.col("bucket_start")).alias("bucket_start")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("_sum").cast(_DEC).alias("_sum"),
    )
    day = hour.groupBy(
        F.date_trunc("day", F.col("bucket_start")).alias("bucket_start")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("_sum").cast(_DEC).alias("_sum"),
    )

    def _fin(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "n_events",
            F.col("_sum").cast("double").alias("sum_value"),
        )

    return (
        _fin(minute, "minute")
        .unionByName(_fin(hour, "hour"))
        .unionByName(_fin(day, "day"))
    )


def value_outliers(events: DataFrame, z: float = 3.0) -> DataFrame:
    """Per-type z-score outliers: events whose value deviates more than
    ``z`` sample standard deviations from their type's mean.

    The moments are derived from EXACT decimal component sums (count,
    sum, sum of squares) rather than a streaming float stddev — decimal
    addition is order-independent, so mean/variance (and therefore the
    outlier SET) are identical across engines and shuffle orders; the
    only floating-point steps are the final divisions and one sqrt.
    One aggregation + one broadcast join back onto the events — two
    passes over the (pruned) scan, no window sort.
    """
    # (19,6) values: the squared product is exactly (38,12) — inside
    # both engines' 38-digit cap, so no engine-specific precision
    # reduction ever rounds it
    v6 = F.col("value").cast("decimal(19,6)")
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v6).alias("_s"),
        F.sum((v6 * v6).cast("decimal(38,12)")).alias("_ss"),
    )
    mean = (F.col("_s").cast("double") / F.col("_n")).alias("_mean")
    # sample variance: (ss - s^2/n) / (n - 1), from exact components
    var = (
        (
            F.col("_ss").cast("double")
            - F.col("_s").cast("double")
            * F.col("_s").cast("double")
            / F.col("_n")
        )
        / (F.col("_n") - 1)
    ).alias("_var")
    enriched = events.join(
        F.broadcast(
            stats.where(F.col("_n") > 1)
            .select("event_type", mean, var)
            # zero-variance groups: Spark's 0/0 yields NULL (rows drop)
            # while IEEE engines yield ±inf (rows keep) — exclude the
            # degenerate group explicitly so every engine agrees.
            .where(F.col("_var") > 0)
        ),
        "event_type",
    )
    zscore = (F.col("value") - F.col("_mean")) / F.sqrt(F.col("_var"))
    return enriched.select(
        "event_id",
        "event_type",
        "value",
        zscore.alias("zscore"),
    ).where(F.abs(F.col("zscore")) > z)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted per weeks-since-cohort offset — the (cohort_week,
    week_offset, n_users) retention triangle every growth/engagement
    pipeline reports.

    Two aggregations plus the cohort join, ALL shuffled on user id — the
    cohort frame is one row PER USER (unbounded), so it is never
    broadcast; Catalyst reuses the user_id hash partitioning across the
    distinct, the cohort agg, and the join, and AQE may still pick a
    broadcast at small actual sizes. At 100 TB the distinct-per-week
    step is the cost driver and prunes to (user, week) pairs before the
    shuffle. Weeks are date_trunc boundaries (Monday-start),
    engine-portable.
    """
    cohort = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.date_trunc("week", F.min(ts_col)).alias("_cohort")
    )
    active = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.date_trunc("week", F.col(ts_col)).alias("_week"),
        )
        .distinct()
    )
    j = active.join(cohort, "user_id")
    return (
        j.groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("_week"), F.col("_cohort")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order behavioral transition counts: for each user's
    time-ordered event sequence (ties broken by event_id — total order,
    engine-portable), count consecutive (from_type, to_type) pairs
    across all users — the Markov-chain view of the event stream.

    One window lag per user partition (the sort is per-user, never
    global) + one small aggregation; at 100 TB the user partitioning is
    the natural key and AQE handles power-user skew.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    nxt = F.lead(type_col).over(w)
    return (
        events.select(
            F.col(type_col).alias("from_type"), nxt.alias("to_type")
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands sessionization with ORDINAL session numbers:
    assigns each user's events to sessions (a new session starts when
    the gap to the previous event exceeds ``gap_minutes``) and returns
    one row per session — (user_id, session_seq, n_events, start_ts,
    end_ts, duration_sec) with session_seq = 1 for the user's first
    session. :func:`session` (session_window) aggregates the same
    islands but cannot say WHICH session a row was — the ordinal is
    what session-ordered analyses (first-session conversion, returning
    behavior) need.

    Two windows partitioned by ``user_col`` ordered by (ts, event_id)
    — a deterministic total order even with timestamp ties — one LAG to
    flag boundaries, one running SUM to number them; then a single
    groupBy. All arithmetic is integer epoch seconds, so a SQL oracle
    reproduces it exactly. Scale: per-user partitions; a window never
    sees more than one user's events, and the per-session output is
    strictly smaller than the input.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ep = F.unix_timestamp(F.col(ts_col))
    flagged = events.select(
        user_col,
        ts_col,
        id_col,
        F.when(
            ep - F.lag(ep).over(w) > gap_minutes * 60, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    )
    numbered = flagged.select(
        user_col,
        ts_col,
        (F.sum("_new").over(w) + 1).alias("session_seq"),
    )
    return (
        numbered.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
        .withColumn(
            "duration_sec",
            (
                F.unix_timestamp("end_ts") - F.unix_timestamp("start_ts")
            ).cast("bigint"),
        )
    )


def rate_features(
    events: DataFrame,
    window_seconds: int = 3600,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event rolling rate features for ML on event streams: how many
    of the SAME key's events landed in the preceding ``window_seconds``
    (exclusive of the event itself and its exact timestamp — a RANGE
    frame on epoch micros), and the gap to the key's previous event.
    Returns the input plus ``n_prev``, ``gap_us`` (NULL for a key's
    first event).

    Exactness: the frame bound is integer microseconds, the count an
    integer, the gap a BIGINT difference — no floats anywhere, so any
    engine reproduces the values. Scale shape: ONE shuffle on the key;
    both window functions share the same (key, epoch) ordering, and the
    partition is one key's events — bounded by per-key activity, never
    corpus size (the per-user skew knob is the key choice itself).
    """
    e = F.unix_micros(F.col(ts_col))
    from pyspark.sql import Window

    gc = list(key_cols)
    wr = (
        Window.partitionBy(*gc)
        .orderBy(e)
        .rangeBetween(-window_seconds * 1_000_000, -1)
    )
    wl = Window.partitionBy(*gc).orderBy(e, F.col(id_col))
    return (
        events.withColumn("_e", e)
        .withColumn(
            "n_prev", F.count(F.lit(1)).over(wr).cast("bigint")
        )
        .withColumn(
            "gap_us", (F.col("_e") - F.lag("_e").over(wl)).cast("bigint")
        )
        .drop("_e")
    )


def _prefix_count(
    points: DataFrame,
    curve: DataFrame,
    ts_col: str,
    by_cols: tuple[str, ...],
    strict: bool,
    out: str,
) -> DataFrame:
    """Annotate every ``points`` row with the number of ``curve`` rows of
    the same key at an earlier timestamp (``strict=True``: ts strictly
    less; ``strict=False``: ts less-or-equal) — the prefix-count analogue
    of the as-of union-merge (functions/asof.py): union both sides, one
    running SUM over one (key, ts) sort, ONE shuffle total. At equal
    timestamps the point row sorts before (strict) or after (non-strict)
    the curve rows, which is what makes the bound exact rather than
    tie-lucky."""
    from pyspark.sql import Window

    by = list(by_cols)
    c = curve.select(
        *by, F.col(ts_col), F.lit(1).alias("_curve"),
        F.lit(1 if strict else 0).alias("_ord"),
    )
    extra = [x for x in points.columns if x not in by and x != ts_col]
    for col in extra:
        c = c.withColumn(col, F.lit(None).cast(dict(points.dtypes)[col]))
    p = points.select(
        *by, F.col(ts_col), F.lit(0).alias("_curve"),
        F.lit(0 if strict else 1).alias("_ord"), *extra,
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_col, "_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        p.unionByName(c.select(*p.columns))
        .withColumn(out, F.sum("_curve").over(w).cast("bigint"))
        .where(F.col("_curve") == 0)
        .withColumn(out, F.coalesce(F.col(out), F.lit(0)))
        .drop("_curve", "_ord")
    )


def ordered_triples(
    events: DataFrame,
    stages: tuple[str, str, str] = ("click", "view", "purchase"),
    window_seconds: int = 3600,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Temporal ordered-motif counting: per key, the number of
    (s1, s2, s3) event triples with strictly increasing timestamps whose
    total span fits the window — ``ts1 < ts2 < ts3`` and
    ``ts3 - ts1 < window_seconds``. The temporal-network motif census
    primitive (Paranjape et al., WSDM'17) for the canonical
    click→view→purchase attribution triple.

    NOT the cubic join it names: the count decomposes as
    Σ over (s2, s3) pairs in-window of (#s1 before s2) − (#s1 at-or-before
    s3 − window), i.e. two prefix counts off the SAME s1 curve (one
    union-merge shuffle each) plus ONE bucketed interval join pairing s2
    with s3 (functions/rangejoin.py shape). Each piece is integer-exact
    and one-shuffle; nothing enumerates triples, so a hot key costs its
    (s2, s3) pair volume, never its triple volume.

    Returns (key_cols..., n_triples), keys with ≥1 triple only.
    """
    from akka_graph_db_spark.functions.rangejoin import range_join_buckets

    by = list(key_cols)
    s1 = events.where(F.col("event_type") == stages[0]).select(
        *by, ts_col
    )
    s2 = events.where(F.col("event_type") == stages[1]).select(
        *by, F.col(ts_col)
    )
    s3 = events.where(F.col("event_type") == stages[2]).select(
        *by,
        F.col(ts_col).alias("_ts3"),
        (F.col(ts_col) - F.expr(f"INTERVAL {int(window_seconds)} SECONDS"))
        .alias("_lo"),
    )
    # A(s2) = #s1 strictly before the s2 event
    a = _prefix_count(s2, s1, ts_col, tuple(by), strict=True, out="_a")
    # B(s3) = #s1 at or before (ts3 - window)  [probe at the shifted ts]
    b3 = _prefix_count(
        s3.select(*by, F.col("_lo").alias(ts_col), "_ts3"),
        s1, ts_col, tuple(by), strict=False, out="_b",
    ).select(*by, F.col(ts_col).alias("_lo"), "_ts3", "_b")
    # pair s2 with s3 when ts2 ∈ (ts3 - window, ts3): bucketed equi-join,
    # then tighten the helper's closed lower bound to strict
    pairs = range_join_buckets(
        a, b3, by, ts_col, "_lo", "_ts3", bucket_seconds=window_seconds
    ).where(F.col(ts_col) > F.col("_lo"))
    # clicks counted for a pair: strictly after ts3 - window AND strictly
    # before ts2 — A - B, non-negative by construction (ts2 > ts3 - window)
    return (
        pairs.select(*by, (F.col("_a") - F.col("_b")).alias("_n"))
        .groupBy(*by)
        .agg(F.sum("_n").cast("bigint").alias("n_triples"))
        .where(F.col("n_triples") > 0)
    )


def concurrent_sessions(
    events: DataFrame,
    gap_minutes: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Peak session concurrency per hour — the load-profile question
    ("how many sessions were open at once?") answered by a sweep line
    over session boundaries: each session from :func:`sessionize`
    contributes (+1 at start, -1 at end), and the running sum of deltas
    in global time order is the number of open sessions after each
    boundary. Returns (hour_start, max_active, n_boundaries) for every
    hour that contains at least one boundary.

    A global ordered running sum is not windowable at scale; the exact
    decomposition (same shape as vocab_growth's bucket cumsum): deltas
    aggregate per hour bucket (map-side combinable), the cumulative
    offset runs over the HOUR-level frame (n_hours rows — bounded,
    tiny), and the within-hour running sum is a window over one hour's
    boundaries only. Tie order is total and engine-independent:
    (epoch, delta, user, session) — ends (-1) sort before starts (+1)
    at the same instant, so a back-to-back session pair never counts
    as overlapping. All arithmetic is integer epoch seconds.
    """
    from pyspark.sql.window import Window

    s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    start = s.select(
        F.unix_timestamp("start_ts").alias("t"),
        F.lit(1).alias("delta"),
        F.col(user_col).alias("u"),
        "session_seq",
    )
    end = s.select(
        F.unix_timestamp("end_ts").alias("t"),
        F.lit(-1).alias("delta"),
        F.col(user_col).alias("u"),
        "session_seq",
    )
    pts = start.unionByName(end).withColumn(
        "bucket", F.expr("t DIV 3600")
    )
    per_hour = pts.groupBy("bucket").agg(
        F.sum("delta").alias("_hour_delta")
    )
    w_hour = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_hour.select(
        "bucket",
        F.coalesce(F.sum("_hour_delta").over(w_hour), F.lit(0)).alias(
            "_offset"
        ),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("t", "delta", "u", "session_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    active = pts.withColumn("_run", F.sum("delta").over(w_in)).join(
        F.broadcast(offsets), "bucket"
    )
    return (
        active.groupBy("bucket")
        .agg(
            F.max(F.col("_offset") + F.col("_run"))
            .cast("bigint")
            .alias("max_active"),
            F.count(F.lit(1)).alias("n_boundaries"),
        )
        .select(
            F.timestamp_seconds(F.col("bucket") * 3600).alias("hour_start"),
            "max_active",
            "n_boundaries",
        )
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 10,
    top: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Top event-type TRIGRAM paths within sessions — the sequence-
    mining counterpart of :func:`event_transitions` (bigrams over whole
    user histories): re-derives the gaps-and-islands session ordinal,
    then two LEADs within (user, session) in (ts, event_id) order give
    each 3-step path, counted corpus-wide. Returns the ``top`` paths as
    (t0, t1, t2, n_paths), ties broken lexicographically.

    Scale: both windows partition by user (then user+session) — no
    global ordering; the path alphabet is |event_type|^3, so the count
    agg is map-side combinable into a tiny frame before the top-k sort.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ep = F.unix_timestamp(F.col(ts_col))
    numbered = events.select(
        user_col,
        ts_col,
        id_col,
        "event_type",
        F.sum(
            F.when(
                ep - F.lag(ep).over(w) > gap_minutes * 60, F.lit(1)
            ).otherwise(F.lit(0))
        )
        .over(w)
        .alias("_sess"),
    )
    w_s = Window.partitionBy(user_col, "_sess").orderBy(ts_col, id_col)
    tri = numbered.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w_s).alias("t1"),
        F.lead("event_type", 2).over(w_s).alias("t2"),
    ).where(F.col("t2").isNotNull())
    return (
        tri.groupBy("t0", "t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "t0", "t1", "t2")
        .limit(top)
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing-window active-user counts (rolling WAU): for every day
    with activity, the count of DISTINCT users active in the trailing
    ``window_days`` days ending that day — the engagement metric whose
    windowed COUNT(DISTINCT) is famously NOT decomposable (a user
    active twice in the window counts once, so per-day counts can't
    sum). Returns (day, active_users) ordered by day.

    Scale shape: the corpus first collapses to the DISTINCT (user, day)
    frame — one map-side-combinable aggregation, bounded by
    users x active-days, orders of magnitude below the event count —
    then the day spine (a calendar: hundreds of rows for years of data)
    BROADCASTS into a range join against it. The nested-loop side is
    the bounded calendar, so the "non-equi join" is really one
    broadcast probe per user-day row; the final per-day distinct agg is
    over user-days x window_days rows at most. No corpus-sized window,
    no self-join of raw events.
    """
    ud = (
        events.select(
            F.to_date(F.col(ts_col)).alias("_day"),
            F.col(user_col).alias("_user"),
        )
        .distinct()
    )
    days = ud.select(F.col("_day").alias("day")).distinct()
    joined = ud.join(
        F.broadcast(days),
        (F.col("_day") <= F.col("day"))
        & (F.col("_day") >= F.date_sub(F.col("day"), window_days - 1)),
    )
    return (
        joined.groupBy("day")
        .agg(F.countDistinct("_user").alias("active_users"))
        .orderBy("day")
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from an event log: per
    key, collapse consecutive runs of the same ``attr_col`` value into
    validity intervals [valid_from, valid_to), the last interval open
    (valid_to NULL, is_current true) — the warehouse primitive that
    turns a change log into an as-of-joinable dimension table.

    Two windows, both partitioned by the key in the (ts, id) total
    order — run starts are rows whose attr differs from its lag (or
    the first row), valid_to is the NEXT run start's valid_from. No
    global window, no self-join: cost is two per-key sorts over the
    change log, output bounded by the number of VALUE CHANGES, not
    events (the run-length-encoding shape of gaps-and-islands).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    marked = events.select(
        key_col,
        F.col(attr_col).alias("attr"),
        ts_col,
        id_col,
        (
            F.lag(attr_col).over(w).isNull()
            | (F.lag(attr_col).over(w) != F.col(attr_col))
        ).alias("_start"),
    ).where(F.col("_start"))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    return marked.select(
        key_col,
        "attr",
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def time_weighted_value(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user time-weighted value integral: Σ value_i · Δt_i where
    Δt_i is the seconds until the user's NEXT event (the last event
    contributes nothing) — the step-function integral behind
    time-weighted averages of sensor readings / balances / rates.
    Returns (user, twv_seconds, span_seconds, tw_avg, n_events).

    Exactness: values are 2-decimal fixture doubles, so
    CAST(value AS DECIMAL(18,2)) is lossless; Δt is BIGINT seconds cast
    to DECIMAL(10,0), the product and sum stay exact decimals on both
    engines (no IEEE accumulation order anywhere), and only the final
    published twv/avg leave decimal (the type_value_stats discipline).
    One per-user window + one groupBy — no global ordering.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ep = F.unix_timestamp(F.col(ts_col))
    stepped = events.select(
        user_col,
        ep.alias("_ep"),
        (F.lead(ep).over(w) - ep).alias("_dt"),
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
    )
    return (
        stepped.groupBy(user_col)
        .agg(
            F.sum(
                F.col("_v") * F.col("_dt").cast("decimal(10,0)")
            ).cast("double").alias("twv_seconds"),
            (F.max("_ep") - F.min("_ep")).cast("bigint").alias(
                "span_seconds"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            user_col,
            F.coalesce("twv_seconds", F.lit(0.0)).alias("twv_seconds"),
            "span_seconds",
            # span = 0 (single-event user) has no elapsed time to
            # average over: NULL, guarded explicitly — Spark 4 ANSI
            # mode raises on division by zero.
            F.when(
                F.col("span_seconds") > 0,
                F.round(
                    F.coalesce("twv_seconds", F.lit(0.0))
                    / F.col("span_seconds"),
                    6,
                ),
            ).alias("tw_avg"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


def event_bursts(
    events: DataFrame,
    k_mad: int = 3,
    top: int = 20,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Temporal burst detection per event type: hours whose event count
    exceeds the type's median hourly count by more than ``k_mad`` x the
    median absolute deviation — the robust (hub-immune) version of the
    z-score spike flag, computed entirely in exact integers. Returns
    the top ``top`` bursts by (excess desc, type, hour) as
    (event_type, hour, n_events, median_n, mad_n, excess).

    Both medians are integer-rank LOWER medians taken off the per-type
    COUNT HISTOGRAM (one row per distinct hourly count per type) — the
    degree_anomalies discipline applied to time buckets: the only
    ordered windows run over that tiny histogram, partitioned by type,
    and the hourly frame itself is a map-side-combinable groupBy of the
    corpus. No global window, no floats.
    """
    from pyspark.sql.window import Window

    hourly = events.groupBy(
        type_col, F.date_trunc("hour", F.col(ts_col)).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    hist = hourly.groupBy(type_col, "n_events").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = hist.groupBy(type_col).agg(F.sum("cnt").alias("_tot"))
    wc = (
        Window.partitionBy(type_col)
        .orderBy("n_events")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    med = (
        hist.select(
            type_col, "n_events", F.sum("cnt").over(wc).alias("_cum")
        )
        .join(tot, type_col)
        .where(F.col("_cum") >= F.expr("(_tot + 1) div 2"))
        .groupBy(type_col)
        .agg(F.min("n_events").alias("median_n"))
    )
    devh = (
        hist.join(med, type_col)
        .groupBy(
            type_col,
            F.abs(F.col("n_events") - F.col("median_n")).alias("dev"),
        )
        .agg(F.sum("cnt").alias("cnt"))
    )
    wd = (
        Window.partitionBy(type_col)
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mad = (
        devh.select(
            type_col, "dev", F.sum("cnt").over(wd).alias("_cum")
        )
        .join(tot, type_col)
        .where(F.col("_cum") >= F.expr("(_tot + 1) div 2"))
        .groupBy(type_col)
        .agg(F.min("dev").alias("mad_n"))
    )
    return (
        hourly.join(F.broadcast(med), type_col)
        .join(F.broadcast(mad), type_col)
        .withColumn(
            "excess",
            F.col("n_events")
            - (F.col("median_n") + F.lit(k_mad) * F.col("mad_n")),
        )
        .where(F.col("excess") > 0)
        .orderBy(F.col("excess").desc(), type_col, "hour")
        .limit(top)
        .select(
            type_col,
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n_events",
            "median_n",
            "mad_n",
            "excess",
        )
    )


def frequent_triples(
    baskets: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    top: int = 20,
) -> DataFrame:
    """Frequent 3-itemsets (Apriori): item triples a < b < c co-occurring
    in >= ``min_support`` baskets, top ``top`` by (support desc, a, b,
    c). The candidate triple join is PRUNED by the frequent-PAIR set
    first — the Apriori monotonicity step (a triple can't be frequent
    if any of its pairs isn't), which is LOSSLESS for the result while
    cutting the within-basket triple explosion to items that survive
    the pair threshold. Per-basket volume is C(|basket ∩ frequent
    items|, 3); on heavy-tailed baskets the pair prune is what keeps
    that binomial term bounded.

    Shape: one distinct, one pair count, one pair semi-join, one
    3-way within-basket equi-join + count — all equi-keyed on the
    basket id, no cross joins; exact BIGINT support.
    """
    b = baskets.select(
        F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
    ).distinct()
    pa = b.select("_bk", F.col("_it").alias("a"))
    pb = b.select("_bk", F.col("_it").alias("b"))
    pc = b.select("_bk", F.col("_it").alias("c"))
    freq_pairs = (
        pa.join(pb, "_bk")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_support)
        .select("a", "b")
    )
    # Apriori prune: only (a,b) pairs that are themselves frequent may
    # extend to a candidate triple (lossless by support monotonicity).
    ab = (
        pa.join(pb, "_bk")
        .where(F.col("a") < F.col("b"))
        .join(freq_pairs, ["a", "b"], "left_semi")
    )
    triples = (
        ab.join(pc, "_bk")
        .where(F.col("b") < F.col("c"))
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= min_support)
    )
    return triples.orderBy(
        F.col("support").desc(), "a", "b", "c"
    ).limit(top)


def interval_coverage(
    events: DataFrame,
    window_minutes: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user covered time: expand each event to the interval
    [ts, ts + window_minutes) and measure the LENGTH OF THE UNION of
    those intervals (overlaps merged, gaps excluded) — the active-time
    metric naive sum-of-durations overcounts whenever activity
    clusters. Returns (user, covered_seconds, n_islands, n_events).

    Classic gaps-and-islands interval merge: within each user's
    (ts, id) order, an island starts where the interval begins after
    the running MAX of all previous interval ends; islands sum their
    (max end − min start) exactly in integer seconds. Two per-user
    windows sharing one partitioning — no self-join, no global sort.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ep = F.unix_timestamp(F.col(ts_col))
    iv = events.select(
        user_col,
        ts_col,
        id_col,
        ep.alias("_s"),
        (ep + window_minutes * 60).alias("_e"),
    )
    marked = iv.select(
        user_col,
        ts_col,
        id_col,
        "_s",
        "_e",
        F.when(
            F.max("_e").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            )
            >= F.col("_s"),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("_new_island"),
    )
    islands = marked.select(
        user_col,
        "_s",
        "_e",
        F.sum("_new_island").over(w).alias("_isl"),
    )
    per_island = islands.groupBy(user_col, "_isl").agg(
        (F.max("_e") - F.min("_s")).alias("_len")
    )
    return (
        per_island.groupBy(user_col)
        .agg(
            F.sum("_len").cast("bigint").alias("covered_seconds"),
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        )
        .join(
            events.groupBy(user_col).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events")
            ),
            user_col,
        )
    )


def event_trends(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-type activity trend: the least-squares slope SIGN of daily
    event counts against the day index, computed as the EXACT INTEGER
    numerator n·Σxy − Σx·Σy (x = days since epoch, y = daily count —
    the regression-slope numerator, whose denominator n·Σx² − (Σx)² is
    positive, so the numerator alone carries the sign). Returns
    (event_type, n_days, slope_num, trend 'rising'|'falling'|'flat',
    slope rounded to 6 dp) — drift detection with zero float
    accumulation: every sum is a BIGINT, only the published slope
    divides.

    One daily groupBy + one per-type aggregation — map-side
    combinable, no window, no join.
    """
    daily = events.groupBy(
        type_col,
        F.datediff(
            F.to_date(F.col(ts_col)), F.lit("1970-01-01")
        ).alias("_x"),
    ).agg(F.count(F.lit(1)).alias("_y"))
    agg = daily.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("_x").cast("bigint").alias("_sx"),
        F.sum("_y").cast("bigint").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("bigint").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("bigint").alias("_sxx"),
    )
    num = F.col("n_days") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n_days") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return agg.select(
        type_col,
        "n_days",
        num.cast("bigint").alias("slope_num"),
        F.when(num > 0, F.lit("rising"))
        .when(num < 0, F.lit("falling"))
        .otherwise(F.lit("flat"))
        .alias("trend"),
        F.when(
            den > 0,
            F.round(
                num.cast("double") / den.cast("double"), 6
            ),
        ).alias("slope"),
    )


def interarrival_quantiles(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    group_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Per-group inter-arrival-gap distribution: for each entity
    (``key_col``) the gaps between consecutive timestamps (whole days),
    then per ``group_col`` the exact type-1 median and p90 of those
    gaps — (group, n_gaps, min_gap_days, median_gap_days, p90_gap_days,
    max_gap_days). The purchase-cadence / churn-signal primitive:
    "how often does a BUILDING-segment customer reorder?".

    Exactness: gaps are integer datediffs; the quantile at permille p is
    the smallest gap whose cumulative count reaches ceil(n*p/1000) —
    all integer arithmetic, engine-reproducible.

    Scale shape: one window partitioned by entity (lag), one groupBy to
    the per-(group, gap) HISTOGRAM, then the ordered quantile window
    runs over histogram rows (one per distinct gap length per group),
    not per gap. Ties in ``ts`` are broken by ``order_col`` (defaults
    to ``key_col``'s row identity being irrelevant: equal timestamps
    yield zero-day gaps regardless of order, so any tiebreak gives the
    same gap multiset).
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col)] + (
        [F.col(order_col)] if order_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    gaps = (
        df.select(
            group_col,
            key_col,
            F.datediff(
                F.col(ts_col), F.lag(ts_col).over(w)
            ).alias("_gap"),
        )
        .where(F.col("_gap").isNotNull())
    )
    hist = gaps.groupBy(group_col, "_gap").agg(
        F.count(F.lit(1)).alias("_n")
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy("_gap")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        group_col,
        "_gap",
        F.sum("_n").over(wcum).alias("_cum"),
        F.sum("_n").over(Window.partitionBy(group_col)).alias("_tot"),
    )
    med_rank = F.expr("(_tot * 500 + 999) div 1000")
    p90_rank = F.expr("(_tot * 900 + 999) div 1000")
    return (
        cum.groupBy(group_col)
        .agg(
            F.max("_tot").cast("bigint").alias("n_gaps"),
            F.min("_gap").cast("bigint").alias("min_gap_days"),
            F.min(
                F.when(F.col("_cum") >= med_rank, F.col("_gap"))
            ).cast("bigint").alias("median_gap_days"),
            F.min(
                F.when(F.col("_cum") >= p90_rank, F.col("_gap"))
            ).cast("bigint").alias("p90_gap_days"),
            F.max("_gap").cast("bigint").alias("max_gap_days"),
        )
    )


def cusum_changepoints(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Single changepoint detection per group via the max-CUSUM
    statistic (Page 1954; the at-most-one-change mean-shift screen):
    for the time-ordered value sequence, the split index k maximizing
    |n·S_k − k·S_n| — the common-denominator form of
    |S_k − (k/n)·S_n|, i.e. how far the prefix sum strays from the
    no-change diagonal — in EXACT integers (values floored to
    micro-units), so the pick is engine-reproducible. Returns
    (group, n, change_index, change_ts, deviation) — deviation is the
    scaled statistic n·|S_k − k/n·S_n| in micro-units; ties break on
    the EARLIEST index.

    A monitoring screen, not a test: compare deviation across groups
    (or against a permutation threshold computed offline) to rank
    which streams shifted. Overflow bound: n·Σ|v_micros| must stay
    below 2^63 — at ~1e11 rows run it per shard/window, which is how
    changepoint monitors deploy anyway.

    Scale shape: one per-group ordered window pass (prefix sums +
    row index over (ts, id) — groups are the parallelism key) + one
    groupBy with a lexicographic max-struct argmax ((deviation,
    −index) — no second window, no join back).
    """
    from pyspark.sql.window import Window

    base = events.select(
        F.col(group_col).alias("_g"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.floor(F.col(value_col).cast("double") * 1000000.0)
        .cast("bigint")
        .alias("_v"),
    )
    w = Window.partitionBy("_g").orderBy("_ts", "_id")
    wall = Window.partitionBy("_g")
    pre = base.select(
        "_g",
        "_ts",
        F.row_number().over(w).alias("_k"),
        F.sum("_v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_sk"),
        F.sum("_v").over(wall).alias("_sn"),
        F.count(F.lit(1)).over(wall).alias("_n"),
    )
    dev = pre.where(F.col("_k") < F.col("_n")).select(
        "_g",
        "_ts",
        "_k",
        "_n",
        F.abs(
            F.col("_n") * F.col("_sk") - F.col("_k") * F.col("_sn")
        ).alias("_dev"),
    )
    return (
        dev.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.first("_n").cast("bigint").alias("n"),
            F.max(
                F.struct(
                    F.col("_dev"),
                    (-F.col("_k")).alias("_nk"),
                    F.col("_ts"),
                )
            ).alias("_w"),
        )
        .select(
            group_col,
            "n",
            (-F.col("_w._nk")).cast("bigint").alias("change_index"),
            F.col("_w._ts").alias("change_ts"),
            F.col("_w._dev").cast("bigint").alias("deviation"),
        )
    )


def multi_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    model: str = "linear",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch conversion attribution: split each conversion's
    credit across the touch events (all non-conversion events) that
    preceded it in the same user's timeline since the previous
    conversion, under the standard marketing models — ``first`` /
    ``last`` (position single-touch), ``linear`` (equal split), or
    ``u_shaped`` (40% first, 40% last, 20% shared by the middles) —
    then report per touch type. "Which channel actually drives
    purchases" is unanswerable from funnel counts alone; this is the
    per-conversion credit ledger behind it.

    Credits are EXACT integer ppm: every attributed conversion hands
    out exactly 1 000 000 ppm (integer floor division; the remainder
    goes to the deterministic first position — first touch for linear,
    first middle for u_shaped), so Σ credit_ppm over the output equals
    10⁶ × the number of attributed conversions bit-for-bit in any
    engine — the conservation invariant the tests pin. Touches are
    assigned to the NEXT conversion of their user (ties broken by
    ``id_col`` — a total order); touches after the user's last
    conversion, and conversions with no preceding touch (nothing to
    attribute), are excluded. Returns one row per touch type:
    (``type_col``, n_touches, n_conversions, credit_ppm), where
    n_conversions counts the distinct conversions the type touched.

    Scale shape: two window passes partitioned by user then by (user,
    conversion ordinal) — the sort is per-user, never global — and a
    two-level map-side-combinable aggregation ((type, user, conv) →
    type), which also makes "distinct conversions per type" a plain
    COUNT of the inner groups, no count-distinct state. At 100 TB the
    user key is the natural partitioner and AQE absorbs power-user
    skew; nothing data-sized crosses the driver.
    """
    from pyspark.sql import Window

    if model not in ("first", "last", "linear", "u_shaped"):
        raise ValueError(f"unknown attribution model: {model}")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    wu = Window.partitionBy(user_col)
    is_conv = F.when(F.col(type_col) == conversion_type, 1).otherwise(0)
    tagged = events.select(
        user_col,
        ts_col,
        id_col,
        type_col,
        F.sum(is_conv).over(w).alias("_c"),
    ).withColumn("_tot", F.max("_c").over(wu))
    touches = (
        tagged.where(F.col(type_col) != conversion_type)
        .withColumn("_conv_no", F.col("_c") + 1)
        .where(F.col("_conv_no") <= F.col("_tot"))
    )
    wg = Window.partitionBy(user_col, "_conv_no").orderBy(ts_col, id_col)
    wga = Window.partitionBy(user_col, "_conv_no")
    pos = F.row_number().over(wg)
    k = F.count(F.lit(1)).over(wga)
    scored = touches.select(
        user_col, "_conv_no", type_col, pos.alias("_pos"), k.alias("_k")
    )
    p, n = F.col("_pos"), F.col("_k")
    if model == "first":
        credit = F.when(p == 1, F.lit(1000000)).otherwise(F.lit(0))
    elif model == "last":
        credit = F.when(p == n, F.lit(1000000)).otherwise(F.lit(0))
    elif model == "linear":
        base = F.expr("1000000 div _k")
        credit = base + F.when(p == 1, F.lit(1000000) - n * base).otherwise(
            F.lit(0)
        )
    else:  # u_shaped: 40/20/40 with the k<=2 degenerate forms
        mbase = F.expr("200000 div (_k - 2)")
        mrem = F.lit(200000) - (n - 2) * mbase
        credit = (
            F.when(n == 1, F.lit(1000000))
            .when(n == 2, F.lit(500000))
            .when((p == 1) | (p == n), F.lit(400000))
            .otherwise(mbase + F.when(p == 2, mrem).otherwise(F.lit(0)))
        )
    per_conv = (
        scored.withColumn("_credit", credit)
        .groupBy(type_col, user_col, "_conv_no")
        .agg(
            F.count(F.lit(1)).alias("_n_t"),
            F.sum("_credit").alias("_cr"),
        )
    )
    return per_conv.groupBy(type_col).agg(
        F.sum("_n_t").cast("bigint").alias("n_touches"),
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.sum("_cr").cast("bigint").alias("credit_ppm"),
    )
