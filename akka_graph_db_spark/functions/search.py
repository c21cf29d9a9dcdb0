"""Keyword search & corpus statistics: vocabulary, TF-IDF/BM25 scoring.

The retrieval/quality-filter primitives of a training-data pipeline:
build the corpus vocabulary (tokenizer construction, frequency cutoffs)
and score documents against a term query (BM25 — the classic
inverted-index ranking function). No reference file:line — sanctioned
LLM-pipeline extension surface (SURVEY.md §2.9).

Scale design: the score never materializes an all-(doc × term) matrix —
tokens explode map-side, are filtered to the query's terms BEFORE the
shuffle (a handful of terms ⇒ the grouped state is tiny), and the corpus
constants (N, avgdl, per-term df) are 1-row/`len(terms)`-row aggregates
broadcast into the scoring join. One corpus scan, two broadcasts, one
final top-k window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from akka_graph_db_spark.functions.text import tokens


def vocabulary(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus term-frequency table: (term, term_count, doc_count), the
    vocabulary-building step before tokenizer training / frequency
    cutoffs. Map-side combinable single aggregation."""
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    out = tok.groupBy("term").agg(F.count(F.lit(1)).alias("term_count"))
    docs = (
        df.select(
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias(
                "term"
            )
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    out = out.join(docs, "term")
    if min_count > 1:
        out = out.where(F.col("term_count") >= min_count)
    return out


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-terms query.

    Uses the RATIONAL idf variant ``(N - df + 0.5) / (df + 0.5)`` rather
    than the textbook ``ln(...)`` — transcendental functions are not
    bit-reproducible across engines (Java StrictMath vs libm), while
    +,-,*,/ on IEEE doubles are, which keeps the operator
    oracle-verifiable. ln is monotone per term, so single-term rankings
    are identical; multi-term rankings weight rare terms more steeply
    than textbook BM25 (documented variant).

    Per-term scores are quantized to DECIMAL(38,12) before the per-doc
    sum so the total is order-independent (the repo's standard exact-sum
    pattern), then top-k by (score desc, id) — fully deterministic.

    Returns (id_col, score, n_query_terms_matched).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    tok = tokens(F.col(text_col))

    # One corpus scan: per-doc length + per-(doc, query-term) tf.
    # Filter to query terms BEFORE the explode-shuffle.
    qset = F.array(*[F.lit(t) for t in terms])
    base = df.select(
        F.col(id_col),
        F.size(tok).alias("dl"),
        F.filter(tok, lambda t: F.array_contains(qset, t)).alias("_qtok"),
    )
    corpus = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.select(id_col, "dl", F.explode("_qtok").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(corpus))
        .withColumn(
            "idf",
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5),
        )
        .withColumn(
            "term_score",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).cast("decimal(38,12)"),
        )
    )
    totals = scored.groupBy(id_col).agg(
        F.sum("term_score").cast("double").alias("score"),
        F.count(F.lit(1)).alias("n_query_terms_matched"),
    )
    # orderBy + limit plans as TakeOrderedAndProject — a distributed
    # per-partition top-k merged on the driver, never a global sort.
    return totals.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    rankings: score(d) = Σ 1/(k + rank_i(d)) over the systems that
    ranked d (FULL outer join — a doc surfaced by only one system still
    scores). The hybrid-retrieval standard: fuse lexical BM25 with
    embedding ANN without score calibration, since only RANKS enter.

    Exact-by-construction: each addend is one double division of small
    integers and the sum has two terms — identical IEEE results on any
    engine, so a SQL oracle reproduces the fused ranking bit-for-bit.
    Returns (id_col, rrf_score, rank_a, rank_b) top-k by
    (rrf_score desc, id).
    """
    ra = a.select(F.col(id_col), F.col(rank_col).alias("rank_a"))
    rb = b.select(F.col(id_col), F.col(rank_col).alias("rank_b"))
    fused = ra.join(rb, id_col, "full").select(
        id_col,
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col("rank_a")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col("rank_b")), F.lit(0.0)
            )
        ).alias("rrf_score"),
        F.col("rank_a").cast("int").alias("rank_a"),
        F.col("rank_b").cast("int").alias("rank_b"),
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    ).limit(top_k)


def cms_sketch(
    df: DataFrame,
    term_col: str = "term",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch of a term stream as a (row, bucket, cnt) frame —
    depth x width counters, FIXED memory regardless of corpus size (the
    100 TB heavy-hitter shape: the sketch frame is ~depth*width rows no
    matter how many tokens flow through). Bucket i of row d is
    ``md5_63("cms:<d>:" || term) % width`` — the repo's cross-engine
    hash family, so a SQL engine rebuilds the identical sketch and the
    estimates are deterministic, not probabilistic-per-run (the CMS
    guarantee est >= true, est <= true + eps*N holds per FIXED hash
    draw; this implementation pins the draw).

    One explode + one groupBy per call; rows share the single shuffle
    via the posexplode over depth replicas.
    """
    from akka_graph_db_spark.functions.hashing import md5_63

    rows = F.posexplode(
        F.array(
            *[
                md5_63(
                    F.concat(F.lit(f"cms:{d}:"), F.col(term_col))
                ) % width
                for d in range(depth)
            ]
        )
    )
    return (
        df.select(F.col(term_col), rows.alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-query the count-min sketch for each term: estimate =
    MIN over rows of the term's counter. The sketch side is depth*width
    rows — broadcast — so estimation is a map-side join per term.
    Returns (term, cms_estimate). est >= true count always; equality
    whenever no collision survives the row-min (pytest-pinned).

    The probe is a LEFT join with empty counters coalesced to 0 (ADVICE
    r6): a (row, bucket) cell no token hashed into has no sketch row, and
    an inner join would drop it from the min — an out-of-corpus term
    would then vanish from the output (or report min over only its
    colliding rows) instead of the correct estimate 0."""
    from akka_graph_db_spark.functions.hashing import md5_63

    probes = terms.select(
        F.col(term_col),
        F.posexplode(
            F.array(
                *[
                    md5_63(
                        F.concat(F.lit(f"cms:{d}:"), F.col(term_col))
                    ) % width
                    for d in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(term_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_estimate")
        )
    )


# --------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (pinned hash draw, integer registers)
# --------------------------------------------------------------------------

_HLL_RHO_CAP = 50  # keeps the integer harmonic sum inside BIGINT


def _hll_bucket_rho(value_col: str, p: int):
    """(bucket, rho) expressions of the PINNED hash draw shared by the
    global, grouped, and streaming HLL paths — the oracle-reproducibility
    contract lives HERE, in one place: h = md5_63('hll:' || value),
    bucket = h % 2**p, rho = trailing zeros of h >> p (pure integer
    bit_count) + 1, capped at _HLL_RHO_CAP."""
    from akka_graph_db_spark.functions.hashing import md5_63

    m = 1 << p
    h = md5_63(F.concat(F.lit("hll:"), F.col(value_col).cast("string")))
    w = F.shiftright(h, p)
    low = w.bitwiseAND(-w)
    rho = F.least(
        F.bit_count(low - F.lit(1)) + F.lit(1), F.lit(_HLL_RHO_CAP)
    )
    return (h % m), rho


# exact-BIGINT harmonic term per bucket; empty bucket = register 0
_HLL_TERM_SQL = (
    "shiftleft(CAST(1 AS BIGINT), "
    f"{_HLL_RHO_CAP} - coalesce(register, 0))"
)


def _hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 registers (Flajolet et
    al. 2007 §4) — computed driver-side and inlined as ONE literal so a
    SQL oracle interpolates the identical float."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(
    df: DataFrame,
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """HyperLogLog registers for COUNT DISTINCT of ``value_col`` —
    m = 2**p rows of (bucket, register), FIXED memory no matter how many
    values stream through (the 100 TB companion to :func:`cms_sketch`:
    CMS answers "how often", HLL answers "how many distinct").

    The hash draw is pinned to the repo's cross-engine MD5 family:
    h = md5_63('hll:' || value); bucket = h % m; the remaining bits
    w = h >> p contribute rho = trailing-zero count + 1 (computed in
    pure integer ops — bit_count((w & -w) - 1) + 1 — NOT float log2,
    so DuckDB rebuilds the identical registers), capped at
    ``_HLL_RHO_CAP`` so the estimator's harmonic sum stays an exact
    BIGINT. One groupBy over m buckets; empty buckets are materialized
    by :func:`hll_estimate`, not stored.
    """
    bucket, rho = _hll_bucket_rho(value_col, p)
    return (
        df.select(bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy("bucket")
        .agg(F.max("_rho").cast("int").alias("register"))
    )


def hll_estimate(sketch: DataFrame, p: int = 10) -> DataFrame:
    """1-row raw HLL estimate from a :func:`hll_sketch` frame.

    DETERMINISTIC across engines: the harmonic sum is computed as the
    exact integer S = sum over all m buckets of 2**(RHO_CAP - register)
    (empty bucket = 2**RHO_CAP), and the only float op is the single
    final division C / S where C = alpha_m * m^2 * 2**RHO_CAP is one
    driver-side literal — no per-row float accumulation whose order
    could differ between engines. Returns (hll_estimate double). This
    is the RAW estimator (no small/large-range corrections — the
    small-range path needs ln(), which the oracle contract bans); for
    cardinalities well above 5m/2 the raw estimate is the standard one.
    """
    m = 1 << p
    spark = sketch.sparkSession
    buckets = spark.range(m).select(F.col("id").alias("bucket"))
    c = _hll_alpha(m) * m * m * float(1 << _HLL_RHO_CAP)
    s = (
        buckets.join(sketch, "bucket", "left")
        # SQL expr: the DataFrame shiftleft() helper only accepts a
        # Python-int shift amount, the SQL form takes a column
        .select(F.expr(_HLL_TERM_SQL).alias("_term"))
        .agg(F.sum("_term").cast("bigint").alias("_s"))
    )
    return s.select(
        (F.lit(c) / F.col("_s").cast("double")).alias("hll_estimate")
    )


def distinctive_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_frequency: int | None = None,
) -> DataFrame:
    """Per-document top-k DISTINCTIVE terms: ranked by (tf DESC,
    doc-frequency ASC, term ASC) — a term beats another if it occurs
    more often in THIS document, ties broken toward the corpus-rarer
    term. The exact-integer keyword-extraction analogue of tf-idf:
    lexicographic (tf, -df) ordering is monotone in tf·idf for any
    strictly-decreasing idf, with no transcendental ln() so every
    comparison is integer-exact and oracle-reproducible. Returns
    (id, rank, term, tf, df). ``max_doc_frequency`` drops corpus-wide
    stop-terms before ranking.

    100 TB shape: one (doc, term) count aggregation (map-side
    combinable), one doc-frequency aggregation over the DISTINCT
    (doc, term) frame (no second corpus scan), an equi-join on term,
    and a per-document window whose partition is the document's own
    vocabulary — bounded by document length, never corpus size.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_doc_frequency is not None:
        dfreq = dfreq.where(F.col("df") <= max_doc_frequency)
    w = Window.partitionBy("id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "rank", "term", "tf", "df")
    )


def vocab_growth(
    df: DataFrame,
    step: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve: cumulative token count vs
    cumulative DISTINCT-type count as the corpus is consumed in id
    order, sampled per ``step``-sized id bucket. The corpus-sizing
    diagnostic for tokenizer training: how fast is the type inventory
    still growing? Returns (bucket, cum_tokens, cum_types) with
    bucket = floor(id / step).

    A running distinct count is not windowable at scale; the exact
    decomposition is: a type is NEW in the bucket of its FIRST
    occurrence (min id per term — one aggregation), so per-bucket
    new-type counts + per-bucket token counts are two map-side-
    combinable aggregations, and the cumulative sums run over the
    BUCKET-level frame — n_ids/step rows, bounded and tiny, so its
    single-partition ordered window is a deliberate driver-scale step,
    never a corpus-sized one.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    # integer DIV, not float `/`+cast: bigint/int returns DOUBLE, whose
    # 53-bit mantissa misrounds ids beyond 2^53 into the wrong bucket
    bucket = F.expr(f"id DIV {int(step)}")
    per_bucket = tok.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("toks")
    )
    firsts = tok.groupBy("term").agg(F.min("id").alias("first_id"))
    new_types = firsts.groupBy(
        F.expr(f"first_id DIV {int(step)}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("types"))
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_bucket.join(new_types, "bucket", "left")
        .select(
            "bucket",
            F.sum("toks").over(w).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("types"), F.lit(0)))
            .over(w)
            .alias("cum_types"),
        )
    )


def hll_sketch_grouped(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = ("source",),
    p: int = 10,
) -> DataFrame:
    """Per-group HyperLogLog registers — COUNT DISTINCT profiling for
    every group in ONE pass with 2**p counters per group (the 100 TB
    cardinality-profile shape: per-partition distinct counts without a
    per-group shuffle of distinct values). Same pinned md5 hash draw as
    :func:`hll_sketch`, so registers are SQL-reproducible. Returns
    (group..., bucket, register)."""
    bucket, rho = _hll_bucket_rho(value_col, p)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").cast("int").alias("register"))
    )


def hll_estimate_grouped(
    sketch: DataFrame,
    group_cols: tuple[str, ...] = ("source",),
    p: int = 10,
) -> DataFrame:
    """Per-group raw HLL estimate from :func:`hll_sketch_grouped` —
    (group..., hll_estimate). Empty buckets are materialized via a
    groups × range(m) grid (n_groups·2**p rows — sketch-sized, bounded,
    never data-sized); the harmonic sum is the same exact-BIGINT
    power-of-two sum as :func:`hll_estimate`, one float division per
    group at the end."""
    m = 1 << p
    spark = sketch.sparkSession
    gc = list(group_cols)
    groups = sketch.select(*gc).distinct()
    buckets = spark.range(m).select(F.col("id").alias("bucket"))
    c = _hll_alpha(m) * m * m * float(1 << _HLL_RHO_CAP)
    return (
        groups.crossJoin(buckets)
        .join(sketch, gc + ["bucket"], "left")
        .select(*gc, F.expr(_HLL_TERM_SQL).alias("_term"))
        .groupBy(*gc)
        .agg(F.sum("_term").cast("bigint").alias("_s"))
        .select(
            *gc,
            (F.lit(c) / F.col("_s").cast("double")).alias("hll_estimate"),
        )
    )


def bm25_topk_multi(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k per query for a BATCH of bag-of-terms queries — the
    multi-query generalization of :func:`bm25_topk`, same rational-idf /
    decimal-quantized-sum exactness contract.

    ``queries`` is a (query_id, term) frame. Its distinct term set is
    collected and inlined as the corpus scan's filter literal (the query
    batch is driver-bounded BY DESIGN — it is the broadcast side; corpus
    stays distributed and is scanned ONCE for all queries). Term scores
    are computed once per (doc, term) and fanned out to queries by one
    broadcast join on term; ranking is one window per query partition.
    ``exclude_self`` drops hits whose doc id equals the query id BEFORE
    ranking (the more-like-this convention where queries are documents).

    Returns (query_id, id_col, rank, score, n_query_terms_matched).
    """
    qt = queries.select(
        F.col("query_id"), F.lower(F.col("term")).alias("term")
    ).distinct()
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    if not terms:
        raise ValueError("queries carry no terms")
    tok = tokens(F.col(text_col))
    qset = F.array(*[F.lit(t) for t in terms])
    base = df.select(
        F.col(id_col),
        F.size(tok).alias("dl"),
        F.filter(tok, lambda t: F.array_contains(qset, t)).alias("_qtok"),
    )
    corpus = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.select(id_col, "dl", F.explode("_qtok").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(corpus))
        .withColumn(
            "idf",
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5),
        )
        .withColumn(
            "term_score",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).cast("decimal(38,12)"),
        )
        .join(F.broadcast(qt), "term")
    )
    totals = scored.groupBy("query_id", id_col).agg(
        F.sum("term_score").cast("double").alias("score"),
        F.count(F.lit(1)).alias("n_query_terms_matched"),
    )
    if exclude_self:
        totals = totals.where(F.col("query_id") != F.col(id_col))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", id_col, F.col("rank").cast("int").alias("rank"),
            "score", "n_query_terms_matched",
        )
    )


def retrieval_eval(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-query retrieval quality off a ranked result list: reciprocal
    rank of the first relevant hit, relevant-in-top-k count, and
    recall@k — the eval loop a pipeline runs after (re)building a search
    index. All counts are integers; rr and recall are single IEEE
    divides rounded to 6 dp, so the metrics hash-verify like everything
    else (MAP/NDCG need per-rank float accumulation or logs — the
    rank-position metrics carry the same signal reproducibly).

    ``ranked``: (query_id, id_col, rank), e.g. from
    :func:`bm25_topk_multi`; ``relevant``: (query_id, id_col) truth
    pairs. Queries with no relevant docs report NULL rr/recall (not 0 —
    an index can't be graded on an empty truth set). One broadcast join
    + one aggregation; never a per-query loop.
    """
    rel = relevant.select("query_id", F.col(id_col)).distinct()
    hits = ranked.join(rel, ["query_id", id_col], "left_semi")
    per_q = hits.groupBy("query_id").agg(
        F.min("rank").alias("first_rel_rank"),
        F.count(F.lit(1)).alias("n_rel_in_topk"),
    )
    totals = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel_total")
    )
    qids = ranked.select("query_id").distinct()
    return (
        qids.join(per_q, "query_id", "left")
        .join(totals, "query_id", "left")
        .select(
            "query_id",
            F.col("first_rel_rank").cast("int").alias("first_rel_rank"),
            F.round(F.lit(1.0) / F.col("first_rel_rank"), 6).alias("rr"),
            F.coalesce("n_rel_in_topk", F.lit(0)).alias("n_rel_in_topk"),
            F.coalesce("n_rel_total", F.lit(0)).alias("n_rel_total"),
            F.when(
                F.coalesce("n_rel_total", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_rel_in_topk", F.lit(0))
                    / F.col("n_rel_total"),
                    6,
                ),
            ).alias(f"recall_at_{k}"),
        )
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    top: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search via positional-posting intersection: documents
    containing the whitespace-tokenized ``phrase`` as a CONTIGUOUS token
    run, with the occurrence count (overlapping occurrences included —
    the positional-index semantics, which substring replace-counting
    gets wrong) and the first match position. Top ``top`` by
    (n_occurrences desc, id).

    This is the inverted-index phrase operator BM25 can't express: a
    bag-of-terms scorer loses adjacency, a LIKE scan loses token
    boundaries. Shape: ONE posexplode tokenize pass filtered to the
    phrase's term set (len(terms) literals — the filter sits directly
    on the exploded projection, so only matching-term postings ever
    reach a shuffle), then k-1 equi-joins on (id, pos) after shifting
    term i's positions by -i — adjacency becomes key equality, every
    join a plain shuffled (or AQE-broadcast, the postings are
    term-selectivity-sized) hash join. At 100 TB you persist the
    filtered posting frame once and feed all k branches from it; no
    window, no cartesian, volume bounded by the phrase terms' postings,
    never the corpus.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    ).where(F.col("tok").isin(terms))
    cur = toks.where(F.col("tok") == terms[0]).select("_id", "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = toks.where(F.col("tok") == t).select(
            "_id", (F.col("pos") - i).alias("pos")
        )
        cur = cur.join(nxt, ["_id", "pos"])
    return (
        cur.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("pos").cast("bigint").alias("first_pos"),
        )
        .orderBy(F.col("n_occurrences").desc(), id_col)
        .limit(top)
    )


def textrank_keywords(
    df: DataFrame,
    n_iter: int = 6,
    damping: float = 0.85,
    top: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): build the
    corpus word co-occurrence graph (adjacent-token pairs, weight =
    corpus-wide co-occurrence count, undirected) and run ``n_iter``
    fixed iterations of weighted PageRank over it; top ``top`` words by
    (rank desc, word), rank rounded to 6 dp. Nodes are words appearing
    in at least one co-occurrence pair, so every node has out-weight
    > 0 and the dangling term vanishes: rank' = (1-d) + d·recv with
    recv = Σ_{u→v} rank(u)·w(u,v)/out_w(u).

    Scale shape: the co-occurrence agg collapses the corpus map-side
    into a VOCAB²-bounded edge frame (tiny next to the corpus), and
    each iteration is the standard PageRank superstep — one
    (vocab-sized) join + groupBy SUM — with per-iteration
    localCheckpoint to keep the 6-round plan linear. The only floats
    are the rank recurrence itself, top-k is taken on FULL precision
    before rounding (the pagerank_top20 discipline), so a fixed-
    iteration SQL unroll reproduces the ranking.
    """
    from akka_graph_db_spark.functions.text import tokens

    # adjacent pairs WITHIN a document: positional tokens joined on
    # (doc, pos+1)
    tok = df.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("pos", "w")
    )
    pairs = (
        tok.alias("l")
        .join(
            tok.alias("r"),
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("r.pos") == F.col("l.pos") + 1),
        )
        .where(F.col("l.w") != F.col("r.w"))
        .select(
            F.least("l.w", "r.w").alias("a"),
            F.greatest("l.w", "r.w").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "w"
        )
    ).localCheckpoint(eager=True)
    out_w = sym.groupBy("a").agg(F.sum("w").alias("out_w"))
    state = out_w.select(
        F.col("a").alias("word"), F.lit(1.0).alias("rank")
    )
    base = 1.0 - damping
    for _ in range(n_iter):
        recv = (
            sym.join(
                state.withColumnRenamed("word", "a"), "a"
            )
            .join(out_w, "a")
            .groupBy(F.col("b").alias("word"))
            .agg(
                F.sum(
                    F.col("rank") * F.col("w") / F.col("out_w")
                ).alias("recv")
            )
        )
        state = (
            out_w.select(F.col("a").alias("word"))
            .join(recv, "word", "left")
            .select(
                "word",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("recv", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        state.orderBy(F.col("rank").desc(), "word")
        .limit(top)
        .select("word", F.round("rank", 6).alias("rank"))
    )
