"""Text analysis operators over a documents table (SURVEY.md §2.9).

All JVM-side expressions (split/regexp/aggregate) — the hot path never
leaves Tungsten. Designed against the driver's ``documents`` fixture
(doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace tokenizer + a BPE-ish fallback regex that splits punctuation
# off words (used by token_count_bpe for an upper-bound token estimate).
_WS = r"\s+"
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokens (empty strings filtered)."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, _WS), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token estimate: words, digit runs and punctuation each count;
    long words cost ceil(len/4) subword units (the ~4-chars-per-token rule
    of thumb). Deterministic, pure expression."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(c, F.lit(_BPE_ISH), 0)
    return F.aggregate(
        pieces,
        F.lit(0).cast("bigint"),
        lambda acc, p: acc + F.ceil(F.length(p) / 4.0).cast("bigint"),
    )


def shingles(tok: Column, n: int) -> Column:
    """n-gram shingles (space-joined) from a token array; documents shorter
    than n tokens produce their single full-text shingle."""
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tok)))


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------

# Tiny built-in stopword profiles for the language-ID heuristic. These are
# public common-word lists; the heuristic is an n-gram/stopword-overlap
# scorer, not a trained model (the container has no ML deps — SURVEY §2.9).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "los"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans"],
    "zh": ["de", "shi", "bu", "wo", "zai", "you", "le", "ren", "ta"],
}


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic quality features: n_tokens, mean_token_len,
    punct_ratio, stopword_ratio, upper_ratio, quality_score in [0,1]."""
    t = F.col(text_col)
    tok = tokens(t)
    n_tok = F.size(tok)
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_sw = F.size(F.filter(tok, lambda x: F.array_contains(sw, x)))
    out = (
        df.withColumn("n_tokens", n_tok.cast("bigint"))
        .withColumn(
            "mean_token_len",
            F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(0.0),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, punct / n_chars).otherwise(0.0),
        )
        .withColumn(
            "upper_ratio",
            F.when(n_chars > 0, upper / n_chars).otherwise(0.0),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, n_sw / n_tok).otherwise(0.0),
        )
    )
    # Heuristic quality: long enough, low punctuation, some stopwords.
    score = (
        F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality_score", score)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-profile overlap argmax (deterministic;
    ties broken by language code order). Appends ``lang_pred``."""
    tok = F.array_distinct(tokens(F.col(text_col)))
    scored = None
    for code in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        s = F.size(F.array_intersect(tok, sw))
        entry = F.struct(s.alias("score"), F.lit(code).alias("code"))
        scored = entry if scored is None else F.when(
            entry["score"] > scored["score"], entry
        ).otherwise(scored)
    return df.withColumn("lang_pred", scored["code"])


def text_stats(
    df: DataFrame, group_cols: tuple[str, ...] = ("lang", "source")
) -> DataFrame:
    """Per-group corpus stats — the groupBy/agg rollup a pipeline dashboards.
    All sums exact (counts/bigint), so oracle-hash-stable."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(token_count(F.col("text"))).alias("sum_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append Gopher-style repetition signals (the cheap filters a training
    pipeline applies before anything model-based):

    - ``distinct_token_ratio``: |set(tokens)| / |tokens| — low values mean
      heavy word repetition (type-token ratio).
    - ``top_bigram_ratio``: occurrences of the most frequent token bigram /
      total bigrams — catches boilerplate/spam loops that token-level
      ratios miss.

    Pure expressions (aggregate over the shingle array — no explode, no
    shuffle, no Python): each document is scored independently inside one
    projection, so the operator is embarrassingly parallel at any scale.
    """
    t = F.col(text_col)
    tok = tokens(t)
    n_tok = F.size(tok)
    bi = shingles(tok, 2)
    # most-frequent-bigram count via a single fold over the sorted array:
    # equal neighbors extend the current run; track the max run length.
    sorted_bi = F.array_sort(bi)
    top_cnt = F.aggregate(
        sorted_bi,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return df.withColumn(
        "distinct_token_ratio",
        F.when(n_tok > 0, F.size(F.array_distinct(tok)) / n_tok).otherwise(
            0.0
        ),
    ).withColumn(
        "top_bigram_ratio",
        F.when(F.size(bi) > 0, top_cnt / F.size(bi)).otherwise(0.0),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, appendix A1.1 — the public
    rule set most curation pipelines start from): per-document signals +
    one ``gopher_pass`` verdict. Appends

    - ``n_words``, ``mean_word_len`` (chars per whitespace word),
    - ``symbol_word_ratio`` ('#' and ellipsis occurrences per word),
    - ``frac_bullet_lines`` / ``frac_ellipsis_lines`` (lines starting
      with a bullet / ending with an ellipsis),
    - ``frac_alpha_words`` (words containing a letter),
    - ``n_gopher_stopwords`` (distinct hits in the 8-word Gopher list),
    - ``gopher_pass`` — every rule within its bounds.

    Pure JVM expressions (splits + higher-order folds; no explode, no
    shuffle, no Python) — embarrassingly parallel at any scale, and every
    signal is a ratio of exact integer counts, so an oracle reproduces it
    engine-exactly.
    """
    t = F.col(text_col)
    tok = tokens(t)  # lowercased whitespace tokens
    n_words = F.size(tok)
    sum_len = F.aggregate(
        tok, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    n_alpha = F.size(F.filter(tok, lambda x: x.rlike("[a-z]")))
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_sw = F.size(F.array_intersect(F.array_distinct(tok), sw))
    # symbol occurrences: '#' chars + unicode '…' chars + literal '...'
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_uell = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    n_dots = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / 3
    lines = F.filter(
        F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda x: F.ltrim(x).rlike(r"^[-*•‣◦]"),
        )
    )
    ellipsis_l = F.size(
        F.filter(
            lines,
            lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$"),
        )
    )
    d = (
        df.withColumn("n_words", n_words.cast("bigint"))
        .withColumn(
            "mean_word_len",
            F.round(
                F.when(n_words > 0, sum_len / n_words).otherwise(0.0), 6
            ),
        )
        .withColumn(
            "symbol_word_ratio",
            F.round(
                F.when(
                    n_words > 0, (n_hash + n_uell + n_dots) / n_words
                ).otherwise(0.0),
                6,
            ),
        )
        .withColumn(
            "frac_bullet_lines",
            F.round(
                F.when(n_lines > 0, bullet / n_lines).otherwise(0.0), 6
            ),
        )
        .withColumn(
            "frac_ellipsis_lines",
            F.round(
                F.when(n_lines > 0, ellipsis_l / n_lines).otherwise(0.0), 6
            ),
        )
        .withColumn(
            "frac_alpha_words",
            F.round(
                F.when(n_words > 0, n_alpha / n_words).otherwise(0.0), 6
            ),
        )
        .withColumn("n_gopher_stopwords", n_sw.cast("bigint"))
    )
    return d.withColumn(
        "gopher_pass",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_ratio)
        & (F.col("frac_bullet_lines") <= max_bullet_frac)
        & (F.col("frac_ellipsis_lines") <= max_ellipsis_frac)
        & (F.col("frac_alpha_words") >= min_alpha_frac)
        & (F.col("n_gopher_stopwords") >= min_stopwords),
    )


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 90,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Append a deterministic ``split`` column ('train'/'val') by hashing
    the key — the standard reproducible holdout for a corpus that is
    re-materialized across runs and engines (random sampling reshuffles
    membership every run; hash-mod membership is stable under appends,
    re-partitioning, and engine changes).

    ``hash_family="md5"`` uses the DuckDB-reproducible ``hashing.md5_63``
    (sign-masked, so ``% 100`` agrees between Spark's signed and DuckDB's
    unsigned arithmetic); the default stays xxhash64 for speed.
    """
    from akka_graph_db_spark.functions.hashing import md5_63

    if not 0 < train_pct < 100:
        raise ValueError("train_pct must be in (0, 100)")
    key = F.col(key_col).cast("string")
    if hash_family == "xxhash64":
        bucket = F.pmod(F.xxhash64(key), F.lit(100))
    elif hash_family == "md5":
        bucket = md5_63(key) % 100
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val")),
    )


def quality_topk(
    df: DataFrame,
    k: int = 3,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the k highest-quality documents per group (ties broken by id) —
    the 'best N per domain' selection step of a curation pipeline. One
    window over the grouped quality scores; rank, don't sort globally."""
    from pyspark.sql import Window

    scored = quality_features(df, text_col)
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("quality_score"), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


# --------------------------------------------------------------------------
# Fingerprinting
# --------------------------------------------------------------------------

def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    shingle_n: int = 5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Append deterministic document fingerprints:

    - ``content_hash``: 64-bit hash of the exact text (exact-dup key)
    - ``min_shingle_hash``: min over 5-token-shingle hashes (a 1-permutation
      MinHash — robust to local edits, the winnowing-lite fingerprint)

    ``hash_family="xxhash64"`` (default) is the fast path;
    ``hash_family="md5"`` uses the sign-masked MD5 hash that DuckDB can
    reproduce (``hashing.md5_63``), making the result oracle-verifiable —
    the min is order-sensitive, so the md5 family masks the sign bit to keep
    Spark's signed and DuckDB's unsigned orderings identical.
    """
    from akka_graph_db_spark.functions.hashing import md5_63

    t = F.col(text_col)
    sh = shingles(tokens(t), shingle_n)
    if hash_family == "xxhash64":
        h = F.xxhash64
    elif hash_family == "md5":
        h = md5_63
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    return df.withColumn("content_hash", h(t)).withColumn(
        "min_shingle_hash",
        # wrapped: builtins like xxhash64 are varargs, which HOF arity
        # introspection rejects if passed bare
        F.array_min(F.transform(sh, lambda s: h(s))),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks — the
    context-window preparation step of an LLM training pipeline. Chunk i
    covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; every token is covered, trailing
    chunks may be shorter, zero-token documents produce no chunks.

    Pure JVM expressions (sequence → posexplode → slice): a map-only
    stage with NO shuffle — at 100 TB this pipelines straight out of the
    parquet scan into downstream dedup/packing, and parallelism is the
    input split count. Returns (id_col, chunk_idx, chunk_n_tokens,
    chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    tok = tokens(F.col(text_col))
    starts = F.when(
        F.size(tok) > 0,
        F.sequence(F.lit(0), F.size(tok) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col), tok.alias("_tok"), F.posexplode(starts)
    )
    chunk = F.slice(F.col("_tok"), F.col("col") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.col("pos").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("chunk_n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    hash_family: str = "xxhash64",
    resolution: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the mixture-weighting step
    of a corpus curation pipeline. A row in stratum s survives iff
    hash(key) % resolution < round(fractions[s] * resolution); strata
    absent from ``fractions`` are dropped (an explicit mixture spec, not
    an implicit keep-all).

    Hash membership (vs ``DataFrame.sample``'s per-partition RNG) is
    stable under appends, repartitioning, retries, and engine changes —
    re-running the pipeline on a grown corpus preserves every previously
    sampled row's fate. Pure map-side filter: no shuffle, pushes the
    strata predicate to the scan. ``hash_family="md5"`` is the
    DuckDB-reproducible variant (hashing.md5_63); default xxhash64 for
    speed.
    """
    from akka_graph_db_spark.functions.hashing import md5_63

    thresholds = {s: round(f * resolution) for s, f in fractions.items()}
    if not all(0 <= t <= resolution for t in thresholds.values()):
        raise ValueError("fractions must be in [0, 1]")
    key = F.col(key_col).cast("string")
    if hash_family == "xxhash64":
        bucket = F.pmod(F.xxhash64(key), F.lit(resolution))
    elif hash_family == "md5":
        bucket = md5_63(key) % resolution
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    thresh = F.create_map(
        *[
            F.lit(x)
            for s, t in thresholds.items()
            for x in (s, t)
        ]
    )[F.col(strata_col)]
    return df.where(thresh.isNotNull() & (bucket < thresh))


def pack_chunks(
    df: DataFrame,
    size_col: str = "chunk_n_tokens",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    budget: int = 2048,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sequence packing: assign chunks to fixed-token-budget context
    windows by cumulative size over a deterministic order — the
    concat-and-slice packing step of an LLM pre-tokenization pipeline.
    Appends ``pack_id`` (window index within the partition group) and
    ``pack_offset`` (token offset within that window). A chunk whose
    tokens straddle a budget boundary keeps the window it STARTS in
    (overflow ≤ chunk size — the standard streaming-packing
    approximation; exact bin packing is NP-hard and order-unstable).

    Scale note: an empty ``partition_cols`` is ONE global total order —
    a single-partition window. Always shard at scale (by source, lang,
    or a hash bucket): real pipelines pack per output shard anyway, and
    each shard's window then sorts only its own rows.
    """
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError("budget must be >= 1")
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(size_col).over(w) - F.col(size_col)
    pack = F.floor(before / budget)
    return df.withColumn("pack_id", pack).withColumn(
        "pack_offset", (before - pack * budget).cast("bigint")
    )


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Patterns restricted to syntax that Java regex (Spark) and RE2 (DuckDB,
# the oracle engine) interpret identically: char classes, bounded repeats,
# ASCII \b. No lookaround (RE2 has none), no possessive quantifiers.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # digit run with separators, >= 9 digits total-ish (phone shaped);
    # dots excluded so IPv4 literals never half-match after this pass
    "phone": r"\+?\d[\d\- ]{7,}\d",
}
_PII_ORDER = ("email", "ipv4", "phone")


def redact_pii(
    df: DataFrame, text_col: str = "text", kinds: tuple[str, ...] = _PII_ORDER
) -> DataFrame:
    """Scrub PII-shaped spans (emails, IPv4 literals, phone-shaped digit
    runs) from a text column — the privacy-filter pass of a training-data
    pipeline. Appends ``<text_col>_redacted`` (spans replaced by
    ``[KIND]`` tags) and per-kind ``n_<kind>`` match counts.

    Pure JVM regexp expressions — a map-only stage, no shuffle; at 100 TB
    this pipelines straight out of the scan like the chunker. Patterns are
    deliberately RE2-compatible so the DuckDB oracle replays them
    verbatim; passes apply in fixed order (email, ipv4, phone) so a span
    is counted by exactly one pass (emails can contain digit runs; IPv4
    is excluded from the phone shape by requiring dots).
    """
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = df
    cur = F.col(text_col)
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).cast("bigint"),
        )
        cur = F.regexp_replace(cur, pat, f"[{kind.upper()}]")
    return out.withColumn(f"{text_col}_redacted", cur)


def length_quantiles(
    df: DataFrame,
    col: str = "n_chars",
    group_cols: tuple[str, ...] = ("lang",),
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Per-group EXACT percentiles (linear interpolation) of a numeric
    column — the length-distribution profile used to pick truncation /
    filtering thresholds in a training-data pipeline. Exact ``percentile``
    (not approx_percentile) keeps the result engine-portable and
    hash-stable; at 100 TB swap in approx_percentile(..., accuracy) for a
    single-pass sketch when exactness stops mattering.

    Returns (group..., p25, p50, ...): one column per requested prob.
    """
    aggs = [
        F.percentile(F.col(col), F.lit(p)).alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"), *aggs
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
    group_cols: tuple[str, ...] = (),
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: per group,
    the ``k`` rows with the smallest priority u/w, where u is a
    hash-derived uniform and w the row's weight — priority sampling
    (Duffield, Lund & Thorup, "Priority sampling for estimation of
    arbitrary subset sums", JACM 2007). Inclusion probability grows with
    weight; the hash makes it reproducible under appends, retries, and
    engine changes (same property as :func:`stratified_sample`, which
    this generalizes from per-stratum rates to per-row weights).

    Engine-portable determinism: u is an exact 63-bit integer
    (md5/xxhash64) scaled into [0, 1) by 2^-63 (an EXACT power-of-two
    division — only the exponent changes), the priority is one IEEE
    double division, and ranking is (priority, key) — no
    transcendentals, so an oracle reproduces the exact sample, and the
    O(1)-magnitude priority survives decimal rounding identically on
    both engines. Plan shape: one window top-k per group (TakeOrdered
    when ungrouped); no shuffle beyond the group partitioning.

    Rows with weight <= 0 or NULL are excluded (they cannot be sampled).
    Returns the sampled rows with their ``_priority`` column attached.
    """
    from pyspark.sql import Window

    from akka_graph_db_spark.functions.hashing import md5_63

    key = F.col(key_col).cast("string")
    if hash_family == "xxhash64":
        # Mask the sign bit, don't abs(): abs(Long.MIN_VALUE) overflows
        # back to negative on the JVM, breaking the [0, 1) contract.
        u = F.xxhash64(key).bitwiseAND(F.lit((1 << 63) - 1)).cast("double")
    elif hash_family == "md5":
        u = md5_63(key).cast("double")
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    w = F.col(weight_col).cast("double")
    pri = (u / F.lit(float(1 << 63)) / w).alias("_priority")
    scored = df.where(w.isNotNull() & (w > 0)).select("*", pri)
    order = [F.col("_priority"), F.col(key_col)]
    if group_cols:
        win = Window.partitionBy(*group_cols).orderBy(*order)
        return (
            scored.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )
    return scored.orderBy(*order).limit(k)


# --------------------------------------------------------------------------
# Content-defined chunking (rolling-hash boundaries)
# --------------------------------------------------------------------------

def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    mask_bits: int = 4,
) -> DataFrame:
    """Content-defined chunking at word granularity: a chunk boundary
    falls AFTER word i whenever the hash of the ``window``-word context
    ending at i has its low ``mask_bits`` bits zero (expected chunk
    length 2**mask_bits words). Because boundaries depend only on LOCAL
    content — never on byte offsets — an insertion or deletion reshapes
    at most the chunks it touches, so near-duplicate documents share
    almost all chunk hashes: the layout that makes CHUNK-level dedup
    and delta storage work (the FastCDC/LBFS boundary idea, word-level,
    stateless variant — no min/max chunk clamps, which would make the
    split sequential; post-split oversized chunks downstream if a hard
    cap is required).

    Returns (id, chunk_idx, start_word, n_words, chunk_hash) — one row
    per chunk, ``chunk_hash`` an md5_63 of the chunk text (the chunk
    dedup key, cross-engine reproducible).

    Scale shape: one posexplode (map-side), one per-DOCUMENT window
    cumulative sum (partitioned by doc id — distributed, never global),
    one groupBy (doc, chunk). Boundary decisions are pure expressions.
    """
    from pyspark.sql import Window

    from akka_graph_db_spark.functions.hashing import md5_63, md5_64

    w = int(window)
    mask = (1 << int(mask_bits)) - 1
    words = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col).alias("_id"), words.alias("_w"))
    # (doc, pos, word) stream — the doc's array is NOT carried along
    # (that would duplicate the document once per word); the rolling
    # window is rebuilt from lag() and the chunk text re-sliced from the
    # doc row by a per-chunk join at the end.
    pos = base.select(
        "_id", F.posexplode("_w").alias("_p0", "_word")
    ).select("_id", (F.col("_p0") + 1).alias("_pos"), "_word")
    ordw = Window.partitionBy("_id").orderBy("_pos")
    gram = F.concat_ws(
        " ",
        *[F.lag("_word", w - 1 - i).over(ordw) for i in range(w - 1)],
        F.col("_word"),
    )
    bnd = F.when(
        (F.col("_pos") >= w)
        & (md5_64(gram).bitwiseAND(F.lit(mask)) == 0),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = Window.partitionBy("_id").orderBy("_pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    marked = pos.select(
        "_id",
        "_pos",
        bnd.alias("_b"),
    ).select(
        "_id",
        "_pos",
        (F.coalesce(F.sum("_b").over(cum), F.lit(0)) + 1).alias("_chunk"),
    )
    spans = marked.groupBy("_id", "_chunk").agg(
        F.min("_pos").alias("start_word"),
        F.count(F.lit(1)).alias("n_words"),
    )
    return spans.join(base, "_id").select(
        F.col("_id").alias(id_col),
        F.col("_chunk").cast("bigint").alias("chunk_idx"),
        F.col("start_word").cast("bigint"),
        F.col("n_words").cast("bigint"),
        md5_63(
            F.array_join(
                F.slice("_w", F.col("start_word"), F.col("n_words")), " "
            )
        ).alias("chunk_hash"),
    )


def token_rarity_stats(
    df: DataFrame,
    rare_max_freq: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-statistics quality signals per document: how much of a doc
    is made of tokens the rest of the corpus (almost) never uses.

    A document dominated by hapax legomena (corpus frequency 1) is
    usually garbage — mojibake, base64 blobs, boilerplate IDs — the
    unigram-LM intuition behind perplexity filtering, reduced to EXACT
    integer statistics so no log/exp enters (oracle-reproducible):

      - ``n_tokens``   — whitespace token count
      - ``mean_tok_freq`` — Σ corpus-freq of the doc's tokens / n_tokens
      - ``rare_ratio``  — fraction of token OCCURRENCES whose corpus
        frequency is <= ``rare_max_freq``

    Plan: one explode + token-keyed count (the vocabulary aggregation),
    join the exploded tokens back on token (AQE broadcasts the
    vocabulary side when small; at web scale both sides co-partition on
    the token key), one per-doc aggregation. Three shuffles total,
    nothing quadratic; the two ratios are single double divisions off
    exact BIGINT sums.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("_freq"))
    n = F.col("n_tokens")
    return (
        tok.join(freq, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_freq").alias("_sum_freq"),
            F.sum(
                F.when(F.col("_freq") <= rare_max_freq, 1).otherwise(0)
            ).alias("_n_rare"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("_sum_freq").cast("double") / n).alias("mean_tok_freq"),
            (F.col("_n_rare").cast("double") / n).alias("rare_ratio"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """The first merge step of BPE tokenizer training: corpus-wide
    frequencies of ADJACENT CHARACTER PAIRS within words — the argmax
    pair is what byte-pair encoding would merge first, and iterating
    this aggregation IS the training loop (Sennrich et al. 2016).

    Pure column expressions: words from the standard tokenizer, each
    word's pairs via transform over an index sequence (no Python in the
    hot path), one explode + one count aggregation — map-side
    combinable, the same one-shuffle shape as a word count; at 100 TB
    the grouped state is the PAIR VOCABULARY (tiny), not the corpus.
    Single-character words contribute nothing. Returns the ``top_k``
    (pair, pair_count) rows by (count desc, pair) — a deterministic
    total order.
    """
    w = F.explode(tokens(F.col(text_col))).alias("_w")
    pairs = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.length("_w") - 1),
            lambda i: F.col("_w").substr(i, F.lit(2)),
        )
    )
    return (
        df.select(w)
        .where(F.length("_w") >= 2)
        .select(pairs.alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(top_k)
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS)
# --------------------------------------------------------------------------

def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-token shingle, slide a window of ``w``
    consecutive shingle hashes, and select each window's MINIMUM — the
    selected hash SET is the document fingerprint. Guarantees every
    shared run of at least w+k-1 tokens between two documents yields at
    least one shared fingerprint, while storing only ~2/(w+1) of the
    shingle hashes — the local-edit-robust dedup/provenance sketch
    (:func:`fingerprint`'s ``min_shingle_hash`` is the degenerate
    w=∞ case).

    Returns distinct (id_col, fp_hash BIGINT). Documents shorter than k
    tokens contribute their single full-text shingle
    (:func:`shingles` semantics); a document with fewer than w shingles
    contributes the minimum of what it has (the trailing window).

    Plan shape: one explode (map-side) + one window over (doc, pos) —
    a single shuffle on the document id, per-doc state bounded by the
    doc's own shingle count, then a map-side-combinable distinct. At
    100 TB this is embarrassingly parallel in the document dimension.

    ``hash_family="md5"`` uses the sign-masked MD5 family
    (:mod:`hashing`) so DuckDB reproduces hash values AND their
    ordering exactly (MIN over signed vs unsigned views agrees).
    """
    from pyspark.sql import Window

    from akka_graph_db_spark.functions.hashing import md5_63

    if hash_family == "xxhash64":
        h = F.xxhash64
    elif hash_family == "md5":
        h = md5_63
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    sh = shingles(tokens(F.col(text_col)), k)
    hashed = df.select(
        F.col(id_col),
        F.posexplode(F.transform(sh, lambda s: h(s))).alias("pos", "_h"),
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(w - 1), 0)
    )
    per_doc = Window.partitionBy(id_col)
    return (
        hashed.withColumn("_wmin", F.min("_h").over(win))
        .withColumn("_m", F.count(F.lit(1)).over(per_doc))
        # full windows only — except the last prefix window of a doc
        # with fewer than w shingles, which covers the whole doc
        .where(
            (F.col("pos") >= F.lit(w - 1))
            | (F.col("pos") == F.col("_m") - 1)
        )
        .select(F.col(id_col), F.col("_wmin").alias("fp_hash"))
        .distinct()
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_postings: int | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints
    (a_id < b_id, n_shared) — content-overlap detection robust to local
    edits and reordering, the MOSS report.

    The pair join is a posting-list self-join on fp_hash: cost is
    sum over hashes of C(postings, 2). ``max_postings`` drops hashes
    appearing in more than that many documents first (stop-fingerprint
    removal — boilerplate shared by everything identifies nothing and
    quadratically dominates the join; the standard winnowing-index
    mitigation). Deterministic either way, so the oracle mirrors the
    cap exactly.
    """
    fps = winnow_fingerprints(df, text_col, id_col, k, w, hash_family)
    if max_postings is not None:
        keep = (
            fps.groupBy("fp_hash")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_postings)
            .select("fp_hash")
        )
        fps = fps.join(keep, "fp_hash", "left_semi")
    a = fps.select(F.col(id_col).alias("a_id"), "fp_hash")
    b = fps.select(F.col(id_col).alias("b_id"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# --------------------------------------------------------------------------
# Corpus n-gram diversity
# --------------------------------------------------------------------------

def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Distinct-n-gram ratio per group — the corpus diversity /
    repetitiveness profile (low distinct-to-total ratios flag template
    spam and synthetic loops; the dataset-analysis counterpart of the
    per-document :func:`repetition_features`).

    For each n in ``ns`` and each group: total n-gram occurrences,
    distinct n-grams, and diversity = distinct/total rounded to 6 dp.
    Documents with fewer than n tokens contribute no n-grams (no
    short-doc fallback shingle here — a 2-token doc has no trigrams).

    One explode + count-distinct aggregation per n, unioned: each is
    the word-count shuffle shape (map-side combinable counts; the
    distinct is Spark's two-phase partial aggregation). Grouped state
    is the n-gram vocabulary, never the corpus.
    """
    tok = tokens(F.col(text_col))
    parts = []
    for n in ns:
        grams = F.when(
            F.size(tok) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tok) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        parts.append(
            df.select(F.col(group_col), F.explode(grams).alias("_g"))
            .groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("total_ngrams"),
                F.countDistinct("_g").alias("distinct_ngrams"),
            )
            .select(
                F.col(group_col),
                F.lit(n).cast("int").alias("n"),
                "total_ngrams",
                "distinct_ngrams",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "diversity",
        F.round(F.col("distinct_ngrams") / F.col("total_ngrams"), 6),
    )


# --------------------------------------------------------------------------
# Blocklist filtering
# --------------------------------------------------------------------------

def blocklist_filter(
    df: DataFrame, terms: list[str], text_col: str = "text"
) -> DataFrame:
    """Drop documents whose token set intersects ``terms`` (the
    badword/keyword filter stage; token-exact match, case-insensitive —
    no substring false positives). Pure map-side predicate: no shuffle,
    pipelines off the scan at any scale."""
    if not terms:
        raise ValueError("terms must be non-empty")
    bad = F.array(*[F.lit(t.lower()) for t in sorted(set(terms))])
    return df.where(~F.arrays_overlap(tokens(F.col(text_col)), bad))


def blocklist_report(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-term document-frequency report for a blocklist: (term,
    n_docs) for every term, zeros included — what you review before
    committing a filter. One explode over per-doc DISTINCT tokens +
    a broadcast semi-join against the (tiny) terms frame, then a
    map-side-combinable count."""
    if not terms:
        raise ValueError("terms must be non-empty")
    tdf = df.sparkSession.createDataFrame(
        [(t.lower(),) for t in sorted(set(terms))], "term string"
    )
    hits = (
        df.select(
            F.explode(
                F.array_distinct(tokens(F.col(text_col)))
            ).alias("term")
        )
        .join(F.broadcast(tdf), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # broadcast the aggregated (<= len(terms) rows) hit side — Spark
    # cannot build-left a left-outer broadcast join
    return (
        tdf.join(F.broadcast(hits), "term", "left")
        .select(
            "term",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias(
                "n_docs"
            ),
        )
    )


def quantile_filter(
    df: DataFrame,
    col: str = "n_chars",
    q: float = 0.75,
    group_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Keep rows at or above their GROUP's exact discrete q-quantile of
    ``col`` — the per-source quality gate of a curation pipeline ("keep
    each source's top quartile"), where one global threshold would let a
    low-quality source dominate. The threshold is rank-based (the
    smallest value whose at-or-below count reaches ceil(q·n), computed
    in integer permille arithmetic), not interpolated: it is always an
    OBSERVED value, identical under any engine's float rules.

    Scale shape: the ordered window runs over the per-group (value,
    count) frame — bounded by the number of DISTINCT values of ``col``
    per group (use an integer score), never group row count; thresholds
    are one row per group and broadcast into the filter join. No window
    over the corpus anywhere.
    """
    from pyspark.sql import Window

    if not (0.0 < q < 1.0):
        raise ValueError(f"q must be in (0, 1), got {q}")
    qm = int(q * 1000)
    gc = list(group_cols)
    counts = df.groupBy(*gc, col).agg(F.count(F.lit(1)).alias("_cnt"))
    w = (
        Window.partitionBy(*gc)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*gc)
    cum = counts.select(
        *gc,
        F.col(col),
        F.sum("_cnt").over(w).alias("_cum"),
        F.sum("_cnt").over(wg).alias("_n"),
    )
    thr = (
        cum.where(F.expr(f"_cum >= (({qm} * _n + 999) DIV 1000)"))
        .groupBy(*gc)
        .agg(F.min(col).alias("_thr"))
    )
    # null-safe equi-join: a NULL group is a real group (the threshold
    # agg keeps it), and a plain equi-join would silently drop its rows
    thr2 = thr.select(
        *[F.col(c).alias(f"_g_{c}") for c in gc], "_thr"
    )
    cond = None
    for c in gc:
        e = df[c].eqNullSafe(thr2[f"_g_{c}"])
        cond = e if cond is None else cond & e
    return (
        df.join(F.broadcast(thr2), cond)
        .where(F.col(col) >= F.col("_thr"))
        .drop("_thr", *[f"_g_{c}" for c in gc])
    )


def doc_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document novelty against everything BEFORE it (id order): of
    the document's distinct ``shingle_n``-gram shingles, how many occur
    for the FIRST time in this document? The streaming-ingest curation
    signal — a near-zero-novelty document is redundant with the corpus
    already ingested, without running any pairwise dedup. Returns
    integer-exact (id, n_shingles, n_novel); callers derive the ratio.

    Same first-occurrence decomposition as :func:`search.vocab_growth`:
    "first seen at" is min(id) per shingle — one map-side-combinable
    aggregation. Novelty then needs NO join back on the shingle: a
    doc's novel count is simply how many shingles have it as their
    first occurrence (count per _first over the firsts aggregate), and
    its total shingle count is size(array_distinct(shingles)) computed
    in the same narrow scan that feeds the explode. The former shape
    (explode scanned twice + an equi-join keyed by the shingle STRINGS
    carrying every exploded row) re-shuffled the whole shingle corpus a
    second time for information the min-aggregate already held; now
    the only shingle-keyed shuffle is the single min-agg, and the
    join-back touches one aggregate row per document.
    """
    tok = tokens(F.col(text_col))
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(tok, shingle_n))).alias("_sh"),
    )
    novel = (
        sh.groupBy("_sh")
        .agg(F.min("id").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    sizes = df.select(
        F.col(id_col).alias("id"),
        F.size(F.array_distinct(shingles(tok, shingle_n)))
        .cast("long")
        .alias("n_shingles"),
    )
    return sizes.join(novel, "id", "left").select(
        "id",
        "n_shingles",
        F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-over-crawl delta: classify every document id present in
    either corpus as ``added`` (new only), ``removed`` (old only),
    ``changed`` (both, different content), or ``unchanged``. Content
    equality is sha2-256 of the text — two snapshots of a 100 TB crawl
    diff by shipping 32-byte digests through ONE full-outer equi-join on
    id, never the documents themselves. Returns (id, status).
    """
    o = old.select(
        F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("_ho")
    )
    n = new.select(
        F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("_hn")
    )
    return o.join(n, "id", "full_outer").select(
        "id",
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-source content-overlap matrix: exact Jaccard between each
    pair of sources' DISTINCT shingle sets — the corpus-composition
    diagnostic ("how much does crawl A repeat crawl B?") that decides
    mixture weights before any per-document dedup runs. Returns
    (a, b, n_a, n_b, n_common) for a < b; callers derive Jaccard.

    Scale shape: one (group, shingle) distinct aggregation, one
    self-equi-join ON THE SHINGLE (posting lists bounded by the number
    of groups, so the join output is at most |shingles|·groups²/2 —
    groups is small by definition), one count per group pair. Nothing
    document-quadratic; output is groups² rows.
    """
    tok = tokens(F.col(text_col))
    sh = df.select(
        F.col(group_col).alias("_g"),
        F.explode(F.array_distinct(shingles(tok, shingle_n))).alias("_sh"),
    ).distinct()
    sizes = sh.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col("_g").alias("a"), "_sh")
    b = sh.select(F.col("_g").alias("b"), "_sh")
    common = (
        a.join(b, "_sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("_g").alias("a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_g").alias("b"), F.col("_n").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .select("a", "b", "n_a", "n_b", "n_common")
    )


def lexical_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Simpson lexical diversity: 1 − Σ_t (tf_t / n)² — the
    probability that two tokens drawn with replacement differ — as EXACT
    integer arithmetic: ``simpson_num = n² − Σ tf²``
    and only the final ratio is one IEEE divide (rounded to 6 dp), so
    the score is hash-verifiable cross-engine (entropy would drag in
    logs; Simpson ranks repetitive docs the same way without them).

    Returns (id, n_tokens, n_distinct, simpson_num, simpson); documents
    with zero tokens drop out. One explode + two aggregations, both
    keyed by the document — no corpus-wide state, trivially parallel.
    """
    t = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tf = t.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    agg = tf.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("_sumsq"),
    )
    n2 = F.col("n_tokens") * F.col("n_tokens")
    return agg.select(
        id_col,
        "n_tokens",
        "n_distinct",
        (n2 - F.col("_sumsq")).cast("bigint").alias("simpson_num"),
        F.round((n2 - F.col("_sumsq")) / n2, 6).alias("simpson"),
    )


def source_concentration(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
    target_permille: int = 800,
) -> DataFrame:
    """Per-source token-mass concentration — the Pareto audit behind
    mixture design: how few documents hold ``target_permille`` of a
    source's tokens, and how big the single largest doc's share is.
    Returns (source, n_docs, total_tokens, docs_to_target,
    top_doc_share_permille) — all exact integers. A source where 1% of
    docs carry 80% of tokens needs doc-level capping before it is
    mixed, not source-level reweighting.

    Exactness: docs are taken in (token_count DESC, id) order;
    ``docs_to_target`` is the minimal prefix whose token sum reaches
    ceil(total * target / 1000). Computed over the per-(source,
    token_count) HISTOGRAM — the ordered window runs over one row per
    distinct length per source, and the crossing bucket's interior
    offset is an exact ceil division: never a per-doc window, so the
    operator scales with the length histogram, not the corpus.
    """
    tc = df.select(
        F.col(group_col).alias("src"),
        token_count(F.col(text_col)).cast("bigint").alias("_tok"),
    )
    hist = tc.groupBy("src", "_tok").agg(
        F.count(F.lit(1)).alias("_n")
    )
    from pyspark.sql.window import Window

    wdesc = (
        Window.partitionBy("src")
        .orderBy(F.col("_tok").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("src")
    cum = hist.select(
        "src",
        "_tok",
        "_n",
        (F.col("_tok") * F.col("_n")).alias("_mass"),
        F.sum(F.col("_tok") * F.col("_n")).over(wdesc).alias("_cum"),
        F.sum("_n").over(wdesc).alias("_cumd"),
        F.sum(F.col("_tok") * F.col("_n")).over(wall).alias("_tot"),
        F.sum("_n").over(wall).alias("_totd"),
        F.max("_tok").over(wall).alias("_max"),
    )
    thr = F.expr(f"(_tot * {target_permille} + 999) div 1000")
    # first histogram bucket (in DESC length order) whose cumulative
    # token mass reaches the threshold; docs needed inside it is an
    # exact ceil division by the bucket's per-doc length
    crossing = cum.where(
        (F.col("_cum") >= thr) & ((F.col("_cum") - F.col("_mass")) < thr)
    ).select(
        "src",
        "_totd",
        "_tot",
        "_max",
        (
            (F.col("_cumd") - F.col("_n"))
            + F.expr(
                f"((_tot * {target_permille} + 999) div 1000"
                " - (_cum - _mass) + _tok - 1) div _tok"
            )
        ).alias("docs_to_target"),
    )
    empty = (
        cum.groupBy("src")
        .agg(
            F.max("_totd").alias("_totd"),
            F.max("_tot").alias("_tot"),
        )
        .where(F.col("_tot") == 0)
        .select(
            "src",
            "_totd",
            "_tot",
            F.lit(0).cast("bigint").alias("_max"),
            F.lit(0).cast("bigint").alias("docs_to_target"),
        )
    )
    return crossing.unionByName(empty).select(
        F.col("src").alias(group_col),
        F.col("_totd").cast("bigint").alias("n_docs"),
        F.col("_tot").cast("bigint").alias("total_tokens"),
        F.col("docs_to_target").cast("bigint").alias("docs_to_target"),
        F.when(F.col("_tot") > 0, F.expr("_max * 1000 div _tot"))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("top_doc_share_permille"),
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source tokenizer fertility report — the cost model behind
    token-budget planning: how many subword units the BPE-ish tokenizer
    spends per whitespace word (fertility) and per character, by
    source. High-fertility sources (code, non-Latin scripts, noisy
    text) consume budget faster than their word counts suggest.
    Returns (source, n_docs, ws_tokens, bpe_tokens, chars,
    fertility_permille, chars_per_bpe_permille) — exact integers, the
    two ratios as permille integer divisions (0 when the denominator
    is 0).

    Scale shape: pure column expressions folded by ONE
    map-side-combinable aggregation to |sources| rows — no windows, no
    joins, no Python.
    """
    c = F.col(text_col)
    per_doc = df.select(
        F.col(group_col),
        token_count(c).cast("bigint").alias("_ws"),
        token_count_bpe(c).cast("bigint").alias("_bpe"),
        F.length(c).cast("bigint").alias("_ch"),
    )
    agg = per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_ws").cast("bigint").alias("ws_tokens"),
        F.sum("_bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("_ch").cast("bigint").alias("chars"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        "chars",
        F.when(
            F.col("ws_tokens") > 0,
            F.expr("bpe_tokens * 1000 div ws_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("fertility_permille"),
        F.when(
            F.col("bpe_tokens") > 0,
            F.expr("chars * 1000 div bpe_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("chars_per_bpe_permille"),
    )
