"""Similarity search over an embedding column (SURVEY.md §2.9).

Two paths:

- :func:`topk_bruteforce` — exact cosine top-k: one scan of the corpus per
  query batch, queries broadcast. The CORRECTNESS baseline, and the right
  plan whenever |queries| is small (the corpus is scanned once regardless).
- :func:`lsh_topk` — random-hyperplane LSH buckets: corpus and queries hash
  to sign-pattern buckets; only same-bucket candidates score. The SCALE
  path: the corpus scan is replaced by a bucket equi-join (shuffle keyed by
  signature), trading recall for cost. Recall is tested in
  tests/test_llm.py against the brute-force oracle.

All math is double-precision JVM expressions (zip_with + aggregate) — no
Python UDFs; hyperplanes are hash-derived (deterministic, no RNG).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def unit_vector(a: Column) -> Column:
    """L2-normalized copy (doubles); zero vectors stay zero."""
    d = as_double(a)
    n = norm(d)
    return F.when(n > 0, F.transform(d, lambda x: x / n)).otherwise(d)


def cosine(a: Column, b: Column, assume_unit: bool = False) -> Column:
    if assume_unit:
        return dot(a, b)
    da, db = as_double(a), as_double(b)
    na, nb = norm(da), norm(db)
    return F.when((na > 0) & (nb > 0), dot(da, db) / (na * nb)).otherwise(
        F.lit(0.0)
    )


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, rank, cosine_sim).

    The query side is broadcast (it must be small — that is what makes
    brute force viable: one corpus scan total). Ties broken by neighbor id
    for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        unit_vector(F.col(vec_col)).alias("_cu"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit_vector(F.col(vec_col)).alias("_qu"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        dot(F.col("_qu"), F.col("_cu")).alias("cosine_sim"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH
# --------------------------------------------------------------------------

def _plane_weight(table: int, plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1) from sha256 — stable
    across runs and cluster layouts (no RNG; SNIPPETS-style hash trick)."""
    h = hashlib.sha256(f"lsh:{table}:{plane}:{dim}".encode()).digest()
    v = int.from_bytes(h[:8], "big")
    return (v / 2**63) - 1.0


def infer_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the first row (one tiny action). Hash
    planes MUST match the data's true dim: zip_with pads a mismatch with
    NULLs, which would silently collapse every vector into bucket 0."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or not row["d"] or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from column {vec_col}")
    return int(row["d"])


def hyperplane_signature(
    unit_vec: Column, planes: int, dim: int = 64, table: int = 0
) -> Column:
    """Sign-pattern bucket id (bigint) from ``planes`` hash-derived
    hyperplanes. Same signature ⇔ same side of every plane. ``dim`` must
    equal the true vector length — use :func:`infer_dim`."""
    sig = F.lit(0).cast("bigint")
    for p in range(planes):
        w = F.array(
            *[F.lit(_plane_weight(table, p, d)) for d in range(dim)]
        )
        proj = dot(unit_vec, w)
        sig = sig.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    return sig


def ivf_assignments(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF-flat coarse quantization: centroid c = the unit vector of the
    corpus row with the c-th smallest id (deterministic seed pick — a fixed
    Lloyd refinement could follow, but the seed quantizer is already a
    partition function, which is all IVF needs for bucketing). Returns the
    corpus with a ``centroid`` column + the driver-side centroid list.

    Scale shape: the centroid set is tiny (driver-collectable by
    construction); assignment is one broadcast-free scan computing
    n_centroids dots per row; the assigned corpus is then bucketable /
    partitionable by ``centroid`` for pruning at query time.
    """
    seeds = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col), unit_vector(F.col(vec_col)).alias("_u"))
        .collect()
    )
    centroids = [(i, list(r["_u"])) for i, r in enumerate(seeds)]

    # Assignment is numpy-vectorized via mapInPandas: a (batch x dim) @
    # (dim x n_centroids) matmul per Arrow batch — Spark doesn't codegen
    # higher-order-function lambdas, so the zip_with/aggregate dot products
    # would run interpreted (observed ~10x slower at 50k x 16 x 64).
    cmat = [vec for _, vec in centroids]

    def _assign(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(cmat, dtype=np.float64).T  # dim x n_centroids
        for pdf in batches:
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0] = 1.0
            U = V / norms[:, None]
            cent = np.argmax(U @ C, axis=1).astype("int32")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "centroid": cent,
                }
            )

    vec_type = dict(corpus.dtypes)[vec_col]
    assigned = corpus.select(id_col, vec_col).mapInPandas(
        _assign,
        schema=f"{id_col} bigint, {vec_col} {vec_type}, centroid int",
    )
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via IVF: score only corpus rows in the ``n_probe``
    centroids nearest to each query. Returns (query_id, neighbor_id, rank,
    cosine_sim). Recall/cost knob: n_probe/n_centroids. The corpus scan is
    replaced by a centroid-bucket equi-join — the IVF pruning that makes
    billion-vector search tractable."""
    assigned, centroids = ivf_assignments(corpus, n_centroids, vec_col, id_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit_vector(F.col(vec_col)).alias("_qu"),
    )
    qsims = F.array(
        *[
            dot(F.col("_qu"), F.array(*[F.lit(x) for x in vec]))
            for _, vec in centroids
        ]
    )
    # indices of the n_probe largest centroid sims
    probes = F.slice(
        F.reverse(
            F.transform(
                F.array_sort(
                    F.zip_with(
                        qsims,
                        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                        lambda s, i: F.struct(
                            s.alias("s"), i.alias("i")
                        ),
                    )
                ),
                lambda st: st["i"],
            )
        ),
        1,
        n_probe,
    )
    q_probed = q.select(
        "query_id", "_qu", F.explode(probes).alias("centroid")
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        "centroid",
        unit_vector(F.col(vec_col)).alias("_cu"),
    )
    cands = c.join(F.broadcast(q_probed), "centroid", "inner").select(
        "query_id",
        "neighbor_id",
        dot(F.col("_qu"), F.col("_cu")).alias("cosine_sim"),
    )
    if exclude_self:
        cands = cands.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 8,
    tables: int = 4,
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    Each of ``tables`` independent hash tables contributes same-bucket
    candidates; candidates score exactly; top-k per query over the union.
    Returns (query_id, neighbor_id, rank, cosine_sim). Larger ``tables``
    → higher recall, more candidates; larger ``planes`` → smaller buckets.
    ``dim`` defaults to the corpus's actual dimensionality.
    """
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        unit_vector(F.col(vec_col)).alias("_cu"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit_vector(F.col(vec_col)).alias("_qu"),
    )
    c_sigs = c.select(
        "neighbor_id",
        "_cu",
        F.posexplode(
            F.array(
                *[
                    hyperplane_signature(F.col("_cu"), planes, dim, t)
                    for t in range(tables)
                ]
            )
        ).alias("_tbl", "_sig"),
    )
    q_sigs = q.select(
        "query_id",
        "_qu",
        F.posexplode(
            F.array(
                *[
                    hyperplane_signature(F.col("_qu"), planes, dim, t)
                    for t in range(tables)
                ]
            )
        ).alias("_tbl", "_sig"),
    )
    cands = (
        c_sigs.join(q_sigs, ["_tbl", "_sig"], "inner")
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("_qu"), F.col("_cu")).alias("cosine_sim"),
        )
        .distinct()
    )
    if exclude_self:
        cands = cands.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


# --------------------------------------------------------------------------
# int8 quantization (training-data pipeline: 4x smaller vectors, integer
# dot products)
# --------------------------------------------------------------------------

def quantize_int8(a: Column) -> Column:
    """Symmetric per-vector int8 quantization: q_i = round(x_i * 127 /
    max|x|) as INT (range [-127, 127]; zero vectors quantize to zeros).
    Pure JVM expressions — the quantized corpus is 4x smaller on the wire
    and in shuffle, and downstream dot products are exact integer math
    (order-independent, bit-reproducible across engines)."""
    d = as_double(a)
    maxabs = F.array_max(F.transform(d, F.abs))
    scale = F.lit(127.0) / maxabs
    return F.when(
        maxabs > 0,
        F.transform(d, lambda x: F.round(x * scale).cast("int")),
    ).otherwise(F.transform(d, lambda x: F.lit(0)))


def dot_int(a: Column, b: Column) -> Column:
    """Exact integer dot product (LONG accumulator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Cosine top-k over int8-quantized vectors: (query_id, neighbor_id,
    rank, qcos). Same broadcast-query / one-corpus-scan shape as
    :func:`topk_bruteforce`, but the scored payload is 4x smaller and the
    dot product is exact integer arithmetic; qcos = dot_q / sqrt(na * nb)
    with integer norms, so the only floating-point steps are one sqrt and
    one division — deterministic and engine-portable. Ties broken by
    neighbor id."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_int8(F.col(vec_col)).alias("_cq"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantize_int8(F.col(vec_col)).alias("_qq"),
    )
    na = dot_int(F.col("_qq"), F.col("_qq"))
    nb = dot_int(F.col("_cq"), F.col("_cq"))
    dq = dot_int(F.col("_qq"), F.col("_cq"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.when(
            (na > 0) & (nb > 0),
            dq / F.sqrt((na * nb).cast("double")),
        )
        .otherwise(F.lit(0.0))
        .alias("qcos"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "qcos")
    )


# ---------------------------------------------------------------------------
# Reproducible k-means (quantized-grid Lloyd iterations)
# ---------------------------------------------------------------------------

def kmeans_quantized(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grid: int = 1_000_000,
):
    """Lloyd's k-means with BIT-REPRODUCIBLE arithmetic: coordinates are
    quantized to an integer grid (``round(x·grid)``, lossless at float32
    input precision for grid=1e6), so every distance is an exact int64
    sum of squares and every comparison/tie-break is order-independent —
    the same clusters fall out on any partitioning, any cluster size,
    and any engine (a SQL replica reproduces the run hash-for-hash;
    squared norms stay < 2^53, so even double-domain dot products are
    exact). The un-quantized alternative is nondeterministic in the
    last ulp through summation order, which Lloyd's argmin can amplify
    into different clusterings.

    Init: the ``k`` lowest-``id_col`` rows (the ivf_assignments seed
    convention). Update: per-dimension exact integer sums, re-quantized
    via floor(sum/n + 0.5); a cluster that loses all members KEEPS its
    previous centroid (indices stay stable). Assignment is a numpy
    int64 matmul per Arrow batch (exact), argmin ties to the lowest
    cluster index.

    Returns (assignments DataFrame (id, cluster, d2), centroids list) —
    d2 is the exact squared grid-distance to the winning centroid.
    Scale: the only shuffles are the k×dim-row update aggregations; the
    centroid set stays driver-sized by construction (same contract as
    :func:`ivf_assignments`).
    """
    q = corpus.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * grid, 0).cast("bigint"),
        ).alias("_qv"),
    ).persist()
    try:
        cents = [
            list(r["_qv"])
            for r in q.orderBy(id_col).limit(k).collect()
        ]
        assigned = None
        for it in range(n_iter):
            assigned = _kmeans_assign(q, cents, id_col)
            if it == n_iter - 1:
                break  # final assignment is the result; no update follows
            sums = (
                assigned.join(q, id_col)
                .select("cluster", F.posexplode("_qv").alias("pos", "x"))
                .groupBy("cluster", "pos")
                .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            import math

            by_c: dict = {}
            for r in sums:
                by_c.setdefault(r["cluster"], {})[r["pos"]] = (
                    r["s"], r["n"]
                )
            cents = [
                (
                    [
                        int(math.floor(by_c[c][p][0] / by_c[c][p][1] + 0.5))
                        for p in range(len(cents[c]))
                    ]
                    if c in by_c
                    else cents[c]
                )
                for c in range(len(cents))
            ]
        return assigned, cents
    finally:
        q.unpersist()


def _kmeans_assign(q: DataFrame, cents, id_col: str) -> DataFrame:
    """argmin_c ||v - c||² on the integer grid — exact int64 math,
    first-minimum tie-break (== ORDER BY d2, cluster)."""
    cmat = [list(c) for c in cents]

    def _assign(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(cmat, dtype=np.int64)          # k x dim
        cn = (C * C).sum(axis=1)                      # k
        for pdf in batches:
            V = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["_qv"]]
            )
            vn = (V * V).sum(axis=1)                  # b
            d2 = vn[:, None] + cn[None, :] - 2 * (V @ C.T)
            best = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": best.astype("int32"),
                    "d2": d2[np.arange(len(best)), best],
                }
            )

    return q.mapInPandas(
        _assign, schema=f"{id_col} bigint, cluster int, d2 bigint"
    )


def semantic_prune(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    threshold_num: int = 9,
    threshold_den: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grid: int = 1_000_000,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    2303.09540): k-means clusters bound the quadratic, then within each
    cluster a vector is PRUNED when a lower-id cluster-mate lies within
    the cosine threshold (the deterministic reading of SemDeDup's
    keep-one-per-epsilon-ball greedy — fixed id order, drop on any
    lower-id near neighbor). Returns the SURVIVORS as (id_col, cluster).

    The prune decision is BIT-EXACT, not float-boundary-fragile: with
    vectors on the 1e-6 integer grid (the :func:`kmeans_quantized`
    quantizer), cos(u,v) >= num/den iff

        dot > 0  AND  den²·dot² >= num²·|u|²·|v|²

    — integer dot products stay below 2^53 (exact even in double) and
    the squared products (~10^30) are carried in decimal(38,0), so every
    engine, partitioning, and summation order prunes the same set.

    Scale: the only quadratic is the per-cluster self-join — pick k so
    the largest cluster's pairs fit a shuffle partition (SemDeDup's own
    contract: clustering exists exactly to bound this); the cluster key
    is the shuffle key, so one oversized cluster is a skew hotspot
    (salt or split it, or raise k).
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must be a rational in (0, 1]")
    assigned, _ = kmeans_quantized(
        corpus, k, n_iter, vec_col, id_col, grid
    )

    def idot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )

    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * grid, 0).cast("bigint"),
    )
    base = (
        corpus.select(F.col(id_col), qv.alias("_qv"))
        .join(assigned.select(id_col, "cluster"), id_col)
        .select(
            F.col(id_col),
            "cluster",
            "_qv",
            idot(F.col("_qv"), F.col("_qv")).alias("_n2"),
        )
        .localCheckpoint(eager=True)  # two consumers of the same frame
    )
    a = base.select(
        F.col(id_col).alias("_aid"),
        "cluster",
        F.col("_qv").alias("_va"),
        F.col("_n2").alias("_n2a"),
    )
    b = base.select(
        F.col(id_col).alias("_bid"),
        "cluster",
        F.col("_qv").alias("_vb"),
        F.col("_n2").alias("_n2b"),
    )
    d = idot(F.col("_va"), F.col("_vb"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    close = (d > 0) & (
        dec(d) * dec(d) * F.lit(threshold_den * threshold_den)
        >= dec(F.col("_n2a"))
        * dec(F.col("_n2b"))
        * F.lit(threshold_num * threshold_num)
    )
    dropped = (
        a.join(b, "cluster")
        .where(F.col("_bid") < F.col("_aid"))
        .where(close)
        .select(F.col("_aid").alias(id_col))
        .distinct()
    )
    return (
        base.join(dropped, id_col, "left_anti")
        .select(id_col, "cluster")
    )


def label_centroid_outliers(
    corpus: DataFrame,
    top_k: int = 20,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    grid: int = 10**6,
) -> DataFrame:
    """Embedding anomaly detection: the ``top_k`` vectors farthest from
    their own label's centroid — mislabeled/garbage-embedding triage for
    a labeled corpus.

    Runs on the same bit-reproducible integer grid as
    :func:`kmeans_quantized`: coordinates quantize to ``round(x·grid)``
    int64, the per-label centroid is the exact integer mean re-quantized
    with floor(s/n + 0.5), and every distance is an exact int64 sum of
    squares — identical on any partitioning and in a SQL oracle.

    Plan: one positional explode (rows × dim), one (label, pos)
    centroid aggregation (#labels × dim rows — broadcasts), one join
    back + per-vector distance aggregation, TakeOrdered top-k. Nothing
    quadratic; everything keyed by (label, pos) or the vector id.
    """
    q = corpus.select(
        F.col(id_col),
        F.col(label_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * grid, 0).cast("bigint"),
        ).alias("_qv"),
    )
    ex = q.select(
        id_col, label_col, F.posexplode("_qv").alias("pos", "x")
    )
    cen = ex.groupBy(label_col, "pos").agg(
        F.floor(
            F.sum("x").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
        )
        .cast("long")
        .alias("_c")
    )
    diff = F.col("x") - F.col("_c")
    return (
        ex.join(cen, [label_col, "pos"])
        .groupBy(id_col, label_col)
        .agg(F.sum(diff * diff).alias("d2"))
        .orderBy(F.col("d2").desc(), id_col)
        .limit(top_k)
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 200_000,
) -> DataFrame:
    """Exact all-pairs cosine kNN edge list: (a, b, rank) — every vector's
    k nearest neighbors (self excluded, ties broken by neighbor id), the
    construction step of kNN-graph clustering.

    The corpus matrix ships to every task in the UDF closure (it must be
    broadcast-scale for brute force to make sense at all — ``max_rows``
    raises past that; at 100 TB you build the kNN graph per IVF cell or
    LSH bucket with the same scoring kernel, see ``ivf_topk``). Scoring
    is a numpy (batch × dim) @ (dim × N) matmul per Arrow batch —
    Spark doesn't codegen higher-order-function lambdas, so the
    zip_with/aggregate dot products run interpreted (~10× slower,
    measured 35s vs 3s on 2000 × 64 all-pairs); ranking is
    ``np.lexsort((ids, -scores))`` so equal scores order by neighbor id,
    matching the SQL window's ORDER BY s DESC, b.
    """
    n = corpus.count()
    if n > max_rows:
        raise ValueError(
            f"brute-force kNN over {n} rows exceeds max_rows={max_rows}; "
            "bucket the corpus first (IVF cells / LSH buckets)"
        )
    rows = corpus.select(id_col, vec_col).collect()
    ids = [r[id_col] for r in rows]
    mat = [list(r[vec_col]) for r in rows]

    def _score(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(mat, dtype=np.float64)
        cn = np.linalg.norm(C, axis=1)
        cn[cn == 0] = 1.0
        CU = (C / cn[:, None]).T  # dim x N
        cid = np.asarray(ids, dtype=np.int64)
        for pdf in batches:
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(V) == 0:
                continue
            vn = np.linalg.norm(V, axis=1)
            vn[vn == 0] = 1.0
            S = (V / vn[:, None]) @ CU  # batch x N
            qid = pdf[id_col].to_numpy(dtype="int64")
            S[qid[:, None] == cid[None, :]] = -np.inf  # exclude self
            order = np.lexsort((cid[None, :].repeat(len(V), 0), -S), axis=1)
            top = order[:, :k]
            yield pd.DataFrame(
                {
                    "a": np.repeat(qid, k),
                    "b": cid[top].ravel(),
                    "rank": np.tile(np.arange(1, k + 1), len(V)),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        _score, schema="a bigint, b bigint, rank int"
    )


def pq_codes(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grid: int = 1_000_000,
):
    """Product quantization (Jégou et al. 2011) — THE memory-scaling
    technique for billion-vector ANN: split each vector into ``m``
    subspaces, k-means each subspace independently, store only the m
    codeword ids (m·log2(k) bits per vector instead of dim·32).

    Built on :func:`kmeans_quantized`, so the whole training +
    encoding pipeline is BIT-REPRODUCIBLE (integer-grid distances,
    first-k-by-id init per subspace, first-minimum ties) — a SQL
    replica reproduces codes hash-for-hash. Returns
    (codes DataFrame (id, code_0..code_{m-1}, quant_err), codebooks)
    where quant_err is the exact total squared grid-space quantization
    error (the PQ reconstruction residual) and codebooks is the
    m-list of k×(dim/m) integer centroid lists.

    Scale shape: m independent kmeans runs over column slices (each
    a narrow projection of one corpus scan); codebooks are
    driver-sized by construction (m·k·dim/m = k·dim ints). Encoding a
    100 TB corpus is one mapInPandas pass per subspace against a
    broadcast codebook.
    """
    dim = infer_dim(corpus, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    codes = None
    codebooks = []
    total_err = None
    for j in range(m):
        sdf = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col),
        )
        assigned, cents = kmeans_quantized(
            sdf, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col,
            grid=grid,
        )
        codebooks.append(cents)
        part = assigned.select(
            id_col,
            F.col("cluster").alias(f"code_{j}"),
            F.col("d2").alias(f"_err_{j}"),
        )
        codes = part if codes is None else codes.join(part, id_col)
    err = None
    for j in range(m):
        e = F.col(f"_err_{j}")
        err = e if err is None else err + e
    codes = codes.select(
        id_col,
        *[f"code_{j}" for j in range(m)],
        err.cast("bigint").alias("quant_err"),
    )
    return codes, codebooks


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k_neighbors: int = 10,
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grid: int = 1_000_000,
) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC): queries stay full-precision
    (on the integer grid), corpus vectors are m codeword ids — the
    estimated distance is the sum over subspaces of the exact grid
    distance from the query's sub-vector to the ASSIGNED codeword.
    Returns (query_id, neighbor_id, rank, adc_d2); self-matches
    excluded. Approximate BY DESIGN (quantization error), but
    bit-deterministic: every number is integer-domain, so the ranking
    is engine-reproducible and SQL-oracleable.

    Scale shape: the per-(query, subspace, codeword) distance table is
    nq·m·k rows (driver-tiny, built from the collected query set —
    queries must be small, same contract as :func:`topk_bruteforce`);
    ADC is codes-explode ⋈ broadcast table ⋈ one groupBy — the corpus
    is touched once, carrying only its m small ints per row.
    """
    codes, codebooks = pq_codes(
        corpus, m=m, k=k, n_iter=n_iter, vec_col=vec_col,
        id_col=id_col, grid=grid,
    )
    dim = len(codebooks[0][0]) * m
    sub = dim // m
    qrows = (
        queries.select(
            F.col(id_col),
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * grid, 0).cast(
                    "bigint"
                ),
            ).alias("_qv"),
        )
        .collect()
    )
    spark = corpus.sparkSession
    table_rows = []
    for r in qrows:
        qv = list(r["_qv"])
        for j in range(m):
            qs = qv[j * sub : (j + 1) * sub]
            for c, cent in enumerate(codebooks[j]):
                d2 = sum((a - b) ** 2 for a, b in zip(qs, cent))
                table_rows.append((r[id_col], j, c, d2))
    lut = spark.createDataFrame(
        table_rows, "query_id bigint, _j int, _code int, _d2 bigint"
    )
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(
            F.array(*[F.col(f"code_{j}") for j in range(m)])
        ).alias("_j", "_code"),
    )
    adc = (
        exploded.join(F.broadcast(lut), ["_j", "_code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("_d2").alias("adc_d2"))
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2"), F.col("neighbor_id")
    )
    return (
        adc.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).alias("rank"),
            "adc_d2",
        )
        .where(F.col("rank") <= k_neighbors)
    )


def clustering_label_agreement(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    grid: int = 1_000_000,
) -> DataFrame:
    """Adjusted Rand Index of the deterministic k-means clustering
    against ground-truth labels — the external-validity check run
    after every embedding-space clustering. One row: (n, n_clusters,
    n_labels, sum_comb_cells, sum_comb_clusters, sum_comb_labels,
    ari) where the three pair-count sums are EXACT BIGINTs (Σ C(n,2)
    over the contingency table and its margins) and ARI is the one
    closed-form float at the end, computed with the same
    left-association in the oracle.

    Shape: one groupBy to the contingency table (≤ k·|labels| rows),
    margins as two more tiny aggregations — no pairs materialized
    anywhere (the C(n,2) identity does the pair counting).
    """
    assigned, _ = kmeans_quantized(
        corpus, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col,
        grid=grid,
    )
    labs = corpus.select(F.col(id_col), F.col(label_col).alias("_lab"))
    ct = (
        assigned.join(labs, id_col)
        .groupBy("cluster", "_lab")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    )
    rows_m = ct.groupBy("cluster").agg(
        F.sum("_n").cast("bigint").alias("_n")
    )
    cols_m = ct.groupBy("_lab").agg(
        F.sum("_n").cast("bigint").alias("_n")
    )
    # one tagged union -> one 1-row aggregate (no scalar cross-joins);
    # C(n,2) stays in integer domain via div
    tagged = (
        ct.select(
            F.lit("cell").alias("_t"), "_n",
            F.col("cluster").cast("string").alias("_k"),
            F.col("_lab").cast("string").alias("_l"),
        )
        .unionByName(
            rows_m.select(
                F.lit("row").alias("_t"), "_n",
                F.lit(None).cast("string").alias("_k"),
                F.lit(None).cast("string").alias("_l"),
            )
        )
        .unionByName(
            cols_m.select(
                F.lit("col").alias("_t"), "_n",
                F.lit(None).cast("string").alias("_k"),
                F.lit(None).cast("string").alias("_l"),
            )
        )
    )
    comb2 = F.expr("_n * (_n - 1) div 2")
    cell = F.col("_t") == "cell"
    out = tagged.agg(
        F.sum(F.when(cell, F.col("_n")).otherwise(0))
        .cast("bigint")
        .alias("n"),
        F.countDistinct(F.when(cell, F.col("_k"))).cast("bigint")
        .alias("n_clusters"),
        F.countDistinct(F.when(cell, F.col("_l"))).cast("bigint")
        .alias("n_labels"),
        F.sum(F.when(cell, comb2).otherwise(0))
        .cast("bigint")
        .alias("sum_comb_cells"),
        F.sum(F.when(F.col("_t") == "row", comb2).otherwise(0))
        .cast("bigint")
        .alias("sum_comb_clusters"),
        F.sum(F.when(F.col("_t") == "col", comb2).otherwise(0))
        .cast("bigint")
        .alias("sum_comb_labels"),
    )
    n2 = F.expr("n * (n - 1) div 2").cast("double")
    expected = (
        F.col("sum_comb_clusters").cast("double")
        * F.col("sum_comb_labels").cast("double")
        / n2
    )
    maxi = (
        F.col("sum_comb_clusters").cast("double")
        + F.col("sum_comb_labels").cast("double")
    ) / F.lit(2.0)
    # degenerate partitions (k=1 cluster or a single label) make
    # maxi == expected; ARI is conventionally 1.0 there — both trivial
    # partitions are identical (ADVICE r8; guard mirrored in the oracle)
    ari = F.when(
        maxi != expected,
        (F.col("sum_comb_cells").cast("double") - expected)
        / (maxi - expected),
    ).otherwise(F.lit(1.0))
    return out.select(
        "n",
        "n_clusters",
        "n_labels",
        "sum_comb_cells",
        "sum_comb_clusters",
        "sum_comb_labels",
        F.round(ari, 6).alias("ari"),
    )


def embedding_dim_profile(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grid: int = 1_000_000,
) -> DataFrame:
    """Per-dimension embedding health profile — the data-quality gate
    before any ANN/clustering run: dead dimensions (constant), stuck
    signs, collapsed variance. One row per dimension: (dim_idx, min_q,
    max_q, median_q, n_distinct, n_zero) with every statistic on the
    exact 1e-6 integer grid (the kmeans_quantized contract), median =
    type-1 lower median via integer ranks.

    Scale shape: one posexplode to (dim, value) + a per-(dim, value)
    HISTOGRAM groupBy; the ordered median window runs over histogram
    rows (distinct values per dimension), never the corpus; min/max/
    distinct/zero fold into the same aggregation.
    """
    from pyspark.sql.window import Window

    q = corpus.select(
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * grid, 0).cast(
                    "bigint"
                ),
            )
        ).alias("dim_idx", "_v")
    )
    hist = q.groupBy("dim_idx", "_v").agg(
        F.count(F.lit(1)).alias("_n")
    )
    wcum = (
        Window.partitionBy("dim_idx")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("dim_idx")
    cum = hist.select(
        "dim_idx",
        "_v",
        "_n",
        F.sum("_n").over(wcum).alias("_cum"),
        F.sum("_n").over(wall).alias("_tot"),
    )
    med_rank = F.expr("(_tot * 500 + 999) div 1000")
    return (
        cum.groupBy("dim_idx")
        .agg(
            F.min("_v").cast("bigint").alias("min_q"),
            F.max("_v").cast("bigint").alias("max_q"),
            F.min(
                F.when(F.col("_cum") >= med_rank, F.col("_v"))
            ).cast("bigint").alias("median_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum(F.when(F.col("_v") == 0, F.col("_n")).otherwise(0))
            .cast("bigint")
            .alias("n_zero"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    grid: int = 1_000_000,
) -> DataFrame:
    """Hard-negative mining — the contrastive-training data op: for
    each query vector, the ``k`` NEAREST neighbors with a DIFFERENT
    label (near in embedding space, wrong by ground truth: exactly the
    pairs a contrastive loss learns most from). Distances are exact
    int64 squared grid distances (numpy matmul per Arrow batch, the
    kmeans_quantized discipline), ranking ties break by neighbor id —
    bit-reproducible, SQL-certifiable. Returns (query_id, neighbor_id,
    rank, d2, neighbor_label).

    Scale shape: query side collected + broadcast (small by contract,
    as :func:`topk_bruteforce`); one corpus scan computes all
    query-distances per row; label filter before the top-k window.
    """
    from pyspark.sql.window import Window

    qpdf = (
        queries.select(
            F.col(id_col),
            F.col(label_col),
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * grid, 0).cast(
                    "bigint"
                ),
            ).alias("_qv"),
        )
        .collect()
    )
    qids = [r[id_col] for r in qpdf]
    qlabels = {r[id_col]: r[label_col] for r in qpdf}
    qmat = [list(r["_qv"]) for r in qpdf]

    corpus_q = corpus.select(
        F.col(id_col),
        F.col(label_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * grid, 0).cast(
                "bigint"
            ),
        ).alias("_qv"),
    )

    def _score(batches):
        import numpy as np
        import pandas as pd

        Q = np.asarray(qmat, dtype=np.int64)          # nq x dim
        qn = (Q * Q).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["_qv"]]
            )
            vn = (V * V).sum(axis=1)
            d2 = vn[:, None] + qn[None, :] - 2 * (V @ Q.T)
            n, nq = d2.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(
                        pdf[id_col].to_numpy(), nq
                    ),
                    "neighbor_label": np.tile(
                        pdf[label_col].to_numpy(), nq
                    ),
                    "d2": d2.T.reshape(-1),
                }
            )

    scored = corpus_q.mapInPandas(
        _score,
        schema=(
            "query_id bigint, neighbor_id bigint,"
            " neighbor_label int, d2 bigint"
        ),
    )
    qlab = F.create_map(
        *[
            x
            for qid in qids
            for x in (F.lit(qid), F.lit(qlabels[qid]))
        ]
    )
    filtered = scored.where(
        F.col("neighbor_label")
        != F.element_at(qlab, F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2"), F.col("neighbor_id")
    )
    return filtered.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w).alias("rank"),
        "d2",
        "neighbor_label",
    ).where(F.col("rank") <= k)


def label_noise_knn(
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    grid: int = 1_000_000,
    max_rows: int = 200_000,
) -> DataFrame:
    """kNN label-noise audit — the training-data quality gate for
    labeled embeddings: for every vector, how many of its ``k``
    nearest neighbors carry a DIFFERENT label, aggregated per label to
    (label, n_vectors, k, n_disagree, disagree_ppm). A label whose
    members' neighborhoods disagree heavily is either mislabeled data
    or a class the embedding cannot separate — both need a look before
    training.

    Exactness: distances are int64 squared grid distances (the
    kmeans_quantized contract), ranking ties break by neighbor id, the
    ppm is integer DIV — the whole report is engine-reproducible.

    Scale shape: the corpus matrix ships in the UDF closure
    (``max_rows``-gated like :func:`knn_graph`; at 100 TB run the same
    kernel per IVF cell / LSH bucket); scoring is one numpy int64
    matmul per Arrow batch; the output aggregate is |labels| rows.
    """
    n = corpus.count()
    if n > max_rows:
        raise ValueError(
            f"brute-force kNN over {n} rows exceeds max_rows="
            f"{max_rows}; bucket the corpus first (IVF/LSH)"
        )
    if k > n - 1:
        # with self-matches masked there are only n-1 candidate
        # neighbors; a larger k would select masked sentinel rows and
        # count them as disagreements (ADVICE r8)
        raise ValueError(f"k={k} exceeds n-1={n - 1} candidate neighbors")
    base = corpus.select(
        F.col(id_col),
        F.col(label_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * grid, 0).cast(
                "bigint"
            ),
        ).alias("_qv"),
    )
    rows = base.collect()
    ids = [r[id_col] for r in rows]
    labels = [r[label_col] for r in rows]
    mat = [list(r["_qv"]) for r in rows]

    def _score(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(mat, dtype=np.int64)
        cn = (C * C).sum(axis=1)
        cid = np.asarray(ids, dtype=np.int64)
        clab = np.asarray(labels)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["_qv"]]
            )
            vn = (V * V).sum(axis=1)
            D = vn[:, None] + cn[None, :] - 2 * (V @ C.T)
            qid = pdf[id_col].to_numpy(dtype="int64")
            # exclude self with an INT64 sentinel: a float64 cast
            # would lose exactness above 2^53, breaking the
            # bit-reproducible contract on larger grids/dims (ADVICE
            # r8); int64 max sorts self-matches last exactly
            D[qid[:, None] == cid[None, :]] = np.iinfo(np.int64).max
            order = np.lexsort(
                (cid[None, :].repeat(len(V), 0), D), axis=1
            )
            top = order[:, :k]
            diff = (
                clab[top] != pdf[label_col].to_numpy()[:, None]
            ).sum(axis=1)
            yield pd.DataFrame(
                {
                    "label": pdf[label_col],
                    "n_disagree": diff.astype("int64"),
                }
            )

    per_vec = base.mapInPandas(
        _score, schema="label int, n_disagree bigint"
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.lit(k).cast("int").alias("k"),
        F.sum("n_disagree").cast("bigint").alias("n_disagree"),
    ).select(
        "*",
        F.expr(f"n_disagree * 1000000 div (n_vectors * {k})")
        .cast("bigint")
        .alias("disagree_ppm"),
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 4,
    lambda_permille: int = 700,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` corpus vectors maximizing
    λ·relevance(c, q) − (1−λ)·max_{s∈picked} redundancy(c, s) — the
    diversity-aware top-k that plain cosine top-k lacks (its results
    cluster around one mode; MMR spreads them). ``queries`` must be a
    SINGLE-row frame (MMR is per-query; loop queries outside — each
    run is one corpus scan per round).

    Exactness contract (the label_noise_knn grid discipline): vectors
    quantize to the int64 1e6 grid (ROUND(x·1e6)), relevance and
    redundancy are exact BIGINT inner products on the grid, and λ is a
    permille integer — the greedy argmax is (score DESC, id ASC), a
    total order a SQL oracle reproduces round by round. With λ in
    permille and 64-dim grid dots bounded by ~6e14, scores stay below
    2^63. Returns (rank, id, relevance, mmr_score).

    Similarity is the raw INNER PRODUCT on the grid (MIPS-MMR): for
    classic cosine MMR, L2-normalize the embedding column upstream —
    normalizing inside the operator would put an engine-specific
    float norm in front of the quantizer and break the exact-integer
    contract (a last-ulp norm difference can flip a ROUND boundary).

    Scale shape: the corpus is grid-quantized + relevance-scored in ONE
    scan and localCheckpointed (id, rel, grid vector); each round is a
    pure-expression score over that frame (redundancy = greatest of ≤k
    literal-vector dots, the picked vectors being driver-held by
    definition of k) + a top-1 argmax (TakeOrdered, never a global
    sort). k rounds = k scans of the checkpointed frame, nothing
    quadratic, no window.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0 <= lambda_permille <= 1000:
        raise ValueError("lambda_permille must be in [0, 1000]")
    grid = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1000000.0).cast("bigint"),
    )
    # quantize the query with the SAME engine expression — Python's
    # round() is half-to-even while F.round/DuckDB ROUND are
    # half-away-from-zero, an exact-.5 divergence this avoids entirely
    qrows = queries.select(
        F.col(id_col).alias("_qid"), grid.alias("_qg")
    ).collect()
    if len(qrows) != 1:
        raise ValueError("queries must contain exactly one row")
    qgrid = [int(x) for x in qrows[0]["_qg"]]
    qlit = F.array(*[F.lit(v) for v in qgrid])
    base = (
        corpus.select(
            F.col(id_col).alias("id"), grid.alias("_gv")
        )
        .where(F.col("id") != F.lit(int(qrows[0]["_qid"])))
        .select(
            "id",
            "_gv",
            F.aggregate(
                F.zip_with(F.col("_gv"), qlit, lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("relevance"),
        )
        .localCheckpoint(eager=True)
    )
    lam = int(lambda_permille)
    picked: list[tuple] = []
    picked_vecs: list[list[int]] = []
    for rank in range(1, k + 1):
        cand = base.where(
            ~F.col("id").isin([p[1] for p in picked])
            if picked
            else F.lit(True)
        )
        if picked_vecs:
            red = F.greatest(
                *[
                    F.aggregate(
                        F.zip_with(
                            F.col("_gv"),
                            F.array(*[F.lit(v) for v in pv]),
                            lambda a, b: a * b,
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, v: acc + v,
                    )
                    for pv in picked_vecs
                ]
            ) if len(picked_vecs) > 1 else F.aggregate(
                F.zip_with(
                    F.col("_gv"),
                    F.array(*[F.lit(v) for v in picked_vecs[0]]),
                    lambda a, b: a * b,
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            )
            score = (
                F.lit(lam) * F.col("relevance") - F.lit(1000 - lam) * red
            )
        else:
            score = F.lit(lam) * F.col("relevance")
        top = (
            cand.select("id", "_gv", "relevance", score.alias("_s"))
            .orderBy(F.col("_s").desc(), F.col("id").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        picked.append((rank, int(row.id), int(row.relevance), int(row._s)))
        picked_vecs.append([int(x) for x in row._gv])
    return corpus.sparkSession.createDataFrame(
        picked,
        "rank int, id bigint, relevance bigint, mmr_score bigint",
    )
