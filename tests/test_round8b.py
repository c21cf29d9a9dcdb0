"""Round-8 second-block operators: skyline, k-per-group sampling,
winsorization, l-diversity, inter-arrival quantiles, Katz, category
mixing, SCC condensation, dedup recall eval, dedup cluster stats.
Each test pins exact semantics on a hand-built frame where the answer
is verifiable by inspection (the FIXTURES.md discipline)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- skyline
def test_skyline_exact_2d(spark):
    from akka_graph_db_spark.functions.skyline import skyline

    # (size, price): maximize size, minimize price.
    rows = [
        (1, 10, 100.0),   # dominated by 4 (same size, cheaper)
        (2, 20, 150.0),   # skyline
        (3, 5, 50.0),     # skyline (cheapest)
        (4, 10, 80.0),    # skyline
        (5, 20, 200.0),   # dominated by 2
        (6, 20, 150.0),   # duplicate criteria of 2 -> co-skyline
    ]
    df = spark.createDataFrame(rows, "id int, size int, price double")
    got = sorted(
        r.id
        for r in skyline(
            df, maximize=["size"], minimize=["price"]
        ).collect()
    )
    assert got == [2, 3, 4, 6]


def test_skyline_matches_bruteforce_3d(spark):
    from akka_graph_db_spark.functions.skyline import skyline

    import itertools
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.randint(0, 9), rng.randint(0, 9), rng.randint(0, 9))
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "id int, x int, y int, z int"
    ).repartition(5)
    got = sorted(
        r.id
        for r in skyline(
            df, maximize=["x", "y"], minimize=["z"]
        ).collect()
    )

    def dominated(p, q):  # q dominates p?
        ge = q[1] >= p[1] and q[2] >= p[2] and q[3] <= p[3]
        gt = q[1] > p[1] or q[2] > p[2] or q[3] < p[3]
        return ge and gt

    want = sorted(
        p[0]
        for p in rows
        if not any(dominated(p, q) for q in rows)
    )
    assert got == want


def test_skyline_requires_criteria(spark):
    from akka_graph_db_spark.functions.skyline import skyline

    df = spark.createDataFrame([(1, 2)], "id int, x int")
    with pytest.raises(ValueError):
        skyline(df)


# ---------------------------------------------------- sample_k_per_group
def test_sample_k_per_group_deterministic_and_stable(spark):
    from akka_graph_db_spark.functions.mixture import sample_k_per_group

    rows = [(i, "g%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    s1 = sample_k_per_group(df, k=5)
    got = {(r.source, r.doc_id, r._rank) for r in s1.collect()}
    assert len(got) == 15
    assert all(rk <= 5 for (_, _, rk) in got)
    # repartition-invariant (hash rank, not row order)
    s2 = sample_k_per_group(df.repartition(7), k=5)
    assert {(r.source, r.doc_id, r._rank) for r in s2.collect()} == got
    # growth-stability: adding rows never evicts a survivor whose hash
    # rank stays <= k; with k above group size, everything survives
    s3 = sample_k_per_group(df, k=1000)
    assert s3.count() == 90


# ------------------------------------------------------------- winsorize
def test_winsorize_by_group_exact_cuts(spark):
    from akka_graph_db_spark.functions.profile import winsorize_by_group

    vals = list(range(1, 101))  # 1..100, one group
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "g string, v double"
    )
    out = winsorize_by_group(
        df, "g", "v", lower_permille=100, upper_permille=900
    ).collect()[0]
    # ceil(100*100/1000)=10 -> lo_cut = 10th smallest = 10
    # ceil(100*900/1000)=90 -> hi_cut = 90
    assert out.lo_cut == 10.0 and out.hi_cut == 90.0
    assert out.n_clipped_low == 9 and out.n_clipped_high == 10
    want = sum(min(90, max(10, v)) for v in vals)
    assert out.winsorized_sum == want and out.n == 100


def test_winsorize_rejects_bad_permilles(spark):
    from akka_graph_db_spark.functions.profile import winsorize_by_group

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        winsorize_by_group(df, "g", "v", 500, 100)


# ----------------------------------------------------------- l-diversity
def test_l_diversity_report(spark):
    from akka_graph_db_spark.functions.profile import l_diversity_report

    rows = [
        ("a", 1, "x"), ("a", 1, "x"),          # group (a,1): 1 distinct
        ("a", 2, "x"), ("a", 2, "y"),          # group (a,2): 2 distinct
        ("b", 1, "z"),                          # group (b,1): 1 distinct
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 int, s string")
    out = l_diversity_report(df, ["q1", "q2"], "s", l=2).collect()[0]
    assert out.n_rows == 5 and out.n_groups == 3
    assert out.min_diversity == 1
    assert out.n_groups_below_l == 2 and out.n_rows_below_l == 3
    assert out.below_l_permille == 600


# ------------------------------------------------- interarrival_quantiles
def test_interarrival_quantiles_exact(spark):
    from akka_graph_db_spark.functions import events as ev
    import datetime as dt

    base = dt.datetime(2020, 1, 1)
    rows = []
    # key k1 in group G: dates 0, 10, 30 -> gaps 10, 20
    for i, d in enumerate([0, 10, 30]):
        rows.append(("G", "k1", base + dt.timedelta(days=d), i))
    # key k2 in group G: dates 0, 5 -> gap 5
    for i, d in enumerate([0, 5]):
        rows.append(("G", "k2", base + dt.timedelta(days=d), i))
    df = spark.createDataFrame(
        rows, "g string, k string, ts timestamp, oid int"
    )
    out = ev.interarrival_quantiles(
        df, key_col="k", ts_col="ts", group_col="g", order_col="oid"
    ).collect()[0]
    # gaps {5, 10, 20}: median rank ceil(3*500/1000)=2 -> 10;
    # p90 rank ceil(3*900/1000)=3 -> 20
    assert out.n_gaps == 3
    assert out.min_gap_days == 5 and out.max_gap_days == 20
    assert out.median_gap_days == 10 and out.p90_gap_days == 20


# ------------------------------------------------------------------ katz
def test_katz_path_graph(spark):
    from akka_graph_db_spark.operators.analytics import katz_centrality

    # path 1-2-3: walk counts by hand.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "a bigint, b bigint"
    )
    out = {r.id: r for r in katz_centrality(pairs, max_len=3).collect()}
    # w1 = degree: 1,2,1. w2(v) = sum of neighbor degrees:
    # w2(1)=deg(2)=2, w2(2)=deg(1)+deg(3)=2, w2(3)=2.
    # w3(v) = sum of neighbor w2: w3(1)=w2(2)=2, w3(2)=w2(1)+w2(3)=4,
    # w3(3)=2.
    assert (out[1].walks_1, out[1].walks_2, out[1].walks_3) == (1, 2, 2)
    assert (out[2].walks_1, out[2].walks_2, out[2].walks_3) == (2, 2, 4)
    assert out[1].katz_nano == 1_000_000 + 2_000 + 2
    assert out[2].katz_nano == 2_000_000 + 2_000 + 4


# -------------------------------------------------------- category_mixing
def test_category_mixing_counts(spark):
    from akka_graph_db_spark.operators.analytics import category_mixing

    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3), (3, 3)], "a bigint, b bigint"
    )  # dup + reversed + self-loop all collapse to 3 edges
    cats = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "Y")], "id bigint, category string"
    )
    got = {
        (r.cat_lo, r.cat_hi): (r.n_edges, r.same_category)
        for r in category_mixing(pairs, cats).collect()
    }
    assert got == {("X", "X"): (1, True), ("X", "Y"): (2, False)}


# ------------------------------------------------------- scc_condensation
def test_scc_condensation_two_blocs(spark):
    from akka_graph_db_spark.operators.analytics import scc_condensation

    # bloc {1,2} (2-cycle) -> bloc {3,4} (2-cycle) via two edges + a
    # singleton 5 fed from bloc 2.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3), (1, 3), (2, 4), (4, 5)],
        "a bigint, b bigint",
    )
    got = {
        (r.scc_a, r.scc_b): r.n_edges
        for r in scc_condensation(edges).collect()
    }
    assert got == {(1, 3): 2, (3, 5): 1}


# ------------------------------------------------------ dedup eval/stats
def test_dedup_recall_eval_small(spark):
    from akka_graph_db_spark.functions.dedup import dedup_recall_eval

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),        # exact dup of 1
        (3, "alpha beta gamma delta epsilon"),  # J=4/5=0.8 to 1,2
        (4, "zeta eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = dedup_recall_eval(
        df, threshold=0.75, num_perm=64, bands=32, shingle_n=1,
        sample_k=10, grid=4,
    ).collect()[0]
    assert out.n_docs == 4
    assert out.true_pairs == 3          # (1,2), (1,3), (2,3)
    assert out.missed_pairs == 0 and out.recall_permille == 1000
    assert out.lsh_pairs == 3


def test_dedup_cluster_stats_histogram(spark):
    from akka_graph_db_spark.functions.dedup import dedup_cluster_stats

    rows = [
        (1, "a b c d"), (2, "a b c d"), (3, "a b c d"),  # exact x3
        (4, "p q r s"),                                   # singleton
        (5, "u v w x y"), (6, "u v w x y z"),             # J=5/6
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in dedup_cluster_stats(
            df, threshold=0.8, shingle_n=1
        ).collect()
    }
    assert got == {1: (1, 1), 2: (1, 2), 3: (1, 3)}


# --------------------------------------------------------- dedup_manifest
def test_dedup_manifest_complements_keep(spark):
    from akka_graph_db_spark.functions.dedup import (
        dedup_manifest,
        minhash_dedup_keep,
    )

    rows = [
        (1, "a b c d"), (2, "a b c d"),       # cluster {1,2} -> keep 1
        (3, "p q r s"),                        # singleton
        (5, "u v w x y"), (6, "u v w x y z"),  # cluster {5,6} -> keep 5
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    man = {
        (r.survivor_id, r.removed_id)
        for r in dedup_manifest(df, threshold=0.8, shingle_n=1).collect()
    }
    assert man == {(1, 2), (5, 6)}
    kept = {
        r.doc_id
        for r in minhash_dedup_keep(
            df, threshold=0.8, shingle_n=1
        ).collect()
    }
    removed = {b for _, b in man}
    assert kept | removed == {1, 2, 3, 5, 6} and kept & removed == set()


# --------------------------------------------------- source_concentration
def test_source_concentration_exact(spark):
    from akka_graph_db_spark.functions.text import source_concentration

    # source S: token masses 10, 5, 3, 2 (total 20; 80% -> thr=16;
    # 10+5=15 < 16, +3 -> 18 >= 16 -> 3 docs). top share = 10*1000/20.
    rows = [
        (1, " ".join("w%d" % i for i in range(10)), "S"),
        (2, " ".join("x%d" % i for i in range(5)), "S"),
        (3, "a b c", "S"),
        (4, "y z", "S"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = source_concentration(df, target_permille=800).collect()[0]
    assert out.n_docs == 4 and out.total_tokens == 20
    assert out.docs_to_target == 3
    assert out.top_doc_share_permille == 500


def test_source_concentration_tie_bucket_interior(spark):
    from akka_graph_db_spark.functions.text import source_concentration

    # four docs of 5 tokens each (one histogram bucket): thr =
    # ceil(20*0.8)=16 -> need ceil(16/5)=4 docs.
    rows = [
        (i, " ".join("t%d" % j for j in range(5)), "S") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = source_concentration(df, target_permille=800).collect()[0]
    assert out.docs_to_target == 4


# ---------------------------------------------------------------- bowtie
def test_bowtie_classes(spark):
    from akka_graph_db_spark.operators.analytics import bowtie_classes

    # IN: 0 -> core {1,2} -> OUT: 3; disconnected: 9-8 (OTHER).
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 1), (2, 3), (9, 8)], "a bigint, b bigint"
    )
    got = {r.id: r.bowtie_class for r in bowtie_classes(edges).collect()}
    assert got == {
        0: "IN", 1: "CORE", 2: "CORE", 3: "OUT", 8: "OTHER", 9: "OTHER"
    }


# ------------------------------------------------------------------- rfm
def test_rfm_segments_tiles(spark):
    import datetime as dt

    from akka_graph_db_spark.functions.ranking import rfm_segments

    base = dt.datetime(2020, 1, 1)
    # 4 customers, n_tiles=2: halves split cleanly.
    rows = []
    # cust 1: 3 orders, recent, big spend -> best on all
    for i in range(3):
        rows.append((1, base + dt.timedelta(days=90 + i), 100.0))
    rows.append((2, base + dt.timedelta(days=80), 50.0))
    rows.append((3, base + dt.timedelta(days=10), 20.0))
    for i in range(2):
        rows.append((4, base + dt.timedelta(days=i), 10.0))
    df = spark.createDataFrame(
        rows, "o_custkey bigint, o_orderdate timestamp, o_totalprice double"
    )
    out = rfm_segments(df, n_tiles=2).collect()
    total = sum(r.n_customers for r in out)
    assert total == 4
    cells = {(r.r_tile, r.f_tile, r.m_tile): r.n_customers for r in out}
    # cust1: rank1 everywhere -> (1,1,1). cust4: freq 2 -> f rank 2
    # (tile 1), recency worst -> r tile 2, monetary 20 total -> rank 3
    # tile 2 -> (2,1,2)
    assert cells[(1, 1, 1)] == 1
    assert cells[(2, 1, 2)] == 1


# -------------------------------------------------------------------- PQ
def test_pq_codes_reconstruction_invariants(spark):
    from akka_graph_db_spark.functions.similarity import (
        kmeans_quantized,
        pq_codes,
    )

    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    codes, books = pq_codes(df, m=2, k=4, n_iter=2)
    got = {r.vec_id: r for r in codes.collect()}
    assert len(got) == 60
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    # codes within range; quant_err equals the sum of per-subspace
    # kmeans d2 (recompute one subspace independently)
    assert all(0 <= r.code_0 < 4 and 0 <= r.code_1 < 4 for r in got.values())
    from pyspark.sql import functions as F

    sub0 = df.select(
        "vec_id", F.slice("embedding", 1, 4).alias("embedding")
    )
    a0, _ = kmeans_quantized(sub0, k=4, n_iter=2)
    d0 = {r.vec_id: (r.cluster, r.d2) for r in a0.collect()}
    for vid, r in got.items():
        assert r.code_0 == d0[vid][0]
        assert r.quant_err >= d0[vid][1]  # plus subspace-1 error


def test_pq_topk_matches_adc_bruteforce(spark):
    from akka_graph_db_spark.functions.similarity import (
        pq_codes,
        pq_topk,
    )

    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = df.orderBy("vec_id").limit(2)
    out = pq_topk(df, queries, k_neighbors=5, m=2, k=4, n_iter=2)
    res = out.collect()
    assert {r.query_id for r in res} == {0, 1}
    # rank is 1..5 per query, adc monotone in rank
    for qid in (0, 1):
        rs = sorted(
            [r for r in res if r.query_id == qid], key=lambda r: r.rank
        )
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        assert all(
            rs[i].adc_d2 <= rs[i + 1].adc_d2 for i in range(len(rs) - 1)
        )
        assert all(r.neighbor_id != qid for r in rs)
    # ADC ground truth for query 0 / its rank-1 neighbor: recompute
    # from codes + codebooks in python
    codes, books = pq_codes(df, m=2, k=4, n_iter=2)
    cmap = {r.vec_id: (r.code_0, r.code_1) for r in codes.collect()}
    q0 = [round(x * 1_000_000) for x in rows[0][1]]
    best = sorted(res, key=lambda r: (r.query_id, r.rank))[0]
    c0, c1 = cmap[best.neighbor_id]
    want = sum(
        (a - b) ** 2 for a, b in zip(q0[:4], books[0][c0])
    ) + sum((a - b) ** 2 for a, b in zip(q0[4:], books[1][c1]))
    assert best.adc_d2 == want


def test_clustering_label_agreement_perfect_and_random(spark):
    from akka_graph_db_spark.functions.similarity import (
        clustering_label_agreement,
    )

    # two tight, well-separated blobs labeled consistently -> ARI 1.0
    rows = []
    for i in range(10):
        rows.append((i, [10.0 + i * 0.001, 10.0], 1))
        rows.append((100 + i, [-10.0 - i * 0.001, -10.0], 2))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = clustering_label_agreement(df, k=2, n_iter=3).collect()[0]
    assert out.n == 20 and out.n_clusters == 2 and out.n_labels == 2
    assert out.ari == 1.0


# -------------------------------------------------- embedding dim profile
def test_embedding_dim_profile_exact(spark):
    from akka_graph_db_spark.functions.similarity import (
        embedding_dim_profile,
    )

    rows = [
        (1, [0.0, 1.0]),
        (2, [0.0, 2.0]),
        (3, [0.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        r.dim_idx: r for r in embedding_dim_profile(df).collect()
    }
    # dim 0: constant zero (dead)
    assert got[0].min_q == 0 and got[0].max_q == 0
    assert got[0].n_distinct == 1 and got[0].n_zero == 3
    # dim 1: values 1e6, 2e6, 2e6 -> median rank ceil(3/2)=2 -> 2e6
    assert got[1].median_q == 2_000_000
    assert got[1].n_distinct == 2 and got[1].n_zero == 0


# --------------------------------------------------------- hard negatives
def test_hard_negatives_excludes_same_label(spark):
    from akka_graph_db_spark.functions.similarity import hard_negatives

    rows = [
        (0, [0.0, 0.0], 1),
        (1, [0.1, 0.0], 1),   # nearest but SAME label -> excluded
        (2, [0.2, 0.0], 2),   # nearest different-label
        (3, [1.0, 0.0], 2),
        (4, [5.0, 5.0], 3),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    q = df.where(F.col("vec_id") == 0)
    out = sorted(
        hard_negatives(df, q, k=3).collect(), key=lambda r: r.rank
    )
    assert [r.neighbor_id for r in out] == [2, 3, 4]
    assert all(r.neighbor_label != 1 for r in out)
    # exact grid distance: 0.2 -> 200000^2
    assert out[0].d2 == 200_000 ** 2


# ------------------------------------------------- streaming cross dedup
def test_streaming_cross_dedup_equals_batch(spark, tmp_path):
    import os

    from akka_graph_db_spark.functions.dedup import minhash_dedup_cross
    from akka_graph_db_spark.streaming.ingest import StreamingCrossDedup

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "zeta eta theta iota"),
        (11, "alpha beta gamma delta"),      # dup of base 1
        (12, "alpha beta gamma delta epsi"),  # near base 1 (J=4/5)
        (13, "completely different words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    base = docs.where(F.col("doc_id") < 10)
    new = docs.where(F.col("doc_id") >= 10)
    src = str(tmp_path / "src")
    new.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    xd = StreamingCrossDedup(
        base, threshold=0.75, num_perm=64, bands=32, shingle_n=1
    )
    try:
        got = xd.run(
            stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        got_set = {
            (r.new_id, r.base_id, round(r.jaccard_sim, 9))
            for r in got.collect()
        }
    finally:
        xd.close()
    want = {
        (r.new_id, r.base_id, round(r.jaccard_sim, 9))
        for r in minhash_dedup_cross(
            new, base, threshold=0.75, num_perm=64, bands=32,
            shingle_n=1,
        ).collect()
    }
    assert got_set == want
    assert (11, 1, 1.0) in got_set


# ------------------------------------------------------------------ gini
def test_gini_by_group_closed_forms(spark):
    from akka_graph_db_spark.functions.profile import gini_by_group

    # perfect equality -> 0; one-takes-all over n=4 -> (n-1)/n = 0.75
    rows = (
        [("eq", 5)] * 4
        + [("whale", 0), ("whale", 0), ("whale", 0), ("whale", 100)]
    )
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = {r.g: r for r in gini_by_group(df, "g", "v").collect()}
    assert got["eq"].gini == 0.0 and got["eq"].gini_numerator == 0
    assert got["whale"].gini == 0.75
    # brute-force identity on an arbitrary multiset
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    df2 = spark.createDataFrame(
        [("x", v) for v in vals], "g string, v bigint"
    )
    out = gini_by_group(df2, "g", "v").collect()[0]
    sv = sorted(vals)
    n, tot = len(sv), sum(sv)
    s = sum((i + 1) * x for i, x in enumerate(sv))
    assert out.gini_numerator == 2 * s - (n + 1) * tot
    assert out.n == n and out.total == tot


# -------------------------------------------------------- reconciliation
def test_sum_reconciliation_classes(spark):
    from decimal import Decimal

    from akka_graph_db_spark.functions.profile import sum_reconciliation

    parent = spark.createDataFrame(
        [
            (1, "A", Decimal("10.00")),   # matches
            (2, "A", Decimal("10.00")),   # off by 0.01
            (3, "A", Decimal("5.00")),    # no children
        ],
        "k bigint, g string, amount decimal(18,2)",
    )
    child = spark.createDataFrame(
        [(1, Decimal("10.00")), (2, Decimal("10.01"))],
        "k bigint, calc decimal(18,2)",
    )
    out = sum_reconciliation(parent, child, "k", "g").collect()[0]
    assert out.n_parents == 3 and out.n_no_children == 1
    assert out.n_match == 1 and out.n_mismatch == 1
    # exact BIGINT micro-units (0.01 -> 10000), never wide DECIMAL:
    # DECIMAL(38,6) output degrades to float64 in DuckDB's pandas
    # round-trip while Spark keeps Decimal -> driver hash divergence
    assert out.max_abs_diff_micros == 10000
    assert out.sum_abs_diff_micros == 10000
    schema = {
        f.name: f.dataType.simpleString()
        for f in sum_reconciliation(parent, child, "k", "g").schema
    }
    assert schema["max_abs_diff_micros"] == "bigint"
    assert schema["sum_abs_diff_micros"] == "bigint"
    # tolerance widens the match
    out2 = sum_reconciliation(
        parent, child, "k", "g", tolerance="0.05"
    ).collect()[0]
    assert out2.n_match == 2 and out2.n_mismatch == 0


# -------------------------------------------------------- label noise knn
def test_label_noise_knn_planted(spark):
    from akka_graph_db_spark.functions.similarity import label_noise_knn

    # two tight blobs; one point of blob B planted inside blob A
    rows = []
    for i in range(6):
        rows.append((i, [10.0 + 0.001 * i, 0.0], 1))
        rows.append((100 + i, [-10.0 - 0.001 * i, 0.0], 2))
    rows.append((999, [10.003, 0.0], 2))  # mislabeled: sits in blob A
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = {r.label: r for r in label_noise_knn(df, k=3).collect()}
    # the planted point's 3 NNs are all label 1 -> contributes 3
    # disagreements to label 2; blob-A points near the plant each see
    # it among their 3 NNs -> label 1 has some disagreement too
    assert got[2].n_disagree >= 3
    assert got[2].n_vectors == 7
    assert 0 < got[2].disagree_ppm <= 1_000_000
    # pure-blob sanity: without the plant there is zero disagreement
    clean = df.where(F.col("vec_id") != 999)
    got2 = {r.label: r for r in label_noise_knn(clean, k=3).collect()}
    assert got2[1].n_disagree == 0 and got2[2].n_disagree == 0


def test_label_noise_knn_max_rows_gate(spark):
    from akka_graph_db_spark.functions.similarity import label_noise_knn

    df = spark.createDataFrame(
        [(i, [0.0], 0) for i in range(5)],
        "vec_id bigint, embedding array<float>, label int",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        label_noise_knn(df, k=2, max_rows=3)


# ------------------------------------------------------------ budget trim
def test_budget_trim_prefix_semantics(spark):
    from akka_graph_db_spark.functions.mixture import budget_trim

    rows = [(i, "w " * 10, "S") for i in range(6)]  # 10 tokens each
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = budget_trim(df, budget_tokens=35).collect()
    # exactly 3 docs fit (30 tokens); the 4th would make 40 > 35
    assert len(out) == 3
    assert max(r._cum_tokens for r in out) == 30
    # stable prefix: kept set is a prefix of the hash order, so the
    # k=3 sample equals the trimmed ids
    from akka_graph_db_spark.functions.mixture import sample_k_per_group

    top3 = {
        r.doc_id for r in sample_k_per_group(df, k=3).collect()
    }
    assert {r.doc_id for r in out} == top3
    # zero budget keeps nothing; negative raises
    assert budget_trim(df, budget_tokens=0).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        budget_trim(df, budget_tokens=-1)
    with _pytest.raises(ValueError):
        budget_trim(df, budget_tokens=1, buckets=0)


def test_budget_trim_bucket_decomposition_exact(spark):
    """The bucket-cumsum decomposition (hash-range buckets + offsets +
    within-bucket running sums) must reproduce the single-window running
    sum EXACTLY for any bucket count — bucket id is monotone in the md5
    rank key, so bucket order is prefix order."""
    from akka_graph_db_spark.functions.mixture import budget_trim

    rows = [
        (i, "tok " * (1 + i % 7), ["A", "B"][i % 2]) for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    want = {
        (r.doc_id, r._cum_tokens)
        for r in budget_trim(df, budget_tokens=50, buckets=1).collect()
    }
    for b in (2, 8, 64):
        got = {
            (r.doc_id, r._cum_tokens)
            for r in budget_trim(df, budget_tokens=50, buckets=b).collect()
        }
        assert got == want, f"buckets={b}"
