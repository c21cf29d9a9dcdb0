"""Round-11 regression pins: the four r10 ADVICE items + the planted-star
keep fixture + the per-source CUSUM drift composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------- ADVICE r10 #1: kcenter
def test_kcenter_stops_when_k_exceeds_nodes(spark):
    """k > |V|: once every node is a center the (dist DESC, id ASC)
    argmax lands on dist 0 — the loop must stop, not re-emit the
    smallest-id center as a duplicate landmark row."""
    from akka_graph_db_spark.operators.analytics import kcenter_landmarks

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "a bigint, b bigint"
    )
    rows = kcenter_landmarks(tri, k=10, max_depth=4).collect()
    assert len(rows) == 3
    assert len({r.id for r in rows}) == 3          # no duplicates
    assert [r.center_rank for r in rows] == [1, 2, 3]


# ---------------------------------------------- ADVICE r10 #2: benford
def test_benford_filters_on_cast_value(spark):
    """Fractional values in (0,1) cast to bigint 0 — they must be
    EXCLUDED (the documented positive-integer contract), not minted
    into a first digit '0' that inflates n off the 1-9 grid."""
    from akka_graph_db_spark.functions.profile import benford_deviation

    df = spark.createDataFrame(
        [("g", 0.5, 1), ("g", 0.9, 2), ("g", 123.0, 3), ("g", -2.0, 4)],
        "g string, v double, id bigint",
    )
    row = benford_deviation(df, "g", "v").collect()[0]
    assert row.n == 1                              # only 123 survives
    assert row.worst_digit in range(1, 10)


# --------------------------------------- ADVICE r10 #4: kfold NULL labels
def test_stratified_kfold_null_labels_get_folds(spark):
    """NULL-label rows form their own stratum (null-safe offset join)
    instead of silently vanishing from the output."""
    from akka_graph_db_spark.functions.mixture import stratified_kfold

    rows = [(i, i % 2 if i < 40 else None) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, label int")
    out = stratified_kfold(df, k=5, label_col="label", id_col="vec_id")
    assert out.count() == 50                       # nothing dropped
    nulls = out.where(F.col("label").isNull())
    assert nulls.count() == 10
    per = nulls.groupBy("fold").count().collect()
    assert len(per) == 5 and all(r["count"] == 2 for r in per)


# ------------------------------------- weighted k-center (new r11)
def test_kcenter_weighted_disagrees_with_hop_metric(spark):
    """Path 1-2-3 with a cheap long way and one expensive direct edge
    1-4: under hops node 4 is adjacent to 1 (dist 1, never the farthest
    pick over node 3 at dist 2); under costs the 1000-cost edge makes 4
    the farthest node — the exact case hop-metric landmarks get wrong."""
    from akka_graph_db_spark.operators.analytics import (
        kcenter_landmarks,
        kcenter_landmarks_weighted,
    )

    w = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 4, 1000)],
        "a bigint, b bigint, w bigint",
    )
    got = kcenter_landmarks_weighted(w, k=2, max_rounds=4).collect()
    assert [(r.center_rank, r.id, r.cost) for r in got] == [
        (1, 1, 0), (2, 4, 1000)
    ]
    hop = kcenter_landmarks(w.select("a", "b"), k=2, max_depth=4).collect()
    assert hop[1].id == 3                        # hop metric picks 3


def test_kcenter_weighted_bounded_rounds_and_min_cost_edges(spark):
    """(a) exactly max_rounds relaxations: with max_rounds=1 the cheap
    2-edge path is invisible and the direct expensive edge wins; (b)
    duplicate directions collapse to the MIN cost; (c) k > |V| stops
    without duplicate landmark rows."""
    from akka_graph_db_spark.operators.analytics import (
        kcenter_landmarks_weighted,
    )

    w = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5), (1, 3, 100), (3, 1, 40)],
        "a bigint, b bigint, w bigint",
    )
    # min-cost collapse: 1-3 edge costs 40; bounded 1 round -> cost 40
    r1 = kcenter_landmarks_weighted(w, k=2, max_rounds=1).collect()
    assert (r1[1].id, r1[1].cost) == (3, 40)
    # 4 rounds: cheapest <=4-edge path 1-2-3 = 10 < 40
    r4 = kcenter_landmarks_weighted(w, k=2, max_rounds=4).collect()
    assert (r4[1].id, r4[1].cost) == (3, 10)
    # k exceeding |V| stops cleanly
    rk = kcenter_landmarks_weighted(w, k=10, max_rounds=4).collect()
    assert len(rk) == 3
    assert len({r.id for r in rk}) == 3


def test_weighted_nearest_seed_hand_case(spark):
    """Path 1-2-3-4 with w=1 each, plus expensive edge 1-4 (w=10);
    seeds {1, 4}: node 2 -> seed 1 (cost 1); node 3 -> seed 4 (cost 1);
    seed-id tiebreak goes to the SMALLER seed on equal cost."""
    from akka_graph_db_spark.operators.analytics import (
        weighted_nearest_seed,
    )

    w = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 10)],
        "a bigint, b bigint, w bigint",
    )
    got = {
        r.id: (r.seed, r.cost)
        for r in weighted_nearest_seed(w, seeds=[1, 4]).collect()
    }
    assert got == {1: (1, 0), 2: (1, 1), 3: (4, 1), 4: (4, 0)}
    # equal-cost tie: node 3 with seeds {2, 4} is cost 1 from both ->
    # smaller seed id wins
    tie = {
        r.id: r.seed
        for r in weighted_nearest_seed(w, seeds=[2, 4]).collect()
    }
    assert tie[3] == 2
    # a seed that is not a graph node mints no output row
    ghost = weighted_nearest_seed(w, seeds=[99], max_rounds=2)
    assert ghost.count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        weighted_nearest_seed(w, seeds=[])


# --------------------------- planted star fixture (VERDICT r10 #3)
def test_keep_star_planted_fixture_survivors_are_squares(spark):
    """On the planted corpus (exact-duplicate clusters keyed by
    floor(sqrt(id)), disjoint cross-cluster token sets) star linkage is
    provably exact: survivors = min id per cluster = perfect squares."""
    import __spark_entry__ as entrymod

    got = sorted(
        r.doc_id
        for r in entrymod.q_dedup_minhash_keep_star(
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    # ids 0..499 expand to 0..4999 -> clusters 0..70
    assert got == [c * c for c in range(71)]


# -------------------------------- ADVICE r10 #3: coverage oracle fixture
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_coverage_curve_fixture_five_productive_rounds(spark, sf_dir):
    """The coverage_curve_docs oracle unrolls a FIXED 5 rounds; the
    engine stops early on exhaustion. This pins the fixture invariant
    the equality rests on: >= 5 strictly-productive rounds at both
    cert scales (documents has 20 sources with long-tail shingle
    vocabularies — full coverage before round 5 would need 4 sources
    to jointly contain every other source's 3-gram set)."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_coverage_curve_docs(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r.new_tokens > 0 for r in rows)
    assert [r.round for r in rows] == [1, 2, 3, 4, 5]
