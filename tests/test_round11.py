"""Round-11 regression pins: the four r10 ADVICE items + the planted-star
keep fixture + the per-source CUSUM drift composition + randomized
invariants for the weighted-graph operators."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
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


def test_weighted_harmonic_hand_case_and_voronoi_consistency(spark):
    """Path 1-2-3 (w=4 each): from landmarks {1, 3}, node 2 scores
    10^9//4 twice; node 1 scores 10^9//8 (to 3) — self term excluded.
    And min-over-landmarks of weighted_landmark_costs must equal the
    weighted_nearest_seed cost for every node."""
    from akka_graph_db_spark.operators.analytics import (
        weighted_harmonic,
        weighted_landmark_costs,
        weighted_nearest_seed,
    )

    w = spark.createDataFrame(
        [(1, 2, 4), (2, 3, 4)], "a bigint, b bigint, w bigint"
    )
    got = {
        r.id: (r.n_reached, r.h_ppb)
        for r in weighted_harmonic(w, landmarks=[1, 3]).collect()
    }
    assert got[2] == (2, 2 * (10**9 // 4))
    assert got[1] == (1, 10**9 // 8)
    assert got[3] == (1, 10**9 // 8)
    costs = weighted_landmark_costs(w, landmarks=[1, 3]).collect()
    mins = {}
    for r in costs:
        if r.id not in mins or (r.cost, r.landmark) < mins[r.id]:
            mins[r.id] = (r.cost, r.landmark)
    voro = {
        r.id: (r.cost, r.seed)
        for r in weighted_nearest_seed(w, seeds=[1, 3]).collect()
    }
    assert mins == voro


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


# ----------------- randomized invariants for the weighted operators
_SPARK = {}


@pytest.fixture(scope="module", autouse=True)
def _bind_session(spark):
    _SPARK["s"] = spark


wedges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=10,
)


def _brute_bounded_cost(edge_list, seeds, max_rounds):
    """Reference bounded Bellman-Ford with (cost, seed) lexicographic
    min-plus, driver-side."""
    sym = {}
    for a, b, w in edge_list:
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        sym[key] = min(sym.get(key, w), w)
    adj = {}
    for (a, b), w in sym.items():
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    state = {s: (0, s) for s in seeds}
    for _ in range(max_rounds):
        nxt = dict(state)
        for u, (d, sd) in state.items():
            for v, w in adj.get(u, []):
                cand = (d + w, sd)
                if v not in nxt or cand < nxt[v]:
                    nxt[v] = cand
        state = nxt
    nodes = set(adj)
    return {u: v for u, v in state.items() if u in nodes}


@settings(max_examples=6, deadline=None)
@given(edge_list=wedges_strategy)
def test_weighted_nearest_seed_matches_brute_force(edge_list):
    from akka_graph_db_spark.operators.analytics import (
        weighted_nearest_seed,
    )

    spark = _SPARK["s"]
    if all(a == b for a, b, _ in edge_list):
        return  # no canonical edges -> empty graph, nothing to check
    w = spark.createDataFrame(edge_list, "a bigint, b bigint, w bigint")
    seeds = [1, 4]
    got = {
        r.id: (r.cost, r.seed)
        for r in weighted_nearest_seed(w, seeds=seeds, max_rounds=3)
        .collect()
    }
    want = _brute_bounded_cost(edge_list, seeds, max_rounds=3)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(edge_list=wedges_strategy)
def test_kcenter_weighted_invariants(edge_list):
    """Gonzalez invariants on random weighted graphs: rank 1 is the
    smallest node id at cost 0; landmark ids are distinct; picked
    costs are non-increasing from rank 2 on (the center set only
    grows, so the farthest remaining distance can only shrink)."""
    from akka_graph_db_spark.operators.analytics import (
        kcenter_landmarks_weighted,
    )

    spark = _SPARK["s"]
    if all(a == b for a, b, _ in edge_list):
        return
    w = spark.createDataFrame(edge_list, "a bigint, b bigint, w bigint")
    rows = kcenter_landmarks_weighted(w, k=4, max_rounds=3).collect()
    nodes = {a for a, b, _ in edge_list if a != b} | {
        b for a, b, _ in edge_list if a != b
    }
    assert rows[0].center_rank == 1
    assert rows[0].id == min(nodes) and rows[0].cost == 0
    ids = [r.id for r in rows]
    assert len(ids) == len(set(ids))
    costs = [r.cost for r in rows[1:]]
    assert all(
        costs[i] >= costs[i + 1] for i in range(len(costs) - 1)
    )
    assert len(rows) <= min(4, len(nodes))


@settings(max_examples=5, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=500), min_size=4, max_size=12
    )
)
def test_drift_alarms_matches_brute_cusum(vals):
    """drift_alarms' changepoint columns equal a driver-side exact
    CUSUM recompute, and the alarm flag is exactly the integer
    mean-shift threshold test."""
    from akka_graph_db_spark.functions.profile import drift_alarms

    spark = _SPARK["s"]
    rows = [("g", i, v) for i, v in enumerate(vals)] + [
        ("h", i, 7) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "src string, ord bigint, v bigint")
    out = {
        r.src: r
        for r in drift_alarms(
            df, "src", "ord", "v", bin_width=64,
            shift_alarm_micros=5_000_000,
        ).collect()
    }
    n = len(vals)
    micros = [v * 1_000_000 for v in vals]
    sn = sum(micros)
    best = None
    for k in range(1, n):
        sk = sum(micros[:k])
        dev = abs(n * sk - k * sn)
        if best is None or dev > best[0]:
            best = (dev, k)
    dev, k = best
    g = out["g"]
    assert (g.n, g.change_index, g.deviation) == (n, k, dev)
    shift = dev // (k * (n - k))
    assert g.shift_micros == shift
    assert g.alarm == (shift >= 5_000_000)
    # constant series: every split has deviation 0, earliest index wins
    h = out["h"]
    assert (h.deviation, h.change_index, h.alarm) == (0, 1, False)
