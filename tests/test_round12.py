"""Round-12 pinning tests: the weighted landmark-centrality completions
(eccentricity / closeness / effective diameter on the certified
weighted_landmark_costs substrate, VERDICT r11 #4) and the NULL-group
null-safe-join fixes in profile.drift_tvd / drift_alarms (ADVICE r11).

Hand graph for the weighted family: 1-2 (w10), 2-3 (w20), 1-3 (w50),
3-4 (w5); landmarks {1, 2}, max_rounds=4. Bounded cheapest costs:
  from 1: 1:0, 2:10, 3:30 (via 2), 4:35
  from 2: 2:0, 1:10, 3:20, 4:25
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from akka_graph_db_spark.operators.analytics import (
    weighted_closeness,
    weighted_eccentricity,
    weighted_effective_diameter,
)


@pytest.fixture(scope="module")
def wgraph(spark):
    return spark.createDataFrame(
        [(1, 2, 10), (2, 3, 20), (1, 3, 50), (3, 4, 5)],
        "a bigint, b bigint, w bigint",
    )


def test_weighted_eccentricity_hand_values(wgraph):
    rows = {
        r.id: (r.n_reached, r.ecc_est)
        for r in weighted_eccentricity(wgraph, [1, 2]).collect()
    }
    # max over landmark costs; self cost-0 pairs counted in n_reached
    assert rows == {1: (2, 10), 2: (2, 10), 3: (2, 30), 4: (2, 35)}


def test_weighted_closeness_hand_values(wgraph):
    rows = {
        r.id: (r.n_reached, r.sum_cost, r.c_ppb)
        for r in weighted_closeness(wgraph, [1, 2]).collect()
    }
    # self pairs excluded; c_ppb = (n_reached * 1e9) div sum_cost
    assert rows == {
        1: (1, 10, 100000000),
        2: (1, 10, 100000000),
        3: (2, 50, 40000000),
        4: (2, 60, 33333333),
    }


def test_weighted_effective_diameter_interpolation(wgraph):
    # cost multiset: 0,0,10,10,20,25,30,35 (n=8). t = ceil(0.9*8) = 8
    # -> hit=35, c_prev=30, cum_prev=7, cnt_hit=1:
    # eff = 30 + 5 * (7.2 - 7) / 1 = 31.0 -> 31_000_000 ppm, exact.
    row = weighted_effective_diameter(wgraph, [1, 2]).collect()
    assert len(row) == 1
    assert (row[0].n_pairs, row[0].max_cost, row[0].eff_cost_ppm) == (
        8,
        35,
        31000000,
    )


def test_weighted_effective_diameter_median(wgraph):
    # fraction 50%: t = ceil(0.5*8) = 4 -> hit = 10 (4th smallest),
    # c_prev=0, cum_prev=2, cnt_hit=2:
    # eff = 0 + 10 * (4.0 - 2) / 2 = 10.0 -> 10_000_000 ppm.
    row = weighted_effective_diameter(
        wgraph, [1, 2], fraction_ppm=500000
    ).collect()
    assert row[0].eff_cost_ppm == 10000000


def test_weighted_effective_diameter_empty_and_validation(spark, wgraph):
    empty = spark.createDataFrame([], "a bigint, b bigint, w bigint")
    assert weighted_effective_diameter(empty, [1]).collect() == []
    assert weighted_eccentricity(empty, [1]).collect() == []
    assert weighted_closeness(empty, [1]).collect() == []
    with pytest.raises(ValueError):
        weighted_effective_diameter(wgraph, [1], fraction_ppm=0)


def test_drift_tvd_null_group_keeps_own_counts(spark):
    """ADVICE r11: a NULL group must be charged its OWN histogram
    counts. Pre-fix, the plain equi-join zeroed them and folded them
    into "rest": tvd_num would read 8 (tvd 1.0) instead of 4."""
    from akka_graph_db_spark.functions.profile import drift_tvd

    df = spark.createDataFrame(
        [("a", 5), ("a", 25), (None, 25), (None, 25)],
        "src string, v int",
    )
    rows = {
        r.src: (r.n_group, r.n_rest, r.tvd_num, float(r.tvd))
        for r in drift_tvd(df, "src", "v", bin_width=10).collect()
    }
    assert None in rows
    # NULL group: bins {2: o=2, 0: o=0}; rest holds {0:1, 2:1}
    # tvd_num = |0*2 - 1*2| + |2*2 - 1*2| = 4; tvd = 4/(2*2*2) = 0.5
    # (group dist (0,1) vs rest dist (0.5,0.5): TVD = 0.5)
    assert rows[None] == (2, 2, 4, 0.5)
    assert rows["a"] == (2, 2, 4, 0.5)


def test_drift_alarms_null_group_survives_join(spark):
    """ADVICE r11 item 3 verbatim: drift_alarms' CUSUM x TVD join must
    be null-safe or the NULL group silently vanishes from the report."""
    from akka_graph_db_spark.functions.profile import drift_alarms

    df = spark.createDataFrame(
        [
            ("a", 1, 10),
            ("a", 2, 10),
            ("a", 3, 500),
            (None, 1, 10),
            (None, 2, 600),
            (None, 3, 620),
        ],
        "src string, ord int, v int",
    )
    out = drift_alarms(
        df,
        group_col="src",
        order_col="ord",
        value_col="v",
        bin_width=64,
        shift_alarm_micros=100_000_000,
    )
    groups = {r.src for r in out.collect()}
    assert groups == {"a", None}


@pytest.fixture(scope="module")
def touch_events(spark):
    """One user, two purchases: conv 1 sees [view, click], conv 2 sees
    [click, error, signup]; the trailing view has no next purchase."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, i + 1), 100 + i, t)
        for i, t in enumerate(
            ["view", "click", "purchase", "click", "error",
             "signup", "purchase", "view"]
        )
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint,"
        " event_type string"
    )


def _attr(df, model):
    from akka_graph_db_spark.functions.events import (
        multi_touch_attribution,
    )

    return {
        r.event_type: (r.n_touches, r.n_conversions, r.credit_ppm)
        for r in multi_touch_attribution(
            df, "purchase", model=model
        ).collect()
    }


def test_attribution_linear_hand_values(touch_events):
    # conv1 k=2: 500000 each; conv2 k=3: 333333 each, remainder 1 to
    # the first touch (click)
    assert _attr(touch_events, "linear") == {
        "view": (1, 1, 500000),
        "click": (2, 2, 833334),
        "error": (1, 1, 333333),
        "signup": (1, 1, 333333),
    }


def test_attribution_u_shaped_first_last(touch_events):
    assert _attr(touch_events, "u_shaped") == {
        "view": (1, 1, 500000),
        "click": (2, 2, 900000),   # 500000 (k=2) + 400000 (first of 3)
        "error": (1, 1, 200000),   # sole middle
        "signup": (1, 1, 400000),  # last of 3
    }
    assert _attr(touch_events, "first") == {
        "view": (1, 1, 1000000),
        "click": (2, 2, 1000000),
        "error": (1, 1, 0),
        "signup": (1, 1, 0),
    }
    assert _attr(touch_events, "last") == {
        "view": (1, 1, 0),
        "click": (2, 2, 1000000),
        "error": (1, 1, 0),
        "signup": (1, 1, 1000000),
    }


def test_attribution_conservation_on_real_events(spark):
    """Every attributed conversion hands out exactly 1e6 ppm: the
    credit total must equal 1e6 x the number of purchases preceded by
    at least one touch, for every model, on the real fixture."""
    from pyspark.sql import Window
    from akka_graph_db_spark.functions.events import (
        multi_touch_attribution,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    # a conversion is attributable iff >= 1 touch maps to ITS ordinal
    # (a touch belongs to the conversion after it, within the user) —
    # "some earlier event exists" is NOT enough: in [view, p1, p2] the
    # view belongs to p1, leaving p2 unattributed
    tagged = ev.select(
        "user_id",
        "event_type",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .over(w)
        .alias("_c"),
    ).withColumn("_tot", F.max("_c").over(wu))
    attributable = (
        tagged.where(F.col("event_type") != "purchase")
        .where(F.col("_c") + 1 <= F.col("_tot"))
        .select("user_id", (F.col("_c") + 1).alias("_conv"))
        .distinct()
        .count()
    )
    for model in ("first", "last", "linear", "u_shaped"):
        total = (
            multi_touch_attribution(ev, "purchase", model=model)
            .agg(F.sum("credit_ppm"))
            .collect()[0][0]
        )
        assert total == 1000000 * attributable, model


def test_attribution_rejects_unknown_model(touch_events):
    from akka_graph_db_spark.functions.events import (
        multi_touch_attribution,
    )

    with pytest.raises(ValueError):
        multi_touch_attribution(touch_events, "purchase", model="decay")


def test_weighted_modularity_hand_values(spark, wgraph):
    """Hand graph, assignment {1,2}=A {3,4}=B: W=85, A=170, intra arcs
    = 2*10 + 2*5 = 30, S_A = 60+30 = 90, S_B = 75+5 = 80:
    Q = (170*30 - (8100+6400)) / 170^2 = -9400/28900 = -0.32526."""
    from akka_graph_db_spark.operators.analytics import (
        weighted_modularity,
    )

    asg = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "id bigint, community string",
    )
    row = weighted_modularity(wgraph, asg).collect()[0]
    assert (row.total_weight, row.n_communities, row.modularity) == (
        85,
        2,
        -0.32526,
    )


def test_weighted_modularity_perfect_split_and_unassigned(spark):
    from akka_graph_db_spark.operators.analytics import (
        weighted_modularity,
    )

    w2 = spark.createDataFrame(
        [(1, 2, 10), (3, 4, 10)], "a bigint, b bigint, w bigint"
    )
    asg = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "id bigint, community string",
    )
    row = weighted_modularity(w2, asg).collect()[0]
    # two components, each its own community: Q = 1 - 1/2 = 0.5
    assert (row.total_weight, row.modularity) == (20, 0.5)
    # arcs with an unassigned endpoint are EXCLUDED from the universe:
    # dropping 3 and 4 from the assignment leaves only the 1-2 edge
    part = spark.createDataFrame(
        [(1, "A"), (2, "A")], "id bigint, community string"
    )
    row2 = weighted_modularity(w2, part).collect()[0]
    assert (row2.total_weight, row2.n_communities) == (10, 1)
    assert row2.modularity == 0.0  # single community: W_c/W - 1 = 0


def test_community_conductance_hand_values(spark, wgraph):
    """Assignment {1,2}=A {3,4}=B on the hand graph: vol_A = 90,
    vol_B = 80, cut = 70 both sides (arcs 2-3 w20 + 1-3 w50):
    phi_A = 70e6 div min(90, 80) = 875000 = phi_B."""
    from akka_graph_db_spark.operators.analytics import (
        community_conductance,
    )

    asg = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "id bigint, community string",
    )
    rows = {
        r.community: (r.n_nodes, r.vol_w, r.cut_w, r.conductance_ppm)
        for r in community_conductance(wgraph, asg).collect()
    }
    assert rows == {"A": (2, 90, 70, 875000), "B": (2, 80, 70, 875000)}


def test_community_conductance_disconnected_and_whole(spark, wgraph):
    from akka_graph_db_spark.operators.analytics import (
        community_conductance,
    )

    w2 = spark.createDataFrame(
        [(1, 2, 10), (3, 4, 10)], "a bigint, b bigint, w bigint"
    )
    asg = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "id bigint, community string",
    )
    # separate components: zero cut, phi = 0
    assert all(
        r.conductance_ppm == 0 and r.cut_w == 0
        for r in community_conductance(w2, asg).collect()
    )
    # one community holding everything: min-side volume 0 -> phi = 0
    # by convention, not a divide-by-zero
    one = spark.createDataFrame(
        [(i, "A") for i in (1, 2, 3, 4)], "id bigint, community string"
    )
    row = community_conductance(wgraph, one).collect()
    assert len(row) == 1 and row[0].conductance_ppm == 0
