"""bench.py harness-logic tests (no Spark needed).

The contention guard (VERDICT r7 #3) only fires on real benches when the
host degrades mid-run — exactly when a crash would cost the whole round's
BENCH record — so its control flow is pinned here with injected fakes.
"""

import bench


def _fake_children(schedule):
    """run_child stub returning scheduled re-measure times per query."""

    def run_child(name):
        return {name: schedule.get(name, -1.0)}

    return run_child


def test_guard_idle_without_drift():
    timings = {"a": 10.0, "b": 5.0}
    out = bench._contention_guard(
        timings, 2.0, 2.2, _fake_children({}), lambda: 2.0, lambda s: None
    )
    assert out == {}
    assert timings == {"a": 10.0, "b": 5.0}


def test_guard_remeasures_top_n_and_commits_min():
    timings = {f"q{i}": float(i) for i in range(1, 9)}  # q8 slowest
    sched = {f"q{i}": 1.5 for i in range(1, 9)}
    slept = []
    out = bench._contention_guard(
        timings,
        2.0,
        3.0,  # 1.5x drift -> fires
        _fake_children(sched),
        lambda: 2.0,  # host already quiet again
        slept.append,
        top_n=5,
    )
    # top-5 slowest re-measured, min committed, both values recorded
    assert set(out) == {"q4", "q5", "q6", "q7", "q8"}
    assert out["q8"] == {"in_run": 8.0, "remeasure": 1.5}
    assert timings["q8"] == 1.5
    assert timings["q1"] == 1.0  # untouched
    assert slept == []  # quiet calibration -> no waiting


def test_guard_never_raises_timings():
    # a NOISY re-measure must not replace a faster in-run number
    timings = {"a": 3.0}
    out = bench._contention_guard(
        timings, 2.0, 3.0, _fake_children({"a": 9.0}), lambda: 2.0,
        lambda s: None,
    )
    assert timings["a"] == 3.0
    assert out["a"] == {"in_run": 3.0, "remeasure": 9.0}


def test_guard_waits_for_quiet_window():
    cals = iter([3.0, 3.0, 2.0])  # two loud checks, then quiet
    slept = []
    bench._contention_guard(
        {"a": 3.0}, 2.0, 3.0, _fake_children({"a": 2.5}),
        lambda: next(cals), slept.append,
    )
    assert slept == [60, 60]


def test_guard_fires_on_start_degradation_too():
    """The r9 full run STARTED degraded (cal 6.0 -> 2.5) and the old
    end-over-start test stayed quiet while every early heavy child
    carried inflated numbers — drift in EITHER direction must fire."""
    timings = {"a": 10.0, "b": 5.0}
    out = bench._contention_guard(
        timings,
        6.0,   # degraded start
        2.5,   # healthy end
        _fake_children({"a": 4.0, "b": 2.0}),
        lambda: 2.5,  # already quiet vs the BETTER bookend
        lambda s: None,
    )
    assert set(out) == {"a", "b"}
    assert timings == {"a": 4.0, "b": 2.0}


def test_guard_skips_failed_children_and_errors():
    timings = {"a": 3.0, "bad": -1.0}
    out = bench._contention_guard(
        timings, 2.0, 3.0, _fake_children({}), lambda: 2.0, lambda s: None
    )
    # 'bad' (errored in-run) is never re-measured; 'a' re-measure failed
    # (-1.0 from the stub) so neither value is committed nor recorded
    assert out == {}
    assert timings == {"a": 3.0, "bad": -1.0}


def test_headline_names_resolve():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == []
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)


def test_child_groups_cover_headline_exactly():
    groups = bench.child_groups(bench.HEADLINE)
    flat = [n for g in groups for n in g]
    assert sorted(flat) == sorted(bench.HEADLINE)
    # every unknown/new query is isolated; band packings are respected
    known = set().union(*(names for names, _, _ in bench._BANDS))
    pack = {
        id(names): size for names, _, size in bench._BANDS
    }
    for g in groups:
        if any(n not in known for n in g):
            assert len(g) == 1
            continue
        for names, _, size in bench._BANDS:
            if g[0] in names:
                assert all(n in names for n in g)  # no band mixing
                assert len(g) <= size
                break
    # canary batch first (always recorded), then heavies — a budget
    # skip sheds batched cheap queries, never canaries or heavies
    assert set(groups[0]) == set(bench._CANARIES)
    iso_count = sum(1 for g in groups if g[0] not in known)
    assert all(
        g[0] not in known for g in groups[1:1 + iso_count]
    )


def test_child_group_count_fits_wall_budget():
    """The r8 driver bench died at 203 subprocess children (~60-70 min of
    untimed JVM overhead), and r10's 67 children shed 93 queries inside
    the 3000s budget. The r11 packing must keep the child count low
    enough that overhead (~30s/child) plus measured time (~900s) fits."""
    n = len(bench.child_groups(bench.HEADLINE))
    assert n <= 55, n


def test_band_guard_remeasures_exceeders_only():
    """Any query >2x its band cap gets an isolated re-measure; in-band
    rows and band-less (isolated) rows are untouched."""
    some_b10 = next(iter(bench._BATCH10))
    some_b4 = next(iter(bench._BATCH4))
    timings = {
        some_b10: 5.0,      # cap 1.5 -> 3.3x: re-measure
        some_b4: 3.9,       # cap 4   -> in band: leave alone
        "unknown_iso_query": 99.0,  # no band: already a private JVM
    }
    out = bench._band_guard(
        timings, _fake_children({some_b10: 1.2}), lambda: 1000.0
    )
    assert out == {some_b10: {"in_run": 5.0, "remeasure": 1.2}}
    assert timings[some_b10] == 1.2
    assert timings[some_b4] == 3.9
    assert timings["unknown_iso_query"] == 99.0


def test_band_guard_anchors_to_recorded_cost():
    """A bottom-of-band query inflated 3x sits under 2x the band CAP —
    anchored to its own recorded steady-state cost it must trigger
    (the r10 pq_topk failure mode: 4.1s true, 17.3s committed)."""
    some_b2 = next(iter(bench._BATCH2))   # 4-8s band, cap 8
    timings = {some_b2: 12.6}             # < 16 (2x cap), > 8.4 (2x 4.2)
    out = bench._band_guard(
        timings,
        _fake_children({some_b2: 4.3}),
        lambda: 1000.0,
        expected={some_b2: 4.2},
    )
    assert out == {some_b2: {"in_run": 12.6, "remeasure": 4.3}}
    assert timings[some_b2] == 4.3
    # sub-second jitter stays floored at the band cap: expected 0.3,
    # in-run 0.8 (2.7x its record) must NOT trigger in the <1.5s band
    some_b10 = next(iter(bench._BATCH10))
    t2 = {some_b10: 0.8}
    out2 = bench._band_guard(
        t2, _fake_children({some_b10: 0.3}), lambda: 1000.0,
        expected={some_b10: 0.3},
    )
    assert out2 == {} and t2[some_b10] == 0.8


def test_band_guard_never_raises_timings_and_respects_budget():
    some_b10 = sorted(bench._BATCH10)[0]
    other_b10 = sorted(bench._BATCH10)[1]
    timings = {some_b10: 4.0, other_b10: 6.0}
    # noisy re-measure must not replace the faster in-run number
    out = bench._band_guard(
        timings,
        _fake_children({some_b10: 9.0, other_b10: 9.0}),
        lambda: 1000.0,
    )
    assert timings == {some_b10: 4.0, other_b10: 6.0}
    assert out[some_b10] == {"in_run": 4.0, "remeasure": 9.0}
    # exhausted budget -> no re-measures at all
    timings2 = {some_b10: 4.0}
    out2 = bench._band_guard(
        timings2, _fake_children({some_b10: 1.0}), lambda: 0.0
    )
    assert out2 == {} and timings2 == {some_b10: 4.0}


def test_bucket_names_resolve():
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    buckets = [names for names, _, _ in bench._BANDS]
    for bucket in buckets:
        assert bucket <= qs, sorted(bucket - qs)
    # bands are disjoint (a query has exactly one cost cap)
    for i, a in enumerate(buckets):
        for b in buckets[i + 1:]:
            assert not (a & b), sorted(a & b)


def _fake_children_seq(schedule):
    """run_child stub popping successive samples per query (triplets)."""

    def run_child(name):
        seq = schedule.get(name)
        return {name: seq.pop(0) if seq else -1.0}

    return run_child


def test_bimodal_triplets_banded_query_gets_three_isolated_runs():
    """A shared-session (banded) bimodal row over 1.5x its family floor
    gets 3 isolated samples; the triplet holds ONLY those (the in-run
    number is not isolated and must not masquerade as one) and the MIN
    of everything observed is committed."""
    timings = {"dedup_minhash_keep": 20.0}  # floor 8 -> trigger > 12
    out = bench._bimodal_triplets(
        timings,
        _fake_children_seq({"dedup_minhash_keep": [27.8, 20.8, 13.7]}),
        lambda: 1000.0,
    )
    assert out == {
        "dedup_minhash_keep": {
            "in_run": 20.0,
            "isolated_triplet": [27.8, 20.8, 13.7],
            # median over everything observed (in_run + isolated
            # samples) rides along: the committed min is one-sided
            # (VERDICT r12 #4), the artifact carries both.
            "median": 20.4,
        }
    }
    assert timings["dedup_minhash_keep"] == 13.7


def test_bimodal_triplets_in_run_override_survives_band_guard():
    """When the band guard already corrected a row, the triplet entry
    must still record the GENUINE first measurement as in_run, not the
    guard-corrected min."""
    timings = {"dedup_minhash_keep": 14.0}  # post-band-guard value
    out = bench._bimodal_triplets(
        timings,
        _fake_children_seq({"dedup_minhash_keep": [13.0, 12.5, 13.2]}),
        lambda: 1000.0,
        in_run_override={"dedup_minhash_keep": 24.0},
    )
    assert out["dedup_minhash_keep"]["in_run"] == 24.0
    assert out["dedup_minhash_keep"]["isolated_triplet"] == [
        13.0,
        12.5,
        13.2,
    ]
    # median computed over the OBSERVED set (the post-guard timings
    # value 14.0 + samples), not the override
    assert out["dedup_minhash_keep"]["median"] == 13.1
    assert timings["dedup_minhash_keep"] == 12.5


def test_bimodal_triplets_isolated_query_gets_two_extra_runs():
    """An unbanded (already-isolated) bimodal row counts its private-JVM
    in-run number as sample #1: only extra_runs more children."""
    assert bench._band_cap("dedup_cluster_stats") is None
    timings = {"dedup_cluster_stats": 26.4}  # floor 8 -> trigger
    sched = {"dedup_cluster_stats": [15.7, 14.8, 99.0]}
    out = bench._bimodal_triplets(
        timings, _fake_children_seq(sched), lambda: 1000.0
    )
    trip = out["dedup_cluster_stats"]["isolated_triplet"]
    assert trip == [26.4, 15.7, 14.8]
    assert out["dedup_cluster_stats"]["median"] == 15.7
    assert sched["dedup_cluster_stats"] == [99.0]  # third child never ran
    assert timings["dedup_cluster_stats"] == 14.8


def test_bimodal_triplets_quiet_below_threshold_and_budget_capped():
    # fast-mode rows (<= 1.5x floor) and non-bimodal rows: untouched
    timings = {"dedup_minhash_keep": 11.9, "tpch_q1": 50.0}
    assert (
        bench._bimodal_triplets(
            timings, _fake_children_seq({}), lambda: 1000.0
        )
        == {}
    )
    assert timings == {"dedup_minhash_keep": 11.9, "tpch_q1": 50.0}
    # exhausted budget -> no children, no record
    t2 = {"dedup_minhash_keep": 20.0}
    assert (
        bench._bimodal_triplets(
            t2,
            _fake_children_seq({"dedup_minhash_keep": [1.0]}),
            lambda: 0.0,
        )
        == {}
    )
    assert t2 == {"dedup_minhash_keep": 20.0}


def test_bimodal_triplets_worst_exceedance_first_under_child_cap():
    """When the child cap binds, the worst offender (by exceedance
    ratio) gets its triplet first."""
    timings = {
        "dedup_minhash_keep": 13.0,       # 13/12 = 1.08x over
        "link_prediction_auto": 60.0,     # 60/22.5 = 2.7x over
    }
    sched = {
        "link_prediction_auto": [17.3, 16.2],
        "dedup_minhash_keep": [12.0, 12.0, 12.0],
    }
    out = bench._bimodal_triplets(
        timings,
        _fake_children_seq(sched),
        lambda: 1000.0,
        max_children=2,
    )
    assert set(out) == {"link_prediction_auto"}
    assert timings["link_prediction_auto"] == 16.2
    assert timings["dedup_minhash_keep"] == 13.0
