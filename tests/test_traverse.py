"""Traversal semantics (SURVEY.md §2.4): 1-hop frontiers and bounded
vertex-unique path enumeration."""

import pyspark.sql.functions as F

from akka_graph_db_spark.operators import traverse
from conftest import ids


def paths(df):
    return sorted(
        tuple(r["node_path"]) for r in df.select("node_path").collect()
    )


def test_egress_with_filters(micro):
    out = traverse.egress_edges(micro, [1], "knows", hydrate=False)
    assert ids(out) == [100, 102, 103, 104]
    out2 = traverse.egress_edges(micro, [1], "knows", {"w": 1}, hydrate=False)
    assert ids(out2) == [104]


def test_ingress_hydrates_far_endpoint(micro):
    rows = traverse.ingress_edges(micro, [4], "lives_in").collect()
    assert sorted(r["other_label"] for r in rows) == ["person", "person"]


def test_frontier_batch(micro):
    out = traverse.egress_edges(micro, [1, 2, 8], "knows", hydrate=False)
    assert ids(out) == [100, 101, 102, 103, 104, 113, 116]


def test_paths_simple_undirected(micro):
    # 4 -> 5: direct road, via hub (4-6-5), via persons (4-1-2-5 etc.)
    p = traverse.paths_to(micro, 4, 5, max_depth=2)
    assert (4, 5) in paths(p) and (4, 6, 5) in paths(p)
    # depth cap respected
    assert all(len(t) <= 3 for t in paths(p))


def test_paths_directed(micro):
    p = traverse.paths_to(micro, 1, 5, max_depth=3, directed=True)
    # directed: 1-(lives_in)->4-(road)->5 only (plus any longer directed)
    assert (1, 4, 5) in paths(p)
    assert all(t[0] == 1 and t[-1] == 5 for t in paths(p))


def test_paths_vertex_unique_no_cycles(micro):
    p = traverse.paths_to(micro, 1, 3, max_depth=4)
    for t in paths(p):
        assert len(set(t)) == len(t)  # self-loop/2-cycle never revisits


def test_paths_edge_label_filter(micro):
    p = traverse.paths_to(micro, 1, 5, max_depth=3, edge_labels=["knows"])
    assert paths(p) == []  # no knows-only route from 1 to 5
    p2 = traverse.paths_to(
        micro, 1, 5, max_depth=3, edge_labels=["lives_in", "road"]
    )
    assert (1, 4, 5) in paths(p2)


def test_paths_node_labels_empty_means_unfiltered(micro):
    # the embedded backend bug rejects everything on empty nodeLabels —
    # canonical semantics: empty = no filter
    p = traverse.paths_to(micro, 1, 2, max_depth=1)
    assert (1, 2) in paths(p)


def test_paths_node_label_filter(micro):
    # restrict interior+endpoints to person: 4 isn't a person -> no 1-4-5
    p = traverse.paths_to(
        micro, 1, 2, max_depth=3, node_labels=["person"]
    )
    for t in paths(p):
        assert 4 not in t and 5 not in t and 6 not in t


def test_paths_disconnected_empty(micro):
    assert paths(traverse.paths_to(micro, 1, 7, max_depth=6)) == []


def test_parallel_edges_give_distinct_paths(micro):
    p = traverse.paths_to(micro, 1, 3, max_depth=1)
    eps = sorted(
        tuple(r["edge_path"]) for r in p.select("edge_path").collect()
    )
    assert (103,) in eps and (104,) in eps


def test_paths_hydrated_reference_shape(micro):
    # Neo4jGraph.scala:85-94: Path = start node + ordered full edge objects.
    p = traverse.paths_to(micro, 1, 5, max_depth=3, directed=True,
                          hydrate=True)
    rows = p.collect()
    assert rows, "expected at least the 1-4-5 path"
    for r in rows:
        assert r["start"]["id"] == 1 and r["start"]["label"] is not None
        assert len(r["path"]) == r["depth"] == len(r["edge_path"])
        # hydrated edge objects line up with the id arrays, in hop order
        assert [e["id"] for e in r["path"]] == list(r["edge_path"])
        for e, (a, b) in zip(
            r["path"], zip(r["node_path"], r["node_path"][1:])
        ):
            assert e["src"] == a and e["dst"] == b  # directed: forward hops
            assert e["label"] is not None


def test_paths_hydrated_empty_keeps_schema(micro):
    p = traverse.paths_to(micro, 1, 7, max_depth=2, hydrate=True)
    assert p.count() == 0
    assert set(p.columns) == {
        "depth", "node_path", "edge_path", "start", "path"
    }


def test_generator_frontier_materialized_once(spark, micro):
    # ADVICE r2: generator frontier must yield the same result as a list.
    from akka_graph_db_spark.operators import traverse
    out = traverse.egress_edges(micro, (i for i in [1]), hydrate=False)
    assert ids(out) == ids(traverse.egress_edges(micro, [1], hydrate=False))
    assert len(ids(out)) > 0
