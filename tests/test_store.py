"""Snapshot store: mutate → save → reload → scan round-trip."""

import tempfile

import pyspark.sql.functions as F

from akka_graph_db_spark import store
from akka_graph_db_spark.operators import crud, scan
from conftest import ids


def test_round_trip_and_versions(spark, micro):
    root = tempfile.mkdtemp(prefix="snap_")
    v0 = store.save_snapshot(micro, root)
    g2 = crud.remove_nodes_by_id(micro, [1])
    v1 = store.save_snapshot(g2, root)
    assert store.list_versions(root) == [v0, v1] == [0, 1]

    latest = store.load_snapshot(spark, root)
    assert ids(latest.nodes) == ids(g2.nodes)
    assert ids(latest.edges) == ids(g2.edges)

    original = store.load_snapshot(spark, root, version=0)
    assert ids(original.nodes) == ids(micro.nodes)


def test_reloaded_snapshot_scans_and_mutates(spark, micro):
    root = tempfile.mkdtemp(prefix="snap_")
    store.save_snapshot(micro, root)
    g = store.load_snapshot(spark, root)
    assert ids(scan.get_nodes(g, "person", {"name": "alice"})) == [1]
    g2 = crud.update_nodes(g, {1: {"name": "ALICE"}})
    assert ids(scan.get_nodes(g2, "person", {"name": "ALICE"})) == [1]


def test_label_partition_pruning(spark, micro):
    import contextlib
    import io

    root = tempfile.mkdtemp(prefix="snap_")
    store.save_snapshot(micro, root)
    g = store.load_snapshot(spark, root)
    q = g.nodes.where(F.col("label") == "person")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    txt = buf.getvalue()
    # label is a filesystem partition column on the stored layout
    assert "PartitionFilters" in txt and "label" in txt


def test_empty_graph_round_trips(spark, micro):
    # ADVICE r2: an edge-less (or node-less) graph is a legal snapshot state;
    # the write emits only _SUCCESS and the load must not die on inference.
    root = tempfile.mkdtemp(prefix="snap_")
    empty = crud.remove_nodes(micro, label=None, data=None)
    store.save_snapshot(empty, root)
    g = store.load_snapshot(spark, root)
    assert g.nodes.count() == 0
    assert g.edges.count() == 0
    assert [f.name for f in g.nodes.schema.fields] == ["id", "label", "props"]
    assert [f.name for f in g.edges.schema.fields] == [
        "id", "label", "src", "dst", "props",
    ]


def test_file_uri_round_trip(spark, micro):
    # VERDICT r2 #6: versioning must work through the Hadoop FileSystem API
    # (object-storage layout), not os.listdir — exercised via file:// here.
    root = "file://" + tempfile.mkdtemp(prefix="snap_uri_")
    v0 = store.save_snapshot(micro, root)
    assert store.list_versions(root, spark) == [v0] == [0]
    g = store.load_snapshot(spark, root)
    assert ids(g.nodes) == ids(micro.nodes)
    assert ids(g.edges) == ids(micro.edges)
