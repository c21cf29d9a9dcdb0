"""Scan/lookup semantics (SURVEY.md §2.2-2.3)."""

import pyspark.sql.functions as F

from akka_graph_db_spark.operators import scan
from akka_graph_db_spark.sources.tpch import graph_from_tpch
from conftest import SF, ids


def test_get_node_point(micro):
    assert ids(scan.get_node(micro, 4)) == [4]
    assert ids(scan.get_node(micro, 999)) == []


def test_label_none_matches_all(micro):
    assert len(ids(scan.get_nodes(micro, None))) == 10
    assert len(ids(scan.get_nodes(micro, "person"))) == 5


def test_get_edges_applies_property_filter(micro):
    # canonical: the embedded backend DROPS the data filter (a flagged
    # divergence); ours must apply it
    assert ids(scan.get_edges(micro, "knows", {"w": 1})) == [104]
    assert ids(scan.get_edges(micro, "knows")) == [
        100, 101, 102, 103, 104, 113, 116,
    ]


def test_hydrate_endpoints(micro):
    e = scan.get_edge(micro, 105, hydrate=True).collect()[0]
    assert e["src_label"] == "person" and e["dst_label"] == "city"


def test_promoted_column_pushdown_and_equivalence(spark):
    g = graph_from_tpch(spark, SF, promote=True)
    g0 = graph_from_tpch(spark, SF, promote=False)
    a = ids(scan.get_nodes(g, "customer", {"mktsegment": "BUILDING"}))
    b = ids(scan.get_nodes(g0, "customer", {"mktsegment": "BUILDING"}))
    assert a == b and len(a) > 0
    # the promoted predicate must reach the parquet scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.get_nodes(g, "customer", {"mktsegment": "BUILDING"}).explain(
            "formatted"
        )
    assert "EqualTo(c_mktsegment,BUILDING)" in buf.getvalue()


def test_scan_numeric_promoted(spark):
    g = graph_from_tpch(spark, SF)
    got = scan.get_nodes(g, "part", {"size": 1})
    raw = spark.read.parquet(f"{SF}/part.parquet").where(F.col("p_size") == 1)
    assert got.count() == raw.count() > 0
