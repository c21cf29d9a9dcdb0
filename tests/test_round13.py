"""Round-13 optimization tests.

Pins the invariants the r13 optimization pass relies on:

- the numpy XXH64 is bit-identical to Spark's ``xxhash64`` (the dedup
  size-ratio prefilter's ``_n`` is now counted in the SAME hash family
  the exact verify intersects — VERDICT r12 #2);
- both signature paths' ``_n`` equals the verify frame's set size;
- the streaming staging helpers fall back to Spark write jobs above the
  driver-size guard (VERDICT r12 #1) and the fallback stages the same
  rows;
- link_prediction_jaccard's broadcast-adjacency intersection path is
  output-identical to the shuffle wedge path it gates over.
"""

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF as SF_DIR


def test_xxhash64_np_matches_spark(spark):
    """Spark-parity of the numpy XXH64 over adversarial lengths (0..100
    bytes, every tail-branch combination), non-ASCII UTF-8, and real
    fixture tokens."""
    import numpy as np

    from akka_graph_db_spark.functions.hashing import xxhash64_bytes_np

    strings = ["x" * n for n in range(0, 101)]
    strings += ["naïve", "héllo wörld", "日本語テキスト", "a b c", " ", "\t"]
    toks = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .where(F.col("t") != "")
        .distinct()
        .limit(5000)
        .collect()
    )
    strings += [r["t"] for r in toks]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    want = [
        r["h"] for r in df.select(F.xxhash64("s").alias("h")).collect()
    ]
    got = xxhash64_bytes_np([s.encode("utf-8") for s in strings])
    assert got.dtype == np.int64
    assert list(got) == want


@pytest.mark.parametrize("shingle_n", [1, 3])
@pytest.mark.parametrize("arrow", [True, False])
def test_signature_n_equals_verify_set_size(spark, shingle_n, arrow):
    """The prefilter's ``_n`` must count elements of the SAME sets the
    exact verify intersects — on both signature paths, for both the
    token (shingle_n=1, hashed-distinct) and shingle (>1, raw-distinct)
    regimes, empty docs included."""
    from akka_graph_db_spark.functions.dedup import (
        _shingle_sets,
        _signatures,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [(90_000_001, ""), (90_000_002, "  "), (90_000_003, "one"),
         (90_000_004, "a b a b")],
        "doc_id bigint, text string",
    )
    docs = docs.unionByName(extra)
    sig_n = _signatures(
        docs, "text", "doc_id", 64, shingle_n, arrow
    ).select(F.col("_id").alias("_sid"), F.col("_n").alias("_n_sig"))
    sh_n = _shingle_sets(docs, "text", "doc_id", shingle_n).select(
        "_sid", F.col("_n").alias("_n_sh")
    )
    bad = (
        sig_n.join(sh_n, "_sid")
        .where(F.col("_n_sig") != F.col("_n_sh"))
        .count()
    )
    assert bad == 0


def test_staging_guard_falls_back_to_spark(spark, monkeypatch):
    """Above the driver-size guard the staging helpers must stage via
    Spark write jobs (VERDICT r12 #1: the pyarrow fast path reads the
    whole source into driver memory — a local-mode assumption), and the
    fallback must stage the same rows."""
    import tempfile

    import __spark_entry__ as entry

    assert not entry._stage_needs_spark(f"{SF_DIR}/events.parquet")
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DRIVER_MAX_BYTES", "1")
    assert entry._stage_needs_spark(f"{SF_DIR}/events.parquet")

    # the guarded query must still run (Spark-writer staging) and agree
    # with the pyarrow fast path's result
    slow = entry.q_streaming_hll(spark, SF_DIR).collect()
    monkeypatch.delenv("SPARK_GRAFT_STAGE_DRIVER_MAX_BYTES")
    assert not entry._stage_needs_spark(f"{SF_DIR}/events.parquet")
    fast = entry.q_streaming_hll(spark, SF_DIR).collect()
    assert slow == fast

    # _stage_spark_files writes n deterministic-mtime files whose union
    # is the input frame
    df = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("value")
    )
    dest = tempfile.mkdtemp(prefix="stage_fb_") + "/src"
    entry._stage_spark_files(df, dest, n_files=3)
    parts = sorted(os.listdir(dest))
    assert parts == ["part-00.parquet", "part-01.parquet", "part-02.parquet"]
    mtimes = [os.path.getmtime(os.path.join(dest, p)) for p in parts]
    assert mtimes == sorted(mtimes) and mtimes[0] == 1_600_000_000
    back = spark.read.parquet(dest)
    assert back.count() == 100
    assert back.agg(F.sum("event_id")).collect()[0][0] == 4950


def test_link_prediction_intersect_path_matches_wedge_path(spark):
    """The broadcast-adjacency mapInArrow intersection path must be
    row-identical to the wedge shuffle path on the same input (same
    counts, same IEEE jaccard doubles, same order)."""
    from akka_graph_db_spark.operators import analytics

    import __spark_entry__ as entry

    pairs = entry._coorder_pairs(spark, SF_DIR)

    def run(forced):
        analytics._FORCE_LP_PATH = forced
        try:
            return analytics.link_prediction_jaccard(
                pairs, top_k=50, min_common=2, max_degree=100
            ).collect()
        finally:
            analytics._FORCE_LP_PATH = None

    assert run("intersect") == run("wedge")


def test_link_prediction_intersect_bipartite_mode(spark):
    """endpoints_below (bipartite projection) agreement between paths."""
    from akka_graph_db_spark.operators import analytics

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    offset = 1_000_000
    bip = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        F.col("o_custkey").alias("a"),
        (F.col("l_partkey") + offset).alias("b"),
    )

    def run(forced):
        analytics._FORCE_LP_PATH = forced
        try:
            return analytics.link_prediction_jaccard(
                bip,
                top_k=20,
                min_common=2,
                max_degree=100,
                endpoints_below=offset,
            ).collect()
        finally:
            analytics._FORCE_LP_PATH = None

    assert run("intersect") == run("wedge")


def test_version_diff_fused_matches_joined(spark, tmp_path):
    """The fused single-aggregation version_diff must match the general
    two-load join path row for row across a multi-delta chain with
    tombstone + re-add + prop-churn, for every (v_old <= v_new) pair;
    and a cross-compaction pair must route to the joined path."""
    from akka_graph_db_spark import store
    from akka_graph_db_spark.model import PropertyGraph
    from akka_graph_db_spark.operators import crud

    def mkgraph(node_rows, edge_rows):
        nodes = spark.createDataFrame(
            node_rows, "id bigint, label string, props string"
        ).selectExpr(
            "id", "label", "from_json(props, 'map<string,string>') AS props"
        )
        edges = spark.createDataFrame(
            edge_rows,
            "id bigint, label string, src bigint, dst bigint, props string",
        ).selectExpr(
            "id", "label", "src", "dst",
            "from_json(props, 'map<string,string>') AS props",
        )
        return PropertyGraph(nodes, edges)

    g0 = mkgraph(
        [(1, "a", '{"x":"1"}'), (2, "a", "{}"), (3, "b", "{}")],
        [(10, "e", 1, 2, "{}"), (11, "e", 2, 3, "{}")],
    )
    # v1: update 1, remove 3 (cascades edge 11), add 4
    g1 = crud.update_nodes(g0, {1: {"x": "2"}})
    g1 = crud.remove_nodes_by_id(g1, [3])
    g1 = crud.add_nodes(g1, [(4, "a", {})])
    # v2: re-add 3 (tombstone then re-add), remove 4, churn 1 back
    g2 = crud.add_nodes(g1, [(3, "b", {"y": "9"})])
    g2 = crud.remove_nodes_by_id(g2, [4])
    g2 = crud.update_nodes(g2, {1: {"x": "1"}})

    root = str(tmp_path / "vdf")
    store.save_snapshot(g0, root)
    store.save_delta(root, store.delta_from_graphs(g0, g1), validate=False)
    store.save_delta(root, store.delta_from_graphs(g1, g2), validate=False)

    rows = lambda df: [  # noqa: E731
        (r["kind"], r["id"], r["change"]) for r in df.collect()
    ]
    kinds = dict(store.list_version_kinds(root, spark))
    for vo in (0, 1, 2):
        for vn in (vo, vo + 1, 2):
            if vn > 2:
                continue
            fused = store._version_diff_fused(
                root, 0, vo, vn, kinds, spark
            )
            joined = store._version_diff_joined(root, vo, vn, spark)
            assert rows(fused) == rows(joined), (vo, vn)
            # the public entry must agree too (it picks the fused path)
            assert rows(store.version_diff(root, vo, vn, spark)) == rows(
                joined
            ), (vo, vn)
    # v0 -> v1 vs g0/g1 ground truth: 1 updated, 3+11 removed, 4 added
    got = rows(store.version_diff(root, 0, 1, spark))
    assert ("node", 1, "updated") in got and ("node", 4, "added") in got
    # compaction: a new base above v2 forces cross-base pairs onto the
    # joined path (different base chains)
    store.compact(root)  # v3 = base
    got_x = rows(store.version_diff(root, 1, 3, spark))
    want_x = rows(store._version_diff_joined(root, 1, 3, spark))
    assert got_x == want_x
