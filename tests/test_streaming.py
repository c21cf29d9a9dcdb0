"""§2.6: streaming mutation fold == batch-applied CRUD."""

import os
import tempfile

from akka_graph_db_spark.operators import crud
from akka_graph_db_spark.streaming.fold import (
    MUTATION_SCHEMA,
    StreamingGraphFold,
    apply_mutation_batch,
)
from conftest import ids

LOG = [
    (1, "add", "node", 50, "t", None, None, {"v": '"a"'}),
    (2, "add", "node", 51, "t", None, None, {"v": '"b"'}),
    (3, "add", "edge", 60, "te", 50, 51, {}),
    (4, "update", "node", 50, None, None, None, {"v": '"a2"'}),
    (5, "remove", "node", 51, None, None, None, None),
    (6, "add", "node", 52, "t", None, None, {}),
]


def expected(micro):
    g = crud.add_nodes(micro, [(50, "t", {"v": "a"}), (51, "t", {"v": "b"})])
    g = crud.add_edges(g, [(60, "te", 50, 51, {})])
    g = crud.update_nodes(g, {50: {"v": "a2"}})
    g = crud.remove_nodes_by_id(g, [51])  # cascades to edge 60
    g = crud.add_nodes(g, [(52, "t", {})])
    return g


def test_batch_fold_matches_crud(spark, micro):
    batch = spark.createDataFrame(LOG, MUTATION_SCHEMA)
    folded = apply_mutation_batch(micro, batch)
    exp = expected(micro)
    assert ids(folded.nodes) == ids(exp.nodes)
    assert ids(folded.edges) == ids(exp.edges)
    assert 60 not in ids(folded.edges)  # cascade inside the fold


def test_same_id_updated_twice_in_one_batch(spark, micro):
    log = [
        (1, "add", "node", 50, "t", None, None, {"v": '"a"'}),
        (2, "update", "node", 50, None, None, None, {"v": '"b"'}),
        (3, "update", "node", 50, None, None, None, {"w": '"c"'}),
    ]
    batch = spark.createDataFrame(log, MUTATION_SCHEMA)
    folded = apply_mutation_batch(micro, batch)
    rows = folded.nodes.where("id = 50").collect()
    assert len(rows) == 1  # no duplicate-row corruption
    assert rows[0]["props"] == {"v": '"b"', "w": '"c"'}  # both updates land


def test_streaming_fold_matches_batch(spark, micro):
    tmp = tempfile.mkdtemp(prefix="fold_")
    log_dir = os.path.join(tmp, "log")
    # 3 micro-batch files in seq order (one file per repartition slice
    # would interleave; availableNow processes files deterministically and
    # the fold orders by seq inside each batch)
    spark.createDataFrame(LOG, MUTATION_SCHEMA).coalesce(1).write.json(log_dir)
    stream = spark.readStream.schema(MUTATION_SCHEMA).json(log_dir)
    fold = StreamingGraphFold(micro)
    final = fold.run(stream, os.path.join(tmp, "ckpt"))
    exp = expected(micro)
    assert ids(final.nodes) == ids(exp.nodes)
    assert ids(final.edges) == ids(exp.edges)
    assert fold.batches_applied >= 1


def test_streaming_fold_durable_deltas(spark, micro):
    from akka_graph_db_spark import store

    tmp = tempfile.mkdtemp(prefix="fold_")
    log_dir = os.path.join(tmp, "log")
    # one file per command => one micro-batch each (maxFilesPerTrigger=1)
    for row in LOG:
        spark.createDataFrame([row], MUTATION_SCHEMA).coalesce(1).write.mode(
            "append"
        ).json(log_dir)
    stream = (
        spark.readStream.schema(MUTATION_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(log_dir)
    )
    root = os.path.join(tmp, "store")
    fold = StreamingGraphFold(
        micro, store_root=root, store_every=2, compact_every=2
    )
    final = fold.run(stream, os.path.join(tmp, "ckpt"))
    exp = expected(micro)
    assert ids(final.nodes) == ids(exp.nodes)

    # durable state equals the in-memory fold result
    persisted = store.load_snapshot(spark, root)
    assert ids(persisted.nodes) == ids(final.nodes)
    assert ids(persisted.edges) == ids(final.edges)
    # 6 single-command batches / store_every=2 -> base + deltas, and
    # compact_every=2 re-based at least once
    kinds = store.list_version_kinds(root)
    assert kinds[0] == (0, "base")
    assert any(k == "delta" for _, k in kinds[1:])
    assert any(k == "base" for _, k in kinds[1:])


def test_durable_delta_is_o_changes(spark, micro):
    """The persisted delta must contain ONLY the ids the mutation batches
    touched (plus cascade victims) — never a rewrite of untouched rows.
    Pins the touched-id-restricted diff in StreamingGraphFold._persist."""
    from akka_graph_db_spark import store

    tmp = tempfile.mkdtemp(prefix="fold_oc_")
    root = os.path.join(tmp, "store")
    # batch 0 -> base snapshot of micro + the added node
    b0 = [(1, "add", "node", 70, "t", None, None, {})]
    # batch 1 -> delta: one update + one node remove cascading to an edge
    b1 = [
        (2, "update", "node", 70, None, None, None, {"v": '"x"'}),
        (3, "remove", "node", 1, None, None, None, None),
    ]
    fold = StreamingGraphFold(micro, store_root=root, store_every=1)
    for i, rows in enumerate((b0, b1)):
        log_dir = os.path.join(tmp, f"log{i}")
        spark.createDataFrame(rows, MUTATION_SCHEMA).coalesce(1).write.json(
            log_dir
        )
        fold.run(
            spark.readStream.schema(MUTATION_SCHEMA).json(log_dir),
            os.path.join(tmp, f"ckpt{i}"),
        )
    kinds = store.list_version_kinds(root)
    assert kinds == [(0, "base"), (1, "delta")]
    vdir = os.path.join(root, "v=1")
    n_up = spark.read.parquet(os.path.join(vdir, "nodes_upserts"))
    n_del = spark.read.parquet(os.path.join(vdir, "node_deletes"))
    e_del = spark.read.parquet(os.path.join(vdir, "edge_deletes"))
    assert ids(n_up) == [70]          # only the updated node rewrites
    assert ids(n_del) == [1]          # only the removed node deletes
    # micro's edges incident to node 1 cascade-delete, nothing else
    incident = {
        r["id"]
        for r in micro.edges.where(
            (micro.edges.src == 1) | (micro.edges.dst == 1)
        ).collect()
    }
    assert set(ids(e_del)) == incident and incident
    # and the merged read-back equals the in-memory fold state
    persisted = store.load_snapshot(spark, root)
    assert ids(persisted.nodes) == ids(fold.graph.nodes)
    assert ids(persisted.edges) == ids(fold.graph.edges)


def test_streaming_cms_merge_equals_batch(spark):
    """CMS counters ADD: the sketch accumulated over N micro-batches is
    bit-identical to the batch sketch of the same rows, and estimates
    for in-corpus terms are >= exact counts."""
    import os
    import tempfile

    from akka_graph_db_spark.functions import search
    from akka_graph_db_spark.streaming.sketch import StreamingCMS

    rows = [(t,) for t in ["a"] * 5 + ["b"] * 3 + ["c"] * 2]
    df = spark.createDataFrame(rows, "term string")
    tmp = tempfile.mkdtemp(prefix="scms_t_")
    src = os.path.join(tmp, "src")
    df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cms = StreamingCMS(width=64, depth=3)
    sketch = cms.run(stream, os.path.join(tmp, "ckpt"))
    assert cms.batches_applied == 3
    batch = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in search.cms_sketch(df, width=64, depth=3).collect()
    }
    merged = {
        (r["row"], r["bucket"]): r["cnt"] for r in sketch.collect()
    }
    assert merged == batch
    est = {
        r["term"]: r["cms_estimate"]
        for r in search.cms_estimate(
            sketch, df.select("term").distinct(), width=64, depth=3
        ).collect()
    }
    assert est["a"] >= 5 and est["b"] >= 3 and est["c"] >= 2


def test_streaming_hll_merge_equals_batch(spark):
    """HLL registers merge by MAX: streamed registers == batch registers
    bit-for-bit, so the estimate is identical too."""
    import os
    import tempfile

    from akka_graph_db_spark.functions import search
    from akka_graph_db_spark.streaming.sketch import StreamingHLL

    from pyspark.sql import functions as F

    df = spark.range(0, 300).select(F.col("id").alias("v"))
    tmp = tempfile.mkdtemp(prefix="shll_t_")
    src = os.path.join(tmp, "src")
    df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    hll = StreamingHLL(value_col="v", p=6)
    sketch = hll.run(stream, os.path.join(tmp, "ckpt"))
    assert hll.batches_applied == 3
    batch = {
        r["bucket"]: r["register"]
        for r in search.hll_sketch(df, "v", p=6).collect()
    }
    merged = {r["bucket"]: r["register"] for r in sketch.collect()}
    assert merged == batch
