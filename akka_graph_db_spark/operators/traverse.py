"""Topology operators: 1-hop egress/ingress and variable-length paths
(SURVEY.md §2.4).

- getEgressEdges / getIngressEdges (`Neo4jGraph.scala:334-368, 370-404`):
  batch-first — the argument is a *frontier* of node ids, not one node, so a
  million-source expansion is one Catalyst-planned join instead of a million
  point queries. Canonical semantics: edge label AND edge-property filters
  both apply (the embedded backend drops edgeData, a flagged divergence).

- paths_to (`Neo4jGraph.scala:492-520`): the reference's Cypher is
  ``path = (start)-[:L*]-(end)`` — variable-length, UNDIRECTED, unbounded,
  with an optional all-path-nodes label filter. Unbounded enumeration is
  unshippable at scale, so we take the SURVEY.md #14 design: a driver-side
  BFS (Pregel-style frontier join per superstep) with an explicit
  ``max_depth`` and per-path VERTEX uniqueness (strictly stronger than
  Cypher's relationship-uniqueness; documented deviation — it is the variant
  that stays polynomial on dense graphs).

Scale behavior: the frontier⋈edges join is the classic supernode-skew spot —
we persist + count the frontier each superstep (needed for the empty-frontier
early exit anyway) and broadcast it while it stays small; past the broadcast
threshold we fall back to a shuffle join with AQE skew handling. Lineage is
truncated with localCheckpoint every few supersteps so plans don't grow
exponentially with depth.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from akka_graph_db_spark.model import PropertyGraph
from akka_graph_db_spark.operators.scan import apply_filters, ids_df

_BROADCAST_FRONTIER_MAX = 200_000  # rows; beyond this let AQE pick the join
_CHECKPOINT_EVERY = 3  # supersteps between lineage truncations


def egress_edges(
    g: PropertyGraph,
    node_ids: Iterable[int] | DataFrame,
    edge_label: str | None = None,
    edge_data: Mapping | None = None,
    hydrate: bool = True,
) -> DataFrame:
    """Out-edges of a frontier of nodes; far endpoint (dst) hydrated."""
    return _one_hop(g, node_ids, edge_label, edge_data, hydrate, out=True)


def ingress_edges(
    g: PropertyGraph,
    node_ids: Iterable[int] | DataFrame,
    edge_label: str | None = None,
    edge_data: Mapping | None = None,
    hydrate: bool = True,
) -> DataFrame:
    """In-edges of a frontier of nodes; far endpoint (src) hydrated."""
    return _one_hop(g, node_ids, edge_label, edge_data, hydrate, out=False)


def _one_hop(g, node_ids, edge_label, edge_data, hydrate, out):
    near, far = ("src", "dst") if out else ("dst", "src")
    known = None
    if not isinstance(node_ids, DataFrame):
        node_ids = list(node_ids)  # materialize once: input may be a one-shot generator
        known = len(node_ids)
    frontier = ids_df(g, node_ids).withColumnRenamed("id", "_fid")
    # Broadcast only when the frontier is KNOWN small (driver-side id list).
    # A caller-supplied DataFrame frontier of unknown size is left to AQE —
    # the unconditional hint would OOM the driver on a 100M-row frontier.
    if known is not None and known <= _BROADCAST_FRONTIER_MAX:
        frontier = F.broadcast(frontier)
    e = apply_filters(g.edges, edge_label, edge_data)
    joined = e.join(frontier, e[near] == frontier["_fid"], "inner").drop("_fid")
    if not hydrate:
        return joined
    n = g.nodes.select(
        F.col("id").alias("_nid"),
        F.col("label").alias("other_label"),
        F.col("props").alias("other_props"),
    )
    return joined.join(n, joined[far] == n["_nid"], "left").drop("_nid")


def paths_to(
    g: PropertyGraph,
    start_id: int,
    end_id: int,
    node_labels: Sequence[str] = (),
    edge_labels: Sequence[str] = (),
    max_depth: int = 6,
    directed: bool = False,
    hydrate: bool = False,
) -> DataFrame:
    """Enumerate simple paths start→end (≥1 hop), undirected by default.

    Returns ``(depth INT, node_path ARRAY<BIGINT>, edge_path ARRAY<BIGINT>)``
    — the start-node + ordered-edge-list shape of the reference's Path
    (`Neo4jGraph.scala:85-94`). ``node_labels`` non-empty restricts EVERY
    node on the path (endpoints included) to those labels, matching the
    Cypher ``ALL(x IN NODES(path) ...)`` filter; empty means unfiltered (the
    embedded backend's empty-rejects-everything bug is NOT reproduced).
    ``edge_labels`` non-empty restricts traversed edge types.

    ``hydrate=True`` adds the reference's FULL Path shape
    (`Neo4jGraph.scala:85-94`: ``{start: <node>, path: [<edge>...]}``):
    a ``start STRUCT<id,label>`` column and a ``path
    ARRAY<STRUCT<id,src,dst,label>>`` column of ordered edge objects —
    see :func:`hydrate_paths`.
    """
    spark = g.nodes.sparkSession
    start_id, end_id = int(start_id), int(end_id)

    if directed:
        rel = g.edges.select(
            F.col("src").alias("a"), F.col("dst").alias("b"), "id", "label"
        )
    else:
        rel = g.undirected_edges()
    if edge_labels:
        rel = rel.where(F.col("label").isin(list(edge_labels)))
    rel = rel.select("a", "b", F.col("id").alias("eid"))

    if node_labels:
        allowed = g.nodes.where(F.col("label").isin(list(node_labels))).select(
            F.col("id").alias("_aid")
        )
        # Interior/terminal nodes checked during expansion; start checked here.
        start_ok = (
            g.nodes.where(
                (F.col("id") == start_id)
                & F.col("label").isin(list(node_labels))
            ).count()
            > 0
        )
        if not start_ok:
            empty = spark.createDataFrame(
                [], "depth int, node_path array<bigint>, edge_path array<bigint>"
            )
            return hydrate_paths(g, empty, start_id) if hydrate else empty
        rel = rel.join(allowed, rel["b"] == allowed["_aid"], "left_semi")

    # one materialization instead of re-deriving the edge view (scans + any
    # ingest-time windows + label semi-joins) at EVERY superstep below
    rel = rel.persist(StorageLevel.MEMORY_AND_DISK)

    frontier = spark.createDataFrame(
        [(start_id, [start_id], [])],
        "cur bigint, node_path array<bigint>, edge_path array<bigint>",
    )
    results: list[DataFrame] = []
    persisted: list[DataFrame] = []
    try:
        for depth in range(1, max_depth + 1):
            stepped = (
                frontier.join(rel, frontier["cur"] == rel["a"], "inner")
                .where(~F.array_contains(F.col("node_path"), F.col("b")))
                .select(
                    F.col("b").alias("cur"),
                    F.concat(F.col("node_path"), F.array(F.col("b"))).alias(
                        "node_path"
                    ),
                    F.concat(F.col("edge_path"), F.array(F.col("eid"))).alias(
                        "edge_path"
                    ),
                )
            )
            if depth % _CHECKPOINT_EVERY == 0:
                stepped = stepped.localCheckpoint(eager=True)
                n_alive = stepped.count()
            else:
                stepped = stepped.persist(StorageLevel.MEMORY_AND_DISK)
                persisted.append(stepped)
                n_alive = stepped.count()

            hits = stepped.where(F.col("cur") == end_id).select(
                F.lit(depth).alias("depth"), "node_path", "edge_path"
            )
            results.append(hits)
            if n_alive == 0:
                break
            nxt = stepped.where(F.col("cur") != end_id)
            if n_alive <= _BROADCAST_FRONTIER_MAX:
                nxt = F.broadcast(nxt)
            frontier = nxt

        if not results:
            out = spark.createDataFrame(
                [], "depth int, node_path array<bigint>, edge_path array<bigint>"
            )
        else:
            out = results[0]
            for r in results[1:]:
                out = out.unionByName(r)
            # Materialize before unpersisting the supersteps backing it.
            out = out.localCheckpoint(eager=True)
        return hydrate_paths(g, out, start_id) if hydrate else out
    finally:
        rel.unpersist()
        for df in persisted:
            df.unpersist()


def hydrate_paths(
    g: PropertyGraph, paths: DataFrame, start_id: int
) -> DataFrame:
    """Join full edge objects (and the start node) onto id-array paths —
    the reference's Path payload (`Neo4jGraph.scala:85-94`: a start node
    plus the ordered list of traversed edge objects).

    Input: ``(depth, node_path, edge_path)`` rows from :func:`paths_to`.
    Output adds ``start STRUCT<id,label>`` and ``path
    ARRAY<STRUCT<id,src,dst,label>>`` (ordered by hop position).

    Scale shape: posexplode the edge-id arrays, ONE shuffle join against the
    edge frame on edge id, then group back on the path identity (the
    edge_path array IS the path's primary key — a simple path visits an
    edge at most once, so two distinct paths cannot share the sequence) and
    reassemble order via array_sort on (pos, edge). The start node is a
    1-row broadcast cross join. No driver-side loops; path count and path
    length both stay distributed.
    """
    start = F.broadcast(
        g.nodes.where(F.col("id") == int(start_id)).select(
            F.struct(F.col("id"), F.col("label")).alias("start")
        )
    )
    ex = paths.select(
        "depth",
        "node_path",
        "edge_path",
        F.posexplode("edge_path").alias("_pos", "_eid"),
    )
    e = g.edges.select(
        F.col("id").alias("_eid"), "src", "dst", F.col("label")
    )
    hydr = (
        ex.join(e, "_eid", "inner")
        .groupBy("depth", "node_path", "edge_path")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_pos").alias("pos"),
                        F.struct(
                            F.col("_eid").alias("id"),
                            F.col("src"),
                            F.col("dst"),
                            F.col("label"),
                        ).alias("e"),
                    )
                )
            ).alias("_pe")
        )
        .select(
            "depth",
            "node_path",
            "edge_path",
            F.transform("_pe", lambda s: s["e"]).alias("path"),
        )
    )
    return hydr.crossJoin(start)
