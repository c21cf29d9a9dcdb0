"""Mutations as copy-on-write snapshot transforms (SURVEY.md §2.1).

The reference mutates a Neo4j store in place; the Spark-native equivalent is
a pure function ``PropertyGraph -> PropertyGraph`` per mutation batch —
anti-join for deletes, union for inserts, join + map-merge for updates.
Batches, not single rows, are the API: a one-row mutation is just a
degenerate batch. `store.py` persists snapshots as versioned
label-partitioned parquet.

Canonical semantics preserved (remote backend of the reference):

- removeNode CASCADES to incident edges (`DETACH DELETE`,
  `Neo4jGraph.scala:408`) — NOT the embedded backend's silent no-op.
- removeNodes(label=None, data) matches all labels (`:415-431`), not the
  embedded "DEFAULT"-label bug (`:689`).
- update merges the property map; a JSON ``null`` value DELETES the key
  (`SET n += {...}` + `:486-487`).
- addEdge requires both endpoints to exist (`:188-194` MATCHes them first);
  here that's a left-semi join of the new edges against current nodes.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from akka_graph_db_spark.model import (
    EDGE_CORE_COLS,
    NODE_CORE_COLS,
    PropertyGraph,
    encode_py_value,
)
from akka_graph_db_spark.operators.scan import apply_filters, ids_df


def _py_props_to_map(props: Mapping | None, keep_nulls: bool = False):
    pairs = []
    for k, v in (props or {}).items():
        frag = "null" if v is None else encode_py_value(v)
        if frag is None and not keep_nulls:
            continue
        pairs.append((k, frag))
    return pairs


def _rows_to_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# -- inserts ----------------------------------------------------------------

def add_nodes(
    g: PropertyGraph,
    new_nodes: DataFrame | Sequence[tuple[int, str, Mapping]],
) -> PropertyGraph:
    """Append nodes. Input: DataFrame(id,label,props MAP<STRING,STRING>) or
    [(id, label, {key: py_value})] driver-side rows. `Neo4jGraph.scala:156-176`.
    """
    spark = g.nodes.sparkSession
    if not isinstance(new_nodes, DataFrame):
        rows = [
            (int(i), lbl, dict(_py_props_to_map(p)))
            for (i, lbl, p) in new_nodes
        ]
        new_nodes = _rows_to_df(
            spark, rows, "id bigint, label string, props map<string,string>"
        )
    return g.with_nodes(
        g.nodes.select(*NODE_CORE_COLS).unionByName(
            new_nodes.select(*NODE_CORE_COLS)
        )
    )


def add_edges(
    g: PropertyGraph,
    new_edges: DataFrame | Sequence[tuple[int, str, int, int, Mapping]],
    validate_endpoints: bool = True,
) -> PropertyGraph:
    """Append directed labeled edges; rows whose endpoints are absent are
    dropped (the reference's MATCH-first contract, `Neo4jGraph.scala:188-194`).
    """
    spark = g.edges.sparkSession
    if not isinstance(new_edges, DataFrame):
        rows = [
            (int(i), lbl, int(s), int(d), dict(_py_props_to_map(p)))
            for (i, lbl, s, d, p) in new_edges
        ]
        new_edges = _rows_to_df(
            spark,
            rows,
            "id bigint, label string, src bigint, dst bigint,"
            " props map<string,string>",
        )
    new_edges = new_edges.select(*EDGE_CORE_COLS)
    if validate_endpoints:
        node_ids = g.nodes.select("id")
        new_edges = new_edges.join(
            node_ids, new_edges["src"] == node_ids["id"], "left_semi"
        )
        new_edges = new_edges.join(
            node_ids, new_edges["dst"] == node_ids["id"], "left_semi"
        )
    return g.with_edges(
        g.edges.select(*EDGE_CORE_COLS).unionByName(new_edges)
    )


# -- updates ----------------------------------------------------------------

def _empty_map():
    return F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )

# Mutation sets below this row count are safe to broadcast; larger batches
# (bulk updates/deletes near table size) must shuffle — let AQE pick.
_BROADCAST_MUTATION_MAX = 100_000


def _maybe_broadcast(df: DataFrame, known_rows: int | None) -> DataFrame:
    """Broadcast-hint only when the row count is KNOWN small (driver-side
    input). DataFrame-valued mutation sets of unknown size are left to AQE —
    an unconditional hint on a 100M-row victim set would OOM the driver."""
    if known_rows is not None and known_rows <= _BROADCAST_MUTATION_MAX:
        return F.broadcast(df)
    return df


def _merge_props(current, changes):
    """Union-merge two JSON-fragment maps; change wins; ``"null"`` fragment
    deletes the key (`Neo4jGraph.scala:486-487`). NULL current map (a node
    ingested with props=NULL) merges as empty, not NULL-propagates."""
    cur = F.coalesce(current, _empty_map())
    merged = F.map_zip_with(cur, changes, lambda _, v1, v2: F.coalesce(v2, v1))
    return F.map_filter(merged, lambda _, v: v != F.lit("null"))


def update_nodes(
    g: PropertyGraph,
    changes: DataFrame | Mapping[int, Mapping],
) -> PropertyGraph:
    """Merge-update node property maps (`SET n += {...}`,
    `Neo4jGraph.scala:442-467`). ``changes``: DataFrame(id, changes
    MAP<STRING,STRING> of JSON fragments) or {id: {key: py_value_or_None}}
    (None → delete key)."""
    return g.with_nodes(_apply_update(g.nodes, g.nodes.sparkSession, changes))


def update_edges(
    g: PropertyGraph,
    changes: DataFrame | Mapping[int, Mapping],
) -> PropertyGraph:
    """Same merge/null-delete semantics on edges (`Neo4jGraph.scala:469-490`)."""
    return g.with_edges(_apply_update(g.edges, g.edges.sparkSession, changes))


def merge_keep_nulls(acc, ch):
    """Map merge where the change side wins but ``"null"`` delete-markers
    are KEPT (they must still delete at the final merge)."""
    a = F.coalesce(acc, _empty_map())
    return F.map_zip_with(a, ch, lambda _, v1, v2: F.coalesce(v2, v1))


def _apply_update(df: DataFrame, spark, changes):
    known_rows = None
    if not isinstance(changes, DataFrame):
        rows = [
            (int(i), dict(_py_props_to_map(ch, keep_nulls=True)))
            for i, ch in changes.items()
        ]
        known_rows = len(rows)
        changes = _rows_to_df(spark, rows, "id bigint, changes map<string,string>")
    else:
        # Collapse duplicate ids BEFORE the join — a changes-set with the
        # same id twice would otherwise emit the node twice, corrupting the
        # unique-id invariant. Relative order of duplicate rows is
        # unspecified here (DataFrames are unordered); callers that care
        # (streaming fold) pre-merge in seq order.
        changes = changes.groupBy("id").agg(
            F.aggregate(
                F.collect_list("changes"),
                _empty_map(),
                merge_keep_nulls,
            ).alias("changes")
        )
    ch = _maybe_broadcast(
        changes.select(
            F.col("id").alias("_cid"), F.col("changes").alias("_changes")
        ),
        known_rows,
    )
    core = [c for c in df.columns if c in EDGE_CORE_COLS]
    df = df.select(*core)  # promoted columns would go stale post-merge
    out = df.join(ch, df["id"] == ch["_cid"], "left")
    return out.withColumn(
        "props",
        F.when(F.col("_cid").isNull(), F.col("props")).otherwise(
            _merge_props(F.col("props"), F.col("_changes"))
        ),
    ).drop("_cid", "_changes")


# -- deletes ----------------------------------------------------------------

def remove_nodes_by_id(g: PropertyGraph, node_ids) -> PropertyGraph:
    """Delete nodes by id, CASCADING to all incident edges
    (`DETACH DELETE`, `Neo4jGraph.scala:406-413`)."""
    known = None
    if not isinstance(node_ids, DataFrame):
        node_ids = list(node_ids)  # materialize once: input may be a one-shot generator
        known = len(node_ids)
    victims = ids_df(g, node_ids).select(F.col("id").alias("_vid"))
    victims = _maybe_broadcast(victims, known)
    nodes = g.nodes.join(
        victims, g.nodes["id"] == victims["_vid"], "left_anti"
    )
    edges = g.edges.join(
        victims, g.edges["src"] == victims["_vid"], "left_anti"
    )
    edges = edges.join(victims, edges["dst"] == victims["_vid"], "left_anti")
    return PropertyGraph(nodes=nodes, edges=edges)


def remove_nodes(
    g: PropertyGraph, label: str | None = None, data: Mapping | None = None
) -> PropertyGraph:
    """Bulk cascading delete by label/property predicate
    (`Neo4jGraph.scala:415-431`); ``label=None`` matches every label."""
    victims = apply_filters(g.nodes, label, data).select("id")
    return remove_nodes_by_id(g, victims)


def remove_edges_by_id(g: PropertyGraph, edge_ids) -> PropertyGraph:
    """Delete edges by id (`Neo4jGraph.scala:433-440`)."""
    known = None
    if not isinstance(edge_ids, DataFrame):
        edge_ids = list(edge_ids)  # materialize once: input may be a one-shot generator
        known = len(edge_ids)
    victims = ids_df(g, edge_ids).select(F.col("id").alias("_vid"))
    edges = g.edges.join(
        _maybe_broadcast(victims, known),
        g.edges["id"] == victims["_vid"],
        "left_anti",
    )
    return g.with_edges(edges)


def remove_edges(
    g: PropertyGraph, label: str | None = None, data: Mapping | None = None
) -> PropertyGraph:
    """Bulk edge delete by predicate (batch generalization of removeEdge)."""
    victims = apply_filters(g.edges, label, data).select("id")
    return remove_edges_by_id(g, victims)
