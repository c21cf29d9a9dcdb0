"""Point lookups and filtered scans (SURVEY.md §2.2-2.3).

Reference operators: getNode/getEdge (`Neo4jGraph.scala:212-233, 259-293`),
getNodes/getEdges (`:235-257, 295-332`). The predicate language is exactly
the reference's: optional label equality AND conjunctive exact-equality on
property keys (no ranges/OR). Canonical semantics are the remote backend's:
``label=None`` matches ALL labels (not "DEFAULT", the embedded bug at
`:588/:689`), and getEdges DOES apply the property filter (embedded bug at
`:624-628` ignores it).

Scale notes: label predicates constant-fold through the per-label union (or
hit the `label=` partition column of a stored snapshot) so non-matching
scans are pruned; property predicates on promoted typed columns push down to
parquet; JSON-map predicates evaluate post-scan (the documented cost of
fully-dynamic keys — promote hot keys at ingest).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from akka_graph_db_spark.model import PropertyGraph, prop_get

NON_PROMOTABLE = {"id", "label", "src", "dst", "props"}


def _prop_eq(df: DataFrame, key: str, value) -> Column:
    """Equality predicate on a property, preferring a promoted column."""
    if key in df.columns and key not in NON_PROMOTABLE:
        return F.col(key) == F.lit(value)
    got = prop_get(F.col("props"), key)
    if isinstance(value, bool):
        return got == F.lit("true" if value else "false")
    if isinstance(value, (int, float)):
        return got.cast("double") == F.lit(float(value))
    return got == F.lit(value)


def apply_filters(
    df: DataFrame, label: str | None, data: Mapping | None
) -> DataFrame:
    if label is not None:
        df = df.where(F.col("label") == F.lit(label))
    for k, v in (data or {}).items():
        df = df.where(_prop_eq(df, k, v))
    return df


def get_node(g: PropertyGraph, node_id: int) -> DataFrame:
    """Point lookup by id (0 or 1 rows). `Neo4jGraph.scala:212-233`."""
    return g.nodes.where(F.col("id") == F.lit(int(node_id)))


def get_nodes(
    g: PropertyGraph, label: str | None = None, data: Mapping | None = None
) -> DataFrame:
    """Filtered node scan. `Neo4jGraph.scala:235-257`."""
    return apply_filters(g.nodes, label, data)


def get_edges(
    g: PropertyGraph,
    label: str | None = None,
    data: Mapping | None = None,
    hydrate: bool = False,
) -> DataFrame:
    """Filtered edge scan; ``hydrate=True`` resolves both endpoint nodes
    (the `RETURN e,a,b` shape of `Neo4jGraph.scala:295-332`)."""
    e = apply_filters(g.edges, label, data)
    return hydrate_endpoints(g, e) if hydrate else e


def get_edge(g: PropertyGraph, edge_id: int, hydrate: bool = True) -> DataFrame:
    """Point edge lookup, endpoints hydrated. `Neo4jGraph.scala:259-293`."""
    e = g.edges.where(F.col("id") == F.lit(int(edge_id)))
    return hydrate_endpoints(g, e) if hydrate else e


def hydrate_endpoints(g: PropertyGraph, edges: DataFrame) -> DataFrame:
    """Join both endpoints' label/props onto an edge frame.

    The recurring endpoint-hydration join pair (SURVEY.md §2.2 #9): two
    equi-joins against `nodes`, which Catalyst/AQE turns into broadcasts
    when the edge side or node side is small.
    """
    n = g.nodes.select(
        F.col("id").alias("_nid"),
        F.col("label").alias("_nlabel"),
        F.col("props").alias("_nprops"),
    )
    out = (
        edges.join(n, edges["src"] == n["_nid"], "left")
        .withColumnsRenamed({"_nlabel": "src_label", "_nprops": "src_props"})
        .drop("_nid")
    )
    out = (
        out.join(n, out["dst"] == n["_nid"], "left")
        .withColumnsRenamed({"_nlabel": "dst_label", "_nprops": "dst_props"})
        .drop("_nid")
    )
    return out


def ids_df(g: PropertyGraph, ids: Iterable[int] | DataFrame) -> DataFrame:
    """Normalize an id collection to a single-column DataFrame ``(id)``."""
    if isinstance(ids, DataFrame):
        return ids.select(F.col(ids.columns[0]).cast("bigint").alias("id"))
    spark = g.nodes.sparkSession
    return spark.createDataFrame(
        [(int(i),) for i in ids], schema="id bigint"
    )
