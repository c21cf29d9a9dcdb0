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

from akka_graph_db_spark.model import (
    _TS_FMT,
    PropertyGraph,
    encode_py_value,
    prop_raw,
)

NON_PROMOTABLE = {"id", "label", "src", "dst", "props"}

_NUMERIC_DTYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _prop_eq(df: DataFrame, key: str, value) -> Column:
    """TYPED equality predicate on a property, preferring a promoted column.

    Canonical semantics (reference renders typed Cypher literals,
    `Neo4jGraph.scala:121-141`): cross-type equality NEVER matches — a stored
    string ``"12"`` does not match a numeric query ``12``, and ``"true"``
    does not match ``True``. On the JSON-fragment tier this falls out of
    comparing raw fragments: a quoted fragment can't equal an unquoted one,
    and ``cast('"12"' AS DOUBLE)`` is NULL in Spark, so the numeric
    double-compare is already quote-safe.
    """
    if key in df.columns and key not in NON_PROMOTABLE:
        dt = dict(df.dtypes).get(key, "")
        base = dt.split("(")[0]
        if isinstance(value, bool):
            return F.col(key) == F.lit(value) if base == "boolean" else F.lit(False)
        if isinstance(value, (int, float)):
            if base in _NUMERIC_DTYPES or base == "decimal":
                return F.col(key).cast("double") == F.lit(float(value))
            return F.lit(False)
        if isinstance(value, str):
            if base == "string":
                return F.col(key) == F.lit(value)
            if base in ("timestamp", "date"):  # stored quoted in props tier
                return F.col(key) == F.lit(value).try_cast(dt)
            return F.lit(False)
        return F.col(key) == F.lit(value)
    raw = prop_raw(F.col("props"), key)
    if isinstance(value, bool):
        return raw == F.lit("true" if value else "false")
    if isinstance(value, (int, float)):
        # quoted fragments try_cast to NULL -> never match a number (typed eq)
        return raw.try_cast("double") == F.lit(float(value))
    if isinstance(value, str):
        # exact string match, OR the timestamp-rendered form: a timestamp
        # prop is stored as a quoted microsecond string, so the query
        # "1996-01-02 00:00:00" must match it the same way it matches a
        # promoted TIMESTAMP column (tier-consistent semantics)
        ts = F.lit(value).try_cast("timestamp")
        ts_frag = F.concat(
            F.lit('"'), F.date_format(ts, _TS_FMT), F.lit('"')
        )
        return (raw == F.lit(encode_py_value(value))) | (
            ts.isNotNull() & (raw == ts_frag)
        )
    return raw == F.lit(encode_py_value(value))


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
    """Point edge lookup, endpoints hydrated. `Neo4jGraph.scala:259-293`.

    Point-lookup plan note: hydration first RESOLVES the edge's (src, dst)
    with a tiny collect, then filters nodes by those two ids — so both node
    scans get an id equality pushed to parquet (row-group skipping) instead
    of streaming the full nodes table through two broadcast joins. The
    reference's getEdge is likewise an eager point read (returns Option[E]).
    Batch hydration (``get_edges(hydrate=True)``) stays fully lazy.
    """
    e = g.edges.where(F.col("id") == F.lit(int(edge_id)))
    if not hydrate:
        return e
    rows = e.select("src", "dst").limit(1).collect()
    if not rows:
        return hydrate_endpoints(g, e)  # empty result, keep schema
    src, dst = rows[0]["src"], rows[0]["dst"]
    pruned = g.with_nodes(g.nodes.where(F.col("id").isin([src, dst])))
    return hydrate_endpoints(pruned, e)


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
