"""User-facing facade: the reference's 14-method Graph API, Spark-native.

The reference's trait (inferred from its adapter's overrides, SURVEY.md §2;
`/root/reference/src/main/scala/neo4j/Neo4jGraph.scala`) is a single-object
CRUD/traversal API. This facade keeps those ergonomics — a reference user
can switch method-for-method — while every call delegates to the batch-first
operators, so the single-object form is just a one-row batch and large-batch
forms stay available (``*_batch`` / the operators module) for real
pipelines.

Mutation model: copy-on-write — the facade holds the CURRENT snapshot and
swaps it on each mutation (the reference mutates Neo4j in place; here the
graph value is immutable and the handle advances, which is also what makes
``history``/``save`` trivially consistent).

Id allocation: ``add_node``/``add_edge`` auto-assign ``max(id)+1`` when no
id is given — a driver-side max() action, fine for interactive use;
batch ingest should bring its own ids (deterministic, shuffle-free —
see sources/tpch.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from akka_graph_db_spark.model import PropertyGraph
from akka_graph_db_spark.operators import analytics, crud, scan, traverse


class GraphDB:
    """A handle over an evolving PropertyGraph snapshot."""

    def __init__(self, graph: PropertyGraph):
        self.graph = graph

    # -- construction -------------------------------------------------------

    @classmethod
    def empty(cls, spark: SparkSession) -> "GraphDB":
        return cls(
            PropertyGraph(
                nodes=spark.createDataFrame(
                    [], "id bigint, label string, props map<string,string>"
                ),
                edges=spark.createDataFrame(
                    [],
                    "id bigint, label string, src bigint, dst bigint,"
                    " props map<string,string>",
                ),
            )
        )

    @classmethod
    def from_tpch(cls, spark: SparkSession, sf_dir: str) -> "GraphDB":
        from akka_graph_db_spark.sources.tpch import graph_from_tpch

        return cls(graph_from_tpch(spark, sf_dir))

    @classmethod
    def load(cls, spark: SparkSession, root: str, version=None) -> "GraphDB":
        from akka_graph_db_spark import store

        return cls(store.load_snapshot(spark, root, version))

    def save(self, root: str, version=None) -> int:
        from akka_graph_db_spark import store

        return store.save_snapshot(self.graph, root, version)

    # -- id allocation ------------------------------------------------------

    def _next_id(self, df: DataFrame) -> int:
        row = df.agg(F.max("id").alias("m")).collect()[0]
        return (row["m"] or 0) + 1

    # -- mutations (reference §2.1) -----------------------------------------

    def add_node(
        self, label: str, data: Mapping | None = None, node_id: int | None = None
    ) -> int:
        """addNode (Neo4jGraph.scala:156-176). Returns the node id."""
        nid = self._next_id(self.graph.nodes) if node_id is None else node_id
        self.graph = crud.add_nodes(self.graph, [(nid, label, data or {})])
        return nid

    def add_edge(
        self,
        label: str,
        src: int,
        dst: int,
        data: Mapping | None = None,
        edge_id: int | None = None,
    ) -> int:
        """addEdge with endpoint validation (Neo4jGraph.scala:178-210)."""
        eid = self._next_id(self.graph.edges) if edge_id is None else edge_id
        self.graph = crud.add_edges(
            self.graph, [(eid, label, src, dst, data or {})]
        )
        return eid

    def update_node(self, node_id: int, changes: Mapping) -> None:
        """updateNode: merge; None value deletes the key (:442-467)."""
        self.graph = crud.update_nodes(self.graph, {node_id: changes})

    def update_edge(self, edge_id: int, changes: Mapping) -> None:
        """updateEdge (:469-490)."""
        self.graph = crud.update_edges(self.graph, {edge_id: changes})

    def remove_node(self, node_id: int) -> None:
        """removeNode — CASCADES to incident edges (:406-413)."""
        self.graph = crud.remove_nodes_by_id(self.graph, [node_id])

    def remove_nodes(
        self, label: str | None = None, data: Mapping | None = None
    ) -> None:
        """removeNodes by predicate; label=None matches ALL labels (:415-431)."""
        self.graph = crud.remove_nodes(self.graph, label, data)

    def remove_edge(self, edge_id: int) -> None:
        """removeEdge (:433-440)."""
        self.graph = crud.remove_edges_by_id(self.graph, [edge_id])

    # -- batch mutation passthrough -----------------------------------------

    def add_nodes_batch(self, nodes) -> None:
        self.graph = crud.add_nodes(self.graph, nodes)

    def add_edges_batch(self, edges, validate_endpoints: bool = True) -> None:
        self.graph = crud.add_edges(self.graph, edges, validate_endpoints)

    def update_nodes_batch(self, changes) -> None:
        self.graph = crud.update_nodes(self.graph, changes)

    # -- lookups & scans (reference §2.2-2.3) -------------------------------

    def get_node(self, node_id: int):
        """getNode → Row | None (:212-233)."""
        rows = scan.get_node(self.graph, node_id).collect()
        return rows[0] if rows else None

    def get_edge(self, edge_id: int, hydrate: bool = True):
        """getEdge, endpoints hydrated → Row | None (:259-293)."""
        rows = scan.get_edge(self.graph, edge_id, hydrate).collect()
        return rows[0] if rows else None

    def get_nodes(
        self, label: str | None = None, data: Mapping | None = None
    ) -> DataFrame:
        """getNodes → DataFrame (lazy; the reference's Iterator) (:235-257)."""
        return scan.get_nodes(self.graph, label, data)

    def get_edges(
        self,
        label: str | None = None,
        data: Mapping | None = None,
        hydrate: bool = False,
    ) -> DataFrame:
        """getEdges — property filter APPLIED (canonical) (:295-332)."""
        return scan.get_edges(self.graph, label, data, hydrate)

    # -- traversal (reference §2.4) -----------------------------------------

    def get_egress_edges(
        self,
        node_ids,
        edge_label: str | None = None,
        edge_data: Mapping | None = None,
    ) -> DataFrame:
        """getEgressEdges, frontier-batch (:334-368)."""
        if isinstance(node_ids, int):
            node_ids = [node_ids]
        return traverse.egress_edges(self.graph, node_ids, edge_label, edge_data)

    def get_ingress_edges(
        self,
        node_ids,
        edge_label: str | None = None,
        edge_data: Mapping | None = None,
    ) -> DataFrame:
        """getIngressEdges (:370-404)."""
        if isinstance(node_ids, int):
            node_ids = [node_ids]
        return traverse.ingress_edges(self.graph, node_ids, edge_label, edge_data)

    def paths_to(
        self,
        start_id: int,
        end_id: int,
        node_labels: Sequence[str] = (),
        edge_labels: Sequence[str] = (),
        max_depth: int = 6,
        directed: bool = False,
    ) -> DataFrame:
        """pathsTo — bounded, vertex-unique variant of the reference's
        unbounded undirected enumeration (:492-520)."""
        return traverse.paths_to(
            self.graph, start_id, end_id, node_labels, edge_labels,
            max_depth, directed,
        )

    # -- analytics (§2.8 extension surface) ---------------------------------

    def degrees(self, edge_labels=None) -> DataFrame:
        return analytics.degrees(self.graph, edge_labels)

    def connected_components(self, edge_labels=None, max_iter=50) -> DataFrame:
        return analytics.connected_components(self.graph, edge_labels, max_iter)

    def pagerank(
        self, edge_labels=None, damping=0.85, n_iter=10, weight=None
    ) -> DataFrame:
        return analytics.pagerank(
            self.graph, edge_labels, damping, n_iter, weight
        )

    def landmark_distances(
        self, landmarks=8, max_depth=4, edge_labels=None
    ) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.landmark_hop_distances(pairs, landmarks, max_depth)

    def betweenness(
        self, landmarks=8, max_depth=3, edge_labels=None
    ) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.betweenness_landmarks(pairs, landmarks, max_depth)

    def match_path(self, edge_labels, directed: bool = True) -> DataFrame:
        return analytics.match_path(self.graph, edge_labels, directed)

    def triangle_count(self, edge_labels=None) -> int:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.triangle_count(pairs).collect()[0]["n_triangles"]

    def hits(self, edge_labels=None, n_iter=8) -> DataFrame:
        return analytics.hits(self.graph, edge_labels, n_iter)

    def personalized_pagerank(
        self, source_ids, edge_labels=None, damping=0.85, n_iter=10
    ) -> DataFrame:
        return analytics.personalized_pagerank(
            self.graph, source_ids, edge_labels, damping, n_iter
        )

    def shortest_paths(
        self, source_ids, weight=None, edge_labels=None,
        directed=True, max_hops=10,
    ) -> DataFrame:
        return analytics.shortest_paths(
            self.graph, source_ids, weight, edge_labels, directed, max_hops
        )

    def khop_neighbors(self, k, edge_labels=None, directed=True) -> DataFrame:
        return analytics.khop_neighbors(self.graph, k, edge_labels, directed)

    def label_propagation(self, edge_labels=None, n_iter=4) -> DataFrame:
        return analytics.label_propagation_communities(
            self.graph, edge_labels, n_iter
        )

    def kcore(self, k, edge_labels=None, max_iter=30) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.kcore(pairs, k, max_iter)

    def coreness(self, edge_labels=None, max_iter=30) -> DataFrame:
        """Full core decomposition: (id, coreness) for every vertex with
        an edge — coreness(v) >= k iff v survives :meth:`kcore` at k."""
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.coreness(pairs, max_iter)

    def ktruss(self, k, edge_labels=None, max_iter=30) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.ktruss(pairs, k, max_iter)

    def modularity(self, assignment, edge_labels=None) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.community_modularity(pairs, assignment)

    def link_prediction(
        self, top_k=50, min_common=2, edge_labels=None, max_degree=None
    ) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.link_prediction_jaccard(
            pairs, top_k, min_common, max_degree=max_degree
        )

    def assortativity(self, edge_labels=None) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.degree_assortativity(pairs)

    def random_walks(
        self, n_seeds=64, n_steps=4, edge_labels=None, salt="w"
    ) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.random_walks(pairs, n_seeds, n_steps, salt)

    def walk_skipgrams(
        self,
        n_seeds=64,
        n_steps=4,
        window=2,
        edge_labels=None,
        salt="w",
    ) -> DataFrame:
        walks = self.random_walks(n_seeds, n_steps, edge_labels, salt)
        return analytics.walk_skipgram_pairs(walks, n_steps, window)

    def strongly_connected_components(
        self, edge_labels=None, max_doublings=6
    ) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.strongly_connected_components(
            pairs, max_doublings
        )

    def degree_histogram(self, edge_labels=None) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        deg = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        return (
            deg.select(
                (F.length(F.bin("deg")) - 1)
                .cast("int")
                .alias("log2_bucket")
            )
            .groupBy("log2_bucket")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .orderBy("log2_bucket")
        )

    def maximal_independent_set(
        self, edge_labels=None, max_rounds=12, salt="mis"
    ) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        verts = self.graph.nodes.select("id")
        return analytics.maximal_independent_set(
            pairs, verts, max_rounds, salt
        )

    def transitive_closure(
        self, edge_labels=None, max_doublings=6
    ) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.transitive_closure(pairs, max_doublings)

    def node2vec_walks(
        self,
        n_seeds=64,
        n_steps=4,
        edge_labels=None,
        w_return=2,
        w_common=2,
        w_far=1,
        salt="n2v",
    ) -> DataFrame:
        e = self.graph.edges
        if edge_labels:
            e = e.where(F.col("label").isin(list(edge_labels)))
        pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return analytics.node2vec_walks(
            pairs, n_seeds, n_steps, w_return, w_common, w_far, salt
        )

    def triplets(self) -> DataFrame:
        return analytics.triplets(self.graph)

    def aggregate_messages(self, agg, to_dst=None, to_src=None) -> DataFrame:
        return analytics.aggregate_messages(self.graph, agg, to_dst, to_src)

    # -- SQL surface ---------------------------------------------------------

    def sql(
        self,
        query: str,
        nodes_view: str = "graph_nodes",
        edges_view: str = "graph_edges",
    ) -> DataFrame:
        """Run a Spark SQL query over the graph: the nodes/edges frames
        are registered as temp views (replacing any previous
        registration) and the query text goes straight to Catalyst —
        the full SQL surface (joins, windows, CTEs, lateral views) over
        the same snapshot-backed plans the DataFrame API reads. The
        reference has no query language of its own (it GENERATES Cypher
        for Neo4j to parse, Neo4jGraph.scala:156-164; SURVEY.md §3) —
        here the parser/planner is Catalyst itself.
        """
        self.graph.nodes.createOrReplaceTempView(nodes_view)
        self.graph.edges.createOrReplaceTempView(edges_view)
        return self.graph.nodes.sparkSession.sql(query)
