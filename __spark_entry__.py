"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``     — flagship query (SURVEY.md §7 Phase-1 slice) on sf0.001.
``queries()``        — one callable per implemented operator from SURVEY.md §2
                       (+ §2.8 analytics, §2.9 LLM pack).
``oracle_sql()``     — matching DuckDB SQL per query (omitted only for the
                       genuinely non-SQL-expressible ops: PageRank iteration,
                       xxhash64-based fingerprints/LSH internals, streaming).

Conventions keeping the hash compare stable (BASELINE.md correctness gate):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- money/value sums go through DECIMAL(30,2) then cast to DOUBLE → exact,
  order-independent, bit-identical on both engines;
- timestamps are returned as formatted strings (UTC session TZ);
- counts/sizes are cast to BIGINT; ranks to INT, on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from akka_graph_db_spark.functions import dedup, events as ev
from akka_graph_db_spark.functions import multimodal, similarity
from akka_graph_db_spark.functions import search as searchf
from akka_graph_db_spark.functions import text as textf
from akka_graph_db_spark.model import (
    prop_bool,
    prop_double,
    prop_str,
    prop_timestamp,
)
from akka_graph_db_spark.operators import analytics, crud, scan, traverse
from akka_graph_db_spark.session import ensure_query_conf
from akka_graph_db_spark.sources.llm import (
    read_documents,
    read_embeddings,
    read_events,
)
from akka_graph_db_spark.sources.tpch import (
    CONTAINS_BASE,
    CONTAINS_SHIFT,
    CUSTOMER_BASE,
    NATION_BASE,
    PART_BASE,
    ORACLE_EDGES_CTE,
    ORACLE_NODES_CTE,
    ORDER_BASE,
    PLACED_BASE,
    SUPPLIER_BASE,
    REGION_BASE,
    _LINEITEM_ORDER_SQL,
    graph_from_tpch,
)

SF_SMOKE = "/root/testdata/sf0.001"

# Composable CTE header for oracle queries over the derived graph.
_GRAPH_WITH = (
    "WITH "
    + ORACLE_NODES_CTE.strip().rstrip(",")
    + ",\n"
    + ORACLE_EDGES_CTE.strip()
)

# DuckDB fragment identical to functions.text.tokens(): lowercase,
# whitespace-split, empties dropped.
_TOK = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

# HyperANF oracle constants — imported from the OPERATOR so the SQL
# literal lookup and the Spark plan share the same baked integers
# (analytics._hll_lc_milli: lc(e) = round(1000·16·ln(16/e)))
from akka_graph_db_spark.operators.analytics import _hll_lc_milli as _lcf

_HLL_ALPHA_NUM = 673 * 16 * 16 * (1 << 32)
_HLL_LC_CASE = (
    "CASE (16 - occ) "
    + " ".join(
        f"WHEN {e} THEN {v}" for e, v in enumerate(_lcf(16), start=1)
    )
    + " END"
)

# Benford oracle CASE — same baked ppm table as the operator
from akka_graph_db_spark.functions.profile import BENFORD_PPM as _BPPM

_BENFORD_CASE = (
    "CASE bgrid.d "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BPPM.items())
    + " END"
)

_DEC_SUM = "CAST(SUM(CAST({col} AS DECIMAL(30,2))) AS DOUBLE)"


# Ingest-once graph catalog (VERDICT r2 #7): the reference loads the graph
# into Neo4j ONCE and every query hits the store (Neo4jGraph.scala:150-154)
# — re-deriving ids per query was this repo's artifact, not a design goal.
# First access per (session, sf_dir) derives the tpch graph, persists it as
# a label-partitioned parquet snapshot WITH promoted columns, and reloads
# it; later queries scan real parquet with partition pruning on label,
# predicate pushdown on promoted columns, and row-group id skipping —
# exactly the at-scale layout store.py documents. Results are identical to
# the lazy derivation (the correctness gate runs every query through this
# path), and contains-edge ids are materialized once instead of re-windowed
# per query.
_GRAPH_CACHE: dict = {}


def _g(spark: SparkSession, sf_dir: str):
    ensure_query_conf(spark)
    # applicationId is unique per context — id() can be reused after GC,
    # which could hand a recreated session DataFrames bound to a dead one.
    key = (spark.sparkContext.applicationId, sf_dir)
    g = _GRAPH_CACHE.get(key)
    if g is None:
        import atexit
        import os as _os
        import shutil
        import tempfile

        from akka_graph_db_spark import store

        # SPARK_GRAFT_SNAPSHOT_ROOT lets cooperating processes share ONE
        # materialized snapshot (bench.py's per-query subprocess isolation
        # builds it once in the parent; children only pay the parquet
        # read). The owner of the tempdir case cleans up at exit; a shared
        # root is left for its owner.
        shared = _os.environ.get("SPARK_GRAFT_SNAPSHOT_ROOT")
        if shared:
            root = _os.path.join(shared, _os.path.basename(sf_dir.rstrip("/")))
            if not store.list_version_kinds(root, spark):
                store.save_snapshot(
                    graph_from_tpch(spark, sf_dir), root, columns="all"
                )
        else:
            root = tempfile.mkdtemp(prefix="spark_graft_graph_")
            atexit.register(shutil.rmtree, root, ignore_errors=True)
            store.save_snapshot(
                graph_from_tpch(spark, sf_dir), root, columns="all"
            )
        g = store.load_snapshot(spark, root, schema="infer")
        _GRAPH_CACHE[key] = g
    return g


# Shared by the propagation AND two-phase CC queries: components over the
# geography subgraph = the region's node id, recomputed relationally.
_CC_GEO_ORACLE = f"""
    SELECT r_regionkey + {REGION_BASE} AS id,
           r_regionkey + {REGION_BASE} AS component FROM region
    UNION ALL
    SELECT n_nationkey + {NATION_BASE},
           n_regionkey + {REGION_BASE} FROM nation
    UNION ALL
    SELECT c_custkey + {CUSTOMER_BASE}, n_regionkey + {REGION_BASE}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT s_suppkey + 3000000, n_regionkey + {REGION_BASE}
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


def _ts_str(c, fmt: str = "yyyy-MM-dd HH:mm:ss.SSSSSS"):
    return F.date_format(c, fmt)


def _sssp_weighted_oracle(max_hops: int = 4) -> str:
    """q_sssp_weighted's oracle: Bellman-Ford unrolled ``max_hops`` steps
    in DuckDB, mirroring analytics.shortest_paths exactly — dist_k(v) =
    min(dist_{k-1}(v), min_u(dist_{k-1}(u) + w(u,v))) over the
    undirected weighted edge multiset (w = quantity on contains edges,
    1.0 elsewhere). Each candidate distance is the same left-to-right
    double sum along a path in both engines, and all weights are
    integer-valued, so MIN/SUM are exact."""
    ctes = [
        f"""sp_wedges AS MATERIALIZED (
            SELECT * FROM (
              SELECT n_nationkey + {NATION_BASE} AS src,
                     n_regionkey + {REGION_BASE} AS dst,
                     CAST(1.0 AS DOUBLE) AS w FROM nation
              UNION ALL
              SELECT c_custkey + {CUSTOMER_BASE},
                     c_nationkey + {NATION_BASE}, 1.0 FROM customer
              UNION ALL
              SELECT s_suppkey + {SUPPLIER_BASE},
                     s_nationkey + {NATION_BASE}, 1.0 FROM supplier
              UNION ALL
              SELECT o_custkey + {CUSTOMER_BASE},
                     o_orderkey + {ORDER_BASE}, 1.0 FROM orders
              UNION ALL
              SELECT l_orderkey + {ORDER_BASE}, l_partkey + {PART_BASE},
                     CAST(l_quantity AS DOUBLE) FROM lineitem
              UNION ALL
              SELECT l_partkey + {PART_BASE}, l_suppkey + {SUPPLIER_BASE},
                     1.0
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            )
        )""",
        """sp_und AS MATERIALIZED (
            SELECT src, dst, w FROM sp_wedges
            UNION ALL
            SELECT dst, src, w FROM sp_wedges
        )""",
        f"""sp_d0 AS MATERIALIZED (
            SELECT CAST({NATION_BASE + 1} AS BIGINT) AS id,
                   CAST(0.0 AS DOUBLE) AS dist
        )""",
    ]
    for k in range(max_hops):
        ctes.append(f"""sp_d{k + 1} AS MATERIALIZED (
            SELECT id, MIN(dist) AS dist FROM (
              SELECT id, dist FROM sp_d{k}
              UNION ALL
              SELECT e.dst AS id, d.dist + e.w AS dist
              FROM sp_d{k} d JOIN sp_und e ON e.src = d.id
            ) GROUP BY id
        )""")
    return (
        _GRAPH_WITH
        + ",\n"
        + ",\n".join(ctes)
        + f"""
        SELECT n.label,
               COUNT(*) AS n_reached,
               MIN(d.dist) AS min_dist,
               MAX(d.dist) AS max_dist,
               SUM(d.dist) AS sum_dist
        FROM sp_d{max_hops} d JOIN nodes_v n ON d.id = n.id
        GROUP BY n.label
        """
    )


def _lpa_geo_oracle(n_iter: int = 4) -> str:
    """q_label_propagation_geo's oracle: the same synchronous LPA
    supersteps unrolled as DuckDB CTEs over the identical undirected
    deduped geography edge set — most-frequent neighbor community, ties
    to the smallest community id, isolated/unreached nodes keep their
    own. All-integer arithmetic, so the comparison is exact."""
    ctes = [
        f"""lpa_dir AS MATERIALIZED (
            SELECT n_nationkey + {NATION_BASE} AS a,
                   n_regionkey + {REGION_BASE} AS b FROM nation
            UNION ALL
            SELECT c_custkey + {CUSTOMER_BASE},
                   c_nationkey + {NATION_BASE} FROM customer
            UNION ALL
            SELECT s_suppkey + {SUPPLIER_BASE},
                   s_nationkey + {NATION_BASE} FROM supplier
        )""",
        """lpa_und AS MATERIALIZED (
            SELECT DISTINCT a, b FROM (
              SELECT a, b FROM lpa_dir
              UNION ALL
              SELECT b AS a, a AS b FROM lpa_dir
            ) WHERE a <> b
        )""",
        f"""lpa_nodes AS MATERIALIZED (
            SELECT r_regionkey + {REGION_BASE} AS id FROM region
            UNION ALL
            SELECT n_nationkey + {NATION_BASE} FROM nation
            UNION ALL
            SELECT c_custkey + {CUSTOMER_BASE} FROM customer
            UNION ALL
            SELECT s_suppkey + {SUPPLIER_BASE} FROM supplier
        )""",
        "l0 AS MATERIALIZED (SELECT id, id AS community FROM lpa_nodes)",
    ]
    for k in range(n_iter):
        ctes.append(f"""l{k + 1} AS MATERIALIZED (
            SELECT l.id, COALESCE(b.community, l.community) AS community
            FROM l{k} l LEFT JOIN (
              SELECT id, community FROM (
                SELECT id, community,
                       ROW_NUMBER() OVER (PARTITION BY id
                                          ORDER BY c DESC, community) AS rn
                FROM (
                  SELECT e.b AS id, s.community, COUNT(*) AS c
                  FROM lpa_und e JOIN l{k} s ON e.a = s.id
                  GROUP BY e.b, s.community
                )
              ) WHERE rn = 1
            ) b ON l.id = b.id
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, community FROM l{n_iter}"
    )


def _walks_oracle_body() -> str:
    """The random_walks_parts oracle (ranked adjacency + md5-derived
    neighbor choices, step-for-step identical to analytics.random_walks);
    also embedded as a CTE by the walk_skipgrams oracle."""
    return """
            WITH e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
            adj AS (
              SELECT a, b,
                     ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) AS idx
              FROM sym
            ),
            deg AS (SELECT a, COUNT(*) AS deg FROM sym GROUP BY a),
            seeds AS (
              SELECT a AS walk_id, a AS step_0 FROM deg ORDER BY a LIMIT 64
            ),
            s1 AS (
              SELECT walk_id, step_0, adj.b AS step_1
              FROM seeds
              JOIN deg ON deg.a = seeds.step_0
              JOIN adj ON adj.a = seeds.step_0
               AND adj.idx = CAST((md5_number_upper(
                     CAST(walk_id AS VARCHAR) || ':1:w')
                     & 9223372036854775807) AS BIGINT) % deg.deg + 1
            ),
            s2 AS (
              SELECT walk_id, step_0, step_1, adj.b AS step_2
              FROM s1
              JOIN deg ON deg.a = s1.step_1
              JOIN adj ON adj.a = s1.step_1
               AND adj.idx = CAST((md5_number_upper(
                     CAST(walk_id AS VARCHAR) || ':2:w')
                     & 9223372036854775807) AS BIGINT) % deg.deg + 1
            ),
            s3 AS (
              SELECT walk_id, step_0, step_1, step_2, adj.b AS step_3
              FROM s2
              JOIN deg ON deg.a = s2.step_2
              JOIN adj ON adj.a = s2.step_2
               AND adj.idx = CAST((md5_number_upper(
                     CAST(walk_id AS VARCHAR) || ':3:w')
                     & 9223372036854775807) AS BIGINT) % deg.deg + 1
            )
            SELECT walk_id, step_0, step_1, step_2, step_3,
                   adj.b AS step_4
            FROM s3
            JOIN deg ON deg.a = s3.step_3
            JOIN adj ON adj.a = s3.step_3
             AND adj.idx = CAST((md5_number_upper(
                   CAST(walk_id AS VARCHAR) || ':4:w')
                   & 9223372036854775807) AS BIGINT) % deg.deg + 1
        """


def _ktruss_oracle(k: int = 3, rounds: int = 6, min_orders: int = 2) -> str:
    """q_ktruss_parts's oracle: the recurrent co-order graph, then
    ``rounds`` unrolled peeling steps — each round recomputes every
    edge's common-neighbor (triangle) count over the CURRENT edge set
    and keeps support >= k-2. Monotone, so rounds past the fixpoint are
    no-ops; the final round's support is computed over the fixpoint set,
    exactly what the engine returns."""
    ctes = [
        f"""kt0 AS MATERIALIZED (
            SELECT a, b FROM (
              SELECT x.l_partkey AS a, y.l_partkey AS b,
                     COUNT(DISTINCT x.l_orderkey) AS w
              FROM lineitem x JOIN lineitem y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey < y.l_partkey
              GROUP BY 1, 2
            ) WHERE w >= {min_orders}
        )"""
    ]
    for r in range(rounds):
        ctes.append(f"""kts{r} AS MATERIALIZED (
            SELECT a, b FROM kt{r}
            UNION ALL
            SELECT b AS a, a AS b FROM kt{r}
        )""")
        ctes.append(f"""kt{r + 1} AS MATERIALIZED (
            SELECT e.a, e.b, COUNT(*) AS support
            FROM kt{r} e
            JOIN kts{r} x ON x.a = e.a
            JOIN kts{r} y ON y.a = e.b AND y.b = x.b
            GROUP BY e.a, e.b
            HAVING COUNT(*) >= {k - 2}
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT a, b, support FROM kt{rounds}"
    )


def _node2vec_oracle(
    n_steps: int = 4,
    n_seeds: int = 64,
    w_return: int = 2,
    w_common: int = 2,
    w_far: int = 1,
    salt: str = "n2v",
) -> str:
    """q_node2vec_parts's oracle: the biased walks unrolled — per step,
    classify cur's adjacency against prev's adjacency (return / common
    / far integer weights), pick via md5 draw mod total over the
    cumulative-weight ranking, with the uniform dead-end fallback when
    every weight is zero. Exact integer arithmetic throughout."""
    draw = (
        "CAST(md5_number_upper(CAST(s.walk_id AS VARCHAR) || ':{t}:"
        + salt
        + "') & 9223372036854775807 AS BIGINT)"
    )
    ctes = [
        """n2v_e AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        )""",
        """n2v_sym AS MATERIALIZED (
            SELECT a, b FROM n2v_e UNION ALL SELECT b, a FROM n2v_e
        )""",
        """n2v_adj AS MATERIALIZED (
            SELECT a, b,
                   ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) AS idx
            FROM n2v_sym
        )""",
        "n2v_deg AS (SELECT a, COUNT(*) AS deg FROM n2v_sym GROUP BY a)",
        f"""n2v_s1 AS MATERIALIZED (
            SELECT s.walk_id, s.step_0, adj.b AS step_1
            FROM (SELECT a AS walk_id, a AS step_0 FROM n2v_deg
                  ORDER BY a LIMIT {n_seeds}) s
            JOIN n2v_deg d ON d.a = s.step_0
            JOIN n2v_adj adj ON adj.a = s.step_0
             AND adj.idx = {draw.format(t=1)} % d.deg + 1
        )""",
    ]
    for t in range(2, n_steps + 1):
        prior = ", ".join(
            ["s.walk_id"] + [f"s.step_{i}" for i in range(t)]
        )
        keep = ", ".join(
            ["walk_id"] + [f"step_{i}" for i in range(t)]
        )
        ctes.append(f"""n2v_c{t} AS MATERIALIZED (
            SELECT {prior}, a.b AS nbr,
                   CASE WHEN a.b = s.step_{t - 2} THEN {w_return}
                        WHEN EXISTS (SELECT 1 FROM n2v_sym p
                                     WHERE p.a = s.step_{t - 2}
                                       AND p.b = a.b)
                          THEN {w_common}
                        ELSE {w_far} END AS w,
                   {draw.format(t=t)} AS dr
            FROM n2v_s{t - 1} s
            JOIN n2v_sym a ON a.a = s.step_{t - 1}
        )""")
        ctes.append(f"""n2v_s{t} AS MATERIALIZED (
            SELECT {keep}, nbr AS step_{t} FROM (
              SELECT *,
                     CASE WHEN tot = 0 THEN 1 ELSE w END AS we,
                     CASE WHEN tot = 0 THEN rn ELSE cum END AS cume,
                     CASE WHEN tot = 0 THEN n ELSE tot END AS tote
              FROM (
                SELECT *,
                       SUM(w) OVER (PARTITION BY walk_id
                                    ORDER BY nbr) AS cum,
                       SUM(w) OVER (PARTITION BY walk_id) AS tot,
                       ROW_NUMBER() OVER (PARTITION BY walk_id
                                          ORDER BY nbr) AS rn,
                       COUNT(*) OVER (PARTITION BY walk_id) AS n
                FROM n2v_c{t}
              )
            )
            WHERE cume >= dr % tote + 1 AND cume - we < dr % tote + 1
        )""")
    cols = ", ".join(
        ["walk_id"] + [f"step_{i}" for i in range(n_steps + 1)]
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\n            SELECT {cols} FROM n2v_s{n_steps}"
    )


def _mis_geo_oracle(rounds: int = 3) -> str:
    """q_mis_geo's oracle: Luby rounds unrolled — per round, winner =
    vertex whose padded (md5 priority, id) string key is strictly below
    every surviving neighbor's MIN key; winners' closed neighborhoods
    leave. Vertices isolated at the START of a round enter the MIS
    (matches the engine's isolated rule); rounds past the fixpoint
    isolate-absorb everything and then no-op."""
    key = (
        "printf('%019d:%019d', CAST(md5_number_upper(CAST({c} AS VARCHAR)"
        " || ':{r}:mis') & 9223372036854775807 AS BIGINT),"
        " CAST({c} AS BIGINT))"
    )
    ctes = [
        f"""mis_dir AS MATERIALIZED (
            SELECT n_nationkey + {NATION_BASE} AS a,
                   n_regionkey + {REGION_BASE} AS b FROM nation
            UNION ALL
            SELECT c_custkey + {CUSTOMER_BASE},
                   c_nationkey + {NATION_BASE} FROM customer
            UNION ALL
            SELECT s_suppkey + {SUPPLIER_BASE},
                   s_nationkey + {NATION_BASE} FROM supplier
        )""",
        """mis_s0 AS MATERIALIZED (
            SELECT DISTINCT a, b FROM (
              SELECT a, b FROM mis_dir
              UNION ALL SELECT b AS a, a AS b FROM mis_dir
            ) WHERE a <> b
        )""",
        f"""mis_v0 AS MATERIALIZED (
            SELECT r_regionkey + {REGION_BASE} AS id FROM region
            UNION ALL
            SELECT n_nationkey + {NATION_BASE} FROM nation
            UNION ALL
            SELECT c_custkey + {CUSTOMER_BASE} FROM customer
            UNION ALL
            SELECT s_suppkey + {SUPPLIER_BASE} FROM supplier
        )""",
    ]
    for r in range(rounds):
        ka = key.format(c="e.a", r=r)
        kb = key.format(c="e.b", r=r)
        kw = key.format(c="nm.id", r=r)
        ctes.append(f"""mis_iso{r} AS MATERIALIZED (
            SELECT id FROM mis_v{r}
            WHERE id NOT IN (SELECT a FROM mis_s{r})
        )""")
        ctes.append(f"""mis_nm{r} AS MATERIALIZED (
            SELECT e.a AS id, MIN({kb}) AS nmin
            FROM mis_s{r} e GROUP BY e.a
        )""")
        ctes.append(f"""mis_w{r} AS MATERIALIZED (
            SELECT nm.id FROM mis_nm{r} nm
            WHERE {kw} < nm.nmin
        )""")
        ctes.append(f"""mis_cl{r} AS MATERIALIZED (
            SELECT id FROM mis_w{r}
            UNION
            SELECT e.b FROM mis_s{r} e
            JOIN mis_w{r} w ON e.a = w.id
        )""")
        ctes.append(f"""mis_v{r + 1} AS MATERIALIZED (
            SELECT id FROM mis_v{r}
            WHERE id NOT IN (SELECT id FROM mis_cl{r})
              AND id NOT IN (SELECT id FROM mis_iso{r})
        )""")
        ctes.append(f"""mis_s{r + 1} AS MATERIALIZED (
            SELECT a, b FROM mis_s{r}
            WHERE a NOT IN (SELECT id FROM mis_cl{r})
              AND b NOT IN (SELECT id FROM mis_cl{r})
        )""")
    union = "\n            UNION ".join(
        [f"SELECT id FROM mis_iso{r}" for r in range(rounds)]
        + [f"SELECT id FROM mis_w{r}" for r in range(rounds)]
        + [f"SELECT id FROM mis_v{rounds}"]
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\n            SELECT DISTINCT id FROM ({union})"
    )


def _coloring_geo_oracle(rounds: int = 4) -> str:
    """q_coloring_geo's oracle: degree-major Jones-Plassmann unrolled —
    per round, winner = uncolored vertex whose padded (degree DESC, md5,
    id) key is strictly below every UNCOLORED neighbor's MIN key (or has
    none); winner's color = smallest positive integer absent from its
    already-colored neighborhood (candidates bounded by round index).
    Rounds past the fixpoint no-op (no uncolored vertices remain)."""
    key = (
        "printf('%013d:%019d:%019d', 1000000000000 - {d},"
        " CAST(md5_number_upper(CAST({c} AS VARCHAR)"
        " || ':{r}:color') & 9223372036854775807 AS BIGINT),"
        " CAST({c} AS BIGINT))"
    )
    ctes = [
        f"""clr_dir AS MATERIALIZED (
            SELECT n_nationkey + {NATION_BASE} AS a,
                   n_regionkey + {REGION_BASE} AS b FROM nation
            UNION ALL
            SELECT c_custkey + {CUSTOMER_BASE},
                   c_nationkey + {NATION_BASE} FROM customer
            UNION ALL
            SELECT s_suppkey + {SUPPLIER_BASE},
                   s_nationkey + {NATION_BASE} FROM supplier
        )""",
        """clr_sym AS MATERIALIZED (
            SELECT DISTINCT a, b FROM (
              SELECT a, b FROM clr_dir
              UNION ALL SELECT b AS a, a AS b FROM clr_dir
            ) WHERE a <> b
        )""",
        f"""clr_vd AS MATERIALIZED (
            SELECT v.id, COALESCE(d.deg, 0) AS deg FROM (
              SELECT r_regionkey + {REGION_BASE} AS id FROM region
              UNION ALL
              SELECT n_nationkey + {NATION_BASE} FROM nation
              UNION ALL
              SELECT c_custkey + {CUSTOMER_BASE} FROM customer
              UNION ALL
              SELECT s_suppkey + {SUPPLIER_BASE} FROM supplier
            ) v LEFT JOIN (
              SELECT a AS id, COUNT(*) AS deg FROM clr_sym GROUP BY 1
            ) d ON d.id = v.id
        )""",
        """clr_c0 AS MATERIALIZED (
            SELECT id, 1 AS color FROM clr_vd WHERE FALSE
        )""",
        """clr_u0 AS MATERIALIZED (SELECT id, deg FROM clr_vd)""",
    ]
    for r in range(rounds):
        ku = key.format(c="u.id", d="u.deg", r=r)
        kb = key.format(c="e.b", d="bd.deg", r=r)
        ctes.append(f"""clr_s{r} AS MATERIALIZED (
            SELECT e.a, e.b FROM clr_sym e
            WHERE e.a IN (SELECT id FROM clr_u{r})
              AND e.b IN (SELECT id FROM clr_u{r})
        )""")
        ctes.append(f"""clr_nm{r} AS MATERIALIZED (
            SELECT e.a AS id, MIN({kb}) AS nmin
            FROM clr_s{r} e JOIN clr_vd bd ON bd.id = e.b
            GROUP BY e.a
        )""")
        ctes.append(f"""clr_w{r} AS MATERIALIZED (
            SELECT u.id FROM clr_u{r} u
            LEFT JOIN clr_nm{r} nm ON nm.id = u.id
            WHERE nm.nmin IS NULL OR {ku} < nm.nmin
        )""")
        ctes.append(f"""clr_used{r} AS MATERIALIZED (
            SELECT DISTINCT w.id, c.color
            FROM clr_w{r} w
            JOIN clr_sym e ON e.a = w.id
            JOIN clr_c{r} c ON c.id = e.b
        )""")
        ctes.append(f"""clr_mex{r} AS MATERIALIZED (
            SELECT w.id, MIN(cand) AS color FROM clr_w{r} w
            CROSS JOIN range(1, {r + 3}) t(cand)
            LEFT JOIN clr_used{r} u
              ON u.id = w.id AND u.color = cand
            WHERE u.id IS NULL
            GROUP BY w.id
        )""")
        ctes.append(f"""clr_c{r + 1} AS MATERIALIZED (
            SELECT id, color FROM clr_c{r}
            UNION ALL SELECT id, color FROM clr_mex{r}
        )""")
        ctes.append(f"""clr_u{r + 1} AS MATERIALIZED (
            SELECT id, deg FROM clr_u{r}
            WHERE id NOT IN (SELECT id FROM clr_w{r})
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\n            SELECT id, CAST(color AS INTEGER) AS color"
        f" FROM clr_c{rounds} ORDER BY id"
    )


def _modularity_geo_oracle(n_iter: int = 4) -> str:
    """q_modularity_geo's oracle: the LPA supersteps of
    ``_lpa_geo_oracle`` (same CTE text through ``l{n}``), then Newman
    modularity over the identical symmetric edge set in exact HUGEINT
    (== the engine's DECIMAL(38,0)) — d_c is just the per-community arc
    count, A·W − Σd_c² over A² with one double division + round(6)."""
    lpa = _lpa_geo_oracle(n_iter)
    head = lpa[: lpa.rindex("\nSELECT ")]  # keep the WITH ... l{n} CTEs
    return (
        head
        + f""",
        mod_t AS MATERIALIZED (
          SELECT e.a, la.community AS ca, lb.community AS cb
          FROM lpa_und e
          JOIN l{n_iter} la ON e.a = la.id
          JOIN l{n_iter} lb ON e.b = lb.id
        ),
        mod_arcs AS (
          SELECT CAST(COUNT(*) AS HUGEINT) AS arcs,
                 CAST(SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END)
                      AS HUGEINT) AS within
          FROM mod_t
        ),
        mod_d AS (
          SELECT SUM(dc * dc) AS sum_dc2, COUNT(*) AS n_comm
          FROM (SELECT ca, CAST(COUNT(*) AS HUGEINT) AS dc
                FROM mod_t GROUP BY ca)
        )
        SELECT CAST(arcs / 2 AS BIGINT) AS n_edges,
               CAST(n_comm AS BIGINT) AS n_communities,
               ROUND(CAST(arcs * within - sum_dc2 AS DOUBLE)
                     / CAST(arcs * arcs AS DOUBLE), 6) AS modularity
        FROM mod_arcs, mod_d
    """
    )


def _pagerank_oracle(n_iter: int = 10, damping: float = 0.85) -> str:
    """Fixed-iteration PageRank as unrolled DuckDB CTEs (VERDICT r2 #2).

    Mirrors `analytics.pagerank` exactly: initial rank 1.0, per-iteration
    dangling-mass redistribution, rank' = (1-d) + d*(recv + dang/n).
    Float-literal constants are emitted via repr() so DuckDB parses the
    SAME doubles Python handed Spark (1.0-0.85 != 0.15 in binary).
    Top-20 is selected on FULL-precision rank (then rounded for output),
    matching the Spark side's orderBy-then-round.
    """
    # AS MATERIALIZED is load-bearing: each r{k} is referenced twice
    # (contribs + dangling), so plain CTEs would inline EXPONENTIALLY —
    # 2^10 copies of the parquet-union scan blows the fd limit.
    base = 1.0 - damping
    ctes = [
        """pr_edges AS MATERIALIZED (SELECT src, dst FROM edges_v)""",
        """pr_nodes AS MATERIALIZED (
            SELECT n.id, COALESCE(od.c, 0) AS out_degree
            FROM nodes_v n
            LEFT JOIN (SELECT src, COUNT(*) AS c FROM pr_edges GROUP BY 1) od
              ON n.id = od.src
        )""",
        "pr_n AS MATERIALIZED (SELECT COUNT(*) AS n FROM pr_nodes)",
        """r0 AS MATERIALIZED (
            SELECT id, out_degree, CAST(1.0 AS DOUBLE) AS rank
            FROM pr_nodes)""",
    ]
    for k in range(n_iter):
        ctes.append(f"""r{k + 1} AS MATERIALIZED (
            SELECT n.id, n.out_degree,
                   {base!r} + {damping!r} *
                     (COALESCE(c.recv, 0) + d.dang / pr_n.n) AS rank
            FROM pr_nodes n
            CROSS JOIN pr_n
            CROSS JOIN (SELECT COALESCE(SUM(rank), 0) AS dang
                        FROM r{k} WHERE out_degree = 0) d
            LEFT JOIN (
                SELECT e.dst AS id, SUM(r.rank / r.out_degree) AS recv
                FROM pr_edges e JOIN r{k} r ON e.src = r.id
                WHERE r.out_degree > 0
                GROUP BY e.dst
            ) c ON n.id = c.id
        )""")
    return (
        _GRAPH_WITH
        + ",\n"
        + ",\n".join(ctes)
        + f"""
        SELECT id, ROUND(rank, 6) AS rank FROM (
            SELECT id, rank FROM r{n_iter}
            ORDER BY rank DESC, id LIMIT 20
        )
        """
    )


def _weighted_pagerank_oracle(n_iter: int = 6, damping: float = 0.85) -> str:
    """q_pagerank_weighted's oracle: the _pagerank_oracle chain with the
    surfer following out-edges proportionally to weight — w = quantity on
    contains edges, 1.0 elsewhere (the sp_wedges convention, directed).
    recv = SUM(rank·w/Σ_out w); a node with zero total out-weight is
    dangling. Float constants via repr(); same left-assoc expression
    order as the Spark side."""
    base = 1.0 - damping
    ctes = [
        f"""wpr_edges AS MATERIALIZED (
            SELECT n_nationkey + {NATION_BASE} AS src,
                   n_regionkey + {REGION_BASE} AS dst,
                   CAST(1.0 AS DOUBLE) AS w FROM nation
            UNION ALL
            SELECT c_custkey + {CUSTOMER_BASE},
                   c_nationkey + {NATION_BASE}, 1.0 FROM customer
            UNION ALL
            SELECT s_suppkey + {SUPPLIER_BASE},
                   s_nationkey + {NATION_BASE}, 1.0 FROM supplier
            UNION ALL
            SELECT o_custkey + {CUSTOMER_BASE},
                   o_orderkey + {ORDER_BASE}, 1.0 FROM orders
            UNION ALL
            SELECT l_orderkey + {ORDER_BASE}, l_partkey + {PART_BASE},
                   CAST(l_quantity AS DOUBLE) FROM lineitem
            UNION ALL
            SELECT l_partkey + {PART_BASE}, l_suppkey + {SUPPLIER_BASE},
                   1.0
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        )""",
        """wpr_nodes AS MATERIALIZED (
            SELECT n.id, COALESCE(ow.s, 0) AS out_w
            FROM nodes_v n
            LEFT JOIN (SELECT src, SUM(w) AS s FROM wpr_edges GROUP BY 1)
              ow ON n.id = ow.src
        )""",
        "wpr_n AS MATERIALIZED (SELECT COUNT(*) AS n FROM wpr_nodes)",
        """wr0 AS MATERIALIZED (
            SELECT id, out_w, CAST(1.0 AS DOUBLE) AS rank
            FROM wpr_nodes)""",
    ]
    for k in range(n_iter):
        ctes.append(f"""wr{k + 1} AS MATERIALIZED (
            SELECT n.id, n.out_w,
                   {base!r} + {damping!r} *
                     (COALESCE(c.recv, 0) + d.dang / wpr_n.n) AS rank
            FROM wpr_nodes n
            CROSS JOIN wpr_n
            CROSS JOIN (SELECT COALESCE(SUM(rank), 0) AS dang
                        FROM wr{k} WHERE out_w = 0) d
            LEFT JOIN (
                SELECT e.dst AS id, SUM(r.rank * e.w / r.out_w) AS recv
                FROM wpr_edges e JOIN wr{k} r ON e.src = r.id
                WHERE r.out_w > 0
                GROUP BY e.dst
            ) c ON n.id = c.id
        )""")
    return (
        _GRAPH_WITH
        + ",\n"
        + ",\n".join(ctes)
        + f"""
        SELECT id, ROUND(rank, 6) AS rank FROM (
            SELECT id, rank FROM wr{n_iter}
            ORDER BY rank DESC, id LIMIT 20
        )
        """
    )


def _textrank_oracle(n_iter: int = 6, damping: float = 0.85) -> str:
    """q_textrank_keywords' oracle: weighted PageRank over the word
    co-occurrence graph, unrolled as fixed-iteration CTEs — the
    _pagerank_oracle discipline (AS MATERIALIZED against exponential
    inlining, float constants via repr(), top-k on full precision,
    round last). Every node has out-weight > 0 (nodes are words WITH a
    co-occurrence pair), so there is no dangling term on either side.
    """
    base = 1.0 - damping
    ctes = [
        f"""tr_tok AS MATERIALIZED (
            SELECT doc_id, p - 1 AS pos, toks[p] AS w FROM (
              SELECT doc_id, toks,
                     unnest(range(1, len(toks) + 1)) AS p
              FROM (SELECT doc_id, {_TOK} AS toks FROM documents)
            )
        )""",
        """tr_pairs AS MATERIALIZED (
            SELECT least(l.w, r.w) AS a, greatest(l.w, r.w) AS b,
                   CAST(COUNT(*) AS DOUBLE) AS w
            FROM tr_tok l JOIN tr_tok r
              ON r.doc_id = l.doc_id AND r.pos = l.pos + 1
            WHERE l.w <> r.w GROUP BY 1, 2
        )""",
        """tr_sym AS MATERIALIZED (
            SELECT a, b, w FROM tr_pairs
            UNION ALL SELECT b AS a, a AS b, w FROM tr_pairs
        )""",
        """tr_out AS MATERIALIZED (
            SELECT a, SUM(w) AS out_w FROM tr_sym GROUP BY a
        )""",
        """tr0 AS MATERIALIZED (
            SELECT a AS word, CAST(1.0 AS DOUBLE) AS rank
            FROM tr_out)""",
    ]
    for k in range(n_iter):
        ctes.append(f"""tr{k + 1} AS MATERIALIZED (
            SELECT o.a AS word,
                   {base!r} + {damping!r} * COALESCE(c.recv, 0)
                     AS rank
            FROM tr_out o
            LEFT JOIN (
                SELECT e.b AS word,
                       SUM(r.rank * e.w / o2.out_w) AS recv
                FROM tr_sym e
                JOIN tr{k} r ON r.word = e.a
                JOIN tr_out o2 ON o2.a = e.a
                GROUP BY e.b
            ) c ON c.word = o.a
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT word, ROUND(rank, 6) AS rank FROM (
            SELECT word, rank FROM tr{n_iter}
            ORDER BY rank DESC, word LIMIT 20
        )
        """
    )


def _dag_layers_oracle(n_iter: int = 8) -> str:
    """q_dag_layers_graph's oracle: the longest-path max-relaxation
    unrolled ``n_iter`` rounds over edges_v (monotone — rounds past the
    DAG depth are no-ops, so a fixed unroll >= depth is exact; the
    tpch property graph's depth is 5: customer -> order -> part ->
    supplier -> nation -> region)."""
    ctes = [
        """dl0 AS MATERIALIZED (
            SELECT id, CAST(0 AS BIGINT) AS layer FROM nodes_v)""",
    ]
    for k in range(n_iter):
        ctes.append(f"""dl{k + 1} AS MATERIALIZED (
            SELECT n.id,
                   CAST(COALESCE(r.recv, 0) AS BIGINT) AS layer
            FROM nodes_v n
            LEFT JOIN (
                SELECT e.dst AS id, MAX(l.layer) + 1 AS recv
                FROM edges_v e JOIN dl{k} l ON l.id = e.src
                GROUP BY e.dst
            ) r ON r.id = n.id
        )""")
    return (
        _GRAPH_WITH
        + ",\n"
        + ",\n".join(ctes)
        + f"""
        SELECT v.label, l.layer, COUNT(*) AS n_nodes
        FROM nodes_v v JOIN dl{n_iter} l ON l.id = v.id
        GROUP BY v.label, l.layer
        ORDER BY v.label, l.layer
        """
    )


def _slpa_oracle(rounds: int = 3) -> str:
    """q_seeded_labels_parts' oracle: the clamped-seed label
    propagation unrolled round by round — integer votes, ROW_NUMBER
    argmax (count desc, label), seeds coalesce first, previous label
    last; seed set = parts with p_partkey % 10 = 0 labeled p_brand."""
    ctes = [
        """sl_pairs AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        )""",
        """sl_adj AS MATERIALIZED (
            SELECT a, b FROM sl_pairs
            UNION ALL SELECT b AS a, a AS b FROM sl_pairs
        )""",
        """sl_nodes AS MATERIALIZED (
            SELECT DISTINCT a AS id FROM sl_adj
        )""",
        """sl_seeds AS MATERIALIZED (
            SELECT p_partkey AS id, p_brand AS label
            FROM part WHERE p_partkey % 10 = 0
        )""",
        """sl0 AS MATERIALIZED (
            SELECT n.id, sd.label
            FROM sl_nodes n LEFT JOIN sl_seeds sd ON sd.id = n.id
        )""",
    ]
    for k in range(rounds):
        ctes.append(f"""sl{k + 1} AS MATERIALIZED (
            SELECT n.id,
                   COALESCE(sd.label, w.label, s.label) AS label
            FROM sl_nodes n
            LEFT JOIN sl_seeds sd ON sd.id = n.id
            LEFT JOIN sl{k} s ON s.id = n.id
            LEFT JOIN (
                SELECT id, label FROM (
                    SELECT e.b AS id, t.label, COUNT(*) AS c,
                           ROW_NUMBER() OVER (
                             PARTITION BY e.b
                             ORDER BY COUNT(*) DESC, t.label
                           ) AS rn
                    FROM sl_adj e
                    JOIN sl{k} t
                      ON t.id = e.a AND t.label IS NOT NULL
                    GROUP BY e.b, t.label
                ) WHERE rn = 1
            ) w ON w.id = n.id
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT s.id, s.label, (sd.id IS NOT NULL) AS is_seed
        FROM sl{rounds} s
        LEFT JOIN sl_seeds sd ON sd.id = s.id
        WHERE s.label IS NOT NULL
        """
    )


def _matching_oracle(rounds: int = 5) -> str:
    """q_matching_parts' oracle: the locally-minimal-edge matching
    unrolled round by round over the part co-order graph — md5 edge
    keys, per-endpoint MIN joins, matched-endpoint NOT EXISTS removal;
    identical round count to the Spark side."""
    ctes = [
        """mm_l0 AS MATERIALIZED (
            SELECT a, b,
                   md5(CAST(a AS VARCHAR) || ':'
                       || CAST(b AS VARCHAR)) AS k
            FROM (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                  FROM lineitem x JOIN lineitem y
                    ON x.l_orderkey = y.l_orderkey
                   AND x.l_partkey < y.l_partkey)
        )""",
    ]
    for r in range(1, rounds + 1):
        # per-vertex min over the SYMMETRIZED incidence (see the Spark
        # side's matching-invariant note — per-side minima are wrong)
        ctes.append(f"""mm_v{r} AS MATERIALIZED (
            SELECT v, MIN(k) AS mk FROM (
                SELECT a AS v, k FROM mm_l{r - 1}
                UNION ALL SELECT b AS v, k FROM mm_l{r - 1}
            ) GROUP BY v
        )""")
        ctes.append(f"""mm_s{r} AS MATERIALIZED (
            SELECT l.a, l.b, CAST({r} AS INTEGER) AS matched_round
            FROM mm_l{r - 1} l
            JOIN mm_v{r} xa ON xa.v = l.a AND l.k = xa.mk
            JOIN mm_v{r} xb ON xb.v = l.b AND l.k = xb.mk
        )""")
        ctes.append(f"""mm_l{r} AS MATERIALIZED (
            SELECT e.a, e.b, e.k FROM mm_l{r - 1} e
            WHERE NOT EXISTS (
                SELECT 1 FROM mm_s{r} s
                WHERE s.a IN (e.a, e.b) OR s.b IN (e.a, e.b)
            )
        )""")
    sel_union = "\nUNION ALL\n".join(
        f"SELECT * FROM mm_s{r}" for r in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT a, b, matched_round FROM ({sel_union})
        ORDER BY a, b
        """
    )


def _kmeans_oracle(
    k: int = 8,
    n_iter: int = 3,
    grid: int = 10**6,
    final_sql: str | None = None,
) -> str:
    """q_kmeans_embeddings' oracle: quantized-grid Lloyd unrolled in SQL.

    Exactness argument (why a float clustering can hash-match at all):
    coordinates are integers on the 1e-6 grid, squared norms stay below
    2^53, so even DuckDB's double-domain list_dot_product is EXACT and
    order-independent — d² values equal Spark's int64 matmul bit-for-bit,
    and argmin ties break identically (ORDER BY d2, c == numpy first
    min). Centroid updates are exact integer sums re-quantized with the
    same floor(s/n + 0.5)."""
    dist = (
        "list_dot_product(q.v, q.v) + list_dot_product(cc.v, cc.v)"
        " - 2 * list_dot_product(q.v, cc.v)"
    )
    ctes = [
        f"""kq AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding,
                     x -> CAST(ROUND(CAST(x AS DOUBLE) * {grid})
                               AS BIGINT)) AS v
            FROM embeddings
        )""",
        f"""kc0 AS MATERIALIZED (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, v
            FROM (SELECT vec_id, v FROM kq ORDER BY vec_id LIMIT {k})
        )""",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(f"""ka{i} AS MATERIALIZED (
            SELECT vec_id, c, CAST(d AS BIGINT) AS d2 FROM (
              SELECT q.vec_id, cc.c, {dist} AS d,
                     ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                        ORDER BY {dist}, cc.c) AS rn
              FROM kq q CROSS JOIN kc{i - 1} cc
            ) WHERE rn = 1
        )""")
        if i == n_iter:
            break  # the final assignment is the output; no update needed
        ctes.append(f"""ku{i} AS MATERIALIZED (
            SELECT c, pos, SUM(v[pos]) AS s, COUNT(*) AS n FROM (
              SELECT a.c AS c, q.v AS v,
                     unnest(range(1, len(q.v) + 1)) AS pos
              FROM ka{i} a JOIN kq q USING (vec_id)
            ) GROUP BY c, pos
        )""")
        ctes.append(f"""kc{i} AS MATERIALIZED (
            SELECT p.c, COALESCE(nv.v, p.v) AS v
            FROM kc{i - 1} p LEFT JOIN (
              SELECT c, list(CAST(FLOOR(s / n + 0.5) AS BIGINT)
                             ORDER BY pos) AS v
              FROM ku{i} GROUP BY c
            ) nv ON p.c = nv.c
        )""")
    final = final_sql or f"""
        SELECT c AS cluster, COUNT(*) AS n_members,
               CAST(SUM(d2) AS BIGINT) AS inertia,
               MIN(vec_id) AS min_member
        FROM ka{n_iter} GROUP BY c ORDER BY c
        """
    return "WITH " + ",\n".join(ctes) + final


def _pq_oracle(
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    grid: int = 10**6,
    dim: int = 64,
    final: str = "codes",
    nq: int = 5,
    topk: int = 10,
) -> str:
    """q_pq_codes / q_pq_topk oracle: m independent quantized-grid
    Lloyd runs (the _kmeans_oracle template per sub-vector slice),
    joined back into code rows; the topk variant adds the asymmetric
    distance table (query sub-vector x trained codeword) and ranks the
    exact integer ADC sums. Slicing after quantization == the engine's
    quantize-after-slice (both are per-coordinate)."""
    sub = dim // m
    dist = (
        "list_dot_product(q.v, q.v) + list_dot_product(cc.v, cc.v)"
        " - 2 * list_dot_product(q.v, cc.v)"
    )
    ctes = [
        f"""pq_all AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding,
                     x -> CAST(ROUND(CAST(x AS DOUBLE) * {grid})
                               AS BIGINT)) AS v
            FROM embeddings
        )"""
    ]
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        ctes.append(f"""pq_q{j} AS MATERIALIZED (
            SELECT vec_id, list_slice(v, {lo}, {hi}) AS v FROM pq_all
        )""")
        ctes.append(f"""pc0_{j} AS MATERIALIZED (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, v
            FROM (SELECT vec_id, v FROM pq_q{j}
                  ORDER BY vec_id LIMIT {k})
        )""")
        for i in range(1, n_iter + 1):
            ctes.append(f"""pa{i}_{j} AS MATERIALIZED (
                SELECT vec_id, c, CAST(d AS BIGINT) AS d2 FROM (
                  SELECT q.vec_id, cc.c, {dist} AS d,
                         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                            ORDER BY {dist}, cc.c)
                           AS rn
                  FROM pq_q{j} q CROSS JOIN pc{i - 1}_{j} cc
                ) WHERE rn = 1
            )""")
            if i == n_iter:
                break
            ctes.append(f"""pu{i}_{j} AS MATERIALIZED (
                SELECT c, pos, SUM(v[pos]) AS s, COUNT(*) AS n FROM (
                  SELECT a.c AS c, q.v AS v,
                         unnest(range(1, len(q.v) + 1)) AS pos
                  FROM pa{i}_{j} a JOIN pq_q{j} q USING (vec_id)
                ) GROUP BY c, pos
            )""")
            ctes.append(f"""pc{i}_{j} AS MATERIALIZED (
                SELECT p.c, COALESCE(nv.v, p.v) AS v
                FROM pc{i - 1}_{j} p LEFT JOIN (
                  SELECT c, list(CAST(FLOOR(s / n + 0.5) AS BIGINT)
                                 ORDER BY pos) AS v
                  FROM pu{i}_{j} GROUP BY c
                ) nv ON p.c = nv.c
            )""")
    if final == "codes":
        joins = " ".join(
            f"JOIN pa{n_iter}_{j} a{j} USING (vec_id)"
            for j in range(1, m)
        )
        code_cols = ", ".join(
            f"a{j}.c AS code_{j}" for j in range(m)
        )
        err = " + ".join(f"a{j}.d2" for j in range(m))
        return (
            "WITH " + ",\n".join(ctes)
            + f""" SELECT a0.vec_id, {code_cols},
                     CAST({err} AS BIGINT) AS quant_err
               FROM pa{n_iter}_0 a0 {joins}"""
        )
    # topk: asymmetric distance of the nq lowest-id queries
    for j in range(m):
        ctes.append(f"""pqd_{j} AS MATERIALIZED (
            SELECT q.vec_id AS query_id, cc.c AS code,
                   CAST({dist} AS BIGINT) AS d
            FROM (SELECT vec_id, v FROM pq_q{j}
                  WHERE vec_id IN (SELECT vec_id FROM pq_all
                                   ORDER BY vec_id LIMIT {nq})) q
            CROSS JOIN pc{n_iter - 1}_{j} cc
        )""")
    xjoins = " ".join(
        f"JOIN pa{n_iter}_{j} x{j} USING (vec_id)" for j in range(1, m)
    )
    djoins = " ".join(
        f"JOIN pqd_{j} d{j} ON d{j}.code = x{j}.c"
        f" AND d{j}.query_id = d0.query_id"
        for j in range(1, m)
    )
    s = " + ".join(f"d{j}.d" for j in range(m))
    return (
        "WITH " + ",\n".join(ctes)
        + f""" SELECT query_id, neighbor_id, rank, adc_d2 FROM (
             SELECT d0.query_id, x0.vec_id AS neighbor_id,
                    ROW_NUMBER() OVER (
                      PARTITION BY d0.query_id
                      ORDER BY ({s}), x0.vec_id) AS rank,
                    CAST({s} AS BIGINT) AS adc_d2
             FROM pa{n_iter}_0 x0 {xjoins}
             JOIN pqd_0 d0 ON d0.code = x0.c {djoins}
             WHERE d0.query_id <> x0.vec_id
           ) WHERE rank <= {topk}"""
    )


def _hll_oracle(p: int = 10) -> str:
    """q_hll_distinct_events' oracle: the identical HLL registers in
    DuckDB — md5-family hash, bucket = h % m, rho = trailing zeros of
    the remaining bits via the same bit_count((w & -w) - 1) + 1 integer
    formula, harmonic sum as an exact BIGINT of power-of-two terms, and
    ONE final float division by the same driver-side literal the engine
    inlines (functions/search.py hll_estimate)."""
    from akka_graph_db_spark.functions.search import _HLL_RHO_CAP, _hll_alpha

    m = 1 << p
    c = _hll_alpha(m) * m * m * float(1 << _HLL_RHO_CAP)
    return f"""
        WITH hll_h AS (
          SELECT CAST(md5_number_upper('hll:' || CAST(event_id AS VARCHAR))
                      & 9223372036854775807 AS BIGINT) AS h
          FROM events
        ),
        hll_b AS (SELECT h % {m} AS bucket, h >> {p} AS w FROM hll_h),
        hll_regs AS (
          SELECT bucket,
                 MAX(LEAST(bit_count((w & -w) - 1) + 1, {_HLL_RHO_CAP}))
                   AS register
          FROM hll_b GROUP BY bucket
        ),
        hll_s AS (
          SELECT CAST(SUM(CAST(1 AS BIGINT)
                          << ({_HLL_RHO_CAP} - COALESCE(r.register, 0)))
                      AS BIGINT) AS s
          FROM range({m}) t LEFT JOIN hll_regs r ON t.range = r.bucket
        )
        SELECT (SELECT COUNT(DISTINCT event_id) FROM events) AS n_exact,
               ROUND({c!r} / CAST(s AS DOUBLE), 4) AS hll_estimate
        FROM hll_s
    """


def _onion_oracle(waves: int = 48) -> str:
    """q_onion_layers_parts' oracle: the peel-wave loop unrolled as
    DuckDB CTEs over the support-≥2 part co-order graph. Per wave:
    remaining degrees (isolated survivors included at 0 via the node
    frame), the ratcheting core value k = GREATEST(min remaining
    degree, previous k), the removed set (degree <= k, tagged with
    wave index and k), and the shrunken node/edge frames. Waves past
    exhaustion are no-ops (empty MIN coalesces to 0, removal selects
    nothing) — the coreness/kcore unroll contract; measured exhaustion
    is 36 waves at sf0.001 and 18 at sf0.01 (48 here)."""
    ctes = [
        """on_b AS MATERIALIZED (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )""",
        """on_p AS MATERIALIZED (
            SELECT a, b FROM (
              SELECT x.l_partkey AS a, y.l_partkey AS b,
                     COUNT(*) AS m
              FROM on_b x JOIN on_b y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey < y.l_partkey
              GROUP BY 1, 2
            ) WHERE m >= 2
        )""",
        """on_s0 AS MATERIALIZED (
            SELECT a, b FROM on_p UNION ALL SELECT b, a FROM on_p
        )""",
        """on_n0 AS MATERIALIZED (SELECT DISTINCT a FROM on_s0)""",
        """on_k0 AS (SELECT 0 AS k)""",
    ]
    for i in range(1, waves + 1):
        j = i - 1
        ctes.append(f"""on_d{i} AS MATERIALIZED (
            SELECT n.a, COALESCE(d.dd, 0) AS d FROM on_n{j} n
            LEFT JOIN (SELECT a, COUNT(*) AS dd FROM on_s{j}
                       GROUP BY a) d ON d.a = n.a
        )""")
        ctes.append(f"""on_k{i} AS MATERIALIZED (
            SELECT GREATEST(COALESCE((SELECT MIN(d) FROM on_d{i}), 0),
                            (SELECT k FROM on_k{j})) AS k
        )""")
        ctes.append(f"""on_r{i} AS MATERIALIZED (
            SELECT a, {i} AS layer, (SELECT k FROM on_k{i}) AS k
            FROM on_d{i} WHERE d <= (SELECT k FROM on_k{i})
        )""")
        ctes.append(f"""on_n{i} AS MATERIALIZED (
            SELECT a FROM on_n{j}
            WHERE a NOT IN (SELECT a FROM on_r{i})
        )""")
        ctes.append(f"""on_s{i} AS MATERIALIZED (
            SELECT a, b FROM on_s{j}
            WHERE a NOT IN (SELECT a FROM on_r{i})
              AND b NOT IN (SELECT a FROM on_r{i})
        )""")
    union = "\nUNION ALL\n".join(
        f"SELECT a, layer, k FROM on_r{i}" for i in range(1, waves + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT a AS id, CAST(layer AS INT) AS layer,
               CAST(k AS INT) AS coreness
        FROM ({union}) ORDER BY id
        """
    )


def _coreness_oracle(rounds: int = 24) -> str:
    """q_coreness_parts' oracle: h-index iteration unrolled as DuckDB
    CTEs over the part co-order graph. h⁰ = degree; each round's H
    operator is MAX(LEAST(h, rn)) over the vertex's neighbor h values
    ranked descending. The sequence is monotone NON-INCREASING per
    vertex (Lü et al. 2016 Thm 1), so unrolling past the measured
    fixpoint (10 rounds at sf0.001, 19 at sf0.01; 24 here) is a no-op
    tail, exactly the kcore/ktruss unroll contract."""
    ctes = [
        """cr_pairs AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        )""",
        """cr_sym AS MATERIALIZED (
            SELECT a, b FROM cr_pairs
            UNION ALL
            SELECT b AS a, a AS b FROM cr_pairs
        )""",
        """cr_h0 AS MATERIALIZED (
            SELECT a, COUNT(*) AS h FROM cr_sym GROUP BY a
        )""",
    ]
    for i in range(1, rounds + 1):
        ctes.append(f"""cr_h{i} AS MATERIALIZED (
            SELECT a, MAX(LEAST(h, rn)) AS h FROM (
              SELECT s.a, p.h,
                     ROW_NUMBER() OVER (PARTITION BY s.a
                                        ORDER BY p.h DESC) AS rn
              FROM cr_sym s JOIN cr_h{i - 1} p ON s.b = p.a
            ) GROUP BY a
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT a AS id, h AS coreness FROM cr_h{rounds} ORDER BY id
        """
    )


def _hits_oracle(n_iter: int = 8) -> str:
    """q_hits_top20's oracle: HITS unrolled as DuckDB CTEs over the
    derived graph — per half-step, sum incoming scores then L1-normalize
    by the global raw total (COALESCE(SUM, 1.0) and the ==0 guard mirror
    analytics.hits exactly). Top-20 selected on FULL-precision authority,
    rounded for output — matching the Spark side."""
    # AS MATERIALIZED: each a{k}/h{k} feeds the next half-step's raw CTE
    # AND the normalizer aggregate — plain CTEs would inline exponentially
    ctes = [
        "ht_edges AS MATERIALIZED (SELECT src, dst FROM edges_v)",
        "ht_nodes AS MATERIALIZED (SELECT id FROM nodes_v)",
        """h0 AS MATERIALIZED (
            SELECT id, CAST(1.0 AS DOUBLE) AS score FROM ht_nodes)""",
    ]
    for k in range(1, n_iter + 1):
        ctes.append(f"""ar{k} AS MATERIALIZED (
            SELECT e.dst AS id, SUM(h.score) AS raw
            FROM ht_edges e JOIN h{k - 1} h ON e.src = h.id
            GROUP BY e.dst
        )""")
        ctes.append(f"""a{k} AS MATERIALIZED (
            SELECT n.id,
                   COALESCE(r.raw, 0) /
                     (CASE WHEN t.tot = 0 THEN 1.0 ELSE t.tot END) AS score
            FROM ht_nodes n
            CROSS JOIN (SELECT COALESCE(SUM(raw), 1.0) AS tot FROM ar{k}) t
            LEFT JOIN ar{k} r ON n.id = r.id
        )""")
        ctes.append(f"""hr{k} AS MATERIALIZED (
            SELECT e.src AS id, SUM(a.score) AS raw
            FROM ht_edges e JOIN a{k} a ON e.dst = a.id
            GROUP BY e.src
        )""")
        ctes.append(f"""h{k} AS MATERIALIZED (
            SELECT n.id,
                   COALESCE(r.raw, 0) /
                     (CASE WHEN t.tot = 0 THEN 1.0 ELSE t.tot END) AS score
            FROM ht_nodes n
            CROSS JOIN (SELECT COALESCE(SUM(raw), 1.0) AS tot FROM hr{k}) t
            LEFT JOIN hr{k} r ON n.id = r.id
        )""")
    return (
        _GRAPH_WITH
        + ",\n"
        + ",\n".join(ctes)
        + f"""
        SELECT id, ROUND(hub, 6) AS hub, ROUND(authority, 6) AS authority
        FROM (
            SELECT h.id, h.score AS hub, a.score AS authority
            FROM h{n_iter} h JOIN a{n_iter} a ON h.id = a.id
            ORDER BY a.score DESC, h.id LIMIT 20
        )
        """
    )


def _ppr_oracle(
    src_expr: str, n_iter: int = 10, damping: float = 0.85
) -> str:
    """q_ppr_customer's oracle: personalized PageRank unrolled as DuckDB
    CTEs — identical to _pagerank_oracle except the reset vector is the
    source indicator (and the dangling mass returns to the sources), per
    analytics.personalized_pagerank."""
    base = 1.0 - damping
    # The engine splits reset mass 1/|S| across sources; mirror it here
    # (src_expr is a comma-separated literal list) so a multi-source
    # entry can reuse this helper without divergence.
    n_src = src_expr.count(",") + 1
    ctes = [
        "pp_edges AS MATERIALIZED (SELECT src, dst FROM edges_v)",
        f"""pp_nodes AS MATERIALIZED (
            SELECT n.id, COALESCE(od.c, 0) AS out_degree,
                   CASE WHEN n.id IN ({src_expr})
                        THEN CAST(1.0 / {n_src} AS DOUBLE)
                        ELSE 0.0 END AS reset
            FROM nodes_v n
            LEFT JOIN (SELECT src, COUNT(*) AS c FROM pp_edges GROUP BY 1)
              od ON n.id = od.src
        )""",
        """p0 AS MATERIALIZED (
            SELECT id, out_degree, reset, reset AS rank FROM pp_nodes)""",
    ]
    for k in range(n_iter):
        ctes.append(f"""p{k + 1} AS MATERIALIZED (
            SELECT n.id, n.out_degree, n.reset,
                   {base!r} * n.reset + {damping!r} *
                     (COALESCE(c.recv, 0) + d.dang * n.reset) AS rank
            FROM pp_nodes n
            CROSS JOIN (SELECT COALESCE(SUM(rank), 0) AS dang
                        FROM p{k} WHERE out_degree = 0) d
            LEFT JOIN (
                SELECT e.dst AS id, SUM(r.rank / r.out_degree) AS recv
                FROM pp_edges e JOIN p{k} r ON e.src = r.id
                WHERE r.out_degree > 0
                GROUP BY e.dst
            ) c ON n.id = c.id
        )""")
    return (
        _GRAPH_WITH
        + ",\n"
        + ",\n".join(ctes)
        + f"""
        SELECT id, rank FROM (
            SELECT id, ROUND(rank, 6) AS rank FROM p{n_iter}
            WHERE rank > 0
            ORDER BY ROUND(rank, 6) DESC, id LIMIT 20
        )
        """
    )


def _kcore_oracle(k: int = 80, rounds: int = 10) -> str:
    """q_kcore_parts's oracle: degree-peel rounds unrolled as DuckDB CTEs
    over the symmetrized part co-order graph. ``rounds`` exceeds the
    rounds-to-fixpoint at sf0.01 (measured: 6), and peeling past the
    fixpoint is idempotent, so the unrolled form equals Spark's
    run-to-fixpoint loop. All-integer arithmetic — exact compare."""
    ctes = [
        """kc_pairs AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        )""",
        """s0 AS MATERIALIZED (
            SELECT a, b FROM kc_pairs
            UNION ALL
            SELECT b AS a, a AS b FROM kc_pairs
        )""",
    ]
    for r in range(rounds):
        ctes.append(f"""s{r + 1} AS MATERIALIZED (
            SELECT s.a, s.b FROM s{r} s
            JOIN (SELECT a FROM s{r} GROUP BY a
                  HAVING COUNT(*) >= {k}) ka ON s.a = ka.a
            JOIN (SELECT a AS b FROM s{r} GROUP BY a
                  HAVING COUNT(*) >= {k}) kb ON s.b = kb.b
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT a AS id, COUNT(*) AS core_degree
        FROM s{rounds} GROUP BY a HAVING COUNT(*) >= {k}
        """
    )


# ===========================================================================
# Reference operators (SURVEY.md §2.1-2.4) — scans & lookups
# ===========================================================================

def q_get_node(spark, sf_dir):
    """getNode point lookup (Neo4jGraph.scala:212-233)."""
    g = _g(spark, sf_dir)
    n = scan.get_node(g, CUSTOMER_BASE + 7)
    return n.select(
        "id",
        "label",
        prop_str("props", "name").alias("name"),
        prop_double("props", "acctbal").alias("acctbal"),
        prop_str("props", "mktsegment").alias("mktsegment"),
    )


def q_get_nodes_filtered(spark, sf_dir):
    """getNodes: label ∧ property equality (Neo4jGraph.scala:235-257);
    the predicate rides the promoted column → parquet pushdown."""
    g = _g(spark, sf_dir)
    n = scan.get_nodes(g, "customer", {"mktsegment": "BUILDING"})
    return n.select(
        "id",
        prop_str("props", "name").alias("name"),
        prop_double("props", "acctbal").alias("acctbal"),
    )


def q_get_nodes_all_labels(spark, sf_dir):
    """getNodes with label=None matches ALL labels (canonical semantics —
    NOT the embedded backend's 'DEFAULT' bug, Neo4jGraph.scala:588)."""
    g = _g(spark, sf_dir)
    return (
        scan.get_nodes(g, None)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def q_get_edge(spark, sf_dir):
    """getEdge + endpoint hydration (RETURN e,a,b — Neo4jGraph.scala:259-293)."""
    g = _g(spark, sf_dir)
    e = scan.get_edge(g, PLACED_BASE + 1, hydrate=True)
    return e.select(
        "id",
        "label",
        "src",
        "dst",
        "src_label",
        "dst_label",
        prop_double("props", "totalprice").alias("totalprice"),
    )


def q_get_edges_filtered(spark, sf_dir):
    """getEdges applies the property filter (canonical — the embedded
    backend drops it, Neo4jGraph.scala:624-628)."""
    g = _g(spark, sf_dir)
    e = scan.get_edges(g, "contains", {"quantity": 30})
    return e.select(
        "id",
        "src",
        "dst",
        prop_double("props", "quantity").alias("quantity"),
        prop_str("props", "returnflag").alias("returnflag"),
    )


def q_egress_edges(spark, sf_dir):
    """Frontier-batch getEgressEdges (Neo4jGraph.scala:334-368): orders per
    BUILDING customer — the SURVEY §7 Phase-1 slice."""
    g = _g(spark, sf_dir)
    frontier = scan.get_nodes(g, "customer", {"mktsegment": "BUILDING"}).select(
        "id"
    )
    hops = traverse.egress_edges(g, frontier, "placed", hydrate=False)
    return hops.groupBy(F.col("src").alias("customer_id")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("totalprice").cast("decimal(30,2)"))
        .cast("double")
        .alias("total_spent"),
    )


def q_ingress_edges(spark, sf_dir):
    """Frontier-batch getIngressEdges (Neo4jGraph.scala:370-404): located_in
    in-degree per nation."""
    g = _g(spark, sf_dir)
    frontier = scan.get_nodes(g, "nation").select("id")
    hops = traverse.ingress_edges(g, frontier, "located_in", hydrate=False)
    return hops.groupBy(F.col("dst").alias("nation_id")).agg(
        F.count(F.lit(1)).alias("n_in")
    )


def q_paths_to(spark, sf_dir):
    """pathsTo (Neo4jGraph.scala:492-520) as bounded directed BFS: customer 1
    → its region, depth ≤ 4; exactly the located_in→in_region chain."""
    g = _g(spark, sf_dir)
    # one driver lookup: customer 1 -> nation -> region in a single plan
    li = g.edges.where(
        (F.col("label") == "located_in") & (F.col("src") == CUSTOMER_BASE + 1)
    ).select(F.col("dst").alias("nation_id"))
    ir = g.edges.where(F.col("label") == "in_region").select(
        F.col("src").alias("nation_id"), F.col("dst").alias("region_id")
    )
    end_id = li.join(ir, "nation_id").collect()[0]["region_id"]
    p = traverse.paths_to(
        g, CUSTOMER_BASE + 1, end_id, max_depth=4, directed=True
    )
    return p.select(
        F.col("depth").cast("int").alias("depth"),
        F.array_join(
            F.transform(F.col("node_path"), lambda x: x.cast("string")), ","
        ).alias("node_path_str"),
        F.array_join(
            F.transform(F.col("edge_path"), lambda x: x.cast("string")), ","
        ).alias("edge_path_str"),
    )


def q_paths_to_hydrated(spark, sf_dir):
    """pathsTo with the reference's FULL Path payload (Neo4jGraph.scala:85-94:
    start node + ordered edge OBJECTS, not just ids): customer 1 → its
    region, hydrate=True. Flattened to one row per hop for the oracle hash
    (nested structs stringify differently across engines; the nested shape
    itself is pytest-asserted in tests/test_traverse.py)."""
    g = _g(spark, sf_dir)
    li = g.edges.where(
        (F.col("label") == "located_in") & (F.col("src") == CUSTOMER_BASE + 1)
    ).select(F.col("dst").alias("nation_id"))
    ir = g.edges.where(F.col("label") == "in_region").select(
        F.col("src").alias("nation_id"), F.col("dst").alias("region_id")
    )
    end_id = li.join(ir, "nation_id").collect()[0]["region_id"]
    p = traverse.paths_to(
        g, CUSTOMER_BASE + 1, end_id, max_depth=4, directed=True,
        hydrate=True,
    )
    return p.select(
        F.col("depth").cast("int").alias("depth"),
        F.col("start.id").alias("start_id"),
        F.col("start.label").alias("start_label"),
        F.posexplode("path").alias("pos", "_e"),
    ).select(
        "depth",
        "start_id",
        "start_label",
        F.col("pos").cast("int").alias("pos"),
        F.col("_e.id").alias("edge_id"),
        F.col("_e.src").alias("edge_src"),
        F.col("_e.dst").alias("edge_dst"),
        F.col("_e.label").alias("edge_label"),
    )


def q_paths_to_undirected(spark, sf_dir):
    """pathsTo in the reference's UNDIRECTED form (Cypher `-[:L*]-`,
    Neo4jGraph.scala:504): nation 0 → the smallest co-located nation,
    depth ≤ 2 — exactly the nation→region←nation route."""
    g = _g(spark, sf_dir)
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    a = nat.where(F.col("n_nationkey") == 0).select(
        F.col("n_regionkey").alias("rk")
    )
    end_key = (
        nat.join(a, nat["n_regionkey"] == a["rk"])
        .where(F.col("n_nationkey") != 0)
        .agg(F.min("n_nationkey").alias("m"))
        .collect()[0]["m"]
    )
    p = traverse.paths_to(
        g,
        NATION_BASE + 0,
        NATION_BASE + int(end_key),
        max_depth=2,
        directed=False,
        edge_labels=["in_region"],
    )
    return p.select(
        F.col("depth").cast("int").alias("depth"),
        F.array_join(
            F.transform(F.col("node_path"), lambda x: x.cast("string")), ","
        ).alias("node_path_str"),
    )


def q_get_nodes_unlabeled_prop(spark, sf_dir):
    """getNodes(label=None, {name: 'ASIA'}): a property predicate spanning
    ALL labels (region matches; every other label is scanned-and-missed or
    pruned via its promoted column)."""
    g = _g(spark, sf_dir)
    return scan.get_nodes(g, None, {"name": "ASIA"}).select("id", "label")


def q_get_edges_hydrated(spark, sf_dir):
    """Batch getEdges with endpoint hydration (the RETURN e,a,b shape,
    Neo4jGraph.scala:295-332) — lazy two-join form over a whole label."""
    g = _g(spark, sf_dir)
    e = scan.get_edges(g, "in_region", hydrate=True)
    return e.select("id", "src", "dst", "src_label", "dst_label")


# ===========================================================================
# Reference operators (SURVEY.md §2.1) — mutations, checked as
# mutate-then-scan so the oracle can verify the post-state relationally
# ===========================================================================

def q_add_nodes(spark, sf_dir):
    """addNode (Neo4jGraph.scala:156-176): batch insert, scan back."""
    g = _g(spark, sf_dir).core()
    g2 = crud.add_nodes(
        g,
        [
            (90_000_001, "probe", {"name": "alpha", "score": 1.5}),
            (90_000_002, "probe", {"name": "beta", "flag": True}),
        ],
    )
    return scan.get_nodes(g2, "probe").select(
        "id",
        prop_str("props", "name").alias("name"),
        prop_double("props", "score").alias("score"),
        prop_bool("props", "flag").alias("flag"),
    )


def q_add_edges_validated(spark, sf_dir):
    """addEdge requires both endpoints (MATCH-first contract,
    Neo4jGraph.scala:188-194): the edge to a nonexistent node is dropped."""
    g = _g(spark, sf_dir).core()
    g2 = crud.add_edges(
        g,
        [
            (91_000_001, "probe_edge", CUSTOMER_BASE + 1, NATION_BASE + 0, {}),
            (91_000_002, "probe_edge", CUSTOMER_BASE + 1, 77_777_777, {}),
        ],
    )
    return scan.get_edges(g2, "probe_edge").select("id", "src", "dst")


def q_update_node_merge(spark, sf_dir):
    """updateNode merge semantics (SET n += {...}; Neo4jGraph.scala:442-467):
    changed key wins, None DELETES the key, new key appears, others keep."""
    g = _g(spark, sf_dir).core()
    g2 = crud.update_nodes(
        g,
        {
            CUSTOMER_BASE
            + 1: {"mktsegment": "PROMO", "name": None, "vip": True}
        },
    )
    return scan.get_node(g2, CUSTOMER_BASE + 1).select(
        "id",
        prop_str("props", "name").alias("name"),
        prop_str("props", "mktsegment").alias("mktsegment"),
        prop_bool("props", "vip").alias("vip"),
        prop_double("props", "acctbal").alias("acctbal"),
    )


def q_update_edge_merge(spark, sf_dir):
    """updateEdge (Neo4jGraph.scala:469-490): same merge/null-delete."""
    g = _g(spark, sf_dir).core()
    g2 = crud.update_edges(g, {PLACED_BASE + 1: {"totalprice": 999.99}})
    e = g2.edges.where(F.col("id") == PLACED_BASE + 1)
    return e.select(
        "id",
        prop_double("props", "totalprice").alias("totalprice"),
        _ts_str(prop_timestamp("props", "orderdate")).alias("orderdate_str"),
    )


def q_remove_node_cascade(spark, sf_dir):
    """removeNode CASCADES to incident edges (DETACH DELETE,
    Neo4jGraph.scala:406-413): customer 1's placed+located_in edges vanish."""
    g = _g(spark, sf_dir).core()
    g2 = crud.remove_nodes_by_id(g, [CUSTOMER_BASE + 1])
    nc = g2.nodes.where(F.col("label") == "customer").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    np_ = g2.edges.where(F.col("label") == "placed").agg(
        F.count(F.lit(1)).alias("n_placed")
    )
    nl = g2.edges.where(F.col("label") == "located_in").agg(
        F.count(F.lit(1)).alias("n_located_in")
    )
    return nc.crossJoin(np_).crossJoin(nl)


def q_remove_nodes_predicate(spark, sf_dir):
    """removeNodes by label+property predicate (Neo4jGraph.scala:415-431),
    cascading; label=None-matches-all semantics tested in pytest."""
    g = _g(spark, sf_dir).core()
    g2 = crud.remove_nodes(g, "customer", {"mktsegment": "BUILDING"})
    return (
        g2.nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(g2.edges.agg(F.count(F.lit(1)).alias("n_edges")))
    )


def q_remove_edges_predicate(spark, sf_dir):
    """removeEdge generalized to a predicate batch (Neo4jGraph.scala:433-440)."""
    g = _g(spark, sf_dir).core()
    g2 = crud.remove_edges(g, "contains", {"returnflag": "A"})
    return g2.edges.where(F.col("label") == "contains").agg(
        F.count(F.lit(1)).alias("n_contains")
    )


def q_store_delta_merge(spark, sf_dir):
    """Base+delta persistence round-trip (store.py merge-on-read): a
    mutation batch (prop merge with null-delete on customer 1 + cascading
    removal of supplier 1) is diffed into an O(changes) delta, persisted
    next to the untouched base, and read back through the single-shuffle
    max_by merge. Verifies the merged view equals applying the mutations
    directly — the Delta-Lake-style answer to the reference's Neo4j store
    writes (Neo4jGraph.scala:150-154)."""
    import atexit
    import shutil
    import tempfile

    from akka_graph_db_spark import store

    g = _g(spark, sf_dir).core()
    g2 = crud.update_nodes(
        g, {CUSTOMER_BASE + 1: {"mktsegment": "DELTA", "name": None}}
    )
    g2 = crud.remove_nodes_by_id(g2, [SUPPLIER_BASE + 1])
    root = tempfile.mkdtemp(prefix="spark_graft_delta_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    store.save_snapshot(g, root)
    store.save_delta(
        root, store.delta_from_graphs(g, g2), validate=False
    )
    m = store.load_snapshot(spark, root)
    ns = m.nodes.where(F.col("label") == "supplier").agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    nsb = m.edges.where(F.col("label") == "supplied_by").agg(
        F.count(F.lit(1)).alias("n_supplied_by")
    )
    nli = m.edges.where(F.col("label") == "located_in").agg(
        F.count(F.lit(1)).alias("n_located_in")
    )
    cust = m.nodes.where(F.col("id") == CUSTOMER_BASE + 1).select(
        prop_str("props", "mktsegment").alias("mktsegment"),
        prop_str("props", "name").alias("name"),
        prop_double("props", "acctbal").alias("acctbal"),
    )
    return ns.crossJoin(nsb).crossJoin(nli).crossJoin(cust)


def q_store_time_travel(spark, sf_dir):
    """Snapshot time travel: after a delta (v1) mutates the store, v0 is
    still readable as-of — load_snapshot(version=0) vs the merged head.
    One row proving both states coexist: supplier counts and customer
    1's mktsegment before/after. The reference mutates Neo4j in place
    (SET/DELETE, Neo4jGraph.scala:406-490) — historical states are
    gone; versioned snapshots make them first-class."""
    import atexit
    import shutil
    import tempfile

    from akka_graph_db_spark import store

    g = _g(spark, sf_dir).core()
    g2 = crud.update_nodes(
        g, {CUSTOMER_BASE + 1: {"mktsegment": "TRAVELED"}}
    )
    g2 = crud.remove_nodes_by_id(g2, [SUPPLIER_BASE + 1])
    root = tempfile.mkdtemp(prefix="spark_graft_tt_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    store.save_snapshot(g, root)
    store.save_delta(root, store.delta_from_graphs(g, g2), validate=False)
    v0 = store.load_snapshot(spark, root, version=0)
    head = store.load_snapshot(spark, root)

    def _state(m, tag):
        ns = m.nodes.where(F.col("label") == "supplier").agg(
            F.count(F.lit(1)).alias(f"{tag}_suppliers")
        )
        seg = m.nodes.where(F.col("id") == CUSTOMER_BASE + 1).select(
            prop_str("props", "mktsegment").alias(f"{tag}_mktsegment")
        )
        return ns.crossJoin(seg)

    return _state(v0, "v0").crossJoin(_state(head, "v1"))


def q_store_version_summary(spark, sf_dir):
    """Store audit log (store.version_summary): per-version part row
    counts read from parquet footers — base = full snapshot, delta = its
    O(changes) footprint (here: 1 node update + supplier-1 removal whose
    cascade deletes its located_in and supplied_by edges). The oracle
    derives every count relationally from the fixture, so the row pins
    the writer's delta sizing end-to-end."""
    import atexit
    import shutil
    import tempfile

    from akka_graph_db_spark import store

    g = _g(spark, sf_dir).core()
    g2 = crud.update_nodes(
        g, {CUSTOMER_BASE + 1: {"mktsegment": "TRAVELED"}}
    )
    g2 = crud.remove_nodes_by_id(g2, [SUPPLIER_BASE + 1])
    root = tempfile.mkdtemp(prefix="spark_graft_vs_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    store.save_snapshot(g, root)
    store.save_delta(root, store.delta_from_graphs(g, g2), validate=False)
    return store.version_summary(root, spark)


def q_codec_roundtrip(spark, sf_dir):
    """§2.5 codec: JSON-fragment props decode back to typed values with full
    precision (anyRefToJson/jsValueToAny, Neo4jGraph.scala:37-119; we keep
    the remote backend's full precision, NOT the embedded Float downcast)."""
    g = _g(spark, sf_dir)
    n = g.nodes.where(
        (F.col("label") == "order") & (F.col("id") < ORDER_BASE + 10)
    )
    return n.select(
        "id",
        prop_str("props", "status").alias("status"),
        prop_double("props", "totalprice").alias("totalprice"),
        _ts_str(prop_timestamp("props", "orderdate")).alias("orderdate_str"),
        prop_str("props", "priority").alias("priority"),
    )


# ===========================================================================
# §2.8 analytics
# ===========================================================================

def q_degrees(spark, sf_dir):
    g = _g(spark, sf_dir)
    return analytics.degrees(g).select(
        "id",
        F.col("out_degree").cast("bigint").alias("out_degree"),
        F.col("in_degree").cast("bigint").alias("in_degree"),
        F.col("degree").cast("bigint").alias("degree"),
    )


def q_connected_components_geo(spark, sf_dir):
    """Connected components over the geography subgraph; component = min
    node id in component = the region's node id (regions hold the smallest
    ids), so the oracle can recompute it with plain joins."""
    g = _g(spark, sf_dir)
    cc = analytics.connected_components(
        g, edge_labels=["in_region", "located_in"]
    )
    geo = g.nodes.where(
        F.col("label").isin("region", "nation", "customer", "supplier")
    ).select("id")
    return cc.join(geo, "id", "left_semi").select("id", "component")


def q_connected_components_two_phase_geo(spark, sf_dir):
    """Same geography components via the O(log n) large-star/small-star
    algorithm — must agree with the propagation variant AND the relational
    oracle (components = the region's node id)."""
    g = _g(spark, sf_dir)
    e = g.edges.where(F.col("label").isin("in_region", "located_in"))
    pairs = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    geo = g.nodes.where(
        F.col("label").isin("region", "nation", "customer", "supplier")
    ).select("id")
    cc = analytics.connected_components_two_phase(geo, pairs)
    return cc.select("id", "component")


def q_pagerank_top20(spark, sf_dir):
    """PageRank, fixed 10 iterations — oracled against an unrolled DuckDB
    CTE chain with identical dangling-mass math (see _pagerank_oracle)."""
    g = _g(spark, sf_dir)
    pr = analytics.pagerank(g, n_iter=10)
    # orderBy+limit = TakeOrdered (per-partition top-k then merge) — not a
    # single-partition global window
    return (
        pr.orderBy(F.col("rank").desc(), F.col("id"))
        .limit(20)
        .select("id", F.round("rank", 6).alias("rank"))
    )


def q_sssp_weighted(spark, sf_dir):
    """Hop-bounded WEIGHTED shortest paths (analytics.shortest_paths,
    Bellman-Ford frontier relaxation) from nation 1, undirected over the
    full graph, edge weight = the `quantity` prop (contains edges carry
    it; every other label defaults to 1.0). The reference's pathsTo is
    unweighted hop-BFS (Neo4jGraph.scala:85-94); this is its weighted
    §2.8-style generalization. Distances are integer-valued doubles
    (quantity is integral), so the per-label COUNT/MIN/MAX/SUM summary is
    exact and order-independent — hash-comparable against a 4-step
    unrolled Bellman-Ford CTE in DuckDB."""
    g = _g(spark, sf_dir)
    d = analytics.shortest_paths(
        g, [NATION_BASE + 1], weight="quantity", directed=False, max_hops=4
    )
    return (
        d.join(g.nodes.select("id", "label"), "id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.min("dist").alias("min_dist"),
            F.max("dist").alias("max_dist"),
            F.sum("dist").alias("sum_dist"),
        )
    )


def q_khop_features(spark, sf_dir):
    """GNN-style neighborhood feature aggregation: for every node, the
    distinct ≤2-hop out-neighborhood over placed+contains edges
    (customer → orders → parts), with neighbor count and the
    decimal-exact sum of neighbor order totalprice. khop_neighbors
    materializes the (id, neighbor) pair set frontier-wise; the feature
    join + groupBy is plain DataFrame composition on top."""
    g = _g(spark, sf_dir)
    pairs = analytics.khop_neighbors(
        g, 2, edge_labels=["placed", "contains"], directed=True
    )
    feats = g.nodes.select(
        F.col("id").alias("neighbor"),
        prop_double("props", "totalprice").alias("_tp"),
    )
    return (
        pairs.join(feats, "neighbor", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum(F.col("_tp").cast("decimal(30,2)"))
            .cast("double")
            .alias("sum_neighbor_totalprice"),
        )
    )


def q_triangles_coorder(spark, sf_dir):
    """Triangle count on the part co-order graph (parts sharing an
    order). Pairs arrive pre-dedup — triangle_count's
    canonical_undirected does the single distinct."""
    return analytics.triangle_count(_coorder_pairs(spark, sf_dir))


def q_motif_supply_chain(spark, sf_dir):
    """Fixed-length motif: customer-[placed]->order-[contains]->part-
    [supplied_by]->supplier-[located_in]->nation, customer in the SAME
    nation — counted per nation."""
    g = _g(spark, sf_dir)
    chain = analytics.match_path(
        g, ["placed", "contains", "supplied_by", "located_in"]
    )
    cust_nation = g.edges.where(F.col("label") == "located_in").select(
        F.col("src").alias("n0"), F.col("dst").alias("cust_nation")
    )
    return (
        chain.join(cust_nation, "n0")
        .where(F.col("n4") == F.col("cust_nation"))
        .groupBy(F.col("n4").alias("nation_id"))
        .agg(F.count(F.lit(1)).alias("n_chains"))
    )


def q_pattern_diamond(spark, sf_dir):
    """Branching-pattern matcher (find_pattern): the supply-chain motif
    expressed as a DIAMOND with a shared terminal variable — customer
    placed order containing a part supplied by a supplier in the SAME
    nation the customer lives in. Same answer as motif_supply_chain but
    bound through the named-variable pattern grammar (the generalization
    of the Cypher MATCH shapes the reference generates,
    Neo4jGraph.scala:188-194,345-347), certifying variable sharing
    across five terms."""
    g = _g(spark, sf_dir)
    matches = analytics.find_pattern(
        g,
        "(c)-[:placed]->(o); (o)-[:contains]->(p);"
        " (p)-[:supplied_by]->(s); (s)-[:located_in]->(n);"
        " (c)-[:located_in]->(n)",
    )
    return matches.groupBy(F.col("n").alias("nation_id")).agg(
        F.count(F.lit(1)).alias("n_chains")
    )


def q_pattern_supply_gap(spark, sf_dir):
    """Negation-pattern matcher (find_pattern): supply-chain GAPS — for
    each (customer order line, same-nation supplier) pair, keep those
    where the local supplier does NOT supply the ordered part, counted
    per nation. The `!(p)-[:supplied_by]->(s)` term has BOTH endpoints
    bound by the positive pattern, so it compiles to a left-anti join on
    (p, s) — the pair-level negation shape (never NOT IN / per-row
    subqueries), which at 100 TB is one shuffled anti-join against the
    supplied_by edge scan."""
    g = _g(spark, sf_dir)
    matches = analytics.find_pattern(
        g,
        "(c)-[:placed]->(o); (o)-[:contains]->(p);"
        " (c)-[:located_in]->(n); (s)-[:located_in]->(n);"
        " !(p)-[:supplied_by]->(s)",
        node_labels={"s": "supplier"},
    )
    return matches.groupBy(F.col("n").alias("nation_id")).agg(
        F.count(F.lit(1)).alias("n_gaps")
    )


def q_assortativity_coorder(spark, sf_dir):
    """Degree assortativity of the part co-order graph — do parts that
    co-occur in many orders link to similarly-connected parts? All
    moment sums are exact DECIMAL(38,0) integers; only the final ratio
    is floating point, so the DuckDB oracle reproduces it exactly."""
    return analytics.degree_assortativity(_coorder_pairs(spark, sf_dir))


def q_random_walks_parts(spark, sf_dir):
    """Deterministic 4-step uniform random walks from the 64 lowest part
    ids over the co-order graph — the DeepWalk/node2vec corpus
    generator. Every neighbor choice is md5-derived
    (functions/hashing.py), so a DuckDB oracle with the identical
    ranked-adjacency + hash arithmetic reproduces the walks
    step-for-step."""
    return analytics.random_walks(
        _coorder_pairs(spark, sf_dir), n_seeds=64, n_steps=4, salt="w"
    )


def q_walk_skipgrams(spark, sf_dir):
    """Skip-gram (center, context) training pairs from the deterministic
    walk corpus (window 2) — the DeepWalk §4.2 pair generator as a
    query: graph → walks → embedding training data in one plan. The
    oracle embeds the step-exact walks oracle as a CTE and pairs
    positions the same way."""
    walks = analytics.random_walks(
        _coorder_pairs(spark, sf_dir), n_seeds=64, n_steps=4, salt="w"
    )
    return analytics.walk_skipgram_pairs(walks, n_steps=4, window=2)


def q_node2vec_parts(spark, sf_dir):
    """node2vec-biased walks over the co-order graph (integer-weight
    search bias: return 2 / common 2 / far 1 ≡ p=1, q=2) — the
    second-order walk corpus for structure-aware embeddings, fully
    hash-deterministic (operators/analytics.py node2vec_walks). The
    oracle unrolls every step's classify-weight-pick arithmetic."""
    return analytics.node2vec_walks(
        _coorder_pairs(spark, sf_dir), n_seeds=64, n_steps=4
    )


def q_node2vec_skipgrams(spark, sf_dir):
    """Skip-gram training pairs from the node2vec-BIASED walk corpus
    (window 2) — graph → second-order walks → embedding data in one
    plan, composing the two deterministic generators; the oracle embeds
    the step-exact biased-walk oracle as a CTE and pairs positions
    identically."""
    walks = analytics.node2vec_walks(
        _coorder_pairs(spark, sf_dir), n_seeds=64, n_steps=4
    )
    return analytics.walk_skipgram_pairs(walks, n_steps=4, window=2)


def q_pagerank_weighted(spark, sf_dir):
    """Weighted PageRank over the full directed graph, 6 fixed
    iterations, edge weight = the `quantity` prop (contains edges carry
    it, everything else defaults to 1.0 — the sssp_weighted convention).
    The random surfer follows out-edges proportionally to weight;
    oracled against an unrolled DuckDB CTE chain with identical
    rank·w/Σw and dangling-mass math."""
    g = _g(spark, sf_dir)
    pr = analytics.pagerank(g, n_iter=6, weight="quantity")
    return (
        pr.orderBy(F.col("rank").desc(), F.col("id"))
        .limit(20)
        .select("id", F.round("rank", 6).alias("rank"))
    )


def q_betweenness_parts(spark, sf_dir):
    """Bounded-distance betweenness (Brandes forward σ / backward δ)
    from the 8 lowest part ids on the co-order graph, paths ≤ 3 hops —
    the landmark estimator (Brandes-Pich 2007). Top-20 sorted on the
    ROUNDED score then id (float-sum tie stability across engines);
    oracle = the same σ/δ recursion unrolled layer by layer in SQL."""
    b = analytics.betweenness_landmarks(
        _coorder_pairs(spark, sf_dir), landmarks=8, max_depth=3
    )
    return (
        b.select("id", F.round("betweenness", 6).alias("betweenness"))
        .orderBy(F.col("betweenness").desc(), "id")
        .limit(20)
    )


def q_edge_betweenness_parts(spark, sf_dir):
    """Girvan-Newman EDGE betweenness from the same 8-landmark bounded
    Brandes sweeps as betweenness_parts: the backward sweep's
    per-DAG-edge dependency σv/σw·(1+δ(w)) — formed anyway before the
    per-node aggregation — is kept per edge and summed over landmarks
    onto the canonical undirected edge. The community-cut ranking
    (Girvan-Newman 2002): the top edges are the bridges between
    modules. Top-20 on the ROUNDED score then (a, b); oracle = the
    node oracle's unrolled σ/δ CTEs with a per-edge union tail."""
    b = analytics.betweenness_landmarks(
        _coorder_pairs(spark, sf_dir), landmarks=8, max_depth=3,
        level="edge",
    )
    return (
        b.select(
            "a", "b",
            F.round("edge_betweenness", 6).alias("edge_betweenness"),
        )
        .orderBy(F.col("edge_betweenness").desc(), "a", "b")
        .limit(20)
    )


def q_collocations(spark, sf_dir):
    """Bigram collocation mining: adjacent word pairs scored by exact
    rational lift — (c12/N_bi) / ((c1/N_uni)·(c2/N_uni)), computed as
    one division of two exact sub-2^53 integer products, so the score
    is bit-identical across engines with NO transcendentals (the
    log-free PMI ranking, same trick as the BM25 rational scorer).
    Bigrams come from an array zip (map-side, no window); unigram
    counts broadcast onto pair counts (vocabulary-sized — at web scale
    gate it and fall back to a shuffle join); corpus totals fold in via
    1-row broadcast cross joins. Top-20 pairs with support ≥ 5."""
    docs = read_documents(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    base = docs.select(words.alias("_w"))
    uni = (
        base.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        base.select(
            F.explode(
                F.arrays_zip(
                    F.slice("_w", 1, F.size("_w") - 1),
                    F.slice("_w", 2, F.size("_w") - 1),
                )
            ).alias("_p")
        )
        .select(F.col("_p.0").alias("w1"), F.col("_p.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= 5)
    )
    n_uni = uni.agg(F.sum("c").alias("_nu"))
    n_bi = base.select(
        (F.size("_w") - 1).alias("_nb1")
    ).agg(F.sum("_nb1").alias("_nb"))
    scored = (
        bi.join(
            F.broadcast(uni.select(F.col("w").alias("w1"),
                                   F.col("c").alias("c1"))), "w1"
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"),
                                   F.col("c").alias("c2"))), "w2"
        )
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1", "w2", "c12",
            F.round(
                (F.col("c12") * F.col("_nu") * F.col("_nu"))
                .cast("double")
                / (F.col("_nb") * F.col("c1") * F.col("c2"))
                .cast("double"),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "w1", "w2"
    ).limit(20)


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking over the corpus: rolling-hash (3-word
    context, low-4-bits-zero) boundaries, ~16-word expected chunks.
    Boundaries depend only on local content, so near-dup docs share
    almost all chunk hashes — the chunk-level-dedup / delta-storage
    layout (FastCDC/LBFS idea, stateless word-level variant). The md5
    window hash and chunk hash reproduce exactly in SQL."""
    docs = read_documents(spark, sf_dir)
    return textf.cdc_chunks(docs, window=3, mask_bits=4).select(
        "doc_id", "chunk_idx", "start_word", "n_words", "chunk_hash"
    )


def q_kmeans_quality_profile(spark, sf_dir):
    """Cross-modal composition: the reproducible k-means clusters over
    the EMBEDDINGS corpus joined back to the DOCUMENTS table (vec_id ==
    doc_id in the fixtures) and profiled — per-cluster doc counts,
    exact character totals, distinct languages. Shows the clustering
    output composing with relational ops in one plan; the oracle reuses
    the full unrolled k-means chain with a profiling final SELECT."""
    emb = read_embeddings(spark, sf_dir)
    docs = read_documents(spark, sf_dir)
    assigned, _ = similarity.kmeans_quantized(emb, k=8, n_iter=3)
    return (
        assigned.join(docs, assigned["vec_id"] == docs["doc_id"])
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .orderBy("cluster")
    )


def q_graph_summary(spark, sf_dir):
    """Catalog/observability surface: per-label cardinalities and edge
    endpoint fan-out in ONE pass over each table — the stats a planner
    or a capacity review reads first. Kind is 'node' or 'edge'; edge
    rows carry distinct src/dst counts (fan-out shape), node rows leave
    them NULL."""
    g = _g(spark, sf_dir)
    nodes = g.nodes.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(None).cast("bigint").alias("n_src"),
        F.lit(None).cast("bigint").alias("n_dst"),
    ).withColumn("kind", F.lit("node"))
    edges = g.edges.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("src").alias("n_src"),
        F.count_distinct("dst").alias("n_dst"),
    ).withColumn("kind", F.lit("edge"))
    return nodes.unionByName(edges).select(
        "kind", "label", "n_rows", "n_src", "n_dst"
    ).orderBy("kind", "label")


def q_kmeans_embeddings(spark, sf_dir):
    """Bit-reproducible k-means (k=8, 3 Lloyd iterations) over the
    embeddings corpus on the 1e-6 integer grid — every distance an exact
    int64 sum of squares, so clustering (and the exact per-cluster
    inertia) is identical across engines, partitionings, and summation
    orders; oracled against a fully unrolled SQL replica. The trainer
    that completes similarity.ivf_assignments' seed quantizer."""
    emb = read_embeddings(spark, sf_dir)
    assigned, _ = similarity.kmeans_quantized(emb, k=8, n_iter=3)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("d2").alias("inertia"),
            F.min("vec_id").alias("min_member"),
        )
        .orderBy("cluster")
    )


def q_semantic_prune(spark, sf_dir):
    """SemDeDup-style semantic dedup over the embeddings corpus
    (similarity.semantic_prune): the bit-reproducible k-means clusters
    bound the quadratic, then within each cluster any vector with a
    lower-id cluster-mate at cosine >= 9/20 is pruned. The decision is
    all-integer on the 1e-6 grid (den²·dot² vs num²·|u|²·|v|² in
    decimal(38,0) / HUGEINT), so survivors hash-match the unrolled
    SQL replica exactly — no float threshold boundary anywhere."""
    emb = read_embeddings(spark, sf_dir)
    return similarity.semantic_prune(
        emb, k=8, n_iter=3, threshold_num=9, threshold_den=20
    ).orderBy("vec_id")


def q_coreness_parts(spark, sf_dir):
    """FULL core decomposition of the part co-order graph — every
    vertex's core number in one run (analytics.coreness, h-index
    iteration) instead of kcore's single-k membership; fixpoint in 10
    rounds at sf0.001 / 19 at sf0.01, oracled against a 24-round
    unrolled SQL replica (monotone non-increasing, so the tail rounds
    are no-ops). coreness(v) >= k  <=>  v in kcore(k) — pytest-pinned
    against the kcore operator."""
    return analytics.coreness(_coorder_pairs(spark, sf_dir)).orderBy("id")


def q_eccentricity_parts(spark, sf_dir):
    """Per-landmark bounded eccentricity on the part co-order graph:
    max hop distance and reached-set size within depth 3 from each of
    the 8 landmark BFS sources (the max over landmarks is the standard
    sampled diameter LOWER bound). Reuses the concurrent landmark-BFS
    substrate; oracle = the same recursive BFS with MAX/COUNT."""
    d = analytics.landmark_hop_distances(
        _coorder_pairs(spark, sf_dir), landmarks=8, max_depth=3
    )
    return (
        d.groupBy("landmark")
        .agg(
            F.max("dist").alias("eccentricity_lb"),
            F.count(F.lit(1)).alias("n_reached"),
        )
        .orderBy("landmark")
    )


def q_harmonic_parts(spark, sf_dir):
    """Sampled harmonic centrality on the part co-order graph: hop
    distances from the 8 lowest part ids (landmark BFS, depth ≤ 3 — the
    Eppstein-Wang sampled-centrality estimator), harmonic score =
    Σ 1/dist over reached landmarks. Top-20 by ROUNDED score then id, so
    the cross-engine sort never depends on sub-ulp float differences."""
    d = analytics.landmark_hop_distances(
        _coorder_pairs(spark, sf_dir), landmarks=8, max_depth=3
    )
    return (
        d.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias(
                "harmonic"
            ),
            F.count(F.lit(1)).alias("n_reached"),
        )
        .orderBy(F.col("harmonic").desc(), "id")
        .limit(20)
    )


def q_closeness_parts(spark, sf_dir):
    """Sampled closeness centrality on the part co-order graph — the
    third estimator off the same landmark-BFS substrate as harmonic and
    eccentricity (Eppstein-Wang 2001): closeness(v) = n_landmarks_reached
    / Σ dist(landmark, v), i.e. the reciprocal of the mean sampled
    distance. Both numerator and denominator are exact integers; only
    the final ratio is floating point (one IEEE divide, identical in
    both engines, rounded to 6 dp). Top-20 by ROUNDED score then id so
    the cross-engine sort never depends on sub-ulp float differences."""
    d = analytics.landmark_hop_distances(
        _coorder_pairs(spark, sf_dir), landmarks=8, max_depth=3
    )
    return (
        d.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.round(
                F.count(F.lit(1)) / F.sum("dist"), 6
            ).alias("closeness"),
            F.sum("dist").cast("bigint").alias("sum_dist"),
            F.count(F.lit(1)).alias("n_reached"),
        )
        .orderBy(F.col("closeness").desc(), "id")
        .limit(20)
    )


# ===========================================================================
# §2.7 relational surface (free from Spark — windows, rollup, set ops,
# top-k; the reference has none of these, SURVEY.md §2.7, so Spark
# semantics are adopted wholesale and oracle-checked)
# ===========================================================================

def q_window_rank_customers(spark, sf_dir):
    """Top-3 customers by total spent per nation — window function over the
    placed/located_in graph."""
    from pyspark.sql import Window

    g = _g(spark, sf_dir)
    spent = (
        g.edges.where(F.col("label") == "placed")
        .groupBy(F.col("src").alias("customer_id"))
        .agg(
            F.sum(F.col("totalprice").cast("decimal(30,2)"))
            .cast("double")
            .alias("total_spent")
        )
    )
    loc = g.edges.where(
        (F.col("label") == "located_in")
        & (F.col("src") >= CUSTOMER_BASE)
        & (F.col("src") < 3_000_000)
    ).select(F.col("src").alias("customer_id"), F.col("dst").alias("nation_id"))
    w = Window.partitionBy("nation_id").orderBy(
        F.col("total_spent").desc(), F.col("customer_id")
    )
    return (
        spent.join(loc, "customer_id")
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("nation_id", "customer_id", "total_spent", "rnk")
    )


def q_rollup_order_stats(spark, sf_dir):
    """ROLLUP (status, priority) over order nodes — grouping-set totals."""
    g = _g(spark, sf_dir)
    orders = g.nodes.where(F.col("label") == "order")
    return orders.rollup("status", "priority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("totalprice").cast("decimal(30,2)"))
        .cast("double")
        .alias("total"),
    )


def q_set_ops_customers(spark, sf_dir):
    """Set operations: (BUILDING ∪ MACHINERY) ∖ MACHINERY over node-id
    sets — union/except on graph scans (≡ BUILDING; checked exactly)."""
    g = _g(spark, sf_dir)
    building = scan.get_nodes(
        g, "customer", {"mktsegment": "BUILDING"}
    ).select("id")
    machinery = scan.get_nodes(
        g, "customer", {"mktsegment": "MACHINERY"}
    ).select("id")
    return (
        building.union(machinery)
        .distinct()
        .exceptAll(machinery)
        .select(F.col("id").alias("customer_id"))
    )


def q_topk_orders(spark, sf_dir):
    """Global top-10 orders by totalprice (TakeOrdered, tie-broken by id)."""
    g = _g(spark, sf_dir)
    return (
        g.nodes.where(F.col("label") == "order")
        .orderBy(F.col("totalprice").desc(), F.col("id"))
        .limit(10)
        .select("id", "totalprice", "status")
    )


# ===========================================================================
# §2.9 LLM pack
# ===========================================================================

def q_dedup_exact(spark, sf_dir):
    docs = read_documents(spark, sf_dir)
    return dedup.exact_dedup(docs)


def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup pairs at token granularity, threshold 0.9.
    Exact-verified candidates; at 64 perms × 16 bands the miss probability
    at j=0.9 is ~4e-8, so the exact all-pairs oracle matches."""
    docs = read_documents(spark, sf_dir)
    return dedup.minhash_dedup_pairs(
        docs, threshold=0.9, num_perm=64, bands=16, shingle_n=1
    ).select("a_id", "b_id")


def q_dedup_minhash_keep(spark, sf_dir):
    """Cluster-representative near-dup dedup (the scale path: star
    candidates + connected components — no quadratic pair emission).
    Oracled against DuckDB: exact all-pairs Jaccard ≥ 0.9 → recursive-CTE
    transitive closure → min-id per component. Pairs-linkage components are
    exact w.r.t. the candidate set, and LSH recall is 100% here
    (dedup_minhash matches the same exact pair set), so equality holds."""
    docs = read_documents(spark, sf_dir)
    return dedup.minhash_dedup_keep(docs, threshold=0.9, linkage="pairs")


def q_dedup_minhash_keep_best(spark, sf_dir):
    """Quality-aware near-dup keep: same pairs-linkage clusters as
    dedup_minhash_keep, but the survivor is the member with the MOST
    CHARACTERS (min id on ties) — 'keep the most complete version', the
    usual curation policy. Oracle: the same recursive-CTE transitive
    closure, survivor picked per component by (n_chars DESC, doc_id)."""
    docs = read_documents(spark, sf_dir)
    return dedup.minhash_dedup_keep(
        docs, threshold=0.9, linkage="pairs",
        keep="max_score", score_col="n_chars",
    )


def q_dedup_minhash_keep_star(spark, sf_dir):
    """Star-linkage keep (O(docs × bands) candidates — the adversarial-
    cluster-scale path) on a PLANTED provable fixture, making the one
    formerly rows-only entry oracle-EXACT (VERDICT r10 #3).

    The planted corpus derives deterministically from the fixture ids:
    every doc_id spawns 10 synthetic docs (ids 10·doc_id+k), cluster
    c = ⌊√id⌋, and every member of cluster c carries the IDENTICAL
    20-token text "w(64c) … w(64c+19)" — so clusters are pure
    exact-duplicate families with DISJOINT cross-cluster token sets
    (64-spacing > 20 tokens ⇒ cross-cluster Jaccard is exactly 0).
    On such a corpus star linkage is provably exact: identical texts
    have identical signatures, so every cluster shares one bucket per
    band, the bucket rep is the cluster min id (cross-cluster
    collisions would need a 64-bit token-hash collision — the same
    determinism class as the LSH-recall-100% assumption the
    dedup_minhash oracle already rests on), and every star edge
    verifies at Jaccard 1.0 while any collision edge fails at 0.
    Survivors = min id per cluster = the perfect squares — a one-line
    GROUP BY oracle. The √-sized clusters are heavy-tailed (sizes
    1..~893 at sf0.1): the big-cluster regime where pairs linkage
    emits ~400k pairs but star emits |cluster|×bands ≈ 14k — the
    adversarial-scale behavior this linkage exists for, now measured
    on a fixture where its answer is provable."""
    ids = read_documents(spark, sf_dir).select("doc_id")
    synth = ids.select(
        F.explode(
            F.sequence(
                F.col("doc_id") * 10, F.col("doc_id") * 10 + 9
            )
        ).alias("doc_id")
    )
    cluster = F.floor(F.sqrt(F.col("doc_id"))).cast("bigint")
    planted = synth.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(19)),
                lambda j: F.concat(
                    F.lit("w"), (cluster * 64 + j).cast("string")
                ),
            ),
            " ",
        ).alias("text"),
    )
    return dedup.minhash_dedup_keep(
        planted, threshold=0.9, linkage="star"
    ).orderBy("doc_id")


def q_dedup_jaccard(spark, sf_dir):
    """Exact within-bucket (lang, source) token-set Jaccard ≥ 0.8 pairs."""
    docs = read_documents(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(docs, threshold=0.8).select(
        "a_id", "b_id"
    )


def q_dedup_containment(spark, sf_dir):
    """Directed containment pairs C(a→b) = |Sₐ∩S_b|/|Sₐ| ≥ 0.8
    (dedup.containment_join): the asymmetric near-superset mode Jaccard
    structurally misses (a short doc quoted whole inside a long one has
    C = 1.0, J ≈ |Sₐ|/|S_b|). Candidates via the containment-adapted
    prefix filter — a's rarest |Sₐ|-⌈t|Sₐ|⌉+1 tokens joined against the
    full posting index — then exact hashed-set verify; integer-exact
    output (n_a, n_common), no all-pairs step. The oracle is the
    quadratic all-ordered-pairs ground truth the prefix filter must
    reproduce losslessly."""
    docs = read_documents(spark, sf_dir)
    return dedup.containment_join(docs, threshold=0.8, shingle_n=3).select(
        "a_id",
        "b_id",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_common").cast("long").alias("n_common"),
    )


def q_dedup_containment_prune(spark, sf_dir):
    """Subset pruning (dedup.containment_prune): documents >= 0.8
    contained in a dominating doc (strictly larger shingle set, or
    equal-size with smaller id) are dropped; maximal docs survive.
    One-shot dominance — order-free and unique, so the quadratic oracle
    reproduces it with a NOT EXISTS anti-join."""
    docs = read_documents(spark, sf_dir)
    return dedup.containment_prune(
        docs, threshold=0.8, shingle_n=3
    ).select("doc_id", "source", "n_chars")


def q_corpus_diff(spark, sf_dir):
    """Crawl-over-crawl delta (textf.corpus_diff): v2 derives from the
    fixture deterministically (doc_id % 97 == 0 dropped, % 101 == 0
    rewritten, 900k-block added), and the diff classifies every id via
    sha2 digests through one full-outer equi-join — content never
    shuffles. Oracle replays the same id arithmetic relationally."""
    docs = read_documents(spark, sf_dir)
    v2 = (
        docs.where(F.col("doc_id") % 97 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 101 == 0,
                F.concat(F.col("text"), F.lit(" [revised]")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.limit(0).unionByName(
                docs.sparkSession.createDataFrame(
                    [(900001, "brand new page", "en", "crawl2", 14)],
                    docs.schema,
                )
            )
        )
    )
    return textf.corpus_diff(docs, v2)


def q_source_overlap(spark, sf_dir):
    """Cross-source 3-gram overlap matrix (textf.source_overlap): exact
    distinct-shingle intersections per source pair (a < b), the corpus-
    composition diagnostic before mixture weighting. One distinct agg +
    a shingle-keyed self-join whose posting lists are bounded by the
    source count; zero-overlap pairs are absent by construction (inner
    join) on both sides."""
    docs = read_documents(spark, sf_dir)
    return textf.source_overlap(docs, shingle_n=3).select(
        "a",
        "b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_common").cast("long").alias("n_common"),
    )


def q_doc_novelty(spark, sf_dir):
    """Per-doc novelty vs everything before it (textf.doc_novelty): how
    many of the doc's distinct 3-gram shingles first occur HERE (min
    doc_id per shingle — the vocab_growth first-occurrence decomposition
    at per-doc granularity). The no-pairwise redundancy signal for
    continuous ingest; integer-exact (n_shingles, n_novel)."""
    docs = read_documents(spark, sf_dir)
    return textf.doc_novelty(docs, shingle_n=3).select(
        "id", "n_shingles", F.col("n_novel").cast("long").alias("n_novel")
    )


def q_distinctive_terms(spark, sf_dir):
    """Per-doc top-3 distinctive terms (search.distinctive_terms):
    keyword extraction by lexicographic (tf DESC, doc-freq ASC, term)
    rank — monotone in tf·idf for any decreasing idf but integer-exact
    (no ln()). Two map-side-combinable aggs + a term equi-join + a
    per-doc window bounded by document length."""
    docs = read_documents(spark, sf_dir)
    return searchf.distinctive_terms(docs, k=3)


def q_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth curve (search.vocab_growth): cum
    tokens vs cum distinct types per 50-doc id bucket. Running distinct
    decomposes exactly into new-type-at-first-occurrence (min id per
    term), so the heavy aggs are distributed and the ordered cumsum
    runs over the 10-row bucket frame only."""
    docs = read_documents(spark, sf_dir)
    return searchf.vocab_growth(docs, step=50)


def q_quantile_filter_docs(spark, sf_dir):
    """Per-source top-quartile gate (textf.quantile_filter): keep docs
    with n_chars at or above their source's exact discrete p75 — the
    rank-based threshold (smallest value whose at-or-below count reaches
    ceil(0.75·n), integer permille) so the cut is an observed value,
    float-rule-free. Ordered window only over per-source distinct
    values; thresholds broadcast into the filter join."""
    docs = read_documents(spark, sf_dir)
    return textf.quantile_filter(docs, col="n_chars", q=0.75).select(
        "doc_id", "source", "n_chars"
    )


def q_bpe_pair_counts(spark, sf_dir):
    """First BPE tokenizer-training merge (textf.bpe_pair_counts):
    corpus-wide adjacent-character-pair frequencies within words, top-20
    by (count desc, pair). One explode + one map-side-combinable count —
    the word-count shuffle shape; the grouped state is the pair
    vocabulary, not the corpus."""
    docs = read_documents(spark, sf_dir)
    return textf.bpe_pair_counts(docs, top_k=20)


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprint sets (textf.winnow_fingerprints — the MOSS
    algorithm): per-document distinct window-min 4-shingle hashes with
    window w=5, md5 hash family so DuckDB reproduces both the values
    and the MIN ordering. One explode + one per-doc window (a single
    shuffle on doc_id) + distinct."""
    docs = read_documents(spark, sf_dir)
    return textf.winnow_fingerprints(
        docs, k=4, w=5, hash_family="md5"
    )


def q_winnow_pairs(spark, sf_dir):
    """Content-overlap report (textf.winnow_pairs): document pairs
    sharing >= 2 winnowed fingerprints, via a posting-list self-join on
    fp_hash with stop-fingerprints (postings > 100 docs) dropped first —
    the MOSS near-dup report, robust to local edits and reordering where
    exact-dup hashing is not. The oracle replays selection, cap, and
    join exactly."""
    docs = read_documents(spark, sf_dir)
    return textf.winnow_pairs(
        docs, k=4, w=5, min_shared=2, max_postings=100,
        hash_family="md5",
    )


def q_ngram_diversity(spark, sf_dir):
    """Corpus diversity profile (textf.ngram_diversity): per-language
    distinct/total n-gram ratios for n = 1, 2, 3 — the repetitiveness /
    template-spam dashboard. Three word-count-shaped aggregations
    unioned; grouped state is the n-gram vocabulary."""
    docs = read_documents(spark, sf_dir)
    return textf.ngram_diversity(docs, ns=(1, 2, 3)).orderBy("lang", "n")


def q_blocklist_report(spark, sf_dir):
    """Blocklist impact report (textf.blocklist_report): per-term
    document frequencies for a 5-term blocklist (one term deliberately
    absent from the corpus — the zero row proves the left join), plus
    textf.blocklist_filter survivor count as a __survivors__ row.
    Explode-distinct-tokens + broadcast semi-join + count."""
    terms = ["join", "window", "stream", "quantum", "zz_absent"]
    docs = read_documents(spark, sf_dir)
    rep = textf.blocklist_report(docs, terms)
    surv = textf.blocklist_filter(docs, terms).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).select(F.lit("__survivors__").alias("term"), "n_docs")
    return rep.unionByName(surv).orderBy("term")


def q_split_leakage_report(spark, sf_dir):
    """Train/eval leakage audit: near-duplicate pairs (MinHash-LSH,
    threshold 0.9 — the same verified pair set dedup_minhash certifies)
    joined against the deterministic md5 hash split, counted per
    normalized split pair. The within/cross breakdown is THE number a
    training pipeline must drive to zero before freezing a holdout —
    eval docs with a train near-twin leak memorized content into the
    metric. Composition of two certified operators; one extra broadcast
    join each side of the pair."""
    docs = read_documents(spark, sf_dir)
    split = textf.hash_split(docs, "doc_id", 90, hash_family="md5").select(
        "doc_id", "split"
    )
    pairs = dedup.minhash_dedup_pairs(
        docs, threshold=0.9, num_perm=64, bands=16, shingle_n=1
    ).select("a_id", "b_id")
    j = pairs.join(
        split.select(F.col("doc_id").alias("a_id"), F.col("split").alias("sa")),
        "a_id",
    ).join(
        split.select(F.col("doc_id").alias("b_id"), F.col("split").alias("sb")),
        "b_id",
    )
    return (
        j.select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def q_corpus_drift_tvd(spark, sf_dir):
    """Per-source distribution drift vs the rest of the corpus: exact
    total-variation distance over 64-char-binned document lengths
    (functions/profile.py drift_tvd — integer numerator via the common
    denominator, one IEEE divide at the end). The slice-vs-corpus gate a
    crawl pipeline runs per ingest source."""
    from akka_graph_db_spark.functions import profile

    return profile.drift_tvd(
        read_documents(spark, sf_dir), "source", "n_chars", 64
    ).orderBy("source")


def q_knn_components(spark, sf_dir):
    """Embedding clustering through the GRAPH machinery: build the
    MUTUAL k-nearest-neighbor graph (k=2, exact cosine, ties broken by
    id — the same brute-force ranking similarity_topk certifies; an edge
    survives only if EACH endpoint ranks the other in its top-k, the
    standard noise-robust variant — a plain 3-NN graph fuses 87% of this
    corpus into one blob, mutual 2-NN yields ~190 tight clusters), then
    run min-id connected components over the pair frame (components
    are tiny — max 14 members — so propagation converges in a handful of
    broadcast-gated rounds); report
    per-cluster size and label diversity. The kNN-graph→CC composition
    is the standard agglomerative step of embedding-dedup pipelines
    (SemDeDup et al. cluster first for the same reason). Scale path:
    build the kNN edges per IVF cell / LSH bucket with the same numpy
    scoring kernel (similarity.knn_graph raises past its broadcast gate); the CC harness is the exchange-
    free superstep loop the dedup keep family already runs at scale; the
    mutuality filter is one self-semi-join on the (small) kNN edge list."""
    emb = read_embeddings(spark, sf_dir)
    knn = similarity.knn_graph(emb, k=2).select("a", "b")
    knn = knn.localCheckpoint(eager=True)  # scored once, joined twice
    pairs = knn.join(
        knn.select(F.col("b").alias("a"), F.col("a").alias("b")),
        ["a", "b"],
        "left_semi",
    )
    verts = emb.select(F.col("vec_id").alias("id"))
    comp = analytics.connected_components_from_pairs(verts, pairs)
    return (
        comp.join(
            read_embeddings(spark, sf_dir).select(
                F.col("vec_id").alias("id"), "label"
            ),
            "id",
        )
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("label").alias("n_labels"),
        )
        .orderBy("component")
    )


def q_lexical_diversity(spark, sf_dir):
    """Per-document Simpson lexical diversity 1 − Σ(tf/n)² — the
    repetition-robust cousin of type-token ratio — computed as EXACT
    integers (simpson_num = n² − Σ tf², one IEEE divide rounded to 6 dp;
    no entropy/log, so it is hash-verifiable). One explode + two
    aggregations; empty documents drop out (no tokens to score)."""
    return textf.lexical_diversity(read_documents(spark, sf_dir)).orderBy(
        "doc_id"
    )


def q_profile_orders(spark, sf_dir):
    """Exact dataset profile of the orders table
    (profile.profile_columns): per-column (n_rows, n_nulls, n_distinct)
    in ONE aggregation pass (multi-count-distinct via Spark's Expand +
    two-phase agg), pivoted to one row per column by a literal-array
    explode."""
    from akka_graph_db_spark.functions.profile import profile_columns

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return profile_columns(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).orderBy("column")


def q_rich_club_parts(spark, sf_dir):
    """Rich-club coefficient of the part co-order graph at k = 16, 32,
    64, 96 (analytics.rich_club): how densely the high-degree parts
    co-occur with EACH OTHER — integer node/edge counts per k off one
    conditional aggregate, one exact division each. The connectivity
    complement of assortativity_coorder on the same derived graph."""
    return analytics.rich_club(
        _coorder_pairs(spark, sf_dir), ks=(16, 32, 64, 96)
    ).orderBy("k")


def q_set_similarity_join(spark, sf_dir):
    """EXACT all-pairs 3-gram Jaccard >= 0.8 via prefix filtering
    (dedup.set_similarity_join, PPJoin family): candidates come from an
    equi-join of each doc's globally-RAREST shingles (prefix length
    n - ceil(0.8 n) + 1 — a provably lossless filter), then exact
    verification. The deterministic-recall sibling of dedup_minhash:
    same answer contract as a brute-force similarity join, no LSH
    banding misses, candidate volume bounded by rare-token posting
    lists. Oracle: the brute-force share-a-shingle join — the engine
    must reproduce it EXACTLY, which is the whole point of the
    operator."""
    docs = read_documents(spark, sf_dir)
    return (
        dedup.set_similarity_join(
            docs, threshold=0.8, shingle_n=3
        )
        .orderBy("a_id", "b_id")
    )


def q_dedup_keep_source(spark, sf_dir):
    """Near-dup dedup keeping the copy from the MOST-PREFERRED SOURCE
    (lowest srcN index; doc_id ties) — the multi-corpus merge policy
    ('prefer the curated dump over the web crawl'). Exercises the
    NON-text-derived score path of the keep-policy-aware collapse.
    Routed through minhash_dedup_keep_multi with a single policy
    (VERDICT r6 #2: the end-to-end minhash_dedup_keep call re-ran the
    shingle+signature+band+verify pipeline, 36.3s at sf0.1; the multi
    path's collapsed-representative clustering is pytest-pinned equal
    per policy). Oracle: the recursive-closure components with the same
    (source priority, doc_id) survivor sort."""
    docs = read_documents(spark, sf_dir).withColumn(
        "_prio",
        -F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int"),
    )
    return dedup.minhash_dedup_keep_multi(
        docs, policies={"keep_source": "_prio"}, threshold=0.9,
    ).select("doc_id")


def q_dedup_policy_sweep(spark, sf_dir):
    """Three keep policies off ONE clustering
    (dedup.minhash_dedup_keep_multi): the near-dup component structure
    is a pure function of the texts, so the collapse + band join +
    verify + connected components run ONCE and min_id / max-n_chars /
    source-priority keeps are each a per-component argmax (VERDICT r5
    #4 — the keep family previously recomputed the whole pipeline per
    policy; measured 91.8s -> ~35s at sf0.1 vs per-policy sketch
    reuse). Output is one row per policy with the survivor count and
    exact id-sum, so the hash check certifies all three survivor SETS
    against the shared recursive-closure oracle."""
    docs = read_documents(spark, sf_dir).withColumn(
        "_prio",
        -F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int"),
    )
    surv = dedup.minhash_dedup_keep_multi(
        docs,
        policies={
            "keep_best": "n_chars",
            "keep_source": "_prio",
            "min_id": None,
        },
        threshold=0.9,
    )
    return (
        surv.groupBy("policy")
        .agg(
            F.count(F.lit(1)).alias("n_survivors"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("policy")
    )


def q_curriculum_shards(spark, sf_dir):
    """Quality-curriculum sharding: globally rank the corpus by the
    composite quality score (DISTRIBUTED ranking — global_rank's
    range-repartition + per-partition offsets, never a single-partition
    window), cut the (score desc, doc_id) total order into 4 equal
    shards by integer rank arithmetic, and report per-shard size and
    exact stats — the 'sort by quality, train easy-to-hard' layout."""
    from akka_graph_db_spark.functions.ranking import global_rank

    docs = read_documents(spark, sf_dir)
    scored = textf.quality_features(docs)
    ranked = global_rank(
        scored,
        [F.col("quality_score").desc(), F.col("doc_id")],
        rank_col="_rnk",
    )
    n = ranked.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            "shard",
            F.expr("CAST((_rnk - 1) * 4 DIV _n AS BIGINT) + 1"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.min("quality_score"), 6).alias("min_quality"),
            F.round(F.max("quality_score"), 6).alias("max_quality"),
        )
        .orderBy("shard")
    )


def q_dedup_exact_spans(spark, sf_dir):
    """Exact duplicated-span removal (word-granular ExactSubstr): every
    8-gram of words appearing in >= 2 distinct documents is deleted from
    ALL documents (boilerplate-removal semantics); the cleaned text plus
    per-doc coverage counts come back for the whole corpus. Grams travel
    as md5_64 digests so the count shuffle moves 8-byte keys; the oracle
    rebuilds the identical digest via md5_number_upper."""
    docs = read_documents(spark, sf_dir)
    return dedup.exact_span_dedup(
        docs, ngram_n=8, min_docs=2
    ).select("doc_id", "n_words", "n_dup_words", "clean_text")


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dups, Hamming ≤ 3 via 4-chunk pigeonhole buckets.
    Pigeonhole is COMPLETE for ≤ n_chunks-1 flips, so the bucketed result
    equals exact all-pairs — oracled against a full DuckDB SimHash rebuild
    (md5 hash family == md5_number_upper, see functions/hashing.py)."""
    docs = read_documents(spark, sf_dir)
    return dedup.simhash_dedup_pairs(
        docs, max_hamming=3, hash_family="md5"
    ).select("a_id", "b_id", "hamming")


def q_embedding_dedup(spark, sf_dir):
    """Embedding-cosine near-dup pairs: hyperplane-LSH bucket join + exact
    cosine ≥ 0.95 verify. The natural corpus has no near-dups (max pairwise
    cosine ≈ 0.51), so the query PLANTS exact copies of vec_id < 10 at
    id+100000 — identical unit vectors share every hyperplane signature,
    making LSH recall exactly 100% and the result deterministic, so the
    exact all-pairs SQL oracle applies (the cosine verify guarantees
    precision; the plant guarantees recall)."""
    emb = read_embeddings(spark, sf_dir)
    planted = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    e2 = emb.select("vec_id", "embedding").unionByName(planted)
    return dedup.embedding_dedup_pairs(e2, threshold=0.95).select(
        "a_id", "b_id"
    )


def q_similarity_topk(spark, sf_dir):
    """Brute-force cosine top-10 for 5 query vectors (exact baseline)."""
    emb = read_embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5)
    return similarity.topk_bruteforce(emb, q, k=10).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")
    )


def _plant_query_copies(emb):
    """Corpus + 10 exact copies of each query vector (vec_id < 5), planted
    at 100000 + query*100 + j. Identical vectors share every hyperplane
    signature and every IVF centroid assignment, so ANY LSH/IVF
    configuration provably finds all 10 copies; each copy scores cosine
    exactly 1.0, which outranks every natural neighbor (max natural cosine
    ≈ 0.42 at all SFs, verified), so approximate top-10 == exact top-10 ==
    the planted ids — which makes the exact-SQL oracle applicable to the
    approximate operators (the embedding_dedup_pairs construction)."""
    planted = (
        emb.where(F.col("vec_id") < 5)
        .select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("_j"),
        )
        .select(
            (F.lit(100000) + F.col("vec_id") * 100 + F.col("_j")).alias(
                "vec_id"
            ),
            "embedding",
        )
    )
    return emb.select("vec_id", "embedding").unionByName(planted)


def q_similarity_lsh(spark, sf_dir):
    """Hyperplane-LSH approximate top-10 (scale path). Oracled exactly via
    planted query copies (see _plant_query_copies); natural-corpus recall
    vs brute force is additionally asserted in pytest."""
    emb = read_embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5)
    corpus = _plant_query_copies(emb)
    return similarity.lsh_topk(corpus, q, k=10, planes=8, tables=6).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")
    )


def q_similarity_ivf(spark, sf_dir):
    """IVF-flat approximate top-10 (centroid-bucket pruning — the
    billion-vector scale path). Oracled exactly via planted query copies
    (see _plant_query_copies): copies assign to the query's own argmax
    centroid, which is always probed, so recall of the true top-10 is
    provably 100%. Natural-corpus recall asserted in pytest."""
    emb = read_embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5)
    corpus = _plant_query_copies(emb)
    return similarity.ivf_topk(
        corpus, q, k=10, n_centroids=16, n_probe=6
    ).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")
    )


def q_text_stats(spark, sf_dir):
    docs = read_documents(spark, sf_dir)
    return textf.text_stats(docs).select(
        "lang",
        "source",
        "n_docs",
        F.col("sum_chars").cast("bigint").alias("sum_chars"),
        F.col("sum_tokens").cast("bigint").alias("sum_tokens"),
        "min_doc_id",
        "max_doc_id",
    )


def q_text_quality(spark, sf_dir):
    docs = read_documents(spark, sf_dir).where(F.col("doc_id") < 50)
    return textf.quality_features(docs).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "mean_token_len",
        "punct_ratio",
        "stopword_ratio",
    )


def q_gopher_quality(spark, sf_dir):
    """Gopher composite quality rules (Rae et al. 2021 A1.1): word-count
    bounds, mean word length, symbol-per-word ratio, bullet/ellipsis line
    fractions, alpha-word fraction, stopword floor — per-doc signals plus
    the pass verdict. Every signal is a ratio of exact integer counts
    (rounded to 6), so the oracle reproduces it engine-exactly; the pass
    flag is cast to int for hash portability."""
    docs = read_documents(spark, sf_dir).where(F.col("doc_id") < 200)
    return textf.gopher_rules(docs).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_word_ratio",
        "frac_bullet_lines",
        "frac_ellipsis_lines",
        "frac_alpha_words",
        "n_gopher_stopwords",
        F.col("gopher_pass").cast("int").alias("gopher_pass"),
    )


def q_text_tokens(spark, sf_dir):
    """Token counting both ways (SURVEY §2.9): whitespace tokens and the
    BPE-ish estimate (words/digits/punct pieces at ~4 chars per subword)."""
    docs = read_documents(spark, sf_dir).where(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        textf.token_count(F.col("text")).cast("bigint").alias("n_ws_tokens"),
        textf.token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
    )


def q_lang_id(spark, sf_dir):
    docs = read_documents(spark, sf_dir)
    return (
        textf.lang_id(docs)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_fingerprint(spark, sf_dir):
    """Document fingerprints (content hash + 1-perm min-shingle hash),
    md5 hash family — value-level oracle via DuckDB md5_number_upper."""
    docs = read_documents(spark, sf_dir)
    return textf.fingerprint(docs, hash_family="md5").select(
        "doc_id", "content_hash", "min_shingle_hash"
    )


def q_asof_view_next_purchase(spark, sf_dir):
    """Forward as-of join (functions/asof.py asof_join_forward): each
    view event picks up the user's NEXT purchase at-or-after its
    timestamp — the conversion-latency primitive. Same one-shuffle
    union-merge as the backward join, running FIRST over the forward
    frame; oracle is the quadratic LEFT JOIN + QUALIFY (ts ASC)."""
    from akka_graph_db_spark.functions import asof

    ev_df = read_events(spark, sf_dir)
    views = ev_df.where(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id", "value"
    )
    purchases = ev_df.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = asof.latest_per_key_ts(
        purchases, ["user_id"], "ts", "event_id"
    )
    j = asof.asof_join_forward(
        views,
        purchases,
        "ts",
        ["user_id"],
        ["event_id", "value"],
        suffix="_next",
    )
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
        F.unix_micros(F.col("ts_next")).alias("next_ts_us"),
        F.col("event_id_next").alias("next_event_id"),
        F.col("value_next").alias("next_value"),
    )


def q_event_rate_features(spark, sf_dir):
    """Per-event rolling rate features (ev.rate_features): same-user
    event count in the preceding hour (integer-microsecond RANGE frame,
    exclusive) + gap to the previous event — the float-free feature-
    engineering primitive for ML on event streams. One shuffle on
    user_id; both windows share its ordering."""
    ev_df = read_events(spark, sf_dir)
    return ev.rate_features(ev_df, window_seconds=3600).select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "n_prev",
        "gap_us",
    )


def q_asof_purchase_click(spark, sf_dir):
    """As-of join (most-recent-prior match): each purchase event picks up
    the user's latest click at-or-before its timestamp. Spark side is the
    scalable union-merge + running-last() window (ONE shuffle on user_id,
    no inequality join — functions/asof.py); the oracle is the quadratic
    LEFT JOIN + QUALIFY formulation. Right side deduped per (user, ts) by
    max event_id so equal-timestamp ties are deterministic; timestamps
    compared as epoch micros."""
    from akka_graph_db_spark.functions import asof

    ev_df = read_events(spark, sf_dir)
    purchases = ev_df.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = ev_df.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = asof.latest_per_key_ts(clicks, ["user_id"], "ts", "event_id")
    j = asof.asof_join_backward(
        purchases,
        clicks,
        "ts",
        ["user_id"],
        ["event_id", "value"],
        suffix="_click",
    )
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
        F.unix_micros(F.col("ts_click")).alias("click_ts_us"),
        F.col("event_id_click").alias("click_event_id"),
        F.col("value_click").alias("click_value"),
    )


def q_doc_split_hash(spark, sf_dir):
    """Deterministic train/val split by key hash (reproducible across
    runs, engines, and appends — unlike random sampling). md5 family so
    DuckDB reproduces the exact membership."""
    docs = read_documents(spark, sf_dir)
    return textf.hash_split(docs, "doc_id", 90, hash_family="md5").select(
        "doc_id", "split"
    )


def q_doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (context-window prep for LLM
    training): 16-token chunks, 4-token overlap. Map-only — no shuffle;
    chunk membership and order are pure functions of the text."""
    docs = read_documents(spark, sf_dir)
    return textf.chunk_documents(docs, chunk_tokens=16, overlap=4)


def q_stratified_sample(spark, sf_dir):
    """Deterministic mixture sampling: keep 50% of en, 100% of de, 25% of
    fr by md5 key-hash bucket; es/zh dropped (explicit mixture spec).
    Membership is reproducible across engines — DuckDB recomputes it
    exactly."""
    docs = read_documents(spark, sf_dir)
    return textf.stratified_sample(
        docs,
        {"en": 0.5, "de": 1.0, "fr": 0.25},
        strata_col="lang",
        key_col="doc_id",
        hash_family="md5",
    ).select("doc_id", "lang")


def q_pack_chunks(spark, sf_dir):
    """Sequence packing on top of q_doc_chunks: 64-token context windows
    per lang shard (window cumsum over (doc_id, chunk_idx) order —
    sharded so no global single-partition sort)."""
    docs = read_documents(spark, sf_dir)
    chunks = textf.chunk_documents(docs, chunk_tokens=16, overlap=4)
    with_lang = chunks.join(docs.select("doc_id", "lang"), "doc_id")
    return textf.pack_chunks(
        with_lang,
        budget=64,
        partition_cols=("lang",),
    ).select("doc_id", "chunk_idx", "lang", "pack_id", "pack_offset")


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition filters: type-token ratio + top-bigram
    fraction per doc, computed as one fold over the sorted shingle array
    (no explode/shuffle — embarrassingly parallel)."""
    docs = read_documents(spark, sf_dir)
    return textf.repetition_features(docs).select(
        "doc_id", "distinct_token_ratio", "top_bigram_ratio"
    )


def q_quality_topk(spark, sf_dir):
    """Best-3 documents per (lang, source) by heuristic quality score —
    the per-domain curation step; one window rank over grouped scores."""
    docs = read_documents(spark, sf_dir)
    return textf.quality_topk(docs, k=3).select(
        "doc_id", "lang", "source", "quality_score"
    )


def q_contamination(spark, sf_dir):
    """Train/eval decontamination (§2.9 extension): the corpus is split
    90/10 by the md5 key hash, then every val document is scored by how
    many of its distinct 3-grams appear anywhere in the train split — the
    benchmark-leakage check of an LLM pipeline. Both sides reduce to
    distinct 64-bit gram keys before one long-keyed semi-join (no hot-key
    fan-out; the shuffle carries 8-byte keys). Counts are hash-exact, so
    the fast xxhash64 family is fine; the ratio is an integer/integer
    IEEE division — identical in DuckDB."""
    from akka_graph_db_spark.functions import decontam

    docs = textf.hash_split(
        read_documents(spark, sf_dir), "doc_id", 90, hash_family="md5"
    )
    train = docs.where(F.col("split") == "train")
    val = docs.where(F.col("split") == "val")
    return decontam.contamination(train, val, n=3).select(
        "doc_id", "n_ngrams", "n_overlap", "contamination"
    )


def q_hybrid_search(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion (search.rrf_fuse,
    Cormack et al. 2009): the BM25 top-20 for a 3-term lexical query
    fused with the exact-cosine top-20 for an embedding query (vec_id 0;
    doc_id <-> vec_id is the fixture's correspondence), score(d) =
    1/(60+rank_bm25) + 1/(60+rank_ann) over a FULL outer join — only
    RANKS enter, so no score calibration and the two-term double sum is
    bit-identical across engines. The RAG retrieval shape: lexical and
    semantic evidence without a learned reranker."""
    from akka_graph_db_spark.functions import search
    from pyspark.sql import Window

    docs = read_documents(spark, sf_dir)
    bm = search.bm25_topk(docs, ["spark", "join", "window"], k=20)
    bm_ranked = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("rank"),  # <= 20-row frame: the 1-partition window is fine
    )
    emb = read_embeddings(spark, sf_dir)
    ann = similarity.topk_bruteforce(
        emb, emb.where(F.col("vec_id") == 0), k=20
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return search.rrf_fuse(bm_ranked, ann, k=60, top_k=10).select(
        "doc_id",
        F.round("rrf_score", 6).alias("rrf_score"),
        "rank_a",
        "rank_b",
    )


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters (search.cms_sketch/cms_estimate):
    a 4x1024 fixed-memory sketch of the token stream, point-queried for
    the exact top-20 terms — (term, exact_count, cms_estimate) rows
    certify the whole sketch machinery because the hash draw is pinned
    (md5 family), making the CMS deterministic: the oracle rebuilds the
    identical counters and minima in SQL. est >= exact always; the gap
    is the surviving collision mass."""
    from akka_graph_db_spark.functions import search
    from akka_graph_db_spark.functions.text import tokens as _tokens

    docs = read_documents(spark, sf_dir)
    toks = docs.select(
        F.explode(_tokens(F.col("text"))).alias("term")
    ).localCheckpoint(eager=False)  # sketch + exact-count consumers
    sk = search.cms_sketch(toks, width=1024, depth=4)
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), "term")
        .limit(20)
    )
    est = search.cms_estimate(sk, top, width=1024, depth=4)
    return (
        top.join(est, "term")
        .select("term", "exact_count", "cms_estimate")
        .orderBy(F.col("exact_count").desc(), "term")
    )


def q_bloom_prune_report(spark, sf_dir):
    """Deterministic Bloom-filter join pruning (functions/bloom.py): build
    a 2048-bit / k=2 filter over the custkeys of 1995 URGENT orders
    (~27% of customers), probe EVERY customer through k broadcast
    semi-joins (no shuffle of the probe side), and report per-mktsegment
    counts: bloom-pass superset vs exact semi-join truth vs total. The
    md5-derived bit positions make membership decisions bit-reproducible
    in DuckDB, so the sketch itself is hash-certified — including its
    false positives (n_bloom_pass >= n_true_match, never a false
    negative). Filter deliberately undersized (m ~ 2.7x keys) so the FP
    rate is visible at certification scale."""
    from akka_graph_db_spark.functions import bloom

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    build = orders.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.year("o_orderdate") == 1995)
    )
    bits = bloom.bloom_build(build, "o_custkey", m_bits=2048, k=2)
    passed = bloom.bloom_prune(cust, "c_custkey", bits, m_bits=2048, k=2)
    truth = cust.join(
        build.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_semi",
    )

    def seg_count(df, name):
        return df.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
            F.count(F.lit(1)).alias(name)
        )

    return (
        seg_count(cust, "n_customers")
        .join(seg_count(passed, "n_bloom_pass"), "mktsegment", "left")
        .join(seg_count(truth, "n_true_match"), "mktsegment", "left")
        .select(
            "mktsegment",
            F.coalesce("n_bloom_pass", F.lit(0)).alias("n_bloom_pass"),
            "n_customers",
            F.coalesce("n_true_match", F.lit(0)).alias("n_true_match"),
        )
    )


def q_hll_distinct_events(spark, sf_dir):
    """HyperLogLog distinct count of event ids vs the exact answer —
    the fixed-memory COUNT DISTINCT for 100 TB streams (1024 registers
    regardless of input size; search.hll_sketch/hll_estimate). The hash
    draw is pinned (md5 family) and every register op is INTEGER
    (trailing zeros via bit_count, harmonic sum as exact BIGINT), so
    the sketch — and therefore the estimate, whose only float op is one
    final literal/S division — is deterministic and the oracle rebuilds
    it bit-for-bit in SQL. Raw estimator (no ln()-based small-range
    correction): accurate above ~2.5m values; the sf0.001 fixture's
    1000 ids sit below that and both sides agree on the same biased
    value, which is the point of the certification."""
    from akka_graph_db_spark.functions import search

    ev_df = read_events(spark, sf_dir)
    sk = search.hll_sketch(ev_df, "event_id", p=10)
    est = search.hll_estimate(sk, p=10)
    exact = ev_df.agg(F.countDistinct("event_id").alias("n_exact"))
    return exact.crossJoin(est).select(
        "n_exact", F.round("hll_estimate", 4).alias("hll_estimate")
    )


def q_hll_grouped_events(spark, sf_dir):
    """Per-event-type distinct-user profile in ONE pass
    (search.hll_sketch_grouped/hll_estimate_grouped): 2**10 registers
    per group, no per-group shuffle of distinct values — the 100 TB
    per-partition cardinality profile. Same pinned md5 draw as the
    global HLL, so the oracle rebuilds every group's registers and the
    per-group harmonic sums bit-for-bit."""
    from akka_graph_db_spark.functions import search

    ev_df = read_events(spark, sf_dir)
    sk = search.hll_sketch_grouped(
        ev_df, "user_id", group_cols=("event_type",), p=10
    )
    est = search.hll_estimate_grouped(sk, group_cols=("event_type",), p=10)
    exact = ev_df.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "n_exact",
        F.round("hll_estimate", 4).alias("hll_estimate"),
    )


def q_bm25_search(spark, sf_dir):
    """BM25 top-10 for a 3-term query (rational-idf variant — transcendental
    ln() is not bit-reproducible across engines; docstring in
    functions/search.py). One corpus scan; tf explodes AFTER filtering
    tokens to the query terms; corpus constants broadcast. Per-term scores
    quantize to DECIMAL(38,12) before the order-independent sum; output
    rounds to 6 dp (same headroom pattern as the PageRank oracle)."""
    from akka_graph_db_spark.functions import search

    docs = read_documents(spark, sf_dir)
    top = search.bm25_topk(docs, ["spark", "join", "window"], k=10)
    return top.select(
        "doc_id",
        F.round("score", 6).alias("score"),
        "n_query_terms_matched",
    )


def q_vocabulary(spark, sf_dir):
    """Corpus vocabulary (term/doc frequencies) — the tokenizer-building
    aggregation. Two map-side-combinable groupBys joined on term."""
    from akka_graph_db_spark.functions import search

    docs = read_documents(spark, sf_dir)
    return search.vocabulary(docs, min_count=2)


def q_redact_pii(spark, sf_dir):
    """PII scrubbing: deterministic synthetic PII (email + IPv4 + phone
    derived from doc_id) is appended to each text, then redacted by the
    fixed email→ipv4→phone regexp passes. The oracle replays the same
    RE2-compatible patterns in DuckDB. Output: per-kind match counts +
    the redacted tail (last 40 chars — proves the replacement text)."""
    docs = read_documents(spark, sf_dir)
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel +1 555-01"),
            F.format_string("%02d", (F.col("doc_id") % 100).cast("int")),
        ).alias("text"),
    )
    red = textf.redact_pii(dirty)
    return red.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.right(F.col("text_redacted"), F.lit(40)).alias("tail"),
    )


def q_label_propagation_geo(spark, sf_dir):
    """Synchronous label-propagation communities (4 fixed supersteps) over
    the geography subgraph — deterministic LPA: most-frequent neighbor
    community, ties to the smallest id, isolated nodes keep their own.
    Oracle = the same four supersteps unrolled as DuckDB CTEs over the
    identical undirected-deduped edge set."""
    g = _g(spark, sf_dir)
    lpa = analytics.label_propagation_communities(
        g, ["in_region", "located_in"], n_iter=4
    )
    geo = g.nodes.where(
        F.col("label").isin("region", "nation", "customer", "supplier")
    ).select("id")
    return lpa.join(geo, "id", "left_semi").select("id", "community")


def q_coloring_geo(spark, sf_dir):
    """Deterministic parallel graph coloring of the geography graph —
    degree-major Jones-Plassmann (operators/analytics.py
    greedy_coloring): hub-first priorities collapse the star-shaped geo
    topology in two rounds (nations first, then regions and leaves at
    once) where hash-only JP would pay ~log2(n) rounds losing to leaf
    coin-flips. Round-salted md5 tiebreaks make the coloring identical
    on any partitioning; the oracle unrolls the same rounds in SQL."""
    g = _g(spark, sf_dir)
    pairs = analytics._edge_pairs(
        g, ["in_region", "located_in"], directed=True
    )
    geo = g.nodes.where(
        F.col("label").isin("region", "nation", "customer", "supplier")
    ).select("id")
    return (
        analytics.greedy_coloring(pairs, geo)
        .select("id", F.col("color").cast("int").alias("color"))
        .orderBy("id")
    )


def q_mis_geo(spark, sf_dir):
    """Maximal independent set of the geography graph — Luby's
    symmetry-breaking primitive with round-salted md5 priorities in
    place of the RNG (operators/analytics.py maximal_independent_set),
    so the set is identical on any partitioning and reproducible by the
    unrolled SQL oracle. Isolated nodes (regions with no sampled
    nations, etc.) join trivially."""
    g = _g(spark, sf_dir)
    labels = ["in_region", "located_in"]
    pairs = analytics._edge_pairs(g, labels, directed=True)
    geo = g.nodes.where(
        F.col("label").isin("region", "nation", "customer", "supplier")
    ).select("id")
    return analytics.maximal_independent_set(pairs, geo)


def q_modularity_geo(spark, sf_dir):
    """Newman modularity Q of the LPA communities over the same
    geography edge set — the quality score that turns "we found
    communities" into a verifiable number (operators/analytics.py
    community_modularity: exact DECIMAL(38,0) moment sums, one double
    division). Oracle = the LPA CTE chain + the same integer math in
    HUGEINT."""
    g = _g(spark, sf_dir)
    labels = ["in_region", "located_in"]
    lpa = analytics.label_propagation_communities(g, labels, n_iter=4)
    pairs = analytics._edge_pairs(g, labels, directed=True)
    return analytics.community_modularity(pairs, lpa)


def q_multimodal_meta(spark, sf_dir):
    """Binary payload metadata via Arrow-batched mapInPandas — the
    multimodal plumbing (schema/batching) verified against the oracle's
    byte-level sha256/length."""
    docs = read_documents(spark, sf_dir)
    media = multimodal.documents_as_media(docs)
    return multimodal.extract_meta(media).select(
        "media_id",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "sha256",
        "sniffed_kind",
    )


def q_events_tumbling(spark, sf_dir):
    ensure_query_conf(spark)  # UTC session TZ for window-start rendering
    return ev.tumbling(read_events(spark, sf_dir), "1 hour")


def q_events_sliding(spark, sf_dir):
    ensure_query_conf(spark)
    return ev.sliding(read_events(spark, sf_dir), "1 hour", "30 minutes")


def q_events_session(spark, sf_dir):
    ensure_query_conf(spark)
    return ev.session(read_events(spark, sf_dir), "10 minutes")


def q_sessionize_events(spark, sf_dir):
    """Ordinal sessionization (ev.sessionize): gaps-and-islands with
    per-user session SEQUENCE numbers — one LAG to flag >10-min gaps,
    one running SUM to number the islands, one groupBy for per-session
    stats. Deterministic total order (ts, event_id) and integer epoch
    arithmetic, so the SQL-window oracle reproduces it exactly.
    Complements events_session (session_window), which aggregates the
    same islands but cannot produce the ordinal."""
    s = ev.sessionize(read_events(spark, sf_dir), gap_minutes=10)
    return s.select(
        "user_id",
        "session_seq",
        "n_events",
        F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "start_ts"
        ),
        F.date_format("end_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "end_ts"
        ),
        "duration_sec",
    )


def q_events_json_prop(spark, sf_dir):
    return ev.json_prop(read_events(spark, sf_dir), "k")


def q_engagement_decay(spark, sf_dir):
    """Recency-weighted user engagement: Σ value × max(0, 30 − age_days)
    per user, top 20 — LINEAR decay instead of exponential so the
    weight stays an exact integer (no exp/log: the weighted sum runs
    entirely in DECIMAL and reproduces engine-for-engine). The
    reference date is the stream's max timestamp, folded in-plan via a
    1-row broadcast cross join; age is a calendar-day diff of DATE
    casts (identical day-boundary semantics in both engines)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ref = events.agg(F.max("ts").alias("_ref"))
    w = F.greatest(
        F.lit(0),
        F.lit(30) - F.datediff(F.to_date("_ref"), F.to_date("ts")),
    )
    return (
        events.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(30,2)") * w).alias("_s"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.col("_s").desc(), "user_id")
        .limit(20)
        .select(
            "user_id",
            F.col("_s").cast("double").alias("engagement"),
            "n_events",
        )
    )


def q_events_type_stats(spark, sf_dir):
    return ev.type_value_stats(read_events(spark, sf_dir))


def q_streaming_fold(spark, sf_dir):
    """§2.6 actor-mailbox fold: a 3-batch mutation log (adds → updates →
    removes) consumed via Structured Streaming foreachBatch; returns the
    surviving probe nodes/edges with their final prop values. Oracled:
    the same fixed mutation log is folded RELATIONALLY in DuckDB (adds ⟕
    last-update ▷ removes, cascade included) — batch-vs-stream equivalence
    as SQL, per VERDICT r2 #3."""
    import os
    import tempfile

    from akka_graph_db_spark.streaming.fold import (
        MUTATION_SCHEMA,
        StreamingGraphFold,
    )

    g = _g(spark, sf_dir).core()
    log_rows = [
        (1, "add", "node", 95_000_001, "stream_probe", None, None, {"v": "1"}),
        (2, "add", "node", 95_000_002, "stream_probe", None, None, {"v": "2"}),
        (3, "add", "node", 95_000_003, "stream_probe", None, None, {"v": "3"}),
        (
            4,
            "add",
            "edge",
            96_000_001,
            "stream_edge",
            95_000_001,
            95_000_002,
            {},
        ),
        (5, "update", "node", 95_000_001, None, None, None, {"v": "10"}),
        (6, "remove", "node", 95_000_003, None, None, None, None),
    ]
    import json as _json

    tmp = tempfile.mkdtemp(prefix="fold_")
    log_dir = os.path.join(tmp, "log")
    # driver-written JSON lines (the q_streaming_store_sink pattern):
    # six fixture rows need no Spark write job
    os.makedirs(log_dir)
    cols = ("seq", "op", "kind", "id", "label", "src", "dst", "props")
    with open(os.path.join(log_dir, "00.json"), "w") as fh:
        for r in log_rows:
            fh.write(_json.dumps(dict(zip(cols, r))) + "\n")
    stream = spark.readStream.schema(MUTATION_SCHEMA).json(log_dir)
    fold = StreamingGraphFold(g)
    final = fold.run(stream, os.path.join(tmp, "ckpt"))
    probes = final.nodes.where(F.col("label") == "stream_probe")
    return probes.select(
        "id", prop_str("props", "v").alias("v")
    ).unionByName(
        final.edges.where(F.col("label") == "stream_edge").select(
            "id", F.lit("edge").alias("v")
        )
    )


def q_streaming_store_sink(spark, sf_dir):
    """§2.6 durable streaming ingest: ONE mutation stream whose two log
    files arrive as two ordered micro-batches (maxFilesPerTrigger=1,
    file order pinned by explicit mtimes — FileStreamSource takes files
    in modification-time order), folding through StreamingGraphFold with
    a store_root and store_every=1, so micro-batch A persists a BASE
    snapshot and micro-batch B an O(changes) DELTA
    (store.delta_from_graphs diff). The result is read back from DISK
    via store.load_snapshot — certifying the full chain stream →
    foreachBatch fold → versioned store → merge-on-read. n_versions
    pins the store layout (base + one delta = 2) into the hash compare.
    Oracled relationally like streaming_fold: adds ⟕ last-update ▷
    removes with node-removal cascading to incident edges.

    (r8: previously TWO sequential streaming queries — one per log —
    whose second stream-init/teardown paid ~5s of fixed cost for the
    same base+delta semantics; micro-batch boundaries within one query
    exercise the identical fold/persist path.)"""
    import json as _json
    import os
    import tempfile

    from akka_graph_db_spark import store
    from akka_graph_db_spark.streaming.fold import (
        MUTATION_SCHEMA,
        StreamingGraphFold,
    )

    g = _g(spark, sf_dir).core()
    batch_a = [
        (1, "add", "node", 97_000_001, "sink_probe", None, None, {"v": "1"}),
        (2, "add", "node", 97_000_002, "sink_probe", None, None, {"v": "2"}),
        (3, "add", "node", 97_000_003, "sink_probe", None, None, {"v": "3"}),
        (
            4,
            "add",
            "edge",
            98_000_001,
            "sink_edge",
            97_000_001,
            97_000_002,
            {},
        ),
    ]
    batch_b = [
        (5, "update", "node", 97_000_001, None, None, None, {"v": "10"}),
        (6, "remove", "node", 97_000_002, None, None, None, None),
        (7, "remove", "node", 97_000_003, None, None, None, None),
        (8, "add", "node", 97_000_004, "sink_probe", None, None, {"v": "4"}),
    ]
    tmp = tempfile.mkdtemp(prefix="sink_")
    root = os.path.join(tmp, "store")
    fold = StreamingGraphFold(
        g, store_root=root, store_every=1, compact_every=8
    )
    log_dir = os.path.join(tmp, "log")
    os.makedirs(log_dir)
    cols = ("seq", "op", "kind", "id", "label", "src", "dst", "props")
    for i, rows in enumerate((batch_a, batch_b)):
        path = os.path.join(log_dir, f"{i:02d}.json")
        with open(path, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(dict(zip(cols, r))) + "\n")
        # pin modification times one minute apart so the file source's
        # modification-time ordering is deterministic, not clock-tick luck
        os.utime(path, (1_700_000_000 + 60 * i,) * 2)
    stream = (
        spark.readStream.schema(MUTATION_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(log_dir)
    )
    fold.run(stream, os.path.join(tmp, "ckpt"))
    n_versions = len(store.list_versions(root, spark))
    final = store.load_snapshot(spark, root)
    return (
        final.nodes.where(F.col("label") == "sink_probe")
        .select("id", prop_str("props", "v").alias("v"))
        .unionByName(
            final.edges.where(F.col("label") == "sink_edge").select(
                "id", F.lit("edge").alias("v")
            )
        )
        .withColumn("n_versions", F.lit(int(n_versions)))
    )


def q_streaming_interval_join(spark, sf_dir):
    """§2.9 stream-stream interval join, batch-equivalence oracle: clicks
    and purchases run as two watermarked file streams; a purchase joins
    every click of the same user it follows within 30 minutes. The
    drained append sink must equal the batch inequality join exactly —
    all columns are copies of input rows plus an event-time lag, so the
    result is micro-batch- and order-invariant. maxFilesPerTrigger pinned
    above the file count for the same single-batch state-retention
    argument as q_streaming_dedup."""
    import os
    import tempfile
    import uuid

    from akka_graph_db_spark.streaming import windows as sw

    import pyarrow.compute as pc

    tmp = tempfile.mkdtemp(prefix="sijoin_")
    lsrc = os.path.join(tmp, "clicks")
    rsrc = os.path.join(tmp, "purchases")
    if _stage_needs_spark(f"{sf_dir}/events.parquet"):
        ev_df = read_events(spark, sf_dir)
        _stage_spark_files(
            ev_df.where(F.col("event_type") == "click").select(
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("l_ts"),
                "user_id",
            ),
            lsrc,
            n_files=2,
        )
        _stage_spark_files(
            ev_df.where(F.col("event_type") == "purchase").select(
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("r_ts"),
                "user_id",
                F.col("value").alias("purchase_value"),
            ),
            rsrc,
            n_files=2,
        )
    else:
        ev = _events_arrow(
            sf_dir, ["event_id", "ts", "user_id", "event_type", "value"]
        )
        clicks_t = ev.filter(pc.equal(ev["event_type"], "click")).select(
            ["event_id", "ts", "user_id"]
        ).rename_columns(["click_id", "l_ts", "user_id"])
        purch_t = ev.filter(pc.equal(ev["event_type"], "purchase")).select(
            ["event_id", "ts", "user_id", "value"]
        ).rename_columns(
            ["purchase_id", "r_ts", "user_id", "purchase_value"]
        )
        _stage_arrow_files(clicks_t, lsrc, n_files=2)
        _stage_arrow_files(purch_t, rsrc, n_files=2)
    clicks = (
        spark.readStream.schema(
            "click_id bigint, l_ts timestamp, user_id bigint"
        )
        .option("maxFilesPerTrigger", 1000)
        .parquet(lsrc)
    )
    purchases = (
        spark.readStream.schema(
            "purchase_id bigint, r_ts timestamp, user_id bigint, "
            "purchase_value double"
        )
        .option("maxFilesPerTrigger", 1000)
        .parquet(rsrc)
    )
    joined = sw.interval_join_stream(
        clicks,
        purchases,
        key="user_id",
        watermark="10 minutes",
        max_lag_seconds=1800,
    )
    name = f"sijoin_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        "click_id",
        "purchase_id",
        "purchase_value",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_us"),
    )


def q_streaming_dedup(spark, sf_dir):
    """§2.9 streaming dedup, batch-equivalence oracle (VERDICT r2 missing
    #3): the events table is DOUBLED (union with itself), shuffled across 4
    files, and fed through ``dropDuplicatesWithinWatermark`` as a file
    stream; the drained sink must equal the original table exactly.
    event_id is unique in the source and survivors are exact copies of the
    dropped rows, so every output column is deterministic regardless of
    micro-batching or within-partition arrival order. (Memory sink + local
    temp dir are contract-harness plumbing, not the scale path — in
    production the same plan writes to a parquet/Kafka sink.)"""
    import os
    import tempfile
    import uuid

    from akka_graph_db_spark.streaming import windows as sw

    import pyarrow as pa

    tmp = tempfile.mkdtemp(prefix="sdedup_")
    src = os.path.join(tmp, "src")
    if _stage_needs_spark(f"{sf_dir}/events.parquet"):
        ev_df = read_events(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        _stage_spark_files(ev_df.unionByName(ev_df), src, n_files=4)
    else:
        ev = _events_arrow(
            sf_dir, ["event_id", "ts", "user_id", "event_type", "value"]
        )
        _stage_arrow_files(pa.concat_tables([ev, ev]), src, n_files=4)
    # Duplicates share identical event times, so the 10-minute watermark
    # only provably retains their state if all 4 source files land in ONE
    # micro-batch. Pin that assumption explicitly instead of relying on
    # the default file-source batch size staying above the file count.
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1000)
        .parquet(src)
    )
    name = f"sdedup_{uuid.uuid4().hex[:8]}"
    q = (
        sw.dedup_stream(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "event_id", "user_id", "event_type", "value"
    )


def q_streaming_running_totals(spark, sf_dir):
    """§2.9 custom stateful operator (applyInPandasWithState),
    batch-equivalence oracle: per-user lifetime counters folded over an
    availableNow file stream must equal the batch GROUP BY. Hash-stable by
    construction: value is quantized JVM-side to integer cents
    (DECIMAL(30,2)·100 — the repo's standard order-independent money path),
    so the Python state sums are exact integers under any arrival order,
    and the final row per user is selected by max(lifetime_events), which
    is batching-invariant (update-mode sinks append one row per user per
    micro-batch)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import Window

    from akka_graph_db_spark.streaming import windows as sw

    ev_df = read_events(spark, sf_dir).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        (F.col("value").cast("decimal(30,2)") * 100)
        .cast("long")
        .alias("value"),
    )
    tmp = tempfile.mkdtemp(prefix="srun_")
    src = os.path.join(tmp, "src")
    ev_df.repartition(4).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value bigint"
    ).parquet(src)
    name = f"srun_{uuid.uuid4().hex[:8]}"
    q = (
        sw.running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    w = Window.partitionBy("user_id").orderBy(F.desc("lifetime_events"))
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            "lifetime_events",
            (F.col("lifetime_value") / F.lit(100.0)).alias("lifetime_value"),
        )
    )


def q_streaming_cms(spark, sf_dir):
    """§2.9 mergeable streaming sketch (streaming/sketch.py): a 4×1024
    count-min sketch accumulated over a 4-micro-batch event stream
    (maxFilesPerTrigger=1 forces real multi-batch merging), then
    point-queried for every event type. CMS counters ADD, so the merged
    sketch is bit-identical to the batch sketch of the same rows — the
    oracle rebuilds that batch sketch in SQL from the pinned md5 hash
    draw and takes the same row-min. Fixed-memory streaming frequency:
    state is ≤ depth×width rows regardless of stream volume."""
    import os
    import tempfile

    from akka_graph_db_spark.functions import search
    from akka_graph_db_spark.streaming.sketch import StreamingCMS

    tmp = tempfile.mkdtemp(prefix="scms_")
    src = os.path.join(tmp, "src")
    if _stage_needs_spark(f"{sf_dir}/events.parquet"):
        _stage_spark_files(
            read_events(spark, sf_dir).select(
                F.col("event_type").alias("term")
            ),
            src,
            n_files=4,
        )
    else:
        ev_t = _events_arrow(sf_dir, ["event_type"]).rename_columns(
            ["term"]
        )
        _stage_arrow_files(ev_t, src, n_files=4)
    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cms = StreamingCMS(term_col="term", width=1024, depth=4)
    sketch = cms.run(stream, os.path.join(tmp, "ckpt"))
    terms = read_events(spark, sf_dir).select(
        F.col("event_type").alias("term")
    ).distinct()
    return search.cms_estimate(sketch, terms, width=1024, depth=4)


def q_streaming_hll(spark, sf_dir):
    """§2.9 mergeable streaming HLL (streaming/sketch.py StreamingHLL):
    registers merge by per-bucket MAX across a 4-micro-batch event
    stream, so the streamed sketch is bit-identical to the batch sketch
    — the oracle is q_hll_distinct_events' register rebuild verbatim.
    Fixed-memory streaming COUNT DISTINCT: 2**p rows of state whatever
    the stream volume."""
    import os
    import tempfile

    from akka_graph_db_spark.functions import search
    from akka_graph_db_spark.streaming.sketch import StreamingHLL

    tmp = tempfile.mkdtemp(prefix="shll_")
    src = os.path.join(tmp, "src")
    if _stage_needs_spark(f"{sf_dir}/events.parquet"):
        _stage_spark_files(
            read_events(spark, sf_dir).select("event_id"), src, n_files=4
        )
    else:
        _stage_arrow_files(
            _events_arrow(sf_dir, ["event_id"]), src, n_files=4
        )
    stream = (
        spark.readStream.schema("event_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    hll = StreamingHLL(value_col="event_id", p=10)
    sketch = hll.run(stream, os.path.join(tmp, "ckpt"))
    est = search.hll_estimate(sketch, p=10)
    exact = read_events(spark, sf_dir).agg(
        F.countDistinct("event_id").alias("n_exact")
    )
    return exact.crossJoin(est).select(
        "n_exact", F.round("hll_estimate", 4).alias("hll_estimate")
    )


def _events_arrow(sf_dir, columns):
    """Events slice as a pyarrow table, honoring read_events' ts
    contract (UTC micros: nanos-fixture longs truncated by integer
    division, micros-fixture naive timestamps stamped UTC — both
    value-identical to the Spark reader under the pinned-UTC session).

    Streaming queries stage their file-stream sources from this instead
    of Spark write jobs: the sources are fixed ~2 MB fixture slices plus
    sentinel rows, and driver-side pyarrow writes replace 1-3 Spark
    jobs of single-task encode + commit overhead per query (measured
    11.0s of q_streaming_session's ~20s at sf0.1). Pure column
    slices/filters only — anything arithmetic (rounding-mode-sensitive)
    stays on the Spark writer.

    This reads the WHOLE projected table into driver memory, so every
    call site gates on :func:`_stage_needs_spark` and falls back to
    :func:`_stage_spark_files` (distributed write jobs) past the
    driver-size guard (VERDICT r12 #1).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=columns)
    if "ts" in tbl.column_names:
        ts = tbl["ts"]
        if pa.types.is_int64(ts.type):
            ts = pc.cast(
                pc.divide(ts, pa.scalar(1000, pa.int64())),
                pa.timestamp("us", tz="UTC"),
            )
        else:
            if ts.type.tz is None:
                ts = pc.assume_timezone(ts, "UTC")
            ts = pc.cast(ts, pa.timestamp("us", tz="UTC"))
        idx = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(
            idx, pa.field("ts", pa.timestamp("us", tz="UTC")), ts
        )
    return tbl


def _stage_arrow_files(tbl, src, n_files=1, base_mtime=1_600_000_000):
    """Write a pyarrow table as ``n_files`` contiguous row slices under
    ``src`` with deterministic one-minute-apart mtimes (the file
    source's modification-time ordering must never be clock-tick luck).
    Consumers are slice-invariant by construction (their docstrings
    argue micro-batch invariance); contiguous slices are MORE
    deterministic than the hash repartition this replaces."""
    import math
    import os

    import pyarrow.parquet as pq

    os.makedirs(src, exist_ok=True)
    step = max(1, math.ceil(tbl.num_rows / n_files))
    for i in range(n_files):
        part = tbl.slice(i * step, step)
        dest = os.path.join(src, f"part-{i:02d}.parquet")
        pq.write_table(part, dest)
        os.utime(dest, (base_mtime + 60 * i,) * 2)


# Driver-size guard for the pyarrow staging fast path (VERDICT r12 #1):
# _events_arrow/_stage_arrow_files read the WHOLE source into driver
# memory — fine for the ~2 MB fixture slices they exist for, a driver
# OOM at a real scale factor. Past this byte size every staging site
# falls back to distributed Spark write jobs (the pre-r12 shape).
_STAGE_DRIVER_MAX_BYTES = 256 << 20


def _stage_needs_spark(path):
    """True when ``path`` is too large for driver-side pyarrow staging
    (> $SPARK_GRAFT_STAGE_DRIVER_MAX_BYTES, default 256 MiB) and the
    staging site must use its Spark-writer fallback. The env override
    exists so tests can pin the fallback without a huge fixture."""
    import os

    limit = int(
        os.environ.get(
            "SPARK_GRAFT_STAGE_DRIVER_MAX_BYTES", _STAGE_DRIVER_MAX_BYTES
        )
    )
    return os.path.getsize(path) > limit


def _stage_spark_files(df, src, n_files=1, base_mtime=1_600_000_000):
    """Spark-writer staging fallback for sources past the driver-size
    guard: write ``df`` as ``n_files`` parquet files under ``src`` with
    the same deterministic mtime ladder as :func:`_stage_arrow_files`.
    Row-to-file assignment is round-robin instead of contiguous slices —
    every consumer is micro-batch/slice-invariant by its own docstring
    argument, so the staged STREAM result is identical."""
    import glob
    import os
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="stage_spark_")
    df.repartition(n_files).write.mode("overwrite").parquet(out)
    parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    os.makedirs(src, exist_ok=True)
    for i, p in enumerate(parts):
        dest = os.path.join(src, f"part-{i:02d}.parquet")
        shutil.move(p, dest)
        os.utime(dest, (base_mtime + 60 * i,) * 2)
    shutil.rmtree(out, ignore_errors=True)


def q_streaming_session(spark, sf_dir):
    """§2.9 streaming session windows, batch-equivalence oracle: the
    events table runs as a watermarked file stream through
    ``session_window`` and the drained append sink must equal the batch
    gaps-and-islands SQL exactly (same oracle as events_session).

    Append mode only emits a session in a micro-batch whose starting
    watermark passed the session end, so the drain is staged
    deterministically: one real-data file plus two far-future sentinel
    files (user_id = -1, +1/+2 days), pinned to one-file-per-micro-batch
    with explicit mtimes — batch 2 advances the watermark past every real
    session, batch 3 flushes them. Sentinels filter out of the result.

    The staging files are written DRIVER-SIDE with pyarrow: the source
    slice is a fixed ~2 MB fixture plus two 1-row sentinels, and the
    three coalesce(1) Spark write jobs this replaces were pure overhead
    (measured 11.0s of the query's ~20s at sf0.1 — single-task encode +
    commit per job for driver-sized data). Value-exact: the fixture
    stores ts as TIMESTAMP(MICROS) without the UTC flag; stamping the
    UTC zone onto the naive micros is exactly read_events' NTZ→LTZ cast
    under the pinned-UTC session, and max/+days sentinel arithmetic is
    integer micros both ways. (The pre-nanos fixture branch mirrors
    read_events' `ts div 1000` truncation.)"""
    import os
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from akka_graph_db_spark.streaming import windows as sw

    ensure_query_conf(spark)
    tmp = tempfile.mkdtemp(prefix="ssess_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)

    lfz = pa.timestamp("us", tz="UTC")
    sentinel_schema = pa.schema(
        [("ts", lfz), ("user_id", pa.int64()), ("value", pa.float64())]
    )
    base_mtime = 1_600_000_000
    day_us = 86_400_000_000

    def _one_file(tbl, name, mtime):
        dest = os.path.join(src, f"{name}.parquet")
        pq.write_table(tbl, dest)
        os.utime(dest, (mtime, mtime))

    if _stage_needs_spark(f"{sf_dir}/events.parquet"):
        real_df = read_events(spark, sf_dir).select(
            "ts", "user_id", "value"
        )
        max_us = real_df.agg(
            F.unix_micros(F.max("ts")).alias("m")
        ).collect()[0]["m"]
        _stage_spark_files(real_df, src, n_files=1, base_mtime=base_mtime)
    else:
        real = _events_arrow(sf_dir, ["ts", "user_id", "value"])
        max_us = pc.max(real["ts"]).cast(pa.int64()).as_py()
        _one_file(real, "00_real", base_mtime)
    # the 1-row far-future sentinels are driver-sized by definition and
    # stay pyarrow-written on both paths
    for i, days in enumerate((1, 2), start=1):
        sentinel = pa.table(
            {
                "ts": pa.array([max_us + days * day_us], pa.int64()).cast(
                    lfz
                ),
                "user_id": pa.array([-1], pa.int64()),
                "value": pa.array([0.0], pa.float64()),
            },
            schema=sentinel_schema,
        )
        _one_file(sentinel, f"0{i}_sentinel", base_mtime + 10 * i)

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"ssess_{uuid.uuid4().hex[:8]}"
    q = (
        sw.session_counts_stream(stream, "10 minutes", "10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .where(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.date_format(
                "session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# ===========================================================================
# Contract
# ===========================================================================

def _coorder_pairs(spark, sf_dir):
    """Part co-order pairs (a < b, WITH per-order multiplicity) — the
    derived graph behind the triangle / k-core / link-prediction
    analytics. NOT deduplicated here: every consumer canonicalizes via
    canonical_undirected(), whose distinct would otherwise run back to
    back with one here — two full shuffles of the pre-dedup join output
    for one dedup's work."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("b"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )


def q_hits_top20(spark, sf_dir):
    """HITS hubs & authorities, fixed 8 iterations — top-20 by
    authority, oracled against an unrolled DuckDB CTE chain
    (_hits_oracle, per-half-step normalization). The engine runs
    normalize_every=0 (final-only L1): the scalars cancel exactly in
    the math, the float drift is ~1e-15 relative, and both sides round
    to 6 decimals before hashing — while the engine halves its join
    work (each normalizer re-consumed the raw frame; VERDICT r6 #6,
    16.2s -> ~8s at sf0.1)."""
    g = _g(spark, sf_dir)
    h = analytics.hits(g, n_iter=8, normalize_every=0)
    return (
        h.orderBy(F.col("authority").desc(), F.col("id"))
        .limit(20)
        .select(
            "id",
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
    )


def q_kcore_parts(spark, sf_dir):
    """k-core (k=80) of the part co-order graph: run-to-fixpoint degree
    peeling in Spark vs a 10-round unrolled peel in DuckDB (fixpoint at
    sf0.01 is 6 rounds; extra rounds are idempotent)."""
    core = analytics.kcore(_coorder_pairs(spark, sf_dir), k=80)
    return core.select(
        "id", F.col("core_degree").cast("bigint").alias("core_degree")
    )


def q_ktruss_parts(spark, sf_dir):
    """3-truss of the RECURRENT part co-order graph (pairs co-ordered in
    >= 2 distinct orders — the weight threshold prunes one-off
    coincidences, leaving a sparse affinity graph where truss peeling
    actually bites): run-to-fixpoint triangle-support peeling in Spark
    (operators/analytics.py ktruss) vs a 6-round unrolled peel in
    DuckDB — fixpoint is 2 rounds at both sf0.001 and sf0.01, and
    peeling is monotone so the extra rounds are no-ops. Returns the
    surviving edges with their triangle support."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("b"))
    recurrent = (
        a.join(b, "l_orderkey")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count_distinct("l_orderkey").alias("_w"))
        .where(F.col("_w") >= 2)
        .select("a", "b")
    )
    t = analytics.ktruss(recurrent, k=3)
    return t.select(
        "a", "b", F.col("support").cast("bigint").alias("support")
    )


def q_degree_histogram(spark, sf_dir):
    """Log2-binned degree distribution of the full directed graph —
    the power-law diagnostic every skew strategy starts from: total
    degree per node (in + out in one two-sided aggregation), bucketed
    by floor(log2) computed as the BIT LENGTH of the integer degree
    (pure integer op — no float log), counted per bucket."""
    g = _g(spark, sf_dir)
    deg = (
        g.edges.select(F.col("src").alias("id"))
        .unionByName(g.edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # floor(log2(deg)) as length(bin(deg)) - 1 — binary digit count,
    # a pure integer/string op both engines share; no float log whose
    # rounding at exact powers of two would have to be trusted.
    bucket = (F.length(F.bin("deg")) - 1).cast("int")
    return (
        deg.select(bucket.alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("log2_bucket")
    )


def q_butterfly_count(spark, sf_dir):
    """Butterfly (2×2 biclique) count of the customer–part bipartite
    graph — THE bipartite cohesion metric (Sanei-Mehri et al., KDD
    2018): for every customer pair, C(shared_parts, 2) butterflies,
    summed exactly in integers. Wedges are generated per part with the
    same ≤100-buyer cap as customer_similarity (a part half the market
    buys contributes quadratic wedges and no cohesion signal —
    documented approximation, mirrored by the oracle). Returns one row
    (n_wedge_pairs, n_butterflies)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    cp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    pdeg = cp.groupBy("p").agg(F.count(F.lit(1)).alias("_pd"))
    kept = cp.join(
        F.broadcast(pdeg.where(F.col("_pd") <= 100).select("p")),
        "p",
        "left_semi",
    )
    w1 = kept.select("p", F.col("c").alias("c1"))
    w2 = kept.select("p", F.col("c").alias("c2"))
    pairs = (
        w1.join(w2, "p")
        .where(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    m = F.col("_m").cast("decimal(38,0)")
    # Σ m(m-1) is even; one exact decimal halving at the end (the
    # oracle's HUGEINT // 2 — never float division).
    return pairs.agg(
        F.count(F.lit(1)).alias("n_wedge_pairs"),
        (F.sum(m * (m - 1)) / 2).cast("bigint").alias("n_butterflies"),
    )


def q_customer_similarity(spark, sf_dir):
    """Top-20 most similar CUSTOMER pairs by co-purchased parts —
    link_prediction_jaccard in bipartite-projection mode: parts are
    offset into a high id band, wedge centers restricted to parts
    (capped at 100 buyers — a part half the market buys says nothing),
    and the Jaccard is over each customer's part set. The same capped
    wedge machinery, a second graph."""
    offset = 10**9
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    bip = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_partkey") + offset).alias("b"),
        )
    )
    scored = analytics.link_prediction_jaccard(
        bip,
        top_k=20,
        min_common=2,
        max_degree=100,
        endpoints_below=offset,
    )
    return scored.select(
        "a",
        "b",
        F.col("common").cast("bigint").alias("common"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_link_prediction_parts(spark, sf_dir):
    """Top-50 predicted links on the part co-order graph by Jaccard
    neighborhood overlap (non-adjacent pairs, >= 2 common neighbors),
    with the wedge-volume cap max_degree=100: only common neighbors of
    degree <= 100 are counted as evidence (hub-mediated wedges dropped —
    8.5x less wedge volume at sf0.1), while Jaccard denominators keep
    true degrees. The oracle mirrors the cap exactly, so the result is
    deterministic and hash-exact, not approximate. Integer wedge counts
    + one exact double division; ties broken by (common desc, a, b)."""
    scored = analytics.link_prediction_jaccard(
        _coorder_pairs(spark, sf_dir), top_k=50, min_common=2,
        max_degree=100,
    )
    return scored.select(
        "a",
        "b",
        F.col("common").cast("bigint").alias("common"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_link_prediction_auto(spark, sf_dir):
    """link_prediction_parts with the wedge cap DERIVED from the
    graph's own degree histogram (max_degree="auto": exact integer-rank
    p99.9 of the degree distribution, floored at 64 —
    analytics._auto_max_degree) instead of the hand-tuned 100. The
    oracle reproduces the cap derivation in SQL (per-degree histogram →
    running sum → smallest degree covering ceil(0.999·n) nodes →
    GREATEST(·, 64)), so the result stays hash-exact while the cap now
    scales with the graph.

    BENCH NOTE: the fixture's co-order graph is HUB-FREE (sf0.1 degree
    p50=119, max=222), so the derived cap (206) barely excludes anyone
    and this query pays near-full Σdeg² wedge volume (~5x the
    cap-100 row, which silently drops >half the centers — p50 > 100).
    That is the honest exact cost on a hubless graph; on the power-law
    graphs the cap exists for, p99.9 excludes the hubs that carry the
    quadratic. Since r13 the Σdeg² work runs as broadcast-CSR
    intersection inside mapInArrow below the 10M-edge gate
    (analytics._lp_intersect_scored — no wedge exchange at all;
    measured 21.1 → 11.4s isolated), and as the wedge join past it."""
    scored = analytics.link_prediction_jaccard(
        _coorder_pairs(spark, sf_dir), top_k=50, min_common=2,
        max_degree="auto",
    )
    return scored.select(
        "a",
        "b",
        F.col("common").cast("bigint").alias("common"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_temporal_triples(spark, sf_dir):
    """Temporal ordered-motif census (Paranjape et al., WSDM'17 shape):
    per user, the number of click→view→purchase triples with strictly
    increasing timestamps spanning under one day. Decomposed into two
    prefix counts off the click curve + one bucketed interval join (see
    functions/events.py ordered_triples) — the oracle is the naive cubic
    join, fine at sf0.01, while the engine never enumerates triples."""
    return ev.ordered_triples(
        read_events(spark, sf_dir),
        stages=("click", "view", "purchase"),
        window_seconds=86400,
    ).orderBy("user_id")


def q_retrieval_eval_bm25(spark, sf_dir):
    """Retrieval-quality evaluation loop: five fixed documents with
    known near-duplicate partners (ids 1/5/8/11/12 — partnered at every
    SF) act as more-like-this queries (their own distinct tokens are the query
    terms, self-hit excluded), ranked by multi-query BM25 in ONE corpus
    scan, and graded against near-duplicate truth (the MinHash pair set
    dedup_minhash certifies): reciprocal rank of the first relevant hit,
    relevant-in-top-10, recall@10. Queries with no near-dup partners
    report NULL metrics — an index can't be graded on an empty truth
    set. Integer counts + two IEEE divides, hash-exact."""
    from akka_graph_db_spark.functions import search

    docs = read_documents(spark, sf_dir)
    qterms = (
        docs.where(F.col("doc_id").isin(1, 5, 8, 11, 12))
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array_distinct(textf.tokens(F.col("text")))
            ).alias("term"),
        )
    )
    ranked = search.bm25_topk_multi(docs, qterms, k=10, exclude_self=True)
    pairs = dedup.minhash_dedup_pairs(
        docs, threshold=0.9, num_perm=64, bands=16, shingle_n=1
    )
    rel = (
        pairs.where(F.col("a_id").isin(1, 5, 8, 11, 12))
        .select(F.col("a_id").alias("query_id"), F.col("b_id").alias("doc_id"))
        .unionByName(
            pairs.where(F.col("b_id").isin(1, 5, 8, 11, 12)).select(
                F.col("b_id").alias("query_id"),
                F.col("a_id").alias("doc_id"),
            )
        )
    )
    return search.retrieval_eval(ranked, rel, k=10).orderBy("query_id")


def q_range_join_clicks(spark, sf_dir):
    """Batch range join (bucketed equi-join shape, functions/rangejoin.py):
    for every purchase, the count and exact decimal sum of the same
    user's clicks in the preceding 24 hours. The oracle is the naive
    inequality join — quadratic but fine at sf0.01."""
    from akka_graph_db_spark.functions.rangejoin import range_join_buckets

    events = read_events(spark, sf_dir)
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("hi"),
        )
        .withColumn("lo", F.col("hi") - F.expr("INTERVAL 24 HOURS"))
    )
    j = range_join_buckets(
        clicks, purchases, ["user_id"], "c_ts", "lo", "hi",
        bucket_seconds=86400,
    )
    return j.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum(F.col("c_value").cast("decimal(30,2)"))
        .cast("double")
        .alias("sum_click_value"),
    )


def q_quantized_topk(spark, sf_dir):
    """Cosine top-10 over int8-quantized vectors for 5 queries: integer
    dot products (exact, order-independent) + one sqrt/division — the
    4x-smaller-payload scale path, oracled exactly against the same
    quantization arithmetic in DuckDB."""
    emb = read_embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5)
    return similarity.quantized_topk(emb, q, k=10).select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        F.round("qcos", 6).alias("qcos"),
    )


def q_salted_join_orders(spark, sf_dir):
    """Per-mktsegment order totals through a 16-way SALTED join
    (functions/skew.py) — result must be row-identical to the plain join
    the oracle runs; only the physical shuffle distribution differs."""
    from akka_graph_db_spark.functions.skew import salted_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    j = salted_join(
        orders, cust, ["c_custkey"], salt_from="o_orderkey", n_salt=16
    )
    return j.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .cast("double")
        .alias("total"),
    )


def q_events_rollup_multi(spark, sf_dir):
    """Hypertable-style multi-granularity continuous aggregate: minute
    partials from one raw scan, hour from minute partials, day from hour
    — decimal partials compose exactly, so the oracle's direct per-grain
    aggregation hash-matches."""
    return ev.hierarchical_rollup(read_events(spark, sf_dir)).select(
        "grain",
        "bucket_start",
        F.col("n_events").cast("bigint").alias("n_events"),
        "sum_value",
    )


def q_length_quantiles(spark, sf_dir):
    """Per-language EXACT length percentiles (linear interpolation) of
    documents — Spark `percentile` vs DuckDB `quantile_cont`."""
    docs = read_documents(spark, sf_dir)
    lq = textf.length_quantiles(docs)
    return lq.select(
        "lang",
        "n_docs",
        *[F.round(p, 6).alias(p) for p in ("p25", "p50", "p75", "p90")],
    )


def q_ppr_customer(spark, sf_dir):
    """Personalized PageRank from customer 1 (10 fixed iterations,
    damping 0.85): random-walk proximity over placed/contains edges —
    'parts and orders related to this customer'. Top-20 positive ranks,
    oracled against the unrolled CTE chain (_ppr_oracle). The top-k sort
    is on the ROUNDED rank with id tiebreak: raw double ranks carry
    ~1e-12 cross-engine summation noise, which at small SFs can flip the
    order of near-tied nodes across the LIMIT boundary; rounding first
    makes the cut deterministic on both engines."""
    g = _g(spark, sf_dir)
    pr = analytics.personalized_pagerank(
        g, [CUSTOMER_BASE + 1], n_iter=10
    )
    return (
        pr.where(F.col("rank") > 0)
        .select("id", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("id"))
        .limit(20)
    )


def q_funnel_events(spark, sf_dir):
    """Conversion-funnel drop-off: per-user greedy earliest completion of
    view -> click -> purchase, histogrammed by steps completed. Chained
    conditional-MIN aggregations, every shuffle on user_id."""
    from akka_graph_db_spark.functions.funnel import funnel_histogram

    # first 2 days only: over the full month every user converts (a
    # 1-row histogram); the prefix gives a real drop-off curve
    ev_df = read_events(spark, sf_dir).where(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp")
    )
    return funnel_histogram(ev_df, ["view", "click", "purchase"]).select(
        F.col("steps_completed").cast("int").alias("steps_completed"),
        "n_users",
    )


def q_activity_heatmap(spark, sf_dir):
    """Weekday × hour activity profile of the event stream — the
    capacity-planning heatmap. Day-of-week semantics are the classic
    cross-engine trap: Spark's weekday() is 0=Monday while DuckDB's
    dayofweek is 0=Sunday, so both sides are pinned to ISO numbering
    (1=Monday ≡ weekday()+1 ≡ isodow). Counts plus exact decimal value
    sums per cell."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        events.groupBy(
            (F.weekday("ts") + 1).alias("iso_dow"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("iso_dow", "hour")
    )


def q_order_intervals(spark, sf_dir):
    """Inter-order cadence: days between each customer's consecutive
    orders (per-customer LAG over (date, orderkey) — the total order
    makes ties deterministic), rolled up to global exact stats: interval
    count, min/max, and the average from an exact BIGINT day sum."""
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gap = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
    )
    return (
        orders.select(gap.alias("_gap"))
        .where(F.col("_gap").isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.min("_gap").alias("min_days"),
            F.max("_gap").alias("max_days"),
            (
                F.sum("_gap").cast("double") / F.count(F.lit(1))
            ).alias("avg_days"),
        )
    )


def q_revenue_concentration(spark, sf_dir):
    """Supplier revenue concentration (the Pareto check): the exact
    decimal share of total lineitem revenue carried by the top-10
    suppliers — TakeOrdered top-k over per-supplier decimal sums, the
    total folded in-plan via a 1-row broadcast; one double division at
    the end."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        F.col("l_extendedprice").cast("decimal(30,2)")
        * (1 - F.col("l_discount").cast("decimal(30,2)"))
    ).cast("decimal(38,4)")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(rev).alias("_rev"))
    top = (
        per_supp.orderBy(F.col("_rev").desc(), "l_suppkey")
        .limit(10)
        .agg(
            F.count(F.lit(1)).alias("n_top"),
            F.sum("_rev").alias("_top_rev"),
        )
    )
    total = per_supp.agg(
        F.sum("_rev").alias("_total"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    return top.crossJoin(F.broadcast(total)).select(
        "n_top",
        "n_suppliers",
        F.col("_top_rev").cast("double").alias("top10_revenue"),
        (
            F.col("_top_rev").cast("double")
            / F.col("_total").cast("double")
        ).alias("top10_share"),
    )


def q_rfm_segments(spark, sf_dir):
    """RFM segmentation: every customer classified Recent (last order
    within 180 days of the dataset max), Frequent (>= 20 orders), and
    Monetary (exact decimal lifetime spend >= 150k), counted per
    segment with the segment's exact total spend. One aggregation per
    customer + one per segment; the R/F/M flags are integer/decimal
    comparisons against fixed thresholds — no quantile estimation, so
    the oracle reproduces the 8-way split exactly."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("_last"),
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("_spend"),
    )
    ref = orders.agg(F.max("o_orderdate").alias("_ref"))
    days = F.datediff(F.to_date("_ref"), F.to_date("_last"))
    flagged = per_cust.crossJoin(F.broadcast(ref)).select(
        F.when(days <= 180, "R").otherwise("r").alias("_rf"),
        F.when(F.col("_n") >= 20, "F").otherwise("f").alias("_ff"),
        F.when(
            F.col("_spend") >= F.lit(150000).cast("decimal(30,2)"), "M"
        )
        .otherwise("m")
        .alias("_mf"),
        "_spend",
    )
    return (
        flagged.groupBy(
            F.concat("_rf", "_ff", "_mf").alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_spend").cast("double").alias("total_spend"),
        )
        .orderBy("segment")
    )


def q_recency_histogram(spark, sf_dir):
    """Customer recency distribution: days since each customer's LAST
    order (relative to the dataset's max order date, folded in-plan),
    bucketed into 30-day bins — the churn-analysis staple. All integer
    date math: calendar-day diff of DATE casts, integer division for
    the bin."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    last = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("_last")
    )
    ref = orders.agg(F.max("o_orderdate").alias("_ref"))
    days = F.datediff(F.to_date("_ref"), F.to_date("_last"))
    return (
        last.crossJoin(F.broadcast(ref))
        .select(F.floor(days / 30).cast("int").alias("bucket_30d"))
        .groupBy("bucket_30d")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("bucket_30d")
    )


def q_weekly_revenue_growth(spark, sf_dir):
    """Week-over-week revenue growth for 1996: exact decimal weekly
    sums, then a LAG window over the aggregated series with the percent
    change as the only double op — the window-over-aggregate shape
    (tiny post-agg series, so the single-partition window is over ~52
    rows, not the fact table). Buckets are (ISO year, ISO week), not
    bare weekofyear: Dec 29-31 of a calendar year belong to ISO week 1
    of the NEXT year and must not fold into early January's bucket
    (they get their own trailing row instead)."""
    from pyspark.sql import Window

    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    weekly = orders.groupBy(
        F.expr("extract(YEAROFWEEK FROM o_orderdate)")
        .cast("int")
        .alias("iso_year"),
        F.weekofyear("o_orderdate").alias("week"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("_rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("iso_year", "week")
    prev = F.lag("_rev").over(w)
    return weekly.select(
        "iso_year",
        "week",
        F.col("_rev").cast("double").alias("revenue"),
        "n_orders",
        F.when(
            prev.isNotNull(),
            (
                (F.col("_rev") - prev).cast("double")
                / prev.cast("double")
            ),
        ).alias("wow_growth"),
    ).orderBy("iso_year", "week")


def q_conversion_latency(spark, sf_dir):
    """Time-to-convert: per user, seconds between first click and first
    subsequent purchase, rolled up to exact distribution stats (count,
    min, max, avg) — latency is an integer epoch-second difference and
    the average derives from an exact BIGINT sum, so everything
    hash-matches. One conditional-min aggregation per user + one global
    rollup; both shuffles on user_id then a scalar."""
    ev_df = read_events(spark, sf_dir)
    per_user = (
        ev_df.groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    F.col("event_type") == "click",
                    F.unix_timestamp("ts"),
                )
            ).alias("_first_click"),
        )
        .where(F.col("_first_click").isNotNull())
    )
    purchases = ev_df.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_timestamp("ts").alias("_pts")
    )
    lat = (
        purchases.join(per_user, "user_id")
        .where(F.col("_pts") >= F.col("_first_click"))
        .groupBy("user_id")
        .agg(
            (F.min("_pts") - F.min("_first_click")).alias("_lat")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("_lat").alias("min_latency_s"),
        F.max("_lat").alias("max_latency_s"),
        (
            F.sum("_lat").cast("double") / F.count(F.lit(1))
        ).alias("avg_latency_s"),
    )


def q_weighted_sample_docs(spark, sf_dir):
    """Deterministic weighted priority sampling (Duffield-Lund-Thorup):
    top-20 docs per language by hash-priority u/w with w = n_chars —
    longer docs proportionally likelier. md5 family so DuckDB reproduces
    the exact sample; the priority is one IEEE division (engine-exact)."""
    docs = read_documents(spark, sf_dir)
    s = textf.weighted_sample(
        docs, 20, group_cols=("lang",), hash_family="md5"
    )
    return s.select(
        "doc_id", "lang", F.round("_priority", 6).alias("priority")
    )


def q_sql_interface(spark, sf_dir):
    """The SQL surface (api.GraphDB.sql): a CTE + window RANK over the
    graph's edge-label histogram, submitted as SQL TEXT — Catalyst is
    the parser/planner (the reference generated Cypher for Neo4j to
    parse, Neo4jGraph.scala:156-164; here the engine owns the whole
    path)."""
    from akka_graph_db_spark.api import GraphDB

    db = GraphDB(_g(spark, sf_dir))
    return db.sql("""
        WITH hist AS (
          SELECT label, COUNT(*) AS n_edges
          FROM graph_edges GROUP BY label
        )
        SELECT label, n_edges,
               CAST(RANK() OVER (ORDER BY n_edges DESC, label) AS INT)
                 AS rnk
        FROM hist
    """)


def q_cube_order_stats(spark, sf_dir):
    """CUBE over (status, priority): all four grouping-set combinations
    in one pass — completes the §2.7 grouping-sets surface next to
    rollup_order_stats."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .cast("double")
            .alias("total"),
        )
    )


def q_jsonl_roundtrip(spark, sf_dir):
    """Format interchange (sources/files.py): documents export to
    sharded JSONL and re-import under an explicit schema; the per-group
    aggregate recomputes text lengths AFTER the round trip, so the
    oracle (the same aggregate on the original parquet) proves byte
    fidelity through the text format."""
    import tempfile

    from akka_graph_db_spark.sources import files

    docs = read_documents(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="jsonl_rt_") + "/docs"
    files.write_jsonl(docs, path)
    back = files.read_jsonl(
        spark,
        path,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum(F.length("text")).cast("bigint").alias("sum_text_len"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
    )


def q_store_incremental_counts(spark, sf_dir):
    """O(changes) materialized-view maintenance, certified: a base
    snapshot plus a delta (one new probe node, one customer re-labeled
    to probe, one supplier deleted) — store.incremental_label_counts
    derives the new per-label counts from the DELTA files + an id probe
    of the base, never a recount, and must equal the oracle's
    literal-adjusted per-label counts exactly (new id +1, label move
    −old +new, delete −1)."""
    import atexit
    import shutil
    import tempfile

    from akka_graph_db_spark import store

    g = _g(spark, sf_dir).core()
    root = tempfile.mkdtemp(prefix="spark_graft_inc_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    store.save_snapshot(g, root)
    empty_map = F.create_map().cast("map<string,string>")
    ups = spark.createDataFrame(
        [(97_500_001,), (CUSTOMER_BASE + 1,)], "id bigint"
    ).select("id", F.lit("inc_probe").alias("label"), empty_map.alias("props"))
    dels = spark.createDataFrame([(SUPPLIER_BASE + 1,)], "id bigint")
    delta = store.GraphDelta(
        node_upserts=ups,
        node_deletes=dels,
        edge_deletes=dels.limit(0),
    )
    # validate=True on purpose: incremental_label_counts is only correct
    # under the per-delta id contract (unique upsert ids, no id in both
    # upserts and deletes), so the certified path exercises the validated
    # write, not a producer pinky-promise.
    store.save_delta(root, delta, validate=True)
    return store.incremental_label_counts(spark, root).orderBy("label")


def q_store_incremental_degrees(spark, sf_dir):
    """O(changes) DEGREE maintenance (store.incremental_degrees — the
    materialized-view companion of incremental_label_counts): a base
    snapshot plus one delta exercising all three edge-mutation shapes —
    a NEW edge (customer 1 -> order 1), a RETARGET of customer 2's
    located_in edge to nation 0, and a DELETE of order 1's placed edge.
    The new per-node (out_degree, in_degree) table is derived from the
    delta files + an id probe of the base — never a recount — and must
    equal the oracle's literally-adjusted full recount exactly."""
    import atexit
    import shutil
    import tempfile

    from akka_graph_db_spark import store
    from akka_graph_db_spark.sources.tpch import LOCATED_IN_CUST_BASE

    g = _g(spark, sf_dir).core()
    root = tempfile.mkdtemp(prefix="spark_graft_incdeg_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    store.save_snapshot(g, root)
    empty_map = F.create_map().cast("map<string,string>")
    ups = spark.createDataFrame(
        [
            (97_600_001, "inc_probe_edge", CUSTOMER_BASE + 1,
             ORDER_BASE + 1),
            (LOCATED_IN_CUST_BASE + 2, "located_in", CUSTOMER_BASE + 2,
             NATION_BASE + 0),
        ],
        "id bigint, label string, src bigint, dst bigint",
    ).withColumn("props", empty_map)
    dels = spark.createDataFrame([(PLACED_BASE + 1,)], "id bigint")
    delta = store.GraphDelta(
        edge_upserts=ups,
        edge_deletes=dels,
        node_deletes=dels.limit(0),
    )
    store.save_delta(root, delta, validate=True)
    return store.incremental_degrees(spark, root).orderBy("id")


def q_store_incremental_topk(spark, sf_dir):
    """Touched-partition top-k maintenance (store.incremental_topk): a
    base snapshot plus one delta exercising all three shapes — a NEW
    supplier whose acctbal vaults into the top-3, an UPSERT replacing
    customer 3's properties (new acctbal ranks #1), and a DELETE of
    customer 1 (top-k is not closed under deletes, so the touched label
    recomputes from its partition-pruned slice — never the graph; labels
    the delta doesn't mention carry over verbatim). Output restricted to
    the two acctbal-bearing labels; the oracle applies the same literal
    mutations relationally."""
    import atexit
    import shutil
    import tempfile

    from akka_graph_db_spark import store

    g = _g(spark, sf_dir).core()
    root = tempfile.mkdtemp(prefix="spark_graft_inctopk_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    store.save_snapshot(g, root)
    ups = spark.createDataFrame(
        [
            (
                SUPPLIER_BASE + 999_999,
                "supplier",
                {"acctbal": "99999.99", "name": '"inc topk supplier"'},
            ),
            (CUSTOMER_BASE + 3, "customer", {"acctbal": "88888.88"}),
        ],
        "id bigint, label string, props map<string,string>",
    )
    dels = spark.createDataFrame([(CUSTOMER_BASE + 1,)], "id bigint")
    delta = store.GraphDelta(node_upserts=ups, node_deletes=dels)
    store.save_delta(root, delta, validate=True)
    return (
        store.incremental_topk(spark, root, "acctbal", k=3)
        .where(F.col("label").isin("customer", "supplier"))
        .orderBy("label", "rank")
    )


def q_zorder_customers(spark, sf_dir):
    """Morton z-order keys (functions/zorder.py) over (c_nationkey,
    c_custkey) — the two-column data-skipping sort key, certified
    cross-engine: the 50 smallest keys (≡ the locality-first corner of
    the key plane) must match the oracle's identical shift/mask chain
    bit for bit."""
    from akka_graph_db_spark.functions.zorder import zorder_key

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            zorder_key(
                F.col("c_nationkey").cast("long"),
                F.col("c_custkey").cast("long"),
            ).alias("zkey"),
        )
        .orderBy("zkey", "c_custkey")
        .limit(50)
    )


def _zorder_sql(col: str) -> str:
    """The functions/zorder.py spread chain as a DuckDB expression."""
    masks = [
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ]
    s = f"(CAST({col} AS BIGINT) & 2147483647)"
    for shift, mask in masks:
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def q_skew_report_parts(spark, sf_dir):
    """Hot-key diagnostics (functions/skew.py skew_report) on
    lineitem.l_partkey — the measurement that decides whether a join
    key needs salting: top-10 heaviest parts with exact share and
    ratio-to-uniform (single double divisions off exact counts)."""
    from akka_graph_db_spark.functions.skew import skew_report

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return skew_report(li, ["l_partkey"], top_k=10)


def q_orc_roundtrip(spark, sf_dir):
    """Columnar interchange (sources/files.py): documents export to ORC
    and re-read (embedded schema authoritative, predicate pushdown
    live); the post-round-trip aggregate must equal the oracle computed
    on the original parquet — same fidelity contract as
    jsonl_roundtrip, through the second format."""
    import tempfile

    from akka_graph_db_spark.sources import files

    docs = read_documents(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="orc_rt_") + "/docs"
    files.write_orc(docs, path)
    back = files.read_orc(spark, path)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum(F.length("text")).cast("bigint").alias("sum_text_len"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
    )


def q_events_outliers(spark, sf_dir):
    """Per-type z-score outliers (|z| > 3) with moments derived from
    exact decimal component sums — the outlier set and scores reproduce
    exactly in the oracle."""
    return ev.value_outliers(read_events(spark, sf_dir), z=3.0).select(
        "event_id",
        "event_type",
        "value",
        F.round("zscore", 6).alias("zscore"),
    )


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary report) over the fixture lineitem —
    the canonical scan-heavy aggregate: group the whole table by two
    flags, exact decimal money sums, averages derived from exact
    components (sum/count) so the doubles reproduce engine-for-engine.
    One scan, one partial+final hash aggregation; the date predicate
    pushes to parquet."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = lambda c: F.col(c).cast("decimal(30,2)")  # noqa: E731
    disc = (d("l_extendedprice") * (1 - d("l_discount"))).cast(
        "decimal(38,4)"
    )
    charge = (
        d("l_extendedprice") * (1 - d("l_discount")) * (1 + d("l_tax"))
    ).cast("decimal(38,6)")
    agg = (
        li.where(
            F.col("l_shipdate")
            <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).alias("_sq"),
            F.sum(d("l_extendedprice")).alias("_sbp"),
            F.sum(disc).alias("_sdp"),
            F.sum(charge).alias("_scp"),
            F.sum(d("l_discount")).alias("_sd"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    n = F.col("count_order")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sbp").cast("double").alias("sum_base_price"),
        F.col("_sdp").cast("double").alias("sum_disc_price"),
        F.col("_scp").cast("double").alias("sum_charge"),
        (F.col("_sq").cast("double") / n).alias("avg_qty"),
        (F.col("_sbp").cast("double") / n).alias("avg_price"),
        (F.col("_sd").cast("double") / n).alias("avg_disc"),
        "count_order",
    )


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority; o_orderpriority stands in for the
    fixture's missing o_shippriority): 3-way join with selective
    predicates on all three tables, revenue top-10. Every predicate
    pushes to its scan; the filtered customer and orders sides
    broadcast."""
    cut = F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderdate") < cut
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") > cut
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(30,2)")
        * (1 - F.col("l_discount").cast("decimal(30,2)"))
    ).cast("decimal(38,4)")
    j = (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust.select("c_custkey")),
                    orders["o_custkey"] == F.col("c_custkey"),
                ).select("o_orderkey", "o_orderdate", "o_orderpriority")
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("_rev"))
    )
    return (
        j.orderBy(F.col("_rev").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): single-scan filter +
    aggregate, zero joins — the pushdown showcase. All three predicates
    (shipdate year, discount band, quantity cap) reach the parquet scan
    as PushedFilters; the sum is exact decimal arithmetic cast to double
    at the very end. Date window shifted to 1996 (the fixture's orders
    span 1995-2001, unlike spec TPC-H)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = lambda c: F.col(c).cast("decimal(30,2)")  # noqa: E731
    return (
        li.where(
            (
                F.col("l_shipdate")
                >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
            )
            & (
                F.col("l_shipdate")
                < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
            )
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (d("l_extendedprice") * d("l_discount")).cast(
                    "decimal(38,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local-supplier volume): the 6-way join — lineitem joins
    orders on orderkey and supplier on suppkey, with customer, nation,
    and region narrowing both ends; revenue grouped per nation.
    Catalyst broadcast-chains every dimension side (region→nation is a
    few rows; customer and supplier filtered by nation membership);
    only lineitem⋈orders moves real data, and AQE picks broadcast there
    too once orders is filtered to one year. Date window shifted to
    1996 per the fixture's calendar."""
    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    d = lambda c: F.col(c).cast("decimal(30,2)")  # noqa: E731
    region = rd("region").where(F.col("r_name") == "ASIA")
    nation = rd("nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = rd("customer").join(
        F.broadcast(nation.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey")
    supp = rd("supplier").select("s_suppkey", "s_nationkey")
    orders = rd("orders").where(
        (
            F.col("o_orderdate")
            >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
        )
        & (
            F.col("o_orderdate")
            < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        )
    )
    li = rd("lineitem")
    rev = (d("l_extendedprice") * (1 - d("l_discount"))).cast(
        "decimal(38,4)"
    )
    j = (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust),
                    F.col("o_custkey") == F.col("c_custkey"),
                ).select("o_orderkey", "c_nationkey")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        # "local supplier": customer and supplier share the nation
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order-priority checking), adapted to the fixture's
    narrower lineitem (no commitdate/receiptdate): an order is "late"
    when some line shipped more than 60 days after the order date.
    The EXISTS subquery becomes a LEFT SEMI join — hash on l_orderkey
    with the ship-lag residual evaluated inside the join, so each
    qualifying order is emitted once regardless of how many late lines
    it has. Both date predicates push to their parquet scans."""
    lo = F.lit("1996-07-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): customers who returned goods
    ('R' lines) ordered in 1996Q1, ranked by lost revenue, top 20.
    lineitem⋈orders carries the volume; the filtered orders side (one
    quarter) and the 25-row nation table broadcast. c_acctbal rides
    through the groupBy as a key (exact passthrough, no re-aggregation)."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_returnflag") == "R"
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(30,2)")
        * (1 - F.col("l_discount").cast("decimal(30,2)"))
    ).cast("decimal(38,4)")
    j = (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.col("_rev").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping-mode line counts), adapted: the fixture has
    no l_shipmode, so lines are bucketed by ship YEAR instead, keeping
    the query's real shape — a fact⋈fact join classified by a
    conditional aggregation (urgent/high vs the rest) computed in one
    pass with CASE-style sums, no second scan."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promo-revenue share): percentage of one month's
    revenue from PROMO-type parts. The part dimension broadcasts; both
    the promo and total sums accumulate exactly in decimal in ONE
    aggregation (conditional sum), and only the final ratio is a
    double division — bit-reproducible across engines."""
    lo = F.lit("1996-09-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_type"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(30,2)")
        * (1 - F.col("l_discount").cast("decimal(30,2)"))
    ).cast("decimal(38,4)")
    agg = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(38,4)")
                )
            ).alias("_promo"),
            F.sum(rev).alias("_total"),
        )
    )
    return agg.select(
        (
            F.lit(100.0)
            * F.col("_promo").cast("double")
            / F.col("_total").cast("double")
        ).alias("promo_revenue")
    )


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (part/supplier relationship count), adapted: the
    fixture has no partsupp, so lineitem's (part, supplier) pairs stand
    in. Counts distinct suppliers per (brand, type, size) for selected
    sizes, excluding one brand and any supplier with a negative account
    balance — the NOT IN becomes a LEFT ANTI join against the (small,
    broadcast) excluded-supplier list; safe because s_suppkey is
    non-null by construction."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").where(
        (F.col("p_brand") != "Brand#15")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    bad = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 300, with customer attribution, top 100 by order value.
    The HAVING subquery is one hash aggregation over lineitem whose
    survivor set (dozens of keys) broadcasts back as a semi-join
    filter; quantity sums stay exact in decimal."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", F.col("l_quantity").cast("decimal(30,2)").alias("_q")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("_q").alias("_sumq"))
        .where(F.col("_sumq") > 300)
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    return (
        orders.join(
            F.broadcast(big),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(
            F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey"
        )
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias(
                "o_orderdate"
            ),
            "o_totalprice",
            F.col("_sumq").cast("double").alias("sum_qty"),
        )
    )


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue), adapted to brand/size/quantity
    bands (no shipmode/container in the fixture): revenue from three
    disjunctive brand×size×quantity windows. The whole OR-of-ANDs
    predicate is a single scan filter after the broadcast part join —
    one pass, no union of three scans."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        F.col("l_extendedprice").cast("decimal(30,2)")
        * (1 - F.col("l_discount").cast("decimal(30,2)"))
    ).cast("decimal(38,4)")
    band = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(
            band("Brand#12", 5, 1, 11)
            | band("Brand#23", 10, 10, 20)
            | band("Brand#34", 15, 20, 30)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): bilateral trade among nations 1, 2,
    and 3 — supplier nation ≠ customer nation, all directed pairs,
    revenue per (supp_nation, cust_nation, year). The tiny nation
    slices broadcast onto supplier/customer, which broadcast onto the
    lineitem⋈orders spine; exact decimal revenue."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    nation = rd("nation").select("n_nationkey", "n_name")
    trio = [1, 2, 3]
    supp = rd("supplier").join(
        F.broadcast(nation.where(F.col("n_nationkey").isin(trio))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = rd("customer").join(
        F.broadcast(
            nation.where(F.col("n_nationkey").isin(trio)).select(
                F.col("n_nationkey").alias("_ck"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("_ck"),
    ).select("c_custkey", "cust_nation")
    li = rd("lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(30,2)")
        * (1 - F.col("l_discount").cast("decimal(30,2)"))
    ).cast("decimal(38,4)")
    j = (
        li.join(
            rd("orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (market share), adapted to the fixture's p_type domain:
    nation 1's share of AMERICA-customer PROMO-part revenue per order
    year. Both the national and total revenue accumulate exactly in
    decimal in ONE conditional aggregation; the share is the only
    double division."""
    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    region = rd("region").where(F.col("r_name") == "AMERICA")
    nat_am = rd("nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("_am"))
    cust = rd("customer").join(
        F.broadcast(nat_am), F.col("c_nationkey") == F.col("_am")
    ).select("c_custkey")
    part = rd("part").where(F.col("p_type") == "PROMO").select("p_partkey")
    li = rd("lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(30,2)")
        * (1 - F.col("l_discount").cast("decimal(30,2)"))
    ).cast("decimal(38,4)")
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            rd("orders").select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(
                rd("supplier").select("s_suppkey", "s_nationkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    agg = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(
            F.when(F.col("s_nationkey") == 1, rev).otherwise(
                F.lit(0).cast("decimal(38,4)")
            )
        ).alias("_nat"),
        F.sum(rev).alias("_tot"),
    )
    return agg.select(
        "o_year",
        (
            F.col("_nat").cast("double") / F.col("_tot").cast("double")
        ).alias("mkt_share"),
    ).orderBy("o_year")


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): LEFT join so
    zero-order customers land in the c_count=0 bucket — the
    outer-join-then-double-aggregate shape."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    return (
        cust.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, then
    the supplier(s) achieving the maximum — argmax over an aggregate
    via a 1-row broadcast of the max joined back on exact DECIMAL
    equality (no double compare deciding membership)."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(30,2)")
        * (1 - F.col("l_discount").cast("decimal(30,2)"))
    ).cast("decimal(38,4)")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(rev).alias("_rev"))
    mx = per_supp.agg(F.max("_rev").alias("_mx"))
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .where(F.col("_rev") == F.col("_mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): lines whose quantity is
    below 20% of their part's average — the correlated AVG subquery
    decorrelated into a per-part aggregate join. The average derives
    from an exact decimal sum (a double AVG would be summation-order
    nondeterministic), and only the final 0.2×avg comparison is a
    double op, identical in both engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("_avg_qty")
    )
    small = li.join(
        per_part, F.col("l_partkey") == F.col("_pk")
    ).where(F.col("l_quantity") < F.lit(0.2) * F.col("_avg_qty"))
    return small.agg(
        F.count(F.lit(1)).alias("n_lines"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).cast(
                "double"
            )
            / 7.0
        ).alias("avg_yearly"),
    )


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global-sales opportunity), adapted: no c_phone in the
    fixture, so the country-code slice is a nation-key set, and (since
    every fixture customer has orders) "never ordered" becomes "dormant
    — no orders since 2000-01-01". Keeps the query's three real shapes:
    a scalar subquery (average positive balance, folded in-plan via a
    1-row broadcast cross join, never collected), an anti-join against
    recent orders, and a final rollup per country. The average is
    computed from an exact decimal sum so both engines derive the same
    double threshold."""
    nkeys = [1, 3, 5, 7, 9, 11, 13]
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_nationkey").isin(nkeys)
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(30,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg_bal")
    )
    recent = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(
            recent,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(30,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier), adapted: the fixture has no
    partsupp table, so supply cost evidence comes from lineitem — a
    part's unit cost from a supplier is MIN(l_extendedprice /
    l_quantity) over that supplier's shipments. Keeps Q2's real shape:
    a correlated scalar-min subquery decorrelated into a groupBy +
    equality join back, with every dimension side broadcast. For
    STANDARD parts of size >= 20 supplied from EUROPE, the suppliers
    achieving each part's minimum unit cost, top-20 by account balance.
    The min and the join-back compare the SAME correctly-rounded double
    division in both engines, so equality (and the result) is exact."""
    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    region = rd("region").where(F.col("r_name") == "EUROPE")
    nation = rd("nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = rd("supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    part = rd("part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") >= 20)
    ).select("p_partkey", "p_size")
    costs = (
        rd("lineitem")
        .where(F.col("l_quantity") > 0)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_size",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("_uc"),
        )
    )
    min_cost = costs.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("_uc").alias("_min_uc")
    )
    return (
        costs.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("_uc") == F.col("_min_uc")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_size",
            F.round("_uc", 6).alias("unit_cost"),
        )
        .distinct()
        .orderBy(
            F.col("s_acctbal").desc(), "s_name", "n_name", "p_partkey"
        )
        .limit(20)
    )


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit), adapted: no partsupp, so line
    cost is p_retailprice * l_quantity instead of ps_supplycost *
    l_quantity (deterministic and exact — both factors live on the
    joined row). PROMO parts stand in for the %green% name filter.
    Profit per supplier nation per order year; the fact table joins
    orders (date), supplier->nation, and the broadcast part filter —
    the classic snowflake probe with one wide fact scan."""
    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    d = lambda c: F.col(c).cast("decimal(30,2)")  # noqa: E731
    part = rd("part").where(F.col("p_type") == "PROMO").select(
        "p_partkey", "p_retailprice"
    )
    supp = rd("supplier").join(
        F.broadcast(rd("nation").select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    amount = (
        (d("l_extendedprice") * (1 - d("l_discount"))).cast("decimal(38,4)")
        - (d("p_retailprice") * d("l_quantity")).cast("decimal(38,4)")
    )
    return (
        rd("lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            rd("orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock), adapted: per-part "inventory value"
    is the exact decimal shipment value SUM(l_extendedprice) from
    suppliers in nations 0-12 (no partsupp/availqty in the fixture).
    Keeps Q11's defining shape — a HAVING against a scalar fraction of
    the GLOBAL total, decorrelated into a 1-row broadcast cross join
    (never collected). The threshold is SCALE-FREE: 1.6x the MEAN
    per-part value (TPC-H's fixed 0.0001/SF fraction bakes the scale
    factor into the query; dividing by the part count does the same
    thing without knowing SF). Both engines derive it from the same
    exact decimal total and integer count, so the strict > is
    deterministic."""
    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    supp = rd("supplier").where(F.col("s_nationkey") < 13).select(
        "s_suppkey"
    )
    vals = (
        rd("lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).alias(
                "_v"
            )
        )
    )
    total = vals.agg(
        F.sum("_v").alias("_tot"), F.count(F.lit(1)).alias("_np")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .where(
            F.col("_v").cast("double")
            > F.col("_tot").cast("double") / F.col("_np") * F.lit(1.6)
        )
        .select("partkey", F.col("_v").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion), adapted: without
    partsupp.availqty, a supplier qualifies when it shipped MORE THAN
    HALF of a PROMO part's total 1996 volume (the dominant-supplier
    reading of availqty > 0.5*sum(qty)). Keeps Q20's nested semi-join
    chain: part filter -> per-(part,supplier) volume vs per-part total
    -> LEFT SEMI into supplier, output (s_name, nation). Quantities are
    integers, 0.5*total is exact in double — no boundary ambiguity."""
    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    part = rd("part").where(F.col("p_type") == "PROMO").select("p_partkey")
    li = (
        rd("lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("_sq")
    )
    per_p = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("l_quantity").alias("_tq")
    )
    dominant = (
        per_ps.join(F.broadcast(per_p), F.col("l_partkey") == F.col("_pk"))
        .where(F.col("_sq") > F.lit(0.5) * F.col("_tq"))
        .select("l_suppkey")
    )
    return (
        rd("supplier")
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .join(
            F.broadcast(rd("nation").select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    fixture's narrower lineitem (no receipt/commit dates): a line is
    LATE when it shipped more than 60 days after the order date (the
    q4 adaptation). A supplier is counted for an order when it has a
    late line there, the order involves >= 2 distinct suppliers, and
    NO other supplier was late — the exists/not-exists pair expressed
    as one per-order aggregation (distinct suppliers, distinct late
    suppliers) instead of two correlated probes; integer counts only."""
    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    orders = rd("orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = (
        rd("lineitem")
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("_late"),
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("_late"), F.col("l_suppkey"))
        ).alias("_n_late"),
        F.max(F.when(F.col("_late"), F.col("l_suppkey"))).alias(
            "_late_supp"
        ),
    )
    waits = per_order.where(
        (F.col("_n_supp") >= 2) & (F.col("_n_late") == 1)
    )
    return (
        waits.join(
            F.broadcast(
                rd("supplier").select("s_suppkey", "s_name")
            ),
            F.col("_late_supp") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q_token_rarity(spark, sf_dir):
    """Corpus-statistics quality: the 50 documents most dominated by
    rare tokens (hapax-heavy docs are the classic mojibake/boilerplate
    signature) — functions/text.py token_rarity_stats, the unigram-LM
    perplexity intuition reduced to exact integer corpus frequencies
    (no log/exp), so both ratios hash-match the oracle exactly."""
    from akka_graph_db_spark.functions.text import token_rarity_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        token_rarity_stats(docs, rare_max_freq=1)
        .orderBy(F.col("rare_ratio").desc(), "doc_id")
        .limit(50)
    )


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup: the 20% "incoming" slice (doc_id % 10
    >= 8) checked for near-duplicates against the 80% "base" corpus via
    the asymmetric band join (functions/dedup.py minhash_dedup_cross).
    Exact-verified; LSH recall is 100% at these parameters (same
    argument as dedup_minhash), so the exact cross all-pairs oracle
    matches. jaccard_sim is an exact |∩|/|∪| double division."""
    docs = read_documents(spark, sf_dir)
    new = docs.where(F.col("doc_id") % 10 >= 8)
    base = docs.where(F.col("doc_id") % 10 < 8)
    return dedup.minhash_dedup_cross(
        new, base, threshold=0.9, num_perm=64, bands=16, shingle_n=1
    )


def q_embedding_outliers(spark, sf_dir):
    """Per-label embedding outliers: the 20 vectors farthest from their
    label's centroid on the exact integer grid (similarity.py
    label_centroid_outliers — the kmeans_quantized exactness contract:
    int64 distances, floor(s/n+0.5) centroids), so the oracle
    reproduces distances bit-for-bit."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.label_centroid_outliers(emb, top_k=20)


def q_dup_cluster_histogram(spark, sf_dir):
    """Near-dup cluster-size distribution: exact-verified LSH pairs →
    connected components over ALL documents (isolated docs are size-1
    clusters) → (cluster_size, n_clusters) histogram — the curation
    diagnostic that shows whether duplication is a long tail of small
    families or a few giant boilerplate clusters. Oracle: the keep
    queries' recursive-CTE closure, rolled up to sizes."""
    docs = read_documents(spark, sf_dir)
    pairs = dedup.minhash_dedup_pairs(
        docs, threshold=0.9, num_perm=64, bands=16, shingle_n=1
    ).select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
    verts = docs.select(F.col("doc_id").alias("id"))
    comp = analytics.connected_components_from_pairs(verts, pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


def q_scc_event_types(spark, sf_dir):
    """Strongly connected components of the event-type transition graph
    (directed edges = observed consecutive transitions): which behavior
    states are mutually reachable. Path-doubling transitive closure +
    mutual-reachability meet (operators/analytics.py
    strongly_connected_components) — the bounded-cardinality directed
    analytics the engine pairs with its undirected CC. Oracle: the same
    closure unrolled 5 doublings (monotone; fixpoint ≤ diameter log)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = (
        ev.event_transitions(events)
        .where(F.col("from_type") != F.col("to_type"))
        .select(
            F.col("from_type").alias("a"), F.col("to_type").alias("b")
        )
    )
    return analytics.strongly_connected_components(edges).orderBy("id")


def q_transition_reciprocity(spark, sf_dir):
    """Directed-graph reciprocity of the transition graph: the fraction
    of distinct edges whose reverse edge also occurs — one self-join on
    the swapped key + exact integer counts, one double division."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = (
        ev.event_transitions(events)
        .where(F.col("from_type") != F.col("to_type"))
        .select(
            F.col("from_type").alias("a"), F.col("to_type").alias("b")
        )
        .distinct()
    )
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    agg = e.join(rev, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )
    tot = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return tot.crossJoin(F.broadcast(agg)).select(
        "n_edges",
        "n_reciprocal",
        (
            F.col("n_reciprocal").cast("double")
            / F.col("n_edges").cast("double")
        ).alias("reciprocity"),
    )


def q_pivot_priority_year(spark, sf_dir):
    """Order counts pivoted to a year × priority matrix — Spark's
    relational PIVOT operator (one scan, one hash aggregation with the
    priority dimension spread across columns; the explicit value list
    keeps the plan static, no distinct-scan pre-pass). Oracle: the
    equivalent conditional aggregation."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
        .na.fill(0)
    )
    renames = {
        "1-URGENT": "n_urgent",
        "2-HIGH": "n_high",
        "3-MEDIUM": "n_medium",
        "4-NOT SPECIFIED": "n_notspec",
        "5-LOW": "n_low",
    }
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.orderBy("order_year")


def q_ntile_customer_deciles(spark, sf_dir):
    """Customer account-balance deciles with exact NTILE(10) semantics
    over a total order (balance, then custkey), rolled up to per-decile
    population and balance bounds — computed DISTRIBUTED via
    functions/ranking.py ntile_distributed (range-repartitioned global
    rank + the remainder-first tile formula), never the single-partition
    `Window.orderBy` that a bare NTILE compiles to. min/max are exact
    passthroughs of stored doubles; the oracle is plain NTILE."""
    from akka_graph_db_spark.functions.ranking import ntile_distributed

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    tiled = ntile_distributed(
        cust.select("c_acctbal", "c_custkey"),
        10,
        ["c_acctbal", "c_custkey"],
        tile_col="decile",
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("decile")
    )


def q_orders_above_customer_avg(spark, sf_dir):
    """Correlated scalar subquery, decorrelated: orders whose price
    exceeds THEIR customer's average order price — the classic
    decorrelation into (per-customer aggregate) ⋈ (orders), which is
    exactly the plan Catalyst would rewrite the subquery into; the
    average derives from an exact decimal sum so both engines compare
    against identical doubles. Top 20 customers by above-average order
    count."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    avg_per_cust = orders.groupBy("o_custkey").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("_avg"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        orders.join(avg_per_cust, "o_custkey")
        .where(F.col("o_totalprice") > F.col("_avg"))
        .groupBy(F.col("o_custkey").alias("custkey"), "n_orders")
        .agg(F.count(F.lit(1)).alias("n_above"))
        .orderBy(F.col("n_above").desc(), "custkey")
        .limit(20)
    )


def q_mixture_weights(spark, sf_dir):
    """Per-source training-mixture catalog: document/char volume and the
    sqrt-damped keep-quota each source would contribute to a shaped
    corpus (functions/mixture.py). One hash aggregation to #sources
    rows; quota math is sqrt→multiply→floor (no transcendentals), so
    the oracle reproduces it bit-for-bit."""
    from akka_graph_db_spark.functions.mixture import mixture_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mixture_weights(docs, coeff=4.0, min_keep=10)


def q_mixture_sample(spark, sf_dir):
    """Frequency-damped corpus materialization: per source keep the
    hash-ranked floor(4*sqrt(n)) documents (min 10) — the sqrt
    reweighting that stops a dominant crawl source from swamping the
    training mixture. Single shuffle; rank and quota share one window
    partitioning (functions/mixture.py)."""
    from akka_graph_db_spark.functions.mixture import frequency_damped_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    return frequency_damped_sample(docs, coeff=4.0, min_keep=10).select(
        "source", "doc_id", "_rank", "_quota"
    )


def q_aggmsg_max_acctbal(spark, sf_dir):
    """The aggregateMessages primitive (GraphX parity) driven directly:
    over located_in triplets, each customer sends its acctbal to its
    nation; per-nation max. NULL messages (non-customer sources) drop,
    mirroring GraphX's conditional sendToDst."""
    g = _g(spark, sf_dir)
    return analytics.aggregate_messages(
        g,
        agg=F.max("msg").alias("max_acctbal"),
        to_dst=F.when(
            (F.col("edge.label") == "located_in")
            & (F.col("src.label") == "customer"),
            F.col("src.acctbal"),
        ),
    )


def q_streaming_static_join(spark, sf_dir):
    """§2.9 stream-static (stream-batch) join, batch-equivalence
    oracle: purchase events run as a file stream and enrich against a
    STATIC per-user click-count dimension computed in batch — the
    standard dimension-enrichment shape (stateless per micro-batch: no
    watermark, no state store; the static side broadcasts into every
    batch). The drained append sink must equal the batch join exactly —
    every output column is a copy of input data, so the result is
    micro-batch-invariant."""
    import os
    import tempfile
    import uuid

    import pyarrow.compute as pc

    ensure_query_conf(spark)
    ev_df = read_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="ssjoin_")
    src = os.path.join(tmp, "purchases")
    if _stage_needs_spark(f"{sf_dir}/events.parquet"):
        _stage_spark_files(
            ev_df.where(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "value"
            ),
            src,
            n_files=2,
        )
    else:
        ev = _events_arrow(
            sf_dir, ["event_id", "user_id", "event_type", "value"]
        )
        _stage_arrow_files(
            ev.filter(pc.equal(ev["event_type"], "purchase")).select(
                ["event_id", "user_id", "value"]
            ),
            src,
            n_files=2,
        )
    user_clicks = (
        ev_df.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_clicks"))
    )
    stream = spark.readStream.schema(
        "event_id bigint, user_id bigint, value double"
    ).parquet(src)
    enriched = stream.join(user_clicks, "user_id", "left").select(
        "event_id",
        "user_id",
        "value",
        F.coalesce("user_clicks", F.lit(0)).cast("bigint").alias(
            "user_clicks"
        ),
    )
    name = f"ssjoin_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition counts over per-user time-ordered
    event sequences (ties broken by event_id — a total order both
    engines replay identically)."""
    return ev.event_transitions(read_events(spark, sf_dir)).select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
    )


def q_basket_lift(spark, sf_dir):
    """Market-basket association over orders: top-20 part pairs by lift
    (co-order frequency vs independence), min support 3 co-orders.
    Lift = n_ab * n_orders / (n_a * n_b) — exact integer components, one
    IEEE division; ties broken by (a, b). The order-count scalar is
    folded IN-PLAN (1-row aggregate broadcast via crossJoin, same shape
    as q_clustering_coefficient) — one composed job, no driver-side
    count."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").cast("double").alias("_n_orders")
    )
    item_cnt = baskets.groupBy(F.col("l_partkey").alias("a")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("b"))
    pair_cnt = (
        a.join(b, "l_orderkey")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    scored = (
        pair_cnt.join(F.broadcast(item_cnt), "a")
        .join(
            F.broadcast(
                item_cnt.select(
                    F.col("a").alias("b"), F.col("n_a").alias("n_b")
                )
            ),
            "b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "a",
            "b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            (
                F.col("n_ab") * F.col("_n_orders")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
    return (
        scored.orderBy(F.col("lift").desc(), "a", "b")
        .limit(20)
        .select("a", "b", "n_ab", F.round("lift", 6).alias("lift"))
    )


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention triangle over the event stream: users
    bucketed by first-activity week, distinct-active counted per
    weeks-since-cohort offset."""
    return ev.cohort_retention(read_events(spark, sf_dir)).select(
        "cohort_week",
        "week_offset",
        F.col("n_users").cast("bigint").alias("n_users"),
    )


def q_clustering_coefficient(spark, sf_dir):
    """Global clustering coefficient of the part co-order graph:
    3 * triangles / wedges, with wedges = sum over nodes of C(deg, 2) —
    exact integer counts from the degree frame plus the degree-oriented
    triangle count, one final IEEE division."""
    pairs = _coorder_pairs(spark, sf_dir)
    from akka_graph_db_spark.operators.analytics import (
        canonical_undirected,
        triangle_count,
    )

    e = canonical_undirected(pairs)
    deg = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wedges = deg.agg(
        F.sum(
            (F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint")
        ).alias("n_wedges")
    )
    tri = triangle_count(pairs)
    return tri.crossJoin(wedges).select(
        "n_triangles",
        "n_wedges",
        F.round(
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
        ).alias("global_clustering"),
    )


def q_pipeline_e2e(spark, sf_dir):
    """The curation pipeline END-TO-END, one composed plan: exact dedup
    (min id per distinct text) -> deterministic 90/10 md5 split ->
    16-token/4-overlap chunking -> 64-token sequence packing per
    (split, lang) shard -> per-shard summary (chunks, packs, exact token
    sum). Every stage is an already-oracled operator; this entry proves
    they COMPOSE — the oracle rebuilds the same five stages as one SQL
    chain. Deterministic end to end (md5 hashes, integer token math)."""
    docs = read_documents(spark, sf_dir)
    survivors = dedup.exact_dedup(docs)  # (doc_id)
    kept = docs.join(survivors, "doc_id", "left_semi")
    split = textf.hash_split(kept, "doc_id", 90, hash_family="md5")
    chunks = textf.chunk_documents(split, chunk_tokens=16, overlap=4)
    enriched = chunks.join(
        split.select("doc_id", "lang", "split"), "doc_id"
    )
    packed = textf.pack_chunks(
        enriched, budget=64, partition_cols=("split", "lang")
    )
    return packed.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("pack_id").alias("n_packs"),
        F.sum("chunk_n_tokens").cast("bigint").alias("sum_tokens"),
    )


def q_concurrent_sessions(spark, sf_dir):
    """Peak session concurrency per hour (ev.concurrent_sessions):
    sweep line over sessionize boundaries — +1/-1 deltas, bucket-cumsum
    decomposition of the global running sum (hour-level offsets + a
    within-hour window), so no corpus-sized ordered window exists. All
    integer epoch arithmetic; the oracle replays the identical
    (t, delta, user, session) total order as one SQL window."""
    ensure_query_conf(spark)
    return ev.concurrent_sessions(
        read_events(spark, sf_dir), gap_minutes=10
    ).select(
        F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        ),
        "max_active",
        "n_boundaries",
    )


def q_session_paths(spark, sf_dir):
    """Top-20 within-session event-type trigrams (ev.session_paths):
    the sequence-mining counterpart of event_transitions' bigrams —
    gaps-and-islands ordinal + two LEADs in (ts, event_id) order,
    counted corpus-wide, ties broken lexicographically."""
    return ev.session_paths(
        read_events(spark, sf_dir), gap_minutes=240, top=20
    ).select(
        "t0", "t1", "t2", F.col("n_paths").cast("bigint").alias("n_paths")
    )


def q_clique_profile_parts(spark, sf_dir):
    """Two-rung clique-ladder profile of the FREQUENTLY co-ordered
    parts graph (edges = part pairs sharing ≥2 orders): top-20 nodes by
    triangle membership with their 4-clique membership alongside
    (analytics.clique_ladder_profile). The K4 stage extends oriented
    triangles by one oriented edge + two semi-join closure checks —
    candidate volume bounded by the O(√m) oriented out-degree. The
    min-support threshold is the clique-miner discipline that keeps K4
    populations from exploding combinatorially on dense co-occurrence
    graphs (the raw sf0.001 co-order graph is 45% dense — millions of
    K4s; support ≥2 thins it to the genuinely recurring structure).
    The oracle enumerates a<b<c<d with all six edges present
    (membership counts are orientation-independent)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("a", "b")
    )
    return analytics.clique_ladder_profile(pairs, top=20)


def q_negative_edges_coorder(spark, sf_dir):
    """Deterministic link-prediction negative sampling on the part
    co-order graph (analytics.negative_edge_samples): md5-bucketed
    candidate pairs (never all-pairs), anti-joined against the edge
    list, top-2 per node by md5 rank — the labeled-negatives half of a
    training set whose positives are the co-order edges."""
    return analytics.negative_edge_samples(
        _coorder_pairs(spark, sf_dir), buckets="auto", k=2
    )


def q_fastrp_parts(spark, sf_dir):
    """Integer FastRP node embeddings on the part co-order graph
    (analytics.hash_projection_embeddings): ±1 md5-parity seeds, two
    neighborhood-sum propagation rounds in (node, dim) long format —
    the PageRank superstep shuffle shape with exact-BIGINT values, so
    the embedding is partition-order-independent and the oracle unrolls
    both rounds as SQL joins."""
    return analytics.hash_projection_embeddings(
        _coorder_pairs(spark, sf_dir), dims=4, rounds=2
    )


def q_phrase_search(spark, sf_dir):
    """Exact phrase search (searchf.phrase_search): documents containing
    "big order scan" as a contiguous token run, with overlapping-aware
    occurrence counts and first match position — positional-posting
    intersection (one tokenize pass filtered to the 3 phrase terms,
    then 2 equi-joins on (doc, pos-i)), the inverted-index operator
    bag-of-terms BM25 can't express. The oracle replays the identical
    positional joins over string_split tokens."""
    return searchf.phrase_search(
        read_documents(spark, sf_dir), "big order scan", top=20
    )


def q_entity_linkage_parts(spark, sf_dir):
    """Fuzzy record linkage over part names (linkage.entity_linkage):
    blocking on the name's first token (candidates never cross blocks —
    the standard ER recall/cost tradeoff), a LOSSLESS length-difference
    prefilter, then a levenshtein <= 2 verify; top-20 pairs by
    (distance, id_a, id_b). Both engines implement textbook
    Wagner-Fischer edit distance, so the verify is hash-exact."""
    from akka_graph_db_spark.functions.linkage import entity_linkage

    parts = spark.read.parquet(f"{sf_dir}/part.parquet")
    return entity_linkage(
        parts, "p_partkey", "p_name", max_distance=2, top=20
    )


def q_ra_link_prediction(spark, sf_dir):
    """Resource-Allocation link prediction on the part co-order graph
    (analytics.link_prediction_resource_allocation): non-adjacent pairs
    scored by sum over common neighbors z of 1000000 div deg(z) — the
    inverse-degree-weighted cousin of link_prediction_parts' Jaccard,
    in exact integer parts-per-million so the ranking is
    partition-order-independent. Same max_degree=100 wedge cap as the
    Jaccard entry (dropped hub centers are exactly the terms RA
    discounts to ~0); top-20 by (ra_ppm desc, common desc, a, b)."""
    return analytics.link_prediction_resource_allocation(
        _coorder_pairs(spark, sf_dir),
        top_k=20,
        min_common=2,
        max_degree=100,
    )


def q_degree_anomalies_parts(spark, sf_dir):
    """Robust degree-outlier report on the part co-order graph
    (analytics.degree_anomalies): nodes whose degree deviates from the
    exact LOWER-median degree by more than 3x the median absolute
    deviation — integer-rank medians off the degree histogram (one row
    per distinct degree), so no corpus-sized window exists and the
    oracle reproduces both medians bit-for-bit."""
    return analytics.degree_anomalies(
        _coorder_pairs(spark, sf_dir), top=20
    )


def q_rolling_active_users(spark, sf_dir):
    """Trailing-7-day distinct active users per day
    (ev.rolling_active_users) — the windowed COUNT(DISTINCT) that is
    NOT decomposable (per-day counts can't sum), computed by collapsing
    events to the distinct (user, day) frame and range-joining the
    broadcast day spine against it. Day rendered as an ISO string so
    both engines hash the same value."""
    return ev.rolling_active_users(
        read_events(spark, sf_dir), window_days=7
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("active_users").cast("bigint").alias("active_users"),
    )


def q_scd2_user_state(spark, sf_dir):
    """Slowly-changing-dimension (type 2) build (ev.scd2_intervals):
    each user's event_type change log collapsed to validity intervals
    [valid_from, valid_to), the open interval flagged is_current — the
    gaps-and-islands run-length encoding that turns a change log into
    an as-of-joinable dimension. Output bounded by value CHANGES, not
    events; timestamps rendered as ISO strings for cross-engine
    hashing."""
    out = ev.scd2_intervals(read_events(spark, sf_dir))
    fmt = "yyyy-MM-dd HH:mm:ss"
    return out.select(
        "user_id",
        "attr",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "is_current",
    )


def q_time_weighted_value(spark, sf_dir):
    """Per-user time-weighted value integral (ev.time_weighted_value):
    Σ value·Δt-to-next-event in exact DECIMAL (values are 2-decimal
    doubles, Δt integer seconds — no IEEE accumulation anywhere), cast
    to double only at publish; tw_avg = twv/span rounded to 6 dp, NULL
    for single-event users (no elapsed time — and Spark 4 ANSI raises
    on /0, so the guard is explicit)."""
    return ev.time_weighted_value(read_events(spark, sf_dir))


def q_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (searchf.textrank_keywords): 6
    fixed iterations of weighted PageRank over the corpus word
    co-occurrence graph (adjacent-token pairs, corpus-wide counts as
    weights, undirected). Top-20 words by full-precision rank, rounded
    to 6 dp last — the oracle unrolls the identical recurrence as
    MATERIALIZED CTEs (_textrank_oracle)."""
    return searchf.textrank_keywords(
        read_documents(spark, sf_dir), n_iter=6, damping=0.85, top=20
    )


def q_wl_colors_parts(spark, sf_dir):
    """1-WL color refinement on the part co-order graph
    (analytics.wl_color_histogram): 2 rounds of
    md5(own color | sorted neighbor-color multiset) from degree-seeded
    colors; top-20 final colors by population — the structural-role
    fingerprint (graph-isomorphism / GNN-expressiveness primitive).
    sort_array canonicalizes the multiset so every color is
    partition-order-independent; the oracle replays the rounds with
    string_agg(... ORDER BY ...)."""
    return analytics.wl_color_histogram(
        _coorder_pairs(spark, sf_dir), rounds=2, top=20
    )


def q_event_bursts(spark, sf_dir):
    """Robust temporal burst detection (ev.event_bursts): hours whose
    per-type event count exceeds the type's integer-rank median hourly
    count by more than 3x the MAD — the degree_anomalies median/MAD
    discipline applied to time buckets, exact integers end to end."""
    return ev.event_bursts(read_events(spark, sf_dir), k_mad=3, top=20)


def q_dag_layers_graph(spark, sf_dir):
    """Longest-path (topological) layering of the property graph
    (analytics.dag_layers) — the tpch graph is a DAG by construction
    (customer -> order -> part -> supplier -> nation -> region), so
    the critical-path depth assignment converges in 5 rounds; the
    operator RAISES on non-convergence (a cycle) rather than returning
    a partial layering. Output: per-(label, layer) node counts; oracle
    unrolls the monotone max-relaxation (_dag_layers_oracle)."""
    g = _g(spark, sf_dir)
    return analytics.dag_layers(g.nodes, g.edges).select(
        "label", "layer", F.col("n_nodes").cast("bigint").alias("n_nodes")
    )


def q_equidepth_prices(spark, sf_dir):
    """Exact 10-bucket equi-depth histogram of o_totalprice
    (profilef.equidepth_histogram): bucket = (rank-1)*10 div n with the
    global ROW_NUMBER from ranking.global_rank (range repartition +
    per-partition windows — never a single-partition sort) and
    (o_totalprice, o_orderkey) as the tie-broken total order. Integer
    rank math end to end; the oracle replays the same bucket
    assignment off ROW_NUMBER()."""
    from akka_graph_db_spark.functions.profile import (
        equidepth_histogram,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return equidepth_histogram(
        orders, "o_totalprice", "o_orderkey", k=10
    )


def q_edge_embeddedness(spark, sf_dir):
    """Tie-strength profile of the part co-order graph
    (analytics.edge_embeddedness): top-20 edges by triangle support
    (|N(a) ∩ N(b)|, the Granovetter embeddedness) plus one
    tie='weak_total' row counting the zero-support (bridge-like)
    edges. Support = the O(m^1.5) oriented triangle enumeration
    exploded into its 3 canonical edges + one count groupBy —
    triangle-bounded, never wedge-bounded."""
    return analytics.edge_embeddedness(
        _coorder_pairs(spark, sf_dir), top_k=20
    )


def q_seeded_labels_parts(spark, sf_dir):
    """Semi-supervised brand propagation over the part co-order graph
    (analytics.seeded_label_propagation): every 10th part is a clamped
    p_brand seed, 3 synchronous majority-vote rounds label the rest —
    integer votes, ties to the smallest label, previous label kept
    when no neighbor is labeled. Deterministic end to end; the oracle
    unrolls the identical rounds (_slpa_oracle)."""
    parts = spark.read.parquet(f"{sf_dir}/part.parquet")
    seeds = parts.where(F.col("p_partkey") % 10 == 0).select(
        F.col("p_partkey").alias("id"), F.col("p_brand").alias("label")
    )
    return analytics.seeded_label_propagation(
        _coorder_pairs(spark, sf_dir), seeds, rounds=3
    )


def q_store_version_diff(spark, sf_dir):
    """Row-level store change manifest (store.version_diff): the same
    v0→v1 fixture as store_version_summary (customer-1 props update +
    supplier-1 removal with edge cascade), but answering WHICH rows
    changed — (kind, id, change) via full-outer merge-on-read diffs of
    the two versions, props compared as sorted entry arrays. The
    oracle derives the exact manifest relationally: the updated/removed
    node ids are the fixture's, the removed edge ids are every edges_v
    row incident to supplier 1."""
    import atexit
    import shutil
    import tempfile

    from akka_graph_db_spark import store

    g = _g(spark, sf_dir).core()
    g2 = crud.update_nodes(
        g, {CUSTOMER_BASE + 1: {"mktsegment": "TRAVELED"}}
    )
    g2 = crud.remove_nodes_by_id(g2, [SUPPLIER_BASE + 1])
    root = tempfile.mkdtemp(prefix="spark_graft_vd_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    store.save_snapshot(g, root)
    store.save_delta(root, store.delta_from_graphs(g, g2), validate=False)
    return store.version_diff(root, 0, 1, spark)


def q_cc_incremental_geo(spark, sf_dir):
    """O(changes) connected-components maintenance
    (analytics.connected_components_incremental): start from the geo
    CC assignment (5 region components), ingest a 2-edge "trade route"
    batch linking regions 0-2 and 1-3 — the CC fixpoint then runs on
    the FIVE-node component graph, never the full graph, and joins
    back as a remap. Min-id labels compose, so the oracle is the geo
    CC oracle with the two merges applied closed-form."""
    g = _g(spark, sf_dir)
    cc = analytics.connected_components(
        g, edge_labels=["in_region", "located_in"]
    )
    geo = g.nodes.where(
        F.col("label").isin("region", "nation", "customer", "supplier")
    ).select("id")
    assign = cc.join(geo, "id", "left_semi")
    batch = spark.createDataFrame(
        [
            (REGION_BASE + 0, REGION_BASE + 2),
            (REGION_BASE + 1, REGION_BASE + 3),
        ],
        "a bigint, b bigint",
    )
    return analytics.connected_components_incremental(assign, batch)


def q_doc_length_percentiles(spark, sf_dir):
    """Per-source percentile-rank normalization of document length
    (profilef.percentile_by_group): each doc's integer permille of
    same-source docs with n_chars <= its own — rank-based feature
    scaling whose ordered window runs over the per-(source, value)
    HISTOGRAM, never the corpus (the quantile_filter discipline).
    Exact integer permille; the oracle replays the same cumsum+DIV."""
    from akka_graph_db_spark.functions.profile import (
        percentile_by_group,
    )

    return percentile_by_group(
        read_documents(spark, sf_dir), "source", "n_chars", "doc_id"
    )


def q_label_path_census(spark, sf_dir):
    """Length-3 directed path census by (src_label, dst_label)
    (analytics.label_path_census): the adjacency-power A^3 aggregated
    by label via count propagation — intermediate state is
    |V|x|labels| BIGINT counts, never an enumerated path list. The
    oracle DOES enumerate (3 unrolled joins) and must agree exactly —
    the strongest possible cross-check of the propagation."""
    g = _g(spark, sf_dir)
    return analytics.label_path_census(g.nodes, g.edges, k=3)


def q_basket_triples(spark, sf_dir):
    """Frequent 3-itemsets over orders (ev.frequent_triples): part
    triples co-ordered in >= 2 orders, Apriori-pruned by the frequent
    PAIR set before the 3-way within-basket join (lossless by support
    monotonicity — the oracle enumerates directly and must agree).
    Top-20 by (support desc, a, b, c), exact BIGINT support."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return ev.frequent_triples(li, min_support=2, top=20)


def q_price_qty_correlation(spark, sf_dir):
    """Exact-moment Pearson correlation of l_quantity vs
    l_extendedprice (profilef.column_correlation): one aggregation of
    exact DECIMAL component sums (n, Σx, Σy, Σxy, Σx², Σy²), floats
    only in the final closed form — partition-order-independent where
    a streaming corr() is not. Both engines compute the identical
    left-associated expression, rounded to 6 dp."""
    from akka_graph_db_spark.functions.profile import (
        column_correlation,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return column_correlation(li, "l_quantity", "l_extendedprice")


def q_interval_coverage(spark, sf_dir):
    """Per-user active-time coverage (ev.interval_coverage): events
    expanded to 10-minute intervals, overlaps merged by the
    gaps-and-islands running-MAX trick, covered seconds summed
    exactly per island — the metric naive duration sums overcount.
    Integer epoch seconds end to end (oracle uses floor(epoch()) for
    the truncation parity)."""
    return ev.interval_coverage(
        read_events(spark, sf_dir), window_minutes=10
    )


def q_local_clustering_parts(spark, sf_dir):
    """Top-20 part co-order nodes by local clustering coefficient
    (analytics.local_clustering): triangles(v) / C(deg,2) from the
    degree-oriented triangle counts — exact integer counts, one IEEE
    division rounded to 6 dp; ties broken by id."""
    return analytics.local_clustering(
        _coorder_pairs(spark, sf_dir), top=20, min_degree=2
    )


def q_event_trends(spark, sf_dir):
    """Per-type daily-count trend (ev.event_trends): the regression
    slope numerator n·Σxy − Σx·Σy over (day index, daily count) as an
    exact BIGINT — sign = rising/falling with zero float accumulation;
    the IEEE slope is published rounded for reference."""
    return ev.event_trends(read_events(spark, sf_dir))


def q_k_anonymity_customers(spark, sf_dir):
    """k-anonymity audit of customers under the (c_nationkey,
    c_mktsegment) quasi-identifier (profilef.k_anonymity_report, k=5):
    exact integer group sizes, rows/groups below k, integer-DIV
    permille — one groupBy + one rollup, no floats anywhere."""
    from akka_graph_db_spark.functions.profile import (
        k_anonymity_report,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return k_anonymity_report(
        cust, ["c_nationkey", "c_mktsegment"], k=5
    )


def q_fd_discovery_part(spark, sf_dir):
    """Functional-dependency discovery over part columns
    (profilef.fd_discovery on p_name/p_brand/p_type/p_size): which
    column determines which, with exact violation counts — the
    schema-discovery primitive behind key inference; one
    groupBy+countDistinct per ordered pair."""
    from akka_graph_db_spark.functions.profile import fd_discovery

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return fd_discovery(
        part, ["p_name", "p_brand", "p_type", "p_size"]
    )


def q_matching_parts(spark, sf_dir):
    """Deterministic maximal matching on the part co-order graph
    (analytics.maximal_matching, 5 Luby-style rounds): each round
    keeps edges whose md5 key is minimal at BOTH endpoints (an
    independent set of the line graph), removes matched vertices —
    reproducible on any partitioning; the oracle unrolls the same
    rounds (_matching_oracle)."""
    return analytics.maximal_matching(
        _coorder_pairs(spark, sf_dir), rounds=5
    )


def q_skyline_parts(spark, sf_dir):
    """Pareto frontier of the part catalog — maximize p_size, minimize
    p_retailprice (functions/skyline.py): the classic multi-criteria
    OLAP operator, two-phase distributed (per-partition numpy skyline
    inside mapInPandas, then one global pass over the tiny local-
    skyline union). Oracle: NOT EXISTS strict-dominance, the textbook
    definition."""
    from akka_graph_db_spark.functions.skyline import skyline

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    return skyline(
        part, maximize=["p_size"], minimize=["p_retailprice"]
    )


def q_sample_per_source(spark, sf_dir):
    """Deterministic 50-doc-per-source carve (mixture.
    sample_k_per_group): md5_63 hash rank within source — the
    reusable-holdout primitive (stable prefix per group across corpus
    snapshots). One window, one shuffle; rank is certified exactly
    against DuckDB's identical md5 ordering."""
    from akka_graph_db_spark.functions.mixture import (
        sample_k_per_group,
    )

    docs = read_documents(spark, sf_dir).select("doc_id", "source")
    return sample_k_per_group(
        docs, k=50, group_col="source", key_col="doc_id"
    )


def q_winsorize_orders(spark, sf_dir):
    """Per-priority winsorized order totals (profilef.
    winsorize_by_group at 1%/99% rank cuts): exact type-1 quantile
    cuts via the histogram-windowed integer-rank discipline, DECIMAL
    sums — the outlier-clamped mean's numerator with zero float
    accumulation. The sum is emitted in exact BIGINT cents: the raw
    DECIMAL sum widens past precision 18, which is hash-unsafe across
    engines (the order_reconciliation lesson — DuckDB's pandas
    round-trip degrades wide decimals to float64)."""
    from akka_graph_db_spark.functions.profile import (
        winsorize_by_group,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias(
            "o_totalprice"
        ),
    )
    w = winsorize_by_group(
        orders, "o_orderpriority", "o_totalprice",
        lower_permille=10, upper_permille=990,
    )
    return w.select(
        "o_orderpriority", "n", "lo_cut", "hi_cut",
        "n_clipped_low", "n_clipped_high",
        (F.col("winsorized_sum") * 100)
        .cast("bigint")
        .alias("winsorized_sum_cents"),
    )


def q_l_diversity_customers(spark, sf_dir):
    """l-diversity audit (profilef.l_diversity_report, l=2): under
    the (c_nationkey, c_mktsegment) quasi-identifier, how many groups
    expose a uniform account-balance SIGN — the disclosure k-anonymity
    alone misses. Exact integers, one groupBy + countDistinct."""
    from akka_graph_db_spark.functions.profile import (
        l_diversity_report,
    )

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            "c_nationkey",
            "c_mktsegment",
            (F.col("c_acctbal") < 0).alias("bal_negative"),
        )
    )
    return l_diversity_report(
        cust, ["c_nationkey", "c_mktsegment"], "bal_negative", l=2
    )


def q_reorder_gaps(spark, sf_dir):
    """Customer reorder cadence per market segment (ev.
    interarrival_quantiles): integer-day gaps between consecutive
    orders per customer, then exact type-1 median/p90 per segment via
    the histogram-windowed rank discipline — the churn-model feature
    with no float quantile semantics."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = orders.select(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).join(F.broadcast(cust), "o_custkey")
    return ev.interarrival_quantiles(
        joined,
        key_col="o_custkey",
        ts_col="o_orderdate",
        group_col="c_mktsegment",
        order_col="o_orderkey",
    ).orderBy("c_mktsegment")


def q_katz_parts(spark, sf_dir):
    """Truncated Katz centrality (analytics.katz_centrality, walks up
    to length 3, beta=1/1000) on the part co-order graph — top-20 by
    the EXACT BIGINT nano-score (walk counts x 1000^(3-l): zero float
    accumulation, so ranking is engine-reproducible). Oracle: the same
    A^l count propagation as chained grouped self-joins."""
    k = analytics.katz_centrality(
        _coorder_pairs(spark, sf_dir), max_len=3, beta_permille=1
    )
    return k.orderBy(F.col("katz_nano").desc(), F.col("id")).limit(20)


def q_brand_mixing_parts(spark, sf_dir):
    """Brand mixing matrix of the part co-order graph (analytics.
    category_mixing): distinct co-order edges bucketed by canonical
    endpoint-brand pair — the Newman e_ij table behind categorical
    assortativity ("do same-brand parts co-occur in orders?"). Two
    broadcast joins + one groupBy, exact integers."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"),
        F.col("p_brand").alias("category"),
    )
    return analytics.category_mixing(
        _coorder_pairs(spark, sf_dir), part
    )


def _trade_corridors(spark, sf_dir):
    """Top-40 nation trade corridors: directed supplier-nation ->
    customer-nation edges ranked by exact DECIMAL shipped quantity —
    the shared derived digraph behind scc_condensation_trade and
    bowtie_trade. Dimension joins broadcast; the top-40 cut is
    deterministic (quantity DESC, then keys)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    edges = (
        li.select("l_orderkey", "l_suppkey", "l_quantity")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("a"),
            F.col("c_nationkey").alias("b"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("_q")
        )
        .orderBy(F.col("_q").desc(), "a", "b")
        .limit(40)
        .select("a", "b")
    )
    return edges


def q_scc_condensation_trade(spark, sf_dir):
    """Condensation DAG of the top-40 nation trade corridors
    (analytics.scc_condensation): SCCs (mutual-trade blocs)
    contracted to super-nodes, original corridors counted between
    distinct blocs — the acyclic trade-flow summary. Oracle: the same
    corridors through a 5-doubling closure + the condensation join."""
    return analytics.scc_condensation(
        _trade_corridors(spark, sf_dir)
    ).orderBy("scc_a", "scc_b")


def q_bowtie_trade(spark, sf_dir):
    """Bow-tie decomposition (Broder et al.) of the trade-corridor
    digraph (analytics.bowtie_classes): largest mutual-trade bloc as
    CORE, nations that only FEED it (IN), only CONSUME from it (OUT),
    or sit outside the flow (OTHER) — the macro-structure report for
    any flow graph. All classification joins are semi-joins against
    the tiny core member set; the core choice is a 1-row argmax
    aggregation, never a collect."""
    return analytics.bowtie_classes(
        _trade_corridors(spark, sf_dir)
    ).orderBy("id")


def q_dedup_recall_eval(spark, sf_dir):
    """Measured LSH recall on a deterministic 1500-doc sample
    (dedup.dedup_recall_eval, threshold 0.9, 64 perms x 16 bands):
    exact all-pairs truth via a 32x32 grid equi-join (never a
    cartesian) vs the real banded pipeline — recall certified at 1000
    permille on this corpus (the keep-family oracles' standing
    100%-recall premise, now measured by the engine itself rather
    than assumed)."""
    from akka_graph_db_spark.functions.dedup import dedup_recall_eval

    docs = read_documents(spark, sf_dir)
    return dedup_recall_eval(
        docs, threshold=0.9, num_perm=64, bands=16, shingle_n=1,
        sample_k=1500,
    )


def q_dedup_cluster_stats(spark, sf_dir):
    """Near-dup cluster size histogram (dedup.dedup_cluster_stats,
    threshold 0.9): (cluster_size, n_clusters, n_docs) over connected
    components of the exact-verified near-dup graph, singletons
    included — the removal-audit table every dedup run ships. Same
    answer as the direct-route `dup_cluster_histogram` (plus the
    n_docs column) but through the EXACT-DUP COLLAPSE first: a
    1400-copy boilerplate cluster contributes ~1M verified pairs to
    the direct route's CC and ONE representative here — the
    adversarial-scale variant, benchmarked side by side. Oracle: the
    keep-family transitive closure reduced to a size histogram."""
    from akka_graph_db_spark.functions.dedup import dedup_cluster_stats

    docs = read_documents(spark, sf_dir)
    return dedup_cluster_stats(docs, threshold=0.9).orderBy(
        "cluster_size"
    )


def q_dedup_manifest(spark, sf_dir):
    """Removal manifest under min-id keep (dedup.dedup_manifest,
    threshold 0.9): one (survivor_id, removed_id) row per removed doc
    — the lineage artifact a curation run ships; complement of the
    dedup_minhash_keep survivor set off the same clustering substrate.
    Oracle: the keep-family closure filtered to non-survivors."""
    from akka_graph_db_spark.functions.dedup import dedup_manifest

    docs = read_documents(spark, sf_dir)
    return dedup_manifest(docs, threshold=0.9)


def q_source_concentration(spark, sf_dir):
    """Per-source token-mass Pareto audit (text.source_concentration,
    target 800 permille): how few docs hold 80% of each source's
    tokens + the top doc's share — computed over the per-(source,
    length) histogram with an exact interior ceil division, never a
    per-doc window. The doc-level-capping signal mixture design needs
    before reweighting sources."""
    from akka_graph_db_spark.functions.text import source_concentration

    docs = read_documents(spark, sf_dir)
    return source_concentration(docs, target_permille=800).orderBy(
        "source"
    )


def q_rfm_quintiles(spark, sf_dir):
    """RFM customer-value grid (ranking.rfm_segments, quintiles):
    recency anchored to the data's max order date via a 1-row
    broadcast, frequency and exact-DECIMAL monetary ranked with
    integer-div tiles and id tiebreaks — one row per occupied
    (r, f, m) cell. Windows run over the per-customer aggregate, not
    the order log (single-partition caveat documented in the
    function)."""
    from akka_graph_db_spark.functions.ranking import rfm_segments

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return rfm_segments(orders).orderBy("r_tile", "f_tile", "m_tile")


def q_pq_codes(spark, sf_dir):
    """Product-quantization encoding (similarity.pq_codes: 4 subspaces
    x 16 codewords, 2 Lloyd iterations per subspace on the integer
    grid): (vec_id, code_0..3, quant_err) — m·log2(k) bits per vector
    instead of dim floats, the memory scaling that makes
    billion-vector ANN fit. Bit-reproducible end to end; the oracle
    unrolls all four subspace kmeans runs in SQL."""
    from akka_graph_db_spark.functions.similarity import pq_codes

    emb = read_embeddings(spark, sf_dir)
    codes, _ = pq_codes(emb, m=4, k=16, n_iter=2)
    return codes


def q_pq_topk(spark, sf_dir):
    """PQ asymmetric-distance top-10 (similarity.pq_topk) for the 5
    lowest-id query vectors: full-precision query sub-vectors against
    the assigned codewords, summed per subspace — every number exact
    integer-grid, so the approximate ranking is itself
    bit-deterministic and SQL-certified."""
    from akka_graph_db_spark.functions.similarity import pq_topk

    emb = read_embeddings(spark, sf_dir)
    queries = emb.orderBy("vec_id").limit(5)
    return pq_topk(emb, queries, k_neighbors=10, m=4, k=16, n_iter=2)


def q_kmeans_ari(spark, sf_dir):
    """Adjusted Rand Index of the deterministic k-means clustering vs
    the embeddings' ground-truth labels (similarity.
    clustering_label_agreement, k=8, 3 iterations): exact BIGINT
    pair-count sums via the C(n,2) identity over the contingency
    table (pairs never materialized), one closed-form float at the
    end with identical association in the oracle."""
    from akka_graph_db_spark.functions.similarity import (
        clustering_label_agreement,
    )

    emb = read_embeddings(spark, sf_dir)
    return clustering_label_agreement(emb, k=8, n_iter=3)


def q_embedding_dim_profile(spark, sf_dir):
    """Per-dimension embedding health profile (similarity.
    embedding_dim_profile): min/max/lower-median/distinct/zero counts
    per dimension, every statistic on the exact 1e-6 integer grid —
    the dead-dimension / collapsed-variance gate before ANN or
    clustering runs. Median windows run over the per-dimension value
    HISTOGRAM, never the corpus."""
    from akka_graph_db_spark.functions.similarity import (
        embedding_dim_profile,
    )

    emb = read_embeddings(spark, sf_dir)
    return embedding_dim_profile(emb).orderBy("dim_idx")


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training (similarity.
    hard_negatives): for the 5 lowest-id query vectors, the 5 nearest
    DIFFERENT-label neighbors by exact int64 grid distance (numpy
    matmul per Arrow batch, id tiebreaks) — near in embedding space,
    wrong by ground truth: the pairs a contrastive loss learns most
    from."""
    from akka_graph_db_spark.functions.similarity import hard_negatives

    emb = read_embeddings(spark, sf_dir)
    queries = emb.orderBy("vec_id").limit(5)
    return hard_negatives(emb, queries, k=5)


def q_streaming_dedup_ingest(spark, sf_dir):
    """At-ingest streaming near-dup filter (streaming/ingest.py
    StreamingCrossDedup): the 20% incoming slice streamed in 4 real
    micro-batches (maxFilesPerTrigger=1) against the 80% base
    corpus's ONE-TIME persisted LSH index + shingle sets. Per-doc
    matches are independent of batch boundaries, so the accumulated
    stream output is bit-identical to the one-shot batch run — the
    oracle is dedup_incremental's exact cross all-pairs SQL
    verbatim."""
    import os
    import tempfile

    from akka_graph_db_spark.streaming.ingest import StreamingCrossDedup

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    docs = read_documents(spark, sf_dir)
    new = docs.where(F.col("doc_id") % 10 >= 8)
    base = docs.where(F.col("doc_id") % 10 < 8)
    tmp = tempfile.mkdtemp(prefix="sxdedup_")
    src = os.path.join(tmp, "src")
    if _stage_needs_spark(f"{sf_dir}/documents.parquet"):
        _stage_spark_files(new, src, n_files=4)
    else:
        dt = pq.read_table(f"{sf_dir}/documents.parquet")
        ten = pa.scalar(10, pa.int64())
        # doc_id % 10 (pyarrow.compute has no mod; ids are non-negative,
        # so truncating integer divide matches Spark's % here)
        rem = pc.subtract(
            dt["doc_id"], pc.multiply(pc.divide(dt["doc_id"], ten), ten)
        )
        _stage_arrow_files(
            dt.filter(pc.greater_equal(rem, 8)), src, n_files=4
        )
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    xd = StreamingCrossDedup(
        base, threshold=0.9, num_perm=64, bands=16, shingle_n=1
    )
    try:
        return xd.run(
            stream, os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
        )
    finally:
        xd.close()


def q_gini_order_values(spark, sf_dir):
    """Per-priority Gini coefficient of order values in exact integer
    cents (profilef.gini_by_group): the sorted-rank identity
    2·Σ rank·x − (n+1)·Σx folded over the per-(group, value)
    histogram — gini_numerator is an exact BIGINT, the coefficient one
    closed-form float. The whale-vs-broad-base inequality audit that
    complements source_concentration's Pareto view."""
    from akka_graph_db_spark.functions.profile import gini_by_group

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    return gini_by_group(orders, "o_orderpriority", "cents").orderBy(
        "o_orderpriority"
    )


def q_order_reconciliation(spark, sf_dir):
    """Cross-table consistency audit (profilef.sum_reconciliation):
    o_totalprice vs the recomputed Σ extendedprice·(1−disc)·(1+tax)
    per order, in exact DECIMAL end to end — per priority: match /
    mismatch / no-lineitem counts and exact diff extremes. On this
    synthetic fixture the invariant NEVER holds (every order
    mismatches) and some orders have no lines — precisely what a
    reconciliation must surface rather than paper over."""
    from akka_graph_db_spark.functions.profile import sum_reconciliation

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("amount"),
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    calc = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(5,2)"))
            * (F.lit(1) + F.col("l_tax").cast("decimal(5,2)"))
        ).alias("calc")
    ).select(F.col("l_orderkey").alias("o_orderkey"), "calc")
    return sum_reconciliation(
        orders, calc, "o_orderkey", "o_orderpriority"
    ).orderBy("o_orderpriority")


def q_label_noise_knn(spark, sf_dir):
    """kNN label-noise audit (similarity.label_noise_knn, k=10): per
    label, how often members' 10 nearest neighbors (exact int64 grid
    distances, id tiebreaks) carry a different label — mislabeled data
    or unseparable classes surface as high disagree_ppm before any
    training run. One numpy matmul pass; |labels| output rows."""
    from akka_graph_db_spark.functions.similarity import label_noise_knn

    emb = read_embeddings(spark, sf_dir)
    return label_noise_knn(emb, k=10).orderBy("label")


def q_budget_trim_docs(spark, sf_dir):
    """Per-source token-budget enforcement (mixture.budget_trim, 300
    tokens per source): the longest md5-ranked document prefix whose
    running token total fits — the execution step that turns planned
    mixture shares into an actual corpus cut, deterministic and
    stable under corpus growth. One window; exact integers."""
    from akka_graph_db_spark.functions.mixture import budget_trim

    docs = read_documents(spark, sf_dir)
    return budget_trim(docs, budget_tokens=300)


def q_importance_scores_docs(spark, sf_dir):
    """DSIR-style data selection (mixture.importance_scores): tokens
    hash into 1024 buckets; bucket weight = target token-share ppm
    minus background ppm (src0 is the in-domain target); doc score =
    sum of its tokens' weights — exact BIGINTs, no transcendentals.
    Top-25 background docs by in-domain likeness; the resampling
    shortlist. Oracle reproduces bucket hashing (md5_number_upper),
    ppm division, and the score sum bit-for-bit."""
    from akka_graph_db_spark.functions.mixture import importance_scores

    docs = read_documents(spark, sf_dir)
    s = importance_scores(docs, target=F.col("source") == "src0")
    return (
        s.where(~F.col("is_target"))
        .select("doc_id", "n_tokens", "score")
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(25)
    )


def q_neighborhood_function_trade(spark, sf_dir):
    """Exact neighborhood function N(r) (analytics.neighborhood_function,
    Palmer et al. ANF) of the undirected trade-corridor graph, radius
    0..4: ordered pairs within distance r plus per-radius growth — the
    distance-distribution / effective-diameter report. Exact
    distinct-pair supersteps on the bounded derived digraph (the
    closure-family contract); at web scale the documented swap is
    per-node HLL registers (HyperANF) with this exact operator as the
    small-graph correctness reference."""
    from akka_graph_db_spark.operators.analytics import (
        neighborhood_function,
    )

    return neighborhood_function(
        _trade_corridors(spark, sf_dir), max_radius=4
    ).orderBy("r")


def q_balanced_shards_docs(spark, sf_dir):
    """Size-balanced shard packing (mixture.balanced_shards, 8 shards):
    docs take shards round-robin in global (tokens DESC, id) order —
    sorted-greedy load balancing without a single-partition ORDER BY
    (ranking.global_rank range shuffle underneath). Per-shard summary:
    the writer's balance audit. Oracle reproduces the total order, the
    modulo assignment, and the exact token sums."""
    from akka_graph_db_spark.functions.mixture import balanced_shards

    docs = read_documents(spark, sf_dir)
    sh = balanced_shards(docs, n_shards=8)
    return (
        sh.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_tokens").cast("bigint").alias("total_tokens"),
            F.max("_tokens").cast("bigint").alias("max_tokens"),
        )
        .orderBy("shard")
    )


def q_tokenizer_fertility_docs(spark, sf_dir):
    """Per-source tokenizer fertility (text.tokenizer_fertility):
    BPE-ish subword units per whitespace word and per character, exact
    integer permille — the cost model behind token budgets (code and
    noisy sources burn budget faster than word counts suggest). One
    map-side aggregation to |sources| rows; zero Python."""
    from akka_graph_db_spark.functions.text import tokenizer_fertility

    docs = read_documents(spark, sf_dir)
    return tokenizer_fertility(docs).orderBy("source")


def q_semantic_decontam(spark, sf_dir):
    """Cross-set semantic decontamination
    (dedup.embedding_decontamination): eval vectors with a cosine ≥0.95
    train neighbor — the paraphrase-leakage check n-gram decontam
    misses. The eval set PLANTS exact copies of train vec_id < 10 (the
    natural corpus has no near-dups, max pairwise cosine ≈ 0.51), so
    LSH recall is exactly 100% and the brute-force SQL oracle applies
    — same plant-based determinism argument as embedding_dedup_pairs.
    Eval side broadcast: the train corpus streams through one scan."""
    from akka_graph_db_spark.functions.dedup import (
        embedding_decontamination,
    )

    emb = read_embeddings(spark, sf_dir)
    eval_df = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return (
        embedding_decontamination(emb, eval_df, threshold=0.95)
        .select("eval_id", "train_id")
        .orderBy("eval_id", "train_id")
    )


def q_nearest_seed_parts(spark, sf_dir):
    """Graph Voronoi labeling (analytics.nearest_seed): every part
    within 3 hops of the 8 lowest-id seed parts is assigned its
    CLOSEST seed (hop distance, seed-id tiebreak) on the co-order
    graph — multi-source BFS with one concurrent frontier, argmin via
    the min-struct trick (no window). Oracle = recursive-CTE BFS with
    the same (d, s) lexicographic argmin."""
    from akka_graph_db_spark.operators.analytics import nearest_seed

    return nearest_seed(
        _coorder_pairs(spark, sf_dir), seeds=8, max_depth=3
    ).orderBy("id")


def q_streaming_histogram(spark, sf_dir):
    """§2.9 mergeable streaming histogram (streaming/sketch.py
    StreamingHistogram): fixed-width bin counts accumulated over a
    4-micro-batch event-value stream (maxFilesPerTrigger=1 forces real
    multi-batch merging). Bin counts ADD, so the merged histogram is
    bit-identical to the batch GROUP BY of the same rows — which is
    exactly what the oracle computes (bin_width 8 = power of two, so
    the IEEE binning division is exact cross-engine). State = one row
    per occupied bin, value-range-bounded, not volume-bounded."""
    import os
    import tempfile

    from akka_graph_db_spark.streaming.sketch import StreamingHistogram

    tmp = tempfile.mkdtemp(prefix="shist_")
    src = os.path.join(tmp, "src")
    if _stage_needs_spark(f"{sf_dir}/events.parquet"):
        _stage_spark_files(
            read_events(spark, sf_dir).select("value"), src, n_files=4
        )
    else:
        _stage_arrow_files(
            _events_arrow(sf_dir, ["value"]), src, n_files=4
        )
    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    hist = StreamingHistogram(value_col="value", bin_width=8.0)
    return hist.run(stream, os.path.join(tmp, "ckpt")).orderBy("bin")


def q_induced_subgraph_parts(spark, sf_dir):
    """Deterministic induced-subgraph sample
    (analytics.induced_subgraph_sample, 250 permille, node-induced) of
    the part co-order graph, summarized as (n_nodes, n_edges,
    avg_degree_permille) — the debug-at-scale ladder rung: edges
    survive at p² uniformly, so structure extrapolates. Two hash
    filters, zero shuffles before the summary agg; oracle reproduces
    the md5 node draw exactly."""
    from akka_graph_db_spark.operators.analytics import (
        induced_subgraph_sample,
    )

    # one derivation: the summary's node-union and edge-count branches
    # would otherwise each re-run the co-order self-join (measured 12
    # scans / 9.4s vs 4 scans / ~4s at sf0.1)
    sub = induced_subgraph_sample(
        _coorder_pairs(spark, sf_dir), keep_permille=250, salt="sub"
    ).localCheckpoint(eager=True)
    nodes = (
        sub.select(F.col("a").alias("id"))
        .unionByName(sub.select(F.col("b").alias("id")))
        .distinct()
    )
    return nodes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    ).crossJoin(
        sub.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    ).select(
        "n_nodes",
        "n_edges",
        F.when(
            F.col("n_nodes") > 0,
            F.expr("2 * n_edges * 1000 div n_nodes"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("avg_degree_permille"),
    )


def q_onion_layers_parts(spark, sf_dir):
    """Onion decomposition (analytics.onion_layers) of the FREQUENTLY
    co-ordered parts graph (support ≥2, the clique-profile discipline —
    the raw co-order graph's peel runs 71 waves at sf0.01, the thinned
    recurring structure 18): peel-wave index + coreness per node — the
    within-shell structural position coreness alone flattens
    (Hébert-Dufresne et al. 2016). Engine = the kcore peel loop with a
    wave counter and an explicit node frame (peeled-isolated nodes
    still get layers); oracle = the same waves unrolled as CTEs, with
    no-op tail waves past exhaustion (measured 36 at sf0.001, 18 at
    sf0.01; unrolled 48)."""
    from akka_graph_db_spark.operators.analytics import onion_layers

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("a", "b")
    )
    return onion_layers(pairs).orderBy("id")


def q_hyperanf_trade(spark, sf_dir):
    """HyperANF (analytics.hyperanf, Boldi-Vigna 2011) on the trade
    graph: per-node HLL counters (m=16 sparse registers) max-merged
    along edges, radius 0..3 — the fixed-memory neighborhood function
    whose exact twin is neighborhood_function_trade. Every number is
    exact-integer (md5 registers, BIGINT harmonic division, BAKED
    linear-counting lookup — no transcendental in either plan), so the
    SQL oracle reproduces the registers AND the estimates bit-for-bit:
    a fully certified sketch, not a rows-only approximation."""
    from akka_graph_db_spark.operators.analytics import hyperanf

    return hyperanf(
        _trade_corridors(spark, sf_dir), max_radius=3
    ).orderBy("r")


def q_effective_diameter_trade(spark, sf_dir):
    """Effective diameter (analytics.effective_diameter, 90th
    percentile, Leskovec et al. 2005) of the trade graph: smallest
    radius reaching 90% of reachable pairs, linearly interpolated in
    exact ppm integers off neighborhood_function's exact counts — the
    one-row distance summary robust to a single long path. Oracle =
    the ANF recursion + the same BIGINT interpolation."""
    from akka_graph_db_spark.operators.analytics import (
        effective_diameter,
    )

    return effective_diameter(
        _trade_corridors(spark, sf_dir), max_radius=6
    )


def q_stratified_kfold_embeddings(spark, sf_dir):
    """Stratified 5-fold CV assignment (mixture.stratified_kfold):
    every label's vectors spread round-robin over folds in md5 order,
    per-(label, fold) counts within 1 — summarized as (label, fold,
    n, vec_checksum). Rank = ONE global_rank over (label, md5, id)
    minus broadcast per-label offsets; no per-label window, so one
    dominant class cannot funnel through a single task."""
    from akka_graph_db_spark.functions.mixture import stratified_kfold

    emb = read_embeddings(spark, sf_dir).select("vec_id", "label")
    return (
        stratified_kfold(emb, k=5)
        .groupBy("label", "fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("vec_id").cast("bigint").alias("vec_checksum"),
        )
        .orderBy("label", "fold")
    )


def q_mad_outliers_events(spark, sf_dir):
    """Robust per-type outlier audit (profile.mad_outliers, Hampel
    1974): exact lower-median and MAD of event value in integer
    micro-units, rows beyond 3·MAD counted — the heavy-tail screen
    z-scores get wrong because outliers drag the mean/stddev they are
    measured against (contrast events.value_outliers). Discrete order
    statistics with id tiebreaks — the oracle reproduces every median
    element bit-for-bit."""
    from akka_graph_db_spark.functions.profile import mad_outliers

    ev_micro = read_events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * F.lit(1000000.0))
        .cast("bigint")
        .alias("value_micros"),
    )
    return mad_outliers(
        ev_micro, "event_type", "value_micros", "event_id"
    ).orderBy("event_type")


def q_benford_orders(spark, sf_dir):
    """Benford first-digit conformity audit (profile.benford_deviation,
    Nigrini's forensic screen): per priority, exact-ppm distance of the
    order-total first-digit distribution from the BAKED Benford table
    (no log10 in either plan) plus the most over-represented digit.
    The synthetic uniform totals deviate heavily — exactly what the
    audit exists to flag. One map-side agg to |groups|x9 rows."""
    from akka_graph_db_spark.functions.profile import benford_deviation

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return benford_deviation(orders, "o_orderpriority", "cents").orderBy(
        "o_orderpriority"
    )


def q_coverage_curve_docs(spark, sf_dir):
    """Greedy vocabulary set cover over sources
    (mixture.coverage_curve, 3-gram shingles, 5 rounds): which 5
    sources buy the broadest shingle vocabulary — the diminishing-
    returns source-selection curve behind mixture budgeting. Each
    round is one anti-join against the covered set (vocabulary-
    bounded) + a |sources|-row argmax; the fixture's 20 sources keep
    all 5 rounds strictly positive at both cert scales, so the
    fixed-5-round oracle unroll matches the engine's early-stop
    semantics exactly."""
    from akka_graph_db_spark.functions.mixture import coverage_curve

    docs = read_documents(spark, sf_dir)
    return coverage_curve(docs, k=5, shingle_n=3).orderBy("round")


def q_kcenter_trade(spark, sf_dir):
    """Farthest-first k-center landmark selection
    (analytics.kcenter_landmarks, Gonzalez 1985, k=3, depth 4) on the
    trade graph: the principled spread-out landmark pick for the
    sampled-centrality operators (lowest-id seeds cluster wherever ids
    cluster). Unreachable-within-depth nodes rank dist = 5, smallest-id
    tiebreak — a pure (dist DESC, id) argmax the oracle reproduces by
    unrolling the same min-dist relaxation per round."""
    from akka_graph_db_spark.operators.analytics import (
        kcenter_landmarks,
    )

    return kcenter_landmarks(
        _trade_corridors(spark, sf_dir), k=3, max_depth=4
    ).orderBy("center_rank")


def q_mmr_topk_embeddings(spark, sf_dir):
    """Diversity-aware retrieval (similarity.mmr_topk, Carbonell &
    Goldstein MMR, λ=0.7, k=4): greedy picks maximizing λ·relevance −
    (1−λ)·max redundancy to already-picked — in exact int64 grid inner
    products (the label_noise discipline) with permille λ, so every
    greedy round is a total-order argmax the unrolled SQL oracle
    reproduces. Query = vec_id 0; one checkpointed scored scan + k
    top-1 picks."""
    from akka_graph_db_spark.functions.similarity import mmr_topk

    emb = read_embeddings(spark, sf_dir)
    return mmr_topk(
        emb,
        emb.where(F.col("vec_id") == 0),
        k=4,
        lambda_permille=700,
    ).orderBy("rank")


def q_cusum_events(spark, sf_dir):
    """Mean-shift changepoint screen (events.cusum_changepoints, Page
    CUSUM): per event type, the time index where the value prefix sum
    strays farthest from the no-change diagonal — |n·S_k − k·S_n| in
    exact micro-unit integers, earliest-index tiebreak. One per-group
    window pass + a max-struct argmax; the monitoring primitive behind
    'which stream shifted?'."""
    from akka_graph_db_spark.functions.events import cusum_changepoints

    return cusum_changepoints(read_events(spark, sf_dir)).orderBy(
        "event_type"
    )


def _trade_corridors_weighted(spark, sf_dir):
    """The :func:`_trade_corridors` digraph WITH its exact cost column:
    (a, b, w) where w = shipped quantity in integer cents (DECIMAL(30,2)
    sum × 100 — integer-valued, so the BIGINT cast is exact in any
    engine). Same deterministic top-40 cut."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    return (
        li.select("l_orderkey", "l_suppkey", "l_quantity")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("a"),
            F.col("c_nationkey").alias("b"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("_q")
        )
        .orderBy(F.col("_q").desc(), "a", "b")
        .limit(40)
        .select(
            "a", "b", (F.col("_q") * 100).cast("bigint").alias("w")
        )
    )


def q_kcenter_weighted_trade(spark, sf_dir):
    """Distance-WEIGHTED farthest-first k-center
    (analytics.kcenter_landmarks_weighted, new r11 — the VERDICT r10 #7
    alternative pick, both delivered): Gonzalez landmarks on the trade
    graph under the exact integer COST metric (corridor quantity cents)
    instead of hop count — on weighted graphs the hop form calls a node
    adjacent via one expensive edge "close", exactly the landmark-
    quality gap this closes. Distance = Bellman-Ford with exactly 4
    relaxation supersteps (min cost over ≤4-edge paths, the closed form
    the oracle unrolls); unreached ranks 4·max(w)+1, smallest-id
    tiebreak — a pure (cost DESC, id ASC) argmax in exact BIGINT."""
    from akka_graph_db_spark.operators.analytics import (
        kcenter_landmarks_weighted,
    )

    return kcenter_landmarks_weighted(
        _trade_corridors_weighted(spark, sf_dir), k=3, max_rounds=4
    ).orderBy("center_rank")


def q_weighted_voronoi_trade(spark, sf_dir):
    """Cheapest-hub Voronoi on the weighted trade graph
    (analytics.weighted_nearest_seed, new r11): every nation assigned
    to its CHEAPEST of the three smallest-id nations by total corridor
    cost (quantity cents), exactly 4 relaxation supersteps — the
    weighted twin of nearest_seed_parts for graphs where hop count lies
    about proximity. Lexicographic (cost, seed) min-plus is bounded-
    Bellman-Ford-exact, so the oracle unrolls the same 4 rounds with a
    per-round (cost, seed) argmin; unreached nations are omitted."""
    from akka_graph_db_spark.operators.analytics import (
        weighted_nearest_seed,
    )

    w = _trade_corridors_weighted(spark, sf_dir).localCheckpoint(
        eager=True
    )
    seeds = [
        int(r.a)
        for r in w.select(F.col("a"))
        .unionByName(w.select(F.col("b").alias("a")))
        .where(F.col("a").isNotNull())
        .distinct()
        .orderBy("a")
        .limit(3)
        .collect()
    ]
    return weighted_nearest_seed(w, seeds=seeds, max_rounds=4).orderBy(
        "id"
    )


def q_weighted_harmonic_trade(spark, sf_dir):
    """Weighted harmonic centrality from landmarks
    (analytics.weighted_harmonic, new r11): per nation, Σ over the 3
    smallest-id landmark nations of 10⁹ div bounded-cost — exact
    integer reciprocals of the same 4-superstep Bellman-Ford closed
    form the voronoi oracle unrolls, completing the landmark-centrality
    family on weighted graphs (the hop form calls a node adjacent via
    one expensive corridor central). Oracle: the per-(id, landmark)
    min-cost unroll (GROUP BY min, no argmin collapse) summed with the
    same floor divisions."""
    from akka_graph_db_spark.operators.analytics import (
        weighted_harmonic,
    )

    w = _trade_corridors_weighted(spark, sf_dir).localCheckpoint(
        eager=True
    )
    seeds = [
        int(r.a)
        for r in w.select(F.col("a"))
        .unionByName(w.select(F.col("b").alias("a")))
        .distinct()
        .orderBy("a")
        .limit(3)
        .collect()
    ]
    return weighted_harmonic(w, landmarks=seeds, max_rounds=4).orderBy(
        "id"
    )


def _trade_landmark_seeds(spark, sf_dir):
    """The 3 smallest-id nations on the weighted trade graph, plus the
    checkpointed corridor frame — the shared seed pick of the weighted
    landmark-centrality queries (voronoi/harmonic/ecc/closeness/
    effdiam all sample the SAME landmarks so their substrate sweeps
    are comparable)."""
    w = _trade_corridors_weighted(spark, sf_dir).localCheckpoint(
        eager=True
    )
    seeds = [
        int(r.a)
        for r in w.select(F.col("a"))
        .unionByName(w.select(F.col("b").alias("a")))
        .distinct()
        .orderBy("a")
        .limit(3)
        .collect()
    ]
    return w, seeds


def q_weighted_ecc_trade(spark, sf_dir):
    """Weighted bounded eccentricity estimate from landmarks
    (analytics.weighted_eccentricity, new r12 — VERDICT r11 #4): per
    nation, the MAX bounded cheapest cost to any of the 3 smallest-id
    landmark nations (corridor quantity cents, 4 Bellman-Ford
    supersteps), exact BIGINT — an ESTIMATE, not a bound: the landmark
    sample under-shoots the max while the round bound over-shoots each
    cost (see the operator docstring). Completes the landmark-
    centrality family's weighted twins alongside harmonic (r11): same
    certified weighted_landmark_costs substrate, one extra MAX/COUNT
    aggregation. Oracle: the h0..h4 per-(id, landmark) min-cost unroll
    with MAX/COUNT (self cost-0 rows INCLUDED in n_reached — they
    never move the max)."""
    from akka_graph_db_spark.operators.analytics import (
        weighted_eccentricity,
    )

    w, seeds = _trade_landmark_seeds(spark, sf_dir)
    return weighted_eccentricity(
        w, landmarks=seeds, max_rounds=4
    ).orderBy("id")


def q_weighted_closeness_trade(spark, sf_dir):
    """Weighted bounded closeness from landmarks
    (analytics.weighted_closeness, new r12 — VERDICT r11 #4): per
    nation, c_ppb = (n_reached · 10⁹) div Σ bounded cost to the 3
    smallest-id landmark nations — the reciprocal-mean-distance
    estimator (Eppstein-Wang) under the corridor cost metric, in EXACT
    integer floor division (the hop-form closeness_parts rounds one
    IEEE divide; the weighted twin needs no float at all). Self cost-0
    pairs excluded, matching weighted_harmonic. Oracle: the same
    h0..h4 unroll with SUM/COUNT and the identical BIGINT division."""
    from akka_graph_db_spark.operators.analytics import (
        weighted_closeness,
    )

    w, seeds = _trade_landmark_seeds(spark, sf_dir)
    return weighted_closeness(
        w, landmarks=seeds, max_rounds=4
    ).orderBy("id")


def q_weighted_effdiam_trade(spark, sf_dir):
    """Weighted effective diameter of the trade graph
    (analytics.weighted_effective_diameter, new r12 — VERDICT r11 #4):
    the 90% interpolated quantile of the bounded (nation, landmark)
    cost distribution — "90% of sampled reachable pairs sit within
    this total corridor cost" — the edge-cost twin of
    effective_diameter_trade's hop form, exact ppm integers
    (interpolation = the hop formula with the unit radius gap
    generalized to the cost gap between adjacent distinct costs).
    Plan: the certified substrate sweep + a distributed global_rank
    order-statistic pick + one bounded interpolation aggregate —
    never a single-partition sort. Oracle: the h0..h4 unroll, the
    ⌈0.9·n⌉-th smallest cost by window rank, and the same integer
    interpolation."""
    from akka_graph_db_spark.operators.analytics import (
        weighted_effective_diameter,
    )

    w, seeds = _trade_landmark_seeds(spark, sf_dir)
    return weighted_effective_diameter(
        w, landmarks=seeds, max_rounds=4, fraction_ppm=900000
    )


def q_weighted_modularity_trade(spark, sf_dir):
    """Weight-aware modularity of the cheapest-hub Voronoi partition
    (analytics.weighted_modularity, new r12): how well the certified
    weighted_nearest_seed assignment (3 smallest-id nations as hubs)
    cuts the trade graph when edges count by corridor VOLUME — the
    affinity-weighted Newman Q the hop-form modularity_geo can't give
    (cutting one heavy corridor must cost more than ten trivial ones).
    Exact DECIMAL(38,0) aggregates, one double division + round(6),
    composing two certified substrates (voronoi assignment r11, the
    canonical weighted edges). Oracle: the same v0..v4 lexicographic
    (cost, seed) unroll feeding the same integer modularity sums."""
    from akka_graph_db_spark.operators.analytics import (
        weighted_modularity,
        weighted_nearest_seed,
    )

    w, seeds = _trade_landmark_seeds(spark, sf_dir)
    # checkpoint the assignment ONCE: modularity references it in both
    # tag joins and two derived aggregates — without this the whole
    # 4-superstep relax lineage re-evaluates per reference
    asg = (
        weighted_nearest_seed(w, seeds=seeds, max_rounds=4)
        .select("id", F.col("seed").alias("community"))
        .localCheckpoint(eager=True)
    )
    return weighted_modularity(w, asg)


def q_conductance_trade(spark, sf_dir):
    """Per-hub weighted conductance of the cheapest-hub Voronoi
    partition (analytics.community_conductance, new r12): for each of
    the 3 hub communities, cut weight / min-side volume in exact ppm —
    the "is this trade bloc a bottleneck or a blob" cut-quality score
    that complements the single-number weighted modularity. One BIGINT
    floor division per community; same certified v0..v4 assignment
    unroll and tagged-arc substrate as weighted_modularity_trade."""
    from akka_graph_db_spark.operators.analytics import (
        community_conductance,
        weighted_nearest_seed,
    )

    w, seeds = _trade_landmark_seeds(spark, sf_dir)
    # checkpoint the assignment ONCE (same reason as the modularity
    # query: it is referenced by both tag joins and the per/tot pair)
    asg = (
        weighted_nearest_seed(w, seeds=seeds, max_rounds=4)
        .select("id", F.col("seed").alias("community"))
        .localCheckpoint(eager=True)
    )
    return community_conductance(w, asg).orderBy("community")


def q_attribution_events(spark, sf_dir):
    """U-shaped multi-touch purchase attribution
    (events.multi_touch_attribution, new r12): per touch type, the
    exact-ppm credit ledger of the purchases it preceded — 40% to the
    first touch, 40% to the last, 20% shared by the middles (integer
    floor, remainder to the first middle), touches assigned to their
    user's NEXT purchase. Conservation invariant: Σ credit_ppm =
    10⁶ × attributed conversions, bit-for-bit. Two per-user window
    passes + a two-level map-side aggregation — the per-channel answer
    funnel counts can't give. Oracle: the same running-sum/rank
    windows and integer CASE credits in DuckDB."""
    from akka_graph_db_spark.functions.events import (
        multi_touch_attribution,
    )

    return multi_touch_attribution(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        conversion_type="purchase",
        model="u_shaped",
    ).orderBy("event_type")


def q_drift_alarm_docs(spark, sf_dir):
    """Per-source drift alarms with changepoint localization
    (profile.drift_alarms, new r11 — VERDICT r10 #7): for each source,
    WHEN its doc-length series shifted (CUSUM argmax over doc_id order,
    exact micro-unit integers) and HOW FAR the source drifts from the
    rest of the corpus (drift_tvd over 64-char bins). The alarm is the
    split's exact mean shift deviation div (k·(n−k)) ≥ 100 chars — at
    sf0.01 that fires on 9 of 20 sources, so the boolean column is
    informative, not constant. Composes the two driver-certified
    substrates (cusum_events r10, corpus_drift_tvd r10); one window
    pass + bounded aggs + a |sources|-row broadcast join."""
    from akka_graph_db_spark.functions.profile import drift_alarms

    return drift_alarms(
        read_documents(spark, sf_dir),
        group_col="source",
        order_col="doc_id",
        value_col="n_chars",
        bin_width=64,
        shift_alarm_micros=100_000_000,
    ).orderBy("source")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_egress_edges(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
    # Order matters: the correctness driver certifies the FIRST 50
    # entries only. Round-12 rotation (VERDICT r11 #1 + #4): the window
    # (a) certifies the SIX new oracles -- weighted_ecc_trade,
    # weighted_closeness_trade, and weighted_effdiam_trade (the
    # weighted landmark-centrality family completed on the certified
    # weighted_landmark_costs substrate), weighted_modularity_trade
    # (affinity-weighted Newman Q of the certified Voronoi partition),
    # conductance_trade (its per-community cut-quality companion), and
    # attribution_events (exact-ppm multi-touch conversion
    # attribution), (b) drains the five-query deferred queue from r11
    # (vocabulary, weighted_sample_docs, tpch_q3, text_repetition,
    # salted_join_orders -- the r5-era rows that yielded their slots to
    # the r11 oracles), and (c) spends the remaining 39 slots on the
    # OLDEST surviving certifications, all r6-era (min-age-maximizing,
    # ages recomputed from CORRECTNESS_r02..r11.json this session;
    # weekly_revenue_growth (r6), tpch_q7 (r6), and tpch_q8 (r7), the
    # youngest former occupants, yielded their slots and head the
    # tail). Every window entry passed the exact local hash gate at
    # sf0.01 this session.
        "weighted_ecc_trade": q_weighted_ecc_trade,
        "weighted_closeness_trade": q_weighted_closeness_trade,
        "weighted_effdiam_trade": q_weighted_effdiam_trade,
        "weighted_modularity_trade": q_weighted_modularity_trade,
        "conductance_trade": q_conductance_trade,
        "attribution_events": q_attribution_events,
        "vocabulary": q_vocabulary,
        "weighted_sample_docs": q_weighted_sample_docs,
        "tpch_q3": q_tpch_q3,
        "text_repetition": q_text_repetition,
        "salted_join_orders": q_salted_join_orders,
        "pack_chunks": q_pack_chunks,
        "tpch_q5": q_tpch_q5,
        "assortativity_coorder": q_assortativity_coorder,
        "pagerank_weighted": q_pagerank_weighted,
        "kmeans_embeddings": q_kmeans_embeddings,
        "curriculum_shards": q_curriculum_shards,
        "graph_summary": q_graph_summary,
        "cdc_chunks": q_cdc_chunks,
        "collocations": q_collocations,
        "kmeans_quality_profile": q_kmeans_quality_profile,
        "tpch_q4": q_tpch_q4,
        "tpch_q10": q_tpch_q10,
        "tpch_q12": q_tpch_q12,
        "tpch_q14": q_tpch_q14,
        "tpch_q16": q_tpch_q16,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "tpch_q22": q_tpch_q22,
        "mixture_weights": q_mixture_weights,
        "mixture_sample": q_mixture_sample,
        "streaming_store_sink": q_streaming_store_sink,
        "modularity_geo": q_modularity_geo,
        "ktruss_parts": q_ktruss_parts,
        "token_rarity": q_token_rarity,
        "dedup_incremental": q_dedup_incremental,
        "dup_cluster_histogram": q_dup_cluster_histogram,
        "engagement_decay": q_engagement_decay,
        "embedding_outliers": q_embedding_outliers,
        "customer_similarity": q_customer_similarity,
        "butterfly_count": q_butterfly_count,
        "orc_roundtrip": q_orc_roundtrip,
        "skew_report_parts": q_skew_report_parts,
        "zorder_customers": q_zorder_customers,
        "store_incremental_counts": q_store_incremental_counts,
        "recency_histogram": q_recency_histogram,
        "order_intervals": q_order_intervals,
        "activity_heatmap": q_activity_heatmap,
        "revenue_concentration": q_revenue_concentration,
        "conversion_latency": q_conversion_latency,
    # --- certification window ends here (50 entries). ---
    # Certified tail: every entry below has a green driver row in
    # CORRECTNESS_r02..r11.json (cumulative union 286/286 green before
    # this round's six additions). weekly_revenue_growth (r6), tpch_q7
    # (r6), and tpch_q8 (r7) yielded their window slots to the sixth,
    # fifth, and fourth r12 oracles (conductance_trade,
    # weighted_modularity_trade, attribution_events) and head the tail.
        "weekly_revenue_growth": q_weekly_revenue_growth,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "drift_alarm_docs": q_drift_alarm_docs,
        "dedup_minhash_keep_star": q_dedup_minhash_keep_star,
        "remove_edges_predicate": q_remove_edges_predicate,
        "remove_nodes_predicate": q_remove_nodes_predicate,
        "rollup_order_stats": q_rollup_order_stats,
        "set_ops_customers": q_set_ops_customers,
        "store_delta_merge": q_store_delta_merge,
        "topk_orders": q_topk_orders,
        "aggmsg_max_acctbal": q_aggmsg_max_acctbal,
        "asof_purchase_click": q_asof_purchase_click,
        "basket_lift": q_basket_lift,
        "bm25_search": q_bm25_search,
        "clustering_coefficient": q_clustering_coefficient,
        "cohort_retention": q_cohort_retention,
        "contamination": q_contamination,
        "cube_order_stats": q_cube_order_stats,
        "dedup_exact_spans": q_dedup_exact_spans,
        "dedup_minhash_keep_best": q_dedup_minhash_keep_best,
        "doc_chunks": q_doc_chunks,
        "doc_split_hash": q_doc_split_hash,
        "event_transitions": q_event_transitions,
        "events_json_prop": q_events_json_prop,
        "events_outliers": q_events_outliers,
        "events_rollup_multi": q_events_rollup_multi,
        "events_session": q_events_session,
        "events_sliding": q_events_sliding,
        "events_type_stats": q_events_type_stats,
        "funnel_events": q_funnel_events,
        "gopher_quality": q_gopher_quality,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "label_propagation_geo": q_label_propagation_geo,
        "length_quantiles": q_length_quantiles,
        "pipeline_e2e": q_pipeline_e2e,
        "ppr_customer": q_ppr_customer,
        "quality_topk": q_quality_topk,
        "quantized_topk": q_quantized_topk,
        "range_join_clicks": q_range_join_clicks,
        "redact_pii": q_redact_pii,
        "weighted_harmonic_trade": q_weighted_harmonic_trade,
        "sql_interface": q_sql_interface,
        "store_time_travel": q_store_time_travel,
        "stratified_sample": q_stratified_sample,
        "streaming_dedup": q_streaming_dedup,
        "streaming_fold": q_streaming_fold,
        "streaming_interval_join": q_streaming_interval_join,
        "streaming_running_totals": q_streaming_running_totals,
        "streaming_session": q_streaming_session,
        "streaming_static_join": q_streaming_static_join,
        "kcenter_weighted_trade": q_kcenter_weighted_trade,
        "weighted_voronoi_trade": q_weighted_voronoi_trade,
        "order_reconciliation": q_order_reconciliation,
        "skyline_parts": q_skyline_parts,
        "sample_per_source": q_sample_per_source,
        "winsorize_orders": q_winsorize_orders,
        "l_diversity_customers": q_l_diversity_customers,
        "reorder_gaps": q_reorder_gaps,
        "gini_order_values": q_gini_order_values,
        "brand_mixing_parts": q_brand_mixing_parts,
        "k_anonymity_customers": q_k_anonymity_customers,
        "price_qty_correlation": q_price_qty_correlation,
        "event_trends": q_event_trends,
        "interval_coverage": q_interval_coverage,
        "doc_length_percentiles": q_doc_length_percentiles,
        "equidepth_prices": q_equidepth_prices,
        "rolling_active_users": q_rolling_active_users,
        "scd2_user_state": q_scd2_user_state,
        "time_weighted_value": q_time_weighted_value,
        "concurrent_sessions": q_concurrent_sessions,
        "event_bursts": q_event_bursts,
        "edge_betweenness_parts": q_edge_betweenness_parts,
        "importance_scores_docs": q_importance_scores_docs,
        "neighborhood_function_trade": q_neighborhood_function_trade,
        "balanced_shards_docs": q_balanced_shards_docs,
        "tokenizer_fertility_docs": q_tokenizer_fertility_docs,
        "semantic_decontam": q_semantic_decontam,
        "nearest_seed_parts": q_nearest_seed_parts,
        "streaming_histogram": q_streaming_histogram,
        "induced_subgraph_parts": q_induced_subgraph_parts,
        "onion_layers_parts": q_onion_layers_parts,
        "hyperanf_trade": q_hyperanf_trade,
        "effective_diameter_trade": q_effective_diameter_trade,
        "stratified_kfold_embeddings": q_stratified_kfold_embeddings,
        "mad_outliers_events": q_mad_outliers_events,
        "text_tokens": q_text_tokens,
        "profile_orders": q_profile_orders,
        "budget_trim_docs": q_budget_trim_docs,
        "label_noise_knn": q_label_noise_knn,
        "rfm_segments": q_rfm_segments,
        "rfm_quintiles": q_rfm_quintiles,
        "corpus_drift_tvd": q_corpus_drift_tvd,
        "quantile_filter_docs": q_quantile_filter_docs,
        "tpch_q1": q_tpch_q1,
        "tpch_q6": q_tpch_q6,
        "codec_roundtrip": q_codec_roundtrip,
        "dedup_minhash": q_dedup_minhash,
        "mmr_topk_embeddings": q_mmr_topk_embeddings,
        "cusum_events": q_cusum_events,
        "benford_orders": q_benford_orders,
        "coverage_curve_docs": q_coverage_curve_docs,
        "kcenter_trade": q_kcenter_trade,
        "store_version_summary": q_store_version_summary,
        "kcore_parts": q_kcore_parts,
        "hits_top20": q_hits_top20,
        "dedup_recall_eval": q_dedup_recall_eval,
        "dedup_cluster_stats": q_dedup_cluster_stats,
        "dedup_manifest": q_dedup_manifest,
        "store_version_diff": q_store_version_diff,
        "store_incremental_topk": q_store_incremental_topk,
        "scc_condensation_trade": q_scc_condensation_trade,
        "bowtie_trade": q_bowtie_trade,
        "katz_parts": q_katz_parts,
        "streaming_dedup_ingest": q_streaming_dedup_ingest,
        "pattern_diamond": q_pattern_diamond,
        "pattern_supply_gap": q_pattern_supply_gap,
        "bloom_prune_report": q_bloom_prune_report,
        "closeness_parts": q_closeness_parts,
        "temporal_triples": q_temporal_triples,
        "split_leakage_report": q_split_leakage_report,
        "knn_components": q_knn_components,
        "lexical_diversity": q_lexical_diversity,
        "retrieval_eval_bm25": q_retrieval_eval_bm25,
        "coloring_geo": q_coloring_geo,
        "session_paths": q_session_paths,
        "clique_profile_parts": q_clique_profile_parts,
        "negative_edges_coorder": q_negative_edges_coorder,
        "fastrp_parts": q_fastrp_parts,
        "phrase_search": q_phrase_search,
        "entity_linkage_parts": q_entity_linkage_parts,
        "ra_link_prediction": q_ra_link_prediction,
        "degree_anomalies_parts": q_degree_anomalies_parts,
        "textrank_keywords": q_textrank_keywords,
        "wl_colors_parts": q_wl_colors_parts,
        "dag_layers_graph": q_dag_layers_graph,
        "edge_embeddedness": q_edge_embeddedness,
        "seeded_labels_parts": q_seeded_labels_parts,
        "cc_incremental_geo": q_cc_incremental_geo,
        "label_path_census": q_label_path_census,
        "basket_triples": q_basket_triples,
        "local_clustering_parts": q_local_clustering_parts,
        "fd_discovery_part": q_fd_discovery_part,
        "matching_parts": q_matching_parts,
        "source_concentration": q_source_concentration,
        "pq_codes": q_pq_codes,
        "pq_topk": q_pq_topk,
        "kmeans_ari": q_kmeans_ari,
        "embedding_dim_profile": q_embedding_dim_profile,
        "hard_negatives": q_hard_negatives,
        "dedup_containment": q_dedup_containment,
        "hll_grouped_events": q_hll_grouped_events,
        "asof_view_next_purchase": q_asof_view_next_purchase,
        "event_rate_features": q_event_rate_features,
        "corpus_diff": q_corpus_diff,
        "source_overlap": q_source_overlap,
        "dedup_containment_prune": q_dedup_containment_prune,
        "doc_novelty": q_doc_novelty,
        "distinctive_terms": q_distinctive_terms,
        "vocab_growth": q_vocab_growth,
        "streaming_cms": q_streaming_cms,
        "streaming_hll": q_streaming_hll,
        "winnow_fingerprints": q_winnow_fingerprints,
        "winnow_pairs": q_winnow_pairs,
        "ngram_diversity": q_ngram_diversity,
        "blocklist_report": q_blocklist_report,
        "betweenness_parts": q_betweenness_parts,
        "harmonic_parts": q_harmonic_parts,
        "eccentricity_parts": q_eccentricity_parts,
        "random_walks_parts": q_random_walks_parts,
        "walk_skipgrams": q_walk_skipgrams,
        "node2vec_skipgrams": q_node2vec_skipgrams,
        "mis_geo": q_mis_geo,
        "link_prediction_parts": q_link_prediction_parts,
        "dedup_keep_source": q_dedup_keep_source,
        "connected_components_two_phase_geo": q_connected_components_two_phase_geo,
        "text_quality": q_text_quality,
        "multimodal_meta": q_multimodal_meta,
        "events_tumbling": q_events_tumbling,
        "window_rank_customers": q_window_rank_customers,
        "get_node": q_get_node,
        "get_nodes_filtered": q_get_nodes_filtered,
        "get_nodes_all_labels": q_get_nodes_all_labels,
        "get_edge": q_get_edge,
        "get_edges_filtered": q_get_edges_filtered,
        "egress_edges": q_egress_edges,
        "ingress_edges": q_ingress_edges,
        "get_nodes_unlabeled_prop": q_get_nodes_unlabeled_prop,
        "get_edges_hydrated": q_get_edges_hydrated,
        "add_nodes": q_add_nodes,
        "add_edges_validated": q_add_edges_validated,
        "update_node_merge": q_update_node_merge,
        "update_edge_merge": q_update_edge_merge,
        "remove_node_cascade": q_remove_node_cascade,
        "tpch_q13": q_tpch_q13,
        "tpch_q15": q_tpch_q15,
        "tpch_q17": q_tpch_q17,
        "node2vec_parts": q_node2vec_parts,
        "degree_histogram": q_degree_histogram,
        "scc_event_types": q_scc_event_types,
        "transition_reciprocity": q_transition_reciprocity,
        "pivot_priority_year": q_pivot_priority_year,
        "ntile_customer_deciles": q_ntile_customer_deciles,
        "orders_above_customer_avg": q_orders_above_customer_avg,
        "dedup_policy_sweep": q_dedup_policy_sweep,
        "link_prediction_auto": q_link_prediction_auto,
        "tpch_q2": q_tpch_q2,
        "tpch_q9": q_tpch_q9,
        "tpch_q11": q_tpch_q11,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "semantic_prune": q_semantic_prune,
        "coreness_parts": q_coreness_parts,
        "hybrid_search": q_hybrid_search,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "store_incremental_degrees": q_store_incremental_degrees,
        "hll_distinct_events": q_hll_distinct_events,
        "sessionize_events": q_sessionize_events,
        "set_similarity_join": q_set_similarity_join,
        "rich_club_parts": q_rich_club_parts,
        "bpe_pair_counts": q_bpe_pair_counts,
        "triangles_coorder": q_triangles_coorder,
        "similarity_lsh": q_similarity_lsh,
        "similarity_topk": q_similarity_topk,
        "similarity_ivf": q_similarity_ivf,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_keep": q_dedup_minhash_keep,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "embedding_dedup_pairs": q_embedding_dedup,
        "sssp_weighted": q_sssp_weighted,
        "pagerank_top20": q_pagerank_top20,
        "khop_features": q_khop_features,
        "motif_supply_chain": q_motif_supply_chain,
        "paths_to": q_paths_to,
        "paths_to_undirected": q_paths_to_undirected,
        "paths_to_hydrated": q_paths_to_hydrated,
        "connected_components_geo": q_connected_components_geo,
        "degrees": q_degrees,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "text_stats": q_text_stats,
    }


def oracle_sql() -> dict[str, str]:
    sums = _DEC_SUM
    return {
        "get_node": f"""
            SELECT c_custkey + {CUSTOMER_BASE} AS id, 'customer' AS label,
                   c_name AS name, c_acctbal AS acctbal,
                   c_mktsegment AS mktsegment
            FROM customer WHERE c_custkey = 7
        """,
        "get_nodes_filtered": f"""
            SELECT c_custkey + {CUSTOMER_BASE} AS id, c_name AS name,
                   c_acctbal AS acctbal
            FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "get_nodes_all_labels": f"""
            {_GRAPH_WITH}
            SELECT label, COUNT(*) AS n_nodes FROM nodes_v GROUP BY label
        """,
        "get_edge": f"""
            SELECT o_orderkey + {PLACED_BASE} AS id, 'placed' AS label,
                   o_custkey + {CUSTOMER_BASE} AS src,
                   o_orderkey + {ORDER_BASE} AS dst,
                   'customer' AS src_label, 'order' AS dst_label,
                   o_totalprice AS totalprice
            FROM orders WHERE o_orderkey = 1
        """,
        "get_edges_filtered": f"""
            WITH ln AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
                ORDER BY {_LINEITEM_ORDER_SQL}) AS rn
              FROM lineitem
            )
            SELECT l_orderkey * {CONTAINS_SHIFT} + rn - 1 + {CONTAINS_BASE}
                     AS id,
                   l_orderkey + {ORDER_BASE} AS src,
                   l_partkey + 4000000 AS dst,
                   l_quantity AS quantity, l_returnflag AS returnflag
            FROM ln WHERE l_quantity = 30
        """,
        "egress_edges": f"""
            SELECT c_custkey + {CUSTOMER_BASE} AS customer_id,
                   COUNT(*) AS n_orders,
                   {sums.format(col="o_totalprice")} AS total_spent
            FROM customer JOIN orders ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY 1
        """,
        "ingress_edges": f"""
            SELECT nation_id, COUNT(*) AS n_in FROM (
              SELECT c_nationkey + {NATION_BASE} AS nation_id FROM customer
              UNION ALL
              SELECT s_nationkey + {NATION_BASE} FROM supplier
            ) GROUP BY 1
        """,
        "paths_to": f"""
            WITH RECURSIVE
            {ORACLE_EDGES_CTE.strip()},
            ep AS (
              SELECT n_regionkey + {REGION_BASE} AS end_id
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              WHERE c_custkey = 1
            ),
            p AS (
              SELECT CAST({CUSTOMER_BASE + 1} AS BIGINT) AS cur,
                     [CAST({CUSTOMER_BASE + 1} AS BIGINT)] AS node_path,
                     CAST([] AS BIGINT[]) AS edge_path, 0 AS depth
              UNION ALL
              SELECT e.dst, list_append(p.node_path, e.dst),
                     list_append(p.edge_path, e.id), p.depth + 1
              FROM p JOIN edges_v e ON p.cur = e.src
              WHERE p.depth < 4
                AND NOT list_contains(p.node_path, e.dst)
                AND p.cur <> (SELECT end_id FROM ep)
            )
            SELECT CAST(depth AS INTEGER) AS depth,
                   array_to_string(node_path, ',') AS node_path_str,
                   array_to_string(edge_path, ',') AS edge_path_str
            FROM p WHERE cur = (SELECT end_id FROM ep) AND depth >= 1
        """,
        # Same recursive BFS as paths_to, then each hit path's edge-id array
        # unnests WITH ORDINALITY and joins edges_v for the full edge
        # objects — the reference Path payload, one row per hop.
        "paths_to_hydrated": f"""
            WITH RECURSIVE
            {ORACLE_EDGES_CTE.strip()},
            ep AS (
              SELECT n_regionkey + {REGION_BASE} AS end_id
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              WHERE c_custkey = 1
            ),
            p AS (
              SELECT CAST({CUSTOMER_BASE + 1} AS BIGINT) AS cur,
                     [CAST({CUSTOMER_BASE + 1} AS BIGINT)] AS node_path,
                     CAST([] AS BIGINT[]) AS edge_path, 0 AS depth
              UNION ALL
              SELECT e.dst, list_append(p.node_path, e.dst),
                     list_append(p.edge_path, e.id), p.depth + 1
              FROM p JOIN edges_v e ON p.cur = e.src
              WHERE p.depth < 4
                AND NOT list_contains(p.node_path, e.dst)
                AND p.cur <> (SELECT end_id FROM ep)
            ),
            hops AS (
              SELECT depth,
                     generate_subscripts(edge_path, 1) - 1 AS pos,
                     unnest(edge_path) AS eid
              FROM p WHERE cur = (SELECT end_id FROM ep) AND depth >= 1
            )
            SELECT CAST(h.depth AS INTEGER) AS depth,
                   CAST({CUSTOMER_BASE + 1} AS BIGINT) AS start_id,
                   'customer' AS start_label,
                   CAST(h.pos AS INTEGER) AS pos,
                   CAST(e.id AS BIGINT) AS edge_id,
                   CAST(e.src AS BIGINT) AS edge_src,
                   CAST(e.dst AS BIGINT) AS edge_dst,
                   e.label AS edge_label
            FROM hops h JOIN edges_v e ON h.eid = e.id
        """,
        "paths_to_undirected": f"""
            WITH RECURSIVE e AS (
              SELECT n_nationkey + {NATION_BASE} AS a,
                     n_regionkey + {REGION_BASE} AS b,
                     n_nationkey + 100000000 AS id
              FROM nation
              UNION ALL
              SELECT n_regionkey + {REGION_BASE},
                     n_nationkey + {NATION_BASE},
                     n_nationkey + 100000000
              FROM nation
            ),
            p AS (
              SELECT CAST({NATION_BASE} AS BIGINT) AS cur,
                     [CAST({NATION_BASE} AS BIGINT)] AS node_path, 0 AS depth
              UNION ALL
              SELECT e.b, list_append(p.node_path, e.b), p.depth + 1
              FROM p JOIN e ON p.cur = e.a
              WHERE p.depth < 2
                AND NOT list_contains(p.node_path, e.b)
                AND p.cur <> (SELECT MIN(n2.n_nationkey) + {NATION_BASE}
                              FROM nation n1 JOIN nation n2
                                ON n1.n_regionkey = n2.n_regionkey
                               AND n2.n_nationkey <> 0
                              WHERE n1.n_nationkey = 0)
            )
            SELECT CAST(depth AS INTEGER) AS depth,
                   array_to_string(node_path, ',') AS node_path_str
            FROM p
            WHERE cur = (SELECT MIN(n2.n_nationkey) + {NATION_BASE}
                         FROM nation n1 JOIN nation n2
                           ON n1.n_regionkey = n2.n_regionkey
                          AND n2.n_nationkey <> 0
                         WHERE n1.n_nationkey = 0)
              AND depth >= 1
        """,
        "get_nodes_unlabeled_prop": f"""
            SELECT r_regionkey + {REGION_BASE} AS id, 'region' AS label
            FROM region WHERE r_name = 'ASIA'
            UNION ALL
            SELECT n_nationkey + {NATION_BASE}, 'nation'
            FROM nation WHERE n_name = 'ASIA'
            UNION ALL
            SELECT c_custkey + {CUSTOMER_BASE}, 'customer'
            FROM customer WHERE c_name = 'ASIA'
            UNION ALL
            SELECT s_suppkey + 3000000, 'supplier'
            FROM supplier WHERE s_name = 'ASIA'
            UNION ALL
            SELECT p_partkey + 4000000, 'part'
            FROM part WHERE p_name = 'ASIA'
        """,
        "get_edges_hydrated": f"""
            SELECT n_nationkey + 100000000 AS id,
                   n_nationkey + {NATION_BASE} AS src,
                   n_regionkey + {REGION_BASE} AS dst,
                   'nation' AS src_label, 'region' AS dst_label
            FROM nation
        """,
        "add_nodes": """
            SELECT * FROM (VALUES
              (CAST(90000001 AS BIGINT), 'alpha', 1.5, CAST(NULL AS BOOLEAN)),
              (CAST(90000002 AS BIGINT), 'beta', CAST(NULL AS DOUBLE), TRUE)
            ) AS t(id, name, score, flag)
        """,
        "add_edges_validated": f"""
            SELECT CAST(91000001 AS BIGINT) AS id,
                   CAST({CUSTOMER_BASE + 1} AS BIGINT) AS src,
                   CAST({NATION_BASE} AS BIGINT) AS dst
        """,
        "update_node_merge": f"""
            SELECT c_custkey + {CUSTOMER_BASE} AS id,
                   CAST(NULL AS VARCHAR) AS name,
                   'PROMO' AS mktsegment, TRUE AS vip, c_acctbal AS acctbal
            FROM customer WHERE c_custkey = 1
        """,
        "update_edge_merge": f"""
            SELECT o_orderkey + {PLACED_BASE} AS id, 999.99 AS totalprice,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f')
                     AS orderdate_str
            FROM orders WHERE o_orderkey = 1
        """,
        "remove_node_cascade": """
            SELECT
              (SELECT COUNT(*) FROM customer WHERE c_custkey <> 1)
                AS n_customers,
              (SELECT COUNT(*) FROM orders WHERE o_custkey <> 1) AS n_placed,
              (SELECT COUNT(*) FROM customer WHERE c_custkey <> 1)
                + (SELECT COUNT(*) FROM supplier) AS n_located_in
        """,
        "remove_nodes_predicate": f"""
            {_GRAPH_WITH},
            b AS (SELECT c_custkey FROM customer
                  WHERE c_mktsegment = 'BUILDING')
            SELECT
              (SELECT COUNT(*) FROM nodes_v) - (SELECT COUNT(*) FROM b)
                AS n_nodes,
              (SELECT COUNT(*) FROM edges_v)
                - (SELECT COUNT(*) FROM b)
                - (SELECT COUNT(*) FROM orders o
                   JOIN b ON o.o_custkey = b.c_custkey) AS n_edges
        """,
        "remove_edges_predicate": """
            SELECT COUNT(*) AS n_contains FROM lineitem
            WHERE l_returnflag <> 'A'
        """,
        "store_delta_merge": """
            SELECT
              (SELECT COUNT(*) FROM supplier WHERE s_suppkey <> 1)
                AS n_suppliers,
              (SELECT COUNT(DISTINCT (l_partkey, l_suppkey))
                 FROM lineitem WHERE l_suppkey <> 1) AS n_supplied_by,
              (SELECT COUNT(*) FROM customer)
                + (SELECT COUNT(*) FROM supplier WHERE s_suppkey <> 1)
                AS n_located_in,
              'DELTA' AS mktsegment, CAST(NULL AS VARCHAR) AS name,
              (SELECT c_acctbal FROM customer WHERE c_custkey = 1)
                AS acctbal
        """,
        "codec_roundtrip": f"""
            SELECT o_orderkey + {ORDER_BASE} AS id,
                   o_orderstatus AS status, o_totalprice AS totalprice,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f')
                     AS orderdate_str,
                   o_orderpriority AS priority
            FROM orders WHERE o_orderkey < 10
        """,
        "degrees": f"""
            {_GRAPH_WITH},
            od AS (SELECT src AS id, COUNT(*) AS c FROM edges_v GROUP BY 1),
            ig AS (SELECT dst AS id, COUNT(*) AS c FROM edges_v GROUP BY 1)
            SELECT n.id,
                   COALESCE(od.c, 0) AS out_degree,
                   COALESCE(ig.c, 0) AS in_degree,
                   COALESCE(od.c, 0) + COALESCE(ig.c, 0) AS degree
            FROM nodes_v n
            LEFT JOIN od ON n.id = od.id
            LEFT JOIN ig ON n.id = ig.id
        """,
        "connected_components_geo": _CC_GEO_ORACLE,
        "connected_components_two_phase_geo": _CC_GEO_ORACLE,
        "pagerank_top20": _pagerank_oracle(n_iter=10, damping=0.85),
        "pagerank_weighted": _weighted_pagerank_oracle(
            n_iter=6, damping=0.85
        ),
        "kmeans_embeddings": _kmeans_oracle(k=8, n_iter=3),
        # The engine RAISES instead of returning non-converged bounds
        # (ADVICE r6), so the only requirement here is rounds >= the
        # DATA's fixpoint (19 at sf0.01, the certification scale; 37 at
        # sf0.1) — past-fixpoint rounds are no-ops, and a hypothetical
        # fixture needing more would surface as an engine error or a
        # hash mismatch, never a silent agreement on wrong values.
        "coreness_parts": _coreness_oracle(rounds=30),
        # SemDeDup prune over the same unrolled kmeans: within-cluster
        # lower-id neighbor at cos >= 9/20, decided in exact integer
        # arithmetic (HUGEINT squares of grid dot products).
        "semantic_prune": _kmeans_oracle(
            k=8,
            n_iter=3,
            final_sql="""
            SELECT s.vec_id, s.c AS cluster
            FROM (SELECT a.vec_id, a.c, q.v,
                         CAST(list_dot_product(q.v, q.v) AS HUGEINT) AS n2
                  FROM ka3 a JOIN kq q USING (vec_id)) s
            WHERE NOT EXISTS (
              SELECT 1
              FROM (SELECT a.vec_id, a.c, q.v,
                           CAST(list_dot_product(q.v, q.v) AS HUGEINT)
                             AS n2
                    FROM ka3 a JOIN kq q USING (vec_id)) t
              WHERE t.c = s.c AND t.vec_id < s.vec_id
                AND list_dot_product(t.v, s.v) > 0
                AND 400 * CAST(list_dot_product(t.v, s.v) AS HUGEINT)
                        * CAST(list_dot_product(t.v, s.v) AS HUGEINT)
                    >= 81 * t.n2 * s.n2
            )
            ORDER BY vec_id
            """,
        ),
        "kmeans_quality_profile": _kmeans_oracle(
            k=8,
            n_iter=3,
            final_sql="""
            SELECT a.c AS cluster, COUNT(*) AS n_docs,
                   CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
                   COUNT(DISTINCT d.lang) AS n_langs
            FROM ka3 a JOIN documents d ON d.doc_id = a.vec_id
            GROUP BY 1 ORDER BY 1
            """,
        ),
        # Same integer products; the single double division is correctly
        # rounded in both engines, so lift matches bit-for-bit.
        "collocations": """
            WITH w AS (
              SELECT string_split(text, ' ') AS words FROM documents
            ),
            uni AS (
              SELECT word AS w, COUNT(*) AS c FROM (
                SELECT unnest(words) AS word FROM w
              ) GROUP BY 1
            ),
            bi AS (
              SELECT w1, w2, COUNT(*) AS c12 FROM (
                SELECT words[i] AS w1, words[i + 1] AS w2 FROM (
                  SELECT words, unnest(range(1, len(words))) AS i FROM w
                )
              ) GROUP BY 1, 2 HAVING COUNT(*) >= 5
            ),
            nu AS (SELECT SUM(c) AS nu FROM uni),
            nb AS (SELECT SUM(len(words) - 1) AS nb FROM w)
            SELECT w1, w2, c12, lift FROM (
              SELECT bi.w1, bi.w2, bi.c12,
                     ROUND(CAST(bi.c12 * nu.nu * nu.nu AS DOUBLE)
                           / CAST(nb.nb * u1.c * u2.c AS DOUBLE), 6)
                       AS lift
              FROM bi
              JOIN uni u1 ON u1.w = bi.w1
              JOIN uni u2 ON u2.w = bi.w2
              CROSS JOIN nu CROSS JOIN nb
            )
            ORDER BY lift DESC, w1, w2 LIMIT 20
        """,
        # Identical rolling 3-word md5 boundary decision (low 4 bits
        # zero), identical cumulative chunk numbering and chunk hash.
        "cdc_chunks": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS words
              FROM documents
            ),
            p AS (
              SELECT doc_id, pos, words[pos] AS word FROM (
                SELECT doc_id, words,
                       unnest(range(1, len(words) + 1)) AS pos
                FROM w
              )
            ),
            g AS (
              SELECT doc_id, pos,
                     CASE WHEN pos >= 3 AND (md5_number_upper(
                            lag(word, 2) OVER o || ' ' ||
                            lag(word, 1) OVER o || ' ' || word) & 15) = 0
                          THEN 1 ELSE 0 END AS b
              FROM p WINDOW o AS (PARTITION BY doc_id ORDER BY pos)
            ),
            m AS (
              SELECT doc_id, pos,
                     COALESCE(SUM(b) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) + 1 AS chunk
              FROM g
            ),
            s AS (
              SELECT doc_id, CAST(chunk AS BIGINT) AS chunk_idx,
                     MIN(pos) AS start_word, COUNT(*) AS n_words
              FROM m GROUP BY 1, 2
            )
            SELECT s.doc_id, s.chunk_idx, s.start_word, s.n_words,
                   CAST(md5_number_upper(array_to_string(
                          w.words[s.start_word:
                                  s.start_word + s.n_words - 1], ' '))
                        & 9223372036854775807 AS BIGINT) AS chunk_hash
            FROM s JOIN w USING (doc_id)
        """,
        # Brandes unrolled: forward layers carry shortest-path counts σ
        # (per-landmark anti-join exclusions), backward sweep folds
        # δ = Σ σv/σw·(1+δw) layer by layer; top-20 on the ROUNDED sum.
        "betweenness_parts": """
            WITH e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            sym AS MATERIALIZED (
              SELECT a, b FROM e UNION ALL SELECT b, a FROM e
            ),
            seeds AS (
              SELECT a FROM (SELECT DISTINCT a FROM sym)
              ORDER BY a LIMIT 8
            ),
            l0 AS MATERIALIZED (
              SELECT a AS s, a AS id, CAST(1 AS BIGINT) AS sig FROM seeds
            ),
            c1 AS MATERIALIZED (
              SELECT l0.s, sym.b AS id, SUM(l0.sig) AS sig
              FROM l0 JOIN sym ON l0.id = sym.a GROUP BY 1, 2
            ),
            l1 AS MATERIALIZED (
              SELECT c1.s, c1.id, c1.sig FROM c1
              LEFT JOIN l0 ON l0.s = c1.s AND l0.id = c1.id
              WHERE l0.id IS NULL
            ),
            v1 AS MATERIALIZED (
              SELECT s, id FROM l0 UNION ALL SELECT s, id FROM l1
            ),
            c2 AS MATERIALIZED (
              SELECT l1.s, sym.b AS id, SUM(l1.sig) AS sig
              FROM l1 JOIN sym ON l1.id = sym.a GROUP BY 1, 2
            ),
            l2 AS MATERIALIZED (
              SELECT c2.s, c2.id, c2.sig FROM c2
              LEFT JOIN v1 ON v1.s = c2.s AND v1.id = c2.id
              WHERE v1.id IS NULL
            ),
            v2 AS MATERIALIZED (
              SELECT s, id FROM v1 UNION ALL SELECT s, id FROM l2
            ),
            c3 AS MATERIALIZED (
              SELECT l2.s, sym.b AS id, SUM(l2.sig) AS sig
              FROM l2 JOIN sym ON l2.id = sym.a GROUP BY 1, 2
            ),
            l3 AS MATERIALIZED (
              SELECT c3.s, c3.id, c3.sig FROM c3
              LEFT JOIN v2 ON v2.s = c3.s AND v2.id = c3.id
              WHERE v2.id IS NULL
            ),
            pe3 AS MATERIALIZED (
              SELECT l2.s, l2.id AS v, l2.sig AS sv,
                     l3.id AS w, l3.sig AS sw
              FROM l2 JOIN sym ON l2.id = sym.a
              JOIN l3 ON l3.s = l2.s AND l3.id = sym.b
            ),
            d2 AS MATERIALIZED (
              SELECT s, v AS id, SUM(CAST(sv AS DOUBLE) / sw) AS delta
              FROM pe3 GROUP BY s, v
            ),
            pe2 AS MATERIALIZED (
              SELECT l1.s, l1.id AS v, l1.sig AS sv,
                     l2.id AS w, l2.sig AS sw
              FROM l1 JOIN sym ON l1.id = sym.a
              JOIN l2 ON l2.s = l1.s AND l2.id = sym.b
            ),
            d1 AS MATERIALIZED (
              SELECT pe2.s, pe2.v AS id,
                     SUM(CAST(pe2.sv AS DOUBLE) / pe2.sw
                         * (1 + COALESCE(d2.delta, 0))) AS delta
              FROM pe2 LEFT JOIN d2
                ON d2.s = pe2.s AND d2.id = pe2.w
              GROUP BY 1, 2
            ),
            pe1 AS MATERIALIZED (
              SELECT l0.s, l0.id AS v, l0.sig AS sv,
                     l1.id AS w, l1.sig AS sw
              FROM l0 JOIN sym ON l0.id = sym.a
              JOIN l1 ON l1.s = l0.s AND l1.id = sym.b
            ),
            d0 AS MATERIALIZED (
              SELECT pe1.s, pe1.v AS id,
                     SUM(CAST(pe1.sv AS DOUBLE) / pe1.sw
                         * (1 + COALESCE(d1.delta, 0))) AS delta
              FROM pe1 LEFT JOIN d1
                ON d1.s = pe1.s AND d1.id = pe1.w
              GROUP BY 1, 2
            ),
            alld AS (
              SELECT * FROM d2 UNION ALL SELECT * FROM d1
              UNION ALL SELECT * FROM d0
            )
            SELECT id, betweenness FROM (
              SELECT id, ROUND(SUM(delta), 6) AS betweenness
              FROM alld WHERE id <> s GROUP BY id
            )
            ORDER BY betweenness DESC, id LIMIT 20
        """,
        # Same unrolled sigma/delta CTEs as betweenness_parts; the tail
        # unions the per-layer DAG-edge dependencies sv/sw*(1+delta_w)
        # instead of aggregating them per node, then sums onto the
        # canonical undirected edge.
        "edge_betweenness_parts": """
            WITH e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            sym AS MATERIALIZED (
              SELECT a, b FROM e UNION ALL SELECT b, a FROM e
            ),
            seeds AS (
              SELECT a FROM (SELECT DISTINCT a FROM sym)
              ORDER BY a LIMIT 8
            ),
            l0 AS MATERIALIZED (
              SELECT a AS s, a AS id, CAST(1 AS BIGINT) AS sig FROM seeds
            ),
            c1 AS MATERIALIZED (
              SELECT l0.s, sym.b AS id, SUM(l0.sig) AS sig
              FROM l0 JOIN sym ON l0.id = sym.a GROUP BY 1, 2
            ),
            l1 AS MATERIALIZED (
              SELECT c1.s, c1.id, c1.sig FROM c1
              LEFT JOIN l0 ON l0.s = c1.s AND l0.id = c1.id
              WHERE l0.id IS NULL
            ),
            v1 AS MATERIALIZED (
              SELECT s, id FROM l0 UNION ALL SELECT s, id FROM l1
            ),
            c2 AS MATERIALIZED (
              SELECT l1.s, sym.b AS id, SUM(l1.sig) AS sig
              FROM l1 JOIN sym ON l1.id = sym.a GROUP BY 1, 2
            ),
            l2 AS MATERIALIZED (
              SELECT c2.s, c2.id, c2.sig FROM c2
              LEFT JOIN v1 ON v1.s = c2.s AND v1.id = c2.id
              WHERE v1.id IS NULL
            ),
            v2 AS MATERIALIZED (
              SELECT s, id FROM v1 UNION ALL SELECT s, id FROM l2
            ),
            c3 AS MATERIALIZED (
              SELECT l2.s, sym.b AS id, SUM(l2.sig) AS sig
              FROM l2 JOIN sym ON l2.id = sym.a GROUP BY 1, 2
            ),
            l3 AS MATERIALIZED (
              SELECT c3.s, c3.id, c3.sig FROM c3
              LEFT JOIN v2 ON v2.s = c3.s AND v2.id = c3.id
              WHERE v2.id IS NULL
            ),
            pe3 AS MATERIALIZED (
              SELECT l2.s, l2.id AS v, l2.sig AS sv,
                     l3.id AS w, l3.sig AS sw
              FROM l2 JOIN sym ON l2.id = sym.a
              JOIN l3 ON l3.s = l2.s AND l3.id = sym.b
            ),
            d2 AS MATERIALIZED (
              SELECT s, v AS id, SUM(CAST(sv AS DOUBLE) / sw) AS delta
              FROM pe3 GROUP BY s, v
            ),
            pe2 AS MATERIALIZED (
              SELECT l1.s, l1.id AS v, l1.sig AS sv,
                     l2.id AS w, l2.sig AS sw
              FROM l1 JOIN sym ON l1.id = sym.a
              JOIN l2 ON l2.s = l1.s AND l2.id = sym.b
            ),
            d1 AS MATERIALIZED (
              SELECT pe2.s, pe2.v AS id,
                     SUM(CAST(pe2.sv AS DOUBLE) / pe2.sw
                         * (1 + COALESCE(d2.delta, 0))) AS delta
              FROM pe2 LEFT JOIN d2
                ON d2.s = pe2.s AND d2.id = pe2.w
              GROUP BY 1, 2
            ),
            pe1 AS MATERIALIZED (
              SELECT l0.s, l0.id AS v, l0.sig AS sv,
                     l1.id AS w, l1.sig AS sw
              FROM l0 JOIN sym ON l0.id = sym.a
              JOIN l1 ON l1.s = l0.s AND l1.id = sym.b
            ),
            alle AS (
              SELECT s, v, w, CAST(sv AS DOUBLE) / sw AS c FROM pe3
              UNION ALL
              SELECT pe2.s, pe2.v, pe2.w,
                     CAST(pe2.sv AS DOUBLE) / pe2.sw
                     * (1 + COALESCE(d2.delta, 0))
              FROM pe2 LEFT JOIN d2
                ON d2.s = pe2.s AND d2.id = pe2.w
              UNION ALL
              SELECT pe1.s, pe1.v, pe1.w,
                     CAST(pe1.sv AS DOUBLE) / pe1.sw
                     * (1 + COALESCE(d1.delta, 0))
              FROM pe1 LEFT JOIN d1
                ON d1.s = pe1.s AND d1.id = pe1.w
            )
            SELECT a, b, edge_betweenness FROM (
              SELECT LEAST(v, w) AS a, GREATEST(v, w) AS b,
                     ROUND(SUM(c), 6) AS edge_betweenness
              FROM alle GROUP BY 1, 2
            )
            ORDER BY edge_betweenness DESC, a, b LIMIT 20
        """,
        # Same md5 bucket hash, same integer ppm shares, same score sum
        # — bit-identical BIGINT arithmetic end to end.
        "importance_scores_docs": f"""
            WITH im_tok AS (
              SELECT id, is_t,
                     CAST((md5_number_upper(term)
                           & 9223372036854775807) AS BIGINT) % 1024 AS b
              FROM (
                SELECT doc_id AS id, (source = 'src0') AS is_t,
                       unnest({_TOK}) AS term
                FROM documents
              )
            ),
            im_stats AS (
              SELECT b,
                     SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                     SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cb
              FROM im_tok GROUP BY b
            ),
            im_tot AS (
              SELECT SUM(ct) AS tt, SUM(cb) AS tb FROM im_stats
            ),
            im_w AS (
              SELECT b,
                     (CASE WHEN tt > 0 THEN ct * 1000000 // tt
                           ELSE 0 END
                      - CASE WHEN tb > 0 THEN cb * 1000000 // tb
                             ELSE 0 END) AS w
              FROM im_stats, im_tot
            ),
            im_doc AS (
              SELECT id, COUNT(*) AS n_tokens, SUM(w) AS score
              FROM im_tok JOIN im_w USING (b)
              WHERE NOT is_t
              GROUP BY id
            )
            -- LEFT join from all background docs: zero-token docs
            -- appear with n_tokens 0 / score 0 (explode_outer parity)
            SELECT d.doc_id,
                   CAST(COALESCE(im_doc.n_tokens, 0) AS BIGINT)
                     AS n_tokens,
                   CAST(COALESCE(im_doc.score, 0) AS BIGINT) AS score
            FROM (SELECT doc_id FROM documents
                  WHERE source <> 'src0') d
            LEFT JOIN im_doc ON im_doc.id = d.doc_id
            ORDER BY score DESC, d.doc_id LIMIT 25
        """,
        # Same top-40 trade corridors, canonicalized undirected, then
        # one distinct-merge superstep per radius — identical pair sets.
        "neighborhood_function_trade": """
            WITH te AS MATERIALIZED (
              SELECT a, b FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            und AS MATERIALIZED (
              SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b
              FROM te WHERE a <> b
            ),
            nsym AS MATERIALIZED (
              SELECT a, b FROM und UNION ALL SELECT b, a FROM und
            ),
            nv0 AS MATERIALIZED (
              SELECT DISTINCT a AS src, a AS dst FROM nsym
            ),
            nv1 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv0
                UNION ALL
                SELECT nv0.src, nsym.b FROM nv0
                JOIN nsym ON nsym.a = nv0.dst)
            ),
            nv2 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv1
                UNION ALL
                SELECT nv1.src, nsym.b FROM nv1
                JOIN nsym ON nsym.a = nv1.dst)
            ),
            nv3 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv2
                UNION ALL
                SELECT nv2.src, nsym.b FROM nv2
                JOIN nsym ON nsym.a = nv2.dst)
            ),
            nv4 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv3
                UNION ALL
                SELECT nv3.src, nsym.b FROM nv3
                JOIN nsym ON nsym.a = nv3.dst)
            ),
            nc AS (
              SELECT 0 AS r, (SELECT COUNT(*) FROM nv0) AS n
              UNION ALL
              SELECT 1, (SELECT COUNT(*) FROM nv1)
              UNION ALL
              SELECT 2, (SELECT COUNT(*) FROM nv2)
              UNION ALL
              SELECT 3, (SELECT COUNT(*) FROM nv3)
              UNION ALL
              SELECT 4, (SELECT COUNT(*) FROM nv4)
            )
            SELECT CAST(r AS INT) AS r,
                   CAST(n AS BIGINT) AS n_pairs,
                   CAST(n - COALESCE(LAG(n) OVER (ORDER BY r), 0)
                        AS BIGINT) AS new_pairs
            FROM nc ORDER BY r
        """,
        # Same (tokens DESC, doc_id) total order, same modulo shards.
        "balanced_shards_docs": f"""
            WITH bs_t AS (
              SELECT doc_id, len({_TOK}) AS tok FROM documents
            ),
            bs_r AS (
              SELECT doc_id, tok,
                     ROW_NUMBER() OVER (ORDER BY tok DESC, doc_id) AS rk
              FROM bs_t
            )
            SELECT CAST((rk - 1) % 8 AS INT) AS shard,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(tok) AS BIGINT) AS total_tokens,
                   CAST(MAX(tok) AS BIGINT) AS max_tokens
            FROM bs_r GROUP BY 1 ORDER BY 1
        """,
        # Same whitespace + BPE-ish token counts (text_tokens idiom),
        # same integer permille divisions.
        "tokenizer_fertility_docs": f"""
            WITH tf_d AS (
              SELECT source,
                     len({_TOK}) AS ws,
                     list_sum(list_transform(
                       regexp_extract_all(text,
                         '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'),
                       p -> CAST(ceil(length(p) / 4.0) AS BIGINT)
                     )) AS bpe,
                     length(text) AS ch
              FROM documents
            ),
            tf_a AS (
              SELECT source,
                     COUNT(*) AS n_docs,
                     SUM(ws) AS ws_tokens,
                     SUM(COALESCE(bpe, 0)) AS bpe_tokens,
                     SUM(ch) AS chars
              FROM tf_d GROUP BY source
            )
            SELECT source,
                   CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(ws_tokens AS BIGINT) AS ws_tokens,
                   CAST(bpe_tokens AS BIGINT) AS bpe_tokens,
                   CAST(chars AS BIGINT) AS chars,
                   CAST(CASE WHEN ws_tokens > 0
                        THEN bpe_tokens * 1000 // ws_tokens
                        ELSE 0 END AS BIGINT) AS fertility_permille,
                   CAST(CASE WHEN bpe_tokens > 0
                        THEN chars * 1000 // bpe_tokens
                        ELSE 0 END AS BIGINT) AS chars_per_bpe_permille
            FROM tf_a ORDER BY source
        """,
        # Planted exact copies -> LSH recall 100%; brute-force cosine
        # join is the exact truth (same argument as embedding_dedup).
        "semantic_decontam": """
            WITH sd_eval AS (
              SELECT vec_id + 100000 AS eval_id, embedding
              FROM embeddings WHERE vec_id < 10
            )
            SELECT e.eval_id, t.vec_id AS train_id
            FROM sd_eval e JOIN embeddings t
              ON list_cosine_similarity(e.embedding::DOUBLE[],
                                        t.embedding::DOUBLE[]) >= 0.95
            ORDER BY eval_id, train_id
        """,
        # Recursive-CTE BFS from the same 8 seeds; per-node argmin on
        # (dist, seed) lexicographic order — identical tiebreak.
        "nearest_seed_parts": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
            seeds AS (
              SELECT a FROM (SELECT DISTINCT a FROM sym)
              ORDER BY a LIMIT 8
            ),
            bfs(s, id, d) AS (
              SELECT a, a, 0 FROM seeds
              UNION
              SELECT bfs.s, sym.b, bfs.d + 1
              FROM bfs JOIN sym ON bfs.id = sym.a
              WHERE bfs.d < 3
            ),
            md AS (SELECT s, id, MIN(d) AS d FROM bfs GROUP BY s, id)
            SELECT id, CAST(s AS BIGINT) AS seed, CAST(d AS INT) AS dist
            FROM (
              SELECT id, s, d, ROW_NUMBER() OVER (
                PARTITION BY id ORDER BY d, s) AS rn
              FROM md
            ) WHERE rn = 1 ORDER BY id
        """,
        # stream≡batch: merged bin counts == one batch GROUP BY; the
        # /8.0 division is exact IEEE (power of two), FLOOR identical.
        "streaming_histogram": """
            SELECT CAST(FLOOR(value / 8.0) AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events WHERE value IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        # Same md5 node draw (":sub" salt), same canonical edges, same
        # integer summary.
        "induced_subgraph_parts": """
            WITH isp_e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            isp_k AS (
              SELECT a, b FROM isp_e
              WHERE CAST((md5_number_upper(CAST(a AS VARCHAR) || ':sub')
                          & 9223372036854775807) AS BIGINT) % 1000 < 250
                AND CAST((md5_number_upper(CAST(b AS VARCHAR) || ':sub')
                          & 9223372036854775807) AS BIGINT) % 1000 < 250
            ),
            isp_n AS (
              SELECT COUNT(DISTINCT id) AS n_nodes FROM (
                SELECT a AS id FROM isp_k
                UNION ALL SELECT b FROM isp_k)
            ),
            isp_m AS (SELECT COUNT(*) AS n_edges FROM isp_k)
            SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
                   CAST(n_edges AS BIGINT) AS n_edges,
                   CAST(CASE WHEN n_nodes > 0
                        THEN 2 * n_edges * 1000 // n_nodes
                        ELSE 0 END AS BIGINT) AS avg_degree_permille
            FROM isp_n, isp_m
        """,
        "onion_layers_parts": _onion_oracle(waves=48),
        "graph_summary": _GRAPH_WITH + """
            SELECT 'node' AS kind, label, COUNT(*) AS n_rows,
                   CAST(NULL AS BIGINT) AS n_src,
                   CAST(NULL AS BIGINT) AS n_dst
            FROM nodes_v GROUP BY label
            UNION ALL
            SELECT 'edge', label, COUNT(*),
                   COUNT(DISTINCT src), COUNT(DISTINCT dst)
            FROM edges_v GROUP BY label
            ORDER BY kind, label
        """,
        # Same closure as dedup_minhash_keep_best; survivor sorted by
        # source priority (lowest srcN) instead of n_chars.
        "dedup_keep_source": f"""
            WITH RECURSIVE
            t AS MATERIALIZED (SELECT doc_id,
                               list_distinct({_TOK}) AS toks FROM documents),
            pairs AS MATERIALIZED (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM t a JOIN t b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) >= 0.9
            ),
            sym AS MATERIALIZED (
              SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
            ),
            reach AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
              WHERE s.b <> r.a
            ),
            comp AS (
              SELECT d.doc_id,
                     LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id))
                       AS component
              FROM t d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id
            )
            SELECT doc_id FROM (
              SELECT c.doc_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY c.component
                       ORDER BY CAST(regexp_extract(dd.source,
                                     '([0-9]+)', 1) AS INT),
                                c.doc_id) AS rn
              FROM comp c JOIN documents dd ON dd.doc_id = c.doc_id
            ) WHERE rn = 1
        """,
        # quality_score formula == the certified quality_topk oracle;
        # shard = equal-size cut of the (score desc, doc_id) total
        # order by integer rank arithmetic.
        "curriculum_shards": f"""
            WITH t AS (
              SELECT doc_id, n_chars, text, {_TOK} AS toks,
                     len(text) AS nc FROM documents
            ),
            f AS (
              SELECT doc_id, n_chars,
                     len(toks) AS n_tokens,
                     CASE WHEN nc > 0
                          THEN len(regexp_replace(text, '[A-Za-z0-9\\s]',
                                                  '', 'g'))
                               / CAST(nc AS DOUBLE)
                          ELSE 0.0 END AS punct_ratio,
                     CASE WHEN len(toks) > 0
                          THEN len(list_filter(toks, x -> list_contains(
                                 ['the','a','of','and','to','in','is',
                                  'that','it','for'], x)))
                               / CAST(len(toks) AS DOUBLE)
                          ELSE 0.0 END AS stopword_ratio
              FROM t
            ),
            s AS (
              SELECT doc_id, n_chars,
                     LEAST(n_tokens / 50.0, 1.0) * 0.4
                     + (1.0 - LEAST(punct_ratio * 5.0, 1.0)) * 0.3
                     + LEAST(stopword_ratio * 5.0, 1.0) * 0.3
                       AS quality_score
              FROM f
            ),
            r AS (
              SELECT doc_id, n_chars, quality_score,
                     ROW_NUMBER() OVER (ORDER BY quality_score DESC,
                                        doc_id) AS rnk,
                     COUNT(*) OVER () AS n
              FROM s
            )
            SELECT shard, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   ROUND(MIN(quality_score), 6) AS min_quality,
                   ROUND(MAX(quality_score), 6) AS max_quality
            FROM (SELECT ((rnk - 1) * 4) // n + 1 AS shard,
                         n_chars, quality_score FROM r)
            GROUP BY shard ORDER BY shard
        """,
        # Multi-source BFS as ONE recursive CTE (landmark rides along in
        # the working set); MIN(d) per (landmark, node) = first hit; the
        # top-20 sort runs on the ROUNDED score in both engines.
        "harmonic_parts": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
            seeds AS (
              SELECT a FROM (SELECT DISTINCT a FROM sym)
              ORDER BY a LIMIT 8
            ),
            bfs(s, id, d) AS (
              SELECT a, a, 0 FROM seeds
              UNION
              SELECT bfs.s, sym.b, bfs.d + 1
              FROM bfs JOIN sym ON bfs.id = sym.a
              WHERE bfs.d < 3
            ),
            md AS (SELECT s, id, MIN(d) AS d FROM bfs GROUP BY s, id)
            SELECT id, ROUND(SUM(1.0 / d), 6) AS harmonic,
                   COUNT(*) AS n_reached
            FROM md WHERE d > 0
            GROUP BY id
            ORDER BY harmonic DESC, id LIMIT 20
        """,
        "closeness_parts": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
            seeds AS (
              SELECT a FROM (SELECT DISTINCT a FROM sym)
              ORDER BY a LIMIT 8
            ),
            bfs(s, id, d) AS (
              SELECT a, a, 0 FROM seeds
              UNION
              SELECT bfs.s, sym.b, bfs.d + 1
              FROM bfs JOIN sym ON bfs.id = sym.a
              WHERE bfs.d < 3
            ),
            md AS (SELECT s, id, MIN(d) AS d FROM bfs GROUP BY s, id)
            SELECT id,
                   ROUND(COUNT(*) * 1.0 / SUM(d), 6) AS closeness,
                   CAST(SUM(d) AS BIGINT) AS sum_dist,
                   COUNT(*) AS n_reached
            FROM md WHERE d > 0
            GROUP BY id
            ORDER BY closeness DESC, id LIMIT 20
        """,
        "eccentricity_parts": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
            seeds AS (
              SELECT a FROM (SELECT DISTINCT a FROM sym)
              ORDER BY a LIMIT 8
            ),
            bfs(s, id, d) AS (
              SELECT a, a, 0 FROM seeds
              UNION
              SELECT bfs.s, sym.b, bfs.d + 1
              FROM bfs JOIN sym ON bfs.id = sym.a
              WHERE bfs.d < 3
            ),
            md AS (SELECT s, id, MIN(d) AS d FROM bfs GROUP BY s, id)
            SELECT s AS landmark, MAX(d) AS eccentricity_lb,
                   COUNT(*) AS n_reached
            FROM md
            GROUP BY s
            ORDER BY landmark
        """,
        "sssp_weighted": _sssp_weighted_oracle(max_hops=4),
        "khop_features": f"""
            {_GRAPH_WITH},
            e AS MATERIALIZED (
              SELECT src, dst FROM edges_v
              WHERE label IN ('placed', 'contains')
            ),
            p1 AS (SELECT DISTINCT src AS a, dst AS b FROM e
                   WHERE src <> dst),
            p2 AS (SELECT DISTINCT p.a, e.dst AS b
                   FROM p1 p JOIN e ON e.src = p.b WHERE e.dst <> p.a),
            pk AS (SELECT a, b FROM p1 UNION SELECT a, b FROM p2)
            SELECT pk.a AS id,
                   COUNT(*) AS n_neighbors,
                   {_DEC_SUM.format(col="o.o_totalprice")}
                     AS sum_neighbor_totalprice
            FROM pk LEFT JOIN orders o
              ON pk.b = o.o_orderkey + {ORDER_BASE}
            GROUP BY pk.a
        """,
        "triangles_coorder": """
            WITH pairs AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            )
            SELECT COUNT(*) AS n_triangles
            FROM pairs e1
            JOIN pairs e2 ON e1.b = e2.a
            JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
        "motif_supply_chain": f"""
            WITH sb AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            SELECT s.s_nationkey + {NATION_BASE} AS nation_id,
                   COUNT(*) AS n_chains
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN sb ON sb.l_partkey = l.l_partkey
            JOIN supplier s ON sb.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey = s.s_nationkey
            GROUP BY 1
        """,
        "pattern_diamond": f"""
            WITH sb AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            SELECT s.s_nationkey + {NATION_BASE} AS nation_id,
                   COUNT(*) AS n_chains
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN sb ON sb.l_partkey = l.l_partkey
            JOIN supplier s ON sb.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey = s.s_nationkey
            GROUP BY 1
        """,
        "retrieval_eval_bm25": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            q AS (
              SELECT doc_id AS query_id,
                     unnest(list_distinct(toks)) AS term
              FROM t WHERE doc_id IN (1, 5, 8, 11, 12)
            ),
            terms AS (SELECT DISTINCT term FROM q),
            corpus AS (
              SELECT COUNT(*) AS n_docs,
                     SUM(len(toks)) / COUNT(*) AS avgdl
              FROM t
            ),
            tf AS (
              SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
                SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                FROM t
              )
              WHERE term IN (SELECT term FROM terms)
              GROUP BY 1, 2, 3
            ),
            dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            scored AS (
              SELECT q.query_id, f.doc_id,
                     CAST(
                       ((n_docs - df + CAST(0.5 AS DOUBLE))
                          / (df + CAST(0.5 AS DOUBLE)))
                       * (tf * CAST(2.2 AS DOUBLE))
                       / (tf + CAST(1.2 AS DOUBLE)
                            * (CAST(0.25 AS DOUBLE)
                               + (CAST(0.75 AS DOUBLE) * dl) / avgdl))
                       AS DECIMAL(38,12)) AS term_score
              FROM tf f
              JOIN dfq USING (term)
              CROSS JOIN corpus
              JOIN q ON q.term = f.term
            ),
            totals AS (
              SELECT query_id, doc_id,
                     CAST(SUM(term_score) AS DOUBLE) AS score
              FROM scored GROUP BY 1, 2
            ),
            ranked AS (
              SELECT query_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id)
                       AS rank
              FROM totals WHERE doc_id <> query_id
            ),
            topk AS (SELECT * FROM ranked WHERE rank <= 10),
            jac AS (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM (SELECT doc_id, list_distinct(toks) AS s FROM t) a
              JOIN (SELECT doc_id, list_distinct(toks) AS s FROM t) b
                ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s)
                       - len(list_intersect(a.s, b.s))) >= 0.9
            ),
            rel AS (
              SELECT a_id AS query_id, b_id AS doc_id FROM jac
              WHERE a_id IN (1, 5, 8, 11, 12)
              UNION
              SELECT b_id, a_id FROM jac WHERE b_id IN (1, 5, 8, 11, 12)
            ),
            hits AS (
              SELECT k.query_id, MIN(k.rank) AS first_rel_rank,
                     COUNT(*) AS n_rel_in_topk
              FROM topk k JOIN rel
                ON rel.query_id = k.query_id AND rel.doc_id = k.doc_id
              GROUP BY 1
            ),
            nrel AS (
              SELECT query_id, COUNT(*) AS n_rel_total FROM rel GROUP BY 1
            ),
            qids AS (SELECT DISTINCT query_id FROM q)
            SELECT qids.query_id,
                   CAST(first_rel_rank AS INTEGER) AS first_rel_rank,
                   ROUND(1.0 / first_rel_rank, 6) AS rr,
                   CAST(COALESCE(n_rel_in_topk, 0) AS BIGINT)
                     AS n_rel_in_topk,
                   CAST(COALESCE(n_rel_total, 0) AS BIGINT) AS n_rel_total,
                   CASE WHEN COALESCE(n_rel_total, 0) > 0
                        THEN ROUND(COALESCE(n_rel_in_topk, 0)
                                   / (1.0 * n_rel_total), 6)
                   END AS recall_at_10
            FROM qids
            LEFT JOIN hits ON hits.query_id = qids.query_id
            LEFT JOIN nrel ON nrel.query_id = qids.query_id
            ORDER BY 1
        """,
        "store_incremental_topk": f"""
            WITH nodes AS (
              SELECT c_custkey + {CUSTOMER_BASE} AS id,
                     'customer' AS label,
                     CAST(c_acctbal AS DOUBLE) AS value
              FROM customer WHERE c_custkey NOT IN (1, 3)
              UNION ALL
              SELECT {CUSTOMER_BASE} + 3, 'customer', 88888.88
              UNION ALL
              SELECT s_suppkey + {SUPPLIER_BASE}, 'supplier',
                     CAST(s_acctbal AS DOUBLE)
              FROM supplier
              UNION ALL
              SELECT {SUPPLIER_BASE} + 999999, 'supplier', 99999.99
            ),
            r AS (
              SELECT label, id, value,
                     ROW_NUMBER() OVER (PARTITION BY label
                                        ORDER BY value DESC, id) AS rank
              FROM nodes
            )
            SELECT label, CAST(rank AS INTEGER) AS rank, id, value
            FROM r WHERE rank <= 3 ORDER BY label, rank
        """,
        "knn_components": """
            WITH RECURSIVE e0 AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            scored AS (
              SELECT q.vec_id AS a, e.vec_id AS b,
                     list_cosine_similarity(q.v, e.v) AS s
              FROM e0 q JOIN e0 e ON e.vec_id <> q.vec_id
            ),
            knn AS (
              SELECT a, b FROM (
                SELECT a, b,
                       ROW_NUMBER() OVER (PARTITION BY a
                                          ORDER BY s DESC, b) AS rnk
                FROM scored)
              WHERE rnk <= 2
            ),
            mut AS (
              SELECT k1.a, k1.b FROM knn k1
              WHERE EXISTS (SELECT 1 FROM knn k2
                            WHERE k2.a = k1.b AND k2.b = k1.a)
            ),
            sym AS (SELECT a, b FROM mut UNION SELECT b, a FROM mut),
            reach(id, r) AS (
              SELECT vec_id, vec_id FROM embeddings
              UNION
              SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.id
            ),
            comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
            SELECT component, COUNT(*) AS n_members,
                   COUNT(DISTINCT emb.label) AS n_labels
            FROM comp JOIN embeddings emb ON emb.vec_id = comp.id
            GROUP BY 1 ORDER BY 1
        """,
        "lexical_diversity": f"""
            WITH t AS (
              SELECT doc_id, unnest({_TOK}) AS tok FROM documents
            ),
            tf AS (
              SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2
            ),
            agg AS (
              SELECT doc_id,
                     CAST(SUM(tf) AS BIGINT) AS n_tokens,
                     COUNT(*) AS n_distinct,
                     CAST(SUM(tf * tf) AS BIGINT) AS sumsq
              FROM tf GROUP BY 1
            )
            SELECT doc_id, n_tokens, n_distinct,
                   n_tokens * n_tokens - sumsq AS simpson_num,
                   ROUND((n_tokens * n_tokens - sumsq)
                         / (1.0 * n_tokens * n_tokens), 6) AS simpson
            FROM agg ORDER BY doc_id
        """,
        "split_leakage_report": f"""
            WITH t AS (SELECT doc_id,
                              list_distinct({_TOK}) AS toks FROM documents),
            sp AS (
              SELECT doc_id,
                     CASE WHEN (md5_number_upper(CAST(doc_id AS VARCHAR))
                                & 9223372036854775807) % 100 < 90
                          THEN 'train' ELSE 'val' END AS split
              FROM documents
            ),
            p AS (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM t a JOIN t b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) >= 0.9
            )
            SELECT least(sa.split, sb.split) AS split_a,
                   greatest(sa.split, sb.split) AS split_b,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM p
            JOIN sp sa ON sa.doc_id = p.a_id
            JOIN sp sb ON sb.doc_id = p.b_id
            GROUP BY 1, 2
        """,
        "corpus_drift_tvd": """
            WITH b AS (
              SELECT source AS grp, n_chars // 64 AS bin FROM documents
            ),
            counts AS (SELECT grp, bin, COUNT(*) AS o FROM b GROUP BY 1, 2),
            bins AS (SELECT bin, COUNT(*) AS tot FROM b GROUP BY 1),
            groups AS (SELECT grp, COUNT(*) AS n_group FROM b GROUP BY 1),
            grand AS (SELECT COUNT(*) AS n_all FROM b),
            grid AS (
              SELECT g.grp, g.n_group, bi.bin, bi.tot,
                     COALESCE(c.o, 0) AS o,
                     bi.tot - COALESCE(c.o, 0) AS r,
                     ga.n_all - g.n_group AS n_rest
              FROM groups g CROSS JOIN bins bi CROSS JOIN grand ga
              LEFT JOIN counts c ON c.grp = g.grp AND c.bin = bi.bin
            )
            SELECT grp AS source, n_group, n_rest,
                   CAST(SUM(ABS(o * n_rest - r * n_group)) AS BIGINT)
                     AS tvd_num,
                   ROUND(CAST(SUM(ABS(o * n_rest - r * n_group)) AS BIGINT)
                         / (2.0 * n_group * n_rest), 6) AS tvd
            FROM grid
            GROUP BY 1, 2, 3
            ORDER BY 1
        """,
        "temporal_triples": """
            SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_triples
            FROM events c
            JOIN events v
              ON v.user_id = c.user_id AND v.event_type = 'view'
             AND v.ts > c.ts
            JOIN events p
              ON p.user_id = c.user_id AND p.event_type = 'purchase'
             AND p.ts > v.ts AND epoch(p.ts) - epoch(c.ts) < 86400
            WHERE c.event_type = 'click'
            GROUP BY 1
            ORDER BY 1
        """,
        "bloom_prune_report": """
            WITH build AS (
              SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderpriority = '1-URGENT'
                AND year(o_orderdate) = 1995
            ),
            bits AS (
              SELECT DISTINCT
                CAST((md5_number_upper(
                    CAST(o_custkey AS VARCHAR) || ':' || CAST(i AS VARCHAR))
                  & 9223372036854775807) AS BIGINT) % 2048 AS pos
              FROM build, range(2) t(i)
            ),
            probe AS (
              SELECT c_custkey, c_mktsegment,
                CAST((md5_number_upper(CAST(c_custkey AS VARCHAR) || ':0')
                  & 9223372036854775807) AS BIGINT) % 2048 AS p0,
                CAST((md5_number_upper(CAST(c_custkey AS VARCHAR) || ':1')
                  & 9223372036854775807) AS BIGINT) % 2048 AS p1
              FROM customer
            )
            SELECT c_mktsegment AS mktsegment,
              CAST(COUNT(*) FILTER (
                WHERE p0 IN (SELECT pos FROM bits)
                  AND p1 IN (SELECT pos FROM bits)) AS BIGINT
              ) AS n_bloom_pass,
              CAST(COUNT(*) AS BIGINT) AS n_customers,
              CAST(COUNT(*) FILTER (
                WHERE c_custkey IN (SELECT o_custkey FROM build)) AS BIGINT
              ) AS n_true_match
            FROM probe GROUP BY 1
        """,
        "pattern_supply_gap": f"""
            WITH sb AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            SELECT c.c_nationkey + {NATION_BASE} AS nation_id,
                   COUNT(*) AS n_gaps
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON s.s_nationkey = c.c_nationkey
            WHERE NOT EXISTS (
                SELECT 1 FROM sb
                WHERE sb.l_partkey = l.l_partkey
                  AND sb.l_suppkey = s.s_suppkey
            )
            GROUP BY 1
        """,
        "window_rank_customers": f"""
            WITH spent AS (
              SELECT o_custkey + {CUSTOMER_BASE} AS customer_id,
                     {sums.format(col="o_totalprice")} AS total_spent
              FROM orders GROUP BY 1
            ),
            loc AS (
              SELECT c_custkey + {CUSTOMER_BASE} AS customer_id,
                     c_nationkey + {NATION_BASE} AS nation_id
              FROM customer
            )
            SELECT nation_id, customer_id, total_spent,
                   CAST(rnk AS INTEGER) AS rnk
            FROM (
              SELECT l.nation_id, s.customer_id, s.total_spent,
                     ROW_NUMBER() OVER (PARTITION BY l.nation_id
                       ORDER BY s.total_spent DESC, s.customer_id) AS rnk
              FROM spent s JOIN loc l ON s.customer_id = l.customer_id
            ) WHERE rnk <= 3
        """,
        "rollup_order_stats": f"""
            SELECT o_orderstatus AS status, o_orderpriority AS priority,
                   COUNT(*) AS n_orders,
                   {sums.format(col="o_totalprice")} AS total
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "set_ops_customers": f"""
            SELECT c_custkey + {CUSTOMER_BASE} AS customer_id
            FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            EXCEPT
            SELECT c_custkey + {CUSTOMER_BASE}
            FROM customer WHERE c_mktsegment = 'MACHINERY'
        """,
        "topk_orders": f"""
            SELECT o_orderkey + {ORDER_BASE} AS id,
                   o_totalprice AS totalprice, o_orderstatus AS status
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "dedup_minhash": f"""
            WITH t AS (SELECT doc_id,
                              list_distinct({_TOK}) AS toks FROM documents)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM t a JOIN t b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                  / (len(a.toks) + len(b.toks)
                     - len(list_intersect(a.toks, b.toks))) >= 0.9
        """,
        "dedup_jaccard": f"""
            WITH t AS (SELECT doc_id, lang, source,
                              list_distinct({_TOK}) AS toks FROM documents)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM t a JOIN t b
              ON a.lang = b.lang AND a.source = b.source
             AND a.doc_id < b.doc_id
            WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                  / (len(a.toks) + len(b.toks)
                     - len(list_intersect(a.toks, b.toks))) >= 0.8
        """,
        # Stream≡batch for a MERGEABLE sketch: CMS counters add, so the
        # 4-micro-batch accumulated sketch equals the batch sketch of the
        # same rows — rebuilt here from the same pinned md5 hash draw.
        # Inner probe join is safe: every probed term is in-corpus.
        "streaming_cms": """
            WITH sc_sk AS (
              SELECT row, bucket, COUNT(*) AS cnt FROM (
                SELECT d.d AS row,
                       CAST(md5_number_upper('cms:' || d.d || ':'
                              || event_type)
                            & 9223372036854775807 AS BIGINT) % 1024
                         AS bucket
                FROM events
                CROSS JOIN (SELECT unnest(range(4)) AS d) d
              ) GROUP BY 1, 2
            ),
            sc_probes AS (
              SELECT t.term, d.d AS row,
                     CAST(md5_number_upper('cms:' || d.d || ':' || t.term)
                          & 9223372036854775807 AS BIGINT) % 1024
                       AS bucket
              FROM (SELECT DISTINCT event_type AS term FROM events) t
              CROSS JOIN (SELECT unnest(range(4)) AS d) d
            )
            SELECT p.term, CAST(MIN(s.cnt) AS BIGINT) AS cms_estimate
            FROM sc_probes p JOIN sc_sk s USING (row, bucket)
            GROUP BY 1
        """,
        # Same explicit rank arithmetic as the engine (NOT quantile_disc,
        # whose index convention need not match ceil(q*n)).
        "quantile_filter_docs": """
            WITH qf_c AS (SELECT source, n_chars, COUNT(*) AS cnt
                          FROM documents GROUP BY 1, 2),
            qf_cum AS (
              SELECT source, n_chars,
                     SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars)
                       AS cum,
                     SUM(cnt) OVER (PARTITION BY source) AS n
              FROM qf_c
            ),
            qf_thr AS (
              SELECT source, MIN(n_chars) AS t FROM qf_cum
              WHERE cum >= (750 * n + 999) // 1000 GROUP BY source
            )
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d JOIN qf_thr USING (source)
            WHERE d.n_chars >= t
        """,
        # Every count derived relationally: base = graph cardinalities,
        # delta = 1 updated node + 1 removed node + its incident edges.
        "store_version_summary": f"""
            {_GRAPH_WITH}
            SELECT 0 AS version, 'base' AS kind,
                   (SELECT COUNT(*) FROM nodes_v) AS n_node_upserts,
                   (SELECT COUNT(*) FROM edges_v) AS n_edge_upserts,
                   CAST(0 AS BIGINT) AS n_node_deletes,
                   CAST(0 AS BIGINT) AS n_edge_deletes
            UNION ALL
            SELECT 1, 'delta', 1, 0, 1,
                   (SELECT COUNT(*) FROM edges_v
                    WHERE src = {SUPPLIER_BASE} + 1
                       OR dst = {SUPPLIER_BASE} + 1)
        """,
        # Same shingle construction as dedup_containment's ct CTE; sizes
        # and intersections over per-source DISTINCT shingle sets.
        "source_overlap": f"""
            WITH so_t AS (SELECT source, {_TOK} AS toks FROM documents),
            so_sh AS (
              SELECT DISTINCT source, unnest(
                CASE WHEN len(toks) >= 3 THEN
                  list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [array_to_string(toks, ' ')] END) AS sh
              FROM so_t
            ),
            so_sizes AS (SELECT source, COUNT(*) AS n FROM so_sh
                         GROUP BY source)
            SELECT x.source AS a, y.source AS b,
                   CAST(sa.n AS BIGINT) AS n_a,
                   CAST(sb.n AS BIGINT) AS n_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM so_sh x JOIN so_sh y
              ON x.sh = y.sh AND x.source < y.source
            JOIN so_sizes sa ON sa.source = x.source
            JOIN so_sizes sb ON sb.source = y.source
            GROUP BY 1, 2, sa.n, sb.n
        """,
        # Same deterministic v2 derivation in pure id arithmetic: the
        # diff statuses depend only on doc_id residues + the added row.
        "corpus_diff": """
            SELECT doc_id AS id,
                   CASE WHEN doc_id % 97 = 0 THEN 'removed'
                        WHEN doc_id % 101 = 0 THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM documents
            UNION ALL
            SELECT 900001, 'added'
        """,
        # First-occurrence decomposition at per-doc granularity; novel =
        # shingles whose corpus-min doc_id is this doc.
        "doc_novelty": f"""
            WITH dn_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            dn_sh AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(toks) >= 3 THEN
                  list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [array_to_string(toks, ' ')] END)) AS sh
              FROM dn_t
            ),
            dn_first AS (SELECT sh, MIN(doc_id) AS fd FROM dn_sh GROUP BY sh)
            SELECT s.doc_id AS id,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(SUM(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel
            FROM dn_sh s JOIN dn_first f USING (sh)
            GROUP BY s.doc_id
        """,
        # Lexicographic (tf DESC, df ASC, term) rank — integer-exact
        # keyword extraction, monotone in tf*idf for decreasing idf.
        "distinctive_terms": f"""
            WITH dt_tok AS (SELECT doc_id AS id, unnest({_TOK}) AS term
                            FROM documents),
            dt_tf AS (SELECT id, term, COUNT(*) AS tf
                      FROM dt_tok GROUP BY id, term),
            dt_df AS (SELECT term, COUNT(*) AS df FROM dt_tf GROUP BY term)
            SELECT id, rank, term, tf, df FROM (
              SELECT t.id, t.term,
                     CAST(t.tf AS BIGINT) AS tf,
                     CAST(d.df AS BIGINT) AS df,
                     ROW_NUMBER() OVER (PARTITION BY t.id
                       ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS rank
              FROM dt_tf t JOIN dt_df d USING (term)
            ) WHERE rank <= 3
        """,
        # Running-distinct decomposed as new-type-at-first-occurrence;
        # windowed SUMs cast (DuckDB widens to HUGEINT).
        "vocab_growth": f"""
            WITH vg_tok AS (SELECT doc_id AS id, unnest({_TOK}) AS term
                            FROM documents),
            vg_pb AS (SELECT id // 50 AS bucket, COUNT(*) AS toks
                      FROM vg_tok GROUP BY 1),
            vg_fs AS (SELECT term, MIN(id) AS first_id
                      FROM vg_tok GROUP BY term),
            vg_nt AS (SELECT first_id // 50 AS bucket, COUNT(*) AS types
                      FROM vg_fs GROUP BY 1)
            SELECT bucket,
                   CAST(SUM(toks) OVER (ORDER BY bucket) AS BIGINT)
                     AS cum_tokens,
                   CAST(SUM(COALESCE(types, 0)) OVER (ORDER BY bucket)
                        AS BIGINT) AS cum_types
            FROM vg_pb LEFT JOIN vg_nt USING (bucket)
        """,
        # Dominance anti-join over the same quadratic containment
        # ground truth (dominating = strictly larger shingle set, or
        # equal size with smaller id).
        "dedup_containment_prune": f"""
            WITH cp_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            cp AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(toks) >= 3 THEN
                  list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [array_to_string(toks, ' ')] END) AS sh
              FROM cp_t
            )
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d JOIN cp a ON d.doc_id = a.doc_id
            WHERE NOT EXISTS (
              SELECT 1 FROM cp b
              WHERE b.doc_id <> a.doc_id
                AND (len(b.sh) > len(a.sh)
                     OR (len(b.sh) = len(a.sh) AND b.doc_id < a.doc_id))
                AND len(list_intersect(a.sh, b.sh))::DOUBLE
                    / len(a.sh) >= 0.8
            )
        """,
        # Quadratic all-ordered-pairs containment ground truth; the
        # engine's prefix-filtered join must reproduce it losslessly.
        # Engine intersects xxhash64(token) sets — same cardinalities as
        # the string sets up to 64-bit collisions (~1e-11 here).
        "dedup_containment": f"""
            WITH ct_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            ct AS (
              SELECT doc_id, list_distinct(
                CASE WHEN len(toks) >= 3 THEN
                  list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [array_to_string(toks, ' ')] END) AS sh
              FROM ct_t
            )
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(len(a.sh) AS BIGINT) AS n_a,
                   CAST(len(b.sh) AS BIGINT) AS n_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)
                     AS n_common
            FROM ct a JOIN ct b ON a.doc_id <> b.doc_id
            WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                  / len(a.sh) >= 0.8
        """,
        # Exact all-pairs Jaccard >= 0.9 -> symmetric transitive closure
        # (recursive CTE) -> min-id per component: the ground truth the
        # LSH-star + connected-components keep path must reproduce when
        # candidate recall is 100% (it is: dedup_minhash matches the same
        # exact pair set).
        "dedup_minhash_keep": f"""
            WITH RECURSIVE
            t AS MATERIALIZED (SELECT doc_id,
                               list_distinct({_TOK}) AS toks FROM documents),
            pairs AS MATERIALIZED (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM t a JOIN t b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) >= 0.9
            ),
            sym AS MATERIALIZED (
              SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
            ),
            reach AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
              WHERE s.b <> r.a
            )
            SELECT DISTINCT component AS doc_id FROM (
              SELECT d.doc_id,
                     LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id))
                       AS component
              FROM t d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id
            )
        """,
        # Planted star fixture (see q_dedup_minhash_keep_star): clusters
        # are exact-duplicate families keyed by floor(sqrt(id)) over the
        # 10x-expanded id range, cross-cluster Jaccard exactly 0 — star
        # linkage provably keeps min id per cluster (the perfect squares).
        "dedup_minhash_keep_star": """
            WITH s AS (
              SELECT d.doc_id * 10 + r.j AS id
              FROM documents d
              CROSS JOIN (SELECT unnest(range(10)) AS j) r
            )
            SELECT MIN(id) AS doc_id
            FROM s
            GROUP BY CAST(FLOOR(SQRT(id)) AS BIGINT)
            ORDER BY doc_id
        """,
        # Same closure as dedup_minhash_keep; survivor = argmax(n_chars)
        # with min-id tiebreak instead of min id.
        "dedup_minhash_keep_best": f"""
            WITH RECURSIVE
            t AS MATERIALIZED (SELECT doc_id,
                               list_distinct({_TOK}) AS toks FROM documents),
            pairs AS MATERIALIZED (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM t a JOIN t b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) >= 0.9
            ),
            sym AS MATERIALIZED (
              SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
            ),
            reach AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
              WHERE s.b <> r.a
            ),
            comp AS (
              SELECT d.doc_id,
                     LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id))
                       AS component
              FROM t d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id
            )
            SELECT doc_id FROM (
              SELECT c.doc_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY c.component
                       ORDER BY dd.n_chars DESC, c.doc_id) AS rn
              FROM comp c JOIN documents dd ON dd.doc_id = c.doc_id
            ) WHERE rn = 1
        """,
        # One shared closure, three survivor rules (min id / max n_chars /
        # source priority) — aggregated to (policy, count, exact id-sum)
        # so the hash certifies all three survivor sets at once. Mirrors
        # the three standalone keep oracles above/below.
        "dedup_policy_sweep": f"""
            WITH RECURSIVE
            t AS MATERIALIZED (SELECT doc_id,
                               list_distinct({_TOK}) AS toks FROM documents),
            pairs AS MATERIALIZED (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM t a JOIN t b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) >= 0.9
            ),
            sym AS MATERIALIZED (
              SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
            ),
            reach AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
              WHERE s.b <> r.a
            ),
            comp AS MATERIALIZED (
              SELECT d.doc_id,
                     LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id))
                       AS component
              FROM t d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id
            ),
            surv_min AS (SELECT DISTINCT component AS doc_id FROM comp),
            surv_best AS (
              SELECT doc_id FROM (
                SELECT c.doc_id,
                       ROW_NUMBER() OVER (
                         PARTITION BY c.component
                         ORDER BY dd.n_chars DESC, c.doc_id) AS rn
                FROM comp c JOIN documents dd ON dd.doc_id = c.doc_id
              ) WHERE rn = 1
            ),
            surv_src AS (
              SELECT doc_id FROM (
                SELECT c.doc_id,
                       ROW_NUMBER() OVER (
                         PARTITION BY c.component
                         ORDER BY CAST(regexp_extract(dd.source,
                                       '([0-9]+)', 1) AS INT),
                                  c.doc_id) AS rn
                FROM comp c JOIN documents dd ON dd.doc_id = c.doc_id
              ) WHERE rn = 1
            )
            SELECT * FROM (
              SELECT 'min_id' AS policy, COUNT(*) AS n_survivors,
                     CAST(SUM(doc_id) AS BIGINT) AS sum_ids FROM surv_min
              UNION ALL
              SELECT 'keep_best', COUNT(*),
                     CAST(SUM(doc_id) AS BIGINT) FROM surv_best
              UNION ALL
              SELECT 'keep_source', COUNT(*),
                     CAST(SUM(doc_id) AS BIGINT) FROM surv_src
            ) ORDER BY policy
        """,
        # Full SimHash rebuild in SQL: md5_number_upper == the engine's md5
        # hash family (functions/hashing.py), per-bit vote over the token
        # MULTISET, then exact all-pairs Hamming <= 3 — equal to the
        # engine's chunk-bucketed result because 4-chunk pigeonhole is
        # complete for <= 3 flips.
        "dedup_simhash": f"""
            WITH th AS MATERIALIZED (
              SELECT doc_id, md5_number_upper(t.t) AS h
              FROM documents, unnest({_TOK}) AS t(t)
            ),
            votes AS (
              SELECT doc_id, b.bit,
                     SUM(CASE WHEN (h >> b.bit) & 1 = 1
                              THEN 1 ELSE -1 END) AS v
              FROM th CROSS JOIN (SELECT unnest(range(64)) AS bit) b
              GROUP BY doc_id, b.bit
            ),
            sig0 AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN v > 0
                                   THEN CAST(1 AS UBIGINT) << bit
                                   ELSE CAST(0 AS UBIGINT) END)
                          AS UBIGINT) AS s
              FROM votes GROUP BY doc_id
            ),
            sig AS MATERIALIZED (
              SELECT d.doc_id, COALESCE(s0.s, CAST(0 AS UBIGINT)) AS s
              FROM documents d LEFT JOIN sig0 s0 ON d.doc_id = s0.doc_id
            )
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.s, b.s)) <= 3
        """,
        # Exact all-pairs cosine over the corpus + the planted copies. The
        # LSH path's exact-verify guarantees precision; identical planted
        # vectors guarantee recall — so bucketed == exact here.
        "embedding_dedup_pairs": """
            WITH e2 AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 100000 AS vec_id, embedding
              FROM embeddings WHERE vec_id < 10
            )
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.95
        """,
        # md5_63 == md5_number_upper with the sign bit masked, so MIN agrees
        # between Spark's signed BIGINT and DuckDB's UBIGINT.
        "fingerprint": f"""
            WITH t AS (SELECT doc_id, text, {_TOK} AS toks FROM documents),
            sh AS (
              SELECT doc_id, text,
                     CASE WHEN len(toks) >= 5 THEN
                       list_transform(range(1, len(toks) - 3),
                         i -> array_to_string(list_slice(toks, i, i + 4), ' '))
                     ELSE [array_to_string(toks, ' ')] END AS shingles
              FROM t
            )
            SELECT doc_id,
                   CAST(md5_number_upper(text) & 9223372036854775807
                        AS BIGINT) AS content_hash,
                   CAST(list_aggregate(
                          list_transform(shingles,
                            s -> md5_number_upper(s) & 9223372036854775807),
                          'min') AS BIGINT) AS min_shingle_hash
            FROM sh
        """,
        # The fold's fixed mutation log re-applied RELATIONALLY: adds,
        # last-update-wins merge, node removes cascading to incident edges —
        # the batch-CRUD truth of the streamed fold (VERDICT r2 #3). The
        # log literal mirrors q_streaming_fold's; seq order is add < update
        # < remove there, which the join encoding assumes.
        "streaming_fold": """
            WITH log(seq, op, kind, id, label, src, dst, v) AS (VALUES
              (1, 'add', 'node', 95000001, 'stream_probe', NULL, NULL, '1'),
              (2, 'add', 'node', 95000002, 'stream_probe', NULL, NULL, '2'),
              (3, 'add', 'node', 95000003, 'stream_probe', NULL, NULL, '3'),
              (4, 'add', 'edge', 96000001, 'stream_edge',
                 95000001, 95000002, NULL),
              (5, 'update', 'node', 95000001, NULL, NULL, NULL, '10'),
              (6, 'remove', 'node', 95000003, NULL, NULL, NULL, NULL)
            ),
            removed AS (SELECT id FROM log
                        WHERE op = 'remove' AND kind = 'node'),
            upd AS (
              SELECT id, v FROM (
                SELECT id, v, ROW_NUMBER() OVER (PARTITION BY id
                                                 ORDER BY seq DESC) AS rn
                FROM log WHERE op = 'update' AND kind = 'node'
              ) WHERE rn = 1
            )
            SELECT CAST(a.id AS BIGINT) AS id, COALESCE(u.v, a.v) AS v
            FROM log a LEFT JOIN upd u ON a.id = u.id
            WHERE a.op = 'add' AND a.kind = 'node'
              AND a.id NOT IN (SELECT id FROM removed)
            UNION ALL
            SELECT CAST(e.id AS BIGINT) AS id, 'edge' AS v
            FROM log e
            WHERE e.op = 'add' AND e.kind = 'edge'
              AND e.src NOT IN (SELECT id FROM removed)
              AND e.dst NOT IN (SELECT id FROM removed)
        """,
        # Exact top-10 over the corpus + planted exact query copies. The
        # approximate searches provably achieve 100% recall on this input
        # (identical vectors share every signature/centroid and score 1.0,
        # outranking all natural neighbors), so the exact oracle applies —
        # same construction as embedding_dedup_pairs. Ties (the 10 copies
        # all score 1.0) break by neighbor_id in both engines.
        "similarity_lsh": """
            WITH e2 AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT 100000 + vec_id * 100 + j.j AS vec_id, embedding
              FROM embeddings CROSS JOIN (SELECT unnest(range(10)) AS j) j
              WHERE vec_id < 5
            ),
            q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS s
              FROM q JOIN e2 e ON e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
            FROM (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY s DESC, neighbor_id)
                           AS rank
                  FROM scored)
            WHERE rank <= 10
        """,
        "similarity_ivf": """
            WITH e2 AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT 100000 + vec_id * 100 + j.j AS vec_id, embedding
              FROM embeddings CROSS JOIN (SELECT unnest(range(10)) AS j) j
              WHERE vec_id < 5
            ),
            q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS s
              FROM q JOIN e2 e ON e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
            FROM (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY s DESC, neighbor_id)
                           AS rank
                  FROM scored)
            WHERE rank <= 10
        """,
        "similarity_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS s
              FROM q JOIN embeddings e ON e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
            FROM (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY s DESC, neighbor_id)
                           AS rank
                  FROM scored)
            WHERE rank <= 10
        """,
        "text_stats": f"""
            SELECT lang, source, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(len({_TOK})) AS BIGINT) AS sum_tokens,
                   MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
            FROM documents GROUP BY lang, source
        """,
        "text_quality": f"""
            WITH t AS (
              SELECT doc_id, text, {_TOK} AS toks,
                     len(text) AS nc FROM documents WHERE doc_id < 50
            )
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CASE WHEN len(toks) > 0
                        THEN (nc - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE)
                        ELSE 0.0 END AS mean_token_len,
                   CASE WHEN nc > 0
                        THEN len(regexp_replace(text, '[A-Za-z0-9\\s]', '',
                                                'g')) / CAST(nc AS DOUBLE)
                        ELSE 0.0 END AS punct_ratio,
                   CASE WHEN len(toks) > 0
                        THEN len(list_filter(toks, x -> list_contains(
                               ['the','a','of','and','to','in','is','that',
                                'it','for'], x)))
                             / CAST(len(toks) AS DOUBLE)
                        ELSE 0.0 END AS stopword_ratio
            FROM t
        """,
        # Mirrors functions/text.py gopher_rules() signal by signal; all
        # thresholds are the function defaults.
        "gopher_quality": f"""
            WITH t AS (
              SELECT doc_id, text, {_TOK} AS toks,
                     list_filter(string_split(text, chr(10)),
                                 x -> len(trim(x)) > 0) AS lines
              FROM documents WHERE doc_id < 200
            ),
            m AS (
              SELECT doc_id,
                     len(toks) AS nw,
                     list_sum(list_transform(toks, x -> len(x))) AS sumlen,
                     len(list_filter(toks,
                         x -> regexp_matches(x, '[a-z]'))) AS nalpha,
                     len(list_filter(['the','be','to','of','and','that',
                                      'have','with'],
                         w -> list_contains(toks, w))) AS nsw,
                     len(text) - len(replace(text, '#', '')) AS nhash,
                     len(text) - len(replace(text, '…', '')) AS nuell,
                     (len(text) - len(replace(text, '...', ''))) / 3
                       AS ndots,
                     len(lines) AS nl,
                     len(list_filter(lines, x -> regexp_matches(
                         ltrim(x), '^[-*•‣◦]'))) AS nbullet,
                     len(list_filter(lines, x -> regexp_matches(
                         rtrim(x), '(\\.\\.\\.|…)$'))) AS nell
              FROM t
            ),
            sig AS (
              SELECT doc_id,
                     CAST(nw AS BIGINT) AS n_words,
                     CASE WHEN nw > 0 THEN ROUND(
                       sumlen / CAST(nw AS DOUBLE), 6) ELSE 0.0 END
                       AS mean_word_len,
                     CASE WHEN nw > 0 THEN ROUND(
                       (nhash + nuell + ndots) / CAST(nw AS DOUBLE), 6)
                       ELSE 0.0 END AS symbol_word_ratio,
                     CASE WHEN nl > 0 THEN ROUND(
                       nbullet / CAST(nl AS DOUBLE), 6) ELSE 0.0 END
                       AS frac_bullet_lines,
                     CASE WHEN nl > 0 THEN ROUND(
                       nell / CAST(nl AS DOUBLE), 6) ELSE 0.0 END
                       AS frac_ellipsis_lines,
                     CASE WHEN nw > 0 THEN ROUND(
                       nalpha / CAST(nw AS DOUBLE), 6) ELSE 0.0 END
                       AS frac_alpha_words,
                     CAST(nsw AS BIGINT) AS n_gopher_stopwords
              FROM m
            )
            SELECT *,
                   CAST(n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND symbol_word_ratio <= 0.1
                    AND frac_bullet_lines <= 0.9
                    AND frac_ellipsis_lines <= 0.3
                    AND frac_alpha_words >= 0.8
                    AND n_gopher_stopwords >= 2 AS INT) AS gopher_pass
            FROM sig
        """,
        "text_tokens": f"""
            SELECT doc_id,
                   CAST(len({_TOK}) AS BIGINT) AS n_ws_tokens,
                   CAST(list_sum(list_transform(
                     regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'),
                     p -> CAST(ceil(length(p) / 4.0) AS BIGINT)
                   )) AS BIGINT) AS n_bpe_tokens
            FROM documents WHERE doc_id < 100
        """,
        "lang_id": f"""
            WITH t AS (SELECT doc_id,
                              list_distinct({_TOK}) AS toks FROM documents),
            s AS (
              SELECT doc_id,
                len(list_intersect(toks, ['der','die','das','und','ist',
                  'nicht','ein','mit','zu'])) AS de,
                len(list_intersect(toks, ['the','a','of','and','to','in',
                  'is','that','it','for'])) AS en,
                len(list_intersect(toks, ['el','la','de','que','y','en',
                  'un','es','por','los'])) AS es,
                len(list_intersect(toks, ['le','la','de','et','un','est',
                  'pour','que','dans'])) AS fr,
                len(list_intersect(toks, ['de','shi','bu','wo','zai','you',
                  'le','ren','ta'])) AS zh
              FROM t
            )
            SELECT lang_pred, COUNT(*) AS n_docs FROM (
              SELECT CASE
                WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
                WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
                WHEN es >= fr AND es >= zh THEN 'es'
                WHEN fr >= zh THEN 'fr'
                ELSE 'zh' END AS lang_pred
              FROM s
            ) GROUP BY 1
        """,
        "multimodal_meta": """
            SELECT doc_id AS media_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS sha256,
                   CASE WHEN octet_length(encode(text)) = 0 THEN 'empty'
                        ELSE 'application/octet-stream' END AS sniffed_kind
            FROM documents
        """,
        "events_tumbling": f"""
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, COUNT(*) AS n_events,
                   {sums.format(col="value")} AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_sliding": f"""
            SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                            - INTERVAL '30 minutes' * g.k,
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, COUNT(*) AS n_events,
                   {sums.format(col="value")} AS sum_value
            FROM events, (VALUES (0), (1)) AS g(k)
            GROUP BY 1, 2
        """,
        "events_session": f"""
            WITH o AS (
              SELECT user_id, ts, value,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts - LAG(ts) OVER w >= INTERVAL '10 minutes'
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM o
            )
            SELECT user_id,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f')
                     AS session_start,
                   COUNT(*) AS n_events,
                   {sums.format(col="value")} AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "events_json_prop": """
            SELECT event_id,
                   TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "events_type_stats": f"""
            SELECT event_type, COUNT(*) AS n_events,
                   {sums.format(col="value")} AS sum_value,
                   MIN(value) AS min_value, MAX(value) AS max_value
            FROM events GROUP BY 1
        """,
        # stream(events ∪ events) through dropDuplicatesWithinWatermark
        # ≡ the original table (event_id unique; survivors exact copies)
        "streaming_interval_join": """
            SELECT c.user_id,
                   c.event_id AS click_id,
                   p.event_id AS purchase_id,
                   p.value AS purchase_value,
                   CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
            FROM events c
            JOIN events p
              ON p.user_id = c.user_id
             AND c.event_type = 'click'
             AND p.event_type = 'purchase'
             AND p.ts >= c.ts
             AND p.ts <= c.ts + INTERVAL 30 MINUTE
        """,
        "streaming_dedup": """
            SELECT event_id, user_id, event_type, value FROM events
        """,
        # applyInPandasWithState lifetime fold ≡ batch GROUP BY; cents
        # quantization (DECIMAL(30,2)·100) keeps both sides in exact
        # integer domain so the compare is order-independent
        "streaming_running_totals": """
            SELECT user_id, COUNT(*) AS lifetime_events,
                   CAST(SUM(CAST(CAST(value AS DECIMAL(30,2)) * 100
                            AS BIGINT)) AS DOUBLE) / 100.0
                       AS lifetime_value
            FROM events GROUP BY user_id
        """,
        # the quadratic reference formulation of the as-of join the engine
        # computes with a union-merge + running-last window (one shuffle)
        # Integer-microsecond RANGE frame (exclusive of the current ts)
        # + deterministic LAG; count over an empty frame is 0 both sides.
        "event_rate_features": """
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   CAST(COUNT(*) OVER (
                     PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
                     AS BIGINT) AS n_prev,
                   CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                     AS BIGINT) AS gap_us
            FROM events
        """,
        # Forward mirror of asof_purchase_click: smallest purchase ts
        # at-or-after each view; purchases deduped per (user, ts) by max
        # event_id, same as the backward oracle.
        "asof_view_next_purchase": """
            WITH v AS (SELECT event_id, ts, user_id, value
                       FROM events WHERE event_type = 'view'),
            p0 AS (SELECT user_id, ts, event_id, value
                   FROM events WHERE event_type = 'purchase'),
            p AS (
              SELECT user_id, ts, event_id, value FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM p0) WHERE rn = 1
            )
            SELECT v.event_id, v.user_id, epoch_us(v.ts) AS ts_us, v.value,
                   epoch_us(p.ts) AS next_ts_us,
                   p.event_id AS next_event_id, p.value AS next_value
            FROM v LEFT JOIN p
              ON v.user_id = p.user_id AND p.ts >= v.ts
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY v.event_id
                ORDER BY p.ts ASC NULLS LAST) = 1
        """,
        "asof_purchase_click": """
            WITH p AS (SELECT event_id, ts, user_id, value
                       FROM events WHERE event_type = 'purchase'),
            c0 AS (SELECT user_id, ts, event_id, value
                   FROM events WHERE event_type = 'click'),
            c AS (
              SELECT user_id, ts, event_id, value FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM c0) WHERE rn = 1
            )
            SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
                   epoch_us(c.ts) AS click_ts_us,
                   c.event_id AS click_event_id, c.value AS click_value
            FROM p LEFT JOIN c
              ON p.user_id = c.user_id AND c.ts <= p.ts
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY p.event_id
                ORDER BY c.ts DESC NULLS LAST, c.event_id DESC) = 1
        """,
        # md5_63 (sign-masked md5_number_upper) % 100 < 90 — identical
        # membership in both engines
        "doc_split_hash": """
            SELECT doc_id,
                   CASE WHEN (md5_number_upper(CAST(doc_id AS VARCHAR))
                              & 9223372036854775807) % 100 < 90
                        THEN 'train' ELSE 'val' END AS split
            FROM documents
        """,
        "doc_chunks": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            s AS (SELECT doc_id, toks,
                         UNNEST(range(0, len(toks), 12)) AS start
                  FROM t WHERE len(toks) > 0)
            SELECT doc_id,
                   start // 12 AS chunk_idx,
                   CAST(len(list_slice(toks, start + 1, start + 16))
                        AS BIGINT) AS chunk_n_tokens,
                   array_to_string(
                     list_slice(toks, start + 1, start + 16), ' '
                   ) AS chunk_text
            FROM s
        """,
        "pack_chunks": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            s AS (SELECT doc_id, toks,
                         UNNEST(range(0, len(toks), 12)) AS start
                  FROM t WHERE len(toks) > 0),
            c AS (SELECT doc_id, start // 12 AS chunk_idx,
                         len(list_slice(toks, start + 1, start + 16)) AS n
                  FROM s),
            j AS (SELECT c.*, d.lang FROM c
                  JOIN documents d USING (doc_id)),
            w AS (SELECT *,
                         SUM(n) OVER (PARTITION BY lang
                                      ORDER BY doc_id, chunk_idx
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) - n AS bef
                  FROM j)
            SELECT doc_id, chunk_idx, lang,
                   CAST(bef // 64 AS BIGINT) AS pack_id,
                   CAST(bef - (bef // 64) * 64 AS BIGINT) AS pack_offset
            FROM w
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE (md5_number_upper(CAST(doc_id AS VARCHAR))
                   & 9223372036854775807) % 10000
                  < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 10000
                              WHEN 'fr' THEN 2500 END
        """,
        "text_repetition": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            bi AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 2
                          THEN list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1])
                          ELSE [array_to_string(toks, ' ')] END AS sh
              FROM t),
            cnt AS (SELECT doc_id, b, COUNT(*) AS c
                    FROM bi, UNNEST(sh) AS u(b) GROUP BY 1, 2),
            top AS (SELECT doc_id,
                           CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                             AS tb
                    FROM cnt GROUP BY doc_id)
            SELECT t.doc_id,
                   CASE WHEN len(t.toks) > 0
                        THEN CAST(len(list_distinct(t.toks)) AS DOUBLE)
                             / len(t.toks)
                        ELSE 0.0 END AS distinct_token_ratio,
                   top.tb AS top_bigram_ratio
            FROM t JOIN top ON t.doc_id = top.doc_id
        """,
        # mirrors quality_features' score formula term-for-term (left-assoc
        # float adds — IEEE ops are bit-reproducible across both engines)
        "quality_topk": f"""
            WITH t AS (
              SELECT doc_id, lang, source, text, {_TOK} AS toks,
                     len(text) AS nc FROM documents
            ),
            f AS (
              SELECT doc_id, lang, source,
                     len(toks) AS n_tokens,
                     CASE WHEN nc > 0
                          THEN len(regexp_replace(text, '[A-Za-z0-9\\s]',
                                                  '', 'g'))
                               / CAST(nc AS DOUBLE)
                          ELSE 0.0 END AS punct_ratio,
                     CASE WHEN len(toks) > 0
                          THEN len(list_filter(toks, x -> list_contains(
                                 ['the','a','of','and','to','in','is',
                                  'that','it','for'], x)))
                               / CAST(len(toks) AS DOUBLE)
                          ELSE 0.0 END AS stopword_ratio
              FROM t
            ),
            s AS (
              SELECT doc_id, lang, source,
                     LEAST(n_tokens / 50.0, 1.0) * 0.4
                     + (1.0 - LEAST(punct_ratio * 5.0, 1.0)) * 0.3
                     + LEAST(stopword_ratio * 5.0, 1.0) * 0.3
                       AS quality_score
              FROM f
            )
            SELECT doc_id, lang, source, quality_score FROM (
              SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY lang, source
                  ORDER BY quality_score DESC, doc_id) AS rn
              FROM s
            ) WHERE rn <= 3
        """,
        # 90/10 md5-hash split, distinct 3-grams, val⋈train membership —
        # the ratio is a bigint/bigint IEEE division in both engines.
        "contamination": f"""
            WITH de_d AS (
              SELECT doc_id,
                     CASE WHEN (md5_number_upper(CAST(doc_id AS VARCHAR))
                                & 9223372036854775807) % 100 < 90
                          THEN 'train' ELSE 'val' END AS split,
                     {_TOK} AS toks
              FROM documents
            ),
            de_g AS (
              SELECT doc_id, split,
                     CASE WHEN len(toks) >= 3 THEN
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> array_to_string(list_slice(toks, i, i + 2),
                                              ' ')))
                     ELSE [array_to_string(toks, ' ')] END AS grams
              FROM de_d
            ),
            de_tg AS (SELECT DISTINCT unnest(grams) AS gram FROM de_g
                      WHERE split = 'train'),
            de_vg AS (SELECT doc_id, unnest(grams) AS gram FROM de_g
                      WHERE split = 'val'),
            de_tot AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM de_vg
                       GROUP BY doc_id),
            de_hit AS (SELECT v.doc_id, COUNT(*) AS n_overlap
                       FROM de_vg v JOIN de_tg t ON v.gram = t.gram
                       GROUP BY v.doc_id)
            SELECT t.doc_id, t.n_ngrams,
                   COALESCE(h.n_overlap, 0) AS n_overlap,
                   COALESCE(h.n_overlap, 0) / t.n_ngrams AS contamination
            FROM de_tot t LEFT JOIN de_hit h ON t.doc_id = h.doc_id
        """,
        # Rational-idf BM25 (see functions/search.py): every float literal
        # is ::DOUBLE so DuckDB does the same IEEE double ops as Spark
        # (bare decimals would parse as DECIMAL and compute exactly);
        # per-term scores quantize to DECIMAL(38,12) before the
        # order-independent sum, ranking on the full-precision sum.
        "bm25_search": f"""
            WITH bm_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            bm_base AS (
              SELECT doc_id, len(toks) AS dl,
                     list_filter(toks, x -> list_contains(
                       ['spark', 'join', 'window'], x)) AS qtok
              FROM bm_t
            ),
            bm_corpus AS (
              SELECT COUNT(*) AS n_docs,
                     SUM(dl) / COUNT(*) AS avgdl
              FROM bm_base
            ),
            bm_tf AS (
              SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
                SELECT doc_id, dl, unnest(qtok) AS term FROM bm_base
              ) GROUP BY doc_id, dl, term
            ),
            bm_df AS (SELECT term, COUNT(*) AS df FROM bm_tf
                      GROUP BY term),
            bm_scored AS (
              SELECT f.doc_id,
                     CAST(
                       ((n_docs - df + CAST(0.5 AS DOUBLE))
                          / (df + CAST(0.5 AS DOUBLE)))
                       * (tf * CAST(2.2 AS DOUBLE))
                       / (tf + CAST(1.2 AS DOUBLE)
                            * (CAST(0.25 AS DOUBLE)
                               + (CAST(0.75 AS DOUBLE) * dl) / avgdl))
                       AS DECIMAL(38,12)) AS term_score
              FROM bm_tf f JOIN bm_df USING (term) CROSS JOIN bm_corpus
            )
            SELECT doc_id, ROUND(score, 6) AS score,
                   n_query_terms_matched
            FROM (
              SELECT doc_id, CAST(SUM(term_score) AS DOUBLE) AS score,
                     COUNT(*) AS n_query_terms_matched
              FROM bm_scored GROUP BY doc_id
              ORDER BY score DESC, doc_id LIMIT 10
            )
        """,
        # Hybrid RRF: the bm25_search CTE chain (top-20) fused with the
        # similarity_topk cosine idiom (top-20 for vec_id 0) — only
        # integer RANKS cross into the fusion, whose two-term double sum
        # is engine-identical; order on the unrounded score, then round.
        "hybrid_search": f"""
            WITH bm_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            bm_base AS (
              SELECT doc_id, len(toks) AS dl,
                     list_filter(toks, x -> list_contains(
                       ['spark', 'join', 'window'], x)) AS qtok
              FROM bm_t
            ),
            bm_corpus AS (
              SELECT COUNT(*) AS n_docs,
                     SUM(dl) / COUNT(*) AS avgdl
              FROM bm_base
            ),
            bm_tf AS (
              SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
                SELECT doc_id, dl, unnest(qtok) AS term FROM bm_base
              ) GROUP BY doc_id, dl, term
            ),
            bm_df AS (SELECT term, COUNT(*) AS df FROM bm_tf
                      GROUP BY term),
            bm_scored AS (
              SELECT f.doc_id,
                     CAST(
                       ((n_docs - df + CAST(0.5 AS DOUBLE))
                          / (df + CAST(0.5 AS DOUBLE)))
                       * (tf * CAST(2.2 AS DOUBLE))
                       / (tf + CAST(1.2 AS DOUBLE)
                            * (CAST(0.25 AS DOUBLE)
                               + (CAST(0.75 AS DOUBLE) * dl) / avgdl))
                       AS DECIMAL(38,12)) AS term_score
              FROM bm_tf f JOIN bm_df USING (term) CROSS JOIN bm_corpus
            ),
            bm_rank AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                       AS rank_a
              FROM (
                SELECT doc_id, CAST(SUM(term_score) AS DOUBLE) AS score
                FROM bm_scored GROUP BY doc_id
                ORDER BY score DESC, doc_id LIMIT 20
              )
            ),
            ann AS (
              SELECT neighbor_id AS doc_id, rank_b FROM (
                SELECT e.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                         ORDER BY list_cosine_similarity(
                           q.qv, e.embedding::DOUBLE[]) DESC,
                         e.vec_id) AS rank_b
                FROM embeddings e
                CROSS JOIN (SELECT embedding::DOUBLE[] AS qv
                            FROM embeddings WHERE vec_id = 0) q
                WHERE e.vec_id <> 0
              ) WHERE rank_b <= 20
            )
            SELECT doc_id, ROUND(rrf_score, 6) AS rrf_score,
                   CAST(rank_a AS INTEGER) AS rank_a,
                   CAST(rank_b AS INTEGER) AS rank_b
            FROM (
              SELECT doc_id,
                     COALESCE(1.0 / (60 + rank_a), CAST(0 AS DOUBLE))
                     + COALESCE(1.0 / (60 + rank_b), CAST(0 AS DOUBLE))
                       AS rrf_score,
                     rank_a, rank_b
              FROM bm_rank FULL JOIN ann USING (doc_id)
              ORDER BY rrf_score DESC, doc_id LIMIT 10
            )
        """,
        # Count-min sketch rebuilt in SQL with the same pinned md5-family
        # hash draw: identical counters, identical row-minima.
        "cms_heavy_hitters": f"""
            WITH cms_toks AS (
              SELECT unnest({_TOK}) AS term FROM documents
            ),
            cms_sk AS (
              SELECT row, bucket, COUNT(*) AS cnt FROM (
                SELECT d.d AS row,
                       CAST(md5_number_upper('cms:' || d.d || ':' || term)
                            & 9223372036854775807 AS BIGINT) % 1024
                         AS bucket
                FROM cms_toks
                CROSS JOIN (SELECT unnest(range(4)) AS d) d
              ) GROUP BY 1, 2
            ),
            cms_exact AS (
              SELECT term, COUNT(*) AS exact_count FROM cms_toks
              GROUP BY term
              ORDER BY exact_count DESC, term LIMIT 20
            ),
            cms_probes AS (
              SELECT e.term, e.exact_count, d.d AS row,
                     CAST(md5_number_upper('cms:' || d.d || ':' || e.term)
                          & 9223372036854775807 AS BIGINT) % 1024
                       AS bucket
              FROM cms_exact e
              CROSS JOIN (SELECT unnest(range(4)) AS d) d
            )
            SELECT p.term, p.exact_count, MIN(s.cnt) AS cms_estimate
            FROM cms_probes p JOIN cms_sk s USING (row, bucket)
            GROUP BY 1, 2
            ORDER BY exact_count DESC, term
        """,
        # Engine-side cms_estimate is a LEFT join (out-of-corpus terms
        # estimate 0, ADVICE r6); the inner join here is equivalent for
        # THIS query because every probe is an in-corpus top-20 term
        # whose own tokens occupy all four probed counters.
        "hll_distinct_events": _hll_oracle(),
        # StreamingHLL merges registers by MAX -> identical final
        # registers, so the streamed estimate shares the batch oracle.
        "streaming_hll": _hll_oracle(),
        # Grouped HLL: identical register construction per event_type,
        # per-group exact-BIGINT harmonic sums, one float div per group.
        "hll_grouped_events": """
            WITH gh AS (
              SELECT event_type,
                     CAST(md5_number_upper('hll:' || CAST(user_id AS VARCHAR))
                          & 9223372036854775807 AS BIGINT) AS h
              FROM events
            ),
            gb AS (SELECT event_type, h % 1024 AS bucket, h >> 10 AS w
                   FROM gh),
            gregs AS (
              SELECT event_type, bucket,
                     MAX(LEAST(bit_count((w & -w) - 1) + 1, 50))
                       AS register
              FROM gb GROUP BY 1, 2
            ),
            ggrid AS (
              SELECT g.event_type, t.range AS bucket
              FROM (SELECT DISTINCT event_type FROM events) g
              CROSS JOIN range(1024) t
            ),
            gsum AS (
              SELECT ggrid.event_type,
                     CAST(SUM(CAST(1 AS BIGINT)
                              << (50 - COALESCE(r.register, 0)))
                          AS BIGINT) AS s
              FROM ggrid LEFT JOIN gregs r
                ON ggrid.event_type = r.event_type
               AND ggrid.bucket = r.bucket
              GROUP BY 1
            ),
            gex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
                    FROM events GROUP BY 1)
            SELECT gex.event_type, gex.n_exact,
                   ROUND(8.506643816603716e+20 / CAST(s AS DOUBLE), 4) AS hll_estimate
            FROM gex JOIN gsum USING (event_type)
        """,
        "bpe_pair_counts": f"""
            WITH bp_w AS (
              SELECT unnest({_TOK}) AS w FROM documents
            ),
            bp_p AS (
              SELECT unnest(list_transform(range(1, len(w)),
                            i -> substring(w, i, 2))) AS pair
              FROM bp_w WHERE len(w) >= 2
            )
            SELECT pair, COUNT(*) AS pair_count FROM bp_p GROUP BY pair
            ORDER BY pair_count DESC, pair LIMIT 20
        """,
        # Winnowing (MOSS): same 4-shingle md5_63 hashes as the engine,
        # same w=5 sliding MIN window, same full-window rule with the
        # short-doc trailing-prefix exception (pos = m-1). The selected
        # fingerprint is the window MIN, so DISTINCT over (doc, value)
        # needs no tie-position bookkeeping.
        "winnow_fingerprints": f"""
            WITH wf_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            wf_sh AS (
              SELECT doc_id,
                CASE WHEN len(toks) >= 4 THEN
                  list_transform(range(1, len(toks) - 2),
                    i -> array_to_string(list_slice(toks, i, i + 3), ' '))
                ELSE [array_to_string(toks, ' ')] END AS shingles
              FROM wf_t
            ),
            wf_h AS (
              SELECT doc_id,
                list_transform(shingles,
                  s -> CAST(md5_number_upper(s) & 9223372036854775807
                            AS BIGINT)) AS hs
              FROM wf_sh
            ),
            wf_p AS (
              SELECT doc_id, CAST(i AS BIGINT) AS pos, hs[i + 1] AS h,
                     len(hs) AS m
              FROM wf_h, unnest(range(len(hs))) AS t(i)
            ),
            wf_m AS (
              SELECT doc_id, pos, m,
                MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                  AS fp_hash
              FROM wf_p
            )
            SELECT DISTINCT doc_id, fp_hash FROM wf_m
            WHERE pos >= 4 OR pos = m - 1
        """,
        "winnow_pairs": f"""
            WITH wf_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            wf_sh AS (
              SELECT doc_id,
                CASE WHEN len(toks) >= 4 THEN
                  list_transform(range(1, len(toks) - 2),
                    i -> array_to_string(list_slice(toks, i, i + 3), ' '))
                ELSE [array_to_string(toks, ' ')] END AS shingles
              FROM wf_t
            ),
            wf_h AS (
              SELECT doc_id,
                list_transform(shingles,
                  s -> CAST(md5_number_upper(s) & 9223372036854775807
                            AS BIGINT)) AS hs
              FROM wf_sh
            ),
            wf_p AS (
              SELECT doc_id, CAST(i AS BIGINT) AS pos, hs[i + 1] AS h,
                     len(hs) AS m
              FROM wf_h, unnest(range(len(hs))) AS t(i)
            ),
            wf_m AS (
              SELECT doc_id, pos, m,
                MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                  AS fp_hash
              FROM wf_p
            ),
            wf_fp AS (
              SELECT DISTINCT doc_id, fp_hash FROM wf_m
              WHERE pos >= 4 OR pos = m - 1
            ),
            wf_keep AS (
              SELECT fp_hash FROM wf_fp GROUP BY fp_hash
              HAVING COUNT(*) <= 100
            ),
            wf_c AS (SELECT doc_id, fp_hash FROM wf_fp
                     WHERE fp_hash IN (SELECT fp_hash FROM wf_keep))
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   COUNT(*) AS n_shared
            FROM wf_c a JOIN wf_c b
              ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
            HAVING COUNT(*) >= 2
        """,
        "ngram_diversity": f"""
            WITH nd_t AS (SELECT lang, {_TOK} AS toks FROM documents),
            nd_g AS (
              SELECT lang, 1 AS n, unnest(toks) AS g FROM nd_t
              UNION ALL
              SELECT lang, 2 AS n,
                unnest(CASE WHEN len(toks) >= 2 THEN
                  list_transform(range(1, len(toks)),
                    i -> array_to_string(list_slice(toks, i, i + 1), ' '))
                ELSE [] END) AS g
              FROM nd_t
              UNION ALL
              SELECT lang, 3 AS n,
                unnest(CASE WHEN len(toks) >= 3 THEN
                  list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [] END) AS g
              FROM nd_t
            )
            SELECT lang, CAST(n AS INTEGER) AS n,
                   COUNT(*) AS total_ngrams,
                   COUNT(DISTINCT g) AS distinct_ngrams,
                   ROUND(COUNT(DISTINCT g) / COUNT(*), 6) AS diversity
            FROM nd_g GROUP BY lang, n
            ORDER BY lang, n
        """,
        "blocklist_report": f"""
            WITH bl(term) AS (VALUES ('join'), ('quantum'), ('stream'),
                                     ('window'), ('zz_absent')),
            bl_tok AS (
              SELECT doc_id, unnest(list_distinct({_TOK})) AS term
              FROM documents
            ),
            bl_hits AS (
              SELECT t.term, COUNT(*) AS n_docs
              FROM bl_tok t JOIN bl USING (term) GROUP BY t.term
            ),
            bl_surv AS (
              SELECT '__survivors__' AS term,
                     COUNT(*) AS n_docs
              FROM documents
              WHERE NOT EXISTS (
                SELECT 1 FROM bl
                WHERE list_contains({_TOK}, bl.term)
              )
            )
            SELECT term, CAST(COALESCE(h.n_docs, 0) AS BIGINT) AS n_docs
            FROM bl LEFT JOIN bl_hits h USING (term)
            UNION ALL
            SELECT term, CAST(n_docs AS BIGINT) FROM bl_surv
            ORDER BY term
        """,
        "profile_orders": """
            SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
                   COUNT(*) - COUNT(o_orderkey) AS n_nulls,
                   COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
            UNION ALL
            SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
                   COUNT(DISTINCT o_custkey) FROM orders
            UNION ALL
            SELECT 'o_orderstatus', COUNT(*),
                   COUNT(*) - COUNT(o_orderstatus),
                   COUNT(DISTINCT o_orderstatus) FROM orders
            UNION ALL
            SELECT 'o_totalprice', COUNT(*),
                   COUNT(*) - COUNT(o_totalprice),
                   COUNT(DISTINCT o_totalprice) FROM orders
            UNION ALL
            SELECT 'o_orderdate', COUNT(*),
                   COUNT(*) - COUNT(o_orderdate),
                   COUNT(DISTINCT o_orderdate) FROM orders
            UNION ALL
            SELECT 'o_orderpriority', COUNT(*),
                   COUNT(*) - COUNT(o_orderpriority),
                   COUNT(DISTINCT o_orderpriority) FROM orders
            ORDER BY "column"
        """,
        "rich_club_parts": """
            WITH rc_pairs AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            rc_sym AS (
              SELECT a, b FROM rc_pairs
              UNION ALL SELECT b, a FROM rc_pairs
            ),
            rc_deg AS MATERIALIZED (
              SELECT a, COUNT(*) AS deg FROM rc_sym GROUP BY a
            ),
            rc_k AS (SELECT unnest([16, 32, 64, 96]) AS k)
            SELECT k,
                   (SELECT COUNT(*) FROM rc_deg WHERE deg > rc_k.k)
                     AS n_nodes,
                   (SELECT COUNT(*)
                    FROM rc_pairs p
                    JOIN rc_deg da ON p.a = da.a
                    JOIN rc_deg db ON p.b = db.a
                    WHERE LEAST(da.deg, db.deg) > rc_k.k) AS n_edges,
                   CASE WHEN (SELECT COUNT(*) FROM rc_deg
                              WHERE deg > rc_k.k) >= 2
                        THEN CAST(2 * (SELECT COUNT(*)
                                       FROM rc_pairs p
                                       JOIN rc_deg da ON p.a = da.a
                                       JOIN rc_deg db ON p.b = db.a
                                       WHERE LEAST(da.deg, db.deg) > rc_k.k)
                                  AS DOUBLE)
                             / ((SELECT COUNT(*) FROM rc_deg
                                 WHERE deg > rc_k.k)
                                * ((SELECT COUNT(*) FROM rc_deg
                                    WHERE deg > rc_k.k) - 1))
                        ELSE 0.0 END AS phi
            FROM rc_k ORDER BY k
        """,
        # Brute-force share-a-shingle join: the engine's prefix filter
        # is lossless, so its output must EQUAL this. Short docs (< 3
        # tokens) collapse to one whole-text shingle, mirroring
        # functions.text.shingles.
        "set_similarity_join": f"""
            WITH ssj_t AS (
              SELECT doc_id, {_TOK} AS toks FROM documents
            ),
            ssj_g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 3 THEN
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> array_to_string(list_slice(toks, i, i + 2),
                                              ' ')))
                     ELSE [array_to_string(toks, ' ')] END AS grams
              FROM ssj_t
            ),
            ssj_e AS (SELECT doc_id, unnest(grams) AS g FROM ssj_g),
            ssj_i AS (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     COUNT(*) AS inter
              FROM ssj_e a JOIN ssj_e b
                ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            ssj_n AS (SELECT doc_id, len(grams) AS n FROM ssj_g)
            SELECT a_id, b_id,
                   CAST(inter AS DOUBLE) / (na.n + nb.n - inter)
                     AS jaccard_sim
            FROM ssj_i
            JOIN ssj_n na ON a_id = na.doc_id
            JOIN ssj_n nb ON b_id = nb.doc_id
            WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.8
            ORDER BY a_id, b_id
        """,
        # Strict > on TRUNCATED epoch seconds mirrors ev.sessionize
        # (unix_timestamp truncates); LAG NULL on the first event falls
        # to ELSE 0 in both engines.
        "sessionize_events": """
            WITH sz AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN FLOOR(epoch(ts))
                               - FLOOR(epoch(LAG(ts) OVER w)) > 600
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sn AS (
              SELECT user_id, ts,
                     CAST(SUM(brk) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT)
                       AS session_seq
              FROM sz
            )
            SELECT user_id, session_seq, COUNT(*) AS n_events,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
                   strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
                   CAST(FLOOR(epoch(MAX(ts))) - FLOOR(epoch(MIN(ts)))
                        AS BIGINT) AS duration_sec
            FROM sn GROUP BY user_id, session_seq
        """,
        "vocabulary": f"""
            WITH vo_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            vo_tc AS (
              SELECT term, COUNT(*) AS term_count FROM (
                SELECT unnest(toks) AS term FROM vo_t
              ) GROUP BY term
            ),
            vo_dc AS (
              SELECT term, COUNT(*) AS doc_count FROM (
                SELECT doc_id, unnest(list_distinct(toks)) AS term
                FROM vo_t
              ) GROUP BY term
            )
            SELECT t.term, t.term_count, d.doc_count
            FROM vo_tc t JOIN vo_dc d USING (term)
            WHERE t.term_count >= 2
        """,
        # Same RE2-compatible patterns, same fixed pass order as
        # text.redact_pii; synthetic PII mirrors q_redact_pii's concat.
        "redact_pii": r"""
            WITH rp_dirty AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com or 10.0.'
                          || CAST(doc_id % 256 AS VARCHAR)
                          || '.7 tel +1 555-01'
                          || printf('%02d', CAST(doc_id % 100 AS INTEGER))
                       AS text
              FROM documents
            ),
            rp_e AS (
              SELECT doc_id,
                     len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS n_email,
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g') AS text
              FROM rp_dirty
            ),
            rp_i AS (
              SELECT doc_id, n_email,
                     len(regexp_extract_all(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                       AS n_ipv4,
                     regexp_replace(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '[IPV4]', 'g') AS text
              FROM rp_e
            ),
            rp_p AS (
              SELECT doc_id, n_email, n_ipv4,
                     len(regexp_extract_all(text, '\+?\d[\d\- ]{7,}\d'))
                       AS n_phone,
                     regexp_replace(text, '\+?\d[\d\- ]{7,}\d',
                       '[PHONE]', 'g') AS text
              FROM rp_i
            )
            SELECT doc_id, n_email, n_ipv4, n_phone,
                   right(text, 40) AS tail
            FROM rp_p
        """,
        "label_propagation_geo": _lpa_geo_oracle(4),
        "modularity_geo": _modularity_geo_oracle(4),
        "mis_geo": _mis_geo_oracle(rounds=3),
        "coloring_geo": _coloring_geo_oracle(rounds=4),
        "node2vec_parts": _node2vec_oracle(n_steps=4, n_seeds=64),
        "node2vec_skipgrams": f"""
            WITH n2vs AS MATERIALIZED (
              {_node2vec_oracle(n_steps=4, n_seeds=64)}
            ),
            n2vp AS (
              SELECT walk_id, 0 AS pos, step_0 AS node FROM n2vs
              UNION ALL SELECT walk_id, 1, step_1 FROM n2vs
              UNION ALL SELECT walk_id, 2, step_2 FROM n2vs
              UNION ALL SELECT walk_id, 3, step_3 FROM n2vs
              UNION ALL SELECT walk_id, 4, step_4 FROM n2vs
            )
            SELECT a.node AS center, b.node AS context,
                   COUNT(*) AS n_pairs
            FROM n2vp a JOIN n2vp b
              ON a.walk_id = b.walk_id AND a.pos <> b.pos
             AND ABS(a.pos - b.pos) <= 2
            GROUP BY 1, 2
        """,
        "ktruss_parts": _ktruss_oracle(k=3, rounds=6, min_orders=2),
        # stream==batch equivalence: same gaps-and-islands SQL as the
        # batch events_session query
        "streaming_session": f"""
            WITH o AS (
              SELECT user_id, ts, value,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts - LAG(ts) OVER w >= INTERVAL '10 minutes'
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM o
            )
            SELECT user_id,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f')
                     AS session_start,
                   COUNT(*) AS n_events,
                   {sums.format(col="value")} AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "hits_top20": _hits_oracle(8),
        "kcore_parts": _kcore_oracle(k=80, rounds=10),
        "link_prediction_parts": """
            WITH lp_pairs AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            lp_sym AS MATERIALIZED (
              SELECT a, b FROM lp_pairs
              UNION ALL
              SELECT b AS a, a AS b FROM lp_pairs
            ),
            lp_deg AS MATERIALIZED (
              SELECT a, COUNT(*) AS d FROM lp_sym GROUP BY a
            ),
            lp_cn AS MATERIALIZED (
              -- max_degree=100 cap mirrored from the Spark side: wedge
              -- CENTERS (the shared neighbor s1.a) above the cap emit
              -- no wedges; endpoint degrees below stay TRUE degrees.
              SELECT s1.b AS a, s2.b AS b, COUNT(*) AS common
              FROM lp_sym s1 JOIN lp_sym s2
                ON s1.a = s2.a AND s1.b < s2.b
              JOIN lp_deg dc ON s1.a = dc.a AND dc.d <= 100
              GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            lp_cand AS (
              SELECT c.* FROM lp_cn c
              WHERE NOT EXISTS (SELECT 1 FROM lp_pairs p
                                WHERE p.a = c.a AND p.b = c.b)
            ),
            lp_scored AS (
              SELECT c.a, c.b, c.common,
                     c.common / (da.d + db.d - c.common) AS jacc
              FROM lp_cand c
              JOIN lp_deg da ON c.a = da.a
              JOIN lp_deg db ON c.b = db.a
            )
            SELECT a, b, CAST(common AS BIGINT) AS common,
                   ROUND(jacc, 6) AS jaccard
            FROM (SELECT * FROM lp_scored
                  ORDER BY jacc DESC, common DESC, a, b LIMIT 50)
        """,
        # Same graph/scoring as link_prediction_parts, but the wedge cap
        # is DERIVED: histogram -> running count -> smallest degree
        # covering ceil(0.999*n) nodes, floored at 64 (mirrors
        # analytics._auto_max_degree exactly, all-integer).
        "link_prediction_auto": """
            WITH lp_pairs AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            lp_sym AS MATERIALIZED (
              SELECT a, b FROM lp_pairs
              UNION ALL
              SELECT b AS a, a AS b FROM lp_pairs
            ),
            lp_deg AS MATERIALIZED (
              SELECT a, COUNT(*) AS d FROM lp_sym GROUP BY a
            ),
            lp_cum AS (
              SELECT d, SUM(n) OVER (ORDER BY d) AS cum
              FROM (SELECT d, COUNT(*) AS n FROM lp_deg GROUP BY d)
            ),
            lp_cap AS (
              SELECT GREATEST(
                COALESCE(
                  (SELECT MIN(d) FROM lp_cum
                   WHERE cum >= (999 * (SELECT COUNT(*) FROM lp_deg)
                                 + 999) // 1000),
                  (SELECT MAX(d) FROM lp_deg)),
                64) AS cap
            ),
            lp_cn AS MATERIALIZED (
              SELECT s1.b AS a, s2.b AS b, COUNT(*) AS common
              FROM lp_sym s1 JOIN lp_sym s2
                ON s1.a = s2.a AND s1.b < s2.b
              JOIN lp_deg dc ON s1.a = dc.a
              JOIN lp_cap ON dc.d <= lp_cap.cap
              GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            lp_cand AS (
              SELECT c.* FROM lp_cn c
              WHERE NOT EXISTS (SELECT 1 FROM lp_pairs p
                                WHERE p.a = c.a AND p.b = c.b)
            ),
            lp_scored AS (
              SELECT c.a, c.b, c.common,
                     c.common / (da.d + db.d - c.common) AS jacc
              FROM lp_cand c
              JOIN lp_deg da ON c.a = da.a
              JOIN lp_deg db ON c.b = db.a
            )
            SELECT a, b, CAST(common AS BIGINT) AS common,
                   ROUND(jacc, 6) AS jaccard
            FROM (SELECT * FROM lp_scored
                  ORDER BY jacc DESC, common DESC, a, b LIMIT 50)
        """,
        # TPC-H Q2 adapted (no partsupp): unit cost = extendedprice /
        # quantity from lineitem; same correctly-rounded double division
        # and min/equality in both engines.
        "tpch_q2": """
            WITH eur_supp AS (
              SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier s
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              WHERE r.r_name = 'EUROPE'
            ),
            pf AS (SELECT p_partkey, p_size FROM part
                   WHERE p_type = 'STANDARD' AND p_size >= 20),
            costs AS (
              SELECT p.p_partkey, p.p_size, s.s_suppkey, s.s_name,
                     s.s_acctbal, s.n_name,
                     l.l_extendedprice / l.l_quantity AS uc
              FROM lineitem l
              JOIN pf p ON l.l_partkey = p.p_partkey
              JOIN eur_supp s ON l.l_suppkey = s.s_suppkey
              WHERE l.l_quantity > 0
            ),
            mc AS (SELECT p_partkey, MIN(uc) AS min_uc
                   FROM costs GROUP BY 1)
            SELECT DISTINCT s_acctbal, s_name, n_name,
                   c.p_partkey AS p_partkey, p_size,
                   ROUND(uc, 6) AS unit_cost
            FROM costs c JOIN mc ON c.p_partkey = mc.p_partkey
                               AND c.uc = mc.min_uc
            ORDER BY s_acctbal DESC, s_name, n_name, p_partkey
            LIMIT 20
        """,
        # TPC-H Q9 adapted: cost = p_retailprice * l_quantity (no
        # partsupp); same decimal idiom the certified q5 oracle uses.
        "tpch_q9": """
            SELECT n.n_name AS nation,
                   CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER)
                     AS o_year,
                   CAST(SUM(
                     CAST(CAST(l.l_extendedprice AS DECIMAL(30,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(30,2)))
                          AS DECIMAL(38,4))
                     - CAST(CAST(p.p_retailprice AS DECIMAL(30,2))
                            * CAST(l.l_quantity AS DECIMAL(30,2))
                            AS DECIMAL(38,4))
                   ) AS DOUBLE) AS sum_profit
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
                       AND p.p_type = 'PROMO'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
            ORDER BY nation, o_year DESC
        """,
        # TPC-H Q11 adapted: value = exact decimal shipment totals;
        # threshold = double(total) * 0.001 in both engines.
        "tpch_q11": """
            WITH vals AS (
              SELECT l.l_partkey AS partkey,
                     SUM(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS v
              FROM lineitem l
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              WHERE s.s_nationkey < 13
              GROUP BY 1
            ),
            tot AS (SELECT SUM(v) AS t, COUNT(*) AS np FROM vals)
            SELECT partkey, CAST(v AS DOUBLE) AS value
            FROM vals, tot
            WHERE CAST(v AS DOUBLE) > CAST(t AS DOUBLE) / np * 1.6
            ORDER BY value DESC, partkey
        """,
        # TPC-H Q20 adapted: dominant supplier = shipped > half a PROMO
        # part's 1996 volume; integer quantities, exact 0.5*total.
        "tpch_q20": """
            WITH pf AS (SELECT p_partkey FROM part
                        WHERE p_type = 'PROMO'),
            li AS (
              SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
              JOIN pf ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            ),
            ps AS (SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
                   FROM li GROUP BY 1, 2),
            pt AS (SELECT l_partkey, SUM(l_quantity) AS tq
                   FROM li GROUP BY 1),
            dom AS (SELECT DISTINCT ps.l_suppkey
                    FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
                    WHERE ps.sq > 0.5 * pt.tq)
            SELECT s.s_name, n.n_name AS nation
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE s.s_suppkey IN (SELECT l_suppkey FROM dom)
            ORDER BY s.s_name
        """,
        # TPC-H Q21 adapted: late = shipped > orderdate + 60 days; the
        # exists/not-exists pair folded into one per-order aggregation.
        "tpch_q21": """
            WITH li AS (
              SELECT l.l_orderkey, l.l_suppkey,
                     l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                       AS late
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderstatus = 'F'
            ),
            po AS (
              SELECT l_orderkey,
                     COUNT(DISTINCT l_suppkey) AS n_supp,
                     COUNT(DISTINCT CASE WHEN late THEN l_suppkey END)
                       AS n_late,
                     MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
              FROM li GROUP BY 1
            )
            SELECT s.s_name, COUNT(*) AS numwait
            FROM po JOIN supplier s ON po.late_supp = s.s_suppkey
            WHERE po.n_supp >= 2 AND po.n_late = 1
            GROUP BY 1
            ORDER BY numwait DESC, s_name
            LIMIT 20
        """,
        # floor(log2) via binary digit count (length(bin(x)) - 1) —
        # pure integer/string, no float log.
        "degree_histogram": f"""
            {_GRAPH_WITH},
            dh AS (
              SELECT id, COUNT(*) AS deg FROM (
                SELECT src AS id FROM edges_v
                UNION ALL SELECT dst FROM edges_v
              ) GROUP BY id
            )
            SELECT CAST(length(bin(deg)) - 1 AS INTEGER) AS log2_bucket,
                   COUNT(*) AS n_nodes
            FROM dh
            GROUP BY 1
            ORDER BY 1
        """,
        # ISO weekday (1=Monday) on both sides: Spark weekday()+1,
        # DuckDB isodow.
        "activity_heatmap": """
            SELECT CAST(isodow(ts) AS INTEGER) AS iso_dow,
                   CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS hour,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE)
                     AS sum_value
            FROM events
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "order_intervals": """
            WITH g AS (
              SELECT date_diff('day',
                       CAST(LAG(o_orderdate) OVER (
                              PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey)
                            AS DATE),
                       CAST(o_orderdate AS DATE)) AS gap
              FROM orders
            )
            SELECT COUNT(*) AS n_intervals,
                   MIN(gap) AS min_days, MAX(gap) AS max_days,
                   CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS avg_days
            FROM g WHERE gap IS NOT NULL
        """,
        "revenue_concentration": """
            WITH ps AS (
              SELECT l_suppkey,
                     SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2))
                              * (1 - CAST(l_discount AS DECIMAL(30,2)))
                              AS DECIMAL(38,4))) AS rev
              FROM lineitem GROUP BY l_suppkey
            ),
            tp AS (
              SELECT COUNT(*) AS n_top, SUM(rev) AS top_rev
              FROM (SELECT rev FROM ps
                    ORDER BY rev DESC, l_suppkey LIMIT 10)
            ),
            tt AS (SELECT SUM(rev) AS total,
                          COUNT(*) AS n_suppliers FROM ps)
            SELECT n_top, n_suppliers,
                   CAST(top_rev AS DOUBLE) AS top10_revenue,
                   CAST(top_rev AS DOUBLE) / CAST(total AS DOUBLE)
                     AS top10_share
            FROM tp, tt
        """,
        # Fixed thresholds on integer days / counts / exact decimal
        # spend — the 8-way split and per-segment decimal totals
        # reproduce exactly.
        "rfm_segments": """
            WITH pc AS (
              SELECT o_custkey, MAX(o_orderdate) AS last_d,
                     COUNT(*) AS n,
                     SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS spend
              FROM orders GROUP BY o_custkey
            ),
            r AS (SELECT MAX(o_orderdate) AS ref FROM orders)
            SELECT segment, COUNT(*) AS n_customers,
                   CAST(SUM(spend) AS DOUBLE) AS total_spend
            FROM (
              SELECT (CASE WHEN date_diff('day', CAST(last_d AS DATE),
                                          CAST(ref AS DATE)) <= 180
                           THEN 'R' ELSE 'r' END)
                     || (CASE WHEN n >= 20 THEN 'F' ELSE 'f' END)
                     || (CASE WHEN spend >= CAST(150000 AS DECIMAL(30,2))
                              THEN 'M' ELSE 'm' END) AS segment,
                     spend
              FROM pc, r
            )
            GROUP BY segment
            ORDER BY segment
        """,
        # Integer day diffs of DATE casts; the 30-day bin is integer
        # floor division in both engines.
        "recency_histogram": """
            WITH l AS (
              SELECT o_custkey, MAX(o_orderdate) AS last_d FROM orders
              GROUP BY o_custkey
            ),
            r AS (SELECT MAX(o_orderdate) AS ref FROM orders)
            SELECT CAST(FLOOR(date_diff('day', CAST(last_d AS DATE),
                                        CAST(ref AS DATE)) / 30.0)
                        AS INTEGER) AS bucket_30d,
                   COUNT(*) AS n_customers
            FROM l, r
            GROUP BY 1
            ORDER BY 1
        """,
        # Weekly sums stay DECIMAL through the LAG; only the growth
        # ratio is a double. weekofyear is ISO weeks in both engines.
        "weekly_revenue_growth": """
            WITH wk AS (
              SELECT CAST(isoyear(o_orderdate) AS INTEGER) AS iso_year,
                     weekofyear(o_orderdate) AS week,
                     SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS rev,
                     COUNT(*) AS n_orders
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY 1, 2
            )
            SELECT iso_year, week, CAST(rev AS DOUBLE) AS revenue,
                   n_orders,
                   CASE WHEN LAG(rev) OVER (ORDER BY iso_year, week)
                             IS NOT NULL
                        THEN CAST(rev - LAG(rev)
                                  OVER (ORDER BY iso_year, week)
                                  AS DOUBLE)
                             / CAST(LAG(rev)
                                    OVER (ORDER BY iso_year, week)
                                    AS DOUBLE)
                   END AS wow_growth
            FROM wk
            ORDER BY iso_year, week
        """,
        # Latencies are integer epoch-second differences (both engines
        # truncate to whole seconds BEFORE comparing/subtracting); the
        # average is one double division off an exact BIGINT sum.
        "conversion_latency": """
            WITH es AS (
              SELECT user_id, event_type,
                     date_diff('second', TIMESTAMP '1970-01-01', ts)
                       AS sec
              FROM events
            ),
            fc AS (
              SELECT user_id, MIN(sec) AS c FROM es
              WHERE event_type = 'click' GROUP BY user_id
            ),
            l AS (
              SELECT e.user_id, MIN(e.sec) - MIN(fc.c) AS lat
              FROM es e JOIN fc ON e.user_id = fc.user_id
              WHERE e.event_type = 'purchase' AND e.sec >= fc.c
              GROUP BY e.user_id
            )
            SELECT COUNT(*) AS n_converted,
                   MIN(lat) AS min_latency_s,
                   MAX(lat) AS max_latency_s,
                   CAST(SUM(lat) AS DOUBLE) / COUNT(*) AS avg_latency_s
            FROM l
        """,
        "butterfly_count": """
            WITH cp AS MATERIALIZED (
              SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
              FROM orders o
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            ),
            kept AS MATERIALIZED (
              SELECT c, p FROM cp
              WHERE p IN (SELECT p FROM cp GROUP BY p
                          HAVING COUNT(*) <= 100)
            ),
            prs AS (
              SELECT w1.c AS c1, w2.c AS c2,
                     CAST(COUNT(*) AS HUGEINT) AS m
              FROM kept w1 JOIN kept w2
                ON w1.p = w2.p AND w1.c < w2.c
              GROUP BY 1, 2
            )
            SELECT COUNT(*) AS n_wedge_pairs,
                   CAST(SUM(m * (m - 1)) // 2 AS BIGINT)
                     AS n_butterflies
            FROM prs
        """,
        # The link_prediction oracle on the customer⊲part bipartite
        # graph: parts offset by 1e9, centers = parts only (high band,
        # buyer count <= 100), candidates = customer pairs. Customer
        # pairs are never bipartite-adjacent, so the engine's anti-join
        # is a no-op and the oracle omits it.
        "customer_similarity": """
            WITH cs_e AS MATERIALIZED (
              SELECT DISTINCT o.o_custkey AS c,
                              l.l_partkey + 1000000000 AS p
              FROM orders o
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            ),
            cs_sym AS MATERIALIZED (
              SELECT c AS a, p AS b FROM cs_e
              UNION ALL
              SELECT p AS a, c AS b FROM cs_e
            ),
            cs_deg AS MATERIALIZED (
              SELECT a, COUNT(*) AS d FROM cs_sym GROUP BY a
            ),
            cs_cn AS MATERIALIZED (
              SELECT s1.b AS a, s2.b AS b, COUNT(*) AS common
              FROM cs_sym s1 JOIN cs_sym s2
                ON s1.a = s2.a AND s1.b < s2.b
              JOIN cs_deg dc ON s1.a = dc.a AND dc.d <= 100
              WHERE s1.a >= 1000000000
              GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            cs_scored AS (
              SELECT c.a, c.b, c.common,
                     c.common / (da.d + db.d - c.common) AS jacc
              FROM cs_cn c
              JOIN cs_deg da ON c.a = da.a
              JOIN cs_deg db ON c.b = db.a
              WHERE c.a < 1000000000 AND c.b < 1000000000
            )
            SELECT a, b, CAST(common AS BIGINT) AS common,
                   ROUND(jacc, 6) AS jaccard
            FROM (SELECT * FROM cs_scored
                  ORDER BY jacc DESC, common DESC, a, b LIMIT 20)
        """,
        "range_join_clicks": f"""
            SELECT p.event_id AS purchase_id,
                   COUNT(*) AS n_clicks,
                   {sums.format(col="c.value")} AS sum_click_value
            FROM events p JOIN events c
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase' AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts < p.ts
            GROUP BY 1
        """,
        "quantized_topk": """
            WITH qz AS MATERIALIZED (
              SELECT vec_id,
                CASE WHEN list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) > 0
                     THEN list_transform(embedding, x ->
                            CAST(round(CAST(x AS DOUBLE) * (127.0 /
                              list_max(list_transform(embedding,
                                y -> abs(CAST(y AS DOUBLE)))))) AS BIGINT))
                     ELSE list_transform(embedding,
                            x -> CAST(0 AS BIGINT)) END AS q
              FROM embeddings
            ),
            nq AS MATERIALIZED (
              SELECT vec_id, q,
                     list_sum(list_transform(q, x -> x * x)) AS n2
              FROM qz
            ),
            scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     CASE WHEN a.n2 > 0 AND b.n2 > 0
                          THEN list_sum(list_transform(list_zip(a.q, b.q),
                                 p -> p[1] * p[2]))
                               / sqrt(CAST(a.n2 * b.n2 AS DOUBLE))
                          ELSE 0.0 END AS qcos
              FROM nq a JOIN nq b ON b.vec_id <> a.vec_id
              WHERE a.vec_id < 5
            )
            SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
                   ROUND(qcos, 6) AS qcos
            FROM (SELECT query_id, neighbor_id, qcos,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY qcos DESC, neighbor_id)
                           AS rank
                  FROM scored)
            WHERE rank <= 10
        """,
        "salted_join_orders": f"""
            SELECT c.c_mktsegment AS mktsegment,
                   COUNT(*) AS n_orders,
                   {sums.format(col="o.o_totalprice")} AS total
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "events_rollup_multi": f"""
            SELECT 'minute' AS grain,
                   strftime(date_trunc('minute', ts),
                            '%Y-%m-%d %H:%M:%S') AS bucket_start,
                   COUNT(*) AS n_events,
                   {sums.format(col="value")} AS sum_value
            FROM events GROUP BY 2
            UNION ALL
            SELECT 'hour',
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),
                   COUNT(*), {sums.format(col="value")}
            FROM events GROUP BY 2
            UNION ALL
            SELECT 'day',
                   strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
                   COUNT(*), {sums.format(col="value")}
            FROM events GROUP BY 2
        """,
        "length_quantiles": """
            SELECT lang, COUNT(*) AS n_docs,
                   ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
                   ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
                   ROUND(quantile_cont(n_chars, 0.75), 6) AS p75,
                   ROUND(quantile_cont(n_chars, 0.9), 6) AS p90
            FROM documents GROUP BY lang
        """,
        "ppr_customer": _ppr_oracle(f"{CUSTOMER_BASE + 1}"),
        # md5_63 = md5_number_upper & (2^63-1), exactly hashing.md5_63;
        # priority = u/w is one IEEE double division — engine-exact
        "weighted_sample_docs": """
            WITH ws AS (
              SELECT doc_id, lang,
                     CAST(md5_number_upper(CAST(doc_id AS VARCHAR))
                          & 9223372036854775807 AS DOUBLE)
                       / 9223372036854775808.0
                       / CAST(n_chars AS DOUBLE) AS pri
              FROM documents WHERE n_chars > 0
            )
            SELECT doc_id, lang, ROUND(pri, 6) AS priority
            FROM (SELECT doc_id, lang, pri,
                         ROW_NUMBER() OVER (PARTITION BY lang
                                            ORDER BY pri, doc_id) AS rn
                  FROM ws)
            WHERE rn <= 20
        """,
        "sql_interface": f"""
            {_GRAPH_WITH},
            hist AS (
              SELECT label, COUNT(*) AS n_edges
              FROM edges_v GROUP BY label
            )
            SELECT label, n_edges,
                   CAST(RANK() OVER (ORDER BY n_edges DESC, label)
                        AS INTEGER) AS rnk
            FROM hist
        """,
        "cube_order_stats": f"""
            SELECT o_orderstatus AS status, o_orderpriority AS priority,
                   COUNT(*) AS n_orders,
                   {sums.format(col="o_totalprice")} AS total
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "jsonl_roundtrip": """
            SELECT lang, source, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(len(text)) AS BIGINT) AS sum_text_len,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM documents GROUP BY lang, source
        """,
        # Literal-adjusted base counts: the delta's three mutations are
        # fixed, so the expected counts are base ± the adjustments.
        "store_incremental_counts": _GRAPH_WITH + """
            , inc_base AS (
              SELECT label, COUNT(*) AS n FROM nodes_v GROUP BY label
            ),
            inc_adj(label, d) AS (
              VALUES ('customer', -1), ('supplier', -1), ('inc_probe', 2)
            )
            SELECT COALESCE(b.label, a.label) AS label,
                   CAST(COALESCE(b.n, 0) + COALESCE(a.d, 0) AS BIGINT)
                     AS n_nodes
            FROM inc_base b FULL JOIN inc_adj a ON b.label = a.label
            WHERE COALESCE(b.n, 0) + COALESCE(a.d, 0) > 0
            ORDER BY label
        """,
        # Full recount over the derived edges plus the three literal
        # adjustments the delta makes (new edge, retarget, delete); the
        # engine derives the same table from delta files + an id probe.
        "store_incremental_degrees": _GRAPH_WITH + f"""
            , deg_base AS (
              SELECT id, SUM(o) AS o, SUM(i) AS i FROM (
                SELECT src AS id, 1 AS o, 0 AS i FROM edges_v
                UNION ALL
                SELECT dst AS id, 0 AS o, 1 AS i FROM edges_v
              ) GROUP BY id
            ),
            deg_adj AS (
              SELECT {CUSTOMER_BASE} + 1 AS id, 1 AS o, 0 AS i
              UNION ALL SELECT {ORDER_BASE} + 1, 0, 1
              UNION ALL SELECT (SELECT o_custkey + {CUSTOMER_BASE}
                                FROM orders WHERE o_orderkey = 1), -1, 0
              UNION ALL SELECT {ORDER_BASE} + 1, 0, -1
              UNION ALL SELECT {NATION_BASE} + 0, 0, 1
              UNION ALL SELECT (SELECT c_nationkey + {NATION_BASE}
                                FROM customer WHERE c_custkey = 2), 0, -1
            ),
            deg_adj_g AS (
              SELECT id, SUM(o) AS o, SUM(i) AS i FROM deg_adj GROUP BY id
            )
            SELECT id,
                   CAST(COALESCE(b_o, 0) + COALESCE(a_o, 0) AS BIGINT)
                     AS out_degree,
                   CAST(COALESCE(b_i, 0) + COALESCE(a_i, 0) AS BIGINT)
                     AS in_degree
            FROM (
              SELECT COALESCE(b.id, a.id) AS id, b.o AS b_o, b.i AS b_i,
                     a.o AS a_o, a.i AS a_i
              FROM deg_base b FULL JOIN deg_adj_g a ON b.id = a.id
            )
            WHERE COALESCE(b_o, 0) + COALESCE(a_o, 0) > 0
               OR COALESCE(b_i, 0) + COALESCE(a_i, 0) > 0
            ORDER BY id
        """,
        "zorder_customers": f"""
            SELECT c_custkey, c_nationkey,
                   ({_zorder_sql("c_nationkey")}
                    | ({_zorder_sql("c_custkey")} << 1)) AS zkey
            FROM customer
            ORDER BY zkey, c_custkey
            LIMIT 50
        """,
        "skew_report_parts": """
            WITH c AS (
              SELECT l_partkey, COUNT(*) AS n_rows
              FROM lineitem GROUP BY l_partkey
            ),
            t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c)
            SELECT l_partkey, n_rows,
                   CAST(n_rows AS DOUBLE) / total AS share,
                   CAST(n_rows AS DOUBLE) * n_keys / total AS x_uniform
            FROM (SELECT * FROM c ORDER BY n_rows DESC, l_partkey
                  LIMIT 10), t
        """,
        "orc_roundtrip": """
            SELECT lang, source, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(len(text)) AS BIGINT) AS sum_text_len,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM documents GROUP BY lang, source
        """,
        "aggmsg_max_acctbal": f"""
            SELECT c_nationkey + {NATION_BASE} AS id,
                   MAX(c_acctbal) AS max_acctbal
            FROM customer GROUP BY 1
        """,
        "event_transitions": """
            SELECT from_type, to_type, COUNT(*) AS n_transitions
            FROM (
              SELECT event_type AS from_type,
                     LEAD(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                       AS to_type
              FROM events
            ) WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "basket_lift": """
            WITH baskets AS MATERIALIZED (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ),
            n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders
                  FROM baskets),
            ic AS MATERIALIZED (
              SELECT l_partkey AS k, COUNT(*) AS c FROM baskets GROUP BY 1
            ),
            pc AS (
              SELECT a.l_partkey AS a, b.l_partkey AS b,
                     COUNT(*) AS n_ab
              FROM baskets a JOIN baskets b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 3
            ),
            s AS (
              SELECT pc.a, pc.b, pc.n_ab,
                     pc.n_ab * CAST(n.n_orders AS DOUBLE)
                       / (ia.c * ib.c) AS lift
              FROM pc CROSS JOIN n
              JOIN ic ia ON pc.a = ia.k
              JOIN ic ib ON pc.b = ib.k
            )
            SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
                   ROUND(lift, 6) AS lift
            FROM (SELECT * FROM s ORDER BY lift DESC, a, b LIMIT 20)
        """,
        # stream==batch equivalence: the drained enrichment equals the
        # plain batch left join
        "streaming_static_join": """
            WITH uc AS (
              SELECT user_id, COUNT(*) AS c FROM events
              WHERE event_type = 'click' GROUP BY 1
            )
            SELECT p.event_id, p.user_id, p.value,
                   CAST(COALESCE(uc.c, 0) AS BIGINT) AS user_clicks
            FROM events p LEFT JOIN uc ON p.user_id = uc.user_id
            WHERE p.event_type = 'purchase'
        """,
        "cohort_retention": """
            WITH cohort AS (
              SELECT user_id, date_trunc('week', MIN(ts)) AS c
              FROM events GROUP BY 1
            ),
            active AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS w
              FROM events
            )
            SELECT strftime(c, '%Y-%m-%d') AS cohort_week,
                   CAST(date_diff('day', c, w) // 7 AS INTEGER)
                     AS week_offset,
                   COUNT(*) AS n_users
            FROM active JOIN cohort USING (user_id)
            GROUP BY 1, 2
        """,
        "clustering_coefficient": """
            WITH cc_pairs AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            tri AS (
              SELECT COUNT(*) AS n_triangles
              FROM cc_pairs e1
              JOIN cc_pairs e2 ON e1.b = e2.a
              JOIN cc_pairs e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            wed AS (
              SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
              FROM (
                SELECT a AS id, COUNT(*) AS d FROM (
                  SELECT a, b FROM cc_pairs
                  UNION ALL SELECT b, a FROM cc_pairs
                ) GROUP BY a
              )
            )
            SELECT n_triangles, n_wedges,
                   ROUND(3.0 * n_triangles / n_wedges, 6)
                     AS global_clustering
            FROM tri CROSS JOIN wed
        """,
        # the five already-oracled stages rebuilt as one SQL chain
        "pipeline_e2e": f"""
            WITH surv AS (
              SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
            ),
            kept AS (
              SELECT d.* FROM documents d JOIN surv USING (doc_id)
            ),
            sp AS (
              SELECT *,
                     CASE WHEN (md5_number_upper(CAST(doc_id AS VARCHAR))
                                & 9223372036854775807) % 100 < 90
                          THEN 'train' ELSE 'val' END AS split
              FROM kept
            ),
            t AS (SELECT doc_id, lang, split, {_TOK} AS toks FROM sp),
            s AS (SELECT doc_id, lang, split, toks,
                         UNNEST(range(0, len(toks), 12)) AS start
                  FROM t WHERE len(toks) > 0),
            c AS (SELECT doc_id, lang, split, start // 12 AS chunk_idx,
                         len(list_slice(toks, start + 1, start + 16)) AS n
                  FROM s),
            w AS (SELECT *,
                         SUM(n) OVER (PARTITION BY split, lang
                                      ORDER BY doc_id, chunk_idx
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) - n AS bef
                  FROM c)
            SELECT split, lang,
                   COUNT(*) AS n_chunks,
                   COUNT(DISTINCT bef // 64) AS n_packs,
                   CAST(SUM(n) AS BIGINT) AS sum_tokens
            FROM w GROUP BY 1, 2
        """,
        # v0 = raw state; v1 = one mktsegment update + one cascading
        # supplier removal — recomputed relationally
        "store_time_travel": """
            SELECT (SELECT COUNT(*) FROM supplier) AS v0_suppliers,
                   (SELECT c_mktsegment FROM customer WHERE c_custkey = 1)
                     AS v0_mktsegment,
                   (SELECT COUNT(*) - 1 FROM supplier) AS v1_suppliers,
                   'TRAVELED' AS v1_mktsegment
        """,
        "tpch_q1": """
            WITH a AS (
              SELECT l_returnflag, l_linestatus,
                     SUM(CAST(l_quantity AS DECIMAL(30,2))) AS sq,
                     SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS sbp,
                     SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2))
                              * (1 - CAST(l_discount AS DECIMAL(30,2)))
                              AS DECIMAL(38,4))) AS sdp,
                     SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2))
                              * (1 - CAST(l_discount AS DECIMAL(30,2)))
                              * (1 + CAST(l_tax AS DECIMAL(30,2)))
                              AS DECIMAL(38,6))) AS scp,
                     SUM(CAST(l_discount AS DECIMAL(30,2))) AS sd,
                     COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus
            )
            SELECT l_returnflag, l_linestatus,
                   CAST(sq AS DOUBLE) AS sum_qty,
                   CAST(sbp AS DOUBLE) AS sum_base_price,
                   CAST(sdp AS DOUBLE) AS sum_disc_price,
                   CAST(scp AS DOUBLE) AS sum_charge,
                   CAST(sq AS DOUBLE) / count_order AS avg_qty,
                   CAST(sbp AS DOUBLE) / count_order AS avg_price,
                   CAST(sd AS DOUBLE) / count_order AS avg_disc,
                   count_order
            FROM a
        """,
        "tpch_q3": """
            SELECT l_orderkey,
                   CAST(rev AS DOUBLE) AS revenue,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_orderpriority
            FROM (
              SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                     SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(30,2)))
                              AS DECIMAL(38,4))) AS rev
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
                AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
              GROUP BY 1, 2, 3
              ORDER BY rev DESC, l.l_orderkey LIMIT 10
            )
        """,
        "tpch_q6": """
            SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2))
                                 * CAST(l_discount AS DECIMAL(30,2))
                                 AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "tpch_q5": """
            SELECT n.n_name,
                   CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2))
                                 * (1 - CAST(l.l_discount AS DECIMAL(30,2)))
                                 AS DECIMAL(38,4))) AS DOUBLE) AS revenue
            FROM customer c
            JOIN orders o   ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            WHERE c.c_nationkey = s.s_nationkey
              AND r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n.n_name
            ORDER BY revenue DESC, n.n_name
        """,
        "tpch_q4": """
            SELECT o.o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
              AND EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              )
            GROUP BY o.o_orderpriority
            ORDER BY o.o_orderpriority
        """,
        "tpch_q10": """
            SELECT c.c_custkey, c.c_name,
                   CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2))
                                 * (1 - CAST(l.l_discount AS DECIMAL(30,2)))
                                 AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
                   c.c_acctbal, n.n_name
            FROM customer c
            JOIN orders o   ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
              AND l.l_returnflag = 'R'
            GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
            ORDER BY revenue DESC, c.c_custkey
            LIMIT 20
        """,
        "tpch_q12": """
            SELECT CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER)
                     AS ship_year,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY ship_year
            ORDER BY ship_year
        """,
        # Both sums accumulate exactly in DECIMAL; only the final
        # percentage is a double expression, evaluated in the same
        # association order ((100.0 * promo) / total) as the engine.
        "tpch_q14": """
            WITH j AS (
              SELECT CAST(CAST(l.l_extendedprice AS DECIMAL(30,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(30,2)))
                          AS DECIMAL(38,4)) AS rev,
                     p.p_type
              FROM lineitem l
              JOIN part p ON l.l_partkey = p.p_partkey
              WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
                AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
            )
            SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                                          ELSE CAST(0 AS DECIMAL(38,4))
                                     END) AS DOUBLE))
                   / CAST(SUM(rev) AS DOUBLE) AS promo_revenue
            FROM j
        """,
        "tpch_q16": """
            SELECT p.p_brand, p.p_type, p.p_size,
                   COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand <> 'Brand#15'
              AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
              AND l.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY p.p_brand, p.p_type, p.p_size
            ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        """,
        "tpch_q18": """
            WITH big AS (
              SELECT l_orderkey,
                     SUM(CAST(l_quantity AS DECIMAL(30,2))) AS sumq
              FROM lineitem
              GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(30,2))) > 300
            )
            SELECT c.c_name, c.c_custkey, o.o_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o.o_totalprice,
                   CAST(b.sumq AS DOUBLE) AS sum_qty
            FROM orders o
            JOIN big b     ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
            LIMIT 100
        """,
        "tpch_q19": """
            SELECT CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2))
                                 * (1 - CAST(l.l_discount AS DECIMAL(30,2)))
                                 AS DECIMAL(38,4))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        # Mirrors q_streaming_store_sink's two-batch log; the final
        # state is the same relational fold as streaming_fold (adds ⟕
        # last-update ▷ removes, cascade via src/dst membership), and
        # n_versions = 2 pins base + one delta on disk.
        "streaming_store_sink": """
            WITH log(seq, op, kind, id, label, src, dst, v) AS (VALUES
              (1, 'add', 'node', 97000001, 'sink_probe', NULL, NULL, '1'),
              (2, 'add', 'node', 97000002, 'sink_probe', NULL, NULL, '2'),
              (3, 'add', 'node', 97000003, 'sink_probe', NULL, NULL, '3'),
              (4, 'add', 'edge', 98000001, 'sink_edge',
                 97000001, 97000002, NULL),
              (5, 'update', 'node', 97000001, NULL, NULL, NULL, '10'),
              (6, 'remove', 'node', 97000002, NULL, NULL, NULL, NULL),
              (7, 'remove', 'node', 97000003, NULL, NULL, NULL, NULL),
              (8, 'add', 'node', 97000004, 'sink_probe', NULL, NULL, '4')
            ),
            removed AS (SELECT id FROM log
                        WHERE op = 'remove' AND kind = 'node'),
            upd AS (
              SELECT id, v FROM (
                SELECT id, v, ROW_NUMBER() OVER (PARTITION BY id
                                                 ORDER BY seq DESC) AS rn
                FROM log WHERE op = 'update' AND kind = 'node'
              ) WHERE rn = 1
            )
            SELECT id, v, n_versions FROM (
              SELECT CAST(a.id AS BIGINT) AS id, COALESCE(u.v, a.v) AS v,
                     2 AS n_versions
              FROM log a LEFT JOIN upd u ON a.id = u.id
              WHERE a.op = 'add' AND a.kind = 'node'
                AND a.id NOT IN (SELECT id FROM removed)
              UNION ALL
              SELECT CAST(e.id AS BIGINT) AS id, 'edge' AS v,
                     2 AS n_versions
              FROM log e
              WHERE e.op = 'add' AND e.kind = 'edge'
                AND e.src NOT IN (SELECT id FROM removed)
                AND e.dst NOT IN (SELECT id FROM removed)
            )
        """,
        # Same integer-grid exactness as the kmeans oracle: quantized
        # coords, floor(s/n+0.5) centroids, int64 squared distances.
        "embedding_outliers": """
            WITH lq AS MATERIALIZED (
              SELECT vec_id, label,
                     list_transform(embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS v
              FROM embeddings
            ),
            ex AS MATERIALIZED (
              SELECT vec_id, label, pos, v[pos] AS x
              FROM lq, unnest(range(1, len(v) + 1)) AS t(pos)
            ),
            cen AS (
              SELECT label, pos,
                     CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*) + 0.5)
                          AS BIGINT) AS c
              FROM ex GROUP BY label, pos
            )
            SELECT e.vec_id, e.label,
                   CAST(SUM((e.x - c.c) * (e.x - c.c)) AS BIGINT) AS d2
            FROM ex e JOIN cen c ON e.label = c.label AND e.pos = c.pos
            GROUP BY e.vec_id, e.label
            ORDER BY d2 DESC, e.vec_id
            LIMIT 20
        """,
        # Integer decay weight × DECIMAL value sums — exact; the top-20
        # ordering compares identical decimals before the double cast.
        "engagement_decay": """
            WITH r AS (SELECT MAX(ts) AS ref FROM events)
            SELECT user_id,
                   CAST(SUM(CAST(value AS DECIMAL(30,2))
                            * GREATEST(0, 30 - date_diff('day',
                                CAST(ts AS DATE), CAST(ref AS DATE))))
                        AS DOUBLE) AS engagement,
                   COUNT(*) AS n_events
            FROM events, r
            GROUP BY user_id
            ORDER BY SUM(CAST(value AS DECIMAL(30,2))
                         * GREATEST(0, 30 - date_diff('day',
                             CAST(ts AS DATE), CAST(ref AS DATE)))) DESC,
                     user_id
            LIMIT 20
        """,
        # Same recursive closure as the keep oracles, rolled up to a
        # per-component size histogram (every doc gets a component;
        # isolated docs are their own).
        "dup_cluster_histogram": f"""
            WITH RECURSIVE
            t AS MATERIALIZED (SELECT doc_id,
                               list_distinct({_TOK}) AS toks FROM documents),
            pairs AS MATERIALIZED (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM t a JOIN t b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) >= 0.9
            ),
            sym AS MATERIALIZED (
              SELECT a, b FROM pairs
              UNION ALL SELECT b AS a, a AS b FROM pairs
            ),
            reach AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
              WHERE s.b <> r.a
            ),
            comp AS (
              SELECT d.doc_id,
                     LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id))
                       AS component
              FROM t d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id
            ),
            sizes AS (
              SELECT component, COUNT(*) AS cluster_size
              FROM comp GROUP BY component
            )
            SELECT cluster_size, COUNT(*) AS n_clusters
            FROM sizes GROUP BY cluster_size
            ORDER BY cluster_size
        """,
        # Exact cross all-pairs ground truth (valid because LSH recall
        # is ~100% at 64 perms / 16 bands / t=0.9, as for dedup_minhash);
        # jaccard_sim is the same correctly-rounded int/int division in
        # both engines.
        "dedup_incremental": f"""
            WITH t AS MATERIALIZED (
              SELECT doc_id, list_distinct({_TOK}) AS toks FROM documents
            ),
            nw AS (SELECT * FROM t WHERE doc_id % 10 >= 8),
            bs AS (SELECT * FROM t WHERE doc_id % 10 < 8)
            SELECT n.doc_id AS new_id, b.doc_id AS base_id,
                   len(list_intersect(n.toks, b.toks))::DOUBLE
                   / (len(n.toks) + len(b.toks)
                      - len(list_intersect(n.toks, b.toks)))
                     AS jaccard_sim
            FROM nw n JOIN bs b
              ON len(list_intersect(n.toks, b.toks))::DOUBLE
                 / (len(n.toks) + len(b.toks)
                    - len(list_intersect(n.toks, b.toks))) >= 0.9
        """,
        # Path-doubling closure unrolled 5 rounds (2^5 = 32 hops >> the
        # transition graph's diameter; doubling past the fixpoint is a
        # no-op). SCC id = least(v, min mutual peer) — reflexive, so
        # sources/sinks are singletons.
        "scc_event_types": """
            WITH te AS MATERIALIZED (
              SELECT DISTINCT from_type AS a, to_type AS b FROM (
                SELECT event_type AS from_type,
                       LEAD(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                         AS to_type
                FROM events
              ) WHERE to_type IS NOT NULL AND from_type <> to_type
            ),
            tc0 AS MATERIALIZED (SELECT a, b FROM te),
            tc1 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc0
                UNION ALL
                SELECT x.a, y.b FROM tc0 x JOIN tc0 y ON x.b = y.a)
            ),
            tc2 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc1
                UNION ALL
                SELECT x.a, y.b FROM tc1 x JOIN tc1 y ON x.b = y.a)
            ),
            tc3 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc2
                UNION ALL
                SELECT x.a, y.b FROM tc2 x JOIN tc2 y ON x.b = y.a)
            ),
            tc4 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc3
                UNION ALL
                SELECT x.a, y.b FROM tc3 x JOIN tc3 y ON x.b = y.a)
            ),
            tc5 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc4
                UNION ALL
                SELECT x.a, y.b FROM tc4 x JOIN tc4 y ON x.b = y.a)
            ),
            nodes AS (
              SELECT DISTINCT a AS id FROM te
              UNION SELECT DISTINCT b FROM te
            ),
            mut AS (
              SELECT f.a AS id, f.b AS peer
              FROM tc5 f JOIN tc5 g ON f.a = g.b AND f.b = g.a
            ),
            s AS (
              SELECT n.id,
                     LEAST(n.id, COALESCE(MIN(m.peer), n.id)) AS scc
              FROM nodes n LEFT JOIN mut m ON m.id = n.id
              GROUP BY n.id
            )
            SELECT s.id, s.scc, z.scc_size
            FROM s JOIN (SELECT scc, COUNT(*) AS scc_size
                         FROM s GROUP BY scc) z ON s.scc = z.scc
            ORDER BY s.id
        """,
        "transition_reciprocity": """
            WITH te AS MATERIALIZED (
              SELECT DISTINCT from_type AS a, to_type AS b FROM (
                SELECT event_type AS from_type,
                       LEAD(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                         AS to_type
                FROM events
              ) WHERE to_type IS NOT NULL AND from_type <> to_type
            )
            SELECT (SELECT COUNT(*) FROM te) AS n_edges,
                   COUNT(*) AS n_reciprocal,
                   CAST(COUNT(*) AS DOUBLE)
                   / CAST((SELECT COUNT(*) FROM te) AS DOUBLE)
                     AS reciprocity
            FROM te e
            WHERE EXISTS (SELECT 1 FROM te r
                          WHERE r.a = e.b AND r.b = e.a)
        """,
        "pivot_priority_year": """
            SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER)
                     AS order_year,
                   CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
                   CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
                   CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
                   CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
                   CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_low
            FROM orders
            GROUP BY order_year
            ORDER BY order_year
        """,
        "ntile_customer_deciles": """
            SELECT decile, COUNT(*) AS n_customers,
                   MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
            FROM (
              SELECT c_acctbal,
                     NTILE(10) OVER (ORDER BY c_acctbal, c_custkey)
                       AS decile
              FROM customer
            )
            GROUP BY decile
            ORDER BY decile
        """,
        "orders_above_customer_avg": """
            WITH a AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                          AS DOUBLE) / COUNT(*) AS avg_price,
                     COUNT(*) AS n_orders
              FROM orders GROUP BY o_custkey
            )
            SELECT o.o_custkey AS custkey, a.n_orders,
                   COUNT(*) AS n_above
            FROM orders o
            JOIN a ON o.o_custkey = a.o_custkey
            WHERE o.o_totalprice > a.avg_price
            GROUP BY o.o_custkey, a.n_orders
            ORDER BY n_above DESC, custkey
            LIMIT 20
        """,
        # Exact integer corpus frequencies; the two ratios are single
        # double divisions, so ordering and values reproduce exactly.
        "token_rarity": f"""
            WITH tok AS MATERIALIZED (
              SELECT doc_id, u.t AS tok
              FROM documents, UNNEST({_TOK}) AS u(t)
            ),
            freq AS MATERIALIZED (
              SELECT tok, COUNT(*) AS f FROM tok GROUP BY tok
            ),
            st AS (
              SELECT doc_id, COUNT(*) AS n_tokens,
                     SUM(f) AS sum_f,
                     SUM(CASE WHEN f <= 1 THEN 1 ELSE 0 END) AS n_rare
              FROM tok JOIN freq USING (tok)
              GROUP BY doc_id
            )
            SELECT doc_id, n_tokens,
                   CAST(sum_f AS DOUBLE) / n_tokens AS mean_tok_freq,
                   CAST(n_rare AS DOUBLE) / n_tokens AS rare_ratio
            FROM st
            ORDER BY rare_ratio DESC, doc_id
            LIMIT 50
        """,
        # Quota = least(n, greatest(10, floor(4*sqrt(n)))): sqrt is
        # correctly-rounded IEEE, so both engines derive identical
        # quotas; keep_rate is one double division off exact integers.
        "mixture_weights": """
            WITH g AS (
              SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS total_chars
              FROM documents GROUP BY source
            )
            SELECT source, n_docs, total_chars,
                   LEAST(n_docs, GREATEST(10,
                     CAST(FLOOR(4.0 * SQRT(CAST(n_docs AS DOUBLE)))
                          AS BIGINT))) AS quota,
                   CAST(LEAST(n_docs, GREATEST(10,
                     CAST(FLOOR(4.0 * SQRT(CAST(n_docs AS DOUBLE)))
                          AS BIGINT))) AS DOUBLE)
                   / CAST(n_docs AS DOUBLE) AS keep_rate
            FROM g
            ORDER BY source
        """,
        "mixture_sample": """
            WITH r AS (
              SELECT source, doc_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR))
                                & 9223372036854775807, doc_id
                     ) AS _rank,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM documents
            )
            SELECT source, doc_id, _rank,
                   LEAST(n, GREATEST(10,
                     CAST(FLOOR(4.0 * SQRT(CAST(n AS DOUBLE)))
                          AS BIGINT))) AS _quota
            FROM r
            WHERE _rank <= LEAST(n, GREATEST(10,
                     CAST(FLOOR(4.0 * SQRT(CAST(n AS DOUBLE)))
                          AS BIGINT)))
        """,
        "tpch_q7": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER)
                     AS l_year,
                   CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2))
                                 * (1 - CAST(l.l_discount AS DECIMAL(30,2)))
                                 AS DECIMAL(38,4))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o    ON l.l_orderkey = o.o_orderkey
            JOIN customer cu ON o.o_custkey = cu.c_custkey
            JOIN supplier s  ON l.l_suppkey = s.s_suppkey
            JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
            JOIN nation nc   ON cu.c_nationkey = nc.n_nationkey
            WHERE ns.n_nationkey IN (1, 2, 3)
              AND nc.n_nationkey IN (1, 2, 3)
              AND ns.n_nationkey <> nc.n_nationkey
              AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year
        """,
        # National and total revenue from ONE conditional decimal
        # aggregation; the share is the only double division.
        "tpch_q8": """
            WITH j AS (
              SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER)
                       AS o_year,
                     s.s_nationkey,
                     CAST(CAST(l.l_extendedprice AS DECIMAL(30,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(30,2)))
                          AS DECIMAL(38,4)) AS rev
              FROM lineitem l
              JOIN part p      ON l.l_partkey = p.p_partkey
              JOIN orders o    ON l.l_orderkey = o.o_orderkey
              JOIN customer cu ON o.o_custkey = cu.c_custkey
              JOIN nation n    ON cu.c_nationkey = n.n_nationkey
              JOIN region r    ON n.n_regionkey = r.r_regionkey
              JOIN supplier s  ON l.l_suppkey = s.s_suppkey
              WHERE p.p_type = 'PROMO' AND r.r_name = 'AMERICA'
            )
            SELECT o_year,
                   CAST(SUM(CASE WHEN s_nationkey = 1 THEN rev
                                 ELSE CAST(0 AS DECIMAL(38,4)) END)
                        AS DOUBLE)
                   / CAST(SUM(rev) AS DOUBLE) AS mkt_share
            FROM j
            GROUP BY o_year
            ORDER BY o_year
        """,
        "tpch_q13": """
            SELECT c_count, COUNT(*) AS custdist FROM (
              SELECT cu.c_custkey,
                     COUNT(o.o_orderkey) AS c_count
              FROM customer cu
              LEFT JOIN orders o ON cu.c_custkey = o.o_custkey
              GROUP BY cu.c_custkey
            )
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        # Membership in the argmax set is decided on exact DECIMAL
        # equality, never a double compare.
        "tpch_q15": """
            WITH pr AS (
              SELECT l_suppkey,
                     SUM(CAST(CAST(l_extendedprice AS DECIMAL(30,2))
                              * (1 - CAST(l_discount AS DECIMAL(30,2)))
                              AS DECIMAL(38,4))) AS rev
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
              GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   CAST(pr.rev AS DOUBLE) AS total_revenue
            FROM pr
            JOIN supplier s ON pr.l_suppkey = s.s_suppkey
            WHERE pr.rev = (SELECT MAX(rev) FROM pr)
            ORDER BY s.s_suppkey
        """,
        # The per-part average derives from an exact decimal sum; only
        # the 0.2*avg comparison is a double op.
        "tpch_q17": """
            WITH a AS (
              SELECT l_partkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(30,2)))
                          AS DOUBLE) / COUNT(*) AS avg_qty
              FROM lineitem GROUP BY l_partkey
            )
            SELECT COUNT(*) AS n_lines,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,2)))
                        AS DOUBLE) / 7.0 AS avg_yearly
            FROM lineitem l
            JOIN a ON l.l_partkey = a.l_partkey
            WHERE l.l_quantity < 0.2 * a.avg_qty
        """,
        # The scalar average derives from an exact DECIMAL sum divided
        # by a count, so both engines compare against the identical
        # double threshold.
        "tpch_q22": """
            WITH sel AS (
              SELECT * FROM customer
              WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
            ),
            a AS (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
                     / COUNT(*) AS avg_bal
              FROM sel WHERE c_acctbal > 0
            )
            SELECT sel.c_nationkey AS cntrycode,
                   COUNT(*) AS numcust,
                   CAST(SUM(CAST(sel.c_acctbal AS DECIMAL(30,2)))
                        AS DOUBLE) AS totacctbal
            FROM sel, a
            WHERE sel.c_acctbal > a.avg_bal
              AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = sel.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
              )
            GROUP BY sel.c_nationkey
            ORDER BY cntrycode
        """,
        # Exact integer moment sums in HUGEINT == the engine's
        # DECIMAL(38,0); only the final ratio is floating point.
        "assortativity_coorder": """
            WITH e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
            deg AS (SELECT a, COUNT(*) AS deg FROM sym GROUP BY a),
            j AS (
              SELECT CAST(dx.deg AS HUGEINT) AS dx,
                     CAST(dy.deg AS HUGEINT) AS dy
              FROM sym
              JOIN deg dx ON sym.a = dx.a
              JOIN deg dy ON sym.b = dy.a
            ),
            s AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                     SUM(dx) AS sx, SUM(dx * dy) AS sxy,
                     SUM(dx * dx) AS sxx
              FROM j
            )
            SELECT CAST(n AS BIGINT) // 2 AS n_edges,
                   ROUND(CAST(n * sxy - sx * sx AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE), 6)
                     AS assortativity
            FROM s
        """,
        # Unrolled 4-step walk: identical ranked adjacency (row_number
        # by neighbor id) + identical md5-derived draw per step
        # (md5_number_upper & sign-mask == the engine's md5_63).
        "random_walks_parts": _walks_oracle_body(),
        "walk_skipgrams": f"""
            WITH wk AS MATERIALIZED ({_walks_oracle_body()}),
            pos AS (
              SELECT walk_id, 0 AS pos, step_0 AS node FROM wk
              UNION ALL SELECT walk_id, 1, step_1 FROM wk
              UNION ALL SELECT walk_id, 2, step_2 FROM wk
              UNION ALL SELECT walk_id, 3, step_3 FROM wk
              UNION ALL SELECT walk_id, 4, step_4 FROM wk
            )
            SELECT a.node AS center, b.node AS context,
                   COUNT(*) AS n_pairs
            FROM pos a JOIN pos b
              ON a.walk_id = b.walk_id AND a.pos <> b.pos
             AND ABS(a.pos - b.pos) <= 2
            GROUP BY 1, 2
        """,
        # Same gram stream (8-word windows), same md5_number_upper ==
        # md5_64 digest domain for the duplicated-gram decision, same
        # covered-position expansion and space re-join.
        "dedup_exact_spans": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS words
              FROM documents
            ),
            g AS (
              SELECT doc_id, i AS start,
                     md5_number_upper(
                       array_to_string(words[i:i+7], ' ')) AS gh
              FROM (
                SELECT doc_id, words,
                       unnest(range(1, len(words) - 6)) AS i
                FROM w
              )
            ),
            duph AS (
              SELECT gh FROM g GROUP BY gh
              HAVING COUNT(DISTINCT doc_id) >= 2
            ),
            cov AS (
              SELECT DISTINCT doc_id, pos FROM (
                SELECT g.doc_id, g.start + unnest(range(0, 8)) AS pos
                FROM g JOIN duph USING (gh)
              )
            ),
            posw AS (
              SELECT doc_id, pos, words[pos] AS word FROM (
                SELECT doc_id, words,
                       unnest(range(1, len(words) + 1)) AS pos
                FROM w
              )
            ),
            kept AS (
              SELECT p.doc_id,
                     string_agg(p.word, ' ' ORDER BY p.pos) AS clean_text
              FROM posw p
              LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
              WHERE c.pos IS NULL
              GROUP BY p.doc_id
            ),
            covn AS (
              SELECT doc_id, COUNT(*) AS n_dup FROM cov GROUP BY doc_id
            )
            SELECT w.doc_id,
                   len(w.words) AS n_words,
                   COALESCE(covn.n_dup, 0) AS n_dup_words,
                   COALESCE(kept.clean_text, '') AS clean_text
            FROM w
            LEFT JOIN covn USING (doc_id)
            LEFT JOIN kept USING (doc_id)
        """,
        # identical exact-component moments: n, sum, sum-of-squares as
        # decimals; mean/variance/z derived with the same IEEE ops
        "events_outliers": """
            WITH comp AS (
              SELECT event_type, COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(19,6))) AS DOUBLE)
                       AS s,
                     CAST(SUM(CAST(CAST(value AS DECIMAL(19,6))
                                   * CAST(value AS DECIMAL(19,6))
                                   AS DECIMAL(38,12))) AS DOUBLE) AS ss
              FROM events GROUP BY event_type
            ),
            m AS (
              SELECT event_type, n, s / n AS mean,
                     (ss - s * s / n) / (n - 1) AS var
              FROM comp
            )
            SELECT e.event_id, e.event_type, e.value,
                   ROUND((e.value - m.mean) / sqrt(m.var), 6) AS zscore
            FROM events e JOIN m ON e.event_type = m.event_type
            WHERE m.n > 1 AND m.var > 0
              AND abs((e.value - m.mean) / sqrt(m.var)) > 3.0
        """,
        # greedy earliest-completion chain: each step's time is the MIN
        # event time strictly after the previous step's — mirrored
        # join-by-join from functions/funnel.py
        "funnel_events": """
            WITH fe AS (
              SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03'
            ),
            f1 AS (
              SELECT user_id, MIN(ts) AS t1 FROM fe
              WHERE event_type = 'view' GROUP BY 1
            ),
            f2 AS (
              SELECT f1.user_id, MIN(e.ts) AS t2
              FROM f1 JOIN fe e
                ON e.user_id = f1.user_id
               AND e.event_type = 'click' AND e.ts > f1.t1
              GROUP BY 1
            ),
            f3 AS (
              SELECT f2.user_id, MIN(e.ts) AS t3
              FROM f2 JOIN fe e
                ON e.user_id = f2.user_id
               AND e.event_type = 'purchase' AND e.ts > f2.t2
              GROUP BY 1
            )
            SELECT CAST(steps_completed AS INTEGER) AS steps_completed,
                   COUNT(*) AS n_users
            FROM (
              SELECT f1.user_id,
                     1 + (f2.user_id IS NOT NULL)::INT
                       + (f3.user_id IS NOT NULL)::INT AS steps_completed
              FROM f1
              LEFT JOIN f2 ON f1.user_id = f2.user_id
              LEFT JOIN f3 ON f1.user_id = f3.user_id
            ) GROUP BY 1
        """,
        # sweep line: ends (-1) before starts (+1) at equal t is exactly
        # ORDER BY t, delta ascending; the bucket decomposition in the
        # engine reproduces this single global window by construction.
        "concurrent_sessions": """
            WITH sz AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN FLOOR(epoch(ts))
                               - FLOOR(epoch(LAG(ts) OVER w)) > 600
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sn AS (
              SELECT user_id, ts,
                     SUM(brk) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
              FROM sz
            ),
            sess AS (
              SELECT user_id, session_seq,
                     CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS st,
                     CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS en
              FROM sn GROUP BY user_id, session_seq
            ),
            pts AS (
              SELECT st AS t, 1 AS delta, user_id AS u, session_seq
              FROM sess
              UNION ALL
              SELECT en, -1, user_id, session_seq FROM sess
            ),
            run AS (
              SELECT t // 3600 AS bucket,
                     CAST(SUM(delta) OVER (
                         ORDER BY t, delta, u, session_seq
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS active
              FROM pts
            )
            SELECT strftime(make_timestamp(bucket * 3600 * 1000000),
                            '%Y-%m-%d %H:%M:%S') AS hour_start,
                   MAX(active) AS max_active,
                   COUNT(*) AS n_boundaries
            FROM run GROUP BY bucket
        """,
        "session_paths": """
            WITH sz AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN FLOOR(epoch(ts))
                               - FLOOR(epoch(LAG(ts) OVER w)) > 14400
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sn AS (
              SELECT user_id, ts, event_id, event_type,
                     SUM(brk) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sess
              FROM sz
            ),
            tri AS (
              SELECT event_type AS t0,
                     LEAD(event_type, 1) OVER ws AS t1,
                     LEAD(event_type, 2) OVER ws AS t2
              FROM sn
              WINDOW ws AS (PARTITION BY user_id, sess
                            ORDER BY ts, event_id)
            )
            SELECT t0, t1, t2, COUNT(*) AS n_paths
            FROM tri WHERE t2 IS NOT NULL
            GROUP BY t0, t1, t2
            ORDER BY n_paths DESC, t0, t1, t2
            LIMIT 20
        """,
        # K4/triangle membership is orientation-independent, so the
        # oracle enumerates each clique once as a<b<c(<d) with all
        # edges present; closure joins interleaved to keep DuckDB's
        # intermediate volumes near the clique count itself.
        "clique_profile_parts": """
            WITH pairs AS MATERIALIZED (
              SELECT a.l_partkey AS a, b.l_partkey AS b
              FROM (SELECT DISTINCT l_orderkey, l_partkey
                    FROM lineitem) a
              JOIN (SELECT DISTINCT l_orderkey, l_partkey
                    FROM lineitem) b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            tri AS MATERIALIZED (
              SELECT e1.a AS a, e1.b AS b, e2.b AS c
              FROM pairs e1
              JOIN pairs e2 ON e2.a = e1.a AND e2.b > e1.b
              JOIN pairs e3 ON e3.a = e1.b AND e3.b = e2.b
            ),
            tri_n AS (
              SELECT id, COUNT(*) AS n_triangles FROM (
                SELECT a AS id FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
              ) GROUP BY id
            ),
            quad AS MATERIALIZED (
              SELECT e1.a AS a, e1.b AS b, e2.b AS c, e3.b AS d
              FROM pairs e1
              JOIN pairs e2 ON e2.a = e1.a AND e2.b > e1.b
              JOIN pairs e4 ON e4.a = e1.b AND e4.b = e2.b
              JOIN pairs e3 ON e3.a = e1.a AND e3.b > e2.b
              JOIN pairs e5 ON e5.a = e1.b AND e5.b = e3.b
              JOIN pairs e6 ON e6.a = e2.b AND e6.b = e3.b
            ),
            quad_n AS (
              SELECT id, COUNT(*) AS n_cliques4 FROM (
                SELECT a AS id FROM quad
                UNION ALL SELECT b FROM quad
                UNION ALL SELECT c FROM quad
                UNION ALL SELECT d FROM quad
              ) GROUP BY id
            )
            SELECT t.id, t.n_triangles,
                   CAST(COALESCE(q.n_cliques4, 0) AS BIGINT)
                     AS n_cliques4
            FROM tri_n t LEFT JOIN quad_n q ON t.id = q.id
            ORDER BY t.n_triangles DESC, t.id LIMIT 20
        """,
        "negative_edges_coorder": """
            WITH pairs AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            ids AS MATERIALIZED (
              SELECT a AS id FROM pairs UNION SELECT b FROM pairs
            ),
            nb AS (SELECT GREATEST(16, COUNT(*) // 100) AS k FROM ids),
            nodes AS (
              SELECT id,
                     CAST(md5_number_upper(CAST(id AS VARCHAR))
                          & 9223372036854775807 AS BIGINT)
                       % (SELECT k FROM nb) AS bucket
              FROM ids
            ),
            cand AS (
              SELECT x.id AS a, y.id AS b
              FROM nodes x JOIN nodes y
                ON x.bucket = y.bucket AND x.id < y.id
              WHERE NOT EXISTS (SELECT 1 FROM pairs p
                                WHERE p.a = x.id AND p.b = y.id)
            ),
            rk AS (
              SELECT a, b,
                     CAST(ROW_NUMBER() OVER (
                         PARTITION BY a
                         ORDER BY CAST(md5_number_upper(
                                    CAST(a AS VARCHAR) || ':'
                                    || CAST(b AS VARCHAR))
                                  & 9223372036854775807 AS BIGINT),
                                  b) AS INTEGER) AS rk
              FROM cand
            )
            SELECT a, b, rk FROM rk WHERE rk <= 2
        """,
        "fastrp_parts": """
            WITH pairs AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            adj AS (
              SELECT a, b FROM pairs
              UNION ALL SELECT b, a FROM pairs
            ),
            dims AS (SELECT * FROM (VALUES (0),(1),(2),(3)) d(dim)),
            seed AS (
              SELECT n.id, d.dim,
                     CASE WHEN substring(
                              md5(CAST(n.id AS VARCHAR) || ':'
                                  || CAST(d.dim AS VARCHAR)), 1, 1)
                            IN ('0','2','4','6','8','a','c','e')
                          THEN 1 ELSE -1 END AS h
              FROM (SELECT DISTINCT a AS id FROM adj) n
              CROSS JOIN dims d
            ),
            r1 AS (
              SELECT adj.a AS id, s.dim,
                     CAST(SUM(s.h) AS BIGINT) AS h
              FROM adj JOIN seed s ON s.id = adj.b
              GROUP BY adj.a, s.dim
            ),
            r2 AS (
              SELECT adj.a AS id, s.dim,
                     CAST(SUM(s.h) AS BIGINT) AS h
              FROM adj JOIN r1 s ON s.id = adj.b
              GROUP BY adj.a, s.dim
            )
            SELECT r1.id, CAST(r1.dim AS INTEGER) AS dim,
                   r1.h AS h1, r2.h AS h2
            FROM r1 JOIN r2 ON r1.id = r2.id AND r1.dim = r2.dim
        """,
        # Positional-posting phrase intersection replayed over
        # string_split tokens: term i's positions shifted by -i, then
        # equi-joined — overlapping occurrences count (replace-based
        # substring counting would miss them).
        "phrase_search": f"""
            WITH ps_tok AS (
              SELECT doc_id, p - 1 AS pos, toks[p] AS tok FROM (
                SELECT doc_id, toks,
                       unnest(range(1, len(toks) + 1)) AS p
                FROM (SELECT doc_id, {_TOK} AS toks FROM documents)
              )
              WHERE toks[p] IN ('big', 'order', 'scan')
            ),
            hit AS (
              SELECT t0.doc_id, t0.pos
              FROM ps_tok t0
              JOIN ps_tok t1 ON t1.doc_id = t0.doc_id
               AND t1.tok = 'order' AND t1.pos - 1 = t0.pos
              JOIN ps_tok t2 ON t2.doc_id = t0.doc_id
               AND t2.tok = 'scan' AND t2.pos - 2 = t0.pos
              WHERE t0.tok = 'big'
            )
            SELECT doc_id, COUNT(*) AS n_occurrences,
                   CAST(MIN(pos) AS BIGINT) AS first_pos
            FROM hit GROUP BY doc_id
            ORDER BY n_occurrences DESC, doc_id LIMIT 20
        """,
        # Blocking-key ER: first name token blocks, lossless
        # length-difference prefilter, levenshtein verify (both engines
        # implement textbook Wagner-Fischer edit distance).
        "entity_linkage_parts": """
            WITH el AS (
              SELECT p_partkey AS id, p_name AS nm,
                     string_split(p_name, ' ')[1] AS blk
              FROM part
            )
            SELECT l.id AS id_a, r.id AS id_b,
                   l.nm AS name_a, r.nm AS name_b,
                   CAST(levenshtein(l.nm, r.nm) AS INTEGER) AS distance
            FROM el l JOIN el r
              ON l.blk = r.blk AND l.id < r.id
             AND abs(length(l.nm) - length(r.nm)) <= 2
            WHERE levenshtein(l.nm, r.nm) <= 2
            ORDER BY distance, id_a, id_b LIMIT 20
        """,
        # Resource-Allocation index in exact integer ppm: per common
        # neighbor z (degree <= 100, the same wedge cap as
        # link_prediction_parts), 1000000 // deg(z), summed as BIGINT.
        "ra_link_prediction": """
            WITH ra_pairs AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            ra_sym AS MATERIALIZED (
              SELECT a, b FROM ra_pairs
              UNION ALL
              SELECT b AS a, a AS b FROM ra_pairs
            ),
            ra_deg AS MATERIALIZED (
              SELECT a, COUNT(*) AS d FROM ra_sym GROUP BY a
            ),
            ra_cn AS MATERIALIZED (
              SELECT s1.b AS a, s2.b AS b,
                     CAST(SUM(1000000 // dc.d) AS BIGINT) AS ra_ppm,
                     COUNT(*) AS common
              FROM ra_sym s1 JOIN ra_sym s2
                ON s1.a = s2.a AND s1.b < s2.b
              JOIN ra_deg dc ON s1.a = dc.a AND dc.d <= 100
              GROUP BY 1, 2 HAVING COUNT(*) >= 2
            )
            SELECT a, b, ra_ppm, CAST(common AS BIGINT) AS common
            FROM ra_cn c
            WHERE NOT EXISTS (SELECT 1 FROM ra_pairs p
                              WHERE p.a = c.a AND p.b = c.b)
            ORDER BY ra_ppm DESC, common DESC, a, b LIMIT 20
        """,
        # Exact lower medians by integer rank off the degree histogram;
        # outliers = |deg - median| > 3 * MAD.
        "degree_anomalies_parts": """
            WITH da_pairs AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            da_deg AS MATERIALIZED (
              SELECT id, COUNT(*) AS deg FROM (
                SELECT a AS id FROM da_pairs
                UNION ALL SELECT b FROM da_pairs
              ) GROUP BY id
            ),
            da_hist AS (
              SELECT deg, COUNT(*) AS n FROM da_deg GROUP BY deg
            ),
            da_tot AS (SELECT SUM(n) AS t FROM da_hist),
            da_med AS (
              SELECT MIN(deg) AS median_deg FROM (
                SELECT deg, SUM(n) OVER (ORDER BY deg) AS c
                FROM da_hist
              ), da_tot WHERE c >= (t + 1) // 2
            ),
            da_devh AS (
              SELECT abs(deg - median_deg) AS dev, SUM(n) AS n
              FROM da_hist, da_med GROUP BY 1
            ),
            da_mad AS (
              SELECT MIN(dev) AS mad FROM (
                SELECT dev, SUM(n) OVER (ORDER BY dev) AS c
                FROM da_devh
              ), da_tot WHERE c >= (t + 1) // 2
            )
            SELECT id, CAST(deg AS BIGINT) AS deg,
                   CAST(median_deg AS BIGINT) AS median_deg,
                   CAST(mad AS BIGINT) AS mad,
                   CAST(abs(deg - median_deg) AS BIGINT) AS deviation
            FROM da_deg, da_med, da_mad
            WHERE abs(deg - median_deg) > 3 * mad
            ORDER BY deviation DESC, id LIMIT 20
        """,
        # Distinct (user, day) frame x trailing-7-day spine join —
        # windowed COUNT(DISTINCT) is not decomposable, so the oracle
        # replays the same range join.
        "rolling_active_users": """
            WITH ud AS (
              SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
              FROM events
            ),
            spine AS (SELECT DISTINCT d AS day FROM ud)
            SELECT strftime(s.day, '%Y-%m-%d') AS day,
                   COUNT(DISTINCT u.user_id) AS active_users
            FROM spine s JOIN ud u
              ON u.d <= s.day AND u.d >= s.day - INTERVAL 6 DAY
            GROUP BY s.day ORDER BY day
        """,
        # Gaps-and-islands run starts (lag <> attr), valid_to = next
        # run start per key in the (ts, event_id) total order.
        "scd2_user_state": """
            WITH s2 AS (
              SELECT user_id, event_type, ts, event_id,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev
              FROM events
            ),
            runs AS (
              SELECT user_id, event_type AS attr, ts, event_id
              FROM s2 WHERE prev IS NULL OR prev <> event_type
            )
            SELECT user_id, attr,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
                   strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S')
                     AS valid_to,
                   (lead(ts) OVER w IS NULL) AS is_current
            FROM runs
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        # Exact decimal step-function integral: 2-decimal doubles are
        # lossless as DECIMAL(18,2), Δt integer seconds; doubles only
        # at publish (the type_value_stats discipline).
        "time_weighted_value": """
            WITH twv AS (
              -- floor, not CAST: ts has sub-second precision and
              -- DuckDB's double->BIGINT cast ROUNDS while Spark's
              -- unix_timestamp truncates to whole seconds.
              SELECT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ep,
                     lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) - CAST(floor(epoch(ts)) AS BIGINT) AS dt,
                     CAST(value AS DECIMAL(18,2)) AS v
              FROM events
            )
            SELECT user_id,
                   CAST(COALESCE(
                     SUM(v * CAST(dt AS DECIMAL(10,0))), 0
                   ) AS DOUBLE) AS twv_seconds,
                   CAST(MAX(ep) - MIN(ep) AS BIGINT) AS span_seconds,
                   CASE WHEN MAX(ep) - MIN(ep) > 0 THEN ROUND(
                     CAST(COALESCE(
                       SUM(v * CAST(dt AS DECIMAL(10,0))), 0
                     ) AS DOUBLE) / (MAX(ep) - MIN(ep)), 6)
                   END AS tw_avg,
                   COUNT(*) AS n_events
            FROM twv GROUP BY user_id
        """,
        "textrank_keywords": _textrank_oracle(n_iter=6, damping=0.85),
        # 1-WL: degree-seeded colors, two rounds of
        # md5(color | sorted neighbor multiset); string_agg ORDER BY =
        # Spark's sort_array(collect_list) canonicalization.
        "wl_colors_parts": """
            WITH wl_pairs AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            wl_adj AS MATERIALIZED (
              SELECT a, b FROM wl_pairs
              UNION ALL SELECT b AS a, a AS b FROM wl_pairs
            ),
            wc0 AS MATERIALIZED (
              SELECT a AS id, CAST(COUNT(*) AS VARCHAR) AS color
              FROM wl_adj GROUP BY a
            ),
            wc1 AS MATERIALIZED (
              SELECT c.id, md5(c.color || '|' || s.ns) AS color
              FROM wc0 c JOIN (
                SELECT e.a AS id,
                       string_agg(n.color, ',' ORDER BY n.color) AS ns
                FROM wl_adj e JOIN wc0 n ON n.id = e.b
                GROUP BY e.a
              ) s ON s.id = c.id
            ),
            wc2 AS MATERIALIZED (
              SELECT c.id, md5(c.color || '|' || s.ns) AS color
              FROM wc1 c JOIN (
                SELECT e.a AS id,
                       string_agg(n.color, ',' ORDER BY n.color) AS ns
                FROM wl_adj e JOIN wc1 n ON n.id = e.b
                GROUP BY e.a
              ) s ON s.id = c.id
            )
            SELECT color AS wl_color, COUNT(*) AS n_nodes
            FROM wc2 GROUP BY color
            ORDER BY n_nodes DESC, wl_color LIMIT 20
        """,
        # Integer-rank median/MAD per type over the hourly-count
        # histogram; burst = count > median + 3*MAD.
        "event_bursts": """
            WITH eb_hourly AS MATERIALIZED (
              SELECT event_type, date_trunc('hour', ts) AS hour,
                     COUNT(*) AS n_events
              FROM events GROUP BY 1, 2
            ),
            eb_hist AS (
              SELECT event_type, n_events, COUNT(*) AS cnt
              FROM eb_hourly GROUP BY 1, 2
            ),
            eb_tot AS (
              SELECT event_type, SUM(cnt) AS tot
              FROM eb_hist GROUP BY 1
            ),
            eb_med AS (
              SELECT x.event_type, MIN(n_events) AS median_n FROM (
                SELECT event_type, n_events,
                       SUM(cnt) OVER (PARTITION BY event_type
                                      ORDER BY n_events) AS c
                FROM eb_hist
              ) x JOIN eb_tot t ON t.event_type = x.event_type
              WHERE c >= (tot + 1) // 2 GROUP BY x.event_type
            ),
            eb_devh AS (
              SELECT h.event_type,
                     abs(h.n_events - m.median_n) AS dev,
                     SUM(cnt) AS cnt
              FROM eb_hist h JOIN eb_med m
                ON m.event_type = h.event_type
              GROUP BY 1, 2
            ),
            eb_mad AS (
              SELECT x.event_type, MIN(dev) AS mad_n FROM (
                SELECT event_type, dev,
                       SUM(cnt) OVER (PARTITION BY event_type
                                      ORDER BY dev) AS c
                FROM eb_devh
              ) x JOIN eb_tot t ON t.event_type = x.event_type
              WHERE c >= (tot + 1) // 2 GROUP BY x.event_type
            )
            SELECT h.event_type,
                   strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour,
                   h.n_events, m.median_n, d.mad_n,
                   h.n_events - (m.median_n + 3 * d.mad_n) AS excess
            FROM eb_hourly h
            JOIN eb_med m ON m.event_type = h.event_type
            JOIN eb_mad d ON d.event_type = h.event_type
            WHERE h.n_events - (m.median_n + 3 * d.mad_n) > 0
            ORDER BY excess DESC, h.event_type, h.hour LIMIT 20
        """,
        "dag_layers_graph": _dag_layers_oracle(n_iter=8),
        # Equi-depth buckets from exact integer rank math off
        # ROW_NUMBER over the tie-broken total order.
        "equidepth_prices": """
            WITH eq AS (
              SELECT o_totalprice AS v,
                     ROW_NUMBER() OVER (
                       ORDER BY o_totalprice, o_orderkey
                     ) AS rk,
                     COUNT(*) OVER () AS n
              FROM orders
            )
            SELECT CAST((rk - 1) * 10 // n AS INTEGER) AS bucket,
                   COUNT(*) AS n_rows, MIN(v) AS lo, MAX(v) AS hi
            FROM eq GROUP BY 1 ORDER BY bucket
        """,
        # Triangle support per EDGE: wedge counts semi-joined to the
        # edge list; zero-support edges roll into one weak_total row.
        "edge_embeddedness": """
            WITH ee_pairs AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            ee_sym AS MATERIALIZED (
              SELECT a, b FROM ee_pairs
              UNION ALL SELECT b AS a, a AS b FROM ee_pairs
            ),
            ee_sup AS MATERIALIZED (
              SELECT s1.b AS a, s2.b AS b, COUNT(*) AS support
              FROM ee_sym s1 JOIN ee_sym s2
                ON s1.a = s2.a AND s1.b < s2.b
              GROUP BY 1, 2
            ),
            ee_edge_sup AS MATERIALIZED (
              SELECT s.a, s.b, s.support FROM ee_sup s
              WHERE EXISTS (SELECT 1 FROM ee_pairs p
                            WHERE p.a = s.a AND p.b = s.b)
            )
            SELECT 'strong' AS tie, a, b, CAST(support AS BIGINT)
                     AS support
            FROM (SELECT * FROM ee_edge_sup
                  ORDER BY support DESC, a, b LIMIT 20)
            UNION ALL
            SELECT 'weak_total', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
                   (SELECT COUNT(*) FROM ee_pairs p
                    WHERE NOT EXISTS (SELECT 1 FROM ee_edge_sup s
                                      WHERE s.a = p.a AND s.b = p.b))
        """,
        "seeded_labels_parts": _slpa_oracle(rounds=3),
        "matching_parts": _matching_oracle(rounds=5),
        # Exact relational derivation of the v0->v1 manifest: the
        # fixture updates customer 1 and removes supplier 1, whose
        # cascade deletes every incident edge.
        "store_version_diff": _GRAPH_WITH + f"""
            SELECT 'node' AS kind,
                   CAST({CUSTOMER_BASE} + 1 AS BIGINT) AS id,
                   'updated' AS change
            UNION ALL
            SELECT 'node', CAST({SUPPLIER_BASE} + 1 AS BIGINT),
                   'removed'
            UNION ALL
            SELECT 'edge', e.id, 'removed'
            FROM edges_v e
            WHERE e.src = {SUPPLIER_BASE} + 1
               OR e.dst = {SUPPLIER_BASE} + 1
            ORDER BY kind, change, id
        """,
        # Min-id labels compose: merging regions (0,2) and (1,3) maps
        # component 2 -> 0 and 3 -> 1 in the closed-form geo oracle.
        "cc_incremental_geo": f"""
            WITH geo AS ({_CC_GEO_ORACLE})
            SELECT id,
                   CASE component
                     WHEN {REGION_BASE} + 2 THEN {REGION_BASE} + 0
                     WHEN {REGION_BASE} + 3 THEN {REGION_BASE} + 1
                     ELSE component END AS component
            FROM geo
        """,
        "doc_length_percentiles": """
            WITH dp_hist AS (
              SELECT source, n_chars, COUNT(*) AS n
              FROM documents GROUP BY 1, 2
            ),
            dp_tot AS (
              SELECT source, SUM(n) AS tot FROM dp_hist GROUP BY 1
            ),
            dp_rank AS (
              SELECT h.source, h.n_chars,
                     CAST(SUM(n) OVER (PARTITION BY h.source
                                       ORDER BY h.n_chars)
                          * 1000 // t.tot AS INTEGER) AS permille
              FROM dp_hist h JOIN dp_tot t ON t.source = h.source
            )
            SELECT d.doc_id, d.source, d.n_chars, r.permille
            FROM documents d
            JOIN dp_rank r
              ON r.source = d.source AND r.n_chars = d.n_chars
        """,
        # The oracle ENUMERATES every length-3 path (3 joins) — the
        # Spark side only propagates counts; exact agreement is the
        # cross-check.
        "label_path_census": _GRAPH_WITH + """
            SELECT ls.label AS src_label, ld.label AS dst_label,
                   COUNT(*) AS n_paths
            FROM edges_v e1
            JOIN edges_v e2 ON e2.src = e1.dst
            JOIN edges_v e3 ON e3.src = e2.dst
            JOIN nodes_v ls ON ls.id = e1.src
            JOIN nodes_v ld ON ld.id = e3.dst
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Direct triple enumeration — the Apriori pair prune on the
        # Spark side is lossless, so both must agree exactly.
        "basket_triples": """
            WITH bt AS (
              SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
              FROM lineitem
            )
            SELECT x.it AS a, y.it AS b, z.it AS c,
                   COUNT(*) AS support
            FROM bt x
            JOIN bt y ON y.bk = x.bk AND x.it < y.it
            JOIN bt z ON z.bk = x.bk AND y.it < z.it
            GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
            ORDER BY support DESC, a, b, c LIMIT 20
        """,
        # Exact decimal component sums; floats only in the final
        # closed form, same left-association as the Spark side.
        "price_qty_correlation": """
            WITH pc AS (
              SELECT COUNT(*) AS n,
                     SUM(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
                     SUM(CAST(l_extendedprice AS DECIMAL(19,6)))
                       AS sy,
                     SUM(CAST(CAST(l_quantity AS DECIMAL(19,6))
                              * CAST(l_extendedprice
                                     AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS sxy,
                     SUM(CAST(CAST(l_quantity AS DECIMAL(19,6))
                              * CAST(l_quantity AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS sxx,
                     SUM(CAST(CAST(l_extendedprice
                                   AS DECIMAL(19,6))
                              * CAST(l_extendedprice
                                     AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS syy
              FROM lineitem
            )
            SELECT CAST(n AS BIGINT) AS n,
                   ROUND(
                     ((CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                     / sqrt(
                       ((CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                       * ((CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                             / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                     ), 6) AS r,
                   ROUND((CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                            / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE),
                         6) AS cov,
                   ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
                     AS x_mean,
                   ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6)
                     AS y_mean
            FROM pc
        """,
        # Island merge: new island where the running MAX of previous
        # interval ends is below this start; floor(epoch()) matches
        # Spark's unix_timestamp truncation.
        "interval_coverage": """
            WITH ic AS (
              SELECT user_id, ts, event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS s,
                     CAST(floor(epoch(ts)) AS BIGINT) + 600 AS e
              FROM events
            ),
            icm AS (
              SELECT user_id, ts, event_id, s, e,
                     CASE WHEN MAX(e) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) >= s
                          THEN 0 ELSE 1 END AS ni
              FROM ic
            ),
            isl AS (
              SELECT user_id, s, e,
                     SUM(ni) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS g
              FROM icm
            ),
            per_isl AS (
              SELECT user_id, g, MAX(e) - MIN(s) AS len
              FROM isl GROUP BY 1, 2
            )
            SELECT p.user_id,
                   CAST(SUM(p.len) AS BIGINT) AS covered_seconds,
                   COUNT(*) AS n_islands,
                   (SELECT COUNT(*) FROM events ev
                    WHERE ev.user_id = p.user_id) AS n_events
            FROM per_isl p GROUP BY p.user_id
        """,
        "local_clustering_parts": """
            WITH lc_pairs AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            lc_deg AS MATERIALIZED (
              SELECT id, COUNT(*) AS deg FROM (
                SELECT a AS id FROM lc_pairs
                UNION ALL SELECT b FROM lc_pairs
              ) GROUP BY id HAVING COUNT(*) >= 2
            ),
            lc_tri AS MATERIALIZED (
              SELECT e1.a AS a, e1.b AS b, e2.b AS c
              FROM lc_pairs e1
              JOIN lc_pairs e2 ON e2.a = e1.a AND e2.b > e1.b
              JOIN lc_pairs e3 ON e3.a = e1.b AND e3.b = e2.b
            ),
            lc_tn AS (
              SELECT id, COUNT(*) AS nt FROM (
                SELECT a AS id FROM lc_tri
                UNION ALL SELECT b FROM lc_tri
                UNION ALL SELECT c FROM lc_tri
              ) GROUP BY id
            )
            SELECT d.id, CAST(d.deg AS BIGINT) AS deg,
                   CAST(COALESCE(t.nt, 0) AS BIGINT) AS n_triangles,
                   ROUND(COALESCE(t.nt, 0)
                         / (d.deg * (d.deg - 1) / 2), 6) AS lcc
            FROM lc_deg d LEFT JOIN lc_tn t ON t.id = d.id
            ORDER BY lcc DESC, d.id LIMIT 20
        """,
        "event_trends": """
            WITH et_daily AS (
              SELECT event_type,
                     datediff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS x,
                     COUNT(*) AS y
              FROM events GROUP BY 1, 2
            ),
            et_agg AS (
              SELECT event_type,
                     CAST(COUNT(*) AS BIGINT) AS n_days,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx
              FROM et_daily GROUP BY 1
            )
            SELECT event_type, n_days,
                   CAST(n_days * sxy - sx * sy AS BIGINT)
                     AS slope_num,
                   CASE WHEN n_days * sxy - sx * sy > 0 THEN 'rising'
                        WHEN n_days * sxy - sx * sy < 0 THEN 'falling'
                        ELSE 'flat' END AS trend,
                   CASE WHEN n_days * sxx - sx * sx > 0 THEN
                     ROUND(CAST(n_days * sxy - sx * sy AS DOUBLE)
                           / CAST(n_days * sxx - sx * sx AS DOUBLE),
                           6)
                   END AS slope
            FROM et_agg
        """,
        "k_anonymity_customers": """
            WITH ka AS (
              SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
              FROM customer GROUP BY 1, 2
            ),
            kr AS (
              SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                     COUNT(*) AS n_groups,
                     CAST(MIN(n) AS BIGINT) AS min_group_size,
                     CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END)
                          AS BIGINT) AS n_rows_at_risk,
                     CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_groups_at_risk
              FROM ka
            )
            SELECT *, CAST(n_rows_at_risk * 1000 // n_rows
                           AS INTEGER) AS at_risk_permille
            FROM kr
        """,
        "fd_discovery_part": """
            WITH fd AS (
              SELECT det, dep, COUNT(*) AS n_groups,
                     CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_violating_groups
              FROM (
                SELECT 'p_name' AS det, 'p_brand' AS dep, p_name AS g,
                       COUNT(DISTINCT p_brand) AS nd
                FROM part GROUP BY p_name
                UNION ALL SELECT 'p_name', 'p_type', p_name,
                       COUNT(DISTINCT p_type) FROM part GROUP BY p_name
                UNION ALL SELECT 'p_name', 'p_size', p_name,
                       COUNT(DISTINCT CAST(p_size AS VARCHAR))
                FROM part GROUP BY p_name
                UNION ALL SELECT 'p_brand', 'p_name', p_brand,
                       COUNT(DISTINCT p_name) FROM part GROUP BY p_brand
                UNION ALL SELECT 'p_brand', 'p_type', p_brand,
                       COUNT(DISTINCT p_type) FROM part GROUP BY p_brand
                UNION ALL SELECT 'p_brand', 'p_size', p_brand,
                       COUNT(DISTINCT CAST(p_size AS VARCHAR))
                FROM part GROUP BY p_brand
                UNION ALL SELECT 'p_type', 'p_name', p_type,
                       COUNT(DISTINCT p_name) FROM part GROUP BY p_type
                UNION ALL SELECT 'p_type', 'p_brand', p_type,
                       COUNT(DISTINCT p_brand) FROM part GROUP BY p_type
                UNION ALL SELECT 'p_type', 'p_size', p_type,
                       COUNT(DISTINCT CAST(p_size AS VARCHAR))
                FROM part GROUP BY p_type
                UNION ALL SELECT 'p_size', 'p_name',
                       CAST(p_size AS VARCHAR), COUNT(DISTINCT p_name)
                FROM part GROUP BY p_size
                UNION ALL SELECT 'p_size', 'p_brand',
                       CAST(p_size AS VARCHAR), COUNT(DISTINCT p_brand)
                FROM part GROUP BY p_size
                UNION ALL SELECT 'p_size', 'p_type',
                       CAST(p_size AS VARCHAR), COUNT(DISTINCT p_type)
                FROM part GROUP BY p_size
              ) GROUP BY det, dep
            )
            SELECT determinant, dependent, n_groups,
                   n_violating_groups,
                   (n_violating_groups = 0) AS holds
            FROM (SELECT det AS determinant, dep AS dependent,
                         n_groups, n_violating_groups FROM fd)
            ORDER BY determinant, dependent
        """,
        # Textbook skyline: rows no other row strictly dominates
        # (>= on every criterion, > on at least one; p_size maximized,
        # p_retailprice minimized).
        "skyline_parts": """
            SELECT p.p_partkey, p.p_size, p.p_retailprice
            FROM part p
            WHERE NOT EXISTS (
              SELECT 1 FROM part q
              WHERE q.p_size >= p.p_size
                AND q.p_retailprice <= p.p_retailprice
                AND (q.p_size > p.p_size
                     OR q.p_retailprice < p.p_retailprice))
        """,
        # md5_63 == md5_number_upper & ~sign: identical hash rank order
        # in both engines.
        "sample_per_source": """
            SELECT doc_id, source, rn AS _rank FROM (
              SELECT doc_id, source,
                     ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY (md5_number_upper(
                                   CAST(doc_id AS VARCHAR))
                                 & 9223372036854775807), doc_id)
                       AS rn
              FROM documents)
            WHERE rn <= 50
        """,
        # Same histogram-windowed type-1 quantile ranks as the engine:
        # cut at permille p = smallest value with cum >= ceil(n*p/1000).
        "winsorize_orders": """
            WITH wv AS (
              SELECT o_orderpriority AS g,
                     CAST(o_totalprice AS DECIMAL(18,2)) AS val
              FROM orders
            ),
            wh AS (SELECT g, val, COUNT(*) AS n FROM wv GROUP BY 1, 2),
            wc AS (
              SELECT g, val, n,
                     SUM(n) OVER (PARTITION BY g ORDER BY val) AS cumn,
                     SUM(n) OVER (PARTITION BY g) AS tot
              FROM wh
            ),
            wcut AS (
              SELECT g,
                     MIN(CASE WHEN cumn >= GREATEST(
                           1, (tot * 10 + 999) // 1000)
                         THEN val END) AS lo_cut,
                     MIN(CASE WHEN cumn >= GREATEST(
                           1, (tot * 990 + 999) // 1000)
                         THEN val END) AS hi_cut
              FROM wc GROUP BY g
            )
            SELECT c.g AS o_orderpriority,
                   CAST(SUM(n) AS BIGINT) AS n,
                   MIN(lo_cut) AS lo_cut, MIN(hi_cut) AS hi_cut,
                   CAST(SUM(CASE WHEN val < lo_cut THEN n ELSE 0 END)
                        AS BIGINT) AS n_clipped_low,
                   CAST(SUM(CASE WHEN val > hi_cut THEN n ELSE 0 END)
                        AS BIGINT) AS n_clipped_high,
                   CAST(SUM(CAST(GREATEST(lo_cut, LEAST(hi_cut, val))
                                 AS DECIMAL(25,2))
                            * CAST(n AS DECIMAL(10,0))) * 100
                        AS BIGINT) AS winsorized_sum_cents
            FROM wc c JOIN wcut USING (g) GROUP BY c.g
        """,
        "l_diversity_customers": """
            WITH ld AS (
              SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
                     COUNT(DISTINCT (c_acctbal < 0)) AS ndist
              FROM customer GROUP BY 1, 2
            )
            SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(MIN(ndist) AS BIGINT) AS min_diversity,
                   CAST(SUM(CASE WHEN ndist < 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_groups_below_l,
                   CAST(SUM(CASE WHEN ndist < 2 THEN n ELSE 0 END)
                        AS BIGINT) AS n_rows_below_l,
                   CAST(SUM(CASE WHEN ndist < 2 THEN n ELSE 0 END)
                        * 1000 // SUM(n) AS INT) AS below_l_permille
            FROM ld
        """,
        # Integer-day gaps via lag per customer; per-segment type-1
        # median/p90 over the (segment, gap) histogram — identical
        # ceil-rank arithmetic to the engine.
        "reorder_gaps": """
            WITH ro AS (
              SELECT o_custkey, o_orderdate, o_orderkey, c_mktsegment
              FROM orders JOIN customer ON c_custkey = o_custkey
            ),
            rg AS (
              SELECT c_mktsegment AS g, gap FROM (
                SELECT c_mktsegment,
                       datediff('day',
                         LAG(o_orderdate) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap
                FROM ro)
              WHERE gap IS NOT NULL
            ),
            rh AS (SELECT g, gap, COUNT(*) AS n FROM rg GROUP BY 1, 2),
            rc AS (
              SELECT g, gap, n,
                     SUM(n) OVER (PARTITION BY g ORDER BY gap) AS cumn,
                     SUM(n) OVER (PARTITION BY g) AS tot
              FROM rh
            )
            SELECT g AS c_mktsegment,
                   CAST(MAX(tot) AS BIGINT) AS n_gaps,
                   CAST(MIN(gap) AS BIGINT) AS min_gap_days,
                   CAST(MIN(CASE WHEN cumn >= (tot * 500 + 999) // 1000
                            THEN gap END) AS BIGINT) AS median_gap_days,
                   CAST(MIN(CASE WHEN cumn >= (tot * 900 + 999) // 1000
                            THEN gap END) AS BIGINT) AS p90_gap_days,
                   CAST(MAX(gap) AS BIGINT) AS max_gap_days
            FROM rc GROUP BY g ORDER BY g
        """,
        # A^l walk counts by value (never path enumeration): w1 = deg,
        # w_l = sym ⋈ w_{l-1} summed — the engine's exact recurrence;
        # katz_nano = w1*10^6 + w2*10^3 + w3 (beta = 1/1000).
        "katz_parts": """
            WITH kz_e AS MATERIALIZED (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            kz_sym AS MATERIALIZED (
              SELECT a, b FROM kz_e
              UNION ALL SELECT b AS a, a AS b FROM kz_e
            ),
            kz_nodes AS (SELECT DISTINCT a AS id FROM kz_sym),
            kz_w1 AS MATERIALIZED (
              SELECT b AS id, COUNT(*) AS x FROM kz_sym GROUP BY b
            ),
            kz_w2 AS MATERIALIZED (
              SELECT s.b AS id, SUM(w.x) AS x
              FROM kz_sym s JOIN kz_w1 w ON w.id = s.a GROUP BY s.b
            ),
            kz_w3 AS MATERIALIZED (
              SELECT s.b AS id, SUM(w.x) AS x
              FROM kz_sym s JOIN kz_w2 w ON w.id = s.a GROUP BY s.b
            )
            SELECT n.id,
                   CAST(COALESCE(w1.x, 0) AS BIGINT) AS walks_1,
                   CAST(COALESCE(w2.x, 0) AS BIGINT) AS walks_2,
                   CAST(COALESCE(w3.x, 0) AS BIGINT) AS walks_3,
                   CAST(COALESCE(w1.x, 0) * 1000000
                        + COALESCE(w2.x, 0) * 1000
                        + COALESCE(w3.x, 0) AS BIGINT) AS katz_nano
            FROM kz_nodes n
            LEFT JOIN kz_w1 w1 ON w1.id = n.id
            LEFT JOIN kz_w2 w2 ON w2.id = n.id
            LEFT JOIN kz_w3 w3 ON w3.id = n.id
            ORDER BY katz_nano DESC, n.id LIMIT 20
        """,
        "brand_mixing_parts": """
            WITH bm_e AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            )
            SELECT LEAST(pa.p_brand, pb.p_brand) AS cat_lo,
                   GREATEST(pa.p_brand, pb.p_brand) AS cat_hi,
                   CAST(COUNT(*) AS BIGINT) AS n_edges,
                   LEAST(pa.p_brand, pb.p_brand)
                     = GREATEST(pa.p_brand, pb.p_brand)
                     AS same_category
            FROM bm_e e
            JOIN part pa ON pa.p_partkey = e.a
            JOIN part pb ON pb.p_partkey = e.b
            GROUP BY 1, 2
        """,
        # top-40 trade corridors -> 5-doubling closure -> mutual meet
        # -> condensation join: original corridors counted between
        # DISTINCT SCCs (mutual-trade blocs).
        "scc_condensation_trade": """
            WITH te AS MATERIALIZED (
              SELECT a, b FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            tc0 AS MATERIALIZED (SELECT a, b FROM te),
            tc1 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc0
                UNION ALL
                SELECT x.a, y.b FROM tc0 x JOIN tc0 y ON x.b = y.a)
            ),
            tc2 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc1
                UNION ALL
                SELECT x.a, y.b FROM tc1 x JOIN tc1 y ON x.b = y.a)
            ),
            tc3 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc2
                UNION ALL
                SELECT x.a, y.b FROM tc2 x JOIN tc2 y ON x.b = y.a)
            ),
            tc4 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc3
                UNION ALL
                SELECT x.a, y.b FROM tc3 x JOIN tc3 y ON x.b = y.a)
            ),
            tc5 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc4
                UNION ALL
                SELECT x.a, y.b FROM tc4 x JOIN tc4 y ON x.b = y.a)
            ),
            sc_nodes AS (
              SELECT DISTINCT a AS id FROM te
              UNION SELECT DISTINCT b FROM te
            ),
            sc_mut AS (
              SELECT f.a AS id, f.b AS peer
              FROM tc5 f JOIN tc5 g ON f.a = g.b AND f.b = g.a
            ),
            sc_s AS (
              SELECT n.id,
                     LEAST(n.id, COALESCE(MIN(m.peer), n.id)) AS scc
              FROM sc_nodes n LEFT JOIN sc_mut m ON m.id = n.id
              GROUP BY n.id
            )
            SELECT sa.scc AS scc_a, sb.scc AS scc_b,
                   CAST(COUNT(*) AS BIGINT) AS n_edges
            FROM te e
            JOIN sc_s sa ON sa.id = e.a
            JOIN sc_s sb ON sb.id = e.b
            WHERE sa.scc <> sb.scc
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # The oracle ASSERTS 100% LSH recall (missed = 0): the exact
        # truth side is recomputed here; if the banded pipeline ever
        # misses a true pair on this corpus, the engine's missed_pairs
        # goes nonzero and this hash mismatches — recall is tested,
        # not assumed. Same md5-ranked deterministic sample.
        "dedup_recall_eval": f"""
            WITH re_samp AS MATERIALIZED (
              SELECT doc_id, text FROM documents
              ORDER BY (md5_number_upper(CAST(doc_id AS VARCHAR))
                        & 9223372036854775807), doc_id
              LIMIT 1500
            ),
            re_t AS MATERIALIZED (
              SELECT doc_id, list_distinct({_TOK}) AS toks FROM re_samp
            ),
            re_tp AS (
              SELECT COUNT(*) AS true_pairs
              FROM re_t a JOIN re_t b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) >= 0.9
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM re_samp)
                     AS n_docs,
                   CAST(true_pairs AS BIGINT) AS true_pairs,
                   CAST(true_pairs AS BIGINT) AS lsh_pairs,
                   CAST(0 AS BIGINT) AS missed_pairs,
                   CAST(1000 AS INT) AS recall_permille
            FROM re_tp
        """,
        # keep-family closure over ALL docs reduced to the component
        # size histogram (collapse-on-reps in the engine is component-
        # preserving — identical texts are J=1 pairs here).
        "dedup_cluster_stats": f"""
            WITH RECURSIVE
            cs_t AS MATERIALIZED (
              SELECT doc_id, list_distinct({_TOK}) AS toks
              FROM documents
            ),
            cs_pairs AS MATERIALIZED (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM cs_t a JOIN cs_t b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) >= 0.9
            ),
            cs_sym AS MATERIALIZED (
              SELECT a, b FROM cs_pairs
              UNION ALL SELECT b AS a, a AS b FROM cs_pairs
            ),
            cs_reach AS (
              SELECT a, b FROM cs_sym
              UNION
              SELECT r.a, s.b FROM cs_reach r JOIN cs_sym s ON r.b = s.a
              WHERE s.b <> r.a
            ),
            cs_comp AS (
              SELECT d.doc_id,
                     LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id))
                       AS component
              FROM cs_t d LEFT JOIN cs_reach r ON r.a = d.doc_id
              GROUP BY d.doc_id
            ),
            cs_sizes AS (
              SELECT component, COUNT(*) AS cs FROM cs_comp
              GROUP BY component
            )
            SELECT CAST(cs AS BIGINT) AS cluster_size,
                   CAST(COUNT(*) AS BIGINT) AS n_clusters,
                   CAST(cs * COUNT(*) AS BIGINT) AS n_docs
            FROM cs_sizes GROUP BY cs ORDER BY cs
        """,
        # Keep-family closure: survivor = component id (the min-id
        # propagation label IS the minimum member); every other doc is
        # one manifest row.
        "dedup_manifest": f"""
            WITH RECURSIVE
            dm_t AS MATERIALIZED (
              SELECT doc_id, list_distinct({_TOK}) AS toks
              FROM documents
            ),
            dm_pairs AS MATERIALIZED (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM dm_t a JOIN dm_t b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
                    / (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) >= 0.9
            ),
            dm_sym AS MATERIALIZED (
              SELECT a, b FROM dm_pairs
              UNION ALL SELECT b AS a, a AS b FROM dm_pairs
            ),
            dm_reach AS (
              SELECT a, b FROM dm_sym
              UNION
              SELECT r.a, s.b FROM dm_reach r JOIN dm_sym s ON r.b = s.a
              WHERE s.b <> r.a
            ),
            dm_comp AS (
              SELECT d.doc_id,
                     LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id))
                       AS component
              FROM dm_t d LEFT JOIN dm_reach r ON r.a = d.doc_id
              GROUP BY d.doc_id
            )
            SELECT component AS survivor_id, doc_id AS removed_id
            FROM dm_comp WHERE doc_id <> component
        """,
        # Identical histogram-cumsum + interior ceil division as the
        # engine; window ties impossible (one row per distinct length
        # per source).
        "source_concentration": f"""
            WITH sc_t AS (
              SELECT source AS src, len({_TOK}) AS tok FROM documents
            ),
            sc_h AS (
              SELECT src, tok, COUNT(*) AS n FROM sc_t GROUP BY 1, 2
            ),
            sc_c AS (
              SELECT src, tok, n, tok * n AS mass,
                     SUM(tok * n) OVER (PARTITION BY src
                                        ORDER BY tok DESC) AS cum,
                     SUM(n) OVER (PARTITION BY src
                                  ORDER BY tok DESC) AS cumd,
                     SUM(tok * n) OVER (PARTITION BY src) AS tot,
                     SUM(n) OVER (PARTITION BY src) AS totd,
                     MAX(tok) OVER (PARTITION BY src) AS mx
              FROM sc_h
            )
            SELECT src AS source,
                   CAST(totd AS BIGINT) AS n_docs,
                   CAST(tot AS BIGINT) AS total_tokens,
                   CAST(cumd - n
                        + ((tot * 800 + 999) // 1000 - (cum - mass)
                           + tok - 1) // tok AS BIGINT)
                     AS docs_to_target,
                   CAST(mx * 1000 // tot AS INT)
                     AS top_doc_share_permille
            FROM sc_c
            WHERE cum >= (tot * 800 + 999) // 1000
              AND cum - mass < (tot * 800 + 999) // 1000
            UNION ALL
            -- all-zero-token source: no crossing bucket exists (cum -
            -- mass < 0 is never true at tot = 0); mirror the engine's
            -- explicit tot=0 branch (ADVICE r8)
            SELECT src AS source,
                   CAST(MAX(totd) AS BIGINT) AS n_docs,
                   CAST(MAX(tot) AS BIGINT) AS total_tokens,
                   CAST(0 AS BIGINT) AS docs_to_target,
                   CAST(0 AS INT) AS top_doc_share_permille
            FROM sc_c GROUP BY src HAVING MAX(tot) = 0
            ORDER BY source
        """,
        # Trade corridors -> closure -> SCC labels -> bow-tie classes.
        # (IN ∩ OUT outside the core is impossible — mutual
        # reachability with the core is core membership — so the CASE
        # order is safe.)
        "bowtie_trade": """
            WITH te AS MATERIALIZED (
              SELECT a, b FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            tc0 AS MATERIALIZED (SELECT a, b FROM te),
            tc1 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc0
                UNION ALL
                SELECT x.a, y.b FROM tc0 x JOIN tc0 y ON x.b = y.a)
            ),
            tc2 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc1
                UNION ALL
                SELECT x.a, y.b FROM tc1 x JOIN tc1 y ON x.b = y.a)
            ),
            tc3 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc2
                UNION ALL
                SELECT x.a, y.b FROM tc2 x JOIN tc2 y ON x.b = y.a)
            ),
            tc4 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc3
                UNION ALL
                SELECT x.a, y.b FROM tc3 x JOIN tc3 y ON x.b = y.a)
            ),
            tc5 AS MATERIALIZED (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM tc4
                UNION ALL
                SELECT x.a, y.b FROM tc4 x JOIN tc4 y ON x.b = y.a)
            ),
            bt_nodes AS (
              SELECT DISTINCT a AS id FROM te
              UNION SELECT DISTINCT b FROM te
            ),
            bt_mut AS (
              SELECT f.a AS id, f.b AS peer
              FROM tc5 f JOIN tc5 g ON f.a = g.b AND f.b = g.a
            ),
            bt_s AS (
              SELECT n.id,
                     LEAST(n.id, COALESCE(MIN(m.peer), n.id)) AS scc
              FROM bt_nodes n LEFT JOIN bt_mut m ON m.id = n.id
              GROUP BY n.id
            ),
            bt_core AS (
              SELECT scc FROM (
                SELECT scc, COUNT(*) AS cnt FROM bt_s GROUP BY scc
              ) ORDER BY cnt DESC, scc LIMIT 1
            ),
            bt_corem AS (
              SELECT id FROM bt_s
              WHERE scc = (SELECT scc FROM bt_core)
            ),
            bt_in AS (
              SELECT DISTINCT t.a AS id FROM tc5 t
              WHERE t.b IN (SELECT id FROM bt_corem)
            ),
            bt_out AS (
              SELECT DISTINCT t.b AS id FROM tc5 t
              WHERE t.a IN (SELECT id FROM bt_corem)
            )
            SELECT s.id, s.scc,
                   CASE
                     WHEN s.id IN (SELECT id FROM bt_corem) THEN 'CORE'
                     WHEN s.id IN (SELECT id FROM bt_in) THEN 'IN'
                     WHEN s.id IN (SELECT id FROM bt_out) THEN 'OUT'
                     ELSE 'OTHER'
                   END AS bowtie_class
            FROM bt_s s ORDER BY s.id
        """,
        # Same integer-div tiles, same id tiebreaks, same DECIMAL
        # monetary sums, same max-date recency anchor.
        "rfm_quintiles": """
            WITH rf_pc AS (
              SELECT o_custkey AS customer,
                     MAX(o_orderdate) AS last_o,
                     COUNT(*) AS freq,
                     SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS mon
              FROM orders GROUP BY 1
            ),
            rf_b AS (
              SELECT customer,
                     datediff('day', last_o,
                              (SELECT MAX(last_o) FROM rf_pc)) AS rec,
                     freq, mon
              FROM rf_pc
            ),
            rf_r AS (
              SELECT customer,
                     ROW_NUMBER() OVER (ORDER BY rec ASC, customer)
                       AS rr,
                     ROW_NUMBER() OVER (ORDER BY freq DESC, customer)
                       AS rf,
                     ROW_NUMBER() OVER (ORDER BY mon DESC, customer)
                       AS rm,
                     COUNT(*) OVER () AS cnt
              FROM rf_b
            )
            SELECT CAST((rr - 1) * 5 // cnt + 1 AS INT) AS r_tile,
                   CAST((rf - 1) * 5 // cnt + 1 AS INT) AS f_tile,
                   CAST((rm - 1) * 5 // cnt + 1 AS INT) AS m_tile,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM rf_r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "pq_codes": _pq_oracle(m=4, k=16, n_iter=2, final="codes"),
        "pq_topk": _pq_oracle(
            m=4, k=16, n_iter=2, final="topk", nq=5, topk=10
        ),
        # ARI off the shared unrolled kmeans: contingency + margins as
        # appended CTEs; pair sums via the integer C(n,2) identity;
        # the one float mirrors the engine's association exactly.
        "kmeans_ari": _kmeans_oracle(
            k=8,
            n_iter=3,
            final_sql="""
            , ar_ct AS (
              SELECT a.c, e.label, COUNT(*) AS n
              FROM ka3 a JOIN embeddings e ON e.vec_id = a.vec_id
              GROUP BY 1, 2
            ),
            ar_rm AS (SELECT c, SUM(n) AS n FROM ar_ct GROUP BY c),
            ar_cm AS (
              SELECT label, SUM(n) AS n FROM ar_ct GROUP BY label
            ),
            ar_s AS (
              SELECT
                (SELECT SUM(n) FROM ar_ct) AS n,
                (SELECT COUNT(DISTINCT c) FROM ar_ct) AS nc,
                (SELECT COUNT(DISTINCT label) FROM ar_ct) AS nl,
                (SELECT SUM(n * (n - 1) // 2) FROM ar_ct) AS scc,
                (SELECT SUM(n * (n - 1) // 2) FROM ar_rm) AS srm,
                (SELECT SUM(n * (n - 1) // 2) FROM ar_cm) AS scm
            )
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(nc AS BIGINT) AS n_clusters,
                   CAST(nl AS BIGINT) AS n_labels,
                   CAST(scc AS BIGINT) AS sum_comb_cells,
                   CAST(srm AS BIGINT) AS sum_comb_clusters,
                   CAST(scm AS BIGINT) AS sum_comb_labels,
                   ROUND(
                     CASE WHEN (CAST(srm AS DOUBLE) + CAST(scm AS DOUBLE))
                               / 2.0
                            <> CAST(srm AS DOUBLE) * CAST(scm AS DOUBLE)
                               / CAST(n * (n - 1) // 2 AS DOUBLE)
                     THEN
                     (CAST(scc AS DOUBLE)
                      - CAST(srm AS DOUBLE) * CAST(scm AS DOUBLE)
                        / CAST(n * (n - 1) // 2 AS DOUBLE))
                     / ((CAST(srm AS DOUBLE) + CAST(scm AS DOUBLE))
                        / 2.0
                        - CAST(srm AS DOUBLE) * CAST(scm AS DOUBLE)
                          / CAST(n * (n - 1) // 2 AS DOUBLE))
                     ELSE 1.0 END, 6)
                     AS ari
            FROM ar_s
            """,
        ),
        # 0-based dim_idx (engine posexplode) = 1-based pos - 1; same
        # grid quantization and histogram lower-median ranks.
        "embedding_dim_profile": """
            WITH ed_v AS (
              SELECT list_transform(embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS v
              FROM embeddings
            ),
            ed_e AS (
              SELECT pos - 1 AS dim_idx, v[pos] AS val FROM (
                SELECT v, unnest(range(1, len(v) + 1)) AS pos FROM ed_v
              )
            ),
            ed_h AS (
              SELECT dim_idx, val, COUNT(*) AS n
              FROM ed_e GROUP BY 1, 2
            ),
            ed_c AS (
              SELECT dim_idx, val, n,
                     SUM(n) OVER (PARTITION BY dim_idx
                                  ORDER BY val) AS cum,
                     SUM(n) OVER (PARTITION BY dim_idx) AS tot
              FROM ed_h
            )
            SELECT dim_idx,
                   CAST(MIN(val) AS BIGINT) AS min_q,
                   CAST(MAX(val) AS BIGINT) AS max_q,
                   CAST(MIN(CASE WHEN cum >= (tot * 500 + 999) // 1000
                            THEN val END) AS BIGINT) AS median_q,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(CASE WHEN val = 0 THEN n ELSE 0 END)
                        AS BIGINT) AS n_zero
            FROM ed_c GROUP BY dim_idx ORDER BY dim_idx
        """,
        # Exact int64 grid distances (the kmeans_quantized exactness
        # argument), label-filtered before the rank.
        "hard_negatives": """
            WITH hn_all AS MATERIALIZED (
              SELECT vec_id, label,
                     list_transform(embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS v
              FROM embeddings
            ),
            hn_q AS (
              SELECT * FROM hn_all ORDER BY vec_id LIMIT 5
            )
            SELECT query_id, neighbor_id, rank, d2, neighbor_label
            FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     c.label AS neighbor_label,
                     CAST(list_dot_product(q.v, q.v)
                          + list_dot_product(c.v, c.v)
                          - 2 * list_dot_product(q.v, c.v)
                          AS BIGINT) AS d2,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.v, q.v)
                                + list_dot_product(c.v, c.v)
                                - 2 * list_dot_product(q.v, c.v),
                                c.vec_id) AS rank
              FROM hn_q q JOIN hn_all c ON c.label <> q.label
            ) WHERE rank <= 5
        """,
        # stream==batch equivalence: per-doc matches are independent of
        # batch boundaries, so the accumulated stream output equals the
        # one-shot cross dedup — dedup_incremental's oracle verbatim.
        "streaming_dedup_ingest": f"""
            WITH t AS MATERIALIZED (
              SELECT doc_id, list_distinct({_TOK}) AS toks FROM documents
            ),
            nw AS (SELECT * FROM t WHERE doc_id % 10 >= 8),
            bs AS (SELECT * FROM t WHERE doc_id % 10 < 8)
            SELECT n.doc_id AS new_id, b.doc_id AS base_id,
                   len(list_intersect(n.toks, b.toks))::DOUBLE
                   / (len(n.toks) + len(b.toks)
                      - len(list_intersect(n.toks, b.toks)))
                     AS jaccard_sim
            FROM nw n JOIN bs b
              ON len(list_intersect(n.toks, b.toks))::DOUBLE
                 / (len(n.toks) + len(b.toks)
                    - len(list_intersect(n.toks, b.toks))) >= 0.9
        """,
        # Sorted-rank Gini identity over the value histogram; HUGEINT
        # intermediates cast to BIGINT before hashing; the one float
        # division mirrors the engine's association.
        "gini_order_values": """
            WITH gv AS (
              SELECT o_orderpriority AS g,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
              FROM orders
            ),
            gh AS (SELECT g, v, COUNT(*) AS c FROM gv GROUP BY 1, 2),
            gc AS (
              SELECT g, v, c,
                     SUM(c) OVER (PARTITION BY g ORDER BY v) - c AS p
              FROM gh
            ),
            ga AS (
              SELECT g, SUM(c) AS n, SUM(v * c) AS total,
                     SUM(v * (c * p + c * (c + 1) // 2)) AS s
              FROM gc GROUP BY g
            )
            SELECT g AS o_orderpriority,
                   CAST(n AS BIGINT) AS n,
                   CAST(total AS BIGINT) AS total,
                   CAST(2 * s - (n + 1) * total AS BIGINT)
                     AS gini_numerator,
                   ROUND(CAST(2 * s - (n + 1) * total AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)),
                         6) AS gini
            FROM ga ORDER BY g
        """,
        # Exact DECIMAL reconciliation; orders with no lines counted
        # separately (LEFT join), never as silent matches.
        "order_reconciliation": """
            WITH rc_calc AS (
              SELECT l_orderkey AS o_orderkey,
                     SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(5,2)))
                         * (1 + CAST(l_tax AS DECIMAL(5,2)))) AS calc
              FROM lineitem GROUP BY 1
            ),
            rc_j AS (
              SELECT o.o_orderpriority AS g,
                     CAST(o.o_totalprice AS DECIMAL(18,2)) AS amt,
                     c.calc
              FROM orders o LEFT JOIN rc_calc c USING (o_orderkey)
            )
            SELECT g AS o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_parents,
                   CAST(SUM(CASE WHEN calc IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_no_children,
                   CAST(SUM(CASE WHEN calc IS NOT NULL
                                  AND ABS(amt - calc)
                                      <= CAST('0.00' AS DECIMAL(18,6))
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
                   CAST(SUM(CASE WHEN calc IS NOT NULL
                                  AND ABS(amt - calc)
                                      > CAST('0.00' AS DECIMAL(18,6))
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_mismatch,
                   CAST(MAX(CASE WHEN calc IS NOT NULL
                       THEN CAST(ABS(amt - calc) * 1000000 AS BIGINT)
                       END) AS BIGINT) AS max_abs_diff_micros,
                   CAST(SUM(CASE WHEN calc IS NOT NULL
                       THEN CAST(ABS(amt - calc) * 1000000 AS BIGINT)
                       END) AS BIGINT) AS sum_abs_diff_micros
            FROM rc_j GROUP BY g ORDER BY g
        """,
        # Exact int64 grid kNN (ROW_NUMBER over d2 with id ties) +
        # integer-div ppm — mirrors the engine's lexsort exactly.
        "label_noise_knn": """
            WITH lnq AS MATERIALIZED (
              SELECT vec_id, label,
                     list_transform(embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS v
              FROM embeddings
            ),
            lnr AS (
              SELECT vec_id, label, blabel FROM (
                SELECT a.vec_id, a.label, b.label AS blabel,
                       ROW_NUMBER() OVER (
                         PARTITION BY a.vec_id
                         ORDER BY list_dot_product(a.v, a.v)
                                  + list_dot_product(b.v, b.v)
                                  - 2 * list_dot_product(a.v, b.v),
                                  b.vec_id) AS rn
                FROM lnq a JOIN lnq b ON b.vec_id <> a.vec_id
              ) WHERE rn <= 10
            ),
            lnn AS (
              SELECT vec_id, label,
                     SUM(CASE WHEN blabel <> label THEN 1 ELSE 0 END)
                       AS nd
              FROM lnr GROUP BY 1, 2
            )
            SELECT label,
                   CAST(COUNT(*) AS BIGINT) AS n_vectors,
                   CAST(10 AS INT) AS k,
                   CAST(SUM(nd) AS BIGINT) AS n_disagree,
                   CAST(SUM(nd) * 1000000 // (COUNT(*) * 10)
                        AS BIGINT) AS disagree_ppm
            FROM lnn GROUP BY label ORDER BY label
        """,
        # md5-ranked running token sum per source; RANGE==ROWS here
        # (hash+id order is tie-free).
        "budget_trim_docs": f"""
            SELECT doc_id, text, lang, source, n_chars,
                   tok AS _tokens, cum AS _cum_tokens
            FROM (
              SELECT doc_id, text, lang, source, n_chars, tok,
                     CAST(SUM(tok) OVER (
                       PARTITION BY source
                       ORDER BY (md5_number_upper(
                                   CAST(doc_id AS VARCHAR))
                                 & 9223372036854775807), doc_id)
                       AS BIGINT) AS cum
              FROM (
                SELECT doc_id, text, lang, source, n_chars,
                       CAST(len({_TOK}) AS BIGINT) AS tok
                FROM documents
              )
            ) WHERE cum <= 300
        """,
        # HyperANF registers + integer estimator — same md5 register
        # hash, same BIGINT harmonic division, same baked linear-
        # counting lookup (module constants _HLL_ALPHA_NUM /
        # _HLL_LC_CASE, imported from the operator) — bit-identical.
        "hyperanf_trade": f"""
            WITH te AS MATERIALIZED (
              SELECT a, b FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            und AS MATERIALIZED (
              SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b
              FROM te WHERE a <> b
            ),
            hsym AS MATERIALIZED (
              SELECT a, b FROM und UNION ALL SELECT b, a FROM und
            ),
            h0 AS MATERIALIZED (
              SELECT v,
                     CAST((md5_number_upper('reg:' || CAST(v AS VARCHAR))
                           & 9223372036854775807) AS BIGINT) % 16 AS j,
                     LEAST(bit_count((w & -w) - 1) + 1, 32) AS reg
              FROM (SELECT DISTINCT a AS v,
                           CAST((md5_number_upper(
                                   'rho:' || CAST(a AS VARCHAR))
                                 & 9223372036854775807) AS BIGINT) AS w
                    FROM hsym)
            ),
            h1 AS MATERIALIZED (
              SELECT v, j, MAX(reg) AS reg FROM (
                SELECT v, j, reg FROM h0
                UNION ALL
                SELECT hsym.b AS v, h0.j, h0.reg
                FROM h0 JOIN hsym ON hsym.a = h0.v
              ) GROUP BY 1, 2
            ),
            h2 AS MATERIALIZED (
              SELECT v, j, MAX(reg) AS reg FROM (
                SELECT v, j, reg FROM h1
                UNION ALL
                SELECT hsym.b AS v, h1.j, h1.reg
                FROM h1 JOIN hsym ON hsym.a = h1.v
              ) GROUP BY 1, 2
            ),
            h3 AS MATERIALIZED (
              SELECT v, j, MAX(reg) AS reg FROM (
                SELECT v, j, reg FROM h2
                UNION ALL
                SELECT hsym.b AS v, h2.j, h2.reg
                FROM h2 JOIN hsym ON hsym.a = h2.v
              ) GROUP BY 1, 2
            ),
            hall AS (
              SELECT 0 AS r, v, j, reg FROM h0
              UNION ALL SELECT 1, v, j, reg FROM h1
              UNION ALL SELECT 2, v, j, reg FROM h2
              UNION ALL SELECT 3, v, j, reg FROM h3
            ),
            hnode AS (
              SELECT r, v, SUM(reg) AS sumreg, COUNT(*) AS occ,
                     SUM(CAST(1 AS BIGINT) << (32 - reg))
                     + (16 - COUNT(*)) * (CAST(1 AS BIGINT) << 32)
                       AS denom
              FROM hall GROUP BY 1, 2
            ),
            hest AS (
              SELECT r, v, sumreg,
                     CASE WHEN ({_HLL_ALPHA_NUM} // denom) <= 40000
                               AND occ < 16
                          THEN {_HLL_LC_CASE}
                          ELSE {_HLL_ALPHA_NUM} // denom END AS est
              FROM hnode
            )
            SELECT CAST(r AS INT) AS r,
                   CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(sumreg) AS BIGINT) AS sum_registers,
                   CAST(SUM(est) AS BIGINT) AS est_pairs_milli
            FROM hest GROUP BY r ORDER BY r
        """,
        # Same ANF recursion as neighborhood_function_trade unrolled
        # to radius 6, then the identical BIGINT ppm interpolation.
        "effective_diameter_trade": """
            WITH te AS MATERIALIZED (
              SELECT a, b FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            und AS MATERIALIZED (
              SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b
              FROM te WHERE a <> b
            ),
            esym AS MATERIALIZED (
              SELECT a, b FROM und UNION ALL SELECT b, a FROM und
            ),
            nv0 AS MATERIALIZED (
              SELECT DISTINCT a AS src, a AS dst FROM esym
            ),
            nv1 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv0
                UNION ALL
                SELECT nv0.src, esym.b FROM nv0
                JOIN esym ON esym.a = nv0.dst)
            ),
            nv2 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv1
                UNION ALL
                SELECT nv1.src, esym.b FROM nv1
                JOIN esym ON esym.a = nv1.dst)
            ),
            nv3 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv2
                UNION ALL
                SELECT nv2.src, esym.b FROM nv2
                JOIN esym ON esym.a = nv2.dst)
            ),
            nv4 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv3
                UNION ALL
                SELECT nv3.src, esym.b FROM nv3
                JOIN esym ON esym.a = nv3.dst)
            ),
            nv5 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv4
                UNION ALL
                SELECT nv4.src, esym.b FROM nv4
                JOIN esym ON esym.a = nv4.dst)
            ),
            nv6 AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM nv5
                UNION ALL
                SELECT nv5.src, esym.b FROM nv5
                JOIN esym ON esym.a = nv5.dst)
            ),
            nc AS (
              SELECT 0 AS r, (SELECT COUNT(*) FROM nv0) AS n
              UNION ALL SELECT 1, (SELECT COUNT(*) FROM nv1)
              UNION ALL SELECT 2, (SELECT COUNT(*) FROM nv2)
              UNION ALL SELECT 3, (SELECT COUNT(*) FROM nv3)
              UNION ALL SELECT 4, (SELECT COUNT(*) FROM nv4)
              UNION ALL SELECT 5, (SELECT COUNT(*) FROM nv5)
              UNION ALL SELECT 6, (SELECT COUNT(*) FROM nv6)
            ),
            ng AS (
              SELECT r, n,
                     n - COALESCE(LAG(n) OVER (ORDER BY r), 0) AS gr
              FROM nc
            ),
            nmx AS (
              SELECT MAX(n) AS nmax,
                     MIN(CASE WHEN r = 0 THEN n END) AS nnodes,
                     MAX(CASE WHEN gr > 0 THEN r END) AS rlast,
                     MAX(r) AS rcap
              FROM ng
            ),
            hit AS (
              SELECT nc.r AS r, nc.n AS n, COALESCE(p.n, 0) AS prev
              FROM nc LEFT JOIN nc p ON p.r = nc.r - 1, nmx
              WHERE nc.n * 1000000 >= nmx.nmax * 900000
              ORDER BY nc.r LIMIT 1
            )
            SELECT CAST(nmx.nnodes AS BIGINT) AS n_nodes,
                   CAST(nmx.nmax AS BIGINT) AS n_pairs_max,
                   (nmx.rlast < nmx.rcap) AS diameter_reached,
                   CAST(CASE WHEN hit.r = 0 THEN 0
                        ELSE (hit.r - 1) * 1000000
                             + (nmx.nmax * 900000
                                - hit.prev * 1000000)
                               // (hit.n - hit.prev)
                        END AS BIGINT) AS effective_diameter_ppm
            FROM hit, nmx
        """,
        # Same md5-shuffled within-label ROW_NUMBER, same modulo folds.
        "stratified_kfold_embeddings": """
            WITH kf AS (
              SELECT label, vec_id,
                     (ROW_NUMBER() OVER (
                        PARTITION BY label ORDER BY
                          CAST((md5_number_upper(
                                  CAST(label AS VARCHAR) || ':'
                                  || CAST(vec_id AS VARCHAR))
                                & 9223372036854775807) AS BIGINT),
                          vec_id) - 1) % 5 AS fold
              FROM embeddings
            )
            SELECT label, CAST(fold AS INT) AS fold,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(vec_id) AS BIGINT) AS vec_checksum
            FROM kf GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Same discrete lower medians ((n+1) div 2 under (value, id)),
        # same exact integer micro-units and ppm division.
        "mad_outliers_events": """
            WITH mb AS (
              SELECT event_type AS g,
                     CAST(FLOOR(value * 1000000) AS BIGINT) AS v,
                     event_id AS id
              FROM events
            ),
            mr AS (
              SELECT g, v,
                     ROW_NUMBER() OVER (PARTITION BY g
                                        ORDER BY v, id) AS rn,
                     COUNT(*) OVER (PARTITION BY g) AS n
              FROM mb
            ),
            mm AS (
              SELECT g, v AS med, n FROM mr WHERE rn = (n + 1) // 2
            ),
            md AS (
              SELECT mb.g, ABS(mb.v - mm.med) AS dv, mb.id
              FROM mb JOIN mm USING (g)
            ),
            mr2 AS (
              SELECT g, dv,
                     ROW_NUMBER() OVER (PARTITION BY g
                                        ORDER BY dv, id) AS rn,
                     COUNT(*) OVER (PARTITION BY g) AS n
              FROM md
            ),
            mmad AS (
              SELECT g, dv AS mad FROM mr2 WHERE rn = (n + 1) // 2
            ),
            mout AS (
              SELECT mb.g,
                     SUM(CASE WHEN ABS(mb.v - mm.med) > 3 * mmad.mad
                              THEN 1 ELSE 0 END) AS nout
              FROM mb JOIN mm USING (g) JOIN mmad USING (g)
              GROUP BY 1
            )
            SELECT mm.g AS event_type,
                   CAST(mm.n AS BIGINT) AS n,
                   CAST(mm.med AS BIGINT) AS median,
                   CAST(mmad.mad AS BIGINT) AS mad,
                   CAST(mout.nout AS BIGINT) AS n_outliers,
                   CAST(mout.nout * 1000000 // mm.n AS BIGINT)
                     AS outlier_ppm
            FROM mm JOIN mmad USING (g) JOIN mout USING (g)
            ORDER BY 1
        """,
        # Same baked Benford ppm table (module const _BENFORD_CASE),
        # same integer ppm divisions, same (diff, digit) argmax.
        "benford_orders": f"""
            WITH bsrc AS (
              SELECT o_orderpriority AS g,
                     CAST(substr(CAST(CAST(CAST(o_totalprice
                            AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS d
              FROM orders
              WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) > 0
            ),
            bpd AS (SELECT g, d, COUNT(*) AS c FROM bsrc GROUP BY 1, 2),
            bt AS (SELECT g, SUM(c) AS n FROM bpd GROUP BY 1),
            bgrid AS (
              SELECT bt.g, bt.n, gs.d
              FROM bt, (SELECT unnest(range(1, 10)) AS d) gs
            ),
            bfull AS (
              SELECT bgrid.g, bgrid.d AS d, bgrid.n,
                     COALESCE(bpd.c * 1000000 // bgrid.n, 0)
                       - {_BENFORD_CASE} AS diff
              FROM bgrid LEFT JOIN bpd
                ON bpd.g = bgrid.g AND bpd.d = bgrid.d
            )
            SELECT g AS o_orderpriority,
                   CAST(MAX(n) AS BIGINT) AS n,
                   CAST(SUM(ABS(diff)) // 2 AS BIGINT) AS tvd_ppm,
                   CAST(arg_max(d, diff * 4294967296 + d) AS INT)
                     AS worst_digit,
                   CAST(arg_max(diff, diff * 4294967296 + d) AS BIGINT)
                     AS worst_excess_ppm
            FROM bfull GROUP BY g ORDER BY g
        """,
        # Same 3-gram shingle construction (source_overlap idiom), same
        # greedy (count DESC, source) picks unrolled 5 rounds.
        "coverage_curve_docs": f"""
            WITH cvt AS (SELECT source, {_TOK} AS toks FROM documents),
            cv AS MATERIALIZED (
              SELECT DISTINCT source AS g, unnest(
                CASE WHEN len(toks) >= 3 THEN
                  list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [array_to_string(toks, ' ')] END) AS sh
              FROM cvt
            ),
            p1 AS MATERIALIZED (
              SELECT g, COUNT(*) AS c FROM cv
              GROUP BY 1 ORDER BY c DESC, g LIMIT 1
            ),
            c1 AS MATERIALIZED (
              SELECT sh FROM cv WHERE g = (SELECT g FROM p1)
            ),
            r2 AS MATERIALIZED (
              SELECT g, sh FROM cv
              WHERE sh NOT IN (SELECT sh FROM c1)
            ),
            p2 AS MATERIALIZED (
              SELECT g, COUNT(*) AS c FROM r2
              GROUP BY 1 ORDER BY c DESC, g LIMIT 1
            ),
            r3 AS MATERIALIZED (
              SELECT g, sh FROM r2
              WHERE g <> (SELECT g FROM p2)
                AND sh NOT IN (SELECT sh FROM r2
                               WHERE g = (SELECT g FROM p2))
            ),
            p3 AS MATERIALIZED (
              SELECT g, COUNT(*) AS c FROM r3
              GROUP BY 1 ORDER BY c DESC, g LIMIT 1
            ),
            r4 AS MATERIALIZED (
              SELECT g, sh FROM r3
              WHERE g <> (SELECT g FROM p3)
                AND sh NOT IN (SELECT sh FROM r3
                               WHERE g = (SELECT g FROM p3))
            ),
            p4 AS MATERIALIZED (
              SELECT g, COUNT(*) AS c FROM r4
              GROUP BY 1 ORDER BY c DESC, g LIMIT 1
            ),
            r5 AS MATERIALIZED (
              SELECT g, sh FROM r4
              WHERE g <> (SELECT g FROM p4)
                AND sh NOT IN (SELECT sh FROM r4
                               WHERE g = (SELECT g FROM p4))
            ),
            p5 AS MATERIALIZED (
              SELECT g, COUNT(*) AS c FROM r5
              GROUP BY 1 ORDER BY c DESC, g LIMIT 1
            )
            SELECT CAST(1 AS INT) AS round,
                   (SELECT g FROM p1) AS source,
                   CAST((SELECT c FROM p1) AS BIGINT) AS new_tokens,
                   CAST((SELECT c FROM p1) AS BIGINT) AS covered_total
            UNION ALL
            SELECT 2, (SELECT g FROM p2),
                   CAST((SELECT c FROM p2) AS BIGINT),
                   CAST((SELECT c FROM p1) + (SELECT c FROM p2)
                        AS BIGINT)
            UNION ALL
            SELECT 3, (SELECT g FROM p3),
                   CAST((SELECT c FROM p3) AS BIGINT),
                   CAST((SELECT c FROM p1) + (SELECT c FROM p2)
                        + (SELECT c FROM p3) AS BIGINT)
            UNION ALL
            SELECT 4, (SELECT g FROM p4),
                   CAST((SELECT c FROM p4) AS BIGINT),
                   CAST((SELECT c FROM p1) + (SELECT c FROM p2)
                        + (SELECT c FROM p3) + (SELECT c FROM p4)
                        AS BIGINT)
            UNION ALL
            SELECT 5, (SELECT g FROM p5),
                   CAST((SELECT c FROM p5) AS BIGINT),
                   CAST((SELECT c FROM p1) + (SELECT c FROM p2)
                        + (SELECT c FROM p3) + (SELECT c FROM p4)
                        + (SELECT c FROM p5) AS BIGINT)
            ORDER BY round
        """,
        # Same farthest-first rounds: min-dist relaxation unrolled 4
        # deep per round, unreached = 5, (dist DESC, id) argmax.
        "kcenter_trade": """
            WITH te AS MATERIALIZED (
              SELECT a, b FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            und AS MATERIALIZED (
              SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b
              FROM te WHERE a <> b
            ),
            ksym AS MATERIALIZED (
              SELECT a, b FROM und UNION ALL SELECT b, a FROM und
            ),
            kn AS MATERIALIZED (SELECT DISTINCT a FROM ksym),
            b10 AS (SELECT (SELECT MIN(a) FROM kn) AS id, 0 AS d),
            b11 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM b10
              UNION ALL
              SELECT ksym.b, b10.d + 1 FROM b10
              JOIN ksym ON ksym.a = b10.id) GROUP BY 1),
            b12 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM b11
              UNION ALL
              SELECT ksym.b, b11.d + 1 FROM b11
              JOIN ksym ON ksym.a = b11.id) GROUP BY 1),
            b13 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM b12
              UNION ALL
              SELECT ksym.b, b12.d + 1 FROM b12
              JOIN ksym ON ksym.a = b12.id) GROUP BY 1),
            b14 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM b13
              UNION ALL
              SELECT ksym.b, b13.d + 1 FROM b13
              JOIN ksym ON ksym.a = b13.id) GROUP BY 1),
            p2 AS MATERIALIZED (
              SELECT kn.a AS id, COALESCE(b14.d, 5) AS d
              FROM kn LEFT JOIN b14 ON b14.id = kn.a
              ORDER BY d DESC, id LIMIT 1
            ),
            b20 AS (
              SELECT (SELECT MIN(a) FROM kn) AS id, 0 AS d
              UNION ALL
              SELECT id, 0 FROM p2
            ),
            b21 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM b20
              UNION ALL
              SELECT ksym.b, b20.d + 1 FROM b20
              JOIN ksym ON ksym.a = b20.id) GROUP BY 1),
            b22 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM b21
              UNION ALL
              SELECT ksym.b, b21.d + 1 FROM b21
              JOIN ksym ON ksym.a = b21.id) GROUP BY 1),
            b23 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM b22
              UNION ALL
              SELECT ksym.b, b22.d + 1 FROM b22
              JOIN ksym ON ksym.a = b22.id) GROUP BY 1),
            b24 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM b23
              UNION ALL
              SELECT ksym.b, b23.d + 1 FROM b23
              JOIN ksym ON ksym.a = b23.id) GROUP BY 1),
            p3 AS MATERIALIZED (
              SELECT kn.a AS id, COALESCE(b24.d, 5) AS d
              FROM kn LEFT JOIN b24 ON b24.id = kn.a
              ORDER BY d DESC, id LIMIT 1
            )
            SELECT CAST(1 AS INT) AS center_rank,
                   CAST((SELECT MIN(a) FROM kn) AS BIGINT) AS id,
                   CAST(0 AS INT) AS dist
            UNION ALL
            SELECT 2, CAST((SELECT id FROM p2) AS BIGINT),
                   CAST((SELECT d FROM p2) AS INT)
            WHERE (SELECT d FROM p2) > 0
            UNION ALL
            SELECT 3, CAST((SELECT id FROM p3) AS BIGINT),
                   CAST((SELECT d FROM p3) AS INT)
            WHERE (SELECT d FROM p2) > 0 AND (SELECT d FROM p3) > 0
            ORDER BY center_rank
        """,
        # Weighted farthest-first rounds: the same Gonzalez unroll with
        # cost relaxation d + w (Bellman-Ford, exactly 4 supersteps =
        # min cost over <=4-edge paths), undirected MIN-cost edges,
        # unreached = 4*MAX(w)+1, (cost DESC, id) argmax.
        "kcenter_weighted_trade": """
            WITH twe AS MATERIALIZED (
              SELECT a, b, CAST(q * 100 AS BIGINT) AS w FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            wund AS MATERIALIZED (
              SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, MIN(w) AS w
              FROM twe WHERE a <> b GROUP BY 1, 2
            ),
            wsym AS MATERIALIZED (
              SELECT a, b, w FROM wund
              UNION ALL SELECT b, a, w FROM wund
            ),
            wn AS MATERIALIZED (SELECT DISTINCT a FROM wsym),
            wfar AS (SELECT 4 * MAX(w) + 1 AS f FROM wund),
            c10 AS (SELECT (SELECT MIN(a) FROM wn) AS id,
                           CAST(0 AS BIGINT) AS d),
            c11 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM c10
              UNION ALL
              SELECT wsym.b, c10.d + wsym.w FROM c10
              JOIN wsym ON wsym.a = c10.id) GROUP BY 1),
            c12 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM c11
              UNION ALL
              SELECT wsym.b, c11.d + wsym.w FROM c11
              JOIN wsym ON wsym.a = c11.id) GROUP BY 1),
            c13 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM c12
              UNION ALL
              SELECT wsym.b, c12.d + wsym.w FROM c12
              JOIN wsym ON wsym.a = c12.id) GROUP BY 1),
            c14 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM c13
              UNION ALL
              SELECT wsym.b, c13.d + wsym.w FROM c13
              JOIN wsym ON wsym.a = c13.id) GROUP BY 1),
            p2 AS MATERIALIZED (
              SELECT wn.a AS id,
                     COALESCE(c14.d, (SELECT f FROM wfar)) AS d
              FROM wn LEFT JOIN c14 ON c14.id = wn.a
              ORDER BY d DESC, id LIMIT 1
            ),
            c20 AS (
              SELECT (SELECT MIN(a) FROM wn) AS id, CAST(0 AS BIGINT) AS d
              UNION ALL
              SELECT id, CAST(0 AS BIGINT) FROM p2
            ),
            c21 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM c20
              UNION ALL
              SELECT wsym.b, c20.d + wsym.w FROM c20
              JOIN wsym ON wsym.a = c20.id) GROUP BY 1),
            c22 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM c21
              UNION ALL
              SELECT wsym.b, c21.d + wsym.w FROM c21
              JOIN wsym ON wsym.a = c21.id) GROUP BY 1),
            c23 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM c22
              UNION ALL
              SELECT wsym.b, c22.d + wsym.w FROM c22
              JOIN wsym ON wsym.a = c22.id) GROUP BY 1),
            c24 AS (SELECT id, MIN(d) AS d FROM (
              SELECT id, d FROM c23
              UNION ALL
              SELECT wsym.b, c23.d + wsym.w FROM c23
              JOIN wsym ON wsym.a = c23.id) GROUP BY 1),
            p3 AS MATERIALIZED (
              SELECT wn.a AS id,
                     COALESCE(c24.d, (SELECT f FROM wfar)) AS d
              FROM wn LEFT JOIN c24 ON c24.id = wn.a
              ORDER BY d DESC, id LIMIT 1
            )
            SELECT CAST(1 AS INT) AS center_rank,
                   CAST((SELECT MIN(a) FROM wn) AS BIGINT) AS id,
                   CAST(0 AS BIGINT) AS cost
            UNION ALL
            SELECT 2, CAST((SELECT id FROM p2) AS BIGINT),
                   CAST((SELECT d FROM p2) AS BIGINT)
            WHERE (SELECT d FROM p2) > 0
            UNION ALL
            SELECT 3, CAST((SELECT id FROM p3) AS BIGINT),
                   CAST((SELECT d FROM p3) AS BIGINT)
            WHERE (SELECT d FROM p2) > 0 AND (SELECT d FROM p3) > 0
            ORDER BY center_rank
        """,
        # Weighted Voronoi: the same wsym cost relaxation, but tracking
        # the ORIGIN seed — per-round argmin of the lexicographic
        # (cost, seed) pair (translation-invariant, so bounded
        # Bellman-Ford stays exact), seeds = 3 smallest node ids.
        "weighted_voronoi_trade": """
            WITH twe AS MATERIALIZED (
              SELECT a, b, CAST(q * 100 AS BIGINT) AS w FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            wund AS MATERIALIZED (
              SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, MIN(w) AS w
              FROM twe WHERE a <> b GROUP BY 1, 2
            ),
            wsym AS MATERIALIZED (
              SELECT a, b, w FROM wund
              UNION ALL SELECT b, a, w FROM wund
            ),
            wn AS MATERIALIZED (SELECT DISTINCT a FROM wsym),
            sd AS MATERIALIZED (SELECT a AS id FROM wn ORDER BY a LIMIT 3),
            v0 AS (SELECT id, CAST(0 AS BIGINT) AS d, id AS seed FROM sd),
            v1 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v0
                    UNION ALL
                    SELECT wsym.b, v0.d + wsym.w, v0.seed FROM v0
                    JOIN wsym ON wsym.a = v0.id)) WHERE rn = 1),
            v2 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v1
                    UNION ALL
                    SELECT wsym.b, v1.d + wsym.w, v1.seed FROM v1
                    JOIN wsym ON wsym.a = v1.id)) WHERE rn = 1),
            v3 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v2
                    UNION ALL
                    SELECT wsym.b, v2.d + wsym.w, v2.seed FROM v2
                    JOIN wsym ON wsym.a = v2.id)) WHERE rn = 1),
            v4 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v3
                    UNION ALL
                    SELECT wsym.b, v3.d + wsym.w, v3.seed FROM v3
                    JOIN wsym ON wsym.a = v3.id)) WHERE rn = 1)
            SELECT CAST(v4.id AS BIGINT) AS id,
                   CAST(v4.seed AS BIGINT) AS seed,
                   CAST(v4.d AS BIGINT) AS cost
            FROM v4 JOIN wn ON wn.a = v4.id
            ORDER BY id
        """,
        # Weighted harmonic from landmarks: the same bounded relaxation
        # kept PER (id, landmark) — each round is a plain GROUP BY MIN,
        # no argmin collapse — then exact integer reciprocals
        # 10^9 // cost summed per node (cost 0 self terms excluded).
        "weighted_harmonic_trade": """
            WITH twe AS MATERIALIZED (
              SELECT a, b, CAST(q * 100 AS BIGINT) AS w FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            wund AS MATERIALIZED (
              SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, MIN(w) AS w
              FROM twe WHERE a <> b GROUP BY 1, 2
            ),
            wsym AS MATERIALIZED (
              SELECT a, b, w FROM wund
              UNION ALL SELECT b, a, w FROM wund
            ),
            wn AS MATERIALIZED (SELECT DISTINCT a FROM wsym),
            sd AS MATERIALIZED (SELECT a AS id FROM wn ORDER BY a LIMIT 3),
            h0 AS (SELECT id, id AS lm, CAST(0 AS BIGINT) AS d FROM sd),
            h1 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h0
              UNION ALL
              SELECT wsym.b, h0.lm, h0.d + wsym.w FROM h0
              JOIN wsym ON wsym.a = h0.id) GROUP BY 1, 2),
            h2 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h1
              UNION ALL
              SELECT wsym.b, h1.lm, h1.d + wsym.w FROM h1
              JOIN wsym ON wsym.a = h1.id) GROUP BY 1, 2),
            h3 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h2
              UNION ALL
              SELECT wsym.b, h2.lm, h2.d + wsym.w FROM h2
              JOIN wsym ON wsym.a = h2.id) GROUP BY 1, 2),
            h4 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h3
              UNION ALL
              SELECT wsym.b, h3.lm, h3.d + wsym.w FROM h3
              JOIN wsym ON wsym.a = h3.id) GROUP BY 1, 2)
            SELECT CAST(h4.id AS BIGINT) AS id,
                   CAST(COUNT(*) AS BIGINT) AS n_reached,
                   CAST(SUM(1000000000 // h4.d) AS BIGINT) AS h_ppb
            FROM h4 JOIN wn ON wn.a = h4.id
            WHERE h4.d > 0
            GROUP BY 1 ORDER BY 1
        """,
        # Weighted eccentricity: the same per-(id, landmark) bounded
        # min-cost unroll, MAX over landmarks (self cost-0 rows counted
        # in n_reached — they never move the max).
        "weighted_ecc_trade": """
            WITH twe AS MATERIALIZED (
              SELECT a, b, CAST(q * 100 AS BIGINT) AS w FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            wund AS MATERIALIZED (
              SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, MIN(w) AS w
              FROM twe WHERE a <> b GROUP BY 1, 2
            ),
            wsym AS MATERIALIZED (
              SELECT a, b, w FROM wund
              UNION ALL SELECT b, a, w FROM wund
            ),
            wn AS MATERIALIZED (SELECT DISTINCT a FROM wsym),
            sd AS MATERIALIZED (SELECT a AS id FROM wn ORDER BY a LIMIT 3),
            h0 AS (SELECT id, id AS lm, CAST(0 AS BIGINT) AS d FROM sd),
            h1 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h0
              UNION ALL
              SELECT wsym.b, h0.lm, h0.d + wsym.w FROM h0
              JOIN wsym ON wsym.a = h0.id) GROUP BY 1, 2),
            h2 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h1
              UNION ALL
              SELECT wsym.b, h1.lm, h1.d + wsym.w FROM h1
              JOIN wsym ON wsym.a = h1.id) GROUP BY 1, 2),
            h3 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h2
              UNION ALL
              SELECT wsym.b, h2.lm, h2.d + wsym.w FROM h2
              JOIN wsym ON wsym.a = h2.id) GROUP BY 1, 2),
            h4 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h3
              UNION ALL
              SELECT wsym.b, h3.lm, h3.d + wsym.w FROM h3
              JOIN wsym ON wsym.a = h3.id) GROUP BY 1, 2)
            SELECT CAST(h4.id AS BIGINT) AS id,
                   CAST(COUNT(*) AS BIGINT) AS n_reached,
                   CAST(MAX(h4.d) AS BIGINT) AS ecc_est
            FROM h4 JOIN wn ON wn.a = h4.id
            GROUP BY 1 ORDER BY 1
        """,
        # Weighted closeness: SUM over landmarks at cost > 0, then the
        # identical (n_reached * 1e9) // sum_cost BIGINT floor division.
        "weighted_closeness_trade": """
            WITH twe AS MATERIALIZED (
              SELECT a, b, CAST(q * 100 AS BIGINT) AS w FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            wund AS MATERIALIZED (
              SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, MIN(w) AS w
              FROM twe WHERE a <> b GROUP BY 1, 2
            ),
            wsym AS MATERIALIZED (
              SELECT a, b, w FROM wund
              UNION ALL SELECT b, a, w FROM wund
            ),
            wn AS MATERIALIZED (SELECT DISTINCT a FROM wsym),
            sd AS MATERIALIZED (SELECT a AS id FROM wn ORDER BY a LIMIT 3),
            h0 AS (SELECT id, id AS lm, CAST(0 AS BIGINT) AS d FROM sd),
            h1 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h0
              UNION ALL
              SELECT wsym.b, h0.lm, h0.d + wsym.w FROM h0
              JOIN wsym ON wsym.a = h0.id) GROUP BY 1, 2),
            h2 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h1
              UNION ALL
              SELECT wsym.b, h1.lm, h1.d + wsym.w FROM h1
              JOIN wsym ON wsym.a = h1.id) GROUP BY 1, 2),
            h3 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h2
              UNION ALL
              SELECT wsym.b, h2.lm, h2.d + wsym.w FROM h2
              JOIN wsym ON wsym.a = h2.id) GROUP BY 1, 2),
            h4 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h3
              UNION ALL
              SELECT wsym.b, h3.lm, h3.d + wsym.w FROM h3
              JOIN wsym ON wsym.a = h3.id) GROUP BY 1, 2)
            SELECT CAST(h4.id AS BIGINT) AS id,
                   CAST(COUNT(*) AS BIGINT) AS n_reached,
                   CAST(SUM(h4.d) AS BIGINT) AS sum_cost,
                   CAST((COUNT(*) * 1000000000) // SUM(h4.d) AS BIGINT)
                     AS c_ppb
            FROM h4 JOIN wn ON wn.a = h4.id
            WHERE h4.d > 0
            GROUP BY 1 ORDER BY 1
        """,
        # Weighted effective diameter: the ceil(0.9*n)-th smallest
        # bounded cost by window rank (self cost-0 pairs included, as
        # the hop form counts its dist-0 pairs in N(0)), interpolated
        # between adjacent distinct costs with the same exact-BIGINT
        # formula: cp*1e6 + (hd-cp)*(ppm*n - cumprev*1e6) // cnt_hit.
        "weighted_effdiam_trade": """
            WITH twe AS MATERIALIZED (
              SELECT a, b, CAST(q * 100 AS BIGINT) AS w FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            wund AS MATERIALIZED (
              SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, MIN(w) AS w
              FROM twe WHERE a <> b GROUP BY 1, 2
            ),
            wsym AS MATERIALIZED (
              SELECT a, b, w FROM wund
              UNION ALL SELECT b, a, w FROM wund
            ),
            wn AS MATERIALIZED (SELECT DISTINCT a FROM wsym),
            sd AS MATERIALIZED (SELECT a AS id FROM wn ORDER BY a LIMIT 3),
            h0 AS (SELECT id, id AS lm, CAST(0 AS BIGINT) AS d FROM sd),
            h1 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h0
              UNION ALL
              SELECT wsym.b, h0.lm, h0.d + wsym.w FROM h0
              JOIN wsym ON wsym.a = h0.id) GROUP BY 1, 2),
            h2 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h1
              UNION ALL
              SELECT wsym.b, h1.lm, h1.d + wsym.w FROM h1
              JOIN wsym ON wsym.a = h1.id) GROUP BY 1, 2),
            h3 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h2
              UNION ALL
              SELECT wsym.b, h2.lm, h2.d + wsym.w FROM h2
              JOIN wsym ON wsym.a = h2.id) GROUP BY 1, 2),
            h4 AS (SELECT id, lm, MIN(d) AS d FROM (
              SELECT id, lm, d FROM h3
              UNION ALL
              SELECT wsym.b, h3.lm, h3.d + wsym.w FROM h3
              JOIN wsym ON wsym.a = h3.id) GROUP BY 1, 2),
            costs AS MATERIALIZED (
              SELECT h4.d AS d, h4.id AS id, h4.lm AS lm
              FROM h4 JOIN wn ON wn.a = h4.id
            ),
            tot AS (SELECT COUNT(*) AS n, MAX(d) AS mx FROM costs),
            hit AS (
              SELECT d AS hd FROM (
                SELECT d,
                       ROW_NUMBER() OVER (ORDER BY d, id, lm) AS rn
                FROM costs)
              WHERE rn = (SELECT (900000 * n + 999999) // 1000000
                          FROM tot)
            ),
            itp AS (
              SELECT COALESCE(MAX(CASE WHEN d < (SELECT hd FROM hit)
                                       THEN d END), 0) AS cp,
                     SUM(CASE WHEN d < (SELECT hd FROM hit)
                              THEN 1 ELSE 0 END) AS cumprev,
                     SUM(CASE WHEN d = (SELECT hd FROM hit)
                              THEN 1 ELSE 0 END) AS cnth
              FROM costs
            )
            SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_pairs,
                   CAST((SELECT mx FROM tot) AS BIGINT) AS max_cost,
                   CAST(cp * 1000000
                        + (((SELECT hd FROM hit) - cp)
                           * (900000 * (SELECT n FROM tot)
                              - cumprev * 1000000)) // cnth
                        AS BIGINT) AS eff_cost_ppm
            FROM itp
            WHERE cnth IS NOT NULL AND cnth > 0
        """,
        # Weighted modularity of the Voronoi partition: the certified
        # v0..v4 lexicographic (cost, seed) unroll supplies the
        # assignment; then the same exact integer sums (DuckDB SUM over
        # BIGINT widens to HUGEINT, matching Spark's DECIMAL(38,0)) and
        # the same single double division + ROUND(6).
        "weighted_modularity_trade": """
            WITH twe AS MATERIALIZED (
              SELECT a, b, CAST(q * 100 AS BIGINT) AS w FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            wund AS MATERIALIZED (
              SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, MIN(w) AS w
              FROM twe WHERE a <> b GROUP BY 1, 2
            ),
            wsym AS MATERIALIZED (
              SELECT a, b, w FROM wund
              UNION ALL SELECT b, a, w FROM wund
            ),
            wn AS MATERIALIZED (SELECT DISTINCT a FROM wsym),
            sd AS MATERIALIZED (SELECT a AS id FROM wn ORDER BY a LIMIT 3),
            v0 AS (SELECT id, CAST(0 AS BIGINT) AS d, id AS seed FROM sd),
            v1 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v0
                    UNION ALL
                    SELECT wsym.b, v0.d + wsym.w, v0.seed FROM v0
                    JOIN wsym ON wsym.a = v0.id)) WHERE rn = 1),
            v2 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v1
                    UNION ALL
                    SELECT wsym.b, v1.d + wsym.w, v1.seed FROM v1
                    JOIN wsym ON wsym.a = v1.id)) WHERE rn = 1),
            v3 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v2
                    UNION ALL
                    SELECT wsym.b, v2.d + wsym.w, v2.seed FROM v2
                    JOIN wsym ON wsym.a = v2.id)) WHERE rn = 1),
            v4 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v3
                    UNION ALL
                    SELECT wsym.b, v3.d + wsym.w, v3.seed FROM v3
                    JOIN wsym ON wsym.a = v3.id)) WHERE rn = 1),
            asg AS MATERIALIZED (
              SELECT v4.id AS id, v4.seed AS community
              FROM v4 JOIN wn ON wn.a = v4.id
            ),
            tg AS MATERIALIZED (
              SELECT s.w AS w, ca.community AS ca, cb.community AS cb
              FROM wsym s
              JOIN asg ca ON ca.id = s.a
              JOIN asg cb ON cb.id = s.b
            ),
            ar AS (SELECT SUM(w) AS aw,
                          SUM(CASE WHEN ca = cb THEN w ELSE 0 END) AS ww
                   FROM tg),
            ds AS (SELECT SUM(sc * sc) AS s2, COUNT(*) AS nc FROM
                   (SELECT ca, SUM(w) AS sc FROM tg GROUP BY 1))
            SELECT CAST(aw // 2 AS BIGINT) AS total_weight,
                   CAST(nc AS BIGINT) AS n_communities,
                   ROUND(CAST(aw * ww - s2 AS DOUBLE)
                         / CAST(aw * aw AS DOUBLE), 6) AS modularity
            FROM ar, ds
        """,
        # Per-community conductance: the same v0..v4 assignment unroll
        # and tagged arcs, per-community SUM/COUNT-DISTINCT, one BIGINT
        # floor division (min-side volume), 0 by convention when there
        # is no outside.
        "conductance_trade": """
            WITH twe AS MATERIALIZED (
              SELECT a, b, CAST(q * 100 AS BIGINT) AS w FROM (
                SELECT s.s_nationkey AS a, c.c_nationkey AS b,
                       SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS q
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY 1, 2
              ) ORDER BY q DESC, a, b LIMIT 40
            ),
            wund AS MATERIALIZED (
              SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, MIN(w) AS w
              FROM twe WHERE a <> b GROUP BY 1, 2
            ),
            wsym AS MATERIALIZED (
              SELECT a, b, w FROM wund
              UNION ALL SELECT b, a, w FROM wund
            ),
            wn AS MATERIALIZED (SELECT DISTINCT a FROM wsym),
            sd AS MATERIALIZED (SELECT a AS id FROM wn ORDER BY a LIMIT 3),
            v0 AS (SELECT id, CAST(0 AS BIGINT) AS d, id AS seed FROM sd),
            v1 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v0
                    UNION ALL
                    SELECT wsym.b, v0.d + wsym.w, v0.seed FROM v0
                    JOIN wsym ON wsym.a = v0.id)) WHERE rn = 1),
            v2 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v1
                    UNION ALL
                    SELECT wsym.b, v1.d + wsym.w, v1.seed FROM v1
                    JOIN wsym ON wsym.a = v1.id)) WHERE rn = 1),
            v3 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v2
                    UNION ALL
                    SELECT wsym.b, v2.d + wsym.w, v2.seed FROM v2
                    JOIN wsym ON wsym.a = v2.id)) WHERE rn = 1),
            v4 AS (SELECT id, d, seed FROM (
              SELECT id, d, seed,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY d, seed) AS rn
              FROM (SELECT id, d, seed FROM v3
                    UNION ALL
                    SELECT wsym.b, v3.d + wsym.w, v3.seed FROM v3
                    JOIN wsym ON wsym.a = v3.id)) WHERE rn = 1),
            asg AS MATERIALIZED (
              SELECT v4.id AS id, v4.seed AS community
              FROM v4 JOIN wn ON wn.a = v4.id
            ),
            tg AS MATERIALIZED (
              SELECT s.a AS a, s.w AS w,
                     ca.community AS ca, cb.community AS cb
              FROM wsym s
              JOIN asg ca ON ca.id = s.a
              JOIN asg cb ON cb.id = s.b
            ),
            per AS (
              SELECT ca AS community,
                     COUNT(DISTINCT a) AS n_nodes,
                     SUM(w) AS vol_w,
                     SUM(CASE WHEN ca <> cb THEN w ELSE 0 END) AS cut_w
              FROM tg GROUP BY 1
            ),
            tot AS (SELECT SUM(vol_w) AS aw FROM per)
            SELECT CAST(community AS BIGINT) AS community,
                   CAST(n_nodes AS BIGINT) AS n_nodes,
                   CAST(vol_w AS BIGINT) AS vol_w,
                   CAST(cut_w AS BIGINT) AS cut_w,
                   CAST(CASE WHEN LEAST(vol_w, aw - vol_w) = 0 THEN 0
                        ELSE (cut_w * 1000000)
                             // LEAST(vol_w, aw - vol_w) END
                        AS BIGINT) AS conductance_ppm
            FROM per, tot ORDER BY community
        """,
        # Multi-touch attribution: the same per-user running-sum /
        # rank / count windows ((ts, event_id) total order), the same
        # integer u-shaped CASE credits (40/20/40, floor remainders to
        # the first middle), and the same two-level aggregation so
        # n_conversions is a COUNT of inner groups, not a
        # count-distinct.
        "attribution_events": """
            WITH tagged AS (
              SELECT user_id, ts, event_id, event_type,
                     SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS c,
                     SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id) AS tot
              FROM events
            ),
            touches AS (
              SELECT user_id, event_type, c + 1 AS conv_no, ts, event_id
              FROM tagged
              WHERE event_type <> 'purchase' AND c + 1 <= tot
            ),
            scored AS (
              SELECT user_id, conv_no, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id, conv_no
                                        ORDER BY ts, event_id) AS pos,
                     COUNT(*) OVER (PARTITION BY user_id, conv_no) AS k
              FROM touches
            ),
            credited AS (
              SELECT event_type, user_id, conv_no,
                CASE WHEN k = 1 THEN 1000000
                     WHEN k = 2 THEN 500000
                     WHEN pos = 1 OR pos = k THEN 400000
                     ELSE (200000 // (k - 2))
                          + CASE WHEN pos = 2
                                 THEN 200000
                                      - (k - 2) * (200000 // (k - 2))
                                 ELSE 0 END
                END AS credit
              FROM scored
            ),
            per_conv AS (
              SELECT event_type, user_id, conv_no,
                     COUNT(*) AS n_t, SUM(credit) AS cr
              FROM credited GROUP BY 1, 2, 3
            )
            SELECT event_type,
                   CAST(SUM(n_t) AS BIGINT) AS n_touches,
                   CAST(COUNT(*) AS BIGINT) AS n_conversions,
                   CAST(SUM(cr) AS BIGINT) AS credit_ppm
            FROM per_conv GROUP BY 1 ORDER BY 1
        """,
        # Same int64 grid quantization (ROUND half-away), same BIGINT
        # permille scoring, same (score DESC, id) greedy unrolled.
        "mmr_topk_embeddings": """
            WITH mg AS MATERIALIZED (
              SELECT vec_id AS id,
                     list_transform(embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS v
              FROM embeddings
            ),
            mb AS MATERIALIZED (
              SELECT id, v,
                     CAST(list_dot_product(v,
                       (SELECT v FROM mg WHERE id = 0)) AS BIGINT)
                       AS rel
              FROM mg WHERE id <> 0
            ),
            p1 AS MATERIALIZED (
              SELECT id, v, rel, 700 * rel AS s FROM mb
              ORDER BY s DESC, id LIMIT 1
            ),
            p2 AS MATERIALIZED (
              SELECT id, v, rel,
                     700 * rel - 300 * CAST(list_dot_product(v,
                       (SELECT v FROM p1)) AS BIGINT) AS s
              FROM mb WHERE id <> (SELECT id FROM p1)
              ORDER BY s DESC, id LIMIT 1
            ),
            p3 AS MATERIALIZED (
              SELECT id, v, rel,
                     700 * rel - 300 * GREATEST(
                       CAST(list_dot_product(v,
                         (SELECT v FROM p1)) AS BIGINT),
                       CAST(list_dot_product(v,
                         (SELECT v FROM p2)) AS BIGINT)) AS s
              FROM mb WHERE id NOT IN
                ((SELECT id FROM p1), (SELECT id FROM p2))
              ORDER BY s DESC, id LIMIT 1
            ),
            p4 AS MATERIALIZED (
              SELECT id, v, rel,
                     700 * rel - 300 * GREATEST(
                       CAST(list_dot_product(v,
                         (SELECT v FROM p1)) AS BIGINT),
                       CAST(list_dot_product(v,
                         (SELECT v FROM p2)) AS BIGINT),
                       CAST(list_dot_product(v,
                         (SELECT v FROM p3)) AS BIGINT)) AS s
              FROM mb WHERE id NOT IN
                ((SELECT id FROM p1), (SELECT id FROM p2),
                 (SELECT id FROM p3))
              ORDER BY s DESC, id LIMIT 1
            )
            SELECT CAST(1 AS INT) AS rank,
                   CAST((SELECT id FROM p1) AS BIGINT) AS id,
                   CAST((SELECT rel FROM p1) AS BIGINT) AS relevance,
                   CAST((SELECT s FROM p1) AS BIGINT) AS mmr_score
            UNION ALL
            SELECT 2, CAST((SELECT id FROM p2) AS BIGINT),
                   CAST((SELECT rel FROM p2) AS BIGINT),
                   CAST((SELECT s FROM p2) AS BIGINT)
            UNION ALL
            SELECT 3, CAST((SELECT id FROM p3) AS BIGINT),
                   CAST((SELECT rel FROM p3) AS BIGINT),
                   CAST((SELECT s FROM p3) AS BIGINT)
            UNION ALL
            SELECT 4, CAST((SELECT id FROM p4) AS BIGINT),
                   CAST((SELECT rel FROM p4) AS BIGINT),
                   CAST((SELECT s FROM p4) AS BIGINT)
            ORDER BY rank
        """,
        # Same micro-unit floor, same |n*Sk - k*Sn| statistic, same
        # earliest-index tiebreak via ROW_NUMBER.
        "cusum_events": """
            WITH cb AS (
              SELECT event_type AS g, ts, event_id AS id,
                     CAST(FLOOR(value * 1000000) AS BIGINT) AS v
              FROM events
            ),
            cp AS (
              SELECT g, ts,
                     ROW_NUMBER() OVER (PARTITION BY g
                                        ORDER BY ts, id) AS k,
                     SUM(v) OVER (PARTITION BY g ORDER BY ts, id
                                  ROWS UNBOUNDED PRECEDING) AS sk,
                     SUM(v) OVER (PARTITION BY g) AS sn,
                     COUNT(*) OVER (PARTITION BY g) AS n
              FROM cb
            ),
            cd AS (
              SELECT g, ts, k, n, ABS(n * sk - k * sn) AS dev
              FROM cp WHERE k < n
            ),
            cr AS (
              SELECT g, n, k, ts, dev,
                     ROW_NUMBER() OVER (PARTITION BY g
                                        ORDER BY dev DESC, k ASC) AS rn
              FROM cd
            )
            SELECT g AS event_type, CAST(n AS BIGINT) AS n,
                   CAST(k AS BIGINT) AS change_index,
                   ts AS change_ts,
                   CAST(dev AS BIGINT) AS deviation
            FROM cr WHERE rn = 1 ORDER BY 1
        """,
        # Same CUSUM unroll per SOURCE over doc_id order (v = n_chars
        # micro-units), joined to the corpus_drift_tvd grid; the alarm
        # is the exact integer mean shift dev // (k*(n-k)) >= 1e8.
        "drift_alarm_docs": """
            WITH cb AS (
              SELECT source AS g, doc_id AS o,
                     CAST(n_chars AS BIGINT) * 1000000 AS v
              FROM documents
            ),
            cp AS (
              SELECT g, o,
                     ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) AS k,
                     SUM(v) OVER (PARTITION BY g ORDER BY o
                                  ROWS UNBOUNDED PRECEDING) AS sk,
                     SUM(v) OVER (PARTITION BY g) AS sn,
                     COUNT(*) OVER (PARTITION BY g) AS n
              FROM cb
            ),
            cd AS (
              SELECT g, o, k, n, ABS(n * sk - k * sn) AS dev
              FROM cp WHERE k < n
            ),
            cr AS (
              SELECT g, n, k, o, dev,
                     ROW_NUMBER() OVER (PARTITION BY g
                                        ORDER BY dev DESC, k ASC) AS rn
              FROM cd
            ),
            b AS (
              SELECT source AS grp, n_chars // 64 AS bin FROM documents
            ),
            counts AS (SELECT grp, bin, COUNT(*) AS oc
                       FROM b GROUP BY 1, 2),
            bins AS (SELECT bin, COUNT(*) AS tot FROM b GROUP BY 1),
            groups AS (SELECT grp, COUNT(*) AS n_group FROM b GROUP BY 1),
            grand AS (SELECT COUNT(*) AS n_all FROM b),
            grid AS (
              SELECT g.grp, g.n_group, bi.bin, bi.tot,
                     COALESCE(c.oc, 0) AS oc,
                     bi.tot - COALESCE(c.oc, 0) AS r,
                     ga.n_all - g.n_group AS n_rest
              FROM groups g CROSS JOIN bins bi CROSS JOIN grand ga
              LEFT JOIN counts c ON c.grp = g.grp AND c.bin = bi.bin
            ),
            tv AS (
              SELECT grp, n_group, n_rest,
                     CAST(SUM(ABS(oc * n_rest - r * n_group)) AS BIGINT)
                       AS tvd_num,
                     ROUND(CAST(SUM(ABS(oc * n_rest - r * n_group))
                                AS BIGINT)
                           / (2.0 * n_group * n_rest), 6) AS tvd
              FROM grid GROUP BY 1, 2, 3
            )
            SELECT cr.g AS source, CAST(cr.n AS BIGINT) AS n,
                   CAST(cr.k AS BIGINT) AS change_index,
                   cr.o AS change_order,
                   CAST(cr.dev AS BIGINT) AS deviation,
                   CAST(cr.dev // (cr.k * (cr.n - cr.k)) AS BIGINT)
                     AS shift_micros,
                   cr.dev // (cr.k * (cr.n - cr.k)) >= 100000000
                     AS alarm,
                   CAST(tv.n_rest AS BIGINT) AS n_rest,
                   tv.tvd_num, tv.tvd
            FROM cr JOIN tv ON tv.grp = cr.g
            WHERE cr.rn = 1 ORDER BY 1
        """,
    }
