"""Derive the property graph from the driver's TPC-H-ish parquet tables.

Mapping per FIXTURES.md §2: region/nation/customer/supplier/part/order become
nodes; in_region/located_in/placed/contains/supplied_by become edges. Ids are
deterministic label-band offsets (``offset + natural key``) — no
``monotonically_increasing_id()`` (non-deterministic across runs,
SURVEY.md §1.4) and no ``row_number()`` shuffle: stable, reproducible,
join-free id assignment that an oracle can recompute in SQL.

Scale note (100 TB): the bands below are sized for the driver's testdata
(keys < 1e6). At production scale the same scheme becomes
``id = label_code << 48 | key`` (or ``xxhash64`` of the natural key) — still
deterministic and shuffle-free; nothing else in the engine changes, since
every operator treats ids as opaque BIGINTs.

The graph is built LAZILY as a union of per-label frames, each with a
literal ``label`` column. A label-equality filter constant-folds to ``true``
on the matching branch and ``false`` elsewhere, so Catalyst prunes the
non-matching parquet scans entirely — the union behaves like a
label-partitioned table (SURVEY.md §1.4 partition-pruning requirement)
without materializing anything. ``store.py`` offers the materialized
label-partitioned layout for repeated workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from akka_graph_db_spark.model import (
    PropertyGraph,
    json_number,
    json_string,
    json_timestamp,
    props_map,
)

# Node id bands (FIXTURES.md §2).
REGION_BASE = 0
NATION_BASE = 1_000_000
CUSTOMER_BASE = 2_000_000
SUPPLIER_BASE = 3_000_000
PART_BASE = 4_000_000
ORDER_BASE = 5_000_000

# Edge id bands (disjoint from node bands and each other).
IN_REGION_BASE = 100_000_000
LOCATED_IN_CUST_BASE = 110_000_000
LOCATED_IN_SUPP_BASE = 120_000_000
PLACED_BASE = 130_000_000
# contains: the driver's synthetic lineitem does NOT have unique
# (l_orderkey, l_linenumber) pairs (unlike true TPC-H), so the edge id is
# l_orderkey * 32 + (per-order row_number - 1): deterministic, SQL-
# reproducible (the oracle recomputes the same ROW_NUMBER), and the window
# is partitioned by l_orderkey — tiny per-order groups, no global shuffle.
CONTAINS_BASE = 1_000_000_000
CONTAINS_SHIFT = 32  # max lines per order (observed 17; true TPC-H 7)
# supplied_by packs (partkey, suppkey) as partkey * 2^20 + suppkey: collision-
# free while suppkey < 2^20 (TPC-H suppliers = 10k x SF -> holds to SF ~100).
SUPPLIED_BY_BASE = 1_000_000_000_000
SUPPLIED_BY_SHIFT = 1_048_576  # 2^20

# Stable order for the per-order lineitem row_number (full rows are unique,
# so this ordering is total; identical rows would swap identical ids).
_LINEITEM_ORDER = (
    "l_linenumber",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)
_LINEITEM_ORDER_SQL = ", ".join(_LINEITEM_ORDER)

# Band-capacity limits the packing relies on; validate_id_ranges() enforces
# them loudly instead of corrupting ids silently (one max() aggregate per
# table — fully pushed down, cheap even at 100 TB).
_KEY_LIMITS = {
    "region": ("r_regionkey", NATION_BASE - REGION_BASE),
    "nation": ("n_nationkey", CUSTOMER_BASE - NATION_BASE),
    "customer": ("c_custkey", SUPPLIER_BASE - CUSTOMER_BASE),
    "supplier": ("s_suppkey", min(PART_BASE - SUPPLIER_BASE, SUPPLIED_BY_SHIFT)),
    "part": ("p_partkey", ORDER_BASE - PART_BASE),
    "orders": ("o_orderkey", (CONTAINS_BASE - PLACED_BASE)),
    "lineitem": (
        "l_orderkey",
        (SUPPLIED_BY_BASE - CONTAINS_BASE) // CONTAINS_SHIFT,
    ),
}

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _b(col: str) -> F.Column:
    return F.col(col).cast("bigint")


# Two-tier property layout (SURVEY.md §1.4): hot property keys are PROMOTED
# to typed top-level columns at ingest so equality predicates on them reach
# the parquet scan (PushedFilters) instead of evaluating post-scan on JSON
# fragments. Labels that lack a key carry a typed NULL literal, which
# constant-folds the predicate to false on that branch -> the whole
# non-matching parquet scan is pruned. `props` remains the full-fidelity
# source of truth.
PROMOTED_NODE_SCHEMA = {
    "name": "string",
    "acctbal": "double",
    "mktsegment": "string",
    "brand": "string",
    "type": "string",
    "size": "bigint",
    "retailprice": "double",
    "status": "string",
    "totalprice": "double",
    "orderdate": "timestamp",
    "priority": "string",
}
PROMOTED_EDGE_SCHEMA = {
    "orderdate": "timestamp",
    "totalprice": "double",
    "quantity": "double",
    "extendedprice": "double",
    "discount": "double",
    "tax": "double",
    "returnflag": "string",
    "linestatus": "string",
    "shipdate": "timestamp",
}


def _promoted(schema: dict[str, str], present: dict[str, F.Column]):
    return [
        (present[k] if k in present else F.lit(None).cast(t)).alias(k)
        for k, t in schema.items()
    ]


def validate_id_ranges(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Assert every natural key fits its id band (ADVICE r1: fail loudly
    instead of silently corrupting packed ids). One pushed-down max() per
    table; returns the observed maxima."""
    observed: dict[str, int] = {}
    for table, (key, limit) in _KEY_LIMITS.items():
        df = read_table(spark, sf_dir, table)
        row = df.select(F.max(F.col(key).cast("bigint")).alias("m")).collect()[0]
        m = row["m"] or 0
        observed[key] = m
        if m >= limit:
            raise ValueError(
                f"id-band overflow: max({key})={m} >= band capacity {limit}; "
                "switch to the label_code<<48 packing documented above"
            )
    ln = read_table(spark, sf_dir, "lineitem")
    ml = (
        ln.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("m"))
        .collect()[0]["m"]
        or 0
    )
    observed["max_lines_per_order"] = ml
    if ml > CONTAINS_SHIFT:
        raise ValueError(
            f"id-band overflow: {ml} lines in one order > {CONTAINS_SHIFT}"
        )
    return observed


def graph_from_tpch(
    spark: SparkSession, sf_dir: str, promote: bool = True, validate: bool = False
) -> PropertyGraph:
    """Build the (lazy) graph over a testdata scale-factor directory."""
    if validate:
        validate_id_ranges(spark, sf_dir)
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    part = read_table(spark, sf_dir, "part")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")

    def node_branch(df, id_col, label, props, promoted_present):
        cols = [id_col.alias("id"), F.lit(label).alias("label"), props.alias("props")]
        if promote:
            cols += _promoted(PROMOTED_NODE_SCHEMA, promoted_present)
        return df.select(*cols)

    def edge_branch(df, id_col, label, src, dst, props, promoted_present):
        cols = [
            id_col.alias("id"),
            F.lit(label).alias("label"),
            src.alias("src"),
            dst.alias("dst"),
            props.alias("props"),
        ]
        if promote:
            cols += _promoted(PROMOTED_EDGE_SCHEMA, promoted_present)
        return df.select(*cols)

    nodes = (
        node_branch(
            region,
            _b("r_regionkey") + REGION_BASE,
            "region",
            props_map(("name", json_string(F.col("r_name")))),
            {"name": F.col("r_name")},
        )
        .unionByName(
            node_branch(
                nation,
                _b("n_nationkey") + NATION_BASE,
                "nation",
                props_map(("name", json_string(F.col("n_name")))),
                {"name": F.col("n_name")},
            )
        )
        .unionByName(
            node_branch(
                customer,
                _b("c_custkey") + CUSTOMER_BASE,
                "customer",
                props_map(
                    ("name", json_string(F.col("c_name"))),
                    ("acctbal", json_number(F.col("c_acctbal"))),
                    ("mktsegment", json_string(F.col("c_mktsegment"))),
                ),
                {
                    "name": F.col("c_name"),
                    "acctbal": F.col("c_acctbal").cast("double"),
                    "mktsegment": F.col("c_mktsegment"),
                },
            )
        )
        .unionByName(
            node_branch(
                supplier,
                _b("s_suppkey") + SUPPLIER_BASE,
                "supplier",
                props_map(
                    ("name", json_string(F.col("s_name"))),
                    ("acctbal", json_number(F.col("s_acctbal"))),
                ),
                {
                    "name": F.col("s_name"),
                    "acctbal": F.col("s_acctbal").cast("double"),
                },
            )
        )
        .unionByName(
            node_branch(
                part,
                _b("p_partkey") + PART_BASE,
                "part",
                props_map(
                    ("name", json_string(F.col("p_name"))),
                    ("brand", json_string(F.col("p_brand"))),
                    ("type", json_string(F.col("p_type"))),
                    ("size", json_number(F.col("p_size"))),
                    ("retailprice", json_number(F.col("p_retailprice"))),
                ),
                {
                    "name": F.col("p_name"),
                    "brand": F.col("p_brand"),
                    "type": F.col("p_type"),
                    "size": F.col("p_size").cast("bigint"),
                    "retailprice": F.col("p_retailprice").cast("double"),
                },
            )
        )
        .unionByName(
            node_branch(
                orders,
                _b("o_orderkey") + ORDER_BASE,
                "order",
                props_map(
                    ("status", json_string(F.col("o_orderstatus"))),
                    ("totalprice", json_number(F.col("o_totalprice"))),
                    ("orderdate", json_timestamp(F.col("o_orderdate"))),
                    ("priority", json_string(F.col("o_orderpriority"))),
                ),
                {
                    "status": F.col("o_orderstatus"),
                    "totalprice": F.col("o_totalprice").cast("double"),
                    "orderdate": F.col("o_orderdate"),
                    "priority": F.col("o_orderpriority"),
                },
            )
        )
    )

    empty_props = props_map()

    edges = (
        edge_branch(
            nation,
            _b("n_nationkey") + IN_REGION_BASE,
            "in_region",
            _b("n_nationkey") + NATION_BASE,
            _b("n_regionkey") + REGION_BASE,
            empty_props,
            {},
        )
        .unionByName(
            edge_branch(
                customer,
                _b("c_custkey") + LOCATED_IN_CUST_BASE,
                "located_in",
                _b("c_custkey") + CUSTOMER_BASE,
                _b("c_nationkey") + NATION_BASE,
                empty_props,
                {},
            )
        )
        .unionByName(
            edge_branch(
                supplier,
                _b("s_suppkey") + LOCATED_IN_SUPP_BASE,
                "located_in",
                _b("s_suppkey") + SUPPLIER_BASE,
                _b("s_nationkey") + NATION_BASE,
                empty_props,
                {},
            )
        )
        .unionByName(
            edge_branch(
                orders,
                _b("o_orderkey") + PLACED_BASE,
                "placed",
                _b("o_custkey") + CUSTOMER_BASE,
                _b("o_orderkey") + ORDER_BASE,
                props_map(
                    ("orderdate", json_timestamp(F.col("o_orderdate"))),
                    ("totalprice", json_number(F.col("o_totalprice"))),
                ),
                {
                    "orderdate": F.col("o_orderdate"),
                    "totalprice": F.col("o_totalprice").cast("double"),
                },
            )
        )
        .unionByName(
            edge_branch(
                lineitem.withColumn(
                    "_rn",
                    F.row_number().over(
                        W.partitionBy("l_orderkey").orderBy(*_LINEITEM_ORDER)
                    ),
                ),
                _b("l_orderkey") * CONTAINS_SHIFT
                + F.col("_rn").cast("bigint")
                - 1
                + CONTAINS_BASE,
                "contains",
                _b("l_orderkey") + ORDER_BASE,
                _b("l_partkey") + PART_BASE,
                props_map(
                    ("quantity", json_number(F.col("l_quantity"))),
                    ("extendedprice", json_number(F.col("l_extendedprice"))),
                    ("discount", json_number(F.col("l_discount"))),
                    ("tax", json_number(F.col("l_tax"))),
                    ("returnflag", json_string(F.col("l_returnflag"))),
                    ("linestatus", json_string(F.col("l_linestatus"))),
                    ("shipdate", json_timestamp(F.col("l_shipdate"))),
                ),
                {
                    "quantity": F.col("l_quantity").cast("double"),
                    "extendedprice": F.col("l_extendedprice").cast("double"),
                    "discount": F.col("l_discount").cast("double"),
                    "tax": F.col("l_tax").cast("double"),
                    "returnflag": F.col("l_returnflag"),
                    "linestatus": F.col("l_linestatus"),
                    "shipdate": F.col("l_shipdate"),
                },
            )
        )
        .unionByName(
            edge_branch(
                lineitem.select("l_partkey", "l_suppkey").distinct(),
                _b("l_partkey") * SUPPLIED_BY_SHIFT
                + _b("l_suppkey")
                + SUPPLIED_BY_BASE,
                "supplied_by",
                _b("l_partkey") + PART_BASE,
                _b("l_suppkey") + SUPPLIER_BASE,
                empty_props,
                {},
            )
        )
    )

    return PropertyGraph(nodes=nodes, edges=edges)


# ---------------------------------------------------------------------------
# Oracle-SQL view of the same derivation. The DuckDB oracle recomputes the
# graph relationally with these CTEs so graph-query results can be
# hash-compared (BASELINE.md correctness gate). Kept HERE, next to the Spark
# derivation, so the two can never drift.
# ---------------------------------------------------------------------------

ORACLE_NODES_CTE = f"""
nodes_v AS (
  SELECT r_regionkey + {REGION_BASE} AS id, 'region' AS label FROM region
  UNION ALL
  SELECT n_nationkey + {NATION_BASE}, 'nation' FROM nation
  UNION ALL
  SELECT c_custkey + {CUSTOMER_BASE}, 'customer' FROM customer
  UNION ALL
  SELECT s_suppkey + {SUPPLIER_BASE}, 'supplier' FROM supplier
  UNION ALL
  SELECT p_partkey + {PART_BASE}, 'part' FROM part
  UNION ALL
  SELECT o_orderkey + {ORDER_BASE}, 'order' FROM orders
)
"""

ORACLE_EDGES_CTE = f"""
edges_v AS (
  SELECT n_nationkey + {IN_REGION_BASE} AS id, 'in_region' AS label,
         n_nationkey + {NATION_BASE} AS src, n_regionkey + {REGION_BASE} AS dst
  FROM nation
  UNION ALL
  SELECT c_custkey + {LOCATED_IN_CUST_BASE}, 'located_in',
         c_custkey + {CUSTOMER_BASE}, c_nationkey + {NATION_BASE}
  FROM customer
  UNION ALL
  SELECT s_suppkey + {LOCATED_IN_SUPP_BASE}, 'located_in',
         s_suppkey + {SUPPLIER_BASE}, s_nationkey + {NATION_BASE}
  FROM supplier
  UNION ALL
  SELECT o_orderkey + {PLACED_BASE}, 'placed',
         o_custkey + {CUSTOMER_BASE}, o_orderkey + {ORDER_BASE}
  FROM orders
  UNION ALL
  SELECT l_orderkey * {CONTAINS_SHIFT} + rn - 1 + {CONTAINS_BASE}, 'contains',
         l_orderkey + {ORDER_BASE}, l_partkey + {PART_BASE}
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
          ORDER BY {_LINEITEM_ORDER_SQL}) AS rn FROM lineitem)
  UNION ALL
  SELECT l_partkey * {SUPPLIED_BY_SHIFT} + l_suppkey + {SUPPLIED_BY_BASE},
         'supplied_by',
         l_partkey + {PART_BASE}, l_suppkey + {SUPPLIER_BASE}
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
)
"""
