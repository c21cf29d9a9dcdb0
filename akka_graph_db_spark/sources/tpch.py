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
CONTAINS_BASE = 200_000_000  # + l_orderkey * 8 + l_linenumber  (linenumber ≤ 7)
SUPPLIED_BY_BASE = 300_000_000  # + l_partkey * 1000 + l_suppkey (suppkey < 1000)

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


def graph_from_tpch(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    """Build the (lazy) graph over a testdata scale-factor directory."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    part = read_table(spark, sf_dir, "part")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")

    nodes = (
        region.select(
            (_b("r_regionkey") + REGION_BASE).alias("id"),
            F.lit("region").alias("label"),
            props_map(("name", json_string(F.col("r_name")))).alias("props"),
        )
        .unionByName(
            nation.select(
                (_b("n_nationkey") + NATION_BASE).alias("id"),
                F.lit("nation").alias("label"),
                props_map(("name", json_string(F.col("n_name")))).alias("props"),
            )
        )
        .unionByName(
            customer.select(
                (_b("c_custkey") + CUSTOMER_BASE).alias("id"),
                F.lit("customer").alias("label"),
                props_map(
                    ("name", json_string(F.col("c_name"))),
                    ("acctbal", json_number(F.col("c_acctbal"))),
                    ("mktsegment", json_string(F.col("c_mktsegment"))),
                ).alias("props"),
            )
        )
        .unionByName(
            supplier.select(
                (_b("s_suppkey") + SUPPLIER_BASE).alias("id"),
                F.lit("supplier").alias("label"),
                props_map(
                    ("name", json_string(F.col("s_name"))),
                    ("acctbal", json_number(F.col("s_acctbal"))),
                ).alias("props"),
            )
        )
        .unionByName(
            part.select(
                (_b("p_partkey") + PART_BASE).alias("id"),
                F.lit("part").alias("label"),
                props_map(
                    ("name", json_string(F.col("p_name"))),
                    ("brand", json_string(F.col("p_brand"))),
                    ("type", json_string(F.col("p_type"))),
                    ("size", json_number(F.col("p_size"))),
                    ("retailprice", json_number(F.col("p_retailprice"))),
                ).alias("props"),
            )
        )
        .unionByName(
            orders.select(
                (_b("o_orderkey") + ORDER_BASE).alias("id"),
                F.lit("order").alias("label"),
                props_map(
                    ("status", json_string(F.col("o_orderstatus"))),
                    ("totalprice", json_number(F.col("o_totalprice"))),
                    ("orderdate", json_timestamp(F.col("o_orderdate"))),
                    ("priority", json_string(F.col("o_orderpriority"))),
                ).alias("props"),
            )
        )
    )

    empty_props = props_map()

    edges = (
        nation.select(
            (_b("n_nationkey") + IN_REGION_BASE).alias("id"),
            F.lit("in_region").alias("label"),
            (_b("n_nationkey") + NATION_BASE).alias("src"),
            (_b("n_regionkey") + REGION_BASE).alias("dst"),
            empty_props.alias("props"),
        )
        .unionByName(
            customer.select(
                (_b("c_custkey") + LOCATED_IN_CUST_BASE).alias("id"),
                F.lit("located_in").alias("label"),
                (_b("c_custkey") + CUSTOMER_BASE).alias("src"),
                (_b("c_nationkey") + NATION_BASE).alias("dst"),
                empty_props.alias("props"),
            )
        )
        .unionByName(
            supplier.select(
                (_b("s_suppkey") + LOCATED_IN_SUPP_BASE).alias("id"),
                F.lit("located_in").alias("label"),
                (_b("s_suppkey") + SUPPLIER_BASE).alias("src"),
                (_b("s_nationkey") + NATION_BASE).alias("dst"),
                empty_props.alias("props"),
            )
        )
        .unionByName(
            orders.select(
                (_b("o_orderkey") + PLACED_BASE).alias("id"),
                F.lit("placed").alias("label"),
                (_b("o_custkey") + CUSTOMER_BASE).alias("src"),
                (_b("o_orderkey") + ORDER_BASE).alias("dst"),
                props_map(
                    ("orderdate", json_timestamp(F.col("o_orderdate"))),
                    ("totalprice", json_number(F.col("o_totalprice"))),
                ).alias("props"),
            )
        )
        .unionByName(
            lineitem.select(
                (_b("l_orderkey") * 8 + _b("l_linenumber") + CONTAINS_BASE).alias(
                    "id"
                ),
                F.lit("contains").alias("label"),
                (_b("l_orderkey") + ORDER_BASE).alias("src"),
                (_b("l_partkey") + PART_BASE).alias("dst"),
                props_map(
                    ("quantity", json_number(F.col("l_quantity"))),
                    ("extendedprice", json_number(F.col("l_extendedprice"))),
                    ("discount", json_number(F.col("l_discount"))),
                    ("tax", json_number(F.col("l_tax"))),
                    ("returnflag", json_string(F.col("l_returnflag"))),
                    ("linestatus", json_string(F.col("l_linestatus"))),
                    ("shipdate", json_timestamp(F.col("l_shipdate"))),
                ).alias("props"),
            )
        )
        .unionByName(
            lineitem.select("l_partkey", "l_suppkey")
            .distinct()
            .select(
                (_b("l_partkey") * 1000 + _b("l_suppkey") + SUPPLIED_BY_BASE).alias(
                    "id"
                ),
                F.lit("supplied_by").alias("label"),
                (_b("l_partkey") + PART_BASE).alias("src"),
                (_b("l_suppkey") + SUPPLIER_BASE).alias("dst"),
                empty_props.alias("props"),
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
  SELECT l_orderkey * 8 + l_linenumber + {CONTAINS_BASE}, 'contains',
         l_orderkey + {ORDER_BASE}, l_partkey + {PART_BASE}
  FROM lineitem
  UNION ALL
  SELECT l_partkey * 1000 + l_suppkey + {SUPPLIED_BY_BASE}, 'supplied_by',
         l_partkey + {PART_BASE}, l_suppkey + {SUPPLIER_BASE}
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
)
"""
