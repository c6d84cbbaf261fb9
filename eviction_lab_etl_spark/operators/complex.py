"""Complex multi-join analytical queries (TPC-H Q3/Q5/Q10 analogs).

The §2 inventory tests each operator in isolation; these three exercise what a
reference user's *real* reports look like — 3-to-6-table join trees with
selective filters on several tables at once — and therefore what Catalyst's
join reordering, filter pushdown through joins, and AQE join-strategy
switching actually have to get right. Shapes map to the reference's merge
flows (R5 eviction⋈demographics⋈geography) at report complexity.

Determinism (§2.0): revenue is an exact decimal chain summed exactly, with a
terminal double cast; every top-k orders by the emitted value plus a unique
key, so both engines select the same set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import RATE, dec
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load


def revenue() -> Column:
    """Exact decimal l_extendedprice * (1 - l_discount): (12,2)×(4,2) → (17,4),
    every intermediate Long-backed and unrounded (same discipline as charge())."""
    one_minus = (F.lit(1) - dec("l_discount")).cast(RATE)
    return dec("l_extendedprice") * one_minus


# DuckDB fragment computing the identical exact value (wider types are fine —
# only the value must match, and both chains are exact).
REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(8,6))"
)


@query(
    "complex_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum({REVENUE_SQL}) AS DOUBLE) AS rev,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1996-01-01'
      AND l_shipdate  > DATE '1996-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY rev DESC, l_orderkey
    LIMIT 10
    """,
)
def complex_shipping_priority(spark, sf_dir):
    """TPC-H Q3 analog: top-10 highest-revenue orders taken before a cutoff
    with lineitems still shipping after it, for one market segment. Filters on
    all three tables must push through the join tree; the dimension-side
    (filtered customer) broadcasts."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue()).cast("double").alias("rev"))
        .select("l_orderkey", "rev", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("rev").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "complex_region_revenue",
    oracle=f"""
    SELECT n_name, CAST(sum({REVENUE_SQL}) AS DOUBLE) AS rev,
           count(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
                 AND o_orderdate >= DATE '1996-01-01'
                 AND o_orderdate <  DATE '1997-01-01'
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def complex_region_revenue(spark, sf_dir):
    """TPC-H Q5 analog: per-nation revenue from local suppliers (supplier and
    customer in the same nation) for one region-year. Six tables; the
    s_nationkey = c_nationkey condition crosses branches of the join tree, so
    the optimizer must keep both nationkeys alive until the supplier join."""
    nation = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .join(load(spark, sf_dir, "nation"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(revenue()).cast("double").alias("rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "complex_returned_revenue",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(sum({REVENUE_SQL}) AS DOUBLE) AS rev
    FROM customer
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN orders   ON o_custkey = c_custkey
                 AND o_orderdate >= DATE '1996-01-01'
                 AND o_orderdate <  DATE '1997-01-01'
    JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY rev DESC, c_custkey
    LIMIT 20
    """,
)
def complex_returned_revenue(spark, sf_dir):
    """TPC-H Q10 analog: top-20 customers by revenue lost to returns in one
    year — the reference's rankings flow (R8) at real join depth."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue()).cast("double").alias("rev"))
        .orderBy(F.col("rev").desc(), "c_custkey")
        .limit(20)
    )
