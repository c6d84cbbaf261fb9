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

from eviction_lab_etl_spark.functions.determinism import RATE, dec, to_dbl
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


@query(
    "complex_small_qty_revenue",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey,
               sum(CAST(l_quantity AS BIGINT)) AS sq,
               count(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           CAST(sum({REVENUE_SQL}) * 10000 AS BIGINT) AS rev_x10k,
           count(*) AS n_lines
    FROM lineitem l
    JOIN per_part pp ON pp.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sq
    GROUP BY p_brand
    """,
)
def complex_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue locked up in small-quantity orders — per
    brand, the revenue of lineitems whose quantity is below 20% of that
    part's average. The classic correlated scalar subquery (avg per part)
    decorrelates into an aggregate-then-join: one shuffle builds the
    |parts|-row (sum, count) table, which re-joins the fact on l_partkey.
    The below-average test uses integer cross-multiplication
    (5*qty*cnt < sum — quantities are integral in this corpus) so both
    engines decide every boundary row identically; revenue is emitted as a
    scaled BIGINT (ten-thousandths — §2.0 rule 10: at brand-level sums the
    engines' decimal→double conversions diverge by 1 ulp, scale-4 vs
    scale-12 division; the scaled integer is exact on both). At 100 TB both
    sides of the self-join shuffle on l_partkey — co-partitioned, no
    broadcast of the fact — and the final brand rollup is a 25-row
    aggregate."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(5 * F.col("l_quantity").cast("long") * F.col("cnt") < F.col("sq"))
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            (F.sum(revenue()) * 10000).cast("long").alias("rev_x10k"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "complex_large_orders",
    oracle="""
    WITH big_orders AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 300
    )
    SELECT c_name, o.o_orderkey, o.o_orderdate, total_qty
    FROM big_orders b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 10
    """,
)
def complex_large_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): orders whose total lineitem
    quantity exceeds 300, joined out to the order and customer rows, top-10
    by quantity. The group-HAVING result is the JOIN INPUT — the aggregate
    (|orders| rows pre-filter, a handful after) reduces before any wide row
    is assembled, so the customer/order joins see only qualifying keys.
    Integer quantities make the HAVING boundary and the ordering exact; the
    top-10 is TakeOrdered (no global sort exchange)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big_orders.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "complex_sole_discount_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numsole
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND CAST(l1.l_discount AS DECIMAL(4,2)) > 0.05
      AND n.n_name = 'NATION_7'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND CAST(l3.l_discount AS DECIMAL(4,2)) > 0.05
      )
    GROUP BY s.s_name
    ORDER BY numsole DESC, s.s_name
    LIMIT 20
    """,
)
def complex_sole_discount_supplier(spark, sf_dir):
    """TPC-H Q21 SHAPE — the hardest reference-class join tree: a semi join
    AND an anti join against the SAME fact table plus a 4-table tree. The
    fixture schema carries no receipt/commit dates, so the Q21 predicate
    'sole late supplier' becomes 'sole deep-discount supplier' (l_discount >
    0.05, decimal-exact) on multi-supplier finished orders — the self-join
    topology, which is what stresses the planner, is identical. The two
    existence probes plan as leftsemi / leftanti with a non-equi suppkey
    mismatch on the orderkey equi-key; at 100 TB all three lineitem
    instances shuffle on l_orderkey — co-partitioned, no re-keying — and
    nation broadcasts."""
    supplier = load(spark, sf_dir, "supplier")
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")

    deep = dec("l_discount") > F.lit(0.05).cast("decimal(4,2)")
    l1 = lineitem.filter(deep).alias("l1")
    l2 = lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = lineitem.filter(deep).select("l_orderkey", "l_suppkey").alias("l3")
    cand = l1.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "leftsemi",
    ).join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "leftanti",
    )
    return (
        cand.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l1.l_orderkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numsole"))
        .orderBy(F.col("numsole").desc(), "s_name")
        .limit(20)
    )


@query(
    "complex_idle_customers",
    oracle="""
    WITH cust AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        UNION ALL
        SELECT c_custkey + 9000000, c_nationkey, c_acctbal
        FROM customer WHERE c_custkey <= 25
    ),
    avg_bal AS (
        SELECT CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS sum_cents,
               count(*) AS n_pos
        FROM cust WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM cust, avg_bal
    WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) * n_pos
            > sum_cents
      AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
      )
    GROUP BY c_nationkey
    """,
)
def complex_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average positive balance who
    have NEVER ordered, bucketed by nation (the fixture schema's country
    column — it has no c_phone), over the orphan-planted corpus (organic
    custkeys all have orders, fixtures.py precedent). Exercises the
    scalar-aggregate subquery
    (the global average joins in as a broadcast 1-row cross) composed with
    an anti join against the orders fact — the 'addressable-but-dormant
    market' report. The above-average test is an integer cross-
    multiplication (bal_cents × n_pos > sum_cents): Spark's avg(DECIMAL)
    rounds to scale 6 while DuckDB's returns DOUBLE, so comparing against a
    computed average is the one place the engines can classify a boundary
    balance differently — comparing exact integers cannot diverge (house
    style of complex_important_stock/Q15). Sums stay decimal-exact per
    §2.0 rule 1; the anti join shuffles on custkey at scale while the
    scalar broadcast costs nothing."""
    base = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    # planted order-less customers (same construction as fixtures.
    # customers_with_orphans, widened to the columns this report needs):
    # organic custkeys all have orders at every tested SF, so without the
    # plant the anti join decides nothing and the green is vacuous
    customer = base.unionByName(
        base.filter(F.col("c_custkey") <= 25).withColumn(
            "c_custkey", F.col("c_custkey") + 9000000
        )
    )
    orders = load(spark, sf_dir, "orders")
    bal_cents = (dec("c_acctbal") * 100).cast("long")
    avg_bal = customer.filter(dec("c_acctbal") > 0).agg(
        F.sum(bal_cents).alias("sum_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(bal_cents * F.col("n_pos") > F.col("sum_cents"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "leftanti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            to_dbl(F.sum(dec("c_acctbal"))).alias("totacctbal"),
        )
    )
