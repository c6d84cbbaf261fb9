"""Remaining TPC-H query shapes, adapted to the fixture schema.

complex.py covers Q3/Q5/Q10/Q17/Q18/Q21/Q22 analogs; this module completes the
family so every one of the 22 canonical shapes a reference-class report writer
reaches for has a driver-verified analog (the fixture schema lacks partsupp,
ship modes, and receipt/commit dates, so a few predicates are re-grounded on
columns that exist — the JOIN TOPOLOGY and aggregation shape of each query,
which is what stresses Catalyst, is preserved).

Determinism (SURVEY §2.0): every revenue sum is an exact decimal chain emitted
as a scaled BIGINT (rule 10 — brand/nation-level decimal→double casts diverged
by 1 ulp once in round 4, so scaled integers are the house style for new
sums); every ratio is derived from two exact integers (one well-defined double
each); every top-k carries a full unique-key tiebreak.

Scale notes are inline per operator; common to all: lineitem never broadcasts,
dimension tables (≤ thousands of rows at any SF) always do, and self-joins of
lineitem key on l_orderkey/l_partkey so co-partitioning holds through AQE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import RATE, big, dec
from eviction_lab_etl_spark.operators.complex import REVENUE_SQL, revenue
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load


@query(
    "complex_late_priority_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_late
    FROM orders o
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def complex_late_priority_orders(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): orders from one year with at
    least one lineitem shipping more than 60 days after the order date,
    counted per priority. The fixture has no commit/receipt dates, so "late"
    is re-grounded as ship-lag > 60d — the shape (correlated EXISTS with a
    cross-table date predicate, planned as a left-semi join) is identical.
    At 100 TB: both sides shuffle on the orderkey; the semi join keeps the
    probe side narrow (two columns) and the 5-row aggregate is trivial."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


@query(
    "complex_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                    * CAST(l_discount AS DECIMAL(18,6))) * 10000 AS BIGINT)
               AS rev_x10k,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
      AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
      AND CAST(l_quantity AS BIGINT) < 24
    """,
)
def complex_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): the classic
    scan-filter-aggregate with range predicates on three columns and no join.
    Everything pushes to the parquet scan except the decimal BETWEEN (the
    discount bound must be decided on exact decimals, not doubles, so both
    engines classify the 0.05/0.07 boundary rows identically). Revenue =
    price × discount summed exactly, emitted ×10⁴ (scale-4 product → the
    scaled integer is exact). At 100 TB this is the pure scan-throughput
    benchmark: one map-side partial sum, a single-row exchange, no shuffle
    of data rows at all."""
    li = load(spark, sf_dir, "lineitem")
    disc = dec("l_discount").cast(RATE)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (disc >= F.lit(0.05).cast(RATE))
            & (disc <= F.lit(0.07).cast(RATE))
            & (F.col("l_quantity").cast("long") < 24)
        )
        .agg(
            (F.sum(dec("l_extendedprice") * disc) * 10000)
            .cast("long")
            .alias("rev_x10k"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "complex_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum({REVENUE_SQL}) * 10000 AS BIGINT) AS rev_x10k,
           count(*) AS n_lines
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1998-01-01'
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def complex_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): revenue flowing between two specific
    nations in either direction, per shipping year. The two nation dimension
    instances attach to DIFFERENT branches (supplier side vs customer side)
    and the disjunctive pair filter can only be applied after both are bound
    — the planner must keep both nationkeys alive through the 5-way tree.
    At 100 TB: lineitem⋈orders shuffles on the orderkey; supplier, customer
    and both nation instances broadcast; the pair filter prunes to two
    nations' traffic before the 4-group aggregate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.withColumnRenamed("n_name", "supp_nation").alias("n1")
    n2 = nation.withColumnRenamed("n_name", "cust_nation").alias("n2")
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", big(F.year("l_shipdate")).alias("l_year"))
        .agg(
            (F.sum(revenue()) * 10000).cast("long").alias("rev_x10k"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "complex_market_share",
    oracle=f"""
    WITH flows AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {REVENUE_SQL} AS rev,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n2.n_regionkey
        WHERE r_name = 'ASIA'
          AND p_type = 'ECONOMY'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate <  DATE '1998-01-01'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev END) * 10000
                AS BIGINT) AS num_x10k,
           CAST(sum(rev) * 10000 AS BIGINT) AS den_x10k,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev END) * 10000
                     AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(rev) * 10000 AS BIGINT) AS DOUBLE) AS mkt_share
    FROM flows
    GROUP BY o_year
    """,
)
def complex_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): of the ECONOMY-part revenue
    sold into ASIA customers, the fraction supplied from NATION_7, per order
    year. The deepest dimension fan in the family — 8 tables, with nation
    bound twice on different branches and region hanging off the CUSTOMER
    side. The share is num/den of two exact scaled integers (each decimal
    sum is exact, so each integer is exact, so the double quotient is the
    same correctly-rounded value in both engines — rule-1/rule-10
    composition). NULL num (a year with zero NATION_7 flow) stays NULL both
    sides. At 100 TB: one orderkey shuffle joins the two facts; every
    dimension (incl. the filtered part side) broadcasts; the conditional
    aggregate is map-side partial over ≤ a few years of groups."""
    li = load(spark, sf_dir, "lineitem")
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    # customer-side nation restricted to the ASIA region (region join folded
    # into the broadcast dimension — same rows, one fewer join in the big tree)
    n2 = (
        nation.join(
            load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_7", revenue()))
    den = F.sum(revenue())
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(big(F.year("o_orderdate")).alias("o_year"))
        .agg(
            (num * 10000).cast("long").alias("num_x10k"),
            (den * 10000).cast("long").alias("den_x10k"),
        )
        .select(
            "o_year",
            "num_x10k",
            "den_x10k",
            (F.col("num_x10k").cast("double") / F.col("den_x10k").cast("double")).alias(
                "mkt_share"
            ),
        )
    )


@query(
    "complex_product_profit",
    oracle=f"""
    SELECT n_name,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum({REVENUE_SQL}
                    - CAST(p_retailprice AS DECIMAL(18,6))
                      * CAST(l_quantity AS DECIMAL(18,6))) * 10000 AS BIGINT)
               AS profit_x10k
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def complex_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (product type profit): per supplier nation and order
    year, profit on one product line. The fixture has no partsupp, so unit
    cost is re-grounded as p_retailprice (the join topology — fact ⋈ part ⋈
    supplier ⋈ orders ⋈ nation with a LIKE filter on part — is Q9's).
    Profit = exact decimal revenue minus an exact (12,2)×(4,0) cost product;
    the difference is exact at scale 4, summed and emitted ×10⁴. At 100 TB:
    the only shuffle joins lineitem to orders on the orderkey (part/supplier/
    nation broadcast after the LIKE filter prunes part), then a ~nations×years
    aggregate."""
    li = load(spark, sf_dir, "lineitem")
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = dec("p_retailprice") * F.col("l_quantity").cast("decimal(4,0)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", big(F.year("o_orderdate")).alias("o_year"))
        .agg(((F.sum(revenue() - cost)) * 10000).cast("long").alias("profit_x10k"))
    )


@query(
    "complex_cust_order_histogram",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def complex_cust_order_histogram(spark, sf_dir):
    """TPC-H Q13 shape (customer distribution): histogram of customers by
    how many qualifying orders they placed — INCLUDING the zero bucket,
    which is why the outer join must run before the first aggregate (an
    inner join would silently drop order-less customers; the fixture's
    orphan-free customers make the filter on priority the thing that
    creates empty groups). Two chained aggregations: per-customer count,
    then count-of-counts. At 100 TB: one custkey shuffle for the left join
    + first agg (orders pre-filtered map-side), then a tiny histogram
    aggregate over ≤ max-orders-per-customer distinct keys."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "complex_promo_revenue",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} END) * 10000
                AS BIGINT) AS promo_x10k,
           CAST(sum({REVENUE_SQL}) * 10000 AS BIGINT) AS total_x10k,
           100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} END)
                             * 10000 AS BIGINT) AS DOUBLE)
                 / CAST(CAST(sum({REVENUE_SQL}) * 10000 AS BIGINT) AS DOUBLE)
               AS promo_pct
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= DATE '1996-03-01'
      AND l_shipdate <  DATE '1996-04-01'
    """,
)
def complex_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): the percentage of one month's
    revenue attributable to PROMO parts. Single join + conditional
    aggregate; the headline number is a ratio, so both terms are exact
    scaled integers first and the percentage is derived from them (one
    double division + one exact ×100 — identical correctly-rounded result
    in both engines). At 100 TB: the month filter pushes to the scan, part
    broadcasts, and the whole query is one map-side partial aggregate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.sum(F.when(F.col("p_type") == "PROMO", revenue())) * 10000)
            .cast("long")
            .alias("promo_x10k"),
            (F.sum(revenue()) * 10000).cast("long").alias("total_x10k"),
        )
        .select(
            "promo_x10k",
            "total_x10k",
            (
                F.lit(100.0)
                * F.col("promo_x10k").cast("double")
                / F.col("total_x10k").cast("double")
            ).alias("promo_pct"),
        )
    )


@query(
    "complex_top_supplier",
    oracle=f"""
    WITH supp_rev AS (
        SELECT l_suppkey,
               CAST(sum({REVENUE_SQL}) * 10000 AS BIGINT) AS rev_x10k
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate <  DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rev_x10k
    FROM supp_rev
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev_x10k = (SELECT max(rev_x10k) FROM supp_rev)
    """,
)
def complex_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): the supplier(s) with the maximum
    revenue in one quarter — an aggregate compared against a scalar
    aggregate OF ITSELF. The revenue table is built once and consumed twice
    (group rows + global max); equality is decided on exact scaled integers,
    so ties select identically in both engines. At 100 TB: one suppkey
    shuffle builds supp_rev; the 1-row max broadcasts back across it (no
    second scan of the fact — Spark reuses the shuffle output for both
    consumers); supplier broadcasts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    supp_rev = li.groupBy("l_suppkey").agg(
        (F.sum(revenue()) * 10000).cast("long").alias("rev_x10k")
    )
    top = supp_rev.agg(F.max("rev_x10k").alias("max_rev"))
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp_rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_x10k") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "rev_x10k")
    )
