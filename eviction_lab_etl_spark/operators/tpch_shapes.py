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


@query(
    "complex_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                   AS min_cents
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, s_suppkey, s_name, n_name, min_cents
    FROM supply
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE p_size <= 10 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      AND min_cents = (
          SELECT min(s2.min_cents)
          FROM supply s2
          JOIN supplier sup2 ON sup2.s_suppkey = s2.l_suppkey
          JOIN nation n2   ON n2.n_nationkey = sup2.s_nationkey
          JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
          WHERE s2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY p_partkey, s_suppkey
    LIMIT 25
    """,
)
def complex_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum cost supplier): for one part class, the
    EUROPE supplier(s) offering the minimum cost, where the qualifying
    minimum is itself a correlated aggregate over the same supply relation.
    The fixture has no partsupp, so the supply relation is derived from
    lineitem (per part×supplier minimum observed line total, in exact
    cents). The correlated min decorrelates into a per-part aggregate that
    joins back on (partkey, min_cents) — cost equality on exact integers
    keeps ties (all minimal suppliers) identical in both engines, and the
    final ordering carries the full (p_partkey, s_suppkey) key. At 100 TB:
    the supply build shuffles lineitem once on (partkey, suppkey); the
    region-filtered per-part min is a second small aggregate; every
    dimension broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    from eviction_lab_etl_spark.functions.determinism import cents

    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents("l_extendedprice")).alias("min_cents")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    euro_supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    euro_supply = (
        supply.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    per_part_min = euro_supply.groupBy(F.col("p_partkey").alias("mp_key")).agg(
        F.min("min_cents").alias("part_min")
    )
    return (
        euro_supply.join(
            F.broadcast(per_part_min),
            (F.col("p_partkey") == F.col("mp_key"))
            & (F.col("min_cents") == F.col("part_min")),
        )
        .select("p_partkey", "s_suppkey", "s_name", "n_name", "min_cents")
        .orderBy("p_partkey", "s_suppkey")
        .limit(25)
    )


@query(
    "complex_important_stock",
    oracle="""
    WITH nation_supply AS (
        SELECT l_partkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                        AS BIGINT) AS value_cents
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_key, value_cents
    FROM nation_supply
    WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM nation_supply)
    ORDER BY value_cents DESC, p_key
    LIMIT 50
    """,
)
def complex_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): parts whose supply
    value from one nation exceeds 0.1% of that nation's total supply value —
    a grouped aggregate filtered against a scalar aggregate OF THE SAME
    intermediate. Values are exact cents (bigint), so the 0.1% threshold is
    an integer cross-multiplication (value×1000 > total) decided identically
    by both engines; overflow headroom: cents sums stay < 10^15 even at the
    100 TB design point per-nation, and the threshold product < 10^18. One
    partkey shuffle builds the supply table; Spark reuses the shuffle for
    the 1-row total, which broadcasts back."""
    from eviction_lab_etl_spark.functions.determinism import cents

    li = load(spark, sf_dir, "lineitem")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    nation_supply = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.sum(cents("l_extendedprice")).alias("value_cents"))
    )
    total = nation_supply.agg(F.sum("value_cents").alias("grand_total"))
    return (
        nation_supply.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("grand_total"))
        .select("p_key", "value_cents")
        .orderBy(F.col("value_cents").desc(), "p_key")
        .limit(50)
    )


@query(
    "complex_returnflag_priority",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
               AS high_cnt,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
               AS low_cnt
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def complex_returnflag_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipping mode / order priority): per category of the
    fact (the fixture has no ship mode, so return flag stands in), how many
    of one year's lineitems belong to critical- vs normal-priority orders —
    the join + dual conditional-count shape. At 100 TB: one orderkey
    shuffle, map-side partial counts, 3 output rows."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count_if(high).alias("high_cnt"),
            F.count_if(~high).alias("low_cnt"),
        )
    )


@query(
    "complex_parts_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS psize,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, psize
    ORDER BY supplier_cnt DESC, p_brand, p_type, psize
    LIMIT 30
    """,
)
def complex_parts_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers can supply each (brand, type, size) combination, with
    negative exclusions on part attributes AND a NOT-IN exclusion of
    flagged suppliers (negative-balance stands in for the complaints
    filter). The supply relation is lineitem (no partsupp in the fixture).
    NOT IN over a non-nullable key plans as an anti join against a
    broadcast-able exclusion list; the distinct count shuffles once on the
    group key with partial distinct aggregation below the exchange."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    flagged = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(flagged), F.col("l_suppkey") == F.col("s_suppkey"), "leftanti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", big("p_size").alias("psize"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "psize")
        .limit(30)
    )


@query(
    "complex_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(sum({REVENUE_SQL}) * 10000 AS BIGINT) AS rev_x10k,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
           AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 35)
    """,
)
def complex_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue): revenue matched by a 3-branch
    disjunction where each branch constrains BOTH sides of the join (part
    attributes AND lineitem quantity). The planner can push the p_brand
    disjunction to the part scan, but the cross-table residual must stay a
    join filter — the classic test that OR predicates don't defeat pushdown
    entirely. Integer quantity/size bounds make every branch decision
    exact. At 100 TB: part (pre-filtered to three brands) broadcasts; the
    single-row aggregate needs no data shuffle."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity").cast("long")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & qty.between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 20) & qty.between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 40) & qty.between(20, 35))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            (F.sum(revenue()) * 10000).cast("long").alias("rev_x10k"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "complex_excess_share_supplier",
    oracle="""
    WITH pair_qty AS (
        SELECT l_suppkey, l_partkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sup_qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'cold%'
          AND l_shipdate >= DATE '1997-01-01'
          AND l_shipdate <  DATE '1998-01-01'
        GROUP BY l_suppkey, l_partkey
    ),
    part_total AS (
        SELECT l_partkey, CAST(sum(sup_qty) AS BIGINT) AS total_qty
        FROM pair_qty GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM pair_qty
    JOIN part_total USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE sup_qty * 10 > total_qty * 3
    ORDER BY s_suppkey
    """,
)
def complex_excess_share_supplier(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers who shipped
    more than 30% of some cold-part's one-year volume — a nested aggregate
    (per supplier×part, then per part) whose comparison feeds a semi-join
    into the supplier dimension. Quantities are integral, so the 30% share
    test is the exact cross-product sup_qty×10 > total×3. At 100 TB: one
    (suppkey, partkey) shuffle builds pair_qty; the per-part total reuses
    it keyed on partkey; qualifying (supplier) keys are few and the
    dimension joins broadcast."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("cold%"))
        .select("p_partkey")
    )
    pair_qty = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sup_qty"))
    )
    part_total = pair_qty.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum("sup_qty").alias("total_qty")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        pair_qty.join(part_total, F.col("l_partkey") == F.col("pt_key"))
        .filter(F.col("sup_qty") * 10 > F.col("total_qty") * 3)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
        .orderBy("s_suppkey")
    )
