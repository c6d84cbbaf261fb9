"""Group F — sorts / limits / top-k (SURVEY §2.F).

The reference's top-100-cities list (R8) and null-aware orderings of
sentinel-coded data (R5). Spark plans a global ORDER BY + LIMIT as
TakeOrderedAndProject: each partition keeps its local top-k and only k rows per
partition reach the driver — no global sort at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import dec, to_dbl
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load


@query(
    "sort_multi_topk",
    oracle="""
    SELECT o_custkey AS c_custkey, CAST(spend_dec AS DOUBLE) AS spend
    FROM (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS spend_dec
          FROM orders GROUP BY o_custkey)
    ORDER BY spend_dec DESC, c_custkey
    LIMIT 10
    """,
)
def sort_multi_topk(spark, sf_dir):
    """Global top-10 customers by total spend (top-100 cities analog, R8).
    Ordered by the exact decimal with a key tiebreak (§2.0 rule 3)."""
    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(dec("o_totalprice")).alias("spend_dec")
    )
    return (
        spend.orderBy(F.col("spend_dec").desc(), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", to_dbl(F.col("spend_dec")).alias("spend"))
    )


@query(
    "sort_nulls",
    oracle="""
    SELECT c_custkey, CAST(spend_dec AS DOUBLE) AS spend
    FROM customer
    LEFT JOIN (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS spend_dec
               FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey) s
      ON o_custkey = c_custkey
    WHERE c_custkey < 20
    ORDER BY spend_dec ASC NULLS FIRST, c_custkey
    LIMIT 10
    """,
)
def sort_nulls(spark, sf_dir):
    """NULLS FIRST ordering over sentinel-coded gaps (R5): customers with no
    1998 orders sort ahead of any spender."""
    customer = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 20)
    spend98 = (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1998)
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("spend_dec"))
    )
    return (
        customer.join(spend98, customer.c_custkey == spend98.o_custkey, "left")
        .orderBy(F.col("spend_dec").asc_nulls_first(), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", to_dbl(F.col("spend_dec")).alias("spend"))
    )
