"""Group G — set operations (SURVEY §2.G).

The reference unions per-level/per-year CSV slices into combined tables with a
provenance tag (R7) and diffs output generations for QA (R12).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load


def _orders_year(spark, sf_dir, year: int):
    return load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == year)


@query(
    "setop_union_all",
    oracle="""
    SELECT slice_tag, count(*) AS cnt
    FROM (
        SELECT 'y95' AS slice_tag FROM orders WHERE year(o_orderdate) = 1995
        UNION ALL
        SELECT 'y96' AS slice_tag FROM orders WHERE year(o_orderdate) = 1996
    )
    GROUP BY slice_tag
    """,
)
def setop_union_all(spark, sf_dir):
    """UNION ALL with provenance tag (year-slice concatenation, R7)."""
    y95 = _orders_year(spark, sf_dir, 1995).select(F.lit("y95").alias("slice_tag"))
    y96 = _orders_year(spark, sf_dir, 1996).select(F.lit("y96").alias("slice_tag"))
    return y95.unionByName(y96).groupBy("slice_tag").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "setop_union_dedup",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def setop_union_dedup(spark, sf_dir):
    """UNION DISTINCT of two segment slices (R7)."""
    customer = load(spark, sf_dir, "customer")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    machinery = customer.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return building.union(machinery).distinct()


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def setop_except(spark, sf_dir):
    """EXCEPT (distinct semantics): generation diffing for QA (R12).
    DataFrame.subtract == SQL EXCEPT DISTINCT."""
    y95 = _orders_year(spark, sf_dir, 1995).select("o_custkey")
    y96 = _orders_year(spark, sf_dir, 1996).select("o_custkey")
    return y95.subtract(y96)


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def setop_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics), R12."""
    y95 = _orders_year(spark, sf_dir, 1995).select("o_custkey")
    y96 = _orders_year(spark, sf_dir, 1996).select("o_custkey")
    return y95.intersect(y96)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def setop_except_all(spark, sf_dir):
    """EXCEPT ALL (multiset semantics): a customer with three 1995 orders and
    one 1996 order keeps TWO rows — the bag difference generation-diffing
    needs when multiplicity itself is the signal (how many MORE slices does
    build A have than build B). DataFrame.exceptAll == SQL EXCEPT ALL; at
    scale it plans as one hash-partitioned count-matching join on the key,
    same shuffle profile as the distinct variant."""
    y95 = _orders_year(spark, sf_dir, 1995).select("o_custkey")
    y96 = _orders_year(spark, sf_dir, 1996).select("o_custkey")
    return y95.exceptAll(y96)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def setop_intersect_all(spark, sf_dir):
    """INTERSECT ALL (multiset): min(multiplicity) copies per key — the bag
    intersection. DataFrame.intersectAll == SQL INTERSECT ALL."""
    y95 = _orders_year(spark, sf_dir, 1995).select("o_custkey")
    y96 = _orders_year(spark, sf_dir, 1996).select("o_custkey")
    return y95.intersectAll(y96)
