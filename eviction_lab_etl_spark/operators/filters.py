"""Group B — projections / filters / predicates (SURVEY §2.B).

Covers the reference's row-filtering + computed-rate steps (demographics merge
filters and sentinel-coded missing data, ref tags R4/R5/R8 ⚠unverified). The
sentinel discipline (missing = -1/blank in the reference's published CSVs) maps
to NULLs at ingest; ``filter_null_sentinel`` exercises the recode + null-skipping
aggregate semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import CHARGE_SQL, charge
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load


@query(
    "filter_compound",
    oracle="""
    SELECT p_partkey, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_type IN ('ECONOMY', 'PROMO')
      AND p_name LIKE '%widget%'
    """,
)
def filter_compound(spark, sf_dir):
    """Conjunctive predicate mix: range + IN-list + LIKE (R4/R8)."""
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(10, 30)
        & F.col("p_type").isin("ECONOMY", "PROMO")
        & F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_brand", "p_size")


@query(
    "filter_null_sentinel",
    oracle="""
    SELECT count(*) AS cnt_all,
           count(NULLIF(l_discount, 0.0)) AS cnt_nonnull,
           count(DISTINCT NULLIF(l_discount, 0.0)) AS n_distinct
    FROM lineitem
    """,
)
def filter_null_sentinel(spark, sf_dir):
    """Sentinel→NULL recode + null-skipping aggregates (R5: the reference codes
    missing values as -1/blank; here 0.0-discount plays the sentinel)."""
    li = load(spark, sf_dir, "lineitem").withColumn("d", F.nullif(F.col("l_discount"), F.lit(0.0)))
    return li.agg(
        F.count(F.lit(1)).alias("cnt_all"),
        F.count("d").alias("cnt_nonnull"),
        F.count_distinct("d").alias("n_distinct"),
    )


@query(
    "project_computed",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({CHARGE_SQL} AS DOUBLE) AS charge
    FROM lineitem
    """,
)
def project_computed(spark, sf_dir):
    """Per-row computed rate column (eviction-rate computation analog, R4).

    Exact decimal chain (no float arithmetic, no rounding) then a terminal
    double cast — deterministic across engines and partitionings (§2.0 rule 1).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge().cast("double").alias("charge"),
    )
