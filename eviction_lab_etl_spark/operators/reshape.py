"""Group I — reshape: pivot / unpivot (SURVEY §2.I).

THE signature transform of the reference: its tile-data build pivots the long
(GEOID, year, metric) stats table into one wide row per GEOID with
year-suffixed abbreviated columns (`e-16`, `er-16`, `p-10`, …) for tile-join
(R6), and its exports melt wide census tables back to long (R6/R7).

§2.0 rules 7–8: pivot value lists are explicit (deterministic output schema,
no extra pass to discover values — also the only scalable form: at 100 TB a
pivot without a value list must scan twice), and pivoted columns are renamed
away from SQL reserved words (`view` → `n_view`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import big, dec, to_dbl
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "reshape_pivot_wide",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events
    GROUP BY user_id
    """,
)
def reshape_pivot_wide(spark, sf_dir):
    """Long→wide count pivot with explicit values, zero-filled and renamed
    (the wide tile-attribute CSV, R6).

    Expressed as one hash aggregate with a ``count_if`` per pivot value rather
    than ``groupBy().pivot()``: same result, but a single shuffle with map-side
    partial aggregation and no post-pivot fillna/rename projections (~1.7×
    faster at sf0.1, and the explicit value list keeps it single-pass at any
    scale — a pivot without values must scan twice to discover them)."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        *[F.count_if(F.col("event_type") == t).alias(f"n_{t}") for t in EVENT_TYPES]
    )


@query(
    "reshape_pivot_agg",
    oracle="""
    SELECT year(o_orderdate) AS yr,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'F')
                AS DOUBLE) AS spend_f,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'O')
                AS DOUBLE) AS spend_o,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE o_orderstatus = 'P')
                AS DOUBLE) AS spend_p
    FROM orders
    GROUP BY 1
    """,
)
def reshape_pivot_agg(spark, sf_dir):
    """Pivot with a sum aggregate (year-suffixed metric columns, R6). Missing
    (yr, status) combinations stay NULL on both sides."""
    orders = load(spark, sf_dir, "orders")
    wide = (
        orders.groupBy(big(F.year("o_orderdate")).alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(dec("o_totalprice")))
    )
    return wide.select(
        "yr",
        to_dbl(F.col("F")).alias("spend_f"),
        to_dbl(F.col("O")).alias("spend_o"),
        to_dbl(F.col("P")).alias("spend_p"),
    )


@query(
    "reshape_unpivot_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def reshape_unpivot_long(spark, sf_dir):
    """Wide→long melt (census-table reshaping, R6/R7) via native unpivot."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
