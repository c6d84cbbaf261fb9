"""Time-series completion operators (extension): gap-fill + LOCF.

The TimescaleDB `time_bucket_gapfill` / kdb `fills` semantic: analytical
consumers (charts, anomaly detectors, training-feature windows) need DENSE
per-entity time series, but event facts are sparse — a user with no purchase
on a day simply has no row. Completion = calendar spine × entity set, left
join the sparse aggregates, zero-fill the counts, and carry the last
observed value forward (LOCF) for level-like measures.

Scale notes: the output is inherently dense (|entities| × |buckets|) — the
operator's cost floor is its own result size, so production bounds the
calendar window and bucket grain, never the plan. The spine build is a
broadcast cross (buckets are a tiny literal range); the sparse side joins on
(entity, bucket) with one shuffle; LOCF is one window over the already
co-partitioned entity key.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import big, dec, to_dbl
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH bounds AS (
        SELECT min(date_trunc('day', ts)) AS d0, max(date_trunc('day', ts)) AS d1
        FROM events
    ),
    days AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM bounds
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    daily AS (
        SELECT user_id, date_trunc('day', ts) AS d, count(*) AS n,
               sum(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT s.user_id,
           CAST(CAST(s.d AS DATE) AS VARCHAR) AS day,
           coalesce(dl.n, 0) AS n_purchases,
           CAST(last_value(dl.rev IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS locf_revenue
    FROM (SELECT u.user_id, days.d FROM users u CROSS JOIN days) s
    LEFT JOIN daily dl ON dl.user_id = s.user_id AND dl.d = s.d
    """,
)
def ts_gapfill_locf(spark, sf_dir):
    """Daily per-user purchase series, gap-filled over the corpus's full day
    span: every (user, day) cell exists, counts zero-fill, and revenue
    carries forward (LOCF) from the user's last purchasing day — NULL until
    the first one, exactly the fill semantics a feature pipeline needs
    (zero for flow measures, carry for level measures). Revenue is summed
    in exact decimal before the terminal double cast; LOCF only COPIES
    values, so no float arithmetic crosses rows (§2.0 rule 1)."""
    events = load(spark, sf_dir, "events")
    bounds = events.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    users = events.select("user_id").distinct()
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("value")).alias("rev"))
    )
    spine = users.crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            F.col("d").cast("string").alias("day"),
            big(F.coalesce(F.col("n"), F.lit(0))).alias("n_purchases"),
            to_dbl(F.last("rev", ignorenulls=True).over(w)).alias("locf_revenue"),
        )
    )
