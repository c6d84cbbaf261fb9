"""Time-window operators (SURVEY §2.K, batch-checkable half).

F.window / F.session_window produce identical results in batch and streaming
execution, so these three are hash-checked against DuckDB in batch mode while
remaining the exact aggregation cores reused by the true streaming operators
in stream_ops.py.

Timestamp outputs are emitted as dates or epoch integers (never raw
timestamps): Spark renders TimestampType as tz-aware where DuckDB is naive,
which would break value-hashing even for identical instants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import big, dec, to_dbl
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load


@query(
    "stream_tumbling",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS wstart,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def stream_tumbling(spark, sf_dir):
    """1-day tumbling window aggregate (S). In streaming this is the incremental
    daily-stats build; the batch result is identical by construction."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            to_dbl(F.sum(dec("value"))).alias("sum_value"),
        )
        .select(F.to_date("w.start").alias("wstart"), "cnt", "sum_value")
    )


@query(
    "stream_sliding",
    oracle="""
    SELECT wstart, count(*) AS cnt
    FROM (
        SELECT unnest([
            CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800,
            CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800
        ]) AS wstart
        FROM events
    )
    GROUP BY wstart
    """,
)
def stream_sliding(spark, sf_dir):
    """1-hour window sliding every 30 minutes (S): every event lands in exactly
    two windows. Output key is epoch seconds (window starts are :00/:30
    aligned). The oracle constructs the same two aligned starts per event."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(big(F.unix_timestamp(F.col("w.start"))).alias("wstart"), "cnt")
    )


@query(
    "stream_session",
    oracle="""
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    i AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM o
    )
    SELECT user_id,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start,
           count(*) AS n_events
    FROM i
    GROUP BY user_id, grp
    """,
)
def stream_session(spark, sf_dir):
    """30-minute-gap sessionization per user (S) via native session_window —
    Spark's dynamic-gap session operator, identical in batch and streaming.
    The oracle is the classic gaps-and-islands construction; the break
    condition is `>= gap` because Spark sessions span [ts, ts+gap).
    Output session_start as epoch microseconds (bigint) for hash stability."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("start_ts"))
        .select(
            "user_id",
            F.unix_micros("start_ts").alias("session_start"),
            "n_events",
        )
    )
