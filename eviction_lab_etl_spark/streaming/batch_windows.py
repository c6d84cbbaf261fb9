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


# Shared by stream_session (native session_window) and
# stream_session_skewsafe (two-phase bucketed form): both must hash to the
# SAME oracle — that identity is what proves the skew-safe rewrite exact.
_SESSION_30M_ORACLE = """
    WITH o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    i AS (
        -- running sum ordered by (ts, event_id), matching the brk window:
        -- with duplicate (user_id, ts) rows an ORDER BY ts alone would be
        -- tie-order-nondeterministic and could split a session differently
        -- across runs
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM o
    )
    SELECT user_id,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start,
           count(*) AS n_events
    FROM i
    GROUP BY user_id, grp
    """


@query("stream_session", oracle=_SESSION_30M_ORACLE)
def stream_session(spark, sf_dir):
    """30-minute-gap sessionization per user (S) via native session_window —
    Spark's dynamic-gap session operator, identical in batch and streaming.
    The oracle is the classic gaps-and-islands construction; the break
    condition is STRICTLY `> gap`: measured empirically (round 5), Spark
    merges an event landing at exactly last_ts + gap — the session interval
    is closed at its end, [ts, last_ts+gap] — so `>=` would split a
    session Spark keeps whole on exact-gap ties (latent on organic
    microsecond data, decided by tests/test_library.py's boundary cases).
    Output session_start as epoch microseconds (bigint) for hash stability.

    DISPATCH RULE (which form to run): this native form is correct and
    cheapest when no single user's event count dwarfs a task — streaming
    state-store execution is per-key incremental anyway, and in batch the
    per-key cost is one in-memory sort. For BATCH backfills where any key
    may hold ≳ a few million events (a bot, a viral doc — anything past
    ~one task's comfortable sort), call ``sessionize`` (the default,
    skew-safe entry point below): same result by shared oracle, per-key
    serial work proportional to sessions, not events. Measured at 6 M
    events / one 90%-hot key (tools/skew_stress.py): 45 s → 12 s (3.8×)
    on the loaded r5 host, 7.6 s → 5.2 s (1.5×) re-measured idle in r6 —
    the single-task serial sort is the long pole exactly when the cluster
    has no spare cores to hide it, which is the 100 TB operating point."""
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


def sessionize_two_phase(events, gap: str = "30 minutes", bucket_minutes: int = 1440):
    """Hot-key-safe sessionization: the scalable rewrite of
    ``groupBy(session_window(ts, gap), user_id)`` for skewed user
    distributions.

    Native session_window partitions the exchange by user_id alone, and its
    map-side partial aggregate keys on the EXACT pre-merge [ts, ts+gap)
    window — so a viral user's rows all land in one reducer whose
    Sort+MergingSessions runs single-threaded, and AQE cannot help (its skew
    split applies to join exchanges, not aggregation exchanges). This
    operator makes the per-key serial step proportional to SESSIONS, not
    EVENTS:

    - **Phase 1** sessionizes within (user_id, time-bucket): the grouping
      key gains an integer bucket index (``unix_micros(ts) div bucket`` —
      session_window cannot be combined with a second ``window()``
      expression), so the exchange hashes on (user_id, bucket) and a hot
      user fans out over every bucket it spans.
    - **Phase 2** interval-merges each user's bucket-local sessions (running
      max of session end; a session chains iff its start <= that max — the
      same closed-interval [start, last_ts+gap] overlap rule session_window
      applies to events). Input here is one row per LOCAL SESSION, orders of magnitude
      smaller than the event stream, so the per-user window is trivially
      cheap even for the hottest key.

    tools/skew_stress.py measures both forms under a 90%-hot-user
    distribution; tests/test_oracle_diff.py proves exact equality with the
    native operator via the shared oracle.
    """
    from pyspark.sql import Window

    bucket_us = bucket_minutes * 60 * 1_000_000
    local = (
        events.groupBy(
            "user_id",
            F.expr(f"unix_micros(ts) div {bucket_us}").alias("bkt"),
            F.session_window("ts", gap).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id", F.col("w.start").alias("start"), F.col("w.end").alias("end"), "n"
        )
    )
    w_ord = Window.partitionBy("user_id").orderBy("start", "end")
    prev_end = F.max("end").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    chained = local.withColumn(
        # strict >: Spark's session interval is closed at its end (an event
        # at exactly last_ts + gap merges), so equal start/end must chain
        "brk",
        F.when(prev_end.isNull() | (F.col("start") > prev_end), 1).otherwise(0),
    ).withColumn(
        "grp", F.sum("brk").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    )
    return chained.groupBy("user_id", "grp").agg(
        F.min("start").alias("start_ts"), F.sum("n").alias("n_events")
    )


def sessionize(events, gap: str = "30 minutes"):
    """THE batch sessionization entry point — skew-safe by default.

    Always runs the two-phase bucketed form (``sessionize_two_phase``): on
    un-skewed data it costs a bounded constant factor (measured 1.3–1.7×
    across 1×/10×/30× of sf0.1, narrowing as data grows —
    tools/scale_stress.py; the extra interval-merge window runs over one
    row per LOCAL SESSION, so the overhead cannot grow with per-key event
    counts), while on skewed data it is the only form whose hot-key cost
    stays bounded (measured at one 90%-hot key over 6 M events: 3.8×
    faster on the loaded r5 host, 1.5× re-measured idle in r6 — the
    advantage is the serial-sort time the host cannot hide, so it grows
    with both key size and cluster utilization — tools/skew_stress.py).
    Defaulting to it therefore needs no cardinality
    estimate, no sampling pass, and no tuning knob that can be wrong; pay
    ≤1.7× bounded on the easy case to avoid unbounded serial collapse on
    the hard one. Use native ``session_window`` directly
    only in STREAMING (state-store execution is per-key incremental, no
    monolithic per-key sort exists there). Returns
    (user_id, start_ts, n_events); exact equality with the native operator
    is driver-hash-checked via ``stream_session_skewsafe`` and plan-pinned
    by tests/test_plans.py."""
    return sessionize_two_phase(events, gap=gap)


@query("stream_session_skewsafe", oracle=_SESSION_30M_ORACLE)
def stream_session_skewsafe(spark, sf_dir):
    """``sessionize`` (the default skew-safe entry point) over the events
    table — hash-checked against the SAME oracle as ``stream_session``, so
    the driver verifies the skew-safe rewrite produces bit-identical
    sessions. See sessionize_two_phase for the 100 TB rationale and
    tools/skew_stress.py for the measured hot-user numbers."""
    events = load(spark, sf_dir, "events")
    return sessionize(events).select(
        "user_id",
        F.unix_micros("start_ts").alias("session_start"),
        "n_events",
    )


@query(
    "stream_stateful_counter_batch",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_counter_batch(spark, sf_dir):
    """Hash-checked companion to ``stream_stateful_counter``: the per-user
    (count, total) profile that operator maintains in GroupState is, after a
    full availableNow replay, exactly this one-shuffle batch aggregate —
    tests/test_rows_only.py asserts the equality, and this query gives the
    DRIVER a value-hash over the same numbers, closing the rows-only gap for
    the stateful surface. Decimal-summed value per §2.0 rule 1 so the float
    total is aggregation-order-proof."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        to_dbl(F.sum(dec("value"))).alias("total_value"),
    )


@query(
    "stream_stream_join_batch",
    oracle="""
    SELECT p.event_id AS purchase_event_id, s.event_id AS signup_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id
     AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def stream_stream_join_batch(spark, sf_dir):
    """Hash-checked companion to ``stream_stream_join``: the watermarked
    stream-stream interval join over a complete replay emits exactly this
    batch range join's pairs (tests/test_rows_only.py asserts the set
    equality), so the driver's value-hash on this query pins the streaming
    operator's output too. Plan shape: equi-join on user_id with the
    interval as a residual predicate — shuffles on user_id, the layout that
    scales (a pure theta join would be a cross product)."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_event_id"),
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
        F.col("event_id").alias("signup_event_id"),
    )
    return purchases.join(
        signups,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_event_id", "signup_event_id")


@query(
    "stream_static_enrich_batch",
    oracle="""
    SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
           count(*) AS n_events
    FROM events LEFT JOIN customer ON c_custkey = user_id
    GROUP BY 1
    """,
)
def stream_static_enrich_batch(spark, sf_dir):
    """Hash-checked companion to ``stream_static_enrich``: with a STATIC
    dimension and a complete availableNow replay, the stream-static join's
    per-segment counts are exactly this batch left join + aggregate
    (tests/test_rows_only.py asserts the set equality), so the driver's
    value-hash on this query pins the streaming operator's numbers too —
    shrinking the rows-only-without-companion set to the four
    watermark-semantics ops whose late/dedup behavior a batch query cannot
    express. Same plan either way: the dimension broadcasts, the aggregate
    is map-side partial over |segments| groups."""
    events = load(spark, sf_dir, "events")
    segments = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.join(F.broadcast(segments), "user_id", "left")
        .groupBy(F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "stream_session_dynamic",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               ts + CASE WHEN event_type = 'purchase'
                         THEN INTERVAL 60 MINUTE
                         ELSE INTERVAL 15 MINUTE END AS end_ts
        FROM events
    ),
    o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN max(end_ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR ts > max(end_ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
                    THEN 1 ELSE 0 END AS brk
        FROM g
    ),
    i AS (
        -- ordered by (ts, event_id) to match the brk window; ORDER BY ts
        -- alone is tie-order-nondeterministic under duplicate timestamps
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
def stream_session_dynamic(spark, sf_dir):
    """Dynamic-gap sessionization (S): the session timeout depends on the
    EVENT — a purchase holds the session open for 60 minutes, anything else
    for 15 — via ``session_window(ts, gap_expression)``, a capability fixed
    per-gap sessionizers don't have (engagement-weighted timeouts are the
    production norm). Spark merges events whose [ts, ts+gap] intervals
    chain-overlap — closed at the end: an event landing at exactly a prior
    interval's end MERGES (measured, round 5), so the island break is
    STRICTLY `ts >` the RUNNING MAX of prior interval ends (a plain lag()
    is wrong here: a long-gap event can cover a later short-gap one, which
    running-max handles and lag misses). Same one-shuffle-per-user plan
    shape as stream_session, identical in batch and streaming execution."""
    events = load(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("60 minutes")
    ).otherwise(F.lit("15 minutes"))
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("start_ts"))
        .select(
            "user_id",
            F.unix_micros("start_ts").alias("session_start"),
            "n_events",
        )
    )


_TOPK_PER_WIN = 3


@query(
    "stream_tumbling_topk",
    oracle=f"""
    WITH c AS (
        SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS wstart,
               event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
    )
    SELECT wstart, event_type, CAST(cnt AS BIGINT) AS cnt,
           CAST(row_number() OVER (PARTITION BY wstart
                ORDER BY cnt DESC, event_type) AS BIGINT) AS rk
    FROM c
    QUALIFY rk <= {_TOPK_PER_WIN}
    """,
)
def stream_tumbling_topk(spark, sf_dir):
    """Windowed top-k — THE canonical streaming analytics query (per hourly
    tumbling window, the {k} most frequent event types, ties on the type):
    trending topics, hot keys, error-burst leaders. In streaming execution
    the same aggregation core runs incrementally (F.window groupBy, state =
    one count per (window, type) — bounded by |types|·open-windows) with
    the rank applied per emitted window in foreachBatch; the batch result
    is identical by construction, which is what the driver hash pins.

    Scale shape: one (window, type)-keyed exchange with map-side combine —
    the rank window then runs on the COLLAPSED count frame (|windows|·
    |types| rows), never the event stream; per-window keys are fine-grained
    so there is no hot reducer. Window start emitted as a string (the
    module's tz-hash rule)."""
    from pyspark.sql import Window

    counts = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(big(F.count(F.lit(1))).alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "cnt",
        )
    )
    rw = Window.partitionBy("wstart").orderBy(F.col("cnt").desc(), "event_type")
    return counts.select(
        "wstart",
        "event_type",
        "cnt",
        F.row_number().over(rw).cast("long").alias("rk"),
    ).filter(F.col("rk") <= _TOPK_PER_WIN)


@query(
    "stream_sliding_distinct",
    oracle="""
    SELECT wstart,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM (
        SELECT user_id, unnest([
            CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800,
            CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800
        ]) AS wstart
        FROM events
    )
    GROUP BY wstart
    """,
)
def stream_sliding_distinct(spark, sf_dir):
    """Sliding-window DISTINCT cardinality — the live "active users in the
    last hour, refreshed every 30 minutes" metric (the one gauge every
    product dashboard carries): exact count(distinct user_id) + event count
    per 1h/30m window. Distinct-in-a-window is the streaming-state story:
    Spark keeps one (window, user) entry until the watermark closes the
    window, so state is bounded by actives-per-window, not the stream; the
    batch result is identical by construction and is what the hash pins.

    Scale shape: distinct forces the classic TWO-exchange plan — partial
    dedup on (window, user) with map-side collapse (heavy repeat users
    compress before the wire), then the per-window count — exactly the
    expansion Catalyst picks for count(distinct); at 100 TB the approx
    variant (sketch_hll_partitioned) trades this second exchange for a
    mergeable sketch, which is why both live in this engine."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            big(F.count(F.lit(1))).alias("n_events"),
        )
        .select(
            big(F.unix_timestamp(F.col("w.start"))).alias("wstart"),
            "n_users",
            "n_events",
        )
    )
