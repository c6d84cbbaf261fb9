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


@query(
    "ts_interpolate_linear",
    oracle="""
    WITH bounds AS (
        SELECT min(date_trunc('day', ts)) AS d0, max(date_trunc('day', ts)) AS d1
        FROM events
    ),
    days AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM bounds
    ),
    users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
    daily AS (
        SELECT user_id, date_trunc('day', ts) AS d,
               CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS v_cents
        FROM events WHERE event_type = 'purchase' AND user_id < 20
        GROUP BY 1, 2
    ),
    spine AS (
        SELECT u.user_id, days.d,
               CAST(date_diff('day', DATE '1970-01-01', CAST(days.d AS DATE))
                    AS BIGINT) AS e
        FROM users u CROSS JOIN days
    ),
    marked AS (
        SELECT s.user_id, s.d, s.e, dl.v_cents,
               last_value(dl.v_cents IGNORE NULLS) OVER back  AS v0,
               last_value(CASE WHEN dl.v_cents IS NOT NULL THEN s.e END
                          IGNORE NULLS) OVER back             AS t0,
               first_value(dl.v_cents IGNORE NULLS) OVER fwd  AS v1,
               first_value(CASE WHEN dl.v_cents IS NOT NULL THEN s.e END
                           IGNORE NULLS) OVER fwd             AS t1
        FROM spine s
        LEFT JOIN daily dl ON dl.user_id = s.user_id AND dl.d = s.d
        WINDOW back AS (PARTITION BY s.user_id ORDER BY s.e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fwd  AS (PARTITION BY s.user_id ORDER BY s.e
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, CAST(CAST(d AS DATE) AS VARCHAR) AS day,
           CASE WHEN v_cents IS NOT NULL THEN v_cents
                WHEN v0 IS NOT NULL AND v1 IS NOT NULL
                THEN v0 * (t1 - e) + v1 * (e - t0) END AS num,
           CASE WHEN v_cents IS NOT NULL THEN 1
                WHEN v0 IS NOT NULL AND v1 IS NOT NULL
                THEN t1 - t0 END AS den
    FROM marked
    """,
)
def ts_interpolate_linear(spark, sf_dir):
    """Linear interpolation across time-series gaps, integer-exact: for every
    (user, day) cell in the gap-filled spine, emit the daily purchase total
    as an exact rational num/den — observed days are (v, 1), interior gaps
    are the cross-multiplied linear blend (v0·(t1−t) + v1·(t−t0), t1−t0),
    and edge gaps (nothing observed on one side) stay NULL. The consumer
    divides once; the engine never touches float arithmetic, so the same
    blend hashes identically everywhere (the LOCF operator above fills
    level measures; this one fills trend measures). At 100 TB the plan is
    the gap-fill plan plus one more window over the SAME (user, day)
    partitioning — three window functions, one shuffle."""
    events = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    from eviction_lab_etl_spark.functions.determinism import cents

    bounds = load(spark, sf_dir, "events").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    users = events.select("user_id").distinct()
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.sum(cents("value")).alias("v_cents"))
    )
    spine = users.crossJoin(F.broadcast(days)).withColumn(
        "e", F.datediff("d", F.lit("1970-01-01").cast("date")).cast("long")
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("e")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_e = F.when(F.col("v_cents").isNotNull(), F.col("e"))
    marked = (
        spine.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            "d",
            "e",
            "v_cents",
            F.last("v_cents", ignorenulls=True).over(back).alias("v0"),
            F.last(obs_e, ignorenulls=True).over(back).alias("t0"),
            F.first("v_cents", ignorenulls=True).over(fwd).alias("v1"),
            F.first(obs_e, ignorenulls=True).over(fwd).alias("t1"),
        )
    )
    interior = F.col("v0").isNotNull() & F.col("v1").isNotNull()
    return marked.select(
        "user_id",
        F.col("d").cast("string").alias("day"),
        F.when(F.col("v_cents").isNotNull(), F.col("v_cents"))
        .when(
            interior,
            F.col("v0") * (F.col("t1") - F.col("e"))
            + F.col("v1") * (F.col("e") - F.col("t0")),
        )
        .alias("num"),
        F.when(F.col("v_cents").isNotNull(), F.lit(1).cast("long"))
        .when(interior, F.col("t1") - F.col("t0"))
        .alias("den"),
    )


@query(
    "ts_anomaly_mad",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        FROM events GROUP BY 1
    ),
    med AS (
        SELECT CAST(2 * median(cnt) AS BIGINT) AS med2 FROM daily
    ),
    dev AS (
        SELECT d, cnt, abs(2 * cnt - med2) AS dev2 FROM daily, med
    ),
    mad AS (
        SELECT CAST(2 * median(dev2) AS BIGINT) AS mad4 FROM dev
    )
    SELECT CAST(CAST(d AS DATE) AS VARCHAR) AS day,
           cnt,
           (2 * dev2 > 3 * mad4) AS is_anomaly
    FROM dev, mad
    """,
)
def ts_anomaly_mad(spark, sf_dir):
    """Robust anomaly flagging on the daily event-count series via median
    absolute deviation — the outlier detector that, unlike z-scores, is not
    itself corrupted by the outliers it hunts. Everything stays in exact
    integer arithmetic despite two nested medians over possibly-even
    populations: medians are carried DOUBLED (2·median of ints is an exact
    .0-or-.5×2 integer in both engines), deviations become |2·cnt − med2|
    (= 2·|cnt−med|), the MAD is carried quadrupled, and the 3-MAD flag is
    the cross-multiplication 2·dev2 > 3·mad4 — bit-identical classification
    everywhere, no float ever compared. The two scalar medians broadcast;
    at scale the daily aggregate is |days| rows, so the whole detector
    costs one partial-agg pass over the fact plus driver-trivial scalars."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    med = daily.agg((2 * F.median("cnt")).cast("long").alias("med2"))
    dev = daily.crossJoin(F.broadcast(med)).withColumn(
        "dev2", F.abs(2 * F.col("cnt") - F.col("med2"))
    )
    mad = dev.agg((2 * F.median("dev2")).cast("long").alias("mad4"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            F.col("d").cast("string").alias("day"),
            "cnt",
            (2 * F.col("dev2") > 3 * F.col("mad4")).alias("is_anomaly"),
        )
    )


@query(
    "ts_ewma_smooth",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v_cents,
               ts
        FROM events
    ),
    l AS (
        SELECT user_id, event_id, v_cents,
               lag(v_cents, 1) OVER w AS v1, lag(v_cents, 2) OVER w AS v2,
               lag(v_cents, 3) OVER w AS v3, lag(v_cents, 4) OVER w AS v4,
               lag(v_cents, 5) OVER w AS v5, lag(v_cents, 6) OVER w AS v6,
               lag(v_cents, 7) OVER w AS v7
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, v_cents,
           CAST((128 * v_cents + 64 * coalesce(v1, 0) + 32 * coalesce(v2, 0)
                 + 16 * coalesce(v3, 0) + 8 * coalesce(v4, 0)
                 + 4 * coalesce(v5, 0) + 2 * coalesce(v6, 0)
                 + 1 * coalesce(v7, 0)) * 1000
                // (128 + CASE WHEN v1 IS NULL THEN 0 ELSE 64 END
                        + CASE WHEN v2 IS NULL THEN 0 ELSE 32 END
                        + CASE WHEN v3 IS NULL THEN 0 ELSE 16 END
                        + CASE WHEN v4 IS NULL THEN 0 ELSE 8 END
                        + CASE WHEN v5 IS NULL THEN 0 ELSE 4 END
                        + CASE WHEN v6 IS NULL THEN 0 ELSE 2 END
                        + CASE WHEN v7 IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) AS ewma_milli
    FROM l
    """,
)
def ts_ewma_smooth(spark, sf_dir):
    """Exponentially-weighted moving average per entity (alpha = 1/2),
    TRUNCATED at 7 lags — the declared semantics, not an approximation of
    something else: weights 2^(7-j) over the current value and up to 7
    predecessors, normalized by the weights actually present (so the series
    head is an EWMA of what exists, not biased toward zero). Truncation
    bounds the error vs the infinite recursion at 2^-8 of the oldest mass
    while making the operator a PLAIN WINDOW EXPRESSION: the true recursive
    EWMA (state_t = a*x_t + (1-a)*state_{t-1}) is not expressible in SQL
    windows without exponent-magnitude tricks that overflow doubles beyond
    ~1000 rows, and at 100 TB the recursive form forces applyInPandas
    sequential state per key — this form stays in whole-stage codegen.
    All-integer arithmetic end to end (cents in, integer-division milli
    out), so the cross-engine hash has no float surface at all.

    INVARIANT: the cross-engine identity (Spark `div` ≡ DuckDB `//`) and
    the cents() quantization are verified for NON-NEGATIVE values only;
    events.value >= 0 on every shipped fixture and
    tests/test_determinism.py::test_ewma_value_sign_invariant fails loudly
    if a regenerated fixture ever ships a negative amount.

    Scale shape: ONE shuffle on user_id; the 7 lag() calls share a single
    window sort — Catalyst evaluates all of them in one pass; per-row cost
    is 8 multiply-adds in codegen. Ordering carries the (ts, event_id)
    unique tiebreak (§2.0 rule 3)."""
    from eviction_lab_etl_spark.functions.determinism import cents

    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", cents("value").alias("v_cents"), "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("v_cents")] + [
        F.lag("v_cents", j).over(w) for j in range(1, 8)
    ]
    weights = [128, 64, 32, 16, 8, 4, 2, 1]
    num = sum(
        (F.lit(wt) * F.coalesce(c, F.lit(0)) for wt, c in zip(weights, lags)),
        F.lit(0),
    )
    den = sum(
        (F.when(c.isNull(), 0).otherwise(wt) for wt, c in zip(weights, lags)),
        F.lit(0),
    )
    return e.select(
        "user_id",
        "event_id",
        "v_cents",
        (num * 1000).cast("bigint").alias("_num"),
        den.cast("bigint").alias("_den"),
    ).select(
        "user_id",
        "event_id",
        "v_cents",
        F.expr("_num div _den").alias("ewma_milli"),
    )


@query(
    "ts_changepoint_shift",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS v_cents
        FROM events GROUP BY 1, 2
    ),
    sh AS (
        SELECT event_type, d, v_cents,
               sum(v_cents) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s_before,
               count(*) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS c_before,
               sum(v_cents) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING) AS s_after,
               count(*) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING) AS c_after
        FROM daily
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day,
           CAST(abs(s_after - s_before) AS BIGINT) AS shift_cents,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY abs(s_after - s_before) DESC, d) AS rk
    FROM sh
    WHERE c_before = 7 AND c_after = 7
    QUALIFY rk <= 5
    """,
)
def ts_changepoint_shift(spark, sf_dir):
    """Two-sample mean-shift changepoint scan: for each (event_type, day),
    compare total revenue over the 7 observed days strictly before against
    the 7 strictly after, and rank the largest absolute shifts — the
    windowed split statistic behind CUSUM-style level-change detection,
    restated so it IS a plain window expression (the recursive CUSUM
    s_t = max(0, s_{t-1} + dev_t) resets at zero and is not prefix-sum
    decomposable — it would force sequential per-key Python state; the
    two-sided split scan is the standard scan-statistic alternative and
    stays in whole-stage codegen). Both flanks carry exactly 7 days
    (boundary days with short flanks are excluded, not zero-padded), so the
    shift compares equal-support sums directly in cents — no division, no
    floats anywhere (§2.0 rule 1).

    Scale shape: the daily rollup is one shuffle keyed (event_type, day)
    with map-side partial aggregation — the data-proportional floor; the
    four frame aggregates share ONE window sort over the already-collapsed
    daily series (|types| × |days| rows, microscopic vs the event stream),
    and the top-5 ranking is InferWindowGroupLimit-eligible. Day ordering
    is unique per (event_type, day) by construction — no tiebreak needed
    beyond the day itself (§2.0 rule 3)."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg((F.sum(dec("value")) * 100).cast("bigint").alias("v_cents"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    before = w.rowsBetween(-7, -1)
    after = w.rowsBetween(1, 7)
    sh = daily.select(
        "event_type",
        "d",
        F.sum("v_cents").over(before).alias("s_before"),
        F.count(F.lit(1)).over(before).alias("c_before"),
        F.sum("v_cents").over(after).alias("s_after"),
        F.count(F.lit(1)).over(after).alias("c_after"),
    ).filter((F.col("c_before") == 7) & (F.col("c_after") == 7))
    shifted = sh.select(
        "event_type",
        "d",
        F.abs(F.col("s_after") - F.col("s_before")).alias("shift_cents"),
    )
    rw = Window.partitionBy("event_type").orderBy(
        F.col("shift_cents").desc(), "d"
    )
    return (
        shifted.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") <= 5)
        .select(
            "event_type",
            F.col("d").cast("string").alias("day"),
            "shift_cents",
            big("rk").alias("rk"),
        )
    )


# --- seasonal profile (additive-decomposition lite, ratio form) --------------


@query(
    "ts_seasonal_profile",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(hour(ts) AS BIGINT) AS hr,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents
        FROM events
    ),
    h AS (
        SELECT event_type, hr,
               count(*) AS n, sum(v_cents) AS sum_cents
        FROM e GROUP BY event_type, hr
    ),
    t AS (
        SELECT event_type, hr, n, sum_cents,
               sum(n) OVER (PARTITION BY event_type) AS n_t,
               sum(sum_cents) OVER (PARTITION BY event_type) AS sum_t
        FROM h
    )
    SELECT event_type, hr,
           CAST(n AS BIGINT) AS n,
           CAST(sum_cents AS BIGINT) AS sum_cents,
           CAST((CAST(1000 AS HUGEINT) * sum_cents * n_t)
                // (CAST(n AS HUGEINT) * sum_t) AS BIGINT) AS ratio_permille
    FROM t
    """,
)
def ts_seasonal_profile(spark, sf_dir):
    """Hour-of-day seasonal profile per event type (the additive-
    decomposition diagnostic a metrics pipeline watches): for each
    (event_type, hour-of-day) cell, the event count, exact cents total,
    and the SEASONAL RATIO — cell mean over the type's overall mean, in
    permille, as one all-positive integer cross-multiplication
    (1000·sum_h·n_t) / (n_h·sum_t), so 1000 = an average hour and the
    division is truncation-safe in both engines (`div` ≡ `//` needs
    non-negative operands — the ts_ewma_smooth rule; an OFFSET form
    mean_h − mean_t would go negative). Products run in
    DECIMAL(38,0)/HUGEINT per the PMI overflow discipline: at a 30×
    stress, 1000·sum_h·n_t clears the int64 envelope.

    Scale shape: one (type, hour)-keyed aggregate over the fact stream
    with map-side partial collapse (the scan-proportional floor, output
    |types|·24 rows), then a window over the collapsed cells — nothing
    corpus-sized moves after the first exchange. Exact cents arithmetic
    end to end; no float ever aggregates."""
    from eviction_lab_etl_spark.functions.determinism import cents

    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("hr"),
        cents("value").alias("v_cents"),
    )
    h = e.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v_cents").alias("sum_cents")
    )
    from pyspark.sql import Window

    wt = Window.partitionBy("event_type")
    t = h.select(
        "event_type",
        "hr",
        "n",
        "sum_cents",
        F.sum("n").over(wt).alias("n_t"),
        F.sum("sum_cents").over(wt).alias("sum_t"),
    )
    return t.select(
        "event_type",
        "hr",
        big("n").alias("n"),
        big("sum_cents").alias("sum_cents"),
        F.expr(
            "CAST((CAST(1000 AS DECIMAL(38,0)) * sum_cents * n_t)"
            " div (CAST(n AS DECIMAL(38,0)) * sum_t) AS BIGINT)"
        ).alias("ratio_permille"),
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH keyed AS (
        SELECT event_type,
               date_trunc('hour', ts) AS bar,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
               lpad(CAST(event_id AS VARCHAR), 19, '0') AS ord,
               value,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents
        FROM events
    )
    SELECT event_type, bar,
           arg_min(value, ord) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ord) AS close,
           CAST(sum(v_cents) AS BIGINT) AS vol_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM keyed GROUP BY event_type, bar
    """,
)
def ts_resample_ohlc(spark, sf_dir):
    """Downsample the event stream to hourly OHLC bars per event type — the
    kdb/TimescaleDB candle rollup every metrics store needs. open/close are
    the first/last value by (ts, event_id); because DuckDB's ``arg_min``
    takes no composite ordering key, the order is encoded as ONE
    lexicographic string — zero-padded epoch-microseconds ++ zero-padded
    event_id — identical in both engines (non-negative epochs; the fixture
    clock starts 2024, and a production chain spanning pre-1970 data would
    offset the epoch first, the joins.py negative-epoch rule). event_id is
    padded to 19 digits — the full non-negative BIGINT width (max 19
    decimal digits) — so NO id value can overflow the pad and corrupt the
    lexicographic order (r12 ADVICE: the old 12-digit pad silently broke
    at id >= 10^12).

    Scale shape, graded for 100 TB: deliberately the AGG-ONLY form —
    ``min_by``/``max_by``/``min``/``max``/``sum`` all collapse map-side, so
    the stream reaches the single (type, hour)-keyed exchange already
    reduced to one partial row per (partition × bar), where the window form
    (row_number + filter) would ship every fact row through the shuffle.
    open/high/low/close are SELECTED doubles (never summed — no float
    aggregation order to diverge); volume aggregates in exact cents."""
    from eviction_lab_etl_spark.functions.determinism import cents

    keyed = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar"),
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 19, "0"),
        ).alias("ord"),
        "value",
        cents("value").alias("v_cents"),
    )
    return keyed.groupBy("event_type", "bar").agg(
        F.min_by("value", "ord").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ord").alias("close"),
        big(F.sum("v_cents")).alias("vol_cents"),
        big(F.count(F.lit(1))).alias("n"),
    )
