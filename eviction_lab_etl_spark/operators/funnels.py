"""Product-analytics operators over the events stream (extension).

The two queries every event warehouse serves daily — ordered funnel
conversion and cohort retention — expressed Spark-first:

- The funnel is ONE shuffle (groupBy user) followed by JVM-side higher-order
  array functions over each user's time-sorted event sequence: no self-joins,
  no per-stage rescans of the fact table. The multi-pass join formulation
  (one scan + shuffle per stage — the oracle's shape, and what most SQL
  warehouses run) costs S shuffles for an S-stage funnel; this form is S=∞
  for one shuffle, at the price of materializing each user's events in one
  array (bounded by per-user activity; a user with millions of events wants
  the per-stage-join form or a pre-capped sequence).
- Retention reuses the user-keyed shuffle: first-seen day per user, then the
  (cohort, week-offset) distinct-user matrix. Both stages hash on user_id,
  so Catalyst reuses one exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import big
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load

FUNNEL_STAGES = ("signup", "click", "purchase")


@query(
    "events_funnel",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_type FROM events
        UNION ALL  -- planted non-converters: signup-only users (stall at click)
        SELECT user_id + 9000000, ts, event_type FROM events
        WHERE user_id < 5 AND event_type = 'signup'
        UNION ALL  -- planted never-signed-up users (NULL stage-1 time)
        SELECT user_id + 9500000, ts, event_type FROM events
        WHERE user_id < 5 AND event_type = 'click'
    ),
    s AS (
        SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
        FROM ev GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM ev e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts >= s.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM ev e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t2
        GROUP BY e.user_id
    )
    SELECT (SELECT count(t1) FROM s) AS n_signup,
           (SELECT count(*) FROM c) AS n_click_after,
           (SELECT count(*) FROM p) AS n_purchase_after
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered funnel signup -> click -> purchase: a user converts stage k
    only with an event at or after their stage k-1 time (first-touch
    semantics; a click BEFORE the signup does not count, which is exactly
    what the naive per-type min() gets wrong). Spark side: one groupBy(user)
    builds each user's time-sorted (ts, type) array, then JVM higher-order
    `filter`/`try_element_at` walk out the stage times — one shuffle for the
    whole funnel. The oracle computes the same semantics as the classic
    stage-join cascade, so the hash check proves the single-pass rewrite
    against the multi-pass definition.

    Two planted non-converter populations (signup-only users and
    never-signed-up users, fixtures.py precedent) keep the green
    non-vacuous: every organic fixture user completes all three stages, so
    without the plant the drop-off arms — including the empty-hits path
    that plain element_at would ABORT under ANSI mode — never execute.
    try_element_at (not element_at) is mandatory here: stage misses
    produce empty filtered arrays, and under Spark 4's default ANSI mode
    element_at on an empty array throws instead of yielding NULL."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    stall_click = (
        ev.filter((F.col("user_id") < 5) & (F.col("event_type") == "signup"))
        .withColumn("user_id", F.col("user_id") + 9000000)
    )
    no_signup = (
        ev.filter((F.col("user_id") < 5) & (F.col("event_type") == "click"))
        .withColumn("user_id", F.col("user_id") + 9500000)
    )
    events = ev.unionByName(stall_click).unionByName(no_signup)
    seq = events.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("seq")
    )

    def first_at_or_after(col_seq, etype, tmin):
        hits = F.filter(
            col_seq,
            lambda e: (e["event_type"] == etype)
            & (F.lit(True) if tmin is None else (e["ts"] >= tmin)),
        )
        return F.try_element_at(hits, F.lit(1))["ts"]

    staged = (
        seq.withColumn("t1", first_at_or_after(F.col("seq"), "signup", None))
        .withColumn("t2", first_at_or_after(F.col("seq"), "click", F.col("t1")))
        .withColumn("t3", first_at_or_after(F.col("seq"), "purchase", F.col("t2")))
    )
    return staged.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_click_after"),
        F.count("t3").alias("n_purchase_after"),
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH f AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    )
    SELECT CAST(f.d0 AS VARCHAR) AS cohort_day,
           (CAST(e.ts AS DATE) - f.d0) // 7 AS week_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY f.d0, week_offset
    """,
)
def events_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, counted
    distinct in each subsequent week offset — the table behind every
    retention curve. The cohort dimension (one aggregate row per user) is
    small relative to the events fact, so AQE broadcasts it here; past
    broadcast size the join co-partitions on user_id — the same key the
    first-seen aggregate already shuffled on, so Catalyst aligns the two
    without an extra fact shuffle. cohort_day emitted as string for
    engine-neutral hashing."""
    events = load(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    return (
        events.join(first, "user_id")
        .select(
            "user_id",
            F.col("d0").cast("string").alias("cohort_day"),
            F.expr("datediff(to_date(ts), d0) div 7").alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "events_type_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, cur_type, count(*) AS cnt
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, cur_type
    """,
)
def events_type_transitions(spark, sf_dir):
    """First-order behavioral transition matrix: for every consecutive event
    pair in a user's (ts, event_id)-ordered stream, count (previous type →
    current type). The Markov-chain summary behind next-action prediction
    features and bot detection (self-loops at implausible rates). The lag
    window's full tiebreak makes each user's sequence — and therefore every
    pair — identical in both engines. At 100 TB: one user_id shuffle for the
    window, map-side partial counts into an at-most-25-row matrix; the same
    user-keyed exchange any sessionizer already makes, so in a multi-query
    pipeline the sort is shared."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("cur_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "cur_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "events_session_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type AS cur_type,
               lag(event_type) OVER w AS prev_type,
               lag(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT prev_type, cur_type,
           CAST(ts <= prev_ts + INTERVAL 30 MINUTE AS BIGINT)
               AS within_session,
           count(*) AS cnt
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, cur_type, within_session
    """,
)
def events_session_transitions(spark, sf_dir):
    """Sessions + transitions off ONE user-keyed exchange (r14 VERDICT item
    6 — the shared-exchange claim in events_type_transitions' docstring,
    turned into a pinned artifact): the transition matrix split by whether
    the pair stays inside a 30-minute session or crosses a boundary — the
    within/across split is what separates in-flow behavior (click→purchase
    in one sitting) from return behavior (view…next-day purchase), and the
    session rule is exactly stream_session's closed-interval semantics
    (same session iff ts <= prev_ts + gap; a pair landing at exactly the
    gap stays within — the `> gap` break rule).

    Plan contract (pinned, tests/test_plans.py): both lag windows share ONE
    window spec over (user_id / ts, event_id), so the whole computation —
    sessionization boundary AND transition pairing — costs exactly one
    user_id exchange plus the ≤|types|²·2-row matrix aggregation. This is
    the multi-query-pipeline shape: any sessionizer already pays this
    exchange; the transition matrix rides it for free. Timestamp
    comparison is integer microseconds in both engines — no float."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("cur_type"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
        F.col("ts"),
    )
    within = (
        F.col("ts") <= F.col("prev_ts") + F.expr("INTERVAL 30 MINUTE")
    ).cast("long")
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .select("prev_type", "cur_type", within.alias("within_session"))
        .groupBy("prev_type", "cur_type", "within_session")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "events_rfm_segments",
    oracle="""
    WITH base AS (
        SELECT user_id,
               max(ts) AS last_ts,
               count(*) AS freq,
               CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    )
    SELECT user_id,
           ntile(4) OVER (ORDER BY last_ts, user_id)        AS r_bucket,
           ntile(4) OVER (ORDER BY freq, user_id)           AS f_bucket,
           ntile(4) OVER (ORDER BY monetary_cents, user_id) AS m_bucket,
           freq, monetary_cents
    FROM base
    """,
)
def events_rfm_segments(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary) — the classic
    customer-scoring table: per purchasing user, quartile buckets over last
    purchase time, purchase count, and exact-cents spend. Every ntile
    carries a user_id tiebreak (rule 3: the bucket BOUNDARY assignment must
    be deterministic, not just the ordering), and money is integer cents so
    the monetary ordering is exact. One user-keyed aggregate then three
    global windows over |users| rows — tiny relative to the fact; at 100 TB
    the windows run on the aggregate, never the event stream."""
    from pyspark.sql import Window

    from eviction_lab_etl_spark.functions.determinism import cents

    events = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    base = events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(cents("value")).alias("monetary_cents"),
    )
    return base.select(
        "user_id",
        F.ntile(4).over(Window.orderBy("last_ts", "user_id")).alias("r_bucket"),
        F.ntile(4).over(Window.orderBy("freq", "user_id")).alias("f_bucket"),
        F.ntile(4)
        .over(Window.orderBy("monetary_cents", "user_id"))
        .alias("m_bucket"),
        "freq",
        "monetary_cents",
    )


@query(
    "events_pareto_concentration",
    oracle="""
    WITH per_user AS (
        SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    ),
    deciled AS (
        SELECT user_id, n_events,
               ntile(10) OVER (ORDER BY n_events DESC, user_id) AS decile
        FROM per_user
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           count(*) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(sum(n_events)) OVER (
               ORDER BY decile ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_events
    FROM deciled
    GROUP BY decile
    """,
)
def events_pareto_concentration(spark, sf_dir):
    """Activity-concentration (Pareto) report: users ranked into deciles by
    event volume, with per-decile and cumulative event counts — reading off
    'the top 10% of users generate X% of traffic' is the first skew
    diagnostic run on any event corpus, and its cum_events column is
    precisely the evidence that motivates salting/two-phase sessionization
    when the head decile dominates. All integers; the decile boundary
    assignment carries the user_id tiebreak (rule 3). Two cheap windows
    over the |users| aggregate — the fact table is touched once."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    deciled = per_user.withColumn(
        "decile",
        F.ntile(10)
        .over(Window.orderBy(F.col("n_events").desc(), "user_id"))
        .cast("long"),
    )
    per_decile = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("n_events"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per_decile.withColumn("cum_events", F.sum("n_events").over(w_cum))


@query(
    "events_streak_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
        SELECT user_id,
               (d - DATE '1970-01-01')
               - row_number() OVER (PARTITION BY user_id ORDER BY d)
                   AS island
        FROM days
    ),
    runs AS (
        SELECT user_id, island, count(*) AS run_len
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(sum(run_len) AS BIGINT) AS n_active_days,
           CAST(max(run_len) AS BIGINT) AS max_streak,
           CAST(count(*) AS BIGINT) AS n_islands
    FROM runs GROUP BY user_id
    """,
)
def events_streak_islands(spark, sf_dir):
    """GAPS-AND-ISLANDS: per user, the longest run of CONSECUTIVE active
    days, total active days, and the number of maximal runs — the classic
    streak/retention primitive (login streaks, daily-active runs, sensor
    uptime segments). The island key is the textbook identity: for days
    sorted per user, (epoch-day - row_number) is CONSTANT exactly while
    days are consecutive and jumps at every gap, turning run detection
    into a plain GROUP BY — no self-join, no recursion, no per-row Python.

    Scale shape (100 TB): one distinct on (user, day) — massive map-side
    collapse of the raw event stream — then a per-user window and two
    further aggregations ALL keyed on user_id, so Catalyst plans one
    exchange and reuses it; per-user state is bounded by days-spanned, not
    events. Epoch-day arithmetic (datediff from 1970-01-01) keeps the
    island anchor a portable integer in both engines."""
    from pyspark.sql import Window

    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    isl = days.select(
        "user_id",
        "d",
        (
            F.datediff("d", F.lit("1970-01-01").cast("date"))
            - F.row_number().over(
                Window.partitionBy("user_id").orderBy("d")
            )
        ).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("n_active_days"),
        F.max("run_len").cast("long").alias("max_streak"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH attributed AS (
        SELECT user_id, ts, event_id, event_type,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch_id,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch_type
        FROM events
    )
    SELECT user_id, event_id AS purchase_id, touch_id, touch_type
    FROM attributed WHERE event_type = 'purchase'
    """,
)
def events_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: every purchase is credited to the user's most
    recent preceding marketing touch (click or view) — the conversion-
    attribution join every growth-analytics store runs. NULL touch = an
    unattributed (organic / first-event) purchase, kept on purpose: the
    unattributed rate is itself the metric. Expressed as ONE pass over the
    user-keyed window (ignore-nulls last_value over a 1-PRECEDING frame),
    not an asof self-join — same answer, half the exchanges.

    Scale shape: one user-keyed exchange (millions of user keys — no hot
    reducer), two frame-sharing window expressions over the same sort, then
    a purchase filter; output is purchase-proportional. The (ts, event_id)
    ordering is total per user, so ties cannot flip attribution between
    engines."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_id")
    )
    touch_t = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_type")
    )
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(touch, ignorenulls=True).over(w).alias("touch_id"),
        F.last(touch_t, ignorenulls=True).over(w).alias("touch_type"),
    )
    return ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "touch_id",
        "touch_type",
    )


_PATH_TOPK = 10


@query(
    "events_top_paths",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS e2,
               lead(event_type, 2) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS e3
        FROM events
    ),
    paths AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS cnt
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY 1
    )
    SELECT path, CAST(cnt AS BIGINT) AS cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, path) AS BIGINT) AS rnk
    FROM paths ORDER BY cnt DESC, path LIMIT {_PATH_TOPK}
    """,
)
def events_top_paths(spark, sf_dir):
    """Top user paths — the clickstream path-mining query (which 3-step
    journeys dominate: signup>click>purchase vs error>error>error): slide a
    3-event window over each user's (ts, event_id)-ordered stream via two
    leads sharing one sort, collapse to path counts, rank the global top
    {k}. Paths that would cross a user boundary are excluded (the leads go
    NULL), so every counted path is a real single-user journey.

    Scale shape: one user-keyed exchange for the leads (per-key state
    constant, keys grow with users — the attribution class), then the
    gram-collapse exchange on the path key (|types|³-bounded frame, ~125
    keys here) and a rank over that tiny frame. Nothing corpus-sized moves
    after the first shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    paths = (
        seq.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(big(F.count(F.lit(1))).alias("cnt"))
    )
    rw = Window.orderBy(F.col("cnt").desc(), "path")
    return (
        paths.orderBy(F.col("cnt").desc(), "path")
        .limit(_PATH_TOPK)
        .select(
            "path", "cnt", F.row_number().over(rw).cast("long").alias("rnk")
        )
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_num,
               user_id
        FROM events
    ),
    dau AS (SELECT day_num, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day_num),
    cover AS (
        SELECT DISTINCT day_num + i.i AS day_cov, user_id
        FROM du, (SELECT unnest(range(0, 7)) AS i) i
    ),
    wau AS (SELECT day_cov, CAST(count(*) AS BIGINT) AS wau FROM cover GROUP BY day_cov)
    SELECT d.day_num, d.dau, w.wau,
           CAST((1000 * d.dau) // w.wau AS BIGINT) AS stickiness_permille
    FROM dau d JOIN wau w ON w.day_cov = d.day_num
    """,
)
def events_dau_wau(spark, sf_dir):
    """DAU/WAU stickiness per day — the engagement ratio every product
    dashboard tracks (what fraction of the trailing week's actives showed
    up today): exact distinct users per day over exact distinct users in
    the trailing 7 days, as an integer permille. The trailing-window
    distinct is computed by the COVERAGE EXPANSION trick: each (day, user)
    activity fact covers days d..d+6, so one 7-way integer explode + a
    second dedup turns "distinct over a sliding range" into two plain
    distinct aggregates — no range-frame distinct (which Spark windows
    cannot express) and no per-day rescan of the week. Days are integer
    epoch-day numbers on both engines (floor(epoch/86400) — the fixture
    clock is post-1970; pre-epoch data would use the joins.py
    negative-epoch CASE).

    Scale shape: the raw stream collapses to (day, user) in one exchange
    with map-side dedup (the heavy hitters compress before the wire — a
    user's thousandth event that day never ships); the ×7 expansion runs
    on that collapsed frame (|active-users·days| rows, not events), and
    the final counts are day-keyed. At 100 TB the expansion factor is the
    window length — the standard trade for exact sliding distinct; the
    approximate alternative is the merged-HLL family (sketch_hll_*)."""
    from eviction_lab_etl_spark.functions.determinism import big

    du = (
        load(spark, sf_dir, "events")
        .select(
            F.expr("unix_micros(ts) div 86400000000").alias("day_num"),
            "user_id",
        )
        .distinct()
    )
    dau = du.groupBy("day_num").agg(big(F.count(F.lit(1))).alias("dau"))
    cover = (
        du.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            "day_num",
            "user_id",
        )
        .select((F.col("day_num") + F.col("i")).alias("day_cov"), "user_id")
        .distinct()
    )
    wau = cover.groupBy("day_cov").agg(big(F.count(F.lit(1))).alias("wau"))
    return (
        dau.join(wau, dau.day_num == wau.day_cov)
        .select(
            "day_num",
            "dau",
            "wau",
            F.expr("(1000 * dau) div wau").cast("long").alias(
                "stickiness_permille"
            ),
        )
    )


@query(
    "events_attribution_linear",
    oracle="""
    WITH t AS (
        SELECT user_id, ts, event_id, event_type
        FROM events WHERE event_type IN ('click', 'view')
    ),
    p AS (
        SELECT user_id, ts, event_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id,
           p.event_id AS purchase_id,
           t.event_id AS touch_id,
           t.event_type AS touch_type,
           CAST(count(*) OVER (PARTITION BY p.event_id) AS BIGINT)
               AS n_touches
    FROM p JOIN t
      ON t.user_id = p.user_id
     AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
    """,
)
def events_attribution_linear(spark, sf_dir):
    """LINEAR (multi-touch) attribution — the credit TABLE last-touch
    cannot express: one row per (purchase, preceding marketing touch of
    the same user), carrying ``n_touches`` so each touch's credit is the
    exact rational 1/n_touches (§2.0 rule 1: the fraction never
    materializes; Σ credit = 1 per attributed purchase by construction).
    "Preceding" uses the same (ts, event_id) total order as the last-touch
    binding, so the two attribution models agree on what a touch is.
    Zero-touch purchases are absent here (organic conversions — the
    last-touch query surfaces them as NULL rows).

    LOAD-BEARING oracle-equivalence assumption (r14 ADVICE): event_id is
    globally unique across users (the events fixture's primary key), so the
    Spark window PARTITION BY (user_id, purchase_id) and the oracle's
    PARTITION BY p.event_id alone name the same groups. On data where
    event ids were only per-user unique the oracle would merge purchases
    from different users into one count — partition the oracle window by
    (user_id, event_id) before reusing it on such data.

    Scale shape: ONE user-keyed exchange — the touch×purchase pairing
    joins on user_id (per-user quadratic, bounded by per-user activity:
    the join_interval_overlap cost model), and the per-purchase count
    window needs only (user_id, purchase_id) clustering, which the join's
    user_id partitioning already satisfies (Spark inserts a sort, not a
    second exchange). Output is touch-pair-proportional."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    pairs = p.join(
        t,
        (F.col("tu") == F.col("user_id"))
        & (
            (F.col("tts") < F.col("ts"))
            | ((F.col("tts") == F.col("ts")) & (F.col("touch_id") < F.col("purchase_id")))
        ),
    )
    w = Window.partitionBy("user_id", "purchase_id")
    return pairs.select(
        "user_id",
        "purchase_id",
        "touch_id",
        "touch_type",
        big(F.count(F.lit(1)).over(w)).alias("n_touches"),
    )
