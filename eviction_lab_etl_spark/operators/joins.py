"""Group C — joins (SURVEY §2.C).

Models the reference's merge steps: the geography hierarchy chain
(place→county→state→parent-location, R5/R9), the (GEOID, year) composite-key
eviction⋈demographics merge (R5), the 2000→2010 crosswalk weighted apportionment
(R10), and QA existence checks (R12). Plus the streaming-extension as-of join.

Scale notes (100 TB): dimension joins are explicitly ``F.broadcast`` (no shuffle
of the fact side); the as-of join is a single shuffle on user_id (union-tag +
ordered window), which beats a per-row range join at any scale; the weighted
allocation reuses one hash partitioning (window + join both keyed on orderkey).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eviction_lab_etl_spark import fixtures
from eviction_lab_etl_spark.functions.determinism import big, cents, dec
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT c_custkey, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast_dims(spark, sf_dir):
    """Dimension chain join (place → parent-location resolution, R5/R9).

    Both dims are broadcast: the fact table never shuffles — the only sane plan
    for a 100 TB fact ⋈ KB-sized dims.
    """
    customer = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@query(
    "join_multikey_derived",
    oracle="""
    SELECT year(o_orderdate) AS yr, count(*) AS cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
               AND year(l_shipdate) = year(o_orderdate)
    GROUP BY 1
    """,
)
def join_multikey_derived(spark, sf_dir):
    """Composite-key join on a derived column ((GEOID, year) merge analog, R5)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    joined = li.join(
        orders,
        (li.l_orderkey == orders.o_orderkey)
        & (F.year(li.l_shipdate) == F.year(orders.o_orderdate)),
    )
    return joined.groupBy(big(F.year("o_orderdate")).alias("yr")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@query(
    "join_left_null",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_left_null(spark, sf_dir):
    """Left join preserving no-match rows (geographies with no eviction data, R5)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
    """,
)
def join_semi(spark, sf_dir):
    """Existence filter as LEFT SEMI join (rankings population cutoff / QA, R8/R12)."""
    customer = load(spark, sf_dir, "customer")
    orders95 = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    return customer.join(
        orders95, customer.c_custkey == orders95.o_custkey, "left_semi"
    ).select("c_custkey")


@query(
    "join_anti",
    oracle=f"""
    WITH cust AS ({fixtures.CUSTOMERS_WITH_ORPHANS_SQL})
    SELECT c_custkey
    FROM cust
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    """Anti join: customers with no orders at all (validation diffing, R12).

    At sf0.01 every organic customer has orders, so the raw anti join is
    empty in both engines and a hash match verifies nothing. The input is
    therefore the FIXTURE-LAYER corpus (fixtures.customers_with_orphans —
    25 planted keys guaranteed order-less), so the join decides >=25 real
    rows; the anti-join operator itself is unchanged."""
    customer = fixtures.customers_with_orphans(spark, sf_dir)
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey")


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id AS purchase_event_id, s.event_id AS signup_event_id
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: each purchase ↔ most recent signup of the same user at or
    before it (streaming/crosswalk extension, S/R10; SURVEY §4.2 item 1).

    Built on the library primitive ``functions.asof.asof_join`` (union-tag +
    one shuffle on user_id + last-ignorenulls window): O(n log n) per user, no
    range-join explosion, and exact-timestamp ties are correctly visible
    (right rows sort before left rows at equal ts, matching ASOF ``>=``)."""
    from eviction_lab_etl_spark.functions.asof import asof_join

    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event_id")
    )
    matched = asof_join(
        purchases, signups, by="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["signup_event_id"],
    )
    return matched.filter(F.col("signup_event_id").isNotNull()).select(
        F.col("event_id").alias("purchase_event_id"), "signup_event_id"
    )


@query(
    "join_range_interval",
    oracle="""
    SELECT o.o_orderkey, count(l.l_orderkey) AS n_90d
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
)
def join_range_interval(spark, sf_dir):
    """Equi join + range predicate: lineitems shipped within 90 days of the
    order date (R5). The equi key keeps this a hash join; the range predicate
    is a post-join filter, not a cross product."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= orders.o_orderdate + F.expr("INTERVAL 90 DAY"))
    )
    return (
        orders.join(li, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_90d"))
    )


@query(
    "join_weighted_alloc",
    oracle="""
    SELECT l.l_orderkey AS o_orderkey, l.l_linenumber,
           o.o_totalprice * l.l_extendedprice / l.tot AS alloc
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                      OVER (PARTITION BY l_orderkey) AS DOUBLE) AS tot
          FROM lineitem) l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    """,
)
def join_weighted_alloc(spark, sf_dir):
    """Crosswalk weighted apportionment (R10): allocate each order's total
    price across its lineitems proportionally to extended price.

    The denominator is an exact decimal window sum cast to double (§2.0 rule 1),
    so the per-row double expression is bit-identical in both engines. SURVEY
    specifies round(...,6); we emit the raw quotient instead — double round()
    algorithms differ across engines at representation boundaries, while the
    unrounded quotient is IEEE-deterministic.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    w = Window.partitionBy("l_orderkey")
    li_tot = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.sum(dec("l_extendedprice")).over(w).cast("double").alias("tot"),
    )
    joined = li_tot.join(orders, li_tot.l_orderkey == orders.o_orderkey)
    return joined.select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        (F.col("o_totalprice") * F.col("l_extendedprice") / F.col("tot")).alias("alloc"),
    )


@query(
    "join_cross_small",
    oracle="""
    SELECT r_name, status
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders)
    """,
)
def join_cross_small(spark, sf_dir):
    """Small cross join: the level×year template matrix the reference's Make DAG
    enumerates (R1/R6)."""
    region = load(spark, sf_dir, "region").select("r_name")
    status = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("status"))
        .distinct()
    )
    return region.crossJoin(F.broadcast(status))


@query(
    "join_lateral_topn",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.cents
    FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 199 = 0) o
    CROSS JOIN LATERAL (
        SELECT l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM lineitem WHERE l_orderkey = o.o_orderkey
        ORDER BY cents DESC, l_linenumber LIMIT 2
    ) l
    """,
)
def join_lateral_topn(spark, sf_dir):
    """LATERAL correlated subquery (C/X): for each selected order, its top-2
    priciest lineitems — the per-row-subquery SQL surface (\"for each X give
    me its best Ys\") that DSL joins can't state directly. Catalyst
    decorrelates the lateral into a join + per-key limit rather than
    executing the inner query once per outer row, so the plan scales like
    the window top-k family. Price is emitted as exact integer cents
    (decimal(12,2)*100 — a double*100 cast truncates vs rounds differently
    across engines). The %199 outer filter keeps the driver result compact
    while every order's inner ordering is still exercised."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lat_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, l.l_linenumber, l.cents
        FROM (SELECT o_orderkey FROM lat_orders WHERE o_orderkey % 199 = 0) o,
        LATERAL (
            SELECT l_linenumber,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS cents
            FROM lat_lineitem WHERE l_orderkey = o.o_orderkey
            ORDER BY cents DESC, l_linenumber LIMIT 2
        ) l
        """
    )


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT p.event_id AS purchase_event_id, s.event_id AS signup_event_id
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    WHERE p.ts - s.ts <= INTERVAL 2 HOUR
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a TOLERANCE bound (the kdb/TimescaleDB/pandas
    `merge_asof(tolerance=...)` semantic): each purchase matches its most
    recent signup at or before it, but only if that signup is within 2
    hours — a match staler than the tolerance is no match at all, which is
    NOT the same as a range join (the range join would fall back to an
    older in-window signup; tolerance-asof must not). Composition: the same
    one-shuffle union-tag asof primitive as `join_asof`, carrying the
    matched signup's timestamp in the payload, then a post-filter on the
    staleness — zero extra shuffles over the plain asof."""
    from eviction_lab_etl_spark.functions.asof import asof_join

    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.col("event_id").alias("signup_event_id"),
        F.col("ts").alias("signup_ts"),
    )
    matched = asof_join(
        purchases, signups, by="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["signup_event_id", "signup_ts"],
    )
    return matched.filter(
        F.col("signup_event_id").isNotNull()
        & (F.col("ts") - F.col("signup_ts") <= F.expr("INTERVAL 2 HOURS"))
    ).select(F.col("event_id").alias("purchase_event_id"), "signup_event_id")


@query(
    "join_scd2_point_in_time",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment AS segment,
               DATE '1990-01-01' AS valid_from,
               DATE '1995-01-01' + INTERVAL (c_custkey % 2000) DAY AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, '9-MOVED' AS segment,
               DATE '1995-01-01' + INTERVAL (c_custkey % 2000) DAY AS valid_from,
               DATE '2999-01-01' AS valid_to
        FROM customer
    )
    SELECT segment,
           count(*) AS n_orders,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS spend_cents
    FROM orders
    JOIN dim ON dim.c_custkey = o_custkey
            AND o_orderdate >= valid_from AND o_orderdate < valid_to
    GROUP BY segment
    """,
)
def join_scd2_point_in_time(spark, sf_dir):
    """Point-in-time join against a slowly-changing (SCD type 2) dimension:
    every fact row is matched to the dimension VERSION that was valid at
    the fact's own date — the correctness backbone of any warehouse where
    attributes change over time (the reference's geography vintages, 2000
    vs 2010, are exactly this problem). The versioned dimension is
    synthesized deterministically (each customer changes segment once, at a
    custkey-derived date), so the half-open [valid_from, valid_to)
    intervals tile time with no gap or overlap and every order matches
    EXACTLY one version — the invariant that makes the join lossless
    (n_orders re-totals to |orders|, asserted by the count). At 100 TB:
    equi-key on custkey carries the join (the interval predicate is a
    cheap residual filter on the matched pairs, not a range-join blowup);
    the 2-versions-per-key dimension broadcasts or co-partitions like any
    other dim; spend is exact cents."""
    from eviction_lab_etl_spark.functions.determinism import cents

    cust = load(spark, sf_dir, "customer")
    pivot = F.expr("DATE '1995-01-01' + make_interval(0,0,0, c_custkey % 2000)")
    dim_v1 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        pivot.cast("date").alias("valid_to"),
    )
    dim_v2 = cust.select(
        "c_custkey",
        F.lit("9-MOVED").alias("segment"),
        pivot.cast("date").alias("valid_from"),
        F.lit("2999-01-01").cast("date").alias("valid_to"),
    )
    dim = dim_v1.unionByName(dim_v2)
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(dim),
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderdate") >= F.col("valid_from"))
            & (F.col("o_orderdate") < F.col("valid_to")),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("spend_cents"),
        )
    )


@query(
    "join_skew_salted",
    oracle="""
    WITH profile AS (
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM events
        GROUP BY user_id
    )
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(p.n_events) AS BIGINT) AS sum_profile_events,
           CAST(sum(p.total_cents) AS BIGINT) AS sum_profile_cents
    FROM events e JOIN profile p ON e.user_id = p.user_id
    GROUP BY e.event_type
    """,
)
def join_skew_salted(spark, sf_dir):
    """Fact-to-profile enrichment through the SALTED join construction
    (plans/layout.salted_join): every event joins its user's lifetime
    profile (count + exact-cents spend), with the fact side fanned across 8
    deterministic sub-keys (xxhash64 of the full row — no rand(), §2.0) and
    the profile replicated to match, then a per-type rollup. The oracle is
    the PLAIN join — salting must change the shuffle distribution and
    nothing else, and the driver hash pins that equality on real data (the
    same contract style as `stream_session_skewsafe`). Why it exists at
    100 TB: a viral user sends all their events to one task under a plain
    hash join; the salt bounds any task at ~1/8 of the hot key. Perf
    evidence lives in SCALE.md's skew-stress tables (tools/skew_stress.py:
    plain SMJ vs AQE-split vs salted_join at a 90%-hot key — the r7
    heavy-consumer A/B measures the salted path WINNING 2.2-2.5x when the
    join feeds per-row compute, the regime where AQE's split cannot move
    the post-join work off the straggler); on this
    fixture the replicated profile still broadcasts, so the query pins
    semantics, not speed. Left side carries event_id so the salt spreads a
    hot user's rows evenly (salting on a low-cardinality projection would
    re-concentrate them)."""
    from eviction_lab_etl_spark.functions.determinism import cents
    from eviction_lab_etl_spark.plans.layout import salted_join

    events = load(spark, sf_dir, "events")
    profile = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents("value")).alias("total_cents"),
    )
    fact = events.select("event_id", "user_id", "event_type")
    joined = salted_join(fact, profile, "user_id", n_salts=8)
    return joined.groupBy("event_type").agg(
        big(F.count(F.lit(1))).alias("n"),
        big(F.sum("n_events")).alias("sum_profile_events"),
        big(F.sum("total_cents")).alias("sum_profile_cents"),
    )


@query(
    "join_bloom_pruned",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def join_bloom_pruned(spark, sf_dir):
    """Bloom-filter RUNTIME-FILTER join: revenue per Asian supplier nation,
    with the lineitem fact side pre-pruned by an explicit Bloom filter built
    from the qualifying supplier keys BEFORE the exact join runs. The Bloom
    is m=4096 bits packed into 64 longs (k=3 xxhash64 probes), built with
    one tiny aggregation over the dim side and attached to the fact scan as
    a broadcast 1-row map — every probe is a JVM-side bit test, no Python,
    no shuffle. False positives survive the pre-filter but are REMOVED by
    the exact equi-join that follows, so the result is exactly the plain
    join: the oracle is the un-bloomed SQL, which makes the whole
    construction hash-verifiable (the same contract style as
    `join_skew_salted` — the optimization must change I/O, not answers).

    Why it exists at 100 TB: when the dim's qualifying key set is too big to
    broadcast-HASH-join (hundreds of millions of keys) the engine falls back
    to shuffling the fact side; a Bloom of those keys is ~100-1000x smaller
    than the hash table at a chosen false-positive rate, still broadcasts,
    and eliminates most fact rows BEFORE the shuffle — the semi-join
    reduction Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled`
    injects when its thresholds fire; building it explicitly makes the
    reduction unconditional and testable. On this fixture the dim also
    broadcasts, so the query pins semantics; the pruning factor itself is
    asserted in tests (non-Asian suppliers' rows mostly drop pre-join)."""
    from eviction_lab_etl_spark.functions.bloom import bloom_build, bloom_prune

    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    dims = (
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("s_suppkey").cast("long").alias("key"), "n_name")
    )

    bloom = bloom_build(dims, "key")
    fact = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    pruned = bloom_prune(fact, bloom, "l_suppkey")

    return (
        pruned.join(
            F.broadcast(dims), F.col("l_suppkey") == F.col("key")
        )
        .groupBy("n_name")
        .agg(
            big(F.count(F.lit(1))).alias("n_items"),
            big(F.sum(cents("l_extendedprice"))).alias("revenue_cents"),
        )
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM (SELECT DISTINCT p_name FROM part) a
    JOIN (SELECT DISTINCT p_name FROM part) b
      ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def join_fuzzy_blocked(spark, sf_dir):
    """Fuzzy (edit-distance) self-join with LOSSLESS length blocking: all
    distinct part-name pairs within Levenshtein distance 2, found WITHOUT
    evaluating the quadratic pair space. The blocking key is string length:
    lev(a,b) <= d implies abs(len(a)-len(b)) <= d (each edit changes length
    by at most 1), so side B explodes each name to the d+1+d candidate
    lengths it could match and the join is a plain EQUI-join on length —
    shuffle-partitionable, no nested loop — followed by the exact
    `levenshtein` predicate on the candidates only. The oracle IS the
    quadratic join (DuckDB evaluates it fine at fixture scale), so the
    driver hash proves the blocking lossless: every true pair survives.

    Why it exists at 100 TB: record linkage / near-key joins are quadratic
    if expressed directly (Catalyst plans theta-joins as BroadcastNestedLoop
    — the SCALE-killer); length banding bounds candidates to the pair mass
    within a diagonal band of the length histogram, and composes with
    stronger lossless filters (the PPJoin prefix filter of
    `sim_jaccard_prefix`) for longer strings. Names here are short; the
    same shape applies to any bounded-distance string key. The
    construction lives in ``functions.similarity.fuzzy_blocked_pairs``;
    `pipeline_entity_resolution` composes it with connected components."""
    from eviction_lab_etl_spark.functions.similarity import fuzzy_blocked_pairs

    names = load(spark, sf_dir, "part").select("p_name").distinct()
    return fuzzy_blocked_pairs(names, "p_name", max_dist=2)


# --- interval-overlap join (time-partitioned, the temporal family's close) ---

_DAY_US = 86_400_000_000


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type,
               CAST(epoch_us(ts) AS BIGINT) AS t,
               CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day
        FROM events
    ),
    i AS (
        SELECT event_type, day, user_id, min(t) AS s, max(t) AS e
        FROM e GROUP BY event_type, day, user_id
    )
    SELECT a.event_type, a.day AS od,
           CAST(a.user_id AS BIGINT) AS ua,
           CAST(b.user_id AS BIGINT) AS ub,
           CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) AS overlap_us
    FROM i a JOIN i b
      ON a.event_type = b.event_type AND a.day = b.day
     AND a.user_id < b.user_id
    WHERE a.s <= b.e AND b.s <= a.e
    """,
)
def join_interval_overlap(spark, sf_dir):
    """INTERVAL × INTERVAL overlap join — the temporal-join family's
    missing member (join_asof: point→latest-before; join_range_interval:
    point-in-interval; join_asof_tolerance: bounded gap): which same-type
    daily activity windows of two users overlap, and by how much — the
    concurrency/co-activity primitive behind session-collision analysis,
    ad-slot contention, and shift-overlap billing. Intervals are per
    (event_type, day, user) [min ts, max ts] windows; pairs overlap iff
    a.s ≤ b.e AND b.s ≤ a.e, emitted with the exact overlap duration in
    integer µs (unix_micros ≡ epoch_us — the cross-engine ts recipe).

    Scale shape — TIME-PARTITIONED interval join, the standard strategy:
    intervals cannot cross their (type, day) partition by construction,
    so the non-equi overlap predicate rides INSIDE an equi-join keyed on
    (event_type, day) — one interval-build shuffle, one bucket-keyed join
    shuffle (AQE reuses the identical self-join side at runtime), and the
    quadratic is confined to per-bucket occupancy (~|users active that
    day|), never the global interval space. A hot bucket is bounded the
    skyline_nd way: refine the bucket to hours, dedup pairs spanning
    several — same plan, finer key. The day split is exact here because
    the windows are day-scoped; for arbitrary intervals the bucketing
    explodes each interval over the buckets it spans and a DISTINCT
    collapses multi-bucket pairs.

    Day bucketing uses FLOOR-division semantics to match DuckDB's ``//``:
    Spark's ``div`` truncates toward zero, which would mis-bucket negative
    (pre-1970) epoch-microsecond timestamps; the ``t % D < 0`` correction
    makes the two engines agree for all t (identical for the post-1970
    fixture, so prior driver hashes are unaffected)."""
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("t"),
        )
        .withColumn(
            "day",
            F.expr(
                f"t div {_DAY_US}"
                f" - (CASE WHEN t % {_DAY_US} < 0 THEN 1 ELSE 0 END)"
            ),
        )
    )
    i = ev.groupBy("event_type", "day", "user_id").agg(
        F.min("t").alias("s"), F.max("t").alias("e")
    )
    a, b = i.alias("a"), i.alias("b")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .filter(
            (F.col("a.s") <= F.col("b.e")) & (F.col("b.s") <= F.col("a.e"))
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            big(F.col("a.day")).alias("od"),
            big(F.col("a.user_id")).alias("ua"),
            big(F.col("b.user_id")).alias("ub"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("overlap_us"),
        )
    )


# --- nearest-direction as-of join (pandas merge_asof direction='nearest') ----


@query(
    "join_asof_nearest",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, epoch_us(ts) AS us, event_id,
               CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS tag
        FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    w AS (
        SELECT user_id, ts, us, event_id, tag,
               last_value(CASE WHEN tag = 0 THEN us END IGNORE NULLS)
                   OVER back AS b_us,
               last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
                   OVER back AS b_id,
               first_value(CASE WHEN tag = 0 THEN us END IGNORE NULLS)
                   OVER fwd AS f_us,
               first_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
                   OVER fwd AS f_id
        FROM tagged
        WINDOW
          back AS (PARTITION BY user_id ORDER BY us, tag, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          fwd AS (PARTITION BY user_id ORDER BY us, tag, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN b_us IS NOT NULL
                     AND (f_us IS NULL OR us - b_us <= f_us - us)
                THEN b_id ELSE f_id END AS signup_id,
           CASE WHEN b_us IS NOT NULL
                     AND (f_us IS NULL OR us - b_us <= f_us - us)
                THEN us - b_us ELSE f_us - us END AS dist_us
    FROM w WHERE tag = 1
    """,
)
def join_asof_nearest(spark, sf_dir):
    """NEAREST-direction as-of join (pandas ``merge_asof(direction=
    'nearest')`` / kdb-style temporal matching): every purchase matched to
    the signup of the same user MINIMIZING |Δts|, ties resolved BACKWARD
    (the pandas rule), microsecond-exact. Completes the temporal-join
    family's direction axis: `join_asof` (backward), `join_asof_tolerance`
    (backward + bound), `join_range_interval` / `join_interval_overlap`
    (windows) — nearest is the one a sensor/feature-alignment pipeline
    reaches for when the reference stream samples AROUND the probe times
    rather than before them.

    Implemented as the UNION-WINDOW form, not a join: both event streams
    tag into one frame, ONE shuffle on user_id orders it, and two frames
    over the same sort (running last signup / upcoming first signup) give
    each purchase its backward and forward candidate — O(n log n) per
    user, no per-row subquery, no range join. Same-ts signups sort BEFORE
    the purchase (tag 0 < 1) so a distance-0 match lands on the backward
    leg; equal-ts signup ties resolve by event_id through the shared sort
    key. At 100 TB this is the sessionize shape: one exchange, windows
    reuse the partitioning, nothing corpus-sized moves twice."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    tagged = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.when(F.col("event_type") == "signup", 0).otherwise(1).alias("tag"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("us", "tag", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    sig_us = F.when(F.col("tag") == 0, F.col("us"))
    sig_id = F.when(F.col("tag") == 0, F.col("event_id"))
    w = tagged.select(
        "user_id",
        "us",
        "event_id",
        "tag",
        F.last(sig_us, ignorenulls=True).over(back).alias("b_us"),
        F.last(sig_id, ignorenulls=True).over(back).alias("b_id"),
        F.first(sig_us, ignorenulls=True).over(fwd).alias("f_us"),
        F.first(sig_id, ignorenulls=True).over(fwd).alias("f_id"),
    )
    take_back = F.col("b_us").isNotNull() & (
        F.col("f_us").isNull()
        | (F.col("us") - F.col("b_us") <= F.col("f_us") - F.col("us"))
    )
    return w.filter(F.col("tag") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(take_back, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "signup_id"
        ),
        F.when(take_back, F.col("us") - F.col("b_us"))
        .otherwise(F.col("f_us") - F.col("us"))
        .alias("dist_us"),
    )
