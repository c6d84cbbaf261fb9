"""Group D — aggregations (SURVEY §2.D).

Models the reference's statistics builds: per-(geography, year) sums and rates
(R4/R7), population-weighted means (R10), state→national rollups (R7), and the
low-flag conditional aggregates of the published data dictionary (R5/R6).

Determinism: every money aggregate is an exact DECIMAL sum cast to double only
after aggregation (§2.0 rule 1) — identical under any partitioning, so Spark's
partial (map-side) aggregation stays enabled and the plans remain the default
two-phase hash aggregates Catalyst picks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import (
    CHARGE_SQL,
    big,
    cents,
    dec,
    sum_exact_long,
    to_dbl,
)
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load, register_views

# DuckDB-side JSON int extraction (Spark side uses get_json_object).
_JSON_K = "CAST(json_extract_string(props, '$.k') AS BIGINT)"


@query(
    "agg_sum_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           CAST(sum({CHARGE_SQL}) AS DOUBLE) AS sum_charge,
           count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_sum_groupby(spark, sf_dir):
    """Flagship: TPC-H Q1-style grouped sums (the reference's core stats build,
    R4/R7). Partial+final hash aggregation.

    Fast exact path: all money inputs are verified 2-dp, so per-row arithmetic
    runs in scaled-integer (cents / micro-units) **long** arithmetic inside
    whole-stage codegen — Spark's per-row Decimal operations cost ~5× more
    (measured 1.4s → 0.35s on the sf0.1 scan). The exact long partials are
    reassembled into DECIMAL only at group boundaries (sum_exact_long: exact,
    associative, overflow-safe at 100 TB group sizes), then descaled exactly
    and cast to double. Values are bit-identical to the all-decimal oracle.
    """
    li = load(spark, sf_dir, "lineitem")
    charge_micro = (cents("l_extendedprice") * (100 - cents("l_discount")) * (100 + cents("l_tax")))
    descale = lambda s, f: (s * F.lit(f).cast("decimal(7,6)")).cast("double")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        # quantities are whole-valued: a plain bigint sum is exact and fastest
        F.sum(F.col("l_quantity").cast("bigint")).cast("double").alias("sum_qty"),
        descale(sum_exact_long(cents("l_extendedprice")), 0.01).alias("sum_price"),
        descale(sum_exact_long(charge_micro), 0.000001).alias("sum_charge"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "agg_weighted_mean",
    oracle=f"""
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(18,6)) * {_JSON_K}) AS DOUBLE)
             / CAST(sum({_JSON_K}) AS DOUBLE) AS wavg,
           CAST(sum(CAST(value AS DECIMAL(18,6)) * {_JSON_K}) AS DOUBLE) AS num,
           CAST(sum({_JSON_K}) AS BIGINT) AS den
    FROM events
    GROUP BY event_type
    """,
)
def agg_weighted_mean(spark, sf_dir):
    """Population-weighted mean (crosswalk/demographics weighting, R4/R10):
    exact decimal numerator, bigint denominator, ratio derived from exact
    values — bit-identical across engines."""
    events = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    num = F.sum(dec("value") * k)
    den = F.sum(k)
    return events.groupBy("event_type").agg(
        (to_dbl(num) / to_dbl(den)).alias("wavg"),
        to_dbl(num).alias("num"),
        big(den).alias("den"),
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT n_name,
           count(DISTINCT c_mktsegment) AS n_seg,
           count(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_multi_distinct(spark, sf_dir):
    """Distinct + plain aggregates in one pass (export QA counts, R7)."""
    customer = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count_distinct("c_mktsegment").alias("n_seg"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS r,
           coalesce(n_name, 'ALL') AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total,
           count(*) AS cnt
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark, sf_dir):
    """Hierarchical rollup: the reference's state→national aggregation (R7)."""
    customer = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region"))
    joined = customer.join(nation, customer.c_nationkey == nation.n_nationkey).join(
        region, nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            to_dbl(F.sum(dec("c_acctbal"))).alias("total"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r"),
            F.coalesce("n_name", F.lit("ALL")).alias("n"),
            "total",
            "cnt",
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS cnt
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    """Cube over two categorical dimensions (cross-tab exports, R7)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "cnt",
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit grouping sets (per-level export slices, R7)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT user_id,
           count(*) AS n_total,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'purchase')
                AS DOUBLE) AS spend_purchase
    FROM events
    GROUP BY user_id
    """,
)
def agg_conditional(spark, sf_dir):
    """Conditional aggregates (low-flag style coding, R5/R6). NULL spend for
    users with no purchases — preserved on both sides."""
    events = load(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(is_purchase).alias("n_purchase"),
        to_dbl(F.sum(F.when(is_purchase, dec("value")))).alias("spend_purchase"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT p_type,
           min(p_retailprice) AS min_price,
           max(p_retailprice) AS max_price,
           count(*) AS cnt
    FROM part
    GROUP BY p_type
    """,
)
def agg_stats(spark, sf_dir):
    """Min/max/count profile (QA validation stats, R4/R12). Min/max of doubles
    select existing values — exact by construction."""
    part = load(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_3rsd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """Approximate distinct count (HyperLogLog++): the 100 TB path for
    cardinality estimation where exact count(distinct) would shuffle
    everything.

    ERROR CONTRACT, hash-checked (round-7 verdict item 1): the sketch value
    itself is engine-specific (DuckDB's HLL differs by design), so the
    emitted surface is the EXACT count plus the measured accuracy verdict
    ``|approx − exact| ≤ 3·rsd·exact`` (rsd = 0.05, the default the call
    runs at; HLL++'s standard error, so 3·rsd is a ≥3σ envelope). The
    oracle asserts the verdict as a literal TRUE: if the estimate ever
    leaves the envelope the driver's hash goes red instead of recording
    "ran". Measured error on the shipped fixtures: ≤ 2.7 % at every scale
    (probe, round-8 log). Both aggregates share one shuffle — the exact
    count is the verification harness, the approx path is what a 100 TB
    run would keep."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("_approx"),
    ).select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_approx") - F.col("exact_parts")) * 20
            <= 3 * F.col("exact_parts")
        ).alias("within_3rsd"),
    )


@query(
    "agg_mode",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q, count(*) AS n
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, q AS mode_qty, n AS mode_count
    FROM c
    QUALIFY row_number() OVER (
        PARTITION BY l_returnflag ORDER BY n DESC, q
    ) = 1
    """,
)
def agg_mode(spark, sf_dir):
    """Mode (most frequent value) per group, as the deterministic two-level
    composition: count per (group, value), then rank by (count DESC, value
    ASC) and keep the winner. Spark 3.4+ ships a built-in `mode()` aggregate
    but leaves ties non-deterministic — unusable under §2.0 rule 3, and
    DuckDB's mode() has the same gap — so BOTH engines here run the explicit
    construction, which also partial-aggregates map-side (the built-in
    buffers a full value→count map per group; this form shuffles (group,
    value) pairs once and the final top-1 window is over the distinct-value
    table, not the fact table)."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(F.col("n").desc(), "q")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("q").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )


@query(
    "agg_bool_logic",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           bool_and(o_orderpriority <> '1-URGENT') AS none_urgent
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_bool_logic(spark, sf_dir):
    """Boolean-logic aggregates (bool_and / bool_or — the every()/some()
    quantifiers): per order status, whether ALL orders clear a price floor
    and whether ANY / NONE are urgent. The reference's QA checks (R12) are
    exactly these shapes ('every exported row has a parent-location').
    Booleans aggregate exactly (no float hazard); at scale they partial-
    aggregate map-side like any min/max."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.bool_and(F.col("o_orderpriority") != "1-URGENT").alias("none_urgent"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
               AS segments,
           count(*) AS n_cust
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """Array aggregation with a deterministic surface: the distinct market
    segments per nation, SORTED and joined into one canonical string
    (collect_set's order is partition-dependent garbage until sort_array
    canonicalizes it — the rule-3 tiebreak discipline applied to array
    outputs; concat_ws then flattens the array to a scalar so the result
    hashes on any verification surface, including ones whose pandas
    canonicalizer cannot sort numpy-array cells). The reference's
    data-dictionary exports ('which segments appear in this geography')
    are this shape. Partial collect_set aggregates merge map-side; the
    array stays ≤ |segments| = 5 elements regardless of row count."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias(
                "segments"
            ),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@query(
    "agg_corr_components",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_x_cents,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_y,
           CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    * CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_xy_cents,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)
                    * CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_yy
    FROM events
    GROUP BY event_type
    """,
)
def agg_corr_components(spark, sf_dir):
    """Correlation/regression sufficient statistics, exactness-first: per
    event type, the integer moment sums (n, Σx, Σy, Σxy, Σy²) between the
    cents-exact value and the JSON property k. The consumer derives
    Pearson r or OLS slope from five exact integers — the engine never
    aggregates a float, so the statistics hash identically under any
    partitioning (the decomposed form is also what map-side partial
    aggregation wants: all five sums merge associatively). Overflow
    headroom: x_cents·k ≤ 10^7 per row keeps Σxy under int64 to ~10^11
    rows per group; past that, the sum_exact_long split applies."""
    events = load(spark, sf_dir, "events")
    from eviction_lab_etl_spark.functions.determinism import cents

    k = F.get_json_object("props", "$.k").cast("long")
    x = cents("value")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sum_x_cents"),
        F.sum(k).alias("sum_y"),
        F.sum(x * k).alias("sum_xy_cents"),
        F.sum(k * k).alias("sum_yy"),
    )


@query(
    "agg_percentiles_by_lang",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(floor(quantile_cont(CAST(n_chars AS BIGINT), 0.25)) AS BIGINT)
               AS p25,
           CAST(floor(median(CAST(n_chars AS BIGINT))) AS BIGINT) AS p50,
           CAST(floor(quantile_cont(CAST(n_chars AS BIGINT), 0.75)) AS BIGINT)
               AS p75
    FROM documents
    GROUP BY lang
    """,
)
def agg_percentiles_by_lang(spark, sf_dir):
    """Exact per-stratum percentiles (p25/p50/p75 of document length per
    language) — the distribution summary a corpus report tables next to the
    mean. Both engines interpolate continuous quantiles over INTEGER inputs,
    so every interpolated value is an exact k/4 rational the two engines
    compute identically; the floor-before-cast guard then avoids DuckDB's
    round-half-up bigint cast (the dataset-card median landmine, applied to
    all three quantiles). Spark's percentile() is an exact aggregate —
    sorted per group, fine for per-stratum stats; corpus-wide quantiles at
    100 TB use the approx_percentile sketch (agg_approx_quantile)."""
    docs = load(spark, sf_dir, "documents")
    n = F.col("n_chars").cast("long")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.floor(F.percentile(n, F.lit(0.25))).cast("long").alias("p25"),
        F.floor(F.percentile(n, F.lit(0.5))).cast("long").alias("p50"),
        F.floor(F.percentile(n, F.lit(0.75))).cast("long").alias("p75"),
    )


@query(
    "agg_median_countframe",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    c AS (SELECT event_type, v, count(*) AS cnt FROM e GROUP BY event_type, v),
    r AS (
        SELECT event_type, v,
               CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS t
        FROM c
    )
    SELECT event_type,
           CAST(min(t) AS BIGINT) AS n,
           CAST(min(v) AS BIGINT) AS median_cents
    FROM r WHERE 2 * cum >= t GROUP BY event_type
    """,
)
def agg_median_countframe(spark, sf_dir):
    """Exact grouped median via the distinct-value COUNT FRAME — the
    100-TB-scalable exact algorithm, in deliberate contrast to
    ``agg_percentiles_by_lang``'s ``percentile()`` (which buffers every
    group's values in executor memory for the per-group sort: fine for
    per-stratum stats, an OOM at a billion rows per group). Here the fact
    stream collapses to (group, value, count) in one exchange with map-side
    combine — bounded by the value DOMAIN (cents in a known range), not the
    row count — and the median is read off the cumulative frame as the
    smallest value whose doubled running count reaches the total (the exact
    lower median; all-integer, no interpolation, no engine divergence).
    The same frame answers any quantile and costs one window over the
    collapsed counts."""
    from pyspark.sql import Window

    from eviction_lab_etl_spark.functions.determinism import cents

    c = (
        load(spark, sf_dir, "events")
        .select("event_type", cents("value").alias("v"))
        .groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "v",
        F.sum("cnt").over(wc).cast("long").alias("cum"),
        F.sum("cnt").over(wt).cast("long").alias("t"),
    )
    return (
        r.filter(2 * F.col("cum") >= F.col("t"))
        .groupBy("event_type")
        .agg(
            F.min("t").cast("long").alias("n"),
            F.min("v").cast("long").alias("median_cents"),
        )
    )
