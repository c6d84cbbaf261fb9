"""Group H — scalar functions (SURVEY §2.H).

The reference's row-wise transforms: GEOID zero-padding and parent-location
label construction (R5/R9), regex extraction for the search index (R9),
year/quarter date parts (R4/R5), CASE bucketing for map legends (R6), and the
JSON/array surface of the LLM extension (X).

§2.0 rule 5 blacklist respected: no round() on floats, no dayofweek, no initcap.
Int-returning scalars are widened to bigint (DuckDB's length()/year() return
BIGINT where Spark returns INT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark import fixtures

from eviction_lab_etl_spark.functions.determinism import big, dec, to_dbl
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load


@query(
    "scalar_string_fmt",
    oracle="""
    SELECT lpad(CAST(n_nationkey AS VARCHAR), 5, '0') AS geoid,
           concat_ws(', ', n_name, r_name) AS label,
           upper(n_name) AS up,
           substr(n_name, 1, 3) AS pfx,
           length(n_name) AS len,
           replace(n_name, ' ', '_') AS rep
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def scalar_string_fmt(spark, sf_dir):
    """GEOID-style string formatting (R5/R9: zero-padded keys, 'name, parent'
    labels for the location search index)."""
    nation = load(spark, sf_dir, "nation")
    region = F.broadcast(load(spark, sf_dir, "region"))
    return nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.lpad(F.col("n_nationkey").cast("string"), 5, "0").alias("geoid"),
        F.concat_ws(", ", "n_name", "r_name").alias("label"),
        F.upper("n_name").alias("up"),
        F.substring("n_name", 1, 3).alias("pfx"),
        big(F.length("n_name")).alias("len"),
        F.replace(F.col("n_name"), F.lit(" "), F.lit("_")).alias("rep"),
    )


@query(
    "scalar_regexp",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS ck
    FROM customer
    """,
)
def scalar_regexp(spark, sf_dir):
    """Regex key extraction (R9): names are 'Customer#000000042' → 42."""
    customer = load(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("bigint").alias("ck"),
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           quarter(o_orderdate) AS qtr,
           month(o_orderdate) AS mon,
           day(o_orderdate) AS d,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd
    FROM orders
    """,
)
def scalar_datetime(spark, sf_dir):
    """Date-part extraction (R4/R5 year keys). dayofweek deliberately excluded:
    Spark numbers Sunday=1, DuckDB Sunday=0 (§2.0 rule 5)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        big(F.year("o_orderdate")).alias("yr"),
        big(F.quarter("o_orderdate")).alias("qtr"),
        big(F.month("o_orderdate")).alias("mon"),
        big(F.dayofmonth("o_orderdate")).alias("d"),
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("mstart"),
        big(F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))).alias("dd"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT o_orderkey,
           abs(o_orderkey) % 7 AS m7,
           CAST(floor(o_totalprice) AS BIGINT) AS fl,
           CAST(ceil(o_totalprice) AS BIGINT) AS ce,
           o_custkey * o_custkey AS sq
    FROM orders
    """,
)
def scalar_math(spark, sf_dir):
    """Arithmetic scalar surface (R4). floor/ceil are cast to bigint on both
    sides (DuckDB returns DOUBLE, Spark BIGINT)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.pmod(F.abs(F.col("o_orderkey")), F.lit(7)).alias("m7"),
        F.floor("o_totalprice").cast("bigint").alias("fl"),
        F.ceil("o_totalprice").cast("bigint").alias("ce"),
        (F.col("o_custkey") * F.col("o_custkey")).alias("sq"),
    )


@query(
    "scalar_case_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 1000 THEN 'low'
                WHEN o_totalprice < 5000 THEN 'mid'
                ELSE 'high' END AS band,
           count(*) AS cnt
    FROM orders
    GROUP BY 1
    """,
)
def scalar_case_bucket(spark, sf_dir):
    """CASE banding — the map legend bucket assignment (R6)."""
    orders = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 1000, "low")
        .when(F.col("o_totalprice") < 5000, "mid")
        .otherwise("high")
    )
    return orders.groupBy(band.alias("band")).agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "scalar_array_ops",
    oracle="""
    SELECT doc_id,
           len(w) AS n,
           list_contains(w, 'spark') AS has_spark,
           len(list_distinct(w)) AS n_uniq,
           array_to_string(list_slice(w, 1, 5), ' ') AS head5
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    """,
)
def scalar_array_ops(spark, sf_dir):
    """Array surface over tokenized text (X): size / contains / distinct / slice."""
    docs = load(spark, sf_dir, "documents").withColumn("w", F.split("text", " "))
    return docs.select(
        "doc_id",
        big(F.size("w")).alias("n"),
        F.array_contains("w", "spark").alias("has_spark"),
        big(F.size(F.array_distinct("w"))).alias("n_uniq"),
        F.concat_ws(" ", F.slice("w", 1, 5)).alias("head5"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json(spark, sf_dir):
    """JSON path extraction + integer aggregate (S/X). DuckDB's sum(BIGINT)
    yields HUGEINT → terminal bigint cast on the oracle side (§2.0 rule 2)."""
    events = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy("event_type").agg(big(F.sum(k)).alias("sum_k"))


@query(
    "scalar_conditional_null",
    oracle="""
    SELECT c_custkey,
           CAST(coalesce(spend_dec, CAST(-1 AS DECIMAL(18,6))) AS DOUBLE) AS spend0
    FROM customer
    LEFT JOIN (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS spend_dec
               FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey) s
      ON o_custkey = c_custkey
    """,
)
def scalar_conditional_null(spark, sf_dir):
    """COALESCE to the reference's -1 sentinel (R5 re-encoding on export)."""
    customer = load(spark, sf_dir, "customer")
    spend97 = (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("spend_dec"))
    )
    return customer.join(spend97, customer.c_custkey == spend97.o_custkey, "left").select(
        "c_custkey",
        to_dbl(F.coalesce(F.col("spend_dec"), F.lit(-1).cast("decimal(18,6)"))).alias("spend0"),
    )


@query(
    "scalar_try_safe",
    oracle="""
    SELECT c_custkey,
           c_custkey / NULLIF(c_custkey % 7, 0) AS safe_div,
           CASE WHEN c_custkey % 2 = 0 THEN 9223372036854775807 END AS safe_add,
           TRY_CAST(string_split(c_name, '#')[2] AS BIGINT) AS name_num,
           string_split(c_name, '#')[3] AS missing_part
    FROM customer
    """,
)
def scalar_try_safe(spark, sf_dir):
    """ANSI-safe expression surface (S): Spark 4 runs with
    ``spark.sql.ansi.enabled=true``, where division by zero, arithmetic
    overflow, bad casts, and out-of-bounds element access are RUNTIME ERRORS
    that kill a 100 TB job 6 hours in. The ``try_*`` family is the
    per-expression escape hatch — NULL instead of abort — and every dirty
    ingest pipeline needs it: try_divide (NULL at zero divisors, here every
    7th key), try_add (NULL at bigint overflow, here every odd key pushed
    past Long.MAX), try_cast over parsed name tails, and try_element_at past
    the end of a split. The oracle states each expected value directly
    (DuckDB errors on none of these by default), which pins that the try_*
    forms return VALUES where they should and NULL exactly where they
    should."""
    cust = load(spark, sf_dir, "customer")
    parts = F.split("c_name", "#")
    return cust.select(
        "c_custkey",
        F.try_divide(F.col("c_custkey"), F.col("c_custkey") % 7).alias("safe_div"),
        F.try_add(
            F.lit(9223372036854775807), F.col("c_custkey") % 2
        ).alias("safe_add"),
        F.try_element_at(parts, F.lit(2)).try_cast("bigint").alias("name_num"),
        F.try_element_at(parts, F.lit(3)).alias("missing_part"),
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS lo_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 1365) AS toggled,
           o_orderkey << 3 AS shifted_l,
           o_orderkey >> 2 AS shifted_r
    FROM orders WHERE o_orderkey < 2000
    """,
)
def scalar_bitwise(spark, sf_dir):
    """Bitwise scalar surface (&, |, xor, shifts) — the primitives behind
    flag packing, hash mixing, and the Z-order key interleave in
    plans/layout.py, demonstrated on their own. Integer-exact by nature;
    both engines operate on two's-complement bigints."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("lo_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1365)).alias("toggled"),
        F.shiftleft(k, 3).alias("shifted_l"),
        F.shiftright(k, 2).alias("shifted_r"),
    )


@query(
    "scalar_variant_shred",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(count(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_with_k,
           CAST(max(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                         THEN 0 ELSE 1 END) AS BIGINT) AS any_missing_path
    FROM events
    GROUP BY event_type
    """,
)
def scalar_variant_shred(spark, sf_dir):
    """Semi-structured SHREDDING through Spark 4's VARIANT type: `props`
    parses once into a binary variant (`parse_json`), then typed paths
    extract via `variant_get` — the open-format answer to a schemaless
    ingest column, and the engine-native successor to per-access
    `get_json_object` string re-parsing. `try_variant_get` on an absent
    path yields NULL (pinned by the `any_missing_path` output — 0 for every
    group). The oracle reaches the same values through DuckDB's JSON
    functions, so the hash pins variant parse + typed extraction against an
    independent JSON implementation.

    Why VARIANT at 100 TB: parse-once binary encoding is O(paths) per row
    thereafter vs O(parse) per extraction for JSON strings, and variant
    columns shred into parquet with column statistics on extracted paths —
    the same scan-pruning economics as real columns, which `$.k`-style
    string extraction can never get."""
    events = load(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.parse_json("props").alias("pv")
    )
    k = F.variant_get("pv", "$.k", "bigint")
    missing = F.try_variant_get("pv", "$.missing", "string")
    return v.groupBy("event_type").agg(
        big(F.sum(k)).alias("sum_k"),
        F.count(F.when(k.isNotNull(), 1)).alias("n_with_k"),
        F.max(F.when(missing.isNull(), 0).otherwise(1))
        .cast("long")
        .alias("any_missing_path"),
    )


# --- URL component extraction --------------------------------------------------

# Shared with operators/web.py's canonical chain philosophy: only constructs
# with identical Java-regex/RE2 semantics, no lookarounds; both engines
# return '' for a non-matching regexp_extract, so absent components are
# empty strings (never NULL) on both sides by construction.
_URL_SCHEME_RE = "^([a-z]+)://"
_URL_STRIP_SCHEME_RE = "^[a-z]+://"
_URL_HOST_RE = "^([^/?#]+)"
_URL_PATH_RE = "(/[^?#]*)"
_URL_QUERY_RE = "[?]([^#]*)"
_URL_FRAG_RE = "#(.*)$"


@query(
    "scalar_url_parts",
    oracle=f"""
    WITH urls AS ({fixtures.DOCUMENTS_WITH_URLS_SQL}),
    s AS (
        SELECT doc_id, url,
               regexp_replace(url, '{_URL_STRIP_SCHEME_RE}', '') AS rest
        FROM urls
    )
    SELECT doc_id, url,
           regexp_extract(url, '{_URL_SCHEME_RE}', 1) AS scheme,
           regexp_extract(rest, '{_URL_HOST_RE}', 1) AS host,
           regexp_extract(rest, '{_URL_PATH_RE}', 1) AS path,
           regexp_extract(rest, '{_URL_QUERY_RE}', 1) AS query,
           regexp_extract(rest, '{_URL_FRAG_RE}', 1) AS frag
    FROM s
    """,
)
def scalar_url_parts(spark, sf_dir):
    """URL decomposition into (scheme, host, path, query, fragment) as pure
    JVM regex columns — the scalar building block under the web stage
    (operators/web.py folds; per-host stats; robots/sitemap routing). Absent
    components come back as empty strings in BOTH engines (their
    regexp_extract no-match contracts agree), so the schema stays
    all-VARCHAR with no NULL-semantics divergence. Map-only: rides the scan
    projection at 100 TB."""
    urls = fixtures.documents_with_urls(spark, sf_dir)
    rest = F.regexp_replace(F.col("url"), _URL_STRIP_SCHEME_RE, "")
    return urls.select(
        "doc_id",
        "url",
        F.regexp_extract(F.col("url"), _URL_SCHEME_RE, 1).alias("scheme"),
        F.regexp_extract(rest, _URL_HOST_RE, 1).alias("host"),
        F.regexp_extract(rest, _URL_PATH_RE, 1).alias("path"),
        F.regexp_extract(rest, _URL_QUERY_RE, 1).alias("query"),
        F.regexp_extract(rest, _URL_FRAG_RE, 1).alias("frag"),
    )
