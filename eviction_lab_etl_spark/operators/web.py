"""Web-crawl URL-stage operators: canonicalization, URL dedup, domain caps.

The stage a web-scale corpus pipeline runs BEFORE any document text is
touched (RefinedWeb's first filter; CCNet's crawl bookkeeping): fold the
byte-level noise out of URLs (scheme, ``www.``, host case, trailing slash,
tracking params, fragments), dedup on the canonical form, and cap how many
documents any single domain may contribute. All three are pure column
expressions + one keyed aggregate — at 100 TB the canonicalizer rides the
scan projection (zero extra passes), the dedup is ONE canonical-key shuffle
with map-side partial collapse, and the domain cap's ordering problem is
the same per-key sequence assignment ``training.pack_interleave_sources``
solves skew-safely (see the docstring there; the cap here keeps the window
form because the output IS per-domain head-of-sequence, which any form
must materialize).

Cross-engine discipline: the canonical chain uses only constructs with
identical semantics in Java regex (Spark) and RE2 (DuckDB) — anchored
replaces, character classes, a literal ``replace`` — and the oracle SQL is
composed at import time from the SAME pattern constants the Spark side
uses (the ``cleaning._NORM_SQL`` rule), so operator and oracle cannot
drift. No lookarounds (RE2 has none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eviction_lab_etl_spark import fixtures
from eviction_lab_etl_spark.functions.determinism import big
from eviction_lab_etl_spark.registry import query

# The fold axes, in application order (each line = one chain step):
#   1. case-fold the whole URL (hosts are case-insensitive; fixture paths
#      are lowercase by construction — a production chain would lower only
#      the authority component),
#   2. strip the scheme, 3. strip a leading `www.`,
#   4. strip the fragment,
#   5. strip tracking params: a RUN of one or more `utm_<name>=<value>&`
#      immediately after a `?` or `&` separator, keeping the separator
#      (replacement `$1` in Spark/Java, `\1` in DuckDB/RE2 — the PATTERN is
#      the shared constant; the backreference spelling is the one per-engine
#      dialect difference). Anchoring to the separator (r13 ADVICE) means a
#      param whose NAME merely contains `utm_` (`?xutm_a=1`) or whose VALUE
#      contains a literal `utm_x=y&` sequence is no longer corrupted; the
#      `(...)+` run form is required because a single-pass global replace
#      does not rescan replaced text, so consecutive `utm_a=1&utm_b=2&`
#      params would otherwise survive. Names are `[a-z0-9_]+` and values
#      `[^&#]*` (r12 ADVICE: real-world params like `utm_id=ABC-123`,
#      percent-encoded or underscore-bearing values, must not survive; the
#      URL is lowercased at step 1, so `[a-z0-9_]` covers names),
#   6. then a trailing `[?&]utm_...` (handles the final position),
#   7. collapse the path-final slash left dangling before a kept query
#      (`/?page=2` → `?page=2` — literal replace, not regex),
#   8. drop a bare trailing `/` or a fully-emptied `?`.
_SCHEME_RE = "^https?://"
_WWW_RE = "^www\\."
_FRAG_RE = "#.*$"
_UTM_MID_RE = "([?&])(utm_[a-z0-9_]+=[^&#]*&)+"
_UTM_END_RE = "[?&]utm_[a-z0-9_]+=[^&#]*$"
_TAIL_RE = "[/?]$"
_HOST_RE = "^[^/?#]+"

# DuckDB-dialect template composed from the same constants ({col} = input).
CANON_URL_SQL = (
    "regexp_replace(replace(regexp_replace(regexp_replace(regexp_replace("
    f"regexp_replace(regexp_replace(lower({{col}}), '{_SCHEME_RE}', ''),"
    f" '{_WWW_RE}', ''), '{_FRAG_RE}', ''), '{_UTM_MID_RE}', '\\1', 'g'),"
    f" '{_UTM_END_RE}', ''), '/?', '?'), '{_TAIL_RE}', '')"
)


def canonical_url(col: F.Column) -> F.Column:
    """The canonical chain as a pure column expression — JVM regex inside
    whole-stage codegen, no Python, no shuffle; order per the module map."""
    x = F.lower(col)
    x = F.regexp_replace(x, _SCHEME_RE, "")
    x = F.regexp_replace(x, _WWW_RE, "")
    x = F.regexp_replace(x, _FRAG_RE, "")
    x = F.regexp_replace(x, _UTM_MID_RE, "$1")
    x = F.regexp_replace(x, _UTM_END_RE, "")
    x = F.replace(x, F.lit("/?"), F.lit("?"))
    return F.regexp_replace(x, _TAIL_RE, "")


def _canon_frame(spark, sf_dir) -> DataFrame:
    urls = fixtures.documents_with_urls(spark, sf_dir)
    canon = canonical_url(F.col("url"))
    return urls.select(
        "doc_id",
        "url",
        canon.alias("canon_url"),
        F.regexp_extract(canon, _HOST_RE, 0).alias("host"),
    )


_CANON_CTE = f"""
    urls AS ({fixtures.DOCUMENTS_WITH_URLS_SQL}),
    canon AS (
        SELECT doc_id, url,
               {CANON_URL_SQL.format(col="url")} AS canon_url,
               regexp_extract({CANON_URL_SQL.format(col="url")},
                              '{_HOST_RE}') AS host
        FROM urls
    )
"""


@query(
    "web_url_canonicalize",
    oracle=f"""
    WITH {_CANON_CTE}
    SELECT doc_id, url, canon_url, host FROM canon
    """,
)
def web_url_canonicalize(spark, sf_dir):
    """Per-document canonical URL + host over the planted-noise URL corpus.
    Every noise axis fires on a known doc_id residue class (fixture header),
    and meaningful params survive — the driver hash pins the full chain,
    including what it must NOT strip. Map-only: at scale this is a scan-
    projection column, not a pass."""
    return _canon_frame(spark, sf_dir)


@query(
    "dedup_url_keep_first",
    oracle=f"""
    WITH {_CANON_CTE}
    SELECT canon_url,
           min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM canon GROUP BY canon_url
    """,
)
def dedup_url_keep_first(spark, sf_dir):
    """URL-level keep-first dedup on the canonical form — the cheap stage-1
    pass that removes re-crawls of the same page before any text is read.
    ONE canonical-key shuffle; min/count collapse map-side, so the planted
    re-crawl noise (scheme/www/case/slash/utm variants of one page) never
    reaches the exchange at full multiplicity."""
    return (
        _canon_frame(spark, sf_dir)
        .groupBy("canon_url")
        .agg(
            F.min("doc_id").alias("keep_id"),
            big(F.count(F.lit(1))).alias("n_copies"),
        )
    )


_DOMAIN_CAP = 15


@query(
    "web_domain_cap",
    oracle=f"""
    WITH {_CANON_CTE}
    SELECT doc_id, host,
           CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id)
                AS BIGINT) AS rk
    FROM canon
    QUALIFY rk <= {_DOMAIN_CAP}
    """,
)
def web_domain_cap(spark, sf_dir):
    """Per-domain volume cap: keep the first {cap} documents of each host
    (deterministic doc_id order — crawl order in production). A handful of
    domains dominating the corpus is the failure mode this guards against
    (RefinedWeb caps exactly this way). The window partitions on host — at
    100 TB the hot domains are the POINT of the cap, and the row_number +
    rank-filter form is skew-safe NATIVELY: Catalyst rewrites it with a
    partial WindowGroupLimit ahead of the exchange, so every map task
    forwards at most cap rows per host and a 10^9-page domain never
    funnels through one reducer (plan-pinned in tests/test_plans.py;
    measured against the hand-built two-phase offset alternative in
    tools/domain_cap_ab.py — the window form stays FLAT 0.5–2.0 s from 2M
    to 32M rows under 90% single-host skew while the two-phase pays its
    extra exchanges; SCALE.md round-12 A/B table)."""
    w = Window.partitionBy("host").orderBy("doc_id")
    return (
        _canon_frame(spark, sf_dir)
        .select("doc_id", "host", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= _DOMAIN_CAP)
    )
