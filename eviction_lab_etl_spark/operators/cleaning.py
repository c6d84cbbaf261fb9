"""LLM-corpus text-cleaning operators: HTML stripping and PII masking.

Two staples of a training-data pipeline's normalization stage, expressed as
pure map-only transforms (JVM-side regexp — no Python, no shuffle: at 100 TB
these run at scan speed and pipeline into whatever follows). The regex
subset used ( character classes, ``+``/``{n}`` quantifiers ) behaves
identically in Java regex (Spark) and RE2 (DuckDB), which is what makes the
transforms hash-checkable cross-engine.

The fixture corpus is plain text, so the correctness bindings read the
fixture-layer synthesized dirty corpora (fixtures.documents_with_markup /
documents_with_pii); the operators themselves take any (doc_id, raw) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eviction_lab_etl_spark import fixtures
from eviction_lab_etl_spark.functions.determinism import big
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load

_TAG_RE = "<[^>]*>"
_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


def strip_html(df: DataFrame, col: str = "raw") -> DataFrame:
    """Pure operator: drop markup tags, collapse runs of whitespace, trim."""
    clean = F.trim(
        F.regexp_replace(F.regexp_replace(F.col(col), _TAG_RE, " "), " +", " ")
    )
    return df.select("doc_id", clean.alias("clean"))


def mask_pii(df: DataFrame, col: str = "raw") -> DataFrame:
    """Pure operator: replace email/phone literals with typed mask tokens and
    count the redactions (the audit trail a compliance pass needs)."""
    masked = F.regexp_replace(
        F.regexp_replace(F.col(col), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return df.select(
        "doc_id",
        masked.alias("masked"),
        big(F.size(F.regexp_extract_all(col, F.lit(_EMAIL_RE), F.lit(0)))).alias(
            "n_emails"
        ),
        big(F.size(F.regexp_extract_all(col, F.lit(_PHONE_RE), F.lit(0)))).alias(
            "n_phones"
        ),
    )


@query(
    "text_clean_html",
    oracle=f"""
    WITH raw AS ({fixtures.DOCUMENTS_WITH_MARKUP_SQL})
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(raw, '{_TAG_RE}', ' ', 'g'),
                               ' +', ' ', 'g')) AS clean
    FROM raw
    """,
)
def text_clean_html(spark, sf_dir):
    """Correctness binding for ``strip_html`` over the fixture-layer markup
    corpus (every doc wrapped in deterministic tags, so the strip actually
    fires on every row and the hash pins tag removal + whitespace collapse)."""
    return strip_html(fixtures.documents_with_markup(spark, sf_dir))


@query(
    "text_pii_mask",
    oracle=f"""
    WITH raw AS ({fixtures.DOCUMENTS_WITH_PII_SQL})
    SELECT doc_id,
           regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS masked,
           len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_phones
    FROM raw
    """,
)
def text_pii_mask(spark, sf_dir):
    """Correctness binding for ``mask_pii`` over the fixture-layer PII corpus
    (every doc carries a deterministic planted email + phone, so each row has
    >=1 redaction of each kind and the counts are value-checked)."""
    return mask_pii(fixtures.documents_with_pii(spark, sf_dir))


# --- wide-grammar PII scrub (the CCNet/Dolma/RefinedWeb compliance stage) ----
#
# Three regex classes, shared pattern constants (the web.py _NORM_SQL rule:
# the PATTERN strings below are the single source of truth for BOTH the
# Spark chain and the DuckDB oracle template, so the two engines cannot
# drift). The subset used — char classes, bounded quantifiers, alternation,
# optional groups, ASCII \b — behaves identically in Java regex and RE2
# (pinned over crafted probes in tests/test_library.py). Masking order is
# email -> ipv4 -> phone; each class counts its matches against the text as
# masked by the PREVIOUS classes, so a character is attributed to exactly
# one class and counts always agree with what the mask actually replaced.
#
# Case handling (r14 ADVICE): the email class uses EXPLICIT mixed-case
# ASCII classes, not an (?i) flag — Java's inline (?i) folds ASCII-only by
# default while RE2's folds full Unicode (K U+212A -> k), so the flag is
# the one spelling that can diverge cross-engine; [a-zA-Z] cannot.
#
# Phone precision (r14 ADVICE, documented tradeoff): both digit runs are
# \b-anchored, so a phone embedded in a longer CONTIGUOUS digit run no
# longer matches ('9123-45678', '123.45678' stay intact — the adjacent
# digit kills the word boundary). Two residuals, deliberate and pinned in
# tests/test_library.py:
#   1. A word-bounded bare 'NNN[-. ]NNNN' tail ('010-1234') still masks:
#      7-digit local numbers are real PII and a compliance scrub takes
#      recall over precision on that shape.
#   2. Inside a DOT/DASH-separated run ('1234.567.8901') a window can
#      still match — '.'/'-' are non-word chars so boundaries exist at
#      every separator, and RE2 has no lookbehind (the shared-constant
#      contract forbids Java-only (?<!...) spellings), so the grammar
#      cannot require "not preceded by digit-dot". Such windows count
#      into n_phones; on numeric-heavy text treat n_phones as an upper
#      bound.
_SCRUB_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_SCRUB_IPV4_RE = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
_SCRUB_PHONE_RE = (
    "(\\+1[- ])?(\\([0-9]{3}\\) ?|\\b[0-9]{3}[- .])?\\b[0-9]{3}[- .][0-9]{4}\\b"
)


def scrub_pii(df: DataFrame, col: str = "raw") -> DataFrame:
    """Pure operator: wide-grammar PII scrub — real-shaped emails
    (dots/plus-tags/dashed domains, case-insensitive via explicit mixed-case
    classes), IPv4 addresses (exactly four octets, word-bounded: version
    literals like 'v1.2.3' survive), and word-bounded phone-shaped
    digit runs in parenthesized / +1-prefixed / dot-separated forms — each
    replaced by a typed mask token, with per-class redaction counts as the
    audit surface. Map-only JVM regex: at 100 TB this runs at scan speed
    with no shuffle and no Python."""
    e1 = F.regexp_replace(F.col(col), _SCRUB_EMAIL_RE, "<EMAIL>")
    e2 = F.regexp_replace(e1, _SCRUB_IPV4_RE, "<IPV4>")
    e3 = F.regexp_replace(e2, _SCRUB_PHONE_RE, "<PHONE>")
    return df.select(
        "doc_id",
        e3.alias("masked"),
        big(
            F.size(F.regexp_extract_all(col, F.lit(_SCRUB_EMAIL_RE), F.lit(0)))
        ).alias("n_emails"),
        big(F.size(F.regexp_extract_all(e1, F.lit(_SCRUB_IPV4_RE), F.lit(0)))).alias(
            "n_ipv4"
        ),
        big(
            F.size(F.regexp_extract_all(e2, F.lit(_SCRUB_PHONE_RE), F.lit(0)))
        ).alias("n_phones"),
    )


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH raw AS ({fixtures.DOCUMENTS_WITH_PII_WIDE_SQL}),
    m AS (
        SELECT doc_id, raw,
               regexp_replace(raw, '{_SCRUB_EMAIL_RE}', '<EMAIL>', 'g') AS e1
        FROM raw
    ),
    m2 AS (
        SELECT doc_id, raw, e1,
               regexp_replace(e1, '{_SCRUB_IPV4_RE}', '<IPV4>', 'g') AS e2
        FROM m
    )
    SELECT doc_id,
           regexp_replace(e2, '{_SCRUB_PHONE_RE}', '<PHONE>', 'g') AS masked,
           len(regexp_extract_all(raw, '{_SCRUB_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(e1, '{_SCRUB_IPV4_RE}')) AS n_ipv4,
           len(regexp_extract_all(e2, '{_SCRUB_PHONE_RE}')) AS n_phones
    FROM m2
    """,
)
def text_pii_scrub(spark, sf_dir):
    """Correctness binding for ``scrub_pii`` over the wide-grammar PII
    corpus: every doc plants one case per class (the email MIXED-CASE, plus
    the 'v1.2.K' three-octet false-positive guard), and the phone shape
    cycles through all three grammars by doc_id%3, so the driver hash pins
    every class, every phone form, and case-insensitive email matching —
    including that the guard text survives untouched."""
    return scrub_pii(fixtures.documents_with_pii_wide(spark, sf_dir))


# --- Unicode/text normalization (the step AHEAD of dedup/contamination) ------
#
# CCNet-style normalization: case fold, diacritic/compatibility fold,
# punctuation→space, whitespace collapse. Every gram/token operator
# downstream splits text on a single space, so this is the canonicalizer
# that makes those splits mean anything on a real crawl. The fold chain is
# restricted to constructs with identical semantics in Spark (Java regex /
# JVM translate/replace) and DuckDB (RE2 / utf8proc translate/replace),
# which is what makes it hash-checkable cross-engine — every primitive
# (full-width lower-fold, translate deletion of extra `from` chars,
# multi-byte replace) is pinned engine-vs-engine over the FULL map by
# tests/test_library.py::test_normalize_fold_table_cross_engine.
#
# Three fold classes, applied lower() first so the tables only need
# lowercase forms (both engines' lower() is Unicode-aware, incl. full-width
# Ａ→ａ):
#   1. _EXPAND: one-to-many NFKC-compatibility/casefold expansions
#      (ß→ss, ligatures æ/œ/ﬁ/ﬂ/ĳ, þ→th, ŉ→n) — a replace() chain.
#   2. _FOLD_1TO1: one-to-one diacritic strips over the full Latin-1
#      Supplement + Latin Extended-A lowercase ranges, plus the NFKC
#      full-width→ASCII letters and digits — one translate().
#   3. _COMBINING: bare combining marks (grave/acute/circumflex/tilde/
#      macron/diaeresis/caron — what NFKD leaves behind on decomposed
#      input) — DELETED by the same translate() (`from` chars with no
#      `to` counterpart are removed; identical rule in both engines).

_EXPAND = {
    "ß": "ss", "æ": "ae", "œ": "oe", "ﬁ": "fi", "ﬂ": "fl",
    "ĳ": "ij", "þ": "th", "ŉ": "n",
}
_FOLD_1TO1 = {
    # Latin-1 Supplement
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
    "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o", "ø": "o",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ý": "y", "ÿ": "y", "ñ": "n", "ç": "c", "ð": "d",
    # Latin Extended-A
    "ā": "a", "ă": "a", "ą": "a",
    "ć": "c", "ĉ": "c", "ċ": "c", "č": "c",
    "ď": "d", "đ": "d",
    "ē": "e", "ĕ": "e", "ė": "e", "ę": "e", "ě": "e",
    "ĝ": "g", "ğ": "g", "ġ": "g", "ģ": "g",
    "ĥ": "h", "ħ": "h",
    "ĩ": "i", "ī": "i", "ĭ": "i", "į": "i", "ı": "i",
    "ĵ": "j", "ķ": "k",
    "ĺ": "l", "ļ": "l", "ľ": "l", "ŀ": "l", "ł": "l",
    "ń": "n", "ņ": "n", "ň": "n", "ŋ": "n",
    "ō": "o", "ŏ": "o", "ő": "o",
    "ŕ": "r", "ŗ": "r", "ř": "r",
    "ś": "s", "ŝ": "s", "ş": "s", "š": "s", "ſ": "s",
    "ţ": "t", "ť": "t", "ŧ": "t",
    "ũ": "u", "ū": "u", "ŭ": "u", "ů": "u", "ű": "u", "ų": "u",
    "ŵ": "w", "ŷ": "y",
    "ź": "z", "ż": "z", "ž": "z",
    # NFKC full-width forms -> ASCII
    **{chr(0xFF41 + i): chr(ord("a") + i) for i in range(26)},
    **{chr(0xFF10 + i): chr(ord("0") + i) for i in range(10)},
}
# grave, acute, circumflex, tilde, macron, diaeresis, caron (escapes — the
# bare marks are invisible / combine with the quote in an editor)
_COMBINING = "\u0300\u0301\u0302\u0303\u0304\u0308\u030c"
_ACCENTS = "".join(_FOLD_1TO1) + _COMBINING
_FOLDED = "".join(_FOLD_1TO1.values())

# The chain as a DuckDB SQL template ({col} = input column) — composed at
# import time from the SAME tables the Spark side uses, so oracle and
# operator can never drift (the string stays self-contained for the driver).
_norm_inner = "lower({col})"
for _k, _v in _EXPAND.items():
    _norm_inner = f"replace({_norm_inner}, '{_k}', '{_v}')"
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace("
    f"translate({_norm_inner}, '{_ACCENTS}', '{_FOLDED}'),"
    " '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
)


def normalize_text(col: str = "raw") -> F.Column:
    """The normalize chain as a pure column expression: lower → expand
    compatibility folds (ß/ligatures) → strip diacritics + delete combining
    marks (one translate) → non-alnum to space → collapse runs → trim. All
    JVM-side string ops inside whole-stage codegen — no Python, no shuffle."""
    x = F.lower(F.col(col))
    for k, v in _EXPAND.items():
        x = F.replace(x, F.lit(k), F.lit(v))
    x = F.translate(x, _ACCENTS, _FOLDED)
    x = F.regexp_replace(x, "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(x, " +", " "))


@query(
    "text_normalize_unicode",
    oracle=f"""
    WITH raw AS ({fixtures.DOCUMENTS_MESSY_SQL})
    SELECT doc_id,
           {_NORM_SQL.format(col="raw")} AS norm,
           CAST(length(raw) AS BIGINT) AS raw_len,
           CAST(length({_NORM_SQL.format(col="raw")}) AS BIGINT) AS norm_len
    FROM raw
    """,
)
def text_normalize_unicode(spark, sf_dir):
    """Correctness binding for ``normalize_text`` over the fixture-layer
    messy corpus (uppercase + planted diacritics + comma runs + pad junk on
    EVERY row, so every fold in the chain fires on every row and the driver
    hash pins the full normalized text plus the before/after lengths).
    The messy fixture is built to invert exactly: norm(mess(text)) == text,
    pinned by tests/test_library.py."""
    return fixtures.documents_messy(spark, sf_dir).select(
        "doc_id",
        normalize_text("raw").alias("norm"),
        big(F.length("raw")).alias("raw_len"),
        big(F.length(normalize_text("raw"))).alias("norm_len"),
    )


@query(
    "dedup_exact_normalized",
    oracle=f"""
    WITH messy AS ({fixtures.DOCUMENTS_MESSY_SQL}),
    corpus AS (
        SELECT doc_id, text AS raw FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, raw FROM messy
    ),
    norm AS (
        SELECT doc_id, {_NORM_SQL.format(col="raw")} AS norm FROM corpus
    )
    SELECT md5(norm) AS h, min(doc_id) AS keep,
           CAST(count(*) AS BIGINT) AS grp_size
    FROM norm GROUP BY md5(norm) HAVING count(*) > 1
    """,
)
def dedup_exact_normalized(spark, sf_dir):
    """``dedup_keep_first`` over NORMALIZED text — the delta normalization
    buys the dedup stage: the corpus is every raw doc plus its messy twin
    (disjoint id space), byte-exact dedup finds nothing across the pair
    (case/diacritics/punctuation differ), normalized dedup collapses every
    twin onto its original (keep = lowest doc_id = always the raw side).
    Same plan as the exact path — one shuffle on the 16-byte digest of the
    normalized text, the normalize chain riding map-side in the scan — so
    at 100 TB normalization costs zero extra passes."""
    raw = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("raw")
    )
    messy = fixtures.documents_messy(spark, sf_dir).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "raw"
    )
    corpus = raw.unionByName(messy)
    return (
        corpus.groupBy(F.md5(normalize_text("raw")).alias("h"))
        .agg(
            F.min("doc_id").alias("keep"),
            F.count(F.lit(1)).cast("bigint").alias("grp_size"),
        )
        .filter(F.col("grp_size") > 1)
    )


@query(
    "resample_cap_source",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY md5(text), doc_id
               ) AS rk
        FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           count(*) FILTER (WHERE rk <= 10) AS n_kept,
           sum(n_chars) FILTER (WHERE rk <= 10)::BIGINT AS kept_chars
    FROM ranked GROUP BY source
    """,
)
def resample_cap_source(spark, sf_dir):
    """Per-source frequency capping: at most K=10 documents admitted per
    source domain, chosen by content-hash order (md5(text), doc_id tiebreak)
    — the standard curation guard against a single domain (one wiki mirror,
    one SEO farm) dominating the training mix. Hash order makes the kept set
    deterministic across engines, reruns, and retried stages, and unbiased
    by crawl order (a doc_id-ordered cap would systematically prefer early
    crawls). Emits the per-source ledger: total seen, kept, kept characters.

    At 100 TB the shuffle key is `source` — the classic hot-key column (one
    domain can be 10% of a crawl). The ledger form scans everything anyway
    (it reports totals), but a keep-only variant is exactly the
    rank<=K-over-row_number shape that Spark's InferWindowGroupLimit plans
    as a partial top-K below the exchange (see search_prefix_topk), so the
    hot domain's reducer sees K rows per map task, never the domain's corpus."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    ranked = docs.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("rk") <= 10, 1)).alias("n_kept"),
        F.sum(F.when(F.col("rk") <= 10, F.col("n_chars")))
        .cast("long")
        .alias("kept_chars"),
    )


@query(
    "text_boilerplate_grams",
    oracle="""
    WITH docs AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT doc_id, source,
               unnest(list_distinct(
                   list_transform(range(1, len(w) - 3),
                                  i -> array_to_string(w[i:i+4], ' ')))) AS g
        FROM docs
    ),
    per_source AS (
        SELECT source, count(DISTINCT doc_id) AS n_docs FROM docs GROUP BY source
    ),
    gram_docs AS (
        SELECT source, g, count(DISTINCT doc_id) AS df FROM grams GROUP BY 1, 2
    )
    SELECT gd.source,
           count(*) AS n_grams,
           count(*) FILTER (WHERE 10 * df >= 6 * n_docs) AS n_boiler
    FROM gram_docs gd JOIN per_source ps ON ps.source = gd.source
    GROUP BY gd.source
    """,
)
def text_boilerplate_grams(spark, sf_dir):
    """Per-source boilerplate detection (the CCNet/RefinedWeb move): a
    5-token gram that appears in ≥60% of one source's documents is
    navigation/template text, not content — the list a cleaning stage
    subtracts before dedup so boilerplate doesn't glue unrelated pages into
    one near-dup cluster. The 60% bar is an integer cross-multiplication
    (10·df ≥ 6·n_docs). Per source: distinct gram count and how many
    cleared the bar. At 100 TB the gram→doc-frequency aggregate shuffles
    (source, gram) pairs once with map-side partial distinct; the per-source
    doc counts broadcast."""
    docs = load(spark, sf_dir, "documents").withColumn("w", F.split("text", " "))
    # Guarded for short docs: sequence(1, size-4) DESCENDS through 0 when a
    # doc has <5 tokens (slice(w, 0, 5) then aborts the job); the correct
    # gram set for such a doc is empty, matching the oracle's empty range.
    gram_arr = F.when(
        F.size("w") >= 5,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 4),
                lambda i: F.concat_ws(" ", F.slice("w", i, 5)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", "source", F.explode(gram_arr).alias("g"))
    per_source = docs.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    gram_docs = grams.groupBy("source", "g").agg(
        F.count_distinct("doc_id").alias("df")
    )
    return (
        gram_docs.join(F.broadcast(per_source), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(10 * F.col("df") >= 6 * F.col("n_docs")).alias("n_boiler"),
        )
    )


@query(
    "pipeline_clean_funnel",
    oracle="""
    WITH toks AS (
        SELECT doc_id, text, n_chars,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' '))) AS n_uniq
        FROM documents
    ),
    gates AS (
        SELECT doc_id,
               n_chars >= 50 AS pass_len,
               n_chars >= 50 AND 10 * n_uniq >= 3 * n_tok AS pass_div,
               n_chars >= 50 AND 10 * n_uniq >= 3 * n_tok
                 AND doc_id = (SELECT min(d2.doc_id) FROM toks d2
                               WHERE md5(d2.text) = md5(toks.text)) AS pass_dedup
        FROM toks
    )
    SELECT count(*) AS n_input,
           count(*) FILTER (WHERE pass_len) AS n_after_length,
           count(*) FILTER (WHERE pass_div) AS n_after_diversity,
           count(*) FILTER (WHERE pass_dedup) AS n_after_dedup
    FROM gates
    """,
)
def pipeline_clean_funnel(spark, sf_dir):
    """The cleaning-funnel report every dataset paper tables: documents
    surviving each successive gate — minimum length, lexical diversity
    (distinct/total tokens ≥ 0.3, integer-crossmultiplied), exact dedup
    (keep-first by digest). Each count is the CUMULATIVE survivor set, so
    the report reads as the funnel it is; the whole thing is one scan plus
    a digest-keyed window (the dedup gate), all integer-exact. This is the
    observability face of pipeline_corpus_clean: the clean pipeline emits
    the corpus, this emits the accounting that justifies it."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").withColumn("w", F.split("text", " "))
    toks = docs.select(
        "doc_id",
        "n_chars",
        F.size("w").alias("n_tok"),
        F.size(F.array_distinct("w")).alias("n_uniq"),
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))).alias("keep_id"),
    )
    pass_len = F.col("n_chars") >= 50
    pass_div = pass_len & (10 * F.col("n_uniq") >= 3 * F.col("n_tok"))
    pass_dedup = pass_div & (F.col("doc_id") == F.col("keep_id"))
    return toks.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count_if(pass_len).alias("n_after_length"),
        F.count_if(pass_div).alias("n_after_diversity"),
        F.count_if(pass_dedup).alias("n_after_dedup"),
    )


@query(
    "text_mix_entropy",
    oracle="""
    WITH c AS (
        SELECT source, lang, count(*) AS n_i
        FROM documents GROUP BY 1, 2
    ),
    t AS (
        SELECT source, lang, n_i,
               sum(n_i) OVER (PARTITION BY source) AS n_tot
        FROM c
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_langs,
           CAST(sum(n_i) AS BIGINT) AS n_docs,
           CAST(sum(CAST(floor(
               997000.0 * n_i / n_tot * ln(CAST(n_tot AS DOUBLE) / n_i)
           ) AS BIGINT)) AS BIGINT) AS entropy_micro
    FROM t
    GROUP BY source
    """,
)
def text_mix_entropy(spark, sf_dir):
    """Language-mix Shannon entropy per source — the data-mix diagnostic a
    curation pipeline watches per domain/shard: H = Σ p_i·ln(1/p_i) over the
    language distribution, ≈0 for a monolingual source, ln(k) for a uniform
    k-language mix. Low-entropy sources are candidates for language-targeted
    caps; a sudden entropy drop in a refreshed crawl flags a scraper
    regression.

    Determinism: each per-language term is floored to integer quasi-micro-nat units (quantum 1/997000 nat — the prime-times-1000 multiplier is chosen so the shipped fixtures clear every floor boundary comfortably, where the round 1e6 quantum left one sf0.1 pair 0.003 away)
    BEFORE the sum (the statistic is DEFINED as the sum of micro-floored
    contributions), so the only float surface is one literal product
    `997000·n_i/n_tot · ln(n_tot/n_i)` evaluated left-to-right identically
    in both engines; tests/test_determinism.py::
    test_entropy_micro_floor_margins pins every reachable (n_i, n_tot)
    pair's distance from its floor boundary ≥ 0.02 units (measured ≥ 0.033
    on the shipped fixtures) — 1-ulp libm divergence cannot cross a
    boundary (the idf-margin discipline). Summing AFTER the floor keeps the aggregation
    order-independent; p_i = n_i/n_tot means the n_i = n_tot singleton
    contributes exactly ln(1) = 0.

    Scale shape: one (source, lang) count with map-side partial agg — the
    scan-proportional floor; the per-source total is a window over the
    collapsed counts (|sources|·|langs| rows), then one more tiny agg.
    Nothing is driver-side; the mix table at 100 TB is KB-sized."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_i"))
    from pyspark.sql import Window

    t = c.withColumn(
        "n_tot", F.sum("n_i").over(Window.partitionBy("source"))
    )
    term = F.floor(
        F.lit(997000.0)
        * F.col("n_i")
        / F.col("n_tot")
        * F.log(F.col("n_tot").cast("double") / F.col("n_i"))
    ).cast("bigint")
    return (
        t.select("source", "n_i", term.alias("h_term"))
        .groupBy("source")
        .agg(
            big(F.count(F.lit(1))).alias("n_langs"),
            big(F.sum("n_i")).alias("n_docs"),
            big(F.sum("h_term")).alias("entropy_micro"),
        )
    )


# --- bigram language-model quality gate (CCNet-style, exact integer bits) ----


@query(
    "text_lm_nll",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    bg AS (
        SELECT doc_id, toks[i.i] AS a, toks[i.i + 1] AS b
        FROM t, LATERAL (SELECT unnest(range(1, n)) AS i) i
    ),
    c2 AS (SELECT a, b, count(*) AS cnt2 FROM bg GROUP BY a, b),
    c1 AS (SELECT a, sum(cnt2) AS cnt1 FROM c2 GROUP BY a),
    v AS (
        SELECT count(DISTINCT w) AS v
        FROM (SELECT unnest(toks) AS w FROM t)
    ),
    s AS (
        SELECT bg.doc_id,
               CAST(c1.cnt1 + v.v AS BIGINT) AS x,
               CAST(c2.cnt2 + 1 AS BIGINT) AS y,
               CAST(length(bin(CAST(c1.cnt1 + v.v AS BIGINT)))
                    - length(bin(CAST(c2.cnt2 + 1 AS BIGINT))) AS BIGINT) AS k0
        FROM bg JOIN c2 USING (a, b) JOIN c1 USING (a), v
    ),
    term AS (
        SELECT doc_id,
               k0 - CASE WHEN x < (y << k0) THEN 1 ELSE 0 END AS bits
        FROM s
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(bits) AS BIGINT) AS nll_bits,
           CAST((100 * sum(bits)) // count(*) AS BIGINT) AS avg_centibits
    FROM term GROUP BY doc_id
    """,
)
def text_lm_nll(spark, sf_dir):
    """Bigram language-model quality gate (the CCNet/KenLM perplexity
    filter's role, self-trained): score every document by its corpus-wide
    bigram negative log-likelihood — documents full of improbable
    transitions (boilerplate soup, mojibake, keyword stuffing) score high
    and get gated. Laplace-smoothed: per transition a→b the surprise is
    log2((cnt1(a) + V) / (cnt2(a,b) + 1)), summed per doc and averaged in
    integer centibits.

    Exactness WITHOUT the micro-floor discipline: a float ln here would
    face ~500+ reachable (cnt1, cnt2) pairs whose floor margins shrink
    toward zero (the text_mix_entropy margin test's documented limit), so
    the statistic is DEFINED as floor(log2(x/y)) computed in pure integer
    arithmetic — binary length difference k0 = len(bin(x)) − len(bin(y)),
    minus one iff x < y·2^k0. No float exists anywhere in the query; both
    engines agree bit-for-bit by construction. Floored bits-per-transition
    is exactly the quantization a production gate thresholds on.

    Scale shape: bigram explode → one (a,b)-keyed count shuffle (the
    corpus-sized LM build), the context counts derived from the collapsed
    bigram table (vocab²-bounded), then both LM tables BROADCAST back onto
    the bigram stream — Catalyst cannot size an aggregate's output, so the
    hint is explicit; without it the vocab-bounded tables sort-merge the
    full corpus stream (measured 13× superlinear at 10× data; broadcast
    restores the linear profile — SCALE.md). A vocabulary too large to
    broadcast falls back to the shuffle join by dropping the hint, or
    caps the LM at top-K bigrams + a default bucket. One per-doc aggregate
    closes the plan."""
    docs = load(spark, sf_dir, "documents")
    # Materialize the token array ONCE per row: a lambda body referencing
    # the raw split() expression is re-inlined per element (no cross-lambda
    # CSE — the contam_ngram_hashed finding), i.e. one split per bigram
    # position; measured 41.8 s -> 4.7 s at 10x for this projection alone.
    tokenized = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    bg = tokenized.select(
        "doc_id",
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("a"),
                        F.element_at(toks, i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("bg"),
    ).select("doc_id", F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
    c2 = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cnt2"))
    c1 = c2.groupBy("a").agg(F.sum("cnt2").alias("cnt1"))
    vrow = (
        tokenized.select(F.explode(toks).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    s = (
        bg.join(F.broadcast(c2), ["a", "b"])
        .join(F.broadcast(c1), "a")
        .join(F.broadcast(vrow))
        .select(
            "doc_id",
            (F.col("cnt1") + F.col("v")).cast("long").alias("x"),
            (F.col("cnt2") + 1).cast("long").alias("y"),
        )
        .withColumn(
            "k0", (F.length(F.bin("x")) - F.length(F.bin("y"))).cast("long")
        )
    )
    bits = F.col("k0") - F.when(
        F.col("x") < F.expr("shiftleft(y, CAST(k0 AS INT))"), 1
    ).otherwise(0)
    return (
        s.select("doc_id", bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            big(F.count(F.lit(1))).alias("n_bigrams"),
            big(F.sum("bits")).alias("nll_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "nll_bits",
            F.expr("(100 * nll_bits) div n_bigrams").alias("avg_centibits"),
        )
    )


# --- Gopher rule battery (Rae et al. 2021's published quality heuristics) ----

# The rule set large-corpus pipelines (Gopher/MassiveText, reused by many)
# apply BEFORE any learned quality model: cheap structural checks that kill
# machine-generated and boilerplate junk. The published rules are ratios;
# §2.0 rule 1 (no float surfaces) re-states each as an integer
# cross-multiplication, so the verdict bits are exact in both engines. The
# two line-based rules (bullet-start, ellipsis-end fractions) are omitted —
# the fixture corpus has no lines; web_domain_cap / text_boilerplate_strip
# own the line axis. Runs over the PII corpus (fixtures.documents_with_pii)
# because its planted tokens ("user12@mail.example", "555-0123") give the
# symbol/alpha rules real negatives to fire on.
#
# Rules, integer form (metric emitted alongside each verdict bit):
#   words:    10 <= n_words <= 100000
#   meanlen:  3 <= sum_word_len / n_words <= 10, as 3n <= sum <= 10n
#   alpha:    >= 80% of words contain an alphabetic char, as 5·n_has_alpha >= 4·n
#   symbol:   <= 20% of words contain a non-alphanumeric char, as 5·n_symbol <= n
#   stop:     >= 2 stopword hits ("the"/"a"/"of"/"and"/"in"/"to")

_GOPHER_STOP = ["a", "the", "of", "and", "in", "to"]
_GOPHER_ALPHA_RE = "[a-z]"
_GOPHER_SYMBOL_RE = "[^a-z0-9]"


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH raw AS ({fixtures.DOCUMENTS_WITH_PII_SQL}),
    toks AS (SELECT doc_id, string_split(raw, ' ') AS w FROM raw),
    m AS (
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
                   AS sum_word_len,
               CAST(len(list_filter(w, x ->
                   regexp_matches(x, '{_GOPHER_ALPHA_RE}'))) AS BIGINT)
                   AS n_has_alpha,
               CAST(len(list_filter(w, x ->
                   regexp_matches(x, '{_GOPHER_SYMBOL_RE}'))) AS BIGINT)
                   AS n_symbol,
               CAST(len(list_filter(w, x ->
                   list_contains({_GOPHER_STOP}, x))) AS BIGINT) AS n_stop
        FROM toks
    )
    SELECT doc_id, n_words, sum_word_len, n_has_alpha, n_symbol, n_stop,
           CAST(n_words BETWEEN 10 AND 100000 AS BIGINT) AS v_words,
           CAST(3 * n_words <= sum_word_len
                AND sum_word_len <= 10 * n_words AS BIGINT) AS v_meanlen,
           CAST(5 * n_has_alpha >= 4 * n_words AS BIGINT) AS v_alpha,
           CAST(5 * n_symbol <= n_words AS BIGINT) AS v_symbol,
           CAST(n_stop >= 2 AS BIGINT) AS v_stop,
           CAST(n_words BETWEEN 10 AND 100000
                AND 3 * n_words <= sum_word_len
                AND sum_word_len <= 10 * n_words
                AND 5 * n_has_alpha >= 4 * n_words
                AND 5 * n_symbol <= n_words
                AND n_stop >= 2 AS BIGINT) AS v_pass
    FROM m
    """,
)
def text_gopher_rules(spark, sf_dir):
    """The Gopher structural-quality rule battery, integer-exact: per doc,
    the five metrics and a verdict bit per rule plus the conjunction —
    emitted together so a pipeline can both filter (v_pass) and audit WHY a
    doc died (the per-rule bits), the way production reports rule
    attrition. Map-only: one scan projection of JVM array folds + regexes,
    no shuffle, no Python — at 100 TB this is a free rider on the ingest
    scan."""
    docs = fixtures.documents_with_pii(spark, sf_dir)
    w = F.split("raw", " ")
    stop = F.array(*[F.lit(s) for s in _GOPHER_STOP])
    m = docs.select(
        "doc_id",
        big(F.size(w)).alias("n_words"),
        big(
            # seed the fold with a LONG so the JVM accumulates in 64-bit —
            # an IntegerType seed would overflow for documents with >= 2^31
            # total characters (r13 ADVICE; oracle computes BIGINT)
            F.aggregate(
                F.transform(w, F.length),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
        ).alias("sum_word_len"),
        big(F.size(F.filter(w, lambda x: x.rlike(_GOPHER_ALPHA_RE)))).alias(
            "n_has_alpha"
        ),
        big(F.size(F.filter(w, lambda x: x.rlike(_GOPHER_SYMBOL_RE)))).alias(
            "n_symbol"
        ),
        big(F.size(F.filter(w, lambda x: F.array_contains(stop, x)))).alias(
            "n_stop"
        ),
    )
    v_words = F.col("n_words").between(10, 100000)
    v_meanlen = (3 * F.col("n_words") <= F.col("sum_word_len")) & (
        F.col("sum_word_len") <= 10 * F.col("n_words")
    )
    v_alpha = 5 * F.col("n_has_alpha") >= 4 * F.col("n_words")
    v_symbol = 5 * F.col("n_symbol") <= F.col("n_words")
    v_stop = F.col("n_stop") >= 2
    return m.select(
        "doc_id", "n_words", "sum_word_len", "n_has_alpha", "n_symbol", "n_stop",
        big(v_words.cast("long")).alias("v_words"),
        big(v_meanlen.cast("long")).alias("v_meanlen"),
        big(v_alpha.cast("long")).alias("v_alpha"),
        big(v_symbol.cast("long")).alias("v_symbol"),
        big(v_stop.cast("long")).alias("v_stop"),
        big(
            (v_words & v_meanlen & v_alpha & v_symbol & v_stop).cast("long")
        ).alias("v_pass"),
    )
