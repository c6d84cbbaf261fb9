"""Sampling / dataset splits / mergeable sketches (training-data extension).

Four operations every large-scale training-data pipeline needs beyond SURVEY
§2's J group, each expressed so the 100 TB plan is the same plan as the local
one:

- **Content-hash split** (`split_content_hash`): train/valid/test assignment by
  a digest of the *content*, not the row id — duplicated documents land in the
  same fold (no train/test leakage through dups), the assignment is stable
  across reruns and engines, and no shuffle beyond the final tiny aggregate.
- **Stratified sampling** (`sample_stratified`): per-stratum ~20% sample by a
  stratum-salted content digest — a map-only pass, deterministic across
  engines and retried stages (no RNG seed bookkeeping); the 100 TB form is
  identical because no coordination is needed at all.
- **Approximate quantiles** (`agg_approx_quantile`): single-pass mergeable
  quantile sketch (`percentile_approx`) — the scale substitute for exact
  medians when the group is billions of rows.
- **Partitioned HLL sketch + merge** (`sketch_hll_partitioned`): the
  two-phase sketch pattern — build small per-slice HLL sketches, union them to
  coarser slices. At 100 TB this is how cardinality dashboards are maintained
  incrementally: sketches are tiny, associative, and re-mergeable, so per-day
  partial sketches roll up to any coarser grain without rescanning the facts.

The reference's analog is R7/R12 export QA statistics; the sampling/split ops
are the X extension (BASELINE.json) — no reference file citation possible
(mount empty, SURVEY §0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.determinism import big
from eviction_lab_etl_spark.functions.minhash import (
    md5_family as _mh_spark_family,
    md5_family_duck as _mh_duck_hash,
)
from eviction_lab_etl_spark.registry import query
from eviction_lab_etl_spark.sources.loader import load

LANGS = ["en", "es", "de", "fr", "zh"]


@query(
    "split_content_hash",
    oracle="""
    SELECT CASE WHEN substr(md5(text), 1, 1) < 'c' THEN 'train'
                WHEN substr(md5(text), 1, 1) < 'e' THEN 'valid'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           sum(n_chars)::bigint AS sum_chars
    FROM documents
    GROUP BY 1
    """,
)
def split_content_hash(spark, sf_dir):
    """Deterministic 75/12.5/12.5 train/valid/test split by content digest.

    The fold is the first hex nibble of md5(text): '0'..'b' → train (12/16),
    'c'..'d' → valid, 'e'..'f' → test. Hashing *content* (not doc_id) keeps
    exact duplicates in one fold — the split that prevents eval leakage.
    ASCII-lexical nibble comparison is engine-identical, so this is
    hash-checkable (§2.0): no RNG, no engine sampling quirks.
    """
    docs = load(spark, sf_dir, "documents")
    nibble = F.substring(F.md5("text"), 1, 1)
    split = (
        F.when(nibble < "c", "train").when(nibble < "e", "valid").otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT lang,
           count(*) AS n_sample,
           sum(n_chars)::bigint AS sum_chars
    FROM documents
    WHERE substr(md5(concat(lang, ':', text)), 1, 2) < '33'
    GROUP BY lang
    """,
)
def sample_stratified(spark, sf_dir):
    """Per-language ~20% stratified sample → per-stratum counts, by
    DETERMINISTIC content hashing rather than Bernoulli RNG: a row is sampled
    iff the first byte of md5(lang ':' text) is < 0x33 (51/256 = 19.9%).
    Salting the digest with the stratum makes strata independent (the same
    text in two languages draws two independent "coins"), and hashing content
    keeps exact duplicates on the same side of the cut — the same leakage
    argument as `split_content_hash`.

    Same plan shape as the `sampleBy` Bernoulli form (map-only filter, no
    shuffle until the final tiny count) but reproducible across engines,
    reruns, AND retried stages — at 100 TB a re-executed task re-samples
    identically with no seed bookkeeping. Hash-checkable (§2.0): ASCII-lexical
    comparison of hex digits is numeric comparison.
    """
    docs = load(spark, sf_dir, "documents")
    coin = F.substring(F.md5(F.concat_ws(":", "lang", "text")), 1, 2)
    return (
        docs.filter(coin < "33")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


@query(
    "agg_approx_quantile",
    oracle="""
    SELECT event_type, count(*) AS n,
           TRUE AS p50_in_bound, TRUE AS p95_in_bound
    FROM events GROUP BY event_type
    """,
)
def agg_approx_quantile(spark, sf_dir):
    """Per event_type p50/p95 of `value` via the mergeable quantile sketch
    (`percentile_approx`, accuracy 10 000). The 100 TB substitute for exact
    `median` (SURVEY §2 `window_percentile`): one pass, partial sketches merge
    associatively — no global sort, no whole-group materialization.

    ERROR CONTRACT, hash-checked (round-7 verdict item 1): the sketch VALUE
    is engine-specific, but its rank-error guarantee is checkable in-query —
    the returned quantile is an element of the group whose rank must sit
    within ε·n of the target rank (GK/Spark contract: ε = 1/accuracy). The
    emitted surface is (n, verdict, verdict): a second pass counts values
    strictly below / at-or-below each returned quantile and asserts, in
    exact integer arithmetic,  count_lt·10⁴ ≤ q_bp·n + 2n + 3·10⁴  and
    count_le·10⁴ ≥ q_bp·n − 2n − 3·10⁴  (2ε plus a 3-row absolute slack for
    boundary-duplicate values; measured rank offsets on the fixtures are
    within 5 rows of target at every scale). The oracle pins both verdicts
    as literal TRUE — an out-of-bound sketch turns the driver row red.
    The verification join broadcasts the per-group quantile frame (one row
    per event_type), so at 100 TB the check is a second scan, never a
    shuffle of the fact table."""
    events = load(spark, sf_dir, "events")
    q = events.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("_p50"),
        F.percentile_approx("value", 0.95, 10000).alias("_p95"),
    )
    flags = (
        events.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") < F.col("_p50")).cast("long")).alias("_lt50"),
            F.sum((F.col("value") <= F.col("_p50")).cast("long")).alias("_le50"),
            F.sum((F.col("value") < F.col("_p95")).cast("long")).alias("_lt95"),
            F.sum((F.col("value") <= F.col("_p95")).cast("long")).alias("_le95"),
        )
    )

    def in_bound(lt, le, q_bp):
        n = F.col("n")
        return (
            (F.col(lt) * 10000 <= q_bp * n + 2 * n + 30000)
            & (F.col(le) * 10000 >= q_bp * n - 2 * n - 30000)
        )

    return flags.select(
        "event_type",
        "n",
        in_bound("_lt50", "_le50", 5000).alias("p50_in_bound"),
        in_bound("_lt95", "_le95", 9500).alias("p95_in_bound"),
    )


@query(
    "sketch_hll_partitioned",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_hll_partitioned(spark, sf_dir):
    """Two-phase mergeable-sketch cardinality: per-(returnflag, linestatus)
    partial HLL sketches over l_partkey, then `hll_union_agg` up to
    per-returnflag estimates.

    This is the incremental-rollup pattern for 100 TB: the fact scan happens
    once at the finest slice; every coarser grain is a union of 1.5 KB
    sketches. Contrast `agg_approx_distinct` (one-shot HLL) — here the sketch
    itself is the stored intermediate, proving re-mergeability.

    ERROR CONTRACT, hash-checked (round-7 verdict item 1): the Datasketches
    estimate is engine-specific, so the emitted surface is the EXACT
    per-returnflag count plus the verdict ``|merged_estimate − exact|·20 ≤
    exact`` (5 %: lgConfigK = 12 gives rsd ≈ 1.04/√4096 ≈ 1.6 %, so 5 % is
    a ≥3σ envelope — and it bounds the MERGED estimate, i.e. re-mergeability
    with accuracy, not just "a union ran"). Measured error ≤ 1.3 % on every
    fixture scale (probe, round-8 log). The oracle pins the verdict TRUE;
    an off-envelope merge turns the driver row red."""
    li = load(spark, sf_dir, "lineitem")
    partial = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sketch")
    )
    merged = partial.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_approx")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts")
    )
    return merged.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_approx") - F.col("exact_parts")) * 20
            <= F.col("exact_parts")
        ).alias("within_5pct"),
    )


@query(
    "export_shard_manifest",
    oracle="""
    SELECT CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) % 16 AS shard,
           count(*) AS n_docs,
           sum(n_chars)::bigint AS sum_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY 1
    """,
)
def export_shard_manifest(spark, sf_dir):
    """Sharded-export manifest — the last step before a training run ingests
    the corpus: every document is assigned shard ``md5(text)[first byte] %
    16``. Content-addressed assignment means exact duplicates collocate (a
    loader that dedups per shard still dedups globally), the layout is
    byte-identical across reruns, retried stages, and engines (no RNG), and
    digest mixing makes shards uniform in expectation regardless of how
    doc_ids were assigned. At 100 TB the physical write is
    ``partitionBy(shard)`` — ONE exchange keyed by the same expression —
    and this manifest (per-shard doc/char/lang accounting, the file a
    training loader reads first) is its tiny terminal aggregate. Per-shard
    stats are hash-checkable: counts and integer char sums only (§2.0)."""
    docs = load(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("long") % 16
    ).alias("shard")
    return docs.groupBy(shard).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


@query(
    "sample_weighted_priority",
    oracle="""
    WITH draws AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(coalesce(text, '')), 1, 8)) AS BIGINT) AS u,
               greatest(CAST(coalesce(n_chars, 0) AS BIGINT), 1) AS w
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, u, w,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(u AS DOUBLE) / w, doc_id
               ) AS rk
        FROM draws
    )
    SELECT doc_id, lang, u, w, rk FROM ranked WHERE rk <= 5
    """,
)
def sample_weighted_priority(spark, sf_dir):
    """Deterministic WEIGHTED sampling without replacement (priority
    sampling, Duffield et al.): each document draws a pseudo-uniform u from
    its content digest and is ranked by u/w — higher weight (n_chars here:
    prefer longer documents) means stochastically smaller key, so the
    per-language top-5 is a weighted sample that is REPRODUCIBLE (content-
    hash draws, no RNG state) and exactly equal across engines: u and w
    are exact integers, u/w is one correctly-rounded double both engines
    compute identically, and doc_id breaks exact ties. The same
    construction at 100 TB is a per-stratum TopK (window-group-limit
    partial below the exchange) — no global sort, no sampling state.

    Degenerate-document contract (made explicit in BOTH engines so a future
    fixture with empty/NULL docs cannot flip the top-5): the draw hashes
    ``coalesce(text, '')`` (a NULL text would make u NULL, and Spark windows
    order NULLS FIRST where DuckDB orders NULLS LAST) and the weight is
    ``greatest(coalesce(n_chars, 0), 1)`` (w=0 would divide by zero, with
    engine-divergent double semantics)."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    draws = docs.select(
        "doc_id",
        "lang",
        F.conv(F.substring(F.md5(F.coalesce(F.col("text"), F.lit(""))), 1, 8), 16, 10)
        .cast("long")
        .alias("u"),
        F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)).cast("long"), F.lit(1).cast("long")).alias("w"),
    )
    w_rank = Window.partitionBy("lang").orderBy(
        F.col("u").cast("double") / F.col("w"), "doc_id"
    )
    return (
        draws.withColumn("rk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rk") <= 5)
    )


# --- Misra-Gries heavy hitters (mergeable frequent-items summary) ------------

_MG_K = 24      # counters per partial summary; error <= n/(k+1) = n/25
_MG_TOP = 5


def char_pair_stream(docs):
    """The adjacent-character-pair stream over a (doc_id, text) frame —
    BPE's first-merge statistic, the shared input of the mergeable-summary
    sketches (`sketch_heavy_hitters`, `sketch_countmin`): one JVM-side
    explode per word, no Python, no shuffle."""
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    return words.select(
        F.explode(
            F.when(
                F.length("word") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.concat(
                        F.col("word").substr(i, F.lit(1)),
                        F.col("word").substr(i + 1, F.lit(1)),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair")
    )


@query(
    "sketch_heavy_hitters",
    oracle=f"""
    WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
    w AS (SELECT unnest(ws) AS word FROM t),
    p AS (
        SELECT word[i.i] || word[i.i + 1] AS pair
        FROM w, LATERAL (SELECT unnest(range(1, length(word))) AS i) i
    ),
    c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY pair),
    n AS (SELECT sum(cnt) AS n FROM c),
    top AS (
        SELECT pair, cnt,
               row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
        FROM c
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, pair, CAST(cnt AS BIGINT) AS cnt,
           ({_MG_K + 1} * cnt > (SELECT n FROM n)) AS qualifies,
           TRUE AS mg_ok
    FROM top WHERE rnk <= {_MG_TOP}
    """,
)
def sketch_heavy_hitters(spark, sf_dir):
    """Frequent-items sketch with a THEOREM-BACKED containment verdict —
    the Misra-Gries member of the mergeable-summary family next to
    `sketch_hll_partitioned`: per Arrow batch, a k=24-counter MG summary
    over the character-pair stream (BPE's first-merge statistic — the
    sketch finds 'er' online); the union of per-batch survivors must
    contain EVERY item whose true count exceeds n/(k+1), for ANY
    partitioning and any batch split (if a global count > n/(k+1), some
    batch holds > n_batch/(k+1) of it locally and MG cannot decrement it
    to zero there — Agarwal et al., Mergeable Summaries). The emitted
    surface is deterministic even though the candidate SET is not: the
    exact top-5 pairs, their exact counts, the integer qualification test
    (25·cnt > n), and mg_ok = ¬qualifies ∨ found — the oracle pins mg_ok
    as a literal TRUE, so a containment failure turns the driver row red
    (the agg_approx_distinct error-contract pattern; the fixture has
    exactly ONE qualifying pair at every scale, so the verdict is
    non-vacuous). The exact pass exists for the verdict; a production
    run at 100 TB ships ONLY the sketch pass: one Arrow map over the
    stream, a candidate union measured in k·partitions rows, and exact
    counting restricted to candidates."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    pairs = char_pair_stream(docs)

    def mg(batches):
        # Summary-of-a-summary form of MG (Agarwal et al. §3.1): the exact
        # batch Counter is a perfect summary; compress it to k counters by
        # subtracting the (k+1)-th largest count from every count and
        # keeping positives — added undercount <= that value
        # <= n_batch/(k+1), the same bound the per-token decrement loop
        # gives, at C speed instead of one dict op per token (the 30x
        # sweep's Python floor: 21.6 s -> stream-count bound).
        from collections import Counter

        for pdf in batches:
            cnt = Counter(pdf["pair"])
            if len(cnt) > _MG_K:
                thr = sorted(cnt.values(), reverse=True)[_MG_K]
                cnt = {x: c for x, c in cnt.items() if c > thr}
            yield pd.DataFrame({"pair": list(cnt.keys())})

    candidates = (
        pairs.mapInPandas(mg, schema="pair string")
        .distinct()
        .withColumn("found", F.lit(True))
    )
    exact = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    nrow = exact.agg(F.sum("cnt").alias("n"))
    from pyspark.sql import Window

    top = (
        exact.orderBy(F.desc("cnt"), "pair")
        .limit(_MG_TOP)
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), "pair"))
            .cast("long"),
        )
    )
    qualifies = (F.lit(_MG_K + 1) * F.col("cnt")) > F.col("n")
    return (
        top.join(F.broadcast(nrow))
        .join(candidates, "pair", "left")
        .select(
            "rnk",
            "pair",
            F.col("cnt").cast("long").alias("cnt"),
            qualifies.alias("qualifies"),
            (~qualifies | F.coalesce(F.col("found"), F.lit(False))).alias(
                "mg_ok"
            ),
        )
    )


# --- Count-Min sketch (mergeable frequency-estimate summary) ------------------

_CMS_D = 3       # hash rows (depth): one md5_family seed per row
_CMS_W = 64      # counters per row (width): overestimate ~ n/W per row
_CMS_TOP = 5


@query(
    "sketch_countmin",
    oracle=f"""
    WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
    w AS (SELECT unnest(ws) AS word FROM t),
    p AS (
        SELECT word[i.i] || word[i.i + 1] AS pair
        FROM w, LATERAL (SELECT unnest(range(1, length(word))) AS i) i
    ),
    c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY pair),
    bk AS (
        SELECT s.j, c.pair, c.cnt,
               CAST(CAST('0x' || substr(
                   md5(CAST(s.j AS VARCHAR) || '|' || c.pair), 1, 15)
                   AS BIGINT) % {_CMS_W} AS INT) AS b
        FROM c CROSS JOIN (VALUES (0), (1), (2)) AS s(j)
    ),
    cell AS (SELECT j, b, sum(cnt) AS cell_cnt FROM bk GROUP BY j, b),
    est AS (
        SELECT bk.pair, min(cell.cell_cnt) AS est_cnt
        FROM bk JOIN cell USING (j, b) GROUP BY bk.pair
    ),
    top AS (
        SELECT pair, cnt,
               row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
        FROM c
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, top.pair,
           CAST(top.cnt AS BIGINT) AS cnt,
           CAST(est.est_cnt AS BIGINT) AS est_cnt,
           TRUE AS cms_ok
    FROM top JOIN est ON top.pair = est.pair
    WHERE rnk <= {_CMS_TOP}
    """,
)
def sketch_countmin(spark, sf_dir):
    """Count-Min sketch — the frequency-ESTIMATE member of the mergeable-
    summary family (`sketch_hll_partitioned` counts distincts,
    `sketch_heavy_hitters` finds frequent items, this bounds any item's
    count): per Arrow batch, a d=3 x w=64 counter grid over the character-
    pair stream, each row hashing with one md5_family seed; per-batch
    grids MERGE BY ADDITION (Cormode & Muthukrishnan '05 — every cell is a
    plain sum over colliding pairs, so partial grids sum to the global
    grid exactly, any partitioning, any batch split). That additivity is
    what makes the sketch itself hash-checkable, not just bounded: the
    oracle recomputes every probed cell in closed form (sum of exact
    counts over md5-colliding pairs) and the emitted estimate must equal
    it — the driver pins the sketch's VALUES, while the one-sided
    guarantee est >= true (min over d rows of sums that each include the
    pair's own count) is pinned as the literal-TRUE `cms_ok` verdict (the
    `mg_ok` / `agg_approx_distinct` error-contract pattern). The md5
    family is the repo's cross-engine 60-bit idiom (functions/minhash.py);
    the Python batch side hashes with hashlib over the same `{{seed}}|token`
    bytes, so all three engines (Arrow batch, Catalyst probe, DuckDB
    oracle) agree bit-for-bit.

    Emitted surface: the exact top-5 pairs with true count, CMS estimate,
    and cms_ok. The exact pass exists for the verdict (the MG contract);
    a production run ships only the sketch: one Arrow map over the
    stream, a d*w=192-cell grid per partition, 192 rows shuffled TOTAL
    regardless of corpus size — the point-query index for "how often does
    this token/n-gram occur in 100 TB" without a corpus-keyed groupBy."""
    import hashlib

    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    pairs = char_pair_stream(docs)

    def bucket_py(j: int, pair: str) -> int:
        h = hashlib.md5(f"{j}|{pair}".encode("utf-8")).hexdigest()[:15]
        return int(h, 16) % _CMS_W

    def cms(batches):
        from collections import Counter

        for pdf in batches:
            cnt = Counter(pdf["pair"])
            grid: dict[tuple[int, int], int] = {}
            for pair, c in cnt.items():
                for j in range(_CMS_D):
                    key = (j, bucket_py(j, pair))
                    grid[key] = grid.get(key, 0) + c
            yield pd.DataFrame(
                {
                    "j": [k[0] for k in grid],
                    "b": [k[1] for k in grid],
                    "c": list(grid.values()),
                }
            )

    merged = (
        pairs.mapInPandas(cms, schema="j int, b int, c long")
        .groupBy("j", "b")
        .agg(F.sum("c").alias("cell_cnt"))
    )
    exact = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    from eviction_lab_etl_spark.functions.minhash import md5_family

    top = (
        exact.orderBy(F.desc("cnt"), "pair")
        .limit(_CMS_TOP)
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), "pair"))
            .cast("long"),
        )
    )
    probes = top.select(
        "rnk",
        "pair",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(md5_family(j, F.col("pair")), F.lit(_CMS_W))
                        .cast("int")
                        .alias("b"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("pr"),
    ).select("rnk", "pair", "cnt", F.col("pr.j").alias("j"), F.col("pr.b").alias("b"))
    return (
        probes.join(F.broadcast(merged), ["j", "b"])
        .groupBy("rnk", "pair", "cnt")
        .agg(F.min("cell_cnt").alias("est_cnt"))
        .select(
            "rnk",
            "pair",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("est_cnt").cast("long").alias("est_cnt"),
            (F.col("est_cnt") >= F.col("cnt")).alias("cms_ok"),
        )
    )


# --- mergeable quantile summary (the 4th member of the sketch family) --------

_QS_PERMILLES = (10, 250, 500, 750, 990)
_QS_K = 256


@query(
    "sketch_quantile_mergeable",
    oracle=f"""
    WITH v AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                 AS v
        FROM lineitem
    ),
    n AS (SELECT count(*) AS n FROM v),
    t(permille) AS (VALUES (10), (250), (500), (750), (990)),
    tr AS (
        SELECT CAST(permille AS BIGINT) AS permille, n.n,
               (permille * n.n + 999) // 1000 AS target
        FROM t, n
    ),
    r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
    SELECT tr.permille, CAST(tr.n AS BIGINT) AS n,
           CAST(min(r.v) AS BIGINT) AS exact_q,
           TRUE AS within_5pct
    FROM tr JOIN r ON r.rn >= tr.target
    GROUP BY tr.permille, tr.n
    """,
)
def sketch_quantile_mergeable(spark, sf_dir):
    """Two-phase MERGEABLE quantile summary over lineitem price cents — the
    quantile member of the stored-intermediate sketch family
    (`sketch_hll_partitioned` / `sketch_heavy_hitters` / `sketch_countmin`):
    every input partition builds a deterministic compactor summary
    (functions/quantile_sketch.py, k={_QS_K}) inside one Arrow pass, the
    KB-sized (value, weight) rows shuffle on a single key, and ONE merge
    task compacts them into the global summary that answers any permille.
    Contrast `agg_approx_quantile` (Spark's internal percentile_approx —
    accurate but its sketch state is not a storable artifact): here the
    summary IS the intermediate a 100 TB deployment persists per shard/day
    and rolls up without re-reading data.

    ERROR CONTRACT, hash-checked (the sketch_hll_partitioned pattern): the
    summary content is partition-layout-dependent, so the emitted surface
    is the EXACT rank-target value per permille (both engines re-derive it
    from first principles: target = ceil(p*n/1000), exact_q = min v with
    rank >= target) plus the verdict that the sketch estimate's true rank
    band intersects target +/- n/20 (5 %: the deterministic compactor's
    worst-case rank error is n*levels/k < 5 % of n for any stream up to
    ~1.8 M values at k={_QS_K}; observed error < 1 % on random
    streams/splits/merge orders — hypothesis-pinned). The oracle pins the
    verdict TRUE; an off-envelope merge turns the driver row red. n is
    exact from the summary itself (compaction conserves total weight)."""
    import pandas as pd

    from pyspark.sql import Window

    from eviction_lab_etl_spark.functions.quantile_sketch import (
        CompactorSketch,
        merge_summaries,
    )

    li = load(spark, sf_dir, "lineitem")
    vals = li.select(
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("v")
    )

    def partial(batches):
        sk = CompactorSketch(_QS_K)
        for pdf in batches:
            for x in pdf["v"]:
                sk.insert(int(x))
        s = sk.summary()
        yield pd.DataFrame(
            {
                "v": pd.Series([p[0] for p in s], dtype="int64"),
                "w": pd.Series([p[1] for p in s], dtype="int64"),
            }
        )

    def merge(pdf):
        s = merge_summaries(zip(pdf["v"], pdf["w"]), _QS_K)
        return pd.DataFrame(
            {
                "v": pd.Series([p[0] for p in s], dtype="int64"),
                "w": pd.Series([p[1] for p in s], dtype="int64"),
            }
        )

    # The summary subtree must have EXACTLY ONE consumer: a physical plan
    # that references `merged` from several branches re-runs the whole
    # corpus sketch per branch (mapInPandas stages are not exchanges, so
    # nothing reuses them). n therefore rides INSIDE the cumulative frame
    # (a second window over the same KB-sized summary), and the estimate
    # join uses the ceil identity cum >= ceil(p*n/1000) <=> 1000*cum >=
    # p*n so no separate target frame touches the sketch.
    merged = (
        vals.mapInPandas(partial, "v long, w long")
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: merge(pdf), "v long, w long")
    )
    wcum = Window.orderBy("v", "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("v", "w").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = merged.select(
        "v",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wall).alias("n"),
    )
    targets = spark.createDataFrame(
        [(int(p),) for p in _QS_PERMILLES], "permille long"
    )
    est = (
        targets.join(
            F.broadcast(cum),
            1000 * F.col("cum") >= F.col("permille") * F.col("n"),
        )
        .groupBy("permille")
        .agg(F.min("v").alias("est"), F.max("n").alias("n"))
    )
    ver = (
        vals.join(F.broadcast(est))
        .groupBy("permille", "n", "est")
        .agg(
            F.sum((F.col("v") < F.col("est")).cast("long")).alias("_lt"),
            F.sum((F.col("v") <= F.col("est")).cast("long")).alias("_le"),
        )
    )
    # exact rank-target value, re-derived from the data (the hash-checked
    # statistic): distinct-value counts -> cumulative + total in one window
    # pass -> min v past the target rank. Verification-side corpus scan.
    counts = vals.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wcall = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cumex = counts.select(
        "v",
        F.sum("c").over(wc).alias("cume"),
        F.sum("c").over(wcall).alias("n2"),
    )
    exact = (
        cumex.join(
            F.broadcast(targets),
            1000 * F.col("cume") >= F.col("permille") * F.col("n2"),
        )
        .groupBy("permille")
        .agg(F.min("v").alias("exact_q"))
    )
    target = F.expr("(permille * n + 999) div 1000").cast("long")
    return ver.join(exact, "permille").select(
        "permille",
        "n",
        F.col("exact_q").cast("long").alias("exact_q"),
        (
            (20 * (F.col("_lt") + 1) <= 20 * target + F.col("n"))
            & (20 * F.col("_le") >= 20 * target - F.col("n"))
        ).alias("within_5pct"),
    )


# --- KMV / theta sketch: mergeable distinct-count SET ALGEBRA -----------------
#
# HLL (`sketch_hll_partitioned`) answers |A| and |A ∪ B| (HLL union is
# lossless) but cannot intersect. The KMV/theta family (Bar-Yossef '02;
# Dasgupta et al.'s theta sketch) keeps the K smallest distinct hash values
# as a uniform sample of the hash space, which makes INTERSECTION (and
# difference) estimable: below theta = min(theta_A, theta_B) the sketches
# are exact membership oracles, so |{h in sketch_A ∩ sketch_B : h < theta}|
# scaled by W/theta estimates |A ∩ B|. That is the missing piece for
# dedup-planning questions like "how much does crawl B overlap crawl A"
# without a corpus join.

_KMV_K = 128
_KMV_SEED = 7
_KMV_W = 1 << 60  # md5_family hash space: [0, 2^60)


def _kmv_est_sql(vk: str, kk: str, engine: str) -> str:
    """(K-1)·W / v_k when the sketch is full, else the exact sample size —
    the product needs 127·2^60 ≈ 2^67, so it runs in DECIMAL(38,0) (Spark)
    / HUGEINT (DuckDB), the text_pmi_collocations discipline."""
    if engine == "spark":
        full = f"(CAST({_KMV_K - 1} AS DECIMAL(38,0)) * {_KMV_W}) div {vk}"
    else:
        full = f"CAST({_KMV_K - 1} AS HUGEINT) * {_KMV_W} // {vk}"
    return (
        f"CASE WHEN {kk} >= {_KMV_K} THEN CAST(({full}) AS BIGINT) "
        f"ELSE CAST({kk} AS BIGINT) END"
    )


def _kmv_inter_est_sql(m: str, theta: str, engine: str) -> str:
    if engine == "spark":
        return (
            f"CAST((CAST({m} AS DECIMAL(38,0)) * {_KMV_W}) div {theta} "
            "AS BIGINT)"
        )
    return f"CAST(CAST({m} AS HUGEINT) * {_KMV_W} // {theta} AS BIGINT)"


@query(
    "sketch_theta_kmv",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT doc_id % 2 AS side,
               unnest(list_distinct(
                   list_transform(range(1, len(w) - 1),
                                  i -> array_to_string(w[i:i+2], ' ')))) AS g
        FROM docs
    ),
    d AS (
        SELECT DISTINCT side,
               {_mh_duck_hash(_KMV_SEED, "g")} AS h
        FROM grams
    ),
    da AS (SELECT h FROM d WHERE side = 0),
    db AS (SELECT h FROM d WHERE side = 1),
    ka AS (SELECT h FROM da ORDER BY h LIMIT {_KMV_K}),
    kb AS (SELECT h FROM db ORDER BY h LIMIT {_KMV_K}),
    sa AS (SELECT max(h) AS vk_a, count(*) AS k_a FROM ka),
    sb AS (SELECT max(h) AS vk_b, count(*) AS k_b FROM kb),
    th AS (
        SELECT least(
            CASE WHEN sa.k_a >= {_KMV_K} THEN sa.vk_a ELSE {_KMV_W} END,
            CASE WHEN sb.k_b >= {_KMV_K} THEN sb.vk_b ELSE {_KMV_W} END
        ) AS theta
        FROM sa, sb
    ),
    ku AS (
        SELECT DISTINCT h FROM (
            SELECT h FROM ka UNION ALL SELECT h FROM kb
        ) ORDER BY h LIMIT {_KMV_K}
    ),
    su AS (SELECT max(h) AS vk_u, count(*) AS k_u FROM ku),
    im AS (
        SELECT count(*) AS m
        FROM ka JOIN kb USING (h), th WHERE ka.h < th.theta
    ),
    xa AS (SELECT count(*) AS exact_a FROM da),
    xb AS (SELECT count(*) AS exact_b FROM db),
    xu AS (SELECT count(DISTINCT h) AS exact_union FROM d),
    xi AS (SELECT count(*) AS exact_inter FROM da JOIN db USING (h))
    SELECT
        {_kmv_est_sql("sa.vk_a", "sa.k_a", "duck")} AS est_a,
        {_kmv_est_sql("sb.vk_b", "sb.k_b", "duck")} AS est_b,
        {_kmv_est_sql("su.vk_u", "su.k_u", "duck")} AS est_union,
        {_kmv_inter_est_sql("im.m", "th.theta", "duck")} AS est_inter,
        CAST(xa.exact_a AS BIGINT) AS exact_a,
        CAST(xb.exact_b AS BIGINT) AS exact_b,
        CAST(xu.exact_union AS BIGINT) AS exact_union,
        CAST(xi.exact_inter AS BIGINT) AS exact_inter
    FROM sa, sb, su, im, th, xa, xb, xu, xi
    """,
)
def sketch_theta_kmv(spark, sf_dir):
    """KMV/theta distinct sketch with SET ALGEBRA: the corpus's distinct
    3-gram space split into two crawls (doc_id parity), a K=128
    bottom-K sketch built per side, and |A|, |B|, |A ∪ B|, |A ∩ B| all
    estimated FROM THE SKETCHES — plus the exact values as verification
    columns (a deployment skips those scans; the sketch_quantile_mergeable
    precedent). Estimator: (K−1)·W / v_K for cardinalities (Bar-Yossef
    '02), sample-count · W/theta below theta = min(theta_A, theta_B) for
    the intersection (theta sketch semantics: below both thresholds the
    samples are exact membership oracles). RSE ≈ 1/√(K−2) ≈ 8.9%;
    tests/test_library.py pins the measured error.

    Determinism: the hash is the shared md5-prefix 60-bit family, bottom-K
    is a total order (distinct values), every estimate is integer
    closed-form (127·2^60 runs in DECIMAL(38,0)/HUGEINT — the PMI overflow
    discipline) — both engines agree bit-for-bit, so the driver hash pins
    the sketch ALGORITHM, not just its accuracy.

    Scale shape: per side, one distinct shuffle over gram hashes (map-side
    partial dedup collapses repeats before the exchange) feeding a
    TakeOrdered bottom-K — Spark's TakeOrdered IS the mergeable execution:
    per-partition bottom-K, merged on the driver, exactly how per-shard
    sketches union in a deployment. Everything after is K-row frames. The
    exact_* columns are the verification scans (one distinct count + one
    sketch-sized join); production drops them and touches only sketches."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    w = F.col("w")
    gram_arr = F.when(
        F.size(w) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 2),
                lambda i: F.concat_ws(" ", F.slice(w, i, 3)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        (F.col("doc_id") % 2).alias("side"), F.explode(gram_arr).alias("g")
    )
    d = grams.select(
        "side", _mh_spark_family(_KMV_SEED, F.col("g")).alias("h")
    ).distinct()
    da = d.filter(F.col("side") == 0).select("h")
    db = d.filter(F.col("side") == 1).select("h")
    ka = da.orderBy("h").limit(_KMV_K)
    kb = db.orderBy("h").limit(_KMV_K)
    sa = ka.agg(F.max("h").alias("vk_a"), F.count(F.lit(1)).alias("k_a"))
    sb = kb.agg(F.max("h").alias("vk_b"), F.count(F.lit(1)).alias("k_b"))
    th = (
        sa.crossJoin(sb)
        .select(
            F.least(
                F.when(F.col("k_a") >= _KMV_K, F.col("vk_a")).otherwise(
                    F.lit(_KMV_W)
                ),
                F.when(F.col("k_b") >= _KMV_K, F.col("vk_b")).otherwise(
                    F.lit(_KMV_W)
                ),
            ).alias("theta")
        )
    )
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(_KMV_K)
    su = ku.agg(F.max("h").alias("vk_u"), F.count(F.lit(1)).alias("k_u"))
    im = (
        ka.join(kb, "h")
        .crossJoin(F.broadcast(th))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    xa = da.agg(F.count(F.lit(1)).alias("exact_a"))
    xb = db.agg(F.count(F.lit(1)).alias("exact_b"))
    xu = d.select("h").distinct().agg(F.count(F.lit(1)).alias("exact_union"))
    xi = da.join(db, "h").agg(F.count(F.lit(1)).alias("exact_inter"))
    one = (
        sa.crossJoin(sb)
        .crossJoin(su)
        .crossJoin(F.broadcast(im))
        .crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(xa))
        .crossJoin(F.broadcast(xb))
        .crossJoin(F.broadcast(xu))
        .crossJoin(F.broadcast(xi))
    )
    return one.select(
        F.expr(_kmv_est_sql("vk_a", "k_a", "spark")).alias("est_a"),
        F.expr(_kmv_est_sql("vk_b", "k_b", "spark")).alias("est_b"),
        F.expr(_kmv_est_sql("vk_u", "k_u", "spark")).alias("est_union"),
        F.expr(_kmv_inter_est_sql("m", "theta", "spark")).alias("est_inter"),
        big("exact_a").alias("exact_a"),
        big("exact_b").alias("exact_b"),
        big("exact_union").alias("exact_union"),
        big("exact_inter").alias("exact_inter"),
    )


@query(
    "sketch_kmv_partitioned",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT source,
               unnest(list_distinct(
                   list_transform(range(1, len(w) - 1),
                                  i -> array_to_string(w[i:i+2], ' ')))) AS g
        FROM docs
    ),
    d AS (
        SELECT DISTINCT source,
               {_mh_duck_hash(_KMV_SEED, "g")} AS h
        FROM grams
    ),
    rn AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        FROM d
    ),
    sk AS (SELECT source, h FROM rn WHERE rk <= {_KMV_K}),
    per AS (
        SELECT source, max(h) AS vk, count(*) AS k FROM sk GROUP BY source
    ),
    mg AS (
        SELECT h FROM (SELECT DISTINCT h FROM sk) ORDER BY h LIMIT {_KMV_K}
    ),
    su AS (SELECT max(h) AS vk, count(*) AS k FROM mg),
    dr AS (
        SELECT h FROM (SELECT DISTINCT h FROM d) ORDER BY h LIMIT {_KMV_K}
    ),
    sd AS (SELECT max(h) AS vk, count(*) AS k FROM dr)
    SELECT source, CAST(k AS BIGINT) AS k, vk,
           {_kmv_est_sql("vk", "k", "duck")} AS est
    FROM per
    UNION ALL
    SELECT '__merged__' AS source, CAST(k AS BIGINT) AS k, vk,
           {_kmv_est_sql("vk", "k", "duck")} AS est
    FROM su
    UNION ALL
    SELECT '__direct__' AS source, CAST(k AS BIGINT) AS k, vk,
           {_kmv_est_sql("vk", "k", "duck")} AS est
    FROM sd
    """,
)
def sketch_kmv_partitioned(spark, sf_dir):
    """Two-level KMV rollup (the sketch_hll_partitioned pattern on the KMV
    family): a bottom-128 distinct sketch of the 3-gram space built PER
    SOURCE, each source's cardinality estimated from its own sketch, and
    the GLOBAL estimate computed by MERGING the 20 per-source sketches —
    never rescanning the facts. The emitted '__merged__' row must equal the
    '__direct__' row (the sketch built from the full stream) EXACTLY:
    bottom-K of a union of per-partition bottom-Ks is the global bottom-K
    (the KMV merge identity, property-tested in tests/test_library.py) —
    so the driver hash pins losslessness of the rollup, not an
    approximation of it. This is how cardinality dashboards roll per-shard
    sketches to any coarser grain at 100 TB: per-day sketch tables are KB,
    merges never touch the facts.

    Plan: one distinct shuffle over (source, gram-hash) with map-side
    partial dedup, a per-source window on the collapsed distinct frame
    (sources are bounded; at extreme per-source cardinality the two-level
    mapInPandas compactor pattern of functions/quantile_sketch.py applies),
    then K-row frames. Estimates share sketch_theta_kmv's closed form
    (DECIMAL(38,0)/HUGEINT products)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select(
        "source", F.split("text", " ").alias("w")
    )
    w = F.col("w")
    gram_arr = F.when(
        F.size(w) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 2),
                lambda i: F.concat_ws(" ", F.slice(w, i, 3)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("source", F.explode(gram_arr).alias("g"))
    d = grams.select(
        "source", _mh_spark_family(_KMV_SEED, F.col("g")).alias("h")
    ).distinct()
    rk = F.row_number().over(Window.partitionBy("source").orderBy("h"))
    sk = d.withColumn("rk", rk).filter(F.col("rk") <= _KMV_K).select(
        "source", "h"
    )
    per = sk.groupBy("source").agg(
        F.max("h").alias("vk"), F.count(F.lit(1)).alias("k")
    )
    mg = sk.select("h").distinct().orderBy("h").limit(_KMV_K)
    su = mg.agg(F.max("h").alias("vk"), F.count(F.lit(1)).alias("k"))
    dr = d.select("h").distinct().orderBy("h").limit(_KMV_K)
    sd = dr.agg(F.max("h").alias("vk"), F.count(F.lit(1)).alias("k"))

    def row(frame, label=None):
        src = F.col("source") if label is None else F.lit(label)
        return frame.select(
            src.alias("source"),
            big("k").alias("k"),
            F.col("vk"),
            F.expr(_kmv_est_sql("vk", "k", "spark")).alias("est"),
        )

    return (
        row(per)
        .unionByName(row(su, "__merged__"))
        .unionByName(row(sd, "__direct__"))
    )
