"""Set-similarity join with prefix filtering (SURVEY §4.2 item 2).

The naive inverted-index Jaccard join (operator ``sim_jaccard_pairs``) indexes
EVERY token, so a token shared by f documents contributes f² candidate pairs —
ruinous for common tokens at corpus scale. Prefix filtering (PPJoin family,
Xiao et al., WWW'08 — public algorithm) prunes exactly:

    order all tokens by global rarity; if Jaccard(A,B) ≥ t, then the
    ⌈|A| − t·|A|⌉ + 1 rarest tokens of A and likewise of B must share at
    least one token.

So only each document's short *prefix* of rarest tokens is indexed — the
frequent tokens that explode the candidate space are precisely the ones the
prefix excludes — and the exact Jaccard test runs only on surviving candidate
pairs. Every step is a shuffle on token or doc-id; the O(n²) pair space is
never materialized.

The threshold is a rational (num, den) and all comparisons are integer
cross-multiplications: no floats anywhere (§2.0 rule 1), so results are
engine- and partitioning-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eviction_lab_etl_spark.functions.pins import adopt_pins, pin_to


#: Bucket count for ``token_bitsets``' DISTRIBUTED dictionary build (the
#: distributed zipWithIndex): tokens hash into _VID_BUCKETS buckets, each
#: bucket rank-sorts locally in parallel, and a prefix sum over the ≤1024
#: per-bucket COUNTS (a window bounded by this constant, never by the
#: vocabulary) offsets the local ranks into one DENSE 0..V-1 id space. This
#: replaces the r15 global `row_number() over (order by w)` — a single-task
#: sort of the whole vocabulary, the verdict's 100 TB scale-killer (guide
#: §2.2: no single-task stages on unbounded inputs). Ids must stay DENSE,
#: not just unique: the masks chunk ids 64-per-long, so a doc's mask size is
#: ~V/64 entries worst-case only when ids are contiguous — a sparse
#: (bucket·2^33 + rank) layout was measured 3× slower on the verification
#: popcount because every token landed in its own map chunk. Determinism: the
#: assignment is a pure function of the distinct token strings (xxhash64
#: picks the bucket, token order ranks within it, bucket counts fix the
#: offsets), so recomputation — plan-branch recompute, cache eviction,
#: retried task — is byte-identical.
_VID_BUCKETS = 1024


def token_bitsets(tok: DataFrame) -> DataFrame:
    """Per-document sparse bitset over a dictionary-encoded vocabulary:
    ``(id, mask map<int,bigint>, n bigint)`` from a distinct ``(id, w)``
    token frame. ``mask[c]`` holds bit ``vid % 64`` for every token whose
    dictionary id ``vid`` has ``vid div 64 == c``; ``n`` is the exact token
    count (= popcount of the whole mask).

    This is the verification-payload compression for pair-verification
    joins (guide §2.3 "shuffle keys and metadata instead of payloads"): a
    candidate pair's exact intersection becomes a map-side popcount over
    ~|vocab|/64 longs instead of a token-explosion join that shuffles every
    (pair, token) match row. Exact — the dictionary is built from the real
    token strings by a distributed dense rank (see ``_VID_BUCKETS``), so
    there are no hash-collision false counts, and every downstream value
    (``inter``, ``uni``, the group partition of ``grouped_token_masks``) is
    invariant under the id assignment: any injective token→id map yields
    the same intersection counts and the same equal-set groups.
    """
    bucketed = (
        tok.select("w")
        .distinct()
        .withColumn("bkt", F.pmod(F.xxhash64("w"), F.lit(_VID_BUCKETS)))
    )
    offsets = (
        bucketed.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("bn"))
        .select(
            "bkt",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    vocab = (
        bucketed.join(F.broadcast(offsets), "bkt")
        .withColumn(
            "vid",
            F.col("off")
            + F.row_number().over(Window.partitionBy("bkt").orderBy("w"))
            - 1,
        )
        .select("w", "vid")
    )
    chunked = (
        tok.join(vocab, "w")
        .groupBy("id", F.expr("vid div 64").cast("int").alias("ck"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(vid % 64 as int)))"
            ).alias("bits")
        )
    )
    return chunked.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("ck"), F.col("bits")))
        ).alias("mask"),
        F.sum(F.bit_count("bits")).alias("n"),
    )


def verify_pairs_bitset(
    cand: DataFrame,
    masks: DataFrame,
    threshold: tuple[int, int],
    left: str = "a",
    right: str = "b",
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs against per-doc token
    bitsets (``token_bitsets``): attaches both masks, computes
    ``inter = popcount(mask_a AND mask_b)`` map-side, and keeps pairs with
    Jaccard ≥ num/den by integer cross-multiplication. Output columns:
    ``(left, right, inter, uni)`` — identical values to the token-explosion
    count-join it replaces, with the (pair × token) match stream never
    materialized."""
    num, den = threshold
    ma = masks.select(
        F.col("id").alias(left), F.col("mask").alias("_ma"), F.col("n").alias("_na")
    )
    mb = masks.select(
        F.col("id").alias(right), F.col("mask").alias("_mb"), F.col("n").alias("_nb")
    )
    return (
        cand.join(ma, left)
        .join(mb, right)
        .withColumn("inter", bitset_intersection_count())
        .withColumn("uni", F.col("_na") + F.col("_nb") - F.col("inter"))
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("uni"))
        .select(left, right, "inter", "uni")
    )


def bitset_intersection_count(a: str = "_ma", b: str = "_mb"):
    """popcount(mask_a AND mask_b) over two sparse bitset maps — the exact
    intersection size of the two token sets they encode."""
    return F.expr(
        f"aggregate(map_entries({a}), cast(0 as bigint), (acc, e) -> "
        f"acc + bit_count(e.value & coalesce(try_element_at({b}, e.key), "
        "cast(0 as bigint))))"
    )


def grouped_token_masks(tok: DataFrame) -> DataFrame:
    """Documents grouped by their exact DISTINCT-token set, keyed by the
    set's BITSET encoding (``token_bitsets`` over the global dictionary —
    an exact, collision-free set fingerprint that is itself the
    verification payload): ``(gid, mk, n, ms)`` — representative id (the
    group's min), the mask as sorted entries (the group key), the set
    size, and every member id. Token contract: NON-NULL tokens (the
    vocabulary join drops NULLs — see ``minhash_signatures``; all
    registered callers tokenize via split/explode).

    The duplicate-density pre-grouping for symmetric pair joins
    (set-similarity, MinHash banding): candidacy, ``inter`` and ``uni``
    are all functions of the token SET alone, so the quadratic stages
    (prefix/bucket self-join, distinct, verification) run over one
    representative per set and ``expand_group_pairs`` restores the member
    pairs afterwards — exact, and on duplicate-dense corpora it shrinks
    the pair space by the squared duplication factor (sf0.1 fixture:
    5,000 docs → 3,935 sets). Grouping on the mask instead of the sorted
    token array keeps the group key fixed-width AND hands the verifier
    its mask for free (an A/B'd 1.8× over array-key grouping: the
    ``sort_array(collect_list(w))`` lineage re-shuffled the raw tokens per
    plan branch)."""
    masks = token_bitsets(tok)
    return (
        masks.groupBy(F.sort_array(F.map_entries("mask")).alias("mk"))
        .agg(
            F.min("id").alias("gid"),
            F.first("n").alias("n"),
            F.collect_list("id").alias("ms"),
        )
    )


def expand_group_pairs(rep_pairs: DataFrame, groups: DataFrame) -> DataFrame:
    """Expand verified representative pairs ``(a, b, inter, uni)`` over
    token-set groups ``(gid, n, ms)`` back to member-level pairs: every
    cross-group member pair inherits its group pair's exact values; every
    intra-group pair (identical sets) has ``inter = uni = n`` and Jaccard
    1, qualified at any threshold ≤ 1. Emits each unordered member pair
    exactly once, ``a < b``."""
    mem = groups.select("gid", "ms")
    inter_group = (
        rep_pairs.join(
            mem.select(F.col("gid").alias("a"), F.col("ms").alias("_msa")), "a"
        )
        .join(mem.select(F.col("gid").alias("b"), F.col("ms").alias("_msb")), "b")
        .select(F.explode("_msa").alias("x"), F.col("_msb"), "inter", "uni")
        .select("x", F.explode("_msb").alias("y"), "inter", "uni")
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
            "inter",
            "uni",
        )
    )
    intra_group = (
        groups.filter(F.size("ms") >= 2)
        .select(F.explode("ms").alias("x"), F.col("ms"), F.col("n").alias("_n"))
        .select("x", F.explode("ms").alias("y"), "_n")
        .filter(F.col("x") < F.col("y"))
        .select(
            F.col("x").alias("a"),
            F.col("y").alias("b"),
            F.col("_n").cast("bigint").alias("inter"),
            F.col("_n").cast("bigint").alias("uni"),
        )
    )
    return inter_group.unionByName(intra_group)


def prefix_candidate_pairs(
    tokens: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "w",
    threshold: tuple[int, int] = (6, 10),
) -> DataFrame:
    """The candidate pair set (a < b) the prefix filter admits — documents
    whose rarity-prefixes share at least one token. Exposed separately so
    tools/scale_stress.py can put a number on the pruning vs the all-token
    index; ``jaccard_pairs_prefix`` verifies exactly these pairs."""
    num, den = threshold
    tok = tokens.select(F.col(id_col).alias("id"), F.col(token_col).alias("w"))

    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))

    # Rank each doc's tokens by global rarity; keep the prefix
    # |A| - ceil(t*|A|) + 1 (integer ceil: (num*n + den - 1) div den).
    rarity = Window.partitionBy("id").orderBy("freq", "w")
    prefix = (
        tok.join(freq, "w")
        .withColumn("rnk", F.row_number().over(rarity))
        .join(sizes, "id")
        .filter(
            F.col("rnk")
            <= F.col("n") - F.expr(f"(({num} * n + {den} - 1) div {den})") + 1
        )
        .select("id", "w")
    )

    # The prefix frame feeds BOTH sides of the self-join; its lineage (two
    # joins + a rank window over the token explosion) does not canonicalize
    # across plan branches, so pin it for the candidate frame's lifetime
    # (guide §5, bounded by the finalizer in functions/pins.py) — callers
    # deriving over the result must adopt_pins.
    cand = (
        prefix.alias("p1")
        .join(
            prefix.alias("p2"),
            (F.col("p1.w") == F.col("p2.w")) & (F.col("p1.id") < F.col("p2.id")),
        )
        .select(F.col("p1.id").alias("a"), F.col("p2.id").alias("b"))
        .distinct()
    )
    return pin_to(cand, prefix)


def jaccard_pairs_prefix(
    tokens: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "w",
    threshold: tuple[int, int] = (6, 10),
) -> DataFrame:
    """All pairs (a < b) with Jaccard(tokens_a, tokens_b) ≥ num/den.

    ``tokens``: one row per (document, DISTINCT token). Output columns:
    ``a, b, inter, uni`` (ints; the ratio is left to the consumer).
    Identical result set to the naive all-token index join. Two r15
    physical rewrites, both output-identical:

    1. TOKEN-SET grouping (``grouped_token_masks``): Jaccard and the
       prefix filter are functions of the token SET alone, so documents
       with identical sets collapse to one representative before the
       quadratic prefix join and expand back after verification —
       intra-group pairs have J = 1 (qualified at any threshold ≤ 1) with
       inter = uni = |set|; cross-group pairs inherit the verified group
       values. The prefix filter stays complete over representatives: its
       theorem holds for ANY consistent total token order, including
       rarity ranked on representative frequencies.
    2. BITSET verification (``token_bitsets`` — map-side popcount per
       candidate pair) instead of the token-explosion count-join; the
       verifier reads the masks straight off the group keys.
    """
    num, den = threshold
    # expand_group_pairs emits intra-group (J = 1) pairs unconditionally —
    # sound exactly when the threshold admits J = 1 (r15 ADVICE item 5).
    assert num <= den, f"threshold {num}/{den} > 1 can never match"
    tok = tokens.select(F.col(id_col).alias("id"), F.col(token_col).alias("w"))
    groups = grouped_token_masks(tok)
    rep_tok = tok.join(
        groups.select(F.col("gid").alias("id")), "id", "left_semi"
    )
    cand = prefix_candidate_pairs(rep_tok, "id", "w", threshold)
    gmasks = groups.select(
        F.col("gid").alias("id"), F.map_from_entries("mk").alias("mask"), "n"
    )
    rep_pairs = verify_pairs_bitset(cand, gmasks, threshold)
    out = expand_group_pairs(rep_pairs, groups)
    # `groups` is read by 6 plan branches (semi-join filter, both verifier
    # mask legs, both expansion member legs, intra-group pairs) and its
    # collect_list lineage never canonicalizes — pin it for the result's
    # lifetime (r16 verdict item 1; guide §5) and adopt the candidate
    # frame's prefix pin. Values are cache-independent: the dictionary ids
    # are a pure function of the token strings (see token_bitsets).
    return adopt_pins(pin_to(out, groups), cand)


def fuzzy_blocked_pairs(names: DataFrame, col: str, max_dist: int = 2) -> DataFrame:
    """All unordered pairs of ``names[col]`` within Levenshtein distance
    ``max_dist``, WITHOUT the quadratic pair space: lev(a,b) <= d implies
    abs(len(a)-len(b)) <= d (each edit moves length by at most 1), so side B
    explodes to its 2d+1 candidate lengths and the join is a plain EQUI-join
    on length — shuffle-partitionable, lossless — with the exact
    ``levenshtein`` predicate applied only to candidates. Columns out:
    (name_a, name_b, dist) with name_a < name_b. The losslessness is
    property-tested against a Python brute force (tests/test_library.py);
    the registered query `join_fuzzy_blocked` hash-checks it against the
    quadratic DuckDB oracle on real data."""
    left = names.select(
        F.col(col).alias("name_a"), F.length(col).alias("blk")
    )
    right = names.select(
        F.col(col).alias("name_b"),
        F.explode(
            F.sequence(F.length(col) - max_dist, F.length(col) + max_dist)
        ).alias("blk"),
    )
    return (
        left.join(right, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        # Compute the O(len^2) edit distance ONCE and filter on the aliased
        # column: Filter and Project are separate physical operators, so a
        # levenshtein call repeated in both would run the DP twice for every
        # surviving candidate — the exact cost the blocking exists to bound.
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def containment_pairs_prefix(
    tokens: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "w",
    threshold: tuple[int, int] = (4, 5),
    probe_filter=None,
) -> DataFrame:
    """All DIRECTED pairs (src, dst) with containment
    |src ∩ dst| / |src| ≥ num/den — the prefix-filtered scale path for
    ``sim_containment_pairs``'s naive all-token index.

    Containment's prefix bound is ONE-SIDED: if src misses at most
    |src| − ⌈t·|src|⌉ of its own tokens from dst, then among src's
    |src| − ⌈t·|src|⌉ + 1 globally-rarest tokens at least one must appear
    in dst (pigeonhole). So only the PROBE side (src) is prefix-indexed —
    the container side has no size constraint of its own and keeps its
    full token index. The candidate space is |prefix(src)| × f(w) instead
    of f(w)² per token: the frequent tokens that explode the symmetric
    join still appear on the dst side, but each pairs only with the few
    documents rare-prefixed by that token, never with every co-occurrence.
    Exact verification (full intersection count + integer
    cross-multiplication) runs only on surviving candidates; every step
    shuffles on token or doc id — the O(n²) pair space is never built.
    Identical result set to the naive join (completeness is the pigeonhole
    above; property-tested against a Python brute force in
    tests/test_library.py).

    ``tokens``: one row per (document, DISTINCT token). Output:
    ``src, dst, inter, n_src`` (ints; ratio left to the consumer).
    ``probe_filter``: optional Column predicate over the aliased ``id``
    column restricting which documents act as probes (src) — the
    "find every container of this set" retrieval shape; the container
    side always ranges over the full index."""
    num, den = threshold
    tok = tokens.select(F.col(id_col).alias("id"), F.col(token_col).alias("w"))

    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))

    # Probe-side rarity prefix: |A| - ceil(t*|A|) + 1 rarest tokens of A.
    rarity = Window.partitionBy("id").orderBy("freq", "w")
    prefix = (
        tok.join(freq, "w")
        .withColumn("rnk", F.row_number().over(rarity))
        .join(sizes, "id")
        .filter(
            F.col("rnk")
            <= F.col("n") - F.expr(f"(({num} * n + {den} - 1) div {den})") + 1
        )
        .select("id", "w")
    )
    if probe_filter is not None:
        prefix = prefix.filter(probe_filter)

    cand = (
        prefix.alias("p")
        .join(
            tok.alias("t"),
            (F.col("p.w") == F.col("t.w")) & (F.col("p.id") != F.col("t.id")),
        )
        .select(F.col("p.id").alias("src"), F.col("t.id").alias("dst"))
        .distinct()
    )

    # Verification against per-doc token bitsets (token_bitsets): attach
    # both masks, count the intersection map-side with popcount, keep
    # containment ≥ num/den by integer cross-multiplication — identical
    # values to the former token-explosion count-join (r15 bitset rewrite).
    # The probe-side masks inherit the probe predicate so the broadcast
    # stays probe-sized.
    masks = token_bitsets(tok)
    probe_masks = masks if probe_filter is None else masks.filter(probe_filter)
    ma = probe_masks.select(
        F.col("id").alias("src"), F.col("mask").alias("_ma"), F.col("n").alias("_na")
    )
    mb = masks.select(F.col("id").alias("dst"), F.col("mask").alias("_mb"))
    out = (
        cand.join(ma, "src")
        .join(mb, "dst")
        .withColumn("inter", bitset_intersection_count())
        .filter(den * F.col("inter") >= num * F.col("_na"))
        .select("src", "dst", "inter", F.col("_na").alias("n_src"))
    )
    # Both verifier mask legs re-derive the bitset aggregation otherwise —
    # pin it for the result's lifetime (the one-sided prefix frame is read
    # by a single branch here, so it needs no pin).
    return pin_to(out, masks)
