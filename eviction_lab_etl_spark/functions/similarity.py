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

    return (
        prefix.alias("p1")
        .join(
            prefix.alias("p2"),
            (F.col("p1.w") == F.col("p2.w")) & (F.col("p1.id") < F.col("p2.id")),
        )
        .select(F.col("p1.id").alias("a"), F.col("p2.id").alias("b"))
        .distinct()
    )


def jaccard_pairs_prefix(
    tokens: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "w",
    threshold: tuple[int, int] = (6, 10),
) -> DataFrame:
    """All pairs (a < b) with Jaccard(tokens_a, tokens_b) ≥ num/den.

    ``tokens``: one row per (document, DISTINCT token). Output columns:
    ``a, b, inter, uni`` (ints; the ratio is left to the consumer).
    Identical result set to the naive all-token index join.
    """
    num, den = threshold
    tok = tokens.select(F.col(id_col).alias("id"), F.col(token_col).alias("w"))

    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))

    cand = prefix_candidate_pairs(tokens, id_col, token_col, threshold)

    inter = (
        cand.join(tok.alias("t1"), F.col("a") == F.col("t1.id"))
        .join(
            tok.alias("t2"),
            (F.col("b") == F.col("t2.id")) & (F.col("t1.w") == F.col("t2.w")),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )

    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("a") == F.col("sa.id"))
        .join(sb, F.col("b") == F.col("sb.id"))
        .withColumn("uni", F.col("sa.n") + F.col("sb.n") - F.col("inter"))
        .filter(den * F.col("inter") >= num * F.col("uni"))
        .select("a", "b", "inter", "uni")
    )


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

    # The verification join's probe side only ever carries probe docs
    # (src comes from the filtered prefix), so the same predicate prunes
    # its SCAN — pushed to parquet, it cuts a full-corpus tokenization
    # down to the probe set's (measured ~20% of the query at sf0.1).
    probe_tok = tok if probe_filter is None else tok.filter(probe_filter)
    inter = (
        cand.join(probe_tok.alias("t1"), F.col("src") == F.col("t1.id"))
        .join(
            tok.alias("t2"),
            (F.col("dst") == F.col("t2.id")) & (F.col("t1.w") == F.col("t2.w")),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("inter"))
    )

    sa = sizes.alias("sa")
    return (
        inter.join(sa, F.col("src") == F.col("sa.id"))
        .filter(den * F.col("inter") >= num * F.col("sa.n"))
        .select("src", "dst", "inter", F.col("sa.n").alias("n_src"))
    )
