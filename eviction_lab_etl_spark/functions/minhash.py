"""Native MinHash + LSH banding (shingle → minhash → band → bucket-join).

Engine-owned alternative to ``pyspark.ml.feature.MinHashLSH`` (used by the
``sim_ann_lsh`` operator): fully deterministic (hash family is
``xxhash64(seed_i, token)`` — no fitted model, no RNG), entirely JVM-side
expressions, and the banding is explicit so the candidate join is a plain
shuffle on (band, band_hash) — the textbook bucket-join that replaces the
O(n²) pair space at corpus scale.

Theory (Broder '97 / standard LSH banding, public): P[min-hash collision] =
Jaccard(A,B); with b bands of r rows, P[candidate] = 1 − (1 − s^r)^b. The
defaults b=32, r=3 give ≈0.9996 recall at s=0.6 and ≈0.03 at s=0.1 — steep
enough to prune the far pairs that dominate a corpus.

At 100 TB: signatures are one aggregation pass over the token explosion
(b·r longs per doc); candidates shuffle on band hash; only surviving pairs
pay the exact verification join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minhash_signatures(
    tokens: DataFrame,
    id_col: str = "id",
    token_col: str = "w",
    n_hashes: int = 96,
) -> DataFrame:
    """One row per document: ``(id, sig array<bigint>)`` of n_hashes minhash
    values, computed as a single grouped aggregation (no per-hash shuffle)."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col(token_col))).alias(f"__h{i}")
        for i in range(n_hashes)
    ]
    wide = tokens.groupBy(F.col(id_col).alias("id")).agg(*aggs)
    return wide.select(
        "id", F.array(*[f"__h{i}" for i in range(n_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 32, rows_per_band: int = 3
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one band bucket.

    Each signature splits into ``bands`` slices of ``rows_per_band`` values;
    a slice hashes to one bucket key. Docs collide iff some slice matches
    exactly — the probability amplification that makes LSH work."""
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at("sig", b * rows_per_band + j + 1)
                        for j in range(rows_per_band)
                    ]
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    buckets = signatures.select("id", F.explode(band_entries).alias("e")).select(
        "id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
    )
    b1 = buckets.alias("b1")
    b2 = buckets.alias("b2")
    return (
        b1.join(
            b2,
            (F.col("b1.band") == F.col("b2.band"))
            & (F.col("b1.bh") == F.col("b2.bh"))
            & (F.col("b1.id") < F.col("b2.id")),
        )
        .select(F.col("b1.id").alias("a"), F.col("b2.id").alias("b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    tokens: DataFrame,
    id_col: str = "id",
    token_col: str = "w",
    threshold: tuple[int, int] = (6, 10),
    bands: int = 32,
    rows_per_band: int = 3,
) -> DataFrame:
    """LSH-accelerated near-dup join: band candidates, then exact-verify each
    candidate's true Jaccard with integer cross-multiplication. Output
    ``(a, b, inter, uni)`` — a subset of the exact join's pairs missing only
    banding false-negatives (≈0.04% at the default b, r and s=0.6)."""
    num, den = threshold
    tok = tokens.select(F.col(id_col).alias("id"), F.col(token_col).alias("w"))
    sig = minhash_signatures(tok, "id", "w", bands * rows_per_band)
    cand = lsh_candidate_pairs(sig, bands, rows_per_band)
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
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
