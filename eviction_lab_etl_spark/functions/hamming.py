"""Banded Hamming-distance near-match over 64-bit hashes.

The generic engine behind ``multimodal_phash_near`` (perceptual-image
near-dup) and any other fixed-width fingerprint family (audio chromaprints,
video frame signatures): find all id pairs whose 64-bit hashes differ in at
most ``max_hd`` bits WITHOUT the O(n²) pair join, using the Manku et al.
(WWW'07) block-permutation / pigeonhole argument also used by the SimHash
text path (operators/extensions.py).

Hashes arrive as two NONNEGATIVE 32-bit halves (hi = bits 63..32,
lo = bits 31..0) so every shift/XOR/bit_count stays inside a BIGINT on both
Spark and any SQL oracle — no sign-bit or HUGEINT edge anywhere.

Exactness: with ``bands`` > ``max_hd`` equal-width bands, a pair within
``max_hd`` dirty bits can dirty at most ``max_hd`` bands, so at least one
band matches exactly (pigeonhole) — banding admits EVERY qualifying pair,
and the post-join bit_count filter removes every non-qualifying candidate:
the result EQUALS the exact quadratic join. tests/test_properties.py pins
this equality against a pure-Python brute force over random hash sets.

Scale shape (100 TB): the candidate shuffle carries ``bands`` rows per
hash — (band, band_key, id, hi, lo) — never pixels/payloads and never the
pair space; the verify is two bit_counts on the already-joined halves.
Buckets stay sparse as long as 64/bands-bit keys spread; for longer
fingerprints widen hash and bands together keeping bands > max_hd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 64
_HALF_BITS = 32


def hamming_near_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hi_col: str = "hash_hi",
    lo_col: str = "hash_lo",
    max_hd: int = 6,
    bands: int = 8,
    group_col: str | None = None,
) -> DataFrame:
    """All (a, b, hd) with a < b (by ``id_col``) and Hamming distance
    hd ≤ ``max_hd`` between the 64-bit hashes, via banded bucket join.

    ``bands`` must exceed ``max_hd`` (the pigeonhole recall guarantee) and
    divide 64 evenly with a whole number of bands per 32-bit half.

    ``group_col`` restricts matching to rows sharing an alignment key —
    e.g. the frame index for per-frame video fingerprints, a time bucket
    for audio chromaprints — joined as an ADDITIONAL equi-join key
    alongside (band, key): Catalyst extracts all three equalities as
    equi-join keys, so the candidate shuffle stays one equi-join with the
    group in the shuffle key (no post-filter). When set, the output
    carries the group column first: (group, a, b, hd).

    r15 physical rewrite, output-identical: rows with EQUAL hashes (same
    group) collapse to one representative before the banded self-join —
    candidacy and hd are functions of the two hashes alone, so every
    intra-group pair is a qualifying hd = 0 pair by construction and every
    cross-group member pair inherits its representative pair's hd. On
    fingerprint corpora hash equality is exactly the duplicate mass the
    banding otherwise pays quadratically per bucket (the minhash
    signature-group move applied to Hamming banding; video_neardup's
    banded join dropped ~3× at sf0.1)."""
    grp = [F.col(group_col).alias("grp")] if group_col else []
    gsel = ["grp"] if group_col else []
    src = hashes.select(
        *grp,
        F.col(id_col).alias("id"),
        F.col(hi_col).alias("hi"),
        F.col(lo_col).alias("lo"),
    )
    if group_col:
        # NULL-group rows never matched under the pre-r15 equi-join
        # (`a.grp == b.grp` is NULL-rejecting); groupBy would treat NULLs
        # as equal and emit intra-group pairs for them, so drop them
        # explicitly to preserve the join semantics (r15 ADVICE item 2 —
        # latent: every current caller's group key is non-null).
        src = src.filter(F.col("grp").isNotNull())
    groups = src.groupBy(*gsel, "hi", "lo").agg(
        F.min("id").alias("id"), F.collect_list("id").alias("ms")
    )
    reps = groups.select(*gsel, "id", "hi", "lo")
    rep_pairs = (
        _candidate_pairs(
            reps, "id", "hi", "lo", max_hd, bands, "grp" if group_col else None
        )
        .filter(F.col("hd") <= max_hd)
        .distinct()
    )
    mem = groups.select(*gsel, F.col("id").alias("gid"), "ms")
    ma = mem.select(*gsel, F.col("gid").alias("a"), F.col("ms").alias("_msa"))
    mb = mem.select(*gsel, F.col("gid").alias("b"), F.col("ms").alias("_msb"))
    cross = (
        rep_pairs.join(ma, gsel + ["a"])
        .join(mb, gsel + ["b"])
        .select(*gsel, F.explode("_msa").alias("x"), F.col("_msb"), "hd")
        .select(*gsel, "x", F.explode("_msb").alias("y"), "hd")
        # An id that appears twice with two DIFFERENT hashes within max_hd
        # would cross-expand to x == y, which least/greatest would collapse
        # into a degenerate self-pair the pre-r15 `a.id < b.id` join
        # structurally excluded (r15 ADVICE item 1 — latent: every current
        # caller has one hash per (group, id)).
        .filter(F.col("x") != F.col("y"))
        .select(
            *gsel,
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
            "hd",
        )
    )
    intra = (
        groups.filter(F.size("ms") >= 2)
        .select(*gsel, F.explode("ms").alias("x"), F.col("ms"))
        .select(*gsel, "x", F.explode("ms").alias("y"))
        .filter(F.col("x") < F.col("y"))
        .select(
            *gsel,
            F.col("x").alias("a"),
            F.col("y").alias("b"),
            F.lit(0).cast("long").alias("hd"),
        )
    )
    out = cross.unionByName(intra)
    if group_col:
        out = out.withColumnRenamed("grp", group_col)
    return out


def _candidate_pairs(
    hashes: DataFrame,
    id_col: str,
    hi_col: str,
    lo_col: str,
    max_hd: int,
    bands: int,
    group_col: str | None = None,
) -> DataFrame:
    """The band-bucket collision frame (a, b, hd) BEFORE the hd filter,
    multiplicity kept — this is exactly the work the banding admits, which
    is why the scale harness counts it against the O(n²) pair space
    (tools/scale_stress.py pruning rows). Private: measurement seam, not a
    user surface."""
    if bands <= max_hd:
        raise ValueError(
            f"bands ({bands}) must exceed max_hd ({max_hd}) for the "
            "pigeonhole guarantee to hold"
        )
    if _HASH_BITS % bands or (_HALF_BITS % (_HASH_BITS // bands)):
        raise ValueError(
            f"bands ({bands}) must divide {_HASH_BITS} with a whole number "
            f"of bands per {_HALF_BITS}-bit half"
        )
    band_bits = _HASH_BITS // bands
    per_half = _HALF_BITS // band_bits
    mask = (1 << band_bits) - 1
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(
                    F.col(lo_col) if b < per_half else F.col(hi_col),
                    (b % per_half) * band_bits,
                )
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    grp = [F.col(group_col).alias("grp")] if group_col else []
    buckets = hashes.select(
        *grp,
        F.col(id_col).alias("id"),
        F.col(hi_col).alias("hi"),
        F.col(lo_col).alias("lo"),
        F.explode(band_entries).alias("e"),
    ).select(
        *(["grp"] if group_col else []),
        "id",
        "hi",
        "lo",
        F.col("e.band").alias("band"),
        F.col("e.key").alias("key"),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    hd = F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi"))) + F.bit_count(
        F.col("a.lo").bitwiseXOR(F.col("b.lo"))
    )
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.id") < F.col("b.id"))
    )
    if group_col:
        cond = cond & (F.col("a.grp") == F.col("b.grp"))
    out = [
        F.col("a.id").alias("a"),
        F.col("b.id").alias("b"),
        hd.cast("long").alias("hd"),
    ]
    if group_col:
        out.insert(0, F.col("a.grp").alias(group_col))
    return a.join(b, cond).select(*out)
