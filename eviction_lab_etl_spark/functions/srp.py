"""Signed-random-projection (SRP) LSH for cosine similarity.

Charikar's random-hyperplane family (STOC'02, public): for a random
hyperplane h, P[sign(a·h) = sign(b·h)] = 1 − θ(a,b)/π, so banding r sign
bits into b bands gives the usual LSH amplification — candidates are pairs
agreeing on ALL r bits of at least one band, P[candidate] = 1 − (1 − p^r)^b.

Two engineering choices make this engine-portable and 100 TB-safe:

1. **Deterministic hyperplanes**: ±1 Rademacher components derived from
   md5 of a fixed seed — no RNG, no fitted model; the same planes can be
   inlined as literals into both the Spark plan and a DuckDB oracle.
2. **Integer sign bits**: the dot product is computed over
   ``floor(x * 256)`` quantized components. Multiplying a float by a power
   of two is exact (exponent shift), so the quantized values — and hence
   the band keys — are bit-identical across engines and across partition
   orders. Raw float dots are NOT portable (measured: Spark's sequential
   fold and DuckDB's list_inner_product differ in final ulps), and a sign
   flip near zero would silently change the candidate set.

At scale: the signature is a per-row map (zero shuffles); candidates are one
shuffle on (band, key); only candidates pay the exact-verify join. ``r``
sizes the bucket space (r=8 → 256 buckets/band): raise ``r`` for bigger
corpora (sharper buckets, lower per-band recall), raise ``bands`` to buy the
recall back. Defaults (b=8, r=8) give measured recall 1.0 on the fixture's
planted near-dups at cos ≥ 0.9 with a 26× candidate reduction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 256  # power of two → float*QUANT is exact in both engines


def srp_planes(n_planes: int, dim: int, seed: str = "srp-v1") -> list[list[int]]:
    """Deterministic ±1 hyperplanes: component k of plane i is the low bit
    of byte k of md5("{seed}-{i}-{block}")."""
    planes: list[list[int]] = []
    for i in range(n_planes):
        bits: list[int] = []
        block = 0
        while len(bits) < dim:
            digest = hashlib.md5(f"{seed}-{i}-{block}".encode()).digest()
            for byte in digest:
                bits.append(1 if byte & 1 else -1)
                if len(bits) == dim:
                    break
            block += 1
        planes.append(bits)
    return planes


def srp_dots(vec_name: str, planes: list[list[int]]) -> Column:
    """array<long> of all plane dots for a double-vector column, as ONE
    compact nested-HOF expression: quantize once, then fold each plane of a
    2D literal. Two deliberate choices:

    - built as a single ``F.expr`` string, not per-literal Column calls —
      64×64 plane components as individual ``F.lit`` ops cost ~10 s of Py4J
      round-trips just to CONSTRUCT the plan;
    - kept as a HOF fold, not flat per-plane column arithmetic — the flat
      form (4 096 terms) generates megabytes of codegen that OOMs a
      default-sized driver JVM. The HOF form is a few expression nodes
      regardless of plane count; its per-row interpreted cost is amortized
      by banding's candidate reduction."""
    planes_sql = ",".join(
        "array(" + ",".join(f"{s}L" for s in plane) + ")" for plane in planes
    )
    return F.expr(
        f"transform(array({planes_sql}), p -> aggregate("
        f"zip_with(transform({vec_name}, x -> CAST(floor(x * {QUANT}) AS BIGINT)),"
        " p, (a, b) -> a * b), 0L, (acc, v) -> acc + v))"
    )


def srp_band_entries(dots_name: str, bands: int, rows: int) -> Column:
    """array<struct<band int, key int>>: pack r sign bits per band from the
    plane-dot array column. Sign bits of exact integers — engine-portable.
    Horner packing, MSB-first: visiting j = r-1 … 0 with acc*2 + bit_j gives
    bit_j the weight 2^j — the same key values the oracle's Σ bit_j·2^j
    produces."""
    return F.expr(
        f"transform(sequence(0, {bands - 1}), b -> named_struct("
        f"'band', b, 'key', aggregate(sequence({rows - 1}, 0, -1), 0,"
        f" (acc, j) -> acc * 2 + IF(element_at({dots_name}, b * {rows} + j + 1) >= 0, 1, 0))))"
    )


def srp_candidate_pairs(
    vectors: DataFrame,
    planes: list[list[int]],
    bands: int,
    rows: int,
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """Distinct candidate pairs (a < b, plus both vectors) sharing ≥1 band
    bucket. Shuffles on (band, key) — never on the O(n²) pair space.

    The banding stages are deliberately NARROW: buckets carry only
    (id, band, key) and the pair dedup runs over bare (a, b) ids — 16-byte
    rows — with the vectors joined back afterwards from the signature frame.
    Carrying the vectors through the band explode would replicate every
    vector ``bands``× into the (band, key) shuffle, and carrying them through
    the DISTINCT would shuffle ~1 KB per candidate where 16 bytes suffice
    (the gap widens with dimension and candidate count — SCALE.md records
    the measured growth). The vector rejoin costs two id-keyed hash joins
    proportional to n, not to candidates — the classic dedup-narrow /
    rejoin-wide shape."""
    sig = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        srp_dots(vec_col, planes).alias("dots"),
    )
    buckets = sig.select(
        "id", F.explode(srp_band_entries("dots", bands, rows)).alias("e")
    ).select("id", F.col("e.band").alias("band"), F.col("e.key").alias("key"))
    b1 = buckets.alias("b1")
    b2 = buckets.alias("b2")
    cand = (
        b1.join(
            b2,
            (F.col("b1.band") == F.col("b2.band"))
            & (F.col("b1.key") == F.col("b2.key"))
            & (F.col("b1.id") < F.col("b2.id")),
        )
        .select(F.col("b1.id").alias("a"), F.col("b2.id").alias("b"))
        .distinct()
    )
    va = sig.select(F.col("id").alias("a"), F.col("v").alias("va"))
    vb = sig.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    return cand.join(va, "a").join(vb, "b")


def srp_oracle_cte(
    planes: list[list[int]], bands: int, rows: int, dim: int
) -> tuple[str, str, str]:
    """DuckDB SQL fragments mirroring srp_band_keys exactly.

    Returns (dots_select, keys_select, band_case) strings to splice into an
    oracle CTE chain over a column ``q`` (the quantized vector). Kept as one
    helper so the Spark and SQL sides can only drift in one place.
    """
    dots = ", ".join(
        "("
        + "".join(
            (" + " if s > 0 else " - ") + f"q[{j + 1}]" if j else f"q[{j + 1}]" if s > 0 else f"-q[{j + 1}]"
            for j, s in enumerate(plane[:dim])
        )
        + f") AS d{i}"
        for i, plane in enumerate(planes)
    )
    keys = ", ".join(
        "("
        + " + ".join(
            f"(CASE WHEN d{b * rows + j} >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(rows)
        )
        + f") AS k{b}"
        for b in range(bands)
    )
    band_case = (
        "CASE band "
        + " ".join(f"WHEN {b} THEN k{b}" for b in range(bands))
        + " END"
    )
    return dots, keys, band_case
