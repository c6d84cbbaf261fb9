"""Physical data-layout strategies for the 100 TB target (SURVEY §4).

Three levers a 1000-executor deployment uses that local[32] correctness tests
never force, packaged as library functions with plan-level tests:

- **Bucketed tables** (`bucketed_write`): pre-hash-partition fact tables on
  their join key at write time so every later equi-join on that key is
  exchange-free — the shuffle is paid once at ingest, not per query. This is
  how the reference's repeated (GEOID, year) merges should land at scale.
- **Salted joins** (`salted_join`): when one join key dominates (a national
  GEOID, a viral document), a plain hash join sends the whole key to one task.
  Salting fans the hot key across ``n_salts`` tasks deterministically and
  replicates the small side to match. AQE's skew-join split is the automatic
  backstop; salting is the explicit form for the pathological keys you know.
- **Range-partitioned writes** (`write_range_partitioned`): order-clustered
  parquet (e.g. by date) so time-bounded scans prune files; the write-side
  dual of partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_write(df: DataFrame, table: str, key: str, n_buckets: int, path: str) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key``.

    Readers joining two tables bucketed on the same key with the same bucket
    count get a shuffle-free sort-merge join (Exchange elided on both sides).
    """
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fan each left row to one of ``n_salts`` sub-keys
    and replicate the (smaller) right side across all of them.

    The salt is derived deterministically from the full left row
    (``xxhash64`` over all columns), so the same input always routes the same
    way — no ``rand()``, which would break retry idempotence and §2.0
    determinism. Output equals ``left.join(right, key, how)`` exactly; only
    the shuffle distribution changes. Supports inner and left joins (the
    replicated-right construction keeps exactly one copy of unmatched left
    rows)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*left.columns), F.lit(n_salts))
    salted_left = left.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")


def write_range_partitioned(
    df: DataFrame, path: str, order_col: str, n_files: int
) -> None:
    """Write parquet range-clustered on ``order_col``: each output file holds a
    contiguous value range, so min/max footer stats prune whole files for
    range predicates (the scan-side complement of predicate pushdown)."""
    df.repartitionByRange(n_files, F.col(order_col)).sortWithinPartitions(
        order_col
    ).write.mode("overwrite").parquet(path)


def _interleave(ranked: list[F.Column], bits: int) -> F.Column:
    """Morton interleave of N ``bits``-wide integer rank columns: bit i of
    column j lands at position ``i*N + j`` — ~bits×N shift-or expressions,
    all inside whole-stage codegen."""
    n = len(ranked)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranked):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def zorder_key(cols: list[str], bits: int = 16) -> F.Column:
    """EXACT interleaved-bit (Morton / Z-order) clustering key over N numeric
    columns, computed in pure JVM expressions.

    Each column is first normalized to a ``bits``-wide integer rank via its
    percent_rank over the frame (rank-based, so skewed value distributions
    still spread evenly across the curve), then the bit-planes are
    interleaved. Rows close on EVERY dimension land close on the 1-D curve,
    so range-partitioning by this key clusters multi-dimensional locality
    into files — the layout behind Delta's OPTIMIZE ZORDER BY, built from
    public bit arithmetic.

    SCALE WARNING: percent_rank here runs over an UN-partitioned window — a
    global single-task sort per column. That is acceptable only on frames
    that fit one task (tests, samples). The production path is
    ``zorder_key_sampled`` (approx-quantile boundaries broadcast as
    literals, map-only rank — what ``zorder_write`` uses); this exact form
    exists as its correctness reference.
    """
    from pyspark.sql import Window

    ranked = [
        (F.percent_rank().over(Window.orderBy(F.col(c))) * ((1 << bits) - 1)).cast("long")
        for c in cols
    ]
    return _interleave(ranked, bits)


def zorder_key_sampled(
    df: DataFrame, cols: list[str], bits: int = 8, relative_error: float = 0.001
) -> F.Column:
    """MAP-ONLY Z-order key: per-column ranks come from ``2^bits - 1``
    approx-quantile cut points (Greenwald-Khanna sketch: one distributed
    pass over ``df``, driver gets only the boundaries) inlined as literal
    arrays — so computing the key adds NO shuffle and NO global sort to the
    write plan, at any scale. Rank = count of boundaries ≤ value, evaluated
    as an ``F.aggregate`` fold over the literal array inside codegen (O(2^b)
    comparisons per row; bits=8 → 255, trivial JVM-side).

    This is the production form of ``zorder_key`` (quantile ranks keep
    skewed distributions spread across the curve exactly like percent_rank,
    up to sketch error); 8 bits/dim = 256 buckets/dim bounds the rank
    resolution, which only needs to exceed the output file count.
    """
    cuts = [i / (1 << bits) for i in range(1, 1 << bits)]
    bounds = df.select([F.col(c).cast("double").alias(c) for c in cols]).approxQuantile(
        cols, cuts, relative_error
    )
    ranked = []
    for c, bs in zip(cols, bounds):
        arr = F.array(*[F.lit(float(b)) for b in bs])
        ranked.append(
            F.aggregate(
                arr,
                F.lit(0).cast("long"),
                lambda acc, b: acc
                + F.when(F.col(c).cast("double") >= b, 1).otherwise(0).cast("long"),
            )
        )
    return _interleave(ranked, bits)


def zorder_write(
    df: DataFrame, cols: list[str], path: str, n_files: int = 8, bits: int = 8
) -> None:
    """Write ``df`` clustered along the Z-order curve of ``cols``: compute
    the interleaved key (sampled/map-only form — the one that scales),
    range-partition into ``n_files`` curve segments, and drop the key before
    writing. Each output file then covers a NARROW range of every clustered
    column simultaneously, so parquet footer min/max stats let a filter on
    ANY of the columns skip most files — the multi-dimensional
    generalization of `write_range_partitioned`'s single-column clustering.
    Measured A/B vs linear and random layouts across query shapes:
    tools/zorder_ab.py, table in SCALE.md (worst-shape files kept 23/64
    vs linear's 64/64 at 64 files)."""
    keyed = df.withColumn("__z", zorder_key_sampled(df, cols, bits=bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
