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


def zorder_key(cols: list[str], bits: int = 16) -> F.Column:
    """Interleaved-bit (Morton / Z-order) clustering key over N numeric
    columns, computed in pure JVM expressions.

    Each column is first normalized to a ``bits``-wide integer rank via its
    percent_rank over the frame (rank-based, so skewed value distributions
    still spread evenly across the curve), then the bit-planes are
    interleaved: bit i of column j lands at position ``i*N + j``. Rows close
    on EVERY dimension land close on the 1-D curve, so range-partitioning by
    this key clusters multi-dimensional locality into files — the layout
    behind Delta's OPTIMIZE ZORDER BY, built from public bit arithmetic.

    Cost model at 100 TB: the percent_rank needs a global sort per column —
    production replaces it with approx-quantile bucket boundaries computed on
    a sample (one pass, broadcastable), keeping the key computation map-only.
    The interleave itself is ~bits×N shift-or expressions inside codegen.
    """
    n = len(cols)
    from pyspark.sql import Window

    ranked = [
        (F.percent_rank().over(Window.orderBy(F.col(c))) * ((1 << bits) - 1)).cast("long")
        for c in cols
    ]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranked):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def zorder_write(df: DataFrame, cols: list[str], path: str, n_files: int = 8) -> None:
    """Write ``df`` clustered along the Z-order curve of ``cols``: compute
    the interleaved key, range-partition into ``n_files`` curve segments,
    and drop the key before writing. Each output file then covers a NARROW
    range of every clustered column simultaneously, so parquet footer
    min/max stats let a filter on ANY of the columns skip most files — the
    multi-dimensional generalization of `write_range_partitioned`'s
    single-column clustering."""
    keyed = df.withColumn("__z", zorder_key(cols))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
