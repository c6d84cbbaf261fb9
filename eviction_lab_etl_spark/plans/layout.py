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
