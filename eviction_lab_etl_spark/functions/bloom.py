"""Broadcastable Bloom filter over a join key — the explicit runtime filter.

``bloom_build`` folds a key set into ``m_bits`` bits packed as 64-bit words
(ONE output row holding a word->mask map); ``bloom_prune`` attaches that row
to a fact frame by broadcast and keeps only rows whose key MIGHT be in the
set. Guarantees, in order of importance:

- **No false negatives** (property-tested in tests/test_library.py): every
  key that entered the build passes the probe, so pruning before an exact
  join can never change the join's result — the construction is
  result-invariant and therefore oracle-hash-checkable (`join_bloom_pruned`).
- False positives are bounded by the classic (1 - e^(-kn/m))^k: they cost
  I/O, never correctness, because the exact join that follows removes them.

Why not Spark's built-in runtime bloom (`spark.sql.optimizer.runtime.
bloomFilter.enabled`)? That injection fires only when creation-side
size/row thresholds hold and the planner can see the filterable scan;
building it explicitly makes the reduction unconditional, composable with
any downstream operator, and testable. Probing is pure JVM codegen
(xxhash64 + shift/mask), no Python, no per-row allocation.

At 100 TB: a dim key set of 10^8 longs is an ~800 MB hash-join build — too
big to broadcast — while its 1%-FP Bloom is ~120 MB and its 10%-FP Bloom
~60 MB, both broadcastable; the fact side drops non-matching rows at the
SCAN, before the shuffle that dominates fact↔fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD = 64


def _positions_sql(key_sql: str, m_bits: int, seeds: tuple[int, ...]) -> list[str]:
    return [
        f"pmod(xxhash64(CAST({key_sql} AS BIGINT), {s}), {m_bits})" for s in seeds
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    seeds: tuple[int, ...] = (101, 202, 303),
) -> DataFrame:
    """Fold ``keys[key_col]`` (any integral type) into a 1-row Bloom frame
    with column ``__bloom_words: map<int, bigint>`` (dunder-prefixed so it cannot collide with a fact column) — word index -> 64-bit mask,
    words with no set bits omitted. ``m_bits`` must be a multiple of 64."""
    if m_bits % _WORD != 0:
        # A real error, not an assert: build and probe share the same pmod
        # positions so a violating caller would "work" until the misleading
        # partial top word surfaced elsewhere — and asserts vanish under -O.
        raise ValueError(f"m_bits ({m_bits}) must be a multiple of {_WORD}")
    pos = [
        F.expr(p) for p in _positions_sql(key_col, m_bits, tuple(seeds))
    ]
    return (
        keys.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            (F.col("pos") / _WORD).cast("int").alias("word"),
            # variable shift amounts need the SQL form (the DataFrame
            # shiftleft only takes a Python-int shift)
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .agg(
            F.map_from_arrays(
                F.collect_list("word"), F.collect_list("mask")
            ).alias("__bloom_words")
        )
    )


def bloom_might_contain(
    key_sql: str,
    m_bits: int = 4096,
    seeds: tuple[int, ...] = (101, 202, 303),
) -> F.Column:
    """Predicate over a frame carrying the ``__bloom_words`` map column: true iff
    every probe bit of ``key_sql`` is set (i.e. the key MIGHT be present).

    Each seed's ``pmod(xxhash64(...))`` position appears ONCE, as an element
    of the probed array; the ``forall`` lambda derives word index and bit
    index from that single bound value — 3 hashes per row by construction,
    instead of 6 and a prayer that codegen subexpression elimination fires."""
    positions = ", ".join(_positions_sql(key_sql, m_bits, tuple(seeds)))
    return F.expr(
        f"forall(array({positions}), p -> "
        f"(shiftright(coalesce(element_at(__bloom_words, CAST(p div {_WORD} AS INT)),"
        f" CAST(0 AS BIGINT)), CAST(p % {_WORD} AS INT)) & 1) = 1)"
    )


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    seeds: tuple[int, ...] = (101, 202, 303),
) -> DataFrame:
    """Keep only fact rows whose ``key_col`` might be in ``bloom`` (a
    1-row frame from ``bloom_build`` with the SAME m_bits/seeds). The
    bloom row rides in as a broadcast single-row cross join; the filter is
    a codegen bit test per row."""
    return (
        fact.join(F.broadcast(bloom))
        .filter(bloom_might_contain(key_col, m_bits, tuple(seeds)))
        .drop("__bloom_words")
    )
