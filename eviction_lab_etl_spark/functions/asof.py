"""As-of join as a library primitive (SURVEY §4.2 item 1).

Spark has no native ASOF JOIN. The scale-correct composition, used by the
``join_asof`` operator and available to any caller:

union-tag both sides → ONE shuffle on the by-key → time-ordered window →
``last(right_payload, ignorenulls)`` carries the newest right row forward →
keep left rows. O(n log n) per key group, no range-join explosion, and a
skewed key is still a single window partition AQE can spill — versus the
join+row_number formulation, which materializes every (left, candidate-right)
pair before pruning.

Tie semantics (allow-exact-matches): a right row at exactly ``left_ts`` IS
visible to that left row — matching DuckDB's ``ON l.ts >= r.ts`` — because
right rows sort before left rows at equal timestamps. Ties *between* right
rows resolve to the greatest ``right_tiebreak``, deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach ``payload_cols`` from the latest right row of
    the same ``by`` group with ``right_ts <= left_ts`` (nulls if none).

    Output: all left columns + the (possibly null) right payload columns.
    ``right_tiebreak`` orders equal-``right_ts`` right rows; defaults to the
    first payload column.
    """
    tiebreak = right_tiebreak or payload_cols[0]
    # side: right=0, left=1 → at equal ts the right row sorts first and is
    # therefore visible to the left row (ties count as "not after").
    l_tag = left.select(
        F.col(by).alias("__by"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(dict(right.dtypes)[tiebreak]).alias("__tb"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in payload_cols) + ">"
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(by).alias("__by"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        F.lit(None).cast(l_tag.schema["__l"].dataType.simpleString()).alias("__l"),
        F.struct(*payload_cols).alias("__r"),
    )
    w = (
        Window.partitionBy("__by")
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).withColumn(
        "__asof", F.last("__r", ignorenulls=True).over(w)
    )
    out_cols: list[Column] = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__asof.{c}").alias(c) for c in payload_cols]
    return carried.filter(F.col("__side") == 1).select(*out_cols)
