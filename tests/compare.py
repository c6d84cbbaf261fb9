"""Canonicalized result comparison — a stricter local replica of the driver's
row-count + schema + order-insensitive value-hash check (SURVEY §5.2 item 1).

Two complementary checks, because "stricter" has two axes:

1. Value strictness (``canon_spark``/``canon_duck``): floats must match
   bit-for-bit (repr-equal), not just hash-equal after some normalization we
   can't see.
2. Pandas-path strictness (``assert_pandas_kinds_agree``): the DRIVER
   canonicalizes both sides via pandas (Spark ``toPandas`` / DuckDB
   ``.df()``). ``fetchall()`` narrows a DuckDB HUGEINT back to a Python int
   (equal to Spark's), but ``.df()`` widens it to float64 (``364.0`` vs
   ``364``) — a driver hash mismatch invisible to check 1. Round 2 failed
   two window queries on exactly this axis, so the local suite now walks the
   pandas path too.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any


def _norm(value: Any) -> Any:
    if value is None:
        return None
    if isinstance(value, bool):
        return value
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(float(value))
    if isinstance(value, decimal.Decimal):
        # Scale-insensitive: Decimal('1.50') == Decimal('1.5') textually.
        return f"dec:{value.normalize()}"
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(_norm(v) for v in value)
    return value


def canon_spark(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm(row[c]) for c in cols) for row in df.collect()]
    return cols, sorted(rows, key=repr)


def canon_duck(con, sql: str) -> tuple[list[str], list[tuple]]:
    rel = con.sql(sql)
    names = list(rel.columns)
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in rel.fetchall()]
    return sorted(names), sorted(rows, key=repr)


def assert_pandas_kinds_agree(spark_df, con, oracle: str, name: str) -> None:
    """Replicate the driver's pandas canonicalization axis: fail when the two
    engines disagree on integer-vs-float dtype kind for the same column.

    The classic trigger is an uncast integer ``sum(...)`` in the oracle:
    DuckDB widens sum(BIGINT) to HUGEINT, whose pandas conversion is float64,
    while Spark keeps int64 — values then render ``364.0`` vs ``364`` and the
    driver's value-hash mismatches even though fetchall() compares equal.
    Columns where BOTH sides widen (e.g. nullable ints → float64 + NaN on
    both) are fine — only a one-sided int/float split fails.
    """
    s_kinds = {c: d.kind for c, d in spark_df.toPandas().dtypes.items()}
    o_kinds = {c: d.kind for c, d in con.sql(oracle).df().dtypes.items()}
    for col in sorted(set(s_kinds) & set(o_kinds)):
        pair = {s_kinds[col], o_kinds[col]}
        if "f" in pair and pair & {"i", "u"}:
            raise AssertionError(
                f"{name}.{col}: pandas dtype kind mismatch spark={s_kinds[col]} "
                f"oracle={o_kinds[col]} — one-sided integer→float widening "
                f"(uncast HUGEINT sum?) hash-mismatches in the driver"
            )


def assert_equivalent(spark_df, con, oracle: str, name: str) -> None:
    s_cols, s_rows = canon_spark(spark_df)
    o_cols, o_rows = canon_duck(con, oracle)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} oracle={len(o_rows)}"
    )
    if s_rows != o_rows:
        diffs = [
            (i, s, o) for i, (s, o) in enumerate(zip(s_rows, o_rows)) if s != o
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
    assert_pandas_kinds_agree(spark_df, con, oracle, name)
