"""Canonicalized result comparison — a stricter local replica of the driver's
row-count + schema + order-insensitive value-hash check (SURVEY §5.2 item 1).

Stricter on purpose: floats must match bit-for-bit (repr-equal), not just
hash-equal after some normalization we can't see. If this passes, any
reasonable driver normalization passes too.
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
