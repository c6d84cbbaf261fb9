"""The local comparator must be at least as strict as the driver's
pandas-path canonicalization (VERDICT r2: two window queries passed locally
via fetchall() while the driver hash-failed on DuckDB HUGEINT→float64
widening). These tests pin that the gap stays closed."""

from __future__ import annotations

import pytest

from eviction_lab_etl_spark.registry import ORACLES, QUERIES

from tests.compare import assert_equivalent

# A deliberately UNCAST windowed integer sum: DuckDB widens sum(BIGINT) to
# HUGEINT, whose pandas conversion is float64 — the exact r2 driver failure.
_UNCAST_MOVSUM_ORACLE = """
    SELECT od, cnt,
           sum(cnt) OVER (ORDER BY od ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS movsum7
    FROM (SELECT CAST(ts AS DATE) AS od, count(*) AS cnt FROM events GROUP BY 1)
"""


def test_uncast_hugeint_oracle_fails(spark, ddb, sf_dir):
    """An oracle with an uncast integer window sum MUST fail locally — if it
    passes here, the local suite is laxer than the driver again."""
    df = QUERIES["window_moving_avg"](spark, sf_dir)
    with pytest.raises(AssertionError, match="pandas dtype kind"):
        assert_equivalent(df, ddb, _UNCAST_MOVSUM_ORACLE, "window_moving_avg_uncast")


def test_fixed_window_oracles_pass(spark, ddb, sf_dir):
    """The repaired (BIGINT-cast) window oracles pass both comparator axes."""
    for name in ("window_moving_avg", "window_range_frame"):
        assert_equivalent(QUERIES[name](spark, sf_dir), ddb, ORACLES[name], name)
