"""Differential oracle tests: every hash-checked SURVEY §2 operator, Spark vs
DuckDB, full-value comparison (SURVEY §5.2 item 1)."""

from __future__ import annotations

import pytest

from eviction_lab_etl_spark.registry import ORACLES, QUERIES

from tests.compare import assert_equivalent

HASH_QUERIES = sorted(name for name in QUERIES if name in ORACLES)


@pytest.mark.parametrize("name", HASH_QUERIES)
def test_matches_oracle(spark, ddb, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_equivalent(df, ddb, ORACLES[name], name)
