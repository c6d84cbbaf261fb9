"""Shared fixtures: one SparkSession + one DuckDB connection per test session.

SF dir defaults to sf0.001 (fast inner loop); set ELSPARK_TEST_SF_DIR to run
the same suite at sf0.01 (the driver's correctness scale) or sf0.1.

Shuffle partitions deliberately set to 7 (odd, > #cores is fine): determinism
violations (float aggregation order, unordered top-k) surface as value diffs
against DuckDB's single-threaded ordering.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eviction_lab_etl_spark import registry  # noqa: E402
from eviction_lab_etl_spark.session import build_session  # noqa: E402
from eviction_lab_etl_spark.sources.loader import TABLES  # noqa: E402

registry.load_all_operators()

SF_DIR = os.environ.get("ELSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="elspark-tests", master="local[*]", shuffle_partitions=7
    )
    yield session


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for table in TABLES:
        con.sql(f"CREATE VIEW {table} AS SELECT * FROM '{SF_DIR}/{table}.parquet'")
    yield con
    con.close()
