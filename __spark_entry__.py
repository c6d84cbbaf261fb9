"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``eviction_lab_etl_spark`` (SURVEY.md §2 inventory);
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Ensure the package is importable regardless of the driver's cwd.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from eviction_lab_etl_spark import registry  # noqa: E402

registry.load_all_operators()

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "agg_sum_groupby"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1) on sf0.001; driver checks rows>0."""
    return registry.QUERIES[_FLAGSHIP](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every hash-checked operator."""
    return dict(registry.ORACLES)
