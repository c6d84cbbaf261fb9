"""Determinism double-run (SURVEY §5.2 item 3): every hash-checked query must
produce identical values under different shuffle partitionings — catches float
aggregation-order violations of §2.0 rule 1 before the oracle does.

This runs the FULL hash inventory, not a sample: the external driver executes
queries under ITS OWN shuffle-partition setting, so a partitioning-sensitive
result that happens to match DuckDB at the test partitioning would still fail
the driver's check. ~2 runs per query at sf0.001 keeps this fast.
"""

from __future__ import annotations

import pytest

from eviction_lab_etl_spark.registry import ORACLES, QUERIES

from tests.compare import canon_spark

HASH_QUERIES = sorted(name for name in QUERIES if name in ORACLES)


@pytest.mark.parametrize("name", HASH_QUERIES)
def test_double_run_identical(spark, sf_dir, name):
    results = []
    for partitions in ("1", "13"):
        spark.conf.set("spark.sql.shuffle.partitions", partitions)
        try:
            results.append(canon_spark(QUERIES[name](spark, sf_dir)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "7")
    assert results[0] == results[1], f"{name}: result depends on partitioning"
