"""Determinism double-run (SURVEY §5.2 item 3): every hash-checked query must
produce identical values under different shuffle partitionings — catches float
aggregation-order violations of §2.0 rule 1 before the oracle does.

A representative cross-group sample keeps runtime sane; the full oracle diff
already pins exact values at the default partitioning.
"""

from __future__ import annotations

import pytest

from eviction_lab_etl_spark.registry import QUERIES

from tests.compare import canon_spark

SAMPLE = [
    "agg_sum_groupby",       # decimal partial aggregation
    "join_weighted_alloc",   # window sum + per-row float expression
    "window_rank_topk",      # ordered window with tiebreak
    "sort_multi_topk",       # global top-k selection
    "sim_knn_cosine",        # float-ordered ranking
    "stream_session",        # session assignment
    "agg_weighted_mean",     # decimal/int ratio
    "reshape_pivot_agg",     # pivoted decimal sums
]


@pytest.mark.parametrize("name", SAMPLE)
def test_double_run_identical(spark, sf_dir, name):
    results = []
    for partitions in ("1", "13"):
        spark.conf.set("spark.sql.shuffle.partitions", partitions)
        try:
            results.append(canon_spark(QUERIES[name](spark, sf_dir)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "7")
    assert results[0] == results[1], f"{name}: result depends on partitioning"
