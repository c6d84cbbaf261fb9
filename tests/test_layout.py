"""Tests for the physical-layout library (plans/layout.py): each strategy must
prove its plan-level claim, not just return correct rows."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from eviction_lab_etl_spark.plans.audit import audit_plan
from eviction_lab_etl_spark.plans.layout import (
    bucketed_write,
    salted_join,
    write_range_partitioned,
)
from eviction_lab_etl_spark.sources.loader import load


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based join strategies so layout effects are observable."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, sf_dir, no_broadcast):
    with tempfile.TemporaryDirectory() as tmp:
        orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        bucketed_write(orders, "t_orders_b", "o_orderkey", 4, f"{tmp}/o")
        bucketed_write(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "t_lineitem_b",
            "o_orderkey",
            4,
            f"{tmp}/l",
        )
        try:
            joined = spark.table("t_orders_b").join(spark.table("t_lineitem_b"), "o_orderkey")
            info = audit_plan(joined)
            assert info["shuffles"] == 0, f"bucketed join shuffled:\n{info['plan']}"
            assert info["sortmerge_joins"] == 1
            # and it still computes the right thing
            expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
            assert joined.count() == expect
        finally:
            spark.sql("DROP TABLE IF EXISTS t_orders_b")
            spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, sf_dir, no_broadcast, how):
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber", "l_quantity"
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    salted = salted_join(li, orders, "k", n_salts=5, how=how)
    plain = li.join(orders, "k", how)
    assert salted.columns == plain.columns
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_rejects_unsupported_how(spark, sf_dir):
    df = load(spark, sf_dir, "region")
    with pytest.raises(ValueError):
        salted_join(df, df, "r_regionkey", how="full")


def test_range_partitioned_write_prunes_files(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        orders = load(spark, sf_dir, "orders")
        write_range_partitioned(orders, f"{tmp}/o", "o_orderkey", 8)
        back = spark.read.parquet(f"{tmp}/o")
        assert back.count() == orders.count()
        # A tight key-range predicate must read fewer files than the total:
        # every file holds a contiguous o_orderkey range, so footer min/max
        # stats exclude the rest. numFiles appears in the scan's metrics via
        # the input file list — check with input_file_name distinct counts.
        total_files = back.select(F.input_file_name()).distinct().count()
        hit = orders.agg(F.min("o_orderkey")).collect()[0][0]
        touched_files = (
            back.filter(F.col("o_orderkey") == hit)
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        assert total_files >= 8
        assert touched_files <= 2


def test_zorder_sampled_key_is_map_only(spark, sf_dir):
    """The production Z-order key (approx-quantile boundaries inlined as
    literals) must add NO exchange and NO window to the plan — the advertised
    property that makes it safe on frames of any size, where the exact
    percent_rank form degrades to a single-task global sort per column."""
    from eviction_lab_etl_spark.plans.layout import zorder_key_sampled

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    keyed = li.withColumn("z", zorder_key_sampled(li, ["l_orderkey", "l_partkey"]))
    info = audit_plan(keyed)
    assert info["shuffles"] == 0, info["plan"]
    assert "Window" not in info["plan"]


def test_zorder_sampled_rank_is_monotone(spark):
    """Per-dimension sanity for the sampled key: on a single column the key
    must be a monotone step function of the value with ~2^bits levels —
    i.e. the quantile-boundary rank really reproduces percent_rank's
    bucketing up to sketch granularity."""
    from eviction_lab_etl_spark.plans.layout import zorder_key_sampled

    df = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    rows = (
        df.withColumn("z", zorder_key_sampled(df, ["v"], bits=4))
        .orderBy("v")
        .collect()
    )
    zs = [r.z for r in rows]
    assert zs == sorted(zs)
    assert len(set(zs)) >= 12  # ~16 levels at bits=4 on a uniform column


def test_zorder_write_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout evidence: after clustering lineitem by (l_orderkey,
    l_partkey), each output file covers a narrow slice of BOTH key ranges —
    the per-file min/max spans that parquet footer stats expose for row-group
    skipping. A plain (unclustered) write is the control: its per-file spans
    cover essentially the whole domain on at least one dimension, so a
    selective filter can skip (almost) nothing."""
    from eviction_lab_etl_spark.plans.layout import zorder_write
    from eviction_lab_etl_spark.sources.loader import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    zpath, plain_path = str(tmp_path / "z"), str(tmp_path / "plain")
    zorder_write(li, ["l_orderkey", "l_partkey"], zpath, n_files=16)
    li.repartition(16).write.mode("overwrite").parquet(plain_path)

    def mean_span_fraction(path: str) -> dict[str, float]:
        back = spark.read.parquet(path).withColumn("f", F.input_file_name())
        spans = back.groupBy("f").agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("ok_span"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("pk_span"),
        )
        dom = back.agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("ok_dom"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("pk_dom"),
        ).collect()[0]
        rows = spans.collect()
        return {
            "ok": sum(r.ok_span for r in rows) / len(rows) / dom.ok_dom,
            "pk": sum(r.pk_span for r in rows) / len(rows) / dom.pk_dom,
        }

    z, plain = mean_span_fraction(zpath), mean_span_fraction(plain_path)
    # Control: round-robin files span ~the entire domain in both dimensions.
    assert plain["ok"] > 0.9 and plain["pk"] > 0.9, plain
    # Z-ordered files cover a strictly narrower slice of BOTH dimensions —
    # 16 curve segments = the top 4 interleaved bits = 2 bit-planes per
    # dimension, so each file spans ~1/4 of each domain; assert a
    # conservative bound that still proves real multi-dimensional
    # clustering (single-column range clustering would leave the OTHER
    # dimension at ~1.0).
    assert z["ok"] < 0.55 and z["pk"] < 0.55, z
    # and the data survives the round-trip
    assert spark.read.parquet(zpath).count() == li.count()
