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


# ---- Z-order key properties (hypothesis) -----------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_Z_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
_Z_VALS = st.sampled_from([-7.0, -2.0, 0.0, 1.0, 2.5, 3.5, 7.0, 9.0, 64.0])


def _py_morton_ref(xs: list, ys: list, bits: int) -> list:
    """Pure-Python reference for the EXACT Z-order key: Spark percent_rank
    semantics ((rank-1)/(n-1), ties share a rank), the same IEEE-double
    pct*(2^bits-1) product Spark evaluates (so truncation boundaries agree
    bit-for-bit), then the i*N+j Morton lattice of plans/layout._interleave."""
    n = len(xs)
    mx = (1 << bits) - 1

    def ranks(vs):
        return [
            int((0.0 if n == 1 else sum(1 for u in vs if u < v) / (n - 1)) * mx)
            for v in vs
        ]

    keys = []
    for a, b in zip(ranks(xs), ranks(ys)):
        k = 0
        for i in range(bits):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        keys.append(k)
    return keys


def _deinterleave(key: int, bits: int, j: int, n_dims: int = 2) -> int:
    return sum(((key >> (i * n_dims + j)) & 1) << i for i in range(bits))


@given(
    pairs=st.lists(st.tuples(_Z_VALS, _Z_VALS), min_size=1, max_size=20),
    bits=st.sampled_from([4, 8]),
)
@_Z_SETTINGS
def test_zorder_exact_key_matches_python_morton(spark, pairs, bits):
    """The exact Z-order key (plans/layout.zorder_key) against a pure-Python
    Morton reference, for ANY input including ties and negatives: pins the
    percent_rank normalization, the double-multiply truncation boundary, and
    the full _interleave bit lattice value-for-value — so a refactor that
    shifts any bit-plane fails immediately, which the single driver fixture
    (layout_zorder_key) alone cannot guarantee. Monotonicity in each
    dimension holding the other fixed is implied: ranks are monotone in
    value and the lattice is monotone in each rank."""
    from eviction_lab_etl_spark.plans.layout import zorder_key

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    df = spark.createDataFrame(
        [(i, xs[i], ys[i]) for i in range(len(pairs))],
        "id long, x double, y double",
    )
    got = {
        r.id: r.z
        for r in df.select(
            "id", zorder_key(["x", "y"], bits=bits).alias("z")
        ).collect()
    }
    want = _py_morton_ref(xs, ys, bits)
    assert [got[i] for i in range(len(pairs))] == want


@given(seed=st.integers(min_value=0, max_value=10_000))
@_Z_SETTINGS
def test_zorder_sampled_agrees_with_exact_on_rank_boundaries(spark, seed):
    """zorder_key_sampled vs the exact form where their contracts meet: on
    2^bits DISTINCT values with relative_error=0, every value is itself a
    quantile boundary, so the sampled rank (count of boundaries <= v) must
    equal the exact percent_rank-derived rank +1, clamped to 2^bits-1 at
    the maximum — per dimension, recovered by de-interleaving the key. This
    pins the F.aggregate fold-count rank AND its alignment with the exact
    reference; a drift in either rank convention breaks zorder_write's
    clustering silently otherwise."""
    import random

    from eviction_lab_etl_spark.plans.layout import zorder_key_sampled

    rng = random.Random(seed)
    bits, n = 4, 16
    xs = [float(v) for v in rng.sample(range(1000), n)]
    ys = [float(v) for v in rng.sample(range(1000), n)]
    df = spark.createDataFrame(
        [(i, xs[i], ys[i]) for i in range(n)], "id long, x double, y double"
    )
    got = {
        r.id: r.z
        for r in df.select(
            "id",
            zorder_key_sampled(df, ["x", "y"], bits=bits, relative_error=0.0)
            .alias("z"),
        ).collect()
    }
    sx, sy = sorted(xs), sorted(ys)
    mx = (1 << bits) - 1
    for i in range(n):
        want = (min(sx.index(xs[i]) + 1, mx), min(sy.index(ys[i]) + 1, mx))
        have = (
            _deinterleave(got[i], bits, 0),
            _deinterleave(got[i], bits, 1),
        )
        assert have == want, (i, have, want)


def test_parquet_bloom_write_and_pushed_point_predicate(spark, sf_dir):
    """io_parquet_bloom_roundtrip's two physical claims: (1) the point
    predicate reaches the parquet reader (PushedFilters — the bloom bitsets
    answer 'definitely absent' per row group at scan time), and (2) the
    written files actually CARRY the bloom bitsets (this container's
    PyArrow predates bloom-offset metadata exposure, so the check is the
    bitsets' FOOTPRINT: the same rows written with and without the option
    must differ by the bitset bytes — a silently ignored write option
    would leave the operator timing plain zone-map scans)."""
    import glob
    import os

    from eviction_lab_etl_spark.operators.scans import _sink_path
    from eviction_lab_etl_spark.plans.audit import audit_plan
    from eviction_lab_etl_spark.registry import QUERIES
    from eviction_lab_etl_spark.sources.loader import load

    df = QUERIES["io_parquet_bloom_roundtrip"](spark, sf_dir)
    info = audit_plan(df)
    assert any("user_id" in p for p in info["pushed_filters"]), info[
        "pushed_filters"
    ]
    # Footprint check on a synthetic high-ndv frame: at fixture SFs user_id
    # has ~15-1500 distinct values, the chunk stays fully dictionary-encoded
    # and parquet-mr CORRECTLY omits the bloom (the dictionary is already an
    # exact membership filter — this is the production behavior, not a
    # bug). A 100k-row/20k-ndv column overflows that path, so the option
    # must produce bitset bytes there or it is being silently dropped.
    wide = spark.range(100000).selectExpr("id", "id % 20000 AS user_id")
    for name, opts in [("nb_plain", {}), ("nb_bloom", {
        "parquet.bloom.filter.enabled#user_id": "true",
        "parquet.bloom.filter.expected.ndv#user_id": "20000",
    })]:
        w = wide.write.mode("overwrite")
        for k, v in opts.items():
            w = w.option(k, v)
        w.parquet(_sink_path(name))
    plain_bytes = sum(
        os.path.getsize(p) for p in glob.glob(_sink_path("nb_plain") + "/*.parquet")
    )
    bloom_bytes = sum(
        os.path.getsize(p) for p in glob.glob(_sink_path("nb_bloom") + "/*.parquet")
    )
    # Proportional, not absolute (r12 ADVICE): an absolute +10000-byte bar
    # is sensitive to parquet-mr version / row-group splits / encoding
    # drift. The bitset for ndv=20000 at default fpp is ~32 KiB against a
    # ~1 MiB file; 0.5% of the plain size (~5 KiB) separates "bitsets
    # written" from encoding jitter at any plausible file size. (This
    # container's PyArrow 16.1 predates bloom-offset metadata exposure —
    # prefer reading offsets from the footer once PyArrow >= 18 is
    # available.)
    assert bloom_bytes > plain_bytes * 1.005, (bloom_bytes, plain_bytes)


def test_zstd_roundtrip_files_carry_zstd_codec(spark, sf_dir):
    """io_parquet_zstd_roundtrip's footer claim: every column chunk of the
    written files reports ZSTD compression (PyArrow reads the footer), so
    the hash-checked round-trip is exercising the real codec path."""
    import glob

    import pyarrow.parquet as pq

    from eviction_lab_etl_spark.operators.scans import _sink_path
    from eviction_lab_etl_spark.registry import QUERIES

    QUERIES["io_parquet_zstd_roundtrip"](spark, sf_dir).count()
    files = glob.glob(_sink_path("lineitem_zstd") + "/*.parquet")
    assert files
    md = pq.ParquetFile(files[0]).metadata
    rg = md.row_group(0)
    codecs = {rg.column(i).compression for i in range(rg.num_columns)}
    assert codecs == {"ZSTD"}, codecs
