"""Z-order pruning A/B (SCALE.md evidence): the same 2-D box query against
three physical layouts of the SAME rows, graded by how many files a
zone-map (per-file min/max) lets the scan skip.

Three QUERY SHAPES per layout — a 10%% range on o_custkey alone, on
o_totalprice alone, and their 2-D box — because that is what z-order is
FOR: a single-column sort is optimal on its own column and BLIND on every
other, while the curve bounds pruning on all clustered columns at once.
The grade is the worst case across shapes (an ad-hoc workload hits all).

Layouts (64 files each, identical row sets):
  random  — repartition(64) hash-random: the no-clustering baseline;
  linear  — repartitionByRange on o_custkey: 1-D clustering (what
            write_range_partitioned gives) — prunes on the sorted column,
            blind on the other;
  zorder  — plans/layout.zorder_write on (o_custkey, o_totalprice):
            curve-clustered so EVERY clustered column has narrow per-file
            ranges.

The box is the middle ~10% of each dimension's value range. "files kept" =
files whose (min, max) envelope intersects the box on BOTH columns —
exactly the pruning a parquet reader's footer stats (or io_stats_manifest's
zone map) perform; deterministic, no timing noise. Row counts are asserted
identical across layouts so the A/B compares layouts, not results.

Usage: python tools/zorder_ab.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from eviction_lab_etl_spark.plans.layout import zorder_write  # noqa: E402
from eviction_lab_etl_spark.session import build_session  # noqa: E402
from eviction_lab_etl_spark.sources.loader import load  # noqa: E402

N_FILES = 64


def kept_files(spark, path, lo_c, hi_c, lo_p, hi_p):
    """Per query shape (custkey-only, price-only, 2-D box): files whose
    per-file (min,max) envelope intersects the predicate — the zone-map
    pruning a parquet footer gives — plus the box row count (result-set
    invariance check across layouts)."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    zone = df.groupBy("__f").agg(
        F.min("o_custkey").alias("c0"), F.max("o_custkey").alias("c1"),
        F.min("o_totalprice").alias("p0"), F.max("o_totalprice").alias("p1"),
    ).collect()
    c_hit = lambda z: z.c1 >= lo_c and z.c0 <= hi_c
    p_hit = lambda z: z.p1 >= lo_p and z.p0 <= hi_p
    kept = {
        "custkey": sum(1 for z in zone if c_hit(z)),
        "price": sum(1 for z in zone if p_hit(z)),
        "box": sum(1 for z in zone if c_hit(z) and p_hit(z)),
    }
    rows = df.filter(
        F.col("o_custkey").between(lo_c, hi_c)
        & F.col("o_totalprice").between(lo_p, hi_p)
    ).count()
    return kept, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("zorder-ab")
    spark.sparkContext.setLogLevel("ERROR")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]
    c_lo, c_hi, p_lo, p_hi = stats
    box = lambda lo, hi: (lo + 0.45 * (hi - lo), lo + 0.55 * (hi - lo))
    lo_c, hi_c = box(c_lo, c_hi)
    lo_p, hi_p = box(p_lo, p_hi)

    root = tempfile.mkdtemp(prefix="zorder_ab_")
    out = {"metric": "zorder_pruning_ab", "n_files": N_FILES, "sf": sf_dir}
    try:
        p_rand = os.path.join(root, "random")
        orders.repartition(N_FILES).write.mode("overwrite").parquet(p_rand)
        p_lin = os.path.join(root, "linear")
        orders.repartitionByRange(N_FILES, "o_custkey").write.mode(
            "overwrite"
        ).parquet(p_lin)
        p_z = os.path.join(root, "zorder")
        zorder_write(
            orders, ["o_custkey", "o_totalprice"], p_z, n_files=N_FILES
        )
        rows = set()
        for name, path in (("random", p_rand), ("linear", p_lin), ("zorder", p_z)):
            k, r = kept_files(spark, path, lo_c, hi_c, lo_p, hi_p)
            out[f"files_kept_{name}"] = k
            out[f"worst_kept_{name}"] = max(k.values())
            rows.add(r)
        assert len(rows) == 1, f"layouts disagree on box rows: {rows}"
        out["box_rows"] = rows.pop()
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
