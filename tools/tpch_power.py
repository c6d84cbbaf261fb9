"""TPC-H-style power run: time every complex_* shape back-to-back at sf0.1.

The classic single-stream "power test" protocol applied to the engine's 21
TPC-H-shape analogs (complex.py + tpch_shapes.py): warm-up run per query, then
median of three timed runs, executed to collect() (result sets are all small —
top-k rows or aggregate groups — so driver materialization is negligible).
Prints one JSON line; paste the summary into PLANS.md by hand.

Usage: python tools/tpch_power.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eviction_lab_etl_spark import registry
from eviction_lab_etl_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all_operators()
    names = sorted(n for n in registry.QUERIES if n.startswith("complex_"))
    spark = build_session(app_name="tpch-power", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name in names:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).collect()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)
    print(
        json.dumps(
            {
                "metric": "tpch_shape_power_run",
                "n_queries": len(names),
                "total_sec": round(sum(timings.values()), 4),
                "queries": timings,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
