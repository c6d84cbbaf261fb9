"""Interleaved A/B for TPC-H power topologies flagged >1.5x their r6 base
(r10 verdict: complex_small_qty_revenue 2.12, complex_sole_discount_supplier
2.35, complex_top_supplier 2.47 — raw; ~1.59/1.77/1.85 after dividing out the
run's 1.331 fleet ratio).

None of complex.py/tpch_shapes.py changed in r10, so the question is host
drift vs a real regression — answered with the r8 dedup_simhash_pairs
methodology (tools/simhash_ab.py): ONE session at the bench's SF/parallelism,
then alternating reps of each suspect against a compute-bound companion
(`agg_sum_groupby`, baseline 0.787 s at sf0.1). Interleaving means any host
swing hits both equally: if suspect_median / its r6 base tracks
companion_median / companion base, the drift is the host; a suspect ratio
far above the companion's is a real slowdown to fix or re-pin.

Usage: python tools/tpch_ab.py [reps] [suspect ...]
(default 9 reps; default suspects = the three r10-flagged topologies; sf
dir/CPUs via the bench env vars). Emits one JSON line per suspect.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eviction_lab_etl_spark import registry  # noqa: E402
from eviction_lab_etl_spark.session import build_session  # noqa: E402

COMPANION = "agg_sum_groupby"
COMPANION_BASE = 0.787  # BASELINE.md, sf0.1 warm
DEFAULT_SUSPECTS = [
    "complex_small_qty_revenue",
    "complex_sole_discount_supplier",
    "complex_top_supplier",
]
R6_BASE = {  # bench.py TPCH_BASE_SEC (suspects + non-flagged controls)
    "complex_small_qty_revenue": 0.50,
    "complex_sole_discount_supplier": 0.82,
    "complex_top_supplier": 0.34,
    # controls: multi-join topologies that did NOT flag in r10 — if these
    # also run ~1.4x their r6 pins on the same session, the shift is
    # host-class shuffle overhead, not a query-specific regression
    "complex_returned_revenue": 0.61,
    "complex_market_share": 0.82,
    # r12: important_stock promoted from implicit to listed — it and
    # market_share are this round's SUSPECTS (flagged by the driver's
    # family-norm two rounds running; r11 only ever ran market_share as a
    # CONTROL), with returned_revenue/min_cost_supplier as the controls.
    "complex_important_stock": 0.58,
    "complex_min_cost_supplier": 1.03,
    "complex_parts_supplier_cnt": 0.52,
    # non-tpch suspects (BASELINE_SEC pins) the A/B protocol also serves:
    # r15 re-pin (BASELINE.md "r15 A/B"): stable 0.92x paired ratio vs the
    # companion across three host conditions; the r5 seed was a fast-tail
    # draw.
    "events_type_transitions": 0.72,
    # r14 re-pins (BASELINE.md "r14 small-pin A/B"): both rows' original
    # seeds were fast-tail draws; these are the measured medians from this
    # tool's own 11-rep interleaved runs.
    "incr_snapshot_time_travel": 1.32,
    "pipeline_corpus_manifest": 0.60,
}


def main() -> None:
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 9
    suspects = [a for a in args if not a.isdigit()] or DEFAULT_SUSPECTS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Replicate bench.py's session EXACTLY (master + shuffle_partitions=cores):
    # the r6 bases were measured under these confs, and the suspects are
    # shuffle-heavy — comparing a 200-partition run against a 32-partition pin
    # measures task-scheduling overhead, not the query (this tool's first run
    # did exactly that; see BASELINE.md "tpch_power A/B").
    spark = build_session(
        app_name="elspark-tpch-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    registry.load_all_operators()

    def one(name: str) -> float:
        fn = registry.QUERIES[name]
        start = time.perf_counter()
        fn(spark, sf_dir).collect()
        return time.perf_counter() - start

    one(COMPANION)  # warm companion path once, untimed
    for suspect in suspects:
        one(suspect)  # warm suspect path, untimed
        sus, comp = [], []
        for _ in range(reps):
            sus.append(one(suspect))
            comp.append(one(COMPANION))
        m_sus = statistics.median(sus)
        m_comp = statistics.median(comp)
        host = m_comp / COMPANION_BASE
        vs_base = m_sus / R6_BASE[suspect] if suspect in R6_BASE else None
        print(
            json.dumps(
                {
                    "metric": "tpch_ab",
                    "suspect": suspect,
                    "reps": reps,
                    "sf_dir": sf_dir,
                    "suspect_median": round(m_sus, 4),
                    "companion_median": round(m_comp, 4),
                    "host_factor": round(host, 3),
                    "vs_r6_base": round(vs_base, 3) if vs_base else None,
                    "vs_r6_host_normalized": (
                        round(vs_base / host, 3) if vs_base else None
                    ),
                    "suspect_runs": [round(x, 4) for x in sus],
                    "companion_runs": [round(x, 4) for x in comp],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
