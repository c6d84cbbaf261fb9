"""Interleaved A/B for `dedup_simhash_pairs`'s two-round upward drift
(round-7 verdict item 5: 0.79 s r3 pin → 0.91 s r6 → ~1.23 s r7 raw).

The query's code is UNCHANGED since r3, so the question is host drift vs a
real in-repo regression. Protocol: ONE session at the bench's
SF/parallelism, then ≥9 ALTERNATING reps of the suspect against a
compute-bound companion (`agg_sum_groupby`) — interleaving means any
host-load swing hits both equally, so the pair of medians separates "host
slow" from "suspect slow".

ROUND-8 FINDING (BASELINE.md "dedup_simhash_pairs re-pin"): on a FAST host
(companion 0.48 s, well under its bench-context 0.59-0.64 s) the suspect
still measured 0.93-1.18 s — so the drift is not host load. The conf
ablation (this session's companion script, logged in BASELINE.md) shows
the query is OVERHEAD-BOUND on its constant 200-doc universe: AQE
replanning alone is ~0.27 s of the wall (0.84 s median with AQE off,
1.11 s on), the signature aggregation is 0.43 s, and single-session
medians range 0.84-1.18 s with individual runs 0.79-2.08 s. Today's
MINIMUM run (0.787 s) equals the r3 pin — the pin was a draw from the
fast tail of that band, not a level the median ever held. Verdict: no
code regression; baseline re-pinned at the measured median (1.03 s) with
this methodology, and the bench now takes extra reps for this query.

Usage: python tools/simhash_ab.py [reps]   (default 9; sf dir/CPUs via the
bench env vars). Emits one JSON line.
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

SUSPECT = "dedup_simhash_pairs"
COMPANION = "agg_sum_groupby"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(f"local[{cpus}]")
    registry.load_all_operators()

    def one(name: str) -> float:
        fn = registry.QUERIES[name]
        start = time.perf_counter()
        fn(spark, sf_dir).collect()
        return time.perf_counter() - start

    # warm both paths (plan + JIT + IO cache), untimed
    one(SUSPECT), one(COMPANION)
    sus, comp = [], []
    for _ in range(reps):
        sus.append(one(SUSPECT))
        comp.append(one(COMPANION))
    m_sus = statistics.median(sus)
    m_comp = statistics.median(comp)
    ratio = m_sus / m_comp
    print(
        json.dumps(
            {
                "metric": "simhash_ab",
                "reps": reps,
                "sf_dir": sf_dir,
                "suspect_median": round(m_sus, 4),
                "companion_median": round(m_comp, 4),
                "ratio": round(ratio, 3),
                "suspect_runs": [round(x, 4) for x in sus],
                "companion_runs": [round(x, 4) for x in comp],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
