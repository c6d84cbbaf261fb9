"""A/B: md5-prefix vs xxhash64 signature families for contam_neardup.

The md5-prefix family exists so the DuckDB oracle can rebuild the banding
byte-for-byte; the r12 verdict priced it as ~4× wider on the wire (md5 hashes
128 bits then parses a 15-hex prefix) and identified the signature build as
contam_neardup's dominant cost. This tool measures that delta directly at
sf0.1: (a) the signature build alone (48 min-hash longs per doc over the
5-gram explosion), (b) the end-to-end registered queries. Warm runs, median
of 3, same session. Output: one JSON line.

Usage: python tools/hashfamily_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eviction_lab_etl_spark import registry
from eviction_lab_etl_spark.session import build_session
from eviction_lab_etl_spark.sources.loader import load


def _median_time(mk, n=3):
    times = []
    for _ in range(n):
        t0 = time.monotonic()
        mk().count()
        times.append(time.monotonic() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all_operators()
    spark = build_session(
        app_name="elspark-hashfamily-ab", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    from eviction_lab_etl_spark.functions.minhash import (
        md5_family,
        minhash_signatures,
        xxhash_family,
    )
    from eviction_lab_etl_spark.operators.extensions import _MH_BANDS, _MH_ROWS
    from eviction_lab_etl_spark.operators.training import _N

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    w = F.split("text", " ")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.when(
                    F.size(w) >= _N,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - (_N - 1)),
                        lambda i: F.array_join(F.slice(w, i, _N), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            )
        ).alias("w"),
    )

    n_hashes = _MH_BANDS * _MH_ROWS
    result = {
        "metric": "hashfamily_ab",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_hashes": n_hashes,
        "sig_build_md5_s": _median_time(
            lambda: minhash_signatures(grams, "doc_id", "w", n_hashes, md5_family)
        ),
        "sig_build_xx_s": _median_time(
            lambda: minhash_signatures(grams, "doc_id", "w", n_hashes, xxhash_family)
        ),
        "e2e_md5_s": _median_time(
            lambda: registry.QUERIES["contam_neardup"](spark, sf_dir)
        ),
        "e2e_xx_s": _median_time(
            lambda: registry.QUERIES["contam_neardup_xx"](spark, sf_dir)
        ),
        # r14: the symmetric MinHash path (dedup_minhash_pairs vs its
        # xxhash64 companion) — same families, word-token shingles.
        "e2e_dedup_md5_s": _median_time(
            lambda: registry.QUERIES["dedup_minhash_pairs"](spark, sf_dir)
        ),
        "e2e_dedup_xx_s": _median_time(
            lambda: registry.QUERIES["dedup_minhash_pairs_xx"](spark, sf_dir)
        ),
    }
    result["sig_speedup"] = round(
        result["sig_build_md5_s"] / max(result["sig_build_xx_s"], 1e-9), 2
    )
    result["e2e_speedup"] = round(
        result["e2e_md5_s"] / max(result["e2e_xx_s"], 1e-9), 2
    )
    result["e2e_dedup_speedup"] = round(
        result["e2e_dedup_md5_s"] / max(result["e2e_dedup_xx_s"], 1e-9), 2
    )
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
