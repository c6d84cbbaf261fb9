"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``eviction_lab_etl_spark`` (SURVEY.md §2 inventory);
this module is a thin adapter.
"""

from __future__ import annotations

import glob
import json
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

# Queries whose implementation OR oracle changed since their last driver run,
# plus any prior hash-match that was vacuous (0 rows proves nothing). These
# are yielded FIRST so the driver's budget-bounded prefix re-checks exactly
# the code most likely to have regressed — the prior "verified" status
# attaches to deleted code and must not count.
#
# The queue SELF-RETIRES: a name leaves it (and rejoins the verified pool)
# once an artifact from a round NEWER than _QUEUE_AS_OF verifies it, so a
# stale queue can never burn a later round's budget re-checking green rows.
# Bump _QUEUE_AS_OF to the highest CORRECTNESS_r*.json round present whenever
# the queue is edited.
_QUEUE_AS_OF = 5
_RECHECK_QUEUE: tuple[str, ...] = (
    # --- The 21 queries that have NEVER appeared in any CORRECTNESS_r*.json
    # (round-5 verdict "What's missing" #1): the ~50-query budget deferred
    # them behind headline work for two rounds; they lead round 6 so every
    # registered query finally carries a driver record. All 21 pass the same
    # oracle diff locally (tests/test_oracle_diff.py) — this closes the gap
    # between "done locally" and "done". The two newest Python-boundary
    # surfaces go first (verdict item 6: cogroup + polymorphic UDTF are the
    # last unverified edges of the Arrow-boundary claim in PLANS.md).
    "udf_cogrouped_map",       # cogrouped applyInPandas boundary
    "udtf_dynamic_schema",     # polymorphic (analyze-time schema) UDTF
    "sim_cross_lang_pairs",    # cross-language near-dup detection
    "resample_downweight_dups",# soft dedup via duplicate-count weights
    "sample_weighted_priority",# priority sampling (+ r6 weight/NULL guard)
    "join_scd2_point_in_time", # SCD2 as-of dimension resolution
    "stream_static_enrich",    # stream-static broadcast enrich (rows-only)
    "incr_snapshot_cdf",       # change-data-feed between snapshot versions
    "events_pareto_concentration",  # activity-concentration report
    "events_type_transitions", # first-order type-transition matrix
    "ts_anomaly_mad",          # MAD-based anomaly flags
    "agg_percentiles_by_lang", # exact per-stratum percentiles (cogroup)
    "agg_corr_components",     # correlation from integer component sums
    "agg_bool_logic",          # bool_and/bool_or/count_if family
    "agg_collect_sorted",      # deterministic collect_list surface
    "graph_degree_hist",       # degree histogram (graph summary)
    "scalar_bitwise",          # bit ops + aggregate XOR parity
    "setop_except_all",        # multiset EXCEPT ALL
    "setop_intersect_all",     # multiset INTERSECT ALL
    "io_text_roundtrip",       # whole-file text source round-trip
    "io_xml_roundtrip",        # XML source round-trip
    # --- Round-6 changes/additions (modest on purpose — 34 queue entries
    # leave ~16 budget slots rotating through the oldest-verified greens):
    "sim_jaccard_prefix",      # NEW: prefix-filtered set-similarity join,
                               # unbounded doc range (retires the r5 weak mark)
    "contam_ngram_hashed",     # NEW: hashed-gram knob, hash-checked vs exact spec
    "export_shard_manifest",   # NEW: content-hash training-export sharding
    "multimodal_phash_dedup",  # NEW: perceptual dHash image near-dup
    "incr_view_maintain",      # NEW: CDF-driven incremental view maintenance
    "graph_pagerank",          # NEW: fixed-point integer PageRank (exact)
    "dedup_minhash_pairs",     # NEW: hash-checked MinHash-LSH banding (shared
                               # md5 family — oracle reproduces the banding)
    "dedup_minhash_recall",    # NEW: banding recall vs exact PPJoin, 1 row
    "join_skew_salted",        # NEW: salted-join construction ≡ plain join
    "layout_zorder_key",       # NEW: exact Morton key ≡ SQL bit lattice
    "io_range_partitioned",    # NEW: range-clustered write + pruned read-back
    "stream_snapshot_sink",    # commit path now txn-idempotent at protocol level
    "stream_session_skewsafe", # now routed through the sessionize() entry point
)


def _artifact_status() -> dict[str, tuple[int, bool]]:
    """Per query name: (newest driver round that recorded it, whether THAT
    newest record verifies it). Latest-round-wins: a newer hash-fail or
    error DEMOTES every older green, so a regressed query re-enters the
    early re-check pool without anyone hand-editing the queue. Verified =
    value-hash matched over >0 Spark rows (a match over the empty set
    proves nothing) or rows-only by SURVEY design (err == "no_oracle")."""
    status: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
        try:
            round_no = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            round_no = 0
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            ok = (rec.get("spark_rows") or 0) > 0 and (
                rec.get("hash_match") is True or rec.get("err") == "no_oracle"
            )
            prev = status.get(name)
            if prev is None or round_no >= prev[0]:
                status[name] = (round_no, ok)
    return status


def _verified_latest() -> dict[str, int]:
    """name -> round of its most recent verification, restricted to names
    whose most recent driver record IS that verification."""
    return {n: r for n, (r, ok) in _artifact_status().items() if ok}


def _ordered(names: list[str]) -> list[str]:
    """Driver-facing order: (1) the re-check queue (changed queries), minus
    entries a round newer than _QUEUE_AS_OF already re-verified, (2) queries
    never verified — or whose NEWEST driver record failed, (3) the verified
    remainder, oldest verification first, so leftover budget rotates through
    the greens that have gone longest without a driver check instead of
    re-confirming last round's rows. (Local tests re-verify everything every
    run — tests/test_oracle_diff.py.)"""
    verified = _verified_latest()
    retired = {n for n, r in verified.items() if r > _QUEUE_AS_OF}
    queue = [n for n in _RECHECK_QUEUE if n in names and n not in retired]
    vset = set(verified) - set(queue)
    fresh = [n for n in names if n not in vset and n not in queue]
    idx = {n: i for i, n in enumerate(names)}
    prior = sorted(
        (n for n in names if n in vset), key=lambda n: (verified[n], idx[n])
    )
    return queue + fresh + prior


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1) on sf0.001; driver checks rows>0."""
    return registry.QUERIES[_FLAGSHIP](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: registry.QUERIES[name] for name in _ordered(list(registry.QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every hash-checked operator."""
    return {name: registry.ORACLES[name] for name in _ordered(list(registry.ORACLES))}
