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
_QUEUE_AS_OF = 4
_RECHECK_QUEUE: tuple[str, ...] = (
    # Round 5 changes, most-load-bearing first:
    "multimodal_decode",       # real PPM/BMP decoders replace the stub; new oracle
    "multimodal_resize",       # graduated rows-only -> hash-checked resize chain
    "multimodal_audio_decode", # NEW: real RIFF/WAVE PCM decode, hash-checked
    "ann_ivf_recall",          # NEW: sampled-codebook IVF recall, hash-checked
    "sample_stratified",       # graduated rows-only -> salted-digest hash oracle
    "pipeline_corpus_manifest",# window keep-first rewrite (single scan)
    "pipeline_corpus_clean",   # window dedup + persisted tokenize + bcast anti
    "stream_session",          # oracle tie-order + exact-gap boundary fixes
    "stream_session_dynamic",  # same oracle fixes (strict > on running max)
    "stream_session_skewsafe", # NEW: two-phase hot-key sessionization
    "scalar_try_safe",         # name_num now an actual try_cast
    "dedup_cluster_cc",        # fixpoint now confirmed by exact exceptAll
    "incr_ingest_dedup",       # NEW: snapshot-manifest ingest dedup
    "resample_cap_source",     # NEW: per-source frequency capping
    "events_funnel",           # NEW: single-shuffle ordered funnel
    "events_cohort_retention", # NEW: cohort retention matrix
    "complex_sole_discount_supplier",  # NEW: Q21-shape semi+anti self-join
    "complex_idle_customers",  # NEW: Q22-shape scalar-subquery + anti join
    "join_asof_tolerance",     # NEW: tolerance-bounded asof
    "window_first_last",       # NEW: first/last/nth_value full frame
    "agg_mode",                # NEW: deterministic mode composition
    "graph_triangle_count",    # NEW: ordered-edge triangle enumeration
    "text_rarity_score",       # NEW: corpus-relative rarity quality proxy
    "ts_gapfill_locf",         # NEW: calendar gap-fill + LOCF completion
    # --- continued-round-5 additions, priority order. 181 registered queries
    # exceed the driver's ~50-query budget (24 queue + 53 never-verified), so
    # this block pulls the headline late-round work ahead of registration
    # order; the ~12 that spill to the next round are deliberately the
    # simplest surface ops (bitwise/multiset-setops/sorted-collect/xml-text
    # roundtrips/bool-logic/anomaly/degree-hist/transitions/downweight/corr),
    # every one locally sf0.01-verified (tests/test_oracle_diff.py); the
    # post-prioritization additions (snapshot CDF, stream-static join,
    # polymorphic UDTF) spill with them by the same reasoning.
    "complex_late_priority_orders",   # TPC-H family completion (Q4)
    "complex_forecast_revenue",       # Q6
    "complex_nation_volume",          # Q7
    "complex_market_share",           # Q8
    "complex_product_profit",         # Q9
    "complex_cust_order_histogram",   # Q13
    "complex_promo_revenue",          # Q14
    "complex_top_supplier",           # Q15
    "complex_min_cost_supplier",      # Q2
    "complex_important_stock",        # Q11
    "complex_returnflag_priority",    # Q12
    "complex_parts_supplier_cnt",     # Q16
    "complex_disjunctive_revenue",    # Q19
    "complex_excess_share_supplier",  # Q20
    "incr_snapshot_time_travel",      # ACID snapshot commits + time travel
    "stream_snapshot_sink",           # exactly-once streaming sink
    "multimodal_audio_features",      # real PCM feature extraction
    "multimodal_video_motion",        # real frame-stream decode + motion
    "embed_centroid_stats",           # embedding hygiene (quantized sums)
    "embed_norm_hist",                # embedding norm histogram
    "pipeline_dataset_card",          # corpus publishing card
    "sql_top_nations_report",         # pure-SQL user surface
    "pipeline_clean_funnel",          # cleaning survivor accounting
    "text_boilerplate_grams",         # per-source template detection
    "events_rfm_segments",            # RFM quartile segmentation
    "ts_interpolate_linear",          # exact rational interpolation
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
