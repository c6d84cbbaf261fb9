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
_QUEUE_AS_OF = 6
_RECHECK_QUEUE: tuple[str, ...] = (
    # --- The one red row from CORRECTNESS_r06 leads (round-6 verdict item 1):
    # agg_collect_sorted ERRORED because its array<string> output column was
    # unhashable on the driver's pandas canonicalizer; the surface is now the
    # canonical concat_ws string (identical information, scalar, hashable).
    "agg_collect_sorted",      # FIXED r7: concat_ws scalar surface
    # --- Round-7 changes/additions:
    "io_orc_roundtrip",        # UPGRADED r7: rows-only -> hash-checked
    "io_bucketed_join",        # UPGRADED r7: rows-only -> hash-checked
    "multimodal_phash_near",   # NEW r7: banded Hamming hd<=k pHash join
    "multimodal_phash_dedup",  # r7: hash stage factored into _phash_frame
    "graph_pagerank",          # r7: persist dropped for ReuseExchange
    "incr_view_maintain",      # r7: null-safe merge keys (eqNullSafe)
    "dedup_minhash_pairs",     # r7: md5_family NULL-propagation fix
    "dedup_minhash_recall",    # r7: md5_family NULL-propagation fix
    "pipeline_corpus_clean",   # UPGRADED r7: rows-only -> full-pipeline hash (md5-family banding oracle)
    # --- Round-7 NEW operators (all oracle-hash-checked):
    "join_bloom_pruned",       # NEW r7: explicit Bloom runtime-filter join
    "join_fuzzy_blocked",      # NEW r7: length-blocked levenshtein<=2 join
    "embed_kmeans_iter",       # NEW r7: exact 2-iteration Lloyd's k-means
    "text_tfidf_topterms",     # NEW r7: integer-quantized TF-IDF top-3
    "incr_compact_roundtrip",  # NEW r7: content-neutral compaction verify
    "pipeline_entity_resolution",  # NEW r7: block->match->cluster->canonical
    "events_streak_islands",   # NEW r7: gaps-and-islands streaks
    "io_schema_evolution",     # NEW r7: mergeSchema additive-column read
    "scalar_variant_shred",    # NEW r7: VARIANT parse_json + typed paths
    "window_skyline_2d",       # NEW r7: distributed 2-phase Pareto skyline
    "ts_ewma_smooth",          # NEW r7: truncated integer EWMA window
    "search_bm25_topk",        # NEW r7: BM25 lexical retrieval top-10
    "io_stats_manifest",       # NEW r7: per-partition zone-map manifest
    "io_csv_roundtrip",        # r7: upgraded rows-only -> source-table hash
    "io_json_lines",           # r7: upgraded rows-only -> source-table hash
    "io_partitioned_write",    # r7: upgraded rows-only -> routing hash
    "incr_scd2_build",         # NEW r7: SCD2 dimension build from change log
    "graph_bfs_layers",        # NEW r7: bounded multi-source BFS layers
    "search_hybrid_rrf",       # NEW r7: BM25 + cosine RRF hybrid retrieval
    "search_mmr_diverse",      # NEW r7: MMR diversified rerank top-5
    "sim_containment_pairs",   # NEW r7: directed >=0.8 containment pairs
    "sim_containment_prefix",  # NEW r7: one-sided prefix-filtered scale path
    "ts_changepoint_shift",    # NEW r7: 7+7-day mean-shift changepoint scan
    "text_mix_entropy",        # NEW r7: per-source language-mix entropy
    "split_cluster_safe",      # NEW r7: near-dup-cluster-safe train split
    "window_skyline_3d",       # NEW r7: d=3 skyline vs quadratic oracle
    "join_skew_salted",        # r7: docstring-only change, re-verify cheap
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
