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
_QUEUE_AS_OF = 11
_RECHECK_QUEUE: tuple[str, ...] = (
    # --- Round-12 fold-table widening (cleaning._FOLD_1TO1/_EXPAND/_COMBINING
    # grew from the 4-char demo to full Latin-1 + Latin Extended-A + NFKC
    # full-width/ligature/ß + combining-mark deletion; fixtures.documents_messy
    # plants a case per fold class, so BOTH sides of each hash changed):
    "text_normalize_unicode",
    "dedup_exact_normalized",
    "contam_normalized",        # oracle now imports cleaning._NORM_SQL
    # --- Round-12 overflow hardening (Spark-side products now DECIMAL(38,0);
    # values identical inside the old envelope, expression changed):
    "text_pmi_collocations",
    # --- Round-12 new operator (never driver-checked): hash-checked batch
    # companion for the rows-only stream_static_enrich
    "stream_static_enrich_batch",
    # --- Round-12 changed plan (top-k leg drops the unused exact-distance
    # fold via _sq8_scored(with_exact=False); values unchanged):
    "search_sq8_topk",
    # --- Round-12 new operators (never driver-checked): two-stage SQ8 +
    # exact rerank retrieval
    "search_sq8_rerank",
    "search_sq8_rerank_recall",
    # --- Round-12 new operators: corpus-wide line dedup, KMV/theta sketch,
    # near-dup decontamination, trained NB quality gate
    "dedup_lines_global",
    "sketch_theta_kmv",
    "contam_neardup",
    "text_quality_classifier",
    "ts_seasonal_profile",
    "search_rp_topk",
    "search_rp_recall",
    "join_asof_nearest",
    "sketch_kmv_partitioned",
    "contam_span_remove",
    "prune_prototypes",
    # --- Round-12 third batch (never driver-checked): the URL stage, OHLC
    # bars, nucleus vocab cut, budget apportionment, source interleave
    "web_url_canonicalize",
    "dedup_url_keep_first",
    "web_domain_cap",
    "ts_resample_ohlc",
    "text_vocab_nucleus",
    "mix_budget_alloc",
    "pack_interleave_sources",
    # --- Round-12 fourth batch (never driver-checked): filtered retrieval,
    # last-touch attribution, count-frame exact median
    "search_filtered_topk",
    "events_attribution_last_touch",
    "agg_median_countframe",
    # --- Round-12 fifth batch (never driver-checked): URL scalar parts, the
    # web-ingest funnel composition, windowed top-k, parquet bloom round-trip
    "scalar_url_parts",
    "pipeline_web_ingest",
    "stream_tumbling_topk",
    "io_parquet_bloom_roundtrip",
    # --- Round-12 sixth batch (never driver-checked): epoch decomposition of
    # the mixture table, clickstream path mining
    "mix_epoch_plan",
    "events_top_paths",
    # --- Round-12 seventh batch (never driver-checked): immutable snapshot
    # tags, grid-index nearest-region assignment
    "incr_snapshot_tag_read",
    "geo_knn_grid",
    # --- Round-12 eighth batch (never driver-checked): sliding distinct
    # cardinality, intra-video keyframe extraction
    "stream_sliding_distinct",
    "multimodal_video_keyframes",
    # --- Round-12 ninth batch (never driver-checked): prefix-truncated
    # (Matryoshka) retrieval + its recall companion
    "search_matryoshka_topk",
    "search_matryoshka_recall",
    # --- Round-12 tenth item (never driver-checked): ZSTD codec round-trip
    "io_parquet_zstd_roundtrip",
    # --- Round-12 capstone (never driver-checked): mixture-plan realization,
    # DAU/WAU stickiness via coverage expansion
    "resample_epoch_realize",
    "events_dau_wau",
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
