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
_QUEUE_AS_OF = 15
_RECHECK_QUEUE: tuple[str, ...] = (
    # --- Round-16 changed queries (optimization round 2): the near-dup
    # family gained bounded-lifetime pins and a distributed dense-rank
    # dictionary in token_bitsets (values invariant under the id
    # bijection, but the physical plan changed substantially), and the
    # banded-Hamming expansion gained the latent-case guards from r15
    # ADVICE items 1–2. All re-verified locally by full-value oracle diff
    # at sf0.001 + sf0.01 and a vanilla-session probe; queued so the
    # driver re-pins the hashes first.
    "dedup_minhash_pairs",
    "dedup_minhash_recall",
    "sim_jaccard_prefix",
    "sim_containment_prefix",
    "sim_containment_pairs",
    "pipeline_corpus_clean",
    "sim_ann_lsh_recall",
    "multimodal_video_neardup",
    "multimodal_phash_near",
    "multimodal_audio_neardup",
    # (dedup_minhash_pairs_xx also changed but is rows-only by design; it
    # rejoins via the fresh tier if its r15 record goes stale.)
    #
    # The r15 rotation tranche (47 names) was hand-removed this round: all
    # 47 verified green in CORRECTNESS_r15 (checked programmatically), and
    # with _QUEUE_AS_OF now 15 the self-retire rule (> 15) would not have
    # released them. Leftover budget after this queue rotates through the
    # oldest-verified greens automatically (_ordered tier 3).
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
