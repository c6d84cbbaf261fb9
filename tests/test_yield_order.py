"""Unit tests for the driver yield order (__spark_entry__._ordered): the
re-check queue leads, never-verified queries follow, verified ones trail —
and queue entries self-retire once an artifact newer than _QUEUE_AS_OF
verifies them (otherwise a stale queue burns later rounds' budget)."""

from __future__ import annotations

import importlib
import json
import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod


def _reload_with_artifacts(tmp_path, monkeypatch, artifacts):
    for fname, data in artifacts.items():
        (tmp_path / fname).write_text(json.dumps(data))
    monkeypatch.setattr(entry_mod, "_REPO_DIR", str(tmp_path))
    return entry_mod


def test_queue_leads_then_fresh_then_verified(tmp_path, monkeypatch):
    e = _reload_with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r01.json": {
                "verified_q": {"hash_match": True, "spark_rows": 3, "err": None},
                "vacuous_q": {"hash_match": True, "spark_rows": 0, "err": None},
            }
        },
    )
    monkeypatch.setattr(e, "_RECHECK_QUEUE", ("queued_q",))
    monkeypatch.setattr(e, "_QUEUE_AS_OF", 1)
    names = ["verified_q", "fresh_q", "queued_q", "vacuous_q"]
    got = e._ordered(names)
    # queued first; vacuous (0-row hash match) counts as fresh, not verified.
    assert got[0] == "queued_q"
    assert set(got[1:3]) == {"fresh_q", "vacuous_q"}
    assert got[3] == "verified_q"


def test_queue_entry_retires_after_newer_round(tmp_path, monkeypatch):
    e = _reload_with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r01.json": {
                "queued_q": {"hash_match": True, "spark_rows": 3, "err": None},
            },
            "CORRECTNESS_r03.json": {
                "queued_q": {"hash_match": True, "spark_rows": 3, "err": None},
                "rows_q": {"hash_match": None, "spark_rows": 9, "err": "no_oracle"},
            },
        },
    )
    monkeypatch.setattr(e, "_RECHECK_QUEUE", ("queued_q", "still_queued_q"))
    monkeypatch.setattr(e, "_QUEUE_AS_OF", 2)
    names = ["queued_q", "still_queued_q", "rows_q", "fresh_q"]
    got = e._ordered(names)
    # r03 > as-of 2 verified queued_q -> retired to the verified tail;
    # still_queued_q has no newer row -> stays at the front.
    assert got[0] == "still_queued_q"
    assert got[1] == "fresh_q"
    assert set(got[2:]) == {"queued_q", "rows_q"}


def test_old_rounds_do_not_retire_queue(tmp_path, monkeypatch):
    e = _reload_with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r02.json": {
                "queued_q": {"hash_match": True, "spark_rows": 3, "err": None},
            },
        },
    )
    monkeypatch.setattr(e, "_RECHECK_QUEUE", ("queued_q",))
    monkeypatch.setattr(e, "_QUEUE_AS_OF", 2)
    # The r02 row is exactly the one the queue distrusts (code changed after
    # it) — it must NOT retire the entry.
    assert e._ordered(["queued_q", "other_q"])[0] == "queued_q"


def test_latest_round_failure_demotes_old_green(tmp_path, monkeypatch):
    # A query verified in r01 whose r03 record hash-FAILS must leave the
    # verified tail and sort with the fresh (distrusted) bucket — no manual
    # queue edit required.
    e = _reload_with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r01.json": {
                "regressed_q": {"hash_match": True, "spark_rows": 3, "err": None},
                "stable_q": {"hash_match": True, "spark_rows": 3, "err": None},
            },
            "CORRECTNESS_r03.json": {
                "regressed_q": {"hash_match": False, "spark_rows": 3, "err": None},
            },
        },
    )
    monkeypatch.setattr(e, "_RECHECK_QUEUE", ())
    got = e._ordered(["stable_q", "regressed_q", "fresh_q"])
    assert got == ["regressed_q", "fresh_q", "stable_q"]


def test_verified_tail_rotates_oldest_first(tmp_path, monkeypatch):
    # Leftover driver budget should hit the greens that have gone longest
    # without a check: the tail sorts by round-of-last-verification ascending,
    # not registry order.
    e = _reload_with_artifacts(
        tmp_path,
        monkeypatch,
        {
            "CORRECTNESS_r01.json": {
                "old_green": {"hash_match": True, "spark_rows": 3, "err": None},
            },
            "CORRECTNESS_r02.json": {
                "mid_green": {"hash_match": None, "spark_rows": 9, "err": "no_oracle"},
            },
            "CORRECTNESS_r03.json": {
                "new_green": {"hash_match": True, "spark_rows": 3, "err": None},
            },
        },
    )
    monkeypatch.setattr(e, "_RECHECK_QUEUE", ())
    got = e._ordered(["new_green", "mid_green", "old_green"])
    assert got == ["old_green", "mid_green", "new_green"]


def test_real_registry_order_is_complete_and_deduped():
    importlib.reload(entry_mod)
    names = list(entry_mod.queries())
    assert len(names) == len(set(names))
    from eviction_lab_etl_spark import registry

    assert set(names) == set(registry.QUERIES)
