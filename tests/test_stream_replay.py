"""Replay-determinism for the remaining rows-only streaming ops (r12 VERDICT
item 5): fixed multi-batch file-source replays asserting EXACT row sets — not
counts — for the state carried across micro-batches.

Together with tests/test_stream_equivalence.py (watermark-late exact drop set,
dedup exact distinct set) this pins the semantics of all four rows-only
watermark/stateful operators under controlled replays, which is as far as a
non-SQL-expressible operator can be verified without pretending a DuckDB
oracle exists.

The replay protocol: write N parquet files with staged mtimes, read with
``maxFilesPerTrigger=1`` + ``trigger(availableNow=True)`` — Spark's file
source orders batches by mtime, so the batch sequence is deterministic and
each test enumerates exactly what every batch must have contributed.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eviction_lab_etl_spark.sources.loader import load
from eviction_lab_etl_spark.streaming.stream_ops import (
    _run_to_memory,
    _scratch,
    run_daily_upsert,
    stateful_profile,
)


def _staged_files(tmp_path, parts):
    """Write each frame as a single parquet file with strictly increasing
    mtimes; return the source directory for a maxFilesPerTrigger=1 stream."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, part_df in enumerate(parts):
        d = str(tmp_path / f"stage{i}")
        part_df.coalesce(1).write.parquet(d)
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{i}.parquet")
        os.rename(os.path.join(d, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    return src


def test_stateful_counter_multi_batch_exact_prefix_chain(spark, sf_dir, tmp_path):
    """stream_stateful_counter's GroupState across a 3-batch replay: the
    update stream must contain, per user, EXACTLY one row per batch that
    touched the user, with n_events equal to the file-prefix cumulative
    count — the full intermediate state chain, enumerated, not just the
    final snapshot."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    small = events.filter(F.col("user_id") < 12)
    parts = [
        small.filter(F.col("event_id") % 3 == i) for i in range(3)
    ]
    src = _staged_files(tmp_path, parts)

    stream = (
        spark.readStream.schema(small.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    session, table = _run_to_memory(stateful_profile(stream), "update")
    emitted = [
        (r.user_id, r.n_events)
        for r in session.table(table).collect()
    ]

    # Expected chain: per user, the cumulative count after each prefix of
    # the 3 files, one row per file that contained the user.
    per_part = [
        {r.user_id: r.c for r in p.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()}
        for p in parts
    ]
    expected: list[tuple[int, int]] = []
    running: dict[int, int] = {}
    for counts in per_part:
        for uid, c in counts.items():
            running[uid] = running.get(uid, 0) + c
            expected.append((uid, running[uid]))
    assert sorted(emitted) == sorted(expected)
    # And the chain is non-vestigial: some user appears in all 3 batches.
    from collections import Counter

    assert Counter(u for u, _ in expected).most_common(1)[0][1] == 3


def test_foreachbatch_upsert_overwrite_semantics_exact(spark, sf_dir, tmp_path):
    """stream_foreachbatch_upsert's dynamic-partition-overwrite across a
    3-batch replay, with one day deliberately SPLIT across batches 0 and 2:
    the final table must hold, for every day, exactly the LAST-writing
    batch's count for that day — overwrite, not merge — and every other
    day's exact full count. The split day is the distinguishing row: a
    merge-style upsert (or a full recompute) would produce its total count
    and fail this pin."""
    events = load(spark, sf_dir, "events").select("event_id", "ts")
    days = [r.d for r in events.select(F.to_date("ts").alias("d")).distinct().collect()]
    days.sort()
    split_day = days[1]  # planted: appears in batch 0 AND batch 2
    on_day = F.to_date("ts") == F.lit(split_day)
    d0 = events.filter(on_day & (F.col("event_id") % 2 == 0))
    d2 = events.filter(on_day & (F.col("event_id") % 2 == 1))
    rest = events.filter(~on_day)
    parts = [d0, rest, d2]
    assert d0.count() > 0 and d2.count() > 0
    src = _staged_files(tmp_path, parts)

    out_path = _scratch("replay_daily")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    run_daily_upsert(stream, out_path)
    final = {
        (r.od, r.cnt) for r in spark.read.parquet(out_path).collect()
    }

    # Expected: per day, the count contributed by the LAST batch writing it.
    expected: dict = {}
    for p in parts:  # batch order == list order (mtime-staged)
        for r in p.groupBy(F.to_date("ts").alias("od")).agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect():
            expected[r.od] = r.cnt
    assert final == set(expected.items())
    # The split day's pin is the LAST batch's partial, not the day total —
    # the assertion that distinguishes overwrite from merge.
    total_split = d0.count() + d2.count()
    assert expected[split_day] == d2.count() != total_split
