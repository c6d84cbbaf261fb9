"""Batch≡stream equality for the watermarked streaming operators (round-4
advice item 4): not rows>0 smoke, but exact set equality with the batch
companion, with the late/withheld rows enumerated explicitly.

Three guarantees:

1. `stream_watermark_late`'s ordered full replay equals the batch tumbling
   daily counts minus exactly the watermark-withheld tail day.
2. An out-of-order multi-batch replay where the last file arrives entirely
   below the watermark drops every late row: the streamed result equals the
   batch aggregate over the on-time files alone (minus the watermark tail),
   late days never appear, and the state operator's drop counter accounts
   for every late partial aggregate.
3. `stream_dedup_watermark` over a corpus with planted duplicate event_ids
   emits exactly the distinct id set, each id exactly once.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eviction_lab_etl_spark.registry import QUERIES
from eviction_lab_etl_spark.sources.loader import load
from eviction_lab_etl_spark.streaming.stream_ops import _run_to_memory, _scratch

ONE_HOUR_US = 3_600_000_000


def _daily_counts(df):
    return {
        (r.wstart, r.cnt)
        for r in df.groupBy(F.to_date("ts").alias("wstart"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }


def test_stream_watermark_late_equals_batch_minus_tail(spark, sf_dir):
    """Ordered replay: nothing is late, so the only batch/stream difference
    is the final day window, which the 1-hour watermark cannot finalize at
    end-of-stream (wm = max_ts - 1h < end of max_ts's day, always)."""
    events = load(spark, sf_dir, "events")
    batch = _daily_counts(events)
    max_day = max(d for d, _ in batch)
    withheld = {(d, c) for d, c in batch if d == max_day}
    streamed = {
        (r.wstart, r.cnt)
        for r in QUERIES["stream_watermark_late"](spark, sf_dir).collect()
    }
    assert streamed == batch - withheld
    assert len(withheld) == 1  # the tail day, enumerated, nothing else


def test_out_of_order_replay_drops_late_rows(spark, sf_dir, tmp_path):
    """Out-of-order arrival: two on-time files first (newer half of events),
    then a file of rows >= 2h older than the split. Spark tracks TWO
    watermarks per batch — eviction uses the value from the previous batch,
    but LATE-EVENT FILTERING uses the value from the batch before that (the
    late watermark lags one batch) — so the late file must arrive at batch
    index >= 2 for the drop to be observable. The streamed result must equal
    the batch daily counts of the on-time files minus the withheld tail day,
    the dropped-row counter must equal the late file's row count exactly,
    and no late day may leak into the output."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    tail = F.lit("2024-01-30 00:00:00").cast("timestamp")
    f0 = events.filter((F.col("ts") >= split) & (F.col("ts") < tail))
    f1 = events.filter(F.col("ts") >= tail)
    late = events.filter(F.col("ts") < split - F.expr("INTERVAL 2 HOURS"))
    n_late = late.count()
    assert n_late > 100  # the late set is substantial, not vestigial

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, part_df in enumerate([f0, f1, late]):
        d = str(tmp_path / f"stage{i}")
        part_df.coalesce(1).write.parquet(d)
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{i}.parquet")
        os.rename(os.path.join(d, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.to_date("w.start").alias("wstart"), "cnt")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop_test")
        .outputMode("append")
        .option("checkpointLocation", _scratch("ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    streamed = {
        (r.wstart, r.cnt) for r in spark.table("late_drop_test").collect()
    }

    on_time_daily = _daily_counts(f0.unionByName(f1))
    max_day = max(d for d, _ in on_time_daily)
    expected = {(d, c) for d, c in on_time_daily if d != max_day}
    assert streamed == expected
    late_days = {
        r.d for r in late.select(F.to_date("ts").alias("d")).distinct().collect()
    }
    # The watermark drop happens AFTER map-side partial aggregation, so the
    # state operator's counter sees one partial-agg row per late day, not one
    # per late input row: the counter equaling the late-day count proves
    # every late day's partial aggregate was discarded at the state store.
    assert dropped == len(late_days)
    assert late_days  # enumerated late days...
    assert not late_days & {d for d, _ in streamed}  # ...never surface


def test_stream_dedup_watermark_exact_distinct_set(spark, sf_dir, tmp_path):
    """Planted duplicates (same event_id, +10 min) must be suppressed within
    the watermark: the emitted ids are exactly the distinct set, each once."""
    events = (
        load(spark, sf_dir, "events")
        .select("event_id", "ts")
        .filter(F.col("event_id") < 2000)
    )
    dups = events.filter(F.col("event_id") < 100).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 10 MINUTES")
    )
    src = str(tmp_path / "src")
    events.unionByName(dups).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    session, table = _run_to_memory(deduped, "append")
    emitted = [r.event_id for r in session.table(table).collect()]
    expected = {r.event_id for r in events.select("event_id").collect()}
    assert len(emitted) == len(expected)  # each id exactly once, dups gone
    assert set(emitted) == expected
