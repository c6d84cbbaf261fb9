"""ACID properties of the snapshot table format (sources/snapshot.py).

The oracle-checked query (incr_snapshot_time_travel) proves commit +
time-travel VALUES; these tests pin the protocol-level guarantees the value
check can't see: atomic version claims under writer races, reader isolation
across later commits, and crash-leftover invisibility."""

from __future__ import annotations

import json
import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from eviction_lab_etl_spark.sources.snapshot import CommitConflict, SnapshotTable


@pytest.fixture()
def table():
    t = SnapshotTable(
        os.path.join(tempfile.gettempdir(), f"elspark_snaptest_{uuid.uuid4().hex[:8]}")
    )
    yield t
    t.drop()


def _frame(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def test_append_replace_and_time_travel(spark, table):
    table.append(_frame(spark, 0, 10))
    table.append(_frame(spark, 10, 15))
    assert table.latest_version() == 2
    assert table.read(spark, version=1).count() == 10
    assert table.read(spark, version=2).count() == 15
    table.replace(_frame(spark, 0, 3))
    assert table.latest_version() == 3
    assert table.read(spark).count() == 3
    # time travel: historical versions unchanged by the replace
    assert table.read(spark, version=2).count() == 15


def test_reader_isolation_across_commits(spark, table):
    table.append(_frame(spark, 0, 10))
    pinned_files = table.files(1)
    df = spark.read.parquet(*pinned_files)  # reader opened at v1
    table.replace(_frame(spark, 0, 2))
    table.append(_frame(spark, 100, 104))
    # The v1 reader still sees exactly v1's rows: its files are immutable
    # and never deleted by later commits.
    assert df.count() == 10
    assert sorted(r.k for r in df.collect()) == list(range(10))


def test_version_claim_is_atomic(spark, table):
    """Two writers staging against the same parent: exactly one claims v2,
    the retry lands on v3, and both commits' rows survive (append mode)."""
    table.append(_frame(spark, 0, 5))
    files_a = table._write_data(_frame(spark, 10, 12))
    files_b = table._write_data(_frame(spark, 20, 23))
    parent = table.latest_version()
    base = table.manifest(parent)["files"]
    table._claim(
        {"version": 2, "parent": 1, "mode": "append", "files": base + files_a}, 2
    )
    with pytest.raises(CommitConflict):
        table._claim(
            {"version": 2, "parent": 1, "mode": "append", "files": base + files_b}, 2
        )
    # the losing writer's retry path (what _commit does): re-read head, rebase
    table._claim(
        {
            "version": 3,
            "parent": 2,
            "mode": "append",
            "files": table.manifest(2)["files"] + files_b,
        },
        3,
    )
    assert table.read(spark).count() == 5 + 2 + 3


def test_concurrent_appends_via_public_api(spark, table):
    table.append(_frame(spark, 0, 5))
    table.append(_frame(spark, 5, 8))
    table.append(_frame(spark, 8, 12))
    assert table.latest_version() == 3
    assert sorted(r.k for r in table.read(spark).collect()) == list(range(12))


def test_crash_leftovers_are_invisible(spark, table):
    table.append(_frame(spark, 0, 4))
    # a crashed writer's staged manifest (never claimed) and orphan data dir
    stale = os.path.join(table.root, "manifests", ".tmp-deadbeef.json")
    with open(stale, "w") as fh:
        json.dump({"version": 99, "files": ["data/orphan/file.parquet"]}, fh)
    os.makedirs(os.path.join(table.root, "data", "orphan"), exist_ok=True)
    assert table.latest_version() == 1
    assert table.read(spark).count() == 4


def test_empty_table_read_raises(spark, table):
    with pytest.raises(ValueError):
        table.read(spark)


def test_compact_preserves_content_and_history(spark, table):
    table.append(_frame(spark, 0, 6).repartition(4))
    table.append(_frame(spark, 6, 9).repartition(3))
    assert len(table.files(2)) >= 5  # genuinely fragmented before compaction
    v = table.compact(spark, target_files=1)
    assert v == 3 and len(table.files(3)) == 1
    assert sorted(r.k for r in table.read(spark).collect()) == list(range(9))
    # history intact after the swap
    assert table.read(spark, version=1).count() == 6


def test_vacuum_removes_only_unclaimed_orphans(spark, table):
    table.append(_frame(spark, 0, 4))
    table.compact(spark)
    # a crashed writer's data files, never claimed by any manifest
    orphans = table._write_data(_frame(spark, 100, 105))
    orphan_dir = os.path.join(table.root, os.path.dirname(orphans[0]))
    assert os.path.isdir(orphan_dir)
    # default retention window protects files this young (they could be an
    # in-flight writer about to claim) ...
    assert table.vacuum() == []
    assert os.path.isdir(orphan_dir)
    # ... an expired window reaps them — data files, _SUCCESS/.crc sidecars,
    # and the now-empty uuid directory itself (no unbounded dir accumulation)
    deleted = table.vacuum(min_age_s=0)
    assert sorted(deleted) == sorted(orphans)
    assert not os.path.exists(orphan_dir)
    # every retained version still reads (no referenced file was touched,
    # and referenced dirs keep their sidecars)
    assert table.read(spark, version=1).count() == 4
    assert table.read(spark, version=2).count() == 4


def test_vacuum_reclaims_mid_write_temporary_tree(spark, table):
    """A writer that crashes DURING df.write.parquet leaves Spark's nested
    ``_temporary/`` task-attempt tree — directories, not flat files. Vacuum
    must reclaim the whole orphan tree (not trip on the subdirectory), while
    the retention window still protects it when young."""
    table.append(_frame(spark, 0, 4))
    crash_dir = os.path.join(table.root, "data", "deadbeefcafe")
    tmp_tree = os.path.join(crash_dir, "_temporary", "0", "task_001")
    os.makedirs(tmp_tree)
    with open(os.path.join(tmp_tree, "part-00000.snappy.parquet"), "wb") as fh:
        fh.write(b"not a real parquet")
    with open(os.path.join(crash_dir, "._SUCCESS.crc"), "wb") as fh:
        fh.write(b"")
    assert table.vacuum() == []  # young: could still be in flight
    assert os.path.isdir(crash_dir)
    deleted = table.vacuum(min_age_s=0)
    assert deleted == [
        os.path.join(
            "data", "deadbeefcafe", "_temporary", "0", "task_001",
            "part-00000.snappy.parquet",
        )
    ]
    assert not os.path.exists(crash_dir)
    assert table.read(spark).count() == 4


def test_vacuum_survives_stray_plain_file_under_data(spark, table):
    """A stray PLAIN FILE directly under data/ (dropped by an operator or a
    foreign tool — never written by this sink) must not crash vacuum: the
    orphan-reclaim branch walks entries expecting commit DIRECTORIES, and
    without an isdir guard the all-aged check trivially passes on a file
    (os.walk yields nothing) and rmtree raises NotADirectoryError, aborting
    the whole pass. The file is unlinked once unreferenced+aged; real
    orphan dirs in the same pass are still reclaimed."""
    table.append(_frame(spark, 0, 4))
    stray = os.path.join(table.root, "data", "README.txt")
    with open(stray, "w") as fh:
        fh.write("not a commit dir")
    orphans = table._write_data(_frame(spark, 100, 105))
    assert table.vacuum() == []          # young window protects both
    assert os.path.exists(stray)
    deleted = table.vacuum(min_age_s=0)  # must NOT raise
    assert sorted(deleted) == sorted(orphans)
    assert not os.path.exists(stray)     # unreferenced + aged → unlinked
    assert table.read(spark).count() == 4


def test_txn_append_is_exactly_once_across_restart(spark, table):
    """Simulated streaming failure/restart: every micro-batch replays with
    its original batch id; the replay must add no versions and the table
    content must be the single-delivery result."""
    batches = [(0, 0, 10), (1, 10, 25), (2, 25, 30)]
    for bid, lo, hi in batches:
        table.append(_frame(spark, lo, hi), txn=("batch_id", bid))
    head = table.latest_version()
    for bid, lo, hi in batches:  # checkpoint replay after a crash
        v = table.append(_frame(spark, lo, hi), txn=("batch_id", bid))
        assert v == bid + 1  # returns the original committing version
    assert table.latest_version() == head
    assert sorted(r.k for r in table.read(spark).collect()) == list(range(30))


def test_txn_ledger_rechecked_inside_claim_retry(spark, table):
    """Two writers replaying the SAME batch race the commit. Writer B's data
    files are already staged — i.e. it is past any check-then-act pre-check —
    yet its _commit must find writer A's txn when it (re-)reads the head
    inside the claim loop and return A's version without claiming a new one.
    This is the protocol-level idempotence guarantee (Delta validates
    txnAppId/txnVersion at commit time, not before it)."""
    table.append(_frame(spark, 0, 5))
    files_b = table._write_data(_frame(spark, 10, 15))  # B stages first
    va = table.append(_frame(spark, 10, 15), txn=("batch_id", 7))  # A wins
    vb = table._commit(files_b, "append", txn=("batch_id", 7))
    assert vb == va
    assert table.latest_version() == va
    assert sorted(r.k for r in table.read(spark).collect()) == (
        list(range(5)) + list(range(10, 15))
    )


def test_snapshot_sink_recovery_equals_one_shot_batch(spark, sf_dir, table):
    """stream_snapshot_sink's exactly-once claim end to end: commit per-batch
    daily counts, crash-replay EVERY batch, and the committed table must
    aggregate to exactly the one-shot batch result over the same events."""
    from eviction_lab_etl_spark.sources.loader import load

    events = load(spark, sf_dir, "events")

    def commit_batch(bid: int) -> None:
        chunk = events.filter(F.col("event_id") % 3 == bid)
        daily = chunk.groupBy(F.to_date("ts").alias("od")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        table.append(daily, txn=("batch_id", bid))

    for bid in range(3):
        commit_batch(bid)
    head = table.latest_version()
    for bid in range(3):  # restart: the checkpoint replays all three
        commit_batch(bid)
    assert table.latest_version() == head
    got = table.read(spark).groupBy("od").agg(F.sum("cnt").cast("long").alias("cnt"))
    want = events.groupBy(F.to_date("ts").alias("od")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_compact_cas_refuses_when_head_moves(spark, table):
    """Compaction is content-neutral: if an append lands after the compactor
    read the head, the stale swap must NOT claim (it would drop the appended
    rows). The public compact() loop then re-derives from the new head — no
    committed row is ever lost."""
    table.append(_frame(spark, 0, 4))
    head = table.latest_version()
    stale_files = table._write_data(table.read(spark, version=head).coalesce(1))
    table.append(_frame(spark, 10, 12))  # concurrent append wins the race
    with pytest.raises(CommitConflict):
        table._commit(stale_files, "replace", expected_parent=head)
    v = table.compact(spark)  # public API re-reads the new head
    assert sorted(r.k for r in table.read(spark, version=v).collect()) == [
        0, 1, 2, 3, 10, 11,
    ]


def test_additive_schema_evolution(spark, table):
    table.append(_frame(spark, 0, 3))
    table.append(_frame(spark, 3, 5).withColumn("tag", F.lit("new")))
    latest = table.read(spark)
    assert sorted(latest.columns) == ["k", "tag"]
    rows = {(r.k, r.tag) for r in latest.collect()}
    assert rows == {(0, None), (1, None), (2, None), (3, "new"), (4, "new")}
    # pre-widening version keeps its narrower schema
    assert table.read(spark, version=1).columns == ["k"]


def test_paced_stream_soak_versioned_cdf_and_replay(spark, sf_dir, table):
    """Rate-limited end-to-end soak (referenced from stream_snapshot_sink's
    docstring): events replayed through the streaming file source with
    maxFilesPerTrigger=1 across >=5 micro-batches into the snapshot sink,
    one atomic version per batch. Extends the exactly-once property from
    replayed-batch (test_snapshot_sink_recovery_equals_one_shot_batch) to a
    PACED STREAM: (a) every version-to-version CDF is append-pure and the
    union of all per-version inserts reaggregates to the one-shot batch
    answer — no batch lost, none double-counted, at EVERY intermediate
    version, not just the head; (b) a crash between the checkpoint's offset
    write and its commit marker (commits/<id> deleted by hand) makes Spark
    re-run that batch with the same id on restart, and the txn ledger must
    absorb the replay without a new version."""
    import shutil

    from eviction_lab_etl_spark.operators.incremental import snapshot_cdf
    from eviction_lab_etl_spark.sources.loader import load

    n_slices = 5
    src = os.path.join(
        tempfile.gettempdir(), f"elspark_soak_src_{uuid.uuid4().hex[:8]}"
    )
    ckpt = os.path.join(
        tempfile.gettempdir(), f"elspark_soak_ckpt_{uuid.uuid4().hex[:8]}"
    )
    events = load(spark, sf_dir, "events").select("event_id", "ts")
    # One file per slice, written one at a time so each is a distinct
    # streaming input file (the pacing unit for maxFilesPerTrigger=1).
    for s in range(n_slices):
        events.filter(F.col("event_id") % n_slices == s).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def commit_batch(batch_df, batch_id: int) -> None:
        daily = batch_df.groupBy(F.to_date("ts").alias("od")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        table.append(daily, txn=("batch_id", batch_id))

    def run_stream() -> None:
        q = (
            spark.readStream.schema(events.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src)
            .writeStream.foreachBatch(commit_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        run_stream()
        head = table.latest_version()
        # availableNow honors maxFilesPerTrigger: one version per file.
        assert head >= n_slices
        assert table.committed_meta("batch_id") == set(range(head))

        # (a) Version-by-version CDF consistency across the whole soak.
        empty = table.read(spark, version=head).limit(0)
        all_inserts = []
        for v in range(1, head + 1):
            old = empty if v == 1 else table.read(spark, version=v - 1)
            cdf = snapshot_cdf(old, table.read(spark, version=v))
            ops = cdf.groupBy("op").count().collect()
            assert {r.op for r in ops} == {"I"}, f"v{v}: non-append CDF {ops}"
            all_inserts.append(cdf.drop("op"))
        replayed = all_inserts[0]
        for frag in all_inserts[1:]:
            replayed = replayed.unionByName(frag)
        got = replayed.groupBy("od").agg(F.sum("cnt").cast("long").alias("cnt"))
        want = events.groupBy(F.to_date("ts").alias("od")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

        # (b) Crash between offset write and commit marker: drop the LAST
        # batch's commit file; restart re-runs it with the same batch id.
        last = head - 1
        os.remove(os.path.join(ckpt, "commits", str(last)))
        # Hadoop's local ChecksumFs keeps a .crc sidecar per commit file; a
        # stale sidecar makes the re-written commit's rename fail (surfacing
        # as a bogus "multiple streaming queries" error), so crash it too.
        crc = os.path.join(ckpt, "commits", f".{last}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        run_stream()
        assert table.latest_version() == head, "replayed batch re-committed"
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_tags_are_immutable_named_refs(spark, table):
    """tag() claims its name atomically (second claim = CommitConflict, the
    manifest discipline), rejects uncommitted versions, pins content across
    later commits, and survives vacuum (tagged manifests keep their files
    referenced)."""
    table.append(_frame(spark, 0, 10))
    table.append(_frame(spark, 10, 15))
    assert table.tag("release", version=1) == 1
    with pytest.raises(CommitConflict):
        table.tag("release", version=2)  # never repointable
    with pytest.raises(ValueError):
        table.tag("future", version=9)
    # content pinned across a later destructive replace
    table.replace(_frame(spark, 0, 3))
    assert table.read_tag(spark, "release").count() == 10
    assert table.tag_version("release") == 1
    # default version = latest
    assert table.tag("head") == 3
    deleted = table.vacuum(min_age_s=0)
    assert deleted == []  # every data file is still manifest-referenced
    assert table.read_tag(spark, "release").count() == 10
