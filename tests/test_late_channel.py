"""Late-row side channel (SURVEY section 4 custom work; reference
HotPage.java:66,76-77): replay events out of order across two files so
the second batch carries rows older than the watermark, and assert
they land in the ``late`` frame while the main result equals the batch
recompute over the on-time rows."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from flink_user_behavior_analysis_spark.operators import windowed_count
from flink_user_behavior_analysis_spark.sources import load_table
from flink_user_behavior_analysis_spark.streaming import run_with_late_channel

DELAY_S = 3600  # allowed lateness: 1 hour


def _two_file_replay_dir(spark, sf_dir, tmp_path):
    """Split events into two parquet files replayed in order: file 0
    (most rows, includes the global max ts), then file 1 (a sample
    spread over the whole time range — its old rows arrive 'late')."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.where(F.col("event_id") % 5 != 0)
    second = ev.where(F.col("event_id") % 5 == 0)
    stream_dir = tmp_path / "replay"
    stream_dir.mkdir()
    for i, part in enumerate((first, second)):
        out = tmp_path / f"stage_{i}"
        part.coalesce(1).write.parquet(str(out))
        (src,) = glob.glob(str(out / "part-*.parquet"))
        dst = stream_dir / f"{i:02d}.parquet"
        shutil.copy(src, dst)
        # FileStreamSource drains oldest-mtime first — pin the order
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
    return stream_dir, first, second


def test_late_rows_routed_to_side_channel(spark, sf_dir, tmp_path):
    stream_dir, first, second = _two_file_replay_dir(spark, sf_dir, tmp_path)
    raw = (
        spark.readStream.schema(first.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir))
    )

    def compute(on_time):
        return windowed_count(
            on_time.where(F.col("event_type") == "click"),
            "ts", ["user_id"], "1 hour", "1 hour",
        )

    legs = run_with_late_channel(raw, DELAY_S, compute)

    # expected late set: batch-2 rows older than wm = max ts(batch 1) - delay
    max_us_1 = first.agg(F.max(F.unix_micros("ts"))).first()[0]
    wm_us = max_us_1 - DELAY_S * 1_000_000
    expect_late = {
        r.event_id
        for r in second.where(F.unix_micros("ts") < F.lit(wm_us)).collect()
    }
    got_late = {r.event_id for r in legs["late"].collect()}
    assert got_late == expect_late
    assert got_late, "replay should produce late rows (else the test is vacuous)"

    # main result == batch recompute over exactly the on-time rows
    on_time = first.unionByName(
        second.where(F.unix_micros("ts") >= F.lit(wm_us))
    )
    want = compute(on_time)
    got = legs["result"]
    key = lambda df: sorted(
        (r.window_end_us, r.user_id, r.cnt) for r in df.collect()
    )
    assert key(got) == key(want)


def test_late_channel_parquet_sink_matches_harness(spark, sf_dir, tmp_path):
    """Production path (VERDICT r3 item 7): both legs written to
    parquet from inside foreachBatch — the routed sets must equal the
    driver-collect harness's, and the main result recomputed over the
    on-time parquet must equal the harness result leg."""
    from flink_user_behavior_analysis_spark.streaming import (
        run_with_late_channel_to_parquet,
    )

    stream_dir, first, second = _two_file_replay_dir(spark, sf_dir, tmp_path)

    def raw():
        return (
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
        )

    def compute(on_time):
        return windowed_count(
            on_time.where(F.col("event_type") == "click"),
            "ts", ["user_id"], "1 hour", "1 hour",
        )

    paths = run_with_late_channel_to_parquet(
        raw(), DELAY_S, str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"))
    legs = run_with_late_channel(raw(), DELAY_S, compute)

    late_pq = spark.read.parquet(paths["late"])
    on_time_pq = spark.read.parquet(paths["on_time"])
    assert {r.event_id for r in late_pq.collect()} == {
        r.event_id for r in legs["late"].collect()}
    assert late_pq.count() > 0, "vacuous replay: no late rows"

    key = lambda df: sorted(
        (r.window_end_us, r.user_id, r.cnt) for r in df.collect()
    )
    assert key(compute(on_time_pq)) == key(legs["result"])


def test_late_channel_parquet_sink_replay_is_idempotent(spark, sf_dir,
                                                        tmp_path):
    """ADVICE r4: a full replay into the same sink (fresh checkpoint,
    same batch ids — the restart-after-crash shape) must not duplicate
    rows: each leg partitions by batch id and dynamically overwrites
    its own partitions, and the watermark is rebuilt from the sink, so
    after the rerun the two legs still hold the input exactly once."""
    from flink_user_behavior_analysis_spark.streaming import (
        run_with_late_channel_to_parquet,
    )

    stream_dir, first, second = _two_file_replay_dir(spark, sf_dir, tmp_path)

    def raw():
        return (
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
        )

    sink = str(tmp_path / "sink_replay")
    paths = run_with_late_channel_to_parquet(
        raw(), DELAY_S, sink, checkpoint_dir=str(tmp_path / "ckpt_a"))
    first_run = {
        leg: sorted(r.event_id for r in
                    spark.read.parquet(p).collect())
        for leg, p in paths.items()
    }
    all_ids = sorted(first_run["on_time"] + first_run["late"])
    want_ids = sorted(
        r.event_id for r in first.unionByName(second).collect())
    assert all_ids == want_ids  # exactly once, no dups, nothing lost

    # crash-replay: same sink, FRESH checkpoint -> batches re-run with
    # the same ids; the watermark starts from the sink's max ts
    paths2 = run_with_late_channel_to_parquet(
        raw(), DELAY_S, sink, checkpoint_dir=str(tmp_path / "ckpt_b"))
    rerun_ids = sorted(
        [r.event_id for r in spark.read.parquet(paths2["on_time"]).collect()]
        + [r.event_id for r in spark.read.parquet(paths2["late"]).collect()])
    assert rerun_ids == want_ids, "replay duplicated or dropped rows"
    # recovered watermark >= original: late leg can only grow
    assert (len([r for r in
                 spark.read.parquet(paths2["late"]).collect()])
            >= len(first_run["late"]))


def test_topn_parquet_sink_upserts_per_window(spark, sf_dir, tmp_path):
    """Production T1/T2 sink: the dynamically-overwritten parquet
    table holds the final late-update-safe ranking — equal to the
    batch hot_items query — partitioned one directory per window."""
    import glob as _glob

    from flink_user_behavior_analysis_spark import queries as Q
    from flink_user_behavior_analysis_spark.streaming import (
        hot_items_counts_stream,
        run_topn_to_parquet,
    )

    out = run_topn_to_parquet(
        hot_items_counts_stream(spark, sf_dir), 3,
        order_cols=[F.col("cnt").desc(), F.col("item_id").asc()],
        out_dir=str(tmp_path / "topn"),
        checkpoint_dir=str(tmp_path / "ckpt_topn"))
    got = spark.read.parquet(out)
    want = Q.QUERIES["hot_items"](spark, sf_dir)
    key = lambda df: sorted(
        (r.window_end_us, r.item_id, r.cnt, int(r.rnk)) for r in df.collect()
    )
    assert key(got) == key(want)
    # keyed layout: one partition directory per window
    assert _glob.glob(os.path.join(out, "window_end_us=*"))


def test_late_channel_empty_when_delay_covers_disorder(spark, sf_dir, tmp_path):
    """With allowed lateness wider than the replay's disorder, nothing
    is late and the result equals the full batch query."""
    stream_dir, first, second = _two_file_replay_dir(spark, sf_dir, tmp_path)
    raw = (
        spark.readStream.schema(first.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir))
    )
    span_us = load_table(spark, sf_dir, "events").agg(
        F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))
    ).first()[0]

    def compute(on_time):
        return windowed_count(
            on_time.where(F.col("event_type") == "click"),
            "ts", ["user_id"], "1 hour", "1 hour",
        )

    legs = run_with_late_channel(raw, span_us / 1_000_000 + 1, compute)
    assert legs["late"].count() == 0
    want = compute(load_table(spark, sf_dir, "events"))
    key = lambda df: sorted(
        (r.window_end_us, r.user_id, r.cnt) for r in df.collect()
    )
    assert key(legs["result"]) == key(want)


def test_late_channel_replay_clears_emptied_leg(spark, tmp_path):
    """The empty-leg replay hole: batch 0 is all-OLD rows, so on the
    crash-replay (watermark rebuilt from the sink) it routes ENTIRELY
    late — the on_time leg's _bid=0 partition must be emptied, not
    left holding the first run's copies. Dynamic partition overwrite
    cannot do this (an empty output overwrites nothing); the sink
    writes each leg's partition directory directly so a replay fully
    supersedes both legs."""
    from datetime import datetime, timedelta

    from flink_user_behavior_analysis_spark.streaming import (
        run_with_late_channel_to_parquet,
    )

    t0 = datetime(2024, 1, 1)
    old = spark.createDataFrame(
        [(i, t0 + timedelta(minutes=i)) for i in range(5)],
        "event_id long, ts timestamp")
    new = spark.createDataFrame(
        [(100 + i, t0 + timedelta(hours=2, minutes=i)) for i in range(5)],
        "event_id long, ts timestamp")
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    old.coalesce(1).write.parquet(str(stream_dir / "a"))
    new.coalesce(1).write.parquet(str(stream_dir / "b"))
    # one file per trigger, lexicographic arrival: a (old) then b (new)
    def run(ckpt):
        return run_with_late_channel_to_parquet(
            spark.readStream.schema(old.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir) + "/*"),
            3600, str(tmp_path / "sink"),
            checkpoint_dir=str(tmp_path / ckpt))

    run("ckpt1")
    paths = run("ckpt2")   # fresh checkpoint = crash replay, same sink
    on_ids = sorted(r.event_id
                    for r in spark.read.parquet(paths["on_time"]).collect())
    late_ids = sorted(r.event_id
                      for r in spark.read.parquet(paths["late"]).collect())
    want = sorted(r.event_id for r in old.unionByName(new).collect())
    assert sorted(on_ids + late_ids) == want, (
        "replay duplicated rows across legs")
    assert set(on_ids).isdisjoint(late_ids)
    # and the replay really did flip batch 0: the old rows are late now
    assert set(late_ids) == {0, 1, 2, 3, 4}


def test_late_channel_parquet_sink_crash_mid_batch_recovery(
        spark, sf_dir, tmp_path):
    """VERDICT r5 #8 (adversarial restart): simulate a crash DURING
    the final batch — the checkpoint never recorded its commit (here:
    a checkpoint snapshot taken before the batch, which is the
    recovery-equivalent state: batch ids continue deterministically
    from the last commit), and the crashed attempt already overwrote
    ONE leg's _bid=N partition with its own (corrupted, duplicated)
    rows before dying between the two leg writes. After a restart,
    the replayed batch must fully supersede BOTH legs' _bid=N
    partitions: the sink equals the clean final snapshot exactly —
    effectively-once per batch, no duplicates, no stale
    half-written leg. (The commit log is not mutated in place:
    Spark 4's metadata-log cache flags that as concurrent use.)"""
    from flink_user_behavior_analysis_spark.streaming import (
        run_with_late_channel_to_parquet,
    )

    stream_dir, first, second = _two_file_replay_dir(spark, sf_dir, tmp_path)

    def raw():
        return (
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
        )

    sink = str(tmp_path / "sink_crash")
    ckpt = str(tmp_path / "ckpt_crash")
    ckpt_pre = str(tmp_path / "ckpt_pre_final")

    # phase 1: only file 0 exists -> batch 0 commits; snapshot the
    # checkpoint in this state (= the on-disk state a crash during
    # batch 1 leaves behind, minus the uncommitted offsets entry)
    stage2 = stream_dir / "01.parquet"
    held_back = tmp_path / "01.parquet.held"
    os.rename(stage2, held_back)
    run_with_late_channel_to_parquet(
        raw(), DELAY_S, sink, checkpoint_dir=ckpt)
    shutil.copytree(ckpt, ckpt_pre)

    # phase 2: file 1 arrives -> batch 1 commits; the clean final state
    os.rename(held_back, stage2)
    paths = run_with_late_channel_to_parquet(
        raw(), DELAY_S, sink, checkpoint_dir=ckpt)
    snap = {
        leg: sorted(r.event_id for r in spark.read.parquet(p).collect())
        for leg, p in paths.items()
    }
    assert snap["late"], "vacuous: replay produced no late rows"

    # the crashed attempt's partial work: on_time/_bid=1 overwritten
    # with duplicated rows (a superset/garbage state), late leg stale
    second.limit(50).write.mode("overwrite").parquet(
        os.path.join(paths["on_time"], "_bid=1"))
    assert (sorted(r.event_id
                   for r in spark.read.parquet(paths["on_time"]).collect())
            != snap["on_time"]), "corruption must be visible pre-restart"

    # restart from the pre-final checkpoint: batch 1 replays (same
    # deterministic bid — last commit is 0, same pending file) and
    # must overwrite BOTH legs' _bid=1 partitions
    paths2 = run_with_late_channel_to_parquet(
        raw(), DELAY_S, sink, checkpoint_dir=ckpt_pre)
    got = {
        leg: sorted(r.event_id for r in spark.read.parquet(p).collect())
        for leg, p in paths2.items()
    }
    assert got == snap
