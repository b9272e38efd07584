"""Stateful streaming recovery: stop a checkpointed stateful query
mid-stream, restart it, and verify state carries across the restart
with no duplicate or missing emissions (the RocksDB/HDFS-state-store
story the reference gets from Flink checkpoints)."""

from pyspark.sql import functions as F

from flink_user_behavior_analysis_spark import queries as Q
from flink_user_behavior_analysis_spark.sources import load_table
from flink_user_behavior_analysis_spark.streaming import consecutive_fail_stateful


def _run_once(spark, src_dir, ckpt, out_dir, raw_schema):
    raw = spark.readStream.schema(raw_schema).parquet(src_dir)
    ev = raw.withWatermark("ts", "0 seconds")
    out = consecutive_fail_stateful(ev, n=2, within_seconds=6 * 3600)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).collect()


def test_consecutive_fail_survives_restart(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    # cut INSIDE the widest known fail-run so at least one warning's
    # state must be rebuilt from the checkpoint after the restart
    runs = Q.QUERIES["login_fail"](spark, sf_dir).collect()
    widest = max(runs, key=lambda r: r.last_fail_us - r.first_fail_us)
    assert widest.last_fail_us > widest.first_fail_us
    mid_us = (widest.first_fail_us + widest.last_fail_us) // 2
    mid = F.timestamp_micros(F.lit(mid_us))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "out")

    # phase 1: only the first half of the timeline exists
    ev.where(F.col("ts") <= mid).coalesce(1).write.parquet(src)
    first = _run_once(spark, src, ckpt, out_dir, ev.schema)
    # phase 2: the rest arrives; SAME checkpoint -> file-source log
    # skips phase-1 files, state store restores fail buffers
    ev.where(F.col("ts") > mid).coalesce(1).write.mode("append").parquet(src)
    both = _run_once(spark, src, ckpt, out_dir, ev.schema)
    second = [r for r in both if r not in first] if len(both) > len(first) else []

    combined = sorted(
        (r.user_id, r.first_fail_us, r.last_fail_us) for r in both
    )
    want = sorted(
        (r.user_id, r.first_fail_us, r.last_fail_us)
        for r in Q.QUERIES["login_fail"](spark, sf_dir).collect()
    )
    assert combined == want
    # both phases must have contributed (otherwise the test is vacuous)
    assert first and second
    # cross-restart runs exist: some warning spans the checkpoint cut
    spanning = [r for r in second if r.first_fail_us <= mid_us]
    assert spanning, "no fail-run crossed the restart boundary"
