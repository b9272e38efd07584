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


def test_streaming_ingest_exactly_once_across_restart(spark, sf_dir,
                                                      tmp_path):
    """VERDICT r8 #5 end-to-end: a streaming ingest that appends each
    micro-batch's near-dup survivors into the stored corpus under the
    epoch-derived batch_id must survive a crash AFTER the append
    committed but BEFORE the epoch checkpointed — the restart replays
    that epoch with the same id, the ledger dedupes it, and the
    stored corpus ends duplicate-free and EQUAL to a batch-mode
    replay of the same micro-batch sequence."""
    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    from flink_user_behavior_analysis_spark.operators.dedup import (
        dedup_append_corpus,
        dedup_incremental_from_store,
        dedup_store_corpus,
    )
    from flink_user_behavior_analysis_spark.streaming.jobs import (
        curation_ingest_batch,
        run_ingest_foreach_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where("doc_id % 10 < 2")
    incoming = docs.where("doc_id % 10 >= 2")
    src = str(tmp_path / "src")
    incoming.repartition(4).write.parquet(src)  # 4 micro-batches

    prefix = "t_ing_eo"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    dedup_store_corpus(base, prefix)

    seen: dict[str, list] = {}  # batch_id -> doc_ids (first attempt wins)

    def _stream():
        return (spark.readStream.schema(incoming.schema)
                .option("maxFilesPerTrigger", 1).parquet(src))

    def _record(batch_df, batch_id):
        ids = sorted(r.doc_id for r in batch_df.select("doc_id").collect())
        seen.setdefault(batch_id, ids)
        return curation_ingest_batch(spark, prefix, batch_df, batch_id)

    crashed = {"done": False}

    def _sabotaged(batch_df, batch_id):
        n = _record(batch_df, batch_id)
        if not crashed["done"]:
            crashed["done"] = True
            assert n > 0, "sabotage must fire after a real append"
            raise RuntimeError("simulated crash after append, before "
                               "epoch commit")

    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(StreamingQueryException, match="simulated crash"):
        run_ingest_foreach_batch(_stream(), ckpt, _sabotaged, job_id="j")
    # restart from the same checkpoint: epoch 0 replays under the SAME
    # batch_id; the ledger turns it into a no-op, the rest drains
    run_ingest_foreach_batch(_stream(), ckpt, _record, job_id="j")

    stored = spark.table(f"{prefix}_shingles").select("doc_id")
    n_rows = stored.count()
    n_ids = stored.distinct().count()
    assert n_rows == n_ids, (
        f"replayed epoch duplicated corpus rows: {n_rows} rows over "
        f"{n_ids} distinct ids")

    # every replayed id was re-delivered with identical content (the
    # WAL contract the ledger relies on), and all 4 files were seen
    assert len(seen) == 4
    assert set().union(*seen.values()) == {
        r.doc_id for r in incoming.select("doc_id").collect()}

    # batch-mode replay of the SAME micro-batch sequence on a second
    # prefix must land the exact same survivor set
    ref = "t_ing_ref"
    for t in spark.catalog.listTables():
        if t.name.startswith(ref):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    dedup_store_corpus(base, ref)
    for bid in sorted(seen, key=lambda b: int(b.rsplit("-", 1)[1])):
        batch = docs.where(F.col("doc_id").isin(seen[bid]))
        decisions = dedup_incremental_from_store(spark, ref, batch, 0.8)
        survivors = batch.join(
            decisions.where("status = 'kept'").select("doc_id"), "doc_id")
        dedup_append_corpus(spark, ref, survivors, batch_id=bid)
    got = {r.doc_id for r in stored.collect()}
    want = {r.doc_id for r in
            spark.table(f"{ref}_shingles").select("doc_id").collect()}
    assert got == want and got >= {r.doc_id for r in base.collect()}
    for p in (prefix, ref):
        for t in spark.catalog.listTables():
            if t.name.startswith(p):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
