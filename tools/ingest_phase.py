"""Phase breakdown of ONE streaming-curation micro-batch (VERDICT r9
#6): r9 measured per-batch walls flattening at ~4.4-4.5 s for 500-doc
batches and asked where the floor lives — fixed harness overhead
(epoch planning/WAL), ledger round-trips, probe-side signing, or the
append writes.

Replays the r9 setup (sf0.1 documents: ~1000-doc seed corpus stored
via dedup_store_corpus, ~4000 docs streamed as 8 parquet files of
~500, maxFilesPerTrigger=1, checkpointed availableNow) twice:

1. a NO-OP drain (foreachBatch body = batch.count()) over the same
   source+checkpoint shape -> the streaming engine's own per-epoch
   floor (file listing, WAL commit, plan re-materialization);
2. the real curation body with each phase timed inside the epoch:
   ledger check / batch persist / stored-LSH probe / survivors
   append (phases are forced with count() for attribution, so their
   sum can slightly exceed the unphased e2e wall).

Usage: python tools/ingest_phase.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from flink_user_behavior_analysis_spark.operators.dedup import (  # noqa: E402
    dedup_append_corpus,
    dedup_incremental_from_store,
    dedup_store_corpus,
)
from flink_user_behavior_analysis_spark.operators.text import (  # noqa: E402
    quality_score_col,
)
from flink_user_behavior_analysis_spark.queries_pipeline import _docs  # noqa: E402
from flink_user_behavior_analysis_spark.session import get_spark  # noqa: E402
from flink_user_behavior_analysis_spark.sources.readers import (  # noqa: E402
    append_recorded,
)

SF_DIR = "/root/testdata/sf0.1"
PREFIX = "t_ingphase"


def main() -> None:
    spark = get_spark(app="ingest-phase")
    work = tempfile.mkdtemp(prefix="ingphase_")
    docs = _docs(spark, SF_DIR).select("doc_id", "text")
    seed = docs.where("doc_id % 5 = 0")          # ~1000 docs
    incoming = docs.where("doc_id % 5 != 0")     # ~4000 docs
    src = f"{work}/src"
    incoming.repartition(8).write.parquet(src)

    for t in spark.catalog.listTables():
        if t.name.startswith(PREFIX):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    dedup_store_corpus(seed, PREFIX)
    print(f"seed corpus: {seed.count()} docs, "
          f"incoming: {incoming.count()} docs in 8 files")

    def _stream():
        return (spark.readStream.schema(incoming.schema)
                .option("maxFilesPerTrigger", 1).parquet(src))

    # ---- 1. no-op drain: the engine's per-epoch floor --------------
    noop_walls: list[float] = []
    last = [time.perf_counter()]

    def _noop(batch_df, _eid):
        t0 = time.perf_counter()
        batch_df.count()
        noop_walls.append(time.perf_counter() - t0)
        last[0] = time.perf_counter()

    t_all0 = time.perf_counter()
    q = (_stream().writeStream.outputMode("append").foreachBatch(_noop)
         .option("checkpointLocation", f"{work}/ckpt_noop")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    noop_total = time.perf_counter() - t_all0
    in_body = sum(noop_walls)
    print(f"\nno-op drain: {len(noop_walls)} epochs, total "
          f"{noop_total:.2f}s, in-body {in_body:.2f}s, HARNESS "
          f"{noop_total - in_body:.2f}s "
          f"({(noop_total - in_body) / len(noop_walls):.2f}s/epoch)")

    # ---- 2. real body, phase-timed ---------------------------------
    rows: list[dict] = []

    def _phased(batch_df, bid):
        ph: dict[str, float] = {}
        t0 = time.perf_counter()
        accepted = batch_df.where(quality_score_col("text") >= 0.0)
        hit = append_recorded(spark, PREFIX, bid)
        ph["ledger"] = time.perf_counter() - t0
        if hit:
            rows.append(ph)
            return
        t0 = time.perf_counter()
        accepted = accepted.persist()
        n_in = accepted.count()
        ph["persist"] = time.perf_counter() - t0
        # decisions is bound inside the try — if the probe raises
        # before the assignment, the finally must not NameError over
        # the original exception (ADVICE r10), so guard both unpersists
        decisions = None
        try:
            t0 = time.perf_counter()
            decisions = dedup_incremental_from_store(
                spark, PREFIX, accepted, 0.8).persist()
            n_kept = decisions.where(F.col("status") == "kept").count()
            ph["probe"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            survivors = accepted.join(
                decisions.where(F.col("status") == "kept")
                .select("doc_id"), "doc_id")
            dedup_append_corpus(spark, PREFIX, survivors, batch_id=bid)
            ph["append"] = time.perf_counter() - t0
            ph["n_in"], ph["n_kept"] = n_in, n_kept
        finally:
            if decisions is not None:
                decisions.unpersist()
            accepted.unpersist()
        rows.append(ph)

    t_all0 = time.perf_counter()
    q = (_stream().writeStream.outputMode("append")
         .foreachBatch(lambda b, e: _phased(b, f"ph-{e}"))
         .option("checkpointLocation", f"{work}/ckpt_real")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    real_total = time.perf_counter() - t_all0

    print("\n| epoch | n_in | kept | ledger | persist | probe | "
          "append | body |")
    print("|---|---|---|---|---|---|---|---|")
    for i, ph in enumerate(rows):
        body = sum(v for k, v in ph.items() if k not in ("n_in", "n_kept"))
        print(f"| {i} | {ph.get('n_in', 0)} | {ph.get('n_kept', 0)} | "
              f"{ph.get('ledger', 0):.2f} | {ph.get('persist', 0):.2f} | "
              f"{ph.get('probe', 0):.2f} | {ph.get('append', 0):.2f} | "
              f"{body:.2f} |")
    in_body = sum(sum(v for k, v in ph.items()
                      if k not in ("n_in", "n_kept")) for ph in rows)
    print(f"\nreal drain: total {real_total:.2f}s, in-body "
          f"{in_body:.2f}s, harness {real_total - in_body:.2f}s")

    for t in spark.catalog.listTables():
        if t.name.startswith(PREFIX):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
