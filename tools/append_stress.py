"""Measure the append-path file-accumulation wall and compaction
recovery on the stored IVFADC index: build on 50% of the sf0.1
embeddings, append the rest in N small exactly-once batches (worst
case for small files: every batch writes into every cell it
touches), probe after each phase, then compact and probe again.

Usage: python tools/append_stress.py [n_batches] [auto_compact_threshold]
With a threshold, the appends run under the in-path compaction
cadence (auto_compact_files_per_cell) instead of a single manual
compact at the end. Appends PERF-style numbers to stdout; paste
into PERF.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from flink_user_behavior_analysis_spark.operators.similarity import (  # noqa: E402
    ivfpq_append_to_index,
    ivfpq_compact_index,
    ivfpq_store_index,
    ivfpq_topk_from_index,
)
from flink_user_behavior_analysis_spark.queries_pipeline import _embs  # noqa: E402
from flink_user_behavior_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
PREFIX = "t_append_stress"


def probe_wall(spark, queries, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        ivfpq_topk_from_index(spark, PREFIX, queries, 5, nprobe=4).collect()
        best = min(best, time.time() - t)
    return best


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark()
    embs = _embs(spark, SF_DIR).select("vec_id", "embedding")
    h = F.abs(F.xxhash64("vec_id") % (2 * n_batches))
    base = embs.where(h >= n_batches)
    queries = embs.where(F.col("vec_id") < 8)

    t = time.time()
    ivfpq_store_index(base, PREFIX, n_centroids=16, m=8, codes=16)
    print(f"build: {time.time() - t:.2f}s "
          f"rows={spark.table(PREFIX + '_codes').count()} "
          f"files={len(spark.table(PREFIX + '_codes').inputFiles())}")
    print(f"probe after build: {probe_wall(spark, queries):.2f}s")

    from flink_user_behavior_analysis_spark.sources.readers import (
        files_per_partition,
    )

    t = time.time()
    worst = 0
    for i in range(n_batches):
        ivfpq_append_to_index(spark, PREFIX, embs.where(h == i),
                              batch_id=f"s{i}",
                              auto_compact_files_per_cell=threshold)
        if threshold is not None:
            worst = max(worst, files_per_partition(
                spark, PREFIX + "_codes")["max_per_cell"])
    dt = time.time() - t
    print(f"{n_batches} appends"
          + (f" (auto-compact at {threshold} files/cell,"
             f" worst seen {worst})" if threshold is not None else "")
          + f": {dt:.2f}s total, {dt / n_batches:.2f}s/batch, "
          f"rows={spark.table(PREFIX + '_codes').count()} "
          f"files={len(spark.table(PREFIX + '_codes').inputFiles())}")
    print(f"probe after appends: {probe_wall(spark, queries):.2f}s")

    if threshold is None:
        t = time.time()
        stats = ivfpq_compact_index(spark, PREFIX)
        print(f"compact: {time.time() - t:.2f}s files "
              f"{stats['files_before']} -> {stats['files_after']} "
              f"(rows {stats['rows']})")
        print(f"probe after compact: {probe_wall(spark, queries):.2f}s")

    for tb in spark.catalog.listTables():
        if tb.name.startswith(PREFIX):
            spark.sql(f"DROP TABLE {tb.name}")


if __name__ == "__main__":
    main()
