"""Measure append-vs-rebuild walls for the stored text/dedup families
at sf0.1: build each index on 90% of documents, then (a) time an
append of the remaining 10% and (b) time a full rebuild on 100% —
the claim under test is append = O(count tables + batch), rebuild =
O(corpus text).

Usage: python tools/ingest_stress.py [scale] [family ...]
(optional family names restrict the sweep — e.g.
``python tools/ingest_stress.py 100 contam`` runs just the contam
family at the 100x-corpus decade)
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from flink_user_behavior_analysis_spark.operators.chunking import (  # noqa: E402
    span_append_counts,
    span_store_counts,
)
from flink_user_behavior_analysis_spark.operators.contamination import (  # noqa: E402
    contam_append_grams as _contam_append,
)
from flink_user_behavior_analysis_spark.operators.contamination import (  # noqa: E402
    contam_store_grams as _contam_store,
)
from flink_user_behavior_analysis_spark.operators.dedup import (  # noqa: E402
    dedup_append_corpus,
    dedup_store_corpus,
)
from flink_user_behavior_analysis_spark.operators.text import (  # noqa: E402
    bm25_append_to_index,
    bm25_store_index,
    lm_append_to_model,
    lm_store_model,
)
from flink_user_behavior_analysis_spark.queries_pipeline import _docs  # noqa: E402
from flink_user_behavior_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_spark()
    docs = _docs(spark, SF_DIR)
    h = F.abs(F.xxhash64("doc_id") % 10)
    base, batch = docs.where(h >= 1), docs.where(h < 1)
    if scale > 1:
        # corpus >> batch regime: salt doc ids so copies are distinct
        # documents (texts repeat — fine, the cost driver is rows)
        base = None
        parts = []
        for i in range(scale):
            parts.append(docs.where(h >= 1).select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                *[c for c in docs.columns if c != "doc_id"]))
        from functools import reduce
        base = reduce(lambda a, b: a.unionByName(b), parts)
    n_base, n_batch = base.count(), batch.count()
    print(f"scale={scale} docs: base={n_base} batch={n_batch}")

    fams = [
        ("bm25", lambda d, p: bm25_store_index(d, p),
         lambda p: bm25_append_to_index(spark, p, batch, batch_id="m1")),
        ("lm", lambda d, p: lm_store_model(d, p),
         lambda p: lm_append_to_model(spark, p, batch, batch_id="m1")),
        ("minhash", lambda d, p: dedup_store_corpus(d, p),
         lambda p: dedup_append_corpus(spark, p, batch, batch_id="m1")),
        ("spans", lambda d, p: span_store_counts(d, p),
         lambda p: span_append_counts(spark, p, batch, batch_id="m1")),
        ("contam", lambda d, p: _contam_store(d, p),
         lambda p: _contam_append(spark, p, batch, batch_id="m1")),
    ]
    only = set(sys.argv[2:])
    if only:
        unknown = only - {n for n, _, _ in fams}
        if unknown:
            raise SystemExit(f"unknown families: {sorted(unknown)}")
        fams = [f for f in fams if f[0] in only]
    print("\n| family | build (90%) | append (10%) | rebuild (100%) | "
          "append/rebuild |")
    print("|---|---|---|---|---|")
    for name, build, append in fams:
        pfx = f"t_ing_{name}"
        for t in spark.catalog.listTables():
            if t.name.startswith(pfx):
                spark.sql(f"DROP TABLE {t.name}")
        t0 = time.time()
        build(base, pfx)
        t_build = time.time() - t0
        t0 = time.time()
        append(pfx)
        t_append = time.time() - t0
        t0 = time.time()
        build(base.unionByName(batch), pfx)  # full rebuild on 100%
        t_rebuild = time.time() - t0
        print(f"| {name} | {t_build:.2f}s | {t_append:.2f}s | "
              f"{t_rebuild:.2f}s | {t_append / t_rebuild:.2f} |",
              flush=True)
        for t in spark.catalog.listTables():
            if t.name.startswith(pfx):
                spark.sql(f"DROP TABLE {t.name}")


if __name__ == "__main__":
    main()
