"""Per-query profiling harness for the optimization rounds.

For each named query: warm the plan shape on sf0.001 (same protocol as
bench.py), then time `SPARK_GRAFT_PROFILE_RUNS` runs (default 3) at
$SPARK_GRAFT_SF_DIR with bench's fullhash consumer, and write the
executed plan (`explain formatted`, post-AQE initial plan) to
plans/<tag>/<name>_<suffix>.txt when --plans is given.

Usage:
  python tools/profile_queries.py ann_topk_ivfpq curation_pipeline \
      --plans r14 --suffix before
  python tools/profile_queries.py --all --plans r14 --suffix before

This is measurement tooling only — it never changes what a query
computes, and it reuses bench.py's consumer so walls are comparable
with committed bench artifacts.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _consume  # noqa: E402
from flink_user_behavior_analysis_spark import queries as Q  # noqa: E402
from flink_user_behavior_analysis_spark.operators.dedup import (  # noqa: E402
    release_signature_cache,
)
from flink_user_behavior_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", default=None,
                    help="write explain('formatted') to plans/<tag>/")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS",
                                               "3")))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    names = list(Q.QUERIES) if args.all else args.names
    unknown = [n for n in names if n not in Q.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR",
                              "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark = get_spark(app="fuba-profile")

    plans_dir = None
    if args.plans:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        plans_dir = os.path.join(here, "plans", args.plans)
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, list[float]] = {}
    for name in names:
        fn = Q.QUERIES[name]
        if not args.no_warm:
            try:
                _consume(fn(spark, warm_dir))
                release_signature_cache()
            except Exception as exc:  # pragma: no cover
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        times = []
        df = None
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = _consume(df)
            times.append(time.perf_counter() - t0)
            release_signature_cache()
        results[name] = times
        print(f"# {name}: min={min(times):.3f}s rows={n} "
              f"runs={[round(t, 3) for t in times]}")
        if plans_dir is not None and df is not None:
            path = os.path.join(plans_dir, f"{name}_{args.suffix}.txt")
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(path, "w") as fh:
                fh.write(plan)
    total = sum(min(t) for t in results.values())
    print(f"# TOTAL(min) over {len(results)} queries: {total:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
