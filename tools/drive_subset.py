"""Driver-simulation for a SUBSET of the contract: same hash compare
as tools/drive_contract.py (shared helpers in tools/_driver_sim.py)
but only for the query names given on the command line, or:

  --window  the first GATE_WINDOW registry entries — the exact set
            the round driver gates this round;
  --tail    everything PAST the window (VERDICT r8 #7): as the
            registry grows, the rotation horizon stretches — a wrong
            answer introduced in a tail query could sit outside the
            driver window for ceil(n/50) rounds. Running the tail
            locally once per round (DuckDB-side only, no driver)
            re-certifies those entries on the same hash compare, so
            the effective staleness is one round regardless of
            registry size. PERF.md records its wall per round.

Usage:
    python tools/drive_subset.py name1 name2 ...
    python tools/drive_subset.py --window
    python tools/drive_subset.py --tail
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e  # noqa: E402

from tools._driver_sim import (  # noqa: E402
    SF_DEFAULT,
    make_duck,
    make_spark,
    value_hash,
)


def main() -> int:
    qs, oracles = e.queries(), e.oracle_sql()
    names = sys.argv[1:]
    if names in (["--window"], ["--tail"]):
        from flink_user_behavior_analysis_spark.queries import GATE_WINDOW

        names = (list(qs)[:GATE_WINDOW] if names == ["--window"]
                 else list(qs)[GATE_WINDOW:])
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown queries:", unknown)
        return 2

    spark = make_spark("drive-subset")
    con = make_duck(SF_DEFAULT)

    fails = []
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, SF_DEFAULT)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name}: rows-only, {len(srows)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        ocur = con.execute(oracles[name])
        ocols = [d[0] for d in ocur.description]
        orows = [dict(zip(ocols, row)) for row in ocur.fetchall()]
        ok_cols = sorted(scols) == sorted(ocols)
        ok_cnt = len(srows) == len(orows)
        ok_hash = (value_hash(srows, scols) == value_hash(orows, ocols)
                   if ok_cols else False)
        ok = ok_cols and ok_cnt and ok_hash
        if not ok:
            fails.append((name, ok_cols, ok_cnt, ok_hash,
                          scols, ocols, len(srows), len(orows)))
        print(f"  {name}: {'OK' if ok else 'MISMATCH'} "
              f"spark={len(srows)} duck={len(orows)} "
              f"({time.time() - t0:.1f}s)")

    for f in fails:
        print("FAIL DETAIL:", f)
    if fails:
        return 1
    print("SUBSET CHECKS PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
