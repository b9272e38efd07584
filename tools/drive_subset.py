"""Driver-simulation for a SUBSET of the contract: same hash compare
as tools/drive_contract.py but only for the query names given on the
command line (or, with --window, the first 50 registry entries — the
exact set the round driver gates).

Usage:
    python tools/drive_subset.py name1 name2 ...
    python tools/drive_subset.py --window
"""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as e
from pyspark.sql import SparkSession


def value_hash(rows, cols):
    cols = sorted(cols)
    lines = sorted("|".join(repr(r[c]) for c in cols) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    qs, oracles = e.queries(), e.oracle_sql()
    names = sys.argv[1:]
    if names == ["--window"]:
        names = list(qs)[:50]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown queries:", unknown)
        return 2

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("drive-subset")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = "/root/testdata/sf0.01"
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    fails = []
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, sf)
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
