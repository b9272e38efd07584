"""Driver-simulation: consume __spark_entry__ exactly as the round driver does."""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "8g")
    .appName("drive-contract")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# 1. entry() smoke — rows >= 0, stable schema across two calls
df1 = e.entry(spark)
rows = df1.collect()
df2 = e.entry(spark)
assert df1.schema == df2.schema, "entry schema unstable"
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df1.schema.fields]}")

# 2. queries() vs oracle_sql() at sf0.01 — driver-style hash compare
SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def value_hash(rows, cols):
    cols = sorted(cols)
    lines = sorted(
        "|".join(repr(r[c]) for c in cols) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

qs, oracles = e.queries(), e.oracle_sql()
assert set(oracles) <= set(qs), f"oracle keys not in queries: {set(oracles)-set(qs)}"
fails = []
for name, fn in qs.items():
    t0 = time.time()
    sdf = fn(spark, SF)
    srows = [r.asDict() for r in sdf.collect()]
    scols = sdf.columns
    if name not in oracles:
        print(f"  {name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)")
        continue
    ocur = con.execute(oracles[name])
    ocols = [d[0] for d in ocur.description]
    orows = [dict(zip(ocols, row)) for row in ocur.fetchall()]
    ok_cols = sorted(scols) == sorted(ocols)
    ok_cnt = len(srows) == len(orows)
    ok_hash = value_hash(srows, scols) == value_hash(orows, ocols) if ok_cols else False
    status = "OK" if (ok_cols and ok_cnt and ok_hash) else "MISMATCH"
    if status != "OK":
        fails.append((name, ok_cols, ok_cnt, ok_hash, scols, ocols, len(srows), len(orows)))
    print(f"  {name}: {status} spark={len(srows)} duck={len(orows)} ({time.time()-t0:.1f}s)")

if fails:
    for f in fails:
        print("FAIL DETAIL:", f)
    sys.exit(1)
print("ALL CONTRACT CHECKS PASS")
