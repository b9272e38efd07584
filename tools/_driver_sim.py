"""Shared pieces of the driver simulation, imported by BOTH
tools/drive_contract.py (full contract) and tools/drive_subset.py
(targeted subset) so the two cannot drift: the value-hash algorithm,
the Spark session shape, and the DuckDB view bootstrap all mirror
the round driver's compare. Import side-effect free."""
from __future__ import annotations

import hashlib

SF_DEFAULT = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def value_hash(rows, cols) -> str:
    """The driver's order-insensitive value hash: md5 over sorted
    '|'-joined reprs with a column-name-sorted projection."""
    cols = sorted(cols)
    lines = sorted("|".join(repr(r[c]) for c in cols) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def make_spark(app: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName(app)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def make_duck(sf_dir: str = SF_DEFAULT):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con
