"""Synthesize a larger scale factor from sf0.1 by key-offset
replication, for scale-validation runs only (never for correctness:
replicated text/embeddings create cross-copy duplicates by design).

Each copy i offsets every key column by i * 10^9 so joins stay
consistent (orders.o_custkey -> customer.c_custkey etc.); dimension
tables (region, nation) are left as-is. Timestamps are kept: the same
wall-clock span with more traffic per window is what a real scale-up
looks like for the windowed queries.

Usage: python tools/make_scale.py [copies] [out_dir]
"""

import sys

import duckdb

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
SRC = "/root/testdata/sf0.1"
OFF = 10**9

KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main() -> None:
    import os

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied")
    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(COPIES):
            proj = ", ".join(
                f"{c} + {i * OFF} AS {c}" if c in keys else c for c in cols
            )
            selects.append(f"SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet')")
        union = "\nUNION ALL\n".join(selects)
        con.execute(f"COPY ({union}) TO '{OUT}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
