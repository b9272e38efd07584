"""Replicate the driver's correctness gate locally: run the Spark
query and the DuckDB oracle on the same parquet tables and compare
row count, schema shape, and order-insensitive values."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif np.issubdtype(out[c].dtype, np.floating):
            out[c] = out[c].round(9)
        elif np.issubdtype(out[c].dtype, np.integer):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(spark_df, duck_sql: str, sf_dir: str) -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    sp = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
        dk = con.execute(duck_sql).df()
    finally:
        con.close()
    assert len(sp) == len(dk), (
        f"row count mismatch: spark={len(sp)} duckdb={len(dk)}"
    )
    assert sorted(sp.columns) == sorted(dk.columns), (
        f"column mismatch: spark={sorted(sp.columns)} duckdb={sorted(dk.columns)}"
    )
    nsp, ndk = _normalize(sp), _normalize(dk)
    for c in nsp.columns:
        a, b = nsp[c], ndk[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(
            b.dtype, np.floating
        ):
            both_nan = a.isna() & b.isna()
            close = np.isclose(
                a.fillna(0.0).astype(float),
                b.fillna(0.0).astype(float),
                rtol=0,
                atol=1e-9,
            )
            ok = (both_nan | close).all()
        else:
            ok = a.equals(b)
        if not ok:
            diff = nsp[c].compare(ndk[c]) if len(nsp) == len(ndk) else None
            raise AssertionError(
                f"value mismatch in column {c!r}:\n{diff}"
            )
