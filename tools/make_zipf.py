"""Synthesize zipf-skewed key/token corpora for skew-stress runs.

`make_scale.py` replication is uniform — its hostile case (900x pair
blowup) is OUTPUT skew. This generator builds the other hostile axis,
KEY skew: a power-law key distribution where one key owns ~18% of all
rows (events) and a degenerate vocabulary where a handful of
stop-word-like tokens own most token mass (documents). Each table is
written twice — `zipf` and a same-sized `uniform` control — so a
stress run can report the wall-clock ratio zipf/uniform per operator:
~1.0 means the operator is skew-robust, >>1 means the skew lands on
a real exchange.

Outputs under OUT (default /tmp/zipf):
  events_zipf.parquet / events_uniform.parquet
      event_id, user_id, item_id, behavior, channel, province, ts
      (N rows over a 1-hour span; item_id zipf s=1.2 over 100k keys)
  dim.parquet
      item_id, category — the join right side (one row per key)
  docs_zipf.parquet / docs_uniform.parquet
      doc_id, source, text — D docs x L tokens from a 2k-token vocab,
      zipf s=1.05 (top token ~8% of ALL token mass) vs uniform

Usage: python tools/make_zipf.py [n_events] [n_docs] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/zipf"

N_ITEMS = 100_000
N_USERS = 200_000
DOC_LEN = 200
VOCAB = 2_000
T0_US = 1_700_000_000 * 10**6  # fixed epoch anchor, 1-hour span
SEED = 20260814


def zipf_draw(rng: np.random.Generator, n: int, k: int, s: float) -> np.ndarray:
    """n draws from a zipf(s) pmf over keys 0..k-1 via inverse CDF."""
    p = 1.0 / np.power(np.arange(1, k + 1, dtype=np.float64), s)
    cdf = np.cumsum(p / p.sum())
    return np.searchsorted(cdf, rng.random(n)).astype(np.int64)


def write_events(rng: np.random.Generator, skewed: bool) -> str:
    name = "zipf" if skewed else "uniform"
    if skewed:
        item = zipf_draw(rng, N_EVENTS, N_ITEMS, 1.2)
        user = zipf_draw(rng, N_EVENTS, N_USERS, 1.1)
    else:
        item = rng.integers(0, N_ITEMS, N_EVENTS)
        user = rng.integers(0, N_USERS, N_EVENTS)
    ts = T0_US + rng.integers(0, 3600 * 10**6, N_EVENTS)
    behavior = np.where(rng.random(N_EVENTS) < 0.9, "pv", "buy")
    channels = np.array(["appstore", "wechat", "weibo", "web"])
    provinces = np.array([f"prov_{i}" for i in range(30)])
    tbl = pa.table(
        {
            "event_id": np.arange(N_EVENTS, dtype=np.int64),
            "user_id": user,
            "item_id": item,
            "behavior": behavior,
            "channel": channels[rng.integers(0, len(channels), N_EVENTS)],
            "province": provinces[rng.integers(0, len(provinces), N_EVENTS)],
            # tz-aware so Spark reads TIMESTAMP (unix_micros-compatible),
            # not TIMESTAMP_NTZ
            "ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
        }
    )
    path = f"{OUT}/events_{name}.parquet"
    pq.write_table(tbl, path)
    top = np.bincount(item, minlength=N_ITEMS).max() / N_EVENTS
    print(f"{path}: {N_EVENTS} rows, hottest item share {top:.1%}")
    return path


def write_dim() -> None:
    tbl = pa.table(
        {
            "item_id": np.arange(N_ITEMS, dtype=np.int64),
            "category": np.array(
                [f"cat_{i % 50}" for i in range(N_ITEMS)]
            ),
        }
    )
    pq.write_table(tbl, f"{OUT}/dim.parquet")
    print(f"{OUT}/dim.parquet: {N_ITEMS} rows")


def write_docs(rng: np.random.Generator, skewed: bool) -> None:
    name = "zipf" if skewed else "uniform"
    words = np.array([f"w{i:04d}" for i in range(VOCAB)])
    if skewed:
        tok = zipf_draw(rng, N_DOCS * DOC_LEN, VOCAB, 1.05)
    else:
        tok = rng.integers(0, VOCAB, N_DOCS * DOC_LEN)
    grid = words[tok].reshape(N_DOCS, DOC_LEN)
    texts = [" ".join(row) for row in grid]
    tbl = pa.table(
        {
            "doc_id": np.array([f"d{i:06d}" for i in range(N_DOCS)]),
            "source": np.array(
                [f"src_{i % 8}" for i in range(N_DOCS)]
            ),
            "text": texts,
        }
    )
    pq.write_table(tbl, f"{OUT}/docs_{name}.parquet")
    top = np.bincount(tok, minlength=VOCAB).max() / tok.size
    print(f"{OUT}/docs_{name}.parquet: {N_DOCS} docs, "
          f"hottest token share {top:.1%}")


def write_docs_boiler(rng: np.random.Generator) -> None:
    """Boilerplate corpus — the degenerate-LSH-bucket case max_bucket
    exists for: 10 templates x 400 near-copies (3 of 200 tokens
    mutated per copy, jaccard ~0.95+) on top of 30k unique docs.
    Every copy of a template lands in the same LSH buckets, so the
    uncapped pair join faces C(400,2) x bands candidates per
    template."""
    words = np.array([f"w{i:04d}" for i in range(VOCAB)])
    n_unique, n_templates, n_copies = 30_000, 10, 400
    rows = []
    uniq = words[rng.integers(0, VOCAB, (n_unique, DOC_LEN))]
    rows.extend(" ".join(r) for r in uniq)
    for t in range(n_templates):
        template = words[rng.integers(0, VOCAB, DOC_LEN)]
        for _ in range(n_copies):
            copy = template.copy()
            pos = rng.integers(0, DOC_LEN, 3)
            copy[pos] = words[rng.integers(0, VOCAB, 3)]
            rows.append(" ".join(copy))
    n = len(rows)
    tbl = pa.table(
        {
            "doc_id": np.array([f"b{i:06d}" for i in range(n)]),
            "source": np.array([f"src_{i % 8}" for i in range(n)]),
            "text": rows,
        }
    )
    pq.write_table(tbl, f"{OUT}/docs_boiler.parquet")
    print(f"{OUT}/docs_boiler.parquet: {n} docs "
          f"({n_templates} templates x {n_copies} near-copies)")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    write_events(rng, skewed=True)
    write_events(rng, skewed=False)
    write_dim()
    write_docs(rng, skewed=True)
    write_docs(rng, skewed=False)
    write_docs_boiler(rng)


if __name__ == "__main__":
    main()
