"""Corpus snapshot diff: what changed between two versions of a
document collection — the data-versioning primitive a training-data
pipeline needs before re-running downstream stages (re-dedup only the
added/changed slice, invalidate packed sequences of removed docs,
audit a vendor re-delivery).

Spark-first shape: one full-outer join on the document key comparing
content fingerprints — never a text comparison (the fingerprint is
computed scan-side, so only (key, 32-byte hash) rows ever shuffle,
regardless of document size). At 100 TB both snapshots live as
bucketed tables on the key, making the diff a zero-exchange
sort-merge join; unbucketed, it is one co-partitioned shuffle of
hash-width rows, and AQE handles the (rare) hot-key skew since keys
are unique per snapshot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_snapshot(
    df: DataFrame,
    key_cols: Sequence[str],
    content_cols: Sequence[str],
) -> DataFrame:
    """(key..., fp) — md5 over the unit-separator-joined content
    columns. Nulls are encoded as an explicit NUL sentinel (never
    skipped — concat_ws would drop both the value AND its separator,
    making ('a', null) collide with (null, 'a') and with 'a' alone),
    so null, '' and absent are three distinct fingerprints and the
    field positions are stable.
    """
    fp = F.md5(F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
          for c in content_cols]))
    return df.select(*key_cols, fp.alias("fp"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    content_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff of two snapshots: (key..., status, old_fp, new_fp)
    with status in {'added', 'removed', 'changed'}; unchanged rows are
    dropped scan-side (the common case at scale — a daily crawl delta
    touches a tiny fraction of the corpus, so the output is small even
    when the inputs are not).

    Keys must be unique AND non-null within each snapshot (document
    primary keys); duplicate keys would fan out the join and
    double-report, null keys would silently drop from the join. Null
    content is sentinel-encoded (see fingerprint_snapshot), so a
    null-vs-'' flip IS reported as a change.
    """
    keys = list(key_cols)
    # alias-qualified references: old and new often share lineage (two
    # filters of the same table), which makes df[col] ambiguous in the
    # self-join — string-qualified names resolve per alias instead
    o = fingerprint_snapshot(old, keys, content_cols).alias("__snap_o")
    n = fingerprint_snapshot(new, keys, content_cols).alias("__snap_n")
    from functools import reduce

    def ocol(c):
        return F.col(f"__snap_o.{c}")

    def ncol(c):
        return F.col(f"__snap_n.{c}")

    # plain equality, NOT eqNullSafe: null-safe equality compiles to
    # coalesce/isnull join keys, which the planner cannot match to a
    # bucket layout (it disables bucketing and shuffles both sides).
    # Snapshot keys are primary keys — non-null by contract — so
    # plain == is both correct and zero-exchange over bucketed tables.
    cond = reduce(lambda a, b: a & b,
                  [ocol(k) == ncol(k) for k in keys])
    joined = o.join(n, cond, "full_outer")
    status = (
        F.when(ocol(keys[0]).isNull(), F.lit("added"))
        .when(ncol(keys[0]).isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    out_keys = [F.coalesce(ocol(k), ncol(k)).alias(k) for k in keys]
    return (
        joined.select(
            *out_keys,
            status.alias("status"),
            ocol("fp").alias("old_fp"),
            ncol("fp").alias("new_fp"),
        )
        .where(
            F.col("old_fp").isNull()
            | F.col("new_fp").isNull()
            | (F.col("old_fp") != F.col("new_fp"))
        )
    )
