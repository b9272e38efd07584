"""Skew-mitigation join: explicit key salting for pathologically hot
join keys.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in
session.py) handles most skew at runtime by splitting oversized
partitions — that is the default answer and needs no code. This
operator is for the residual case AQE can't fix: a *single* key so hot that
even one split of it exceeds executor memory on the build side, or a
deterministic plan is required (no AQE, e.g. streaming). It
implements the classic replicate-and-salt scheme as a first-class,
result-identical drop-in for an inner equi-join:

  left  (skewed):  salt = pmod(xxhash64(<salt_on cols>), B)
  right (small-ish): replicated B times with salt = 0..B-1
  join on (keys..., salt)  ->  exactly the plain join's rows

Cost: right side x B rows shuffled; left side unchanged. Choose B ~
(hot-key rows / rows-per-task). The salt derives from a deterministic
hash of chosen columns (default: xxhash64 over ALL left columns — a
pure function of row content, so it is identical across retries,
repartitions, and cluster layouts), keeping runs reproducible —
unlike the reference's random.nextInt salting (PageView.java:72-73,
M1). Note salting on the JOIN keys alone would be useless (constant
within a key); the non-key columns are what spread a hot key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Inner equi-join with the left side salted against key skew.

    Returns the same rows as ``left.join(right, on, 'inner')`` with
    the join key spread over ``salt_buckets`` partitions per key.

    The salt must derive from columns OUTSIDE the join keys: a salt
    computed only from key columns is constant within each key and the
    mitigation silently does nothing. The default (all left columns)
    excludes map-typed columns, which ``xxhash64`` cannot hash; if the
    remaining columns are a subset of the join keys, a ``ValueError``
    asks for an explicit ``salt_on``.
    """
    if salt_on:
        salt_cols = list(salt_on)
    else:
        salt_cols = [
            f.name for f in left.schema.fields
            if not isinstance(f.dataType, MapType)
        ]
    if set(salt_cols) <= set(on):
        raise ValueError(
            f"salted_join: effective salt columns {salt_cols} are a "
            f"subset of the join keys {list(on)} — the salt would be "
            f"constant per key and spread nothing. Pass salt_on= with "
            f"at least one hashable non-key column (or add one, e.g. a "
            f"monotonically_increasing_id)."
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)
    )
    lsalted = left.withColumn("_salt", salt.cast("int"))
    rreplicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    joined = lsalted.join(rreplicated, [*on, "_salt"], "inner")
    return joined.drop("_salt")
