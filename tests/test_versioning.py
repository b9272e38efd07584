"""Unit tests for the snapshot-diff operator (operators/versioning.py)
and the frequency-cap operator (operators/sampling.py) added r11.

snapshot_diff pins:
- each status class (added / removed / changed) on a hand-built pair,
- unchanged rows are dropped,
- multi-column keys join null-safely,
- content null is sentinel-encoded, distinct from empty string,
- separator/sentinel/escape bytes inside content cannot alias field
  boundaries (injective escape encoding, ADVICE r11).

frequency_cap pins:
- at most cap rows kept per key, the BEST rows by the given order,
- rank is total (deterministic under a unique tiebreak),
- every input row survives with an audit flag (nothing silently lost).
"""

from flink_user_behavior_analysis_spark.operators import snapshot_diff
from flink_user_behavior_analysis_spark.operators.sampling import (
    frequency_cap,
)

DOC_SCHEMA = "doc_id long, text string, source string"


def _diff(spark, old_rows, new_rows, keys=("doc_id",)):
    old = spark.createDataFrame(old_rows, DOC_SCHEMA)
    new = spark.createDataFrame(new_rows, DOC_SCHEMA)
    out = snapshot_diff(old, new, list(keys), ["text", "source"])
    return {tuple(r[k] for k in keys): r["status"] for r in out.collect()}


def test_snapshot_diff_statuses_and_unchanged_dropped(spark):
    old = [(1, "a", "s"), (2, "b", "s"), (3, "c", "s")]
    new = [(2, "b", "s"), (3, "c2", "s"), (4, "d", "s")]
    got = _diff(spark, old, new)
    assert got == {(1,): "removed", (3,): "changed", (4,): "added"}


def test_snapshot_diff_null_is_distinct_from_empty(spark):
    # nulls are sentinel-encoded, so a null<->'' flip IS a change and
    # ('a', null) does not collide with (null, 'a') positions
    old = [(1, None, "s"), (2, "x", None)]
    new = [(1, "", "s"), (2, None, "x")]
    got = _diff(spark, old, new)
    assert got == {(1,): "changed", (2,): "changed"}


def test_snapshot_diff_fp_columns_nullness_matches_status(spark):
    old = spark.createDataFrame([(1, "a", "s")], DOC_SCHEMA)
    new = spark.createDataFrame([(2, "b", "s")], DOC_SCHEMA)
    rows = {r["status"]: r
            for r in snapshot_diff(old, new, ["doc_id"],
                                   ["text", "source"]).collect()}
    assert rows["removed"]["old_fp"] and rows["removed"]["new_fp"] is None
    assert rows["added"]["new_fp"] and rows["added"]["old_fp"] is None


def test_snapshot_diff_multi_column_key(spark):
    old = [(1, "a", "s1"), (1, "a", "s2")]
    new = [(1, "a2", "s1"), (1, "a", "s2")]
    got = _diff(spark, old, new, keys=("doc_id", "source"))
    assert got == {(1, "s1"): "changed"}


def test_snapshot_fingerprint_is_injective_under_control_bytes(spark):
    """ADVICE r11: content containing the literal field separator
    (\\x1f), the null sentinel (\\x00), or the escape byte (\\x1b)
    must NOT alias distinct (field1, field2) splits to one
    fingerprint — a real change would then report as unchanged."""
    from flink_user_behavior_analysis_spark.operators.versioning import (
        fingerprint_snapshot,
    )

    rows = [
        (1, "a\x1fb", "c"),     # separator inside field 1
        (2, "a", "b\x1fc"),     # same bytes, different split
        (3, "\x00", "x"),       # literal NUL content ...
        (4, None, "x"),         # ... vs actual null
        (5, "\x1b\x1f", "x"),   # escape byte adjacent to separator
        (6, "\x1b", "\x1fx"),   # same bytes, different split
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    fps = {r["doc_id"]: r["fp"]
           for r in fingerprint_snapshot(
               df, ["doc_id"], ["text", "source"]).collect()}
    assert fps[1] != fps[2]
    assert fps[3] != fps[4]
    assert fps[5] != fps[6]
    # and the escaped pairs really are changes through the diff
    got = _diff(spark, [rows[0], rows[2], rows[4]],
                [rows[1], (3, None, "x"), (5, "\x1b", "\x1fx")])
    assert got == {(1,): "removed", (2,): "added",
                   (3,): "changed", (5,): "changed"}


CAP_SCHEMA = "doc_id long, source string, n_chars long"


def test_frequency_cap_keeps_best_rows_and_audits_rest(spark):
    from pyspark.sql import functions as F

    rows = [(i, "a", 100 + i) for i in range(5)] + [(10, "b", 7)]
    df = spark.createDataFrame(rows, CAP_SCHEMA)
    out = frequency_cap(df, ["source"], 3,
                        [F.col("n_chars").desc(), F.col("doc_id").asc()])
    got = {r["doc_id"]: (r["cap_rank"], r["kept"]) for r in out.collect()}
    assert len(got) == 6                      # nothing dropped
    kept_a = sorted(d for d, (_, k) in got.items() if k and d != 10)
    assert kept_a == [2, 3, 4]                # the 3 longest in 'a'
    assert got[10] == (1, True)               # under-cap key all kept
    assert got[0] == (5, False) and got[1] == (4, False)


def test_frequency_cap_deterministic_under_ties(spark):
    from pyspark.sql import functions as F

    rows = [(i, "a", 50) for i in range(6)]   # all-tied quality
    df = spark.createDataFrame(rows, CAP_SCHEMA)
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    first = {r["doc_id"]: r["cap_rank"]
             for r in frequency_cap(df, ["source"], 2, order).collect()}
    second = {r["doc_id"]: r["cap_rank"]
              for r in frequency_cap(df.repartition(5), ["source"], 2,
                                     order).collect()}
    assert first == second == {i: i + 1 for i in range(6)}


def test_snapshot_diff_over_bucketed_snapshots_is_exchange_free(spark, sf_dir):
    """The operator docstring's 100 TB claim, machine-checked: two
    snapshots stored bucketed on the key diff with ZERO shuffle
    Exchange (the full-outer join co-locates on the bucket layout),
    and produce the same rows as the plain-path diff that shuffles."""
    from pyspark.sql import functions as F

    from flink_user_behavior_analysis_spark.sources import load_table
    from flink_user_behavior_analysis_spark.sources.readers import (
        write_bucketed,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0).select(
        "doc_id", "text", "source")
    new = docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text")).alias("text"),
        "source",
    )
    write_bucketed(old, "t_snap_old", "doc_id", 4, sort_col="doc_id")
    write_bucketed(new, "t_snap_new", "doc_id", 4, sort_col="doc_id")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        diff = snapshot_diff(spark.table("t_snap_old"),
                             spark.table("t_snap_new"),
                             ["doc_id"], ["text", "source"])
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed snapshot diff must not shuffle:\n" + plan)
        want = {tuple(r) for r in
                snapshot_diff(old, new, ["doc_id"],
                              ["text", "source"]).collect()}
        got = {tuple(r) for r in diff.collect()}
        assert got == want and len(got) > 0
        # the plain path DOES shuffle at this size, so the assertion
        # above is non-vacuous
        plain_plan = (snapshot_diff(old, new, ["doc_id"], ["text", "source"])
                      ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS t_snap_old")
        spark.sql("DROP TABLE IF EXISTS t_snap_new")


def test_snapshot_stored_probe_equals_inline_and_gates_on_manifest(spark):
    """Stored-fingerprint twin: diffing against the stored fps table
    equals the inline snapshot_diff on the original frames
    (probe == inline IS the claim), a missing/invalidated manifest
    raises instead of diffing half a version, and a rebuild restores
    readiness."""
    import pytest
    from flink_user_behavior_analysis_spark.operators.versioning import (
        snapshot_diff_from_store,
        snapshot_store_fps,
    )
    from flink_user_behavior_analysis_spark.sources.readers import (
        invalidate_manifest,
    )

    prefix = "t_snapfp_unit"
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_fps")
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_manifest")

    old_rows = [(1, "a", "s"), (2, "b", "s"), (3, "c", "s")]
    new_rows = [(2, "b", "s"), (3, "c2", "s"), (4, "d", "s")]
    old = spark.createDataFrame(old_rows, DOC_SCHEMA)
    new = spark.createDataFrame(new_rows, DOC_SCHEMA)

    with pytest.raises(ValueError, match="not ready"):
        snapshot_diff_from_store(spark, prefix, new,
                                 ["doc_id"], ["text", "source"])

    snapshot_store_fps(old, prefix, ["doc_id"], ["text", "source"])
    got = {tuple(r) for r in snapshot_diff_from_store(
        spark, prefix, new, ["doc_id"], ["text", "source"]).collect()}
    want = {tuple(r) for r in snapshot_diff(
        old, new, ["doc_id"], ["text", "source"]).collect()}
    assert got == want and len(got) == 3

    # crash bracket: invalidation makes the probe refuse again
    invalidate_manifest(spark, prefix)
    with pytest.raises(ValueError, match="not ready"):
        snapshot_diff_from_store(spark, prefix, new,
                                 ["doc_id"], ["text", "source"])
    # rebuild restores
    snapshot_store_fps(old, prefix, ["doc_id"], ["text", "source"])
    again = {tuple(r) for r in snapshot_diff_from_store(
        spark, prefix, new, ["doc_id"], ["text", "source"]).collect()}
    assert again == want
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_fps")
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_manifest")


def test_fps_rebuild_quarantines_cdc_ledger(spark):
    """r13 (closing the contract gap one level down from ADVICE r12's
    cycle-collision finding): a snapshot_store_fps REBUILD under a
    prefix with committed CDC slice ids must quarantine them — a
    rebuild invalidates the probe context those slices' verdicts were
    emitted against, so building past them silently would launder
    stale verdicts. Re-delivery (same batch_id) self-heals; the
    lifted id then commits normally."""
    import pytest

    from flink_user_behavior_analysis_spark.operators.versioning import (
        snapshot_store_fps,
    )
    from flink_user_behavior_analysis_spark.sources.readers import (
        QuarantinedBatchesError,
        append_recorded,
        quarantined_batch_ids,
        record_append,
        require_appendable,
    )

    prefix = "t_fps_quar"
    for t in ("fps", "manifest", "appends", "cleared"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
    old = spark.createDataFrame(
        [(1, "a", "s"), (2, "b", "s")], DOC_SCHEMA)
    snapshot_store_fps(old, prefix, ["doc_id"], ["text", "source"])
    # a CDC cycle commits two slice ids against this version
    record_append(spark, prefix, "cyc-0")
    record_append(spark, prefix, "cyc-1")

    # mid-cycle rebuild: both committed ids quarantine
    snapshot_store_fps(old, prefix, ["doc_id"], ["text", "source"])
    assert quarantined_batch_ids(spark, prefix) == ["cyc-0", "cyc-1"]
    assert not append_recorded(spark, prefix, "cyc-0")
    # NEW ids refuse while the quarantine is pending...
    with pytest.raises(QuarantinedBatchesError):
        require_appendable(spark, prefix, "cyc-2", "test")
    # ...but re-delivery of a quarantined id is allowed through and
    # self-heals: once re-committed it stops pending
    require_appendable(spark, prefix, "cyc-0", "test")
    record_append(spark, prefix, "cyc-0")
    assert quarantined_batch_ids(spark, prefix) == ["cyc-1"]
    for t in ("fps", "manifest", "appends", "cleared"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
