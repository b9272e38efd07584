"""Unit tests for the as-of join operator (operators/asof.py).

Pins the edge semantics the DuckDB oracle also encodes:
- tie at equal timestamps matches ("at or before" is inclusive),
- tolerance boundary is inclusive (gap == tolerance matches),
- gap just past tolerance yields null match,
- same-ts right rows break ties by order_tiebreak (max carried),
- a later right row never matches an earlier left row.
"""

from datetime import datetime, timezone

from flink_user_behavior_analysis_spark.operators import asof_join


def _ts(sec):
    return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)


SCHEMA = "k long, ts timestamp, event_id long"


def _run(spark, left_rows, right_rows, tol=None):
    left = spark.createDataFrame(left_rows, SCHEMA)
    right = spark.createDataFrame(right_rows, SCHEMA)
    out = asof_join(
        left, right, ["k"], "ts", "ts",
        right_cols=["event_id"], tolerance_seconds=tol,
        order_tiebreak=["event_id"],
    )
    return {
        (r["k"], r["ts"]): (r["ts_asof"], r["event_id_asof"])
        for r in out.collect()
    }


def test_tie_and_tolerance_boundaries(spark):
    left = [(1, _ts(100), 10), (1, _ts(200), 11), (2, _ts(50), 12)]
    right = [
        (1, _ts(100), 20),   # tie with left@100 -> matches it
        (1, _ts(140), 21),   # latest before 200, gap 60 == tol
        (2, _ts(60), 22),    # after left@50 -> no match
    ]
    got = _run(spark, left, right, tol=60)
    us = 1_000_000
    assert got[(1, _ts(100))] == (100 * us, 20)
    assert got[(1, _ts(200))] == (140 * us, 21)   # inclusive tolerance
    assert got[(2, _ts(50))] == (None, None)      # future right ignored


def test_past_tolerance_is_null_and_no_tol_keeps(spark):
    left = [(1, _ts(200), 10)]
    right = [(1, _ts(139), 20)]
    assert _run(spark, left, right, tol=60)[(1, _ts(200))] == (None, None)
    assert _run(spark, left, right)[(1, _ts(200))] == (139 * 1_000_000, 20)


def test_same_ts_right_rows_tiebreak_max_event_id(spark):
    left = [(1, _ts(100), 10)]
    right = [(1, _ts(90), 21), (1, _ts(90), 23), (1, _ts(90), 22)]
    assert _run(spark, left, right)[(1, _ts(100))] == (90 * 1_000_000, 23)


def _run_fwd(spark, left_rows, right_rows, tol=None):
    left = spark.createDataFrame(left_rows, SCHEMA)
    right = spark.createDataFrame(right_rows, SCHEMA)
    out = asof_join(
        left, right, ["k"], "ts", "ts",
        right_cols=["event_id"], tolerance_seconds=tol,
        order_tiebreak=["event_id"], direction="forward",
    )
    return {
        (r["k"], r["ts"]): (r["ts_asof"], r["event_id_asof"])
        for r in out.collect()
    }


def test_forward_earliest_at_or_after_with_tie(spark):
    us = 1_000_000
    left = [(1, _ts(100), 10), (1, _ts(200), 11), (2, _ts(50), 12)]
    right = [
        (1, _ts(100), 20),   # tie with left@100 -> matches ("at or after")
        (1, _ts(150), 21),   # skipped by left@100 (100 is nearer)
        (1, _ts(250), 22),   # earliest after 200
        (2, _ts(40), 23),    # before left@50 -> never matches forward
    ]
    got = _run_fwd(spark, left, right)
    assert got[(1, _ts(100))] == (100 * us, 20)
    assert got[(1, _ts(200))] == (250 * us, 22)
    assert got[(2, _ts(50))] == (None, None)


def test_forward_tolerance_and_same_ts_tiebreak(spark):
    us = 1_000_000
    left = [(1, _ts(100), 10)]
    right = [(1, _ts(170), 21), (1, _ts(170), 25), (1, _ts(170), 23)]
    # gap 70 > tol 60 -> null; no tol -> max-tiebreak row at 170
    assert _run_fwd(spark, left, right, tol=60)[(1, _ts(100))] == (None, None)
    assert _run_fwd(spark, left, right)[(1, _ts(100))] == (170 * us, 25)
    assert _run_fwd(spark, left, right, tol=70)[(1, _ts(100))] == (170 * us, 25)


def test_direction_is_validated(spark):
    import pytest

    left = spark.createDataFrame([(1, _ts(1), 1)], SCHEMA)
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, ["k"], "ts", "ts",
                  right_cols=["event_id"], direction="sideways")


def test_sliced_carry_equals_single_window(spark, sf_dir):
    """r12 skew parallelization: the segmented-scan path
    (slice_seconds) must reproduce the single-window pass EXACTLY —
    both directions, with and without tolerance, on real event data
    whose keys repeat across slices — including a slice width small
    enough that most matches cross slice boundaries (the inherited-
    carry path does the work) and one so large everything is local."""
    from pyspark.sql import functions as F

    from flink_user_behavior_analysis_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id")
    right = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    for direction in ("backward", "forward"):
        for tol in (None, 3600.0):
            want = asof_join(left, right, ["user_id"], "ts", "ts",
                             right_cols=["event_id"],
                             tolerance_seconds=tol,
                             order_tiebreak=["event_id"],
                             direction=direction)
            for width, thresh in ((60.0, None), (10**9, None),
                                  (60.0, 5), (60.0, 10**9)):
                # thresh=5: most keys route through the sliced half;
                # thresh=1e9: no key is hot, pure plain-window path
                # through the hybrid plumbing
                got = asof_join(left, right, ["user_id"], "ts", "ts",
                                right_cols=["event_id"],
                                tolerance_seconds=tol,
                                order_tiebreak=["event_id"],
                                direction=direction,
                                slice_seconds=width,
                                hot_key_threshold=thresh)
                assert rows(got) == rows(want), (direction, tol,
                                                 width, thresh)
    assert asof_join(left, right, ["user_id"], "ts", "ts",
                     slice_seconds=60.0).count() == left.count()
    import pytest

    with pytest.raises(ValueError, match="requires slice_seconds"):
        asof_join(left, right, ["user_id"], "ts", "ts",
                  hot_key_threshold=10)


def test_sliced_carry_tie_and_null_payload_semantics(spark):
    """Slice-boundary edges the equivalence sweep can miss: a tie
    (right.ts == left.ts) always resolves locally (same floor), and
    null right payloads keep the PER-COLUMN independent carry of the
    single-window pass (ts from the newest right, payload from the
    newest NON-NULL one, even across a slice boundary)."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, _ts(100), 10), (1, _ts(250), 11)], SCHEMA)
    right = spark.createDataFrame(
        [(1, _ts(100), 20),      # tie: same slice as left@100
         (1, _ts(40), 21),
         (1, _ts(230), None)],   # newest right, null payload
        "k long, ts timestamp, event_id long")

    def run(**kw):
        out = asof_join(left, right, ["k"], "ts", "ts",
                        right_cols=["event_id"],
                        order_tiebreak=["ts"], **kw)
        return {(r["k"], r["ts"]): (r["ts_asof"], r["event_id_asof"])
                for r in out.collect()}

    for width in (None, 50.0):
        got = run() if width is None else run(slice_seconds=width)
        # left@100: tie right@100 wins over right@40
        assert got[(1, _ts(100))] == (100 * 1_000_000, 20)
        # left@250: ts carried from right@230, payload from the last
        # NON-NULL one (right@100) — per-column independence
        assert got[(1, _ts(250))] == (230 * 1_000_000, 20)
