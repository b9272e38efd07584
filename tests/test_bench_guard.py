"""Unit coverage for bench.py's round-10 protections: the committed-
baseline loader feeding cross-round adjudication (VERDICT r9 #2) and
the degraded-artifact exclusion backing the load guard (r9 #1). Pure
python — no Spark session."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_prev_committed_bench_reads_git_head():
    """The baseline must come from the COMMITTED bench_out.json (an
    aborted run may have overwritten the working copy), and every
    value must parse as a float keyed by query name."""
    bench = _bench_module()
    prev, fps, self_load = bench._prev_committed_bench()
    head = json.loads(subprocess.run(
        ["git", "-C", REPO, "show", "HEAD:bench_out.json"],
        capture_output=True, text=True, check=True).stdout)
    if head.get("degraded") or             head.get("consumer") != bench.CONSUMER_VERSION:
        # degraded or measured under a different consumer (r12:
        # count()-pruned walls are not comparable to full-column
        # walls) — no baseline
        assert prev == {} and fps == {} and self_load == 0.0
    else:
        assert prev == {k: float(v)
                        for k, v in head["queries"].items()}
        assert prev and all(isinstance(v, float) for v in prev.values())
        assert fps == {k: str(v)
                       for k, v in head.get("plan_fp", {}).items()}
        # the quiet self-envelope that calibrates ROW_LOAD_GUARD
        # (ADVICE r13) is the max over the committed row_load block
        want_load = max((float(x) for v in head.get("row_load", {})
                         .values() for x in v), default=0.0)
        assert self_load == want_load


def test_degraded_artifact_is_not_a_baseline(tmp_path):
    """A degraded (load-inflated) artifact must NOT become the
    cross-round baseline — chasing its walls would rerun every
    healthy row. Simulated by pointing the loader at a checkout-less
    dir holding a degraded bench_out.json (git show fails there, so
    the on-disk fallback is exercised too)."""
    bench = _bench_module()
    payload = {"queries": {"q1": 1.0}, "degraded": True,
               "plan_fp": {"q1": "abc"},
               "consumer": bench.CONSUMER_VERSION}
    (tmp_path / "bench_out.json").write_text(json.dumps(payload))
    assert bench._prev_committed_bench(str(tmp_path)) == ({}, {}, 0.0)
    payload["degraded"] = False
    payload["row_load"] = {"q1": [2.0, 9.5]}
    (tmp_path / "bench_out.json").write_text(json.dumps(payload))
    assert bench._prev_committed_bench(str(tmp_path)) == (
        {"q1": 1.0}, {"q1": "abc"}, 9.5)
    # a clean artifact from a DIFFERENT consumer is equally unusable
    payload["consumer"] = "count-legacy"
    (tmp_path / "bench_out.json").write_text(json.dumps(payload))
    assert bench._prev_committed_bench(str(tmp_path)) == ({}, {}, 0.0)


def test_load_guard_refuses_without_force(monkeypatch, capsys):
    """main() must exit(2) before building a session when the 1-min
    loadavg exceeds the guard and no force flag is set — after the
    bounded wait-for-idle window elapses (zeroed here)."""
    import pytest

    bench = _bench_module()
    monkeypatch.setattr(bench, "WAIT_FOR_IDLE_SEC", 0.0)
    monkeypatch.setattr(bench.os, "getloadavg",
                        lambda: (bench.LOAD_GUARD + 1.0, 0.0, 0.0))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 2
    assert "refusing to run" in capsys.readouterr().err


def test_wait_for_idle_starts_when_load_drops(monkeypatch, capsys):
    """VERDICT r10 #2: a decaying load spike must NOT produce a
    refusal stamp — main() polls inside the wait budget and proceeds
    once loadavg drops under the guard. The session builder is stubbed
    to raise a sentinel so the test proves we got PAST the guard
    without running the whole bench."""
    import pytest

    bench = _bench_module()
    loads = iter([(5.9, 0, 0), (3.1, 0, 0), (0.4, 0, 0)])
    last = [(0.4, 0, 0)]

    def fake_load():
        try:
            last[0] = next(loads)
        except StopIteration:
            pass
        return last[0]

    class Sentinel(RuntimeError):
        pass

    monkeypatch.setattr(bench, "WAIT_FOR_IDLE_SEC", 60.0)
    monkeypatch.setattr(bench, "WAIT_POLL_SEC", 0.05)
    monkeypatch.setattr(bench.os, "getloadavg", fake_load)
    monkeypatch.setattr(
        bench, "get_spark",
        lambda app=None: (_ for _ in ()).throw(Sentinel()))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    with pytest.raises(Sentinel):
        bench.main()
    err = capsys.readouterr().err
    assert "waiting for idle" in err and "idle after" in err


def test_plan_fingerprint_normalizes_session_noise():
    """Two plan strings differing only in exprIds / exchange ids /
    codegen stage ids must fingerprint identically; an operator change
    must move the hash."""
    bench = _bench_module()

    class FakeDF:
        def __init__(self, plan):
            self._plan = plan
            self._jdf = self

        def queryExecution(self):
            return self

        def executedPlan(self):
            return self

        def toString(self):
            return self._plan

    a = ("*(2) HashAggregate(keys=[k#123], functions=[sum(v#124)])\n"
         "+- Exchange hashpartitioning(k#123, 32) [plan_id=42]\n"
         "   +- *(1) Scan parquet [k#123,v#124] [id=#7]")
    b = ("*(5) HashAggregate(keys=[k#991], functions=[sum(v#992)])\n"
         "+- Exchange hashpartitioning(k#991, 32) [plan_id=7]\n"
         "   +- *(4) Scan parquet [k#991,v#992] [id=#88]")
    c = a.replace("HashAggregate", "SortAggregate")
    fa = bench._plan_fingerprint(FakeDF(a))
    assert fa == bench._plan_fingerprint(FakeDF(b))
    assert fa != bench._plan_fingerprint(FakeDF(c))
    assert len(fa) == 12


def test_headline_and_train_inclusive_are_registered():
    """Every bench row and train_vs_serve pair must name a registered
    query — a renamed registry entry must fail here, not silently
    drop out of the artifact."""
    sys.path.insert(0, REPO)
    from flink_user_behavior_analysis_spark.queries import QUERIES

    bench = _bench_module()
    assert set(bench.HEADLINE) <= set(QUERIES)
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    for inline, (stored, _pfx) in bench.TRAIN_INCLUSIVE.items():
        assert inline in bench.HEADLINE and stored in bench.HEADLINE


def test_classify_cross_round_auto_adjudicates_load():
    """VERDICT r12 #4: a row over the cross-round ratio on an
    UNCHANGED plan whose run window overlapped loadavg >
    ROW_LOAD_GUARD must classify as 'load_suspect' —
    machine-adjudicated, not a regression flag a human re-litigates
    every round. Quiet-load over-ratio rows stay 'regression';
    plan-fingerprint moves stay 'expected'; in-band rows stay None
    regardless of load. The threshold must sit ABOVE the bench's own
    quiet-run self-load envelope (measured max 8.7 over 108 rows) —
    at the idle-start guard every row would read suspect."""
    bench = _bench_module()
    assert bench.ROW_LOAD_GUARD > 8.7
    hot = bench.ROW_LOAD_GUARD + 1.5
    f = bench._classify_cross_round
    quiet = 8.0  # inside the bench's own self-load envelope
    assert f(None, 9.9, 1.5, False, [hot, hot]) is None
    assert f(1.0, 1.4, 1.5, False, [hot, hot]) is None
    assert f(1.0, 2.0, 1.5, True, [0.1, 0.1]) == "expected"
    assert f(1.0, 2.0, 1.5, False, [quiet, hot]) == "load_suspect"
    # r14: the LEADING sample predates the row's runs (it is the
    # neighbor's trailing load) — alone it must NOT excuse a
    # regression; only samples overlapping the runs corroborate
    assert f(1.0, 2.0, 1.5, False, [hot, quiet]) == "regression"
    assert f(1.0, 2.0, 1.5, False, [hot, quiet, hot]) == "load_suspect"
    assert f(1.0, 2.0, 1.5, False, [0.1, 0.2]) == "regression"
    # bench self-load alone (under the row guard) is NOT an excuse
    assert f(1.0, 2.0, 1.5, False, [quiet, quiet]) == "regression"
    # plan change wins over load: the wall moved because the plan did
    assert f(1.0, 2.0, 1.5, True, [hot, hot]) == "expected"
    assert f(1.0, 2.0, 1.5, False, []) == "regression"


def test_small_row_band_policy():
    """r13: sub-second rows get the measured VM/warmth band ratio
    (every adjudicated sub-second flag r10-r13 was the band, never a
    plan defect); rows >= SMALL_ROW_WALL keep the tight global ratio;
    a named override beats both. prev=None (new row) must fall back
    to the global ratio, not crash."""
    bench = _bench_module()
    f = bench._cross_round_ratio
    assert f("anything", 0.5) == bench.SMALL_ROW_RATIO
    assert f("anything", 0.999) == bench.SMALL_ROW_RATIO
    assert f("anything", 1.0) == bench.CROSS_ROUND_RATIO
    assert f("anything", 4.2) == bench.CROSS_ROUND_RATIO
    assert f("anything", None) == bench.CROSS_ROUND_RATIO
    try:
        bench.CROSS_ROUND_RATIO_OVERRIDE["pinned_row"] = 9.9
        assert f("pinned_row", 0.5) == 9.9
        assert f("pinned_row", 5.0) == 9.9
    finally:
        del bench.CROSS_ROUND_RATIO_OVERRIDE["pinned_row"]


def test_compact_summary_fits_tail_window():
    """VERDICT r11 #1: the driver keeps only ~2 KB of stdout tail, so
    the LAST printed line must be a self-contained summary that parses
    alone. Feed the real committed payload through _compact_summary and
    assert the line stays under the budget with the required keys."""
    bench = _bench_module()
    with open(os.path.join(REPO, "bench_out.json")) as fh:
        payload = json.load(fh)
    line = json.dumps(bench._compact_summary(payload))
    assert len(line) <= bench.TAIL_BUDGET_BYTES
    got = json.loads(line)
    for key in ("metric", "value", "unit", "sf", "degraded",
                "n_rows", "queries_file"):
        assert key in got
    assert got["n_rows"] == len(payload["queries"])
    assert got["value"] == payload["value"]
    # the budget must hold even if the registry grows 10x: the summary
    # size is independent of the number of queries by construction
    payload_big = dict(payload)
    payload_big["queries"] = {f"q{i}": 1.0 for i in range(1500)}
    assert len(json.dumps(bench._compact_summary(payload_big))) \
        <= bench.TAIL_BUDGET_BYTES


def test_headline_covers_every_registered_query():
    """VERDICT r13 #3: 25 registered queries had correctness gates
    but no per-round wall, so a perf regression there was invisible
    to the cross-round adjudicator. Policy now: HEADLINE must cover
    the ENTIRE registry — a new queries() entry without a bench row
    fails here, not silently ships untimed."""
    sys.path.insert(0, REPO)
    from flink_user_behavior_analysis_spark.queries import QUERIES

    bench = _bench_module()
    missing = sorted(set(QUERIES) - set(bench.HEADLINE))
    assert missing == [], f"registered but never benched: {missing}"


def test_row_load_guard_is_self_calibrating():
    """ADVICE r13: the committed r13 artifact's own quiet row_load
    peaked at 11.08 — above the static 11.0 — so the constant is now
    a floor and the effective guard scales with the committed
    artifact's measured self-envelope. The classifier must honor a
    passed guard over the module constant."""
    bench = _bench_module()
    f = bench._classify_cross_round
    assert bench.ROW_LOAD_GUARD_MARGIN > 1.0
    # guard floor behavior unchanged when no baseline envelope exists
    assert max(bench.ROW_LOAD_GUARD,
               bench.ROW_LOAD_GUARD_MARGIN * 0.0) == bench.ROW_LOAD_GUARD
    # with the r13 envelope (11.08), a quiet row at load 11.5 is NOT
    # excused as load_suspect under the scaled guard (13.85) — it is
    # a genuine regression; under the old constant it was excused
    guard = max(bench.ROW_LOAD_GUARD,
                bench.ROW_LOAD_GUARD_MARGIN * 11.08)
    assert f(1.0, 2.0, 1.5, False, [11.5, 11.5], guard=guard) == \
        "regression"
    assert f(1.0, 2.0, 1.5, False, [11.5, 11.5]) == "load_suspect"
    # genuinely hot windows still classify as load_suspect
    assert f(1.0, 2.0, 1.5, False, [guard + 1.0], guard=guard) == \
        "load_suspect"


def test_documented_band_rows_keep_band_ratio_above_the_wall():
    """ADVICE r13: contamination's PERF-studied quiet band is
    0.75-1.83 s — it straddles SMALL_ROW_WALL, so a round committing
    it just above 1 s must not revert the row to the tight global
    ratio (the next fresh session's ~1.8 s floor would re-flag it
    every round). The documented-band override pins both rows at the
    band ratio regardless of which side of the wall they commit."""
    bench = _bench_module()
    for name in ("contamination", "contamination_stored"):
        assert bench._cross_round_ratio(name, 1.2) == \
            bench.SMALL_ROW_RATIO
        assert bench._cross_round_ratio(name, 0.8) == \
            bench.SMALL_ROW_RATIO
    # unpinned rows: the wall still splits tight vs band
    assert bench._cross_round_ratio("pricing_summary", 1.2) == \
        bench.CROSS_ROUND_RATIO
    assert bench._cross_round_ratio("pricing_summary", 0.8) == \
        bench.SMALL_ROW_RATIO
