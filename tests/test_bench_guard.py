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
    prev = bench._prev_committed_bench()
    head = json.loads(subprocess.run(
        ["git", "-C", REPO, "show", "HEAD:bench_out.json"],
        capture_output=True, text=True, check=True).stdout)
    if head.get("degraded"):
        assert prev == {}
    else:
        assert prev == {k: float(v)
                        for k, v in head["queries"].items()}
        assert prev and all(isinstance(v, float) for v in prev.values())


def test_degraded_artifact_is_not_a_baseline(tmp_path):
    """A degraded (load-inflated) artifact must NOT become the
    cross-round baseline — chasing its walls would rerun every
    healthy row. Simulated by pointing the loader at a checkout-less
    dir holding a degraded bench_out.json (git show fails there, so
    the on-disk fallback is exercised too)."""
    bench = _bench_module()
    payload = {"queries": {"q1": 1.0}, "degraded": True}
    (tmp_path / "bench_out.json").write_text(json.dumps(payload))
    assert bench._prev_committed_bench(str(tmp_path)) == {}
    payload["degraded"] = False
    (tmp_path / "bench_out.json").write_text(json.dumps(payload))
    assert bench._prev_committed_bench(str(tmp_path)) == {"q1": 1.0}


def test_load_guard_refuses_without_force(monkeypatch, capsys):
    """main() must exit(2) before building a session when the 1-min
    loadavg exceeds the guard and no force flag is set."""
    import pytest

    bench = _bench_module()
    monkeypatch.setattr(bench.os, "getloadavg",
                        lambda: (bench.LOAD_GUARD + 1.0, 0.0, 0.0))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 2
    assert "refusing to run" in capsys.readouterr().err


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
