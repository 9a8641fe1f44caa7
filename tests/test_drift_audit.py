"""tools/drift_audit.py gate semantics (pure python, no Spark)."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(tmp_path, old, new):
    a, b = tmp_path / "old.json", tmp_path / "new.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    p = subprocess.run(
        [sys.executable, "tools/drift_audit.py", str(a), str(b)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    return p.returncode, p.stdout


def test_steady_round_passes(tmp_path):
    rc, out = _run(
        tmp_path,
        {"sf": 0.1, "queries": {"q": 2.0}},
        {"sf": 0.1, "queries": {"q": 2.2}},
    )
    assert rc == 0 and "OK" in out


def test_regression_fails(tmp_path):
    rc, out = _run(
        tmp_path,
        {"sf": 0.1, "queries": {"q": 2.0}},
        {"sf": 0.1, "queries": {"q": 3.2}},
    )
    assert rc == 1 and "REGRESSED" in out


def test_sub_floor_and_small_absolute_skipped(tmp_path):
    # 2x ratio but tiny walls: scheduler floor, not a regression
    rc, out = _run(
        tmp_path,
        {"sf": 0.1, "queries": {"q": 0.15, "r": 0.6}},
        {"sf": 0.1, "queries": {"q": 0.30, "r": 0.9}},
    )
    # q: sub-floor skip; r: 1.5x but +0.3s < 0.5s absolute guard
    assert rc == 0 and "skip (sub-floor)" in out


def test_new_queries_have_no_baseline(tmp_path):
    rc, out = _run(
        tmp_path,
        {"sf": 0.1, "queries": {"q": 2.0}},
        {"sf": 0.1, "queries": {"q": 2.1, "brand_new": 5.0}},
    )
    assert rc == 0 and "brand_new" in out


def test_mismatched_scale_factors_refused(tmp_path):
    rc, out = _run(
        tmp_path,
        {"sf": 0.1, "queries": {"q": 2.0}},
        {"sf": 1.0, "queries": {"q": 2.0}},
    )
    assert rc == 2 and "refusing" in out


def test_driver_wrapped_artifacts_parse(tmp_path):
    rc, out = _run(
        tmp_path,
        {"n": 1, "rc": 0, "parsed": {"sf": 0.1, "queries": {"q": 2.0}}},
        {"sf": 0.1, "queries": {"q": 2.1}},
    )
    assert rc == 0


def test_queries_file_indirection(tmp_path):
    # compact driver artifacts point at a sibling per-query detail file
    import json as _json

    (tmp_path / "det.json").write_text(
        _json.dumps({"sf": 1.0, "queries": {"q": 1.0}})
    )
    rc, out = _run(
        tmp_path,
        {"sf": 1.0, "queries_file": "det.json"},
        {"sf": 1.0, "queries": {"q": 1.05}},
    )
    assert rc == 0


def test_load_suspect_exits_3_not_0(tmp_path):
    """A flagged row the canary excuses is 'pending quiet-host
    re-measure', not clean — callers gating on the exit code need the
    distinction (round-9 ADVICE)."""
    rc, out = _run(
        tmp_path,
        {"sf": 0.1, "calibration_sec": 0.70, "queries": {"q": 2.0}},
        # 1.45x query drift, canary 1.5x: normalized 0.97x <= gate
        {"sf": 0.1, "calibration_sec": 1.05, "queries": {"q": 2.9}},
    )
    assert rc == 3 and "LOAD-SUSPECT" in out


def test_regression_beats_load_excuse(tmp_path):
    # canary over the floor but the query drifted far beyond it:
    # normalization must NOT excuse a real regression
    rc, out = _run(
        tmp_path,
        {"sf": 0.1, "calibration_sec": 0.70, "queries": {"q": 2.0}},
        {"sf": 0.1, "calibration_sec": 0.95, "queries": {"q": 4.5}},
    )
    assert rc == 1 and "REGRESSED" in out
