"""Throughput-regression gate (benchmarks/check_regression.py).

Round-4 verdict item 2: the gate must demonstrably fire on a synthetic
slowdown of the same magnitude that shipped in round 4 (−45%), stay quiet
on run-to-run noise, and refresh the record on improvement.
"""

import json

from benchmarks.check_regression import (
    TOLERANCE, check_headline, load_record, write_record,
)

FP = "deadbeef00000000"


def _seed(path, value=67900.0):
    write_record(value, fingerprint=FP, batch=2048, int8=True,
                 path=str(path))


def test_first_run_writes_record(tmp_path):
    p = tmp_path / "rec.json"
    r = check_headline(50000.0, fingerprint=FP, batch=2048, int8=True,
                       path=str(p))
    assert r["status"] == "no_record"
    assert load_record(str(p))["utt_per_sec"] == 50000.0


def test_round4_magnitude_slowdown_fires(tmp_path):
    p = tmp_path / "rec.json"
    _seed(p)
    r = check_headline(37500.0, fingerprint=FP, batch=2048, int8=True,
                       path=str(p))
    assert r["status"] == "regression"
    assert r["record"] == 67900.0
    assert r["ratio"] < TOLERANCE
    # A regression does NOT overwrite the record (the tripwire stays armed).
    assert load_record(str(p))["utt_per_sec"] == 67900.0


def test_noise_band_is_quiet(tmp_path):
    p = tmp_path / "rec.json"
    _seed(p)
    r = check_headline(67900.0 * 0.95, fingerprint=FP, batch=2048,
                       int8=True, path=str(p))
    assert r["status"] == "ok"
    assert load_record(str(p))["utt_per_sec"] == 67900.0


def test_improvement_refreshes_record(tmp_path):
    p = tmp_path / "rec.json"
    _seed(p)
    r = check_headline(70000.0, fingerprint=FP, batch=2048, int8=True,
                       path=str(p))
    assert r["status"] == "improved"
    assert load_record(str(p))["utt_per_sec"] == 70000.0


def test_forced_acceptance_overwrites(tmp_path):
    p = tmp_path / "rec.json"
    _seed(p)
    r = check_headline(37500.0, fingerprint=FP, batch=2048, int8=True,
                       update=True, path=str(p))
    assert r["status"] == "regression"  # still reported loudly once
    rec = load_record(str(p))
    assert rec["utt_per_sec"] == 37500.0
    assert "accepted" in rec["note"]


def test_config_change_is_incomparable(tmp_path):
    p = tmp_path / "rec.json"
    _seed(p)
    r = check_headline(10000.0, fingerprint="0123456789abcdef", batch=2048,
                       int8=True, path=str(p))
    assert r["status"] == "incomparable"
    # Old record untouched without explicit update.
    assert load_record(str(p))["utt_per_sec"] == 67900.0


def test_record_file_is_json(tmp_path):
    p = tmp_path / "rec.json"
    _seed(p, 12345.67)
    with open(p) as f:
        rec = json.load(f)
    assert rec["fingerprint"] == FP and rec["batch"] == 2048
