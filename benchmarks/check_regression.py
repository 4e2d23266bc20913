"""Headline throughput-regression gate (round-4 verdict item 2).

Round 4 shipped an unmeasured production-routing change 16 minutes before
the driver's bench and silently regressed the headline 1.81× (67.9k →
37.5k utt/s) — int8 *fidelity* had a gate, throughput did not. This module
is that gate: it keeps a record of the last accepted bare-bench headline
(`benchmarks/headline_record.json`) and compares every fresh default-config
measurement against it.

Policy:
- A fresh value ≥ the record refreshes the record (monotone best-accepted).
- A fresh value below ``TOLERANCE`` × record is a **regression**: bench.py
  adds ``"regression": true`` + the record value to its JSON line and
  prints a loud stderr banner. The measurement is still reported (the gate
  is a tripwire, not a censor).
- Values in between neither update nor flag (run-to-run chip/tunnel noise).
- The record is only consulted/updated for *comparable* runs: same config
  fingerprint, same batch, TPU backend, auto dtype policy. Forced
  ``--int8`` / ``--bf16`` / other batch sizes bypass the gate entirely.
- An *intentional* accepted slowdown (e.g. a fidelity-motivated change) is
  recorded with ``python bench.py --update-headline-record`` — which still
  prints the regression banner once, so the acceptance is a visible act.

Process rule (CLAUDE.md): NO production auto-policy change lands without a
fresh end-to-end bare-bench row in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
RECORD_PATH = os.path.join(_HERE, "headline_record.json")

# Fresh < TOLERANCE × record ⇒ regression. Measured run-to-run spread of the
# bare bench on the axon chip is ≲3% (BASELINE.md round-4/5 repeats); 10%
# headroom keeps the gate quiet on noise and loud on real routing changes
# (the round-4 failure was −45%).
TOLERANCE = 0.90


def load_record(path: Optional[str] = None) -> Optional[dict]:
    path = path or RECORD_PATH
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def write_record(value: float, *, fingerprint: str, batch: int,
                 int8: bool, note: str = "", path: Optional[str] = None) -> dict:
    rec = {
        "utt_per_sec": round(float(value), 2),
        "unit": "utterances/sec/chip",
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "fingerprint": fingerprint,
        "batch": int(batch),
        "int8": bool(int8),
        "note": note or "accepted bare-bench headline",
    }
    path = path or RECORD_PATH
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    return rec


def check_headline(value: float, *, fingerprint: str, batch: int,
                   int8: bool, update: bool = False,
                   path: Optional[str] = None) -> dict:
    """Compare a fresh headline against the record; maybe refresh it.

    Returns ``{"status": ..., "record": float|None, "ratio": float|None}``
    with status ∈ {"no_record", "incomparable", "ok", "improved",
    "regression"}. Writes the record on first run, on improvement, and
    when ``update`` forces acceptance.
    """
    rec = load_record(path)
    if rec is None:
        write_record(value, fingerprint=fingerprint, batch=batch, int8=int8,
                     note="first recorded headline", path=path)
        return {"status": "no_record", "record": None, "ratio": None}
    if rec.get("fingerprint") != fingerprint or rec.get("batch") != batch:
        # Bench geometry changed — the old record measures something else.
        if update:
            write_record(value, fingerprint=fingerprint, batch=batch,
                         int8=int8, note="config changed; record reset",
                         path=path)
        return {"status": "incomparable", "record": rec.get("utt_per_sec"),
                "ratio": None}
    prev = float(rec["utt_per_sec"])
    ratio = value / prev if prev > 0 else None
    if value >= prev:
        write_record(value, fingerprint=fingerprint, batch=batch, int8=int8,
                     path=path)
        return {"status": "improved", "record": prev, "ratio": ratio}
    if value < TOLERANCE * prev:
        if update:
            write_record(value, fingerprint=fingerprint, batch=batch,
                         int8=int8, note="regression explicitly accepted "
                         "(--update-headline-record)", path=path)
        return {"status": "regression", "record": prev, "ratio": ratio}
    return {"status": "ok", "record": prev, "ratio": ratio}
