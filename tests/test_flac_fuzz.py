"""FLAC decoder fuzzing (VERDICT r2 next #6).

The C++ decoder (data/flac/flac_decoder.cpp) is the one component parsing
untrusted bytes in native code; round 1 found three real memory-safety bugs
there. This test pins the hardened behavior: bit-flipped / truncated /
header-lying mutations of valid encodings must ALWAYS surface as a clean
Python exception (or decode benignly), never crash the process or write out
of bounds. Decoding runs in subprocesses so a segfault fails the test
instead of killing pytest.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_MUTATIONS = 500
CHUNKS = 4  # decode in a few subprocesses so a crash localizes

_CHILD = r"""
import sys
sys.path.insert(0, %r)
from voicemap_tpu.data import flac_ext

paths = sys.argv[1:]
decoded = raised = 0
for p in paths:
    try:
        data, sr = flac_ext.read(p)
        assert data.ndim == 1
        decoded += 1
    except Exception:
        raised += 1
print(f"decoded={decoded} raised={raised}")
""" % (REPO,)


def _make_sources(tmp_path):
    from voicemap_tpu.data import flac_ext

    rng = np.random.default_rng(99)
    srcs = []
    for i, n in enumerate((4000, 9000, 16000)):
        data = (rng.standard_normal(n) * 8000).astype(np.int16)
        p = str(tmp_path / f"src{i}.flac")
        flac_ext.write(p, data, 16000)
        srcs.append(open(p, "rb").read())
    return srcs


def _mutate(blob: bytes, rng) -> bytes:
    b = bytearray(blob)
    kind = rng.integers(0, 3)
    if kind == 0:  # bit flips (1–8 random bits anywhere)
        for _ in range(int(rng.integers(1, 9))):
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
    elif kind == 1:  # truncation (anywhere, including inside headers)
        b = b[: int(rng.integers(1, len(b)))]
    else:  # header length-lying: clobber STREAMINFO fields
        # layout: 'fLaC' (4) + block header (4) + STREAMINFO (34 bytes:
        # blocksizes, framesizes, sr/ch/bps/total-samples packing)
        lo, hi = 8, min(42, len(b))
        for _ in range(int(rng.integers(1, 6))):
            i = int(rng.integers(lo, hi))
            b[i] = int(rng.integers(0, 256))
    return bytes(b)


@pytest.mark.slow
def test_fuzz_mutated_flac_never_crashes(tmp_path):
    srcs = _make_sources(tmp_path)
    rng = np.random.default_rng(1234)
    paths = []
    for m in range(N_MUTATIONS):
        blob = _mutate(srcs[m % len(srcs)], rng)
        p = str(tmp_path / f"mut{m:04d}.flac")
        with open(p, "wb") as f:
            f.write(blob)
        paths.append(p)

    per = (len(paths) + CHUNKS - 1) // CHUNKS
    total_dec = total_raise = 0
    for c in range(CHUNKS):
        chunk = paths[c * per : (c + 1) * per]
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD] + chunk,
            capture_output=True, text=True, timeout=240,
        )
        assert proc.returncode == 0, (
            f"decoder crashed on mutation chunk {c} "
            f"(files {c*per}..{c*per+len(chunk)-1}): rc={proc.returncode}\n"
            f"{proc.stderr[-2000:]}"
        )
        line = proc.stdout.strip().splitlines()[-1]
        d = dict(kv.split("=") for kv in line.split())
        total_dec += int(d["decoded"])
        total_raise += int(d["raised"])
    # Every mutation either decoded benignly or raised cleanly.
    assert total_dec + total_raise == N_MUTATIONS
    # Sanity: the mutations actually hurt — most must raise.
    assert total_raise > N_MUTATIONS // 4, (total_dec, total_raise)


@pytest.mark.slow
def test_fuzz_batch_decode_never_crashes(tmp_path):
    """read_batch (threaded C++ path) over a mix of valid + mutated files."""
    srcs = _make_sources(tmp_path)
    rng = np.random.default_rng(77)
    paths = []
    for m in range(60):
        blob = srcs[m % len(srcs)] if m % 3 == 0 else _mutate(
            srcs[m % len(srcs)], rng
        )
        p = str(tmp_path / f"bm{m:03d}.flac")
        with open(p, "wb") as f:
            f.write(blob)
        paths.append(p)
    child = _CHILD.replace(
        "data, sr = flac_ext.read(p)",
        "data = flac_ext.read_batch([p])[0]; sr = 16000",
    ).replace("assert data.ndim == 1", "assert data is None or data.ndim == 1")
    proc = subprocess.run(
        [sys.executable, "-c", child] + paths,
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
