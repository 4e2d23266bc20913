"""ctypes bindings for the first-party C++ FLAC decoder.

Builds ``flac/flac_decoder.cpp`` on demand with g++ (no pybind11 in the
image; plain extern-"C" + ctypes per the environment constraints) and exposes:

- ``probe(path)`` → (n_samples, sample_rate) — STREAMINFO-only, no decode
  (replaces the reference's per-file soundfile length probe, SURVEY.md §3.3);
- ``read(path)`` → (int16 (n,), sample_rate) — full decode, stereo downmixed;
- ``read_batch(paths, n_threads)`` — multi-threaded batch decode (the GIL is
  released for the whole batch; this is the host side of the streaming
  pipeline's decode pool);
- ``write(path, data, sample_rate)`` — via the pure-Python encoder
  (``flac_enc``), used by tests and the synthetic corpus generator.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "flac", "flac_decoder.cpp")
_LIB_PATH = os.path.join(_HERE, "flac", "libvmflac.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the decoder shared library if needed. Returns its path."""
    with _lock:
        if (
            not force
            and os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
        ):
            return _LIB_PATH
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            _SRC, "-o", _LIB_PATH,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    path = build()
    lib = ctypes.CDLL(path)
    lib.vm_flac_probe.restype = ctypes.c_int
    lib.vm_flac_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vm_flac_decode.restype = ctypes.c_int64
    lib.vm_flac_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vm_flac_decode_batch.restype = ctypes.c_int
    lib.vm_flac_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    lib.vm_flac_last_error.restype = ctypes.c_char_p
    _lib = lib
    return lib


def _error(lib) -> str:
    return lib.vm_flac_last_error().decode("utf-8", "replace")


def _probe_full(path: str) -> Tuple[int, int, int]:
    """(n_samples_per_channel, sample_rate, channels) from STREAMINFO only."""
    lib = _load()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.vm_flac_probe(path.encode(), ctypes.byref(n), ctypes.byref(sr),
                           ctypes.byref(ch), ctypes.byref(bps))
    if rc != 0:
        raise IOError(f"FLAC probe failed for {path}: {_error(lib)}")
    return int(n.value), int(sr.value), int(ch.value)


def probe(path: str) -> Tuple[int, int]:
    """(n_samples_per_channel, sample_rate) from STREAMINFO only."""
    n, sr, _ch = _probe_full(path)
    return n, sr


def read(path: str) -> Tuple[np.ndarray, int]:
    """Decode to (int16 (n,), sample_rate); stereo is mean-downmixed."""
    lib = _load()
    n_samples, _sr = probe(path)
    # STREAMINFO total_samples may be 0 (unknown); over-allocate then.
    cap_per_ch = n_samples if n_samples > 0 else 16000 * 60 * 10
    buf = np.empty(cap_per_ch * 8, dtype=np.int16)  # room for ≤8 channels
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    got = lib.vm_flac_decode(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        buf.size,
        ctypes.byref(sr),
        ctypes.byref(ch),
    )
    if got < 0:
        raise IOError(f"FLAC decode failed for {path}: {_error(lib)}")
    nch = int(ch.value)
    data = buf[: got * nch]
    if nch > 1:
        data = data.reshape(-1, nch).mean(axis=1).astype(np.int16)
    else:
        data = data.copy()
    return data, int(sr.value)


def read_batch(
    paths: Sequence[str], n_threads: int = 0
) -> List[np.ndarray]:
    """Decode many files in parallel C++ threads (GIL released once).

    Multi-channel files are mean-downmixed to mono, identical to ``read``,
    so DecodeCache's path choice (batch vs single) can never change the
    waveform a file yields.
    """
    lib = _load()
    n = len(paths)
    bufs = []
    caps = np.empty(n, dtype=np.int64)
    for i, p in enumerate(paths):
        ns, _, nch = _probe_full(p)
        # capacity counts interleaved int16 slots; 2x headroom on top of the
        # channel count covers streams whose STREAMINFO undercounts.
        cap = (ns if ns > 0 else 16000 * 600) * max(1, nch) * 2
        bufs.append(np.empty(cap, dtype=np.int16))
        caps[i] = cap
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_int16) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for b in bufs]
    )
    lens = np.empty(n, dtype=np.int64)
    chans = np.empty(n, dtype=np.int32)
    rc = lib.vm_flac_decode_batch(
        c_paths,
        n,
        c_outs,
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        chans.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(n_threads),
    )
    if rc != 0:
        bad = [paths[i] for i in range(n) if lens[i] < 0]
        raise IOError(f"FLAC batch decode failed for {bad[:3]}{'…' if len(bad) > 3 else ''}: "
                      f"{_error(lib)}")
    out = []
    for i in range(n):
        nch = int(chans[i])
        data = bufs[i][: int(lens[i]) * nch]
        if nch > 1:
            data = data.reshape(-1, nch).mean(axis=1).astype(np.int16)
        out.append(data)
    return out


def write(path: str, data: np.ndarray, sample_rate: int, **kw) -> None:
    """Encode mono int16 → FLAC via the pure-Python encoder (tests/corpora)."""
    from . import flac_enc

    flac_enc.encode_file(path, data, sample_rate, **kw)
