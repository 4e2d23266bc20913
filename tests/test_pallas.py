"""Pallas kernel parity tests (SURVEY.md §4 item 3): the fused preprocess and
L1-distance kernels against their jnp reference implementations, in
interpreter mode on CPU (compiled-mode parity + timing run on the real chip
via benchmarks/bench_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.ops import distance as dist_ops
from voicemap_tpu.ops import preprocess
from voicemap_tpu.ops.pallas_distance import pallas_l1, pallas_weighted_l1
from voicemap_tpu.ops.pallas_preprocess import (
    pad_store,
    pallas_preprocess,
    quantize_offsets,
)


def reference_chain(store, idx, offs, frag, ds, whiten=True):
    rows = preprocess.gather_fragments(
        jnp.asarray(store), jnp.asarray(idx), jnp.asarray(offs), frag
    )
    rows = rows.astype(jnp.float32) * (1.0 / 32768.0)
    rows = preprocess.stride_decimate(rows, ds)
    if whiten:
        rows = preprocess.whiten(rows)
    return np.asarray(rows)


def make_case(seed, N, T_store, frag, ds, B):
    rng = np.random.default_rng(seed)
    store = rng.integers(-30000, 30000, (N, T_store), dtype=np.int16)
    store_p = np.asarray(pad_store(jnp.asarray(store)))
    idx = rng.integers(0, N, B).astype(np.int32)
    # Sample-granular offsets — the kernel no longer quantizes.
    offs = rng.integers(0, T_store - frag, B).astype(np.int32)
    return store_p, idx, offs


def test_pallas_preprocess_matches_jnp():
    frag, ds, B = 3200, 4, 16
    store_p, idx, offs = make_case(0, 20, 6000, frag, ds, B)
    out = pallas_preprocess(
        jnp.asarray(store_p), jnp.asarray(idx), jnp.asarray(offs),
        frag, ds, interpret=True,
    )
    expect = reference_chain(store_p, idx, offs, frag, ds)
    assert out.shape == (B, frag // ds, 1)
    np.testing.assert_allclose(np.asarray(out)[..., 0], expect, rtol=1e-5, atol=1e-6)


def test_pallas_preprocess_nonmultiple_batch():
    """B % block_rows != 0 pads with duplicate rows and slices back —
    parity must hold for every real row (int8 calibration and protocol
    eval call with arbitrary B)."""
    frag, ds, B = 3200, 4, 11
    store_p, idx, offs = make_case(3, 20, 6000, frag, ds, B)
    out = pallas_preprocess(
        jnp.asarray(store_p), jnp.asarray(idx), jnp.asarray(offs),
        frag, ds, interpret=True,
    )
    expect = reference_chain(store_p, idx, offs, frag, ds)
    assert out.shape == (B, frag // ds, 1)
    np.testing.assert_allclose(np.asarray(out)[..., 0], expect, rtol=1e-5, atol=1e-6)


def test_pallas_preprocess_zero_and_aligned_offsets():
    """fine==0 / lane==0 (roll by full window) and hi==0 paths, plus
    arbitrary sample-granular offsets (lane splice edges 1, 127)."""
    frag, ds, B = 1280, 2, 8
    store_p, idx, _ = make_case(1, 6, 4000, frag, ds, B)
    # Contract: offset + fragment ≤ original length (4000 → max 2720).
    offs = np.asarray([0, 128, 2048, 2048 + 129, 1, 2687, 255, 1920], np.int32)
    out = pallas_preprocess(
        jnp.asarray(store_p), jnp.asarray(idx), jnp.asarray(offs),
        frag, ds, interpret=True,
    )
    expect = reference_chain(store_p, idx, offs, frag, ds)
    np.testing.assert_allclose(np.asarray(out)[..., 0], expect, rtol=1e-5, atol=1e-6)


def test_pallas_preprocess_no_whiten_no_ds():
    frag, B = 1280, 8
    store_p, idx, offs = make_case(2, 6, 4000, frag, 1, B)
    out = pallas_preprocess(
        jnp.asarray(store_p), jnp.asarray(idx), jnp.asarray(offs),
        frag, 1, whiten_rms=None, interpret=True,
    )
    expect = reference_chain(store_p, idx, offs, frag, 1, whiten=False)
    np.testing.assert_allclose(np.asarray(out)[..., 0], expect, rtol=1e-6)


def test_pallas_preprocess_validation():
    store = pad_store(jnp.zeros((4, 2048), jnp.int16))
    # Batch not divisible by block_rows: pads with duplicate rows and
    # slices back (int8 calibration and protocol eval use arbitrary B;
    # the old loud ValueError crashed them on-chip).
    out = pallas_preprocess(store, jnp.zeros(3, jnp.int32), jnp.zeros(3, jnp.int32),
                            1280, 4, block_rows=8, interpret=True)
    assert out.shape[0] == 3
    with pytest.raises(ValueError):  # store not padded
        pallas_preprocess(jnp.zeros((4, 2000), jnp.int16), jnp.zeros(8, jnp.int32),
                          jnp.zeros(8, jnp.int32), 1280, 4, interpret=True)


def test_pallas_predecimated_store_matches_jnp():
    """Fast path: gather from a once-decimated store == raw chain."""
    from voicemap_tpu.ops.pallas_preprocess import decimate_store

    frag, ds, B = 3200, 4, 16
    rng = np.random.default_rng(7)
    store = rng.integers(-30000, 30000, (10, 6000), dtype=np.int16)
    idx = rng.integers(0, 10, B).astype(np.int32)
    # Offsets on the ds grid so the raw chain picks the same decimated
    # samples (a pre-decimated store cannot represent sub-ds phase).
    offs = (rng.integers(0, (6000 - frag) // ds, B) * ds).astype(np.int32)
    store_ds = decimate_store(jnp.asarray(store), ds)
    out = pallas_preprocess(
        store_ds, jnp.asarray(idx), jnp.asarray(offs), frag, ds,
        store_predecimated=True, interpret=True,
    )
    expect = reference_chain(store, idx, offs, frag, ds)
    np.testing.assert_allclose(np.asarray(out)[..., 0], expect, rtol=1e-5, atol=1e-6)


def test_pallas_nonaligned_fragment_length():
    """fragment_length not a multiple of 128 (lane-ceil path + masked whiten)."""
    frag, B = 1000, 8
    store_p, idx, offs = make_case(8, 6, 4000, frag, 1, B)
    out = pallas_preprocess(
        jnp.asarray(store_p), jnp.asarray(idx), jnp.asarray(offs),
        frag, 1, interpret=True,
    )
    expect = reference_chain(store_p, idx, offs, frag, 1)
    assert out.shape == (B, frag, 1)
    np.testing.assert_allclose(np.asarray(out)[..., 0], expect, rtol=1e-5, atol=1e-6)


def test_quantize_offsets_is_identity():
    """Offsets are sample-granular since the lane-rotate refinement; the
    compatibility shim must pass them through untouched."""
    offs = jnp.asarray([0, 1, 127, 128, 129, 5000], jnp.int32)
    np.testing.assert_array_equal(np.asarray(quantize_offsets(offs)), offs)


def test_pad_store():
    s = pad_store(jnp.ones((2, 5000), jnp.int16))
    assert s.shape[1] % 2048 == 0
    assert s.shape[1] >= 5000 + 2175  # worst-case window overrun guard
    assert np.all(np.asarray(s)[:, 5000:] == 0)


def test_pallas_l1_matches_jnp():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((50, 64)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((70, 64)), jnp.float32)
    out = pallas_l1(q, s, block_q=32, block_s=32, rows_per_step=8, interpret=True)
    expect = dist_ops.pairwise_l1(q, s)
    assert out.shape == (50, 70)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_pallas_weighted_l1_matches_jnp():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((33, 64)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((41, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    b = 0.25
    out = pallas_weighted_l1(q, s, w, b, block_q=16, block_s=16,
                             rows_per_step=8, interpret=True)
    expect = dist_ops.pairwise_weighted_l1(q, s, w.reshape(-1, 1), b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_pallas_l1_exact_block_fit():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    out = pallas_l1(q, s, block_q=32, block_s=32, rows_per_step=4, interpret=True)
    expect = dist_ops.pairwise_l1(q, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)
