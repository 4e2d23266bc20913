"""Fused Pallas conv-block0 kernel vs the XLA conv chain (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.ops.pallas_conv import pallas_conv_block0


def reference_block(x, w, b, scale, bias, mean, var, eps, pool):
    import flax.linen as nn

    y = jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
    ) + b
    y = jax.nn.relu(y)
    y = (y - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return nn.max_pool(y, (pool,), (pool,))


@pytest.mark.parametrize("contract", ["vpu_t", "dotg"])
@pytest.mark.parametrize("k,pool,T,C", [(32, 4, 512, 128), (32, 4, 1280, 16),
                                        (8, 2, 256, 32)])
def test_pallas_block0_matches_xla(k, pool, T, C, contract):
    rng = np.random.default_rng(0)
    B = 4
    x = jnp.asarray(rng.standard_normal((B, T, 1)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, 1, C)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, C), jnp.float32)
    eps = 1e-3
    expect = reference_block(x, w, b, scale, bias, mean, var, eps, pool)
    out = pallas_conv_block0(
        x, w, b, scale, bias, mean, var, eps, pool=pool,
        block_rows=2, t_chunk=128, interpret=True, out_dtype=jnp.float32,
        gemm_dtype=jnp.float32, contract=contract,
    )
    assert out.shape == expect.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("contract", ["vpu_t", "dotg"])
def test_pallas_block0_requant_epilogue(contract):
    """requant_scale → int8 output = clip(round(h / s0)) of the f32 block
    output (the serving path's fused s0 fold, models/quant_infer.py)."""
    rng = np.random.default_rng(7)
    C = 16
    x = jnp.asarray(rng.standard_normal((2, 512, 1)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 1, C)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, C), jnp.float32)
    # Scales small enough that some activations clip, so the clamp is
    # exercised, with a floor that keeps round() ties (x.5) measure-zero.
    s0 = jnp.asarray(rng.uniform(0.01, 0.05, C), jnp.float32)
    h = reference_block(x, w, b, scale, bias, mean, var, 1e-3, 4)
    expect = np.clip(np.round(np.asarray(h) / np.asarray(s0)), -127, 127
                     ).astype(np.int8)
    out = pallas_conv_block0(
        x, w, b, scale, bias, mean, var, 1e-3, pool=4, block_rows=2,
        t_chunk=128, interpret=True, gemm_dtype=jnp.float32,
        requant_scale=s0, contract=contract,
    )
    assert out.dtype == jnp.int8
    mismatch = np.mean(np.asarray(out) != expect)
    # borderline round() differences (f32 associativity) may flip an lsb on
    # a tiny fraction of positions; the int8 value must still be within 1
    assert mismatch < 1e-3
    np.testing.assert_array_less(
        np.abs(np.asarray(out, np.int32) - expect.astype(np.int32)), 2)


def test_pallas_block0_nonmultiple_tout():
    """t_out not a multiple of t_chunk → padded positions sliced off."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 600, 1)), jnp.float32)  # t_out=150
    w = jnp.asarray(rng.standard_normal((32, 1, 16)) * 0.2, jnp.float32)
    z = jnp.zeros((16,), jnp.float32)
    o = jnp.ones((16,), jnp.float32)
    expect = reference_block(x, w, z, o, z, z, o, 1e-3, 4)
    out = pallas_conv_block0(x, w, z, o, z, z, o, 1e-3, pool=4,
                             block_rows=2, t_chunk=128, interpret=True,
                             out_dtype=jnp.float32, gemm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_pallas_block0_large_pool_small_kernel():
    """pool*n_q > ceil8(win): the scratch must cover every tap group
    (regression for the silent-wrong-output sizing bug)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 512, 1)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 1, 16)) * 0.3, jnp.float32)
    z = jnp.zeros((16,), jnp.float32)
    o = jnp.ones((16,), jnp.float32)
    expect = reference_block(x, w, z, o, z, z, o, 1e-3, 16)
    out = pallas_conv_block0(x, w, z, o, z, z, o, 1e-3, pool=16,
                             block_rows=2, t_chunk=32, interpret=True,
                             out_dtype=jnp.float32, gemm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,C,Cout,T", [(3, 8, 16, 128), (3, 16, 8, 250),
                                        (5, 8, 8, 64)])
def test_pallas_blockn_matches_xla(k, C, Cout, T):
    from voicemap_tpu.ops.pallas_conv import pallas_conv_blockn

    rng = np.random.default_rng(3)
    B = 3
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, C, Cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, Cout), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, Cout), jnp.float32)
    expect = reference_block(x, w, b, scale, bias, mean, var, 1e-3, 2)
    out = pallas_conv_blockn(x, w, b, scale, bias, mean, var, 1e-3, pool=2,
                             t_chunk=16, interpret=True,
                             out_dtype=jnp.float32, gemm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,C,Cout,T,dtype", [
    (3, 8, 16, 128, jnp.float32),
    (3, 16, 8, 250, jnp.float32),   # t_out not multiple of chunk
    (5, 8, 8, 64, jnp.float32),
    (3, 8, 16, 128, jnp.bfloat16),  # bf16 streamed input
])
def test_pallas_blockn_streamed_matches_xla(k, C, Cout, T, dtype):
    from voicemap_tpu.ops.pallas_conv import pallas_conv_blockn_streamed

    rng = np.random.default_rng(5)
    B = 3
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, C, Cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, Cout), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, Cout), jnp.float32)
    expect = reference_block(
        x.astype(dtype).astype(jnp.float32), w, b, scale, bias, mean, var,
        1e-3, 2,
    )
    out = pallas_conv_blockn_streamed(
        x.astype(dtype), w, b, scale, bias, mean, var, 1e-3, pool=2,
        t_chunk=32, interpret=True, out_dtype=jnp.float32,
        gemm_dtype=jnp.float32,
    )
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=tol, atol=tol)
