"""Pooled-GEMM encoder forward vs the standard ConvEncoder (exact parity in
f32, all configs incl. dilated and pool-1 blocks)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.config import EncoderConfig, dilated_4khz
from voicemap_tpu.models.encoder import ConvEncoder
from voicemap_tpu.models.fused_encoder import fused_block_apply, fused_encoder_apply

F32 = dict(compute_dtype="float32")


@pytest.mark.parametrize("k,pool,dil,cin", [(32, 4, 1, 1), (3, 2, 1, 8),
                                            (3, 1, 4, 8), (5, 2, 2, 4)])
def test_fused_block_matches_conv(k, pool, dil, cin):
    import flax.linen as nn

    rng = np.random.default_rng(0)
    B, T, C = 2, 256, 16
    x = jnp.asarray(rng.standard_normal((B, T, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, C)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, C), jnp.float32)
    eps = 1e-3

    y = jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", rhs_dilation=(dil,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b
    y = jax.nn.relu(y)
    y = (y - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    if pool > 1:
        y = nn.max_pool(y, (pool,), (pool,))

    out = fused_block_apply(x, w, b, scale, bias, mean, var, eps,
                            pool=pool, dilation=dil,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y),
                               rtol=1e-4, atol=1e-4)


def test_fused_encoder_matches_standard():
    cfg = EncoderConfig(filters=8, embedding_dim=16, dropout=0.0, **F32)
    model = ConvEncoder(cfg)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 1024, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    expect = model.apply(variables, x, train=False)
    out = fused_encoder_apply(variables, cfg, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_fused_encoder_dilated_config():
    cfg = dataclasses.replace(dilated_4khz().encoder, filters=4, **F32)
    model = ConvEncoder(cfg)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 2048, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    expect = model.apply(variables, x, train=False)
    out = fused_encoder_apply(variables, cfg, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=2e-4)


def test_fast_embed_matches_standard_cpu():
    """On CPU the fast path falls back to pure XLA blocks — exact parity."""
    from voicemap_tpu.models.fast_infer import fast_embed

    cfg = EncoderConfig(filters=8, embedding_dim=16, dropout=0.0, **F32)
    model = ConvEncoder(cfg)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 1024, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    expect = model.apply(variables, x, train=False)
    out = fast_embed(variables, cfg, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Pallas path")
def test_fast_embed_matches_standard_tpu():
    from voicemap_tpu.models.fast_infer import fast_embed

    cfg = EncoderConfig(filters=128, embedding_dim=64, dropout=0.0)  # bf16
    model = ConvEncoder(cfg)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((8, 12000, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    expect = model.apply(variables, x, train=False)
    out = fast_embed(variables, cfg, x)
    # bf16 end-to-end: allow bf16-scale tolerance on the final embedding.
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=0.05, atol=0.05)


def test_fast_embed_nondivisible_time_axis():
    """Pooling must floor like nn.max_pool (T=250→125→62 with pool 2)."""
    from voicemap_tpu.models.fast_infer import fast_embed

    cfg = EncoderConfig(filters=4, embedding_dim=8, dropout=0.0, **F32)
    model = ConvEncoder(cfg)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 1000, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    expect = model.apply(variables, x, train=False)
    out = fast_embed(variables, cfg, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)
