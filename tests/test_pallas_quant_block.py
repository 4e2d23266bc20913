"""Parity tests for the fused int8 mid-block kernel and the chained
quant_embed routing (ops/pallas_quant_block.py, interpret mode on CPU).

The kernel must be BIT-exact against models/quant_infer._quant_block —
the pool-before-epilogue reordering is an exact monotonicity argument,
not an approximation (see the kernel module docstring)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.config import EncoderConfig
from voicemap_tpu.models.encoder import ConvEncoder
from voicemap_tpu.models.quant_infer import (
    _quant_block,
    quant_embed,
    quantize_encoder,
)
from voicemap_tpu.ops.pallas_quant_block import (
    cat_weights, pallas_quant_block, stack_weights,
)


def _rand_qblk(rng, cin, cout):
    return {
        "w_q": jnp.asarray(
            rng.integers(-127, 128, (3, cin, cout)).astype(np.int8)),
        # alpha crosses zero so the sign-split max/min pooling is exercised
        "alpha": jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.float32),
        "beta": jnp.asarray(rng.standard_normal(cout), jnp.float32),
        "gamma": jnp.asarray(rng.standard_normal(cout), jnp.float32),
    }


@pytest.mark.parametrize("variant", ["pshift", "xk", "xk3"])
@pytest.mark.parametrize(
    "cin,cout,T,t_pad,t_len,last",
    [
        (16, 32, 60, 64, 16, False),   # padded tail + multi-chunk
        (16, 32, 64, 64, 32, False),   # t_valid == t_pad (no pad rows)
        (8, 16, 30, 64, 16, True),     # last block (bf16 out), heavy pad
        (16, 16, 48, 48, 48, False),   # single chunk (both edges in one)
        (16, 16, 48, 48, 64, False),   # t_len > t_pad → auto-halved
    ],
)
def test_kernel_matches_quant_block_exactly(cin, cout, T, t_pad, t_len, last,
                                            variant):
    rng = np.random.default_rng(7)
    x = rng.integers(-127, 128, (4, T, cin)).astype(np.int8)
    qblk = _rand_qblk(rng, cin, cout)
    ref = _quant_block(jnp.asarray(x), qblk, 2, 1, last=last,
                       out_dtype=jnp.bfloat16)
    xp = np.zeros((4, t_pad, cin), np.int8)
    xp[:, :T] = x
    prep = cat_weights if variant == "pshift" else stack_weights
    out = pallas_quant_block(
        jnp.asarray(xp), prep(qblk["w_q"]), qblk["alpha"],
        qblk["beta"], qblk["gamma"], t_valid=T, t_len=t_len, last=last,
        out_dtype=jnp.bfloat16 if last else jnp.int8, variant=variant,
        interpret=True)
    got = np.asarray(out[:, : T // 2].astype(jnp.float32))
    want = np.asarray(ref.astype(jnp.float32))
    np.testing.assert_array_equal(got, want)
    # zero-tail contract: pad rows are exact zeros
    np.testing.assert_array_equal(
        np.asarray(out[:, T // 2:].astype(jnp.float32)), 0.0)


@pytest.mark.skipif(
    os.environ.get("VOICEMAP_TEST_PLATFORM", "cpu") != "tpu",
    reason="compiled-mode (Mosaic) parity needs the real chip")
@pytest.mark.parametrize("variant", ["pshift", "xk3"])
def test_kernel_mosaic_parity_onchip(variant):
    """Non-interpret parity on the real chip (r4 verdict weak #7): the
    Mosaic lowering of the kernel — at a serving-aligned shape — must
    match models/quant_infer._quant_block bit-exactly, like the interpret
    path does. "xk" is omitted: it does NOT lower (tpu.concatenate offset
    mismatch on the +1-shifted int8 slice; BASELINE.md round 5)."""
    rng = np.random.default_rng(11)
    cin, cout, T, t_pad = 128, 128, 500, 512
    x = rng.integers(-127, 128, (4, T, cin)).astype(np.int8)
    qblk = _rand_qblk(rng, cin, cout)
    ref = _quant_block(jnp.asarray(x), qblk, 2, 1, last=False,
                       out_dtype=jnp.bfloat16)
    xp = np.zeros((4, t_pad, cin), np.int8)
    xp[:, :T] = x
    prep = cat_weights if variant == "pshift" else stack_weights
    out = pallas_quant_block(
        jnp.asarray(xp), prep(qblk["w_q"]), qblk["alpha"], qblk["beta"],
        qblk["gamma"], t_valid=T, t_len=256, variant=variant,
        interpret=False)
    got = np.asarray(out[:, : T // 2].astype(jnp.float32))
    want = np.asarray(ref.astype(jnp.float32))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        np.asarray(out[:, T // 2:].astype(jnp.float32)), 0.0)


def test_kernel_rejects_bad_shapes():
    x = jnp.zeros((2, 32, 8), jnp.int8)
    w = jnp.zeros((8, 48), jnp.int8)
    a = jnp.zeros((16,), jnp.float32)
    with pytest.raises(ValueError, match="even"):
        pallas_quant_block(x, w, a, a, a, t_valid=31, interpret=True)
    with pytest.raises(ValueError, match="int8"):
        pallas_quant_block(x.astype(jnp.float32), w, a, a, a, t_valid=32,
                           interpret=True)
    with pytest.raises(ValueError, match="float"):
        pallas_quant_block(x, w, a, a, a, t_valid=32, last=True,
                           interpret=True)


def test_cat_weights_k3_only():
    with pytest.raises(ValueError, match="k=3"):
        cat_weights(jnp.zeros((5, 8, 8), jnp.int8))


@pytest.mark.parametrize("variant", ["pshift", "xk", "xk3"])
@pytest.mark.parametrize("routing", ["pallas", "auto"])
def test_quant_embed_chain_matches_legacy(routing, variant, monkeypatch):
    """The padded chain (Pallas block 0 keep_pad + fused/pad-aware mid
    blocks) is bit-identical to the legacy exact-T XLA path — under both
    kernel formulations."""
    from voicemap_tpu.models import quant_infer

    monkeypatch.setattr(quant_infer, "PALLAS_QBLOCK_VARIANT", variant)
    cfg = EncoderConfig(filters=8, embedding_dim=16, dropout=0.0,
                        compute_dtype="float32")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 192, 1)) * 0.05, jnp.float32)
    model = ConvEncoder(cfg)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    qvars = quantize_encoder(variables, cfg, x)
    legacy = quant_embed(variables, qvars, cfg, x, routing="xla")
    chained = quant_embed(variables, qvars, cfg, x, routing=routing,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(chained))


def test_quant_embed_chain_mixed_backends():
    """auto routing mixes Pallas (Cin ≤ 128) and pad-aware XLA mid blocks;
    a dilated block forces the XLA fallback inside the chain and the
    output still matches the legacy path bitwise."""
    cfg = EncoderConfig(filters=8, embedding_dim=16, dropout=0.0,
                        compute_dtype="float32",
                        dilations=(1, 1, 2, 1))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 192, 1)) * 0.05, jnp.float32)
    model = ConvEncoder(cfg)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    qvars = quantize_encoder(variables, cfg, x)
    legacy = quant_embed(variables, qvars, cfg, x, routing="xla")
    chained = quant_embed(variables, qvars, cfg, x, routing="pallas",
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(chained))


def test_quant_embed_rejects_unknown_routing():
    cfg = EncoderConfig(filters=8, embedding_dim=16, dropout=0.0)
    with pytest.raises(ValueError, match="routing"):
        quant_embed({}, {}, cfg, jnp.zeros((1, 64, 1)), routing="fast")
