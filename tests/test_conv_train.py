"""Parity tests for the fused block-0 TRAINING op (ops/conv_train.py).

Oracle: flax ConvBlock in train mode (models/encoder.py), float32 compute.
The fused op must match values (pooled output + batch stats) and parameter
gradients; the input gradient is zero by design (first-layer op).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.models.encoder import ConvBlock
from voicemap_tpu.ops.conv_train import make_fused_block0_train

EPS = 1e-3
POOL = 4
K = 32
C = 16
B, T = 4, 256


def _flax_block(dropout=0.0):
    return ConvBlock(
        features=C, kernel_size=K, pool_size=POOL, dropout=dropout,
        compute_dtype=jnp.float32, param_dtype=jnp.float32,
        bn_momentum=0.99, bn_epsilon=EPS,
    )


def _init(key, scale_tweak=None):
    x = jax.random.normal(key, (B, T, 1), jnp.float32)
    blk = _flax_block()
    variables = blk.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    if scale_tweak is not None:
        params = jax.tree_util.tree_map(lambda p: p, params)
        params["bn"]["scale"] = scale_tweak(params["bn"]["scale"])
    return x, blk, params, variables["batch_stats"]


def _flax_train_apply(blk, params, batch_stats, x):
    out, mut = blk.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    return out, mut["batch_stats"]["bn"]


def _fused_apply(params, x, impl="xla"):
    fn = make_fused_block0_train(POOL, EPS, impl=impl)
    return fn(
        x, params["conv"]["kernel"], params["conv"]["bias"],
        params["bn"]["scale"], params["bn"]["bias"],
    )


@pytest.mark.parametrize("tweak", [None, "negate_some", "zero_some"])
def test_forward_parity(tweak):
    tweaks = {
        None: None,
        "negate_some": lambda s: s.at[::3].set(-s[::3] - 0.5),
        "zero_some": lambda s: s.at[::5].set(0.0),
    }
    x, blk, params, bs = _init(jax.random.PRNGKey(2), tweaks[tweak])
    ref, ref_bn = _flax_train_apply(blk, params, bs, x)
    got, mu, var = _fused_apply(params, x)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # Running-stat update parity: new = m*old + (1-m)*batch.
    np.testing.assert_allclose(
        0.99 * bs["bn"]["mean"] + 0.01 * mu, ref_bn["mean"], rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        0.99 * bs["bn"]["var"] + 0.01 * var, ref_bn["var"], rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("tweak", [None, "negate_some"])
def test_grad_parity(tweak):
    tweaks = {None: None, "negate_some": lambda s: s.at[1::2].set(-s[1::2] - 0.3)}
    x, blk, params, bs = _init(jax.random.PRNGKey(3), tweaks[tweak])
    gkey = jax.random.PRNGKey(4)
    gw = jax.random.normal(gkey, (B, T // POOL, C), jnp.float32)

    def loss_ref(p):
        out, _ = _flax_train_apply(blk, p, bs, x)
        return jnp.sum(out * gw)

    def loss_fused(p):
        out, mu, var = _fused_apply(p, x)
        return jnp.sum(out * gw)

    lr, gr = jax.value_and_grad(loss_ref)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(lf, lr, rtol=1e-5)
    for path in [("conv", "kernel"), ("conv", "bias"), ("bn", "scale"), ("bn", "bias")]:
        a = gr[path[0]][path[1]]
        bgrad = gf[path[0]][path[1]]
        np.testing.assert_allclose(
            bgrad, a, rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch at {'/'.join(path)}",
        )


def test_relu_dead_region_grads():
    """Large negative conv bias ⇒ many a==0 positions; parity must hold."""
    x, blk, params, bs = _init(jax.random.PRNGKey(5))
    params["conv"]["bias"] = params["conv"]["bias"] - 0.5
    gw = jax.random.normal(jax.random.PRNGKey(6), (B, T // POOL, C), jnp.float32)

    def loss_ref(p):
        out, _ = _flax_train_apply(blk, p, bs, x)
        return jnp.sum(out * gw)

    def loss_fused(p):
        out, _, _ = _fused_apply(p, x)
        return jnp.sum(out * gw)

    gr = jax.grad(loss_ref)(params)
    gf = jax.grad(loss_fused)(params)
    for path in [("conv", "kernel"), ("conv", "bias"), ("bn", "scale"), ("bn", "bias")]:
        np.testing.assert_allclose(
            gf[path[0]][path[1]], gr[path[0]][path[1]], rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch at {'/'.join(path)}",
        )


def test_input_grad_is_zero_by_design():
    x, blk, params, bs = _init(jax.random.PRNGKey(7))

    def loss(xx):
        out, _, _ = _fused_apply(params, xx)
        return jnp.sum(out)

    gx = jax.grad(loss)(x)
    assert float(jnp.max(jnp.abs(gx))) == 0.0


def test_pallas_fwd_core_matches_xla_core():
    from voicemap_tpu.ops.conv_train import _xla_fwd_core
    from voicemap_tpu.ops.pallas_conv_train import pallas_fwd_core

    x, blk, params, bs = _init(jax.random.PRNGKey(9))
    w, b = params["conv"]["kernel"], params["conv"]["bias"]
    sgn = jnp.where(params["bn"]["scale"] >= 0, 1.0, -1.0)
    ref = _xla_fwd_core(x, w, b, sgn, pool=POOL, dtype=jnp.float32)
    got = pallas_fwd_core(x, w, b, sgn, pool=POOL, interpret=True)
    for name, r, g in zip(["a_sel", "sum", "sumsq", "cnt"], ref, got):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("tweak", [None, "negate_some"])
def test_pallas_impl_grad_parity(tweak):
    """Full custom-VJP with Pallas cores (interpret) vs the flax block."""
    tweaks = {None: None, "negate_some": lambda s: s.at[1::2].set(-s[1::2] - 0.3)}
    x, blk, params, bs = _init(jax.random.PRNGKey(10), tweaks[tweak])
    gw = jax.random.normal(jax.random.PRNGKey(11), (B, T // POOL, C), jnp.float32)

    def loss_ref(p):
        out, _ = _flax_train_apply(blk, p, bs, x)
        return jnp.sum(out * gw)

    def loss_fused(p):
        fn = make_fused_block0_train(POOL, EPS, impl="pallas", interpret=True)
        out, mu, var = fn(
            x, p["conv"]["kernel"], p["conv"]["bias"],
            p["bn"]["scale"], p["bn"]["bias"],
        )
        return jnp.sum(out * gw)

    lr, gr = jax.value_and_grad(loss_ref)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(lf, lr, rtol=1e-5)
    for path in [("conv", "kernel"), ("conv", "bias"), ("bn", "scale"), ("bn", "bias")]:
        np.testing.assert_allclose(
            gf[path[0]][path[1]], gr[path[0]][path[1]], rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch at {'/'.join(path)}",
        )


def test_mu_var_outputs_differentiable():
    """The stats outputs carry correct cotangents (used only defensively)."""
    x, blk, params, bs = _init(jax.random.PRNGKey(8))

    def loss_fused(p):
        out, mu, var = _fused_apply(p, x)
        return jnp.sum(mu * 2.0) + jnp.sum(var * 0.5)

    def loss_ref(p):
        # Same quantity from the raw activation.
        z = jax.lax.conv_general_dilated(
            x, p["conv"]["kernel"], (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + p["conv"]["bias"]
        a = jax.nn.relu(z)
        mu = jnp.mean(a, axis=(0, 1))
        var = jnp.mean(a * a, axis=(0, 1)) - mu * mu
        return jnp.sum(mu * 2.0) + jnp.sum(var * 0.5)

    gf = jax.grad(loss_fused)(params)
    gr = jax.grad(loss_ref)(params)
    np.testing.assert_allclose(
        gf["conv"]["kernel"], gr["conv"]["kernel"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        gf["conv"]["bias"], gr["conv"]["bias"], rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# Mid-network blocks-1+ op (make_fused_blockn_train): value + grad parity
# INCLUDING the input gradient, which block 0 zeroes by design.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("save_act", [True, False])
@pytest.mark.parametrize("pool,dilation", [(2, 1), (2, 4), (1, 2)])
def test_blockn_value_and_grad_parity(pool, dilation, save_act):
    _check_blockn_parity(pool, dilation, save_act, routing="xla")


@pytest.mark.parametrize("pool,dilation", [(2, 1), (2, 4), (1, 2)])
def test_blockn_pallas_routing_parity(pool, dilation):
    """Mosaic pool/routing kernels (interpret mode) == flax at f32.

    Exercises ops/pallas_routing.py's forward pool/stat kernel and the
    backward a_sel-equality routing kernel end to end through the
    custom VJP, including value ties and negative BN scales."""
    _check_blockn_parity(pool, dilation, save_act=True, routing="pallas",
                         interpret=True)


def _check_blockn_parity(pool, dilation, save_act, routing="xla",
                         interpret=False):
    from voicemap_tpu.ops.conv_train import make_fused_blockn_train

    # Cout=128: the Pallas routing kernels require lane-aligned channels.
    Cin, Cout, k, Bn, Tn = 6, 128, 3, 4, 64
    blk = ConvBlock(
        features=Cout, kernel_size=k, pool_size=pool, dropout=0.0,
        dilation=dilation, compute_dtype=jnp.float32,
        param_dtype=jnp.float32, bn_momentum=0.99, bn_epsilon=EPS,
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (Bn, Tn, Cin), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    params["bn"]["scale"] = params["bn"]["scale"].at[::3].set(-1.3)

    fn = make_fused_blockn_train(pool, EPS, dilation=dilation,
                                 gemm_dtype="float32", sel_dtype="float32",
                                 save_act=save_act, routing=routing,
                                 interpret=interpret)
    gw = jax.random.normal(jax.random.PRNGKey(6), (Bn, Tn // pool, Cout))

    def loss_ref(p, x):
        out, _ = blk.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out * gw)

    def loss_fused(p, x):
        out, mu, var = fn(x, p["conv"]["kernel"], p["conv"]["bias"],
                          p["bn"]["scale"], p["bn"]["bias"])
        return jnp.sum(out * gw)

    (lr, gr_p), gr_x = (jax.value_and_grad(loss_ref)(params, x),
                        jax.grad(loss_ref, argnums=1)(params, x))
    (lf, gf_p), gf_x = (jax.value_and_grad(loss_fused)(params, x),
                        jax.grad(loss_fused, argnums=1)(params, x))
    np.testing.assert_allclose(lf, lr, rtol=1e-5)
    for path in [("conv", "kernel"), ("conv", "bias"),
                 ("bn", "scale"), ("bn", "bias")]:
        np.testing.assert_allclose(
            gf_p[path[0]][path[1]], gr_p[path[0]][path[1]],
            rtol=1e-4, atol=1e-4, err_msg=f"grad mismatch at {'/'.join(path)}",
        )
    np.testing.assert_allclose(gf_x, gr_x, rtol=1e-4, atol=1e-4,
                               err_msg="input grad mismatch")


def test_blockn_stats_outputs():
    from voicemap_tpu.ops.conv_train import make_fused_blockn_train

    Cin, Cout, k, Bn, Tn = 4, 8, 3, 2, 32
    blk = ConvBlock(features=Cout, kernel_size=k, pool_size=2, dropout=0.0,
                    compute_dtype=jnp.float32, param_dtype=jnp.float32,
                    bn_epsilon=EPS)
    x = jax.random.normal(jax.random.PRNGKey(7), (Bn, Tn, Cin), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    _, mut = blk.apply({"params": params, "batch_stats": bs}, x, train=True,
                       mutable=["batch_stats"])
    fn = make_fused_blockn_train(2, EPS, gemm_dtype="float32",
                                 sel_dtype="float32")
    _, mu, var = fn(x, params["conv"]["kernel"], params["conv"]["bias"],
                    params["bn"]["scale"], params["bn"]["bias"])
    np.testing.assert_allclose(0.99 * bs["bn"]["mean"] + 0.01 * mu,
                               mut["batch_stats"]["bn"]["mean"],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(0.99 * bs["bn"]["var"] + 0.01 * var,
                               mut["batch_stats"]["bn"]["var"],
                               rtol=1e-4, atol=1e-6)


def test_encoder_train_forward_blockn_fused_matches_jnp():
    """Whole-encoder forward+grads: blockn='fused' == blockn='jnp' at f32."""
    import dataclasses

    from voicemap_tpu.config import EncoderConfig
    from voicemap_tpu.models import fused_train
    from voicemap_tpu.models.classifier import SpeakerClassifier

    enc = EncoderConfig(filters=4, embedding_dim=8, dropout=0.0,
                        compute_dtype="float32")
    model = SpeakerClassifier(enc, num_classes=5)
    T = 256
    x = jax.random.normal(jax.random.PRNGKey(8), (4, T, 1), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    params, bs = variables["params"], variables["batch_stats"]

    def loss(p, blockn):
        logits, _ = fused_train.classifier_train_forward(
            p, bs, enc, x, None, impl="xla", blockn=blockn)
        import optax
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    l1, g1 = jax.value_and_grad(lambda p: loss(p, "jnp"))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, "fused"))(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_blockn_int8_forward_close_with_ste_grads():
    """quant='int8' (the int8 training-forward experiment): the forward
    runs s8×s8→s32 with in-step dynamic scales, so values track the f32
    block within quantization error and the straight-through grads track
    the f32 grads loosely; invalid variants raise."""
    from voicemap_tpu.ops.conv_train import make_fused_blockn_train

    Cin, Cout, k, Bn, Tn, pool = 6, 16, 3, 4, 64, 2
    blk = ConvBlock(
        features=Cout, kernel_size=k, pool_size=pool, dropout=0.0,
        compute_dtype=jnp.float32, param_dtype=jnp.float32,
        bn_momentum=0.99, bn_epsilon=EPS,
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (Bn, Tn, Cin), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    params["bn"]["scale"] = params["bn"]["scale"].at[::3].set(-1.3)

    with pytest.raises(ValueError):
        make_fused_blockn_train(pool, EPS, quant="int8", save_act=False)
    with pytest.raises(ValueError):
        make_fused_blockn_train(pool, EPS, quant="fp8")

    ref = make_fused_blockn_train(pool, EPS, gemm_dtype="float32",
                                  sel_dtype="float32")
    q = make_fused_blockn_train(pool, EPS, gemm_dtype="float32",
                                sel_dtype="float32", quant="int8")
    gw = jax.random.normal(jax.random.PRNGKey(6), (Bn, Tn // pool, Cout))

    def loss(fn, p, x):
        out, mu, var = fn(x, p["conv"]["kernel"], p["conv"]["bias"],
                          p["bn"]["scale"], p["bn"]["bias"])
        return jnp.sum(out * gw), (out, mu, var)

    (lr, (yr, mur, varr)), gr = jax.value_and_grad(
        lambda p: loss(ref, p, x), has_aux=True)(params)
    (lq, (yq, muq, varq)), gq = jax.value_and_grad(
        lambda p: loss(q, p, x), has_aux=True)(params)
    # Values: within symmetric-int8 quantization error of the f32 block.
    np.testing.assert_allclose(np.asarray(yq), np.asarray(yr),
                               rtol=0.1, atol=0.15)
    np.testing.assert_allclose(np.asarray(muq), np.asarray(mur), atol=0.05)
    # STE grads track the f32 grads loosely (same structure, quantized act).
    for path in [("conv", "kernel"), ("conv", "bias"),
                 ("bn", "scale"), ("bn", "bias")]:
        a, b = (np.asarray(gq[path[0]][path[1]]),
                np.asarray(gr[path[0]][path[1]]))
        denom = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.25, path
    # Determinism: two evaluations bit-identical (scales are pure functions
    # of the batch).
    (lq2, _), _ = jax.value_and_grad(
        lambda p: loss(q, p, x), has_aux=True)(params)
    assert float(lq) == float(lq2)


def test_encoder_train_forward_blockn_int8_runs():
    """Whole-encoder int8-forward experiment path: blockn='fused_int8'
    produces a close loss and finite grads; resolve_blockn honors the
    quant_forward knob."""
    from voicemap_tpu.config import (
        DataConfig, EncoderConfig, ExperimentConfig, TrainConfig,
    )
    from voicemap_tpu.models import fused_train
    from voicemap_tpu.models.classifier import SpeakerClassifier
    from voicemap_tpu.train.steps import resolve_blockn

    cfg = ExperimentConfig(train=TrainConfig(quant_forward="int8"))
    assert resolve_blockn(cfg) == "fused_int8"
    with pytest.raises(ValueError):
        resolve_blockn(ExperimentConfig(train=TrainConfig(
            quant_forward="fp8")))

    enc = EncoderConfig(filters=4, embedding_dim=8, dropout=0.0,
                        compute_dtype="float32")
    model = SpeakerClassifier(enc, num_classes=5)
    T = 256
    x = jax.random.normal(jax.random.PRNGKey(8), (4, T, 1), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    params, bs = variables["params"], variables["batch_stats"]

    def loss(p, blockn):
        logits, _ = fused_train.classifier_train_forward(
            p, bs, enc, x, None, impl="xla", blockn=blockn)
        import optax
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    l1, g1 = jax.value_and_grad(lambda p: loss(p, "jnp"))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, "fused_int8"))(params)
    assert abs(float(l2) - float(l1)) < 0.2 * max(abs(float(l1)), 1.0)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert np.all(np.isfinite(np.asarray(b)))
        # same order of magnitude as the f32 grads
        assert np.abs(np.asarray(b)).max() < 50 * (np.abs(np.asarray(a)).max() + 1e-6)
