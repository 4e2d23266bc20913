"""Parity: functional fused training forward vs flax model.apply (train=True).

float32 / dropout=0 ⇒ values + parameter gradients match model.apply;
dropout>0 is checked structurally (pool-rate channel dropout, scaling).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.config import EncoderConfig, SiameseConfig
from voicemap_tpu.models.classifier import SpeakerClassifier
from voicemap_tpu.models.siamese import SiameseNet
from voicemap_tpu.models.fused_train import (
    classifier_train_forward,
    encoder_train_forward,
    siamese_train_forward,
)

CFG = EncoderConfig(
    filters=8, embedding_dim=16, dropout=0.0,
    filter_multipliers=(1, 2), kernel_sizes=(32, 3), pool_sizes=(4, 2),
    dilations=(1, 1), compute_dtype="float32", param_dtype="float32",
)
B, T = 4, 256


def _tree_allclose(got, ref, rtol=1e-4, atol=1e-4):
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    ref_map = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(ref)
    }
    for path, v in flat_g:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            v, ref_map[key], rtol=rtol, atol=atol, err_msg=key
        )


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_classifier_train_forward_parity(impl):
    model = SpeakerClassifier(CFG, num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    y = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, 5)

    def loss_ref(p):
        logits, mut = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"],
        )
        onehot = jax.nn.one_hot(y, 5)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)), mut

    def loss_fused(p):
        logits, new_bs = classifier_train_forward(
            p, bs, CFG, x, impl=impl, interpret=True
        )
        onehot = jax.nn.one_hot(y, 5)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)), new_bs

    (lr, mut), gr = jax.value_and_grad(loss_ref, has_aux=True)(params)
    (lf, new_bs), gf = jax.value_and_grad(loss_fused, has_aux=True)(params)
    np.testing.assert_allclose(lf, lr, rtol=1e-5, atol=1e-6)
    _tree_allclose(gf, gr)
    _tree_allclose(new_bs, mut["batch_stats"], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", ["xla"])
def test_siamese_train_forward_parity(impl):
    scfg = SiameseConfig()
    model = SiameseNet(CFG, scfg)
    k = jax.random.PRNGKey(3)
    x1 = jax.random.normal(k, (B, T, 1), jnp.float32)
    x2 = jax.random.normal(jax.random.fold_in(k, 1), (B, T, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(4), x1, x2, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    y = jnp.array([0.0, 1.0, 0.0, 1.0])

    def bce(logits):
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    def loss_ref(p):
        logits, mut = model.apply(
            {"params": p, "batch_stats": bs}, x1, x2, train=True,
            mutable=["batch_stats"],
        )
        return bce(logits), mut

    def loss_fused(p):
        logits, new_bs = siamese_train_forward(
            p, bs, CFG, scfg, x1, x2, impl=impl, interpret=True
        )
        return bce(logits), new_bs

    (lr, mut), gr = jax.value_and_grad(loss_ref, has_aux=True)(params)
    (lf, new_bs), gf = jax.value_and_grad(loss_fused, has_aux=True)(params)
    np.testing.assert_allclose(lf, lr, rtol=1e-5, atol=1e-6)
    _tree_allclose(gf, gr)
    _tree_allclose(new_bs, mut["batch_stats"], rtol=1e-5, atol=1e-6)


def test_ineligible_input_falls_back():
    """Cin≠1 block 0 (spectrogram frontends) must use the jnp path."""
    cfg = dataclasses.replace(CFG, dilations=(2, 1))  # dilated block 0
    model = SpeakerClassifier(cfg, num_classes=3)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(6), x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    ref, mut = model.apply(
        {"params": params, "batch_stats": bs}, x, train=True,
        mutable=["batch_stats"],
    )
    got, new_bs = classifier_train_forward(params, bs, cfg, x, impl="xla")
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    _tree_allclose(new_bs, mut["batch_stats"], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("t_in", [260, 258])
def test_blockn_fused_pool_remainder_falls_back(t_in):
    """blockn='fused' must keep flax semantics when a block's time axis does
    not divide its pool: such blocks (and block 0 whenever the dedicated
    Pallas block-0 op is ineligible) fall back to the autodiff block — conv
    over the FULL input, BN stats over full T, truncate only at the pool.
    t_in=260: block 0 eligible (260%4=0), block 1 remainder (65%2=1).
    t_in=258: block 0 ineligible (258%4=2) → starts the loop at block 0,
    which must NOT route through the mid-network fused op."""
    model = SpeakerClassifier(CFG, num_classes=3)
    x = jax.random.normal(jax.random.PRNGKey(11), (B, t_in, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(12), x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    y = jax.random.randint(jax.random.PRNGKey(13), (B,), 0, 3)

    def loss_ref(p):
        logits, mut = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"],
        )
        onehot = jax.nn.one_hot(y, 3)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)), mut

    def loss_fused(p):
        logits, new_bs = classifier_train_forward(
            p, bs, CFG, x, impl="xla", interpret=True, blockn="fused"
        )
        onehot = jax.nn.one_hot(y, 3)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)), new_bs

    (lr, mut), gr = jax.value_and_grad(loss_ref, has_aux=True)(params)
    (lf, new_bs), gf = jax.value_and_grad(loss_fused, has_aux=True)(params)
    np.testing.assert_allclose(lf, lr, rtol=1e-5, atol=1e-6)
    _tree_allclose(gf, gr)
    _tree_allclose(new_bs, mut["batch_stats"], rtol=1e-5, atol=1e-6)


def test_dropout_structure():
    """Pool-rate SpatialDropout: whole channels zeroed or scaled by 1/keep."""
    cfg = dataclasses.replace(CFG, dropout=0.5)
    model = SpeakerClassifier(cfg, num_classes=3)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(8), x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    # Run the encoder forward with two different dropout keys: outputs differ;
    # with the same key they match (deterministic given the key).
    e1, _ = encoder_train_forward(
        params["encoder"], bs["encoder"], cfg, x, jax.random.PRNGKey(9), impl="xla"
    )
    e2, _ = encoder_train_forward(
        params["encoder"], bs["encoder"], cfg, x, jax.random.PRNGKey(10), impl="xla"
    )
    e1b, _ = encoder_train_forward(
        params["encoder"], bs["encoder"], cfg, x, jax.random.PRNGKey(9), impl="xla"
    )
    assert not np.allclose(e1, e2)
    np.testing.assert_array_equal(e1, e1b)

    with pytest.raises(ValueError):
        encoder_train_forward(params["encoder"], bs["encoder"], cfg, x, None,
                              impl="xla")
