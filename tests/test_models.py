"""Model unit tests (SURVEY.md §4 item 2): output shapes per config,
parameter counts, siamese symmetry, gradient flow to both towers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.config import EncoderConfig, SiameseConfig, dilated_4khz
from voicemap_tpu.models.classifier import SpeakerClassifier
from voicemap_tpu.models.encoder import ConvEncoder
from voicemap_tpu.models.siamese import SiameseNet

# float32 for exact symmetry/grad checks on CPU.
CFG = EncoderConfig(filters=8, embedding_dim=16, compute_dtype="float32")
T = 1200  # small time dim for fast CPU tests


def test_encoder_output_shape():
    model = ConvEncoder(CFG)
    x = jnp.zeros((2, T, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 16)
    assert out.dtype == jnp.float32


def test_encoder_channel_progression():
    """Filter multipliers 1/2/3/4 and pooling 4/2/2/2 as in the reference
    topology (SURVEY.md §3.5)."""
    model = ConvEncoder(CFG)
    x = jnp.zeros((1, T, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    p = variables["params"]
    assert p["block_0"]["conv"]["kernel"].shape == (32, 1, 8)
    assert p["block_1"]["conv"]["kernel"].shape == (3, 8, 16)
    assert p["block_2"]["conv"]["kernel"].shape == (3, 16, 24)
    assert p["block_3"]["conv"]["kernel"].shape == (3, 24, 32)
    assert p["embed"]["kernel"].shape == (32, 16)


def test_encoder_param_count():
    """Parameter-count check against hand-computed topology numbers."""
    model = ConvEncoder(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, 1)), train=False)
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    # conv kernels+bias: 32*1*8+8, 3*8*16+16, 3*16*24+24, 3*24*32+32
    # bn scale+bias: 2*(8+16+24+32); dense: 32*16+16
    expect = (32 * 8 + 8) + (3 * 8 * 16 + 16) + (3 * 16 * 24 + 24) + (
        3 * 24 * 32 + 32
    ) + 2 * (8 + 16 + 24 + 32) + (32 * 16 + 16)
    assert n == expect


def test_dilated_config_builds():
    cfg = dilated_4khz().encoder
    cfg = dataclasses.replace(cfg, filters=4, compute_dtype="float32")
    model = ConvEncoder(cfg)
    x = jnp.zeros((1, 2048, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, cfg.embedding_dim)


def test_classifier_shapes():
    model = SpeakerClassifier(CFG, num_classes=10)
    x = jnp.zeros((3, T, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (3, 10)
    emb = model.apply(variables, x, train=False, method=model.embed)
    assert emb.shape == (3, 16)


@pytest.mark.parametrize(
    "metric",
    ["uniform_euclidean", "weighted_l1", "uniform_l1", "dot_product", "cosine_distance"],
)
def test_siamese_shapes_all_metrics(metric):
    model = SiameseNet(CFG, SiameseConfig(distance_metric=metric))
    x1 = jnp.asarray(np.random.default_rng(0).standard_normal((2, T, 1)), jnp.float32)
    x2 = jnp.asarray(np.random.default_rng(1).standard_normal((2, T, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    out = model.apply(variables, x1, x2, train=False)
    assert out.shape == (2,)


@pytest.mark.parametrize("metric", ["uniform_euclidean", "weighted_l1", "uniform_l1"])
def test_siamese_symmetry(metric):
    """d(a,b) == d(b,a) for symmetric merges (SURVEY.md §4 item 2)."""
    model = SiameseNet(CFG, SiameseConfig(distance_metric=metric))
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.standard_normal((4, T, 1)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((4, T, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)
    ab = model.apply(variables, x1, x2, train=False)
    ba = model.apply(variables, x2, x1, train=False)
    np.testing.assert_allclose(np.asarray(ab), np.asarray(ba), rtol=1e-5, atol=1e-5)


def test_siamese_gradients_flow_to_encoder():
    """Gradient flows through both towers into the shared encoder."""
    model = SiameseNet(CFG, SiameseConfig())
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.standard_normal((2, T, 1)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, T, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, x2, train=False)

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x1,
            x2,
            train=False,
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss)(variables["params"])
    gnorm = jnp.sqrt(
        sum(jnp.sum(g**2) for g in jax.tree.leaves(grads["encoder"]))
    )
    assert float(gnorm) > 0.0


def test_score_support_matches_pairwise():
    """Matrix-form head scores == per-pair forward logits."""
    for metric in ["weighted_l1", "uniform_euclidean", "uniform_l1"]:
        model = SiameseNet(CFG, SiameseConfig(distance_metric=metric))
        rng = np.random.default_rng(4)
        x1 = jnp.asarray(rng.standard_normal((1, T, 1)), jnp.float32)
        xs = jnp.asarray(rng.standard_normal((5, T, 1)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x1, x1, train=False)
        q = model.apply(variables, x1, train=False, method=model.embed)
        s = model.apply(variables, xs, train=False, method=model.embed)
        mat = model.apply(variables, q, s, method=model.score_support)  # (1, 5)
        pair = model.apply(
            variables, jnp.tile(x1, (5, 1, 1)), xs, train=False
        )  # (5,)
        np.testing.assert_allclose(
            np.asarray(mat)[0], np.asarray(pair), rtol=1e-4, atol=1e-4
        )


def test_batchnorm_updates_stats():
    model = ConvEncoder(CFG)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((4, T, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mut = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    before = variables["batch_stats"]["block_0"]["bn"]["mean"]
    after = mut["batch_stats"]["block_0"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
