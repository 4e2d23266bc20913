"""Data-parallel training over a device mesh.

TPU-native equivalent of the DP row in SURVEY.md §2.2's parallelism
checklist (the reference is single-device): batch sharded over the ``data``
mesh axis via ``shard_map``, gradients (and BatchNorm statistics —
cross-replica synchronized, an upgrade over the reference's per-device BN)
reduced with ``psum``/``pmean`` over ICI, parameters and optimizer state
replicated. The global batch is ``cfg.train.batch_size``; each device
samples its own ``B/n`` sub-batch from the (replicated or
fully-addressable) corpus store by folding its ``axis_index`` into the PRNG
key — no host-side scatter at all.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ExperimentConfig
from ..ops import sampling
from ..train import steps as steps_mod
from ..train.state import TrainState, apply_updates, make_optimizer


def _pmean_tree(tree, axis: str):
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis), tree)


def make_dp_classifier_train_step(
    model, cfg: ExperimentConfig, mesh: Mesh, axis: str = "data"
) -> Tuple[Callable, Any]:
    """(state, store, key) → (state, metrics), sharded over ``axis``.

    State and store are replicated (in_specs P()); each device computes on a
    local sub-batch; grads/metrics/BN-stats are pmean'd so the returned state
    is identical on every device.
    """
    tx = make_optimizer(cfg.train.clipnorm)
    n_dev = mesh.shape[axis]
    if cfg.train.batch_size % n_dev:
        raise ValueError("global batch must divide the data-axis size")
    local_B = cfg.train.batch_size // n_dev
    loss_fn = steps_mod.classifier_loss_fn(model, cfg)

    def device_step(state: TrainState, store: steps_mod.DeviceStore, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_idx, k_off, k_drop = jax.random.split(
            jax.random.fold_in(key, state.step), 3
        )
        idx = sampling.sample_classifier_batch(k_idx, store.labels.shape[0], local_B)
        x = steps_mod.fetch_batch(store, idx, k_off, cfg, cfg.data.stochastic)
        y = store.labels[idx]
        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, y, k_drop
        )
        grads = _pmean_tree(grads, axis)
        new_bs = _pmean_tree(new_bs, axis)
        loss = jax.lax.pmean(loss, axis)
        acc = jax.lax.pmean(acc, axis)
        new_state = apply_updates(state, grads, tx, new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    step = jax.jit(
        jax.shard_map(
            device_step,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return step, tx


def make_dp_streaming_classifier_step(
    model, cfg: ExperimentConfig, mesh: Mesh, axis: str = "data"
) -> Tuple[Callable, Any]:
    """DP train step over HOST-STREAMED batches (corpora too large for HBM).

    (state, fragments (B, frag) int16, labels (B,), key) → (state, metrics):
    the host batch is sharded over ``axis`` on its batch dimension at the
    jit boundary (the H2D transfer itself splits across devices), each
    device preprocesses + differentiates its local shard, and grads/metrics/
    BN stats are pmean'd exactly like the device-store DP step. Composes the
    streaming pipeline (data/pipeline.py) with multi-chip training — a
    combination the reference's ``fit_generator`` never had.
    """
    tx = make_optimizer(cfg.train.clipnorm)
    n_dev = mesh.shape[axis]
    if cfg.train.batch_size % n_dev:
        raise ValueError(
            f"data-axis size {n_dev} must divide the global batch "
            f"{cfg.train.batch_size}"
        )
    loss_fn = steps_mod.classifier_loss_fn(model, cfg)

    def device_step(state: TrainState, frags, y, key):
        k_drop = jax.random.fold_in(
            jax.random.fold_in(key, state.step), jax.lax.axis_index(axis)
        )
        x = steps_mod.preprocess_fragments(frags, cfg)
        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, y, k_drop
        )
        grads = _pmean_tree(grads, axis)
        new_bs = _pmean_tree(new_bs, axis)
        loss = jax.lax.pmean(loss, axis)
        acc = jax.lax.pmean(acc, axis)
        new_state = apply_updates(state, grads, tx, new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    step = jax.jit(
        jax.shard_map(
            device_step,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return step, tx


def make_dp_streaming_siamese_step(
    model, cfg: ExperimentConfig, mesh: Mesh, axis: str = "data"
) -> Tuple[Callable, Any]:
    """DP siamese step over host-streamed pair fragments.

    (state, f1, f2, labels, key), pair batch sharded over ``axis``. The
    pipeline's half-alike/half-differing layout is order-independent under
    sharding (every shard sees a contiguous slice; the loss is a mean), so
    no reshuffle is needed.
    """
    tx = make_optimizer(cfg.train.clipnorm)
    n_dev = mesh.shape[axis]
    if cfg.train.batch_size % n_dev:
        raise ValueError(
            f"data-axis size {n_dev} must divide the global batch "
            f"{cfg.train.batch_size}"
        )
    loss_fn = steps_mod.siamese_loss_fn(model, cfg)

    def device_step(state: TrainState, f1, f2, y, key):
        k_drop = jax.random.fold_in(
            jax.random.fold_in(key, state.step), jax.lax.axis_index(axis)
        )
        x1 = steps_mod.preprocess_fragments(f1, cfg)
        x2 = steps_mod.preprocess_fragments(f2, cfg)
        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x1, x2, y, k_drop
        )
        grads = _pmean_tree(grads, axis)
        new_bs = _pmean_tree(new_bs, axis)
        loss = jax.lax.pmean(loss, axis)
        acc = jax.lax.pmean(acc, axis)
        new_state = apply_updates(state, grads, tx, new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    step = jax.jit(
        jax.shard_map(
            device_step,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return step, tx


def make_dp_siamese_train_step(
    model, cfg: ExperimentConfig, mesh: Mesh, axis: str = "data"
) -> Tuple[Callable, Any]:
    """Data-parallel siamese verification step (BCE or contrastive)."""
    tx = make_optimizer(cfg.train.clipnorm)
    n_dev = mesh.shape[axis]
    if cfg.train.batch_size % n_dev:
        raise ValueError("global batch must divide the data-axis size")
    local_B = cfg.train.batch_size // n_dev
    same_label = cfg.siamese.same_label
    loss_fn = steps_mod.siamese_loss_fn(model, cfg)

    def device_step(state: TrainState, store: steps_mod.DeviceStore, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_pair, k_off1, k_off2, k_drop = jax.random.split(
            jax.random.fold_in(key, state.step), 4
        )
        batch = sampling.sample_verification_batch(
            k_pair, store.speaker_utts, store.speaker_counts, local_B, same_label
        )
        x1 = steps_mod.fetch_batch(store, batch.idx_1, k_off1, cfg, cfg.data.stochastic)
        x2 = steps_mod.fetch_batch(store, batch.idx_2, k_off2, cfg, cfg.data.stochastic)
        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x1, x2, batch.labels, k_drop
        )
        grads = _pmean_tree(grads, axis)
        new_bs = _pmean_tree(new_bs, axis)
        loss = jax.lax.pmean(loss, axis)
        acc = jax.lax.pmean(acc, axis)
        new_state = apply_updates(state, grads, tx, new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    step = jax.jit(
        jax.shard_map(
            device_step,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return step, tx
