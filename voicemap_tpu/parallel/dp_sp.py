"""2-D (data × seq) parallel training: DP psum-grads × halo-exchange SP.

The composition SURVEY.md §5 plans for BASELINE.json config #3 (dilated
conv1d at 4 kHz, long fragments): the batch is sharded over the ``data``
mesh axis and each fragment's TIME axis is sharded over the ``seq`` axis,
with halo-exchange convs (parallel/halo_conv.py) reassembling receptive
fields across shard boundaries.

Gradient calculus inside the shard_map (why pmean over BOTH axes is exact):
within one data row, all seq devices cooperate on the SAME loss L. The
transpose of ``all_gather``/``ppermute`` routes every device's cotangents
back to the shard that produced the activation, so device s's conv-param
grad equals ∂(Σ_d L_d)/∂(params via shard s) = ∂(n_seq·L)/∂(shard-s path),
while purely replicated post-gather compute (the Dense heads) yields the
full ∂L/∂W on every device. In both cases the per-device grads sum to
n_seq·∂L/∂params over the seq axis — so ``pmean`` over seq recovers
∂L/∂params exactly, and a second ``pmean`` over data is the standard DP
average. BatchNorm train statistics reduce over both axes inside the
forward (halo_conv.sharded_encoder_train_apply), which makes the whole 2-D
step bit-for-bit the single-device full-batch step — the property the test
asserts.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ExperimentConfig
from ..ops import sampling
from ..train import losses, steps as steps_mod
from ..train.state import TrainState, apply_updates, make_optimizer
from . import halo_conv


def dp_sp_classifier_loss_fn(cfg: ExperimentConfig, data_axis: str, seq_axis: str):
    """(params, batch_stats, x_local, y, dropout_key) → (loss, (new_bs, acc)).

    ``x_local``: this device's (B_local, T_local, 1) time shard. Runs inside
    shard_map on a (data × seq) mesh.
    """
    enc_cfg = cfg.encoder

    def loss_fn(params, batch_stats, x_local, y, dropout_key):
        emb, new_enc_bs = halo_conv.sharded_encoder_train_apply(
            params["encoder"], batch_stats["encoder"], enc_cfg, x_local,
            seq_axis=seq_axis, stat_axes=(data_axis, seq_axis),
            dropout_key=dropout_key,
        )
        head = params["head"]
        logits = emb @ head["kernel"].astype(jnp.float32) + head["bias"]
        loss = losses.softmax_ce(logits, y)
        acc = losses.categorical_accuracy(logits, y)
        return loss, ({"encoder": new_enc_bs}, acc)

    return loss_fn


def make_dp_sp_classifier_train_step(
    cfg: ExperimentConfig,
    mesh: Mesh,
    data_axis: str = "data",
    seq_axis: str = "seq",
) -> Tuple[Callable, Any]:
    """(state, store, key) → (state, metrics) over a 2-D (data × seq) mesh.

    Each data row samples its own sub-batch (PRNG folded with the data index
    only, so every seq shard of a row sees the same batch), fetches full
    fragments, slices its time shard locally, and runs the halo-SP train
    forward. Grads/metrics are pmean'd over both axes; the returned state is
    replicated-identical everywhere.
    """
    t = cfg.train
    tx = make_optimizer(t.clipnorm)
    n_data = mesh.shape[data_axis]
    n_seq = mesh.shape[seq_axis]
    if t.batch_size % n_data:
        raise ValueError(
            f"data-axis size {n_data} must divide the global batch "
            f"{t.batch_size}"
        )
    local_B = t.batch_size // n_data
    T = cfg.data.model_length
    if T % n_seq:
        raise ValueError(
            f"seq-axis size {n_seq} must divide model_length {T}"
        )
    t_loc = T // n_seq
    loss_fn = dp_sp_classifier_loss_fn(cfg, data_axis, seq_axis)

    def device_step(state: TrainState, store: steps_mod.DeviceStore, key):
        d = jax.lax.axis_index(data_axis)
        s = jax.lax.axis_index(seq_axis)
        # Fold ONLY the data index: seq shards of a row share batch + dropout.
        key = jax.random.fold_in(key, d)
        k_idx, k_off, k_drop = jax.random.split(
            jax.random.fold_in(key, state.step), 3
        )
        idx = sampling.sample_classifier_batch(
            k_idx, store.labels.shape[0], local_B
        )
        x = steps_mod.fetch_batch(store, idx, k_off, cfg, cfg.data.stochastic)
        x_local = jax.lax.dynamic_slice_in_dim(x, s * t_loc, t_loc, axis=1)
        y = store.labels[idx]
        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, x_local, y, k_drop)
        for ax in (seq_axis, data_axis):
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, ax), grads)
            loss = jax.lax.pmean(loss, ax)
            acc = jax.lax.pmean(acc, ax)
        # new_bs is already reduced over both axes inside the forward.
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
