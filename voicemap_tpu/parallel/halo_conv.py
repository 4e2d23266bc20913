"""Sequence (time-axis) parallelism for the conv stack: halo-exchange conv1d.

The convolutional analog of context parallelism (SURVEY.md §5 "Long-context /
sequence parallelism"): long waveform fragments are sharded along the time
axis across the mesh; every 'SAME' convolution needs ``(k-1)//2 · dilation``
neighbor samples at each shard boundary, exchanged with ``ppermute``
(zero-fill at the global edges — exactly XLA's 'SAME' zero padding). Max
pooling stays local (shard lengths are kept divisible by the pool factor),
the final GlobalMaxPool is a ``pmax``, and the Dense head is replicated.

``sharded_encoder_apply`` mirrors ``models.encoder.ConvEncoder`` in inference
mode from the same flax params, so the property test asserts exact equality
with the single-device forward — required for BASELINE.json config #3
(dilated stack at 4 kHz) at pod scale.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import EncoderConfig


def halo_exchange(x_local: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Concatenate ``halo`` boundary samples from both neighbors (zeros at
    the global edges). x_local: (B, T_local, C) → (B, T_local + 2·halo, C)."""
    if halo == 0:
        return x_local
    n_dev = jax.lax.axis_size(axis)
    # Send my right edge to my right neighbor (their left halo), and my left
    # edge to my left neighbor (their right halo). ppermute zero-fills
    # devices with no source — matching 'SAME' zero padding at the ends.
    right_perm = [(i, i + 1) for i in range(n_dev - 1)]
    left_perm = [(i + 1, i) for i in range(n_dev - 1)]
    left_halo = jax.lax.ppermute(x_local[:, -halo:, :], axis, right_perm)
    right_halo = jax.lax.ppermute(x_local[:, :halo, :], axis, left_perm)
    return jnp.concatenate([left_halo, x_local, right_halo], axis=1)


def halo_conv1d(
    x_local: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    axis: str,
    dilation: int = 1,
) -> jnp.ndarray:
    """'SAME' conv1d over a time-sharded (B, T_local, Cin) input.

    ``kernel``: (K, Cin, Cout) in flax layout. Requires odd K·dilation reach
    (flax 'SAME' centers odd kernels; even kernels pad asymmetrically —
    handled by splitting the halo ⌈·⌉ left / ⌊·⌋ right as XLA does).
    """
    K = kernel.shape[0]
    reach = (K - 1) * dilation
    halo_l = reach // 2
    halo_r = reach - halo_l
    halo = max(halo_l, halo_r)
    x = halo_exchange(x_local, halo, axis)
    # After symmetric exchange of `halo`, trim to the exact asymmetric reach.
    start = halo - halo_l
    x = x[:, start : start + x_local.shape[1] + reach, :]
    out = jax.lax.conv_general_dilated(
        x.astype(kernel.dtype),
        kernel,
        window_strides=(1,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        out = out + bias
    return out


def _bn_inference(x, scale, bias_, mean, var, eps):
    inv = jax.lax.rsqrt(var + eps) * scale
    return (x - mean) * inv + bias_


def sharded_encoder_apply(
    variables: dict,
    cfg: EncoderConfig,
    x_local: jnp.ndarray,
    axis: str,
) -> jnp.ndarray:
    """Inference forward of ConvEncoder over time-sharded input.

    Runs inside shard_map; mirrors models/encoder.py::ConvEncoder exactly
    (conv+relu → BN(running stats) → maxpool per block, then global-max via
    pmax and the Dense head). Shard T_local must stay divisible by each
    block's pool size.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    x = x_local.astype(jnp.float32)
    for i, (mult, k, p_sz, dil) in enumerate(
        zip(cfg.filter_multipliers, cfg.kernel_sizes, cfg.pool_sizes, cfg.dilations)
    ):
        blk = params[f"block_{i}"]
        bst = stats[f"block_{i}"]["bn"]
        x = halo_conv1d(x, blk["conv"]["kernel"].astype(jnp.float32),
                        blk["conv"]["bias"].astype(jnp.float32), axis, dil)
        x = jax.nn.relu(x)
        x = _bn_inference(
            x, blk["bn"]["scale"], blk["bn"]["bias"], bst["mean"], bst["var"],
            cfg.bn_epsilon,
        )
        if p_sz > 1:
            B, T, C = x.shape
            x = x.reshape(B, T // p_sz, p_sz, C).max(axis=2)
    # GlobalMaxPool over the sharded time axis: local max, then max over the
    # all_gathered shard maxima (all_gather+max rather than pmax so the whole
    # sharded forward stays differentiable — pmax has no JVP rule).
    x = jnp.max(x, axis=1)
    x = jnp.max(jax.lax.all_gather(x, axis), axis=0)
    emb = params["embed"]
    return x @ emb["kernel"].astype(jnp.float32) + emb["bias"]


def make_sharded_embed_fn(cfg: EncoderConfig, mesh: Mesh, axis: str = "seq"):
    """jit(shard_map) wrapper: (variables, x (B, T, 1)) → (B, D) embeddings,
    with x sharded along time over ``axis`` and the result replicated."""

    f = jax.shard_map(
        lambda v, x: sharded_encoder_apply(v, cfg, x, axis),
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(f)
