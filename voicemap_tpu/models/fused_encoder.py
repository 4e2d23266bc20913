"""Pooled-GEMM encoder forward: conv+relu+BN+maxpool as one matmul per block.

The standard encoder forward (models/encoder.py) is HBM-bound: block 0's
pre-pool activation is B·12000·128 values that XLA writes and re-reads around
the max-pool (BASELINE.md roofline). This module reformulates every
conv→relu→BN→pool block so the pool never sees a full-rate activation:

For pool stride ``p`` and kernel ``k``, the ``p`` consecutive conv outputs
feeding one pooled position all read from one input window of ``k+p−1``
samples. Stack the ``p`` phase-shifted copies of the conv weights into one
``(win·Cin, p·C)`` matrix; then

    frames (B, T/p, win·Cin) @ W_stacked → (B, T/p, p·C)
    → relu → BN affine (tiled ×p) → max over the p lane-blocks → (B, T/p, C)

— one GEMM whose output is already pool-rate: the full-rate activation only
ever exists inside the fused epilogue. Algebraically identical to the
reference topology (same parameters — this is a drop-in *forward*,
property-tested against ConvEncoder.apply in f32).

**Status (measured on v5e, B=2048):** at the XLA level this formulation is
2.5× *slower* than the native conv emitter (158 ms vs 62 ms) — the frames
gather materializes window-overlapped copies, and a strided-slice-sum
variant (win separate matmuls) is worse still (287 ms); XLA's conv emitter
reads the input once and wins. The module therefore is NOT on any hot path:
it exists as the verified mathematical specification (esp. the
phase-stacked ``_stack_weights`` matrix and the lane-block max epilogue)
for the planned Pallas conv-block kernel, where the framing happens
in-VMEM and the savings are real (see CLAUDE.md round-2 plan).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from .encoder import _DTYPES


def _pool_frame_indices(t_out: int, win: int, pool: int) -> np.ndarray:
    """(t_out, win) gather indices into the left-padded input."""
    return np.arange(t_out)[:, None] * pool + np.arange(win)[None, :]


def _stack_weights(w: jnp.ndarray, pool: int, dilation: int) -> jnp.ndarray:
    """w (k, Cin, C) → (win·Cin, pool·C) with the j-th phase shifted by j.

    win = (k−1)·dilation + pool. Zeros elsewhere reproduce 'SAME' behavior
    together with the caller's asymmetric edge padding.
    """
    k, cin, c = w.shape
    win = (k - 1) * dilation + pool
    out = jnp.zeros((win, cin, pool, c), w.dtype)
    for j in range(pool):
        out = out.at[j : j + (k - 1) * dilation + 1 : dilation, :, j, :].add(w)
    return out.reshape(win * cin, pool * c)


def fused_block_apply(
    x: jnp.ndarray,  # (B, T, Cin)
    w: jnp.ndarray,  # (k, Cin, C) conv kernel (flax layout)
    b: jnp.ndarray,  # (C,)
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    bn_eps: float,
    pool: int,
    dilation: int = 1,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """One conv(SAME)+relu+BN(inference)+maxpool block as a pooled GEMM."""
    B, T, cin = x.shape
    k = w.shape[0]
    if T % pool:
        raise ValueError(f"T={T} not divisible by pool={pool}")
    t_out = T // pool
    reach = (k - 1) * dilation
    pad_l = reach // 2
    pad_r = reach - pad_l
    win = reach + pool
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0))).astype(compute_dtype)
    idx = jnp.asarray(_pool_frame_indices(t_out, win, pool))
    frames = xp[:, idx, :]  # (B, t_out, win, cin)
    frames = frames.reshape(B, t_out, win * cin)
    w4 = _stack_weights(w.astype(compute_dtype), pool, dilation)
    y = jnp.einsum(
        "btw,wz->btz", frames, w4, preferred_element_type=jnp.float32
    )  # (B, t_out, pool*C)
    c = w.shape[2]
    y = y + jnp.tile(b.astype(jnp.float32), pool)
    y = jax.nn.relu(y)
    # BN inference affine, tiled across the pool phases.
    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + bn_eps) * bn_scale
    y = (y - jnp.tile(bn_mean, pool)) * jnp.tile(inv, pool) + jnp.tile(
        bn_bias, pool
    )
    # Max over the pool phases: static lane-block slices (no reshape of the
    # minor dim needed — friendly to a future Pallas port of this epilogue).
    out = y[:, :, :c]
    for j in range(1, pool):
        out = jnp.maximum(out, y[:, :, j * c : (j + 1) * c])
    return out.astype(compute_dtype)


def fused_encoder_apply(
    variables: dict,
    cfg: EncoderConfig,
    x: jnp.ndarray,  # (B, T, 1) float32
) -> jnp.ndarray:
    """Inference forward of ConvEncoder from the same variables, with every
    block in pooled-GEMM form. Returns (B, embedding_dim) float32."""
    params = variables["params"]
    stats = variables["batch_stats"]
    cdt = _DTYPES[cfg.compute_dtype]
    h = x
    for i, (mult, k, p, dil) in enumerate(
        zip(cfg.filter_multipliers, cfg.kernel_sizes, cfg.pool_sizes, cfg.dilations)
    ):
        blk = params[f"block_{i}"]
        bst = stats[f"block_{i}"]["bn"]
        h = fused_block_apply(
            h,
            blk["conv"]["kernel"],
            blk["conv"]["bias"],
            blk["bn"]["scale"],
            blk["bn"]["bias"],
            bst["mean"],
            bst["var"],
            cfg.bn_epsilon,
            pool=p,
            dilation=dil,
            compute_dtype=cdt,
        )
    h = jnp.max(h, axis=1)  # GlobalMaxPool1D
    emb = params["embed"]
    out = h @ emb["kernel"].astype(cdt) + emb["bias"].astype(cdt)
    return out.astype(jnp.float32)
