"""Fast inference embedding: Pallas fused block 0 + XLA for the rest.

The encoder's first block (Cin=1, kernel 32, pool 4) costs 27 ms of the
62 ms forward at B=2048 under the XLA emitter — it is HBM-bound on the
full-rate (B, T, C) activation. ``ops/pallas_conv.pallas_conv_block0`` fuses
conv+relu+BN+pool in VMEM (12.3 ms, 2.2×); blocks 1+ have Cin ≥ 128 and are
compute-bound where XLA's conv emitter is already efficient, so they run as
plain lax ops from the same flax variables.

Blocks 1+ always run on the XLA emitter here. The pair-merge pooled-GEMM
kernel (``ops/pallas_conv.pallas_conv_blockn``) is built and oracle-tested
but benches slower than XLA in its per-row-grid form (142 ms vs 62 ms full
encoder @ B=2048), so the fast path does not use it — see the inline note at
the block loop and CLAUDE.md's round-2 plan. Inference only (BN running
stats); property-tested against ``ConvEncoder.apply`` and used by the
headline benchmark.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EncoderConfig
from .encoder import _DTYPES


def _xla_block(x, blk, bst, pool, dilation, eps, cdt):
    w = blk["conv"]["kernel"].astype(cdt)
    y = jax.lax.conv_general_dilated(
        x.astype(cdt), w, (1,), "SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + blk["conv"]["bias"].astype(cdt)
    y = jax.nn.relu(y.astype(jnp.float32))
    inv = jax.lax.rsqrt(bst["var"].astype(jnp.float32) + eps) * blk["bn"]["scale"]
    y = (y - bst["mean"]) * inv + blk["bn"]["bias"]
    y = y.astype(cdt)
    if pool > 1:
        B, T, C = y.shape
        # nn.max_pool semantics (VALID): floor — drop the tail remainder.
        t_full = (T // pool) * pool
        y = y[:, :t_full].reshape(B, T // pool, pool, C).max(axis=2)
    return y


def block0_pallas_eligible(cfg: EncoderConfig, x: jnp.ndarray) -> bool:
    t = x.shape[1]
    return (
        jax.default_backend() == "tpu"
        and cfg.dilations[0] == 1
        and x.shape[-1] == 1  # the kernel is Cin=1 only
        and t % cfg.pool_sizes[0] == 0
    )


def fast_embed(variables: dict, cfg: EncoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 1) float32 → (B, embedding_dim) float32, inference forward."""
    params = variables["params"]
    stats = variables["batch_stats"]
    cdt = _DTYPES[cfg.compute_dtype]
    h = x
    start = 0
    if block0_pallas_eligible(cfg, x):
        from ..ops.pallas_conv import pallas_conv_block0

        blk = params["block_0"]
        bst = stats["block_0"]["bn"]
        h = pallas_conv_block0(
            h,
            blk["conv"]["kernel"],
            blk["conv"]["bias"],
            blk["bn"]["scale"],
            blk["bn"]["bias"],
            bst["mean"],
            bst["var"],
            cfg.bn_epsilon,
            pool=cfg.pool_sizes[0],
            out_dtype=cdt,
            gemm_dtype=cdt,
        )
        start = 1
    for i in range(start, len(cfg.filter_multipliers)):
        # Blocks 1+ stay on the XLA emitter: they are ~74% MXU-efficient
        # (compute-bound, Cin≥128) and the pair-merge Pallas kernel
        # (ops/pallas_conv.pallas_conv_blockn — correct, oracle-tested) is
        # slower in its current per-row-grid form (142 ms vs 62 ms full
        # encoder @ B=2048: the (T, 2C) f32 input block per grid step
        # dominates). Winning would need chunked HBM DMA streaming of the
        # input — round-2 work recorded in CLAUDE.md.
        h = _xla_block(
            h,
            params[f"block_{i}"],
            stats[f"block_{i}"]["bn"],
            cfg.pool_sizes[i],
            cfg.dilations[i],
            cfg.bn_epsilon,
            cdt,
        )
    h = jnp.max(h, axis=1)
    emb = params["embed"]
    out = h @ emb["kernel"].astype(cdt) + emb["bias"].astype(cdt)
    return out.astype(jnp.float32)
