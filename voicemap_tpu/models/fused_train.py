"""Functional TRAINING forward with the fused block-0 custom-VJP op.

The training-mode counterpart of ``models/fast_infer.py``: block 0 (Cin=1,
the encoder's HBM-bound block) runs through the fused conv+relu+BN(train)+
maxpool op with a custom VJP (``ops/conv_train.py`` — Pallas cores on TPU),
while blocks 1+ replicate flax ``ConvBlock`` train semantics op-for-op (same
XLA program, same variable tree) so the whole forward is a drop-in for
``model.apply(..., train=True, mutable=["batch_stats"])``.

Reference behavior: the train loop of ``experiments/train_siamese_net.py``
(SURVEY.md §3.1 HOT LOOP #2) — this path exists to make the dominant
real workload (training) run at the speed the roofline allows.

Parity contract (tests/test_fused_train_apply.py): with float32 dtypes and
dropout=0 this forward matches ``model.apply`` values and parameter
gradients to ≤1e-4. Dropout uses its own per-block key folding (flax
Dropout's internal RNG path salts differently), so masks differ from flax
at equal seeds — same distribution, property-tested shape/broadcast.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import EncoderConfig, SiameseConfig
from ..ops import distance as dist_ops
from ..ops.conv_train import make_fused_block0_train
from .encoder import _DTYPES


def fused_block0_train_eligible(cfg: EncoderConfig, x: jnp.ndarray) -> bool:
    return (
        cfg.dilations[0] == 1
        and x.shape[-1] == 1
        and x.shape[1] % cfg.pool_sizes[0] == 0
    )


def _jnp_block_train(x, blk, bst, *, pool, dilation, eps, momentum, dropout,
                     drop_key, cdt):
    """flax ConvBlock train-mode semantics, functional.

    Same math as flax's conv→relu→BN(train)→drop→pool but HBM-lean: the
    full-rate activation stays in the compute dtype (bf16 on TPU) end to
    end — BN statistics accumulate in f32 *inside* the reduction (XLA fuses
    the convert into the reduce loop, nothing f32 is materialized), and the
    normalization is folded to a per-channel affine ``a·mul + add`` applied
    in the compute dtype. Versus the round-2 version (which upcast the
    (B, T, C) activation to f32 before BN), this halves every full-rate
    HBM touch in forward AND in the autodiff residuals. f32 compute_dtype
    degenerates to the same math exactly (modulo affine re-association,
    ≪ the 1e-4 parity tolerance)."""
    w = blk["conv"]["kernel"].astype(cdt)
    z = jax.lax.conv_general_dilated(
        x.astype(cdt), w, (1,), "SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + blk["conv"]["bias"].astype(cdt)
    a = jax.nn.relu(z)
    af = a.astype(jnp.float32)  # fuses into the reductions below
    mu = jnp.mean(af, axis=(0, 1))
    var = jnp.maximum(jnp.mean(af * af, axis=(0, 1)) - mu * mu, 0.0)
    r = jax.lax.rsqrt(var + eps)
    mul = blk["bn"]["scale"] * r
    add = blk["bn"]["bias"] - mu * mul
    y = a * mul.astype(cdt) + add.astype(cdt)
    if dropout > 0.0:
        keep = 1.0 - dropout
        mask = jax.random.bernoulli(drop_key, keep, (y.shape[0], 1, y.shape[2]))
        y = jnp.where(mask, y / keep, 0.0).astype(cdt)
    if pool > 1:
        B, T, C = y.shape
        t_full = (T // pool) * pool
        y = y[:, :t_full].reshape(B, T // pool, pool, C).max(axis=2)
    new_bn = {
        "mean": momentum * bst["mean"] + (1.0 - momentum) * mu,
        "var": momentum * bst["var"] + (1.0 - momentum) * var,
    }
    return y, new_bn


def _fused_block_train(x, blk, bst, *, pool, dilation, eps, momentum,
                       dropout, drop_key, cdt, save_act=True,
                       pallas_routing=False, interpret=False,
                       quant="none"):
    """Blocks-1+ train step through the custom-VJP affine-folded op.

    Same semantics as ``_jnp_block_train`` with dropout commuted to pool
    rate (channel-broadcast masks are per-channel monotone scalings, so
    they preserve the pool's argmax — the block-0 path's argument).

    ``pallas_routing`` selects the Mosaic pool/routing kernels
    (ops/pallas_routing.py) when the block's channel count is
    lane-aligned; silently degrades to the XLA lane-view path otherwise.
    """
    from ..ops.conv_train import make_fused_blockn_train
    from ..ops.pallas_routing import routing_supported

    f32 = cdt == jnp.float32
    c_out = blk["conv"]["kernel"].shape[2]
    use_pallas = (pallas_routing and save_act
                  and routing_supported(c_out, cdt))
    fn = make_fused_blockn_train(
        pool, eps, dilation=dilation,
        gemm_dtype="float32" if f32 else "bfloat16",
        sel_dtype="float32" if f32 else "bfloat16",
        save_act=save_act,
        routing="pallas" if use_pallas else "xla",
        interpret=interpret,
        quant=quant,
    )
    T = x.shape[1]
    if pool > 1 and T % pool:
        # Truncating the block INPUT before the conv would diverge from
        # flax semantics (SAME-padding boundary + BN stats over full T);
        # callers must route such blocks to _jnp_block_train instead.
        raise ValueError(
            f"fused blocks-1+ op needs T % pool == 0 (got T={T}, "
            f"pool={pool}); use the jnp block for this shape"
        )
    y, mu, var = fn(
        x, blk["conv"]["kernel"], blk["conv"]["bias"],
        blk["bn"]["scale"], blk["bn"]["bias"],
    )
    y = y.astype(cdt)
    if dropout > 0.0:
        keep = 1.0 - dropout
        mask = jax.random.bernoulli(drop_key, keep, (y.shape[0], 1, y.shape[2]))
        y = jnp.where(mask, y / keep, 0.0).astype(cdt)
    new_bn = {
        "mean": momentum * bst["mean"] + (1.0 - momentum) * mu,
        "var": momentum * bst["var"] + (1.0 - momentum) * var,
    }
    return y, new_bn


def encoder_train_forward(
    params: Dict,
    batch_stats: Dict,
    cfg: EncoderConfig,
    x: jnp.ndarray,  # (B, T, 1) float32
    dropout_key: Optional[jax.Array] = None,
    impl: str = "pallas",
    interpret: bool = False,
    blockn: str = "jnp",
) -> Tuple[jnp.ndarray, Dict]:
    """→ (embedding (B, D) float32, new_batch_stats pytree).

    ``blockn``: how blocks 1+ run — ``"jnp"`` = flax-semantics functional
    blocks differentiated by autodiff; ``"fused"`` = the custom-VJP
    affine-folded op (ops/conv_train.py::make_fused_blockn_train,
    save-act variant, lane-view/argmax-index pooling); ``"fused_recompute"``
    = its pool-rate-residual variant (conv recomputed in backward);
    ``"fused_pallas"`` = experimental Mosaic pool/routing kernels (see the
    negative-result note at the call site); ``"fused_int8"`` = save-act
    variant with the forward conv in s8×s8→s32 and a straight-through
    backward (the int8 training-forward experiment — see
    ops/conv_train.py::make_fused_blockn_train's ``quant``)."""
    cdt = _DTYPES[cfg.compute_dtype]
    if cfg.dropout > 0.0 and dropout_key is None:
        raise ValueError("dropout_key required when cfg.dropout > 0")
    new_stats: Dict = {}
    h = x
    start = 0
    if fused_block0_train_eligible(cfg, x):
        blk = params["block_0"]
        bst = batch_stats["block_0"]["bn"]
        # float32 cores off-TPU / in parity tests; bf16 GEMM on the chip.
        f32 = cfg.compute_dtype == "float32"
        fn = make_fused_block0_train(
            cfg.pool_sizes[0], cfg.bn_epsilon, impl=impl,
            gemm_dtype="float32" if f32 else "bfloat16",
            sel_dtype="float32" if f32 else "bfloat16",
            interpret=interpret,
        )
        pooled, mu, var = fn(
            h, blk["conv"]["kernel"], blk["conv"]["bias"],
            blk["bn"]["scale"], blk["bn"]["bias"],
        )
        y = pooled.astype(cdt)
        if cfg.dropout > 0.0:
            keep = 1.0 - cfg.dropout
            mask = jax.random.bernoulli(
                jax.random.fold_in(dropout_key, 0), keep,
                (y.shape[0], 1, y.shape[2]),
            )
            # SpatialDropout broadcasts over time, so it commutes with the
            # max-pool (scale ≥ 0) — applied at pool rate.
            y = jnp.where(mask, y / keep, 0.0).astype(cdt)
        h = y
        m = cfg.bn_momentum
        new_stats["block_0"] = {"bn": {
            "mean": m * bst["mean"] + (1.0 - m) * mu,
            "var": m * bst["var"] + (1.0 - m) * var,
        }}
        start = 1
    for i in range(start, len(cfg.filter_multipliers)):
        # The fused blocks-1+ op is scoped to MID-NETWORK blocks whose time
        # axis divides the pool: block 0 (Cin=1, k=32 — when the dedicated
        # Pallas block-0 op was ineligible) and any T % pool remainder fall
        # back to the flax-semantics autodiff block (conv over full T, BN
        # stats over full T, truncate only at the pool — see
        # _fused_block_train's ValueError).
        fused_ok = (
            blockn in ("fused", "fused_recompute", "fused_pallas",
                       "fused_int8")
            and i >= 1
            and (cfg.pool_sizes[i] <= 1 or h.shape[1] % cfg.pool_sizes[i] == 0)
        )
        if fused_ok:
            # "fused_pallas" (Mosaic pool/routing kernels) is EXPERIMENTAL,
            # not production: measured at B=1024 it beats the XLA lane-view
            # path on blocks 2-3 by ~1-2 ms but loses 4 ms on block 1, and
            # its materialization boundaries push the B=2048 program over
            # HBM capacity (BASELINE.md round 3 negative result).
            h, new_bn = _fused_block_train(
                h, params[f"block_{i}"], batch_stats[f"block_{i}"]["bn"],
                pool=cfg.pool_sizes[i], dilation=cfg.dilations[i],
                eps=cfg.bn_epsilon, momentum=cfg.bn_momentum,
                dropout=cfg.dropout,
                drop_key=(jax.random.fold_in(dropout_key, i)
                          if cfg.dropout > 0.0 else None),
                cdt=cdt, save_act=(blockn != "fused_recompute"),
                pallas_routing=(blockn == "fused_pallas"),
                interpret=interpret,
                quant=("int8" if blockn == "fused_int8" else "none"),
            )
        else:
            h, new_bn = _jnp_block_train(
                h, params[f"block_{i}"], batch_stats[f"block_{i}"]["bn"],
                pool=cfg.pool_sizes[i], dilation=cfg.dilations[i],
                eps=cfg.bn_epsilon, momentum=cfg.bn_momentum,
                dropout=cfg.dropout,
                drop_key=(jax.random.fold_in(dropout_key, i)
                          if cfg.dropout > 0.0 else None),
                cdt=cdt,
            )
        new_stats[f"block_{i}"] = {"bn": new_bn}
    h = jnp.max(h, axis=1)
    emb = params["embed"]
    out = h @ emb["kernel"].astype(cdt) + emb["bias"].astype(cdt)
    return out.astype(jnp.float32), new_stats


def classifier_train_forward(
    params: Dict,
    batch_stats: Dict,
    cfg: EncoderConfig,
    x: jnp.ndarray,
    dropout_key: Optional[jax.Array] = None,
    impl: str = "pallas",
    interpret: bool = False,
    blockn: str = "jnp",
) -> Tuple[jnp.ndarray, Dict]:
    """SpeakerClassifier.apply(train=True) drop-in → (logits, new_batch_stats)."""
    emb, enc_stats = encoder_train_forward(
        params["encoder"], batch_stats["encoder"], cfg, x, dropout_key,
        impl=impl, interpret=interpret, blockn=blockn,
    )
    cdt = _DTYPES[cfg.compute_dtype]
    head = params["head"]
    logits = emb.astype(cdt) @ head["kernel"].astype(cdt) + head["bias"].astype(cdt)
    return logits.astype(jnp.float32), {"encoder": enc_stats}


def siamese_train_forward(
    params: Dict,
    batch_stats: Dict,
    cfg: EncoderConfig,
    siamese: SiameseConfig,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    dropout_key: Optional[jax.Array] = None,
    impl: str = "pallas",
    interpret: bool = False,
    blockn: str = "jnp",
) -> Tuple[jnp.ndarray, Dict]:
    """SiameseNet.apply(train=True) drop-in → ((B,) logits, new_batch_stats)."""
    B = x1.shape[0]
    stacked = jnp.concatenate([x1, x2], axis=0)
    emb, enc_stats = encoder_train_forward(
        params["encoder"], batch_stats["encoder"], cfg, stacked, dropout_key,
        impl=impl, interpret=interpret, blockn=blockn,
    )
    e1, e2 = emb[:B], emb[B:]
    feats = dist_ops.merge_features(e1, e2, siamese.distance_metric)
    head = params["head"]
    logits = feats @ head["kernel"] + head["bias"]
    return logits[..., 0], {"encoder": enc_stats}


def siamese_embed_train_forward(
    params: Dict,
    batch_stats: Dict,
    cfg: EncoderConfig,
    x: jnp.ndarray,
    dropout_key: Optional[jax.Array] = None,
    impl: str = "pallas",
    interpret: bool = False,
    blockn: str = "jnp",
) -> Tuple[jnp.ndarray, Dict]:
    """SiameseNet.embed(train=True) drop-in (contrastive-loss path)."""
    emb, enc_stats = encoder_train_forward(
        params["encoder"], batch_stats["encoder"], cfg, x, dropout_key,
        impl=impl, interpret=interpret, blockn=blockn,
    )
    return emb, {"encoder": enc_stats}
