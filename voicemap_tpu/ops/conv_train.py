"""Fused conv-block-0 TRAINING op with a custom VJP.

Reference behavior: the encoder's first block in train mode —
``Conv1D(C, k, SAME) → ReLU → BatchNorm(train stats) → MaxPool1D(pool)``
(reference: ``voicemap/models.py :: get_baseline_convolutional_encoder``,
SURVEY.md §3.5; BN semantics per Keras/flax train mode). The XLA emitter
spends the block's time on HBM round-trips of the full-rate ``(B, T, C)``
activation: forward writes it and the pool re-reads it; backward scatters
the pooled cotangent back to full rate, BN-backward re-reads it, and the
conv weight gradient reads it again (BASELINE.md roofline).

This module reformulates the block so **no full-rate tensor ever leaves
VMEM**, in either direction:

Forward
    One pooled-GEMM pass (the phase-stacked weight formulation proven in
    ``models/fused_encoder.py``) emits only
    - ``a_sel (B, T/pool, C)`` — the phase value the max-pool selects, and
    - per-channel stats ``(Σa, Σa², #(a>0))`` over the full-rate ReLU
      activation, accumulated in-kernel.
    Because BN's train-mode affine ``y = (a−μ)·γ·r + β`` (``r = rsqrt(σ²+ε)``)
    is monotone per channel, the pool's argmax over ``y`` equals the argmax
    over ``sign(γ)·a`` — so the selected value and the batch statistics are
    enough to reconstruct the exact pooled BN output *after* the stats are
    known: ``pooled = (a_sel − μ)·γ·r + β``.

Backward
    The BN-train backward w.r.t. the pre-BN activation is
    ``da = γ·r·(g − Σg/N − â·Σ(g·â)/N)`` — an affine function of ``a`` with
    per-channel constants computable at POOL RATE (the max-pool routes every
    pooled cotangent to exactly one full-rate position, so Σg and Σ(g·â)
    over the full-rate grid equal their pooled sums). With
    ``c0 = γ·r``, ``c1``, ``c2`` folded on the host side:

        dz = 1[a>0] · (c0·g_routed + c1 + c2·a)
        dW = framesᵀ @ dz        (one GEMM, full-rate ``a``/``dz`` recomputed
                                  chunk-wise in VMEM, never materialized)
        db = Σ dz                (accumulated f32 in the same core, over the
                                  same routing/gating as dW — self-consistent)
        dγ, dβ                   (pool-rate reductions, XLA)

    The gradient w.r.t. the block input is intentionately **zero**: block 0
    is the model's first layer and its input is non-differentiable audio
    data. (Asserted by tests; do not reuse this op mid-network.)

Two interchangeable cores:
- ``impl='xla'`` — materializing oracle used by the parity tests.
- ``impl='pallas'`` — Mosaic kernels (``pallas_conv_train.py``) that keep
  the full-rate activation in VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _conv_same(x: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """x (B, T, 1) ⊛ w (k, 1, C) → (B, T, C), SAME padding."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )


def _xla_fwd_core(x, w, b, sgn, pool, dtype):
    """Full-rate oracle: (a_sel, sum_a, sumsq_a, count_pos)."""
    B, T, _ = x.shape
    c = w.shape[2]
    a = jax.nn.relu(_conv_same(x, w, dtype) + b.astype(jnp.float32))
    sum_a = jnp.sum(a, axis=(0, 1))
    sumsq_a = jnp.sum(a * a, axis=(0, 1))
    count_pos = jnp.sum((a > 0).astype(jnp.float32), axis=(0, 1))
    ar = a.reshape(B, T // pool, pool, c)
    a_sel = sgn * jnp.max(sgn[None, None, None, :] * ar, axis=2)
    return a_sel, sum_a, sumsq_a, count_pos


def _xla_bwd_core(x, w, b, sgn, g, c0, c1, c2, pool, dtype):
    """Full-rate oracle backward: (dw, db).

    Recomputes the activation AND the pool's selection (sign-directed max)
    so the routing is self-consistent — no bitwise-equality dependence on
    the forward pass — then routes the pooled cotangent to the first phase
    (in time order) achieving the max, matching XLA's reduce_window max
    gradient, and correlates dz with the input.

    All conv arithmetic runs on f32 views of `dtype`-rounded operands so
    the vjp transpose sees uniform dtypes (jax rejects mixed-dtype conv
    transposes); the products equal the MXU's dtype-operand/f32-accumulate
    form.
    """
    B, T, _ = x.shape
    c = w.shape[2]

    def conv(W):
        y = jax.lax.conv_general_dilated(
            x.astype(dtype).astype(jnp.float32),
            W.astype(dtype).astype(jnp.float32),
            (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b.astype(jnp.float32)

    z, conv_vjp = jax.vjp(conv, w)
    a = jax.nn.relu(z)
    ar = a.reshape(B, T // pool, pool, c)
    best = jnp.max(sgn[None, None, None, :] * ar, axis=2)
    taken = jnp.zeros(best.shape, bool)
    routed = []
    for j in range(pool):
        eq = (sgn[None, None, :] * ar[:, :, j, :] == best) & ~taken
        routed.append(jnp.where(eq, g, 0.0))
        taken = taken | eq
    g_full = jnp.stack(routed, axis=2).reshape(B, T, c)
    da = c0 * g_full + c1 + c2 * a
    dz = jnp.where(a > 0, da, 0.0)
    (dw,) = conv_vjp(dz)
    db_direct = jnp.sum(dz, axis=(0, 1))
    return dw, db_direct


@functools.lru_cache(maxsize=None)
def make_fused_blockn_train(
    pool: int,
    eps: float,
    dilation: int = 1,
    gemm_dtype: str = "bfloat16",
    sel_dtype: str = "bfloat16",
    save_act: bool = True,
    routing: str = "xla",
    interpret: bool = False,
    quant: str = "none",
):
    """Custom-VJP conv+relu+BN(train)+maxpool for MID-NETWORK blocks (Cin>1).

    Same affine-folded BN-train reformulation as the block-0 op (module
    docstring), built from plain XLA ops — the round-2 streamed-Pallas
    experiment showed XLA's conv emitter is already fastest for blocks 1+,
    so the win here is in the AUTODIFF structure: BN's train backward folds
    to per-channel affine constants computable at POOL rate, and the pool
    routing is recomputed from the activation, replacing XLA's mean/var
    transpose chain + reduce_window max-gradient with one lean fused
    elementwise pass. Produces dx for upstream blocks, unlike the
    first-layer-only block-0 op.

    ``save_act=True`` keeps the full-rate relu activation (gemm_dtype) as a
    residual — same residual footprint as autodiff, backward = routing +
    dW + dX (3 GEMMs total, like autodiff, minus its elementwise overhead).
    ``save_act=False`` stores only the pool-rate ``a_sel`` and recomputes
    the conv in backward (4 GEMMs, ~4× smaller residuals — for
    memory-bound regimes).

    Returns ``fn(x, w, b, gamma, beta) -> (pooled_y, mu, var)``; f32-exact
    vs flax semantics at gemm_dtype=float32 (tests/test_conv_train.py).

    Pooling/routing use the LANE-VIEW formulation (bench_conv_bwd.py): the
    full-rate activation is viewed as ``(B, T/pool, pool·C)`` — a free
    row-major reshape — so each pool phase is a static lane slice at a
    C-multiple. The forward takes the sign-directed max across phase
    slices and records the argmax phase as an int8 residual; the backward
    routes the pooled cotangent by comparing against that index, with no
    cross-phase ``taken`` chain and no 4-D stack. Measured (block 1,
    B=512, v5e): composed backward 24.5 → 14.8 ms; XLA's conv transposes
    were never the problem (dW at 174+ TFLOP/s).

    ``routing='pallas'`` (requires ``save_act`` and lane-aligned C) moves
    the forward pool/stat epilogue and the backward routing pass into
    Mosaic kernels (ops/pallas_routing.py) that touch the full-rate
    activation exactly once each — XLA's emission of the same lane-view
    chain still measures ~3–4× above the HBM bound. The convolutions stay
    with XLA either way.

    ``quant='int8'`` (requires ``save_act``, ``routing='xla'``) runs the
    FORWARD conv in s8×s8→s32 with in-step dynamic symmetric scales
    (per-tensor input amax, per-out-channel weight amax) — the training-
    forward analog of the int8 serving path. The backward is a straight-
    through estimator: dW/dX GEMMs use the real (unquantized) ``x``/``w``
    in gemm_dtype, while the routing/gating/c2·a chain reads the saved
    DEQUANTIZED activation, so the pool selection stays forward-consistent.
    Accuracy must be re-validated per config (see BASELINE.md's int8-train
    row); this is an opt-in experiment knob, not the default.
    """
    dtype = jnp.dtype(gemm_dtype)
    sdt = jnp.dtype(sel_dtype)
    if routing not in ("xla", "pallas"):
        raise ValueError(routing)
    if routing == "pallas" and not save_act:
        raise ValueError("routing='pallas' requires save_act=True")
    if quant not in ("none", "int8"):
        raise ValueError(quant)
    if quant == "int8" and (not save_act or routing != "xla"):
        # The int8 forward's dequantized activation must be the SAME tensor
        # the backward routes/gates on (save-act residual); a recompute
        # variant would re-derive the unquantized activation and silently
        # diverge from the forward's pool selection.
        raise ValueError("quant='int8' requires save_act=True, routing='xla'")

    def conv_f32acc(x, w):
        """Fast-path conv: dtype operands, f32 accumulation (MXU-native)."""
        return jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), (1,), "SAME",
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )

    def conv_uni(x, w):
        """Uniform-dtype conv used only for linear_transpose (JAX rejects
        mixed-dtype conv transposes); TPU still accumulates f32 internally."""
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def _pool_lane(a, sgn_like):
        """Sign-directed max-pool via the lane view → (a_sel, idx int8).

        ``idx`` is the FIRST phase (time order) achieving the max — the
        same routing XLA's reduce_window max gradient uses, enforced by
        strict-``>`` updates.
        """
        B, T, c = a.shape
        al = a.reshape(B, T // pool, pool * c)
        best = sgn_like * al[:, :, :c]
        idx = jnp.zeros(best.shape, jnp.int8)
        for j in range(1, pool):
            sj = sgn_like * al[:, :, j * c:(j + 1) * c]
            gt = sj > best
            best = jnp.where(gt, sj, best)
            idx = jnp.where(gt, jnp.int8(j), idx)
        return sgn_like * best, idx

    def primal(x, w, b, gamma, beta):
        B, T, _ = x.shape
        N = B * T
        sgn = jnp.where(gamma >= 0, 1.0, -1.0).astype(jnp.float32)
        if routing == "pallas":
            from .pallas_routing import pallas_pool_fwd

            a = jax.nn.relu(conv_uni(x.astype(dtype), w.astype(dtype))
                            + b.astype(dtype))
            sel, sum_a, sumsq_a = pallas_pool_fwd(
                a, sgn, pool, sel_dtype=sdt, interpret=interpret)
            idx = None
        elif save_act:
            if quant == "int8":
                # Dynamic symmetric quantization (VERDICT r3 next #3): the
                # forward conv runs s8×s8→s32 on the MXU's double-rate int8
                # path (the serving path's lowering, models/quant_infer.py::
                # _quant_block). Scales are derived IN-STEP — per-tensor
                # input scale from this batch's amax, per-out-channel weight
                # scales from the current weights — so no calibration state
                # threads through the train loop. The dequantized activation
                # below is the block's ONLY activation: stats, pool routing,
                # and the saved backward residual all see the same tensor.
                wf = w.astype(jnp.float32)
                sw = jnp.maximum(
                    jnp.max(jnp.abs(wf), axis=(0, 1)) / 127.0, 1e-12)
                sx = jnp.maximum(
                    jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, 1e-12)
                qx = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                              -127, 127).astype(jnp.int8)
                qw = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    qx, qw, (1,), "SAME", rhs_dilation=(dilation,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=jnp.int32,
                )
                a = jax.nn.relu(
                    acc.astype(jnp.float32) * (sx * sw)
                    + b.astype(jnp.float32)
                ).astype(dtype)
            else:
                # Activation in gemm_dtype (= flax's conv output dtype); f32
                # accumulation happens inside the stat reductions.
                a = jax.nn.relu(conv_uni(x.astype(dtype), w.astype(dtype))
                                + b.astype(dtype))
            af = a.astype(jnp.float32)
            sum_a = jnp.sum(af, axis=(0, 1))
            sumsq_a = jnp.sum(af * af, axis=(0, 1))
            sel, idx = _pool_lane(a, sgn.astype(dtype))
        else:
            a = jax.nn.relu(conv_f32acc(x, w) + b.astype(jnp.float32))
            sum_a = jnp.sum(a, axis=(0, 1))
            sumsq_a = jnp.sum(a * a, axis=(0, 1))
            sel, idx = _pool_lane(a, sgn)
        a_sel = sel.astype(sdt)
        mu = sum_a / N
        var = jnp.maximum(sumsq_a / N - mu * mu, 0.0)
        r = jax.lax.rsqrt(var + eps)
        pooled = (a_sel.astype(jnp.float32) - mu) * (gamma * r) + beta
        return pooled, mu, var, a, a_sel, idx

    @jax.custom_vjp
    def fused(x, w, b, gamma, beta):
        pooled, mu, var, _, _, _ = primal(x, w, b, gamma, beta)
        return pooled, mu, var

    def fwd(x, w, b, gamma, beta):
        pooled, mu, var, a, a_sel, idx = primal(x, w, b, gamma, beta)
        # Pool-rate residuals a_sel + idx are cheap (1/pool rate, sdt+int8)
        # and buy the backward two things: the BN sums S1/S2 read pool-rate
        # tensors instead of re-deriving the selection from full-rate a,
        # and the routing select against idx is forward-consistent by
        # construction (no bitwise-equality recompute).
        a_res = a.astype(dtype) if save_act else None
        return (pooled, mu, var), (x, w, b, gamma, a_res, a_sel, idx, mu, var)

    def bwd(res, cots):
        g, g_mu, g_var = cots
        x, w, b, gamma, a_res, a_sel, idx, mu, var = res
        B, T_out = g.shape[0], g.shape[1]
        c = w.shape[2]
        N = B * T_out * pool
        r = jax.lax.rsqrt(var + eps)
        m = gamma * r

        # Pool-rate BN sums straight from the stored selection.
        ahat_sel = (a_sel.astype(jnp.float32) - mu) * r
        S1 = jnp.sum(g, axis=(0, 1))
        S2 = jnp.sum(g * ahat_sel, axis=(0, 1))
        dbeta = S1
        dgamma = S2
        c0 = m
        c1 = -m * S1 / N + m * r * mu * S2 / N + g_mu / N - 2.0 * mu * g_var / N
        c2 = -m * r * S2 / N + 2.0 * g_var / N

        # Activation for the c2·a term and the relu gate: the saved
        # residual, or a recompute from the same in-context inputs.
        # Everything full-rate stays in the GEMM dtype: the routing/gating
        # chain fuses into the single materialized dz (bf16 halves the
        # transient HBM footprint), and the per-channel f32 constants ride
        # inside the fused loop. Routing compares each phase's lane slice
        # against the stored argmax index — one select per phase, no
        # cross-phase dependency.
        xb = x.astype(dtype)
        wb = w.astype(dtype)
        if save_act:
            a = a_res
        else:
            a = jax.nn.relu(conv_uni(xb, wb) + b.astype(dtype))
        if routing == "pallas":
            from .pallas_routing import pallas_route_bwd

            dz, db = pallas_route_bwd(
                a, a_sel, g, c0, c1, c2, pool, out_dtype=dtype,
                interpret=interpret)
        else:
            al = a.reshape(B, T_out, pool * c)
            gb = g.astype(dtype)
            c0d, c1d, c2d = (c0.astype(dtype), c1.astype(dtype),
                             c2.astype(dtype))
            zero = jnp.zeros((), dtype)
            parts = []
            for j in range(pool):
                aj = al[:, :, j * c:(j + 1) * c]
                gj = jnp.where(idx == j, gb, zero)
                daj = c0d * gj + c1d + c2d * aj
                parts.append(jnp.where(aj > 0, daj, zero))
            dz = jnp.concatenate(parts, axis=2).reshape(B, T_out * pool, c)
            db = jnp.sum(dz, axis=(0, 1), dtype=jnp.float32)

        (dw,) = jax.linear_transpose(lambda w_: conv_uni(xb, w_), wb)(dz)
        (dx,) = jax.linear_transpose(lambda x_: conv_uni(x_, wb), xb)(dz)
        return dx.astype(x.dtype), dw.astype(w.dtype), db, dgamma, dbeta

    fused.defvjp(fwd, bwd)
    return fused


@functools.lru_cache(maxsize=None)
def make_fused_block0_train(
    pool: int,
    eps: float,
    impl: str = "xla",
    gemm_dtype: str = "float32",
    sel_dtype: str = "float32",
    interpret: bool = False,
):
    """Factory for the custom-VJP fused train block.

    Returns ``fn(x, w, b, gamma, beta) -> (pooled_y, mu, var)`` where
    - ``x (B, T, 1)`` float32 waveform (T divisible by pool),
    - ``pooled_y (B, T/pool, C)`` float32 — BN train output, max-pooled,
    - ``mu, var (C,)`` — the batch statistics (flax fast-variance
      convention: ``max(E[a²] − E[a]², 0)``) for the running-stats update.

    The VJP returns ZERO for ``x`` (first-layer op; see module docstring).
    """
    dtype = jnp.dtype(gemm_dtype)
    sdt = jnp.dtype(sel_dtype)

    if impl == "xla":
        fwd_core = functools.partial(_xla_fwd_core, pool=pool, dtype=dtype)
    elif impl == "pallas":
        from .pallas_conv_train import pallas_fwd_core, pallas_bwd_core
        fwd_core = functools.partial(
            pallas_fwd_core, pool=pool, gemm_dtype=dtype, sel_dtype=sdt,
            interpret=interpret,
        )
    else:
        raise ValueError(impl)

    def primal(x, w, b, gamma, beta):
        N = x.shape[0] * x.shape[1]
        sgn = jnp.where(gamma >= 0, 1.0, -1.0).astype(jnp.float32)
        a_sel, sum_a, sumsq_a, _cnt = fwd_core(x, w, b, sgn)
        mu = sum_a / N
        var = jnp.maximum(sumsq_a / N - mu * mu, 0.0)
        r = jax.lax.rsqrt(var + eps)
        pooled = (a_sel.astype(jnp.float32) - mu) * (gamma * r) + beta
        return pooled, mu, var

    @jax.custom_vjp
    def fused(x, w, b, gamma, beta):
        return primal(x, w, b, gamma, beta)

    def fwd(x, w, b, gamma, beta):
        N = x.shape[0] * x.shape[1]
        sgn = jnp.where(gamma >= 0, 1.0, -1.0).astype(jnp.float32)
        a_sel, sum_a, sumsq_a, _cnt = fwd_core(x, w, b, sgn)
        mu = sum_a / N
        var = jnp.maximum(sumsq_a / N - mu * mu, 0.0)
        r = jax.lax.rsqrt(var + eps)
        pooled = (a_sel.astype(jnp.float32) - mu) * (gamma * r) + beta
        res = (x, w, b, gamma, sgn, a_sel, mu, var)
        return (pooled, mu, var), res

    def bwd(res, cots):
        g, g_mu, g_var = cots
        x, w, b, gamma, sgn, a_sel, mu, var = res
        N = x.shape[0] * x.shape[1]
        r = jax.lax.rsqrt(var + eps)
        m = gamma * r
        ahat_sel = (a_sel.astype(jnp.float32) - mu) * r
        S1 = jnp.sum(g, axis=(0, 1))
        S2 = jnp.sum(g * ahat_sel, axis=(0, 1))
        dbeta = S1
        dgamma = S2
        # dL/da = c0·g_routed + c1 + c2·a over the full-rate grid, where the
        # dense constants fold the BN mean/var backward plus the (normally
        # zero) cotangents of the mu/var outputs.
        c0 = m
        c1 = -m * S1 / N + m * r * mu * S2 / N + g_mu / N - 2.0 * mu * g_var / N
        c2 = -m * r * S2 / N + 2.0 * g_var / N
        # db = Σ dz comes from the same core that routes dW, so the bias
        # gradient shares the weight gradient's f32 activation gate exactly
        # (round-2 advisor: the old pool-rate identity re-derived the gate
        # from sel_dtype-rounded a_sel — ulp-inconsistent under bf16).
        if impl == "xla":
            dw, db = _xla_bwd_core(
                x, w, b, sgn, g, c0, c1, c2, pool, dtype
            )
        else:
            from .pallas_conv_train import pallas_bwd_core
            dw, db = pallas_bwd_core(
                x, w, b, sgn, g, c0, c1, c2, pool=pool,
                gemm_dtype=dtype, interpret=interpret,
            )
        dx = jnp.zeros_like(x)  # first-layer op: input grad undefined by design
        return dx, dw.astype(w.dtype), db, dgamma, dbeta

    fused.defvjp(fwd, bwd)
    return fused
