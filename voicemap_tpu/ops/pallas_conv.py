"""Pallas fused conv-block kernel for the encoder's first block.

Block 0 (Cin=1, kernel 32, pool 4) dominates the encoder's HBM traffic: the
XLA emitter writes the full-rate (B, T, 128) activation and re-reads it for
the max-pool (6.3 GB each way at B=2048). This kernel keeps the full-rate
activation in VMEM: per batch row and time chunk it

1. builds the pooled-frame matrix Fᵀ (win, T_CH) from a phase-split input
   view — ``win`` lane-rolls + aligned slices (strided slices do not lower
   on this Mosaic; rolls do);
2. transposes to F (T_CH, win) in VMEM and runs ONE MXU matmul against the
   phase-stacked weights (win, pool·C) — the pooled-GEMM formulation whose
   semantics are property-tested in ``models/fused_encoder.py``;
3. applies bias → relu → BN inference affine → max over the ``pool`` static
   lane blocks, writing only the pool-rate (B, T/pool, C) output.

Input is passed phase-split as ``x4t (B, pool, T/pool + pad)`` — prepared
once per batch by XLA (4 strided slices; cheap) — so all in-kernel indexing
is aligned. Cin=1 only (the first block); later blocks have Cin ≥ 128 where
XLA's conv emitter is already compute-bound.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def mxu_precision(dtype):
    """Explicit contraction precision for in-kernel GEMMs.

    The global ``jax_default_matmul_precision`` flag (the on-chip test
    conftest pins it to ``highest`` for f32 parity) lowers to
    ``tpu.matmul contract_precision<fp32>``, which Mosaic REJECTS for
    sub-f32 operands ("Bad lhs type" — found by the round-5 on-chip suite).
    bf16/int8 kernel GEMMs always take one native MXU pass, so DEFAULT is
    exact for them and identical to production behavior; f32 operands
    return None to keep the ambient flag so parity pins still apply.
    """
    return None if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def phase_split(x: jnp.ndarray, pool: int, reach: int, t_out_pad: int) -> jnp.ndarray:
    """(B, T) waveform → (B, pool, t_out_pad + Q) phase-split view, SAME-padded.

    ``x4t[b, r, p] = x_padded[b, pool*p + r]`` with ``reach//2`` left padding;
    Q extra columns cover the window taps of the last (padded) position.
    """
    B, T = x.shape
    pad_l = reach // 2
    q_max = reach // pool + 2
    need = pool * (t_out_pad + q_max)
    xp = jnp.pad(x, ((0, 0), (pad_l, need - T - pad_l)))
    return xp.reshape(B, t_out_pad + q_max, pool).transpose(0, 2, 1)


def stacked_weights(
    w: jnp.ndarray, pool: int
) -> Tuple[jnp.ndarray, int, int]:
    """w (k, 1, C) → W4 (rows_pad, pool·C) keyed by Fᵀ's (q, r) row order.

    F[p, pool*q + r] = x_padded[pool*(p+q) + r]  (sample m = pool*q + r of the
    window starting at pool*p). W4[pool*q + r, j*C + c] = w[m − j, c].
    Returns (W4, win_rows, rows_pad) with rows_pad sublane-aligned.
    """
    k, cin, c = w.shape
    assert cin == 1, "block-0 kernel is Cin=1 only"
    reach = k - 1
    win = reach + pool
    # Scratch must cover every full pool-group of window taps (n_q groups of
    # `pool` rows) — sizing by win alone silently drops taps when
    # pool*ceil(win/pool) > ceil8(win) (e.g. pool=16, k=2).
    n_q = -(-win // pool)
    rows_pad = _ceil_to(max(win, pool * n_q), 8)
    wf = w[:, 0, :].astype(jnp.float32)
    w4 = jnp.zeros((rows_pad, pool * c), jnp.float32)
    for m in range(win):
        for j in range(pool):
            i = m - j
            if 0 <= i < k:
                w4 = w4.at[m, j * c : (j + 1) * c].set(wf[i])
    return w4, win, rows_pad


def _kernel(
    x4t_ref,  # (b_blk, pool, Lq) f32
    w4_ref,  # (rows_pad, pool*C) f32
    aff_ref,  # (3|4, pool*C) f32: [bias, bn_mul, bn_add, 1/requant_scale]
    o_ref,  # (b_blk, t_out_pad, C) bf16 — or int8 when requant
    fst_ref,  # scratch (rows_pad, T_CH) f32 — Fᵀ
    *,
    b_blk: int,
    pool: int,
    win: int,
    rows_pad: int,
    t_out_pad: int,
    t_ch: int,
    c: int,
    gemm_dtype,
    requant: bool = False,
    contract: str = "vpu_t",
    zero_pad_tail_from: int | None = None,  # t_out: zero rows ≥ t_out
):
    n_q = win // pool + (1 if win % pool else 0)
    # Zero Fᵀ once: rows ≥ win are never written and would otherwise hold
    # uninitialized values — NaN×0 = NaN through the matmul.
    fst_ref[:] = jnp.zeros((rows_pad, t_ch), fst_ref.dtype)
    bias = aff_ref[0, :]
    mul = aff_ref[1, :]
    add = aff_ref[2, :]

    # Hoist the lane rolls: one roll per window tap q over ALL rows/phases
    # (merged leading dims), instead of one per (row, chunk, q). Lane offsets
    # base+q are not 128-aligned for q>0; roll(L−q) ≡ roll(−q) (pltpu.roll
    # rejects negative shifts) makes every later slice aligned.
    Lq = x4t_ref.shape[2]
    # Rolls only lower for 32-bit data: roll in f32, cast at extraction.
    xall = x4t_ref[:].reshape(b_blk * pool, Lq)
    rolled = [xall] + [
        pltpu.roll(xall, Lq - q, 1) for q in range(1, n_q)
    ]

    for row in range(b_blk):
        for ch in range(t_out_pad // t_ch):
            base = ch * t_ch
            for q in range(n_q):
                fst_ref[pl.ds(pool * q, pool), :] = rolled[q][
                    row * pool : (row + 1) * pool, base : base + t_ch
                ].astype(gemm_dtype)
            # bf16 operands (production): one MXU pass instead of the 3+
            # passes an f32 matmul costs on v5e; accumulation stays f32.
            if contract == "dotg":
                # Contract Fᵀ's sublane dim directly — Mosaic's matmul can
                # stream a dim-0-contracting lhs without the explicit
                # VPU transpose the "vpu_t" path pays.
                y = jax.lax.dot_general(
                    fst_ref[:], w4_ref[:].astype(gemm_dtype),
                    (((0,), (0,)), ((), ())),
                    precision=mxu_precision(gemm_dtype),
                    preferred_element_type=jnp.float32,
                )  # (t_ch, pool*C)
            else:
                f = fst_ref[:].T  # (t_ch, rows_pad) — in-VMEM transpose
                y = jnp.dot(
                    f, w4_ref[:].astype(gemm_dtype),
                    precision=mxu_precision(gemm_dtype),
                    preferred_element_type=jnp.float32,
                )  # (t_ch, pool*C)
            y = jax.nn.relu(y + bias[None, :]) * mul[None, :] + add[None, :]
            out = y[:, :c]
            for j in range(1, pool):
                out = jnp.maximum(out, y[:, j * c : (j + 1) * c])
            if requant:
                # int8 requantize epilogue (the serving path's s0 fold):
                # emit round(h/s0) clamped to int8 straight from the f32
                # pooled value in VMEM — block 0 is HBM-bound, so writing
                # int8 instead of bf16 halves its output traffic AND
                # deletes quant_embed's separate full-rate requant pass.
                out = jnp.clip(jnp.round(out * aff_ref[3:4, :c]), -127, 127)
            if (zero_pad_tail_from is not None
                    and base + t_ch > zero_pad_tail_from):
                # Padded-activation contract (ops/pallas_quant_block): rows
                # ≥ t_out are exact zeros so the downstream fused int8
                # chain can run SAME convs on the padded array unsliced.
                idx = jax.lax.broadcasted_iota(jnp.int32, (t_ch, c), 0)
                out = jnp.where(idx < (zero_pad_tail_from - base), out,
                                jnp.zeros_like(out))
            o_ref[row, base : base + t_ch, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("pool", "block_rows", "t_chunk", "interpret", "out_dtype",
                     "gemm_dtype", "contract", "keep_pad"),
)
def pallas_conv_block0(
    x: jnp.ndarray,  # (B, T, 1) or (B, T) float32 waveform (post-preprocess)
    w: jnp.ndarray,  # (k, 1, C) conv kernel
    b: jnp.ndarray,  # (C,)
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    bn_eps: float = 1e-3,
    pool: int = 4,
    block_rows: int = 8,
    t_chunk: int = 1024,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    gemm_dtype=jnp.bfloat16,
    requant_scale: jnp.ndarray | None = None,  # (C,) f32 → int8 output
    contract: str = "vpu_t",  # "vpu_t" | "dotg" — see _kernel
    keep_pad: bool = False,  # return (B, t_out_pad, C) with ZERO pad rows
) -> jnp.ndarray:
    """Fused conv(SAME)+relu+BN(inference)+maxpool → (B, T//pool, C).

    With ``requant_scale`` (the int8 serving path's per-channel s0,
    models/quant_infer.py), the epilogue also emits
    ``clip(round(h / s0), ±127)`` as int8 — requantizing from the f32
    pooled value in VMEM instead of a separate full-rate XLA pass over a
    bf16 intermediate, and ``out_dtype`` is forced to int8.

    ``keep_pad`` returns the full chunk-padded (B, t_out_pad, C) array
    with rows ≥ T//pool zeroed in-kernel — the activation contract of the
    fused int8 chain (ops/pallas_quant_block), avoiding any XLA slice
    between blocks.
    """
    if x.ndim == 3:
        x = x[..., 0]
    B, T = x.shape
    k, _cin, c = w.shape
    if T % pool:
        raise ValueError("T must divide by pool")
    t_out = T // pool
    t_out_pad = _ceil_to(t_out, t_chunk)
    while block_rows > 1 and B % block_rows:
        block_rows //= 2
    reach = k - 1
    x4t = phase_split(x.astype(jnp.float32), pool, reach, t_out_pad)
    w4, win, rows_pad = stacked_weights(w, pool)
    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + bn_eps) * bn_scale
    rows = [
        jnp.tile(b.astype(jnp.float32), pool),
        jnp.tile(inv.astype(jnp.float32), pool),
        jnp.tile((bn_bias - bn_mean * inv).astype(jnp.float32), pool),
    ]
    requant = requant_scale is not None
    if requant:
        out_dtype = jnp.int8
        rows.append(
            jnp.tile(1.0 / requant_scale.astype(jnp.float32), pool)
        )
    aff = jnp.stack(rows)
    Lq = x4t.shape[2]
    kernel = functools.partial(
        _kernel,
        b_blk=block_rows,
        pool=pool,
        win=win,
        rows_pad=rows_pad,
        t_out_pad=t_out_pad,
        t_ch=t_chunk,
        c=c,
        gemm_dtype=gemm_dtype,
        requant=requant,
        contract=contract,
        zero_pad_tail_from=(t_out if keep_pad else None),
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, pool, Lq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w4.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aff.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, t_out_pad, c), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_out_pad, c), out_dtype),
        scratch_shapes=[pltpu.VMEM((rows_pad, t_chunk), gemm_dtype)],
        interpret=interpret,
    )(x4t, w4, aff)
    return out if keep_pad else out[:, :t_out, :]


# ---------------------------------------------------------------------------
# Later blocks: Cin = C (≥128), odd kernel k, pool 2 — the pair-merge trick
# ---------------------------------------------------------------------------

def stacked_weights_chan(w: jnp.ndarray, pool: int) -> jnp.ndarray:
    """w (k, Cin, C') → W4 (win·Cin, pool·C'), W4[m·Cin+ci, j·C'+c'] = w[m−j]."""
    k, cin, cout = w.shape
    win = (k - 1) + pool
    wf = w.astype(jnp.float32)
    w4 = jnp.zeros((win * cin, pool * cout), jnp.float32)
    for m in range(win):
        for j in range(pool):
            i = m - j
            if 0 <= i < k:
                w4 = w4.at[m * cin : (m + 1) * cin,
                           j * cout : (j + 1) * cout].set(wf[i])
    return w4


def _kernel_chan(
    in2_ref,  # (1, P2, 2C) f32 — pair-merged, SAME-padded input (one row)
    w4_ref,  # (win*C, pool*C') f32
    aff_ref,  # (3, pool*C') f32
    o_ref,  # (1, t_out_pad, C') out_dtype
    f_ref,  # scratch (t_ch, n_slices*2C) gemm_dtype — the frame matrix
    *,
    pool: int,
    n_slices: int,  # win // 2 pair-merged slices
    t_out_pad: int,
    t_ch: int,
    c_out: int,
    gemm_dtype,
):
    bias = aff_ref[0, :]
    mul = aff_ref[1, :]
    add = aff_ref[2, :]
    in2 = in2_ref[0].astype(gemm_dtype)  # (P2, 2C)
    c2 = in2.shape[1]
    for ch in range(t_out_pad // t_ch):
        base = ch * t_ch
        # F (t_ch, win·C): sublane-shifted slices written at 128-aligned lane
        # offsets through a scratch ref — a value-level concat cannot mix
        # sublane offsets ("offset mismatch on non-concat dimension").
        for s in range(n_slices):
            f_ref[:, s * c2 : (s + 1) * c2] = in2[base + s : base + s + t_ch, :]
        y = jnp.dot(f_ref[:], w4_ref[:].astype(gemm_dtype),
                    precision=mxu_precision(gemm_dtype),
                    preferred_element_type=jnp.float32)
        y = jax.nn.relu(y + bias[None, :]) * mul[None, :] + add[None, :]
        out = y[:, :c_out]
        for j in range(1, pool):
            out = jnp.maximum(out, y[:, j * c_out : (j + 1) * c_out])
        o_ref[0, base : base + t_ch, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("pool", "t_chunk", "interpret", "out_dtype", "gemm_dtype"),
)
def pallas_conv_blockn(
    x: jnp.ndarray,  # (B, T, C) activations, T even
    w: jnp.ndarray,  # (k, C, C') conv kernel, k odd
    b: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    bn_eps: float = 1e-3,
    pool: int = 2,
    t_chunk: int = 256,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    gemm_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused conv(SAME,k odd)+relu+BN(inference)+maxpool(2) for Cin≥1 blocks.

    The pooled-frame matrix comes from the pair-merged view
    ``in2 = pad(x).reshape(T/2+…, 2C)`` — each pooled position's window of
    ``k+1`` input rows is exactly ``win/2`` consecutive in2 rows, so framing
    is ``win/2`` sublane-shifted slices written at 128-aligned lane offsets
    (all probed-supported Mosaic ops). One MXU matmul per chunk against the
    phase-stacked weights; only the pool-rate activation leaves VMEM.
    """
    if pool != 2:
        raise ValueError("pair-merge kernel supports pool=2")
    B, T, c_in = x.shape
    k, _ci, c_out = w.shape
    if k % 2 == 0:
        raise ValueError("kernel size must be odd for this path")
    if T % 2:
        raise ValueError("T must be even")
    t_out = T // pool
    t_out_pad = _ceil_to(t_out, t_chunk)
    win = (k - 1) + pool
    n_slices = win // 2
    pad_l = (k - 1) // 2
    # in_padded[i] = x[i - pad_l]; length covers the last chunk's window.
    total = 2 * (t_out_pad + n_slices)
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad_l, total - T - pad_l), (0, 0)))
    in2 = xp.reshape(B, total // 2, 2 * c_in)
    w4 = stacked_weights_chan(w, pool)
    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + bn_eps) * bn_scale
    aff = jnp.stack(
        [
            jnp.tile(b.astype(jnp.float32), pool),
            jnp.tile(inv.astype(jnp.float32), pool),
            jnp.tile((bn_bias - bn_mean * inv).astype(jnp.float32), pool),
        ]
    )
    kernel = functools.partial(
        _kernel_chan,
        pool=pool,
        n_slices=n_slices,
        t_out_pad=t_out_pad,
        t_ch=t_chunk,
        c_out=c_out,
        gemm_dtype=gemm_dtype,
    )
    P2 = in2.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P2, 2 * c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w4.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aff.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_out_pad, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_out_pad, c_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((t_chunk, n_slices * 2 * c_in), gemm_dtype)
        ],
        interpret=interpret,
    )(in2, w4, aff)
    return out[:, :t_out, :]


# ---------------------------------------------------------------------------
# Streamed rebuild of the pair-merge kernel: input stays in HBM, double-
# buffered row windows per chunk (the per-row-grid form above DMAs the whole
# (P2, 2C) row per grid step and loses to XLA — CLAUDE.md round-1 bench).
# ---------------------------------------------------------------------------

WIN_SLACK = 16  # window rows beyond t_chunk: covers n_slices and keeps the
#                 next DMA start sublane-aligned for bf16 (tile 16) and f32 (8)


def _kernel_chan_streamed(
    in2_ref,  # (B, P2, 2C) in HBM (pl.ANY) — pair-merged, SAME-padded input
    w4_ref,  # (win*C, pool*C') gemm_dtype, VMEM
    aff_ref,  # (8, pool*C') f32: [0]=bias, [1]=bn_mul, [2]=bn_add (tiled)
    o_ref,  # out block (1, t_ch, C')
    win0_ref,  # scratch (b_blk, t_win, 2C) in2.dtype — double-buffer slot 0
    win1_ref,  # slot 1 (two named refs: a dynamic slot index would be a
    #            value-level dynamic slice, which does not lower)
    f_ref,  # scratch (t_ch, n_slices*2C) gemm_dtype — frame matrix
    sems,  # (2,) DMA semaphores
    *,
    n_b: int,
    n_ch: int,
    b_blk: int,
    pool: int,
    n_slices: int,
    t_ch: int,
    t_win: int,
    c_out: int,
    gemm_dtype,
):
    b = pl.program_id(0)
    ch = pl.program_id(1)
    i = b * n_ch + ch
    total = n_b * n_ch

    def dma(buf_ref, slot, bb, cc):
        base = pl.multiple_of(cc * t_ch, WIN_SLACK)
        return pltpu.make_async_copy(
            in2_ref.at[pl.ds(bb * b_blk, b_blk), pl.ds(base, t_win)],
            buf_ref, sems.at[slot],
        )

    @pl.when(i == 0)
    def _prologue():
        dma(win0_ref, 0, b, ch).start()

    nxt = jnp.minimum(i + 1, total - 1)
    nb, nc = nxt // n_ch, nxt % n_ch

    @pl.when((i + 1 < total) & (i % 2 == 0))
    def _prefetch1():
        dma(win1_ref, 1, nb, nc).start()

    @pl.when((i + 1 < total) & (i % 2 == 1))
    def _prefetch0():
        dma(win0_ref, 0, nb, nc).start()

    def compute(buf_ref, slot):
        dma(buf_ref, slot, b, ch).wait()
        for r in range(b_blk):
            win = buf_ref[r]
            c2 = win.shape[1]
            for s in range(n_slices):
                f_ref[:, s * c2 : (s + 1) * c2] = win[s : s + t_ch].astype(
                    gemm_dtype
                )
            y = jnp.dot(f_ref[:], w4_ref[:],
                        precision=mxu_precision(gemm_dtype),
                        preferred_element_type=jnp.float32)
            y = (jax.nn.relu(y + aff_ref[0:1, :]) * aff_ref[1:2, :]
                 + aff_ref[2:3, :])
            out = y[:, :c_out]
            for j in range(1, pool):
                out = jnp.maximum(out, y[:, j * c_out : (j + 1) * c_out])
            o_ref[r] = out.astype(o_ref.dtype)

    @pl.when(i % 2 == 0)
    def _even():
        compute(win0_ref, 0)

    @pl.when(i % 2 == 1)
    def _odd():
        compute(win1_ref, 1)


@functools.partial(
    jax.jit,
    static_argnames=("pool", "t_chunk", "block_rows", "interpret", "out_dtype",
                     "gemm_dtype"),
)
def pallas_conv_blockn_streamed(
    x: jnp.ndarray,  # (B, T, C) activations, T even
    w: jnp.ndarray,  # (k, C, C') conv kernel, k odd
    b: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    bn_eps: float = 1e-3,
    pool: int = 2,
    t_chunk: int = 1536,
    block_rows: int = 4,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
    gemm_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Streamed fused conv(SAME,k odd)+relu+BN(inference)+maxpool(2).

    Same math as ``pallas_conv_blockn`` (pair-merged pooled GEMM), but the
    input never enters a VMEM input block: each (batch-row, chunk) grid step
    DMAs a ``t_chunk+slack`` row window from HBM, double-buffered so the
    next window loads while the current chunk runs its MXU matmul. Keeps
    the input in its native dtype (bf16 halves the stream) and pre-casts
    the stacked weights to the GEMM dtype.

    Relu is applied before the BN affine here, so the affine is folded as
    ``relu(conv+bias)·mul + add`` — matching the reference block order
    (conv→relu→BN→pool, voicemap/models.py :: encoder, SURVEY.md §3.5).
    """
    if pool != 2:
        raise ValueError("pair-merge kernel supports pool=2")
    B, T, c_in = x.shape
    k, _ci, c_out = w.shape
    if k % 2 == 0:
        raise ValueError("kernel size must be odd for this path")
    if T % 2:
        raise ValueError("T must be even")
    t_out = T // pool
    # Chunk starts index the sublane dim at cc * t_ch, promised to Mosaic as
    # a multiple of WIN_SLACK in the kernel's DMA — so t_ch itself must be a
    # WIN_SLACK multiple or the hint is a lie (misaligned DMA on hardware).
    t_ch = _ceil_to(min(t_chunk, _ceil_to(t_out, WIN_SLACK)), WIN_SLACK)
    t_out_pad = _ceil_to(t_out, t_ch)
    win = (k - 1) + pool
    n_slices = win // 2
    pad_l = (k - 1) // 2
    # Pair rows available must reach the last window: t_out_pad + slack.
    total = 2 * (t_out_pad + WIN_SLACK)
    xp = jnp.pad(x, ((0, 0), (pad_l, total - T - pad_l), (0, 0)))
    in2 = xp.reshape(B, total // 2, 2 * c_in)
    w4 = stacked_weights_chan(w, pool).astype(gemm_dtype)
    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + bn_eps) * bn_scale
    aff = jnp.zeros((8, pool * c_out), jnp.float32)
    aff = aff.at[0].set(jnp.tile(b.astype(jnp.float32), pool))
    aff = aff.at[1].set(jnp.tile(inv.astype(jnp.float32), pool))
    aff = aff.at[2].set(
        jnp.tile((bn_bias - bn_mean * inv).astype(jnp.float32), pool)
    )
    n_ch = t_out_pad // t_ch
    t_win = t_ch + WIN_SLACK
    while block_rows > 1 and B % block_rows:
        block_rows //= 2
    n_b = B // block_rows
    kernel = functools.partial(
        _kernel_chan_streamed,
        n_b=n_b, n_ch=n_ch, b_blk=block_rows, pool=pool, n_slices=n_slices,
        t_ch=t_ch, t_win=t_win, c_out=c_out, gemm_dtype=jnp.dtype(gemm_dtype),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_b, n_ch),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(w4.shape, lambda bb, cc: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(aff.shape, lambda bb, cc: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, t_ch, c_out), lambda bb, cc: (bb, cc, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_out_pad, c_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows, t_win, 2 * c_in), x.dtype),
            pltpu.VMEM((block_rows, t_win, 2 * c_in), x.dtype),
            pltpu.VMEM((t_ch, n_slices * 2 * c_in), jnp.dtype(gemm_dtype)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(in2, w4, aff)
    return out[:, :t_out, :]
