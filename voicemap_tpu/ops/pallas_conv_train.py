"""Mosaic kernels backing the fused block-0 TRAINING op (ops/conv_train.py).

Two kernels over the same pooled-GEMM framing as the inference kernel
(ops/pallas_conv.py — phase-split input, lane-rolled window taps, one MXU
matmul per chunk):

Forward core
    emits the pool-selected activation ``a_sel`` (what the max-pool will
    pick once the BN affine is applied — ``sign(γ)``-directed max) plus the
    per-channel batch statistics ``(Σa, Σa², #(a>0))`` accumulated across
    the grid into a constant-index output block (TPU grids are sequential,
    so read-modify-write accumulation across steps is sound).

Backward core
    recomputes the full-rate activation chunk-wise (one GEMM) AND its
    sign-directed max — self-consistent routing, no dependence on forward
    bit patterns — routes the pooled cotangent to the first maximal phase
    (matching XLA's reduce_window max-gradient tie-break), forms
    ``dz = 1[a>0]·(c0·g_routed + c1 + c2·a)`` in VMEM, and accumulates the
    stacked weight gradient ``dW4 += Fᵀ·dz`` (second GEMM) plus ``Σ dz``
    (the bias gradient, f32, same routing/gating as dW — self-consistent by
    construction). Only ``dW4`` — (win_rows, pool·C) — and the (8, pool·C)
    stats row ever reach HBM; the host-side wrapper un-stacks dW4 to the
    conv kernel layout and folds the stats row to ``db (C,)``.

The full-rate activation never leaves VMEM in either direction; per-step
HBM traffic is the phase-split input + the two pool-rate tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv import _ceil_to, mxu_precision, phase_split, stacked_weights

LANE = 128


def _build_rolled(x4t_ref, b_blk, pool, n_q):
    """Hoisted lane rolls of the phase-split input (see pallas_conv)."""
    Lq = x4t_ref.shape[2]
    xall = x4t_ref[:].reshape(b_blk * pool, Lq)
    return [xall] + [pltpu.roll(xall, Lq - q, 1) for q in range(1, n_q)]


def _fill_frames(fst_ref, rolled, row, base, t_ch, pool, n_q, dtype):
    for q in range(n_q):
        fst_ref[pl.ds(pool * q, pool), :] = rolled[q][
            row * pool : (row + 1) * pool, base : base + t_ch
        ].astype(dtype)


def _fwd_kernel(
    x4t_ref,  # (b_blk, pool, Lq) f32
    w4_ref,  # (rows_pad, pool*C) gemm-ready f32
    aff_ref,  # (8, pool*C) f32: [0]=bias tiled, [1]=sgn tiled
    affc_ref,  # (8, C) f32: [1]=sgn — full-row reads only (sliced (1,C)
    #            vectors carry offset layouts Mosaic can't broadcast)
    sel_ref,  # out (b_blk, t_out_pad, C) sel_dtype
    acc_ref,  # out (8, pool*C) f32: [0]=Σa, [1]=Σa², [2]=#(a>0)
    fst_ref,  # scratch (rows_pad, t_ch) gemm_dtype
    *,
    b_blk: int,
    pool: int,
    win: int,
    rows_pad: int,
    t_out: int,
    t_out_pad: int,
    t_ch: int,
    c: int,
    gemm_dtype,
):
    i = pl.program_id(0)
    n_q = win // pool + (1 if win % pool else 0)
    fst_ref[:] = jnp.zeros((rows_pad, t_ch), fst_ref.dtype)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bias = aff_ref[0:1, :]  # keep rows 2-D: 1-D lane slices mis-lower
    sgn = aff_ref[1:2, :]
    sgn_c = affc_ref[1:2, :]
    rolled = _build_rolled(x4t_ref, b_blk, pool, n_q)

    sum_a = jnp.zeros((1, pool * c), jnp.float32)
    sumsq_a = jnp.zeros((1, pool * c), jnp.float32)
    cnt = jnp.zeros((1, pool * c), jnp.float32)
    for row in range(b_blk):
        for ch in range(t_out_pad // t_ch):
            base = ch * t_ch
            _fill_frames(fst_ref, rolled, row, base, t_ch, pool, n_q, gemm_dtype)
            f = fst_ref[:].T  # (t_ch, rows_pad)
            a = jax.nn.relu(
                jnp.dot(f, w4_ref[:].astype(gemm_dtype),
                        precision=mxu_precision(gemm_dtype),
                        preferred_element_type=jnp.float32)
                + bias
            )  # (t_ch, pool*C) full-rate relu activation, VMEM-only
            # Stats over true positions only (rows ≥ t_out are SAME-padding).
            pos = jax.lax.broadcasted_iota(jnp.int32, (t_ch, pool * c), 0)
            valid = (pos + base) < t_out
            am = jnp.where(valid, a, 0.0)
            sum_a += jnp.sum(am, axis=0, keepdims=True)
            sumsq_a += jnp.sum(am * am, axis=0, keepdims=True)
            cnt += jnp.sum(jnp.where(valid & (a > 0), 1.0, 0.0), axis=0,
                           keepdims=True)
            # sign-directed max over the pool phases ⇒ the value BN+pool picks.
            sa = a * sgn  # (t_ch, pool*C), sgn broadcast from (1, pool*C)
            best = sa[:, :c]
            for j in range(1, pool):
                best = jnp.maximum(best, sa[:, j * c : (j + 1) * c])
            sel = best * sgn_c
            sel_ref[row, base : base + t_ch, :] = sel.astype(sel_ref.dtype)
    acc_ref[0:1, :] += sum_a
    acc_ref[1:2, :] += sumsq_a
    acc_ref[2:3, :] += cnt


def _bwd_kernel(
    x4t_ref,  # (b_blk, pool, Lq) f32
    w4_ref,  # (rows_pad, pool*C) f32
    aff_ref,  # (8, pool*C) f32: [0]=bias, [1]=sgn (tiled)
    affc_ref,  # (8, C) f32: [2]=c0, [3]=c1, [4]=c2 — full-row reads only
    g_ref,  # (b_blk, t_out_pad, C) — pooled cotangent, zero-padded
    dw4_ref,  # out (rows_pad, pool*C) f32 accumulator
    dstats_ref,  # out (8, pool*C) f32: [0] = Σ dz (→ db), f32-accumulated
    fst_ref,  # scratch (rows_pad, t_ch) gemm_dtype
    dz_ref,  # scratch (t_ch, pool*C) gemm_dtype
    *,
    b_blk: int,
    pool: int,
    win: int,
    rows_pad: int,
    t_out: int,
    t_out_pad: int,
    t_ch: int,
    c: int,
    gemm_dtype,
):
    i = pl.program_id(0)
    n_q = win // pool + (1 if win % pool else 0)
    fst_ref[:] = jnp.zeros((rows_pad, t_ch), fst_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dw4_ref[:] = jnp.zeros_like(dw4_ref)
        dstats_ref[:] = jnp.zeros_like(dstats_ref)

    bias = aff_ref[0:1, :]  # keep rows 2-D: 1-D lane slices mis-lower
    sgn = aff_ref[1:2, :]
    c0 = affc_ref[2:3, :]  # (1, C): identical across pool phases
    c1 = affc_ref[3:4, :]
    c2 = affc_ref[4:5, :]
    rolled = _build_rolled(x4t_ref, b_blk, pool, n_q)

    acc = jnp.zeros((rows_pad, pool * c), jnp.float32)
    sum_dz = [jnp.zeros((1, c), jnp.float32) for _ in range(pool)]
    for row in range(b_blk):
        for ch in range(t_out_pad // t_ch):
            base = ch * t_ch
            _fill_frames(fst_ref, rolled, row, base, t_ch, pool, n_q, gemm_dtype)
            f = fst_ref[:].T
            a = jax.nn.relu(
                jnp.dot(f, w4_ref[:].astype(gemm_dtype),
                        precision=mxu_precision(gemm_dtype),
                        preferred_element_type=jnp.float32)
                + bias
            )  # (t_ch, pool*C)
            g = g_ref[row, base : base + t_ch, :].astype(jnp.float32)
            pos = jax.lax.broadcasted_iota(jnp.int32, (t_ch, c), 0)
            valid = (pos + base) < t_out
            # Recompute the pool's selection (sign-directed max) from the
            # SAME in-VMEM activation — self-consistent routing, no
            # dependence on forward-pass bit patterns.
            sa = a * sgn  # (t_ch, pool*C)
            best = sa[:, :c]
            for j in range(1, pool):
                best = jnp.maximum(best, sa[:, j * c : (j + 1) * c])
            taken = jnp.zeros((t_ch, c), bool)
            for j in range(pool):
                a_j = a[:, j * c : (j + 1) * c]
                eq = (sa[:, j * c : (j + 1) * c] == best) & ~taken
                taken = taken | eq
                g_j = jnp.where(eq, g, 0.0)
                da_j = c0 * g_j + c1 + c2 * a_j
                dz_j = jnp.where((a_j > 0) & valid, da_j, 0.0)
                dz_ref[:, j * c : (j + 1) * c] = dz_j.astype(gemm_dtype)
                # Σ dz (→ db) in f32 BEFORE the gemm-dtype cast, over the
                # exact routing used for dW — keeps the bias gradient
                # self-consistent with the weight gradient (round-2 advisor
                # finding: the old pool-rate identity gated on bf16-rounded
                # a_sel, disagreeing with the f32 gate used here).
                sum_dz[j] = sum_dz[j] + jnp.sum(dz_j, axis=0, keepdims=True)
            # dW4 += Fᵀ·dz: fst is already (rows_pad, t_ch) = Fᵀ.
            acc += jnp.dot(
                fst_ref[:], dz_ref[:],
                precision=mxu_precision(gemm_dtype),
                preferred_element_type=jnp.float32,
            )
    dw4_ref[:] += acc
    dstats_ref[0:1, :] += jnp.concatenate(sum_dz, axis=1)


def _prep(x, w, pool, t_chunk, block_rows):
    if x.ndim == 3:
        x = x[..., 0]
    B, T = x.shape
    k, cin, c = w.shape
    if cin != 1:
        raise ValueError("block-0 kernel is Cin=1 only")
    if T % pool:
        raise ValueError("T must divide by pool")
    t_out = T // pool
    t_ch = min(t_chunk, _ceil_to(t_out, 8))
    t_out_pad = _ceil_to(t_out, t_ch)
    while block_rows > 1 and B % block_rows:
        block_rows //= 2
    x4t = phase_split(x.astype(jnp.float32), pool, k - 1, t_out_pad)
    w4, win, rows_pad = stacked_weights(w, pool)
    return x, x4t, w4, win, rows_pad, t_out, t_out_pad, t_ch, block_rows, c


@functools.partial(
    jax.jit,
    static_argnames=("pool", "gemm_dtype", "sel_dtype", "t_chunk",
                     "block_rows", "interpret"),
)
def pallas_fwd_core(
    x: jnp.ndarray,  # (B, T, 1) f32
    w: jnp.ndarray,  # (k, 1, C)
    b: jnp.ndarray,  # (C,)
    sgn: jnp.ndarray,  # (C,) ±1 — sign of the BN scale
    pool: int = 4,
    gemm_dtype=jnp.float32,
    sel_dtype=jnp.float32,
    t_chunk: int = 1024,
    block_rows: int = 4,
    interpret: bool = False,
):
    """(a_sel (B, T/pool, C), Σa (C,), Σa² (C,), #(a>0) (C,))."""
    gdt = jnp.dtype(gemm_dtype)
    sdt = jnp.dtype(sel_dtype)
    (x, x4t, w4, win, rows_pad, t_out, t_out_pad, t_ch, b_blk, c) = _prep(
        x, w, pool, t_chunk, block_rows
    )
    B = x.shape[0]
    aff = jnp.zeros((8, pool * c), jnp.float32)
    aff = aff.at[0].set(jnp.tile(b.astype(jnp.float32), pool))
    aff = aff.at[1].set(jnp.tile(sgn.astype(jnp.float32), pool))
    affc = jnp.zeros((8, c), jnp.float32).at[1].set(sgn.astype(jnp.float32))
    Lq = x4t.shape[2]
    kernel = functools.partial(
        _fwd_kernel, b_blk=b_blk, pool=pool, win=win, rows_pad=rows_pad,
        t_out=t_out, t_out_pad=t_out_pad, t_ch=t_ch, c=c, gemm_dtype=gdt,
    )
    sel, acc = pl.pallas_call(
        kernel,
        grid=(B // b_blk,),
        in_specs=[
            pl.BlockSpec((b_blk, pool, Lq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w4.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aff.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(affc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_blk, t_out_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pool * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, t_out_pad, c), sdt),
            jax.ShapeDtypeStruct((8, pool * c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows_pad, t_ch), gdt)],
        interpret=interpret,
    )(x4t, w4, aff, affc)
    fold = lambda row: row.reshape(pool, c).sum(axis=0)
    return sel[:, :t_out, :], fold(acc[0]), fold(acc[1]), fold(acc[2])


@functools.partial(
    jax.jit,
    static_argnames=("pool", "gemm_dtype", "t_chunk",
                     "block_rows", "interpret"),
)
def pallas_bwd_core(
    x: jnp.ndarray,  # (B, T, 1) f32
    w: jnp.ndarray,  # (k, 1, C)
    b: jnp.ndarray,
    sgn: jnp.ndarray,  # (C,) ±1 — directs the in-kernel selection recompute
    g: jnp.ndarray,  # (B, T/pool, C) — pooled cotangent
    c0: jnp.ndarray,  # (C,) per-channel dL/da affine constants
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    pool: int = 4,
    gemm_dtype=jnp.float32,
    t_chunk: int = 1024,
    block_rows: int = 2,
    interpret: bool = False,
):
    """(dw (k, 1, C), db (C,)) — weight + bias grads, self-consistent routing."""
    gdt = jnp.dtype(gemm_dtype)
    (x, x4t, w4, win, rows_pad, t_out, t_out_pad, t_ch, b_blk, c) = _prep(
        x, w, pool, t_chunk, block_rows
    )
    B = x.shape[0]
    k = w.shape[0]
    pad_t = t_out_pad - t_out
    g_p = jnp.pad(g.astype(gdt), ((0, 0), (0, pad_t), (0, 0)))
    aff = jnp.zeros((8, pool * c), jnp.float32)
    aff = aff.at[0].set(jnp.tile(b.astype(jnp.float32), pool))
    aff = aff.at[1].set(jnp.tile(sgn.astype(jnp.float32), pool))
    affc = jnp.zeros((8, c), jnp.float32)
    affc = affc.at[2].set(c0.astype(jnp.float32))
    affc = affc.at[3].set(c1.astype(jnp.float32))
    affc = affc.at[4].set(c2.astype(jnp.float32))
    Lq = x4t.shape[2]
    kernel = functools.partial(
        _bwd_kernel, b_blk=b_blk, pool=pool, win=win, rows_pad=rows_pad,
        t_out=t_out, t_out_pad=t_out_pad, t_ch=t_ch, c=c, gemm_dtype=gdt,
    )
    dw4, dstats = pl.pallas_call(
        kernel,
        grid=(B // b_blk,),
        in_specs=[
            pl.BlockSpec((b_blk, pool, Lq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w4.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aff.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(affc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, t_out_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows_pad, pool * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pool * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, pool * c), jnp.float32),
            jax.ShapeDtypeStruct((8, pool * c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows_pad, t_ch), gdt),
            pltpu.VMEM((t_ch, pool * c), gdt),
        ],
        interpret=interpret,
    )(x4t, w4, aff, affc, g_p)
    db = dstats[0].reshape(pool, c).sum(axis=0)
    # Un-stack: dw[i, 0, c'] = Σ_{(m,j): m−j=i} dW4[m, j·C+c']  (the adjoint of
    # stacked_weights' scatter).
    dw4 = dw4.reshape(rows_pad, pool, c)
    dw = jnp.zeros((k, c), jnp.float32)
    for m in range(win):
        for j in range(pool):
            i = m - j
            if 0 <= i < k:
                dw = dw.at[i].add(dw4[m, j])
    return dw[:, None, :], db
