"""Mosaic pool/routing kernels for the blocks-1+ fused TRAIN op.

**STATUS: measured NEGATIVE result — NOT on the production path** (round
3; the same verdict as round 2's streamed blocks-1+ forward kernel).
In-context on the full train program these kernels lose to XLA's own
emission of the lane-view formulation: B=1024 per-prefix marginals are
+4.0 ms on block 1 / −0.7 / −1.5 ms on blocks 2/3 (net +2 ms), and at
B=2048 the pallas_call materialization boundaries (a_sel, g, dz can no
longer fuse into their producers/consumers) push the program to 17.73 GB
> 15.75 GB HBM — the batch size the fused path exists for. Production
uses ``routing='xla'``; these kernels stay as the documented experiment
(reachable via ``blockn='fused_pallas'``, benchmarked by
``benchmarks/bench_conv_bwd.py`` case ``route_plls``) because the
standalone routing pass still measures ~4× above its HBM bound and a
future design that fuses the conv epilogue INTO the kernel could revisit.

Reference behavior: the max-pool + BN(train) epilogue/backward of every
mid-network encoder block (``voicemap/models.py ::
get_baseline_convolutional_encoder`` — conv→relu→BN→pool, SURVEY.md §3.5).
The convolutions themselves stay with XLA (its conv emitters measure at
75–290 TFLOP/s on v5e — benchmarks/bench_conv_bwd.py).

Both kernels work on the LANE VIEW: ``(B, T, C)`` reshaped (free,
row-major) to ``(B, T/pool, pool·C)``, so each pool phase is a static
lane slice at a C-multiple. One grid step = one batch row = one DMA of
the whole ``(T/pool, pool·C)`` row (≤1.5 MB for the baseline blocks).

Forward kernel   a → (a_sel, Σa, Σa²)
    sign-directed max across phase slices (the value BN's monotone
    per-channel affine will make the pool pick) plus the per-channel
    batch-stat sums, accumulated across the sequential TPU grid into a
    constant-index f32 accumulator row (the block-0 kernel's pattern).

Backward kernel  (a, a_sel, g, c0, c1, c2) → (dz, Σdz)
    routes each pooled cotangent to the FIRST phase whose activation
    equals the stored selected value ``a_sel`` (exact: ``a_sel`` is a
    same-dtype copy of the selected phase, and value-ties ARE selection
    ties — first-match replicates XLA's reduce_window tie-break and the
    forward's strict-``>`` argmax), applies the BN-train affine fold
    ``dz = 1[a>0]·(c0·g + c1 + c2·a)`` in f32, and accumulates
    ``Σdz`` (the bias gradient) over the same gate — self-consistent
    with the dW GEMM that consumes ``dz``.

Eligibility: C must be a lane multiple (128) so phase slices lower; use
``routing_supported`` and fall back to the XLA lane-view path otherwise
(e.g. the dilated config's 192-channel block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROW_CHUNK = 256  # pool-rate rows per in-kernel slice: full-row f32
#                  temporaries would blow the ~16 MB scoped-VMEM stack


def routing_supported(c: int, dtype) -> bool:
    """Kernel eligibility: phase slices must sit on lane boundaries."""
    return c % LANE == 0 and jnp.dtype(dtype) in (
        jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32))


def _pool_fwd_kernel(al_ref, affc_ref, sel_ref, acc_ref, *, pool, c, tp, sdt):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sgn = affc_ref[0:1, :]  # (1, C) f32; keep rows 2-D (1-D slices mis-lower)
    sum_a = jnp.zeros((1, pool * c), jnp.float32)
    sumsq = jnp.zeros((1, pool * c), jnp.float32)
    for r0 in range(0, tp, ROW_CHUNK):
        rc = min(ROW_CHUNK, tp - r0)
        af = al_ref[0, r0:r0 + rc, :].astype(jnp.float32)  # (rc, pool*C)
        best = af[:, :c] * sgn
        for j in range(1, pool):
            best = jnp.maximum(best, af[:, j * c:(j + 1) * c] * sgn)
        sel_ref[0, r0:r0 + rc, :] = (best * sgn).astype(sdt)
        sum_a += jnp.sum(af, axis=0, keepdims=True)
        sumsq += jnp.sum(af * af, axis=0, keepdims=True)
    acc_ref[0:1, :] += sum_a
    acc_ref[1:2, :] += sumsq


@functools.partial(
    jax.jit, static_argnames=("pool", "sel_dtype", "interpret"))
def pallas_pool_fwd(
    a: jnp.ndarray,  # (B, T, C) — full-rate relu activation (T % pool == 0)
    sgn: jnp.ndarray,  # (C,) ±1 — sign of the BN scale
    pool: int,
    sel_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """→ (a_sel (B, T/pool, C), Σa (C,), Σa² (C,)) in one full-rate read."""
    B, T, c = a.shape
    tp = T // pool
    al = a.reshape(B, tp, pool * c)
    affc = jnp.zeros((8, c), jnp.float32).at[0].set(sgn.astype(jnp.float32))
    kernel = functools.partial(_pool_fwd_kernel, pool=pool, c=c, tp=tp,
                               sdt=jnp.dtype(sel_dtype))
    sel, acc = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, tp, pool * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(affc.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pool * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, tp, c), jnp.dtype(sel_dtype)),
            jax.ShapeDtypeStruct((8, pool * c), jnp.float32),
        ],
        interpret=interpret,
    )(al, affc)
    fold = lambda row: row.reshape(pool, c).sum(axis=0)
    return sel, fold(acc[0]), fold(acc[1])


def _route_bwd_kernel(al_ref, asel_ref, g_ref, affc_ref, dz_ref, acc_ref,
                      *, pool, c, out_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c0 = affc_ref[0:1, :]  # (1, C) f32
    c1 = affc_ref[1:2, :]
    c2 = affc_ref[2:3, :]
    tp = asel_ref.shape[1]
    sums = jnp.zeros((1, pool * c), jnp.float32)
    for r0 in range(0, tp, ROW_CHUNK):
        rc = min(ROW_CHUNK, tp - r0)
        asel = asel_ref[0, r0:r0 + rc, :].astype(jnp.float32)  # (rc, C)
        g = g_ref[0, r0:r0 + rc, :].astype(jnp.float32)
        taken = jnp.zeros(asel.shape, bool)
        csums = []
        for j in range(pool):
            ajf = al_ref[0, r0:r0 + rc, j * c:(j + 1) * c].astype(jnp.float32)
            # Exact-value match against the stored selection; first match
            # in time order wins (ties ⇒ equal values ⇒ equal
            # sign-directed keys).
            eq = (ajf == asel) & ~taken
            taken = taken | eq
            gj = jnp.where(eq, g, 0.0)
            dzj = jnp.where(ajf > 0, c0 * gj + c1 + c2 * ajf, 0.0)
            dz_ref[0, r0:r0 + rc, j * c:(j + 1) * c] = dzj.astype(out_dtype)
            csums.append(jnp.sum(dzj, axis=0, keepdims=True))
        sums += jnp.concatenate(csums, axis=1)
    acc_ref[0:1, :] += sums


@functools.partial(jax.jit, static_argnames=("pool", "out_dtype", "interpret"))
def pallas_route_bwd(
    a: jnp.ndarray,  # (B, T, C) — saved full-rate activation
    a_sel: jnp.ndarray,  # (B, T/pool, C) — selected value (same dtype family)
    g: jnp.ndarray,  # (B, T/pool, C) — pooled cotangent
    c0: jnp.ndarray,  # (C,) f32 BN-backward affine constants
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    pool: int,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """→ (dz (B, T, C) out_dtype, db (C,) f32) in one full-rate read+write."""
    B, T, c = a.shape
    tp = T // pool
    al = a.reshape(B, tp, pool * c)
    # Route the cotangent at the activation dtype (the XLA lane-view path
    # does the same): an f32 g block doubles its VMEM row and pushes the
    # double-buffered working set past the ~16 MB scoped limit at B≥1024.
    g = g.astype(a.dtype)
    affc = jnp.zeros((8, c), jnp.float32)
    affc = affc.at[0].set(c0.astype(jnp.float32))
    affc = affc.at[1].set(c1.astype(jnp.float32))
    affc = affc.at[2].set(c2.astype(jnp.float32))
    kernel = functools.partial(_route_bwd_kernel, pool=pool, c=c,
                               out_dtype=jnp.dtype(out_dtype))
    dz_l, acc = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, tp, pool * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(affc.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tp, pool * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pool * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, tp, pool * c), jnp.dtype(out_dtype)),
            jax.ShapeDtypeStruct((8, pool * c), jnp.float32),
        ],
        interpret=interpret,
    )(al, a_sel, g, affc)
    db = acc[0].reshape(pool, c).sum(axis=0)
    return dz_l.reshape(B, T, c), db
