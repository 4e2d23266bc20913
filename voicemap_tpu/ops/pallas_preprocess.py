"""Fused Pallas preprocessing: fragment gather → (decimate) → whiten.

The Pallas rebuild of the reference's host-side chain (BASELINE.json:
"librosa framing/downsample becomes a Pallas resample/frame kernel";
reference semantics live in ``ops/preprocess.py``, the property-test oracle).

Core kernel (``_gather_whiten_kernel``) per batch row of the corpus store:

1. **gather** — async DMA of an aligned fragment window from HBM at a dynamic
   (utterance, offset) position;
2. **align** — fine sub-window positioning via a dynamic sublane roll;
3. **whiten** — int16→f32 scale, per-row zero-mean, fixed-RMS rescale
   (reference: voicemap/utils.py :: whiten), stats over exactly the
   ``fragment_length`` true samples.

Stride decimation is performed **once at corpus-load time** (``decimate_store``
pre-slices the store — amortized over the whole run and ¼ the per-step HBM
traffic at ds=4), not per step: Mosaic cannot lower the (B, T) → (B, T/ds, ds)
shape cast in-kernel, and per-step decimation of an un-decimated store would
re-read 4× the bytes anyway. For callers holding only a raw store,
``pallas_preprocess(ds>1)`` gathers raw via the kernel and lets XLA fuse the
decimate+whiten tail (one extra HBM round-trip of the fragment).

Hardware constraints shaping the addressing (probed on v5e Mosaic — see the
module history in benchmarks/bench_kernels.py):
- the store is viewed ``(N, T/128, 128)``; an arbitrary utterance index is a
  batch-dim slice (legal), but the window start along dim 1 must be provably
  divisible by the int16 sublane tile (16 rows = 2048 samples) — so the DMA
  start is quantized to 2048 samples and the residual 0–15 row shift happens
  in VMEM with ``pltpu.roll``;
- dynamic rotates support only 32-bit data → convert int16→f32 pre-roll;
- dynamic-shift rolls must be written ``(nrows − r) mod nrows``: negative
  dynamic shifts mis-lower and full-length shifts are not reduced;
- value-level ``lax.dynamic_slice`` does not lower → the residual 0–127
  sample offset is applied with a dynamic LANE rotate plus a one-row sublane
  splice (probed to lower on v5e), making offsets fully sample-granular like
  the reference's stochastic fragments.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_WHITEN_RMS
from . import preprocess as jnp_pre

INT16_SCALE = 1.0 / 32768.0
LANE = 128
ALIGN_ROWS = 16  # int16 sublane tile: DMA dim-1 starts must divide by this
OFFSET_QUANTUM = 1  # offsets are sample-granular (dynamic lane rotate)


def _whiten_cols(x: jnp.ndarray, n_true: int, rms: float, eps: float) -> jnp.ndarray:
    """Whiten rows of (B, T_pad) using stats over the first n_true columns."""
    stats_src = x[:, :n_true] if n_true < x.shape[1] else x
    mean = jnp.mean(stats_src, axis=1, keepdims=True)
    centered_stats = stats_src - mean
    cur = jnp.sqrt(jnp.mean(centered_stats * centered_stats, axis=1, keepdims=True))
    return (x - mean) * (rms / (cur + eps))


def pad_store(store: jnp.ndarray) -> jnp.ndarray:
    """Pad the (N, T) int16 store so every aligned window read is in-bounds.

    Worst-case window overrun past a contract-valid fragment end is
    (lane-ceil slack ≤ 127) + (alignment slack 2048) = 2175 samples, so two
    2048-sample guard quanta are appended beyond the 2048-rounded length.
    """
    T = store.shape[1]
    quantum = ALIGN_ROWS * LANE
    target = ((T + quantum - 1) // quantum + 2) * quantum
    return jnp.pad(store, ((0, 0), (0, target - T)))


def decimate_store(store: jnp.ndarray, downsampling: int) -> jnp.ndarray:
    """One-time stride decimation of the raw store, re-padded for the kernel."""
    if downsampling == 1:
        return pad_store(store)
    return pad_store(store[:, ::downsampling])


def _gather_whiten_kernel(
    # scalar prefetch: (4, B) int32 rows = [indices, hi_rows, fine_rows, lane]
    meta_ref,
    # input: store viewed (N, T/128, 128) int16, stays in HBM
    store_ref,
    # output block (b_blk, frag_pad) f32
    out_ref,
    # scratch
    win_ref,  # (b_blk, win_rows, 128) int16
    sems,  # (b_blk,) DMA semaphores
    *,
    b_blk: int,
    win_rows: int,
    frag_rows: int,
    frag: int,
    rms: Optional[float],
    eps: float,
):
    i = pl.program_id(0)

    def dma(r):
        idx = meta_ref[0, i * b_blk + r]
        hi = pl.multiple_of(meta_ref[1, i * b_blk + r], ALIGN_ROWS)
        return pltpu.make_async_copy(
            store_ref.at[idx, pl.ds(hi, win_rows)],
            win_ref.at[r],
            sems.at[r],
        )

    for r in range(b_blk):
        dma(r).start()
    for r in range(b_blk):
        dma(r).wait()

    lane_pos = jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANE), 1)
    rows = []
    for r in range(b_blk):
        fine = meta_ref[2, i * b_blk + r]
        lane = meta_ref[3, i * b_blk + r]
        xf = win_ref[r].astype(jnp.float32)
        rolled = pltpu.roll(xf, (win_rows - fine) % win_rows, 0)
        # Sample-granular refinement: rotate lanes left by the residual
        # 0–127 offset, then splice in the next row's spill — dynamic lane
        # rotates lower on this Mosaic (probed; 32-bit data only).
        y = pltpu.roll(rolled, (LANE - lane) % LANE, 1)
        z = pltpu.roll(y, win_rows - 1, 0)  # z[r] = y[r+1]
        shifted = jnp.where(lane_pos < LANE - lane, y, z)
        rows.append(shifted[:frag_rows].reshape(1, frag_rows * LANE))
    x = jnp.concatenate(rows, axis=0) * INT16_SCALE
    if rms is not None:
        x = _whiten_cols(x, frag, rms, eps)
    out_ref[:] = x


@functools.partial(
    jax.jit,
    static_argnames=(
        "fragment_length", "whiten_rms", "whiten_eps", "block_rows", "interpret",
    ),
)
def pallas_gather_whiten(
    store: jnp.ndarray,  # (N, T_store) int16, padded via pad_store
    indices: jnp.ndarray,  # (B,) int32
    offsets: jnp.ndarray,  # (B,) int32, sample-granular; offset + fragment
    # must stay within the original (pre-pad) row length
    fragment_length: int,
    whiten_rms: Optional[float] = DEFAULT_WHITEN_RMS,
    whiten_eps: float = 1e-8,
    block_rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gather(+whiten) → (B, fragment_length) float32."""
    N, T_store = store.shape
    B = indices.shape[0]
    if B % block_rows:
        # Rows are independent and batch is a free grid dim: pad with
        # duplicates of row 0 and slice back. Callers with arbitrary B
        # (int8 calibration over a whole store, protocol eval subsets)
        # crashed here on-chip before round 5.
        b_pad = block_rows - B % block_rows
        out = pallas_gather_whiten(
            jnp.asarray(store),
            jnp.concatenate([indices, jnp.broadcast_to(indices[:1], (b_pad,))]),
            jnp.concatenate([offsets, jnp.broadcast_to(offsets[:1], (b_pad,))]),
            fragment_length, whiten_rms, whiten_eps, block_rows, interpret,
        )
        return out[:B]
    if T_store % (ALIGN_ROWS * LANE):
        raise ValueError("store must be padded with pad_store()/decimate_store()")
    frag_rows = -(-fragment_length // LANE)  # ceil: window covers the fragment
    # +ALIGN_ROWS slack for the fine shift, then rounded up to the f32 sublane
    # tile (8): tpu.dynamic_rotate rejects sublane-unaligned vector shapes.
    win_rows = -(-(frag_rows + ALIGN_ROWS) // 8) * 8
    frag_pad = frag_rows * LANE

    off_rows = offsets // LANE
    lane = offsets - off_rows * LANE
    hi = (off_rows // ALIGN_ROWS) * ALIGN_ROWS
    fine = off_rows - hi
    meta = jnp.stack(
        [indices.astype(jnp.int32), hi.astype(jnp.int32),
         fine.astype(jnp.int32), lane.astype(jnp.int32)]
    )

    kernel = functools.partial(
        _gather_whiten_kernel,
        b_blk=block_rows,
        win_rows=win_rows,
        frag_rows=frag_rows,
        frag=fragment_length,
        rms=whiten_rms,
        eps=whiten_eps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block_rows, frag_pad), lambda i, _m: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_rows, win_rows, LANE), jnp.int16),
            pltpu.SemaphoreType.DMA((block_rows,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, frag_pad), jnp.float32),
        interpret=interpret,
    )(meta, store.reshape(N, T_store // LANE, LANE))
    return out[:, :fragment_length]


@functools.partial(
    jax.jit,
    static_argnames=(
        "fragment_length", "downsampling", "whiten_rms", "whiten_eps",
        "block_rows", "interpret", "store_predecimated",
    ),
)
def pallas_preprocess(
    store: jnp.ndarray,
    indices: jnp.ndarray,
    offsets: jnp.ndarray,  # raw-sample units unless store_predecimated
    fragment_length: int,  # raw-sample units unless store_predecimated
    downsampling: int,
    whiten_rms: Optional[float] = DEFAULT_WHITEN_RMS,
    whiten_eps: float = 1e-8,
    block_rows: int = 8,
    interpret: bool = False,
    store_predecimated: bool = False,
) -> jnp.ndarray:
    """Full preprocess chain → (B, fragment_length//ds, 1) float32.

    Fast path (``store_predecimated=True``, store from ``decimate_store``):
    one fused kernel, offsets/fragment interpreted in decimated units after
    division by ``downsampling``. Raw-store path (ds>1): fused gather, then
    XLA-fused decimate+whiten tail.
    """
    ds = downsampling
    if store_predecimated or ds == 1:
        if store_predecimated and ds > 1:
            # Offsets arrive in raw-sample units; the store holds decimated
            # samples, so granularity is one decimated sample (= ds raw).
            offsets = offsets // ds
            fragment_length = fragment_length // ds
        out = pallas_gather_whiten(
            store, indices, offsets, fragment_length,
            whiten_rms, whiten_eps, block_rows, interpret,
        )
        return out[..., None]
    # Raw-store ds>1 fallback: gather fused, decimate+whiten in XLA.
    raw = pallas_gather_whiten(
        store, indices, offsets, fragment_length,
        None, whiten_eps, block_rows, interpret,
    )
    x = jnp_pre.stride_decimate(raw, ds)
    if whiten_rms is not None:
        x = jnp_pre.whiten(x, whiten_rms, whiten_eps)
    return x[..., None]


def quantize_offsets(offsets: jnp.ndarray) -> jnp.ndarray:
    """Identity — kept for API compatibility.

    Round-1 kernels could only address the 128-sample lane grid; the
    gather kernel now refines to single samples with a dynamic lane rotate,
    so offsets pass through unquantized (matching the reference's
    sample-granular stochastic fragments,
    voicemap/librispeech.py :: __getitem__).
    """
    return offsets
