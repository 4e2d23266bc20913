"""Fused STFT+mel Pallas kernel (BASELINE.json config #4).

FFT-free, MXU-native log-mel: the windowed DFT is computed as two matmuls
against fixed cos/sin bases (Hann window folded in), the power spectrum as a
square-add, and the mel projection as a third matmul — fused so frames and
the power spectrum never round-trip through HBM:

    frames (F, W) ─┬─ @C (W, K) ─ sq ─┐
                   └─ @S (W, K) ─ sq ─ + ── @fb (K, M) ── log ── out (F, M)

For n_fft ≤ 512 the DFT-as-matmul costs ~15× the FLOPs of an FFT but runs on
the 128×128 systolic array instead of a scalar butterfly network — the
classic TPU trade of FLOPs for locality. Property-tested against
``melspec.log_mel_spectrogram`` (the jnp/rfft reference).

Two paths, chosen by the framing geometry (Mosaic requires lane-dim slice
offsets provably divisible by 128):

- **fully fused** (``hop % 128 == 0 and win % 128 == 0``): framing happens
  in-kernel from the raw waveform block — one HBM read of the waveform. The
  TPU-native MelConfig (hop=128 = 8 ms, win=384 = 24 ms @ 16 kHz) hits this.
- **pre-framed** (librosa-default 160/400 geometry): XLA materializes the
  frame matrix (gather), the kernel fuses window→DFT→power→mel→log.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MelConfig
from . import melspec


def _dft_mel(frames: jnp.ndarray, c, s, fb, log_eps: float) -> jnp.ndarray:
    """(rows, W) windowed frames → (rows, M) log-mel. All-MXU core."""
    re = jnp.dot(frames, c, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s, preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    return jnp.log(mel + log_eps)


FRAME_CHUNK = 64  # frames per in-kernel DFT chunk (bounds VMEM, keeps MXU fed)


def _fused_kernel(
    x_ref,  # (B_blk, T) f32 waveform block
    c_ref,  # (W, K) cos basis (windowed)
    s_ref,  # (W, K) sin basis (windowed)
    fb_ref,  # (K, M) mel filterbank
    o_ref,  # (B_blk, F, M)
    frames_ref,  # scratch (B_blk * FRAME_CHUNK, W), frame-major
    *,
    b_blk: int,
    n_frames: int,
    win: int,
    hop: int,
    log_eps: float,
):
    # Frames are processed in chunks so the frame scratch + DFT intermediates
    # stay within VMEM regardless of sequence length.
    for f0 in range(0, n_frames, FRAME_CHUNK):
        fc = min(FRAME_CHUNK, n_frames - f0)

        def fill(j, _, f0=f0):
            start = pl.multiple_of((f0 + j) * hop, 128)  # hop % 128 == 0 here
            frames_ref[pl.ds(j * b_blk, b_blk), :] = x_ref[:, pl.ds(start, win)]
            return 0

        jax.lax.fori_loop(0, fc, fill, 0)
        mel = _dft_mel(
            frames_ref[: fc * b_blk], c_ref[:], s_ref[:], fb_ref[:], log_eps
        )
        o_ref[:, f0 : f0 + fc, :] = mel.reshape(fc, b_blk, -1).transpose(1, 0, 2)


def _preframed_kernel(
    frames_ref,  # (rows_blk, W) raw (un-windowed) frames
    c_ref,
    s_ref,
    fb_ref,
    o_ref,  # (rows_blk, M)
    *,
    log_eps: float,
):
    o_ref[:] = _dft_mel(frames_ref[:], c_ref[:], s_ref[:], fb_ref[:], log_eps)


def _bases(cfg: MelConfig, sample_rate: int):
    C, S = melspec.dft_bases(cfg)
    fb = melspec.mel_filterbank(
        sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
    )
    return jnp.asarray(C), jnp.asarray(S), jnp.asarray(fb)


@functools.partial(
    jax.jit, static_argnames=("cfg", "sample_rate", "block_rows", "interpret")
)
def pallas_log_mel(
    x: jnp.ndarray,  # (B, T) or (B, T, 1) float32 waveform
    cfg: MelConfig,
    sample_rate: int,
    block_rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused log-mel → (B, n_frames, n_mels) float32. B % block_rows == 0."""
    if x.ndim == 3:
        x = x[..., 0]
    B, T = x.shape
    n_frames = melspec.num_frames(T, cfg)
    C, S, fb = _bases(cfg, sample_rate)
    x = x.astype(jnp.float32)

    if cfg.hop_length % 128 == 0 and cfg.win_length % 128 == 0 and T % 128 == 0:
        # The fused kernel's frame-scratch writes start at j*b_blk in the
        # sublane dim, which Mosaic must statically prove is a multiple of 8
        # (f32 sublane tile). Pad odd batches (init probes, calibration
        # subsets) with duplicate rows to the next multiple of 8 and slice
        # the padding back off; production batches are already aligned.
        block_rows = max(8, -(-block_rows // 8) * 8)
        pad = (-B) % block_rows
        if pad:
            x = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad, T))], axis=0)
        B_pad = B + pad
        while block_rows > 8 and B_pad % block_rows:
            block_rows //= 2
        kernel = functools.partial(
            _fused_kernel,
            b_blk=block_rows,
            n_frames=n_frames,
            win=cfg.win_length,
            hop=cfg.hop_length,
            log_eps=cfg.log_eps,
        )
        out = pl.pallas_call(
            kernel,
            grid=(B_pad // block_rows,),
            in_specs=[
                pl.BlockSpec((block_rows, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(C.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(S.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(fb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, n_frames, cfg.n_mels),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B_pad, n_frames, cfg.n_mels), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (block_rows * min(FRAME_CHUNK, n_frames), cfg.win_length),
                    jnp.float32,
                )
            ],
            interpret=interpret,
        )(x, C, S, fb)
        return out[:B] if pad else out

    # Pre-framed path: XLA gathers the (B·F, W) frame matrix; the kernel
    # fuses window (in the bases) → DFT → power → mel → log.
    frames = melspec.frame_signal(x, cfg.win_length, cfg.hop_length)
    rows = frames.reshape(B * n_frames, cfg.win_length)
    rows_blk = 256 if (B * n_frames) % 256 == 0 else _largest_block(B * n_frames)
    out = pl.pallas_call(
        functools.partial(_preframed_kernel, log_eps=cfg.log_eps),
        grid=((B * n_frames) // rows_blk,),
        in_specs=[
            pl.BlockSpec((rows_blk, cfg.win_length), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(C.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(S.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows_blk, cfg.n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * n_frames, cfg.n_mels), jnp.float32),
        interpret=interpret,
    )(rows, C, S, fb)
    return out.reshape(B, n_frames, cfg.n_mels)


def _largest_block(n: int, cap: int = 512) -> int:
    """Largest divisor of n that is ≤ cap and a multiple of 8 (sublane tile),
    falling back to n itself (block == full array is always legal)."""
    for b in range(min(cap, n), 7, -1):
        if n % b == 0 and b % 8 == 0:
            return b
    return n
