"""int8 post-training-quantized inference embedding path.

TPU-native serving optimization with no reference analog (the reference
serves f32 Keras inference — ``voicemap/models.py ::
get_baseline_convolutional_encoder``); rebuilt here because the v5e MXU
runs s8×s8→s32 at ~2× its bf16 rate and the compute-bound blocks 1+ of the
encoder are exactly that shape of work (``models/fast_infer.py`` keeps them
on the XLA conv emitter at ~74% MXU efficiency in bf16). int8 also halves
the inter-block activation HBM traffic.

Scheme — classic symmetric per-channel PTQ, folded for the MXU:

- **Activations**: per-input-channel scales ``s_in[ci]`` from a calibration
  batch (max-abs / 127). The post-BN activation is requantized inside the
  previous block's epilogue, so blocks 1+ stream int8 activations.
- **Weights**: the input scale is folded into the weight *before* weight
  quantization (``w[k,ci,co] * s_in[ci]``), then per-output-channel
  symmetric int8 (``s_w[co]``). One conv in s8×s8→s32 then reproduces
  ``conv(x̂, w)`` up to rounding, where ``x̂`` is the dequantized input.
- **Epilogue** (fused by XLA into the conv output): with ``s_w > 0`` by
  construction, ``relu(acc·s_w + b) = s_w·relu(acc + b/s_w)``, so
  conv-bias, BN inference affine, and the next block's requantization fold
  into three per-channel f32 vectors::

      z_q = clamp(round(alpha·relu(acc + beta) + gamma))
      alpha = s_w·g / s_out,  beta = b / s_w,  gamma = h / s_out

  where ``g = scale·rsqrt(var+eps)`` and ``h = bn_bias − mean·g``.
- **Max-pool runs on the int8 tensor**: requantization is monotone per
  channel (positive scale, nondecreasing round/clamp), so
  ``max(quant(z)) == quant(max(z))`` exactly — pooling commutes with
  quantization and moves 4× less data.
- Block 0 is HBM-bound, not compute-bound, and already runs the fused
  Pallas kernel in bf16 (``ops/pallas_conv.pallas_conv_block0``); it is NOT
  quantized — its output is requantized once at full rate. The final block
  dequantizes in its epilogue (bf16) ahead of global max-pool + Dense.

Accuracy: property-tested against the bf16 path (embedding cosine
similarity and n-shot nearest-neighbor decisions) in
``tests/test_quant_infer.py``; measured end-to-end in ``bench.py --int8``.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp

from ..config import EncoderConfig
from .encoder import _DTYPES
from .fast_infer import _xla_block, block0_pallas_eligible


# Minimum batch size where the int8 path beats bf16 on v5e. At batch 1 the
# requantize round-trips dominate and int8 measures *slower* than bf16
# (0.142 vs 0.129 ms, BASELINE.md round 3); the win comes from MXU rate +
# halved activation traffic, both of which need batch to amortize. Crossover
# measured on-chip 2026-08-18 (bench.py --int8 --batch-size sweep).
INT8_MIN_BATCH = 8


def int8_worthwhile(batch_size: int) -> bool:
    """Dtype-by-batch serving policy: True when int8 is expected to beat
    bf16 at this batch size (see INT8_MIN_BATCH)."""
    return batch_size >= INT8_MIN_BATCH


def check_qvars_mode(cfg, qvars) -> None:
    """Validate a qvars artifact against the model mode, loudly.

    One shared check for every int8 entry point (eval/nshot device-store +
    streaming, parallel/pod_eval): a mismatched artifact otherwise dies in
    a conv rank error deep inside the embed program (or silently runs the
    wrong quant program). ``kind='mel'`` artifacts serve melspec2d; 'wave'
    artifacts serve the raw-waveform encoders (classifier/siamese)."""
    if cfg.mode not in ("classifier", "siamese", "melspec2d"):
        raise ValueError(f"int8 path does not support mode {cfg.mode!r}")
    if (cfg.mode == "melspec2d") != (qvars.get("kind") == "mel"):
        raise ValueError(
            "qvars artifact kind does not match cfg.mode (mel artifacts "
            "serve melspec2d; wave artifacts serve classifier/siamese)"
        )


def _bn_affine(blk: Dict, bst: Dict, eps: float):
    """Inference BatchNorm as per-channel affine: z = y*g + h (f32)."""
    inv = jax.lax.rsqrt(bst["var"].astype(jnp.float32) + eps)
    g = inv * blk["bn"]["scale"].astype(jnp.float32)
    h = blk["bn"]["bias"].astype(jnp.float32) - bst["mean"].astype(jnp.float32) * g
    return g, h


# One jitted program for the whole calibration sweep: eager per-op execution
# at serving batch sizes keeps several (B, T, C) intermediates live at once
# and OOMs HBM (seen at B=2048 on v5e); under jit XLA fuses each block and
# frees activations as soon as the per-channel amax is reduced. Module-level
# with (params, stats, x) as runtime arguments so the encoder weights stay
# program inputs (not baked-in HLO constants duplicating them in HBM) and the
# compile caches across calibrate_scales calls.
@functools.partial(jax.jit, static_argnames=("cfg", "headroom"))
def _calib_sweep(params, stats, x, cfg: EncoderConfig, headroom: float):
    cdt = _DTYPES[cfg.compute_dtype]
    h = x
    out = []
    for i in range(len(cfg.filter_multipliers)):
        h = _xla_block(h, params[f"block_{i}"], stats[f"block_{i}"]["bn"],
                       cfg.pool_sizes[i], cfg.dilations[i],
                       cfg.bn_epsilon, cdt)
        if i < len(cfg.filter_multipliers) - 1:
            amax = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=(0, 1))
            out.append(jnp.maximum(amax * headroom, 1e-8) / 127.0)
    return out


def calibrate_scales(variables: Dict, cfg: EncoderConfig, x_calib: jnp.ndarray,
                     headroom: float = 1.0) -> List[jnp.ndarray]:
    """Per-channel int8 scales for each block's INPUT activation (blocks 1+).

    Runs the bf16 reference forward on ``x_calib`` (any representative
    batch; synthetic works — scales track the BN-stabilized dynamic range,
    not speaker content) and records max-abs per channel of every pooled
    block output. Returns ``scales[i]`` = scale of block ``i+1``'s input,
    ``len == n_blocks - 1``.
    """
    scales = _calib_sweep(variables["params"], variables["batch_stats"],
                          x_calib, cfg=cfg, headroom=headroom)
    return [jax.device_get(s) for s in scales]


def quantize_encoder(variables: Dict, cfg: EncoderConfig,
                     x_calib: jnp.ndarray) -> Dict:
    """Fold + quantize blocks 1+ of a trained encoder for int8 serving.

    Returns a qvars dict consumed by :func:`quant_embed`; the original
    ``variables`` stay authoritative for block 0 and the Dense head.
    """
    n = len(cfg.filter_multipliers)
    if n < 2:
        raise ValueError("quantized path needs at least 2 conv blocks")
    scales = calibrate_scales(variables, cfg, x_calib)
    params, stats = variables["params"], variables["batch_stats"]
    blocks = []
    for i in range(1, n):
        blk = params[f"block_{i}"]
        bst = stats[f"block_{i}"]["bn"]
        w = blk["conv"]["kernel"].astype(jnp.float32)  # (k, Cin, Cout)
        b = blk["conv"]["bias"].astype(jnp.float32)
        s_in = jnp.asarray(scales[i - 1], jnp.float32)  # (Cin,)
        w_f = w * s_in[None, :, None]
        s_w = jnp.maximum(jnp.max(jnp.abs(w_f), axis=(0, 1)), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w_f / s_w[None, None, :]), -127, 127
                       ).astype(jnp.int8)
        g, h = _bn_affine(blk, bst, cfg.bn_epsilon)
        beta = b / s_w
        if i < n - 1:
            s_out = jnp.asarray(scales[i], jnp.float32)
            alpha = s_w * g / s_out
            gamma = h / s_out
        else:  # last block dequantizes: z = (s_w·g)·relu(acc+beta) + h
            alpha = s_w * g
            gamma = h
        blocks.append({"w_q": w_q, "alpha": alpha, "beta": beta,
                       "gamma": gamma})
    return {"s0": jnp.asarray(scales[0], jnp.float32), "blocks": blocks}


def quantize_from_store(state, cfg, store, n_cal: int = 256) -> Dict:
    """Calibrate + quantize off a device store (CLI convenience).

    Uses the first ``n_cal`` deterministic fragments as the calibration
    batch — representative by construction (same preprocessing as serving).
    ``state``: a TrainState with ``params['encoder']``/``batch_stats``;
    ``cfg``: the full ExperimentConfig.
    """
    from ..train.steps import fetch_batch

    n = min(n_cal, int(store.labels.shape[0]))
    x_cal = fetch_batch(store, jnp.arange(n, dtype=jnp.int32),
                        jax.random.PRNGKey(0), cfg, stochastic=False)
    enc_vars = {"params": state.params["encoder"],
                "batch_stats": state.batch_stats["encoder"]}
    if cfg.mode == "melspec2d":
        return quantize_mel_encoder(enc_vars, cfg.encoder, cfg.mel, x_cal,
                                    sample_rate=cfg.data.sample_rate)
    return quantize_encoder(enc_vars, cfg.encoder, x_cal)


def quantize_from_frags(state, cfg, frags) -> Dict:
    """Calibrate + quantize off host-cut int16 fragments (the streaming
    serving path's calibration batch — see data/pipeline.iter_embed_batches)."""
    from ..train.steps import preprocess_fragments

    x_cal = preprocess_fragments(jnp.asarray(frags), cfg)
    enc_vars = {"params": state.params["encoder"],
                "batch_stats": state.batch_stats["encoder"]}
    if cfg.mode == "melspec2d":
        return quantize_mel_encoder(enc_vars, cfg.encoder, cfg.mel, x_cal,
                                    sample_rate=cfg.data.sample_rate)
    return quantize_encoder(enc_vars, cfg.encoder, x_cal)


def save_qvars(path: str, qvars: Dict) -> None:
    """Persist a quantized encoder to one ``.npz`` serving artifact.

    int8 weights + per-channel f32 epilogue vectors — ~4× smaller than the
    bf16 params for blocks 1+ and calibration-free at load time (quantize
    once on the training host, deploy everywhere).
    """
    import numpy as np

    arrs = {"s0": np.asarray(qvars["s0"]),
            "n_blocks": np.asarray(len(qvars["blocks"]), np.int32),
            "kind": np.asarray(qvars.get("kind", "wave"))}
    for i, blk in enumerate(qvars["blocks"]):
        for k, v in blk.items():
            arrs[f"block{i}_{k}"] = np.asarray(v)
    np.savez(path, **arrs)


def load_qvars(path: str) -> Dict:
    """Load a :func:`save_qvars` artifact back into a qvars dict."""
    import numpy as np

    with np.load(path) as z:
        n = int(z["n_blocks"])
        blocks = []
        for i in range(n):
            blocks.append({
                k: jnp.asarray(z[f"block{i}_{k}"])
                for k in ("w_q", "alpha", "beta", "gamma")
            })
        out = {"s0": jnp.asarray(z["s0"]), "blocks": blocks}
        kind = str(z["kind"]) if "kind" in z else "wave"
        if kind == "mel":
            out["kind"] = "mel"
        return out


def _quant_block(x_q, qblk, pool, dilation, *, last, out_dtype,
                 zero_tail_from=None):
    """One int8 mid-network block on the XLA conv emitter.

    ``zero_tail_from`` (a valid-length t): the input follows the padded-
    activation contract (rows ≥ t are exact zeros — see
    ops/pallas_quant_block), and the output's pooled rows ≥ t//pool are
    re-zeroed so the contract holds downstream. The conv itself is
    already correct on the padded array (SAME needs x[t] == 0, which the
    contract guarantees); only the epilogue's relu(β)·α+γ ≠ 0 on zero
    rows needs masking — a select fused into the epilogue, not a pass.
    """
    acc = jax.lax.conv_general_dilated(
        x_q, qblk["w_q"], (1,), "SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    z = (jax.nn.relu(acc.astype(jnp.float32) + qblk["beta"]) * qblk["alpha"]
         + qblk["gamma"])
    if last:
        y = z.astype(out_dtype)
    else:
        y = jnp.clip(jnp.round(z), -127, 127).astype(jnp.int8)
    if pool > 1:
        B, T, C = y.shape
        t_full = (T // pool) * pool  # nn.max_pool VALID: drop the remainder
        y = y[:, :t_full].reshape(B, T // pool, pool, C).max(axis=2)
    if zero_tail_from is not None:
        t_v = zero_tail_from // max(pool, 1)
        idx = jnp.arange(y.shape[1], dtype=jnp.int32)
        y = jnp.where((idx < t_v)[None, :, None], y, jnp.zeros_like(y))
    return y


# Auto-routing policy for the fused int8 mid-block kernel
# (ops/pallas_quant_block): the kernel measured SLOWER than XLA's int8 conv
# emitter end-to-end on-chip — 27.1 ms vs 8.7 ms on block 1 at the serving
# shape (benchmarks/bench_qblock_attrib.py; BASELINE.md round-5 qblock row) —
# and its round-4 auto-adoption regressed the headline 67.9k → 37.5k utt/s.
# 0 means routing="auto" never picks it; it stays available via
# routing="pallas" for benchmarking. Raise this ONLY with a fresh end-to-end
# on-chip win recorded in BASELINE.md.
PALLAS_QBLOCK_MAX_CIN = 0

# Kernel formulation used when the qblock kernel IS selected: "pshift"
# (one (t, Cin)@(Cin, 3·Cout) pass + sublane-shifted adds), "xk" (taps
# folded into the GEMM K dim, (t, 3·Cin)@(3·Cin, Cout) — does NOT lower
# on axon Mosaic: lane-concat of a sublane-offset int8 slice), or "xk3"
# (three per-tap K=Cin dots accumulated in int32 — the lowering-safe
# realization of the same no-wide-P idea). Bit-identical outputs.
PALLAS_QBLOCK_VARIANT = "pshift"


# pallas_quant_block holds whole (b_blk, T_pad, Cin) input and
# (b_blk, T_pad/2, Cout) output rows in VMEM; leave headroom under the
# ~16 MB Mosaic scoped-VMEM limit so oversized fragment lengths fall back
# to the XLA mid-block path instead of failing to compile (r4 advice).
_QBLOCK_VMEM_BUDGET = 12 * 1024 * 1024


def _pallas_qblock_ok(cfg, i: int, t_pad: int, t_valid: int) -> bool:
    """Shape + VMEM-footprint eligibility of mid block ``i`` for the
    fused Pallas kernel (ops/pallas_quant_block)."""
    c_in = cfg.filters * cfg.filter_multipliers[i - 1]
    c_out = cfg.filters * cfg.filter_multipliers[i]
    out_bytes = 2 if i == len(cfg.filter_multipliers) - 1 else 1
    # b_blk=4 (the kernel default; it only shrinks when B % 4 != 0), whole
    # rows for input and output, plus the lane-concatenated weights.
    vmem = 4 * t_pad * c_in + 4 * (t_pad // 2) * c_out * out_bytes \
        + 3 * c_in * c_out
    return (
        cfg.kernel_sizes[i] == 3
        and cfg.pool_sizes[i] == 2
        and cfg.dilations[i] == 1
        and t_pad % 2 == 0
        and t_valid % 2 == 0
        and vmem <= _QBLOCK_VMEM_BUDGET
    )


def _any_mid_pallas(cfg, T: int, routing: str) -> bool:
    """Would any mid block run the fused Pallas kernel under ``routing``?

    Simulates the padded-chain shapes (block 0 keep_pad rounds T//pool0 up
    to the 1024-row chunk) through blocks 1+ — used to decide whether the
    padded-activation contract is worth engaging at all."""
    if routing == "xla":
        return False
    t_valid = T // cfg.pool_sizes[0]
    t_pad = -(-t_valid // 1024) * 1024  # pallas_conv_block0 t_chunk default
    for i in range(1, len(cfg.filter_multipliers)):
        c_in = cfg.filters * cfg.filter_multipliers[i - 1]
        if _pallas_qblock_ok(cfg, i, t_pad, t_valid) and (
                routing == "pallas" or c_in <= PALLAS_QBLOCK_MAX_CIN):
            return True
        pool = cfg.pool_sizes[i]
        if pool > 1:
            t_pad, t_valid = t_pad // pool, t_valid // pool
    return False


def quant_embed(variables: Dict, qvars: Dict, cfg: EncoderConfig,
                x: jnp.ndarray, *, routing: str = "auto",
                interpret: bool = False) -> jnp.ndarray:
    """(B, T, 1) float32 → (B, embedding_dim) float32, int8 blocks 1+.

    Mirrors ``fast_infer.fast_embed``: block 0 runs the fused Pallas kernel
    (bf16 GEMM, int8 requantizing epilogue) when eligible, else the XLA
    block; blocks 1+ run s8×s8→s32 convs with fused requantizing epilogues.

    ``routing``: mid-block backend policy — ``'auto'`` (fused Pallas kernel
    only where an end-to-end on-chip win is recorded: Cin ≤
    PALLAS_QBLOCK_MAX_CIN, currently 0 i.e. XLA everywhere), ``'xla'``
    (the all-XLA path), ``'pallas'`` (force the kernel on every
    shape-eligible block, for benchmarking). The padded-activation contract
    (block 0 keeps its chunk-pad, zero tails, no inter-block slices) is
    engaged ONLY when some mid block will actually run the Pallas kernel —
    it costs every XLA mid block ~2.4% pad rows plus a tail mask, so a
    policy that routes everything to XLA must not pay it (round-5 fix:
    this residual alone was ~6% of headline). Outputs are bit-identical
    across routings (tests/test_pallas_quant_block.py).

    ``interpret``: run the Pallas kernels in interpret mode (CPU tests).
    """
    if routing not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown routing {routing!r}")
    params, stats = variables["params"], variables["batch_stats"]
    cdt = _DTYPES[cfg.compute_dtype]
    n = len(cfg.filter_multipliers)
    blk0_pallas = block0_pallas_eligible(cfg, x) or (
        interpret and cfg.dilations[0] == 1 and x.shape[-1] == 1
        and x.shape[1] % cfg.pool_sizes[0] == 0
    )
    chain = blk0_pallas and routing != "xla" and _any_mid_pallas(
        cfg, x.shape[1], routing)
    if blk0_pallas:
        from ..ops.pallas_conv import pallas_conv_block0

        # s0 requantize fused into the kernel epilogue: block 0 is
        # HBM-bound, so emitting int8 directly halves its output write and
        # deletes the separate full-rate bf16 read+requant pass this path
        # used to pay (round-3 verdict weak #2).
        blk, bst = params["block_0"], stats["block_0"]["bn"]
        h_q = pallas_conv_block0(
            x, blk["conv"]["kernel"], blk["conv"]["bias"],
            blk["bn"]["scale"], blk["bn"]["bias"], bst["mean"], bst["var"],
            cfg.bn_epsilon, pool=cfg.pool_sizes[0], gemm_dtype=cdt,
            requant_scale=qvars["s0"], keep_pad=chain, interpret=interpret,
        )
    else:
        h = _xla_block(x, params["block_0"], stats["block_0"]["bn"],
                       cfg.pool_sizes[0], cfg.dilations[0], cfg.bn_epsilon,
                       cdt)
        h_q = jnp.clip(jnp.round(h.astype(jnp.float32) / qvars["s0"]),
                       -127, 127).astype(jnp.int8)
    t_valid = x.shape[1] // cfg.pool_sizes[0]
    for i in range(1, n):
        qblk = qvars["blocks"][i - 1]
        pool = cfg.pool_sizes[i]
        last = i == n - 1
        use_pallas = (
            chain
            and routing in ("auto", "pallas")
            and _pallas_qblock_ok(cfg, i, h_q.shape[1], t_valid)
            and (routing == "pallas"
                 or h_q.shape[-1] <= PALLAS_QBLOCK_MAX_CIN)
        )
        if use_pallas:
            from ..ops.pallas_quant_block import (
                cat_weights, pallas_quant_block, stack_weights,
            )

            prep = (stack_weights if PALLAS_QBLOCK_VARIANT in ("xk", "xk3")
                    else cat_weights)
            h_q = pallas_quant_block(
                h_q, prep(qblk["w_q"]), qblk["alpha"], qblk["beta"],
                qblk["gamma"], t_valid=t_valid, last=last,
                out_dtype=cdt if last else jnp.int8,
                variant=PALLAS_QBLOCK_VARIANT, interpret=interpret,
            )
        else:
            h_q = _quant_block(h_q, qblk, pool, cfg.dilations[i], last=last,
                               out_dtype=cdt,
                               zero_tail_from=t_valid if chain else None)
        t_valid = t_valid // pool if pool > 1 else t_valid
    if chain:
        # The padded chain carries zero tails; the global max must only
        # see the valid rows (all-negative channels would otherwise clamp
        # at the pad's zeros).
        h_q = h_q[:, :t_valid]
    h = jnp.max(h_q, axis=1)
    emb = params["embed"]
    out = h @ emb["kernel"].astype(cdt) + emb["bias"].astype(cdt)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# config #4 (log-mel frontend + 2D CNN, models/spectrogram.py) int8 serving
# ---------------------------------------------------------------------------
# Same scheme as the 1D path above, adapted to the 2D stack: the param-free
# mel frontend stays f32 (FFT work, not a GEMM), the standardized log-mel
# image is quantized ONCE with a calibrated per-tensor scale, and all four
# conv2d blocks run s8×s8→s32 with the fused requantizing epilogue. The 2×2
# max-pool runs on the int8 tensor (monotone per channel, commutes exactly).
# Unlike the 1D path there is no Pallas block-0 special case — the image's
# Cin=1 conv is just another quantized GEMM.


def _mel_image(x: jnp.ndarray, mel_cfg, sample_rate: int) -> jnp.ndarray:
    """Waveform (B, T, 1) → standardized log-mel image (B, F, M, 1), f32.

    Functional replica of ``models/spectrogram.py::MelFrontend`` (which is
    parameter-free), kept here so the quant path needs no flax apply."""
    if jax.default_backend() == "tpu":
        from ..ops.pallas_melspec import pallas_log_mel

        m = pallas_log_mel(x, mel_cfg, sample_rate)
    else:
        from ..ops import melspec

        m = melspec.log_mel_spectrogram(x, mel_cfg, sample_rate)
    mean = jnp.mean(m, axis=(1, 2), keepdims=True)
    std = jnp.std(m, axis=(1, 2), keepdims=True)
    return ((m - mean) / (std + 1e-5))[..., None]


def _pool2d(y: jnp.ndarray, pool: int) -> jnp.ndarray:
    """flax ``nn.max_pool((p,p),(p,p))`` VALID semantics on any dtype."""
    if pool <= 1:
        return y
    B, F, M, C = y.shape
    f2, m2 = F // pool, M // pool
    y = y[:, : f2 * pool, : m2 * pool]
    return y.reshape(B, f2, pool, m2, pool, C).max(axis=(2, 4))


def _mel_block_infer(img, blk, bst, eps, cdt):
    """Inference-mode Conv2DBlock (conv→relu→BN affine→pool2), bf16 ref."""
    w = blk["conv"]["kernel"].astype(cdt)
    z = jax.lax.conv_general_dilated(
        img.astype(cdt), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + blk["conv"]["bias"].astype(cdt)
    a = jax.nn.relu(z)
    g, h = _bn_affine(blk, bst, eps)
    y = (a.astype(jnp.float32) * g + h).astype(cdt)
    return _pool2d(y, 2)


@functools.partial(jax.jit, static_argnames=("cfg", "mel_cfg", "sample_rate",
                                             "headroom"))
def _calib_sweep_mel(params, stats, x, cfg: EncoderConfig, mel_cfg,
                     sample_rate: int, headroom: float):
    cdt = _DTYPES[cfg.compute_dtype]
    img = _mel_image(x, mel_cfg, sample_rate)
    out = [jnp.maximum(jnp.max(jnp.abs(img)) * headroom, 1e-8) / 127.0]
    h = img
    for i in range(len(cfg.filter_multipliers)):
        h = _mel_block_infer(h, params[f"block_{i}"], stats[f"block_{i}"]["bn"],
                             cfg.bn_epsilon, cdt)
        if i < len(cfg.filter_multipliers) - 1:
            amax = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=(0, 1, 2))
            out.append(jnp.maximum(amax * headroom, 1e-8) / 127.0)
    return out


def quantize_mel_encoder(variables: Dict, cfg: EncoderConfig, mel_cfg,
                         x_calib: jnp.ndarray, sample_rate: int = 16000) -> Dict:
    """Fold + quantize ALL conv2d blocks of a trained mel encoder.

    Returns a qvars dict (``kind='mel'``) consumed by :func:`quant_embed_mel`.
    ``scales[0]`` is the per-tensor image scale (the standardized log-mel
    image is channel-less); blocks fold exactly like the 1D path with the
    kernel's extra spatial axis."""
    n = len(cfg.filter_multipliers)
    params, stats = variables["params"], variables["batch_stats"]
    scales = [jax.device_get(s) for s in _calib_sweep_mel(
        params, stats, x_calib, cfg=cfg, mel_cfg=mel_cfg,
        sample_rate=sample_rate, headroom=1.0)]
    blocks = []
    for i in range(n):
        blk = params[f"block_{i}"]
        bst = stats[f"block_{i}"]["bn"]
        w = blk["conv"]["kernel"].astype(jnp.float32)  # (kh, kw, Cin, Cout)
        b = blk["conv"]["bias"].astype(jnp.float32)
        s_in = jnp.atleast_1d(jnp.asarray(scales[i], jnp.float32))  # (Cin,)|(1,)
        w_f = w * s_in[None, None, :, None]
        s_w = jnp.maximum(jnp.max(jnp.abs(w_f), axis=(0, 1, 2)), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w_f / s_w[None, None, None, :]), -127, 127
                       ).astype(jnp.int8)
        g, h = _bn_affine(blk, bst, cfg.bn_epsilon)
        beta = b / s_w
        if i < n - 1:
            s_out = jnp.asarray(scales[i + 1], jnp.float32)
            alpha = s_w * g / s_out
            gamma = h / s_out
        else:
            alpha = s_w * g
            gamma = h
        blocks.append({"w_q": w_q, "alpha": alpha, "beta": beta,
                       "gamma": gamma})
    return {"kind": "mel", "s0": jnp.asarray(scales[0], jnp.float32),
            "blocks": blocks}


def _quant_block2d(x_q, qblk, pool, *, last, out_dtype):
    acc = jax.lax.conv_general_dilated(
        x_q, qblk["w_q"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    z = (jax.nn.relu(acc.astype(jnp.float32) + qblk["beta"]) * qblk["alpha"]
         + qblk["gamma"])
    if last:
        y = z.astype(out_dtype)
    else:
        y = jnp.clip(jnp.round(z), -127, 127).astype(jnp.int8)
    return _pool2d(y, pool)


def quant_embed_mel(variables: Dict, qvars: Dict, cfg: EncoderConfig,
                    mel_cfg, x: jnp.ndarray,
                    sample_rate: int = 16000) -> jnp.ndarray:
    """(B, T, 1) float32 → (B, embedding_dim) float32, int8 conv2d stack."""
    params = variables["params"]
    cdt = _DTYPES[cfg.compute_dtype]
    img = _mel_image(x, mel_cfg, sample_rate)
    h_q = jnp.clip(jnp.round(img / qvars["s0"]), -127, 127).astype(jnp.int8)
    n = len(cfg.filter_multipliers)
    for i in range(n):
        h_q = _quant_block2d(h_q, qvars["blocks"][i], 2, last=(i == n - 1),
                             out_dtype=cdt)
    h = jnp.max(h_q, axis=(1, 2))
    emb = params["embed"]
    out = h @ emb["kernel"].astype(cdt) + emb["bias"].astype(cdt)
    return out.astype(jnp.float32)
