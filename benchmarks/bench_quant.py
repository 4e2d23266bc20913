"""int8 PTQ serving-path microbenchmarks (models/quant_infer.py).

Run on the chip: ``python benchmarks/bench_quant.py [blocks|embed]``.

- ``blocks``: per mid-network block, the s8×s8→s32 conv + folded epilogue +
  int8 pool vs the production bf16 XLA block (models/fast_infer._xla_block),
  with effective TFLOP/s (MACs of the conv, 2·B·T·k·Cin·Cout FLOPs) — the
  direct measurement of the v5e MXU's int8 rate against bf16 on the exact
  serving shapes.
- ``embed``: end-to-end quant_embed vs fast_embed at serving batch, plus
  min cosine fidelity.

Timing via utils/profiling (dispatch-N + one D2H fetch, 1-call baseline
subtracted — block_until_ready is not a barrier on axon; see CLAUDE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voicemap_tpu.config import EncoderConfig
from voicemap_tpu.models.encoder import ConvEncoder
from voicemap_tpu.models.fast_infer import _xla_block, fast_embed
from voicemap_tpu.models.quant_infer import (
    _quant_block,
    calibrate_scales,
    quant_embed,
    quantize_encoder,
)
from voicemap_tpu.utils.profiling import throughput

CFG = EncoderConfig(filters=int(os.environ.get("QB_FILTERS", 128)),
                    embedding_dim=64, dropout=0.0,
                    compute_dtype="bfloat16")
B = int(os.environ.get("QB_BATCH", 2048))
T_IN = int(os.environ.get("QB_T", 12000))  # 3 s @ 16 kHz, ds=4


def _setup(cfg=CFG, batch=B, t=T_IN, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((batch, t, 1)), jnp.float32)
    model = ConvEncoder(cfg)
    variables = model.init(jax.random.PRNGKey(0), x[:8], train=False)
    qvars = quantize_encoder(variables, cfg, x[:256])
    return model, variables, qvars, x


def _sec(fn, *args, iters=30):
    return throughput(jax.jit(fn), *args, items_per_call=1,
                      iters=iters)["sec_per_call"]


def bench_blocks():
    cfg = CFG
    model, variables, qvars, x = _setup()
    params, stats = variables["params"], variables["batch_stats"]
    # Feed each block its real predecessor activation (bf16 path) and the
    # int8-requantized version of the same (quant path). One jitted program
    # for the sweep — eager per-op forwards at B=2048 OOM HBM (several
    # (B,T,C) intermediates live at once; same fix as calibrate_scales).
    @jax.jit
    def _acts(x):
        h = x
        out = []
        for i in range(len(cfg.filter_multipliers)):
            out.append(h)
            h = _xla_block(h, params[f"block_{i}"],
                           stats[f"block_{i}"]["bn"], cfg.pool_sizes[i],
                           cfg.dilations[i], cfg.bn_epsilon, jnp.bfloat16)
        return out

    acts = _acts(x)
    # The calibrated inter-block input scales quant_embed actually uses
    # (round-3 advisor: recomputing block-≥2 scales from the full-B
    # activation max gave the benched blocks slightly different
    # requantization than production serving). Same 256-row calibration
    # batch as _setup's quantize_encoder → identical scales.
    scales = calibrate_scales(variables, cfg, x[:256])

    for i in range(1, len(cfg.filter_multipliers)):
        a = acts[i]
        pool, dil = cfg.pool_sizes[i], cfg.dilations[i]
        blk, bst = params[f"block_{i}"], stats[f"block_{i}"]["bn"]
        qblk = qvars["blocks"][i - 1]
        s_in = jnp.asarray(scales[i - 1], jnp.float32)
        a_q = jax.jit(
            lambda a, s: jnp.clip(
                jnp.round(a.astype(jnp.float32) / s), -127, 127
            ).astype(jnp.int8)
        )(a, s_in)
        last = i == len(cfg.filter_multipliers) - 1

        def bf16_block(a):
            return _xla_block(a, blk, bst, pool, dil, cfg.bn_epsilon,
                              jnp.bfloat16)

        def int8_block(a_q):
            return _quant_block(a_q, qblk, pool, dil, last=last,
                                out_dtype=jnp.bfloat16)

        t_bf = _sec(bf16_block, a)
        t_q = _sec(int8_block, a_q)
        k = cfg.kernel_sizes[i]
        cin = cfg.filters * cfg.filter_multipliers[i - 1]
        cout = cfg.filters * cfg.filter_multipliers[i]
        flops = 2.0 * a.shape[0] * a.shape[1] * k * cin * cout
        print(f"block {i}: bf16 {t_bf*1e3:8.3f} ms ({flops/t_bf/1e12:6.1f} "
              f"TFLOP/s) | int8 {t_q*1e3:8.3f} ms ({flops/t_q/1e12:6.1f} "
              f"TFLOP/s) | speedup {t_bf/t_q:.2f}x", flush=True)


def bench_embed():
    cfg = CFG
    model, variables, qvars, x = _setup()

    def bf16(x):
        return fast_embed(variables, cfg, x)

    def int8(x):
        return quant_embed(variables, qvars, cfg, x)

    ref = np.asarray(bf16(x[:256]), np.float64)
    out = np.asarray(int8(x[:256]), np.float64)
    cos = ((ref * out).sum(-1)
           / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
              + 1e-12))
    t_bf = _sec(bf16, x, iters=20)
    t_q = _sec(int8, x, iters=20)
    print(f"embed B={B}: bf16 {t_bf*1e3:.2f} ms ({B/t_bf:,.0f} utt/s) | "
          f"int8 {t_q*1e3:.2f} ms ({B/t_q:,.0f} utt/s) | "
          f"speedup {t_bf/t_q:.2f}x | min cosine {cos.min():.5f}",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "embed"
    if which in ("blocks", "all"):
        bench_blocks()
    if which in ("embed", "all"):
        bench_embed()
