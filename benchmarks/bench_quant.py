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


def bench_stages():
    """Per-stage share of the FULL int8 serving pipeline at serving batch:
    gather+whiten → Pallas block0(+s0 requant epilogue) → int8 blocks 1+ →
    global-max + head. Each stage timed standalone on its real predecessor
    activation, then compared against the fused end-to-end program — the
    difference is what XLA fusion across stage boundaries buys/costs."""
    from voicemap_tpu.models.fast_infer import block0_pallas_eligible
    from voicemap_tpu.models.quant_infer import _DTYPES
    from voicemap_tpu.ops.pallas_conv import pallas_conv_block0
    from voicemap_tpu.ops.pallas_preprocess import (
        decimate_store, pallas_gather_whiten,
    )

    cfg = CFG
    ds = 4
    store_t = T_IN * ds + 8000  # raw-store rows longer than the fragment
    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        rng.integers(-20000, 20000, size=(B, store_t), dtype=np.int16))
    store = decimate_store(raw, ds)
    offsets = jnp.asarray(
        rng.integers(0, (store_t - T_IN * ds) // ds, size=(B,), dtype=np.int32))
    indices = jnp.arange(B, dtype=jnp.int32)

    model, variables, qvars, _ = _setup()
    params, stats = variables["params"], variables["batch_stats"]
    cdt = _DTYPES[cfg.compute_dtype]

    def pre(store, offsets):
        return pallas_gather_whiten(store, indices, offsets, T_IN)[..., None]

    x = jax.jit(pre)(store, offsets)
    assert block0_pallas_eligible(cfg, x)
    blk, bst = params["block_0"], stats["block_0"]["bn"]

    def blk0(x):
        return pallas_conv_block0(
            x, blk["conv"]["kernel"], blk["conv"]["bias"],
            blk["bn"]["scale"], blk["bn"]["bias"], bst["mean"], bst["var"],
            cfg.bn_epsilon, pool=cfg.pool_sizes[0], gemm_dtype=cdt,
            requant_scale=qvars["s0"])

    stages = [("gather+whiten", pre, (store, offsets)),
              ("block0+requant", blk0, (x,))]
    h_q = jax.jit(blk0)(x)
    n = len(cfg.filter_multipliers)
    acts = [h_q]
    for i in range(1, n):
        qblk, pool, dil = qvars["blocks"][i - 1], cfg.pool_sizes[i], cfg.dilations[i]
        last = i == n - 1
        fn = (lambda a, qblk=qblk, pool=pool, dil=dil, last=last:
              _quant_block(a, qblk, pool, dil, last=last, out_dtype=cdt))
        stages.append((f"block{i} int8", fn, (acts[-1],)))
        acts.append(jax.jit(fn)(acts[-1]))

    emb = params["embed"]

    def head(h):
        y = jnp.max(h, axis=1)
        return (y @ emb["kernel"].astype(cdt)
                + emb["bias"].astype(cdt)).astype(jnp.float32)

    stages.append(("gmax+head", head, (acts[-1],)))

    def end_to_end(store, offsets):
        return quant_embed(variables, qvars, cfg, pre(store, offsets))

    t_e2e = _sec(end_to_end, store, offsets, iters=20)
    times = [(name, _sec(fn, *args, iters=20)) for name, fn, args in stages]
    total = sum(t for _, t in times)
    for name, t in times:
        print(f"{name:>16}: {t*1e3:8.3f} ms  {t/total*100:5.1f}% of stage sum",
              flush=True)
    print(f"{'stage sum':>16}: {total*1e3:8.3f} ms")
    print(f"{'end-to-end':>16}: {t_e2e*1e3:8.3f} ms ({B/t_e2e:,.0f} utt/s; "
          f"fusion across boundaries: {(total-t_e2e)*1e3:+.3f} ms)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "embed"
    if which in ("blocks", "all"):
        bench_blocks()
    if which in ("embed", "all"):
        bench_embed()
    if which in ("stages", "all"):
        bench_stages()
