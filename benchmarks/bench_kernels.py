"""Kernel microbenchmarks on the attached accelerator: jnp vs Pallas variants.

Run: ``python benchmarks/bench_kernels.py`` (TPU). Verifies compiled-mode
parity against the jnp reference first, then times each variant. Used to pick
the production preprocessing variant (see ops/pallas_preprocess.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voicemap_tpu.ops import distance as dist_ops
from voicemap_tpu.ops import melspec
from voicemap_tpu.ops import preprocess
from voicemap_tpu.ops.pallas_distance import pallas_l1
from voicemap_tpu.ops.pallas_melspec import pallas_log_mel
from voicemap_tpu.ops.pallas_preprocess import (
    pad_store,
    pallas_preprocess,
    quantize_offsets,
)


def timeit(fn, *args, iters=100, warmup=3):
    # block_until_ready does not synchronize on the axon remote platform;
    # time via dispatch-N + one D2H value fetch, 1-call baseline subtracted
    # (see voicemap_tpu/utils/profiling.py).
    from voicemap_tpu.utils.profiling import throughput

    return throughput(fn, *args, items_per_call=1, iters=iters,
                      warmup=warmup)["sec_per_call"]


def bench_preprocess():
    rng = np.random.default_rng(0)
    N, T_store = 2048, 96000  # 6 s @ 16 kHz store rows
    B, frag, ds = 256, 48000, 4
    store_raw = jnp.asarray(rng.integers(-30000, 30000, (N, T_store), dtype=np.int16))
    store = pad_store(store_raw)
    idx = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    offs = quantize_offsets(
        jnp.asarray(rng.integers(0, T_store - frag, B).astype(np.int32))
    )

    @jax.jit
    def jnp_chain(store, idx, offs):
        rows = preprocess.gather_fragments(store, idx, offs, frag)
        rows = rows.astype(jnp.float32) * (1.0 / 32768.0)
        rows = preprocess.stride_decimate(rows, ds)
        return preprocess.whiten(rows)[..., None]

    ref = np.asarray(jnp_chain(store, idx, offs))
    results = {"jnp": timeit(jnp_chain, store, idx, offs)}

    def f(store, idx, offs):
        return pallas_preprocess(store, idx, offs, frag, ds)

    out = np.asarray(f(store, idx, offs))
    err = np.max(np.abs(out - ref))
    print(f"preprocess[pallas raw] max|Δ| vs jnp = {err:.2e}")
    results["pallas_raw"] = timeit(f, store, idx, offs)

    # Fast path: once-decimated store, fully fused gather+whiten.
    from voicemap_tpu.ops.pallas_preprocess import decimate_store

    store_ds = decimate_store(store_raw, ds)
    offs_al = (offs // (128 * ds)) * (128 * ds)  # comparable grid

    def g(store_ds, idx, offs):
        return pallas_preprocess(store_ds, idx, offs, frag, ds,
                                 store_predecimated=True)

    ref2 = np.asarray(jnp_chain(store, idx, offs_al))
    out2 = np.asarray(g(store_ds, idx, offs_al))
    print(f"preprocess[pallas predec] max|Δ| vs jnp = {np.max(np.abs(out2 - ref2)):.2e}")
    results["pallas_predecimated"] = timeit(g, store_ds, idx, offs_al)

    bw = B * frag * 2 / 1e9
    for k, v in results.items():
        print(f"preprocess[{k}]: {v * 1e3:.3f} ms  ({bw / v:.1f} GB/s raw-window equiv)")
    return results


def bench_melspec():
    from voicemap_tpu.config import MelConfig

    cfg = MelConfig()
    rng = np.random.default_rng(2)
    B, T = 64, 48000
    x = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    jnp_mel = jax.jit(lambda x: melspec.log_mel_spectrogram(x, cfg, 16000))
    ref = np.asarray(jnp_mel(x))
    out = np.asarray(pallas_log_mel(x, cfg, 16000))
    print(f"melspec max|Δ| vs jnp = {np.max(np.abs(out - ref)):.2e}")
    t_jnp = timeit(jnp_mel, x)
    t_pl = timeit(lambda x: pallas_log_mel(x, cfg, 16000), x)
    print(f"melspec[jnp rfft]: {t_jnp * 1e3:.3f} ms | melspec[pallas dft-matmul]: "
          f"{t_pl * 1e3:.3f} ms  (B={B}, T={T})")
    return {"jnp": t_jnp, "pallas": t_pl}


def bench_l1(nq=512, ns=2048, d=64):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((nq, d)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((ns, d)), jnp.float32)

    jnp_l1 = jax.jit(dist_ops.pairwise_l1)
    ref = np.asarray(jnp_l1(q, s))
    out = np.asarray(pallas_l1(q, s))
    print(f"l1 max|Δ| vs jnp = {np.max(np.abs(out - ref)):.2e}")
    t_jnp = timeit(jnp_l1, q, s)
    t_pl = timeit(lambda q, s: pallas_l1(q, s), q, s)
    print(f"l1[jnp broadcast]: {t_jnp * 1e3:.3f} ms | l1[pallas tiled]: {t_pl * 1e3:.3f} ms "
          f"({nq}x{ns}x{d})")
    return {"jnp": t_jnp, "pallas": t_pl}


def bench_conv_train(Bb=2048, T=12000, C=128, K=32, POOL=4):
    """Fused block-0 TRAIN step (fwd+bwd) vs the flax/XLA emitter."""
    from voicemap_tpu.models.encoder import ConvBlock
    from voicemap_tpu.ops.conv_train import make_fused_block0_train

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((Bb, T, 1)), jnp.float32)
    blk = ConvBlock(
        features=C, kernel_size=K, pool_size=POOL, dropout=0.0,
        compute_dtype=jnp.bfloat16, param_dtype=jnp.float32, bn_epsilon=1e-3,
    )
    variables = blk.init(jax.random.PRNGKey(0), x[:2], train=False)
    params, bs = variables["params"], variables["batch_stats"]

    # loss = ½Σout² gives a dense pool-rate cotangent (g = out) without
    # baking a (B, T/pool, C) constant into the program.
    @jax.jit
    def flax_step(p, x):
        def loss(p):
            out, _ = blk.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
            out = out.astype(jnp.float32)
            return 0.5 * jnp.sum(out * out)
        return jax.grad(loss)(p)

    def make_step(impl, gemm, sel):
        fn = make_fused_block0_train(POOL, 1e-3, impl=impl,
                                     gemm_dtype=gemm, sel_dtype=sel)

        @jax.jit
        def step(p, x):
            def loss(p):
                out, mu, var = fn(
                    x, p["conv"]["kernel"], p["conv"]["bias"],
                    p["bn"]["scale"], p["bn"]["bias"],
                )
                return 0.5 * jnp.sum(out * out)
            return jax.grad(loss)(p)
        return step

    pl_step = make_step("pallas", "bfloat16", "bfloat16")

    # Parity at a size the materializing flax backward handles comfortably.
    xs = x[:256]
    ref = flax_step(params, xs)
    got = pl_step(params, xs)
    dk = np.max(np.abs(np.asarray(got["conv"]["kernel"] - ref["conv"]["kernel"])))
    rel = dk / (np.max(np.abs(np.asarray(ref["conv"]["kernel"]))) + 1e-9)
    print(f"conv_train[fused-pallas] max|Δdw| = {dk:.2e} (rel {rel:.2e}, B=256)")
    t_flax = timeit(flax_step, params, x, iters=10)
    t_pl = timeit(pl_step, params, x, iters=10)
    print(
        f"conv_train fwd+bwd[flax/XLA]: {t_flax * 1e3:.2f} ms | "
        f"[fused-pallas]: {t_pl * 1e3:.2f} ms  (B={Bb}, T={T}, C={C})"
    )
    return {"flax": t_flax, "fused_pallas": t_pl}


def bench_blockn(Bb=2048):
    """Blocks 1–3 of the production encoder: XLA emitter vs streamed kernel."""
    from voicemap_tpu.models.fast_infer import _xla_block
    from voicemap_tpu.ops.pallas_conv import pallas_conv_blockn_streamed

    rng = np.random.default_rng(3)
    shapes = [  # (T, Cin, Cout) for blocks 1..3 at T_model=12000 (3 s, ds 4)
        (3000, 128, 256), (1500, 256, 384), (750, 384, 512),
    ]
    totals = {"xla": 0.0, "streamed": 0.0}
    for T, ci, co in shapes:
        x = jnp.asarray(rng.standard_normal((Bb, T, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, ci, co)) * 0.05, jnp.float32)
        b = jnp.zeros((co,), jnp.float32)
        sc = jnp.ones((co,), jnp.float32)
        bi = jnp.zeros((co,), jnp.float32)
        mu = jnp.zeros((co,), jnp.float32)
        va = jnp.ones((co,), jnp.float32)

        @jax.jit
        def xla(x):
            blk = {"conv": {"kernel": w, "bias": b},
                   "bn": {"scale": sc, "bias": bi}}
            return _xla_block(x, blk, {"mean": mu, "var": va}, 2, 1, 1e-3,
                              jnp.bfloat16)

        @jax.jit
        def streamed(x):
            return pallas_conv_blockn_streamed(x, w, b, sc, bi, mu, va, 1e-3)

        # Parity on a 4-row slice: D2H of the full (B, T, C') output over
        # the tunnel takes minutes; the slice still forces full execution.
        ref = np.asarray(xla(x)[:4], np.float32)
        got = np.asarray(streamed(x)[:4], np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        t_x = timeit(xla, x, iters=20)
        t_s = timeit(streamed, x, iters=20)
        totals["xla"] += t_x
        totals["streamed"] += t_s
        print(f"blockn T={T} {ci}->{co}: xla {t_x*1e3:.2f} ms | "
              f"streamed {t_s*1e3:.2f} ms  (rel err {err:.1e})")
    print(f"blockn total: xla {totals['xla']*1e3:.2f} ms | "
          f"streamed {totals['streamed']*1e3:.2f} ms  (B={Bb})")
    return totals


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "parts", nargs="*",
        default=["preprocess", "l1", "melspec", "conv_train", "blockn"],
    )
    a = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    if "preprocess" in a.parts:
        bench_preprocess()
    if "l1" in a.parts:
        bench_l1()
    if "melspec" in a.parts:
        bench_melspec()
    if "conv_train" in a.parts:
        bench_conv_train()
    if "blockn" in a.parts:
        bench_blockn()
