"""Batch-1 single-request device-time attribution (r4 verdict #8).

The headline bench decomposes single-request latency into transport RTT
(tunnel, ~25-40 ms on axon, structural) + device time, and the device
share at batch 1 measures ~0.5-1.5 ms p50 — 5-15x the 0.098-0.13 ms
steady-state slope of the SAME program. This harness attributes that gap
by timing jitted PREFIXES of the batch-1 serving program two ways each:

  single : dispatch -> result-in-host-memory, minus the same run's
           null-fetch RTT p50 (what one isolated request pays on-device,
           including program launch / infeed prologue)
  slope  : 400-iteration pipelined dispatch slope (device occupancy per
           call when launches overlap — the steady-state number)

Prefixes (all batch 1, bf16 — the dtype-by-batch serving policy):

  null      : jitted x+1 on (1,)          — launch floor, device ~ 0
  gather    : pallas_gather_whiten only (block_rows=1, the batch-1 path)
  gather8   : same with block_rows=8 on 8 padded copies (is the rows=1
              Mosaic specialization itself slow?)
  block0    : gather + fused Pallas conv block 0
  trunk     : gather + all conv blocks (no head)
  full      : the serving program (== bench.py's embed_one)

single(prefix_k) - single(prefix_{k-1}) attributes per-stage isolated
cost; single(null) attributes pure launch overhead; (single - slope) per
prefix is the non-overlappable prologue that pipelining hides.

Run on the chip: ``python benchmarks/bench_batch1.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import DOWNSAMPLING, FRAG, STORE_T, make_model_and_params
from voicemap_tpu.models.fast_infer import _xla_block, fast_embed
from voicemap_tpu.ops.pallas_conv import pallas_conv_block0
from voicemap_tpu.ops.pallas_preprocess import (
    decimate_store, pallas_gather_whiten,
)
from voicemap_tpu.utils import profiling

SAMPLES = int(os.environ.get("B1_SAMPLES", 30))


def _prefixes():
    model, variables = make_model_and_params("bfloat16")
    cfg = model.cfg
    rng = np.random.default_rng(0)
    store = decimate_store(jnp.asarray(
        rng.integers(-20000, 20000, (8, STORE_T), np.int16)), DOWNSAMPLING)
    offs = jnp.asarray(
        rng.integers(0, (STORE_T - FRAG) // DOWNSAMPLING, (8,), np.int32))
    one_store, one_off = store[:1], offs[:1]
    t_out = FRAG // DOWNSAMPLING
    one_idx = jnp.zeros((1,), jnp.int32)
    idx8 = jnp.arange(8, dtype=jnp.int32)
    params = variables["params"]
    stats = variables["batch_stats"]

    def gather(s, o):
        return pallas_gather_whiten(s, one_idx, o, t_out, block_rows=1)

    def block0(s, o):
        x = gather(s, o)[..., None]
        blk, bst = params["block_0"], stats["block_0"]["bn"]
        return pallas_conv_block0(
            x, blk["conv"]["kernel"], blk["conv"]["bias"],
            blk["bn"]["scale"], blk["bn"]["bias"], bst["mean"], bst["var"],
            cfg.bn_epsilon, pool=cfg.pool_sizes[0],
            out_dtype=jnp.bfloat16, gemm_dtype=jnp.bfloat16)

    def trunk(s, o):
        h = block0(s, o)
        for i in range(1, len(cfg.filter_multipliers)):
            h = _xla_block(h, params[f"block_{i}"], stats[f"block_{i}"]["bn"],
                           cfg.pool_sizes[i], cfg.dilations[i],
                           cfg.bn_epsilon, jnp.bfloat16)
        return h

    def full(s, o):
        x = gather(s, o)[..., None]
        return fast_embed(variables, cfg, x)

    def gather8(s, o):
        return pallas_gather_whiten(s, idx8, o, t_out, block_rows=8)

    return [
        ("null", jax.jit(lambda s, o: s[0, :1].astype(jnp.float32) + 1.0),
         (one_store, one_off)),
        ("gather (rows=1)", jax.jit(gather), (one_store, one_off)),
        ("gather8 (rows=8)", jax.jit(gather8), (store, offs)),
        ("block0", jax.jit(block0), (one_store, one_off)),
        ("trunk", jax.jit(trunk), (one_store, one_off)),
        ("full", jax.jit(full), (one_store, one_off)),
    ]


def main():
    rows = []
    rtt = profiling.null_fetch_rtt(samples=SAMPLES)
    print(f"null-fetch RTT p50 {rtt['p50_s']*1e3:.2f} ms / "
          f"p95 {rtt['p95_s']*1e3:.2f} ms (transport alone)")
    for name, fn, args in _prefixes():
        single = profiling.single_request_latency(
            fn, *args, samples=SAMPLES)
        slope = profiling.time_fn(fn, *args, iters=400, passes=3)
        dev = max(single["p50_s"] - rtt["p50_s"], 0.0) * 1e3
        rows.append((name, dev, slope["mean_s"] * 1e3))
        print(f"  {name:>16}: single-dispatch device "
              f"{dev:7.3f} ms | pipelined slope {slope['mean_s']*1e3:7.3f} "
              f"ms | prologue gap {dev - slope['mean_s']*1e3:7.3f} ms",
              flush=True)
    print("\nstage deltas (single-dispatch, successive prefixes):")
    for (n0, d0, _), (n1, d1, _) in zip(rows[3:], rows[4:]):
        print(f"  {n1} - {n0}: {d1 - d0:+.3f} ms")
    # re-sample RTT at the end: tunnel drift over the run shows up here
    rtt2 = profiling.null_fetch_rtt(samples=SAMPLES)
    print(f"null-fetch RTT p50 at end {rtt2['p50_s']*1e3:.2f} ms "
          f"(drift {1e3*(rtt2['p50_s']-rtt['p50_s']):+.2f} ms)")


if __name__ == "__main__":
    main()
