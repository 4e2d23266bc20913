"""Stage attribution for the fused int8 mid-block Pallas kernel.

The full kernel (ops/pallas_quant_block) measured 27.1 ms on block 1 vs
XLA's 8.7 ms despite the raw int8 MXU rate probing at 322 TOP/s — and the
time is flat across t_len, i.e. proportional VPU work, not per-chunk
latency. This harness re-times kernel prefixes to attribute the loss:

  stage 1: DMA + the (t_len+2, Cin) @ (Cin, 3*Cout) int8 dot only
  stage 2: + the two sublane-shifted int32 adds (the k=3 tap sum)
  stage 3: + pair reshape + max/min pooling trees (int32)
  stage 4: + f32 epilogue, requant, masks (the full production kernel)

and one redesign candidate:

  xk     : taps folded into the GEMM K dim — X3 = lane-concat of the
           three int8 shifts (t_len, 3*Cin) @ (3*Cin, Cout); kills the
           3-wide int32 P and both shifted adds at the cost of two int8
           relayout copies.

Timing only — stages 1-3 write garbage (prefix values), no parity check.
Run: ``python benchmarks/bench_qblock_attrib.py [block]``.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voicemap_tpu.ops.pallas_quant_block import _term
from voicemap_tpu.utils.profiling import throughput

B = int(os.environ.get("QB_BATCH", 2048))
SHAPES = {1: (128, 256, 3000), 2: (256, 512, 1500), 3: (512, 1024, 750)}


def _kernel_staged(x_ref, w_ref, aff_ref, o_ref, *, b_blk, t_len, n_ch,
                   c_out, t_valid, stage):
    alpha = aff_ref[0, :]
    beta = aff_ref[1, :]
    gamma = aff_ref[2, :]
    pos = alpha > 0.0
    u_ch = t_len // 2
    for r in range(b_blk):
        row = x_ref[r]
        for cc in range(n_ch):
            base = cc * t_len
            u_base = base // 2
            lo_edge = cc == 0
            start = base - (0 if lo_edge else 1)
            stop = min(base + t_len + 1, row.shape[0])
            x_ext = row[start:stop]
            P = jax.lax.dot_general(
                x_ext, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if stage == 1:
                out = P[:u_ch, :c_out].astype(o_ref.dtype)
                o_ref[r, u_base: u_base + u_ch, :] = out
                continue
            off = 0 if lo_edge else 1
            acc = _term(P, off - 1, t_len, 0, c_out)
            acc = acc + _term(P, off, t_len, 1, c_out)
            acc = acc + _term(P, off + 1, t_len, 2, c_out)
            if stage == 2:
                o_ref[r, u_base: u_base + u_ch, :] = (
                    acc[:u_ch].astype(o_ref.dtype))
                continue
            pairs = acc.reshape(u_ch, 2 * c_out)
            pmax = jnp.maximum(pairs[:, :c_out], pairs[:, c_out:])
            pmin = jnp.minimum(pairs[:, :c_out], pairs[:, c_out:])
            if stage == 3:
                o_ref[r, u_base: u_base + u_ch, :] = (
                    jnp.minimum(pmax, pmin).astype(o_ref.dtype))
                continue
            sel = jnp.where(pos[None, :], pmax, pmin).astype(jnp.float32)
            z = jax.nn.relu(sel + beta[None, :]) * alpha[None, :] \
                + gamma[None, :]
            out = jnp.clip(jnp.round(z), -127, 127).astype(o_ref.dtype)
            o_ref[r, u_base: u_base + u_ch, :] = out


def _kernel_xk(x_ref, w3_ref, aff_ref, o_ref, *, b_blk, t_len, n_ch, c_in,
               c_out, t_valid):
    """Taps in the GEMM K dim: X3 (t_len, 3*Cin) @ W3 (3*Cin, Cout)."""
    alpha = aff_ref[0, :]
    beta = aff_ref[1, :]
    gamma = aff_ref[2, :]
    pos = alpha > 0.0
    u_ch = t_len // 2
    zrow = jnp.zeros((1, c_in), jnp.int8)
    for r in range(b_blk):
        row = x_ref[r]
        rows = row.shape[0]
        for cc in range(n_ch):
            base = cc * t_len
            u_base = base // 2
            lo = (jnp.concatenate([zrow, row[: t_len - 1]], 0) if cc == 0
                  else row[base - 1: base + t_len - 1])
            mid = row[base: base + t_len]
            hi = (jnp.concatenate([row[base + 1: rows], zrow], 0)
                  if base + t_len + 1 > rows
                  else row[base + 1: base + t_len + 1])
            x3 = jnp.concatenate([lo, mid, hi], axis=1)  # (t_len, 3*Cin)
            acc = jax.lax.dot_general(
                x3, w3_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (t_len, Cout)
            pairs = acc.reshape(u_ch, 2 * c_out)
            pmax = jnp.maximum(pairs[:, :c_out], pairs[:, c_out:])
            pmin = jnp.minimum(pairs[:, :c_out], pairs[:, c_out:])
            sel = jnp.where(pos[None, :], pmax, pmin).astype(jnp.float32)
            z = jax.nn.relu(sel + beta[None, :]) * alpha[None, :] \
                + gamma[None, :]
            out = jnp.clip(jnp.round(z), -127, 127).astype(o_ref.dtype)
            o_ref[r, u_base: u_base + u_ch, :] = out


def main(block=1, t_len=256, b_blk=4):
    cin, cout, t = SHAPES[block]
    rng = np.random.default_rng(0)
    t_pad = -(-t // 256) * 256
    xp = jnp.asarray(
        rng.integers(-127, 128, (B, t_pad, cin)).astype(np.int8))
    w = rng.integers(-127, 128, (3, cin, cout)).astype(np.int8)
    wcat = jnp.asarray(np.concatenate([w[0], w[1], w[2]], 1))
    w3 = jnp.asarray(np.concatenate([w[0], w[1], w[2]], 0))  # (3Cin, Cout)
    aff = jnp.asarray(rng.standard_normal((8, cout)), jnp.float32)
    n_ch = t_pad // t_len
    ops = 2 * B * t * 3 * cin * cout

    def run(kern, wop, extra):
        @jax.jit
        def fn(xp):
            return pl.pallas_call(
                functools.partial(kern, b_blk=b_blk, t_len=t_len, n_ch=n_ch,
                                  c_out=cout, t_valid=t, **extra),
                grid=(B // b_blk,),
                in_specs=[
                    pl.BlockSpec((b_blk, t_pad, cin), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(wop.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(aff.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((b_blk, t_pad // 2, cout),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, t_pad // 2, cout),
                                               jnp.int8),
            )(xp, wop, aff)
        return fn

    print(f"block {block}: t_len={t_len} b_blk={b_blk} n_ch={n_ch}")
    prev = 0.0
    for stage in (1, 2, 3, 4):
        fn = run(_kernel_staged, wcat, {"stage": stage})
        try:
            r = throughput(fn, xp, items_per_call=1, iters=20)
        except Exception as e:  # noqa: BLE001
            print(f"  stage {stage}: FAILS — {type(e).__name__}")
            continue
        ms = r["sec_per_call"] * 1e3
        print(f"  stage {stage}: {ms:8.3f} ms  (+{ms - prev:6.3f})  "
              f"{ops/r['sec_per_call']/1e12:5.1f} TOP/s", flush=True)
        prev = ms
    fn = run(_kernel_xk, w3, {"c_in": cin})
    try:
        r = throughput(fn, xp, items_per_call=1, iters=20)
        ms = r["sec_per_call"] * 1e3
        print(f"  xk (K-fold): {ms:8.3f} ms  "
              f"{ops/r['sec_per_call']/1e12:5.1f} TOP/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  xk: FAILS — {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         int(sys.argv[2]) if len(sys.argv) > 2 else 256)
