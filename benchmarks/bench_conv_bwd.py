"""Attribution of blocks-1+ TRAIN backward components, per candidate impl.

The round-3 roofline (BASELINE.md) shows blocks 1-3 training at 20-45% of
v5e bf16 peak with the remainder "inside XLA's conv-backprop emitters".
This bench decomposes one block's train cost into its pieces and times
XLA-GEMM reformulations of the backward convolutions, to decide what a
bwd-specific Mosaic kernel must beat:

    fwd        conv+bias+relu forward (XLA conv emitter)
    route      pooled-cotangent routing + BN-affine fold -> dz (elementwise)
    dw_conv    weight grad via XLA's conv transpose (what autodiff emits)
    dx_conv    input grad via XLA's conv transpose
    dw_gemm    weight grad as k explicit shifted GEMMs (dot_general)
    dx_gemm    input grad as one (B*T, C) @ (C, k*Cin) GEMM + shifted adds
    bwd_all    route+dw_conv+dx_conv composed in one jit (XLA fusion view)

Usage: python benchmarks/bench_conv_bwd.py [block_idx] [B]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voicemap_tpu.ops.pallas_routing import pallas_route_bwd
from voicemap_tpu.utils.profiling import time_fn

# (T_in, Cin, C) at the encoder's block inputs for the baseline config
# (3 s @ 16 kHz, downsampling 4 -> T=12000; block 0 pools by 4).
BLOCKS = {1: (3000, 128, 256), 2: (1500, 256, 384), 3: (750, 384, 512)}
K = 3
POOL = 2


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"),
    )


def make_fns(T, cin, c, dtype=jnp.bfloat16):
    def fwd(x, w, b):
        return jax.nn.relu(_conv(x, w) + b)

    def route(a, g, c0, c1, c2, sgn):
        B = a.shape[0]
        ar = a.reshape(B, T // POOL, POOL, c)
        best = jnp.max(sgn[None, None, None, :] * ar, axis=2)
        taken = jnp.zeros(best.shape, bool)
        routed = []
        for j in range(POOL):
            eq = (sgn[None, None, :] * ar[:, :, j, :] == best) & ~taken
            routed.append(jnp.where(eq, g, 0.0))
            taken = taken | eq
        g_full = jnp.stack(routed, axis=2).reshape(B, T, c)
        da = c0 * g_full + c1 + c2 * a
        return jnp.where(a > 0, da, jnp.zeros((), dtype))

    def dw_conv(x, w, dz):
        (dw,) = jax.linear_transpose(lambda w_: _conv(x, w_), w)(dz)
        return dw

    def dx_conv(x, w, dz):
        (dx,) = jax.linear_transpose(lambda x_: _conv(x_, w), x)(dz)
        return dx

    def dw_gemm(x, w, dz):
        # dW[j] = sum_{B,t} x[t + j - (K//2)] (x) dz[t]  -- one reduction
        # GEMM per tap over the flattened (B*T) axis, SAME zero edges.
        B = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (K // 2, K // 2), (0, 0)))
        dzf = dz.reshape(B * T, c)
        taps = []
        for j in range(K):
            xj = jax.lax.dynamic_slice_in_dim(xp, j, T, axis=1)
            taps.append(
                jax.lax.dot_general(
                    xj.reshape(B * T, cin), dzf,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        return jnp.stack(taps, axis=0)

    def dx_gemm(x, w, dz):
        # dx[t] = sum_j dz[t - j + K//2] @ W[j]^T: one wide GEMM into
        # (B*T, K*Cin) then K shifted adds.
        B = dz.shape[0]
        wflat = w.reshape(K * cin, c)  # (k*cin, c)
        y = jax.lax.dot_general(
            dz.reshape(B * T, c), wflat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, T, K, cin)
        yp = jnp.pad(y, ((0, 0), (K // 2, K // 2), (0, 0), (0, 0)))
        dx = jnp.zeros((B, T, cin), jnp.float32)
        for j in range(K):
            # contribution of tap j lands at t = t_dz + (K//2 - j)
            dx = dx + jax.lax.dynamic_slice_in_dim(
                yp[:, :, j, :], K - 1 - j, T, axis=1
            )
        return dx.astype(dtype)

    def bwd_all(x, w, a, g, c0, c1, c2, sgn):
        dz = route(a, g, c0, c1, c2, sgn).astype(dtype)
        return dw_conv(x, w, dz), dx_conv(x, w, dz)

    def fwd_pool(x, w, b, sgn):
        """Forward epilogue, lane-view: a → (a_sel, idx, Σa, Σa²).

        (B, T, C) → (B, T/pool, pool·C) is a free row-major reshape; the
        pool phases become static lane slices at C-multiples, so the max,
        the argmax index, and the stat reductions all fuse into one pass —
        no 4-D stack, no cross-phase `taken` chain.
        """
        a = jax.nn.relu(_conv(x, w) + b)
        B = a.shape[0]
        al = a.reshape(B, T // POOL, POOL * c)
        best = sgn * al[:, :, :c]
        idx = jnp.zeros(best.shape, jnp.int8)
        for j in range(1, POOL):
            sj = sgn * al[:, :, j * c:(j + 1) * c]
            gt = sj > best
            best = jnp.where(gt, sj, best)
            idx = jnp.where(gt, jnp.int8(j), idx)
        af = a.astype(jnp.float32)
        return (sgn * best, idx,
                jnp.sum(af, axis=(0, 1)), jnp.sum(af * af, axis=(0, 1)))

    def route_idx(a, idx, g, c0, c1, c2):
        """Backward routing from the stored argmax index, lane-view."""
        B = a.shape[0]
        al = a.reshape(B, T // POOL, POOL * c)
        parts = []
        for j in range(POOL):
            aj = al[:, :, j * c:(j + 1) * c]
            gj = jnp.where(idx == j, g, jnp.zeros((), dtype))
            daj = (c0.astype(dtype) * gj + c1.astype(dtype)
                   + c2.astype(dtype) * aj)
            parts.append(jnp.where(aj > 0, daj, jnp.zeros((), dtype)))
        return jnp.concatenate(parts, axis=2).reshape(B, T, c)

    def bwd_all_idx(x, w, a, idx, g, c0, c1, c2):
        dz = route_idx(a, idx, g, c0, c1, c2)
        return dw_conv(x, w, dz), dx_conv(x, w, dz)

    return dict(fwd=fwd, route=route, dw_conv=dw_conv, dx_conv=dx_conv,
                dw_gemm=dw_gemm, dx_gemm=dx_gemm, bwd_all=bwd_all,
                fwd_pool=fwd_pool, route_idx=route_idx,
                bwd_all_idx=bwd_all_idx)


def main(block_idx=1, B=512):
    T, cin, c = BLOCKS[block_idx]
    dtype = jnp.bfloat16
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, T, cin)), dtype)
    w = jnp.asarray(r.standard_normal((K, cin, c)) * 0.05, dtype)
    b = jnp.asarray(r.standard_normal((c,)), dtype)
    # bf16 cotangent: the production path carries pool-rate cotangents in
    # bf16; f32 here quadruples the routing intermediates and OOMs B>=1024.
    g = jnp.asarray(r.standard_normal((B, T // POOL, c)), dtype)
    c0 = jnp.asarray(r.standard_normal((c,)), jnp.float32)
    c1 = jnp.asarray(r.standard_normal((c,)) * 1e-3, jnp.float32)
    c2 = jnp.asarray(r.standard_normal((c,)) * 1e-3, jnp.float32)
    sgn = jnp.sign(c0) + (c0 == 0)
    fns = make_fns(T, cin, c, dtype)
    a = jax.jit(fns["fwd"])(x, w, b)
    dz = jax.jit(fns["route"])(a, g, c0, c1, c2,
                               sgn.astype(dtype)).astype(dtype)
    asel, idx, _, _ = jax.jit(fns["fwd_pool"])(x, w, b, sgn.astype(dtype))

    gemm_tflop = 2 * B * T * K * cin * c / 1e12
    print(f"block {block_idx}: B={B} T={T} Cin={cin} C={c}; "
          f"one conv GEMM = {gemm_tflop:.3f} TFLOP", flush=True)

    cases = [
        ("fwd", fns["fwd"], (x, w, b)),
        ("route", lambda a_, g_: fns["route"](a_, g_, c0, c1, c2,
                                              sgn.astype(dtype)), (a, g)),
        ("dw_conv", fns["dw_conv"], (x, w, dz)),
        ("dx_conv", fns["dx_conv"], (x, w, dz)),
        ("dw_gemm", fns["dw_gemm"], (x, w, dz)),
        ("dx_gemm", fns["dx_gemm"], (x, w, dz)),
        ("bwd_all", lambda x_, w_, a_, g_: fns["bwd_all"](
            x_, w_, a_, g_, c0, c1, c2, sgn.astype(dtype)), (x, w, a, g)),
        ("fwd_pool", lambda x_, w_, b_: fns["fwd_pool"](
            x_, w_, b_, sgn.astype(dtype)), (x, w, b)),
        ("route_idx", lambda a_, i_, g_: fns["route_idx"](
            a_, i_, g_, c0, c1, c2), (a, idx, g)),
        ("route_plls", lambda a_, s_, g_: pallas_route_bwd(
            a_, s_, g_, c0, c1, c2, POOL, out_dtype=dtype), (a, asel, g)),
        ("bwd_all_idx", lambda x_, w_, a_, i_, g_: fns["bwd_all_idx"](
            x_, w_, a_, i_, g_, c0, c1, c2), (x, w, a, idx, g)),
    ]
    for name, fn, args in cases:
        jf = jax.jit(fn)
        t = time_fn(jf, *args, iters=20, passes=3)["mean_s"]
        flops = {"fwd": 1, "dw_conv": 1, "dx_conv": 1, "dw_gemm": 1,
                 "dx_gemm": 1, "bwd_all": 2, "fwd_pool": 1,
                 "bwd_all_idx": 2}.get(name, 0) * gemm_tflop
        eff = f"  ({flops / t:6.1f} TFLOP/s)" if flops else ""
        print(f"  {name:8s}: {t*1e3:7.2f} ms{eff}", flush=True)


if __name__ == "__main__":
    main(
        block_idx=int(sys.argv[1]) if len(sys.argv) > 1 else 1,
        B=int(sys.argv[2]) if len(sys.argv) > 2 else 1024,
    )
