"""Block-0 serving-kernel variant shootout (int8 path, requant epilogue).

The round-4 per-stage bench (bench_quant.py stages) prices block 0 at 23%
of the int8 serving pipeline and ~2.4× off its skinny-GEMM roof — the gap
is VPU work (frame-matrix build + in-VMEM transpose), not MXU or HBM. This
bench measures the candidate fixes on the exact serving shape:

- ``vpu_t``    — production kernel (explicit Fᵀ→F transpose, jnp.dot).
- ``dotg``     — same kernel, ``lax.dot_general`` contracting Fᵀ's sublane
                 dim directly (Mosaic streams a dim-0-contracting lhs into
                 the MXU without the VPU transpose — if it lowers).
- ``xla_phase``— no Pallas: the pooled GEMM re-expressed as an XLA conv on
                 the phase tensor x4p (B, T/pool, pool) with a (9, pool,
                 pool·C) restacked kernel (same K=40 contraction, framing
                 done by the conv emitter), epilogue + group-max + requant
                 left to XLA fusion.
- ``xla_plain``— reference formulation (full-rate conv + pool + requant),
                 the known-slow baseline the Pallas kernel replaced.

Each variant is checked against the production kernel's int8 output before
timing (≤0.1% of elements may differ by 1 from round-to-nearest ties moving
across contraction orders). Sweeps: ``t_chunk`` ∈ {512, 1024, 2048},
``block_rows`` ∈ {4, 8, 16} on the winner.

Run on the chip: ``python benchmarks/bench_block0_variants.py [sweep]``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voicemap_tpu.ops.pallas_conv import pallas_conv_block0
from voicemap_tpu.utils.profiling import throughput

B = int(os.environ.get("B0_BATCH", 2048))
T = int(os.environ.get("B0_T", 12000))
K = 32
C = 128
POOL = 4


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T)) * 0.04, jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 1, C)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.01, jnp.float32)
    bn_scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal((C,)), jnp.float32)
    bn_bias = jnp.asarray(0.05 * rng.standard_normal((C,)), jnp.float32)
    bn_mean = jnp.asarray(0.02 * rng.standard_normal((C,)), jnp.float32)
    bn_var = jnp.asarray(1.0 + 0.2 * rng.random((C,)), jnp.float32)
    s0 = jnp.asarray(0.02 + 0.01 * rng.random((C,)), jnp.float32)
    return x, (w, b, bn_scale, bn_bias, bn_mean, bn_var), s0


def _phase_conv_weights(w, pool):
    """w (k,1,C) → W (S, pool, pool·C) for the phase-tensor conv.

    y[pool·p + j] = Σ_m w[m] x[pool·p + j + m − pad_l]; with the input index
    written pool·(p+s) + r this is a conv over p: kernel tap (s, r, j·C+c) =
    w[pool·s + r − j + pad_l, c]. S covers every s with any in-range tap.
    """
    k, _, c = w.shape
    pad_l = (k - 1) // 2
    # s bounds: ∃(r,j) with 0 ≤ pool·s + r − j + pad_l < k, r−j ∈ ±(pool−1)
    s_lo = -((pool - 1 + pad_l) // pool)
    s_hi = (k - 1 - pad_l + pool - 1) // pool
    S = s_hi - s_lo + 1
    wf = np.asarray(w[:, 0, :], np.float32)
    W = np.zeros((S, pool, pool * c), np.float32)
    for si in range(S):
        s = s_lo + si
        for r in range(pool):
            for j in range(pool):
                m = pool * s + r - j + pad_l
                if 0 <= m < k:
                    W[si, r, j * c : (j + 1) * c] = wf[m]
    return jnp.asarray(W), s_lo, S


def make_xla_phase(x, params, s0, pool=POOL):
    w, b, g, beta, mean, var = params
    Wp, s_lo, S = _phase_conv_weights(w, pool)
    inv = jax.lax.rsqrt(var + 1e-3) * g
    bias4 = jnp.tile(b, pool).astype(jnp.float32)
    mul4 = jnp.tile(inv, pool).astype(jnp.float32)
    add4 = jnp.tile(beta - mean * inv, pool).astype(jnp.float32)
    inv_s0 = (1.0 / s0).astype(jnp.float32)
    c = w.shape[-1]

    @jax.jit
    def fn(x):
        P = x.shape[1] // pool
        x4p = x.reshape(x.shape[0], P, pool).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x4p, Wp.astype(jnp.bfloat16), (1,),
            [(-s_lo, S - 1 + s_lo)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        y = jax.nn.relu(y + bias4) * mul4 + add4
        y = y.reshape(y.shape[0], y.shape[1], pool, c).max(axis=2)
        return jnp.clip(jnp.round(y * inv_s0), -127, 127).astype(jnp.int8)

    return fn


def make_xla_plain(x, params, s0, pool=POOL):
    w, b, g, beta, mean, var = params
    inv = jax.lax.rsqrt(var + 1e-3) * g
    add = (beta - mean * inv).astype(jnp.float32)
    inv_s0 = (1.0 / s0).astype(jnp.float32)

    @jax.jit
    def fn(x):
        y = jax.lax.conv_general_dilated(
            x[..., None].astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1,),
            "SAME", dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        y = jax.nn.relu(y + b) * inv + add
        Bq, Tq, Cq = y.shape
        y = y.reshape(Bq, Tq // pool, pool, Cq).max(axis=2)
        return jnp.clip(jnp.round(y * inv_s0), -127, 127).astype(jnp.int8)

    return fn


def make_pallas(params, s0, contract="vpu_t", t_chunk=1024, block_rows=8):
    w, b, g, beta, mean, var = params

    @jax.jit
    def fn(x):
        return pallas_conv_block0(
            x, w, b, g, beta, mean, var, 1e-3, pool=POOL,
            block_rows=block_rows, t_chunk=t_chunk,
            gemm_dtype=jnp.bfloat16, requant_scale=s0, contract=contract)

    return fn


@jax.jit
def _parity(got, ref):
    # Stays ON DEVICE: a full-array np.asarray is a ~786 MB D2H over the
    # axon tunnel; called only on the PARITY_B sub-batch (int32 diff at
    # full B is 12.6 GB — observed RESOURCE_EXHAUSTED, as is holding the
    # full-B ref alongside xla_phase's ~12.6 GB f32 conv intermediate).
    d = jnp.abs(got.astype(jnp.int32) - ref.astype(jnp.int32))
    return jnp.max(d), jnp.mean((d > 0).astype(jnp.float32))


PARITY_B = 256


def _check(name, got, ref):
    mx, frac = _parity(got, ref)
    mx, frac = int(mx), float(frac)
    ok = mx <= 1 and frac <= 1e-3
    print(f"  {name}: parity {'OK' if ok else 'FAIL'} on {got.shape[0]} rows "
          f"(mismatch frac {frac:.2e}, max |Δ| {mx})", flush=True)
    return ok


def main(sweep=False, only=None):
    x, params, s0 = _setup()
    prod = make_pallas(params, s0)
    variants = {
        "vpu_t (prod)": prod,
        "dotg": make_pallas(params, s0, contract="dotg"),
        "xla_phase": make_xla_phase(x, params, s0),
        "xla_plain": make_xla_plain(x, params, s0),
    }
    if only:  # one variant per process — a hung Mosaic compile (dotg on
        # the remote relay) must not starve the others of the chip
        variants = {k: v for k, v in variants.items()
                    if k.split(" ")[0] in only or k in only}
    flops = 2 * B * T * K * C

    def timed(fn):
        # Reduce the 786 MB int8 output to a scalar INSIDE the timed jit:
        # pipelined dispatch otherwise queues ~30 live output buffers
        # (23.6 GB — observed RESOURCE_EXHAUSTED on the slow variants).
        # Serving consumes block 0's output on-device anyway; the ~1 ms
        # HBM-rate reduce is identical across variants.
        return jax.jit(lambda x: jnp.sum(fn(x).astype(jnp.int32)))

    x_sub = x[:PARITY_B]
    ref_sub = prod(x_sub) if any(n != "vpu_t (prod)" for n in variants) \
        else None
    for name, fn in variants.items():
        if name != "vpu_t (prod)":
            try:  # parity at PARITY_B first; free it before full-B timing
                out_sub = fn(x_sub)
            except Exception as e:  # noqa: BLE001 — a variant may not lower
                print(f"  {name}: DOES NOT LOWER — {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            _check(name, out_sub, ref_sub)
            del out_sub
        r = throughput(timed(fn), x, items_per_call=B, iters=30)
        print(f"  {name:>14}: {r['sec_per_call']*1e3:8.3f} ms  "
              f"{flops/r['sec_per_call']/1e12:6.1f} eff TFLOP/s  "
              f"{r['items_per_sec']:,.0f} utt/s", flush=True)
    if sweep:
        print("t_chunk × block_rows sweep (winner contract mode):")
        modes = [m for m in ("vpu_t", "dotg") if not only or m in only] \
            or ("vpu_t", "dotg")
        for contract in modes:
            for t_ch in (512, 1024, 1536, 3072):
                for rows in (4, 8, 16):
                    try:
                        fn = make_pallas(params, s0, contract, t_ch, rows)
                        r = throughput(timed(fn), x, items_per_call=B,
                                       iters=30)
                        print(f"  {contract} t_ch={t_ch:4d} rows={rows:2d}: "
                              f"{r['sec_per_call']*1e3:8.3f} ms", flush=True)
                    except Exception as e:  # noqa: BLE001
                        print(f"  {contract} t_ch={t_ch:4d} rows={rows:2d}: "
                              f"fails — {type(e).__name__}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    main(sweep=("sweep" in argv),
         only=[a for a in argv if a != "sweep"] or None)
