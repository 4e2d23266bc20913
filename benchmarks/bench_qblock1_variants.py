"""Why is int8 block 1 at 37% of MXU peak when blocks 2-3 run at ~74%?

Block 1 (Cin=128, Cout=256, T=3000, k=3, pool=2) is the only mid-network
block far off the s8 x s8 -> s32 roof: 1.21 Tops in 8.21 ms = 147 TOP/s vs
291/281 TOP/s for blocks 2/3 (bench_quant.py stages). This bench measures
XLA-level reformulations on the exact serving shape before reaching for a
Pallas kernel:

- prod      : models/quant_infer._quant_block (lax.conv + fused epilogue).
- dot3      : conv unrolled to three shifted (B*T, Cin) @ (Cin, Cout) int8
              dots summed in int32 (the dot emitter instead of the conv
              emitter), same epilogue + pool.
- dot3_cat  : one (B*T, Cin) @ (Cin, 3*Cout) int8 dot, output rows shifted
              and summed (K stays 128 but N triples; shifts on int32).
- conv_f32  : prod with preferred_element_type f32 (accumulator dtype).
- conv_nofuse: conv alone -> int32 materialized (attribution: emitter rate
              without the epilogue).

Run on the chip: ``python benchmarks/bench_qblock1_variants.py [block]``
where block in {1,2,3} picks (Cin, Cout, T).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voicemap_tpu.models.quant_infer import _quant_block
from voicemap_tpu.utils.profiling import throughput

B = int(os.environ.get("QB_BATCH", 2048))
SHAPES = {1: (128, 256, 3000), 2: (256, 512, 1500), 3: (512, 1024, 750)}


def _setup(cin, cout, t, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(-127, 128, (B, t, cin), dtype=np.int8))
    qblk = {
        "w_q": jnp.asarray(rng.integers(-127, 128, (3, cin, cout),
                                        dtype=np.int8)),
        "alpha": jnp.asarray(0.01 * rng.standard_normal((cout,)), jnp.float32),
        "beta": jnp.asarray(rng.standard_normal((cout,)), jnp.float32),
        "gamma": jnp.asarray(rng.standard_normal((cout,)), jnp.float32),
    }
    return x, qblk


def make_prod(qblk):
    @jax.jit
    def fn(x):
        return _quant_block(x, qblk, 2, 1, last=False, out_dtype=jnp.bfloat16)
    return fn


def _epilogue_pool(acc, qblk):
    z = (jax.nn.relu(acc.astype(jnp.float32) + qblk["beta"]) * qblk["alpha"]
         + qblk["gamma"])
    y = jnp.clip(jnp.round(z), -127, 127).astype(jnp.int8)
    Bq, T, C = y.shape
    return y.reshape(Bq, T // 2, 2, C).max(axis=2)


def make_dot3(qblk):
    w = qblk["w_q"]  # (3, Cin, Cout)

    @jax.jit
    def fn(x):
        Bq, T, Ci = x.shape
        acc = jnp.matmul(x, w[1], preferred_element_type=jnp.int32)
        lo = jnp.matmul(x[:, :-1], w[2], preferred_element_type=jnp.int32)
        hi = jnp.matmul(x[:, 1:], w[0], preferred_element_type=jnp.int32)
        # y[t] = w0·x[t-1] + w1·x[t] + w2·x[t+1]  (SAME, zero edges)
        acc = acc.at[:, :-1].add(lo)
        acc = acc.at[:, 1:].add(hi)
        return _epilogue_pool(acc, qblk)
    return fn


def make_dot3_cat(qblk):
    w = qblk["w_q"]
    cout = w.shape[-1]
    wcat = jnp.concatenate([w[0], w[1], w[2]], axis=1)  # (Cin, 3*Cout)

    @jax.jit
    def fn(x):
        p = jnp.matmul(x, wcat, preferred_element_type=jnp.int32)
        # y[t] = p[t+1, 0:C] + p[t, C:2C] + p[t-1, 2C:3C]
        acc = p[:, :, cout:2 * cout]
        acc = acc.at[:, :-1].add(p[:, 1:, :cout])
        acc = acc.at[:, 1:].add(p[:, :-1, 2 * cout:])
        return _epilogue_pool(acc, qblk)
    return fn


def make_conv_f32(qblk):
    @jax.jit
    def fn(x):
        acc = jax.lax.conv_general_dilated(
            x, qblk["w_q"], (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        z = (jax.nn.relu(acc + qblk["beta"]) * qblk["alpha"] + qblk["gamma"])
        y = jnp.clip(jnp.round(z), -127, 127).astype(jnp.int8)
        Bq, T, C = y.shape
        return y.reshape(Bq, T // 2, 2, C).max(axis=2)
    return fn


def make_pallas(qblk, t, t_pad, t_len, b_blk=4, variant="pshift"):
    from voicemap_tpu.ops.pallas_quant_block import (
        cat_weights, pallas_quant_block, stack_weights,
    )

    wop = (cat_weights if variant == "pshift" else stack_weights)(qblk["w_q"])

    @jax.jit
    def fn(xp):
        return pallas_quant_block(
            xp, wop, qblk["alpha"], qblk["beta"], qblk["gamma"],
            t_valid=t, t_len=t_len, b_blk=b_blk, variant=variant)
    return fn


def make_conv_nofuse(qblk):
    @jax.jit
    def fn(x):
        return jax.lax.conv_general_dilated(
            x, qblk["w_q"], (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.int32,
        )
    return fn


def main(block=1):
    cin, cout, t = SHAPES[block]
    x, qblk = _setup(cin, cout, t)
    prod = make_prod(qblk)
    # Parity stays ON DEVICE: np.asarray(ref) is a 3+ GB int32 D2H that
    # takes >10 min over the axon tunnel (discovered round 5 — the bench
    # "hung" before its first print). Fetch only scalar summaries.
    ref = prod(x)
    print("ref computed", flush=True)
    ops = 2 * B * t * 3 * cin * cout
    # Measured on-chip 2026-08-19 (block 1): prod 8.70 ms / 139 TOP/s;
    # dot3 81.2 ms (XLA materializes the int32 accumulator + .at adds);
    # dot3_cat fails to compile; conv_f32 8.74 ms (identical emitter);
    # conv_nofuse OOMs (6.3 GB int32 materialized). XLA-level
    # reformulations are DEAD — only the Pallas kernel attacks the gap.
    variants = {
        "prod": prod,
    }
    if os.environ.get("QB1_ALL"):
        variants.update({
            "dot3": make_dot3(qblk),
            "dot3_cat": make_dot3_cat(qblk),
            "conv_f32": make_conv_f32(qblk),
            "conv_nofuse": make_conv_nofuse(qblk),
        })
    t_pad = -(-t // 256) * 256
    xp = jnp.zeros((B, t_pad, cin), jnp.int8).at[:, :t].set(x)
    only = os.environ.get("QB1_ONLY")  # comma-separated name substrings
    for t_len, b_blk in ((128, 4), (256, 4), (512, 4), (256, 8)):
        if t_pad % t_len == 0:
            variants[f"pallas t{t_len} b{b_blk}"] = (
                make_pallas(qblk, t, t_pad, t_len, b_blk), xp)
            variants[f"xk t{t_len} b{b_blk}"] = (
                make_pallas(qblk, t, t_pad, t_len, b_blk, variant="xk"), xp)
            variants[f"xk3 t{t_len} b{b_blk}"] = (
                make_pallas(qblk, t, t_pad, t_len, b_blk, variant="xk3"), xp)
    if only:
        keys = [s.strip() for s in only.split(",")]
        variants = {k: v for k, v in variants.items()
                    if any(s in k for s in keys)}
    print(f"block {block}: Cin={cin} Cout={cout} T={t} B={B} "
          f"({ops/1e12:.2f} Tops)")
    @jax.jit
    def _parity(got, ref):
        d = jnp.abs(got.astype(jnp.int32) - ref.astype(jnp.int32))
        return jnp.max(d), jnp.mean((d > 0).astype(jnp.float32))

    for name, fv in variants.items():
        fn, arg = fv if isinstance(fv, tuple) else (fv, x)
        try:
            out = fn(arg)  # stays on device (D2H of 786 MB+ is minutes)
            out.block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILS — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)
            continue
        note = ""
        if name not in ("prod", "conv_nofuse"):
            got = (out[:, : t // 2]
                   if name.startswith(("pallas", "xk")) else out)
            mx, frac = _parity(got, ref)
            note = (f"  parity max|Δ|={int(mx)} frac={float(frac):.1e}")
        r = throughput(fn, arg, items_per_call=1, iters=20)
        ms = r["sec_per_call"] * 1e3
        print(f"  {name:>14}: {ms:8.3f} ms  {ops/r['sec_per_call']/1e12:6.1f} "
              f"TOP/s{note}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
