"""Fused int8 mid-network conv block: s8×s8→s32 GEMM + epilogue + pool.

Serving-path kernel for the encoder's blocks 1+ (k=3, pool=2, dilation=1 —
the BASELINE config-#1 shape; other shapes fall back to the XLA path in
``models/quant_infer._quant_block``). Motivation (round-4 measurement,
BASELINE.md per-stage table): XLA's int8 conv emitter runs block 1
(Cin=128) at 147 TOP/s — 37% of the v5e's 394 TOP/s s8 peak — while a raw
Pallas ``jnp.dot(int8, int8, preferred_element_type=int32)`` measures
322 TOP/s on the same contraction. Blocks 2/3 (Cin≥256) already run at
~74% peak in XLA; this kernel targets the block-1 gap and is adopted
per-block only where it measures faster.

STATUS (2026-08-19, BASELINE.md round-5 table): measured NEGATIVE in all
three formulations — pshift 27.1 ms, xk does not lower (lane-concat of a
sublane-offset int8 slice), xk3 21.0 ms — vs XLA's 8.62 ms on block 1.
Mosaic relayout of ±1-sublane-shifted int8 (32-packed) operands costs
more than the MXU pass it feeds; XLA's conv emitter handles the shift
structure natively. ``routing="xla"`` is production; this kernel stays
as engineering record, forceable via ``routing="pallas"``.

Formulation — no pooled-GEMM overhead (the round-1 pair-merge kernel paid
(k+1)/k extra FLOPs; this one pays none):

1. per (batch row, time chunk): ONE int8 MXU pass
   ``P = X_ext @ W_cat`` with ``X_ext = x[base−1 : base+t_len+1]`` (the ±1
   conv halo read straight from the whole-row VMEM block) and
   ``W_cat (Cin, 3·Cout) = [w₀ | w₁ | w₂]`` lane-concatenated taps;
2. ``y[t] = P[t, :C] + P[t+1, C:2C] + P[t+2, 2C:3C]`` — the k=3 SAME conv
   as two sublane-shifted int32 adds (probed: static sublane-offset slices
   lower on this Mosaic);
3. max-pool(2) BEFORE the epilogue on the raw int32 accumulator:
   ``z_q = clamp(round(alpha·relu(acc+beta) + gamma))`` is monotone in
   ``acc`` per channel (nondecreasing for alpha>0, nonincreasing for
   alpha<0 — relu(x+β) is monotone and round/clamp preserve order), so
   ``max_t z_q(acc_t) == z_q(max_t acc_t)`` for alpha>0 and
   ``== z_q(min_t acc_t)`` for alpha<0 — EXACTLY. The kernel reduces both
   pair-max and pair-min via the (t, C)→(t/2, 2C) pair reshape (probed:
   lowers) and selects per channel by sign(alpha), halving the f32
   epilogue to pool rate;
4. requantized int8 (or bf16 for the last block) written at pool rate.

Activation padding contract (lets blocks chain with ZERO inter-block XLA
passes): inputs/outputs are (B, T_pad, C) with ``T_pad = n_ch·t_len`` and
rows ≥ t_valid equal to 0 — each kernel zero-masks its own pad tail, and
``ops/pallas_conv.pallas_conv_block0(zero_pad_tail=True)`` starts the
chain. The final global-max pool slices rows [0, t_valid) first.

Reference parity: the composition matches ``models/quant_infer
._quant_block`` bit-exactly (tests/test_pallas_quant_block.py, interpret
mode on CPU + on-chip); the underlying conv→relu→BN→pool semantics trace
to the reference encoder (voicemap/models.py ::
get_baseline_convolutional_encoder, SURVEY.md §3.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cat_weights(w_q: jnp.ndarray) -> jnp.ndarray:
    """(3, Cin, Cout) int8 conv taps → (Cin, 3·Cout) lane-concatenated."""
    k = w_q.shape[0]
    if k != 3:
        raise ValueError("pallas_quant_block is k=3 only")
    return jnp.concatenate([w_q[0], w_q[1], w_q[2]], axis=1)


def stack_weights(w_q: jnp.ndarray) -> jnp.ndarray:
    """(3, Cin, Cout) int8 conv taps → (3·Cin, Cout) K-stacked (xk variant)."""
    if w_q.shape[0] != 3:
        raise ValueError("pallas_quant_block is k=3 only")
    return jnp.concatenate([w_q[0], w_q[1], w_q[2]], axis=0)


def _zeros_rows(n, c, dtype):
    return jnp.zeros((n, c), dtype)


def _term(P, lo, n, d, c):
    """Rows [lo, lo+n) of P's lane block d, zero-padded outside P's rows."""
    rows = P.shape[0]
    pad_lo = max(0, -lo)
    pad_hi = max(0, lo + n - rows)
    core = P[max(lo, 0): min(lo + n, rows), d * c: (d + 1) * c]
    parts = []
    if pad_lo:
        parts.append(_zeros_rows(pad_lo, c, P.dtype))
    parts.append(core)
    if pad_hi:
        parts.append(_zeros_rows(pad_hi, c, P.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else core


def _kernel(
    x_ref,    # (b_blk, T_pad, Cin) int8
    w_ref,    # (Cin, 3*Cout) int8
    aff_ref,  # (8, Cout) f32: [0]=alpha, [1]=beta, [2]=gamma
    o_ref,    # (b_blk, T_pad//2, Cout) int8 | bf16
    *,
    b_blk: int,
    t_len: int,
    n_ch: int,
    c_out: int,
    t_valid: int,
    last: bool,
):
    alpha = aff_ref[0, :]
    beta = aff_ref[1, :]
    gamma = aff_ref[2, :]
    pos = alpha > 0.0
    u_ch = t_len // 2
    u_valid = t_valid // 2
    for r in range(b_blk):
        row = x_ref[r]  # (T_pad, Cin) int8
        for cc in range(n_ch):
            base = cc * t_len
            u_base = base // 2
            if u_base >= u_valid:
                # Entirely pad output: uphold the zero-tail contract.
                o_ref[r, u_base: u_base + u_ch, :] = jnp.zeros(
                    (u_ch, c_out), o_ref.dtype)
                continue
            lo_edge = cc == 0
            hi_edge = cc == n_ch - 1
            start = base - (0 if lo_edge else 1)
            stop = min(base + t_len + 1, row.shape[0])
            x_ext = row[start:stop]
            # ONE int8 MXU pass per chunk; the conv's 3-tap sum becomes two
            # sublane-shifted int32 adds over P's lane blocks.
            P = jax.lax.dot_general(
                x_ext, w_ref[:],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.int32,
            )  # (t_len + 1|2, 3*Cout)
            off = 0 if lo_edge else 1
            acc = _term(P, off - 1, t_len, 0, c_out)
            acc = acc + _term(P, off, t_len, 1, c_out)
            acc = acc + _term(P, off + 1, t_len, 2, c_out)
            # Pair-pool the RAW accumulator (max and min; epilogue is
            # monotone per channel by sign(alpha)) → f32 work at pool rate.
            pairs = acc.reshape(u_ch, 2 * c_out)
            pmax = jnp.maximum(pairs[:, :c_out], pairs[:, c_out:])
            pmin = jnp.minimum(pairs[:, :c_out], pairs[:, c_out:])
            sel = jnp.where(pos[None, :], pmax, pmin).astype(jnp.float32)
            z = jax.nn.relu(sel + beta[None, :]) * alpha[None, :] \
                + gamma[None, :]
            if last:
                out = z.astype(o_ref.dtype)
            else:
                out = jnp.clip(jnp.round(z), -127, 127).astype(o_ref.dtype)
            if u_base + u_ch > u_valid:
                # Straddling chunk: zero the pad tail (contract above).
                idx = jax.lax.broadcasted_iota(jnp.int32, (u_ch, c_out), 0)
                out = jnp.where(idx < (u_valid - u_base), out,
                                jnp.zeros_like(out))
            o_ref[r, u_base: u_base + u_ch, :] = out


def _kernel_xk3(
    x_ref,    # (b_blk, T_pad, Cin) int8
    w_ref,    # (3*Cin, Cout) int8 (stack_weights)
    aff_ref,  # (8, Cout) f32: [0]=alpha, [1]=beta, [2]=gamma
    o_ref,    # (b_blk, T_pad//2, Cout) int8 | bf16
    *,
    b_blk: int,
    t_len: int,
    n_ch: int,
    c_in: int,
    c_out: int,
    t_valid: int,
    last: bool,
):
    """Three per-tap K=Cin int8 dots accumulated in int32.

    The pure xk lane-concat ``[x[t−1] | x[t] | x[t+1]]`` does NOT lower on
    this Mosaic ("result/input offset mismatch on non-concat dimension":
    the +1-shifted int8 slice carries sublane offset {1,0} into a lane-dim
    tpu.concatenate). Same-K accumulation sidesteps the concat: the three
    shifted views each feed their own MXU pass (Mosaic relayouts matmul
    operands), so there is still no 3-wide int32 P and no shifted int32
    adds — the relayout copies are int8 (16× less data than pshift's
    int32 P slices).
    """
    alpha = aff_ref[0, :]
    beta = aff_ref[1, :]
    gamma = aff_ref[2, :]
    pos = alpha > 0.0
    u_ch = t_len // 2
    u_valid = t_valid // 2
    zrow = jnp.zeros((1, c_in), jnp.int8)
    dn = (((1,), (0,)), ((), ()))
    for r in range(b_blk):
        row = x_ref[r]  # (T_pad, Cin) int8
        rows = row.shape[0]
        for cc in range(n_ch):
            base = cc * t_len
            u_base = base // 2
            if u_base >= u_valid:
                o_ref[r, u_base: u_base + u_ch, :] = jnp.zeros(
                    (u_ch, c_out), o_ref.dtype)
                continue
            lo = (jnp.concatenate([zrow, row[: t_len - 1]], 0) if cc == 0
                  else row[base - 1: base + t_len - 1])
            mid = row[base: base + t_len]
            hi = (jnp.concatenate([row[base + 1: rows], zrow], 0)
                  if base + t_len + 1 > rows
                  else row[base + 1: base + t_len + 1])
            prec = jax.lax.Precision.DEFAULT
            acc = jax.lax.dot_general(
                lo, w_ref[:c_in], dn, precision=prec,
                preferred_element_type=jnp.int32)
            acc = acc + jax.lax.dot_general(
                mid, w_ref[c_in: 2 * c_in], dn, precision=prec,
                preferred_element_type=jnp.int32)
            acc = acc + jax.lax.dot_general(
                hi, w_ref[2 * c_in:], dn, precision=prec,
                preferred_element_type=jnp.int32)
            pairs = acc.reshape(u_ch, 2 * c_out)
            pmax = jnp.maximum(pairs[:, :c_out], pairs[:, c_out:])
            pmin = jnp.minimum(pairs[:, :c_out], pairs[:, c_out:])
            sel = jnp.where(pos[None, :], pmax, pmin).astype(jnp.float32)
            z = jax.nn.relu(sel + beta[None, :]) * alpha[None, :] \
                + gamma[None, :]
            if last:
                out = z.astype(o_ref.dtype)
            else:
                out = jnp.clip(jnp.round(z), -127, 127).astype(o_ref.dtype)
            if u_base + u_ch > u_valid:
                idx = jax.lax.broadcasted_iota(jnp.int32, (u_ch, c_out), 0)
                out = jnp.where(idx < (u_valid - u_base), out,
                                jnp.zeros_like(out))
            o_ref[r, u_base: u_base + u_ch, :] = out


def _kernel_xk(
    x_ref,    # (b_blk, T_pad, Cin) int8
    w_ref,    # (3*Cin, Cout) int8 (stack_weights)
    aff_ref,  # (8, Cout) f32: [0]=alpha, [1]=beta, [2]=gamma
    o_ref,    # (b_blk, T_pad//2, Cout) int8 | bf16
    *,
    b_blk: int,
    t_len: int,
    n_ch: int,
    c_in: int,
    c_out: int,
    t_valid: int,
    last: bool,
):
    """Taps folded into the GEMM K dim (r4 verdict #3 redesign candidate).

    ``X3 (t_len, 3·Cin) = [x[t−1] | x[t] | x[t+1]]`` lane-concatenated, so
    the k=3 SAME conv is ONE ``X3 @ W3 (3·Cin, Cout)`` int8 MXU pass —
    no 3-wide int32 P tensor and no sublane-shifted adds (which the
    bench_qblock_attrib staging showed were the proportional-VPU cost),
    at the price of two shifted int8 relayout copies per chunk.
    """
    alpha = aff_ref[0, :]
    beta = aff_ref[1, :]
    gamma = aff_ref[2, :]
    pos = alpha > 0.0
    u_ch = t_len // 2
    u_valid = t_valid // 2
    zrow = jnp.zeros((1, c_in), jnp.int8)
    for r in range(b_blk):
        row = x_ref[r]  # (T_pad, Cin) int8
        rows = row.shape[0]
        for cc in range(n_ch):
            base = cc * t_len
            u_base = base // 2
            if u_base >= u_valid:
                o_ref[r, u_base: u_base + u_ch, :] = jnp.zeros(
                    (u_ch, c_out), o_ref.dtype)
                continue
            lo = (jnp.concatenate([zrow, row[: t_len - 1]], 0) if cc == 0
                  else row[base - 1: base + t_len - 1])
            mid = row[base: base + t_len]
            hi = (jnp.concatenate([row[base + 1: rows], zrow], 0)
                  if base + t_len + 1 > rows
                  else row[base + 1: base + t_len + 1])
            x3 = jnp.concatenate([lo, mid, hi], axis=1)  # (t_len, 3*Cin)
            acc = jax.lax.dot_general(
                x3, w_ref[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.int32,
            )  # (t_len, Cout)
            pairs = acc.reshape(u_ch, 2 * c_out)
            pmax = jnp.maximum(pairs[:, :c_out], pairs[:, c_out:])
            pmin = jnp.minimum(pairs[:, :c_out], pairs[:, c_out:])
            sel = jnp.where(pos[None, :], pmax, pmin).astype(jnp.float32)
            z = jax.nn.relu(sel + beta[None, :]) * alpha[None, :] \
                + gamma[None, :]
            if last:
                out = z.astype(o_ref.dtype)
            else:
                out = jnp.clip(jnp.round(z), -127, 127).astype(o_ref.dtype)
            if u_base + u_ch > u_valid:
                idx = jax.lax.broadcasted_iota(jnp.int32, (u_ch, c_out), 0)
                out = jnp.where(idx < (u_valid - u_base), out,
                                jnp.zeros_like(out))
            o_ref[r, u_base: u_base + u_ch, :] = out


@functools.partial(
    jax.jit,
    static_argnames=("t_valid", "t_len", "b_blk", "last", "out_dtype",
                     "variant", "interpret"),
)
def pallas_quant_block(
    x_q: jnp.ndarray,      # (B, T_pad, Cin) int8, rows ≥ t_valid are zero
    w_op: jnp.ndarray,     # int8 weights: (Cin, 3·Cout) for variant
                           # "pshift" (cat_weights) | (3·Cin, Cout) for
                           # "xk" (stack_weights)
    alpha: jnp.ndarray,    # (Cout,) f32 epilogue vectors (quant_infer fold)
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
    *,
    t_valid: int,
    t_len: int = 256,
    b_blk: int = 4,
    last: bool = False,
    out_dtype=jnp.int8,
    variant: str = "pshift",
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int8 conv(k=3, SAME)+relu+BN-affine+requant+maxpool(2).

    Returns (B, T_pad//2, Cout) with rows ≥ t_valid//2 zero — chainable
    into the next ``pallas_quant_block`` with no XLA pass in between.

    ``variant``: "pshift" — one (t_len+2, Cin) @ (Cin, 3·Cout) pass, conv
    taps summed as two sublane-shifted int32 adds; "xk" — taps folded into
    the GEMM K dim, (t_len, 3·Cin) @ (3·Cin, Cout), no shifted adds
    (pass ``stack_weights(w_q)``). Bit-identical outputs.
    """
    B, t_pad, c_in = x_q.shape
    if variant == "pshift":
        c_out = w_op.shape[1] // 3
        if w_op.shape[0] != c_in:
            raise ValueError("pshift wants cat_weights (Cin, 3*Cout)")
    elif variant in ("xk", "xk3"):
        c_out = w_op.shape[1]
        if w_op.shape[0] != 3 * c_in:
            raise ValueError(f"{variant} wants stack_weights (3*Cin, Cout)")
    else:
        raise ValueError(f"unknown variant {variant!r}")
    if x_q.dtype != jnp.int8:
        raise ValueError("x_q must be int8")
    if t_valid % 2 or t_pad % 2:
        raise ValueError("t_valid and T_pad must be even")
    while t_len > 2 and t_pad % t_len:
        t_len //= 2
    n_ch = t_pad // t_len
    while b_blk > 1 and B % b_blk:
        b_blk //= 2
    if last and out_dtype == jnp.int8:
        raise ValueError("last block dequantizes — pass a float out_dtype")
    aff = jnp.zeros((8, c_out), jnp.float32)
    aff = aff.at[0].set(alpha.astype(jnp.float32))
    aff = aff.at[1].set(beta.astype(jnp.float32))
    aff = aff.at[2].set(gamma.astype(jnp.float32))
    if variant == "pshift":
        kernel = functools.partial(
            _kernel, b_blk=b_blk, t_len=t_len, n_ch=n_ch, c_out=c_out,
            t_valid=t_valid, last=last,
        )
    else:
        kernel = functools.partial(
            _kernel_xk3 if variant == "xk3" else _kernel_xk,
            b_blk=b_blk, t_len=t_len, n_ch=n_ch, c_in=c_in,
            c_out=c_out, t_valid=t_valid, last=last,
        )
    return pl.pallas_call(
        kernel,
        grid=(B // b_blk,),
        in_specs=[
            pl.BlockSpec((b_blk, t_pad, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_op.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(aff.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_blk, t_pad // 2, c_out),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_pad // 2, c_out), out_dtype),
        interpret=interpret,
    )(x_q, w_op, aff)
