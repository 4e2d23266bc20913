"""Tiled Pallas L1 / weighted-L1 distance kernel.

The L1 family has no matmul form (unlike squared-euclidean, which
``ops/distance.py`` routes to the MXU), so the jnp fallback materializes the
``(nq, ns, d)`` broadcast difference in HBM. This kernel tiles the score
matrix over a (query-block × support-block) grid and keeps the differences in
VMEM, computing ``scores[i, j] = Σ_d |q_i − s_j|·w_d + b`` — the matrix form
of the reference's siamese weighted-L1 verification head
(reference: voicemap/models.py :: build_siamese_net 'weighted_l1' +
voicemap/utils.py :: n_shot_task_evaluation's per-task predict loop).
HBM traffic: O(nq·d + ns·d + nq·ns) instead of O(nq·ns·d).

Set w = 1, b = 0 for the plain L1 distance matrix.

**NOT ON ANY PRODUCTION PATH.** At production shapes the jnp broadcast wins
(0.33 vs 1.6 ms, BASELINE.md round 2 — the VPU-only workload can't amortize
the kernel's grid overhead at n-shot eval sizes), and n-shot evaluation
routes through the matmul-form distances in ``ops/distance.py``. Kept as a
measured negative result + a working example of a tiled two-operand Pallas
grid; revisit only if an L1 score matrix ever exceeds HBM (nq·ns·d ≳ 1e10).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _l1_kernel(q_ref, s_ref, w_ref, o_ref, *, rows_per_step: int):
    """q (Tq, d), s (Ts, d), w (1, d) → o (Tq, Ts).

    Statically unrolled over support chunks (dynamic_update_slice does not
    lower in Mosaic); each chunk's (Tq, R, d) broadcast difference lives only
    in VMEM/registers.
    """
    q = q_ref[:].astype(jnp.float32)  # (Tq, d)
    w = w_ref[:].astype(jnp.float32)  # (1, d)
    Ts = s_ref.shape[0]
    n_steps = Ts // rows_per_step
    cols = []
    for j in range(n_steps):
        s_blk = s_ref[j * rows_per_step : (j + 1) * rows_per_step, :].astype(
            jnp.float32
        )  # (R, d)
        diff = jnp.abs(q[:, None, :] - s_blk[None, :, :]) * w[0][None, None, :]
        cols.append(jnp.sum(diff, axis=-1))  # (Tq, R)
    o_ref[:] = jnp.concatenate(cols, axis=1)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    n = x.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_s", "rows_per_step", "interpret"),
)
def pallas_weighted_l1(
    q: jnp.ndarray,  # (nq, d)
    s: jnp.ndarray,  # (ns, d)
    w: jnp.ndarray,  # (d,) head weights (ones → plain L1)
    b: jnp.ndarray | float = 0.0,  # scalar bias
    block_q: int = 128,
    block_s: int = 128,
    rows_per_step: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tiled |q−s|·w + b score matrix → (nq, ns) float32."""
    nq, d = q.shape
    ns = s.shape[0]
    qp = _pad_to(q.astype(jnp.float32), 0, block_q)
    # Padding support rows with 0 is safe: padded columns are sliced off.
    sp = _pad_to(s.astype(jnp.float32), 0, block_s)
    grid = (qp.shape[0] // block_q, sp.shape[0] // block_s)
    out = pl.pallas_call(
        functools.partial(_l1_kernel, rows_per_step=rows_per_step),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_q, block_s), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp.shape[0], sp.shape[0]), jnp.float32),
        interpret=interpret,
    )(qp, sp, w.reshape(1, -1))
    return out[:nq, :ns] + b


def pallas_l1(q: jnp.ndarray, s: jnp.ndarray, **kw) -> jnp.ndarray:
    """Plain pairwise L1 distance matrix via the tiled kernel."""
    return pallas_weighted_l1(q, s, jnp.ones((q.shape[1],), jnp.float32), 0.0, **kw)
