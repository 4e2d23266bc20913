"""Pipeline parallelism (GPipe-style microbatching over a ``pp`` mesh axis).

SURVEY.md §2.2 marks PP as unnecessary for the 4-block encoder (it fits one
chip thousands of times over), so this module is the demonstration-scale
implementation that completes the parallelism matrix: S homogeneous stages
sharded over the ``pp`` axis (stacked parameters, one slice per device), a
``lax.scan`` over ``n_micro + S − 1`` ticks, activations hopping stage→stage
with ``ppermute`` each tick (the pipeline bubble is the standard S−1 ticks).

Works for any ``stage_fn`` whose input/output activations have the same
shape (e.g. a residual conv block or a square dense layer). Property-tested
against the sequential application on the faked CPU mesh, and exercised by
``__graft_entry__.dryrun_multichip``.

The pipeline is fully differentiable: every op in the tick loop (``scan``,
``ppermute``, ``dynamic_update_slice``, ``psum``) has a transpose rule, so
the GPipe BACKWARD is plain ``jax.grad`` through the forward — XLA inverts
the ppermute ring for the cotangent hops (activations flow stage s→s+1,
cotangents s+1→s), exactly GPipe's 1F-then-1B schedule at program level.
``make_gpipe_train_step`` packages that: loss + grads for the stacked stage
parameters, property-tested equal to sequential autodiff
(tests/test_parallel.py::test_gpipe_grads_match_sequential).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_gpipe_fn(
    mesh: Mesh,
    stage_fn: Callable,
    n_microbatches: int,
    axis: str = "pp",
):
    """Returns jitted ``(stacked_params, x) → y``.

    ``stacked_params``: pytree whose leaves have a leading stage dim of size
    ``S = mesh.shape[axis]`` (sharded over the axis — each device holds its
    stage's slice). ``x``: (n_microbatches, mb, …) microbatched input,
    replicated; output has the same shape, replicated, equal to applying the
    S stages sequentially to every microbatch.
    """
    S = mesh.shape[axis]

    def device_fn(params_local, x_micro):
        # params_local leaves: (1, …) — this stage's parameters.
        my_params = jax.tree.map(lambda p: p[0], params_local)
        s = jax.lax.axis_index(axis)
        n_ticks = n_microbatches + S - 1
        shift_perm = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            act_in, outputs = carry
            # Stage 0 injects microbatch t (clamped once the feed drains —
            # those ticks only push bubbles through).
            inject = x_micro[jnp.minimum(t, n_microbatches - 1)]
            act_in = jnp.where(s == 0, inject, act_in)
            y = stage_fn(my_params, act_in)
            # The last stage's tick-t output is microbatch t − (S − 1).
            out_t = t - (S - 1)
            take = jnp.logical_and(s == S - 1, out_t >= 0)
            outputs = jax.lax.dynamic_update_slice(
                outputs,
                jnp.where(take, y, outputs[jnp.maximum(out_t, 0)])[None],
                (jnp.maximum(out_t, 0),) + (0,) * y.ndim,
            )
            # Hop the activation to the next stage.
            next_in = jax.lax.ppermute(y, axis, shift_perm)
            return (next_in, outputs), None

        init = (jnp.zeros_like(x_micro[0]), jnp.zeros_like(x_micro))
        (_, outputs), _ = jax.lax.scan(
            tick, init, jnp.arange(n_ticks)
        )
        # Replicate the last stage's collected outputs to every device.
        mask = (s == S - 1).astype(outputs.dtype)
        return jax.lax.psum(outputs * mask, axis)

    return jax.jit(
        jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
    )


def make_gpipe_train_step(
    mesh: Mesh,
    stage_fn: Callable,
    loss_fn: Callable,
    n_microbatches: int,
    axis: str = "pp",
):
    """Returns jitted ``(stacked_params, x, y) → (loss, grads)``.

    ``loss_fn(outputs, y) → scalar`` consumes the pipeline's microbatched
    outputs. ``grads`` has the same stacked-stage structure as
    ``stacked_params`` (leading dim S, sharded over ``axis``); feed it to any
    optax update. The backward pass rides the transposed pipeline (inverted
    ppermute ring) inside the same compiled program — no separate schedule
    code.
    """
    gpipe = make_gpipe_fn(mesh, stage_fn, n_microbatches, axis=axis)

    @jax.jit
    def step(stacked_params, x, y):
        def objective(p):
            return loss_fn(gpipe(p, x), y)

        return jax.value_and_grad(objective)(stacked_params)

    return step
