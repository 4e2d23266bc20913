"""Pod-scale sharded n-shot distance matrix (BASELINE.json config #5).

The reference evaluates n-shot tasks one at a time in Python (SURVEY.md §3.4).
The single-chip rebuild batches them into one matmul-form distance matrix
(``ops.distance``); this module scales that to a pod:

- ``sharded_sq_euclidean``: support embeddings sharded over a mesh axis —
  every device computes the distance block of all queries against its local
  support shard; the full (nq, ns) matrix materializes sharded over columns
  and argmin runs without ever gathering it.
- ``ring_sq_euclidean``: both queries and support sharded; query blocks
  rotate around the ring via ``ppermute`` (the classic ring schedule —
  SURVEY.md §2.3 "ring-style sharded distance matrix"), so each step's
  block-matmul overlaps with the next block's transfer and no device ever
  holds more than 1/n of either side.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.distance import pairwise_sq_euclidean


def sharded_sq_euclidean(
    q: jnp.ndarray, s: jnp.ndarray, mesh: Mesh, axis: str = "data"
) -> jnp.ndarray:
    """(nq, d) × (ns, d) → (nq, ns); support sharded over ``axis`` columns."""

    def block(q_local, s_local):
        return pairwise_sq_euclidean(q_local, s_local)

    f = jax.jit(
        jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(None, axis),
        )
    )
    return f(q, s)


def sharded_nearest_support(
    q: jnp.ndarray, s: jnp.ndarray, mesh: Mesh, axis: str = "data"
) -> jnp.ndarray:
    """Global argmin over sharded support without gathering the matrix.

    Each device computes (local argmin, local min); a pair-reduce over the
    axis picks the global winner — the collective moves O(nq) scalars, not
    the O(nq·ns) matrix.
    """
    n_dev = mesh.shape[axis]

    def block(q_local, s_local):
        d = pairwise_sq_euclidean(q_local, s_local)  # (nq, ns/n)
        local_arg = jnp.argmin(d, axis=1)
        local_min = jnp.min(d, axis=1)
        shard = jax.lax.axis_index(axis)
        global_arg = local_arg + shard * s_local.shape[0]
        # all_gather the per-shard (min, arg) pairs and reduce.
        mins = jax.lax.all_gather(local_min, axis)  # (n_dev, nq)
        args = jax.lax.all_gather(global_arg, axis)  # (n_dev, nq)
        winner = jnp.argmin(mins, axis=0)  # (nq,)
        return jnp.take_along_axis(args, winner[None, :], axis=0)[0]

    f = jax.jit(
        jax.shard_map(
            block, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(),
            check_vma=False,
        )
    )
    return f(q, s)


def ring_sq_euclidean(
    q: jnp.ndarray, s: jnp.ndarray, mesh: Mesh, axis: str = "data"
) -> jnp.ndarray:
    """Ring-scheduled distance matrix: q sharded over rows, s over columns.

    Device i starts with query block i and support block i; at each of n
    steps it computes the (current query block × local support block) tile,
    then passes its query block to the next device (``ppermute``), so after n
    steps every (row-block, col-block) tile has been produced exactly once,
    sharded over columns.
    """
    n_dev = mesh.shape[axis]

    def block(q_local, s_local):
        me = jax.lax.axis_index(axis)
        nq_local = q_local.shape[0]
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def body(step, carry):
            q_blk, out = carry
            # The block we currently hold originated at device (me - step).
            src = (me - step) % n_dev
            tile = pairwise_sq_euclidean(q_blk, s_local)  # (nq/n, ns/n)
            out = jax.lax.dynamic_update_slice(out, tile, (src * nq_local, 0))
            q_next = jax.lax.ppermute(q_blk, axis, perm)
            return q_next, out

        out = jnp.zeros((nq_local * n_dev, s_local.shape[0]), jnp.float32)
        _, out = jax.lax.fori_loop(0, n_dev, body, (q_local, out))
        return out

    f = jax.jit(
        jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(None, axis),
            check_vma=False,
        )
    )
    return f(q, s)
