"""Multi-host (multi-slice) initialization hooks.

SURVEY.md §5: "DCN hooks stubbed until multi-host exists" — the current
sandbox exposes exactly one chip, so multi-host paths cannot be executed
here, but the wiring is standard and kept ready:

- ``initialize()`` wraps ``jax.distributed.initialize`` (coordinator
  discovery via env or explicit args) and is a no-op on a single process;
- ``global_mesh()`` builds a mesh over *all* processes' devices, ordered by
  ``mesh_utils.create_device_mesh`` (ICI-topology-aware within a slice).
  NOTE: for true multi-*slice* (DCN-connected) deployments the slice-major
  layout guarantee requires ``mesh_utils.create_hybrid_device_mesh`` with the
  per-slice shape — wire that in when a multi-slice environment exists.

Everything else in :mod:`voicemap_tpu.parallel` is mesh-size and
process-count agnostic (shard_map over named axes), so multi-host enablement
is exactly these two calls at program start.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; returns whether
    distributed mode is active. Safe to call unconditionally."""
    num = num_processes if num_processes is not None else int(
        os.environ.get("VOICEMAP_NUM_PROCESSES", "1")
    )
    if num <= 1:
        return False
    if process_id is None:
        env_pid = os.environ.get("VOICEMAP_PROCESS_ID")
        # None lets jax auto-detect from the cluster environment; defaulting
        # to 0 would make every host claim process 0.
        process_id = int(env_pid) if env_pid is not None else None
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("VOICEMAP_COORDINATOR"),
        num_processes=num,
        process_id=process_id,
    )
    return True


def global_mesh(axis_sizes: Optional[Dict[str, int]] = None) -> Mesh:
    """Mesh over every device of every process.

    Default: 1-D ``data`` axis across all global devices, ordered by the
    ICI-aware ``mesh_utils`` layout so intra-slice collectives stay on ICI.
    Pass e.g. ``{"data": n_slices*chips, "model": 1}`` for custom layouts.
    """
    from jax.experimental import mesh_utils

    devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh {axis_sizes} does not cover the {len(devices)} global devices"
        )
    dev = mesh_utils.create_device_mesh(sizes, devices=devices)
    return Mesh(dev, names)
