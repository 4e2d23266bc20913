"""Multi-host (multi-slice) initialization hooks.

SURVEY.md §5: "DCN hooks stubbed until multi-host exists" — the current
sandbox exposes exactly one chip, so multi-host paths cannot be executed
here, but the wiring is standard and kept ready:

- ``initialize()`` wraps ``jax.distributed.initialize`` (coordinator
  discovery via env or explicit args) and is a no-op on a single process;
- ``global_mesh()`` builds a mesh over *all* processes' devices, ordered by
  ``mesh_utils.create_device_mesh`` (ICI-topology-aware within a slice);
  pass ``dcn_axis_sizes`` for multi-*slice* (DCN-connected) deployments —
  that routes through ``mesh_utils.create_hybrid_device_mesh`` so the
  slice-major layout keeps intra-slice collectives on ICI and only the
  named DCN axes cross slices.

Everything else in :mod:`voicemap_tpu.parallel` is mesh-size and
process-count agnostic (shard_map over named axes), so multi-host enablement
is exactly these two calls at program start. The 2-process execution path is
exercised for real (localhost CPU, two processes × 4 faked devices, one DP
train step end-to-end) by tests/test_distributed_multiprocess.py.
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


def global_mesh(
    axis_sizes: Optional[Dict[str, int]] = None,
    dcn_axis_sizes: Optional[Dict[str, int]] = None,
) -> Mesh:
    """Mesh over every device of every process.

    Default: 1-D ``data`` axis across all global devices, ordered by the
    ICI-aware ``mesh_utils`` layout so intra-slice collectives stay on ICI.
    Pass e.g. ``{"data": n_slices*chips, "model": 1}`` for custom layouts.

    Multi-slice: ``axis_sizes`` gives the per-slice (ICI) extent of each
    axis and ``dcn_axis_sizes`` the cross-slice (DCN) extent (axes absent
    there default to 1); the global mesh axis size is their product. E.g.
    two v5e-8 slices doing pure DP: ``global_mesh({"data": 8},
    {"data": 2})``. Routed through ``mesh_utils.create_hybrid_device_mesh``
    so only the DCN axes ever cross the slice boundary.
    """
    from jax.experimental import mesh_utils

    devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    if dcn_axis_sizes is not None:
        unknown = set(dcn_axis_sizes) - set(names)
        if unknown:
            raise ValueError(f"dcn axes {unknown} not in mesh axes {names}")
        dcn_sizes = tuple(dcn_axis_sizes.get(n, 1) for n in names)
        if int(np.prod(sizes)) * int(np.prod(dcn_sizes)) != len(devices):
            raise ValueError(
                f"ici mesh {axis_sizes} × dcn mesh {dcn_axis_sizes} does not "
                f"cover the {len(devices)} global devices"
            )
        # TPU slices carry distinct slice_index values; when the slice count
        # doesn't match the requested DCN extent (CPU multi-process — the
        # in-sandbox execution rig reports slice_index 0 everywhere), the
        # process is the DCN granule instead.
        n_slices = len({getattr(d, "slice_index", 0) for d in devices})
        granule_is_process = n_slices != int(np.prod(dcn_sizes))
        dev = mesh_utils.create_hybrid_device_mesh(
            sizes, dcn_sizes, devices=devices,
            process_is_granule=granule_is_process,
        )
        return Mesh(dev, names)
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh {axis_sizes} does not cover the {len(devices)} global devices"
        )
    dev = mesh_utils.create_device_mesh(sizes, devices=devices)
    return Mesh(dev, names)
