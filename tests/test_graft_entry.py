"""Regression tests for the driver's acceptance entry points.

The multichip gate failed rounds 1 AND 2 on env-guard bugs, never on the
dryrun content itself (VERDICT.md round 2). These tests pin the guard
behavior by spawning subprocesses with the exact env shapes the driver
uses, including the round-2 killer: ``JAX_PLATFORMS=cpu`` +
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` set but
``PALLAS_AXON_POOL_IPS`` still pointing at the axon pool (sitecustomize
then claims the backend and jax.devices() yields one chip).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(env_overrides, n_devices=8, timeout=540):
    env = dict(os.environ)
    env.pop("_VOICEMAP_DRYRUN_CHILD", None)
    env.update(env_overrides)
    return subprocess.run(
        [
            sys.executable,
            "-c",
            f"import __graft_entry__ as g; g.dryrun_multichip({n_devices})",
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_survives_driver_halfset_env():
    """The driver's exact env: CPU platform vars set, POOL_IPS still set.

    Round 2 failed here (rc=1, 'need 8 devices but have 1') because
    _cpu_mesh_env_ready ignored PALLAS_AXON_POOL_IPS. Must now re-host into
    a clean subprocess and print ok.
    """
    proc = _run_dryrun(
        {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
            "PALLAS_AXON_POOL_IPS": "127.0.0.1",
        }
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok: 8 devices" in proc.stdout


@pytest.mark.slow
def test_dryrun_survives_bare_env():
    """No CPU env vars at all (ambient axon env): must re-host and pass."""
    env = {"_VOICEMAP_DRYRUN_CHILD": ""}
    for var in ("JAX_PLATFORMS", "XLA_FLAGS"):
        env[var] = ""
    proc = _run_dryrun(env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok: 8 devices" in proc.stdout


def test_cpu_mesh_env_ready_requires_pool_ips_cleared(monkeypatch):
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert not g._cpu_mesh_env_ready(8)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    assert g._cpu_mesh_env_ready(8)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS")
    assert g._cpu_mesh_env_ready(8)
