"""Test harness configuration.

Tests run on a **faked 8-device CPU mesh** (SURVEY.md §4.5: JAX's standard
``--xla_force_host_platform_device_count`` trick) so every shard_map /
collective path is exercised without TPU hardware. Set
``VOICEMAP_TEST_PLATFORM=tpu`` to run the suite against the real chip instead.

This must run before any test module touches a jax backend. The sandbox's
sitecustomize registers the 'axon' TPU backend at interpreter start, so we
switch platforms via ``jax.config.update`` (which works post-import as long
as no backend client has been created yet).
"""

import os

_platform = os.environ.get("VOICEMAP_TEST_PLATFORM", "cpu")

if _platform == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent XLA compilation cache: the suite is compile-bound on the
    # single-core CPU mesh, and test programs are identical across runs —
    # steady-state dev-loop runs skip most compiles. Keyed by HLO+flags, so
    # code changes re-compile exactly what they touch. Override the location
    # (or disable with an empty value) via VOICEMAP_TEST_CACHE.
    _cache = os.environ.get("VOICEMAP_TEST_CACHE", "/tmp/voicemap_xla_cache")
    if _cache:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
else:
    import jax

    # Parity tests compare float32 against numpy; TPU matmuls default to
    # bfloat16 operand precision, which misses the 1e-4 tolerances. Run the
    # suite at full f32 matmul precision (tests that exercise bf16 behavior
    # request bf16 dtypes explicitly and are unaffected).
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

from voicemap_tpu.data import synthetic


@pytest.fixture(scope="session")
def corpus_root(tmp_path_factory):
    """Small synthetic LibriSpeech-shaped corpus shared across the session."""
    root = tmp_path_factory.mktemp("corpus")
    spec = synthetic.SyntheticSpec(
        n_speakers=8,
        utterances_per_speaker=6,
        min_seconds=2.0,
        max_seconds=4.5,
        seed=42,
    )
    synthetic.generate_corpus(str(root), subsets=("dev-clean",), spec=spec)
    return str(root)


@pytest.fixture(scope="session")
def dataset(corpus_root):
    from voicemap_tpu.data.dataset import SpeakerDataset

    return SpeakerDataset(
        subsets=("dev-clean",),
        seconds=1.5,
        data_root=corpus_root,
        seed=7,
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(config, items):
    """Fast-tier marking: node IDs listed in tests/slow_tests.txt get the
    ``slow`` marker (in addition to any inline ``@pytest.mark.slow``), so
    the inner dev loop can run ``-m "not slow"`` in ≤5 min while the full
    suite stays the pre-commit bar. See slow_tests.txt for the criterion."""
    listed = set()
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if not os.path.exists(path):
        return  # no fast-tier list — every test simply stays unmarked
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                listed.add(line)
    matched = set()
    for item in items:
        nid = item.nodeid.replace(os.sep, "/")
        if nid in listed:
            item.add_marker(pytest.mark.slow)
            matched.add(nid)
    # Stale-entry guard (r4 advice): a renamed/re-parametrized slow test
    # silently falls back into the fast tier unless someone notices. Only
    # meaningful on full collection — a path/keyword-restricted run
    # legitimately collects a subset.
    stale = listed - matched
    if stale:
        collected = {i.nodeid.replace(os.sep, "/") for i in items}
        # Heuristic for "full collection": the majority of listed files are
        # present among collected files.
        listed_files = {e.split("::")[0] for e in listed}
        collected_files = {n.split("::")[0] for n in collected}
        if len(listed_files & collected_files) >= max(1, len(listed_files) // 2):
            import warnings

            warnings.warn(
                "tests/slow_tests.txt entries matched no collected test "
                "(renamed or re-parametrized? they now run in the fast "
                f"tier): {sorted(stale)}",
                stacklevel=1,
            )
