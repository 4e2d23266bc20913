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
