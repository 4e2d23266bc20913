"""voicemap_tpu — TPU-native speaker-embedding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``oscarknagg/voicemap`` (design blueprint: SURVEY.md). Public surface:

- :mod:`voicemap_tpu.config` — dataclass configs + BASELINE.json presets
- :mod:`voicemap_tpu.data` — index/dataset/synthetic corpus/audio decode
- :mod:`voicemap_tpu.ops` — on-device preprocess, sampling, distance kernels
- :mod:`voicemap_tpu.models` — conv1d encoder, classifier, siamese nets
- :mod:`voicemap_tpu.train` — fused train steps, losses, checkpoints
- :mod:`voicemap_tpu.eval` — batched n-shot k-way evaluation
- :mod:`voicemap_tpu.parallel` — mesh/sharding layer (DP, sharded eval, halo conv)
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
