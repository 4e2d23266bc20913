"""Softmax speaker classifier head over the conv encoder.

Reference: ``experiments/train_classifier.py`` — encoder + Dense(n_speakers,
softmax) (SURVEY.md §3.2). We emit logits (softmax lives in the loss), and
expose ``embed()`` — the penultimate-layer embedding the reference's
classifier-mode n-shot eval strips the softmax head to reach.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..config import EncoderConfig
from .encoder import ConvEncoder, _DTYPES


class SpeakerClassifier(nn.Module):
    cfg: EncoderConfig
    num_classes: int

    def setup(self):
        self.encoder = ConvEncoder(self.cfg, name="encoder")
        self.head = nn.Dense(
            self.num_classes,
            dtype=_DTYPES[self.cfg.compute_dtype],
            param_dtype=_DTYPES[self.cfg.param_dtype],
            name="head",
        )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        emb = self.encoder(x, train)
        return self.head(emb).astype(jnp.float32)

    def embed(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Penultimate-layer embedding (n-shot eval path)."""
        return self.encoder(x, train)
