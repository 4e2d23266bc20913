"""Siamese verification network.

Reference: ``voicemap/models.py :: build_siamese_net(encoder, input_shape,
distance_metric)`` — two inputs → shared encoder → distance merge →
Dense(1, sigmoid) (SURVEY.md §3.5).

TPU-first design: instead of running the shared encoder twice (two smaller
convolutions), the pair axis is folded into the batch — ``(2, B, T, 1)`` is
reshaped to ``(2B, T, 1)``, encoded once at double batch (better MXU
utilization), and split back for the merge. The head emits logits;
``p(different) = sigmoid(logit)`` under the same=0 label convention.

``score_support()`` exposes the head in matrix form for n-shot eval: scores
of one query block against a whole support block without tiling the query
(replaces the reference's ``model.predict([tile(query, k·n), support])``).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..config import EncoderConfig, SiameseConfig
from ..ops import distance as dist_ops
from .encoder import ConvEncoder, _DTYPES


class SiameseNet(nn.Module):
    cfg: EncoderConfig
    siamese: SiameseConfig

    def setup(self):
        self.encoder = ConvEncoder(self.cfg, name="encoder")
        self.head = nn.Dense(
            1,
            dtype=jnp.float32,
            param_dtype=_DTYPES[self.cfg.param_dtype],
            name="head",
        )

    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """(B, T, 1) × (B, T, 1) → (B,) logits of p(different)."""
        B = x1.shape[0]
        stacked = jnp.concatenate([x1, x2], axis=0)  # (2B, T, 1): one big conv
        emb = self.encoder(stacked, train)
        e1, e2 = emb[:B], emb[B:]
        feats = dist_ops.merge_features(e1, e2, self.siamese.distance_metric)
        return self.head(feats)[..., 0]

    def embed(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encoder(x, train)

    def score_pairs(self, e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
        """Logits from precomputed embeddings (B, D) × (B, D) → (B,)."""
        feats = dist_ops.merge_features(e1, e2, self.siamese.distance_metric)
        return self.head(feats)[..., 0]

    def score_support(self, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
        """Score matrix (nq, ns) from embeddings q (nq, D), s (ns, D).

        Lower = more likely same speaker (same=0 convention), so n-shot
        prediction is argmin over classes — matrix form of the reference's
        per-task predict loop.
        """
        metric = self.siamese.distance_metric
        if metric == "weighted_l1":
            w = self.head.variables["params"]["kernel"]
            b = self.head.variables["params"]["bias"]
            return dist_ops.pairwise_weighted_l1(q, s, w, b[0])
        if metric in ("uniform_euclidean", "uniform_l1"):
            if metric == "uniform_euclidean":
                d = dist_ops.pairwise_euclidean(q, s)
            else:
                d = dist_ops.pairwise_l1(q, s)
            w = self.head.variables["params"]["kernel"][0, 0]
            b = self.head.variables["params"]["bias"][0]
            return d * w + b
        if metric == "dot_product":
            d = -dist_ops.pairwise_dot(q, s)  # raw dot
            w = self.head.variables["params"]["kernel"][0, 0]
            b = self.head.variables["params"]["bias"][0]
            return d * w + b
        if metric == "cosine_distance":
            d = dist_ops.pairwise_cosine_distance(q, s)
            w = self.head.variables["params"]["kernel"][0, 0]
            b = self.head.variables["params"]["bias"][0]
            return d * w + b
        raise ValueError(metric)
