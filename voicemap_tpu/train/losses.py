"""Loss functions.

Reference losses (SURVEY.md §2.1): binary cross-entropy for the siamese net
(``experiments/train_siamese_net.py``: ``binary_crossentropy``), categorical
cross-entropy for the classifier, and Hadsell-et-al. contrastive loss
(``voicemap/utils.py :: contrastive_loss``, margin=1) as the siamese
alternative. All computed from logits in float32 for numerical stability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy; logits (B,), labels (B,) ∈ {0, 1}."""
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy; integer labels."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def contrastive(
    dist: jnp.ndarray, labels: jnp.ndarray, margin: float = 1.0, same_label: int = 0
) -> jnp.ndarray:
    """Hadsell '06 margin loss over embedding distances.

    Reference: ``voicemap/utils.py :: contrastive_loss`` —
    mean(y_same·d² + (1−y_same)·max(margin−d, 0)²). ``labels`` follow the
    dataset convention (same=``same_label``); we convert to y_same ∈ {0,1}.
    """
    y_same = (labels == same_label).astype(jnp.float32)
    d = dist.astype(jnp.float32)
    pos = y_same * jnp.square(d)
    neg = (1.0 - y_same) * jnp.square(jnp.maximum(margin - d, 0.0))
    return jnp.mean(pos + neg)


def binary_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((logits > 0).astype(jnp.float32) == labels)


def categorical_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.argmax(logits, axis=-1) == labels)
