"""Log-mel frontend + 2D-CNN embedder (BASELINE.json config #4).

The waveform enters as (B, T, 1); the frontend produces (B, frames, mels, 1)
log-mel images (fused Pallas kernel on TPU, jnp/rfft fallback elsewhere), and
a 2D conv stack mirroring the 1D encoder's design (conv+relu → BN → spatial
dropout → maxpool, channel multipliers 1/2/3/4) embeds them. Exposes the same
``__call__``/``embed`` surface as SpeakerClassifier so the train loop, n-shot
eval, and checkpointing are reused unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import EncoderConfig, MelConfig
from ..ops import melspec
from .encoder import _DTYPES


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


class MelFrontend(nn.Module):
    """Waveform (B, T, 1) → log-mel image (B, frames, mels, 1), normalized."""

    mel: MelConfig
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if _use_pallas():
            from ..ops.pallas_melspec import pallas_log_mel

            m = pallas_log_mel(x, self.mel, self.sample_rate)
        else:
            m = melspec.log_mel_spectrogram(x, self.mel, self.sample_rate)
        # Per-utterance standardization (the spectrogram analog of whiten).
        mean = jnp.mean(m, axis=(1, 2), keepdims=True)
        std = jnp.std(m, axis=(1, 2), keepdims=True)
        return ((m - mean) / (std + 1e-5))[..., None]


class Conv2DBlock(nn.Module):
    features: int
    pool: int
    dropout: float
    compute_dtype: jnp.dtype
    param_dtype: jnp.dtype
    bn_momentum: float
    bn_epsilon: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(
            self.features, kernel_size=(3, 3), padding="SAME",
            dtype=self.compute_dtype, param_dtype=self.param_dtype, name="conv",
        )(x)
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_epsilon, dtype=jnp.float32, param_dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32)).astype(self.compute_dtype)
        if self.dropout > 0.0:
            x = nn.Dropout(
                rate=self.dropout, broadcast_dims=(1, 2), deterministic=not train
            )(x)
        if self.pool > 1:
            x = nn.max_pool(x, (self.pool, self.pool), (self.pool, self.pool))
        return x


class MelSpecEncoder(nn.Module):
    """Log-mel image → embedding."""

    cfg: EncoderConfig
    mel: MelConfig
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cdt = _DTYPES[self.cfg.compute_dtype]
        pdt = _DTYPES[self.cfg.param_dtype]
        img = MelFrontend(self.mel, self.sample_rate, name="frontend")(x)
        img = img.astype(cdt)
        # 2D stack: channel multipliers mirror the 1D encoder; pool 2 each
        # block collapses (frames, mels) quickly.
        base = max(self.cfg.filters // 4, 8)
        for i, mult in enumerate(self.cfg.filter_multipliers):
            img = Conv2DBlock(
                features=base * mult, pool=2, dropout=self.cfg.dropout,
                compute_dtype=cdt, param_dtype=pdt,
                bn_momentum=self.cfg.bn_momentum, bn_epsilon=self.cfg.bn_epsilon,
                name=f"block_{i}",
            )(img, train)
        img = jnp.max(img, axis=(1, 2))  # global max pool
        emb = nn.Dense(
            self.cfg.embedding_dim, dtype=cdt, param_dtype=pdt, name="embed"
        )(img)
        return emb.astype(jnp.float32)


class MelSpecClassifier(nn.Module):
    """Frontend + 2D encoder + softmax head; same surface as SpeakerClassifier."""

    cfg: EncoderConfig
    mel: MelConfig
    num_classes: int = 2
    sample_rate: int = 16000

    def setup(self):
        self.encoder = MelSpecEncoder(self.cfg, self.mel, self.sample_rate,
                                      name="encoder")
        self.head = nn.Dense(
            self.num_classes,
            dtype=_DTYPES[self.cfg.compute_dtype],
            param_dtype=_DTYPES[self.cfg.param_dtype],
            name="head",
        )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.encoder(x, train)).astype(jnp.float32)

    def embed(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encoder(x, train)
