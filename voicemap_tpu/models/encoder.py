"""1D-convolutional waveform encoder.

TPU-native rebuild of the reference encoder (reference:
``voicemap/models.py :: get_baseline_convolutional_encoder(filters,
embedding_dim, input_shape, dropout)`` — SURVEY.md §3.5):

    4 × [Conv1D(f·mult, k, 'same', relu) → BatchNorm → SpatialDropout1D
         → MaxPool1D] → GlobalMaxPool1D → Dense(embedding_dim)

Design choices for TPU:
- NTC layout (batch, time, channels) — flax's native conv layout, lowered by
  XLA onto the MXU as implicit matmuls.
- bfloat16 compute / float32 params by default (configurable); BatchNorm
  statistics are always accumulated in float32.
- Keras ordering preserved: activation *inside* the conv (relu) then BN —
  the reference applies BN after the activation.
- Dilation knob per block supports the deeper dilated stack of BASELINE.json
  config #3 without a separate module.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..config import EncoderConfig

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


class ConvBlock(nn.Module):
    features: int
    kernel_size: int
    pool_size: int
    dropout: float
    dilation: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            kernel_dilation=(self.dilation,),
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        x = nn.relu(x)
        # Keras order: Conv(relu) → BatchNorm (reference encoder).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32)).astype(self.compute_dtype)
        if self.dropout > 0.0:
            # SpatialDropout1D: drop whole channels (broadcast over time).
            x = nn.Dropout(
                rate=self.dropout, broadcast_dims=(1,), deterministic=not train
            )(x)
        if self.pool_size > 1:
            x = nn.max_pool(
                x, window_shape=(self.pool_size,), strides=(self.pool_size,)
            )
        return x


class ConvEncoder(nn.Module):
    """Waveform → embedding. Input (B, T, 1) float32; output (B, D) float32."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        cdt = _DTYPES[cfg.compute_dtype]
        pdt = _DTYPES[cfg.param_dtype]
        x = x.astype(cdt)
        for i, (mult, k, p, dil) in enumerate(
            zip(cfg.filter_multipliers, cfg.kernel_sizes, cfg.pool_sizes, cfg.dilations)
        ):
            x = ConvBlock(
                features=cfg.filters * mult,
                kernel_size=k,
                pool_size=p,
                dropout=cfg.dropout,
                dilation=dil,
                compute_dtype=cdt,
                param_dtype=pdt,
                bn_momentum=cfg.bn_momentum,
                bn_epsilon=cfg.bn_epsilon,
                name=f"block_{i}",
            )(x, train)
        # GlobalMaxPool1D over time.
        x = jnp.max(x, axis=1)
        x = nn.Dense(
            cfg.embedding_dim, dtype=cdt, param_dtype=pdt, name="embed"
        )(x)
        return x.astype(jnp.float32)
