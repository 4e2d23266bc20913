"""ONE parametrized parity sweep over every eval-forward implementation.

The repo intentionally keeps exactly two bf16 eval forwards — the flax
reference (``models/encoder.ConvEncoder``) and the serving forward
(``models/fast_infer.fast_embed``, whose ``_xla_block`` is also the trunk of
the TP embed fn and the quant calibration sweep) — plus the genuinely
different int8 program (``models/quant_infer.quant_embed``). This test pins
them all to ``ConvEncoder.apply`` on randomized configs so any future
BN/pool/epilogue semantics change that drifts one implementation fails here,
not in production (round-3 verdict weak #5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.config import EncoderConfig
from voicemap_tpu.models.encoder import ConvEncoder
from voicemap_tpu.models.fast_infer import fast_embed
from voicemap_tpu.models.quant_infer import quant_embed, quantize_encoder
from voicemap_tpu.parallel import mesh as mesh_mod
from voicemap_tpu.parallel.tensor_parallel import make_tp_encoder_embed_fn


CONFIGS = [
    # (filters, embed, pools, dilations, kernel_sizes, T) — all must keep
    # embedding_dim divisible by the model axis (2) for the TP head.
    dict(filters=8, embedding_dim=8, T=512),
    dict(filters=8, embedding_dim=16, T=768,
         pool_sizes=(4, 2, 2), dilations=(1, 2, 1),
         kernel_sizes=(16, 3, 3), filter_multipliers=(1, 2, 3)),
    dict(filters=4, embedding_dim=8, T=384,
         pool_sizes=(2, 2), dilations=(1, 1), kernel_sizes=(8, 3),
         filter_multipliers=(1, 2)),
]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.parametrize("spec", CONFIGS, ids=["default3", "dilated", "two"])
def test_all_eval_forwards_agree(spec):
    spec = dict(spec)
    T = spec.pop("T")
    cfg = EncoderConfig(dropout=0.0, compute_dtype="float32", **spec)
    model = ConvEncoder(cfg)
    r = np.random.default_rng(5)
    x = jnp.asarray(r.standard_normal((8, T, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    ref = np.asarray(model.apply(variables, x, train=False))

    # serving forward
    fast = np.asarray(fast_embed(variables, cfg, x))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)

    # TP trunk+head on a 2-D mesh (trunk IS fast_infer._xla_block)
    mesh2 = mesh_mod.make_mesh({"data": 4, "model": 2})
    tp = np.asarray(make_tp_encoder_embed_fn(cfg, mesh2)(variables, x))
    np.testing.assert_allclose(tp, ref, rtol=1e-4, atol=1e-4)

    # int8 program: cosine-close (quantization is lossy by design)
    qvars = quantize_encoder(variables, cfg, x)
    q = np.asarray(quant_embed(variables, qvars, cfg, x))
    cos = (q * ref).sum(-1) / (
        np.linalg.norm(q, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-12
    )
    assert cos.min() > 0.99
