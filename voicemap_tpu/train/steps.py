"""Fused on-device train/eval steps.

The TPU-native answer to the reference's ``fit_generator`` +
multiprocessing-worker pipeline (SURVEY.md §3.1 hot loops #1 and #2): one
compiled XLA program per step that performs **sampling → fragment gather →
decimate/whiten → forward → loss → backward → Adam update** with zero host
involvement beyond the PRNG key fold-in. The corpus lives on-device as an
int16 store (``DeviceStore``); host ↔ device traffic per step is O(1).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..data.dataset import AudioStore
from ..ops import preprocess, sampling
from . import losses
from .state import TrainState, apply_updates, make_optimizer


def resolve_pallas_preprocess(cfg: ExperimentConfig) -> bool:
    """None = auto: the fused Pallas path on TPU, the XLA chain elsewhere."""
    flag = cfg.train.use_pallas_preprocess
    if flag is None:
        return jax.default_backend() == "tpu"
    return bool(flag)


def resolve_fused_block0(cfg: ExperimentConfig, model) -> bool:
    """Fused block-0 train step (models/fused_train.py): None = auto on TPU.

    Only the waveform conv models qualify — the mel-spectrogram 2D stack has
    a different variable tree and stays on flax apply.
    """
    from ..models.classifier import SpeakerClassifier
    from ..models.siamese import SiameseNet

    if not isinstance(model, (SpeakerClassifier, SiameseNet)):
        return False
    flag = cfg.train.use_fused_block0
    if flag is None:
        return jax.default_backend() == "tpu"
    return bool(flag)


def _fused_impl() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


# Largest per-block full-rate activation (bytes) at which the save-act
# fused blocks-1+ op still fits next to the rest of the train program on a
# 16 GB v5e. Measured round 3: with the lane-view/argmax-index routing the
# B=2048 program (block-1 act 3.1 GB) compiles and runs 248 ms fwd+bwd vs
# 396 ms flax; the next power of two (6.3 GB/block) cannot fit — total
# save-act residuals alone would exceed HBM.
_SAVE_ACT_LIMIT_BYTES = 3.5e9

# Below this block-1 activation size the fused blocks-1+ op LOSES to
# autodiff: the program is dispatch/epilogue-bound and the op's extra
# pool-rate residual writes + custom-VJP boundaries cost more than the
# routing they save. Measured round 3 (baseline geometry): B=32 (49 MB)
# auto 3.45 vs 3.03 ms with autodiff blocks; B=64 (98 MB) fused already
# wins 7.23 vs 7.91 (BASELINE.md sweep).
_SAVE_ACT_MIN_BYTES = 9e7


def resolve_blockn(cfg: ExperimentConfig) -> str:
    """Blocks-1+ impl for the fused train forward: 'fused' or 'jnp'.

    None = auto (TPU only): the custom-VJP affine-folded op in its save-act
    variant with lane-view/argmax-index pooling (it replaces XLA's
    BN-transpose + reduce_window max-gradient backward with per-phase
    index selects; BASELINE.md round 3 — 1.6× flax fwd+bwd at B=2048) —
    while every block's full-rate activation stays under
    ``_SAVE_ACT_LIMIT_BYTES`` (beyond that the save-act residuals exceed
    HBM, and the recompute variant that WOULD fit measured slower than
    autodiff: the extra conv GEMM costs more than the residual traffic it
    saves, the same verdict as round 2's remat experiment). So: fused when
    it fits, autodiff when it doesn't.
    """
    if cfg.train.quant_forward == "int8":
        # Explicit experiment opt-in: the int8 forward lives in the fused
        # save-act op, so it overrides the auto/size gates below (blocks
        # whose T % pool != 0 still fall back per-block in fused_train).
        return "fused_int8"
    if cfg.train.quant_forward != "none":
        raise ValueError(
            f"TrainConfig.quant_forward must be 'none' or 'int8', "
            f"got {cfg.train.quant_forward!r}"
        )
    flag = cfg.train.use_fused_blockn
    if flag is not None:
        return "fused" if flag else "jnp"
    if jax.default_backend() != "tpu":
        return "jnp"
    e = cfg.encoder
    B = cfg.train.batch_size * (2 if cfg.mode == "siamese" else 1)
    t = cfg.data.model_length
    worst = 0
    for i, (mult, pool) in enumerate(zip(e.filter_multipliers, e.pool_sizes)):
        if i >= 1:  # block 0 never uses the blockn op: it runs the dedicated
            # Pallas block-0 op (VMEM-resident) when eligible, else the
            # autodiff block (whose residuals both policies pay equally)
            worst = max(worst, B * t * e.filters * mult * 2)  # bf16 act
        if pool > 1:
            t //= pool
    return ("fused" if _SAVE_ACT_MIN_BYTES <= worst <= _SAVE_ACT_LIMIT_BYTES
            else "jnp")


@flax.struct.dataclass
class DeviceStore:
    """AudioStore shipped to device memory (or sharded across a mesh).

    ``pallas_ds`` is static pytree metadata recording how the store was
    prepared: 0 = raw audio (XLA preprocessing path), ``d`` > 0 = decimated
    by ``d`` and guard-padded for the fused Pallas kernel. ``fetch_batch``
    dispatches on it, so a store can never be fed to the wrong path.
    """

    audio: jnp.ndarray  # (N, T_store) int16
    lengths: jnp.ndarray  # (N,) int32
    labels: jnp.ndarray  # (N,) int32
    speaker_utts: jnp.ndarray  # (S, max_utt) int32
    speaker_counts: jnp.ndarray  # (S,) int32
    pallas_ds: int = flax.struct.field(pytree_node=False, default=0)

    @classmethod
    def from_host(
        cls, store: AudioStore, device=None, pallas_downsampling: int = 0,
        min_length: int = 0,
    ) -> "DeviceStore":
        """Ship the corpus to device memory.

        ``pallas_downsampling`` > 0 prepares the store for the fused Pallas
        kernel: decimated once by that factor and guard-padded
        (ops/pallas_preprocess.decimate_store); lengths switch to decimated
        units. Required when cfg.train.use_pallas_preprocess is on.

        ``min_length`` zero-pads rows to at least this many raw samples so
        fragment gathers stay in-bounds when every file is shorter than the
        configured fragment (pad=True mode).
        """
        put = partial(jax.device_put, device=device)
        audio = jnp.asarray(store.audio)
        lengths = jnp.asarray(store.lengths)
        if min_length and audio.shape[1] < min_length:
            audio = jnp.pad(audio, ((0, 0), (0, min_length - audio.shape[1])))
        if pallas_downsampling:
            from ..ops.pallas_preprocess import decimate_store

            audio = decimate_store(audio, pallas_downsampling)
            lengths = lengths // pallas_downsampling
        return cls(
            audio=put(audio),
            lengths=put(lengths),
            labels=put(jnp.asarray(store.labels)),
            speaker_utts=put(jnp.asarray(store.speaker_utts)),
            speaker_counts=put(jnp.asarray(store.speaker_counts)),
            pallas_ds=int(pallas_downsampling),
        )


def device_store_for(cfg: ExperimentConfig, audio_store, device=None) -> "DeviceStore":
    """Build a DeviceStore prepared consistently with the preprocessing mode
    this config resolves to (pallas ⇒ pre-decimated + guard-padded store)."""
    ds_factor = cfg.data.downsampling if resolve_pallas_preprocess(cfg) else 0
    return DeviceStore.from_host(
        audio_store, device, pallas_downsampling=ds_factor,
        min_length=cfg.data.fragment_length,
    )


def fetch_batch(
    store: DeviceStore,
    indices: jnp.ndarray,
    key: jax.Array,
    cfg: ExperimentConfig,
    stochastic: bool = True,
) -> jnp.ndarray:
    """indices → preprocessed model inputs (B, T_model, 1).

    Dispatches on how the store was prepared (``store.pallas_ds``): the
    fused Pallas gather+whiten kernel for a pre-decimated store, else the
    XLA gather→decimate→whiten chain — a raw store can never hit the Pallas
    path regardless of the config flag.
    """
    d = cfg.data
    if store.pallas_ds:
        if store.pallas_ds != d.downsampling:
            raise ValueError(
                f"store decimated by {store.pallas_ds} but config expects "
                f"downsampling {d.downsampling}"
            )
        from ..ops.pallas_preprocess import pallas_gather_whiten

        t_out = d.model_length  # store is pre-decimated: lengths in ds units
        offsets = preprocess.sample_offsets(
            key, store.lengths[indices], t_out, stochastic=stochastic
        )
        out = pallas_gather_whiten(
            store.audio, indices.astype(jnp.int32), offsets, t_out,
            d.whiten_rms, d.whiten_eps,
        )
        return out[..., None]
    frag = d.fragment_length
    offsets = preprocess.sample_offsets(
        key, store.lengths[indices], frag, stochastic=stochastic
    )
    rows = preprocess.gather_fragments(store.audio, indices, offsets, frag)
    rows = rows.astype(jnp.float32) * preprocess.INT16_SCALE
    rows = preprocess.stride_decimate(rows, d.downsampling)
    if d.whiten_rms is not None:
        rows = preprocess.whiten(rows, d.whiten_rms, d.whiten_eps)
    return rows[..., None]


def classifier_loss_fn(model, cfg: Optional[ExperimentConfig] = None):
    """Shared by the single-chip and data-parallel train steps.

    With ``cfg`` given and ``resolve_fused_block0`` true, the forward runs
    through the fused block-0 custom-VJP path (models/fused_train.py)
    instead of flax apply — same variables, same semantics, no full-rate
    block-0 activation in HBM.
    """
    if cfg is not None and resolve_fused_block0(cfg, model):
        from ..models import fused_train

        impl = _fused_impl()
        blockn = resolve_blockn(cfg)
        enc_cfg = cfg.encoder

        def fused_loss_fn(params, batch_stats, x, y, dropout_key):
            out, new_bs = fused_train.classifier_train_forward(
                params, batch_stats, enc_cfg, x, dropout_key, impl=impl,
                blockn=blockn,
            )
            loss = losses.softmax_ce(out, y)
            acc = losses.categorical_accuracy(out, y)
            return loss, (new_bs, acc)

        return fused_loss_fn

    def loss_fn(params, batch_stats, x, y, dropout_key):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        loss = losses.softmax_ce(out, y)
        acc = losses.categorical_accuracy(out, y)
        return loss, (mut["batch_stats"], acc)

    return loss_fn


def siamese_loss_fn(model, cfg: ExperimentConfig):
    """Shared by the single-chip and data-parallel train steps."""
    same_label = cfg.siamese.same_label
    use_contrastive = cfg.train.loss == "contrastive"
    margin = cfg.train.contrastive_margin

    if resolve_fused_block0(cfg, model):
        from ..models import fused_train

        impl = _fused_impl()
        blockn = resolve_blockn(cfg)
        enc_cfg, sia_cfg = cfg.encoder, cfg.siamese

        def fused_loss_fn(params, batch_stats, x1, x2, y, dropout_key):
            if use_contrastive:
                Bsz = x1.shape[0]
                stacked = jnp.concatenate([x1, x2], axis=0)
                emb, new_bs = fused_train.siamese_embed_train_forward(
                    params, batch_stats, enc_cfg, stacked, dropout_key,
                    impl=impl, blockn=blockn,
                )
                d = jnp.sqrt(
                    jnp.sum(jnp.square(emb[:Bsz] - emb[Bsz:]), axis=-1) + 1e-12
                )
                loss = losses.contrastive(
                    d, y, margin=margin, same_label=same_label
                )
                pred = jnp.where(
                    d > margin / 2, 1.0 - same_label, float(same_label)
                )
                acc = jnp.mean(pred == y)
            else:
                logits, new_bs = fused_train.siamese_train_forward(
                    params, batch_stats, enc_cfg, sia_cfg, x1, x2,
                    dropout_key, impl=impl, blockn=blockn,
                )
                loss = losses.bce_with_logits(logits, y)
                acc = losses.binary_accuracy(logits, y)
            return loss, (new_bs, acc)

        return fused_loss_fn

    def loss_fn(params, batch_stats, x1, x2, y, dropout_key):
        variables = {"params": params, "batch_stats": batch_stats}
        if use_contrastive:
            # Contrastive loss acts on embedding euclidean distances.
            Bsz = x1.shape[0]
            stacked = jnp.concatenate([x1, x2], axis=0)
            emb, mut = model.apply(
                variables,
                stacked,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_key},
                method=model.embed,
            )
            d = jnp.sqrt(
                jnp.sum(jnp.square(emb[:Bsz] - emb[Bsz:]), axis=-1) + 1e-12
            )
            loss = losses.contrastive(d, y, margin=margin, same_label=same_label)
            # Predicted "different" when d > margin/2; map to the configured
            # label convention (different = 1 - same_label).
            pred = jnp.where(d > margin / 2, 1.0 - same_label, float(same_label))
            acc = jnp.mean(pred == y)
        else:
            logits, mut = model.apply(
                variables,
                x1,
                x2,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_key},
            )
            loss = losses.bce_with_logits(logits, y)
            acc = losses.binary_accuracy(logits, y)
        return loss, (mut["batch_stats"], acc)

    return loss_fn


def make_classifier_train_step(
    model, cfg: ExperimentConfig
) -> Tuple[Callable, Any]:
    """Returns (jitted step, optax tx). Step: (state, store, key) → (state, metrics)."""
    tx = make_optimizer(cfg.train.clipnorm)
    B = cfg.train.batch_size
    loss_fn = classifier_loss_fn(model, cfg)

    @jax.jit
    def step(state: TrainState, store: DeviceStore, key: jax.Array):
        k_idx, k_off, k_drop = jax.random.split(
            jax.random.fold_in(key, state.step), 3
        )
        idx = sampling.sample_classifier_batch(k_idx, store.labels.shape[0], B)
        x = fetch_batch(store, idx, k_off, cfg, stochastic=cfg.data.stochastic)
        y = store.labels[idx]
        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, y, k_drop
        )
        new_state = apply_updates(state, grads, tx, new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    return step, tx


def make_siamese_train_step(
    model, cfg: ExperimentConfig
) -> Tuple[Callable, Any]:
    """Siamese verification step: BCE (default) or contrastive loss.

    Reference: ``experiments/train_siamese_net.py`` training flow
    (SURVEY.md §3.1); pair sampling is the on-device
    ``sample_verification_batch`` instead of forked generator workers.
    """
    tx = make_optimizer(cfg.train.clipnorm)
    B = cfg.train.batch_size
    same_label = cfg.siamese.same_label
    loss_fn = siamese_loss_fn(model, cfg)

    @jax.jit
    def step(state: TrainState, store: DeviceStore, key: jax.Array):
        k_pair, k_off1, k_off2, k_drop = jax.random.split(
            jax.random.fold_in(key, state.step), 4
        )
        batch = sampling.sample_verification_batch(
            k_pair, store.speaker_utts, store.speaker_counts, B, same_label
        )
        x1 = fetch_batch(store, batch.idx_1, k_off1, cfg, cfg.data.stochastic)
        x2 = fetch_batch(store, batch.idx_2, k_off2, cfg, cfg.data.stochastic)
        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x1, x2, batch.labels, k_drop
        )
        new_state = apply_updates(state, grads, tx, new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    return step, tx


def preprocess_fragments(frags_i16: jnp.ndarray, cfg: ExperimentConfig) -> jnp.ndarray:
    """(B, frag) int16 host-cut fragments → (B, T_model, 1) f32 (streaming path)."""
    d = cfg.data
    x = frags_i16.astype(jnp.float32) * preprocess.INT16_SCALE
    x = preprocess.stride_decimate(x, d.downsampling)
    if d.whiten_rms is not None:
        x = preprocess.whiten(x, d.whiten_rms, d.whiten_eps)
    return x[..., None]


def make_streaming_classifier_step(model, cfg: ExperimentConfig):
    """Train step for the host-streaming pipeline (data/pipeline.py):
    (state, fragments (B, frag) int16, labels, key) → (state, metrics)."""
    tx = make_optimizer(cfg.train.clipnorm)
    loss_fn = classifier_loss_fn(model, cfg)

    @jax.jit
    def step(state: TrainState, frags: jnp.ndarray, y: jnp.ndarray, key):
        k_drop = jax.random.fold_in(key, state.step)
        x = preprocess_fragments(frags, cfg)
        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, y, k_drop
        )
        new_state = apply_updates(state, grads, tx, new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    return step, tx


def make_streaming_siamese_step(model, cfg: ExperimentConfig):
    """Siamese train step over host-streamed pair fragments."""
    tx = make_optimizer(cfg.train.clipnorm)
    loss_fn = siamese_loss_fn(model, cfg)

    @jax.jit
    def step(state: TrainState, f1: jnp.ndarray, f2: jnp.ndarray,
             y: jnp.ndarray, key):
        k_drop = jax.random.fold_in(key, state.step)
        x1 = preprocess_fragments(f1, cfg)
        x2 = preprocess_fragments(f2, cfg)
        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x1, x2, y, k_drop
        )
        new_state = apply_updates(state, grads, tx, new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    return step, tx


def make_embed_fn(model, cfg: ExperimentConfig) -> Callable:
    """Jitted (state, store, indices, key) → embeddings, via the fused pipeline."""

    @jax.jit
    def embed(state: TrainState, store: DeviceStore, indices: jnp.ndarray, key):
        x = fetch_batch(store, indices, key, cfg, stochastic=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, x, train=False, method=model.embed)

    return embed
