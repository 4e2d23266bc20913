"""Log-mel frontend tests: filterbank properties, jnp STFT vs numpy, fused
Pallas kernel parity (interpret mode), and the 2D-CNN model end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicemap_tpu.config import (
    DataConfig, EncoderConfig, ExperimentConfig, MelConfig, TrainConfig,
)
from voicemap_tpu.ops import melspec
from voicemap_tpu.ops.pallas_melspec import pallas_log_mel

CFG = MelConfig(n_fft=256, hop_length=80, win_length=200, n_mels=32)
SR = 16000


def test_filterbank_shape_and_coverage():
    fb = melspec.mel_filterbank(SR, 512, 64)
    assert fb.shape == (257, 64)
    assert (fb >= 0).all()
    # Every filter has support; filters tile the band.
    assert (fb.sum(axis=0) > 0).all()
    peak_bins = fb.argmax(axis=0)
    assert (np.diff(peak_bins) >= 0).all(), "filter centers must be ordered"


def test_mel_scale_roundtrip():
    f = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 7999.0])
    np.testing.assert_allclose(
        melspec.mel_to_hz(melspec.hz_to_mel(f)), f, rtol=1e-10, atol=1e-8
    )
    np.testing.assert_allclose(
        melspec.mel_to_hz(melspec.hz_to_mel(f, htk=True), htk=True), f,
        rtol=1e-10, atol=1e-6,
    )


def test_frame_signal():
    x = jnp.arange(100, dtype=jnp.float32)[None, :]
    frames = melspec.frame_signal(x, 30, 10)
    assert frames.shape == (1, 8, 30)
    np.testing.assert_array_equal(np.asarray(frames[0, 0]), np.arange(30))
    np.testing.assert_array_equal(np.asarray(frames[0, 3]), np.arange(30, 60))


def test_log_mel_vs_numpy():
    """jnp STFT path vs a direct numpy computation."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3200)).astype(np.float32)
    out = np.asarray(melspec.log_mel_spectrogram(jnp.asarray(x), CFG, SR))
    n_frames = melspec.num_frames(3200, CFG)
    assert out.shape == (2, n_frames, CFG.n_mels)
    win = melspec.hann_window(CFG.win_length)
    fb = melspec.mel_filterbank(SR, CFG.n_fft, CFG.n_mels)
    for b in range(2):
        for f in [0, n_frames // 2, n_frames - 1]:
            seg = x[b, f * CFG.hop_length : f * CFG.hop_length + CFG.win_length]
            spec = np.fft.rfft(seg * win, n=CFG.n_fft)
            power = np.abs(spec) ** 2
            expect = np.log(power @ fb + CFG.log_eps)
            np.testing.assert_allclose(out[b, f], expect, rtol=1e-4, atol=1e-4)


def test_pallas_log_mel_matches_jnp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 3200)), jnp.float32)
    ref = np.asarray(melspec.log_mel_spectrogram(x, CFG, SR))
    out = np.asarray(pallas_log_mel(x, CFG, SR, block_rows=2, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_pallas_log_mel_fused_geometry():
    """hop/win multiples of 128 → the fully fused in-kernel framing path."""
    cfg = MelConfig(n_fft=512, hop_length=128, win_length=384, n_mels=32)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 5120)), jnp.float32)
    ref = np.asarray(melspec.log_mel_spectrogram(x, cfg, SR))
    out = np.asarray(pallas_log_mel(x, cfg, SR, block_rows=2, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_pallas_log_mel_fused_odd_batch():
    """Fused path pads odd batches to the sublane multiple and slices back
    (Mosaic requires frame-scratch writes at multiples of 8; found on-chip
    round 5 via quant mel calibration at B=4)."""
    cfg = MelConfig(n_fft=512, hop_length=128, win_length=384, n_mels=32)
    rng = np.random.default_rng(11)
    for b in (1, 5):
        x = jnp.asarray(rng.standard_normal((b, 5120)), jnp.float32)
        ref = np.asarray(melspec.log_mel_spectrogram(x, cfg, SR))
        out = np.asarray(pallas_log_mel(x, cfg, SR, interpret=True))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_pallas_log_mel_3d_input():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 1600, 1)), jnp.float32)
    ref = np.asarray(melspec.log_mel_spectrogram(x, CFG, SR))
    out = np.asarray(pallas_log_mel(x, CFG, SR, block_rows=2, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_melspec_classifier_trains(corpus_root):
    """End-to-end config #4: mel frontend + 2D CNN through the train loop."""
    from voicemap_tpu.data.dataset import SpeakerDataset
    from voicemap_tpu.models.spectrogram import MelSpecClassifier
    from voicemap_tpu.train import steps as steps_mod
    from voicemap_tpu.train.loop import init_model_state

    cfg = ExperimentConfig(
        mode="melspec2d",
        data=DataConfig(
            data_root=corpus_root, subsets=("dev-clean",), seconds=1.0,
            downsampling=1,
        ),
        encoder=EncoderConfig(filters=16, embedding_dim=16, dropout=0.0,
                              compute_dtype="float32"),
        mel=CFG,
        train=TrainConfig(batch_size=8, learning_rate=3e-3),
    )
    ds = SpeakerDataset(subsets=("dev-clean",), seconds=1.0,
                        data_root=corpus_root, seed=0)
    store = steps_mod.DeviceStore.from_host(ds.to_store())
    model = MelSpecClassifier(cfg.encoder, cfg.mel, num_classes=ds.num_speakers)
    state = init_model_state(model, cfg)
    step, _ = steps_mod.make_classifier_train_step(model, cfg)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(25):
        state, m = step(state, store, key)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), "melspec2d loss flat"
