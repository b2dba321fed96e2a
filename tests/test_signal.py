"""Signal-layer tests: mel filterbank golden values, STFT parity, round trips."""

import numpy as np
import pytest

import jax.numpy as jnp

from text_to_sound_synthesis_tpu.ops import signal as sg


def test_hz_mel_slaney_golden():
    # Slaney scale: linear below 1 kHz with slope 3/200, log above.
    np.testing.assert_allclose(sg._hz_to_mel(np.array(1000.0)), 15.0, rtol=1e-12)
    np.testing.assert_allclose(sg._hz_to_mel(np.array(200.0 / 3)), 1.0, rtol=1e-12)
    np.testing.assert_allclose(sg._mel_to_hz(np.array(15.0)), 1000.0, rtol=1e-12)
    # 6400 Hz is 27 log-steps above 1 kHz: mel = 15 + 27 = 42
    np.testing.assert_allclose(sg._hz_to_mel(np.array(6400.0)), 42.0, rtol=1e-10)
    # round trip
    f = np.array([0.0, 125.0, 440.0, 1000.0, 4000.0, 7600.0])
    np.testing.assert_allclose(sg._mel_to_hz(sg._hz_to_mel(f)), f, rtol=1e-10)


def test_mel_filterbank_shape_and_norm():
    fb = sg.mel_filterbank(22050, 1024, 80, 125.0, 7600.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # Slaney normalization: each filter integrates (over Hz) to ~2/(width)·width/2 = 1.
    # Check the discrete sum against the analytic area of a unit triangle scaled
    # by enorm: area = width_hz/2 * 2/width_hz = 1, discretized with df spacing.
    df = 22050 / 2 / 512
    areas = fb.sum(axis=1) * df
    assert np.all(areas > 0.8) and np.all(areas < 1.2)
    # Peak frequencies must be monotonically increasing.
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()


def test_mel_filterbank_htk_vs_slaney_differ():
    fb_s = sg.mel_filterbank(22050, 1024, 40, 0.0, None, htk=False)
    fb_h = sg.mel_filterbank(22050, 1024, 40, 0.0, None, htk=True)
    assert not np.allclose(fb_s, fb_h)


def test_stft_sine_peak(rng):
    sr, f0 = 22050, 440.0
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    spec = sg.stft_magnitude_np(y, 1024, 256)
    assert spec.shape[0] == 513
    peak_bin = spec[:, 10:-10].mean(axis=1).argmax()
    np.testing.assert_allclose(peak_bin * sr / 1024, f0, atol=sr / 1024)


def test_stft_np_vs_jax(rng):
    y = rng.standard_normal(22050).astype(np.float32)
    want = sg.stft_magnitude_np(y, 1024, 256)
    got = np.asarray(sg.stft_magnitude(jnp.asarray(y)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_wav_to_mel_canonical_shape(rng):
    y = rng.standard_normal(220500).astype(np.float32)  # 10 s
    mel = sg.wav_to_mel_np(y)
    assert mel.shape == (80, 860)
    assert mel.min() >= 0.0 and mel.max() <= 1.0


def test_wav_to_mel_np_vs_jax(rng):
    y = rng.standard_normal(22050).astype(np.float32)
    want = sg.wav_to_mel_np(y)
    got = np.asarray(sg.wav_to_mel(jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_wav_to_mel_short_window_np_vs_jax(rng):
    # win_length < n_fft: both paths center-pad the window to n_fft (librosa
    # pad_center); the JAX path used to crash on the shape mismatch
    y = rng.standard_normal(22050).astype(np.float32)
    cfg = sg.MelConfig(win_length=512)
    assert cfg.n_fft == 1024
    want = sg.wav_to_mel_np(y, cfg)
    got = np.asarray(sg.wav_to_mel(jnp.asarray(y), cfg))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_db_chain_inverse():
    mel01 = np.linspace(0.01, 1.0, 100).reshape(10, 10)
    power = sg.denormalize_mel_np(mel01)
    back = (np.log10(np.maximum(power, 1e-5)) * 20 - 20 + 100) / 100
    np.testing.assert_allclose(back, mel01, atol=1e-6)


def test_audio_to_logmel_matches_reference_geometry(rng):
    # MelGAN Audio2Mel: seq_len 8192 @ hop 256 -> 32 frames.
    y = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    m = sg.audio_to_logmel(y)
    assert m.shape == (2, 80, 32)
    assert np.isfinite(np.asarray(m)).all()


@pytest.mark.slow
def test_griffinlim_roundtrip_tone():
    """A pure tone should survive mel -> GL -> mel with high correlation."""
    sr = 22050
    t = np.arange(sr * 2) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = sg.wav_to_mel_np(y)
    y_rec = sg.mel_to_wav_np(mel, n_iter=16)
    mel_rec = sg.wav_to_mel_np(np.asarray(y_rec)[: len(y)])
    L = min(mel.shape[1], mel_rec.shape[1]) - 2
    a, b = mel[:, 1:L].ravel(), mel_rec[:, 1:L].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr
