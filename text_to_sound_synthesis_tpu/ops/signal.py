"""Signal processing layer (L0): wav <-> mel-spectrogram, self-contained.

Re-implements the reference's canonical mel recipe
(``Codebook/feature_extraction/extract_mel_spectrogram.py:141-163``) and the
vocoder-training log-mel (``Diffsound/vocoder/modules.py:26-69``) without librosa:
the Slaney mel filterbank, STFT, the normalized-dB chain, Griffin-Lim, and a
jittable batched JAX path for on-device feature extraction.

Canonical recipe (22 050 Hz, 10 s clips):
  ``|STFT(nfft=1024, hop=256, hann, center, reflect)|**1 -> mel(80, fmin=125,
  fmax=7600, slaney) -> max(1e-5) -> log10 -> *20 -> -20 -> +100 -> /100 ->
  clip[0,1] -> trim to 860 frames``.
Specs are stored in [0, 1]; models consume ``2*x - 1`` (caps_dataset.py:62).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "MelConfig",
    "CANONICAL",
    "mel_filterbank",
    "hann_window",
    "stft_magnitude_np",
    "wav_to_mel_np",
    "denormalize_mel_np",
    "mel_to_wav_np",
    "stft_magnitude",
    "wav_to_mel",
    "audio_to_logmel",
    "griffin_lim",
]


class MelConfig:
    """Static parameters of the mel pipeline (hashable; usable as a jit static arg)."""

    def __init__(
        self,
        sample_rate: int = 22050,
        n_fft: int = 1024,
        hop_length: int = 256,
        win_length: int | None = None,
        n_mels: int = 80,
        fmin: float = 125.0,
        fmax: float | None = 7600.0,
        spec_power: float = 1.0,
        max_frames: int = 860,
    ):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length or n_fft
        self.n_mels = n_mels
        self.fmin = fmin
        self.fmax = fmax if fmax is not None else sample_rate / 2
        self.spec_power = spec_power
        self.max_frames = max_frames

    def _key(self):
        return (
            self.sample_rate, self.n_fft, self.hop_length, self.win_length,
            self.n_mels, self.fmin, self.fmax, self.spec_power, self.max_frames,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, MelConfig) and self._key() == other._key()


#: The canonical Diffsound recipe (see module docstring).
CANONICAL = MelConfig()


# ---------------------------------------------------------------------------
# Mel filterbank (Slaney scale + Slaney area normalization, librosa defaults)
# ---------------------------------------------------------------------------

def _hz_to_mel(freq: np.ndarray, htk: bool = False) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above.
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mels = freq / f_sp
    above = freq >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(mels: np.ndarray, htk: bool = False) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = f_sp * mels
    above = mels >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, 1 + n_fft//2).

    Numerically equivalent to ``librosa.filters.mel`` with default arguments
    (Slaney scale, Slaney per-filter area normalization), which both the dataset
    recipe (fmin=125, fmax=7600) and MelGAN's ``Audio2Mel`` (fmin=0, fmax=None)
    rely on.
    """
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_min, mel_max = _hz_to_mel(np.array([fmin, fmax]), htk=htk)
    mel_f = _mel_to_hz(np.linspace(mel_min, mel_max, n_mels + 2), htk=htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"unsupported mel norm: {norm!r}")
    return weights.astype(dtype)


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (== torch.hann_window == scipy fftbins=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _fft_window(win_length: int, n_fft: int, dtype=np.float32) -> np.ndarray:
    """Hann window center-padded to n_fft (librosa's pad_center convention)
    — shared by the numpy and JAX STFT paths so win_length < n_fft behaves
    identically on both."""
    window = hann_window(win_length, dtype=dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    return window


# ---------------------------------------------------------------------------
# Host-side (numpy) pipeline — offline dataset preparation
# ---------------------------------------------------------------------------

def stft_magnitude_np(
    y: np.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> np.ndarray:
    """|STFT| of a mono signal, shape (1 + n_fft//2, n_frames)."""
    win_length = win_length or n_fft
    y = np.asarray(y, dtype=np.float64)
    if center:
        y = np.pad(y, n_fft // 2, mode=pad_mode)
    n_frames = 1 + (len(y) - n_fft) // hop_length
    window = _fft_window(win_length, n_fft, dtype=np.float64)
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    frames = y[idx] * window[None, :]
    return np.abs(np.fft.rfft(frames, n=n_fft, axis=1)).T


def wav_to_mel_np(y: np.ndarray, cfg: MelConfig = CANONICAL) -> np.ndarray:
    """wav -> normalized mel in [0, 1], shape (n_mels, <=max_frames).

    The canonical ``TRANSFORMS`` chain (extract_mel_spectrogram.py:141-151).
    """
    spec = stft_magnitude_np(y, cfg.n_fft, cfg.hop_length, cfg.win_length) ** cfg.spec_power
    basis = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, dtype=np.float64)
    mel = basis @ spec
    mel = np.maximum(1e-5, mel)
    mel = (np.log10(mel) * 20.0 - 20.0 + 100.0) / 100.0
    mel = np.clip(mel, 0.0, 1.0)
    return mel[:, : cfg.max_frames].astype(np.float32)


def denormalize_mel_np(mel01: np.ndarray, cfg: MelConfig = CANONICAL) -> np.ndarray:
    """[0, 1] normalized mel -> linear mel power (inverse of the dB chain)."""
    return 10.0 ** ((mel01 * 100.0 - 100.0 + 20.0) / 20.0)


def _mel_to_stft_np(mel_power: np.ndarray, cfg: MelConfig, n_iter: int = 200) -> np.ndarray:
    """Invert the mel projection with multiplicative-update NNLS.

    The reference relies on ``librosa.feature.inverse.mel_to_stft`` (NNLS); we
    solve min ||B s - m||^2 s.t. s >= 0 with Lee-Seung multiplicative updates,
    which converges to the same least-squares fixed point.
    """
    basis = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, dtype=np.float64)
    mel_power = np.asarray(mel_power, dtype=np.float64)
    # Initialize from the transpose projection (librosa uses a similar warm start).
    s = np.maximum(1e-10, basis.T @ mel_power)
    btb = basis.T @ basis
    btm = basis.T @ mel_power
    for _ in range(n_iter):
        s *= btm / np.maximum(btb @ s, 1e-12)
    return np.power(np.maximum(s, 0.0), 1.0 / cfg.spec_power)


def mel_to_wav_np(mel01: np.ndarray, cfg: MelConfig = CANONICAL, n_iter: int = 32) -> np.ndarray:
    """Normalized mel -> waveform via NNLS + Griffin-Lim (the ``inv_transforms``
    fallback path, extract_mel_spectrogram.py:154-163). MelGAN is the production
    vocoder; this exists for parity/debugging."""
    spec = _mel_to_stft_np(denormalize_mel_np(mel01, cfg), cfg)
    wav = griffin_lim(jnp.asarray(spec, dtype=jnp.float32), cfg, n_iter=n_iter)
    return np.asarray(wav)


# ---------------------------------------------------------------------------
# Device-side (JAX) pipeline — batched, jittable
# ---------------------------------------------------------------------------

def _frame(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., samples) -> (..., n_frames, n_fft) framing by gather."""
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    return y[..., idx]


def stft_magnitude(
    y: jnp.ndarray,
    cfg: MelConfig = CANONICAL,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Batched |STFT|: (..., samples) -> (..., n_bins, n_frames)."""
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(cfg.n_fft // 2, cfg.n_fft // 2)]
        y = jnp.pad(y, pad, mode=pad_mode)
    frames = _frame(y, cfg.n_fft, cfg.hop_length)
    window = jnp.asarray(_fft_window(cfg.win_length, cfg.n_fft))
    spec = jnp.fft.rfft(frames * window, n=cfg.n_fft, axis=-1)
    return jnp.abs(spec).swapaxes(-1, -2)


def wav_to_mel(y: jnp.ndarray, cfg: MelConfig = CANONICAL) -> jnp.ndarray:
    """Batched canonical recipe on device: (..., samples) -> (..., n_mels, T)."""
    spec = stft_magnitude(y, cfg) ** cfg.spec_power
    basis = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    mel = jnp.einsum("mf,...ft->...mt", basis, spec)
    mel = jnp.maximum(1e-5, mel)
    mel = (jnp.log10(mel) * 20.0 - 20.0 + 100.0) / 100.0
    mel = jnp.clip(mel, 0.0, 1.0)
    return mel[..., : cfg.max_frames]


def audio_to_logmel(audio: jnp.ndarray, cfg: MelConfig | None = None) -> jnp.ndarray:
    """MelGAN-training log10-mel (vocoder ``Audio2Mel``, modules.py:54-69).

    (..., samples) -> (..., n_mels, n_frames); reflect-pads by
    (n_fft - hop)/2 on both sides, center=False, fmin=0, fmax=None.
    """
    cfg = cfg or MelConfig(fmin=0.0, fmax=None, max_frames=10**9)
    p = (cfg.n_fft - cfg.hop_length) // 2
    pad = [(0, 0)] * (audio.ndim - 1) + [(p, p)]
    audio = jnp.pad(audio, pad, mode="reflect")
    spec = stft_magnitude(audio, cfg, center=False)
    basis = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    mel = jnp.einsum("mf,...ft->...mt", basis, spec)
    return jnp.log10(jnp.clip(mel, min=1e-5))


def _istft(spec: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Inverse STFT with hann-squared overlap-add normalization (center=True)."""
    frames = jnp.fft.irfft(spec.swapaxes(-1, -2), n=cfg.n_fft, axis=-1)
    window = jnp.asarray(_fft_window(cfg.win_length, cfg.n_fft))
    frames = frames * window
    n_frames = frames.shape[-2]
    out_len = cfg.n_fft + cfg.hop_length * (n_frames - 1)
    idx = jnp.arange(cfg.n_fft)[None, :] + cfg.hop_length * jnp.arange(n_frames)[:, None]
    y = jnp.zeros(spec.shape[:-2] + (out_len,), frames.dtype).at[..., idx].add(frames)
    norm = jnp.zeros((out_len,), frames.dtype).at[idx].add(window**2)
    y = y / jnp.maximum(norm, 1e-10)
    return y[..., cfg.n_fft // 2 : out_len - cfg.n_fft // 2]


def griffin_lim(mag: jnp.ndarray, cfg: MelConfig = CANONICAL, n_iter: int = 32, momentum: float = 0.99) -> jnp.ndarray:
    """Griffin-Lim phase recovery as a jitted ``lax.scan``: (n_bins, T) -> (samples,)."""

    def project(angles):
        y = _istft(mag * angles, cfg)
        spec = stft_magnitude_complex(y, cfg)
        return spec

    def step(carry, _):
        angles, prev = carry
        rebuilt = project(angles)
        update = rebuilt - (momentum / (1.0 + momentum)) * prev
        angles = update / jnp.maximum(jnp.abs(update), 1e-16)
        return (angles, rebuilt), None

    init = jnp.exp(2j * jnp.pi * jnp.zeros_like(mag))  # zero phase init
    (angles, _), _ = jax.lax.scan(step, (init.astype(jnp.complex64), jnp.zeros_like(mag, dtype=jnp.complex64)), None, length=n_iter)
    return _istft(mag * angles, cfg)


def stft_magnitude_complex(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Complex STFT used inside Griffin-Lim (center=True, reflect pad)."""
    pad = [(0, 0)] * (y.ndim - 1) + [(cfg.n_fft // 2, cfg.n_fft // 2)]
    y = jnp.pad(y, pad, mode="reflect")
    frames = _frame(y, cfg.n_fft, cfg.hop_length)
    window = jnp.asarray(_fft_window(cfg.win_length, cfg.n_fft))
    return jnp.fft.rfft(frames * window, n=cfg.n_fft, axis=-1).swapaxes(-1, -2)
