"""Codec training losses: mel reconstruction, hinge / least-squares GAN,
feature matching (reference decoder/loss.py).

All pure jnp; the mel filterbank and STFT window are compile-time constants.
"""
from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


# --------------------------------------------------------------- mel
def _hz_to_mel(f, htk: bool = True):
    f = np.asarray(f, np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def _mel_to_hz(m, htk: bool = True):
    m = np.asarray(m, np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None, htk: bool = True) -> np.ndarray:
    """Triangular mel filterbank (n_freqs, n_mels), torchaudio-compatible
    (HTK scale, no area normalization — torchaudio norm=None default)."""
    fmax = fmax or sr / 2
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)
    fb = np.zeros((n_freqs, n_mels))
    for i in range(n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[:, i] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def stft_mag(audio: Array, n_fft: int, hop: int, center: bool = True,
             power: float = 1.0) -> Array:
    """(B, T) -> (B, n_freqs, frames) magnitude**power, hann window."""
    win = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    if center:
        audio = jnp.pad(audio, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    T = audio.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :])
    frames = audio[:, idx] * win  # (B, frames, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag ** power
    return mag.transpose(0, 2, 1)


def safe_log(x: Array, eps: float = 1e-7) -> Array:
    return jnp.log(jnp.maximum(x, eps))


def mel_loss(
    y_hat: Array, y: Array, sample_rate: int = 24000, n_fft: int = 1024,
    hop: int = 256, n_mels: int = 100,
) -> Array:
    """log-mel L1 (reference MelSpecReconstructionLoss, loss.py:12-39)."""
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels).astype(np.float32))
    m1 = safe_log(jnp.einsum("bft,fm->bmt", stft_mag(y_hat, n_fft, hop), fb))
    m2 = safe_log(jnp.einsum("bft,fm->bmt", stft_mag(y, n_fft, hop), fb))
    return jnp.mean(jnp.abs(m1 - m2))


# --------------------------------------------------------------- GAN
def disc_hinge_loss(real_outs: Sequence[Array], fake_outs: Sequence[Array]) -> Array:
    """Hinge discriminator loss (loss.py:42-67)."""
    loss = 0.0
    for r, f in zip(real_outs, fake_outs):
        loss = loss + jnp.mean(jnp.maximum(0.0, 1.0 - r)) + jnp.mean(jnp.maximum(0.0, 1.0 + f))
    return loss / max(len(list(real_outs)), 1)


def gen_hinge_loss(fake_outs: Sequence[Array]) -> Array:
    """Hinge generator loss (loss.py:70-94)."""
    loss = 0.0
    for f in fake_outs:
        loss = loss + jnp.mean(jnp.maximum(0.0, 1.0 - f))
    return loss / max(len(list(fake_outs)), 1)


def feature_matching_loss(fmaps_real: Sequence[Sequence[Array]],
                          fmaps_fake: Sequence[Sequence[Array]]) -> Array:
    """Mean L1 over all discriminator feature maps (loss.py:97-116)."""
    total, count = 0.0, 0
    for fr, ff in zip(fmaps_real, fmaps_fake):
        for a, b in zip(fr, ff):
            total = total + jnp.mean(jnp.abs(a - b))
            count += 1
    return total / max(count, 1)


def lsgan_disc_loss(real_outs, fake_outs) -> Array:
    """Least-squares GAN disc loss (DACGANLoss, loss.py:118-158)."""
    loss = 0.0
    for r, f in zip(real_outs, fake_outs):
        loss = loss + jnp.mean((1.0 - r) ** 2) + jnp.mean(f ** 2)
    return loss


def lsgan_gen_loss(fake_outs) -> Array:
    loss = 0.0
    for f in fake_outs:
        loss = loss + jnp.mean((1.0 - f) ** 2)
    return loss
