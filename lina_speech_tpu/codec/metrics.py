"""Audio quality metrics for vocoder validation.

The reference's validation hooks compute UTMOS / PESQ / periodicity when
enabled (decoder/experiment.py:220-258) — those depend on external
pretrained models and compiled packages unavailable here; the hook
interface is kept (:func:`quality_metrics`) and backed by self-contained
signal metrics: SI-SNR, log-spectral distance, and mel-distance (the same
mel front-end as the training loss).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.losses import mel_filterbank, safe_log, stft_mag

Array = jnp.ndarray


def si_snr(est: Array, ref: Array, eps: float = 1e-8) -> Array:
    """Scale-invariant SNR in dB (higher is better)."""
    est = est - est.mean(axis=-1, keepdims=True)
    ref = ref - ref.mean(axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, axis=-1, keepdims=True)
            / (jnp.sum(ref * ref, axis=-1, keepdims=True) + eps)) * ref
    noise = est - proj
    ratio = jnp.sum(proj ** 2, axis=-1) / (jnp.sum(noise ** 2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def log_spectral_distance(est: Array, ref: Array, n_fft: int = 1024,
                          hop: int = 256) -> Array:
    """RMS distance between log power spectra, in dB."""
    pe = safe_log(stft_mag(est, n_fft, hop) ** 2)
    pr = safe_log(stft_mag(ref, n_fft, hop) ** 2)
    return jnp.sqrt(jnp.mean((10 / np.log(10) * (pe - pr)) ** 2, axis=(1, 2)))


def mel_distance(est: Array, ref: Array, sample_rate: int = 24000,
                 n_fft: int = 1024, hop: int = 256, n_mels: int = 100) -> Array:
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    me = safe_log(jnp.einsum("bft,fm->bmt", stft_mag(est, n_fft, hop), fb))
    mr = safe_log(jnp.einsum("bft,fm->bmt", stft_mag(ref, n_fft, hop), fb))
    return jnp.mean(jnp.abs(me - mr), axis=(1, 2))


def quality_metrics(est: Array, ref: Array, sample_rate: int = 24000,
                    extra_hooks: Optional[Dict] = None) -> Dict[str, Array]:
    """Validation metric bundle. ``extra_hooks`` maps name -> fn(est, ref)
    for externally supplied metrics (UTMOS/PESQ when their models are
    available)."""
    n = min(est.shape[-1], ref.shape[-1])
    est, ref = est[..., :n], ref[..., :n]
    out = {
        "si_snr_db": si_snr(est, ref).mean(),
        "lsd_db": log_spectral_distance(est, ref).mean(),
        "mel_l1": mel_distance(est, ref, sample_rate).mean(),
    }
    for name, fn in (extra_hooks or {}).items():
        out[name] = fn(est, ref)
    return out
