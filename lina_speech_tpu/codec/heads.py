"""Vocoder heads: ISTFT head predicting complex STFT coefficients.

Reference decoder/heads.py:24-67: Linear d -> n_fft+2, split magnitude /
phase, exp(mag) clipped at 1e2, S = mag * (cos p + i sin p), custom
same-padding ISTFT.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from lina_speech_tpu.codec.spectral import istft_same

Array = jnp.ndarray


class ISTFTHead(nn.Module):
    dim: int
    n_fft: int
    hop_length: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: (B, T, dim) -> waveform (B, T*hop)."""
        h = nn.Dense(self.n_fft + 2, dtype=self.dtype, name="out")(x)
        h = h.astype(jnp.float32).transpose(0, 2, 1)  # (B, n_fft+2, T)
        mag, p = jnp.split(h, 2, axis=1)
        mag = jnp.minimum(jnp.exp(mag), 1e2)
        # real/imag kept as separate float arrays: eager complex64 ops are
        # UNIMPLEMENTED on the axon TPU backend (flax init runs eagerly)
        spec = (mag * jnp.cos(p), mag * jnp.sin(p))
        return istft_same(spec, self.n_fft, self.hop_length)


def symexp(x: Array) -> Array:
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


class IMDCTSymExpHead(nn.Module):
    """Alt head: MDCT coefficients through a symmetric exponential
    (reference decoder/heads.py:70-120)."""

    dim: int
    mdct_frame_len: int
    padding: str = "same"
    clip_audio: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from lina_speech_tpu.codec.mdct import imdct

        h = nn.Dense(self.mdct_frame_len // 2, dtype=self.dtype, name="out")(x)
        h = jnp.clip(symexp(h.astype(jnp.float32)), -1e2, 1e2)
        audio = imdct(h, padding=self.padding)
        if self.clip_audio:
            audio = jnp.clip(audio, -1.0, 1.0)
        return audio


class IMDCTCosHead(nn.Module):
    """Alt head: MDCT = exp(m) * cos(p) (reference decoder/heads.py:123-157)."""

    dim: int
    mdct_frame_len: int
    padding: str = "same"
    clip_audio: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from lina_speech_tpu.codec.mdct import imdct

        h = nn.Dense(self.mdct_frame_len, dtype=self.dtype, name="out")(x)
        m, p = jnp.split(h.astype(jnp.float32), 2, axis=-1)
        coeffs = jnp.minimum(jnp.exp(m), 1e2) * jnp.cos(p)
        audio = imdct(coeffs, padding=self.padding)
        if self.clip_audio:
            audio = jnp.clip(audio, -1.0, 1.0)
        return audio
