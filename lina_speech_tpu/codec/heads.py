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
        spec = mag * (jnp.cos(p) + 1j * jnp.sin(p))
        return istft_same(spec, self.n_fft, self.hop_length)
