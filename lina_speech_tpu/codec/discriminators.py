"""GAN discriminators for codec training: multi-period + multi-resolution.

Rebuild of reference decoder/discriminators.py (HiFi-GAN MPD with periods
(2,3,5,7,11), discriminators.py:20-98; UnivNet MRD over STFT magnitudes at
resolutions 1024/2048/512, discriminators.py:101-202) in NHWC layout.
Weight-norm is omitted (plain convs + spectral-friendly LeakyReLU) — a
training-dynamics choice, not an API difference; kernels fold at conversion.

Each discriminator returns (score, feature_maps) per sub-discriminator.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lina_speech_tpu.codec.losses import stft_mag

Array = jnp.ndarray


class _PeriodDisc(nn.Module):
    period: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        """x: (B, T) -> score (B, ...), fmaps."""
        b, t = x.shape
        p = self.period
        pad = (-t) % p
        x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect" if t > 1 else "constant")
        x = x.reshape(b, -1, p, 1)  # (B, T/p, p, 1) NHWC
        fmaps = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            x = nn.Conv(ch, (5, 1), strides=(3, 1), dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            fmaps.append(x)
        x = nn.Conv(1024, (5, 1), dtype=self.dtype, name="conv_4")(x)
        x = nn.leaky_relu(x, 0.1)
        fmaps.append(x)
        x = nn.Conv(1, (3, 1), dtype=self.dtype, name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(b, -1), fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        outs, fmaps = [], []
        for p in self.periods:
            o, f = _PeriodDisc(p, dtype=self.dtype, name=f"period_{p}")(x)
            outs.append(o)
            fmaps.append(f)
        return outs, fmaps


class _ResolutionDisc(nn.Module):
    n_fft: int
    hop: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        mag = stft_mag(x, self.n_fft, self.hop)  # (B, F, T')
        h = mag.transpose(0, 2, 1)[..., None]  # (B, T', F, 1) NHWC
        fmaps = []
        specs = [((3, 9), (1, 1)), ((3, 9), (1, 2)), ((3, 9), (1, 2)),
                 ((3, 9), (1, 2)), ((3, 3), (1, 1))]
        for i, (kern, stride) in enumerate(specs):
            h = nn.Conv(32, kern, strides=stride, dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            fmaps.append(h)
        h = nn.Conv(1, (3, 3), dtype=self.dtype, name="conv_post")(h)
        fmaps.append(h)
        return h.reshape(x.shape[0], -1), fmaps


class MultiResolutionDiscriminator(nn.Module):
    resolutions: Tuple[Tuple[int, int], ...] = ((1024, 256), (2048, 512), (512, 128))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        outs, fmaps = [], []
        for n_fft, hop in self.resolutions:
            o, f = _ResolutionDisc(n_fft, hop, dtype=self.dtype,
                                   name=f"res_{n_fft}")(x)
            outs.append(o)
            fmaps.append(f)
        return outs, fmaps
