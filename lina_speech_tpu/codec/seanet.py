"""SEANet convolutional audio encoder (EnCodec-style), NHC layout.

TPU rebuild of the reference encoder stack (encoder/modules/seanet.py:66-144,
conv padding semantics from encoder/modules/conv.py:54-105): conv k7 ->
per-ratio [residual block + strided downsample] -> 2-layer LSTM (+skip) ->
final conv to the latent dim. Weight-norm is folded into plain kernels at
checkpoint-conversion time.

WavTokenizer "320_24k" config: ratios [8,5,4,2] (hop 320 -> 75 Hz at 24 kHz),
n_filters 32, dim 512, 1 residual layer, ELU, reflect padding, non-causal.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _same_pad_amounts(length: int, k: int, stride: int, dilation: int = 1) -> Tuple[int, int]:
    """Asymmetric 'same' padding incl. extra right-pad so the last window is
    full (encoder/modules/conv.py:54-76, 79-105)."""
    padding_total = (k - 1) * dilation - (stride - 1)
    n_frames = (length - k + padding_total) / stride + 1
    ideal = (int(np.ceil(n_frames)) - 1) * stride + (k - padding_total)
    extra = ideal - length
    right = padding_total // 2
    left = padding_total - right
    return left, right + extra


class SConv1d(nn.Module):
    """Conv1d with EnCodec 'same' asymmetric reflect padding, NHC layout."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, c_in // self.groups, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        left, right = _same_pad_amounts(x.shape[1], self.kernel_size, self.stride, self.dilation)
        x = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), window_strides=(self.stride,),
            padding="VALID", rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        return y + bias.astype(self.dtype)


class SEANetResnetBlock(nn.Module):
    """ELU/conv3 -> ELU/conv1 with 1x1-conv shortcut (true_skip=False)
    (encoder/modules/seanet.py:21-63)."""

    dim: int
    compress: int = 2
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = self.dim // self.compress
        h = nn.elu(x)
        h = SConv1d(hidden, 3, dilation=self.dilation, dtype=self.dtype, name="conv1")(h)
        h = nn.elu(h)
        h = SConv1d(self.dim, 1, dtype=self.dtype, name="conv2")(h)
        shortcut = SConv1d(self.dim, 1, dtype=self.dtype, name="shortcut")(x)
        return shortcut + h


class LSTMLayers(nn.Module):
    """N-layer unidirectional LSTM over time with skip connection
    (encoder/modules/lstm.py:31-39), torch gate order (i, f, g, o)."""

    dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, t, c = x.shape
        y = x
        for layer in range(self.num_layers):
            w_ih = self.param(f"w_ih_{layer}", nn.initializers.lecun_normal(), (c, 4 * self.dim), jnp.float32)
            w_hh = self.param(f"w_hh_{layer}", nn.initializers.lecun_normal(), (self.dim, 4 * self.dim), jnp.float32)
            b_ih = self.param(f"b_ih_{layer}", nn.initializers.zeros, (4 * self.dim,), jnp.float32)
            b_hh = self.param(f"b_hh_{layer}", nn.initializers.zeros, (4 * self.dim,), jnp.float32)

            # hoist the input projection out of the scan: one big MXU matmul
            xproj = y.astype(jnp.float32) @ w_ih + b_ih + b_hh  # (b, t, 4H)

            def step(carry, x_t):
                h, cst = carry
                gates = x_t + h @ w_hh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                g = jnp.tanh(g)
                cst = f * cst + i * g
                h = o * jnp.tanh(cst)
                return (h, cst), h

            init = (jnp.zeros((b, self.dim)), jnp.zeros((b, self.dim)))
            _, hs = jax.lax.scan(step, init, jnp.moveaxis(xproj, 1, 0))
            y = jnp.moveaxis(hs, 0, 1).astype(x.dtype)
        return y + x  # skip (lstm.py:37-39)


class SEANetEncoder(nn.Module):
    """Audio (B, T) -> latent (B, T/hop, dimension)."""

    dimension: int = 512
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)  # decoder order; encoder reverses
    n_residual_layers: int = 1
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    lstm: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: Array) -> Array:
        x = audio[..., None]  # (B, T, 1)
        mult = 1
        x = SConv1d(mult * self.n_filters, self.kernel_size, dtype=self.dtype, name="conv_in")(x)
        for i, ratio in enumerate(reversed(list(self.ratios))):
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters, compress=self.compress,
                    dilation=self.dilation_base ** j, dtype=self.dtype,
                    name=f"res_{i}_{j}",
                )(x)
            x = nn.elu(x)
            x = SConv1d(
                mult * self.n_filters * 2, kernel_size=ratio * 2, stride=ratio,
                dtype=self.dtype, name=f"down_{i}",
            )(x)
            mult *= 2
        if self.lstm:
            x = LSTMLayers(mult * self.n_filters, self.lstm, name="lstm")(x)
        x = nn.elu(x)
        x = SConv1d(self.dimension, self.last_kernel_size, dtype=self.dtype, name="conv_out")(x)
        return x


class SConvTranspose1d(nn.Module):
    """ConvTranspose1d with EnCodec asymmetric trim (conv.py:175-253):
    padding_total = k - stride, trimmed right-heavy after the transpose."""

    features: int
    kernel_size: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, c_in, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_transpose(
            x, kernel.astype(self.dtype), strides=(self.stride,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        y = y + bias.astype(self.dtype)
        padding_total = self.kernel_size - self.stride
        right = padding_total // 2
        left = padding_total - right
        return y[:, left : y.shape[1] - right if right else None, :]


class SEANetDecoder(nn.Module):
    """Latent (B, T', dimension) -> audio (B, T' * hop) (seanet.py:147-238).

    Mirror of the encoder: conv_in -> LSTM -> per-ratio [ELU, transposed
    upsample conv, residual blocks] -> ELU -> conv_out to 1 channel.
    """

    dimension: int = 512
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    lstm: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        mult = int(2 ** len(self.ratios))
        x = SConv1d(mult * self.n_filters, self.kernel_size, dtype=self.dtype,
                    name="conv_in")(z)
        if self.lstm:
            x = LSTMLayers(mult * self.n_filters, self.lstm, name="lstm")(x)
        for i, ratio in enumerate(self.ratios):
            x = nn.elu(x)
            x = SConvTranspose1d(mult * self.n_filters // 2, kernel_size=ratio * 2,
                                 stride=ratio, dtype=self.dtype, name=f"up_{i}")(x)
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters // 2, compress=self.compress,
                    dilation=self.dilation_base ** j, dtype=self.dtype,
                    name=f"res_{i}_{j}",
                )(x)
            mult //= 2
        x = nn.elu(x)
        x = SConv1d(1, self.last_kernel_size, dtype=self.dtype, name="conv_out")(x)
        return x[..., 0]
