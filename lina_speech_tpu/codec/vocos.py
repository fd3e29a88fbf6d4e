"""Vocos-style vocoder backbone (ConvNeXt + pos_net attention), NHC layout.

Re-designs the reference decoder backbone (decoder/models.py:152-235,
decoder/modules.py:8-60) for TPU: everything runs in (B, T, C) layout so the
pointwise convs are plain MXU matmuls and XLA fuses norms/activations; the
(B, C, L) transposes of the torch version exist only at the public API edge.

Flagship (WavTokenizer medium-speech) dims: input 512, dim 768,
intermediate 2304, 12 ConvNeXt layers, ISTFT n_fft 1280 hop 320.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _conv1d_same(x: Array, kernel: Array, bias: Optional[Array], groups: int = 1) -> Array:
    """x: (B, T, C_in); kernel: (k, C_in/groups, C_out); 'same' padding."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias
    return y


class Conv1d(nn.Module):
    """Stride-1 'same' conv in NHC layout (torch Conv1d with padding=k//2)."""

    features: int
    kernel_size: int
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
        return _conv1d_same(x, kernel.astype(self.dtype), bias.astype(self.dtype),
                            self.groups)


class AdaLayerNorm(nn.Module):
    """Per-class scale/shift LayerNorm (decoder/modules.py:63-79)."""

    num_embeddings: int
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array, cond_id: Array) -> Array:
        scale = nn.Embed(self.num_embeddings, self.dim,
                         embedding_init=nn.initializers.ones, name="scale")(cond_id)
        shift = nn.Embed(self.num_embeddings, self.dim,
                         embedding_init=nn.initializers.zeros, name="shift")(cond_id)
        x = nn.LayerNorm(epsilon=self.eps, use_bias=False, use_scale=False)(x)
        return x * scale + shift


class ConvNeXtBlock(nn.Module):
    """Depthwise k7 conv -> LN -> MLP -> layer-scale, residual
    (decoder/modules.py:8-60)."""

    dim: int
    intermediate_dim: int
    layer_scale_init_value: float = 0.0
    adanorm_num_embeddings: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, cond_id: Optional[Array] = None) -> Array:
        residual = x
        x = Conv1d(self.dim, 7, groups=self.dim, dtype=self.dtype, name="dwconv")(x)
        if self.adanorm_num_embeddings:
            x = AdaLayerNorm(self.adanorm_num_embeddings, self.dim, name="norm")(x, cond_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda _, s: jnp.full(s, self.layer_scale_init_value, jnp.float32),
                (self.dim,),
            )
            x = x * gamma.astype(x.dtype)
        return residual + x


class ResnetBlock(nn.Module):
    """GroupNorm/swish/conv3 x2 residual block (decoder/models.py:19-78)."""

    dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = nn.swish(h)
        h = Conv1d(self.dim, 3, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = nn.swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Conv1d(self.dim, 3, dtype=self.dtype, name="conv2")(h)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over time (decoder/models.py:80-127)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = Conv1d(self.dim, 1, dtype=self.dtype, name="q")(h)
        k = Conv1d(self.dim, 1, dtype=self.dtype, name="k")(h)
        v = Conv1d(self.dim, 1, dtype=self.dtype, name="v")(h)
        w = jnp.einsum("btc,bsc->bts", q, k).astype(jnp.float32) * (self.dim ** -0.5)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        h = jnp.einsum("bts,bsc->btc", w, v)
        h = Conv1d(self.dim, 1, dtype=self.dtype, name="proj_out")(h)
        return x + h


class VocosBackbone(nn.Module):
    """embed conv -> pos_net (resnet+attn) -> LN -> N ConvNeXt -> final LN.

    Reference decoder/models.py:152-235. Input (B, T, C_in); output (B, T, dim).
    """

    input_channels: int
    dim: int
    intermediate_dim: int
    num_layers: int
    layer_scale_init_value: Optional[float] = None
    adanorm_num_embeddings: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, cond_id: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        lsiv = self.layer_scale_init_value or 1.0 / self.num_layers
        x = Conv1d(self.dim, 7, dtype=self.dtype, name="embed")(x)

        x = ResnetBlock(self.dim, dtype=self.dtype, name="pos_net_0")(x, deterministic)
        x = ResnetBlock(self.dim, dtype=self.dtype, name="pos_net_1")(x, deterministic)
        x = AttnBlock(self.dim, dtype=self.dtype, name="pos_net_2")(x)
        x = ResnetBlock(self.dim, dtype=self.dtype, name="pos_net_3")(x, deterministic)
        x = ResnetBlock(self.dim, dtype=self.dtype, name="pos_net_4")(x, deterministic)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="pos_net_5")(x)

        if self.adanorm_num_embeddings:
            x = AdaLayerNorm(self.adanorm_num_embeddings, self.dim, name="norm")(x, cond_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                self.dim, self.intermediate_dim, lsiv,
                self.adanorm_num_embeddings, dtype=self.dtype,
                name=f"convnext_{i}",
            )(x, cond_id)
        return nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)
