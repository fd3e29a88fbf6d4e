"""Text and speaker conditioning encoders (reference model/encoder.py)."""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
from lina_speech_tpu.ops.qlinear import QDense
import jax.numpy as jnp

from lina_speech_tpu.models.base_blocks import MixingBlock, SelfAttention, SwiGLU

Array = jnp.ndarray


class TextEncoder(nn.Module):
    """Rotary self-attention transformer over text embeddings.

    The (b, n, m) padding mask is OR'd with the identity so fully-padded rows
    still attend to themselves (encoder.py:36-38).
    """

    dim: int
    heads: int
    n_layers: int = 4
    dropout: float = 0.1
    rotary: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.sa = [
            MixingBlock(
                tmix=SelfAttention(self.dim, self.heads, rotary=self.rotary, dtype=self.dtype),
                cmix=SwiGLU(self.dim, dtype=self.dtype),
                dropout=self.dropout,
            )
            for _ in range(self.n_layers)
        ]

    def __call__(self, x: Array, mask: Optional[Array] = None, pos: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        if mask is not None:
            eye = jnp.eye(mask.shape[-1], dtype=bool)[None, None]
            mask = jnp.logical_or(mask[:, None], eye)
        for block in self.sa:
            x = block(x, mask=mask, pos=pos, deterministic=deterministic)
        return x


class SimpleSpeakerEncoder(nn.Module):
    """Windowed self-attention pooling to one speaker vector (encoder.py:45-84).

    ``window_start`` replaces the reference's in-forward random crop (training
    picks a random start >= avoid_n_first_frames; pass it in from the data
    pipeline / a PRNG outside the module so the forward stays pure).
    """

    dim: int
    dim_inner: int
    heads: int
    n_layers: int = 6
    dropout: float = 0.1
    rotary: bool = True
    window_length: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        self.sa = [
            MixingBlock(
                tmix=SelfAttention(self.dim_inner, self.heads, rotary=self.rotary, dtype=self.dtype),
                cmix=SwiGLU(self.dim_inner, dtype=self.dtype),
                dropout=self.dropout,
            )
            for _ in range(self.n_layers)
        ]
        self.in_proj = QDense(self.dim_inner, dtype=self.dtype)
        self.out_proj = QDense(self.dim, dtype=self.dtype)

    def __call__(self, x: Array, window_start: int = 0, deterministic: bool = True) -> Array:
        import jax

        length = min(self.window_length, x.shape[1])
        x = jax.lax.dynamic_slice_in_dim(x, window_start, length, axis=1)
        x = self.in_proj(x)
        for block in self.sa:
            x = block(x, deterministic=deterministic)
        return self.out_proj(x[:, 0])
