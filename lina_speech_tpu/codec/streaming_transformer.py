"""Streaming causal transformer with bounded past context.

Rebuild of EnCodec's ``StreamingTransformerEncoder``
(reference encoder/modules/transformer.py — used by the EnCodec
compression LM, not by the lina TTS path): causal self-attention restricted
to a sliding ``past_context`` window, with a streaming API that carries the
last ``past_context`` keys/values as explicit state.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lina_speech_tpu.models.base_blocks import sdpa

Array = jnp.ndarray


class StreamingTransformerLayer(nn.Module):
    dim: int
    heads: int
    hidden_scale: float = 4.0
    dtype: Any = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.qkv = nn.Dense(3 * self.dim, dtype=self.dtype)
        self.out = nn.Dense(self.dim, dtype=self.dtype)
        hidden = int(self.dim * self.hidden_scale)
        self.fc1 = nn.Dense(hidden, dtype=self.dtype)
        self.fc2 = nn.Dense(self.dim, dtype=self.dtype)

    def __call__(self, x: Array, mask: Array,
                 kv_state: Optional[Tuple[Array, Array]] = None):
        b, t, _ = x.shape
        h = self.norm1(x)
        q, k, v = jnp.split(self.qkv(h), 3, axis=-1)
        d_head = self.dim // self.heads
        split = lambda z: z.reshape(b, -1, self.heads, d_head).transpose(0, 2, 1, 3)
        qh, kh, vh = split(q), split(k), split(v)
        if kv_state is not None:
            kh = jnp.concatenate([kv_state[0], kh], axis=2)
            vh = jnp.concatenate([kv_state[1], vh], axis=2)
        y, _ = sdpa(qh, kh, vh, mask=mask)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        x = x + self.out(y)
        x = x + self.fc2(nn.gelu(self.fc1(self.norm2(x))))
        return x, (kh, vh)


class StreamingTransformerEncoder(nn.Module):
    dim: int
    heads: int = 8
    n_layers: int = 5
    past_context: int = 1000
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            StreamingTransformerLayer(self.dim, self.heads, dtype=self.dtype)
            for _ in range(self.n_layers)
        ]
        self.norm_out = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, x: Array, states: Optional[List] = None,
                 offset: int | Array = 0):
        """x: (b, t, d); states: per-layer (k, v) of the last chunk or None.

        Returns (y, new_states, new_offset). Causal attention sees at most
        ``past_context`` positions back (sliding window), matching the
        bounded-state streaming contract.
        """
        b, t, _ = x.shape
        past = 0 if states is None else states[0][0].shape[2]
        # positions: queries offset..offset+t; keys offset-past..offset+t
        qpos = jnp.arange(t)[:, None] + past
        kpos = jnp.arange(past + t)[None, :]
        delta = qpos - kpos
        mask = (delta >= 0) & (delta < self.past_context)
        mask = mask[None, None]

        new_states = []
        for i, layer in enumerate(self.layers):
            st = states[i] if states is not None else None
            x, (kh, vh) = layer(x, mask, st)
            keep = min(self.past_context, kh.shape[2])
            new_states.append((kh[:, :, -keep:], vh[:, :, -keep:]))
        return self.norm_out(x), new_states, offset + t
