"""Streaming causal transformer with bounded past context.

Rebuild of EnCodec's ``StreamingTransformerEncoder``
(reference encoder/modules/transformer.py — used by the EnCodec
compression LM, not by the lina TTS path): ``norm_in`` LayerNorm on the
input, absolute sinusoidal positions added at ``offset``
(transformer.py:16-27, 104-113), and causal self-attention restricted to
a sliding ``past_context`` window (delta <= past_context,
transformer.py:52-55).

TPU-native divergence from the reference's design: instead of carrying a
variable-length input cache that is re-attended every chunk, streaming
state is a FIXED-SHAPE per-layer KV ring of exactly ``past_context``
slots — one compiled program serves every step of a stream (variable
state shapes would force an XLA recompile per step). Slot validity is
derived from ``offset`` inside the jitted mask, so the zero-initialised
slots of a young stream are never attended.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lina_speech_tpu.models.base_blocks import sdpa

Array = jnp.ndarray


def create_sin_embedding(positions: Array, dim: int,
                         max_period: float = 10000.0) -> Array:
    """[cos | sin] sinusoidal embedding, reference transformer.py:16-27.

    positions: any shape; returns positions.shape + (dim,).
    """
    assert dim % 2 == 0
    half = dim // 2
    adim = jnp.arange(half, dtype=jnp.float32)
    phase = positions.astype(jnp.float32)[..., None] / (
        max_period ** (adim / (half - 1))
    )
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def init_streaming_state(batch: int, dim: int, heads: int, n_layers: int,
                         past_context: int,
                         dtype: Any = jnp.float32) -> List[Tuple[Array, Array]]:
    """Fixed-shape zero KV ring for :class:`StreamingTransformerEncoder`."""
    d_head = dim // heads
    z = jnp.zeros((batch, heads, past_context, d_head), dtype)
    return [(z, z) for _ in range(n_layers)]


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
                 kv_state: Tuple[Array, Array]):
        """kv_state: fixed (b, h, P, d_head) ring of the previous keys/values
        (oldest first; young-stream slots are zeros masked out by ``mask``)."""
        b, t, _ = x.shape
        h = self.norm1(x)
        q, k, v = jnp.split(self.qkv(h), 3, axis=-1)
        d_head = self.dim // self.heads
        split = lambda z: z.reshape(b, -1, self.heads, d_head).transpose(0, 2, 1, 3)
        qh, kh, vh = split(q), split(k), split(v)
        kcat = jnp.concatenate([kv_state[0], kh], axis=2)
        vcat = jnp.concatenate([kv_state[1], vh], axis=2)
        y, _ = sdpa(qh, kcat, vcat, mask=mask)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        x = x + self.out(y)
        x = x + self.fc2(nn.gelu(self.fc1(self.norm2(x))))
        # roll the ring: keep the newest P keys (static slice, fixed shape)
        P = kv_state[0].shape[2]
        return x, (kcat[:, :, -P:], vcat[:, :, -P:])


class StreamingTransformerEncoder(nn.Module):
    dim: int
    heads: int = 8
    n_layers: int = 5
    past_context: int = 1000
    max_period: float = 10000.0
    norm_input: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            StreamingTransformerLayer(self.dim, self.heads, dtype=self.dtype)
            for _ in range(self.n_layers)
        ]
        if self.norm_input:
            self.norm_in = nn.LayerNorm(epsilon=1e-5)
        self.norm_out = nn.LayerNorm(epsilon=1e-5)

    def init_state(self, batch: int) -> List[Tuple[Array, Array]]:
        return init_streaming_state(batch, self.dim, self.heads,
                                    self.n_layers, self.past_context,
                                    self.dtype)

    def __call__(self, x: Array, states: Optional[List] = None,
                 offset: int | Array = 0):
        """x: (b, t, d); states: per-layer fixed (b, h, P, d_head) KV rings
        (None = fresh stream); offset: #tokens already consumed (traced OK).

        Returns (y, new_states, new_offset). Causal attention sees at most
        ``past_context`` positions back (delta <= past_context, matching
        reference transformer.py:55); absolute sinusoidal positions are
        added to the normed input (transformer.py:108-113).
        """
        b, t, _ = x.shape
        if states is None:
            states = self.init_state(b)
        P = states[0][0].shape[2]
        offset = jnp.asarray(offset, jnp.int32)

        if self.norm_input:
            x = self.norm_in(x)
        positions = jnp.arange(t, dtype=jnp.int32) + offset
        x = x + create_sin_embedding(positions, self.dim,
                                     self.max_period)[None].astype(x.dtype)

        # mask over [P ring slots | t new tokens] for each of the t queries.
        # ring slot i holds global position offset - (P - i): valid iff that
        # is >= 0 (slot actually written) and within the window.
        q_glob = jnp.arange(t, dtype=jnp.int32)[:, None] + offset
        ring_pos = jnp.arange(P, dtype=jnp.int32)[None, :] - P + offset
        new_pos = jnp.arange(t, dtype=jnp.int32)[None, :] + offset
        k_glob = jnp.concatenate([ring_pos, new_pos], axis=1)
        delta = q_glob - k_glob
        written = jnp.concatenate(
            [ring_pos >= 0, jnp.ones((1, t), bool)], axis=1)
        mask = (delta >= 0) & (delta <= self.past_context) & written
        mask = mask[None, None]

        new_states = []
        for i, layer in enumerate(self.layers):
            x, st = layer(x, mask, states[i])
            new_states.append(st)
        return self.norm_out(x), new_states, offset + t
