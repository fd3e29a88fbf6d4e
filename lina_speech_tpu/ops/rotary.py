"""Rotary position embedding, matching ``rotary_embedding_torch`` semantics.

The reference constructs ``RotaryEmbedding((dim // heads) // 2)`` (e.g.
model/base_blocks.py:15, model/crossatt.py:177): only the *first half* of
each head's channels are rotated, the rest pass through unchanged. Pairing is
interleaved (GPT-J style): channel pairs (0,1), (2,3), ... rotate together.

Functional, stateless: positions are explicit so autoregressive decode can
pass ``time_step`` offsets (crossatt.py:197-202).
"""
from __future__ import annotations

import jax.numpy as jnp


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(x.shape)


def apply_rotary(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    rot_dim: int,
    theta: float = 10000.0,
) -> jnp.ndarray:
    """Rotate the first ``rot_dim`` channels of ``x``.

    Args:
        x: (..., n, d) array with d >= rot_dim.
        positions: (n,) or broadcastable-to-(..., n) integer/float positions.
        rot_dim: number of leading channels to rotate (must be even).
        theta: rotary base.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., n, rot_dim/2)
    angles = jnp.repeat(angles, 2, axis=-1)  # interleaved duplication -> (..., n, rot_dim)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x_rot = x_rot * cos + _rotate_half_interleaved(x_rot) * sin
    return jnp.concatenate([x_rot.astype(x.dtype), x_pass], axis=-1)


class RotaryEmbedding:
    """Lightweight holder mirroring the reference's module-style usage."""

    def __init__(self, rot_dim: int, theta: float = 10000.0):
        self.rot_dim = rot_dim
        self.theta = theta

    def __call__(self, x: jnp.ndarray, offset: int | jnp.ndarray = 0) -> jnp.ndarray:
        n = x.shape[-2]
        positions = jnp.arange(n) + offset
        return apply_rotary(x, positions, self.rot_dim, self.theta)
