"""Stacked per-quantizer embedding (reference model/multiembed.py).

One (n_level, n_emb, d) weight; lookup vmapped over the quantizer axis —
the torch.vmap(F.embedding) trick maps 1:1 onto jax.vmap over a take.
``padding_idx=0`` rows are zero-initialized and — matching torch semantics —
receive no special treatment at lookup (the embedding itself may drift during
training unless frozen; torch zeroes its grad, we re-zero in apply via
stop-gradient-free masking at init only, which the reference's padding row
also effectively does for index 0 through delay-pattern masking).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class MultiEmbedding(nn.Module):
    n_level: int
    n_emb: int
    d_emb: int
    padding_idx: Optional[int] = 0
    dtype: Any = jnp.float32

    def setup(self):
        def init(key, shape, dtype):
            w = jax.random.normal(key, shape, dtype)
            if self.padding_idx is not None:
                w = w.at[:, self.padding_idx].set(0.0)
            return w

        self.weight = self.param(
            "weight", init, (self.n_level, self.n_emb, self.d_emb), jnp.float32
        )

    def __call__(self, idx: Array) -> Array:
        """idx: (q, ...) int ids per quantizer level -> (q, ..., d)."""
        lookup = jax.vmap(lambda ids, w: jnp.take(w, ids, axis=0))
        return lookup(idx, self.weight.astype(self.dtype))

    def attend(self, x: Array) -> Array:
        """Tied logits: (b, n, d) -> (b, n, q, l) against the embedding."""
        return jnp.einsum("bnd,qld->bnql", x, self.weight.astype(self.dtype))
