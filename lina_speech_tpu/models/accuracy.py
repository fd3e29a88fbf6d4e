"""Top-k accuracy ignoring special indices (reference model/accuracy.py).

Functional, fixed-shape: mask out ignored target ids and average top-k hit
rate over the remainder. The harness uses top_k=10, ignore_index=[0, 1]
(train_lina.py:57-61).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def topk_accuracy(
    logits: Array,
    target: Array,
    top_k: int = 10,
    ignore_index: Sequence[int] = (0, 1),
    mask: Array | None = None,
) -> Array:
    """logits: (..., l); target: (...) int. Returns scalar accuracy."""
    _, idx = jax.lax.top_k(logits, top_k)
    hit = jnp.any(idx == target[..., None], axis=-1)
    valid = jnp.ones_like(target, dtype=bool)
    for ig in ignore_index:
        valid &= target != ig
    if mask is not None:
        valid &= mask
    return jnp.where(valid, hit, False).sum() / jnp.maximum(valid.sum(), 1)
