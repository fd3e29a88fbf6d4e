"""Top-k accuracy ignoring special indices (reference model/accuracy.py).

Functional, fixed-shape: mask out ignored target ids and average top-k hit
rate over the remainder. The harness uses top_k=10, ignore_index=[0, 1]
(train_lina.py:57-61).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

Array = jnp.ndarray


def topk_accuracy(
    logits: Array,
    target: Array,
    top_k: int = 10,
    ignore_index: Sequence[int] = (0, 1),
    mask: Array | None = None,
) -> Array:
    """logits: (..., l); target: (...) int. Returns scalar accuracy.

    "Target in top-k" is evaluated as rank-by-comparison — count of logits
    ranked ahead of the target's < k — one reduction pass instead of
    ``lax.top_k``'s k-pass/sort lowering (this runs inside the train step;
    B*T*4099 top-k was measurable step time). Ties are broken by index
    exactly like ``lax.top_k`` (lower index wins), which matters for bf16
    logits where value ties are common (8-bit mantissa over a 4099-way
    vocab).
    """
    tgt = target[..., None].astype(jnp.int32)
    tgt_logit = jnp.take_along_axis(logits, tgt, axis=-1)
    idx = jnp.arange(logits.shape[-1])
    ahead = (logits > tgt_logit) | ((logits == tgt_logit) & (idx < tgt))
    hit = ahead.sum(axis=-1) < top_k
    valid = jnp.ones_like(target, dtype=bool)
    for ig in ignore_index:
        valid &= target != ig
    if mask is not None:
        valid &= mask
    return jnp.where(valid, hit, False).sum() / jnp.maximum(valid.sum(), 1)
