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
    strictly greater than the target's logit < k — one reduction pass
    instead of ``lax.top_k``'s k-pass/sort lowering (this runs inside the
    train step; B*T*4099 top-k was measurable step time). Equals the
    top_k-based definition whenever the target's logit is not tied with
    the k-th largest (ties are measure-zero for real logits).
    """
    tgt_logit = jnp.take_along_axis(
        logits, target[..., None].astype(jnp.int32), axis=-1
    )
    hit = (logits > tgt_logit).sum(axis=-1) < top_k
    valid = jnp.ones_like(target, dtype=bool)
    for ig in ignore_index:
        valid &= target != ig
    if mask is not None:
        valid &= mask
    return jnp.where(valid, hit, False).sum() / jnp.maximum(valid.sum(), 1)
