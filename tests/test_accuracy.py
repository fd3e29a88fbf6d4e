"""topk_accuracy: rank-comparison implementation vs the lax.top_k oracle.

Mirrors reference model/accuracy.py:22-32 semantics (top-k hit rate,
ignore indices 0/1) — the production implementation avoids lax.top_k
inside the train step; this pins it to the sort-based definition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.models.accuracy import topk_accuracy


def _oracle(logits, target, top_k=10, ignore_index=(0, 1), mask=None):
    _, idx = jax.lax.top_k(logits, top_k)
    hit = jnp.any(idx == target[..., None], axis=-1)
    valid = jnp.ones_like(target, dtype=bool)
    for ig in ignore_index:
        valid &= target != ig
    if mask is not None:
        valid &= mask
    return jnp.where(valid, hit, False).sum() / jnp.maximum(valid.sum(), 1)


@pytest.mark.parametrize("top_k", [1, 10])
def test_matches_topk_oracle(top_k):
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (4, 33, 101))
    target = jax.random.randint(jax.random.PRNGKey(1), (4, 33), 0, 101)
    mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.8, (4, 33))
    got = topk_accuracy(logits, target, top_k=top_k, mask=mask)
    want = _oracle(logits, target, top_k=top_k, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_all_ignored_is_zero_not_nan():
    logits = jnp.zeros((2, 3, 5))
    target = jnp.ones((2, 3), jnp.int32)  # all ignore_index=1
    acc = topk_accuracy(logits, target)
    assert float(acc) == 0.0


def test_bf16_ties_match_topk_tiebreak():
    """bf16 logits tie frequently; the rank comparison must break ties by
    index exactly like lax.top_k (lower index wins)."""
    key = jax.random.PRNGKey(7)
    # few distinct bf16 values -> many exact ties
    logits = jnp.round(jax.random.normal(key, (8, 50, 31)) * 2).astype(
        jnp.bfloat16)
    target = jax.random.randint(jax.random.PRNGKey(8), (8, 50), 0, 31)
    got = topk_accuracy(logits, target, top_k=5)
    want = _oracle(logits, target, top_k=5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
