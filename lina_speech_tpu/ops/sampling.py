"""Top-k / temperature sampling under jit with explicit PRNG keys.

Mirrors ``topk_sampling`` (reference model/tools.py:38-44): keep the top-k
logits, temperature-scale, renormalize and sample. The reference has a quirk
where the k-th-value threshold is computed on *unscaled* logits but compared
against temperature-scaled ones; at ``temp == 1`` (the only setting the
released inference path uses alongside greedy ``k == 1``) both agree. The
default here is the standard formulation: threshold and mask on unscaled
logits, softmax over ``logits / temp`` restricted to the kept set.
``reference_compat=True`` opts into the reference's exact behavior (bug
included) for golden-token parity runs with temp != 1: at temp < 1 more
than k candidates survive the threshold, at temp > 1 fewer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_sampling(key: jax.Array, logits: jnp.ndarray, k: int = 1,
                  temp: float = 1.0, reference_compat: bool = False,
                  approx: bool = False) -> jnp.ndarray:
    """Sample token ids from the top-k of ``logits``.

    Args:
        key: PRNG key.
        logits: (..., vocab) float array.
        k: number of candidates kept (k=1 == greedy argmax).
        temp: softmax temperature applied to kept logits.
        reference_compat: replicate the reference's unscaled-threshold-vs-
            scaled-logits comparison (model/tools.py:41-43) exactly.
        approx: use the TPU-native ``jax.lax.approx_max_k`` (recall ~0.95)
            instead of the exact sort — much cheaper per decode step; the
            candidate set may miss a tail top-k entry, which under
            temperature sampling is statistically immaterial. Ignored in
            reference_compat mode (parity wants exact).

    Returns:
        (...,) int32 sampled ids.
    """
    if k == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if reference_compat and temp > 1.0:
        # at temp > 1 the reference's unscaled-threshold comparison can mask
        # EVERY candidate (max(logits)/temp < kth), which torch would turn
        # into NaNs while jax.random.categorical silently degenerates to
        # index 0 — so "bug included" stops being reference-faithful there.
        # The released inference setting is temp <= 1; refuse beyond it.
        raise ValueError(
            "reference_compat sampling is only reference-faithful for "
            f"temp <= 1 (got temp={temp}); use the default formulation")
    if approx and not reference_compat:
        vals, idx = jax.lax.approx_max_k(logits, k, recall_target=0.95)
        choice = jax.random.categorical(key, vals.astype(jnp.float32) / temp,
                                        axis=-1)
        return jnp.take_along_axis(
            idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    if reference_compat:
        scaled = logits / temp
        masked = jnp.where(scaled < kth, -jnp.inf, scaled)
    else:
        masked = jnp.where(logits < kth, -jnp.inf, logits / temp)
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
