"""Vector quantization: nearest-neighbor encode/decode + distributed EMA train.

Rebuilds the reference VQ stack (encoder/quantization/vq.py, core_vq.py)
TPU-first:

- inference: :func:`vq_encode` (argmin squared distance, one matmul on the
  MXU) and :func:`vq_decode` (codebook gather); the WavTokenizer released
  model uses a single 4096 x 512 codebook (n_q = 1, README.md:31).
- training: :func:`ema_codebook_update` — the EMA cluster-size / embed-sum
  update (core_vq.py:217-229) with ``lax.psum`` over the data-parallel mesh
  axis replacing the reference's hand-rolled ``distrib.broadcast_tensors``
  NCCL sync (encoder/distrib.py:55-68): after a psum the update is
  rank-deterministic, so no broadcast is needed.
- the reference's "LanguageVectorQuantization" variant (core_vq.py:367-401:
  each layer re-quantizes the *input*, not the residual) and true residual
  VQ are both provided as pure functions over a stacked codebook.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

Array = jnp.ndarray


@flax.struct.dataclass
class VectorQuantizer:
    """Stacked codebooks (n_q, bins, dim) + EMA stats."""

    embed: Array          # (n_q, bins, dim)
    cluster_size: Array   # (n_q, bins)
    embed_avg: Array      # (n_q, bins, dim)

    @classmethod
    def create(cls, key: jax.Array, n_q: int, bins: int, dim: int) -> "VectorQuantizer":
        embed = jax.random.uniform(key, (n_q, bins, dim), jnp.float32, -1.0, 1.0)
        return cls(embed=embed, cluster_size=jnp.zeros((n_q, bins)),
                   embed_avg=embed)


def _nearest(x: Array, codebook: Array) -> Array:
    """x: (..., d); codebook: (bins, d) -> (...) int32 indices.

    dist = |x|^2 - 2 x.e + |e|^2; argmin == argmax of (2 x.e - |e|^2); the
    x-norm is constant per row, so only one MXU matmul is needed
    (core_vq.py:175-183 computes the same quantity).
    """
    score = 2.0 * x @ codebook.T - jnp.sum(codebook * codebook, axis=-1)
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


def vq_encode(x: Array, quantizer: VectorQuantizer, n_q: Optional[int] = None) -> Array:
    """x: (B, T, d) latents -> codes (n_q, B, T) (language-VQ: every layer
    quantizes the same input, core_vq.py:367-401 / vq.py:115-140 with n_q=1
    at inference)."""
    n_q = n_q if n_q is not None else quantizer.embed.shape[0]
    return jnp.stack([_nearest(x, quantizer.embed[i]) for i in range(n_q)])


def vq_decode(codes: Array, quantizer: VectorQuantizer) -> Array:
    """codes: (n_q, B, T) -> (B, T, d) sum of codebook vectors."""
    out = 0.0
    for i in range(codes.shape[0]):
        out = out + jnp.take(quantizer.embed[i], codes[i], axis=0)
    return out


def residual_vq_encode(x: Array, quantizer: VectorQuantizer, n_q: Optional[int] = None) -> Array:
    """True residual VQ (each layer quantizes the residual; core_vq.py RVQ
    path used by stock EnCodec)."""
    n_q = n_q if n_q is not None else quantizer.embed.shape[0]
    codes = []
    residual = x
    for i in range(n_q):
        idx = _nearest(residual, quantizer.embed[i])
        residual = residual - jnp.take(quantizer.embed[i], idx, axis=0)
        codes.append(idx)
    return jnp.stack(codes)


def kmeans_init(key: jax.Array, x: Array, bins: int, iters: int = 10) -> Array:
    """k-means codebook init from the first batch (core_vq.py:140-151).

    x: (N, d) latents -> (bins, d) centroids. Deterministic given the key, so
    every dp rank computes the identical init (replacing the reference's
    post-init broadcast, distrib.py:55-68)."""
    n, d = x.shape
    idx = jax.random.choice(key, n, (bins,), replace=n < bins)
    centroids = x[idx]

    def step(c, _):
        dist = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = jnp.argmin(dist, axis=1)
        onehot = jax.nn.one_hot(assign, bins, dtype=x.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ x
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), c)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


def expire_dead_codes(
    key: jax.Array,
    quantizer: VectorQuantizer,
    batch_samples: Array,
    threshold: float = 2.0,
    axis_name: Optional[str] = None,
) -> VectorQuantizer:
    """Replace codes whose EMA cluster size fell below ``threshold`` with
    random samples from the current batch (core_vq.py:153-169). With
    ``axis_name``, the batch is the same on every rank only if the caller
    gathers it; we instead draw from the local batch but with a key that is
    identical across ranks and data that is psum-averaged — in practice the
    reference broadcasts rank 0; deterministic keys make that unnecessary."""
    n_q, bins, dim = quantizer.embed.shape
    flat = batch_samples.reshape(-1, dim)
    if axis_name is not None:
        # use the cross-replica mean batch so every rank picks identically
        flat = jax.lax.pmean(flat, axis_name)
    new_embed = []
    for i in range(n_q):
        k_i = jax.random.fold_in(key, i)
        idx = jax.random.choice(k_i, flat.shape[0], (bins,), replace=True)
        repl = flat[idx]
        dead = quantizer.cluster_size[i] < threshold
        new_embed.append(jnp.where(dead[:, None], repl, quantizer.embed[i]))
    return quantizer.replace(embed=jnp.stack(new_embed))


class VQTrainResult(NamedTuple):
    quantized: Array      # straight-through quantized latents
    codes: Array          # (n_q, B, T)
    commit_loss: Array    # scalar commitment MSE
    quantizer: VectorQuantizer


def ema_codebook_update(
    x: Array,
    codes: Array,
    quantizer: VectorQuantizer,
    decay: float = 0.99,
    epsilon: float = 1e-5,
    axis_name: Optional[str] = None,
) -> VectorQuantizer:
    """EMA update of one training step (core_vq.py:217-229).

    With ``axis_name`` set (inside shard_map/pmap over the dp axis), one-hot
    counts and embed sums are psum'd so every rank applies the identical
    update — replacing the reference's buffer broadcast (distrib.py:55-68).
    """
    n_q, bins, dim = quantizer.embed.shape
    flat = x.reshape(-1, dim).astype(jnp.float32)

    new_cs, new_avg = [], []
    for i in range(n_q):
        onehot = jax.nn.one_hot(codes[i].reshape(-1), bins, dtype=jnp.float32)
        counts = onehot.sum(axis=0)
        sums = onehot.T @ flat
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
            sums = jax.lax.psum(sums, axis_name)
        new_cs.append(quantizer.cluster_size[i] * decay + counts * (1 - decay))
        new_avg.append(quantizer.embed_avg[i] * decay + sums * (1 - decay))
    cluster_size = jnp.stack(new_cs)
    embed_avg = jnp.stack(new_avg)

    # laplace smoothing (core_vq.py:224-228)
    n = cluster_size.sum(axis=-1, keepdims=True)
    smoothed = (cluster_size + epsilon) / (n + bins * epsilon) * n
    embed = embed_avg / smoothed[..., None]
    return VectorQuantizer(embed=embed, cluster_size=cluster_size, embed_avg=embed_avg)


def vq_train_step(
    x: Array,
    quantizer: VectorQuantizer,
    n_q: int,
    decay: float = 0.99,
    axis_name: Optional[str] = None,
) -> VQTrainResult:
    """Quantize with straight-through estimator + commitment loss + EMA update
    (core_vq.py:294-315; the reference randomizes n_q in {4,6,8} during
    training, vq.py:103-108 — pass the drawn n_q in)."""
    codes = vq_encode(x, quantizer, n_q)
    quant = vq_decode(codes, quantizer) / max(n_q, 1)
    commit = jnp.mean((jax.lax.stop_gradient(quant) - x) ** 2)
    quant_st = x + jax.lax.stop_gradient(quant - x)
    new_q = ema_codebook_update(x, codes, quantizer, decay, axis_name=axis_name)
    return VQTrainResult(quant_st, codes, commit, new_q)
