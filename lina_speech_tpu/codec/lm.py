"""EnCodec-style language model over codec tokens + compression API.

Working counterpart of the reference's ``LMModel`` (encoder/model.py:27-65,
whose entropy-coding path is dead code in that snapshot — SURVEY.md §2.2):
a streaming-transformer LM predicts per-codebook distributions over the
next RVQ code; an arithmetic coder (codec/ac.py) turns them into a
bitstream. Cross-codebook conditioning matches the reference: position t
is predicted from the SUM of all codebooks' embeddings at positions < t
(offset-by-one input with a dedicated initial token 0).

``compress``/``decompress`` both drive the SAME jitted single-step
streaming function, so encoder and decoder derive bit-identical pdfs by
construction (the reference instead relies on the cdf roundoff contract
to absorb backend float drift; we keep that too, belt and braces).
"""
from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.ac import (
    build_stable_quantized_cdf, make_coder, make_decoder,
)
from lina_speech_tpu.codec.streaming_transformer import (
    StreamingTransformerEncoder, init_streaming_state,
)

Array = jnp.ndarray


class EncodecLM(nn.Module):
    """LM over (b, K, t) codes; returns per-codebook next-code probs."""

    n_q: int
    card: int
    dim: int = 128
    heads: int = 8
    n_layers: int = 4
    past_context: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        self.embeds = [
            nn.Embed(self.card + 1, self.dim, dtype=self.dtype,
                     name=f"emb_{k}")
            for k in range(self.n_q)
        ]
        self.transformer = StreamingTransformerEncoder(
            dim=self.dim, heads=self.heads, n_layers=self.n_layers,
            past_context=self.past_context, dtype=self.dtype,
        )
        self.linears = [
            nn.Dense(self.card, dtype=self.dtype, name=f"head_{k}")
            for k in range(self.n_q)
        ]

    def __call__(self, codes: Array, states: Optional[List] = None,
                 offset: int = 0):
        """codes: (b, K, t) SHIFTED input ids in [0, card] (0 = initial
        token, real code c enters as c+1). Returns (probs (b, K, t, card),
        new_states, new_offset)."""
        x = sum(emb(codes[:, k]) for k, emb in enumerate(self.embeds))
        y, states, offset = self.transformer(x, states, offset)
        logits = jnp.stack([lin(y) for lin in self.linears], axis=1)
        return jax.nn.softmax(logits, axis=-1), states, offset


@functools.lru_cache(maxsize=8)
def _step_fn(model: EncodecLM):
    """One jitted streaming step per model CONFIG (cached — weak item r2#6:
    the old version rebuilt jax.jit per compress/decompress call). Params,
    state and offset are traced arguments, so every file and every step of
    a stream reuses the same compiled program (fixed KV-ring shapes)."""

    @jax.jit
    def step(params, tok, states, offset):
        # tok: (1, K, 1) shifted ids
        return model.apply(params, tok, states, offset)

    return step


def _init_stream(model: EncodecLM):
    states = init_streaming_state(1, model.dim, model.heads, model.n_layers,
                                  model.past_context, model.dtype)
    return states, jnp.zeros((), jnp.int32)


def compress(model: EncodecLM, params, codes: np.ndarray,
             total_range_bits: int = 24) -> bytes:
    """codes: (K, T) ints in [0, card) -> entropy-coded bytes."""
    K, T = codes.shape
    step = _step_fn(model)
    coder = make_coder()  # native C++ coder when buildable (codec/ac.py)
    states, offset = _init_stream(model)
    tok = jnp.zeros((1, K, 1), jnp.int32)  # initial token
    for t in range(T):
        probs, states, offset = step(params, tok, states, offset)
        p = np.asarray(probs[0, :, 0], np.float64)  # (K, card)
        cdfs = np.stack([build_stable_quantized_cdf(p[k], total_range_bits)
                         for k in range(K)])
        if hasattr(coder, "push_many"):
            coder.push_many(codes[:, t], cdfs)
        else:
            for k in range(K):
                coder.push(int(codes[k, t]), cdfs[k])
        tok = jnp.asarray(codes[:, t], jnp.int32)[None, :, None] + 1
    return coder.flush()


def decompress(model: EncodecLM, params, data: bytes, n_q: int, length: int,
               total_range_bits: int = 24) -> np.ndarray:
    """Inverse of :func:`compress` -> (n_q, length) codes."""
    step = _step_fn(model)
    dec = make_decoder(data)
    states, offset = _init_stream(model)
    tok = jnp.zeros((1, n_q, 1), jnp.int32)
    out = np.zeros((n_q, length), np.int64)
    for t in range(length):
        probs, states, offset = step(params, tok, states, offset)
        p = np.asarray(probs[0, :, 0], np.float64)
        cdfs = np.stack([build_stable_quantized_cdf(p[k], total_range_bits)
                         for k in range(n_q)])
        if hasattr(dec, "pull_many"):
            out[:, t] = dec.pull_many(cdfs)
        else:
            for k in range(n_q):
                out[k, t] = dec.pull(cdfs[k])
        tok = jnp.asarray(out[:, t], jnp.int32)[None, :, None] + 1
    return out
