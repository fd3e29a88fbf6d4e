"""EnCodec-style model: SEANet encoder + RVQ + SEANet decoder.

Rebuild of the reference's encoder stack (encoder/model.py:122-187) in its
WavTokenizer configuration (single segment, no loudness normalization —
model.py's segmented/normalized paths are EnCodec-compression features the
lina pipeline never exercises; the API surface kept here is
encode / decode / forward). The entropy-coding LM (model.py:27-65) and
arithmetic coder (quantization/ac.py) are compression-only and dead code in
the reference snapshot (imports a missing module) — intentionally omitted.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lina_speech_tpu.codec.seanet import SEANetDecoder, SEANetEncoder
from lina_speech_tpu.codec.vq import (
    VectorQuantizer,
    residual_vq_encode,
    vq_decode,
    vq_encode,
)

Array = jnp.ndarray


class EncodecModel(nn.Module):
    dimension: int = 512
    n_filters: int = 32
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    n_q: int = 1
    bins: int = 4096
    residual: bool = False  # True: classic RVQ; False: WavTokenizer language-VQ
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = SEANetEncoder(
            dimension=self.dimension, n_filters=self.n_filters, ratios=self.ratios,
            dtype=self.dtype,
        )
        self.decoder = SEANetDecoder(
            dimension=self.dimension, n_filters=self.n_filters, ratios=self.ratios,
            dtype=self.dtype,
        )
        self.codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0),
            (self.n_q, self.bins, self.dimension),
        )

    def _quantizer(self) -> VectorQuantizer:
        return VectorQuantizer(
            embed=self.codebook,
            cluster_size=jnp.zeros(self.codebook.shape[:2]),
            embed_avg=self.codebook,
        )

    def encode(self, audio: Array, n_q: Optional[int] = None) -> Array:
        """(B, T) -> codes (n_q, B, T')."""
        latents = self.encoder(audio)
        enc = residual_vq_encode if self.residual else vq_encode
        return enc(latents, self._quantizer(), n_q or self.n_q)

    def decode(self, codes: Array) -> Array:
        """codes (n_q, B, T') -> waveform (B, T'*hop)."""
        return self.decoder(vq_decode(codes, self._quantizer()))

    def __call__(self, audio: Array) -> Array:
        return self.decode(self.encode(audio))
