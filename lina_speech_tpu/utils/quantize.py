"""Weight-only int8 quantization for the decode loop.

Batch-1 decode is weights-read-bound (BASELINE.md: 718 MB/token bf16 =
0.88 ms at the v5e's ~819 GB/s). Storing the large matrices as int8 +
per-output-channel scales halves the weight traffic; the dequant happens
INSIDE the token loop where XLA fuses it into the GEMV loads (measured:
a 25-layer decode-shaped GEMV chain runs 1.45x faster with in-loop int8
dequant — scripts/probe_int8_gemv.py). Quality knob, opt-in: pass
``weight_quant="int8"`` to :func:`lina_speech_tpu.generate.generate_batch`
(prefill and text encoding always run at full precision).

Scheme: symmetric int8, scale per output channel — for (in, out) Dense
kernels the scale reduces over the contraction axis 0; for ndim>=3 leaves
(per-quantizer logits head (q, l, d), stacked embeddings (q, n, d)) it
reduces over the last axis. Scales keep broadcast shape so dequant is
uniformly ``q * s``.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

QKEY = "int8_q"
SKEY = "int8_s"


def _quantize_leaf(w):
    wf = w.astype(jnp.float32)
    axes = (0,) if w.ndim == 2 else (w.ndim - 1,)
    s = jnp.max(jnp.abs(wf), axis=axes, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {QKEY: q, SKEY: s}


def quantize_params(params, min_size: int = 1 << 16) -> Any:
    """Replace every float leaf with ndim >= 2 and >= ``min_size`` elements
    by an {int8_q, int8_s} pair; everything else passes through (norms,
    biases, conv taps, low-rank gate projections stay full precision)."""

    def walk(node):
        if isinstance(node, Mapping):
            return {k: walk(v) for k, v in node.items()}
        if (hasattr(node, "ndim") and node.ndim >= 2
                and jnp.issubdtype(node.dtype, jnp.floating)
                and node.size >= min_size):
            return _quantize_leaf(node)
        return node

    return walk(params)


def quantize_dense_params(params, min_size: int = 1 << 16,
                          exclude=None) -> Any:
    """Quantize only 2-D Dense ``kernel`` leaves (>= ``min_size`` elements)
    *in place in the tree*: :class:`lina_speech_tpu.ops.qlinear.QDense`
    recognises the {int8_q, int8_s} pair and streams int8 natively through
    the Pallas GEMV kernel — no tree rebuild, no traced dequant. Embedding
    / per-quantizer-head leaves (ndim >= 3, ~2% of weight bytes at the
    flagship config) stay full precision.

    ``exclude``: optional ``fn("/"-joined tree path) -> bool`` — matching
    leaves stay full precision (quality/bandwidth knob; see
    scripts/quality_w8_sensitivity.py for the per-group measurements)."""

    def walk(node, path):
        if isinstance(node, Mapping):
            return {
                k: (_quantize_leaf(v)
                    if (((k == "kernel" and hasattr(v, "ndim")
                          and v.ndim == 2
                          # ShortConvolution also names its (dim, taps<=8)
                          # filter "kernel" — a real Dense features axis is
                          # always wider
                          and v.shape[1] >= 32)
                         # per-quantizer logits head (q, l, d): dequant is
                         # traced into the head einsum (models/lina.py:_head)
                         or (k == "logits_weight" and hasattr(v, "ndim")
                             and v.ndim == 3))
                        and jnp.issubdtype(v.dtype, jnp.floating)
                        and v.size >= min_size
                        and not (exclude is not None
                                 and exclude(f"{path}/{k}")))
                    else walk(v, f"{path}/{k}"))
                for k, v in node.items()
            }
        return node

    return walk(params, "")


def dequantize_params(tree, dtype) -> Any:
    """Rebuild a params tree usable by ``model.apply``: int8 pairs become
    ``q.astype(dtype) * s`` (when traced inside a decode loop, XLA streams
    the int8 representation from HBM)."""

    def walk(node):
        if isinstance(node, Mapping):
            if QKEY in node:
                return node[QKEY].astype(dtype) * node[SKEY].astype(dtype)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(tree)


def quantized_bytes(tree) -> int:
    """Total stored bytes of a (possibly partially) quantized tree."""
    total = 0

    def walk(node):
        nonlocal total
        if isinstance(node, Mapping):
            for v in node.values():
                walk(v)
        elif hasattr(node, "dtype"):
            total += node.size * node.dtype.itemsize

    walk(tree)
    return total
