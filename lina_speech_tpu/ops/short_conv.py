"""Depthwise causal short convolution with decode-time ring state.

TPU-native replacement for the reference's external ``causal-conv1d`` CUDA op
/ FLA ``ShortConvolution`` (reference model/gla.py:19, 101-108, 146-163):
a width-``w`` depthwise causal conv followed by SiLU, whose decode state is
the last ``w`` inputs per channel, carried as part of the model state pytree.

XLA lowers the training-path conv to an MXU/VPU-friendly fused op; the decode
step is a pure gather + dot, fused into the surrounding scan.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def causal_depthwise_conv(
    x: Array, weight: Array, bias: Array | None = None, activation: str = "silu"
) -> Array:
    """Training-path causal depthwise conv.

    Args:
        x: (b, t, d) inputs.
        weight: (d, w) per-channel taps, tap index 0 = oldest.
        bias: optional (d,).

    Returns: (b, t, d), same dtype as x.
    """
    d, w = weight.shape
    xp = jnp.pad(x, ((0, 0), (w - 1, 0), (0, 0)))
    # Unrolled taps: w is tiny (4); XLA fuses this into one pass.
    out = jnp.zeros_like(x, shape=x.shape)
    t = x.shape[1]
    acc = 0.0
    for i in range(w):
        acc = acc + xp[:, i : i + t, :] * weight[:, i][None, None, :]
    out = acc
    if bias is not None:
        out = out + bias[None, None, :]
    if activation == "silu":
        # silu in the IO dtype: the fp32 upcast/downcast pair was measurable
        # step time (VPU convert-bound, like the decode kernel pre-fusion);
        # bf16 sigmoid is numerically safe (bounded output)
        out = out * jax.nn.sigmoid(out)
    return out


def short_conv_step(
    x_t: Array, conv_state: Array, weight: Array, bias: Array | None = None,
    activation: str = "silu",
) -> Tuple[Array, Array]:
    """One decode token through the short conv.

    Args:
        x_t: (b, d) current input.
        conv_state: (w, b, d) time-major ring buffer of the last w inputs
            (index -1 is the most recent). Same contents as the reference
            cache (gla.py:232-238, zeros-initialized (B, dim, conv_size))
            but time-major: the lane dim stays the channel dim, so the
            fused Pallas decode kernel reads it tiling-clean and the
            (w, b, h*dh) <-> (w, b*h, dh) head split is a zero-copy
            reshape.
        weight: (d, w) taps, tap index 0 = oldest.

    Returns: (y_t (b, d), new_conv_state (w, b, d)).
    """
    new_state = jnp.concatenate([conv_state[1:], x_t[None]], axis=0)
    out = jnp.einsum("wbd,dw->bd", new_state, weight)
    if bias is not None:
        out = out + bias[None, :]
    if activation == "silu":
        # same dtype policy as causal_depthwise_conv so the XLA decode
        # fallback bit-matches the XLA training/prefill path (the
        # decode-vs-prefill parity invariant on CPU). The FUSED kernel
        # family (chunk + decode) accumulates taps in f32 and silus in
        # f32 in-VMEM — slightly different rounding; paths that mix the
        # families (e.g. fused prefill + lazy XLA steps on TPU) differ by
        # ~1 bf16 ulp in the conv output, covered by the parity tests'
        # tolerances.
        out = out * jax.nn.sigmoid(out)
    return out, new_state
