"""Core residual blocks: pre-norm mixing block, SwiGLU, rotary self-attention.

TPU-native re-design of reference model/base_blocks.py: modules are flax.linen
(pure pytrees of params), attention state (KV cache) is explicit function
input/output rather than module attributes, and everything traces to static
shapes under jit.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
from lina_speech_tpu.ops.qlinear import QDense
import jax.numpy as jnp

from lina_speech_tpu.ops.rotary import apply_rotary

Array = jnp.ndarray


def sdpa(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array] = None,
    is_causal: bool = False,
    return_weights: bool = False,
) -> Tuple[Array, Optional[Array]]:
    """Softmax attention over (b, h, n, d) tensors; boolean mask True = keep.

    Optionally returns the attention weights (the reference returns them in
    eval mode for alignment visualization, crossatt.py:203-209).
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    if is_causal:
        n, m = logits.shape[-2:]
        causal = jnp.tril(jnp.ones((n, m), dtype=bool), m - n)
        logits = jnp.where(causal, logits, -jnp.finfo(jnp.float32).max)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.finfo(jnp.float32).max)
    w = nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", w.astype(v.dtype), v)
    return out, (w if return_weights else None)


class SwiGLU(nn.Module):
    """SwiGLU MLP with hidden (d*4//3), gate first (base_blocks.py:42-50).

    When both kernels have been tree-swapped to int8 pairs (decode loop,
    utils/quantize.quantize_dense_params) the whole FFN runs as ONE fused
    Pallas launch (ops/qlinear.fused_ffn_int8): the hidden activation never
    reaches HBM and W_in|W_out stream through a single DMA pipeline —
    b1 decode is weight-stream-bound. Opt-out: QLINEAR_FUSED_FFN=0.

    The fused kernel computes weight-only (bf16-activation) numerics, so
    it only dispatches when the effective QLINEAR_MODE is a wonly variant;
    w8a8 / pallas-w8a8 fall through to the two QDense calls, keeping one
    consistent numerics class across the whole quantized forward."""

    d_model: int
    dtype: Any = jnp.float32
    # None -> read QLINEAR_FUSED_FFN at call time (lazy so setting the env
    # var after import still takes effect)
    fused_quant: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = self.d_model * 4 // 3
        p_in = QDense(hidden * 2, dtype=self.dtype, name="p_in")
        p_out = QDense(self.d_model, dtype=self.dtype, name="p_out")
        import os

        fused_quant = self.fused_quant
        if fused_quant is None:
            fused_quant = os.environ.get("QLINEAR_FUSED_FFN", "1") == "1"
        mode = os.environ.get("QLINEAR_MODE", "wonly")
        if mode.split("-", 1)[-1] != "wonly":
            fused_quant = False  # fused kernel is weight-only numerics
        if fused_quant and not self.is_initializing():
            from lina_speech_tpu.ops.qlinear import (
                QKEY, SKEY, fused_ffn_int8, is_quantized_leaf,
            )

            kin, bin_ = p_in(x, return_params=True)
            kout, bout = p_out(
                jnp.zeros(x.shape[:-1] + (hidden,), x.dtype),
                return_params=True)
            if is_quantized_leaf(kin) and is_quantized_leaf(kout):
                return fused_ffn_int8(
                    x, kin[QKEY], kin[SKEY], bin_,
                    kout[QKEY], kout[SKEY], bout,
                    out_dtype=self.dtype or jnp.bfloat16)
        gx = p_in(x)
        gate, h = jnp.split(gx, 2, axis=-1)
        return p_out(nn.silu(gate) * h)


class SelfAttention(nn.Module):
    """Rotary multi-head self-attention, no output projection.

    Matches reference base_blocks.py:9-40: fused qkv Dense, rotary over the
    first half of head channels, optional causal mask, optional external KV
    cache (kv tuple in, kv tuple out) with ``time_step`` rotary offset.
    """

    dim: int
    heads: int
    rotary: bool = True
    is_causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        mask: Optional[Array] = None,
        pos: Optional[Array] = None,
        kv_cache: Optional[Tuple[Array, Array]] = None,
        time_step: int | Array = 0,
    ):
        b, n, _ = x.shape
        d_head = self.dim // self.heads
        qkv = QDense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(b, n, self.heads, d_head).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        if kv_cache is not None:
            k = jnp.concatenate([kv_cache[0], k], axis=2)
            v = jnp.concatenate([kv_cache[1], v], axis=2)
        new_cache = (k, v)

        if self.rotary:
            rot = d_head // 2
            if pos is not None:
                q = apply_rotary(q, pos, rot)
                k = apply_rotary(k, pos, rot)
            else:
                q = apply_rotary(q, jnp.arange(n) + time_step, rot)
                k = apply_rotary(k, jnp.arange(k.shape[2]), rot)

        y, _ = sdpa(q, k, v, mask=mask, is_causal=self.is_causal)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        if kv_cache is not None:
            return y, new_cache
        return y


class MixingBlock(nn.Module):
    """Pre-norm residual block: x += tmix(ln(x)); x += cmix(ln(x)); dropout.

    ``tmix`` may return (y, aux) (e.g. GLA returning state); aux is threaded
    back to the caller. ``step`` runs the single-token decode path through a
    stateful tmix (GLA). Reference base_blocks.py:56-69.
    """

    tmix: nn.Module
    cmix: nn.Module
    dropout: float = 0.0

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        if self.dropout > 0.0:
            self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: Array, deterministic: bool = True, **tmix_kwargs):
        out = self.tmix(self.norm1(x), **tmix_kwargs)
        aux = None
        if isinstance(out, tuple):
            out, aux = out[0], out[1:]
        x = out + x
        x = self.cmix(self.norm2(x)) + x
        if self.dropout > 0.0:
            x = self.drop(x, deterministic=deterministic)
        if aux is not None:
            return (x, *aux)
        return x

    def step(self, x_t: Array, state):
        """One decode token; tmix must expose ``step(x_t, state)``."""
        y, state = self.tmix.step(self.norm1(x_t), state)
        x = y + x_t
        x = self.cmix(self.norm2(x)) + x
        return x, state

    def step_lazy(self, x_t: Array, state, p):
        """Lazy micro-chunk decode token (tmix must expose ``step_lazy``)."""
        y, state = self.tmix.step_lazy(self.norm1(x_t), state, p)
        x = y + x_t
        x = self.cmix(self.norm2(x)) + x
        return x, state
