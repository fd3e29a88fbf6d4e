"""Softmax-transformer baseline backbone (reference model/transformer.py).

Causal rotary self-attention blocks with cross-attention interleaved at
chosen layer indices. TPU decode uses *fixed-size* KV buffers carried in an
explicit state pytree (the torch version grows a DynamicCache — dynamic
shapes don't jit; we pre-allocate ``max_seqlen`` and mask).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
from lina_speech_tpu.ops.qlinear import QDense
import flax.struct
import jax
import jax.numpy as jnp

from lina_speech_tpu.models.base_blocks import MixingBlock, SwiGLU, sdpa
from lina_speech_tpu.models.crossatt import CrossAttention
from lina_speech_tpu.ops.rotary import apply_rotary

Array = jnp.ndarray


@flax.struct.dataclass
class KVState:
    """Fixed-size KV cache for one self-attention layer."""

    k: Array  # (b, h, max_seqlen, d_head)
    v: Array
    t: Array  # () int32 — current length


@flax.struct.dataclass
class TransformerState:
    layers: Tuple[KVState, ...]


class CausalSelfAttention(nn.Module):
    """Rotary causal self-attention with fixed-buffer decode step."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    def setup(self):
        self.qkv = QDense(3 * self.dim, dtype=self.dtype)

    def _split(self, x, b, n):
        d_head = self.dim // self.heads
        return x.reshape(b, n, self.heads, d_head).transpose(0, 2, 1, 3)

    def __call__(self, x: Array, mask: Optional[Array] = None,
                 return_kv: bool = False,
                 kv_state: Optional[KVState] = None,
                 time_offset: int | Array = 0):
        """``kv_state``: mid-stream chunk continuation — new keys/values are
        written into the fixed buffer at position ``kv_state.t`` and queries
        attend over the whole valid prefix (rotary at absolute positions)."""
        b, n, _ = x.shape
        q, k, v = jnp.split(self.qkv(x), 3, axis=-1)
        q, k, v = self._split(q, b, n), self._split(k, b, n), self._split(v, b, n)
        rot = (self.dim // self.heads) // 2
        if kv_state is not None:
            t0 = kv_state.t
            pos = jnp.arange(n) + t0
            q, k = apply_rotary(q, pos, rot), apply_rotary(k, pos, rot)
            k_buf = jax.lax.dynamic_update_slice_in_dim(kv_state.k, k, t0, axis=2)
            v_buf = jax.lax.dynamic_update_slice_in_dim(kv_state.v, v, t0, axis=2)
            jpos = jnp.arange(k_buf.shape[2])
            valid = jpos[None, :] <= (t0 + jnp.arange(n))[:, None]  # (n, S)
            y, _ = sdpa(q, k_buf, v_buf, mask=valid[None, None])
            y = y.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
            return y, KVState(k=k_buf, v=v_buf, t=t0 + n)
        pos = jnp.arange(n) + time_offset
        q, k = apply_rotary(q, pos, rot), apply_rotary(k, pos, rot)
        y, _ = sdpa(q, k, v, mask=mask, is_causal=True)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        if return_kv:
            return y, (k, v)
        return y

    def step(self, x_t: Array, state: KVState) -> Tuple[Array, KVState]:
        b = x_t.shape[0]
        q, k, v = jnp.split(self.qkv(x_t), 3, axis=-1)
        d_head = self.dim // self.heads
        shp = lambda z: z.reshape(b, self.heads, 1, d_head)
        q, k, v = shp(q), shp(k), shp(v)
        rot = d_head // 2
        t = state.t
        pos_t = jnp.full((1,), t)
        q = apply_rotary(q, pos_t, rot)
        k = apply_rotary(k, pos_t, rot)
        k_buf = jax.lax.dynamic_update_slice_in_dim(state.k, k, t, axis=2)
        v_buf = jax.lax.dynamic_update_slice_in_dim(state.v, v, t, axis=2)
        valid = (jnp.arange(k_buf.shape[2]) <= t)[None, None, None, :]
        y, _ = sdpa(q, k_buf, v_buf, mask=valid)
        return y.reshape(b, self.dim), KVState(k=k_buf, v=v_buf, t=t + 1)


class TransformerCrossAtt(nn.Module):
    d_model: int
    n_layer: int
    cross_att_layers: Tuple[int, ...] = ()
    heads: int = 4
    cross_att_heads: int = 2
    dropout_att: float = 0.1
    cross_att_rotary: bool = True
    max_seqlen: int = 2048
    dtype: Any = jnp.float32

    def setup(self):
        self.blocks = [
            MixingBlock(
                tmix=CausalSelfAttention(self.d_model, self.heads, dtype=self.dtype),
                cmix=SwiGLU(self.d_model, dtype=self.dtype),
            )
            for _ in range(self.n_layer)
        ]
        self.cross_att = [
            CrossAttention(self.d_model, self.d_model, self.d_model,
                           self.cross_att_heads, rotary=self.cross_att_rotary,
                           dtype=self.dtype)
            for _ in self.cross_att_layers
        ]

    def __call__(self, x, ctx, mask=None, reset_mask=None, init_state=None,
                 crossatt_pos=None, return_att: bool = False,
                 output_final_state: bool = False, deterministic: bool = True,
                 conv_history: bool = False, time_offset: int | Array = 0,
                 crossatt_pos_valid=None):
        """``conv_history=True`` (name shared with the recurrent backbones'
        mid-stream contract) continues from ``init_state``'s fixed KV
        buffers: this chunk's keys/values land at position ``t`` and its
        rotary/cross-att positions start at ``time_offset``."""
        idx = {k: i for i, k in enumerate(self.cross_att_layers)}
        att = None
        b, n, _ = x.shape
        finals = []
        if conv_history and init_state is None:
            raise ValueError("conv_history=True requires init_state")
        for i, blk in enumerate(self.blocks):
            if conv_history:
                x, st = blk(x, deterministic=deterministic,
                            kv_state=init_state.layers[i],
                            time_offset=time_offset)
                finals.append(st)
            elif output_final_state:
                # MixingBlock threads the tmix aux (k, v) back out
                x, kv = blk(x, deterministic=deterministic, return_kv=True,
                            time_offset=time_offset)
                k_full, v_full = kv
                pad = self.max_seqlen - n
                kvpad = lambda z: jnp.pad(z, ((0, 0), (0, 0), (0, pad), (0, 0)))
                finals.append(KVState(k=kvpad(k_full), v=kvpad(v_full),
                                      t=jnp.asarray(n, jnp.int32)))
            else:
                x = blk(x, deterministic=deterministic)
            if i in idx:
                v, a = self.cross_att[idx[i]](x, ctx, mask=mask,
                                              time_step=time_offset,
                                              return_weights=return_att)
                x = x + v
                if a is not None:
                    att = a if att is None else jnp.concatenate([att, a], axis=1)
        if output_final_state or conv_history:
            return x, att, TransformerState(layers=tuple(finals))
        return x, att

    def step(self, y_embd: Array, x_enc: Array, state: TransformerState,
             mask=None, crossatt_pos=None, time_step=None, lazy_p=None,
             crossatt_pos_valid=None):
        if lazy_p is not None:
            raise NotImplementedError(
                "lazy decode applies to linear-attention backbones; the "
                "transformer baseline uses a KV cache")
        idx = {k: i for i, k in enumerate(self.cross_att_layers)}
        layers = list(state.layers)
        atts = []
        t = state.layers[0].t
        for i, blk in enumerate(self.blocks):
            y_embd, layers[i] = blk.step(y_embd, layers[i])
            if i in idx:
                v, a = self.cross_att[idx[i]](
                    y_embd[:, None], x_enc, mask=mask, time_step=t,
                    return_weights=True,
                )
                y_embd = y_embd + v[:, 0]
                atts.append(a[:, :, 0])
        att = jnp.concatenate(atts, axis=1) if atts else None
        return y_embd, att, TransformerState(layers=tuple(layers))

    def empty_state(self, batch_size: int, dtype: Any = jnp.float32) -> TransformerState:
        d_head = self.d_model // self.heads
        mk = lambda: KVState(
            k=jnp.zeros((batch_size, self.heads, self.max_seqlen, d_head), dtype),
            v=jnp.zeros((batch_size, self.heads, self.max_seqlen, d_head), dtype),
            t=jnp.zeros((), jnp.int32),
        )
        return TransformerState(layers=tuple(mk() for _ in range(self.n_layer)))
