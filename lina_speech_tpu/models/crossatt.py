"""Cross-attention family: vanilla, "blind" two-pass, and PP variants.

Re-designs reference model/crossatt.py for TPU/JAX: attention weights are
returned under a static ``return_weights`` flag (instead of train/eval
branching), rotary offsets are explicit positions, and the stateful
``pos_net`` / ``inter_net`` blocks thread their GLA state through explicit
pytrees so the whole decode step jits.

- :class:`CrossAttention` — LN(q/k/v proj) -> multi-head SDPA
  (crossatt.py:158-212).
- :class:`BlindCrossAttention` — two-pass attention where pass 1 retrieves
  *positional embeddings* as values and pass 2 attends from the
  pos_net-transformed result back onto positions to fetch content values;
  used by the released "convblind" checkpoints (crossatt.py:76-155).
- :class:`CrossAttentionPP` — two stacked CrossAttentions around an
  inter_net block with learned absolute positions on keys
  (crossatt.py:50-72).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
from lina_speech_tpu.ops.qlinear import QDense
import jax
import jax.numpy as jnp

from lina_speech_tpu.models.base_blocks import sdpa
from lina_speech_tpu.ops.rotary import apply_rotary

Array = jnp.ndarray


class SinPos(nn.Module):
    """Sinusoidal positional embedding (crossatt.py:35-48).

    (b, p) positions -> (b, p, dim): first half sin, second half phase-shifted
    by pi/2 (cos).
    """

    dim: int

    def __call__(self, pos: Array) -> Array:
        exp = jnp.arange(self.dim // 2, dtype=jnp.float32) * 2.0 / self.dim
        angle = pos[..., None].astype(jnp.float32) * jnp.power(10000.0, -exp)
        angle = jnp.concatenate([angle, angle + math.pi / 2], axis=-1)
        return jnp.sin(angle)


class ConvPos(nn.Module):
    """Learned positions + depthwise conv smoothing (crossatt.py:21-32).

    ``valid`` ((b, p) bool, optional) zeroes the conv INPUT at padded
    positions, so for any valid prefix the SAME-padded conv output equals
    an unpadded run of that length exactly (the zeroed tail is what SAME
    padding would have supplied). Slot-based serving mixes text lengths in
    one padded batch; without this the non-causal 31-tap window sees
    learned embeddings of positions past the text tail and server output
    diverges from generate_batch near the end of the text.
    """

    dim: int
    max_seq_len: int = 2000
    kernel_size: int = 31
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos: Array, valid: Optional[Array] = None) -> Array:
        emb = nn.Embed(self.max_seq_len, self.dim, dtype=self.dtype, name="embed")(pos)
        if valid is not None:
            emb = jnp.where(valid[..., None], emb, jnp.zeros((), emb.dtype))
        kernel = self.param(
            "conv_kernel", nn.initializers.lecun_normal(), (self.kernel_size, 1, self.dim), jnp.float32
        )
        bias = self.param("conv_bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        out = jax.lax.conv_general_dilated(
            emb.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.dim,
        )
        return out + bias.astype(self.dtype)


class CrossAttention(nn.Module):
    """LN(projections) -> multi-head SDPA; no output projection."""

    q_dim: int
    k_dim: int
    att_dim: int
    heads: int
    rotary: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.q = QDense(self.att_dim, dtype=self.dtype)
        self.k = QDense(self.att_dim, dtype=self.dtype)
        self.v = QDense(self.att_dim, dtype=self.dtype)
        self.ln_q = nn.LayerNorm(epsilon=1e-5)
        self.ln_k = nn.LayerNorm(epsilon=1e-5)
        self.ln_v = nn.LayerNorm(epsilon=1e-5)

    def __call__(
        self,
        q: Array,
        k: Array,
        v: Optional[Array] = None,
        mask: Optional[Array] = None,
        time_step: Optional[Array] = None,
        return_weights: bool = False,
    ) -> Tuple[Array, Optional[Array]]:
        if v is None:
            v = k
        q = self.ln_q(self.q(q))
        vv = self.ln_v(self.v(v))
        kk = self.ln_k(self.k(k))
        b, n, _ = q.shape
        m = kk.shape[1]
        d_head = self.att_dim // self.heads
        split = lambda t: t.reshape(b, -1, self.heads, d_head).transpose(0, 2, 1, 3)
        qh, kh, vh = split(q), split(kk), split(vv)
        if self.rotary:
            rot = d_head // 2
            offset = 0 if time_step is None else jnp.asarray(time_step)
            if getattr(offset, "ndim", 0) == 1:
                # per-batch decode offsets (slot-based serving: each slot
                # sits at its own position) -> (b, 1, 1) broadcasts over
                # (b, h, n, rot)
                offset = offset[:, None, None]
            qh = apply_rotary(qh, jnp.arange(n) + offset, rot)
            kh = apply_rotary(kh, jnp.arange(m), rot)
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        x, att = sdpa(qh, kh, vh, mask=mask, return_weights=return_weights)
        x = x.transpose(0, 2, 1, 3).reshape(b, n, self.att_dim)
        return x, att


class BlindCrossAttention(nn.Module):
    """Two-pass "blind" cross-attention with a stateful pos_net block.

    pos_net is a MixingBlock whose tmix is a GLA layer (constructed by the
    backbone, reference gla.py:281); its recurrent state rides in the
    caller's state pytree via ``pos_net_state``.
    """

    q_dim: int
    k_dim: int
    att_dim: int
    pos_net: nn.Module
    pos_dim: int = 1024
    pos_type: str = "sinusoidal"
    rotary: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.q = QDense(self.att_dim, dtype=self.dtype)
        self.k = QDense(self.att_dim, dtype=self.dtype)
        self.v = QDense(self.att_dim, dtype=self.dtype)
        self.ln_q = nn.LayerNorm(epsilon=1e-5)
        self.ln_k = nn.LayerNorm(epsilon=1e-5)
        self.ln_v = nn.LayerNorm(epsilon=1e-5)
        if self.pos_type == "sinusoidal":
            self.pos_embed = SinPos(self.pos_dim)
        elif self.pos_type == "convolutional":
            self.pos_embed = ConvPos(self.pos_dim, dtype=self.dtype)
        else:
            raise ValueError(f"unknown pos_type {self.pos_type}")

    def _pos_emb(self, pos: Array, pos_valid: Optional[Array]) -> Array:
        """Positional values; ``pos_valid`` only matters for ConvPos (the
        sinusoidal embedding is per-position, hence padding-invariant)."""
        if pos_valid is not None and self.pos_type == "convolutional":
            return self.pos_embed(pos, valid=pos_valid)
        return self.pos_embed(pos)

    def _proj(self, q, k, time_step=None):
        qq = self.ln_q(self.q(q))
        vv = self.ln_v(self.v(k))
        kk = self.ln_k(self.k(k))
        if self.rotary:
            # single head -> rotate the first att_dim/2 channels
            # (crossatt.py:102,129-134; time_step offsets the query)
            rot = self.att_dim // 2
            off = 0 if time_step is None else jnp.asarray(time_step)
            if getattr(off, "ndim", 0) == 1:
                off = off[:, None]  # per-batch decode offsets -> (b, 1)
            qq = apply_rotary(qq, jnp.arange(qq.shape[1]) + off, rot)
            kk = apply_rotary(kk, jnp.arange(kk.shape[1]), rot)
        return qq[:, None], kk[:, None], vv[:, None]  # single head: (b, 1, n, d)

    def __call__(
        self,
        q: Array,
        k: Array,
        mask: Optional[Array] = None,
        pos: Optional[Array] = None,
        pos_net_state=None,
        reset_mask: Optional[Array] = None,
        time_step: Optional[Array] = None,
        return_weights: bool = False,
        conv_history: bool = False,
        pos_valid: Optional[Array] = None,
    ):
        """Full-sequence path. Returns (out, att, pos_net_final_state).

        ``time_step`` offsets the rotary query positions (mid-stream chunked
        prefill); ``conv_history`` makes the pos_net consume its incoming
        conv rings as causal history (see GatedLinearAttention);
        ``pos_valid`` ((b, j) bool) makes ConvPos padding-exact for mixed
        text lengths (see :class:`ConvPos`)."""
        qh, kh, vh = self._proj(q, k, time_step=time_step)
        b, _, j, _ = kh.shape
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        if pos is None:
            pos = jnp.arange(j)[None, :]
        pos_emb = self._pos_emb(pos, pos_valid).astype(qh.dtype)
        pe = jnp.broadcast_to(pos_emb[:, None], (b, 1, j, pos_emb.shape[-1]))

        x, att1 = sdpa(qh, kh, pe, mask=mask, return_weights=return_weights)
        x = x[:, 0]
        if pos_net_state is not None:
            kw = {"conv_history": True} if conv_history else {}
            x, pos_net_final = self.pos_net(
                x, reset_mask=reset_mask, initial_state=pos_net_state,
                output_final_state=True, **kw,
            )
        else:
            x = self.pos_net(x, reset_mask=reset_mask)
            pos_net_final = None
        x = x[:, None]
        x, att2 = sdpa(x, pe, vh, mask=mask, return_weights=return_weights)
        att = jnp.concatenate([att1, att2], axis=1) if att1 is not None else None
        return x[:, 0], att, pos_net_final

    def step(
        self,
        q_t: Array,
        k: Array,
        pos_net_state,
        mask: Optional[Array] = None,
        pos: Optional[Array] = None,
        time_step: Optional[Array] = None,
        lazy_p: Optional[Array] = None,
        pos_valid: Optional[Array] = None,
    ):
        """One decode token. q_t: (b, d); k: (b, j, d_k). Returns
        (out (b, d_att), att (b, 2, j), new_pos_net_state)."""
        qh, kh, vh = self._proj(q_t[:, None], k, time_step=time_step)
        b, _, j, _ = kh.shape
        if pos is None:
            pos = jnp.arange(j)[None, :]
        pos_emb = self._pos_emb(pos, pos_valid).astype(qh.dtype)
        pe = jnp.broadcast_to(pos_emb[:, None], (b, 1, j, pos_emb.shape[-1]))
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]

        x, att1 = sdpa(qh, kh, pe, mask=mask, return_weights=True)
        if lazy_p is not None:
            x, pos_net_state = self.pos_net.step_lazy(x[:, 0, 0],
                                                      pos_net_state, lazy_p)
        else:
            x, pos_net_state = self.pos_net.step(x[:, 0, 0], pos_net_state)
        x, att2 = sdpa(x[:, None, None], pe, vh, mask=mask, return_weights=True)
        att = jnp.concatenate([att1, att2], axis=1)[:, :, 0]  # (b, 2, j)
        return x[:, 0, 0], att, pos_net_state


class CrossAttentionPP(nn.Module):
    """Two CrossAttentions sandwiching an inter_net block (crossatt.py:50-72)."""

    dim: int
    inter_net: nn.Module
    ca_heads: int = 1
    max_seqlen: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.ca_0 = CrossAttention(self.dim, self.dim, self.dim, self.ca_heads, dtype=self.dtype)
        self.ca_1 = CrossAttention(self.dim, self.dim, self.dim, self.ca_heads, dtype=self.dtype)
        self.pos_emb = nn.Embed(self.max_seqlen, self.dim, dtype=self.dtype)

    def __call__(
        self,
        q: Array,
        k: Array,
        mask: Optional[Array] = None,
        pos: Optional[Array] = None,
        pos_net_state=None,
        reset_mask: Optional[Array] = None,
        time_step: Optional[Array] = None,
        return_weights: bool = False,
        conv_history: bool = False,
    ):
        b, n, d = k.shape
        pe = self.pos_emb(jnp.arange(n))[None]
        k_pos = k + pe
        y, att1 = self.ca_0(q, k, k_pos, mask=mask, time_step=time_step, return_weights=return_weights)
        if pos_net_state is not None:
            kw = {"conv_history": True} if conv_history else {}
            y, inter_final = self.inter_net(
                y, reset_mask=reset_mask, initial_state=pos_net_state,
                output_final_state=True, **kw,
            )
        else:
            y = self.inter_net(y, reset_mask=reset_mask)
            inter_final = None
        y, att2 = self.ca_1(y, k_pos, k, mask=mask, time_step=time_step, return_weights=return_weights)
        att = jnp.concatenate([att1, att2], axis=1) if att1 is not None else None
        return y, att, inter_final

    def step(self, q_t: Array, k: Array, pos_net_state, mask: Optional[Array] = None,
             pos: Optional[Array] = None, time_step: Optional[Array] = None,
             lazy_p: Optional[Array] = None):
        b, n, d = k.shape
        pe = self.pos_emb(jnp.arange(n))[None]
        k_pos = k + pe
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        y, att1 = self.ca_0(q_t[:, None], k, k_pos, mask=mask, time_step=time_step,
                            return_weights=True)
        if lazy_p is not None:
            y, pos_net_state = self.inter_net.step_lazy(y[:, 0], pos_net_state,
                                                        lazy_p)
        else:
            y, pos_net_state = self.inter_net.step(y[:, 0], pos_net_state)
        y, att2 = self.ca_1(y[:, None], k_pos, k, mask=mask, return_weights=True)
        att = jnp.concatenate([att1, att2], axis=1)[:, :, 0]
        return y[:, 0], att, pos_net_state
