"""Mamba (selective SSM) token mixer + AttentiveMamba backbone.

Rebuild of the reference's mamba variant (model/mamba.py:20-113, layer from
the external ``mamba_ssm`` CUDA package — not in tree; semantics follow
Mamba v1): in_proj -> depthwise causal conv + silu -> selective scan with
input-dependent (dt, B, C) -> gate -> out_proj. Defaults d_state=16,
d_conv=4, expand=2 (mamba.py:46-55).

The scan runs as a log-depth ``associative_scan`` (ops/mamba.py) in
training and a fused single step in decode; state = conv ring buffer +
(d_inner, d_state) SSM state. The Mamba2/SSD variant also lives here
(``Mamba2Mixer`` / ``AttentiveMamba2``; config kind="mamba2") — scalar
per-head decay, multi-head state, grouped B/C.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
from lina_speech_tpu.ops.qlinear import QDense
import flax.struct
import jax
import jax.numpy as jnp

from lina_speech_tpu.models.attentive_rnn import (
    EncoderCrossDecoder,
    InterleavedCrossAtt,
)
from lina_speech_tpu.models.base_blocks import MixingBlock, SwiGLU
from lina_speech_tpu.ops.mamba import selective_scan, selective_step
from lina_speech_tpu.ops.short_conv import causal_depthwise_conv, short_conv_step

Array = jnp.ndarray


@flax.struct.dataclass
class MambaState:
    h: Array       # (b, d_inner, d_state) fp32 SSM state
    conv: Array    # (d_conv, b, d_inner) time-major conv ring buffer


def mamba_empty_state(batch_size: int, d_model: int, expand: int = 2,
                      d_state: int = 16, d_conv: int = 4,
                      dtype: Any = jnp.float32,
                      state_dtype: Any = jnp.float32) -> MambaState:
    d_inner = expand * d_model
    return MambaState(
        h=jnp.zeros((batch_size, d_inner, d_state), state_dtype),
        conv=jnp.zeros((d_conv, batch_size, d_inner), dtype),
    )


class MambaMixer(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None
    dtype: Any = jnp.float32
    cp_axis: Optional[str] = None  # context parallelism (ops/mamba_cp.py)

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def _dt_rank(self) -> int:
        return self.dt_rank or math.ceil(self.d_model / 16)

    def setup(self):
        self.in_proj = QDense(2 * self.d_inner, use_bias=False, dtype=self.dtype)
        self.conv_kernel = self.param(
            "conv_kernel", nn.initializers.lecun_normal(), (self.d_inner, self.d_conv),
            jnp.float32,
        )
        self.conv_bias = self.param(
            "conv_bias", nn.initializers.zeros, (self.d_inner,), jnp.float32
        )
        self.x_proj = QDense(self._dt_rank + 2 * self.d_state, use_bias=False,
                               dtype=self.dtype)
        self.dt_proj = QDense(self.d_inner, use_bias=True, dtype=self.dtype)
        # S4D-real init: A_n = -(n+1)
        self.A_log = self.param(
            "A_log",
            lambda k, s: jnp.log(jnp.broadcast_to(jnp.arange(1, self.d_state + 1,
                                                             dtype=jnp.float32), s)),
            (self.d_inner, self.d_state),
        )
        self.D = self.param("D", nn.initializers.ones, (self.d_inner,), jnp.float32)
        self.out_proj = QDense(self.d_model, use_bias=False, dtype=self.dtype)

    def _ssm_inputs(self, x_conv: Array):
        dbc = self.x_proj(x_conv)
        dt, B, C = jnp.split(dbc, [self._dt_rank, self._dt_rank + self.d_state], axis=-1)
        dt = jax.nn.softplus(self.dt_proj(dt).astype(jnp.float32))
        A = -jnp.exp(self.A_log)
        return dt, A, B, C

    def __call__(
        self,
        x: Array,
        reset_mask: Optional[Array] = None,
        initial_state: Optional[MambaState] = None,
        output_final_state: bool = False,
        conv_history: bool = False,
    ):
        """x: (b, t, d). reset_mask zeroes dt... state wipe is emulated by a
        huge dt*A decay at reset positions. ``conv_history=True`` consumes
        ``initial_state.conv`` as the causal conv history (exact mid-stream
        chunk continuation, same contract as GatedLinearAttention)."""
        b, t, _ = x.shape
        xz = self.in_proj(x)
        xs, z = jnp.split(xz, 2, axis=-1)
        use_hist = conv_history and initial_state is not None
        if conv_history and initial_state is None:
            raise ValueError("conv_history=True requires initial_state")
        conv_in = xs
        if use_hist:
            ring = initial_state.conv  # (w, b, d_inner), last w conv inputs
            conv_in = jnp.concatenate(
                [ring[1:].transpose(1, 0, 2).astype(xs.dtype), xs], axis=1)
        x_conv = causal_depthwise_conv(conv_in, self.conv_kernel.astype(self.dtype),
                                       self.conv_bias.astype(self.dtype))
        if use_hist:
            x_conv = x_conv[:, self.d_conv - 1:]
        dt, A, B, C = self._ssm_inputs(x_conv)
        s0 = initial_state.h if initial_state is not None else None
        if self.cp_axis is not None and not self.is_initializing():
            from lina_speech_tpu.ops.mamba_cp import selective_scan_cp

            # conv + projections above are time-local / XLA-SPMD-halo'd;
            # only the scan needs the collective-aware CP op. The Pallas
            # scan runs on local shards (batch manualized over dp — see
            # gla_layer.py CP note).
            pallas = jax.default_backend() == "tpu"
            y, h_final = selective_scan_cp(
                x_conv, dt, A, B, C, self.D, initial_state=s0,
                reset_mask=reset_mask, cp_axis=self.cp_axis,
                mode="pallas" if pallas else "scan",
                batch_axis="dp" if pallas else None)
        else:
            y, h_final = selective_scan(x_conv, dt, A, B, C, self.D,
                                        initial_state=s0,
                                        reset_mask=reset_mask)
        out = self.out_proj(y * nn.silu(z))
        if output_final_state:
            w = self.d_conv
            if use_hist:
                full = jnp.concatenate(
                    [initial_state.conv.transpose(1, 0, 2).astype(xs.dtype), xs],
                    axis=1)
                tail = full[:, -w:, :]
            else:
                tail = jnp.pad(xs, ((0, 0), (max(0, w - t), 0), (0, 0)))[:, -w:, :]
            return out, MambaState(h=h_final, conv=tail.transpose(1, 0, 2))
        return out

    def step(self, x_t: Array, state: MambaState) -> Tuple[Array, MambaState]:
        xz = self.in_proj(x_t)
        xs, z = jnp.split(xz, 2, axis=-1)
        x_conv, conv = short_conv_step(xs, state.conv, self.conv_kernel.astype(self.dtype),
                                       self.conv_bias.astype(self.dtype))
        dt, A, B, C = self._ssm_inputs(x_conv)
        y, h = selective_step(x_conv, dt, A, B, C, self.D, state.h)
        out = self.out_proj(y * nn.silu(z))
        return out, MambaState(h=h, conv=conv)


class Mamba2Mixer(nn.Module):
    """Mamba-2 (SSD) token mixer.

    The SSD recurrence is the *scalar-per-head-decay* linear attention
    (state (d_head, d_state) per head, decay exp(A·dt_t) shared across the
    head's channels), so it runs on the same chunked GLA kernels as
    simple-GLA with B_t as keys, C_t as queries and the conv'd x as values
    (reference layer: mamba_ssm Mamba2, model/mamba.py:40-44; not in tree).
    Structure: in_proj -> [z | x | B | C | dt], depthwise conv on (x, B, C),
    SSD scan, per-head RMSNorm gated by z, out_proj.
    """

    d_model: int
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    dtype: Any = jnp.float32
    cp_axis: Optional[str] = None  # context parallelism (ops/gla_cp.py)

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def n_heads(self) -> int:
        return self.d_inner // self.headdim

    def setup(self):
        d_in = self.d_inner
        conv_dim = d_in + 2 * self.d_state
        self.in_proj = QDense(2 * d_in + 2 * self.d_state + self.n_heads,
                                use_bias=False, dtype=self.dtype)
        self.conv_kernel = self.param(
            "conv_kernel", nn.initializers.lecun_normal(), (conv_dim, self.d_conv),
            jnp.float32,
        )
        self.conv_bias = self.param("conv_bias", nn.initializers.zeros,
                                    (conv_dim,), jnp.float32)
        self.A_log = self.param(
            "A_log", lambda k, s: jnp.log(jax.random.uniform(k, s, jnp.float32, 1.0, 16.0)),
            (self.n_heads,),
        )
        self.dt_bias = self.param("dt_bias", nn.initializers.zeros, (self.n_heads,))
        self.D = self.param("D", nn.initializers.ones, (self.n_heads,))
        self.norm_weight = self.param("norm_weight", nn.initializers.ones, (d_in,))
        self.out_proj = QDense(self.d_model, use_bias=False, dtype=self.dtype)

    def _split_proj(self, zxbcdt: Array):
        d_in, n = self.d_inner, self.d_state
        z, xbc, dt = jnp.split(zxbcdt, [d_in, 2 * d_in + 2 * n], axis=-1)
        return z, xbc, dt  # dt: (..., n_heads)

    def _heads(self, x: Array, B: Array, C: Array, dt: Array):
        """-> q/k/v/gk in (b, h, t, *) layout for the GLA kernels."""
        b, t, _ = x.shape
        h, p, n = self.n_heads, self.headdim, self.d_state
        # per-head values x (b,h,t,p); shared B/C across heads (b,1->h,t,n)
        xs = x.reshape(b, t, h, p).transpose(0, 2, 1, 3)
        Bh = jnp.broadcast_to(B[:, None], (b, h, t, n))
        Ch = jnp.broadcast_to(C[:, None], (b, h, t, n))
        dt = jax.nn.softplus(dt.astype(jnp.float32) + self.dt_bias)  # (b, t, h)
        a = -jnp.exp(self.A_log)[None, None] * dt  # log-decay (b, t, h) <= 0
        gk = jnp.broadcast_to(
            a.transpose(0, 2, 1)[..., None], (b, h, t, n)
        )  # broadcast over state dim like scalar-gate GLA
        # SSD: v scaled by dt (ZOH input); D skip added after
        v = xs * dt.transpose(0, 2, 1)[..., None]
        return Ch, Bh, v, gk, xs

    def __call__(self, x: Array, reset_mask: Optional[Array] = None,
                 initial_state: Optional[MambaState] = None,
                 output_final_state: bool = False,
                 conv_history: bool = False):
        from lina_speech_tpu.ops.gla import gla_chunk

        b, t, _ = x.shape
        zxbcdt = self.in_proj(x)
        z, xbc_pre, dt = self._split_proj(zxbcdt)
        use_hist = conv_history and initial_state is not None
        if conv_history and initial_state is None:
            raise ValueError("conv_history=True requires initial_state")
        conv_in = xbc_pre
        if use_hist:
            ring = initial_state.conv  # (w, b, conv_dim)
            conv_in = jnp.concatenate(
                [ring[1:].transpose(1, 0, 2).astype(xbc_pre.dtype), xbc_pre],
                axis=1)
        xbc = causal_depthwise_conv(conv_in, self.conv_kernel.astype(self.dtype),
                                    self.conv_bias.astype(self.dtype))
        if use_hist:
            xbc = xbc[:, self.d_conv - 1:]
        xs, B, C = jnp.split(xbc, [self.d_inner, self.d_inner + self.d_state], axis=-1)
        q, k, v, gk, xh = self._heads(xs, B, C, dt)
        if reset_mask is not None:
            gk = jnp.where(reset_mask[:, None, :, None], -20.0, gk)
        s0 = initial_state.h if initial_state is not None else None
        if s0 is not None:
            s0 = s0.reshape(b, self.n_heads, self.d_state, self.headdim)
        if self.cp_axis is not None and not self.is_initializing():
            from lina_speech_tpu.ops.gla_cp import gla_chunk_cp

            # SSD rides the GLA CP op directly (it IS scalar-decay GLA);
            # resets are already folded into gk above, matching the
            # single-device soft-reset semantics exactly
            o, s_final = gla_chunk_cp(q, k, v, gk, initial_state=s0,
                                      scale=1.0, cp_axis=self.cp_axis)
        else:
            o, s_final = gla_chunk(q, k, v, gk, initial_state=s0, scale=1.0)
        o = o + self.D[None, :, None, None] * xh  # D skip
        o = o.transpose(0, 2, 1, 3).reshape(b, t, self.d_inner)
        # gated per-head RMSNorm (Mamba2 norm): RMS over head channels
        o = self._gated_norm(o, z)
        out = self.out_proj(o)
        if output_final_state:
            w = self.d_conv
            if use_hist:
                full = jnp.concatenate(
                    [initial_state.conv.transpose(1, 0, 2).astype(xbc_pre.dtype),
                     xbc_pre], axis=1)
                tail = full[:, -w:, :]
            else:
                tail = jnp.pad(xbc_pre, ((0, 0), (max(0, w - t), 0), (0, 0)))[:, -w:, :]
            st = MambaState(
                h=s_final.reshape(b, self.n_heads * self.d_state, self.headdim),
                conv=tail.transpose(1, 0, 2),
            )
            return out, st
        return out

    def _gated_norm(self, o: Array, z: Array) -> Array:
        of = o.astype(jnp.float32)
        shp = of.shape
        oh = of.reshape(*shp[:-1], self.n_heads, self.headdim)
        oh = oh * jax.lax.rsqrt(jnp.mean(oh * oh, axis=-1, keepdims=True) + 1e-5)
        of = oh.reshape(shp) * self.norm_weight
        return (of * jax.nn.silu(z.astype(jnp.float32))).astype(o.dtype)

    def step(self, x_t: Array, state: MambaState):
        from lina_speech_tpu.ops.gla import gla_decode_step

        b, _ = x_t.shape
        zxbcdt = self.in_proj(x_t)
        z, xbc, dt = self._split_proj(zxbcdt)
        xbc, conv = short_conv_step(xbc, state.conv, self.conv_kernel.astype(self.dtype),
                                    self.conv_bias.astype(self.dtype))
        xs, B, C = jnp.split(xbc, [self.d_inner, self.d_inner + self.d_state], axis=-1)
        h, p, n = self.n_heads, self.headdim, self.d_state
        xh = xs.reshape(b, h, p)
        Bh = jnp.broadcast_to(B[:, None], (b, h, n))
        Ch = jnp.broadcast_to(C[:, None], (b, h, n))
        dtf = jax.nn.softplus(dt.astype(jnp.float32) + self.dt_bias)  # (b, h)
        gk = jnp.broadcast_to((-jnp.exp(self.A_log)[None] * dtf)[..., None], (b, h, n))
        v = xh * dtf[..., None]
        s = state.h.reshape(b, h, n, p)
        o, s = gla_decode_step(Ch, Bh, v, gk, s, scale=1.0)
        o = o + self.D[None, :, None] * xh
        o = o.reshape(b, self.d_inner)
        o = self._gated_norm(o, z)
        return self.out_proj(o), MambaState(h=s.reshape(b, h * n, p), conv=conv)


def mamba2_empty_state(batch_size: int, d_model: int, expand: int = 2,
                       d_state: int = 64, d_conv: int = 4, headdim: int = 64,
                       dtype: Any = jnp.float32,
                       state_dtype: Any = jnp.float32) -> MambaState:
    d_inner = expand * d_model
    n_heads = d_inner // headdim
    return MambaState(
        h=jnp.zeros((batch_size, n_heads * d_state, headdim), state_dtype),
        conv=jnp.zeros((d_conv, batch_size, d_inner + 2 * d_state), dtype),
    )


class AttentiveMamba(EncoderCrossDecoder):
    """Encoder -> cross-attention -> decoder with Mamba mixers
    (reference model/mamba.py:20-113)."""

    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    cp_axis: Optional[str] = None  # context parallelism (ops/mamba_cp.py)

    def _block(self, d: int) -> MixingBlock:
        return MixingBlock(
            tmix=MambaMixer(d_model=d, d_state=self.d_state, d_conv=self.d_conv,
                            expand=self.expand, dtype=self.dtype,
                            cp_axis=self.cp_axis),
            cmix=SwiGLU(d, dtype=self.dtype),
            dropout=self.dropout,
        )

    def _layer_state(self, batch_size: int, d: int, dtype: Any) -> MambaState:
        return mamba_empty_state(batch_size, d, self.expand, self.d_state,
                                 self.d_conv, dtype, state_dtype=self.state_dtype)


class AttentiveMamba2(EncoderCrossDecoder):
    """Mamba-2/SSD backbone (the reference's version=2 default,
    mamba.py:36-44)."""

    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    cp_axis: Optional[str] = None  # context parallelism (ops/gla_cp.py)

    def _block(self, d: int) -> MixingBlock:
        return MixingBlock(
            tmix=Mamba2Mixer(d_model=d, d_state=self.d_state, d_conv=self.d_conv,
                             expand=self.expand, headdim=self.headdim,
                             dtype=self.dtype, cp_axis=self.cp_axis),
            cmix=SwiGLU(d, dtype=self.dtype),
            dropout=self.dropout,
        )

    def _layer_state(self, batch_size: int, d: int, dtype: Any) -> MambaState:
        return mamba2_empty_state(batch_size, d, self.expand, self.d_state,
                                  self.d_conv, self.headdim, dtype,
                                  state_dtype=self.state_dtype)


class CrossAttMamba(InterleavedCrossAtt):
    """Single Mamba stack with interleaved cross-attention
    (reference model/mamba.py:115-257, CrossAttMamba / CrossAttMambaV2)."""

    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    cp_axis: Optional[str] = None  # context parallelism (ops/mamba_cp.py)

    def _block(self, d: int) -> MixingBlock:
        return MixingBlock(
            tmix=MambaMixer(d_model=d, d_state=self.d_state, d_conv=self.d_conv,
                            expand=self.expand, dtype=self.dtype,
                            cp_axis=self.cp_axis),
            cmix=SwiGLU(d, dtype=self.dtype),
            dropout=self.dropout,
        )

    def _layer_state(self, batch_size: int, d: int, dtype: Any) -> MambaState:
        return mamba_empty_state(batch_size, d, self.expand, self.d_state,
                                 self.d_conv, dtype, state_dtype=self.state_dtype)
