"""RWKV-6 (Finch) token mixer + AttentiveRWKV6 backbone.

Rebuild of the reference's RWKV6 variant (model/rwkv6.py:16-73, layer from
FLA's RWKV6Attention — not in tree; semantics follow the RWKV-v6 "Finch"
design): data-dependent token-shift interpolation (ddlerp) feeding r/k/v/g
and a low-rank per-channel decay, bonus ``u`` on the current token, per-head
GroupNorm output gate. The recurrence runs on the chunked scan in
ops/rwkv6.py (training) or the fused decode step.

Decode state = recurrent (b, h, d_k, d_v) fp32 + the 1-token shift buffer.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
from lina_speech_tpu.ops.qlinear import QDense
import flax.struct
import jax
import jax.numpy as jnp

from lina_speech_tpu.models.attentive_rnn import EncoderCrossDecoder
from lina_speech_tpu.models.base_blocks import MixingBlock, SwiGLU
from lina_speech_tpu.ops.rwkv6 import rwkv6_chunk, rwkv6_decode_step, rwkv6_scan_ref

Array = jnp.ndarray


@flax.struct.dataclass
class RWKV6State:
    s: Array        # (b, h, dk_head, dv_head) fp32
    shift: Array    # (b, d) previous token input


def rwkv6_empty_state(batch_size: int, hidden_size: int, num_heads: int,
                      expand_k: float = 1.0, expand_v: float = 1.0,
                      dtype: Any = jnp.float32,
                      state_dtype: Any = jnp.float32) -> RWKV6State:
    dk = int(hidden_size * expand_k) // num_heads
    dv = int(hidden_size * expand_v) // num_heads
    return RWKV6State(
        s=jnp.zeros((batch_size, num_heads, dk, dv), state_dtype),
        shift=jnp.zeros((batch_size, hidden_size), dtype),
    )


class RWKV6Attention(nn.Module):
    hidden_size: int
    num_heads: int = 4
    expand_k: float = 1.0
    expand_v: float = 1.0
    proj_low_rank_dim: int = 32
    decay_low_rank_dim: int = 64
    # auto: Pallas kernels on TPU, XLA elsewhere; chunk_pallas forces the
    # Pallas path (interpret off-TPU); chunk forces XLA (explicit escape
    # when trace-time default backend != intended platform).
    kernel_mode: str = "auto"
    # context parallelism: mesh axis name carrying time shards
    # (ops/gla_cp.py::rwkv6_chunk_cp); None = single-device recurrence
    cp_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def key_dim(self) -> int:
        return int(self.hidden_size * self.expand_k)

    @property
    def value_dim(self) -> int:
        return int(self.hidden_size * self.expand_v)

    def setup(self):
        d = self.hidden_size
        init_small = nn.initializers.normal(1e-2)
        self.x_maa = self.param("x_maa", nn.initializers.zeros, (d,), jnp.float32)
        self.maa = self.param("maa", nn.initializers.zeros, (5, d), jnp.float32)
        self.maa_w1 = self.param("maa_w1", init_small, (d, 5 * self.proj_low_rank_dim), jnp.float32)
        self.maa_w2 = self.param("maa_w2", init_small, (5, self.proj_low_rank_dim, d), jnp.float32)

        dense = lambda f, name: QDense(f, use_bias=False, dtype=self.dtype, name=name)
        self.r_proj = dense(self.key_dim, "r_proj")
        self.k_proj = dense(self.key_dim, "k_proj")
        self.v_proj = dense(self.value_dim, "v_proj")
        self.g_proj = dense(self.value_dim, "g_proj")
        self.o_proj = dense(d, "o_proj")

        self.decay_w1 = self.param("decay_w1", init_small, (d, self.decay_low_rank_dim), jnp.float32)
        self.decay_w2 = self.param("decay_w2", init_small, (self.decay_low_rank_dim, self.key_dim), jnp.float32)
        # time_decay init ~ -6 so exp(-exp(-6)) ~ slow decay like RWKV init
        self.time_decay = self.param(
            "time_decay", lambda k, s: jnp.full(s, -6.0, jnp.float32), (self.key_dim,)
        )
        self.time_faaaa = self.param(
            "time_faaaa", nn.initializers.zeros,
            (self.num_heads, self.key_dim // self.num_heads),
        )
        self.ln_x_scale = self.param(
            "ln_x_scale", nn.initializers.ones, (self.value_dim,), jnp.float32
        )
        self.ln_x_bias = self.param(
            "ln_x_bias", nn.initializers.zeros, (self.value_dim,), jnp.float32
        )

    # ---- pieces ----
    def _ddlerp(self, x: Array, sx: Array):
        """Data-dependent lerp -> (xw, xk, xv, xr, xg)."""
        xxx = x + sx * self.x_maa
        z = jnp.tanh(xxx @ self.maa_w1)  # (..., 5*plr)
        z = z.reshape(*z.shape[:-1], 5, self.proj_low_rank_dim)
        deltas = jnp.einsum("...fp,fpd->...fd", z, self.maa_w2)  # (..., 5, d)
        mix = self.maa[(None,) * (x.ndim - 1)] + deltas  # broadcast (5, d)
        outs = [x + sx * mix[..., i, :] for i in range(5)]
        return outs  # order: w, k, v, r, g

    def _wrkvg(self, x: Array, sx: Array):
        xw, xk, xv, xr, xg = self._ddlerp(x, sx)
        r = self.r_proj(xr)
        k = self.k_proj(xk)
        v = self.v_proj(xv)
        g = nn.silu(self.g_proj(xg))
        w_logit = self.time_decay + jnp.tanh(xw.astype(jnp.float32) @ self.decay_w1) @ self.decay_w2
        lw = -jnp.exp(w_logit)  # log-decay <= 0
        return r, k, v, g, lw

    def _group_norm(self, o: Array) -> Array:
        """Per-head LayerNorm over the value channels (RWKV ln_x GroupNorm)."""
        b = o.shape[0]
        h = self.num_heads
        shp = o.shape
        of = o.astype(jnp.float32).reshape(*shp[:-1], h, shp[-1] // h)
        mean = of.mean(axis=-1, keepdims=True)
        var = of.var(axis=-1, keepdims=True)
        of = (of - mean) * jax.lax.rsqrt(var + 1e-5)
        of = of.reshape(shp)
        return (of * self.ln_x_scale + self.ln_x_bias).astype(o.dtype)

    def _split(self, x: Array, dh: int) -> Array:
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, dh).transpose(0, 2, 1, 3)

    # ---- full sequence ----
    def __call__(
        self,
        x: Array,
        reset_mask: Optional[Array] = None,
        initial_state: Optional[RWKV6State] = None,
        mode: str = "auto",
        reset_val: float = -20.0,
        output_final_state: bool = False,
        conv_history: bool = False,
    ):
        # conv_history (the mid-stream chunk-continuation contract shared
        # with GatedLinearAttention) is accepted for interface parity but
        # needs no special handling: the 1-token ddlerp shift buffer is
        # ALWAYS consumed from initial_state (zeros in a fresh state),
        # so chunked continuation is exact by default.
        b, t, d = x.shape
        prev = (
            initial_state.shift[:, None]
            if initial_state is not None
            else jnp.zeros((b, 1, d), x.dtype)
        )
        xprev = jnp.concatenate([prev, x[:, :-1]], axis=1)
        sx = xprev - x
        r, k, v, g, lw = self._wrkvg(x, sx)
        if reset_mask is not None:
            lw = jnp.where(reset_mask[..., None], reset_val, lw)

        dk = self.key_dim // self.num_heads
        dv = self.value_dim // self.num_heads
        rh, kh, wh = self._split(r, dk), self._split(k, dk), self._split(lw, dk)
        vh = self._split(v, dv)
        s0 = initial_state.s if initial_state is not None else None
        if mode == "auto":
            mode = self.kernel_mode
        if mode == "auto":
            # same policy as the GLA layer: the Pallas chunk kernel on TPU
            # (fwd + handwritten bwd, custom-partitioning over dp x tp),
            # the XLA chunk elsewhere
            mode = "chunk_pallas" if jax.default_backend() == "tpu" else "chunk"
        use_cp = self.cp_axis is not None and not self.is_initializing()
        if use_cp:
            from lina_speech_tpu.ops.gla_cp import rwkv6_chunk_cp

            if mode not in ("chunk", "chunk_pallas"):
                # no CP path exists for the scan oracle — fail loudly
                # instead of silently running "chunk"
                raise ValueError(
                    f"kernel_mode={mode!r} has no context-parallel "
                    f"implementation; use 'chunk' or 'chunk_pallas' "
                    f"(or unset cp_axis)")
            pallas = mode == "chunk_pallas"
            o, s_final = rwkv6_chunk_cp(
                rh, kh, vh, wh, self.time_faaaa, initial_state=s0,
                cp_axis=self.cp_axis,
                kernel="chunk_pallas" if pallas else "chunk",
                # see gla_layer.py: Pallas needs local shards under CP
                batch_axis="dp" if pallas else None,
                head_axis="tp" if pallas else None)
        elif mode == "chunk_pallas":
            from lina_speech_tpu.ops.rwkv6_pallas import rwkv6_chunk_pallas

            o, s_final = rwkv6_chunk_pallas(rh, kh, vh, wh, self.time_faaaa,
                                            initial_state=s0)
        elif mode == "chunk":
            o, s_final = rwkv6_chunk(rh, kh, vh, wh, self.time_faaaa,
                                     initial_state=s0)
        else:
            o, s_final = rwkv6_scan_ref(rh, kh, vh, wh, self.time_faaaa,
                                        initial_state=s0)

        o = o.transpose(0, 2, 1, 3).reshape(b, t, self.value_dim)
        o = self.o_proj(self._group_norm(o) * g)
        if output_final_state:
            return o, RWKV6State(s=s_final, shift=x[:, -1])
        return o

    # ---- one decode token ----
    def step(self, x_t: Array, state: RWKV6State) -> Tuple[Array, RWKV6State]:
        b, d = x_t.shape
        sx = state.shift - x_t
        r, k, v, g, lw = self._wrkvg(x_t, sx)
        dk = self.key_dim // self.num_heads
        dv = self.value_dim // self.num_heads
        shp = lambda z, dh: z.reshape(b, self.num_heads, dh)
        # tiny batches route to the XLA step like GLA (gla_layer.py:step):
        # the Pallas decode kernel's minimum (batch*head) block is 8 rows,
        # so b*h < 8 pays an 8-row pad per state operand + per-call
        # custom-call latency x n_layer every token (measured on the GLA
        # twin: XLA step 2x faster at b1h4).
        from lina_speech_tpu.ops.gla_pallas import _BH_BLK

        tiny_batch = b * self.num_heads < _BH_BLK
        use_fused = self.kernel_mode == "chunk_pallas" or (
            self.kernel_mode == "auto" and not tiny_batch
            and jax.default_backend() == "tpu"
        )
        if use_fused:
            from lina_speech_tpu.ops.gla_pallas import rwkv6_decode_fused

            step_fn = rwkv6_decode_fused
        else:
            step_fn = rwkv6_decode_step
        o, s = step_fn(
            shp(r, dk), shp(k, dk), shp(v, dv), shp(lw, dk),
            self.time_faaaa, state.s,
        )
        o = o.reshape(b, self.value_dim)
        o = self.o_proj(self._group_norm(o) * g)
        return o, RWKV6State(s=s, shift=x_t)


class AttentiveRWKV6(EncoderCrossDecoder):
    """Same encoder -> cross-attention -> decoder shape as AttentiveGLA
    (reference model/rwkv6.py:16-73), with RWKV6 token mixers."""

    kernel_mode: str = "auto"
    cp_axis: Optional[str] = None  # context parallelism (ops/gla_cp.py)

    def _block(self, d: int) -> MixingBlock:
        return MixingBlock(
            tmix=RWKV6Attention(hidden_size=d, num_heads=self.heads,
                                kernel_mode=self.kernel_mode,
                                cp_axis=self.cp_axis, dtype=self.dtype),
            cmix=SwiGLU(d, dtype=self.dtype),
            dropout=self.dropout,
        )

    def _layer_state(self, batch_size: int, d: int, dtype):
        return rwkv6_empty_state(batch_size, d, self.heads, dtype=dtype,
                                 state_dtype=self.state_dtype)
