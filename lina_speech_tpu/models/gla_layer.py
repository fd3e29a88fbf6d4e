"""Gated Linear Attention token-mixer layer (flax.linen).

TPU-native counterpart of the reference layer (model/gla.py:44-247, itself
adapted from flash-linear-attention): q/k/v/g projections, low-rank log-decay
gate ``gk = logsigmoid(W2 W1 x + b) / gate_logit_normalizer``, optional
depthwise causal short-conv on q/k/v, RMSNorm-swish output gate, and the GLA
recurrence evaluated by the chunked scan (training) or the fused single-token
step (decode). Recurrent + conv state is an explicit :class:`GLAState` pytree
carried by the caller — never module state — so decode jits into one
``lax.scan``/``while_loop``.

Parity notes vs reference:
- defaults expand_k=1.0, expand_v=2.0, heads=4, gate_low_rank_dim=16,
  gate_logit_normalizer=16, conv_size=4 (gla.py:46-64);
- xavier-uniform gain 2**-2.5 init on every Dense kernel (gla.py:122-129);
- reset_mask fills gk with reset_val=-20 to wipe state at packed-sequence
  boundaries (gla.py:182-184);
- queries scaled d_k**-0.5 inside the kernel ops (FLA kernel default).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
from lina_speech_tpu.ops.qlinear import QDense
import flax.struct
import jax
import jax.numpy as jnp

from lina_speech_tpu.ops.gla import gla_chunk, gla_decode_step, gla_scan_ref
from lina_speech_tpu.ops.short_conv import causal_depthwise_conv, short_conv_step

Array = jnp.ndarray

# Xavier-uniform with gain 2**-2.5 == variance_scaling(2**-5, fan_avg, uniform)
_gla_init = nn.initializers.variance_scaling(2.0 ** -5, "fan_avg", "uniform")


@flax.struct.dataclass
class GLAState:
    """Per-layer decode state: recurrent fp32 matrix + conv ring buffers."""

    s: Array  # (b, h, d_k_head, d_v_head) fp32
    conv_q: Optional[Array] = None  # (w, b, key_dim) time-major ring
    conv_k: Optional[Array] = None  # (w, b, key_dim)
    conv_v: Optional[Array] = None  # (w, b, value_dim)
    conv_h: Optional[Array] = None  # (w, b, hidden) when share_conv_kernel
    # lazy micro-chunk decode buffers (ops/gla.py:gla_decode_lazy_step):
    # present only when generation runs in lazy mode. ``s`` is then the
    # base state as of the last fold (read-only between folds).
    kbuf: Optional[Array] = None  # (L, b, h, dk)
    vbuf: Optional[Array] = None  # (L, b, h, dv)
    cbuf: Optional[Array] = None  # (L, b, h, dk) fp32 gate cumsums
    cc: Optional[Array] = None    # (b, h, dk) fp32 cumsum since fold
    # int8 state quantization (state_quant="int8"): per-(b, h, dk)-row
    # dequant scale; ``s`` is then int8 (ops/gla.py:quantize_state_rows)
    s_scale: Optional[Array] = None


def gla_add_lazy_buffers(state: GLAState, window: int,
                         dtype: Any = jnp.bfloat16,
                         state_quant: Optional[str] = None) -> GLAState:
    """Attach zeroed lazy-decode window buffers sized from ``state.s``.

    ``state_quant="int8"`` additionally row-quantizes the base state —
    b64 decode is HBM-bound on the read-only state read, int8 halves it
    (opt-in quality knob; the scale rides the readout query for free)."""
    b, h, dk, dv = state.s.shape
    state = state.replace(
        kbuf=jnp.zeros((window, b, h, dk), dtype),
        vbuf=jnp.zeros((window, b, h, dv), dtype),
        cbuf=jnp.zeros((window, b, h, dk), jnp.float32),
        cc=jnp.zeros((b, h, dk), jnp.float32),
    )
    if state_quant == "int8":
        from lina_speech_tpu.ops.gla import quantize_state_rows

        # NB the PREFILL KERNELS must EMIT their final state in f32 and
        # cast to the state dtype outside the kernel (generate_batch
        # threads sf_emit_dtype=f32 when the live set fits): in-kernel
        # bf16 emission costs ~13% end-to-end here (190 vs 218
        # x-realtime at b64, A/B'd on v5e — XLA layout/fusion artifact;
        # the bf16 value this quantize reads is identical either way).
        # Downstream repair does NOT recover it (copy 190.06,
        # optimization_barrier f32 round-trip 188.46 — both measured).
        s_q, sc = quantize_state_rows(state.s)
        state = state.replace(s=s_q, s_scale=sc)
    elif state_quant == "int4":
        # nibble-packed along dv halves: s.shape[-1] == dv//2 is how the
        # step/fold dispatch recognizes int4 vs int8 (vbuf carries dv)
        from lina_speech_tpu.ops.gla import quantize_state_rows_int4

        s_q, sc = quantize_state_rows_int4(state.s)
        state = state.replace(s=s_q, s_scale=sc)
    elif state_quant is not None:
        raise ValueError(f"unknown state_quant {state_quant!r}")
    return state


def gla_fold_lazy_state(state: GLAState) -> GLAState:
    """Fold the buffered window into the base state (pure; no params)."""
    # The fold stays on XLA everywhere: on v5e the Pallas fold kernels
    # (gla_pallas.gla_fold_fused/_q) measured 427 us/layer-fold vs XLA's
    # 232 — the K=L contraction is MXU-latency-bound and XLA's fusion of
    # the rank-L einsum wins (scripts/bench_lazy_kernel.py, round 3).
    # Buffers deliberately stay STALE (no zeroing writes): the step masks
    # slots > p and every slot is rewritten before the next fold reads it
    # (generate.py folds only after full windows).
    if state.s_scale is not None:
        if state.s.shape[-1] != state.vbuf.shape[-1]:  # int4 nibble-packed
            from lina_speech_tpu.ops.gla import gla_decode_lazy_fold_q4

            s, sc = gla_decode_lazy_fold_q4(
                state.s, state.s_scale, state.kbuf, state.vbuf,
                state.cbuf, state.cc)
            return state.replace(s=s, s_scale=sc,
                                 cc=jnp.zeros_like(state.cc))
        from lina_speech_tpu.ops.gla import gla_decode_lazy_fold_q

        s, sc = gla_decode_lazy_fold_q(state.s, state.s_scale, state.kbuf,
                                       state.vbuf, state.cbuf, state.cc)
        return state.replace(s=s, s_scale=sc, cc=jnp.zeros_like(state.cc))
    from lina_speech_tpu.ops.gla import gla_decode_lazy_fold

    s = gla_decode_lazy_fold(
        state.s, state.kbuf, state.vbuf, state.cbuf, state.cc)
    return state.replace(s=s, cc=jnp.zeros_like(state.cc))


def gla_empty_state(
    batch_size: int,
    hidden_size: int,
    num_heads: int,
    expand_k: float = 1.0,
    expand_v: float = 2.0,
    use_short_conv: bool = False,
    share_conv_kernel: bool = False,
    conv_size: int = 4,
    dtype: Any = jnp.float32,
    state_dtype: Any = jnp.float32,
) -> GLAState:
    """Zero decode state for one GLA layer (reference gla.py:229-240).

    ``state_dtype=bfloat16`` halves decode HBM traffic (the dominant cost at
    large batch); update math stays fp32 either way."""
    key_dim = int(hidden_size * expand_k)
    value_dim = int(hidden_size * expand_v)
    z = lambda *shape: jnp.zeros(shape, dtype)
    state = GLAState(
        s=jnp.zeros(
            (batch_size, num_heads, key_dim // num_heads, value_dim // num_heads),
            state_dtype,
        )
    )
    if use_short_conv:
        if share_conv_kernel:
            state = state.replace(conv_h=z(conv_size, batch_size, hidden_size))
        else:
            state = state.replace(
                conv_q=z(conv_size, batch_size, key_dim),
                conv_k=z(conv_size, batch_size, key_dim),
                conv_v=z(conv_size, batch_size, value_dim),
            )
    return state


class ShortConvolution(nn.Module):
    """Depthwise causal conv width ``size`` + silu (FLA ShortConvolution)."""

    dim: int
    size: int = 4
    use_bias: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.dim, self.size), jnp.float32
        )
        self.bias = (
            self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
            if self.use_bias
            else None
        )

    def __call__(self, x: Array) -> Array:
        return causal_depthwise_conv(x, self.kernel.astype(self.dtype), self.bias)

    def step(self, x_t: Array, state: Array) -> Tuple[Array, Array]:
        return short_conv_step(x_t, state, self.kernel.astype(self.dtype), self.bias)


class RMSNormSwishGate(nn.Module):
    """y = RMSNorm(x) * silu(g), per head-channel weight (FLA fused op)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, g: Array) -> Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (normed * w).astype(x.dtype) * nn.silu(g)


class GatedLinearAttention(nn.Module):
    """scalar_gate=True gives the simple-GLA variant (reference
    model/simple_gla.py via FLA SimpleGatedLinearAttention): one decay per
    head per step instead of per key-channel, broadcast inside the kernel."""

    hidden_size: int = 1024
    expand_k: float = 1.0
    expand_v: float = 2.0
    num_heads: int = 4
    use_short_conv: bool = False
    conv_size: int = 4
    share_conv_kernel: bool = False
    gate_logit_normalizer: int = 16
    gate_low_rank_dim: int = 16
    clamp_min: Optional[float] = None
    layernorm_eps: float = 1e-5
    chunk_size: int = 64
    scalar_gate: bool = False
    kernel_mode: str = "auto"  # auto | chunk | chunk_parallel | chunk_pallas | scan
    # Context parallelism: when set, the chunked forward shards TIME over
    # this mesh axis (ops/gla_cp.py — per-shard kernel + one state
    # all_gather + associative combine). Requires an ambient mesh
    # (``jax.set_mesh``) carrying the axis and sequence length divisible
    # by its size. Training/prefill only; decode steps are unaffected.
    cp_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def key_dim(self) -> int:
        return int(self.hidden_size * self.expand_k)

    @property
    def value_dim(self) -> int:
        return int(self.hidden_size * self.expand_v)

    @property
    def head_qk_dim(self) -> int:
        return self.key_dim // self.num_heads

    @property
    def head_v_dim(self) -> int:
        return self.value_dim // self.num_heads

    def setup(self):
        dense = lambda feat, name, bias=False: QDense(
            feat, use_bias=bias, kernel_init=_gla_init, dtype=self.dtype, name=name
        )
        self.q_proj = dense(self.key_dim, "q_proj")
        self.k_proj = dense(self.key_dim, "k_proj")
        self.v_proj = dense(self.value_dim, "v_proj")
        self.g_proj = dense(self.value_dim, "g_proj")
        if self.scalar_gate:
            self.gk_proj = dense(self.num_heads, "gk_proj", bias=True)
        else:
            self.gk_proj_1 = dense(self.gate_low_rank_dim, "gk_proj_1")
            self.gk_proj_2 = dense(self.key_dim, "gk_proj_2", bias=True)
        self.o_proj = dense(self.hidden_size, "o_proj")
        self.g_norm_swish_gate = RMSNormSwishGate(self.head_v_dim, self.layernorm_eps)
        if self.use_short_conv:
            if self.share_conv_kernel:
                self.h_conv1d = ShortConvolution(self.hidden_size, self.conv_size, dtype=self.dtype)
            else:
                self.q_conv1d = ShortConvolution(self.key_dim, self.conv_size, dtype=self.dtype)
                self.k_conv1d = ShortConvolution(self.key_dim, self.conv_size, dtype=self.dtype)
                self.v_conv1d = ShortConvolution(self.value_dim, self.conv_size, dtype=self.dtype)

    # ---------- state ----------
    def empty_state(self, batch_size: int, dtype: Any = jnp.float32) -> GLAState:
        """Zero decode state; mirrors reference init_state (gla.py:229-240)."""
        return gla_empty_state(
            batch_size, self.hidden_size, self.num_heads, self.expand_k,
            self.expand_v, self.use_short_conv, self.share_conv_kernel,
            self.conv_size, dtype,
        )

    # ---------- shared math ----------
    def _raw_gates(self, x: Array) -> Array:
        """Log-decay gates; (b, ..., key_dim) or scalar-gate (b, ..., heads)
        broadcast to key_dim."""
        if self.scalar_gate:
            g = self.gk_proj(x)  # (..., h)
            g = jax.nn.log_sigmoid(g.astype(jnp.float32)) / self.gate_logit_normalizer
            g = jnp.repeat(g, self.head_qk_dim, axis=-1)  # (..., h*dk) head-major
        else:
            g = self.gk_proj_2(self.gk_proj_1(x))
            g = jax.nn.log_sigmoid(g.astype(jnp.float32)) / self.gate_logit_normalizer
        if self.clamp_min is not None:
            g = jnp.maximum(g, self.clamp_min)
        return g

    def _gates(self, x: Array, reset_mask: Optional[Array], reset_val: float) -> Array:
        gk = self._raw_gates(x)
        if reset_mask is not None:
            # reset_mask broadcasts over the gate feature dim (gla.py:182-184)
            gk = jnp.where(reset_mask[..., None], reset_val, gk)
        return gk

    def _proj_qkvg(self, x: Array):
        """Merged decode-time projection: q|k|v|g(|gk low-rank) as ONE GEMV.

        b1 decode is weights-stream-bound with dispatch/DMA gaps between
        small GEMVs; concatenating the kernels (the concat is
        loop-invariant, so XLA hoists + materializes it once outside the
        token loop) turns 5 streams into 1. Column-independent dot ==
        exact same math as separate calls. Handles both float kernels and
        the QDense {int8_q, int8_s} quantized pairs; mixed trees (the
        1024x16 gk_proj_1 stays float under weight_quant="int8" —
        quantize_dense_params skips narrow kernels) merge each dtype
        group separately, so the int8 path still streams q|k|v|g as one
        int8 GEMV plus one tiny float GEMV.

        Returns (q, k, v, g_for_output_gate, gk_low_rank_or_None).
        """
        from lina_speech_tpu.ops.qlinear import (
            QKEY, SKEY, int8_linear_ref, is_quantized_leaf,
        )

        mods = [self.q_proj, self.k_proj, self.v_proj, self.g_proj]
        if not self.scalar_gate:
            mods.append(self.gk_proj_1)
        kernels = [m.variables["params"]["kernel"] for m in mods]
        quant = [is_quantized_leaf(kk) for kk in kernels]
        qidx = [i for i, isq in enumerate(quant) if isq]
        fidx = [i for i, isq in enumerate(quant) if not isq]

        def split_cols(y, idxs):
            widths = [kernels[i][QKEY].shape[1] if quant[i]
                      else kernels[i].shape[1] for i in idxs]
            cuts, acc = [], 0
            for wdt in widths[:-1]:
                acc += wdt
                cuts.append(acc)
            return jnp.split(y, cuts, axis=-1)

        outs = [None] * len(mods)
        if qidx:
            qcat = jnp.concatenate([kernels[i][QKEY] for i in qidx], axis=1)
            scat = jnp.concatenate(
                [kernels[i][SKEY].reshape(1, -1) for i in qidx], axis=1)
            y = int8_linear_ref(x, qcat, scat,
                                out_dtype=self.dtype or jnp.bfloat16)
            for i, o in zip(qidx, split_cols(y, qidx)):
                outs[i] = o
        if fidx:
            wcat = jnp.concatenate([jnp.asarray(kernels[i]) for i in fidx],
                                   axis=1)
            x2, wcat = nn.dtypes.promote_dtype(x, wcat, dtype=self.dtype)
            for i, o in zip(fidx, split_cols(x2 @ wcat, fidx)):
                outs[i] = o
        return (*outs, None) if self.scalar_gate else tuple(outs)

    def _gates_from_low_rank(self, x: Array, gk1, reset_mask, reset_val):
        """_gates() with the low-rank first stage precomputed (merged
        projection path); scalar-gate variants recompute from ``x``."""
        if gk1 is None or self.scalar_gate:
            return self._gates(x, reset_mask, reset_val)
        g = self.gk_proj_2(gk1)
        g = jax.nn.log_sigmoid(g.astype(jnp.float32)) / self.gate_logit_normalizer
        if self.clamp_min is not None:
            g = jnp.maximum(g, self.clamp_min)
        if reset_mask is not None:
            g = jnp.where(reset_mask[..., None], reset_val, g)
        return g

    def _split_heads(self, x: Array, head_dim: int) -> Array:
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

    # ---------- folded-layout projections (training path, opt-in) ----------
    # The round-2 xplane decomposition attributes ~12 ms of the 94 ms
    # micro-step to layout copies, dominated by the (b,t,h*d)->(b,h,t,d)
    # head-split transposes around the chunk kernel and the inverse around
    # o_proj. Expressing projection+split as ONE einsum (kernel viewed as
    # (d, h, hd)) hands XLA a single GEMM whose output layout IS the
    # kernel layout, so the transpose can fold into the GEMM epilogue
    # instead of materializing a copy. Identical math: the kernel reshape
    # only groups columns; the contraction is unchanged.
    # Opt-in via GLA_FOLD_LAYOUT=1 until the A/B is measured on hardware
    # (the flat-(b,t,d) BlockSpec attempt is a documented loss — this one
    # keeps the kernel layout and changes only how XLA produces it).

    def _fold_layout(self) -> bool:
        import os

        return os.environ.get("GLA_FOLD_LAYOUT", "0") == "1"

    def _proj_heads(self, mod, z: Array, head_dim: int) -> Array:
        """(b, t, d) -> (b, h, t, head_dim): projection with the head-split
        transpose folded into the GEMM (no standalone copy)."""
        kernel = mod.variables["params"]["kernel"]
        z2, w = nn.dtypes.promote_dtype(z, jnp.asarray(kernel),
                                        dtype=self.dtype)
        w = w.reshape(w.shape[0], self.num_heads, head_dim)
        return jnp.einsum("btd,dhk->bhtk", z2, w)

    def _gates_heads(self, h: Array, reset_mask, reset_val: float) -> Array:
        """_gates() emitting (b, h, t, head_qk_dim) f32 directly (low-rank
        second stage as a folded einsum; scalar_gate uses the legacy path)."""
        gk1 = self.gk_proj_1(h)  # (b, t, r)
        kernel = self.gk_proj_2.variables["params"]["kernel"]
        bias = self.gk_proj_2.variables["params"]["bias"]
        z2, w = nn.dtypes.promote_dtype(gk1, jnp.asarray(kernel),
                                        dtype=self.dtype)
        w = w.reshape(w.shape[0], self.num_heads, self.head_qk_dim)
        g = jnp.einsum("btr,rhk->bhtk", z2, w)
        g = g + jnp.asarray(bias, g.dtype).reshape(
            1, self.num_heads, 1, self.head_qk_dim)
        g = jax.nn.log_sigmoid(g.astype(jnp.float32)) / self.gate_logit_normalizer
        if self.clamp_min is not None:
            g = jnp.maximum(g, self.clamp_min)
        if reset_mask is not None:
            g = jnp.where(reset_mask[:, None, :, None], reset_val, g)
        return g

    def _output_folded(self, o_heads: Array, h: Array) -> Array:
        """Gate + project from the kernel's (b, h, t, dv) layout directly:
        the output gate is produced head-split by a folded einsum and
        o_proj contracts (h, dv) in place — no (b,h,t,dv)->(b,t,h,dv)
        transpose materializes."""
        g = self._proj_heads(self.g_proj, h, self.head_v_dim)
        o = self.g_norm_swish_gate(o_heads, g)
        kernel = self.o_proj.variables["params"]["kernel"]
        o2, w = nn.dtypes.promote_dtype(o, jnp.asarray(kernel),
                                        dtype=self.dtype)
        w = w.reshape(self.num_heads, self.head_v_dim, -1)
        return jnp.einsum("bhtv,hvd->btd", o2, w)

    def _output(self, o_heads: Array, x: Array,
                g: Optional[Array] = None) -> Array:
        # o_heads: (b, h, t, dv_head) -> gate + merge + project; ``g``
        # lets decode paths reuse the merged-projection output gate
        b, h, t, dv = o_heads.shape
        o = o_heads.transpose(0, 2, 1, 3)  # (b, t, h, dv)
        g = (self.g_proj(x) if g is None else g).reshape(b, t, h, dv)
        o = self.g_norm_swish_gate(o, g)
        return self.o_proj(o.reshape(b, t, h * dv))

    # ---------- full-sequence (training / prefill) ----------
    def __call__(
        self,
        x: Array,
        reset_mask: Optional[Array] = None,
        initial_state: Optional[GLAState] = None,
        mode: str = "auto",
        reset_val: float = -20.0,
        output_final_state: bool = False,
        conv_history: bool = False,
        sf_emit_dtype: Optional[Any] = None,
    ):
        """x: (b, t, d) -> (b, t, d) [, GLAState if output_final_state].

        By default conv ring-buffer states are assumed zero at sequence
        start (causal padding); ``initial_state.s`` seeds the recurrence
        (init-state tuning, generation prefill). ``conv_history=True``
        additionally consumes ``initial_state``'s conv rings as the causal
        history of this chunk — exact mid-stream continuation (bucketed
        serving prefill runs a prompt as a few power-of-two chunks instead
        of one program per length).

        ``sf_emit_dtype`` overrides the dtype the Pallas kernels STORE the
        final state in (the returned state keeps the state dtype — the
        cast happens outside the kernel). generate_batch forces f32
        emission for the int8/int4 state_quant prefill: in-kernel bf16
        emission costs ~13% end-to-end on the b64 int8-state decode (190
        vs 218 x-realtime, A/B'd on v5e — an XLA layout/fusion artifact;
        numerics are identical either way). The f32 emissions stay live
        until end-of-prefill, so the caller budget-gates it by batch.
        XLA kernel paths already compute f32 and cast at the end, so the
        knob is a no-op there.
        """
        if mode == "auto":
            mode = self.kernel_mode
        if mode == "auto":
            # TPU: the Pallas kernel wins fwd+bwd (3.15 vs 5.12 ms at
            # B8 H4 T512 on v5e) and serves prefill/tuning too (returns the
            # final state, differentiable w.r.t. s0). It carries a
            # custom-partitioning rule (batch/head-parallel), so it shards
            # under dp x tp meshes too. CPU/tests: XLA chunk.
            mode = "chunk_pallas" if jax.default_backend() == "tpu" else "chunk"

        use_hist = (conv_history and self.use_short_conv
                    and initial_state is not None)
        if conv_history and self.use_short_conv and initial_state is None:
            raise ValueError("conv_history=True requires initial_state")

        def conv_hist(conv_mod, z, ring):
            # ring (w, b, dim) holds the last w conv INPUTS (newest last);
            # the conv window of this chunk's first token needs the last
            # w-1 of them as causal history.
            w = ring.shape[0]
            full = jnp.concatenate(
                [ring[1:].transpose(1, 0, 2).astype(z.dtype), z], axis=1)
            return conv_mod(full)[:, w - 1:]

        # In the shared-conv variant the reference rebinds hidden_states to the
        # conv output before gate/g projections (gla.py:150); mirror that.
        h = x
        use_cp = self.cp_axis is not None and not self.is_initializing()
        fuse_conv = (
            mode == "chunk_pallas"
            and self.use_short_conv
            and not self.share_conv_kernel
            and not use_hist
            and not use_cp  # CP: convs run outside (SPMD halo exchange)
            and self._chunk_conv_fusable()
        )
        # folded-layout path (opt-in, GLA_FOLD_LAYOUT=1): projections emit
        # (b, h, t, hd) directly; applies where projections act on a
        # (b, t, d) stream (fuse_conv / shared-conv / no-conv) — the
        # separate-conv-outside-the-kernel path keeps the legacy layout
        # (its convs run per-feature between projection and split)
        fold = (self._fold_layout() and not self.scalar_gate
                and not self.is_initializing()  # legacy path creates params
                and (fuse_conv or not self.use_short_conv
                     or self.share_conv_kernel))
        if fold:
            # the folded einsums read raw kernel leaves; a quantized
            # ({int8_q, int8_s}) tree must take the QDense-mediated legacy
            # path instead (int8 prefill in serving reaches here)
            from lina_speech_tpu.ops.qlinear import is_quantized_leaf

            fold = not any(
                is_quantized_leaf(m.variables["params"]["kernel"])
                for m in (self.q_proj, self.k_proj, self.v_proj,
                          self.g_proj, self.gk_proj_2, self.o_proj))
        if fold:
            if self.use_short_conv and self.share_conv_kernel:
                h = (conv_hist(self.h_conv1d, x, initial_state.conv_h)
                     if use_hist else self.h_conv1d(x))
            qh = self._proj_heads(self.q_proj, h, self.head_qk_dim)
            kh = self._proj_heads(self.k_proj, h, self.head_qk_dim)
            vh = self._proj_heads(self.v_proj, h, self.head_v_dim)
            gh = self._gates_heads(h, reset_mask, reset_val)
        else:
            if fuse_conv:
                # pre-conv projections: the short convs run inside the kernel
                q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
            elif self.use_short_conv:
                if self.share_conv_kernel:
                    h = (conv_hist(self.h_conv1d, x, initial_state.conv_h)
                         if use_hist else self.h_conv1d(x))
                    q, k, v = self.q_proj(h), self.k_proj(h), self.v_proj(h)
                elif use_hist:
                    q = conv_hist(self.q_conv1d, self.q_proj(x), initial_state.conv_q)
                    k = conv_hist(self.k_conv1d, self.k_proj(x), initial_state.conv_k)
                    v = conv_hist(self.v_conv1d, self.v_proj(x), initial_state.conv_v)
                else:
                    q = self.q_conv1d(self.q_proj(x))
                    k = self.k_conv1d(self.k_proj(x))
                    v = self.v_conv1d(self.v_proj(x))
            else:
                q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)

            gk = self._gates(h, reset_mask, reset_val)
            qh = self._split_heads(q, self.head_qk_dim)
            kh = self._split_heads(k, self.head_qk_dim)
            vh = self._split_heads(v, self.head_v_dim)
            gh = self._split_heads(gk, self.head_qk_dim)

        s0 = initial_state.s if initial_state is not None else None
        if use_cp:
            from lina_speech_tpu.ops.gla_cp import gla_chunk_cp

            if mode not in ("chunk", "chunk_pallas"):
                # no CP path exists for the scan oracle / chunk_parallel —
                # fail loudly instead of silently running "chunk"
                raise ValueError(
                    f"kernel_mode={mode!r} has no context-parallel "
                    f"implementation; use 'chunk' or 'chunk_pallas' "
                    f"(or unset cp_axis)")
            pallas = mode == "chunk_pallas"
            o, s_final = gla_chunk_cp(
                qh, kh, vh, gh, initial_state=s0,
                chunk_size=self.chunk_size, cp_axis=self.cp_axis,
                kernel="chunk_pallas" if pallas else "chunk",
                # the Pallas kernel must run on local shards (no
                # custom_partitioning inside the manual region): manualize
                # the repo's standard batch/head mesh axes too (ignored
                # when absent from the mesh — ops/gla_cp.py keep-logic)
                batch_axis="dp" if pallas else None,
                head_axis="tp" if pallas else None)
        elif fuse_conv:
            from lina_speech_tpu.ops.gla_pallas import gla_chunk_conv_pallas

            from lina_speech_tpu.ops.gla_cp import _pow2_chunk

            o, s_final = gla_chunk_conv_pallas(
                qh, kh, vh, gh,
                self.q_conv1d.kernel.astype(self.dtype),
                self.k_conv1d.kernel.astype(self.dtype),
                self.v_conv1d.kernel.astype(self.dtype),
                initial_state=s0,
                # kernel contract: power of two (round 192 -> 256 etc.)
                chunk_size=_pow2_chunk(self.chunk_size),
                sf_emit_dtype=sf_emit_dtype,
            )
        elif mode == "chunk_pallas":
            from lina_speech_tpu.ops.gla_cp import _pow2_chunk
            from lina_speech_tpu.ops.gla_pallas import gla_chunk_pallas

            o, s_final = gla_chunk_pallas(
                qh, kh, vh, gh, initial_state=s0,
                # dyadic-intra kernel: full-row MXU matmuls at C=128;
                # power-of-two contract (round 192 -> 256 etc.)
                chunk_size=_pow2_chunk(self.chunk_size),
                sf_emit_dtype=sf_emit_dtype,
            )
        elif mode == "chunk_parallel":
            from lina_speech_tpu.ops.gla import gla_chunk_parallel

            o, s_final = gla_chunk_parallel(qh, kh, vh, gh, initial_state=s0,
                                            chunk_size=self.chunk_size)
        elif mode == "chunk":
            o, s_final = gla_chunk(qh, kh, vh, gh, initial_state=s0, chunk_size=self.chunk_size)
        else:
            o, s_final = gla_scan_ref(qh, kh, vh, gh, initial_state=s0)

        out = self._output_folded(o, h) if fold else self._output(o, h)
        if output_final_state:
            state = self.empty_state(x.shape[0], dtype=x.dtype).replace(s=s_final)
            if self.use_short_conv:
                w = self.conv_size

                def tail(z, ring=None):
                    # new ring = last w conv inputs; a short chunk (t < w)
                    # keeps the incoming history's tail when continuing
                    if use_hist and ring is not None:
                        z = jnp.concatenate(
                            [ring.transpose(1, 0, 2).astype(z.dtype), z],
                            axis=1)
                    else:
                        z = jnp.pad(z, ((0, 0), (max(0, w - z.shape[1]), 0),
                                        (0, 0)))
                    return z[:, -w:, :].transpose(1, 0, 2)

                if self.share_conv_kernel:
                    ring = initial_state.conv_h if use_hist else None
                    state = state.replace(conv_h=tail(x, ring))
                else:
                    rq, rk, rv = ((initial_state.conv_q, initial_state.conv_k,
                                   initial_state.conv_v) if use_hist
                                  else (None, None, None))
                    state = state.replace(
                        conv_q=tail(self.q_proj(x), rq),
                        conv_k=tail(self.k_proj(x), rk),
                        conv_v=tail(self.v_proj(x), rv),
                    )
            return out, state
        return out

    # ---------- single-token decode ----------
    def step(self, x_t: Array, state: GLAState) -> Tuple[Array, GLAState]:
        """x_t: (b, d) one token; returns (o_t (b, d), new state)."""
        b = x_t.shape[0]
        # f32 recurrent state can't ride the fused decode kernels on TPU:
        # at the 8-row minimum block (sublane multiple — smaller is illegal
        # in the Pallas TPU lowering) the in+out state blocks measure
        # 16.38 MB > the 16 MB scoped-VMEM budget. The XLA step is at the
        # achievable-HBM-bandwidth floor anyway (BASELINE.md round-3
        # decode analysis), so wide-state decode (e.g. f32 tuned S0 from
        # train/initial_state.py) routes to the XLA path.
        wide_state = (jnp.dtype(state.s.dtype).itemsize >= 4
                      and jax.default_backend() == "tpu")
        # Tiny batches also route to the XLA step: the Pallas decode
        # kernels' minimum (batch*head) block is 8 rows (sublane multiple),
        # so b*h < 8 pays an 8-row pad on EVERY ring/state operand plus
        # ~9.4 us/call custom-call latency x n_layer per token. Measured
        # (v5e, flagship b1h4, int8 weights, bf16 state, 128-step loop):
        # fused 1.098 ms/step device vs XLA step 0.78 — 1225.9 tok/s
        # sustained vs 605. The fused kernel stays the b>=2 win (one state
        # read+write vs XLA's ~3 reads).
        from lina_speech_tpu.ops.gla_pallas import _BH_BLK

        tiny_batch = b * self.num_heads < _BH_BLK
        use_fused = not wide_state and (
            self.kernel_mode == "chunk_pallas"  # explicit force (tests)
            or (self.kernel_mode == "auto" and not tiny_batch
                and jax.default_backend() == "tpu")
        )
        h_t = x_t
        if (
            self.use_short_conv
            and not self.share_conv_kernel
            and use_fused
            and self._conv_fusable()
        ):
            return self._step_conv_fused(x_t, state)
        if self.use_short_conv and self.share_conv_kernel:
            h_t, conv_h = self.h_conv1d.step(x_t, state.conv_h)
            q, k, v, gp, gk1 = self._proj_qkvg(h_t)
            state = state.replace(conv_h=conv_h)
        elif self.use_short_conv:
            qp, kp, vp, gp, gk1 = self._proj_qkvg(x_t)
            q, conv_q = self.q_conv1d.step(qp, state.conv_q)
            k, conv_k = self.k_conv1d.step(kp, state.conv_k)
            v, conv_v = self.v_conv1d.step(vp, state.conv_v)
            state = state.replace(conv_q=conv_q, conv_k=conv_k, conv_v=conv_v)
        else:
            q, k, v, gp, gk1 = self._proj_qkvg(x_t)

        gk = self._gates_from_low_rank(h_t, gk1, None, -20.0)

        hsplit = lambda z, d: z.reshape(b, self.num_heads, d)
        if use_fused:
            # fused single-pass kernel: one state read + one write (the
            # unfused XLA lowering reads the state ~3x; state traffic IS the
            # decode cost at large batch). kernel_mode="chunk_pallas" forces
            # it off-TPU too (interpret mode) — used to exercise the kernel's
            # sharding rule in CPU-mesh tests; kernel_mode="chunk"/"scan" is
            # the explicit XLA escape when the trace-time default backend
            # doesn't match the intended platform (e.g. ambient remote TPU).
            from lina_speech_tpu.ops.gla_pallas import gla_decode_fused

            step_fn = gla_decode_fused
        else:
            step_fn = gla_decode_step
        o, s = step_fn(
            hsplit(q, self.head_qk_dim),
            hsplit(k, self.head_qk_dim),
            hsplit(v, self.head_v_dim),
            hsplit(gk, self.head_qk_dim),
            state.s,
        )
        state = state.replace(s=s)
        # one-token output path: (b, h, dv) -> gate/merge/project via seq dim 1
        out = self._output(o[:, :, None, :], h_t[:, None, :],
                           g=gp[:, None])[:, 0]
        return out, state

    def step_lazy(self, x_t: Array, state: GLAState, p: Array) -> Tuple[Array, GLAState]:
        """Lazy micro-chunk decode step (ops/gla.py:gla_decode_lazy_step):
        the recurrent state is READ-ONLY; the token lands in the window
        buffers; the caller folds via :func:`gla_fold_lazy_state` once per
        window. ``p``: () int32 position within the window."""
        from lina_speech_tpu.ops.gla import gla_decode_lazy_step

        b = x_t.shape[0]
        # The fused lazy step kernel is NOT the default: at b64 flagship
        # shapes the XLA lowering is already at the achievable-bandwidth
        # floor (119 us/layer-token vs 647 GB/s pure-read — BASELINE.md
        # round-3 analysis) and the fused kernel measured SLOWER end-to-end
        # (137.8x vs 165.7x aggregate realtime). Kept behind explicit
        # kernel_mode="chunk_pallas" for future hardware where fusion wins.
        use_fused = self.kernel_mode == "chunk_pallas"
        if (
            self.use_short_conv
            and not self.share_conv_kernel
            and use_fused
            and self._conv_fusable()
        ):
            return self._step_lazy_conv_fused(x_t, state, p)
        h_t = x_t
        if self.use_short_conv and self.share_conv_kernel:
            h_t, conv_h = self.h_conv1d.step(x_t, state.conv_h)
            q, k, v, gp, gk1 = self._proj_qkvg(h_t)
            state = state.replace(conv_h=conv_h)
        elif self.use_short_conv:
            qp, kp, vp, gp, gk1 = self._proj_qkvg(x_t)
            q, conv_q = self.q_conv1d.step(qp, state.conv_q)
            k, conv_k = self.k_conv1d.step(kp, state.conv_k)
            v, conv_v = self.v_conv1d.step(vp, state.conv_v)
            state = state.replace(conv_q=conv_q, conv_k=conv_k, conv_v=conv_v)
        else:
            q, k, v, gp, gk1 = self._proj_qkvg(x_t)

        gk = self._gates_from_low_rank(h_t, gk1, None, -20.0)
        hsplit = lambda z, d: z.reshape(b, self.num_heads, d)
        qh, kh, vh, gh = (hsplit(q, self.head_qk_dim),
                          hsplit(k, self.head_qk_dim),
                          hsplit(v, self.head_v_dim),
                          hsplit(gk, self.head_qk_dim))
        if state.s_scale is not None:
            if state.s.shape[-1] != state.vbuf.shape[-1]:  # int4 packed
                from lina_speech_tpu.ops.gla import gla_decode_lazy_step_q4

                o, kbuf, vbuf, cbuf, cc = gla_decode_lazy_step_q4(
                    qh, kh, vh, gh, state.s, state.s_scale,
                    state.kbuf, state.vbuf, state.cbuf, state.cc, p)
            else:
                from lina_speech_tpu.ops.gla import gla_decode_lazy_step_q

                o, kbuf, vbuf, cbuf, cc = gla_decode_lazy_step_q(
                    qh, kh, vh, gh, state.s, state.s_scale,
                    state.kbuf, state.vbuf, state.cbuf, state.cc, p)
        else:
            o, kbuf, vbuf, cbuf, cc = gla_decode_lazy_step(
                qh, kh, vh, gh,
                state.s, state.kbuf, state.vbuf, state.cbuf, state.cc, p,
            )
        state = state.replace(kbuf=kbuf, vbuf=vbuf, cbuf=cbuf, cc=cc)
        out = self._output(o[:, :, None, :], h_t[:, None, :],
                           g=gp[:, None])[:, 0]
        return out, state

    def _step_lazy_conv_fused(self, x_t: Array, state: GLAState,
                              p: Array) -> Tuple[Array, GLAState]:
        """Lazy decode step via the fused Pallas kernel: ring updates + silu
        + buffer append + read-only MXU readout in one HBM pass."""
        from lina_speech_tpu.ops.gla_pallas import gla_decode_lazy_conv_fused

        b = x_t.shape[0]
        h, dk, dv, w = (self.num_heads, self.head_qk_dim, self.head_v_dim,
                        self.conv_size)
        gk = self._raw_gates(x_t)
        hsplit = lambda z, d: z.reshape(b, h, d)
        csplit = lambda z, d: z.reshape(w, b, h, d)
        tsplit = lambda m, d: m.reshape(h, d, w).transpose(2, 0, 1)
        o, cq, ck, cv, kbuf, vbuf, cbuf, cc = gla_decode_lazy_conv_fused(
            hsplit(self.q_proj(x_t), dk),
            hsplit(self.k_proj(x_t), dk),
            hsplit(self.v_proj(x_t), dv),
            hsplit(gk, dk),
            tsplit(self.q_conv1d.kernel.astype(self.dtype), dk),
            tsplit(self.k_conv1d.kernel.astype(self.dtype), dk),
            tsplit(self.v_conv1d.kernel.astype(self.dtype), dv),
            csplit(state.conv_q, dk),
            csplit(state.conv_k, dk),
            csplit(state.conv_v, dv),
            state.s, state.kbuf, state.vbuf, state.cbuf, state.cc, p,
            s_scale=state.s_scale,
        )
        merge = lambda z, d: z.reshape(w, b, h * d)
        state = state.replace(
            conv_q=merge(cq, dk), conv_k=merge(ck, dk), conv_v=merge(cv, dv),
            kbuf=kbuf, vbuf=vbuf, cbuf=cbuf, cc=cc,
        )
        out = self._output(o[:, :, None, :], x_t[:, None, :])[:, 0]
        return out, state

    def _conv_fusable(self) -> bool:
        from lina_speech_tpu.ops.gla_pallas import _BH_BLK

        return (_BH_BLK % self.num_heads == 0
                and self.q_conv1d.bias is None
                and self.k_conv1d.bias is None
                and self.v_conv1d.bias is None)

    def _chunk_conv_fusable(self) -> bool:
        """Whether the training/prefill path can run the conv-fused chunk
        kernel (silu, no bias, width within the kernel's halo)."""
        from lina_speech_tpu.ops.gla_pallas import _HALO

        return (self.conv_size <= _HALO
                and self.q_conv1d.bias is None
                and self.k_conv1d.bias is None
                and self.v_conv1d.bias is None)

    def _step_conv_fused(self, x_t: Array, state: GLAState) -> Tuple[Array, GLAState]:
        """Decode step via the conv-fused Pallas kernel: the q/k/v ring
        updates + silu + GLA state update + readout in one HBM pass."""
        from lina_speech_tpu.ops.gla_pallas import gla_decode_conv_fused

        b = x_t.shape[0]
        h, dk, dv, w = (self.num_heads, self.head_qk_dim, self.head_v_dim,
                        self.conv_size)
        # merged q|k|v|g|gk1 projection: one weight stream per layer (b1
        # decode is weights-stream-bound; dispatch gaps between small
        # GEMVs are the cost)
        qp, kp, vp, gp, gk1 = self._proj_qkvg(x_t)
        gk = self._gates_from_low_rank(x_t, gk1, None, -20.0)
        hsplit = lambda z, d: z.reshape(b, h, d)
        csplit = lambda z, d: z.reshape(w, b, h, d)
        # taps (dim, w) -> (w, h, head_dim), tap 0 oldest
        tsplit = lambda m, d: m.reshape(h, d, w).transpose(2, 0, 1)
        o, s, cq, ck, cv = gla_decode_conv_fused(
            hsplit(qp, dk),
            hsplit(kp, dk),
            hsplit(vp, dv),
            hsplit(gk, dk),
            tsplit(self.q_conv1d.kernel.astype(self.dtype), dk),
            tsplit(self.k_conv1d.kernel.astype(self.dtype), dk),
            tsplit(self.v_conv1d.kernel.astype(self.dtype), dv),
            csplit(state.conv_q, dk),
            csplit(state.conv_k, dk),
            csplit(state.conv_v, dv),
            state.s,
        )
        merge = lambda z, d: z.reshape(w, b, h * d)
        state = state.replace(s=s, conv_q=merge(cq, dk), conv_k=merge(ck, dk),
                              conv_v=merge(cv, dv))
        out = self._output(o[:, :, None, :], x_t[:, None, :],
                           g=gp[:, None])[:, 0]
        return out, state
