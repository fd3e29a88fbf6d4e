"""Attentive-RNN backbones: recurrent encoder -> cross-attention -> decoder.

TPU-native re-design of the reference backbone contract
(model/attentive_rnn.py:6-17 — forward / init_state / step) with the state
made an explicit pytree (:class:`BackboneState`) instead of a mutable Cache:

- ``__call__``: full-sequence training/prefill path over the chunked kernels;
  optionally seeds from / returns the full state pytree, so prompt prefill
  for generation runs chunk-parallel instead of token-by-token (a deliberate
  improvement over the reference's sequential prompt feeding,
  modeling_lina.py:175-179 — bitwise the same recurrence).
- ``step``: one AR token; jits inside ``lax.scan`` / ``while_loop``.
- initial-state tuning hooks (reference gla.py:315-356): LoRA-factorized
  per-layer S0 parameters, materialized into a :class:`BackboneState`.

:class:`EncoderCrossDecoder` is the shared scaffold (the reference repeats
this shape in gla.py / simple_gla.py / rwkv6.py / mamba.py); concrete
backbones plug in their token mixer + per-layer state. ``AttentiveGLA``
mirrors gla.py:252-365 (the released-checkpoint architecture);
``CrossAttGLA`` mirrors gla.py:367-420 (interleaved variant). Also supported
(from the mamba variant, mamba.py:75-82): ``forced_attention`` — an
externally imposed cross-attention matrix — and ``attention_only`` early
exit.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from lina_speech_tpu.models.base_blocks import MixingBlock, SwiGLU
from lina_speech_tpu.models.crossatt import (
    BlindCrossAttention,
    CrossAttention,
    CrossAttentionPP,
)
from lina_speech_tpu.models.gla_layer import (
    GatedLinearAttention,
    GLAState,
    gla_add_lazy_buffers,
    gla_empty_state,
    gla_fold_lazy_state,
)

Array = jnp.ndarray


def add_lazy_buffers(state: "BackboneState", window: int,
                     dtype=jnp.bfloat16,
                     state_quant=None) -> "BackboneState":
    """Attach lazy micro-chunk window buffers to every GLA layer state
    (pure; raises for backbones whose mixers don't support lazy decode).

    ``state_quant="int8"`` row-quantizes the LAYER base states (the
    dominant decode HBM traffic); the small pos_net state stays full
    precision."""
    def one(st, quant):
        if isinstance(st, GLAState):
            return gla_add_lazy_buffers(st, window, dtype,
                                        state_quant=quant)
        raise TypeError(f"lazy decode unsupported for {type(st).__name__}")

    pos = one(state.pos_net, None) if state.pos_net is not None else None
    return BackboneState(
        layers=tuple(one(s, state_quant) for s in state.layers),
        pos_net=pos)


def fold_lazy_state(state: "BackboneState") -> "BackboneState":
    """Fold every layer's buffered window into its base state (pure)."""
    pos = (gla_fold_lazy_state(state.pos_net)
           if state.pos_net is not None else None)
    return BackboneState(
        layers=tuple(gla_fold_lazy_state(s) for s in state.layers),
        pos_net=pos)


@flax.struct.dataclass
class BackboneState:
    """Decode state for the whole backbone: per-block mixer states, in order
    encoder blocks then decoder blocks, plus the cross-attention's stateful
    pos_net / inter_net block if present."""

    layers: Tuple[Any, ...]
    pos_net: Optional[Any] = None


def _gla_block(d: int, h: int, use_short_conv: bool, expand_k: float, expand_v: float,
               dropout: float, chunk_size: int, dtype: Any,
               scalar_gate: bool = False, kernel_mode: str = "auto",
               cp_axis=None) -> MixingBlock:
    return MixingBlock(
        tmix=GatedLinearAttention(
            hidden_size=d,
            num_heads=h,
            use_short_conv=use_short_conv,
            expand_k=expand_k,
            expand_v=expand_v,
            chunk_size=chunk_size,
            scalar_gate=scalar_gate,
            kernel_mode=kernel_mode,
            cp_axis=cp_axis,
            dtype=dtype,
        ),
        cmix=SwiGLU(d, dtype=dtype),
        dropout=dropout,
    )


class EncoderCrossDecoder(nn.Module):
    """Shared scaffold: n_layer mixer blocks -> ONE cross-attention -> n_layer
    mixer blocks, with an explicit state pytree threading through all of it."""

    d_model: int = 1024
    n_layer: int = 12
    heads: int = 4
    dropout_att: float = 0.0
    dropout: float = 0.0
    d_blind: Optional[int] = None
    blind: bool = False
    cross_att_pp: bool = False
    rotary: bool = False
    pos_type: str = "sinusoidal"
    remat: bool = False
    dtype: Any = jnp.float32
    state_dtype: Any = jnp.float32  # bf16 halves decode HBM traffic

    # ---- subclass hooks ----
    def _block(self, d: int) -> nn.Module:
        raise NotImplementedError

    def _layer_state(self, batch_size: int, d: int, dtype: Any):
        raise NotImplementedError

    # ---- construction ----
    def setup(self):
        self.encoder = [self._block(self.d_model) for _ in range(self.n_layer)]
        self.decoder = [self._block(self.d_model) for _ in range(self.n_layer)]
        d_blind = self.d_model if self.d_blind is None else self.d_blind
        if self.blind:
            self.cross_att = BlindCrossAttention(
                self.d_model, self.d_model, self.d_model,
                pos_net=self._block(d_blind), pos_dim=d_blind,
                pos_type=self.pos_type, dtype=self.dtype,
            )
        elif self.cross_att_pp:
            self.cross_att = CrossAttentionPP(
                self.d_model, inter_net=self._block(self.d_model), ca_heads=1,
                dtype=self.dtype,
            )
        else:
            self.cross_att = CrossAttention(
                self.d_model, self.d_model, self.d_model, self.heads,
                rotary=self.rotary, dtype=self.dtype,
            )

    @property
    def _has_stateful_crossatt(self) -> bool:
        return self.blind or self.cross_att_pp

    # ---- full sequence ----
    def __call__(
        self,
        x: Array,
        ctx: Array,
        mask: Optional[Array] = None,
        reset_mask: Optional[Array] = None,
        init_state: Optional[BackboneState] = None,
        crossatt_pos: Optional[Array] = None,
        return_att: bool = False,
        output_final_state: bool = False,
        deterministic: bool = True,
        forced_attention: Optional[Array] = None,
        attention_only: bool = False,
        conv_history: bool = False,
        time_offset: int | Array = 0,
        crossatt_pos_valid: Optional[Array] = None,
        sf_emit_dtype=None,
    ):
        """x: (b, t, d) audio-embedding stream; ctx: (b, m, d) text encoding.

        Returns (y, att) or (y, att, final_state). ``conv_history`` makes
        every mixer consume ``init_state``'s conv rings as causal history
        and ``time_offset`` offsets rotary cross-attention query positions —
        together they make a mid-stream chunked prefill exact (serving runs
        a prompt as a few power-of-two chunks, bounding compiled programs).
        """
        use_state = init_state is not None or output_final_state
        if init_state is None and use_state:
            init_state = self.empty_state(x.shape[0])
        hist_kw = {"conv_history": True} if conv_history else {}
        # final-state EMISSION dtype override for the mixers' chunk
        # kernels (GLA-family only — the int8/int4 state_quant prefill;
        # see GatedLinearAttention.__call__). Not forwarded to cross_att
        # (its pos-net state is tiny; signature stays family-generic).
        blk_kw = dict(hist_kw)
        if sf_emit_dtype is not None:
            blk_kw["sf_emit_dtype"] = sf_emit_dtype

        def run_block(block, x, layer_state):
            if use_state:
                return block(
                    x, reset_mask=reset_mask, initial_state=layer_state,
                    output_final_state=True, deterministic=deterministic,
                    **blk_kw,
                )
            if self.remat and deterministic is False:
                fn = nn.remat(lambda m, a, rm: m(a, reset_mask=rm, deterministic=False))
                return fn(block, x, reset_mask), None
            return block(x, reset_mask=reset_mask, deterministic=deterministic), None

        final_layers: List = []
        for i, blk in enumerate(self.encoder):
            st = init_state.layers[i] if use_state else None
            x, st = run_block(blk, x, st)
            final_layers.append(st)

        ca_state = init_state.pos_net if (use_state and self._has_stateful_crossatt) else None
        ca_final = None
        if forced_attention is not None:
            # impose the cross-attention matrix (reference mamba.py:75-78)
            ctx_v = self.cross_att.ln_v(self.cross_att.v(ctx))
            v = jnp.einsum("bmn,bmd->bnd", forced_attention, ctx_v)
            att = forced_attention
        elif self._has_stateful_crossatt:
            pv_kw = ({"pos_valid": crossatt_pos_valid}
                     if (crossatt_pos_valid is not None and self.blind) else {})
            v, att, ca_final = self.cross_att(
                x, ctx, mask=mask, pos=crossatt_pos, pos_net_state=ca_state,
                reset_mask=reset_mask, time_step=time_offset,
                return_weights=return_att, **hist_kw, **pv_kw,
            )
        else:
            v, att = self.cross_att(x, ctx, mask=mask, time_step=time_offset,
                                    return_weights=return_att)
        if attention_only:
            return v, att
        x = x + v

        for i, blk in enumerate(self.decoder):
            st = init_state.layers[self.n_layer + i] if use_state else None
            x, st = run_block(blk, x, st)
            final_layers.append(st)

        if output_final_state:
            return x, att, BackboneState(layers=tuple(final_layers), pos_net=ca_final)
        return x, att

    # ---- one decode token ----
    def step(
        self,
        y_embd: Array,
        x_enc: Array,
        state: BackboneState,
        mask: Optional[Array] = None,
        crossatt_pos: Optional[Array] = None,
        time_step: Optional[Array] = None,
        lazy_p: Optional[Array] = None,
        crossatt_pos_valid: Optional[Array] = None,
    ):
        """y_embd: (b, d) current token embedding; x_enc: (b, m, d).

        Returns (y (b, d), att, new_state). Mirrors gla.py:358-365.
        ``lazy_p`` (window position, () int32) switches every mixer to the
        lazy micro-chunk step — states must carry the window buffers
        (:func:`add_lazy_buffers`), and the caller folds once per window
        (:func:`fold_lazy_state`).
        """
        run = (lambda blk, y, st: blk.step_lazy(y, st, lazy_p)) \
            if lazy_p is not None else (lambda blk, y, st: blk.step(y, st))
        layers = list(state.layers)
        for i, blk in enumerate(self.encoder):
            y_embd, layers[i] = run(blk, y_embd, layers[i])

        if self._has_stateful_crossatt:
            pv_kw = ({"pos_valid": crossatt_pos_valid}
                     if (crossatt_pos_valid is not None and self.blind) else {})
            v, att, pos_net_state = self.cross_att.step(
                y_embd, x_enc, state.pos_net, mask=mask, pos=crossatt_pos,
                time_step=time_step, lazy_p=lazy_p, **pv_kw,
            )
        else:
            v, att = self.cross_att(
                y_embd[:, None], x_enc, mask=mask, time_step=time_step,
                return_weights=True,
            )
            v, att, pos_net_state = v[:, 0], att[:, :, 0], None
        y_embd = y_embd + v

        for i, blk in enumerate(self.decoder):
            j = self.n_layer + i
            y_embd, layers[j] = run(blk, y_embd, layers[j])

        return y_embd, att, BackboneState(layers=tuple(layers), pos_net=pos_net_state)

    # ---- state management ----
    def empty_state(self, batch_size: int, dtype: Any = jnp.float32) -> BackboneState:
        """Zero state for all 2*n_layer blocks (+ pos_net); reference
        gla.py:302-313 (including the state the reference's buggy
        ``d.tmix`` indexing was *meant* to create for pos_net)."""
        mk = lambda d: self._layer_state(batch_size, d, dtype)
        layers = tuple(mk(self.d_model) for _ in range(2 * self.n_layer))
        pos_net = None
        if self._has_stateful_crossatt:
            pos_net = mk(self.d_model if self.d_blind is None else self.d_blind)
        return BackboneState(layers=layers, pos_net=pos_net)


class AttentiveGLA(EncoderCrossDecoder):
    use_short_conv: bool = False
    expand_k: float = 1.0
    expand_v: float = 2.0
    chunk_size: int = 64
    scalar_gate: bool = False
    kernel_mode: str = "auto"
    cp_axis: Optional[str] = None  # context parallelism (ops/gla_cp.py)

    def _block(self, d: int) -> MixingBlock:
        return _gla_block(
            d, self.heads, self.use_short_conv, self.expand_k, self.expand_v,
            self.dropout, self.chunk_size, self.dtype, self.scalar_gate,
            self.kernel_mode, self.cp_axis,
        )

    def _layer_state(self, batch_size: int, d: int, dtype: Any) -> GLAState:
        return gla_empty_state(
            batch_size, d, self.heads, self.expand_k, self.expand_v,
            self.use_short_conv, False, 4, dtype, state_dtype=self.state_dtype,
        )

    # ---------- initial-state tuning (speaker adaptation) ----------
    def _layer_dims(self):
        key_dim = int(self.d_model * self.expand_k)
        value_dim = int(self.d_model * self.expand_v)
        return key_dim // self.heads, value_dim // self.heads

    def init_state_tuning_params(
        self, key: jax.Array, rank: Optional[int] = 1, scale: float = 0.02
    ) -> List:
        """Per-block LoRA-factorized S0 params (reference gla.py:336-356).

        Each of the 2*n_layer blocks gets (k: (1, r, h, d_k, 1),
        v: (1, r, h, 1, d_v)); with rank=None a full (1, h, d_k, d_v)."""
        dk, dv = self._layer_dims()
        params = []
        for _ in range(2 * self.n_layer):
            key, k1, k2 = jax.random.split(key, 3)
            if rank is not None:
                params.append(
                    (
                        jax.random.normal(k1, (1, rank, self.heads, dk, 1)),
                        jax.random.normal(k2, (1, rank, self.heads, 1, dv)) * scale,
                    )
                )
            else:
                params.append(jax.random.normal(k1, (1, self.heads, dk, dv)) * scale)
        return params

    def state_from_params(
        self, params: List, batch_size: int, scale: float = 0.02
    ) -> BackboneState:
        """Materialize tuning params into a BackboneState (gla.py:315-325)."""
        state = self.empty_state(batch_size)
        layers = list(state.layers)
        for i, p in enumerate(params):
            if isinstance(p, tuple):
                s = jnp.einsum("brhko,brhov->bhkv", p[0], p[1]) * scale
            else:
                s = p
            s = jnp.broadcast_to(s, (batch_size,) + s.shape[1:]).astype(jnp.float32)
            layers[i] = layers[i].replace(s=s)
        return state.replace(layers=tuple(layers))


class InterleavedCrossAtt(nn.Module):
    """Single mixer stack with cross-attention interleaved at given layer
    indices (reference gla.py:367-477 CrossAttGLA(V2),
    mamba.py:115-257 CrossAttMamba(V2)). Attention maps from the layers are
    concatenated over the head axis (the V2 behavior)."""

    d_model: int
    n_layer: int
    cross_att_layers: Tuple[int, ...]
    heads: int
    cross_att_heads: int = 1
    dropout_att: float = 0.0
    dropout: float = 0.0
    rotary: bool = False
    dtype: Any = jnp.float32
    state_dtype: Any = jnp.float32

    def _block(self, d: int) -> nn.Module:
        raise NotImplementedError

    def _layer_state(self, batch_size: int, d: int, dtype: Any):
        raise NotImplementedError

    def setup(self):
        self.blocks = [self._block(self.d_model) for _ in range(self.n_layer)]
        self.cross_att = [
            CrossAttention(self.d_model, self.d_model, self.d_model,
                           self.cross_att_heads, rotary=self.rotary, dtype=self.dtype)
            for _ in self.cross_att_layers
        ]

    def __call__(self, x, ctx, mask=None, reset_mask=None, init_state=None,
                 crossatt_pos=None, return_att: bool = False,
                 output_final_state: bool = False, deterministic: bool = True,
                 forced_attention=None, attention_only: bool = False,
                 conv_history: bool = False, time_offset: int | Array = 0,
                 crossatt_pos_valid=None, sf_emit_dtype=None):
        # crossatt_pos_valid accepted for signature parity; the interleaved
        # variants use plain CrossAttention (no positional values to mask)
        use_state = init_state is not None or output_final_state
        if init_state is None and use_state:
            init_state = self.empty_state(x.shape[0])
        hist_kw = {"conv_history": True} if conv_history else {}
        if sf_emit_dtype is not None:
            # mixer final-state EMISSION dtype override (state_quant
            # prefill; GatedLinearAttention.__call__) — blocks only
            hist_kw["sf_emit_dtype"] = sf_emit_dtype
        idx = {k: i for i, k in enumerate(self.cross_att_layers)}
        atts = []
        final_layers = []
        for i, blk in enumerate(self.blocks):
            if use_state:
                x, st = blk(x, reset_mask=reset_mask, initial_state=init_state.layers[i],
                            output_final_state=True, deterministic=deterministic,
                            **hist_kw)
            else:
                x = blk(x, reset_mask=reset_mask, deterministic=deterministic)
                st = None
            final_layers.append(st)
            if i in idx:
                v, att = self.cross_att[idx[i]](x, ctx, mask=mask,
                                                time_step=time_offset,
                                                return_weights=return_att)
                x = x + v
                if att is not None:
                    atts.append(att)
        att = jnp.concatenate(atts, axis=1) if atts else None
        if output_final_state:
            return x, att, BackboneState(layers=tuple(final_layers))
        return x, att

    def step(self, y_embd, x_enc, state: BackboneState, mask=None, crossatt_pos=None,
             time_step=None, lazy_p=None, crossatt_pos_valid=None):
        idx = {k: i for i, k in enumerate(self.cross_att_layers)}
        layers = list(state.layers)
        atts = []
        run = (lambda blk, y, st: blk.step_lazy(y, st, lazy_p)) \
            if lazy_p is not None else (lambda blk, y, st: blk.step(y, st))
        for i, blk in enumerate(self.blocks):
            y_embd, layers[i] = run(blk, y_embd, layers[i])
            if i in idx:
                v, att = self.cross_att[idx[i]](y_embd[:, None], x_enc, mask=mask,
                                                time_step=time_step,
                                                return_weights=True)
                y_embd = y_embd + v[:, 0]
                atts.append(att[:, :, 0])
        att = jnp.concatenate(atts, axis=1) if atts else None
        return y_embd, att, BackboneState(layers=tuple(layers))

    def empty_state(self, batch_size: int, dtype: Any = jnp.float32) -> BackboneState:
        return BackboneState(
            layers=tuple(self._layer_state(batch_size, self.d_model, dtype)
                         for _ in range(self.n_layer))
        )


class CrossAttGLA(InterleavedCrossAtt):
    use_short_conv: bool = False
    expand_k: float = 1.0
    expand_v: float = 2.0
    chunk_size: int = 64
    kernel_mode: str = "auto"
    cp_axis: Optional[str] = None  # context parallelism (ops/gla_cp.py)

    def _block(self, d: int) -> MixingBlock:
        return _gla_block(d, self.heads, self.use_short_conv, self.expand_k,
                          self.expand_v, self.dropout, self.chunk_size,
                          self.dtype, kernel_mode=self.kernel_mode,
                          cp_axis=self.cp_axis)

    def _layer_state(self, batch_size: int, d: int, dtype: Any) -> GLAState:
        return gla_empty_state(
            batch_size, d, self.heads, self.expand_k, self.expand_v,
            self.use_short_conv, False, 4, dtype, state_dtype=self.state_dtype,
        )
