"""LinaModel — the TTS model tying embeddings, text encoder, backbone, head.

Reference: model/modeling_lina.py. Differences forced by / exploited for TPU:

- the training loss is a fixed-shape masked mean (the reference's boolean
  advanced indexing, modeling_lina.py:96-99, is dynamic-shape and cannot jit);
  numerics are identical (CE with ignore_index=1 restricted to y_mask).
- classifier-free text masking draws its Bernoulli from an explicit
  ``text_mask`` PRNG collection (the reference's in-place fill,
  modeling_lina.py:68-70, has a float-index bug we do not replicate).
- generation lives in ``lina_speech_tpu/generate.py`` as a jitted scan over
  :meth:`decode_step`, with chunk-parallel prompt prefill via
  :meth:`prefill`.
"""
from __future__ import annotations

from collections.abc import Mapping

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lina_speech_tpu.models.attentive_rnn import BackboneState
from lina_speech_tpu.models.multiembed import MultiEmbedding

Array = jnp.ndarray


class LinaModel(nn.Module):
    attentive_rnn: nn.Module
    d_model: int
    n_quant: int
    n_codebook: int
    n_special_token_in: int
    n_special_token_out: int
    n_txt_vocab_base: int  # before the optional CFG mask token
    tie_embed: bool = False
    txt_encoder: Optional[nn.Module] = None
    spk_encoder: Optional[nn.Module] = None
    mask_text_p: float = 0.0
    dtype: Any = jnp.float32

    @property
    def n_txt_vocab(self) -> int:
        return self.n_txt_vocab_base + int(self.mask_text_p > 0.0)

    @property
    def n_target_vocab(self) -> int:
        return self.n_codebook + self.n_special_token_out

    def setup(self):
        self.txt_embed = nn.Embed(
            self.n_txt_vocab, self.d_model, dtype=self.dtype,
            embedding_init=nn.initializers.normal(1.0),
        )
        self.rvq_embed = MultiEmbedding(
            self.n_quant, self.n_codebook + self.n_special_token_in, self.d_model,
            padding_idx=0, dtype=self.dtype,
        )
        if not self.tie_embed:
            # EinMix "b n d -> b n q l" with weight (q, l, d), no bias
            # (modeling_lina.py:51-57)
            self.logits_weight = self.param(
                "logits_weight",
                nn.initializers.lecun_normal(in_axis=-1, out_axis=-2, batch_axis=(0,)),
                (self.n_quant, self.n_target_vocab, self.d_model),
                jnp.float32,
            )

    # ---------- shared pieces ----------
    def _head(self, y_hat: Array) -> Array:
        if self.tie_embed:
            return self.rvq_embed.attend(y_hat)
        w = self.logits_weight
        if isinstance(w, Mapping) and "int8_q" in w:
            # tree-swapped int8 head (utils/quantize.py): the dequant is
            # traced into the decode loop so XLA streams the int8 bytes
            # and fuses the (q, l, 1) rescale into the contraction
            w = w["int8_q"].astype(self.dtype) * w["int8_s"].astype(self.dtype)
        else:
            w = w.astype(self.dtype)
        return jnp.einsum("bnd,qld->bnql", y_hat, w)

    def embed_tokens(self, y: Array) -> Array:
        """(q, b, n) token ids -> (b, n, d) summed quantizer embeddings."""
        return self.rvq_embed(y).sum(axis=0)

    def encode_text(self, x: Array, encoder_mask: Optional[Array] = None,
                    deterministic: bool = True) -> Array:
        x_embd = self.txt_embed(x)
        if self.txt_encoder is None:
            return x_embd
        return self.txt_encoder(x_embd, mask=encoder_mask, deterministic=deterministic)

    # ---------- training forward ----------
    def __call__(
        self,
        x: Array,
        y: Array,
        encoder_mask: Optional[Array] = None,
        crossatt_mask: Optional[Array] = None,
        logits_mask: Optional[Array] = None,
        reset_mask: Optional[Array] = None,
        init_state: Optional[BackboneState] = None,
        crossatt_pos: Optional[Array] = None,
        return_att: bool = False,
        deterministic: bool = True,
    ):
        """x: (b, m) text ids; y: (b, n, q) delayed codec ids.

        Returns (logits (b, n-1, q, l), loss, att).
        """
        if self.mask_text_p > 0.0 and not deterministic:
            key = self.make_rng("text_mask")
            drop = jax.random.bernoulli(key, self.mask_text_p, (x.shape[0],))
            x = jnp.where(drop[:, None], self.n_txt_vocab - 1, x)

        y_embd = self.embed_tokens(jnp.transpose(y, (2, 0, 1)))  # (b, n, d)
        x_enc = self.encode_text(x, encoder_mask, deterministic=deterministic)

        if self.spk_encoder is not None:
            spk = self.spk_encoder(y_embd, deterministic=deterministic)
            y_embd = y_embd.at[:, 0].set(spk)

        ca_mask = crossatt_mask[:, :-1] if crossatt_mask is not None else None
        # the backbone consumes y[:, :-1]; align per-position masks with it
        if reset_mask is not None and reset_mask.shape[1] == y.shape[1]:
            reset_mask = reset_mask[:, :-1]
        out = self.attentive_rnn(
            y_embd[:, :-1, :], x_enc, mask=ca_mask, reset_mask=reset_mask,
            init_state=init_state, crossatt_pos=crossatt_pos,
            return_att=return_att, deterministic=deterministic,
        )
        y_hat, att = out[0], out[1]

        logits = self._head(y_hat)
        target = y[:, 1:]  # (b, n-1, q)

        logf = logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(logf, axis=-1)
        ll = jnp.take_along_axis(logf, target[..., None], axis=-1)[..., 0]
        ce = logz - ll  # (b, n-1, q)

        valid = target != 1  # ignore_index=1 (modeling_lina.py:106)
        if logits_mask is not None:
            valid = valid & logits_mask[:, 1:, None]
        denom = jnp.maximum(valid.sum(), 1)
        loss = jnp.where(valid, ce, 0.0).sum() / denom

        return logits, loss, att

    # ---------- generation support ----------
    def decode_step(
        self,
        y_embd: Array,
        x_enc: Array,
        state: BackboneState,
        crossatt_pos: Optional[Array] = None,
        time_step: Optional[Array] = None,
        lazy_p: Optional[Array] = None,
        crossatt_mask: Optional[Array] = None,
        crossatt_pos_valid: Optional[Array] = None,
    ):
        """One AR token: backbone step + per-quantizer logits.

        y_embd: (b, d) -> (logits (b, q, l), att, new_state). ``lazy_p``
        selects the lazy micro-chunk decode path (read-only recurrent
        states + window buffers; see generate.py lazy_window).
        ``crossatt_mask`` (b, 1, m) hides padded text positions (slot-based
        serving mixes different text lengths in one batch);
        ``crossatt_pos_valid`` (b, m) additionally makes ConvPos
        padding-exact (see models/crossatt.py ConvPos).
        """
        kw = {}
        if crossatt_pos_valid is not None:
            kw["crossatt_pos_valid"] = crossatt_pos_valid
        y, att, state = self.attentive_rnn.step(
            y_embd, x_enc, state, mask=crossatt_mask,
            crossatt_pos=crossatt_pos,
            time_step=time_step, lazy_p=lazy_p, **kw,
        )
        logits = self._head(y[:, None])[:, 0]  # (b, q, l)
        return logits, att, state

    def prefill(
        self,
        y_embd: Array,
        x_enc: Array,
        state: Optional[BackboneState] = None,
        crossatt_pos: Optional[Array] = None,
        return_att: bool = False,
        crossatt_mask: Optional[Array] = None,
        conv_history: bool = False,
        time_offset: int | Array = 0,
        crossatt_pos_valid: Optional[Array] = None,
        sf_emit_dtype=None,
    ):
        """Chunk-parallel prefill of (b, t, d) forced embeddings.

        Returns (logits (b, t, q, l), att, final_state): logits at every
        position (the model's predictions under teacher forcing) and the
        state ready for AR continuation. ``conv_history``/``time_offset``
        make a mid-stream continuation chunk exact (bucketed serving
        prefill; see EncoderCrossDecoder.__call__).
        """
        kw = {}
        # only the mid-stream-capable backbones accept these (GLA family);
        # default single-shot prefill keeps every backbone's signature
        if conv_history:
            kw["conv_history"] = True
        if not (isinstance(time_offset, int) and time_offset == 0):
            kw["time_offset"] = time_offset
        if crossatt_pos_valid is not None:
            kw["crossatt_pos_valid"] = crossatt_pos_valid
        if sf_emit_dtype is not None:
            # kernel final-state EMISSION dtype (int8/int4 state_quant
            # prefill — generate_batch budget-gates f32 by batch)
            kw["sf_emit_dtype"] = sf_emit_dtype
        y_hat, att, final_state = self.attentive_rnn(
            y_embd, x_enc, mask=crossatt_mask, init_state=state,
            crossatt_pos=crossatt_pos,
            return_att=return_att, output_final_state=True, **kw,
        )
        return self._head(y_hat), att, final_state

    def empty_state(self, batch_size: int) -> BackboneState:
        return self.attentive_rnn.empty_state(batch_size)
