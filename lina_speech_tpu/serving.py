"""Slot-based continuous-batching decode server.

Production-serving capability beyond the reference (whose batch inference
is one fixed ``generate_batch`` call, modeling_lina.py:111-192): a fixed
pool of ``n_slots`` decode slots runs one jitted chunked decode loop;
finished streams free their slot, which is refilled from the request
queue via a single-request prefill inserted into the batched state — so
short utterances never hold the batch hostage and the chip stays busy at
high occupancy.

TPU-native design: everything device-side is fixed-shape — text padded to
``max_text_len`` with a cross-attention mask, per-slot ``time_step``
vectors (rotary variants take per-batch offsets), state insertion by
``dynamic_update_index`` over the batch axis of every state leaf (axis
inferred per leaf: conv rings are (w, b, d), recurrent states (b, h, ...)).
Two compiled programs total: ``_prefill_one`` (b=1) and ``_decode_chunk``
(n_slots, ``chunk`` tokens per dispatch); slot refills happen between
chunks on the host.

Greedy decoding (k=1) is bit-identical to :func:`generate.generate_batch`
on the same request (tests/test_serving.py). One padding caveat: with
``pos_type="convolutional"`` (the flagship's ConvPos), the non-causal
31-tap positional smoothing sees different neighborhoods near the text
tail under padding than an unpadded run would — sinusoidal positions are
exactly padding-invariant.
"""
from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.generate import _sample_tokens
from lina_speech_tpu.models.lina import LinaModel

Array = jnp.ndarray
STOP_ID = 2


@dataclasses.dataclass
class _Slot:
    rid: Optional[int] = None
    t: int = 0            # next free-running step (== n_pre after prefill)
    max_len: int = 0
    tokens: Optional[List[np.ndarray]] = None  # produced (q,) rows


@dataclasses.dataclass
class Completion:
    rid: int
    tokens: np.ndarray    # (length, q) raw codec tokens (delay pattern)
    length: int
    stopped: bool         # True: emitted the stop token; False: hit max_len


def _batch_axis(b_shape, o_shape, n_slots):
    """Axis where the batched leaf has ``n_slots`` and the single-request
    leaf has 1 (everything else equal)."""
    for i, (bs, os) in enumerate(zip(b_shape, o_shape)):
        if bs == n_slots and os == 1 and \
                b_shape[:i] + b_shape[i + 1:] == o_shape[:i] + o_shape[i + 1:]:
            return i
    raise ValueError(f"no batch axis between {b_shape} and {o_shape}")


class DecodeServer:
    """Continuous-batching TTS decode engine.

    Usage::

        srv = DecodeServer(model, params, n_slots=8, max_text_len=64)
        srv.submit(text_ids, max_len=400)         # -> request id
        done = srv.run()                          # drain queue + slots
    """

    def __init__(
        self,
        model: LinaModel,
        params,
        n_slots: int = 8,
        max_text_len: int = 64,
        chunk: int = 16,
        k: int = 1,
        temp: float = 1.0,
        first_greedy_quant: int = 1,
        seed: int = 0,
        weight_quant: Optional[str] = None,
    ):
        self.model = model
        self.n_slots = n_slots
        self.max_text_len = max_text_len
        self.chunk = chunk
        self.sample_args = (k, temp, first_greedy_quant)
        self.key = jax.random.PRNGKey(seed)
        self._next_rid = 0
        self._queue: deque = deque()
        self._slots = [_Slot() for _ in range(n_slots)]
        self._done: List[Completion] = []

        cdt = model.dtype
        if cdt != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(cdt)
                if (hasattr(p, "dtype") and p.dtype == jnp.float32) else p,
                params,
            )
        self.params = params
        if weight_quant == "int8":
            from lina_speech_tpu.utils.quantize import (
                dequantize_params, quantize_params,
            )

            params_q = quantize_params(params)
            # dequant traced inside the chunk loop: XLA streams int8
            # weights (same opt-in knob as generate_batch)
            self._loop_params = lambda: dequantize_params(params_q, cdt)
        elif weight_quant is not None:
            raise ValueError(f"unknown weight_quant {weight_quant!r}")
        else:
            self._loop_params = lambda: params

        d = model.d_model
        m = max_text_len
        B = n_slots
        self._x_enc = jnp.zeros((B, m, d), cdt)
        self._ca_mask = jnp.zeros((B, 1, m), bool)
        self._y_embd = jnp.zeros((B, d), cdt)
        self._t = jnp.zeros((B,), jnp.int32)
        self._state = model.empty_state(B)

        self._prefill_one = jax.jit(self._prefill_one_impl)
        self._decode_chunk = jax.jit(self._decode_chunk_impl)
        self._insert = jax.jit(self._insert_impl)

    # ------------------------------------------------------------ jitted
    def _prefill_one_impl(self, params, x, enc_mask, ca_mask, forced_codes,
                          n_forced, key):
        """b=1 prefill. ``forced_codes``: (q, 1, P) codes (head token 1 in
        column 0, then offset prompt codes, zero-padded); ``n_forced``: ()
        number of valid columns; returns everything the slot needs."""
        model = self.model
        x_enc = model.apply(params, x, enc_mask, method=LinaModel.encode_text)
        forced = model.apply(params, forced_codes,
                             method=LinaModel.embed_tokens)  # (1, P, d)
        state0 = model.empty_state(1)
        P = forced.shape[1]
        pf_mask = jnp.broadcast_to(ca_mask, (1, P, ca_mask.shape[-1]))
        logits_pre, _, state = model.apply(
            params, forced, x_enc, state0, crossatt_mask=pf_mask,
            method=LinaModel.prefill,
        )  # (1, P, q, l)
        k, temp, fgq = self.sample_args
        keys = jax.random.split(key, P)
        pre_tokens = jax.vmap(
            lambda kk, lg: _sample_tokens(kk, lg, k, temp, fgq, False, True),
            in_axes=(0, 1), out_axes=1,
        )(keys, logits_pre)  # (1, P, q)
        # mask out padded forced columns (beyond n_forced) as head tokens
        col = jnp.arange(P)[None, :, None]
        pre_tokens = jnp.where(col < n_forced, pre_tokens, 1)
        last = jax.lax.dynamic_index_in_dim(
            pre_tokens, n_forced - 1, axis=1, keepdims=False)  # (1, q)
        y_next = model.apply(params, last.T[:, :, None],
                             method=LinaModel.embed_tokens)[:, 0]  # (1, d)
        # state reflects only the first n_forced positions? prefill ran all
        # P; padded columns would pollute the state, so P must equal
        # n_forced (the host pads per-request programs, not columns).
        return x_enc, state, y_next, pre_tokens

    def _insert_impl(self, batch_state, one_state, x_enc_b, x_enc1, ca_b,
                     ca1, y_b, y1, t_b, t1, slot):
        B = self.n_slots

        def put(bl, ol):
            ax = _batch_axis(bl.shape, ol.shape, B)
            return jax.lax.dynamic_update_index_in_dim(
                bl, jnp.squeeze(ol, axis=ax).astype(bl.dtype), slot, axis=ax)

        new_state = jax.tree_util.tree_map(put, batch_state, one_state)
        x_enc_b = jax.lax.dynamic_update_index_in_dim(
            x_enc_b, x_enc1[0].astype(x_enc_b.dtype), slot, axis=0)
        ca_b = jax.lax.dynamic_update_index_in_dim(ca_b, ca1[0], slot, axis=0)
        y_b = jax.lax.dynamic_update_index_in_dim(
            y_b, y1[0].astype(y_b.dtype), slot, axis=0)
        t_b = jax.lax.dynamic_update_index_in_dim(t_b, t1, slot, axis=0)
        return new_state, x_enc_b, ca_b, y_b, t_b

    def _decode_chunk_impl(self, params, state, y_embd, x_enc, ca_mask, t,
                           key):
        model = self.model
        k, temp, fgq = self.sample_args

        def step(carry, kk):
            state, y_embd, t = carry
            lp = self._loop_params()
            logits, _, state = model.apply(
                lp, y_embd, x_enc, state, time_step=t,
                crossatt_mask=ca_mask, method=LinaModel.decode_step,
            )
            toks = _sample_tokens(kk, logits, k, temp, fgq, False, True)
            y_embd = model.apply(lp, toks.T[:, :, None],
                                 method=LinaModel.embed_tokens)[:, 0]
            return (state, y_embd, t + 1), toks

        keys = jax.random.split(key, self.chunk)
        (state, y_embd, t), toks = jax.lax.scan(
            step, (state, y_embd, t), keys)
        return state, y_embd, t, toks  # toks: (chunk, B, q)

    # ------------------------------------------------------------ host API
    def submit(self, text_ids, prompt=None, max_len: int = 400) -> int:
        """Queue a request. ``text_ids``: (m,) BPE ids (m <= max_text_len);
        ``prompt``: optional (q, p) raw codec codes for voice cloning."""
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append((rid, np.asarray(text_ids), prompt, max_len))
        return rid

    def _refill(self):
        # keep filling until no free slot or the queue drains — a request
        # that completes AT prefill (stop in the prompt predictions, or
        # max_len <= n_forced) frees its slot immediately and the next
        # queued request must take it in the same pass
        while self._queue:
            slot_idx = next((i for i, s in enumerate(self._slots)
                             if s.rid is None), None)
            if slot_idx is None:
                return
            rid, text, prompt, max_len = self._queue.popleft()
            self._fill_slot(slot_idx, rid, text, prompt, max_len)

    def _fill_slot(self, slot_idx, rid, text, prompt, max_len):
        slot = self._slots[slot_idx]
        m = self.max_text_len
        mlen = len(text)
        if mlen > m:
            raise ValueError(f"text length {mlen} > max_text_len {m}")
        x = jnp.zeros((1, m), jnp.int32).at[0, :mlen].set(text)
        valid = jnp.arange(m) < mlen
        eye = jnp.eye(m, dtype=bool)
        enc_mask = (valid[None, :, None] & valid[None, None, :]) | eye
        ca1 = valid[None, None, :]  # (1, 1, m)
        nq = self.model.n_quant
        if prompt is not None:
            p = np.asarray(prompt)
            codes = np.concatenate(
                [np.ones((nq, 1, 1), np.int32),
                 p[:, None, :].astype(np.int32)
                 + self.model.n_special_token_in], axis=2)
        else:
            codes = np.ones((nq, 1, 1), np.int32)
        n_forced = codes.shape[2]
        self.key, sub = jax.random.split(self.key)
        x_enc1, st1, y1, pre = self._prefill_one(
            self.params, x, enc_mask, ca1, jnp.asarray(codes),
            jnp.asarray(n_forced), sub)
        (self._state, self._x_enc, self._ca_mask, self._y_embd,
         self._t) = self._insert(
            self._state, st1, self._x_enc, x_enc1, self._ca_mask, ca1,
            self._y_embd, y1, self._t, jnp.asarray(n_forced, jnp.int32),
            slot_idx)
        slot.rid = rid
        slot.t = n_forced
        slot.max_len = max_len
        slot.tokens = [np.asarray(pre[0, i]) for i in range(n_forced)]
        self._maybe_finish(slot_idx)

    def _maybe_finish(self, slot_idx: int):
        slot = self._slots[slot_idx]
        if slot.rid is None:
            return
        stop_at = None
        for i, row in enumerate(slot.tokens):
            if (row == STOP_ID).all():
                stop_at = i
                break
        if stop_at is not None or len(slot.tokens) >= slot.max_len:
            length = (stop_at + 1) if stop_at is not None else slot.max_len
            self._done.append(Completion(
                rid=slot.rid,
                tokens=np.stack(slot.tokens[:length]),
                length=length,
                stopped=stop_at is not None,
            ))
            self._slots[slot_idx] = _Slot()

    @property
    def active(self) -> int:
        return sum(1 for s in self._slots if s.rid is not None)

    def run(self, max_chunks: Optional[int] = None) -> List[Completion]:
        """Drain queue + slots; returns completions in finish order."""
        chunks = 0
        self._refill()
        while self.active and (max_chunks is None or chunks < max_chunks):
            self.key, sub = jax.random.split(self.key)
            (self._state, self._y_embd, self._t, toks) = self._decode_chunk(
                self.params, self._state, self._y_embd, self._x_enc,
                self._ca_mask, self._t, sub)
            toks_np = np.asarray(toks)  # (chunk, B, q)
            for slot_idx, slot in enumerate(self._slots):
                if slot.rid is None:
                    continue
                for j in range(self.chunk):
                    if len(slot.tokens) < slot.max_len:
                        slot.tokens.append(toks_np[j, slot_idx])
                self._maybe_finish(slot_idx)
            self._refill()
            chunks += 1
        out, self._done = self._done, []
        return out
