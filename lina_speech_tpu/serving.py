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
inferred per leaf: conv rings are (w, b, dim), recurrent states (b, h, ...)).

Compiled-program budget is BOUNDED for mixed prompt lengths: a
voice-clone prompt of any length prefills as its BINARY DECOMPOSITION
into descending power-of-two chunks (13 -> 8+4+1), each chunk threading
the backbone state (recurrent + conv rings via ``conv_history``, rotary
positions via ``time_offset``) — numerically the same recurrence, so at
most log2(max prompt)+1 prefill programs ever compile, instead of one
per distinct length. Plus one decode-chunk program, one text-encode
program and one embed program.

Greedy decoding (k=1) matches :func:`generate.generate_batch` on the
same request (tests/test_serving.py; chunked prefill is exact up to fp
summation order). Padding exactness: sinusoidal positions are
padding-invariant; for ``pos_type="convolutional"`` (the flagship's
ConvPos, whose non-causal 31-tap smoothing would otherwise see learned
embeddings past the text tail) the server threads the per-slot valid
length as ``crossatt_pos_valid`` so the padded batch reproduces each
request's unpadded run exactly (tested for both pos types).

``mesh=`` shards the slot batch over the mesh's "dp" axis: the chunked
decode loop runs dp-parallel across chips, each owning n_slots/dp slots
(params may additionally be tp-sharded by the caller via
``parallel.shard_params``) — continuous batching scaled out the TPU way.

``weight_quant="int8"`` runs the decode loop on the quantized tree (a
traced argument — QDense streams the int8 Dense kernels from HBM, the b1
bandwidth win; nothing is baked into the executable as a constant) while
prefill/text-encode default to full precision, matching generate_batch's
int8 contract exactly; ``int8_prefill_full_precision=False`` keeps only
the quantized tree resident (~2x less HBM) at the cost of slightly
different prefill numerics vs generate_batch.
"""
from __future__ import annotations

import dataclasses
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


def _pow2_chunks(n: int) -> List[int]:
    """Binary decomposition of ``n`` into descending powers of two."""
    out, bit = [], 1 << (n.bit_length() - 1)
    while n:
        if n >= bit:
            out.append(bit)
            n -= bit
        bit >>= 1
    return out


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
        quant_min_size: int = 1 << 16,
        approx_topk: bool = False,
        int8_prefill_full_precision: bool = True,
        mesh=None,
    ):
        self.model = model
        self.n_slots = n_slots
        self.max_text_len = max_text_len
        self.chunk = chunk
        self.sample_args = (k, temp, first_greedy_quant, approx_topk)
        self.key = jax.random.PRNGKey(seed)
        self._next_rid = 0
        self._queue: deque = deque()
        self._slots = [_Slot() for _ in range(n_slots)]
        self._done: List[Completion] = []
        # distinct prefill chunk lengths compiled so far (observability for
        # the bounded-compile contract; tests assert on it)
        self.prefill_chunk_sizes: set = set()

        cdt = model.dtype
        if cdt != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(cdt)
                if (hasattr(p, "dtype") and p.dtype == jnp.float32) else p,
                params,
            )
        if weight_quant == "int8":
            from lina_speech_tpu.utils.quantize import quantize_dense_params

            # The quantized tree serves the DECODE loop (Dense kernels carry
            # their {int8_q, int8_s} pairs; QDense streams int8 from HBM —
            # the b1 bandwidth win). Prefill/text-encode default to a
            # full-precision copy so int8 serving matches generate_batch's
            # int8 contract exactly (generate.py quantizes the token loop
            # only); pass int8_prefill_full_precision=False to keep ONLY
            # the quantized tree resident (~2x less HBM, prefill numerics
            # then differ slightly from generate_batch's).
            self._dev_params = quantize_dense_params(params, min_size=quant_min_size)
            self._pre_params = params if int8_prefill_full_precision \
                else self._dev_params
            del params
        elif weight_quant is not None:
            raise ValueError(f"unknown weight_quant {weight_quant!r}")
        else:
            self._dev_params = params
            self._pre_params = params

        d = model.d_model
        m = max_text_len
        B = n_slots
        # shapes only — eval_shape avoids eager device allocations (each is
        # a remote dispatch over the axon tunnel); also reused by the mesh
        # branch below for per-leaf batch-axis inference
        one = jax.eval_shape(lambda: model.empty_state(1))
        for leaf in jax.tree_util.tree_leaves(one):
            if getattr(leaf, "ndim", 1) == 0:
                # TransformerState's KV clock is one scalar per layer —
                # batch-shared, so slots at different progress cannot share
                # a decode batch. The recurrent families (GLA/RWKV6/Mamba)
                # keep all per-slot state batched and serve fine.
                raise ValueError(
                    "DecodeServer requires per-slot state; this backbone "
                    "keeps a batch-shared scalar in its state (transformer "
                    "KV-cache clock) and cannot mix slot progress")
        self._x_enc = jnp.zeros((B, m, d), cdt)
        self._ca_mask = jnp.zeros((B, 1, m), bool)
        self._y_embd = jnp.zeros((B, d), cdt)
        self._t = jnp.zeros((B,), jnp.int32)
        self._state = model.empty_state(B)

        # Multi-chip serving: shard the SLOT BATCH over the mesh's "dp"
        # axis — the chunked decode loop then runs dp-parallel across
        # chips (each chip owns n_slots/dp slots; per-request prefill
        # stays replicated at b=1 and _insert's dynamic_update lands on
        # the owning shard). Params may additionally be tp-sharded by the
        # caller (parallel.shard_params); anything unsharded replicates.
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape["dp"]
            if n_slots % dp != 0:
                raise ValueError(f"n_slots {n_slots} not divisible by "
                                 f"dp={dp}")
            batched = NamedSharding(mesh, P("dp"))
            self._x_enc = jax.device_put(self._x_enc, batched)
            self._ca_mask = jax.device_put(self._ca_mask, batched)
            self._y_embd = jax.device_put(self._y_embd, batched)
            self._t = jax.device_put(self._t, batched)
            self._state = jax.tree_util.tree_map(
                lambda b_leaf, o_leaf: jax.device_put(
                    b_leaf,
                    NamedSharding(mesh, P(*(
                        ("dp" if i == _batch_axis(b_leaf.shape,
                                                  o_leaf.shape, B)
                         else None)
                        for i in range(b_leaf.ndim))))),
                self._state, one)

        # ConvPos (non-causal 31-tap positional conv) must be told the
        # valid text length so the padded batch matches each request's
        # unpadded generate_batch run exactly (models/crossatt.py ConvPos)
        self._pos_needs_valid = (
            getattr(model.attentive_rnn, "blind", False)
            and getattr(model.attentive_rnn, "pos_type", "") == "convolutional")

        self._encode_text = jax.jit(self._encode_text_impl)
        self._prefill_chunk = jax.jit(self._prefill_chunk_impl,
                                      static_argnames=("conv_history",))
        self._embed_one = jax.jit(self._embed_one_impl)
        self._decode_chunk = jax.jit(self._decode_chunk_impl)
        self._insert = jax.jit(self._insert_impl)

    # ------------------------------------------------------------ jitted
    def _encode_text_impl(self, dev_params, x, enc_mask):
        return self.model.apply(dev_params, x, enc_mask,
                                method=LinaModel.encode_text)

    def _prefill_chunk_impl(self, dev_params, x_enc, ca_mask, codes_chunk,
                            time_offset, key, conv_history, state):
        """One power-of-two prefill chunk (b=1). ``codes_chunk``: (q, 1, c)
        forced codes; ``state`` threads between chunks (``conv_history``
        consumes its conv rings mid-stream). Returns (tokens (1, c, q),
        new_state)."""
        model = self.model
        params = dev_params
        emb = model.apply(params, codes_chunk,
                          method=LinaModel.embed_tokens)  # (1, c, d)
        c = emb.shape[1]
        pf_mask = jnp.broadcast_to(ca_mask, (1, c, ca_mask.shape[-1]))
        pv = ca_mask[:, 0] if self._pos_needs_valid else None  # (1, m)
        logits, _, state = model.apply(
            params, emb, x_enc, state, crossatt_mask=pf_mask,
            conv_history=conv_history, time_offset=time_offset,
            crossatt_pos_valid=pv,
            method=LinaModel.prefill,
        )  # (1, c, q, l)
        k, temp, fgq, approx = self.sample_args
        keys = jax.random.split(key, c)
        tokens = jax.vmap(
            lambda kk, lg: _sample_tokens(kk, lg, k, temp, fgq, False, approx),
            in_axes=(0, 1), out_axes=1,
        )(keys, logits)  # (1, c, q)
        return tokens, state

    def _embed_one_impl(self, dev_params, toks):
        """toks: (1, q) -> (1, d) next-step input embedding."""
        return self.model.apply(dev_params, toks.T[:, :, None],
                                method=LinaModel.embed_tokens)[:, 0]

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

    def _decode_chunk_impl(self, dev_params, state, y_embd, x_enc, ca_mask,
                           t, key):
        model = self.model
        k, temp, fgq, approx = self.sample_args
        # dev_params is a jit ARGUMENT (not a closure constant): in int8
        # mode XLA streams the int8 leaves each step, nothing constant-folds
        lp = dev_params

        pv = ca_mask[:, 0] if self._pos_needs_valid else None  # (B, m)

        def step(carry, kk):
            state, y_embd, t = carry
            logits, _, state = model.apply(
                lp, y_embd, x_enc, state, time_step=t,
                crossatt_mask=ca_mask, crossatt_pos_valid=pv,
                method=LinaModel.decode_step,
            )
            toks = _sample_tokens(kk, logits, k, temp, fgq, False, approx)
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

        x_enc1 = self._encode_text(self._pre_params, x, enc_mask)
        # binary-decomposed prefill: descending pow2 chunks, state threaded
        st1 = self.model.empty_state(1)
        pre_rows: List[np.ndarray] = []
        off = 0
        for c in _pow2_chunks(n_forced):
            self.key, sub = jax.random.split(self.key)
            self.prefill_chunk_sizes.add(c)
            toks, st1 = self._prefill_chunk(
                self._pre_params, x_enc1, ca1,
                jnp.asarray(codes[:, :, off:off + c]),
                jnp.asarray(off, jnp.int32), sub,
                conv_history=(off > 0), state=st1)
            toks_np = np.asarray(toks[0])  # (c, q)
            pre_rows.extend(toks_np[i] for i in range(c))
            off += c
        y1 = self._embed_one(self._pre_params,
                             jnp.asarray(pre_rows[-1])[None, :])

        (self._state, self._x_enc, self._ca_mask, self._y_embd,
         self._t) = self._insert(
            self._state, st1, self._x_enc, x_enc1, self._ca_mask, ca1,
            self._y_embd, y1, self._t, jnp.asarray(n_forced, jnp.int32),
            slot_idx)
        slot.rid = rid
        slot.t = n_forced
        slot.max_len = max_len
        slot.tokens = pre_rows
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

    def partials(self) -> Dict[int, np.ndarray]:
        """Tokens produced so far per ACTIVE request: {rid: (steps, q)}.
        Streaming consumers poll this between ``run(max_chunks=1)`` calls."""
        return {s.rid: np.stack(s.tokens) for s in self._slots
                if s.rid is not None and s.tokens}

    def run(self, max_chunks: Optional[int] = None) -> List[Completion]:
        """Drain queue + slots; returns completions in finish order."""
        chunks = 0
        self._refill()
        while self.active and (max_chunks is None or chunks < max_chunks):
            self.key, sub = jax.random.split(self.key)
            (self._state, self._y_embd, self._t, toks) = self._decode_chunk(
                self._dev_params, self._state, self._y_embd, self._x_enc,
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
