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

``lazy=True`` decodes each chunk as a lazy micro-chunk window
(``generate_batch(lazy_window=chunk)``'s machinery): base recurrent
states are read-only across the chunk, one fold lands the buffered
rank-L update per chunk — the record b64 decode path, serving-side.
``state_quant="int8"|"int4"`` additionally row-quantizes the base
states (requires lazy). Greedy lazy serving equals per-request
``generate_batch(lazy_window=chunk, state_quant=...)`` exactly,
including recycled slots (insertion happens post-fold, which is the
same condition as generate's post-prefill ``add_lazy_buffers``).

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


def _batch_axis(b_shape, o_shape, n_slots, one: int = 1):
    """Axis where the batched leaf has ``n_slots`` and the request leaf
    has ``one`` (everything else equal; ``one=2`` under CFG — a request
    carries a conditional and an unconditional row)."""
    for i, (bs, os) in enumerate(zip(b_shape, o_shape)):
        if bs == n_slots and os == one and \
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
        quant_exclude=None,
        approx_topk: bool = False,
        int8_prefill_full_precision: bool = True,
        mesh=None,
        cfg_coef: Optional[float] = None,
        lazy: bool = False,
        state_quant: Optional[str] = None,
    ):
        self.model = model
        self.n_slots = n_slots
        # Lazy micro-chunk decode (generate.py lazy_window, same machinery):
        # the serving chunk IS the lazy window — base states are read-only
        # across the chunk's steps (the loop carries only the small window
        # buffers) and one fold lands the rank-L update afterwards. Slot
        # insertion happens only at chunk boundaries (post-fold, buffers
        # stale-but-masked), so each slot's math is identical to its own
        # generate_batch(lazy_window=chunk) run — exactness is tested.
        # WINS at high occupancy (b64: state-traffic-bound, BASELINE.md);
        # classic per-token decode stays the default for small slot counts.
        # ``state_quant="int8"|"int4"`` additionally row-quantizes the
        # base states (requires lazy; the lossy aggregate-record knob).
        self._lazy = lazy
        self._state_quant = state_quant
        if state_quant is not None and not lazy:
            raise ValueError("state_quant requires lazy=True (it rides the "
                             "lazy base-state layout)")
        # Mirror generate_batch's state_quant prefill policy: the prefill
        # kernels EMIT their final states in f32 and cast to the state
        # dtype outside the kernel (in-kernel bf16 emission measured ~13%
        # slower end-to-end — see generate.py; numerics identical, so the
        # server==generate_batch exactness contract holds either way).
        # Server prefill batches are per-request (tiny), so no live-set
        # budget gate is needed here (generate_batch gates by batch).
        from lina_speech_tpu.models.gla_layer import GLAState

        _st0 = jax.eval_shape(lambda: model.empty_state(1))
        self._sf_emit_dtype = (
            jnp.float32 if state_quant is not None
            and all(isinstance(l, GLAState) for l in _st0.layers) else None)
        # Classifier-free guidance (generate.py cfg_coef, same math): the
        # device batch doubles — rows [0:B] conditional, [B:2B] the same
        # slots against the all-mask text; every step samples from
        # l_uncond + cfg_coef * (l_cond - l_uncond).
        self._cfg = cfg_coef
        if cfg_coef is not None and model.mask_text_p <= 0.0:
            raise ValueError("cfg_coef requires a model trained with "
                             "mask_text_p > 0 (no mask token otherwise)")
        self._B2 = 2 * n_slots if cfg_coef is not None else n_slots
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
            self._dev_params = quantize_dense_params(
                params, min_size=quant_min_size, exclude=quant_exclude)
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
        def _with_buffers(st):
            if not self._lazy:
                return st
            from lina_speech_tpu.models.attentive_rnn import add_lazy_buffers

            return add_lazy_buffers(st, self.chunk, dtype=cdt,
                                    state_quant=self._state_quant)

        self._with_buffers = _with_buffers
        one = jax.eval_shape(lambda: _with_buffers(model.empty_state(1)))
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
        B2 = self._B2
        self._x_enc = jnp.zeros((B2, m, d), cdt)
        self._ca_mask = jnp.zeros((B2, 1, m), bool)
        self._y_embd = jnp.zeros((B2, d), cdt)
        self._t = jnp.zeros((B2,), jnp.int32)

        # Container dtypes must match what PREFILL produces, not
        # empty_state's f32 default: ``_insert`` casts incoming request
        # rows to the container's dtypes, so an f32 container silently
        # upcasts every bf16 recurrent state / conv ring (2x decode-state
        # HBM traffic for bf16 configs) and crashes lazy mode (bf16 window
        # buffers vs f32-promoted conv projections). eval_shape of one
        # prefill chunk gives the leaf-exact dtypes without running it.
        def _prefill_state_tmpl(p, emb, xe, msk):
            _, _, st = model.apply(p, emb, xe, model.empty_state(1),
                                   crossatt_mask=msk,
                                   sf_emit_dtype=self._sf_emit_dtype,
                                   method=LinaModel.prefill)
            return _with_buffers(st)

        tmpl = jax.eval_shape(
            _prefill_state_tmpl, self._pre_params,
            jax.ShapeDtypeStruct((1, 1, d), cdt),
            jax.ShapeDtypeStruct((1, m, d), cdt),
            jax.ShapeDtypeStruct((1, 1, m), jnp.bool_))
        batch_tmpl = jax.eval_shape(
            lambda: _with_buffers(model.empty_state(B2)))
        # one jitted program (not leaf-by-leaf eager zeros: each eager op
        # is a remote dispatch on the axon tunnel)
        self._state = jax.jit(lambda: jax.tree_util.tree_map(
            lambda bl, tl: jnp.zeros(bl.shape, tl.dtype),
            batch_tmpl, tmpl))()

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
            if self._B2 % dp != 0:
                raise ValueError(f"device batch {self._B2} not divisible "
                                 f"by dp={dp}")
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
                                                  o_leaf.shape, self._B2)
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

    def _guide(self, logits):
        """(2B, ...) -> (B, ...) CFG-guided logits; identity without CFG."""
        if self._cfg is None:
            return logits
        half = logits.shape[0] // 2
        lc, lu = logits[:half], logits[half:]
        return (lu + self._cfg * (lc - lu)).astype(logits.dtype)

    def _prefill_chunk_impl(self, dev_params, x_enc, ca_mask, codes_chunk,
                            time_offset, key, conv_history, state):
        """One power-of-two prefill chunk for one request (batch g=1, or
        g=2 under CFG: conditional + all-mask rows sharing the forced
        codes). ``codes_chunk``: (q, g, c); ``state`` threads between
        chunks (``conv_history`` consumes its conv rings mid-stream).
        Returns (tokens (1, c, q), new_state (g rows))."""
        model = self.model
        params = dev_params
        emb = model.apply(params, codes_chunk,
                          method=LinaModel.embed_tokens)  # (g, c, d)
        g, c = emb.shape[:2]
        pf_mask = jnp.broadcast_to(ca_mask, (g, c, ca_mask.shape[-1]))
        pv = ca_mask[:, 0] if self._pos_needs_valid else None  # (g, m)
        logits, _, state = model.apply(
            params, emb, x_enc, state, crossatt_mask=pf_mask,
            conv_history=conv_history, time_offset=time_offset,
            crossatt_pos_valid=pv, sf_emit_dtype=self._sf_emit_dtype,
            method=LinaModel.prefill,
        )  # (g, c, q, l)
        logits = self._guide(logits)  # (1, c, q, l)
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
                     ca1, y_b, y1, t_b, t1, slots):
        """Insert a request's g rows (g=1; g=2 under CFG) at the g target
        indices in ``slots`` — every "one" arg has leading/g-sized batch."""
        B2 = self._B2
        g = x_enc1.shape[0]
        # lazy mode: give the fresh rows their (zeroed) window buffers /
        # quantized base-state layout so the trees match leaf-for-leaf;
        # insertion happens at chunk boundaries (post-fold), which is
        # exactly generate_batch's post-prefill add_lazy_buffers condition
        one_state = self._with_buffers(one_state)

        def put(bl, ol):
            ax = _batch_axis(bl.shape, ol.shape, B2, one=g)
            out = bl
            for j in range(g):
                row = jax.lax.dynamic_slice_in_dim(ol, j, 1, axis=ax)
                out = jax.lax.dynamic_update_index_in_dim(
                    out, jnp.squeeze(row, axis=ax).astype(bl.dtype),
                    slots[j], axis=ax)
            return out

        new_state = jax.tree_util.tree_map(put, batch_state, one_state)
        for j in range(g):
            x_enc_b = jax.lax.dynamic_update_index_in_dim(
                x_enc_b, x_enc1[j].astype(x_enc_b.dtype), slots[j], axis=0)
            ca_b = jax.lax.dynamic_update_index_in_dim(ca_b, ca1[j],
                                                       slots[j], axis=0)
            y_b = jax.lax.dynamic_update_index_in_dim(
                y_b, y1[j].astype(y_b.dtype), slots[j], axis=0)
            t_b = jax.lax.dynamic_update_index_in_dim(t_b, t1, slots[j],
                                                      axis=0)
        return new_state, x_enc_b, ca_b, y_b, t_b

    def _decode_chunk_impl(self, dev_params, state, y_embd, x_enc, ca_mask,
                           t, key):
        model = self.model
        k, temp, fgq, approx = self.sample_args
        # dev_params is a jit ARGUMENT (not a closure constant): in int8
        # mode XLA streams the int8 leaves each step, nothing constant-folds
        lp = dev_params

        pv = ca_mask[:, 0] if self._pos_needs_valid else None  # (B2, m)
        tile = (lambda z: jnp.concatenate([z, z], axis=0)) \
            if self._cfg is not None else (lambda z: z)

        def step(carry, xs):
            kk, j = xs
            state, y_embd, t = carry
            logits, _, state = model.apply(
                lp, y_embd, x_enc, state, time_step=t,
                lazy_p=(j if self._lazy else None),
                crossatt_mask=ca_mask, crossatt_pos_valid=pv,
                method=LinaModel.decode_step,
            )
            toks = _sample_tokens(kk, self._guide(logits), k, temp, fgq,
                                  False, approx)  # (B, q)
            y_embd = tile(model.apply(lp, toks.T[:, :, None],
                                      method=LinaModel.embed_tokens)[:, 0])
            return (state, y_embd, t + 1), toks

        keys = jax.random.split(key, self.chunk)
        (state, y_embd, t), toks = jax.lax.scan(
            step, (state, y_embd, t), (keys, jnp.arange(self.chunk)))
        if self._lazy:
            from lina_speech_tpu.models.attentive_rnn import fold_lazy_state

            # one unconditional fold per chunk: the buffered rank-L window
            # lands in the base states; buffers stay stale (masked by the
            # next chunk's lazy_p, rewritten before its fold reads them)
            state = fold_lazy_state(state)
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
        g = 2 if self._cfg is not None else 1
        x = jnp.zeros((g, m), jnp.int32).at[0, :mlen].set(text)
        if g == 2:
            # unconditional row: the mask token at every valid position
            # (generate.py CFG uses full_like(x, mask) on unpadded text)
            x = x.at[1, :mlen].set(self.model.n_txt_vocab - 1)
        valid = jnp.arange(m) < mlen
        eye = jnp.eye(m, dtype=bool)
        enc_mask = jnp.broadcast_to(
            (valid[None, :, None] & valid[None, None, :]) | eye, (g, m, m))
        ca1 = jnp.broadcast_to(valid[None, None, :], (g, 1, m))  # (g, 1, m)
        nq = self.model.n_quant
        if prompt is not None:
            p = np.asarray(prompt)
            codes = np.concatenate(
                [np.ones((nq, 1, 1), np.int32),
                 p[:, None, :].astype(np.int32)
                 + self.model.n_special_token_in], axis=2)
        else:
            codes = np.ones((nq, 1, 1), np.int32)
        codes = np.broadcast_to(codes, (nq, g, codes.shape[2]))
        n_forced = codes.shape[2]

        x_enc1 = self._encode_text(self._pre_params, x, enc_mask)
        # binary-decomposed prefill: descending pow2 chunks, state threaded
        st1 = self.model.empty_state(g)
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
        if g == 2:
            y1 = jnp.concatenate([y1, y1], axis=0)
        targets = [slot_idx] if g == 1 else [slot_idx,
                                             self.n_slots + slot_idx]
        (self._state, self._x_enc, self._ca_mask, self._y_embd,
         self._t) = self._insert(
            self._state, st1, self._x_enc, x_enc1, self._ca_mask, ca1,
            self._y_embd, y1, self._t, jnp.asarray(n_forced, jnp.int32),
            jnp.asarray(targets, jnp.int32))
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
