"""Gated linear attention (GLA) scan ops — pure-XLA implementations.

Recurrence per head (state ``S`` of shape (d_k, d_v), log-gates ``gk`` <= 0):

    S_t = diag(exp(gk_t)) @ S_{t-1} + k_t^T v_t
    o_t = (scale * q_t) @ S_t

This is the contract of the reference's Triton kernels
``fused_chunk_gla / chunk_gla / fused_recurrent_gla`` (reference
model/gla.py:187-201; kernels from flash-linear-attention, not in tree).
Like those kernels, queries are scaled by ``d_k**-0.5`` by default.

Three implementations:

- :func:`gla_scan_ref` — O(T) ``lax.scan``; the correctness oracle (mirrors
  fla ``naive_recurrent_gla``) and the building block for decode.
- :func:`gla_chunk` — chunked-parallel form for training. Two-level
  chunking: fp32 state carried across chunks of size ``chunk_size`` via a
  ``lax.scan``; inside a chunk, sub-chunks of 16 combine through
  *non-positive-exponent* factorizations only (all ``exp`` arguments are
  <= 0), so it is stable even under hard resets (gate == -20 at packed
  sequence boundaries). Fully differentiable by autodiff, including w.r.t.
  ``initial_state`` (required by initial-state tuning,
  reference initial_state.py:85-160).
- :func:`gla_decode_step` — one token, fused update+readout, used inside the
  jitted generation loop.

A Pallas TPU kernel with a custom VJP lives in ``gla_pallas.py``; this module
is the fallback path (CPU tests, interpret mode) and the numerics reference.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


Array = jnp.ndarray


def _default_scale(q: Array, scale: Optional[float]) -> float:
    return q.shape[-1] ** -0.5 if scale is None else scale


def gla_scan_ref(
    q: Array,
    k: Array,
    v: Array,
    gk: Array,
    initial_state: Optional[Array] = None,
    scale: Optional[float] = None,
) -> Tuple[Array, Array]:
    """Naive O(T) recurrent GLA via ``lax.scan`` (fp32 state).

    Args:
        q, k, gk: (b, h, t, d_k); v: (b, h, t, d_v). gk are log-gates (<= 0).
        initial_state: optional (b, h, d_k, d_v) fp32.

    Returns:
        o: (b, h, t, d_v) in q's dtype; final_state: (b, h, d_k, d_v) fp32.
    """
    scale = _default_scale(q, scale)
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dk, dv), dtype=jnp.float32)
    initial_state = initial_state.astype(jnp.float32)

    qf, kf, vf, gf = (x.astype(jnp.float32) for x in (q, k, v, gk))

    def step(S, inp):
        q_t, k_t, v_t, g_t = inp  # (b, h, dk) / (b, h, dv)
        S = jnp.exp(g_t)[..., None] * S + k_t[..., None] * v_t[..., None, :]
        o_t = jnp.einsum("bhk,bhkv->bhv", q_t * scale, S)
        return S, o_t

    xs = tuple(jnp.moveaxis(x, 2, 0) for x in (qf, kf, vf, gf))
    final_state, o = jax.lax.scan(step, initial_state, xs)
    o = jnp.moveaxis(o, 0, 2)
    return o.astype(q.dtype), final_state.astype(state_dtype)


def gla_decode_step(
    q: Array,
    k: Array,
    v: Array,
    gk: Array,
    state: Array,
    scale: Optional[float] = None,
) -> Tuple[Array, Array]:
    """One AR token: update state and read out (reference fused_recurrent mode).

    Args:
        q, k, gk: (b, h, d_k); v: (b, h, d_v); state: (b, h, d_k, d_v) fp32.

    Returns:
        o: (b, h, d_v); new_state: (b, h, d_k, d_v) fp32.
    """
    scale = _default_scale(q, scale)
    out_dtype = state.dtype  # bf16 state storage supported; math in fp32
    qf, kf, vf, gf = (x.astype(jnp.float32) for x in (q, k, v, gk))
    eg = jnp.exp(gf)
    new_state = (eg[..., None] * state.astype(jnp.float32)
                 + kf[..., None] * vf[..., None, :])
    # readout from the PRE-update state: o = q·S' = (q·eg)·S + (q·k) v
    # exactly (distribute over the update) — the state, the dominant HBM
    # object at decode, is read once here and once by the update instead
    # of re-reading the materialized S' (b1 profile: the while body's
    # fusion stream is state-traffic-bound).
    o = (jnp.einsum("bhk,bhkv->bhv", qf * scale * eg,
                    state.astype(jnp.float32))
         + jnp.sum(qf * scale * kf, axis=-1, keepdims=True) * vf)
    return o.astype(q.dtype), new_state.astype(out_dtype)


def gla_decode_lazy_step(
    q: Array,
    k: Array,
    v: Array,
    gk: Array,
    s_base: Array,
    kbuf: Array,
    vbuf: Array,
    cbuf: Array,
    cc: Array,
    p: Array,
    scale: Optional[float] = None,
) -> Tuple[Array, Array, Array, Array, Array]:
    """Lazy-decay micro-chunk decode step: READ-ONLY base state.

    Decode at large batch is bound by recurrent-state HBM traffic; the
    classic step reads AND writes the (b, h, dk, dv) state every token.
    Here the state is only read (for the inter-window readout), the last
    ``p + 1`` tokens of the current window live in small (L, ...) buffers,
    and :func:`gla_decode_lazy_fold` folds them into the state once per L
    tokens — the exact chunked-scan math (ops/gla.py:gla_chunk inter
    update) applied incrementally, so the recurrence is unchanged.

    Args:
        q, k, gk: (b, h, dk); v: (b, h, dv).
        s_base: (b, h, dk, dv) state as of the last fold (NOT updated here).
        kbuf: (L, b, h, dk); vbuf: (L, b, h, dv) window token buffers.
        cbuf: (L, b, h, dk) fp32 gate cumsums at each buffered token.
        cc: (b, h, dk) fp32 gate cumsum since the last fold.
        p: () int32 position in the window (0-based).

    Returns (o, kbuf, vbuf, cbuf, cc) with the current token appended at
    ``p``. Every exp argument is <= 0: cc is non-increasing, and for
    buffered positions j <= p, cc <= cbuf[j].
    """
    scale = _default_scale(q, scale)
    L = kbuf.shape[0]
    qf, kf, vf, gf = (x.astype(jnp.float32) for x in (q, k, v, gk))
    cc = cc + gf
    kbuf = jax.lax.dynamic_update_index_in_dim(kbuf, k, p, axis=0)
    vbuf = jax.lax.dynamic_update_index_in_dim(vbuf, v, p, axis=0)
    cbuf = jax.lax.dynamic_update_index_in_dim(
        cbuf, cc.astype(cbuf.dtype), p, axis=0)

    o = jnp.einsum("bhk,bhkv->bhv", qf * scale * jnp.exp(cc),
                   s_base.astype(jnp.float32))
    # intra-window corrections: j <= p only (stale slots masked; clamp keeps
    # their exp args <= 0 regardless of stale cbuf contents)
    live = (jnp.arange(L) <= p).astype(jnp.float32)[:, None, None, None]
    w = jnp.exp(jnp.minimum(cc[None] - cbuf.astype(jnp.float32), 0.0)) * live
    a = jnp.einsum("bhk,lbhk->lbh", qf * scale,
                   kbuf.astype(jnp.float32) * w)
    o = o + jnp.einsum("lbh,lbhv->bhv", a, vbuf.astype(jnp.float32))
    return o.astype(q.dtype), kbuf, vbuf, cbuf, cc


def gla_decode_lazy_fold(
    s_base: Array,
    kbuf: Array,
    vbuf: Array,
    cbuf: Array,
    cc: Array,
) -> Array:
    """Fold a full window of buffered tokens into the base state
    (one state read+write per L tokens): S = exp(cc) * S + sum_j
    (k_j * exp(cc - c_j))^T v_j — the chunk-scan state update.

    Returns the new state only. Buffers deliberately stay STALE (the
    caller resets ``cc`` to zero; :func:`gla_decode_lazy_step` masks
    slots ``j > p``, and every slot is rewritten before the next fold) —
    zeroing them would cost 5 MB/layer-fold of pointless HBM writes.
    This function must only be called on a FULL window (p == L-1)."""
    out_dtype = s_base.dtype
    dec = jnp.exp(jnp.minimum(cc[None] - cbuf.astype(jnp.float32), 0.0))
    s = jnp.exp(cc)[..., None] * s_base.astype(jnp.float32) + jnp.einsum(
        "lbhk,lbhv->bhkv", kbuf.astype(jnp.float32) * dec,
        vbuf.astype(jnp.float32))
    return s.astype(out_dtype)


def quantize_state_rows(s: Array) -> Tuple[Array, Array]:
    """Symmetric int8 per-(b, h, dk)-row quantization of a recurrent state.

    b64 lazy decode is HBM-bound on the read-only state (measured 647 GB/s
    achievable pure-read on v5e — scripts/bench_lazy_kernel.py --which bw);
    storing S int8 halves the dominant per-token traffic. The row scale
    folds into the readout for free: o = sum_dk (q*exp(cc)*scale)[dk] *
    S_q[dk, :]. Opt-in quality knob (generate_batch(state_quant="int8"));
    requantization happens at every fold, so the error does not compound
    beyond the recurrence's own decay."""
    sf = s.astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(sf), axis=-1), 1e-30) / 127.0
    q = jnp.clip(jnp.round(sf / sc[..., None]), -127, 127).astype(jnp.int8)
    return q, sc


def dequantize_state_rows(q: Array, sc: Array) -> Array:
    return q.astype(jnp.float32) * sc[..., None]


def gla_decode_lazy_step_q(
    q: Array, k: Array, v: Array, gk: Array,
    s_base_q: Array, s_scale: Array,
    kbuf: Array, vbuf: Array, cbuf: Array, cc: Array, p: Array,
    scale: Optional[float] = None,
) -> Tuple[Array, Array, Array, Array, Array]:
    """:func:`gla_decode_lazy_step` over an int8 base state: the row scale
    rides the query, the int8 matrix feeds the readout directly."""
    scale = _default_scale(q, scale)
    L = kbuf.shape[0]
    qf, kf, vf, gf = (x.astype(jnp.float32) for x in (q, k, v, gk))
    cc = cc + gf
    kbuf = jax.lax.dynamic_update_index_in_dim(kbuf, k, p, axis=0)
    vbuf = jax.lax.dynamic_update_index_in_dim(vbuf, v, p, axis=0)
    cbuf = jax.lax.dynamic_update_index_in_dim(
        cbuf, cc.astype(cbuf.dtype), p, axis=0)

    o = jnp.einsum("bhk,bhkv->bhv", qf * scale * jnp.exp(cc) * s_scale,
                   s_base_q.astype(jnp.float32))
    live = (jnp.arange(L) <= p).astype(jnp.float32)[:, None, None, None]
    w = jnp.exp(jnp.minimum(cc[None] - cbuf.astype(jnp.float32), 0.0)) * live
    a = jnp.einsum("bhk,lbhk->lbh", qf * scale,
                   kbuf.astype(jnp.float32) * w)
    o = o + jnp.einsum("lbh,lbhv->bhv", a, vbuf.astype(jnp.float32))
    return o.astype(q.dtype), kbuf, vbuf, cbuf, cc


def gla_decode_lazy_fold_q(
    s_base_q: Array, s_scale: Array,
    kbuf: Array, vbuf: Array, cbuf: Array, cc: Array,
) -> Tuple[Array, Array]:
    """Fold over an int8 base state: dequant -> chunk-scan update ->
    fresh per-row requantization. Returns (s_q, s_scale) only (buffers
    stay stale; the step masks slots > p)."""
    dec = jnp.exp(jnp.minimum(cc[None] - cbuf.astype(jnp.float32), 0.0))
    s = (jnp.exp(cc) * s_scale)[..., None] * s_base_q.astype(jnp.float32)
    s = s + jnp.einsum("lbhk,lbhv->bhkv", kbuf.astype(jnp.float32) * dec,
                       vbuf.astype(jnp.float32))
    return quantize_state_rows(s)


def quantize_state_rows_int4(s: Array) -> Tuple[Array, Array]:
    """Symmetric int4 per-(b, h, dk)-row quantization, nibble-packed.

    Packs along dv HALVES — byte j of the packed (b, h, dk, dv//2) int8
    array holds (S[..., j] in the low nibble, S[..., dv//2 + j] in the
    high nibble) — so :func:`unpack_state_int4` is contiguous (no
    interleave) and the readout is ``concat(w·lo, w·hi)`` over dv halves.
    Values in [-7, 7] (scale = rowmax/7). Opt-in quality knob
    (generate_batch(state_quant="int4")): quarter the int8 arm's state
    bytes at 16x its quantization error — bench/quality-harness measured
    before use (BASELINE.md)."""
    sf = s.astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(sf), axis=-1), 1e-30) / 7.0
    q = jnp.clip(jnp.round(sf / sc[..., None]), -7, 7).astype(jnp.int8)
    dv = q.shape[-1]
    lo, hi = q[..., : dv // 2], q[..., dv // 2:]
    packed = jnp.bitwise_or(
        jnp.left_shift(hi, 4), jnp.bitwise_and(lo, jnp.int8(0x0F)))
    return packed, sc


def unpack_state_int4(packed: Array) -> Tuple[Array, Array]:
    """(lo, hi) sign-extended int8 planes of a nibble-packed state."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return lo, hi


def dequantize_state_int4(packed: Array, sc: Array) -> Array:
    lo, hi = unpack_state_int4(packed)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32) * sc[..., None]


def gla_decode_lazy_step_q4(
    q: Array, k: Array, v: Array, gk: Array,
    s_packed: Array, s_scale: Array,
    kbuf: Array, vbuf: Array, cbuf: Array, cc: Array, p: Array,
    scale: Optional[float] = None,
) -> Tuple[Array, Array, Array, Array, Array]:
    """:func:`gla_decode_lazy_step` over an int4 nibble-packed base state:
    two dots on the lo/hi nibble planes of one packed operand, the row
    scale riding the query like the int8 path."""
    scale = _default_scale(q, scale)
    L = kbuf.shape[0]
    qf, gf = q.astype(jnp.float32), gk.astype(jnp.float32)
    cc = cc + gf
    kbuf = jax.lax.dynamic_update_index_in_dim(kbuf, k, p, axis=0)
    vbuf = jax.lax.dynamic_update_index_in_dim(vbuf, v, p, axis=0)
    cbuf = jax.lax.dynamic_update_index_in_dim(
        cbuf, cc.astype(cbuf.dtype), p, axis=0)

    w_row = qf * scale * jnp.exp(cc) * s_scale
    lo, hi = unpack_state_int4(s_packed)
    o = jnp.concatenate(
        [jnp.einsum("bhk,bhkv->bhv", w_row, lo.astype(jnp.float32)),
         jnp.einsum("bhk,bhkv->bhv", w_row, hi.astype(jnp.float32))],
        axis=-1)
    live = (jnp.arange(L) <= p).astype(jnp.float32)[:, None, None, None]
    w = jnp.exp(jnp.minimum(cc[None] - cbuf.astype(jnp.float32), 0.0)) * live
    a = jnp.einsum("bhk,lbhk->lbh", qf * scale,
                   kbuf.astype(jnp.float32) * w)
    o = o + jnp.einsum("lbh,lbhv->bhv", a, vbuf.astype(jnp.float32))
    return o.astype(q.dtype), kbuf, vbuf, cbuf, cc


def gla_decode_lazy_fold_q4(
    s_packed: Array, s_scale: Array,
    kbuf: Array, vbuf: Array, cbuf: Array, cc: Array,
) -> Tuple[Array, Array]:
    """Fold over an int4-packed base state: unpack -> chunk-scan update ->
    fresh per-row int4 requantization (buffers stay stale, like int8)."""
    dec = jnp.exp(jnp.minimum(cc[None] - cbuf.astype(jnp.float32), 0.0))
    s = jnp.exp(cc)[..., None] * dequantize_state_int4(s_packed, s_scale)
    s = s + jnp.einsum("lbhk,lbhv->bhkv", kbuf.astype(jnp.float32) * dec,
                       vbuf.astype(jnp.float32))
    return quantize_state_rows_int4(s)


def gla_chunk(
    q: Array,
    k: Array,
    v: Array,
    gk: Array,
    initial_state: Optional[Array] = None,
    scale: Optional[float] = None,
    chunk_size: int = 64,
    subchunk_size: int = 16,
) -> Tuple[Array, Array]:
    """Chunked-parallel GLA (training path), numerically stable, pure XLA.

    Stability invariant: every ``exp`` evaluated here has a non-positive
    argument. Within-sub-chunk interactions use the direct pairwise decay
    ``exp(b_t - b_s)`` with ``s <= t`` (<= 0 since gates are negative);
    cross-sub-chunk and cross-chunk interactions factor through sub-chunk /
    chunk boundary anchors, each factor again <= 0.

    Shapes as :func:`gla_scan_ref`. ``t`` is padded internally to a multiple
    of ``chunk_size`` (padding uses k = 0, gk = 0, so outputs and the final
    state are exact).
    """
    scale = _default_scale(q, scale)
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    C, S = chunk_size, subchunk_size
    assert C % S == 0
    ns = C // S

    pad = (-t) % C
    if pad:
        pz = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q, k, v, gk = pz(q), pz(k), pz(v), pz(gk)
    T = t + pad
    nc = T // C

    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dk, dv), dtype=jnp.float32)
    initial_state = initial_state.astype(jnp.float32)

    # per-chunk inputs, scanned over the chunk axis: (nc, b, h, C, d)
    qc = jnp.moveaxis((q.astype(jnp.float32) * scale).reshape(b, h, nc, C, dk), 2, 0)
    kc = jnp.moveaxis(k.astype(jnp.float32).reshape(b, h, nc, C, dk), 2, 0)
    vc = jnp.moveaxis(v.astype(jnp.float32).reshape(b, h, nc, C, dv), 2, 0)
    gc = jnp.moveaxis(gk.astype(jnp.float32).reshape(b, h, nc, C, dk), 2, 0)

    tri = jnp.tril(jnp.ones((S, S), dtype=bool))
    ij = jnp.tril(jnp.ones((ns, ns), dtype=bool), -1)

    # Matmul operand precision follows the IO dtype (bf16 inputs -> bf16 MXU
    # passes, ~8x fp32 throughput); gates/cumsums/state stay fp32 and every
    # contraction accumulates fp32 via preferred_element_type.
    mm_dtype = q.dtype if q.dtype == jnp.bfloat16 else jnp.float32
    ein = lambda spec, *ops: jnp.einsum(
        spec, *(o.astype(mm_dtype) for o in ops),
        preferred_element_type=jnp.float32,
    )

    # The whole per-chunk computation lives inside the scan body under
    # jax.checkpoint: backward recomputes one chunk's intermediates at a
    # time, so peak memory is O(chunk) instead of O(sequence) (the pairwise
    # decay tensors would otherwise all be live in the backward pass).
    @jax.checkpoint
    def chunk_body(state, inp):
        qf, kf, vf, gf = inp  # (b, h, C, d)
        bc = jnp.cumsum(gf, axis=2)
        b_total = bc[:, :, -1]  # (b, h, dk)

        # inter: carried state
        o_inter = ein("bhsk,bhkv->bhsv", qf * jnp.exp(bc), state)
        k_to_end = kf * jnp.exp(b_total[:, :, None] - bc)
        chunk_kv = ein("bhsk,bhsv->bhkv", k_to_end, vf)
        new_state = jnp.exp(b_total)[..., None] * state + chunk_kv

        # intra: sub-chunk decomposition (b, h, ns, S, d)
        shp = (b, h, ns, S, dk)
        qf_s = qf.reshape(shp)
        kf_s = kf.reshape(shp)
        vf_s = vf.reshape(b, h, ns, S, dv)
        bc_s = bc.reshape(shp)
        beta = bc_s[..., -1, :]  # (b, h, ns, dk)
        beta_prev = jnp.concatenate(
            [jnp.zeros_like(beta[..., :1, :]), beta[..., :-1, :]], axis=-2
        )

        # diagonal: direct pairwise exp(b_t - b_s), s <= t (tril => <= 0)
        # (kept fp32: the pairwise product is elementwise + reduce, VPU-bound)
        pair = bc_s[..., :, None, :] - bc_s[..., None, :, :]
        pair = jnp.where(tri[..., None], pair, -jnp.inf)
        A_diag = jnp.einsum("bhitd,bhisd,bhitsd->bhits", qf_s, kf_s, jnp.exp(pair))
        o_intra = ein("bhits,bhisv->bhitv", A_diag, vf_s)

        # off-diagonal (j < i): factors through sub-chunk anchors, all <= 0
        q_anch = qf_s * jnp.exp(bc_s - beta_prev[..., None, :])
        k_anch = kf_s * jnp.exp(beta[..., None, :] - bc_s)
        cross = beta_prev[..., :, None, :] - beta[..., None, :, :]
        cross = jnp.where(ij[..., None], cross, -jnp.inf)
        A_off = jnp.einsum(
            "bhitd,bhijd,bhjsd->bhijts",
            q_anch.astype(mm_dtype), jnp.exp(cross), k_anch.astype(mm_dtype),
            preferred_element_type=jnp.float32,
        )
        o_intra = o_intra + ein("bhijts,bhjsv->bhitv", A_off, vf_s)

        o_chunk = o_inter + o_intra.reshape(b, h, C, dv)
        return new_state, o_chunk

    final_state, o = jax.lax.scan(chunk_body, initial_state, (qc, kc, vc, gc))
    o = jnp.moveaxis(o, 0, 2).reshape(b, h, T, dv)[:, :, :t]
    return o.astype(q.dtype), final_state.astype(state_dtype)


def gla_chunk_parallel(
    q: Array,
    k: Array,
    v: Array,
    gk: Array,
    initial_state: Optional[Array] = None,
    scale: Optional[float] = None,
    chunk_size: int = 64,
    subchunk_size: int = 16,
) -> Tuple[Array, Array]:
    """Inference/prefill variant of :func:`gla_chunk`: intra-chunk work is
    vectorized across ALL chunks (only the cheap state recursion is
    sequential), maximizing parallelism. Identical math; its *backward*
    keeps every chunk's pairwise tensors live, so the checkpointed-scan
    :func:`gla_chunk` is the training path.
    """
    scale = _default_scale(q, scale)
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    C, S = chunk_size, subchunk_size
    assert C % S == 0
    ns = C // S

    pad = (-t) % C
    if pad:
        pz = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q, k, v, gk = pz(q), pz(k), pz(v), pz(gk)
    T = t + pad
    nc = T // C

    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dk, dv), dtype=jnp.float32)
    initial_state = initial_state.astype(jnp.float32)

    mm_dtype = q.dtype if q.dtype == jnp.bfloat16 else jnp.float32
    ein = lambda spec, *ops: jnp.einsum(
        spec, *(o.astype(mm_dtype) for o in ops),
        preferred_element_type=jnp.float32,
    )

    qf = (q.astype(jnp.float32) * scale).reshape(b, h, nc, C, dk)
    kf = k.astype(jnp.float32).reshape(b, h, nc, C, dk)
    vf = v.astype(jnp.float32).reshape(b, h, nc, C, dv)
    gf = gk.astype(jnp.float32).reshape(b, h, nc, C, dk)

    bc = jnp.cumsum(gf, axis=3)
    b_total = bc[:, :, :, -1]

    # inter-chunk state recursion (the only sequential piece)
    k_to_end = kf * jnp.exp(b_total[:, :, :, None] - bc)
    chunk_kv = ein("bhcsk,bhcsv->bhckv", k_to_end, vf)
    q_in = qf * jnp.exp(bc)

    def chunk_step(state, inp):
        q_c, kv_c, dtot_c = inp
        o_inter = jnp.einsum("bhsk,bhkv->bhsv", q_c.astype(mm_dtype),
                             state.astype(mm_dtype),
                             preferred_element_type=jnp.float32)
        state = jnp.exp(dtot_c)[..., None] * state + kv_c
        return state, o_inter

    xs = (jnp.moveaxis(q_in, 2, 0), jnp.moveaxis(chunk_kv, 2, 0),
          jnp.moveaxis(b_total, 2, 0))
    final_state, o_inter = jax.lax.scan(chunk_step, initial_state, xs)
    o_inter = jnp.moveaxis(o_inter, 0, 2)

    # intra-chunk, vectorized over (nc, ns)
    shp = (b, h, nc, ns, S, dk)
    qf_s = qf.reshape(shp)
    kf_s = kf.reshape(shp)
    vf_s = vf.reshape(b, h, nc, ns, S, dv)
    bc_s = bc.reshape(shp)
    beta = bc_s[..., -1, :]
    beta_prev = jnp.concatenate(
        [jnp.zeros_like(beta[..., :1, :]), beta[..., :-1, :]], axis=-2
    )

    tri = jnp.tril(jnp.ones((S, S), dtype=bool))
    pair = bc_s[..., :, None, :] - bc_s[..., None, :, :]
    pair = jnp.where(tri[..., None], pair, -jnp.inf)
    A_diag = jnp.einsum("bhcitd,bhcisd,bhcitsd->bhcits", qf_s, kf_s, jnp.exp(pair))
    o_intra = ein("bhcits,bhcisv->bhcitv", A_diag, vf_s)

    q_anch = qf_s * jnp.exp(bc_s - beta_prev[..., None, :])
    k_anch = kf_s * jnp.exp(beta[..., None, :] - bc_s)
    cross = beta_prev[..., :, None, :] - beta[..., None, :, :]
    ij = jnp.tril(jnp.ones((ns, ns), dtype=bool), -1)
    cross = jnp.where(ij[..., None], cross, -jnp.inf)
    A_off = jnp.einsum(
        "bhcitd,bhcijd,bhcjsd->bhcijts",
        q_anch.astype(mm_dtype), jnp.exp(cross), k_anch.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
    o_intra = o_intra + ein("bhcijts,bhcjsv->bhcitv", A_off, vf_s)

    o = o_inter + o_intra.reshape(b, h, nc, C, dv)
    o = o.reshape(b, h, T, dv)[:, :, :t]
    return o.astype(q.dtype), final_state.astype(state_dtype)
