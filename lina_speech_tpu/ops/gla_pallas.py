"""Pallas TPU kernel for the chunked GLA scan (training forward path).

Replaces the reference's Triton ``fused_chunk_gla`` (model/gla.py:192-195;
kernel in the external flash-linear-attention submodule). Design:

- grid = (batch*heads [parallel], chunks [sequential]); the fp32 recurrent
  state (d_k, d_v) lives in VMEM scratch and carries across the sequential
  chunk dimension; q/k/v/g chunk blocks are double-buffered HBM->VMEM by the
  BlockSpec pipeline.
- per chunk: cumsum via one lower-triangular MXU matmul, inter readout
  (C, dk) @ (dk, dv) on the MXU, the intra-chunk pairwise-decay matrix
  A[t,s] = sum_d q k exp(b_t - b_s) built by the **dyadic masked-matmul
  decomposition** (below), A @ v on the MXU, state update (dk, C) @ (C, dv)
  on the MXU.
- matmul operands follow the model dtype (bf16 flagship — matching the
  reference Triton kernels, which feed tl.dot in the input dtype);
  gates/exp/accumulation/state fp32.

Dyadic intra decomposition: every pair s < t belongs to exactly one dyadic
block (width w in {C, C/2, ..., 8}) where t and s fall in different
halves; there exp(b_t - b_s) = exp(b_t - b_mid) * exp(b_mid - b_s) with
b_mid the cumsum at the block midpoint — both factors have non-positive
log (gates <= 0, b non-increasing), so each level is one stable
(C, dk) @ (dk, C) full-row MXU matmul with a static same-block mask.
Remaining pairs (distance < 4) ride a shifted-row VPU band; the diagonal
is a row dot. This removes the rank-3 (sub, sub, dk) broadcast-reduce the
first version ran on the VPU — the training-throughput bottleneck flagged
in round 1.

Backward: handwritten Pallas kernel (``_bwd_kernel``) — reverse chunk sweep
with a state-cotangent VMEM carry, chunk-start states saved by the forward
as residuals, and the same dyadic decomposition for the intra-chunk grads
(G/H level matmuls + band). Also here: ``gla_decode_fused``, the
single-pass decode step kernel.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lina_speech_tpu.ops.gla import gla_chunk

Array = jnp.ndarray

_BAND = 4  # pairs closer than this ride the VPU band; dyadic tree above it
_MIN_W = 2 * _BAND  # narrowest dyadic level (8: sublane-friendly reshapes)


def _shift_down(x: Array, j: int) -> Array:
    """Rows t -> x[t-j]; first j rows zero. Static shapes only."""
    if j == 0:
        return x
    return jnp.pad(x[:-j], ((j, 0), (0, 0)))


def _shift_up(x: Array, j: int) -> Array:
    if j == 0:
        return x
    return jnp.pad(x[j:], ((0, j), (0, 0)))


def _block_boundary(bcum: Array, w: int, idx: int) -> Array:
    """(C, dk) -> per-row value of bcum at position (row//w)*w + idx."""
    C, dk = bcum.shape
    mid = bcum.reshape(C // w, w, dk)[:, idx]  # (C/w, dk)
    return jnp.broadcast_to(mid[:, None, :], (C // w, w, dk)).reshape(C, dk)


def _dyadic_levels(chunk_size: int):
    w = chunk_size
    levels = []
    while w >= _MIN_W:
        levels.append(w)
        w //= 2
    return levels


def _level_factors(bcum: Array, row1: Array, w: int, q_cum: Array = None):
    """Per-level decay factors and selection masks.

    qe[t] = exp(b_t - b_mid(t)) for t in the upper half of its w-block
    (0 elsewhere); ke[s] = exp(b_mid(s) - b_s) for s in the lower half.
    Selected rows have non-positive exp args (b non-increasing); deselected
    rows are clamped to 0 before exp so no overflow can occur.

    ``q_cum`` overrides the query-side cumsum (RWKV6 uses the exclusive
    cumsum bx_t = b_t - g_t, still <= b_mid for upper-half rows since
    t - 1 >= mid there).
    """
    if q_cum is None:
        q_cum = bcum
    bmid = _block_boundary(bcum, w, w // 2 - 1)
    hi = ((row1 % w) >= (w // 2)).astype(jnp.float32)  # (C, 1)
    # qe/ke live on disjoint row halves, so ONE exp serves both (the exp
    # count is the kernel's dominant VPU-transcendental cost: 2 per level
    # x 5 levels at C=128 halves to 5)
    delta = jnp.where(hi > 0.0, q_cum - bmid, bmid - bcum)
    e = jnp.exp(jnp.minimum(delta, 0.0))
    return e * hi, e * (1.0 - hi)


def _fwd_math(u, k, v, g, state, *, chunk_size: int, cdt):
    """Pure per-chunk forward math on VMEM values.

    u: (C, dk) f32 pre-scaled query; k: (C, dk) f32; v: (C, dv) cdt;
    g: (C, dk) f32 log-gates; state: (dk, dv) f32 chunk-start state.
    Returns (o (C, dv) f32, new_state (dk, dv) f32).
    """
    C = chunk_size
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    tril_inc = (row >= col).astype(jnp.float32)

    bcum = jnp.dot(tril_inc, g, preferred_element_type=jnp.float32)
    btot = bcum[C - 1 : C, :]  # (1, dk)

    # ---- inter: decayed query against the carried chunk-start state
    o = jnp.dot((u * jnp.exp(bcum)).astype(cdt), state.astype(cdt),
                preferred_element_type=jnp.float32)

    # ---- intra A: dyadic levels (MXU) ...
    A = jnp.zeros((C, C), jnp.float32)
    for w in _dyadic_levels(C):
        qe, ke = _level_factors(bcum, row1, w)
        mask_w = ((row // w) == (col // w)).astype(jnp.float32)
        A += jax.lax.dot_general(
            (u * qe).astype(cdt), (k * ke).astype(cdt),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * mask_w
    # ... + near band (distance 0..3, same dyadic-4 block): row dots (VPU).
    # E_j[t] = exp(b_t - b_{t-j}) = prod_{i<j} exp(g_{t-i}) is built from ONE
    # exp of the per-step gate by shifted products (g <= 0 so no overflow);
    # rows t < j get 0 instead of junk, harmless because k/v shifts zero the
    # same rows and m_j masks them anyway.
    eg = jnp.exp(g)
    Ej = 1.0
    for j in range(_BAND):
        kj = _shift_down(k, j)
        if j == 1:
            Ej = eg
        elif j > 1:
            Ej = Ej * _shift_down(eg, j - 1)
        a_j = jnp.sum(u * kj * Ej, axis=-1, keepdims=True)  # (C, 1)
        m_j = (row - col == j) if j == 0 else (
            (row - col == j) & ((row % _BAND) >= j))
        A += jnp.where(m_j, a_j, 0.0)

    o = o + jnp.dot(A.astype(cdt), v, preferred_element_type=jnp.float32)

    # ---- state update: S = exp(btot) * S + (k decayed-to-end)^T v
    kd = (k * jnp.exp(btot - bcum)).astype(cdt)
    new_state = state * jnp.exp(btot)[0][:, None] + jax.lax.dot_general(
        kd, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return o, new_state


def _kernel(q_ref, k_ref, v_ref, g_ref, s0_ref, o_ref, sf_ref, cs_ref, state,
            *, chunk_size: int, scale: float, out_dtype):
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        state[:] = s0_ref[0].astype(jnp.float32)

    if cs_ref is not None:
        # chunk-start state, saved as a backward residual
        cs_ref[0, 0] = state[:].astype(cs_ref.dtype)

    cdt = q_ref.dtype  # matmul operand dtype (model dtype; f32 in tests)
    o, new_state = _fwd_math(
        q_ref[0].astype(jnp.float32) * scale,
        k_ref[0].astype(jnp.float32),
        v_ref[0].astype(cdt),
        g_ref[0].astype(jnp.float32),
        state[:],
        chunk_size=chunk_size, cdt=cdt,
    )
    o_ref[0] = o.astype(out_dtype)
    state[:] = new_state

    @pl.when(c == nc - 1)
    def _():
        # round-to-nearest-even cast in-kernel == the XLA f32->bf16 cast
        # the callers used to do outside; f32 sf is byte-identical
        sf_ref[0] = state[:].astype(sf_ref.dtype)


def _kernel_infer(q_ref, k_ref, v_ref, g_ref, s0_ref, o_ref, sf_ref, state,
                  *, chunk_size: int, scale: float, out_dtype):
    """Forward-only variant: no chunk-state residual output.

    The custom-call residual buffer cannot be DCE'd by XLA even when the
    caller discards it; at generate-prefill scale (b*h rows in the
    hundreds) that is hundreds of MB of dead HBM per layer — measured as
    the b384 OOM driver (BASELINE.md round 5)."""
    _kernel(q_ref, k_ref, v_ref, g_ref, s0_ref, o_ref, sf_ref, None, state,
            chunk_size=chunk_size, scale=scale, out_dtype=out_dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, cs_ref, do_ref, dsf_ref,
                dq_ref, dk_ref, dv_ref, dg_ref, ds0_ref, dstate,
                *, chunk_size: int, scale: float):
    """Reverse sweep. Grid (bh, nc) with the chunk axis index-mapped to run
    newest chunk first; ``dstate`` carries the state cotangent; the
    chunk-start state S_in is the forward's saved residual.

    Math (per chunk, u = scale*q, lam = exp(bcum),
    ktil = k*exp(btot - bcum), dS = cotangent of the NEXT boundary state):
      dq = scale*lam*(dO S_in^T) + scale*G
      dk = exp(btot-bcum)*(v dS^T) + H
      dv = ktil dS + A^T dO
      db = u*lam*(dO S_in^T) + u*G - k*H - ktil*(v dS^T)
           [+ at last pos: sum_s(ktil*(v dS^T)) + sum_v(dS*exp(btot)*S_in)]
      dg = reversed-cumsum(db);  dS <- exp(btot)*dS + (u*lam)^T dO
    with G[t,d] = sum_{s<=t} dA[t,s] k[s,d] E[t,s,d],
         H[s,d] = sum_{t>=s} dA[t,s] u[t,d] E[t,s,d],
         E = exp(b_t - b_s), dA = dO v^T.
    G, H and the A recompute use the same dyadic masked-matmul
    decomposition as the forward (module docstring) plus the near band.
    """
    rc = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(rc == 0)
    def _():
        dstate[:] = dsf_ref[0].astype(jnp.float32)

    cdt = q_ref.dtype
    dq, dk_out, dv, dg, new_dstate = _bwd_math(
        q_ref[0].astype(jnp.float32) * scale,
        k_ref[0].astype(jnp.float32),
        v_ref[0].astype(jnp.float32),
        g_ref[0].astype(jnp.float32),
        cs_ref[0, 0].astype(jnp.float32),
        do_ref[0].astype(jnp.float32),
        dstate[:],
        chunk_size=chunk_size, scale=scale, cdt=cdt,
    )

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk_out.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dg_ref[0] = dg.astype(dg_ref.dtype)
    dstate[:] = new_dstate

    @pl.when(rc == nc - 1)
    def _():
        ds0_ref[0] = dstate[:]


def _bwd_math(u, k, v, g, s_in, do, dS, *, chunk_size: int, scale: float, cdt):
    """Pure per-chunk backward math on VMEM values (see ``_bwd_kernel`` doc).

    u: (C, dk) f32 pre-scaled query; dS: (dk, dv) f32 cotangent of the
    chunk-END state. Returns (dq, dk, dv, dg, d(chunk-start state)); dq/dk
    are cotangents w.r.t. the UNSCALED q and k.
    """
    C = chunk_size
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    tril_inc = (row >= col).astype(jnp.float32)
    triu_inc = (row <= col).astype(jnp.float32)

    bcum = jnp.dot(tril_inc, g, preferred_element_type=jnp.float32)
    btot = bcum[C - 1 : C, :]
    lam = jnp.exp(bcum)
    dec_end = jnp.exp(btot - bcum)
    ktil = k * dec_end

    # ---- inter pieces
    M = jax.lax.dot_general(do.astype(cdt), s_in.astype(cdt),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (C, dk)
    dktil = jax.lax.dot_general(v.astype(cdt), dS.astype(cdt),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (C, dk)
    dq = scale * lam * M
    dk_out = dec_end * dktil
    dv = jnp.dot(ktil.astype(cdt), dS.astype(cdt),
                 preferred_element_type=jnp.float32)
    db = u * lam * M - ktil * dktil

    # ---- intra: dyadic levels for A / G / H (MXU) ...
    dA = jax.lax.dot_general(do.astype(cdt), v.astype(cdt),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (C, C)
    A = jnp.zeros((C, C), jnp.float32)
    G = jnp.zeros_like(bcum)
    H = jnp.zeros_like(bcum)
    for w in _dyadic_levels(C):
        qe, ke = _level_factors(bcum, row1, w)
        mask_w = ((row // w) == (col // w)).astype(jnp.float32)
        kke = (k * ke).astype(cdt)
        uqe = (u * qe).astype(cdt)
        dAw = (dA * mask_w).astype(cdt)
        A += jax.lax.dot_general(uqe, kke, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * mask_w
        G += qe * jnp.dot(dAw, kke, preferred_element_type=jnp.float32)
        H += ke * jax.lax.dot_general(dAw, uqe, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    # ... + near band (distance 0..3; dA band entries are row dots of
    # do against shifted v — never materialized from the dA matrix)
    eg = jnp.exp(g)  # one exp; E_j via shifted products (see _fwd_math band)
    Ej = 1.0
    for j in range(_BAND):
        kj = _shift_down(k, j)
        if j == 1:
            Ej = eg
        elif j > 1:
            Ej = Ej * _shift_down(eg, j - 1)
        bm = (1.0 if j == 0
              else ((row1 % _BAND) >= j).astype(jnp.float32))  # (C, 1)
        da_j = jnp.sum(do * _shift_down(v, j), axis=-1, keepdims=True) * bm
        a_j = jnp.sum(u * kj * Ej, axis=-1, keepdims=True)
        m_j = (row - col == j) if j == 0 else (
            (row - col == j) & ((row % _BAND) >= j))
        A += jnp.where(m_j, a_j, 0.0)
        G += da_j * kj * Ej
        H += _shift_up(da_j * u * Ej, j)

    dv = dv + jax.lax.dot_general(A.astype(cdt), do.astype(cdt),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dq = dq + scale * G
    dk_out = dk_out + H
    db = db + u * G - k * H

    # last-position extras: btot terms (ktil scaling + state decay)
    extra = jnp.sum(ktil * dktil, axis=0, keepdims=True) + jnp.sum(
        dS * jnp.exp(btot)[0][:, None] * s_in, axis=1
    )[None, :]
    zero_rows = (row1 == C - 1).astype(jnp.float32)  # (C, 1)
    db = db + zero_rows * extra

    dg = jnp.dot(triu_inc, db, preferred_element_type=jnp.float32)

    # cotangent of this chunk's START state
    new_dstate = dS * jnp.exp(btot)[0][:, None] + jax.lax.dot_general(
        (u * lam).astype(cdt), do.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32
    )
    return dq, dk_out, dv, dg, new_dstate


def _pad_inputs(q, k, v, gk, chunk_size):
    t = q.shape[2]
    pad = (-t) % chunk_size
    if pad:
        pz = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return pz(q), pz(k), pz(v), pz(gk)
    return q, k, v, gk


def _fwd_impl(q, k, v, gk, initial_state, scale, chunk_size, interpret,
              residual_dtype=jnp.bfloat16, sf_dtype=jnp.float32,
              save_residuals=True):
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    C = chunk_size
    q, k, v, gk = _pad_inputs(q, k, v, gk, C)
    T = q.shape[2]
    nc = T // C
    bh = b * h

    rs = lambda x, d: x.reshape(bh, T, d)
    q2, k2, v2, g2 = rs(q, dk), rs(k, dk), rs(v, dv), rs(gk, dk)
    s0 = initial_state.reshape(bh, dk, dv)
    if save_residuals:
        # the backward reads chunk-start states as f32; keep the operand
        # cast here (one fused convert) rather than per-chunk in-kernel
        s0 = s0.astype(jnp.float32)

    if save_residuals:
        kern = functools.partial(
            _kernel, chunk_size=C, scale=scale, out_dtype=q.dtype
        )
        out_specs = [
            pl.BlockSpec((1, C, dv), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, dk, dv), lambda i, c: (i, c, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bh, T, dv), q.dtype),
            jax.ShapeDtypeStruct((bh, dk, dv), sf_dtype),
            # chunk-start states: backward residual; bf16 storage halves
            # the residual footprint (~0.3% relative grad error);
            # residual_dtype=float32 gives exact grads
            jax.ShapeDtypeStruct((bh, nc, dk, dv), residual_dtype),
        ]
    else:
        # inference (custom_vjp primal): the residual buffer is a pallas
        # OUTPUT, so XLA cannot DCE it even though the caller discards
        # it — at generate-prefill scale that is hundreds of MB of dead
        # HBM per layer (the b384 OOM driver, BASELINE.md round 5)
        kern = functools.partial(
            _kernel_infer, chunk_size=C, scale=scale, out_dtype=q.dtype
        )
        out_specs = [
            pl.BlockSpec((1, C, dv), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bh, T, dv), q.dtype),
            jax.ShapeDtypeStruct((bh, dk, dv), sf_dtype),
        ]

    outs = pl.pallas_call(
        kern,
        grid=(bh, nc),
        in_specs=[
            pl.BlockSpec((1, C, dk), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, C, dk), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, C, dv), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, C, dk), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((dk, dv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q2, k2, v2, g2, s0)

    o = outs[0].reshape(b, h, T, dv)[:, :, :t]
    sf = outs[1].reshape(b, h, dk, dv)
    if not save_residuals:
        return o, sf
    return o, sf, outs[2].reshape(b, h, nc, dk, dv)


def _bwd_impl(q, k, v, gk, chunk_states, do, dsf, scale, chunk_size, interpret):
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    C = chunk_size
    q, k, v, gk = _pad_inputs(q, k, v, gk, C)
    do = jnp.pad(do, ((0, 0), (0, 0), (0, q.shape[2] - t), (0, 0)))
    T = q.shape[2]
    nc = T // C
    bh = b * h

    rs = lambda x, d: x.reshape(bh, T, d)
    q2, k2, v2, g2, do2 = (rs(q, dk), rs(k, dk), rs(v, dv), rs(gk, dk),
                           rs(do, dv))
    dsf2 = dsf.reshape(bh, dk, dv).astype(jnp.float32)
    chunk_states = chunk_states.reshape(bh, nc, dk, dv)

    kern = functools.partial(_bwd_kernel, chunk_size=C, scale=scale)
    rev = lambda i, c: (i, nc - 1 - c, 0)  # newest chunk first
    dq, dk_, dv_, dg, ds0 = pl.pallas_call(
        kern,
        grid=(bh, nc),
        in_specs=[
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dv), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, 1, dk, dv), lambda i, c: (i, nc - 1 - c, 0, 0)),
            pl.BlockSpec((1, C, dv), rev),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dv), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
        ],
        out_shape=[
            # grads in input dtype: the VJP casts to it anyway, and f32
            # intermediates would double the dominant HBM write traffic
            jax.ShapeDtypeStruct((bh, T, dk), q.dtype),
            jax.ShapeDtypeStruct((bh, T, dk), k.dtype),
            jax.ShapeDtypeStruct((bh, T, dv), v.dtype),
            jax.ShapeDtypeStruct((bh, T, dk), gk.dtype),
            jax.ShapeDtypeStruct((bh, dk, dv), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dk, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q2, k2, v2, g2, chunk_states, do2, dsf2)

    unp = lambda x, d: x.reshape(b, h, T, d)[:, :, :t]
    return unp(dq, dk), unp(dk_, dk), unp(dv_, dv), unp(dg, dk), \
        ds0.reshape(b, h, dk, dv)


# ------------------------------------------------------------ partitioning
# GSPMD/Shardy cannot see inside a pallas_call, so under a sharded jit the
# kernel would otherwise force full replication (the reference sidesteps
# this entirely: its Triton kernels run under torch DDP, one process per
# GPU). The scan is embarrassingly parallel over (batch, heads) — exactly
# the model's dp x tp layout — so we register a custom-partitioning rule:
# shard b/h through unchanged, replicate t/d_k/d_v, run the kernel on the
# local shard. No collectives are needed inside the op.


def _bh_axes(arg_info, mesh):
    """(batch, head) mesh axes of the q operand, or (None, None) when the
    incoming sharding can't be honored by the per-shard kernel (e.g. Shardy
    proposes heads=2 split over tp=4 — uneven shardings decode to no
    PartitionSpec). Dropped axes replicate the dim; the partitioner then
    inserts the reshard — mirrors the shape-aware fallback of the param
    rules in parallel/sharding.py. We decode the HloSharding ourselves
    (decode_shardings=False) because jax's own decoding raises on the
    uneven case instead of falling back."""
    sharding = arg_info.sharding
    spec = getattr(sharding, "spec", None)
    if spec is None:
        try:
            from jax._src.sharding_impls import parse_flatten_op_sharding
            spec = parse_flatten_op_sharding(sharding._hlo_sharding, mesh)[0]
        except Exception:
            return None, None
    s = tuple(spec) + (None,) * 4

    def keep(axis, dim):
        if axis is None:
            return None
        names = axis if isinstance(axis, tuple) else (axis,)
        size = int(np.prod([mesh.shape[n] for n in names]))
        return axis if dim % size == 0 else None

    return keep(s[0], arg_info.shape[0]), keep(s[1], arg_info.shape[1])


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(scale, chunk_size, interpret, residual_dtype,
                     partitioned=True, sf_dtype=jnp.float32):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(q, k, v, gk, s0):
        return _fwd_impl(q, k, v, gk, s0, scale, chunk_size, interpret,
                         residual_dtype, sf_dtype)

    if not partitioned:
        # raw kernel for fully-manual shard_map contexts (ops/gla_cp.py):
        # custom_partitioning cannot compile inside a partial-manual
        # shard_map (its partition callback chokes on manual subgroups)
        return fn

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, ha, None, None), mk(ba, ha, None, None),
                mk(ba, ha, None, None, None))

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = (mk(ba, ha, None, None),) * 5
        outs = (mk(ba, ha, None, None), mk(ba, ha, None, None),
                mk(ba, ha, None, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h t k, b h t k, b h t v, b h t k, b h k v "
                      "-> b h t v, b h k v, b h c k v",
        need_replication_factors=("t", "k", "v", "c"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _fwd_infer_partitioned(scale, chunk_size, interpret, sf_dtype,
                           partitioned=True):
    """Inference-only forward: no chunk-state residual output, ``sf``
    emitted in ``sf_dtype`` in-kernel (no f32 sf temp + outside cast)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(q, k, v, gk, s0):
        return _fwd_impl(q, k, v, gk, s0, scale, chunk_size, interpret,
                         sf_dtype=sf_dtype, save_residuals=False)

    if not partitioned:
        return fn

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, ha, None, None), mk(ba, ha, None, None))

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = (mk(ba, ha, None, None),) * 5
        outs = (mk(ba, ha, None, None), mk(ba, ha, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h t k, b h t k, b h t v, b h t k, b h k v "
                      "-> b h t v, b h k v",
        need_replication_factors=("t", "k", "v"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(scale, chunk_size, interpret, partitioned=True):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(q, k, v, gk, chunk_states, do, dsf):
        return _bwd_impl(q, k, v, gk, chunk_states, do, dsf, scale,
                         chunk_size, interpret)

    if not partitioned:
        return fn

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, ha, None, None),) * 4 + (mk(ba, ha, None, None),)

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, ha, None, None),) * 4
                + (mk(ba, ha, None, None, None),)
                + (mk(ba, ha, None, None),) * 2)
        outs = (mk(ba, ha, None, None),) * 5
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h t k, b h t k, b h t v, b h t k, b h c k v, "
                      "b h t v, b h k v "
                      "-> b h t k, b h t k, b h t v, b h t k, b h k v",
        need_replication_factors=("t", "k", "v", "c"),
    )
    return cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _gla_chunk_pallas(q, k, v, gk, initial_state, scale, chunk_size, interpret,
                      residual_dtype, partitioned=True, sf_dtype=jnp.float32):
    # primal == inference: the residual-free kernel (a custom-call output
    # buffer cannot be DCE'd — prefill-scale HBM waste otherwise)
    o, sf = _fwd_infer_partitioned(scale, chunk_size, interpret, sf_dtype,
                                   partitioned)(q, k, v, gk, initial_state)
    return o, sf


def _vjp_fwd(q, k, v, gk, initial_state, scale, chunk_size, interpret,
             residual_dtype, partitioned=True, sf_dtype=jnp.float32):
    o, sf, chunk_states = _fwd_partitioned(
        scale, chunk_size, interpret, residual_dtype, partitioned, sf_dtype
    )(q, k, v, gk, initial_state)
    return (o, sf), (q, k, v, gk, chunk_states)


def _vjp_bwd(scale, chunk_size, interpret, residual_dtype, partitioned,
             sf_dtype, residuals, cotangents):
    q, k, v, gk, chunk_states = residuals
    do, dsf = cotangents
    dq, dk, dv, dg, ds0 = _bwd_partitioned(
        scale, chunk_size, interpret, partitioned)(
        q, k, v, gk, chunk_states, do, dsf
    )
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dg.astype(gk.dtype), ds0)


_gla_chunk_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def gla_chunk_pallas(
    q: Array,
    k: Array,
    v: Array,
    gk: Array,
    initial_state: Optional[Array] = None,
    scale: Optional[float] = None,
    chunk_size: int = 128,
    interpret: Optional[bool] = None,
    residual_dtype=jnp.bfloat16,
    partitioned: bool = True,
    sf_emit_dtype=None,
) -> Tuple[Array, Array]:
    """Drop-in for :func:`lina_speech_tpu.ops.gla.gla_chunk`: Pallas forward
    AND handwritten Pallas backward (chunk-start states saved as residuals;
    intra-chunk pairwise work on the MXU via the dyadic decomposition —
    module docstring). ``chunk_size`` must be a power of two >= 8.

    Contract (invariant of the GLA recurrence, reference gla.py:176-184):
    gates ``gk`` are log-decays <= 0; the dyadic factorization relies on the
    cumulative gate being non-increasing."""
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    if chunk_size < _MIN_W or (chunk_size & (chunk_size - 1)):
        raise ValueError(f"chunk_size must be a power of two >= {_MIN_W}, "
                         f"got {chunk_size}")
    if scale is None:
        scale = dk ** -0.5
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    # sf_emit_dtype overrides the dtype the KERNEL STORES the final state
    # in; the returned sf is always state_dtype (cast outside the kernel).
    # generate_batch forces f32 emission for the int8/int4 state_quant
    # prefill: in-kernel bf16 sf emission costs ~13% END-TO-END on the b64
    # int8-state decode (190 vs 218 x-realtime, A/B'd 3x on v5e — an XLA
    # layout/fusion artifact of the fused generate program; the quantize
    # input is the same bf16 value either way, and downstream copies /
    # optimization_barrier round-trips do NOT recover it). The f32
    # emissions stay live until their casts (XLA schedules the casts at
    # end of prefill), so the caller budget-gates by batch (b384 f32 sf =
    # 19 GB -> OOM; in-kernel bf16 emission is exactly the fix for that).
    emit_dtype = state_dtype if sf_emit_dtype is None else sf_emit_dtype
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dk, dv), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    o, sf = _gla_chunk_pallas(q, k, v, gk, initial_state, scale, chunk_size,
                              interpret, residual_dtype, partitioned,
                              emit_dtype)
    if sf.dtype != state_dtype:
        sf = sf.astype(state_dtype)
    return o, sf


# ------------------------------------------------- conv-fused chunk kernel
# Fuses the q/k/v depthwise short-conv (width w <= 8, silu, no bias —
# reference gla.py:101-108 ShortConvolution) into the chunked GLA kernel:
# the conv runs on VMEM blocks instead of a separate HBM pass (read x +
# write conv(x) per projection = ~67 MB/layer/step at B8 T512 — measured
# ~14 ms/step across 25 layers before fusion). History across chunk
# boundaries comes from a tiny "halo" side-tensor (last 8 rows of the
# previous chunk, 6% of x); the backward carries the next chunk's dz rows
# in VMEM scratch across the reverse sweep and accumulates tap grads in
# scratch, reduced over batch outside the partitioned call.

_HALO = 8  # halo rows (>= conv_size - 1), sublane-aligned


def _chunk_halo(x2: Array, C: int) -> Array:
    """(bh, T, d) -> (bh, nc, _HALO, d): rows [cC-8, cC) per chunk (zeros
    for chunk 0 — causal zero padding)."""
    bh, T, d = x2.shape
    padded = jnp.pad(x2, ((0, 0), (_HALO, 0), (0, 0)))[:, :T]
    return padded.reshape(bh, T // C, C, d)[:, :, :_HALO]


def _conv_apply(x, halo, taps, valid, cdt, conv_size):
    """In-VMEM causal depthwise conv + silu.

    x: (C, d) cdt; halo: (_HALO, d) rows t-8..t-1; taps: (W8, d) f32 with
    rows [_HALO - conv_size .. _HALO) unused — actually rows [0, conv_size)
    hold tap 0 (oldest) .. conv_size-1 (current); valid: (C, 1) f32 row
    mask. Tap-sum f32 -> round to cdt -> silu f32 -> round (the decode
    kernel's convention, gla_pallas._decode_conv_kernel).

    Returns (y (C, d) cdt, zr (C, d) f32 rounded pre-activation).
    """
    C = x.shape[0]
    W = conv_size
    xf = x.astype(jnp.float32)
    hf = halo.astype(jnp.float32)
    z = jnp.zeros(x.shape, jnp.float32)
    for i in range(W):
        j = (W - 1) - i  # shift: y[t] += w_i * x[t - j]
        xi = _shift_down(xf, j)
        if j:
            top = jnp.pad(hf[_HALO - j :], ((0, C - j), (0, 0)))
            xi = xi + top
        z = z + taps[i][None, :] * xi
    zr = z.astype(cdt).astype(jnp.float32)
    y = (zr * (1.0 / (1.0 + jnp.exp(-zr)))) * valid
    # y stays f32 — the GLA math rounds matmul operands to cdt itself, so
    # the extra cdt round-trip here was pure VPU convert traffic
    return y, zr


def _conv_fwd_kernel(xq_ref, xk_ref, xv_ref, g_ref, s0_ref, hq_ref, hk_ref,
                     hv_ref, wq_ref, wk_ref, wv_ref, o_ref, sf_ref, cs_ref,
                     state, *, chunk_size: int, scale: float, out_dtype,
                     conv_size: int, t_valid: int):
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    C = chunk_size

    @pl.when(c == 0)
    def _():
        state[:] = s0_ref[0].astype(jnp.float32)

    if cs_ref is not None:
        cs_ref[0, 0] = state[:].astype(cs_ref.dtype)

    cdt = xq_ref.dtype
    row1 = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    valid = ((c * C + row1) < t_valid).astype(jnp.float32)
    q, _ = _conv_apply(xq_ref[0], hq_ref[0, 0], wq_ref[0].astype(jnp.float32),
                       valid, cdt, conv_size)
    k, _ = _conv_apply(xk_ref[0], hk_ref[0, 0], wk_ref[0].astype(jnp.float32),
                       valid, cdt, conv_size)
    v, _ = _conv_apply(xv_ref[0], hv_ref[0, 0], wv_ref[0].astype(jnp.float32),
                       valid, cdt, conv_size)

    o, new_state = _fwd_math(
        q * scale,
        k,
        v.astype(cdt),
        g_ref[0].astype(jnp.float32),
        state[:],
        chunk_size=chunk_size, cdt=cdt,
    )
    o_ref[0] = o.astype(out_dtype)
    state[:] = new_state

    @pl.when(c == nc - 1)
    def _():
        # round-to-nearest-even cast in-kernel == the XLA f32->bf16 cast
        # the callers used to do outside; f32 sf is byte-identical
        sf_ref[0] = state[:].astype(sf_ref.dtype)


def _conv_kernel_infer(xq_ref, xk_ref, xv_ref, g_ref, s0_ref, hq_ref, hk_ref,
                       hv_ref, wq_ref, wk_ref, wv_ref, o_ref, sf_ref, state,
                       *, chunk_size: int, scale: float, out_dtype,
                       conv_size: int, t_valid: int):
    """Forward-only conv-fused variant: no chunk-state residual output
    (see :func:`_kernel_infer` — the dead residual buffer was the b384
    prefill OOM driver, BASELINE.md round 5)."""
    _conv_fwd_kernel(xq_ref, xk_ref, xv_ref, g_ref, s0_ref, hq_ref, hk_ref,
                     hv_ref, wq_ref, wk_ref, wv_ref, o_ref, sf_ref, None,
                     state, chunk_size=chunk_size, scale=scale,
                     out_dtype=out_dtype, conv_size=conv_size,
                     t_valid=t_valid)


def _conv_bwd_kernel(xq_ref, xk_ref, xv_ref, g_ref, cs_ref, do_ref, dsf_ref,
                     hq_ref, hk_ref, hv_ref, wq_ref, wk_ref, wv_ref,
                     dxq_ref, dxk_ref, dxv_ref, dg_ref, ds0_ref,
                     dwq_ref, dwk_ref, dwv_ref,
                     dstate, cq_z, ck_z, cv_z, awq, awk, awv,
                     *, chunk_size: int, scale: float, conv_size: int,
                     t_valid: int):
    """Reverse sweep with in-kernel conv recompute + conv backward.

    ``c*_z`` scratches carry the first _HALO rows of the NEXT (later-time)
    chunk's dz (processed on the previous grid iteration); ``aw*`` scratches
    accumulate tap grads across the sweep, written out on the last
    iteration (reduced over batch outside the partitioned call)."""
    rc = pl.program_id(1)
    nc = pl.num_programs(1)
    C = chunk_size
    W = conv_size
    c = nc - 1 - rc

    @pl.when(rc == 0)
    def _():
        dstate[:] = dsf_ref[0].astype(jnp.float32)
        for ref in (cq_z, ck_z, cv_z, awq, awk, awv):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    cdt = xq_ref.dtype
    row1 = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    valid = ((c * C + row1) < t_valid).astype(jnp.float32)
    q, zq = _conv_apply(xq_ref[0], hq_ref[0, 0], wq_ref[0].astype(jnp.float32),
                        valid, cdt, conv_size)
    k, zk = _conv_apply(xk_ref[0], hk_ref[0, 0], wk_ref[0].astype(jnp.float32),
                        valid, cdt, conv_size)
    v, zv = _conv_apply(xv_ref[0], hv_ref[0, 0], wv_ref[0].astype(jnp.float32),
                        valid, cdt, conv_size)

    dq, dk_out, dv, dg, new_dstate = _bwd_math(
        q * scale,
        k,
        v,
        g_ref[0].astype(jnp.float32),
        cs_ref[0, 0].astype(jnp.float32),
        do_ref[0].astype(jnp.float32),
        dstate[:],
        chunk_size=chunk_size, scale=scale, cdt=cdt,
    )
    dg_ref[0] = dg.astype(dg_ref.dtype)
    dstate[:] = new_dstate

    def conv_bwd(dy, z, x_ref, h_ref, w_ref, carry, accum, dx_ref):
        sig = 1.0 / (1.0 + jnp.exp(-z))
        dz = dy * (sig * (1.0 + z * (1.0 - sig))) * valid
        taps = w_ref[0].astype(jnp.float32)
        carry_rows = carry[:].astype(jnp.float32)
        # dx[s] = sum_j w_{(W-1)-j} * dz[s + j] (transposed conv; rows past
        # the chunk end come from the carried next-chunk dz)
        dx = jnp.zeros_like(dz)
        xf = x_ref[0].astype(jnp.float32)
        hf = h_ref[0, 0].astype(jnp.float32)
        upd = jnp.zeros_like(accum[:])
        for j in range(W):
            dzj = _shift_up(dz, j)
            if j:
                bottom = jnp.pad(carry_rows[:j], ((C - j, 0), (0, 0)))
                dzj = dzj + bottom
            dx = dx + taps[(W - 1) - j][None, :] * dzj
            # tap grad i = (W-1) - j: sum_t dz[t] * x[t - j]
            xi = _shift_down(xf, j)
            if j:
                top = jnp.pad(hf[_HALO - j :], ((0, C - j), (0, 0)))
                xi = xi + top
            r = jnp.sum(dz * xi, axis=0, keepdims=True)  # (1, d)
            i = (W - 1) - j
            upd = upd + jnp.pad(r, ((i, accum.shape[0] - 1 - i), (0, 0)))
        accum[:] = accum[:] + upd
        carry[:] = dz[:_HALO].astype(carry.dtype)
        dx_ref[0] = dx.astype(dx_ref.dtype)

    conv_bwd(dq, zq, xq_ref, hq_ref, wq_ref, cq_z, awq, dxq_ref)
    conv_bwd(dk_out, zk, xk_ref, hk_ref, wk_ref, ck_z, awk, dxk_ref)
    conv_bwd(dv, zv, xv_ref, hv_ref, wv_ref, cv_z, awv, dxv_ref)

    @pl.when(rc == nc - 1)
    def _():
        ds0_ref[0] = dstate[:]
        dwq_ref[0] = awq[:]
        dwk_ref[0] = awk[:]
        dwv_ref[0] = awv[:]


def _conv_fwd_impl(xq, xk, xv, gk, s0, wq, wk, wv, scale, chunk_size,
                   interpret, residual_dtype=jnp.bfloat16, t_valid=None,
                   sf_dtype=jnp.float32, save_residuals=True):
    b, h, t, dk = xq.shape
    dv = xv.shape[-1]
    C = chunk_size
    W = wq.shape[-1]
    if t_valid is None:
        t_valid = t
    xq, xk, xv, gk = _pad_inputs(xq, xk, xv, gk, C)
    T = xq.shape[2]
    nc = T // C
    bh = b * h

    rs = lambda x, d: x.reshape(bh, T, d)
    q2, k2, v2, g2 = rs(xq, dk), rs(xk, dk), rs(xv, dv), rs(gk, dk)
    s0r = s0.reshape(bh, dk, dv)
    if save_residuals:
        s0r = s0r.astype(jnp.float32)
    hq, hk, hv = _chunk_halo(q2, C), _chunk_halo(k2, C), _chunk_halo(v2, C)
    # taps (h, dh, W) -> per-(b,h) (bh, W, dh), tap row 0 = oldest
    tb = lambda w, d: jnp.broadcast_to(
        w.transpose(2, 0, 1)[None], (b, W, h, d)
    ).transpose(0, 2, 1, 3).reshape(bh, W, d)
    wqb, wkb, wvb = tb(wq, dk), tb(wk, dk), tb(wv, dv)

    if save_residuals:
        kern = functools.partial(
            _conv_fwd_kernel, chunk_size=C, scale=scale, out_dtype=xq.dtype,
            conv_size=W, t_valid=t_valid,
        )
        out_specs = [
            pl.BlockSpec((1, C, dv), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, dk, dv), lambda i, c: (i, c, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bh, T, dv), xq.dtype),
            jax.ShapeDtypeStruct((bh, dk, dv), sf_dtype),
            jax.ShapeDtypeStruct((bh, nc, dk, dv), residual_dtype),
        ]
    else:
        # inference: no dead residual buffer (see _fwd_impl)
        kern = functools.partial(
            _conv_kernel_infer, chunk_size=C, scale=scale,
            out_dtype=xq.dtype, conv_size=W, t_valid=t_valid,
        )
        out_specs = [
            pl.BlockSpec((1, C, dv), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bh, T, dv), xq.dtype),
            jax.ShapeDtypeStruct((bh, dk, dv), sf_dtype),
        ]

    outs = pl.pallas_call(
        kern,
        grid=(bh, nc),
        in_specs=[
            pl.BlockSpec((1, C, dk), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, C, dk), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, C, dv), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, C, dk), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, _HALO, dk), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, 1, _HALO, dk), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, 1, _HALO, dv), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, W, dk), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, W, dk), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, W, dv), lambda i, c: (i, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((dk, dv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q2, k2, v2, g2, s0r, hq, hk, hv, wqb, wkb, wvb)

    o = outs[0].reshape(b, h, T, dv)[:, :, :t]
    sf = outs[1].reshape(b, h, dk, dv)
    if not save_residuals:
        return o, sf
    return o, sf, outs[2].reshape(b, h, nc, dk, dv)


def _conv_bwd_impl(xq, xk, xv, gk, wq, wk, wv, chunk_states, do, dsf, scale,
                   chunk_size, interpret, t_valid=None):
    b, h, t, dk = xq.shape
    dv = xv.shape[-1]
    C = chunk_size
    W = wq.shape[-1]
    if t_valid is None:
        t_valid = t
    xq, xk, xv, gk = _pad_inputs(xq, xk, xv, gk, C)
    do = jnp.pad(do, ((0, 0), (0, 0), (0, xq.shape[2] - t), (0, 0)))
    T = xq.shape[2]
    nc = T // C
    bh = b * h

    rs = lambda x, d: x.reshape(bh, T, d)
    q2, k2, v2, g2, do2 = (rs(xq, dk), rs(xk, dk), rs(xv, dv), rs(gk, dk),
                           rs(do, dv))
    dsf2 = dsf.reshape(bh, dk, dv).astype(jnp.float32)
    chunk_states = chunk_states.reshape(bh, nc, dk, dv)
    hq, hk, hv = _chunk_halo(q2, C), _chunk_halo(k2, C), _chunk_halo(v2, C)
    tb = lambda w, d: jnp.broadcast_to(
        w.transpose(2, 0, 1)[None], (b, W, h, d)
    ).transpose(0, 2, 1, 3).reshape(bh, W, d)
    wqb, wkb, wvb = tb(wq, dk), tb(wk, dk), tb(wv, dv)

    kern = functools.partial(_conv_bwd_kernel, chunk_size=C, scale=scale,
                             conv_size=W, t_valid=t_valid)
    rev = lambda i, c: (i, nc - 1 - c, 0)
    rev4 = lambda i, c: (i, nc - 1 - c, 0, 0)
    fixed3 = lambda i, c: (i, 0, 0)
    dxq, dxk, dxv, dg, ds0, dwq_b, dwk_b, dwv_b = pl.pallas_call(
        kern,
        grid=(bh, nc),
        in_specs=[
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dv), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, 1, dk, dv), rev4),
            pl.BlockSpec((1, C, dv), rev),
            pl.BlockSpec((1, dk, dv), fixed3),
            pl.BlockSpec((1, 1, _HALO, dk), rev4),
            pl.BlockSpec((1, 1, _HALO, dk), rev4),
            pl.BlockSpec((1, 1, _HALO, dv), rev4),
            pl.BlockSpec((1, W, dk), fixed3),
            pl.BlockSpec((1, W, dk), fixed3),
            pl.BlockSpec((1, W, dv), fixed3),
        ],
        out_specs=[
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dv), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, dk, dv), fixed3),
            pl.BlockSpec((1, _HALO, dk), fixed3),
            pl.BlockSpec((1, _HALO, dk), fixed3),
            pl.BlockSpec((1, _HALO, dv), fixed3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, T, dk), xq.dtype),
            jax.ShapeDtypeStruct((bh, T, dk), xk.dtype),
            jax.ShapeDtypeStruct((bh, T, dv), xv.dtype),
            jax.ShapeDtypeStruct((bh, T, dk), gk.dtype),
            jax.ShapeDtypeStruct((bh, dk, dv), jnp.float32),
            jax.ShapeDtypeStruct((bh, _HALO, dk), jnp.float32),
            jax.ShapeDtypeStruct((bh, _HALO, dk), jnp.float32),
            jax.ShapeDtypeStruct((bh, _HALO, dv), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dk, dv), jnp.float32),
            pltpu.VMEM((_HALO, dk), jnp.float32),
            pltpu.VMEM((_HALO, dk), jnp.float32),
            pltpu.VMEM((_HALO, dv), jnp.float32),
            pltpu.VMEM((_HALO, dk), jnp.float32),
            pltpu.VMEM((_HALO, dk), jnp.float32),
            pltpu.VMEM((_HALO, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q2, k2, v2, g2, chunk_states, do2, dsf2, hq, hk, hv, wqb, wkb, wvb)

    unp = lambda x, d: x.reshape(b, h, T, d)[:, :, :t]
    # per-(b,h) tap grads; batch reduction happens OUTSIDE the partitioned
    # call so the partitioner inserts the dp psum
    dw = lambda x, d: x.reshape(b, h, _HALO, d)[:, :, :W]
    return (unp(dxq, dk), unp(dxk, dk), unp(dxv, dv), unp(dg, dk),
            ds0.reshape(b, h, dk, dv), dw(dwq_b, dk), dw(dwk_b, dk),
            dw(dwv_b, dv))


@functools.lru_cache(maxsize=None)
def _conv_fwd_partitioned(scale, chunk_size, interpret, residual_dtype,
                          t_valid, sf_dtype=jnp.float32):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(xq, xk, xv, gk, s0, wq, wk, wv):
        return _conv_fwd_impl(xq, xk, xv, gk, s0, wq, wk, wv, scale,
                              chunk_size, interpret, residual_dtype, t_valid,
                              sf_dtype)

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, ha, None, None), mk(ba, ha, None, None),
                mk(ba, ha, None, None, None))

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, ha, None, None),) * 5
                + (mk(ha, None, None),) * 3)
        outs = (mk(ba, ha, None, None), mk(ba, ha, None, None),
                mk(ba, ha, None, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h t k, b h t k, b h t v, b h t k, b h k v, "
                      "h k w, h k w, h v w "
                      "-> b h t v, b h k v, b h c k v",
        # factor order = first occurrence: t k v w (taps) then c (output)
        need_replication_factors=("t", "k", "v", "w", "c"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _conv_fwd_infer_partitioned(scale, chunk_size, interpret, t_valid,
                                sf_dtype):
    """Inference-only conv-fused forward (see _fwd_infer_partitioned)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(xq, xk, xv, gk, s0, wq, wk, wv):
        return _conv_fwd_impl(xq, xk, xv, gk, s0, wq, wk, wv, scale,
                              chunk_size, interpret, t_valid=t_valid,
                              sf_dtype=sf_dtype, save_residuals=False)

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, ha, None, None), mk(ba, ha, None, None))

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, ha, None, None),) * 5
                + (mk(ha, None, None),) * 3)
        outs = (mk(ba, ha, None, None), mk(ba, ha, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h t k, b h t k, b h t v, b h t k, b h k v, "
                      "h k w, h k w, h v w "
                      "-> b h t v, b h k v",
        need_replication_factors=("t", "k", "v", "w"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _conv_bwd_partitioned(scale, chunk_size, interpret, t_valid):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(xq, xk, xv, gk, wq, wk, wv, chunk_states, do, dsf):
        return _conv_bwd_impl(xq, xk, xv, gk, wq, wk, wv, chunk_states, do,
                              dsf, scale, chunk_size, interpret, t_valid)

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return ((mk(ba, ha, None, None),) * 4 + (mk(ba, ha, None, None),)
                + (mk(ba, ha, None, None),) * 3)

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, ha, None, None),) * 4
                + (mk(ha, None, None),) * 3
                + (mk(ba, ha, None, None, None),)
                + (mk(ba, ha, None, None),) * 2)
        outs = ((mk(ba, ha, None, None),) * 4 + (mk(ba, ha, None, None),)
                + (mk(ba, ha, None, None),) * 3)
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h t k, b h t k, b h t v, b h t k, "
                      "h k w, h k w, h v w, b h c k v, b h t v, b h k v "
                      "-> b h t k, b h t k, b h t v, b h t k, b h k v, "
                      "b h w k, b h w k, b h w v",
        need_replication_factors=("t", "k", "v", "w", "c"),
    )
    return cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _gla_chunk_conv_pallas(xq, xk, xv, gk, wq, wk, wv, s0, scale, chunk_size,
                           interpret, residual_dtype, t_valid,
                           sf_dtype=jnp.float32):
    # primal == inference: residual-free kernel (see _gla_chunk_pallas)
    o, sf = _conv_fwd_infer_partitioned(
        scale, chunk_size, interpret, t_valid, sf_dtype
    )(xq, xk, xv, gk, s0, wq, wk, wv)
    return o, sf


def _conv_vjp_fwd(xq, xk, xv, gk, wq, wk, wv, s0, scale, chunk_size,
                  interpret, residual_dtype, t_valid, sf_dtype=jnp.float32):
    o, sf, chunk_states = _conv_fwd_partitioned(
        scale, chunk_size, interpret, residual_dtype, t_valid, sf_dtype
    )(xq, xk, xv, gk, s0, wq, wk, wv)
    return (o, sf), (xq, xk, xv, gk, wq, wk, wv, chunk_states)


def _conv_vjp_bwd(scale, chunk_size, interpret, residual_dtype, t_valid,
                  sf_dtype, residuals, cotangents):
    xq, xk, xv, gk, wq, wk, wv, chunk_states = residuals
    do, dsf = cotangents
    dxq, dxk, dxv, dg, ds0, dwq_b, dwk_b, dwv_b = _conv_bwd_partitioned(
        scale, chunk_size, interpret, t_valid
    )(xq, xk, xv, gk, wq, wk, wv, chunk_states, do, dsf)
    # (b, h, W, dh) -> (h, dh, W); the batch sum crosses dp shards, XLA
    # inserts the psum from the known sharding
    tosum = lambda x: x.sum(axis=0).transpose(0, 2, 1)
    return (dxq.astype(xq.dtype), dxk.astype(xk.dtype), dxv.astype(xv.dtype),
            dg.astype(gk.dtype), tosum(dwq_b).astype(wq.dtype),
            tosum(dwk_b).astype(wk.dtype), tosum(dwv_b).astype(wv.dtype),
            ds0)


_gla_chunk_conv_pallas.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)


def gla_chunk_conv_pallas(
    xq: Array,
    xk: Array,
    xv: Array,
    gk: Array,
    conv_q_w: Array,
    conv_k_w: Array,
    conv_v_w: Array,
    initial_state: Optional[Array] = None,
    scale: Optional[float] = None,
    chunk_size: int = 128,
    interpret: Optional[bool] = None,
    residual_dtype=jnp.bfloat16,
    sf_emit_dtype=None,
) -> Tuple[Array, Array]:
    """Chunked GLA with the q/k/v short-convs fused into the kernel.

    xq/xk/xv: PRE-conv head-split projections (b, h, t, dh); conv_*_w:
    depthwise taps (full_dim, w), tap 0 oldest, silu activation, no bias
    (reference gla.py:101-108 + causal-conv1d semantics); conv state is
    zero at t=0 (causal padding). Everything else matches
    :func:`gla_chunk_pallas`. Differentiable w.r.t. all tensor inputs
    including the taps.
    """
    b, h, t, dk = xq.shape
    dv = xv.shape[-1]
    W = conv_q_w.shape[-1]
    if chunk_size < _MIN_W or (chunk_size & (chunk_size - 1)):
        raise ValueError(f"chunk_size must be a power of two >= {_MIN_W}, "
                         f"got {chunk_size}")
    if W > _HALO:
        raise ValueError(f"conv width {W} > halo {_HALO}")
    if scale is None:
        scale = dk ** -0.5
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    # see gla_chunk_pallas: f32 EMISSION + outside cast is the measured-fast
    # int8-state prefill recipe; sf always returns in state_dtype
    emit_dtype = state_dtype if sf_emit_dtype is None else sf_emit_dtype
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dk, dv), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    hs = lambda w, d: w.reshape(h, d, W)  # (full, W) -> (h, dh, W)
    o, sf = _gla_chunk_conv_pallas(
        xq, xk, xv, gk, hs(conv_q_w, dk), hs(conv_k_w, dk), hs(conv_v_w, dv),
        initial_state, scale, chunk_size, interpret, residual_dtype, t,
        emit_dtype,
    )
    if sf.dtype != state_dtype:
        sf = sf.astype(state_dtype)
    return o, sf


# ---------------------------------------------------------------- decode
_BH_BLK = int(__import__("os").environ.get(
    "GLA_BH_BLK", "8"))  # rows of (batch*heads) per program (sublane mult.)


def _decode_kernel(q_ref, k_ref, v_ref, g_ref, s_ref, o_ref, s_out_ref, *,
                   scale: float):
    """Single-pass fused decode: one state read + one state write.

    XLA's lowering of the unfused step reads the state ~3x (update read,
    update write, readout read); at decode time the state IS the bandwidth
    bill (25 layers x (b, h, 256, 512)), so one pass is ~2x. Processes
    _BH_BLK (batch*head) rows per program.
    """
    g = g_ref[:].astype(jnp.float32)  # (BLK, dk)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)  # (BLK, dv)
    q = q_ref[:].astype(jnp.float32) * scale
    S = s_ref[:].astype(jnp.float32)  # (BLK, dk, dv)
    S = jnp.exp(g)[:, :, None] * S + k[:, :, None] * v[:, None, :]
    o_ref[:] = jnp.sum(q[:, :, None] * S, axis=1).astype(o_ref.dtype)
    s_out_ref[:] = S.astype(s_out_ref.dtype)


def _decode_conv_kernel(xq_ref, xk_ref, xv_ref, g_ref, wq_ref, wk_ref, wv_ref,
                        cq_ref, ck_ref, cv_ref, s_ref,
                        o_ref, s_out_ref, cq_out, ck_out, cv_out, *,
                        scale: float, num_heads: int):
    """Conv-fused single-pass decode: the q/k/v short-conv ring updates,
    the silu taps, the GLA state update, and the readout in ONE kernel.

    The unfused path round-trips each ring buffer through HBM several times
    per token (concat writes the shifted state, the tap einsum reads it
    back, silu again) — ~1 ms/token at b64 across 25 layers (round-1
    measurement). Here each ring is read once and written once, and the
    conv outputs q/k/v never touch HBM. Conv taps arrive as the full
    (w, num_heads, d) tensor (tiny) and are tiled to the block's static
    row->head pattern (row r of a bh block is head r %% num_heads, valid
    because _BH_BLK %% num_heads == 0 — checked by the caller).
    """
    blk = xq_ref.shape[0]
    reps = blk // num_heads

    def conv(c_ref, x_ref, w_ref, out_ref):
        new_c = jnp.concatenate([c_ref[1:], x_ref[:][None]], axis=0)
        out_ref[:] = new_c
        taps = jnp.tile(w_ref[:], (1, reps, 1))  # (w, blk, d)
        y = jnp.sum(new_c.astype(jnp.float32) * taps.astype(jnp.float32),
                    axis=0)
        # match the unfused path: tap sum rounded to IO dtype, silu in f32
        y = y.astype(x_ref.dtype).astype(jnp.float32)
        return (y * (1.0 / (1.0 + jnp.exp(-y)))).astype(x_ref.dtype)

    q = conv(cq_ref, xq_ref, wq_ref, cq_out).astype(jnp.float32) * scale
    k = conv(ck_ref, xk_ref, wk_ref, ck_out).astype(jnp.float32)
    v = conv(cv_ref, xv_ref, wv_ref, cv_out).astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    S = s_ref[:].astype(jnp.float32)
    S = jnp.exp(g)[:, :, None] * S + k[:, :, None] * v[:, None, :]
    o_ref[:] = jnp.sum(q[:, :, None] * S, axis=1).astype(o_ref.dtype)
    s_out_ref[:] = S.astype(s_out_ref.dtype)


def _gla_decode_conv_impl(xq, xk, xv, gk, wq, wk, wv, cq, ck, cv, state,
                          scale, interpret, donate):
    b, h, dk = xq.shape
    dv = xv.shape[-1]
    w = cq.shape[0]
    bh = b * h
    pad = (-bh) % _BH_BLK
    q2, k2, g2 = (x.reshape(bh, dk) for x in (xq, xk, gk))
    v2 = xv.reshape(bh, dv)
    cq2, ck2 = cq.reshape(w, bh, dk), ck.reshape(w, bh, dk)
    cv2 = cv.reshape(w, bh, dv)
    s2 = state.reshape(bh, dk, dv)
    if pad:
        pz = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        pzc = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        q2, k2, g2, v2, s2 = pz(q2), pz(k2), pz(g2), pz(v2), pz(s2)
        cq2, ck2, cv2 = pzc(cq2), pzc(ck2), pzc(cv2)
    BH = bh + pad

    kern = functools.partial(_decode_conv_kernel, scale=scale, num_heads=h)
    o, s_new, cq_new, ck_new, cv_new = pl.pallas_call(
        kern,
        grid=(BH // _BH_BLK,),
        in_specs=[
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dv), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((w, h, dk), lambda i: (0, 0, 0)),
            pl.BlockSpec((w, h, dk), lambda i: (0, 0, 0)),
            pl.BlockSpec((w, h, dv), lambda i: (0, 0, 0)),
            pl.BlockSpec((w, _BH_BLK, dk), lambda i: (0, i, 0)),
            pl.BlockSpec((w, _BH_BLK, dk), lambda i: (0, i, 0)),
            pl.BlockSpec((w, _BH_BLK, dv), lambda i: (0, i, 0)),
            pl.BlockSpec((_BH_BLK, dk, dv), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BH_BLK, dv), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk, dv), lambda i: (i, 0, 0)),
            pl.BlockSpec((w, _BH_BLK, dk), lambda i: (0, i, 0)),
            pl.BlockSpec((w, _BH_BLK, dk), lambda i: (0, i, 0)),
            pl.BlockSpec((w, _BH_BLK, dv), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, dv), xq.dtype),
            jax.ShapeDtypeStruct((BH, dk, dv), state.dtype),
            jax.ShapeDtypeStruct((w, BH, dk), cq.dtype),
            jax.ShapeDtypeStruct((w, BH, dk), ck.dtype),
            jax.ShapeDtypeStruct((w, BH, dv), cv.dtype),
        ],
        input_output_aliases=(
            {10: 1, 7: 2, 8: 3, 9: 4} if donate else {}
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q2, k2, v2, g2, wq, wk, wv, cq2, ck2, cv2, s2)
    unc = lambda x, d: x[:, :bh].reshape(w, b, h, d)
    return (o[:bh].reshape(b, h, dv), s_new[:bh].reshape(b, h, dk, dv),
            unc(cq_new, dk), unc(ck_new, dk), unc(cv_new, dv))


def _rwkv6_decode_kernel(r_ref, k_ref, v_ref, w_ref, u_ref, s_ref,
                         o_ref, s_out_ref):
    """Single-pass RWKV6 decode: o reads the PRE-update state + u bonus
    (ops/rwkv6.py semantics), one state read + one state write."""
    w = w_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    r = r_ref[:].astype(jnp.float32)
    u = u_ref[:].astype(jnp.float32)
    S = s_ref[:].astype(jnp.float32)
    kv = k[:, :, None] * v[:, None, :]
    o = jnp.sum(r[:, :, None] * (S + u[:, :, None] * kv), axis=1)
    o_ref[:] = o.astype(o_ref.dtype)
    s_out_ref[:] = (jnp.exp(w)[:, :, None] * S + kv).astype(s_out_ref.dtype)


def _rwkv6_decode_impl(r, k, v, w, u, state, interpret, donate):
    b, h, dk = r.shape
    dv = v.shape[-1]
    bh = b * h
    pad = (-bh) % _BH_BLK
    r2, k2, w2 = (x.reshape(bh, dk) for x in (r, k, w))
    v2 = v.reshape(bh, dv)
    u2 = jnp.tile(u, (b, 1))  # (bh, dk): per-head bonus expanded per row
    s2 = state.reshape(bh, dk, dv)
    if pad:
        pz = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        r2, k2, w2, v2, u2, s2 = pz(r2), pz(k2), pz(w2), pz(v2), pz(u2), pz(s2)
    BH = bh + pad

    o, s_new = pl.pallas_call(
        _rwkv6_decode_kernel,
        grid=(BH // _BH_BLK,),
        in_specs=[
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dv), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk, dv), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BH_BLK, dv), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk, dv), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, dv), r.dtype),
            jax.ShapeDtypeStruct((BH, dk, dv), state.dtype),
        ],
        input_output_aliases={5: 1} if donate else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(r2, k2, v2, w2, u2, s2)
    return o[:bh].reshape(b, h, dv), s_new[:bh].reshape(b, h, dk, dv)


def _gla_decode_impl(q, k, v, gk, state, scale, interpret, donate):
    b, h, dk = q.shape
    dv = v.shape[-1]
    bh = b * h
    pad = (-bh) % _BH_BLK
    q2, k2, g2 = (x.reshape(bh, dk) for x in (q, k, gk))
    v2 = v.reshape(bh, dv)
    s2 = state.reshape(bh, dk, dv)
    if pad:
        pz = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        q2, k2, g2, v2, s2 = pz(q2), pz(k2), pz(g2), pz(v2), pz(s2)
    BH = bh + pad

    o, s_new = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale),
        grid=(BH // _BH_BLK,),
        in_specs=[
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dv), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk, dv), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BH_BLK, dv), lambda i: (i, 0)),
            pl.BlockSpec((_BH_BLK, dk, dv), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, dv), q.dtype),
            jax.ShapeDtypeStruct((BH, dk, dv), state.dtype),
        ],
        input_output_aliases={4: 1} if donate else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # bh rows are independent
        ),
        interpret=interpret,
    )(q2, k2, v2, g2, s2)
    o = o[:bh].reshape(b, h, dv)
    return o, s_new[:bh].reshape(b, h, dk, dv)

@functools.lru_cache(maxsize=None)
def _gla_decode_partitioned(scale, interpret, donate):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(q, k, v, gk, state):
        return _gla_decode_impl(q, k, v, gk, state, scale, interpret, donate)

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return mk(ba, ha, None), mk(ba, ha, None, None)

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = (mk(ba, ha, None),) * 4 + (mk(ba, ha, None, None),)
        outs = (mk(ba, ha, None), mk(ba, ha, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h k, b h k, b h v, b h k, b h k v "
                      "-> b h v, b h k v",
        need_replication_factors=("k", "v"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _gla_decode_conv_partitioned(scale, interpret, donate):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(xq, xk, xv, gk, wq, wk, wv, cq, ck, cv, state):
        return _gla_decode_conv_impl(xq, xk, xv, gk, wq, wk, wv, cq, ck, cv,
                                     state, scale, interpret, donate)

    cp = custom_partitioning(fn)

    def outs_for(mesh, arg_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, ha, None), mk(ba, ha, None, None),
                mk(None, ba, ha, None), mk(None, ba, ha, None),
                mk(None, ba, ha, None))

    def infer(mesh, arg_infos, result_infos):
        return outs_for(mesh, arg_infos)

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, ha, None),) * 4            # xq xk xv gk
                + (mk(None, ha, None),) * 3        # conv taps (w, h, d)
                + (mk(None, ba, ha, None),) * 3    # rings (w, b, h, d)
                + (mk(ba, ha, None, None),))       # state
        return mesh, fn, outs_for(mesh, arg_infos), args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h k, b h k, b h v, b h k, w h k, w h k, w h v, "
                      "w b h k, w b h k, w b h v, b h k v "
                      "-> b h v, b h k v, w b h k, w b h k, w b h v",
        need_replication_factors=("k", "v", "w"),
    )
    return cp


def gla_decode_conv_fused(
    xq: Array, xk: Array, xv: Array, gk: Array,
    wq: Array, wk: Array, wv: Array,
    cq: Array, ck: Array, cv: Array, state: Array,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    donate: bool = True,
) -> Tuple[Array, Array, Array, Array, Array]:
    """Conv-fused single-token GLA step.

    Fuses the q/k/v depthwise short-conv ring updates + silu (reference
    gla.py:146-163 / causal-conv1d decode path) into the single-pass state
    kernel: every ring buffer is read and written exactly once per token
    and the conv outputs never reach HBM.

    xq/xk/gk: (b, h, dk) PRE-conv projections (+ gates); xv: (b, h, dv);
    wq/wk: (w, h, dk), wv: (w, h, dv) conv taps, tap 0 = oldest;
    cq/ck: (w, b, h, dk), cv: (w, b, h, dv) time-major rings;
    state: (b, h, dk, dv). Requires _BH_BLK %% num_heads == 0 (the in-block
    row->head pattern must be static). Returns (o, state, cq, ck, cv).
    """
    h = xq.shape[1]
    if _BH_BLK % h:
        raise ValueError(
            f"gla_decode_conv_fused needs num_heads to divide {_BH_BLK}")
    if scale is None:
        scale = xq.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _gla_decode_conv_partitioned(scale, interpret, donate)(
        xq, xk, xv, gk, wq, wk, wv, cq, ck, cv, state)


@functools.lru_cache(maxsize=None)
def _rwkv6_decode_partitioned(interpret, donate):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(r, k, v, w, u, state):
        return _rwkv6_decode_impl(r, k, v, w, u, state, interpret, donate)

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return mk(ba, ha, None), mk(ba, ha, None, None)

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, ha, None),) * 4
                + (mk(ha, None),)            # u: (h, dk) per-head bonus
                + (mk(ba, ha, None, None),))
        outs = (mk(ba, ha, None), mk(ba, ha, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h k, b h k, b h v, b h k, h k, b h k v "
                      "-> b h v, b h k v",
        need_replication_factors=("k", "v"),
    )
    return cp


def gla_decode_fused(
    q: Array, k: Array, v: Array, gk: Array, state: Array,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    donate: bool = True,
) -> Tuple[Array, Array]:
    """Fused single-token GLA step (drop-in for ops.gla.gla_decode_step).

    q/k/gk: (b, h, dk); v: (b, h, dv); state: (b, h, dk, dv) any float dtype
    (bf16 halves the traffic). The state buffer is aliased in-place. Carries
    the same (batch, heads) custom-partitioning rule as the chunk kernel,
    so sharded generation keeps the state distributed."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _gla_decode_partitioned(scale, interpret, donate)(q, k, v, gk, state)


def rwkv6_decode_fused(
    r: Array, k: Array, v: Array, w: Array, u: Array, state: Array,
    interpret: Optional[bool] = None,
    donate: bool = True,
) -> Tuple[Array, Array]:
    """Fused single-token RWKV6 step (drop-in for ops.rwkv6.rwkv6_decode_step).

    r/k/w: (b, h, dk); v: (b, h, dv); u: (h, dk); state: (b, h, dk, dv).
    Same (batch, heads) custom-partitioning rule as the GLA decode."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _rwkv6_decode_partitioned(interpret, donate)(r, k, v, w, u, state)


# --------------------------------------------------------------------------
# Lazy micro-chunk decode kernels (the b64 default path).
#
# Between folds the recurrent state is READ-ONLY (ops/gla.py:
# gla_decode_lazy_step); the XLA lowering of that step runs the S readout as
# a VPU multiply-reduce at ~620 GB/s effective and scatters the ring/buffer
# updates over many small fusions (scripts/probe_lazy_readout.py +
# profile_decode.py, round 3). These kernels fuse, per token:
#   q/k/v short-conv ring update + silu  (one HBM pass per ring)
#   window-buffer append at position p   (scalar-prefetched)
#   readout: (q*exp(cc)) @ S on the MXU  (S consumed bf16, f32 accumulate —
#                                         no f32 materialization of S)
#   intra-window corrections             (VPU, (L, dk) per row)
# and, once per window, the fold: S <- exp(cc) * S + (k*dec)^T v with the
# rank-L update on the MXU.


def _lazy_conv_kernel(p_ref, xq_ref, xk_ref, xv_ref, g_ref,
                      wq_ref, wk_ref, wv_ref,
                      cq_ref, ck_ref, cv_ref, s_ref, ss_ref,
                      kb_ref, vb_ref, cb_ref, cc_ref,
                      o_ref, cq_out, ck_out, cv_out,
                      kb_out, vb_out, cb_out, cc_out, *,
                      scale: float, num_heads: int):
    blk = xq_ref.shape[0]
    reps = blk // num_heads
    L = kb_ref.shape[0]
    p = p_ref[0]

    def conv(c_ref, x_ref, w_ref, out_ref):
        new_c = jnp.concatenate([c_ref[1:], x_ref[:][None]], axis=0)
        out_ref[:] = new_c
        taps = jnp.tile(w_ref[:], (1, reps, 1))  # (w, blk, d)
        y = jnp.sum(new_c.astype(jnp.float32) * taps.astype(jnp.float32),
                    axis=0)
        y = y.astype(x_ref.dtype).astype(jnp.float32)
        return y * (1.0 / (1.0 + jnp.exp(-y)))

    q = conv(cq_ref, xq_ref, wq_ref, cq_out) * scale   # (blk, dk) f32
    k = conv(ck_ref, xk_ref, wk_ref, ck_out)
    v = conv(cv_ref, xv_ref, wv_ref, cv_out)
    g = g_ref[:].astype(jnp.float32)
    cc = cc_ref[:].astype(jnp.float32) + g             # (blk, dk)
    cc_out[:] = cc

    # append slot p: outputs are (1, blk, d) blocks DMA'd to row p only
    # (the buffers alias in->out, so rows != p stay in place in HBM; a
    # full-buffer rewrite cost ~7 MB/layer/token of write DMA — measured)
    sel = jax.lax.broadcasted_iota(jnp.int32, (L, 1, 1), 0) == p
    kb = jnp.where(sel, k.astype(kb_ref.dtype)[None], kb_ref[:])
    vb = jnp.where(sel, v.astype(vb_ref.dtype)[None], vb_ref[:])
    cb = jnp.where(sel, cc.astype(cb_ref.dtype)[None], cb_ref[:])
    kb_out[:] = k.astype(kb_out.dtype)[None]
    vb_out[:] = v.astype(vb_out.dtype)[None]
    cb_out[:] = cc.astype(cb_out.dtype)[None]

    # base readout: one batched (blk, 1, dk) @ (blk, dk, dv) MXU dot.
    # (Measured: per-row loop == batched dot == 131 us/layer; a VPU
    # multiply-reduce is WORSE, 154 us — the (blk, dk, dv) f32
    # temporaries thrash VMEM.)
    # per-row state scale rides the query (ones when S is bf16; the
    # dequant scale when S is stored int8 — state_quant="int8")
    q_eff = (q * jnp.exp(cc)
             * ss_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    s_blk = s_ref[:].astype(jnp.bfloat16)              # int8 -> exact
    o = jax.lax.dot_general(
        q_eff[:, None, :], s_blk,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0]      # (blk, dv)

    # intra-window corrections: slots j <= p (clamp keeps stale exp args <= 0)
    live = (jax.lax.broadcasted_iota(jnp.int32, (L, 1, 1), 0) <= p)
    w = jnp.exp(jnp.minimum(cc[None] - cb.astype(jnp.float32), 0.0))
    w = jnp.where(live, w, 0.0)                        # (L, blk, dk)
    a = jnp.sum(q[None] * kb.astype(jnp.float32) * w, axis=2)   # (L, blk)
    o = o + jnp.sum(a[:, :, None] * vb.astype(jnp.float32), axis=0)
    o_ref[:] = o.astype(o_ref.dtype)


def _gla_lazy_conv_impl(xq, xk, xv, gk, wq, wk, wv, cq, ck, cv, state,
                        s_scale, kbuf, vbuf, cbuf, cc, p, scale, interpret,
                        donate):
    b, h, dk = xq.shape
    dv = xv.shape[-1]
    w = cq.shape[0]
    L = kbuf.shape[0]
    bh = b * h
    pad = (-bh) % _BH_BLK
    q2, k2, g2 = (x.reshape(bh, dk) for x in (xq, xk, gk))
    v2 = xv.reshape(bh, dv)
    cq2, ck2 = cq.reshape(w, bh, dk), ck.reshape(w, bh, dk)
    cv2 = cv.reshape(w, bh, dv)
    s2 = state.reshape(bh, dk, dv)
    ss2 = s_scale.reshape(bh, dk)
    kb2, cb2 = kbuf.reshape(L, bh, dk), cbuf.reshape(L, bh, dk)
    vb2 = vbuf.reshape(L, bh, dv)
    cc2 = cc.reshape(bh, dk)
    if pad:
        pz = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        pzc = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        q2, k2, g2, v2, s2, cc2 = (pz(x) for x in (q2, k2, g2, v2, s2, cc2))
        ss2 = pz(ss2)
        cq2, ck2, cv2 = pzc(cq2), pzc(ck2), pzc(cv2)
        kb2, vb2, cb2 = pzc(kb2), pzc(vb2), pzc(cb2)
    BH = bh + pad

    kern = functools.partial(_lazy_conv_kernel, scale=scale, num_heads=h)
    row = lambda i, p_ref: (i, 0)
    tm = lambda i, p_ref: (0, i, 0)     # (time/window, bh, d) blocks
    full = lambda i, p_ref: (0, 0, 0)
    s_ix = lambda i, p_ref: (i, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH // _BH_BLK,),
        in_specs=[
            pl.BlockSpec((_BH_BLK, dk), row),
            pl.BlockSpec((_BH_BLK, dk), row),
            pl.BlockSpec((_BH_BLK, dv), row),
            pl.BlockSpec((_BH_BLK, dk), row),
            pl.BlockSpec((w, h, dk), full),
            pl.BlockSpec((w, h, dk), full),
            pl.BlockSpec((w, h, dv), full),
            pl.BlockSpec((w, _BH_BLK, dk), tm),
            pl.BlockSpec((w, _BH_BLK, dk), tm),
            pl.BlockSpec((w, _BH_BLK, dv), tm),
            pl.BlockSpec((_BH_BLK, dk, dv), s_ix),
            pl.BlockSpec((_BH_BLK, dk), row),
            pl.BlockSpec((L, _BH_BLK, dk), tm),
            pl.BlockSpec((L, _BH_BLK, dv), tm),
            pl.BlockSpec((L, _BH_BLK, dk), tm),
            pl.BlockSpec((_BH_BLK, dk), row),
        ],
        out_specs=[
            pl.BlockSpec((_BH_BLK, dv), row),
            pl.BlockSpec((w, _BH_BLK, dk), tm),
            pl.BlockSpec((w, _BH_BLK, dk), tm),
            pl.BlockSpec((w, _BH_BLK, dv), tm),
            # window buffers: write ONLY slot p (scalar-prefetch index);
            # rows != p stay in place via the in->out aliasing
            pl.BlockSpec((1, _BH_BLK, dk), lambda i, p_ref: (p_ref[0], i, 0)),
            pl.BlockSpec((1, _BH_BLK, dv), lambda i, p_ref: (p_ref[0], i, 0)),
            pl.BlockSpec((1, _BH_BLK, dk), lambda i, p_ref: (p_ref[0], i, 0)),
            pl.BlockSpec((_BH_BLK, dk), row),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((BH, dv), xq.dtype),
        jax.ShapeDtypeStruct((w, BH, dk), cq.dtype),
        jax.ShapeDtypeStruct((w, BH, dk), ck.dtype),
        jax.ShapeDtypeStruct((w, BH, dv), cv.dtype),
        jax.ShapeDtypeStruct((L, BH, dk), kbuf.dtype),
        jax.ShapeDtypeStruct((L, BH, dv), vbuf.dtype),
        jax.ShapeDtypeStruct((L, BH, dk), cbuf.dtype),
        jax.ShapeDtypeStruct((BH, dk), cc.dtype),
    ]
    # +1: scalar-prefetch arg shifts input indices. Window-buffer aliasing
    # (12->4, 13->5, 14->6) is MANDATORY: the kernel writes only slot p of
    # each buffer, the other rows must be the input's (XLA inserts a copy
    # if the caller keeps the input alive — donation makes it true
    # in-place).
    aliases = {13: 4, 14: 5, 15: 6}
    if donate:
        aliases.update({8: 1, 9: 2, 10: 3, 16: 7})
    o, cq_n, ck_n, cv_n, kb_n, vb_n, cb_n, cc_n = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(p, jnp.int32).reshape(1), q2, k2, v2, g2, wq, wk, wv,
      cq2, ck2, cv2, s2, ss2, kb2, vb2, cb2, cc2)
    unc = lambda x, d: x[:, :bh].reshape(x.shape[0], b, h, d)
    return (o[:bh].reshape(b, h, dv),
            unc(cq_n, dk), unc(ck_n, dk), unc(cv_n, dv),
            unc(kb_n, dk), unc(vb_n, dv), unc(cb_n, dk),
            cc_n[:bh].reshape(b, h, dk))


def _lazy_fold_kernel(s_ref, kb_ref, vb_ref, cb_ref, cc_ref, s_out_ref):
    cc = cc_ref[:].astype(jnp.float32)                 # (blk, dk)
    dec = jnp.exp(jnp.minimum(
        cc[None] - cb_ref[:].astype(jnp.float32), 0.0))  # (L, blk, dk)
    kdec = (kb_ref[:].astype(jnp.float32) * dec).astype(jnp.bfloat16)
    vb = vb_ref[:]                                     # (L, blk, dv) bf16
    decay = jnp.exp(cc)
    # batched rank-L MXU update: (blk, dk, L) @ (blk, L, dv). Measured 427
    # us/layer-fold at every block size (VMEM limits incl. 100 MB make no
    # difference); a VPU outer-product loop is worse (611 us — f32
    # temporaries thrash VMEM). The K=L dot is latency-bound, so the
    # per-token remedy is a LARGER window (amortize folds), not a faster
    # fold.
    upd = jax.lax.dot_general(
        kdec.transpose(1, 2, 0), vb.transpose(1, 0, 2),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (blk, dk, dv)
    s_new = decay[:, :, None] * s_ref[:].astype(jnp.float32) + upd
    s_out_ref[:] = s_new.astype(s_out_ref.dtype)


_FOLD_BLK = int(__import__("os").environ.get("GLA_FOLD_BLK", "8"))


def _gla_lazy_fold_impl(state, kbuf, vbuf, cbuf, cc, interpret, donate):
    b, h, dk, dv = state.shape
    L = kbuf.shape[0]
    bh = b * h
    pad = (-bh) % _FOLD_BLK
    s2 = state.reshape(bh, dk, dv)
    kb2, cb2 = kbuf.reshape(L, bh, dk), cbuf.reshape(L, bh, dk)
    vb2 = vbuf.reshape(L, bh, dv)
    cc2 = cc.reshape(bh, dk)
    if pad:
        pz = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        pzc = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        s2, cc2 = pz(s2), pz(cc2)
        kb2, vb2, cb2 = pzc(kb2), pzc(vb2), pzc(cb2)
    BH = bh + pad

    row = lambda i: (i, 0)
    tm = lambda i: (0, i, 0)
    s_new = pl.pallas_call(
        _lazy_fold_kernel,
        grid=(BH // _FOLD_BLK,),
        in_specs=[
            pl.BlockSpec((_FOLD_BLK, dk, dv), lambda i: (i, 0, 0)),
            pl.BlockSpec((L, _FOLD_BLK, dk), tm),
            pl.BlockSpec((L, _FOLD_BLK, dv), tm),
            pl.BlockSpec((L, _FOLD_BLK, dk), tm),
            pl.BlockSpec((_FOLD_BLK, dk), row),
        ],
        out_specs=pl.BlockSpec((_FOLD_BLK, dk, dv), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, dk, dv), state.dtype),
        input_output_aliases={0: 0} if donate else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(s2, kb2, vb2, cb2, cc2)
    return s_new[:bh].reshape(b, h, dk, dv)


def _lazy_fold_q_kernel(s_ref, ss_ref, kb_ref, vb_ref, cb_ref, cc_ref,
                        s_out_ref, ss_out_ref):
    """Int8-state fold: dequant rows, chunk-scan update, fresh per-row
    requantization (contract of ops/gla.py:gla_decode_lazy_fold_q)."""
    cc = cc_ref[:].astype(jnp.float32)                 # (blk, dk)
    dec = jnp.exp(jnp.minimum(
        cc[None] - cb_ref[:].astype(jnp.float32), 0.0))  # (L, blk, dk)
    kdec = (kb_ref[:].astype(jnp.float32) * dec).astype(jnp.bfloat16)
    vb = vb_ref[:]                                     # (L, blk, dv) bf16
    upd = jax.lax.dot_general(
        kdec.transpose(1, 2, 0), vb.transpose(1, 0, 2),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (blk, dk, dv)
    decay_sc = jnp.exp(cc) * ss_ref[:].astype(jnp.float32)
    s_new = decay_sc[:, :, None] * s_ref[:].astype(jnp.float32) + upd
    sc = jnp.maximum(jnp.max(jnp.abs(s_new), axis=-1), 1e-30) / 127.0
    s_q = jnp.clip(jnp.round(s_new / sc[:, :, None]), -127, 127)
    s_out_ref[:] = s_q.astype(jnp.int8)
    ss_out_ref[:] = sc


def _gla_lazy_fold_q_impl(state, s_scale, kbuf, vbuf, cbuf, cc, interpret,
                          donate):
    b, h, dk, dv = state.shape
    L = kbuf.shape[0]
    bh = b * h
    pad = (-bh) % _FOLD_BLK
    s2 = state.reshape(bh, dk, dv)
    ss2 = s_scale.reshape(bh, dk)
    kb2, cb2 = kbuf.reshape(L, bh, dk), cbuf.reshape(L, bh, dk)
    vb2 = vbuf.reshape(L, bh, dv)
    cc2 = cc.reshape(bh, dk)
    if pad:
        pz = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        pzc = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        s2, ss2, cc2 = pz(s2), pz(ss2), pz(cc2)
        kb2, vb2, cb2 = pzc(kb2), pzc(vb2), pzc(cb2)
    BH = bh + pad

    row = lambda i: (i, 0)
    tm = lambda i: (0, i, 0)
    s_q, ss_n = pl.pallas_call(
        _lazy_fold_q_kernel,
        grid=(BH // _FOLD_BLK,),
        in_specs=[
            pl.BlockSpec((_FOLD_BLK, dk, dv), lambda i: (i, 0, 0)),
            pl.BlockSpec((_FOLD_BLK, dk), row),
            pl.BlockSpec((L, _FOLD_BLK, dk), tm),
            pl.BlockSpec((L, _FOLD_BLK, dv), tm),
            pl.BlockSpec((L, _FOLD_BLK, dk), tm),
            pl.BlockSpec((_FOLD_BLK, dk), row),
        ],
        out_specs=[
            pl.BlockSpec((_FOLD_BLK, dk, dv), lambda i: (i, 0, 0)),
            pl.BlockSpec((_FOLD_BLK, dk), row),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, dk, dv), jnp.int8),
            jax.ShapeDtypeStruct((BH, dk), jnp.float32),
        ],
        input_output_aliases={0: 0, 1: 1} if donate else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(s2, ss2, kb2, vb2, cb2, cc2)
    return (s_q[:bh].reshape(b, h, dk, dv),
            ss_n[:bh].reshape(b, h, dk))


@functools.lru_cache(maxsize=None)
def _gla_lazy_fold_q_partitioned(interpret, donate):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(state, s_scale, kbuf, vbuf, cbuf, cc):
        return _gla_lazy_fold_q_impl(state, s_scale, kbuf, vbuf, cbuf, cc,
                                     interpret, donate)

    cp = custom_partitioning(fn)

    def outs_for(mesh, arg_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, ha, None, None), mk(ba, ha, None))

    def infer(mesh, arg_infos, result_infos):
        return outs_for(mesh, arg_infos)

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = (mk(ba, ha, None, None), mk(ba, ha, None),
                mk(None, ba, ha, None), mk(None, ba, ha, None),
                mk(None, ba, ha, None), mk(ba, ha, None))
        return mesh, fn, outs_for(mesh, arg_infos), args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h k v, b h k, l b h k, l b h v, l b h k, b h k "
                      "-> b h k v, b h k",
        need_replication_factors=("k", "v", "l"),
    )
    return cp


def gla_fold_fused_q(
    state: Array, s_scale: Array, kbuf: Array, vbuf: Array, cbuf: Array,
    cc: Array,
    interpret: Optional[bool] = None,
    donate: bool = True,
) -> Tuple[Array, Array]:
    """Int8-state fused fold: returns (state_int8, s_scale) freshly
    row-requantized (quality knob; ops/gla.py:quantize_state_rows)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _gla_lazy_fold_q_partitioned(interpret, donate)(
        state, s_scale, kbuf, vbuf, cbuf, cc)


@functools.lru_cache(maxsize=None)
def _gla_lazy_conv_partitioned(scale, interpret, donate):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(xq, xk, xv, gk, wq, wk, wv, cq, ck, cv, state, s_scale,
           kbuf, vbuf, cbuf, cc, p):
        return _gla_lazy_conv_impl(xq, xk, xv, gk, wq, wk, wv, cq, ck, cv,
                                   state, s_scale, kbuf, vbuf, cbuf, cc, p,
                                   scale, interpret, donate)

    cp = custom_partitioning(fn)

    def outs_for(mesh, arg_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, ha, None),
                mk(None, ba, ha, None), mk(None, ba, ha, None),
                mk(None, ba, ha, None),
                mk(None, ba, ha, None), mk(None, ba, ha, None),
                mk(None, ba, ha, None), mk(ba, ha, None))

    def infer(mesh, arg_infos, result_infos):
        return outs_for(mesh, arg_infos)

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, ha, None),) * 4            # xq xk xv gk
                + (mk(None, ha, None),) * 3        # conv taps
                + (mk(None, ba, ha, None),) * 3    # rings
                + (mk(ba, ha, None, None),)        # state
                + (mk(ba, ha, None),)              # s_scale
                + (mk(None, ba, ha, None),) * 3    # kbuf vbuf cbuf
                + (mk(ba, ha, None),)              # cc
                + (mk(),))                         # p (replicated scalar)
        return mesh, fn, outs_for(mesh, arg_infos), args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h k, b h k, b h v, b h k, w h k, w h k, w h v, "
                      "w b h k, w b h k, w b h v, b h k v, b h k, "
                      "l b h k, l b h v, l b h k, b h k, s "
                      "-> b h v, w b h k, w b h k, w b h v, "
                      "l b h k, l b h v, l b h k, b h k",
        need_replication_factors=("k", "v", "w", "l", "s"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _gla_lazy_fold_partitioned(interpret, donate):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(state, kbuf, vbuf, cbuf, cc):
        return _gla_lazy_fold_impl(state, kbuf, vbuf, cbuf, cc,
                                   interpret, donate)

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        return NamedSharding(mesh, P(ba, ha, None, None))

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = (mk(ba, ha, None, None),
                mk(None, ba, ha, None), mk(None, ba, ha, None),
                mk(None, ba, ha, None), mk(ba, ha, None))
        return mesh, fn, mk(ba, ha, None, None), args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h k v, l b h k, l b h v, l b h k, b h k "
                      "-> b h k v",
        need_replication_factors=("k", "v", "l"),
    )
    return cp


def gla_decode_lazy_conv_fused(
    xq: Array, xk: Array, xv: Array, gk: Array,
    wq: Array, wk: Array, wv: Array,
    cq: Array, ck: Array, cv: Array, state: Array,
    kbuf: Array, vbuf: Array, cbuf: Array, cc: Array, p: Array,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    donate: bool = True,
    s_scale: Optional[Array] = None,
):
    """Fused lazy micro-chunk decode step (contract of
    ops.gla.gla_decode_lazy_step + the conv rings of gla_decode_conv_fused).

    One HBM pass over every operand; the recurrent state is READ-ONLY and
    consumed straight into an MXU readout. ``state`` may be bf16/f32 or —
    with ``s_scale`` (b, h, dk) — int8 row-quantized
    (ops/gla.py:quantize_state_rows); the scale rides the query for free.
    Returns (o, cq, ck, cv, kbuf, vbuf, cbuf, cc).
    """
    h = xq.shape[1]
    if _BH_BLK % h:
        raise ValueError(
            f"gla_decode_lazy_conv_fused needs num_heads to divide {_BH_BLK}")
    if scale is None:
        scale = xq.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if s_scale is None:
        s_scale = jnp.ones(state.shape[:-1], jnp.float32)
    p = jnp.asarray(p, jnp.int32).reshape(1)  # rank-1 for the sharding rule
    return _gla_lazy_conv_partitioned(scale, interpret, donate)(
        xq, xk, xv, gk, wq, wk, wv, cq, ck, cv, state, s_scale, kbuf, vbuf,
        cbuf, cc, p)


def gla_fold_fused(
    state: Array, kbuf: Array, vbuf: Array, cbuf: Array, cc: Array,
    interpret: Optional[bool] = None,
    donate: bool = True,
) -> Array:
    """Fused lazy-window fold (contract of ops.gla.gla_decode_lazy_fold's
    state update): S <- exp(cc) * S + (k*dec)^T v, rank-L update on the MXU,
    one state read + one write. Returns the new state only; buffers stay
    STALE by contract (the caller resets cc; the step masks slots j > p
    and every slot is rewritten before the next fold), so it must only be
    called on a full window."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _gla_lazy_fold_partitioned(interpret, donate)(
        state, kbuf, vbuf, cbuf, cc)
