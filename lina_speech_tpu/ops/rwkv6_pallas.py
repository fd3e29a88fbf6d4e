"""Pallas TPU kernel for the chunked RWKV-6 scan (training fwd + bwd).

TPU-native counterpart of the reference's FLA RWKV6Attention Triton kernels
(imported at reference model/rwkv6.py:11; not in tree — the contract is
ops/rwkv6.py's scan oracle). Same architecture as the GLA chunk kernel
(ops/gla_pallas.py: dyadic masked-matmul intra decomposition, fp32 VMEM
state carry over a sequential chunk grid, chunk-start states saved as
backward residuals, custom-partitioning over batch x heads), with the three
RWKV-6 deltas:

- the readout sees the PRE-update state, so every r-side decay uses the
  EXCLUSIVE gate cumsum ``bx_t = b_t - w_t`` (still <= 0 in every exp:
  for pairs s < t, ``bx_t - b_s = b_{t-1} - b_s <= 0``);
- the diagonal (s == t) pairwise term is the bonus ``(sum_d r u k) v_t``
  — it rides the band loop as the j == 0 entry with the decay factor
  replaced by ``u``;
- no 1/sqrt(dk) query scaling.

Backward: identical sweep to the GLA backward, except the gate cotangent
splits into an inclusive part (k-side decays, state update: ``-k*H`` and
the btot extras) and an exclusive part (r-side decays: ``r*(lam*M + G)``):
``dw = triu_inc @ db_inc + triu_strict @ db_exc`` — a w_j placed at j
reaches b_t for t >= j but bx_t only for t > j. The bonus contributes
dr/dk plus a ``du`` accumulated in VMEM scratch across the sequential
chunk grid, emitted per (batch, head) row, and reduced to (h, dk) outside
the partitioned call (data-parallel sharding turns that into one psum).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lina_speech_tpu.ops.gla_pallas import (
    _BAND,
    _MIN_W,
    _bh_axes,
    _dyadic_levels,
    _level_factors,
    _pad_inputs,
    _shift_down,
    _shift_up,
)

Array = jnp.ndarray


def _fwd_kernel(r_ref, k_ref, v_ref, w_ref, u_ref, s0_ref,
                o_ref, sf_ref, cs_ref, state, *, chunk_size: int, out_dtype):
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    C = chunk_size

    @pl.when(c == 0)
    def _():
        state[:] = s0_ref[0].astype(jnp.float32)

    if cs_ref is not None:
        cs_ref[0, 0] = state[:].astype(cs_ref.dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    tril_inc = (row >= col).astype(jnp.float32)

    g = w_ref[0].astype(jnp.float32)  # (C, dk) log-decays <= 0
    bcum = jnp.dot(tril_inc, g, preferred_element_type=jnp.float32)
    bx = bcum - g  # exclusive cumsum (readout decay)
    btot = bcum[C - 1 : C, :]

    cdt = r_ref.dtype
    r = r_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(cdt)
    u = u_ref[0].astype(jnp.float32)  # (1, dk)

    # ---- inter: pre-update readout against the carried chunk-start state
    o = jnp.dot((r * jnp.exp(bx)).astype(cdt), state[:].astype(cdt),
                preferred_element_type=jnp.float32)

    # ---- intra A: dyadic levels on the exclusive r-side cumsum (MXU) ...
    A = jnp.zeros((C, C), jnp.float32)
    for wlev in _dyadic_levels(C):
        qe, ke = _level_factors(bcum, row1, wlev, q_cum=bx)
        mask_w = ((row // wlev) == (col // wlev)).astype(jnp.float32)
        A += jax.lax.dot_general(
            (r * qe).astype(cdt), (k * ke).astype(cdt),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * mask_w
    # ... + near band: j == 0 is the u bonus; j >= 1 uses exp(bx_t - b_{t-j})
    # = prod_{1<=i<j} exp(g_{t-i}) — identically 1 at j == 1 (exclusive
    # cumsum), shifted products of ONE exp(g) above; rows t < j get 0
    # instead of junk, masked by the zero k/v shifts and m_j regardless.
    eg1 = _shift_down(jnp.exp(g), 1) if _BAND > 2 else None
    Ej = 1.0
    for j in range(_BAND):
        kj = _shift_down(k, j)
        if j == 2:
            Ej = eg1
        elif j > 2:
            Ej = Ej * _shift_down(eg1, j - 2)
        a_j = jnp.sum(r * kj * (u if j == 0 else Ej), axis=-1, keepdims=True)
        m_j = (row - col == j) if j == 0 else (
            (row - col == j) & ((row % _BAND) >= j))
        A += jnp.where(m_j, a_j, 0.0)

    o = o + jnp.dot(A.astype(cdt), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(out_dtype)

    # ---- state update (identical to GLA)
    kd = (k * jnp.exp(btot - bcum)).astype(cdt)
    state[:] = state[:] * jnp.exp(btot)[0][:, None] + jax.lax.dot_general(
        kd, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(c == nc - 1)
    def _():
        # round-to-nearest-even cast in-kernel == the XLA f32->bf16 cast
        # the callers used to do outside; f32 sf is byte-identical
        sf_ref[0] = state[:].astype(sf_ref.dtype)


def _fwd_kernel_infer(r_ref, k_ref, v_ref, w_ref, u_ref, s0_ref,
                      o_ref, sf_ref, state, *, chunk_size: int, out_dtype):
    """Forward-only variant: no chunk-state residual output (the dead
    residual buffer cannot be DCE'd by XLA — prefill-scale HBM waste;
    see ops/gla_pallas.py:_kernel_infer)."""
    _fwd_kernel(r_ref, k_ref, v_ref, w_ref, u_ref, s0_ref, o_ref, sf_ref,
                None, state, chunk_size=chunk_size, out_dtype=out_dtype)


def _bwd_kernel(r_ref, k_ref, v_ref, w_ref, u_ref, cs_ref, do_ref, dsf_ref,
                dr_ref, dk_ref, dv_ref, dw_ref, du_ref, ds0_ref,
                dstate, du_acc, *, chunk_size: int):
    """Reverse chunk sweep; shared derivation in the GLA backward kernel
    (ops/gla_pallas.py:_bwd_kernel). RWKV-6 deltas per module docstring."""
    rc = pl.program_id(1)
    nc = pl.num_programs(1)
    C = chunk_size

    @pl.when(rc == 0)
    def _():
        dstate[:] = dsf_ref[0].astype(jnp.float32)
        du_acc[:] = jnp.zeros_like(du_acc)

    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    tril_inc = (row >= col).astype(jnp.float32)
    triu_inc = (row <= col).astype(jnp.float32)
    triu_strict = (row < col).astype(jnp.float32)

    g = w_ref[0].astype(jnp.float32)
    bcum = jnp.dot(tril_inc, g, preferred_element_type=jnp.float32)
    bx = bcum - g
    btot = bcum[C - 1 : C, :]
    lam = jnp.exp(bx)
    dec_end = jnp.exp(btot - bcum)

    cdt = r_ref.dtype
    r = r_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    u = u_ref[0].astype(jnp.float32)  # (1, dk)
    ktil = k * dec_end
    s_in = cs_ref[0, 0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    dS = dstate[:]

    # ---- inter pieces
    M = jax.lax.dot_general(do.astype(cdt), s_in.astype(cdt),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (C, dk)
    dktil = jax.lax.dot_general(v.astype(cdt), dS.astype(cdt),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dr = lam * M
    dk_out = dec_end * dktil
    dv = jnp.dot(ktil.astype(cdt), dS.astype(cdt),
                 preferred_element_type=jnp.float32)

    # ---- intra: dyadic levels for A / G / H on the exclusive r cumsum
    dA = jax.lax.dot_general(do.astype(cdt), v.astype(cdt),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (C, C)
    A = jnp.zeros((C, C), jnp.float32)
    G = jnp.zeros_like(bcum)
    H = jnp.zeros_like(bcum)
    for wlev in _dyadic_levels(C):
        qe, ke = _level_factors(bcum, row1, wlev, q_cum=bx)
        mask_w = ((row // wlev) == (col // wlev)).astype(jnp.float32)
        kke = (k * ke).astype(cdt)
        rqe = (r * qe).astype(cdt)
        dAw = (dA * mask_w).astype(cdt)
        A += jax.lax.dot_general(rqe, kke, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * mask_w
        G += qe * jnp.dot(dAw, kke, preferred_element_type=jnp.float32)
        H += ke * jax.lax.dot_general(dAw, rqe, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    # ---- near band (j == 0 = bonus with no gate dependence; j >= 1 decay
    # E_j = exp(bx_t - b_{t-j}) built from ONE exp(g) — see forward kernel)
    eg1 = _shift_down(jnp.exp(g), 1) if _BAND > 2 else None
    Ej = 1.0
    for j in range(_BAND):
        kj = _shift_down(k, j)
        bm = (1.0 if j == 0
              else ((row1 % _BAND) >= j).astype(jnp.float32))
        da_j = jnp.sum(do * _shift_down(v, j), axis=-1, keepdims=True) * bm
        if j == 0:
            a_j = jnp.sum(r * kj * u, axis=-1, keepdims=True)
            A += jnp.where(row == col, a_j, 0.0)
            dr += da_j * u * k
            dk_out += da_j * u * r
            du_acc[:, :] += jnp.sum(da_j * r * k, axis=0, keepdims=True)
        else:
            if j == 2:
                Ej = eg1
            elif j > 2:
                Ej = Ej * _shift_down(eg1, j - 2)
            a_j = jnp.sum(r * kj * Ej, axis=-1, keepdims=True)
            m_j = (row - col == j) & ((row % _BAND) >= j)
            A += jnp.where(m_j, a_j, 0.0)
            G += da_j * kj * Ej
            H += _shift_up(da_j * r * Ej, j)

    dv = dv + jax.lax.dot_general(A.astype(cdt), do.astype(cdt),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dr = dr + G
    dk_out = dk_out + H
    db_exc = r * (lam * M + G)    # r-side decays: exclusive cumsum
    db_inc = -ktil * dktil - k * H  # k-side decays: inclusive

    # last-position extras (inclusive): btot terms
    extra = jnp.sum(ktil * dktil, axis=0, keepdims=True) + jnp.sum(
        dS * jnp.exp(btot)[0][:, None] * s_in, axis=1
    )[None, :]
    zero_rows = (row1 == C - 1).astype(jnp.float32)
    db_inc = db_inc + zero_rows * extra

    dw = (jnp.dot(triu_inc, db_inc, preferred_element_type=jnp.float32)
          + jnp.dot(triu_strict, db_exc, preferred_element_type=jnp.float32))

    dr_ref[0] = dr.astype(dr_ref.dtype)
    dk_ref[0] = dk_out.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dw_ref[0] = dw.astype(dw_ref.dtype)

    dstate[:] = dS * jnp.exp(btot)[0][:, None] + jax.lax.dot_general(
        (r * lam).astype(cdt), do.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32
    )

    @pl.when(rc == nc - 1)
    def _():
        ds0_ref[0] = dstate[:]
        du_ref[0] = du_acc[:]


# -------------------------------------------------------------------- impl
def _fwd_impl(r, k, v, w, u, initial_state, chunk_size, interpret,
              residual_dtype=jnp.bfloat16, sf_dtype=jnp.float32,
              save_residuals=True):
    b, h, t, dk = r.shape
    dv = v.shape[-1]
    C = chunk_size
    r, k, v, w = _pad_inputs(r, k, v, w, C)
    T = r.shape[2]
    nc = T // C
    bh = b * h

    rs = lambda x, d: x.reshape(bh, T, d)
    r2, k2, v2, w2 = rs(r, dk), rs(k, dk), rs(v, dv), rs(w, dk)
    # u: (h, dk) -> per-(batch*head) row (bh, 1, dk); tiny
    u2 = jnp.tile(u[None], (b, 1, 1)).reshape(bh, 1, dk)
    s0 = initial_state.reshape(bh, dk, dv)
    if save_residuals:
        s0 = s0.astype(jnp.float32)
        kern = functools.partial(_fwd_kernel, chunk_size=C, out_dtype=r.dtype)
        out_specs = [
            pl.BlockSpec((1, C, dv), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, dk, dv), lambda i, c: (i, c, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bh, T, dv), r.dtype),
            jax.ShapeDtypeStruct((bh, dk, dv), sf_dtype),
            jax.ShapeDtypeStruct((bh, nc, dk, dv), residual_dtype),
        ]
    else:
        # inference: no dead residual buffer (see _fwd_kernel_infer)
        kern = functools.partial(_fwd_kernel_infer, chunk_size=C,
                                 out_dtype=r.dtype)
        out_specs = [
            pl.BlockSpec((1, C, dv), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bh, T, dv), r.dtype),
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
            pl.BlockSpec((1, 1, dk), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((dk, dv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(r2, k2, v2, w2, u2, s0)

    o = outs[0].reshape(b, h, T, dv)[:, :, :t]
    sf = outs[1].reshape(b, h, dk, dv)
    if not save_residuals:
        return o, sf
    return o, sf, outs[2].reshape(b, h, nc, dk, dv)


def _bwd_impl(r, k, v, w, u, chunk_states, do, dsf, chunk_size, interpret):
    b, h, t, dk = r.shape
    dv = v.shape[-1]
    C = chunk_size
    r, k, v, w = _pad_inputs(r, k, v, w, C)
    do = jnp.pad(do, ((0, 0), (0, 0), (0, r.shape[2] - t), (0, 0)))
    T = r.shape[2]
    nc = T // C
    bh = b * h

    rs = lambda x, d: x.reshape(bh, T, d)
    r2, k2, v2, w2, do2 = (rs(r, dk), rs(k, dk), rs(v, dv), rs(w, dk),
                           rs(do, dv))
    u2 = jnp.tile(u[None], (b, 1, 1)).reshape(bh, 1, dk)
    dsf2 = dsf.reshape(bh, dk, dv).astype(jnp.float32)
    chunk_states = chunk_states.reshape(bh, nc, dk, dv)

    kern = functools.partial(_bwd_kernel, chunk_size=C)
    rev = lambda i, c: (i, nc - 1 - c, 0)
    dr, dk_, dv_, dw, du_bh, ds0 = pl.pallas_call(
        kern,
        grid=(bh, nc),
        in_specs=[
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dv), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, 1, dk), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, dk, dv), lambda i, c: (i, nc - 1 - c, 0, 0)),
            pl.BlockSpec((1, C, dv), rev),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, C, dv), rev),
            pl.BlockSpec((1, C, dk), rev),
            pl.BlockSpec((1, 1, dk), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, dk, dv), lambda i, c: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, T, dk), r.dtype),
            jax.ShapeDtypeStruct((bh, T, dk), k.dtype),
            jax.ShapeDtypeStruct((bh, T, dv), v.dtype),
            jax.ShapeDtypeStruct((bh, T, dk), w.dtype),
            jax.ShapeDtypeStruct((bh, 1, dk), jnp.float32),
            jax.ShapeDtypeStruct((bh, dk, dv), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dk, dv), jnp.float32),
            pltpu.VMEM((1, dk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(r2, k2, v2, w2, u2, chunk_states, do2, dsf2)

    unp = lambda x, d: x.reshape(b, h, T, d)[:, :, :t]
    return (unp(dr, dk), unp(dk_, dk), unp(dv_, dv), unp(dw, dk),
            du_bh.reshape(b, h, dk), ds0.reshape(b, h, dk, dv))


# ------------------------------------------------------------ partitioning
@functools.lru_cache(maxsize=None)
def _fwd_partitioned(chunk_size, interpret, residual_dtype,
                     partitioned=True, sf_dtype=jnp.float32):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(r, k, v, w, u, s0):
        return _fwd_impl(r, k, v, w, u, s0, chunk_size, interpret,
                         residual_dtype, sf_dtype)

    if not partitioned:
        # raw kernel for fully-manual shard_map contexts (ops/gla_cp.py)
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
        args = ((mk(ba, ha, None, None),) * 4
                + (mk(ha, None),)
                + (mk(ba, ha, None, None),))
        outs = (mk(ba, ha, None, None), mk(ba, ha, None, None),
                mk(ba, ha, None, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h t k, b h t k, b h t v, b h t k, h k, b h k v "
                      "-> b h t v, b h k v, b h c k v",
        need_replication_factors=("t", "k", "v", "c"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _fwd_infer_partitioned(chunk_size, interpret, sf_dtype,
                           partitioned=True):
    """Inference-only forward: no chunk-state residual output, ``sf``
    emitted in ``sf_dtype`` in-kernel (ops/gla_pallas.py twin)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(r, k, v, w, u, s0):
        return _fwd_impl(r, k, v, w, u, s0, chunk_size, interpret,
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
        args = ((mk(ba, ha, None, None),) * 4
                + (mk(ha, None),)
                + (mk(ba, ha, None, None),))
        outs = (mk(ba, ha, None, None), mk(ba, ha, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h t k, b h t k, b h t v, b h t k, h k, b h k v "
                      "-> b h t v, b h k v",
        need_replication_factors=("t", "k", "v"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(chunk_size, interpret, partitioned=True):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(r, k, v, w, u, chunk_states, do, dsf):
        return _bwd_impl(r, k, v, w, u, chunk_states, do, dsf, chunk_size,
                         interpret)

    if not partitioned:
        return fn

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return ((mk(ba, ha, None, None),) * 4
                + (mk(ba, ha, None), mk(ba, ha, None, None)))

    def part(mesh, arg_infos, result_infos):
        ba, ha = _bh_axes(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, ha, None, None),) * 4
                + (mk(ha, None),)
                + (mk(ba, ha, None, None, None),)
                + (mk(ba, ha, None, None),) * 2)
        outs = ((mk(ba, ha, None, None),) * 4
                + (mk(ba, ha, None), mk(ba, ha, None, None)))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b h t k, b h t k, b h t v, b h t k, h k, "
                      "b h c k v, b h t v, b h k v "
                      "-> b h t k, b h t k, b h t v, b h t k, b h k, b h k v",
        need_replication_factors=("t", "k", "v", "c"),
    )
    return cp


# ------------------------------------------------------------- custom VJP
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _rwkv6_chunk_pallas(r, k, v, w, u, initial_state, chunk_size, interpret,
                        residual_dtype, partitioned=True,
                        sf_dtype=jnp.float32):
    # primal == inference: residual-free kernel (prefill-scale HBM waste
    # otherwise — a custom-call output buffer cannot be DCE'd)
    o, sf = _fwd_infer_partitioned(chunk_size, interpret, sf_dtype,
                                   partitioned)(r, k, v, w, u, initial_state)
    return o, sf


def _vjp_fwd(r, k, v, w, u, initial_state, chunk_size, interpret,
             residual_dtype, partitioned=True, sf_dtype=jnp.float32):
    o, sf, chunk_states = _fwd_partitioned(
        chunk_size, interpret, residual_dtype, partitioned, sf_dtype
    )(r, k, v, w, u, initial_state)
    return (o, sf), (r, k, v, w, u, chunk_states)


def _vjp_bwd(chunk_size, interpret, residual_dtype, partitioned, sf_dtype,
             residuals, cotangents):
    r, k, v, w, u, chunk_states = residuals
    do, dsf = cotangents
    dr, dk, dv, dw, du_b, ds0 = _bwd_partitioned(
        chunk_size, interpret, partitioned)(
        r, k, v, w, u, chunk_states, do, dsf
    )
    # per-(batch, head) bonus grads -> (h, dk); XLA turns this into a psum
    # over the dp axis when batch is sharded
    du = jnp.sum(du_b, axis=0).astype(u.dtype)
    return (dr.astype(r.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dw.astype(w.dtype), du, ds0)


_rwkv6_chunk_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def rwkv6_chunk_pallas(
    r: Array,
    k: Array,
    v: Array,
    w: Array,
    u: Array,
    initial_state: Optional[Array] = None,
    chunk_size: int = 128,
    interpret: Optional[bool] = None,
    residual_dtype=jnp.bfloat16,
    partitioned: bool = True,
) -> Tuple[Array, Array]:
    """Drop-in for :func:`lina_speech_tpu.ops.rwkv6.rwkv6_chunk`: Pallas
    forward AND handwritten Pallas backward. ``chunk_size`` must be a power
    of two >= 8; gates ``w`` are log-decays <= 0 (stability invariant of
    the dyadic factorization — module docstring)."""
    b, h, t, dk = r.shape
    dv = v.shape[-1]
    if chunk_size < _MIN_W or (chunk_size & (chunk_size - 1)):
        raise ValueError(f"chunk_size must be a power of two >= {_MIN_W}, "
                         f"got {chunk_size}")
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dk, dv), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # sf comes back in state_dtype straight from the kernel (in-kernel
    # round-to-nearest-even == the XLA cast this wrapper used to do)
    o, sf = _rwkv6_chunk_pallas(r, k, v, w, u, initial_state, chunk_size,
                                interpret, residual_dtype, partitioned,
                                state_dtype)
    return o, sf
