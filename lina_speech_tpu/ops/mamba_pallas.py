"""Pallas TPU kernel for the Mamba (v1) selective scan.

TPU-native replacement for the reference's external ``mamba_ssm`` CUDA
selective-scan (reference model/mamba.py:13-14), replacing the XLA
``associative_scan`` path (ops/mamba.py) on TPU. That path materializes
(b, t, d, n) fp32 intermediates — 0.5 GB at the flagship-variant shapes
B8 T512 d2048 n16 — across the log-depth combine tree; this kernel keeps
the (n, d) state in VMEM and streams x/dt/B/C once:

- grid = (batch [parallel], time-blocks of SUB=16 [sequential]); the fp32
  state (n, d) lives in VMEM scratch across the sequential axis; the
  per-step recurrence h = exp(dt*A) * h + (dt*x) B is an unrolled 16-step
  loop over VPU elementwise ops (d on lanes, n on sublanes).
- forward saves the block-start states (b, nc, n, d) as the backward
  residual; the backward re-runs the 16 steps from the saved state to
  rebuild h_t in VMEM, then walks them in reverse with a state-cotangent
  carry. A/D parameter grads accumulate in VMEM scratch across the sweep
  and reduce over batch OUTSIDE the partitioned call (dp psum).
- ``reset_mask`` enters as a multiplicative keep mask on exp(dt*A) —
  exactly the oracle's semantics (ops/mamba.py:44-46), gradients included.

Contract matches :func:`lina_speech_tpu.ops.mamba.selective_scan`.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_SUB = 16  # timesteps per grid block == state-checkpoint interval


def _fwd_kernel(x_ref, dt_ref, b_ref, c_ref, keep_ref, a_ref, d_ref, s0_ref,
                y_ref, sf_ref, cs_ref, state, *, sub: int):
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        state[:] = s0_ref[0].astype(jnp.float32)

    if cs_ref is not None:
        cs_ref[0, 0] = state[:]

    xb = x_ref[0].astype(jnp.float32)     # (S, d)
    dtb = dt_ref[0].astype(jnp.float32)   # (S, d)
    Bb = b_ref[0].astype(jnp.float32)     # (S, n)
    Cb = c_ref[0].astype(jnp.float32)     # (S, n)
    keep = keep_ref[0].astype(jnp.float32)  # (S, 1)
    A = a_ref[:].astype(jnp.float32)      # (n, d)
    D = d_ref[0].astype(jnp.float32)      # (d,)

    dA = jnp.exp(dtb[:, None, :] * A[None]) * keep[:, :, None]   # (S, n, d)
    dBx = (dtb * xb)[:, None, :] * Bb[:, :, None]                # (S, n, d)

    s = state[:]
    ys = []
    for t in range(sub):
        s = dA[t] * s + dBx[t]
        ys.append(jnp.sum(Cb[t][:, None] * s, axis=0))  # (d,)
    state[:] = s
    y = jnp.stack(ys) + xb * D[None, :]
    y_ref[0] = y.astype(y_ref.dtype)

    @pl.when(c == nc - 1)
    def _():
        sf_ref[0] = state[:]


def _fwd_kernel_infer(x_ref, dt_ref, b_ref, c_ref, keep_ref, a_ref, d_ref,
                      s0_ref, y_ref, sf_ref, state, *, sub: int):
    """Forward-only variant: no chunk-state residual output (the dead
    residual buffer cannot be DCE'd by XLA — prefill-scale HBM waste;
    see ops/gla_pallas.py:_kernel_infer)."""
    _fwd_kernel(x_ref, dt_ref, b_ref, c_ref, keep_ref, a_ref, d_ref, s0_ref,
                y_ref, sf_ref, None, state, sub=sub)


def _bwd_kernel(x_ref, dt_ref, b_ref, c_ref, keep_ref, a_ref, d_ref, cs_ref,
                dy_ref, dsf_ref, dx_ref, ddt_ref, db_ref, dc_ref, ds0_ref,
                da_ref, dd_ref, dstate, da_acc, dd_acc, *, sub: int):
    rc = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(rc == 0)
    def _():
        # the final-state cotangent seeds the reverse state carry
        dstate[:] = dsf_ref[0].astype(jnp.float32)
        for ref in (da_acc, dd_acc):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    xb = x_ref[0].astype(jnp.float32)
    dtb = dt_ref[0].astype(jnp.float32)
    Bb = b_ref[0].astype(jnp.float32)
    Cb = c_ref[0].astype(jnp.float32)
    keep = keep_ref[0].astype(jnp.float32)
    A = a_ref[:].astype(jnp.float32)
    D = d_ref[0].astype(jnp.float32)
    dyb = dy_ref[0].astype(jnp.float32)
    s0 = cs_ref[0, 0].astype(jnp.float32)

    dA = jnp.exp(dtb[:, None, :] * A[None]) * keep[:, :, None]
    dtx = dtb * xb

    # rebuild in-block states from the checkpoint
    hs = []
    s = s0
    for t in range(sub):
        s = dA[t] * s + dtx[t][None, :] * Bb[t][:, None]
        hs.append(s)

    dh = dstate[:]
    daa = da_acc[:]
    dda = dd_acc[:]
    dx, ddt, dB, dC = [None] * sub, [None] * sub, [None] * sub, [None] * sub
    for t in reversed(range(sub)):
        h_t = hs[t]
        h_prev = hs[t - 1] if t > 0 else s0
        dy_t = dyb[t]                                   # (d,)
        dC[t] = jnp.sum(h_t * dy_t[None, :], axis=1)    # (n,)
        dda = dda + (dy_t * xb[t])[None, :]
        dh = dh + Cb[t][:, None] * dy_t[None, :]
        ddA = dh * h_prev                               # (n, d)
        t1 = ddA * dA[t]
        daa = daa + t1 * dtb[t][None, :]
        ddt_exp = jnp.sum(t1 * A, axis=0)               # (d,)
        ddtx = jnp.sum(dh * Bb[t][:, None], axis=0)     # (d,)
        dB[t] = jnp.sum(dh * dtx[t][None, :], axis=1)   # (n,)
        ddt[t] = ddt_exp + ddtx * xb[t]
        dx[t] = ddtx * dtb[t] + D * dy_t
        dh = dA[t] * dh
    dstate[:] = dh
    da_acc[:] = daa
    dd_acc[:] = dda

    dx_ref[0] = jnp.stack(dx).astype(dx_ref.dtype)
    ddt_ref[0] = jnp.stack(ddt).astype(ddt_ref.dtype)
    db_ref[0] = jnp.stack(dB).astype(db_ref.dtype)
    dc_ref[0] = jnp.stack(dC).astype(dc_ref.dtype)

    @pl.when(rc == nc - 1)
    def _():
        ds0_ref[0] = dstate[:]
        da_ref[0] = da_acc[:]
        dd_ref[0] = dd_acc[:]


def _pad_t(arrs, sub, keep_idx=None):
    """Zero-pad along t; the keep mask (``keep_idx``) pads with ONES — a
    zero there would act as a reset and wipe the carried state."""
    t = arrs[0].shape[1]
    pad = (-t) % sub
    if pad:
        return [jnp.pad(a, ((0, 0), (0, pad), (0, 0)),
                        constant_values=1.0 if i == keep_idx else 0)
                for i, a in enumerate(arrs)]
    return list(arrs)


def _fwd_impl(x, dt, B, C, keep, A2, D2, s0, interpret, save_residuals=True):
    """x/dt (b, t, d); B/C (b, t, n); keep (b, t, 1); A2 (n, d); D2 (1, d);
    s0 (b, n, d). Padded rows carry dt=0 (decay 1, zero input) so the
    final state is untouched by padding."""
    b, t, d = x.shape
    n = B.shape[-1]
    S = _SUB
    x, dt, B, C, keep = _pad_t([x, dt, B, C, keep], S, keep_idx=4)
    T = x.shape[1]
    nc = T // S

    bt = lambda i, c: (i, c, 0)
    fixed = lambda i, c: (0, 0)
    if save_residuals:
        kern = functools.partial(_fwd_kernel, sub=S)
        out_specs = [
            pl.BlockSpec((1, S, d), bt),
            pl.BlockSpec((1, n, d), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, n, d), lambda i, c: (i, c, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, T, d), x.dtype),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nc, n, d), jnp.float32),
        ]
    else:
        # inference: no dead residual buffer (see _fwd_kernel_infer)
        kern = functools.partial(_fwd_kernel_infer, sub=S)
        out_specs = [
            pl.BlockSpec((1, S, d), bt),
            pl.BlockSpec((1, n, d), lambda i, c: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, T, d), x.dtype),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        ]
    outs = pl.pallas_call(
        kern,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, S, d), bt),
            pl.BlockSpec((1, S, d), bt),
            pl.BlockSpec((1, S, n), bt),
            pl.BlockSpec((1, S, n), bt),
            pl.BlockSpec((1, S, 1), bt),
            pl.BlockSpec((n, d), fixed),
            pl.BlockSpec((1, d), fixed),
            pl.BlockSpec((1, n, d), lambda i, c: (i, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, dt, B, C, keep, A2, D2, s0)
    if not save_residuals:
        return outs[0][:, :t], outs[1]
    return outs[0][:, :t], outs[1], outs[2]


def _bwd_impl(x, dt, B, C, keep, A2, D2, cs, dy, dsf, interpret):
    b, t, d = x.shape
    n = B.shape[-1]
    S = _SUB
    x, dt, B, C, keep, dy = _pad_t([x, dt, B, C, keep, dy], S, keep_idx=4)
    T = x.shape[1]
    nc = T // S

    kern = functools.partial(_bwd_kernel, sub=S)
    rev = lambda i, c: (i, nc - 1 - c, 0)
    fixed = lambda i, c: (0, 0)
    bx = lambda i, c: (i, 0, 0)
    dx, ddt, dB, dC, ds0, dA_b, dD_b = pl.pallas_call(
        kern,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, S, d), rev),
            pl.BlockSpec((1, S, d), rev),
            pl.BlockSpec((1, S, n), rev),
            pl.BlockSpec((1, S, n), rev),
            pl.BlockSpec((1, S, 1), rev),
            pl.BlockSpec((n, d), fixed),
            pl.BlockSpec((1, d), fixed),
            pl.BlockSpec((1, 1, n, d), lambda i, c: (i, nc - 1 - c, 0, 0)),
            pl.BlockSpec((1, S, d), rev),
            pl.BlockSpec((1, n, d), bx),
        ],
        out_specs=[
            pl.BlockSpec((1, S, d), rev),
            pl.BlockSpec((1, S, d), rev),
            pl.BlockSpec((1, S, n), rev),
            pl.BlockSpec((1, S, n), rev),
            pl.BlockSpec((1, n, d), bx),
            pl.BlockSpec((1, n, d), bx),
            pl.BlockSpec((1, 1, d), bx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, T, d), x.dtype),
            jax.ShapeDtypeStruct((b, T, d), jnp.float32),
            jax.ShapeDtypeStruct((b, T, n), jnp.float32),
            jax.ShapeDtypeStruct((b, T, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, dt, B, C, keep, A2, D2, cs, dy, dsf)
    sl = lambda a: a[:, :t]
    return sl(dx), sl(ddt), sl(dB), sl(dC), ds0, dA_b, dD_b


# -------------------------------------------------------- partitioning
# The scan is embarrassingly parallel over batch (the model's dp axis);
# d/n stay replicated (the Mamba variant has no head axis to shard).
# A/D grads come back per-batch and reduce outside the partitioned call.


def _b_axis(arg_info, mesh):
    sharding = arg_info.sharding
    spec = getattr(sharding, "spec", None)
    if spec is None:
        try:
            from jax._src.sharding_impls import parse_flatten_op_sharding
            spec = parse_flatten_op_sharding(sharding._hlo_sharding, mesh)[0]
        except Exception:
            return None
    s = tuple(spec) + (None,)
    axis = s[0]
    if axis is None:
        return None
    names = axis if isinstance(axis, tuple) else (axis,)
    size = int(np.prod([mesh.shape[nm] for nm in names]))
    return axis if arg_info.shape[0] % size == 0 else None


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(interpret, partitioned=True):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(x, dt, B, C, keep, A2, D2, s0):
        return _fwd_impl(x, dt, B, C, keep, A2, D2, s0, interpret)

    if not partitioned:
        # raw kernel for fully-manual shard_map contexts (ops/mamba_cp.py)
        return fn

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba = _b_axis(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, None, None), mk(ba, None, None),
                mk(ba, None, None, None))

    def part(mesh, arg_infos, result_infos):
        ba = _b_axis(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, None, None),) * 5
                + (mk(None, None), mk(None, None), mk(ba, None, None)))
        outs = (mk(ba, None, None), mk(ba, None, None),
                mk(ba, None, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b t d, b t d, b t n, b t n, b t u, n d, u d, b n d "
                      "-> b t d, b n d, b c n d",
        need_replication_factors=("t", "d", "n", "u", "c"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _fwd_infer_partitioned(interpret, partitioned=True):
    """Inference-only forward: no chunk-state residual output
    (ops/gla_pallas.py twin)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(x, dt, B, C, keep, A2, D2, s0):
        return _fwd_impl(x, dt, B, C, keep, A2, D2, s0, interpret,
                         save_residuals=False)

    if not partitioned:
        return fn

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba = _b_axis(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return (mk(ba, None, None), mk(ba, None, None))

    def part(mesh, arg_infos, result_infos):
        ba = _b_axis(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, None, None),) * 5
                + (mk(None, None), mk(None, None), mk(ba, None, None)))
        outs = (mk(ba, None, None), mk(ba, None, None))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b t d, b t d, b t n, b t n, b t u, n d, u d, b n d "
                      "-> b t d, b n d",
        need_replication_factors=("t", "d", "n", "u"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(interpret, partitioned=True):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(x, dt, B, C, keep, A2, D2, cs, dy, dsf):
        return _bwd_impl(x, dt, B, C, keep, A2, D2, cs, dy, dsf, interpret)

    if not partitioned:
        return fn

    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ba = _b_axis(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        return ((mk(ba, None, None),) * 4
                + (mk(ba, None, None), mk(ba, None, None),
                   mk(ba, None, None)))

    def part(mesh, arg_infos, result_infos):
        ba = _b_axis(arg_infos[0], mesh)
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = ((mk(ba, None, None),) * 5
                + (mk(None, None), mk(None, None))
                + (mk(ba, None, None, None), mk(ba, None, None),
                   mk(ba, None, None)))
        outs = ((mk(ba, None, None),) * 4
                + (mk(ba, None, None), mk(ba, None, None),
                   mk(ba, None, None)))
        return mesh, fn, outs, args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        decode_shardings=False,
        sharding_rule="b t d, b t d, b t n, b t n, b t u, n d, u d, "
                      "b c n d, b t d, b n d "
                      "-> b t d, b t d, b t n, b t n, b n d, b n d, b u d",
        need_replication_factors=("t", "d", "n", "u", "c"),
    )
    return cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _mamba_scan(x, dt, B, C, keep, A2, D2, s0, interpret, partitioned=True):
    # primal == inference: residual-free kernel (prefill-scale HBM waste
    # otherwise — a custom-call output buffer cannot be DCE'd)
    y, sf = _fwd_infer_partitioned(interpret, partitioned)(
        x, dt, B, C, keep, A2, D2, s0)
    return y, sf


def _vjp_fwd(x, dt, B, C, keep, A2, D2, s0, interpret, partitioned=True):
    y, sf, cs = _fwd_partitioned(interpret, partitioned)(
        x, dt, B, C, keep, A2, D2, s0)
    return (y, sf), (x, dt, B, C, keep, A2, D2, cs)


def _vjp_bwd(interpret, partitioned, residuals, cotangents):
    x, dt, B, C, keep, A2, D2, cs = residuals
    dy, dsf = cotangents
    dx, ddt, dB, dC, ds0, dA_b, dD_b = _bwd_partitioned(interpret, partitioned)(
        x, dt, B, C, keep, A2, D2, cs, dy, dsf.astype(jnp.float32))
    # A/D grads come back per-batch shard; the batch sum happens outside
    # the partitioned call so the partitioner inserts the dp psum
    dA = dA_b.sum(axis=0)           # (n, d)
    dD = dD_b.sum(axis=0)           # (1, d)
    return (dx, ddt.astype(dt.dtype), dB.astype(B.dtype), dC.astype(C.dtype),
            jnp.zeros_like(keep), dA.astype(A2.dtype), dD.astype(D2.dtype),
            ds0)


_mamba_scan.defvjp(_vjp_fwd, _vjp_bwd)


def mamba_scan_pallas(
    x: Array,
    dt: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Array,
    initial_state: Optional[Array] = None,
    reset_mask: Optional[Array] = None,
    interpret: Optional[bool] = None,
    partitioned: bool = True,
) -> Tuple[Array, Array]:
    """Drop-in for :func:`lina_speech_tpu.ops.mamba.selective_scan`."""
    b, t, d = x.shape
    n = A.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    keep = jnp.ones((b, t, 1), jnp.float32)
    if reset_mask is not None:
        keep = 1.0 - reset_mask[..., None].astype(jnp.float32)
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    s0 = (jnp.zeros((b, d, n), jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32))
    y, sf = _mamba_scan(x, dt, B, C, keep, A.T, D[None, :],
                        s0.transpose(0, 2, 1), interpret, partitioned)
    return y, sf.transpose(0, 2, 1).astype(state_dtype)
