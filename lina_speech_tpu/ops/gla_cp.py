"""Context-parallel (sequence-sharded) chunked GLA.

Shards the TIME axis of the GLA recurrence over a mesh axis (``cp``) so a
single long sequence trains across chips. The reference has no equivalent
(its only multi-device strategy is DDP, train_lina.py:91); this is a
TPU-native extension that exploits what makes *linear* attention cheap to
context-parallelize: the cross-shard dependency is one O(dk x dv) state
per (batch, head), not a KV cache — no ring attention, no O(t) gather.

Math. With per-channel log-gates g_t <= 0 and b_t their running cumsum,
the GLA state after a span is affine in the state before it:

    S_out = diag(exp(sum_span g)) . S_in + B_span

where ``B_span`` is the span's own contribution (the final state of the
span started from zero). Pairs ``(D, B)`` with D = exp(sum g) compose
associatively::

    (D1, B1) then (D2, B2)  ==  (D1*D2, D2 (.) B1 + B2)

so each shard runs the ordinary chunk kernel with a ZERO initial state
(getting local outputs o_loc and its (D_i, B_i)), the pairs are combined
across the mesh axis with one ``all_gather`` + an associative scan
(computed redundantly per shard — n is tiny and the combine is
elementwise), and each shard adds the closed-form correction for the
state entering it::

    o_t += (q_t * scale * exp(b_t_local)) @ S_in        (one MXU matmul)

Stability: gates are non-positive, so every exp here is <= 1 — the same
invariant as ops/gla.py. Packed-sequence resets fold into the gates
(reset => gate = -20) exactly as in the single-device kernels, so the
cross-shard decay D_i kills the state across a reset the same way the
local scan does: CP output matches the single-device output to fp
rounding even for packed batches.

Integration: the wrapper is a *partial-manual* ``jax.shard_map`` — only
the cp axis is manualized; batch/head stay under jit sharding
propagation, so this composes with the dp x tp rules (and the Pallas
kernel's own batch/head ``custom_partitioning``) unchanged. Everything
around the mixer (projections, short convs, cross-attention, losses) is
time-local or handled by XLA SPMD (convs get automatic halo exchange),
so a model becomes context-parallel by shard-mapping only this op.

Cost: one all_gather of (n_cp, b, h, dk, dv) fp32 states + (n_cp, b, h,
dk) decays per layer per step (fwd; transposed to a reduce-scatter in
bwd) — at flagship train shapes ~17 MB/shard, riding ICI.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lina_speech_tpu.ops.gla import gla_chunk, _default_scale

Array = jax.Array


def _pow2_chunk(chunk_size: int, floor: int = 128) -> int:
    """Round a requested chunk size up to the Pallas kernels' contract
    (power of two, >= ``floor``): e.g. 64 -> 128, 192 -> 256."""
    return 1 << max(floor.bit_length() - 1, (chunk_size - 1).bit_length())


def _keep_axis(mesh, name, dim):
    """Mesh axis name if present and it divides ``dim``, else None —
    mirrors the keep-logic of the kernels' custom_partitioning rules."""
    if name is None or name not in getattr(mesh, "shape", {}):
        return None
    return name if dim % mesh.shape[name] == 0 else None


def _combine(a, b):
    """Associative composition of (decay, contribution) state-affine maps."""
    Da, Ba = a
    Db, Bb = b
    return Da * Db, Db[..., None] * Ba + Bb


def _cp_exchange(d_loc: Array, s_loc: Array, s0: Array, cp_axis: str):
    """Cross-shard (decay, contribution) recombination.

    Given this shard's local decay ``d_loc`` (b, h, dk) and zero-state
    contribution ``s_loc`` (b, h, dk, dv) — both fp32 — returns
    ``(s_in, s_final)``: the state entering this shard and the global
    final state (identical value on every shard). One all_gather along
    ``cp_axis`` + a tiny redundant associative scan per shard.
    """
    dg = jax.lax.all_gather(d_loc, cp_axis)  # (n, b, h, dk)
    bg = jax.lax.all_gather(s_loc, cp_axis)  # (n, b, h, dk, dv)
    d_inc, b_inc = jax.lax.associative_scan(_combine, (dg, bg), axis=0)

    idx = jax.lax.axis_index(cp_axis)
    jm1 = jnp.maximum(idx - 1, 0)
    first = idx == 0
    s_prev = jnp.where(
        first, 0.0, jax.lax.dynamic_index_in_dim(b_inc, jm1, 0, keepdims=False))
    d_prev = jnp.where(
        first, 1.0, jax.lax.dynamic_index_in_dim(d_inc, jm1, 0, keepdims=False))
    s_in = d_prev[..., None] * s0 + s_prev  # state entering this shard
    s_final = d_inc[-1][..., None] * s0 + b_inc[-1]
    return s_in, s_final


def _cp_body(
    q: Array,
    k: Array,
    v: Array,
    gk: Array,
    s0: Array,
    *,
    cp_axis: str,
    scale: float,
    chunk_size: int,
    subchunk_size: int,
    kernel: str,
):
    """Collective-aware body; time axis is LOCAL here (inside shard_map)."""
    b, h, _, dk = q.shape
    dv = v.shape[-1]
    f32 = jnp.float32
    zero = jnp.zeros((b, h, dk, dv), dtype=f32)

    if kernel == "chunk_pallas":
        from lina_speech_tpu.ops.gla_pallas import gla_chunk_pallas

        # partitioned=False: inside this (fully-manual over cp/batch/head)
        # shard_map the kernel runs on local shards — custom_partitioning
        # cannot compile inside a manual region (r4 advisor; verified)
        o_loc, s_loc = gla_chunk_pallas(
            q, k, v, gk, initial_state=zero,
            chunk_size=_pow2_chunk(chunk_size), scale=scale,
            partitioned=False)
    else:
        o_loc, s_loc = gla_chunk(
            q, k, v, gk, initial_state=zero, scale=scale,
            chunk_size=chunk_size, subchunk_size=subchunk_size)

    # this shard's (decay, contribution) pair, fp32
    d_loc = jnp.exp(jnp.sum(gk.astype(f32), axis=2))  # (b, h, dk)
    s_in, s_final = _cp_exchange(d_loc, s_loc.astype(f32), s0, cp_axis)

    # correction: the "inter" term of the chunk kernels, against s_in.
    # Matmul operands follow the IO dtype (bf16 MXU passes), fp32 accum —
    # same convention as gla_chunk's inter einsum. GLA readout sees the
    # POST-update state, so the decay is the inclusive cumsum.
    bc = jnp.cumsum(gk.astype(f32), axis=2)
    mm = q.dtype if q.dtype == jnp.bfloat16 else f32
    qdec = (q.astype(f32) * scale) * jnp.exp(bc)
    corr = jnp.einsum(
        "bhtk,bhkv->bhtv", qdec.astype(mm), s_in.astype(mm),
        preferred_element_type=f32)
    o = (o_loc.astype(f32) + corr).astype(q.dtype)
    return o, s_final


def gla_chunk_cp(
    q: Array,
    k: Array,
    v: Array,
    gk: Array,
    initial_state: Optional[Array] = None,
    scale: Optional[float] = None,
    chunk_size: int = 64,
    subchunk_size: int = 16,
    *,
    cp_axis: str = "cp",
    mesh=None,
    kernel: str = "chunk",
    batch_axis: Optional[str] = None,
    head_axis: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Context-parallel :func:`~lina_speech_tpu.ops.gla.gla_chunk`.

    Args:
        q, k, v, gk: (b, h, t, d) with t sharded over ``mesh[cp_axis]``
            (t need not divide evenly into chip-local chunk multiples —
            each shard pads internally like the single-device kernel).
        initial_state: optional (b, h, dk, dv) seed state, replicated
            along cp (initial-state tuning works through this op: the
            correction term is differentiable w.r.t. s0 on every shard).
        cp_axis: mesh axis name carrying the time shards.
        mesh: the Mesh; None uses the ambient mesh (``jax.set_mesh``).
        kernel: "chunk" (XLA) or "chunk_pallas" (TPU kernel) per shard.
        batch_axis / head_axis: optional mesh axes carrying the batch /
            head dims (e.g. "dp"/"tp"); when given they are manualized
            alongside cp so the Pallas kernel runs on local shards
            (custom_partitioning cannot compile inside the partial-manual
            region). Names absent from the mesh, or sizes that don't
            divide the dim, are ignored. With kernel="chunk" they are
            optional — XLA SPMD propagates auto axes through the body.
            CAUTION (kernel="chunk_pallas" only): if the batch/head dims
            are actually sharded over mesh axes NOT named here (or a
            named axis was ignored for non-divisibility), those dims
            stay auto-sharded around a raw pallas_call with no
            partitioning rule — expect a lowering error or a silent
            gather; rename the axes, make the dims divide, or fall back
            to kernel="chunk".

    Returns: (o, final_state) — o time-sharded like q, final_state
    replicated along cp (identical value on every shard). Differentiable
    in all inputs (autodiff through shard_map; the all_gather transposes
    to a reduce-scatter in the backward pass).
    """
    scale = _default_scale(q, scale)
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    s0 = (jnp.zeros((b, h, dk, dv), jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32))

    # t must divide over cp for shard_map; pad with k = 0, gk = 0 (decay 1,
    # zero contribution — outputs for real positions and the final state
    # are exact, same trick as gla_chunk's internal chunk padding). The
    # pad re-shards per call — keep sequence lengths divisible by cp when
    # feeding data (train/cli.py pads batches once) to stay on the fast path.
    m = mesh
    if m is None:
        m = jax.sharding.get_abstract_mesh()
    if cp_axis not in getattr(m, "shape", {}):
        raise ValueError(
            f"gla_chunk_cp: no mesh axis {cp_axis!r} — pass mesh= or set an "
            f"ambient mesh (jax.set_mesh) carrying it")
    n_cp = m.shape[cp_axis]
    pad = (-t) % n_cp
    if pad:
        pz = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q, k, v, gk = pz(q), pz(k), pz(v), pz(gk)

    body = functools.partial(
        _cp_body, cp_axis=cp_axis, scale=scale, chunk_size=chunk_size,
        subchunk_size=subchunk_size, kernel=kernel)
    ba = _keep_axis(m, batch_axis, b)
    ha = _keep_axis(m, head_axis, h)
    tsharded = P(ba, ha, cp_axis, None)
    rep = P(ba, ha, None, None)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        axis_names={cp_axis} | {a for a in (ba, ha) if a},
        in_specs=(tsharded, tsharded, tsharded, tsharded, rep),
        out_specs=(tsharded, rep),
        check_vma=False,  # s_final is replicated by construction
    )
    o, s_final = fn(q, k, v, gk, s0)
    if pad:
        o = o[:, :, :t]
    return o, s_final.astype(state_dtype)


def _rwkv6_cp_body(
    r: Array,
    k: Array,
    v: Array,
    w: Array,
    u: Array,
    s0: Array,
    *,
    cp_axis: str,
    chunk_size: int,
    subchunk_size: int,
    kernel: str,
):
    """RWKV6 collective-aware body; time axis is LOCAL here (inside shard_map).

    Same state-affine recombination as :func:`_cp_body` — RWKV6's state
    update ``S_t = diag(exp(w_t)) S_{t-1} + k_t v_t`` (ops/rwkv6.py:5-8) has
    the identical (decay, contribution) composition. Two readout
    differences vs GLA: the output sees the PRE-update state (so the
    correction decay is the EXCLUSIVE cumsum of w), and there is no
    1/sqrt(d) query scale. The u bonus is time-local (current token only),
    so it lives entirely in the per-shard local run.
    """
    b, h, _, dk = r.shape
    dv = v.shape[-1]
    f32 = jnp.float32
    zero = jnp.zeros((b, h, dk, dv), dtype=f32)

    if kernel == "chunk_pallas":
        from lina_speech_tpu.ops.rwkv6_pallas import rwkv6_chunk_pallas

        o_loc, s_loc = rwkv6_chunk_pallas(
            r, k, v, w, u, initial_state=zero,
            chunk_size=_pow2_chunk(chunk_size), partitioned=False)
    else:
        from lina_speech_tpu.ops.rwkv6 import rwkv6_chunk

        o_loc, s_loc = rwkv6_chunk(
            r, k, v, w, u, initial_state=zero,
            chunk_size=chunk_size, subchunk_size=subchunk_size)

    d_loc = jnp.exp(jnp.sum(w.astype(f32), axis=2))  # (b, h, dk)
    s_in, s_final = _cp_exchange(d_loc, s_loc.astype(f32), s0, cp_axis)

    wf = w.astype(f32)
    bx = jnp.cumsum(wf, axis=2) - wf  # exclusive: decay up to t-1
    mm = r.dtype if r.dtype == jnp.bfloat16 else f32
    rdec = r.astype(f32) * jnp.exp(bx)
    corr = jnp.einsum(
        "bhtk,bhkv->bhtv", rdec.astype(mm), s_in.astype(mm),
        preferred_element_type=f32)
    o = (o_loc.astype(f32) + corr).astype(r.dtype)
    return o, s_final


def rwkv6_chunk_cp(
    r: Array,
    k: Array,
    v: Array,
    w: Array,
    u: Array,
    initial_state: Optional[Array] = None,
    chunk_size: int = 64,
    subchunk_size: int = 16,
    *,
    cp_axis: str = "cp",
    mesh=None,
    kernel: str = "chunk",
    batch_axis: Optional[str] = None,
    head_axis: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Context-parallel :func:`~lina_speech_tpu.ops.rwkv6.rwkv6_chunk`.

    Same contract as :func:`gla_chunk_cp` with RWKV6 operands: r/k/w
    (b, h, t, dk) and v (b, h, t, dv) time-sharded over ``mesh[cp_axis]``;
    the bonus ``u`` (h, dk) and ``initial_state`` replicated along cp.
    Packed resets fold into w (reset -> -20) exactly as single-device.
    Returns (o, final_state), o time-sharded, final_state replicated.
    """
    b, h, t, dk = r.shape
    dv = v.shape[-1]
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    s0 = (jnp.zeros((b, h, dk, dv), jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32))

    m = mesh
    if m is None:
        m = jax.sharding.get_abstract_mesh()
    if cp_axis not in getattr(m, "shape", {}):
        raise ValueError(
            f"rwkv6_chunk_cp: no mesh axis {cp_axis!r} — pass mesh= or set "
            f"an ambient mesh (jax.set_mesh) carrying it")
    n_cp = m.shape[cp_axis]
    # pad with k = 0, w = 0 (decay 1, zero contribution) — exact, as in
    # gla_chunk_cp
    pad = (-t) % n_cp
    if pad:
        pz = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        r, k, v, w = pz(r), pz(k), pz(v), pz(w)

    body = functools.partial(
        _rwkv6_cp_body, cp_axis=cp_axis, chunk_size=chunk_size,
        subchunk_size=subchunk_size, kernel=kernel)
    ba = _keep_axis(m, batch_axis, b)
    ha = _keep_axis(m, head_axis, h)
    tsharded = P(ba, ha, cp_axis, None)
    rep = P(ba, ha, None, None)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        axis_names={cp_axis} | {a for a in (ba, ha) if a},
        in_specs=(tsharded, tsharded, tsharded, tsharded, P(ha, None), rep),
        out_specs=(tsharded, rep),
        check_vma=False,  # s_final is replicated by construction
    )
    o, s_final = fn(r, k, v, w, u, s0)
    if pad:
        o = o[:, :, :t]
    return o, s_final.astype(state_dtype)
