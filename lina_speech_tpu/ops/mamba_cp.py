"""Context-parallel (sequence-sharded) Mamba selective scan.

Same strategy as :mod:`lina_speech_tpu.ops.gla_cp` (see its module
docstring for the math): the Mamba recurrence

    h_t = dA_t (.) h_{t-1} + dBx_t,   dA_t = exp(dt_t * A)

is state-affine, so a time span composes as ``(D, S)`` pairs with
``D = prod dA`` and ``S`` the span's zero-state contribution. Each shard
runs the ordinary selective scan from a ZERO state, the pairs are
recombined with one ``all_gather`` along the cp mesh axis, and the
entering state's contribution is added in closed form::

    y_t += sum_n  alive_t * exp(cumsum(dt)_t[d] * A[d, n]) * S_in[d, n] * C_t[n]

(readout sees the POST-update state, so the decay is the inclusive
cumsum; ``alive_t`` kills the correction from the first packed-sequence
reset onward, matching ``selective_scan``'s dA-zeroing reset semantics —
ops/mamba.py:58-62). Unlike GLA, the decay is full-rank over (d, n)
(``exp(dt . A)``), so the exchanged decay has the state's own shape and
the (decay, contribution) combine is fully elementwise.

The reference's mamba path (model/mamba.py + mamba_ssm) has no
sequence-parallel equivalent; this is the TPU-native extension applied
to the Mamba backbone family.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lina_speech_tpu.ops.gla_cp import _keep_axis
from lina_speech_tpu.ops.mamba import selective_scan

Array = jax.Array


def _combine_full(a, b):
    """(decay, contribution) composition; decay has the state's shape."""
    Da, Sa = a
    Db, Sb = b
    return Da * Db, Db * Sa + Sb


def _exchange_full(d_loc: Array, s_loc: Array, s0: Array, cp_axis: str):
    """Cross-shard recombination for same-shape (decay, contribution)
    pairs (b, d, n). Returns (s_in, s_final), both fp32; s_final is
    replicated along cp by construction."""
    dg = jax.lax.all_gather(d_loc, cp_axis)  # (n_cp, b, d, n)
    sg = jax.lax.all_gather(s_loc, cp_axis)
    d_inc, s_inc = jax.lax.associative_scan(_combine_full, (dg, sg), axis=0)

    idx = jax.lax.axis_index(cp_axis)
    jm1 = jnp.maximum(idx - 1, 0)
    first = idx == 0
    s_prev = jnp.where(
        first, 0.0, jax.lax.dynamic_index_in_dim(s_inc, jm1, 0, keepdims=False))
    d_prev = jnp.where(
        first, 1.0, jax.lax.dynamic_index_in_dim(d_inc, jm1, 0, keepdims=False))
    s_in = d_prev * s0 + s_prev
    s_final = d_inc[-1] * s0 + s_inc[-1]
    return s_in, s_final


def _cp_body(x, dt, B, C, reset, s0, A, D, *, local_scan, cp_axis: str):
    """Collective-aware body; time axis is LOCAL here (inside shard_map).

    x/dt: (b, t, d); B/C: (b, t, n); reset: (b, t) f32 (1.0 at packed-
    sequence starts; all-zeros stands in for None); s0: (b, d, n) fp32;
    A: (d, n) negative; D: (d,). A and D ride through as replicated
    shard_map inputs (NOT closures) so their grads flow — shard_map's
    transpose psums them over the manual axes.
    ``local_scan(x, dt, A, B, C, D, reset_mask)`` runs this shard's scan
    from a zero state.
    """
    f32 = jnp.float32
    y_loc, s_loc = local_scan(x, dt, A, B, C, D, reset.astype(bool))

    dtf = dt.astype(f32)
    Af = A.astype(f32)
    # shard decay: prod_t dA_t — zero for any batch row with a reset in
    # this shard (dA is zeroed AT the reset step, so the product dies)
    total = jnp.sum(dtf, axis=1)                      # (b, d)
    any_reset = jnp.any(reset.astype(bool), axis=1)   # (b,)
    d_loc = jnp.where(any_reset[:, None, None], 0.0,
                      jnp.exp(jnp.einsum("bd,dn->bdn", total, Af)))

    s_in, s_final = _exchange_full(d_loc, s_loc.astype(f32), s0, cp_axis)

    # correction: inclusive-cumsum decay of s_in, dead from the first
    # reset onward; the (b, t, d, n) exp never materializes — XLA fuses
    # it into the n-contraction
    cd = jnp.cumsum(dtf, axis=1)                              # (b, t, d)
    alive = 1.0 - jax.lax.cummax(reset.astype(f32), axis=1)   # (b, t)
    pc = jnp.exp(cd[..., None] * Af[None, None]) * alive[..., None, None]
    corr = jnp.einsum("btdn,bdn,btn->btd", pc, s_in, C.astype(f32))
    return (y_loc.astype(f32) + corr).astype(x.dtype), s_final


def selective_scan_cp(
    x: Array,
    dt: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Array,
    initial_state: Optional[Array] = None,
    reset_mask: Optional[Array] = None,
    *,
    cp_axis: str = "cp",
    mesh=None,
    mode: str = "scan",
    batch_axis: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Context-parallel :func:`~lina_speech_tpu.ops.mamba.selective_scan`.

    Args:
        x, dt: (b, t, d) with t sharded over ``mesh[cp_axis]``; B, C:
            (b, t, n); A: (d, n) negative; D: (d,).
        initial_state: optional (b, d, n) seed, replicated along cp.
        reset_mask: optional (b, t) packed-sequence starts, time-sharded
            like x.
        mode: per-shard kernel — "scan" (XLA associative scan) or
            "pallas" (TPU sequential-scan kernel, run with
            ``partitioned=False`` on local shards).
        batch_axis: optional mesh axis carrying the batch dim (e.g.
            "dp"); pass it with ``mode="pallas"`` when the batch is
            dp-sharded (custom_partitioning cannot compile inside the
            manual region — same constraint as ops/gla_cp.py).

    Returns (y, final_state): y time-sharded like x, final_state
    replicated along cp. Differentiable in all array inputs.
    """
    b, t, d = x.shape
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    s0 = (jnp.zeros((b, d, A.shape[-1]), jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32))

    m = mesh
    if m is None:
        m = jax.sharding.get_abstract_mesh()
    if cp_axis not in getattr(m, "shape", {}):
        raise ValueError(
            f"selective_scan_cp: no mesh axis {cp_axis!r} — pass mesh= or "
            f"set an ambient mesh (jax.set_mesh) carrying it")
    n_cp = m.shape[cp_axis]
    # pad with dt = 0 (dA = 1, dBx = 0) — outputs for real positions and
    # the final state are exact; pad y rows are trimmed below
    pad = (-t) % n_cp
    if pad:
        pz = lambda z: jnp.pad(z, ((0, 0), (0, pad), (0, 0)))
        x, dt, B, C = pz(x), pz(dt), pz(B), pz(C)
    reset = (jnp.zeros(x.shape[:2], jnp.float32) if reset_mask is None
             else jnp.pad(reset_mask.astype(jnp.float32), ((0, 0), (0, pad))))

    if mode == "pallas":
        from lina_speech_tpu.ops.mamba_pallas import mamba_scan_pallas

        def local_scan(xx, dd, AA, BB, CC, DD, rm):
            return mamba_scan_pallas(xx, dd, AA, BB, CC, DD,
                                     initial_state=None, reset_mask=rm,
                                     partitioned=False)
    else:
        def local_scan(xx, dd, AA, BB, CC, DD, rm):
            return selective_scan(xx, dd, AA, BB, CC, DD, initial_state=None,
                                  reset_mask=rm, mode="scan")

    body = functools.partial(_cp_body, local_scan=local_scan,
                             cp_axis=cp_axis)
    ba = _keep_axis(m, batch_axis, b)
    tsh = P(ba, cp_axis, None)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        axis_names={cp_axis} | ({ba} if ba else set()),
        in_specs=(tsh, tsh, tsh, tsh, P(ba, cp_axis), P(ba, None, None),
                  P(None, None), P(None)),
        out_specs=(tsh, P(ba, None, None)),
        check_vma=False,  # s_final is replicated by construction
    )
    y, s_final = fn(x, dt, B, C, reset, s0, A, D)
    if pad:
        y = y[:, :t]
    return y, s_final.astype(state_dtype)
