"""RWKV-6 (Finch) recurrence ops: scan oracle, stable chunked form, decode step.

Recurrence per head (state S: (d_k, d_v); per-channel log-decay w_t <= 0,
bonus u per channel):

    o_t = r_t @ (S_{t-1} + (u * k_t)^T v_t)
    S_t = diag(exp(w_t)) @ S_{t-1} + k_t^T v_t

This is the contract of the reference's FLA RWKV6Attention Triton kernels
(imported at reference model/rwkv6.py:11; not in tree). Unlike GLA, the
readout sees the *pre-update* state plus a u-weighted bonus for the current
token; no 1/sqrt(d) query scaling.

The chunked form mirrors ops/gla.py's two-level scheme with the readout
decay taken at the *exclusive* cumsum (decay up to t-1) and the s == t term
replaced by the u bonus. Every exp argument is <= 0.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def rwkv6_scan_ref(
    r: Array, k: Array, v: Array, w: Array, u: Array,
    initial_state: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Naive O(T) scan. r/k/w: (b, h, t, dk); v: (b, h, t, dv); u: (h, dk)."""
    b, h, t, dk = r.shape
    dv = v.shape[-1]
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dk, dv), jnp.float32)
    initial_state = initial_state.astype(jnp.float32)
    rf, kf, vf, wf = (x.astype(jnp.float32) for x in (r, k, v, w))
    uf = u.astype(jnp.float32)

    def step(S, inp):
        r_t, k_t, v_t, w_t = inp
        kv = k_t[..., None] * v_t[..., None, :]  # (b, h, dk, dv)
        o_t = jnp.einsum("bhk,bhkv->bhv", r_t, S + uf[None, :, :, None] * kv)
        S = jnp.exp(w_t)[..., None] * S + kv
        return S, o_t

    xs = tuple(jnp.moveaxis(x, 2, 0) for x in (rf, kf, vf, wf))
    final, o = jax.lax.scan(step, initial_state, xs)
    return jnp.moveaxis(o, 0, 2).astype(r.dtype), final.astype(state_dtype)


def rwkv6_decode_step(
    r: Array, k: Array, v: Array, w: Array, u: Array, state: Array,
) -> Tuple[Array, Array]:
    """One token. r/k/w: (b, h, dk); v: (b, h, dv); u: (h, dk)."""
    out_dtype = state.dtype
    rf, kf, vf, wf = (x.astype(jnp.float32) for x in (r, k, v, w))
    sf = state.astype(jnp.float32)
    kv = kf[..., None] * vf[..., None, :]
    o = jnp.einsum("bhk,bhkv->bhv", rf, sf + u.astype(jnp.float32)[None, :, :, None] * kv)
    sf = jnp.exp(wf)[..., None] * sf + kv
    return o.astype(r.dtype), sf.astype(out_dtype)


def rwkv6_chunk(
    r: Array, k: Array, v: Array, w: Array, u: Array,
    initial_state: Optional[Array] = None,
    chunk_size: int = 64,
    subchunk_size: int = 16,
) -> Tuple[Array, Array]:
    """Chunked-parallel RWKV6 (training path), stable, pure XLA.

    Same two-level decomposition as ops.gla.gla_chunk; the readout decay is
    the exclusive cumsum bx_t = sum_{i<t} w_i, so the pairwise factor for
    s < t is exp(bx_t - b_s) (<= 0 elementwise since s <= t-1), and the
    diagonal s == t contribution is the u bonus.
    """
    b, h, t, dk = r.shape
    dv = v.shape[-1]
    C, S = chunk_size, subchunk_size
    assert C % S == 0
    ns = C // S

    pad = (-t) % C
    if pad:
        pz = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        r, k, v, w = pz(r), pz(k), pz(v), pz(w)
    T = t + pad
    nc = T // C

    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    if initial_state is None:
        initial_state = jnp.zeros((b, h, dk, dv), jnp.float32)
    initial_state = initial_state.astype(jnp.float32)

    rc = jnp.moveaxis(r.astype(jnp.float32).reshape(b, h, nc, C, dk), 2, 0)
    kc = jnp.moveaxis(k.astype(jnp.float32).reshape(b, h, nc, C, dk), 2, 0)
    vc = jnp.moveaxis(v.astype(jnp.float32).reshape(b, h, nc, C, dv), 2, 0)
    wc = jnp.moveaxis(w.astype(jnp.float32).reshape(b, h, nc, C, dk), 2, 0)
    uf = u.astype(jnp.float32)

    tri = jnp.tril(jnp.ones((S, S), dtype=bool), -1)
    ij = jnp.tril(jnp.ones((ns, ns), dtype=bool), -1)

    # bf16 MXU operands for bf16 IO, fp32 accumulation (see ops/gla.py)
    mm_dtype = r.dtype if r.dtype == jnp.bfloat16 else jnp.float32
    ein = lambda spec, *ops: jnp.einsum(
        spec, *(o.astype(mm_dtype) for o in ops),
        preferred_element_type=jnp.float32,
    )

    # per-chunk work inside the scan under jax.checkpoint: backward memory
    # stays O(chunk) (see ops/gla.py gla_chunk for rationale)
    @jax.checkpoint
    def chunk_body(state, inp):
        rf, kf, vf, wf = inp  # (b, h, C, d)
        bc = jnp.cumsum(wf, axis=2)  # inclusive
        bx = bc - wf                  # exclusive
        b_total = bc[:, :, -1]

        o_inter = ein("bhsk,bhkv->bhsv", rf * jnp.exp(bx), state)
        k_to_end = kf * jnp.exp(b_total[:, :, None] - bc)
        chunk_kv = ein("bhsk,bhsv->bhkv", k_to_end, vf)
        new_state = jnp.exp(b_total)[..., None] * state + chunk_kv

        shp = (b, h, ns, S, dk)
        rf_s = rf.reshape(shp)
        kf_s = kf.reshape(shp)
        vf_s = vf.reshape(b, h, ns, S, dv)
        bc_s = bc.reshape(shp)
        bx_s = bx.reshape(shp)
        beta = bc_s[..., -1, :]
        beta_prev = jnp.concatenate(
            [jnp.zeros_like(beta[..., :1, :]), beta[..., :-1, :]], axis=-2
        )

        # strictly-lower pairs within sub-chunk: exp(bx_t - b_s) <= 0, s < t
        pair = bx_s[..., :, None, :] - bc_s[..., None, :, :]
        pair = jnp.where(tri[..., None], pair, -jnp.inf)
        A_diag = jnp.einsum("bhitd,bhisd,bhitsd->bhits", rf_s, kf_s, jnp.exp(pair))
        o_intra = ein("bhits,bhisv->bhitv", A_diag, vf_s)

        # u bonus (s == t)
        bonus = jnp.einsum("bhitd,hd->bhit", rf_s * kf_s, uf)
        o_intra = o_intra + bonus[..., None] * vf_s

        # cross sub-chunk (j < i), anchored factors all <= 0
        r_anch = rf_s * jnp.exp(bx_s - beta_prev[..., None, :])
        k_anch = kf_s * jnp.exp(beta[..., None, :] - bc_s)
        cross = beta_prev[..., :, None, :] - beta[..., None, :, :]
        cross = jnp.where(ij[..., None], cross, -jnp.inf)
        A_off = jnp.einsum(
            "bhitd,bhijd,bhjsd->bhijts",
            r_anch.astype(mm_dtype), jnp.exp(cross), k_anch.astype(mm_dtype),
            preferred_element_type=jnp.float32,
        )
        o_intra = o_intra + ein("bhijts,bhjsv->bhitv", A_off, vf_s)

        return new_state, o_inter + o_intra.reshape(b, h, C, dv)

    final_state, o = jax.lax.scan(chunk_body, initial_state, (rc, kc, vc, wc))
    o = jnp.moveaxis(o, 0, 2).reshape(b, h, T, dv)[:, :, :t]
    return o.astype(r.dtype), final_state.astype(state_dtype)
