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

    rf = r.astype(jnp.float32).reshape(b, h, nc, C, dk)
    kf = k.astype(jnp.float32).reshape(b, h, nc, C, dk)
    vf = v.astype(jnp.float32).reshape(b, h, nc, C, dv)
    wf = w.astype(jnp.float32).reshape(b, h, nc, C, dk)
    uf = u.astype(jnp.float32)

    bc = jnp.cumsum(wf, axis=3)          # inclusive
    bx = bc - wf                          # exclusive
    b_total = bc[:, :, :, -1]

    # ---- inter-chunk ----
    k_to_end = kf * jnp.exp(b_total[:, :, :, None] - bc)
    chunk_kv = jnp.einsum("bhcsk,bhcsv->bhckv", k_to_end, vf)
    r_in = rf * jnp.exp(bx)  # decay from chunk start to t-1

    def chunk_step(state, inp):
        r_c, kv_c, dtot_c = inp
        o_inter = jnp.einsum("bhsk,bhkv->bhsv", r_c, state)
        state = jnp.exp(dtot_c)[..., None] * state + kv_c
        return state, o_inter

    xs = (jnp.moveaxis(r_in, 2, 0), jnp.moveaxis(chunk_kv, 2, 0),
          jnp.moveaxis(b_total, 2, 0))
    final_state, o_inter = jax.lax.scan(chunk_step, initial_state, xs)
    o_inter = jnp.moveaxis(o_inter, 0, 2)

    # ---- intra-chunk ----
    shp = (b, h, nc, ns, S, dk)
    rf_s = rf.reshape(shp)
    kf_s = kf.reshape(shp)
    vf_s = vf.reshape(b, h, nc, ns, S, dv)
    bc_s = bc.reshape(shp)
    bx_s = bx.reshape(shp)
    beta = bc_s[..., -1, :]
    beta_prev = jnp.concatenate(
        [jnp.zeros_like(beta[..., :1, :]), beta[..., :-1, :]], axis=-2
    )

    # within sub-chunk, strictly-lower pairs: exp(bx_t - b_s) <= 0 for s < t
    pair = bx_s[..., :, None, :] - bc_s[..., None, :, :]
    tri = jnp.tril(jnp.ones((S, S), dtype=bool), -1)
    pair = jnp.where(tri[..., None], pair, -jnp.inf)
    A_diag = jnp.einsum("bhcitd,bhcisd,bhcitsd->bhcits", rf_s, kf_s, jnp.exp(pair))
    o_diag = jnp.einsum("bhcits,bhcisv->bhcitv", A_diag, vf_s)

    # u bonus (s == t): o_t += (sum_d r_d u_d k_d) v_t
    bonus = jnp.einsum("bhcitd,hd->bhcit", rf_s * kf_s, uf)
    o_bonus = bonus[..., None] * vf_s

    # cross sub-chunk (j < i): exp(bx_t - beta_prev_i) * exp(beta_prev_i -
    # beta_j) * exp(beta_j - b_s); all exponents <= 0.
    r_anch = rf_s * jnp.exp(bx_s - beta_prev[..., None, :])
    k_anch = kf_s * jnp.exp(beta[..., None, :] - bc_s)
    cross = beta_prev[..., :, None, :] - beta[..., None, :, :]
    ij = jnp.tril(jnp.ones((ns, ns), dtype=bool), -1)
    cross = jnp.where(ij[..., None], cross, -jnp.inf)
    A_off = jnp.einsum("bhcitd,bhcijd,bhcjsd->bhcijts", r_anch, jnp.exp(cross), k_anch)
    o_off = jnp.einsum("bhcijts,bhcjsv->bhcitv", A_off, vf_s)

    o = o_inter + (o_diag + o_bonus + o_off).reshape(b, h, nc, C, dv)
    o = o.reshape(b, h, T, dv)[:, :, :t]
    return o.astype(r.dtype), final_state.astype(state_dtype)
