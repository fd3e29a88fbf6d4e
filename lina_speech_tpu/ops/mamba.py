"""Selective SSM (Mamba v1) scan ops.

TPU-native replacement for the reference's external ``mamba_ssm`` CUDA
selective-scan (model/mamba.py:13-14): the diagonal linear recurrence

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t        (per channel, state n)
    y_t = C_t . h_t + D * x_t

is evaluated with ``jax.lax.associative_scan`` over time (log-depth, maps
to large fused VPU ops on TPU) for training, and a fused single step for
decode.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def selective_scan(
    x: Array,       # (b, t, d) post-conv activations
    dt: Array,      # (b, t, d) positive step sizes (softplus applied)
    A: Array,       # (d, n) negative
    B: Array,       # (b, t, n)
    C: Array,       # (b, t, n)
    D: Array,       # (d,)
    initial_state: Optional[Array] = None,  # (b, d, n)
    reset_mask: Optional[Array] = None,     # (b, t) True -> state wiped BEFORE step
    mode: str = "auto",  # auto | pallas | scan
) -> Tuple[Array, Array]:
    """Returns (y (b, t, d), final_state (b, d, n) fp32).

    ``mode="auto"`` routes to the Pallas sequential-scan kernel on TPU
    (state resident in VMEM — the associative scan materializes
    (b, t, d, n) fp32 intermediates, ~0.5 GB at flagship-variant shapes)
    and the XLA associative scan elsewhere; ``"scan"`` is the explicit
    XLA escape (same role as the GLA layer's kernel_mode knob)."""
    if mode == "auto":
        mode = "pallas" if jax.default_backend() == "tpu" else "scan"
    if mode == "pallas":
        from lina_speech_tpu.ops.mamba_pallas import mamba_scan_pallas

        return mamba_scan_pallas(x, dt, A, B, C, D,
                                 initial_state=initial_state,
                                 reset_mask=reset_mask)
    b, t, d = x.shape
    n = A.shape[-1]
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Af = A.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)

    dA = jnp.exp(dtf[..., None] * Af[None, None])          # (b, t, d, n)
    dBx = (dtf * xf)[..., None] * Bf[:, :, None, :]         # (b, t, d, n)
    if reset_mask is not None:
        # zero the carry (decay) at packed-sequence starts; input term intact
        dA = jnp.where(reset_mask[:, :, None, None], 0.0, dA)

    if initial_state is not None:
        # fold the initial state in as a virtual first step with decay 1
        dA = jnp.concatenate([jnp.ones((b, 1, d, n), jnp.float32), dA], axis=1)
        dBx = jnp.concatenate([initial_state[:, None].astype(jnp.float32), dBx], axis=1)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    a_cum, h = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
    if initial_state is not None:
        h = h[:, 1:]
    y = jnp.einsum("btdn,btn->btd", h, Cf) + xf * D.astype(jnp.float32)[None, None]
    state_dtype = jnp.float32 if initial_state is None else initial_state.dtype
    return y.astype(x.dtype), h[:, -1].astype(state_dtype)


def selective_step(
    x: Array, dt: Array, A: Array, B: Array, C: Array, D: Array, state: Array
) -> Tuple[Array, Array]:
    """One token. x/dt: (b, d); B/C: (b, n); state: (b, d, n)."""
    out_dtype = state.dtype
    xf, dtf = x.astype(jnp.float32), dt.astype(jnp.float32)
    dA = jnp.exp(dtf[..., None] * A.astype(jnp.float32)[None])
    dBx = (dtf * xf)[..., None] * B.astype(jnp.float32)[:, None, :]
    state = dA * state.astype(jnp.float32) + dBx
    y = jnp.einsum("bdn,bn->bd", state, C.astype(jnp.float32)) + xf * D.astype(jnp.float32)[None]
    return y.astype(x.dtype), state.astype(out_dtype)
