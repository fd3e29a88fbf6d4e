"""Kernel parity: chunked GLA vs naive scan oracle; decode-step equivalence.

Mirrors the verification affordance the reference keeps in-code
(naive_recurrent_gla import at model/gla.py:21 as the oracle for the fused
kernels).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.ops import gla_scan_ref, gla_chunk, gla_decode_step
from lina_speech_tpu.ops.gla import gla_chunk_parallel


def make_inputs(key, b=2, h=2, t=100, dk=32, dv=48, reset=False, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, t, dk), dtype)
    k = jax.random.normal(ks[1], (b, h, t, dk), dtype)
    v = jax.random.normal(ks[2], (b, h, t, dv), dtype)
    # log-gates as the model produces them: logsigmoid(x)/16
    gk = jax.nn.log_sigmoid(jax.random.normal(ks[3], (b, h, t, dk))) / 16.0
    if reset:
        # hard resets like packed-sequence boundaries (reference gla.py:182-184)
        reset_pos = jax.random.bernoulli(ks[4], 0.05, (b, 1, t, 1))
        gk = jnp.where(reset_pos, -20.0, gk)
    return q, k, v, gk.astype(dtype)


@pytest.mark.parametrize("impl", [gla_chunk, gla_chunk_parallel])
@pytest.mark.parametrize("reset", [False, True])
@pytest.mark.parametrize("t", [100, 64, 17])
def test_chunk_matches_scan(impl, reset, t):
    q, k, v, gk = make_inputs(jax.random.PRNGKey(0), t=t, reset=reset)
    o_ref, s_ref = gla_scan_ref(q, k, v, gk)
    o_chk, s_chk = impl(q, k, v, gk, chunk_size=32, subchunk_size=8)
    np.testing.assert_allclose(np.asarray(o_chk), np.asarray(o_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


def test_chunk_with_initial_state():
    key = jax.random.PRNGKey(1)
    q, k, v, gk = make_inputs(key, t=48)
    s0 = jax.random.normal(jax.random.PRNGKey(7), (2, 2, 32, 48)).astype(jnp.float32)
    o_ref, s_ref = gla_scan_ref(q, k, v, gk, initial_state=s0)
    o_chk, s_chk = gla_chunk(q, k, v, gk, initial_state=s0, chunk_size=16, subchunk_size=4)
    np.testing.assert_allclose(np.asarray(o_chk), np.asarray(o_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


def test_decode_steps_match_parallel_forms():
    """Sequential decode (step mode) must equal the chunked training path."""
    q, k, v, gk = make_inputs(jax.random.PRNGKey(2), b=1, h=2, t=33, dk=16, dv=24)
    o_chk, s_chk = gla_chunk(q, k, v, gk, chunk_size=16, subchunk_size=4)

    state = jnp.zeros((1, 2, 16, 24), jnp.float32)
    outs = []
    for i in range(33):
        o_t, state = gla_decode_step(q[:, :, i], k[:, :, i], v[:, :, i], gk[:, :, i], state)
        outs.append(o_t)
    o_seq = jnp.stack(outs, axis=2)
    np.testing.assert_allclose(np.asarray(o_seq), np.asarray(o_chk), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state), np.asarray(s_chk), rtol=2e-4, atol=2e-4)


def test_chunk_grad_wrt_initial_state():
    """Init-state tuning backprops into S0 through the kernel (initial_state.py)."""
    q, k, v, gk = make_inputs(jax.random.PRNGKey(3), b=1, h=1, t=20, dk=8, dv=8)
    s0 = jnp.zeros((1, 1, 8, 8), jnp.float32)

    def loss_fn(s0):
        o, _ = gla_chunk(q, k, v, gk, initial_state=s0, chunk_size=8, subchunk_size=4)
        return jnp.sum(o ** 2)

    g = jax.grad(loss_fn)(s0)
    assert jnp.isfinite(g).all()
    assert jnp.abs(g).sum() > 0

    def loss_ref(s0):
        o, _ = gla_scan_ref(q, k, v, gk, initial_state=s0)
        return jnp.sum(o ** 2)

    g_ref = jax.grad(loss_ref)(s0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-3)


def test_chunk_grads_match_scan_grads():
    q, k, v, gk = make_inputs(jax.random.PRNGKey(4), b=1, h=1, t=24, dk=8, dv=8)

    def mk_loss(fn):
        def loss(q, k, v, gk):
            o, s = fn(q, k, v, gk)
            return jnp.sum(o ** 2) + jnp.sum(s ** 2)
        return loss

    g_chunk = jax.grad(mk_loss(lambda *a: gla_chunk(*a, chunk_size=8, subchunk_size=4)),
                       argnums=(0, 1, 2, 3))(q, k, v, gk)
    g_scan = jax.grad(mk_loss(gla_scan_ref), argnums=(0, 1, 2, 3))(q, k, v, gk)
    for gc, gs in zip(g_chunk, g_scan):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gs), rtol=5e-4, atol=5e-4)


def test_bf16_state_storage_decode():
    """bf16 recurrent-state storage: decode stays close to fp32 over ~30
    steps (math is fp32 either way; only storage rounds)."""
    q, k, v, gk = make_inputs(jax.random.PRNGKey(9), b=1, h=2, t=30, dk=16, dv=24)
    s32 = jnp.zeros((1, 2, 16, 24), jnp.float32)
    s16 = jnp.zeros((1, 2, 16, 24), jnp.bfloat16)
    o32, o16 = [], []
    for i in range(30):
        a, s32 = gla_decode_step(q[:, :, i], k[:, :, i], v[:, :, i], gk[:, :, i], s32)
        b_, s16 = gla_decode_step(q[:, :, i], k[:, :, i], v[:, :, i], gk[:, :, i], s16)
        o32.append(a)
        o16.append(b_)
    assert s16.dtype == jnp.bfloat16
    diff = jnp.abs(jnp.stack(o32) - jnp.stack(o16)).max()
    scale = jnp.abs(jnp.stack(o32)).max()
    assert float(diff) / float(scale) < 0.05


def test_bf16_io_fp32_state():
    q, k, v, gk = make_inputs(jax.random.PRNGKey(5), t=64, dtype=jnp.bfloat16)
    o, s = gla_chunk(q, k, v, gk, chunk_size=32)
    assert o.dtype == jnp.bfloat16
    assert s.dtype == jnp.float32
    o_ref, s_ref = gla_scan_ref(q, k, v, gk)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(o_ref, np.float32), rtol=0.1, atol=0.1
    )


def test_lazy_decode_matches_classic_steps():
    """Lazy micro-chunk decode (read-only base state + window buffers +
    periodic fold) is the chunk-scan math applied incrementally; outputs
    and the post-fold state must match the classic per-token recurrence."""
    from lina_speech_tpu.ops.gla import (
        gla_decode_lazy_fold, gla_decode_lazy_step,
    )

    q, k, v, gk = make_inputs(jax.random.PRNGKey(3), b=2, h=2, t=12, dk=16, dv=24)
    L = 4
    state_c = jnp.zeros((2, 2, 16, 24), jnp.float32)
    s_base = state_c
    kbuf = jnp.zeros((L, 2, 2, 16))
    vbuf = jnp.zeros((L, 2, 2, 24))
    cbuf = jnp.zeros((L, 2, 2, 16))
    cc = jnp.zeros((2, 2, 16))

    from lina_speech_tpu.ops import gla_decode_step

    for t in range(12):
        o_c, state_c = gla_decode_step(q[:, :, t], k[:, :, t], v[:, :, t],
                                       gk[:, :, t], state_c)
        o_l, kbuf, vbuf, cbuf, cc = gla_decode_lazy_step(
            q[:, :, t], k[:, :, t], v[:, :, t], gk[:, :, t],
            s_base, kbuf, vbuf, cbuf, cc, jnp.asarray(t % L))
        np.testing.assert_allclose(np.asarray(o_l), np.asarray(o_c),
                                   rtol=1e-5, atol=1e-5)
        if t % L == L - 1:
            # buffers stay stale by contract (step masks j > p); only cc
            # resets — same as the production fold caller in gla_layer.py
            s_base = gla_decode_lazy_fold(s_base, kbuf, vbuf, cbuf, cc)
            cc = jnp.zeros_like(cc)
            np.testing.assert_allclose(np.asarray(s_base), np.asarray(state_c),
                                       rtol=1e-5, atol=1e-5)
