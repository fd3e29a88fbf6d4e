"""RWKV6 Pallas chunk kernel parity vs the scan oracle (interpret on CPU).

Same pyramid as tests/test_gla_pallas.py: forward parity (incl. resets and
initial state), handwritten backward vs autodiff-of-scan, bf16 IO, and the
dp x tp custom-partitioning rule.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.ops.rwkv6 import rwkv6_scan_ref
from lina_speech_tpu.ops.rwkv6_pallas import rwkv6_chunk_pallas


def make_inputs(key, b=2, h=2, t=100, dk=32, dv=48, reset=False,
                dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    r = jax.random.normal(ks[0], (b, h, t, dk), dtype)
    k = jax.random.normal(ks[1], (b, h, t, dk), dtype)
    v = jax.random.normal(ks[2], (b, h, t, dv), dtype)
    # RWKV6 log-decays: w = -exp(logit), typically in (-e^2, 0)
    w = -jnp.exp(jax.random.normal(ks[3], (b, h, t, dk)) * 0.5 - 2.0)
    if reset:
        reset_pos = jax.random.bernoulli(ks[4], 0.05, (b, 1, t, 1))
        w = jnp.where(reset_pos, -20.0, w)
    u = (jax.random.normal(ks[5], (h, dk)) * 0.5).astype(jnp.float32)
    return r, k, v, w.astype(dtype), u


@pytest.mark.parametrize("t,reset", [(100, False), (128, True), (17, False)])
def test_rwkv6_pallas_matches_scan(t, reset):
    r, k, v, w, u = make_inputs(jax.random.PRNGKey(0), t=t, reset=reset,
                                dk=32, dv=64)
    o_ref, s_ref = rwkv6_scan_ref(r, k, v, w, u)
    o_pal, s_pal = rwkv6_chunk_pallas(r, k, v, w, u, chunk_size=32,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_rwkv6_pallas_with_initial_state():
    r, k, v, w, u = make_inputs(jax.random.PRNGKey(1), t=48, dk=32, dv=64)
    s0 = jax.random.normal(jax.random.PRNGKey(7), (2, 2, 32, 64)).astype(jnp.float32)
    o_ref, s_ref = rwkv6_scan_ref(r, k, v, w, u, initial_state=s0)
    o_pal, s_pal = rwkv6_chunk_pallas(r, k, v, w, u, initial_state=s0,
                                      chunk_size=16, interpret=True)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("res_dtype,tol", [(jnp.float32, 1e-3),
                                           (jnp.bfloat16, 5e-2)])
def test_rwkv6_pallas_grads_match_scan(res_dtype, tol):
    """Handwritten backward (incl. the split inclusive/exclusive gate
    cotangent and the accumulated du) vs autodiff of the scan oracle."""
    r, k, v, w, u = make_inputs(jax.random.PRNGKey(2), b=2, h=2, t=60,
                                dk=16, dv=16)
    s0 = jax.random.normal(jax.random.PRNGKey(8), (2, 2, 16, 16)).astype(jnp.float32)

    def loss_pal(r, k, v, w, u, s0):
        o, s = rwkv6_chunk_pallas(r, k, v, w, u, initial_state=s0,
                                  chunk_size=16, interpret=True,
                                  residual_dtype=res_dtype)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    def loss_ref(r, k, v, w, u, s0):
        o, s = rwkv6_scan_ref(r, k, v, w, u, initial_state=s0)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5))(r, k, v, w, u, s0)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(r, k, v, w, u, s0)
    for a, b in zip(g_pal, g_ref):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=tol, atol=tol)


def test_rwkv6_pallas_bf16_io():
    r, k, v, w, u = make_inputs(jax.random.PRNGKey(3), t=64, dk=32, dv=64,
                                dtype=jnp.bfloat16)
    o, s = rwkv6_chunk_pallas(r, k, v, w, u, chunk_size=32, interpret=True)
    assert o.dtype == jnp.bfloat16 and s.dtype == jnp.float32
    o_ref, _ = rwkv6_scan_ref(r, k, v, w, u)
    np.testing.assert_allclose(np.asarray(o, np.float32),
                               np.asarray(o_ref, np.float32),
                               rtol=0.1, atol=0.1)


def test_rwkv6_pallas_shards_over_batch_and_heads():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    r, k, v, w, u = make_inputs(jax.random.PRNGKey(4), b=4, h=2, t=64,
                                dk=16, dv=16)
    s0 = jax.random.normal(jax.random.PRNGKey(9), (4, 2, 16, 16)).astype(jnp.float32)

    def loss(args):
        o, s = rwkv6_chunk_pallas(*args, chunk_size=16, interpret=True,
                                  residual_dtype=jnp.float32)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    args = (r, k, v, w, u, s0)
    l_ref, g_ref = jax.value_and_grad(loss)(args)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    sh4 = NamedSharding(mesh, P("dp", "tp", None, None))
    shu = NamedSharding(mesh, P("tp", None))
    plan = (sh4, sh4, sh4, sh4, shu, sh4)
    args_s = tuple(jax.device_put(a, s) for a, s in zip(args, plan))
    f = jax.jit(jax.value_and_grad(loss))
    l_s, g_s = f(args_s)

    np.testing.assert_allclose(float(l_s), float(l_ref), rtol=1e-5)
    for a, b in zip(g_s, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
