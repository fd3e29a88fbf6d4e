"""Mamba selective-scan Pallas kernel parity vs the associative-scan oracle
(interpret mode on CPU). Mirrors tests/test_gla_pallas.py's structure."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.ops.mamba import selective_scan
from lina_speech_tpu.ops.mamba_pallas import mamba_scan_pallas


def _inputs(key, b=2, t=37, d=24, n=8, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (b, t, d), dtype)
    dt = jax.nn.softplus(jax.random.normal(ks[1], (b, t, d)) - 1.0)
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (b, t, n), dtype)
    C = jax.random.normal(ks[4], (b, t, n), dtype)
    D = jax.random.normal(ks[5], (d,))
    s0 = jax.random.normal(ks[6], (b, d, n)).astype(jnp.float32)
    return x, dt, A, B, C, D, s0


@pytest.mark.parametrize("t", [37, 32, 5])
def test_matches_oracle(t):
    x, dt, A, B, C, D, s0 = _inputs(jax.random.PRNGKey(0), t=t)
    y_ref, s_ref = selective_scan(x, dt, A, B, C, D, initial_state=s0)
    y, s = mamba_scan_pallas(x, dt, A, B, C, D, initial_state=s0,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_reset_mask_and_no_initial_state():
    x, dt, A, B, C, D, _ = _inputs(jax.random.PRNGKey(1), t=40)
    reset = jnp.zeros((2, 40), bool).at[:, 13].set(True).at[0, 29].set(True)
    y_ref, s_ref = selective_scan(x, dt, A, B, C, D, reset_mask=reset)
    y, s = mamba_scan_pallas(x, dt, A, B, C, D, reset_mask=reset,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_grads_match_oracle():
    x, dt, A, B, C, D, s0 = _inputs(jax.random.PRNGKey(2), t=35, d=12, n=4)

    def loss(fn, x, dt, A, B, C, D, s0):
        y, s = fn(x, dt, A, B, C, D, initial_state=s0)
        return jnp.sum(y ** 2) + jnp.sum(s ** 2)

    g_pal = jax.grad(lambda *a: loss(
        lambda *k, **kw: mamba_scan_pallas(*k, interpret=True, **kw), *a),
        argnums=tuple(range(7)))(x, dt, A, B, C, D, s0)
    g_ref = jax.grad(lambda *a: loss(selective_scan, *a),
                     argnums=tuple(range(7)))(x, dt, A, B, C, D, s0)
    names = ["x", "dt", "A", "B", "C", "D", "s0"]
    for nm, a, b in zip(names, g_pal, g_ref):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_bf16_io():
    x, dt, A, B, C, D, s0 = _inputs(jax.random.PRNGKey(3), t=32,
                                    dtype=jnp.bfloat16)
    y_ref, s_ref = selective_scan(x, dt, A, B, C, D, initial_state=s0)
    y, s = mamba_scan_pallas(x, dt, A, B, C, D, initial_state=s0,
                             interpret=True)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=0.1, atol=0.1)


def test_shards_over_batch():
    """dp sharding: per-shard kernel, batch-psum of the A/D grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x, dt, A, B, C, D, s0 = _inputs(jax.random.PRNGKey(4), b=8, t=32,
                                    d=12, n=4)

    def loss(args):
        x, dt, A, B, C, D, s0 = args
        y, s = mamba_scan_pallas(x, dt, A, B, C, D, initial_state=s0,
                                 interpret=True)
        return jnp.sum(y ** 2) + jnp.sum(s ** 2)

    args = (x, dt, A, B, C, D, s0)
    l_ref, g_ref = jax.value_and_grad(loss)(args)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
    shb = NamedSharding(mesh, P("dp"))
    shr = NamedSharding(mesh, P())
    plan = [shb, shb, shr, shb, shb, shr, shb]
    args_s = tuple(jax.device_put(a, s) for a, s in zip(args, plan))
    f = jax.jit(jax.value_and_grad(loss))
    l_s, g_s = f(args_s)
    np.testing.assert_allclose(float(l_s), float(l_ref), rtol=1e-5)
    for a, b in zip(g_s, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
