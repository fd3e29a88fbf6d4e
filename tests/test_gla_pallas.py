"""Pallas chunked GLA kernel parity vs the scan oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.ops import gla_scan_ref
from lina_speech_tpu.ops.gla_pallas import gla_chunk_pallas

from test_gla_kernels import make_inputs


@pytest.mark.parametrize("t,reset", [(100, False), (128, True), (17, False)])
def test_pallas_chunk_matches_scan(t, reset):
    q, k, v, gk = make_inputs(jax.random.PRNGKey(0), t=t, reset=reset, dk=32, dv=64)
    o_ref, s_ref = gla_scan_ref(q, k, v, gk)
    o_pal, s_pal = gla_chunk_pallas(q, k, v, gk, chunk_size=32, interpret=True)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


def test_pallas_with_initial_state():
    q, k, v, gk = make_inputs(jax.random.PRNGKey(1), t=48, dk=32, dv=64)
    s0 = jax.random.normal(jax.random.PRNGKey(7), (2, 2, 32, 64)).astype(jnp.float32)
    o_ref, s_ref = gla_scan_ref(q, k, v, gk, initial_state=s0)
    o_pal, s_pal = gla_chunk_pallas(q, k, v, gk, initial_state=s0, chunk_size=16, interpret=True)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("res_dtype,tol", [(jnp.float32, 1e-3), (jnp.bfloat16, 5e-2)])
def test_pallas_grads_match_xla_path(res_dtype, tol):
    """Handwritten Pallas backward vs autodiff-of-scan (exact with fp32
    residual states; bf16 residuals add ~0.3% relative error)."""
    q, k, v, gk = make_inputs(jax.random.PRNGKey(2), b=2, h=2, t=60, dk=16, dv=16)
    s0 = jax.random.normal(jax.random.PRNGKey(8), (2, 2, 16, 16)).astype(jnp.float32)

    def loss_pal(q, k, v, gk, s0):
        o, s = gla_chunk_pallas(q, k, v, gk, initial_state=s0, chunk_size=16,
                                interpret=True, residual_dtype=res_dtype)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    def loss_ref(q, k, v, gk, s0):
        o, s = gla_scan_ref(q, k, v, gk, initial_state=s0)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(q, k, v, gk, s0)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, gk, s0)
    for a, b in zip(g_pal, g_ref):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   rtol=tol, atol=tol)


def test_fused_decode_matches_reference():
    from lina_speech_tpu.ops.gla import gla_decode_step
    from lina_speech_tpu.ops.gla_pallas import gla_decode_fused

    q, k, v, gk = make_inputs(jax.random.PRNGKey(4), b=2, h=2, t=8, dk=32, dv=64)
    for dtype in (jnp.float32, jnp.bfloat16):
        state_a = jnp.zeros((2, 2, 32, 64), dtype)
        state_b = jnp.zeros((2, 2, 32, 64), dtype)
        for i in range(8):
            o_a, state_a = gla_decode_step(q[:, :, i], k[:, :, i], v[:, :, i],
                                           gk[:, :, i], state_a)
            o_b, state_b = gla_decode_fused(q[:, :, i], k[:, :, i], v[:, :, i],
                                            gk[:, :, i], state_b, interpret=True,
                                            donate=False)
            np.testing.assert_allclose(
                np.asarray(o_a, np.float32), np.asarray(o_b, np.float32),
                rtol=5e-2 if dtype == jnp.bfloat16 else 2e-5,
                atol=5e-2 if dtype == jnp.bfloat16 else 2e-5,
            )
        tol = 1e-2 if dtype == jnp.bfloat16 else 1e-5  # bf16: one-ulp ties
        np.testing.assert_allclose(
            np.asarray(state_a, np.float32), np.asarray(state_b, np.float32),
            rtol=tol, atol=tol,
        )


def _conv_decode_inputs(key, b=2, h=2, dk=32, dv=64, w=4, dtype=jnp.float32):
    ks = jax.random.split(key, 9)
    n = lambda i, *shape: jax.random.normal(ks[i], shape, dtype)
    xq, xk = n(0, b, h, dk), n(1, b, h, dk)
    xv = n(2, b, h, dv)
    gk = (jax.nn.log_sigmoid(jax.random.normal(ks[3], (b, h, dk))) / 16.0
          ).astype(dtype)
    wq, wk = n(4, w, h, dk) * 0.5, n(5, w, h, dk) * 0.5
    wv = n(6, w, h, dv) * 0.5
    cq, ck = n(7, w, b, h, dk), jax.random.normal(ks[7], (w, b, h, dk), dtype)
    cv = n(8, w, b, h, dv)
    state = jax.random.normal(jax.random.PRNGKey(99), (b, h, dk, dv)).astype(dtype)
    return xq, xk, xv, gk, wq, wk, wv, cq, ck, cv, state


def _conv_decode_ref(xq, xk, xv, gk, wq, wk, wv, cq, ck, cv, state):
    """Oracle: unfused short_conv_step + gla_decode_step on merged channels."""
    from lina_speech_tpu.ops.gla import gla_decode_step
    from lina_speech_tpu.ops.short_conv import short_conv_step

    b, h, dk = xq.shape
    dv = xv.shape[-1]
    w = cq.shape[0]
    mrg = lambda z, d: z.reshape(z.shape[0], b, h * d) if z.ndim == 4 else z.reshape(b, h * d)
    taps = lambda m, d: m.transpose(1, 2, 0).reshape(h * d, w)  # (w,h,d)->(dim,w)
    q, cq2 = short_conv_step(mrg(xq, dk), mrg(cq, dk), taps(wq, dk))
    k, ck2 = short_conv_step(mrg(xk, dk), mrg(ck, dk), taps(wk, dk))
    v, cv2 = short_conv_step(mrg(xv, dv), mrg(cv, dv), taps(wv, dv))
    o, s = gla_decode_step(q.reshape(b, h, dk), k.reshape(b, h, dk),
                           v.reshape(b, h, dv), gk, state)
    rs = lambda z, d: z.reshape(w, b, h, d)
    return o, s, rs(cq2, dk), rs(ck2, dk), rs(cv2, dv)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 5e-2)])
def test_conv_fused_decode_matches_reference(dtype, tol):
    from lina_speech_tpu.ops.gla_pallas import gla_decode_conv_fused

    args = _conv_decode_inputs(jax.random.PRNGKey(5), dtype=dtype)
    ref = _conv_decode_ref(*args)
    out = gla_decode_conv_fused(*args, interpret=True, donate=False)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=tol, atol=tol)


def test_conv_fused_decode_shards_over_batch_and_heads():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from lina_speech_tpu.ops.gla_pallas import gla_decode_conv_fused

    args = _conv_decode_inputs(jax.random.PRNGKey(13), b=4, h=2, dk=16, dv=32)
    ref = _conv_decode_ref(*args)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    sh = {
        3: NamedSharding(mesh, P("dp", "tp", None)),          # b h d
        4: NamedSharding(mesh, P(None, "tp", None)),          # w h d (taps)
        "ring": NamedSharding(mesh, P(None, "dp", "tp", None)),
        "state": NamedSharding(mesh, P("dp", "tp", None, None)),
    }
    plan = [sh[3]] * 4 + [sh[4]] * 3 + [sh["ring"]] * 3 + [sh["state"]]
    args_s = tuple(jax.device_put(a, s) for a, s in zip(args, plan))
    f = jax.jit(lambda *a: gla_decode_conv_fused(*a, interpret=True,
                                                 donate=False))
    out = f(*args_s)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    assert "all-gather" not in f.lower(*args_s).compile().as_text()
    assert out[1].sharding.is_equivalent_to(sh["state"], 4)


def test_rwkv6_fused_decode_matches_reference():
    from lina_speech_tpu.ops.gla_pallas import rwkv6_decode_fused
    from lina_speech_tpu.ops.rwkv6 import rwkv6_decode_step

    ks = jax.random.split(jax.random.PRNGKey(6), 5)
    b, h, dk, dv = 2, 2, 32, 64
    r = jax.random.normal(ks[0], (b, h, dk))
    k = jax.random.normal(ks[1], (b, h, dk))
    v = jax.random.normal(ks[2], (b, h, dv))
    w = -jnp.exp(jax.random.normal(ks[3], (b, h, dk)) * 0.5 - 2.0)
    u = jax.random.normal(ks[4], (h, dk)) * 0.5
    state = jax.random.normal(jax.random.PRNGKey(7), (b, h, dk, dv)).astype(jnp.float32)
    o_a, s_a = rwkv6_decode_step(r, k, v, w, u, state)
    o_b, s_b = rwkv6_decode_fused(r, k, v, w, u, state, interpret=True,
                                  donate=False)
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_b), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b), rtol=2e-5, atol=2e-5)


def test_pallas_bf16_io():
    q, k, v, gk = make_inputs(jax.random.PRNGKey(3), t=64, dk=32, dv=64, dtype=jnp.bfloat16)
    o, s = gla_chunk_pallas(q, k, v, gk, chunk_size=32, interpret=True)
    assert o.dtype == jnp.bfloat16 and s.dtype == jnp.float32
    o_ref, _ = gla_scan_ref(q, k, v, gk)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(o_ref, np.float32), rtol=0.1, atol=0.1
    )


def test_pallas_shards_over_batch_and_heads():
    """The custom-partitioning rule runs the kernel per-shard on a dp x tp
    mesh (no all-gather of the sequence), with grads matching the
    single-device path exactly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    q, k, v, gk = make_inputs(jax.random.PRNGKey(4), b=4, h=2, t=64, dk=16, dv=16)
    s0 = jax.random.normal(jax.random.PRNGKey(9), (4, 2, 16, 16)).astype(jnp.float32)

    def loss(args):
        o, s = gla_chunk_pallas(*args, chunk_size=16, interpret=True,
                                residual_dtype=jnp.float32)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    args = (q, k, v, gk, s0)
    l_ref, g_ref = jax.value_and_grad(loss)(args)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    sh = NamedSharding(mesh, P("dp", "tp", None, None))
    args_s = tuple(jax.device_put(a, sh) for a in args)
    f = jax.jit(jax.value_and_grad(loss))
    l_s, g_s = f(args_s)

    np.testing.assert_allclose(float(l_s), float(l_ref), rtol=1e-5)
    for a, b in zip(g_s, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    assert "all-gather" not in f.lower(args_s).compile().as_text()


def test_fused_decode_shards_over_batch_and_heads():
    """The fused decode kernels partition over a dp x tp mesh, keeping the
    recurrent state distributed (no all-gather of (b, h, dk, dv))."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from lina_speech_tpu.ops.gla_pallas import gla_decode_fused
    from lina_speech_tpu.ops.gla import gla_decode_step

    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    b, h, dk, dv = 4, 2, 16, 32
    q = jax.random.normal(ks[0], (b, h, dk))
    k = jax.random.normal(ks[1], (b, h, dk))
    v = jax.random.normal(ks[2], (b, h, dv))
    g = -jnp.abs(jax.random.normal(ks[3], (b, h, dk))) * 0.1
    s = jax.random.normal(jax.random.PRNGKey(12), (b, h, dk, dv)).astype(jnp.float32)

    o_ref, s_ref = gla_decode_step(q, k, v, g, s)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    sh3 = NamedSharding(mesh, P("dp", "tp", None))
    sh4 = NamedSharding(mesh, P("dp", "tp", None, None))
    args = (jax.device_put(q, sh3), jax.device_put(k, sh3),
            jax.device_put(v, sh3), jax.device_put(g, sh3),
            jax.device_put(s, sh4))
    f = jax.jit(lambda *a: gla_decode_fused(*a, interpret=True, donate=False))
    o_s, s_s = f(*args)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_ref), rtol=2e-5, atol=2e-5)
    txt = f.lower(*args).compile().as_text()
    assert "all-gather" not in txt
    # the new state comes back still sharded over the mesh
    assert s_s.sharding.is_equivalent_to(sh4, 4)


# ------------------------- conv-fused chunk kernel -------------------------

def _conv_chunk_inputs(key, b=2, h=2, t=40, dk=16, dv=32, w=4,
                       dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    n = lambda i, *shape: jax.random.normal(ks[i], shape, dtype)
    xq, xk = n(0, b, h, t, dk), n(1, b, h, t, dk)
    xv = n(2, b, h, t, dv)
    gk = (jax.nn.log_sigmoid(jax.random.normal(ks[3], (b, h, t, dk))) / 16.0
          ).astype(dtype)
    wq = (n(4, h * dk, w) * 0.5).astype(jnp.float32)
    wk = (n(5, h * dk, w) * 0.5).astype(jnp.float32)
    wv = (n(6, h * dv, w) * 0.5).astype(jnp.float32)
    s0 = jax.random.normal(ks[7], (b, h, dk, dv)).astype(jnp.float32)
    return xq, xk, xv, gk, wq, wk, wv, s0


def _conv_chunk_ref(xq, xk, xv, gk, wq, wk, wv, s0):
    """Oracle: unfused causal conv on merged channels + scan-oracle GLA."""
    from lina_speech_tpu.ops.short_conv import causal_depthwise_conv

    b, h, t, dk = xq.shape
    dv = xv.shape[-1]
    mrg = lambda z, d: z.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    spl = lambda z, d: z.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    q = spl(causal_depthwise_conv(mrg(xq, dk), wq.astype(xq.dtype)), dk)
    k = spl(causal_depthwise_conv(mrg(xk, dk), wk.astype(xk.dtype)), dk)
    v = spl(causal_depthwise_conv(mrg(xv, dv), wv.astype(xv.dtype)), dv)
    return gla_scan_ref(q, k, v, gk, initial_state=s0)


@pytest.mark.parametrize("t", [40, 32, 7])
def test_conv_fused_chunk_matches_unfused(t):
    from lina_speech_tpu.ops.gla_pallas import gla_chunk_conv_pallas

    args = _conv_chunk_inputs(jax.random.PRNGKey(20), t=t)
    o_ref, s_ref = _conv_chunk_ref(*args)
    xq, xk, xv, gk, wq, wk, wv, s0 = args
    o, s = gla_chunk_conv_pallas(xq, xk, xv, gk, wq, wk, wv,
                                 initial_state=s0, chunk_size=16,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_conv_fused_chunk_bf16_io():
    from lina_speech_tpu.ops.gla_pallas import gla_chunk_conv_pallas

    args = _conv_chunk_inputs(jax.random.PRNGKey(21), t=48, dtype=jnp.bfloat16)
    o_ref, s_ref = _conv_chunk_ref(*args)
    xq, xk, xv, gk, wq, wk, wv, s0 = args
    o, s = gla_chunk_conv_pallas(xq, xk, xv, gk, wq, wk, wv,
                                 initial_state=s0, chunk_size=16,
                                 interpret=True)
    assert o.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o, np.float32),
                               np.asarray(o_ref, np.float32),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(s, np.float32),
                               np.asarray(s_ref, np.float32),
                               rtol=0.1, atol=0.1)


def test_conv_fused_chunk_grads():
    """Grads through the fused kernel (incl. the conv taps) vs autodiff of
    the unfused composition."""
    from lina_speech_tpu.ops.gla_pallas import gla_chunk_conv_pallas

    args = _conv_chunk_inputs(jax.random.PRNGKey(22), t=40)

    def loss_fused(*a):
        xq, xk, xv, gk, wq, wk, wv, s0 = a
        o, s = gla_chunk_conv_pallas(xq, xk, xv, gk, wq, wk, wv,
                                     initial_state=s0, chunk_size=16,
                                     interpret=True,
                                     residual_dtype=jnp.float32)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    def loss_ref(*a):
        o, s = _conv_chunk_ref(*a)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    g_f = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    g_r = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for a, b in zip(g_f, g_r):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=2e-3, atol=2e-3)


def test_conv_fused_chunk_shards_over_batch_and_heads():
    """dp x tp sharding: per-shard kernel + batch-psum of the tap grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from lina_speech_tpu.ops.gla_pallas import gla_chunk_conv_pallas

    args = _conv_chunk_inputs(jax.random.PRNGKey(23), b=4, h=2, t=32)

    def loss(a):
        xq, xk, xv, gk, wq, wk, wv, s0 = a
        o, s = gla_chunk_conv_pallas(xq, xk, xv, gk, wq, wk, wv,
                                     initial_state=s0, chunk_size=16,
                                     interpret=True,
                                     residual_dtype=jnp.float32)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(args)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    sh4 = NamedSharding(mesh, P("dp", "tp", None, None))
    h = args[0].shape[1]
    shw = NamedSharding(mesh, P(None, None))  # (full_dim, w) taps replicate
    plan = [sh4] * 4 + [shw] * 3 + [sh4]
    args_s = tuple(jax.device_put(a, s) for a, s in zip(args, plan))
    f = jax.jit(jax.value_and_grad(loss))
    l_s, g_s = f(args_s)
    np.testing.assert_allclose(float(l_s), float(l_ref), rtol=1e-5)
    for a, b in zip(g_s, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------- lazy fused path
def _lazy_ref_window(args, L):
    """Oracle: XLA conv steps + gla_decode_lazy_step + gla_decode_lazy_fold
    over one full window of fresh tokens."""
    from lina_speech_tpu.ops.gla import (
        gla_decode_lazy_fold, gla_decode_lazy_step,
    )
    from lina_speech_tpu.ops.short_conv import short_conv_step

    xqs, xks, xvs, gks, wq, wk, wv, cq, ck, cv, state = args
    b, h, dk = xqs[0].shape
    dv = xvs[0].shape[-1]
    w = cq.shape[0]
    mrg = lambda z, d: (z.reshape(z.shape[0], b, h * d) if z.ndim == 4
                        else z.reshape(b, h * d))
    taps = lambda m, d: m.transpose(1, 2, 0).reshape(h * d, w)
    bufdt = xqs[0].dtype
    kbuf = jnp.zeros((L, b, h, dk), bufdt)
    vbuf = jnp.zeros((L, b, h, dv), bufdt)
    cbuf = jnp.zeros((L, b, h, dk), jnp.float32)
    cc = jnp.zeros((b, h, dk), jnp.float32)
    cq2, ck2, cv2 = mrg(cq, dk), mrg(ck, dk), mrg(cv, dv)
    os = []
    for p in range(L):
        q, cq2 = short_conv_step(mrg(xqs[p], dk), cq2, taps(wq, dk))
        k, ck2 = short_conv_step(mrg(xks[p], dk), ck2, taps(wk, dk))
        v, cv2 = short_conv_step(mrg(xvs[p], dv), cv2, taps(wv, dv))
        o, kbuf, vbuf, cbuf, cc = gla_decode_lazy_step(
            q.reshape(b, h, dk), k.reshape(b, h, dk), v.reshape(b, h, dv),
            gks[p], state, kbuf, vbuf, cbuf, cc, jnp.int32(p))
        os.append(o)
    s = gla_decode_lazy_fold(state, kbuf, vbuf, cbuf, cc)
    return os, s


def _lazy_inputs(key, b=2, h=2, dk=16, dv=32, w=4, L=4, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    n = lambda i, *s: jax.random.normal(ks[i], s, dtype)
    xqs = [n(0, b, h, dk) * (i + 1) * 0.3 for i in range(L)]
    xks = [n(1, b, h, dk) * (L - i) * 0.3 for i in range(L)]
    xvs = [n(2, b, h, dv) for _ in range(L)]
    gks = [-jnp.abs(n(3, b, h, dk)) * 0.1 for _ in range(L)]
    wq, wk = n(4, w, h, dk) * 0.5, n(5, w, h, dk) * 0.5
    wv = n(6, w, h, dv) * 0.5
    cq, ck = n(7, w, b, h, dk), n(8, w, b, h, dk)
    cv = n(9, w, b, h, dv)
    state = jax.random.normal(ks[10], (b, h, dk, dv)).astype(jnp.bfloat16)
    return xqs, xks, xvs, gks, wq, wk, wv, cq, ck, cv, state


@pytest.mark.parametrize("L", [4, 8])
def test_lazy_conv_fused_window_matches_reference(L):
    from lina_speech_tpu.ops.gla_pallas import (
        gla_decode_lazy_conv_fused, gla_fold_fused,
    )

    args = _lazy_inputs(jax.random.PRNGKey(5), L=L)
    ref_os, ref_s = _lazy_ref_window(args, L)

    xqs, xks, xvs, gks, wq, wk, wv, cq, ck, cv, state = args
    b, h, dk = xqs[0].shape
    dv = xvs[0].shape[-1]
    kbuf = jnp.zeros((L, b, h, dk), xqs[0].dtype)
    vbuf = jnp.zeros((L, b, h, dv), xqs[0].dtype)
    cbuf = jnp.zeros((L, b, h, dk), jnp.float32)
    cc = jnp.zeros((b, h, dk), jnp.float32)
    for p in range(L):
        o, cq, ck, cv, kbuf, vbuf, cbuf, cc = gla_decode_lazy_conv_fused(
            xqs[p], xks[p], xvs[p], gks[p], wq, wk, wv, cq, ck, cv,
            state, kbuf, vbuf, cbuf, cc, jnp.int32(p),
            interpret=True, donate=False)
        # bf16 state readout on the MXU vs f32 VPU oracle: bf16-level tol
        np.testing.assert_allclose(np.asarray(o, np.float32),
                                   np.asarray(ref_os[p], np.float32),
                                   rtol=2e-2, atol=2e-2)
    s = gla_fold_fused(state, kbuf, vbuf, cbuf, cc, interpret=True,
                       donate=False)
    np.testing.assert_allclose(np.asarray(s, np.float32),
                               np.asarray(ref_s, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_lazy_conv_fused_shards_over_batch_and_heads():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from lina_speech_tpu.ops.gla_pallas import (
        gla_decode_lazy_conv_fused, gla_fold_fused,
    )

    L = 4
    args = _lazy_inputs(jax.random.PRNGKey(7), b=4, h=2, L=L)
    xqs, xks, xvs, gks, wq, wk, wv, cq, ck, cv, state = args
    b, h, dk = xqs[0].shape
    dv = xvs[0].shape[-1]
    kbuf = jnp.zeros((L, b, h, dk), xqs[0].dtype)
    vbuf = jnp.zeros((L, b, h, dv), xqs[0].dtype)
    cbuf = jnp.zeros((L, b, h, dk), jnp.float32)
    cc = jnp.zeros((b, h, dk), jnp.float32)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    row = NamedSharding(mesh, P("dp", "tp", None))
    tm = NamedSharding(mesh, P(None, "dp", "tp", None))
    tap = NamedSharding(mesh, P(None, "tp", None))
    st = NamedSharding(mesh, P("dp", "tp", None, None))
    put = jax.device_put
    f = jax.jit(lambda *a: gla_decode_lazy_conv_fused(
        *a, interpret=True, donate=False))
    o, cq2, ck2, cv2, kb2, vb2, cb2, cc2 = f(
        put(xqs[0], row), put(xks[0], row), put(xvs[0], row),
        put(gks[0], row), put(wq, tap), put(wk, tap), put(wv, tap),
        put(cq, tm), put(ck, tm), put(cv, tm), put(state, st),
        put(kbuf, tm), put(vbuf, tm), put(cbuf, tm), put(cc, row),
        jnp.int32(0))
    assert o.sharding.is_equivalent_to(row, 3)
    g = jax.jit(lambda *a: gla_fold_fused(*a, interpret=True, donate=False))
    s = g(put(state, st), put(kb2, tm), put(vb2, tm), put(cb2, tm),
          put(cc2, row))
    assert s.sharding.is_equivalent_to(st, 4)


# ------------------------------------------------------- int8 state (lazy)
def test_lazy_int8_state_kernels_match_oracle():
    """Fused int8-state step/fold vs the XLA _q oracles (ops/gla.py)."""
    from lina_speech_tpu.ops.gla import (
        gla_decode_lazy_fold_q, gla_decode_lazy_step_q, quantize_state_rows,
    )
    from lina_speech_tpu.ops.gla_pallas import gla_fold_fused_q

    b, h, dk, dv, L = 2, 2, 16, 32, 4
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    s = jax.random.normal(ks[0], (b, h, dk, dv)) * 0.1
    sq, sc = quantize_state_rows(s)
    kb = jax.random.normal(ks[1], (L, b, h, dk), jnp.bfloat16)
    vb = jax.random.normal(ks[2], (L, b, h, dv), jnp.bfloat16)
    cb = -jnp.abs(jax.random.normal(ks[3], (L, b, h, dk))) * 0.1
    cc = cb[0] * 0 - 0.3
    a_q, a_sc = gla_fold_fused_q(sq, sc, kb, vb, cb, cc, interpret=True,
                                 donate=False)
    r_q, r_sc = gla_decode_lazy_fold_q(sq, sc, kb, vb, cb, cc)
    # bf16 kdec in-kernel vs f32 oracle: off-by-one int at most
    assert np.abs(np.asarray(a_q, np.int32) - np.asarray(r_q, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(a_sc), np.asarray(r_sc),
                               rtol=5e-3, atol=1e-7)

    # step readout parity through the fused conv kernel with s_scale
    from lina_speech_tpu.ops.gla_pallas import gla_decode_lazy_conv_fused

    args = _lazy_inputs(jax.random.PRNGKey(5), L=L)
    xqs, xks, xvs, gks, wq, wk, wv, cq, ck, cv, state = args
    b, h, dk = xqs[0].shape
    dv = xvs[0].shape[-1]
    sq2, sc2 = quantize_state_rows(state)
    kbuf = jnp.zeros((L, b, h, dk), xqs[0].dtype)
    vbuf = jnp.zeros((L, b, h, dv), xqs[0].dtype)
    cbuf = jnp.zeros((L, b, h, dk), jnp.float32)
    ccz = jnp.zeros((b, h, dk), jnp.float32)
    o_q, *_ = gla_decode_lazy_conv_fused(
        xqs[0], xks[0], xvs[0], gks[0], wq, wk, wv, cq, ck, cv,
        sq2, kbuf, vbuf, cbuf, ccz, jnp.int32(0),
        interpret=True, donate=False, s_scale=sc2)
    o_f, *_ = gla_decode_lazy_conv_fused(
        xqs[0], xks[0], xvs[0], gks[0], wq, wk, wv, cq, ck, cv,
        state, kbuf, vbuf, cbuf, ccz, jnp.int32(0),
        interpret=True, donate=False)
    # int8 state vs bf16 state: quantization-level agreement
    np.testing.assert_allclose(np.asarray(o_q, np.float32),
                               np.asarray(o_f, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_int4_state_step_and_fold_parity():
    """int4 nibble-packed lazy step/fold == the bf16 step/fold run on the
    exactly-dequantized state (the packing itself is the only error
    source; the step math must match bit-for-bit up to fp association)."""
    from lina_speech_tpu.ops.gla import (
        dequantize_state_int4, gla_decode_lazy_fold, gla_decode_lazy_fold_q4,
        gla_decode_lazy_step, gla_decode_lazy_step_q4, quantize_state_rows_int4,
    )

    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    b, h, dk, dv, L = 2, 2, 16, 32, 4
    s = jax.random.normal(ks[0], (b, h, dk, dv)) * 0.3
    pk, sc = quantize_state_rows_int4(s)
    assert pk.shape == (b, h, dk, dv // 2) and pk.dtype == jnp.int8
    s_rec = dequantize_state_int4(pk, sc)
    # reconstruction within half a quantum of the per-row scale
    assert np.all(np.abs(np.asarray(s_rec - s))
                  <= np.asarray(sc)[..., None] / 2 + 1e-6)

    q = jax.random.normal(ks[1], (b, h, dk))
    k = jax.random.normal(ks[2], (b, h, dk))
    v = jax.random.normal(ks[3], (b, h, dv))
    g = -jnp.abs(jax.random.normal(ks[4], (b, h, dk))) * 0.1
    kbuf = jax.random.normal(ks[5], (L, b, h, dk))
    vbuf = jax.random.normal(ks[6], (L, b, h, dv))
    cbuf = -jnp.abs(jax.random.normal(ks[7], (L, b, h, dk))) * 0.1
    cc = jnp.zeros((b, h, dk)) - 0.2
    p = jnp.int32(1)
    o_q, kb_q, vb_q, cb_q, cc_q = gla_decode_lazy_step_q4(
        q, k, v, g, pk, sc, kbuf, vbuf, cbuf, cc, p)
    o_r, kb_r, vb_r, cb_r, cc_r = gla_decode_lazy_step(
        q, k, v, g, s_rec, kbuf, vbuf, cbuf, cc, p)
    np.testing.assert_allclose(np.asarray(o_q), np.asarray(o_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cc_q), np.asarray(cc_r))

    s_new_q, sc_new = gla_decode_lazy_fold_q4(pk, sc, kb_q, vb_q, cb_q, cc_q)
    s_ref = gla_decode_lazy_fold(s_rec, kb_r, vb_r, cb_r, cc_r)
    pk_ref, sc_ref = quantize_state_rows_int4(s_ref)
    np.testing.assert_allclose(np.asarray(sc_new), np.asarray(sc_ref),
                               rtol=1e-5, atol=1e-8)
    assert np.abs(np.asarray(s_new_q, np.int32)
                  - np.asarray(pk_ref, np.int32)).max() == 0


def test_generate_int4_state_tracks_fp():
    """Tiny-model lazy decode with state_quant='int4' runs end-to-end and
    tracks the full-precision lazy decode (looser than int8: 16x the
    quantization error is the point of the knob)."""
    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.generate import generate_batch

    cfg = lina_gla_tiny()
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 3,
                           cfg.n_txt_vocab)
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        jax.random.PRNGKey(2), x, y, jnp.ones((2, 10, 10), bool),
        jnp.ones((2, 8, 10), bool), jnp.ones((2, 8), bool),
    )
    kw = dict(max_seqlen=24, k=1, force_max_seqlen=True, lazy_window=4)
    ref = generate_batch(model, params, x, jax.random.PRNGKey(3), **kw)
    out = generate_batch(model, params, x, jax.random.PRNGKey(3),
                         state_quant="int4", **kw)
    agreement = (np.asarray(out.tokens) == np.asarray(ref.tokens)).mean()
    assert agreement > 0.5, f"greedy agreement {agreement:.2f}"


def test_generate_int8_state_tracks_fp():
    """Tiny-model lazy decode with state_quant='int8' stays close to the
    full-precision lazy decode (greedy agreement)."""
    import jax as _jax

    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.generate import generate_batch

    cfg = lina_gla_tiny()
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 3,
                           cfg.n_txt_vocab)
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        jax.random.PRNGKey(2), x, y, jnp.ones((2, 10, 10), bool),
        jnp.ones((2, 8, 10), bool), jnp.ones((2, 8), bool),
    )
    kw = dict(max_seqlen=24, k=1, force_max_seqlen=True, lazy_window=4)
    ref = generate_batch(model, params, x, jax.random.PRNGKey(3), **kw)
    out = generate_batch(model, params, x, jax.random.PRNGKey(3),
                         state_quant="int8", **kw)
    agreement = (np.asarray(out.tokens) == np.asarray(ref.tokens)).mean()
    assert agreement > 0.7, f"greedy agreement {agreement:.2f}"


def test_generate_int8_state_bf16_sf_budget_gate(monkeypatch):
    """With LINA_SF32_BUDGET_GB=0 the f32 final-state EMISSION override
    is gated OFF (the big-batch path: flagship b384 f32 emissions = 19 GB
    OOM on a 16 GB v5e) — the kernels store bf16 sf in-kernel and decode
    must still track the full-precision run."""
    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.generate import generate_batch

    monkeypatch.setenv("LINA_SF32_BUDGET_GB", "0")
    cfg = lina_gla_tiny()
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 3,
                           cfg.n_txt_vocab)
    params = model.init(
        jax.random.PRNGKey(2), x,
        jax.random.randint(jax.random.PRNGKey(1), (2, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3),
        jnp.ones((2, 10, 10), bool), jnp.ones((2, 8, 10), bool),
        jnp.ones((2, 8), bool),
    )
    kw = dict(max_seqlen=24, k=1, force_max_seqlen=True, lazy_window=4)
    ref = generate_batch(model, params, x, jax.random.PRNGKey(3), **kw)
    out = generate_batch(model, params, x, jax.random.PRNGKey(3),
                         state_quant="int8", **kw)
    agreement = (np.asarray(out.tokens) == np.asarray(ref.tokens)).mean()
    assert agreement > 0.7, f"greedy agreement {agreement:.2f}"


def test_generate_int8_state_plus_int8_weights_compose():
    """state_quant='int8' + weight_quant='int8' together (bench's
    aggregate_realtime_factor_*_int8state_w8 arm): the two knobs touch
    orthogonal paths (lazy state buffers vs the QDense tree swap) and
    must compose without error, tracking the exact run."""
    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.generate import generate_batch

    cfg = lina_gla_tiny()
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 3,
                           cfg.n_txt_vocab)
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 8, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    params = model.init(
        jax.random.PRNGKey(2), x, y, jnp.ones((2, 10, 10), bool),
        jnp.ones((2, 8, 10), bool), jnp.ones((2, 8), bool),
    )
    kw = dict(max_seqlen=24, k=1, force_max_seqlen=True, lazy_window=4)
    ref = generate_batch(model, params, x, jax.random.PRNGKey(3), **kw)
    out = generate_batch(model, params, x, jax.random.PRNGKey(3),
                         state_quant="int8", weight_quant="int8",
                         quant_min_size=1 << 8, **kw)
    agreement = (np.asarray(out.tokens) == np.asarray(ref.tokens)).mean()
    assert agreement > 0.6, f"greedy agreement {agreement:.2f}"


def test_state_quant_requires_lazy():
    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.generate import generate_batch

    cfg = lina_gla_tiny()
    model = build_model(cfg)
    x = jnp.ones((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="state_quant"):
        generate_batch(model, {}, x, jax.random.PRNGKey(0),
                       state_quant="int8")


def test_inference_forward_allocates_no_residuals():
    """The custom_vjp PRIMAL (inference path) must not allocate the
    chunk-state backward-residual buffer: it is a pallas OUTPUT, so XLA
    cannot DCE it, and at generate-prefill scale the dead buffer was the
    b384 compile-OOM driver (BASELINE.md round 5). Also checks sf comes
    back in the initial state's dtype straight from the kernel."""
    q, k, v, gk = make_inputs(jax.random.PRNGKey(3), t=64, dk=32, dv=64)
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    s0 = jnp.zeros((b, h, dk, dv), jnp.bfloat16)
    C = 16
    nc = t // C

    def run(q, k, v, gk, s0):
        return gla_chunk_pallas(q, k, v, gk, initial_state=s0,
                                chunk_size=C, interpret=True)

    o, sf = run(q, k, v, gk, s0)
    assert sf.dtype == jnp.bfloat16

    residual_shape = (b * h, nc, dk, dv)

    def residual_vars(jaxpr):
        out = [v2 for eqn in jaxpr.eqns for v2 in eqn.outvars
               if getattr(v2.aval, "shape", None) == residual_shape]
        for eqn in jaxpr.eqns:
            for sub in jax.core.jaxprs_in_params(eqn.params):
                out += residual_vars(sub)
        return out

    jaxpr = jax.make_jaxpr(run)(q, k, v, gk, s0)
    leaked = residual_vars(jaxpr.jaxpr)
    assert not leaked, f"inference forward allocates residuals: {leaked}"

    # the differentiable path still produces them (training residuals)
    def loss(q):
        o, sf = run(q, k, v, gk, s0.astype(jnp.float32))
        return o.astype(jnp.float32).sum()

    jaxpr_g = jax.make_jaxpr(jax.grad(loss))(q)
    assert residual_vars(jaxpr_g.jaxpr), \
        "training forward lost its residual outputs"
