"""Backbone variants: RWKV6 kernel parity, simple-GLA, transformer baseline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lina_speech_tpu.ops.rwkv6 import rwkv6_chunk, rwkv6_decode_step, rwkv6_scan_ref


def rwkv_inputs(key, b=2, h=2, t=50, dk=16, dv=24):
    ks = jax.random.split(key, 5)
    r = jax.random.normal(ks[0], (b, h, t, dk))
    k = jax.random.normal(ks[1], (b, h, t, dk))
    v = jax.random.normal(ks[2], (b, h, t, dv))
    w = -jnp.exp(jax.random.normal(ks[3], (b, h, t, dk)) * 0.5 - 2.0)
    u = jax.random.normal(ks[4], (h, dk)) * 0.5
    return r, k, v, w, u


@pytest.mark.parametrize("t", [50, 32, 7])
def test_rwkv6_chunk_matches_scan(t):
    r, k, v, w, u = rwkv_inputs(jax.random.PRNGKey(0), t=t)
    o_ref, s_ref = rwkv6_scan_ref(r, k, v, w, u)
    o_chk, s_chk = rwkv6_chunk(r, k, v, w, u, chunk_size=16, subchunk_size=4)
    np.testing.assert_allclose(np.asarray(o_chk), np.asarray(o_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


def test_rwkv6_decode_matches_scan():
    r, k, v, w, u = rwkv_inputs(jax.random.PRNGKey(1), b=1, t=20)
    o_ref, s_ref = rwkv6_scan_ref(r, k, v, w, u)
    state = jnp.zeros((1, 2, 16, 24), jnp.float32)
    outs = []
    for i in range(20):
        o, state = rwkv6_decode_step(r[:, :, i], k[:, :, i], v[:, :, i], w[:, :, i], u, state)
        outs.append(o)
    o_seq = jnp.stack(outs, axis=2)
    np.testing.assert_allclose(np.asarray(o_seq), np.asarray(o_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


def test_rwkv6_chunk_with_initial_state_and_resets():
    r, k, v, w, u = rwkv_inputs(jax.random.PRNGKey(2), t=33)
    w = w.at[:, :, 10].set(-20.0)  # hard reset mid-sequence
    s0 = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 16, 24)).astype(jnp.float32)
    o_ref, s_ref = rwkv6_scan_ref(r, k, v, w, u, initial_state=s0)
    o_chk, s_chk = rwkv6_chunk(r, k, v, w, u, initial_state=s0, chunk_size=8, subchunk_size=4)
    np.testing.assert_allclose(np.asarray(o_chk), np.asarray(o_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


# ---------------- model-level variants ----------------
def _variant_model(kind, interleaved=False):
    import dataclasses
    from lina_speech_tpu.config import lina_gla_tiny, build_model

    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(
            cfg.backbone, kind=kind,
            cross_att_layers=(1,) if (kind == "transformer" or interleaved) else (),
            blind=not (kind == "transformer" or interleaved),
        ),
    )
    return cfg, build_model(cfg)


def test_rwkv6_chunk_grads_match_scan():
    r, k, v, w, u = rwkv_inputs(jax.random.PRNGKey(6), b=1, h=1, t=24, dk=8, dv=8)

    def mk_loss(fn):
        def loss(r, k, v, w, u):
            o, s = fn(r, k, v, w, u)
            return jnp.sum(o ** 2) + jnp.sum(s ** 2)
        return loss

    g_chunk = jax.grad(mk_loss(lambda *a: rwkv6_chunk(*a, chunk_size=8, subchunk_size=4)),
                       argnums=(0, 1, 2, 3, 4))(r, k, v, w, u)
    g_scan = jax.grad(mk_loss(rwkv6_scan_ref), argnums=(0, 1, 2, 3, 4))(r, k, v, w, u)
    for gc, gs in zip(g_chunk, g_scan):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gs), rtol=1e-3, atol=1e-3)


def test_mamba_scan_matches_step():
    from lina_speech_tpu.ops.mamba import selective_scan, selective_step

    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    b, t, d, n = 2, 18, 8, 4
    x = jax.random.normal(ks[0], (b, t, d))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (b, t, d)))
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (b, t, n))
    C = jax.random.normal(ks[4], (b, t, n))
    D = jnp.ones((d,))
    y_par, h_par = selective_scan(x, dt, A, B, C, D)

    h = jnp.zeros((b, d, n))
    ys = []
    for i in range(t):
        y, h = selective_step(x[:, i], dt[:, i], A, B[:, i], C[:, i], D, h)
        ys.append(y)
    y_seq = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_seq), np.asarray(y_par), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_par), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("kind,interleaved", [
    ("simple_gla", False), ("rwkv6", False), ("transformer", False),
    ("mamba", False), ("mamba2", False), ("gla", True), ("mamba", True),
])
def test_variant_forward_and_decode(kind, interleaved):
    cfg, model = _variant_model(kind, interleaved)
    b, m, n = 2, 7, 17
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (b, m), 3, 256)
    y = jax.random.randint(key, (b, n, 1), 3, 53)
    em = jnp.ones((b, m, m), bool)
    cm = jnp.ones((b, n, m), bool)
    lm = jnp.ones((b, n), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x, y, em, cm, lm)
    logits, loss, _ = model.apply(params, x, y, em, cm, lm)
    assert logits.shape == (b, n - 1, 1, 53)
    assert np.isfinite(float(loss))

    # decode path parity vs prefill
    from lina_speech_tpu.models.lina import LinaModel

    y_q = jnp.transpose(y, (2, 0, 1))
    y_embd = model.apply(params, y_q, method=LinaModel.embed_tokens)
    x_enc = model.apply(params, x, method=LinaModel.encode_text)
    logits_pre, _, state_pre = model.apply(params, y_embd, x_enc, method=LinaModel.prefill)

    state = model.empty_state(b)
    step = jax.jit(lambda p, e, xe, st: model.apply(p, e, xe, st, method=LinaModel.decode_step))
    outs = []
    for t in range(n):
        lg, _, state = step(params, y_embd[:, t], x_enc, state)
        outs.append(lg)
    logits_seq = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_seq), np.asarray(logits_pre), rtol=3e-4, atol=3e-4
    )


@pytest.mark.parametrize("kind,interleaved", [
    ("simple_gla", False), ("rwkv6", False), ("transformer", False),
    ("mamba", False), ("mamba2", False), ("gla", True), ("mamba", True),
])
def test_chunked_prefill_matches_full(kind, interleaved):
    """Mid-stream continuation contract (bounded serving compiles): running
    a prefill as [8, 4, 1] chunks with conv_history + time_offset must
    reproduce the single-shot prefill (logits AND final state)."""
    from lina_speech_tpu.models.lina import LinaModel

    cfg, model = _variant_model(kind, interleaved)
    b, m, n = 2, 7, 13
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (b, m), 3, 256)
    y = jax.random.randint(key, (b, n, 1), 3, 53)
    em = jnp.ones((b, m, m), bool)
    cm = jnp.ones((b, n, m), bool)
    lm = jnp.ones((b, n), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x, y, em, cm, lm)

    y_q = jnp.transpose(y, (2, 0, 1))
    y_embd = model.apply(params, y_q, method=LinaModel.embed_tokens)
    x_enc = model.apply(params, x, method=LinaModel.encode_text)
    lg_full, _, st_full = model.apply(params, y_embd, x_enc,
                                      model.empty_state(b),
                                      method=LinaModel.prefill)

    st = model.empty_state(b)
    off, lgs = 0, []
    for i, c in enumerate([8, 4, 1]):
        lg, _, st = model.apply(params, y_embd[:, off:off + c], x_enc, st,
                                conv_history=(i > 0),
                                time_offset=jnp.asarray(off, jnp.int32),
                                method=LinaModel.prefill)
        lgs.append(lg)
        off += c
    lg_chunk = jnp.concatenate(lgs, axis=1)
    np.testing.assert_allclose(np.asarray(lg_chunk), np.asarray(lg_full),
                               rtol=3e-4, atol=3e-4)
    for a, bb in zip(jax.tree_util.tree_leaves(st_full),
                     jax.tree_util.tree_leaves(st)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(bb, np.float32),
                                   rtol=3e-4, atol=3e-4)
