"""Context-parallel GLA: parity vs the single-device chunk kernel.

The CP op recombines per-shard (decay, contribution) pairs, so its output
equals the single-device kernel up to fp32 reassociation — tolerances
mirror the kernel-vs-oracle tests in test_gla_kernels.py.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lina_speech_tpu.ops.gla import gla_chunk
from lina_speech_tpu.ops.gla_cp import gla_chunk_cp, rwkv6_chunk_cp
from lina_speech_tpu.ops.rwkv6 import rwkv6_chunk


def _mk(dtype, b=2, h=2, t=256, dk=32, dv=48, seed=0, with_resets=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (b, h, t, dk), dtype)
    k = jax.random.normal(ks[1], (b, h, t, dk), dtype)
    v = jax.random.normal(ks[2], (b, h, t, dv), dtype)
    # log-gates <= 0, same regime as the layer's low-rank gates
    gk = -jnp.exp(jax.random.normal(ks[3], (b, h, t, dk), jnp.float32)) * 0.1
    if with_resets:
        # packed-sequence resets fold into the gates (reset -> -20)
        reset = jnp.zeros((t,), bool).at[jnp.array([71, 160])].set(True)
        gk = jnp.where(reset[None, None, :, None], -20.0, gk)
    s0 = jax.random.normal(ks[4], (b, h, dk, dv), jnp.float32) * 0.3
    return q, k, v, gk, s0


def _cp_mesh(dp=1, cp=8):
    devs = np.array(jax.devices()[: dp * cp]).reshape(dp, cp)
    return Mesh(devs, ("dp", "cp"))


@pytest.mark.parametrize("with_resets", [False, True])
def test_cp_forward_parity_f32(with_resets):
    q, k, v, gk, s0 = _mk(jnp.float32, with_resets=with_resets)
    o_ref, s_ref = gla_chunk(q, k, v, gk, initial_state=s0)
    mesh = _cp_mesh()
    sh = NamedSharding(mesh, P(None, None, "cp", None))
    qs, ks_, vs, gs = (jax.device_put(x, sh) for x in (q, k, v, gk))
    o, s = jax.jit(functools.partial(gla_chunk_cp, mesh=mesh))(
        qs, ks_, vs, gs, initial_state=s0)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_cp_forward_parity_bf16():
    q, k, v, gk, s0 = _mk(jnp.bfloat16)
    o_ref, _ = gla_chunk(q, k, v, gk, initial_state=s0)
    mesh = _cp_mesh()
    sh = NamedSharding(mesh, P(None, None, "cp", None))
    qs, ks_, vs, gs = (jax.device_put(x, sh) for x in (q, k, v, gk))
    o, _ = jax.jit(functools.partial(gla_chunk_cp, mesh=mesh))(
        qs, ks_, vs, gs, initial_state=s0)
    assert o.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o, np.float32),
                               np.asarray(o_ref, np.float32),
                               rtol=0.06, atol=0.06)


def test_cp_grad_parity():
    q, k, v, gk, s0 = _mk(jnp.float32, t=128)
    mesh = _cp_mesh(dp=2, cp=4)

    def loss_ref(args):
        q, k, v, gk, s0 = args
        o, s = gla_chunk(q, k, v, gk, initial_state=s0)
        return (o.astype(jnp.float32) ** 2).mean() + (s ** 2).mean()

    def loss_cp(args):
        q, k, v, gk, s0 = args
        o, s = gla_chunk_cp(q, k, v, gk, initial_state=s0, mesh=mesh)
        return (o.astype(jnp.float32) ** 2).mean() + (s ** 2).mean()

    g_ref = jax.grad(loss_ref)((q, k, v, gk, s0))
    sh = NamedSharding(mesh, P("dp", None, "cp", None))
    args = (jax.device_put(q, sh), jax.device_put(k, sh),
            jax.device_put(v, sh), jax.device_put(gk, sh),
            jax.device_put(s0, NamedSharding(mesh, P("dp"))))
    g_cp = jax.jit(jax.grad(loss_cp))(args)
    for a, b, name in zip(g_cp, g_ref, "q k v gk s0".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_cp_uneven_local_length():
    # t/cp = 24: each shard pads internally to the 64-chunk like the
    # single-device kernel; outputs and the final state stay exact.
    q, k, v, gk, s0 = _mk(jnp.float32, t=192)
    o_ref, s_ref = gla_chunk(q, k, v, gk, initial_state=s0)
    mesh = _cp_mesh()
    sh = NamedSharding(mesh, P(None, None, "cp", None))
    qs, ks_, vs, gs = (jax.device_put(x, sh) for x in (q, k, v, gk))
    o, s = jax.jit(functools.partial(gla_chunk_cp, mesh=mesh))(
        qs, ks_, vs, gs, initial_state=s0)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("batch_axis", [None, "dp"])
def test_cp_kernel_pallas_parity_interpret(batch_axis):
    """kernel="chunk_pallas" CP branch (raw non-custom_partitioning kernel
    inside the manual shard_map region) — interpret-mode on the CPU mesh,
    with and without a dp-manualized batch. Also covers the chunk-size
    round-up: 192 is not a power of two and would crash gla_chunk_pallas
    if passed through unrounded (advisor r4)."""
    q, k, v, gk, s0 = _mk(jnp.float32)
    o_ref, s_ref = gla_chunk(q, k, v, gk, initial_state=s0)
    mesh = _cp_mesh(dp=2, cp=2)
    sh = NamedSharding(mesh, P("dp", None, "cp", None))
    qs, ks_, vs, gs = (jax.device_put(x, sh) for x in (q, k, v, gk))
    o, s = jax.jit(functools.partial(
        gla_chunk_cp, mesh=mesh, kernel="chunk_pallas", chunk_size=192,
        batch_axis=batch_axis))(qs, ks_, vs, gs, initial_state=s0)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=4e-4, atol=4e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=4e-4, atol=4e-4)


def test_cp_time_not_divisible_by_mesh():
    """t % n_cp != 0 exercises the shard_map pad/trim path (advisor r4:
    all previous lengths divided the cp size, covering only the
    intra-kernel chunk padding)."""
    q, k, v, gk, s0 = _mk(jnp.float32, t=197)
    o_ref, s_ref = gla_chunk(q, k, v, gk, initial_state=s0)
    mesh = _cp_mesh()
    o, s = jax.jit(functools.partial(gla_chunk_cp, mesh=mesh))(
        q, k, v, gk, initial_state=s0)
    assert o.shape == o_ref.shape
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def _mk_rwkv6(dtype, b=2, h=2, t=256, dk=32, dv=48, seed=0, with_resets=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    r = jax.random.normal(ks[0], (b, h, t, dk), dtype)
    k = jax.random.normal(ks[1], (b, h, t, dk), dtype)
    v = jax.random.normal(ks[2], (b, h, t, dv), dtype)
    # log-decay <= 0 (lw = -exp(w_logit), models/rwkv6.py)
    w = -jnp.exp(jax.random.normal(ks[3], (b, h, t, dk), jnp.float32)) * 0.1
    if with_resets:
        reset = jnp.zeros((t,), bool).at[jnp.array([71, 160])].set(True)
        w = jnp.where(reset[None, None, :, None], -20.0, w)
    u = jax.random.normal(ks[4], (h, dk), jnp.float32) * 0.5
    s0 = jax.random.normal(ks[5], (b, h, dk, dv), jnp.float32) * 0.3
    return r, k, v, w, u, s0


@pytest.mark.parametrize("with_resets", [False, True])
def test_rwkv6_cp_forward_parity_f32(with_resets):
    r, k, v, w, u, s0 = _mk_rwkv6(jnp.float32, with_resets=with_resets)
    o_ref, s_ref = rwkv6_chunk(r, k, v, w, u, initial_state=s0)
    mesh = _cp_mesh()
    sh = NamedSharding(mesh, P(None, None, "cp", None))
    rs, ks_, vs, ws = (jax.device_put(x, sh) for x in (r, k, v, w))
    o, s = jax.jit(functools.partial(rwkv6_chunk_cp, mesh=mesh))(
        rs, ks_, vs, ws, u, initial_state=s0)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_rwkv6_cp_grad_parity():
    r, k, v, w, u, s0 = _mk_rwkv6(jnp.float32, t=128)
    mesh = _cp_mesh(dp=2, cp=4)

    def loss_ref(args):
        r, k, v, w, u, s0 = args
        o, s = rwkv6_chunk(r, k, v, w, u, initial_state=s0)
        return (o.astype(jnp.float32) ** 2).mean() + (s ** 2).mean()

    def loss_cp(args):
        r, k, v, w, u, s0 = args
        o, s = rwkv6_chunk_cp(r, k, v, w, u, initial_state=s0, mesh=mesh)
        return (o.astype(jnp.float32) ** 2).mean() + (s ** 2).mean()

    g_ref = jax.grad(loss_ref)((r, k, v, w, u, s0))
    sh = NamedSharding(mesh, P("dp", None, "cp", None))
    args = (jax.device_put(r, sh), jax.device_put(k, sh),
            jax.device_put(v, sh), jax.device_put(w, sh),
            jax.device_put(u, NamedSharding(mesh, P())),
            jax.device_put(s0, NamedSharding(mesh, P("dp"))))
    g_cp = jax.jit(jax.grad(loss_cp))(args)
    for a, b, name in zip(g_cp, g_ref, "r k v w u s0".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_rwkv6_cp_uneven_local_length():
    r, k, v, w, u, s0 = _mk_rwkv6(jnp.float32, t=192)
    o_ref, s_ref = rwkv6_chunk(r, k, v, w, u, initial_state=s0)
    mesh = _cp_mesh()
    sh = NamedSharding(mesh, P(None, None, "cp", None))
    rs, ks_, vs, ws = (jax.device_put(x, sh) for x in (r, k, v, w))
    o, s = jax.jit(functools.partial(rwkv6_chunk_cp, mesh=mesh))(
        rs, ks_, vs, ws, u, initial_state=s0)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_rwkv6_cp_kernel_pallas_parity_interpret():
    """RWKV6 twin of test_cp_kernel_pallas_parity_interpret (advisor r4)."""
    r, k, v, w, u, s0 = _mk_rwkv6(jnp.float32)
    o_ref, s_ref = rwkv6_chunk(r, k, v, w, u, initial_state=s0)
    mesh = _cp_mesh(dp=1, cp=2)
    sh = NamedSharding(mesh, P(None, None, "cp", None))
    rs, ks_, vs, ws = (jax.device_put(x, sh) for x in (r, k, v, w))
    o, s = jax.jit(functools.partial(
        rwkv6_chunk_cp, mesh=mesh, kernel="chunk_pallas", chunk_size=192))(
        rs, ks_, vs, ws, u, initial_state=s0)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=4e-4, atol=4e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=4e-4, atol=4e-4)


def test_rwkv6_cp_time_not_divisible_by_mesh():
    r, k, v, w, u, s0 = _mk_rwkv6(jnp.float32, t=197)
    o_ref, s_ref = rwkv6_chunk(r, k, v, w, u, initial_state=s0)
    mesh = _cp_mesh()
    o, s = jax.jit(functools.partial(rwkv6_chunk_cp, mesh=mesh))(
        r, k, v, w, u, initial_state=s0)
    assert o.shape == o_ref.shape
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_cp_rejects_scan_mode():
    """cp_axis + kernel_mode='scan' must raise, not silently run 'chunk'
    (advisor r4: models/rwkv6.py + gla_layer.py CP dispatch)."""
    import dataclasses

    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.parallel import MeshConfig, make_mesh

    for kind in ("gla", "rwkv6"):
        cfg = lina_gla_tiny()
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(
                cfg.backbone, kind=kind, cp_axis="cp",
                kernel_mode="scan", use_short_conv=(kind != "rwkv6")))
        model = build_model(cfg)
        b, m, n = 2, 8, 16
        x = jax.random.randint(jax.random.PRNGKey(0), (b, m), 3, 256)
        y = jax.random.randint(jax.random.PRNGKey(1), (b, n, 1), 3, 50)
        em = jnp.ones((b, m, m), bool)
        cm = jnp.ones((b, n, m), bool)
        ym = jnp.ones((b, n), bool)
        params = jax.jit(model.init)(jax.random.PRNGKey(2), x, y, em, cm, ym)
        mesh = make_mesh(MeshConfig(dp=2, tp=1, cp=4))
        with jax.set_mesh(mesh):
            with pytest.raises(ValueError, match="context-parallel"):
                jax.jit(lambda p: model.apply(p, x, y, em, cm,
                                              logits_mask=ym))(params)


@pytest.mark.parametrize("kind, interleaved", [
    ("gla", False), ("simple_gla", False), ("rwkv6", False),
    # interleaved cross-attention variants (CrossAttGLA / CrossAttMamba):
    # the mixer stack runs CP, the interleaved CrossAttention layers are
    # time-parallel and ride XLA SPMD propagation
    ("gla", True), ("mamba", True),
])
def test_cp_full_model_loss_and_grad_parity(kind, interleaved):
    """End-to-end: the tiny TTS model trained with audio time sharded
    over cp matches the unsharded model's loss and grads (everything
    outside the mixer — short convs / ddlerp shift, cross-attention,
    loss — is handled by XLA SPMD propagation; the mixer by
    ops/gla_cp.py). Covers every CP-capable backbone kind."""
    import dataclasses

    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.parallel import MeshConfig, make_mesh, shard_batch

    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(
            cfg.backbone, kind=kind, use_short_conv=(kind != "rwkv6"),
            cross_att_layers=(1,) if interleaved else ()))
    cfg_cp = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, cp_axis="cp"))
    model_ref = build_model(cfg)
    model_cp = build_model(cfg_cp)

    b, m, n = 4, 8, 16
    x = jax.random.randint(jax.random.PRNGKey(0), (b, m), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (b, n, 1), 3, 50)
    batch = {
        "text_token": x,
        "audio_token": y,
        "encoder_mask": jnp.ones((b, m, m), bool),
        "crossatt_mask": jnp.ones((b, n, m), bool),
        "y_mask": jnp.ones((b, n), bool),
    }
    params = jax.jit(model_ref.init)(
        jax.random.PRNGKey(2), x, y, batch["encoder_mask"],
        batch["crossatt_mask"], batch["y_mask"])

    def loss_fn(model, params, bt):
        _, loss, _ = model.apply(
            params, bt["text_token"], bt["audio_token"], bt["encoder_mask"],
            bt["crossatt_mask"], logits_mask=bt["y_mask"])
        return loss

    l_ref, g_ref = jax.value_and_grad(
        lambda p: loss_fn(model_ref, p, batch))(params)

    mesh = make_mesh(MeshConfig(dp=2, tp=1, cp=4))
    assert mesh.axis_names == ("dp", "tp", "cp")
    sbatch = shard_batch(batch, mesh)
    assert "cp" in str(sbatch["audio_token"].sharding.spec)
    with jax.set_mesh(mesh):
        l_cp, g_cp = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(model_cp, p, sbatch)))(params)
        l_cp = float(l_cp)
        g_cp = jax.device_get(g_cp)

    np.testing.assert_allclose(l_cp, float(l_ref), rtol=2e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_cp = jax.tree_util.tree_leaves(g_cp)
    for (path, a), c in zip(flat_ref, flat_cp):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))
