"""Context-parallel Mamba selective scan: parity vs the single-device scan.

Same contract as tests/test_gla_cp.py — the CP op recombines per-shard
(decay, contribution) pairs, so output equals the single-device scan up
to fp32 reassociation.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lina_speech_tpu.ops.mamba import selective_scan
from lina_speech_tpu.ops.mamba_cp import selective_scan_cp


def _mk(b=2, t=256, d=24, n=8, seed=0, with_resets=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    dt = jax.nn.softplus(jax.random.normal(ks[1], (b, t, d)) - 1.0)
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.5)
    B = jax.random.normal(ks[3], (b, t, n), jnp.float32)
    C = jax.random.normal(ks[4], (b, t, n), jnp.float32)
    D = jax.random.normal(ks[5], (d,), jnp.float32) * 0.5
    reset = None
    if with_resets:
        reset = jnp.zeros((b, t), bool).at[:, jnp.array([71, 160])].set(True)
    s0 = jax.random.normal(jax.random.PRNGKey(seed + 7), (b, d, n),
                           jnp.float32) * 0.3
    return x, dt, A, B, C, D, reset, s0


def _cp_mesh(dp=1, cp=8):
    devs = np.array(jax.devices()[: dp * cp]).reshape(dp, cp)
    return Mesh(devs, ("dp", "cp"))


@pytest.mark.parametrize("with_resets", [False, True])
def test_mamba_cp_forward_parity(with_resets):
    x, dt, A, B, C, D, reset, s0 = _mk(with_resets=with_resets)
    y_ref, s_ref = selective_scan(x, dt, A, B, C, D, initial_state=s0,
                                  reset_mask=reset, mode="scan")
    mesh = _cp_mesh()
    sh = NamedSharding(mesh, P(None, "cp", None))
    xs, dts, Bs, Cs = (jax.device_put(z, sh) for z in (x, dt, B, C))
    y, s = jax.jit(functools.partial(
        selective_scan_cp, mesh=mesh, reset_mask=reset))(
        xs, dts, A, Bs, Cs, D, initial_state=s0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_mamba_cp_time_not_divisible_by_mesh():
    x, dt, A, B, C, D, _, s0 = _mk(t=197)
    y_ref, s_ref = selective_scan(x, dt, A, B, C, D, initial_state=s0,
                                  mode="scan")
    mesh = _cp_mesh()
    y, s = jax.jit(functools.partial(selective_scan_cp, mesh=mesh))(
        x, dt, A, B, C, D, initial_state=s0)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("batch_axis", [None, "dp"])
def test_mamba_cp_pallas_parity_interpret(batch_axis):
    """mode="pallas" CP branch: the raw (partitioned=False) sequential-scan
    kernel on local shards, interpret-mode on the CPU mesh."""
    x, dt, A, B, C, D, reset, s0 = _mk(t=128, with_resets=True)
    y_ref, s_ref = selective_scan(x, dt, A, B, C, D, initial_state=s0,
                                  reset_mask=reset, mode="scan")
    mesh = _cp_mesh(dp=2, cp=2)
    sh = NamedSharding(mesh, P("dp", "cp", None))
    xs, dts, Bs, Cs = (jax.device_put(z, sh) for z in (x, dt, B, C))
    y, s = jax.jit(functools.partial(
        selective_scan_cp, mesh=mesh, mode="pallas", batch_axis=batch_axis,
        reset_mask=reset))(xs, dts, A, Bs, Cs, D, initial_state=s0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=4e-4, atol=4e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=4e-4, atol=4e-4)


def test_mamba_cp_grad_parity():
    x, dt, A, B, C, D, _, s0 = _mk(t=128)
    mesh = _cp_mesh(dp=2, cp=4)

    def loss_ref(args):
        x, dt, A, B, C, D, s0 = args
        y, s = selective_scan(x, dt, A, B, C, D, initial_state=s0,
                              mode="scan")
        return (y.astype(jnp.float32) ** 2).mean() + (s ** 2).mean()

    def loss_cp(args):
        x, dt, A, B, C, D, s0 = args
        y, s = selective_scan_cp(x, dt, A, B, C, D, initial_state=s0,
                                 mesh=mesh)
        return (y.astype(jnp.float32) ** 2).mean() + (s ** 2).mean()

    g_ref = jax.grad(loss_ref)((x, dt, A, B, C, D, s0))
    sh = NamedSharding(mesh, P("dp", "cp", None))
    rep = NamedSharding(mesh, P())
    args = (jax.device_put(x, sh), jax.device_put(dt, sh),
            jax.device_put(A, rep), jax.device_put(B, sh),
            jax.device_put(C, sh), jax.device_put(D, rep),
            jax.device_put(s0, NamedSharding(mesh, P("dp"))))
    g_cp = jax.jit(jax.grad(loss_cp))(args)
    for a, b, name in zip(g_cp, g_ref, "x dt A B C D s0".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


@pytest.mark.parametrize("kind", ["mamba", "mamba2"])
def test_mamba_cp_full_model_loss_and_grad_parity(kind):
    """End-to-end: the tiny TTS model (kind="mamba" / "mamba2") trained
    with audio time sharded over cp matches the unsharded model's loss
    and grads (Mamba2/SSD rides gla_chunk_cp — it IS scalar-decay GLA)."""
    import dataclasses

    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.parallel import MeshConfig, make_mesh, shard_batch

    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, kind=kind))
    cfg_cp = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, kind=kind,
                                          cp_axis="cp"))
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
    sbatch = shard_batch(batch, mesh)
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
