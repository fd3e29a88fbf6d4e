"""VQ training machinery: kmeans init, EMA update, dead-code expiry,
checkpoint averaging."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.vq import (
    VectorQuantizer,
    ema_codebook_update,
    expire_dead_codes,
    kmeans_init,
    vq_encode,
    vq_train_step,
)
from lina_speech_tpu.utils.checkpoint import average_checkpoints


def test_kmeans_init_clusters():
    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 5.0]])
    x = np.concatenate([c + 0.1 * rng.normal(size=(50, 2)) for c in centers])
    cb = kmeans_init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.float32), bins=3)
    # each true center has a centroid within 1.0
    d = np.abs(np.asarray(cb)[None] - centers[:, None]).sum(-1).min(axis=1)
    assert (d < 1.0).all()


def test_ema_update_moves_codebook_toward_data():
    key = jax.random.PRNGKey(0)
    q = VectorQuantizer.create(key, n_q=1, bins=4, dim=2)
    x = jnp.ones((1, 64, 2)) * 3.0
    codes = vq_encode(x, q)
    q2 = ema_codebook_update(x, codes, q, decay=0.5)
    used = np.unique(np.asarray(codes))
    before = np.abs(np.asarray(q.embed[0, used]) - 3.0).mean()
    after = np.abs(np.asarray(q2.embed[0, used]) - 3.0).mean()
    assert after < before


def test_expire_dead_codes_replaces_only_dead():
    key = jax.random.PRNGKey(1)
    q = VectorQuantizer.create(key, n_q=1, bins=4, dim=2)
    q = q.replace(cluster_size=jnp.asarray([[10.0, 0.1, 10.0, 0.5]]))
    batch = jnp.full((8, 3, 2), 7.0)
    q2 = expire_dead_codes(jax.random.PRNGKey(2), q, batch, threshold=2.0)
    np.testing.assert_allclose(np.asarray(q2.embed[0, 0]), np.asarray(q.embed[0, 0]))
    np.testing.assert_allclose(np.asarray(q2.embed[0, 1]), [7.0, 7.0])
    np.testing.assert_allclose(np.asarray(q2.embed[0, 3]), [7.0, 7.0])


def test_vq_train_step_outputs():
    q = VectorQuantizer.create(jax.random.PRNGKey(0), n_q=2, bins=8, dim=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4))
    res = vq_train_step(x, q, n_q=2)
    assert res.codes.shape == (2, 2, 16)
    assert res.quantized.shape == x.shape
    assert np.isfinite(float(res.commit_loss))


def test_average_checkpoints():
    a = {"w": np.asarray([1.0, 2.0], np.float32)}
    b = {"w": np.asarray([3.0, 4.0], np.float32)}
    avg = average_checkpoints([a, b])
    np.testing.assert_allclose(avg["w"], [2.0, 3.0])
    assert avg["w"].dtype == np.float32
