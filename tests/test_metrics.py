"""Audio quality metric sanity."""
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.metrics import quality_metrics, si_snr


def test_si_snr_orders_quality():
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.normal(size=(2, 4096)).astype(np.float32))
    noisy_small = ref + 0.01 * jnp.asarray(rng.normal(size=(2, 4096)).astype(np.float32))
    noisy_big = ref + 0.5 * jnp.asarray(rng.normal(size=(2, 4096)).astype(np.float32))
    assert float(si_snr(ref, ref).mean()) > 50
    assert float(si_snr(noisy_small, ref).mean()) > float(si_snr(noisy_big, ref).mean())


def test_quality_metrics_bundle_and_hooks():
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.normal(size=(1, 4096)).astype(np.float32))
    est = ref * 0.9
    out = quality_metrics(est, ref, extra_hooks={"const": lambda a, b: 42.0})
    assert set(out) == {"si_snr_db", "lsd_db", "mel_l1", "const"}
    assert out["const"] == 42.0
    assert np.isfinite(float(out["lsd_db"]))
