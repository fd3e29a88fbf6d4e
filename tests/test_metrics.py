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


def test_utmos_hook_with_torchscript_module(tmp_path):
    """The UTMOS plug-in path end-to-end with a stand-in TorchScript module
    following the UTMOS-strong convention model(wav (B,T), sr) -> (B,)
    (reference decoder/experiment.py:229)."""
    import numpy as np
    import torch

    class FakeMOS(torch.nn.Module):
        def forward(self, wav: torch.Tensor, sr: int) -> torch.Tensor:
            return 1.0 + 4.0 * torch.sigmoid(wav.mean(dim=-1))

    path = str(tmp_path / "utmos.pt")
    torch.jit.script(FakeMOS()).save(path)

    from lina_speech_tpu.codec.metrics import external_metric_hooks, quality_metrics

    hooks = external_metric_hooks(utmos_path=path, sample_rate=24000)
    assert "utmos" in hooks          # loaded from disk
    est = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2400)).astype(np.float32))
    out = quality_metrics(est, est, extra_hooks=hooks)
    assert 1.0 <= float(out["utmos"]) <= 5.0
    # absent assets degrade silently
    assert "utmos" not in external_metric_hooks(utmos_path=None)


def test_resample_np_identity_and_rate():
    import numpy as np
    from lina_speech_tpu.codec.metrics import _resample_np

    x = np.sin(np.linspace(0, 20, 2400)).astype(np.float32)[None]
    assert _resample_np(x, 24000, 24000) is x
    y = _resample_np(x, 24000, 16000)
    assert y.shape == (1, 1600)
    # a slow sinusoid survives linear resampling
    x_back = _resample_np(y, 16000, 24000)
    assert np.abs(x_back[0, :2398] - x[0, :2398]).max() < 0.01
