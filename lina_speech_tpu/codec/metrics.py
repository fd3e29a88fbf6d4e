"""Audio quality metrics for vocoder validation.

The reference's validation hooks compute UTMOS / PESQ / periodicity when
enabled (decoder/experiment.py:220-258) — those depend on external
pretrained models and compiled packages unavailable here; the hook
interface is kept (:func:`quality_metrics`) and backed by self-contained
signal metrics: SI-SNR, log-spectral distance, and mel-distance (the same
mel front-end as the training loss).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.losses import mel_filterbank, safe_log, stft_mag

Array = jnp.ndarray


def si_snr(est: Array, ref: Array, eps: float = 1e-8) -> Array:
    """Scale-invariant SNR in dB (higher is better)."""
    est = est - est.mean(axis=-1, keepdims=True)
    ref = ref - ref.mean(axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, axis=-1, keepdims=True)
            / (jnp.sum(ref * ref, axis=-1, keepdims=True) + eps)) * ref
    noise = est - proj
    ratio = jnp.sum(proj ** 2, axis=-1) / (jnp.sum(noise ** 2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def log_spectral_distance(est: Array, ref: Array, n_fft: int = 1024,
                          hop: int = 256) -> Array:
    """RMS distance between log power spectra, in dB."""
    pe = safe_log(stft_mag(est, n_fft, hop) ** 2)
    pr = safe_log(stft_mag(ref, n_fft, hop) ** 2)
    return jnp.sqrt(jnp.mean((10 / np.log(10) * (pe - pr)) ** 2, axis=(1, 2)))


def mel_distance(est: Array, ref: Array, sample_rate: int = 24000,
                 n_fft: int = 1024, hop: int = 256, n_mels: int = 100) -> Array:
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels).astype(np.float32))
    me = safe_log(jnp.einsum("bft,fm->bmt", stft_mag(est, n_fft, hop), fb))
    mr = safe_log(jnp.einsum("bft,fm->bmt", stft_mag(ref, n_fft, hop), fb))
    return jnp.mean(jnp.abs(me - mr), axis=(1, 2))


def quality_metrics(est: Array, ref: Array, sample_rate: int = 24000,
                    extra_hooks: Optional[Dict] = None) -> Dict[str, Array]:
    """Validation metric bundle. ``extra_hooks`` maps name -> fn(est, ref)
    for externally supplied metrics (UTMOS/PESQ when their models are
    available — see :func:`utmos_hook` / :func:`pesq_hook`)."""
    n = min(est.shape[-1], ref.shape[-1])
    est, ref = est[..., :n], ref[..., :n]
    out = {
        "si_snr_db": si_snr(est, ref).mean(),
        "lsd_db": log_spectral_distance(est, ref).mean(),
        "mel_l1": mel_distance(est, ref, sample_rate).mean(),
    }
    for name, fn in (extra_hooks or {}).items():
        out[name] = fn(est, ref)
    return out


# ------------------------------------------------- external-model hooks
# The reference's validation computes UTMOS (a torch MOS-predictor
# checkpoint) and PESQ (the compiled `pesq` package) when enabled
# (decoder/experiment.py:220-258). Neither asset ships in this
# environment; these loaders provide the concrete plug-in path for when
# they are available, returning fn(est, ref) hooks for `quality_metrics`.

def _resample_np(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resampler (asset-free; adequate for scoring)."""
    if sr_in == sr_out:
        return x
    n_out = int(round(x.shape[-1] * sr_out / sr_in))
    t_out = np.arange(n_out) * (sr_in / sr_out)
    i0 = np.clip(t_out.astype(np.int64), 0, x.shape[-1] - 1)
    i1 = np.clip(i0 + 1, 0, x.shape[-1] - 1)
    frac = (t_out - i0).astype(x.dtype)
    return x[..., i0] * (1 - frac) + x[..., i1] * frac


def utmos_hook(model_path: str, sample_rate: int = 24000,
               model_sample_rate: int = 16000):
    """UTMOS hook from a TorchScript MOS predictor on disk.

    The saved module must follow the UTMOS-strong convention
    ``model(wav (B, T) float32, sr int) -> (B,) scores`` (what
    ``torch.hub sarulab-speech/UTMOS22`` exports; reference
    experiment.py:229 calls it per validation batch on the *estimate*
    only). Runs on CPU torch (baked into this image).
    """
    import torch

    model = torch.jit.load(model_path, map_location="cpu").eval()

    def fn(est, ref):
        del ref  # MOS is reference-free
        wav = _resample_np(np.asarray(est, np.float32), sample_rate,
                           model_sample_rate)
        with torch.no_grad():
            score = model(torch.from_numpy(wav), model_sample_rate)
        return jnp.asarray(np.asarray(score, np.float32).mean())

    return fn


def pesq_hook(sample_rate: int = 24000, mode: str = "wb"):
    """PESQ hook via the compiled ``pesq`` package (ITU-T P.862), if
    installed. Audio is resampled to 16 kHz wideband like the reference
    (experiment.py:239-246)."""
    from pesq import pesq as _pesq  # ImportError if unavailable — caller gates

    target_sr = 16000 if mode == "wb" else 8000

    def fn(est, ref):
        e = _resample_np(np.asarray(est, np.float32), sample_rate, target_sr)
        r = _resample_np(np.asarray(ref, np.float32), sample_rate, target_sr)
        scores = [_pesq(target_sr, r[i], e[i], mode) for i in range(e.shape[0])]
        return jnp.asarray(np.mean(scores, dtype=np.float32))

    return fn


def external_metric_hooks(utmos_path: Optional[str] = None,
                          sample_rate: int = 24000) -> Dict:
    """Best-effort bundle: attaches UTMOS (if a checkpoint path is given)
    and PESQ (if the package imports); silently skips what's absent so
    validation runs degrade gracefully without the assets."""
    hooks: Dict = {}
    if utmos_path:
        try:
            hooks["utmos"] = utmos_hook(utmos_path, sample_rate)
        except ImportError:
            pass  # torch absent: graceful degradation
        except Exception as e:
            # an EXPLICIT checkpoint path that fails to load is a user
            # error — surface it instead of silently dropping the metric
            import warnings

            warnings.warn(f"utmos hook disabled: {type(e).__name__}: {e}")
    try:
        hooks["pesq"] = pesq_hook(sample_rate)
    except ImportError:
        pass
    return hooks
