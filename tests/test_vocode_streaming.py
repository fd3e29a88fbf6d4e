"""Streaming vocoder decode (codec/wavtokenizer.vocode_streaming):
fixed-shape windowed synthesis whose fidelity to the one-shot decode
rises monotonically with context (the backbone is time-global — pos_net
attention + GroupNorm — so exactness is architecturally impossible)."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.metrics import si_snr
from lina_speech_tpu.codec.wavtokenizer import (
    WavTokenizer,
    WavTokenizerConfig,
    vocode_streaming,
)


def _setup():
    cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=4, latent_dim=32, bins=64,
        backbone_dim=64, backbone_intermediate_dim=128, backbone_layers=2,
        n_fft=32, hop_length=8)
    wt = WavTokenizer(cfg)
    p = wt.init(jax.random.PRNGKey(0), jnp.zeros((1, 256)))
    codes = jax.random.randint(jax.random.PRNGKey(1), (1, 2, 300), 0, 64)
    full = np.asarray(wt.apply(p, codes, method=WavTokenizer.codes_to_audio))
    return wt, p, codes, full


def test_streaming_shapes_and_concat():
    wt, p, codes, full = _setup()
    chunks = [np.asarray(c) for c in
              vocode_streaming(wt, p, codes, window=50, context=24)]
    assert [c.shape[-1] for c in chunks] == [400] * 6  # 300 frames / 50
    stream = np.concatenate(chunks, axis=-1)
    assert stream.shape == full.shape
    assert np.isfinite(stream).all()


def test_streaming_fidelity_improves_with_context():
    wt, p, codes, full = _setup()

    def snr(ctx):
        chunks = [np.asarray(c) for c in
                  vocode_streaming(wt, p, codes, window=50, context=ctx)]
        stream = np.concatenate(chunks, axis=-1)
        n = min(full.shape[-1], stream.shape[-1])
        return float(si_snr(jnp.asarray(stream[:, :n]),
                            jnp.asarray(full[:, :n])).mean())

    s8, s48, s96 = snr(8), snr(48), snr(96)
    assert s8 < s48 < s96, (s8, s48, s96)
    assert s48 > 12.0 and s96 > 18.0, (s48, s96)


def test_streaming_uneven_tail():
    wt, p, codes, full = _setup()
    chunks = [np.asarray(c) for c in
              vocode_streaming(wt, p, codes[:, :, :287], window=50,
                               context=24)]
    assert [c.shape[-1] for c in chunks][-1] == 37 * 8  # 287 = 5*50 + 37
    assert sum(c.shape[-1] for c in chunks) == 287 * 8
