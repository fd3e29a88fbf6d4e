"""Codec tests: ISTFT overlap-add oracle parity, VQ roundtrip, SEANet frame
rate contract (mirrors the reference's seanet shape test, the '75 Hz'
contract), vocoder shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec import (
    ISTFTHead,
    SEANetEncoder,
    VectorQuantizer,
    VocosBackbone,
    WavTokenizer,
    WavTokenizerConfig,
    istft_same,
    vq_decode,
    vq_encode,
)


def naive_istft_same(spec, n_fft, hop):
    """Oracle: direct numpy port of the overlap-add + envelope algorithm."""
    win = np.hanning(n_fft + 1)[:-1]
    B, _, T = spec.shape
    ifft = np.fft.irfft(spec, n=n_fft, axis=1) * win[None, :, None]
    L = (T - 1) * hop + n_fft
    y = np.zeros((B, L))
    env = np.zeros(L)
    for t in range(T):
        y[:, t * hop : t * hop + n_fft] += ifft[:, :, t]
        env[t * hop : t * hop + n_fft] += win ** 2
    pad = (n_fft - hop) // 2
    y = y / np.maximum(env, 1e-11)
    return y[:, pad : L - pad]


def test_istft_matches_naive_oracle():
    rng = np.random.default_rng(0)
    n_fft, hop, T = 64, 16, 12
    spec = rng.normal(size=(2, n_fft // 2 + 1, T)) + 1j * rng.normal(size=(2, n_fft // 2 + 1, T))
    out = istft_same(jnp.asarray(spec), n_fft, hop)
    ref = naive_istft_same(spec, n_fft, hop)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_vq_roundtrip_identity():
    key = jax.random.PRNGKey(0)
    q = VectorQuantizer.create(key, n_q=1, bins=16, dim=8)
    # latents exactly equal to codebook rows must map to those rows
    idx = jnp.array([[3, 7, 11, 0]])  # (B=1, T=4)
    x = jnp.take(q.embed[0], idx, axis=0)  # (1, 4, 8)
    codes = vq_encode(x, q)
    np.testing.assert_array_equal(np.asarray(codes[0]), np.asarray(idx))
    rec = vq_decode(codes, q)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), rtol=1e-6)


def test_seanet_frame_rate_contract():
    """hop = prod(ratios); 3200 samples at ratios (8,5,4,2) -> 10 frames
    (the reference pins 75 frames/s at 24 kHz via this shape contract)."""
    enc = SEANetEncoder(dimension=32, n_filters=2, ratios=(8, 5, 4, 2), lstm=1)
    audio = jnp.zeros((1, 3200))
    params = enc.init(jax.random.PRNGKey(0), audio)
    out = enc.apply(params, audio)
    assert out.shape == (1, 10, 32)


def test_vocos_backbone_and_head_shapes():
    bb = VocosBackbone(input_channels=16, dim=32, intermediate_dim=64, num_layers=2)
    x = jnp.zeros((2, 12, 16))
    params = bb.init(jax.random.PRNGKey(0), x)
    y = bb.apply(params, x)
    assert y.shape == (2, 12, 32)

    head = ISTFTHead(dim=32, n_fft=64, hop_length=16)
    hp = head.init(jax.random.PRNGKey(1), y)
    audio = head.apply(hp, y)
    assert audio.shape == (2, 12 * 16)  # T*hop samples (75 Hz * 320 = 24 kHz)


def test_wavtokenizer_roundtrip_shapes():
    cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=2, latent_dim=16, bins=32,
        backbone_dim=32, backbone_intermediate_dim=64, backbone_layers=1,
        n_fft=16, hop_length=8,
    )
    wt = WavTokenizer(cfg)
    audio = jnp.zeros((1, 64))
    params = wt.init(jax.random.PRNGKey(0), audio)
    features, codes = wt.apply(params, audio, method=WavTokenizer.encode)
    assert codes.shape == (1, 1, 8)  # 64 / hop 8
    assert features.shape == (1, 8, 16)
    wav = wt.apply(params, codes, method=WavTokenizer.codes_to_audio)
    assert wav.shape == (1, 8 * 8)  # T*hop

    # full roundtrip entrypoint
    out = wt.apply(params, audio)
    assert out.ndim == 2 and out.shape[0] == 1
