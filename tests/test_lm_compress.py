"""EnCodec LM + arithmetic coding: exact compress/decompress roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.lm import EncodecLM, compress, decompress


def test_compress_decompress_roundtrip():
    K, card, T = 2, 32, 20
    model = EncodecLM(n_q=K, card=card, dim=32, heads=4, n_layers=2,
                      past_context=8)
    codes0 = jnp.zeros((1, K, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), codes0)

    rng = np.random.default_rng(1)
    codes = rng.integers(0, card, (K, T))
    data = compress(model, params, codes)
    out = decompress(model, params, data, n_q=K, length=T)
    np.testing.assert_array_equal(out, codes)
    # sanity: the stream is in the right ballpark (<= fixed-width + coder
    # overhead; a random-weight LM is near-uniform so no real gain yet)
    assert len(data) <= int(np.ceil(K * T * np.log2(card) / 8)) + 8


def test_lm_probs_shapes_and_streaming_consistency():
    K, card = 3, 16
    model = EncodecLM(n_q=K, card=card, dim=32, heads=4, n_layers=2,
                      past_context=16)
    x = jnp.asarray(np.random.default_rng(2).integers(0, card + 1, (1, K, 6)))
    params = model.init(jax.random.PRNGKey(3), x)
    probs, states, offset = model.apply(params, x)
    assert probs.shape == (1, K, 6, card)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    # one-shot == chunked streaming over the same inputs
    p1, s, off = model.apply(params, x[:, :, :3])
    p2, _, _ = model.apply(params, x[:, :, 3:], s, off)
    both = jnp.concatenate([p1, p2], axis=2)
    np.testing.assert_allclose(np.asarray(both), np.asarray(probs),
                               rtol=2e-5, atol=2e-5)
