"""Streaming transformer: chunked streaming == full-sequence forward."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.streaming_transformer import StreamingTransformerEncoder


def test_streaming_matches_full():
    enc = StreamingTransformerEncoder(dim=32, heads=2, n_layers=2, past_context=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
    params = enc.init(jax.random.PRNGKey(1), x)
    y_full, _, _ = enc.apply(params, x)

    # stream in 3 chunks of 8
    states, off = None, 0
    outs = []
    for i in range(3):
        y, states, off = enc.apply(params, x[:, i * 8 : (i + 1) * 8], states, off)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_full),
                               rtol=2e-4, atol=2e-4)


def test_past_context_bounds_state():
    enc = StreamingTransformerEncoder(dim=32, heads=2, n_layers=1, past_context=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    params = enc.init(jax.random.PRNGKey(1), x)
    states, off = None, 0
    for _ in range(4):
        _, states, off = enc.apply(params, x, states, off)
    assert states[0][0].shape[2] <= 10
