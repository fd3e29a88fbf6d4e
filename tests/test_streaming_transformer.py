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


def test_offset_changes_positions():
    """r2 parity gap: offset must feed the sinusoidal positions (reference
    transformer.py:108-113) — same input at different offsets differs."""
    enc = StreamingTransformerEncoder(dim=32, heads=2, n_layers=1, past_context=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32))
    params = enc.init(jax.random.PRNGKey(1), x)
    y0, _, off0 = enc.apply(params, x, None, 0)
    y5, _, _ = enc.apply(params, x, None, 5)
    assert float(jnp.abs(y0 - y5).max()) > 1e-3
    assert int(off0) == 4


def test_sin_embedding_matches_reference_formula():
    """create_sin_embedding == [cos|sin](pos / max_period^(i/(half-1)))
    (reference transformer.py:16-27)."""
    from lina_speech_tpu.codec.streaming_transformer import create_sin_embedding

    dim, T = 16, 7
    pos = np.arange(T, dtype=np.float32)
    half = dim // 2
    adim = np.arange(half, dtype=np.float32)
    phase = pos[:, None] / (10000.0 ** (adim[None, :] / (half - 1)))
    want = np.concatenate([np.cos(phase), np.sin(phase)], axis=-1)
    got = np.asarray(create_sin_embedding(jnp.asarray(pos), dim))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_past_context_bounds_state():
    enc = StreamingTransformerEncoder(dim=32, heads=2, n_layers=1, past_context=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    params = enc.init(jax.random.PRNGKey(1), x)
    states, off = None, 0
    for _ in range(4):
        _, states, off = enc.apply(params, x, states, off)
    assert states[0][0].shape[2] <= 10
