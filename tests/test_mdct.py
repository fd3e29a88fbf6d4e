"""MDCT/IMDCT TDAC reconstruction + alternate IMDCT heads."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.heads import IMDCTCosHead, IMDCTSymExpHead, symexp
from lina_speech_tpu.codec.mdct import imdct, mdct


def test_mdct_roundtrip_perfect_reconstruction():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    c = mdct(x, frame_len=64, padding="same")
    assert c.shape == (2, 16, 32)
    y = imdct(c, padding="same")
    assert y.shape[1] >= 480
    a, b = np.asarray(x)[:, 48:-48], np.asarray(y)[:, 48:-48]
    np.testing.assert_allclose(a, b[:, : a.shape[1]], atol=1e-5)


def test_symexp_inverse_of_symlog():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    symlog = jnp.sign(x) * jnp.log1p(jnp.abs(x))
    np.testing.assert_allclose(np.asarray(symexp(symlog)), np.asarray(x), rtol=1e-6)


def test_imdct_heads_shapes():
    x = jnp.zeros((2, 12, 32))
    for head_cls in (IMDCTSymExpHead, IMDCTCosHead):
        head = head_cls(dim=32, mdct_frame_len=32)
        p = head.init(jax.random.PRNGKey(0), x)
        audio = head.apply(p, x)
        assert audio.ndim == 2 and audio.shape[0] == 2
        assert np.isfinite(np.asarray(audio)).all()
