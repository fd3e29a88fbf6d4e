"""SEANet decoder / EnCodec roundtrip, MS-STFT + DAC discriminators."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.discriminators import (
    DACDiscriminator,
    MultiScaleSTFTDiscriminator,
)
from lina_speech_tpu.codec.encodec import EncodecModel
from lina_speech_tpu.codec.seanet import SEANetDecoder


def test_seanet_decoder_upsamples_by_hop():
    dec = SEANetDecoder(dimension=16, n_filters=2, ratios=(4, 2), lstm=1)
    z = jnp.zeros((1, 10, 16))
    p = dec.init(jax.random.PRNGKey(0), z)
    wav = dec.apply(p, z)
    assert wav.shape == (1, 80)  # T' * prod(ratios)


def test_encodec_roundtrip_shapes():
    """encode/decode shape parity (mirrors the reference's model.py test())."""
    m = EncodecModel(dimension=16, n_filters=2, ratios=(4, 2), n_q=2, bins=17,
                     residual=True)
    audio = jnp.zeros((2, 160))
    p = m.init(jax.random.PRNGKey(0), audio)
    codes = m.apply(p, audio, method=EncodecModel.encode)
    assert codes.shape == (2, 2, 20)
    out = m.apply(p, codes, method=EncodecModel.decode)
    assert out.shape == (2, 160)


def test_msstft_and_dac_discriminators():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1024)).astype(np.float32))
    ms = MultiScaleSTFTDiscriminator(scales=((256, 64), (128, 32)))
    p = ms.init(jax.random.PRNGKey(0), x)
    outs, fmaps = ms.apply(p, x)
    assert len(outs) == 2 and all(np.isfinite(np.asarray(o)).all() for o in outs)

    dac = DACDiscriminator(periods=(2, 3), stft_resolutions=((256, 64),))
    p2 = dac.init(jax.random.PRNGKey(1), x)
    outs2, fmaps2 = dac.apply(p2, x)
    assert len(outs2) == 3  # 2 periods + 1 stft band disc
    assert all(np.isfinite(np.asarray(o)).all() for o in outs2)
