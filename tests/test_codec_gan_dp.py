"""Data-parallel codec-GAN training (reference = Lightning DDP over the
vocoder GAN, decoder/experiment.py:447-456): crops shard over dp, states
replicate, XLA inserts the gradient psum — losses must match the
single-device run."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lina_speech_tpu.codec.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
from lina_speech_tpu.codec.gan import (
    CodecGanConfig,
    create_codec_gan,
    make_codec_gan_steps,
)
from lina_speech_tpu.codec.wavtokenizer import WavTokenizer, WavTokenizerConfig
from lina_speech_tpu.parallel import MeshConfig, make_mesh


def _setup(audio):
    cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=2, latent_dim=16, bins=16,
        backbone_dim=32, backbone_intermediate_dim=48, backbone_layers=1,
        n_fft=16, hop_length=8,
    )
    wt = WavTokenizer(cfg)
    mpd = MultiPeriodDiscriminator(periods=(2,))
    mrd = MultiResolutionDiscriminator(resolutions=((64, 16),))
    gcfg = CodecGanConfig(sample_rate=24000)
    state, gen_tx, disc_tx = create_codec_gan(
        jax.random.PRNGKey(0), wt, mpd, mrd, audio, gcfg)
    steps = make_codec_gan_steps(wt, mpd, mrd, gen_tx, disc_tx, gcfg)
    return state, steps


def test_dp_sharded_gan_steps_match_single_device(monkeypatch):
    import lina_speech_tpu.codec.gan as gan_mod

    orig = gan_mod.mel_loss
    monkeypatch.setattr(
        gan_mod, "mel_loss",
        lambda a, b, sample_rate: orig(a, b, sample_rate=sample_rate,
                                       n_fft=128, hop=32, n_mels=16))
    audio = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 256)).astype(np.float32))

    state, (disc_step, gen_step) = _setup(audio)
    losses0 = []
    s = state
    for _ in range(2):
        s, dm = disc_step(s, audio)
        s, gm = gen_step(s, audio)
        losses0.append((float(dm["disc_loss"]), float(gm["gen_loss"])))

    # replicate states + shard crops over dp=4
    state, (disc_step, gen_step) = _setup(audio)
    mesh = make_mesh(MeshConfig(dp=4, tp=1), devices=jax.devices()[:4])
    repl = NamedSharding(mesh, P())
    s = jax.tree_util.tree_map(lambda l: jax.device_put(l, repl), state)
    a = jax.device_put(audio, NamedSharding(mesh, P("dp")))
    losses1 = []
    for _ in range(2):
        s, dm = disc_step(s, a)
        s, gm = gen_step(s, a)
        losses1.append((float(dm["disc_loss"]), float(gm["gen_loss"])))

    np.testing.assert_allclose(np.asarray(losses0), np.asarray(losses1),
                               rtol=2e-4, atol=2e-4)
