"""Codec GAN training smoke: discriminators, losses, dual-optimizer steps."""
import jax
import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.codec.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
from lina_speech_tpu.codec.gan import (
    CodecGanConfig,
    create_codec_gan,
    make_codec_gan_steps,
)
from lina_speech_tpu.codec.losses import (
    disc_hinge_loss,
    feature_matching_loss,
    gen_hinge_loss,
    mel_filterbank,
    mel_loss,
)
from lina_speech_tpu.codec.wavtokenizer import WavTokenizer, WavTokenizerConfig


def test_mel_loss_identity_and_sensitivity():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, 4096)).astype(np.float32))
    assert float(mel_loss(y, y, n_fft=512, hop=128)) == 0.0
    y2 = y * 0.5
    assert float(mel_loss(y2, y, n_fft=512, hop=128)) > 0.01


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(24000, 1024, 100)
    assert fb.shape == (513, 100)
    # every mel bin has some support; interior freqs covered
    assert (fb.sum(axis=0) > 0).all()


def test_hinge_losses_ordering():
    good_real = [jnp.ones((2, 10)) * 2.0]
    bad_fake = [jnp.ones((2, 10)) * -2.0]
    # perfectly separated -> zero disc loss
    assert float(disc_hinge_loss(good_real, bad_fake)) == 0.0
    # generator wants fake scores high
    assert float(gen_hinge_loss(bad_fake)) > float(gen_hinge_loss(good_real))


def test_discriminator_shapes():
    x = jnp.zeros((2, 1024))
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    p = mpd.init(jax.random.PRNGKey(0), x)
    outs, fmaps = mpd.apply(p, x)
    assert len(outs) == 2 and len(fmaps) == 2
    mrd = MultiResolutionDiscriminator(resolutions=((256, 64),))
    p2 = mrd.init(jax.random.PRNGKey(1), x)
    outs2, fmaps2 = mrd.apply(p2, x)
    assert len(outs2) == 1 and len(fmaps2[0]) == 6


def test_gan_steps_update_params():
    cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=2, latent_dim=16, bins=16,
        backbone_dim=32, backbone_intermediate_dim=48, backbone_layers=1,
        n_fft=16, hop_length=8,
    )
    wt = WavTokenizer(cfg)
    mpd = MultiPeriodDiscriminator(periods=(2,))
    mrd = MultiResolutionDiscriminator(resolutions=((64, 16),))
    audio = jnp.asarray(np.random.default_rng(0).normal(size=(2, 256)).astype(np.float32))
    gcfg = CodecGanConfig(sample_rate=24000)

    state, gen_tx, disc_tx = create_codec_gan(
        jax.random.PRNGKey(0), wt, mpd, mrd, audio, gcfg
    )
    # small mel config so the tiny audio has frames
    import lina_speech_tpu.codec.gan as gan_mod

    orig = gan_mod.mel_loss
    gan_mod.mel_loss = lambda a, b, sample_rate: orig(a, b, sample_rate=sample_rate,
                                                      n_fft=128, hop=32, n_mels=16)
    try:
        # snapshot before the steps: the jitted steps donate the state
        a0 = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]).copy()
        disc_step, gen_step = make_codec_gan_steps(wt, mpd, mrd, gen_tx, disc_tx, gcfg)
        state1, dm = disc_step(state, audio)
        assert np.isfinite(float(dm["disc_loss"]))
        state2, gm = gen_step(state1, audio)
        for k in ("gen_loss", "mel_loss", "gen_adv", "fm_loss"):
            assert np.isfinite(float(gm[k]))
        # generator params changed
        b = np.asarray(jax.tree_util.tree_leaves(state2.gen_params)[0])
        assert not np.allclose(a0, b)
        assert int(state2.step) == 1
    finally:
        gan_mod.mel_loss = orig


def test_gan_convergence_tiny():
    """Convergence proof, not just a smoke test (reference
    decoder/experiment.py:121-218 training dynamics): a few hundred
    disc+gen steps on realistic harmonic audio must drive mel loss down
    and reconstruction SI-SNR up, with the weight-norm discriminators
    staying finite throughout."""
    from lina_speech_tpu.codec.metrics import si_snr

    cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=4, latent_dim=32, bins=32,
        backbone_dim=64, backbone_intermediate_dim=128, backbone_layers=2,
        n_fft=16, hop_length=8,
    )
    wt = WavTokenizer(cfg)
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    mrd = MultiResolutionDiscriminator(resolutions=((128, 32),))

    # fixed bank of harmonic-rich waveforms (speech-like: f0 + partials
    # with envelopes + light noise) the tiny model can learn
    rng = np.random.default_rng(0)
    t = np.arange(1024) / 24000.0
    bank = []
    for i in range(4):
        f0 = 120.0 + 60.0 * i
        sig = sum((0.5 ** h) * np.sin(2 * np.pi * f0 * (h + 1) * t + rng.uniform(0, 6))
                  for h in range(4))
        env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3.0 * t + i))
        sig = sig * env + 0.01 * rng.normal(size=t.shape)
        bank.append(sig / np.abs(sig).max())
    bank = np.stack(bank).astype(np.float32)  # (4, 1024)

    gcfg = CodecGanConfig(sample_rate=24000, lr_gen=1e-3, lr_disc=1e-3,
                          commit_coeff=1.0)
    state, gen_tx, disc_tx = create_codec_gan(
        jax.random.PRNGKey(0), wt, mpd, mrd, jnp.asarray(bank[:2]), gcfg
    )

    import lina_speech_tpu.codec.gan as gan_mod

    orig = gan_mod.mel_loss
    gan_mod.mel_loss = lambda a, b, sample_rate: orig(
        a, b, sample_rate=sample_rate, n_fft=256, hop=64, n_mels=24)
    try:
        disc_step, gen_step = make_codec_gan_steps(wt, mpd, mrd, gen_tx,
                                                   disc_tx, gcfg)
        mels = []
        n_steps = 240
        for i in range(n_steps):
            batch = jnp.asarray(bank[rng.permutation(4)[:2]])
            state, dm = disc_step(state, batch)
            state, gm = gen_step(state, batch)
            assert np.isfinite(float(dm["disc_loss"])), f"disc diverged @ {i}"
            assert np.isfinite(float(gm["gen_loss"])), f"gen diverged @ {i}"
            mels.append(float(gm["mel_loss"]))
        first = float(np.mean(mels[:20]))
        last = float(np.mean(mels[-20:]))
        assert last < 0.75 * first, f"mel loss did not converge: {first} -> {last}"

        # reconstruction SI-SNR improves over the init-params reconstruction
        recon = wt.apply(state.gen_params, jnp.asarray(bank))
        recon = recon[:, : bank.shape[1]]
        snr = float(si_snr(recon, jnp.asarray(bank)).mean())
        state0, _, _ = create_codec_gan(
            jax.random.PRNGKey(0), wt, mpd, mrd, jnp.asarray(bank[:2]), gcfg)
        recon0 = wt.apply(state0.gen_params, jnp.asarray(bank))[:, : bank.shape[1]]
        snr0 = float(si_snr(recon0, jnp.asarray(bank)).mean())
        assert snr > snr0 + 1.0, f"SI-SNR did not improve: {snr0} -> {snr}"
    finally:
        gan_mod.mel_loss = orig
