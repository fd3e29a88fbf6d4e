"""Codec (vocoder) GAN training: dual-optimizer disc/gen steps.

Rebuild of the reference experiment (decoder/experiment.py:86-218): AdamW
pairs for discriminator and generator, hinge losses on MPD+MRD, feature
matching, mel-L1 x 45, VQ commitment x 1000, with a ``pretrain_mel_steps``
gate that trains the generator on mel alone first. Each step is one jitted
function; on a mesh, batch-shard the audio and the gradient psums are
automatic. The EMA codebook update (with its dp psum) runs inside the
generator step (codec/vq.py replaces the reference's NCCL buffer sync).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from lina_speech_tpu.codec.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
from lina_speech_tpu.codec.losses import (
    disc_hinge_loss,
    feature_matching_loss,
    gen_hinge_loss,
    mel_loss,
)
from lina_speech_tpu.codec.wavtokenizer import WavTokenizer


@dataclasses.dataclass(frozen=True)
class CodecGanConfig:
    lr_gen: float = 2e-4
    lr_disc: float = 2e-4
    betas: Tuple[float, float] = (0.8, 0.9)
    mel_coeff: float = 45.0
    commit_coeff: float = 1000.0
    fm_coeff: float = 1.0
    pretrain_mel_steps: int = 0
    sample_rate: int = 24000
    # cosine mel-coefficient decay (reference experiment.py:324-335)
    decay_mel_coeff: bool = False
    num_warmup_steps: int = 0
    max_steps: int = 1_000_000


def mel_coeff_at(config: CodecGanConfig, step) -> jnp.ndarray:
    """base * cosine decay after warmup (experiment.py mel_loss_coeff_decay)."""
    if not config.decay_mel_coeff:
        return jnp.asarray(config.mel_coeff, jnp.float32)
    import math

    step = jnp.asarray(step, jnp.float32)
    progress = (step - config.num_warmup_steps) / max(
        1, config.max_steps - config.num_warmup_steps
    )
    decay = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * jnp.clip(progress, 0.0, 1.0))))
    return jnp.where(step < config.num_warmup_steps, 1.0, decay) * config.mel_coeff


@flax.struct.dataclass
class CodecGanState:
    gen_params: Any
    disc_mpd: Any
    disc_mrd: Any
    gen_opt: Any
    disc_opt: Any
    step: jnp.ndarray


def create_codec_gan(key, wavtok: WavTokenizer, mpd: MultiPeriodDiscriminator,
                     mrd: MultiResolutionDiscriminator, audio_example,
                     config: CodecGanConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    # jit the inits: one compiled program each instead of hundreds of
    # eager per-op dispatches (the axon remote-TPU tunnel makes eager
    # init minutes-slow, and some eager ops are UNIMPLEMENTED there)
    gen_params = jax.jit(wavtok.init)(k1, audio_example)
    mpd_params = jax.jit(mpd.init)(k2, audio_example)
    mrd_params = jax.jit(mrd.init)(k3, audio_example)
    # cosine-with-warmup LR on both optimizers, stepped per optimizer step
    # (reference experiment.py:100-111)
    from lina_speech_tpu.train.harness import cosine_schedule_with_warmup

    gen_sched = cosine_schedule_with_warmup(
        config.lr_gen, config.num_warmup_steps, config.max_steps)
    disc_sched = cosine_schedule_with_warmup(
        config.lr_disc, config.num_warmup_steps, config.max_steps)
    gen_tx = optax.adamw(gen_sched, b1=config.betas[0], b2=config.betas[1])
    disc_tx = optax.adamw(disc_sched, b1=config.betas[0], b2=config.betas[1])
    state = CodecGanState(
        gen_params=gen_params,
        disc_mpd=mpd_params,
        disc_mrd=mrd_params,
        gen_opt=gen_tx.init(gen_params),
        disc_opt=disc_tx.init({"mpd": mpd_params, "mrd": mrd_params}),
        step=jnp.zeros((), jnp.int32),
    )
    return state, gen_tx, disc_tx


def make_codec_gan_steps(wavtok: WavTokenizer, mpd: MultiPeriodDiscriminator,
                         mrd: MultiResolutionDiscriminator, gen_tx, disc_tx,
                         config: CodecGanConfig):
    """Returns (disc_step, gen_step), each jitted: state, audio -> state, metrics."""

    def synth(gen_params, audio):
        return wavtok.apply(gen_params, audio)

    def disc_step(state: CodecGanState, audio):
        y_hat = jax.lax.stop_gradient(synth(state.gen_params, audio))

        def loss_fn(dparams):
            r_mpd, _ = mpd.apply(dparams["mpd"], audio)
            f_mpd, _ = mpd.apply(dparams["mpd"], y_hat)
            r_mrd, _ = mrd.apply(dparams["mrd"], audio)
            f_mrd, _ = mrd.apply(dparams["mrd"], y_hat)
            return disc_hinge_loss(r_mpd, f_mpd) + disc_hinge_loss(r_mrd, f_mrd)

        dparams = {"mpd": state.disc_mpd, "mrd": state.disc_mrd}
        loss, grads = jax.value_and_grad(loss_fn)(dparams)
        updates, disc_opt = disc_tx.update(grads, state.disc_opt, dparams)
        dparams = optax.apply_updates(dparams, updates)
        state = state.replace(disc_mpd=dparams["mpd"], disc_mrd=dparams["mrd"],
                              disc_opt=disc_opt)
        return state, {"disc_loss": loss}

    def gen_step(state: CodecGanState, audio):
        def loss_fn(gen_params):
            y_hat = synth(gen_params, audio)
            n = min(y_hat.shape[-1], audio.shape[-1])  # static shapes
            y_hat_c, y_c = y_hat[..., :n], audio[..., :n]
            l_mel = mel_loss(y_hat_c, y_c, sample_rate=config.sample_rate)
            pretrain = state.step < config.pretrain_mel_steps

            f_mpd, fm_f_mpd = mpd.apply(state.disc_mpd, y_hat_c)
            _, fm_r_mpd = mpd.apply(state.disc_mpd, y_c)
            f_mrd, fm_f_mrd = mrd.apply(state.disc_mrd, y_hat_c)
            _, fm_r_mrd = mrd.apply(state.disc_mrd, y_c)
            l_gen = gen_hinge_loss(f_mpd) + gen_hinge_loss(f_mrd)
            l_fm = feature_matching_loss(fm_r_mpd, fm_f_mpd) + feature_matching_loss(
                fm_r_mrd, fm_f_mrd
            )
            adv = jnp.where(pretrain, 0.0, l_gen + config.fm_coeff * l_fm)
            total = adv + mel_coeff_at(config, state.step) * l_mel
            return total, {"mel_loss": l_mel, "gen_adv": l_gen, "fm_loss": l_fm}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.gen_params
        )
        updates, gen_opt = gen_tx.update(grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)
        state = state.replace(gen_params=gen_params, gen_opt=gen_opt,
                              step=state.step + 1)
        metrics["gen_loss"] = loss
        return state, metrics

    return jax.jit(disc_step, donate_argnums=(0,)), jax.jit(gen_step, donate_argnums=(0,))
