"""Codec/vocoder GAN training CLI (the reference's VocosExp workload,
decoder/experiment.py:447-456): alternating disc/gen steps over audio crops.

``python -m lina_speech_tpu.train.codec_cli fit --filelist files.txt`` uses
the native C++ audio loader (data/audio_loader.py); with no filelist it
trains on synthetic noise (pipeline smoke).
"""
from __future__ import annotations

import argparse
import itertools
from typing import Iterator

import jax
import numpy as np


def audio_batches(args) -> Iterator[np.ndarray]:
    if args.filelist:
        from lina_speech_tpu.data.audio_loader import make_audio_loader

        paths = [l.strip() for l in open(args.filelist) if l.strip()]
        return iter(make_audio_loader(paths, args.crop_len, args.batch_size,
                                      seed=args.seed))
    rng = np.random.default_rng(args.seed)

    def gen():
        while True:
            yield rng.normal(size=(args.batch_size, args.crop_len)).astype(np.float32) * 0.1

    return gen()


def fit(args) -> None:
    from lina_speech_tpu.codec.discriminators import (
        MultiPeriodDiscriminator, MultiResolutionDiscriminator,
    )
    from lina_speech_tpu.codec.gan import (
        CodecGanConfig, create_codec_gan, make_codec_gan_steps,
    )
    from lina_speech_tpu.codec.wavtokenizer import WavTokenizer, WavTokenizerConfig
    from lina_speech_tpu.utils.checkpoint import save_checkpoint
    from lina_speech_tpu.utils.profiling import MetricsLogger, StepTimer

    wt_cfg = WavTokenizerConfig() if not args.tiny else WavTokenizerConfig(
        ratios=(4, 2), n_filters=2, latent_dim=16, bins=64, backbone_dim=32,
        backbone_intermediate_dim=64, backbone_layers=1, n_fft=32, hop_length=8,
    )
    wavtok = WavTokenizer(wt_cfg)
    mpd = MultiPeriodDiscriminator()
    mrd = MultiResolutionDiscriminator()
    gan_cfg = CodecGanConfig(pretrain_mel_steps=args.pretrain_mel_steps)

    data = audio_batches(args)
    audio0 = jax.numpy.asarray(next(data))
    state, gen_tx, disc_tx = create_codec_gan(
        jax.random.PRNGKey(args.seed), wavtok, mpd, mrd, audio0, gan_cfg
    )
    disc_step, gen_step = make_codec_gan_steps(wavtok, mpd, mrd, gen_tx, disc_tx, gan_cfg)

    # --dp N: data-parallel GAN training over a mesh (the reference trains
    # its vocoder with Lightning DDP, decoder/experiment.py:447-456). Crops
    # shard over dp, generator/discriminator states replicate; XLA inserts
    # the gradient psum from the sharding — no hand-rolled sync_grad needed.
    shard_audio = lambda a: a
    if args.dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lina_speech_tpu.parallel import MeshConfig, make_mesh

        if args.batch_size % args.dp != 0:
            raise SystemExit(f"--batch-size {args.batch_size} not divisible "
                             f"by --dp {args.dp}")
        mesh = make_mesh(MeshConfig(dp=args.dp, tp=1))
        repl = NamedSharding(mesh, P())
        state = jax.tree_util.tree_map(
            lambda l: jax.device_put(l, repl), state)
        batched = NamedSharding(mesh, P("dp"))
        shard_audio = lambda a: jax.device_put(a, batched)

    # validation hooks: SI-SNR/LSD/mel always; UTMOS/PESQ when assets exist
    from lina_speech_tpu.codec.metrics import external_metric_hooks, quality_metrics

    hooks = external_metric_hooks(utmos_path=args.utmos_ckpt,
                                  sample_rate=gan_cfg.sample_rate)

    logger = MetricsLogger(args.log_file, print_every=args.log_every)
    timer = StepTimer()
    for i, audio in enumerate(itertools.chain([audio0], data)):
        if i >= args.steps:
            break
        audio = shard_audio(jax.numpy.asarray(audio))
        with timer:
            state, dmetrics = disc_step(state, audio)
            state, gmetrics = gen_step(state, audio)
        if i % args.log_every == 0:
            logger.log(i, {**{k: float(v) for k, v in dmetrics.items()},
                           **{k: float(v) for k, v in gmetrics.items()},
                           "step_time_s": timer.last})
        if args.val_every and i > 0 and i % args.val_every == 0:
            recon = wavtok.apply(state.gen_params, audio)[:, : audio.shape[-1]]
            qm = quality_metrics(recon, audio, gan_cfg.sample_rate, hooks)
            logger.log(i, {f"val_{k}": float(v) for k, v in qm.items()})
    if args.ckpt_dir:
        import os

        save_checkpoint(os.path.abspath(args.ckpt_dir), state.gen_params, step=args.steps)
    print(f"done: {args.steps} steps, mean step {timer.mean*1e3:.1f} ms")


def main(argv=None):
    p = argparse.ArgumentParser(prog="lina_speech_tpu.train.codec")
    sub = p.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("fit")
    f.add_argument("--filelist", type=str, default=None)
    f.add_argument("--steps", type=int, default=100)
    f.add_argument("--batch-size", type=int, default=2)
    f.add_argument("--crop-len", type=int, default=24000)
    f.add_argument("--pretrain-mel-steps", type=int, default=0)
    f.add_argument("--tiny", action="store_true")
    f.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices for GAN training (crops "
                        "shard, states replicate; reference = Lightning DDP)")
    f.add_argument("--val-every", type=int, default=0,
                   help="run quality metrics every N steps (0 = off)")
    f.add_argument("--utmos-ckpt", type=str, default=None,
                   help="TorchScript UTMOS MOS-predictor path (optional)")
    f.add_argument("--seed", type=int, default=0)
    f.add_argument("--ckpt-dir", type=str, default=None)
    f.add_argument("--log-every", type=int, default=10)
    f.add_argument("--log-file", type=str, default=None)
    f.add_argument("--platform", type=str, default=None,
                   help="force a jax backend (e.g. 'cpu'); more reliable "
                        "than JAX_PLATFORMS, which site hooks can override")
    args = p.parse_args(argv)
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.dp > 1:
            from lina_speech_tpu.parallel import ensure_virtual_cpu_devices

            ensure_virtual_cpu_devices(args.dp)
    # persistent compile cache (host-scoped on CPU — see
    # utils/compile_cache.py); must follow the platform decision above
    from lina_speech_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if args.cmd == "fit":
        fit(args)


if __name__ == "__main__":
    main()
