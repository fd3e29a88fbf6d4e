"""One-pipeline real-audio round trip: WAV files -> trained TTS -> audio.

Closes the InferenceLina-flow gap (reference 3rdparty/decoder/
pretrained.py:179-239 + model/modeling_lina.py:111-192) with in-env assets
only, as ONE artifact-producing pipeline:

  1. synthesize a few harmonic speech-like WAVs to disk (PCM16);
  2. read them back through the native C++ audio loader
     (data/audio_loader.py -> native/audioloader.cpp);
  3. train the WavTokenizer codec with the GAN harness on loader crops
     (codec/gan.py, the reference VocosExp workload);
  4. encode each utterance to codec codes, delay-RVQ collate with its
     transcript (data/collate.py);
  5. train the Lina TTS model on those (text, codes) pairs;
  6. synthesize each transcript back to a waveform through
     pipeline.TTSPipeline (generate_batch -> cut_outputs -> vocoder);
  7. score codec reconstruction and TTS output against the source audio
     with SI-SNR / LSD / mel-L1 (codec/metrics.py) and report token
     accuracy of the generated streams vs the encoded ground truth.

Prints one JSON line with every measurement; writes the synthesized WAVs
next to the sources. CPU-runnable in a few minutes at the default tiny
sizes; the same script scales up on TPU.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_source_wavs(out_dir: str, n: int, length: int, sample_rate: int,
                     seed: int = 0):
    """Harmonic-rich utterances (f0 + partials, moving envelope, light
    noise) — the same family the codec-GAN convergence test learns."""
    from lina_speech_tpu.pipeline import write_wav

    rng = np.random.default_rng(seed)
    t = np.arange(length) / float(sample_rate)
    waves, paths = [], []
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        f0 = 110.0 + 70.0 * i
        sig = sum((0.5 ** h) * np.sin(2 * np.pi * f0 * (h + 1) * t
                                      + rng.uniform(0, 6))
                  for h in range(4))
        env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3.0 * t + i))
        sig = (sig * env + 0.01 * rng.normal(size=t.shape))
        sig = (sig / np.abs(sig).max()).astype(np.float32)
        p = os.path.join(out_dir, f"src_{i}.wav")
        write_wav(p, sig, sample_rate)
        waves.append(sig)
        paths.append(p)
    return paths, np.stack(waves)


def train_codec(paths: List[str], steps: int, crop_len: int, batch: int,
                sample_rate: int, seed: int = 0):
    """GAN-train the tiny WavTokenizer on crops from the native loader."""
    import jax
    import jax.numpy as jnp

    import lina_speech_tpu.codec.gan as gan_mod
    from lina_speech_tpu.codec.discriminators import (
        MultiPeriodDiscriminator, MultiResolutionDiscriminator,
    )
    from lina_speech_tpu.codec.gan import (
        CodecGanConfig, create_codec_gan, make_codec_gan_steps,
    )
    from lina_speech_tpu.codec.wavtokenizer import (
        WavTokenizer, WavTokenizerConfig,
    )
    from lina_speech_tpu.data.audio_loader import make_audio_loader

    wt_cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=4, latent_dim=32, bins=64,
        backbone_dim=64, backbone_intermediate_dim=128, backbone_layers=2,
        n_fft=16, hop_length=8, sample_rate=sample_rate,
    )
    wt = WavTokenizer(wt_cfg)
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    mrd = MultiResolutionDiscriminator(resolutions=((128, 32),))
    gcfg = CodecGanConfig(sample_rate=sample_rate, lr_gen=1e-3, lr_disc=1e-3,
                          commit_coeff=1.0)

    loader = iter(make_audio_loader(paths, crop_len, batch, seed=seed))
    audio0 = jnp.asarray(next(loader))
    state, gen_tx, disc_tx = create_codec_gan(
        jax.random.PRNGKey(seed), wt, mpd, mrd, audio0, gcfg)

    # crop-sized mel config (the default 1024-FFT needs longer audio)
    orig_mel = gan_mod.mel_loss
    gan_mod.mel_loss = lambda a, b, sample_rate: orig_mel(
        a, b, sample_rate=sample_rate, n_fft=256, hop=64, n_mels=24)
    try:
        disc_step, gen_step = make_codec_gan_steps(
            wt, mpd, mrd, gen_tx, disc_tx, gcfg)
        mel_first = mel_last = None
        for i in range(steps):
            batch_i = jnp.asarray(next(loader))
            state, dm = disc_step(state, batch_i)
            state, gm = gen_step(state, batch_i)
            if not np.isfinite(float(gm["gen_loss"])):
                raise RuntimeError(f"codec GAN diverged at step {i}")
            if mel_first is None:
                mel_first = float(gm["mel_loss"])
            mel_last = float(gm["mel_loss"])
    finally:
        gan_mod.mel_loss = orig_mel
    return wt, state.gen_params, {"codec_mel_first": mel_first,
                                  "codec_mel_last": mel_last}


def train_tts(wt, wt_params, sources: np.ndarray, texts: List[str],
              steps: int, seed: int = 0):
    """Encode sources -> delay-RVQ collate -> overfit the tiny Lina model."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lina_speech_tpu.codec.wavtokenizer import WavTokenizer
    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.data.collate import collate_tts
    from lina_speech_tpu.data.tokenizer import TextTokenizer
    from lina_speech_tpu.train import (
        TrainConfig, create_train_state, make_train_step,
    )

    hop = wt.config.hop
    pad = (-sources.shape[-1]) % hop
    audio = jnp.asarray(np.pad(sources, ((0, 0), (0, pad))))
    _, codes = wt.apply(wt_params, audio, method=WavTokenizer.encode)
    codes = np.asarray(codes)  # (n_q, B, T')

    tok = TextTokenizer()
    items = [{"audio_token": codes[:, i, :], "text": texts[i]}
             for i in range(len(texts))]
    batch_np = collate_tts(items, tok)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    cfg = lina_gla_tiny()
    cfg = dataclasses.replace(cfg, n_codebook=wt.config.bins)
    model = build_model(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed + 1), batch["text_token"],
        batch["audio_token"], batch["encoder_mask"], batch["crossatt_mask"],
        batch["y_mask"])
    state = create_train_state(
        model, params,
        TrainConfig(learning_rate=3e-3, weight_decay=0.0, n_warmup_steps=20,
                    n_training_steps=max(steps, 100)))
    step = make_train_step(model, donate=False)

    @jax.jit
    def forced_acc(params):
        # teacher-forced argmax accuracy on valid targets: 1.0 here makes
        # greedy free-running decode reproduce the stream EXACTLY (by
        # induction over positions), which low mean CE does not guarantee
        logits, _, _ = model.apply(
            params, batch["text_token"], batch["audio_token"],
            batch["encoder_mask"], batch["crossatt_mask"], batch["y_mask"])
        target = batch["audio_token"][:, 1:]
        valid = (target != 1) & batch["y_mask"][:, 1:, None]
        hit = (jnp.argmax(logits, axis=-1) == target) & valid
        return hit.sum() / jnp.maximum(valid.sum(), 1)

    loss, acc = None, 0.0
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(seed + 2))
        loss = float(metrics["loss"])
        if loss < 0.05 and (i + 1) % 25 == 0:
            acc = float(forced_acc(state.params))
            if acc == 1.0:
                break
    if acc != 1.0:
        acc = float(forced_acc(state.params))
    return model, state.params, codes, tok, {"tts_final_loss": loss,
                                             "tts_steps_run": i + 1,
                                             "tts_forced_accuracy": acc}


def main(argv=None) -> Dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/e2e_roundtrip")
    ap.add_argument("--n-utts", type=int, default=3)
    ap.add_argument("--length", type=int, default=800)
    ap.add_argument("--sample-rate", type=int, default=24000)
    ap.add_argument("--codec-steps", type=int, default=240)
    ap.add_argument("--codec-crop", type=int, default=512)
    ap.add_argument("--tts-steps", type=int, default=400)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the ambient env defaults "
                         "to the remote TPU)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from lina_speech_tpu.codec.metrics import quality_metrics, si_snr
    from lina_speech_tpu.codec.wavtokenizer import WavTokenizer
    from lina_speech_tpu.pipeline import TTSPipeline, write_wav

    report: Dict = {}

    # 1-2. sources on disk, read back through the C++ loader inside codec
    # training; transcripts are distinct so the TTS model must use the text
    paths, sources = make_source_wavs(args.out, args.n_utts, args.length,
                                      args.sample_rate)
    texts = [f"utterance number {i} of the round trip"
             for i in range(args.n_utts)]

    # 3. codec training on loader crops
    wt, wt_params, codec_stats = train_codec(
        paths, args.codec_steps, min(args.codec_crop, args.length),
        batch=2, sample_rate=args.sample_rate)
    report.update(codec_stats)

    # codec reconstruction quality vs sources (decode(encode(x)))
    import jax.numpy as jnp

    hop = wt.config.hop
    pad = (-sources.shape[-1]) % hop
    audio = jnp.asarray(np.pad(sources, ((0, 0), (0, pad))))
    recon = np.asarray(wt.apply(wt_params, audio))[:, :sources.shape[-1]]
    qm = quality_metrics(jnp.asarray(recon), jnp.asarray(sources),
                         sample_rate=args.sample_rate)
    report.update({f"codec_{k}": float(v) for k, v in qm.items()})

    # 4-5. TTS training on (text, codes)
    model, params, codes, tok, tts_stats = train_tts(
        wt, wt_params, sources, texts, args.tts_steps)
    report.update(tts_stats)

    # 6. synthesis through the full pipeline (greedy)
    pipe = TTSPipeline(model, params, wt, wt_params, tok)
    n_frames = codes.shape[-1]
    max_seqlen = n_frames + model.n_quant + 4
    tts_waves, token_accs = [], []
    for i, text in enumerate(texts):
        waves, res = pipe.synthesize(text, jax.random.PRNGKey(7 + i),
                                     max_seqlen=max_seqlen, k=1)
        w = waves[0]
        write_wav(os.path.join(args.out, f"tts_{i}.wav"), w,
                  args.sample_rate)
        tts_waves.append(w)
        # token accuracy of the generated raw-code stream vs ground truth.
        # cut_outputs follows the reference convention (tools.py:61-67 +
        # modeling_lina.py:188-191): undelay_rvq over the SAMPLED stream
        # (which lacks the forced head token) starts the output at code_1,
        # so ground truth aligns at offset 1.
        from lina_speech_tpu.generate import cut_outputs

        got = cut_outputs(res, model.n_quant,
                          model.n_special_token_in)[0][0][:, 0, :]
        L = min(got.shape[-1], n_frames - 1)
        acc = float((got[:, :L] == codes[:, i, 1:1 + L]).mean()) if L else 0.0
        token_accs.append(acc)
    report["tts_token_accuracy"] = float(np.mean(token_accs))
    report["tts_token_accuracy_per_utt"] = token_accs

    # 7. score TTS audio vs source and vs the codec reconstruction (the
    # ceiling: perfect tokens decode to exactly the reconstruction). The
    # reference cut convention starts the output at code_1, so the TTS
    # waveform sits one hop EARLIER than the source — align by hop.
    tl = min(min(len(w) for w in tts_waves), sources.shape[-1] - hop)
    if tl > 0:
        tts = jnp.asarray(np.stack([w[:tl] for w in tts_waves]))
        qm2 = quality_metrics(tts, jnp.asarray(sources[:, hop:hop + tl]),
                              sample_rate=args.sample_rate)
        report.update({f"tts_{k}": float(v) for k, v in qm2.items()})
        report["tts_vs_recon_si_snr_db"] = float(
            si_snr(tts, jnp.asarray(recon[:, hop:hop + tl])).mean())
    report["wav_dir"] = args.out
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
