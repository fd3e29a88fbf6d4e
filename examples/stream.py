"""Streaming TTS demo: audio chunks arrive while tokens still generate.

    python examples/stream.py --cpu

Builds a tiny random-init model + codec (structure demo; swap in trained
checkpoints via utils/checkpoint.py for real speech), then streams a
sentence: each line prints the chunk index, its samples, and the running
latency — time-to-first-audio is ~(window + context) decode steps, not
the whole utterance.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--text", default="streaming synthesis demo")
    ap.add_argument("--max-len", type=int, default=60)
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--context", type=int, default=8)
    ap.add_argument("--out", default=None, help="optional WAV path")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lina_speech_tpu.codec.wavtokenizer import (
        WavTokenizer, WavTokenizerConfig,
    )
    from lina_speech_tpu.config import build_model, lina_gla_tiny
    from lina_speech_tpu.data.tokenizer import TextTokenizer
    from lina_speech_tpu.pipeline import TTSPipeline, write_wav

    cfg = dataclasses.replace(lina_gla_tiny(), n_codebook=32)
    model = build_model(cfg)
    x = jax.random.randint(jax.random.PRNGKey(0), (1, 9), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(1), (1, 9, 1), 3, 35)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(2), x, y, jnp.ones((1, 9, 9), bool),
        jnp.ones((1, 9, 9), bool), jnp.ones((1, 9), bool))
    wt_cfg = WavTokenizerConfig(
        ratios=(4, 2), n_filters=2, latent_dim=16, bins=32,
        backbone_dim=32, backbone_intermediate_dim=64, backbone_layers=1,
        n_fft=16, hop_length=8)
    wavtok = WavTokenizer(wt_cfg)
    wt_params = wavtok.init(jax.random.PRNGKey(3), jnp.zeros((1, 64)))
    pipe = TTSPipeline(model, params, wavtok, wt_params, TextTokenizer())

    t0 = time.perf_counter()
    chunks = []
    for i, wav in enumerate(pipe.stream_synthesize(
            args.text, max_seqlen=args.max_len, k=5, seed=5,
            window=args.window, context=args.context, chunk=8)):
        dt = time.perf_counter() - t0
        chunks.append(np.asarray(wav[0]))
        print(f"chunk {i}: {wav.shape[-1]} samples at t={dt:.2f}s"
              + ("  <- first audio" if i == 0 else ""))
    audio = np.concatenate(chunks)
    print(f"total {audio.shape[-1]} samples in "
          f"{time.perf_counter() - t0:.2f}s")
    if args.out:
        write_wav(args.out, audio, wt_cfg.sample_rate)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
