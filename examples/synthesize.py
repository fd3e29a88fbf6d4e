"""Example: zero-shot TTS synthesis (+ optional voice-clone prompt).

With random weights this produces noise — it demonstrates the full flow
(text -> BPE -> codec tokens -> waveform). Point --lina-ckpt /
--wavtok-ckpt at orbax checkpoints (trained here, or converted from torch
with utils/checkpoint.py + utils/convert_wavtokenizer.py) for real speech.

  python examples/synthesize.py --text "hello world" --out out.wav
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", default="hello from the tpu")
    p.add_argument("--out", default="out.wav")
    p.add_argument("--config", default=None, help="model YAML (default tiny)")
    p.add_argument("--lina-ckpt", default=None)
    p.add_argument("--wavtok-ckpt", default=None)
    p.add_argument("--prompt-wav", default=None, help="voice-clone prompt audio")
    p.add_argument("--max-seqlen", type=int, default=200)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lina_speech_tpu.codec.wavtokenizer import WavTokenizer, WavTokenizerConfig
    from lina_speech_tpu.config import build_model, lina_gla_tiny, load_config
    from lina_speech_tpu.data.tokenizer import TextTokenizer
    from lina_speech_tpu.pipeline import TTSPipeline, write_wav

    if args.config:
        model_cfg = load_config(args.config)["model"]
    else:
        import dataclasses

        model_cfg = dataclasses.replace(lina_gla_tiny(), n_codebook=4096)
    model = build_model(model_cfg)

    ids = TextTokenizer().encode(args.text)
    x = jnp.asarray(ids, jnp.int32)[None]
    y = jnp.ones((1, 8, model_cfg.n_quant), jnp.int32)
    m = x.shape[1]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, y, jnp.ones((1, m, m), bool),
        jnp.ones((1, 8, m), bool), jnp.ones((1, 8), bool),
    )
    if args.lina_ckpt:
        from lina_speech_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.lina_ckpt, params)

    wt_cfg = WavTokenizerConfig()
    wavtok = WavTokenizer(wt_cfg)
    wt_params = wavtok.init(jax.random.PRNGKey(1), jnp.zeros((1, wt_cfg.hop * 4)))
    if args.wavtok_ckpt:
        from lina_speech_tpu.utils.checkpoint import restore_checkpoint

        wt_params = restore_checkpoint(args.wavtok_ckpt, wt_params)

    pipe = TTSPipeline(model, params, wavtok, wt_params, TextTokenizer())
    prompt_audio = None
    if args.prompt_wav:
        from lina_speech_tpu.data.audio_loader import NumpyAudioLoader

        loader = NumpyAudioLoader([args.prompt_wav], crop_len=wt_cfg.hop * 75,
                                  batch=1, train=False)
        prompt_audio = next(loader)

    waves, res = pipe.synthesize(
        args.text, jax.random.PRNGKey(2), prompt_audio=prompt_audio,
        max_seqlen=args.max_seqlen,
    )
    write_wav(args.out, waves[0] if waves[0].size else np.zeros(1600, np.float32))
    print(f"wrote {args.out}: {waves[0].size} samples, "
          f"{int(res.n_steps)} decode steps")


if __name__ == "__main__":
    main()
