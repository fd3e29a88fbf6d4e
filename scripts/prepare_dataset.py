"""Offline audio tokenization -> training shards (reference SURVEY §3.4 flow:
WavTokenizer.encode_infer over a corpus, codes stored for the TTS trainer).

Input: a manifest TSV with lines "<wav_path>\t<transcript>".
Output: .npz shards consumable by data/dataset.py (TokenizedTTSDataset).

  python scripts/prepare_dataset.py --manifest files.tsv --out shards/ \
      [--wavtok-ckpt orbax_dir] [--shard-size 512] [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--wavtok-ckpt", default=None)
    p.add_argument("--shard-size", type=int, default=512)
    p.add_argument("--sample-rate", type=int, default=24000)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lina_speech_tpu.codec.wavtokenizer import WavTokenizer, WavTokenizerConfig
    from lina_speech_tpu.data.audio_loader import NumpyAudioLoader
    from lina_speech_tpu.data.dataset import TokenizedTTSDataset
    from lina_speech_tpu.data.resample import resample

    cfg = WavTokenizerConfig()
    wavtok = WavTokenizer(cfg)
    params = wavtok.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop * 4)))
    if args.wavtok_ckpt:
        from lina_speech_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.wavtok_ckpt, params)

    encode = jax.jit(
        lambda audio: wavtok.apply(params, audio, method=WavTokenizer.encode)[1]
    )
    reader = NumpyAudioLoader([], crop_len=0, batch=0)  # reuse its WAV parser

    os.makedirs(args.out, exist_ok=True)
    items, shard_idx, n_done = [], 0, 0
    for line in open(args.manifest):
        line = line.rstrip("\n")
        if not line:
            continue
        path, text = line.split("\t", 1)
        audio = reader._read(path)
        # best-effort resample if a source rate is encoded in the filename
        # convention "<name>@<sr>.wav"; WAVs are assumed target-rate otherwise
        if "@" in os.path.basename(path):
            src_sr = int(os.path.basename(path).split("@")[-1].split(".")[0])
            audio = resample(audio, src_sr, args.sample_rate)
        # pad to a hop multiple so every frame is produced
        pad = (-len(audio)) % cfg.hop
        audio = np.pad(audio, (0, pad))
        codes = np.asarray(encode(jnp.asarray(audio)[None]))[:, 0]  # (n_q, T')
        items.append({"audio_token": codes, "text": text})
        n_done += 1
        if len(items) >= args.shard_size:
            TokenizedTTSDataset.save_npz(
                os.path.join(args.out, f"shard_{shard_idx:05d}.npz"), items
            )
            shard_idx += 1
            items = []
    if items:
        TokenizedTTSDataset.save_npz(
            os.path.join(args.out, f"shard_{shard_idx:05d}.npz"), items
        )
    print(f"tokenized {n_done} utterances into {shard_idx + 1} shards at {args.out}")


if __name__ == "__main__":
    main()
