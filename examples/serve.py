"""Example: continuous-batching TTS serving with DecodeServer.

With random weights this produces noise-token streams — it demonstrates
the serving flow (queue -> slots -> chunked decode -> completions).
Point --lina-ckpt at a trained/converted orbax checkpoint for real use.

  python examples/serve.py --requests 6 --slots 2 --cpu
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=6)
    p.add_argument("--slots", type=int, default=2)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--max-len", type=int, default=64)
    p.add_argument("--config", default=None, help="model YAML (default tiny)")
    p.add_argument("--lina-ckpt", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--lazy", action="store_true",
                   help="lazy micro-chunk decode (chunk == lazy window; "
                        "wins at high slot occupancy, GLA backbones)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lina_speech_tpu.config import build_model, lina_gla_tiny, load_config
    from lina_speech_tpu.data.tokenizer import TextTokenizer
    from lina_speech_tpu.serving import DecodeServer

    cfg = load_config(args.config).model if args.config else lina_gla_tiny()
    model = build_model(cfg)
    tok = TextTokenizer()

    if args.lina_ckpt:
        from lina_speech_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(os.path.abspath(args.lina_ckpt), None)
    else:
        x = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 3,
                               cfg.n_txt_vocab)
        y = jax.random.randint(jax.random.PRNGKey(1), (1, 8, cfg.n_quant), 3,
                               cfg.n_codebook + 3)
        params = model.init(jax.random.PRNGKey(2), x, y,
                            jnp.ones((1, 8, 8), bool),
                            jnp.ones((1, 8, 8), bool),
                            jnp.ones((1, 8), bool))

    texts = [f"hello stream number {i} from the tpu" for i in range(args.requests)]
    srv = DecodeServer(model, params, n_slots=args.slots,
                       max_text_len=64, chunk=args.chunk, lazy=args.lazy)
    t0 = time.perf_counter()
    for t in texts:
        srv.submit(np.asarray(tok.encode(t)), max_len=args.max_len)
    done = srv.run()
    dt = time.perf_counter() - t0
    total = sum(c.length for c in done)
    print(f"{len(done)} requests, {total} tokens in {dt:.2f}s "
          f"({total / dt:.0f} tok/s aggregate) on {args.slots} slots")
    for c in done:
        print(f"  rid={c.rid} len={c.length} stopped={c.stopped}")


if __name__ == "__main__":
    main()
