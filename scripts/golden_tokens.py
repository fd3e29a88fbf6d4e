"""Golden-token harness: dump / compare greedy-decode token streams.

The reference's de-facto integration test was checkpoint-driven decoding in
a notebook (SURVEY §4). Here: deterministic greedy decode of a fixed config
+ seed is dumped to JSON; `compare` re-runs and diffs token-for-token. Used
as a regression gate across kernel/engine refactors, and — once a converted
torch checkpoint is supplied via --params — for token-level parity with the
PyTorch reference (BASELINE.md correctness target).

Usage:
  python scripts/golden_tokens.py dump   --out golden/tiny.json
  python scripts/golden_tokens.py compare --golden golden/tiny.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(seed: int, params_path=None):
    import jax

    # deterministic goldens are defined on CPU numerics
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lina_speech_tpu.config import build_model, lina_gla_tiny

    model = build_model(lina_gla_tiny())
    b, m = 2, 11
    x = jax.random.randint(jax.random.PRNGKey(seed), (b, m), 3, 256)
    y = jax.random.randint(jax.random.PRNGKey(seed + 1), (b, 9, 1), 3, 53)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed + 2), x, y,
        jnp.ones((b, m, m), bool), jnp.ones((b, 9, m), bool),
        jnp.ones((b, 9), bool),
    )
    if params_path:
        from lina_speech_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(params_path, params)
    return model, params, x


def decode(model, params, x, steps: int):
    import jax

    from lina_speech_tpu.generate import generate_batch

    res = generate_batch(
        model, params, x, jax.random.PRNGKey(0), max_seqlen=steps,
        first_greedy_quant=0, force_max_seqlen=True,
    )
    import numpy as np

    return np.asarray(res.tokens).tolist()


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("dump", "compare"):
        s = sub.add_parser(name)
        s.add_argument("--seed", type=int, default=1234)
        s.add_argument("--steps", type=int, default=24)
        s.add_argument("--params", type=str, default=None)
        s.add_argument("--out" if name == "dump" else "--golden", type=str,
                       required=True)
    args = p.parse_args(argv)

    model, params, x = build(args.seed, args.params)
    tokens = decode(model, params, x, args.steps)
    if args.cmd == "dump":
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        json.dump({"seed": args.seed, "steps": args.steps, "tokens": tokens},
                  open(args.out, "w"))
        print(f"dumped {args.out}")
    else:
        golden = json.load(open(args.golden))
        assert golden["seed"] == args.seed and golden["steps"] == args.steps
        if golden["tokens"] == tokens:
            print("MATCH: token-for-token identical")
        else:
            import numpy as np

            a = np.asarray(golden["tokens"])
            b = np.asarray(tokens)
            frac = float((a == b).mean())
            print(f"MISMATCH: {frac:.4f} token match rate")
            raise SystemExit(1)


if __name__ == "__main__":
    main()
