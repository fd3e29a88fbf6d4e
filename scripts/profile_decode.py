"""Capture a jax.profiler trace of the flagship b64 decode loop on TPU.

Writes to --out (default /tmp/jaxprof_decode); summarize with
scripts/summarize_trace.py. The trace covers BENCH-shaped generation
(prefill + lazy-window decode loop).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/jaxprof_decode")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--lazy-window", type=int, default=8)
    ap.add_argument("--weight-quant", default=None)
    # bench.py overrides the config default (f32) to bf16 — a profile that
    # leaves this unset measures the WIDE-state XLA-step decode, a
    # different program than the bench's fused-kernel path (measured:
    # the f32 state update alone is ~171 MB/step of "fusion" traffic).
    ap.add_argument("--state-dtype", default="bfloat16")
    ap.add_argument("--kernel-mode", default=None,
                    help="override backbone kernel_mode (e.g. 'chunk' = "
                         "XLA decode step instead of the fused Pallas one)")
    ap.add_argument("--repeats", type=int, default=1,
                    help="back-to-back timed calls (overhead amortization)")
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import dataclasses
    import time

    from lina_speech_tpu.config import lina_gla_169m, build_model
    from lina_speech_tpu.generate import generate_batch

    cfg = lina_gla_169m(compute_dtype="bfloat16")
    bb_over = {"state_dtype": args.state_dtype}
    if args.kernel_mode:
        bb_over["kernel_mode"] = args.kernel_mode
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, **bb_over))
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (args.batch, 32), 3, cfg.n_txt_vocab)
    y = jax.random.randint(key, (2, 16, cfg.n_quant), 3, cfg.n_codebook + 3)
    # batch-2 init regardless of --batch (x[:2] is batch-1 when --batch 1,
    # mismatching the batch-2 masks); jitted: eager init of the 359M model
    # over the axon tunnel takes minutes of per-op RTT (CLAUDE.md)
    xi = jnp.broadcast_to(x[:1], (2, x.shape[1])) if args.batch < 2 else x[:2]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), xi, y,
        jnp.ones((2, 32, 32), bool), jnp.ones((2, 16, 32), bool),
        jnp.ones((2, 16), bool))

    def run(k):
        return generate_batch(
            model, params, x, k, max_seqlen=args.steps, k=100,
            force_max_seqlen=True, lazy_window=args.lazy_window,
            weight_quant=args.weight_quant, approx_topk=True,
        )

    res = run(jax.random.PRNGKey(2))
    print("warm checksum:", int(jnp.asarray(res.tokens).sum()))

    # wall timing, bench.py methodology (dispatch + device + scalar fetch):
    # wall - trace device time = fixed per-call overhead (tunnel RTT etc.)
    t0 = time.perf_counter()
    res = run(jax.random.PRNGKey(4))
    int(jnp.asarray(res.tokens).sum())
    wall = time.perf_counter() - t0
    print(f"wall (1 call, {args.steps} steps): {wall * 1e3:.1f} ms "
          f"-> {args.steps / wall:.1f} tok/s")
    if args.repeats > 1:
        t0 = time.perf_counter()
        acc = 0
        for i in range(args.repeats):
            acc += jnp.asarray(run(jax.random.PRNGKey(10 + i)).tokens).sum()
        int(acc)
        wall = time.perf_counter() - t0
        print(f"wall ({args.repeats} back-to-back calls): {wall * 1e3:.1f} ms"
              f" -> {args.repeats * args.steps / wall:.1f} tok/s sustained")

    with jax.profiler.trace(args.out):
        res = run(jax.random.PRNGKey(3))
        print("traced checksum:", int(jnp.asarray(res.tokens).sum()))
    print("trace written to", args.out)


if __name__ == "__main__":
    main()
