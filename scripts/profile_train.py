"""Capture a jax.profiler trace of the flagship train step on TPU.

Writes the trace to --out (default /tmp/jaxprof); summarize with
scripts/summarize_trace.py. Timing caveats per CLAUDE.md (axon tunnel).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/jaxprof")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--accum", type=int, default=1,
                    help="grad_accum_steps (bench default is 4; --batch is "
                         "the FULL batch, micro = batch//accum)")
    ap.add_argument("--unroll", action="store_true",
                    help="unroll_accum=True (Python-unrolled micro loop)")
    ap.add_argument("--hoist", action="store_true")
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from lina_speech_tpu.config import lina_gla_169m, build_model
    from lina_speech_tpu.train import TrainConfig, create_train_state, make_train_step

    cfg = lina_gla_169m(compute_dtype="bfloat16")
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    text_len = 32
    x = jax.random.randint(key, (args.batch, text_len), 3, cfg.n_txt_vocab)
    y = jax.random.randint(key, (args.batch, args.seqlen, cfg.n_quant), 3,
                           cfg.n_codebook + 3)
    b = {
        "text_token": x,
        "audio_token": y,
        "encoder_mask": jnp.ones((args.batch, text_len, text_len), bool),
        "crossatt_mask": jnp.ones((args.batch, args.seqlen, text_len), bool),
        "y_mask": jnp.ones((args.batch, args.seqlen), bool),
    }
    # jitted: eager init of the 359M model over the axon tunnel takes
    # minutes of per-op RTT (CLAUDE.md)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), x, y[:, :16], b["encoder_mask"],
        b["crossatt_mask"][:, :16], b["y_mask"][:, :16])
    state = create_train_state(model, params, TrainConfig())
    step = make_train_step(model, grad_accum_steps=args.accum,
                           unroll_accum=args.unroll,
                           hoist_param_cast=args.hoist)
    rng = jax.random.PRNGKey(2)

    for _ in range(2):  # compile + warm
        state, m = step(state, b, rng)
        float(m["loss"])

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = step(state, b, rng)
        float(m["loss"])
    print("trace written to", args.out)


if __name__ == "__main__":
    main()
