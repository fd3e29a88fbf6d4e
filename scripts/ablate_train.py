"""Ablate the 169M train step on TPU: which component costs what.

Times one jitted train step (B8 T512 by default) for a list of model/step
variants. Timing via scalar fetch. Usage:
    python scripts/ablate_train.py [--steps 6] [--variants full,xla_kernel,...]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_batch(cfg, batch, seqlen, text_len):
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (batch, text_len), 3, cfg.n_txt_vocab)
    y = jax.random.randint(key, (batch, seqlen, cfg.n_quant), 3, cfg.n_codebook + 3)
    return {
        "text_token": x,
        "audio_token": y,
        "encoder_mask": jnp.ones((batch, text_len, text_len), bool),
        "crossatt_mask": jnp.ones((batch, seqlen, text_len), bool),
        "y_mask": jnp.ones((batch, seqlen), bool),
    }


def time_variant(name, cfg, batch, seqlen, text_len, steps, grads_only=False):
    from lina_speech_tpu.config import build_model
    from lina_speech_tpu.train import TrainConfig, create_train_state, make_train_step
    from lina_speech_tpu.train.harness import _loss_and_metrics

    model = build_model(cfg)
    b = build_batch(cfg, batch, seqlen, text_len)
    params = model.init(jax.random.PRNGKey(1), b["text_token"],
                        b["audio_token"][:, :16], b["encoder_mask"],
                        b["crossatt_mask"][:, :16], b["y_mask"][:, :16])
    state = create_train_state(model, params, TrainConfig())
    rng = jax.random.PRNGKey(2)

    if grads_only:
        @jax.jit
        def step_fn(params, bb):
            def loss_fn(p):
                return _loss_and_metrics(model, p, bb, deterministic=True)
            (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return m["loss"] + sum(
                x.astype(jnp.float32).sum() * 0 for x in jax.tree_util.tree_leaves(g))

        def run():
            return float(step_fn(state.params, b))
    else:
        train_step = make_train_step(model, donate=False)

        def run():
            nonlocal state
            state, metrics = train_step(state, b, rng)
            return float(metrics["loss"])

    run()
    run()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        run()
    dt = (time.perf_counter() - t0) / steps
    toks = batch * seqlen / dt
    print(f"{name:28s}: {dt * 1e3:8.1f} ms/step  {toks:9.0f} tok/s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--text-len", type=int, default=32)
    ap.add_argument("--variants", default="full,grads_only,xla_kernel,no_conv,"
                    "vanilla_ca,half_layers,no_text_enc")
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from lina_speech_tpu.config import lina_gla_169m

    base = lina_gla_169m(compute_dtype="bfloat16")
    rb = lambda **kw: dataclasses.replace(
        base, backbone=dataclasses.replace(base.backbone, **kw))
    variants = {
        "full": (base, {}),
        "grads_only": (base, {"grads_only": True}),
        "xla_kernel": (rb(kernel_mode="chunk"), {}),
        "no_conv": (rb(use_short_conv=False), {}),
        "vanilla_ca": (rb(blind=False), {}),
        "half_layers": (rb(n_layer=6), {}),
        "no_text_enc": (dataclasses.replace(
            base, text_encoder=dataclasses.replace(
                base.text_encoder, n_layers=1)), {}),
    }
    for name in args.variants.split(","):
        cfg, kw = variants[name]
        try:
            time_variant(name, cfg, args.batch, args.seqlen, args.text_len,
                         args.steps, **kw)
        except Exception as e:  # keep going; report
            print(f"{name:28s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
