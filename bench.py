"""Benchmark: batched AR codec-token decode throughput on the flagship model.

Prints ONE JSON line: aggregate real-time factor at batch 64 on one chip
(75 codec tokens/s == 1x realtime per stream, WavTokenizer rate,
reference README.md:31). Baseline target: >= 10x realtime per chip at
batch 64 (BASELINE.md targets) -> vs_baseline = rtf / 10.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    # persistent compile cache: the remote-TPU compile path is slow; cache
    # compiled executables across runs
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    steps = int(os.environ.get("BENCH_STEPS", "256"))
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "32"))
    codec_hz = 75.0

    import dataclasses

    from lina_speech_tpu.config import lina_gla_169m, build_model
    from lina_speech_tpu.generate import generate_batch

    cfg = lina_gla_169m(compute_dtype="bfloat16")
    state_dtype = os.environ.get("BENCH_STATE_DTYPE", "bfloat16")
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, state_dtype=state_dtype)
    )
    model = build_model(cfg)

    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (batch, text_len), 3, cfg.n_txt_vocab)
    bi = min(2, batch)
    y = jax.random.randint(key, (bi, 16, cfg.n_quant), 3, cfg.n_codebook + 3)
    params = model.init(
        jax.random.PRNGKey(1),
        x[:bi], y, jnp.ones((bi, text_len, text_len), bool),
        jnp.ones((bi, 16, text_len), bool), jnp.ones((bi, 16), bool),
    )

    def run(k):
        return generate_batch(
            model, params, x, k, max_seqlen=steps, k=100,
            force_max_seqlen=True,
        )

    # compile + warmup (checksum forces a host fetch: block_until_ready over
    # the remote-TPU tunnel has been observed returning before work completes)
    res = run(jax.random.PRNGKey(2))
    int(jnp.asarray(res.tokens).sum())

    t0 = time.perf_counter()
    res = run(jax.random.PRNGKey(3))
    int(jnp.asarray(res.tokens).sum())
    dt = time.perf_counter() - t0

    tokens_per_sec_per_stream = steps / dt
    rtf = batch * tokens_per_sec_per_stream / codec_hz
    print(
        json.dumps(
            {
                "metric": f"aggregate_realtime_factor_b{batch}",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 10.0, 3),
                "detail": {
                    "steps": steps,
                    "seconds": round(dt, 3),
                    "codec_tokens_per_sec_per_stream": round(tokens_per_sec_per_stream, 1),
                    "codec_tokens_per_sec_total": round(batch * tokens_per_sec_per_stream, 1),
                    "state_dtype": state_dtype,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
