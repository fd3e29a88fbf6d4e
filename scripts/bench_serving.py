"""Serving-engine decode throughput at slot occupancy (real TPU).

Measures the DecodeServer's steady-state decode-chunk loop on the
flagship config at full occupancy — the number a serving deployment
actually sustains — for three engines:

  classic      per-token decode chunk (the default)
  lazy         lazy=True: chunk == lazy window, one fold per chunk
  lazy_int8    lazy=True, state_quant="int8" (lossy knob, BASELINE.md)

Timing convention (axon tunnel): back-to-back ``_decode_chunk`` dispatches
threading (state, y_embd, t) — the dependency chain prevents DCE/LICM —
with ONE scalar fetch at the end (bulk token fetches run ~100 KB/s over
the tunnel and would swamp the measurement; on local-PCIe hosts the
per-chunk (chunk, B, q) int32 token fetch is microseconds). The host
bookkeeping between chunks (numpy slot scatter + stop scan) is measured
separately below so a deployment estimate is total = device + host.

Slots are filled synthetically (random x_enc / y_embd, all-valid text
mask, zero states): per-token decode work is data-independent, so the
steady-state rate equals a real-request run without paying 64 remote
prefills per arm.

Usage: python scripts/bench_serving.py [--slots 64] [--chunk 16]
           [--iters 32] [--arms classic,lazy,lazy_int8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CODEC_HZ = 75.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=64)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--text-len", type=int, default=32)
    p.add_argument("--arms", default="classic,lazy,lazy_int8")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config (CPU smoke of the harness itself)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lina_speech_tpu.config import (
        build_model, lina_gla_169m, lina_gla_tiny,
    )
    from lina_speech_tpu.serving import DecodeServer
    from lina_speech_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import dataclasses

    cfg = lina_gla_tiny() if args.tiny else lina_gla_169m(
        compute_dtype="bfloat16")
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(
            cfg.backbone,
            state_dtype=("float32" if args.tiny else "bfloat16")))
    model = build_model(cfg)

    key = jax.random.PRNGKey(0)
    m = args.text_len
    x = jax.random.randint(key, (2, m), 3, cfg.n_txt_vocab)
    y = jax.random.randint(key, (2, 16, cfg.n_quant), 3, cfg.n_codebook + 3)
    params = model.init(jax.random.PRNGKey(1), x, y,
                        jnp.ones((2, m, m), bool),
                        jnp.ones((2, 16, m), bool),
                        jnp.ones((2, 16), bool))

    arm_cfg = {
        "classic": dict(),
        "lazy": dict(lazy=True),
        "lazy_int8": dict(lazy=True, state_quant="int8"),
    }
    results = {}
    for arm in [a.strip() for a in args.arms.split(",") if a.strip()]:
        srv = DecodeServer(model, params, n_slots=args.slots,
                           max_text_len=m, chunk=args.chunk,
                           approx_topk=True, **arm_cfg[arm])
        B = srv._B2
        d = model.d_model
        kk = jax.random.PRNGKey(7)
        srv._x_enc = (jax.random.normal(kk, (B, m, d)) * 0.02).astype(
            model.dtype)
        srv._ca_mask = jnp.ones((B, 1, m), bool)
        state = srv._state
        y_embd = (jax.random.normal(kk, (B, d)) * 0.02).astype(model.dtype)
        t = jnp.full((B,), 16, jnp.int32)

        def chunk_call(state, y_embd, t, i):
            return srv._decode_chunk(srv._dev_params, state, y_embd,
                                     srv._x_enc, srv._ca_mask, t,
                                     jax.random.PRNGKey(100 + i))

        # compile + warmup (scalar fetch syncs)
        for i in range(args.warmup):
            state, y_embd, t, toks = chunk_call(state, y_embd, t, i)
        float(jnp.asarray(y_embd).astype(jnp.float32).sum())

        t0 = time.perf_counter()
        for i in range(args.iters):
            state, y_embd, t, toks = chunk_call(state, y_embd, t, 10 + i)
        float(jnp.asarray(y_embd).astype(jnp.float32).sum())
        dt = time.perf_counter() - t0

        tok = args.iters * args.chunk * args.slots
        tok_s = tok / dt
        # host bookkeeping per chunk (slot scatter + stop scan on fetched
        # tokens) — timed on host-side numpy alone so the deployment
        # estimate is device_tok_s degraded by host_ms (overlappable)
        toks_np = np.asarray(toks)
        th0 = time.perf_counter()
        rows = [[] for _ in range(args.slots)]
        for _ in range(8):
            for s in range(args.slots):
                for j in range(args.chunk):
                    rows[s].append(toks_np[j, s])
                np.all(np.stack(rows[s][-args.chunk:]) == 1)
        host_ms = (time.perf_counter() - th0) / 8 * 1e3

        results[arm] = {
            "aggregate_tokens_per_sec": round(tok_s, 1),
            "x_realtime": round(tok_s / CODEC_HZ, 2),
            "ms_per_chunk": round(dt / args.iters * 1e3, 2),
            "host_bookkeeping_ms_per_chunk": round(host_ms, 2),
            "slots": args.slots,
            "chunk": args.chunk,
        }
        print(json.dumps({"arm": arm, **results[arm]}), flush=True)

    if "classic" in results and "lazy" in results:
        print(json.dumps({
            "lazy_vs_classic": round(
                results["lazy"]["aggregate_tokens_per_sec"]
                / results["classic"]["aggregate_tokens_per_sec"], 3)
        }), flush=True)


if __name__ == "__main__":
    main()
