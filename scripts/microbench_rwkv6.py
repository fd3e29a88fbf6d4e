"""Microbenchmark + on-hardware validation: chunked RWKV6 kernel on the TPU.

Checks the Pallas kernel (ops/rwkv6_pallas.py) against the XLA chunk path
ON HARDWARE (Mosaic compile, not interpret mode) for values AND grads, then
times both. Usage: python scripts/microbench_rwkv6.py
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--h", type=int, default=4)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--dk", type=int, default=256)
    ap.add_argument("--dv", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from lina_speech_tpu.ops.rwkv6 import rwkv6_chunk
    from lina_speech_tpu.ops.rwkv6_pallas import rwkv6_chunk_pallas

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    r = jax.random.normal(ks[0], (args.b, args.h, args.t, args.dk), dt)
    k = jax.random.normal(ks[1], (args.b, args.h, args.t, args.dk), dt)
    v = jax.random.normal(ks[2], (args.b, args.h, args.t, args.dv), dt)
    w = (-jnp.exp(jax.random.normal(ks[3], (args.b, args.h, args.t, args.dk))
                  * 0.5 - 2.0)).astype(dt)
    u = (jax.random.normal(ks[4], (args.h, args.dk)) * 0.5).astype(jnp.float32)

    # ---- on-hardware parity (values + grads) vs the XLA chunk
    def loss_pal(r, k, v, w, u):
        o, s = rwkv6_chunk_pallas(r, k, v, w, u, chunk_size=args.chunk)
        return (o.astype(jnp.float32) ** 2).sum() + (s ** 2).sum()

    def loss_xla(r, k, v, w, u):
        o, s = rwkv6_chunk(r, k, v, w, u, chunk_size=64)
        return (o.astype(jnp.float32) ** 2).sum() + (s ** 2).sum()

    lp, gp = jax.value_and_grad(loss_pal, argnums=(0, 1, 2, 3, 4))(r, k, v, w, u)
    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3, 4))(r, k, v, w, u)
    rel = abs(float(lp) - float(lx)) / max(abs(float(lx)), 1e-9)
    print(f"value rel diff vs XLA chunk: {rel:.2e}", flush=True)
    assert rel < 2e-2, "forward mismatch on hardware"
    for name, a, b in zip("rkvwu", gp, gx):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1.0)
        err = np.abs(a - b).max() / scale
        print(f"grad d{name}: max rel err {err:.2e}", flush=True)
        assert err < 5e-2, f"grad d{name} mismatch on hardware"
    print("hardware parity OK", flush=True)

    # ---- timing (in-jit loop, scalar fetch)
    grad_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))
    grad_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))

    def loop(body):
        @jax.jit
        def many(r, k, v, w):
            def step(carry, _):
                rc, acc = carry
                out = body(rc, k, v, w, u)
                tot = sum(l.astype(jnp.float32).sum()
                          for l in jax.tree_util.tree_leaves(out))
                rc = rc + (1e-30 * tot).astype(rc.dtype)
                return (rc, acc + tot), None

            (rc, acc), _ = jax.lax.scan(step, (r, jnp.float32(0)), None,
                                        length=args.iters)
            return acc

        return many

    def timeit(fn, label):
        many = loop(fn)
        float(many(r, k, v, w))
        t0 = time.perf_counter()
        float(many(r, k, v, w))
        dt_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label}: {dt_ms:.3f} ms "
              f"({args.b}x{args.h}x{args.t}x{args.dk}/{args.dv})", flush=True)
        return dt_ms

    timeit(loss_pal, "pallas fwd      ")
    timeit(grad_pal, "pallas fwd+bwd  ")
    timeit(loss_xla, "xla    fwd      ")
    timeit(grad_xla, "xla    fwd+bwd  ")


if __name__ == "__main__":
    main()
