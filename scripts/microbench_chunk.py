"""Microbenchmark: chunked GLA kernel fwd / fwd+bwd on the real TPU.

Usage: python scripts/microbench_chunk.py [--xla] [--fwd-only]
Shapes default to the 169M training hot loop: B8 H4 T512 dk256 dv512.
Timing via scalar fetch (block_until_ready unreliable over the axon tunnel).
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
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--h", type=int, default=4)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--dk", type=int, default=256)
    ap.add_argument("--dv", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--xla", action="store_true", help="bench the XLA chunk path")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (args.b, args.h, args.t, args.dk), dt)
    k = jax.random.normal(ks[1], (args.b, args.h, args.t, args.dk), dt)
    v = jax.random.normal(ks[2], (args.b, args.h, args.t, args.dv), dt)
    gk = (jax.nn.log_sigmoid(
        jax.random.normal(ks[3], (args.b, args.h, args.t, args.dk))) / 16.0
    ).astype(dt)

    if args.xla:
        from lina_speech_tpu.ops.gla import gla_chunk as kern_fn

        def call(q, k, v, gk):
            return kern_fn(q, k, v, gk, chunk_size=64)
    else:
        from lina_speech_tpu.ops.gla_pallas import gla_chunk_pallas as kern_fn

        def call(q, k, v, gk):
            return kern_fn(q, k, v, gk, chunk_size=args.chunk)

    def fwd(q, k, v, gk):
        o, s = call(q, k, v, gk)
        return (o.astype(jnp.float32) ** 2).sum() + (s.astype(jnp.float32) ** 2).sum()

    grad = jax.grad(fwd, argnums=(0, 1, 2, 3))

    def loop(body):
        # iterate INSIDE one jit call: per-call dispatch over the axon
        # tunnel is ~1 ms and would swamp the kernel time. A data
        # dependency between iterations (1e-30 * previous output folded
        # into q) blocks DCE/CSE without perturbing the numerics.
        @jax.jit
        def many(q, k, v, gk):
            def step(carry, _):
                qc, acc = carry
                out = body(qc, k, v, gk)
                leaves = jax.tree_util.tree_leaves(out)
                tot = sum(l.astype(jnp.float32).sum() for l in leaves)
                qc = qc + (1e-30 * tot).astype(qc.dtype)
                return (qc, acc + tot), None

            (qc, acc), _ = jax.lax.scan(step, (q, jnp.float32(0)), None,
                                        length=args.iters)
            return acc

        return many

    def timeit(fn, label):
        many = loop(fn)
        float(many(q, k, v, gk))  # compile + warmup
        t0 = time.perf_counter()
        float(many(q, k, v, gk))
        dt_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label}: {dt_ms:.3f} ms  "
              f"({args.b}x{args.h}x{args.t}x{args.dk}/{args.dv} "
              f"chunk={args.chunk} {args.dtype})")
        return dt_ms

    timeit(fwd, "fwd        ")
    timeit(grad, "fwd+bwd    ")


if __name__ == "__main__":
    main()
