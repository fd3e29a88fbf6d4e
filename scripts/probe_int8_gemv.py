"""Probe: does XLA:TPU stream int8 weights for a bf16 GEMV (fusing the
dequant into the dot), or does it materialize bf16 weights first?

Decides whether weight-only int8 decode is viable via plain XLA or needs
a Pallas dequant-GEMV kernel. b1 decode is weights-read-bound (BASELINE),
so int8 weights would raise the b1 roofline ~2x.

Times y = act @ dequant(Wq) vs y = act @ W_bf16 for a decode-shaped GEMV
chain (in-jit loop, scalar fetch, iters >= 100 per CLAUDE.md).
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
    ap.add_argument("--layers", type=int, default=25)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--dout", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    L, d, dout, b = args.layers, args.d, args.dout, args.batch
    ks = jax.random.split(jax.random.PRNGKey(0), L + 1)
    x = jax.random.normal(ks[0], (b, d), jnp.bfloat16)
    ws = [jax.random.normal(ks[i + 1], (d, dout), jnp.bfloat16) * 0.02
          for i in range(L)]
    # per-output-channel symmetric int8
    scales = [jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
              for w in ws]
    wqs = [jnp.round(w.astype(jnp.float32) / s[None, :]).astype(jnp.int8)
           for w, s in zip(ws, scales)]

    def chain_bf16(x, ws):
        for w in ws:
            y = x @ w                      # (b, dout)
            x = y[:, :d] + x               # keep shape, force dependency
        return x.astype(jnp.float32).sum()

    def chain_int8(x, wqs, scales):
        for wq, s in zip(wqs, scales):
            wd = wq.astype(jnp.bfloat16)   # dequant (scale applied on out)
            y = (x @ wd).astype(jnp.float32) * s[None, :]
            x = (y[:, :d].astype(jnp.bfloat16) + x)
        return x.astype(jnp.float32).sum()

    def timed(name, fn, *a):
        @jax.jit
        def many(x, *rest):
            def step(carry, _):
                xc, acc = carry
                tot = fn(xc, *rest)
                xc = xc + (1e-30 * tot).astype(xc.dtype)
                return (xc, acc + tot), None
            (xc, acc), _ = jax.lax.scan(step, (x, jnp.float32(0)), None,
                                        length=args.iters)
            return acc

        float(many(*a))
        t0 = time.perf_counter()
        float(many(*a))
        dt = (time.perf_counter() - t0) / args.iters
        bytes_w = sum(w.size * w.dtype.itemsize for w in a[1])
        gbps = bytes_w / dt / 1e9
        print(f"{name:10s}: {dt * 1e6:8.1f} us/iter  weights {bytes_w/1e6:.0f} MB"
              f"  -> {gbps:.0f} GB/s effective")

    timed("bf16", chain_bf16, x, ws)
    timed("int8", chain_int8, x, wqs, scales)


if __name__ == "__main__":
    main()
