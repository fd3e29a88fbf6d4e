"""Probe: native int8 Pallas GEMV (ops/qlinear.py) vs XLA in-loop dequant
vs bf16, on a decode-shaped GEMV chain.

Round-2 finding (scripts/probe_int8_gemv.py): XLA in-loop dequant reaches
1.45x bf16 on this chain — short of the 2x byte ratio because the dequant
VPU work rides the reduction. The Pallas kernel converts in VMEM behind
the DMA pipeline; w8a8 feeds the MXU int8 natively. Timing per CLAUDE.md:
in-jit scan, iters >= 100, scalar fetch, every chain feeds the result.
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

    from lina_speech_tpu.ops.qlinear import int8_linear

    L, d, dout, b = args.layers, args.d, args.dout, args.batch
    ks = jax.random.split(jax.random.PRNGKey(0), L + 1)
    x = jax.random.normal(ks[0], (b, d), jnp.bfloat16)
    ws = [jax.random.normal(ks[i + 1], (d, dout), jnp.bfloat16) * 0.02
          for i in range(L)]
    scales = [jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
              for w in ws]
    wqs = [jnp.round(w.astype(jnp.float32) / s[None, :]).astype(jnp.int8)
           for w, s in zip(ws, scales)]

    def chain_bf16(x, ws, scales):
        for w in ws:
            y = x @ w
            x = y[:, :d] + x
        return x.astype(jnp.float32).sum()

    def chain_xla_int8(x, wqs, scales):
        for wq, s in zip(wqs, scales):
            wd = wq.astype(jnp.bfloat16)
            y = (x @ wd).astype(jnp.float32) * s[None, :]
            x = (y[:, :d].astype(jnp.bfloat16) + x)
        return x.astype(jnp.float32).sum()

    def chain_xla_int8_sa(x, wqs, scales):
        # scale-after-dot: convert rides the dot operand, the n-sized
        # rescale is the epilogue (int8_linear_ref's form)
        for wq, s in zip(wqs, scales):
            y = ((x @ wq.astype(jnp.bfloat16)).astype(jnp.float32)
                 * s[None, :])
            x = (y[:, :d].astype(jnp.bfloat16) + x)
        return x.astype(jnp.float32).sum()

    def chain_xla_w8a8(x, wqs, scales):
        # native int8 x int8 -> int32 dot: zero dequant work on the
        # weight bytes
        for wq, s in zip(wqs, scales):
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                             1e-12) / 127.0
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sx * s[None, :]
            x = (y[:, :d].astype(jnp.bfloat16) + x)
        return x.astype(jnp.float32).sum()

    def make_pallas_chain(mode):
        def chain(x, wqs, scales):
            for wq, s in zip(wqs, scales):
                y = int8_linear(x, wq, s, mode=mode, interpret=False)
                x = y[:, :d].astype(jnp.bfloat16) + x
            return x.astype(jnp.float32).sum()
        return chain

    def timed(name, fn, wlist):
        @jax.jit
        def many(x, wl, sl):
            def step(carry, _):
                xc, acc = carry
                tot = fn(xc, wl, sl)
                xc = xc + (1e-30 * tot).astype(xc.dtype)
                return (xc, acc + tot), None
            (xc, acc), _ = jax.lax.scan(step, (x, jnp.float32(0)), None,
                                        length=args.iters)
            return acc

        float(many(x, wlist, scales))
        t0 = time.perf_counter()
        float(many(x, wlist, scales))
        dt = (time.perf_counter() - t0) / args.iters
        bytes_w = sum(w.size * w.dtype.itemsize for w in wlist)
        gbps = bytes_w / dt / 1e9
        print(f"{name:12s}: {dt * 1e6:8.1f} us/iter  weights {bytes_w/1e6:.0f} MB"
              f"  -> {gbps:.0f} GB/s effective", flush=True)

    timed("bf16", chain_bf16, ws)
    timed("xla-int8", chain_xla_int8, wqs)
    timed("xla-int8-sa", chain_xla_int8_sa, wqs)
    timed("xla-w8a8", chain_xla_w8a8, wqs)
    timed("pallas-wonly", make_pallas_chain("wonly"), wqs)
    timed("pallas-w8a8", make_pallas_chain("w8a8"), wqs)


if __name__ == "__main__":
    main()


