"""Probe: fused int8 SwiGLU-FFN kernel (ops/qlinear.fused_ffn_int8) vs the
unfused two-GEMV XLA int8 path, on a decode-shaped FFN chain at flagship
dims (d=1024, hidden=1365 -> W_in (1024, 2730) + W_out (1365, 1024) int8 =
4.2 MB/FFN). Timing per CLAUDE.md: in-jit scan, iters >= 100, scalar fetch,
every chain feeds the result (no DCE-able work).
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from lina_speech_tpu.ops.qlinear import fused_ffn_int8, int8_linear_ref
    from lina_speech_tpu.utils.quantize import QKEY, SKEY, _quantize_leaf

    L, d, b = args.layers, args.d, args.batch
    hidden = d * 4 // 3
    ks = jax.random.split(jax.random.PRNGKey(0), 2 * L + 1)
    x = jax.random.normal(ks[0], (b, d), jnp.bfloat16)
    qins, qouts = [], []
    for i in range(L):
        win = jax.random.normal(ks[1 + 2 * i], (d, 2 * hidden),
                                jnp.float32) * 0.03
        wout = jax.random.normal(ks[2 + 2 * i], (hidden, d),
                                 jnp.float32) * 0.03
        qins.append(_quantize_leaf(win))
        qouts.append(_quantize_leaf(wout))

    bytes_w = L * (d * 2 * hidden + hidden * d)

    def chain_fused(x, qi, qo):
        for a, c in zip(qi, qo):
            y = fused_ffn_int8(x, a[QKEY], a[SKEY], None, c[QKEY], c[SKEY],
                               None, interpret=False)
            x = (y + x).astype(jnp.bfloat16)
        return x.astype(jnp.float32).sum()

    def chain_xla(x, qi, qo):
        import flax.linen as nn
        for a, c in zip(qi, qo):
            gx = int8_linear_ref(x, a[QKEY], a[SKEY])
            g, h = jnp.split(gx, 2, axis=-1)
            y = int8_linear_ref(nn.silu(g) * h, c[QKEY], c[SKEY])
            x = (y + x).astype(jnp.bfloat16)
        return x.astype(jnp.float32).sum()

    def timed(name, fn):
        @jax.jit
        def many(x, qi, qo):
            def step(carry, _):
                xc, acc = carry
                tot = fn(xc, qi, qo)
                xc = xc + (1e-30 * tot).astype(xc.dtype)
                return (xc, acc + tot), None
            (xc, acc), _ = jax.lax.scan(step, (x, jnp.float32(0)), None,
                                        length=args.iters)
            return acc

        float(many(x, qins, qouts))
        t0 = time.perf_counter()
        float(many(x, qins, qouts))
        dt = (time.perf_counter() - t0) / args.iters
        gbps = bytes_w / dt / 1e9
        print(f"{name:12s}: {dt * 1e6:8.1f} us/iter  weights "
              f"{bytes_w/1e6:.0f} MB  -> {gbps:.0f} GB/s effective",
              flush=True)

    timed("xla-2gemv", chain_xla)
    timed("fused-ffn", chain_fused)


if __name__ == "__main__":
    main()
